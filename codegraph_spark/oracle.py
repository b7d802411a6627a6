"""DuckDB oracle prelude — the ANSI-SQL twin of
:mod:`codegraph_spark.sources.recast`.

The driver runs each ``__spark_entry__.queries()[name]`` next to
``oracle_sql()[name]`` on DuckDB views of the same parquet tables. Graph
operators run on the recast graph, so their oracles need the same
``gnodes``/``gedges`` relations; :func:`with_recast` prefixes a query
with the CTE definitions. KEEP IN LOCKSTEP with recast.py.
"""

from __future__ import annotations

RECAST_CTES = """
li AS (
    -- (l_orderkey, l_linenumber) is not unique; full rows are. The seq
    -- window's ORDER BY list must match recast.py:_LI_SEQ_ORDER.
    SELECT *, row_number() OVER (
        PARTITION BY l_orderkey, l_linenumber
        ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
    ) AS seq
    FROM lineitem
),
gnodes AS (
    SELECT 'region:' || r_regionkey AS id, 'Region' AS label, r_name AS name,
           CAST(r_regionkey AS BIGINT) AS key, CAST(NULL AS DOUBLE) AS val,
           CAST(NULL AS VARCHAR) AS symbol
    FROM region
    UNION ALL
    SELECT 'nation:' || n_nationkey, 'Nation', n_name,
           CAST(n_nationkey AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
    FROM nation
    UNION ALL
    SELECT 'customer:' || c_custkey, 'Customer', c_name,
           CAST(c_custkey AS BIGINT), CAST(c_acctbal AS DOUBLE), CAST(NULL AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'supplier:' || s_suppkey, 'Supplier', s_name,
           CAST(s_suppkey AS BIGINT), CAST(s_acctbal AS DOUBLE), CAST(NULL AS VARCHAR)
    FROM supplier
    UNION ALL
    SELECT 'orders:' || o_orderkey, 'Order', CAST(o_orderkey AS VARCHAR),
           CAST(o_orderkey AS BIGINT), CAST(o_totalprice AS DOUBLE), CAST(NULL AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'lineitem:' || l_orderkey || '-' || l_linenumber || '-' || seq, 'LineItem',
           l_orderkey || '-' || l_linenumber || '-' || seq,
           CAST(l_orderkey * 1000 + l_linenumber * 10 + seq AS BIGINT),
           CAST(l_extendedprice AS DOUBLE), CAST(NULL AS VARCHAR)
    FROM li
    UNION ALL
    SELECT 'part:' || p_partkey, 'Part', p_name,
           CAST(p_partkey AS BIGINT), CAST(p_retailprice AS DOUBLE),
           'scip-go gomod pkg' || (p_partkey % 10) || ' v' || (p_partkey % 3) || ' '
             || replace(p_name, ' ', '_') || '_' || p_partkey
             || CASE WHEN p_partkey % 4 = 0 THEN '#'
                     WHEN p_partkey % 4 = 1 THEN '().'
                     WHEN p_partkey % 4 = 2 THEN '#m().'
                     ELSE '/' END
    FROM part
),
gedges AS (
    SELECT 'region:' || n_regionkey AS src, 'nation:' || n_nationkey AS dst,
           'CONTAINS' AS type FROM nation
    UNION ALL
    SELECT 'nation:' || c_nationkey, 'customer:' || c_custkey, 'CONTAINS' FROM customer
    UNION ALL
    SELECT 'nation:' || s_nationkey, 'supplier:' || s_suppkey, 'CONTAINS' FROM supplier
    UNION ALL
    SELECT 'customer:' || o_custkey, 'orders:' || o_orderkey, 'CONTAINS' FROM orders
    UNION ALL
    SELECT 'orders:' || l_orderkey,
           'lineitem:' || l_orderkey || '-' || l_linenumber || '-' || seq,
           'CONTAINS' FROM li
    UNION ALL
    SELECT 'lineitem:' || l_orderkey || '-' || l_linenumber || '-' || seq,
           'part:' || l_partkey, 'REFERENCES' FROM li
    UNION ALL
    SELECT 'lineitem:' || l_orderkey || '-' || l_linenumber || '-' || seq,
           'supplier:' || l_suppkey, 'DEPENDS_ON' FROM li
    UNION ALL
    SELECT 'orders:' || a.o_orderkey, 'orders:' || b.o_orderkey, 'CALLS'
    FROM orders a JOIN orders b ON a.o_orderkey + 1 = b.o_orderkey
    UNION ALL
    SELECT 'orders:' || a.o_orderkey, 'orders:' || b.o_orderkey, 'CALLS'
    FROM orders a JOIN orders b ON a.o_orderkey - 3 = b.o_orderkey
    WHERE a.o_orderkey % 97 = 0 AND a.o_orderkey >= 3
    UNION ALL
    SELECT 'lineitem:' || l_orderkey || '-' || l_linenumber || '-' || seq,
           'lineitem:' || nok || '-' || nln || '-' || nsq, 'FLOWS_TO'
    FROM (
        SELECT l_orderkey, l_linenumber, seq,
               lead(l_orderkey) OVER w AS nok,
               lead(l_linenumber) OVER w AS nln,
               lead(seq) OVER w AS nsq
        FROM li
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber, seq)
    ) WHERE nok IS NOT NULL
)
"""


def with_recast(sql: str, extra_ctes: str = "") -> str:
    """Prefix *sql* with the recast CTEs (and optional extra CTEs that
    may reference gnodes/gedges)."""
    ctes = RECAST_CTES.strip()
    if extra_ctes:
        ctes = ctes + ",\n" + extra_ctes.strip().lstrip(",")
    return f"WITH RECURSIVE {ctes}\n{sql}"
