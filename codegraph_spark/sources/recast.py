"""Recast the driver's TPC-H-ish tables as a property graph.

The reference engine's data model is a labeled property graph
(/root/reference/pkg/models/node.go:28-34, relationship.go:34-40). The
driver provides relational TPC-H-ish parquet (TESTDATA.md), so — per
FIXTURES.md §B — we recast those tables into ``nodes(id, label, name,
key, val, symbol)`` and ``edges(src, dst, type)`` DataFrames. Every
graph operator is then exercised on this graph and verified against a
DuckDB oracle built from the *same* recast expressed in ANSI SQL
(:data:`codegraph_spark.oracle.RECAST_CTES` — keep the two in lockstep).

Shape (mirrors the reference's CONTAINS forest + CALLS/FLOWS_TO chains,
FIXTURES.md §A "shape requirements"):

- CONTAINS forest, depth 5: Region→Nation→{Customer,Supplier},
  Customer→Order, Order→LineItem  (exercises ``CONTAINS*`` closure);
- REFERENCES: LineItem→Part (the Symbol analog — Part carries a
  synthetic 5-part SCIP symbol string, models/symbol.go:11-17);
- DEPENDS_ON: LineItem→Supplier;
- CALLS chain over Order nodes (``orders:k → orders:k+1``) plus
  back-edges every 97th key (cycles — exercises visited-set BFS,
  reference query pkg/neo4j/query.go:203-242 ``[:CALLS*1..10]``);
- FLOWS_TO chains: consecutive LineItems per supplier (partitioned
  window — scales; exercises path capture, query.go:245-285
  ``[:FLOWS_TO*1..15]``).

Scale note: every construct here is a narrow projection, an equi-join,
or a *partitioned* window — no global windows, no driver-side loops —
so the recast itself runs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codegraph_spark.sources.tables import load_table


def _sid(prefix: str, *cols) -> F.Column:
    """Deterministic surrogate node id ``prefix:key[-key2]`` (the Spark
    analog of Neo4j elementId — SURVEY §1.6)."""
    return F.concat_ws("-", F.concat(F.lit(prefix + ":"), cols[0].cast("string")),
                       *[c.cast("string") for c in cols[1:]])


# (l_orderkey, l_linenumber) is NOT unique in the synthetic data (up to
# ~6 duplicates); full rows ARE distinct, so a total-order window mints
# a deterministic per-(orderkey, linenumber) sequence. The same window
# appears in the oracle prelude — keep the ORDER BY lists identical.
_LI_SEQ_ORDER = [
    "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
    "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
]


def lineitem_with_uid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem + ``seq`` (dedup sequence) — the basis of LineItem node
    identity. The window is partitioned (no global sort) so it scales."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(*_LI_SEQ_ORDER)
    return li.withColumn("seq", F.row_number().over(w))


def _li_id() -> F.Column:
    return _sid("lineitem", F.col("l_orderkey"), F.col("l_linenumber"), F.col("seq"))


def part_symbol(p_partkey: F.Column, p_name: F.Column) -> F.Column:
    """Synthetic 5-part SCIP symbol ``scheme manager name version
    descriptor`` (reference grammar: pkg/models/symbol.go:25-38;
    descriptor suffixes :52-90 — ``#`` type, ``().`` function,
    ``#m().`` method, ``/`` package)."""
    suffix = (
        F.when(p_partkey % 4 == 0, F.lit("#"))
        .when(p_partkey % 4 == 1, F.lit("()."))
        .when(p_partkey % 4 == 2, F.lit("#m()."))
        .otherwise(F.lit("/"))
    )
    return F.concat(
        F.lit("scip-go gomod pkg"),
        (p_partkey % 10).cast("string"),
        F.lit(" v"),
        (p_partkey % 3).cast("string"),
        F.lit(" "),
        F.replace(p_name, F.lit(" "), F.lit("_")),
        # p_name collides across parts; the partkey makes the descriptor
        # honor the Symbol.symbol uniqueness constraint (schema.go:41-46).
        F.lit("_"),
        p_partkey.cast("string"),
        suffix,
    )


def graph_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per graph node: ``id, label, name, key, val, symbol``."""
    region = load_table(spark, sf_dir, "region").select(
        _sid("region", F.col("r_regionkey")).alias("id"),
        F.lit("Region").alias("label"),
        F.col("r_name").alias("name"),
        F.col("r_regionkey").cast("bigint").alias("key"),
        F.lit(None).cast("double").alias("val"),
        F.lit(None).cast("string").alias("symbol"),
    )
    nation = load_table(spark, sf_dir, "nation").select(
        _sid("nation", F.col("n_nationkey")).alias("id"),
        F.lit("Nation").alias("label"),
        F.col("n_name").alias("name"),
        F.col("n_nationkey").cast("bigint").alias("key"),
        F.lit(None).cast("double").alias("val"),
        F.lit(None).cast("string").alias("symbol"),
    )
    customer = load_table(spark, sf_dir, "customer").select(
        _sid("customer", F.col("c_custkey")).alias("id"),
        F.lit("Customer").alias("label"),
        F.col("c_name").alias("name"),
        F.col("c_custkey").cast("bigint").alias("key"),
        F.col("c_acctbal").cast("double").alias("val"),
        F.lit(None).cast("string").alias("symbol"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        _sid("supplier", F.col("s_suppkey")).alias("id"),
        F.lit("Supplier").alias("label"),
        F.col("s_name").alias("name"),
        F.col("s_suppkey").cast("bigint").alias("key"),
        F.col("s_acctbal").cast("double").alias("val"),
        F.lit(None).cast("string").alias("symbol"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        _sid("orders", F.col("o_orderkey")).alias("id"),
        F.lit("Order").alias("label"),
        F.col("o_orderkey").cast("string").alias("name"),
        F.col("o_orderkey").cast("bigint").alias("key"),
        F.col("o_totalprice").cast("double").alias("val"),
        F.lit(None).cast("string").alias("symbol"),
    )
    lineitem = lineitem_with_uid(spark, sf_dir).select(
        _li_id().alias("id"),
        F.lit("LineItem").alias("label"),
        F.concat_ws("-", F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.col("seq").cast("string")).alias("name"),
        (F.col("l_orderkey") * 1000 + F.col("l_linenumber") * 10 + F.col("seq"))
        .cast("bigint").alias("key"),
        F.col("l_extendedprice").cast("double").alias("val"),
        F.lit(None).cast("string").alias("symbol"),
    )
    part = load_table(spark, sf_dir, "part").select(
        _sid("part", F.col("p_partkey")).alias("id"),
        F.lit("Part").alias("label"),
        F.col("p_name").alias("name"),
        F.col("p_partkey").cast("bigint").alias("key"),
        F.col("p_retailprice").cast("double").alias("val"),
        part_symbol(F.col("p_partkey"), F.col("p_name")).alias("symbol"),
    )
    return region.unionByName(nation).unionByName(customer).unionByName(supplier) \
        .unionByName(orders).unionByName(lineitem).unionByName(part)


def graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per typed edge: ``src, dst, type``."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = lineitem_with_uid(spark, sf_dir)

    def edge(df, src_col, dst_col, etype):
        return df.select(src_col.alias("src"), dst_col.alias("dst"),
                         F.lit(etype).alias("type"))

    contains = (
        edge(nation, _sid("region", F.col("n_regionkey")),
             _sid("nation", F.col("n_nationkey")), "CONTAINS")
        .unionByName(edge(customer, _sid("nation", F.col("c_nationkey")),
                          _sid("customer", F.col("c_custkey")), "CONTAINS"))
        .unionByName(edge(supplier, _sid("nation", F.col("s_nationkey")),
                          _sid("supplier", F.col("s_suppkey")), "CONTAINS"))
        .unionByName(edge(orders, _sid("customer", F.col("o_custkey")),
                          _sid("orders", F.col("o_orderkey")), "CONTAINS"))
        .unionByName(edge(lineitem, _sid("orders", F.col("l_orderkey")),
                          _li_id(), "CONTAINS"))
    )
    references = edge(lineitem, _li_id(), _sid("part", F.col("l_partkey")), "REFERENCES")
    depends_on = edge(lineitem, _li_id(), _sid("supplier", F.col("l_suppkey")), "DEPENDS_ON")

    # CALLS chain orders:k → orders:k+1; dst existence enforced by
    # self-join (no assumption of contiguous keys). Back-edges every
    # 97th key form cycles.
    okeys = orders.select(F.col("o_orderkey").cast("bigint").alias("k"))
    nxt = okeys.select((F.col("k")).alias("k2"))
    calls_fwd = (
        okeys.join(nxt, okeys.k + 1 == nxt.k2, "inner")
        .select(_sid("orders", F.col("k")).alias("src"),
                _sid("orders", F.col("k2")).alias("dst"),
                F.lit("CALLS").alias("type"))
    )
    calls_back = (
        okeys.filter((F.col("k") % 97 == 0) & (F.col("k") >= 3))
        .join(nxt, okeys.k - 3 == nxt.k2, "inner")
        .select(_sid("orders", F.col("k")).alias("src"),
                _sid("orders", F.col("k2")).alias("dst"),
                F.lit("CALLS").alias("type"))
    )

    # FLOWS_TO: consecutive lineitems per supplier (partitioned window —
    # shuffle is bounded by the supplier key, no global sort).
    w = Window.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber", "seq")
    flows = (
        lineitem.select("l_suppkey", "l_orderkey", "l_linenumber", "seq")
        .withColumn("nok", F.lead("l_orderkey").over(w))
        .withColumn("nln", F.lead("l_linenumber").over(w))
        .withColumn("nsq", F.lead("seq").over(w))
        .filter(F.col("nok").isNotNull())
        .select(_li_id().alias("src"),
                _sid("lineitem", F.col("nok"), F.col("nln"), F.col("nsq")).alias("dst"),
                F.lit("FLOWS_TO").alias("type"))
    )
    return contains.unionByName(references).unionByName(depends_on) \
        .unionByName(calls_fwd).unionByName(calls_back).unionByName(flows)
