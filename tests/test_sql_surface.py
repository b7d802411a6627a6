"""SQL surface (codegraph_spark/sql.py): the warehouse as named views.
SQL text and the DataFrame API must serve identical results from the
same cached tables — Catalyst plans both the same way."""

from __future__ import annotations

from pyspark.sql import functions as F

from codegraph_spark.sql import RAW_TABLES, register_views, sql


def test_register_views_names(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert set(RAW_TABLES) <= set(names)
    assert {"nodes", "edges", "contains_closure"} <= set(names)


def test_sql_equals_dataframe(spark, sf_dir):
    got = sql(
        spark, sf_dir,
        "SELECT label, count(*) AS n FROM nodes GROUP BY label",
    )
    from codegraph_spark.graph import PropertyGraph

    want = (
        PropertyGraph.from_tpch_recast(spark, sf_dir)
        .nodes.groupBy("label").agg(F.count("*").alias("n"))
    )
    assert {(r["label"], r["n"]) for r in got.collect()} == \
        {(r["label"], r["n"]) for r in want.collect()}


def test_sql_joins_graph_and_raw(spark, sf_dir):
    """Views span both worlds: graph pattern + raw table in one query."""
    out = sql(
        spark, sf_dir,
        """
        SELECT count(*) AS n
        FROM edges e
        JOIN nodes p ON p.id = e.dst AND p.label = 'Part'
        JOIN part raw ON raw.p_partkey = p.key
        WHERE e.type = 'REFERENCES'
        """,
    ).collect()
    assert out[0]["n"] > 0


def test_sql_closure_view(spark, sf_dir):
    out = sql(
        spark, sf_dir,
        "SELECT max(hops) AS d FROM contains_closure",
    ).collect()
    assert out[0]["d"] == 4


def test_cli_sql_parses():
    from codegraph_spark.__main__ import _build_parser

    args = _build_parser().parse_args(
        ["--sf-dir", "/x", "sql", "SELECT 1", "--limit", "5"]
    )
    assert args.cmd == "sql" and args.statement == "SELECT 1" and args.limit == 5
