"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in :mod:`codegraph_spark.queries` (one
module per operator family, each with its DuckDB oracle twin).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = q1_pricing_summary (TPC-H Q1 shape — wide aggregate with
    pushed-down date filter; the 100 TB headline pattern).
    """
    from codegraph_spark.queries.relational import q1_pricing_summary
    from codegraph_spark.session import tune_session

    tune_session(spark)
    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from codegraph_spark.queries import collect

    return collect()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twin per query (same column names/aliases)."""
    from codegraph_spark.queries import collect

    return collect()[1]
