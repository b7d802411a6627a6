"""Data-layout operators: Z-order (Morton) clustering for multi-column
file pruning.

A 100 TB lakehouse table is pruned by per-file min/max statistics; a
single-column sort gives perfect pruning on one predicate column and
none on the second. Z-ordering interleaves the bits of both columns so
every z-prefix range ("file") is a small hyper-rectangle in (col1,
col2) space — both predicates prune.

The operator here is deliberately shuffle-light: files are Z-PREFIX
buckets (the top bits of the Morton key), not equal-row-count chunks,
so assignment is a pure map + one map-side-combining GROUP BY — no
global sort / row_number (the naive total-order plan would funnel the
table through one partition). At scale, write-out is
``repartitionByRange(zkey)`` + per-file stats exactly as computed
here; ``operators/compact.py`` handles evening out file sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from codegraph_spark.sources.tables import load_table

_BITS = 6           # per-dimension resolution (values clamped to 0..63)
_PREFIX_SHIFT = 6   # file id = zkey >> shift  ->  64 z-prefix files


def _morton(x: Column, y: Column, bits: int = _BITS) -> Column:
    """Bit-interleave two small non-negative ints: x in even positions,
    y in odd. Pure integer column arithmetic — whole-stage codegen."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _morton_sql(x: str, y: str, bits: int = _BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order the part table on (p_size, price-bucket) and report the
    per-file pruning statistics: row count and min/max of BOTH
    dimensions per z-prefix file. Tight per-file ranges on both columns
    are the whole point — either predicate skips most files."""
    part = load_table(spark, sf_dir, "part")
    x = F.least(F.greatest(F.col("p_size").cast("bigint"), F.lit(0)), F.lit(63))
    y = F.least(F.floor(F.col("p_retailprice") / 50).cast("bigint"), F.lit(63))
    keyed = part.select(x.alias("x"), y.alias("y")).select(
        "x", "y", _morton(F.col("x"), F.col("y")).alias("zkey")
    )
    return (
        keyed.groupBy(F.shiftright("zkey", _PREFIX_SHIFT).alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_size"),
            F.max("x").alias("max_size"),
            F.min("y").alias("min_pricebucket"),
            F.max("y").alias("max_pricebucket"),
        )
        .orderBy("file_id")
    )


_ZORDER_SQL = f"""
SELECT zkey >> {_PREFIX_SHIFT} AS file_id, count(*) AS n_rows,
       min(x) AS min_size, max(x) AS max_size,
       min(y) AS min_pricebucket, max(y) AS max_pricebucket
FROM (
    SELECT x, y, {_morton_sql('x', 'y')} AS zkey
    FROM (
        SELECT least(greatest(CAST(p_size AS BIGINT), 0), 63) AS x,
               least(CAST(floor(p_retailprice / 50) AS BIGINT), 63) AS y
        FROM part
    )
)
GROUP BY 1
ORDER BY 1
"""


QUERIES = {
    "layout_zorder": layout_zorder,
}

ORACLES = {
    "layout_zorder": _ZORDER_SQL,
}
