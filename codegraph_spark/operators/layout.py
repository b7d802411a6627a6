"""Physical data layout: Z-ordered parquet write-out.

`queries/layout.py` computes the per-file pruning statistics; this
operator actually MATERIALIZES the layout: rows are range-partitioned
by their Morton key (one output file per contiguous z-range) and sorted
within each partition, so every file's (col1, col2) min/max envelope is
a small hyper-rectangle. Parquet then stores those min/max stats in the
footer, and any engine's scan — Spark's parquet filter pushdown
included — skips files whose envelope misses the predicate.

This is the 100 TB serving story for two-column selective scans: the
write is one repartitionByRange (a single range shuffle over the sort
key, the same cost as any sorted write), and reads prune
O(selectivity) of files on EITHER column. tests/test_layout.py proves
the pruning with actual file counts, not just plan text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 8  # per-dimension resolution (0..255 after clamping)


def morton_key(x: Column, y: Column, bits: int = _BITS) -> Column:
    """Bit-interleaved Morton key of two non-negative ints (clamped to
    ``bits`` bits each) — pure integer column arithmetic."""
    cap = F.lit((1 << bits) - 1)
    xc = F.least(F.greatest(x.cast("bigint"), F.lit(0)), cap)
    yc = F.least(F.greatest(y.cast("bigint"), F.lit(0)), cap)
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: Column,
    y_col: Column,
    *,
    n_files: int = 16,
    bits: int = _BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the
    Morton key of (x_col, y_col). Range partitioning keeps each file a
    contiguous z-range; the within-partition sort tightens the parquet
    row-group stats. The helper column is dropped before writing."""
    keyed = df.withColumn("__z", morton_key(x_col, y_col, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    from codegraph_spark import serving

    serving.invalidate(path)  # serving contract: rewrite drops caches over the dir


def files_containing_matches(df: DataFrame) -> int:
    """Number of distinct parquet files that contain rows surviving the
    filter — the layout-clustering ground truth: a stats-pruning scan
    must read at least these files and, with tight per-file envelopes,
    not many more. Comparing this count between layouts measures what
    plan text cannot (pushdown can be 'on' while every file still
    matches)."""
    return df.select(F.input_file_name().alias("f")).distinct().count()
