"""Z-ordered write-out: prove with actual file counts that a
two-column-selective predicate concentrates into few files under the
Morton layout and spreads across ~all files under a hash layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _load_part(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "part.parquet"))


def test_zorder_concentrates_selective_scans(spark, sf_dir, tmp_path):
    from codegraph_spark.operators.layout import (
        files_containing_matches,
        write_zordered,
    )

    part = _load_part(spark, sf_dir)
    zpath = str(tmp_path / "part_z")
    hpath = str(tmp_path / "part_hash")
    n_files = 16

    write_zordered(
        part, zpath,
        F.col("p_size"),
        F.floor(F.col("p_retailprice") / 8),  # spread prices over 0..255
        n_files=n_files,
    )
    part.repartition(n_files).write.mode("overwrite").parquet(hpath)

    pred = (F.col("p_size") <= 10) & (F.col("p_retailprice") <= 1100)
    matched = part.filter(pred).count()
    assert matched > 0, "predicate must be non-vacuous"

    z_files = files_containing_matches(spark.read.parquet(zpath).filter(pred))
    h_files = files_containing_matches(spark.read.parquet(hpath).filter(pred))
    assert z_files < h_files, (z_files, h_files)
    assert z_files <= n_files // 2, f"z-order should cluster matches, got {z_files}"

    # layout must not change content
    assert spark.read.parquet(zpath).count() == part.count()


def test_morton_key_monotone_blocks(spark):
    """Rows sharing a z-prefix share a bounded (x, y) envelope — the
    property file pruning relies on."""
    from codegraph_spark.operators.layout import morton_key

    df = (
        spark.range(0, 1024)
        .select(
            (F.col("id") % 32).alias("x"),
            (F.col("id") / 32).cast("bigint").alias("y"),
        )
        .withColumn("z", morton_key(F.col("x"), F.col("y"), 5))
    )
    env = (
        df.groupBy(F.shiftright("z", 4).alias("blk"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    # a 4-bit z-suffix block spans at most a 4x4 cell
    assert all(r.dx <= 3 and r.dy <= 3 for r in env)
