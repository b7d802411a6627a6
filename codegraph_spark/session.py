"""SparkSession construction tuned for this engine.

Local mode is the test harness; the configs are chosen so the same code
is correct on a real cluster:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- shuffle partitions sized to cores locally (a cluster deployment would
  size to ``2-3 x total executor cores`` or rely on AQE coalescing);
- UTC session timezone so timestamp semantics match the DuckDB oracle;
- Arrow enabled for the few Pandas-UDF paths (ingestion parse stages).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir() -> str:
    """Scale-factor directory under test (driver contract)."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def get_spark(
    app_name: str = "codegraph-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, int(cpus))
        except ValueError:
            shuffle_partitions = 32
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine settings to an externally-provided session (the
    driver constructs its own); only runtime-settable confs here."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        # size shuffles to the actual parallelism (mirrors get_spark);
        # matters especially for streaming state-store ops, which AQE
        # cannot re-coalesce after the fact.
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(8, spark.sparkContext.defaultParallelism)),
        )
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batch memory for wide (media/binary) rows — at
        # 100 TB a media batch of the default 10k rows can be gigabytes.
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    except Exception:
        pass
    return spark
