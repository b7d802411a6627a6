"""Plan doctor: flags the smells it should, stays quiet on clean
plans, and the CLI surface works end-to-end."""

from __future__ import annotations

import json
import subprocess
import sys

from pyspark.sql import functions as F


def test_clean_plan_no_findings(spark, sf_dir):
    from codegraph_spark.doctor import diagnose
    from codegraph_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    df = (
        li.filter(F.col("l_quantity") > 10)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    errors = [f for f in diagnose(df) if f.severity == "error"]
    assert errors == []


def test_flags_cartesian_product(spark):
    from codegraph_spark.doctor import diagnose

    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    a = spark.range(0, 1000)
    b = spark.range(0, 1000).withColumnRenamed("id", "id2")
    df = a.join(b, F.expr("id % 7 != id2 % 13"))  # non-equi, unbroadcastable hintless
    checks = {f.check for f in diagnose(df)}
    assert "cartesian-product" in checks or "unkeyed-broadcast-join" in checks


def test_flags_row_python_udf(spark):
    from pyspark.sql.functions import udf
    from pyspark.sql.types import LongType

    from codegraph_spark.doctor import diagnose

    slow = udf(lambda x: x + 1, LongType())
    df = spark.range(0, 100).select(slow("id").alias("y"))
    assert any(f.check == "row-python-udf" for f in diagnose(df))


def test_flags_single_partition_window(spark):
    from pyspark.sql import Window

    from codegraph_spark.doctor import diagnose

    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    df = spark.range(0, 1000).select(F.sum("id").over(w).alias("running"))
    assert any(f.check == "single-partition-exchange" for f in diagnose(df))


def test_cli_doctor(sf_dir):
    proc = subprocess.run(
        [sys.executable, "-m", "codegraph_spark", "--sf-dir", sf_dir,
         "doctor", "q1_pricing_summary"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # output is pretty-printed JSON, possibly preceded by shell noise
    out = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert out["query"] == "q1_pricing_summary"
    assert isinstance(out["findings"], list)
