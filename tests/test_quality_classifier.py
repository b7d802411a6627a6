"""Pins for the trained NB quality classifier: (1) it actually LEARNS
— held-out accuracy must beat the majority-class prior by a real
margin (the floor(log2) quantization this gate replaced scored 0.57 vs
a 0.55 prior; the 1/16-bit mantissa interpolation scores ~0.88 at
sf0.01); (2) the quantized-log weight formula is exact integer
arithmetic matching float log2 to within its declared resolution."""

from __future__ import annotations

import math


def test_heldout_accuracy_beats_prior(spark, sf_dir):
    from codegraph_spark.queries.text import text_quality_classifier

    rows = text_quality_classifier(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    correct = sum(r["n_docs"] for r in rows if r["actual"] == r["predicted"])
    by_actual: dict[str, int] = {}
    for r in rows:
        by_actual[r["actual"]] = by_actual.get(r["actual"], 0) + r["n_docs"]
    prior = max(by_actual.values()) / total
    acc = correct / total
    # a 10-point margin over always-predict-majority = real learning
    assert acc >= prior + 0.10, (acc, prior, rows)


def test_quantized_log_resolution(spark):
    # logq(r) = 16*(msb-1) + mantissa/16 ≈ 16*log2(r): the integer
    # formula must track float log2 within the linear-mantissa
    # interpolation error (max 0.086 bit * 16 ≈ 1.38) plus the
    # mantissa floor (< 1), i.e. < 2.5, across magnitudes.
    from codegraph_spark.queries.text import _nbq_w_spark

    import pyspark.sql.functions as F

    rs = [256, 300, 511, 512, 1000, 123456, 2**40, 2**55 - 1]
    df = spark.createDataFrame([(r,) for r in rs], "rs long").select(
        "rs", _nbq_w_spark("rs").alias("w")
    )
    for row in df.collect():
        logq = 1152 - row["w"]
        expect = 16 * math.log2(row["rs"])
        assert abs(logq - expect) <= 2.5, (row["rs"], logq, expect)


def test_calibration_curve_orders_quality(spark, sf_dir):
    # the reliability table must actually separate the classes: the
    # lowest margin bucket's observed hi-rate strictly below the
    # highest bucket's, with a real spread of buckets in between
    from codegraph_spark.queries.text import text_classifier_calibration

    rows = text_classifier_calibration(spark, sf_dir).collect()
    assert len(rows) >= 3
    assert rows[0]["hi_pm"] < rows[-1]["hi_pm"]
    assert rows[-1]["hi_pm"] >= 900  # top bucket is near-pure 'hi'
