"""corpus_temperature_mix semantics: direction and monotonicity of the
temperature-flattened sampling distribution (the oracle pins exact
values; this pins the SHAPE a mix consumer relies on)."""

from __future__ import annotations


def test_temperature_mix_upsamples_low_resource_strata(spark):
    """T=0.7 must move every stratum's share toward uniform: the
    largest-mass language's temp share drops below its natural share,
    the smallest-mass language's rises above it, and relative mass
    ordering is preserved (p_i ∝ m_i^T is monotone in m)."""
    from tests.conftest import TEST_SF_DIR

    from codegraph_spark.queries.text import corpus_temperature_mix

    rows = corpus_temperature_mix(spark, TEST_SF_DIR).collect()
    assert len(rows) >= 3
    by_mass = sorted(rows, key=lambda r: r["n_tokens"])
    assert by_mass[0]["temp_ppm"] > by_mass[0]["natural_ppm"]
    assert by_mass[-1]["temp_ppm"] < by_mass[-1]["natural_ppm"]
    temp = [r["temp_ppm"] for r in by_mass]
    assert temp == sorted(temp)  # monotone in mass
    assert sum(r["temp_ppm"] for r in rows) <= 1_000_000
