"""Behavioral pins for the quality-filter / importance-sampling
operators (text_gopher_quality, corpus_dsir_sample) beyond the oracle
hash: the DIRECTION of the signals, which a hash cannot explain."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gopher_fail_counts_discriminate(spark, sf_dir):
    from codegraph_spark.queries.text import text_gopher_quality

    rows = text_gopher_quality(spark, sf_dir).collect()
    assert rows, "fixture corpus must produce per-language rows"
    tot = {k: sum(r[k] for r in rows) for k in rows[0].asDict() if k != "lang"}
    # the corpus discriminates on word count and stopwords (short docs
    # exist by construction), passes the length/alpha rules wholesale
    assert 0 < tot["n_fail_word_count"] < tot["n_docs"]
    assert 0 < tot["n_fail_stopwords"] < tot["n_docs"]
    assert tot["n_fail_mean_word_len"] == 0
    assert tot["n_fail_alpha_ratio"] == 0
    assert 0 < tot["n_pass"] < tot["n_docs"]
    # rule flags are consistent: passers cannot exceed docs minus any fail
    assert tot["n_pass"] <= tot["n_docs"] - max(
        tot["n_fail_word_count"], tot["n_fail_stopwords"]
    )


def test_dsir_sample_prefers_target_language(spark, sf_dir):
    """DSIR direction pin: the importance weight must rank the target
    stratum ('en') above every other language on average, and the
    resample keep-rate must follow the weight."""
    from codegraph_spark.queries.text import _DSIR_TARGET_LANG, corpus_dsir_sample
    from codegraph_spark.sources.tables import load_table

    kept = corpus_dsir_sample(spark, sf_dir)
    stats = {
        r["lang"]: (r["n"], r["aff"])
        for r in kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("affinity_pm").alias("aff"))
        .collect()
    }
    assert _DSIR_TARGET_LANG in stats
    t_aff = stats[_DSIR_TARGET_LANG][1]
    others = [v[1] for k, v in stats.items() if k != _DSIR_TARGET_LANG]
    assert others, "fixture must span several languages"
    assert all(t_aff > o for o in others), stats

    # NOTE: no keep-RATE pin on the fixture — the synthetic corpus
    # shares one vocabulary across languages, so per-word ratios sit
    # ~neutral and hash noise at 500 docs swamps the tiny rate gap.
    # The rate property is pinned on a planted corpus below.
    assert load_table is not None  # keep the import honest


def test_dsir_keep_rate_follows_planted_vocabulary(spark):
    """On a corpus where the target stratum has DISTINCTIVE vocabulary
    the resample must keep (nearly) all target docs and (nearly) no
    out-of-domain docs — the actual DSIR contract."""
    import codegraph_spark.queries.text as T
    import codegraph_spark.sources.tables as tables

    rows = []
    for i in range(300):
        if i % 2 == 0:  # target: exclusive vocabulary
            text = f"alpha beta gamma delta tok{i % 7}"
            lang = T._DSIR_TARGET_LANG
        else:  # out-of-domain: disjoint vocabulary
            text = f"omega sigma kappa zeta tok{7 + i % 7}"
            lang = "xx"
        rows.append((i, text, lang, "s", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = tables.load_table
    try:
        T.load_table = lambda sp, sf, name: docs  # noqa: ARG005
        kept = T.corpus_dsir_sample(spark, "ignored").collect()
    finally:
        T.load_table = orig
    by_lang: dict[str, int] = {}
    for r in kept:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    # target words are ~2x-capped (exclusive => ratio cap) -> keep ~all;
    # ood words never appear in target => ratio ~0 -> keep ~none
    assert by_lang.get(T._DSIR_TARGET_LANG, 0) >= 120  # of 150, P(keep)~1
    assert by_lang.get("xx", 0) <= 10  # affinity ~0
