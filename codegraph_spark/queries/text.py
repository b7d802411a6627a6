"""Text-analysis extensions (north-star §M7): language-ID heuristic,
quality scoring, token counting, document fingerprinting — the
training-data-pipeline operators, each expressible as pure JVM-side
column programs (no Python UDFs in the hot path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codegraph_spark.sources.tables import load_table

# Tiny per-language marker sets (an n-gram/stopword-vote heuristic; on
# the synthetic same-vocabulary corpus this is deterministic rather than
# accurate — the operator shape is what scales to a real corpus).
_LANG_MARKERS = {
    "en": r"\b(the|a|of|fast|slow)\b",
    "es": r"\b(data|query|row)\b",
    "de": r"\b(agg|hash|vector)\b",
    "fr": r"\b(window|order|value)\b",
}


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID: count marker hits per language, take
    the argmax (ties broken by fixed language order), 'und' when no
    marker fires."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).alias(f"s_{lang}")
            for lang, pat in _LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in _LANG_MARKERS])
    pred = F.when(best == 0, "und")
    for lang in _LANG_MARKERS:  # first language reaching the max wins
        pred = pred.when(F.col(f"s_{lang}") == best, lang)
    return scored.select("doc_id", "actual_lang", pred.alias("pred_lang"))


_LANGID_SQL = r"""
SELECT doc_id, actual_lang,
       CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
            WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
            WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
            ELSE 'fr' END AS pred_lang
FROM (
    SELECT doc_id, lang AS actual_lang,
           len(regexp_extract_all(text, '\b(the|a|of|fast|slow)\b', 0)) AS s_en,
           len(regexp_extract_all(text, '\b(data|query|row)\b', 0)) AS s_es,
           len(regexp_extract_all(text, '\b(agg|hash|vector)\b', 0)) AS s_de,
           len(regexp_extract_all(text, '\b(window|order|value)\b', 0)) AS s_fr
    FROM documents
)
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: token count, mean word length, vocabulary
    ratio (distinct/total), stopword ratio — combined into a 0-100
    score. All built-in column functions → whole-stage codegen."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    stop_hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\b(the|a|of)\b"), 0))
    # Per-row scalar chains are bit-identical IEEE across engines, so no
    # rounding (decimal-rounding ALGORITHMS differ between engines at
    # exact .xx5 boundaries; floor on the shared double does not).
    scored = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        (F.length("text") / n_words).alias("avg_token_len"),
        (n_distinct / n_words).alias("vocab_ratio"),
        (stop_hits / n_words).alias("stopword_ratio"),
    )
    raw = (
        F.least(F.col("n_words") / F.lit(2.0), F.lit(50.0))
        + F.col("vocab_ratio") * 30
        + F.least(F.col("stopword_ratio") * 100, F.lit(20.0))
    )
    return scored.withColumn("quality", F.floor(raw * 100) / 100)


_QUALITY_SQL = r"""
SELECT doc_id, n_words, avg_token_len, vocab_ratio, stopword_ratio,
       floor((least(n_words / 2.0, 50.0) + vocab_ratio * 30
              + least(stopword_ratio * 100, 20.0)) * 100) / 100 AS quality
FROM (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS vocab_ratio,
           CAST(len(regexp_extract_all(text, '\b(the|a|of)\b', 0)) AS DOUBLE)
                 / len(string_split(text, ' ')) AS stopword_ratio
    FROM documents
)
"""


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letter runs / digit
    runs / single symbols) — the two token-count baselines."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), r"\s+"))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))
    return docs.select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


_TOKENS_SQL = r"""
SELECT doc_id,
       len(regexp_split_to_array(text, '\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)) AS bpe_tokens
FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (the canonical near-dup prefilter key)."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))))
    return docs.select("doc_id", F.md5(canon).alias("fingerprint"))


_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint
FROM documents
"""


# --- sample_stratified: deterministic hash-stratified downsampling ------------

#: per-language keep rates in per-mille — the corpus-mixing knob.
_SAMPLE_RATES = {"en": 600, "es": 300, "de": 300, "fr": 100}
_SAMPLE_DEFAULT = 50  # everything else ('und', rare langs)


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling — the corpus-curation step
    that sets the training mix. Membership = md5(doc_id) mod 1000 <
    per-language rate: shuffle-free and partition-local (a pure filter
    that scans in place at any scale), reproducible across engines and
    reruns (no RNG state, unlike ``sampleBy`` whose seed stream depends
    on partitioning), and monotone in the rate (raising a stratum's
    rate only ADDS docs — stable ablations)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % 1000
    )
    rate = F.lit(_SAMPLE_DEFAULT)
    for lang, r in _SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, r).otherwise(rate)
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"), rate.alias("rate_pm"))
        .filter(F.col("bucket") < F.col("rate_pm"))
    )


_SAMPLE_SQL = f"""
SELECT doc_id, lang, bucket, rate_pm FROM (
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS bucket,
           CASE lang WHEN 'en' THEN 600 WHEN 'es' THEN 300
                     WHEN 'de' THEN 300 WHEN 'fr' THEN 100
                     ELSE {_SAMPLE_DEFAULT} END AS rate_pm
    FROM documents
) WHERE bucket < rate_pm
"""


# --- corpus_mix_summary: per-language corpus statistics rollup ----------------
def corpus_mix_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixing table a training run consumes: per-language doc and
    token counts plus each stratum's per-mille share of the corpus
    token budget. Aggregates are INTEGER sums only — float aggregation
    is summation-order-dependent across engines/partitionings, so
    ratios are derived from exact ints after the agg."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select("lang", F.size(F.split(F.col("text"), " ")).alias("n"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("n_tokens"))
    )
    total = per.select(F.sum("n_tokens").alias("total_tokens"))
    return (
        per.crossJoin(total)
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.floor(F.col("n_tokens") * 1000 / F.col("total_tokens")).alias("share_pm"),
        )
        .orderBy("lang")
    )


_MIX_SQL = """
SELECT lang, n_docs, n_tokens,
       CAST(FLOOR(n_tokens * 1000 / CAST(SUM(n_tokens) OVER () AS DOUBLE)) AS BIGINT) AS share_pm
FROM (
    SELECT lang, count(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
)
ORDER BY lang
"""


QUERIES = {
    "text_langid": text_langid,
    "text_quality_score": text_quality_score,
    "text_token_count": text_token_count,
    "text_fingerprint": text_fingerprint,
    "sample_stratified": sample_stratified,
    "corpus_mix_summary": corpus_mix_summary,
}

ORACLES = {
    "text_langid": _LANGID_SQL,
    "text_quality_score": _QUALITY_SQL,
    "text_token_count": _TOKENS_SQL,
    "text_fingerprint": _FINGERPRINT_SQL,
    "sample_stratified": _SAMPLE_SQL,
    "corpus_mix_summary": _MIX_SQL,
}
