"""Text-analysis extensions (north-star §M7): language-ID heuristic,
quality scoring, token counting, document fingerprinting — the
training-data-pipeline operators, each expressible as pure JVM-side
column programs (no Python UDFs in the hot path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codegraph_spark.sources.tables import load_table, spread

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


# --- corpus_split: deterministic train/val/test assignment --------------------
#: the ONE hash-split rule (980/10/10 per-mille on md5(doc_id)) —
#: corpus_split publishes it, corpus_split_leakage audits its boundary;
#: both MUST read these helpers so the audited boundary can never
#: drift from the published one.
def _split_col():
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % 1000
    )
    return (
        F.when(bucket < 980, "train").when(bucket < 990, "val").otherwise("test")
    )


_SPLIT_CASE_SQL = """CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 980 THEN 'train'
            WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 990 THEN 'val'
            ELSE 'test' END"""


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment (980/10/10 per-mille) by md5 hash of
    the doc id — the split every training run pins: shuffle-free (a
    pure map over the scan), reproducible across engines and reruns,
    and stable under corpus growth (a document's split never changes
    when other documents arrive, unlike row-number slicing). Output is
    the per-(split, lang) census the run manifest records. The rule
    itself lives in :func:`_split_col` / ``_SPLIT_CASE_SQL``, shared
    with the ``corpus_split_leakage`` audit."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(_split_col().alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


_SPLIT_SQL = f"""
SELECT {_SPLIT_CASE_SQL} AS split,
       lang, count(*) AS n_docs
FROM documents
GROUP BY 1, 2
ORDER BY 1, 2
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


# --- corpus_split_leakage: cross-split n-gram leakage audit -------------------
def corpus_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→heldout leakage audit: for each heldout split (val/test,
    by ``corpus_split``'s hash rule), how many documents share at least
    one word-3-gram with ANY train document — the pre-release
    complement of ``text_contamination`` (that one checks a designated
    eval SOURCE; this one checks the split boundary itself, which is
    where random-split pipelines actually leak via boilerplate and
    near-dup clusters straddling the hash partition).

    One corpus-mass shuffle keyed by shingle content (train side
    reduced to DISTINCT grams first — map-side combine), a left-semi
    back on the gram, and a doc-level distinct; per-split output rows
    with integer per-mille leak rate. Linear at any corpus size; the
    usual hot-gram df-cutoff applies at 100 TB (dropping hot grams
    only lowers the leak count — the release gate re-verifies flagged
    docs exactly, same contract as text_contamination). The split rule
    is read from the same :func:`_split_col` / ``_SPLIT_CASE_SQL``
    ``corpus_split`` publishes — the audited boundary IS the published
    boundary by construction."""
    from codegraph_spark.queries.dedup import _shingles

    docs = load_table(spark, sf_dir, "documents")
    split = _split_col()
    census = (
        docs.select(split.alias("split"))
        .filter(F.col("split") != "train")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    sh = _shingles(spark, sf_dir).withColumn("split", split)
    train_sh = sh.filter(F.col("split") == "train").select("shingle").distinct()
    leaked = (
        sh.filter(F.col("split") != "train")
        .join(train_sh, "shingle", "left_semi")
        .select("split", "doc_id")
        .distinct()
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_leaked"))
    )
    return (
        census.join(leaked, "split", "left")
        .select(
            "split",
            "n_docs",
            F.coalesce("n_leaked", F.lit(0)).cast("bigint").alias("n_leaked"),
            F.floor(
                F.coalesce("n_leaked", F.lit(0)) * 1000
                / F.col("n_docs").cast("double")
            ).cast("bigint").alias("leaked_pm"),
        )
        .orderBy("split")
    )


def _split_leakage_sql() -> str:
    from codegraph_spark.queries.dedup import _SHINGLES_CTE

    return f"""
WITH {_SHINGLES_CTE.strip()},
sp AS (
    SELECT doc_id, {_SPLIT_CASE_SQL} AS split
    FROM documents
),
census AS (
    SELECT split, count(*) AS n_docs FROM sp WHERE split <> 'train'
    GROUP BY split
),
train_sh AS (
    SELECT DISTINCT s.shingle
    FROM shingles s JOIN sp ON sp.doc_id = s.doc_id
    WHERE sp.split = 'train'
),
leaked AS (
    SELECT sp.split, count(DISTINCT s.doc_id) AS n_leaked
    FROM shingles s
    JOIN sp ON sp.doc_id = s.doc_id
    WHERE sp.split <> 'train'
      AND s.shingle IN (SELECT shingle FROM train_sh)
    GROUP BY sp.split
)
SELECT c.split, c.n_docs,
       CAST(COALESCE(l.n_leaked, 0) AS BIGINT) AS n_leaked,
       CAST(FLOOR(COALESCE(l.n_leaked, 0) * 1000
            / CAST(c.n_docs AS DOUBLE)) AS BIGINT) AS leaked_pm
FROM census c LEFT JOIN leaked l USING (split)
ORDER BY c.split
"""


# --- corpus_temperature_mix: temperature-sampled mixture weights --------------
#: sampling temperature (XLM-R / mBERT convention: p_i ∝ m_i^T flattens
#: the natural language distribution toward uniform as T → 0)
_MIX_TEMP = 0.7


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled mixture weights per language — the data-mix
    step of a multilingual training run (Conneau et al. 2020, XLM-R,
    arXiv 1911.02116: sample language i with probability ∝ m_i^T so
    low-resource strata are upsampled relative to their token mass).

    Numeric discipline: the only float op is the scalar ``pow`` on each
    stratum's EXACT integer token mass, immediately snapped to an
    integer milli-unit weight; the normalization is then pure integer
    arithmetic — never a float SUM, which is partition-order-dependent
    across engines. ⌊x·10⁶/t⌋ is computed by TWO-STEP long division
    (⌊x·10³/t⌋·10³ + ⌊(x·10³ mod t)·10³/t⌋ — algebraically identical),
    so every intermediate product stays under 2⁶³ out to ~10¹⁵-token
    strata: a 100 TB corpus (~10¹³ tokens) cannot overflow int64,
    where a direct ·10⁶ multiply would. One aggregation keyed by lang;
    the weight table is broadcast-sized at any corpus scale (strata =
    languages, not rows)."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select("lang", F.size(F.split(F.col("text"), " ")).alias("n"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("n_tokens"))
    )
    powed = per.withColumn(
        "wi",
        F.round(
            F.pow(F.col("n_tokens").cast("double"), F.lit(_MIX_TEMP)) * 1000
        ).cast("bigint"),
    )
    tot = powed.select(
        F.sum("n_tokens").alias("tt"), F.sum("wi").alias("tw")
    )

    def ppm(num: str, den: str) -> str:
        # exact ⌊num·10⁶/den⌋ without overflowing int64 (see docstring)
        return (
            f"(({num} * 1000) DIV {den}) * 1000"
            f" + ((({num} * 1000) % {den}) * 1000) DIV {den}"
        )

    return (
        powed.crossJoin(tot)
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.expr(ppm("n_tokens", "tt")).alias("natural_ppm"),
            F.expr(ppm("wi", "tw")).alias("temp_ppm"),
        )
        .orderBy("lang")
    )


def _ppm_sql(num: str, den: str) -> str:
    """DuckDB twin of the overflow-safe two-step ⌊num·10⁶/den⌋."""
    return (
        f"CAST((({num} * 1000) // {den}) * 1000"
        f" + ((({num} * 1000) % {den}) * 1000) // {den} AS BIGINT)"
    )


_TEMP_MIX_SQL = f"""
WITH per AS (
    SELECT lang, count(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
),
powed AS (
    SELECT *, CAST(ROUND(pow(CAST(n_tokens AS DOUBLE), {_MIX_TEMP}) * 1000) AS BIGINT) AS wi
    FROM per
),
tot AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt, CAST(SUM(wi) AS BIGINT) AS tw
    FROM powed
)
SELECT lang, n_docs, n_tokens,
       {_ppm_sql("n_tokens", "tt")} AS natural_ppm,
       {_ppm_sql("wi", "tw")} AS temp_ppm
FROM powed, tot
ORDER BY lang
"""


# --- corpus_pack_shards: token-budgeted sequence packing ----------------------
_PACK_BUDGET = 4096   # tokens per training shard
_PACK_BUCKETS = 32    # prefix-sum parallelism (executor-count-sized at scale)


def corpus_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assign each document a (shard_id, shard_pos)
    in a token-budgeted linearization of the corpus, the step that
    turns a deduped corpus into fixed-size training shards.

    The naive plan is one global cumulative-sum window = a single
    partition holding the whole corpus. This is the distributed
    two-level prefix sum instead: docs hash into ``_PACK_BUCKETS``
    buckets, the running total is a window WITHIN each bucket (fully
    parallel), bucket offsets come from a tiny per-bucket aggregate
    (``_PACK_BUCKETS`` rows — the only global window, broadcast back).
    At 100 TB, bucket count scales with executors and the offset table
    stays bytes-sized. Hash order (doc_id within bucket) also
    decorrelates document length from shard position. Integer math end
    to end."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") % _PACK_BUCKETS).alias("bucket"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn("local_cum", F.sum("n_tokens").over(w))
    totals = local.groupBy("bucket").agg(F.max("local_cum").alias("btotal"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket", F.coalesce(F.sum("btotal").over(wb), F.lit(0)).alias("off")
    )
    packed = local.join(F.broadcast(offsets), "bucket")
    start = F.col("off") + F.col("local_cum") - F.col("n_tokens")
    return packed.select(
        "doc_id",
        "n_tokens",
        F.expr(f"(off + local_cum - n_tokens) div {_PACK_BUDGET}").alias("shard_id"),
        (start % _PACK_BUDGET).alias("shard_pos"),
    )


_PACK_SQL = f"""
WITH base AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           doc_id % {_PACK_BUCKETS} AS bucket
    FROM documents
),
localcum AS (
    SELECT doc_id, n_tokens, bucket,
           sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS local_cum
    FROM base
),
offsets AS (
    SELECT bucket,
           coalesce(sum(btotal) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
    FROM (SELECT bucket, max(local_cum) AS btotal FROM localcum GROUP BY bucket)
)
SELECT l.doc_id, l.n_tokens,
       CAST((o.off + l.local_cum - l.n_tokens) // {_PACK_BUDGET} AS BIGINT) AS shard_id,
       CAST((o.off + l.local_cum - l.n_tokens) % {_PACK_BUDGET} AS BIGINT) AS shard_pos
FROM localcum l JOIN offsets o USING (bucket)
"""


# --- text_pii_flag: PII detection + redaction (C4/RefinedWeb-style filter) ----
# RE2-compatible patterns (DuckDB) that Java regex reads identically:
# no lookaround, ASCII word boundaries, bounded repetition only.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def text_pii_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the pre-release scrub every corpus
    runs (emails, phone numbers, IP addresses; the C4/RefinedWeb filter
    family). Pure regexp column ops: counts per category, a has_pii
    flag, and the md5 of the redacted text (proves both engines redact
    the identical spans, not just count them).

    The synthetic corpus carries no organic PII, so the fixture PLANTS
    deterministic spans derived from doc_id (every 7th doc an email,
    11th a phone, 13th an IP) — both engines compute the identical
    augmented column, keeping the detector non-vacuous (the j9 lesson:
    an all-zero green proves nothing about the regexes)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                     F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" call 555-123-4567")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" from 10.1.2.3")).otherwise(F.lit("")),
    )
    base = docs.select("doc_id", aug.alias("t"))
    n_emails = F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_EMAIL), 0))
    n_phones = F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_PHONE), 0))
    n_ips = F.size(F.regexp_extract_all(F.col("t"), F.lit(_PII_IP), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>",
        ),
        _PII_IP, "<IP>",
    )
    return base.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        ((n_emails + n_phones + n_ips) > 0).alias("has_pii"),
        F.md5(redacted).alias("redacted_md5"),
    )


_PII_SQL = rf"""
WITH base AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 7 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 0 THEN ' call 555-123-4567' ELSE '' END
           || CASE WHEN doc_id % 13 = 0 THEN ' from 10.1.2.3' ELSE '' END AS t
    FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phones,
       len(regexp_extract_all(t, '{_PII_IP}')) AS n_ips,
       len(regexp_extract_all(t, '{_PII_EMAIL}'))
         + len(regexp_extract_all(t, '{_PII_PHONE}'))
         + len(regexp_extract_all(t, '{_PII_IP}')) > 0 AS has_pii,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IP}', '<IP>', 'g')) AS redacted_md5
FROM base
"""


# --- text_repetition: Gopher-style repetition scoring -------------------------
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter signal (the Gopher/MassiveText family): the
    most-frequent word bigram's count and its per-mille share of all
    bigrams. Repetitive machine-generated text scores high and gets
    dropped before training. Shape: map-side bigram explode → count by
    (doc, gram) → max per doc — the groupBy keys start with doc_id, so
    at 100 TB the shuffle partitions by document and never concentrates
    (no global hot key; gram strings stay inside their doc's
    partition). Single-word docs carry no bigram signal and are
    dropped on both sides. Integer outputs only."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id", words.alias("w"), F.size(words).alias("n_words")
    ).filter(F.col("n_words") >= 2)
    grams = base.select(
        "doc_id",
        "n_words",
        F.explode(
            F.expr(
                "transform(sequence(0, n_words - 2),"
                " i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))"
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "n_words", "gram").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id", "n_words").agg(
        F.max("c").alias("top_bigram_n"),
        F.floor(F.max("c") * 1000 / (F.col("n_words") - 1)).alias("top_bigram_pm"),
    )


_REPETITION_SQL = """
WITH base AS (
    SELECT doc_id,
           string_split(text, ' ') AS w,
           CAST(len(string_split(text, ' ')) AS INT) AS n_words
    FROM documents
),
grams AS (
    SELECT doc_id, n_words,
           unnest(list_transform(range(1, n_words), i -> w[i] || ' ' || w[i + 1])) AS gram
    FROM base WHERE n_words >= 2
),
counts AS (
    SELECT doc_id, n_words, gram, count(*) AS c FROM grams GROUP BY 1, 2, 3
)
SELECT doc_id, n_words,
       CAST(max(c) AS BIGINT) AS top_bigram_n,
       CAST(FLOOR(max(c) * 1000 / CAST(n_words - 1 AS DOUBLE)) AS BIGINT) AS top_bigram_pm
FROM counts GROUP BY doc_id, n_words
"""


# --- corpus_filter_funnel: pipeline yield report ------------------------------
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The yield report of a chained corpus-filter pipeline: how many
    documents survive each successive filter (language keep-list →
    minimum length → vocabulary-diversity floor → length cap at 450 chars), with
    cumulative per-mille yield. One scan, one conditional aggregation:
    each stage is a conjunction of the previous stages, so the five
    counts are five conditional sums over the same pass — no repeated
    scans, no shuffles beyond the final 1-row agg. Integer math only."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    vocab_ratio_pm = F.size(F.array_distinct(words)) * 1000 / n_words
    c1 = F.col("lang").isin("en", "es", "de", "fr")
    c2 = c1 & (n_words >= 30)
    c3 = c2 & (vocab_ratio_pm >= 300)
    c4 = c3 & (F.col("n_chars") <= 450)
    agg = docs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(c1.cast("long")).alias("n1"),
        F.sum(c2.cast("long")).alias("n2"),
        F.sum(c3.cast("long")).alias("n3"),
        F.sum(c4.cast("long")).alias("n4"),
    )
    out = agg.select(
        F.expr(
            "stack(5, 0, 'total', n0, 1, 'lang_keep', n1, 2, 'min_len', n2,"
            " 3, 'vocab_floor', n3, 4, 'len_cap', n4) AS (stage_no, stage, n_docs)"
        ),
        F.col("n0"),
    )
    return out.select(
        "stage_no", "stage", "n_docs",
        # NULLIF: an empty corpus reports NULL yield, not a division
        # error under ANSI mode
        F.floor(F.col("n_docs") * 1000 / F.nullif(F.col("n0"), F.lit(0)))
        .cast("bigint").alias("yield_pm"),
    )


_FILTER_FUNNEL_SQL = """
WITH d AS (
    SELECT lang, n_chars,
           len(string_split(text, ' ')) AS n_words,
           len(list_distinct(string_split(text, ' '))) * 1000
               / len(string_split(text, ' ')) AS vocab_ratio_pm
    FROM documents
),
agg AS (
    SELECT count(*) AS n0,
           CAST(sum(CASE WHEN lang IN ('en','es','de','fr') THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN lang IN ('en','es','de','fr') AND n_words >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           CAST(sum(CASE WHEN lang IN ('en','es','de','fr') AND n_words >= 30
                          AND vocab_ratio_pm >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
           CAST(sum(CASE WHEN lang IN ('en','es','de','fr') AND n_words >= 30
                          AND vocab_ratio_pm >= 300 AND n_chars <= 450 THEN 1 ELSE 0 END) AS BIGINT) AS n4
    FROM d
),
stages AS (
    SELECT 0 AS stage_no, 'total' AS stage, n0 AS n_docs, n0 FROM agg
    UNION ALL SELECT 1, 'lang_keep', n1, n0 FROM agg
    UNION ALL SELECT 2, 'min_len', n2, n0 FROM agg
    UNION ALL SELECT 3, 'vocab_floor', n3, n0 FROM agg
    UNION ALL SELECT 4, 'len_cap', n4, n0 FROM agg
)
SELECT stage_no, stage, n_docs,
       CAST(FLOOR(n_docs * 1000 / NULLIF(CAST(n0 AS DOUBLE), 0)) AS BIGINT) AS yield_pm
FROM stages
"""


# --- text_lm_score: corpus-trained bigram-LM fluency proxy --------------------
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring (the CCNet/Gopher-style LM
    filter, integer-exact): train bigram statistics on the corpus
    itself, then score each document by the average conditional
    bigram probability P(w2|w1) = c(w1,w2)/c(w1,·) in parts-per-
    million. Low scores mark disfluent/boilerplate docs exactly like a
    low-perplexity KenLM filter does — but every quantity here is
    integer (per-bigram ppm floor, integer-division average), so the
    score is bit-identical across engines with no float-log hazards.

    Scale shape: one explode to the bigram stream, two map-side-
    combining GROUP BYs for the model (bigram + left-context counts),
    two equi-joins keyed by the n-gram content hash, one per-doc agg.
    The trained model is corpus-mass-sized (distinct bigrams), never
    broadcast; at 100 TB both joins shuffle on well-distributed
    content keys (stopword-headed bigrams are hot but the joins carry
    ONE row per doc-position, never pairs — linear, no df² hazard)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    w2s = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    bigrams = F.zip_with(
        words, w2s, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.slice(bigrams, 1, F.greatest(F.size(words) - 1, F.lit(0)))
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bg.join(c12, ["w1", "w2"]).join(c1, "w1")
        .select(
            "doc_id",
            F.expr("(c12 * 1000000) div c1").alias("ppm"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("sum(ppm) div count(*)").alias("avg_ppm"),
        )
    )


_LM_SQL = """
WITH bg AS (
    SELECT doc_id, w AS w1, lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    )
),
bg2 AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg2 GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg2 GROUP BY w1)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(ppm) // count(*) AS BIGINT) AS avg_ppm
FROM (
    SELECT b.doc_id, CAST((c12.c12 * 1000000) // c1.c1 AS BIGINT) AS ppm
    FROM bg2 b
    JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
    JOIN c1 ON c1.w1 = b.w1
)
GROUP BY doc_id
"""


# --- text_dup_ngram_coverage: duplicate-3-gram coverage filter ----------------
def text_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-n-gram coverage (the Gopher/RefinedWeb
    'fraction of characters in duplicated n-grams' filter family, on
    word-3-grams): per-mille of a doc's DISTINCT shingles that also
    appear in at least one other document. High coverage = boilerplate
    or template text even when no single pair passes the pairwise
    dedup thresholds — the corpus-level complement to the pair-finding
    detectors.

    One shingle explode, one df GROUP BY, one equi-join back on the
    shingle, one per-doc agg — every shuffle keyed by content or
    doc id, rows linear in corpus shingle mass (no pair stage at
    all)."""
    from codegraph_spark.queries.dedup import _shingles

    sh = _shingles(spark, sf_dir)
    dfc = sh.groupBy("shingle").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        sh.join(dfc, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.floor(
                F.sum((F.col("n_docs") >= 2).cast("long")) * 1000
                / F.count(F.lit(1))
            ).cast("bigint").alias("dup_pm"),
        )
    )


def _dup_coverage_sql() -> str:
    from codegraph_spark.queries.dedup import _SHINGLES_CTE

    return f"""
WITH {_SHINGLES_CTE.strip()},
dfc AS (SELECT shingle, count(DISTINCT doc_id) AS n_docs FROM shingles GROUP BY shingle)
SELECT s.doc_id, count(*) AS n_shingles,
       CAST(floor(sum(CASE WHEN dfc.n_docs >= 2 THEN 1 ELSE 0 END) * 1000
            / CAST(count(*) AS DOUBLE)) AS BIGINT) AS dup_pm
FROM shingles s JOIN dfc ON dfc.shingle = s.shingle
GROUP BY s.doc_id
"""


# --- text_length_profile: exact per-language length percentiles --------------
_PCTS = (50, 90, 99)


def text_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of document length per language — the
    length-distribution dashboard every corpus intake step starts from
    (truncation budgets, outlier fences, per-language chunk sizing).

    Scale shape — histogram cumsum, NOT a per-language row sort: the
    length column is low-cardinality (distinct lengths ≪ rows), so
    GROUP BY (lang, n_chars) shrinks the data to the histogram first
    (map-side combining; one shuffle keyed by lang+length), and the
    window cumsum + rank pick run over histogram rows only — a
    dominant language costs its distinct-length count, not its row
    count, so language skew cannot create a fat sort partition.
    Percentile convention: value at rank ⌈p·n/100⌉ of the sorted
    multiset (discrete, no interpolation) — identical arithmetic in
    the oracle, no engine quantile-convention coupling. Rows with
    NULL n_chars are excluded on BOTH engines before the cumsum:
    Spark windows sort NULLS FIRST and DuckDB NULLS LAST, so an
    unknown length left in the histogram would shift every rank by
    the engines' opposite null placement (round-6 review finding);
    n_docs therefore counts docs with a known length."""
    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.filter(F.col("n_chars").isNotNull())
        .groupBy("lang", "n_chars")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("lang"))
    )
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.col("n") * p / 100), F.col("n_chars")
            )
        ).alias(f"p{p}")
        for p in _PCTS
    ]
    return (
        cum.groupBy("lang")
        .agg(F.max("n").cast("long").alias("n_docs"), *picks)
        .orderBy("lang")
    )


_LENGTH_PROFILE_SQL = f"""
WITH hist AS (
    SELECT lang, n_chars, count(*) AS c
    FROM documents
    WHERE n_chars IS NOT NULL
    GROUP BY lang, n_chars
),
cum AS (
    SELECT lang, n_chars, c,
           sum(c) OVER (PARTITION BY lang ORDER BY n_chars
                        ROWS UNBOUNDED PRECEDING) AS cum,
           sum(c) OVER (PARTITION BY lang) AS n
    FROM hist
)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
       {", ".join(
           f"min(CASE WHEN cum >= ceil(n * {p} / 100.0) THEN n_chars END) AS p{p}"
           for p in _PCTS
       )}
FROM cum
GROUP BY lang
ORDER BY lang
"""


# --- text_cross_doc_coverage: repeated-substring span coverage ---------------
#: positional n-gram width for the cross-document span detector (Lee
#: et al. 2022 use 50 tokens at web scale; 8 keeps the synthetic
#: fixture non-vacuous while exercising the identical plan shape)
_XDOC_N = 8


def text_cross_doc_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv 2107.06499):
    for every document, the fraction of its tokens lying inside a
    token-8-gram that also occurs verbatim in ANOTHER document —
    the positional, span-level complement of the set-level
    ``text_dup_ngram_coverage`` (a doc quoting one long passage scores
    high here even when its distinct-shingle overlap is low).

    Published systems build a corpus suffix array; the Spark-native
    equivalent is a positional-gram posting join — the same signal at
    fixed n without the global sorted structure:

    1. positional 8-grams (one map-side transform over the token
       array — rows = token mass, no shuffle);
    2. cross-doc grams: GROUP BY gram content, keep df ≥ 2 docs
       (map-side-combining two-phase distinct; shuffle keyed by gram);
    3. left-semi back on the gram (a hot boilerplate gram contributes
       its occurrence count, linear — never a pair join);
    4. per-doc interval union of the surviving [p, p+7] spans via
       gaps-and-islands (doc-partitioned window, never global).

    Output per doc: token count, covered-token count, per-mille
    coverage (integer — no float hash surface)."""
    n = _XDOC_N
    toks = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.split(F.col("text"), " ").alias("toks"),
        )
        .withColumn("n_tokens", F.size("toks").cast("bigint"))
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                    lambda p: F.struct(
                        p.alias("p"),
                        F.concat_ws(" ", F.slice("toks", p, n)).alias("gram"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<p:int,gram:string>>"))
        ).alias("g"),
    ).select("doc_id", F.col("g.p").alias("p"), F.col("g.gram").alias("gram"))
    dup = (
        grams.select("gram", "doc_id").distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("gram")
    )
    cov = grams.join(dup, "gram", "left_semi").select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    isl = (
        cov.withColumn("prev", F.lag("p").over(w))
        .withColumn(
            "brk",
            (F.col("prev").isNull() | (F.col("p") - F.col("prev") >= n)).cast("int"),
        )
        .withColumn("isl", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    cov_doc = (
        isl.groupBy("doc_id", "isl")
        .agg((F.max("p") - F.min("p") + n).alias("clen"))
        .groupBy("doc_id")
        .agg(F.sum("clen").cast("bigint").alias("covered_tokens"))
    )
    return (
        toks.join(cov_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("covered_tokens", F.lit(0)).cast("bigint").alias("covered_tokens"),
            F.floor(
                F.coalesce("covered_tokens", F.lit(0)) * 1000
                / F.col("n_tokens").cast("double")
            ).cast("bigint").alias("covered_pm"),
        )
    )


_XDOC_SQL = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents WHERE text IS NOT NULL
),
grams AS (
    SELECT doc_id, p, array_to_string(list_slice(toks, p, p + {_XDOC_N - 1}), ' ') AS gram
    FROM (SELECT doc_id, toks, unnest(range(1, n_tokens - {_XDOC_N - 2})) AS p FROM toks)
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
cov AS (SELECT doc_id, p FROM grams WHERE gram IN (SELECT gram FROM dup)),
isl AS (
    SELECT doc_id, p,
           CASE WHEN lag(p) OVER w IS NULL OR p - lag(p) OVER w >= {_XDOC_N}
                THEN 1 ELSE 0 END AS brk
    FROM cov WINDOW w AS (PARTITION BY doc_id ORDER BY p)
),
isl2 AS (
    SELECT doc_id, p,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY p
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
    FROM isl
),
cov_doc AS (
    SELECT doc_id, CAST(sum(clen) AS BIGINT) AS covered_tokens FROM (
        SELECT doc_id, isl, max(p) - min(p) + {_XDOC_N} AS clen
        FROM isl2 GROUP BY doc_id, isl
    ) GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       COALESCE(c.covered_tokens, 0) AS covered_tokens,
       CAST(floor(COALESCE(c.covered_tokens, 0) * 1000
            / CAST(t.n_tokens AS DOUBLE)) AS BIGINT) AS covered_pm
FROM toks t LEFT JOIN cov_doc c USING (doc_id)
"""


# --- text_gopher_quality: the Gopher rule-bundle quality filter --------------
#: Rae et al. 2021 (arXiv 2112.11446, table A1) document-level filter
#: rules, restated over the word stream (the fixture is single-line, so
#: the line-shape rules — bullet/ellipsis line fractions — are vacuous
#: here and omitted; the word rules carry the discriminating power:
#: 223/500 sf0.01 docs fail the word-count floor, 183/500 the stopword
#: rule). Thresholds are the published ones.
_GOPHER_STOPWORDS = ["the", "a", "of", "to", "and", "that", "with", "be"]


def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter audit: evaluate each published rule per
    document, report per-language fail counts and the surviving-doc
    count — the go/no-go summary a corpus curation run reads before
    committing a filter config.

    Rules (all integer-exact — cross-multiplied instead of ratios, so
    the oracle hash cannot drift on float division):

    - word count in [50, 100 000]
    - mean word length in [3, 10]  (3·n ≤ Σlen ≤ 10·n over words)
    - ≥ 80% of words contain an alphabetic character (5·alpha ≥ 4·n)
    - symbol-to-word ratio ≤ 0.1 for '#'/'...' (10·sym ≤ n)
    - ≥ 2 distinct stopwords from the 8-word list

    Scale shape: one pass over documents, per-row column programs only
    (split / filter / array_intersect — whole-stage codegen), then a
    lang-keyed map-side-combining aggregate. No joins, no windows; the
    single shuffle moves |langs| partial rows per map task."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nw = F.size(words)
    wchars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    sym = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"#|\.\.\."), 0))
    stops = F.size(
        F.array_intersect(
            F.array_distinct(F.split(F.lower(F.col("text")), " ")),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    )
    flagged = docs.select(
        "lang",
        ((nw < 50) | (nw > 100_000)).cast("long").alias("f_wc"),
        ((3 * nw > wchars) | (wchars > 10 * nw)).cast("long").alias("f_mwl"),
        (5 * alpha < 4 * nw).cast("long").alias("f_alpha"),
        (10 * sym > nw).cast("long").alias("f_sym"),
        (stops < 2).cast("long").alias("f_stop"),
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("f_wc").alias("n_fail_word_count"),
            F.sum("f_mwl").alias("n_fail_mean_word_len"),
            F.sum("f_alpha").alias("n_fail_alpha_ratio"),
            F.sum("f_sym").alias("n_fail_symbol_ratio"),
            F.sum("f_stop").alias("n_fail_stopwords"),
            F.sum(
                (
                    (F.col("f_wc") + F.col("f_mwl") + F.col("f_alpha")
                     + F.col("f_sym") + F.col("f_stop")) == 0
                ).cast("long")
            ).alias("n_pass"),
        )
        .orderBy("lang")
    )


_GOPHER_SQL = r"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(f_wc) AS BIGINT) AS n_fail_word_count,
       CAST(sum(f_mwl) AS BIGINT) AS n_fail_mean_word_len,
       CAST(sum(f_alpha) AS BIGINT) AS n_fail_alpha_ratio,
       CAST(sum(f_sym) AS BIGINT) AS n_fail_symbol_ratio,
       CAST(sum(f_stop) AS BIGINT) AS n_fail_stopwords,
       CAST(sum(CASE WHEN f_wc + f_mwl + f_alpha + f_sym + f_stop = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM (
    SELECT lang,
           CASE WHEN nw < 50 OR nw > 100000 THEN 1 ELSE 0 END AS f_wc,
           CASE WHEN 3 * nw > wchars OR wchars > 10 * nw THEN 1 ELSE 0 END AS f_mwl,
           CASE WHEN 5 * alpha < 4 * nw THEN 1 ELSE 0 END AS f_alpha,
           CASE WHEN 10 * sym > nw THEN 1 ELSE 0 END AS f_sym,
           CASE WHEN stops < 2 THEN 1 ELSE 0 END AS f_stop
    FROM (
        SELECT lang,
               len(string_split(text, ' ')) AS nw,
               length(replace(text, ' ', '')) AS wchars,
               len(list_filter(string_split(text, ' '),
                               w -> regexp_matches(w, '[A-Za-z]'))) AS alpha,
               len(regexp_extract_all(text, '#|\.\.\.', 0)) AS sym,
               len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                   ['the', 'a', 'of', 'to', 'and', 'that', 'with', 'be'])) AS stops
        FROM documents
    )
)
GROUP BY lang ORDER BY lang
"""


# --- corpus_dsir_sample: importance-resampled domain selection ----------------
#: DSIR (Xie et al. 2023, arXiv 2302.03169): reweight raw docs by how
#: target-domain-typical their n-gram features are, then resample with
#: probability ∝ the importance weight. Target domain here = the 'en'
#: stratum (a deterministic in-corpus proxy); features = unigrams.
#: RATIO_CAP_PM caps a word's target-affinity ratio at 2.0x neutral so
#: one rare target-only word cannot dominate a doc's weight.
_DSIR_TARGET_LANG = "en"
_DSIR_CAP_PM = 2000


def corpus_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance resampling, integer-exact: per word,
    tshare_ppm = ⌊(c_target+1)·10⁶/(c_raw+1)⌋ (Laplace-smoothed share
    of the word's mass that is target-domain); per corpus, norm_ppm =
    the same share over ALL tokens (the neutral baseline); per word,
    ratio_pm = ⌊tshare·1000/norm⌋ capped at 2000 (2x neutral); per
    doc, affinity_pm = the integer-mean ratio over its tokens; keep a
    doc iff md5(doc_id) mod 2000 < affinity_pm — i.e. P(keep) =
    min(ratio, 2)/2, a deterministic hash-thresholded resample
    (reproducible, monotone in the weight, no RNG state).

    Scale shape: two map-side-combining unigram counts (target + raw)
    make the model; the model joins the token stream on word CONTENT
    (one row per doc position — hot stopwords stay linear, the
    text_lm_score argument); one per-doc agg; the 1-row normalizer is
    a broadcast crossJoin. The divisions use the overflow-safe
    two-step ⌊n·10⁶/d⌋ (corpus_temperature_mix's rule), exact at any
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"),
    ).filter(F.col("word") != "")
    cr = tok.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("c_r"))
    ct = (
        tok.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_t"))
    )
    model = (
        cr.join(ct, "word", "left")
        .select(
            "word",
            F.expr(
                "(((coalesce(c_t, 0) + 1) * 1000) div (c_r + 1)) * 1000"
                " + ((((coalesce(c_t, 0) + 1) * 1000) % (c_r + 1)) * 1000)"
                " div (c_r + 1)"
            ).alias("tshare_ppm"),
        )
    )
    norm = tok.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_r"),
        F.sum((F.col("lang") == _DSIR_TARGET_LANG).cast("bigint")).alias("n_t"),
    ).select(
        F.expr(
            "(((n_t + 1) * 1000) div (n_r + 1)) * 1000"
            " + ((((n_t + 1) * 1000) % (n_r + 1)) * 1000) div (n_r + 1)"
        ).alias("norm_ppm")
    )
    scored = (
        tok.join(model, "word")
        .crossJoin(F.broadcast(norm))
        .select(
            "doc_id", "lang",
            F.least(
                F.expr("(tshare_ppm * 1000) div norm_ppm"),
                F.lit(_DSIR_CAP_PM).cast("bigint"),
            ).alias("ratio_pm"),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.expr("sum(ratio_pm) div count(*)").alias("affinity_pm"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % _DSIR_CAP_PM
    )
    return per_doc.withColumn("bucket", bucket).filter(
        F.col("bucket") < F.col("affinity_pm")
    )


_DSIR_SQL = f"""
WITH tok AS (
    SELECT doc_id, lang, word FROM (
        SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS word
        FROM documents
    ) WHERE word <> ''
),
model AS (
    SELECT word,
           {_ppm_sql("(coalesce(c_t, 0) + 1)", "(c_r + 1)")} AS tshare_ppm
    FROM (SELECT word, CAST(count(*) AS BIGINT) AS c_r FROM tok GROUP BY word) r
    LEFT JOIN (SELECT word, CAST(count(*) AS BIGINT) AS c_t FROM tok
               WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY word) t USING (word)
),
norm AS (
    SELECT {_ppm_sql("(n_t + 1)", "(n_r + 1)")} AS norm_ppm FROM (
        SELECT CAST(count(*) AS BIGINT) AS n_r,
               CAST(sum(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_t
        FROM tok
    )
),
per_doc AS (
    SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(ratio_pm) // count(*) AS BIGINT) AS affinity_pm
    FROM (
        SELECT doc_id, lang,
               least((tshare_ppm * 1000) // norm_ppm, {_DSIR_CAP_PM}) AS ratio_pm
        FROM tok JOIN model USING (word) CROSS JOIN norm
    )
    GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_words, affinity_pm,
       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % {_DSIR_CAP_PM} AS bucket
FROM per_doc
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % {_DSIR_CAP_PM} < affinity_pm
"""


# --- text_cdc_chunks: content-defined chunking duplicate signal ---------------
#: expected chunk length in words (boundary where md5(word) % DIV == 0)
#: — the storage-dedup CDC idea (Muthitacharoen et al. 2001, LBFS) at
#: word granularity: boundaries depend only on LOCAL content, so an
#: insertion reshapes at most its own chunk and duplicate runs keep
#: their fingerprints wherever they sit in a document.
_CDC_DIV = 16


def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup signal: split each document at
    content-derived word boundaries (md5(word) mod 16 == 0 starts a new
    chunk), fingerprint each chunk, and report per doc how much of it
    is built from chunks that also appear in OTHER documents — the
    chunk-level complement of whole-doc (exact) and shingle-level
    (jaccard/containment) dedup, robust to block moves and insertions
    the shingle family dilutes.

    Scale shape: one explode, one doc-partitioned running-sum window
    (chunk numbering), one (doc, chunk) agg building the fingerprint,
    one fingerprint-keyed distinct-doc count, one join back keyed by
    fingerprint, one per-doc rollup — every shuffle keyed on doc_id or
    chunk content, all linear; no pair stage (duplicate detection is a
    GROUP BY, never a self-join)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("i", "word")
    ).filter(F.col("word") != "")
    brk = (
        F.conv(F.substring(F.md5(F.col("word")), 1, 15), 16, 10).cast("bigint")
        % _CDC_DIV == 0
    ).cast("long")
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = tok.select(
        "doc_id", "i", "word", F.sum(brk).over(w).alias("chunk_no")
    )
    chunks = (
        numbered.groupBy("doc_id", "chunk_no")
        .agg(F.array_sort(F.collect_list(F.struct("i", "word"))).alias("ps"))
        .select(
            "doc_id", "chunk_no",
            F.md5(F.concat_ws(" ", F.transform("ps", lambda s: s.word))).alias("chash"),
        )
    )
    dup = chunks.groupBy("chash").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    return (
        chunks.join(dup, "chash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("n_docs_with") >= 2).cast("long")).alias("n_dup_chunks"),
        )
        .select(
            "doc_id", "n_chunks", "n_dup_chunks",
            F.expr("(n_dup_chunks * 1000) div n_chunks").alias("dup_pm"),
        )
    )


_CDC_SQL = f"""
WITH tok AS (
    SELECT doc_id, i, word,
           CASE WHEN CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT)
                     % {_CDC_DIV} = 0 THEN 1 ELSE 0 END AS brk
    FROM (
        SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS word
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents)
    ) WHERE word <> ''
),
numbered AS (
    SELECT doc_id, i, word,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS chunk_no
    FROM tok
),
chunks AS (
    SELECT doc_id, chunk_no, md5(string_agg(word, ' ' ORDER BY i)) AS chash
    FROM numbered GROUP BY doc_id, chunk_no
),
dup AS (
    SELECT chash, count(DISTINCT doc_id) AS n_docs_with FROM chunks GROUP BY chash
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_chunks,
       CAST((sum(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) * 1000)
            // count(*) AS BIGINT) AS dup_pm
FROM chunks JOIN dup USING (chash)
GROUP BY doc_id
"""


# --- shared quality-cents kernel ---------------------------------------------
def quality_cents() -> F.Column:
    """The :func:`text_quality_score` heuristic as INTEGER cents
    (floor(raw*100)) over ``text`` — the exact-arithmetic form quality
    CONSUMERS aggregate (float averages are summation-order dependent
    across engines/partitionings; integer cents are not). Shared by
    :func:`corpus_source_audit` and dedup's keeper selection."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    stop_hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\b(the|a|of)\b"), 0))
    raw = (
        F.least(n_words / F.lit(2.0), F.lit(50.0))
        + (n_distinct / n_words) * 30
        + F.least((stop_hits / n_words) * 100, F.lit(20.0))
    )
    return F.floor(raw * 100).cast("bigint")


#: the identical chain in DuckDB SQL (IEEE-identical: same op order)
QC_EXPR_SQL = (
    "CAST(floor((least(len(string_split(text, ' ')) / 2.0, 50.0)"
    " + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)"
    " / len(string_split(text, ' ')) * 30"
    " + least(CAST(len(regexp_extract_all(text, '\\b(the|a|of)\\b', 0)) AS DOUBLE)"
    " / len(string_split(text, ' ')) * 100, 20.0)) * 100) AS BIGINT)"
)


# --- corpus_quality_calibration: quality deciles vs duplication ---------------
def corpus_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter CALIBRATION: split the corpus into quality
    deciles (ntile over the integer quality cents, total-ordered by
    (qc, doc_id) so both engines cut identically) and measure each
    decile's exact-duplication rate — the sanity table behind "does my
    quality score actually separate the junk?" (a filter whose low
    deciles aren't dup-enriched is measuring the wrong thing).

    Scale shape: one scan for (qc, content hash); the ntile is computed
    WITHOUT a corpus-sized global window — ``distributed_row_number``
    (operators/ranks.py) reconstructs the exact global rank from
    histogram-sized offset cumsums (qc is integer cents, distinct
    values ≪ rows) plus windows partitioned by (qc, id-range bucket),
    and the ntile boundary is pure integer arithmetic over (rank, n).
    Output is bit-identical to ``ntile(10) OVER (ORDER BY qc, doc_id)``
    — the oracle keeps the plain window form — but the fattest window
    partition is one (qc, sub-bucket) cell, not the corpus. One
    decile-keyed agg with the dup count via countDistinct rides the
    same shuffle."""
    from codegraph_spark.operators.ranks import distributed_row_number

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "doc_id",
        quality_cents().alias("qc"),
        F.md5(F.lower(F.col("text"))).alias("h"),
    )
    ranked = distributed_row_number(per_doc, "qc", total="n")
    # exact ntile(k): the first (n mod k) tiles hold (n div k + 1) rows
    head = F.expr("(n % 10) * (n div 10 + 1)")
    return (
        ranked.withColumn(
            "decile",
            F.when(F.col("rn") <= head,
                   F.expr("(rn - 1) div (n div 10 + 1) + 1"))
            .otherwise(F.expr(
                "(n % 10) + (rn - (n % 10) * (n div 10 + 1) - 1)"
                " div greatest(n div 10, 1) + 1"))
            .cast("int"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("qc").alias("min_qc"),
            F.max("qc").alias("max_qc"),
            F.countDistinct("h").alias("n_unique"),
        )
        .select(
            "decile", "n_docs", "min_qc", "max_qc",
            F.expr("CAST((n_docs - n_unique) * 1000 div n_docs AS BIGINT)")
            .alias("dup_pm"),
        )
        .orderBy("decile")
    )


_QUALITY_CAL_SQL = f"""
WITH per_doc AS (
    SELECT doc_id, {QC_EXPR_SQL} AS qc, md5(lower(text)) AS h
    FROM documents
),
tiled AS (
    SELECT *, CAST(ntile(10) OVER (ORDER BY qc, doc_id) AS INT) AS decile
    FROM per_doc
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(qc) AS min_qc, max(qc) AS max_qc,
       CAST((count(*) - count(DISTINCT h)) * 1000 // count(*) AS BIGINT) AS dup_pm
FROM tiled
GROUP BY decile
ORDER BY decile
"""


# --- corpus_padding_waste: length-bucketed batching audit ---------------------
_BATCH_SIZE = 32


def corpus_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for fixed-batch training: when batches pad
    every sequence to the batch max, how many pad tokens does each
    batching STRATEGY burn? Compares 'arrival' (batches of 32 in
    doc_id order — what a naive loader does) against 'sorted'
    (length-bucketed: batch neighbors have near-equal lengths — the
    standard fix). One row per (strategy, batch): sizes, token sums,
    and waste in per-mille of the padded volume — the table that
    justifies turning on length bucketing.

    Determinism: integer token counts, total-order ranks (ties by
    doc_id), integer per-mille. Scale shape: one scan for token
    counts; each strategy's global rank comes from
    ``distributed_row_number`` (operators/ranks.py) — histogram-sized
    offset cumsums (token counts are low-cardinality; the arrival
    order needs no histogram at all) plus windows partitioned by
    (key, id-range bucket) — NOT a corpus-sized single-partition rank
    window. Ranks are bit-identical to the plain global window, so the
    oracle keeps the readable ``row_number() OVER (ORDER BY ...)``
    form; batch-keyed aggs follow."""
    from codegraph_spark.operators.ranks import distributed_row_number

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("tok")
    )
    out = []
    for strategy, key, desc in (
        ("arrival", None, False),
        ("sorted", "tok", True),
    ):
        ranked = distributed_row_number(toks, key, descending=desc)
        batched = ranked.withColumn(
            "batch_id", ((F.col("rn") - 1) / _BATCH_SIZE).cast("bigint")
        )
        out.append(
            batched.groupBy("batch_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.max("tok").alias("max_tok"),
                F.sum("tok").alias("sum_tok"),
            )
            .select(
                F.lit(strategy).alias("strategy"),
                "batch_id", "n_docs", "max_tok", "sum_tok",
                (F.col("max_tok") * F.col("n_docs") - F.col("sum_tok")).alias("waste_tok"),
                F.expr(
                    "(max_tok * n_docs - sum_tok) * 1000 div (max_tok * n_docs)"
                ).alias("waste_pm"),
            )
        )
    return out[0].unionByName(out[1]).orderBy("strategy", "batch_id")


_PADDING_WASTE_SQL = f"""
WITH toks AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
    FROM documents
),
arrival AS (
    SELECT 'arrival' AS strategy,
           CAST((row_number() OVER (ORDER BY doc_id) - 1) // {_BATCH_SIZE} AS BIGINT)
               AS batch_id, tok
    FROM toks
),
sorted_b AS (
    SELECT 'sorted' AS strategy,
           CAST((row_number() OVER (ORDER BY tok DESC, doc_id) - 1) // {_BATCH_SIZE} AS BIGINT)
               AS batch_id, tok
    FROM toks
),
both_b AS (SELECT * FROM arrival UNION ALL SELECT * FROM sorted_b)
SELECT strategy, batch_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       max(tok) AS max_tok,
       CAST(sum(tok) AS BIGINT) AS sum_tok,
       CAST(max(tok) * count(*) - sum(tok) AS BIGINT) AS waste_tok,
       CAST((max(tok) * count(*) - sum(tok)) * 1000
            // (max(tok) * count(*)) AS BIGINT) AS waste_pm
FROM both_b
GROUP BY strategy, batch_id
ORDER BY strategy, batch_id
"""


# --- corpus_ccnet_buckets: per-language perplexity terciles -------------------
def corpus_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail bucketing (Wenzek et al. 2020,
    arXiv 1911.00359): within each language, rank documents by the
    bigram-LM fluency score (:func:`text_lm_score` — the KenLM-
    perplexity stand-in) and split into terciles. "head" is what
    CCNet keeps for training, "tail" what it drops; the bucket column
    is the selection label a curation pipeline writes back.

    Determinism: rank ties break on doc_id (total order) and the
    tercile boundary is pure integer arithmetic (rn·3 ≤ n, rn·3 ≤ 2n)
    over the exact integer ppm scores — no float quantile contract.

    Scale shape: the LM scoring is the corpus-mass work (shapes in
    text_lm_score); the bucketing previously added one per-LANGUAGE
    sort window — partitioned, but a dominant language is a
    corpus-fraction-sized sort partition at 100 TB. It now runs
    through ``distributed_row_number`` with ``partition_cols=[lang]``
    (operators/ranks.py): per-(lang, ppm-histogram) offset cumsums
    plus windows partitioned by (lang, ppm, id-range bucket) — ranks
    bit-identical to the plain window (the oracle keeps it), fattest
    window partition = one cell, offsets joined by shuffle (integer
    ppm cardinality is value-range-bounded but too wide to promise a
    broadcast)."""
    from codegraph_spark.operators.ranks import distributed_row_number

    scores = text_lm_score(spark, sf_dir).select("doc_id", "avg_ppm")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = docs.join(scores, "doc_id")
    ranked = distributed_row_number(
        j, "avg_ppm", partition_cols=["lang"], descending=True,
        total="n", broadcast_offsets=False,
    )
    return (
        ranked
        .select(
            "doc_id", "lang", "avg_ppm",
            F.when(F.col("rn") * 3 <= F.col("n"), "head")
            .when(F.col("rn") * 3 <= 2 * F.col("n"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


def _ccnet_buckets_sql() -> str:
    return f"""
WITH lm AS ({_LM_SQL}),
ranked AS (
    SELECT d.doc_id, d.lang, lm.avg_ppm,
           row_number() OVER (PARTITION BY d.lang
                              ORDER BY lm.avg_ppm DESC, d.doc_id) AS rn,
           count(*) OVER (PARTITION BY d.lang) AS n
    FROM documents d JOIN lm ON lm.doc_id = d.doc_id
)
SELECT doc_id, lang, avg_ppm,
       CASE WHEN rn * 3 <= n THEN 'head'
            WHEN rn * 3 <= 2 * n THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
"""


# --- corpus_source_audit: per-source curation dashboard -----------------------
def corpus_source_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE curation dashboard — the table a crawl-intake review
    reads before admitting a provider into the training mix (the CCNet
    / RefinedWeb curation stance: quality and duplication are judged
    per origin, and a bad source is dropped wholesale): doc count,
    language spread, within-source exact-duplication rate (per-mille),
    mean quality (milli-points — integer arithmetic over the same
    floor(raw*100) cents :func:`text_quality_score` emits, because
    float averages are summation-order dependent across engines), and
    mean document length.

    Scale shape: ONE scan computes every per-doc column (hash, quality
    cents, length) inside whole-stage codegen, then ONE partial-agg
    shuffle keyed by source; the two countDistincts ride the same
    shuffle (expand), and the output is source-count-sized. Nothing
    else touches the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source", "lang",
        F.md5(F.lower(F.col("text"))).alias("h"),
        quality_cents().alias("qc"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("h").alias("n_unique"),
        F.sum("qc").alias("sum_qc"),
        F.sum("n_chars").alias("sum_chars"),
    )
    return agg.select(
        "source", "n_docs", "n_langs",
        F.expr("CAST((n_docs - n_unique) * 1000 div n_docs AS BIGINT)").alias("dup_pm"),
        F.expr("CAST(sum_qc * 10 div n_docs AS BIGINT)").alias("mean_quality_md"),
        F.expr("CAST(sum_chars div n_docs AS BIGINT)").alias("mean_chars"),
    ).orderBy("source")


_SOURCE_AUDIT_SQL = f"""
WITH per_doc AS (
    SELECT source, lang, md5(lower(text)) AS h,
           {QC_EXPR_SQL} AS qc,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
)
SELECT source, n_docs, n_langs,
       CAST((n_docs - n_unique) * 1000 // n_docs AS BIGINT) AS dup_pm,
       CAST(sum_qc * 10 // n_docs AS BIGINT) AS mean_quality_md,
       CAST(sum_chars // n_docs AS BIGINT) AS mean_chars
FROM (
    SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
           count(DISTINCT h) AS n_unique,
           CAST(sum(qc) AS BIGINT) AS sum_qc,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM per_doc GROUP BY source
)
ORDER BY source
"""


# --- corpus_token_budget_plan: epochs-per-source planner -----------------------
#: training-token budget as a multiple of the corpus, and the repeat
#: ceiling per source: Muennighoff et al. 2023 ("Scaling
#: data-constrained language models") measures repeated data as
#: near-fresh up to ~4 epochs — the standard cap a mixing plan applies.
_BUDGET_X = 2
_EPOCH_CAP_MILLI = 4000


def corpus_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget ALLOCATION plan — the table a data-mixing config
    is generated from: given a training budget of ``_BUDGET_X`` ×
    the corpus token mass, split it across sources by
    temperature-0.5 sampling (weight ∝ √tokens — small sources
    upweighted, the multilingual-mixing standard), then cap every
    source at :data:`_EPOCH_CAP_MILLI` milli-epochs (repeating past
    ~4 epochs teaches little) and report the undistributed remainder
    so the caller can see how much budget the caps free up.

    Exactness: weights are floored to integer milli BEFORE the
    cross-source sum, so every downstream ratio is pure integer
    arithmetic — no cross-row float accumulation to drift between
    engines (the corpus_source_audit discipline). The
    budget×tokens×weight product is evaluated in 38-digit decimal
    (Spark DECIMAL(38,0), DuckDB HUGEINT) because at full corpus
    scale (t_total ~1e13 tokens, w ~3e9 milli) the int64 product
    wraps; 2·1e13·3e9 ≈ 6e22 sits comfortably inside 38 digits, so
    the arithmetic stays exact up to ~1e38 — far past 100 TB.
    Scale shape: one
    scan → one source-keyed agg (bounded distinct sources), a 1-row
    totals broadcast, and an output-sized projection. No windows, no
    joins beyond the scalar broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("bigint").alias("tok"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn(
            "w", F.floor(F.sqrt(F.col("tok").cast("double")) * 1000)
            .cast("bigint")
        )
    )
    totals = per_src.agg(
        F.sum("tok").alias("t_total"), F.sum("w").alias("w_total")
    )
    planned = (
        per_src.crossJoin(F.broadcast(totals))
        .withColumn(
            "raw_alloc",
            F.expr(
                f"CAST(CAST({_BUDGET_X} AS DECIMAL(38,0)) * t_total * w"
                " div w_total AS BIGINT)"
            ),
        )
        .withColumn(
            "alloc_tokens",
            F.least(
                F.col("raw_alloc"),
                F.expr(f"CAST(tok * {_EPOCH_CAP_MILLI} div 1000 AS BIGINT)"),
            ),
        )
    )
    return planned.select(
        "source",
        "tok",
        "n_docs",
        "alloc_tokens",
        F.expr("CAST(alloc_tokens * 1000 div tok AS BIGINT)")
        .alias("epochs_milli"),
        (F.col("raw_alloc") > F.col("alloc_tokens")).alias("capped"),
        F.expr("CAST(raw_alloc - alloc_tokens AS BIGINT)").alias("freed_tokens"),
    ).orderBy("source")


_BUDGET_PLAN_SQL = f"""
WITH per_src AS (
    SELECT source,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok,
           count(*) AS n_docs
    FROM documents GROUP BY source
),
weighted AS (
    SELECT *, CAST(floor(sqrt(CAST(tok AS DOUBLE)) * 1000) AS BIGINT) AS w
    FROM per_src
),
totals AS (
    SELECT CAST(sum(tok) AS BIGINT) AS t_total,
           CAST(sum(w) AS BIGINT) AS w_total
    FROM weighted
),
planned AS (
    SELECT source, tok, n_docs,
           CAST(CAST({_BUDGET_X} AS HUGEINT) * t_total * w // w_total
                AS BIGINT) AS raw_alloc,
           least(CAST(CAST({_BUDGET_X} AS HUGEINT) * t_total * w // w_total
                      AS BIGINT),
                 tok * {_EPOCH_CAP_MILLI} // 1000) AS alloc_tokens
    FROM weighted, totals
)
SELECT source, tok, n_docs,
       CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
       CAST(alloc_tokens * 1000 // tok AS BIGINT) AS epochs_milli,
       raw_alloc > alloc_tokens AS capped,
       CAST(raw_alloc - alloc_tokens AS BIGINT) AS freed_tokens
FROM planned
ORDER BY source
"""


# --- text_quality_classifier: trained bag-of-words quality model --------------
#
# The model-based quality filter of the big LLM corpora (GPT-3's
# WebText-vs-crawl logistic filter, CCNet's wiki-vs-crawl fastText,
# Gopher/Llama reproductions): TRAIN a linear bag-of-words classifier
# on labeled seed documents, score everything else, keep the
# high-quality side. Here the full loop runs inside the engine:
# multinomial Naive Bayes token weights learned on a doc_id%5<4 train
# split, evaluated on the held-out %5==4 split, confusion matrix out.
#
# Ground truth is a PLANTED label rule (the wrap pattern — both
# engines replay it, the classifier does NOT see it): a doc is 'lo'
# quality iff it contains more 'slow' tokens than 'fast' tokens. The
# classifier must recover that rule from bag-of-words evidence alone —
# training assigns heavy class-odds weights to exactly those tokens
# (plus their co-occurrence noise), so held-out accuracy measurably
# beats the class prior (pinned in tests/test_quality_classifier.py).
#
# Cross-engine exactness: NB log-probabilities are QUANTIZED to a
# 1/16-bit piecewise-linear integer log2 — for smoothed inverse
# probability r = ((tot_c + V) * 256) div (c_tc + 1):
#     logq(r) = 16*(msb(r)-1) + (r*16 div 2^msb(r)-1) - 16
#             ≈ 16 * log2(r)            (monotone, exact integers)
#     w(t,c)  = 1152 - logq(r)          (1152 = 16*72 keeps w > 0)
# where msb(r) = length(bin(r)). A plain floor(log2) bucket (the
# obvious quantization) floors AWAY the planted signal — measured
# held-out accuracy 0.57 vs 0.55 prior; the mantissa interpolation
# term recovers it (see tests/test_quality_classifier.py's margin
# pin). All arithmetic is BIGINT-exact on both engines with no float
# log anywhere; the *256 scale bounds the formulation to corpora
# with tot_c + V <= 2^51 tokens (the interpolation term computes
# rs*16, so rs=(tot_c+V)*256 must stay under 2^63/16 — ~4 PB of
# text, comfortably past the 100 TB target; past that, drop the
# scale to *16, which moves the bound to 2^55). Unseen-at-
# train tokens are skipped (the standard multinomial NB inference
# choice); the class prior rides as a sentinel pseudo-token so the
# score is one inner join + one sum, no scalar plumbing. Ties break
# to 'hi' (sh >= sl), replayed by the oracle.
#
# Scale shape: one token-count shuffle over the TRAIN split (vocab
# build), one vocab-keyed join from test tokens to the weight table
# (vocab is a dimension — AQE broadcasts it), one per-doc score agg,
# one bounded confusion rollup. Linear in corpus tokens; training a
# real logistic head would add only iterated versions of the same
# aggregations.

#: sentinel pseudo-token carrying the class-prior weight (space-split
#: corpus tokens can never equal it)
_NBQ_PRIOR = "⟨prior⟩"


def _nbq_w_spark(rs: str) -> "F.Column":
    """1152 - logq(rs) as a Spark expression over BIGINT column ``rs``
    (see the quantization comment above)."""
    return F.expr(
        f"CAST(1152 - (16 * (length(bin({rs})) - 1)"
        f" + ({rs} * 16) div shiftleft(CAST(1 AS BIGINT),"
        f" length(bin({rs})) - 1) - 16) AS BIGINT)"
    )


def _nbq_w_sql(rs: str) -> str:
    """The identical weight formula over DuckDB column ``rs``."""
    return (
        f"CAST(1152 - (16 * (length(bin({rs})) - 1)"
        f" + ({rs} * 16) // (CAST(1 AS BIGINT)"
        f" << (length(bin({rs})) - 1)) - 16) AS BIGINT)"
    )


def nbq_model(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train the quantized-NB quality model: returns ``(labeled,
    wtab)`` — every document with its planted label and token array,
    and the learned weight table (token, w_hi, w_lo) including the
    prior pseudo-token. Training always uses the doc_id%5<4 split;
    callers choose what to SCORE (the held-out gate scores the %5==4
    split, the domain-curation rollup scores everything)."""
    words = F.split(F.col("text"), " ")
    n_slow = F.size(F.filter(words, lambda w: w == F.lit("slow")))
    n_fast = F.size(F.filter(words, lambda w: w == F.lit("fast")))
    labeled = docs.select(
        "doc_id",
        "source",
        F.when(n_slow > n_fast, "lo").otherwise("hi").alias("actual"),
        words.alias("ws"),
    )
    train = labeled.filter(F.col("doc_id") % 5 < 4)
    ttoks = train.select("actual", F.explode("ws").alias("token"))
    vocab = ttoks.groupBy("token").agg(
        F.sum(F.when(F.col("actual") == "hi", 1).otherwise(0)).alias("c_hi"),
        F.sum(F.when(F.col("actual") == "lo", 1).otherwise(0)).alias("c_lo"),
    )
    gv = vocab.agg(
        F.count(F.lit(1)).alias("nv"),
        F.coalesce(F.sum("c_hi"), F.lit(0)).alias("tot_hi"),
        F.coalesce(F.sum("c_lo"), F.lit(0)).alias("tot_lo"),
    )
    gd = train.agg(
        F.count(F.lit(1)).alias("n_train"),
        F.coalesce(
            F.sum(F.when(F.col("actual") == "hi", 1).otherwise(0)), F.lit(0)
        ).alias("n_hi"),
    )
    weights = (
        vocab.crossJoin(F.broadcast(gv))
        .select(
            "token",
            F.expr("((tot_hi + nv) * 256) div (c_hi + 1)").alias("rs_hi"),
            F.expr("((tot_lo + nv) * 256) div (c_lo + 1)").alias("rs_lo"),
        )
        .select(
            "token",
            _nbq_w_spark("rs_hi").alias("w_hi"),
            _nbq_w_spark("rs_lo").alias("w_lo"),
        )
    )
    prior = gd.select(
        F.lit(_NBQ_PRIOR).alias("token"),
        F.expr("((n_train + 2) * 256) div (n_hi + 1)").alias("rs_hi"),
        F.expr("((n_train + 2) * 256) div (n_train - n_hi + 1)").alias("rs_lo"),
    ).select(
        "token",
        _nbq_w_spark("rs_hi").alias("w_hi"),
        _nbq_w_spark("rs_lo").alias("w_lo"),
    )
    return labeled, weights.unionByName(prior)


def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out confusion matrix (actual × predicted, with idsum
    pinning every individual decision) of the trained NB quality
    model. See the module comment above for the design."""
    # repartition before the tokenize/label projections (single-file
    # local source = one partition; the _shingles_of rationale)
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    labeled, wtab = nbq_model(docs)
    test = labeled.filter(F.col("doc_id") % 5 == 4)
    xt = test.select(
        "doc_id",
        "actual",
        F.explode(
            F.concat(F.array(F.lit(_NBQ_PRIOR)), F.col("ws"))
        ).alias("token"),
    )
    sc = xt.join(wtab, "token").groupBy("doc_id", "actual").agg(
        F.sum("w_hi").alias("sh"), F.sum("w_lo").alias("sl")
    )
    dec = sc.select(
        "doc_id",
        "actual",
        F.when(F.col("sh") >= F.col("sl"), "hi").otherwise("lo")
        .alias("predicted"),
    )
    return (
        dec.groupBy("actual", "predicted")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("idsum"),
        )
        .orderBy("actual", "predicted")
    )


#: the shared model CTE chain (corpus -> labels -> trained weight
#: table) — _NBQ_SQL scores the held-out split over it; the
#: web_domain_curation oracle (queries/web.py) scores ALL docs over
#: the same chain. KEEP IN LOCKSTEP with nbq_model().
_NBQ_MODEL_CTES = f"""
lab AS (
    SELECT doc_id, source,
           CASE WHEN len(list_filter(string_split(text, ' '),
                                     w -> w = 'slow'))
                   > len(list_filter(string_split(text, ' '),
                                     w -> w = 'fast'))
                THEN 'lo' ELSE 'hi' END AS actual,
           string_split(text, ' ') AS ws
    FROM documents
),
train AS (SELECT * FROM lab WHERE doc_id % 5 < 4),
test AS (SELECT * FROM lab WHERE doc_id % 5 = 4),
ttoks AS (SELECT actual, unnest(ws) AS token FROM train),
vocab AS (
    SELECT token,
           sum(CASE WHEN actual = 'hi' THEN 1 ELSE 0 END) AS c_hi,
           sum(CASE WHEN actual = 'lo' THEN 1 ELSE 0 END) AS c_lo
    FROM ttoks GROUP BY token
),
gv AS (
    SELECT count(*) AS nv,
           coalesce(sum(c_hi), 0) AS tot_hi,
           coalesce(sum(c_lo), 0) AS tot_lo
    FROM vocab
),
gd AS (
    SELECT count(*) AS n_train,
           coalesce(sum(CASE WHEN actual = 'hi' THEN 1 ELSE 0 END), 0)
               AS n_hi
    FROM train
),
wrs AS (
    SELECT token,
           ((tot_hi + nv) * 256) // (c_hi + 1) AS rs_hi,
           ((tot_lo + nv) * 256) // (c_lo + 1) AS rs_lo
    FROM vocab, gv
),
weights AS (
    SELECT token,
           {_nbq_w_sql('rs_hi')} AS w_hi,
           {_nbq_w_sql('rs_lo')} AS w_lo
    FROM wrs
),
prs AS (
    SELECT ((n_train + 2) * 256) // (n_hi + 1) AS rs_hi,
           ((n_train + 2) * 256) // (n_train - n_hi + 1) AS rs_lo
    FROM gd
),
prior AS (
    SELECT '{_NBQ_PRIOR}' AS token,
           {_nbq_w_sql('rs_hi')} AS w_hi,
           {_nbq_w_sql('rs_lo')} AS w_lo
    FROM prs
),
wtab AS (SELECT * FROM weights UNION ALL SELECT * FROM prior)
"""

_NBQ_SQL = f"""
WITH {_NBQ_MODEL_CTES},
xt AS (
    SELECT doc_id, actual,
           unnest(list_prepend('{_NBQ_PRIOR}', ws)) AS token
    FROM test
),
sc AS (
    SELECT doc_id, actual, sum(w.w_hi) AS sh, sum(w.w_lo) AS sl
    FROM xt JOIN wtab w USING (token)
    GROUP BY doc_id, actual
),
dec AS (
    SELECT doc_id, actual,
           CASE WHEN sh >= sl THEN 'hi' ELSE 'lo' END AS predicted
    FROM sc
)
SELECT actual, predicted,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS idsum
FROM dec
GROUP BY actual, predicted
ORDER BY actual, predicted
"""


# --- text_classifier_calibration: margin-bucket reliability audit -------------
#
# The ML-ops check that decides whether a trained filter's score can
# be THRESHOLDED (the way every quality-filtered corpus uses it):
# bucket the held-out margin (score_hi - score_lo) and report the
# observed 'hi' rate per bucket — a calibrated model's bucket curve
# rises monotonically, and the pipeline picks its keep-threshold off
# this table (the reliability-diagram / ECE input, in integers).
# Shares nbq_model; margin div 32 buckets (trunc division — Spark
# `div` and DuckDB `//` agree on negatives), idsum pins membership.

#: margin units per calibration bucket
_CALIB_BUCKET_W = 32


def text_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out reliability table of the NB quality model."""
    # repartition before the tokenize/label projections (single-file
    # local source = one partition; the _shingles_of rationale)
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    labeled, wtab = nbq_model(docs)
    test = labeled.filter(F.col("doc_id") % 5 == 4)
    xt = test.select(
        "doc_id",
        "actual",
        F.explode(
            F.concat(F.array(F.lit(_NBQ_PRIOR)), F.col("ws"))
        ).alias("token"),
    )
    sc = xt.join(wtab, "token").groupBy("doc_id", "actual").agg(
        (F.sum("w_hi") - F.sum("w_lo")).alias("margin")
    )
    return (
        sc.select(
            "doc_id", "actual",
            F.expr(f"margin div {_CALIB_BUCKET_W}").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("actual") == "hi", 1).otherwise(0))
            .cast("bigint").alias("n_hi"),
            F.expr(
                "CAST(sum(CASE WHEN actual = 'hi' THEN 1 ELSE 0 END)"
                " * 1000 div count(1) AS BIGINT)"
            ).alias("hi_pm"),
            F.sum("doc_id").cast("bigint").alias("idsum"),
        )
        .orderBy("bucket")
    )


_CALIB_CLS_SQL_TMPL = """
WITH {model_ctes},
xt AS (
    SELECT doc_id, actual,
           unnest(list_prepend('{prior}', ws)) AS token
    FROM lab WHERE doc_id % 5 = 4
),
sc AS (
    SELECT doc_id, actual, sum(w.w_hi) - sum(w.w_lo) AS margin
    FROM xt JOIN wtab w USING (token)
    GROUP BY doc_id, actual
)
SELECT CAST(margin // {bw} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN actual = 'hi' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hi,
       CAST(sum(CASE WHEN actual = 'hi' THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS hi_pm,
       CAST(sum(doc_id) AS BIGINT) AS idsum
FROM sc
GROUP BY bucket
ORDER BY bucket
"""


def _calib_cls_sql() -> str:
    return (
        _CALIB_CLS_SQL_TMPL
        .replace("{model_ctes}", _NBQ_MODEL_CTES)
        .replace("{prior}", _NBQ_PRIOR)
        .replace("{bw}", str(_CALIB_BUCKET_W))
    )


QUERIES = {
    "text_quality_classifier": text_quality_classifier,
    "text_classifier_calibration": text_classifier_calibration,
    "corpus_token_budget_plan": corpus_token_budget_plan,
    "corpus_quality_calibration": corpus_quality_calibration,
    "corpus_padding_waste": corpus_padding_waste,
    "corpus_ccnet_buckets": corpus_ccnet_buckets,
    "corpus_source_audit": corpus_source_audit,
    "text_langid": text_langid,
    "text_gopher_quality": text_gopher_quality,
    "corpus_dsir_sample": corpus_dsir_sample,
    "text_cdc_chunks": text_cdc_chunks,
    "text_length_profile": text_length_profile,
    "text_lm_score": text_lm_score,
    "text_dup_ngram_coverage": text_dup_ngram_coverage,
    "corpus_filter_funnel": corpus_filter_funnel,
    "text_quality_score": text_quality_score,
    "text_token_count": text_token_count,
    "text_fingerprint": text_fingerprint,
    "sample_stratified": sample_stratified,
    "corpus_split": corpus_split,
    "corpus_mix_summary": corpus_mix_summary,
    "text_pii_flag": text_pii_flag,
    "text_repetition": text_repetition,
    "corpus_pack_shards": corpus_pack_shards,
    "text_cross_doc_coverage": text_cross_doc_coverage,
    "corpus_temperature_mix": corpus_temperature_mix,
    "corpus_split_leakage": corpus_split_leakage,
}

ORACLES = {
    "text_quality_classifier": _NBQ_SQL,
    "text_classifier_calibration": _calib_cls_sql(),
    "corpus_token_budget_plan": _BUDGET_PLAN_SQL,
    "corpus_quality_calibration": _QUALITY_CAL_SQL,
    "corpus_padding_waste": _PADDING_WASTE_SQL,
    "corpus_ccnet_buckets": _ccnet_buckets_sql(),
    "corpus_source_audit": _SOURCE_AUDIT_SQL,
    "text_gopher_quality": _GOPHER_SQL,
    "corpus_dsir_sample": _DSIR_SQL,
    "text_cdc_chunks": _CDC_SQL,
    "corpus_split_leakage": _split_leakage_sql(),
    "text_cross_doc_coverage": _XDOC_SQL,
    "corpus_temperature_mix": _TEMP_MIX_SQL,
    "text_length_profile": _LENGTH_PROFILE_SQL,
    "text_lm_score": _LM_SQL,
    "text_dup_ngram_coverage": _dup_coverage_sql(),
    "corpus_filter_funnel": _FILTER_FUNNEL_SQL,
    "corpus_split": _SPLIT_SQL,
    "text_pii_flag": _PII_SQL,
    "text_repetition": _REPETITION_SQL,
    "corpus_pack_shards": _PACK_SQL,
    "text_langid": _LANGID_SQL,
    "text_quality_score": _QUALITY_SQL,
    "text_token_count": _TOKENS_SQL,
    "text_fingerprint": _FINGERPRINT_SQL,
    "sample_stratified": _SAMPLE_SQL,
    "corpus_mix_summary": _MIX_SQL,
}
