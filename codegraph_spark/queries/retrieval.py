"""Ranked-retrieval extensions: BM25 scoring and corpus vocabulary
profiling over the ``documents`` table.

The reference's search surface is substring + CASE rank
(pkg/neo4j/query.go:348-414, mirrored by o1_search_ranked); a
training-data pipeline additionally needs term-statistics retrieval —
BM25 for quality-targeted corpus slicing and a document-frequency
vocabulary for tokenizer construction / stopword induction.

Scale notes (100 TB stance):
- Document length and the global average length never explode tokens:
  ``dl`` is a per-row ``size(split(...))`` and ``avgdl`` an exact
  integer-sum aggregate (summation-order-independent, unlike a double
  sum), broadcast back as one row.
- Only QUERY terms are exploded for tf (the explode is filtered by a
  broadcast literal array before the shuffle), so the tf aggregation
  shuffles O(matches), not O(corpus tokens).
- The per-term document frequencies are a 3-row aggregate — broadcast
  joined, never shuffling the corpus side.
- The vocabulary profile pre-aggregates (term, doc) map-side before
  counting distinct docs, the standard two-stage distinct; the
  100 TB swap is approx_count_distinct + a df cutoff, documented on
  the operator.
- Per-document scores are combined via fixed-order singleton-max
  columns, NOT a float sum aggregate, so the result is bit-identical
  across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codegraph_spark.sources.tables import load_table

_BM25_TERMS = ["fast", "vector", "window"]
_K1 = 1.2
_B = 0.75


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a fixed conjunctive-OR term query.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)); score(d) = sum over
    matched terms of idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    Scores are rounded to 4 decimals in-query on both engines and the
    ordering ties break on doc_id, so the top-10 is deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    ).select("doc_id", "toks", F.size("toks").cast("bigint").alias("dl"))

    # Exact global avgdl from integer sums (deterministic double).
    stats = base.agg(
        F.sum("dl").alias("tot"), F.count(F.lit(1)).alias("n_docs")
    ).select(
        (F.col("tot").cast("double") / F.col("n_docs")).alias("avgdl"),
        F.col("n_docs").cast("double").alias("n"),
    )

    # tf over query terms only: filter the token array BEFORE exploding.
    tf = (
        base.select(
            "doc_id", "dl",
            F.explode(F.filter("toks", lambda t: t.isin(_BM25_TERMS))).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )

    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "term",
            (
                F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (_K1 + 1.0))
                / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl")))
            ).alias("contrib"),
        )
    )
    # Fixed-order singleton-max combination: one contrib row exists per
    # (doc, term), so max() selects it without float-sum order effects.
    per_doc = scored.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("contrib"))).alias(f"s_{t}")
            for t in _BM25_TERMS
        ]
    )
    total = per_doc.select(
        "doc_id",
        F.round(
            sum((F.coalesce(F.col(f"s_{t}"), F.lit(0.0)) for t in _BM25_TERMS), F.lit(0.0)),
            4,
        ).alias("score"),
    )
    return total.orderBy(F.desc("score"), "doc_id").limit(10)


_BM25_SQL = f"""
WITH base AS (
    SELECT doc_id, string_split(lower(text), ' ') AS toks,
           CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
    FROM documents
),
stats AS (
    SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
           CAST(COUNT(*) AS DOUBLE) AS n
    FROM base
),
tf AS (
    SELECT doc_id, dl, t.term AS term, CAST(COUNT(*) AS DOUBLE) AS tf
    FROM base, unnest(list_filter(toks, x -> x IN ('fast', 'vector', 'window'))) AS t(term)
    GROUP BY doc_id, dl, t.term
),
dfreq AS (
    SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
),
scored AS (
    SELECT tf.doc_id, tf.term,
           ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (tf.tf * ({_K1} + 1.0))
             / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * tf.dl / stats.avgdl)) AS contrib
    FROM tf JOIN dfreq USING (term) CROSS JOIN stats
),
per_doc AS (
    SELECT doc_id,
           MAX(CASE WHEN term = 'fast' THEN contrib END) AS s_fast,
           MAX(CASE WHEN term = 'vector' THEN contrib END) AS s_vector,
           MAX(CASE WHEN term = 'window' THEN contrib END) AS s_window
    FROM scored GROUP BY doc_id
)
SELECT doc_id,
       ROUND(COALESCE(s_fast, 0.0) + COALESCE(s_vector, 0.0)
             + COALESCE(s_window, 0.0), 4) AS score
FROM per_doc
ORDER BY score DESC, doc_id
LIMIT 10
"""


def vocab_top_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile: top-50 terms by document frequency
    (ties by term), with collection frequency alongside — the
    stopword-induction / tokenizer-vocabulary primer. Exact distinct
    here (the gate needs bit-equality); at 100 TB swap the countDistinct
    for approx_count_distinct and add a min-df cutoff."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    ).filter(F.col("term") != "")
    prof = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("coll_freq"),
    )
    return prof.orderBy(F.desc("doc_freq"), "term").limit(50)


_VOCAB_SQL = """
SELECT term, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS coll_freq
FROM (
    SELECT doc_id, t.term AS term
    FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
    WHERE t.term <> ''
)
GROUP BY term
ORDER BY doc_freq DESC, term
LIMIT 50
"""


def vocab_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge iteration of tokenizer training: count every
    adjacent character pair across all token occurrences and rank the
    top-20 merge candidates. The pair enumeration happens INSIDE the
    row (transform over an index sequence — no per-character explode
    before the aggregation's map-side combine), so the shuffle carries
    (pair, partial count), never raw characters. Iterating this
    operator with a merge-and-recount loop is BPE training; one round
    is the gate-checkable unit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    ).filter(F.length("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substr(t, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


_BPE_SQL = """
SELECT pair, count(*) AS n
FROM (
    SELECT unnest(list_transform(range(1, length(t)), i -> substr(t, i, 2))) AS pair
    FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
    )
    WHERE length(t) >= 2
)
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""


# --- vocab_oov_rate: per-document out-of-vocabulary profile -------------------
_OOV_VOCAB_K = 30  # reference vocabulary: top-K terms by document frequency


def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-health metric: per-document rate (per-mille, integer)
    of token OCCURRENCES outside the top-K df vocabulary — the check
    that catches a domain shift or encoding glitch flooding a corpus
    drop with unknown tokens before tokenizer training sees it.

    Vocabulary induction is one map-side-combining df aggregation +
    deterministic top-K (ties by term); membership is a broadcast
    anti-semi pattern — the token stream is scanned ONCE, never
    shuffled on the doc key until the final per-doc agg. At 100 TB the
    vocabulary is a fixed-K broadcast regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    ).filter(F.col("term") != "")
    vocab = F.broadcast(
        toks.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(_OOV_VOCAB_K)
        .select("term")
        .withColumn("_in", F.lit(1))
    )
    return (
        toks.join(vocab, "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.count(F.lit(1)) - F.sum(F.coalesce(F.col("_in"), F.lit(0))))
            .alias("n_oov"),
            F.expr(
                "(count(*) - sum(coalesce(_in, 0))) * 1000 div count(*)"
            ).alias("oov_pm"),
        )
    )


_OOV_SQL = f"""
WITH toks AS (
    SELECT doc_id, t.term AS term
    FROM documents, unnest(string_split(lower(text), ' ')) AS t(term)
    WHERE t.term <> ''
),
vocab AS (
    SELECT term FROM (
        SELECT term, count(DISTINCT doc_id) AS df
        FROM toks GROUP BY term
        ORDER BY df DESC, term
        LIMIT {_OOV_VOCAB_K}
    )
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
           AS oov_pm
FROM toks LEFT JOIN vocab v USING (term)
GROUP BY doc_id
"""


QUERIES = {
    "text_bm25_search": text_bm25_search,
    "vocab_top_df": vocab_top_df,
    "vocab_bpe_pairs": vocab_bpe_pairs,
    "vocab_oov_rate": vocab_oov_rate,
}

ORACLES = {
    "text_bm25_search": _BM25_SQL,
    "vocab_top_df": _VOCAB_SQL,
    "vocab_bpe_pairs": _BPE_SQL,
    "vocab_oov_rate": _OOV_SQL,
}
