"""Document-pipeline operators on the documents table (SURVEY §2.6
F10-F17 — the reference's markdown/feature extraction, re-expressed over
the driver's synthetic corpus).

Reference: pkg/indexer/documents/parser.go — title regex (:193-213),
doc-type inference (:215-241), feature regexes (:113-119), status
keywords (:259-285), paragraph chunking (:51-90), and the byte-precise
source slice from pkg/neo4j/query.go:477-492 (F10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codegraph_spark.sources.tables import load_table


# --- f10: source slice by offset range (query.go:477-492) -------------------
def f10_source_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-range slice with the reference's 0-based offsets mapped onto
    1-based substring (the off-by-one oracle, system_test.go:454-512).
    Offsets derived per-doc: start = doc_id % 10, length 30."""
    docs = load_table(spark, sf_dir, "documents")
    start0 = (F.col("doc_id") % 10).cast("int")  # 0-based, like startByte
    return docs.select(
        "doc_id",
        F.substring(F.col("text"), start0 + 1, 30).alias("slice"),
        F.length("text").alias("text_len"),
    )


_F10_SQL = """
SELECT doc_id,
       substr(text, CAST(doc_id % 10 AS INT) + 1, 30) AS slice,
       length(text) AS text_len
FROM documents
"""


# --- f11+f12: title + doc-type inference (parser.go:193-241) -----------------
def f11_title_doctype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title = first three words (the '# heading' analog); doc type
    inferred by chained keyword matching on the source field."""
    docs = load_table(spark, sf_dir, "documents")
    title = F.regexp_extract(F.col("text"), r"^(\w+ \w+ \w+)", 1)
    doc_type = (
        F.when(F.col("source").isin("src0", "src1", "src2", "src3"), "README")
        .when(F.col("source").isin("src4", "src5", "src6", "src7"), "RFC")
        .when(F.col("source").isin("src8", "src9", "src10", "src11"), "Specification")
        .when(F.col("source").isin("src12", "src13", "src14", "src15"), "Architecture")
        .otherwise("Markdown Document")
    )
    return docs.select("doc_id", title.alias("title"), doc_type.alias("doc_type"))


_F11_SQL = r"""
SELECT doc_id,
       regexp_extract(text, '^(\w+ \w+ \w+)', 1) AS title,
       CASE WHEN source IN ('src0','src1','src2','src3') THEN 'README'
            WHEN source IN ('src4','src5','src6','src7') THEN 'RFC'
            WHEN source IN ('src8','src9','src10','src11') THEN 'Specification'
            WHEN source IN ('src12','src13','src14','src15') THEN 'Architecture'
            ELSE 'Markdown Document' END AS doc_type
FROM documents
"""


# --- f13+f14: feature extraction via regex + explode (parser.go:113-159) -----
def f13_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all over the corpus + explode + stoplist filter +
    per-feature counts — the batch form of the reference's per-doc
    feature regex loop."""
    docs = load_table(spark, sf_dir, "documents")
    feats = F.regexp_extract_all(F.col("text"), F.lit(r"\b(query|merge|join|stream|window)\b"), 1)
    return (
        docs.select("doc_id", F.explode(feats).alias("feature"))
        .filter(~F.col("feature").isin("the", "a"))  # generic-word stoplist shape
        .groupBy("feature")
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


_F13_SQL = r"""
SELECT feature, count(*) AS n_mentions, count(DISTINCT doc_id) AS n_docs
FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\b(query|merge|join|stream|window)\b', 1)) AS feature
    FROM documents
)
WHERE feature NOT IN ('the', 'a')
GROUP BY feature
"""


# --- f15: status keyword inference (parser.go:259-285) -----------------------
def f15_status_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins chained keyword → status (completed/in_progress/
    planned/documented)."""
    docs = load_table(spark, sf_dir, "documents")
    status = (
        F.when(F.col("text").contains("merge"), "completed")
        .when(F.col("text").contains("stream"), "in_progress")
        .when(F.col("text").contains("window"), "planned")
        .otherwise("documented")
    )
    return docs.select("doc_id", status.alias("status"))


_F15_SQL = """
SELECT doc_id,
       CASE WHEN text LIKE '%merge%' THEN 'completed'
            WHEN text LIKE '%stream%' THEN 'in_progress'
            WHEN text LIKE '%window%' THEN 'planned'
            ELSE 'documented' END AS status
FROM documents
"""


# --- f17: bounded chunking (parser.go:51-90) ----------------------------------
def f17_chunk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-window chunking: posexplode the token stream, assign chunk
    ids of 20 words (the reference chunks paragraphs bounded at 1000
    words), count tokens per chunk."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    exploded = docs.select("doc_id", F.posexplode(words).alias("pos", "word"))
    return (
        exploded.withColumn("chunk_id", (F.col("pos") / 20).cast("bigint"))
        .groupBy("doc_id", "chunk_id")
        .agg(F.count("*").alias("n_words"))
    )


_F17_SQL = """
SELECT doc_id, chunk_id, count(*) AS n_words
FROM (
    SELECT doc_id,
           CAST(floor((generate_subscripts(string_split(text, ' '), 1) - 1) / 20) AS BIGINT) AS chunk_id
    FROM documents
)
GROUP BY doc_id, chunk_id
"""


QUERIES = {
    "f10_source_slice": f10_source_slice,
    "f11_title_doctype": f11_title_doctype,
    "f13_feature_extract": f13_feature_extract,
    "f15_status_infer": f15_status_infer,
    "f17_chunk_words": f17_chunk_words,
}

ORACLES = {
    "f10_source_slice": _F10_SQL,
    "f11_title_doctype": _F11_SQL,
    "f13_feature_extract": _F13_SQL,
    "f15_status_infer": _F15_SQL,
    "f17_chunk_words": _F17_SQL,
}
