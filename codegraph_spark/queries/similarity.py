"""Similarity search over the embeddings table (north-star §M7):
brute-force cosine top-k as the correctness baseline, and an IVF-style
bucketed variant (per-label centroids → probe nearest bucket) as the
scale path — at 100 TB the bucket assignment bounds the candidate set,
turning O(Q×N) into O(Q×N/buckets)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codegraph_spark.sources.tables import load_table


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine over array<double> columns — pure built-in higher-order
    functions, JVM-side (no UDF)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


# --- brute force: exact top-k for a small query set ---------------------------
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for query vectors (vec_id < 3) against the
    full corpus. The query side is tiny → broadcast it; the corpus scan
    is one pass, no shuffle."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", F.col("vec_id").alias("neighbor_id"),
                (F.floor(F.col("cos") * 10000) / 10000).alias("cosine"), "rn")
    )


_BRUTE_SQL = """
SELECT q_id, neighbor_id, floor(cos * 10000) / 10000 AS cosine, rn
FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos,
           CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id) AS INT) AS rn
    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 3
) WHERE rn <= 5
"""


# --- IVF-style: probe only the nearest bucket ---------------------------------
def sim_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the label column as the (given) coarse quantizer:
    centroids = per-label mean vector; each query probes only its
    nearest centroid's bucket. Structure matches a trained IVF index;
    here the cluster assignment is the label so the oracle can mirror
    it."""
    emb = _emb(spark, sf_dir)
    dims = emb.select("label", F.posexplode(F.col("v")).alias("dim", "x"))
    centroids = (
        dims.groupBy("label", "dim").agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("pairs"))
        .select("label", F.transform(F.col("pairs"), lambda p: p.m).alias("cv"))
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    # assign each query to its nearest centroid (tiny × tiny: broadcast)
    qc = (
        q.join(F.broadcast(centroids))
        .withColumn("cdist", cosine(F.col("qv"), F.col("cv")))
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("cdist"), "label")
    assigned = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select("q_id", "qv", F.col("label").alias("probe_label"))
    )
    scored = (
        emb.join(F.broadcast(assigned),
                 (F.col("label") == F.col("probe_label")) & (F.col("vec_id") != F.col("q_id")))
        .withColumn("cos", cosine(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "probe_label", F.col("vec_id").alias("neighbor_id"),
                (F.floor(F.col("cos") * 10000) / 10000).alias("cosine"), "rn")
    )


_IVF_SQL = """
WITH centroids AS (
    SELECT label, list(m ORDER BY dim) AS cv
    FROM (
        SELECT label, dim, avg(x) AS m
        FROM (
            SELECT label,
                   generate_subscripts(embedding, 1) AS dim,
                   unnest(embedding::DOUBLE[]) AS x
            FROM embeddings
        )
        GROUP BY label, dim
    )
    GROUP BY label
),
assigned AS (
    SELECT q_id, probe_label FROM (
        SELECT q.vec_id AS q_id, c.label AS probe_label,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.cv) DESC, c.label
               ) AS rn
        FROM embeddings q, centroids c
        WHERE q.vec_id < 3
    ) WHERE rn = 1
)
SELECT q_id, probe_label, neighbor_id, floor(cos * 10000) / 10000 AS cosine, rn
FROM (
    SELECT a.q_id, a.probe_label, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos,
           CAST(row_number() OVER (
               PARTITION BY a.q_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id) AS INT) AS rn
    FROM assigned a
    JOIN embeddings q ON q.vec_id = a.q_id
    JOIN embeddings c ON c.label = a.probe_label AND c.vec_id <> a.q_id
) WHERE rn <= 5
"""


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_ivf_label": sim_ivf_label,
}

ORACLES = {
    "sim_topk_bruteforce": _BRUTE_SQL,
    "sim_ivf_label": _IVF_SQL,
}
