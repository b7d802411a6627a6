"""Trigram inverted index — the scale path for substring search.

SearchNodes (pkg/neo4j/query.go:348-414) is a case-insensitive
substring scan; the reference degrades to a full label scan because
full-text indexing needs Neo4j Enterprise (schema.go:175-176), and our
``operators/search.search_nodes`` mirrors that. SURVEY §7.3 risk 3
names the inverted-index table as the scale answer — this is it.

Design (semantics-preserving accelerator, not an approximation):

1. **Build** (ingest-time): explode each searchable field into its
   distinct character 3-grams → ``(gram, id)`` table, partitioned by
   ``gram``. Size ≈ Σ field lengths — linear in the corpus, like any
   text index.
2. **Search**: a term of length ≥ 3 must contain ALL of its 3-grams,
   so candidates = ids matching every gram of the term (equi-joins on
   the gram key — partition-pruned, no corpus scan), then the ORIGINAL
   ``contains`` predicate re-verifies candidates exactly. Gram match
   is necessary but not sufficient ("abcab" grams ⊂ "abcXab" grams),
   hence the verify step; the result set is IDENTICAL to the scan.
3. Terms shorter than 3 characters fall back to the scan (their
   candidate sets approach the corpus anyway).

At 100 TB: the gram table shuffles once at build; each query touches
|grams(term)| partitions of it instead of every node row. Hot grams
(e.g. ``ing``) are the skew case — cap with a per-gram doc-frequency
cutoff (drop grams whose posting list exceeds a threshold from the
CANDIDATE intersection only; correctness is preserved because the
verify step re-checks the full predicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams_col(s: F.Column) -> F.Column:
    """Distinct 3-grams of an (already-lowered) string column via
    sequence+transform. The lambda captures a plain column REFERENCE —
    capturing a computed expression (e.g. ``lower(x)``) would
    re-evaluate it per element (the shingling lesson, see
    queries/dedup.py), so callers project the lowered string first."""
    n = F.length(s)
    idx = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: s.substr(i, F.lit(3))))


def build_trigram_index(nodes: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """``(gram, id)`` posting table over the searchable fields.

    One explode + distinct (single shuffle on gram); persist or write
    ``partitionBy("gram")``-style (bucketed by gram at real scale) at
    ingest, alongside the graph tables."""
    fields = fields or [
        c for c in ("name", "display_name", "signature", "symbol", "path")
        if c in nodes.columns
    ]
    grams = None
    for f in fields:
        g = (
            nodes.select("id", F.lower(F.col(f)).alias("_s"))
            .select("id", F.explode(_grams_col(F.col("_s"))).alias("gram"))
            .filter(F.length("gram") == 3)
        )
        grams = g if grams is None else grams.unionByName(g)
    return grams.distinct()


def write_index(index: DataFrame, path: str) -> None:
    """Persist the posting table in the warehouse, gram-sorted within
    files so lookups prune on parquet min/max stats (``gram = 'abc'``
    skips row groups). NOT ``partitionBy("gram")`` — 26³+ tiny
    directories is the small-files anti-pattern; at real scale bucket
    by gram instead (``bucketBy`` + ``saveAsTable``) for shuffle-free
    posting-list joins."""
    index.sortWithinPartitions("gram").write.mode("overwrite").parquet(path)
    from codegraph_spark import serving

    serving.invalidate(path)  # serving contract: rewrite drops caches over the dir


def load_index(spark, path: str) -> DataFrame:
    """Read the ingest-time posting table back for serving; pair with
    ``search_via_index`` — gram equality predicates reach the scan
    (PushedFilters) so only matching row groups are read."""
    return spark.read.parquet(path)


def search_via_index(
    nodes: DataFrame,
    index: DataFrame,
    term: str,
    fields: list[str] | None = None,
    node_types: list[str] | None = None,
    limit: int = 50,
) -> DataFrame:
    """Index-accelerated SearchNodes with identical results to the
    scan: gram-intersection candidates → exact contains verify →
    relevance rank/limit (same rank CASE as ``search_nodes``)."""
    from codegraph_spark.operators.search import search_nodes

    t = term.lower()
    grams = sorted({t[i : i + 3] for i in range(len(t) - 2)})
    if not grams:  # term too short to index — scan is the plan
        return search_nodes(nodes, term, fields=fields, node_types=node_types, limit=limit)
    postings = index.filter(F.col("gram").isin(grams))
    candidates = (
        postings.groupBy("id")
        .agg(F.countDistinct("gram").alias("g"))
        .filter(F.col("g") == len(grams))
        .select("id")
    )
    pruned = nodes.join(candidates, "id", "left_semi")
    return search_nodes(pruned, term, fields=fields, node_types=node_types, limit=limit)
