"""SearchNodes — case-insensitive multi-field substring search with
label filtering and relevance ranking.

Reference: pkg/neo4j/query.go:348-414 (SearchNodes) — OR-chain of
``toLower(n.f) CONTAINS toLower($term)`` over name/displayName/
signature/symbol/path, optional label disjunction, CASE-based relevance
rank (Function/Method first), ORDER BY rank, name, LIMIT.

At scale this is a full scan by design — the reference degrades the
same way (full-text index needs Neo4j Enterprise, schema.go:175-176).
Catalyst prunes to only the searched columns; the scale path is the
trigram inverted index in ``operators/inverted_index.py`` (SURVEY
§7.3 risk 3), which prefilters candidates by gram intersection and
re-verifies with this scan's predicate — result-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# rank CASE mirrors query.go:368-380
_RANK_ORDER = [
    (("Function", "Method"), 1),
    (("Class", "Interface"), 2),
    (("Variable",), 3),
    (("Symbol",), 4),
    (("File",), 5),
]


def relevance_rank(label_col: F.Column) -> F.Column:
    rank = None
    for labels, r in _RANK_ORDER:
        cond = label_col.isin(*labels)
        rank = F.when(cond, r) if rank is None else rank.when(cond, r)
    return rank.otherwise(6)


def search_nodes(
    nodes: DataFrame,
    term: str,
    fields: list[str] | None = None,
    node_types: list[str] | None = None,
    limit: int = 50,
    rank_order: list[tuple[tuple[str, ...], int]] | None = None,
) -> DataFrame:
    """Rows whose any-of *fields* contains *term* (case-insensitive),
    ranked Function/Method first then by name, limited."""
    fields = fields or [c for c in ("name", "display_name", "signature", "symbol", "path")
                        if c in nodes.columns]
    if not fields:
        raise ValueError("no searchable fields present")
    term_lit = F.lit(term.lower())
    pred = None
    for f in fields:
        p = F.lower(F.col(f)).contains(term_lit)
        pred = p if pred is None else (pred | p)
    if node_types:
        pred = pred & F.col("label").isin(*node_types)

    rank = relevance_rank(F.col("label"))
    if rank_order is not None:
        rank = None
        for labels, r in rank_order:
            cond = F.col("label").isin(*labels)
            rank = F.when(cond, r) if rank is None else rank.when(cond, r)
        rank = rank.otherwise(6)

    out = nodes.filter(pred).withColumn("rank", rank).orderBy("rank", "name")
    return out.limit(limit) if limit and limit > 0 else out
