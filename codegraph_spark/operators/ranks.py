"""Distributed exact global rank — ``row_number() OVER (ORDER BY key
[DESC], id)`` without a corpus-sized single-partition WindowExec.

The naive global rank window moves every row through one task (Spark
logs ``WindowExec: No Partition Defined`` and the partition holds the
whole corpus — a driver-killer at 100 TB). This operator reproduces the
EXACT same rank with a two-level decomposition, so callers keep their
order-statistic semantics (and their unchanged oracles) while every
window in the plan is partitioned:

1. rows bucket into ``(key, sub)`` cells, where ``sub`` is a CONTIGUOUS
   id-range bucket (monotone in ``id``) — contiguity is what lets
   per-cell counts reconstruct the global rank exactly, unlike a hash
   bucket;
2. one histogram-sized aggregate counts rows per cell; exclusive
   cumsums over that HISTOGRAM (distinct-key rows for the key level,
   ``n_sub`` rows per key for the sub level) yield each cell's global
   rank offset — the only unpartitioned window runs over histogram
   rows, never corpus rows;
3. a ``row_number`` window partitioned by ``(key, sub)`` ranks within
   the cell, and ``rank = key_offset + sub_offset + local``.

Scale shape: the fattest window partition is one ``(key, sub)`` cell —
a tie-heavy key (every doc the same quality score / token count) is
still split ``n_sub`` ways by id range, and ``n_sub`` scales with
executor count. The offset table is ``distinct_keys × n_sub`` rows and
broadcasts; callers must pass a LOW-CARDINALITY key (a score in cents,
a token count — distinct values ≪ rows). For a high-cardinality key,
rethink the query instead (this helper would degrade to a
histogram-as-big-as-the-corpus).

Cost trade, stated plainly: the input is evaluated three times (the
1-column id-bounds aggregate, the cell-count aggregate, and the final
offset join) where the naive global window reads it once. All three
are column-pruned parallel scans with map-side-combining aggregates —
at 100 TB that is strictly cheaper than funneling the corpus through
one sort task, and callers whose input is expensive to recompute can
pass an already-cached DataFrame.

Used by corpus_quality_calibration / corpus_padding_waste /
corpus_ccnet_buckets (queries/text.py) — the round-8 verdict's named
scale-killers plus the per-language variant of the same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_row_number(
    df: DataFrame,
    key_col: str | None,
    *,
    id_col: str = "doc_id",
    descending: bool = False,
    n_sub: int = 32,
    out: str = "rn",
    total: str | None = None,
    partition_cols: list[str] | None = None,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Attach ``out`` = exact ``row_number() OVER ([PARTITION BY p...]
    ORDER BY key [DESC], id)`` (1-based). ``key_col=None`` ranks by
    ``id`` alone. ``id`` must be unique and non-negative (it is the
    deterministic tie-breaker AND the range-bucket axis). When
    ``total`` is given, also attach the per-partition row count as a
    column (needed by ntile/tercile consumers; comes from the
    histogram, not a second corpus scan).

    With ``partition_cols``, the rank restarts per partition group —
    the replacement for ``PARTITION BY lang ORDER BY score`` windows
    whose groups are corpus-fraction-sized (a dominant language is one
    fat sort partition; here it still splits ``n_sub`` ways by id
    range, and the offset cumsums run over per-group histograms with a
    PARTITIONED window). Set ``broadcast_offsets=False`` when
    distinct_keys × n_sub can outgrow a broadcast (the offsets then
    join by shuffle on the same (key, sub) partitioning the local
    window needs, so the exchange is reused)."""
    P = list(partition_cols or [])
    reserved = {"_lo", "_hi", "_key", "_sub", "_c", "_kt", "_koff",
                "_soff", "_off", out}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(
            f"distributed_row_number: input columns {clash} collide "
            f"with the operator's internals/output — rename them first"
        )
    key = F.col(key_col) if key_col is not None else F.lit(0).cast("long")
    # contiguous id-range sub-buckets: width = ceil(span / n_sub) keeps
    # sub in [0, n_sub) with pure integer arithmetic, monotone in id
    # (global bounds — per-group contiguity holds a fortiori)
    bounds = df.select(
        F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi")
    )
    based = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_key", key)
        .withColumn(
            "_sub",
            F.expr(
                f"({id_col} - _lo) div "
                f"((_hi - _lo + {n_sub}) div {n_sub})"
            ).cast("int"),
        )
        .drop("_lo", "_hi")
    )
    cells = based.groupBy(*P, "_key", "_sub").agg(
        F.count(F.lit(1)).alias("_c")
    )
    key_order = F.col("_key").desc() if descending else F.col("_key").asc()
    # key-level exclusive cumsum: with partition_cols this window is
    # PARTITIONED; without, it is unpartitioned but runs over DISTINCT
    # KEYS only (histogram-bounded by contract — see module docstring)
    wk = (
        Window.partitionBy(*P).orderBy(key_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    keys = (
        cells.groupBy(*P, "_key").agg(F.sum("_c").alias("_kt"))
        .select(
            *P, "_key",
            F.coalesce(F.sum("_kt").over(wk), F.lit(0)).alias("_koff"),
        )
    )
    ws = (
        Window.partitionBy(*P, "_key").orderBy("_sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        cells.withColumn("_soff", F.coalesce(F.sum("_c").over(ws), F.lit(0)))
        .join(keys, P + ["_key"])
        .select(
            *P, "_key", "_sub",
            (F.col("_koff") + F.col("_soff")).alias("_off"),
        )
    )
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    wl = Window.partitionBy(*P, "_key", "_sub").orderBy(id_col)
    ranked = (
        based.join(offsets, P + ["_key", "_sub"])
        .withColumn(out, (F.col("_off") + F.row_number().over(wl)).cast("long"))
        .drop("_key", "_sub", "_off")
    )
    if total is not None:
        # summed off the histogram — not a second corpus scan; one row
        # (no partitions) or one row per partition group
        if P:
            n = cells.groupBy(*P).agg(F.sum("_c").cast("long").alias(total))
            ranked = ranked.join(F.broadcast(n), P)
        else:
            n = cells.groupBy().agg(F.sum("_c").cast("long").alias(total))
            ranked = ranked.crossJoin(F.broadcast(n))
    return ranked
