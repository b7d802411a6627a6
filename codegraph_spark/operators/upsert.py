"""Write path: MERGE-parity upserts + uniqueness enforcement.

The reference upserts everything through Cypher ``MERGE (n {keys})
SET n += $props`` (pkg/neo4j/client.go:135-179, batch apoc.merge at
:235-252) under uniqueness constraints (pkg/schema/schema.go:38-79).

Spark has no server-side index, so MERGE parity is a batch algorithm:

1. union(existing, incoming) tagged with a generation stamp;
2. per business key keep the latest row, but with ``SET +=`` column
   semantics — an incoming NULL must NOT clobber an existing value
   (client.go:153-157 only overwrites provided props) → per-column
   ``coalesce(new, old)``;
3. write back (overwrite, or Delta MERGE INTO when a transactional
   table format is on the classpath — not in this image).

Scale: one shuffle on the business key; idempotent by construction
(re-merging the same batch is a no-op), which is what the reference's
integration tests assert by re-indexing (indexing_test.go).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class UniquenessViolation(ValueError):
    pass


def assert_unique(df: DataFrame, keys: list[str], label: str = "") -> None:
    """Uniqueness-constraint enforcement (schema.go:38-79): assert no
    duplicate business keys; raises with a sample of offenders."""
    dupes = (
        df.groupBy(*keys).agg(F.count("*").alias("n")).filter(F.col("n") > 1)
    )
    sample = dupes.limit(5).collect()
    if sample:
        raise UniquenessViolation(
            f"uniqueness violated on {keys} {('for ' + label) if label else ''}: "
            + ", ".join(str(r.asDict()) for r in sample)
        )


def merge_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    set_plus_equals: bool = True,
) -> DataFrame:
    """Upsert *incoming* into *existing* on business *keys*.

    ``set_plus_equals=True`` reproduces Cypher ``SET n += $props``:
    non-key columns take the incoming value unless it is NULL, in which
    case the existing value survives. ``False`` = full-row replace.

    Incoming batches may themselves contain duplicate keys (the
    reference's SCIP pass emits repeat symbols); the last occurrence
    wins via a deterministic window (A8 dedup, scip_parser.go:103-133).
    """
    cols = existing.columns
    if set(cols) != set(incoming.columns):
        raise ValueError(f"schema mismatch: {sorted(cols)} vs {sorted(incoming.columns)}")
    non_keys = [c for c in cols if c not in keys]

    # _seq stamps batch position (monotonically_increasing_id is
    # ascending in row order within a batch) so that duplicate keys
    # INSIDE the incoming batch resolve deterministically to the last
    # occurrence — the reference applies its MERGEs sequentially, so
    # later writes win (scip_parser.go:103-133 first-seen dedup is the
    # inverse and is handled by its own window in sources/scip.py).
    tagged = (
        existing.select(*cols)
        .withColumn("_gen", F.lit(0))
        .withColumn("_seq", F.monotonically_increasing_id())
        .unionByName(
            incoming.select(*cols)
            .withColumn("_gen", F.lit(1))
            .withColumn("_seq", F.monotonically_increasing_id())
        )
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("_gen"), F.desc("_seq"))
    ranked = tagged.withColumn("_rn", F.row_number().over(w))
    if not set_plus_equals:
        return ranked.filter(F.col("_rn") == 1).drop("_gen", "_seq", "_rn")

    # SET += : newest non-null value per column, scanning newest-first.
    # first(col, ignorenulls) over the key window ordered newest-first
    # gives exactly "incoming value unless null, else existing".
    agg_cols = [
        F.first(c, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias(c)
        for c in non_keys
    ]
    merged = ranked.select(*keys, *agg_cols, "_rn").filter(F.col("_rn") == 1).drop("_rn")
    return merged.select(*cols)


def idempotent(existing: DataFrame, incoming: DataFrame, keys: list[str]) -> bool:
    """True if merging *incoming* leaves *existing* unchanged — the
    reference's re-index invariant."""
    merged = merge_upsert(existing, incoming, keys)
    return (
        merged.exceptAll(existing).isEmpty()
        and existing.exceptAll(merged).isEmpty()
    )
