"""Per-group top-k via window ranking.

The reference's MENTIONS linker caps symbol candidates at 5 per
reference (documents/indexer.go:132-137) with a per-query LIMIT; in
batch mode that becomes a true per-group top-k (SURVEY O6). A window
``row_number`` is map-side partial-sortable and shuffles once on the
group key — the standard scale-safe top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Keep the first *k* rows per group under the given ordering.

    ``order_cols`` entries may be column names or Column expressions
    (pass ``F.desc("x")`` for descending). Ordering must be total within
    a group for deterministic results — include a tiebreaker key.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
