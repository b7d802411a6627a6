"""Bloom-filter semi-join reduction — cut the big side of a join BEFORE
its shuffle.

Spark's own runtime row-level filtering (InjectRuntimeFilter) applies
only to favorable shapes, and `bloom_filter_agg` is not exposed to the
public SQL surface in this build, so this operator constructs the
filter declaratively:

- Build side: k hash positions per key (xxhash64 with per-hash salt),
  folded into a bitmap of 64-bit words via a map-side-combining
  ``bit_or`` GROUP BY, then into ONE row holding a ``map<word_idx,
  bits>``. The bitmap is O(m/64) words regardless of build cardinality
  and is broadcast — never shuffled, never collected to Python.
- Probe side: each row tests its k positions against the broadcast map
  with pure column expressions (whole-stage codegen); only surviving
  rows (true matches + false positives at the configured rate) reach
  the exact semi-join that removes false positives.

At 100 TB this is the difference between shuffling the full fact table
and shuffling roughly the selectivity fraction of it: the bloom
prefilter runs at the scan, the exact join sees orders of magnitude
fewer rows. No false negatives by construction
(tests/test_bloomjoin.py pins this and bounds the false-positive
rate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_M_BITS = 1 << 17  # 128 Ki bits -> 2048 words
_DEFAULT_K = 3


def _positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """k bloom positions for a key: xxhash64 over (key, salt), made
    non-negative via pmod. Distinct salts decorrelate the k hashes."""
    return [F.pmod(F.xxhash64(key, F.lit(j)), F.lit(m_bits)) for j in range(k)]


def bloom_bitmap(
    keys: DataFrame, key_col: str, *, m_bits: int = _DEFAULT_M_BITS, k: int = _DEFAULT_K
) -> DataFrame:
    """One-row DataFrame with column ``bloom: map<bigint, bigint>`` —
    word index -> 64-bit word. Two map-side-combining aggregations;
    broadcastable by construction (<= m_bits/64 entries)."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), k, m_bits))).alias("pos")
    )
    words = (
        pos.select(
            F.floor(F.col("pos") / 64).cast("bigint").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "bits"))).alias("bloom")
    )


def with_bloom_prefilter(
    big: DataFrame,
    big_key: str,
    bitmap: DataFrame,
    *,
    m_bits: int = _DEFAULT_M_BITS,
    k: int = _DEFAULT_K,
) -> DataFrame:
    """Filter ``big`` to rows whose key MIGHT be in the bitmap (true
    matches + false positives). Pure column math against the broadcast
    one-row map; a missing word reads as 0 -> definite miss."""
    probed = big.crossJoin(F.broadcast(bitmap))
    for j, p in enumerate(_positions(F.col(big_key), k, m_bits)):
        probed = probed.withColumn(f"__p{j}", p)
    hits = [
        F.expr(
            f"(shiftright(coalesce(element_at(bloom, CAST(floor(__p{j} / 64) AS BIGINT)),"
            f" CAST(0 AS BIGINT)), CAST(__p{j} % 64 AS INT)) & 1) = 1"
        )
        for j in range(k)
    ]
    cond = hits[0]
    for h in hits[1:]:
        cond = cond & h
    return probed.filter(cond).drop("bloom", *[f"__p{j}" for j in range(k)])


def bloom_semi_join(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    *,
    m_bits: int = _DEFAULT_M_BITS,
    k: int = _DEFAULT_K,
) -> DataFrame:
    """Exact semi-join of ``big`` against ``small`` keys, with the
    bloom prefilter applied to ``big`` before the exact join's shuffle
    removes false positives."""
    bitmap = bloom_bitmap(small.select(small_key), small_key, m_bits=m_bits, k=k)
    prefiltered = with_bloom_prefilter(big, big_key, bitmap, m_bits=m_bits, k=k)
    return prefiltered.join(
        small.select(F.col(small_key).alias(big_key)).distinct(), big_key, "left_semi"
    )
