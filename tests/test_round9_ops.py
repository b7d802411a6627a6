"""Round-9 pins: the distributed exact-rank operator (the replacement
for the two corpus-sized single-partition rank windows the round-8
verdict named), the size-guarded hot-vocab split, and plan-shape
assertions that the fixed queries stay fixed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from codegraph_spark.operators.ranks import distributed_row_number


def _reference_rank(df, key_col, descending):
    order = []
    if key_col is not None:
        order.append(F.col(key_col).desc() if descending else F.col(key_col).asc())
    order.append(F.col("doc_id").asc())
    return df.withColumn(
        "rn_ref", F.row_number().over(Window.orderBy(*order)).cast("long")
    )


def _assert_matches_global_window(df, key_col, descending=False):
    got = distributed_row_number(df, key_col, descending=descending)
    ref = _reference_rank(df, key_col, descending)
    joined = got.join(ref.select("doc_id", "rn_ref"), "doc_id")
    bad = joined.filter(F.col("rn") != F.col("rn_ref")).count()
    assert bad == 0, f"{bad} ranks differ from the global-window reference"


@pytest.fixture(scope="module")
def tie_heavy(spark):
    # 200 rows, only 3 distinct keys (one key holds 180 rows — the
    # degenerate tie case the sub-buckets exist for), sparse ids
    rows = [
        Row(doc_id=i * 37 + 5, key=(0 if i < 180 else (1 if i % 2 == 0 else 2)))
        for i in range(200)
    ]
    return spark.createDataFrame(rows).repartition(8)


def test_rank_matches_window_asc(spark, tie_heavy):
    _assert_matches_global_window(tie_heavy, "key")


def test_rank_matches_window_desc(spark, tie_heavy):
    _assert_matches_global_window(tie_heavy, "key", descending=True)


def test_rank_keyless_matches_window(spark, tie_heavy):
    _assert_matches_global_window(tie_heavy, None)


def test_rank_single_row(spark):
    df = spark.createDataFrame([Row(doc_id=7, key=3)])
    out = distributed_row_number(df, "key", total="n").collect()
    assert len(out) == 1 and out[0].rn == 1 and out[0].n == 1


def test_rank_empty(spark):
    df = spark.createDataFrame([], "doc_id long, key long")
    assert distributed_row_number(df, "key", total="n").count() == 0


def test_rank_total_column(spark, tie_heavy):
    out = distributed_row_number(tie_heavy, "key", total="n")
    assert out.select(F.min("n"), F.max("n")).first() == (200, 200)
    # ranks are a permutation of 1..n
    assert out.select(F.sum("rn")).first()[0] == 200 * 201 // 2


def test_rank_windows_all_partitioned(spark, tie_heavy):
    """The corpus-path windows must carry a partition spec; only the
    histogram-offset cumsum (distinct-key rows) may be unpartitioned —
    that is the operator's whole reason to exist."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        distributed_row_number(tie_heavy, "key").explain("formatted")
    plan = buf.getvalue()
    # the row-level window must be hash-partitioned by (_key, _sub)
    assert "hashpartitioning(_key" in plan, plan


def test_hot_split_guard_counts_before_broadcast(spark, monkeypatch):
    """Past the counted threshold the hot set must NOT be broadcast —
    the semi/anti joins still run (as shuffles) and rare/hot rows
    partition the postings exactly."""
    from codegraph_spark.queries import dedup as D

    sh = spark.createDataFrame(
        [Row(doc_id=d, shingle=s)
         for d in range(6)
         for s in (["hot"] if d else ["hot", "rare1", "rare2"])]
    )
    monkeypatch.setattr(D, "_HOT_BROADCAST_MAX", 0)
    rare, hs = D._hot_split(sh, cutoff=3)  # df(hot)=6 > 3 → hot
    assert sorted(r.shingle for r in rare.collect()) == ["rare1", "rare2"]
    got = {r.doc_id: list(r.hs) for r in hs.collect()}
    assert set(got) == set(range(6)) and all(len(v) == 1 for v in got.values())


def test_hot_split_ids_are_distinct_per_doc(spark):
    from codegraph_spark.queries import dedup as D

    sh = spark.createDataFrame(
        [Row(doc_id=1, shingle=s) for s in ["a", "b", "c", "a"]]
        + [Row(doc_id=2, shingle="a")]
    )
    _, hs = D._hot_split(sh, cutoff=0)  # everything hot
    sets = {r.doc_id: list(r.hs) for r in hs.collect()}
    assert len(sets[1]) == 3 and len(set(sets[1])) == 3
    assert len(sets[2]) == 1
    # the duplicated shingle mints the SAME id in both docs
    assert len(set(sets[1]) & set(sets[2])) == 1


# --- stored-payload media gate + watermark margin (round-9 items 5/7) --------
def test_mjpeg_watermark_preserves_cut_margin():
    """The per-doc watermark must not eat the scene-cut margin: even an
    extreme 0xFF watermark on the darkest base leaves every scene-
    boundary delta far above the threshold, and same-scene frames stay
    byte-identical (delta exactly 0)."""
    import numpy as np

    from codegraph_spark.operators.jpeg_stdlib import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )
    from codegraph_spark.queries.multimodal import _MJPEG_CUT_MILLI

    worst = 10**9
    for w in (16, 24, 31):
        h = 16
        n = w * h
        for wm in (bytes([255] * 8), bytes([0] * 8), bytes(range(248, 256))):
            sums = []
            for base in (40, 100, 160, 220):
                px = np.full(n, base, dtype=np.uint8)
                px[:8] = np.frombuffer(wm, dtype=np.uint8)
                _, _, dec = decode_jpeg_gray(encode_jpeg_gray(px, w, h, quality=90))
                sums.append(int(dec.astype(np.int64).sum()))
            worst = min(
                worst,
                min(abs(sums[i] - sums[i - 1]) * 1000 // n for i in range(1, 4)),
            )
    assert worst > _MJPEG_CUT_MILLI * 1.5, worst


def test_stored_media_fixture_writes_real_codec_files(spark):
    """The stored-media fixture must hold genuine PNG/JPEG files on
    disk (magic bytes), cache on the _DONE sentinel, and the gate must
    decode the STORED bytes back to the text-derived stats."""
    import glob
    import os

    from tests.conftest import TEST_SF_DIR
    from codegraph_spark.queries.multimodal import (
        _STORED_SUBSET_MOD,
        _stored_media_dir,
        mm_stored_media_meta,
    )

    root = _stored_media_dir(spark, TEST_SF_DIR)
    pngs = sorted(glob.glob(os.path.join(root, "*.png")))
    jpgs = sorted(glob.glob(os.path.join(root, "*.jpg")))
    assert pngs and jpgs
    with open(pngs[0], "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    with open(jpgs[0], "rb") as f:
        assert f.read(2) == b"\xff\xd8"
    # cached: second call returns the same dir without rebuilding
    mtime = os.path.getmtime(os.path.join(root, "_DONE"))
    assert _stored_media_dir(spark, TEST_SF_DIR) == root
    assert os.path.getmtime(os.path.join(root, "_DONE")) == mtime
    out = mm_stored_media_meta(spark, TEST_SF_DIR)
    rows = out.collect()
    assert rows, "gate produced no rows"
    for r in rows[:20]:
        assert r.doc_id % _STORED_SUBSET_MOD == 0
        assert r.width == 16 + r.doc_id % 48 and r.height == 16 + r.doc_id % 32
        assert r.body_len == r.width * r.height
        if r.codec == "jpeg":
            assert r.checksum == -1
        else:
            assert r.codec == "png" and r.checksum > 0


# --- partitioned distributed rank (corpus_ccnet_buckets rewrite) --------------
def test_rank_partitioned_matches_window(spark):
    """partition_cols mode must reproduce row_number() OVER
    (PARTITION BY grp ORDER BY key DESC, doc_id) exactly — including a
    dominant group with heavy key ties and a group absent from part of
    the key range."""
    rows = [
        Row(doc_id=i * 13 + 1,
            grp=("en" if i < 160 else ("de" if i % 2 == 0 else "fr")),
            key=(i % 4 if i < 160 else i))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows).repartition(8)
    got = distributed_row_number(
        df, "key", partition_cols=["grp"], descending=True,
        total="n", broadcast_offsets=False,
    )
    w = Window.partitionBy("grp").orderBy(F.desc("key"), "doc_id")
    ref = df.withColumn("rn_ref", F.row_number().over(w).cast("long")).withColumn(
        "n_ref", F.count(F.lit(1)).over(Window.partitionBy("grp")).cast("long")
    )
    j = got.join(ref.select("doc_id", "rn_ref", "n_ref"), "doc_id")
    bad = j.filter(
        (F.col("rn") != F.col("rn_ref")) | (F.col("n") != F.col("n_ref"))
    ).count()
    assert bad == 0


# --- property: distributed rank == global window on arbitrary inputs ----------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ids = st.lists(
    st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40,
    unique=True,
)
_keys = st.lists(st.integers(min_value=-5, max_value=5), min_size=40, max_size=40)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ids=_ids, keys=_keys, desc=st.booleans(), n_sub=st.sampled_from([1, 3, 32]))
def test_rank_equals_window_property(spark, ids, keys, desc, n_sub):
    """For ANY unique non-negative id set, any (possibly negative,
    tie-heavy) key assignment, either direction, and any sub-bucket
    count, the two-level rank must equal the global window's."""
    rows = [Row(doc_id=i, key=keys[j]) for j, i in enumerate(ids)]
    df = spark.createDataFrame(rows).repartition(4)
    got = distributed_row_number(df, "key", descending=desc, n_sub=n_sub)
    order = [F.col("key").desc() if desc else F.col("key").asc(),
             F.col("doc_id").asc()]
    ref = df.withColumn(
        "rn_ref", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    j = got.join(ref.select("doc_id", "rn_ref"), "doc_id")
    assert j.filter(F.col("rn") != F.col("rn_ref")).count() == 0


def test_rank_rejects_colliding_columns(spark):
    df = spark.createDataFrame([Row(doc_id=1, key=2, _sub=3)])
    with pytest.raises(ValueError, match="collide"):
        distributed_row_number(df, "key")
    df2 = spark.createDataFrame([Row(doc_id=1, key=2, rn=3)])
    with pytest.raises(ValueError, match="collide"):
        distributed_row_number(df2, "key")
