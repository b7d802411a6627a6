"""Binary media directory source (sources/media.py) and the
WebDataset tar shard sink (sinks.py) — the real-file ingestion and
training-data export surfaces around the multimodal/corpus operators."""

from __future__ import annotations

import hashlib
import os
import struct
import tarfile

import pytest


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "nested").mkdir()
    # two decodable raw-gray-v1 images (4x2 and 2x2)
    for name, w, h in (("a.rawgray", 4, 2), ("nested/b.rawgray", 2, 2)):
        body = bytes(range(w * h))
        (d / name).write_bytes(struct.pack(">II", w, h) + body)
    (d / "c.png").write_bytes(b"\x89PNG\r\n\x1a\nfake")
    (d / "clip.mp4").write_bytes(b"\x00\x00\x00\x18ftypmp42fake")
    (d / "notes.txt").write_text("not media")
    return str(d)


def test_media_dir_rows_typed_and_rooted(spark, media_dir):
    from codegraph_spark.sources.media import read_media_dir

    rows = {r.path: r for r in read_media_dir(spark, media_dir).collect()}
    assert set(rows) == {"a.rawgray", "nested/b.rawgray", "c.png", "clip.mp4"}
    assert rows["a.rawgray"].modality == "image"
    assert rows["a.rawgray"].codec == "raw-gray-v1"
    assert rows["c.png"].codec == "png"
    assert rows["clip.mp4"].modality == "video"
    assert rows["clip.mp4"].codec == "h264"
    assert rows["a.rawgray"].n_bytes == 8 + 8
    # doc_id keyed on the RELATIVE path: stable across mount points
    assert rows["nested/b.rawgray"].doc_id != rows["a.rawgray"].doc_id


def test_media_modality_filter(spark, media_dir):
    from codegraph_spark.sources.media import read_media_dir

    imgs = read_media_dir(spark, media_dir, modality="image")
    assert {r.path for r in imgs.collect()} == {
        "a.rawgray", "nested/b.rawgray", "c.png"
    }


def test_media_feeds_multimodal_kernels(spark, media_dir):
    """The source's (doc_id, payload, codec) rows run straight through
    the Arrow decode kernel for the decodable codec."""
    from pyspark.sql import functions as F

    from codegraph_spark.operators.multimodal import decode_image_stats
    from codegraph_spark.sources.media import read_media_dir

    raw = read_media_dir(spark, media_dir).filter(
        F.col("codec") == "raw-gray-v1"
    )
    stats = {r.width: r for r in decode_image_stats(raw).collect()}
    assert set(stats) == {4, 2}
    assert stats[4].body_len == 8


def test_webdataset_roundtrip_and_determinism(spark, tmp_path):
    from codegraph_spark.sinks import write_webdataset

    docs = spark.createDataFrame(
        [(f"doc{i:03d}", f"text of {i}", bytes([i, i + 1])) for i in range(10)],
        "key string, txt string, bin binary",
    )
    out1 = str(tmp_path / "w1")
    m1 = write_webdataset(docs, out1, samples_per_shard=4).collect()
    assert sum(r.n_samples for r in m1) == 10
    assert len(m1) >= 2  # 10 samples / 4 per shard -> >= 3 hash shards occupied

    seen = {}
    for r in m1:
        path = os.path.join(out1, f"shard-{r.shard:05d}.tar")
        blob = open(path, "rb").read()
        assert hashlib.sha256(blob).hexdigest() == r.sha256
        with tarfile.open(path) as tar:
            for member in tar.getmembers():
                key, field = member.name.rsplit(".", 1)
                seen.setdefault(key, set()).add(field)
                if field == "txt":
                    body = tar.extractfile(member).read().decode()
                    assert body == f"text of {int(key[3:])}"
    assert set(seen) == {f"doc{i:03d}" for i in range(10)}
    assert all(fields == {"txt", "bin"} for fields in seen.values())

    # byte-determinism: a second write produces identical shard hashes
    out2 = str(tmp_path / "w2")
    m2 = write_webdataset(docs, out2, samples_per_shard=4).collect()
    assert {(r.shard, r.sha256) for r in m1} == {(r.shard, r.sha256) for r in m2}


def test_webdataset_read_back_roundtrip(spark, tmp_path):
    """read_webdataset(write_webdataset(df)) == df, bytes and all."""
    from codegraph_spark.sinks import write_webdataset
    from codegraph_spark.sources.webdataset import read_webdataset

    docs = spark.createDataFrame(
        [(f"k{i}", f"body {i}", bytes([i * 3, i * 3 + 1])) for i in range(9)],
        "key string, txt string, bin binary",
    )
    out = str(tmp_path / "rt")
    write_webdataset(docs, out, samples_per_shard=3)
    back = read_webdataset(spark, out)
    assert sorted(back.columns) == ["bin", "key", "txt"]
    rows = {r.key: r for r in back.collect()}
    assert set(rows) == {f"k{i}" for i in range(9)}
    for i in range(9):
        assert bytes(rows[f"k{i}"].txt).decode() == f"body {i}"
        assert bytes(rows[f"k{i}"].bin) == bytes([i * 3, i * 3 + 1])


def test_webdataset_honors_precomputed_shard_assignment(spark, tmp_path):
    """shard_col routes samples by the curation operator's packing
    instead of the hash default (corpus_pack_shards integration)."""
    import tarfile as _tar

    from codegraph_spark.sinks import write_webdataset

    docs = spark.createDataFrame(
        [(f"k{i}", f"t{i}", i % 2) for i in range(6)],
        "key string, txt string, my_shard int",
    )
    out = str(tmp_path / "packed")
    m = write_webdataset(docs, out, shard_col="my_shard").collect()
    assert {r.shard for r in m} == {0, 1}
    with _tar.open(os.path.join(out, "shard-00000.tar")) as tar:
        keys = {n.rsplit(".", 1)[0] for n in tar.getnames()}
    assert keys == {"k0", "k2", "k4"}
    # the shard column itself is NOT written as a member
    with _tar.open(os.path.join(out, "shard-00001.tar")) as tar:
        assert all(n.endswith(".txt") for n in tar.getnames())
