"""Multimodal plumbing tests: payload format round-trip, Arrow batch
shapes, and the codec stub boundary (SURVEY-extension surface — no
reference counterpart; decode gated on the deterministic raw-gray-v1
format because no media libraries exist in this container)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from codegraph_spark.operators.multimodal import (
    RAW_GRAY_V1,
    decode_image_stats,
    encode_documents_as_images,
    resize_image_stats,
    sample_frames,
)


@pytest.fixture(scope="module")
def images(spark):
    docs = spark.createDataFrame(
        [(0, "abcd" * 20), (1, "hello world "), (17, "x" * 48)],
        "doc_id long, text string",
    )
    return encode_documents_as_images(docs).persist()


def test_payload_header_and_meta(images):
    rows = {r["doc_id"]: r for r in images.collect()}
    for doc_id, r in rows.items():
        w, h = 16 + doc_id % 48, 16 + doc_id % 32
        assert (r["width"], r["height"]) == (w, h)
        assert r["modality"] == "image" and r["codec"] == RAW_GRAY_V1
        hw, hh = struct.unpack(">II", bytes(r["payload"][:8]))
        assert (hw, hh) == (w, h)
        assert len(r["payload"]) == 8 + w * h == r["n_bytes"]


def test_decode_round_trip(images):
    stats = {r["doc_id"]: r for r in decode_image_stats(images).collect()}
    imgs = {r["doc_id"]: r for r in images.collect()}
    for doc_id, s in stats.items():
        body = bytes(imgs[doc_id]["payload"][8:])
        assert s["body_len"] == len(body)
        assert s["checksum"] == sum(body)
        assert s["mean_byte"] == round(sum(body) / len(body), 3)


def test_resize_strided(images):
    out = {r["doc_id"]: r for r in resize_image_stats(images, factor=2).collect()}
    imgs = {r["doc_id"]: r for r in images.collect()}
    for doc_id, r in out.items():
        w, h = imgs[doc_id]["width"], imgs[doc_id]["height"]
        body = bytes(imgs[doc_id]["payload"][8:])
        expect = sum(
            body[row * w + col]
            for row in range(0, h, 2)
            for col in range(0, w, 2)
        )
        assert (r["out_width"], r["out_height"]) == ((w + 1) // 2, (h + 1) // 2)
        assert r["out_checksum"] == expect


def test_frame_sample_shape(images):
    frames = sample_frames(images, frame_len=64, every=3).collect()
    imgs = {r["doc_id"]: r for r in images.collect()}
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, img in imgs.items():
        n_frames = (img["n_bytes"] - 8) // 64
        expect_idx = list(range(0, n_frames, 3))
        got = sorted(r["frame_idx"] for r in by_doc.get(doc_id, []))
        assert got == expect_idx
        body = bytes(img["payload"][8:])
        for r in by_doc.get(doc_id, []):
            f = r["frame_idx"]
            assert r["frame_checksum"] == sum(body[f * 64 : (f + 1) * 64])


def test_foreign_codec_raises(spark, images):
    jpeg = images.withColumn("codec", F.lit("jpeg"))
    with pytest.raises(Exception, match="NotImplementedError|jpeg"):
        decode_image_stats(jpeg).collect()


def test_audio_energy_kernel(spark):
    """raw-pcm-v1 pack → Arrow kernel → windowed integer energies;
    partial trailing windows dropped; foreign codecs refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from codegraph_spark.operators.multimodal import (
        audio_window_energy,
        encode_documents_as_audio,
    )

    docs = spark.createDataFrame(
        [(0, "abcd" * 300), (300, "xy" * 900)], "doc_id long, text string"
    )
    audio = encode_documents_as_audio(docs)
    meta = {r["doc_id"]: r for r in audio.collect()}
    assert meta[0]["n_samples"] == 1024 and meta[300]["n_samples"] == 1324
    assert meta[0]["codec"] == "raw-pcm-v1" and meta[0]["modality"] == "audio"

    out = audio_window_energy(audio, window=256)
    rows = {(r["doc_id"], r["win_idx"]): r["energy"] for r in out.collect()}
    # doc 0: 1024/256 = 4 full windows; doc 300: 1324//256 = 5 (partial dropped)
    assert sorted(i for d, i in rows if d == 0) == [0, 1, 2, 3]
    assert sorted(i for d, i in rows if d == 300) == [0, 1, 2, 3, 4]
    # energy of a repeated "abcd" window: 64 repetitions of the 4-byte motif
    motif = sum(ord(c) ** 2 for c in "abcd")
    assert rows[(0, 0)] == motif * 64

    bad = audio.withColumn("codec", F.lit("mp3"))
    with _pytest.raises(Exception, match="mp3"):
        audio_window_energy(bad).collect()


def test_windowed_audio_kernels_reject_stereo(spark):
    """audio_window_energy / audio_zero_crossings window the FLAT
    sample stream, so an interleaved stereo input must fail loudly
    (a window would span both channels; the ZCR sign test would count
    cross-channel flips) — decode_audio_stats is the multichannel
    path. Pins the ADVICE r9 finding."""
    import numpy as np
    import pytest as _pytest

    from codegraph_spark.operators.multimodal import (
        audio_window_energy,
        audio_zero_crossings,
        decode_audio_stats,
    )
    from codegraph_spark.operators.wav_stdlib import encode_wav

    frames = np.tile(
        np.array([[40, 200]], dtype=np.uint8), (512, 1)
    )  # L=40, R=200: every adjacent flat-stream pair flips sign
    wav = encode_wav(frames, sample_rate=8000)
    audio = spark.createDataFrame(
        [(1, bytearray(wav), "wav")], "doc_id long, payload binary, codec string"
    )
    with _pytest.raises(Exception, match="mono-only"):
        audio_window_energy(audio, window=256).collect()
    with _pytest.raises(Exception, match="mono-only"):
        audio_zero_crossings(audio, window=256).collect()
    # the multichannel-safe path still decodes it
    stats = decode_audio_stats(audio).collect()
    assert len(stats) == 1


def test_empty_text_dropped(spark):
    docs = spark.createDataFrame(
        [(0, "abcd"), (1, "")], "doc_id long, text string"
    )
    from codegraph_spark.operators.multimodal import encode_documents_as_audio

    assert [r["doc_id"] for r in encode_documents_as_images(docs).collect()] == [0]
    assert [r["doc_id"] for r in encode_documents_as_audio(docs).collect()] == [0]


def test_non_ascii_fails_fast(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs = spark.createDataFrame([(0, "héllo")], "doc_id long, text string")
    with pytest.raises(SparkRuntimeException):
        encode_documents_as_images(docs).collect()


def test_dhash_canonical_frame_is_content_keyed(spark):
    """Identical text under different doc_ids must produce the same
    dHash (the canonical 32x24 frame removes id-dependent dims), and a
    different text a different one."""
    from pyspark.sql import functions as F

    from codegraph_spark.operators.multimodal import (
        dhash_codes,
        encode_documents_as_images,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "an entirely different document body with other words"),
        ],
        ["doc_id", "text"],
    )
    imgs = encode_documents_as_images(docs, fixed_dims=(32, 24))
    got = {r.doc_id: r.dhash for r in dhash_codes(imgs).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_unknown_codec_still_fails_fast(spark):
    """The guarded-codec dispatch keeps the fail-fast contract for
    codecs with no registered decoder."""
    import pytest as _pytest

    from codegraph_spark.operators.multimodal import _decode_payload

    with _pytest.raises(NotImplementedError, match="h264"):
        _decode_payload(b"\x00" * 16, "h264")


def test_pil_codec_message_names_the_dependency():
    """Without Pillow the PIL-codec path must explain the optional
    dependency (not pretend the codec is unknowable)."""
    import pytest as _pytest

    if _pil_available():
        _pytest.skip("Pillow installed: decode path covered below")
    from codegraph_spark.operators.multimodal import _decode_payload

    # baseline JPEG decodes via the stdlib codec since r8; an
    # out-of-envelope (progressive, SOF2) file falls THROUGH to the
    # dependency message
    import struct as _struct

    progressive = (
        b"\xff\xd8"
        + _struct.pack(">HH", 0xFFC2, 13)
        + _struct.pack(">BHHB", 8, 8, 8, 1)
        + bytes([1, 0x11, 0])
    )
    with _pytest.raises(NotImplementedError, match="Pillow"):
        _decode_payload(progressive, "jpeg")
    # a corrupt/truncated JPEG is a loud ValueError, not a Pillow ask
    with _pytest.raises(ValueError, match="bad JPEG|not a JPEG"):
        _decode_payload(b"\xff\xd8\xff\xe0\x00\x04\x00\x00", "jpeg")
    # an out-of-envelope PNG (16-bit) falls THROUGH the stdlib decoder
    # to the same dependency message
    import struct
    import zlib

    from codegraph_spark.operators.png_stdlib import _SIG, _chunk

    deep = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with _pytest.raises(NotImplementedError, match="Pillow"):
        _decode_payload(deep, "png")
    # a baseline PNG, by contrast, decodes with no Pillow at all
    from codegraph_spark.operators.png_stdlib import encode_png

    w, h, px = _decode_payload(encode_png(bytes(range(12)), 4, 3), "png")
    assert (w, h) == (4, 3) and list(px) == list(range(12))


def test_pil_decode_real_png():
    """Runs only where Pillow exists: a real PNG decodes through the
    same kernel entry point the raw format uses."""
    import pytest as _pytest

    if not _pil_available():
        _pytest.skip("Pillow not installed in this container")
    import io

    import numpy as np
    from PIL import Image

    from codegraph_spark.operators.multimodal import _decode_payload

    img = Image.fromarray(
        np.arange(64, dtype=np.uint8).reshape(8, 8), mode="L"
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    width, height, body = _decode_payload(buf.getvalue(), "png")
    assert (width, height) == (8, 8)
    assert body.tolist() == list(range(64))


# --- guarded video-codec path (r5 VERDICT item 4) ----------------------------


def _av_available() -> bool:
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        return False


def test_video_raw_path_slices_frames():
    """_decode_video_frames on raw-gray-v1 == the historical behavior:
    body bytes sliced into frame_len-byte frames, trailing partial
    dropped."""
    import numpy as np

    from codegraph_spark.operators.multimodal import (
        RAW_GRAY_V1,
        _decode_video_frames,
    )

    body = bytes(range(10))
    payload = struct.pack(">II", 5, 2) + body
    frames = _decode_video_frames(payload, RAW_GRAY_V1, frame_len=4)
    assert frames.shape == (2, 4)  # 10 // 4 = 2 full frames
    assert frames.dtype == np.uint8
    assert frames[0].tolist() == [0, 1, 2, 3]
    assert frames[1].tolist() == [4, 5, 6, 7]


def test_video_codec_message_names_the_dependency():
    """Without PyAV/imageio the container-codec path must explain the
    optional dependency (the Pillow-guard contract, extended to
    video)."""
    import pytest as _pytest

    if _av_available():
        _pytest.skip("PyAV installed: decode path covered below")
    from codegraph_spark.operators.multimodal import _decode_video_frames

    with _pytest.raises(NotImplementedError, match="PyAV"):
        _decode_video_frames(b"\x00" * 64, "h264", frame_len=8)


def test_video_av_plumbing_with_stub_decoder(monkeypatch):
    """Driver-side contract of the PyAV branch, exercised with a stub
    module: frames reformat to gray, flatten to their OWN geometry
    (frame_len ignored), and stack to (n_frames, pixels). The
    Spark-side mapInPandas plumbing is codec-agnostic and covered by
    the raw-codec tests; a stub cannot cross the executor boundary,
    so this pins exactly the decode adapter."""
    import contextlib

    import numpy as np

    from codegraph_spark.operators import multimodal as mm

    class _Frame:
        def __init__(self, fill):
            self._fill = fill

        def reformat(self, format):
            assert format == "gray"
            return self

        def to_ndarray(self):
            return np.full((2, 3), self._fill, dtype=np.uint8)

    class _Container:
        def decode(self, video):
            assert video == 0
            return iter([_Frame(7), _Frame(9)])

    class _StubAV:
        @staticmethod
        @contextlib.contextmanager
        def open(fh):
            yield _Container()

    monkeypatch.setattr(mm, "_AV_MODULE", _StubAV)
    try:
        frames = mm._decode_video_frames(b"\x00" * 32, "h264", frame_len=999)
    finally:
        pass
    assert frames.shape == (2, 6)  # 2 frames x (2*3 gray pixels)
    assert frames[0].tolist() == [7] * 6
    assert frames[1].tolist() == [9] * 6


@pytest.mark.skipif(not _av_available(), reason="PyAV not installed")
def test_video_av_decode_real_container(tmp_path):
    """Runs only where PyAV exists: encode a tiny synthetic clip and
    decode it back through the guarded path."""
    import av
    import numpy as np

    from codegraph_spark.operators.multimodal import _decode_video_frames

    import io

    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("h264", rate=4)
        stream.width, stream.height = 16, 8
        stream.pix_fmt = "yuv420p"
        for i in range(6):
            img = np.full((8, 16, 3), i * 20, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    frames = _decode_video_frames(buf.getvalue(), "h264", frame_len=0)
    assert frames.shape[0] == 6
    assert frames.shape[1] == 16 * 8


def test_audio_fingerprint_finds_planted_clones(spark, sf_dir):
    """The landmark fingerprint must recover (nearly) all planted
    clone pairs even though each clone's clip LENGTH differs from its
    source (doc_id enters n_samples): >= 12 of 13 pairs at sf0.001 —
    the one miss is a clip whose peak layout the length shift disturbs,
    the expected lossy-fingerprint behavior."""
    from codegraph_spark.queries.multimodal import mm_audio_fingerprint
    from codegraph_spark.queries.similarity import CLONE_EVERY, CLONE_OFFSET
    from codegraph_spark.sources.tables import load_table

    ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
        if r["doc_id"] % CLONE_EVERY == 0
    ]
    clone_pairs = {(i, i + CLONE_OFFSET) for i in ids}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in mm_audio_fingerprint(spark, sf_dir).collect()
    }
    found = got & clone_pairs
    assert len(found) >= len(clone_pairs) - 1, (len(found), len(clone_pairs))
