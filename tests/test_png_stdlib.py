"""The pure-stdlib PNG codec (r6 VERDICT "What's missing" item 1):
genuine PNG bytes decode end-to-end in this dependency-free container
— through the codec dispatch and the real image kernels
(decode_image_stats / dhash / phash), no skip, no Pillow."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from codegraph_spark.operators.png_stdlib import _SIG, _chunk, decode_png_gray, encode_png


def _grid(w, h, seed=7):
    return ((np.arange(w * h) * seed + 13) % 256).astype(np.uint8)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_gray_roundtrip_each_filter(filt):
    w, h = 23, 9
    px = _grid(w, h)
    data = encode_png(px, w, h, channels=1, filters=[filt])
    dw, dh, out = decode_png_gray(data)
    assert (dw, dh) == (w, h)
    assert np.array_equal(out, px)


def test_gray_roundtrip_cycling_filters():
    w, h = 31, 17
    px = _grid(w, h, seed=11)
    dw, dh, out = decode_png_gray(encode_png(px, w, h))
    assert np.array_equal(out, px)


def test_rgb_roundtrip_luma():
    w, h = 12, 8
    rgb = _grid(w * 3, h, seed=5)
    dw, dh, out = decode_png_gray(encode_png(rgb, w, h, channels=3))
    px = rgb.reshape(h, w, 3).astype(np.uint32)
    luma = ((299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000).reshape(-1)
    assert np.array_equal(out, luma.astype(np.uint8))


def _manual_png(ctype, w, h, raw_rows, extra_chunks=b"", depth=8, interlace=0):
    """Hand-built PNG for variants the test encoder doesn't write."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    raw = b"".join(b"\x00" + r.tobytes() for r in raw_rows)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + extra_chunks
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_palette_png_decodes_via_plte():
    w, h = 4, 2
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    data = _manual_png(3, w, h, list(idx), extra_chunks=_chunk(b"PLTE", pal.tobytes()))
    dw, dh, out = decode_png_gray(data)
    p32 = pal.astype(np.uint32)
    luma = (299 * p32[:, 0] + 587 * p32[:, 1] + 114 * p32[:, 2]) // 1000
    assert np.array_equal(out.reshape(h, w), luma[idx])


def test_rgba_alpha_ignored():
    w, h = 3, 1
    row = np.array([10, 20, 30, 0, 200, 100, 50, 255, 7, 7, 7, 128], np.uint8)
    dw, dh, out = decode_png_gray(_manual_png(6, w, h, [row]))
    px = row.reshape(w, 4).astype(np.uint32)
    luma = (299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2]) // 1000
    assert np.array_equal(out, luma.astype(np.uint8))


def test_gray_alpha_uses_gray_channel():
    row = np.array([9, 0, 200, 255], np.uint8)  # two (gray, alpha) pairs
    _, _, out = decode_png_gray(_manual_png(4, 2, 1, [row]))
    assert list(out) == [9, 200]


def test_unsupported_variants_raise_notimplemented():
    px = _grid(4, 4)
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png_gray(_manual_png(0, 4, 4, [px.reshape(4, 4)[0]], depth=16))
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png_gray(_manual_png(0, 4, 4, list(px.reshape(4, 4)), interlace=1))
    with pytest.raises(ValueError, match="signature"):
        decode_png_gray(b"JFIF" + bytes(100))


def test_dispatch_routes_png_ahead_of_pillow_probe():
    """_decode_payload must decode genuine PNG bytes in this container
    (no Pillow) instead of raising the optional-dependency message."""
    from codegraph_spark.operators.multimodal import _decode_payload

    w, h = 19, 7
    px = _grid(w, h, seed=3)
    dw, dh, out = _decode_payload(encode_png(px, w, h), "png")
    assert (dw, dh) == (w, h)
    assert np.array_equal(out, px)


def _png_images_df(spark, n=6):
    rows = []
    for doc_id in range(1, n + 1):
        w, h = 32, 32  # canonical frame (phash requires 32x32)
        px = _grid(w, h, seed=doc_id)
        rows.append((doc_id, bytearray(encode_png(px, w, h)), "image", "png", w, h))
    return spark.createDataFrame(
        rows, "doc_id long, payload binary, codec_m string, codec string, width int, height int"
    ).drop("codec_m")


def test_real_png_through_image_kernels_no_skip(spark):
    """Genuine PNG payloads through the three production image kernels
    — stats, dHash, pHash — produce the same values as the equivalent
    raw-gray-v1 payloads (codec-independence of everything downstream
    of the dispatch)."""
    from codegraph_spark.operators.multimodal import (
        RAW_GRAY_V1,
        decode_image_stats,
        dhash_codes,
        phash_codes,
    )

    imgs_png = _png_images_df(spark)

    def raw_payload(doc_id):
        w, h = 32, 32
        return bytearray(struct.pack(">II", w, h) + _grid(w, h, seed=doc_id).tobytes())

    rows = [
        (doc_id, raw_payload(doc_id), RAW_GRAY_V1) for doc_id in range(1, 7)
    ]
    imgs_raw = spark.createDataFrame(rows, "doc_id long, payload binary, codec string")

    for kernel in (decode_image_stats, dhash_codes, phash_codes):
        got_png = {r["doc_id"]: r.asDict() for r in kernel(imgs_png).collect()}
        got_raw = {r["doc_id"]: r.asDict() for r in kernel(imgs_raw).collect()}
        assert got_png == got_raw
        assert len(got_png) == 6


# --- property: decode(encode(x)) == x for arbitrary images/filters ----------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
        filters=st.lists(st.integers(0, 4), min_size=1, max_size=8),
        channels=st.sampled_from([1, 3]),
    )
    def test_roundtrip_property(w, h, seed, filters, channels):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=w * h * channels, dtype=np.uint8)
        dw, dh, out = decode_png_gray(
            encode_png(px, w, h, channels=channels, filters=filters)
        )
        assert (dw, dh) == (w, h)
        if channels == 1:
            assert np.array_equal(out, px)
        else:
            p = px.reshape(h, w, 3).astype(np.uint32)
            luma = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
            assert np.array_equal(out, luma.reshape(-1).astype(np.uint8))
except ImportError:  # hypothesis is in the image, but stay import-safe
    pass
