"""RIFF/WAVE stdlib codec: round-trips, chunk walking, cross-checks
against Python's stdlib ``wave`` module (an independent reader/writer
of the same 1991 RIFF spec), and the loud-failure contract for
malformed and out-of-envelope streams."""

import io
import struct
import wave

import numpy as np
import pytest

from codegraph_spark.operators.multimodal import _decode_audio_payload
from codegraph_spark.operators.wav_stdlib import decode_wav, encode_wav


def _tone16(n, ch=1, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(-30000, 30000, size=(n, ch), dtype=np.int16)


def test_roundtrip_mono_int16():
    s = _tone16(777)
    rate, nch, bits, frames = decode_wav(encode_wav(s, 16000))
    assert (rate, nch, bits) == (16000, 1, 16)
    assert np.array_equal(frames, s)


def test_roundtrip_stereo_int16():
    s = _tone16(500, ch=2)
    rate, nch, bits, frames = decode_wav(encode_wav(s, 44100))
    assert (rate, nch, bits) == (44100, 2, 16)
    assert np.array_equal(frames, s)


def test_roundtrip_mono_uint8():
    s = np.arange(256, dtype=np.uint8).reshape(-1, 1)
    rate, nch, bits, frames = decode_wav(encode_wav(s, 8000))
    assert (rate, nch, bits) == (8000, 1, 8)
    assert np.array_equal(frames, s)


def test_odd_info_chunk_pad_byte_walk():
    # odd-length comment -> ICMT pad byte inside LIST; LIST itself is
    # skipped by the decoder, so a mis-walk shifts the data chunk tag
    s = _tone16(64)
    payload = encode_wav(s, 8000, info="odd")  # 3 ascii bytes
    rate, nch, bits, frames = decode_wav(payload)
    assert np.array_equal(frames, s)
    # the pad byte must not be counted in the LIST size but must be
    # present in the stream: total length stays even
    assert len(payload) % 2 == 0


def test_unknown_chunk_is_skipped():
    s = _tone16(32)
    payload = bytearray(encode_wav(s, 8000))
    # splice a junk chunk right after the fmt chunk (12-byte RIFF
    # header + 8 + 16 fmt)
    junk = struct.pack("<4sI", b"junk", 5) + b"abcde\x00"
    insert_at = 12 + 8 + 16
    payload[insert_at:insert_at] = junk
    # fix the RIFF size
    new_size = len(payload) - 8
    payload[4:8] = struct.pack("<I", new_size)
    rate, nch, bits, frames = decode_wav(bytes(payload))
    assert np.array_equal(frames, s)


def test_stdlib_wave_reads_our_bytes():
    s = _tone16(300, ch=2)
    payload = encode_wav(s, 22050, info="x")
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 2
        assert w.getsampwidth() == 2
        assert w.getnframes() == 300
        raw = w.readframes(300)
    assert np.array_equal(
        np.frombuffer(raw, dtype="<i2").reshape(-1, 2), s
    )


def test_we_read_stdlib_wave_bytes():
    s = _tone16(150)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(12000)
        w.writeframes(s.astype("<i2").tobytes())
    rate, nch, bits, frames = decode_wav(buf.getvalue())
    assert (rate, nch, bits) == (12000, 1, 16)
    assert np.array_equal(frames, s)


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + b"\x00" * 40)


def test_wrong_form_raises():
    payload = bytearray(encode_wav(_tone16(8), 8000))
    payload[8:12] = b"AVI "
    with pytest.raises(ValueError, match="WAVE"):
        decode_wav(bytes(payload))


def test_truncated_data_raises():
    payload = encode_wav(_tone16(64), 8000)
    with pytest.raises(ValueError, match="declares|runs past"):
        decode_wav(payload[:-10])


def test_float_format_raises_named():
    payload = bytearray(encode_wav(_tone16(8), 8000))
    payload[20:22] = struct.pack("<H", 3)  # format tag inside fmt chunk
    with pytest.raises(NotImplementedError, match="IEEE-float"):
        decode_wav(bytes(payload))


def test_inconsistent_block_align_raises():
    payload = bytearray(encode_wav(_tone16(8), 8000))
    payload[32:34] = struct.pack("<H", 7)  # block align field
    with pytest.raises(ValueError, match="block align"):
        decode_wav(bytes(payload))


def test_ragged_data_chunk_raises():
    s = _tone16(8, ch=2)
    payload = bytearray(encode_wav(s, 8000))
    # shrink the data chunk size by one byte: no longer whole frames
    data_size_at = len(payload) - 8 * 2 * 2 - 4
    (size,) = struct.unpack_from("<I", payload, data_size_at)
    struct.pack_into("<I", payload, data_size_at, size - 1)
    struct.pack_into("<I", payload, 4, len(payload) - 8 - 1)
    with pytest.raises(ValueError, match="whole number"):
        decode_wav(bytes(payload[:-1]))


def test_dispatch_routes_wav_and_raw_pcm():
    s = _tone16(96)
    got, mid, rate, ch, bits = _decode_audio_payload(
        encode_wav(s, 8000), "wav"
    )
    assert (mid, rate, ch, bits) == (0, 8000, 1, 16)
    assert np.array_equal(got, s.reshape(-1))

    raw = struct.pack(">II", 16000, 4) + bytes([1, 2, 3, 4])
    got, mid, rate, ch, bits = _decode_audio_payload(raw, "raw-pcm-v1")
    assert (mid, rate, ch, bits) == (128, 16000, 1, 8)
    assert np.array_equal(got, np.array([1, 2, 3, 4], dtype=np.uint8))


def test_dispatch_raw_pcm_length_mismatch_raises():
    raw = struct.pack(">II", 16000, 9) + bytes([1, 2, 3, 4])
    with pytest.raises(ValueError, match="declares 9"):
        _decode_audio_payload(raw, "raw-pcm-v1")


def test_dispatch_compressed_codec_raises_named():
    with pytest.raises(NotImplementedError, match="mp3"):
        _decode_audio_payload(b"\xff\xfb\x90\x00", "mp3")


def test_mislabeled_codec_fails_loudly():
    """WAV bytes under a raw-pcm label (and vice versa) must raise,
    never decode garbage: at ingest a wrong extension→codec mapping is
    a data bug, and silent mis-decode would poison every downstream
    stat."""
    wav = encode_wav(_tone16(64), 8000)
    # raw-pcm parse reads 'RIFF'+size as rate/count: count can't match
    with pytest.raises(ValueError, match="declares"):
        _decode_audio_payload(wav, "raw-pcm-v1")
    raw = struct.pack(">II", 16000, 4) + bytes([1, 2, 3, 4])
    with pytest.raises(ValueError, match="RIFF"):
        _decode_audio_payload(raw, "wav")
