"""Pure-stdlib RIFF/WAVE codec — ``struct`` + numpy only.

The audio analog of :mod:`codegraph_spark.operators.png_stdlib` /
``jpeg_stdlib``: a from-scratch implementation of the one audio
CONTAINER format that needs no entropy coder, so real stored audio
bytes can cross the ingest door in this dependency-free container.
Format per the public Microsoft/IBM *Multimedia Programming
Interface and Data Specifications 1.0* (1991) RIFF/WAVE chapter:

- a ``RIFF`` form whose type is ``WAVE``, holding word-aligned
  chunks (an odd-sized chunk is followed by one pad byte that is
  NOT counted in its declared size);
- a ``fmt `` chunk (PCM: 16 bytes — format tag, channels, sample
  rate, byte rate, block align, bits per sample) that must precede
  ``data``;
- a ``data`` chunk of interleaved frames (channel-major within a
  frame): 8-bit PCM is UNSIGNED bytes around the 0x80 midline,
  16-bit PCM is little-endian SIGNED.

Envelope: PCM (format tag 1) at 8 or 16 bits, any channel count.
Out-of-envelope format tags raise a NAMED ``NotImplementedError``
(IEEE float 3, A-law 6, mu-law 7, EXTENSIBLE 0xFFFE) so a caller
holding an optional real decoder can fall through — the same
dependency-story seam as the JPEG progressive modes
(operators/jpeg_stdlib.py). Malformed structure — bad magic, a
chunk running past the payload, fmt/data inconsistencies,
truncated sample data — raises ``ValueError`` loudly; at ingest a
corrupt file must fail, never decode to garbage stats.

Reference parity note: the reference engine (techsavvyash/codegraph)
has no media path at all; this module exists for the training-data
pipeline surface (multimodal ingest) the build brief mandates.
"""

from __future__ import annotations

import struct

import numpy as np

#: format tags we refuse BY NAME (spec values) — everything else
#: unknown raises the generic NotImplementedError below.
_NAMED_TAGS = {
    3: "IEEE-float WAVE (format tag 3)",
    6: "A-law WAVE (format tag 6)",
    7: "mu-law WAVE (format tag 7)",
    0xFFFE: "WAVE_FORMAT_EXTENSIBLE (format tag 0xFFFE)",
}


def encode_wav(
    samples: np.ndarray,
    sample_rate: int,
    *,
    info: str | None = None,
) -> bytes:
    """Encode PCM ``samples`` as a canonical RIFF/WAVE byte string.

    ``samples``: 1-D (mono) or 2-D ``(n_frames, n_channels)`` array of
    ``uint8`` (8-bit unsigned PCM) or ``int16`` (16-bit little-endian
    PCM). ``info``: optional text written as a ``LIST``/``INFO``
    ``ICMT`` comment chunk BETWEEN ``fmt `` and ``data`` — an
    odd-length comment exercises the decoder's pad-byte walk, which is
    exactly why the round-trip gate passes one.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"samples must be 1-D or 2-D, got {arr.ndim}-D")
    if arr.dtype == np.uint8:
        bits = 8
    elif arr.dtype == np.int16:
        bits = 16
    else:
        raise ValueError(f"unsupported sample dtype {arr.dtype} (uint8/int16)")
    n_frames, n_channels = arr.shape
    block_align = n_channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = [(b"fmt ", fmt)]
    if info is not None:
        comment = info.encode("ascii")
        icmt = struct.pack("<4sI", b"ICMT", len(comment)) + comment
        if len(comment) % 2:
            icmt += b"\x00"  # pad byte, not counted in ICMT's size
        chunks.append((b"LIST", b"INFO" + icmt))
    data = arr.astype("<i2" if bits == 16 else np.uint8).tobytes()
    chunks.append((b"data", data))

    body = bytearray(b"WAVE")
    for tag, payload in chunks:
        body += struct.pack("<4sI", tag, len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"
    return struct.pack("<4sI", b"RIFF", len(body)) + bytes(body)


def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a RIFF/WAVE byte string.

    Returns ``(sample_rate, n_channels, bits, frames)`` where
    ``frames`` is ``(n_frames, n_channels)`` — ``uint8`` for 8-bit,
    ``int16`` for 16-bit. Walks the chunk list, skipping unknown
    chunks and pad bytes; validates the fmt chunk's derived fields
    (byte rate, block align) and that the data chunk holds a whole
    number of frames.
    """
    if len(payload) < 12:
        raise ValueError("payload too short for a RIFF header")
    magic, riff_size, form = struct.unpack_from("<4sI4s", payload, 0)
    if magic != b"RIFF":
        raise ValueError(f"not a RIFF stream (magic {magic!r})")
    if form != b"WAVE":
        raise ValueError(f"RIFF form {form!r} is not WAVE")
    end = 8 + riff_size
    if end > len(payload):
        raise ValueError(
            f"RIFF declares {riff_size} bytes but payload holds "
            f"{len(payload) - 8}"
        )

    fmt_fields = None
    pos = 12
    while pos + 8 <= end:
        tag, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if pos + size > end:
            raise ValueError(f"chunk {tag!r} runs past the RIFF form")
        chunk = payload[pos : pos + size]
        pos += size + (size % 2)  # word alignment: odd chunks carry a pad
        if tag == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk is {size} bytes (< 16)")
            fmt_fields = struct.unpack_from("<HHIIHH", chunk, 0)
        elif tag == b"data":
            if fmt_fields is None:
                raise ValueError("data chunk precedes fmt chunk")
            tag_id, n_channels, rate, byte_rate, block_align, bits = fmt_fields
            if tag_id != 1:
                reason = _NAMED_TAGS.get(
                    tag_id, f"WAVE format tag {tag_id}"
                )
                raise NotImplementedError(
                    f"{reason}: only integer PCM (tag 1) decodes "
                    "dependency-free in this container — route this file "
                    "to an optional real decoder."
                )
            if bits not in (8, 16):
                raise NotImplementedError(
                    f"{bits}-bit PCM: only 8/16-bit decodes here."
                )
            if n_channels == 0:
                raise ValueError("fmt declares zero channels")
            expect_align = n_channels * (bits // 8)
            if block_align != expect_align:
                raise ValueError(
                    f"block align {block_align} != channels*width "
                    f"{expect_align}"
                )
            if byte_rate != rate * block_align:
                raise ValueError(
                    f"byte rate {byte_rate} != rate*align {rate * block_align}"
                )
            if size % block_align:
                raise ValueError(
                    f"data chunk ({size} bytes) is not a whole number of "
                    f"{block_align}-byte frames"
                )
            dtype = np.dtype("<i2") if bits == 16 else np.dtype(np.uint8)
            frames = np.frombuffer(chunk, dtype=dtype).reshape(-1, n_channels)
            return rate, n_channels, bits, frames
        # any other chunk (LIST, fact, cue, bext, ...) is skipped
    raise ValueError("no data chunk in WAVE stream")
