"""Binary media directory source — point the multimodal operators at a
REAL directory of image/audio/video files.

The reference has no media pipeline (this is prompt-mandated extension
surface, like operators/multimodal.py); the source mirrors the S1/S5
ingestion shape: a distributed directory walk producing one typed row
per file, feeding the same (doc_id, payload, codec) contract the
Arrow-batched kernels consume. Spark's built-in ``binaryFile`` format
does the heavy lifting — distributed listing, per-file read on the
executor that maps the partition, max-file-size guard via
``spark.sql.sources.binaryFile.maxLength`` — so the scan scales the
way any file-source scan does (one task per file group, no driver-side
directory walk, no payload through the driver).

Codec is inferred from the extension only — sniffing magic bytes would
need the payload on the driver; the decode kernels verify payloads
anyway and fail fast on a mismatch (operators/multimodal._decode_*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension -> (modality, codec name as the decode kernels know it)
MEDIA_TYPES = {
    "jpg": ("image", "jpeg"),
    "jpeg": ("image", "jpeg"),
    "png": ("image", "png"),
    "bmp": ("image", "bmp"),
    "gif": ("image", "gif"),
    "webp": ("image", "webp"),
    "rawgray": ("image", "raw-gray-v1"),
    "wav": ("audio", "wav"),
    "mp3": ("audio", "mp3"),
    "flac": ("audio", "flac"),
    "rawpcm": ("audio", "raw-pcm-v1"),
    "mjpeg": ("video", "mjpeg"),
    "mjpg": ("video", "mjpeg"),
    "mp4": ("video", "h264"),
    "mkv": ("video", "h264"),
    "webm": ("video", "vp9"),
}


def _modality_glob(modality: str) -> str:
    """Case-insensitive pathGlobFilter matching exactly the extensions
    of one modality (r13, guide §6): ``binaryFile`` otherwise lists AND
    reads every file under the root, and the modality filter — a
    regexp over the path — runs only after the payload bytes are
    already loaded. Pushing the extension set into the listing skips
    the open+read of every other-modality file. Case classes (``[jJ]``)
    keep the glob equivalent to the ``lower(ext)`` lookup the modality
    column uses, so the row set is unchanged for ANY directory content
    (pinned by test: mixed-case and unknown extensions)."""
    pats = [
        "".join(f"[{c}{c.upper()}]" if c.isalpha() else c for c in ext)
        for ext, (m, _c) in MEDIA_TYPES.items()
        if m == modality
    ]
    return "*.{" + ",".join(pats) + "}"


def read_media_dir(
    spark: SparkSession, root: str, glob: str = "*", modality: str | None = None
) -> DataFrame:
    """Recursive binary scan of ``root`` → one row per media file:
    (doc_id, path, modality, codec, n_bytes, payload).

    ``doc_id`` is the xxhash64 of the root-relative path — stable
    across re-ingests and across machines mounting the corpus at
    different absolute roots (an absolute-path hash would re-key every
    derived table on a mount move). ``modality`` filters to one kind
    when the caller wants only images/audio/video. Files with unknown
    extensions are dropped (and countable by comparing against an
    unfiltered scan) rather than guessed at."""
    import os

    # narrow the listing to the requested modality's extensions when
    # the caller did not constrain the glob themselves — the modality
    # filter below still applies (belt and braces); the glob only
    # controls which files are opened at all
    if modality is not None and glob == "*":
        glob = _modality_glob(modality)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    # binaryFile reports URIs ("file:/abs/..."): strip the root prefix
    # by LENGTH, not regex — a root containing regex metacharacters
    # (version dirs like /data/v1.2/) must not corrupt the key
    prefix = "file:" + os.path.abspath(root).rstrip("/") + "/"
    rel = F.when(
        F.col("path").startswith(prefix),
        F.expr(f"substring(path, {len(prefix) + 1})"),
    ).otherwise(F.col("path"))
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    modality_col = F.lit(None).cast("string")
    codec_col = F.lit(None).cast("string")
    for e, (m, c) in MEDIA_TYPES.items():
        modality_col = F.when(ext == e, m).otherwise(modality_col)
        codec_col = F.when(ext == e, c).otherwise(codec_col)
    out = (
        df.select(
            F.xxhash64(rel).alias("doc_id"),
            rel.alias("path"),
            modality_col.alias("modality"),
            codec_col.alias("codec"),
            F.col("length").alias("n_bytes"),
            F.col("content").alias("payload"),
        )
        .filter(F.col("modality").isNotNull())
    )
    if modality is not None:
        out = out.filter(F.col("modality") == modality)
    return out
