"""Training-data export sinks.

``write_webdataset`` materializes a corpus as WebDataset-style tar
shards — the de-facto loader format of large-scale training pipelines
(one ``.tar`` per shard; each sample's members named ``<key>.<field>``
so a sequential reader reassembles samples without an index). The
reference has no export surface (extension, like the dedup/multimodal
families); the Spark shape is the point:

- shard assignment is ``xxhash64(key) % n_shards`` — deterministic,
  near-uniform (no global sort / row_number, which would funnel the
  corpus through one partition), and stable across reruns;
- one ``applyInPandas`` group per shard builds its tar IN MEMORY and
  writes it from the executor that owns the group — the driver never
  sees a payload; memory per task is one shard, sized by
  ``samples_per_shard`` (pick it for payload size × count ≈ the usual
  100 MB-1 GB shard);
- tars are byte-deterministic (members sorted by name, zeroed
  mtime/uid/gid), so shard sha256s are reproducible and diffable
  across runs — the manifest this returns is the integrity record a
  downstream loader pins.

``out_dir`` must be visible to every executor (local mode: any local
dir; cluster: shared or object storage via a mounted path).
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "shard int, n_samples long, n_bytes long, sha256 string"


def _tar_bytes(rows: list[tuple[str, dict[str, bytes]]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for key, fields in sorted(rows, key=lambda kv: kv[0]):
            for field in sorted(fields):
                data = fields[field]
                info = tarfile.TarInfo(name=f"{key}.{field}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def write_webdataset(
    samples: DataFrame,
    out_dir: str,
    samples_per_shard: int = 1000,
    key_col: str = "key",
    shard_col: str | None = None,
) -> DataFrame:
    """Write ``samples`` as ``shard-%05d.tar`` files under ``out_dir``.

    Every column except ``key_col`` (and ``shard_col``) becomes a tar
    member named ``<key>.<column>`` — binary columns verbatim,
    everything else utf-8 text (the WebDataset convention:
    ``.txt``/``.json``/``.cls`` members next to ``.jpg``). Returns the
    shard manifest (shard, n_samples, n_bytes, sha256) as a DataFrame;
    the write has already happened when it is materialized.

    ``shard_col`` names a PRECOMPUTED integer shard assignment (e.g.
    the token-budgeted packing of ``corpus_pack_shards``) to use
    instead of the default xxhash64 assignment — the curation operator
    decides the packing, the sink only materializes it."""
    os.makedirs(out_dir, exist_ok=True)
    if shard_col is not None:
        assigned = samples.withColumn("_shard", F.col(shard_col).cast("int"))
        if shard_col != "_shard":
            assigned = assigned.drop(shard_col)
        n_shards = max(1, assigned.select("_shard").distinct().count())
    else:
        n = samples.count()
        n_shards = max(1, -(-n // samples_per_shard))
        assigned = samples.withColumn(
            "_shard",
            (F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))).cast("int"),
        )
    fields = [c for c in assigned.columns if c not in (key_col, "_shard")]

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=["shard", "n_samples", "n_bytes", "sha256"])
        rows: list[tuple[str, dict[str, bytes]]] = []
        shard = int(pdf["_shard"].iloc[0])
        for _, r in pdf.iterrows():
            member = {}
            for fcol in fields:
                v = r[fcol]
                member[fcol] = (
                    bytes(v) if isinstance(v, (bytes, bytearray))
                    else str(v).encode("utf-8")
                )
            rows.append((str(r[key_col]), member))
        blob = _tar_bytes(rows)
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        with open(path, "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(rows)],
                "n_bytes": [len(blob)],
                "sha256": [hashlib.sha256(blob).hexdigest()],
            }
        )

    manifest = (
        assigned.repartition(n_shards, "_shard")
        .groupBy("_shard")
        .applyInPandas(write_shard, schema=MANIFEST_SCHEMA)
    )
    # materialize NOW: the sink's contract is "files exist on return"
    out = manifest.orderBy("shard").localCheckpoint(eager=True)
    from codegraph_spark import serving

    serving.invalidate(out_dir)  # serving contract: rewrite drops caches over the dir
    return out
