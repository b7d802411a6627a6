"""WebDataset tar shard source — the loader side of
:mod:`codegraph_spark.sinks`.

Shards are read with Spark's ``binaryFile`` source (one executor-side
read per tar, no driver walk) and exploded into samples by an
Arrow-batched ``mapInPandas`` untar: each tar member ``<key>.<field>``
contributes one column value, and a sample's members are adjacent in
the tar (the writer groups them), so reassembly is a single pass over
each shard held as bytes in memory — one shard per task, the same
memory envelope the writer has.

Round-trip contract with ``sinks.write_webdataset``: ``read_webdataset
(spark, out_dir)`` returns exactly the rows that were written (keys,
field names, payload bytes), pinned by tests/test_media_and_sinks.py.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _shard_fields(spark: SparkSession, path_glob: str) -> list[str]:
    """Field names, inferred from ONE shard's members (driver-side
    peek of a single tar — shards are field-homogeneous by the writer's
    construction)."""
    one = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path_glob)
        .select("content")
        .first()
    )
    if one is None:
        return []
    fields: set[str] = set()
    with tarfile.open(fileobj=io.BytesIO(bytes(one[0]))) as tar:
        for m in tar.getmembers():
            fields.add(m.name.rsplit(".", 1)[1])
    return sorted(fields)


def read_webdataset(
    spark: SparkSession, shard_dir: str, fields: list[str] | None = None
) -> DataFrame:
    """Read ``shard-*.tar`` files under ``shard_dir`` back into one row
    per sample: (key string, <field> binary, ...). Pass ``fields`` to
    skip the driver-side schema peek (e.g. in a pipeline that knows its
    own export schema); members with unlisted fields are ignored,
    missing fields yield NULL."""
    if fields is None:
        fields = _shard_fields(spark, shard_dir)
    if not fields:
        return spark.createDataFrame([], "key string")
    schema = "key string, " + ", ".join(f"`{f}` binary" for f in fields)

    def untar(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, dict[str, bytes]] = {}
            for content in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for m in tar.getmembers():
                        key, field = m.name.rsplit(".", 1)
                        if field in fields:
                            out.setdefault(key, {})[field] = tar.extractfile(m).read()
            keys = sorted(out)
            yield pd.DataFrame(
                {
                    "key": keys,
                    **{f: [out[k].get(f) for k in keys] for f in fields},
                }
            )

    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(shard_dir)
        .select("content")
    )
    return shards.mapInPandas(untar, schema=schema)
