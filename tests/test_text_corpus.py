"""JSONL/CSV corpus source round-trips: lossless against the parquet
documents table, corrupt-line quarantine, no inference pass."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.select("doc_id", "text", "lang", "source", "n_chars").collect())


def test_jsonl_roundtrip_lossless(spark, sf_dir, tmp_path):
    from codegraph_spark.sources.text_corpus import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, path)
    clean, quarantine = read_documents_jsonl(spark, path)
    assert quarantine.count() == 0
    assert _sorted_rows(clean) == _sorted_rows(docs)


def test_jsonl_quarantines_corrupt_lines(spark, sf_dir, tmp_path):
    from codegraph_spark.sources.text_corpus import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    docs = _docs(spark, sf_dir).limit(10)
    path = str(tmp_path / "docs_bad")
    write_documents_jsonl(docs, path, n_files=1)
    # a fresh file (not appended to a Spark part file, whose .crc
    # sidecar would no longer match) carrying two undecodable lines
    with open(os.path.join(path, "part-extra-corrupt.json"), "w") as f:
        f.write('{"doc_id": broken!!\n')
        f.write("not json at all\n")
    clean, quarantine = read_documents_jsonl(spark, path)
    assert clean.count() == 10
    assert quarantine.count() == 2


def test_csv_roundtrip_lossless(spark, sf_dir, tmp_path):
    from codegraph_spark.sources.text_corpus import (
        read_documents_csv,
        write_documents_csv,
    )

    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "docs_csv")
    write_documents_csv(docs, path)
    back = read_documents_csv(spark, path)
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_jsonl_feeds_the_query_layer(spark, sf_dir, tmp_path):
    """A JSONL drop is a drop-in documents source: the dedup-exact
    grouping over it matches the parquet-table result."""
    from codegraph_spark.sources.text_corpus import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    docs = _docs(spark, sf_dir)
    path = str(tmp_path / "docs_feed")
    write_documents_jsonl(docs, path)
    clean, _ = read_documents_jsonl(spark, path)
    a = clean.groupBy("text").agg(F.count(F.lit(1)).alias("n")).filter("n > 1")
    b = docs.groupBy("text").agg(F.count(F.lit(1)).alias("n")).filter("n > 1")
    assert sorted((r.text, r.n) for r in a.collect()) == sorted(
        (r.text, r.n) for r in b.collect()
    )
