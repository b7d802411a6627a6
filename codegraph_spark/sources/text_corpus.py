"""Text-corpus ingestion beyond parquet: JSONL and CSV document
sources, plus the matching sinks.

The reference ingests markdown files from a directory walk
(pkg/indexer/documents/indexer.go); a training-data pipeline pulls the
same document shape out of JSONL/CSV drops. Rules that matter at
100 TB:

- **Explicit schema, never inference.** ``inferSchema``/sampling runs
  an extra full pass over the input and can flip types between drops;
  the document schema is declared once here.
- **Corrupt-record quarantine, not job failure.** PERMISSIVE mode
  routes undecodable lines into ``_corrupt_record``; the loader splits
  them off so the main frame is clean and the quarantine is auditable
  (DROPMALFORMED silently deletes data — wrong default for a corpus
  you bill as reproducible).
- **Line-splittable formats stay parallel.** JSONL and CSV without
  multiline quoting split on line boundaries, so read parallelism is
  file-size-driven exactly like parquet; multiline JSON would serialize
  each file through one task (refused here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents-table schema (TESTDATA.md), declared once.
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_documents_jsonl(docs: DataFrame, path: str, *, n_files: int = 4) -> None:
    """JSONL drop of a documents frame (one JSON object per line)."""
    docs.repartition(n_files).write.mode("overwrite").json(path)
    from codegraph_spark import serving

    serving.invalidate(path)  # serving contract: rewrite drops caches over the dir


def write_documents_csv(docs: DataFrame, path: str, *, n_files: int = 4) -> None:
    """CSV drop with header; text is quoted/escaped by the writer."""
    (
        docs.repartition(n_files)
        .write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .csv(path)
    )
    from codegraph_spark import serving

    serving.invalidate(path)  # serving contract: rewrite drops caches over the dir


def read_documents_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a JSONL drop. Clean rows carry the
    declared schema; quarantine rows carry the raw offending line."""
    schema = T.StructType(
        DOC_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    ).cache()  # split below reads it twice; one scan, not two
    clean = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantine = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return clean, quarantine


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV drop with the declared schema (header consumed, no
    inference pass)."""
    return (
        spark.read.schema(DOC_SCHEMA)
        .option("header", "true")
        .option("escape", '"')
        .csv(path)
    )
