"""Sources: parquet table loaders, the TPC-H-ish → property-graph recast
used for oracle-checked correctness, and ingestion pipelines (SCIP,
documents, Go-AST plumbing)."""

from codegraph_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
