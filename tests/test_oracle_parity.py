"""Oracle-parity harness — mirrors the driver's correctness gate.

For every declared query, run the Spark DataFrame program and the
DuckDB oracle SQL on the same parquet tables, then compare:
row count, column-name set, and the order-insensitive multiset of
normalized row values (floats rounded — queries already round
in-query, this guards representation noise only).
"""

from __future__ import annotations

import math

import pytest


def _normalize_cell(v):
    # Dtype-faithful, matching tools/drive_driver.py: a float NEVER
    # renders like an int (the driver hashes 5.0 != 5; the round-3
    # uncast-HUGEINT reds were invisible to a ".0"-stripping norm).
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"f:{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_normalize_cell(x) for x in v) + "]"
    return str(v)


def _normalize(df_pandas, cols):
    rows = []
    for _, row in df_pandas[cols].iterrows():
        rows.append(tuple(_normalize_cell(v) for v in row))
    return sorted(rows)


def _all_query_names():
    from codegraph_spark.queries import collect

    queries, oracles = collect()
    return [(name, name in oracles) for name in sorted(queries)]


@pytest.mark.parametrize("name,has_oracle", _all_query_names())
def test_query_matches_oracle(spark, duck, sf_dir, name, has_oracle):
    from codegraph_spark.queries import collect

    queries, oracles = collect()
    sdf = queries[name](spark, sf_dir)
    spark_pd = sdf.toPandas()

    if not has_oracle:
        # rows-only check (the driver's weaker gate for non-SQL ops)
        assert spark_pd is not None
        return

    duck_pd = duck.execute(oracles[name]).fetchdf()

    spark_cols = sorted(spark_pd.columns)
    duck_cols = sorted(duck_pd.columns)
    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row count {len(spark_pd)} vs oracle {len(duck_pd)}"
    )
    left = _normalize(spark_pd, spark_cols)
    right = _normalize(duck_pd, spark_cols)
    if left != right:
        diffs = [(l, r) for l, r in zip(left, right) if l != r][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
