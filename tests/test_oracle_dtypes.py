"""Static guard for the uncast-integer-sum oracle class (VERDICT r3):
DuckDB ``sum()`` over an integer column yields HUGEINT, which pandas
renders as float64 while the Spark twin emits bigint — the driver then
hashes ``5.0`` vs ``5`` and the row reds. The f9 fix (round 1) and the
four round-3 reds were all this one class; this test asserts the
contract for EVERY registered oracle: any column the Spark schema
declares integral must come back from DuckDB with an integer dtype.
"""

from __future__ import annotations

import pytest

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _oracle_names():
    from codegraph_spark.queries import collect

    _, oracles = collect()
    return sorted(oracles)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_integral_dtypes(spark, duck, sf_dir, name):
    from codegraph_spark.queries import collect

    queries, oracles = collect()
    sdf = queries[name](spark, sf_dir)
    integral_cols = [
        f.name for f in sdf.schema.fields
        if f.dataType.simpleString() in _INTEGRAL
    ]
    if not integral_cols:
        pytest.skip("no integral columns in the Spark schema")
    pdf = duck.execute(oracles[name]).fetchdf()
    bad = [
        (c, str(pdf[c].dtype))
        for c in integral_cols
        if c in pdf.columns and pdf[c].dtype.kind not in "iu"
    ]
    assert not bad, (
        f"{name}: oracle columns with non-integer dtype where the Spark "
        f"schema is integral (add CAST(... AS BIGINT) in the SQL): {bad}"
    )
