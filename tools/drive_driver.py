"""Drive the __spark_entry__ contract exactly as the external driver would:
vanilla SparkSession (no engine tuning), entry() smoke, then each query at
sf0.01 compared against its DuckDB oracle (row count + sorted-column value
multiset)."""
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("external-driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) > 0

import os

import duckdb

con = duckdb.connect()
SF = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
for name in ["region", "nation", "customer", "supplier", "part",
             "orders", "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')")


def norm(v):
    # Dtype-faithful: a float NEVER renders like an int (the real driver
    # hashes 5.0 != 5 — the round-3 uncast-HUGEINT reds were invisible
    # here because the old norm collapsed both to "5").
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"f:{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


qs, os_ = e.queries(), e.oracle_sql()
print(f"{len(qs)} queries, {len(os_)} oracles")
selected = sys.argv[1:] or sorted(qs)
unknown = [n for n in selected if n not in qs]
if unknown:
    print(f"unknown queries: {unknown}")
    sys.exit(2)
fails = 0
for name in selected:
    t0 = time.perf_counter()
    spd = qs[name](spark, SF).toPandas()
    dt = time.perf_counter() - t0
    if name not in os_:
        print(f"  {name}: rows-only ({len(spd)} rows) [{dt:.2f}s]")
        continue
    dpd = con.execute(os_[name]).fetchdf()
    cols = sorted(spd.columns)
    ok_cols = cols == sorted(dpd.columns)
    ok_rows = len(spd) == len(dpd)
    ok_vals = False
    if ok_cols and ok_rows:
        l = sorted(tuple(norm(v) for v in r) for r in spd[cols].itertuples(index=False))
        r = sorted(tuple(norm(v) for v in row) for row in dpd[cols].itertuples(index=False))
        ok_vals = l == r
    status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
    if status != "OK":
        fails += 1
        print(f"  {name}: {status} cols={ok_cols} rows={len(spd)}/{len(dpd)} vals={ok_vals} [{dt:.2f}s]")
    else:
        print(f"  {name}: OK ({len(spd)} rows) [{dt:.2f}s]")
print("RESULT:", "ALL OK" if fails == 0 else f"{fails} FAILURES")
spark.stop()
sys.exit(1 if fails else 0)
