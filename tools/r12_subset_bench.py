"""Subset bench with bench.py's exact methodology (warm ingest +
best-of-5 collect per query) for fast before/after comparisons during
the r12 optimization round. Also prints the JVM calibration probe so a
before/after pair can be read against host drift.

Usage: python tools/r12_subset_bench.py <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from codegraph_spark.graph import PropertyGraph
    from codegraph_spark.queries import collect
    from codegraph_spark.queries.traversals import warm_views
    from codegraph_spark.session import get_spark

    spark = get_spark(app_name="r12-subset-bench")
    queries, _ = collect()

    g = PropertyGraph.from_tpch_recast(spark, sf_dir)
    warm_views(spark, sf_dir)
    g.nodes.agg(*[F.count(c) for c in g.nodes.columns]).collect()
    g.edges.agg(*[F.count(c) for c in g.edges.columns]).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    calib = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        li.agg(F.sum("l_quantity"), F.count("l_orderkey")).collect()
        calib = min(calib, time.perf_counter() - t0)
    print(f"calib_sec={round(calib, 4)}")

    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"r12-subset:{name}")
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: best={min(runs)} runs={runs}")
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
