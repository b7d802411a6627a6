"""Per-query isolation for the r13 optimization round (guide §1):

For each named query, reports — with the bench's warm-store setup —
  - construct: time for ``fn(spark, sf_dir)`` alone (plan building,
    py4j round trips, any in-function jobs),
  - collect: bench-methodology full materialization, best-of-5,
  - noop: noop-sink execution of the prebuilt frame, best-of-5
    (guide §1.4 — computation only, no collect-to-driver),
  - jobs: Spark jobs one invocation schedules (statusTracker — the
    noise-free structural metric),
plus the JVM calibration probe so runs are comparable across host
drift.

Usage: python tools/r13_isolate.py <query> [query ...]
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

    spark = get_spark(app_name="r13-isolate")
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

    st = spark.sparkContext.statusTracker()
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        # warm pass (plan/codegen ramp) + job count via job-id delta
        spark.sparkContext.setJobDescription(f"r13:{name}")
        ids0 = set(st.getJobIdsForGroup(None) or [])
        fn(spark, sf_dir).collect()
        ids1 = set(st.getJobIdsForGroup(None) or [])
        n_jobs = len(ids1 - ids0)

        construct, coll, noop = [], [], []
        for _ in range(5):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            construct.append(round(t1 - t0, 3))
            coll.append(round(t2 - t1, 3))
        for _ in range(5):
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noop.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: jobs={n_jobs} construct_best={min(construct)} "
            f"collect_best={min(coll)} total_best={min(c + e for c, e in zip(construct, coll))} "
            f"noop_best={min(noop)}\n"
            f"    construct={construct} collect={coll} noop={noop}"
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
