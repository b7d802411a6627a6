"""Dump executed physical plans for the r13 optimization round.

For each named query (default: the bench HEADLINE set) this runs the
query at $SPARK_GRAFT_SF_DIR (default sf0.1, the bench scale), captures
the AQE-final `explain("formatted")` output, and writes it to
``plans/r13/<query>_<tag>.txt`` (tag = argv[1], "before"/"after").
It also times each query with the noop sink (guide §1.4 — computation
only, no collect-to-driver cost) best-of-3 and prints a summary line
per query so plan shape and wall time land in the same artifact.

Usage: python tools/r13_plans.py <tag> [query ...]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE

    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from codegraph_spark.queries import collect
    from codegraph_spark.session import get_spark

    spark = get_spark(app_name=f"r13-plans-{tag}")
    queries, _ = collect()

    # warm store exactly like bench.py so plans/timings match the bench
    from pyspark.sql import functions as F

    from codegraph_spark.graph import PropertyGraph
    from codegraph_spark.queries.traversals import warm_views

    g = PropertyGraph.from_tpch_recast(spark, sf_dir)
    warm_views(spark, sf_dir)
    g.nodes.agg(*[F.count(c) for c in g.nodes.columns]).collect()
    g.edges.agg(*[F.count(c) for c in g.edges.columns]).collect()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    out_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"r13:{tag}:{name}")
        # noop-sink timing, best-of-3 (first run also finalizes AQE)
        runs = []
        df = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} ({tag}) — sf_dir={sf_dir} noop-sink runs={runs} "
                f"best={min(runs)}s\n\n"
            )
            f.write(plan)
        n_exch = plan.count("Exchange") - plan.count("BroadcastExchange") - plan.count("ReusedExchange")
        print(
            f"{name}: best={min(runs)}s runs={runs} "
            f"shuffle-exchanges~{n_exch} "
            f"broadcasts={plan.count('BroadcastExchange')} "
            f"py-nodes={plan.count('EvalPython') + plan.count('MapInPandas') + plan.count('MapInArrow') + plan.count('FlatMapGroupsInPandas')}"
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
