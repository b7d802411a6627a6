"""Serving-cache invalidate-on-write audit (r6 VERDICT item 7).

serving.py's staleness contract says "every write path that rewrites a
dataset dir in-session must call invalidate(dir)". This test makes the
promise mechanical: (1) enumerate every overwrite-capable writer call
site under codegraph_spark by grepping the source, and assert each
enclosing module calls serving.invalidate; (2) exercise one live
rewrite-then-reread and assert no stale results are served.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "codegraph_spark")

#: writer sites that do NOT rewrite a filesystem dataset dir and are
#: therefore exempt (each with the reason pinned here so a reviewer
#: sees the judgment, not a silent hole):
EXEMPT = {
    # saveAsTable writes warehouse TABLES (name-addressed, not a
    # dataset dir a serving key can point at)
    ("graph.py", "saveAsTable"),
    # the memory-sink streaming drain creates a fresh uuid-named view
    # per call — nothing can have cached over it
    ("streaming/incremental.py", 'format("memory")'),
}


def _writer_sites():
    """(relpath, lineno, line) for every persistent-write call site."""
    sites = []
    pat = re.compile(r"\.write\.|writeStream|\.save\(")
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            with open(path) as f:
                text = f.read()
            for i, line in enumerate(text.splitlines(), 1):
                if pat.search(line) and not line.strip().startswith("#"):
                    sites.append((rel, i, line.strip(), text))
    return sites


def test_every_writer_module_calls_invalidate():
    sites = _writer_sites()
    assert sites, "grep found no writer sites — the audit pattern broke"
    missing = []
    for rel, lineno, line, text in sites:
        if any(rel == e_rel and marker in line for e_rel, marker in EXEMPT):
            continue
        if "writeStream" in line and "foreachBatch" not in text[: text.find(line)]:
            # plain writeStream starts are drains into fresh memory
            # sinks (uuid-named); the foreachBatch upsert path is the
            # one that rewrites a dir and is checked below
            if 'format("memory")' in text:
                continue
        if "serving.invalidate" not in text:
            missing.append(f"{rel}:{lineno}: {line}")
    assert not missing, (
        "writer call sites without a serving.invalidate in the module "
        "(add the call after the write, or an EXEMPT entry with a "
        "reason):\n" + "\n".join(missing)
    )


def test_rewrite_then_reread_serves_fresh_results(spark, tmp_path):
    """Live exercise: cache a build over a dir through serving,
    rewrite the dir via a production writer, and assert the next read
    reflects the rewrite (the writer's invalidate dropped the entry)."""
    from codegraph_spark import serving
    from codegraph_spark.operators.inverted_index import write_index

    d = str(tmp_path / "postings")
    idx_v1 = spark.createDataFrame([(1, "abc"), (2, "abd")], "doc_id long, gram string")
    write_index(idx_v1, d)

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(d)

    key = (d, "postings-audit")
    first = serving.shared_df(spark, key, build)
    assert first.count() == 2 and calls["n"] == 1
    # cache hit, no rebuild
    assert serving.shared_df(spark, key, build).count() == 2 and calls["n"] == 1

    idx_v2 = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "xyz")], "doc_id long, gram string"
    )
    write_index(idx_v2, d)  # production writer — must invalidate(d)
    fresh = serving.shared_df(spark, key, build)
    assert calls["n"] == 2, "rewrite did not drop the serving entry (stale cache)"
    assert fresh.count() == 3


def test_invalidate_returns_dropped_count(spark, tmp_path):
    from codegraph_spark import serving

    d = str(tmp_path / "ds")
    os.makedirs(d, exist_ok=True)
    spark.range(3).write.mode("overwrite").parquet(os.path.join(d, "t.parquet"))
    serving.shared_df(spark, (d, "a"), lambda: spark.read.parquet(os.path.join(d, "t.parquet")))
    serving.shared_df(spark, (d, "b"), lambda: spark.range(5))
    assert serving.invalidate(d) == 2
    assert serving.invalidate(d) == 0
