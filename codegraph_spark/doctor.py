"""Plan doctor — static scale-smell linting of a DataFrame's physical
plan.

The same heuristics tests/test_plan_quality.py enforces on the
registered queries, packaged for ad-hoc use on ANY DataFrame (CLI:
``python -m codegraph_spark doctor <query-name>``): a user extending
the engine gets the 100 TB review checklist as a tool, not a code
review. Checks are string-level over ``explain('formatted')`` output —
the same surface a human plan review reads.

BLIND SPOT — helper-job plans: the doctor (and the per-query gate
built on it) sees only the plan of the DataFrame it is handed. Work a
query function runs in SEPARATE jobs on the side — fixture builders,
``collect()``-ed bound/percentile probes, convergence checks inside
iterative loops — never appears in that plan and therefore escapes the
gate. Those helper jobs need the same review by hand: r9's one
corpus-sized unpartitioned window lived in exactly such a helper
(``streaming/incremental.prepare_reordered_events``'s ntile fixture
split, since replaced by approx-percentile ts-range slicing). When a
query function launches side jobs, run ``diagnose`` on each side
DataFrame too, or keep the side job to bounded aggregates.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    severity: str  # "error" | "warn" | "info"
    check: str
    detail: str

    def __str__(self) -> str:  # pragma: no cover - formatting
        return f"[{self.severity}] {self.check}: {self.detail}"


def plan_text(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def unpartitioned_windows(plan: str) -> list[str]:
    """Arguments strings of Window nodes with NO partition spec, from
    ``explain('formatted')`` text. A Window's Arguments line carries
    ``[windowExprs], [partitionSpec], [orderSpec]`` — the partitioned
    form has three top-level bracket lists, the global form only two
    (``[windowExprs], [orderSpec]``). Counting top-level lists is
    robust to nested brackets inside windowspecdefinition, and unlike
    grepping for ``Exchange SinglePartition`` it also catches a global
    window whose input happened to be single-partition already (reused
    exchange, 1-partition scan)."""
    found: list[str] = []
    # exactly `Window` — WindowGroupLimit/WindowInPandas have different
    # Arguments shapes (and a WGL always accompanies a Window node that
    # this check sees anyway)
    for m in re.finditer(
        r"^\(\d+\) Window\s*\n(?:.*\n)*?Arguments: (.*)$",
        plan, re.MULTILINE,
    ):
        args = m.group(1)
        # split the top-level bracket lists
        lists: list[str] = []
        depth = 0
        start = -1
        for i, ch in enumerate(args):
            if ch in "[(":
                if ch == "[" and depth == 0:
                    start = i
                depth += 1
            elif ch in "])":
                depth -= 1
                if ch == "]" and depth == 0 and start >= 0:
                    lists.append(args[start + 1:i])
                    start = -1
        if len(lists) >= 3:
            # [exprs], [partitionSpec], [orderSpec] — global iff the
            # partition list is empty
            if not lists[1].strip():
                found.append(args)
        elif len(lists) == 2:
            # the second list is EITHER a partition spec (bare exprs —
            # partition-only window, fine) or an order spec (`x ASC
            # NULLS FIRST` entries — ordered UNpartitioned window)
            if re.search(r"\b(ASC|DESC) NULLS", lists[1]):
                found.append(args)
    return found


def diagnose(df: DataFrame, *, unkeyed_join_ok: bool = False) -> list[Finding]:
    """Lint a DataFrame's physical plan for scale smells. Returns
    findings ordered errors-first; empty list = clean."""
    plan = plan_text(df)
    out: list[Finding] = []

    if "CartesianProduct" in plan:
        out.append(Finding(
            "error", "cartesian-product",
            "plan contains CartesianProduct — an unkeyed join with no "
            "broadcastable side; O(n*m) at any scale",
        ))
    if not unkeyed_join_ok and "BroadcastNestedLoopJoin" in plan:
        out.append(Finding(
            "warn", "unkeyed-broadcast-join",
            "BroadcastNestedLoopJoin present — fine against a 1-row/k-row "
            "aggregate, a scale bug if the broadcast side grows with data",
        ))
    if "BatchEvalPython" in plan:
        out.append(Finding(
            "error", "row-python-udf",
            "row-at-a-time Python UDF in the plan — 10-100x slower than "
            "Arrow; use built-in functions or a Pandas UDF",
        ))

    # global windows/sorts funnel through one task; the reliable tell
    # in a formatted plan is the SinglePartition exchange feeding them
    # `explain("formatted")` spells it `Arguments: SinglePartition, ...`
    if "SinglePartition" in plan:
        out.append(Finding(
            "warn", "single-partition-exchange",
            "Exchange SinglePartition — a global window/sort/limit is "
            "funneling all rows through one task; acceptable only on "
            "already-tiny intermediates",
        ))

    # an UNPARTITIONED WindowExec is the single worst scale shape: the
    # whole input sorts through ONE task (Spark itself warns `WindowExec:
    # No Partition Defined`). Legitimate only over histogram-bounded
    # intermediates (distinct-key offset cumsums, per-step funnels) —
    # over a corpus-sized input it is a driver-killer, and the fix is
    # operators/ranks.distributed_row_number or a histogram reduction.
    for args in unpartitioned_windows(plan):
        out.append(Finding(
            "error", "global-window",
            "unpartitioned Window (no PARTITION BY) — all rows through "
            f"one task; OK only on histogram-sized inputs [{args[:120]}]",
        ))

    # scans that read every column
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        ncols = m.group(1).count(",") + 1 if m.group(1) else 0
        if ncols >= 12:
            out.append(Finding(
                "warn", "wide-scan",
                f"a parquet scan reads {ncols} columns — check column "
                f"pruning (project only what downstream needs)",
            ))
            break

    n_shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
    if n_shuffles >= 8:
        out.append(Finding(
            "info", "many-shuffles",
            f"{n_shuffles} hash-partition exchanges — look for reusable "
            f"partitioning (bucketing / repartition once, reuse across ops)",
        ))

    order = {"error": 0, "warn": 1, "info": 2}
    out.sort(key=lambda f: order[f.severity])
    return out


def doctor_report(df: DataFrame, **kw) -> str:
    findings = diagnose(df, **kw)
    if not findings:
        return "plan: clean (no scale smells found)"
    return "\n".join(str(f) for f in findings)
