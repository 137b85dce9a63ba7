"""Plan linter: flag physical-plan shapes that die at 100 TB.

The repo's plan-shape tests pin these properties query by query; this
module makes the same checks available as a runtime guard, so a
pipeline can assert its plan is scale-safe BEFORE launching a
multi-hour cluster job (a cheap `explain` walk, no execution):

- **unpartitioned window** — ``Window.orderBy`` without a
  ``partitionBy`` funnels the whole input through ONE task (the
  exact anti-pattern the day-spine rewrite and distributed prefix
  sum exist to avoid);
- **cartesian product** — a join that degenerated to CartesianProduct
  is O(n*m) row pairs across the cluster;
- **row-at-a-time Python UDF** — ``BatchEvalPython`` serializes row
  by row (10-100x slower than Arrow); the engine's policy is
  Arrow-only (``ArrowEvalPython`` / ``MapInPandas`` etc. pass).
- **SQL-cache scan** — ``InMemoryTableScan`` means the plan reads a
  ``DataFrame.persist()``/``cache()`` entry. Those live in the SQL
  CacheManager, which ContextCleaner never reclaims: an operator that
  pins and hands back a lazy plan leaks the cache for the application
  lifetime, and min-of-N timings silently read the leak via
  cached-plan substitution (both bitten in round 9). The engine's
  sanctioned pin is ``functions/materialize.py`` (RDD-level snapshot,
  GC-reclaimed, durability-routable) or a persist that is explicitly
  unpersisted before the plan is returned.

Broadcast-driven nested-loop joins and final presentation sorts are
deliberately NOT flagged: both are bounded (dim-sized / result-sized)
and ubiquitous in correct plans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: A physical Window line carries bracket groups
#: ``Window [exprs], [partition], [order]`` when fully specified,
#: ``Window [exprs], [partition]`` for partition-only specs (safe),
#: and ``Window [exprs], [order]`` when the spec has NO partition key
#: — the dangerous one. With two groups the cases are distinguished by
#: sort markers (ASC/DESC) in the trailing group.
#: Matches plain WindowExec AND its pandas-UDF siblings
#: (ArrowWindowPython in Spark 4, WindowInPandas in Spark 3) — a
#: pandas-UDF window funnels through one task just the same when
#: unpartitioned.
_WINDOW_LINE = re.compile(r"\b(?:Window|WindowInPandas|ArrowWindowPython)\s+\[")
#: Final bracket group, tolerating a trailing scalar (ArrowWindowPython
#: appends a batch-size number after the order group).
_TRAILING_GROUP = re.compile(r"\],\s*\[([^\[\]]*)\](?:,\s*[\w$]+)?\s*$")


def plan_findings(df: DataFrame) -> list[str]:
    """Walk the executed plan and return a list of findings (empty =
    scale-safe by these checks)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    findings: list[str] = []
    for line in plan.splitlines():
        if not _WINDOW_LINE.search(line):
            continue
        if line.count("], [") >= 2:
            continue  # [exprs], [partition], [order] — partitioned
        tail = _TRAILING_GROUP.search(line.rstrip())
        if tail and (" ASC" in tail.group(1) or " DESC" in tail.group(1)):
            findings.append(
                "unpartitioned window (single-task WindowExec): "
                + line.strip()[:120]
            )
    if "CartesianProduct" in plan:
        findings.append("cartesian product join")
    if "BatchEvalPython" in plan:
        findings.append(
            "row-at-a-time Python UDF (BatchEvalPython) — use a pandas_udf"
        )
    if "InMemoryTableScan" in plan:
        findings.append(
            "SQL-cache scan (InMemoryTableScan): a persist()/cache() pin "
            "leaks in the CacheManager unless explicitly unpersisted — "
            "pin via functions/materialize.py instead"
        )
    return findings


def assert_scalable_plan(df: DataFrame) -> None:
    """Raise ``ValueError`` listing every anti-pattern in the plan."""
    findings = plan_findings(df)
    if findings:
        raise ValueError(
            "plan contains scale anti-patterns:\n  - " + "\n  - ".join(findings)
        )
