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

Broadcast-driven nested-loop joins and final presentation sorts are
deliberately NOT flagged: both are bounded (dim-sized / result-sized)
and ubiquitous in correct plans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: A physical Window line carries bracket groups
#: ``Window [exprs], [partition], [order]`` when partitioned and only
#: ``Window [exprs], [order]`` when the spec has no partition key.
_WINDOW_LINE = re.compile(r"\bWindow\s+\[")


def plan_findings(df: DataFrame) -> list[str]:
    """Walk the executed plan and return a list of findings (empty =
    scale-safe by these checks)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    findings: list[str] = []
    for line in plan.splitlines():
        if _WINDOW_LINE.search(line) and line.count("], [") < 2:
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
    return findings


def assert_scalable_plan(df: DataFrame) -> None:
    """Raise ``ValueError`` listing every anti-pattern in the plan."""
    findings = plan_findings(df)
    if findings:
        raise ValueError(
            "plan contains scale anti-patterns:\n  - " + "\n  - ".join(findings)
        )
