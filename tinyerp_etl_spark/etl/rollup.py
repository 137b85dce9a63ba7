"""Incrementally-maintained additive rollups (materialized aggregates).

The reference loads its schema "para posterior análise e criação de
dashboards" (ref README.md:3) — at 100 TB a dashboard aggregate cannot
be recomputed from the whole fact table on every incremental load.
Additive aggregates (COUNT/SUM, with AVG derived) are mergeable: fold
only the increment into partial state, then merge states by key — work
proportional to the increment, not the table. Partial sums are exact
integer cents in decimal(38,0) accumulators (functions/exact.py), so
maintenance is associative and the invariant *incremental ≡ full
recompute* holds bit-exactly under any split of the input — pinned by
tests/test_rollup.py.

Not idempotent by design: replaying an increment double-counts. The
pipeline owes the rollup exactly-once increments, which the MERGE
layer's keyed dedupe provides (etl/merge.py) — same contract as the
reference's watermark + upsert pair.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tinyerp_etl_spark.functions.exact import cents, sum_exact


def rollup_increment(
    increment: DataFrame,
    keys: Sequence[str],
    measure: str,
    scale: int = 2,
) -> DataFrame:
    """Partial rollup state for one increment: (keys, n_rows, sum_cents)."""
    return increment.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        sum_exact(cents(measure, scale)).alias("sum_cents"),
    )


def merge_rollup(
    current: DataFrame | None,
    partial: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Merge partial states by key (the additive ⊕)."""
    if current is None:
        return partial
    return (
        current.unionByName(partial)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_cents").cast("decimal(38,0)").alias("sum_cents"),
        )
    )


def rollup_view(state: DataFrame, scale: int = 2) -> DataFrame:
    """Presentation view over the state: exact SUM and AVG as doubles."""
    denom = float(10**scale)
    return state.select(
        *[c for c in state.columns if c not in ("n_rows", "sum_cents")],
        "n_rows",
        (F.col("sum_cents") / F.lit(denom)).cast("double").alias("sum_value"),
        (F.col("sum_cents") / (F.lit(denom) * F.col("n_rows")))
        .cast("double")
        .alias("avg_value"),
    )
