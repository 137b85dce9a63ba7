"""Skew-mitigation aggregation patterns.

A 100 TB fact table with a handful of hot keys (the reference's
``pedidos`` by status, ours: 100k events over 5 event types) turns a
plain groupBy into a few straggler reducers. Two mitigations, both
producing results identical to the naive plan (so they sit under the
DuckDB oracle gate):

- **salted_sum**: spread each key over ``n_salts`` sub-keys derived
  from the row content (deterministic — safe under task retries, unlike
  rand()), partially aggregate on (key, salt), then finish on key.
  Spark's map-side combine already handles plain SUM/COUNT skew; the
  salted shape matters when per-key state is big (collect-like aggs,
  high-cardinality maps) or when AQE skew handling is unavailable.
- **two_phase_distinct**: COUNT(DISTINCT x) per hot key — shuffle on
  the (key, x) composite first (spreads the hot key across reducers),
  dedupe, then count per key. This is what Catalyst's distinct-agg
  expansion does internally, made explicit and composable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value: Column,
    value_alias: str,
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage SUM + COUNT per key, salted on deterministic row hash.

    Returns (keys..., value_alias, n_rows) — bit-identical to the
    plain ``groupBy(keys).agg(sum, count)``.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(value).alias("__psum"),
            F.count(F.lit(1)).alias("__pcnt"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias(value_alias),
        F.sum("__pcnt").alias("n_rows"),
    )


def two_phase_distinct(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per key, skew-spread.

    Phase 1 shuffles on the (key, value) composite — a hot key's rows
    land on many reducers instead of one; phase 2 counts the deduped
    composites per key.
    """
    deduped = df.select(*keys, distinct_col).distinct()
    return deduped.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))
