"""Single-scan data profiling: per-column null/distinct/min/max stats.

The reference's only data-quality surface is COUNT(*) per table
(ref tiny_api_v2_cliente.py:396-402, the per-entity audit prints); a
warehouse serving dashboards wants the per-column version: how many
nulls, how many distinct values, value ranges. The naive implementation
is one aggregation per column (N scans of a 100 TB table) or one agg
with N count(DISTINCT col) expressions (Catalyst plans mixed distinct
aggregates with an Expand that multiplies the scan N-fold before the
shuffle). This operator does neither:

1. ONE projection stacks every profiled column into
   (col_name, v_str, v_num) rows via inline(array(struct(...))) —
   no shuffle, no UDF; rows grow by the column count but stay
   map-local and compress (the values were already being read).
2. groupBy(col_name, v_str) pre-collapses to distinct values with
   counts — map-side combinable, so the shuffle carries one row per
   (column, distinct value), not per input row.
3. groupBy(col_name) folds the pairs into the profile — same
   pair-collapse idiom as q21 (plans/tpch_extra.py), zero Expand.

Values travel in CANONICAL form so the differential oracle is exact
in both engines: numerics as integer longs (cents for decimals, epoch
seconds for timestamps), strings as-is; v_str (the long rendered as a
string for numerics) feeds null/distinct counting, v_num keeps
numeric min/max numeric instead of lexicographic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    numeric_cols: dict[str, Column],
    string_cols: list[str],
) -> DataFrame:
    """Profile the given columns in one scan.

    numeric_cols maps output name -> a LONG-typed canonical expression
    (already exact: cents / epoch / raw integer). string_cols are
    taken as-is.

    Output, one row per profiled column, ordered by name:
    (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
     min_str, max_str) — min/max_num are NULL for string columns and
    vice versa.
    """
    if not numeric_cols and not string_cols:
        raise ValueError("profile_columns needs at least one column")
    entries = []
    for name, expr in numeric_cols.items():
        entries.append(
            F.struct(
                F.lit(name).alias("col_name"),
                expr.cast("string").alias("v_str"),
                expr.cast("long").alias("v_num"),
            )
        )
    for name in string_cols:
        entries.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.col(name).cast("string").alias("v_str"),
                F.lit(None).cast("long").alias("v_num"),
            )
        )
    stacked = df.select(F.inline(F.array(*entries)))
    pairs = stacked.groupBy("col_name", "v_str").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("v_num").alias("v_num")
    )
    return (
        pairs.groupBy("col_name")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.sum(F.when(F.col("v_str").isNull(), F.col("cnt")).otherwise(F.lit(0))).alias(
                "n_nulls"
            ),
            F.count(F.when(F.col("v_str").isNotNull(), F.lit(1))).alias("n_distinct"),
            F.min("v_num").alias("min_num"),
            F.max("v_num").alias("max_num"),
            F.min(F.when(F.col("v_num").isNull(), F.col("v_str"))).alias("min_str"),
            F.max(F.when(F.col("v_num").isNull(), F.col("v_str"))).alias("max_str"),
        )
        .orderBy("col_name")
    )
