"""Deterministic cardinality sketch: K-Minimum-Values (KMV).

The engine's sketch family representative. Spark ships HyperLogLog
(approx_count_distinct), but HLL registers aren't reproducible across
engines, so it can't sit under the differential gate. KMV can: hash
every value with the portable md5-prefix hash, keep the k smallest
hashes per group, and estimate distinct count as (k-1) / (kth_min /
2^32). Everything is integer/order arithmetic — bit-identical in any
engine — and the sketch itself (the k minimal hashes) is mergeable:
union two groups' sketches, re-take the k smallest. At 100 TB the
k-smallest-per-group is a partial-aggregable top-k (each partition
keeps its own k smallest before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_SPACE = float(2**32)


def value_hash32(col) -> F.Column:
    """Portable 32-bit value hash (md5 prefix — mirrored in DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def kmv_distinct_estimate(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct estimate + exact count for comparison.

    Output: (group, n_exact, kth_min_hash, n_estimate). Groups with
    fewer than k distinct values report the exact count (the sketch is
    exact below its capacity — standard KMV behavior).
    """
    hashed = df.select(
        F.col(group_col), value_hash32(value_col).alias("__h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("__h")
    ranked = hashed.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("kth_min_hash"),
        )
        .select(
            group_col,
            "n_exact",
            "kth_min_hash",
            F.when(
                F.col("kth_min_hash").isNotNull(),
                F.round((k - 1) / (F.col("kth_min_hash") / F.lit(HASH_SPACE)), 2),
            )
            .otherwise(F.col("n_exact").cast("double"))
            .alias("n_estimate"),
        )
    )
