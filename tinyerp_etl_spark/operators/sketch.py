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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType
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


def heavy_hitter_candidates(
    df: DataFrame, value_col: str, min_share: float, cap: int
) -> DataFrame:
    """Per-partition Misra-Gries candidates for values with global
    share >= ``min_share`` — a superset, produced WITHOUT a shuffle.

    By the weighted pigeonhole, a value with global share >= s must
    have local share >= s in at least one partition, so emitting each
    partition's locally-frequent values can never miss a true heavy
    hitter. The summary is a Misra-Gries table capped at ``cap``
    counters; it tracks the exact total mass it has decremented
    (``offset``) and only ever decrements while ``offset`` stays below
    ``s * rows_seen`` — that invariant is what makes the emission bar
    ``s * n_p - offset`` provably positive, so an evicted value
    provably had local share < s. Memory is O(cap) except on
    adversarially flat partitions, where the table grows rather than
    give up the no-false-negative guarantee.
    """
    import pandas as pd

    field = df.schema[value_col]
    out_schema = StructType([StructField(value_col, field.dataType)])

    def gen(batches):
        counts: dict = {}
        offset = 0
        n_rows = 0
        for pdf in batches:
            for v, c in pdf[value_col].value_counts(dropna=True).items():
                counts[v] = counts.get(v, 0) + int(c)
            n_rows += len(pdf)
            if len(counts) > cap:
                # largest decrement that keeps the summary under cap
                vals = sorted(counts.values())
                off = vals[len(counts) - cap - 1]
                # ...clamped so offset never reaches s * rows_seen
                budget = int(min_share * n_rows - offset) - 1
                off = min(off, budget)
                if off > 0:
                    offset += off
                    counts = {k: c - off for k, c in counts.items() if c > off}
        bar = min_share * n_rows - offset
        cands = [k for k, c in counts.items() if c >= bar]
        yield pd.DataFrame({value_col: pd.Series(cands, dtype=object)})

    return df.select(value_col).mapInPandas(gen, out_schema)


def heavy_hitters(
    df: DataFrame, value_col: str, min_share: float, cap: int | None = None
) -> DataFrame:
    """EXACT frequent values (count >= ceil(min_share * n)) without
    shuffling the full value cardinality.

    Candidate-then-verify, the same shape the engine uses for LSH
    near-dup: phase 1 (``heavy_hitter_candidates``) finds a provable
    superset with zero shuffle; phase 2 broadcast-semi-joins the
    (tiny) candidate set back onto the input so the exact groupBy
    shuffles only rows carrying candidate values. Against a plain
    two-phase groupBy at 100 TB the difference is the shuffle volume:
    mostly-unique values (the long tail) never leave their partition.

    Output: (value_col, n) — exact counts, partitioning-invariant.
    Callers iterating over the same ``df`` three times (count,
    candidates, verify) should persist it first.
    """
    cap = cap or max(64, int(math.ceil(8.0 / min_share)))
    threshold = math.ceil(min_share * df.count())
    cands = heavy_hitter_candidates(df, value_col, min_share, cap).distinct()
    return (
        df.join(F.broadcast(cands), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(threshold))
    )
