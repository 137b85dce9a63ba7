"""Temporal join operators Spark lacks natively: as-of join, range join.

Both are implemented as compositions of existing DataFrame ops (the
SURVEY's custom-operator policy: composition first, Pandas UDF only
when semantics demand it):

- **as-of join** — "for each probe row, the most recent reference row
  at or before its timestamp" — via the union-and-carry trick: tag
  both sides, union, ONE window sorted by (ts, tag) per key, and
  carry the last reference attributes forward with
  last(..., ignorenulls). One shuffle on the key, no range
  predicate, no join explosion — the scalable shape (a naive
  join + filter + argmax would shuffle the cross product of every
  probe with every earlier reference row).
- **range join** — "pairs within a bounded time window" — via bucket
  prejoin: quantize ts to window-sized buckets, equi-join on
  (key, bucket) and (key, bucket+1), then apply the exact range
  filter. Candidates are bounded by bucket co-residency, so the join
  stays an equi-join Catalyst can plan (vs an O(n²) theta-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    reference: DataFrame,
    key: str,
    probe_ts: str = "ts",
    ref_ts: str = "ts",
    ref_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: probe rows + the latest reference row ≤ ts.

    ``reference`` must be unique per (key, ref_ts) — dedupe upstream —
    or the carried row at a tied timestamp is undefined.
    Returns all probe columns plus ``asof_<col>`` for each ref_col and
    ``asof_ts``; probes with no prior reference carry NULLs.
    """
    ref_cols = ref_cols or []
    tagged_ref = reference.select(
        F.col(key),
        F.col(ref_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(ref_ts).alias("__ref_ts"),
        *[F.col(c).alias(f"__ref_{c}") for c in ref_cols],
        *[
            F.lit(None).cast(probe.schema[c].dataType).alias(f"__probe_{c}")
            for c in probe.columns
        ],
    )
    tagged_probe = probe.select(
        F.col(key),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(reference.schema[ref_ts].dataType).alias("__ref_ts"),
        *[
            F.lit(None).cast(reference.schema[c].dataType).alias(f"__ref_{c}")
            for c in ref_cols
        ],
        *[F.col(c).alias(f"__probe_{c}") for c in probe.columns],
    )
    unioned = tagged_ref.unionByName(tagged_probe)
    # reference rows sort before probes at equal ts (tag 0 < 1): an
    # exactly-simultaneous reference row IS visible to the probe
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last("__ref_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__ref_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in ref_cols
        ],
    )
    return carried.filter(F.col("__tag") == 1).select(
        *[F.col(f"__probe_{c}").alias(c) for c in probe.columns],
        "asof_ts",
        *[F.col(f"asof_{c}") for c in ref_cols],
    )


def range_join_pair_counts(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_seconds: int = 300,
) -> DataFrame:
    """Per-key count of ordered pairs within ``window_seconds``.

    Pairs (a, b) with a.ts < b.ts ≤ a.ts + window. The bucket prejoin
    keeps it an equi-join: b can only live in a's bucket or the next
    one.
    """
    bucket = (F.unix_timestamp(F.col(ts_col)) / window_seconds).cast("long")
    base = df.select(
        F.col(key),
        F.col(id_col).alias("__id"),
        F.unix_timestamp(F.col(ts_col)).alias("__sec"),
        bucket.alias("__bucket"),
    )
    left = base.select(
        F.col(key),
        F.col("__id").alias("id_a"),
        F.col("__sec").alias("sec_a"),
        F.explode(
            F.array(F.col("__bucket"), F.col("__bucket") + 1)
        ).alias("__bucket"),
    )
    right = base.select(
        F.col(key),
        F.col("__id").alias("id_b"),
        F.col("__sec").alias("sec_b"),
        "__bucket",
    )
    return (
        left.join(right, [key, "__bucket"])
        .filter(
            (F.col("sec_a") < F.col("sec_b"))
            & (F.col("sec_b") <= F.col("sec_a") + window_seconds)
        )
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
