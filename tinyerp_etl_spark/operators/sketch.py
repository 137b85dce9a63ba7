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
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window
from tinyerp_etl_spark.functions.localdf import local_df
from tinyerp_etl_spark.functions.materialize import materialize

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


def kmv_sketches(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV sketch as a bounded array column.

    Output: (*group_cols, kmv_sketch array<long>) — the k smallest
    distinct value hashes per group, ascending. This is the storable
    form of the sketch: at 100 TB you persist one such row per
    (entity, fine-grain-bucket) — e.g. per (event_type, day) — and any
    coarser rollup (weekly, all-time, cross-entity) is answered by
    merging sketches instead of rescanning the raw fact.

    Memory is bounded by construction: the window keeps only rank<=k
    rows per group BEFORE the collect, so no aggregation buffer ever
    holds more than k elements (unlike a naive collect_set of all
    values — the anti-pattern the LSH bucket cap exists for).
    """
    hashed = df.select(
        *[F.col(c) for c in group_cols], value_hash32(value_col).alias("__h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__h")).alias("kmv_sketch")
    )


def kmv_merge_estimate(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "kmv_sketch",
    k: int = 64,
) -> DataFrame:
    """Merge fine-grain KMV sketches to a coarser grouping + estimate.

    Union the hash sets, re-take the k smallest, estimate as
    (k-1)/(kth_min/2^32). KMV's merge is LOSSLESS in the sense that
    the merged sketch equals the sketch built directly on the union:
    a hash among the global k smallest has at most k-1 hashes below it
    anywhere, so it ranks <=k inside its own fine-grain sketch and is
    guaranteed to be present in the input. That identity is what the
    differential oracle checks (the DuckDB side computes the sketch
    straight from the raw fact).

    Output: (*group_cols, n_kept, kth_min_hash, n_estimate) where
    n_kept = min(k, distinct hashes) — below capacity the estimate is
    the exact count, standard KMV behavior.
    """
    ex = sketches.select(
        *[F.col(c) for c in group_cols], F.explode(sketch_col).alias("__h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    ranked = ex.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max(F.when(F.col("__rn") == k, F.col("__h"))).alias("kth_min_hash"),
        )
        .select(
            *group_cols,
            "n_kept",
            "kth_min_hash",
            F.when(
                F.col("kth_min_hash").isNotNull(),
                F.round((k - 1) / (F.col("kth_min_hash") / F.lit(HASH_SPACE)), 2),
            )
            .otherwise(F.col("n_kept").cast("double"))
            .alias("n_estimate"),
        )
    )


def kmv_merge_sketches(
    stored: DataFrame,
    increment: DataFrame,
    group_cols: list[str],
    sketch_col: str = "kmv_sketch",
    k: int = 64,
) -> DataFrame:
    """Incremental sketch-table maintenance: fold an increment's
    sketches into the stored table, output the merged SKETCHES.

    The maintenance twin of kmv_merge_estimate (which outputs
    estimates): union the per-group hash sets, re-take the k smallest,
    keep the array form so the result can be committed back to the
    sketch table (TableStore) and merged again next batch. Because
    KMV merge is associative and idempotent-on-duplicates, maintaining
    the table incrementally batch-by-batch is bit-identical to
    rebuilding it from all raw data — work per batch is proportional
    to the INCREMENT (plus k rows per touched group), never to
    history. Groups present in only one input pass through unchanged.
    """
    unioned = stored.select(*group_cols, sketch_col).unionByName(
        increment.select(*group_cols, sketch_col)
    )
    ex = unioned.select(
        *[F.col(c) for c in group_cols], F.explode(sketch_col).alias("__h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        ex.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("__h")).alias(sketch_col))
    )


def _candidate_count_rows(
    df: DataFrame, value_col: str, min_share: float, cap: int
) -> DataFrame:
    """Per-partition Misra-Gries candidates PLUS one per-partition
    row-count row, produced in a single shuffle-free pass.

    Output schema is (value_col, part_rows): candidate rows carry
    ``part_rows`` NULL; each partition additionally emits exactly one
    row with ``value_col`` NULL and ``part_rows`` = rows seen, so the
    global total folds out of the same pass (no separate ``count()``
    job over the input).

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

    All boundary comparisons run in exact integer arithmetic on the
    rational value of ``min_share``'s DECIMAL reading
    (``Fraction(str(min_share))``, so 0.01 means exactly 1/100 — the
    same semantics as the SQL oracle's ``ceil(0.01 * n)`` in DECIMAL).
    Exact arithmetic here exists for candidate/verify pass consistency:
    both passes must agree on which side of the bar a boundary count
    falls, or a value could be pruned in one pass and demanded by the
    other.
    """
    import pandas as pd

    field = df.schema[value_col]
    out_schema = StructType(
        [
            StructField(value_col, field.dataType),
            StructField("part_rows", LongType()),
        ]
    )
    s_frac = Fraction(str(min_share))
    s_num, s_den = s_frac.numerator, s_frac.denominator

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
                # ...clamped so offset stays strictly below s * rows_seen:
                # (offset + off) * den <= num * n_rows - 1, exactly
                budget = (s_num * n_rows - 1) // s_den - offset
                off = min(off, budget)
                if off > 0:
                    offset += off
                    counts = {k: c - off for k, c in counts.items() if c > off}
        # emit value iff c >= s * n_rows - offset, compared exactly
        cands = [
            k for k, c in counts.items() if (c + offset) * s_den >= s_num * n_rows
        ]
        yield pd.DataFrame(
            {
                value_col: pd.Series(cands + [None], dtype=object),
                "part_rows": pd.Series(
                    [None] * len(cands) + [n_rows], dtype="object"
                ),
            }
        )

    return df.select(value_col).mapInPandas(gen, out_schema)


def heavy_hitter_candidates(
    df: DataFrame, value_col: str, min_share: float, cap: int
) -> DataFrame:
    """Provable superset of the values with global share >= min_share,
    found WITHOUT a shuffle (see ``_candidate_count_rows``)."""
    return (
        _candidate_count_rows(df, value_col, min_share, cap)
        .filter(F.col("part_rows").isNull())
        .select(value_col)
    )


def heavy_hitters(
    df: DataFrame, value_col: str, min_share: float, cap: int | None = None
) -> DataFrame:
    """EXACT frequent values (count >= ceil(min_share * n)) without
    shuffling the full value cardinality — in TWO passes over ``df``.

    Candidate-then-verify, the same shape the engine uses for LSH
    near-dup: phase 1 (``_candidate_count_rows``) finds a provable
    superset with zero shuffle AND folds the global row count into the
    same pass; phase 2 broadcast-semi-joins the (tiny) candidate set
    back onto the input so the exact groupBy shuffles only rows
    carrying candidate values. Against a plain two-phase groupBy at
    100 TB the difference is the shuffle volume: mostly-unique values
    (the long tail) never leave their partition.

    No driver-side collect of candidate values: the candidate/count
    pass is snapshotted via ``materialize`` (O(cap × partitions) rows
    — control-plane sized; the eager pin guarantees its df scan runs
    exactly ONCE even though two broadcast subtrees read it — the
    distinct candidate set and the global row count — each of which
    would otherwise race to evaluate it on a cluster, and RDD-level
    blocks ARE reclaimed by ContextCleaner on GC, unlike
    SQL-CacheManager persists, which leak until unpersist). The exact
    threshold is evaluated in-plan as ``n * den >= num * total``
    (integer form of n >= ceil(num·total/den)) using the DECIMAL
    rational of ``min_share`` (``Fraction(str(min_share))``) — the
    same arithmetic as the candidate pass and the SQL oracle's DECIMAL
    ``ceil``. ``df`` itself is scanned exactly twice per execution.

    Output: (value_col, n) — exact counts, partitioning-invariant.
    """
    cap = cap or max(64, int(math.ceil(8.0 / min_share)))
    cc = materialize(_candidate_count_rows(df, value_col, min_share, cap))
    cands = cc.filter(F.col("part_rows").isNull()).select(value_col).distinct()
    total = cc.agg(F.sum("part_rows").alias("__total"))
    s_frac = Fraction(str(min_share))
    s_num, s_den = s_frac.numerator, s_frac.denominator
    # the comparison runs in decimal(38,0): a float min_share with a
    # long decimal expansion (str(1/3) -> den 10^16) would overflow
    # long multiplication (n * den wraps at n ~ 923) and silently flip
    # the predicate; decimal keeps headroom to ~10^38
    n_dec = F.col("n").cast("decimal(38,0)")
    total_dec = F.col("__total").cast("decimal(38,0)")
    den_dec = F.lit(str(s_den)).cast("decimal(38,0)")
    num_dec = F.lit(str(s_num)).cast("decimal(38,0)")
    return (
        df.join(F.broadcast(cands), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(total))
        .filter(n_dec * den_dec >= num_dec * total_dec)
        .select(value_col, "n")
    )


def exact_rank_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    p10ks: dict[str, int],
    n_buckets: int = 32,
) -> DataFrame:
    """Exact discrete quantiles from a (value, frequency) histogram.

    ``df`` is an already-compacted histogram (one row per distinct
    integral value with its count); the quantile at p is the smallest
    value whose inclusive cumulative count reaches ``ceil(p * N)``.
    All rank arithmetic is integer per-10000 (``p10ks`` maps label ->
    p*10000), so any engine derives identical targets — the IEEE
    lesson from the heavy-hitter threshold (no float p*N).

    The cumulative count is the distributed two-phase prefix sum
    (operators/packing.py), NOT a global-order window, so the exact
    path stays parallel even when the histogram is large. Output: one
    row per label, ``(label, q_value, target_rank)``.

    At 100 TB the sketch (percentile_approx) is the serving path; this
    exact path is the auditor — the gate query pairs them and checks
    the sketch's guaranteed rank-error envelope.
    """
    from tinyerp_etl_spark.operators.packing import distributed_prefix_sum

    hist = distributed_prefix_sum(
        df,
        value_col,
        weight_col,
        out_col="__cum_before",
        n_buckets=n_buckets,
        total_col="__n",
    ).withColumn(
        "__cum_incl", F.col("__cum_before") + F.col(weight_col).cast("long")
    )
    # grand total rides out of the prefix sum as a literal — one cheap
    # first-row probe instead of a second aggregation job over the
    # histogram (NULL on an empty histogram, making targets NULL too)
    total = hist.agg(F.max("__n").alias("__n"))
    spec = local_df(
        df.sparkSession,
        [(label, int(p)) for label, p in p10ks.items()],
        "label string, p10k int",
    )
    # target = ceil(p10k * N / 10000) in pure integer arithmetic
    targets = spec.crossJoin(F.broadcast(total)).select(
        "label",
        F.expr("(p10k * __n + 9999L) div 10000").alias("target_rank"),
    )
    found = (
        hist.crossJoin(F.broadcast(targets))
        .groupBy("label")
        .agg(
            F.min(
                F.when(
                    F.col("__cum_incl") >= F.col("target_rank"), F.col(value_col)
                )
            ).alias("q_value")
        )
    )
    # left join from targets so an empty histogram still yields one
    # row per requested label (NULL q_value/target_rank), never zero
    return targets.join(found, "label", "left").select(
        "label", "q_value", "target_rank"
    )


# ------------------------------------------------------------------ Bloom
#
# Deterministic Bloom filter: the membership sketch the dedup /
# decontamination family was missing. KMV answers "how many distinct";
# the Bloom filter answers "is this key in the reference set" with a
# fixed-size bitmap and a bounded false-positive rate — the standard
# way to decontaminate a 100 TB training corpus against an eval set
# without shuffling the corpus: build the bitmap from the (small) eval
# side once, broadcast it, and probe map-side. Spark's built-in
# bloomFilter lives on the JVM DataFrameStatFunctions and is neither
# reproducible across engines nor reachable from the SQL surface, so
# this one is built from the same portable md5-prefix hash as KMV /
# the LSH family: k positions per key, bitmap as (word_idx, mask)
# longs via bit_or aggregation. Bit-identical in any engine; the
# DuckDB oracle models the same positions as a distinct-position set
# (membership-in-set == all-bits-set, provably the same predicate).

BLOOM_M_BITS = 1 << 16  # bitmap width in bits; at scale size by n*k/ln2
BLOOM_K = 5  # hash functions per key


def bloom_positions(
    key_col, k: int = BLOOM_K, m_bits: int = BLOOM_M_BITS
) -> F.Column:
    """array<long> of the k bit positions for a key.

    Position i = md5(key || '#i') 32-bit prefix mod m_bits — the same
    portable hash family as ``value_hash32``, salted by the hash
    index so the k positions are independent.
    """
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.array(
        *[
            value_hash32(F.concat(c, F.lit(f"#{i}"))) % F.lit(m_bits)
            for i in range(1, k + 1)
        ]
    )


def bloom_build(
    keys: DataFrame, key_col: str, k: int = BLOOM_K, m_bits: int = BLOOM_M_BITS
) -> DataFrame:
    """Build the bitmap: (word_idx, mask) rows, one per 64-bit word.

    At most m_bits/64 rows regardless of input size — the property
    that makes the probe side a broadcast join. bit_or is a
    map-side-combinable aggregate, so building from 100 TB of keys
    shuffles only (word_idx, partial_mask) pairs.
    """
    pos = keys.select(F.explode(bloom_positions(key_col, k, m_bits)).alias("pos"))
    return (
        pos.select(
            F.expr("pos div 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "__m"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(__m)").alias("mask"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """Flag rows whose key tests positive against the bitmap.

    Adds ``bloom_hit`` (1 = all k bits set — member or false
    positive; 0 = definitely not in the reference set). The bitmap
    (at most m_bits/64 rows) is folded into ONE map row and
    broadcast-crossed onto the corpus, so the probe is a pure per-row
    expression: no explode, no shuffle, no re-aggregation of the
    corpus — the plan shape that keeps a 100 TB probe map-side. The
    corpus rides through with all its columns untouched.
    """
    dense = bitmap.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "mask"))
        ).alias("__bloom_map")
    )
    probed = (
        df.join(F.broadcast(dense))
        .withColumn("__bloom_pos", bloom_positions(key_col, k, m_bits))
        .withColumn(
            "bloom_hit",
            F.expr(
                "CAST(forall(__bloom_pos, p ->"
                " (coalesce(__bloom_map[p div 64], CAST(0 AS BIGINT))"
                "  & shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))) != 0"
                ") AS INT)"
            ),
        )
    )
    return probed.drop("__bloom_map", "__bloom_pos")


def bloom_merge(bitmap_a: DataFrame, bitmap_b: DataFrame) -> DataFrame:
    """Union two Bloom bitmaps: word-wise bit_or.

    This is the incremental-maintenance story for the membership
    sketch: fold a new batch's bitmap into the stored one without
    touching the old keys (work ∝ bitmap size, a constant). Because
    bit_or is idempotent and commutative, an at-least-once replay of
    the same batch is a no-op — merge(b, b) == b bit-for-bit — so the
    fold needs no dedup bookkeeping, unlike the postings-index path.
    """
    a = bitmap_a.select("word_idx", F.col("mask").alias("__a"))
    b = bitmap_b.select("word_idx", F.col("mask").alias("__b"))
    return a.join(b, "word_idx", "full_outer").select(
        "word_idx",
        F.expr(
            "coalesce(__a, CAST(0 AS BIGINT))"
            " | coalesce(__b, CAST(0 AS BIGINT))"
        ).alias("mask"),
    )
