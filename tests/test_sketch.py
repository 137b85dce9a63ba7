"""Heavy-hitters (candidate-prune + exact verify) unit tests.

The oracle query exercises the operator end-to-end at corpus scale;
these tests pin the properties the differential gate can't see: the
no-false-negative guarantee under aggressive Misra-Gries pruning, and
partitioning invariance of the exact result.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tinyerp_etl_spark.operators.sketch import heavy_hitter_candidates, heavy_hitters


def _skewed_df(spark, n_parts):
    # 3 heavy values (shares ~.30/.20/.10) + a 4000-value long tail
    rows = (
        [("hot",)] * 3000
        + [("warm",)] * 2000
        + [("mild",)] * 1000
        + [(f"tail{i}",) for i in range(4000)]
    )
    return spark.createDataFrame(rows, "v string").repartition(n_parts)


def _exact(df, min_share):
    thresh = math.ceil(min_share * df.count())
    return {
        (r["v"], r["n"])
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= thresh)
        .collect()
    }


def test_heavy_hitters_match_plain_groupby(spark):
    df = _skewed_df(spark, 8)
    got = {(r["v"], r["n"]) for r in heavy_hitters(df, "v", 0.05).collect()}
    assert got == _exact(df, 0.05)
    assert got == {("hot", 3000), ("warm", 2000), ("mild", 1000)}


def test_heavy_hitters_partitioning_invariant(spark):
    for parts in (1, 13):
        df = _skewed_df(spark, parts)
        got = {(r["v"], r["n"]) for r in heavy_hitters(df, "v", 0.08).collect()}
        assert got == {("hot", 3000), ("warm", 2000), ("mild", 1000)}


def test_candidates_superset_under_tiny_cap(spark):
    # cap far below the tail cardinality forces constant MG pruning;
    # the candidate set must still contain every true heavy hitter
    df = _skewed_df(spark, 4)
    cands = {
        r["v"] for r in heavy_hitter_candidates(df, "v", 0.05, cap=16).collect()
    }
    assert {"hot", "warm", "mild"} <= cands
    # and pruning must actually prune: candidates stay near cap-sized,
    # nowhere near the 4003 distinct values
    assert len(cands) <= 16 * 4


def test_heavy_hitters_exact_under_tiny_cap(spark):
    df = _skewed_df(spark, 4)
    got = {
        (r["v"], r["n"]) for r in heavy_hitters(df, "v", 0.05, cap=16).collect()
    }
    assert got == {("hot", 3000), ("warm", 2000), ("mild", 1000)}


def test_approx_percentile_rank_error_bound(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna sketch) must land within the
    documented rank error: with accuracy a, the returned value's rank
    is within n/a of the target rank — the mergeable-quantile-sketch
    contract that replaces exact sorts at 100 TB."""
    from tinyerp_etl_spark.sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    vals = sorted(r[0] for r in orders.select("o_totalprice").collect())
    n = len(vals)
    accuracy = 100
    for q in (0.1, 0.5, 0.9):
        got = orders.agg(
            F.percentile_approx("o_totalprice", q, accuracy)
        ).first()[0]
        import bisect

        lo = bisect.bisect_left(vals, got)
        hi = bisect.bisect_right(vals, got)
        target = q * n
        slack = n / accuracy + 1
        assert lo - slack <= target <= hi + slack, (q, got, lo, hi, target)
        # and the sketch is deterministic for a fixed input/partitioning
        again = orders.agg(
            F.percentile_approx("o_totalprice", q, accuracy)
        ).first()[0]
        assert got == again


def test_exact_rank_quantiles_basic(spark):
    from tinyerp_etl_spark.operators.sketch import exact_rank_quantiles

    # values 1..100 each once: p50 -> 50, p90 -> 90, p99 -> 99
    hist = spark.createDataFrame([(v, 1) for v in range(1, 101)], "v long, c long")
    out = {
        r["label"]: (r["q_value"], r["target_rank"])
        for r in exact_rank_quantiles(
            hist, "v", "c", {"p50": 5000, "p90": 9000, "p99": 9900}
        ).collect()
    }
    assert out == {"p50": (50, 50), "p90": (90, 90), "p99": (99, 99)}


def test_exact_rank_quantiles_weighted_and_partition_invariant(spark):
    from tinyerp_etl_spark.operators.sketch import exact_rank_quantiles

    # skewed weights: value 1 holds 90 of 100 rows; cum(5) = 99 >= 99
    # -> p50 = 1, p99 = 5
    hist = [(1, 90), (3, 5), (5, 4), (7, 1)]
    a = spark.createDataFrame(hist, "v long, c long")
    b = spark.createDataFrame(hist, "v long, c long").repartition(7)
    pa = {
        r["label"]: r["q_value"]
        for r in exact_rank_quantiles(a, "v", "c", {"p50": 5000, "p99": 9900}).collect()
    }
    pb = {
        r["label"]: r["q_value"]
        for r in exact_rank_quantiles(b, "v", "c", {"p50": 5000, "p99": 9900}).collect()
    }
    assert pa == pb == {"p50": 1, "p99": 5}


def test_exact_rank_quantiles_empty_histogram_keeps_labels(spark):
    from tinyerp_etl_spark.operators.sketch import exact_rank_quantiles

    hist = spark.createDataFrame([], "v long, c long")
    rows = exact_rank_quantiles(hist, "v", "c", {"p50": 5000, "p99": 9900}).collect()
    assert sorted(r["label"] for r in rows) == ["p50", "p99"]
    assert all(r["q_value"] is None for r in rows)


def test_kmv_merge_equals_direct_sketch(spark):
    """The merge identity: per-day sketches merged == sketch built
    directly on the union (the property the rollup gate query relies
    on), at any partitioning, including groups below capacity."""
    from tinyerp_etl_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_merge_estimate,
        kmv_sketches,
    )

    rows = [
        # group "big": 200 distinct values spread over 4 days
        ("big", i % 4, i) for i in range(200)
    ] + [
        # group "small": 10 distinct values (below k) over 2 days
        ("small", i % 2, 1000 + i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, day int, v long").repartition(7)

    daily = kmv_sketches(df, ["g", "day"], "v", k=16)
    merged = {
        r["g"]: (r["n_kept"], r["kth_min_hash"], r["n_estimate"])
        for r in kmv_merge_estimate(daily, ["g"], k=16).collect()
    }
    direct = {
        r["g"]: (r["kth_min_hash"], r["n_estimate"])
        for r in kmv_distinct_estimate(df, "g", "v", k=16).collect()
    }
    assert merged["big"][1:] == direct["big"]
    assert merged["small"][1:] == (None, 10.0)
    assert merged["small"][0] == 10
    # sketch rows are bounded at k elements
    assert all(len(r["kmv_sketch"]) <= 16 for r in daily.collect())


def test_kmv_incremental_maintenance_equals_full_rebuild(spark):
    """Maintaining the sketch table batch-by-batch is bit-identical to
    rebuilding from all raw data (associativity + dup-idempotence),
    including groups touched by only one batch."""
    from tinyerp_etl_spark.operators.sketch import (
        kmv_merge_sketches,
        kmv_sketches,
    )

    rows = [("g%d" % (i % 3), i % 5, i % 97) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, day int, v long").repartition(5)
    # batch 1: days 0-2 (all groups); batch 2: days 3-4 + a brand-new group
    b1 = df.filter("day < 3")
    b2 = df.filter("day >= 3").union(
        spark.createDataFrame([("gnew", 9, 1)], "g string, day int, v long")
    )
    full = df.union(spark.createDataFrame([("gnew", 9, 1)], "g string, day int, v long"))

    k = 16
    stored = kmv_sketches(b1, ["g"], "v", k=k)
    maintained = kmv_merge_sketches(
        stored, kmv_sketches(b2, ["g"], "v", k=k), ["g"], k=k
    )
    rebuilt = kmv_sketches(full, ["g"], "v", k=k)

    got = {r["g"]: r["kmv_sketch"] for r in maintained.collect()}
    want = {r["g"]: r["kmv_sketch"] for r in rebuilt.collect()}
    assert got == want
    # duplicate replay of the same increment changes nothing (idempotent)
    replayed = kmv_merge_sketches(
        maintained, kmv_sketches(b2, ["g"], "v", k=k), ["g"], k=k
    )
    assert {r["g"]: r["kmv_sketch"] for r in replayed.collect()} == want


# ----------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives_and_bounded_bitmap(spark):
    from tinyerp_etl_spark.operators.sketch import (
        BLOOM_M_BITS,
        bloom_build,
        bloom_probe,
    )

    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(200)], "key string"
    )
    bitmap = bloom_build(members, "key")
    # bitmap is fixed-size regardless of input cardinality
    assert bitmap.count() <= BLOOM_M_BITS // 64
    probed = {
        r["key"]: r["bloom_hit"]
        for r in bloom_probe(members, "key", bitmap).collect()
    }
    # the defining Bloom guarantee: every inserted key tests positive
    assert all(v == 1 for v in probed.values())


def test_bloom_rejects_most_non_members(spark):
    from tinyerp_etl_spark.operators.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame(
        [(f"member-{i}",) for i in range(100)], "key string"
    )
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(500)], "key string"
    )
    bitmap = bloom_build(members, "key")
    hits = (
        bloom_probe(others, "key", bitmap)
        .agg(F.sum("bloom_hit").alias("n"))
        .collect()[0]["n"]
    )
    # 100 keys * 5 bits into 65536 bits -> per-probe FP rate
    # ~ (500/65536)^5 ~ 1e-11; even 1% of 500 would signal a bug
    assert hits <= 5


def test_bloom_probe_is_broadcast_only(spark):
    from tinyerp_etl_spark.operators.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame([("a",), ("b",)], "key string")
    corpus = spark.createDataFrame(
        [(i, f"k{i}") for i in range(50)], "id long, key string"
    )
    plan = bloom_probe(
        corpus, "key", bloom_build(members, "key")
    )._jdf.queryExecution().executedPlan().toString()
    # the corpus side must not shuffle: the bitmap folds to one row
    # and broadcasts; any Exchange on the probe side would mean the
    # corpus was repartitioned just to test membership. In the plan
    # tree string the join prints BEFORE its children and the stream
    # (corpus) child prints first under BuildRight, so the corpus
    # subtree is the segment between the join line and the
    # BroadcastExchange that starts the build side.
    assert "BroadcastNestedLoopJoin" in plan and "BroadcastExchange" in plan
    probe_side = plan.split("BroadcastNestedLoopJoin", 1)[1].split(
        "BroadcastExchange", 1
    )[0]
    assert "Exchange" not in probe_side


def test_bloom_merge_equals_rebuild_and_is_replay_idempotent(spark):
    from tinyerp_etl_spark.operators.sketch import bloom_build, bloom_merge

    xs = spark.createDataFrame([(f"x{i}",) for i in range(60)], "key string")
    ys = spark.createDataFrame([(f"y{i}",) for i in range(40)], "key string")
    both = xs.unionByName(ys)

    def as_map(bm):
        return {r["word_idx"]: r["mask"] for r in bm.collect()}

    merged = as_map(bloom_merge(bloom_build(xs, "key"), bloom_build(ys, "key")))
    rebuilt = as_map(bloom_build(both, "key"))
    # incremental fold == full rebuild, bit for bit
    assert merged == rebuilt
    # replaying a batch into the merged bitmap changes nothing
    replay = as_map(
        bloom_merge(bloom_build(both, "key"), bloom_build(ys, "key"))
    )
    assert replay == rebuilt


def test_bloom_probe_is_streaming_legal(spark, tmp_path):
    """The probe is a stream-static broadcast join + per-row
    expression — append-mode legal, so decontamination can run at
    ingest. A drained availableNow stream must flag exactly what the
    batch probe flags."""
    import os

    from tinyerp_etl_spark.operators.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(20)], "key string"
    )
    corpus = spark.createDataFrame(
        [(i, f"m{i}" if i % 3 == 0 else f"other{i}") for i in range(60)],
        "id long, key string",
    )
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    corpus.coalesce(1).write.mode("overwrite").parquet(src)
    bitmap = bloom_build(members, "key")

    stream = spark.readStream.schema("id long, key string").parquet(src)
    got: dict[int, int] = {}

    def sink(batch_df, _bid):
        for r in batch_df.collect():
            got[r["id"]] = r["bloom_hit"]

    (
        bloom_probe(stream, "key", bitmap)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    want = {
        r["id"]: r["bloom_hit"]
        for r in bloom_probe(corpus, "key", bitmap).collect()
    }
    assert got == want
    # true members (key m{i} with i in the member range) always flag
    assert all(want[i] == 1 for i in range(0, 20, 3))


def test_bloom_empty_reference_set_flags_nothing(spark):
    """A fresh deployment probes against an EMPTY reference set: the
    bitmap has zero set bits, so every probe must come back 0 — and
    the one-row broadcast map fold must not crash on no input."""
    from tinyerp_etl_spark.operators.sketch import bloom_build, bloom_probe

    empty = spark.createDataFrame([], "key string")
    corpus = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(20)], "id long, key string"
    )
    probed = bloom_probe(corpus, "key", bloom_build(empty, "key")).collect()
    assert len(probed) == 20
    assert all(r["bloom_hit"] == 0 for r in probed)
