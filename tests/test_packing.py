"""Sequence packing + distributed prefix sum + mixture resampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from tinyerp_etl_spark.operators.packing import (
    distributed_prefix_sum,
    pack_concat_chunks,
)
from tinyerp_etl_spark.operators.sampling import (
    mixture_resample,
    mixture_thresholds,
)


def _rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy(cols[0]).collect()]


def test_prefix_sum_matches_serial(spark):
    data = [(i, (i * 7919) % 23) for i in range(200)]
    df = spark.createDataFrame(data, "k long, w long").repartition(13)
    out = _rows(
        distributed_prefix_sum(df, "k", "w", out_col="off", n_buckets=8),
        "k",
        "off",
    )
    run, want = 0, []
    for k, w in data:
        want.append((k, run))
        run += w
    assert out == want


def test_prefix_sum_partition_invariant(spark):
    data = [(i, i % 5 + 1) for i in range(100)]
    a = spark.createDataFrame(data, "k long, w long").repartition(1)
    b = spark.createDataFrame(data, "k long, w long").repartition(17)
    ra = _rows(distributed_prefix_sum(a, "k", "w"), "k", "offset")
    rb = _rows(distributed_prefix_sum(b, "k", "w"), "k", "offset")
    assert ra == rb


def test_prefix_sum_sparse_keys(spark):
    # ids with huge gaps: some range buckets are empty
    data = [(1, 5), (1_000_000, 7), (2_000_000_000, 11), (2_000_000_001, 2)]
    df = spark.createDataFrame(data, "k long, w long")
    out = _rows(distributed_prefix_sum(df, "k", "w", n_buckets=4), "k", "offset")
    assert out == [(1, 0), (1_000_000, 5), (2_000_000_000, 12), (2_000_000_001, 23)]


def test_prefix_sum_empty(spark):
    df = spark.createDataFrame([], "k long, w long")
    assert distributed_prefix_sum(df, "k", "w").count() == 0


def test_pack_chunks_coordinates(spark):
    # seq_len 10: doc sizes 4,4,4 -> third doc straddles the boundary
    df = spark.createDataFrame([(1, 4), (2, 4), (3, 4)], "doc long, n long")
    out = _rows(
        pack_concat_chunks(df, "doc", "n", seq_len=10),
        "doc",
        "tok_offset",
        "seq_id",
        "offset_in_seq",
        "spans_boundary",
    )
    assert out == [
        (1, 0, 0, 0, False),
        (2, 4, 0, 4, False),
        (3, 8, 0, 8, True),
    ]


def test_pack_chunks_zero_token_doc(spark):
    # a zero-token doc exactly on a boundary must not invert seq_end
    df = spark.createDataFrame([(1, 10), (2, 0), (3, 3)], "doc long, n long")
    out = _rows(
        pack_concat_chunks(df, "doc", "n", seq_len=10),
        "doc",
        "seq_id",
        "spans_boundary",
    )
    assert out == [(1, 0, False), (2, 1, False), (3, 1, False)]


def test_mixture_thresholds_integer_math(spark):
    # en 218 @ .7 -> capacity 311, zh 75 @ .3 -> capacity 250 (binds)
    df = spark.createDataFrame(
        [("en",)] * 218 + [("zh",)] * 75 + [("xx",)] * 9, "lang string"
    ).withColumn("k", F.monotonically_increasing_id())
    thr = {
        r["lang"]: (r["n_total"], r["threshold_10k"])
        for r in mixture_thresholds(df, "lang", {"en": 7000, "zh": 3000}).collect()
    }
    assert thr == {"en": (218, 250 * 7000 // 218), "zh": (75, 10000)}
    assert "xx" not in thr  # unweighted domains dropped


def test_mixture_thresholds_rejects_bad_weights(spark):
    import pytest

    df = spark.createDataFrame([("en", 1)], "lang string, k long")
    with pytest.raises(AssertionError):
        mixture_thresholds(df, "lang", {"en": 5000})  # doesn't sum to 10000
    with pytest.raises(AssertionError):
        mixture_thresholds(df, "lang", {"en": 10000, "zh": 0})  # zero weight


def test_mixture_resample_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "zh") for i in range(300)], "k long, lang string"
    )
    w = {"en": 7000, "zh": 3000}
    a = sorted(r["k"] for r in mixture_resample(df, "lang", "k", w).collect())
    b = sorted(
        r["k"]
        for r in mixture_resample(df.repartition(11), "lang", "k", w).collect()
    )
    assert a == b and len(a) > 0
    # kept shares should be within a few percent of target
    kept = mixture_resample(df, "lang", "k", w)
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert abs(counts["en"] / total - 0.7) < 0.1


def test_mixture_thresholds_renormalizes_over_present_domains(spark):
    # 'zh' is weighted but absent: budget binds on present domains only
    # (documented renormalization), so 'en' keeps everything
    df = spark.createDataFrame([("en", i) for i in range(50)], "lang string, k long")
    out = mixture_thresholds(df, "lang", {"en": 5000, "zh": 5000}).collect()
    assert len(out) == 1 and out[0]["lang"] == "en"
    assert out[0]["threshold_10k"] == 10000


def test_prefix_sum_total_col(spark):
    from tinyerp_etl_spark.operators.packing import distributed_prefix_sum

    df = spark.createDataFrame([(1, 5), (2, 7)], "k long, w long")
    out = distributed_prefix_sum(df, "k", "w", total_col="n").collect()
    assert {r["n"] for r in out} == {12}


def test_incremental_dedup_emits_fingerprint(spark):
    from tinyerp_etl_spark.operators.dedup import incremental_dedup

    batch = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")], "doc_id long, text string"
    )
    store = spark.createDataFrame([("zzz",)], "fingerprint string")
    rows = {r["doc_id"]: r for r in incremental_dedup(batch, store).collect()}
    assert rows[1]["disposition"] == "new" and rows[2]["disposition"] == "dup_in_batch"
    assert rows[1]["fingerprint"] == rows[2]["fingerprint"]
    assert rows[3]["fingerprint"] is not None


def test_prefix_sum_null_weights_count_as_zero(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "k long, w long"
    )
    out = _rows(distributed_prefix_sum(df, "k", "w"), "k", "offset")
    assert out == [(1, 0), (2, 5), (3, 5)]
