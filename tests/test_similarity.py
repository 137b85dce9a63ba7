"""Contract tests for the embedding similarity operators."""

from __future__ import annotations

import pytest


def _vecs(spark, n):
    rows = [(i, [float(i % 3), 1.0, float(i % 5), 2.0]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_knn_join_rejects_oversized_query_batch(spark):
    # the query set broadcasts — a corpus-sized "batch" must fail fast
    # with a clear error instead of OOMing the driver mid-broadcast
    from tinyerp_etl_spark.operators.similarity import knn_join

    corpus = _vecs(spark, 20)
    queries = _vecs(spark, 5)
    with pytest.raises(ValueError, match="max_query_batch"):
        knn_join(corpus, queries, k=2, max_query_batch=4)


def test_knn_join_within_batch_bound_runs(spark):
    from tinyerp_etl_spark.operators.similarity import knn_join

    corpus = _vecs(spark, 20)
    queries = _vecs(spark, 3)
    out = knn_join(corpus, queries, k=2, max_query_batch=4).collect()
    assert {r["query_id"] for r in out} == {0, 1, 2}
    assert all(r["rn"] in (1, 2) for r in out)


def test_neardup_pairs_flood_bucket_quarantines(spark):
    """A sign bucket of near-identical embeddings — exactly the corpus
    this op targets — must not expand k(k-1)/2 full-vector pairs:
    over-cap buckets quarantine, disjoint outputs, distinct near-dups
    elsewhere unaffected."""
    from tinyerp_etl_spark.operators.similarity import neardup_pairs

    # 40 identical vectors -> one hot sign bucket (>= SIGN_BUCKET_DIMS dims)
    base = [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]
    flood = [(i, base) for i in range(40)]
    # a genuine near-dup pair in a different sign bucket
    other = [-1.0, 2.0, -3.0, 4.0, -1.0, 2.0, -3.0, 4.0]
    near = [(1000, other), (1001, other[:-1] + [4.01])]
    df = spark.createDataFrame(flood + near, "vec_id long, embedding array<float>")

    pairs, quarantined = neardup_pairs(
        df, threshold=0.99, bucket_cap=8, with_quarantine=True
    )
    assert {r["vec_id"] for r in quarantined.collect()} == set(range(40))
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(1000, 1001)}

    # without the flag: best-effort pairs, still no flood expansion
    best_effort = neardup_pairs(df, threshold=0.99, bucket_cap=8)
    assert {(r["id_a"], r["id_b"]) for r in best_effort.collect()} == {(1000, 1001)}
