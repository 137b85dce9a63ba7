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
