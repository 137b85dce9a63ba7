"""Product-quantization index: store round-trip, trust contract,
exactness law, and the narrow-encode plan shape."""

from __future__ import annotations

import pytest

from tinyerp_etl_spark.operators import pq_index as P
from tinyerp_etl_spark.operators.ivf_index import (
    corpus_fingerprint,
    embedding_content,
)
from tinyerp_etl_spark.operators.similarity import brute_force_topk


def _tiny_embeddings(spark, n=6, dim=8):
    # pairwise non-collinear subvectors in every subspace so k=n
    # training keeps each point as its own codeword (the exactness law)
    rows = [
        (i, [float((i + 1) * (j + 2) % 7 + 1) + 0.1 * j for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_store_roundtrip_and_mismatch(spark, tmp_path):
    emb = _tiny_embeddings(spark)
    fp = corpus_fingerprint(emb, content=embedding_content())
    book = P.train_pq(emb, m=2, ks=3, iters=1)
    path = str(tmp_path / "pq")
    P.save_pq_index(spark, path, book, fp, m=2, ks=3, iters=1)
    loaded = P.load_pq_index(
        spark, path, expect_params=(2, 3, 1, P.TRAIN_SAMPLE_CAP),
        expect_fingerprint=fp,
    )
    assert loaded == book
    # param mismatch → None (caller retrains)
    assert P.load_pq_index(spark, path, expect_params=(2, 4, 1, P.TRAIN_SAMPLE_CAP)) is None
    # fingerprint mismatch → None
    assert (
        P.load_pq_index(spark, path, expect_fingerprint=(fp[0] + 1, fp[1]))
        is None
    )


def test_pq_verify_false_wins_over_fingerprint(spark, tmp_path):
    """The trust-the-artifact mode must not be silently defeated by a
    passed fingerprint (the ivf_index precedence rule, mirrored)."""
    emb = _tiny_embeddings(spark)
    fp = corpus_fingerprint(emb, content=embedding_content())
    path = str(tmp_path / "pq")
    book = P.load_or_train_pq_index(spark, emb, path, m=2, ks=3, iters=1)
    wrong_fp = (fp[0] + 99, fp[1] + 1)
    trusted = P.load_or_train_pq_index(
        spark, emb, path, m=2, ks=3, iters=1,
        verify=False, fingerprint=wrong_fp,
    )
    assert trusted == book  # loaded, not retrained


def test_pq_adc_exactness_law(spark):
    """With KS = corpus size and distinct non-collinear subvectors,
    every point is its own codeword, so the ADC 'approximation' IS the
    exact quantized cosine — scores must equal brute_force_topk's
    double for double. The strongest internal check that the ADC
    arithmetic (Σ subspace dots / √(Σ codeword norms² · |q|²)) is
    wired right."""
    n = 6
    emb = _tiny_embeddings(spark, n=n)
    book = P.train_pq(emb, m=2, ks=n, iters=2)
    adc = {
        r["vec_id"]: r["score"]
        for r in P.pq_adc_topk(emb, 0, k=n, codebook=book).collect()
    }
    exact = {
        r["vec_id"]: r["score"]
        for r in brute_force_topk(emb, 0, k=n).collect()
    }
    assert adc == exact


def test_pq_encode_is_one_narrow_projection(spark):
    emb = _tiny_embeddings(spark)
    book = P.train_pq(emb, m=2, ks=3, iters=1)
    codes = P.pq_encode(emb, book)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # shuffle-free: the at-ingest write face
    got = {(r["vec_id"], r["subspace"]): r["code"] for r in codes.collect()}
    assert len(got) == 6 * 2
    assert all(1 <= c <= 3 for c in got.values())


def test_pq_sub_bounds_rejects_ragged(spark):
    with pytest.raises(ValueError, match="evenly divide"):
        P._sub_bounds(10, 3)
    emb = _tiny_embeddings(spark, dim=8)
    with pytest.raises(ValueError, match="evenly divide"):
        P.train_pq(emb, m=3, ks=2, iters=1)


def test_pq_zero_query_raises(spark):
    rows = [(0, [0.0] * 8)] + [
        (i, [float(i + j) for j in range(8)]) for i in range(1, 4)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    book = P.train_pq(emb.filter("vec_id > 0"), m=2, ks=2, iters=1)
    with pytest.raises(ValueError, match="zero query vector"):
        P.pq_adc_topk(emb, 0, k=3, codebook=book)
