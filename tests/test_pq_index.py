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


def test_pq_shared_sample_matches_per_subspace_capped(spark):
    """The one-pass shared sample must train bit-identically to the
    first-cut per-subspace capped training (sample membership and
    seeding both derive from the same (md5-prefix, id) order)."""
    from pyspark.sql import functions as F

    emb = _tiny_embeddings(spark, n=10)
    cap = 6
    shared = P.train_pq(emb, m=2, ks=3, iters=2, sample_cap=cap)
    per_sub = []
    for s, (lo, w) in enumerate(P._sub_bounds(8, 2), start=1):
        sliced = emb.select(
            F.col("vec_id"), F.slice(F.col("embedding"), lo, w).alias("embedding")
        )
        from tinyerp_etl_spark.operators.similarity import train_kmeans

        cents = train_kmeans(sliced, k=3, iters=2, sample_cap=cap)
        per_sub.extend((s, cid, ticks) for cid, ticks in cents)
    assert shared == sorted(per_sub, key=lambda r: (r[0], r[1]))


def test_pq_empty_corpus_raises_clearly(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty embeddings frame"):
        P.train_pq(emb, m=2, ks=2, iters=1)


def test_pq_zero_subvector_encodes_not_crashes(spark):
    """A legitimate embedding whose one subspace slice quantizes to
    all-zero ticks must ENCODE (to code 1, the deterministic all-tie
    winner) rather than abort the job — the loud zero-norm contract
    binds at train time, not per row in the query path."""
    rows = [(i, [float(i + j + 1) for j in range(8)]) for i in range(1, 5)]
    emb_train = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    book = P.train_pq(emb_train, m=2, ks=2, iters=1)
    # second subspace slice is exactly zero
    probe = spark.createDataFrame(
        [(99, [1.0, 2.0, 3.0, 4.0, 0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["subspace"]): r["code"] for r in P.pq_encode(probe, book).collect()
    }
    assert got[2] == 1  # all-tie → lowest code id
    assert 1 <= got[1] <= 2


def test_ivfpq_all_lists_equals_plain_adc(spark):
    """With nprobe = every list, IVF pruning removes nothing, so the
    composed ranking must equal plain PQ ADC exactly — isolating the
    coarse filter as the ONLY difference between the two paths."""
    from tinyerp_etl_spark.operators.similarity import train_kmeans

    emb = _tiny_embeddings(spark, n=8)
    cents = train_kmeans(emb, k=3, iters=1)
    book = P.train_pq(emb, m=2, ks=3, iters=1)
    composed = [
        (r["vec_id"], r["score"])
        for r in P.ivfpq_topk(
            emb, 0, k=8, nprobe=3, centroids=cents, codebook=book
        ).collect()
    ]
    plain = [
        (r["vec_id"], r["score"])
        for r in P.pq_adc_topk(emb, 0, k=8, codebook=book).collect()
    ]
    assert composed == plain


def _corpus_with_zero_row(spark):
    rows = [(i, [float(i + j + 1) for j in range(8)]) for i in range(4)]
    rows.append((99, [0.0] * 8))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_adc_zero_corpus_vector_raises(spark):
    """A FULL-zero database vector must fail the ADC scan loudly, not
    silently earn the phantom cosine of its code-1 reconstruction —
    and it must fail on BOTH query paths (plain ADC and IVF-PQ), so
    the composed ≡ plain invariant holds on broken corpora too."""
    from tinyerp_etl_spark.operators.similarity import train_kmeans

    emb = _corpus_with_zero_row(spark)
    clean = emb.filter("vec_id < 99")
    book = P.train_pq(clean, m=2, ks=2, iters=1)
    with pytest.raises(Exception, match="zero-norm vector"):
        P.pq_adc_topk(emb, 0, k=5, codebook=book).collect()
    cents = train_kmeans(clean, k=2, iters=1)
    with pytest.raises(Exception, match="zero-norm vector"):
        P.ivfpq_topk(
            emb, 0, k=5, nprobe=2, centroids=cents, codebook=book
        ).collect()


def test_pq_encode_zero_vector_raises(spark):
    """The encode faces share the loud contract: a full-zero vector
    must never reach the codes table (its stored codes would later
    ADC-score as a phantom neighbor with no raw vector left to check)."""
    emb = _corpus_with_zero_row(spark)
    book = P.train_pq(emb.filter("vec_id < 99"), m=2, ks=2, iters=1)
    with pytest.raises(Exception, match="zero-norm vector"):
        P.pq_encode(emb, book).collect()
    with pytest.raises(Exception, match="zero-norm vector"):
        P.pq_encode_wide(emb, book).collect()


def test_ivfpq_requires_both_artifacts(spark):
    emb = _tiny_embeddings(spark)
    with pytest.raises(ValueError, match="both persisted artifacts"):
        P.ivfpq_topk(emb, 0, centroids=None, codebook=None)


def test_pq_adc_topk_requires_codebook(spark):
    """codebook=None must refuse loudly (training is an ingest-time
    corpus pass) instead of silently shipping a per-query training
    job — the same contract ivfpq_topk enforces for its centroids."""
    emb = _tiny_embeddings(spark)
    with pytest.raises(ValueError, match="codebook is required"):
        P.pq_adc_topk(emb, 0, k=3, codebook=None)
