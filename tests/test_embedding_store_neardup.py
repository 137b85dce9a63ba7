"""Batch-vs-store embedding near-dup through the IVF layout: probe
expression parity with the driver-side rule, exact-copy detection,
recall honesty, and the store-shuffle-free plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tinyerp_etl_spark.operators import similarity as S


def _emb(spark, n=12, dim=8, offset=0):
    rows = [
        (
            i + offset,
            [float((i * 5 + j * 3) % 11 + 1) + 0.01 * j for j in range(dim)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_probe_expr_matches_probe_lists(spark):
    """The per-row probe array must be BIT-identical to the driver-side
    probe_lists rule (same cosine, same (score DESC, id ASC) order) —
    the probe set is part of the oracle-checked contract."""
    emb = _emb(spark, n=20)
    cents = S.train_kmeans(emb, k=4, iters=2)
    rows = emb.select(
        "vec_id",
        "embedding",
        S.ivf_probe_expr("embedding", cents, 3).alias("probes"),
    ).collect()
    for r in rows:
        assert [int(p) for p in r["probes"]] == S.probe_lists(
            cents, S.quantize_vector(r["embedding"]), 3
        )


def test_probe_expr_rejects_bad_nprobe_and_zero_rows(spark):
    emb = _emb(spark, n=6)
    cents = S.train_kmeans(emb, k=2, iters=1)
    with pytest.raises(ValueError, match="nprobe"):
        S.ivf_probe_expr("embedding", cents, 0)
    zero = spark.createDataFrame(
        [(99, [0.0] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="zero-norm vector"):
        zero.select(S.ivf_probe_expr("embedding", cents, 1)).collect()


def test_exact_copy_found_at_cos_one(spark):
    """A batch vector that is an exact copy of a store vector shares
    its assignment, so nprobe >= 1 always surfaces the pair — at
    cos = 1.0 EXACTLY (identical integer ticks)."""
    emb = _emb(spark, n=10)
    cents = S.train_kmeans(emb, k=3, iters=2)
    store = S.ivf_assign(emb, centroids=cents)
    copy_vec = emb.filter("vec_id = 4").first()["embedding"]
    batch = spark.createDataFrame(
        [(700, copy_vec)], "vec_id long, embedding array<float>"
    )
    got = [
        (r["store_vec"], r["batch_vec"], r["cos"])
        for r in S.embedding_neardup_against_store(
            store, batch, cents, threshold=0.999
        ).collect()
    ]
    assert (4, 700, 1.0) in got


def test_pairs_only_from_probed_lists(spark):
    """Candidates must come from the batch vector's nprobe lists ONLY
    (the IVF recall trade, mirrored by the oracle): every emitted
    store_vec's list is in its batch_vec's probe set."""
    emb = _emb(spark, n=16)
    cents = S.train_kmeans(emb, k=4, iters=2)
    store = S.ivf_assign(emb, centroids=cents)
    batch = _emb(spark, n=4, offset=200)
    pairs = S.embedding_neardup_against_store(
        store, batch, cents, nprobe=2, threshold=0.0
    )
    lists = {r["vec_id"]: r["list_id"] for r in store.collect()}
    probes = {
        r["vec_id"]: [int(p) for p in r["probes"]]
        for r in batch.select(
            "vec_id", S.ivf_probe_expr("embedding", cents, 2).alias("probes")
        ).collect()
    }
    for r in pairs.collect():
        assert lists[r["store_vec"]] in probes[r["batch_vec"]]


def test_gate_query_prunes_store_partitions_dynamically(spark, sf_dir):
    """The gate query reads the PERSISTED list_id-partitioned store
    corpus, and the candidate join's list_id equality must reach that
    layout as DYNAMIC partition pruning (the batch's probe lists are
    runtime values): the plan carries a dynamicpruning subquery on the
    store scan — the 100 TB directory-pruning claim, pinned."""
    from tinyerp_etl_spark.plans.llm_ops import embedding_neardup_store

    df = embedding_neardup_store(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    assert "SortMergeJoin" not in plan


def test_plan_is_store_shuffle_free(spark):
    """The candidate join must broadcast the BATCH probes and stream
    the store — never sort-merge (a corpus shuffle), never cartesian."""
    from tinyerp_etl_spark.operators.planlint import plan_findings

    emb = _emb(spark, n=10)
    cents = S.train_kmeans(emb, k=3, iters=1)
    store = S.ivf_assign(emb, centroids=cents)
    out = S.embedding_neardup_against_store(
        store, _emb(spark, n=3, offset=100), cents
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan_findings(out) == []


def test_pq_prescreen_is_pair_preserving(spark):
    """The PQ-ADC prescreen must be INVISIBLE in the result: the sound
    adc'+eps upper bound can prune only pairs whose exact cosine is
    below the threshold, so prescreen-on equals prescreen-off row for
    row (ids AND scores) at every tested threshold."""
    from tinyerp_etl_spark.operators import pq_index as P

    emb = _emb(spark, n=24)
    cents = S.train_kmeans(emb, k=3, iters=2)
    book = P.train_pq(emb, m=2, ks=4)
    store = S.ivf_assign(emb, centroids=cents)
    copy_vec = emb.filter("vec_id = 7").first()["embedding"]
    batch = _emb(spark, n=6, offset=300).unionByName(
        spark.createDataFrame(
            [(900, copy_vec)], "vec_id long, embedding array<float>"
        )
    )
    for thr in (0.9, 0.99, 0.999):
        rows = lambda cb: sorted(
            (r["store_vec"], r["batch_vec"], r["cos"])
            for r in S.embedding_neardup_against_store(
                store, batch, cents, threshold=thr, codebook=cb
            ).collect()
        )
        off, on = rows(None), rows(book)
        assert on == off, f"threshold {thr}: prescreen changed the pairs"
    # and the copy pair is actually present at the top threshold
    assert any(s == 7 and b == 900 for s, b, _ in rows(book))


def test_prescreen_codes_validated_against_book(spark):
    """Ingest-time pq_codes are trusted ONLY under the book that wrote
    them (the span store's k-mismatch refusal applied to PQ): a store
    stamped with a different book's digest raises, a codes-but-no-
    digest legacy layout raises, and the matching digest passes with
    the same pairs as deriving the columns inline."""
    from tinyerp_etl_spark.operators import pq_index as P

    emb = _emb(spark, n=20)
    cents = S.train_kmeans(emb, k=2, iters=1)
    book = P.train_pq(emb, m=2, ks=4)
    store = P.pq_prescreen_cols(
        S.ivf_assign_narrow(emb.filter(F.col("vec_id") % 2 == 0), centroids=cents),
        book,
    )
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    pairs = lambda st, cb: sorted(
        (r["store_vec"], r["batch_vec"])
        for r in S.embedding_neardup_against_store(
            st, batch, cents, threshold=0.9, codebook=cb
        ).collect()
    )
    assert pairs(store, book) == pairs(store.drop("pq_codes", "pq_eps", "pq_book"), book)
    other = P.train_pq(emb, m=2, ks=2)
    assert P.codebook_digest(other) != P.codebook_digest(book)
    with pytest.raises(ValueError, match="encoded under codebook"):
        S.embedding_neardup_against_store(
            store, batch, cents, threshold=0.9, codebook=other
        )
    with pytest.raises(ValueError, match="no pq_book digest"):
        S.embedding_neardup_against_store(
            store.drop("pq_book"), batch, cents, threshold=0.9, codebook=book
        )
    # the digest is content-addressed, not object-addressed: a
    # re-ordered copy of the same book validates
    shuffled = list(reversed(book))
    assert P.codebook_digest(shuffled) == P.codebook_digest(book)


def test_pq_prescreen_bound_is_sound(spark):
    """adc' + eps >= exact cosine for EVERY candidate pair — the
    Cauchy-Schwarz bound the prescreen's correctness rests on,
    checked directly over all store×batch combinations."""
    import math

    from tinyerp_etl_spark.operators import pq_index as P

    emb = _emb(spark, n=20)
    book = P.train_pq(emb, m=2, ks=4)
    pre = {
        r["vec_id"]: (list(r["pq_codes"]), r["pq_eps"])
        for r in P.pq_prescreen_cols(emb, book).collect()
    }
    by = P._by_subspace(book)
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    q = lambda v: [round(float(x) * S.QUANT) for x in v]
    dim = len(next(iter(vecs.values())))
    w = dim // len(by)
    for sid, sv in vecs.items():
        codes, eps = pre[sid]
        st = q(sv)
        recon = []
        for i, s in enumerate(sorted(by)):
            recon.extend(dict(by[s])[codes[i]])
        nx = math.sqrt(sum(t * t for t in st))
        for qid, qv in vecs.items():
            if qid == sid:
                continue
            qt = q(qv)
            nq = math.sqrt(sum(t * t for t in qt))
            exact = sum(a * b for a, b in zip(st, qt)) / (nx * nq)
            bound = sum(a * b for a, b in zip(recon, qt)) / (nx * nq) + eps
            assert bound >= exact - 1e-12, (sid, qid, bound, exact)


def test_pq_prescreen_codes_match_encode_wide(spark):
    """pq_prescreen_cols' codes array must be the SAME encoding as
    pq_encode_wide's code_1..code_M columns (one encoder, two
    layouts)."""
    from tinyerp_etl_spark.operators import pq_index as P

    emb = _emb(spark, n=15)
    book = P.train_pq(emb, m=2, ks=4)
    got = {
        r["vec_id"]: list(r["pq_codes"])
        for r in P.pq_prescreen_cols(emb, book).collect()
    }
    want = {
        r["vec_id"]: [r["code_1"], r["code_2"]]
        for r in P.pq_encode_wide(emb, book).collect()
    }
    assert got == want
