"""Contract tests for the embedding similarity operators."""

from __future__ import annotations

import pytest


def _vecs(spark, n):
    rows = [(i, [float(i % 3), 1.0, float(i % 5), 2.0]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_knn_join_autoroutes_oversized_query_batch(spark):
    """A batch over max_query_batch must ROUTE to the IVF-pruned
    kernel (never the quadratic cross product): the routed plan
    broadcast-hash-joins the probe rows — no nested-loop/cartesian —
    and at full probe depth (nprobe = nlist) the routed result equals
    the exact brute result row for row, scores bit-identical."""
    from tinyerp_etl_spark.operators.similarity import knn_join, train_kmeans

    corpus = _vecs(spark, 20)
    queries = _vecs(spark, 6)
    cents = train_kmeans(corpus)
    routed = knn_join(
        corpus, queries, k=2, max_query_batch=4,
        centroids=cents, nprobe=len(cents),
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    exact = knn_join(corpus, queries, k=2, max_query_batch=1000)
    key = lambda r: (r["query_id"], r["rn"])
    got = {key(r): (r["vec_id"], r["score"]) for r in routed.collect()}
    want = {key(r): (r["vec_id"], r["score"]) for r in exact.collect()}
    assert got == want


def test_knn_join_inline_centroids_memoized_per_corpus(spark, monkeypatch):
    """A routed knn_join without centroids trains sample-bounded
    k-means inline — ONCE per corpus frame, not once per call: a
    caller looping query batches over the same corpus must not pay
    training per batch. A different corpus plan retrains, and the memo
    can never serve wrong centroids (plan equality is confirmed via
    sameSemantics, not just the hash). Results are identical to
    passing the trained centroids explicitly."""
    import warnings

    from tinyerp_etl_spark.operators import similarity as S

    monkeypatch.setattr(S, "_INLINE_CENTROID_MEMO", {})
    calls = []
    real = S.train_kmeans

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(S, "train_kmeans", counting)
    corpus = _vecs(spark, 20)
    run = lambda q: sorted(
        (r["query_id"], r["rn"], r["vec_id"])
        for r in S.knn_join(
            corpus, q, k=2, max_query_batch=2, route="ivf"
        ).collect()
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        first = run(_vecs(spark, 6))
        run(_vecs(spark, 4))
        assert len(calls) == 1  # second batch served from the memo
        other = _vecs(spark, 30)
        S.knn_join(other, _vecs(spark, 4), k=2, route="ivf").collect()
        assert len(calls) == 2  # different corpus plan retrains
        explicit = sorted(
            (r["query_id"], r["rn"], r["vec_id"])
            for r in S.knn_join(
                corpus, _vecs(spark, 6), k=2, max_query_batch=2,
                route="ivf", centroids=real(corpus),
            ).collect()
        )
    assert first == explicit


def test_knn_join_store_assigned_requires_centroids(spark):
    from tinyerp_etl_spark.operators.similarity import (
        ivf_assign_narrow,
        knn_join,
        train_kmeans,
    )

    corpus = _vecs(spark, 20)
    assigned = ivf_assign_narrow(corpus, centroids=train_kmeans(corpus))
    with pytest.raises(ValueError, match="centroids"):
        knn_join(corpus, _vecs(spark, 6), k=2, max_query_batch=4,
                 store_assigned=assigned)


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


# the toy corpora below pass an EXPLICIT pre-trained centroid index
# (the persisted-artifact path of ivf_assign/semantic_dedup) so the
# tests pin the dedup CONTRACT without depending on what k-means
# training does with a handful of vectors (with k=8 > n, training
# would give every vector its own cluster and dedup becomes a no-op)
_BASE = [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]
_OTHER = [-1.0, 2.0, -3.0, 4.0, -1.0, 2.0, -3.0, 4.0]


def _ticks(vec):
    return [int(round(x * 1_000_000)) for x in vec]


# two pinned clusters on the two toy directions
_TOY_CENTROIDS = [(1, _ticks(_BASE)), (2, _ticks(_OTHER))]


def test_semantic_dedup_lower_id_dominance(spark):
    """Within a cluster, a vector with any lower-id in-threshold
    neighbor is dropped; distinct meanings survive; output covers
    every input row."""
    from tinyerp_etl_spark.operators.similarity import semantic_dedup

    rows = [
        (1, _BASE),                          # centroid / lowest id of its ball
        (2, _OTHER),                         # centroid of the other cluster
        (10, [x + 0.01 for x in _BASE]),     # paraphrase of 1 -> dropped
        (11, [x + 0.02 for x in _BASE]),     # also in 1's ball -> dropped
        (12, [x + 0.001 for x in _OTHER]),   # paraphrase of 2 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, threshold=0.99, centroids=_TOY_CENTROIDS
        ).collect()
    }
    assert got == {1: True, 2: True, 10: False, 11: False, 12: False}


def test_semantic_dedup_overcap_cluster_conservative_or_quarantined(spark):
    """Over-cap clusters: conservative keep by default (dedup must not
    silently drop data), quarantine list when asked."""
    from tinyerp_etl_spark.operators.similarity import semantic_dedup

    flood = [(100 + i, _BASE) for i in range(30)]  # all land in cluster 1
    rows = [(1, _BASE), (2, _OTHER)] + flood + [
        (1000, [x + 0.001 for x in _OTHER])        # cluster 2, dup of 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    res = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(df, threshold=0.99, cluster_cap=8).collect()}
    assert res[1] and all(res[100 + i] for i in range(30))  # conservative keep
    assert res[2] is True and res[1000] is False  # small cluster still deduped

    deduped, q = semantic_dedup(
        df, threshold=0.99, cluster_cap=8, with_quarantine=True
    )
    qids = {r["vec_id"] for r in q.collect()}
    assert qids == {1} | {100 + i for i in range(30)}  # the whole hot cluster
    out = {r["vec_id"]: r["kept"] for r in deduped.collect()}
    assert out == {2: True, 1000: False}  # disjoint from quarantine


def test_semantic_dedup_chain_drops_whole_tail(spark):
    """The documented dominance-vs-greedy difference: on a transitive
    chain a~b, b~c, a≁c, dominance drops BOTH b and c (strict greedy
    would re-keep c). This pins the contract so a silent semantics
    change cannot hide."""
    import math

    from tinyerp_etl_spark.operators.similarity import semantic_dedup

    # unit vectors in a 8-dim plane at angles 0, θ, 2θ: cos(θ) above
    # the threshold, cos(2θ) below it — an exact a~b, b~c, a≁c chain
    theta = 0.2
    def vec(k):
        a = [math.cos(k * theta), math.sin(k * theta)] + [0.0] * 6
        return [round(x, 6) for x in a]

    rows = [(1, vec(0)), (10, vec(1)), (11, vec(2))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # one pinned cluster: the chain semantics need all three together
    one_cluster = [(1, [1_000_000, 100_000, 0, 0, 0, 0, 0, 0])]
    got = {r["vec_id"]: r["kept"]
           for r in semantic_dedup(
               df, threshold=0.95, centroids=one_cluster).collect()}
    # cos(theta)=0.980 >= 0.95 (a~b and b~c), cos(2*theta)=0.921 < 0.95
    assert got == {1: True, 10: False, 11: False}


def test_train_kmeans_deterministic_and_balanced(spark):
    """Training is a pure function of the corpus: two runs (and any
    partitioning — the oracle parity pins that) give bit-identical
    centroids; every centroid id 1..k appears exactly once; k > n
    degrades to one seed per vector."""
    from tinyerp_etl_spark.operators.similarity import train_kmeans

    rows = [(i, [float((i * 7) % 11), float((i * 3) % 5), 1.0, float(i % 2)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    a = train_kmeans(df, k=4, iters=2)
    b = train_kmeans(df, k=4, iters=2)
    assert a == b
    assert [c for c, _ in a] == [1, 2, 3, 4]
    assert all(len(t) == 4 for _, t in a)

    tiny = spark.createDataFrame(rows[:2], "vec_id long, embedding array<float>")
    assert len(train_kmeans(tiny, k=8, iters=1)) == 2


def test_train_kmeans_empty_cluster_keeps_seed(spark):
    """A centroid that attracts no members keeps its previous ticks
    (never collapses to null/zero): 2 identical vectors + k=2 means
    one seed wins every member and the other must survive unchanged."""
    from tinyerp_etl_spark.operators.similarity import train_kmeans

    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_kmeans(df, k=2, iters=3)
    assert len(cents) == 2
    # both seeds were [1.0, 0.0]; the loser keeps those ticks
    assert all(t == [1_000_000, 0] for _, t in cents)


def test_kmeans_centroids_counts_cover_corpus(spark):
    """n_members over all lists sums to the corpus size, and empty
    lists report 0 (not a missing row)."""
    from tinyerp_etl_spark.operators.similarity import kmeans_centroids

    rows = [(i, [float(i % 3), 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_centroids(df, k=5, iters=1).collect()
    assert len(out) == 5
    assert sum(r["n_members"] for r in out) == 12


def test_neardup_pairs_uncapped_default_warns(spark):
    """bucket_cap=None (the recall-first default) must be loud about
    the k·(k-1)/2 expansion risk; an explicit cap stays silent."""
    import warnings

    from tinyerp_etl_spark.operators.similarity import neardup_pairs

    df = spark.createDataFrame(
        [(i, _BASE) for i in range(4)], "vec_id long, embedding array<float>"
    )
    with pytest.warns(UserWarning, match="bucket_cap"):
        neardup_pairs(df, threshold=0.99)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        neardup_pairs(df, threshold=0.99, bucket_cap=8)


def test_ivf_topk_tie_break_independent_of_centroid_order(spark):
    """A pre-trained index passed in NON-ascending centroid_id order
    must produce the same assignments as _assign_ticks (ties to the
    LOWER id): with duplicate centroid ticks and nprobe=1 every vector
    ties, so all must land on (and be scanned from) list 1 — an
    order-sensitive argmax would assign to list 2 and return nothing."""
    from tinyerp_etl_spark.operators.similarity import ivf_topk

    rows = [(i, _BASE) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    dup = [(2, _ticks(_BASE)), (1, _ticks(_BASE))]  # deliberately unsorted
    out = ivf_topk(df, query_vec_id=0, k=10, nprobe=1, centroids=dup).collect()
    assert {r["vec_id"] for r in out} == {1, 2, 3, 4, 5}


def test_train_kmeans_sample_cap_noop_under_cap_and_binding_over(spark):
    """Corpora under the cap train on every row (bit-identical to
    uncapped); over the cap, training reads exactly the sample_cap
    smallest (hash, id) rows — deterministic regardless of order."""
    from pyspark.sql import functions as F

    from tinyerp_etl_spark.operators.similarity import train_kmeans

    rows = [(i, [float(i % 7), 1.0, float(i % 3), 2.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = train_kmeans(df, k=4, iters=2, sample_cap=None)
    capped_loose = train_kmeans(df, k=4, iters=2, sample_cap=100)
    assert capped_loose == full

    tight_a = train_kmeans(df, k=4, iters=2, sample_cap=10)
    tight_b = train_kmeans(
        df.orderBy(F.rand(7)), k=4, iters=2, sample_cap=10
    )
    assert tight_a == tight_b
    with pytest.raises(ValueError, match="sample_cap"):
        train_kmeans(df, k=11, iters=1, sample_cap=10)


def test_nprobe_recall_curve_is_monotone_and_exhaustive_at_full_depth(
    spark, sf_dir
):
    """Probe sets are nested prefixes, so recall@k must be
    non-decreasing in nprobe; at nprobe = KMEANS_K every list is
    probed and the ranking IS the exhaustive one — recall exactly
    10000 p10k."""
    from tinyerp_etl_spark.operators.similarity import KMEANS_K
    from tinyerp_etl_spark.plans.llm_ops import (
        _NPROBE_LEVELS,
        ivf_nprobe_recall_curve,
    )

    rows = sorted(
        (r["nprobe"], r["recall_p10k"])
        for r in ivf_nprobe_recall_curve(spark, sf_dir).collect()
    )
    assert [n for n, _ in rows] == sorted(_NPROBE_LEVELS)
    recalls = [r for _, r in rows]
    assert recalls == sorted(recalls)
    assert max(_NPROBE_LEVELS) == KMEANS_K
    assert rows[-1][1] == 10000


def test_probe_lists_rejects_zero_query_vector():
    from tinyerp_etl_spark.operators.similarity import probe_lists

    cents = [(1, [1, 0]), (2, [0, 1])]
    with pytest.raises(ValueError, match="zero query vector"):
        probe_lists(cents, [0, 0], nprobe=1)


def test_probe_lists_rejects_zero_tick_centroid():
    from tinyerp_etl_spark.operators.similarity import probe_lists

    with pytest.raises(ValueError, match="zero-tick centroid"):
        probe_lists([(1, [0, 0]), (2, [0, 1])], [1, 1], nprobe=1)


def test_ivf_assign_expr_rejects_zero_centroid_at_build(spark):
    from tinyerp_etl_spark.operators.similarity import ivf_assign_expr
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="zero ticks"):
        ivf_assign_expr("embedding", [(1, [0, 0]), (2, [0, 1])])


def test_zero_norm_vector_fails_loudly_on_both_assignment_paths(spark):
    """A zero embedding must raise on BOTH the aggregate and the
    narrow assignment path — previously the columnar paths NaN-scored
    it (arbitrary list) while the driver path raised
    ZeroDivisionError, so the two faces could silently diverge."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from tinyerp_etl_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_narrow,
    )

    rows = [(0, [1.0, 2.0]), (1, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [(1, [1000000, 0]), (2, [0, 1000000])]
    with pytest.raises(SparkRuntimeException, match="zero-norm"):
        ivf_assign_narrow(emb, centroids=cents).collect()
    with pytest.raises(SparkRuntimeException, match="zero-norm"):
        ivf_assign(emb, centroids=cents).collect()


def test_ivf_exprs_reject_column_vec_col(spark):
    """The SQL-authored expressions take the column NAME; a stale
    caller passing a Column must get a TypeError at the call site,
    not an obscure JVM parse error from f-string interpolation."""
    import pytest
    from pyspark.sql import functions as F

    from tinyerp_etl_spark.operators import pq_index as P
    from tinyerp_etl_spark.operators import similarity as S

    cents = [(0, [10] * 4), (1, [-10] * 4)]
    with pytest.raises(TypeError, match="NAME"):
        S.ivf_assign_expr(F.col("embedding"), cents)
    with pytest.raises(TypeError, match="NAME"):
        S.ivf_probe_expr(F.col("embedding"), cents, nprobe=1)
    with pytest.raises(TypeError, match="NAME"):
        P._pq_sub_expr(F.col("embedding"), 1, 4, cents, None)


def test_knn_join_route_contract(spark):
    """route='exact' restores the loud refusal; route='auto' warns
    (once, naming the recall contract) when it degrades to the IVF
    kernel; route='ivf' is silent — the transition is a choice."""
    import warnings

    from tinyerp_etl_spark.operators.similarity import knn_join, train_kmeans

    corpus = _vecs(spark, 20)
    queries = _vecs(spark, 6)
    cents = train_kmeans(corpus)
    with pytest.raises(ValueError, match="route='exact'"):
        knn_join(corpus, queries, k=2, max_query_batch=4, route="exact")
    with pytest.raises(ValueError, match="route must be"):
        knn_join(corpus, queries, k=2, route="fastest")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        knn_join(corpus, queries, k=2, max_query_batch=4,
                 centroids=cents).collect()
        routed_warnings = [x for x in w if "IVF-pruned" in str(x.message)]
        assert len(routed_warnings) == 1
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        knn_join(corpus, queries, k=2, route="ivf", centroids=cents,
                 nprobe=len(cents)).collect()
        assert not [x for x in w if "IVF-pruned" in str(x.message)]


def test_knn_join_routed_shuffle_hash_beyond_broadcast_cap(spark, monkeypatch):
    """Beyond MAX_KNN_PROBE_BROADCAST the probe side must ride a
    shuffle-hash join (no driver broadcast of a corpus-scale query
    set) with identical results."""
    from tinyerp_etl_spark.operators import similarity as S

    corpus = _vecs(spark, 20)
    queries = _vecs(spark, 6)
    cents = S.train_kmeans(corpus)
    kw = dict(k=2, route="ivf", centroids=cents, nprobe=len(cents))
    small = S.knn_join(corpus, queries, **kw)
    monkeypatch.setattr(S, "MAX_KNN_PROBE_BROADCAST", 2)
    big = S.knn_join(corpus, queries, **kw)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    key = lambda r: (r["query_id"], r["rn"])
    assert {key(r): (r["vec_id"], r["score"]) for r in big.collect()} == {
        key(r): (r["vec_id"], r["score"]) for r in small.collect()
    }
