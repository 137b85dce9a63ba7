"""Stratified deterministic sampling unit tests.

The oracle query covers strata that ARE in the rate map; these pin the
edges it can't: unknown strata drop, rate 0/1 boundaries, and
reproducibility across partitionings.
"""

from __future__ import annotations

from tinyerp_etl_spark.operators.sampling import stratified_sample


def _keys(df):
    return sorted(r["k"] for r in df.collect())


def test_unknown_strata_are_dropped(spark):
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "ZZZ") for i in range(100)], "k int, s string"
    )
    out = stratified_sample(df, "s", {"A": 1.0}, "k")
    assert _keys(out) == [i for i in range(100) if i % 2]


def test_rate_one_keeps_all_rate_zero_drops_all(spark):
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B") for i in range(100)], "k int, s string"
    )
    out = stratified_sample(df, "s", {"A": 1.0, "B": 0.0}, "k")
    assert _keys(out) == [i for i in range(100) if i % 2]


def test_sample_is_partitioning_invariant(spark):
    df = spark.createDataFrame([(i, "A") for i in range(1000)], "k int, s string")
    a = _keys(stratified_sample(df.repartition(13), "s", {"A": 0.25}, "k"))
    b = _keys(stratified_sample(df.coalesce(1), "s", {"A": 0.25}, "k"))
    assert a == b
    # a hash predicate at rate r keeps ~r of rows, not exactly r
    assert 150 < len(a) < 350


def test_cap_per_key_bounds_and_determinism(spark):
    from tinyerp_etl_spark.operators.sampling import cap_per_key

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(90)], "k int, s string"
    )
    rows = lambda d: sorted((r["s"], r["k"]) for r in d.collect())
    out = cap_per_key(df, "s", 5, "k")
    per = {}
    for s, _ in rows(out):
        per[s] = per.get(s, 0) + 1
    assert per == {"s0": 5, "s1": 5, "s2": 5}
    # deterministic under repartitioning (content-hash order, no RNG)
    assert rows(out) == rows(cap_per_key(df.repartition(13), "s", 5, "k"))
    # a cap above the key size keeps everything
    assert len(rows(cap_per_key(df, "s", 100, "k"))) == 90
    # with_rank exposes a total 1..cap rank per key
    ranked = cap_per_key(df, "s", 5, "k", with_rank=True)
    got = sorted((r["s"], r["rk"]) for r in ranked.collect())
    assert got == sorted((f"s{i}", rk) for i in range(3) for rk in range(1, 6))


def test_cap_per_key_rejects_nonpositive_cap(spark):
    import pytest

    from tinyerp_etl_spark.operators.sampling import cap_per_key

    df = spark.createDataFrame([(1, "a")], "k int, s string")
    with pytest.raises(ValueError, match="cap"):
        cap_per_key(df, "s", 0, "k")


def test_cap_per_key_salted_equals_unsalted(spark):
    """The two-phase salted plan is EXACT (phase 1 can never drop a
    true top-cap member), so salted and unsalted outputs must be
    identical row for row — across bucket counts coarser and finer
    than the cap, caps above the key size, and with_rank."""
    from tinyerp_etl_spark.operators.sampling import cap_per_key

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(300)], "k int, s string"
    )
    rows = lambda d: sorted(tuple(r) for r in d.collect())
    for cap in (1, 5, 40, 500):
        want = rows(cap_per_key(df, "s", cap, "k", with_rank=True))
        for b in (1, 2, 7, 64):
            got = rows(cap_per_key(df, "s", cap, "k", with_rank=True,
                                   salt_buckets=b))
            assert got == want, (cap, b)
    import pytest

    with pytest.raises(ValueError, match="salt_buckets"):
        cap_per_key(df, "s", 5, "k", salt_buckets=0)


# ------------------------------------------------------------- DSIR
def _dsir_toy(spark):
    """Target = fruit prose; raw = 4 fruit-like docs, 4 metal docs,
    1 empty doc. The fruit-like raw docs must outscore the metal
    ones (they share the target's hashed-ngram mass)."""
    target = spark.createDataFrame(
        [
            (100, "apple banana cherry apple banana"),
            (101, "banana cherry apple fruit salad"),
            (102, "cherry apple banana fruit bowl"),
        ],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "apple banana cherry snack"),
            (2, "banana cherry apple tart"),
            (3, "fruit salad apple banana"),
            (4, "cherry banana fruit bowl"),
            (5, "iron copper zinc smelter"),
            (6, "copper zinc iron ingot"),
            (7, "zinc iron copper alloy"),
            (8, "tungsten cobalt nickel ore"),
            (9, ""),
        ],
        "doc_id long, text string",
    )
    return raw, target


def test_dsir_scores_rank_target_like_docs_higher(spark):
    from tinyerp_etl_spark.operators.sampling import dsir_scores

    raw, target = _dsir_toy(spark)
    got = {r["doc_id"]: r for r in dsir_scores(raw, target).collect()}
    # the zero-gram doc carries no evidence and is absent
    assert set(got) == {1, 2, 3, 4, 5, 6, 7, 8}
    fruit = min(got[i]["score_mbits"] for i in (1, 2, 3, 4))
    metal = max(got[i]["score_mbits"] for i in (5, 6, 7, 8))
    assert fruit > metal
    # n_grams = unigrams + bigrams = 2*len - 1 for these 4-5 token docs
    assert got[1]["n_grams"] == 7 and got[3]["n_grams"] == 7


def test_dsir_scores_partitioning_invariant(spark):
    from tinyerp_etl_spark.operators.sampling import dsir_scores

    raw, target = _dsir_toy(spark)
    rows = lambda d: sorted(map(tuple, d.collect()))
    assert rows(dsir_scores(raw.repartition(7), target.coalesce(1))) == rows(
        dsir_scores(raw.coalesce(1), target.repartition(5))
    )


def test_dsir_sample_keeps_whole_tie_groups_within_budget(spark):
    from tinyerp_etl_spark.operators.sampling import dsir_sample

    raw, target = _dsir_toy(spark)
    # 8 scored docs, 50% budget = 4: the four fruit docs clear it
    out = {r["doc_id"]: r["keep"] for r in
           dsir_sample(raw, target, keep_ppm=500_000).collect()}
    assert [i for i in sorted(out) if out[i]] == [1, 2, 3, 4]
    # budget 0 keeps nothing (NULL threshold coalesces to False)
    none = dsir_sample(raw, target, keep_ppm=0)
    assert not any(r["keep"] for r in none.collect())
    # full budget keeps every scored doc
    full = dsir_sample(raw, target, keep_ppm=1_000_000)
    assert all(r["keep"] for r in full.collect())


def test_dsir_keep_ppm_validated(spark):
    import pytest

    from tinyerp_etl_spark.operators.sampling import (
        dsir_keep_threshold,
        dsir_scores,
    )

    raw, target = _dsir_toy(spark)
    with pytest.raises(ValueError, match="keep_ppm"):
        dsir_keep_threshold(dsir_scores(raw, target), 2_000_000)


def test_dsir_gate_plan_is_lint_clean(spark, sf_dir):
    from tinyerp_etl_spark.operators.planlint import plan_findings
    from tinyerp_etl_spark.plans.llm_ops import dsir_importance_sample

    assert plan_findings(dsir_importance_sample(spark, sf_dir)) == []


def test_cluster_balanced_sample_lint_and_cap(spark, sf_dir):
    from tinyerp_etl_spark.operators.planlint import plan_findings
    from tinyerp_etl_spark.plans.llm_ops import cluster_balanced_sample

    df = cluster_balanced_sample(spark, sf_dir)
    assert plan_findings(df) == []
    rows = df.collect()
    per = {}
    for r in rows:
        per[r["list_id"]] = per.get(r["list_id"], 0) + 1
    assert per and all(c <= 25 for c in per.values())
    # ranks are total 1..cap within each cluster
    got = sorted((r["list_id"], r["rk"]) for r in rows)
    want = sorted((l, i + 1) for l, c in per.items() for i in range(c))
    assert got == want
