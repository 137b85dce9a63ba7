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
