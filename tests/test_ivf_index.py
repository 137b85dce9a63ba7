"""The persisted IVF index artifact: save/load fidelity, parameter and
fingerprint invalidation, and the self-healing load-or-train path."""

from __future__ import annotations

import os

from tinyerp_etl_spark.operators.ivf_index import (
    corpus_fingerprint,
    load_ivf_index,
    load_or_train_ivf_index,
    save_ivf_index,
)
from tinyerp_etl_spark.operators.similarity import train_kmeans


def _corpus(spark, n=30):
    rows = [(i, [float(i % 5), 1.0, float(i % 3), 2.0]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_save_load_roundtrip_bit_identical(spark, tmp_path):
    emb = _corpus(spark)
    cents = train_kmeans(emb, k=4, iters=2)
    fp = corpus_fingerprint(emb)
    path = str(tmp_path / "idx")
    save_ivf_index(spark, path, cents, fp, k=4, iters=2)
    loaded = load_ivf_index(
        spark, path, expect_params=(4, 2, 4096), expect_fingerprint=fp
    )
    assert loaded == sorted(cents, key=lambda c: c[0])


def test_load_rejects_param_and_fingerprint_mismatch(spark, tmp_path):
    emb = _corpus(spark)
    cents = train_kmeans(emb, k=4, iters=2)
    fp = corpus_fingerprint(emb)
    path = str(tmp_path / "idx")
    save_ivf_index(spark, path, cents, fp, k=4, iters=2)
    # different hyperparameters -> must not reuse
    assert load_ivf_index(spark, path, expect_params=(8, 3, 4096)) is None
    # corpus changed under the artifact -> must not reuse
    assert (
        load_ivf_index(spark, path, expect_fingerprint=(fp[0] + 1, fp[1]))
        is None
    )
    # no expectations -> raw load succeeds
    assert load_ivf_index(spark, path) is not None


def test_load_or_train_self_heals_and_persists(spark, tmp_path):
    path = str(tmp_path / "idx")
    emb = _corpus(spark)
    assert load_ivf_index(spark, path) is None
    cents = load_or_train_ivf_index(spark, emb, path, k=4, iters=2)
    # second call loads the artifact (same result, no retrain visible)
    again = load_or_train_ivf_index(spark, emb, path, k=4, iters=2)
    assert again == cents
    # corpus grows -> fingerprint mismatch -> retrain + new version
    bigger = _corpus(spark, 45)
    healed = load_or_train_ivf_index(spark, bigger, path, k=4, iters=2)
    assert healed == train_kmeans(bigger, k=4, iters=2)


def test_load_or_train_invalidates_on_inplace_reembed(spark, tmp_path):
    """Re-embedding the corpus IN PLACE (same vec_ids, new values)
    must retrain — an id-only fingerprint would silently reuse the
    stale index."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "idx")
    emb = _corpus(spark)
    c1 = load_or_train_ivf_index(spark, emb, path, k=4, iters=2)
    reemb = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: (x.cast("double") * 2.0 + 1.0).cast("float")
        ).alias("embedding"),
    )
    c2 = load_or_train_ivf_index(spark, reemb, path, k=4, iters=2)
    assert c2 == train_kmeans(reemb, k=4, iters=2)
    assert c2 != c1


def test_list_partitioned_layout_prunes_directories(spark, tmp_path):
    """The at-scale layout: vectors committed hive-partitioned by
    list_id must answer an nprobe query from a PARTITION-PRUNED read
    (PartitionFilters on list_id), never a full-directory scan."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from tinyerp_etl_spark.etl.table_store import TableStore
    from tinyerp_etl_spark.operators.similarity import ivf_assign

    emb = _corpus(spark, 40)
    cents = train_kmeans(emb, k=4, iters=1)
    assigned = ivf_assign(emb, centroids=cents)
    store = TableStore(
        spark,
        str(tmp_path / "vectors"),
        StructType.fromDDL("vec_id long, embedding array<float>, list_id int"),
        partition_by=["list_id"],
    )
    store.commit(assigned.select("vec_id", "embedding", "list_id"))
    pruned = store.read().filter(F.col("list_id").isin([1, 2]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("list_id" in ln for ln in pf), plan
    got = {r["list_id"] for r in pruned.select("list_id").distinct().collect()}
    assert got <= {1, 2} and got


def test_narrow_assign_matches_aggregate_assign(spark, sf_dir):
    """ivf_assign_narrow (the per-row array_max expression) must
    reproduce ivf_assign (_assign_ticks max_by aggregation) row for
    row — including score-tie resolution to the LOWER centroid_id —
    regardless of the order the centroid index is passed in, and its
    plan must contain no Exchange (it is the streaming-legal narrow
    projection)."""
    from tinyerp_etl_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_narrow,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_kmeans(emb)
    want = {
        (r["vec_id"], r["list_id"])
        for r in ivf_assign(emb, centroids=cents)
        .select("vec_id", "list_id")
        .collect()
    }
    for order in (cents, list(reversed(cents))):
        got = {
            (r["vec_id"], r["list_id"])
            for r in ivf_assign_narrow(emb, centroids=order)
            .select("vec_id", "list_id")
            .collect()
        }
        assert got == want and len(got) > 0
    plan = (
        ivf_assign_narrow(emb, centroids=cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_narrow_assign_tie_breaks_to_lower_id(spark):
    """A vector exactly equidistant (duplicate centroids) must land in
    the LOWER centroid_id's list — the documented _assign_ticks
    contract, enforced here on the narrow expression directly."""
    from tinyerp_etl_spark.operators.similarity import ivf_assign_narrow

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    dup = [(7, [1_000_000, 0]), (3, [1_000_000, 0]), (5, [0, 1_000_000])]
    got = {
        (r["vec_id"], r["list_id"])
        for r in ivf_assign_narrow(emb, centroids=dup)
        .select("vec_id", "list_id")
        .collect()
    }
    assert got == {(1, 3), (2, 5)}


def test_verify_false_wins_over_passed_fingerprint(spark, tmp_path):
    """verify=False is the documented trust-the-artifact mode: a
    caller that ALSO passes a (mismatching) fingerprint must still
    load the persisted index, not silently re-enable verification
    and retrain."""
    from tinyerp_etl_spark.operators.ivf_index import embedding_content

    emb = _corpus(spark)
    cents = train_kmeans(emb, k=4, iters=2)
    fp = corpus_fingerprint(emb, content=embedding_content())
    path = str(tmp_path / "idx")
    save_ivf_index(spark, path, cents, fp, k=4, iters=2)

    wrong_fp = (fp[0] + 1, fp[1] + 1)
    got = load_or_train_ivf_index(
        spark, emb, path, k=4, iters=2, verify=False, fingerprint=wrong_fp
    )
    assert got == sorted(cents, key=lambda c: c[0])
    # and verify=True with the same wrong fingerprint DOES retrain
    # (persisting under the wrong_fp caller-supplied fingerprint)
    got2 = load_or_train_ivf_index(
        spark, emb, path, k=4, iters=2, verify=True, fingerprint=wrong_fp
    )
    assert got2 == sorted(cents, key=lambda c: c[0])  # same corpus, same train
    assert (
        load_ivf_index(
            spark, path, expect_params=(4, 2, 4096), expect_fingerprint=wrong_fp
        )
        is not None
    )


def test_gc_artifact_dirs_removes_only_dead_tags(tmp_path):
    from tinyerp_etl_spark.plans.llm_ops import gc_artifact_dirs

    kind = tmp_path / "ivf_index"
    for tag in ("sf0.1-aaaa1111", "sf0.1-bbbb2222", "docs-cccc3333"):
        (kind / tag).mkdir(parents=True)
        (kind / tag / "marker").write_text("x")
    removed = gc_artifact_dirs(str(kind), {"sf0.1-bbbb2222", "docs-cccc3333"})
    assert removed == ["sf0.1-aaaa1111"]
    assert sorted(os.listdir(kind)) == ["docs-cccc3333", "sf0.1-bbbb2222"]
    # idempotent and safe on a missing root
    assert gc_artifact_dirs(str(kind), {"sf0.1-bbbb2222", "docs-cccc3333"}) == []
    assert gc_artifact_dirs(str(tmp_path / "nope"), set()) == []


def test_roundtrip_gate_reports_diagnostic_on_load_failure(
    spark, sf_dir, monkeypatch
):
    """When the committed artifact cannot be loaded, the gate query
    must emit the in-process centroid rows with persisted_match=false
    — the intended diagnostic — not an empty frame whose only signal
    is a row-count mismatch."""
    from tinyerp_etl_spark.operators import ivf_index as IX
    from tinyerp_etl_spark.plans.llm_ops import ivf_index_roundtrip

    baseline = ivf_index_roundtrip(spark, sf_dir).collect()
    assert baseline and all(r["persisted_match"] for r in baseline)

    monkeypatch.setattr(IX, "load_ivf_index", lambda *a, **kw: None)
    broken = ivf_index_roundtrip(spark, sf_dir).collect()
    assert len(broken) == len(baseline)
    assert all(not r["persisted_match"] for r in broken)
    assert [(r["centroid_id"], r["dim"], r["tick"]) for r in broken] == [
        (r["centroid_id"], r["dim"], r["tick"]) for r in baseline
    ]
