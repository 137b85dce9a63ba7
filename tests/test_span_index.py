"""Persisted span-gram index: the sequential ≡ one-shot law, the
replay contract, store-shuffle-free cleaning, and the streaming fold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tinyerp_etl_spark.operators import dedup as D
from tinyerp_etl_spark.operators import span_index as SI


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_SHARED = "alpha beta gamma delta epsilon zeta eta theta"


def test_sequential_equals_one_shot_law(spark, tmp_path):
    """With ingest-ordered doc_ids, clean-then-fold per batch must
    reproduce one-shot remove_dup_spans over the union, byte for
    byte — including cross-batch duplication, within-batch
    duplication, and a passage deleted in batch 2 re-arriving in
    batch 3 (dedup against everything SEEN, not everything KEPT)."""
    b1 = _docs(spark, [(1, f"one two {_SHARED} three"),
                       (2, "totally unique text here nothing shared at all ok")])
    b2 = _docs(spark, [(10, f"{_SHARED} five six"),
                       (11, f"head {_SHARED} tail"),
                       (12, "w1 w2 w3 w4 w5 w6 w7 w8 mid"),
                       (13, "pre w1 w2 w3 w4 w5 w6 w7 w8")])
    b3 = _docs(spark, [(20, f"{_SHARED} again"),        # seen in b1/b2
                       (21, "w1 w2 w3 w4 w5 w6 w7 w8")])  # deleted from 13, re-arrives
    path = str(tmp_path / "span")
    got = {}
    for b in (b1, b2, b3):
        for r in SI.clean_batch_against_store(spark, path, b).collect():
            got[r["doc_id"]] = tuple(r)[1:]
        SI.update_span_index(spark, path, b)
    union = b1.unionByName(b2).unionByName(b3)
    want = {r["doc_id"]: tuple(r)[1:]
            for r in D.remove_dup_spans(union).collect()}
    assert got == want


def test_replay_contract(spark, tmp_path):
    path = str(tmp_path / "span")
    b = _docs(spark, [(1, f"x {_SHARED} y"), (2, f"{_SHARED} z")])
    v = SI.update_span_index(spark, path, b)
    store = SI.span_gram_store(spark, path)
    with pytest.raises(ValueError, match="already indexed"):
        SI.update_span_index(spark, path, b)
    # full replay under skip_existing: version-preserving no-op
    assert SI.update_span_index(spark, path, b, on_overlap="skip_existing") == v
    # partial replay folds only the new doc
    mixed = b.unionByName(_docs(spark, [(5, f"q {_SHARED} r")]))
    v2 = SI.update_span_index(spark, path, mixed, on_overlap="skip_existing")
    assert v2 == v + 1
    ids = {r["doc_id"] for r in store.read().select("doc_id").distinct().collect()}
    assert ids == {1, 2, 5}


def test_sub_k_batch_is_noop(spark, tmp_path):
    path = str(tmp_path / "span")
    assert SI.update_span_index(spark, path, _docs(spark, [(1, "too short")])) == 0
    assert SI.span_gram_store(spark, path).current_version() is None


def test_clean_plan_is_store_shuffle_free(spark, tmp_path):
    """The store contributes one column-pruned scan probed by a
    broadcast semi-join — never a sort-merge (which would shuffle
    history) and no lint findings."""
    from tinyerp_etl_spark.operators.planlint import plan_findings

    path = str(tmp_path / "span")
    SI.update_span_index(spark, path, _docs(spark, [(1, f"a {_SHARED} b")]))
    out = SI.clean_batch_against_store(
        spark, path, _docs(spark, [(10, f"{_SHARED} c")])
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the STORE is only ever touched through gram_key joins — those
    # must broadcast the batch side, never sort-merge (which would
    # shuffle history). The rebuild tail's doc_id joins are
    # batch-scale and free to pick any strategy.
    assert "BroadcastHashJoin [gram_key" in plan
    assert "SortMergeJoin [gram_key" not in plan
    assert plan_findings(out) == []


def test_streaming_fold_matches_batch(spark, tmp_path, sf_dir):
    """Drain the documents table as a stream into the index; the
    store must equal a one-shot batch registration, and a replayed
    drain must be a version-preserving no-op."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "src")
    docs.limit(40).coalesce(2).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    path = str(tmp_path / "span")
    ckpt = str(tmp_path / "ckpt")
    SI.run_stream_to_span_index(spark, stream, path, ckpt)
    batch_path = str(tmp_path / "span_batch")
    SI.update_span_index(spark, path=batch_path, new_docs=docs.limit(40))
    rows = lambda p: sorted(
        tuple(r) for r in SI.span_gram_store(spark, p).read().collect()
    )
    assert rows(path) == rows(batch_path)
    v = SI.span_gram_store(spark, path).current_version()
    rerun = spark.readStream.schema("doc_id long, text string").parquet(src)
    SI.run_stream_to_span_index(spark, rerun, path, str(tmp_path / "ckpt2"))
    assert SI.span_gram_store(spark, path).current_version() == v
