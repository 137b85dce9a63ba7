"""widen_if_narrow: the scale-adaptive scan fan-out (round 14)."""

from __future__ import annotations

import os

from tinyerp_etl_spark.sources.catalog import load_table, widen_if_narrow


def test_widens_small_scan_to_default_parallelism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = widen_if_narrow(docs, sf_dir)
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    # values unchanged (round-robin moves rows, never mutates them)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in docs.collect()
    )


def test_noop_when_backing_file_is_wide(spark, sf_dir, monkeypatch):
    # a file big enough to yield >= defaultParallelism scan splits
    # must come back untouched — the cluster-scale branch adds no
    # exchange
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    max_pb = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    cores = spark.sparkContext.defaultParallelism
    monkeypatch.setattr(
        os.path, "getsize", lambda _p: max_pb * cores
    )
    assert widen_if_narrow(docs, sf_dir) is docs


def test_noop_when_backing_file_is_missing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assert widen_if_narrow(docs, "/nonexistent/dir") is docs
