"""Threshold-gated compaction through the PRODUCTION fold cadence.

Round-12's probe proved the two halves of the span-store pushdown
story separately (SCALE.md "Span key-set pushdown"): the AS-FOLDED
layout prunes ~nothing against a spread key probe (every fold
re-tiles the full xxhash64 domain, so a probed key lands inside one
unit of EVERY fold — the scan touches O(folds) units per key, and a
realistic 58-key probe touched 320/320) while the COMPACTED global
tiling prunes 97.2 % — but nothing in production ever called
``maybe_compact``, so the measured win was unreachable. This file
pins that the fold paths themselves now reach the compacted layout:
fold until the threshold trips, audit the parquet footer stats the
In() pushdown actually consults, and prove contents/contracts survive
the rewrite.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tinyerp_etl_spark.etl.fold import fold_append
from tinyerp_etl_spark.etl.table_store import ConcurrentWriteError, TableStore
from tinyerp_etl_spark.operators import span_index as SI


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _key_units(version_dir: str, column: str) -> list[tuple]:
    """(min, max) per parquet ROW GROUP for ``column`` — the exact
    footer statistics the key-set In() pushdown consults."""
    units = []
    for path in sorted(
        glob.glob(f"{version_dir}/**/*.parquet", recursive=True)
    ):
        f = pq.ParquetFile(path)
        for rg in range(f.metadata.num_row_groups):
            meta = f.metadata.row_group(rg)
            for ci in range(meta.num_columns):
                col = meta.column(ci)
                if (
                    col.path_in_schema == column
                    and col.statistics is not None
                ):
                    units.append((col.statistics.min, col.statistics.max))
    return units


def _batch(i: int, n: int = 40):
    """n docs of unique 10-word texts; doc_ids strictly increase with
    i (the span store's ingest-order contract)."""
    return [
        (i * 1000 + j, " ".join(f"b{i}d{j}w{w}" for w in range(10)))
        for j in range(n)
    ]


def test_span_fold_cadence_compacts_and_restores_pruning(spark, tmp_path):
    """Fold batches through update_span_index (the production path)
    until the threshold trips. Before the trip each fold's files tile
    the hash domain AGAIN, so a probed key hits one unit per fold
    (O(folds) scan units per key — the round-12 finding); after, the
    layout is ONE global gram_key tiling: unit ranges are disjoint, a
    probed key hits at most one unit, and the store's contents are
    identical (replay, ingest-order, and the clean path survive the
    rewrite)."""
    path = str(tmp_path / "span")
    store = SI.span_gram_store(spark, path)
    # folds 1-2 with maintenance DISABLED: the honest as-folded control
    SI.update_span_index(
        spark, path, _docs(spark, _batch(1)), compact_max_files=None
    )
    SI.update_span_index(
        spark, path, _docs(spark, _batch(2)), compact_max_files=None
    )
    v2 = store.current_version()
    assert store.data_file_count(v2) == 2 * SI.SPAN_FILES
    pre_rows = sorted(tuple(r) for r in store.read_version(v2).collect())
    probe_keys = [
        r["gram_key"]
        for r in store.read_version(v2)
        .select("gram_key")
        .limit(5)
        .collect()
    ]
    cols = store.read_version(v2).columns
    units_before = _key_units(store._version_dir(v2), "gram_key")
    hits_before = [
        sum(1 for lo, hi in units_before if lo <= k <= hi)
        for k in probe_keys
    ]
    # every fold re-tiles the domain: ~one straddling unit PER FOLD
    # (a key can fall in a stats GAP of the other fold's tiling, so
    # assert the aggregate pathology, not an exact per-key count)
    assert max(hits_before) >= 2
    assert sum(hits_before) >= len(probe_keys) + 3

    # fold 3 pushes 16+8 = 24 files past max_files=10 -> compaction
    # runs INSIDE the fold and the returned version is the compacted
    # one ("the current version containing my fold")
    v3 = SI.update_span_index(
        spark,
        path,
        _docs(spark, _batch(3)),
        compact_max_files=10,
        compact_n_files=6,
    )
    assert v3 == store.current_version()
    assert store.data_file_count(v3) == 6
    # production-default retention (SPAN_VACUUM_RETAIN=3) ran with
    # the compaction: the PRE-FOLD current (v2 — what a concurrent
    # reader or racing fold would have claimed), the append, and the
    # compacted version remain; anything older is reaped and time
    # travel to it raises — the documented trade of a rebuildable
    # derived store
    assert store.versions() == [v3 - 2, v3 - 1, v3]
    assert v3 - 2 == v2  # the claimed snapshot survives the fold
    import pytest as _pt

    with _pt.raises(ValueError):
        store.read_version(1)
    units_after = _key_units(store._version_dir(v3), "gram_key")
    # one GLOBAL tiling: unit ranges are pairwise non-overlapping...
    spans = sorted(units_after)
    assert all(
        spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1)
    )
    # ...so each probed key hits at most ONE unit — the stats-level
    # prune the 100 TB clean path depends on (97.2 % in the probe)
    hits_after = [
        sum(1 for lo, hi in units_after if lo <= k <= hi)
        for k in probe_keys
    ]
    assert max(hits_after) <= 1
    # contents: the compacted version holds exactly the pre-compaction
    # rows plus fold 3's batch
    post_rows = sorted(
        tuple(r)
        for r in store.read_version(v3)
        .join(
            spark.range(3000, 4000).select(F.col("id").alias("doc_id")),
            "doc_id",
            "left_anti",
        )
        .select(*cols)
        .collect()
    )
    assert post_rows == pre_rows
    # the contracts survive the rewrite: replay is still a
    # version-preserving no-op and the clean path still removes
    # history-duplicated spans
    assert (
        SI.update_span_index(
            spark,
            path,
            _docs(spark, _batch(3)),
            on_overlap="skip_existing",
        )
        == v3
    )
    dup = _docs(
        spark, [(9001, _batch(1)[0][1] + " trailing fresh words")]
    )
    cleaned = SI.clean_batch_against_store(spark, path, dup).collect()
    assert len(cleaned) == 1 and cleaned[0]["n_removed_tokens"] >= SI.SPAN_K


def test_fold_compaction_losing_the_race_is_swallowed(
    spark, tmp_path, monkeypatch
):
    """Compaction racing a concurrent fold must not fail the fold:
    the append already landed, so a ConcurrentWriteError from the
    maintenance rewrite is swallowed and the appended version
    returns; the winner's next fold re-checks the (still exceeded)
    threshold."""
    schema = "k long, v long"
    store = TableStore(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([], schema).schema,
    )

    def boom(**_kw):
        raise ConcurrentWriteError("raced")

    monkeypatch.setattr(store, "maybe_compact", boom)
    df1 = spark.createDataFrame([(1, 1)], schema)
    df2 = spark.createDataFrame([(2, 2)], schema)

    def fresh(stored, batch):
        return batch.join(stored.select("k"), "k", "left_anti")

    v1 = fold_append(store, df1, fresh, n_files=1, compact_max_files=0)
    v2 = fold_append(store, df2, fresh, n_files=1, compact_max_files=0)
    assert (v1, v2) == (1, 2)
    assert sorted(tuple(r) for r in store.read().collect()) == [
        (1, 1),
        (2, 2),
    ]


def test_bm25_fold_cadence_compacts_postings(spark, tmp_path, monkeypatch):
    """The BM25 postings fold reaches the globally token-tiled layout
    through its own production path, the torn-state machinery still
    sees agreeing fingerprints afterwards, and retrieval is unchanged
    by the rewrite."""
    from tinyerp_etl_spark.operators import bm25_index as B

    monkeypatch.setattr(B, "POSTINGS_COMPACT_MAX_FILES", 10)
    monkeypatch.setattr(B, "POSTINGS_COMPACT_FILES", 4)
    path = str(tmp_path / "bm25")
    b1 = _docs(spark, _batch(1, n=30))
    b2 = _docs(spark, _batch(2, n=30))
    B.save_bm25_index(spark, path, b1)
    store = TableStore(spark, f"{path}/postings", B.BM25_POSTINGS_SCHEMA)
    assert store.data_file_count() == B.POSTINGS_FILES
    # the fold appends POSTINGS_FILES more (16 > 10) -> compact to 4
    B.update_bm25_index(spark, path, b2)
    assert store.data_file_count() == 4
    # production-default retention (POSTINGS_VACUUM_RETAIN=3) ran
    # with the compaction: the pre-fold current (bootstrap v1 — the
    # version a concurrent reader would have claimed, and the one the
    # divergence repair time-travels to) survives THIS fold
    assert store.versions() == [1, 2, 3]
    spans = sorted(
        _key_units(store._version_dir(store.current_version()), "token")
    )
    assert all(
        spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1)
    )
    # the compacted index loads (fingerprint agreement) and retrieves
    loaded = B.load_bm25_index(spark, path)
    assert loaded is not None
    postings, stats = loaded
    assert stats["n_docs"] == 60
    hits = B.bm25i_topk_indexed(
        postings, stats, ["b2d5w3", "b2d5w4"], k=3
    ).collect()
    assert hits and hits[0]["doc_id"] == 2005
    # a further fold keeps folding normally on the compacted base —
    # it appends 16 more files (20 > 10), so it compacts AND reaps:
    # only now does v1 age beyond the newest three and get vacuumed
    B.update_bm25_index(spark, path, _docs(spark, _batch(3, n=5)))
    _, stats3 = B.load_bm25_index(spark, path)
    assert stats3["n_docs"] == 65
    assert store.versions() == [3, 4, 5]
    import pytest as _pt

    with _pt.raises(ValueError):
        store.read_version(1)


def test_para_fold_cadence_compacts(spark, tmp_path, monkeypatch):
    """The paragraph first-occurrence fold reaches the compacted
    globally para-tiled layout through its production path with
    first-occurrence semantics intact."""
    from tinyerp_etl_spark.operators import para_index as P
    from tinyerp_etl_spark.operators.dedup import build_paragraph_index

    monkeypatch.setattr(P, "PARA_COMPACT_MAX_FILES", 6)
    monkeypatch.setattr(P, "PARA_COMPACT_FILES", 2)
    def para(tag):
        return " ".join(f"{tag}w{i}" for i in range(8))

    pa, pb = para("pa"), para("pb")
    # enough distinct paragraphs per batch to fill all 4 fold files
    b1 = [(d, " ".join(para(f"b1d{d}p{j}") for j in range(4)))
          for d in range(1, 9)] + [(9, pa + " " + pb), (10, pb)]
    b2 = [(d, " ".join(para(f"b2d{d}p{j}") for j in range(4)))
          for d in range(20, 28)] + [(28, pb + " " + para("pc"))]
    path = str(tmp_path / "para")
    P.fold_batch_into_paragraph_index(spark, path, _docs(spark, b1))
    store = P.para_store(spark, path)
    assert store.data_file_count() == 4
    # 4+4 = 8 > 6 -> compaction to 2 inside the fold
    P.fold_batch_into_paragraph_index(spark, path, _docs(spark, b2))
    assert store.data_file_count() == 2
    # production-default retention (PARA_VACUUM_RETAIN=3) ran with
    # the compaction: all three versions are within the window, so
    # nothing reaps yet — the pre-fold current (v1) survives the
    # fold that compacts (the reap itself is witnessed on the span
    # and BM25 cadences above)
    assert store.versions() == [1, 2, 3]
    idx = {r["para"]: r["first_doc"] for r in store.read().collect()}
    assert idx[pa] == 9 and idx[pb] == 9  # first occurrences survived
    assert idx[para("pc")] == 28
    # fold-then-compact still equals the from-scratch rebuild
    rebuilt = {
        r["para"]: r["first_doc"]
        for r in build_paragraph_index(_docs(spark, b1 + b2)).collect()
    }
    assert idx == rebuilt


def test_fold_vacuum_after_compaction_reaps_old_versions(spark, tmp_path):
    """Opt-in retention: a compaction materializes a full fresh copy
    (appends only hard-link), so the fold can reap versions beyond
    retain_last right after the rewrite — and ONLY then (the
    append-only path never vacuums; hard links cost nothing)."""
    schema = "k long, v long"
    store = TableStore(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([], schema).schema,
    )

    def fresh(stored, batch):
        return batch.join(stored.select("k"), "k", "left_anti")

    def fold(i, **kw):
        return fold_append(
            store,
            spark.createDataFrame([(i, i)], schema),
            fresh,
            n_files=1,
            **kw,
        )

    fold(1)
    fold(2)  # appends: no compaction, no vacuum -> all versions kept
    assert store.versions() == [1, 2]
    v = fold(3, compact_max_files=2, compact_n_files=1, vacuum_retain=2)
    # append -> v3, compaction -> v4, vacuum keeps the newest 2
    assert v == 4 and store.versions() == [3, 4]
    assert sorted(r["k"] for r in store.read().collect()) == [1, 2, 3]
    # reaped versions are gone for time travel (the documented trade)
    import pytest as _pt

    with _pt.raises(ValueError):
        store.read_version(1).collect()
