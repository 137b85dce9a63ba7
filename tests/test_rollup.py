"""Incremental rollup maintenance + TableStore compaction tests.

The rollup's contract is the law *incremental ≡ full recompute*,
bit-exactly, for any split of the input — that only holds because the
partial sums are exact integers (a double SUM would drift with merge
order). Compaction's contract is: same rows, fewer files, old version
intact.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from tinyerp_etl_spark.etl.rollup import merge_rollup, rollup_increment, rollup_view
from tinyerp_etl_spark.etl.table_store import TableStore
from tinyerp_etl_spark.sources.catalog import load_table


def _final(df):
    return sorted(tuple(r) for r in df.collect())


def _maintained(o, keys, n_splits):
    state = None
    for i in range(n_splits):
        inc = o.filter(F.col("o_orderkey") % n_splits == i)
        state = merge_rollup(state, rollup_increment(inc, keys, "o_totalprice"), keys)
    return _final(rollup_view(state))


def test_incremental_equals_full_recompute_for_any_split(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    keys = ["o_orderstatus"]
    full = _maintained(o, keys, 1)
    assert _maintained(o, keys, 2) == full
    assert _maintained(o, keys, 5) == full


def test_rollup_is_partitioning_invariant(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    keys = ["o_orderstatus"]
    a = _maintained(o.repartition(17), keys, 3)
    b = _maintained(o.coalesce(1), keys, 3)
    assert a == b


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    schema = StructType.fromDDL("k int, v double")
    store = TableStore(spark, str(tmp_path / "t"), schema)
    df = spark.range(1000).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 1.5).alias("v")
    )
    # three appends, each fanned out over many shuffle partitions
    for i in range(3):
        prev = store.read() if store.exists() else None
        nxt = df.filter(F.col("k") % 3 == i).repartition(8)
        store.commit(prev.unionByName(nxt) if prev is not None else nxt)
    v_before = store.current_version()
    files_before = store.data_file_count()
    assert files_before > 2

    rows_before = sorted(tuple(r) for r in store.read().collect())
    v_after = store.compact(n_files=1)
    assert v_after == v_before + 1
    assert store.data_file_count() == 1
    assert sorted(tuple(r) for r in store.read().collect()) == rows_before
    # time travel still sees the pre-compaction layout
    assert store.data_file_count(v_before) == files_before
    assert sorted(tuple(r) for r in store.read_version(v_before).collect()) == rows_before
