"""Bucketed co-located joins: the no-shuffle fact-fact join.

At 100 TB the orders⋈lineitem shuffle is the dominant cost of every
header/detail query. Bucketing both tables by the join key at write
time makes the join shuffle-free forever after — this test proves the
engine's layout actually buys that plan (no Exchange above the scans).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tinyerp_etl_spark.sources.catalog import load_table
from tests.test_plan_shapes import plan_of


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    n_buckets = 8
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    # at test scale Catalyst would broadcast the small side, which
    # hides the property under test (bucket co-location); a 100 TB
    # fact-fact join has no broadcastable side
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(orders_b)
        li = spark.table(lineitem_b)
        joined = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("sum_qty"))
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "SelectedBucketsCount" in plan, plan
        # the ONLY Exchange allowed is the final groupBy's — the join
        # consumes the bucketed layout directly, shuffle-free (count in
        # simple mode: formatted lists every operator twice)
        assert plan_of(joined, "simple").count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    o = spark.table(orders_b)
    li = spark.table(lineitem_b)
    got = {
        r["o_orderstatus"]: r["n"]
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    o2 = load_table(spark, sf_dir, "orders")
    li2 = load_table(spark, sf_dir, "lineitem")
    want = {
        r["o_orderstatus"]: r["n"]
        for r in o2.join(li2, o2.o_orderkey == li2.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_clustered_write_produces_disjoint_rowgroup_stats(spark, sf_dir, tmp_path):
    """cluster_by must yield tight, non-overlapping parquet min/max
    stats on the cluster column — the precondition for row-group
    skipping on selective reads."""
    import glob

    import pyarrow.parquet as pq

    from tinyerp_etl_spark.etl.table_store import TableStore
    from tinyerp_etl_spark.sources.catalog import TABLES, load_table

    orders = load_table(spark, sf_dir, "orders")
    store = TableStore(spark, str(tmp_path / "orders_clustered"), TABLES["orders"])
    store.commit(orders, n_files=4, cluster_by=["o_orderkey"])

    ranges = []
    for f in glob.glob(f"{store.path}/v*/**/*.parquet", recursive=True):
        meta = pq.ParquetFile(f).metadata
        schema_names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        ci = schema_names.index("o_orderkey")
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(ci).statistics
            ranges.append((st.min, st.max))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping row-group ranges {(lo1,hi1)} {(lo2,hi2)}"

    # and the read path still returns the same table
    assert store.read().count() == orders.count()
