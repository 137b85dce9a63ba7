"""JDBC sink round-trip tests against embedded Derby (bundled with
Spark). Mirrors the reference's PostgreSQL sink contract: batched
insert, idempotent upsert, parallel partitioned read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tinyerp_etl_spark.etl.jdbc_sink import read_jdbc, upsert_jdbc, write_jdbc
from tinyerp_etl_spark.sources.catalog import load_table

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture()
def url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("no embedded Derby driver on the Spark classpath")
    return _derby_url(tmp_path)


def test_jdbc_write_read_roundtrip(spark, sf_dir, url):
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(200)
    )
    write_jdbc(orders, url, "orders_sink", mode="overwrite", driver=DERBY_DRIVER)
    back = read_jdbc(
        spark,
        url,
        "orders_sink",
        driver=DERBY_DRIVER,
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=10_000_000,
        num_partitions=4,
    )
    assert back.count() == 200
    want = orders.agg(F.sum("o_totalprice")).first()[0]
    got = back.agg(F.sum("o_totalprice")).first()[0]
    assert abs(want - got) < 1e-6
    # the partitioned read really split into parallel scans
    assert back.rdd.getNumPartitions() == 4


def test_jdbc_upsert_is_idempotent_and_merges(spark, url):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    upsert_jdbc(base, url, "entity", keys=["id"], driver=DERBY_DRIVER)
    # update one key, insert one new key
    inc = spark.createDataFrame(
        [(2, "b2", 22.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    upsert_jdbc(inc, url, "entity", keys=["id"], driver=DERBY_DRIVER)
    got = {
        (r["id"], r["name"], r["v"])
        for r in read_jdbc(spark, url, "entity", driver=DERBY_DRIVER).collect()
    }
    assert got == {(1, "a", 10.0), (2, "b2", 22.0), (3, "c", 30.0), (4, "d", 40.0)}
    # at-least-once: replaying the same increment changes nothing
    upsert_jdbc(inc, url, "entity", keys=["id"], driver=DERBY_DRIVER)
    again = {
        (r["id"], r["name"], r["v"])
        for r in read_jdbc(spark, url, "entity", driver=DERBY_DRIVER).collect()
    }
    assert again == got


def test_jdbc_upsert_key_only_table(spark, url):
    """A table whose whole row is the key (link/membership tables)
    degenerates to insert-if-absent: the MERGE must drop its WHEN
    MATCHED clause (an empty UPDATE SET is a syntax error)."""
    edges = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    upsert_jdbc(edges, url, "edges", keys=["a", "b"], driver=DERBY_DRIVER)
    # replay + one new edge: no dup rows, new edge lands
    inc = spark.createDataFrame([(1, 3), (2, 4)], "a long, b long")
    upsert_jdbc(inc, url, "edges", keys=["a", "b"], driver=DERBY_DRIVER)
    got = {
        (r["a"], r["b"])
        for r in read_jdbc(spark, url, "edges", driver=DERBY_DRIVER).collect()
    }
    assert got == {(1, 2), (1, 3), (2, 4)}


def test_write_jdbc_forwards_credentials(spark, monkeypatch):
    # user/password must reach the executor-side jdbc() properties —
    # against an authenticating database the distributed staging write
    # fails without them (the driver-side MERGE leg alone is not enough)
    from pyspark.sql.readwriter import DataFrameWriter

    from tinyerp_etl_spark.etl.jdbc_sink import write_jdbc

    captured = {}

    def fake_jdbc(self, url, table, mode=None, properties=None):
        captured.update(url=url, table=table, properties=properties)

    monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc)
    write_jdbc(
        spark.range(3),
        "jdbc:fake:mem",
        "t",
        driver="org.example.Driver",
        properties={"user": "u", "password": "p"},
    )
    assert captured["properties"] == {
        "user": "u",
        "password": "p",
        "driver": "org.example.Driver",
    }
