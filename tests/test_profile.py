"""Unit tests for the single-scan column profiler (operators/profile.py).

The gate query (data_profile_orders) covers the no-null happy path at
driver scale; these exercise what the testdata can't: null counting in
both numeric and string columns, and the plan shape (no Expand, no
per-column scans).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tinyerp_etl_spark.operators.profile import profile_columns


def _profile(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, None, "b"),
            (3, 30.0, None),
            (4, 30.0, "b"),
        ],
        "id long, price double, tag string",
    ).repartition(3)
    return profile_columns(
        df,
        numeric_cols={
            "id": F.col("id"),
            "price_cents": F.round(F.col("price") * 100).cast("long"),
        },
        string_cols=["tag"],
    )


def test_profile_counts_nulls_and_distincts(spark):
    rows = {r["col_name"]: r for r in _profile(spark).collect()}
    assert set(rows) == {"id", "price_cents", "tag"}
    for r in rows.values():
        assert r["n_rows"] == 4

    assert rows["id"]["n_nulls"] == 0
    assert rows["id"]["n_distinct"] == 4
    assert (rows["id"]["min_num"], rows["id"]["max_num"]) == (1, 4)
    assert rows["id"]["min_str"] is None and rows["id"]["max_str"] is None

    assert rows["price_cents"]["n_nulls"] == 1
    assert rows["price_cents"]["n_distinct"] == 2  # 1000, 3000
    assert (rows["price_cents"]["min_num"], rows["price_cents"]["max_num"]) == (
        1000,
        3000,
    )

    assert rows["tag"]["n_nulls"] == 1
    assert rows["tag"]["n_distinct"] == 2  # a, b
    assert (rows["tag"]["min_str"], rows["tag"]["max_str"]) == ("a", "b")
    assert rows["tag"]["min_num"] is None and rows["tag"]["max_num"] is None


def test_profile_is_one_scan_no_expand(spark, sf_dir):
    from tinyerp_etl_spark.plans.registry import all_queries

    df = all_queries()["data_profile_orders"](spark, sf_dir)
    plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert plan.count("orders.parquet") == 1  # one scan for 6 columns
    assert "Expand" not in plan  # no mixed-distinct expansion


def test_profile_rejects_empty_column_set(spark):
    import pytest as _pytest

    df = spark.range(3)
    with _pytest.raises(ValueError):
        profile_columns(df, numeric_cols={}, string_cols=[])
