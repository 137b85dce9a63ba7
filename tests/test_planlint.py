"""Plan linter: detects the three 100 TB anti-patterns, passes clean plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tinyerp_etl_spark.operators.planlint import assert_scalable_plan, plan_findings


def _base(spark):
    return spark.range(100).selectExpr("id", "id % 5 AS k")


def test_flags_unpartitioned_window(spark):
    df = _base(spark).withColumn("r", F.row_number().over(Window.orderBy("id")))
    assert any("unpartitioned window" in f for f in plan_findings(df))
    with pytest.raises(ValueError):
        assert_scalable_plan(df)


def test_passes_partitioned_window(spark):
    df = _base(spark).withColumn(
        "r", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    assert plan_findings(df) == []


def test_flags_row_at_a_time_udf(spark):
    plus_one = F.udf(lambda x: x + 1, "long")
    df = _base(spark).withColumn("u", plus_one("id"))
    assert any("BatchEvalPython" in f for f in plan_findings(df))


def test_passes_arrow_udf(spark):
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's hint resolver rejects
    plus_one = pandas_udf(lambda s: s + 1, "long")

    df = _base(spark).withColumn("u", plus_one("id"))
    assert plan_findings(df) == []


def test_flags_cartesian_product(spark):
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = spark.range(10_000)
        df = big.crossJoin(big.selectExpr("id AS j"))
        assert any("cartesian" in f for f in plan_findings(df))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)


def test_flags_unpartitioned_pandas_window(spark):
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    mean_udf = pandas_udf(
        lambda s: s.mean(), "double", PandasUDFType.GROUPED_AGG
    )
    bad = _base(spark).withColumn("m", mean_udf("id").over(Window.orderBy("k")))
    assert any("unpartitioned window" in f for f in plan_findings(bad))
    good = _base(spark).withColumn(
        "m", mean_udf("id").over(Window.partitionBy("k"))
    )
    assert plan_findings(good) == []


def test_gate_queries_are_clean(spark, sf_dir):
    # the flagship and the round-4 prefix-sum family must lint clean
    from tinyerp_etl_spark.plans.llm_ops import sequence_packing_manifest
    from tinyerp_etl_spark.plans.relational import q1_pricing_summary

    assert plan_findings(q1_pricing_summary(spark, sf_dir)) == []
    assert plan_findings(sequence_packing_manifest(spark, sf_dir)) == []


def test_ngram_decontaminate_plan_is_join_shaped(spark, sf_dir):
    """The round-9 decontamination query's design rationale IS its
    plan shape: an equi-join on the gram key (hash-partitioned by
    Spark), never a cartesian expansion, no row-at-a-time Python —
    pin it so a join-strategy regression is caught before a gate
    round."""
    from tinyerp_etl_spark.plans.llm_ops import ngram_decontaminate_docs

    # plan_findings covers the cartesian and Python-eval checks; a
    # second manual string probe would just duplicate the invariant
    assert plan_findings(ngram_decontaminate_docs(spark, sf_dir)) == []


def test_flags_sql_cache_scan(spark):
    """A plan reading a persist()/cache() entry must be flagged: the
    CacheManager never reclaims those pins (the round-9 leak class) —
    the sanctioned pin is a materialize() snapshot, which must pass."""
    from tinyerp_etl_spark.functions.materialize import materialize

    pinned = _base(spark).groupBy("k").count().persist()
    try:
        findings = plan_findings(pinned.filter(F.col("count") > 0))
        assert any("InMemoryTableScan" in f for f in findings)
    finally:
        pinned.unpersist()
    snap = materialize(_base(spark).groupBy("k").count())
    assert plan_findings(snap.filter(F.col("count") > 0)) == []


def test_passes_partition_only_window(spark):
    # partitionBy with no orderBy shows as two bracket groups too —
    # must NOT be confused with an unpartitioned ordered window
    df = _base(spark).withColumn("m", F.min("id").over(Window.partitionBy("k")))
    assert plan_findings(df) == []
