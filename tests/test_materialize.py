"""The reliability seam: materialize() must change durability only,
never answers — and the reliable path must be loud about its
prerequisite instead of silently handing back non-durable blocks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tinyerp_etl_spark.functions.materialize import (
    DIR_CONF,
    RELIABLE_CONF,
    materialize,
)


def _frame(spark):
    return (
        spark.range(0, 1000)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("k"),
            (F.col("id") * 37 % 101).alias("v"),
        )
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )


def _value_hash(df):
    cols = sorted(df.columns)
    return (
        df.select(F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")))
        .first()[0]
    )


def test_reliable_without_dir_raises(spark):
    """Asking for durability without a durable destination must fail
    fast, not quietly fall back to executor-local blocks."""
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already set session-wide")
    with pytest.raises(ValueError, match="checkpoint directory"):
        materialize(_frame(spark), reliable=True)


def test_dir_conf_applies_checkpoint_dir(spark, tmp_path):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("checkpoint dir already set session-wide")
    spark.conf.set(DIR_CONF, str(tmp_path / "confdir"))
    try:
        out = materialize(_frame(spark), reliable=True)
        assert out.count() == 7
        assert "confdir" in (spark.sparkContext.getCheckpointDir() or "")
    finally:
        spark.conf.unset(DIR_CONF)


def test_reliable_and_local_paths_identical(spark, tmp_path):
    """Flip the switch, get the same rows — durability is the ONLY
    difference between the two strategies."""
    local = materialize(_frame(spark))
    h_local = _value_hash(local)

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        spark.conf.set(RELIABLE_CONF, "true")
        reliable = materialize(_frame(spark))
        assert _value_hash(reliable) == h_local
        assert reliable.collect() == local.collect()
    finally:
        spark.conf.unset(RELIABLE_CONF)


def test_reliable_checkpoint_single_evaluation(spark, tmp_path):
    """The reliable path must evaluate the plan ONCE, not once for the
    action and again for the checkpoint write (the classic
    persist-before-RDD-checkpoint tax — Spark 4's Dataset.checkpoint
    doesn't pay it; this pins that, since per-iteration loops lean on
    materialize() being single-evaluation).

    The exact count is deterministic ONLY in this local[N] test
    session (no task retries, no speculation); accumulator updates in
    transformations over-count on re-executed tasks, so a retry would
    fail this pin spuriously rather than indicate a real regression."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt1x"))
    acc = spark.sparkContext.accumulator(0)

    def bump(x):
        acc.add(1)
        return x

    u = F.udf(bump, LongType())
    df = spark.range(0, 100, 1, 4).select(u(F.col("id")).alias("id"))
    out = materialize(df, reliable=True)
    assert out.count() == 100
    assert acc.value == 100


def test_explicit_override_beats_session_conf(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(RELIABLE_CONF, "true")
    try:
        # explicit False → localCheckpoint even with the switch on
        out = materialize(_frame(spark), reliable=False)
        assert out.count() == 7
    finally:
        spark.conf.unset(RELIABLE_CONF)


def test_repointed_dir_conf_reapplied(spark, tmp_path):
    """Changing spark.graft.materialize.dir AFTER materialize() has
    applied it must repoint the checkpoint dir, not die silently
    (first-use-wins was the round-6 behavior)."""
    import tinyerp_etl_spark.functions.materialize as M

    ctx = spark.sparkContext.applicationId
    a, b = str(tmp_path / "dur_a"), str(tmp_path / "dur_b")
    spark.sparkContext.setCheckpointDir(a)
    # as if materialize() itself applied a
    M._LAST_APPLIED[ctx] = (a, spark.sparkContext.getCheckpointDir())
    spark.conf.set(DIR_CONF, b)
    try:
        out = materialize(_frame(spark), reliable=True)
        assert out.count() == 7
        assert "dur_b" in (spark.sparkContext.getCheckpointDir() or "")
    finally:
        spark.conf.unset(DIR_CONF)
        M._LAST_APPLIED.pop(ctx, None)


def test_dead_dir_conf_warns_once(spark, tmp_path):
    """A DIR_CONF that loses to a manually-set checkpoint dir warns
    (once per value) instead of being silently dead."""
    import warnings

    import tinyerp_etl_spark.functions.materialize as M

    spark.sparkContext.setCheckpointDir(str(tmp_path / "manual"))
    M._LAST_APPLIED.pop(spark.sparkContext.applicationId, None)
    M._WARNED_DEAD_CONF.clear()
    spark.conf.set(DIR_CONF, str(tmp_path / "dead"))
    try:
        with pytest.warns(UserWarning, match="ignored"):
            materialize(_frame(spark), reliable=True)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            materialize(_frame(spark), reliable=True)
    finally:
        spark.conf.unset(DIR_CONF)


def test_manual_override_survives_conf_repoint(spark, tmp_path):
    """A manual setCheckpointDir made AFTER materialize() applied the
    conf must win over a later conf repoint (warned, not stomped)."""
    import tinyerp_etl_spark.functions.materialize as M

    ctx = spark.sparkContext.applicationId
    a = str(tmp_path / "conf_a")
    spark.sparkContext.setCheckpointDir(a)
    # as if materialize() applied a
    M._LAST_APPLIED[ctx] = (a, spark.sparkContext.getCheckpointDir())
    # the user now overrides directly...
    manual = str(tmp_path / "manual_m")
    spark.sparkContext.setCheckpointDir(manual)
    # ...and the conf is later repointed to b
    M._WARNED_DEAD_CONF.clear()
    spark.conf.set(DIR_CONF, str(tmp_path / "conf_b"))
    try:
        with pytest.warns(UserWarning, match="ignored"):
            materialize(_frame(spark), reliable=True)
        assert "manual_m" in (spark.sparkContext.getCheckpointDir() or "")
    finally:
        spark.conf.unset(DIR_CONF)
        M._LAST_APPLIED.pop(ctx, None)
