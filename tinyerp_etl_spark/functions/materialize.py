"""Lineage-truncating materialization with a reliability seam.

Several operators re-traverse or iterate on an intermediate frame
(connected-components labels, hierarchy frontiers, tokenized corpora,
packing inputs, fixed-point joins). Re-deriving the frame from lineage
on every traversal would re-run the upstream plan N times, so they
materialize it once. Two materialization strategies exist and differ
only in failure semantics, not results:

- ``localCheckpoint`` (the default): blocks live in executor block
  managers. Fastest — no filesystem round-trip — and exactly right on
  local[N] where "executor loss" means the whole JVM died anyway. On a
  real cluster, though, a lost executor takes its blocks with it AND
  the truncated lineage means Spark cannot recompute them: a
  multi-hour job dies at hour three.
- ``checkpoint``: blocks are written to the checkpoint directory
  (HDFS/S3 on a cluster), so any executor can re-read them after a
  loss. One write + N reads of distributed storage — slower per
  materialization, but the only strategy whose failure story survives
  a 1000-executor run where *some* executor loss is a certainty.

``materialize(df)`` routes between them per session:

    spark.conf.set("spark.graft.materialize.reliable", "true")
    spark.sparkContext.setCheckpointDir("hdfs:///jobs/ckpt")  # or
    spark.conf.set("spark.graft.materialize.dir", "hdfs:///jobs/ckpt")

Both strategies produce bit-identical frames (the tests pin this), so
flipping the switch changes durability, never answers. The reference
has no analog — its single PostgreSQL transaction either commits or
rolls back (ref tiny_api_v2_cliente.py:404-413); this is the
distributed-failure counterpart the engine needs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.graft.materialize.reliable"
DIR_CONF = "spark.graft.materialize.dir"

# The DIR_CONF value materialize() itself last applied via
# setCheckpointDir. Needed because getCheckpointDir() returns the
# uuid SUBDIRECTORY Spark creates under the configured path, so the
# session conf can't be compared against it directly — and a
# repointed DIR_CONF must not be silently dead (first-use-wins).
_LAST_APPLIED_DIR: str | None = None
_WARNED_DEAD_CONF: set[str] = set()


def materialize(df: DataFrame, reliable: bool | None = None, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage.

    ``reliable=None`` (the default at every call site) consults the
    session conf ``spark.graft.materialize.reliable`` so one switch
    moves a whole pipeline onto cluster-safe checkpointing without
    touching operator code. Explicit True/False overrides per call.

    The reliable path requires a checkpoint directory — either
    ``sparkContext.setCheckpointDir`` or the session conf
    ``spark.graft.materialize.dir`` (applied on first use). It raises
    rather than silently falling back: a caller who asked for
    executor-loss durability must not get executor-local blocks.
    """
    spark = df.sparkSession
    if reliable is None:
        reliable = (
            spark.conf.get(RELIABLE_CONF, "false").strip().lower() == "true"
        )
    if not reliable:
        return df.localCheckpoint(eager=eager)
    global _LAST_APPLIED_DIR
    sc = spark.sparkContext
    target = spark.conf.get(DIR_CONF, None)
    if sc.getCheckpointDir() is None:
        if not target:
            raise ValueError(
                "reliable materialization needs a checkpoint directory: "
                "call sparkContext.setCheckpointDir(...) or set "
                f"{DIR_CONF} (a durable, executor-reachable path — "
                "HDFS/S3 on a cluster)"
            )
        sc.setCheckpointDir(target)
        _LAST_APPLIED_DIR = target
    elif target and _LAST_APPLIED_DIR is not None and target != _LAST_APPLIED_DIR:
        # the conf was repointed AFTER materialize() applied it —
        # honor the new value instead of first-use-wins-silently
        sc.setCheckpointDir(target)
        _LAST_APPLIED_DIR = target
    elif target and _LAST_APPLIED_DIR is None and target not in _WARNED_DEAD_CONF:
        # the user set the checkpoint dir directly AND the conf is
        # set to something materialize() never applied: the manual
        # call wins, but say so (once per value) — a dead DIR_CONF
        # should be loud
        import warnings

        _WARNED_DEAD_CONF.add(target)
        warnings.warn(
            f"{DIR_CONF}={target!r} is set but the checkpoint "
            f"directory was already configured directly "
            f"({sc.getCheckpointDir()!r}); the conf is ignored — "
            "unset one of the two",
            stacklevel=2,
        )
    return df.checkpoint(eager=eager)
