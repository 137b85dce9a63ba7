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

# Per-SparkContext record of the DIR_CONF value materialize() last
# applied via setCheckpointDir and the getCheckpointDir() result that
# apply produced (keyed by applicationId — checkpoint dirs are
# context state, and a second context in the same process must not
# make the first context's conf-applied dir look manually set). The
# pair is needed because getCheckpointDir() returns the uuid
# SUBDIRECTORY Spark creates under the configured path, so the
# session conf can't be compared against it directly — and BOTH
# directions must stay loud: a repointed DIR_CONF must not be
# silently dead (first-use-wins), and a manual setCheckpointDir made
# after materialize() applied the conf must not be silently stomped
# by a later conf repoint (the current dir differing from the
# recorded apply result is how the manual call is detected).
_LAST_APPLIED: dict[str, tuple[str, str | None]] = {}
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
    sc = spark.sparkContext
    ctx = sc.applicationId
    target = spark.conf.get(DIR_CONF, None)
    cur = sc.getCheckpointDir()
    applied = _LAST_APPLIED.get(ctx)
    if cur is None:
        if not target:
            raise ValueError(
                "reliable materialization needs a checkpoint directory: "
                "call sparkContext.setCheckpointDir(...) or set "
                f"{DIR_CONF} (a durable, executor-reachable path — "
                "HDFS/S3 on a cluster)"
            )
        sc.setCheckpointDir(target)
        _LAST_APPLIED[ctx] = (target, sc.getCheckpointDir())
    elif applied is None or cur != applied[1]:
        # the current dir is NOT the one materialize() last applied:
        # the user set it directly (before first use, or overriding a
        # previously-applied conf). The manual call wins — but a
        # DIR_CONF that is now dead should be loud (once per value),
        # whatever order the two settings happened in.
        if target and target not in _WARNED_DEAD_CONF:
            import warnings

            _WARNED_DEAD_CONF.add(target)
            warnings.warn(
                f"{DIR_CONF}={target!r} is set but the checkpoint "
                f"directory was configured directly ({cur!r}); the "
                "conf is ignored — unset one of the two",
                stacklevel=2,
            )
    elif target and target != applied[0]:
        # the conf was repointed AFTER materialize() applied it (and
        # nobody set the dir manually in between) — honor the new
        # value instead of first-use-wins-silently
        sc.setCheckpointDir(target)
        _LAST_APPLIED[ctx] = (target, sc.getCheckpointDir())
    # Classic RDD lore says persist-before-checkpoint or the write job
    # recomputes the plan; Spark 4's Dataset.checkpoint does NOT pay
    # that tax (accumulator-pinned by test_reliable_checkpoint_single_
    # evaluation — n evaluations, not 2n), so no defensive persist here.
    return df.checkpoint(eager=eager)


def sort_after_pin(df: DataFrame, *cols) -> DataFrame:
    """Global sort over a PINNED frame — the presentation ``orderBy``
    for an expensive map-only (un-exchanged) chain.

    A rangepartitioning Exchange derives its sort boundaries by
    SAMPLING its child, then runs the child again as the shuffle map
    stage — so a chain with no exchange of its own below a global
    sort executes TWICE per action (optimization round 14, guide
    §1.4/§2: measured on the Arrow repetition summary at sf0.1,
    noop-sink 5.4 s → 2.3 s once pinned; the count() track never saw
    it because Catalyst drops a sort under count). Aggregated or
    joined plans already end in a shuffle stage the sampler reads
    back cheaply, so they don't need — and shouldn't pay — the pin.
    At cluster scale the trade is one materialization of the (small,
    post-projection) output versus re-running the corpus-wide
    tokenize/Arrow chain a second time.
    """
    return materialize(df).orderBy(*cols)
