"""Iterative graph algorithms on DataFrames.

The engine's iterative-computation pattern: a fixed number of
join+aggregate rounds building one lazy DAG (each round = one shuffle
on the destination key, with degrees broadcast-or-co-partitioned).
All arithmetic is scaled integer ticks with floor division, so results
are bit-identical across engines and partitionings — the property that
lets a fundamentally iterative algorithm live under the differential
hash gate via an unrolled-CTE SQL oracle.

Scale: each iteration shuffles the edge list once (groupBy dst) — the
standard Pregel-on-relational shape. At 100 TB graph scale a real run
would materialize() between iterations to truncate lineage and keep
the 2×-per-round plan growth bounded; at a fixed 3 iterations the lazy
DAG is fine and keeps the operator side-effect-free.

Related: operators/dedup.py connected_components (min-label
propagation) is the other iterative op in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: PageRank ticks: pr is scaled by 1e6; damping 0.85 enters as the
#: exact rational 850/1000 so no float touches the iteration.
PR_SCALE = 1_000_000
PR_BASE = 150_000  # (1 - d) * PR_SCALE
PR_DAMP_NUM = 850
PR_DAMP_DEN = 1000


def pagerank_fixed(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Fixed-iteration PageRank over directed (src, dst) edges.

    Integer-tick update: pr'(v) = PR_BASE + (850 · Σ_u pr(u) div
    deg(u)) div 1000 over in-neighbors u. Nodes are the distinct edge
    endpoints; dangling mass is dropped (every node keeps the base
    term), matching the unrolled SQL oracle exactly.

    The DAG stays fully lazy: the edge subtree is replicated into each
    round, which measures FASTER here than a persist() pin (the
    materialization barrier costs more than the recompute at bench
    scale — measured 3.4 s lazy vs 3.7 s pinned at sf0.1). For an
    expensive edge derivation at cluster scale, persist or
    materialize() the edges before calling this.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    pr = nodes.select("node", F.lit(PR_SCALE).cast("long").alias("pr"))
    for _ in range(iterations):
        contrib = (
            edges.join(pr.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("pr div deg").alias("c"))
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        pr = nodes.join(summed, "node", "left").select(
            "node",
            (
                F.lit(PR_BASE)
                + F.expr(
                    f"({PR_DAMP_NUM} * coalesce(s, 0)) div {PR_DAMP_DEN}"
                )
            ).cast("long").alias("pr"),
        )
    return pr
