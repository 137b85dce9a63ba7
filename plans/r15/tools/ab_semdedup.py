"""Interleaved A/B: semantic_dedup pin shapes (VERDICT r14 #3).

V0 (current): eager FULL-WIDTH pin of the aggregate-form ivf_assign —
   count(1) pays the x8 crossjoin exchange + a fat (id, vec, list_id)
   checkpoint write (driver count 0.67 -> 1.09 regression).
V1: narrow pin of the aggregate form (id, list_id only) + join the
   vectors back for the pair path.
V2: narrow pin of the zero-shuffle ivf_assign_expr projection
   (bit-identical assignments, pinned by test) + join-back attach;
   cluster-cap via a broadcast <=n_lists sizes frame instead of a
   window.

Checks identical query output in-process, then interleaved count()/
noop timing per variant.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from pyspark.sql import DataFrame, functions as F

import tinyerp_etl_spark.operators.similarity as S
from tinyerp_etl_spark.functions.materialize import materialize
from tinyerp_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _tail(assigned_narrow: DataFrame, base: DataFrame, threshold, id_col, with_quarantine, quarantined):
    """Shared pair-join + kept-flag tail over (id, vec, list_id) base."""
    left = base.select(
        F.col(id_col).alias("__id_a"), F.col("__vt").alias("__ta"),
        "list_id", F.col("__n2").alias("__n2_a"),
    )
    right = base.select(
        F.col(id_col).alias("__id_b"), F.col("__vt").alias("__tb"),
        "list_id", F.col("__n2").alias("__n2_b"),
    )
    score = (
        S._ticks_dot(F.col("__ta"), F.col("__tb"))
        / F.sqrt(F.col("__n2_a").cast("double") * F.col("__n2_b").cast("double"))
    ).cast("double")
    dropped = (
        left.hint("shuffle_hash")
        .join(right.hint("shuffle_hash"), "list_id")
        .filter(F.col("__id_b") < F.col("__id_a"))
        .filter(score >= threshold)
        .select(F.col("__id_a").alias(id_col))
        .distinct()
    )
    result = (
        assigned_narrow.select(id_col, "list_id")
        .join(dropped.withColumn("__dropped", F.lit(True)), id_col, "left")
        .select(
            id_col, "list_id",
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
        )
    )
    if not with_quarantine:
        return result
    return result.join(quarantined, id_col, "left_anti"), quarantined


def semdedup_v1(embeddings, threshold=0.95, id_col="vec_id", vec_col="embedding",
                cluster_cap=1024, with_quarantine=False, centroids=None):
    assigned = materialize(
        S.ivf_assign(embeddings, id_col, vec_col, centroids=centroids)
        .select(id_col, "list_id")
    )
    wb = S.Window.partitionBy("list_id")
    tagged = assigned.withColumn("__n", F.count(F.lit(1)).over(wb))
    ok = tagged.filter(F.col("__n") <= cluster_cap).drop("__n")
    quarantined = (
        tagged.filter(F.col("__n") > cluster_cap).select(F.col(id_col)).distinct()
    )
    base = (
        ok.join(embeddings.select(id_col, vec_col), id_col)
        .withColumn("__vt", S._q(F.col(vec_col)))
        .withColumn("__n2", S._ticks_norm2(F.col("__vt")))
    )
    return _tail(assigned, base, threshold, id_col, with_quarantine, quarantined)


def semdedup_v2(embeddings, threshold=0.95, id_col="vec_id", vec_col="embedding",
                cluster_cap=1024, with_quarantine=False, centroids=None):
    if centroids is None:
        centroids = S.train_kmeans(embeddings, id_col=id_col, vec_col=vec_col)
    assigned = materialize(
        embeddings.select(F.col(id_col), S.ivf_assign_expr(vec_col, centroids))
    )
    sizes = assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("__n"))
    ok_narrow = assigned.join(
        F.broadcast(sizes.filter(F.col("__n") <= cluster_cap).select("list_id")),
        "list_id",
    )
    quarantined = (
        assigned.join(
            F.broadcast(sizes.filter(F.col("__n") > cluster_cap).select("list_id")),
            "list_id",
        ).select(F.col(id_col)).distinct()
    )
    base = (
        embeddings.select(id_col, vec_col).join(ok_narrow, id_col)
        .withColumn("__vt", S._q(F.col(vec_col)))
        .withColumn("__n2", S._ticks_norm2(F.col("__vt")))
    )
    return _tail(assigned, base, threshold, id_col, with_quarantine, quarantined)


def main() -> None:
    spark = get_spark("ab-semdedup")
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()
    from tinyerp_etl_spark.plans import llm_ops as L

    v0 = S.semantic_dedup
    variants = {"v0": v0, "v1": semdedup_v1, "v2": semdedup_v2}

    def q():
        return L.LLM_QUERIES["semantic_dedup_embeddings"](spark, SF_DIR)

    ref = None
    for name, impl in variants.items():
        S.semantic_dedup = impl
        rows = sorted(tuple(r) for r in q().collect())
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{name} differs from v0 ({len(rows)} vs {len(ref)})"
        print(f"{name}: {len(rows)} rows OK")

    res: dict[str, float] = {}
    for _p in range(3):
        for name, impl in variants.items():
            S.semantic_dedup = impl
            spark.sparkContext.setJobDescription(f"ab:{name}:count")
            t0 = time.perf_counter()
            q().count()
            res[f"{name}_count"] = min(res.get(f"{name}_count", 1e9), time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"ab:{name}:noop")
            t0 = time.perf_counter()
            q().write.format("noop").mode("overwrite").save()
            res[f"{name}_noop"] = min(res.get(f"{name}_noop", 1e9), time.perf_counter() - t0)
    S.semantic_dedup = v0
    print({k: round(v, 3) for k, v in sorted(res.items())})


if __name__ == "__main__":
    main()
