"""Scale-probe the r14/r15 pins at 10x rows (VERDICT r14 #9).

Each pin trades recompute for a bounded materialization; this probe
confirms the bound at 10x input rows with measured walls. Synthetic
10x tables = the sf0.1 table unioned 10 times with shifted ids,
REPARTITIONED before the probe (the SCALE.md probe rule: an
explode-multiplied corpus inherits the base scan's partitioning) and
written as DIRECTORY-backed parquet (which also exercises the r15
widen_if_narrow directory probe on real multi-part layout).

Probes:
- semantic_dedup narrow assignment pin (r15 shape): pin rows = input
  vectors; wall at 1x vs 10x embeddings.
- jaccard_counts shingle pin: pin rows = corpus shingle occurrences;
  wall of jaccard_pairs at 1x vs 10x docs (pairs-driven probe set).
- copurchase edge pin: pin rows = support-filtered co-pair edges;
  wall of the pinned edge derivation at 1x vs 10x lineitem.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from pyspark.sql import functions as F

import tinyerp_etl_spark.operators.similarity as S
from tinyerp_etl_spark.functions.materialize import materialize
from tinyerp_etl_spark.operators import dedup as D
from tinyerp_etl_spark.session import get_spark
from tinyerp_etl_spark.sources.catalog import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stage_10x(spark, scratch, name, id_col):
    base = load_table(spark, SF_DIR, name)
    m = base.agg(F.max(id_col)).first()[0] + 1
    parts = [
        base.withColumn(id_col, F.col(id_col) + F.lit(i * m))
        for i in range(10)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    path = os.path.join(scratch, f"{name}.parquet")
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def wall(fn, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("scale-probe-pins")
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()
    scratch = tempfile.mkdtemp(prefix="scale10x_")
    try:
        # ---- semantic_dedup (r15 narrow pin)
        emb1 = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        p = stage_10x(spark, scratch, "embeddings", "vec_id")
        emb10 = spark.read.parquet(p).select("vec_id", "embedding")
        n1, n10 = emb1.count(), emb10.count()
        w1 = wall(lambda: S.semantic_dedup(emb1, threshold=0.95)
                  .write.format("noop").mode("overwrite").save())
        w10 = wall(lambda: S.semantic_dedup(emb10, threshold=0.95)
                   .write.format("noop").mode("overwrite").save())
        print(f"semantic_dedup: rows {n1} -> {n10}, noop wall {w1:.2f} -> {w10:.2f} s "
              f"(pin rows == input vectors, narrow 2-col)")

        # ---- jaccard shingle pin
        docs1 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        pd_ = stage_10x(spark, scratch, "documents", "doc_id")
        docs10 = spark.read.parquet(pd_).select("doc_id", "text")
        pairs1 = docs1.select(F.col("doc_id").alias("doc_a"),
                              (F.col("doc_id") + 1).alias("doc_b")).limit(2000)
        pairs10 = docs10.select(F.col("doc_id").alias("doc_a"),
                                (F.col("doc_id") + 1).alias("doc_b")).limit(2000)
        j1 = wall(lambda: D.jaccard_pairs(docs1, pairs1)
                  .write.format("noop").mode("overwrite").save())
        j10 = wall(lambda: D.jaccard_pairs(docs10, pairs10)
                   .write.format("noop").mode("overwrite").save())
        print(f"jaccard_pairs (shingle pin): docs x10, same 2000-pair probe, "
              f"noop wall {j1:.2f} -> {j10:.2f} s (pin rows == corpus shingle occurrences)")

        # ---- copurchase edge pin
        pl = stage_10x(spark, scratch, "lineitem", "l_orderkey")
        li1 = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
        li10 = spark.read.parquet(pl).select("l_orderkey", "l_partkey")

        def edges_of(li):
            # the copurchase_triangles edge derivation verbatim
            li = li.distinct()
            a, b = li.alias("a"), li.alias("b")
            return (
                a.join(
                    b,
                    (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")),
                )
                .groupBy(
                    F.col("a.l_partkey").alias("pa"),
                    F.col("b.l_partkey").alias("pb"),
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") >= 2)
                .select("pa", "pb")
            )

        e1 = wall(lambda: materialize(edges_of(li1)).count(), n=2)
        e10 = wall(lambda: materialize(edges_of(li10)).count(), n=2)
        c1 = edges_of(li1).count()
        c10 = edges_of(li10).count()
        print(f"copurchase edge pin: lineitem x10, edge derivation+pin wall "
              f"{e1:.2f} -> {e10:.2f} s, pinned edge rows {c1} -> {c10}")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
