"""Interleaved A/B: span clean-and-fold loop shapes (VERDICT r14 #2).

v0 (current): clean derives batch_stats via groupBy(gram_key).agg(
   count_distinct(id), min(struct)) over EVERY occurrence row (an
   Expand + two-exchange distinct-aggregate), and the fold separately
   aggregates the same pin to per-(gram, doc) first-occurrence rows.
v1: ONE pinned per-(gram, doc) frame (gram_rows_from_positional(pg))
   shared by the clean's batch_keys + batch_stats AND the fold's
   prebuilt rows — batch_stats becomes a plain partial-aggregable
   count(1) + min(struct) over the collapsed rows (identical result:
   min over (doc, per-doc-min-pos) == min over all occurrences).

Equivalence + interleaved count/noop timing on the registered query.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from pyspark.sql import functions as F

import tinyerp_etl_spark.operators.span_index as SI
import tinyerp_etl_spark.plans.llm_ops as L
from tinyerp_etl_spark.etl.fold import fold_append
from tinyerp_etl_spark.etl.table_store import TableStore
from tinyerp_etl_spark.functions.materialize import materialize
from tinyerp_etl_spark.operators.dedup import (
    rebuild_without_positions,
    removed_position_arrays,
)
from tinyerp_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def clean_v1(spark, path, batch, text_col, id_col, k, pg, fr):
    """clean_batch_against_store with batch_stats/batch_keys derived
    from the pinned per-(gram, doc) frame ``fr``."""
    store = SI.span_gram_store(spark, path)
    version = store.current_version()
    stored = store.read() if version is None else store.read_version(version)
    probe = pg.agg(
        F.min(F.col(id_col).cast("long")).alias("lo"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    store_rows = 0
    if int(probe["n"]):
        hi_row = stored.agg(
            F.max("doc_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.first("k").alias("k"),
        ).first()
        SI._check_k(
            None if hi_row["k"] is None else int(hi_row["k"]),
            k, path, "cleaning",
        )
        hi = hi_row["hi"]
        store_rows = int(hi_row["n"])
        if hi is not None and int(probe["lo"]) <= int(hi):
            raise ValueError("out-of-order (A/B)")
    batch_keys = fr.select("gram_key").distinct()
    store_scan = stored.select("gram_key")
    n_rows = int(probe["n"])
    if (
        0 < n_rows <= SI.SPAN_PROBE_PUSHDOWN_CAP
        and store_rows >= n_rows * SI.SPAN_PUSHDOWN_MIN_STORE_ROWS_PER_KEY
    ):
        keys = [r["gram_key"] for r in batch_keys.collect()]
        threshold = int(
            spark.conf.get("spark.sql.parquet.pushdown.inFilterThreshold")
        )
        if 0 < len(keys) <= threshold:
            store_scan = store_scan.filter(F.col("gram_key").isin(keys))
    store_hit = (
        store_scan.join(F.broadcast(batch_keys), "gram_key", "left_semi")
        .distinct()
    )
    batch_stats = fr.groupBy("gram_key").agg(
        F.count(F.lit(1)).alias("__bn"),
        F.min(
            F.struct(
                F.col("doc_id").alias("cid"),
                F.col("pos").cast("int").alias("cpos"),
            )
        ).alias("__c"),
    )
    batch_only_dup = batch_stats.join(
        store_hit, "gram_key", "left_anti"
    ).filter(F.col("__bn") >= 2)
    dup_keys = store_hit.unionByName(batch_only_dup.select("gram_key"))
    cov = (
        pg.join(F.broadcast(dup_keys), "gram_key")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__cps"))
    )
    prot = batch_only_dup.groupBy(F.col("__c.cid").alias(id_col)).agg(
        F.collect_list("__c.cpos").alias("__pps")
    )
    removed = removed_position_arrays(cov, prot, id_col, k)
    return rebuild_without_positions(batch, removed, text_col, id_col)


def caf_v1(spark, index_path, batch, cleaned_path, text_col="text",
           id_col="doc_id", k=SI.SPAN_K):
    store = SI.span_gram_store(spark, index_path)
    version = store.current_version()
    if version is None:
        fresh = batch
    else:
        indexed = (
            store.read_version(version)
            .select(F.col("doc_id").alias(id_col)).distinct()
        )
        fresh = materialize(batch.join(indexed, id_col, "left_anti"))
    pg = materialize(SI.keyed_positional_rows(fresh, text_col, id_col, k))
    fr = materialize(SI.gram_rows_from_positional(pg, id_col, k))
    cleaned = materialize(
        clean_v1(spark, index_path, fresh, text_col, id_col, k, pg, fr)
    )
    if cleaned_path is not None:
        out_store = TableStore(spark, cleaned_path, SI.cleaned_docs_schema(id_col))
        fold_append(
            out_store, cleaned,
            lambda stored, rows: rows.join(
                stored.select(id_col), id_col, "left_anti"
            ),
            n_files=SI.SPAN_FILES, skip_empty_bootstrap_result=0,
        )
    SI.update_span_index(
        spark, index_path, fresh, text_col, id_col,
        on_overlap="skip_existing", k=k, prebuilt_gram_rows=fr,
    )
    return cleaned


def fold_v2(spark, path, fr, k):
    """update_span_index fast path for the composed loop: rows are the
    ALREADY-PINNED per-(gram, doc) frame derived from a batch that the
    loop itself anti-joined against the SAME store version (single
    writer), so the skip_existing anti-join is a structural no-op and
    the re-materialize a duplicate write. The law guards (k contract,
    ingest-order probe) stay."""
    def fresh_rows(stored, batch):
        SI._check_k(SI._stored_k(stored), k, path, "folding")
        probe = batch.agg(
            F.min("doc_id").alias("lo"), F.count(F.lit(1)).alias("n")
        ).first()
        if int(probe["n"]):
            hi_row = stored.agg(F.max("doc_id").alias("hi")).first()
            hi = hi_row["hi"]
            if hi is not None and int(probe["lo"]) <= int(hi):
                raise ValueError("ingest-order violation (A/B)")
        return batch
    return fold_append(
        SI.span_gram_store(spark, path), fr, fresh_rows,
        n_files=SI.SPAN_FILES, cluster_by=["gram_key"],
        skip_empty_bootstrap_result=0,
        compact_max_files=SI.SPAN_COMPACT_MAX_FILES,
        compact_n_files=SI.SPAN_COMPACT_FILES,
        vacuum_retain=SI.SPAN_VACUUM_RETAIN,
    )


def caf_v2(spark, index_path, batch, cleaned_path, text_col="text",
           id_col="doc_id", k=SI.SPAN_K):
    store = SI.span_gram_store(spark, index_path)
    version = store.current_version()
    if version is None:
        fresh = batch
    else:
        indexed = (
            store.read_version(version)
            .select(F.col("doc_id").alias(id_col)).distinct()
        )
        fresh = materialize(batch.join(indexed, id_col, "left_anti"))
    pg = materialize(SI.keyed_positional_rows(fresh, text_col, id_col, k))
    fr = materialize(SI.gram_rows_from_positional(pg, id_col, k))
    cleaned = materialize(
        clean_v1(spark, index_path, fresh, text_col, id_col, k, pg, fr)
    )
    if cleaned_path is not None:
        out_store = TableStore(spark, cleaned_path, SI.cleaned_docs_schema(id_col))
        fold_append(
            out_store, cleaned,
            lambda stored, rows: rows.join(
                stored.select(id_col), id_col, "left_anti"
            ),
            n_files=SI.SPAN_FILES, skip_empty_bootstrap_result=0,
        )
    fold_v2(spark, index_path, fr, k)
    return cleaned


def main() -> None:
    spark = get_spark("ab-spanfold")
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()
    v0 = SI.clean_and_fold_batch
    variants = {"v0": v0, "v2": caf_v2}
    qn = "span_clean_and_fold_docs"

    ref = None
    for n, impl in variants.items():
        SI.clean_and_fold_batch = impl
        rows = sorted(tuple(r) for r in L.LLM_QUERIES[qn](spark, SF_DIR).collect())
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{n} differs ({len(rows)} vs {len(ref)})"
        print(f"{n}: {len(rows)} rows OK")

    res: dict[str, float] = {}
    for _p in range(5):
        for n, impl in variants.items():
            SI.clean_and_fold_batch = impl
            q = L.LLM_QUERIES[qn]
            spark.sparkContext.setJobDescription(f"ab:{n}:count")
            t0 = time.perf_counter()
            q(spark, SF_DIR).count()
            res[f"{n}_count"] = min(res.get(f"{n}_count", 9e9), time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(f"ab:{n}:noop")
            t0 = time.perf_counter()
            q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            res[f"{n}_noop"] = min(res.get(f"{n}_noop", 9e9), time.perf_counter() - t0)
    SI.clean_and_fold_batch = v0
    print({k: round(v, 3) for k, v in sorted(res.items())})


if __name__ == "__main__":
    main()
