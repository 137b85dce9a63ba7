"""Phase-level wall profile of span_clean_and_fold_docs' loop step.

Replicates the registered query's two-batch loop with timers around
each sub-phase of clean_and_fold_batch (same calls, same order) to
find where the ~7 s goes. Profiling tool only (guide §1).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from pyspark.sql import functions as F

from tinyerp_etl_spark.functions.materialize import materialize
from tinyerp_etl_spark.operators import span_index as SI
from tinyerp_etl_spark.session import get_spark
from tinyerp_etl_spark.sources.catalog import load_table
from tinyerp_etl_spark.etl.fold import fold_append
from tinyerp_etl_spark.etl.table_store import TableStore

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, label):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    m = int(docs.agg(F.max("doc_id")).first()[0])
    t0, t1 = m // 2, (3 * m) // 4
    docs = docs.filter(F.col("doc_id") > t0)
    splits = [
        docs.filter(F.col("doc_id") <= t1),
        docs.filter(F.col("doc_id") > t1),
    ]
    scratch = tempfile.mkdtemp(prefix="span_prof_")
    phases: dict[str, float] = {}

    def tick(name, fn):
        spark.sparkContext.setJobDescription(f"{label}:{name}")
        t = time.perf_counter()
        out = fn()
        phases[name] = phases.get(name, 0.0) + time.perf_counter() - t
        return out

    try:
        idx = os.path.join(scratch, "idx")
        outp = os.path.join(scratch, "clean")
        total0 = time.perf_counter()
        for i, b in enumerate(splits):
            store = SI.span_gram_store(spark, idx)
            version = store.current_version()
            if version is None:
                fresh = b
            else:
                indexed = (
                    store.read_version(version)
                    .select(F.col("doc_id")).distinct()
                )
                fresh = tick(f"s{i}_prefilter",
                             lambda b=b, ix=indexed: materialize(b.join(ix, "doc_id", "left_anti")))
            fresh_pin = fresh
            pg = tick(f"s{i}_pg", lambda fp=fresh_pin: materialize(
                SI.keyed_positional_rows(fp, "text", "doc_id", SI.SPAN_K)))
            cleaned = tick(f"s{i}_clean", lambda fp=fresh_pin, pg=pg: materialize(
                SI.clean_batch_against_store(
                    spark, idx, fp, "text", "doc_id", SI.SPAN_K, _prebuilt_pg=pg)))
            def _append(cleaned=cleaned):
                out_store = TableStore(spark, outp, SI.cleaned_docs_schema("doc_id"))
                fold_append(
                    out_store, cleaned,
                    lambda stored, rows: rows.join(stored.select("doc_id"), "doc_id", "left_anti"),
                    n_files=SI.SPAN_FILES, skip_empty_bootstrap_result=0,
                )
            tick(f"s{i}_cleaned_append", _append)
            fold_rows = SI.gram_rows_from_positional(pg, "doc_id", SI.SPAN_K)
            tick(f"s{i}_gram_fold", lambda fp=fresh_pin, fr=fold_rows: SI.update_span_index(
                spark, idx, fp, "text", "doc_id",
                on_overlap="skip_existing", k=SI.SPAN_K,
                prebuilt_gram_rows=fr))
            tick(f"s{i}_collect", lambda c=cleaned: c.collect())
        phases["TOTAL"] = time.perf_counter() - total0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return phases


def main() -> None:
    spark = get_spark("profile-span-fold")
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()
    best = None
    for p in range(3):
        ph = run_once(spark, f"pass{p}")
        print(f"pass{p}:", {k: round(v, 3) for k, v in ph.items()})
        if best is None or ph["TOTAL"] < best["TOTAL"]:
            best = ph
    print("BEST:", {k: round(v, 3) for k, v in sorted(best.items(), key=lambda x: -x[1])})


if __name__ == "__main__":
    main()
