"""Interleaved A/B: web manifest verdict shapes (VERDICT r14 #4).

v0 (current): ann2 carries the keeper-gated C4 verdict UNPINNED — the
   cascade re-runs once per consumer (the surv filter and the output
   join each compute it).
v1 (decide-small, guide §8): one NARROW pinned decision frame
   (crawl_id, doc_id, canonical_url, keeper, verdict) — cascade runs
   once; survivors re-attach the clean_text payload from the pinned
   ann by crawl_id.

Equivalence + interleaved count/noop timing for both web manifest
queries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from pyspark.sql import functions as F

import tinyerp_etl_spark.plans.llm_ops as L
from tinyerp_etl_spark.functions.materialize import materialize
from tinyerp_etl_spark.operators import text as X
from tinyerp_etl_spark.session import get_spark
from tinyerp_etl_spark.sources.catalog import load_table, widen_if_narrow

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _staged(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    staged_docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 40 == 0,
            F.concat(F.col("text"), F.lit(" "), F.expr("repeat('!?', 40)")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
    )
    base = staged_docs.select(
        "doc_id", "text", L._synthetic_page().alias("page")
    )
    sid = F.col("doc_id").cast("string")
    noisy = base.select(
        (F.col("doc_id") * 2).alias("crawl_id"),
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW.Example.COM:80/d/"), sid,
            F.lit("/?utm_source=x&b=2&a=1#frag"),
        ).alias("url"),
        "page",
    )
    clean = base.select(
        (F.col("doc_id") * 2 + 1).alias("crawl_id"),
        "doc_id",
        F.concat(
            F.lit("http://example.com/d/"), sid, F.lit("?a=1&b=2")
        ).alias("url"),
        "page",
    )
    crawls = widen_if_narrow(noisy.unionByName(clean), sf_dir)
    ann = materialize(
        crawls.select(
            "crawl_id",
            "doc_id",
            X.normalize_url("url").alias("canonical_url"),
            X.html_to_text("page").alias("clean_text"),
        )
    )
    first = ann.groupBy("canonical_url").agg(
        F.min("crawl_id").alias("keeper")
    )
    tgt = staged_docs.filter(
        (F.col("lang") == "en") & (F.col("source") == "src13")
    ).select("doc_id", "text")
    return ann, first, tgt


def annotated_v1(spark, sf_dir):
    ann, first, tgt = _staged(spark, sf_dir)
    decision = materialize(
        ann.join(first, "canonical_url").select(
            "crawl_id",
            "doc_id",
            "canonical_url",
            "keeper",
            F.when(
                F.col("crawl_id") == F.col("keeper"),
                X.c4_verdict("clean_text"),
            ).alias("verdict"),
        )
    )
    surv = (
        decision.filter(
            (F.col("crawl_id") == F.col("keeper"))
            & (F.col("verdict") == "keep")
        )
        .select("crawl_id")
        .join(ann.select("crawl_id", F.col("clean_text").alias("text")),
              "crawl_id")
    )
    return decision, surv, tgt


def _staged_v2(spark, sf_dir):
    """Extraction ONCE PER DOC: both staged crawls of a doc share the
    same page by construction, so html_to_text need not run per crawl."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    staged_docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 40 == 0,
            F.concat(F.col("text"), F.lit(" "), F.expr("repeat('!?', 40)")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
    )
    base = staged_docs.select(
        "doc_id", "text", L._synthetic_page().alias("page")
    )
    sid = F.col("doc_id").cast("string")
    noisy = base.select(
        (F.col("doc_id") * 2).alias("crawl_id"),
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW.Example.COM:80/d/"), sid,
            F.lit("/?utm_source=x&b=2&a=1#frag"),
        ).alias("url"),
    )
    clean = base.select(
        (F.col("doc_id") * 2 + 1).alias("crawl_id"),
        "doc_id",
        F.concat(
            F.lit("http://example.com/d/"), sid, F.lit("?a=1&b=2")
        ).alias("url"),
    )
    crawls = widen_if_narrow(noisy.unionByName(clean), sf_dir)
    ext = base.select(
        "doc_id", X.html_to_text(F.col("page")).alias("clean_text")
    )
    ann = materialize(
        crawls.select(
            "crawl_id", "doc_id", X.normalize_url("url").alias("canonical_url")
        ).join(ext, "doc_id")
    )
    first = ann.groupBy("canonical_url").agg(
        F.min("crawl_id").alias("keeper")
    )
    tgt = staged_docs.filter(
        (F.col("lang") == "en") & (F.col("source") == "src13")
    ).select("doc_id", "text")
    return ann, first, tgt


def annotated_v2(spark, sf_dir):
    ann, first, tgt = _staged_v2(spark, sf_dir)
    decision = materialize(
        ann.join(first, "canonical_url").select(
            "crawl_id",
            "doc_id",
            "canonical_url",
            "keeper",
            F.when(
                F.col("crawl_id") == F.col("keeper"),
                X.c4_verdict("clean_text"),
            ).alias("verdict"),
        )
    )
    surv = (
        decision.filter(
            (F.col("crawl_id") == F.col("keeper"))
            & (F.col("verdict") == "keep")
        )
        .select("crawl_id")
        .join(ann.select("crawl_id", F.col("clean_text").alias("text")),
              "crawl_id")
    )
    return decision, surv, tgt


def main() -> None:
    spark = get_spark("ab-webmanifest")
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()
    v0 = L._web_manifest_annotated
    variants = {"v1": v0, "v2": annotated_v2}
    qnames = ["web_curation_pipeline_manifest", "web_manifest_store_scored"]

    for qn in qnames:
        ref = None
        for n, impl in variants.items():
            L._web_manifest_annotated = impl
            rows = sorted(tuple(r) for r in L.LLM_QUERIES[qn](spark, SF_DIR).collect())
            if ref is None:
                ref = rows
            else:
                assert rows == ref, f"{qn}/{n} differs"
        print(f"EQUAL {qn}: {len(ref)} rows")

    res: dict[str, float] = {}
    for _p in range(3):
        for n, impl in variants.items():
            L._web_manifest_annotated = impl
            for qn in qnames:
                q = L.LLM_QUERIES[qn]
                spark.sparkContext.setJobDescription(f"ab:{n}:{qn}:count")
                t0 = time.perf_counter()
                q(spark, SF_DIR).count()
                k = f"{n}_{qn[:12]}_count"
                res[k] = min(res.get(k, 9e9), time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(f"ab:{n}:{qn}:noop")
                t0 = time.perf_counter()
                q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                k = f"{n}_{qn[:12]}_noop"
                res[k] = min(res.get(k, 9e9), time.perf_counter() - t0)
    L._web_manifest_annotated = v0
    for k in sorted(res):
        print(k, round(res[k], 3))


if __name__ == "__main__":
    main()
