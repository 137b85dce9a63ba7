"""Interleaved A/B: simhash explode-x32 vs 32-sum-aggregate shape.

Old: explode(token) x explode(bit j) -> (id, j, contrib) rows ->
groupBy(id, j) -> groupBy(id).  Shuffle rows = 32/doc/partition after
partial agg, two exchanges.

New: one groupBy(id) with 32 codegen sum aggregates over the (id, h)
token rows -> 1 shuffle row/doc/partition (32-long payload), one
exchange, no Generate(bit).

Verifies identical results in-process, then min-of-N noop timing,
interleaved in ONE process (the only trustworthy methodology on this
host class).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from pyspark.sql import DataFrame, functions as F

from tinyerp_etl_spark.operators import dedup as D
from tinyerp_etl_spark.operators.text import token_hash32, tokens
from tinyerp_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def new_simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    tok = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn("h", token_hash32(F.col("tok")))
    aggs = [
        F.sum(F.expr(f"((h div {1 << j}L) % 2) * 2 - 1")).alias(f"__s{j}")
        for j in range(bits)
    ]
    pack = F.expr(
        "CAST("
        + " + ".join(f"IF(__s{j} > 0, {1 << j}L, 0L)" for j in range(bits))
        + " AS BIGINT)"
    ).alias("simhash")
    return tok.groupBy(id_col).agg(*aggs).select(id_col, pack)


def main() -> None:
    spark = get_spark("ab-simhash")
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()
    from tinyerp_etl_spark.plans import llm_ops as L

    old_impl = D.simhash

    def q_simhash_docs():
        return L.LLM_QUERIES["simhash_docs"](spark, SF_DIR)

    def q_neardup():
        return L.LLM_QUERIES["simhash_neardup_docs"](spark, SF_DIR)

    # --- equivalence check (same process)
    D.simhash = old_impl
    r_old = sorted(tuple(r) for r in q_simhash_docs().collect())
    p_old = sorted(tuple(r) for r in q_neardup().collect())
    D.simhash = new_simhash
    r_new = sorted(tuple(r) for r in q_simhash_docs().collect())
    p_new = sorted(tuple(r) for r in q_neardup().collect())
    assert r_old == r_new, f"simhash_docs rows differ ({len(r_old)} vs {len(r_new)})"
    assert p_old == p_new, f"neardup pairs differ ({len(p_old)} vs {len(p_new)})"
    print(f"EQUAL: simhash_docs {len(r_old)} rows, neardup {len(p_old)} pairs")

    # --- interleaved noop timing
    res: dict[str, float] = {}
    for _p in range(3):
        for label, impl, q in (
            ("old_docs", old_impl, q_simhash_docs),
            ("new_docs", new_simhash, q_simhash_docs),
            ("old_pairs", old_impl, q_neardup),
            ("new_pairs", new_simhash, q_neardup),
        ):
            D.simhash = impl
            spark.sparkContext.setJobDescription(f"ab:{label}")
            t0 = time.perf_counter()
            q().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            res[label] = min(res.get(label, 1e9), dt)
            print(f"pass {label}: {dt:.3f}")
    D.simhash = old_impl
    print({k: round(v, 3) for k, v in res.items()})


if __name__ == "__main__":
    main()
