"""Edge cases for text operators the corpus-level oracles can't reach:
short documents, empty text, and adjacent/multiple PII matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from tinyerp_etl_spark.operators.dedup import word_ngram_rows
from tinyerp_etl_spark.operators.text import ngram_repetition, pii_counts, redact_pii


def test_ngram_repetition_short_docs_report_zero(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"), (4, "a b a b a b")],
        "doc_id int, text string",
    )
    r = ngram_repetition("text", 3)
    rows = {
        row["doc_id"]: (row["n"], row["frac"])
        for row in df.select(
            "doc_id",
            r["n_grams"].alias("n"),
            r["dup_fraction"].alias("frac"),
        ).collect()
    }
    assert rows[1] == (0, 0.0)
    assert rows[2] == (0, 0.0)
    assert rows[3] == (0, 0.0)  # 2 tokens < n=3
    # "a b a b a b": 4 3-grams, 2 distinct ("a b a", "b a b")
    assert rows[4] == (4, 0.5)


def test_redact_pii_handles_multiple_and_adjacent_matches(spark):
    df = spark.createDataFrame(
        [(1, "a@b.com and c.d+x@e.org call +55 11 91234-5678 or +44 20 7946-0958")],
        "id int, text string",
    )
    out = df.select(
        redact_pii("text").alias("t"),
        pii_counts("text")["n_emails"].alias("ne"),
        pii_counts("text")["n_phones"].alias("np"),
    ).collect()[0]
    assert out["ne"] == 2 and out["np"] == 2
    assert out["t"] == "<EMAIL> and <EMAIL> call <PHONE> or <PHONE>"


def test_word_ngram_rows_skips_short_docs_and_dedupes(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, "p q r p q r p q r")],
        "doc_id long, text string",
    )
    rows = word_ngram_rows(df, "text", "doc_id", 3).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["gram"])
    assert 1 not in by_doc  # 2 tokens: no 3-grams
    # 7 positional grams but only 3 distinct rotations
    assert by_doc[2] == {"p q r", "q r p", "r p q"}
