

def test_simhash_neardup_band_completeness_and_cap(spark):
    """The banding law: ANY pair within Hamming radius < SIMHASH_BANDS
    shares a band, so banded pairing equals brute-force popcount
    filtering (checked exhaustively on a toy corpus); buckets over
    the cap drop their members from candidate generation; radii >=
    the band count refuse."""
    import pytest
    from pyspark.sql import functions as F

    from tinyerp_etl_spark.operators.dedup import (
        simhash,
        simhash_neardup_pairs,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i % 7, i % 7 + 6)))
         for i in range(24)],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_neardup_pairs(docs, hamming_max=3).collect()
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(sigs)
    want = sorted(
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    )
    assert got == want and want  # non-vacuous
    # cap 1: every bucket with >1 member drops — far fewer pairs
    capped = simhash_neardup_pairs(docs, hamming_max=3, bucket_cap=1)
    assert capped.count() < len(want)
    with pytest.raises(ValueError, match="hamming_max"):
        simhash_neardup_pairs(docs, hamming_max=4)


def test_line_dedup_removes_cross_doc_lines_only(spark):
    """Boilerplate semantics: a line in >=2 DISTINCT docs drops from
    every doc (no canonical first copy); an intra-doc repeat stays;
    a fully-boilerplate doc reassembles to ''."""
    from tinyerp_etl_spark.operators.dedup import line_dedup_summary

    rows = [
        (1, "same header\nunique one\nrepeat\nrepeat"),
        (2, "same header\nunique two"),
        (3, "same header"),
        # blank lines are paragraph separators, NEVER boilerplate —
        # two docs sharing '' must not strip structure corpus-wide
        (4, "intro four\n\nbody four"),
        (5, "intro five\n\nbody five"),
        # NULL text must not vanish from the summary: it coalesces to
        # '' and reports like an empty-string doc (one blank line)
        (6, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in line_dedup_summary(docs).collect()}
    assert got[6]["n_lines"] == 1 and got[6]["n_removed"] == 0
    assert got[6]["clean_text"] == ""
    assert got[1]["n_lines"] == 4 and got[1]["n_removed"] == 1
    # the intra-doc 'repeat' pair survives in original order
    assert got[1]["clean_text"] == "unique one\nrepeat\nrepeat"
    assert got[2]["clean_text"] == "unique two"
    assert got[3]["n_removed"] == 1 and got[3]["clean_text"] == ""
    assert got[4]["clean_text"] == "intro four\n\nbody four"
    assert got[5]["n_removed"] == 0
