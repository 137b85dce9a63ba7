"""Property-based tests (hypothesis) for the semantic-quirk transforms.

The reference's row-level semantics (SURVEY §2 ops #7-8) and the MERGE
laws (#14) are the places where a subtle divergence silently changes
aggregates downstream — so they get adversarial inputs, not just
examples. Each property runs a whole generated batch through Spark at
once (one job per example, small max_examples) against an exact Python
model of the reference's code.
"""

from __future__ import annotations

from datetime import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from tinyerp_etl_spark.etl.merge import merge_upsert
from tinyerp_etl_spark.functions.coerce import br_timestamp, safe_double

# alphabet chosen to cover the reference's real input space (Brazilian
# decimal commas, stray text, blanks) while avoiding Python-float
# dialect corners Spark's cast never sees ('1_000', 'inf', '1e3')
NUMERIC_TEXT = st.one_of(
    st.none(),
    st.text(alphabet=" 0123456789,.-abc", max_size=12),
)


def ref_safe_float(v) -> float:
    """Exact Python model of the reference's safe_float_convert
    (ref tiny_api_v2_cliente.py:52-59): None→0.0, strip, comma→dot,
    empty→0.0, unparseable→0.0."""
    if v is None:
        return 0.0
    s = str(v).strip().replace(",", ".")
    if not s:
        return 0.0
    try:
        return float(s)
    except ValueError:
        return 0.0


@settings(max_examples=10, deadline=None)
@given(st.lists(NUMERIC_TEXT, min_size=1, max_size=60))
def test_safe_double_matches_reference_model(spark, batch):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(batch)], "i int, v string")
    got = {
        r["i"]: r["out"]
        for r in df.select("i", safe_double("v").alias("out")).collect()
    }
    for i, v in enumerate(batch):
        assert got[i] == ref_safe_float(v), f"input {v!r}: {got[i]} != {ref_safe_float(v)}"


DATE_PARTS = st.tuples(
    st.integers(0, 32),  # deliberately includes invalid day 0/32
    st.integers(0, 13),  # and invalid month 0/13
    st.integers(1990, 2030),
    st.booleans(),  # with time?
)


def ref_parse_date(s: str) -> datetime | None:
    """Model of the reference's fallback chain (ref :150-151)."""
    for fmt in ("%d/%m/%Y %H:%M:%S", "%d/%m/%Y"):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


@settings(max_examples=10, deadline=None)
@given(st.lists(DATE_PARTS, min_size=1, max_size=60))
def test_br_timestamp_matches_reference_model(spark, batch):
    texts = [
        f"{d:02d}/{m:02d}/{y:04d}" + (" 12:34:56" if t else "")
        for d, m, y, t in batch
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "i int, s string"
    )
    got = {
        r["i"]: r["out"]
        for r in df.select("i", br_timestamp("s").alias("out")).collect()
    }
    for i, s in enumerate(texts):
        want = ref_parse_date(s)
        assert got[i] == want, f"input {s!r}: {got[i]} != {want}"


KV_BATCH = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-1000, 1000)),
    min_size=0,
    max_size=40,
)


def _df(spark, rows, gen):
    return spark.createDataFrame(
        [(k, v, gen) for k, v in rows] or [], "k int, v int, gen int"
    )


def _as_map(df):
    return {r["k"]: (r["v"], r["gen"]) for r in df.collect()}


@settings(max_examples=8, deadline=None)
@given(KV_BATCH, KV_BATCH)
def test_merge_upsert_laws(spark, existing, incoming):
    """incoming wins per key; survivors keep; applying twice ≡ once."""
    # merge dedupes the incoming side keep-latest; make rows unique per
    # key to model one increment (the reference's page has one row/key)
    e = {k: v for k, v in existing}
    i = {k: v for k, v in incoming}
    edf = _df(spark, e.items(), 1)
    idf = _df(spark, i.items(), 2)

    once = merge_upsert(edf, idf, ["k"])
    got = _as_map(once)
    want = {**{k: (v, 1) for k, v in e.items()}, **{k: (v, 2) for k, v in i.items()}}
    assert got == want

    twice = merge_upsert(once, idf, ["k"])
    assert _as_map(twice) == want  # idempotent under replay (at-least-once)


@settings(max_examples=8, deadline=None)
@given(KV_BATCH, KV_BATCH, KV_BATCH)
def test_merge_increment_composition(spark, base, inc_a, inc_b):
    """merge(merge(E, A), B) ≡ merge(E, A⊕B) — two small increments
    equal one combined increment (union with B winning overlaps)."""
    e = {k: v for k, v in base}
    a = {k: v for k, v in inc_a}
    b = {k: v for k, v in inc_b}
    edf = _df(spark, e.items(), 1)

    stepwise = merge_upsert(
        merge_upsert(edf, _df(spark, a.items(), 2), ["k"]),
        _df(spark, b.items(), 2),
        ["k"],
    )
    combined = merge_upsert(edf, _df(spark, {**a, **b}.items(), 2), ["k"])
    assert _as_map(stepwise) == _as_map(combined)


@settings(max_examples=8, deadline=None)
@given(
    values=st.lists(
        st.sampled_from([f"v{i}" for i in range(12)]), min_size=1, max_size=400
    ),
    cap=st.integers(min_value=2, max_value=12),
    parts=st.integers(min_value=1, max_value=7),
    share_myriads=st.sampled_from([200, 500, 1000, 2500]),
)
def test_heavy_hitters_equals_plain_groupby(spark, values, cap, parts, share_myriads):
    """The candidate-prune path must be EXACT for any data, any
    Misra-Gries cap (even absurdly tight), any partitioning, any
    threshold — the no-false-negative invariant under adversarial
    skew, not just the showcase corpus."""
    from tinyerp_etl_spark.operators.sketch import heavy_hitters

    share = share_myriads / 10_000
    df = spark.createDataFrame([(v,) for v in values], "v string").repartition(parts)
    got = {(r["v"], r["n"]) for r in heavy_hitters(df, "v", share, cap=cap).collect()}

    # DECIMAL semantics, same as the engine and the SQL oracle:
    # ceil(num*n/den) with num/den the exact decimal rational (NOT
    # math.ceil(share*n), which pushes boundary counts over the bar
    # when double(share)*n rounds up, e.g. 0.1*30 = 3.0000000000000004)
    from fractions import Fraction

    frac = Fraction(str(share)) * len(values)
    thresh = -(-frac.numerator // frac.denominator)
    counts: dict = {}
    for v in values:
        counts[v] = counts.get(v, 0) + 1
    want = {(v, c) for v, c in counts.items() if c >= thresh}
    assert got == want


def test_heavy_hitters_exact_decimal_boundary(spark):
    """Boundary regression: 300 rows with one value at exactly 3
    occurrences and min_share=0.01 — ceil(0.01 * 300) = 3 in DECIMAL
    arithmetic, so the value IS a heavy hitter. The IEEE rational of
    double(0.01) is strictly above 1/100, which would wrongly raise
    the bar to 4 and drop it (the round-2 as_integer_ratio bug)."""
    from tinyerp_etl_spark.operators.sketch import heavy_hitters

    values = ["hot"] * 3 + [f"u{i}" for i in range(297)]
    df = spark.createDataFrame([(v,) for v in values], "v string").repartition(4)
    got = {
        (r["v"], r["n"])
        for r in heavy_hitters(df, "v", 0.01, cap=8).collect()
        if r["v"] == "hot"
    }
    assert got == {("hot", 3)}


def test_heavy_hitters_long_decimal_share_no_overflow(spark):
    """min_share = float(1/3) has a 10^16 denominator as a decimal
    Fraction; the in-plan threshold must not wrap in long arithmetic
    (3000 rows x 10^16 > 2^63). The hot value at exactly 1/3 share
    must survive."""
    from tinyerp_etl_spark.operators.sketch import heavy_hitters

    values = ["hot"] * 1000 + [f"u{i}" for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in values], "v string").repartition(4)
    got = {
        (r["v"], r["n"]) for r in heavy_hitters(df, "v", 1 / 3, cap=16).collect()
    }
    assert got == {("hot", 1000)}


# ------------------------------------------------- round-4 operators

IDS_AND_WEIGHTS = st.lists(
    st.tuples(
        st.integers(min_value=-(10**9), max_value=10**9),
        st.integers(min_value=0, max_value=1000),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None)
@given(IDS_AND_WEIGHTS, st.integers(min_value=1, max_value=9))
def test_prefix_sum_matches_python_model(spark, pairs, n_buckets):
    """distributed_prefix_sum ≡ serial exclusive cumsum for ANY id
    distribution (negatives, huge gaps, dense runs) and bucket count."""
    from tinyerp_etl_spark.operators.packing import distributed_prefix_sum

    df = spark.createDataFrame(pairs, "k long, w long").repartition(5)
    got = {
        r["k"]: r["offset"]
        for r in distributed_prefix_sum(
            df, "k", "w", n_buckets=n_buckets
        ).collect()
    }
    run, want = 0, {}
    for k, w in sorted(pairs):
        want[k] = run
        run += w
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=10**6),
        ),
        min_size=3,
        max_size=60,
        unique_by=lambda t: t[1],
    )
)
def test_mixture_thresholds_laws(spark, rows):
    """Thresholds are valid rates and the implied keep never exceeds
    the binding budget's per-domain allotment (floor rounding only
    loses, never overshoots)."""
    from tinyerp_etl_spark.operators.sampling import mixture_thresholds

    df = spark.createDataFrame(rows, "d string, k long")
    w = {"a": 5000, "b": 3000, "c": 2000}
    present = {d for d, _ in rows}
    counts = {d: sum(1 for x, _ in rows if x == d) for d in present}
    out = {
        r["d"]: (r["n_total"], r["threshold_10k"])
        for r in mixture_thresholds(df, "d", w).collect()
    }
    assert set(out) == present
    budget = min((10000 * counts[d]) // w[d] for d in present)
    for d, (n, t) in out.items():
        assert n == counts[d]
        assert 0 <= t <= 10000
        # implied expected keep (n * t / 10000) must not exceed the
        # budget's allotment for d (+1 for the floor boundary)
        assert n * t <= budget * w[d] + n


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=64),
)
def test_packing_reconstructs_token_stream(spark, pairs, seq_len):
    """Packing coordinates must tile the concatenated token stream: the
    offsets are the exclusive cumsum, every offset_in_seq < seq_len,
    and seq_id * seq_len + offset_in_seq == tok_offset."""
    from tinyerp_etl_spark.operators.packing import pack_concat_chunks

    df = spark.createDataFrame(pairs, "k long, w long")
    rows = pack_concat_chunks(df, "k", "w", seq_len=seq_len).collect()
    run = 0
    for r in sorted(rows, key=lambda r: r["k"]):
        assert r["tok_offset"] == run
        assert 0 <= r["offset_in_seq"] < seq_len
        # spans_boundary must agree with an independent rederivation
        # from (offset_in_seq, weight) — not from tok_offset itself
        expect_spans = r["offset_in_seq"] + max(r["w"], 1) > seq_len
        assert r["spans_boundary"] == expect_spans
        run += r["w"]


# --------------------------------------------------------- round-4 additions


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-10_000, max_value=10_000)),
            st.one_of(st.none(), st.text(alphabet="abcXYZ 0", max_size=6)),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_profile_columns_matches_reference_model(spark, rows, parts):
    """profile_columns == a pandas-free reference computed in Python,
    for arbitrary null patterns and any partitioning."""
    from tinyerp_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(n, s) for n, s in rows], "num long, tag string"
    ).repartition(parts)
    out = {
        r["col_name"]: r
        for r in profile_columns(
            df, numeric_cols={"num": F.col("num")}, string_cols=["tag"]
        ).collect()
    }

    nums = [n for n, _ in rows if n is not None]
    tags = [s for _, s in rows if s is not None]
    r = out["num"]
    assert r["n_rows"] == len(rows)
    assert r["n_nulls"] == len(rows) - len(nums)
    assert r["n_distinct"] == len(set(nums))
    assert r["min_num"] == (min(nums) if nums else None)
    assert r["max_num"] == (max(nums) if nums else None)
    t = out["tag"]
    assert t["n_nulls"] == len(rows) - len(tags)
    assert t["n_distinct"] == len(set(tags))
    assert t["min_str"] == (min(tags) if tags else None)
    assert t["max_str"] == (max(tags) if tags else None)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_zorder_key_matches_reference_model(spark, pts):
    """zorder_key == bit-by-bit Python interleave for arbitrary
    16-bit points, and is monotone-preserving on equal points."""
    from tinyerp_etl_spark.functions.zorder import zorder_key

    def ref(a, b):
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pts)], "i long, a long, b long"
    )
    got = {
        r["i"]: r["z"] for r in df.select("i", zorder_key("a", "b").alias("z")).collect()
    }
    for i, (a, b) in enumerate(pts):
        assert got[i] == ref(a, b)


@settings(max_examples=25, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=12),
    chunk_seed=st.integers(min_value=0, max_value=10**6),
)
def test_mp4_roundtrip_property(sizes, chunk_seed):
    """build_minimal_mp4 -> _parse_sample_table is the identity on
    sample payloads for ANY sample sizes and ANY chunk partitioning
    (pure Python property — no Spark job per example)."""
    from tinyerp_etl_spark.operators.mp4 import (
        _parse_sample_table,
        build_minimal_mp4,
    )

    frames = [bytes([(i * 37 + j) % 256 for j in range(n)]) for i, n in enumerate(sizes)]
    # derive a deterministic chunk partition of len(frames) from the seed
    chunking = []
    left, s = len(frames), chunk_seed
    while left > 0:
        take = (s % left) + 1
        chunking.append(take)
        left -= take
        s = (s * 1103515245 + 12345) % (2**31)
    mp4 = build_minimal_mp4(frames, chunking=chunking)
    table = _parse_sample_table(mp4)
    assert [i for i, *_ in table] == list(range(len(frames)))
    assert [d for *_, d in table] == list(range(len(frames)))  # stts dts
    for i, off, sz, _ in table:
        assert mp4[off : off + sz] == frames[i]


@settings(max_examples=25, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=8),
    cut=st.integers(min_value=1, max_value=10**6),
)
def test_mp4_truncation_never_mis_slices(sizes, cut):
    """ANY truncation of a valid container either still parses every
    claimed sample fully in-bounds, or raises — never a short slice."""
    import pytest as _pytest

    from tinyerp_etl_spark.operators.mp4 import (
        _parse_sample_table,
        build_minimal_mp4,
    )

    frames = [bytes([j % 251 for j in range(n)]) for n in sizes]
    mp4 = build_minimal_mp4(frames)
    truncated = mp4[: len(mp4) - 1 - (cut % len(mp4))]
    import struct as _struct

    try:
        table = _parse_sample_table(truncated)
    except (ValueError, IndexError, _struct.error):
        return  # rejected loudly: the drop path (kernels catch these)
    for _i, off, sz, _d in table:
        assert off + sz <= len(truncated)


@settings(max_examples=40, deadline=None)
@given(blob=st.binary(min_size=0, max_size=600))
def test_media_codecs_never_raise_outside_drop_contract(blob):
    """ANY byte blob fed to the perceptual/codec kernels either parses
    or raises one of the exception types the mapInPandas drop paths
    catch — never ZeroDivisionError/struct.error escapes (the class of
    bug ADVICE r4 found in the WAV channels=0 path)."""
    import struct as _struct

    from tinyerp_etl_spark.operators import multimodal as M
    from tinyerp_etl_spark.operators import mp4 as MP4

    for fn, allowed in [
        (M._dhash64, (ValueError, IndexError)),
        (M._audio_fingerprint64, (ValueError, IndexError, _struct.error)),
        (M._decode_wav, (ValueError, IndexError, _struct.error)),
        (M._decode_pnm, (ValueError, IndexError)),
        (MP4._parse_sample_table, (ValueError, IndexError, _struct.error)),
    ]:
        try:
            fn(blob)
        except allowed:
            pass  # the documented drop path


@settings(max_examples=40, deadline=None)
@given(blob=st.binary(min_size=0, max_size=300))
def test_media_codecs_never_crash_on_magic_prefixed_garbage(blob):
    """Same contract with valid magic bytes up front — the parser gets
    deeper before the payload turns to garbage."""
    import struct as _struct

    from tinyerp_etl_spark.operators import multimodal as M
    from tinyerp_etl_spark.operators import mp4 as MP4

    wav = b"RIFF" + blob[:4] + b"WAVE" + blob
    pnm = b"P6\n" + blob
    mp4 = (
        _struct.pack(">I", 8 + len(blob)) + b"moov" + blob
        if len(blob) else b"\x00\x00\x00\x08moov"
    )
    for fn, payload, allowed in [
        (M._audio_fingerprint64, wav, (ValueError, IndexError, _struct.error)),
        (M._decode_wav, wav, (ValueError, IndexError, _struct.error)),
        (M._dhash64, pnm, (ValueError, IndexError)),
        (M._decode_pnm, pnm, (ValueError, IndexError)),
        (MP4._parse_sample_table, mp4, (ValueError, IndexError, _struct.error)),
    ]:
        try:
            fn(payload)
        except allowed:
            pass


# ------------------------------------------------- round-7 additions


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.randoms(use_true_random=False),
)
def test_bpe_train_is_input_order_invariant(word_freqs, rnd):
    """The trained merges depend only on the (word, freq) SET: pair
    counts are commutative sums and the tie-break is a total order,
    so permuting the vocab table (its arrival order from the shuffle)
    must not change a single merge — the determinism the oracle gate
    relies on at any partitioning."""
    from tinyerp_etl_spark.operators.text import bpe_train

    shuffled = list(word_freqs)
    rnd.shuffle(shuffled)
    assert bpe_train(shuffled, 5) == bpe_train(word_freqs, 5)


def _ref_paragraph_dedup(docs, w=None):
    """Pure-Python model of paragraph_dedup_summary."""
    import hashlib
    import re

    from tinyerp_etl_spark.operators.dedup import PARA_W

    w = PARA_W if w is None else w

    paras = []  # (para, doc_id, pos)
    for doc_id, text in docs:
        toks = re.findall(r"\w+", text.lower())
        for j in range((len(toks) + w - 1) // w):
            paras.append((" ".join(toks[j * w : j * w + w]), doc_id, j))
    first = {}
    for para, doc_id, pos in sorted(paras, key=lambda t: (t[1], t[2])):
        first.setdefault(para, (doc_id, pos))
    out = {}
    for doc_id, text in docs:
        mine = [(p, d, j) for p, d, j in paras if d == doc_id]
        if not mine:
            continue
        kept = [p for p, d, j in mine if first[p] == (d, j)]
        out[doc_id] = (
            len(mine),
            len(kept),
            len(mine) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_paragraph_dedup_matches_python_model(spark, texts):
    """Adversarial tiny-alphabet texts maximize paragraph collisions
    (within-doc repeats, cross-doc dups, short tails, empty docs) —
    the Spark result must match the pure-Python first-occurrence
    model row for row."""
    from tinyerp_etl_spark.operators.dedup import paragraph_dedup_summary

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_paras"],
            r["n_kept"],
            r["n_dropped"],
            r["kept_text_md5"],
        )
        for r in paragraph_dedup_summary(df).collect()
    }
    assert got == _ref_paragraph_dedup(docs)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(min_size=0, max_size=30),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_bloom_never_false_negative(spark, keys):
    """The defining Bloom guarantee under adversarial keys (unicode,
    empty string, whitespace): every inserted key probes positive —
    a false negative would mean contaminated data passing as clean."""
    from tinyerp_etl_spark.operators.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame([(k,) for k in keys], "key string")
    probed = bloom_probe(
        members, "key", bloom_build(members, "key")
    ).collect()
    assert len(probed) == len(keys)
    assert all(r["bloom_hit"] == 1 for r in probed)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.sampled_from(["spark", "dup", "window", "rules", "filler", ""]),
        min_size=0,
        max_size=8,
    ).map(" ".join),
    st.integers(min_value=2, max_value=5),
)
def test_bm25_fold_equals_rebuild_any_partition(spark, extra_text, mod):
    """Law: for ANY split of a corpus into (base, batch), saving base
    then folding batch must produce an index bit-identical to a fresh
    save of the union — postings scores, stats, AND the additive
    fingerprint. Exercises the rewritten fold (fused probe, agreement
    check) over varied partitions and an adversarial extra doc
    (possibly zero-token)."""
    from tinyerp_etl_spark.operators.bm25_index import (
        bm25i_topk_indexed,
        load_bm25_index,
        save_bm25_index,
        update_bm25_index,
    )
    from tinyerp_etl_spark.operators.ivf_index import corpus_fingerprint

    import tempfile, shutil, os

    rows = [
        (i, ("spark rules " * (i % 3)) + ("window dup " * (i % 2)))
        for i in range(12)
    ] + [(12, extra_text)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = docs.filter(F.col("doc_id") % mod != 0)
    batch = docs.filter(F.col("doc_id") % mod == 0)

    scratch = tempfile.mkdtemp(prefix="bm25_prop_")
    try:
        inc, full = os.path.join(scratch, "inc"), os.path.join(scratch, "full")
        save_bm25_index(spark, inc, base)
        update_bm25_index(spark, inc, batch)
        save_bm25_index(spark, full, docs)
        fp = corpus_fingerprint(docs, "doc_id", "text")
        li, lf = load_bm25_index(spark, inc, expect_fingerprint=fp), load_bm25_index(
            spark, full, expect_fingerprint=fp
        )
        assert li is not None and lf is not None
        (ip, istats), (fpost, fstats) = li, lf
        assert istats == fstats
        terms = ["spark", "dup", "window"]
        assert (
            bm25i_topk_indexed(ip, istats, terms, k=20).collect()
            == bm25i_topk_indexed(fpost, fstats, terms, k=20).collect()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------- dup spans


def model_dup_span_coverage(texts: dict, k: int) -> dict:
    """Exact Python model of operators/dedup.dup_span_coverage: same
    ASCII \\w+ lowercase tokenizer, positional k-grams, ≥2-distinct-doc
    rule, de-overlapped covered positions, integer-ppm coverage."""
    import re

    tok = re.compile(r"\w+", re.ASCII)
    toks = {d: tok.findall((t or "").lower()) for d, t in texts.items()}
    gram_docs: dict = {}
    occs: dict = {}
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            g = " ".join(ts[i : i + k])
            gram_docs.setdefault(g, set()).add(d)
            occs.setdefault(d, []).append((i + 1, g))
    out = {}
    for d, ts in toks.items():
        cov: set = set()
        for p, g in occs.get(d, []):
            if len(gram_docs[g]) >= 2:
                cov.update(range(p, p + k))
        n = len(ts)
        out[d] = (n, len(cov), (len(cov) * 1_000_000) // n if n else 0)
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["red", "blue", "ox", "fig", "sun", "moss"]),
            max_size=14,
        ),
        min_size=2,
        max_size=5,
    )
)
def test_dup_span_coverage_matches_python_model(spark, token_lists):
    """Adversarial corpora from a 6-word alphabet (3-grams collide
    constantly, within- and cross-doc): engine coverage must equal the
    exact model doc for doc — bounds, overlap de-duplication, and the
    cross-doc-only rule all fall out of the comparison."""
    from tinyerp_etl_spark.operators.dedup import dup_span_coverage

    texts = {i + 1: " ".join(ts) for i, ts in enumerate(token_lists)}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"], r["coverage_ppm"])
        for r in dup_span_coverage(docs, k=3).collect()
    }
    assert got == model_dup_span_coverage(texts, k=3)


# ---------------- round-12 newcomers: Gopher rules + line dedup

_GOPHER_WORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with",
    "alpha", "beta", "gamma", "x", "123", "45678",
    "pneumonoultramicroscopicsilico",
]
_GOPHER_TOKENS = st.one_of(
    st.sampled_from(_GOPHER_WORDS),
    st.just("#"),
    st.just("..."),
    st.just("- bullet"),
)
_GOPHER_LINE = st.lists(_GOPHER_TOKENS, min_size=0, max_size=20).map(
    " ".join
)
_GOPHER_DOC = st.lists(_GOPHER_LINE, min_size=1, max_size=4).map(
    "\n".join
)


def ref_gopher(text: str) -> tuple[int, str]:
    """Exact Python model of operators/text.gopher_verdict (Rae et al.
    2021 A1.1, the engine's exact-integer spelling).

    Domain note: the strategy vocabulary is ASCII-ONLY by design —
    Python's \\w is Unicode while the engine's Java \\w is ASCII, so a
    non-ASCII token would diverge here while the engine stays
    consistent with its RE2 DuckDB oracle (the pair that actually
    must agree). The too_many_words (>100 000) branch is likewise
    unreachable at strategy sizes; it is pinned by the staged %115
    docs in the gated query instead."""
    import re

    toks = re.findall(r"\w+", text.lower())
    n = len(toks)
    tot = sum(len(t) for t in toks)
    n_hash = text.count("#")
    n_ell = len(re.findall(r"\.\.\.", text))
    lines = text.split("\n")
    n_lines = len(lines)
    n_bullet = sum(1 for l in lines if re.search(r"^[ \t]*[-*]", l))
    n_ell_lines = sum(1 for l in lines if l.rstrip(" ").endswith("..."))
    n_alpha = sum(1 for t in toks if re.search("[a-z]", t))
    req = {"the", "be", "to", "of", "and", "that", "have", "with"}
    n_req = len(set(toks) & req)
    if n < 50:
        v = "too_few_words"
    elif n > 100_000:
        v = "too_many_words"
    elif tot < 3 * n:
        v = "low_mean_word_len"
    elif tot > 10 * n:
        v = "high_mean_word_len"
    elif n_hash * 10 > n or n_ell * 10 > n:
        v = "high_symbol_ratio"
    elif n_bullet * 10 > 9 * n_lines:
        v = "too_many_bullets"
    elif n_ell_lines * 10 > 3 * n_lines:
        v = "too_many_ellipses"
    elif n_alpha * 10 < 8 * n:
        v = "low_alpha_ratio"
    elif n_req < 2:
        v = "low_stopword"
    else:
        v = "keep"
    return n, v


@settings(max_examples=8, deadline=None)
@given(st.lists(_GOPHER_DOC, min_size=1, max_size=25))
def test_gopher_verdict_matches_python_model(spark, docs):
    from tinyerp_etl_spark.operators.text import gopher_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "i int, text string"
    )
    got = {
        r["i"]: (r["g"]["n_words"], r["g"]["verdict"])
        for r in df.select("i", gopher_stats("text").alias("g")).collect()
    }
    for i, t in enumerate(docs):
        assert got[i] == ref_gopher(t), f"doc {t!r}: {got[i]} != {ref_gopher(t)}"


_LINE_VOCAB = st.sampled_from(
    ["same header", "footer", "unique %d", "", " ", "body text", "x y"]
)
_LINE_DOC = st.lists(_LINE_VOCAB, min_size=1, max_size=5)


def ref_line_dedup(docs: list[list[str]]) -> dict[int, tuple[int, int, str]]:
    """Exact Python model of operators/dedup.line_dedup_summary:
    non-blank (space-trim) lines in >=2 DISTINCT docs drop from every
    doc; blanks always survive; ordered reassembly."""
    owners: dict[str, set[int]] = {}
    for i, lines in enumerate(docs):
        for l in lines:
            if l.strip(" ") != "":
                owners.setdefault(l, set()).add(i)
    boiler = {l for l, o in owners.items() if len(o) >= 2}
    out = {}
    for i, lines in enumerate(docs):
        kept = [l for l in lines if l not in boiler]
        out[i] = (len(lines), len(lines) - len(kept), "\n".join(kept))
    return out


@settings(max_examples=8, deadline=None)
@given(st.lists(_LINE_DOC, min_size=1, max_size=12))
def test_line_dedup_matches_python_model(spark, raw_docs):
    from tinyerp_etl_spark.operators.dedup import line_dedup_summary

    # make the 'unique %d' template per-doc unique so generated corpora
    # hold both shared and owned lines
    docs = [
        [l % i if "%d" in l else l for l in lines]
        for i, lines in enumerate(raw_docs)
    ]
    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["clean_text"])
        for r in line_dedup_summary(df).collect()
    }
    assert got == ref_line_dedup(docs)


# ---------------------------------------------------------------- repetition
# word pool engineered so generated docs hit every repetition regime:
# repeated short words (top-gram mass), multi-word phrases that land
# as repeated n-grams, newlines (duplicate lines), and 8-token
# alignment accidents (duplicate paragraphs)
_REP_WORD = st.sampled_from(
    ["spam", "x", "longertoken", "a1", "\n", "the quick brown fox", ""]
)
_REP_DOC = st.lists(_REP_WORD, min_size=0, max_size=40).map(" ".join)


def ref_repetition(text):
    """Exact Python model of operators/text.repetition_stats (the
    same definitions the DuckDB oracle replays — floor ppm, run
    tables, longest-first dup-gram cascade)."""
    import re
    from collections import Counter

    from tinyerp_etl_spark.operators.text import GOPHER_REP_THRESHOLDS

    W = 8

    def ppm(num, den):
        return (num * 1_000_000) // den if den > 0 else 0

    def runs(items):
        c = Counter(items)
        best = max(((n, len(s)) for s, n in c.items()), default=(0, 0))
        return (
            best[0],
            best[1],
            sum(n for n in c.values() if n >= 2),
            sum(n * len(s) for s, n in c.items() if n >= 2),
        )

    text = text or ""
    toks = re.findall(r"\w+", text.lower(), re.ASCII)
    lines = text.split("\n")
    L = len(toks)
    tok_len = sum(len(t) for t in toks)
    tot_chars = tok_len + max(L - 1, 0)
    n_paras = (L + W - 1) // W
    paras = [" ".join(toks[j * W:(j + 1) * W]) for j in range(n_paras)]
    para_chars = tok_len + (L - n_paras)
    line_chars = sum(len(l) for l in lines)

    sig = {}
    _, _, di, dc = runs(lines)
    sig["dup_lines"] = ppm(di, len(lines))
    sig["dup_line_chars"] = ppm(dc, line_chars)
    _, _, di, dc = runs(paras)
    sig["dup_paras"] = ppm(di, n_paras)
    sig["dup_para_chars"] = ppm(dc, para_chars)
    for n in (2, 3, 4):
        grams = (
            [" ".join(toks[i:i + n]) for i in range(L - n + 1)]
            if L >= n
            else []
        )
        bc, bl, _, _ = runs(grams)
        sig[f"top_{n}gram"] = ppm(bc * bl, tot_chars)
    for n in range(5, 11):
        grams = (
            [" ".join(toks[i:i + n]) for i in range(L - n + 1)]
            if L >= n
            else []
        )
        _, _, _, dc = runs(grams)
        sig[f"dup_{n}gram"] = ppm(dc, tot_chars)
    verdict = "keep"
    for name, thr in GOPHER_REP_THRESHOLDS.items():
        if sig[name] > thr:
            verdict = name
            break
    return {**{f"{k}_ppm": v for k, v in sig.items()}, "verdict": verdict}


def test_nfc_triggers_fire_their_own_phenomenon(spark):
    """Each staged NFC trigger exercises exactly its normalization
    case (non-vacuity contract of nfc_normalize_docs' staging), and
    the operator's Arrow kernel agrees with a direct per-string
    Python computation."""
    import hashlib
    import unicodedata

    from tinyerp_etl_spark.operators.text import nfc_audit_summary
    from tinyerp_etl_spark.plans.llm_ops import _NFC_TRIGGERS

    # the first four are genuinely non-NFC, the last two are controls
    flags = [unicodedata.normalize("NFC", t) == t for t in _NFC_TRIGGERS]
    assert flags == [False, False, False, False, True, True]

    df = spark.createDataFrame(
        list(enumerate(_NFC_TRIGGERS)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["n_chars_nfc"], r["is_nfc"], r["nfc_md5"])
        for r in nfc_audit_summary(df).collect()
    }
    for i, t in enumerate(_NFC_TRIGGERS):
        n = unicodedata.normalize("NFC", t)
        assert got[i] == (
            len(t), len(n), int(n == t),
            hashlib.md5(n.encode()).hexdigest(),
        ), repr(t)


_NFC_TEXT = st.one_of(
    st.none(),
    # combining marks, precomposed chars, jamo, ascii — every regime
    st.text(
        alphabet="ae\u0301\u030a\u00e9\u1100\u1161 z",
        max_size=20,
    ),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_NFC_TEXT, min_size=1, max_size=12))
def test_nfc_audit_matches_python_model(spark, texts):
    """The Arrow kernel's batching/encoding is faithful: per-doc
    output equals the direct unicodedata/hashlib computation for
    generated combining-mark soups and NULLs. (The independent check
    of the NFC tables themselves is the DuckDB oracle.)"""
    import hashlib
    import unicodedata

    from tinyerp_etl_spark.operators.text import nfc_audit_summary

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["n_chars_nfc"], r["is_nfc"], r["nfc_md5"])
        for r in nfc_audit_summary(df).collect()
    }
    for i, t in enumerate(texts):
        s = t or ""
        n = unicodedata.normalize("NFC", s)
        assert got[i] == (
            len(s), len(n), int(n == s),
            hashlib.md5(n.encode()).hexdigest(),
        ), repr(t)


def ref_winnow(text):
    """Exact Python model of operators/text.winnow_fingerprints: md5
    k-gram hashes over the WINNOW_PREFIX-char prefix, sliding-window
    minima, distinct, sorted — including the two empty regimes (no
    k-gram, or fewer hashes than a window)."""
    import hashlib

    from tinyerp_etl_spark.operators.text import (
        WINNOW_KGRAM,
        WINNOW_PREFIX,
        WINNOW_WINDOW,
    )

    t = (text or "")[:WINNOW_PREFIX]
    n_grams = max(len(t) - (WINNOW_KGRAM - 1), 0)
    hashes = [
        int(hashlib.md5(t[i:i + WINNOW_KGRAM].encode()).hexdigest()[:8], 16)
        for i in range(n_grams)
    ]
    n_windows = max(n_grams - (WINNOW_WINDOW - 1), 0)
    return sorted(
        {min(hashes[j:j + WINNOW_WINDOW]) for j in range(n_windows)}
    )


_WINNOW_TEXT = st.one_of(
    st.none(),
    # short strings land every boundary regime: < k chars (no gram),
    # k..k+w-2 (grams but no full window), and repeated-substring
    # texts that collapse to few distinct minima
    st.text(alphabet="ab \n", max_size=14),
    st.text(alphabet="abcdefgh ", min_size=5, max_size=80).map(
        lambda s: s * 3
    ),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_WINNOW_TEXT, min_size=1, max_size=12))
def test_winnow_fingerprints_match_python_model(spark, texts):
    """The bound column tree (r14 rebind) returns exactly the model's
    fingerprints — same hashes, same window minima, same dedupe/sort —
    on NULL, sub-k, sub-window, and repetitive inputs."""
    from tinyerp_etl_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {
        r["i"]: list(r["f"])
        for r in df.select(
            "i", winnow_fingerprints("text").alias("f")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_winnow(t), f"text {t!r}"


def test_ppm_is_exact_floor_at_the_rounding_boundary(spark):
    """_ppm must equal Python's exact ``//`` even where floor(decimal
    division) fails: Spark's decimal(38,0)/decimal(38,0) quotient is
    HALF_UP-rounded to scale 6, so for denominators past ~2e6 a
    fractional part ≥ 1 − 5e-7 rounds across the integer boundary
    BEFORE floor — the IntegralDivide form truncates the exact
    quotient instead (r14 review finding, reproduced then fixed)."""
    from pyspark.sql import functions as F

    from tinyerp_etl_spark.operators.text import _ppm

    d = 4_000_001
    inv = pow(1_000_000, -1, d)  # n·1e6 ≡ d−1 (mod d): worst fraction
    cases = [((d - 1) * inv % d + d * k, d) for k in (0, 5, 9)] + [
        (0, 7), (3, 0), (10**13, 3), (1, 10**12)
    ]
    df = spark.createDataFrame(cases, "num long, denom long")
    got = [
        r["p"]
        for r in df.select(
            _ppm(F.col("num"), F.col("denom")).alias("p")
        ).collect()
    ]
    want = [(n * 1_000_000) // dd if dd > 0 else 0 for n, dd in cases]
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(_REP_DOC, min_size=1, max_size=15))
def test_repetition_stats_matches_python_model(spark, docs):
    from tinyerp_etl_spark.operators.text import repetition_stats

    docs = docs + [None]  # NULL text reads as '' on EVERY path
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "i int, text string"
    )
    got = {
        r["i"]: r["s"].asDict()
        for r in df.select(
            "i", repetition_stats("text").alias("s")
        ).collect()
    }
    for i, t in enumerate(docs):
        assert got[i] == ref_repetition(t), f"doc {t!r}"


def test_repetition_triggers_fire_their_own_rule(spark):
    """Each crafted staging trigger fires EXACTLY its rule — in the
    Python model AND through the Spark operator (the non-vacuity
    contract of gopher_repetition_docs' staging)."""
    from tinyerp_etl_spark.operators.text import repetition_stats
    from tinyerp_etl_spark.plans.llm_ops import _REP_TRIGGERS

    for name, text in _REP_TRIGGERS.items():
        assert ref_repetition(text)["verdict"] == name, name
    df = spark.createDataFrame(
        list(_REP_TRIGGERS.items()), "rule string, text string"
    )
    got = {
        r["rule"]: r["s"]["verdict"]
        for r in df.select(
            "rule", repetition_stats("text").alias("s")
        ).collect()
    }
    assert got == {n: n for n in _REP_TRIGGERS}


@settings(max_examples=6, deadline=None)
@given(st.lists(_REP_DOC, min_size=1, max_size=12))
def test_repetition_faces_agree(spark, docs):
    """The Arrow face (repetition_summary, production) and the column
    face (repetition_stats, the semantic reference) return identical
    rows — on generated corpora here, and on the 13 crafted staging
    triggers below."""
    from tinyerp_etl_spark.operators.text import (
        GOPHER_REP_THRESHOLDS,
        repetition_stats,
        repetition_summary,
    )
    from tinyerp_etl_spark.plans.llm_ops import _REP_TRIGGERS

    rows = [(i, t) for i, t in enumerate(docs)] + [
        (100 + i, t) for i, t in enumerate(_REP_TRIGGERS.values())
    ] + [(99, None)]  # NULL text: all-zero keep on both faces
    df = spark.createDataFrame(rows, "doc_id long, text string")
    arrow = {
        r["doc_id"]: tuple(r)[1:]
        for r in repetition_summary(df).collect()
    }
    cols = {
        r["doc_id"]: tuple(r["s"][f"{n}_ppm"] for n in GOPHER_REP_THRESHOLDS)
        + (r["s"]["verdict"],)
        for r in df.select(
            "doc_id", repetition_stats("text").alias("s")
        ).collect()
    }
    assert arrow == cols


def test_blocklist_triggers_fire_their_own_phenomenon(spark, sf_dir):
    """Each staged hostname class of domain_blocklist_filter gets
    exactly its designed verdict (non-vacuity contract of the
    staging): clean, exact hit, subdomain hit, label-boundary trap
    NOT blocked, registrable-domain hit, and nested-entry
    longest-match attribution — and no doc ever matches the unused
    blocklist entry."""
    from tinyerp_etl_spark.plans.llm_ops import LLM_QUERIES

    rows = LLM_QUERIES["domain_blocklist_filter"](spark, sf_dir).collect()
    by_mod: dict[int, tuple] = {}
    for r in rows:
        by_mod.setdefault(
            r["doc_id"] % 6,
            (r["blocked"], r["matched_domain"], r["category"]),
        )
        assert r["matched_domain"] != "unused.example"
        # every doc of one class gets the same class verdict
        assert (r["blocked"], r["matched_domain"], r["category"])[
            0 if r["doc_id"] % 6 in (2, 4) else slice(None)
        ] == by_mod[r["doc_id"] % 6][
            0 if r["doc_id"] % 6 in (2, 4) else slice(None)
        ]
    assert by_mod[0] == (False, None, None)
    assert by_mod[1] == (True, "ads.example.com", "ads")
    assert by_mod[2][0] is True and by_mod[2][1] == "ads.example.com"
    assert by_mod[3] == (False, None, None)  # notads trap stays clean
    assert by_mod[4][0] is True and by_mod[4][1] == "badsite.org"
    assert by_mod[5] == (True, "b.evil.net", "adult")  # longest wins


_BL_LABEL = st.sampled_from(
    ["a", "b", "ads", "notads", "example", "com", "net", "evil", "x"]
)
_BL_HOST = st.one_of(
    st.none(),
    st.lists(_BL_LABEL, min_size=1, max_size=5).map(".".join),
)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(_BL_HOST, min_size=1, max_size=10),
    st.lists(
        st.tuples(
            st.lists(_BL_LABEL, min_size=1, max_size=3).map(".".join),
            st.sampled_from(["ads", "adult", "malware"]),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],
    ),
)
def test_blocklist_verdicts_match_python_model(spark, hosts, bl):
    """blocklist_verdicts == the exact Python model (blocked iff any
    label-boundary suffix is listed; longest listed suffix wins the
    attribution) on generated host/blocklist soups, including hosts
    that collide with list entries only mid-label and NULL hosts."""
    from tinyerp_etl_spark.functions.localdf import local_df
    from tinyerp_etl_spark.operators.text import blocklist_verdicts

    cat = dict(bl)

    def model(h):
        if h is None:
            return (False, None, None)
        labels = h.split(".")
        suf = [".".join(labels[i:]) for i in range(len(labels))]
        m = [s for s in suf if s in cat]
        if not m:
            return (False, None, None)
        best = max(m, key=len)  # suffixes of one host differ in length
        return (True, best, cat[best])

    hosts_df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "doc_id long, hostname string"
    )
    bl_df = local_df(spark, bl, "domain string, category string")
    got = {
        r["doc_id"]: (r["blocked"], r["matched_domain"], r["category"])
        for r in blocklist_verdicts(hosts_df, bl_df).collect()
    }
    assert got == {i: model(h) for i, h in enumerate(hosts)}


def test_c4_line_triggers_fire_their_own_phenomenon(spark, sf_dir):
    """Each staged page class of c4_line_filter_docs gets exactly its
    designed verdict and line counts (non-vacuity contract): the keep
    page drops one line per rule, the brace/lorem/lonely pages fire
    their page rule, and every per-line counter is non-zero on every
    page."""
    from tinyerp_etl_spark.plans.llm_ops import LLM_QUERIES

    rows = LLM_QUERIES["c4_line_filter_docs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        m = r["doc_id"] % 7
        got = (
            r["n_lines"], r["n_kept"], r["n_drop_punct"],
            r["n_drop_short"], r["n_drop_js"], r["verdict"],
        )
        if m == 3:
            assert got == (6, 2, 2, 1, 1, "brace"), got
        elif m == 4:
            # the lorem line itself passes every LINE rule (5 words,
            # terminal period) — the PAGE rule is what kills it
            assert got == (7, 4, 1, 1, 1, "lorem_ipsum"), got
        elif m == 5:
            assert got == (3, 1, 1, 1, 0, "too_few_lines"), got
        else:
            assert got == (6, 3, 1, 1, 1, "keep"), got


_C4_WORD = st.sampled_from(
    ["alpha", "beta", "javascript", "Lorem", "ipsum", "x{", "ok",
     "a\x0Bb"]  # vertical tab inside a word: the Java-\s class edge
)
_C4_LINE = st.builds(
    lambda ws, end: " ".join(ws) + end,
    st.lists(_C4_WORD, min_size=0, max_size=7),
    # '.\r': the Java-'$'-matches-before-trailing-\r edge the
    # last-character test was chosen to close
    st.sampled_from([".", "!", "?", '"', "", " ", " .", ".\r"]),
)
_C4_PAGE = st.one_of(
    st.none(),
    st.lists(_C4_LINE, min_size=0, max_size=6).map("\n".join),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_C4_PAGE, min_size=1, max_size=10))
def test_c4_line_stats_match_python_model(spark, pages):
    """c4_line_stats + c4_doc_verdict == an exact Python model of the
    C4 line rules (first-failing attribution, byte-exact kept-line
    reassembly, page-rule precedence) on generated pages mixing
    terminal punctuation, short lines, javascript mentions, braces,
    lorem-ipsum bigrams, blank lines, and NULL pages."""
    import hashlib
    import re as _re

    from pyspark.sql import functions as F
    from tinyerp_etl_spark.operators.text import c4_doc_verdict, c4_line_stats

    def model(page):
        p = page or ""
        ls = p.split("\n")
        p1 = lambda l: l.rstrip(" ")[-1:] in ('.', '!', '?', '"')
        p2 = lambda l: len(
            [w for w in _re.split(r"[ \t\n\x0B\f\r]+", l.strip(" ")) if w]
        ) >= 5
        p3 = lambda l: "javascript" not in l.lower()
        kept = [l for l in ls if p1(l) and p2(l) and p3(l)]
        if "lorem ipsum" in p.lower():
            v = "lorem_ipsum"
        elif "{" in p:
            v = "brace"
        elif len(kept) < 3:
            v = "too_few_lines"
        else:
            v = "keep"
        return (
            len(ls),
            len(kept),
            sum(1 for l in ls if not p1(l)),
            sum(1 for l in ls if p1(l) and not p2(l)),
            sum(1 for l in ls if p1(l) and p2(l) and not p3(l)),
            v,
            hashlib.md5("\n".join(kept).encode()).hexdigest(),
        )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pages)], "doc_id long, page string"
    )
    judged = df.select("doc_id", "page", c4_line_stats("page").alias("s"))
    got = {
        r["doc_id"]: (
            r["s"]["n_lines"], r["s"]["n_kept"], r["s"]["n_drop_punct"],
            r["s"]["n_drop_short"], r["s"]["n_drop_js"], r["v"],
            r["s"]["clean_md5"],
        )
        for r in judged.select(
            "doc_id", "s", c4_doc_verdict("page", F.col("s")).alias("v")
        ).collect()
    }
    assert got == {i: model(t) for i, t in enumerate(pages)}


def test_robots_triggers_fire_their_own_phenomenon(spark, sf_dir):
    """Each staged domain class of robots_txt_filter gets exactly its
    designed verdict: example.com shows all three of its rule
    outcomes as paths cycle (disallow hit, longer-Allow override,
    no-match allow), closed.net blocks everything, tie.io resolves
    the equal-length Allow/Disallow pair to Allow, and
    open.org/empty.dev ride default-allow with a NULL rule."""
    from tinyerp_etl_spark.plans.llm_ops import LLM_QUERIES

    rows = LLM_QUERIES["robots_txt_filter"](spark, sf_dir).collect()
    assert rows
    seen_example = set()
    for r in rows:
        m5, m3 = r["doc_id"] % 5, r["doc_id"] % 3
        v = (r["allowed"], r["matched_rule"])
        if m5 == 0:
            expect = {
                0: (False, "disallow:/private"),
                1: (True, "allow:/private/ok"),
                2: (True, None),
            }[m3]
            assert v == expect, (r["doc_id"], v)
            seen_example.add(m3)
        elif m5 == 1:
            assert v == (False, "disallow:/"), (r["doc_id"], v)
        elif m5 == 3:
            assert v == (True, "allow:/dup"), (r["doc_id"], v)
        else:  # open.org / empty.dev: no rules -> default allow
            assert v == (True, None), (r["doc_id"], v)
    assert seen_example == {0, 1, 2}  # all three outcomes non-vacuous


_RB_SEG = st.sampled_from(["private", "ok", "dup", "x", "a"])
_RB_PATH = st.builds(
    lambda segs: "/" + "/".join(segs),
    st.lists(_RB_SEG, min_size=0, max_size=3),
)
_RB_DOMAIN = st.sampled_from(["d0.com", "d1.net"])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(_RB_DOMAIN, _RB_PATH), min_size=1, max_size=10),
    st.lists(
        st.tuples(_RB_DOMAIN, _RB_PATH, st.sampled_from([0, 1])),
        min_size=1,
        max_size=6,
        unique_by=lambda t: (t[0], t[1], t[2]),
    ),
)
def test_robots_verdicts_match_python_model(spark, reqs, rules):
    """robots_verdicts == the exact Python model of RFC 9309
    longest-match (Allow wins length ties; default allow) on
    generated request/rule soups, including rules that collide on
    (domain, prefix) with both types and paths that embed rule
    prefixes mid-segment."""
    from tinyerp_etl_spark.functions.localdf import local_df
    from tinyerp_etl_spark.operators.text import robots_verdicts

    def model(dom, path):
        best = None  # (len, is_allow, rule_str)
        for rd, rp, ra in rules:
            if rd == dom and path.startswith(rp):
                key = (
                    len(rp),
                    ra,
                    ("allow:" if ra else "disallow:") + rp,
                )
                if best is None or key > best:
                    best = key
        if best is None:
            return (True, None)
        return (best[1] == 1, best[2])

    reqs_df = spark.createDataFrame(
        [(i, d, p) for i, (d, p) in enumerate(reqs)],
        "doc_id long, domain string, path string",
    )
    rules_df = local_df(
        spark, rules, "domain string, prefix string, is_allow long"
    )
    got = {
        r["doc_id"]: (r["allowed"], r["matched_rule"])
        for r in robots_verdicts(reqs_df, rules_df).collect()
    }
    assert got == {i: model(d, p) for i, (d, p) in enumerate(reqs)}
