"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The scale story, operator by operator:

- **exact**: md5-fingerprint groupBy — one shuffle on the fingerprint,
  map-side combine collapses duplicates early.
- **n-gram Jaccard (brute)**: shingle-explode + self-join on shingle —
  correct but O(pairs sharing a shingle); the *verification* step for
  candidates, not the discovery step, at 100 TB.
- **MinHash + LSH**: the discovery step that scales — each doc maps to
  ``bands`` small keys; only docs sharing a band-bucket key ever meet
  in a shuffle. Signature computation is per-row higher-order-function
  work (no UDF, no shuffle); bucket join is an equi-join Catalyst can
  plan. Hash family: h_i(x) = (a_i·x + b_i) mod p over a 32-bit token
  hash, with fixed coefficients so runs (and the DuckDB oracle) are
  reproducible.
- **SimHash**: 32-bit sign-aggregated fingerprint; near-dups differ in
  few bits. Computed with explode+groupBy (map-side combinable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tinyerp_etl_spark.functions.materialize import materialize
from tinyerp_etl_spark.operators.text import (
    fingerprint,
    token_count,
    token_hash32,
    tokens,
)

# ---- deterministic MinHash family (mirrored literally in the oracle SQL)
MINHASH_K = 16
MINHASH_P = 4_294_967_311  # prime > 2^32
MINHASH_A = [1_000_003 + 7_919 * i for i in range(MINHASH_K)]
MINHASH_B = [12_345 + 15_485_863 * i for i in range(MINHASH_K)]
LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS

SHINGLE_K = 3  # word 3-grams

#: Max members per LSH bucket before the bucket is quarantined instead
#: of expanded into pairs. A bucket of k docs emits k·(k-1)/2 pairs
#: through ONE aggregation buffer — on duplicate-heavy data (the norm
#: for web-scale corpora) a degenerate bucket is an executor-OOM risk.
#: Members of over-cap buckets are overwhelmingly exact duplicates;
#: the contract is to route them through dedup_exact first.
DEFAULT_BUCKET_CAP = 64


def _ngrams_of(toks: F.Column, k: int) -> F.Column:
    """k-gram array from an already-bound token-array column.

    Guarded for short texts: Spark's sequence(1, 0) would generate a
    DESCENDING [1, 0] — docs with < k tokens must yield [] explicitly.
    """
    n = F.array_size(toks) - (k - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _bind_once(col: F.Column, build) -> F.Column:
    """Evaluate ``col`` once per row and feed it to ``build``.

    Catalyst does not common-subexpression-eliminate through
    higher-order functions, so an expression like ``slice(tokens(text),
    i, k)`` re-runs the tokenizer regex at every sequence position —
    measured 4× slower on 5-gram extraction. Wrapping the value in a
    1-element array and transforming binds it to a lambda variable,
    which IS evaluated exactly once.
    """
    return F.element_at(F.transform(F.array(col), build), 1)


def shingles(col) -> F.Column:
    """Distinct word-k-gram shingles of a text column (tokenizer
    evaluated once per row — see ``_bind_once``)."""
    return F.array_distinct(
        _bind_once(tokens(col), lambda toks: _ngrams_of(toks, SHINGLE_K))
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fingerprint groups with >1 member: (fingerprint, n_docs, canonical)."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one doc (min id) per content fingerprint."""
    ranked = docs.select(
        F.col(id_col), fingerprint(text_col).alias("fingerprint")
    )
    keep = ranked.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return docs.join(keep.select(id_col), id_col, "left_semi")


def _minhash_perm(i: int):
    """One-arg lambda for h_i over a PRE-HASHED shingle value — closure,
    not default args (pyspark introspects lambda arity and would treat
    defaults as HOF params)."""
    a, b = MINHASH_A[i], MINHASH_B[i]
    return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)


def minhash_signature(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sig array<long>[K]) — null-free docs only (≥1 shingle).

    The md5-based 32-bit shingle hash is computed ONCE per shingle into
    an integer array; the K permutations then run over the cheap
    integers. (K md5s per shingle — the naive formulation — dominated
    the whole near-dup pipeline's runtime before this split.)
    """
    base = docs.select(F.col(id_col), shingles(text_col).alias("__sh")).filter(
        F.array_size("__sh") > 0
    )
    hashed = base.select(
        F.col(id_col),
        F.transform("__sh", lambda s: token_hash32(s)).alias("__h"),
    )
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__h"), _minhash_perm(i)))
            for i in range(MINHASH_K)
        ]
    )
    return hashed.select(F.col(id_col), sig.alias("sig"))


def _capped_bucket_pairs(
    bands: DataFrame, id_col: str, bucket_cap: int
) -> tuple[DataFrame, DataFrame]:
    """(pairs, quarantined ids) from (id, band, key) rows, cap-bounded.

    The membership COUNT per key runs first — an unordered window over
    the (band, key) partitioning, so no aggregation buffer ever holds
    more than a count — and only under-cap keys reach the
    ``collect_set``, bounding that buffer (and the pair fan-out) by
    ``bucket_cap``. Over-cap keys route their member ids to the
    quarantine output for the caller to push through ``dedup_exact``
    first. The window and the collect_set share ONE shuffle on
    (band, key): the count costs no extra exchange (measured cheaper
    than a count-aggregate + self-join, which shuffles bands twice).
    """
    wb = Window.partitionBy("band", "key")
    tagged = bands.withColumn("__n", F.count(F.lit(1)).over(wb))
    buckets = (
        tagged.filter((F.col("__n") > 1) & (F.col("__n") <= bucket_cap))
        .groupBy("band", "key")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
    )
    pairs = (
        buckets.select(F.posexplode("ids").alias("i", "doc_a"), F.col("ids"))
        .select(
            "doc_a",
            F.explode(
                F.slice("ids", F.col("i") + 2, F.array_size("ids") - F.col("i") - 1)
            ).alias("doc_b"),
        )
        .distinct()
    )
    quarantined = (
        tagged.filter(F.col("__n") > bucket_cap).select(id_col).distinct()
    )
    return pairs, quarantined


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = DEFAULT_BUCKET_CAP,
    with_quarantine: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band bucket.

    Explode each signature into ``LSH_BANDS`` (band, key) rows — only
    docs sharing a compact bucket key ever meet, which is what makes
    MinHash-LSH viable at 100 TB.

    Pairs are generated bucket-locally: group by (band, key), collect
    the member ids, emit the i<j combinations. One signature
    computation — the self-join formulation would compute the
    (expensive) signatures once per join side. Buckets larger than
    ``bucket_cap`` never expand into pairs (a key shared by k docs
    emits k·(k-1)/2 pairs — the executor-OOM shape on duplicate-heavy
    data); their members are quarantined instead, returned as a second
    DataFrame when ``with_quarantine`` is set, to be routed through
    ``dedup_exact`` before re-running LSH.

    With ``with_quarantine`` the two outputs are DISJOINT: a doc whose
    bands span both over- and under-cap buckets is quarantined and its
    under-cap pairs are withheld, so the documented two-phase pipeline
    (consume pairs, exact-dedup the quarantine, re-run LSH on it) never
    double-processes a doc or emits conflicting pairs across phases.
    Without the flag the best-effort pair set keeps those pairs.
    """
    sigs = minhash_signature(docs, text_col, id_col)
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col("sig")[b * LSH_ROWS + r].cast("string")
                                    for r in range(LSH_ROWS)
                                ],
                            )
                        ).alias("key"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    pairs, quarantined = _capped_bucket_pairs(bands, id_col, bucket_cap)
    if not with_quarantine:
        return pairs
    q_a = quarantined.select(F.col(id_col).alias("doc_a"))
    q_b = quarantined.select(F.col(id_col).alias("doc_b"))
    disjoint = pairs.join(q_a, "doc_a", "left_anti").join(q_b, "doc_b", "left_anti")
    return disjoint, quarantined


def jaccard_counts(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact shingle-overlap counts per pair: (doc_a, doc_b, n_inter,
    n_a, n_b) — the ONE definition of the intersection/size join
    topology that jaccard_pairs (float ratio), the recall audit
    (integer threshold), and the threshold curve all consume, so the
    three can't drift.

    With ``pairs`` given, the shingle join is DRIVEN BY the candidate
    pairs (pairs ⋈ shingles(a) ⋈ shingles(b)) — cost scales with
    |candidates| · |shingles/doc|, not with the number of co-shingled
    pairs in the corpus. The all-pairs path only exists for pairs=None
    (verification/audit use).

    EAGER: constructing this frame runs the corpus tokenize + shingle
    explode immediately (the pinned-shingle pattern of
    ``lsh_neardup_verified``, and for the same reason — an eager pin
    is the only form that guarantees exactly-one cluster-wide
    execution; a lazy pin first touched by the multi-reference plan
    can recompute per BlockManager). Don't construct it
    speculatively, and don't feed it a streaming frame.
    """
    # pin the shingle rows (optimization round 14, guide §5): they
    # feed the size aggregation AND both join sides, so the tokenize +
    # shingle explode ran three times per action. Row count ≈ corpus
    # shingle occurrences — the same bounded class as
    # lsh_neardup_verified's pinned feature table. A/B at sf0.1:
    # lsh_recall_report 4.63 → 3.89 s, neardup_threshold_curve
    # 3.98 → 3.68 s, identical rows.
    sh = materialize(
        docs.select(F.col(id_col), F.explode(shingles(text_col)).alias("shingle"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    if pairs is not None:
        inter = (
            pairs.join(a, "doc_a")
            .join(b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    return inter.join(
        sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a")),
        "doc_a",
    ).join(
        sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b")),
        "doc_b",
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for given pairs (or all co-shingled pairs).

    intersection/union over distinct shingle sets; both counts are
    exact integers, so the final ratio is engine-deterministic. The
    counts come from ``jaccard_counts`` (one topology definition).
    """
    out = jaccard_counts(docs, pairs, text_col, id_col).select(
        "doc_a",
        "doc_b",
        (
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).cast("double").alias("jaccard"),
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def minhash_features_pandas(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingles, MinHash sig) via one Arrow-batched mapInPandas pass.

    Bit-identical to the expression-based ``shingles`` +
    ``minhash_signature`` (same tokenizer regex, same md5-prefix hash,
    same (a·h + b) mod p family — the oracle parity tests prove it),
    but vectorized: Spark's higher-order array lambdas run interpreted
    per element, so the K×|shingles| permutation arithmetic is ~5×
    faster as one numpy broadcast per document. This is the sanctioned
    use of the Python path: a tight numeric kernel over Arrow batches,
    not row-at-a-time logic.
    """
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    a_mat = np.array(MINHASH_A, dtype=np.int64)[:, None]
    b_mat = np.array(MINHASH_B, dtype=np.int64)[:, None]
    tok_re = re.compile(r"\w+", re.ASCII)  # match Java/RE2 ASCII \w of the column-expression twin and DuckDB oracle

    def feature_batches(batches):
        for pdf in batches:
            ids, shs, sigs, bands = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = tok_re.findall((text or "").lower())
                if len(toks) < SHINGLE_K:
                    continue
                sh = list(
                    dict.fromkeys(
                        " ".join(toks[i : i + SHINGLE_K])
                        for i in range(len(toks) - SHINGLE_K + 1)
                    )
                )
                h = np.array(
                    [
                        int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                        for s in sh
                    ],
                    dtype=np.int64,
                )
                sig = ((a_mat * h[None, :] + b_mat) % MINHASH_P).min(axis=1)
                # band keys in the same pass: md5 over the '|'-joined
                # band slice (str(int) ≡ Spark CAST(long AS STRING))
                keys = [
                    hashlib.md5(
                        "|".join(
                            str(int(sig[b * LSH_ROWS + r]))
                            for r in range(LSH_ROWS)
                        ).encode()
                    ).hexdigest()
                    for b in range(LSH_BANDS)
                ]
                ids.append(did)
                shs.append(sh)
                sigs.append(sig.tolist())
                bands.append(keys)
            if not ids:
                # an all-short batch yields NOTHING: an empty pandas
                # frame defaults its columns to float64, which Arrow
                # cannot convert to the declared list<string> types
                # (ArrowNotImplementedError) — skipping the yield is
                # the supported empty case for mapInPandas
                continue
            yield pd.DataFrame(
                {id_col: ids, "__sh": shs, "sig": sigs, "band_keys": bands}
            )

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("__sh", T.ArrayType(T.StringType())),
            T.StructField("sig", T.ArrayType(T.LongType())),
            T.StructField("band_keys", T.ArrayType(T.StringType())),
        ]
    )
    return docs.select(F.col(id_col).cast("long"), text_col).mapInPandas(
        feature_batches, schema=schema
    )


def shingle_jaccard(a_col: str, b_col: str) -> Column:
    """Exact Jaccard of two DISTINCT-shingle array columns, as a
    double — THE engine-side spelling of the set formula
    |a∩b| / (|a|+|b|−|a∩b|), shared by the fused verify pipeline and
    the persisted-index verify (operators/minhash_index.py) so the
    formula the oracles pin cannot drift between call sites."""
    n_inter = F.array_size(F.array_intersect(a_col, b_col))
    return (
        n_inter / (F.array_size(a_col) + F.array_size(b_col) - n_inter)
    ).cast("double")


def lsh_neardup_verified(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = DEFAULT_BUCKET_CAP,
) -> DataFrame:
    """Fused near-dup pipeline: shingle → MinHash → LSH → exact-verify.

    The composable primitives (minhash_signature / lsh_candidate_pairs
    / jaccard_pairs) each recompute the shingle arrays — the dominant
    cost (interpreted higher-order string expressions per doc). This
    fused form computes shingles ONCE into a materialized (id,
    shingles) table — exactly what a 100 TB run would materialize as
    its signature/shingle table — and verifies candidates with
    array_intersect on the candidate pairs only: no shingle explode, no
    shingle shuffle, intersection cost proportional to |candidates|.
    Buckets over ``bucket_cap`` are dropped, not expanded (see
    ``_capped_bucket_pairs``): run ``dedup_exact`` first so exact-dup
    floods never reach this stage.

    The feature table is pinned via ``materialize`` (eager, RDD-level
    snapshot), not DataFrame.persist: the eager action guarantees the
    mapInPandas pass runs exactly once cluster-wide (a lazy pin first
    touched by the multi-reference plan below can recompute once per
    executor — block locks are per-BlockManager), and RDD-level blocks
    are reclaimed by ContextCleaner when the returned plan is
    garbage-collected, where SQL-CacheManager persists leak for the
    application lifetime unless explicitly unpersisted (a returned
    lazy plan has no safe place to do that).
    """
    base = materialize(minhash_features_pandas(docs, text_col, id_col))
    bands = base.select(
        F.col(id_col), F.posexplode("band_keys").alias("band", "key")
    )
    pairs, _ = _capped_bucket_pairs(bands, id_col, bucket_cap)
    # The shingle table is DATA-scale (one array per doc): it must never
    # ride a broadcast, but its parquet-side size estimate can fit the
    # autoBroadcastJoinThreshold while the deserialized arrays blow the
    # driver (measured: OOM at a 10x-docs probe). Force shuffle-hash.
    a = base.select(F.col(id_col).alias("doc_a"), F.col("__sh").alias("__sh_a")).hint(
        "shuffle_hash"
    )
    b = base.select(F.col(id_col).alias("doc_b"), F.col("__sh").alias("__sh_b")).hint(
        "shuffle_hash"
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            shingle_jaccard("__sh_a", "__sh_b").alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) via iterative min-label propagation.

    The dedup-clustering step after near-dup detection: every node's
    component id converges to the minimum doc id reachable from it, so
    "keep one per cluster" is a filter on node == component. Each
    iteration is one join + one aggregation; iterations needed =
    graph diameter (near-dup clusters are shallow). Fixed-point
    detection is a driver-side emptiness check on changed labels —
    control flow, not data.
    """
    # Pin the edges BELOW the symmetrizing union: the union's two
    # branches each embed the upstream plan, so pinning sym itself
    # (the old shape) still evaluated e.g. the LSH verify pipeline
    # TWICE in the first action (measured ~6 s extra on the sf0.01
    # gate corpus). persist() — not a lineage-truncating snapshot —
    # keeps recompute-from-lineage fault tolerance on a real cluster.
    # The count() makes the pin EAGER: block locks only serialize
    # computation within one executor, so on a cluster a lazy pin
    # first touched by a many-reference plan (sym appears 4× in round
    # 0) can recompute the upstream once per executor; one cheap
    # pair-scale action guarantees the single evaluation everywhere.
    e = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).persist()
    # Every pin releases in the finally: DataFrame.persist lives in
    # the SQL CacheManager, which ContextCleaner never reclaims, so a
    # mid-loop throw (executor loss, bad edge data) would otherwise
    # leak one edge cache + one label cache per call for the
    # application lifetime — and a gate run calls this dozens of
    # times. `prev` always owns the newest live label pin (ownership
    # transfers BEFORE the action that could throw).
    prev: DataFrame | None = None
    try:
        e.count()
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        comp = (
            sym.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
        )
        for i in range(max_iterations):
            neighbor_min = (
                sym.join(comp, sym.dst == comp.node)
                .groupBy("src")
                .agg(F.min("component").alias("nbr_component"))
            )
            # persist EVERY round and count the changed labels in one
            # action: the count fully populates the cache, so the
            # fixed-point test and the next round's plan both read it —
            # each iteration's join+agg runs exactly once (unpinned,
            # round i+1 re-derived round i's work and the fixed-point
            # check re-evaluated the whole chain: O(iterations²) total
            # — the standard iterative-graph caching discipline,
            # GraphX-style). persist over a snapshot keeps lineage
            # (cluster fault tolerance) and lets the superseded round
            # be freed eagerly.
            updated = (
                comp.join(neighbor_min, comp.node == neighbor_min.src, "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_component"), F.col("component")),
                    ).alias("component"),
                    (F.col("nbr_component") < F.col("component")).alias(
                        "__changed"
                    ),
                )
                .persist()
            )
            superseded, prev = prev, updated
            # release the superseded pin even when the count action
            # throws (executor loss, bad edge data): at that point the
            # outer finally only knows about prev (= updated), so
            # without this inner finally the superseded round's
            # populated cache would leak for the application lifetime
            try:
                n_changed = updated.filter(F.col("__changed")).count()
            finally:
                if superseded is not None:
                    superseded.unpersist()
            comp = updated.select("node", "component")
            if n_changed == 0:
                break
            if (i + 1) % 5 == 0:
                # bound PLAN depth (analysis cost grows with the join
                # chain even when execution reads caches): snapshot the
                # node-scale label table — a cheap cache read — and
                # restart lineage from it; the pin behind it can then go.
                comp = materialize(comp)
                prev.unpersist()
                prev = None
        # Hand back a SNAPSHOT so no pin outlives the call: the
        # snapshot is a cheap cache read of the node-scale labels; its
        # blocks are RDD-level and ARE GC-reclaimed, and the
        # materialize() seam routes its durability.
        return materialize(comp)
    finally:
        if prev is not None:
            prev.unpersist()
        e.unpersist()


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """32-bit SimHash over distinct tokens (weight 1 each).

    explode(token) → ONE groupBy(id) with ``bits`` codegen sum
    aggregates (one per bit position, the bit extracted with a
    LITERAL power so each sum is a plain JVM expression) → sign bits
    packed into one long. All integer arithmetic; identical SQL
    exists.

    Shape notes:
    - optimization round 15 (guide §2.3 "aggregate before you
      shuffle"): the previous explode(token) × explode(bit)
      formulation shuffled up to 32 partial rows per doc per
      partition through TWO HashAggregate+Exchange pairs (groupBy
      (id, j), then groupBy(id)); the per-bit sums are now 32
      independent partial-aggregable columns of ONE aggregation, so
      the single exchange carries one 32-long row per doc per
      partition (32× fewer shuffle rows, one fewer exchange, no
      Generate for the bit axis). Interleaved A/B at sf0.1:
      simhash_docs noop 1.38 → 0.70 s min-of-3, results identical;
      simhash_neardup_docs flat (pair-join bound).
    - optimization round 14: a zero-shuffle per-doc fold (32 unrolled
      F.aggregate bit-counters over a bound hash array) was measured
      and LOST 2.6-4x both tracks (interpreted higher-order lambdas ×
      32 passes on a serial scan); the codegen aggregate stays.
    """
    tok = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn("h", token_hash32(F.col("tok")))
    # bit j of h via integer div/mod with literal 2^j (exact, portable
    # to SQL; same arithmetic as the previous power(2, j) column form)
    sums = [
        F.sum(F.expr(f"((h div {1 << j}L) % 2) * 2 - 1")).alias(f"__s{j}")
        for j in range(bits)
    ]
    pack = F.expr(
        "CAST("
        + " + ".join(f"IF(__s{j} > 0, {1 << j}L, 0L)" for j in range(bits))
        + " AS BIGINT)"
    ).alias("simhash")
    return tok.groupBy(id_col).agg(*sums).select(id_col, pack)


CONTAM_K = 8  # word-8-gram overlap unit for decontamination
DECONTAM_N = 13  # word-13-gram unit for eval-set decontamination (the
# standard: GPT-3's appendix C methodology filters training docs
# sharing any 13-gram with an eval benchmark)


def word_ngrams(col, k: int) -> F.Column:
    """Distinct word-k-grams (the generalized form of ``shingles``;
    tokenizer evaluated once per row — see ``_bind_once``)."""
    return F.array_distinct(
        _bind_once(tokens(col), lambda toks: _ngrams_of(toks, k))
    )


def word_ngram_rows(
    docs: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Exploded (id, gram) rows of distinct word-k-grams — Arrow pass.

    Produces exactly what ``explode(word_ngrams(...))`` would (same
    tokenizer regex, same space-joined grams — oracle parity proves
    it), but via one mapInPandas kernel. Measured at sf0.1 7-grams:
    0.67 s vs 0.81 s for the (tokenize-once) column-expression twin —
    Spark's interpreted array lambdas still trail the vectorized
    Python pass on heavy string building, though the gap closed from
    4× to ~1.2× once word_ngrams stopped re-running the tokenizer per
    slice (``_bind_once``).
    """
    import re

    import pandas as pd
    from pyspark.sql import types as T

    tok_re = re.compile(r"\w+", re.ASCII)  # match Java/RE2 ASCII \w of the column-expression twin and DuckDB oracle

    def gen(batches):
        for pdf in batches:
            ids: list = []
            grams: list = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = tok_re.findall((text or "").lower())
                gs = dict.fromkeys(
                    " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
                )
                ids.extend([did] * len(gs))
                grams.extend(gs)
            yield pd.DataFrame({id_col: ids, "gram": grams})

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("gram", T.StringType())]
    )
    return docs.select(F.col(id_col).cast("long"), text_col).mapInPandas(gen, schema)


def ngram_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DECONTAM_N,
    join_on_hash: bool = False,
) -> DataFrame:
    """13-gram eval-set decontamination as a hash-bucketed JOIN —
    the regime ``contamination_hits`` cannot serve.

    contamination_hits broadcasts the eval gram set to the workers —
    unbeatable when the benchmark fits driver memory, impossible when
    the reference side is itself large (a whole eval SUITE, another
    training corpus, a compliance blocklist). Here BOTH sides shingle
    to distinct (doc, gram) rows and meet in an equi-join on the gram
    key: Spark hash-partitions each side by the key, so every gram
    pair co-locates in exactly one shuffle bucket — never an
    all-pairs comparison, shuffle ∝ distinct grams, output ∝
    contaminated docs. At true scale the shuffle narrows further by
    joining on xxhash64(gram) with an in-bucket gram-equality verify;
    at gate scale the plain key join keeps the oracle exact and the
    plan shape identical.

    Output: one row per contaminated corpus doc —
    (doc_id, n_hit_grams   distinct leaked n-grams,
             n_eval_docs   distinct benchmark docs implicated).
    Docs shorter than ``n`` tokens produce no grams and cannot flag.

    ``join_on_hash=True`` is the at-scale shuffle shape: each side
    projects gram → xxhash64(gram) BEFORE the exchange and drops the
    string, so the shuffle carries an 8-byte key instead of a
    ~(13-word) string — an order of magnitude less shuffle IO for the
    same join topology. A 64-bit collision would need ~2^32 grams per
    side to become likely (birthday bound); for a FLAGGING decision
    that false-positive rate is noise, which is the same trade every
    production decontamination pipeline makes. The default stays
    exact-string so the DuckDB oracle models the engine bit-for-bit;
    test_ngram_hash_mode_matches_exact pins hash ≡ exact at test
    scale.
    """
    cg = word_ngram_rows(corpus, text_col, id_col, n)
    eg = word_ngram_rows(eval_set, text_col, id_col, n).select(
        F.col(id_col).alias("__eval_doc"), "gram"
    )
    if join_on_hash:
        cg = cg.select(id_col, F.xxhash64("gram").alias("gram"))
        eg = eg.select("__eval_doc", F.xxhash64("gram").alias("gram"))
    return (
        cg.join(eg, "gram")
        .groupBy(id_col)
        .agg(
            F.count_distinct("gram").alias("n_hit_grams"),
            F.count_distinct("__eval_doc").alias("n_eval_docs"),
        )
    )


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = CONTAM_K,
) -> DataFrame:
    """Corpus docs sharing any word-k-gram with an eval benchmark.

    The decontamination step of a training-data pipeline: a corpus
    document that contains a k-token run from the held-out benchmark
    leaks the benchmark. The benchmark side is tiny by construction
    (an eval set), so its distinct gram set ships to the Python
    workers as a broadcast SET and membership runs inside the same
    Arrow kernel that generates the corpus grams: non-hit grams are
    never materialized, never cross Arrow, never shuffle — each doc
    emits at most one (id, n_hit_grams) row, and the whole operator
    is ONE corpus scan with no shuffle at all. (Replaced a
    gram-explode + broadcast-join form: correct, but it paid Arrow
    transfer for every corpus gram; measured 2x slower. A benchmark
    too large to broadcast would bring that join form back — the
    oracle is the plain SQL join either way.)
    """
    import re

    from pyspark.sql import types as T

    spark = corpus.sparkSession
    tok_re = re.compile(r"\w+", re.ASCII)  # mirrors word_ngram_rows
    # control-plane collect: the eval TEXTS (one light scan, no Python
    # workers); grams derive driver-side with the same tokenizer the
    # kernel uses, so membership is exact
    bench_grams: set = set()
    for r in benchmark.select(text_col).collect():
        toks = tok_re.findall((r[text_col] or "").lower())
        bench_grams.update(
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        )
    b = spark.sparkContext.broadcast(bench_grams)

    def gen(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        bset = b.value
        for pdf in batches:
            ids: list = []
            counts: list = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = tok_re.findall((text or "").lower())
                n = sum(
                    1
                    for g in dict.fromkeys(
                        " ".join(toks[i : i + k])
                        for i in range(len(toks) - k + 1)
                    )
                    if g in bset
                )
                if n:
                    ids.append(did)
                    counts.append(n)
            yield pd.DataFrame({id_col: ids, "n_hit_grams": counts})

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_hit_grams", T.LongType()),
        ]
    )
    return corpus.select(F.col(id_col).cast("long"), text_col).mapInPandas(
        gen, schema
    )


def incremental_dedup(
    incoming: DataFrame,
    existing_fps: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Disposition manifest for an incoming batch vs a fingerprint store.

    The production shape of exact dedup at 100 TB: the corpus is never
    re-deduplicated — each ingest batch is checked against the stored
    fingerprint set and against itself. Per incoming doc:

    - ``dup_in_batch``  — another doc in THIS batch holds the same
      fingerprint with a smaller id (the canonical one),
    - ``dup_of_corpus`` — the batch-canonical doc's fingerprint is
      already in the store,
    - ``new``           — first sighting anywhere; its fingerprint is
      what the caller appends to the store.

    The in-batch window shuffles only the (id, fingerprint) pairs of
    the BATCH (not the corpus); the store probe is an equi-join on
    fingerprint — with the store bucketed by fingerprint it is
    shuffle-free on the store side, and only batch-sized data moves.
    """
    fp = incoming.select(
        F.col(id_col), fingerprint(text_col).alias("fingerprint")
    )
    batch_min = F.min(id_col).over(Window.partitionBy("fingerprint"))
    ranked = fp.withColumn("batch_min", batch_min)
    store = (
        existing_fps.select("fingerprint")
        .distinct()
        .withColumn("__in_store", F.lit(True))
    )
    return ranked.join(store, "fingerprint", "left").select(
        id_col,
        # the fingerprint rides along so 'new' rows can be appended to
        # the store without a second tokenize+hash pass over the batch
        "fingerprint",
        F.when(F.col(id_col) != F.col("batch_min"), F.lit("dup_in_batch"))
        .when(F.col("__in_store").isNotNull(), F.lit("dup_of_corpus"))
        .otherwise(F.lit("new"))
        .alias("disposition"),
    )


# ------------------------------------------------------------- paragraph
#
# Global paragraph-level exact dedup (the CCNet / Dolma pass): split
# every document into fixed-width token paragraphs, keep only the
# globally FIRST occurrence of each distinct paragraph (lexicographic
# (doc_id, position)), and reassemble documents from their surviving
# paragraphs. Doc-level exact dedup is the special case where every
# paragraph of a later copy drops; the paragraph grain additionally
# strips shared boilerplate out of otherwise-unique docs.

PARA_W = 8  # paragraph width in tokens (synthetic corpus has no newlines)


def paragraph_rows(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exploded (id, pos, para) rows: non-overlapping PARA_W-token
    chunks in document order; the tail chunk keeps its short remainder
    so every token belongs to exactly one paragraph. Empty docs yield
    no rows (positive-arithmetic bounds only — integer division of
    negatives rounds differently across engines)."""
    w = PARA_W
    n_paras = f"((size(__toks) + {w - 1}) div {w})"
    exploded = (
        docs.select(
            F.col(id_col), tokens(text_col).alias("__toks")
        )
        .filter(F.size("__toks") > 0)
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {n_paras} - 1),"
                    f" j -> array_join(slice(__toks, j * {w} + 1, {w}), ' '))"
                )
            ).alias("pos", "para"),
        )
    )
    return exploded


def paragraph_dedup_summary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc outcome of global first-occurrence paragraph dedup.

    Output: (id, n_paras, n_kept, n_dropped, kept_text_md5) where
    kept_text_md5 hashes the doc REASSEMBLED from its surviving
    paragraphs in original order ('' when everything dropped).

    Plan shape for 100 TB: one explode (materialized — the exploded
    rows feed BOTH the groupBy-min and the join-back side, and
    without the snapshot Spark re-tokenizes and re-explodes the whole
    corpus for each consumer), one map-side-combinable groupBy-min
    over the paragraph text (first-occurrence rule as
    min(struct(doc_id, pos)) — NO global window), one shuffle join
    back on the paragraph key, one per-doc reassembly aggregation.
    The groupBy key is the paragraph string itself; cardinality is
    bounded by corpus token count / PARA_W and hashes uniformly.
    """
    paras = materialize(paragraph_rows(docs, text_col, id_col))
    firsts = paras.groupBy("para").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first")
    )
    flagged = paras.join(firsts, "para").withColumn(
        "__keep",
        (
            (F.col(f"__first.{id_col}") == F.col(id_col))
            & (F.col("__first.pos") == F.col("pos"))
        ).cast("int"),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum("__keep").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("__keep") == 1,
                                    F.struct("pos", "para"),
                                )
                            )
                        ),
                        lambda s: s["para"],
                    ),
                    " ",
                )
            ).alias("kept_text_md5"),
        )
        .withColumn("n_dropped", F.col("n_paras") - F.col("n_kept"))
        .select(id_col, "n_paras", "n_kept", "n_dropped", "kept_text_md5")
    )


def line_dedup_summary(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    r"""Per-doc outcome of cross-document duplicated-LINE removal —
    the CCNet/C4-style boilerplate pass: any line occurring in ≥ 2
    DISTINCT documents is dropped from EVERY document, including the
    first occurrence (boilerplate — nav text, footers, cookie
    banners — has no canonical owner, unlike a duplicated paragraph
    whose first copy is content; that keep-one rule is
    paragraph_dedup_summary's). A line repeated only WITHIN one
    document stays: intra-doc repetition is the repetition profile's
    signal, not boilerplate. BLANK lines (empty after space-trim) are
    never boilerplate — they are paragraph separators, and two docs
    sharing any blank line would otherwise delete every separator
    corpus-wide (the CCNet practice: hash content lines only).
    Output (id, n_lines, n_removed, clean_text) with clean_text the
    surviving lines rejoined by \n in original order ('' when
    everything dropped). NULL text coalesces to '' before the split,
    so every input doc gets an output row — a NULL-text doc reports
    the same (n_lines=1, n_removed=0, clean_text='') as an
    empty-string doc instead of vanishing from the summary.

    Plan shape for 100 TB: one split+posexplode (materialized — it
    feeds the distinct-doc count, the join-back, and the per-doc
    totals; without the pin each consumer re-splits the corpus), one
    map-side-combinable count-distinct groupBy over the line string,
    one shuffle anti-join back on the line key, one per-doc
    reassembly aggregation bounded by the doc's own line count. No
    window, no driver collect; the groupBy key hashes uniformly and
    its cardinality is the corpus's distinct-line count.
    """
    lines = materialize(
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
            ).alias("pos", "line"),
        )
    )
    boiler = (
        lines.filter(F.trim(F.col("line")) != "")
        .groupBy("line")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    total = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    out = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return total.join(out, id_col, "left").select(
        id_col,
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("__n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def build_paragraph_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """First-occurrence paragraph index: (para, first_doc, first_pos),
    one row per distinct paragraph. The from-scratch twin of
    update_paragraph_index (rebuild contract for the fold test:
    incremental fold == full rebuild) AND the single definition of
    the first-occurrence rule both paths share."""
    return (
        paragraph_rows(docs, text_col, id_col)
        .groupBy("para")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first"))
        .select(
            "para",
            F.col(f"__first.{id_col}").alias("first_doc"),
            F.col("__first.pos").alias("first_pos"),
        )
    )


def update_paragraph_index(
    stored: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    check_order: bool = True,
    batch_firsts: DataFrame | None = None,
) -> DataFrame:
    """Fold a new batch into the stored first-occurrence paragraph
    index: (para, first_doc, first_pos) rows, one per distinct
    paragraph ever seen.

    The incremental-maintenance half of paragraph dedup (the same
    at-scale contract as the BM25 fold-in / KMV / Bloom maintenance
    ops): history is NEVER re-tokenized. Only the batch explodes; its
    within-batch first occurrences anti-join the stored paragraph
    keys, and survivors append. Correctness rests on append-only
    ingest order (an earlier (doc_id, pos) never arrives later), so
    stored rows are immutable, the fold is pure append, and a
    replayed batch folds to zero new rows (idempotent).
    ``check_order=True`` (default) enforces exactly that invariant:
    it raises if any batch paragraph already in the store PREDATES
    the stored first occurrence — the case where the fold would
    silently keep the wrong 'first'. Exact replays and out-of-order
    batches of brand-new paragraphs pass (both fold correctly); the
    probe is one control-plane count on the same para-key join the
    fold performs. Pass False only when the caller already guarantees
    ordering. Work ∝ batch + one equi-join against the index
    (shuffle-free on the store side when the store is bucketed by
    para).

    ``batch_firsts`` optionally supplies a precomputed (ideally
    materialized) ``build_paragraph_index(batch)`` so a caller that
    also probes it (the persisted fold's no-op check) tokenizes the
    batch ONCE instead of once per consumer of this lineage.
    """
    if batch_firsts is None:
        batch_firsts = build_paragraph_index(batch, text_col, id_col)
    fresh = paragraph_fresh_rows(stored, batch_firsts, check_order=check_order)
    return stored.unionByName(fresh)


def paragraph_fresh_rows(
    stored: DataFrame, batch_firsts: DataFrame, check_order: bool = True
) -> DataFrame:
    """The fold's APPEND SET: batch first-occurrences whose paragraph
    is not yet indexed — ``update_paragraph_index(stored, batch)`` ≡
    ``stored ∪ paragraph_fresh_rows(stored, build_paragraph_index(
    batch))``. Exposed so the persisted fold can commit ONLY these
    rows (an incremental commit_append, IO ∝ batch) instead of
    rewriting history. Runs the same order-violation guard."""
    if check_order:
        n_viol = (
            batch_firsts.select(
                "para",
                F.col("first_doc").alias("__bd"),
                F.col("first_pos").alias("__bp"),
            )
            .join(stored, "para")
            .filter(
                (F.col("__bd") < F.col("first_doc"))
                | (
                    (F.col("__bd") == F.col("first_doc"))
                    & (F.col("__bp") < F.col("first_pos"))
                )
            )
            .limit(1)
            .count()
        )
        if n_viol:
            raise ValueError(
                "update_paragraph_index: the batch contains a paragraph "
                "occurrence that PREDATES its stored first occurrence — "
                "out-of-order backfill would keep the wrong 'first'; "
                "rebuild the index instead (or fold batches in id order)"
            )
    return batch_firsts.join(stored.select("para"), "para", "left_anti")


# ------------------------------------------------------------ dup spans
#
# Span-level exact-substring duplicate coverage — the ExactSubstr
# signal of Lee et al., "Deduplicating Training Data Makes Language
# Models Better" (2021): for each document, what fraction of its
# tokens sits inside a k-token run that ALSO appears verbatim in
# another document? Whole-doc fingerprints miss it, MinHash only
# scores global similarity; this is the grain that catches shared
# boilerplate, quoted passages, and templated spans. The paper builds
# a corpus-wide suffix array; the distributed re-expression is
# positional k-gram rows + a gram-keyed aggregation — the same
# hash-partitioned topology as every other dedup op here, no suffix
# array and no all-pairs anything.

SPAN_K = 8  # span width in tokens at gate scale (production runs ~50)


def positional_ngram_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SPAN_K,
) -> DataFrame:
    """EVERY k-gram occurrence with its 1-based token position:
    (id, pos, gram) — unlike ``word_ngram_rows`` this keeps
    duplicates and positions, because span COVERAGE needs to know
    where each occurrence sits, not just that the gram exists.
    Pure posexplode over the (tokenize-once) gram array — JVM-side,
    no Python worker. Docs with < k tokens emit no rows."""
    grams = _bind_once(
        tokens(text_col), lambda toks: _ngrams_of(toks, k)
    )
    return docs.select(
        F.col(id_col), F.posexplode(grams).alias("pos0", "gram")
    ).select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "gram")


def dup_span_coverage(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SPAN_K,
    join_on_hash: bool = False,
) -> DataFrame:
    """Per-document duplicate-span coverage:
    (id, n_tokens, n_dup_tokens, coverage_ppm) for EVERY doc —
    ``n_dup_tokens`` counts token positions lying inside at least one
    k-gram that occurs in ≥ 2 distinct documents, ``coverage_ppm`` is
    the exact integer (n_dup_tokens·10⁶) div n_tokens (no float ever
    materializes, so oracle comparison is bit-trivial).

    Topology: one positional-gram pass (materialized once, consumed
    by both sides), a groupBy(gram) distinct-doc count to find the
    cross-doc grams — shuffle ∝ gram occurrences, map-side combine
    collapses within-partition repeats — then an equi-join back and a
    ×k explode of ONLY the duplicated occurrences into covered
    positions (count_distinct de-overlaps adjacent spans; no interval
    arithmetic needed). The ×k amplification applies to the
    duplicated subset alone — on a clean corpus that is ~0 rows, on a
    boilerplate-heavy one it is exactly the data you are about to
    delete.  ``join_on_hash=True`` is the at-scale shuffle shape
    (same contract as ``ngram_decontaminate``): both the aggregation
    and the join key become xxhash64(gram) BEFORE the exchange, so
    the two shuffles carry an 8-byte key instead of a ~k-word string;
    a 64-bit collision needs ~2^32 distinct grams to become likely
    and costs one false-covered span, the trade every production
    span-dedup run makes. Default stays exact-string so the DuckDB
    oracle models the engine bit-for-bit;
    test_dup_span_hash_mode_matches_exact pins hash ≡ exact.
    """
    pg = materialize(positional_ngram_rows(docs, text_col, id_col, k))
    key = F.xxhash64("gram") if join_on_hash else F.col("gram")
    occ = pg.select(F.col(id_col), "pos", key.alias("__k"))
    dup = (
        occ.groupBy("__k")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__k")
    )
    # Interval sweep instead of explode+count_distinct (optimization
    # round 14, guide §2.3): the old shape exploded every duplicated
    # occurrence into its k covered positions (×k rows through the
    # exchange) and de-overlapped with a count_distinct shuffle. The
    # sweep collects each doc's duplicated-occurrence START positions
    # (1 row per occurrence — k× fewer shuffle rows) and measures the
    # union of the [pos, pos+k-1] intervals in one map-side aggregate
    # over the sorted array: identical n_dup_tokens (the union measure
    # IS the distinct-position count), no second shuffle.
    covered = (
        occ.join(dup, "__k")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__ps"))
        .select(
            F.col(id_col),
            F.aggregate(
                "__ps",
                F.struct(
                    F.lit(0).cast("long").alias("cov"),
                    F.lit(0).cast("long").alias("end"),
                ),
                lambda acc, p: F.struct(
                    (
                        acc["cov"]
                        + F.greatest(
                            p + F.lit(k - 1) - F.greatest(acc["end"], p - 1),
                            F.lit(0),
                        )
                    ).alias("cov"),
                    F.greatest(acc["end"], p + F.lit(k - 1))
                    .cast("long")
                    .alias("end"),
                ),
                lambda acc: acc["cov"],
            ).alias("n_dup_tokens"),
        )
    )
    base = docs.select(
        F.col(id_col), token_count(text_col).cast("long").alias("n_tokens")
    )
    n_dup = F.coalesce(F.col("n_dup_tokens"), F.lit(0)).cast("long")
    return (
        base.join(covered, id_col, "left")
        .select(F.col(id_col), "n_tokens", n_dup.alias("n_dup_tokens"))
        .withColumn(
            "coverage_ppm",
            F.when(
                F.col("n_tokens") > 0,
                # integer div end to end — no double ever materializes,
                # so Spark and the DuckDB oracle agree bit-for-bit
                F.expr("(n_dup_tokens * 1000000) div n_tokens"),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def remove_dup_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SPAN_K,
    join_on_hash: bool = False,
) -> DataFrame:
    """The CLEANUP half of ExactSubstr dedup (Lee et al. 2021 §4:
    remove every duplicated substring occurrence but one):
    (id, n_tokens, n_removed_tokens, clean_text) for EVERY doc, where
    ``clean_text`` is the document's tokens with duplicated-span
    positions deleted — the operator that actually PRODUCES the
    deduplicated training corpus ``dup_span_coverage`` only measures.

    KEEP-ONE-CANONICAL contract (deterministic, oracle-expressible):
    for each k-gram occurring in ≥ 2 distinct documents, its CANONICAL
    occurrence is the (min doc_id, then min pos) one. A token position
    is removed iff it lies inside at least one duplicated-gram
    occurrence AND inside no canonical occurrence — so exactly one
    copy of every duplicated passage survives, whole and in place
    (positions under a canonical span are protected even where a
    non-canonical overlapping gram also covers them), and clean docs
    pass through untouched. ``clean_text`` is the kept tokens joined
    with single spaces in original order — tokenizer-normalized
    output, the form a training pipeline feeds to the tokenizer
    anyway (case/punctuation follow the ``tokens`` normalization).

    Topology = ``dup_span_coverage`` plus one gram-keyed min aggregate
    and one position anti-join: positional grams materialize ONCE and
    feed the dup-gram count, the canonical argmin, and the covered
    explode; the final reassembly is a posexplode of the tokenize-once
    array, an anti-join against removed positions (shuffle ∝ removed
    occurrences, which IS the duplicated subset), and a sort_array
    over (pos, token) structs — no window, no Python.
    ``join_on_hash`` mirrors dup_span_coverage's at-scale shape: both
    gram-keyed exchanges carry xxhash64(gram) instead of the ~k-word
    string (same collision trade, documented there).
    """
    pg = materialize(positional_ngram_rows(docs, text_col, id_col, k))
    key = F.xxhash64("gram") if join_on_hash else F.col("gram")
    occ = pg.select(F.col(id_col), "pos", key.alias("__k"))
    dup = (
        occ.groupBy("__k")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__k")
    )
    dup_occ = occ.join(dup, "__k")
    canon = dup_occ.groupBy("__k").agg(
        F.min(F.struct(F.col(id_col).alias("cid"), F.col("pos").alias("cpos"))).alias(
            "__c"
        )
    )
    # Per-doc position ARRAYS instead of exploded (id, __tok) rows
    # (optimization round 14, guide §2.3/§2.4): the old shape exploded
    # covered and protected occurrences ×k, anti-joined position rows,
    # and fed row-per-position output into the rebuild's token-level
    # anti-join. The array form shuffles one row per duplicated
    # OCCURRENCE (k× fewer rows, two small keyed aggregates), computes
    # covered∖protected per doc with array_except (bit-identical to
    # the anti-join: both are position-set difference), and hands the
    # rebuild per-doc arrays so the corpus' tokens never shuffle.
    cov = dup_occ.groupBy(id_col).agg(F.collect_list("pos").alias("__cps"))
    prot = canon.groupBy(F.col("__c.cid").alias(id_col)).agg(
        F.collect_list("__c.cpos").alias("__pps")
    )
    removed = removed_position_arrays(cov, prot, id_col, k)
    return rebuild_without_positions(docs, removed, text_col, id_col)


def remove_contaminated_spans(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SPAN_K,
    join_on_hash: bool = False,
) -> DataFrame:
    """SURGICAL eval-set decontamination: delete every k-token span of
    a training doc that appears verbatim in the benchmark set, keeping
    the rest of the document — the span machinery of ``remove_dup_
    spans`` pointed at contamination (``contamination_hits`` /
    ``ngram_decontaminate`` only FLAG the doc; dropping a whole
    100-page doc for one leaked question wastes the other 99 pages,
    so production pipelines cut the passage, not the document).

    (id, n_tokens, n_removed_tokens, clean_text) for EVERY training
    doc. No canonical protection applies — a benchmark passage has no
    legitimate copy in training data, so every covering position goes
    (contrast the dedup form, where exactly one occurrence survives).
    Topology: exact-string default (``join_on_hash=False``) is the
    small-eval-set regime — the training side's positional grams
    semi-join the benchmark's BROADCAST distinct gram set (the
    decontaminate_docs shape), the covered positions explode ∝
    contaminated occurrences only, and the reassembly is the shared
    ``rebuild_without_positions`` tail. ``join_on_hash=True`` is the
    at-scale shape for a reference side too large to broadcast: both
    sides key on xxhash64(gram) and meet in a hash-partitioned
    equi-join — an 8-byte exchange key and NO broadcast anywhere
    (the ngram_decontaminate contract; same 64-bit collision trade
    documented at dup_span_coverage). Spans per Lee et al. 2021; the
    remove-not-drop discipline follows the open-data decontamination
    practice (e.g. GPT-3 appendix C's surgical n-gram removal).
    """
    pg = positional_ngram_rows(docs, text_col, id_col, k)
    bg = positional_ngram_rows(bench, text_col, id_col, k).select(
        "gram"
    ).distinct()
    if join_on_hash:
        pg = pg.select(
            F.col(id_col), "pos", F.xxhash64("gram").alias("gram")
        )
        # no broadcast: the hash regime exists precisely for reference
        # sides over the broadcast limit — let the 8-byte keys meet in
        # a shuffled equi-join
        probe = bg.select(F.xxhash64("gram").alias("gram")).distinct()
    else:
        probe = F.broadcast(bg)
    # Same array form as remove_dup_spans (no protection here): one
    # keyed aggregate over contaminated occurrences, ×k expansion done
    # map-side inside the array, tokens never shuffle in the rebuild.
    removed = removed_position_arrays(
        pg.join(probe, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__cps")),
        None,
        id_col,
        k,
    )
    return rebuild_without_positions(docs, removed, text_col, id_col)


def removed_position_arrays(
    covered_starts: DataFrame,
    protected_starts: DataFrame | None,
    id_col: str,
    k: int,
) -> DataFrame:
    """(id, __rm array<int>): per-doc DISTINCT removed 1-based token
    positions from per-doc arrays of covered span-START positions
    (``__cps``) minus protected span-starts (``__pps``, optional) —
    the map-side set algebra shared by ``remove_dup_spans``,
    ``remove_contaminated_spans`` and the persisted-index batch clean.
    Each start expands to its [pos, pos+k-1] interval INSIDE the array
    (never through an exchange); array_except is the position-set
    difference the old exploded anti-join computed row-by-row. A doc
    whose covered positions are all protected comes back with
    ``__rm = []`` (rebuilds untouched, same as never appearing)."""

    def _expand(name: str) -> F.Column:
        return F.array_distinct(
            F.flatten(
                F.transform(
                    F.col(name), lambda p: F.sequence(p, p + (k - 1))
                )
            )
        )

    if protected_starts is None:
        return covered_starts.select(
            F.col(id_col), _expand("__cps").alias("__rm")
        )
    return covered_starts.join(protected_starts, id_col, "left").select(
        F.col(id_col),
        F.array_except(
            _expand("__cps"),
            F.coalesce(_expand("__pps"), F.array().cast("array<int>")),
        ).alias("__rm"),
    )


def rebuild_without_positions(
    docs: DataFrame,
    removed: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, n_removed_tokens, clean_text): each doc's tokens
    minus the per-doc ``__rm`` position ARRAY in ``removed`` (distinct
    1-based positions, see ``removed_position_arrays``), rejoined with
    single spaces in original order — the reassembly tail shared by
    ``remove_dup_spans`` (one-shot) and the persisted-index batch
    clean (operators/span_index).

    Optimization round 14 (guide §2.3/§2.4): the previous shape
    posexploded EVERY doc into token rows, anti-joined against removed
    positions and re-assembled with a collect_list groupBy — two
    full-corpus token-row exchanges for output that only differs on
    the affected docs. Now the only join is docs ⟗ removed (broadcast
    at bench scale; one text-bytes exchange worst-case at cluster
    scale), and the rebuild is a map-side higher-order expression:
    kept = positions 1..n minus __rm, indexed back into the
    tokenize-once array. Unaffected docs skip the set algebra
    entirely. A doc losing every token comes back as ''; NULL text
    keeps its (NULL n_tokens, NULL n_removed_tokens, '') contract —
    pinned by tests."""
    joined = docs.join(removed, id_col, "left")
    kept = _bind_once(
        tokens(text_col),
        lambda toks: F.when(
            F.col("__rm").isNull() | (F.array_size(toks) < 1), toks
        ).otherwise(
            F.transform(
                F.array_except(
                    F.sequence(F.lit(1), F.array_size(toks)),
                    F.col("__rm"),
                ),
                lambda p: F.element_at(toks, p),
            )
        ),
    )
    return joined.select(
        F.col(id_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        kept.alias("__kept"),
    ).select(
        F.col(id_col),
        "n_tokens",
        (F.col("n_tokens") - F.array_size("__kept"))
        .cast("long")
        .alias("n_removed_tokens"),
        F.concat_ws(" ", F.col("__kept")).alias("clean_text"),
    )


#: disjoint 8-bit bands over the 32-bit SimHash fingerprint — any
#: pair within Hamming radius < SIMHASH_BANDS shares at least one
#: exact band (pigeonhole), so banded candidate generation is
#: COMPLETE at the default radius, never approximate
SIMHASH_BANDS = 4


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming_max: int = 3,
    bucket_cap: int = 256,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance — the Manku/Jain/
    Sarma 2007 (WWW) web-dedup construction: fingerprints within
    Hamming radius ``hamming_max`` are candidates iff they agree on
    one of the ``SIMHASH_BANDS`` disjoint 8-bit bands, which is
    GUARANTEED for radius < bands (k flipped bits touch at most k
    bands), so banding is candidate-complete — never all-pairs, and
    unlike MinHash banding, no probabilistic recall caveat at the
    default radius. Buckets over ``bucket_cap`` are excluded from
    candidate generation (a degenerate band value pairs
    quadratically; members stay conservatively unpaired — the LSH
    bucket-cap convention, same trade, documented not silent).

    Plan: one fingerprint pass (materialized — it feeds the band
    frame and both sides of the sim lookup), a band explode (4 narrow
    rows/doc), then the SHARED capped-bucket pair kernel
    (_capped_bucket_pairs — one (band, key) shuffle: the cap count is
    a window over the same partitioning, measured cheaper than a
    count-aggregate + self-join), two id-joins back to the pinned
    fingerprints, and the exact popcount(xor) verify as a codegen
    expression.
    """
    if not (0 <= hamming_max < SIMHASH_BANDS):
        raise ValueError(
            f"hamming_max must be in [0, {SIMHASH_BANDS}) for banded "
            f"candidate generation to be complete, got {hamming_max} — "
            "raise SIMHASH_BANDS (narrower bands) for a larger radius"
        )
    from tinyerp_etl_spark.functions.materialize import materialize

    sh = materialize(simhash(docs, text_col, id_col))
    bands = sh.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))
        ).alias("band"),
        "simhash",
    ).select(
        id_col,
        "band",
        F.expr(
            "(simhash div cast(power(2, band * 8) as bigint)) % 256"
        ).alias("key"),
    )
    pairs, _quarantined = _capped_bucket_pairs(bands, id_col, bucket_cap)
    sa = sh.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a")
    )
    sb = sh.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(sim_a ^ sim_b)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
    )
