"""Deterministic sampling operators.

TABLESAMPLE / rand() are nondeterministic across retries, partitions,
and engines; every sampler here is a pure predicate on a content hash
(the portable md5-prefix hash, mirrored in DuckDB), so a sample is
reproducible under re-runs and task retries, pushable into the scan,
and — because it is per-row with no state — embarrassingly parallel at
any scale. Rates are expressed in exact per-10000 integer thresholds
so both engines compare the same integers (no float-boundary drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from tinyerp_etl_spark.functions.localdf import local_df

MYRIAD = 10_000  # hash-bucket space: rates resolve to 1/10000ths


def hash_bucket(col: Column | str, buckets: int = MYRIAD) -> Column:
    """Stable per-row bucket in [0, buckets): md5-prefix hash mod."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return h % buckets


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
) -> DataFrame:
    """Per-stratum deterministic sample (the ``sampleBy`` analog).

    Each stratum keeps rows whose key-hash bucket falls below
    ``round(rate * 10000)``; strata absent from ``rates`` are dropped.
    Unlike ``DataFrame.sampleBy`` the result is exactly reproducible
    (content-hash predicate, no RNG seed / partition dependence) — the
    property a training-data pipeline needs for auditable subsampling.
    """
    thresholds = {s: int(round(r * MYRIAD)) for s, r in rates.items()}
    bar: Column | None = None
    for s, t in thresholds.items():
        cond = F.col(strata_col) == s
        bar = F.when(cond, t) if bar is None else bar.when(cond, t)
    assert bar is not None, "rates must be non-empty"
    return df.filter(hash_bucket(key_col) < bar.otherwise(F.lit(0)))


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    id_col: str,
    with_rank: bool = False,
    salt_buckets: int | None = None,
) -> DataFrame:
    """At most ``cap`` rows per key, chosen deterministically — the
    crawl-balancing primitive ("no more than N documents per domain")
    that keeps a single mega-site from dominating a training mix where
    a RATE-based sampler cannot (a 10% rate of a 100M-page domain is
    still 10M pages; a cap is an absolute ceiling).

    Selection order within a key is (md5(id), id): content-hashed so
    the kept subset is an unbiased, reproducible draw (ingest order
    and partitioning never leak into it), id tie-broken so the rank is
    total. Default plan: one partitioned window per key — the per-key
    row sets shuffle once on ``key_col``, and a skewed mega-key sorts
    ∝ its own size in ONE task. At 100 TB that single task is the
    skew hazard this operator's OWN input is guaranteed to have (a
    capped mega-domain IS a mega-key), so ``salt_buckets=B`` switches
    to the two-phase top-N: phase 1 ranks within (key, id-hash bucket)
    — each task sorts ≤ keysize/B rows — and keeps each bucket's local
    top-``cap``; phase 2 ranks the ≤ cap·B survivors per key exactly.
    EXACT by construction, not approximate: every row of the true
    per-key top-``cap`` has fewer than ``cap`` predecessors globally,
    hence fewer in its own bucket, so phase 1 can never drop it. Same
    output as the default plan row for row (pinned by test).
    ``with_rank=True`` keeps the 1-based selection rank (``rk``) for
    auditability.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if with_rank and "rk" in df.columns:
        raise ValueError(
            "cap_per_key(with_rank=True) emits its rank as 'rk' but the "
            "input already has that column — rename one of the two"
        )
    from pyspark.sql.window import Window

    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    src = df
    if salt_buckets is not None:
        if salt_buckets < 1:
            raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
        w1 = Window.partitionBy(key_col, "__cap_b").orderBy(*order)
        src = (
            df.withColumn("__cap_b", hash_bucket(id_col, salt_buckets))
            .withColumn("__cap_lr", F.row_number().over(w1))
            .filter(F.col("__cap_lr") <= cap)
            .drop("__cap_b", "__cap_lr")
        )
    w = Window.partitionBy(key_col).orderBy(*order)
    # internal name so an existing caller column is never overwritten
    # (and never silently dropped on the with_rank=False path)
    out = src.withColumn(
        "__cap_rk", F.row_number().over(w).cast("long")
    ).filter(F.col("__cap_rk") <= cap)
    if with_rank:
        return out.withColumnRenamed("__cap_rk", "rk")
    return out.drop("__cap_rk")


def mixture_thresholds(
    df: DataFrame, domain_col: str, weights_10k: dict[str, int]
) -> DataFrame:
    """Per-domain keep thresholds that resample ``df`` to a target mix.

    Training corpora are mixed to target proportions (so much web, so
    much code, ...); given integer weights summing to 10000, this
    derives the largest total budget the data supports (the scarcest
    domain relative to its weight binds) and the per-domain hash
    threshold that hits it. ALL arithmetic is integer — floor
    divisions on counts — so any engine derives bit-identical
    thresholds from the same counts:

        capacity_d = (10000 * count_d) // w10k_d   (total mix size if
                                                    d were the binder)
        budget     = min_d capacity_d              (docs in the mix)
        t_d        = (budget * w10k_d) // count_d  (per-10000 keep rate)

    Domains absent from ``weights_10k`` are dropped (threshold 0).
    Weighted domains absent from the DATA are excluded from the budget
    derivation: the binding-minimum is taken over domains actually
    present, i.e. the recipe renormalizes over what exists rather than
    collapsing to an empty mix (a zero-count domain would otherwise
    force budget 0). The shortfall is visible in the output — the
    missing domain simply has no row — so callers that require every
    weighted domain should assert on the returned dimension.
    Returns one row per PRESENT domain: ``(domain, n_total,
    threshold_10k)`` — a broadcast-size dimension to join against the
    corpus; the counts aggregation is the only data-plane pass.
    """
    w_rows = [(d, int(w)) for d, w in weights_10k.items()]
    assert w_rows and all(w > 0 for _, w in w_rows), (
        "weights_10k must be positive (a zero weight means: omit the domain)"
    )
    assert sum(w for _, w in w_rows) == MYRIAD, (
        "weights_10k must sum to exactly 10000 — the integer threshold "
        "derivation treats them as fractions of the total mix"
    )
    weights = local_df(
        df.sparkSession, w_rows, f"{domain_col} string, w10k int"
    )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_total"))
    # `div` is integral division on longs — bit-identical to the
    # oracle's `//`, no double-rounding hazard.
    caps = counts.join(F.broadcast(weights), domain_col, "inner").withColumn(
        "capacity", F.expr(f"({MYRIAD}L * n_total) div w10k")
    )
    budget = caps.agg(F.min("capacity").cast("long").alias("budget"))
    return (
        caps.crossJoin(F.broadcast(budget))
        .select(
            domain_col,
            "n_total",
            F.least(
                F.lit(MYRIAD).cast("long"),
                F.expr("(budget * w10k) div n_total"),
            ).alias("threshold_10k"),
        )
    )


def mixture_resample(
    df: DataFrame, domain_col: str, key_col: str, weights_10k: dict[str, int]
) -> DataFrame:
    """Deterministically resample ``df`` toward the target domain mix.

    Broadcast-joins the :func:`mixture_thresholds` dimension and keeps
    rows whose content-hash bucket clears the domain's threshold —
    one scan, one broadcast join, no shuffle of the corpus, fully
    reproducible under retries. The standard data-mixing step of an
    LLM pre-training pipeline, expressed as a pushable predicate.
    """
    dim = mixture_thresholds(df, domain_col, weights_10k)
    return (
        df.join(F.broadcast(dim), domain_col, "inner")
        .filter(hash_bucket(key_col) < F.col("threshold_10k"))
        .drop("n_total", "threshold_10k")
    )


# --------------------------------------------------------------- DSIR
# Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
# featurize documents as hashed n-gram counts, fit bag-of-hashed-ngrams
# models on a TARGET sample (the domain you want more of) and on the
# RAW pool, and weight every raw document by its log-likelihood ratio
# log p_target(x) - log q_raw(x). High-ratio docs "look like" the
# target; resampling by the ratio shifts the corpus toward the target
# distribution. Float-free variant of the paper's estimator: bucket
# log-probs are integer BITS via bit_length (the unigram_surprisal
# trick, operators/text.py), add-one smoothed, so both engines derive
# bit-identical scores with no transcendental function.

#: hashed-ngram feature space (the paper uses 10k at web scale; tests
#: run smaller so every bucket is populated at tiny SFs)
DSIR_BUCKETS = 128
#: per-gram score scale: mean llr is reported in milli-bits per gram
DSIR_SCORE_SCALE = 1000


def dsir_grams(col: Column | str) -> Column:
    """Unigram + bigram feature grams of a document (the paper's
    featurization). Pure array expressions; <2-token docs contribute
    their unigrams only, empty docs an empty array. Tokenizer bound
    once per row (dedup._bind_once — Catalyst does not CSE through
    higher-order functions, so an unbound ``tokens(col)`` would re-run
    the regex at every bigram position) and the guarded k-gram builder
    reused rather than re-spelled."""
    from tinyerp_etl_spark.operators.dedup import _bind_once, _ngrams_of
    from tinyerp_etl_spark.operators.text import tokens

    return _bind_once(
        tokens(col), lambda toks: F.concat(toks, _ngrams_of(toks, 2))
    )


def dsir_gram_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-doc hashed-gram bucket counts ``(id, bucket, cnt)``.

    One explode + one keyed aggregation (map-side combinable — the
    shuffle carries at most n_buckets rows per doc, not gram
    occurrences). The bucket hash is the engine-wide portable
    md5-prefix hash, so the oracle reproduces it exactly.
    """
    g = docs.select(
        F.col(id_col), F.explode(dsir_grams(text_col)).alias("gram")
    )
    return (
        g.withColumn("bucket", hash_bucket(F.col("gram"), n_buckets))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def dsir_bucket_bits(
    feats: DataFrame, n_buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Bag-of-hashed-ngrams model as integer rarity bits per bucket.

    ``bits[b] = bit_length((total + B) // (count_b + 1))`` — add-one
    smoothing so empty buckets are finite, bit_length ≈ -log2 p. The
    model is COMPLETE (all B rows, absent buckets at count 0) so
    downstream joins never need an outer side; B rows is broadcast
    size by construction.

    The ≤B-row bucket aggregation is pinned (materialize) and the
    total derived FROM it — without the pin, the total would be a
    second full scan of ``feats``' upstream DAG (for an unpinned
    featurization plan that means tokenizing the corpus twice per
    model fit).
    """
    from tinyerp_etl_spark.functions.materialize import materialize

    spark = feats.sparkSession
    buckets = spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    counts = materialize(
        feats.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("bcnt"))
    )
    total = counts.agg(
        F.coalesce(F.sum("bcnt"), F.lit(0)).cast("long").alias("btotal")
    )
    return (
        buckets.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.length(
                F.bin(
                    F.expr(
                        f"(btotal + {n_buckets}L) div "
                        "(coalesce(bcnt, 0L) + 1L)"
                    )
                )
            )
            .cast("long")
            .alias("bits"),
        )
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-raw-doc DSIR importance score.

    ``llr_bits = Σ_b cnt_b · (bits_raw[b] − bits_target[b])`` — the
    integer-bits log-likelihood ratio log p_target − log q_raw (raw
    rarity minus target rarity: positive = target-like).
    ``score_mbits`` is the length-normalized form (milli-bits per
    gram) so a long document cannot outrank a short one on bulk
    alone; `div` truncates identically in Spark and DuckDB, including
    the negative scores a typical raw doc earns.

    Plan: two feature aggregations (raw + target), two B-row models
    broadcast onto the raw features, one per-doc aggregation. Only
    the raw corpus's bucket rows shuffle; docs with zero grams carry
    no evidence and are absent (documented, the surprisal contract).
    """
    from tinyerp_etl_spark.functions.materialize import materialize

    # the raw featurization (tokenize + explode + md5 bucket hash) is
    # the expensive pass and feeds BOTH the raw model and the per-doc
    # join — pin it once so it never runs twice (the target side is
    # read once, no pin needed)
    fr = materialize(dsir_gram_buckets(raw, text_col, id_col, n_buckets))
    # the target side feeds ONLY the bucket model, so its id column is
    # irrelevant (and need not exist): featurize under a constant id —
    # per-bucket sums are identical, per-doc identity never used
    ft = dsir_gram_buckets(
        target.select(F.lit(0).cast("long").alias(id_col), F.col(text_col)),
        text_col,
        id_col,
        n_buckets,
    )
    return dsir_llr_scores(fr, fr, ft, id_col, n_buckets)


def dsir_llr_scores(
    feats: DataFrame,
    q_counts: DataFrame,
    p_counts: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The scoring tail shared by the one-shot and store-backed paths:
    score the per-doc features ``feats`` (id, bucket, cnt) under the
    raw model derived from ``q_counts`` and the target model from
    ``p_counts`` (each any frame with (bucket, cnt) — per-doc features
    OR an already-aggregated persisted model).

    Optimization round 14 (guide §2.2/§3.1): the two models used to be
    built independently (``dsir_bucket_bits`` each: its own pinned
    bucket aggregation, its own total, its own broadcast) and joined
    onto the features one after the other — two eager materialization
    jobs and two broadcast hash joins per scoring call, for two
    128-row frames derived by the same formula. Both sides now
    aggregate in ONE tagged union pass into a single pinned ≤B-row
    frame carrying (bcnt_q, bcnt_p); both totals derive from that one
    frame; and the features take ONE broadcast join against the
    combined (bits_q, bits_p) model. Bit-identical bits (same
    add-one-smoothed integer formula per side), half the model jobs,
    half the scoring joins. The ≤B-row pin keeps the guarantee that
    the model side of the union is aggregated once, not re-derived
    for the totals (for the one-shot path that upstream is the pinned
    featurization; for the store path it is the store scan + the
    target featurization)."""
    from tinyerp_etl_spark.functions.materialize import materialize

    spark = feats.sparkSession
    tagged = q_counts.select(
        "bucket", F.col("cnt"), F.lit(True).alias("__q")
    ).unionByName(
        p_counts.select("bucket", F.col("cnt"), F.lit(False).alias("__q"))
    )
    counts = materialize(
        tagged.groupBy("bucket").agg(
            F.sum(F.when(F.col("__q"), F.col("cnt")))
            .cast("long")
            .alias("bcnt_q"),
            F.sum(F.when(~F.col("__q"), F.col("cnt")))
            .cast("long")
            .alias("bcnt_p"),
        )
    )
    totals = counts.agg(
        F.coalesce(F.sum("bcnt_q"), F.lit(0)).cast("long").alias("btotal_q"),
        F.coalesce(F.sum("bcnt_p"), F.lit(0)).cast("long").alias("btotal_p"),
    )
    buckets = spark.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )

    def _bits(side: str) -> F.Column:
        return (
            F.length(
                F.bin(
                    F.expr(
                        f"(btotal_{side} + {n_buckets}L) div "
                        f"(coalesce(bcnt_{side}, 0L) + 1L)"
                    )
                )
            )
            .cast("long")
            .alias(f"bits_{side}")
        )

    model = (
        buckets.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select("bucket", _bits("q"), _bits("p"))
    )
    per = (
        feats.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(F.col("cnt") * (F.col("bits_q") - F.col("bits_p")))
            .cast("long")
            .alias("llr_bits"),
        )
    )
    return per.withColumn(
        "score_mbits",
        F.expr(f"(llr_bits * {DSIR_SCORE_SCALE}L) div n_grams"),
    )


def dsir_keep_threshold(scores: DataFrame, keep_ppm: int) -> DataFrame:
    """Score threshold that keeps ~keep_ppm of the scored docs.

    Deterministic whole-tie-group semantics: keep every score value v
    whose ≥-cumulative count fits the budget N = (n·keep_ppm) div 1e6
    — never split a tie by id (two identically-scored docs share a
    fate), never exceed N. Derived WITHOUT a global row sort: one
    value-count aggregation, then the ≥-cumulative via a non-equi
    self-join of the aggregated frame (value-domain sized — the
    score is mean milli-bits per gram, bounded by the 64-bit rarity
    range, so the frame is broadcast class regardless of corpus
    size). Returns one row ``(threshold_mbits)``; NULL when even the
    top tie-group exceeds the budget (keep nothing).
    """
    if not (0 <= keep_ppm <= 1_000_000):
        raise ValueError(f"keep_ppm must be in [0, 1e6], got {keep_ppm}")
    vc = scores.groupBy("score_mbits").agg(
        F.count(F.lit(1)).cast("long").alias("vcnt")
    )
    n = scores.agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    cum = (
        vc.alias("a")
        .join(
            F.broadcast(vc.select(F.col("score_mbits").alias("v2"),
                                  F.col("vcnt").alias("vcnt2"))),
            F.col("v2") >= F.col("score_mbits"),
        )
        .groupBy("score_mbits")
        .agg(F.sum("vcnt2").cast("long").alias("cum_ge"))
    )
    return (
        cum.crossJoin(F.broadcast(n))
        .filter(
            F.col("cum_ge") * F.lit(1_000_000)
            <= F.col("n_raw") * F.lit(keep_ppm)
        )
        .agg(F.min("score_mbits").alias("threshold_mbits"))
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    keep_ppm: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Score + select in one call: every scored raw doc with its
    ``keep`` verdict (audit manifest form, like the curation
    pipeline's — filter on ``keep`` for the selected subset).

    The scored frame is materialized once (functions/materialize —
    durability-routable, GC-reclaimed): the threshold derivation and
    the final select both read it, and without the pin each would
    re-run the full featurize+model DAG from the source scan.
    """
    return dsir_select(
        dsir_scores(raw, target, text_col, id_col, n_buckets),
        keep_ppm,
        id_col,
    )


def dsir_select(
    scores: DataFrame, keep_ppm: int, id_col: str = "doc_id"
) -> DataFrame:
    """Threshold-select an already-scored frame (the tail shared by
    the one-shot and store-backed paths); materializes ``scores`` so
    the threshold derivation and the final select never re-run its
    upstream DAG."""
    from tinyerp_etl_spark.functions.materialize import materialize

    scores = materialize(scores)
    thr = dsir_keep_threshold(scores, keep_ppm)
    return scores.crossJoin(F.broadcast(thr)).select(
        id_col,
        "n_grams",
        "llr_bits",
        "score_mbits",
        F.coalesce(
            F.col("score_mbits") >= F.col("threshold_mbits"), F.lit(False)
        ).alias("keep"),
    )
