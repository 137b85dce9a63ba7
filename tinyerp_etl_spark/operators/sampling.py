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
