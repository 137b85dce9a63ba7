"""Exact-money aggregation helpers.

Floating-point SUM is not associative, so a double SUM's low bits vary
with partition count / merge order — a correctness hazard for any
engine-vs-oracle differential check *and* for run-to-run reproducibility
on a real cluster. Monetary columns in the test data carry at most 2
decimal digits, so we aggregate in integer cents: round to cents per
row (exact — the doubles sit ~1e-10 from the true cent value, nowhere
near a rounding tie), SUM as BIGINT (exact, associative), and divide at
the end (a single deterministic IEEE op). Results are then bit-identical
across partitionings and across engines.

The paired DuckDB oracle expression is
``CAST(round(x * 100) AS BIGINT)`` — see plans/oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 2) -> Column:
    """Exact integer representation of a fixed-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(10**scale)).cast("long")


def sum_exact(int_col: Column) -> Column:
    """Overflow-proof exact SUM of an integer column (decimal(38,0)).

    At 100 TB a long accumulator overflows: ~1e12 rows × up to ~1e11
    per row (the Q1 charge term) exceeds 2^63. DuckDB widens BIGINT
    sums to HUGEINT automatically; Spark's equivalent is a
    decimal(38,0) accumulator — still exact, still associative, still
    map-side combinable, and measured to cost nothing vs sum(long).
    """
    return F.sum(int_col.cast("decimal(38,0)"))


def sum_cents(col: Column | str, scale: int = 2) -> Column:
    """Exact SUM of a fixed-decimal double, returned as double."""
    return (sum_exact(cents(col, scale)) / F.lit(float(10**scale))).cast("double")


def avg_from_cents(col: Column | str, scale: int = 2) -> Column:
    """Exact-numerator AVG of a fixed-decimal double column."""
    return (
        sum_exact(cents(col, scale)) / (F.lit(float(10**scale)) * F.count(F.lit(1)))
    ).cast("double")
