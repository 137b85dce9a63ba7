"""Scalar function library — native Column expressions, never UDFs."""

from tinyerp_etl_spark.functions.coerce import (
    br_date,
    br_timestamp,
    is_br_date,
    mask_token,
    nullif_empty,
    safe_double,
)
from tinyerp_etl_spark.functions.exact import (
    avg_from_cents,
    cents,
    sum_cents,
    sum_exact,
)
from tinyerp_etl_spark.functions.skew import salted_sum, two_phase_distinct

__all__ = [
    "safe_double",
    "br_date",
    "br_timestamp",
    "is_br_date",
    "nullif_empty",
    "mask_token",
    "cents",
    "sum_cents",
    "sum_exact",
    "avg_from_cents",
    "salted_sum",
    "two_phase_distinct",
]
