"""The reference's row-level transform semantics as native Column exprs.

Each function re-expresses one operator from SURVEY.md §2.2, preserving
the reference's quirks exactly (0.0 defaults, format fallbacks) because
those semantics are observable in downstream aggregates. All of these
are pure Catalyst expressions — they stay inside WholeStageCodegen and
cost nothing at 100 TB, unlike Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the reference's Brazilian-date validity regex (tiny_api_v2_cliente.py:134)
BR_DATE_RE = r"^\d{2}/\d{2}/\d{4}"


def safe_double(col: Column | str) -> Column:
    """Locale-aware string→double with a 0.0 (not NULL) default.

    Mirrors ``safe_float_convert`` (ref tiny_api_v2_cliente.py:52-59):
    trim, comma→dot, and *any* failure — None, empty, unparseable —
    collapses to 0.0. The 0.0-default is load-bearing: it changes SUM/
    AVG results versus a NULL-producing cast.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.trim(c.cast("string")), ",", ".")
    return F.coalesce(cleaned.try_cast("double"), F.lit(0.0))


def br_timestamp(col: Column | str) -> Column:
    """Parse 'dd/MM/yyyy HH:mm:ss' with a date-only fallback.

    Mirrors the strptime fallback chain (ref tiny_api_v2_cliente.py:
    150-151): full timestamp first, then bare date at midnight.
    Unparseable → NULL (the reference raises/skips; NULL is the
    relational equivalent).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy")),
    )


def br_date(col: Column | str) -> Column:
    """Date-typed projection of a Brazilian-format date string."""
    return br_timestamp(col).cast("date")


def is_br_date(col: Column | str) -> Column:
    """Regex validity predicate for date-text columns.

    Mirrors the SQL ``~ '^\\d{2}/\\d{2}/\\d{4}'`` filter the reference
    applies before MAX (ref tiny_api_v2_cliente.py:133-134).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(BR_DATE_RE)


def nullif_empty(col: Column | str) -> Column:
    """``NULLIF(col, '')`` — empty string → NULL before aggregation.

    Mirrors ref tiny_api_v2_cliente.py:133.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(""))


def mask_token(col: Column | str, keep: int = 5) -> Column:
    """Secret-masking projection: first ``keep`` chars + '...'.

    Mirrors the token-masking log projection (ref
    tiny_api_v2_cliente.py:230).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.substring(c, 1, keep), F.lit("..."))
