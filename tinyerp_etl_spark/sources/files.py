"""Flat-file formats: CSV and JSON-lines with pinned schemas.

The reference's input is JSON over HTTP and its output is PostgreSQL —
but an engine replacing it needs the interchange formats ETL actually
meets: CSV exports and JSONL spools. Policy is identical to the
catalog's (sources/catalog.py): explicit ``StructType`` on every read,
schema inference banned on production paths — a drifted file fails
loudly instead of silently widening types.

Scale notes: both readers are splittable distributed scans (CSV splits
by line, JSONL by record); ``TIMESTAMP_FORMAT`` keeps timestamps
lossless through the text round-trip, and ``mode=FAILFAST`` surfaces
corrupt rows at read time rather than as silent NULLs downstream (the
loud-failure counterpart to the reference's 0.0-default coercion, which
remains available explicitly via functions/coerce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: lossless text form for TimestampType columns (UTC session tz)
TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write ``df`` as headered CSV; coalesced iff ``n_files`` given."""
    if n_files is not None:
        df = df.coalesce(n_files)
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", TIMESTAMP_FORMAT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Distributed CSV scan with a pinned schema (no inference)."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", TIMESTAMP_FORMAT)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write ``df`` as JSON-lines; coalesced iff ``n_files`` given."""
    if n_files is not None:
        df = df.coalesce(n_files)
    (
        df.write.mode("overwrite")
        .option("timestampFormat", TIMESTAMP_FORMAT)
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Distributed JSON-lines scan with a pinned schema (no inference)."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", TIMESTAMP_FORMAT)
        .option("mode", "FAILFAST")
        .json(path)
    )
