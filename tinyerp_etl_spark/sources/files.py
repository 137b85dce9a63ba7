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
from pyspark.sql.types import StringType, StructField, StructType

from tinyerp_etl_spark.functions.materialize import materialize

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


def write_orc(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write ``df`` as ORC (the columnar interchange sibling of parquet).

    Binary columnar with embedded schema and min/max stripe stats —
    lossless by construction (no text formatting round-trip), included
    so parquet-shop ↔ ORC-shop handoffs are first-class.
    """
    if n_files is not None:
        df = df.coalesce(n_files)
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Distributed ORC scan with a pinned schema (no inference)."""
    return spark.read.schema(schema).orc(path)


def write_xml(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write ``df`` as XML (built-in ``xml`` datasource, rowTag=row).

    The interchange format legacy ERP integrations still speak (the
    reference's world is exactly such an ERP). Values serialize as
    ISO-formatted text; the paired reader pins the schema so the
    round-trip is type-faithful, which the xml_roundtrip_orders gate
    query proves against parquet under the value hash.
    """
    if n_files is not None:
        df = df.coalesce(n_files)
    df.write.mode("overwrite").format("xml").option("rowTag", "row").save(path)


def read_xml(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Distributed XML scan with a pinned schema (no inference).

    Like every reader here: explicit schema, so a 100 TB scan never
    pays the inference pre-pass and text→type coercion is pinned.
    """
    return (
        spark.read.schema(schema)
        .format("xml")
        .option("rowTag", "row")
        .load(path)
    )


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV read split into (good_rows, quarantined_rows).

    The middle ground between FAILFAST (kill the job for one bad row —
    wrong at 100 TB, where a handful of mangled rows per billion is
    the steady state) and the reference's silent 0.0-default (ref
    tiny_api_v2_cliente.py:52-59). Malformed rows land in a
    quarantine DataFrame carrying the raw line for replay/audit; clean
    rows flow on with the pinned schema. One scan serves both outputs.
    """
    with_corrupt = StructType(
        schema.fields + [StructField("_corrupt_record", StringType())]
    )
    df = materialize(
        spark.read.schema(with_corrupt)
        .option("header", "true")
        .option("timestampFormat", TIMESTAMP_FORMAT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        # Spark requires materializing before filtering on the corrupt
        # column alone (SPARK-21610); the snapshot keeps it one scan,
        # and unlike cache() its blocks are ContextCleaner-reclaimed
        # on GC instead of leaking in the SQL CacheManager per call
    )
    bad = df.filter(df["_corrupt_record"].isNotNull()).select("_corrupt_record")
    good = df.filter(df["_corrupt_record"].isNull()).drop("_corrupt_record")
    return good, bad
