"""Source layer: schema-pinned table readers + ingestion sources."""

from tinyerp_etl_spark.sources.catalog import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
