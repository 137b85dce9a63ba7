"""Structured Streaming mirror of the incremental ETL layer."""
