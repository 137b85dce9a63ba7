"""Incremental ETL layer: watermarks, keyed MERGE, checkpoints, pipeline."""
