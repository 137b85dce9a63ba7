"""tinyerp_etl_spark — a PySpark-native ETL + analytics engine.

A from-scratch re-expression of the capabilities of the reference
``leonardofuson/tinyerp-etl`` (an incremental REST→PostgreSQL ETL job,
see /root/reference/tiny_api_v2_cliente.py) as an idiomatic Spark
engine:

- ``sources``   — schema-pinned readers for the relational test tables
                  and a paginated-JSON ingestion layer.
- ``functions`` — the reference's row-level semantics (locale-aware
                  numeric coercion, Brazilian date parsing, NULLIF,
                  masking) as native Column expressions — no UDFs.
- ``etl``       — the incremental layer: watermark resolution, keyed
                  MERGE upsert, page-checkpointing, pipeline driver.
- ``operators`` — analytics + LLM-data-pipeline operators: joins,
                  windows, hierarchy flatten, dedup (exact/MinHash/
                  SimHash), similarity search, text analysis,
                  multimodal column plumbing.
- ``plans``     — named queries (DataFrame builders) paired with ANSI
                  SQL oracles for differential testing against DuckDB.
- ``streaming`` — Structured Streaming mirror of the incremental layer.

Everything here is designed for a 1000-executor cluster reading ~100 TB
even though tests run on local[*]: broadcast joins for dims, partial
aggregation, partition-count discipline, Arrow-batched pandas kernels
where Spark's interpreted array expressions would dominate, and no
driver-side collects on data paths (control-plane state — watermarks,
checkpoints, centroid tables — is driver-side by design).
"""

__version__ = "0.1.0"
