"""SparkSession factory with scale-appropriate defaults.

The reference runs one Python process against PostgreSQL
(tiny_api_v2_cliente.py:62-78); our execution substrate is Spark. The
settings below are the ones that matter at 100 TB and are harmless at
test scale:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switch),
- UTC session timezone (the reference stores tz-aware UTC control
  timestamps, tiny_api_v2_cliente.py:119),
- Arrow for any pandas-UDF path,
- shuffle partitions sized by env (32 locally; a real cluster would set
  this to ~2-3x total cores or rely on AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tinyerp-etl-spark") -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # UDTFs execute Arrow-batched (ArrowEvalPythonUDTF) instead of
        # row-at-a-time BatchEvalPythonUDTF — with this, NO Python
        # operator in the engine crosses the JVM boundary per-row
        # (plan-linted across all 168 gate queries)
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        # functions/localdf.local_df depends on the pandas->Spark
        # Arrow path for its no-Python-eval plan; with fallback left
        # on, an Arrow-unmappable cell silently reverts to the
        # 32-slice Python-RDD conversion (~5 s per 1-row commit) and
        # the value-identity contract goes unverified. Fail loud.
        # (arrow.pyspark.enabled itself is set above)
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "false")
        # Parquet translates a pushed In() to per-value row-group/page
        # filters only up to this many values — BEYOND it the filter
        # silently degrades to min(values)..max(values), which for
        # uniform hash keys spans ~the whole int64 domain and prunes
        # nothing (measured under the default 10: 11 spread keys over
        # 4 M sorted rows read everything; at 1000 the same store
        # prunes 200x for concentrated key sets). 1000 matches
        # operators/span_index.SPAN_PROBE_PUSHDOWN_CAP and stays well
        # under the per-value OR-chain's JVM stack-overflow edge
        # (measured between 1200 and 1500 values on Spark 4.1). The
        # span operator re-checks the live conf and declines to push
        # past it, so a session that lowers this only loses the
        # optimization, never correctness.
        .config(
            "spark.sql.parquet.pushdown.inFilterThreshold", str(1000)
        )
        # Guarded fallback for TIMESTAMP(NANOS) testdata generations
        # (round 1 shipped ns; current files are us). The catalog sniffs
        # the parquet footer and only uses the nanos long-read path when
        # the file actually is ns; this conf merely keeps that path legal.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
