"""Python execution surface: scalar pandas UDF, grouped-agg UDAF, UDTF.

The reference has no UDFs — its two Python helpers (safe_float_convert,
parse date; ref tiny_api_v2_cliente.py:52-59, :150-151) are expressed
in this engine as native column expressions (functions/coerce.py),
which is the right default: JVM-side, codegen'd, no serialization.

This module demonstrates the *sanctioned* Python escape hatches for
when native functions genuinely can't express the op — each one
Arrow-vectorized (batch transfer, never row-at-a-time pickling):

- scalar ``pandas_udf``  — the reference's token-masking projection
  (ref :230) as a vectorized string kernel;
- grouped-aggregate ``pandas_udf`` (UDAF) — exact weighted mean via
  integer-cents accumulation inside the batch (partition-order
  invariant, hash-stable vs the oracle);
- Python UDTF (Spark 4) — one row in, N rows out, lateral-joined.

Scale notes: scalar/grouped pandas UDFs stream Arrow batches through a
worker pool pinned per executor — throughput is bounded by Arrow IPC,
not Python loops. The UDTF fan-out happens per-partition; no shuffle
is introduced by the lateral join itself.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from tinyerp_etl_spark.sources.catalog import load_table
from tinyerp_etl_spark.functions.materialize import sort_after_pin


def _mask_token_udf():
    """Vectorized secret-masking: first 5 chars + '...' (ref :230).

    Built lazily — UDF registration needs an active SparkSession, and
    plan modules import before the session exists.
    """

    @pandas_udf("string")
    def mask_token(s: pd.Series) -> pd.Series:
        return s.str.slice(0, 5) + "..."

    return mask_token


def _weighted_avg_price_udaf():
    """Quantity-weighted mean price, exact (grouped-agg pandas UDF).

    Accumulates integer cents x integer quantity inside the Arrow
    batch (int64 — exact, associative), divides once at the end, so
    the result is bit-identical at any partitioning. A float
    accumulation here would hash-mismatch the oracle.
    """

    @pandas_udf("double")
    def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        q = qty.round().astype("int64")
        num = int((cents * q).sum())
        den = int(q.sum())
        return num / (100.0 * den)

    return weighted_avg_price


def _word_positions_udtf():
    """One document in, one row per whitespace token out (UDTF)."""

    @udtf(returnType="doc_id bigint, pos int, word string")
    class WordPositions:
        def eval(self, doc_id: int, text: str):
            if text is None:
                # unnest(string_split(NULL)) yields zero rows in the
                # oracle; ('' .split) would yield one empty-word row.
                return
            for i, w in enumerate(text.split(" "), start=1):
                yield doc_id, i, w

    return WordPositions


def pandas_udf_mask_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF over customer names (token-mask projection)."""
    c = load_table(spark, sf_dir, "customer")
    mask_token = _mask_token_udf()
    return sort_after_pin(
        c.select("c_custkey", mask_token("c_name").alias("masked_name")),
        "c_custkey",
    )


def pandas_udaf_weighted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: weighted mean price per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    weighted_avg_price = _weighted_avg_price_udaf()
    return (
        li.groupBy("l_returnflag")
        .agg(
            weighted_avg_price("l_extendedprice", "l_quantity").alias("w_avg_price"),
        )
        .orderBy("l_returnflag")
    )


def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-joined Python UDTF: explode documents into (pos, word)."""
    spark.udtf.register("word_positions", _word_positions_udtf())
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).createOrReplaceTempView("docs_for_udtf")
    return sort_after_pin(
        spark.sql(
            """
            SELECT wp.doc_id, wp.pos, wp.word
            FROM docs_for_udtf d, LATERAL word_positions(d.doc_id, d.text) wp
            """
        ),
        "doc_id",
        "pos",
    )


def applyinpandas_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-event-type OLS trend line.

    The grouped-map escape hatch — each group's rows arrive as ONE
    pandas DataFrame (unlike the grouped-agg UDAF, which only returns
    a scalar). The kernel fits value-vs-day least squares from exact
    integer sums computed in arbitrary-precision Python ints (x = day
    index, y = value cents), then derives slope/intercept through one
    fixed sequence of double ops — bit-identical to the oracle's
    HUGEINT-sum closed form at any partitioning.

    Scale: one shuffle on the group key; each group streams through
    one worker as Arrow batches. Skewed group sizes would motivate the
    sum-based rewrite as a plain aggregation — this exists to pin the
    applyInPandas surface itself.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
        )
        # drop null points BEFORE the groupBy, mirroring the oracle's
        # pre-grouping filter — a group whose rows are all null must not
        # appear at all (an in-kernel dropna would still emit an
        # (event_type, 0, NULL, NULL) row for it)
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["event_type"].iloc[0]
        n = len(pdf)
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            # a single row / single distinct day has no slope — NULL,
            # mirroring the oracle's NULLIF(den, 0) division
            slope, intercept = None, None
        else:
            slope = float(num) / float(den)
            intercept = (float(sy) - slope * float(sx)) / n
        return pd.DataFrame(
            [[key, n, slope, intercept]],
            columns=["event_type", "n", "slope", "intercept"],
        )

    return (
        ev.groupBy("event_type")
        .applyInPandas(
            ols, schema="event_type string, n long, slope double, intercept double"
        )
        .orderBy("event_type")
    )


UDF_SURFACE_QUERIES = {
    "pandas_udf_mask_names": pandas_udf_mask_names,
    "pandas_udaf_weighted_price": pandas_udaf_weighted_price,
    "udtf_word_positions": udtf_word_positions,
    "applyinpandas_group_ols": applyinpandas_group_ols,
}


UDF_SURFACE_ORACLES: dict[str, str] = {
    "pandas_udf_mask_names": """
        SELECT c_custkey, substring(c_name, 1, 5) || '...' AS masked_name
        FROM customer
        ORDER BY c_custkey
    """,
    "pandas_udaf_weighted_price": """
        SELECT
          l_returnflag,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * CAST(round(l_quantity) AS BIGINT))
               / (100.0 * sum(CAST(round(l_quantity) AS BIGINT))) AS DOUBLE)
            AS w_avg_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "udtf_word_positions": """
        SELECT doc_id, CAST(pos AS INTEGER) AS pos, word
        FROM (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS word,
                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
          FROM documents
          WHERE doc_id < 200
        )
        ORDER BY doc_id, pos
    """,
    "applyinpandas_group_ols": """
        WITH pts AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                 CAST(round(value * 100) AS BIGINT) AS y
          FROM events
          WHERE ts IS NOT NULL AND value IS NOT NULL
        ),
        s AS (
          SELECT event_type,
                 count(*) AS n,
                 sum(CAST(x AS HUGEINT)) AS sx,
                 sum(CAST(y AS HUGEINT)) AS sy,
                 sum(CAST(x AS HUGEINT) * y) AS sxy,
                 sum(CAST(x AS HUGEINT) * x) AS sxx
          FROM pts
          GROUP BY event_type
        )
        SELECT event_type, n,
               CAST(CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)
                 AS DOUBLE) AS slope,
               CAST((CAST(sy AS DOUBLE)
                     - (CAST(CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)
                        AS DOUBLE))
                       * CAST(sx AS DOUBLE)) / n AS DOUBLE) AS intercept
        FROM s
        ORDER BY event_type
    """,
}
