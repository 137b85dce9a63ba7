"""ETL operators exposed as oracle-checkable queries.

Each query stages a deterministic 'existing table' + 'increment' out of
the driver's test tables, applies an etl/ operator, and is mirrored by
ANSI SQL in ``ETL_ORACLES`` — so the MERGE/keep-latest/FK/hierarchy
semantics themselves are under the differential gate, not just unit
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tinyerp_etl_spark.etl.merge import (
    keep_latest,
    merge_upsert,
    set_null_on_missing_parent,
)
from tinyerp_etl_spark.operators.hierarchy import ancestor_closure
from tinyerp_etl_spark.sources.catalog import load_table


def merge_upsert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE by key (op #14): incoming wins, survivors keep, inserts land.

    existing = even event_ids (gen 1); increment = event_ids divisible
    by 3, with shifted values (gen 2). Equivalent to the reference's
    ``INSERT ... ON CONFLICT DO UPDATE`` (ref tiny_api_v2_cliente.py:
    122-123) applied to a batch.
    """
    ev = load_table(spark, sf_dir, "events")
    existing = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "value", F.lit(1).alias("gen")
    )
    incoming = ev.filter(F.col("event_id") % 3 == 0).select(
        "event_id", (F.col("value") + 1000).alias("value"), F.lit(2).alias("gen")
    )
    return merge_upsert(existing, incoming, ["event_id"]).orderBy("event_id")


def keep_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keep-latest dedupe (op #14's window): newest event per user."""
    ev = load_table(spark, sf_dir, "events")
    return keep_latest(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("user_id", "event_id", "ts", "event_type").orderBy("user_id")


def set_null_missing_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ON DELETE SET NULL semantics (ref :83): parent subset → FK nulled.

    Parents restricted to r_regionkey < 3 simulate deleted regions;
    nations pointing at them keep the row, lose the FK.
    """
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_regionkey") < 3)
    return (
        set_null_on_missing_parent(nation, region, "n_regionkey", "r_regionkey")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )


def hierarchy_closure_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point ancestor closure vs a recursive-CTE oracle.

    A deterministic tree derived from part keys (parent = key/10, roots
    < 10) — the engine's recursive-hierarchy answer (category tree, ref
    :33, :83) checked against DuckDB's WITH RECURSIVE.
    """
    part = load_table(spark, sf_dir, "part")
    edges = part.select(
        F.col("p_partkey").alias("id"),
        F.when(F.col("p_partkey") >= 10, F.floor(F.col("p_partkey") / 10))
        .alias("parent_id"),
    )
    return (
        ancestor_closure(edges, "id", "parent_id")
        .select(
            "node_id",
            "root_id",
            F.col("depth").cast("int").alias("depth"),
        )
        .orderBy("node_id")
    )


ETL_ORACLES: dict[str, str] = {
    "merge_upsert_events": """
        WITH existing AS (
          SELECT event_id, value, 1 AS gen FROM events WHERE event_id % 2 = 0
        ),
        incoming AS (
          SELECT event_id, value + 1000 AS value, 2 AS gen
          FROM events WHERE event_id % 3 = 0
        )
        SELECT e.event_id, e.value, e.gen
        FROM existing e
        WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.event_id = e.event_id)
        UNION ALL
        SELECT event_id, value, gen FROM incoming
        ORDER BY event_id
    """,
    "keep_latest_event_per_user": """
        SELECT user_id, event_id, ts, event_type
        FROM (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ) AS rn
          FROM events
        )
        WHERE rn = 1
        ORDER BY user_id
    """,
    "set_null_missing_region": """
        SELECT
          n_nationkey,
          n_name,
          CASE WHEN r.r_regionkey IS NULL THEN NULL ELSE n_regionkey END AS n_regionkey
        FROM nation n
        LEFT JOIN (SELECT r_regionkey FROM region WHERE r_regionkey < 3) r
          ON n.n_regionkey = r.r_regionkey
        ORDER BY n_nationkey
    """,
    "hierarchy_closure_part": """
        WITH RECURSIVE edges AS (
          SELECT p_partkey AS id,
                 CASE WHEN p_partkey >= 10
                      THEN CAST(floor(p_partkey / 10) AS BIGINT) END AS parent_id
          FROM part
        ),
        closure AS (
          SELECT id AS node_id, id AS root_id, 0 AS depth
          FROM edges WHERE parent_id IS NULL
          UNION ALL
          SELECT e.id, c.root_id, c.depth + 1
          FROM edges e JOIN closure c ON e.parent_id = c.node_id
        )
        SELECT node_id, root_id, CAST(depth AS INT) AS depth
        FROM closure
        ORDER BY node_id
    """,
}
