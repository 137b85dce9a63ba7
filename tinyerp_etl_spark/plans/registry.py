"""Assembles the full queries()/oracle_sql() surface for the driver.

Each plans submodule contributes (QUERIES, ORACLES); names are globally
unique. Queries without an oracle entry (non-SQL-expressible ops) get a
rows-only check from the driver.

Ordering note (round 2): CORRECTNESS_r01.json covered exactly the first
50 registry entries, so the registry is insertion-ordered to rotate the
62 round-1-unverified queries into the front slots: LLM-pipeline ops,
TPC-H extras, the UDF surface, streaming batch-twins, and the highest
value ETL queries first; the 50 already driver-proven queries follow.
Across rounds 1+2 this gives every query a driver-side correctness row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tinyerp_etl_spark.plans import etl_queries, relational
from tinyerp_etl_spark.plans.etl_queries import ETL_ORACLES
from tinyerp_etl_spark.plans.llm_ops import LLM_ORACLES, LLM_QUERIES
from tinyerp_etl_spark.plans.oracles import RELATIONAL_ORACLES
from tinyerp_etl_spark.plans.streaming_queries import (
    STREAMING_ORACLES,
    STREAMING_QUERIES,
)
from tinyerp_etl_spark.plans.tpch_extra import TPCH_EXTRA_ORACLES, TPCH_EXTRA_QUERIES
from tinyerp_etl_spark.plans.udf_surface import UDF_SURFACE_ORACLES, UDF_SURFACE_QUERIES

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    queries: dict[str, QueryFn] = {}

    # --- slots 1-24: LLM-data-pipeline ops (round-1 unverified) ---
    queries.update(LLM_QUERIES)

    # --- slots 25-32: TPC-H extras + grouping sets (round-1 unverified) ---
    queries.update(TPCH_EXTRA_QUERIES)

    # --- slots 33-35: UDF surface (round-1 unverified) ---
    queries.update(UDF_SURFACE_QUERIES)

    # --- slots 36-39: streaming batch-twins (round-1 unverified) ---
    queries.update(STREAMING_QUERIES)

    # --- slots 40-50: priority ETL queries (round-1 unverified) ---
    queries.update(
        {
            "asof_purchase_to_view": etl_queries.asof_purchase_to_view,
            "range_join_event_bursts": etl_queries.range_join_event_bursts,
            "kmv_distinct_users": etl_queries.kmv_distinct_users,
            "scd2_user_event_history": etl_queries.scd2_user_event_history,
            "snapshot_diff_orders": etl_queries.snapshot_diff_orders,
            "replace_order_items": etl_queries.replace_order_items,
            "sessionize_user_events": etl_queries.sessionize_user_events,
            "incremental_rollup_orders": etl_queries.incremental_rollup_orders,
            "watermark_resolution_matrix": etl_queries.watermark_resolution_matrix,
            "hierarchy_subtree_rollup": etl_queries.hierarchy_subtree_rollup,
            "skew_salted_event_totals": etl_queries.skew_salted_event_totals,
        }
    )

    # --- slots 51-62: remaining round-1-unverified ETL queries ---
    queries.update(
        {
            "cohort_retention_daily": etl_queries.cohort_retention_daily,
            "longest_active_streaks": etl_queries.longest_active_streaks,
            "fuzzy_match_customers": etl_queries.fuzzy_match_customers,
            "copurchase_part_pairs": etl_queries.copurchase_part_pairs,
            "funnel_view_click_purchase": etl_queries.funnel_view_click_purchase,
            "file_format_roundtrip_orders": etl_queries.file_format_roundtrip_orders,
            "csv_quarantine_split": etl_queries.csv_quarantine_split,
            "nested_flatten_roundtrip": etl_queries.nested_flatten_roundtrip,
            "incremental_pipeline_events": etl_queries.incremental_pipeline_events,
            "json_props_rollup": etl_queries.json_props_rollup,
            "variant_props_extract": etl_queries.variant_props_extract,
            "hll_distinct_users": etl_queries.hll_distinct_users,
        }
    )

    # --- slots 63-112: queries already driver-proven in CORRECTNESS_r01 ---
    queries.update(
        {
            "q1_pricing_summary": relational.q1_pricing_summary,
            "agg_distinct_count": relational.agg_distinct_count,
            "agg_rollup": relational.agg_rollup,
            "agg_cube": relational.agg_cube,
            "audit_counts": relational.audit_counts,
            "q3_shipping_priority": relational.q3_shipping_priority,
            "q5_local_supplier_volume": relational.q5_local_supplier_volume,
            "join_left_enrich": relational.join_left_enrich,
            "join_semi_customers_with_orders": relational.join_semi_customers_with_orders,
            "join_anti_orphan_audit": relational.join_anti_orphan_audit,
            "join_full_outer_balance": relational.join_full_outer_balance,
            "window_latest_order_per_customer": relational.window_latest_order_per_customer,
            "window_running_total": relational.window_running_total,
            "window_rank_price_in_status": relational.window_rank_price_in_status,
            "topk_expensive_orders": relational.topk_expensive_orders,
            "setops_customer_nations": relational.setops_customer_nations,
            "scalar_functions_showcase": relational.scalar_functions_showcase,
            "exists_returned_orders": relational.exists_returned_orders,
            "subquery_small_quantity_revenue": relational.subquery_small_quantity_revenue,
            "scalar_subquery_rich_idle_customers": relational.scalar_subquery_rich_idle_customers,
            "conditional_agg_returnflag": relational.conditional_agg_returnflag,
            "promo_revenue_ratio": relational.promo_revenue_ratio,
            "monthly_revenue_trend": relational.monthly_revenue_trend,
            "q7_volume_shipping": relational.q7_volume_shipping,
            "q8_market_share": relational.q8_market_share,
            "q10_returned_items": relational.q10_returned_items,
            "q13_order_distribution": relational.q13_order_distribution,
            "q15_top_supplier": relational.q15_top_supplier,
            "q18_large_volume_customers": relational.q18_large_volume_customers,
            "q19_discount_revenue": relational.q19_discount_revenue,
            "groupwise_min_cheapest_parts": relational.groupwise_min_cheapest_parts,
            "sql_q6_forecast_revenue": relational.sql_q6_forecast_revenue,
            "quantiles_order_value_by_status": relational.quantiles_order_value_by_status,
            "window_moving_avg_daily_revenue": relational.window_moving_avg_daily_revenue,
            "window_navigation_showcase": relational.window_navigation_showcase,
            "datetime_functions_showcase": relational.datetime_functions_showcase,
            "pivot_status_by_priority": relational.pivot_status_by_priority,
            "unpivot_nation_balances": relational.unpivot_nation_balances,
            "setops_bag_semantics": relational.setops_bag_semantics,
            "deterministic_sample_orders": relational.deterministic_sample_orders,
            "stratified_sample_orders": relational.stratified_sample_orders,
            "gapfill_daily_revenue": relational.gapfill_daily_revenue,
            "anomaly_zscore_daily_revenue": relational.anomaly_zscore_daily_revenue,
            "array_functions_showcase": relational.array_functions_showcase,
            "null_handling_showcase": relational.null_handling_showcase,
            "coercion_showcase": relational.coercion_showcase,
            "merge_upsert_events": etl_queries.merge_upsert_events,
            "keep_latest_event_per_user": etl_queries.keep_latest_event_per_user,
            "set_null_missing_region": etl_queries.set_null_missing_region,
            "hierarchy_closure_part": etl_queries.hierarchy_closure_part,
        }
    )
    return queries


def all_oracles() -> dict[str, str]:
    oracles: dict[str, str] = {}
    oracles.update(RELATIONAL_ORACLES)
    oracles.update(TPCH_EXTRA_ORACLES)
    oracles.update(UDF_SURFACE_ORACLES)
    oracles.update(ETL_ORACLES)
    oracles.update(LLM_ORACLES)
    oracles.update(STREAMING_ORACLES)
    return oracles
