"""DuckDB oracle SQL — one ANSI statement per named query.

Column aliases MUST match the Spark query exactly (the driver sorts
columns by name before hashing). Monetary aggregates use the same
integer-cents construction as functions.exact so both engines produce
bit-identical doubles: CAST(round(x*100) AS BIGINT) per row → exact
integer SUM → one final division.
"""

from __future__ import annotations

# shorthand used throughout: exact cents of a 2-decimal double column
_C = "CAST(round({col} * 100) AS BIGINT)"


RELATIONAL_ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT
          l_returnflag,
          l_linestatus,
          sum(l_quantity) AS sum_qty,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))
                   * (100 + CAST(round(l_tax*100) AS BIGINT))) / 1e6 AS DOUBLE) AS sum_charge,
          CAST(sum(l_quantity) / count(*) AS DOUBLE) AS avg_qty,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) / (100.0 * count(*)) AS DOUBLE) AS avg_price,
          CAST(sum(CAST(round(l_discount*100) AS BIGINT)) / (100.0 * count(*)) AS DOUBLE) AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "agg_distinct_count": """
        SELECT
          o_orderstatus,
          count(DISTINCT o_custkey) AS n_customers,
          count(*) AS n_orders,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_price,
          min(o_orderdate) AS first_order,
          max(o_orderdate) AS last_order
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "agg_rollup": """
        SELECT
          l_returnflag,
          l_linestatus,
          sum(l_quantity) AS sum_qty,
          count(*) AS n_rows,
          CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, gid
    """,
    "agg_cube": """
        SELECT
          o_orderstatus,
          o_orderpriority,
          count(*) AS n_orders,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_price,
          CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST, gid
    """,
    "audit_counts": """
        SELECT 'region' AS table_name, count(*) AS n_rows FROM region
        UNION ALL SELECT 'nation', count(*) FROM nation
        UNION ALL SELECT 'customer', count(*) FROM customer
        UNION ALL SELECT 'supplier', count(*) FROM supplier
        UNION ALL SELECT 'part', count(*) FROM part
        UNION ALL SELECT 'orders', count(*) FROM orders
        UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        ORDER BY table_name
    """,
    "data_profile_orders": """
        WITH stacked AS (
          SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS v_str,
                 CAST(o_orderkey AS BIGINT) AS v_num FROM orders
          UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR),
                 CAST(o_custkey AS BIGINT) FROM orders
          UNION ALL SELECT 'o_totalprice_cents',
                 CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR),
                 CAST(round(o_totalprice*100) AS BIGINT) FROM orders
          UNION ALL SELECT 'o_orderdate_epoch',
                 CAST(CAST(epoch(o_orderdate) AS BIGINT) AS VARCHAR),
                 CAST(epoch(o_orderdate) AS BIGINT) FROM orders
          UNION ALL SELECT 'o_orderstatus', o_orderstatus, NULL FROM orders
          UNION ALL SELECT 'o_orderpriority', o_orderpriority, NULL FROM orders
        ),
        pairs AS (
          SELECT col_name, v_str, count(*) AS cnt, max(v_num) AS v_num
          FROM stacked GROUP BY col_name, v_str
        )
        SELECT col_name,
               CAST(sum(cnt) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN v_str IS NULL THEN cnt ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               count(CASE WHEN v_str IS NOT NULL THEN 1 END) AS n_distinct,
               min(v_num) AS min_num, max(v_num) AS max_num,
               min(CASE WHEN v_num IS NULL THEN v_str END) AS min_str,
               max(CASE WHEN v_num IS NULL THEN v_str END) AS max_str
        FROM pairs GROUP BY col_name ORDER BY col_name
    """,
    "q3_shipping_priority": """
        SELECT
          o_orderkey,
          o_orderdate,
          o_orderpriority,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT
          n_name,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "join_left_enrich": """
        SELECT
          p_brand,
          count(*) AS n_items,
          sum(l_quantity) AS sum_qty
        FROM lineitem
        LEFT JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand ASC NULLS FIRST
    """,
    "join_semi_customers_with_orders": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "join_anti_orphan_audit": """
        SELECT c_mktsegment, count(*) AS n_orphans
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "join_full_outer_balance": """
        SELECT
          coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
          c.cust_bal,
          s.supp_bal
        FROM (
          SELECT c_nationkey,
                 CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS DOUBLE) AS cust_bal
          FROM customer GROUP BY c_nationkey
        ) c
        FULL OUTER JOIN (
          SELECT s_nationkey,
                 CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) / 100.0 AS DOUBLE) AS supp_bal
          FROM supplier GROUP BY s_nationkey
        ) s ON c.c_nationkey = s.s_nationkey
        ORDER BY nationkey
    """,
    "window_latest_order_per_customer": """
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        FROM (
          SELECT *,
                 row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
                 ) AS rn
          FROM orders
        )
        WHERE rn = 1
        ORDER BY o_custkey
    """,
    "window_running_total": """
        SELECT
          o_custkey,
          o_orderkey,
          o_orderdate,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) / 100.0 AS DOUBLE) AS running_total
        FROM orders
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    "window_rank_price_in_status": """
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               price_rank, price_dense_rank, prev_orderkey
        FROM (
          SELECT
            o_orderstatus,
            o_orderkey,
            o_totalprice,
            rank() OVER w AS price_rank,
            dense_rank() OVER w AS price_dense_rank,
            lag(o_orderkey, 1) OVER w AS prev_orderkey
          FROM orders
          WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
        )
        WHERE price_rank <= 5
        ORDER BY o_orderstatus, price_rank, o_orderkey
    """,
    "topk_expensive_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20
    """,
    "setops_customer_nations": """
        SELECT nationkey, 'union' AS op FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION
          SELECT s_nationkey FROM supplier
        )
        UNION ALL
        SELECT nationkey, 'intersect' AS op FROM (
          SELECT c_nationkey AS nationkey FROM customer
          INTERSECT
          SELECT s_nationkey FROM supplier
        )
        UNION ALL
        SELECT nationkey, 'except' AS op FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT
          SELECT s_nationkey FROM supplier
        )
        ORDER BY op, nationkey
    """,
    "scalar_functions_showcase": """
        SELECT
          p_partkey,
          substring(p_name, 1, 5) || '...' AS masked_name,
          upper(p_brand) AS brand_upper,
          CAST(length(p_type) AS INT) AS type_len,
          round(p_retailprice, 0) AS price_rounded,
          p_size % 7 AS size_mod7,
          coalesce(regexp_extract(p_type, '^(\\w+)', 1), '') AS type_first_word
        FROM part
        WHERE p_size > 25
        ORDER BY p_partkey
    """,
    "coercion_showcase": """
        WITH staged AS (
          SELECT
            o_orderkey,
            CASE
              WHEN o_orderkey % 7 = 0 THEN 'not-a-number'
              WHEN o_orderkey % 11 = 0 THEN ''
              ELSE CAST(CAST(round(o_totalprice*100) AS BIGINT) // 100 AS VARCHAR)
                   || ','
                   || lpad(CAST(CAST(round(o_totalprice*100) AS BIGINT) % 100 AS VARCHAR), 2, '0')
            END AS price_text,
            CASE
              WHEN o_orderkey % 13 = 0 THEN '31-12-2020'
              WHEN o_orderkey % 5 = 0 THEN strftime(o_orderdate, '%d/%m/%Y')
              ELSE strftime(o_orderdate, '%d/%m/%Y %H:%M:%S')
            END AS date_text
          FROM orders
        )
        SELECT
          o_orderkey,
          coalesce(try_cast(replace(trim(price_text), ',', '.') AS DOUBLE), 0.0) AS price_coerced,
          coalesce(
            try_strptime(date_text, '%d/%m/%Y %H:%M:%S'),
            try_strptime(date_text, '%d/%m/%Y')
          ) AS date_parsed,
          CAST(regexp_matches(date_text, '^\\d{2}/\\d{2}/\\d{4}') AS INT) AS date_valid,
          nullif(price_text, '') AS price_nullif
        FROM staged
        ORDER BY o_orderkey
    """,
    "exists_returned_orders": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "subquery_small_quantity_revenue": """
        WITH avg_qty AS (
          SELECT l_partkey,
                 sum(CAST(l_quantity AS BIGINT)) / count(*) AS part_avg_qty
          FROM lineitem
          GROUP BY l_partkey
        )
        SELECT
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS DOUBLE) AS total_revenue,
          count(*) AS n_lineitems
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#23'
        JOIN avg_qty a ON l.l_partkey = a.l_partkey
        WHERE l.l_quantity < 0.5 * a.part_avg_qty
    """,
    "scalar_subquery_rich_idle_customers": """
        WITH g AS (
          SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT))
                      / (100.0 * count(*)) AS DOUBLE) AS avg_bal
          FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey,
               count(*) AS numcust,
               CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS DOUBLE) AS totacctbal
        FROM customer c, g
        WHERE c.c_acctbal > g.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    "conditional_agg_returnflag": """
        SELECT
          l_returnflag,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "promo_revenue_ratio": """
        WITH j AS (
          SELECT
            CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_cents,
            p_type LIKE 'PROMO%' AS is_promo
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-03-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
        )
        SELECT
          CAST(100.0 * sum(CASE WHEN is_promo THEN rev_cents ELSE 0 END)
               / sum(rev_cents) AS DOUBLE) AS promo_revenue_pct,
          CAST(sum(rev_cents) / 1e4 AS DOUBLE) AS total_revenue
        FROM j
    """,
    "array_functions_showcase": """
        WITH t AS (
          SELECT p_partkey, string_split(p_name, ' ') AS toks
          FROM part
          WHERE p_partkey % 25 = 0
        )
        SELECT p_partkey,
               CAST(len(toks) AS INT) AS n_words,
               array_to_string(toks[1:2], '-') AS first_two,
               array_to_string(list_sort(toks), ',') AS sorted_words,
               CAST(list_contains(toks, 'green') AS INT) AS has_green,
               toks[-1] AS last_word
        FROM t
        ORDER BY p_partkey
    """,
    "null_handling_showcase": """
        WITH d AS (
          SELECT o_orderpriority,
                 nullif(o_orderstatus, 'O') AS s1,
                 nullif(o_orderstatus, 'F') AS s2
          FROM orders
        )
        SELECT o_orderpriority,
               count(*) AS n_rows,
               count(s1) AS n_s1_not_null,
               CAST(sum(CAST(s1 IS NOT DISTINCT FROM s2 AS INT)) AS BIGINT) AS n_null_safe_eq,
               CAST(sum(CAST(coalesce(s1, 'O') IS NOT NULL AS INT)) AS BIGINT) AS n_coalesced
        FROM d
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "window_moving_avg_daily_revenue": """
        WITH daily AS (
          SELECT date_trunc('day', o_orderdate) AS day,
                 CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents,
                 count(*) AS n_orders
          FROM orders
          GROUP BY 1
        )
        SELECT day,
               CAST(rev_cents / 100.0 AS DOUBLE) AS revenue,
               CAST(sum(rev_cents) OVER w / (100.0 * count(*) OVER w) AS DOUBLE)
                 AS moving_avg_7d
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY day
    """,
    "pivot_status_by_priority": """
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "unpivot_nation_balances": """
        WITH wide AS (
          SELECT c.nationkey,
                 c.customer_bal,
                 s.supplier_bal
          FROM (SELECT c_nationkey AS nationkey,
                       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS DOUBLE) AS customer_bal
                FROM customer GROUP BY 1) c
          JOIN (SELECT s_nationkey AS nationkey,
                       CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) / 100.0 AS DOUBLE) AS supplier_bal
                FROM supplier GROUP BY 1) s USING (nationkey)
        )
        SELECT nationkey, 'customer_bal' AS side, customer_bal AS balance FROM wide
        UNION ALL
        SELECT nationkey, 'supplier_bal' AS side, supplier_bal AS balance FROM wide
        ORDER BY nationkey, side
    """,
    "setops_bag_semantics": """
        WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
        s AS (SELECT s_nationkey AS nationkey FROM supplier),
        i AS (SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM s),
        x AS (SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM s)
        SELECT nationkey, count(*) AS n, 'intersect_all' AS op FROM i GROUP BY nationkey
        UNION ALL
        SELECT nationkey, count(*) AS n, 'except_all' AS op FROM x GROUP BY nationkey
        ORDER BY op, nationkey
    """,
    "anomaly_zscore_daily_revenue": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS order_date,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
          FROM orders
          GROUP BY CAST(o_orderdate AS DATE)
        ),
        quant AS (
          SELECT order_date,
                 CAST(rev_cents / 100.0 AS DOUBLE) AS revenue,
                 (rev_cents + 50000) // 100000 AS rev_k
          FROM daily
        ),
        stats AS (
          SELECT strftime(order_date, '%Y-%m-%d') AS order_date,
                 revenue, rev_k,
                 count(*) OVER w AS n_hist,
                 CAST(sum(rev_k) OVER w AS BIGINT) AS hist_sum,
                 CAST(sum(rev_k * rev_k) OVER w AS BIGINT) AS hist_sumsq
          FROM quant
          WINDOW w AS (ORDER BY order_date ROWS BETWEEN 29 PRECEDING
                       AND 1 PRECEDING)
        ),
        derived AS (
          SELECT order_date, revenue, n_hist,
                 CAST(hist_sum AS DOUBLE) / n_hist AS mean,
                 CAST(hist_sumsq AS DOUBLE) / n_hist
                   - (CAST(hist_sum AS DOUBLE) / n_hist)
                     * (CAST(hist_sum AS DOUBLE) / n_hist) AS var,
                 CAST(rev_k AS DOUBLE) AS rc
          FROM stats
          WHERE n_hist >= 7
        )
        SELECT order_date, revenue, n_hist,
               CAST((rc - mean) / sqrt(greatest(var, 1e-9)) AS DOUBLE) AS zscore,
               abs((rc - mean) / sqrt(greatest(var, 1e-9))) > 2.0 AS is_anomaly
        FROM derived
        ORDER BY order_date
    """,
    "gapfill_daily_revenue": """
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS order_date,
                 count(*) AS n_orders,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                      AS DOUBLE) AS revenue
          FROM orders
          GROUP BY CAST(o_orderdate AS DATE)
        ),
        bounds AS (SELECT min(order_date) AS dmin, max(order_date) AS dmax
                   FROM daily),
        spine AS (
          SELECT CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS DATE)
                   AS order_date
          FROM bounds
        )
        SELECT strftime(s.order_date, '%Y-%m-%d') AS order_date,
               coalesce(d.n_orders, 0) AS n_orders,
               coalesce(d.revenue, 0.0) AS revenue,
               last_value(d.revenue IGNORE NULLS) OVER (
                 ORDER BY s.order_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS revenue_ffill
        FROM spine s
        LEFT JOIN daily d ON s.order_date = d.order_date
        ORDER BY s.order_date
    """,
    "stratified_sample_orders": """
        SELECT o_orderkey, o_orderstatus
        FROM orders
        WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
              < CASE o_orderstatus
                  WHEN 'O' THEN 1000
                  WHEN 'F' THEN 500
                  WHEN 'P' THEN 10000
                  ELSE 0
                END
        ORDER BY o_orderkey
    """,
    "deterministic_sample_orders": """
        SELECT o_orderstatus,
               count(*) AS n_sampled,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_price
        FROM orders
        WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "quantiles_order_value_by_status": """
        WITH ranked AS (
          SELECT o_orderstatus, o_totalprice,
                 row_number() OVER (
                   PARTITION BY o_orderstatus
                   ORDER BY o_totalprice, o_orderkey
                 ) AS rn,
                 count(*) OVER (PARTITION BY o_orderstatus) AS n
          FROM orders
        )
        SELECT o_orderstatus,
               max(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS median_price,
               max(CASE WHEN rn = (9 * n + 9) // 10 THEN o_totalprice END) AS p90_price,
               count(*) AS n_orders
        FROM ranked
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "sql_q6_forecast_revenue": """
        SELECT
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * CAST(round(l_discount*100) AS BIGINT)) / 1e4 AS DOUBLE)
            AS revenue,
          count(*) AS n_lineitems
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": """
        SELECT
          n1.n_name AS supp_nation,
          n2.n_name AS cust_nation,
          CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS DOUBLE)
            AS revenue
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_18', 'NATION_19')
          AND n2.n_name IN ('NATION_18', 'NATION_19')
          AND n1.n_name <> n2.n_name
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": """
        SELECT
          CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
          CAST(1.0 * sum(CASE WHEN n1.n_name = 'NATION_5'
                              THEN CAST(round(l_extendedprice*100) AS BIGINT)
                                   * (100 - CAST(round(l_discount*100) AS BIGINT))
                              ELSE 0 END)
               / sum(CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
            AS mkt_share,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS DOUBLE)
            AS total_revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON r_regionkey = n2.n_regionkey AND r_name = 'ASIA'
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
        ORDER BY o_year
    """,
    "q10_returned_items": """
        SELECT
          c_custkey,
          c_name,
          c_acctbal,
          n_name,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS DOUBLE)
            AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON n_nationkey = c_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q13_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON o_custkey = c_custkey
          GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": """
        WITH revenue AS (
          SELECT
            l_suppkey,
            sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS rev_e4
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT
          s_suppkey,
          s_name,
          CAST(rev_e4 / 1e4 AS DOUBLE) AS total_revenue
        FROM revenue
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE rev_e4 = (SELECT max(rev_e4) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q18_large_volume_customers": """
        SELECT
          c_name,
          c_custkey,
          o_orderkey,
          o_orderdate,
          o_totalprice,
          sum_qty
        FROM (
          SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem
          GROUP BY l_orderkey
          HAVING sum(l_quantity) > 170
        ) big
        JOIN orders ON o_orderkey = big.l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "q19_discount_revenue": """
        SELECT
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS DOUBLE)
            AS revenue,
          count(*) AS n_lineitems
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "groupwise_min_cheapest_parts": """
        SELECT p_type, p_partkey, p_name, p_retailprice
        FROM part
        JOIN (
          SELECT p_type AS t, min(p_retailprice) AS min_price
          FROM part
          GROUP BY p_type
        ) mins ON p_type = t AND p_retailprice = min_price
        ORDER BY p_type, p_partkey
    """,
    "window_navigation_showcase": """
        SELECT
          o_custkey,
          o_orderkey,
          o_orderdate,
          lead(o_orderkey, 1) OVER w AS next_orderkey,
          lag(o_orderkey, 1) OVER w AS prev_orderkey,
          first_value(o_orderkey) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
          ) AS first_orderkey,
          CAST(ntile(4) OVER w AS INT) AS quartile,
          round(percent_rank() OVER w, 6) AS pct_rank,
          round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WHERE o_custkey % 50 = 0
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    "datetime_functions_showcase": """
        SELECT
          o_orderkey,
          o_orderdate AS orderdate,
          o_orderdate + INTERVAL 1 SECOND AS plus_1s,
          o_orderdate - INTERVAL 60 DAY AS minus_60d,
          CAST(CAST(o_orderdate AS DATE) + 1 AS TIMESTAMP) AS next_day,
          CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
          datediff('day', CAST(o_orderdate AS DATE), DATE '2001-01-01') AS days_to_2001,
          CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
          CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
          CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
          strftime(o_orderdate, '%d/%m/%Y') AS br_text
        FROM orders
        WHERE o_orderkey % 100 = 0
        ORDER BY o_orderkey
    """,
    "monthly_revenue_trend": """
        SELECT
          date_trunc('month', o_orderdate) AS order_month,
          count(*) AS n_orders,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS DOUBLE) AS revenue,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
               / (100.0 * count(*)) AS DOUBLE) AS avg_order_value
        FROM orders
        GROUP BY 1
        HAVING count(*) >= 10
        ORDER BY order_month
    """,
}

RELATIONAL_ORACLES["approx_quantile_order_totals"] = """
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM c),
    h AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY cents
    ),
    o AS (
      SELECT cents, cnt,
             COALESCE(SUM(cnt) OVER (
               ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) + cnt AS cum_incl
      FROM h
    ),
    p(label, p10k) AS (VALUES ('p50', 5000), ('p90', 9000), ('p99', 9900)),
    t AS (
      SELECT label, (p10k * nn.n_rows + 9999) // 10000 AS target_rank, nn.n_rows
      FROM p, nn
    )
    SELECT t.label,
           (SELECT min(cents) FROM o WHERE cum_incl >= t.target_rank)
             AS exact_cents,
           t.n_rows,
           TRUE AS within_bound
    FROM t
    ORDER BY label
"""
