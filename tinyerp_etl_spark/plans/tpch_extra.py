"""Remaining TPC-H-shaped query patterns, adapted to the test schema.

The driver's tables omit partsupp, l_commitdate/l_receiptdate,
o_comment and c_phone, so the classic queries that need them (Q2, Q4,
Q9, Q11, Q12, Q16, Q20, Q21) are re-expressed here with equivalent
*plan shapes* on the columns that exist — the point is the
decorrelation / aggregation pattern, not the benchmark text:

- Q4  -> EXISTS(correlated, non-equi) then count-per-group
- Q9  -> profit rollup over a 5-table join, grouped by dim x year
- Q11 -> HAVING against a scalar subquery of the global total
- Q12 -> join + CASE-bucketed conditional aggregation
- Q16 -> NOT IN exclusion subquery + count-distinct per group
- Q20 -> nested aggregation feeding a semi-join chain
- Q21 -> EXISTS + NOT-EXISTS double-correlation, reformulated as one
  per-order aggregation (one shuffle on orderkey) instead of two
  correlated self-joins of a 100 TB fact
- Q2  -> groupwise-min over a derived cost relation joined back on
  (key, min) — the correlated MIN subquery decorrelated
- Q14 -> conditional-sum ratio over one month (promo revenue share)
- Q17 -> correlated per-key AVG threshold decorrelated into an
  aggregate + join-back, compared in integer space
- Q22 -> scalar-subquery balance floor + NOT EXISTS (anti join)
  against recent orders, grouped by nation

plus GROUPING SETS (rollup/cube's general form, via spark.sql).

All monetary sums use integer-cents accumulators (functions.exact) so
results are bit-identical to the DuckDB oracle at any partition count.
Scale notes: every query keeps dims broadcast and facts shuffled at
most once on a join/group key; thresholds are compared in exact
integer space so plans can't flap on FP noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from tinyerp_etl_spark.functions.exact import cents, sum_cents, sum_exact
from tinyerp_etl_spark.sources.catalog import load_table


def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders in one quarter having EXISTS a late lineitem.

    The reference schema lacks commit/receipt dates, so "late" is a
    lineitem shipped >90 days after the order date. The correlated
    EXISTS becomes a left-semi join with a non-equi residual; the
    orderkey equi-pair keeps it a hash/sort-merge semi join (no
    broadcast-nested-loop). Count per priority after the semi join is
    a 5-group aggregate — collapses map-side.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    # transitive bound Catalyst can't derive across the non-equi
    # condition: o_orderdate >= Jul 1 and l_shipdate > o_orderdate+90d
    # imply l_shipdate > Sep 29 — pushed to the lineitem scan, it
    # prunes the fact BEFORE the semi join's shuffle (10x probe: 5.2x
    # -> ~linear without it the whole fact crossed the network)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-09-29").cast("timestamp")
    )
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 90)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation x order year for one part family.

    lineitem joins part (filtered on p_name LIKE, broadcast — the LIKE
    prunes before the join), supplier -> nation (broadcast chain), and
    orders (fact-fact shuffle on orderkey, the only big shuffle).
    Profit = extendedprice*(1-discount) in exact integer 1e-4 units.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit_e4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(broadcast(p.select("p_partkey")), li.l_partkey == p.p_partkey)
        .join(broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((sum_exact(profit_e4) / F.lit(1e4)).cast("double").alias("sum_profit"))
        .orderBy("nation_name", F.col("o_year").desc())
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part value HAVING > fraction of the global total.

    No partsupp table, so "value" is revenue shipped per part by
    suppliers of a nation subset. The scalar subquery (global total)
    is the same aggregate reused: one pass computes per-part sums, the
    grand total is their re-aggregation (tiny), broadcast back as a
    1-row cross join. Threshold compare happens in exact integer
    space (part_cents * 1000 > total_cents) so the filter is
    FP-noise-proof — at 100 TB the double division would otherwise
    decide membership for parts sitting on the boundary.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    per_part = (
        li.join(broadcast(s.select("s_suppkey")), li.l_suppkey == s.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(sum_exact(cents("l_extendedprice")).alias("part_cents"))
    )
    total = per_part.agg(F.sum("part_cents").alias("total_cents"))
    return (
        per_part.crossJoin(broadcast(total))
        .filter(F.col("part_cents") * 1000 > F.col("total_cents"))
        .select(
            "l_partkey",
            (F.col("part_cents") / F.lit(100.0)).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: orders x lineitem join + CASE-bucketed counts.

    No l_shipmode column; l_linestatus plays the grouping role and the
    CASE buckets split critical (1-URGENT/2-HIGH) from other order
    priorities — the same conditional-aggregation plan (join, then
    two-phase agg of integer flags) as the original.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(crit).alias("high_line_count"),
            F.sum(1 - crit).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: NOT IN exclusion subquery + count-distinct per group.

    Suppliers with negative balance stand in for the "complaints"
    exclusion list; the NOT IN becomes a left-anti join (keys are
    non-null, so NOT IN == anti). Parts filtered out of one brand.
    Count-distinct suppliers per (brand, size) is the expensive part:
    Spark plans it as a two-level aggregate (dedupe on the full key,
    then count) — both levels map-side combinable.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    excluded = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(broadcast(excluded.select("s_suppkey")), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(broadcast(p.select("p_partkey", "p_brand", "p_size")), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


def q20_heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested aggregation feeding a semi-join chain.

    Inner block: quantity shipped per (supplier, part) of a part
    family during one year, kept where the total exceeds a threshold.
    Outer: suppliers in a nation subset having any such heavy line —
    a semi join on the aggregated (tiny) relation, then a broadcast
    nation lookup. The fact is touched once; everything downstream of
    the first groupBy is dim-sized.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 12)
    heavy = (
        li.join(broadcast(p.select("p_partkey")), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
    )
    return (
        s.join(heavy.select("l_suppkey").distinct(), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_sole_late_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS + NOT-EXISTS double correlation, one shuffle.

    The classic plan self-joins lineitem twice (EXISTS another
    supplier on the order; NOT EXISTS another *late* supplier) — two
    extra shuffles of the biggest fact. Equivalent set algebra per
    order: the blamed supplier is late, the order has >=2 distinct
    suppliers, and exactly 1 distinct late supplier. That is ONE
    groupBy(orderkey) computing both distinct counts plus the blamed
    key, then a count per supplier — 100 TB of lineitem crosses the
    network once. "Late" = shipped >100 days after the order date on
    a finalized ('F') order.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    lines = li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey)
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 100)
    # Two distinct-aggregates in one groupBy would Expand (duplicate)
    # the joined fact 2x before its shuffle. Instead: collapse to
    # distinct (order, supplier) pairs first, then count flags. Both
    # aggregations cluster on a subset of the join key partitioning
    # (orderkey), so neither adds a shuffle — the join's exchange is
    # the only time lineitem crosses the network.
    pair = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(late.cast("int")).alias("is_late")
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late_supp"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "blamed_suppkey"
        ),
    )
    blamed = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    return (
        blamed.join(broadcast(s), F.col("blamed_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: groupwise minimum-cost supplier per part.

    No partsupp table, so the supplier's "offer" for a part is the
    cheapest extended price it ever shipped that part at (exact cents,
    from lineitem). The classic correlated MIN subquery decorrelates
    into: (1) one fact shuffle to aggregate offers per (part,
    supplier) — map-side combinable; (2) a MIN window over the part
    key on the already-aggregated, dimension-bounded offers relation;
    (3) an equality filter keeping the groupwise minima; (4) broadcast
    supplier/nation lookups. Top-100 by account balance is a
    TakeOrdered (no global sort materialization). Ties on the min are
    kept, as in the original; the sort key (acctbal, part, supplier)
    is total, so LIMIT is deterministic.
    """
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 10)
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    offers = (
        li.join(broadcast(p.select("p_partkey")), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(cents("l_extendedprice")).alias("offer_cents"))
    )
    best = F.min("offer_cents").over(Window.partitionBy("l_partkey"))
    return (
        offers.withColumn("best_cents", best)
        .filter(F.col("offer_cents") == F.col("best_cents"))
        .join(broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation_name"),
            (F.col("offer_cents") / F.lit(100.0)).cast("double").alias("best_price"),
            cents("s_acctbal").alias("acctbal_cents"),
        )
        .orderBy(F.col("acctbal_cents").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-aggregation revenue ratio for one month.

    Promo share of revenue = 100 * sum(revenue where p_type PROMO) /
    sum(revenue), September 1997. The month filter prunes the fact at
    the scan (pushed to parquet); part is broadcast; both sums are
    exact integer 1e-4 units accumulated in one two-phase aggregate,
    and the ratio is a single IEEE division at the end — bit-identical
    to the oracle at any partition count.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev_e4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(broadcast(p.select("p_partkey", "p_type")), li.l_partkey == p.p_partkey)
        .agg(
            sum_exact(F.when(F.col("p_type") == "PROMO", rev_e4).otherwise(F.lit(0))).alias(
                "promo_e4"
            ),
            sum_exact(rev_e4).alias("total_e4"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_e4") / F.col("total_e4"))
            .cast("double")
            .alias("promo_revenue")
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated per-part AVG threshold, decorrelated.

    Average yearly revenue lost to small-quantity orders of one brand:
    lineitems with l_quantity < 0.2 * avg(l_quantity) of their part.
    The correlated scalar AVG becomes a per-part aggregate joined back
    on the part key; the brand semi-join prunes the fact BEFORE both
    the aggregate and the join, so only ~1/|brands| of lineitem is
    touched. per_part is bounded by the part dimension → broadcast
    join-back, no second fact shuffle. The 0.2*avg comparison is done
    in integers (qty*5*n < sum_qty), so membership can't flap on FP
    noise, and the final /700.0 (7 years x cents) is one IEEE op.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#21")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select(
            "l_partkey",
            cents("l_quantity").alias("qty_cents"),
            cents("l_extendedprice").alias("price_cents"),
        )
    )
    per_part = li.groupBy("l_partkey").agg(
        sum_exact(F.col("qty_cents")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        li.join(broadcast(per_part), "l_partkey")
        .filter(F.col("qty_cents") * 5 * F.col("n") < F.col("sum_qty"))
        .agg(
            (sum_exact(F.col("price_cents")) / F.lit(700.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar-subquery floor + anti join, per nation.

    No c_phone column, so the "country code" bucket is c_nationkey
    (< 10), and "never ordered" becomes "no order since 2000-01-01" —
    this data has no orderless customers, which keeps the anti join
    non-degenerate. Plan: (1) 1-row aggregate of positive balances
    over the eligible slice, broadcast back (the classic scalar
    subquery); (2) balance floor compared in integer space
    (bal*n > sum — no FP boundary flap); (3) left-anti join against
    recent orders' custkeys on the customer key — at 100 TB both
    sides shuffle-partition on custkey, the anti probe is the
    distinct custkey set of a date-pruned scan; (4) a 10-group
    aggregate. Column names match the oracle: c_nationkey, numcust,
    totacctbal.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 10)
    eligible = c.select(
        "c_custkey", "c_nationkey", cents("c_acctbal").alias("bal_cents")
    )
    pos = eligible.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        eligible.crossJoin(broadcast(pos))
        .filter(F.col("bal_cents") * F.col("n") > F.col("s"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (sum_exact(F.col("bal_cents")) / F.lit(100.0))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form rollup/cube specialize.

    Three explicit sets: by returnflag, by linestatus, and the grand
    total. Spark expands to a single Expand + two-phase aggregate (one
    scan, one shuffle, rows multiplied only by the set count).
    """
    # fan the 3-split scan out before the Expand×3 + decimal partial
    # aggregation (optimization round 14, guide §2.5 — the widen is a
    # no-op once the file yields >= cores splits): interleaved A/B at
    # sf0.1 1.56 → 1.39 s min-of-3, identical rows
    from tinyerp_etl_spark.sources.catalog import widen_if_narrow

    widen_if_narrow(
        load_table(spark, sf_dir, "lineitem"), sf_dir, name="lineitem"
    ).createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)))
               / 100.0 AS DOUBLE) AS sum_revenue,
          count(*) AS n_rows,
          CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


TPCH_EXTRA_QUERIES = {
    "q4_priority_late_ship": q4_priority_late_ship,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_parts": q11_important_parts,
    "q12_priority_by_linestatus": q12_priority_by_linestatus,
    "q16_supplier_diversity": q16_supplier_diversity,
    "q20_heavy_part_suppliers": q20_heavy_part_suppliers,
    "q21_sole_late_shippers": q21_sole_late_shippers,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q22_dormant_customers": q22_dormant_customers,
    "grouping_sets_revenue": grouping_sets_revenue,
}


TPCH_EXTRA_ORACLES: dict[str, str] = {
    "q4_priority_late_ship": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q9_product_type_profit": """
        SELECT
          n_name AS nation_name,
          CAST(year(o_orderdate) AS INTEGER) AS o_year,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e4 AS DOUBLE)
            AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
        ORDER BY nation_name, o_year DESC
    """,
    "q11_important_parts": """
        WITH per_part AS (
          SELECT l_partkey,
                 sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS part_cents
          FROM lineitem
          WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier WHERE s_nationkey < 5
          )
          GROUP BY l_partkey
        )
        SELECT l_partkey,
               CAST(part_cents / 100.0 AS DOUBLE) AS part_value
        FROM per_part
        WHERE part_cents * 1000 > (SELECT sum(part_cents) FROM per_part)
        ORDER BY part_value DESC, l_partkey
    """,
    "q12_priority_by_linestatus": """
        SELECT
          l_linestatus,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "q16_supplier_diversity": """
        SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    "q20_heavy_part_suppliers": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
            )
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > 50
        )
        AND s_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_nationkey < 12
        )
        ORDER BY s_suppkey
    """,
    "q21_sole_late_shippers": """
        WITH lines AS (
          SELECT l_orderkey, l_suppkey,
                 (l_shipdate > o_orderdate + INTERVAL 100 DAY) AS is_late
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        ),
        per_order AS (
          SELECT l_orderkey,
                 count(DISTINCT l_suppkey) AS n_supp,
                 count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp,
                 max(CASE WHEN is_late THEN l_suppkey END) AS blamed_suppkey
          FROM lines
          GROUP BY l_orderkey
        )
        SELECT s_name, count(*) AS numwait
        FROM per_order
        JOIN supplier ON blamed_suppkey = s_suppkey
        WHERE n_supp >= 2 AND n_late_supp = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
    "q2_min_cost_supplier": """
        WITH offers AS (
          SELECT l_partkey, l_suppkey,
                 min(CAST(round(l_extendedprice*100) AS BIGINT)) AS offer_cents
          FROM lineitem
          WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_type = 'STANDARD' AND p_size < 10
          )
          GROUP BY l_partkey, l_suppkey
        ),
        best AS (
          SELECT l_partkey, min(offer_cents) AS best_cents
          FROM offers GROUP BY l_partkey
        )
        SELECT o.l_partkey AS p_partkey, s.s_suppkey, s.s_name,
               n.n_name AS nation_name,
               CAST(o.offer_cents / 100.0 AS DOUBLE) AS best_price,
               CAST(round(s.s_acctbal*100) AS BIGINT) AS acctbal_cents
        FROM offers o
        JOIN best b ON o.l_partkey = b.l_partkey AND o.offer_cents = b.best_cents
        JOIN supplier s ON o.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        ORDER BY acctbal_cents DESC, p_partkey, s_suppkey
        LIMIT 100
    """,
    "q14_promo_revenue": """
        SELECT CAST(
          100.0 * sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT))
                ELSE 0 END)
          / sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT)))
          AS DOUBLE) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    "q17_small_quantity_revenue": """
        WITH li AS (
          SELECT l_partkey,
                 CAST(round(l_quantity*100) AS BIGINT) AS qty_cents,
                 CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#21')
        ),
        per_part AS (
          SELECT l_partkey, sum(qty_cents) AS sum_qty, count(*) AS n
          FROM li GROUP BY l_partkey
        )
        SELECT CAST(sum(li.price_cents) / 700.0 AS DOUBLE) AS avg_yearly
        FROM li JOIN per_part ON li.l_partkey = per_part.l_partkey
        WHERE li.qty_cents * 5 * per_part.n < per_part.sum_qty
    """,
    "q22_dormant_customers": """
        WITH eligible AS (
          SELECT c_custkey, c_nationkey,
                 CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
          FROM customer WHERE c_nationkey < 10
        ),
        pos AS (
          SELECT sum(bal_cents) AS s, count(*) AS n
          FROM eligible WHERE bal_cents > 0
        ),
        dormant AS (
          SELECT e.c_custkey, e.c_nationkey, e.bal_cents
          FROM eligible e, pos
          WHERE e.bal_cents * pos.n > pos.s
            AND NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = e.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2000-01-01'
            )
        )
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(bal_cents) / 100.0 AS DOUBLE) AS totacctbal
        FROM dormant GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "grouping_sets_revenue": """
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS DOUBLE)
            AS sum_revenue,
          count(*) AS n_rows,
          CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
}
