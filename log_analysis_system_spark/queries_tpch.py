"""Classic warehouse-analytics queries over the TPC-H-ish tables, with
paired DuckDB oracle SQL — the multi-table star-join breadth check.

Shapes (not copies — column subset differs from official TPC-H); later in
the module: Q5 (6-table join chain), Q6 (pure pushdown reduction), Q18
(aggregate-driven semi-join), Q14 (conditional-aggregation join), Q4
(correlated-EXISTS semi-join):

- ``pricing_summary`` (Q1 shape): the canonical scan-heavy grouped
  aggregate; all sums decimal-cast so partition order can't flip the
  value hash.
- ``shipping_priority`` (Q3 shape): selective dim filter -> 3-way join ->
  grouped revenue -> top-10. The customer side is small and broadcasts;
  the orders<->lineitem join shuffles on orderkey (AQE picks the
  strategy at scale). Rank ties break on orderkey for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

Q1_CUTOFF = "2001-09-01"
Q3_SEGMENT = "BUILDING"
Q3_ORDER_BEFORE = "1999-03-15"
Q3_SHIP_AFTER = "1998-03-15"
Q3_TOP_N = 10

_DEC = "decimal(28,10)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return df.repartition(spark.sparkContext.defaultParallelism)


def pricing_summary(lineitem: DataFrame, cutoff: str = Q1_CUTOFF) -> DataFrame:
    """Q1 shape: single-pass grouped aggregate over the fact scan —
    partial-agg map-side; the shuffle carries |flag x status| rows."""
    # per-row products in DOUBLE (bit-identical across engines: IEEE ops
    # on identical inputs), THEN decimal-cast so the cross-partition SUM
    # is order-free — casting before multiplying would hit Spark's and
    # DuckDB's different decimal-product scale promotions
    disc_price = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast(_DEC)
    charge = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    ).cast(_DEC)
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(_DEC)).cast("double"), 6).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
            F.round(
                F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count("*"), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(F.col("l_discount").cast(_DEC)).cast("double") / F.count("*"), 6
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = Q3_SEGMENT,
    top_n: int = Q3_TOP_N,
) -> DataFrame:
    """Q3 shape: filter the small dim FIRST, broadcast it into orders,
    shuffle-join lineitem on orderkey, aggregate revenue, rank top-n
    (WindowGroupLimit pushes the limit below the final sort)."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < F.lit(Q3_ORDER_BEFORE)).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    items = lineitem.where(F.col("l_shipdate") > F.lit(Q3_SHIP_AFTER)).select(
        "l_orderkey",
        # double product per row, decimal for the order-free sum (see Q1)
        (
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).cast(_DEC).alias("rev"),
    )
    joined = (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(items, ords.o_orderkey == items.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum("rev").cast("double"), 6).alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue",
                F.col("rank").cast("int").alias("rank"))
        .orderBy("rank")
    )


def q_tpch_pricing_summary(spark, sf_dir):
    return pricing_summary(_t(spark, sf_dir, "lineitem"))


def q_tpch_shipping_priority(spark, sf_dir):
    return shipping_priority(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


QUERIES = {
    "tpch_pricing_summary": q_tpch_pricing_summary,
    "tpch_shipping_priority": q_tpch_shipping_priority,
}

ORACLES = {
    "tpch_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 6) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    "tpch_shipping_priority": f"""
WITH agg AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
         round(CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                             AS DECIMAL(28,10))) AS DOUBLE), 6)
           AS revenue
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = '{Q3_SEGMENT}'
    AND o.o_orderdate < TIMESTAMP '{Q3_ORDER_BEFORE} 00:00:00'
    AND l.l_shipdate > TIMESTAMP '{Q3_SHIP_AFTER} 00:00:00'
  GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS rank
  FROM agg
)
SELECT o_orderkey, o_orderdate, o_orderpriority, revenue, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {Q3_TOP_N}
ORDER BY rank
""",
}


Q5_REGION = "ASIA"
Q5_DATE_FROM = "1996-01-01"
Q5_DATE_TO = "1997-01-01"


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = Q5_REGION,
) -> DataFrame:
    """Q5 shape: 6-table join — the join-breadth/ordering check. Revenue
    per nation where the customer's and the line's supplier's nation agree,
    region-filtered, one order-date year.

    Join strategy at scale: region->nation is a 2-step tiny-dim reduction
    (broadcast), the reduced nation key list broadcasts into customer and
    supplier, orders<->lineitem is the one real shuffle join (orderkey),
    and the supplier match adds the s_nationkey == c_nationkey residual on
    a broadcast supplier side. Revenue follows the Q1/Q3 decimal
    discipline (double product per row, decimal order-free sum).
    """
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(Q5_DATE_FROM))
        & (F.col("o_orderdate") < F.lit(Q5_DATE_TO))
    ).select("o_orderkey", "o_custkey")
    items = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).cast(_DEC).alias("rev"),
    )
    supp = supplier.select("s_suppkey", "s_nationkey")
    joined = (
        ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(items, ords.o_orderkey == items.l_orderkey)
        .join(
            F.broadcast(supp),
            (items.l_suppkey == supp.s_suppkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum("rev").cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q_tpch_local_supplier_volume(spark, sf_dir):
    return local_supplier_volume(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


QUERIES["tpch_local_supplier_volume"] = q_tpch_local_supplier_volume

ORACLES["tpch_local_supplier_volume"] = f"""
SELECT n_name,
       round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_DATE_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q5_DATE_TO} 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


Q6_DATE_FROM = "1996-01-01"
Q6_DATE_TO = "1997-01-01"
Q6_DISCOUNT_LO = 0.02
Q6_DISCOUNT_HI = 0.04
Q6_MAX_QTY = 25


def forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """Q6 shape: the pure predicate-pushdown check — a one-year shipdate
    range, a discount band, and a quantity cap, all of which must reach the
    parquet scan as PushedFilters (asserted in test_plans), followed by a
    single partial-aggregating reduction to one row. No join, no wide
    shuffle: the exchange carries one partial row per partition. Revenue
    follows the Q1/Q3 decimal discipline (per-row DOUBLE product, DECIMAL
    order-free sum, DOUBLE round at money scale).
    """
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC)
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(Q6_DATE_FROM))
            & (F.col("l_shipdate") < F.lit(Q6_DATE_TO))
            & (F.col("l_discount") >= Q6_DISCOUNT_LO)
            & (F.col("l_discount") <= Q6_DISCOUNT_HI)
            & (F.col("l_quantity") < Q6_MAX_QTY)
        )
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_tpch_forecast_revenue(spark, sf_dir):
    return forecast_revenue(_t(spark, sf_dir, "lineitem"))


QUERIES["tpch_forecast_revenue"] = q_tpch_forecast_revenue

ORACLES["tpch_forecast_revenue"] = f"""
SELECT round(CAST(sum(CAST(l_extendedprice * l_discount
                           AS DECIMAL(28,10))) AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_DATE_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q6_DATE_TO} 00:00:00'
  AND l_discount BETWEEN {Q6_DISCOUNT_LO} AND {Q6_DISCOUNT_HI}
  AND l_quantity < {Q6_MAX_QTY}
"""


Q18_MIN_QTY = 250
Q18_TOP_N = 100


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = Q18_MIN_QTY,
    top_n: int = Q18_TOP_N,
) -> DataFrame:
    """Q18 shape: AGGREGATE-DRIVEN semi-join — the HAVING predicate on the
    fact aggregate produces a small orderkey set that then drives the
    orders/customer joins, the reverse of Q3's dim-filter-first flow.

    Scale path: the quantity rollup partial-aggregates map-side on
    orderkey (bounded state per key), the filtered key set is orders of
    magnitude smaller than lineitem, and AQE broadcast-converts the
    orders<->big join when the survivor set is small; the customer join
    keys on custkey. Sum-of-quantities follows the decimal discipline;
    the top-n ranks (o_totalprice DESC, o_orderkey) via WindowGroupLimit.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty_dec"))
        .where(F.col("qty_dec") > min_qty)
        .select(
            "l_orderkey",
            F.round(F.col("qty_dec").cast("double"), 6).alias("sum_qty"),
        )
    )
    joined = (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "sum_qty",
        )
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_n)
        .orderBy("rank")
    )


def q_tpch_large_volume_customers(spark, sf_dir):
    return large_volume_customers(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


QUERIES["tpch_large_volume_customers"] = q_tpch_large_volume_customers

ORACLES["tpch_large_volume_customers"] = f"""
WITH big AS (
  SELECT l_orderkey,
         sum(CAST(l_quantity AS DECIMAL(28,10))) AS qty_dec
  FROM lineitem GROUP BY l_orderkey
  HAVING qty_dec > {Q18_MIN_QTY}
),
joined AS (
  SELECT c_name, c_custkey, o_orderkey, o_orderdate,
         round(o_totalprice, 2) AS o_totalprice,
         round(CAST(qty_dec AS DOUBLE), 6) AS sum_qty
  FROM orders
  JOIN big ON o_orderkey = l_orderkey
  JOIN customer ON o_custkey = c_custkey
)
SELECT * FROM (
  SELECT *, CAST(row_number() OVER (
      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
  FROM joined
) WHERE rank <= {Q18_TOP_N}
ORDER BY rank
"""


Q14_DATE_FROM = "1996-09-01"
Q14_DATE_TO = "1996-10-01"


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q14 shape: CONDITIONAL aggregation over a fact<->dim join — one
    month of lineitem joined to part on partkey, emitting the promo share
    of revenue (numerator = CASE on the dim attribute) in a single pass.

    Scale path: the month filter pushes to the fact scan; the join keys on
    partkey (AQE broadcast-converts when the part side fits, shuffle
    otherwise — at TPC-H scale part is too big to broadcast, so no hint is
    hard-coded); numerator and denominator partial-aggregate together in
    one reduction. Decimal discipline as Q1/Q3; the final ratio is
    double/double with both engines evaluating (100.0 * num) / den.
    """
    items = lineitem.where(
        (F.col("l_shipdate") >= F.lit(Q14_DATE_FROM))
        & (F.col("l_shipdate") < F.lit(Q14_DATE_TO))
    ).select(
        "l_partkey",
        (
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).cast(_DEC).alias("rev"),
    )
    joined = items.join(
        part.select("p_partkey", "p_type"),
        items.l_partkey == F.col("p_partkey"),
    )
    promo = F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
        F.lit(0).cast(_DEC)
    )
    return joined.agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double")
            / F.sum("rev").cast("double"),
            6,
        ).alias("promo_pct"),
        F.count("*").alias("n_items"),
    )


def q_tpch_promo_revenue(spark, sf_dir):
    return promo_revenue_share(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "part"),
    )


QUERIES["tpch_promo_revenue"] = q_tpch_promo_revenue


Q4_DATE_FROM = "1996-01-01"
Q4_DATE_TO = "1996-04-01"
Q4_SLOW_SHIP_DAYS = 75


def order_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    slow_days: int = Q4_SLOW_SHIP_DAYS,
) -> DataFrame:
    """Q4 shape: correlated-EXISTS semi-join — count one quarter's orders
    per priority that have at least one slow-shipped line (reference Q4's
    ``l_commitdate < l_receiptdate`` adapted to this schema's columns:
    ``l_shipdate > o_orderdate + slow_days``).

    Scale path: the quarter filter pushes to the orders scan first, so the
    semi-join probes with the reduced order set; LEFT SEMI stops at the
    first matching line per order (no fact-side aggregation state at all,
    unlike Q18's rollup-then-filter), and the correlated date predicate
    rides the orderkey equi-join as a residual condition. The final
    priority rollup is a <=5-cell partial agg.
    """
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(Q4_DATE_FROM))
        & (F.col("o_orderdate") < F.lit(Q4_DATE_TO))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    items = lineitem.select("l_orderkey", "l_shipdate")
    slow = ords.join(
        items,
        (ords.o_orderkey == items.l_orderkey)
        & (
            items.l_shipdate
            > ords.o_orderdate + F.expr(f"INTERVAL {slow_days} DAYS")
        ),
        "left_semi",
    )
    return (
        slow.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_order_priority(spark, sf_dir):
    return order_priority_counts(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


QUERIES["tpch_order_priority"] = q_tpch_order_priority

ORACLES["tpch_order_priority"] = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q4_DATE_FROM} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q4_DATE_TO} 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_SLOW_SHIP_DAYS} DAYS)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["tpch_promo_revenue"] = f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1.0 - l_discount)
                              AS DECIMAL(28,10))
                    ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(28,10))) AS DOUBLE), 6) AS promo_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{Q14_DATE_FROM} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q14_DATE_TO} 00:00:00'
"""


Q22_CUTOFF = "1999-01-01"


def no_recent_order_customers(
    customer: DataFrame, orders: DataFrame, cutoff: str = Q22_CUTOFF
) -> DataFrame:
    """Q22 shape: scalar-subquery threshold + LEFT ANTI join — the one
    join polarity the other TPC-H shapes don't cover. Above-average-balance
    customers with NO order since ``cutoff``, rolled up per nation
    (official Q22's country-code prefix adapted to this schema's
    c_nationkey; "no orders at all" adapted to "no recent order" because
    the synthetic data gives every customer at least one order).

    Scale path: the positive-balance average is a 1-row broadcast (the
    allowlisted conditionless-join pattern); the anti join keys on custkey
    with the date filter pushed to the orders scan BEFORE the join, so the
    probe side is the reduced recent-order key set; the final rollup is a
    |nations|-cell partial agg. The average follows the decimal discipline:
    exact DECIMAL sum, ONE double division — both engines then compare
    c_acctbal against the bit-identical threshold.
    """
    pos = customer.where(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(
        (
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count("*")
        ).alias("a")
    )
    recent = orders.where(F.col("o_orderdate") >= F.lit(cutoff)).select(
        "o_custkey"
    )
    cand = customer.join(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("a")
    )
    silent = cand.join(
        recent, cand.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        silent.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast(_DEC)).cast("double"), 2
            ).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q_tpch_no_recent_orders(spark, sf_dir):
    return no_recent_order_customers(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
    )


QUERIES["tpch_no_recent_orders"] = q_tpch_no_recent_orders

ORACLES["tpch_no_recent_orders"] = f"""
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE), 2)
         AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


Q13_EXCLUDE_PRIORITY = "1-URGENT"


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, exclude_priority: str = Q13_EXCLUDE_PRIORITY
) -> DataFrame:
    """Q13 shape: LEFT OUTER join + two-level aggregation — the
    distribution of per-customer order counts INCLUDING zero-order
    customers, the one aggregation topology (outer join feeding a
    second groupBy) the other TPC-H shapes don't cover. Official Q13's
    ``o_comment NOT LIKE '%special%requests%'`` filter is adapted to
    this schema as an o_orderpriority exclusion — same selectivity role,
    same plan shape.

    Scale path: orders are aggregated to (custkey, cnt) FIRST, so the
    outer join's right side carries |distinct custkeys| rows, not
    |orders| — the partial agg runs map-side before its shuffle and the
    join shuffles two custkey-sized sides instead of the fact table.
    The second groupBy is over |distinct counts| cells (tiny, bounded by
    max orders per customer). Counting on a non-null right-side column
    after the outer join is what turns "no orders" into c_count = 0
    without a correlated subquery.
    """
    per_cust = (
        orders.where(F.col("o_orderpriority") != exclude_priority)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    counted = (
        customer.select("c_custkey")
        .join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
    )
    return (
        counted.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_tpch_customer_distribution(spark, sf_dir):
    return customer_order_distribution(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
    )


QUERIES["tpch_customer_distribution"] = q_tpch_customer_distribution

ORACLES["tpch_customer_distribution"] = f"""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '{Q13_EXCLUDE_PRIORITY}'
  GROUP BY c.c_custkey
) counts
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""
