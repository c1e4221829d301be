"""Analytic views — the reference's marquee artifacts, Spark-first.

Reference: src/load/schema.sql:203-221 (v_order_summary) and
schema.sql:225-234 (v_delivery_performance), executed there by
SQLite/PostgreSQL.  Here each view is a lazy DataFrame plan over the
driver's star schema (FIXTURES.md §7 role mapping: orders→orders,
order_items→lineitem, customers→customer, state→nation).

Scale notes:
  * customer (SF×1.5k rows) and nation (25) are small dimensions →
    explicit ``broadcast()`` so the fact-side join never shuffles the
    big table.  At 100 TB the orders⋈lineitem join is the only real
    shuffle, on the natural key both sides would be bucketed by.
  * aggregates are partial-agg friendly (count/sum) → map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions import exact_avg, exact_sum, sql_exact_avg, sql_exact_sum


def v_order_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order rollup: customer attributes + item count + money sums.

    Reference: schema.sql:203-221 — orders LEFT JOIN customers LEFT JOIN
    order_items, GROUP BY the order grain, COUNT(items), SUM(price),
    SUM(freight).  Freight maps to the discount amount in the test star
    schema (FIXTURES.md §7).
    """
    t = load_tables(spark, sf_dir)
    orders, customer, lineitem = t["orders"], t["customer"], t["lineitem"]

    # Pre-aggregate lineitem below the join: the group keys are
    # functionally dependent on o_orderkey, so aggregating first
    # collapses SF×600k wide post-join rows into SF×150k narrow groups
    # before any join — at 100 TB this turns the dominant shuffle from
    # (lineitem ⨝ full order+customer row) into (orderkey, 3 numbers).
    # Catalyst does not push aggregates below joins itself.
    # spread the under-split scan so the partial aggregation's decimal
    # math uses every core (guide §2.5; no-op at scale) — sums here
    # are decimal-exact, partitioning-insensitive
    from ..functions import spread_scan

    per_order = spread_scan(
        lineitem.select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
        )
    ).groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.count("l_linenumber").alias("item_count"),
        exact_sum("l_extendedprice").alias("total_item_price"),
        exact_sum("l_extendedprice * l_discount").alias("total_discount_value"),
    )

    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left"
        )
        .join(per_order, orders.o_orderkey == per_order.order_id, "left")
        .select(
            orders.o_orderkey.alias("order_id"),
            orders.o_custkey.alias("customer_id"),
            customer.c_name.alias("customer_name"),
            customer.c_mktsegment.alias("customer_segment"),
            orders.o_orderstatus.alias("order_status"),
            orders.o_orderdate.alias("order_purchase_timestamp"),
            orders.o_totalprice.alias("order_total_price"),
            # orders with no lineitem: COUNT over the empty group is 0
            # in the reference view, null after the outer join here.
            F.coalesce(per_order.item_count, F.lit(0)).alias("item_count"),
            "total_item_price",
            "total_discount_value",
        )
    )


V_ORDER_SUMMARY_SQL = """
SELECT
    o.o_orderkey                                   AS order_id,
    o.o_custkey                                    AS customer_id,
    c.c_name                                       AS customer_name,
    c.c_mktsegment                                 AS customer_segment,
    o.o_orderstatus                                AS order_status,
    o.o_orderdate                                  AS order_purchase_timestamp,
    o.o_totalprice                                 AS order_total_price,
    count(l.l_linenumber)                          AS item_count,
    {sum_price}                                    AS total_item_price,
    {sum_discount}                                 AS total_discount_value
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2, 3, 4, 5, 6, 7
""".format(
    sum_price=sql_exact_sum("l.l_extendedprice"),
    sum_discount=sql_exact_sum("l.l_extendedprice * l.l_discount"),
)


def v_delivery_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state (→ per-nation) order performance rollup.

    Reference: schema.sql:225-234 — GROUP BY customer_state with
    COUNT(orders), AVG(delivery_duration_hours) and CASE-WHEN
    conditional counts per status.  The star schema's status domain is
    {P,O,F}; the reference's delivered/canceled conditional-count
    pattern is reproduced over it, and the AVG maps to order value.
    """
    t = load_tables(spark, sf_dir)
    orders, customer, nation = t["orders"], t["customer"], t["nation"]

    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "inner")
        .groupBy(nation.n_name.alias("customer_state"))
        .agg(
            F.count(orders.o_orderkey).alias("total_orders"),
            exact_avg("o_totalprice").alias("avg_order_value"),
            F.sum(
                F.when(orders.o_orderstatus == "F", 1).otherwise(0)
            ).alias("delivered_count"),
            F.sum(
                F.when(orders.o_orderstatus == "P", 1).otherwise(0)
            ).alias("pending_count"),
            F.sum(
                F.when(orders.o_orderstatus == "O", 1).otherwise(0)
            ).alias("open_count"),
        )
    )


V_DELIVERY_PERFORMANCE_SQL = """
SELECT
    n.n_name                                            AS customer_state,
    count(o.o_orderkey)                                 AS total_orders,
    {avg_value}                                         AS avg_order_value,
    CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS delivered_count,
    CAST(sum(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending_count,
    CAST(sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_count
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
""".format(avg_value=sql_exact_avg("o.o_totalprice"))
