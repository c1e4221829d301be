"""Analytics extensions beyond the reference's operator set (SURVEY
§2.5-§2.6 notes them absent): grouping sets, pivot, semi/anti joins,
multi-quantiles, backward fill, set operations.  A reference user
gets the full relational surface, not just the subset the pandas code
exercised — each entry oracle-checked like everything else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions import exact_round, local_rows_df, sql_exact_round, sql_exact_sum
from ..operators import cleaners

# --- Ordered string aggregation --------------------------------------------


def region_nation_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region ordered, delimited nation list (LISTAGG/string_agg
    semantics, expressed portably as sort-then-join so element order
    is deterministic in any engine)."""
    t = load_tables(spark, sf_dir, ("region", "nation"))
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), t["nation"].n_regionkey == t["region"].r_regionkey)
        .groupBy(t["region"].r_name.alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias(
                "nation_list"
            ),
        )
    )


REGION_NATION_LIST_SQL = """
SELECT r.r_name AS region_name,
       count(*) AS n_nations,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nation_list
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
"""

# --- ROLLUP / CUBE (grouping sets) -----------------------------------------

_SUM_TOTALPRICE = sql_exact_sum("o_totalprice", 2)


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals status → (status, priority) → grand total.
    One pass; Spark expands grouping sets in the aggregate."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(_SUM_TOTALPRICE).alias("total_value"),
    )


ROLLUP_ORDERS_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {_SUM_TOTALPRICE} AS total_value
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(_SUM_TOTALPRICE).alias("total_value"),
    )


CUBE_ORDERS_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {_SUM_TOTALPRICE} AS total_value
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP and CUBE in one driver-checked result, tagged by grouping
    mode — both grouping-set expansions hash-verified in one registry
    slot.  Each branch is still a single-pass expanded aggregate."""
    return (
        rollup_orders(spark, sf_dir)
        .withColumn("gset", F.lit("rollup"))
        .unionByName(cube_orders(spark, sf_dir).withColumn("gset", F.lit("cube")))
    )


GROUPING_SETS_ORDERS_SQL = f"""
SELECT *, 'rollup' AS gset FROM ({ROLLUP_ORDERS_SQL})
UNION ALL
SELECT *, 'cube' AS gset FROM ({CUBE_ORDERS_SQL})
"""

# --- PIVOT ------------------------------------------------------------------

_STATUSES = ["P", "O", "F"]


def pivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status columns per priority (explicit pivot values: no extra
    distinct-values job, stable schema).  Absent combos → 0 to match
    the conditional-count oracle."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s.lower()}")
            for s in _STATUSES
        ],
    )


PIVOT_ORDERS_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'P') AS n_p,
       count(*) FILTER (o_orderstatus = 'O') AS n_o,
       count(*) FILTER (o_orderstatus = 'F') AS n_f
FROM orders
GROUP BY o_orderpriority
"""

# --- Semi / anti joins ------------------------------------------------------


def semi_anti_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left_semi / left_anti joins, labeled."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o, li = t["orders"], t["lineitem"]
    keys = li.select("l_orderkey").distinct()
    semi = (
        o.join(keys, o.o_orderkey == keys.l_orderkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("bucket", F.lit("with_items"))
    )
    anti = (
        o.join(keys, o.o_orderkey == keys.l_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("bucket", F.lit("without_items"))
    )
    return semi.unionByName(anti).select("bucket", "n_orders")


SEMI_ANTI_ORDERS_SQL = """
SELECT 'with_items' AS bucket, count(*) AS n_orders FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
UNION ALL
SELECT 'without_items' AS bucket, count(*) AS n_orders FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
"""


def set_semi_anti_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins (EXISTS / NOT EXISTS) and set operations
    (INTERSECT / EXCEPT) in one driver-checked result — four labeled
    count rows, each branch the same plan as the standalone operators
    below/above, unioned into one registry slot."""
    semi_anti = semi_anti_orders(spark, sf_dir).withColumnRenamed(
        "n_orders", "n_rows"
    )
    set_ops = set_ops_customers(spark, sf_dir).withColumnRenamed(
        "n_customers", "n_rows"
    )
    return semi_anti.unionByName(set_ops)

# --- Multi-quantile profile (A8 beyond the median) -------------------------


def _exact_quantiles_nosort(df, col: str, qs: list[float], n: int) -> dict[float, float]:
    """Exact interpolated quantiles with NO global sort and no
    single-partition exchange (the 100 TB-safe selection plan):

      1. ``approxQuantile`` brackets each target rank — the GK sketch
         guarantees the returned value's exact rank is within eps*n of
         the requested fraction, so ``[q-delta, q+delta]`` with
         ``delta > eps`` provably surrounds ranks ``lo`` and ``lo+1``.
      2. ONE fused conditional-count pass pins each bracket's global
         rank offset (rows strictly below its lower bound).
      3. Only the union-of-brackets value HISTOGRAM (distinct value →
         count) is collected: ≈2*delta*n entries for continuous
         columns, and collapsed to a handful of entries for
         low-cardinality columns where duplicate mass would make a
         row-level collect explode.
      4. Exact rank walk + linear interpolation over the tiny
         histogram driver-side — bitwise-equal to DuckDB
         ``quantile_cont`` (h = (n-1)q, v_lo + frac*(v_hi - v_lo)).

    At extreme n, shrink delta toward eps and re-bracket *within* the
    bracket (each pass cuts candidates by ~delta) — O(log n) passes,
    still no global sort.  Replaces the round-1 global row_number plan
    (single-partition window = scale-killer, VERDICT r01)."""
    import math

    eps = 1e-4
    delta = 4 * eps + 2.0 / max(n, 1)
    meta, probs = [], []
    for q in qs:
        h = (n - 1) * q
        lo, frac = math.floor(h) + 1, h - math.floor(h)
        meta.append((q, lo, frac))
        probs.append((max(0.0, q - delta), min(1.0, q + delta)))
    flat = sorted({p for pair in probs for p in pair})
    vals = dict(zip(flat, df.approxQuantile(col, flat, eps)))
    brackets = [(vals[plo], vals[phi]) for plo, phi in probs]

    bases = df.agg(
        *[
            F.sum(F.when(F.col(col) < F.lit(vlo), 1).otherwise(0)).alias(f"b{i}")
            for i, (vlo, _) in enumerate(brackets)
        ]
    ).first()

    cond = None
    for vlo, vhi in brackets:
        c = (F.col(col) >= F.lit(vlo)) & (F.col(col) <= F.lit(vhi))
        cond = c if cond is None else (cond | c)
    hist = sorted(
        (float(r[0]), int(r[1]))
        for r in df.filter(cond).groupBy(col).agg(F.count(F.lit(1))).collect()
    )

    out: dict[float, float] = {}
    for i, (q, lo, frac) in enumerate(meta):
        vlo, vhi = brackets[i]

        def value_at(rank: int) -> float:
            cum = int(bases[f"b{i}"])
            for v, c in hist:
                if v < vlo or v > vhi:
                    continue
                cum += c
                if cum >= rank:
                    return v
            raise RuntimeError(
                f"rank {rank} not in bracket [{vlo}, {vhi}] for {col}"
            )

        v_lo = value_at(lo)
        out[q] = v_lo if frac == 0 else v_lo + frac * (value_at(lo + 1) - v_lo)
    return out


def _exact_quantiles_nosort_multi(
    df, cols_qs: dict[str, list[float]], n: int
) -> dict[tuple[str, float], float]:
    """Multi-column twin of _exact_quantiles_nosort that FUSES the
    per-column jobs: one approxQuantile call for every column (same
    prob superset — the sketch pass scans once), one conditional-count
    aggregate pinning every bracket's base rank, and one unioned
    histogram collect.  4 jobs total regardless of column count
    (vs 3 per column + count) — same exact-selection math, same
    no-global-sort guarantee."""
    import math

    eps = 1e-4
    delta = 4 * eps + 2.0 / max(n, 1)
    cols = list(cols_qs)
    meta: dict[str, list] = {c: [] for c in cols}
    probs: dict[str, list] = {c: [] for c in cols}
    for c, qs in cols_qs.items():
        for q in qs:
            h = (n - 1) * q
            meta[c].append((q, math.floor(h) + 1, h - math.floor(h)))
            probs[c].append((max(0.0, q - delta), min(1.0, q + delta)))
    flat = sorted({p for c in cols for pair in probs[c] for p in pair})
    # percentile_approx (codegen aggregate) over DataFrame.approxQuantile
    # (RDD treeAggregate): same GK rank-error bound (≤ n/accuracy), ~3×
    # faster measured; one whole-stage pass sketches every column.
    probs_arr = "array(" + ",".join(f"{p!r}D" for p in flat) + ")"
    accuracy = int(round(1.0 / eps))
    ap_row = df.agg(
        *[
            F.expr(f"percentile_approx({c}, {probs_arr}, {accuracy})").alias(c)
            for c in cols
        ]
    ).first()
    vals = {c: dict(zip(flat, ap_row[c])) for c in cols}
    brackets = {
        c: [(vals[c][plo], vals[c][phi]) for plo, phi in probs[c]] for c in cols
    }

    bases = df.agg(
        *[
            F.sum(F.when(F.col(c) < F.lit(vlo), 1).otherwise(0)).alias(f"b_{c}_{i}")
            for c in cols
            for i, (vlo, _) in enumerate(brackets[c])
        ]
    ).first()

    hist_parts = []
    for c in cols:
        cond = None
        for vlo, vhi in brackets[c]:
            m = (F.col(c) >= F.lit(vlo)) & (F.col(c) <= F.lit(vhi))
            cond = m if cond is None else (cond | m)
        hist_parts.append(
            df.filter(cond)
            .groupBy(F.lit(c).alias("col"), F.col(c).alias("v"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    hist_df = hist_parts[0]
    for part in hist_parts[1:]:
        hist_df = hist_df.unionByName(part)
    hists: dict[str, list] = {c: [] for c in cols}
    for r in hist_df.collect():
        hists[r["col"]].append((float(r["v"]), int(r["cnt"])))
    for c in cols:
        hists[c].sort()

    out: dict[tuple[str, float], float] = {}
    for c in cols:
        for i, (q, lo, frac) in enumerate(meta[c]):
            vlo, vhi = brackets[c][i]
            base = int(bases[f"b_{c}_{i}"])

            def value_at(rank: int) -> float:
                cum = base
                for v, cnt in hists[c]:
                    if v < vlo or v > vhi:
                        continue
                    cum += cnt
                    if cum >= rank:
                        return v
                raise RuntimeError(
                    f"rank {rank} not in bracket [{vlo}, {vhi}] for {c}"
                )

            v_lo = value_at(lo)
            out[(c, q)] = (
                v_lo if frac == 0 else v_lo + frac * (value_at(lo + 1) - v_lo)
            )
    return out


def quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles via approx-bracketed selection —
    see _exact_quantiles_nosort for the no-global-sort plan (and the
    _multi variant for the fused-job form used here); the oracle is
    DuckDB quantile_cont, matched exactly."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    n = li.count()
    r = _exact_quantiles_nosort_multi(
        li.select("l_extendedprice", "l_quantity"),
        {"l_extendedprice": [0.25, 0.5, 0.75], "l_quantity": [0.5]},
        n,
    )
    return local_rows_df(
        spark,
        [
            (
                r[("l_extendedprice", 0.25)],
                r[("l_extendedprice", 0.5)],
                r[("l_extendedprice", 0.75)],
                r[("l_quantity", 0.5)],
            )
        ],
        "price_q25 double, price_q50 double, price_q75 double, qty_q50 double",
    )


QUANTILES_LINEITEM_SQL = """
SELECT quantile_cont(l_extendedprice, 0.25) AS price_q25,
       quantile_cont(l_extendedprice, 0.5)  AS price_q50,
       quantile_cont(l_extendedprice, 0.75) AS price_q75,
       quantile_cont(l_quantity, 0.5)       AS qty_q50
FROM lineitem
"""

# --- Backward fill (P4's other direction) ----------------------------------


def bfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    masked = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "view", F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    return cleaners.fill_directional(
        masked,
        ["value"],
        order_by=["ts", "event_id"],
        partition_by=["user_id"],
        direction="backward",
    )


BFILL_EVENTS_SQL = """
SELECT event_id, user_id, ts, event_type,
       first_value(value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS value
FROM (SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'view' THEN NULL ELSE value END AS value
      FROM events)
"""

# --- As-of join (time-series; oracle = DuckDB native ASOF JOIN) ------------


def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event enriched with the user's latest order state as of the
    event time.  Orders pre-aggregated per (custkey, orderdate) so the
    as-of match is unique; engine op = union-and-carry window (one
    shuffle), oracle = DuckDB's native ASOF LEFT JOIN."""
    from ..operators.temporal import asof_join

    t = load_tables(spark, sf_dir, ("events", "orders"))
    ev = t["events"].select("event_id", "user_id", "ts")
    oagg = (
        t["orders"]
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("order_date"),
        )
        .agg(
            F.expr(sql_exact_sum("o_totalprice", 2)).alias("order_value"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )
    out = asof_join(
        ev,
        oagg,
        on="user_id",
        left_time="ts",
        right_time="order_date",
        payload=["order_value", "order_count"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_order_value").alias("last_order_value"),
        F.col("asof_order_count").alias("last_order_count"),
        F.col("asof_time").alias("last_order_date"),
    )


ASOF_EVENTS_ORDERS_SQL = f"""
WITH oagg AS (
  SELECT o_custkey AS user_id, o_orderdate AS order_date,
         {sql_exact_sum("o_totalprice", 2)} AS order_value,
         count(*) AS order_count
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       o.order_value AS last_order_value,
       o.order_count AS last_order_count,
       o.order_date  AS last_order_date
FROM events e
ASOF LEFT JOIN oagg o ON e.user_id = o.user_id AND e.ts >= o.order_date
"""

# --- TPC-H Q3-style shipping priority (3-way join + agg + top-K) -----------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-heavy 3-way join: segment-filtered customers (broadcast)
    ⨝ date-filtered orders ⨝ lineitem, revenue per order, top 10.
    Filters push to the parquet scans; the only big shuffle is the
    per-order aggregation."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            orders.o_orderkey.alias("order_id"),
            orders.o_orderdate.alias("order_date"),
            orders.o_orderpriority.alias("order_priority"),
        )
        .agg(
            F.expr(sql_exact_sum("l_extendedprice * (1 - l_discount)", 2)).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("order_id").asc())
        .limit(10)
    )


Q3_SHIPPING_PRIORITY_SQL = f"""
SELECT o.o_orderkey AS order_id,
       o.o_orderdate AS order_date,
       o.o_orderpriority AS order_priority,
       {sql_exact_sum("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, order_id ASC
LIMIT 10
"""

# --- Window-function breadth (§2.6: ranking, offsets, distribution) --------


def window_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile, lag/lead offsets, percent_rank/cume_dist
    over a deterministic per-customer order sequence — one Window
    exchange on o_custkey serves every function."""
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.row_number().over(w).alias("seq"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_totalprice", 1).over(w).alias("prev_value"),
        F.lead("o_totalprice", 1).over(w).alias("next_value"),
        exact_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        exact_round(F.cume_dist().over(w), 6).alias("cume"),
    )


WINDOW_FUNCTIONS_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       row_number() OVER w AS seq,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       lag(o_totalprice, 1) OVER w AS prev_value,
       lead(o_totalprice, 1) OVER w AS next_value,
       cast(round(cast(percent_rank() OVER w as decimal(28,8)), 6) as double) AS pct_rank,
       cast(round(cast(cume_dist() OVER w as decimal(28,8)), 6) as double) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_time_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 window breadth + §2.7 date/time toolkit in one
    driver-checked result: ranking/offset/distribution functions share
    ONE Window exchange on o_custkey; calendar decomposition, interval
    arithmetic and day diffs are per-row expressions fused into the
    same projection — two operator families, one registry slot, one
    shuffle."""
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.row_number().over(w).alias("seq"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_totalprice", 1).over(w).alias("prev_value"),
        F.lead("o_totalprice", 1).over(w).alias("next_value"),
        exact_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        exact_round(F.cume_dist().over(w), 6).alias("cume"),
        F.year(ts).alias("order_year"),
        F.quarter(ts).alias("order_quarter"),
        F.month(ts).alias("order_month"),
        F.dayofmonth(ts).alias("order_day"),
        F.hour(ts).alias("order_hour"),
        F.date_trunc("month", ts).alias("month_start"),
        (ts + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.lit("2000-01-01").cast("timestamp").cast("date"), ts.cast("date")
        ).alias("days_to_y2k"),
    )


WINDOW_TIME_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       row_number() OVER w AS seq,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       lag(o_totalprice, 1) OVER w AS prev_value,
       lead(o_totalprice, 1) OVER w AS next_value,
       cast(round(cast(percent_rank() OVER w as decimal(28,8)), 6) as double) AS pct_rank,
       cast(round(cast(cume_dist() OVER w as decimal(28,8)), 6) as double) AS cume,
       extract(year FROM o_orderdate)::INT    AS order_year,
       extract(quarter FROM o_orderdate)::INT AS order_quarter,
       extract(month FROM o_orderdate)::INT   AS order_month,
       extract(day FROM o_orderdate)::INT     AS order_day,
       extract(hour FROM o_orderdate)::INT    AS order_hour,
       date_trunc('month', o_orderdate)       AS month_start,
       o_orderdate + INTERVAL 30 DAY          AS due_date,
       date_diff('day', o_orderdate::DATE, DATE '2000-01-01')::INT AS days_to_y2k
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

# --- Correlated scalar subquery --------------------------------------------

_CORRELATED_SQL = """
SELECT o.o_orderkey AS order_id, o.o_custkey AS customer_id,
       o.o_totalprice AS order_value
FROM orders o
WHERE o.o_totalprice > 1.5 * (
    SELECT avg(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
"""


def correlated_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join; the *same SQL text* runs on DuckDB as the
    oracle.  The avg comparison is a >-predicate on a 1.5× margin, so
    sub-ulp engine differences in the avg cannot flip row membership
    (no order value sits within 1e-9 of exactly 1.5×avg)."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_CORRELATED_SQL)


CORRELATED_ABOVE_AVG_SQL = _CORRELATED_SQL

# --- Per-group regression (linear trend of customer spend) -----------------


def customer_spend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer linear trend of order value over time via native
    regr_slope/regr_intercept (JVM-side; the applyInPandas equivalent
    is tested against this in tests/test_grouped_map.py).

    x is re-centered to days-since-1995 — regressing against raw epoch
    seconds (~8e8) loses precision to cancellation in both engines and
    the engines cancel *differently*; conditioning the regressor keeps
    cross-engine agreement inside the 8dp round."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    x = (
        F.col("o_orderdate").cast("timestamp").cast("double")
        - F.lit(788918400.0)  # 1995-01-01 UTC
    ) / F.lit(86400.0)
    per_cust = (
        o.select(F.col("o_custkey").alias("customer_id"), x.alias("x"), F.col("o_totalprice").alias("y"))
        .groupBy("customer_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_round_expr("regr_slope(y, x)", 8).alias("spend_slope"),
            exact_round_expr("regr_intercept(y, x)", 4).alias("spend_intercept"),
        )
        .filter(F.col("n_orders") >= 3)
    )
    return per_cust


def exact_round_expr(term: str, scale: int) -> F.Column:
    from ..functions import sql_exact_round

    return F.expr(sql_exact_round(term, scale))


CUSTOMER_SPEND_SLOPE_SQL = """
WITH pts AS (
  SELECT o_custkey AS customer_id,
         (extract(epoch FROM o_orderdate) - 788918400.0) / 86400.0 AS x,
         o_totalprice AS y
  FROM orders
)
SELECT customer_id,
       count(*) AS n_orders,
       cast(round(cast(regr_slope(y, x) as decimal(28,12)), 8) as double) AS spend_slope,
       cast(round(cast(regr_intercept(y, x) as decimal(28,8)), 4) as double) AS spend_intercept
FROM pts
GROUP BY customer_id
HAVING count(*) >= 3
"""

# --- Bucketed range join (repeat purchases within 7 days) ------------------


def repeat_orders_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order pairs by the same customer ≤7 days apart — the bucketed
    range join (operators/temporal.range_self_join); the oracle is the
    plain inequality self-join DuckDB executes natively (IEJoin)."""
    from ..operators.temporal import range_self_join

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    pairs = range_self_join(
        o,
        key="o_custkey",
        time_col="o_orderdate",
        id_col="o_orderkey",
        max_gap_seconds=7 * 86400.0,
    )
    return pairs.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("id_a").alias("first_order"),
        F.col("id_b").alias("second_order"),
        "gap_days",
    )


REPEAT_ORDERS_7D_SQL = """
SELECT a.o_custkey AS customer_id,
       a.o_orderkey AS first_order,
       b.o_orderkey AS second_order,
       (extract(epoch FROM b.o_orderdate) - extract(epoch FROM a.o_orderdate))
         / 86400.0 AS gap_days
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate >= a.o_orderdate
 AND extract(epoch FROM b.o_orderdate) - extract(epoch FROM a.o_orderdate)
     <= 7 * 86400
 AND (a.o_orderdate < b.o_orderdate
      OR (a.o_orderdate = b.o_orderdate AND a.o_orderkey < b.o_orderkey))
"""

# --- TPC-H Q5-shape: 5-way join through the full star ----------------------


def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region → nation → customer → orders → lineitem chain: the
    deepest join path the star schema offers.  Small dims broadcast;
    Catalyst (with AQE) orders the rest; revenue decimal-exact."""
    t = load_tables(
        spark, sf_dir, ("region", "nation", "customer", "orders", "lineitem")
    )
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(F.broadcast(t["customer"]), t["orders"].o_custkey == t["customer"].c_custkey)
        .join(F.broadcast(t["nation"]), t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]), t["nation"].n_regionkey == t["region"].r_regionkey)
        .filter(t["orders"].o_orderdate >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy(
            t["region"].r_name.alias("region_name"),
            t["nation"].n_name.alias("nation_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(sql_exact_sum("l_extendedprice * (1 - l_discount)", 2)).alias(
                "revenue"
            ),
        )
    )


Q5_NATION_VOLUME_SQL = f"""
SELECT r.r_name AS region_name, n.n_name AS nation_name,
       count(*) AS n_items,
       {sql_exact_sum("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY 1, 2
"""

# --- Sketch aggregates (the 100 TB path; rows-only check) -------------------


def sketch_aggregates_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct + t-digest-style percentile sketches — the
    bounded-memory forms of A5/A8 for stream/corpus scale.  No direct
    oracle: sketch internals differ across engines by design (driver
    records the weaker rows-only check), but ``sketch_bounds_events``
    is the hash-checkable twin — each engine proves its OWN sketch
    lands inside exact bounds, and those booleans match."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx_median_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sketch_bounds_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounds-oracle twin of ``sketch_aggregates_events`` (VERDICT r03
    item 2): sketch VALUES are engine-specific, but the claim "the
    sketch lands within a deterministic error bound of the exact
    answer" is SQL-expressible on both engines.  Each engine computes
    its own HLL distinct + approx median AND the exact distinct +
    exact 45th/55th percentiles, then emits booleans:

    * ``approx_users_ok``: |HLL − exact| ≤ 15% of exact (Spark's
      default rsd is 0.05, DuckDB's HLL error ~1.6% — 15% is 3σ for
      the looser engine, so the boolean is deterministically true on
      both sides and hash-matches).
    * ``approx_median_ok``: the approx median falls between the exact
      p45 and p55 (approx_percentile accuracy 1000 bounds rank error
      to 0.1%, far inside the ±5% rank window).

    Exact columns (n_events, n_users) hash-match outright.  Scale
    note: the exact twins make this a verification query — at corpus
    scale you run the sketches alone and spot-check bounds on a
    sample partition."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id").alias("au"),
        F.expr("percentile(value, 0.45D)").alias("p45"),
        F.expr("percentile(value, 0.55D)").alias("p55"),
        F.expr("approx_percentile(value, 0.5D, 1000)").alias("am"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_users",
        (
            F.abs(F.col("au").cast("double") - F.col("n_users").cast("double"))
            <= F.lit(0.15) * F.col("n_users").cast("double")
        ).alias("approx_users_ok"),
        F.coalesce(
            F.col("am").between(F.col("p45"), F.col("p55")),
            F.col("am").isNull() & F.col("p45").isNull(),
        ).alias("approx_median_ok"),
    )


SKETCH_BOUNDS_EVENTS_SQL = """
WITH agg AS (
  SELECT event_type,
         count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
         approx_count_distinct(user_id) AS au,
         quantile_cont(value, 0.45) AS p45,
         quantile_cont(value, 0.55) AS p55,
         approx_quantile(value, 0.5) AS am
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_users AS BIGINT) AS n_users,
       abs(CAST(au AS DOUBLE) - CAST(n_users AS DOUBLE))
         <= 0.15 * CAST(n_users AS DOUBLE) AS approx_users_ok,
       coalesce(am BETWEEN p45 AND p55,
                am IS NULL AND p45 IS NULL) AS approx_median_ok
FROM agg
"""


# --- Count-min sketch heavy hitters (bounded-state hot keys) -----------------

CMS_WIDTH = 128
CMS_DEPTH = 4
CMS_TOP_K = 20


def cms_heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection over ``events.user_id`` through a
    count-min sketch (``operators/sketches.py``): the estimate of
    every candidate key is the MIN over its depth×width counters, the
    top-``CMS_TOP_K`` by estimate are emitted next to their exact
    counts, and ``est_ge_exact`` states the CMS one-sided-error law
    (never true-count-below — deterministically TRUE for every row).

    The sketch hash family is pure BIGINT arithmetic shared verbatim
    with the oracle SQL, so both engines build the IDENTICAL sketch
    and the estimates hash-match cell-exactly — no bounds-twin
    weakening needed (contrast ``sketch_aggregates_events``).

    Scale shape: the sketch is one map-side-combinable aggregate into
    ≤ 512 cells (partial aggregates are per-partition sketches — the
    shuffle moves ≤ 512 rows per partition regardless of data size),
    and the estimate join broadcasts those cells.  The exact
    ``groupBy(user_id)`` twin is the verification half: at corpus
    scale you keep the sketch, feed candidates from the current batch
    only, and spot-check exact counts on a sample — the same
    verification-query framing as ``sketch_bounds_events``.
    """
    from ..operators import sketches

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cms = sketches.cms_build(
        ev, "user_id", width=CMS_WIDTH, depth=CMS_DEPTH
    )
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    est = sketches.cms_estimate(
        cms, exact, "user_id", width=CMS_WIDTH, depth=CMS_DEPTH
    )
    from pyspark.sql import Window

    # TakeOrdered top-K first (bounded, no global-window single task),
    # THEN rank inside the K-row frame — identical to the global rank
    # because the limit used the same ordering.
    topk = est.orderBy(F.desc("cms_est"), F.asc("user_id")).limit(CMS_TOP_K)
    w = Window.orderBy(F.desc("cms_est"), F.asc("user_id"))
    return (
        topk.withColumn("hh_rank", F.row_number().over(w))
        .select(
            "hh_rank",
            "user_id",
            F.col("cms_est").cast("long").alias("cms_est"),
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            (F.col("cms_est") - F.col("exact_cnt"))
            .cast("long")
            .alias("est_err"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("est_ge_exact"),
        )
    )


def _cms_heavy_hitters_sql() -> str:
    from ..operators.sketches import CMS_HASHES, _bucket_sql

    hash_rows = ", ".join(
        f"({d}, {a}, {b})" for d, (a, b) in enumerate(CMS_HASHES[:CMS_DEPTH])
    )
    # the same arithmetic as _bucket_sql, parameterized by the VALUES row
    bucket = _bucket_sql("e.user_id", 1, 0, CMS_WIDTH).replace(
        " * 1 + 0", " * h.a + h.b"
    )
    return f"""
WITH h AS (SELECT * FROM (VALUES {hash_rows}) t(d, a, b)),
cells AS (
  SELECT h.d, {bucket} AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM events e CROSS JOIN h
  WHERE e.user_id IS NOT NULL
  GROUP BY 1, 2
),
exact AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
probes AS (
  SELECT e.user_id, e.exact_cnt, h.d, {bucket} AS bucket
  FROM exact e CROSS JOIN h
),
est AS (
  SELECT user_id, exact_cnt,
         CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
  FROM probes p LEFT JOIN cells c USING (d, bucket)
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY cms_est DESC, user_id ASC) AS INT)
           AS hh_rank,
         user_id, cms_est, exact_cnt,
         cms_est - exact_cnt AS est_err,
         cms_est >= exact_cnt AS est_ge_exact
  FROM est
) WHERE hh_rank <= {CMS_TOP_K}
"""


CMS_HEAVY_HITTERS_SQL = _cms_heavy_hitters_sql()


# --- CMS-informed conditional salting ----------------------------------------

CMS_SALT_WIDTH = 1024  # wider than the heavy-hitter sketch: estimates
# gate a per-key routing decision here, so width should dominate key
# cardinality (~1.5k users at sf0.1) — still only 4096 cells
CMS_SALT_THRESHOLD = 75
CMS_SALT_BUCKETS = 16


def cms_salted_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event rollup through the sketch-gated salting path
    (``operators/sketches.py:cms_salted_aggregate``): keys the CMS
    estimates at ≥ {threshold} rows take a 16-way salt, the rest
    aggregate plain — one tree, and the result is bit-identical to
    ``groupBy(user_id)`` (the oracle is exactly that plain GROUP BY,
    plus the deterministic flag recomputed from the shared-arithmetic
    sketch).  ``took_salted_path`` makes the routing decision itself
    a hash-checked cell.

    The one-sided CMS law guarantees no truly-hot key dodges the
    salt; estimate inflation under bucket collisions only ever salts
    MORE keys (still correct, mildly more phase-2 work) — which is
    why this spec widens the sketch to dominate key cardinality."""
    from ..operators import sketches

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ev = ev.where(F.col("user_id").isNotNull())
    cms = sketches.cms_build(
        ev, "user_id", width=CMS_SALT_WIDTH, depth=CMS_DEPTH
    )
    out = sketches.cms_salted_aggregate(
        ev,
        "user_id",
        cms,
        CMS_SALT_THRESHOLD,
        sums={"__sv": "cast(value as decimal(28,8))"},
        count_alias="n_events",
        salt_buckets=CMS_SALT_BUCKETS,
        width=CMS_SALT_WIDTH,
        depth=CMS_DEPTH,
    )
    return out.select(
        "user_id",
        "n_events",
        F.round(F.col("__sv"), 2).cast("double").alias("sum_value"),
        "took_salted_path",
    )


def _cms_salted_rollup_sql() -> str:
    from ..operators.sketches import CMS_HASHES, _bucket_sql

    hash_rows = ", ".join(
        f"({d}, {a}, {b})" for d, (a, b) in enumerate(CMS_HASHES[:CMS_DEPTH])
    )
    bucket = _bucket_sql("e.user_id", 1, 0, CMS_SALT_WIDTH).replace(
        " * 1 + 0", " * h.a + h.b"
    )
    return f"""
WITH h AS (SELECT * FROM (VALUES {hash_rows}) t(d, a, b)),
ev AS (SELECT * FROM events WHERE user_id IS NOT NULL),
cells AS (
  SELECT h.d, {bucket} AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM ev e CROSS JOIN h
  GROUP BY 1, 2
),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         {sql_exact_sum("value", 2)} AS sum_value
  FROM ev GROUP BY 1
),
est AS (
  SELECT p.user_id, min(coalesce(c.cnt, 0)) AS cms_est
  FROM (SELECT e.user_id, h.d, {bucket} AS bucket
        FROM (SELECT DISTINCT user_id FROM ev) e CROSS JOIN h) p
  LEFT JOIN cells c USING (d, bucket)
  GROUP BY 1
)
SELECT a.user_id, a.n_events, a.sum_value,
       e.cms_est >= {CMS_SALT_THRESHOLD} AS took_salted_path
FROM agg a JOIN est e USING (user_id)
"""


CMS_SALTED_ROLLUP_SQL = _cms_salted_rollup_sql()


# --- Mergeable quantile histogram --------------------------------------------

HIST_LO, HIST_HI, HIST_BINS = 0.0, 1024.0, 256  # width exactly 4.0
HIST_QS = (0.25, 0.5, 0.9, 0.99)


def hist_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from the mergeable fixed-bin histogram
    (``operators/sketches.py:hist_build/hist_quantile``) — the
    deterministic, cross-engine-exact alternative to
    ``approx_percentile`` whose t-digest cells are engine-specific
    (the reason ``sketch_aggregates_events`` is rows-only; THIS sketch
    is hash-checked cell-exact).

    * 'cell' rows — the histogram itself (≤ 258 bins incl. under/
      overflow), built from shared binning arithmetic so both engines
      produce identical cells;
    * 'quantile' rows — interpolated estimates for q ∈ {0.25, 0.5,
      0.9, 0.99} (hash-exact: pure arithmetic on identical cells) and
      ``ok`` = |est − exact percentile| ≤ 2·width — the deterministic
      error bound as a checked cell (exact enters ONLY through the
      wide-margin boolean, the sketch_bounds_events discipline, since
      engines' percentile interpolation can differ in the last ulp).

    Scale: build is one map-side-combinable agg into ≤ 258 cells;
    estimation runs entirely on the bounded histogram frame.  The
    sketch merges cell-wise (hist_merge) and drops into
    ``start_cms_stream``'s segment/compact loop unchanged — quantiles
    over a 100 TB stream with 2 KB of state."""
    from ..operators import sketches

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hist = sketches.hist_build(
        ev, "value", lo=HIST_LO, hi=HIST_HI, bins=HIST_BINS
    ).cache()  # two consumers (cells + quantile walk): one evaluation
    nd = F.lit(None).cast("double")
    cells = hist.select(
        F.lit("cell").alias("variant"),
        "bin",
        "cnt",
        nd.alias("q"),
        nd.alias("est"),
        F.lit(None).cast("boolean").alias("ok"),
    )
    est = sketches.hist_quantile(
        hist, list(HIST_QS), lo=HIST_LO, hi=HIST_HI, bins=HIST_BINS
    )
    exact = ev.agg(
        F.expr(
            "percentile(value, array("
            + ", ".join(f"{q}D" for q in HIST_QS)
            + "))"
        ).alias("__arr")
    ).select(
        F.posexplode("__arr").alias("__i", "__x")
    ).select(
        F.element_at(
            F.array(*[F.lit(q) for q in HIST_QS]), F.col("__i") + 1
        ).alias("q"),
        F.col("__x").alias("__exact"),
    )
    width = (HIST_HI - HIST_LO) / HIST_BINS
    quant = (
        est.join(F.broadcast(exact), "q")
        .select(
            F.lit("quantile").alias("variant"),
            F.lit(None).cast("bigint").alias("bin"),
            F.lit(None).cast("bigint").alias("cnt"),
            "q",
            exact_round(F.col("est"), 6).alias("est"),
            (
                F.abs(F.col("est") - F.col("__exact"))
                <= F.lit(2.0 * width)
            ).alias("ok"),
        )
    )
    return cells.unionByName(quant)


def _hist_quantiles_sql() -> str:
    from ..functions import sql_exact_round
    from ..operators.sketches import _hist_bin_sql

    w = (HIST_HI - HIST_LO) / HIST_BINS
    binsql = _hist_bin_sql("value", HIST_LO, HIST_HI, HIST_BINS)
    exact_rows = "\nUNION ALL\n".join(
        f"SELECT {q!r} AS q, quantile_cont(value, {q!r}) AS x FROM events"
        for q in HIST_QS
    )
    est = (
        f"greatest({HIST_LO!r}, least({HIST_HI!r},"
        f" {HIST_LO!r} + {w!r} * bin"
        f" + {w!r} * (need - cumb) / cnt))"
    )
    return f"""
WITH h AS (
  SELECT {binsql} AS bin, CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
c AS (
  SELECT bin, cnt,
         CAST(sum(cnt) OVER (ORDER BY bin) AS DOUBLE) AS cum,
         CAST(sum(cnt) OVER (ORDER BY bin) - cnt AS DOUBLE) AS cumb
  FROM h
),
n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM h),
qs AS (SELECT unnest([{", ".join(repr(q) for q in HIST_QS)}]) AS q),
pick AS (
  SELECT qs.q, c.bin, c.cnt, c.cumb, qs.q * n.n AS need
  FROM c CROSS JOIN n CROSS JOIN qs
  WHERE c.cumb < qs.q * n.n AND c.cum >= qs.q * n.n
),
ex AS ({exact_rows})
SELECT 'cell' AS variant, bin, cnt, CAST(NULL AS DOUBLE) AS q,
       CAST(NULL AS DOUBLE) AS est, CAST(NULL AS BOOLEAN) AS ok
FROM h
UNION ALL
SELECT 'quantile', NULL, NULL, p.q,
       {sql_exact_round(est, 6)},
       abs({est} - ex.x) <= {2.0 * w!r}
FROM pick p JOIN ex ON p.q = ex.q
"""


HIST_QUANTILES_SQL = _hist_quantiles_sql()

GROUP_HIST_QS = (0.5, 0.9)


def group_hist_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantiles from the mergeable histogram — the
    bounded-state twin of ``group_quantiles_events``: that spec's
    bucketed exact rank walks the DATA per group; this one keeps a
    fixed 258-cell grid per group, so per-group state is constant and
    the whole estimate runs on |groups|·258 sketch rows.  Same tagged
    union as ``hist_quantiles_events`` plus the group key; the
    quantile window partitions on the group over SKETCH rows (fixed
    frame, not the mega-domain cliff)."""
    from ..operators import sketches

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ev = ev.where(F.col("event_type").isNotNull())
    hist = sketches.hist_build(
        ev,
        "value",
        lo=HIST_LO,
        hi=HIST_HI,
        bins=HIST_BINS,
        by=("event_type",),
    ).cache()  # two consumers: one evaluation
    nd = F.lit(None).cast("double")
    cells = hist.select(
        F.lit("cell").alias("variant"),
        "event_type",
        "bin",
        "cnt",
        nd.alias("q"),
        nd.alias("est"),
        F.lit(None).cast("boolean").alias("ok"),
    )
    est = sketches.hist_quantile(
        hist,
        list(GROUP_HIST_QS),
        lo=HIST_LO,
        hi=HIST_HI,
        bins=HIST_BINS,
        by=("event_type",),
    )
    exact = (
        ev.groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array("
                + ", ".join(f"{q}D" for q in GROUP_HIST_QS)
                + "))"
            ).alias("__arr")
        )
        .select("event_type", F.posexplode("__arr").alias("__i", "__x"))
        .select(
            "event_type",
            F.element_at(
                F.array(*[F.lit(q) for q in GROUP_HIST_QS]), F.col("__i") + 1
            ).alias("q"),
            F.col("__x").alias("__exact"),
        )
    )
    width = (HIST_HI - HIST_LO) / HIST_BINS
    quant = est.join(F.broadcast(exact), ["event_type", "q"]).select(
        F.lit("quantile").alias("variant"),
        "event_type",
        F.lit(None).cast("bigint").alias("bin"),
        F.lit(None).cast("bigint").alias("cnt"),
        "q",
        exact_round(F.col("est"), 6).alias("est"),
        (F.abs(F.col("est") - F.col("__exact")) <= F.lit(2.0 * width)).alias(
            "ok"
        ),
    )
    return cells.unionByName(quant)


def _group_hist_quantiles_sql() -> str:
    from ..functions import sql_exact_round
    from ..operators.sketches import _hist_bin_sql

    w = (HIST_HI - HIST_LO) / HIST_BINS
    binsql = _hist_bin_sql("value", HIST_LO, HIST_HI, HIST_BINS)
    est = (
        f"greatest({HIST_LO!r}, least({HIST_HI!r},"
        f" {HIST_LO!r} + {w!r} * bin"
        f" + {w!r} * (need - cumb) / cnt))"
    )
    return f"""
WITH ev AS (SELECT * FROM events WHERE event_type IS NOT NULL),
h AS (
  SELECT event_type, {binsql} AS bin, CAST(count(*) AS BIGINT) AS cnt
  FROM ev WHERE value IS NOT NULL GROUP BY 1, 2
),
c AS (
  SELECT event_type, bin, cnt,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin)
              AS DOUBLE) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) - cnt
              AS DOUBLE) AS cumb
  FROM h
),
n AS (SELECT event_type, CAST(sum(cnt) AS DOUBLE) AS n FROM h GROUP BY 1),
qs AS (SELECT unnest([{", ".join(repr(q) for q in GROUP_HIST_QS)}]) AS q),
pick AS (
  SELECT qs.q, c.event_type, c.bin, c.cnt, c.cumb, qs.q * n.n AS need
  FROM c JOIN n USING (event_type) CROSS JOIN qs
  WHERE c.cumb < qs.q * n.n AND c.cum >= qs.q * n.n
),
ex AS (
  {chr(10).join(
      ("UNION ALL " if i else "")
      + f"SELECT event_type, {q!r} AS q, quantile_cont(value, {q!r}) AS x"
        " FROM ev GROUP BY 1"
      for i, q in enumerate(GROUP_HIST_QS)
  )}
)
SELECT 'cell' AS variant, event_type, bin, cnt, CAST(NULL AS DOUBLE) AS q,
       CAST(NULL AS DOUBLE) AS est, CAST(NULL AS BOOLEAN) AS ok
FROM h
UNION ALL
SELECT 'quantile', p.event_type, NULL, NULL, p.q,
       {sql_exact_round(est, 6)},
       abs({est} - ex.x) <= {2.0 * w!r}
FROM pick p JOIN ex ON p.q = ex.q AND p.event_type = ex.event_type
"""


GROUP_HIST_QUANTILES_SQL = _group_hist_quantiles_sql()


def hist_suite_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-family consolidation (the registry-trade vehicle for
    ``hist_quantiles_events`` + ``group_hist_quantiles_events``): ONE
    grouped build pass serves both — the GLOBAL histogram is the
    marginal of the grouped one (sum cells over event_type: sketch
    linearity again, no second corpus scan), with the null-event_type
    mass folded in by the same marginalization that recovers it.
    Variants 'gcell'/'gquantile' are the grouped spec's cells and
    estimates verbatim; 'cell'/'quantile' the global spec's (both
    specs' own oracles pin the parts; the suite oracle pins the
    union).  At 100 TB the consolidation removes a full duplicate
    scan+bin pass of the fact table."""
    from ..operators import sketches

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # grouped build includes null event types so the global marginal
    # covers ALL rows (the grouped LEGS then filter them out, matching
    # group_hist_quantiles_events' not-null contract)
    ghist = sketches.hist_build(
        ev,
        "value",
        lo=HIST_LO,
        hi=HIST_HI,
        bins=HIST_BINS,
        by=("event_type",),
    ).cache()  # one evaluation, four consumers
    hist = ghist.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    gh = ghist.where(F.col("event_type").isNotNull())
    nd = F.lit(None).cast("double")
    nb = F.lit(None).cast("bigint")
    ns = F.lit(None).cast("string")
    width = (HIST_HI - HIST_LO) / HIST_BINS

    def _quant_leg(est_df, exact_df, variant, keys):
        return est_df.join(F.broadcast(exact_df), [*keys, "q"]).select(
            F.lit(variant).alias("variant"),
            (F.col("event_type") if keys else ns).alias("event_type"),
            nb.alias("bin"),
            nb.alias("cnt"),
            "q",
            exact_round(F.col("est"), 6).alias("est"),
            (
                F.abs(F.col("est") - F.col("__exact")) <= F.lit(2.0 * width)
            ).alias("ok"),
        )

    cells = hist.select(
        F.lit("cell").alias("variant"),
        ns.alias("event_type"),
        "bin",
        "cnt",
        nd.alias("q"),
        nd.alias("est"),
        F.lit(None).cast("boolean").alias("ok"),
    )
    gcells = gh.select(
        F.lit("gcell").alias("variant"),
        "event_type",
        "bin",
        "cnt",
        nd.alias("q"),
        nd.alias("est"),
        F.lit(None).cast("boolean").alias("ok"),
    )
    est = sketches.hist_quantile(
        hist, list(HIST_QS), lo=HIST_LO, hi=HIST_HI, bins=HIST_BINS
    )
    exact = (
        ev.agg(
            F.expr(
                "percentile(value, array("
                + ", ".join(f"{q}D" for q in HIST_QS)
                + "))"
            ).alias("__arr")
        )
        .select(F.posexplode("__arr").alias("__i", "__x"))
        .select(
            F.element_at(
                F.array(*[F.lit(q) for q in HIST_QS]), F.col("__i") + 1
            ).alias("q"),
            F.col("__x").alias("__exact"),
        )
    )
    gest = sketches.hist_quantile(
        gh,
        list(GROUP_HIST_QS),
        lo=HIST_LO,
        hi=HIST_HI,
        bins=HIST_BINS,
        by=("event_type",),
    )
    gexact = (
        ev.where(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array("
                + ", ".join(f"{q}D" for q in GROUP_HIST_QS)
                + "))"
            ).alias("__arr")
        )
        .select("event_type", F.posexplode("__arr").alias("__i", "__x"))
        .select(
            "event_type",
            F.element_at(
                F.array(*[F.lit(q) for q in GROUP_HIST_QS]), F.col("__i") + 1
            ).alias("q"),
            F.col("__x").alias("__exact"),
        )
    )
    return (
        cells.unionByName(gcells)
        .unionByName(_quant_leg(est, exact, "quantile", []))
        .unionByName(_quant_leg(gest, gexact, "gquantile", ["event_type"]))
    )


def _hist_suite_sql() -> str:
    """The parts' SQL texts, re-keyed: the global half re-derives its
    cells as the marginal of the grouped build (matching the Spark
    plan's single pass), then both quantile tails run unchanged."""
    from ..functions import sql_exact_round
    from ..operators.sketches import _hist_bin_sql

    w = (HIST_HI - HIST_LO) / HIST_BINS
    binsql = _hist_bin_sql("value", HIST_LO, HIST_HI, HIST_BINS)
    est = (
        f"greatest({HIST_LO!r}, least({HIST_HI!r},"
        f" {HIST_LO!r} + {w!r} * bin"
        f" + {w!r} * (need - cumb) / cnt))"
    )
    g_exact_rows = "\n  UNION ALL\n  ".join(
        ("" if i == 0 else "")
        + f"SELECT event_type, {q!r} AS q, quantile_cont(value, {q!r}) AS x"
        " FROM events WHERE event_type IS NOT NULL GROUP BY 1"
        for i, q in enumerate(GROUP_HIST_QS)
    )
    exact_rows = "\n  UNION ALL\n  ".join(
        f"SELECT {q!r} AS q, quantile_cont(value, {q!r}) AS x FROM events"
        for q in HIST_QS
    )
    return f"""
WITH gh0 AS (
  SELECT event_type, {binsql} AS bin, CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
h AS (SELECT bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM gh0 GROUP BY 1),
gh AS (SELECT * FROM gh0 WHERE event_type IS NOT NULL),
c AS (
  SELECT bin, cnt,
         CAST(sum(cnt) OVER (ORDER BY bin) AS DOUBLE) AS cum,
         CAST(sum(cnt) OVER (ORDER BY bin) - cnt AS DOUBLE) AS cumb
  FROM h
),
n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM h),
qs AS (SELECT unnest([{", ".join(repr(q) for q in HIST_QS)}]) AS q),
pick AS (
  SELECT qs.q, c.bin, c.cnt, c.cumb, qs.q * n.n AS need
  FROM c CROSS JOIN n CROSS JOIN qs
  WHERE c.cumb < qs.q * n.n AND c.cum >= qs.q * n.n
),
ex AS ({exact_rows}),
gc AS (
  SELECT event_type, bin, cnt,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin)
              AS DOUBLE) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) - cnt
              AS DOUBLE) AS cumb
  FROM gh
),
gn AS (SELECT event_type, CAST(sum(cnt) AS DOUBLE) AS n FROM gh GROUP BY 1),
gqs AS (SELECT unnest([{", ".join(repr(q) for q in GROUP_HIST_QS)}]) AS q),
gpick AS (
  SELECT gqs.q, gc.event_type, gc.bin, gc.cnt, gc.cumb, gqs.q * gn.n AS need
  FROM gc JOIN gn USING (event_type) CROSS JOIN gqs
  WHERE gc.cumb < gqs.q * gn.n AND gc.cum >= gqs.q * gn.n
),
gex AS (
  {g_exact_rows}
)
SELECT 'cell' AS variant, CAST(NULL AS VARCHAR) AS event_type, bin, cnt,
       CAST(NULL AS DOUBLE) AS q, CAST(NULL AS DOUBLE) AS est,
       CAST(NULL AS BOOLEAN) AS ok
FROM h
UNION ALL
SELECT 'gcell', event_type, bin, cnt, NULL, NULL, NULL FROM gh
UNION ALL
SELECT 'quantile', NULL, NULL, NULL, p.q,
       {sql_exact_round(est, 6)}, abs({est} - ex.x) <= {2.0 * w!r}
FROM pick p JOIN ex ON p.q = ex.q
UNION ALL
SELECT 'gquantile', p.event_type, NULL, NULL, p.q,
       {sql_exact_round(est, 6)}, abs({est} - gex.x) <= {2.0 * w!r}
FROM gpick p JOIN gex ON p.q = gex.q AND p.event_type = gex.event_type
"""


HIST_SUITE_SQL = _hist_suite_sql()


# --- Distribution drift (PSI over mergeable histograms) ----------------------

DRIFT_BINS = 16
DRIFT_SCALE = 3.0
DRIFT_THRESHOLD = 0.25


def hist_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest drift monitoring (``operators/sketches.py:hist_psi``):
    Population Stability Index per event_type between a reference and
    a current histogram, with the verdict (`drifted` = PSI > 0.25,
    the standard alert line) as a hash-checked cell.  Two legs:

    * 'split' — even vs odd event_ids: two samples of the SAME
      distribution, PSI ≈ the B/n small-sample bias (measured ≤ 0.02
      per type at sf0.01) → drifted FALSE everywhere;
    * 'scaled' — even vs odd·3: a real shift, PSI ≥ 1.0 per type
      (measured) → drifted TRUE everywhere.

    Coarse DRIFT_BINS=16 keeps the small-sample bias (≈ 2B/n) far
    under the threshold at the driver scale; at sf0.001 per-type
    halves drop to ~100 rows and the bias can cross it — the
    documented reason this spec's differential runs at sf0.01+.

    Scale story: the reference side is a persisted 2 KB sketch (built
    once, or accrued by the streaming loop), so per-ingest drift
    checks cost one histogram pass over the NEW data plus sketch-frame
    arithmetic — never a rescan of the reference corpus.  The 9dp
    decimal term sum makes the score bit-reproducible despite ln."""
    from ..operators import sketches

    ev = load_tables(spark, sf_dir, ("events",))["events"].where(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    common = dict(lo=HIST_LO, hi=HIST_HI, bins=DRIFT_BINS, by=("event_type",))
    ref = sketches.hist_build(
        ev.where(F.col("event_id") % 2 == 0), "value", **common
    ).cache()  # two PSI consumers: one evaluation of the even-half scan
    odd = ev.where(F.col("event_id") % 2 == 1)
    cur_split = sketches.hist_build(odd, "value", **common)
    cur_scaled = sketches.hist_build(
        odd.select(
            "event_type", (F.col("value") * DRIFT_SCALE).alias("value")
        ),
        "value",
        **common,
    )
    legs = []
    for variant, cur in (("split", cur_split), ("scaled", cur_scaled)):
        legs.append(
            sketches.hist_psi(ref, cur, by=("event_type",)).select(
                F.lit(variant).alias("variant"),
                "event_type",
                "psi",
                (F.col("psi") > F.lit(DRIFT_THRESHOLD)).alias("drifted"),
            )
        )
    return legs[0].unionByName(legs[1])


def _hist_drift_sql() -> str:
    from ..operators.sketches import _hist_bin_sql

    def leg(variant: str, val_expr: str) -> str:
        b_ref = _hist_bin_sql("value", HIST_LO, HIST_HI, DRIFT_BINS)
        b_cur = _hist_bin_sql(val_expr, HIST_LO, HIST_HI, DRIFT_BINS)
        p = "(rc + 0.5) / (rn + 0.5 * nb)"
        q = "(cc + 0.5) / (cn + 0.5 * nb)"
        term = (
            f"cast(round(cast((({p}) - ({q})) * ln(({p}) / ({q}))"
            f" as decimal(28,12)), 9) as decimal(28,9))"
        )
        return f"""
  SELECT '{variant}' AS variant, event_type,
         CAST(round(sum({term}), 9) AS DOUBLE) AS psi,
         CAST(round(sum({term}), 9) AS DOUBLE) > {DRIFT_THRESHOLD}
           AS drifted
  FROM (
    SELECT coalesce(r.event_type, c.event_type) AS event_type,
           coalesce(r.cnt, 0) AS rc, coalesce(c.cnt, 0) AS cc,
           sum(coalesce(r.cnt, 0)) OVER (
             PARTITION BY coalesce(r.event_type, c.event_type)) AS rn,
           sum(coalesce(c.cnt, 0)) OVER (
             PARTITION BY coalesce(r.event_type, c.event_type)) AS cn,
           count(*) OVER (
             PARTITION BY coalesce(r.event_type, c.event_type)) AS nb
    FROM (SELECT event_type, {b_ref} AS bin, count(*) AS cnt
          FROM ev WHERE event_id % 2 = 0 GROUP BY 1, 2) r
    FULL OUTER JOIN
         (SELECT event_type, {b_cur} AS bin, count(*) AS cnt
          FROM ev WHERE event_id % 2 = 1 GROUP BY 1, 2) c
      ON r.event_type = c.event_type AND r.bin = c.bin
  ) GROUP BY event_type"""

    return f"""
WITH ev AS (
  SELECT event_type, event_id, value FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
)
{leg("split", "value")}
UNION ALL
{leg("scaled", f"value * {DRIFT_SCALE!r}")}
"""


HIST_DRIFT_SQL = _hist_drift_sql()


def cms_suite_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS-family consolidation (the trade vehicle for
    ``cms_heavy_hitters_events`` + ``cms_salted_rollup_events``): ONE
    cached events projection feeds both sketches (widths differ by
    design — 128 shows the one-sided error, 1024 gates routing — so
    the SCAN is the shared pass, not the grid), the heavy-hitter leg's
    exact candidate counts, and the salted rollup.  Padded union
    ``(variant, user_id, n, cms_est, exact_cnt, est_err, x, flag)``:

    * 'hh' rows — the heavy-hitter spec verbatim (n = hh_rank,
      x = NULL, flag = est_ge_exact);
    * 'rollup' rows — the salted rollup verbatim (n = n_events,
      cms_est/exact_cnt/est_err = NULL, x = sum_value,
      flag = took_salted_path).

    Parts-equivalence is pinned in tests; at 100 TB the consolidation
    halves the fact-table scans for the sketch-maintenance job."""
    from ..operators import sketches

    ev = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .where(F.col("user_id").isNotNull())
        .select("user_id", "value")
        .cache()  # one scan, four consumers
    )
    nb = F.lit(None).cast("bigint")
    nd = F.lit(None).cast("double")

    cms_hh = sketches.cms_build(ev, "user_id", width=CMS_WIDTH, depth=CMS_DEPTH)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = sketches.cms_estimate(
        cms_hh, exact, "user_id", width=CMS_WIDTH, depth=CMS_DEPTH
    )
    from pyspark.sql import Window

    topk = est.orderBy(F.desc("cms_est"), F.asc("user_id")).limit(CMS_TOP_K)
    w = Window.orderBy(F.desc("cms_est"), F.asc("user_id"))
    hh = topk.withColumn("hh_rank", F.row_number().over(w)).select(
        F.lit("hh").alias("variant"),
        "user_id",
        F.col("hh_rank").cast("bigint").alias("n"),
        F.col("cms_est").cast("long").alias("cms_est"),
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("est_err"),
        nd.alias("x"),
        (F.col("cms_est") >= F.col("exact_cnt")).alias("flag"),
    )

    cms_salt = sketches.cms_build(
        ev, "user_id", width=CMS_SALT_WIDTH, depth=CMS_DEPTH
    )
    roll = sketches.cms_salted_aggregate(
        ev,
        "user_id",
        cms_salt,
        CMS_SALT_THRESHOLD,
        sums={"__sv": "cast(value as decimal(28,8))"},
        count_alias="n_events",
        salt_buckets=CMS_SALT_BUCKETS,
        width=CMS_SALT_WIDTH,
        depth=CMS_DEPTH,
    ).select(
        F.lit("rollup").alias("variant"),
        "user_id",
        F.col("n_events").cast("bigint").alias("n"),
        nb.alias("cms_est"),
        nb.alias("exact_cnt"),
        nb.alias("est_err"),
        F.round(F.col("__sv"), 2).cast("double").alias("x"),
        F.col("took_salted_path").alias("flag"),
    )
    return hh.unionByName(roll)


def _cms_suite_sql() -> str:
    """The parts' oracle texts verbatim, wrapped and padded — both
    parts keep their own oracles; the suite oracle pins the union."""
    return f"""
WITH hh_part AS ({CMS_HEAVY_HITTERS_SQL}),
roll_part AS ({CMS_SALTED_ROLLUP_SQL})
SELECT 'hh' AS variant, user_id, CAST(hh_rank AS BIGINT) AS n,
       cms_est, exact_cnt, est_err, CAST(NULL AS DOUBLE) AS x,
       est_ge_exact AS flag
FROM hh_part
UNION ALL
SELECT 'rollup', user_id, n_events, NULL, NULL, NULL, sum_value,
       took_salted_path
FROM roll_part
"""


CMS_SUITE_SQL = _cms_suite_sql()

GROUP_CMS_TOP_K = 5


def group_cms_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group heavy hitters: one independent CMS per event_type
    (``cms_build(by=...)``), top-{GROUP_CMS_TOP_K} users by estimate
    within each type next to exact counts and the one-sided-law flag.
    The per-tenant form of hot-key detection — per-group sketch state
    stays depth×width regardless of the group's traffic.

    The rank window partitions on the group over the CANDIDATE set
    (the exact-count verification twin at test scale; at 100 TB
    candidates come from the current batch's keys, bounded per the
    ``cms_heavy_hitters_events`` framing)."""
    from pyspark.sql import Window

    from ..operators import sketches

    ev = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .where(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select("event_type", "user_id")
        .cache()  # two consumers: sketch build + exact candidates
    )
    cms = sketches.cms_build(
        ev, "user_id", width=CMS_WIDTH, depth=CMS_DEPTH, by=("event_type",)
    )
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    est = sketches.cms_estimate(
        cms,
        exact,
        "user_id",
        width=CMS_WIDTH,
        depth=CMS_DEPTH,
        by=("event_type",),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("cms_est"), F.asc("user_id")
    )
    return (
        est.withColumn("grp_rank", F.row_number().over(w))
        .where(F.col("grp_rank") <= GROUP_CMS_TOP_K)
        .select(
            "event_type",
            "grp_rank",
            "user_id",
            F.col("cms_est").cast("long").alias("cms_est"),
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("est_ge_exact"),
        )
    )


def _group_cms_topk_sql() -> str:
    from ..operators.sketches import CMS_HASHES, _bucket_sql

    hash_rows = ", ".join(
        f"({d}, {a}, {b})" for d, (a, b) in enumerate(CMS_HASHES[:CMS_DEPTH])
    )
    bucket = _bucket_sql("e.user_id", 1, 0, CMS_WIDTH).replace(
        " * 1 + 0", " * h.a + h.b"
    )
    return f"""
WITH h AS (SELECT * FROM (VALUES {hash_rows}) t(d, a, b)),
ev AS (SELECT event_type, user_id FROM events
       WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
cells AS (
  SELECT e.event_type, h.d, {bucket} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM ev e CROSS JOIN h
  GROUP BY 1, 2, 3
),
exact AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM ev GROUP BY 1, 2
),
probes AS (
  SELECT e.event_type, e.user_id, e.exact_cnt, h.d, {bucket} AS bucket
  FROM exact e CROSS JOIN h
),
est AS (
  SELECT p.event_type, p.user_id, p.exact_cnt,
         CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
  FROM probes p LEFT JOIN cells c
    ON p.event_type = c.event_type AND p.d = c.d AND p.bucket = c.bucket
  GROUP BY 1, 2, 3
)
SELECT event_type, grp_rank, user_id, cms_est, exact_cnt,
       cms_est >= exact_cnt AS est_ge_exact
FROM (
  SELECT *, CAST(row_number() OVER (
            PARTITION BY event_type
            ORDER BY cms_est DESC, user_id ASC) AS INT) AS grp_rank
  FROM est
) WHERE grp_rank <= {GROUP_CMS_TOP_K}
"""


GROUP_CMS_TOPK_SQL = _group_cms_topk_sql()

TOKEN_CMS_TOP_K = 10


def cms_token_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING-keyed heavy hitters — the corpus hot-key case the
    integer hash family alone can't serve (tokens, hosts, URLs):
    every token derives a portable 60-bit integer key
    (``sketches.string_key_int`` — md5-prefix, value-equal across
    engines despite dialect differences in hex→int), then the
    standard CMS pipeline runs unchanged.  Top-{k} tokens by estimate
    next to exact counts — the vocab-pruning / stopword-discovery
    pass over a 100 TB corpus with depth×width counters of state."""
    from pyspark.sql import Window

    from ..operators import sketches
    from ..operators import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        F.explode(text_ops.tokens_col("text")).alias("term")
    ).withColumn("__k", sketches.string_key_int("term")).cache()
    # one cached explode: sketch build + exact candidate twin
    cms = sketches.cms_build(toks, "__k", width=CMS_WIDTH, depth=CMS_DEPTH)
    exact = toks.groupBy("term", "__k").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    est = sketches.cms_estimate(
        cms, exact, "__k", width=CMS_WIDTH, depth=CMS_DEPTH
    )
    topk = est.orderBy(
        F.desc("cms_est"), F.asc("term")
    ).limit(TOKEN_CMS_TOP_K)
    w = Window.orderBy(F.desc("cms_est"), F.asc("term"))
    return topk.withColumn("hh_rank", F.row_number().over(w)).select(
        "hh_rank",
        "term",
        F.col("cms_est").cast("long").alias("cms_est"),
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        (F.col("cms_est") >= F.col("exact_cnt")).alias("est_ge_exact"),
    )


def _cms_token_topk_sql() -> str:
    from ..operators.sketches import (
        CMS_HASHES,
        _bucket_sql,
        sql_string_key_int,
    )

    hash_rows = ", ".join(
        f"({d}, {a}, {b})" for d, (a, b) in enumerate(CMS_HASHES[:CMS_DEPTH])
    )
    bucket = _bucket_sql("e.k", 1, 0, CMS_WIDTH).replace(
        " * 1 + 0", " * h.a + h.b"
    )
    return f"""
WITH h AS (SELECT * FROM (VALUES {hash_rows}) t(d, a, b)),
toks AS (
  SELECT term, {sql_string_key_int("term")} AS k FROM (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
),
cells AS (
  SELECT h.d, {bucket} AS bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM toks e CROSS JOIN h GROUP BY 1, 2
),
exact AS (
  SELECT term, k, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM toks GROUP BY 1, 2
),
probes AS (
  SELECT e.term, e.exact_cnt, h.d, {bucket} AS bucket
  FROM exact e CROSS JOIN h
),
est AS (
  SELECT term, exact_cnt, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
  FROM probes p LEFT JOIN cells c USING (d, bucket)
  GROUP BY 1, 2
)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY cms_est DESC, term ASC) AS INT)
           AS hh_rank,
         term, cms_est, exact_cnt, cms_est >= exact_cnt AS est_ge_exact
  FROM est
) WHERE hh_rank <= {TOKEN_CMS_TOP_K}
"""


CMS_TOKEN_TOPK_SQL = _cms_token_topk_sql()


# --- Set operations ---------------------------------------------------------


def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over customer key sets by order status."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    p_cust = o.filter(F.col("o_orderstatus") == "P").select("o_custkey").distinct()
    both = (
        f_cust.intersect(p_cust)
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("bucket", F.lit("both_f_and_p"))
    )
    only_f = (
        f_cust.exceptAll(p_cust)
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("bucket", F.lit("only_f"))
    )
    return both.unionByName(only_f).select("bucket", "n_customers")


SET_OPS_CUSTOMERS_SQL = """
WITH f_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     p_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P')
SELECT 'both_f_and_p' AS bucket, count(*) AS n_customers
FROM (SELECT o_custkey FROM f_cust INTERSECT SELECT o_custkey FROM p_cust)
UNION ALL
SELECT 'only_f' AS bucket, count(*) AS n_customers
FROM (SELECT o_custkey FROM f_cust EXCEPT SELECT o_custkey FROM p_cust)
"""

SET_SEMI_ANTI_OPS_SQL = """
SELECT bucket, n_orders AS n_rows FROM (
SELECT 'with_items' AS bucket, count(*) AS n_orders FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
UNION ALL
SELECT 'without_items' AS bucket, count(*) AS n_orders FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
)
UNION ALL
SELECT bucket, n_customers AS n_rows FROM (
WITH f_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     p_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P')
SELECT 'both_f_and_p' AS bucket, count(*) AS n_customers
FROM (SELECT o_custkey FROM f_cust INTERSECT SELECT o_custkey FROM p_cust)
UNION ALL
SELECT 'only_f' AS bucket, count(*) AS n_customers
FROM (SELECT o_custkey FROM f_cust EXCEPT SELECT o_custkey FROM p_cust)
)
"""


# --- Q7/Q8-style multi-join breadth (round 2) -------------------------------

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"


def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — lineitem joins BOTH a supplier-side and a customer-side
    nation dimension (the same dim table in two roles).  All dims
    broadcast; the only real shuffle is lineitem⨝orders and the final
    3-key aggregate."""
    t = load_tables(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    n_s = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_c = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A)
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr(sql_exact_sum("l_extendedprice * (1 - l_discount)", 2)).alias(
                "revenue"
            ),
        )
    )


Q7_NATION_PAIR_SQL = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(l.l_shipdate)::INT AS l_year,
       count(*) AS n_items,
       {sql_exact_sum("l.l_extendedprice * (1 - l.l_discount)", 2)} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE (ns.n_name = '{Q7_NATION_A}' AND nc.n_name = '{Q7_NATION_B}')
   OR (ns.n_name = '{Q7_NATION_B}' AND nc.n_name = '{Q7_NATION_A}')
GROUP BY 1, 2, 3
"""

Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"
Q8_PTYPE = "PROMO"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part
    revenue per order year.  The share divides two decimal-exact sums
    (identical doubles in both engines), then rounds — so the ratio
    cannot drift cross-engine.  Six-table join; every dimension side
    broadcasts, lineitem⨝orders is the lone big shuffle."""
    from ..functions import sql_exact_round

    t = load_tables(
        spark,
        sf_dir,
        ("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
    )
    n_s = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_c = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    base = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == Q8_PTYPE)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(t["region"]), F.col("cr_key") == F.col("r_regionkey"))
        .filter(F.col("r_name") == Q8_REGION)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    agg = base.groupBy("o_year").agg(
        F.expr(
            sql_exact_sum(
                f"CASE WHEN supp_nation = '{Q8_NATION}' THEN volume ELSE 0.0 END", 2
            )
        ).alias("nation_volume"),
        F.expr(sql_exact_sum("volume", 2)).alias("total_volume"),
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.expr(sql_exact_round("nation_volume / total_volume", 6)).alias("mkt_share"),
    )


def _q8_sql() -> str:
    from ..functions import sql_exact_round

    num = sql_exact_sum(
        f"CASE WHEN ns.n_name = '{Q8_NATION}'"
        " THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END",
        2,
    )
    den = sql_exact_sum("l.l_extendedprice * (1 - l.l_discount)", 2)
    return f"""
WITH agg AS (
  SELECT year(o.o_orderdate)::INT AS o_year,
         {num} AS nation_volume,
         {den} AS total_volume
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{Q8_PTYPE}'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{Q8_REGION}'
  GROUP BY 1
)
SELECT o_year, nation_volume, total_volume,
       {sql_exact_round("nation_volume / total_volume", 6)} AS mkt_share
FROM agg
"""


Q8_MARKET_SHARE_SQL = _q8_sql()


def tpch_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-variants consolidation of the three classic TPC-H join
    rollups (r06 — the registry-window remedy plans/queries.py's
    "WINDOW OVERFLOW" note commits to): Q5's region→nation revenue
    chain, Q7's bilateral nation-pair trade, and Q8's market-share
    ratio union into ONE spec so three 50-slot window seats become
    one, with every original output cell preserved:

    * keys normalize to (k1, k2, k3) strings (NULL-padded),
    * Q5/Q7 carry (n_items, value=revenue),
    * Q8 carries (value=nation_volume, value2=total_volume,
      value3=mkt_share) with n_items NULL.

    The three underlying builders stay importable/unit-usable; only
    the registry surface merges (same pattern as
    ``dedup_variants_lineitem`` / ``window_time_orders``).  Plan
    shape is unchanged per variant — Catalyst executes the three
    branches independently under one union, dims still broadcast,
    lineitem⨝orders stays the lone big exchange in each."""
    nulls = F.lit(None).cast("string")
    nulld = F.lit(None).cast("double")
    q5 = q5_nation_volume(spark, sf_dir).select(
        F.lit("q5_nation_volume").alias("variant"),
        F.col("region_name").alias("k1"),
        F.col("nation_name").alias("k2"),
        nulls.alias("k3"),
        F.col("n_items").cast("long").alias("n_items"),
        F.col("revenue").alias("value"),
        nulld.alias("value2"),
        nulld.alias("value3"),
    )
    q7 = q7_nation_pair_volume(spark, sf_dir).select(
        F.lit("q7_nation_pair_volume").alias("variant"),
        F.col("supp_nation").alias("k1"),
        F.col("cust_nation").alias("k2"),
        F.col("l_year").cast("string").alias("k3"),
        F.col("n_items").cast("long").alias("n_items"),
        F.col("revenue").alias("value"),
        nulld.alias("value2"),
        nulld.alias("value3"),
    )
    q8 = q8_market_share(spark, sf_dir).select(
        F.lit("q8_market_share").alias("variant"),
        F.col("o_year").cast("string").alias("k1"),
        nulls.alias("k2"),
        nulls.alias("k3"),
        F.lit(None).cast("long").alias("n_items"),
        F.col("nation_volume").alias("value"),
        F.col("total_volume").alias("value2"),
        F.col("mkt_share").alias("value3"),
    )
    return q5.unionByName(q7).unionByName(q8)


TPCH_JOIN_SUITE_SQL = f"""
WITH q5 AS ({Q5_NATION_VOLUME_SQL}),
q7 AS ({Q7_NATION_PAIR_SQL}),
q8 AS ({Q8_MARKET_SHARE_SQL})
SELECT 'q5_nation_volume' AS variant, region_name AS k1, nation_name AS k2,
       CAST(NULL AS VARCHAR) AS k3, n_items, revenue AS value,
       CAST(NULL AS DOUBLE) AS value2, CAST(NULL AS DOUBLE) AS value3
FROM q5
UNION ALL
SELECT 'q7_nation_pair_volume', supp_nation, cust_nation, l_year::VARCHAR,
       n_items, revenue, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM q7
UNION ALL
SELECT 'q8_market_share', o_year::VARCHAR, CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), nation_volume,
       total_volume, mkt_share
FROM q8
"""


# --- Per-group exact quantiles (A8 per-group; round 2) ----------------------

GQ_QUANTILES = (0.5, 0.9)


def group_quantiles_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles (median, p90 of value per event_type)
    with the interpolation WRITTEN OUT — lo + frac·(hi−lo) over the two
    straddling ranked rows — so both engines run the same arithmetic
    (engine-internal percentile implementations interpolate in
    different ulp order; the explicit form cannot drift).

    Scale shape — range-bucketed exact rank (r11, the
    ``calibrate_quality_by_domain`` pattern): a window partitioned on
    event_type alone caps parallelism at the handful of types and
    sorts each type's whole run in ONE task — the last registered
    low-cardinality-window site the r11 audit left standing.  Now:
    one per-type aggregate computes 31 approximate value boundaries
    (balance only — correctness never depends on them) AND the exact
    per-type count; each row's bucket = #boundaries strictly below
    its value (tied values share a bucket, so bucketing respects the
    value order and the straddling-row picks stay deterministic);
    per-(type, bucket) counts fold to offsets; exact rank = offset +
    row_number within the (type, bucket) window.  Identical rn/n
    arithmetic ⇒ identical quantiles, parallelism types × 32."""
    from pyspark.sql import Window

    from ..functions import sql_exact_round

    ev = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    n_buckets = 32
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    # .cache(): the approx boundaries feed BOTH the offsets subtree
    # and the ranked join — approx_percentile can vary with partial-
    # merge order, so correctness needs ONE evaluation, not exchange
    # reuse (AQE replanning / config can defeat reuse).  Null-safe
    # join keeps a null event_type as its own group, like the old
    # window's null partition.
    bnd = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", fracs, 10_000).alias("__bnds"),
            F.count(F.lit(1)).alias("n"),
        )
        .cache()
    )
    b = (
        ev.join(
            F.broadcast(bnd.withColumnRenamed("event_type", "__et")),
            F.col("event_type").eqNullSafe(F.col("__et")),
        )
        .drop("__et")
        .withColumn(
            "__bkt", F.size(F.filter("__bnds", lambda x: x < F.col("value")))
        )
    )
    counts = b.groupBy("event_type", "__bkt").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "event_type",
        "__bkt",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
    )
    w = Window.partitionBy("event_type", "__bkt").orderBy(
        "value", "event_type"
    )
    off2 = offsets.withColumnsRenamed({"event_type": "__et", "__bkt": "__b2"})
    ranked = (
        b.join(
            F.broadcast(off2),
            F.col("event_type").eqNullSafe(F.col("__et"))
            & (F.col("__bkt") == F.col("__b2")),
        )
        .withColumn("rn", F.col("__off") + F.row_number().over(w))
        .select("event_type", "value", "rn", "n")
    )
    aggs = [F.expr(e) for e in _gq_agg_exprs()]
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_values"), *aggs
    )


def _gq_agg_exprs() -> list[str]:
    """Shared aggregate expressions for both engines: the straddling
    rows are picked INSIDE max(CASE …) (non-grouped columns are legal
    inside aggregates), while the interpolation fraction re-derives the
    rank arithmetic from max(n) — the per-group constant — so nothing
    non-aggregated leaks into the outer projection."""
    from ..functions import sql_exact_round

    exprs = []
    for q in GQ_QUANTILES:
        tag = str(int(q * 100))
        h_in = f"(n - 1) * {q}"  # inside aggregates: per-row n is legal
        lo_rn = f"floor({h_in}) + 1"
        lo = f"max(CASE WHEN rn = {lo_rn} THEN value END)"
        hi = (
            f"max(CASE WHEN rn = least(cast({lo_rn} as bigint) + 1, n)"
            " THEN value END)"
        )
        h_out = f"(max(n) - 1) * {q}"  # outside: aggregate the constant
        frac = f"({h_out}) - floor({h_out})"
        exprs.append(
            f"{sql_exact_round(f'{lo} + ({frac}) * ({hi} - {lo})', 6)} AS p{tag}"
        )
    return exprs


def _group_quantiles_sql() -> str:
    cols_sql = ",\n       ".join(_gq_agg_exprs())
    return f"""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_type) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, max(n) AS n_values,
       {cols_sql}
FROM ranked GROUP BY event_type
"""


GROUP_QUANTILES_SQL = _group_quantiles_sql()

# --- UNPIVOT / melt (§2.6 reshaping twin of pivot) --------------------------

UNPIVOT_METRICS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (the inverse of pivot_orders): lineitem's
    four measures melt to (metric, val) rows via the native unpivot
    (expression-only, no shuffle), then a per-metric profile aggregate.
    The long form is what per-metric profiling/charting pipelines
    consume; the aggregate keeps the oracle result small."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    long = li.unpivot(
        ["l_orderkey"], list(UNPIVOT_METRICS), "metric", "val"
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(sql_exact_sum("val", 2)).alias("total"),
        )
    )


UNPIVOT_LINEITEM_SQL = f"""
WITH long AS (
  {" UNION ALL ".join(
      f"SELECT '{m}' AS metric, {m} AS val FROM lineitem"
      for m in UNPIVOT_METRICS
  )}
)
SELECT metric, count(*) AS n, {sql_exact_sum("val", 2)} AS total
FROM long GROUP BY metric
"""


# --- E-commerce analytics trio: cohort / funnel / RFM (round 2) -------------


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort retention: customers grouped by first-order
    month, counted as active in each later month.  Month distance uses
    pure integer arithmetic (year*12+month), so both engines agree on
    every boundary.  Shuffle shape: one custkey aggregate (first
    order), a co-partitioned custkey join back onto orders, and the
    final (cohort, offset) count-distinct — all keys the fact table
    already hashes well on."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    first = o.groupBy("o_custkey").agg(F.min(ym).alias("cohort_ym"))
    return (
        o.select("o_custkey", ym.alias("order_ym"))
        .join(first, "o_custkey")
        .groupBy(
            F.col("cohort_ym").cast("long").alias("cohort_ym"),
            (F.col("order_ym") - F.col("cohort_ym")).cast("long").alias(
                "months_since"
            ),
        )
        .agg(F.countDistinct("o_custkey").alias("n_active"))
    )


COHORT_RETENTION_SQL = """
WITH o AS (
  SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) AS order_ym
  FROM orders
),
first AS (SELECT o_custkey, min(order_ym) AS cohort_ym FROM o GROUP BY 1)
SELECT CAST(cohort_ym AS BIGINT) AS cohort_ym,
       CAST(order_ym - cohort_ym AS BIGINT) AS months_since,
       count(DISTINCT o.o_custkey) AS n_active
FROM o JOIN first USING (o_custkey)
GROUP BY 1, 2
"""


def _ntile_exact_boundaries(
    df, n: int, specs: list[tuple[str, bool]], tiebreak: str, k: int = 4
):
    """Exact ntile(k) bucket boundaries with NO global sort — the
    distributed replacement for an un-partitioned ``ntile`` window
    (r02's one perf-weak plan: every row through one task).

    ntile(k) over a TOTAL order (metric asc/desc, tiebreak asc) puts
    the first ``n % k`` buckets at ``n//k + 1`` rows, the rest at
    ``n//k``; a row's bucket is therefore ``1 + #{j : row is strictly
    after the row at boundary rank c_j}`` for the k-1 cumulative
    boundary ranks ``c_j = j*(n//k) + min(n%k, j)``.  So exact ntile
    reduces to k-1 exact ORDER STATISTICS of the composite
    (metric, tiebreak) key, found by the quantiles_lineitem bracket
    trick (approx sketch → conditional base counts → tiny histogram
    collect → driver-side rank walk), then one per-row literal
    comparison — pure JVM expressions, zero windows, zero shuffles
    beyond the aggregates.

    Descending metrics are handled by selecting the ascending order
    statistic at rank ``n - c + 1`` (a multiset identity independent
    of tiebreaks) and flipping the comparison direction; the tiebreak
    stays ascending in both cases, matching ``ORDER BY m DESC, tb``.

    Returns {col: [(value, tiebreak_value_or_None, descending)]} —
    ``None`` tiebreak means the boundary is the LAST row of its metric
    tie group, so the bucket test needs no tiebreak compare at all
    (always the case for continuous metrics).

    Cost: 3 fused jobs over ``df`` (+3 only when a boundary splits a
    tie group); every job is a scan-shaped aggregate.  df should be
    cached by the caller — it is scanned by each job.
    """
    if n == 0:
        # No rows → no boundaries; _ntile_score_col degenerates to a
        # constant bucket 1 over an empty frame (ADVICE r03: the t / n
        # bracket math below would otherwise divide by zero).
        return {c: [] for c, _ in specs}
    q, r = divmod(n, k)
    ranks = [j * q + min(r, j) for j in range(1, k)]
    eps = 1e-4
    delta = 4 * eps + 2.0 / max(n, 1)
    accuracy = int(round(1.0 / eps))

    # --- job 1: fused sketch — brackets around every target rank ----------
    targets: dict[str, list[int]] = {}
    probs: dict[str, list[tuple[float, float]]] = {}
    for col, desc in specs:
        ts = [(n - c + 1) if desc else c for c in ranks]
        targets[col] = ts
        probs[col] = [
            (max(0.0, t / n - delta), min(1.0, t / n + delta)) for t in ts
        ]
    flat = {c: sorted({p for pair in probs[c] for p in pair}) for c, _ in specs}
    sk_row = df.agg(
        *[
            F.expr(
                f"percentile_approx({c}, array("
                + ",".join(f"{p!r}D" for p in flat[c])
                + f"), {accuracy})"
            ).alias(c)
            for c, _ in specs
        ]
    ).first()
    # percentile_approx RETURNS ACTUAL COLUMN VALUES (rank selection,
    # no interpolation), so decimal metrics stay exact end-to-end.
    vals = {c: dict(zip(flat[c], sk_row[c])) for c, _ in specs}
    brackets = {
        c: [(vals[c][plo], vals[c][phi]) for plo, phi in probs[c]]
        for c, _ in specs
    }

    # --- job 2: fused base ranks (rows strictly below each bracket) -------
    bases = df.agg(
        *[
            F.sum(F.when(F.col(c) < F.lit(vlo), 1).otherwise(0)).alias(f"b_{c}_{i}")
            for c, _ in specs
            for i, (vlo, _) in enumerate(brackets[c])
        ]
    ).first()

    # --- job 3: fused bracket histograms (distinct value → count) ---------
    hist_parts = []
    for c, _ in specs:
        cond = None
        for vlo, vhi in brackets[c]:
            m = (F.col(c) >= F.lit(vlo)) & (F.col(c) <= F.lit(vhi))
            cond = m if cond is None else (cond | m)
        hist_parts.append(
            df.filter(cond)
            .groupBy(F.lit(c).alias("col"), F.col(c).cast("string").alias("v"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    hist_df = hist_parts[0]
    for part in hist_parts[1:]:
        hist_df = hist_df.unionByName(part)
    raw_hist: dict[str, list] = {c: [] for c, _ in specs}
    for row in hist_df.collect():
        raw_hist[row["col"]].append((row["v"], int(row["cnt"])))
    # values came back as strings (union needs one type across long /
    # decimal metrics); re-key numerically for the rank walk
    from decimal import Decimal

    hists = {
        c: sorted((Decimal(v), cnt) for v, cnt in raw_hist[c]) for c, _ in specs
    }

    # --- driver-side exact rank walk per boundary -------------------------
    # pending[(col, i)] = (v, within_group_pos, group_size)
    found: dict[str, list] = {c: [] for c, _ in specs}
    pending: dict[tuple[str, int], tuple] = {}
    for c, desc in specs:
        for i, t in enumerate(targets[c]):
            vlo, vhi = (Decimal(str(b)) for b in brackets[c][i])
            cum = int(bases[f"b_{c}_{i}"])
            v_at = grp = base_asc = None
            for v, cnt in hists[c]:
                if v < vlo or v > vhi:
                    continue
                if cum + cnt >= t:
                    v_at, grp, base_asc = v, cnt, cum
                    break
                cum += cnt
            if v_at is None:
                raise RuntimeError(f"rank {t} not bracketed for {c}")
            # asc-order position within the tie group, then translate to
            # the QUERY order's position (desc reverses group traversal,
            # tiebreak asc is shared by both directions)
            p_asc = t - base_asc
            c_query = ranks[i]
            before_group = (n - base_asc - grp) if desc else base_asc
            p_query = c_query - before_group
            assert 1 <= p_query <= grp, (c, i, p_query, grp)
            if p_query == grp:
                found[c].append((v_at, None, desc))
            else:
                found[c].append(None)  # fill after tie-group selection
                pending[(c, i)] = (v_at, p_query, grp)

    # --- optional jobs 4-6: boundaries that split a tie group -------------
    if pending:
        sel = {}
        for (c, i), (v, p, m) in pending.items():
            d = 4 * eps + 2.0 / max(m, 1)
            sel[(c, i)] = (max(0.0, p / m - d), min(1.0, p / m + d))
        tb_sk = df.agg(
            *[
                F.expr(
                    f"percentile_approx(CASE WHEN {c} = CAST('{pending[(c, i)][0]}'"
                    f" AS {dict(df.dtypes)[c]}) THEN {tiebreak} END, "
                    f"array({sel[(c, i)][0]!r}D, {sel[(c, i)][1]!r}D), {accuracy})"
                ).alias(f"s_{c}_{i}")
                for (c, i) in pending
            ]
        ).first()
        tb_brackets = {key: tuple(tb_sk[f"s_{key[0]}_{key[1]}"]) for key in pending}
        tb_bases = df.agg(
            *[
                F.sum(
                    F.when(
                        (F.col(c) == F.lit(pending[(c, i)][0]))
                        & (F.col(tiebreak) < F.lit(tb_brackets[(c, i)][0])),
                        1,
                    ).otherwise(0)
                ).alias(f"tb_{c}_{i}")
                for (c, i) in pending
            ]
        ).first()
        tb_parts = []
        for (c, i) in pending:
            lo, hi = tb_brackets[(c, i)]
            tb_parts.append(
                df.filter(
                    (F.col(c) == F.lit(pending[(c, i)][0]))
                    & (F.col(tiebreak) >= F.lit(lo))
                    & (F.col(tiebreak) <= F.lit(hi))
                )
                .select(
                    F.lit(f"{c}_{i}").alias("key"),
                    F.col(tiebreak).alias("tb"),
                )
            )
        tb_df = tb_parts[0]
        for part in tb_parts[1:]:
            tb_df = tb_df.unionByName(part)
        tb_vals: dict[str, list] = {f"{c}_{i}": [] for (c, i) in pending}
        for row in tb_df.collect():
            tb_vals[row["key"]].append(row["tb"])
        for (c, i) in pending:
            v, p, m = pending[(c, i)]
            got = sorted(tb_vals[f"{c}_{i}"])
            idx = p - int(tb_bases[f"tb_{c}_{i}"]) - 1  # tiebreak is unique
            assert 0 <= idx < len(got), (c, i, idx, len(got))
            desc = dict(specs)[c]
            found[c][i] = (v, got[idx], desc)
    return found


def _ntile_score_col(col: str, tiebreak: str, boundaries: list, dtype: str):
    """1 + Σ_j [row strictly after boundary j in the query order] —
    the per-row literal-comparison form of ntile(4)."""
    score = F.lit(1)
    for v, tb, desc in boundaries:
        lit_v = F.expr(f"CAST('{v}' AS {dtype})")
        after = F.col(col) < lit_v if desc else F.col(col) > lit_v
        if tb is not None:
            after = after | ((F.col(col) == lit_v) & (F.col(tiebreak) > F.lit(tb)))
        score = score + after.cast("int")
    return score.cast("long")


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order,
    against the global max date), frequency (order count), monetary
    (decimal-exact spend), each scored into exact ntile(4) quartiles
    with a custkey tiebreak so the split is deterministic.

    r02's form ran three un-partitioned ``ntile`` windows — a
    single-task global sort of every customer row (the round's one
    perf-weak plan).  Now the boundaries come from
    ``_ntile_exact_boundaries`` (approx-bracketed exact selection, the
    quantiles_lineitem machinery) and each score is a per-row literal
    comparison: identical output (oracle unchanged, still plain
    ``ntile`` SQL), no window, no single-partition exchange, scan-
    shaped jobs only — the plan survives a 1000× customer count."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    maxd = o.agg(F.max("o_orderdate").alias("max_d"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.expr(sql_exact_sum("o_totalprice", 2)).alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff("max_d", "last_d").cast("long").alias("recency_days"),
            "frequency",
            "monetary",
        )
    ).persist()
    try:
        n = per_cust.count()
        specs = [("recency_days", False), ("frequency", True), ("monetary", True)]
        bounds = _ntile_exact_boundaries(per_cust, n, specs, tiebreak="o_custkey")
        dtypes = dict(per_cust.dtypes)
        return per_cust.select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary",
            _ntile_score_col(
                "recency_days", "o_custkey", bounds["recency_days"],
                dtypes["recency_days"],
            ).alias("r_score"),
            _ntile_score_col(
                "frequency", "o_custkey", bounds["frequency"], dtypes["frequency"]
            ).alias("f_score"),
            _ntile_score_col(
                "monetary", "o_custkey", bounds["monetary"], dtypes["monetary"]
            ).alias("m_score"),
        )
    finally:
        # The cache exists for the 3-6 eager boundary jobs, which have
        # all run by now; releasing it here means the returned (lazy)
        # plan re-aggregates once when materialized instead of pinning
        # executor memory for the session (ADVICE r03).
        per_cust.unpersist()


RFM_SEGMENTS_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_d,
         count(*) AS frequency,
         {sql_exact_sum("o_totalprice", 2)} AS monetary
  FROM orders GROUP BY o_custkey
),
maxd AS (SELECT max(o_orderdate) AS max_d FROM orders)
SELECT o_custkey,
       CAST(date_diff('day', last_d, max_d) AS BIGINT) AS recency_days,
       frequency,
       monetary,
       CAST(ntile(4) OVER (ORDER BY date_diff('day', last_d, max_d),
                           o_custkey) AS BIGINT) AS r_score,
       CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT)
         AS f_score,
       CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT)
         AS m_score
FROM per_cust CROSS JOIN maxd
"""


# --- Hourly gap-fill (hypertable resample) + z-score outliers (round 2) -----


def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup: the (event_type × hour) grid is
    generated densely from the global min/max hour (broadcast 1-row
    bounds × tiny type dim — never a driver round-trip), left-joined
    onto the real rollup; missing hours get n_events=0 and carry the
    last known hourly sum forward (the hypertable/timescale
    `time_bucket_gapfill` + `locf` semantic).

    Scale shape: the grid is O(types × hours) — thousands of rows per
    year regardless of event volume — so the dense join is against a
    bounded dimension, and the carry-forward window partitions on
    event_type."""
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hour = F.date_trunc("hour", F.col("ts"))
    rollup = ev.groupBy(
        F.col("event_type"), hour.alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(sql_exact_sum("value", 2)).alias("sum_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(rollup, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("locf_sum_value"),
        )
    )


EVENTS_GAPFILL_SQL = f"""
WITH rollup AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         count(*) AS n_events,
         {sql_exact_sum("value", 2)} AS sum_value
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
              FROM bounds) g
)
SELECT grid.event_type, grid.h,
       CAST(coalesce(rollup.n_events, 0) AS BIGINT) AS n_events,
       last_value(rollup.sum_value IGNORE NULLS) OVER (
         PARTITION BY grid.event_type ORDER BY grid.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_sum_value
FROM grid LEFT JOIN rollup USING (event_type, h)
"""


def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group anomaly detection: mean/stddev derived EXPLICITLY from
    decimal-exact sum and sum-of-squares (engine stddev internals
    differ in ulp order; the explicit two-sum form is bitwise-portable),
    broadcast back onto the rows, |z| > 3 counted per group.  Two scans
    (one agg + one rejoin-count) — both shuffles on the 5-key group
    column."""
    ev = load_tables(spark, sf_dir, ("events",))["events"].filter(
        F.col("value").isNotNull()
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("cast(sum(cast(value as decimal(28,8))) as double)").alias("s1"),
        F.expr(
            "cast(sum(cast(value * value as decimal(28,8))) as double)"
        ).alias("s2"),
    )
    stats = stats.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    flagged = (
        ev.select("event_type", "value")
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "n",
            "mean",
            "std",
            (
                F.abs((F.col("value") - F.col("mean")) / F.col("std")) > 3.0
            ).alias("is_outlier"),
        )
    )
    from ..functions import sql_exact_round

    return flagged.groupBy("event_type").agg(
        F.max("n").alias("n_values"),
        F.expr(sql_exact_round("max(mean)", 6)).alias("mean_value"),
        F.expr(sql_exact_round("max(std)", 6)).alias("std_value"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
    )


def _zscore_sql() -> str:
    from ..functions import sql_exact_round

    return f"""
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
stats0 AS (
  SELECT event_type, count(*) AS n,
         cast(sum(cast(value as decimal(28,8))) as double) AS s1,
         cast(sum(cast(value * value as decimal(28,8))) as double) AS s2
  FROM ev GROUP BY 1
),
stats AS (
  SELECT event_type, n, s1 / n AS mean,
         sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std
  FROM stats0
)
SELECT ev.event_type,
       max(stats.n) AS n_values,
       {sql_exact_round("max(stats.mean)", 6)} AS mean_value,
       {sql_exact_round("max(stats.std)", 6)} AS std_value,
       CAST(sum(CASE WHEN abs((ev.value - stats.mean) / stats.std) > 3.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM ev JOIN stats USING (event_type)
GROUP BY ev.event_type
"""


EVENTS_ZSCORE_SQL = _zscore_sql()


# --- Market-basket pair mining ----------------------------------------------

BASKET_TOP_N = 25


def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: the top-N part pairs that
    ship together in the same order, with support counts.

    Pair expansion uses the LSH-bucket idiom (groupBy order →
    collect_set → in-array combination explode) instead of a
    self-join: a self-join on l_orderkey would execute the scan twice
    and shuffle the fact table twice, while this form is ONE shuffle
    on l_orderkey followed by a bounded in-row expansion — the fanout
    per order is C(items,2) with items ≤ 7 in TPC-H-shaped data, so
    the expansion never exceeds ~21× the order count regardless of
    corpus size.  The final top-N is a TakeOrderedAndProject (per-
    partition partial top-N, one tiny exchange), not a global sort."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("parts"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("parts"),
                            i + 2,
                            F.size(F.col("parts")),
                        ),
                        lambda b: F.struct(
                            a.alias("part_a"), b.alias("part_b")
                        ),
                    ),
                )
            )
        ).alias("pair")
    ).select("pair.part_a", "pair.part_b")
    counted = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).alias("support")
    )
    return (
        counted.orderBy(
            F.col("support").desc(), F.col("part_a").asc(), F.col("part_b").asc()
        )
        .limit(BASKET_TOP_N)
    )


BASKET_PAIRS_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, count(*) AS support
FROM pairs
GROUP BY part_a, part_b
ORDER BY support DESC, part_a, part_b
LIMIT {BASKET_TOP_N}
"""


# --- Time-range rolling window (RANGE frame, not ROWS) ----------------------


def customer_rolling_7d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 7-day rolling order spend: a RANGE window frame
    over event time — every order sees the decimal-exact sum of the
    customer's orders in the trailing week, ties included (RANGE, not
    ROWS: same-timestamp orders share one frame, so the result is
    set-determined, not input-order-determined).

    Spark's rangeBetween needs a numeric ordering column, so the frame
    runs over unix seconds; the oracle uses the identical epoch-second
    frame.  One shuffle on the partition key; frame evaluation is the
    standard per-partition sliding aggregate — no cross-partition
    state, scales with customers × orders-per-customer."""
    from pyspark.sql import Window

    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    secs = F.unix_timestamp("o_orderdate")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(secs)
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr(
            "cast(round(sum(cast(o_totalprice as decimal(28,8))) over ("
            "partition by o_custkey order by unix_timestamp(o_orderdate) "
            "range between 604800 preceding and current row"
            "), 2) as double)"
        ).alias("spend_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_7d"),
    )


CUSTOMER_ROLLING_7D_SQL = """
SELECT o_custkey,
       o_orderkey,
       o_orderdate,
       cast(round(sum(cast(o_totalprice as decimal(28,8))) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) as double)
         AS spend_7d,
       CAST(count(*) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_orders_7d
FROM orders
"""


# --- Quantile binning / discretizer (deciles, de-ntiled) --------------------


def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretizer: every order binned into its order-value
    DECILE (exact ntile(10) semantics, orderkey tiebreak), then
    per-decile count + decimal-exact spend — the feature-engineering
    binning step (equal-population buckets) plus the per-bucket
    profile.

    Second production use of ``_ntile_exact_boundaries`` (k=10): the
    9 boundary order statistics come from the same bracketed
    selection, rows are scored by literal compares, and the ONLY
    shuffle in the whole query is the final 10-group aggregate — the
    oracle runs a real ntile(10) window and must agree bucket-for-
    bucket, so the no-sort plan is equivalence-proven at a second k."""
    o = load_tables(spark, sf_dir, ("orders",)).get("orders").select(
        "o_orderkey", "o_totalprice"
    ).persist()
    try:
        n = o.count()
        bounds = _ntile_exact_boundaries(
            o, n, [("o_totalprice", False)], tiebreak="o_orderkey", k=10
        )
        dtypes = dict(o.dtypes)
        binned = o.select(
            "o_orderkey",
            "o_totalprice",
            _ntile_score_col(
                "o_totalprice", "o_orderkey", bounds["o_totalprice"],
                dtypes["o_totalprice"],
            ).alias("decile"),
        )
        return binned.groupBy("decile").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(sql_exact_sum("o_totalprice", 2)).alias("total_value"),
            F.min("o_totalprice").alias("min_value"),
            F.max("o_totalprice").alias("max_value"),
        )
    finally:
        # Boundary jobs are eager and done; don't pin the projection
        # for the session (ADVICE r03) — the final agg rescans parquet.
        o.unpersist()


ORDER_VALUE_DECILES_SQL = f"""
WITH binned AS (
  SELECT o_orderkey, o_totalprice,
         CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
           AS decile
  FROM orders
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_orders,
       {sql_exact_sum("o_totalprice", 2)} AS total_value,
       min(o_totalprice) AS min_value,
       max(o_totalprice) AS max_value
FROM binned
GROUP BY decile
"""

# --- Ordered-step funnel conversion (pre-built r13) -------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel over events (pre-built r13;
    ``operators/temporal.py:event_funnel``): users reaching
    view → click → purchase at strictly increasing timestamps,
    greedily matched — ONE user-keyed shuffle, the greedy match as a
    codegen fold over each user's sorted step events, stage counts in
    one conditional aggregate.  The oracle is the iterated
    min-after-previous-step relational construction (provably the
    same user sets)."""
    from ..operators.temporal import event_funnel

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return event_funnel(ev, FUNNEL_STEPS)


def _funnel_sql() -> str:
    from ..functions import sql_exact_round

    s1, s2, s3 = FUNNEL_STEPS
    r9 = sql_exact_round
    return f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{s1}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = '{s2}' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = '{s3}' GROUP BY e.user_id
),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
         (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
         (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n3
)
SELECT CAST(1 AS BIGINT) AS step, '{s1}' AS name, n1 AS n_users,
       CASE WHEN n1 > 0 THEN
         {r9("CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE)", 9)} END
         AS conv_from_first,
       CASE WHEN n1 > 0 THEN
         {r9("CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE)", 9)} END
         AS drop_from_prev
FROM c
UNION ALL
SELECT 2, '{s2}', n2,
       CASE WHEN n1 > 0 THEN
         {r9("CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE)", 9)} END,
       CASE WHEN n1 > 0 THEN
         {r9("CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE)", 9)} END
FROM c
UNION ALL
SELECT 3, '{s3}', n3,
       CASE WHEN n1 > 0 THEN
         {r9("CAST(n3 AS DOUBLE) / CAST(n1 AS DOUBLE)", 9)} END,
       CASE WHEN n2 > 0 THEN
         {r9("CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE)", 9)} END
FROM c
"""


FUNNEL_EVENTS_SQL = _funnel_sql()


def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over events (pre-built r13;
    ``operators/temporal.py:cohort_retention``): ISO-week cohorts by
    first activity, per-period active counts, rates against each
    cohort's own period-0 size.  One distinct-activity exchange +
    user-keyed aggregates + a broadcast cohort-size join."""
    from ..operators.temporal import cohort_retention

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return cohort_retention(ev)


COHORT_RETENTION_EVENTS_SQL = """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
),
first_wk AS (
  SELECT user_id, min(wk) AS cohort FROM act GROUP BY user_id
),
mat AS (
  SELECT f.cohort,
         CAST(datediff('day', f.cohort, a.wk) / 7 AS BIGINT) AS period,
         CAST(count(*) AS BIGINT) AS n_users
  FROM act a JOIN first_wk f USING (user_id)
  GROUP BY f.cohort, 2
),
sizes AS (
  SELECT cohort, n_users AS n0 FROM mat WHERE period = 0
)
SELECT m.cohort AS cohort_week, m.period, m.n_users,
       cast(round(cast((CAST(m.n_users AS DOUBLE) / CAST(s.n0 AS DOUBLE))
                       as decimal(28,12)), 9) as double) AS retention
FROM mat m JOIN sizes s USING (cohort)
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over events (pre-built
    r13; ``operators/temporal.py:event_transition_matrix``): counts
    and row-normalized probabilities of consecutive event-type pairs
    per user timeline — one user-keyed shuffle, pairs via a codegen
    zip of each sorted timeline against its own tail, ≤ |types|²
    output rows."""
    from ..operators.temporal import event_transition_matrix

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return event_transition_matrix(ev)


EVENT_TRANSITIONS_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, next_type AS to_type
  FROM ordered WHERE next_type IS NOT NULL
),
counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs GROUP BY from_type, to_type
),
totals AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM counts GROUP BY 1
)
SELECT c.from_type, c.to_type, c.n,
       cast(round(cast((CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
                       as decimal(28,12)), 9) as double) AS prob
FROM counts c JOIN totals t USING (from_type)
"""


def event_analytics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events-side consolidation vehicle (pre-built r13): funnel
    conversion + weekly cohort retention + the Markov transition
    matrix off ONE cached events scan — the three product-analytics
    readouts a session of dashboard questions actually asks, in one
    future registry slot.  Every leg's cells are bit-identical to its
    standalone spec (parts-equivalence pinned).  Pads: funnel →
    (k=step, s1=name, n, v1=conv, v2=drop); cohort → (d=cohort_week,
    k=period, n, v1=retention); transitions → (s1=from, s2=to, n,
    v1=prob)."""
    from ..operators.temporal import (
        cohort_retention,
        event_funnel,
        event_transition_matrix,
    )

    ev = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .select("event_id", "ts", "user_id", "event_type")
        .cache()
    )
    fun = event_funnel(ev, FUNNEL_STEPS)
    coh = cohort_retention(ev)
    tra = event_transition_matrix(ev)
    nl = F.lit(None).cast("long")
    ns = F.lit(None).cast("string")
    ndt = F.lit(None).cast("date")
    nd_ = F.lit(None).cast("double")
    f_leg = fun.select(
        F.lit("funnel").alias("variant"),
        F.col("step").alias("k"),
        F.col("name").alias("s1"),
        ns.alias("s2"),
        ndt.alias("d"),
        F.col("n_users").alias("n"),
        F.col("conv_from_first").alias("v1"),
        F.col("drop_from_prev").alias("v2"),
    )
    c_leg = coh.select(
        F.lit("cohort").alias("variant"),
        F.col("period").alias("k"),
        ns.alias("s1"),
        ns.alias("s2"),
        F.col("cohort_week").alias("d"),
        F.col("n_users").alias("n"),
        F.col("retention").alias("v1"),
        nd_.alias("v2"),
    )
    t_leg = tra.select(
        F.lit("transitions").alias("variant"),
        nl.alias("k"),
        F.col("from_type").alias("s1"),
        F.col("to_type").alias("s2"),
        ndt.alias("d"),
        F.col("n").alias("n"),
        F.col("prob").alias("v1"),
        nd_.alias("v2"),
    )
    return f_leg.unionByName(c_leg).unionByName(t_leg)


EVENT_ANALYTICS_SUITE_SQL = f"""
WITH fun AS MATERIALIZED ({FUNNEL_EVENTS_SQL}),
coh AS MATERIALIZED ({COHORT_RETENTION_EVENTS_SQL}),
tra AS MATERIALIZED ({EVENT_TRANSITIONS_SQL})
SELECT 'funnel' AS variant, step AS k, name AS s1,
       CAST(NULL AS VARCHAR) AS s2, CAST(NULL AS DATE) AS d,
       n_users AS n, conv_from_first AS v1, drop_from_prev AS v2
FROM fun
UNION ALL
SELECT 'cohort', period, NULL, NULL, cohort_week, n_users, retention,
       NULL
FROM coh
UNION ALL
SELECT 'transitions', NULL, from_type, to_type, NULL, n, prob, NULL
FROM tra
"""


AB_Z_CRITICAL = 1.96


def ab_purchase_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between the
    md5-parity user split (pre-built r13; ``operators/temporal.py:
    ab_conversion_test``): the experimentation readout — one
    user-keyed max-flag aggregate, a 2-row rollup, and the
    pooled-variance z with an α=0.05 verdict."""
    from ..operators.temporal import ab_conversion_test

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ab_conversion_test(ev, "purchase", z_critical=AB_Z_CRITICAL)


AB_PURCHASE_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         (('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2) AS g,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
agg AS (
  SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN g = 0 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_a,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN g = 1 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_b
  FROM per_user
),
calc AS (
  SELECT *,
         CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ra,
         CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rb,
         CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
  FROM agg
),
zc AS (
  SELECT *,
         CASE WHEN sqrt(pp * (1.0 - pp)
                        * (1.0 / CAST(n_a AS DOUBLE)
                           + 1.0 / CAST(n_b AS DOUBLE))) > 0
              THEN {sql_exact_round(
                  "(rb - ra) / sqrt(pp * (1.0 - pp)"
                  " * (1.0 / CAST(n_a AS DOUBLE)"
                  "    + 1.0 / CAST(n_b AS DOUBLE)))", 9)}
         END AS z
  FROM calc
)
SELECT n_a, conv_a, {sql_exact_round("ra", 9)} AS rate_a,
       n_b, conv_b, {sql_exact_round("rb", 9)} AS rate_b,
       z, coalesce(abs(z) > {AB_Z_CRITICAL}, FALSE) AS significant
FROM zc
"""


def retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life (pre-built r13): pooled exponential-decay
    fit over the weekly cohort retention curve — OLS of ln(retention)
    on period (periods ≥ 1, the shared ``text.ols_fit`` machinery's
    third consumer), reported as (slope, intercept, r2, half_life)
    where ``half_life = −ln2/slope`` weeks (NULL when retention is
    not decaying).  The one-number product-health summary on top of
    the cohort matrix; everything after the cohort aggregate is
    arithmetic on a ≤ cohorts×periods frame."""
    from ..operators.temporal import cohort_retention
    from ..operators.text import ols_fit

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    mat = cohort_retention(ev)
    pts = mat.where(
        (F.col("period") >= 1) & (F.col("retention") > 0)
    ).select(
        exact_round(F.col("period").cast("double"), 9).alias("x"),
        exact_round(F.log(F.col("retention")), 9).alias("y"),
    )
    fit = ols_fit(pts, "x", "y")
    ln2 = 0.6931471805599453
    return fit.select(
        "slope",
        "intercept",
        "r2",
        F.when(
            F.col("slope") < 0,
            exact_round(F.lit(-ln2) / F.col("slope"), 9),
        ).alias("half_life_weeks"),
    )


def _retention_decay_sql() -> str:
    from ..operators.text import sql_ols_ctes

    ln2 = 0.6931471805599453
    return f"""
WITH coh AS MATERIALIZED ({COHORT_RETENTION_EVENTS_SQL}),
xy AS (
  SELECT {sql_exact_round("CAST(period AS DOUBLE)", 9)} AS x,
         {sql_exact_round("ln(retention)", 9)} AS y
  FROM coh WHERE period >= 1 AND retention > 0
),
{sql_ols_ctes("xy", "x", "y")}
SELECT slope, intercept, r2,
       CASE WHEN slope < 0 THEN
         {sql_exact_round(f"-{ln2} / slope", 9)}
       END AS half_life_weeks
FROM fit
"""


RETENTION_DECAY_SQL = _retention_decay_sql()
