"""Relational query catalog over the TPC-H-ish testdata (SURVEY §2.3-§2.9).

Covers every relational operator class in SURVEY §2 — projections/filters,
dedup, imputation-style expressions, scalar expressions, aggregations,
window functions — plus the join/set-op/top-k/pivot/rollup surface the
reference lacks (§2.9 'Spark gives these for free; our engine should still
expose them').

Scale notes per query are inline: what shuffles, what broadcasts, what
prunes. Plans are written so Catalyst pushes filters into the parquet scan
and picks broadcast joins for the small sides (region/nation/supplier/part).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_weather_data_pipeline_spark.operators.dedup import dedup_keyed_first
from etl_weather_data_pipeline_spark.operators.windows import (
    latest_per_group,
    sessionize,
    topk_per_group,
)
from etl_weather_data_pipeline_spark.plans.catalog import (
    Query,
    davg,
    dround,
    dsum,
    load,
    o_davg,
    o_dround,
    o_dsum,
)

QUERIES: list[Query] = []


def q(name: str, description: str, oracle: str | None = None, tags: tuple = ()):
    def deco(fn):
        QUERIES.append(Query(name, description, fn, oracle, tuple(tags)))
        return fn

    return deco


# ---------------------------------------------------------------------------
# Aggregations (A1-A6 analogues) + TPC-H-style plans
# ---------------------------------------------------------------------------


@q(
    "pricing_summary",
    "TPC-H Q1 shape: scan-filter-aggregate on lineitem, 2 keys x 6 measures. "
    "Partial+final hash agg; filter pushed to parquet scan.",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS DOUBLE)
               AS sum_disc_price,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "top_revenue_orders",
    "TPC-H Q3 shape: customer⋈orders⋈lineitem, top-10 orders by revenue. "
    "customer side broadcasts; deterministic order via exact decimal revenue.",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1.0 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE)
               AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,4)")
    # No broadcast hints here: customer and orders both scale linearly with
    # the dataset, and an explicit hint overrides AQE's size check — at 100x
    # it forces an OOM broadcast. Let AQE + the autoBroadcastJoinThreshold
    # pick broadcast when (and only when) the filtered side is actually
    # small at runtime.
    building_orders = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        li.join(
            building_orders,
            li.l_orderkey == building_orders.o_orderkey,
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@q(
    "nation_revenue",
    "TPC-H Q5 shape: 6-table join with broadcast dims, revenue per nation. "
    "lineitem is the only big side; everything else broadcasts.",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1.0 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE)
               AS revenue
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def nation_revenue(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,4)")
    # Hints ONLY on the bounded dims (supplier/nation/region). orders and
    # customer grow with the data — hinting them overrides AQE's runtime
    # size check and becomes an OOM at 100x; unhinted, AQE still broadcasts
    # them when the filtered side is small enough.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@q(
    "segment_order_stats",
    "orders⋈customer grouped by market segment (A5-style two-table agg).",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS order_count,
           COUNT(DISTINCT o.o_custkey) AS active_customers,
           {o_dsum('o.o_totalprice')} AS total_revenue,
           {o_davg('o.o_totalprice')} AS avg_order_value
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def segment_order_stats(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    # customer scales with the data (1:10 vs orders) — no forced broadcast;
    # AQE decides at runtime.
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.countDistinct("o_custkey").alias("active_customers"),
            dsum("o_totalprice").alias("total_revenue"),
            davg("o_totalprice").alias("avg_order_value"),
        )
    )


@q(
    "brand_part_stats",
    "lineitem⋈part grouped by brand; part broadcasts (small dim).",
    oracle=f"""
    SELECT p.p_brand,
           COUNT(*) AS line_count,
           COUNT(DISTINCT l.l_partkey) AS distinct_parts,
           {o_dsum('l.l_quantity')} AS total_qty,
           {o_davg('p.p_retailprice')} AS avg_retail
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def brand_part_stats(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
            dsum("l_quantity").alias("total_qty"),
            davg("p_retailprice").alias("avg_retail"),
        )
    )


@q(
    "global_order_metrics",
    "Single-row global aggregate (A1/A2 analogue): counts, exact distincts, "
    "min/max timestamps, deterministic avg.",
    oracle=f"""
    SELECT COUNT(*) AS total_orders,
           COUNT(DISTINCT o_custkey) AS unique_customers,
           COUNT(DISTINCT o_orderpriority) AS priorities,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           {o_davg('o_totalprice')} AS avg_total
    FROM orders
    """,
)
def global_order_metrics(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.countDistinct("o_custkey").alias("unique_customers"),
        F.countDistinct("o_orderpriority").alias("priorities"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        davg("o_totalprice").alias("avg_total"),
    )


# ---------------------------------------------------------------------------
# Joins / set ops (SURVEY §2.9 — beyond the reference)
# ---------------------------------------------------------------------------


@q(
    "customer_semi_anti_battery",
    "Existence-join battery — left-semi (EXISTS: customers having at "
    "least one order > 400k) and left-anti (NOT EXISTS: customers with "
    "no orders at all), labeled per op in one result (consolidates the "
    "r13 rotation-debt directive's single-operator rows "
    "customers_with_big_orders / customers_without_orders into one "
    "driver slot; operator coverage unchanged — both JOIN strategies "
    "stay real left_semi / left_anti nodes). Each branch re-scans the "
    "two column-pruned projections — deliberately cheap enough that a "
    "shared persist would cost more than the narrow scans it saves "
    "(the nation_set_ops_battery rationale).",
    oracle="""
    SELECT 'semi_big_orders' AS op, c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    UNION ALL
    SELECT 'anti_no_orders' AS op, c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customer_semi_anti_battery(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000)
    semi = (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .select(
            F.lit("semi_big_orders").alias("op"),
            "c_custkey", "c_name", "c_mktsegment",
        )
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(
            F.lit("anti_no_orders").alias("op"),
            "c_custkey", "c_name", "c_mktsegment",
        )
    )
    return semi.unionByName(anti)


@q(
    "nation_set_ops_battery",
    "Set-operator battery — UNION (distinct), INTERSECT, and EXCEPT "
    "over the customer/supplier nation-key projections, labeled per op "
    "in one result (consolidates the r12 rotation-debt directive's "
    "single-operator rows nationkeys_union / nations_intersect / "
    "customer_only_nations into one driver slot; operator coverage "
    "unchanged). Each branch re-scans the two column-pruned dim "
    "projections — deliberately cheap enough that a shared persist "
    "would cost more than the 3 narrow scans it saves.",
    oracle="""
    SELECT 'union' AS op, nationkey FROM (
      SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      UNION
      SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (
      SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      INTERSECT
      SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (
      SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      EXCEPT
      SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
    """,
)
def nation_set_ops_battery(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    u = c.union(s).distinct()
    i = c.intersect(s)
    # subtract = EXCEPT (distinct) semantics, matching SQL EXCEPT
    d = c.subtract(s)
    return (
        u.select(F.lit("union").alias("op"), "nationkey")
        .unionByName(i.select(F.lit("intersect").alias("op"), "nationkey"))
        .unionByName(d.select(F.lit("except").alias("op"), "nationkey"))
    )


# ---------------------------------------------------------------------------
# Window functions / top-k (W1 + frames, lead/lag — beyond reference)
# ---------------------------------------------------------------------------


@q(
    "latest_event_per_user",
    "W1 (latest-per-group): the reference's latest_weather view generalized "
    "— newest event per user via row_number, deterministic tiebreak.",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value
    FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn FROM events e)
    WHERE rn = 1
    """,
)
def latest_event_per_user(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return latest_per_group(
        ev, ["user_id"], "ts", tiebreak=[F.col("event_id").desc()]
    ).select("event_id", "user_id", "ts", "event_type", "value")


@q(
    "top_orders_per_customer",
    "Top-k per group: 3 biggest orders per customer, ranked.",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rank
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS rank
          FROM orders)
    WHERE rank <= 3
    """,
)
def top_orders_per_customer(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return topk_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rank")


@q(
    "user_running_value",
    "Window frame (running sum) + lag, per user ordered by time. Decimal "
    "window sum for cross-engine determinism.",
    oracle="""
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_value
    FROM events
    """,
)
def user_running_value(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(frame)
        .cast("double")
        .alias("running_value"),
        F.lag("value").over(w).alias("prev_value"),
    )


@q(
    "customer_running_spend",
    "Cumulative spend per customer over order history via the running_sum "
    "operator (one shuffle on the customer key; decimal-backed so the "
    "accumulation is deterministic — cumulative double sums drift between "
    "engines even in a fixed order because window implementations "
    "re-associate).",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
    FROM orders
    """,
)
def customer_running_spend(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.windows import running_sum

    o = load(spark, sf_dir, "orders")
    out = running_sum(
        o,
        keys=["o_custkey"],
        order=["o_orderdate", "o_orderkey"],
        value=F.col("o_totalprice").cast("decimal(18,2)"),
        out_col="__rs",
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.col("__rs").cast("double").alias("running_spend"),
    )


@q(
    "user_sessions",
    "Sessionization: lag + gap>30min + running count, then sessions per "
    "user (one shuffle on user_id; both windows share the sort).",
    oracle="""
    WITH lagged AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL
                       OR (epoch_us(ts)//1000000 - epoch_us(prev_ts)//1000000) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM lagged
    )
    SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def user_sessions(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", gap_minutes=30, tiebreak=["event_id"])
    return sess.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Dedup (D1) / filters (P2-P6) / scalar expressions (E1-E23) on events
# ---------------------------------------------------------------------------


@q(
    "dedup_events_hourly",
    "D1 generalized: earliest event per (user, type, hour) — deterministic "
    "keep-first via row_number, the reference's hour-truncated dedup.",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM (SELECT e.*, row_number() OVER (
              PARTITION BY user_id, event_type, date_trunc('hour', ts)
              ORDER BY ts, event_id) AS rn FROM events e)
    WHERE rn = 1
    """,
)
def dedup_events_hourly(spark, sf_dir):
    ev = load(spark, sf_dir, "events").withColumn(
        "__h", F.date_trunc("hour", F.col("ts"))
    )
    out = dedup_keyed_first(ev, ["user_id", "event_type", "__h"], ["ts", "event_id"])
    return out.select("event_id", "user_id", "event_type", "ts", "value")


@q(
    "events_enriched",
    "Scalar-expression battery (E1-E22 analogues): date parts, season "
    "when-chain, clip, pmod, decimal-round, initcap, concat, numeric→string.",
    oracle=f"""
    SELECT event_id,
           CAST(ts AS DATE) AS d,
           CAST(hour(ts) AS INT) AS hr,
           dayname(ts) AS day_name,
           monthname(ts) AS month_name,
           CASE WHEN month(ts) IN (12,1,2) THEN 'Winter'
                WHEN month(ts) IN (3,4,5) THEN 'Spring'
                WHEN month(ts) IN (6,7,8) THEN 'Summer'
                ELSE 'Autumn' END AS season,
           least(greatest(value, 10.0), 100.0) AS value_clipped,
           ((event_id * 7 - 1000) % 360 + 360) % 360 AS wrapped,
           {o_dround('value * 0.1', 2)} AS value_scaled,
           upper(substr(event_type, 1, 1)) || substr(event_type, 2)
               AS type_title,
           event_type || '-' || CAST(user_id AS VARCHAR) AS type_user,
           CAST(value AS VARCHAR) AS value_str
    FROM events
    """,
)
def events_enriched(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ts, v = F.col("ts"), F.col("value")
    m = F.month(ts)
    return ev.select(
        "event_id",
        F.to_date(ts).alias("d"),
        F.hour(ts).alias("hr"),
        F.date_format(ts, "EEEE").alias("day_name"),
        F.date_format(ts, "MMMM").alias("month_name"),
        F.when(m.isin(12, 1, 2), "Winter")
        .when(m.isin(3, 4, 5), "Spring")
        .when(m.isin(6, 7, 8), "Summer")
        .otherwise("Autumn")
        .alias("season"),
        F.least(F.greatest(v, F.lit(10.0)), F.lit(100.0)).alias("value_clipped"),
        F.pmod(F.col("event_id") * 7 - 1000, F.lit(360)).alias("wrapped"),
        dround(v * 0.1, 2).alias("value_scaled"),
        F.initcap(F.col("event_type")).alias("type_title"),
        F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "type_user"
        ),
        v.cast("string").alias("value_str"),
    )


@q(
    "events_filtered_scored",
    "Range filters (P3-P6 analogues) + piecewise comfort/quality scoring "
    "(E16/E19 analogues) — conjunctive predicate reaches the scan.",
    oracle=f"""
    SELECT event_id,
           {o_dround('value + (CASE WHEN (event_id % 120) > 70 '
                      'THEN ((event_id % 120) - 70) * 0.1 '
                      'WHEN (event_id % 120) < 30 '
                      'THEN -(30 - (event_id % 120)) * 0.05 ELSE 0.0 END)', 1)}
               AS comfort,
           CAST(least(greatest(100 - (CASE WHEN value > 400 THEN 5 ELSE 0 END)
                                   - (CASE WHEN value < 1 THEN 3 ELSE 0 END)
                                   - (CASE WHEN event_id % 7 = 0 THEN 10 ELSE 0 END),
                               0), 100) AS DOUBLE) AS quality
    FROM events
    WHERE value BETWEEN 5.0 AND 450.0
      AND event_type IN ('click','purchase','view')
      AND user_id IS NOT NULL
    """,
)
def events_filtered_scored(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    h = F.col("event_id") % 120
    comfort = dround(
        v
        + F.when(h > 70, (h - 70) * 0.1)
        .when(h < 30, -(30 - h) * 0.05)
        .otherwise(F.lit(0.0)),
        1,
    )
    quality = (
        F.lit(100)
        - F.when(v > 400, 5).otherwise(0)
        - F.when(v < 1, 3).otherwise(0)
        - F.when(F.col("event_id") % 7 == 0, 10).otherwise(0)
    )
    quality = F.least(F.greatest(quality, F.lit(0)), F.lit(100)).cast("double")
    return (
        ev.filter(
            v.between(5.0, 450.0)
            & F.col("event_type").isin("click", "purchase", "view")
            & F.col("user_id").isNotNull()
        )
        .select("event_id", comfort.alias("comfort"), quality.alias("quality"))
    )


@q(
    "events_json_props",
    "JSON extraction (E23 analogue): pull typed values out of the props "
    "JSON column and aggregate on them.",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) // 10 AS k_bucket,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS users
    FROM events
    GROUP BY 1
    """,
)
def events_json_props(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(
            F.floor(k / 10).cast("int").alias("k_bucket"), "user_id"
        )
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("users"))
    )


@q(
    "median_value_by_type",
    "N2 analogue (median imputation's aggregate half): exact median per "
    "group + deviation counts.",
    oracle="""
    SELECT event_type, median(value) AS median_value,
           COUNT(*) FILTER (WHERE value > (SELECT median(value) FROM events))
               AS above_global_median
    FROM events GROUP BY event_type
    """,
)
def median_value_by_type(spark, sf_dir):
    # The global median stays IN the plan as a 1-row aggregate broadcast
    # back via crossJoin (same shape as transform.handle_missing) — an
    # eager .first() here would run the events scan as a separate job
    # every time the query is built.
    ev = load(spark, sf_dir, "events")
    gmed = ev.agg(F.median("value").alias("__global_med"))
    return (
        ev.crossJoin(F.broadcast(gmed))
        .groupBy("event_type")
        .agg(
            F.median("value").alias("median_value"),
            F.count(F.when(F.col("value") > F.col("__global_med"), 1)).alias(
                "above_global_median"
            ),
        )
    )


@q(
    "value_percentiles_by_type",
    "EXACT percentile battery per group (p25/p50/p90, continuous "
    "interpolation — Spark percentile() and DuckDB quantile_cont share "
    "the definition; results decimal-rounded). Scalar columns, never an "
    "array result: the driver's canonicalizer cannot sort list cells "
    "(round-1 approx_aggregates lesson). The exact sort-based percentile "
    "is the small-group tool; percentile_approx is the 100 TB path "
    "(approx_aggregates).",
    oracle=f"""
    SELECT event_type,
           {o_dround('quantile_cont(value, 0.25)', 6)} AS p25,
           {o_dround('quantile_cont(value, 0.50)', 6)} AS p50,
           {o_dround('quantile_cont(value, 0.90)', 6)} AS p90
    FROM events GROUP BY event_type
    """,
)
def value_percentiles_by_type(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        dround(F.percentile("value", 0.25), 6).alias("p25"),
        dround(F.percentile("value", 0.50), 6).alias("p50"),
        dround(F.percentile("value", 0.90), 6).alias("p90"),
    )


@q(
    "events_mad_outliers_battery",
    "Robust (median/MAD) outlier battery per event type — the r14 "
    "consolidation of events_mad_outliers + events_mad_outliers_approx "
    "(constituents retired with green-r13 driver evidence; identical "
    "MAD surface, one plan). The exact branch is the data-quality "
    "companion to events_anomaly_zscore: mean/stddev z-scores are "
    "themselves dragged by the outliers they hunt, while the MAD rule "
    "(|x - median| > 3.5 * 1.4826 * MAD, the standard consistency "
    "constant) has a 50% breakdown point — its median/MAD/outlier-count/"
    "outlier-rate columns are all cross-checked value-for-value by "
    "DuckDB. The approx branch is the 100 TB variant, itself checked: "
    "the exact F.median passes are full sort-based aggregations (fine "
    "at small groups, a scan-wide sort at 100 TB), so the production "
    "plan swaps them for percentile_approx — same pass shape, sketch "
    "aggregation. Sketches are engine- and merge-order-specific, so the "
    "approx columns ride as PROPERTY booleans (approx_aggregates "
    "pattern): approx median within the exact p45-p55 band, approx MAD "
    "within the deviation distribution's p45-p55 (deviations taken "
    "around the APPROX median, so the band checks the sketch, not the "
    "recentering), and the approx outlier rate within 0.02 absolute of "
    "the exact rate. Default sketch accuracy 10000 bounds rank error at "
    "n/10000, orders of magnitude inside these bands. Both branches "
    "ride ONE set of group aggregates over one scan pipeline — the "
    "sketch and exact percentiles are columns of the same groupBy, so "
    "the battery costs one query where the constituents paid two.",
    oracle=f"""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, median(dev) AS mad FROM dev GROUP BY 1)
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {o_dround('MIN(d.med)', 6)} AS median_value,
           {o_dround('MIN(m.mad)', 6)} AS mad,
           CAST(COUNT(*) FILTER (
             WHERE d.dev > 3.5 * 1.4826 * m.mad) AS BIGINT) AS n_outliers,
           {o_dround(
               'CAST(COUNT(*) FILTER ('
               ' WHERE d.dev > 3.5 * 1.4826 * m.mad) AS DOUBLE)'
               ' / COUNT(*)', 6)} AS outlier_rate,
           TRUE AS approx_med_in_p45_p55,
           TRUE AS approx_mad_in_p45_p55,
           TRUE AS approx_rate_within_002
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1
    """,
)
def events_mad_outliers_battery(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    g1 = ev.groupBy("event_type").agg(
        F.median("value").alias("__med"),
        F.percentile_approx("value", 0.5).alias("__amed"),
        F.percentile("value", 0.45).alias("__p45"),
        F.percentile("value", 0.55).alias("__p55"),
    )
    j = ev.join(F.broadcast(g1), "event_type").select(
        "event_type",
        "__med",
        "__amed",
        "__p45",
        "__p55",
        F.abs(F.col("value") - F.col("__med")).alias("__dev_e"),
        F.abs(F.col("value") - F.col("__amed")).alias("__dev_a"),
    )
    g2 = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("__med").alias("__med"),
        F.min("__amed").alias("__amed"),
        F.min("__p45").alias("__p45"),
        F.min("__p55").alias("__p55"),
        F.median("__dev_e").alias("__mad_e"),
        F.percentile_approx("__dev_a", 0.5).alias("__amad"),
        F.percentile("__dev_a", 0.45).alias("__d45"),
        F.percentile("__dev_a", 0.55).alias("__d55"),
    )
    # third lightweight pass for the outlier counts: thresholds depend on
    # the medians/MADs just aggregated, broadcast back into the scan
    j2 = ev.join(F.broadcast(g2), "event_type")
    out_e = (
        F.abs(F.col("value") - F.col("__med"))
        > F.lit(3.5) * F.lit(1.4826) * F.col("__mad_e")
    )
    out_a = (
        F.abs(F.col("value") - F.col("__amed"))
        > F.lit(3.5) * F.lit(1.4826) * F.col("__amad")
    )
    g3 = j2.groupBy("event_type").agg(
        F.min("n_events").alias("n_events"),
        dround(F.min("__med"), 6).alias("median_value"),
        dround(F.min("__mad_e"), 6).alias("mad"),
        F.count(F.when(out_e, 1)).alias("n_outliers"),
        F.count(F.when(out_a, 1)).alias("__n_out_a"),
        F.min("__amed").alias("__amed"),
        F.min("__p45").alias("__p45"),
        F.min("__p55").alias("__p55"),
        F.min("__amad").alias("__amad"),
        F.min("__d45").alias("__d45"),
        F.min("__d55").alias("__d55"),
    )
    rate_gap = F.abs(
        F.col("__n_out_a").cast("double") / F.col("n_events")
        - F.col("n_outliers").cast("double") / F.col("n_events")
    )
    return g3.select(
        "event_type",
        "n_events",
        "median_value",
        "mad",
        "n_outliers",
        dround(
            F.col("n_outliers").cast("double") / F.col("n_events"), 6
        ).alias("outlier_rate"),
        F.col("__amed")
        .between(F.col("__p45"), F.col("__p55"))
        .alias("approx_med_in_p45_p55"),
        F.col("__amad")
        .between(F.col("__d45"), F.col("__d55"))
        .alias("approx_mad_in_p45_p55"),
        (rate_gap <= F.lit(0.02)).alias("approx_rate_within_002"),
    )


# ---------------------------------------------------------------------------
# Grouping extensions: pivot, rollup, daily quality (A4)
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@q(
    "daily_event_type_pivot",
    "Pivot: one row per day, one count column per event type.",
    oracle="""
    SELECT CAST(ts AS DATE) AS d,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY 1
    """,
)
def daily_event_type_pivot(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("d", F.to_date("ts"))
        .groupBy("d")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


@q(
    "event_type_rollup",
    "Rollup: per-type counts plus grand total (NULL grouping row).",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {o_dsum('value')} AS total_value
    FROM events GROUP BY ROLLUP(event_type)
    """,
)
def event_type_rollup(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.rollup("event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value")
    )


@q(
    "daily_quality_summary",
    "A4 analogue (quality-over-time view): per-day activity metrics.",
    oracle=f"""
    SELECT CAST(ts AS DATE) AS d,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS active_users,
           {o_davg('value')} AS avg_value,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events GROUP BY 1
    """,
)
def daily_quality_summary(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("d", F.to_date("ts"))
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("active_users"),
            davg("value").alias("avg_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


@q(
    "type_value_buckets",
    "A5 analogue (two-key grouped trends): event type x value bucket "
    "(E13-E15-style when-chain).",
    oracle=f"""
    SELECT event_type,
           CASE WHEN value < 10 THEN 'tiny' WHEN value < 50 THEN 'small'
                WHEN value < 150 THEN 'medium' WHEN value < 300 THEN 'large'
                ELSE 'huge' END AS value_bucket,
           COUNT(*) AS n, {o_davg('value')} AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def type_value_buckets(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    bucket = (
        F.when(v < 10, "tiny")
        .when(v < 50, "small")
        .when(v < 150, "medium")
        .when(v < 300, "large")
        .otherwise("huge")
    )
    return (
        ev.withColumn("value_bucket", bucket)
        .groupBy("event_type", "value_bucket")
        .agg(F.count(F.lit(1)).alias("n"), davg("value").alias("avg_value"))
    )


@q(
    "sliding_window_counts",
    "Sliding event-time windows (2h window, 1h slide) as a BATCH query — "
    "the same F.window operator Structured Streaming uses; each event "
    "lands in exactly 2 overlapping windows.",
    oracle=f"""
    WITH w AS (
      SELECT e.*, unnest([date_trunc('hour', ts),
                          date_trunc('hour', ts) - INTERVAL 1 HOUR])
                 AS window_start
      FROM events e)
    SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end,
           event_type, COUNT(*) AS n, {o_dsum('value')} AS total_value
    FROM w GROUP BY window_start, event_type
    """,
)
def sliding_window_counts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


@q(
    "session_window_stats",
    "Session windows (30-min gap) as a BATCH query via F.session_window — "
    "per (user, session): span and activity. Oracle mirrors with the "
    "lag + gap-flag + running-sum formulation.",
    oracle=f"""
    WITH lagged AS (
      SELECT user_id, ts, value, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, ts, value,
             SUM(CASE WHEN prev_ts IS NULL
                        OR (epoch_us(ts) - epoch_us(prev_ts)) > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
      FROM lagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           {o_dsum('value')} AS total_value
    FROM flagged GROUP BY user_id, session_id
    """,
)
def session_window_stats(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Data layout (Z-order clustering)
# ---------------------------------------------------------------------------

from etl_weather_data_pipeline_spark.operators.layout import (  # noqa: E402
    o_zorder,
    zorder_key,
)

_ZBITS = 11  # covers user_id <= 1499 and floor(value) <= 561 at every SF


@q(
    "events_zorder_layout",
    "Z-order layout quality report: quantize (user_id, floor(value)) to "
    "11-bit ints, Morton-interleave them into one sort key "
    "(operators/layout.py zorder_key — pure shift/mask/or, codegen'd), "
    "split the table into 64 equal files under BOTH orderings (z-order "
    "vs arrival order by event_id), and report each file's min/max "
    "range per dimension. The z-order files are narrow in BOTH "
    "dimensions at once, so parquet footer stats prune most files for "
    "a predicate on EITHER column — single-key layouts prune only "
    "their own key. tests/test_plans.py pins the measured span "
    "reduction; the write path (write_zordered) range-partitions on "
    "the key with sampled boundaries (no global sort) — this REPORT "
    "uses a deterministic ntile over the full ordering so the oracle "
    "can replay it, and at 100 TB it runs on a sample.",
    oracle=f"""
    WITH k AS (
      SELECT event_id, user_id,
             CAST(GREATEST(FLOOR(value), 0) AS BIGINT) AS vq,
             {o_zorder('user_id', 'GREATEST(FLOOR(value), 0)', 11)} AS z
      FROM events),
    assigned AS (
      SELECT 'zorder' AS layout, user_id, vq,
             ntile(64) OVER (ORDER BY z, event_id) AS file_id
      FROM k
      UNION ALL
      SELECT 'arrival' AS layout, user_id, vq,
             ntile(64) OVER (ORDER BY event_id) AS file_id
      FROM k)
    SELECT layout, CAST(file_id AS INT) AS file_id,
           COUNT(*) AS n_rows,
           MIN(user_id) AS u_min, MAX(user_id) AS u_max,
           MIN(vq) AS v_min, MAX(vq) AS v_max,
           MAX(user_id) - MIN(user_id) AS u_span,
           MAX(vq) - MIN(vq) AS v_span
    FROM assigned GROUP BY layout, file_id
    """,
)
def events_zorder_layout(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    vq = F.greatest(F.floor(F.col("value")), F.lit(0)).cast("long")
    k = ev.select(
        "event_id",
        "user_id",
        vq.alias("vq"),
        zorder_key(F.col("user_id"), vq, bits=_ZBITS).alias("__z"),
    )
    # Both layouts' file ids come from chained windows in ONE pass over
    # k, then stack() unpivots to (layout, file_id) rows — a union of
    # two selects over k would re-evaluate its subtree per branch (the
    # two-branch re-evaluation trap) and scan the fact table twice.
    both = k.select(
        "user_id",
        "vq",
        F.ntile(64).over(Window.orderBy("__z", "event_id")).alias("__zf"),
        F.ntile(64).over(Window.orderBy("event_id")).alias("__af"),
    )
    assigned = both.select(
        "user_id",
        "vq",
        F.expr(
            "stack(2, 'zorder', __zf, 'arrival', __af) AS (layout, file_id)"
        ),
    )
    return (
        assigned.groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("user_id").alias("u_min"),
            F.max("user_id").alias("u_max"),
            F.min("vq").alias("v_min"),
            F.max("vq").alias("v_max"),
            (F.max("user_id") - F.min("user_id")).alias("u_span"),
            (F.max("vq") - F.min("vq")).alias("v_span"),
        )
    )
