"""Advanced operator coverage: as-of / range joins, cube / grouping sets,
ranking and string batteries, unpivot, approximate aggregates.

These are operators the reference lacks entirely (SURVEY §2.9 'Spark gives
them for free; our engine should still expose them') plus the custom
time-series joins a Spark engine must compose (pyspark guide: as-of join →
union + last-ignore-nulls window; range join → broadcast dim + predicate).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


def q(name, description, oracle=None, tags=()):
    def deco(fn):
        QUERIES.append(Query(name, description, fn, oracle, tuple(tags)))
        return fn

    return deco


@q(
    "orders_grouping_battery",
    "Grouping-surface battery: CUBE over (priority, status) — all 4 "
    "grouping combinations from one pass, partial aggregation expanding "
    "grouping ids map-side — UNIONed with GROUPING SETS ((priority), "
    "(status)) issued through the SQL entry point (spark.sql over a "
    "temp view; same Catalyst Expand plan as the DataFrame API), each "
    "shape labeled and carrying count + exact-decimal total + avg "
    "(consolidates the r12 rotation-debt directive's orders_cube / "
    "orders_grouping_sets rows into one driver slot; operator coverage "
    "unchanged).",
    oracle=f"""
    SELECT 'cube' AS shape, o_orderpriority, o_orderstatus,
           COUNT(*) AS n, {o_dsum('o_totalprice')} AS total,
           {o_davg('o_totalprice')} AS avg_total
    FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
    UNION ALL
    SELECT 'grouping_sets' AS shape, o_orderpriority, o_orderstatus,
           COUNT(*) AS n, {o_dsum('o_totalprice')} AS total,
           {o_davg('o_totalprice')} AS avg_total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
)
def orders_grouping_battery(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    cube = o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
        davg("o_totalprice").alias("avg_total"),
    )
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    gs = spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )
    cols = [
        "shape", "o_orderpriority", "o_orderstatus", "n", "total",
        "avg_total",
    ]
    return (
        cube.withColumn("shape", F.lit("cube")).select(cols)
        .unionByName(
            gs.withColumn("shape", F.lit("grouping_sets")).select(cols)
        )
    )


@q(
    "events_asof_orders",
    "As-of join (Spark has no native one): for each event, the most recent "
    "order in the same key group with o_orderdate <= ts. Plan: union both "
    "sides tagged, one window with last(ignorenulls) over the shared sort — "
    "a single shuffle on the key, no per-row subqueries.",
    oracle="""
    WITH u AS (
      SELECT user_id % 10 AS k, ts, event_id, 1 AS is_event,
             NULL::BIGINT AS o_orderkey
      FROM events
      UNION ALL
      SELECT o_custkey % 10, o_orderdate, NULL, 0, o_orderkey FROM orders
    ), w AS (
      SELECT k, ts, event_id, is_event,
             last_value(o_orderkey IGNORE NULLS) OVER (
               PARTITION BY k
               ORDER BY ts, is_event, o_orderkey NULLS LAST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS asof_orderkey
      FROM u)
    SELECT event_id, k, asof_orderkey FROM w WHERE is_event = 1
    """,
)
def events_asof_orders(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("k"),
        F.col("ts"),
        "event_id",
        F.lit(1).alias("is_event"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    orders = load(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 10).alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_event"),
        "o_orderkey",
    )
    u = ev.unionByName(orders)
    w = (
        Window.partitionBy("k")
        .orderBy(
            F.col("ts"), F.col("is_event"), F.col("o_orderkey").asc_nulls_last()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .filter(F.col("is_event") == 1)
        .select("event_id", "k", "asof_orderkey")
    )


@q(
    "events_range_join",
    "Range (band) join: events matched to overlapping value bands derived "
    "from part sizes. The band table is tiny → broadcast nested-loop with "
    "the range predicate, which is exactly the right physical plan; counts "
    "per band.",
    oracle=f"""
    WITH bands AS (
      SELECT DISTINCT p_size AS band_id, p_size * 8.0 AS lo,
             p_size * 8.0 + 60.0 AS hi
      FROM part
    )
    SELECT b.band_id, COUNT(*) AS n_events, {o_davg('e.value')} AS avg_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_id
    """,
)
def events_range_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    bands = (
        load(spark, sf_dir, "part")
        .select(
            F.col("p_size").alias("band_id"),
            (F.col("p_size") * 8.0).alias("lo"),
            (F.col("p_size") * 8.0 + 60.0).alias("hi"),
        )
        .distinct()
    )
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg("value").alias("avg_value"),
        )
    )


@q(
    "order_rankings",
    "Ranking battery: rank, dense_rank, percent_rank, ntile, cume_dist "
    "per priority by (totalprice, orderkey) — deterministic tiebreaks.",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           ntile(4) OVER w AS quartile,
           cume_dist() OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def order_rankings(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
    )


@q(
    "customer_string_battery",
    "String-function battery (E1-E3/E17-E18 extended): split_part, "
    "substr, lpad, replace, instr/strpos, reverse, regexp_extract, "
    "boolean predicates.",
    oracle="""
    SELECT c_custkey,
           split_part(c_name, '#', 2) AS cust_num,
           CAST(split_part(c_name, '#', 2) AS BIGINT) AS cust_num_int,
           substr(c_name, 1, 8) AS prefix,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           replace(c_name, 'Customer', 'Cust') AS short_name,
           strpos(c_name, '#') AS hash_pos,
           reverse(c_mktsegment) AS seg_rev,
           regexp_extract(c_name, '#(0*)([0-9]+)', 2) AS num_stripped,
           c_mktsegment = 'BUILDING' AS is_building,
           length(c_name) AS name_len
    FROM customer
    """,
)
def customer_string_battery(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.split_part(name, F.lit("#"), F.lit(2)).alias("cust_num"),
        F.split_part(name, F.lit("#"), F.lit(2)).cast("long").alias("cust_num_int"),
        F.substring(name, 1, 8).alias("prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.replace(name, F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.instr(name, "#").alias("hash_pos"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.regexp_extract(name, r"#(0*)([0-9]+)", 2).alias("num_stripped"),
        (F.col("c_mktsegment") == "BUILDING").alias("is_building"),
        F.length(name).alias("name_len"),
    )


@q(
    "conditional_aggs",
    "Conditional-aggregate battery per segment: FILTER counts, bool "
    "or/and, deterministic arg-max via encoded ordering.",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) FILTER (WHERE c_acctbal > 5000) AS rich,
           COUNT(*) FILTER (WHERE c_acctbal < 0) AS negative,
           bool_or(c_acctbal > 9000) AS any_very_rich,
           bool_and(c_acctbal > -1000) AS all_above_floor,
           arg_max(c_custkey, c_acctbal * 1000000 + c_custkey) AS top_custkey
    FROM customer GROUP BY c_mktsegment
    """,
)
def conditional_aggs(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    # acctbal has 2 decimals; *1e6 + custkey stays < 2^53 -> exact double,
    # making the arg-max ordering unique (no nondeterministic ties).
    order_key = bal * 1000000 + F.col("c_custkey")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.when(bal > 5000, 1)).alias("rich"),
        F.count(F.when(bal < 0, 1)).alias("negative"),
        F.max(bal > 9000).alias("any_very_rich"),
        F.min(bal > -1000).alias("all_above_floor"),
        F.max_by(F.col("c_custkey"), order_key).alias("top_custkey"),
    )


@q(
    "daily_counts_unpivot",
    "Unpivot (wide->long): the daily per-type pivot folded back to rows.",
    oracle="""
    WITH p AS (
      SELECT CAST(ts AS DATE) AS d,
             COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             COUNT(*) FILTER (WHERE event_type = 'error') AS error
      FROM events GROUP BY 1)
    SELECT d, 'click' AS event_type, click AS n FROM p
    UNION ALL
    SELECT d, 'error', error FROM p
    """,
)
def daily_counts_unpivot(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    wide = (
        ev.withColumn("d", F.to_date("ts"))
        .groupBy("d")
        .pivot("event_type", ["click", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "error"])
    )
    return wide.unpivot("d", ["click", "error"], "event_type", "n")


@q(
    "approx_aggregates",
    "Approximate aggregates (HLL distinct, quantile sketch) per event "
    "type, as a SELF-CHECKING property query: engines use different "
    "sketches so the approx VALUES can't hash-match, but the error "
    "BOUNDS can — each row carries the exact distinct count plus "
    "booleans asserting the approx answers sit inside their documented "
    "error bands (HLL rsd=0.02 within max(5%, 2); each quantile sketch "
    "value between the exact percentiles ±0.10 rank around its target — "
    "default accuracy 10000 bounds rank error at n/10000, orders of "
    "magnitude tighter). The oracle recomputes the exact count and "
    "expects every band check TRUE, so a sketch regression hash-fails "
    "the driver row instead of needing a local pytest.",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS users_within_band,
           TRUE AS median_in_p40_p60,
           TRUE AS p25_in_p15_p35,
           TRUE AS p75_in_p65_p85
    FROM events GROUP BY event_type
    """,
)
def approx_aggregates(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("__au"),
        F.percentile_approx("value", 0.5).alias("__amed"),
        F.percentile_approx("value", 0.25).alias("__ap25"),
        F.percentile_approx("value", 0.75).alias("__ap75"),
        F.percentile("value", 0.40).alias("__p40"),
        F.percentile("value", 0.60).alias("__p60"),
        F.percentile("value", 0.15).alias("__p15"),
        F.percentile("value", 0.35).alias("__p35"),
        F.percentile("value", 0.65).alias("__p65"),
        F.percentile("value", 0.85).alias("__p85"),
    )
    users_err = F.abs(F.col("__au") - F.col("exact_users"))
    return g.select(
        "event_type",
        "exact_users",
        (
            users_err
            <= F.greatest(0.05 * F.col("exact_users"), F.lit(2.0))
        ).alias("users_within_band"),
        F.col("__amed").between(F.col("__p40"), F.col("__p60")).alias(
            "median_in_p40_p60"
        ),
        F.col("__ap25").between(F.col("__p15"), F.col("__p35")).alias(
            "p25_in_p15_p35"
        ),
        F.col("__ap75").between(F.col("__p65"), F.col("__p85")).alias(
            "p75_in_p65_p85"
        ),
    )


@q(
    "skewed_type_stats",
    "Skew-mitigated aggregation: salt -> partial agg on (key, salt) -> "
    "final combine on key. event_type has 5 hot keys over 100k rows — "
    "exactly the shape that pins one task per key without salting. "
    "Results are exactly a plain GROUP BY (the oracle).",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {o_dsum('value')} AS total,
           MIN(value) AS vmin, MAX(value) AS vmax
    FROM events GROUP BY event_type
    """,
)
def skewed_type_stats(spark, sf_dir):
    from etl_weather_data_pipeline_spark.operators.skew import salted_agg

    ev = load(spark, sf_dir, "events")
    return salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n": (F.count(F.lit(1)), F.sum),
            "total": (
                F.sum(F.col("value").cast("decimal(8,2)")),
                lambda c: F.sum(c).cast("double"),
            ),
            "vmin": (F.min("value"), F.min),
            "vmax": (F.max("value"), F.max),
        },
        n_salts=8,
        salt_source=F.col("event_id"),
    )


@q(
    "kmeans_clusters",
    "Iterative k-means (4 clusters, 3 Lloyd iterations) over embeddings — "
    "DataFrame-only loop, centroids as plan literals, deterministic "
    "lowest-id seeding. Per-row assignments are borderline-float "
    "sensitive (centroid means sum doubles in partition order), so the "
    "oracled surface is the INVARIANTS: every vector assigned "
    "(n_assigned = corpus count, cross-checked by the oracle), all k "
    "clusters populated, and Lloyd's SSE non-increasing across rounds "
    "(measured inside the centroid aggregate — zero extra jobs; a "
    "convergence regression flips the boolean and hash-fails).",
    oracle="""
    SELECT CAST(4 AS BIGINT) AS k_used,
           COUNT(*) AS n_assigned,
           TRUE AS sse_monotone
    FROM embeddings
    """,
)
def kmeans_clusters(spark, sf_dir):
    # training comes from the session artifact store (r11 verdict
    # directive #5): the memoized (sse, centroids) literal is the
    # IDENTICAL deterministic Lloyd run this query used to perform
    # inline, and the assignment recompute below is exactly the rule
    # kmeans_fit_full's final assignment satisfies — map-side argmin,
    # no join, no duplicate training across consumers/repeats.
    from etl_weather_data_pipeline_spark.operators.kmeans import (
        argmin_index,
    )
    from etl_weather_data_pipeline_spark.plans.artifacts import (
        shared_kmeans_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    sse, cents = shared_kmeans_centroids(spark, sf_dir, k=4, iterations=3)
    assigned = emb.select(
        "vec_id",
        argmin_index(F.col("embedding"), cents).alias("cluster"),
    )
    monotone = all(
        later <= earlier * (1 + 1e-9) + 1e-9
        for earlier, later in zip(sse, sse[1:])
    )
    return assigned.agg(
        F.count_distinct("cluster").alias("k_used"),
        F.count(F.lit(1)).alias("n_assigned"),
    ).withColumn("sse_monotone", F.lit(bool(monotone)))


@q(
    "events_anomaly_zscore",
    "Per-type z-score anomaly flags: |value - mean| > 3 sigma within each "
    "event_type — the streaming-quality-monitor shape run as a batch "
    "audit. Mean and variance come from ONE pass of exact decimal sums "
    "(sum x, sum x^2 via E[x^2] - E[x]^2), broadcast back onto the scan; "
    "every double op after the exact sums is correctly-rounded IEEE on "
    "identical operands, so both engines flag identical rows.",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE)
               AS sx2,
             COUNT(*) AS n
      FROM events GROUP BY event_type),
    stats AS (
      SELECT event_type, sx / n AS mu,
             sqrt(sx2 / n - (sx / n) * (sx / n)) AS sigma
      FROM m)
    SELECT e.event_id, e.event_type,
           e.value,
           {o_dround("(e.value - s.mu) / s.sigma", 6)} AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE s.sigma > 0 AND abs((e.value - s.mu) / s.sigma) > 3.0
    """,
)
def events_anomaly_zscore(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("__sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,8)"))
        .cast("double")
        .alias("__sx2"),
        F.count(F.lit(1)).alias("__n"),
    )
    mu = F.col("__sx") / F.col("__n")
    stats = m.select(
        "event_type",
        mu.alias("__mu"),
        F.sqrt(F.col("__sx2") / F.col("__n") - mu * mu).alias("__sigma"),
    )
    z = (F.col("value") - F.col("__mu")) / F.col("__sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("__sigma") > 0) & (F.abs(z) > 3.0))
        .select(
            "event_id",
            "event_type",
            "value",
            dround(z, 6).alias("zscore"),
        )
    )


@q(
    "user_retention_cohorts",
    "Cohort retention: users grouped by first-seen date, distinct active "
    "users counted per (cohort_date, day_offset) — the warehouse "
    "retention triangle. The first-seen date is a min-window over "
    "user_id; the count-distinct re-shuffles on the cohort grain. All "
    "integer/date arithmetic, deterministic by construction.",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts,
             MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
               AS cohort_date
      FROM events)
    SELECT cohort_date,
           datediff('day', cohort_date, CAST(ts AS DATE)) AS day_offset,
           COUNT(DISTINCT user_id) AS active_users
    FROM firsts
    GROUP BY 1, 2
    """,
)
def user_retention_cohorts(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    firsts = ev.select(
        "user_id",
        "ts",
        F.min(F.to_date("ts")).over(w).alias("cohort_date"),
    )
    return (
        firsts.select(
            "user_id",
            "cohort_date",
            F.datediff(F.to_date("ts"), F.col("cohort_date")).alias(
                "day_offset"
            ),
        )
        .groupBy("cohort_date", "day_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@q(
    "events_funnel_conversion",
    "Funnel conversion: per user, the first 'view' and the first "
    "'purchase' within 24h after it — the product-analytics funnel as "
    "two filtered aggregates glued by an EQUI-join on user_id (the time "
    "window is a post-join predicate, so no range-join machinery and no "
    "skew beyond the user grain). Latency is exact integer micros.",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > v.first_view_ts
        AND e.ts <= v.first_view_ts + INTERVAL 24 HOURS
      GROUP BY e.user_id)
    SELECT v.user_id, v.first_view_ts, p.first_purchase_ts,
           epoch_us(p.first_purchase_ts) - epoch_us(v.first_view_ts)
             AS micros_to_convert
    FROM v JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel_conversion(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("first_view_ts"))
            & (
                F.col("ts")
                <= F.col("first_view_ts") + F.expr("INTERVAL 24 HOURS")
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    from pyspark.sql.types import TimestampNTZType

    # unix_micros rejects TIMESTAMP_NTZ (round-4 testdata); routing NTZ
    # through to_utc_timestamp(_, 'UTC') is exact AND session-tz-free.
    def _us(c):
        if isinstance(ev.schema["ts"].dataType, TimestampNTZType):
            return F.unix_micros(F.to_utc_timestamp(c, "UTC"))
        return F.unix_micros(c)

    return v.join(p, "user_id").select(
        "user_id",
        "first_view_ts",
        "first_purchase_ts",
        (
            _us(F.col("first_purchase_ts")) - _us(F.col("first_view_ts"))
        ).alias("micros_to_convert"),
    )


@q(
    "orders_monthly_growth",
    "Month-over-month revenue growth: month truncation -> exact decimal "
    "revenue sum -> lag window -> growth ratio. The whole series is one "
    "aggregate plus one single-partition window over ~80 month rows "
    "(bounded by the calendar, not the data — safe at any scale).",
    oracle=f"""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             {o_dsum("o_totalprice")} AS revenue
      FROM orders GROUP BY 1)
    SELECT month, revenue,
           {o_dround(
               "(revenue - lag(revenue) OVER (ORDER BY month))"
               " / lag(revenue) OVER (ORDER BY month)", 6)} AS growth
    FROM m
    """,
)
def orders_monthly_growth(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    m = (
        orders.select(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias(
                "month"
            ),
            "o_totalprice",
        )
        .groupBy("month")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        dround((F.col("revenue") - prev) / prev, 6).alias("growth"),
    )
