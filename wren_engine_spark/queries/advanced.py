"""Advanced corpus: metrics/date-spine (legacy Metric parity), as-of
join, array HOFs, string aggregation, exact percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wren_engine_spark.operators import asof, metrics
from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.registry import register
from wren_engine_spark.queries.tpch import dsum


@register(
    "m1_cumulative_revenue",
    """
    WITH spine AS (
      SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2001-08-01',
                                         INTERVAL 1 MONTH)) AS DATE) AS spine_date
    ),
    per AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS spine_date,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS v
      FROM orders GROUP BY 1
    )
    SELECT s.spine_date,
           CAST(COALESCE(p.v, 0) AS DOUBLE) AS period_value,
           CAST(SUM(COALESCE(p.v, 0)) OVER (ORDER BY s.spine_date
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS cumulative_value
    FROM spine s LEFT JOIN per p ON p.spine_date = s.spine_date
    """,
)
def m1(spark: SparkSession, sf: str) -> DataFrame:
    """CumulativeMetric over a DateSpine (legacy CumulativeMetric.java /
    DateSpineInfo.java parity)."""
    o = load_tables(spark, sf, "orders")["orders"]
    return metrics.cumulative_metric(
        o, "o_orderdate", "o_totalprice", "1995-01-01", "2001-08-01", grain="month"
    )


@register(
    "m2_metric_rollup_quarter",
    """
    SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1, 2
    """,
)
def m2(spark: SparkSession, sf: str) -> DataFrame:
    """Metric with TimeGrain (legacy Metric.java/TimeGrain.java parity)."""
    o = load_tables(spark, sf, "orders")["orders"]
    return metrics.metric_rollup(
        o,
        "o_orderdate",
        "quarter",
        {
            "revenue": dsum(F.col("o_totalprice")),
            "n_orders": F.count(F.lit(1)),
        },
        dimensions=["o_orderstatus"],
    )


@register(
    "a1_array_ops",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(CAST(list_sum([CAST(CAST(x AS DOUBLE) AS DECIMAL(25,15))
                          FOR x IN embedding[1:8]]) AS DOUBLE), 9) AS head8_sum,
           CAST(list_max(embedding) AS DOUBLE) AS max_val,
           CAST(list_min(embedding) AS DOUBLE) AS min_val
    FROM embeddings
    """,
)
def a1(spark: SparkSession, sf: str) -> DataFrame:
    """Array higher-order functions (reference nested/array family,
    function/scalar/mod.rs:149-186 -> Spark slice/aggregate/array_max)."""
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    dec = "decimal(25,15)"
    head8 = F.aggregate(
        F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double").cast(dec)),
        F.lit(0).cast(dec),
        lambda acc, x: (acc + x).cast(dec),
    ).cast("double")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(head8, 9).alias("head8_sum"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.array_min("embedding").cast("double").alias("min_val"),
    )


@register(
    "a2_string_agg",
    """
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def a2(spark: SparkSession, sf: str) -> DataFrame:
    """string_agg (reference UDAF registry, function/aggregate/mod.rs:46)
    with deterministic ordering via sort_array."""
    t = load_tables(spark, sf, "nation", "region")
    return (
        t["nation"]
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "a3_asof_click_attribution",
    """
    WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
                FROM events),
    purchases AS (SELECT * FROM ev WHERE event_type = 'purchase'),
    clicks AS (SELECT * FROM ev WHERE event_type = 'click'),
    best AS (
      SELECT p.event_id AS pid, MAX(c.ts) AS click_ts
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id AND c.ts <= p.ts
      GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id, p.ts, b.click_ts
    FROM purchases p LEFT JOIN best b ON b.pid = p.event_id
    """,
)
def a3(spark: SparkSession, sf: str) -> DataFrame:
    """Backward as-of join (custom operator — Spark has none natively):
    attribute each purchase to the user's most recent prior click."""
    e = load_tables(spark, sf, "events")["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof.asof_join(
        purchases, clicks, on="user_id", left_time="ts", right_time="ts", right_values=[]
    )
    return out.select("event_id", "user_id", "ts", F.col("asof_ts").alias("click_ts"))


@register(
    "p2_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def p2(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (reference approx_percentile_cont /
    median UDAFs; Spark percentile() is the exact twin both engines
    compute identically — linear interpolation on the sorted values)."""
    l = load_tables(spark, sf, "lineitem")["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
    )


@register(
    "a4_map_struct_ops",
    """
    WITH per AS (
      SELECT o_custkey,
             map {'orders': CAST(COUNT(*) AS BIGINT),
                  'urgent': CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)} AS m,
             {'first_dt': MIN(o_orderdate), 'last_dt': MAX(o_orderdate)} AS s
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           array_to_string(list_sort(map_keys(m)), ',') AS mkeys,
           m['orders'][1] AS n_orders,
           m['urgent'][1] AS n_urgent,
           CAST(s.first_dt AS DATE) AS first_date,
           CAST(s.last_dt AS DATE) AS last_date
    FROM per
    WHERE o_custkey < 200
    """,
)
def a4(spark: SparkSession, sf: str) -> DataFrame:
    """Map + struct function family (reference map fns
    function/scalar/mod.rs:187-192, named_struct/get_field
    mod.rs:20-46): map construction, map_keys, element_at, struct
    construction and field access. Nested values are projected to
    SCALARS in the output (map keys string-joined, not an array column)
    — the driver's pandas canonicalizer can't hash list cells, so array
    outputs ERR regardless of value equality (round-2 a4 lesson)."""
    load_tables(spark, sf, "orders")
    return spark.sql(
        """
        WITH per AS (
          SELECT o_custkey,
                 map('orders', COUNT(*),
                     'urgent', COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)) AS m,
                 named_struct('first_dt', MIN(o_orderdate), 'last_dt', MAX(o_orderdate)) AS s
          FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey,
               array_join(sort_array(map_keys(m)), ',') AS mkeys,
               element_at(m, 'orders') AS n_orders,
               element_at(m, 'urgent') AS n_urgent,
               CAST(s.first_dt AS DATE) AS first_date,
               CAST(s.last_dt AS DATE) AS last_date
        FROM per
        WHERE o_custkey < 200
        """
    )


@register(
    "a5_range_join",
    """
    WITH win AS (
      SELECT event_id AS win_id, ts AS w_start, ts + INTERVAL 6 HOUR AS w_end
      FROM events WHERE event_type = 'signup' AND event_id < 500
    )
    SELECT win_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events JOIN win ON ts >= w_start AND ts < w_end
    GROUP BY win_id
    ORDER BY win_id
    """,
)
def a5(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-interval range join via bucket binning (operators/
    rangejoin.py) — events landing in 6-hour windows after each signup. The naive
    plan is a nested-loop over points x intervals; binning makes it an
    equi-join on day buckets."""
    from wren_engine_spark.operators.rangejoin import range_join

    t = load_tables(spark, sf, "events")
    win = (
        t["events"]
        .filter((F.col("event_type") == "signup") & (F.col("event_id") < 500))
        .select(
            F.col("event_id").alias("win_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("w_end"),
        )
    )
    joined = range_join(
        t["events"].select("event_id", "ts", "value"),
        win, "ts", "w_start", "w_end", bucket_width_s=6 * 3600,
    )
    return (
        joined.groupBy("win_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .orderBy("win_id")
    )


@register(
    "m3_hypertable_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_rows
    FROM events
    GROUP BY 1, 2
    """,
)
def m3(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable rollup hierarchy (hour -> day -> month), answering at
    the routed 'day' grain. The day level is re-aggregated from the hour
    level — verifying the whole hierarchy against the direct daily
    aggregation oracle."""
    t = load_tables(spark, sf, "events")
    rollups = metrics.hypertable_rollup(
        t["events"], "ts", ["event_type"], "value", grains=("hour", "day", "month")
    )
    grain = metrics.route_grain("day", ("hour", "day", "month"))
    return rollups[grain].select(
        F.col("bucket").cast("timestamp").alias("bucket"),
        "event_type",
        F.col("sum_value").cast("double").alias("sum_value"),
        "n_rows",
    )


@register(
    "a6_bucketed_colocated_join",
    """
    SELECT o_orderpriority, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS total_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def a6(spark: SparkSession, sf: str) -> DataFrame:
    """Bucket-co-located fact join, driver-verified: both sides are
    persisted bucketed (+ bucket-sorted) on their join keys with the
    same bucket count, so the orders-lineitem join runs SHUFFLE-FREE
    (bucketed scan -> sort-merge join, zero Exchange before the join;
    plan-asserted in tests/test_plans.py). This is the repeated-join
    layout for 100 TB fact tables — pay one bucketed write, then every
    subsequent co-keyed join/aggregation skips the corpus shuffle
    (operators/layout.write_bucketed; reference treats physical layout
    as the warehouse's concern — this is the Spark-native equivalent).
    The only hash shuffle in the whole query is the final tiny
    per-priority aggregation."""
    from wren_engine_spark.operators import layout

    t = load_tables(spark, sf, "orders", "lineitem")
    layout.write_bucketed(
        t["orders"].select("o_orderkey", "o_orderpriority"),
        "a6_orders_b", "o_orderkey", buckets=8,
    )
    layout.write_bucketed(
        t["lineitem"].select("l_orderkey", "l_extendedprice"),
        "a6_lineitem_b", "l_orderkey", buckets=8,
    )
    o = spark.table("a6_orders_b")
    li = spark.table("a6_lineitem_b")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "d4_approx_percentile",
    """
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.50) AS exact_median,
           quantile_cont(l_extendedprice, 0.90) AS exact_p90,
           TRUE AS median_in_bounds,
           TRUE AS p90_in_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d4(spark: SparkSession, sf: str) -> DataFrame:
    """approx_percentile (GK sketch — the mergeable quantile sketch the
    reference exposes as approx_percentile, function/aggregate). Sketch
    internals differ per engine, so the oracle checks the RANK-ERROR
    BOUND (the d2 pattern): the query emits the exact interpolated
    percentiles plus booleans asserting each sketch value landed inside
    the exact [q-0.01, q+0.01] quantile envelope — ~100x the guaranteed
    n/accuracy rank error, so a sketch regression fails loudly while
    engine-specific sketch layouts stay out of the hash. At 100 TB the
    sketch is the only viable path: fixed-size state, map-side
    mergeable, one combine tree instead of a global sort."""
    l = load_tables(spark, sf, "lineitem")["lineitem"]
    g = l.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.50)).alias("exact_median"),
        F.percentile("l_extendedprice", F.lit(0.90)).alias("exact_p90"),
        F.percentile("l_extendedprice", F.lit(0.49)).alias("__m_lo"),
        F.percentile("l_extendedprice", F.lit(0.51)).alias("__m_hi"),
        F.percentile("l_extendedprice", F.lit(0.89)).alias("__p_lo"),
        F.percentile("l_extendedprice", F.lit(0.91)).alias("__p_hi"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.50, 10000)"
        ).alias("__am"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.90, 10000)"
        ).alias("__ap"),
    )
    return g.select(
        "l_returnflag",
        "exact_median",
        "exact_p90",
        ((F.col("__am") >= F.col("__m_lo")) & (F.col("__am") <= F.col("__m_hi"))).alias(
            "median_in_bounds"
        ),
        ((F.col("__ap") >= F.col("__p_lo")) & (F.col("__ap") <= F.col("__p_hi"))).alias(
            "p90_in_bounds"
        ),
    )


@register(
    "d5_hll_sketch_union",
    """
    WITH per_flag AS (
      SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts
      FROM lineitem GROUP BY l_returnflag
    ),
    total AS (SELECT COUNT(DISTINCT l_partkey) AS exact_total FROM lineitem)
    SELECT p.l_returnflag, p.exact_parts, t.exact_total,
           TRUE AS flag_in_bounds, TRUE AS union_in_bounds
    FROM per_flag p CROSS JOIN total t
    """,
)
def d5(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark's hll_sketch_agg / hll_union_agg — the persistable,
    re-aggregable form of the reference's approx_distinct): build one
    sketch per group, then UNION the group sketches into a global
    estimate WITHOUT rescanning rows — the 100 TB rollup pattern
    (daily sketches -> monthly distinct in one combine). Sketch bytes
    are engine-specific, so the oracle checks error bounds (the d2/d4
    pattern): exact counts plus booleans asserting both the per-group
    estimates and the sketch-union estimate landed within 3x the
    configured precision (lgK=14 -> rse ~0.8%)."""
    l = load_tables(spark, sf, "lineitem")["lineitem"]
    per_flag = l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.hll_sketch_agg("l_partkey", F.lit(14)).alias("__sk"),
    )
    # union the per-group sketches (no re-scan) into the global estimate
    total = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__union_est")
    )
    exact_total = l.agg(F.count_distinct("l_partkey").alias("v")).first()[0]
    eps = 0.024  # 3 x rse(lgK=14)
    return (
        per_flag.crossJoin(F.broadcast(total))
        .select(
            "l_returnflag",
            "exact_parts",
            F.lit(int(exact_total)).alias("exact_total"),
            (
                (F.hll_sketch_estimate("__sk")
                 >= F.col("exact_parts") * (1 - eps))
                & (F.hll_sketch_estimate("__sk")
                   <= F.col("exact_parts") * (1 + eps))
            ).alias("flag_in_bounds"),
            (
                (F.col("__union_est") >= F.lit(float(exact_total) * (1 - eps)))
                & (F.col("__union_est") <= F.lit(float(exact_total) * (1 + eps)))
            ).alias("union_in_bounds"),
        )
    )
