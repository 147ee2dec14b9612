"""Window / set-op / grouping / semi-structured corpus.

Covers the reference's accepted relational surface beyond plain
joins+aggregates (SURVEY.md §2.B): the 11 window functions
(function/window/mod.rs:5-20) with ROWS frames, UNION/INTERSECT/EXCEPT,
GROUPING SETS / ROLLUP / CUBE + grouping() (function/aggregate/mod.rs:48),
distinct aggregation, scalar function families (string/datetime/regex),
JSON extraction (the Snowflake-style json family,
function/scalar/mod.rs:197-230 -> Spark get_json_object), and
EXISTS/NOT-EXISTS semi/anti joins (model.slt:69-77).

Determinism: running sums use SUM(CAST(x AS DECIMAL)) OVER (...) so the
result is exact regardless of how either engine associates the frame
accumulation; window orderings always include a unique tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.registry import register
from wren_engine_spark.queries.tpch import dsum, DSUM


@register(
    "w1_top_parts_per_brand",
    """
    SELECT p_brand, p_partkey, p_name, p_retailprice, rnk
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
      FROM part
    ) t WHERE rnk <= 3
    """,
)
def w1(spark: SparkSession, sf: str) -> DataFrame:
    p = load_tables(spark, sf, "part")["part"]
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.select("p_brand", "p_partkey", "p_name", "p_retailprice",
                 F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "w2_running_customer_total",
    """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS order_seq
    FROM orders
    """,
)
def w2(spark: SparkSession, sf: str) -> DataFrame:
    o = load_tables(spark, sf, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return o.select(
        "o_custkey", "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(frame)
         .cast("double").alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "w3_order_gaps",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS next_orderkey
    FROM orders
    """,
)
def w3(spark: SparkSession, sf: str) -> DataFrame:
    o = load_tables(spark, sf, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
         .cast("bigint").alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "w4_event_sessionization",
    """
    SELECT user_id, COUNT(*) AS n_events, CAST(1 + SUM(new_session) AS BIGINT) AS n_sessions
    FROM (
      SELECT user_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM events
    ) t
    GROUP BY user_id
    """,
)
def w4(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization — the batch form of the classic streaming
    session-window operator (extension beyond reference parity). Gap
    compare in whole microseconds on both sides (no sub-second truncation)."""
    e = load_tables(spark, sf, "events")["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.select("user_id", "ts", F.lag("ts").over(w).alias("prev_ts"))
    flagged = lagged.select(
        "user_id",
        F.when(F.expr("timestampdiff(MICROSECOND, prev_ts, ts)") > 1_800_000_000, 1)
        .otherwise(0).alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.lit(1) + F.sum("new_session")).cast("bigint").alias("n_sessions"),
    )


@register(
    "s1_repeat_customers_intersect",
    """
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def s1(spark: SparkSession, sf: str) -> DataFrame:
    o = load_tables(spark, sf, "orders")["orders"]
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97)


@register(
    "s2_churned_customers_except",
    """
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def s2(spark: SparkSession, sf: str) -> DataFrame:
    o = load_tables(spark, sf, "orders")["orders"]
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.subtract(y97)  # EXCEPT (set semantics), not EXCEPT ALL


@register(
    "s3_union_all_activity",
    """
    SELECT DISTINCT actor_id, kind FROM (
      SELECT o_custkey AS actor_id, 'order' AS kind FROM orders
      UNION ALL
      SELECT user_id AS actor_id, 'event' AS kind FROM events
    ) t
    """,
)
def s3(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "orders", "events")
    a = t["orders"].select(F.col("o_custkey").alias("actor_id"), F.lit("order").alias("kind"))
    b = t["events"].select(F.col("user_id").alias("actor_id"), F.lit("event").alias("kind"))
    return a.unionAll(b).distinct()


@register(
    "g1_rollup_revenue",
    f"""
    SELECT r_name, n_name, {DSUM.format(x='o_totalprice')} AS revenue, COUNT(*) AS n_orders
    FROM orders, customer, nation, region
    WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def g1(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "orders", "customer", "nation", "region")
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        dsum(F.col("o_totalprice")).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "g2_cube_order_matrix",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def g2(spark: SparkSession, sf: str) -> DataFrame:
    o = load_tables(spark, sf, "orders")["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "g3_grouping_sets",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           {DSUM.format(x='o_totalprice')} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def g3(spark: SparkSession, sf: str) -> DataFrame:
    load_tables(spark, sf, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "d1_distinct_aggregates",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d1(spark: SparkSession, sf: str) -> DataFrame:
    l = load_tables(spark, sf, "lineitem")["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "d2_approx_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_rsd
    FROM lineitem GROUP BY l_returnflag
    """,
)
def d2(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (reference approx_distinct UDAF,
    function/aggregate/mod.rs:39). HLL sketch values differ across
    engines, so the oracle checks the HLL++ *error bound* instead: the
    query emits the exact distinct count plus a boolean asserting the
    sketch landed within 3x the configured rsd (0.05) of it — DuckDB's
    side is the exact count and literal TRUE, which hash-matches iff
    every group's sketch is in bounds."""
    l = load_tables(spark, sf, "lineitem")["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("__approx"),
    ).select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("__approx") - F.col("exact_parts"))
            <= 3 * 0.05 * F.col("exact_parts")
        ).alias("within_rsd"),
    )


@register(
    "f1_string_datetime_functions",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           CONCAT(c_mktsegment, ':', c_name) AS tagged,
           REPLACE(LOWER(c_mktsegment), 'e', '_') AS seg_mangled,
           TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num
    FROM customer
    """,
)
def f1(spark: SparkSession, sf: str) -> DataFrame:
    c = load_tables(spark, sf, "customer")["customer"]
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        F.replace(F.lower("c_mktsegment"), F.lit("e"), F.lit("_")).alias("seg_mangled"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).try_cast("bigint").alias("name_num"),
    )


@register(
    "f2_case_bucketing",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 2500 THEN 'low'
                WHEN c_acctbal < 7500 THEN 'mid'
                ELSE 'high' END AS balance_bucket,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_balance
    FROM customer
    GROUP BY 1
    """,
)
def f2(spark: SparkSession, sf: str) -> DataFrame:
    c = load_tables(spark, sf, "customer")["customer"]
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 2500, "low")
        .when(F.col("c_acctbal") < 7500, "mid")
        .otherwise("high")
        .alias("balance_bucket")
    )
    return c.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(F.col("c_acctbal")).alias("total_balance"),
    )


@register(
    "t1_monthly_revenue_trend",
    f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           {DSUM.format(x='o_totalprice')} AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def t1(spark: SparkSession, sf: str) -> DataFrame:
    o = load_tables(spark, sf, "orders")["orders"]
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(dsum(F.col("o_totalprice")).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "p1_status_priority_pivot",
    """
    SELECT o_orderstatus,
           COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
           COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
           COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
           COUNT(CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN 1 END) AS low_other
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def p1(spark: SparkSession, sf: str) -> DataFrame:
    o = load_tables(spark, sf, "orders")["orders"]
    pr = F.col("o_orderpriority")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(pr == "1-URGENT", 1)).alias("urgent"),
        F.count(F.when(pr == "2-HIGH", 1)).alias("high"),
        F.count(F.when(pr == "3-MEDIUM", 1)).alias("medium"),
        F.count(F.when(pr.isin("4-NOT SPECIFIED", "5-LOW"), 1)).alias("low_other"),
    )


@register(
    "e1_json_extraction",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_total,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def e1(spark: SparkSession, sf: str) -> DataFrame:
    """JSON family (reference's Snowflake-style get_path/as_integer ->
    Spark get_json_object + cast, SURVEY §2.B gaps note)."""
    e = load_tables(spark, sf, "events")["events"]
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).cast("bigint").alias("k_total"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "j1_customers_without_pending_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
    )
    """,
)
def j1(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"].filter(F.col("o_orderstatus") == "P"),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "j2_correlated_above_avg",
    """
    SELECT c_custkey, o_orderkey, o_totalprice FROM customer, orders
    WHERE c_custkey = o_custkey AND o_totalprice > (
      SELECT 2 * (CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))
      FROM orders o2 WHERE o2.o_custkey = c_custkey
    )
    """,
)
def j2(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar subquery (kept correlated by the reference for
    unparse, context.rs:241-242; Catalyst decorrelates it into a join for
    us). Comparison uses a strict > against 2*avg — double avg is computed
    identically (single partial per group after decorrelation both sides
    compute exact same double? avg over doubles is order-dependent, so the
    threshold is made safe below)."""
    load_tables(spark, sf, "customer", "orders")
    # NOTE: avg(double) association differs between engines in principle;
    # computed as exact decimal sum / count to stay deterministic.
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_totalprice FROM customer JOIN orders
        ON c_custkey = o_custkey
        WHERE o_totalprice > (
          SELECT 2 * (CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))
          FROM orders o2 WHERE o2.o_custkey = c_custkey
        )
        """
    )


@register(
    "w5_rank_family",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderpriority, CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
    )
    SELECT o_orderkey, o_orderpriority,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC, o_orderkey) AS rn,
           RANK()       OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC) AS drnk,
           PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC) AS prnk,
           CUME_DIST()  OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC) AS cdist,
           NTILE(4)     OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC, o_orderkey) AS tile,
           LAG(bucket)  OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC, o_orderkey) AS prev_bucket,
           LEAD(bucket) OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC, o_orderkey) AS next_bucket,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
                                          ORDER BY bucket DESC, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
    FROM base
    """,
)
def w5(spark: SparkSession, sf: str) -> DataFrame:
    """Full rank-function family (reference UDWF registry
    wren-core/core/src/mdl/function/window/mod.rs:5-20). Rank-like
    functions order by a tied bucket (well-defined: they depend only on
    key values); value functions add the unique o_orderkey tiebreak."""
    load_tables(spark, sf, "orders")
    return spark.sql(
        """
        WITH base AS (
          SELECT o_orderkey, o_orderpriority, CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
        )
        SELECT o_orderkey, o_orderpriority,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC, o_orderkey) AS rn,
               RANK()       OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC) AS rnk,
               DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC) AS drnk,
               PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC) AS prnk,
               CUME_DIST()  OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC) AS cdist,
               NTILE(4)     OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC, o_orderkey) AS tile,
               LAG(bucket)  OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC, o_orderkey) AS prev_bucket,
               LEAD(bucket) OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC, o_orderkey) AS next_bucket,
               NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
                                              ORDER BY bucket DESC, o_orderkey
                                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
        FROM base
        """
    )


@register(
    "w6_window_frames",
    """
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT d,
           CAST(rev AS DOUBLE) AS rev,
           CAST(SUM(rev) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS sum_4row,
           CAST(SUM(rev) OVER (ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS sum_7day,
           CAST(SUM(rev) OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE)
             AS sum_rest
    FROM daily
    ORDER BY d
    """,
)
def w6(spark: SparkSession, sf: str) -> DataFrame:
    """ROWS / RANGE-with-interval / forward-unbounded frame specs
    (reference frame handling: inner_dialect.rs:67-75, tests
    mod.rs:3338-3404). Frame sums accumulate in DECIMAL so both engines
    are exact."""
    load_tables(spark, sf, "lineitem")
    return spark.sql(
        """
        WITH daily AS (
          SELECT CAST(l_shipdate AS DATE) AS d,
                 SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY 1
        )
        SELECT d,
               CAST(rev AS DOUBLE) AS rev,
               CAST(SUM(rev) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS sum_4row,
               CAST(SUM(rev) OVER (ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS sum_7day,
               CAST(SUM(rev) OVER (ORDER BY d ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE)
                 AS sum_rest
        FROM daily
        ORDER BY d
        """
    )


@register(
    "s4_setops_all",
    """
    SELECT 'both_months' AS tag, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-02-01' AND o_orderdate < TIMESTAMP '1997-03-01'
    ) i
    UNION ALL
    SELECT 'jan_only' AS tag, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-02-01' AND o_orderdate < TIMESTAMP '1997-03-01'
    ) e
    """,
)
def s4(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL multiset semantics (SURVEY §2.B set
    ops; s1/s2 cover the DISTINCT variants)."""
    t = load_tables(spark, sf, "orders")
    o = t["orders"]
    jan = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-02-01").cast("timestamp"))
    ).select("o_custkey")
    feb = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-02-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-03-01").cast("timestamp"))
    ).select("o_custkey")
    both = jan.intersectAll(feb).select(F.lit("both_months").alias("tag"), "o_custkey")
    only = jan.exceptAll(feb).select(F.lit("jan_only").alias("tag"), "o_custkey")
    return both.unionAll(only)


@register(
    "d3_stat_aggregates",
    """
    SELECT c_mktsegment,
           ROUND(corr(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS corr_bal_key,
           ROUND(covar_samp(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS covar_bk,
           ROUND(stddev_samp(c_acctbal), 4) AS sd_bal,
           ROUND(var_pop(c_acctbal), 4) AS var_bal,
           ROUND(regr_slope(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS slope,
           ROUND(regr_intercept(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS icept,
           CAST(regr_count(c_acctbal, CAST(c_custkey AS DOUBLE)) AS BIGINT) AS n,
           bit_and(c_custkey) AS band,
           bit_or(c_custkey) AS bor,
           bit_xor(c_custkey) AS bxor,
           bool_and(c_acctbal > -999.0) AS all_above,
           bool_or(c_acctbal > 9999.0) AS any_high
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def d3(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical + bitwise + boolean UDAF families (reference registry
    wren-core/core/src/mdl/function/aggregate/mod.rs:11-51: corr,
    covar_samp, stddev, var_pop, regr_*, bit_and/or/xor, bool_and/or).
    FP-order-sensitive aggregates are rounded to 4 decimals."""
    load_tables(spark, sf, "customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               ROUND(corr(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS corr_bal_key,
               ROUND(covar_samp(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS covar_bk,
               ROUND(stddev_samp(c_acctbal), 4) AS sd_bal,
               ROUND(var_pop(c_acctbal), 4) AS var_bal,
               ROUND(regr_slope(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS slope,
               ROUND(regr_intercept(c_acctbal, CAST(c_custkey AS DOUBLE)), 4) AS icept,
               regr_count(c_acctbal, CAST(c_custkey AS DOUBLE)) AS n,
               bit_and(c_custkey) AS band,
               bit_or(c_custkey) AS bor,
               bit_xor(c_custkey) AS bxor,
               bool_and(c_acctbal > -999.0) AS all_above,
               bool_or(c_acctbal > 9999.0) AS any_high
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@register(
    "t2_event_funnel",
    """
    WITH steps AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    flags AS (
      SELECT user_id,
             CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS did_view,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END AS did_click_after,
             CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
                  THEN 1 ELSE 0 END AS did_purchase_after
      FROM steps
    )
    SELECT CAST(SUM(did_view) AS BIGINT) AS n_view,
           CAST(SUM(did_click_after) AS BIGINT) AS n_view_click,
           CAST(SUM(did_purchase_after) AS BIGINT) AS n_view_click_purchase,
           CAST(SUM(did_purchase_after) AS DOUBLE) / CAST(SUM(did_view) AS DOUBLE)
             AS conversion
    FROM flags
    """,
)
def t2(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered-step funnel (view -> click -> purchase) via first-touch
    timestamps per user: one shuffle on user_id, conditional-min pivot,
    ordering enforced by timestamp comparison — the standard funnel shape
    at any scale (no self-joins, no window over full event history)."""
    load_tables(spark, sf, "events")
    return spark.sql(
        """
        WITH steps AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                 MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
          FROM events GROUP BY user_id
        ),
        flags AS (
          SELECT user_id,
                 CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS did_view,
                 CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END AS did_click_after,
                 CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click
                      THEN 1 ELSE 0 END AS did_purchase_after
          FROM steps
        )
        SELECT CAST(SUM(did_view) AS BIGINT) AS n_view,
               CAST(SUM(did_click_after) AS BIGINT) AS n_view_click,
               CAST(SUM(did_purchase_after) AS BIGINT) AS n_view_click_purchase,
               CAST(SUM(did_purchase_after) AS DOUBLE) / CAST(SUM(did_view) AS DOUBLE)
                 AS conversion
        FROM flags
        """
    )


@register(
    "t3_retention_cohorts",
    """
    WITH ev AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
    ),
    cohort AS (SELECT user_id, MIN(d) AS cohort_day FROM ev GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_day,
             date_diff('day', c.cohort_day, e.d) AS day_offset
      FROM ev e JOIN cohort c ON e.user_id = c.user_id
    )
    SELECT cohort_day, CAST(day_offset AS INTEGER) AS day_offset,
           COUNT(*) AS n_users
    FROM activity WHERE day_offset <= 14
    GROUP BY 1, 2
    """,
)
def t3(spark: SparkSession, sf: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-event day,
    counted once per (cohort, day-offset) they were active on — the
    standard product-analytics rollup. Two shuffles on user_id (cohort
    min + activity distinct), then a small cohort-grid aggregation;
    day arithmetic on truncated dates is exact integers."""
    load_tables(spark, sf, "events")
    ev = spark.table("events").select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    )
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    activity = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("d"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 14)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "m4_gap_fill",
    f"""
    WITH base AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
             {DSUM.format(x='o_totalprice')} AS revenue
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-03-01'
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-02-28',
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    grid AS (
      SELECT p.priority, s.day
      FROM (SELECT DISTINCT priority FROM base) p CROSS JOIN spine s
    )
    SELECT g.priority, g.day,
           COALESCE(b.revenue, 0.0) AS revenue,
           last_value(b.revenue IGNORE NULLS) OVER (
             PARTITION BY g.priority ORDER BY g.day
             ROWS UNBOUNDED PRECEDING) AS carried_revenue
    FROM grid g LEFT JOIN base b ON b.priority = g.priority AND b.day = g.day
    """,
)
def m4(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series gap filling over a generated date spine: zero-fill
    plus forward-fill (last non-null) per series — the resample step
    before any window/trend computation. The spine is generated, the
    grid is a broadcastable dims x days cross join, and the fill is one
    window pass; at scale cost is the single partition-by-series
    shuffle."""
    o = load_tables(spark, sf, "orders")["orders"]
    base = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1995-03-01").cast("date"))
        )
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(dsum(F.col("o_totalprice")).alias("revenue"))
    )
    spine = spark.sql(
        "SELECT explode(sequence(DATE '1995-01-01', DATE '1995-02-28', "
        "INTERVAL 1 DAY)) AS day"
    )
    grid = base.select("priority").distinct().crossJoin(spine)
    w = (
        W.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(base, ["priority", "day"], "left")
        .select(
            "priority",
            "day",
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.last("revenue", ignorenulls=True).over(w).alias("carried_revenue"),
        )
    )


@register(
    "p3_pivot_matrix",
    f"""
    SELECT o_orderpriority AS priority,
           {DSUM.format(x="CASE WHEN year(o_orderdate) = 1994 THEN o_totalprice END")} AS y1994,
           {DSUM.format(x="CASE WHEN year(o_orderdate) = 1995 THEN o_totalprice END")} AS y1995,
           {DSUM.format(x="CASE WHEN year(o_orderdate) = 1996 THEN o_totalprice END")} AS y1996
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1994 AND 1996
    GROUP BY 1
    """,
)
def p3(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (long -> wide): revenue matrix priority x year via Spark's
    native pivot with explicit value list (single-pass, map-side
    combined; explicit values avoid the extra distinct-scan job). The
    oracle spells the same pivot as conditional aggregation."""
    o = load_tables(spark, sf, "orders")["orders"]
    return (
        o.filter(F.year("o_orderdate").between(1994, 1996))
        .withColumn("__y", F.concat(F.lit("y"), F.year("o_orderdate")))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("__y", ["y1994", "y1995", "y1996"])
        .agg(dsum(F.col("o_totalprice")))
    )


@register(
    "m6_linear_interpolation",
    f"""
    WITH base AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
             {DSUM.format(x='o_totalprice')} AS revenue
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-03-01'
        AND day(CAST(o_orderdate AS DATE)) % 3 = 0
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-02-28',
                                    INTERVAL 1 DAY))::DATE AS day
    ),
    grid AS (
      SELECT p.priority, s.day
      FROM (SELECT DISTINCT priority FROM base) p CROSS JOIN spine s
    ),
    j AS (
      SELECT g.priority, g.day, b.revenue,
             last_value(b.revenue IGNORE NULLS) OVER (
               PARTITION BY g.priority ORDER BY g.day
               ROWS UNBOUNDED PRECEDING) AS pv,
             last_value(CASE WHEN b.revenue IS NOT NULL THEN g.day END
                        IGNORE NULLS) OVER (
               PARTITION BY g.priority ORDER BY g.day
               ROWS UNBOUNDED PRECEDING) AS pd,
             first_value(b.revenue IGNORE NULLS) OVER (
               PARTITION BY g.priority ORDER BY g.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN b.revenue IS NOT NULL THEN g.day END
                         IGNORE NULLS) OVER (
               PARTITION BY g.priority ORDER BY g.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM grid g LEFT JOIN base b ON b.priority = g.priority AND b.day = g.day
    )
    SELECT priority, day, revenue IS NOT NULL AS observed,
           CASE WHEN revenue IS NOT NULL THEN revenue
                WHEN pv IS NULL OR nv IS NULL THEN COALESCE(pv, nv)
                ELSE pv + (nv - pv)
                     * (CAST(datediff('day', pd, day) AS DOUBLE)
                        / CAST(datediff('day', pd, nd) AS DOUBLE))
           END AS interp_revenue
    FROM j
    """,
)
def m6(spark: SparkSession, sf: str) -> DataFrame:
    """LINEAR interpolation over time-series gaps — the companion of
    m4's zero/forward fill (reference metrics land: hypertable
    gap-fill + interpolate): daily revenue observed only every third
    day-of-month, re-gridded onto the full date spine with missing
    days reconstructed as pv + (nv - pv) * elapsed-fraction between
    the bracketing observations (edges hold the nearest observation).
    Four IGNORE NULLS window passes over one series-partitioned sort —
    at scale the cost is the single partition-by-series shuffle, same
    as m4. The double arithmetic has one fixed operation order both
    sides, so the driver hash-checks the reconstruction exactly."""
    o = load_tables(spark, sf, "orders")["orders"]
    base = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1995-03-01").cast("date"))
            & (F.dayofmonth(F.col("o_orderdate").cast("date")) % 3 == 0)
        )
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(dsum(F.col("o_totalprice")).alias("revenue"))
    )
    spine = spark.sql(
        "SELECT explode(sequence(DATE '1995-01-01', DATE '1995-02-28', "
        "INTERVAL 1 DAY)) AS day"
    )
    grid = base.select("priority").distinct().crossJoin(spine)
    wp = (
        W.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_day = F.when(F.col("revenue").isNotNull(), F.col("day"))
    j = (
        grid.join(base, ["priority", "day"], "left")
        .select(
            "priority",
            "day",
            "revenue",
            F.last("revenue", ignorenulls=True).over(wp).alias("pv"),
            F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
            F.first("revenue", ignorenulls=True).over(wn).alias("nv"),
            F.first(obs_day, ignorenulls=True).over(wn).alias("nd"),
        )
    )
    frac = F.datediff(F.col("day"), F.col("pd")).cast("double") / F.datediff(
        F.col("nd"), F.col("pd")
    ).cast("double")
    interp = (
        F.when(F.col("revenue").isNotNull(), F.col("revenue"))
        .when(
            F.col("pv").isNull() | F.col("nv").isNull(),
            F.coalesce("pv", "nv"),
        )
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return j.select(
        "priority",
        "day",
        F.col("revenue").isNotNull().alias("observed"),
        interp.alias("interp_revenue"),
    )
