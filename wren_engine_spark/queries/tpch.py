"""TPC-H-derived relational corpus over the driver testdata.

Adapted to the driver's slimmed TPC-H schema (FIXTURES.md §6 / TESTDATA.md:
no partsupp, no l_commitdate/l_receiptdate/l_shipmode/o_shippriority;
doubles instead of decimals; timestamp order/ship dates). Mirrors the
reference's execution-correctness corpus
(wren-core/sqllogictest/test_files/tpch/q*.slt.part).

Implementation is DataFrame-API (Catalyst picks broadcast vs sort-merge;
explicit broadcast hints on the tiny dimension tables nation/region which
stay small at any scale factor). Numeric convention: see registry.py —
exact decimal sums cast back to double so results hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.registry import register

# exact, order-independent sum of a double expression (see registry.py)
def dsum(col) -> F.Column:
    return F.sum(col.cast("decimal(38,6)")).cast("double")


DSUM = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"
REV = "l_extendedprice * (1 - l_discount)"


def _rev(l: DataFrame) -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM.format(x='l_quantity')} AS sum_qty,
           {DSUM.format(x='l_extendedprice')} AS sum_base_price,
           {DSUM.format(x=REV)} AS sum_disc_price,
           {DSUM.format(x=REV + ' * (1 + l_tax)')} AS sum_charge,
           {DSUM.format(x='l_quantity')} / COUNT(*) AS avg_qty,
           {DSUM.format(x='l_extendedprice')} / COUNT(*) AS avg_price,
           {DSUM.format(x='l_discount')} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf: str) -> DataFrame:
    l = load_tables(spark, sf, "lineitem")["lineitem"]
    cnt = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(_rev(l)).alias("sum_disc_price"),
            dsum(_rev(l) * (1 + F.col("l_tax"))).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / cnt).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / cnt).alias("avg_price"),
            (dsum(F.col("l_discount")) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           {DSUM.format(x=REV)} AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-30' AND l_shipdate > TIMESTAMP '1998-06-30'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-06-30").cast("timestamp")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"].filter(F.col("o_orderdate") < cutoff),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].filter(F.col("l_shipdate") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"),
                 "o_orderpriority")
        .agg(dsum(_rev(t["lineitem"])).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(t["lineitem"], on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, {DSUM.format(x=REV)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "customer", "orders", "lineitem", "supplier", "nation", "region")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["supplier"], (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(_rev(t["lineitem"])).alias("revenue"))
    )


@register(
    "q6_revenue_forecast",
    f"""
    SELECT {DSUM.format(x='l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf: str) -> DataFrame:
    l = load_tables(spark, sf, "lineitem")["lineitem"]
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, {DSUM.format(x='volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             {REV} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
          OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    l = t["lineitem"].filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    joined = (
        t["supplier"]
        .join(l, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
        )
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _rev(l).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume")).alias("revenue"))
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, {DSUM.format(x=REV)} AS revenue, c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "customer", "orders", "lineitem", "nation")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"].filter(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(t["lineitem"])).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_shipping_delay",
    """
    SELECT o_orderpriority,
           COUNT(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 1 END) AS on_time_lines,
           COUNT(CASE WHEN l_shipdate >  o_orderdate + INTERVAL 30 DAY THEN 1 END) AS late_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "orders", "lineitem")
    deadline = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("l_shipdate") <= deadline, 1)).alias("on_time_lines"),
            F.count(F.when(F.col("l_shipdate") > deadline, 1)).alias("late_lines"),
        )
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT (100.0 * {DSUM.format(x=f"CASE WHEN p_type = 'PROMO' THEN {REV} ELSE 0.0 END")})
           / {DSUM.format(x=REV)} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "lineitem", "part")
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev(l)).otherwise(F.lit(0.0))
    return (
        l.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(((F.lit(100.0) * dsum(promo)) / dsum(_rev(l))).alias("promo_revenue"))
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {DSUM.format(x=REV)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "lineitem", "supplier")
    # the scalar-subquery form is expressed in SQL so Catalyst plans the
    # subquery (exercises scalar-subquery support, SURVEY §2.B)
    return spark.sql(
        f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


@register(
    "q18_large_volume_customer",
    f"""
    SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           o_totalprice, {DSUM.format(x='l_quantity')} AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 300
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
    """,
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    # One lineitem aggregation serves BOTH the >300 filter and the
    # published sum_qty: the output grain is o_orderkey (unique in
    # orders), so the original semi-join + re-join of lineitem + final
    # re-aggregation recomputed per-order sums `big` already held.
    # Removes a full lineitem shuffle and the final group-by exchange;
    # identical results (exact decimal sum -> double, as dsum).
    t = load_tables(spark, sf, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 300)
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            F.col("q").cast("double").alias("sum_qty"),
        )
    )


@register(
    "q19_discounted_revenue",
    f"""
    SELECT {DSUM.format(x=REV)} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
         (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
      OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    )
    """,
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "lineitem", "part")
    l, p = t["lineitem"], t["part"]
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(_rev(l)).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H queries, adapted to the driver schema (no partsupp, no
# l_commitdate/l_receiptdate, no comments/phone). Each keeps the original
# query's operator shape — correlated scalar subqueries (q2, q17), ratio
# aggregations (q8), multi-way join + derived-column agg (q9), HAVING over a
# scalar subquery (q11), outer-join distribution (q13), count-distinct with
# NOT IN (q16), nested grouped IN-subquery (q20), EXISTS/NOT-EXISTS self
# joins (q21), anti join + scalar avg subquery (q22) — mirroring
# wren-core/sqllogictest/test_files/tpch/q{2,8,9,11,13,16,17,20,21,22}.slt.part.
# partsupp is derived as DISTINCT (l_partkey, l_suppkey) with
# ps_supplycost := MIN(l_extendedprice / l_quantity).
# ---------------------------------------------------------------------------

_SUPPLY_CTE = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice / l_quantity) AS ps_supplycost
    FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _supply(l: DataFrame) -> DataFrame:
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))


@register(
    "q2_min_cost_supplier",
    f"""
    WITH supply AS ({_SUPPLY_CTE})
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, supply, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size = 15 AND p_type = 'LARGE'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps_supplycost)
        FROM supply, supplier, nation, region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "lineitem", "part", "supplier", "nation", "region")
    # Europe suppliers: tiny at any SF (suppliers table is dim-sized) -> broadcast
    esupp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    from pyspark.sql import Window as W

    # per-part minimum via a window over the already-partitioned supply:
    # one shuffle on ps_partkey, no second aggregation+join pass
    esupply = (
        _supply(t["lineitem"])
        .join(F.broadcast(esupp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .withColumn("mc_cost", F.min("ps_supplycost").over(W.partitionBy("ps_partkey")))
    )
    parts = t["part"].filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
    return (
        parts.join(
            esupply.filter(F.col("ps_supplycost") == F.col("mc_cost")),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           {DSUM.format(x="CASE WHEN nation = 'NATION_5' THEN volume ELSE 0.0 END")}
             / {DSUM.format(x='volume')} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {REV} AS volume, n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "part", "supplier", "lineitem", "orders", "customer",
                    "nation", "region")
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"),
                            F.col("n_regionkey").alias("n1_regionkey"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"),
                            F.col("n_name").alias("nation"))
    o = t["orders"].filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    l = t["lineitem"]
    joined = (
        t["part"].filter(F.col("p_type") == "ECONOMY")
        .join(l, F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("n1_regionkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").cast("int").alias("o_year"),
                _rev(l).alias("volume"), "nation")
    )
    num = F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0))
    return (
        joined.groupBy("o_year")
        .agg((dsum(num) / dsum(F.col("volume"))).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q9_product_type_profit",
    f"""
    SELECT nation, o_year, {DSUM.format(x='amount')} AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {REV} - 0.6 * p_retailprice * l_quantity AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "part", "supplier", "lineitem", "orders", "nation")
    l = t["lineitem"]
    amount = _rev(l) - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        t["part"].filter(F.col("p_name").like("%gear%"))
        .join(l, F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("int").alias("o_year"),
                amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "q11_important_stock",
    f"""
    SELECT l_partkey AS ps_partkey,
           {DSUM.format(x='l_extendedprice')} AS value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
    GROUP BY l_partkey
    HAVING {DSUM.format(x='l_extendedprice')} > (
      SELECT {DSUM.format(x='l_extendedprice')} * 0.001
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
    )
    ORDER BY value DESC, ps_partkey
    """,
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "lineitem", "supplier", "nation")
    nat_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_9")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    base = t["lineitem"].join(F.broadcast(nat_supp),
                              F.col("l_suppkey") == F.col("s_suppkey"))
    per_part = base.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        dsum(F.col("l_extendedprice")).alias("value")
    )
    total = base.agg((dsum(F.col("l_extendedprice")) * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q16_parts_supplier_relationship",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem) partsupp,
         part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "lineitem", "part", "supplier")
    partsupp = t["lineitem"].select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    complained = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        partsupp.join(F.broadcast(complained),
                      F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(parts, F.col("p_partkey") == F.col("ps_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND l_quantity * 5.0 * (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
          < (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    # correlated-avg rewritten exactly: l_quantity < 0.2 * SUM(q)/COUNT(q)
    # <=> 5 * l_quantity * COUNT(q) < SUM(q)  (exact decimal sum -> double)
    t = load_tables(spark, sf, "lineitem", "part")
    per_part = t["lineitem"].groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sum_q"),
    )
    parts = t["part"].filter((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM"))
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") * 5.0 * F.col("cnt") < F.col("sum_q"))
        .agg((dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


@register(
    "q20_potential_part_promotion",
    """
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 50
      )
      AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
    ORDER BY s_name
    """,
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, "supplier", "nation", "lineitem", "part")
    red_parts = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    shippers = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_9")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(shippers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_suppliers_kept_waiting",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
      AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    # EXISTS / NOT-EXISTS self-joins rewritten as one per-order aggregate:
    # order qualifies for supplier s iff it has >=2 distinct suppliers and
    # exactly one distinct LATE supplier (which must be s, since l1 is late).
    # One shuffle over lineitem instead of two self-joins.
    from pyspark.sql import Window as W

    t = load_tables(spark, sf, "supplier", "lineitem", "orders", "nation")
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    l = t["lineitem"].join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # per-order supplier counts via one window pass over the joined
    # lineitems (single shuffle on l_orderkey) instead of a separate
    # aggregation + semi-join re-reading lineitem
    w = W.partitionBy("l_orderkey")
    enriched = (
        l.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(F.when(late, F.col("l_suppkey"))).over(w)),
        )
    )
    nat_supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_9")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        enriched.filter(late & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "q22_global_sales_opportunity",
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT n_name AS cntrycode, c_acctbal, c_custkey
      FROM customer, nation
      WHERE c_nationkey = n_nationkey
        AND n_name IN ('NATION_1','NATION_5','NATION_9','NATION_13','NATION_17','NATION_21','NATION_24')
        AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
          FROM customer, nation
          WHERE c_nationkey = n_nationkey AND c_acctbal > 0.0
            AND n_name IN ('NATION_1','NATION_5','NATION_9','NATION_13','NATION_17','NATION_21','NATION_24')
        )
    ) custsale
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    nations = ("NATION_1", "NATION_5", "NATION_9", "NATION_13",
               "NATION_17", "NATION_21", "NATION_24")
    t = load_tables(spark, sf, "customer", "nation", "orders")
    cust = t["customer"].join(
        F.broadcast(t["nation"].filter(F.col("n_name").isin(*nations))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    # exact mean: decimal sum -> double, / count (same fp steps as oracle)
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
         / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
