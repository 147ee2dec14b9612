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

from wren_engine_spark.queries.registry import load_tables, register

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
    t = load_tables(spark, sf, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("q"))
        .filter(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey",
                 F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
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
