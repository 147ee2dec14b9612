"""Queries exercising the function-compat layer (functions/compat.py)
through the driver's DuckDB-oracle gate.

The Spark side runs the SQL-UDF implementations (date_bin, get_path,
as_integer, wren_to_char, array_distance); the oracle expresses the same
semantics with DuckDB natives (time_bucket, json_extract_string,
strftime, list arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wren_engine_spark.functions.compat import register_compat_functions
from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.registry import register


@register(
    "f3_compat_datetime_json",
    """
    SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket,
           strftime(time_bucket(INTERVAL 15 MINUTE, ts), '%Y-%m-%d %H:%M') AS bucket_label,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1, 2
    ORDER BY bucket
    LIMIT 200
    """,
)
def f3(spark: SparkSession, sf: str) -> DataFrame:
    load_tables(spark, sf, "events")
    register_compat_functions(spark)
    return spark.sql(
        """
        SELECT date_bin(INTERVAL '15' MINUTE, ts, TIMESTAMP '1970-01-01 00:00:00') AS bucket,
               wren_to_char(date_bin(INTERVAL '15' MINUTE, ts, TIMESTAMP '1970-01-01 00:00:00'),
                            '%Y-%m-%d %H:%M') AS bucket_label,
               COUNT(*) AS n_events,
               SUM(as_integer(get_path(props, 'k'))) AS sum_k
        FROM events
        WHERE get_path(props, 'k') IS NOT NULL
        GROUP BY 1, 2
        ORDER BY bucket
        LIMIT 200
        """
    )


@register(
    "f4_compat_array_distance",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(sqrt(list_reduce(list_prepend(0.0,
                 [(CAST(s[1] AS DOUBLE)-CAST(s[2] AS DOUBLE))*(CAST(s[1] AS DOUBLE)-CAST(s[2] AS DOUBLE))
                  FOR s IN list_zip(a.embedding, b.embedding)]), (acc, v) -> acc + v)), 6) AS l2_dist
    FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
    WHERE a.vec_id < 20
    ORDER BY id_a
    """,
)
def f4(spark: SparkSession, sf: str) -> DataFrame:
    load_tables(spark, sf, "embeddings")
    register_compat_functions(spark)
    return spark.sql(
        """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(array_distance(CAST(a.embedding AS ARRAY<DOUBLE>),
                                    CAST(b.embedding AS ARRAY<DOUBLE>)), 6) AS l2_dist
        FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
        WHERE a.vec_id < 20
        ORDER BY id_a
        """
    )


@register(
    "f5_native_misc_functions",
    """
    SELECT c_custkey,
           substr(c_name, 1, 9) || 'XX' || substr(c_name, 12) AS overlaid,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL THEN 'other_seg' ELSE 'building' END AS nvl2_tag,
           CAST(octet_length(encode(c_name)) AS INTEGER) AS name_bytes,
           greatest(c_acctbal, 0.0) AS bal_floor,
           least(CAST(c_custkey AS BIGINT), 100) AS key_cap,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_remap
    FROM customer
    WHERE c_custkey <= 200
    """,
)
def f5(spark: SparkSession, sf: str) -> DataFrame:
    """Reference scalar-core coverage with native Spark builtins:
    overlay (function/scalar/mod.rs core registry), nvl2, encode
    (encoding family), greatest/least, coalesce+nullif. The oracle
    spells overlay/nvl2 in portable SQL (substr concat / CASE)."""
    load_tables(spark, sf, "customer")
    return spark.sql(
        """
        SELECT c_custkey,
               overlay(c_name PLACING 'XX' FROM 10 FOR 2) AS overlaid,
               nvl2(nullif(c_mktsegment, 'BUILDING'), 'other_seg', 'building') AS nvl2_tag,
               CAST(octet_length(encode(c_name, 'UTF-8')) AS INTEGER) AS name_bytes,
               greatest(c_acctbal, 0.0) AS bal_floor,
               least(CAST(c_custkey AS BIGINT), 100) AS key_cap,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_remap
        FROM customer
        WHERE c_custkey <= 200
        """
    )
