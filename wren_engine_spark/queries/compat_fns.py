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
from wren_engine_spark.queries.registry import load_tables, register


@register(
    "f3_compat_datetime_json",
    """
    SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS bucket,
           strftime(time_bucket(INTERVAL 15 MINUTE, ts), '%Y-%m-%d %H:%M') AS bucket_label,
           COUNT(*) AS n_events,
           SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k
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
