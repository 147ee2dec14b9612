"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on sf0.001
queries()     -> every implemented operator (SURVEY.md §2 + north-star
                 extensions), as (spark, sf_dir) -> DataFrame, ordered
                 so the external gate's first-50 window always covers
                 (1) queries without a passing driver row from any
                 earlier round (CORRECTNESS_r*.json) and (2) queries
                 whose IMPLEMENTATION changed since their last green
                 row — per-query module-closure fingerprints
                 (queries/fingerprints.py) against the records in
                 QUERY_FINGERPRINTS.json, refreshed at round start by
                 tools/update_query_fingerprints.py. A rewrite can't
                 coast on a stale green from its old code.
oracle_sql()  -> DuckDB-equivalent SQL per query. ONE omission — x14
                 (Lloyd k-means training, irreducibly iterative; its
                 probe path has the bit-exact oracle-green twin x55
                 and a full-probe==brute-force pytest guarantee). The
                 simhash queries (x5/x17) register the engine-PORTABLE
                 polynomial hash and are bit-exact oracle-checked; the
                 xxhash64 variants remain library functions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary at sf0.001."""
    from wren_engine_spark.queries.registry import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wren_engine_spark.queries.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from wren_engine_spark.queries.registry import ORACLES

    return dict(ORACLES)
