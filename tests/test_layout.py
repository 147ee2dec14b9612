"""Data-layout operators: bucketed co-located joins (shuffle-free plan)
and salted skew joins (identical results)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from wren_engine_spark.operators import layout


class TestBucketedJoin:
    @pytest.fixture(scope="class")
    def bucketed(self, spark):
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        layout.write_bucketed(orders, "orders_b", "o_orderkey", buckets=8)
        layout.write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b",
            "o_orderkey",
            buckets=8,
        )
        yield spark.table("orders_b"), spark.table("lineitem_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")

    def test_join_is_shuffle_free(self, spark, bucketed):
        o, l = bucketed
        # disable broadcast so the join exercises the bucketed SMJ path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = o.join(l, "o_orderkey").groupBy("o_orderpriority").count()
            # the only allowed exchange is for the final small aggregation
            n_before_agg = layout.shuffle_exchanges(o.join(l, "o_orderkey"))
            assert n_before_agg == 0, "bucketed join should not shuffle"
            assert joined.count() > 0
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )

    def test_unbucketed_join_does_shuffle(self, spark):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
            l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            )
            assert layout.shuffle_exchanges(o.join(l, "o_orderkey")) >= 2
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )


class TestSaltedJoin:
    def test_inner_matches_plain(self, spark):
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
            "c_custkey", "c_mktsegment"
        ).withColumnRenamed("c_custkey", "o_custkey")
        plain = o.join(c, "o_custkey").groupBy("c_mktsegment").count()
        salted = (
            layout.salted_join(o, c, "o_custkey", salts=8)
            .groupBy("c_mktsegment")
            .count()
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_left_keeps_unmatched(self, spark):
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        nobody = o.sparkSession.createDataFrame(
            [(int(-1), "x")], "o_custkey LONG, tag STRING"
        )
        out = layout.salted_join(o, nobody, "o_custkey", how="left", salts=4)
        assert out.count() == o.count()
        assert out.filter(F.col("tag").isNotNull()).count() == 0


class TestOptimizedWriter:
    def test_partitioned_sorted_layout(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        path = str(tmp_path / "docs_opt")
        layout.write_optimized(
            docs, path, partition_cols="source", sort_cols="n_chars",
            max_records_per_file=200,
        )
        # hive partition directories exist
        part_dirs = glob.glob(f"{path}/source=*")
        assert len(part_dirs) == docs.select("source").distinct().count()
        # rows inside every file are clustered on the sort column, so
        # row-group min/max stats are selective
        for f in glob.glob(f"{path}/source=*/*.parquet"):
            vals = pq.read_table(f, columns=["n_chars"])["n_chars"].to_pylist()
            assert vals == sorted(vals)

    def test_partition_pruning_on_read(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        path = str(tmp_path / "docs_pruned")
        layout.write_optimized(docs, path, partition_cols="source")
        src = docs.select("source").first()[0]
        back = spark.read.parquet(path).filter(F.col("source") == src)
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert f"PartitionFilters: [isnotnull(source" in plan
        assert back.count() == docs.filter(F.col("source") == src).count()
