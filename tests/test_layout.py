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


class TestZorderWrite:
    def test_files_cover_compact_rectangles(self, spark, tmp_path):
        """Z-order clustering: each output file's (min,max) span on BOTH
        dimensions shrinks vs the unsorted layout, so parquet min/max
        stats skip files for predicates on either column."""
        import glob

        import pyarrow.parquet as pq

        raw = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey",
            F.col("o_custkey").alias("ck0"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("ed0"),
        )
        lo_ck, hi_ck, lo_ed, hi_ed = raw.agg(
            F.min("ck0"), F.max("ck0"), F.min("ed0"), F.max("ed0")
        ).first()
        # quantize both dims onto the full 12-bit space so every
        # interleaved bit carries information (see zorder_quantize)
        orders = raw.select(
            "o_orderkey",
            layout.zorder_quantize("ck0", lo_ck, hi_ck, 12).alias("ck"),
            layout.zorder_quantize("ed0", lo_ed, hi_ed, 12).alias("ed"),
        )

        def spans(path):
            out = []
            for f in glob.glob(f"{path}/*.parquet"):
                t = pq.read_table(f, columns=["ck", "ed"])
                ck, ed = t["ck"].to_pylist(), t["ed"].to_pylist()
                if ck:
                    out.append(
                        (max(ck) - min(ck), max(ed) - min(ed))
                    )
            return out

        zpath = str(tmp_path / "z")
        rpath = str(tmp_path / "r")
        layout.zorder_write(orders, zpath, ["ck", "ed"], bits=12, n_files=8)
        orders.repartition(8).write.mode("overwrite").parquet(rpath)

        zs, rs = spans(zpath), spans(rpath)
        z_ck = sum(s[0] for s in zs) / len(zs)
        z_ed = sum(s[1] for s in zs) / len(zs)
        r_ck = sum(s[0] for s in rs) / len(rs)
        r_ed = sum(s[1] for s in rs) / len(rs)
        # random layout: every file spans ~the full range of both dims.
        # z-order: average per-file span must shrink on BOTH dims.
        assert z_ck < r_ck * 0.8, (z_ck, r_ck)
        assert z_ed < r_ed * 0.8, (z_ed, r_ed)

    def test_roundtrip_preserves_rows(self, spark, tmp_path):
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
            "o_orderkey",
            (F.col("o_custkey") % 4096).alias("ck"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("ed"),
        )
        path = str(tmp_path / "z2")
        layout.zorder_write(orders, path, ["ck", "ed"], bits=12, n_files=4)
        back = spark.read.parquet(path)
        assert back.count() == orders.count()
        assert set(back.columns) == {"o_orderkey", "ck", "ed"}
