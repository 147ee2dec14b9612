"""Skew/scale soak for the dedup pipeline (round-3 verdict item 7).

Runs the x3/x44 shapes on a deliberately Zipfian corpus — one shingle
planted in 50% of documents — and measures ACTUAL per-task row counts
(spark_partition_id(), one partition == one task) instead of trusting
plan shape alone. The properties asserted are exactly the 100 TB design
claims:

  1. the doc-frequency aggregation's OUTPUT is balanced (map-side
     combine means the reduce side sees distinct shingles, so the hot
     shingle is one row, not its occurrence list);
  2. the frequency join-back CAN be split by AQE's skew-join handling
     (the hot key's rows spread over several tasks), which a
     count()-over-window never can — the comparative sub-test shows the
     window physically serializes the hot key into a single task;
  3. the full x3 / x44 operators complete on the skewed corpus and
     still find the planted duplicates.
"""

import random

import pytest
from pyspark.sql import functions as F

from wren_engine_spark.operators import dedup, text


N_DOCS = 8000
HOT = "zzhot zzipf zzhead"  # the planted hot trigram
HOT_DOCS = N_DOCS // 2


@pytest.fixture(scope="module")
def skewed(spark):
    """~8k docs x 30 tokens; the HOT trigram appears at a random offset
    in every even doc (50% document frequency); docs 0/1 and 2/3 are
    planted near-duplicate pairs."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(5000)]
    rows = []
    for i in range(N_DOCS):
        toks = [vocab[rng.randrange(5000)] for _ in range(30)]
        if i % 2 == 0:
            p = rng.randrange(27)
            toks[p:p + 3] = HOT.split()
        rows.append((i, " ".join(toks)))
    # planted near-dups: 1 differing token out of 30
    for a, b in ((0, 1), (2, 3)):
        t = rows[a][1].split()
        t[-1] = rows[b][1].split()[-1]
        rows[b] = (b, " ".join(t))
    return spark.createDataFrame(rows, "doc_id LONG, text STRING").cache()


def partition_rows(df):
    sizes = (
        df.select(F.spark_partition_id().alias("p"))
        .groupBy("p").count().collect()
    )
    return sorted(r["count"] for r in sizes)


class TestDocFrequencySkew:
    def test_freq_agg_output_balanced(self, spark, skewed):
        # the reduce side of groupBy(shingle).count() holds DISTINCT
        # shingles: the hot shingle is one row, so no partition can be
        # a straggler even with a 50%-doc-frequency key
        sh = dedup.shingle_arrays(skewed, "text", "doc_id", 3).select(
            "doc_id", F.explode("__sh").alias("shingle")
        )
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sizes = partition_rows(freq)
        assert sizes[-1] <= 3 * sizes[len(sizes) // 2]
        hot = freq.filter(F.col("shingle") == HOT).collect()
        # 50% of docs + the 2 planted near-dup copies of hot docs
        assert hot and hot[0]["df"] == HOT_DOCS + 2

    def test_broadcast_head_mode_has_no_hot_task_but_shuffle_modes_do(
        self, spark, skewed
    ):
        """The design-deciding comparison on the SAME hot key:

        - count() OVER (PARTITION BY shingle): the hot shingle's whole
          occurrence list is structurally pinned to ONE task;
        - groupBy+join (freq_mode='exact'): better (combinable agg),
          but the join-back still concentrates the hot key — and AQE's
          skew split cannot rescue it, because the rule only matches
          plain two-shuffle SMJ children, not Sort(HashAgg(Shuffle));
        - freq_mode='broadcast_head': no shuffle on the shingle key at
          all, so the hot key's rows stay spread across the scan's
          partitions — per-task balance independent of skew.
        """
        from pyspark.sql import Window as W

        sh = dedup.shingle_arrays(skewed, "text", "doc_id", 3).select(
            "doc_id", F.explode("__sh").alias("shingle")
        )
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))

        win = sh.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
        wsizes = partition_rows(win)
        assert wsizes[-1] >= HOT_DOCS, wsizes[-5:]  # window: pinned

        exact = sh.join(freq, "shingle")
        esizes = partition_rows(exact)
        assert esizes[-1] >= HOT_DOCS, esizes[-5:]  # shuffle join: pinned too

        head = freq.filter(F.col("__df") > 64).withColumnRenamed("__df", "__hdf")
        bcast = sh.join(F.broadcast(head), "shingle", "left")
        bsizes = partition_rows(bcast)
        # broadcast mode: per-task rows track the scan's (uniform)
        # distribution — no partition carries the hot-key pileup the
        # shuffle modes show, and balance holds regardless of skew
        assert bsizes[-1] <= 1.5 * bsizes[len(bsizes) // 2], bsizes[-5:]
        assert bsizes[-1] < bsizes[len(bsizes) // 2] + HOT_DOCS, bsizes[-5:]

    def test_x47_plan_shingle_shuffles_are_combinable_only(self, spark, skewed):
        """The skew-proof mode's invariant: the RAW exploded shingle set
        never shuffles on the shingle key. Every shingle-keyed Exchange
        remaining in the plan must be fed by a partial (map-side
        combinable) aggregate — where the hot shingle is at most one
        row per map partition — and the frequency attach itself must be
        a broadcast hash join. Since round 5 broadcast_head IS the
        operator default, so this covers the registered x3 entry
        point's actual plan — no explicit freq_mode."""
        df = dedup.jaccard_pairs(skewed, "text", "doc_id", n=3, threshold=0.8)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin [shingle" in plan  # the freq attach
        lines = plan.splitlines()
        found = 0
        for i, l in enumerate(lines):
            if "Exchange hashpartitioning(shingle" in l:
                found += 1
                tail = "\n".join(lines[i + 1:i + 3])
                assert "partial_count" in tail, l.strip()[:120]
        assert found >= 1  # the frequency aggregation's own shuffle

    def test_x3_both_modes_identical_on_skewed_corpus(self, spark, skewed):
        exact = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in dedup.jaccard_pairs(
                skewed, "text", "doc_id", n=3, threshold=0.8,
                freq_mode="exact",
            ).collect()
        }
        skewproof = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in dedup.jaccard_pairs(
                skewed, "text", "doc_id", n=3, threshold=0.8,
                freq_mode="broadcast_head",
            ).collect()
        }
        # prefix ordering differs but the theorem guarantees the same
        # verified output
        assert exact == skewproof
        assert (0, 1) in exact and (2, 3) in exact


class TestPassageSkew:
    def test_x44_end_to_end_with_hot_passage(self, spark, skewed):
        """30% of docs share one 16-token passage at arbitrary offsets:
        the hash-window groupBy must complete (8-byte keys; the distinct
        aggregation's map-side partial dedup bounds the hot window to
        one row per sharing doc) and report those docs as covered."""
        passage = " ".join(f"p{i}" for i in range(16))
        share = skewed.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 < 3,
                F.concat_ws(" ", F.lit(passage), F.col("text")),
            ).otherwise(F.col("text")),
        )
        out = {
            r.doc_id: r
            for r in text.repeated_passages(share, "text", "doc_id", 16).collect()
        }
        sharing = [d for d in out if d % 10 < 3]
        assert sharing and all(out[d].n_shared_positions >= 1 for d in sharing)


class TestAqeSkewJoinSplit:
    def test_hot_key_partition_is_split_at_runtime(self, spark):
        """AQE's runtime skew-join split: a join partition holding a hot
        key gets divided across tasks AFTER the shuffle-size statistics
        arrive — the runtime complement to the explicit salted_join.
        Thresholds are scaled to testdata (defaults engage at 256MB);
        the payload is hash-valued because skew detection reads
        COMPRESSED shuffle sizes, and a constant-key partition of
        compressible rows hides from it (observed: lz4 shrinking the
        hot partition below threshold -> coalesce instead of split)."""
        saved = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.autoBroadcastJoinThreshold",
            )
        }
        try:
            spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
            )
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            fact = spark.range(0, 400000).select(
                F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
                F.xxhash64("id").alias("val"),
            )
            dim = spark.range(0, 400000).select(
                F.col("id").alias("k"), F.xxhash64("id", "id").alias("tag")
            )
            j = fact.join(dim, "k").select("k", "val", "tag")
            n = len(j.collect())
            assert n == 400000  # split must not change the result
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "SortMergeJoin(skew=true)" in plan
            assert "skewed" in plan  # the AQEShuffleRead doing the split
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
