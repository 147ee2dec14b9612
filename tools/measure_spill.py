"""Spill/memory evidence for the widest operators at 10x (round-4
verdict item 9): run x13's distributed block-pair all-pairs and x50's
within-cluster quadratic on a 10x embeddings corpus (20k vectors vs
sf0.1's 2k) and record per-stage shuffle bytes, spill bytes, and peak
execution memory from the Spark UI REST API.

Usage: python tools/measure_spill.py [n_vectors]
Prints one JSON line per operator; paste the results into SCALING.md.
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.load(r)


def stage_metrics(base: str, app_id: str, job_group: str) -> dict:
    jobs = rest(base, f"/api/v1/applications/{app_id}/jobs")
    stage_ids = set()
    for j in jobs:
        if j.get("jobGroup") == job_group:
            stage_ids.update(j.get("stageIds", []))
    out = {
        "n_stages": 0,
        "shuffle_read_mb": 0.0,
        "shuffle_write_mb": 0.0,
        "memory_spilled_mb": 0.0,
        "disk_spilled_mb": 0.0,
        "peak_execution_memory_mb": 0.0,
        "max_task_count": 0,
    }
    stages = rest(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    for s in stages:
        if s.get("stageId") not in stage_ids:
            continue
        out["n_stages"] += 1
        out["shuffle_read_mb"] += s.get("shuffleReadBytes", 0) / 1e6
        out["shuffle_write_mb"] += s.get("shuffleWriteBytes", 0) / 1e6
        out["memory_spilled_mb"] += s.get("memoryBytesSpilled", 0) / 1e6
        out["disk_spilled_mb"] += s.get("diskBytesSpilled", 0) / 1e6
        out["peak_execution_memory_mb"] = max(
            out["peak_execution_memory_mb"],
            s.get("peakExecutionMemory", 0) / 1e6,
        )
        out["max_task_count"] = max(out["max_task_count"], s.get("numTasks", 0))
    return {k: round(v, 1) if isinstance(v, float) else v for k, v in out.items()}


def _run_robust_stats(spark, n: int) -> int:
    """Exact per-key median/MAD over a 50x events fact (1M rows, 5
    keys): the deliberately-exact rank-window formulation behind t14's
    batch stats — the spill-relevant shape is the per-key fact sort."""
    from pyspark.sql import functions as F

    from wren_engine_spark.operators import metrics

    ev = spark.range(max(n * 50, 1_000_000)).select(
        F.concat(F.lit("type_"), (F.col("id") % 5).cast("string")).alias(
            "event_type"
        ),
        ((F.col("id") * 48271 % 99991).cast("double") / F.lit(100.0)).alias(
            "value"
        ),
    )
    return metrics.robust_stats(ev, "event_type", "value").count()


def _run_pq_lifecycle(spark, emb, d: str) -> int:
    """Full PQ lifecycle at 10x: train+encode the base corpus, append
    the delta with frozen codebooks, compact, probe codes-only."""
    from pyspark.sql import functions as F

    from wren_engine_spark.operators import similarity

    path = f"{d}/pq_lifecycle_idx"
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    similarity.write_pq_index(
        base, "vec_id", "embedding", path, n_subspaces=2, k_codes=4, iters=1
    )
    similarity.pq_index_append(spark, path, delta, "vec_id", "embedding")
    similarity.pq_index_compact(spark, path)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.pq_index_topk(spark, path, queries, topk=5).count()


def _run_ann_lifecycle(spark, emb) -> int:
    """LSH index append lifecycle at 10x: bucketed build on the base
    split, sidecar-parameterized append of the delta, one-shuffle
    probe across old + new rows (x105's shape)."""
    from pyspark.sql import functions as F

    from wren_engine_spark.operators import similarity

    base = emb.filter(F.col("vec_id") % 4 != 0)
    delta = emb.filter(F.col("vec_id") % 4 == 0)
    similarity.write_ann_index(
        base, "vec_id", "embedding", "spill_ann_app", dim=64, nbits=10, tables=4
    )
    similarity.ann_index_append(
        spark, "spill_ann_app", delta, "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 8)
    return similarity.ann_index_topk(
        spark, "spill_ann_app", q, "vec_id", "embedding", dim=64, k=3
    ).count()


def _run_simhash_lifecycle(spark, docs) -> int:
    """Simhash index append lifecycle at 10x: banded build on the base
    split, sidecar-parameterized append, broadcast-probe of the
    ingestion batch (x106's shape)."""
    from pyspark.sql import functions as F

    from wren_engine_spark.operators import dedup as dd

    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    a = corpus.filter(F.col("doc_id") % 3 != 0)
    b = corpus.filter(F.col("doc_id") % 3 == 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    dd.write_simhash_index(a, "text", "doc_id", "spill_simhash_app")
    dd.simhash_index_append(spark, "spill_simhash_app", b, "text", "doc_id")
    return dd.simhash_index_probe(
        spark, "spill_simhash_app", delta, "text", "doc_id", max_hamming=3
    ).count()


def _run_ivfpq_lifecycle(spark, emb, d: str) -> int:
    """Full IVF-PQ index lifecycle at 10x: train+encode the base
    corpus, append the delta against the frozen geometry, probe the
    codes-only scan across old + new rows (x109's shape)."""
    from pyspark.sql import functions as F

    from wren_engine_spark.operators import similarity

    path = f"{d}/ivfpq_lifecycle_idx"
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    similarity.write_ivfpq_index(
        base, "vec_id", "embedding", path, nlist=4, n_subspaces=2, k_codes=4
    )
    similarity.ivfpq_index_append(spark, path, delta, "vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.ivfpq_index_topk(
        spark, path, queries, nprobe=2, topk=5
    ).count()


def _run_retrain_lifecycle(spark, emb, d: str) -> int:
    """x118's shape at 10x: build on the base split, append the delta
    past the frozen geometry, retrain on the current corpus (staged
    sibling tree + two-rename swap), probe the retrained index."""
    from pyspark.sql import functions as F

    from wren_engine_spark.operators import similarity

    path = f"{d}/retrain_lifecycle_idx"
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    similarity.write_ivfpq_index(
        base, "vec_id", "embedding", path, nlist=4, n_subspaces=2, k_codes=4
    )
    similarity.ivfpq_index_append(spark, path, delta, "vec_id", "embedding")
    similarity.ivfpq_index_retrain(spark, path, emb, "vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.ivfpq_index_topk(
        spark, path, queries, nprobe=2, topk=5
    ).count()


def _run_delete_lifecycle(spark, emb, d: str) -> int:
    """Codes-layout delete lifecycle at 10x: build the PQ index on
    the full corpus, tombstone 1/7th, probe the anti-joined scan,
    compact (fold + clear), probe again (x112's shape)."""
    from pyspark.sql import functions as F

    from wren_engine_spark.operators import similarity

    path = f"{d}/pq_delete_idx"
    similarity.write_pq_index(
        emb, "vec_id", "embedding", path, n_subspaces=2, k_codes=4, iters=1
    )
    similarity.pq_index_delete(
        spark, path, emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    n1 = similarity.pq_index_topk(spark, path, queries, topk=5).count()
    similarity.pq_index_compact(spark, path)
    return n1 + similarity.pq_index_topk(spark, path, queries, topk=5).count()


def _run_bucketed_full_lifecycle(spark, emb) -> int:
    """Bucketed-family full lifecycle at 10x: build on the base
    split, append, tombstone-delete 1/6th, shuffle-free compact (one
    file per bucket, tombstones folded), probe (x116's shape)."""
    from pyspark.sql import functions as F

    from wren_engine_spark.operators import similarity

    base = emb.filter(F.col("vec_id") % 4 != 0)
    delta = emb.filter(F.col("vec_id") % 4 == 0)
    similarity.write_ann_index(
        base, "vec_id", "embedding", "spill_ann_lc", dim=64, nbits=10, tables=4
    )
    similarity.ann_index_append(
        spark, "spill_ann_lc", delta, "vec_id", "embedding"
    )
    similarity.ann_index_delete(
        spark, "spill_ann_lc",
        emb.filter(F.col("vec_id") % 6 == 0).select("vec_id"),
    )
    similarity.ann_index_compact(spark, "spill_ann_lc")
    q = emb.filter(F.col("vec_id") < 8)
    return similarity.ann_index_topk(
        spark, "spill_ann_lc", q, "vec_id", "embedding", dim=64, k=3
    ).count()


def _run_bm25_lifecycle(spark, docs) -> int:
    """Full BM25 index maintenance loop at 10x: build on a base split,
    append the rest, tombstone a seventh, compact both physical
    tables, probe — the x125 sequence on the Zipfian hot-term corpus."""
    from pyspark.sql import functions as F

    from wren_engine_spark.operators import retrieval

    base = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    retrieval.write_bm25_index(base, "text", "doc_id", "spill_bm25_life")
    retrieval.bm25_index_append(
        spark, "spill_bm25_life", delta, "text", "doc_id"
    )
    retrieval.bm25_index_delete(
        spark, "spill_bm25_life",
        docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"),
    )
    retrieval.bm25_index_compact(spark, "spill_bm25_life")
    return retrieval.bm25_index_probe(
        spark, "spill_bm25_life",
        docs.filter(F.col("doc_id") < 4).select("doc_id", "text"),
        "text", "doc_id", k=10,
    ).count()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    only = set(sys.argv[2:])  # optional: measure just the named ops
    from wren_engine_spark.operators import retrieval, similarity
    from wren_engine_spark.session import get_spark

    spark = get_spark(
        "spill_measure", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    base = sc.uiWebUrl
    app_id = sc.applicationId

    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0.0, 1.0) for _ in range(64)], i % 20) for i in range(n)
    ]
    d = tempfile.mkdtemp(prefix="spill10x_")
    spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    ).repartition(32).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    emb = spark.read.parquet(f"{d}/embeddings.parquet")

    # text twin at 10x (round 6): the widest NEW operator family —
    # x68's dedup-clustering + per-cluster quality argmax — on an
    # 80k-doc Zipfian corpus with a planted 50%-frequency trigram
    # (the documents analog of the 10x embeddings above)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from wren_engine_spark.operators import dedup as dd
    from wren_engine_spark.operators import text as tx

    rngt = random.Random(11)
    hot = "qqhot qqipf qqhead".split()
    drows = []
    for i in range(max(n * 4, 80_000)):
        toks = [f"w{rngt.randrange(5000)}" for _ in range(30)]
        if i % 2 == 0:
            p = rngt.randrange(27)
            toks[p : p + 3] = hot
        drows.append((i, " ".join(toks)))
    spark.createDataFrame(
        drows, "doc_id LONG, text STRING"
    ).repartition(32).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    docs = spark.read.parquet(f"{d}/documents.parquet")

    def run_x68():
        clusters = dd.duplicate_clusters(docs, "text", "doc_id")
        q = tx.quality_score(docs, "text", "doc_id")
        w = (
            W.partitionBy("cluster_id")
            .orderBy(F.col("quality_score").desc(), F.col("doc_id").asc())
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        )
        return (
            clusters.join(q, "doc_id")
            .select("doc_id", F.first("doc_id").over(w).alias("rep_id"))
            .count()
        )

    results = {}
    for name, fn in (
        (
            "x13_block_pair_exact",
            lambda: similarity.cosine_near_dup_pairs(
                emb, "vec_id", "embedding", threshold=0.35
            ).count(),
        ),
        (
            "x50_semantic_dedup",
            lambda: similarity.semantic_dedup(emb, "vec_id", "embedding").count(),
        ),
        ("x68_keep_best_clustering", run_x68),
        # round-6 batch 2/3 widest additions: the similarity-threshold
        # spectrum's wide (0.5) candidate net on the planted-skew
        # corpus, and the quantized Lloyd trainer on the 10x embeddings
        (
            "x76_wide_jaccard_pairs",
            lambda: dd.jaccard_pairs(
                docs, "text", "doc_id", n=3, threshold=0.5
            ).count(),
        ),
        (
            "x85_kmeans_quantized",
            lambda: similarity.kmeans_quantized(
                emb, "vec_id", "embedding", k=4, iters=2
            ).count(),
        ),
        # round-6 batch 4/6 widest additions: PQ train+encode+ADC on
        # the 10x embeddings, and the deliberately-exact per-key fact
        # sort behind the streaming anomaly scorer's batch stats
        (
            "x93_pq_ann",
            lambda: similarity.pq_topk(
                emb,
                "vec_id",
                "embedding",
                emb.filter(F.col("vec_id") < 8).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qvec"),
                ),
                n_subspaces=2,
                k_codes=4,
                iters=1,
                topk=5,
            ).count(),
        ),
        ("t14_robust_stats_fact_sort", lambda: _run_robust_stats(spark, n)),
        # round-7 widest additions: the full PQ index lifecycle
        # (build-on-base + frozen-codebook append + compaction + the
        # codes-only probe) on the 10x embeddings, and the bloom
        # decontamination screen on the 80k-doc corpus
        ("x100_pq_append_lifecycle", lambda: _run_pq_lifecycle(spark, emb, d)),
        (
            "x102_bloom_screen",
            lambda: tx.bloom_decontamination_screen(
                docs.filter(F.col("doc_id") % 10 != 0),
                docs.filter(F.col("doc_id") % 10 == 0),
                "text",
                "doc_id",
            ).count(),
        ),
        # round-8 additions: the bucketed-index append lifecycles and
        # the IVF-PQ composite trainer+probe on the 10x embeddings
        ("x105_ann_append_lifecycle", lambda: _run_ann_lifecycle(spark, emb)),
        (
            "x106_simhash_append_lifecycle",
            lambda: _run_simhash_lifecycle(spark, docs),
        ),
        ("x109_ivfpq_lifecycle", lambda: _run_ivfpq_lifecycle(spark, emb, d)),
        (
            "x107_ivfpq_ann",
            lambda: similarity.ivfpq_topk(
                emb,
                "vec_id",
                "embedding",
                emb.filter(F.col("vec_id") < 8).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qvec"),
                ),
                nlist=4,
                nprobe=2,
                n_subspaces=2,
                k_codes=4,
                coarse_iters=2,
                pq_iters=1,
                topk=5,
            ).count(),
        ),
        # round-8 late additions: tombstone-delete lifecycles for the
        # codes-layout and bucketed families, the attribute-filtered
        # probe, and hybrid lexical+vector RRF on the 80k/20k corpora
        (
            "x112_delete_lifecycle",
            lambda: _run_delete_lifecycle(spark, emb, d),
        ),
        (
            "x113_filtered_probe",
            lambda: (
                similarity.write_ann_index(
                    emb, "vec_id", "embedding", "spill_ann_filt",
                    dim=64, nbits=10, tables=4, attr_cols=["label"],
                ),
                similarity.ann_index_topk(
                    spark, "spill_ann_filt",
                    emb.filter(F.col("vec_id") < 8),
                    "vec_id", "embedding", dim=64, k=3, where="label < 10",
                ).count(),
            )[1],
        ),
        (
            "x114_hybrid_rrf",
            lambda: __import__(
                "wren_engine_spark.operators.retrieval", fromlist=["x"]
            ).hybrid_rrf_topk(
                docs, "doc_id", "text", emb, "vec_id", "embedding",
                docs.filter(F.col("doc_id") < 4).select("doc_id"),
                k_lex=10, k_vec=10, topk=5,
            ).count(),
        ),
        (
            "x116_bucketed_full_lifecycle",
            lambda: _run_bucketed_full_lifecycle(spark, emb),
        ),
        # one-pass nprobe tuner: all-cells ADC + np-spine replay over
        # ONE codes scan, exact side = brute-force quantized L2 over
        # the 10x corpus (the validation-set cost, not a serving path)
        (
            "x117_nprobe_tuner",
            lambda: (
                similarity.write_ivfpq_index(
                    emb, "vec_id", "embedding", f"{d}/tuner_idx",
                    nlist=4, n_subspaces=2, k_codes=4,
                ),
                similarity.ivfpq_tune_nprobe(
                    spark, f"{d}/tuner_idx", emb, "vec_id", "embedding",
                    emb.filter(F.col("vec_id") < 8).select(
                        F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("qvec"),
                    ),
                    topk=5,
                ).count(),
            )[1],
        ),
        # round-9 additions: the retrain lifecycle (build-on-base +
        # frozen-geometry append + retrain-on-current-corpus with the
        # staged swap) and the two-stage refined probe (ADC shortlist
        # broadcast into one narrow embedding-store scan)
        (
            "x118_retrain_lifecycle",
            lambda: _run_retrain_lifecycle(spark, emb, d),
        ),
        (
            "x119_refined_probe",
            lambda: (
                similarity.write_ivfpq_index(
                    emb, "vec_id", "embedding", f"{d}/refine_idx",
                    nlist=4, n_subspaces=2, k_codes=4,
                ),
                similarity.ivfpq_index_topk_refined(
                    spark, f"{d}/refine_idx", emb, "vec_id", "embedding",
                    emb.filter(F.col("vec_id") < 8).select(
                        F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("qvec"),
                    ),
                    nprobe=2, shortlist=20, topk=5,
                ).count(),
            )[1],
        ),
        # round-10 additions: the persisted BM25 inverted index on the
        # 80k-doc Zipfian corpus WITH the 50%-frequency planted trigram
        # (hot posting lists; max_df_frac left at 1.0 so the hot terms
        # stay — worst case for the probe). Build and probe measured in
        # SEPARATE job groups: the build pays the one deliberate
        # token-keyed exchange (bucketed write), the probe must show
        # ~zero shuffle (broadcast query terms into the bucketed scan,
        # df aggregate shuffle-free on the bucket distribution).
        (
            "x122_bm25_index_build",
            lambda: (
                retrieval.write_bm25_index(
                    docs, "text", "doc_id", "spill_bm25"
                ),
                spark.table("spill_bm25").count(),
            )[1],
        ),
        (
            "x122_bm25_index_probe",
            lambda: retrieval.bm25_index_probe(
                spark, "spill_bm25",
                docs.filter(F.col("doc_id") < 4).select("doc_id", "text"),
                "text", "doc_id", k=10,
            ).count(),
        ),
        (
            "x125_bm25_lifecycle",
            lambda: _run_bm25_lifecycle(spark, docs),
        ),
        (
            "x126_hybrid_index_probe",
            lambda: (
                similarity.write_ann_index(
                    emb, "vec_id", "embedding", "spill_ann_hyb",
                    dim=64, nbits=10, tables=4,
                ),
                retrieval.hybrid_index_rrf_topk(
                    spark, "spill_bm25", "spill_ann_hyb",
                    docs.filter(F.col("doc_id") < 4).select(
                        "doc_id", "text"
                    ),
                    emb.filter(F.col("vec_id") < 4).select(
                        "vec_id", "embedding"
                    ),
                    dim=64, topk=5,
                ).count(),
            )[1],
        ),
        # round-10 serving-stack completions. x127 is the widest new
        # shape — the pairwise stage materializes |corpus tokens| x
        # |query tokens| map-side rows (20k x 16 at 10x) with the
        # bounded query bag broadcast in; both aggregates must show
        # partial combine (exchanges carry (query, doc)-keyed partials
        # only). x130 is strictly narrower (candidate-pruned same
        # kernel) and x131 is O(k^2)-bounded per query, so x127 bounds
        # them both.
        (
            "x127_maxsim",
            lambda: retrieval.maxsim_topk(
                emb.select(
                    (F.col("vec_id") / 8).cast("long").alias("doc_id"),
                    F.col("embedding").alias("vec"),
                ),
                emb.filter(F.col("vec_id") < 16).select(
                    (F.col("vec_id") / 8).cast("long").alias("query_id"),
                    (F.col("vec_id") % 8).alias("tok_pos"),
                    F.col("embedding").alias("vec"),
                ),
                k=5,
            ).count(),
        ),
        # RM3: two full probe passes over the persisted posting store
        # (built by x122_bm25_index_build above) + the feedback-set
        # vocabulary aggregate — the probe-side worst case for the
        # lexical index: must stay broadcast-probe shaped both passes.
        (
            "x128_prf_probe",
            lambda: retrieval.bm25_index_prf_probe(
                spark, "spill_bm25",
                docs.filter(F.col("doc_id") < 4).select("doc_id", "text"),
                "text", "doc_id", k=10,
            ).count(),
        ),
        # snippets: per-doc token positions may only materialize for
        # hit docs (|hits| = |queries| x k), never corpus-wide.
        (
            "x129_snippets",
            lambda: retrieval.best_snippet(
                docs, "text", "doc_id",
                retrieval.bm25_index_probe(
                    spark, "spill_bm25",
                    docs.filter(F.col("doc_id") < 4).select(
                        "doc_id", "text"
                    ),
                    "text", "doc_id", k=10,
                ).select("query_id", "doc_id"),
                docs.filter(F.col("doc_id") < 4),
                "text", "doc_id",
            ).count(),
        ),
    ):
        if only and name not in only:
            continue
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        n_out = fn()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        m = stage_metrics(base, app_id, name)
        m.update({"op": name, "n_vectors": n, "rows_out": n_out, "wall_s": round(dt, 1)})
        results[name] = m
        print(json.dumps(m))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
