"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "sf": ...,
plus sub-suite totals}. The line is deliberately COMPACT (totals only):
r5's line carried per-query dicts, outgrew the driver's stdout capture,
and the round's bench artifact recorded parsed:null. Per-query medians
and per-run totals are written to BENCH_DETAIL.json and echoed on
stderr instead.

Timing = full query build + execution to a driver-side count/collect
(small results are collected, row-heavy outputs counted), matching how
the engine would be used. A warmup pass initializes the JVM/parquet
footers so the numbers measure steady-state execution, not JVM startup.
The headline suite runs $SPARK_GRAFT_BENCH_RUNS times (default 3,
caches cleared between runs); per-query numbers are MEDIANS and the
JSON carries every run's total so box noise is visible in the artifact
itself.

Round-9 harness fix (r8 verdict item 2): the one-query warmup left
run 1 paying whole-stage-codegen compilation for every OTHER headline
query (r8 run_totals [29.3, 16.6, 13.6] — the 29 s JVM warm-up
polluted the 3-run stat and dragged every round's headline mean). The
two round-over-round comparators (headline, TPC-H) now run one FULL
discarded warm-up pass before the N recorded runs; the discarded
total is still written to the artifact (warmup_total_s /
tpch_warmup_total_s) so cold-start cost stays visible without
poisoning the trend statistic.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: mix of scans+aggs, joins, windows, semantic layer, and
# the LLM-pipeline operators (the expensive ones define our throughput)
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q9_product_type_profit",
    "q10_returned_items",
    "q18_large_volume_customer",
    "q21_suppliers_kept_waiting",
    "w2_running_customer_total",
    "w5_rank_family",
    "g1_rollup_revenue",
    "d1_distinct_aggregates",
    "j2_correlated_above_avg",
    "sem3_calc_to_many",
    "sem7_semantic_join_query",
    "a4_map_struct_ops",
    "f3_compat_datetime_json",
    "x1_exact_dedup",
    "x3_ngram_jaccard_pairs",
    "x6_token_stats",
    "x9_cosine_topk",
    "x13_embedding_near_dup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from wren_engine_spark.queries.registry import QUERIES
    from wren_engine_spark.session import get_spark

    spark = get_spark("bench")

    # Median of N runs (round-3 verdict: single-run numbers on a shared
    # box drift ±10-30%; the artifact of record must carry its own
    # variance). Caches are cleared between runs so every run measures
    # the cold path the driver compares round-over-round.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    per_query: dict[str, list[float]] = {n: [] for n in HEADLINE}
    per_plan: dict[str, list[float]] = {n: [] for n in HEADLINE}
    run_totals: list[float] = []
    warmup_total_s = 0.0
    # run 0 is a full DISCARDED warm-up pass: it pays whole-stage
    # codegen + parquet footers for every headline query so the N
    # recorded runs measure steady-state execution only
    for run in range(n_runs + 1):
        warm = run == 0
        spark.catalog.clearCache()
        run_total = 0.0
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)  # build: construction / semantic rewrite
            t1 = time.perf_counter()
            n = df.count()
            dt = time.perf_counter() - t0
            run_total += dt
            if warm:
                continue
            per_plan[name].append((t1 - t0) * 1000)
            per_query[name].append(dt)
            if run == 1:
                print(f"# {name}: {dt:.3f}s ({n} rows, plan {(t1-t0)*1000:.0f}ms)",
                      file=sys.stderr)
        if warm:
            warmup_total_s = round(run_total, 3)
            print(f"# warm-up run (discarded): {run_total:.3f}s", file=sys.stderr)
        else:
            run_totals.append(round(run_total, 3))
            print(f"# run {run}/{n_runs}: {run_total:.3f}s", file=sys.stderr)

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        return s[len(s) // 2]

    timings = {n: round(med(v), 3) for n, v in per_query.items()}
    plan_ms = {n: round(med(v), 1) for n, v in per_plan.items()}
    total = round(sum(timings.values()), 3)
    mean_plan = round(sum(plan_ms.values()) / len(plan_ms), 1)

    # Sub-suites use the SAME median-of-N methodology as the headline
    # (round-4 verdict item 3: the single-pass tpch number drifted +16%
    # while every TPC-H query inside the median headline got faster —
    # artifact-vs-noise). Sum of per-query medians, run totals recorded.
    #
    # Growth bound (round-6 verdict item 3): the operator sub-suites
    # grow every round and the full bench was ~10 min and climbing —
    # the same slow-creep failure mode as the r5 JSON line. Sub-suite
    # entries are therefore FROZEN behind their implementation
    # fingerprint (queries/fingerprints.py, the driver-window
    # mechanism): an entry re-measures only when its fingerprint or
    # the bench SF changed since its last recorded median; otherwise
    # the committed BENCH_FROZEN.json median carries forward, so every
    # sub-suite total stays present in the contract line for trend
    # while wall-time scales with what actually changed. The headline
    # and TPC-H suites are NEVER frozen — they are the
    # round-over-round throughput comparators.
    frozen_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FROZEN.json"
    )
    try:
        with open(frozen_path, encoding="utf-8") as f:
            frozen: dict[str, dict] = json.load(f)
    except Exception:
        frozen = {}

    from wren_engine_spark.queries import fingerprints as _fp

    cur_fp = _fp.current_fingerprints(
        {n: (fn.__module__, fn.__name__) for n, fn in QUERIES.items()}
    )

    # Rotating thaw (round-10 verdict item 2): a frozen median is builder-box
    # data the driver never re-measured. Every bench run now additionally
    # re-measures the SPARK_GRAFT_BENCH_THAW_N (default 2) least-recently
    # measured frozen entries — records carry a monotone "seq" stamped at
    # measurement time, oldest seq thaws first (records predating the seq
    # field count as oldest) — so over rounds the whole frozen set rotates
    # through fresh driver-visible measurements. The thawed entries' names
    # and fresh medians are surfaced in the contract line ("thawed") next to
    # the run's own mean_plan_ms canary. Additions-only: methodology,
    # freeze keying, and every existing field are unchanged.
    thaw_n = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_THAW_N", "2")))
    seq_meta = frozen.setdefault("__meta__", {})
    run_seq = int(seq_meta.get("seq", 0)) + 1
    seq_meta["seq"] = run_seq

    def _fkey(n: str) -> str:
        return f"{sf_dir}|{n}"

    _fresh = {
        n for n in QUERIES
        if frozen.get(_fkey(n), {}).get("fp") != cur_fp.get(n)
    }
    _frozen_entries = sorted(
        (
            (frozen[_fkey(n)].get("seq", -1), n)
            for n in QUERIES
            if _fkey(n) in frozen and n not in _fresh
        ),
    )
    thaw_names = {n for _, n in _frozen_entries[:thaw_n]}
    thawed_out: dict[str, float] = {}

    def run_suite(
        names: list[str],
        label: str,
        freeze: bool = False,
        warmup: bool = False,
    ):
        # frozen records key on (sf_dir, entry): a one-off bench run at
        # another SF adds records instead of clobbering the committed
        # sf0.1 trend medians
        def fkey(n: str) -> str:
            return f"{sf_dir}|{n}"

        if freeze:
            stale = [
                n for n in names
                if frozen.get(fkey(n), {}).get("fp") != cur_fp[n]
                or n in thaw_names
            ]
        else:
            stale = list(names)
        per: dict[str, list[float]] = {n: [] for n in stale}
        totals: list[float] = []
        warm_total = None
        if warmup and stale:
            # discarded codegen warm-up pass (round-9 harness fix) —
            # only for the round-over-round comparator suites
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            for name in stale:
                QUERIES[name](spark, sf_dir).count()
            warm_total = round(time.perf_counter() - t0, 3)
            print(f"# {label} warm-up run (discarded): {warm_total:.3f}s",
                  file=sys.stderr)
        for _run in range(n_runs if stale else 0):
            spark.catalog.clearCache()
            tot = 0.0
            for name in stale:
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                per[name].append(dt)
                tot += dt
            totals.append(round(tot, 3))
        meds: dict[str, float] = {}
        for n in names:
            if n in per:
                meds[n] = round(med(per[n]), 3)
                if freeze:
                    frozen[fkey(n)] = {
                        "fp": cur_fp[n],
                        "med_s": meds[n],
                        # measurement-time provenance: rotation order +
                        # the same-run driver-CPU canary (headline
                        # plan-build mean) so a frozen median is always
                        # readable next to the box state it was taken on
                        "seq": run_seq,
                        "canary_plan_ms": mean_plan,
                    }
                    if n in thaw_names:
                        thawed_out[n] = meds[n]
            else:
                meds[n] = frozen[fkey(n)]["med_s"]
        total = round(sum(meds.values()), 3)
        print(
            f"# {label}: {total:.1f}s ({len(stale)}/{len(names)} measured,"
            f" runs: {totals})",
            file=sys.stderr,
        )
        # `totals` covers ONLY the re-measured subset; `stale` makes
        # the artifact self-describing so a partial-run total is never
        # misread as a whole-suite trend point
        return meds, total, totals, stale, warm_total

    # round-4 operator sub-suite: separate total so the HEADLINE stays
    # comparable round-over-round while new operators still get a
    # recorded per-round number
    EXT = [
        "x48_dsir_importance",
        "x50_semantic_dedup",
        "x51_audio_decode",
        "x52_lm_cross_entropy",
        "x53_gopher_rules",
        "x54_curation_provenance",
        "x56_neardup_decontamination",
    ]
    ext_timings, ext_total, ext_runs, ext_measured, _ = run_suite(
        EXT, "r4 operator sub-suite", freeze=True
    )

    # round-5 watch set: cube pre-agg routing, the ANN signature paths
    # (vectorization target — per-round numbers make the trend visible),
    # and the ship-to-trainer closers. x63 is excluded: its cold time is
    # dominated by the one-time index BUILD, which a timed loop would
    # mis-report as probe cost.
    R5 = [
        "sem8_cube_drill",
        "x11_lsh_ann",
        "x55_ivf_probe_portable",
        "x64_leakage_safe_split",
        "x65_shard_assignments",
        "t12_stream_point_in_time_join",
    ]
    r5_timings, r5_total, r5_runs, r5_measured, _ = run_suite(
        R5, "r5 operator sub-suite", freeze=True
    )

    # round-6 additions: derived-AVG cube drill, keep-best dedup,
    # collocation lift, persisted-simhash incremental probe (batch +
    # streaming twins). x70/t13's first call pays the one-time index
    # build; like every suite, median-of-3 amortizes it to steady state
    # by construction of the median.
    R6 = [
        "sem9_cube_avg_drill",
        "x68_cluster_best_representative",
        "x69_bigram_lift",
        "x70_incremental_simhash_probe",
        "t13_stream_incremental_dedup_probe",
        "x71_mixing_schedule",
        "x72_repetition_schedule",
        "x73_ingest_decisions",
        "x74_count_min_estimates",
        "x75_quality_floor",
        "m6_linear_interpolation",
        # batch 2: x76 is the wide-net (threshold 0.5) jaccard spectrum —
        # inherently the priciest entry here because PPJoin's prefix
        # filter weakens as the threshold drops; the rest are narrow
        # single-shuffle analytics
        "x76_similarity_histogram",
        "x77_dedup_scope_policy",
        "x78_budget_trim",
        "x79_hard_negatives",
        "x80_embedding_dim_stats",
        # batch 3: RAG/curation closers + per-series EWMA
        "x81_rag_chunking",
        "x82_oov_rate",
        "x83_boilerplate_prefix",
        "x84_curriculum_deciles",
        "m7_ewma",
        # quantized Lloyd training: two distributed assign+update
        # cycles with k*dim driver barriers (bit-exact oracle twin of
        # the float x14 trainer)
        "x85_kmeans_quantized",
        # span-level decontamination pair: locate leaked 8-token spans
        # (broadcast held-out probe), then excise them in-row
        "x86_contamination_spans",
        "x87_surgical_decontamination",
        # batch 4: robust series analytics + retrieval/corpus hygiene
        "m8_robust_anomaly",
        "m9_holt_forecast",
        "x88_diverse_topk",
        "x89_encoding_health",
        "x90_key_skew_profile",
        # batch 5: seasonality, calibrated quality, streaming anomaly
        # alerts (lambda pattern: batch stats + stateless stream score),
        # decontamination impact rollup
        "m10_seasonality_profile",
        "x91_quality_calibration",
        "t14_stream_anomaly_alerts",
        "x92_decontamination_report",
        # batch 6: product-quantization ANN (codebook train + encode +
        # ADC lookup scoring) and its recall gate vs the exact scan
        "x93_pq_ann",
        "x94_pq_recall",
        # batch 7: layout/observability closers — ring-vs-mod reshard
        # movement, cluster-size histogram, vocab coverage curve,
        # split-leakage audit
        "x95_reshard_movement",
        "x96_cluster_size_histogram",
        "x97_vocab_coverage",
        "x98_split_leakage_audit",
        # persisted-PQ probe: first call pays the one-time index
        # build; the median amortizes it to steady state (x70/t13's
        # convention)
        "x99_pq_index_probe",
        # streaming vector search against the persisted PQ index
        # (online-RAG shape; availableNow replay)
        "t15_stream_vector_search",
    ]
    r6_timings, r6_total, r6_runs, r6_measured, _ = run_suite(
        R6, "r6 operator sub-suite", freeze=True
    )

    # round-7 additions: trained-IVF on the quantized Lloyd trainer
    # (retired from rows-only) and the PQ index lifecycle
    R7 = [
        "x14_ivf_ann",
        # PQ index lifecycle: append with frozen codebooks, then the
        # compacted probe (memoized build — median amortizes to the
        # steady-state probe, x70/x99's convention)
        "x100_pq_index_append",
        "x101_pq_index_compact",
        # streaming ingestion into the same index family (foreachBatch)
        "t16_stream_index_append",
        # constant-size bloom screen: join-free decontamination pre-pass
        "x102_bloom_decontamination_screen",
        # perceptual image hash over real decoded BMP pixels
        "x103_image_ahash",
        # energy-delta audio fingerprint over real decoded PCM
        "x104_audio_fingerprint",
    ]
    r7_timings, r7_total, r7_runs, r7_measured, _ = run_suite(
        R7, "r7 operator sub-suite", freeze=True
    )

    # round-8 additions: append lifecycles for the bucketed index
    # families (memoized build+append — the median amortizes to the
    # steady-state probe, x70/x99's convention) and the IVF-PQ
    # composite (memoized training shared by x107/x108, the x94/x99
    # convention)
    R8 = [
        "x105_ann_index_append",
        "x106_simhash_index_append",
        "x107_ivfpq_ann",
        "x108_ivfpq_recall",
        "x109_ivfpq_index_probe",
        "x110_ivfpq_index_append",
        "t17_stream_ivfpq_ingest",
        "x111_ivfpq_index_compact",
        # vector-serving completeness: tombstone-deleted probe,
        # attribute-filtered probe (PushedFilters into the bucketed
        # scan), hybrid lexical+vector RRF fusion
        "x112_pq_index_delete",
        "x113_filtered_ann_probe",
        "x114_hybrid_rrf",
        # bucketed-family delete + full lifecycle (build/append/
        # delete/compact) — memoized builds, median amortizes to the
        # steady-state probe
        "x115_ann_index_delete",
        "x116_ann_index_lifecycle",
        # one-pass recall-targeted nprobe auto-tuner over x109's index
        "x117_ivfpq_tune_nprobe",
    ]
    r8_timings, r8_total, r8_runs, r8_measured, _ = run_suite(
        R8, "r8 operator sub-suite", freeze=True
    )

    # round-9 addition: the tuner->retrain loop closer (build + append
    # + tune + retrain all pay on the first run; the median amortizes
    # to the steady-state probe, the lifecycle suites' convention)
    R9 = [
        "x118_ivfpq_index_retrain",
        # two-stage serving: ADC shortlist -> exact re-rank over the
        # embedding store (shares x109's persisted index)
        "x119_ivfpq_refined_probe",
        # deterministic BM25 (quantized micro-unit contributions)
        "x120_bm25_topk",
    ]
    r9_timings, r9_total, r9_runs, r9_measured, _ = run_suite(
        R9, "r9 operator sub-suite", freeze=True
    )

    # round-10 additions: BM25 composed into the hybrid RRF (the
    # production RAG fusion — quantized-cosine + BM25 legs, integer-rank
    # RRF) and the persisted lexical-index lifecycle (build/probe/
    # append/delete/compact + streaming ingest; memoized builds, median
    # amortizes to the steady-state probe, the index suites' convention)
    R10 = [
        "x121_hybrid_rrf_bm25",
        # persisted BM25 inverted-index lifecycle (build memoized —
        # the median amortizes to the steady-state probe, the index
        # suites' convention)
        "x122_bm25_index_probe",
        "x123_bm25_index_append",
        "x124_bm25_index_delete",
        "x125_bm25_index_lifecycle",
        "t18_stream_bm25_ingest",
        # hybrid RRF served entirely from the two persisted indexes
        "x126_hybrid_index_rrf",
        # serving-stack completions: late-interaction MaxSim scoring,
        # RM3 pseudo-relevance feedback (two-pass expansion over the
        # posting store), best-window snippets over ranked hits
        "x127_maxsim_topk",
        "x128_bm25_prf_probe",
        "x129_snippets",
        # two-stage late interaction (ANN candidates -> MaxSim rescore)
        # and the MMR diversity re-rank (applyInPandas sequential pick)
        "x130_pruned_maxsim",
        "x131_mmr_diversify",
        # ranking-quality eval (recall@k/MRR/nDCG of the BM25 leg vs
        # the exact cosine truth — bounded top-k inputs, trivially fast)
        "x132_retrieval_eval",
        # the eval->tune loop: rrf_k swept by mean nDCG vs exact truth
        "x133_rrf_tune",
    ]
    r10_timings, r10_total, r10_runs, r10_measured, _ = run_suite(
        R10, "r10 operator sub-suite", freeze=True
    )

    # persist the fingerprint-gated medians so the next bench run only
    # re-measures entries whose implementation actually changed
    with open(frozen_path, "w") as f:
        json.dump(frozen, f, indent=1, sort_keys=True)
        f.write("\n")

    # full TPC-H suite (22 adapted queries) as a secondary throughput
    # metric — the reference's correctness corpus is TPC-H, so this is
    # the closest apples-to-apples execution number
    tpch = sorted(n for n in QUERIES if n[0] == "q" and n[1].isdigit())
    tpch_timings, tpch_total, tpch_runs, _, tpch_warmup_total = run_suite(
        tpch, f"tpch suite ({len(tpch)} queries)", warmup=True
    )

    # semantic-rewrite planning latency (BASELINE.md bar: <= ~10 ms/query
    # for the MDL->Spark-plan rewrite, reference planning-latency envelope
    # wren-core/benchmarks/README.md:62-84). Measured on a deployed
    # engine: SQL text -> analyzed DataFrame, no execution.
    from wren_engine_spark.queries.semantic import deploy

    eng = deploy(spark, sf_dir)
    rewrite_sql = (
        "SELECT n.name, SUM(o.totalprice) AS rev, COUNT(*) AS n_orders "
        "FROM orders_m o JOIN customer_m c ON o.custkey = c.custkey "
        "JOIN nation_m n ON c.nation_key = n.nationkey GROUP BY n.name"
    )
    eng.sql(rewrite_sql)  # warm
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        eng.sql(rewrite_sql, use_plan_cache=False)  # cold: full parse+analyze
        lat.append((time.perf_counter() - t0) * 1000)
    lat.sort()
    semantic_plan_ms = round(lat[len(lat) // 2], 2)
    lat_cached = []
    for _ in range(20):
        t0 = time.perf_counter()
        eng.sql(rewrite_sql)  # steady state: analyzed-plan LRU hit
        lat_cached.append((time.perf_counter() - t0) * 1000)
    lat_cached.sort()
    semantic_plan_cached_ms = round(lat_cached[len(lat_cached) // 2], 3)

    # Plan-latency guard (r9 verdict item 7): the cold plan p50 rose four
    # rounds straight (2.69 -> 3.62 -> 4.77 -> 5.07 ms). The hard bar is
    # the reference's ~10 ms planning envelope; this committed WARN
    # threshold gives the creep a number before it becomes a problem.
    # A breach is a visible artifact field, not a crash — SCALING.md
    # must then attribute it (box vs code) in the round it trips.
    PLAN_GATE_WARN_MS = 7.0
    plan_gate_breach = semantic_plan_ms > PLAN_GATE_WARN_MS
    if plan_gate_breach:
        print(
            f"# WARN semantic plan p50 {semantic_plan_ms}ms exceeds the"
            f" committed {PLAN_GATE_WARN_MS}ms creep gate",
            file=sys.stderr,
        )

    # x63 probe-only steady state: the registered entry memoizes the
    # bucketed index build, so the first call pays the build and later
    # calls measure pure probe cost — the number that substantiates the
    # build-once/probe-many design (r5 verdict item 6). Excluded from
    # the timed suites above because cold x63 is build-dominated.
    QUERIES["x63_ann_index_probe"](spark, sf_dir).count()  # build + warm
    probe_lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        QUERIES["x63_ann_index_probe"](spark, sf_dir).count()
        probe_lat.append((time.perf_counter() - t0) * 1000)
    probe_lat.sort()
    x63_probe_ms = round(probe_lat[len(probe_lat) // 2], 1)
    print(f"# x63 probe-only p50: {x63_probe_ms}ms (runs {probe_lat})",
          file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # CONTRACT LINE (stdout): r5's line carried THREE per-query dicts
    # and outgrew the driver's 2000-char stdout-tail capture, so
    # BENCH_r05.json recorded parsed:null and r6-r9 dropped the maps
    # entirely. r10 restores the contract's "queries" map — the same
    # 22 headline names rounds 1-4 reported (none removed or renamed)
    # — and ONLY that map: measured line ~1.3 KB, inside the 2000-char
    # tail with headroom. Suite per-query medians and per-run totals
    # stay in BENCH_DETAIL.json + stderr.
    headline = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_runs": n_runs,
        "run_totals": run_totals,
        "warmup_total_s": warmup_total_s,
        "tpch_warmup_total_s": tpch_warmup_total,
        "mean_plan_ms": mean_plan,
        "semantic_plan_ms_p50": semantic_plan_ms,
        "semantic_plan_cached_ms_p50": semantic_plan_cached_ms,
        "semantic_plan_gate_warn_ms": PLAN_GATE_WARN_MS,
        "semantic_plan_gate_breach": plan_gate_breach,
        "tpch_suite_s": tpch_total,
        "r4_ops_total_s": ext_total,
        "r5_ops_total_s": r5_total,
        "r6_ops_total_s": r6_total,
        "r7_ops_total_s": r7_total,
        "r8_ops_total_s": r8_total,
        "r9_ops_total_s": r9_total,
        "r10_ops_total_s": r10_total,
        "x63_probe_p50_ms": x63_probe_ms,
        # the rotating-thaw receipts: entries re-measured THIS run purely
        # for rotation (fingerprint unchanged), with their fresh medians —
        # independent driver-visible wall evidence for the frozen set
        "thawed": thawed_out,
    }
    # Contract-line guard (round-10 advice): the driver captures a bounded
    # stdout tail; a line past ~2000 chars recreated the r5 parsed:null
    # regression. Shed the optional additions first, never the r1-r4 map.
    if len(json.dumps(headline)) > 1900:
        headline.pop("thawed", None)
    if len(json.dumps(headline)) > 1900:
        print("# WARN contract line exceeded 1900 chars; dropping queries map",
              file=sys.stderr)
        headline.pop("queries", None)
    detail = dict(
        headline,
        thawed=thawed_out,
        queries=timings,
        tpch_queries=tpch_timings,
        tpch_run_totals=tpch_runs,
        r4_ops=ext_timings,
        r4_ops_run_totals=ext_runs,
        r4_ops_measured=ext_measured,
        r5_ops=r5_timings,
        r5_ops_run_totals=r5_runs,
        r5_ops_measured=r5_measured,
        r6_ops=r6_timings,
        r6_ops_run_totals=r6_runs,
        r6_ops_measured=r6_measured,
        r7_ops=r7_timings,
        r7_ops_run_totals=r7_runs,
        r7_ops_measured=r7_measured,
        r8_ops=r8_timings,
        r8_ops_run_totals=r8_runs,
        r8_ops_measured=r8_measured,
        r9_ops=r9_timings,
        r9_ops_run_totals=r9_runs,
        r9_ops_measured=r9_measured,
        r10_ops=r10_timings,
        r10_ops_run_totals=r10_runs,
        r10_ops_measured=r10_measured,
        x63_probe_runs_ms=[round(x, 1) for x in probe_lat],
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")
    print(f"# per-query detail -> {detail_path}", file=sys.stderr)
    print("# detail: " + json.dumps(detail), file=sys.stderr)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
