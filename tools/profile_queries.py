"""Per-query optimization profiler (round-10 measurement harness).

For each named registered query: build the DataFrame (timed), run it
once discarded (codegen warm), then time N recorded runs of the same
action bench.py uses (df.count()), recording per-run wall seconds and
the number of Spark jobs/stages the action submitted (AQE stage
materializations show up as jobs — each is a driver round-trip that
costs the box's per-action floor, so job count is the fixed-overhead
metric of record alongside wall time).

Optionally dumps .explain("formatted") to plans/r10/<query>_<tag>.txt.

Usage:
  python tools/profile_queries.py [--sf DIR] [--runs N] [--plans TAG] q1 x3 ...
  python tools/profile_queries.py --all-headline --plans before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_revenue_forecast", "q9_product_type_profit", "q10_returned_items",
    "q18_large_volume_customer", "q21_suppliers_kept_waiting",
    "w2_running_customer_total", "w5_rank_family", "g1_rollup_revenue",
    "d1_distinct_aggregates", "j2_correlated_above_avg", "sem3_calc_to_many",
    "sem7_semantic_join_query", "a4_map_struct_ops", "f3_compat_datetime_json",
    "x1_exact_dedup", "x3_ngram_jaccard_pairs", "x6_token_stats",
    "x9_cosine_topk", "x13_embedding_near_dup",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain to <plans-dir>/<q>_<TAG>.txt")
    ap.add_argument("--plans-dir", default="plans/r10")
    ap.add_argument("--all-headline", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    names = list(args.queries)
    if args.all_headline:
        names = HEADLINE + [n for n in names if n not in HEADLINE]

    from wren_engine_spark.queries.registry import QUERIES
    from wren_engine_spark.session import get_spark

    spark = get_spark("profile")
    sc = spark.sparkContext

    results = {}
    for name in names:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        sc.setJobDescription(f"profile: {name}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        build_ms = (time.perf_counter() - t0) * 1000
        if args.plans:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{args.plans_dir}/{name}_{args.plans}.txt", "w") as f:
                f.write(plan)
        if args.runs == 0:  # plan-capture only
            print(f"{name}: plan captured", flush=True)
            continue
        # warm run (codegen+footers), discarded
        df.count()
        runs = []
        jobs_per_run = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            j0 = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df2 = fn(spark, args.sf)
            df2.count()
            dt = time.perf_counter() - t0
            j1 = sc._jsc.sc().dagScheduler().nextJobId()
            runs.append(dt)
            jobs_per_run.append(j1 - j0)
        runs_sorted = sorted(runs)
        med = runs_sorted[len(runs_sorted) // 2]
        results[name] = {
            "build_ms": round(build_ms, 1),
            "med_s": round(med, 3),
            "runs_s": [round(x, 3) for x in runs],
            "jobs": jobs_per_run,
        }
        print(
            f"{name}: med {med:.3f}s build {build_ms:.0f}ms jobs {jobs_per_run}"
            f" runs {[round(x, 2) for x in runs]}",
            flush=True,
        )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    main()
