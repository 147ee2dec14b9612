"""Round-6 additions, batch 2 (x76-x80): brute-force property tests +
the scale-shape plan asserts that are part of the definition of done
(round-5 verdict item 9)."""

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from wren_engine_spark.operators import dedup, selection, similarity
from wren_engine_spark.queries.registry import QUERIES


class TestX76SimilarityHistogram:
    def test_cumulative_is_descending_prefix_sum(self, spark):
        rows = QUERIES["x76_similarity_histogram"](spark, SF_DIR).collect()
        rows.sort(key=lambda r: -r.bin_lo)
        running = 0
        for r in rows:
            running += r.n_pairs
            assert r.pairs_at_or_above == running
        # every bin edge is a multiple of 0.05 within [0.5, 1.0]
        for r in rows:
            assert 0.5 <= r.bin_lo <= 1.0
            assert abs(r.bin_lo * 20 - round(r.bin_lo * 20)) < 1e-12

    def test_bins_match_raw_pairs(self, spark):
        from wren_engine_spark.queries.io import load_tables

        d = load_tables(spark, SF_DIR, "documents")["documents"]
        pairs = dedup.jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5)
        want = {}
        for r in pairs.collect():
            b = math.floor(r.jaccard * 20) / 20.0
            want[b] = want.get(b, 0) + 1
        got = {
            r.bin_lo: r.n_pairs
            for r in QUERIES["x76_similarity_histogram"](spark, SF_DIR).collect()
        }
        assert got == want


class TestX77DedupScopePolicy:
    def test_matches_brute_force(self, spark):
        docs = [
            (0, "a", "en", "same text"),
            (1, "a", "en", "same text"),
            (2, "b", "en", "same text"),
            (3, "b", "de", "same text"),
            (4, "a", "de", "unique one"),
            (5, "b", "de", "unique two"),
        ]
        df = spark.createDataFrame(
            docs, "doc_id LONG, source STRING, lang STRING, text STRING"
        )
        out = dedup.dedup_scope_report(
            df,
            "text",
            "doc_id",
            {"global": [], "per_source": ["source"], "per_lang": ["lang"]},
        )
        got = {r.policy: (r.total_docs, r.survivors, r.removed) for r in out.collect()}
        texts = {t for *_, t in docs}
        by_src = {(s, t) for _, s, _, t in docs}
        by_lang = {(l, t) for _, _, l, t in docs}
        assert got["global"] == (6, len(texts), 6 - len(texts))
        assert got["per_source"] == (6, len(by_src), 6 - len(by_src))
        assert got["per_lang"] == (6, len(by_lang), 6 - len(by_lang))

    def test_global_is_tightest_scope(self, spark):
        rows = QUERIES["x77_dedup_scope_policy"](spark, SF_DIR).collect()
        by = {r.policy: r for r in rows}
        # refining the scope can only ADD survivors
        assert by["global"].survivors <= by["per_source"].survivors
        assert by["global"].survivors <= by["per_lang"].survivors
        for r in rows:
            assert r.removed == r.total_docs - r.survivors
            assert abs(r.removal_rate - r.removed / r.total_docs) < 1e-15

    def test_plan_no_text_past_first_projection(self, spark):
        # the grouping keys are (scope cols, md5) — the raw text column
        # must not appear in any Exchange (only its 32-char hash moves)
        df = QUERIES["x77_dedup_scope_policy"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "text#" not in line, line.strip()[:140]

    def test_plan_partial_aggregation(self, spark):
        df = QUERIES["x77_dedup_scope_policy"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "partial_count" in plan or "partial count" in plan.lower()


class TestX78BudgetTrim:
    def test_matches_brute_force_greedy(self, spark):
        from wren_engine_spark.operators.text import quality_score
        from wren_engine_spark.queries.io import load_tables

        d = load_tables(spark, SF_DIR, "documents")["documents"]
        q = {
            r.doc_id: r.quality_score
            for r in quality_score(d, "text", "doc_id").collect()
        }
        docs = d.select("doc_id", "lang", "text").collect()
        # Spark's split on \s+ of a trimmed string: empty -> [""] (size 1)
        toks = {
            r.doc_id: (len(r.text.strip().split()) if r.text.strip() else 1)
            for r in docs
        }
        langs = {}
        for r in docs:
            langs.setdefault(r.lang, []).append(r.doc_id)
        out = {r.doc_id: r for r in QUERIES["x78_budget_trim"](spark, SF_DIR).collect()}
        assert set(out) == {r.doc_id for r in docs}
        for lang, ids in langs.items():
            total = sum(toks[i] for i in ids)
            budget = math.floor(total * 1.0 / 2.0)
            ids.sort(key=lambda i: (-q[i], i))
            cum = 0
            for i in ids:
                cum += toks[i]
                row = out[i]
                assert row.lang == lang
                assert row.n_tokens == toks[i]
                assert row.cum_tokens == cum
                assert row.budget_tokens == budget
                assert row.kept == (cum <= budget)

    def test_plan_window_partitioned_by_group_and_totals_broadcast(self, spark):
        df = QUERIES["x78_budget_trim"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        win_lines = [l for l in plan.splitlines() if "windowspecdefinition" in l]
        assert win_lines, "running-sum window expected"
        for l in win_lines:
            assert "windowspecdefinition(lang" in l, l.strip()[:140]
        assert "BroadcastHashJoin" in plan  # per-group totals join back broadcast


class TestX79HardNegatives:
    def test_matches_brute_force(self, spark):
        vecs = [
            (0, [1.0, 0.0, 0.0], "a"),
            (1, [0.9, 0.1, 0.0], "a"),
            (2, [0.8, 0.2, 0.0], "b"),
            (3, [0.0, 1.0, 0.0], "b"),
            (4, [0.0, 0.9, 0.1], "c"),
            (5, [0.5, 0.5, 0.0], "c"),
        ]
        df = spark.createDataFrame(vecs, "vec_id LONG, vec ARRAY<DOUBLE>, label STRING")
        qdf = df.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("label").alias("qlabel"),
        )
        out = similarity.hard_negatives(df, "vec_id", "vec", "label", qdf, k=2)
        got = {}
        for r in out.collect():
            got.setdefault(r.query_id, []).append(
                (r.rnk, r.neighbor_id, r.neighbor_label, r.cosine_sim)
            )
        by_id = {i: (v, l) for i, v, l in vecs}
        for qid in (0, 1):
            qv, ql = by_id[qid]
            cands = []
            for nid, (nv, nl) in by_id.items():
                if nl == ql:
                    continue
                dot = sum(a * b for a, b in zip(qv, nv))
                sim = dot / (
                    math.sqrt(sum(a * a for a in qv)) * math.sqrt(sum(a * a for a in nv))
                )
                cands.append((nid, nl, sim))
            cands.sort(key=lambda t: (-t[2], t[0]))
            want = [
                (rk + 1, nid, nl, round(sim, 6))
                for rk, (nid, nl, sim) in enumerate(cands[:2])
            ]
            assert sorted(got[qid]) == want

    def test_no_same_label_neighbor(self, spark):
        from wren_engine_spark.queries.io import load_tables

        e = load_tables(spark, SF_DIR, "embeddings")["embeddings"]
        labels = {r.vec_id: r.label for r in e.select("vec_id", "label").collect()}
        for r in QUERIES["x79_hard_negatives"](spark, SF_DIR).collect():
            assert labels[r.query_id] != r.neighbor_label
            assert labels[r.neighbor_id] == r.neighbor_label

    def test_plan_queries_broadcast_corpus_never_shuffles(self, spark):
        df = QUERIES["x79_hard_negatives"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # non-equi cross-label join must ride a broadcast of the query
        # side, never a corpus shuffle
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan
        # only the bounded per-query top-k window shuffles (on query_id)
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "query_id" in line, line.strip()[:140]


class TestX80EmbeddingDimStats:
    def test_matches_brute_force(self, spark):
        vecs = [
            (0, [0.5, 1.0, 0.0]),
            (1, [0.25, 1.0, 0.0]),
            (2, [-0.5, 1.0, 1e-7]),
        ]
        df = spark.createDataFrame(vecs, "vec_id LONG, vec ARRAY<DOUBLE>")
        out = {r.dim: r for r in similarity.embedding_dim_stats(df, "vec").collect()}
        q = 1_000_000.0
        for dim in range(3):
            xs = [math.floor(v[dim] * q + 0.5) for _, v in vecs]
            n = len(xs)
            mean_q = sum(xs) / n
            var_q = sum(x * x for x in xs) / n - mean_q * mean_q
            r = out[dim]
            assert r.n_vals == n
            assert abs(r.mean - mean_q / q) < 1e-15
            assert abs(r.variance - var_q / (q * q)) < 1e-18
        # dim 1 is constant -> zero variance -> dead; dim 2 is ~1e-7
        # amplitude -> variance ~ 1e-15 < 1e-9 -> dead too
        assert out[1].dead and out[2].dead and not out[0].dead

    def test_partition_order_invariant(self, spark):
        from wren_engine_spark.queries.io import load_tables

        e = load_tables(spark, SF_DIR, "embeddings")["embeddings"]
        a = similarity.embedding_dim_stats(e, "embedding").collect()
        b = similarity.embedding_dim_stats(e.repartition(13), "embedding").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_plan_partial_aggregation_on_dim(self, spark):
        df = QUERIES["x80_embedding_dim_stats"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "partial_count" in plan or "partial_sum" in plan
        shuffles = [
            l for l in plan.splitlines() if "Exchange hashpartitioning" in l
        ]
        assert len(shuffles) == 1 and "dim" in shuffles[0]
