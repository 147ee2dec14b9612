"""Round-10 serving additions: late-interaction MaxSim scoring
(retrieval.maxsim_topk), RM3-style pseudo-relevance feedback over the
persisted BM25 index (retrieval.bm25_index_prf_probe), and best-window
snippet extraction (retrieval.best_snippet).

Pins, per the round-5 discipline:
- MaxSim ≡ a pure-Python replay of the exact arithmetic (left-fold
  dots, round-half-away-from-zero micro-units, integer max + sum),
  incl. ColBERT bag semantics (duplicate query vectors at different
  positions both contribute) and self-exclusion;
- PRF pass 2 retrieves a document sharing NO original query term (the
  recall lever the two-pass expansion exists for), expansion terms
  exclude original query terms and respect fb_terms with lexical
  tie-breaks, and the posting store still never exchanges on the
  token key (same plan law as the plain probe);
- snippets pick the max-occurrence window with ties to the EARLIEST
  start, count occurrences (not distinct terms), score suffix windows,
  and skip token-less docs.
"""

import math

import pytest
from pyspark.sql import functions as F

from wren_engine_spark.operators import retrieval


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _round_away(v: float) -> int:
    """round-half-away-from-zero — Spark/DuckDB ROUND."""
    if v >= 0:
        return int(math.floor(v + 0.5))
    return -int(math.floor(-v + 0.5))


def _assert_no_index_token_exchange(plan: str, table_prefix: str) -> None:
    """The posting side must never shuffle on the token key: every
    token-keyed Exchange's span may contain only query-side (bounded)
    inputs, never a scan of the persisted index."""
    lines = plan.splitlines()
    exch_idx = [i for i, l in enumerate(lines) if "Exchange " in l]
    tok_exch = [
        i for i, l in enumerate(lines)
        if "Exchange hashpartitioning(tok" in l
        or "Exchange hashpartitioning(__tok" in l
    ]
    for i in tok_exch:
        nxt = next((j for j in exch_idx if j > i), len(lines))
        span = lines[i:nxt]
        assert not any(
            "FileScan" in l and f"default.{table_prefix}" in l for l in span
        ), lines[i].strip()[:120]


class TestMaxSim:
    VECS = {
        # doc_id -> token vectors (2-D for hand-checkable cosines)
        1: [[1.0, 0.0], [0.0, 1.0]],
        2: [[1.0, 1.0], [2.0, 0.0]],
        3: [[-1.0, 0.0], [0.5, 0.5]],
    }
    QUERY = [[1.0, 0.0], [1.0, 0.0], [0.0, 2.0]]  # bag: dup vec counts twice

    @pytest.fixture(scope="class")
    def frames(self, spark):
        docs = spark.createDataFrame(
            [(d, v) for d, vs in self.VECS.items() for v in vs],
            "doc_id BIGINT, vec ARRAY<DOUBLE>",
        )
        qv = spark.createDataFrame(
            [(0, i, v) for i, v in enumerate(self.QUERY)],
            "query_id BIGINT, tok_pos BIGINT, vec ARRAY<DOUBLE>",
        )
        return docs, qv

    def _python_maxsim(self):
        def fold_dot(a, b):
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + float(x) * float(y)
            return acc

        scores = {}
        for d, vs in self.VECS.items():
            s = 0
            for q in self.QUERY:
                qn = math.sqrt(fold_dot(q, q))
                best = max(
                    _round_away(
                        1_000_000.0
                        * fold_dot(q, v)
                        / (qn * math.sqrt(fold_dot(v, v)))
                    )
                    for v in vs
                )
                s += best
            scores[d] = s
        return scores

    def test_replay_bit_for_bit(self, frames):
        docs, qv = frames
        got = {
            (r.doc_id, r.rnk): r.maxsim
            for r in retrieval.maxsim_topk(docs, qv, k=3).collect()
        }
        want = self._python_maxsim()
        order = sorted(want, key=lambda d: (-want[d], d))
        assert set(got) == {(d, i + 1) for i, d in enumerate(order)}
        for i, d in enumerate(order):
            assert got[(d, i + 1)] == want[d] / 1_000_000.0

    def test_bag_semantics_duplicate_query_vector(self, spark, frames):
        docs, qv = frames
        # dropping ONE of the duplicated [1,0] query vectors must
        # change the score by exactly that token's best match
        qv1 = qv.filter(F.col("tok_pos") != 1)
        full = {
            r.doc_id: r.maxsim
            for r in retrieval.maxsim_topk(docs, qv, k=3).collect()
        }
        less = {
            r.doc_id: r.maxsim
            for r in retrieval.maxsim_topk(docs, qv1, k=3).collect()
        }
        for d in full:
            assert full[d] > less[d]

    def test_self_exclusion(self, spark, frames):
        docs, qv = frames
        q1 = qv.withColumn("query_id", F.lit(1))  # query IS doc 1
        got = retrieval.maxsim_topk(docs, q1, k=10).collect()
        assert 1 not in {r.doc_id for r in got}

    def test_candidates_restrict_and_preserve_scores(self, spark, frames):
        # the pruned path must (a) score ONLY the candidate pairs and
        # (b) give each surviving pair EXACTLY its brute-force score
        # (shared kernel — retrieve-then-rescore can prune, never warp)
        docs, qv = frames
        cand = spark.createDataFrame(
            [(0, 1), (0, 3)], "query_id BIGINT, doc_id BIGINT"
        )
        pruned = {
            r.doc_id: (r.maxsim, r.rnk)
            for r in retrieval.maxsim_topk(
                docs, qv, k=3, candidates=cand
            ).collect()
        }
        brute = {
            r.doc_id: r.maxsim
            for r in retrieval.maxsim_topk(docs, qv, k=3).collect()
        }
        assert set(pruned) == {1, 3}
        for d, (score, _) in pruned.items():
            assert score == brute[d]

    def test_k_bound_and_tie_break(self, spark):
        docs = spark.createDataFrame(
            [(d, [1.0, 0.0]) for d in (5, 6, 7)],
            "doc_id BIGINT, vec ARRAY<DOUBLE>",
        )
        qv = spark.createDataFrame(
            [(0, 0, [1.0, 0.0])],
            "query_id BIGINT, tok_pos BIGINT, vec ARRAY<DOUBLE>",
        )
        got = retrieval.maxsim_topk(docs, qv, k=2).collect()
        # identical scores: ties resolve to the lower doc ids
        assert [(r.doc_id, r.rnk) for r in sorted(got, key=lambda r: r.rnk)] \
            == [(5, 1), (6, 2)]


class TestPrfProbe:
    CORPUS = [
        (0, "alpha beta"),
        (1, "alpha beta gamma gamma"),
        (2, "alpha delta"),
        (3, "gamma gamma gamma"),
        (4, "zeta"),
    ]

    @pytest.fixture(scope="class")
    def table(self, spark):
        docs = spark.createDataFrame(self.CORPUS, "doc_id BIGINT, text STRING")
        retrieval.write_bm25_index(docs, "text", "doc_id", "bm25_t_prf")
        return "bm25_t_prf"

    @pytest.fixture(scope="class")
    def queries(self, spark):
        return spark.createDataFrame(
            [(0, "alpha beta")], "doc_id BIGINT, text STRING"
        )

    def test_expansion_recalls_disjoint_doc(self, spark, table, queries):
        # doc 3 shares NO term with the query — only the gamma
        # expansion (summed tf 4 across feedback docs 1, 2 beats
        # delta's 1) can retrieve it
        plain = retrieval.bm25_index_probe(
            spark, table, queries, "text", "doc_id", k=10
        )
        assert 3 not in {r.doc_id for r in plain.collect()}
        prf = retrieval.bm25_index_prf_probe(
            spark, table, queries, "text", "doc_id",
            k=10, fb_docs=2, fb_terms=1,
        )
        got = {r.doc_id for r in prf.collect()}
        assert 3 in got
        assert 4 not in got  # zeta shares nothing, expansion or not

    def test_fb_terms_bound(self, spark, queries):
        # with a delta-only doc in the corpus: fb_terms=1 expands with
        # gamma only (summed tf 4 beats delta's 1 across feedback docs
        # 1, 2), so the delta-only doc stays unretrieved; fb_terms=2
        # adds delta and retrieves it
        docs = spark.createDataFrame(
            self.CORPUS + [(9, "delta delta")],
            "doc_id BIGINT, text STRING",
        )
        retrieval.write_bm25_index(docs, "text", "doc_id", "bm25_t_prf2")
        one = retrieval.bm25_index_prf_probe(
            spark, "bm25_t_prf2", queries, "text", "doc_id",
            k=10, fb_docs=2, fb_terms=1,
        )
        assert 9 not in {r.doc_id for r in one.collect()}
        two = retrieval.bm25_index_prf_probe(
            spark, "bm25_t_prf2", queries, "text", "doc_id",
            k=10, fb_docs=2, fb_terms=2,
        )
        assert 9 in {r.doc_id for r in two.collect()}

    def test_self_and_meta_laws(self, spark, table, queries):
        prf = retrieval.bm25_index_prf_probe(
            spark, table, queries, "text", "doc_id", k=10,
            fb_docs=2, fb_terms=1,
        )
        assert 0 not in {r.doc_id for r in prf.collect()}  # self excluded
        with pytest.raises(ValueError, match="no __meta sidecar"):
            retrieval.bm25_index_prf_probe(
                spark, "bm25_t_prf_missing", queries, "text", "doc_id"
            )

    def test_plan_no_index_token_exchange(self, spark, table, queries):
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            df = retrieval.bm25_index_prf_probe(
                spark, table, queries, "text", "doc_id",
                k=5, fb_docs=2, fb_terms=1,
            )
            plan = _plan(df)
        finally:
            if saved is None:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            else:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        _assert_no_index_token_exchange(plan, "bm25_t_prf")
        assert "BroadcastHashJoin" in plan

    def test_pass2_scan_pruned_to_expanded_terms(self, spark, table, queries):
        # r10: for a bounded batch the returned plan IS pass 2 alone
        # (pass 1 + expansion run eagerly as capped driver jobs), and
        # its posting scans carry the combined original+expanded term
        # list as a pushed IN filter — the probe never scans the whole
        # inverted index. With fb_terms=1 the expansion is 'gamma'
        # (summed tf 4 across feedback docs 1, 2 beats delta's 1).
        df = retrieval.bm25_index_prf_probe(
            spark, table, queries, "text", "doc_id",
            k=5, fb_docs=2, fb_terms=1,
        )
        lines = _plan(df).splitlines()
        scans = [
            l for l in lines
            if "FileScan" in l and "default.bm25_t_prf" in l
            and "__docs" not in l
        ]
        assert scans, "no posting scan in the pass-2 plan"
        for l in scans:
            assert "In(tok, [" in l, f"posting scan not IN-pruned: {l[:160]}"
        # the expanded term reached the pushed filter
        assert any("gamma" in l for l in scans), \
            "expansion term missing from the pushed token filter"

    def test_literal_and_lazy_paths_identical(self, spark, table, queries):
        # max_literal_tokens=0 forces the fully lazy in-plan shape
        # (full scans restricted by broadcast joins) — the pruned
        # default path must return bit-identical rows
        fast = retrieval.bm25_index_prf_probe(
            spark, table, queries, "text", "doc_id",
            k=10, fb_docs=2, fb_terms=2,
        )
        lazy = retrieval.bm25_index_prf_probe(
            spark, table, queries, "text", "doc_id",
            k=10, fb_docs=2, fb_terms=2, max_literal_tokens=0,
        )
        assert sorted(map(tuple, fast.collect()), key=lambda t: (t[0], t[3])) \
            == sorted(map(tuple, lazy.collect()), key=lambda t: (t[0], t[3]))


class TestBestSnippet:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "a q1 b q1 q2 c d"),
                (2, "x q1"),
                (3, "q1 q1 q1"),
                (9, "   "),
            ],
            "doc_id BIGINT, text STRING",
        )

    @pytest.fixture(scope="class")
    def queries(self, spark):
        return spark.createDataFrame(
            [(0, "q1 q2")], "doc_id BIGINT, text STRING"
        )

    def _snip(self, spark, corpus, queries, doc_ids, window=3):
        hits = spark.createDataFrame(
            [(0, d) for d in doc_ids], "query_id BIGINT, doc_id BIGINT"
        )
        return {
            r.doc_id: (r.snippet_start, r.matched_terms, r.snippet)
            for r in retrieval.best_snippet(
                corpus, "text", "doc_id", hits, queries,
                "text", "doc_id", window=window,
            ).collect()
        }

    def test_max_window_tie_earliest(self, spark, corpus, queries):
        # doc 1 windows of 3: starts 1, 2, 3 all match 2 — earliest wins
        got = self._snip(spark, corpus, queries, [1])
        assert got[1] == (1, 2, "q1 b q1")

    def test_suffix_window_counts(self, spark, corpus, queries):
        # doc 2: start 0 covers both tokens (1 match); the suffix
        # window at start 1 also has 1 — earliest start wins
        got = self._snip(spark, corpus, queries, [2])
        assert got[2] == (0, 1, "x q1")

    def test_occurrences_not_distinct(self, spark, corpus, queries):
        got = self._snip(spark, corpus, queries, [3])
        assert got[3] == (0, 3, "q1 q1 q1")

    def test_tokenless_doc_absent(self, spark, corpus, queries):
        got = self._snip(spark, corpus, queries, [9, 1])
        assert 9 not in got and 1 in got


class TestMmrDiversify:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "query_id BIGINT, doc_id BIGINT, rel BIGINT, "
            "other_id BIGINT, sim BIGINT",
        )

    def test_redundant_candidate_deferred(self, spark):
        # doc 2 is nearly as relevant as doc 1 but almost identical to
        # it; doc 3 is less relevant but diverse — MMR (lam=1/2) picks
        # 1, then 3 (obj 70-10=60 beats 90-95=-5), then 2
        sims = {(1, 2): 95, (2, 1): 95, (1, 3): 10, (3, 1): 10,
                (2, 3): 20, (3, 2): 20}
        rel = {1: 100, 2: 90, 3: 70}
        rows = [
            (0, a, rel[a], b, sims[(a, b)])
            for a in rel for b in rel if a != b
        ]
        got = [
            (r.doc_id, r.mmr_rank)
            for r in sorted(
                retrieval.mmr_diversify(
                    self._pairs(spark, rows), n=3
                ).collect(),
                key=lambda r: r.mmr_rank,
            )
        ]
        assert got == [(1, 1), (3, 2), (2, 3)]

    def test_pure_relevance_first_pick_and_ties(self, spark):
        # equal relevance: first pick ties to the LOWER doc id
        rows = [
            (0, 5, 80, 6, 0), (0, 6, 80, 5, 0),
        ]
        got = sorted(
            (r.mmr_rank, r.doc_id)
            for r in retrieval.mmr_diversify(
                self._pairs(spark, rows), n=2
            ).collect()
        )
        assert got == [(1, 5), (2, 6)]

    def test_single_candidate_null_pair(self, spark):
        rows = [(0, 7, 50, None, None)]
        got = retrieval.mmr_diversify(
            self._pairs(spark, rows), n=4
        ).collect()
        assert [(r.doc_id, r.mmr_rank) for r in got] == [(7, 1)]

    def test_n_exceeds_candidates(self, spark):
        rows = [
            (0, 1, 10, 2, 5), (0, 2, 9, 1, 5),
        ]
        got = retrieval.mmr_diversify(
            self._pairs(spark, rows), n=10
        ).collect()
        assert len(got) == 2

    def test_independent_queries_distributed(self, spark):
        # two queries select independently (the applyInPandas group law)
        rows = [
            (0, 1, 10, 2, 0), (0, 2, 5, 1, 0),
            (1, 3, 7, 4, 0), (1, 4, 9, 3, 0),
        ]
        got = {
            (r.query_id, r.mmr_rank): r.doc_id
            for r in retrieval.mmr_diversify(
                self._pairs(spark, rows), n=1
            ).collect()
        }
        assert got == {(0, 1): 1, (1, 1): 4}


class TestRankingMetrics:
    """retrieval.ranking_metrics — the eval leg (x132): recall@k, MRR,
    nDCG@k against a pure-Python replay of the integer-gain
    arithmetic, plus the truth-side query-universe contract."""

    QN = 1_000_000_000

    def _gains(self, k):
        return {
            r: _round_away(self.QN / math.log2(r + 1))
            for r in range(1, k + 1)
        }

    def _python_metrics(self, ranked, truth, k):
        """ranked: {qid: [doc ids in rank order]}, truth: {qid: set}."""
        g = self._gains(k)
        out = {}
        for qid, rel in truth.items():
            rows = ranked.get(qid, [])[:k]
            hits = [(r + 1, d) for r, d in enumerate(rows) if d in rel]
            qdcg = sum(g[r] for r, _ in hits)
            idcg = sum(g[r] for r in range(1, min(len(rel), k) + 1))
            out[qid] = (
                len(rel),
                len(hits),
                len(hits) / len(rel),
                1.0 / hits[0][0] if hits else 0.0,
                qdcg / idcg,
            )
        return out

    def _run(self, spark, ranked, truth, k):
        rrows = [
            (q, d, r + 1)
            for q, docs in ranked.items()
            for r, d in enumerate(docs)
        ]
        trows = [(q, d) for q, rel in truth.items() for d in sorted(rel)]
        rdf = spark.createDataFrame(
            rrows, "query_id BIGINT, doc_id BIGINT, rnk INT"
        )
        tdf = spark.createDataFrame(trows, "query_id BIGINT, doc_id BIGINT")
        return {
            r.query_id: (r.n_rel, r.hits, r.recall_k, r.mrr, r.ndcg_k)
            for r in retrieval.ranking_metrics(
                rdf, tdf, k=k, quantum=self.QN
            ).collect()
        }

    def test_matches_python_replay(self, spark):
        ranked = {
            1: [10, 11, 12, 13],   # partial agreement
            2: [20, 21],           # zero hits
            3: [31, 30],           # perfect set, swapped order
        }
        truth = {
            1: {11, 13, 99},       # one relevant doc never retrieved
            2: {25},
            3: {30, 31},
        }
        got = self._run(spark, ranked, truth, k=4)
        want = self._python_metrics(ranked, truth, k=4)
        assert got == want

    def test_perfect_ranking_scores_ones(self, spark):
        ranked = {7: [1, 2, 3]}
        truth = {7: {1, 2, 3}}
        (n_rel, hits, rec, mrr, ndcg) = self._run(
            spark, ranked, truth, k=3
        )[7]
        assert (n_rel, hits, rec, mrr, ndcg) == (3, 3, 1.0, 1.0, 1.0)

    def test_truth_query_with_no_ranked_rows_scores_zero(self, spark):
        got = self._run(spark, {1: [10]}, {1: {10}, 2: {20}}, k=5)
        assert got[2] == (1, 0, 0.0, 0.0, 0.0)
        assert got[1] == (1, 1, 1.0, 1.0, 1.0)

    def test_ranked_query_absent_from_truth_is_dropped(self, spark):
        got = self._run(spark, {1: [10], 9: [90]}, {1: {10}}, k=5)
        assert set(got) == {1}

    def test_rows_beyond_k_are_ignored(self, spark):
        # doc 12 is relevant but sits at rank 3 > k=2: no credit
        got = self._run(spark, {1: [10, 11, 12]}, {1: {12}}, k=2)
        assert got[1] == (1, 0, 0.0, 0.0, 0.0)

    def test_gain_tables_are_local_relations(self, spark):
        rdf = spark.createDataFrame(
            [(1, 10, 1)], "query_id BIGINT, doc_id BIGINT, rnk INT"
        )
        tdf = spark.createDataFrame(
            [(1, 10)], "query_id BIGINT, doc_id BIGINT"
        )
        an = (
            retrieval.ranking_metrics(rdf, tdf, k=10)
            ._jdf.queryExecution().analyzed().toString()
        )
        assert "LocalRelation" in an


class TestRrfTune:
    """retrieval.rrf_tune — the fusion-constant sweep (x133): kernel
    parity with the pure-Python fusion + metric replay, the
    missing-query denominator rule, and deterministic output order."""

    QN = 1_000_000_000

    LEX = {1: [10, 11, 12], 2: [20, 21]}
    VEC = {1: [11, 13, 10], 2: [22, 20]}
    TRUTH = {1: {11, 13}, 2: {20}, 3: {30}}  # q3 absent from both legs

    def _python_sweep(self, grid, k):
        from wren_engine_spark.operators.retrieval import dcg_gain_table

        gains, cums = dcg_gain_table(k, self.QN)
        g = dict(gains)
        icum = dict(cums)
        out = []
        for K in grid:
            nints = []
            for qid, rel in self.TRUTH.items():
                lex = {d: r + 1 for r, d in enumerate(self.LEX.get(qid, []))}
                vec = {d: r + 1 for r, d in enumerate(self.VEC.get(qid, []))}
                cand = set(lex) | set(vec)
                scored = sorted(
                    cand,
                    key=lambda d: (
                        -(
                            (1.0 / (K + lex[d]) if d in lex else 0.0)
                            + (1.0 / (K + vec[d]) if d in vec else 0.0)
                        ),
                        d,
                    ),
                )[:k]
                qdcg = sum(
                    g[r + 1] for r, d in enumerate(scored) if d in rel
                )
                idcg = icum[min(len(rel), k)]
                nints.append(_round_away(self.QN * (qdcg / idcg)))
            out.append((K, sum(nints) / (len(nints) * self.QN)))
        out.sort(key=lambda t: (-t[1], t[0]))
        return [
            (K, m, r + 1) for r, (K, m) in enumerate(out)
        ]

    def _run(self, spark, grid, k):
        lex = spark.createDataFrame(
            [
                (q, d, r + 1)
                for q, docs in self.LEX.items()
                for r, d in enumerate(docs)
            ],
            "query_id BIGINT, doc_id BIGINT, lex_rank INT",
        )
        vec = spark.createDataFrame(
            [
                (q, d, r + 1)
                for q, docs in self.VEC.items()
                for r, d in enumerate(docs)
            ],
            "query_id BIGINT, doc_id BIGINT, vec_rank INT",
        )
        truth = spark.createDataFrame(
            [(q, d) for q, rel in self.TRUTH.items() for d in sorted(rel)],
            "query_id BIGINT, doc_id BIGINT",
        )
        return [
            (r.rrf_k, r.mean_ndcg, r.rnk)
            for r in retrieval.rrf_tune(
                lex, vec, truth, grid=grid, k=k, quantum=self.QN
            ).orderBy("rnk").collect()
        ]

    def test_matches_python_replay(self, spark):
        got = self._run(spark, grid=[10, 60, 120], k=3)
        want = self._python_sweep([10, 60, 120], k=3)
        assert got == want

    def test_truth_query_absent_from_both_legs_drags_the_mean(self, spark):
        # q3's relevant doc is never retrieved at any rrf_k: its
        # per-query nDCG of 0 must stay in the denominator
        got = dict(
            (K, m) for K, m, _ in self._run(spark, grid=[60], k=3)
        )
        assert got[60] < 1.0

    def test_tie_breaks_to_smaller_rrf_k(self, spark):
        # two identical grid values produce identical means: smaller
        # first (the documented deterministic order)
        got = self._run(spark, grid=[90, 30], k=3)
        by_rnk = [K for K, _, _ in got]
        means = {K: m for K, m, _ in got}
        if means[30] == means[90]:
            assert by_rnk == [30, 90]
        else:  # data made them differ: order must follow the mean
            assert means[by_rnk[0]] >= means[by_rnk[1]]

    def test_single_value_grid_is_ranked_one(self, spark):
        got = self._run(spark, grid=[60], k=3)
        assert len(got) == 1 and got[0][2] == 1

    def test_bounded_sides_stay_broadcast_under_minus_one(self, spark):
        """The docstring's bounded-frame discipline, pinned: with the
        auto-broadcast threshold disabled, the explicit broadcasts
        (grid cross joins, truth, gain/idcg literals) must survive as
        broadcast joins — the plan may not fall back to shuffling the
        metric tail."""
        lex = spark.createDataFrame(
            [(1, 10, 1)], "query_id BIGINT, doc_id BIGINT, lex_rank INT"
        )
        vec = spark.createDataFrame(
            [(1, 10, 1)], "query_id BIGINT, doc_id BIGINT, vec_rank INT"
        )
        truth = spark.createDataFrame(
            [(1, 10)], "query_id BIGINT, doc_id BIGINT"
        )
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = _plan(
                retrieval.rrf_tune(lex, vec, truth, grid=[30, 60], k=3)
            )
        finally:
            if saved is None:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            else:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" in plan  # grid cross joins
