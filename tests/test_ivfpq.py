"""IVF-PQ composite ANN (similarity.ivfpq_topk, entries x107/x108).

The round-5 discipline's brute-force leg: an INDEPENDENT pure-Python
replica of the whole spec — quantize, coarse quantized-Lloyd, integer
residuals, per-subspace PQ Lloyd, encode, nprobe pruning, ADC rank —
compared row-for-row against the Spark operator, plus plan asserts
pinning the probe's shuffle structure (one exchange, broadcast query
side, no cartesian, no sort-merge join) with broadcast auto-detection
disabled so a shuffle could not hide behind an automatic broadcast.
"""

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from wren_engine_spark.operators import similarity

NLIST, NPROBE, NSUB, KCODES = 4, 2, 2, 4
COARSE_ITERS, PQ_ITERS, TOPK, Q = 2, 1, 5, 1_000_000


def _corpus(spark, n=150):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < n)
        .select("vec_id", "embedding")
    )


def _queries(df):
    return df.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


# ---------------------------------------------------------------------------
# pure-Python replica of the spec (exact integer arithmetic; the one
# IEEE double op is floor(sum/n), same as the operator and the oracle)
# ---------------------------------------------------------------------------


def _quant(vec):
    return [int(math.floor(float(x) * float(Q) + 0.5)) for x in vec]


def _argmin(qx, cents):
    best_d, best_c = None, None
    for c, cent in enumerate(cents):
        d = sum((a - b) * (a - b) for a, b in zip(qx, cent))
        if best_d is None or d < best_d:
            best_d, best_c = d, c
    return best_c


def _lloyd(vectors_by_id, k, iters):
    """kmeans_quantized semantics: init = the k smallest ids' vectors,
    update = floor(sum/n) via one double division, an emptied cluster
    keeps its previous centroid, assignment ties to the lowest id."""
    ids = sorted(vectors_by_id)
    cents = [list(vectors_by_id[i]) for i in ids[:k]]
    dim = len(cents[0])
    for _ in range(iters):
        sums = [[0] * dim for _ in range(k)]
        ns = [0] * k
        for i in ids:
            c = _argmin(vectors_by_id[i], cents)
            ns[c] += 1
            for d, v in enumerate(vectors_by_id[i]):
                sums[c][d] += v
        for c in range(k):
            if ns[c]:
                cents[c] = [
                    int(math.floor(float(sums[c][d]) / float(ns[c])))
                    for d in range(dim)
                ]
    return cents


def _replica(rows, qrows):
    qx = {int(r.vec_id): _quant(r.embedding) for r in rows}
    coarse = _lloyd(qx, NLIST, COARSE_ITERS)
    assign = {i: _argmin(v, coarse) for i, v in qx.items()}
    resid = {
        i: [a - b for a, b in zip(v, coarse[assign[i]])] for i, v in qx.items()
    }
    dim = len(next(iter(qx.values())))
    sub = dim // NSUB
    books, codes = [], {i: [] for i in resid}
    for s in range(NSUB):
        sl = {i: v[s * sub : (s + 1) * sub] for i, v in resid.items()}
        book = _lloyd(sl, KCODES, PQ_ITERS)
        books.append(book)
        for i, v in sl.items():
            codes[i].append(_argmin(v, book))
    out = {}
    for r in qrows:
        qid = int(r.query_id)
        qq = _quant(r.qvec)
        cd = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qq, c)), i)
            for i, c in enumerate(coarse)
        )
        probed = [i for _d, i in cd[:NPROBE]]
        cand = []
        for nid, lst in assign.items():
            if nid == qid or lst not in probed:
                continue
            qres = [a - b for a, b in zip(qq, coarse[lst])]
            adist = 0
            for s in range(NSUB):
                qs = qres[s * sub : (s + 1) * sub]
                c = books[s][codes[nid][s]]
                adist += sum((a - b) * (a - b) for a, b in zip(qs, c))
            cand.append((adist, nid))
        cand.sort()
        for rnk, (adist, nid) in enumerate(cand[:TOPK], start=1):
            out[(qid, nid)] = (adist, rnk)
    return out


class TestIvfPqCorrectness:
    def test_matches_pure_python_replica(self, spark):
        df = _corpus(spark)
        qdf = _queries(df)
        got = {
            (int(r.query_id), int(r.neighbor_id)): (int(r.adist), int(r.rnk))
            for r in similarity.ivfpq_topk(
                df, "vec_id", "embedding", qdf,
                nlist=NLIST, nprobe=NPROBE, n_subspaces=NSUB, k_codes=KCODES,
                coarse_iters=COARSE_ITERS, pq_iters=PQ_ITERS, topk=TOPK,
            ).collect()
        }
        want = _replica(
            df.collect(),
            qdf.collect(),
        )
        assert got == want

    def test_rank_contiguous_and_no_self(self, spark):
        df = _corpus(spark)
        rows = similarity.ivfpq_topk(
            df, "vec_id", "embedding", _queries(df), topk=TOPK
        ).collect()
        per_q = {}
        for r in rows:
            assert r.neighbor_id != r.query_id
            per_q.setdefault(r.query_id, []).append((r.rnk, r.adist, r.neighbor_id))
        for q, lst in per_q.items():
            lst.sort()
            assert [t[0] for t in lst] == list(range(1, len(lst) + 1))
            # adist non-decreasing with rank, ties broken by id
            assert lst == sorted(lst, key=lambda t: (t[1], t[2]))

    def test_cells_are_disjoint_no_duplicate_pairs(self, spark):
        df = _corpus(spark)
        rows = similarity.ivfpq_topk(
            df, "vec_id", "embedding", _queries(df), topk=TOPK
        ).collect()
        pairs = [(r.query_id, r.neighbor_id) for r in rows]
        assert len(pairs) == len(set(pairs))


class TestIvfPqPlan:
    def test_probe_plan_shape(self, spark):
        # broadcast OFF: the probe's broadcast must be the operator's
        # explicit hint, not an automatic size-based pick
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = _corpus(spark)
            out = similarity.ivfpq_topk(
                df, "vec_id", "embedding", _queries(df), topk=TOPK
            )
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in plan
            assert "SortMergeJoin" not in plan
            assert plan.count("BroadcastHashJoin") == 1
            from wren_engine_spark.operators.layout import shuffle_exchanges

            # the one exchange is the per-query rank window; training
            # barriers already ran (they are collect-time scalars)
            assert shuffle_exchanges(out) == 1
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_registered_entries_agree_and_share_training(self, spark):
        from wren_engine_spark.queries.llmops10 import _ivfpq_result

        r1 = _ivfpq_result(spark, SF_DIR)
        r2 = _ivfpq_result(spark, SF_DIR)
        assert r2 is r1  # memoized: one training per (session, sf)
        rows = r1.collect()
        assert rows and all(r.rnk <= 5 for r in rows)


class TestIvfPqRecallGate:
    def test_unpruned_probe_is_full_adc_scan(self, spark):
        # nprobe == nlist scans every cell: each query must return a
        # full TOPK rows (no candidate lost to pruning), and recall
        # against the exact quantized-L2 top-k stays a valid fraction.
        # NOTE recall is NOT asserted monotone in nprobe — ADC
        # distortion can reorder candidates, which is exactly why the
        # x108 gate exists.
        df = _corpus(spark, n=80)
        qdf = _queries(df)
        got = similarity.ivfpq_topk(
            df, "vec_id", "embedding", qdf, nlist=NLIST, nprobe=NLIST,
            topk=TOPK,
        ).collect()
        per_q = {}
        for r in got:
            per_q.setdefault(int(r.query_id), []).append(int(r.neighbor_id))
        assert all(len(v) == TOPK for v in per_q.values())
        qx = {int(r.vec_id): _quant(r.embedding) for r in df.collect()}
        hits = 0
        for q in qdf.collect():
            qq = _quant(q.qvec)
            ds = sorted(
                (sum((a - b) * (a - b) for a, b in zip(qq, v)), i)
                for i, v in qx.items()
                if i != int(q.query_id)
            )
            exact = {i for _d, i in ds[:TOPK]}
            hits += sum(1 for n in per_q[int(q.query_id)] if n in exact)
        assert 0.0 <= hits / (len(per_q) * TOPK) <= 1.0


class TestIvfPqValidation:
    def test_dim_not_divisible_raises(self, spark):
        df = _corpus(spark, n=30).select(
            "vec_id", F.expr("slice(embedding, 1, 63)").alias("embedding")
        )
        # queries must match the 63-dim corpus so the early probe-dim
        # guard passes and the subspace-divisibility check is reached
        qdf = df.filter(F.col("vec_id") < 6).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        with pytest.raises(ValueError, match="not divisible"):
            similarity.ivfpq_topk(
                df, "vec_id", "embedding", qdf, n_subspaces=2
            ).collect()


class TestIvfPqPersistedIndex:
    def test_persisted_probe_bit_identical_to_inline(self, spark, tmp_path):
        df = _corpus(spark)
        qdf = _queries(df)
        inline = similarity.ivfpq_topk(
            df, "vec_id", "embedding", qdf,
            nlist=NLIST, nprobe=NPROBE, n_subspaces=NSUB, k_codes=KCODES,
            coarse_iters=COARSE_ITERS, pq_iters=PQ_ITERS, topk=TOPK,
        ).collect()
        path = str(tmp_path / "ivfpq_idx")
        info = similarity.write_ivfpq_index(
            df, "vec_id", "embedding", path,
            nlist=NLIST, n_subspaces=NSUB, k_codes=KCODES,
            coarse_iters=COARSE_ITERS, pq_iters=PQ_ITERS,
        )
        assert info["n_vectors"] == df.count()
        got = similarity.ivfpq_index_topk(
            spark, path, qdf, nprobe=NPROBE, topk=TOPK
        ).collect()
        key = lambda r: (r.query_id, r.rnk)  # noqa: E731
        assert {key(r): (r.neighbor_id, r.adist) for r in got} == {
            key(r): (r.neighbor_id, r.adist) for r in inline
        }

    def test_probe_plan_codes_only_no_embedding(self, spark, tmp_path):
        df = _corpus(spark)
        path = str(tmp_path / "ivfpq_idx2")
        similarity.write_ivfpq_index(df, "vec_id", "embedding", path)
        out = similarity.ivfpq_index_topk(spark, path, _queries(df))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "embedding" not in plan  # codes-only scan
        assert "CartesianProduct" not in plan

    def test_probe_meta_read_is_memoized(self, spark, tmp_path):
        df = _corpus(spark, n=60)
        path = str(tmp_path / "ivfpq_idx3")
        similarity.write_ivfpq_index(df, "vec_id", "embedding", path)
        m1 = similarity._load_ivfpq_index(spark, path)
        m2 = similarity._load_ivfpq_index(spark, path)
        assert m2 is m1  # cache hit: no Spark job on the second read
        # a REBUILD rewrites the sidecar files -> token misses
        similarity.write_ivfpq_index(
            df, "vec_id", "embedding", path, nlist=2, k_codes=2
        )
        m3 = similarity._load_ivfpq_index(spark, path)
        assert m3 is not m1 and int(m3[0].nlist) == 2

    def test_append_equals_rebuild_encoding(self, spark, tmp_path):
        # build on the base split, append the delta with the FROZEN
        # geometry; the codes table must equal a single build-encode
        # over base+delta using the same (base-trained) geometry
        df = _corpus(spark)
        base = df.filter(F.col("vec_id") % 4 != 0)
        delta = df.filter(F.col("vec_id") % 4 == 0)
        path = str(tmp_path / "ivfpq_app")
        similarity.write_ivfpq_index(base, "vec_id", "embedding", path)
        got = similarity.ivfpq_index_append(
            spark, path, delta, "vec_id", "embedding"
        )
        assert got["n_appended"] == delta.count()
        codes = spark.read.parquet(f"{path}/codes")
        assert codes.count() == df.count()
        # re-encode the delta manually against the frozen geometry
        meta, coarse, books = similarity._load_ivfpq_index(spark, path)
        sub = meta.dim // meta.n_subspaces
        want = similarity._ivfpq_codes(
            similarity._ivfpq_residuals(
                similarity._pq_quantize(
                    delta, "vec_id", "embedding", int(meta.quantum)
                ),
                coarse,
            ),
            books,
            sub,
            meta.n_subspaces,
        ).collect()
        appended = codes.join(
            delta.select(F.col("vec_id").alias("__id")), "__id"
        ).collect()
        # index access: attribute access on __-prefixed fields gets
        # Python-name-mangled inside a class body
        row_key = lambda r: (r["__list"], r["code_0"], r["code_1"])  # noqa: E731
        assert {int(r["__id"]): row_key(r) for r in appended} == {
            int(r["__id"]): row_key(r) for r in want
        }
        # and a probe across old + new rows ranks appended vectors
        got_probe = similarity.ivfpq_index_topk(
            spark, path, _queries(df), nprobe=NLIST, topk=TOPK
        )
        assert got_probe.count() > 0

    def test_append_wrong_dim_fails_loudly(self, spark, tmp_path):
        df = _corpus(spark, n=60)
        path = str(tmp_path / "ivfpq_dim")
        similarity.write_ivfpq_index(df, "vec_id", "embedding", path)
        bad = df.select(
            "vec_id", F.expr("slice(embedding, 1, 32)").alias("embedding")
        )
        with pytest.raises(Exception, match="vector dim"):
            similarity.ivfpq_index_append(
                spark, path, bad, "vec_id", "embedding"
            )


class TestIvfPqEpochAppend:
    def test_epoch_replay_is_idempotent(self, spark, tmp_path):
        df = _corpus(spark)
        base = df.filter(F.col("vec_id") % 5 != 0)
        delta = df.filter(F.col("vec_id") % 5 == 0)
        path = str(tmp_path / "ivfpq_epoch")
        similarity.write_ivfpq_index(base, "vec_id", "embedding", path)
        r1 = similarity.ivfpq_index_append(
            spark, path, delta, "vec_id", "embedding", epoch_id=7
        )
        assert r1["n_appended"] == delta.count()
        n_after = spark.read.parquet(f"{path}/codes").count()
        assert n_after == df.count()
        # replaying the SAME epoch is a no-op (crash-recovery replay)
        r2 = similarity.ivfpq_index_append(
            spark, path, delta, "vec_id", "embedding", epoch_id=7
        )
        assert r2.get("skipped") is True
        assert spark.read.parquet(f"{path}/codes").count() == n_after

    def test_stream_ingest_equals_batch_append(self, spark, tmp_path):
        # epoch-sliced ingestion is batching-invariant: appending the
        # delta in two epoch halves equals one batch append
        df = _corpus(spark)
        base = df.filter(F.col("vec_id") % 5 != 0)
        delta = df.filter(F.col("vec_id") % 5 == 0)
        p1 = str(tmp_path / "ivfpq_batch")
        p2 = str(tmp_path / "ivfpq_epochs")
        for p in (p1, p2):
            similarity.write_ivfpq_index(base, "vec_id", "embedding", p)
        similarity.ivfpq_index_append(spark, p1, delta, "vec_id", "embedding")
        similarity.ivfpq_index_append(
            spark, p2, delta.filter(F.col("vec_id") % 2 == 0),
            "vec_id", "embedding", epoch_id=0,
        )
        similarity.ivfpq_index_append(
            spark, p2, delta.filter(F.col("vec_id") % 2 != 0),
            "vec_id", "embedding", epoch_id=1,
        )
        row_of = lambda r: (  # noqa: E731
            int(r["__id"]), r["__list"], r["code_0"], r["code_1"]
        )
        c1 = sorted(row_of(r) for r in spark.read.parquet(f"{p1}/codes").collect())
        c2 = sorted(row_of(r) for r in spark.read.parquet(f"{p2}/codes").collect())
        assert c1 == c2
        # and the probe over either index is identical
        q = _queries(df)
        g1 = similarity.ivfpq_index_topk(spark, p1, q).collect()
        g2 = similarity.ivfpq_index_topk(spark, p2, q).collect()
        assert sorted(map(str, g1)) == sorted(map(str, g2))

    def test_compaction_preserves_ivfpq_codes(self, spark, tmp_path):
        # pq_index_compact is schema-agnostic over the codes dir and
        # honors the same epoch markers — it serves the composite too
        df = _corpus(spark)
        base = df.filter(F.col("vec_id") % 5 != 0)
        delta = df.filter(F.col("vec_id") % 5 == 0)
        path = str(tmp_path / "ivfpq_compact")
        similarity.write_ivfpq_index(base, "vec_id", "embedding", path)
        similarity.ivfpq_index_append(
            spark, path, delta, "vec_id", "embedding", epoch_id=3
        )
        before = sorted(
            str(r) for r in spark.read.parquet(f"{path}/codes").collect()
        )
        res = similarity.pq_index_compact(spark, path)
        assert res["files_after"] <= res["files_before"]
        after = sorted(
            str(r) for r in spark.read.parquet(f"{path}/codes").collect()
        )
        assert after == before


class TestIvfPqLoudValidation:
    def test_probe_wrong_query_dim_fails_loudly(self, spark, tmp_path):
        # without the guard the driver-side zips would silently
        # truncate to the shorter vector and return plausible-but-
        # wrong neighbors
        df = _corpus(spark, n=60)
        path = str(tmp_path / "ivfpq_qdim")
        similarity.write_ivfpq_index(df, "vec_id", "embedding", path)
        bad_q = df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.expr("slice(embedding, 1, 32)").alias("qvec"),
        )
        with pytest.raises(ValueError, match="dim 32, index dim is 64"):
            similarity.ivfpq_index_topk(spark, path, bad_q)
        with pytest.raises(ValueError, match="index dim"):
            similarity.ivfpq_topk(df, "vec_id", "embedding", bad_q)

    def test_nlist_exceeding_corpus_fails_loudly(self, spark):
        tiny = _corpus(spark, n=3)
        with pytest.raises(ValueError, match="at least k=4"):
            similarity.ivfpq_topk(
                tiny, "vec_id", "embedding", _queries(_corpus(spark)),
                nlist=4,
            )

    def test_null_query_vector_fails_loudly(self, spark, tmp_path):
        df = _corpus(spark, n=60)
        path = str(tmp_path / "ivfpq_nullq")
        similarity.write_ivfpq_index(df, "vec_id", "embedding", path)
        null_q = df.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.expr(
                "CASE WHEN vec_id = 0 THEN NULL ELSE embedding END"
            ).alias("qvec"),
        )
        with pytest.raises(ValueError, match="NULL vector"):
            similarity.ivfpq_index_topk(spark, path, null_q)


class TestIvfPqRetrain:
    """ivfpq_index_retrain — the tuner->retrain loop's action half
    (r8 verdict item 4): retrain on the current corpus, atomic swap,
    tombstones folded, probe API unchanged."""

    @staticmethod
    def _clustered(spark, n_clusters=4, per=20, dim=8, drift_from=0):
        import random

        rng = random.Random(5)
        rows = []
        for i in range(n_clusters * per):
            c = drift_from + (i % n_clusters)
            base = [100.0 * ((c % dim) == d) + 10.0 * c for d in range(dim)]
            rows.append((i, [b + rng.gauss(0.0, 0.5) for b in base]))
        return spark.createDataFrame(
            rows, "vec_id LONG, embedding ARRAY<FLOAT>"
        )

    @staticmethod
    def _mean_recall_at(spark, path, corpus, queries, nprobe, topk=5):
        out = similarity.ivfpq_tune_nprobe(
            spark, path, corpus, "vec_id", "embedding", queries,
            topk=topk, recall_target=2.0,  # unreachable: pure measure
        ).collect()
        return {r.nprobe: r.mean_recall for r in out}[nprobe]

    def test_recall_recovers_after_drift_retrain(self, spark, tmp_path):
        df = self._clustered(spark)
        # base = clusters 0/1 only; delta = clusters 2/3 (the drift)
        base = df.filter((F.col("vec_id") % 4) < 2)
        delta = df.filter((F.col("vec_id") % 4) >= 2)
        path = str(tmp_path / "retrain_idx")
        similarity.write_ivfpq_index(
            df=base, id_col="vec_id", vec_col="embedding", path=path,
            nlist=4, n_subspaces=2, k_codes=4,
        )
        similarity.ivfpq_index_append(
            spark, path, delta, "vec_id", "embedding"
        )
        # queries from the DRIFTED clusters — pre-retrain geometry was
        # never trained on them
        queries = df.filter(
            ((F.col("vec_id") % 4) >= 2) & (F.col("vec_id") < 8)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        nprobe = 4  # even the full scan: isolates encoding distortion
        pre = self._mean_recall_at(spark, path, df, queries, nprobe)
        stats = similarity.ivfpq_index_retrain(
            spark, path, df, "vec_id", "embedding"
        )
        assert stats["n_vectors"] == df.count()
        assert stats["n_tombstones_folded"] == 0
        post = self._mean_recall_at(spark, path, df, queries, nprobe)
        # the verdict's gate: post-retrain recall >= pre at the same
        # nprobe; with geometry this stale the gap should be strict
        assert post >= pre
        assert post > pre or pre == 1.0
        # retrained-on-current-corpus == a fresh full-corpus build
        fresh = str(tmp_path / "fresh_idx")
        similarity.write_ivfpq_index(
            df=df, id_col="vec_id", vec_col="embedding", path=fresh,
            nlist=4, n_subspaces=2, k_codes=4,
        )
        key = lambda r: (r.query_id, r.rnk, r.neighbor_id, r.adist)  # noqa: E731
        a = sorted(map(key, similarity.ivfpq_index_topk(
            spark, path, queries, nprobe=2, topk=5).collect()))
        b = sorted(map(key, similarity.ivfpq_index_topk(
            spark, fresh, queries, nprobe=2, topk=5).collect()))
        assert a == b

    def test_retrain_defaults_to_recorded_iteration_counts(
        self, spark, tmp_path
    ):
        """r10 (r9 advisor item 3): the meta sidecar now carries
        coarse_iters/pq_iters, and a default retrain reuses THEM —
        an index built with non-default iteration counts retrains to
        the same geometry a fresh build with those counts produces,
        honoring the retrained==fresh-build contract."""
        df = self._clustered(spark)
        path = str(tmp_path / "iters_idx")
        similarity.write_ivfpq_index(
            df=df, id_col="vec_id", vec_col="embedding", path=path,
            nlist=4, n_subspaces=2, k_codes=4,
            coarse_iters=3, pq_iters=2,
        )
        meta = spark.read.parquet(f"{path}/meta").collect()[0]
        assert (meta.coarse_iters, meta.pq_iters) == (3, 2)
        similarity.ivfpq_index_retrain(
            spark, path, df, "vec_id", "embedding"  # all-default retrain
        )
        meta2 = spark.read.parquet(f"{path}/meta").collect()[0]
        assert (meta2.coarse_iters, meta2.pq_iters) == (3, 2)
        fresh = str(tmp_path / "iters_fresh")
        similarity.write_ivfpq_index(
            df=df, id_col="vec_id", vec_col="embedding", path=fresh,
            nlist=4, n_subspaces=2, k_codes=4,
            coarse_iters=3, pq_iters=2,
        )
        queries = df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        key = lambda r: (r.query_id, r.rnk, r.neighbor_id, r.adist)  # noqa: E731
        a = sorted(map(key, similarity.ivfpq_index_topk(
            spark, path, queries, nprobe=2, topk=5).collect()))
        b = sorted(map(key, similarity.ivfpq_index_topk(
            spark, fresh, queries, nprobe=2, topk=5).collect()))
        assert a == b

    def test_retrain_folds_tombstones_and_clears_state(
        self, spark, tmp_path
    ):
        df = self._clustered(spark)
        path = str(tmp_path / "retrain_tomb")
        similarity.write_ivfpq_index(
            df=df, id_col="vec_id", vec_col="embedding", path=path,
            nlist=4, n_subspaces=2, k_codes=4,
        )
        similarity.pq_index_delete(spark, path, [12, 13])
        # an epoch marker from streaming ingestion must not survive
        import os

        with open(f"{path}/_epoch_7", "w", encoding="utf-8") as f:
            f.write("done\n")
        stats = similarity.ivfpq_index_retrain(
            spark, path, df, "vec_id", "embedding"  # df still has 12/13
        )
        assert stats["n_tombstones_folded"] == 2
        assert stats["n_vectors"] == df.count() - 2
        assert not os.path.isdir(f"{path}/tombstones")
        assert not os.path.isfile(f"{path}/_epoch_7")
        assert not os.path.isdir(f"{path}__retraining")
        assert not os.path.isdir(f"{path}__old")
        queries = df.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        got = similarity.ivfpq_index_topk(
            spark, path, queries, nprobe=4, topk=10_000
        )
        assert got.filter(F.col("neighbor_id").isin(12, 13)).count() == 0

    def test_crash_between_renames_recovers(self, spark, tmp_path):
        import os

        df = self._clustered(spark)
        path = str(tmp_path / "retrain_crash")
        similarity.write_ivfpq_index(
            df=df, id_col="vec_id", vec_col="embedding", path=path,
            nlist=4, n_subspaces=2, k_codes=4,
        )
        queries = df.filter(F.col("vec_id") < 2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        want = sorted(
            (r.query_id, r.rnk, r.neighbor_id, r.adist)
            for r in similarity.ivfpq_index_topk(
                spark, path, queries, nprobe=2, topk=5
            ).collect()
        )
        # simulate a crash after the first rename: live index at __old
        os.rename(path, f"{path}__old")
        similarity.ivfpq_index_retrain(spark, path, df, "vec_id", "embedding")
        got = sorted(
            (r.query_id, r.rnk, r.neighbor_id, r.adist)
            for r in similarity.ivfpq_index_topk(
                spark, path, queries, nprobe=2, topk=5
            ).collect()
        )
        assert got == want  # same corpus, same params -> same index
        assert not os.path.isdir(f"{path}__old")

    def test_retrain_refuses_object_store_path(self, spark):
        df = self._clustered(spark)
        with pytest.raises(ValueError, match="local filesystem"):
            similarity.ivfpq_index_retrain(
                spark, "s3a://bucket/idx", df, "vec_id", "embedding"
            )


class TestIvfPqRefinedProbe:
    """ivfpq_index_topk_refined — ADC shortlist + exact re-rank."""

    def _recall(self, got, exact):
        hits = sum(
            1 for (q, n) in got if (q, n) in exact
        )
        return hits / max(len(exact), 1)

    def test_refine_recall_at_least_adc_and_exact_order(
        self, spark, tmp_path
    ):
        df = _corpus(spark)
        path = str(tmp_path / "refine_idx")
        similarity.write_ivfpq_index(
            df=df, id_col="vec_id", vec_col="embedding", path=path,
            nlist=NLIST, n_subspaces=NSUB, k_codes=KCODES,
        )
        qdf = _queries(df)
        # exact ground truth: brute-force quantized L2 top-5
        vecs = {
            r.vec_id: _quant(r.embedding)
            for r in df.select("vec_id", "embedding").collect()
        }
        exact = set()
        per_query_exact = {}
        for r in qdf.collect():
            qx = _quant(r.qvec)
            d = sorted(
                (
                    sum((a - b) * (a - b) for a, b in zip(qx, vecs[i])),
                    i,
                )
                for i in vecs
                if i != r.query_id
            )[:TOPK]
            per_query_exact[r.query_id] = [(dist, i) for dist, i in d]
            exact |= {(r.query_id, i) for _d, i in d}
        raw = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivfpq_index_topk(
                spark, path, qdf, nprobe=NPROBE, topk=TOPK
            ).collect()
        }
        refined_rows = similarity.ivfpq_index_topk_refined(
            spark, path, df, "vec_id", "embedding", qdf,
            nprobe=NPROBE, shortlist=20, topk=TOPK,
        ).collect()
        refined = {(r.query_id, r.neighbor_id) for r in refined_rows}
        # the refine contract: exact ordering over the shortlist can
        # only improve recall vs cutting the ADC ranking directly
        assert self._recall(refined, exact) >= self._recall(raw, exact)
        # dist is the EXACT quantized L2 and ranks are exact-ordered
        qxs = {r.query_id: _quant(r.qvec) for r in qdf.collect()}
        for r in refined_rows:
            want = sum(
                (a - b) * (a - b)
                for a, b in zip(qxs[r.query_id], vecs[r.neighbor_id])
            )
            assert r.dist == want
        by_q = {}
        for r in refined_rows:
            by_q.setdefault(r.query_id, []).append(r)
        for rows in by_q.values():
            rows.sort(key=lambda r: r.rnk)
            ds = [(r.dist, r.neighbor_id) for r in rows]
            assert ds == sorted(ds)

    def test_refine_stage2_broadcasts_shortlist_no_corpus_shuffle(
        self, spark, tmp_path
    ):
        df = _corpus(spark)
        path = str(tmp_path / "refine_plan_idx")
        similarity.write_ivfpq_index(
            df=df, id_col="vec_id", vec_col="embedding", path=path,
            nlist=NLIST, n_subspaces=NSUB, k_codes=KCODES,
        )
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            out = similarity.ivfpq_index_topk_refined(
                spark, path, df, "vec_id", "embedding", _queries(df),
                nprobe=NPROBE, shortlist=20, topk=TOPK,
            )
            plan = out._jdf.queryExecution().executedPlan().toString()
        finally:
            if saved is None:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            else:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", saved
                )
        # the embedding scan joins the shortlist/query sides only via
        # broadcast: no sort-merge/shuffled-hash join anywhere
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastHashJoin") >= 2

    def test_refine_honors_tombstones(self, spark, tmp_path):
        df = _corpus(spark)
        path = str(tmp_path / "refine_tomb_idx")
        similarity.write_ivfpq_index(
            df=df, id_col="vec_id", vec_col="embedding", path=path,
            nlist=NLIST, n_subspaces=NSUB, k_codes=KCODES,
        )
        qdf = _queries(df)
        before = similarity.ivfpq_index_topk_refined(
            spark, path, df, "vec_id", "embedding", qdf,
            nprobe=NPROBE, shortlist=20, topk=TOPK,
        ).collect()
        victim = before[0].neighbor_id
        similarity.pq_index_delete(spark, path, [int(victim)])
        after = similarity.ivfpq_index_topk_refined(
            spark, path, df, "vec_id", "embedding", qdf,
            nprobe=NPROBE, shortlist=20, topk=TOPK,
        )
        assert after.filter(F.col("neighbor_id") == victim).count() == 0
