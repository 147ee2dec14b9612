"""Round-6 additions (x68-x70): brute-force property tests + the
scale-shape plan asserts the round-5 verdict made part of the
definition of done."""

import itertools

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from wren_engine_spark.operators import dedup
from wren_engine_spark.queries.registry import QUERIES


class TestX68ClusterBestRepresentative:
    def test_rep_is_cluster_argmax_quality(self, spark):
        out = QUERIES["x68_cluster_best_representative"](spark, SF_DIR)
        from wren_engine_spark.operators import text
        from wren_engine_spark.queries.io import load_tables

        d = load_tables(spark, SF_DIR, "documents")["documents"]
        q = {
            r.doc_id: r.quality_score
            for r in text.quality_score(d, "text", "doc_id").collect()
        }
        rows = out.collect()
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r)
        for cid, members in by_cluster.items():
            reps = {r.rep_id for r in members}
            assert len(reps) == 1, f"cluster {cid} has {reps}"
            rep = reps.pop()
            # argmax quality, doc_id tie-break
            best = min(members, key=lambda r: (-q[r.doc_id], r.doc_id))
            assert rep == best.doc_id
            kept = [r.doc_id for r in members if r.kept]
            assert kept == [rep]

    def test_every_doc_labeled_exactly_once(self, spark):
        out = QUERIES["x68_cluster_best_representative"](spark, SF_DIR)
        ids = [r.doc_id for r in out.select("doc_id").collect()]
        assert len(ids) == len(set(ids))

    def test_plan_window_is_cluster_partitioned(self, spark):
        # the pairs/CC stages inherit x3's skew-proof default (their
        # plan asserts live in test_plans.py; the CC iteration
        # materializes, so they are not part of THIS query's lineage).
        # x68's own addition — the argmax — must be a window
        # partitioned by cluster_id (bounded by near-dup cluster
        # size), never by a corpus-wide or constant key.
        df = QUERIES["x68_cluster_best_representative"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        win_lines = [
            l for l in plan.splitlines() if "windowspecdefinition" in l
        ]
        assert win_lines, "argmax window expected"
        for l in win_lines:
            assert "windowspecdefinition(cluster_id" in l, l.strip()[:120]


class TestX69BigramLift:
    def test_matches_brute_force(self, spark):
        docs = [
            (0, "new york is a big city"),
            (1, "new york has new parks"),
            (2, "the city of new york"),
            (3, "big parks in the city"),
            (4, "new york new york new york"),
        ]
        df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
        toks = {i: t.split() for i, t in docs}
        uni, bi, n = {}, {}, 0
        for ts in toks.values():
            for t in ts:
                uni[t] = uni.get(t, 0) + 1
                n += 1
            for a, b in zip(ts, ts[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        want = {
            (a, b): (c * float(n)) / (float(uni[a]) * float(uni[b]))
            for (a, b), c in bi.items()
            if c >= 3
        }
        # the registered entry reads parquet; replicate its exact plan
        # on the in-memory frame (min-count 3 keeps only 'new york')
        t = df.select(
            "doc_id",
            F.split(F.trim(F.lower(F.col("text"))), r"[ \t\n\x0B\f\r]+").alias("__t"),
        )
        big = (
            t.filter(F.size("__t") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(__t) - 2), "
                        "i -> struct(__t[i] AS t1, __t[i + 1] AS t2))"
                    )
                ).alias("b")
            )
            .select("b.t1", "b.t2")
            .groupBy("t1", "t2")
            .agg(F.count(F.lit(1)).alias("c_ab"))
            .filter(F.col("c_ab") >= 3)
        )
        tok = t.select(F.explode("__t").alias("tok"))
        unif = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
        nf = tok.agg(F.count(F.lit(1)).alias("n"))
        got = {
            (r.t1, r.t2): r.lift
            for r in big.join(
                unif.select(F.col("tok").alias("t1"), F.col("c").alias("__ca")), "t1"
            )
            .join(unif.select(F.col("tok").alias("t2"), F.col("c").alias("__cb")), "t2")
            .crossJoin(F.broadcast(nf))
            .select(
                "t1", "t2",
                (
                    (F.col("c_ab").cast("double") * F.col("n").cast("double"))
                    / (F.col("__ca").cast("double") * F.col("__cb").cast("double"))
                ).alias("lift"),
            )
            .collect()
        }
        assert got == want
        assert ("new", "york") in got

    def test_plan_agg_fed_exchanges_only(self, spark):
        df = QUERIES["x69_bigram_lift"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        lines = plan.splitlines()
        for i, l in enumerate(lines):
            # every token/bigram-keyed exchange must sit above a partial
            # aggregate — raw occurrence rows never shuffle on a token key
            if "Exchange hashpartitioning(t1" in l or \
                    "Exchange hashpartitioning(tok" in l:
                tail = "\n".join(lines[i + 1 : i + 4])
                assert "partial_count" in tail, l.strip()[:120]


class TestX70IncrementalSimhashProbe:
    def test_matches_brute_force_cross_hamming(self, spark):
        from wren_engine_spark.queries.io import load_tables

        d = load_tables(spark, SF_DIR, "documents")["documents"]
        sigs = {
            r.doc_id: r.simhash
            for r in dedup.simhash_portable(d, "text", "doc_id").collect()
        }
        want = {
            (a, b): bin(sigs[a] ^ sigs[b]).count("1")
            for a, b in itertools.product(sigs, sigs)
            if a % 10 == 0 and b % 10 != 0
            and bin(sigs[a] ^ sigs[b]).count("1") <= 3
        }
        got = {
            (r.delta_id, r.corpus_id): r.hamming
            for r in QUERIES["x70_incremental_simhash_probe"](
                spark, SF_DIR
            ).collect()
        }
        assert got == want

    def test_probe_never_shuffles_index(self, spark):
        # the build-once/probe-many contract: batch signatures
        # broadcast, index streaming — no exchange keyed on the banded
        # signature anywhere, even with auto-broadcast off
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            df = QUERIES["x70_incremental_simhash_probe"](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        finally:
            if saved is None:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            else:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        assert "BroadcastHashJoin [band" in plan
        assert "Exchange hashpartitioning(band" not in plan
        assert "Exchange hashpartitioning(val" not in plan

    def test_probe_reuses_persisted_table(self, spark):
        """Second call must NOT rebuild the index (memoized), and the
        probe must read the bucketed table, not the corpus pipeline."""
        QUERIES["x70_incremental_simhash_probe"](spark, SF_DIR).count()
        df = QUERIES["x70_incremental_simhash_probe"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "simhash_idx_" in plan  # scans the persisted table
        df.count()


class TestInRowSimhashKernel:
    def test_bit_identical_to_exploded_form(self, spark):
        from wren_engine_spark.queries.io import load_tables

        d = load_tables(spark, SF_DIR, "documents")["documents"]
        a = {
            r.doc_id: r.simhash
            for r in dedup.simhash_portable(d, "text", "doc_id").collect()
        }
        b = {
            r.doc_id: r.s
            for r in d.select(
                "doc_id", dedup.simhash_portable_expr("text").alias("s")
            ).collect()
        }
        assert {k: b[k] for k in a} == a  # every exploded sig matches

    def test_regex_class_survives_sql_literal_escaping(self, spark):
        """The whitespace class sits inside a SQL string literal, which
        unescapes backslashes before the regex engine runs — without
        doubling, '\\x0B' decays into literal x/0/B characters and
        'fox' splits on its own x (the bug found building t13)."""
        d = spark.createDataFrame(
            [(0, "the quick brown fox")], "doc_id LONG, text STRING"
        )
        got = d.select(dedup.simhash_portable_expr("text").alias("s")).collect()
        want = dedup.simhash_portable(d, "text", "doc_id").collect()
        assert got[0].s == want[0].simhash

    def test_expr_is_map_only(self, spark):
        d = spark.createDataFrame([(0, "a b c")], "doc_id LONG, text STRING")
        plan = (
            d.select(dedup.simhash_portable_expr("text").alias("s"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Generate" not in plan


class TestT13StreamingProbe:
    def test_stream_and_batch_paths_agree(self, spark):
        got_stream = {
            (r.delta_id, r.corpus_id): r.hamming
            for r in QUERIES["t13_stream_incremental_dedup_probe"](
                spark, SF_DIR
            ).collect()
        }
        got_batch = {
            (r.delta_id, r.corpus_id): r.hamming
            for r in QUERIES["x70_incremental_simhash_probe"](
                spark, SF_DIR
            ).collect()
        }
        assert got_stream == got_batch

    def test_multi_microbatch_incremental_arrival(self, spark, tmp_path):
        """Ingestion batches arriving across several microbatches (one
        file per trigger) must produce exactly the batch probe's pairs:
        the signature computation is map-side per row and the index is
        static, so no cross-batch state is needed — each doc's matches
        are complete in its own microbatch."""
        from wren_engine_spark.queries.io import load_tables
        from wren_engine_spark.streaming.ops import run_available_now

        d = load_tables(spark, SF_DIR, "documents")["documents"]
        corpus = d.filter(F.col("doc_id") % 10 != 0)
        delta = d.filter(
            (F.col("doc_id") % 10 == 0) & (F.length(F.trim("text")) > 0)
        )
        table = "simhash_idx_multibatch_t"
        dedup.write_simhash_index(corpus, "text", "doc_id", table)
        path = str(tmp_path / "delta")
        delta.withColumn("__f", F.col("doc_id") % 4).write.partitionBy(
            "__f"
        ).mode("overwrite").parquet(path)
        src = (
            spark.readStream.schema(delta.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(path)
        )
        bands, width = 4, 8
        mask = (1 << width) - 1
        sig = src.select(
            F.col("doc_id").alias("delta_id"),
            dedup.simhash_portable_expr("text").alias("__ds"),
        )
        band_arr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("__ds"), i * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("val"),
                )
                for i in range(bands)
            ]
        )
        q = sig.select(
            "delta_id", "__ds", F.explode(band_arr).alias("b")
        ).select("delta_id", "__ds", F.col("b.band").alias("band"),
                 F.col("b.val").alias("val"))
        hits = (
            q.join(spark.table(table), ["band", "val"])
            .filter(F.col("corpus_id") != F.col("delta_id"))
            .select(
                "delta_id", "corpus_id",
                F.bit_count(F.expr("corpus_simhash ^ __ds")).cast("int").alias(
                    "hamming"
                ),
            )
            .filter(F.col("hamming") <= 3)
            .dropDuplicates(["delta_id", "corpus_id"])
        )
        got = {
            (r.delta_id, r.corpus_id): r.hamming
            for r in run_available_now(
                spark, hits, "t13_multibatch_sink", "append"
            ).collect()
        }
        want = {
            (r.delta_id, r.corpus_id): r.hamming
            for r in dedup.simhash_index_probe(
                spark, table, delta, "text", "doc_id"
            ).collect()
        }
        assert got == want and len(got) > 0


class TestX71MixingSchedule:
    def test_sources_balanced_and_deterministic(self, spark):
        from wren_engine_spark.operators import selection
        from wren_engine_spark.queries.io import load_tables

        d = load_tables(spark, SF_DIR, "documents")["documents"]
        out = selection.mixing_schedule(d, "source", "doc_id").collect()
        again = selection.mixing_schedule(d, "source", "doc_id").collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))
        per = {}
        for r in out:
            per[r.source] = per.get(r.source, 0) + 1
        counts = sorted(per.values())
        # expectation: keep_fraction * total / n_sources per source;
        # binomial noise at these sizes stays well within 3x
        assert counts[-1] <= 3 * max(counts[0], 1), per
        # per-shard positions are dense 1..k
        by_shard = {}
        for r in out:
            by_shard.setdefault(r.shard, []).append(r.pos)
        for ps in by_shard.values():
            assert sorted(ps) == list(range(1, len(ps) + 1))

    def test_small_source_keeps_everything(self, spark):
        """p caps at 1: a tiny domain is never down-sampled (upsampling
        is a repetition policy, not this operator's job)."""
        from wren_engine_spark.operators import selection

        rows = [(i, "big") for i in range(1000)] + [
            (10_000 + i, "tiny") for i in range(5)
        ]
        df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
        out = selection.mixing_schedule(df, "source", "doc_id").collect()
        kept_tiny = [r for r in out if r.source == "tiny"]
        assert len(kept_tiny) == 5  # all kept: threshold capped at max

    def test_plan_broadcasts_thresholds(self, spark):
        df = QUERIES["x71_mixing_schedule"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin [source" in plan
        assert "BatchEvalPython" not in plan
        # the only windows are shard-partitioned (bounded per shard)
        for l in plan.splitlines():
            if "windowspecdefinition" in l:
                assert "windowspecdefinition(shard" in l, l.strip()[:120]


class TestX72RepetitionSchedule:
    def test_expected_contribution_equal(self, spark):
        """Skewed corpus: 900 docs of 'big', 100 of 'small' -> w_big =
        1000/(2*900) ≈ 0.56, w_small = 1000/(2*100) = 5. Every small
        doc gets 5 copies exactly (frac 0); big docs get 0 or 1 with
        P ≈ 0.56 — per-source output within binomial noise of 500."""
        rows = [(i, "big") for i in range(900)] + [
            (10_000 + i, "small") for i in range(100)
        ]
        df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
        from wren_engine_spark.operators import selection

        out = selection.repetition_schedule(df, "source", "doc_id").collect()
        per = {}
        copies = {}
        for r in out:
            per[r.source] = per.get(r.source, 0) + 1
            copies.setdefault(r.doc_id, []).append(r.copy_idx)
        assert per["small"] == 500  # deterministic: exactly 5 copies each
        assert abs(per["big"] - 500) < 100  # Bernoulli(5/9) over 900 draws
        for doc, idxs in copies.items():
            assert sorted(idxs) == list(range(1, len(idxs) + 1))
            if doc >= 10_000:
                assert len(idxs) == 5

    def test_deterministic(self, spark):
        from wren_engine_spark.operators import selection
        from wren_engine_spark.queries.io import load_tables

        d = load_tables(spark, SF_DIR, "documents")["documents"]
        a = sorted(map(tuple, selection.repetition_schedule(d).collect()))
        b = sorted(map(tuple, selection.repetition_schedule(d).collect()))
        assert a == b and len(a) > 0

    def test_plan_is_broadcast_and_narrow(self, spark):
        df = QUERIES["x72_repetition_schedule"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin [source" in plan
        assert "BatchEvalPython" not in plan
        assert "windowspecdefinition" not in plan  # no window at all


class TestX73IngestDecisions:
    def test_planted_batch_twins_accept_one(self, spark):
        """Two near-identical docs arriving in one batch with no corpus
        counterpart: exactly ONE accepted (the min id). A batch doc
        near-duplicating the corpus: whole cluster rejected."""
        corpus_rows = [(i * 10 + 1, f"corpus doc {i} " + " ".join(
            f"c{i}w{j}" for j in range(20))) for i in range(50)]
        base = "the shared boilerplate text body repeated across twins " + \
            " ".join(f"tw{j}" for j in range(15))
        batch_rows = [
            (100, base), (110, base + " zz"),          # twins, no corpus dup
            (120, corpus_rows[0][1]),                   # exact corpus dup
            (130, "totally unique fresh content " + " ".join(
                f"u{j}" for j in range(20))),
        ]
        corpus = spark.createDataFrame(corpus_rows, "doc_id LONG, text STRING")
        delta = spark.createDataFrame(batch_rows, "doc_id LONG, text STRING")
        table = "simhash_idx_ingest_t"
        dedup.write_simhash_index(corpus, "text", "doc_id", table)
        out = {
            r.doc_id: (r.cluster_id, r.corpus_dup, r.accepted)
            for r in dedup.ingest_decisions(
                spark, table, delta, "text", "doc_id"
            ).collect()
        }
        assert out[100] == (100, False, True)   # twin rep accepted
        assert out[110][0] == 100 and out[110][2] is False  # twin rejected
        assert out[120] == (120, True, False)   # corpus dup rejected
        assert out[130] == (130, False, True)   # fresh doc accepted

    def test_registered_matches_brute_force_acceptance(self, spark):
        from wren_engine_spark.queries.io import load_tables

        d = load_tables(spark, SF_DIR, "documents")["documents"]
        sigs = {
            r.doc_id: r.simhash
            for r in dedup.simhash_portable(d, "text", "doc_id").collect()
        }
        delta = sorted(k for k in sigs if k % 10 == 0)
        corpus = [k for k in sigs if k % 10 != 0]

        def ham(a, b):
            return bin(sigs[a] ^ sigs[b]).count("1")

        # brute-force clusters over the batch
        parent = {k: k for k in delta}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, a in enumerate(delta):
            for b in delta[i + 1:]:
                if ham(a, b) <= 3:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        cdup = {
            a: any(ham(a, b) <= 3 for b in corpus) for a in delta
        }
        want = {}
        for a in delta:
            cid = find(a)
            members = [x for x in delta if find(x) == cid]
            any_dup = any(cdup[m] for m in members)
            want[a] = (cid, cdup[a], a == cid and not any_dup)
        got = {
            r.doc_id: (r.cluster_id, r.corpus_dup, r.accepted)
            for r in QUERIES["x73_ingest_decisions"](spark, SF_DIR).collect()
        }
        assert got == want


class TestX74CountMin:
    def test_overestimate_and_error_bound(self, spark):
        """CMS never underestimates, and on this fixed corpus every
        top-20 estimate stays within the e/w * N envelope (the
        probabilistic bound, pinned deterministically here — it either
        holds on this corpus or the operator broke)."""
        import math

        from wren_engine_spark.operators import text as tx
        from wren_engine_spark.queries.io import load_tables

        d = load_tables(spark, SF_DIR, "documents")["documents"]
        rows = tx.count_min_estimates(d, "text", "doc_id").collect()
        assert len(rows) == 20
        n_tokens = (
            d.select(
                F.explode(F.split(F.lower("text"), r"[ \t\n\x0B\f\r]+")).alias("t")
            )
            .filter(F.length("t") > 0)
            .count()
        )
        bound = math.e / 256 * n_tokens
        for r in rows:
            assert r.cms_estimate >= r.exact_count, r
            assert r.cms_estimate - r.exact_count <= bound, (r, bound)

    def test_matches_python_sketch_brute_force(self, spark):
        docs = [(0, "a b a c a b"), (1, "b c d d d"), (2, "a d e")]
        df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
        from wren_engine_spark.operators import text as tx

        got = {
            r.tok: (r.exact_count, r.cms_estimate)
            for r in tx.count_min_estimates(
                df, "text", "doc_id", top_k=5
            ).collect()
        }

        def th(t):
            acc = 0
            for ch in t:
                acc = (acc * 31 + ord(ch)) % 2147483647
            return acc

        A = [16807, 48271, 69621, 40692]
        toks = [t for _, s in docs for t in s.split()]
        cells = {}
        for t in toks:
            for r in range(4):
                col = (th(t) * A[r] + (97 + 131 * r)) % 2147483647 % 256
                cells[(r, col)] = cells.get((r, col), 0) + 1
        exact = {}
        for t in toks:
            exact[t] = exact.get(t, 0) + 1
        want = {}
        for t in sorted(exact, key=lambda t: (-exact[t], t))[:5]:
            est = min(
                cells[
                    (r, (th(t) * A[r] + (97 + 131 * r)) % 2147483647 % 256)
                ]
                for r in range(4)
            )
            want[t] = (exact[t], est)
        assert got == want

    def test_plan_one_combinable_agg_no_python(self, spark):
        df = QUERIES["x74_count_min_estimates"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        lines = plan.splitlines()
        for i, l in enumerate(lines):
            if "Exchange hashpartitioning(r#" in l or \
                    "Exchange hashpartitioning(tok" in l:
                tail = "\n".join(lines[i + 1 : i + 4])
                # count aggs AND the final min-of-rows agg both combine
                # map-side
                assert "partial_" in tail, l.strip()[:120]


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_corpora = st.lists(
    st.tuples(st.integers(min_value=0, max_value=50_000),
              st.sampled_from(["a", "b", "c", "d"])),
    min_size=1, max_size=60, unique_by=lambda t: t[0],
)

M = 2147483647


def _mix_brute(rows, keep_fraction=0.5, seed=137, n_shards=8):
    ns = {}
    for _, s in rows:
        ns[s] = ns.get(s, 0) + 1
    td, nsrc = len(rows), len(ns)
    out = []
    for i, s in rows:
        thr = min(
            int((keep_fraction * (float(td) / float(nsrc * ns[s]))) * 2147483647.0),
            2147483647,
        )
        h = ((i * 31 + seed) % M) * ((i * 48271 + seed + 7) % M) % M
        if h < thr:
            shard = ((i * 131 + seed + 37) % M) * ((i * 40692 + seed + 41) % M) % M % n_shards
            ph = ((i * 37 + seed + 13) % M) * ((i * 69621 + seed + 29) % M) % 1_000_000_007
            out.append((i, s, shard, ph))
    by_shard = {}
    for i, s, shard, ph in out:
        by_shard.setdefault(shard, []).append((ph, i, s))
    want = {}
    for shard, members in by_shard.items():
        for pos, (ph, i, s) in enumerate(sorted(members), start=1):
            want[i] = (s, shard, pos)
    return want


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_corpora)
def test_mixing_schedule_matches_integer_brute_force(spark, rows):
    from wren_engine_spark.operators import selection

    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    got = {
        r.doc_id: (r.source, r.shard, r.pos)
        for r in selection.mixing_schedule(df, "source", "doc_id").collect()
    }
    assert got == _mix_brute(rows)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_corpora)
def test_repetition_schedule_matches_integer_brute_force(spark, rows):
    import math

    from wren_engine_spark.operators import selection

    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    ns = {}
    for _, s in rows:
        ns[s] = ns.get(s, 0) + 1
    td, nsrc = len(rows), len(ns)
    seed = 211
    want = {}
    for i, s in rows:
        w = float(td) / float(nsrc * ns[s])
        base = int(math.floor(w))
        fthr = int(math.floor((w - math.floor(w)) * 2147483647.0))
        h = ((i * 31 + seed) % M) * ((i * 48271 + seed + 7) % M) % M
        nc = base + (1 if h < fthr else 0)
        if nc >= 1:
            want[(i, s)] = list(range(1, nc + 1))
    got = {}
    for r in selection.repetition_schedule(df, "source", "doc_id").collect():
        got.setdefault((r.doc_id, r.source), []).append(r.copy_idx)
    assert {k: sorted(v) for k, v in got.items()} == want


class TestM6LinearInterpolation:
    def test_reconstruction_math(self, spark):
        """Planted series: observations at days 1 and 4 with values 10
        and 40 — days 2 and 3 must read 20 and 30; before the first and
        after the last observation the edge holds."""
        import datetime

        from pyspark.sql import Window as W

        rows = [
            ("p", datetime.date(2020, 1, 1), 10.0),
            ("p", datetime.date(2020, 1, 4), 40.0),
        ]
        base = spark.createDataFrame(
            rows, "priority STRING, day DATE, revenue DOUBLE"
        )
        spine = spark.sql(
            "SELECT explode(sequence(DATE '2019-12-31', DATE '2020-01-05', "
            "INTERVAL 1 DAY)) AS day"
        )
        grid = base.select("priority").distinct().crossJoin(spine)
        wp = W.partitionBy("priority").orderBy("day").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        wn = W.partitionBy("priority").orderBy("day").rowsBetween(
            W.currentRow, W.unboundedFollowing
        )
        obs_day = F.when(F.col("revenue").isNotNull(), F.col("day"))
        j = grid.join(base, ["priority", "day"], "left").select(
            "day", "revenue",
            F.last("revenue", ignorenulls=True).over(wp).alias("pv"),
            F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
            F.first("revenue", ignorenulls=True).over(wn).alias("nv"),
            F.first(obs_day, ignorenulls=True).over(wn).alias("nd"),
        )
        frac = F.datediff("day", "pd").cast("double") / F.datediff(
            "nd", "pd"
        ).cast("double")
        interp = (
            F.when(F.col("revenue").isNotNull(), F.col("revenue"))
            .when(F.col("pv").isNull() | F.col("nv").isNull(),
                  F.coalesce("pv", "nv"))
            .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        )
        got = {
            str(r.day): r.v
            for r in j.select("day", interp.alias("v")).collect()
        }
        assert got["2020-01-02"] == 20.0 and got["2020-01-03"] == 30.0
        assert got["2019-12-31"] == 10.0  # edge holds nearest
        assert got["2020-01-05"] == 40.0

    def test_plan_single_series_shuffle(self, spark):
        df = QUERIES["m6_linear_interpolation"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # all four fills ride ONE priority-partitioned sort pipeline;
        # windows must be priority-keyed, never day- or global-keyed
        for l in plan.splitlines():
            if "windowspecdefinition" in l:
                assert "windowspecdefinition(priority" in l, l.strip()[:120]


class TestX75QualityFloor:
    def test_per_source_decile_dropped(self, spark):
        from wren_engine_spark.queries.io import load_tables
        from wren_engine_spark.operators import text as tx

        rows = QUERIES["x75_quality_floor"](spark, SF_DIR).collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source, []).append(r)
        for src, members in by_src.items():
            qs = sorted(m.quality_score for m in members)
            import math

            # numpy-style linear interpolation (type-7), the
            # percentile()/quantile_cont definition
            h = (len(qs) - 1) * 0.1
            lo, g = int(math.floor(h)), h - math.floor(h)
            want_p10 = qs[lo] + g * (qs[min(lo + 1, len(qs) - 1)] - qs[lo])
            assert abs(members[0].src_p10 - want_p10) < 1e-9, src
            kept = [m for m in members if m.kept]
            # at least ~85% survive their own-source floor (ties can
            # keep slightly more than 90%)
            assert len(kept) >= 0.85 * len(members), src
            assert all(m.quality_score >= m.src_p10 for m in kept)

    def test_plan_threshold_broadcast(self, spark):
        df = QUERIES["x75_quality_floor"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin [source" in plan
        assert "BatchEvalPython" not in plan
