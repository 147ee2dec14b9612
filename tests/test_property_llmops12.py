"""Property-based tests (hypothesis) for the persisted BM25 index:
arbitrary append splits and delete sets on random tiny corpora vs the
direct bm25_topk ranking / a filtered rebuild — the tokenization,
tie-break, and statistics edge cases a fixed fixture can miss
(duplicate tokens, empty docs, whitespace-only docs, deleting every
match, deleting the query itself)."""

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wren_engine_spark.operators import retrieval

_ST = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
_N = 24


def _docs_df(spark, seed: int):
    rng = random.Random(seed)
    rows = []
    for i in range(_N):
        n_tok = rng.randint(0, 6)
        # duplicates on purpose: tf > 1 paths; blank docs: dl = 0 paths
        text = " ".join(rng.choice(_VOCAB) for _ in range(n_tok))
        if rng.random() < 0.15:
            text = "   " if rng.random() < 0.5 else ""
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


class TestBm25IndexProperties:
    @given(seed=st.integers(0, 10_000), cut=st.integers(2, 5))
    @settings(**_ST)
    def test_any_append_split_equals_direct_ranking(self, spark, seed, cut):
        """Build on an arbitrary split, append the rest: the probe must
        equal bm25_topk over the whole corpus bit-for-bit (append ≡
        rebuild ≡ direct, for ANY split)."""
        docs = _docs_df(spark, seed)
        base = docs.filter(F.col("doc_id") % cut != 0)
        delta = docs.filter(F.col("doc_id") % cut == 0)
        retrieval.write_bm25_index(
            base, "text", "doc_id", "bm25_prop", buckets=4, doc_buckets=4
        )
        retrieval.bm25_index_append(spark, "bm25_prop", delta, "text", "doc_id")
        queries = docs.filter(F.col("doc_id") < 3)
        got = sorted(
            (r.query_id, r.rnk, r.doc_id, r.bm25)
            for r in retrieval.bm25_index_probe(
                spark, "bm25_prop", queries.select("doc_id", "text"),
                "text", "doc_id", k=5,
            ).collect()
        )
        want = sorted(
            (r.query_id, r.rnk, r.doc_id, r.bm25)
            for r in retrieval.bm25_topk(
                docs, "doc_id", "text", queries.select("doc_id"), k=5
            ).collect()
        )
        assert got == want

    @given(
        seed=st.integers(0, 10_000),
        dels=st.sets(st.integers(0, _N - 1), max_size=_N),
    )
    @settings(**_ST)
    def test_any_delete_set_equals_filtered_rebuild(self, spark, seed, dels):
        """Tombstoning ANY id set (possibly empty, possibly everything,
        possibly including the queries) must equal a fresh build over
        the surviving corpus — N/avgdl/df all shrink."""
        docs = _docs_df(spark, seed)
        retrieval.write_bm25_index(
            docs, "text", "doc_id", "bm25_prop_d", buckets=4, doc_buckets=4
        )
        retrieval.bm25_index_delete(spark, "bm25_prop_d", sorted(dels))
        queries = docs.filter(F.col("doc_id") < 3).select("doc_id", "text")
        got = sorted(
            (r.query_id, r.rnk, r.doc_id, r.bm25)
            for r in retrieval.bm25_index_probe(
                spark, "bm25_prop_d", queries, "text", "doc_id", k=5
            ).collect()
        )
        survivors = docs.filter(~F.col("doc_id").isin(list(dels)) if dels
                                else F.lit(True))
        retrieval.write_bm25_index(
            survivors, "text", "doc_id", "bm25_prop_want",
            buckets=4, doc_buckets=4,
        )
        want = sorted(
            (r.query_id, r.rnk, r.doc_id, r.bm25)
            for r in retrieval.bm25_index_probe(
                spark, "bm25_prop_want", queries, "text", "doc_id", k=5
            ).collect()
        )
        assert got == want
        assert not any(r[2] in dels for r in got)
