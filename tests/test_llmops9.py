"""Round-7 additions: brute-force property tests + scale-shape plan
asserts (the definition-of-done discipline from the round-5 verdict).

Batch 1: x14's retirement from rows-only — trained-IVF on the
bit-exact quantized Lloyd trainer."""

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from wren_engine_spark.operators import similarity
from wren_engine_spark.queries.registry import QUERIES


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


class TestX14TrainedIVF:
    def _trained_cents(self, spark, emb, k, quantum=1_000_000):
        km = similarity.kmeans_quantized(
            emb, "vec_id", "embedding", k=k, iters=2, quantum=quantum
        )
        got = {(r.cluster, r.dim): r.centroid_q for r in km.collect()}
        dim = 1 + max(d for _, d in got)
        return [
            [got[(c, d)] / float(quantum) for d in range(dim)] for c in range(k)
        ]

    def test_full_probe_on_trained_centroids_equals_brute_force(self, spark):
        # with nprobe == nlist the IVF scan is exhaustive, so the
        # trained-centroid composition must reproduce exact cosine
        # top-k regardless of what the training converged to
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        cents = self._trained_cents(spark, emb, k=4)
        bf = {
            (r.query_id, r.rnk): r.neighbor_id
            for r in similarity.cosine_topk(
                emb, "vec_id", "embedding", queries, k=4
            ).collect()
        }
        ivf = {
            (r.query_id, r.rnk): r.neighbor_id
            for r in similarity.ivf_topk(
                emb, "vec_id", "embedding", queries, dim=64,
                k=4, nlist=4, nprobe=4, centroids=cents,
            ).collect()
        }
        assert ivf == bf

    def test_trained_centroids_are_reproducible(self, spark):
        # the whole point of the quantized trainer: two independent
        # runs produce IDENTICAL centroids (floats trained by
        # partition-order-dependent sums would not)
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        a = self._trained_cents(spark, emb, k=4)
        b = self._trained_cents(spark, emb.repartition(7), k=4)
        assert a == b

    def test_x14_registered_query_shape(self, spark):
        df = QUERIES["x14_ivf_ann"](spark, SF_DIR)
        rows = df.collect()
        assert df.columns == ["query_id", "neighbor_id", "cosine_sim", "rnk"]
        per_q = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r.rnk)
        assert len(per_q) == 10
        for q, rnks in per_q.items():
            assert sorted(rnks) == list(range(1, len(rnks) + 1)), q

    def test_x14_plan_no_cartesian_broadcast_probe(self, spark):
        # probe join must ride the broadcast query side; the corpus is
        # never cartesian-joined against centroids or queries
        df = QUERIES["x14_ivf_ann"](spark, SF_DIR)
        p = _plan(df)
        assert "CartesianProduct" not in p
        assert "BroadcastHashJoin" in p
