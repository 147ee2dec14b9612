"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set and
scan the corpus once; all arithmetic is JVM-side higher-order functions
(zip_with/aggregate), no Python. Dot products and norms accumulate in
DECIMAL so the result is exact and order-independent (hash-matches the
DuckDB oracle bit-for-bit; see queries/registry.py on determinism).

Scale path: random-hyperplane LSH bucketing — each vector maps to a
``nbits``-bit signature; neighbor search only compares vectors sharing a
bucket. At 100 TB this turns a full cross product into a bucket-local
join; recall is tuned by nbits / multiple tables.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# decimal(25,15): addition yields decimal(26,15) (no precision loss —
# Spark would truncate 38,15 sums to scale 14); cast back keeps the
# accumulator type stable and every step exact.
_DEC = "decimal(25,15)"


def _dot_dec(a, b) -> F.Column:
    """Exact decimal dot product of two float arrays, as double."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC))
    return F.aggregate(prods, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)).cast(
        "double"
    )


def _norm2_dec(a) -> F.Column:
    sq = F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(_DEC))
    return F.aggregate(sq, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)).cast(
        "double"
    )


def with_norm(df: DataFrame, vec_col: str, out_col: str = "norm2") -> DataFrame:
    return df.withColumn(out_col, _norm2_dec(F.col(vec_col)))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_df: DataFrame,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k: for each row of ``query_df`` (columns:
    query_id, qvec) return the k nearest corpus vectors.

    Returns (query_id, neighbor_id, cosine_sim, rnk). Ties broken by
    neighbor id for full determinism.
    """
    from pyspark.sql import Window as W

    corpus = with_norm(df, vec_col, "__vn").select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"), "__vn"
    )
    queries = with_norm(query_df, "qvec", "__qn").select("query_id", F.col("qvec").alias("__q"), "__qn")
    sim = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_dec(F.col("__q"), F.col("__v"))
                / (F.sqrt(F.col("__qn")) * F.sqrt(F.col("__vn")))
            ).alias("__sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__sim"), round_digits).alias("cosine_sim"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def hyperplane_signatures(
    df: DataFrame, id_col: str, vec_col: str, dim: int, nbits: int = 16, seed: int = 42
) -> DataFrame:
    """Random-hyperplane LSH: sign(v . h_j) bits packed into a bigint
    bucket id. The plane matrix is tiny (nbits x dim) and broadcast as a
    literal array — no shuffle at all; one narrow map over the corpus."""
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nbits)]
    sig = F.lit(0).cast("long")
    v = F.col(vec_col)
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(v, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        )
    return df.select(F.col(id_col), v.alias(vec_col), sig.alias("bucket"))


def lsh_ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 3,
    nbits: int = 12,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate nearest neighbors: ``tables`` independent hyperplane
    hash tables (OR-amplification — recall for sim s is
    1-(1-p(s)^nbits)^tables with p(s)=1-arccos(s)/pi), bucket-local exact
    cosine, global top-k per query over the union of candidates.

    Returns (query_id, neighbor_id, cosine_sim, rnk). At 100 TB each
    table is one narrow map (signature) + one bucket-key shuffle; the
    cross product never materializes — cost follows bucket occupancy,
    tuned by nbits.
    """
    from pyspark.sql import Window as W

    normed = with_norm(df, vec_col, "__n")
    cand = None
    for t in range(tables):
        sig = hyperplane_signatures(normed, id_col, vec_col, dim, nbits, seed + 1000 * t)
        a = sig.select(F.col(id_col).alias("query_id"), "bucket")
        b = sig.select(F.col(id_col).alias("neighbor_id"), "bucket")
        pairs = (
            a.join(b, "bucket")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
        )
        cand = pairs if cand is None else cand.unionAll(pairs)
    cand = cand.distinct()
    qside = normed.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q"), F.col("__n").alias("__qn")
    )
    vside = normed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"), F.col("__n").alias("__vn")
    )
    scored = (
        cand.join(qside, "query_id")
        .join(vside, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot_dec(F.col("__q"), F.col("__v"))
                / (F.sqrt(F.col("__qn")) * F.sqrt(F.col("__vn")))
            ).alias("__sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id",
                F.round(F.col("__sim"), 6).alias("cosine_sim"),
                F.col("rnk").cast("int").alias("rnk"))
    )
