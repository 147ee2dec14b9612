"""Round-8 additions: append lifecycles for the two BUCKETED index
families (the LSH/simhash complements of round-7's x100 PQ append).

Round 7 shipped the library halves (`similarity.ann_index_append`,
`dedup.simhash_index_append`, pytest-pinned append ≡ rebuild); these
entries put each lifecycle under its own driver oracle row: build the
index on a base split, append the remainder through the index's
``__meta`` parameters, probe across old + new rows. Because an append
hashes/bands with EXACTLY the build's parameters (sidecar-enforced),
the appended index's content equals the full-corpus build — so the
existing full-corpus oracles certify the lifecycle bit-for-bit.

Discipline per the round-5 verdict: DuckDB oracle + plan assert
(tests/test_index_meta.py pins the one-shuffle probe and the no-join
append encode) + brute-force pytest (tests/test_llmops9.py append ≡
rebuild) + spill receipt (SCALING.md round 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wren_engine_spark.operators import dedup, similarity
from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.llmops import _lsh_oracle
from wren_engine_spark.queries.llmops3 import _PORTABLE_SIMHASH_CTES
from wren_engine_spark.queries.memo import session_uid
from wren_engine_spark.queries.registry import register

_ANN_APP_MEMO: dict = {}


def _ensure_appended_ann_index(spark: SparkSession, sf: str) -> str:
    """Build-once memo for the appended LSH index: build on the base
    split (vec_id % 4 != 0), append the delta through the ``__meta``
    plane parameters, and mark completion with a sidecar file OUTSIDE
    the managed table directory. A new session always rebuilds once
    (the memo key misses), so a half-built table from a dead process
    can never serve a probe."""
    import hashlib
    import os

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    table = f"ann_app_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    marker = f"{wh}/{table}__APPENDED"
    key = (session_uid(spark), sf)
    complete = os.path.isfile(marker) and spark.catalog.tableExists(table)
    if _ANN_APP_MEMO.get(key) != table or not complete:
        if os.path.isfile(marker):
            os.remove(marker)
        e = load_tables(spark, sf, "embeddings")["embeddings"]
        base = e.filter(F.col("vec_id") % 4 != 0)
        delta = e.filter(F.col("vec_id") % 4 == 0)
        # write_ann_index drops + rewrites the table AND its __meta
        # sidecar wholesale, so a re-entry can never double-append
        similarity.write_ann_index(
            base, "vec_id", "embedding", table, dim=64, nbits=10, tables=4
        )
        similarity.ann_index_append(spark, table, delta, "vec_id", "embedding")
        with open(marker, "w", encoding="utf-8") as f:
            f.write("appended\n")
        _ANN_APP_MEMO[key] = table
    return table


@register(
    "x105_ann_index_append",
    _lsh_oracle(query_pred="vec_id < 6"),
)
def x105(spark: SparkSession, sf: str) -> DataFrame:
    """LSH index lifecycle — append without rebuild: the bucketed
    hyperplane index is built on the base corpus only (vec_id % 4 !=
    0), the delta batch is signed with the EXACT plane set the build
    used (similarity.ann_index_append — dim/nbits/tables/seed from the
    ``__meta`` sidecar, one narrow map over the batch + a bucketed
    append; the corpus is never re-hashed) and the probe ranks across
    old AND new rows through the single-shuffle bucket-local join
    (similarity.ann_index_topk). Appended vectors hash onto the same
    planes as build-time vectors, so the appended index's content
    equals the full build and the full-corpus oracle certifies the
    lifecycle bit-for-bit — x100's contract, for the LSH family."""
    table = _ensure_appended_ann_index(spark, sf)
    queries = spark.read.parquet(f"{sf}/embeddings.parquet").filter(
        F.col("vec_id") < 6
    )
    return similarity.ann_index_topk(
        spark, table, queries, "vec_id", "embedding", dim=64, k=3
    )


_SIMHASH_APP_MEMO: dict = {}


def _ensure_appended_simhash_index(spark: SparkSession, sf: str) -> str:
    """x106's index: band the base corpus split into the bucketed
    simhash index, then append the remainder through the ``__meta``
    band/bucket parameters (dedup.simhash_index_append). Same
    session-scoped rebuild discipline as the LSH twin above."""
    import hashlib
    import os

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    table = f"simhash_app_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    marker = f"{wh}/{table}__APPENDED"
    key = (session_uid(spark), sf)
    complete = os.path.isfile(marker) and spark.catalog.tableExists(table)
    if _SIMHASH_APP_MEMO.get(key) != table or not complete:
        if os.path.isfile(marker):
            os.remove(marker)
        d = load_tables(spark, sf, "documents")["documents"]
        corpus = d.filter(F.col("doc_id") % 10 != 0)
        a = corpus.filter(F.col("doc_id") % 3 != 0)
        b = corpus.filter(F.col("doc_id") % 3 == 0)
        dedup.write_simhash_index(a, "text", "doc_id", table)
        dedup.simhash_index_append(spark, table, b, "text", "doc_id")
        with open(marker, "w", encoding="utf-8") as f:
            f.write("appended\n")
    _SIMHASH_APP_MEMO[key] = table
    return table


@register(
    "x106_simhash_index_append",
    f"""
    WITH {_PORTABLE_SIMHASH_CTES},
    c AS (SELECT doc_id, simhash FROM sig WHERE doc_id % 10 <> 0),
    d AS (SELECT doc_id, simhash FROM sig WHERE doc_id % 10 = 0)
    SELECT d.doc_id AS delta_id, c.doc_id AS corpus_id,
           CAST(bit_count(xor(d.simhash, c.simhash)) AS INTEGER) AS hamming
    FROM d JOIN c ON bit_count(xor(d.simhash, c.simhash)) <= 3
    """,
)
def x106(spark: SparkSession, sf: str) -> DataFrame:
    """Simhash index lifecycle — append without rebuild: the banded
    corpus index is built on a base split (doc_id % 10 != 0 and % 3 !=
    0), the remaining corpus docs are appended through the ``__meta``
    band/bucket parameters (dedup.simhash_index_append — the identical
    ``_banded_signatures`` kernel, so appended docs band exactly like
    build-time docs and the appended index equals the full-corpus
    build), and the ingestion batch (doc_id % 10 == 0) probes across
    old AND new rows (dedup.simhash_index_probe — batch broadcast,
    index never shuffled). Certified by x70's brute-force cross
    Hamming oracle over the WHOLE corpus: lossless pigeonhole banding
    + lossless append = exact equality."""
    table = _ensure_appended_simhash_index(spark, sf)
    d = load_tables(spark, sf, "documents")["documents"]
    delta = d.filter(F.col("doc_id") % 10 == 0)
    return dedup.simhash_index_probe(
        spark, table, delta, "text", "doc_id", max_hamming=3
    )


# ---------------------------------------------------------------------------
# x107/x108: IVF-PQ composite ANN — the coarse-pruning (x14) and
# residual-compression (x93) halves composed into the standard
# billion-vector architecture, with the recall gate that tunes nprobe.
# Fully oracle-checked: every stage stays in the quantized-integer
# domain (residual = exact integer subtraction), so the unrolled
# train -> assign -> residual -> PQ-train -> encode -> probe -> ADC
# replay is bit-for-bit.
# ---------------------------------------------------------------------------

from wren_engine_spark.queries.llmops7 import _KM_ITER  # noqa: E402

_IVFPQ_NLIST = 4
_IVFPQ_NPROBE = 2
_IVFPQ_K = 4  # PQ codes per subspace
_IVFPQ_TOPK = 5
_IVFPQ_SUB = 32  # 64 dims / 2 subspaces
_IVFPQ_Q = 1_000_000

# one PQ subspace over the RESIDUALS: init from the k smallest ids'
# residual slices -> one quantized-Lloyd iteration (d1/a1/u1/c1, the
# x85 template on (vec_id, dim, rv) long form) -> encode vs c1 ->
# per-(query, probed list) integer ADC table vs c1. ``tsrc`` is the
# TRAINING assignment source (the full rp{s} for the full-corpus
# build; a base-split view for the append lifecycle's train-on-base
# oracle) — ru1 needs no filter because ra1 already holds only
# training ids, and rids restricts the init the same way.
_IVFPQ_PQ_SUB = """
rp{s} AS (
  SELECT vec_id, CAST(dim - {off} AS INTEGER) AS dim, rv
  FROM rpos WHERE dim >= {off} AND dim < {end}
),
rc0_{s} AS (
  SELECT i.cluster, r.dim, r.rv AS val
  FROM rids i JOIN rp{s} r ON r.vec_id = i.vec_id
),
rd1_{s} AS (
  SELECT p.vec_id, c.cluster,
         CAST(SUM((p.rv - c.val) * (p.rv - c.val)) AS BIGINT) AS dist
  FROM {tsrc} p JOIN rc0_{s} c ON c.dim = p.dim
  GROUP BY 1, 2
),
ra1_{s} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cluster ASC) AS rn
    FROM rd1_{s}) WHERE rn = 1
),
ru1_{s} AS (
  SELECT a.cluster, p.dim,
         CAST(floor(CAST(CAST(SUM(p.rv) AS BIGINT) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS val
  FROM ra1_{s} a JOIN rp{s} p ON p.vec_id = a.vec_id
  GROUP BY 1, 2
),
rc1_{s} AS (
  SELECT sp.cluster, dm.dim, COALESCE(u.val, c.val) AS val
  FROM pspine sp CROSS JOIN sdims dm
  LEFT JOIN ru1_{s} u ON u.cluster = sp.cluster AND u.dim = dm.dim
  JOIN rc0_{s} c ON c.cluster = sp.cluster AND c.dim = dm.dim
),
rd2_{s} AS (
  SELECT p.vec_id, c.cluster,
         CAST(SUM((p.rv - c.val) * (p.rv - c.val)) AS BIGINT) AS dist
  FROM rp{s} p JOIN rc1_{s} c ON c.dim = p.dim
  GROUP BY 1, 2
),
rcode_{s} AS (
  SELECT vec_id, cluster AS code FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cluster ASC) AS rn
    FROM rd2_{s}) WHERE rn = 1
),
qd_{s} AS (
  SELECT r.query_id, r.list_id, c.cluster,
         CAST(SUM((r.rv - c.val) * (r.rv - c.val)) AS BIGINT) AS d
  FROM (SELECT query_id, list_id, CAST(dim - {off} AS INTEGER) AS dim, rv
        FROM qres WHERE dim >= {off} AND dim < {end}) r
  JOIN rc1_{s} c ON c.dim = r.dim
  GROUP BY 1, 2, 3
)"""

def _ivfpq_ctes(train_pred: str) -> str:
    """Unrolled IVF-PQ oracle CTE chain, parameterized by the TRAINING
    predicate: geometry (coarse centroids via _KM_ITER on ``pos``, PQ
    codebooks via _IVFPQ_PQ_SUB on ``rtp{s}``/``rids``) trains on the
    rows matching ``train_pred``, while assignment, residuals,
    encoding, and the probe always cover the WHOLE corpus (``apos``/
    ``rp{s}``). ``TRUE`` -> the full-corpus build (x107/x108/x109);
    a base-split predicate -> the append/stream/compact lifecycle's
    frozen-geometry contract (x110/t17/x111). ONE template for both,
    so the two oracles cannot drift."""
    return (
        f"""
    q AS (
      SELECT vec_id,
             [CAST(floor(CAST(x AS DOUBLE) * {float(_IVFPQ_Q)!r} + 0.5)
                   AS BIGINT) FOR x IN embedding] AS qx
      FROM embeddings
    ),
    init AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS cluster, qx
      FROM (SELECT vec_id, qx FROM q WHERE {train_pred}
            ORDER BY vec_id LIMIT {_IVFPQ_NLIST})
    ),
    pos AS (
      SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
             qx[CAST(i AS INTEGER)] AS qv
      FROM (SELECT vec_id, qx, unnest(generate_series(1, len(qx))) AS i
            FROM q WHERE {train_pred})
    ),
    apos AS (
      SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
             qx[CAST(i AS INTEGER)] AS qv
      FROM (SELECT vec_id, qx, unnest(generate_series(1, len(qx))) AS i
            FROM q)
    ),
    c0 AS (
      SELECT cluster, CAST(i - 1 AS INTEGER) AS dim,
             qx[CAST(i AS INTEGER)] AS val
      FROM (SELECT cluster, qx, unnest(generate_series(1, len(qx))) AS i
            FROM init)
    ),
    spine AS (SELECT DISTINCT cluster FROM c0),
    dims AS (SELECT DISTINCT dim FROM c0),
    """
        + _KM_ITER.format(i=1, prev=0)
        + ","
        + _KM_ITER.format(i=2, prev=1)
        + f""",
    ca AS (
      SELECT p.vec_id, c.cluster,
             CAST(SUM((p.qv - c.val) * (p.qv - c.val)) AS BIGINT) AS d
      FROM apos p JOIN c2 c ON c.dim = p.dim
      GROUP BY 1, 2
    ),
    al AS (
      SELECT vec_id, cluster AS list_id FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, cluster ASC) AS rn
        FROM ca) WHERE rn = 1
    ),
    rpos AS (
      SELECT p.vec_id, p.dim, p.qv - c.val AS rv
      FROM apos p
      JOIN al a ON a.vec_id = p.vec_id
      JOIN c2 c ON c.cluster = a.list_id AND c.dim = p.dim
    ),
    rids AS (
      SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS cluster
      FROM (SELECT DISTINCT vec_id FROM rpos WHERE {train_pred}
            ORDER BY vec_id LIMIT {_IVFPQ_K})
    ),
    pspine AS (SELECT cluster FROM rids),
    sdims AS (SELECT CAST(i - 1 AS INTEGER) AS dim
              FROM (SELECT unnest(generate_series(1, {_IVFPQ_SUB})) AS i)),
    qp AS (
      SELECT query_id, list_id FROM (
        SELECT vec_id AS query_id, cluster AS list_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, cluster ASC) AS rn
        FROM ca WHERE vec_id < 8) WHERE rn <= {_IVFPQ_NPROBE}
    ),
    qres AS (
      SELECT qp.query_id, qp.list_id, p.dim, p.qv - c.val AS rv
      FROM qp
      JOIN apos p ON p.vec_id = qp.query_id
      JOIN c2 c ON c.cluster = qp.list_id AND c.dim = p.dim
    ),
    rtp0 AS (SELECT * FROM rp0 WHERE {train_pred}),
    rtp1 AS (SELECT * FROM rp1 WHERE {train_pred}),
    """
        + _IVFPQ_PQ_SUB.format(s=0, off=0, end=_IVFPQ_SUB, tsrc="rtp0")
        + ","
        + _IVFPQ_PQ_SUB.format(
            s=1, off=_IVFPQ_SUB, end=2 * _IVFPQ_SUB, tsrc="rtp1"
        )
        + """,
    ad AS (
      SELECT q0.query_id, k0.vec_id AS neighbor_id, q0.d + q1.d AS adist
      FROM rcode_0 k0
      JOIN rcode_1 k1 ON k1.vec_id = k0.vec_id
      JOIN al a ON a.vec_id = k0.vec_id
      JOIN qd_0 q0 ON q0.list_id = a.list_id AND q0.cluster = k0.code
      JOIN qd_1 q1 ON q1.query_id = q0.query_id AND q1.list_id = a.list_id
                  AND q1.cluster = k1.code
      WHERE k0.vec_id <> q0.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, adist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adist ASC, neighbor_id ASC) AS rnk
      FROM ad
    )"""
    )


_IVFPQ_CTES = _ivfpq_ctes("TRUE")

# the append/stream/compact lifecycle's oracle: geometry trains on the
# base split only, encode/probe cover the whole corpus — exactly the
# frozen-geometry contract write_ivfpq_index(base) + append(delta)
# executes (x100's convention, same % 5 split)
_IVFPQA_CTES = _ivfpq_ctes("vec_id % 5 <> 0")


def _probe_queries(spark: SparkSession, sf: str) -> DataFrame:
    """The 8-row probe set as (query_id, qvec): plain parquet read, no
    load_tables scan fan-out (x63's convention — the 32-way
    repartition is for corpus-sized per-row work, not a tiny
    collected/broadcast probe side)."""
    return (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
    )


_IVFPQ_MEMO: dict = {}


def _ivfpq_result(spark: SparkSession, sf: str) -> DataFrame:
    """One IVF-PQ training per (session, sf), shared by x107 (the
    ranked probe) and x108 (its recall gate) — the x94/x99 convention
    of paying for training once. The 40-row result persists; the
    memo key misses on a new session, so a dead session's cache can
    never serve."""
    key = (session_uid(spark), sf)
    got = _IVFPQ_MEMO.get(key)
    if got is None:
        e = load_tables(spark, sf, "embeddings")["embeddings"]
        got = similarity.ivfpq_topk(
            e, "vec_id", "embedding", _probe_queries(spark, sf),
            nlist=_IVFPQ_NLIST, nprobe=_IVFPQ_NPROBE,
            n_subspaces=2, k_codes=_IVFPQ_K,
            coarse_iters=2, pq_iters=1, topk=_IVFPQ_TOPK,
        ).persist()
        got.count()
        _IVFPQ_MEMO[key] = got
    return got


@register(
    "x107_ivfpq_ann",
    f"""
    WITH {_IVFPQ_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_IVFPQ_TOPK}
    """,
)
def x107(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ composite ANN (similarity.ivfpq_topk): a trained coarse
    quantizer (x85's bit-exact quantized Lloyd, nlist=4, 2 iterations)
    prunes each query to its nprobe=2 nearest cells, and inside the
    probed cells candidates are scored by asymmetric distance over
    PRODUCT-QUANTIZED RESIDUALS — residual = exact integer
    subtraction qx - centroid_q[cell], PQ codebooks trained on those
    residuals with one quantized-Lloyd iteration per subspace (2 x 32
    dims, 4 codes). The residual trick is why IVF-PQ beats global PQ:
    codebooks spend their 2 bits on the within-cell spread, not the
    cell means. Every stage is integer arithmetic plus the one shared
    floor(sum/n) division, so the unrolled DuckDB replay is
    bit-for-bit. At 100 TB: driver state is nlist*dim + 2*4*32
    scalars, the encoded corpus is one small int + 2 codes per vector
    partitioned by cell, queries broadcast as (query, cell,
    ADC-table) rows, and a probe scans ~nprobe/nlist of the codes."""
    return _ivfpq_result(spark, sf)


@register(
    "x108_ivfpq_recall",
    f"""
    WITH {_IVFPQ_CTES},
    exd AS (
      SELECT qq.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                 [(s[1] - s[2]) * (s[1] - s[2])
                  FOR s IN list_zip(qq.qx, b.qx)]),
                 (acc, v) -> acc + v) AS d
      FROM (SELECT vec_id, qx FROM q WHERE vec_id < 8) qq, q b
      WHERE b.vec_id <> qq.vec_id
    ),
    ext AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY d ASC, neighbor_id ASC) AS rn
        FROM exd) WHERE rn <= {_IVFPQ_TOPK}
    )
    SELECT p.query_id, CAST(COUNT(e.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(e.neighbor_id) AS DOUBLE) / {float(_IVFPQ_TOPK)!r}
             AS recall_at_5
    FROM ranked p
    LEFT JOIN ext e ON e.query_id = p.query_id
                   AND e.neighbor_id = p.neighbor_id
    WHERE p.rnk <= {_IVFPQ_TOPK}
    GROUP BY p.query_id
    """,
)
def x108(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ recall gate (x94's pattern for the composite index):
    per query, how many of the IVF-PQ top-5 appear in the EXACT
    quantized-L2 top-5 over the whole corpus — the number that tunes
    nprobe, since the composite adds coarse-pruning misses on top of
    PQ distortion. Both sides integer-exact with id tie-breaks; the
    IVF-PQ side reuses x107's memoized training (one training pays
    for both entries), the exact side is the brute-force broadcast
    scan over the bounded query set."""
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    ivfpq = _ivfpq_result(spark, sf)
    qn = float(_IVFPQ_Q)
    qz = lambda c: F.expr(  # noqa: E731
        f"transform({c}, x -> cast(floor(cast(x as double) * {qn!r} "
        f"+ 0.5) as bigint))"
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"), qz("embedding").alias("__qx")
    )
    # broadcast side: 8 rows (plain read via the shared probe helper)
    qs = _probe_queries(spark, sf).select("query_id", qz("qvec").alias("__qq"))
    dist = F.aggregate(
        F.zip_with(F.col("__qq"), F.col("__qx"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window as W

    exd = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", dist.alias("__d"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("__d").asc(), F.col("neighbor_id"))
    ext = (
        exd.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _IVFPQ_TOPK)
        .select("query_id", F.col("neighbor_id").alias("__exact_nid"))
    )
    joined = ivfpq.join(
        ext,
        (ivfpq["query_id"] == ext["query_id"])
        & (ivfpq["neighbor_id"] == ext["__exact_nid"]),
        "left",
    )
    return joined.groupBy(ivfpq["query_id"].alias("query_id")).agg(
        F.count("__exact_nid").cast("long").alias("n_hits"),
        (F.count("__exact_nid").cast("double") / F.lit(float(_IVFPQ_TOPK))).alias(
            "recall_at_5"
        ),
    )


_IVFPQ_INDEX_MEMO: dict = {}


def _ensure_ivfpq_index(spark: SparkSession, sf: str) -> str:
    """Build-once memo for the persisted IVF-PQ index (the x99
    convention): corpus-keyed path under the session warehouse,
    rebuilt when any sidecar is absent or on a new session."""
    import hashlib
    import os

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    path = f"{wh}/ivfpq_index_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    key = (session_uid(spark), sf)
    complete = all(
        os.path.isdir(f"{path}/{p}") for p in ("codes", "coarse", "codebooks", "meta")
    )
    if _IVFPQ_INDEX_MEMO.get(key) != path or not complete:
        e = load_tables(spark, sf, "embeddings")["embeddings"]
        similarity.write_ivfpq_index(
            e, "vec_id", "embedding", path,
            nlist=_IVFPQ_NLIST, n_subspaces=2, k_codes=_IVFPQ_K,
            coarse_iters=2, pq_iters=1,
        )
        _IVFPQ_INDEX_MEMO[key] = path
    return path


@register(
    "x109_ivfpq_index_probe",
    f"""
    WITH {_IVFPQ_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_IVFPQ_TOPK}
    """,
)
def x109(spark: SparkSession, sf: str) -> DataFrame:
    """Build-once/probe-many IVF-PQ: persist the coarse centroids +
    residual codebooks + per-vector (cell, codes) rows once
    (similarity.write_ivfpq_index, memoized per (session, sf)) and
    serve the 8-query probe through the codes-only scan
    (similarity.ivfpq_index_topk — geometry comes from the index's own
    memoized sidecars, never a caller parameter; no embedding column
    anywhere in the probe plan). The probe runs the exact kernels the
    inline x107 runs, so the SAME unrolled oracle certifies the
    persisted path with its own driver row — x99's discipline applied
    to the composite family. The library surface also ships
    ivfpq_index_append (frozen-geometry batch encode, append ≡ rebuild
    pytest-pinned), completing the 4th persisted index family's
    ingestion story."""
    path = _ensure_ivfpq_index(spark, sf)
    return similarity.ivfpq_index_topk(
        spark, path, _probe_queries(spark, sf),
        nprobe=_IVFPQ_NPROBE, topk=_IVFPQ_TOPK,
    )


_IVFPQ_APP_MEMO: dict = {}


def _ensure_appended_ivfpq_index(spark: SparkSession, sf: str) -> str:
    """x110's index: build on the base split (vec_id % 5 != 0), append
    the delta against the FROZEN geometry, mark completion — the
    x100-lifecycle discipline (marker removed before any rebuild, so a
    partial build can never serve and a re-entry can never
    double-append: write_ivfpq_index overwrites codes wholesale)."""
    import hashlib
    import os

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    path = f"{wh}/ivfpq_app_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    marker = f"{path}/_APPENDED"
    key = (session_uid(spark), sf)
    complete = (
        os.path.isdir(f"{path}/codes")
        and os.path.isdir(f"{path}/meta")
        and os.path.isfile(marker)
    )
    if _IVFPQ_APP_MEMO.get(key) != path or not complete:
        # a rebuild resets BOTH lifecycle markers: a stale _COMPACTED
        # must not make x111 skip compacting the rebuilt index
        for m in (marker, f"{path}/_COMPACTED"):
            if os.path.isfile(m):
                os.remove(m)
        e = load_tables(spark, sf, "embeddings")["embeddings"]
        base = e.filter(F.col("vec_id") % 5 != 0)
        delta = e.filter(F.col("vec_id") % 5 == 0)
        similarity.write_ivfpq_index(
            base, "vec_id", "embedding", path,
            nlist=_IVFPQ_NLIST, n_subspaces=2, k_codes=_IVFPQ_K,
            coarse_iters=2, pq_iters=1,
        )
        similarity.ivfpq_index_append(spark, path, delta, "vec_id", "embedding")
        with open(marker, "w", encoding="utf-8") as f:
            f.write("appended\n")
        _IVFPQ_APP_MEMO[key] = path
    return path


@register(
    "x110_ivfpq_index_append",
    f"""
    WITH {_IVFPQA_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_IVFPQ_TOPK}
    """,
)
def x110(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ index lifecycle — append without retraining: the
    composite index is built on the BASE corpus only (vec_id % 5 !=
    0), the delta batch is assigned + residual-encoded against the
    index's FROZEN coarse centroids and codebooks
    (similarity.ivfpq_index_append — one join-free projection, the
    corpus never re-read), and the probe ranks across old AND new
    rows through the codes-only scan. The oracle trains geometry on
    the base split but assigns/encodes/probes the whole corpus —
    EXACTLY the frozen-geometry contract — so the lifecycle is
    certified bit-for-bit (x100's discipline; with x100/x105/x106,
    ALL FOUR persisted index families now have oracle-checked append
    lifecycles)."""
    path = _ensure_appended_ivfpq_index(spark, sf)
    return similarity.ivfpq_index_topk(
        spark, path, _probe_queries(spark, sf),
        nprobe=_IVFPQ_NPROBE, topk=_IVFPQ_TOPK,
    )


_IVFPQ_STREAM_MEMO: dict = {}


def _ensure_stream_appended_ivfpq_index(spark: SparkSession, sf: str) -> str:
    """t17's index: build the composite on the base corpus, then the
    delta arrives as a STREAM and every microbatch foreachBatch-appends
    through the frozen-geometry encoder (similarity.ivfpq_index_append
    with epoch_id — the shared exactly-once staged-write protocol).
    availableNow-bounded; the checkpoint is wiped on rebuild so a
    rebuilt index can never skip the delta as already-processed
    (t16's discipline for the composite family)."""
    import hashlib
    import os
    import shutil

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    path = f"{wh}/ivfpq_sapp_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    marker = f"{path}/_STREAM_APPENDED"
    key = (session_uid(spark), sf)
    complete = (
        os.path.isdir(f"{path}/codes")
        and os.path.isdir(f"{path}/meta")
        and os.path.isfile(marker)
    )
    if _IVFPQ_STREAM_MEMO.get(key) != path or not complete:
        if os.path.isfile(marker):
            os.remove(marker)
        if os.path.isdir(f"{path}/_checkpoint"):
            shutil.rmtree(f"{path}/_checkpoint")
        e = load_tables(spark, sf, "embeddings")["embeddings"]
        base = e.filter(F.col("vec_id") % 5 != 0)
        similarity.write_ivfpq_index(
            base, "vec_id", "embedding", path,
            nlist=_IVFPQ_NLIST, n_subspaces=2, k_codes=_IVFPQ_K,
            coarse_iters=2, pq_iters=1,
        )
        schema = spark.read.parquet(f"{sf}/embeddings.parquet").schema
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "embeddings.parquet")
            .parquet(sf)
            .filter(F.col("vec_id") % 5 == 0)
        )

        def _append(batch_df, epoch_id):
            # epoch_id makes the append idempotent: a microbatch
            # replayed after a crash between the data write and the
            # checkpoint commit converges to exactly one copy
            similarity.ivfpq_index_append(
                spark, path, batch_df, "vec_id", "embedding",
                epoch_id=epoch_id,
            )

        q = (
            src.writeStream.foreachBatch(_append)
            .option("checkpointLocation", f"{path}/_checkpoint")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("t17 stream append did not terminate")
        with open(marker, "w", encoding="utf-8") as f:
            f.write("stream-appended\n")
        _IVFPQ_STREAM_MEMO[key] = path
    return path


@register(
    "t17_stream_ivfpq_ingest",
    f"""
    WITH {_IVFPQA_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_IVFPQ_TOPK}
    """,
)
def t17(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING ingestion into the persisted IVF-PQ index (x110's
    lifecycle with the delta arriving as a stream): each microbatch
    foreachBatch-appends through the frozen-geometry encoder —
    per-row assignment + residual encoding is batching-invariant, so
    however availableNow slices the delta, the index content is
    identical to the batch append, and the SAME train-on-base/
    encode-all oracle certifies the streamed path with its own driver
    row (t16's discipline for the composite family). The epoch-staged
    exactly-once write is the shared protocol
    (similarity._epoch_staged_append); the probe is the codes-only ADC
    scan across old + new rows. 14th oracle-checked streaming entry."""
    path = _ensure_stream_appended_ivfpq_index(spark, sf)
    return similarity.ivfpq_index_topk(
        spark, path, _probe_queries(spark, sf),
        nprobe=_IVFPQ_NPROBE, topk=_IVFPQ_TOPK,
    )


def _ensure_compacted_ivfpq_index(spark: SparkSession, sf: str) -> str:
    """x111's half of the composite lifecycle: the appended index,
    compacted (x101's convention — compaction is content-preserving,
    so one pass per built index; the marker makes re-entry a no-op)."""
    import os

    path = _ensure_appended_ivfpq_index(spark, sf)
    marker = f"{path}/_COMPACTED"
    if not os.path.isfile(marker):
        similarity.pq_index_compact(spark, path)
        with open(marker, "w", encoding="utf-8") as f:
            f.write("compacted\n")
    return path


@register(
    "x111_ivfpq_index_compact",
    f"""
    WITH {_IVFPQA_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_IVFPQ_TOPK}
    """,
)
def x111(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ index lifecycle, maintenance half — compact after
    append: every ingestion batch appends >= 1 parquet file, so a
    continuously-fed composite index degrades into small files whose
    per-file open cost dominates the narrow codes scan. x111 compacts
    the appended index (similarity.pq_index_compact — schema-agnostic
    over the codes directory, honors the epoch markers, shuffle-free
    coalesce rewrite + atomic two-rename swap; coarse centroids,
    codebooks, and meta untouched) and probes it through the SAME
    train-on-base/encode-all oracle as x110: compaction is
    content-preserving by contract, so the bit-identical driver row
    is the certification — x101's discipline for the composite
    family. tests/test_ivfpq.py pins content preservation across an
    epoch append + compaction."""
    path = _ensure_compacted_ivfpq_index(spark, sf)
    return similarity.ivfpq_index_topk(
        spark, path, _probe_queries(spark, sf),
        nprobe=_IVFPQ_NPROBE, topk=_IVFPQ_TOPK,
    )


_IVFPQ_RT_MEMO: dict = {}


def _ensure_retrained_ivfpq_index(spark: SparkSession, sf: str) -> str:
    """x118's index — the full drift loop, ending in a retrain:

    1. BUILD on the base split (vec_id % 5 != 0);
    2. APPEND the delta past the frozen geometry (x110's stage — the
       drift source: the delta was never trained on);
    3. TUNE: ``ivfpq_tune_nprobe`` measures recall across every
       nprobe — the drift signal the retrain decision reads (recorded
       here by running it; this entry then retrains unconditionally
       so its content is deterministic rather than
       data-threshold-dependent);
    4. RETRAIN on the CURRENT corpus (``ivfpq_index_retrain`` — the
       exact write_ivfpq_index kernels, atomic two-rename swap,
       tombstones folded, epoch markers cleared).

    Completion marker discipline is x110's: the marker is removed
    before any rebuild, so a partial lifecycle can never serve."""
    import hashlib
    import os

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    path = f"{wh}/ivfpq_rt_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    marker = f"{path}/_RETRAINED"
    key = (session_uid(spark), sf)
    complete = (
        os.path.isdir(f"{path}/codes")
        and os.path.isdir(f"{path}/meta")
        and os.path.isfile(marker)
    )
    if _IVFPQ_RT_MEMO.get(key) != path or not complete:
        if os.path.isfile(marker):
            os.remove(marker)
        e = load_tables(spark, sf, "embeddings")["embeddings"]
        base = e.filter(F.col("vec_id") % 5 != 0)
        delta = e.filter(F.col("vec_id") % 5 == 0)
        similarity.write_ivfpq_index(
            base, "vec_id", "embedding", path,
            nlist=_IVFPQ_NLIST, n_subspaces=2, k_codes=_IVFPQ_K,
            coarse_iters=2, pq_iters=1,
        )
        similarity.ivfpq_index_append(spark, path, delta, "vec_id", "embedding")
        # the drift signal: one-pass recall sweep over every nprobe
        similarity.ivfpq_tune_nprobe(
            spark, path, e, "vec_id", "embedding",
            _probe_queries(spark, sf),
            topk=_IVFPQ_TOPK, recall_target=0.9,
        ).collect()
        # the action: retrain on the current corpus (params default to
        # the index's own meta sidecar)
        similarity.ivfpq_index_retrain(spark, path, e, "vec_id", "embedding")
        with open(marker, "w", encoding="utf-8") as f:
            f.write("retrained\n")
        _IVFPQ_RT_MEMO[key] = path
    return path


@register(
    "x118_ivfpq_index_retrain",
    f"""
    WITH {_IVFPQ_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {_IVFPQ_TOPK}
    """,
)
def x118(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ lifecycle, the retrain closer (r8 verdict item 4 — the
    tuner->retrain loop's action half): build on the base split,
    append the drift delta past the frozen geometry, run the
    ``ivfpq_tune_nprobe`` recall sweep (the drift signal), then
    RETRAIN coarse centroids + residual codebooks on the CURRENT
    corpus via ``similarity.ivfpq_index_retrain`` — the exact
    write_ivfpq_index training kernels, staged at a sibling path and
    swapped in with two renames (crash leaves the old index
    recoverable), pending tombstones folded (deletes never
    resurrect), epoch markers cleared — and probe through the
    unchanged codes-only API. The oracle TRAINS ON THE FULL CORPUS
    (the retrain contract: retrained-on-current-corpus == a fresh
    full-corpus build, pytest-pinned bit-identical in
    tests/test_ivfpq.py), so this row certifies the whole loop:
    geometry that x110's train-on-base oracle would describe has been
    provably replaced. Reference analogy: the ``cached`` +
    ``refresh_time`` materialization hint
    (manifest-macro/src/lib.rs:141-168). At 100 TB: retrain cost is
    one training pass + full re-encode (the two Lloyd barriers carry
    k*dim driver scalars) — amortized over the probe-many serving
    life, and the swap keeps probes on the last-good index until the
    new one is complete."""
    path = _ensure_retrained_ivfpq_index(spark, sf)
    return similarity.ivfpq_index_topk(
        spark, path, _probe_queries(spark, sf),
        nprobe=_IVFPQ_NPROBE, topk=_IVFPQ_TOPK,
    )


_IVFPQ_SHORT = 20  # ADC shortlist depth for the refined probe


@register(
    "x119_ivfpq_refined_probe",
    f"""
    WITH {_IVFPQ_CTES},
    short AS (
      SELECT query_id, neighbor_id FROM ranked WHERE rnk <= {_IVFPQ_SHORT}
    ),
    ex AS (
      SELECT s.query_id, s.neighbor_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                 [(z[1] - z[2]) * (z[1] - z[2])
                  FOR z IN list_zip(qq.qx, b.qx)]),
                 (acc, v) -> acc + v) AS dist
      FROM short s
      JOIN q qq ON qq.vec_id = s.query_id
      JOIN q b ON b.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(dist AS BIGINT) AS dist,
           CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT query_id, neighbor_id, dist,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY dist ASC, neighbor_id ASC)
                   AS rnk
          FROM ex)
    WHERE rnk <= {_IVFPQ_TOPK}
    """,
)
def x119(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage IVF-PQ serving — ADC shortlist, exact re-rank
    (similarity.ivfpq_index_topk_refined; the FAISS IndexRefine /
    DiskANN production shape): the persisted composite index's
    codes-only scan retrieves a {_IVFPQ_SHORT}-deep approximate
    shortlist per query, then ONLY those rows are re-scored by the
    EXACT quantized L2 against the full vectors from the embedding
    store and cut to the final top-{_IVFPQ_TOPK}. Refinement repairs
    PQ distortion inside the shortlist — final ordering is exact over
    whatever the shortlist retrieved, so recall@k >= the raw ADC
    cut's (pytest recall gate). At 100 TB: stage 1 unchanged
    (codes-only, no embedding column in the plan), stage 2 broadcasts
    the bounded |queries| x {_IVFPQ_SHORT} shortlist into ONE narrow
    id-join scan of the embedding store — full vectors touched only
    for shortlist candidates, never a corpus-wide distance pass.
    Shares x109's persisted index (one build pays for both rows)."""
    path = _ensure_ivfpq_index(spark, sf)
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    return similarity.ivfpq_index_topk_refined(
        spark, path, e, "vec_id", "embedding", _probe_queries(spark, sf),
        nprobe=_IVFPQ_NPROBE, shortlist=_IVFPQ_SHORT, topk=_IVFPQ_TOPK,
    )
