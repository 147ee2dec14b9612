"""Round-10 additions: the persisted BM25 inverted-index lifecycle.

x120 gave the corpus its production lexical scorer; these entries give
it the production SERVING home — the build-once/probe-many posting
store (operators/retrieval.write_bm25_index and friends), completing
the index-family matrix: the lexical leg now has the same
build / probe / append / delete / compact / stream-ingest lifecycle as
the simhash (x70/x106), hyperplane-LSH (x63/x105/x115/x116), PQ
(x99-x101/x112) and IVF-PQ (x109-x111/x118) families.

Correctness strategy (the x105/x106 convention): an append tokenizes
with EXACTLY the build's kernel (sidecar-enforced), so the appended
index's content equals the full-corpus build and the full-corpus
DuckDB replay certifies the lifecycle bit-for-bit; deletes get a
genuinely different oracle (the corpus predicate excludes the deleted
ids from tf/df/N/avgdl — merge-on-read must change the MODEL, not
just the candidate list); compaction is content-preserving by
contract, certified by probing through the same post-delete oracle.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wren_engine_spark.operators import retrieval
from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.llmops12 import _B, _K, _K1, _MAXDF, _QN, _WS
from wren_engine_spark.queries.memo import session_uid
from wren_engine_spark.queries.registry import register


def _bm25_idx_oracle(corpus_pred: str, query_pred: str, k: int = _K) -> str:
    """The x120 BM25 replay, parameterized by the CURRENT index
    content: ``corpus_pred`` filters the indexed corpus (build +
    appends − tombstones) for tf / df / N / avgdl, while the query
    batch tokenizes from the UNFILTERED base (``query_pred``) — a
    deleted doc may still probe, it just can't be retrieved or count
    toward the statistics."""
    return f"""
    WITH bt AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '{_WS}'),
                         x -> x <> '') AS t
      FROM documents
    ),
    btl AS (SELECT doc_id, len(t) AS dl FROM bt),
    bocc AS (SELECT doc_id, dl, unnest(t) AS tok
             FROM (SELECT doc_id, len(t) AS dl, t FROM bt)),
    corp AS (SELECT * FROM bocc WHERE {corpus_pred}),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n
            FROM documents WHERE {corpus_pred}),
    sdl AS (SELECT CAST(SUM(dl) AS DOUBLE) AS sumdl
            FROM btl WHERE {corpus_pred}),
    qt AS (
      SELECT DISTINCT doc_id AS query_id, tok FROM bocc WHERE {query_pred}
    ),
    dfq AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
      FROM corp WHERE tok IN (SELECT tok FROM qt) GROUP BY tok
    ),
    idf AS (
      SELECT tok,
             ln(1.0 + (n - df + 0.5) / (df + 0.5)) AS idf, n, sumdl
      FROM dfq, tot, sdl
      WHERE df <= {_MAXDF!r} * n
    ),
    tf AS (
      SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM corp GROUP BY 1, 2, 3
    ),
    sc AS (
      SELECT q.query_id, t.doc_id,
             CAST(ROUND({float(_QN)!r} * (i.idf * (t.tf * {_K1 + 1.0!r})
                  / (t.tf + {_K1!r} * ({1.0 - _B!r}
                       + {_B!r} * (CAST(t.dl AS DOUBLE) * i.n / i.sumdl)))))
                  AS BIGINT) AS qc
      FROM tf t
      JOIN qt q ON q.tok = t.tok
      JOIN idf i ON i.tok = t.tok
      WHERE t.doc_id <> q.query_id
    ),
    agg AS (
      SELECT query_id, doc_id, CAST(SUM(qc) AS BIGINT) AS qscore
      FROM sc GROUP BY 1, 2
    )
    SELECT query_id, doc_id,
           CAST(qscore AS DOUBLE) / {float(_QN)!r} AS bm25,
           CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT query_id, doc_id, qscore,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY qscore DESC, doc_id) AS rnk
          FROM agg)
    WHERE rnk <= {k}
    """


_QUERY_PRED = "doc_id < 3"
_DEL_PRED = "doc_id % 7 <> 0"


def _queries_df(spark: SparkSession, sf: str) -> DataFrame:
    d = load_tables(spark, sf, "documents")["documents"]
    return d.filter(F.col("doc_id") < 3).select("doc_id", "text")


def _index_table(spark: SparkSession, sf: str, variant: str) -> tuple[str, str]:
    """(table, ready-marker path) for a per-(variant, sf) managed
    index — the marker lives OUTSIDE the managed directory so a
    half-built table from a dead process can never serve a probe
    (the x105/x106 convention)."""
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    table = f"bm25_{variant}_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    return table, f"{wh}/{table}__READY"


_BM25_IDX_MEMO: dict = {}


def _ensure_bm25_index(
    spark: SparkSession, sf: str, variant: str, build_fn
) -> str:
    """Session-scoped build-once memo shared by all five lifecycle
    variants: ``build_fn(table)`` runs the variant's full build
    sequence; the marker + memo key make re-entry free and a new
    session rebuild-once."""
    table, marker = _index_table(spark, sf, variant)
    key = (session_uid(spark), sf, variant)
    complete = os.path.isfile(marker) and spark.catalog.tableExists(table)
    if _BM25_IDX_MEMO.get(key) != table or not complete:
        if os.path.isfile(marker):
            os.remove(marker)
        build_fn(table)
        with open(marker, "w", encoding="utf-8") as f:
            f.write("ready\n")
        _BM25_IDX_MEMO[key] = table
    return table


@register("x122_bm25_index_probe", _bm25_idx_oracle("TRUE", _QUERY_PRED))
def x122(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted BM25 index — build once, probe many
    (retrieval.write_bm25_index / bm25_index_probe): the corpus is
    tokenized ONCE into a bucketed posting table (doc_id, tok, tf, dl)
    plus a narrow __docs sidecar for N / avgdl; the probe broadcasts
    the bounded query-term set into the bucketed scan and scores with
    the EXACT bm25_topk tail (shared ``_bm25_rank`` kernel), so the
    probe is bit-identical to x120's direct ranking over the same
    corpus — certified here by the same DuckDB replay. At 100 TB the
    probe never re-reads corpus text; per-term df aggregates
    SHUFFLE-FREE on the bucket distribution (plan-pinned in
    tests/test_llmops12.py)."""

    def build(table: str) -> None:
        d = load_tables(spark, sf, "documents")["documents"]
        retrieval.write_bm25_index(d, "text", "doc_id", table)

    table = _ensure_bm25_index(spark, sf, "full", build)
    return retrieval.bm25_index_probe(
        spark, table, _queries_df(spark, sf), "text", "doc_id",
        k=_K, k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    )


@register("x123_bm25_index_append", _bm25_idx_oracle("TRUE", _QUERY_PRED))
def x123(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 index lifecycle — append without rebuild: the posting
    store is built on a base split (doc_id % 3 != 0), the remainder is
    appended through the ``__meta`` bucket parameters with the
    IDENTICAL tokenization kernel (retrieval.bm25_index_append — one
    narrow map + groupBy over the batch, two bucketed appends; the
    corpus is never re-read), and the probe ranks across old AND new
    rows with exact post-append statistics (N / avgdl / df include the
    appended docs). Appended postings equal build-time postings, so
    the full-corpus oracle certifies the lifecycle bit-for-bit —
    x105/x106's contract, for the lexical family."""

    def build(table: str) -> None:
        d = load_tables(spark, sf, "documents")["documents"]
        retrieval.write_bm25_index(
            d.filter(F.col("doc_id") % 3 != 0), "text", "doc_id", table
        )
        retrieval.bm25_index_append(
            spark, table, d.filter(F.col("doc_id") % 3 == 0),
            "text", "doc_id",
        )

    table = _ensure_bm25_index(spark, sf, "app", build)
    return retrieval.bm25_index_probe(
        spark, table, _queries_df(spark, sf), "text", "doc_id",
        k=_K, k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    )


@register("x124_bm25_index_delete", _bm25_idx_oracle(_DEL_PRED, _QUERY_PRED))
def x124(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 index lifecycle — merge-on-read delete: tombstoned docs
    (doc_id % 7 == 0, retrieval.bm25_index_delete) vanish from the
    ranking AND from the model itself — N, avgdl and every per-term df
    are computed over the surviving docs only, because the probe
    anti-joins the tombstones out of BOTH the postings and the __docs
    sidecar before any statistic. The oracle is genuinely different
    from the full-corpus replay (its corpus predicate excludes the
    deleted ids everywhere), so a delete that merely hid candidates
    while leaking their statistics would hash-mismatch. Note query
    doc 0 is itself deleted: it still probes (query texts come from
    the base table), it just can't be retrieved."""

    def build(table: str) -> None:
        d = load_tables(spark, sf, "documents")["documents"]
        retrieval.write_bm25_index(d, "text", "doc_id", table)
        retrieval.bm25_index_delete(
            spark, table,
            d.filter(F.col("doc_id") % 7 == 0).select("doc_id"),
        )

    table = _ensure_bm25_index(spark, sf, "del", build)
    return retrieval.bm25_index_probe(
        spark, table, _queries_df(spark, sf), "text", "doc_id",
        k=_K, k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    )


@register("x125_bm25_index_lifecycle", _bm25_idx_oracle(_DEL_PRED, _QUERY_PRED))
def x125(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 index lifecycle — the full build → append → delete →
    compact sequence on one index: base split built, remainder
    appended, doc_id % 7 == 0 tombstoned, then
    retrieval.bm25_index_compact rewrites postings AND the __docs
    sidecar to one file per bucket with the tombstones folded in
    (two-rename swap). Compaction is content-preserving by contract —
    the probe is bit-identical before and after (pytest-pinned) — so
    the post-delete oracle certifies the whole sequence. This is the
    steady-state maintenance loop a continuously-fed lexical index
    runs at 100 TB: appends keep freshness, compaction bounds file
    counts, probes never block on either."""

    def build(table: str) -> None:
        d = load_tables(spark, sf, "documents")["documents"]
        retrieval.write_bm25_index(
            d.filter(F.col("doc_id") % 3 != 0), "text", "doc_id", table
        )
        retrieval.bm25_index_append(
            spark, table, d.filter(F.col("doc_id") % 3 == 0),
            "text", "doc_id",
        )
        retrieval.bm25_index_delete(
            spark, table,
            d.filter(F.col("doc_id") % 7 == 0).select("doc_id"),
        )
        retrieval.bm25_index_compact(spark, table)

    table = _ensure_bm25_index(spark, sf, "life", build)
    return retrieval.bm25_index_probe(
        spark, table, _queries_df(spark, sf), "text", "doc_id",
        k=_K, k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    )


@register("t18_stream_bm25_ingest", _bm25_idx_oracle("TRUE", _QUERY_PRED))
def t18(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING ingestion into the persisted BM25 index (x123's
    lifecycle with the delta arriving as a stream): each microbatch
    foreachBatch-appends through the sidecar-frozen tokenization
    kernel. Per-doc postings are batching-invariant — a doc's
    (tok, tf, dl) rows depend on nothing outside the doc — so however
    availableNow slices the delta, the index content equals the batch
    append and the full-corpus oracle certifies the streamed path.
    Delivery is at-least-once on microbatch RETRY (the bucketed append
    has no epoch marker yet — the PQ family's pq_index_append
    epoch_id is the upgrade path); the registered entry's build is
    all-or-nothing behind its ready marker, so a failed drain rebuilds
    from scratch instead of double-appending."""
    import shutil

    def build(table: str) -> None:
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        ckpt = f"{wh}/{table}__checkpoint"
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt)
        d = load_tables(spark, sf, "documents")["documents"]
        retrieval.write_bm25_index(
            d.filter(F.col("doc_id") % 3 != 0), "text", "doc_id", table
        )
        schema = spark.read.parquet(f"{sf}/documents.parquet").schema
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf)
            .filter(F.col("doc_id") % 3 == 0)
        )

        def _append(batch_df, _epoch_id):
            retrieval.bm25_index_append(
                spark, table, batch_df, "text", "doc_id"
            )

        q = (
            src.writeStream.foreachBatch(_append)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("t18 stream append did not terminate")

    table = _ensure_bm25_index(spark, sf, "stream", build)
    return retrieval.bm25_index_probe(
        spark, table, _queries_df(spark, sf), "text", "doc_id",
        k=_K, k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    )


# ---------------------------------------------------------------------------
# x126: hybrid RRF served entirely from the two persisted indexes —
# the at-rest production serving stack (x121's fusion, with BOTH legs
# reading persisted state instead of recomputing from the corpus).
# ---------------------------------------------------------------------------


def _x126_oracle() -> str:
    from wren_engine_spark.queries.llmops import _lsh_oracle
    from wren_engine_spark.queries.llmops12 import _X121_BM25_LEX

    # the LSH replay is self-contained (its own WITH over the seeded
    # plane literals); DuckDB allows a WITH inside a derived table, so
    # the whole x63-style probe nests as the vector leg unchanged
    lsh = _lsh_oracle(query_pred="vec_id < 4", k=10)
    return f"""
    WITH {_X121_BM25_LEX},
    hvec AS (
      SELECT query_id, neighbor_id AS doc_id, rnk AS vec_rank
      FROM ({lsh}) lshq
    ),
    hfused AS (
      SELECT COALESCE(l.query_id, v.query_id) AS query_id,
             COALESCE(l.doc_id, v.doc_id) AS doc_id,
             COALESCE(CAST(1 AS DOUBLE)
                        / (CAST(60 AS DOUBLE) + CAST(l.lex_rank AS DOUBLE)),
                      CAST(0 AS DOUBLE))
           + COALESCE(CAST(1 AS DOUBLE)
                        / (CAST(60 AS DOUBLE) + CAST(v.vec_rank AS DOUBLE)),
                      CAST(0 AS DOUBLE)) AS score,
             l.lex_rank, v.vec_rank
      FROM hlex l FULL OUTER JOIN hvec v
        ON v.query_id = l.query_id AND v.doc_id = l.doc_id
    ),
    hranked AS (
      SELECT query_id, doc_id, score, lex_rank, vec_rank,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rnk
      FROM hfused
    )
    SELECT query_id, doc_id, ROUND(score, 6) AS rrf_score,
           CAST(lex_rank AS INTEGER) AS lex_rank,
           CAST(vec_rank AS INTEGER) AS vec_rank,
           CAST(rnk AS INTEGER) AS rnk
    FROM hranked WHERE rnk <= 5
    """


@register("x126_hybrid_index_rrf", _x126_oracle())
def x126(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid RRF served ENTIRELY from persisted state
    (retrieval.hybrid_index_rrf_topk) — x121's production fusion with
    both legs reading indexes instead of recomputing from the corpus:
    lexical ranks from the persisted BM25 posting store (x122's
    index), vector ranks from the persisted bucketed hyperplane-LSH
    index (x63's index — bucket-pruned scan, exact-cosine re-rank),
    fused by the shared integer-rank RRF kernel. This is the serving
    topology a 100 TB RAG deployment actually runs: both corpus passes
    happened at BUILD time; the per-query cost is two broadcast-probe
    joins over persisted, compactable, tombstone-aware tables. The
    oracle replays the BM25 chain, the full seeded-plane LSH probe
    (nested as a derived table), and the fusion — bit-for-bit."""
    import hashlib as _hashlib

    from wren_engine_spark.operators import similarity

    def build(table: str) -> None:
        d = load_tables(spark, sf, "documents")["documents"]
        retrieval.write_bm25_index(d, "text", "doc_id", table)

    bm25_table = _ensure_bm25_index(spark, sf, "full", build)
    # reuse x63's deterministic index (same corpus -> same table name,
    # same build parameters); build only when this session/process has
    # not materialized it yet
    ann_table = f"ann_idx_{_hashlib.md5(sf.encode()).hexdigest()[:10]}"
    if not spark.catalog.tableExists(ann_table):
        e = load_tables(spark, sf, "embeddings")["embeddings"]
        similarity.write_ann_index(
            e, "vec_id", "embedding", ann_table, dim=64, nbits=10, tables=4
        )
    d = load_tables(spark, sf, "documents")["documents"]
    qt = d.filter(F.col("doc_id") < 4).select("doc_id", "text")
    qv = spark.read.parquet(f"{sf}/embeddings.parquet").filter(
        F.col("vec_id") < 4
    ).select("vec_id", "embedding")
    return retrieval.hybrid_index_rrf_topk(
        spark, bm25_table, ann_table, qt, qv,
        dim=64, k_lex=10, k_vec=10, rrf_k=60, topk=5,
        k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    )


# ---------------------------------------------------------------------------
# x127: late-interaction MaxSim (ColBERT scoring) — documents and
# queries as BAGS of token vectors; score = sum over query tokens of
# the max cosine against any document token. The embeddings table
# reinterprets as a multi-vector corpus: doc_id = vec_id // 8 groups 8
# consecutive vectors into one document's token bag (the layout is the
# point — real late-interaction corpora store exactly this shape:
# one row per (doc, token) vector).
# ---------------------------------------------------------------------------


def _x127_oracle() -> str:
    from wren_engine_spark.queries.llmops import _NORM2

    return f"""
    WITH base AS (
      SELECT vec_id // 8 AS doc_id, vec_id % 8 AS tok_pos, embedding,
             {_NORM2.format(v='embedding')} AS norm2
      FROM embeddings
    ),
    q AS (SELECT doc_id AS query_id, tok_pos, embedding AS qe,
                 norm2 AS qn FROM base WHERE doc_id < 2),
    pairs AS (
      SELECT q.query_id, q.tok_pos, d.doc_id,
             CAST(ROUND(1000000.0 *
               list_reduce(list_prepend(0.0,
                   [CAST(s[1] AS DOUBLE)*CAST(s[2] AS DOUBLE)
                    FOR s IN list_zip(q.qe, d.embedding)]),
                   (acc, v) -> acc + v)
               / (sqrt(q.qn) * sqrt(d.norm2))) AS BIGINT) AS qc
      FROM q, base d WHERE d.doc_id <> q.query_id
    ),
    best AS (
      SELECT query_id, tok_pos, doc_id, MAX(qc) AS best
      FROM pairs GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT query_id, doc_id, CAST(SUM(best) AS BIGINT) AS qscore
      FROM best GROUP BY 1, 2
    )
    SELECT query_id, doc_id,
           CAST(qscore AS DOUBLE) / 1000000.0 AS maxsim,
           CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT query_id, doc_id, qscore,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY qscore DESC, doc_id) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """


@register("x127_maxsim_topk", _x127_oracle())
def x127(spark: SparkSession, sf: str) -> DataFrame:
    """Late-interaction MaxSim top-k (retrieval.maxsim_topk — the
    ColBERT scoring rule): the embeddings table reinterpreted as a
    multi-vector corpus (8 token vectors per document), queries =
    documents 0-1's token bags, score = sum over query tokens of the
    max quantized cosine against any document token. Integer max +
    integer sum over micro-unit cosines make the score bit-stable in
    any engine (the ANN family's quantized-integer rule); the query
    bag broadcasts into the corpus token scan, both aggregates
    partial-aggregate map-side — no corpus-keyed wide shuffle."""
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    docs = e.select(
        F.expr("vec_id div 8").alias("doc_id"),
        F.col("embedding").alias("vec"),
    )
    qv = e.filter(F.expr("vec_id div 8") < 2).select(
        F.expr("vec_id div 8").alias("query_id"),
        (F.col("vec_id") % 8).alias("tok_pos"),
        F.col("embedding").alias("vec"),
    )
    return retrieval.maxsim_topk(
        docs, qv, doc_id_col="doc_id", query_id_col="query_id",
        query_tok_col="tok_pos", vec_col="vec", k=5,
    )


# ---------------------------------------------------------------------------
# x128: RM3-style pseudo-relevance feedback over the persisted BM25
# index — the classic two-pass recall lever for short queries.
# ---------------------------------------------------------------------------

_FB_DOCS, _FB_TERMS = 3, 2


def _x128_oracle(k: int = _K) -> str:
    idf = (
        "ln(1.0 + (n - df + 0.5) / (df + 0.5)) AS idf, n, sumdl"
    )
    contrib = (
        f"CAST(ROUND({float(_QN)!r} * (i.idf * (t.tf * {_K1 + 1.0!r})"
        f" / (t.tf + {_K1!r} * ({1.0 - _B!r}"
        f" + {_B!r} * (CAST(t.dl AS DOUBLE) * i.n / i.sumdl)))))"
        f" AS BIGINT) AS qc"
    )
    return f"""
    WITH bt AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '{_WS}'),
                         x -> x <> '') AS t
      FROM documents
    ),
    bocc AS (SELECT doc_id, dl, unnest(t) AS tok
             FROM (SELECT doc_id, len(t) AS dl, t FROM bt)),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    sdl AS (SELECT CAST(SUM(len(t)) AS DOUBLE) AS sumdl FROM bt),
    qt AS (
      SELECT DISTINCT doc_id AS query_id, tok FROM bocc
      WHERE {_QUERY_PRED}
    ),
    tf AS (
      SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM bocc GROUP BY 1, 2, 3
    ),
    dfq1 AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
      FROM bocc WHERE tok IN (SELECT tok FROM qt) GROUP BY tok
    ),
    idf1 AS (
      SELECT tok, {idf} FROM dfq1, tot, sdl
      WHERE df <= {_MAXDF!r} * n
    ),
    sc1 AS (
      SELECT q.query_id, t.doc_id, {contrib}
      FROM tf t JOIN qt q ON q.tok = t.tok JOIN idf1 i ON i.tok = t.tok
      WHERE t.doc_id <> q.query_id
    ),
    agg1 AS (
      SELECT query_id, doc_id, CAST(SUM(qc) AS BIGINT) AS qscore
      FROM sc1 GROUP BY 1, 2
    ),
    r1 AS (
      SELECT query_id, doc_id
      FROM (SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY qscore DESC, doc_id) AS rnk
            FROM agg1)
      WHERE rnk <= {_FB_DOCS}
    ),
    cand AS (
      SELECT r.query_id, t.tok, CAST(SUM(t.tf) AS BIGINT) AS w
      FROM tf t JOIN r1 r ON r.doc_id = t.doc_id
      WHERE NOT EXISTS (SELECT 1 FROM qt q
                        WHERE q.query_id = r.query_id AND q.tok = t.tok)
      GROUP BY 1, 2
    ),
    expt AS (
      SELECT query_id, tok
      FROM (SELECT query_id, tok,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY w DESC, tok) AS rr
            FROM cand)
      WHERE rr <= {_FB_TERMS}
    ),
    qt2 AS (
      SELECT query_id, tok FROM qt
      UNION
      SELECT query_id, tok FROM expt
    ),
    dfq2 AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
      FROM bocc WHERE tok IN (SELECT tok FROM qt2) GROUP BY tok
    ),
    idf2 AS (
      SELECT tok, {idf} FROM dfq2, tot, sdl
      WHERE df <= {_MAXDF!r} * n
    ),
    sc2 AS (
      SELECT q.query_id, t.doc_id, {contrib}
      FROM tf t JOIN qt2 q ON q.tok = t.tok JOIN idf2 i ON i.tok = t.tok
      WHERE t.doc_id <> q.query_id
    ),
    agg2 AS (
      SELECT query_id, doc_id, CAST(SUM(qc) AS BIGINT) AS qscore
      FROM sc2 GROUP BY 1, 2
    )
    SELECT query_id, doc_id,
           CAST(qscore AS DOUBLE) / {float(_QN)!r} AS bm25,
           CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT query_id, doc_id, qscore,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY qscore DESC, doc_id) AS rnk
          FROM agg2)
    WHERE rnk <= {k}
    """


@register("x128_bm25_prf_probe", _x128_oracle())
def x128(spark: SparkSession, sf: str) -> DataFrame:
    """RM3-style pseudo-relevance feedback over the persisted BM25
    index (retrieval.bm25_index_prf_probe): pass 1 ranks the original
    query, the top-3 feedback docs contribute their 2 strongest
    non-query terms (integer tf sums, lexical tie-breaks), pass 2
    re-ranks with the expanded term set — the classic recall lever for
    short queries, run entirely against persisted posting state (the
    corpus text is never re-read). Both passes score through the
    shared quantized `_bm25_rank` kernel, so the whole two-pass
    pipeline replays bit-for-bit in DuckDB."""

    def build(table: str) -> None:
        d = load_tables(spark, sf, "documents")["documents"]
        retrieval.write_bm25_index(d, "text", "doc_id", table)

    table = _ensure_bm25_index(spark, sf, "full", build)
    return retrieval.bm25_index_prf_probe(
        spark, table, _queries_df(spark, sf), "text", "doc_id",
        k=_K, fb_docs=_FB_DOCS, fb_terms=_FB_TERMS,
        k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    )


# ---------------------------------------------------------------------------
# x129: best-window snippet extraction — the serving last-mile after
# the ranking: for each (query, doc) hit, the window-token span with
# the most query-term occurrences (ties to the earliest start).
# ---------------------------------------------------------------------------

_SNIP_W, _SNIP_HITS = 8, 5


def _x129_oracle() -> str:
    hits = _bm25_idx_oracle("TRUE", _QUERY_PRED, k=_SNIP_HITS)
    return f"""
    WITH h AS (SELECT query_id, doc_id FROM ({hits}) bm),
    sbt AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '{_WS}'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sqt AS (
      SELECT DISTINCT doc_id AS query_id, tok
      FROM (SELECT doc_id, unnest(t) AS tok FROM sbt)
      WHERE {_QUERY_PRED}
    ),
    pos AS (
      SELECT h.query_id, h.doc_id, u.tok, u.pos
      FROM h JOIN (
        SELECT doc_id, unnest(t) AS tok,
               generate_subscripts(t, 1) - 1 AS pos
        FROM sbt
      ) u ON u.doc_id = h.doc_id
    ),
    flagged AS (
      SELECT p.query_id, p.doc_id, p.pos,
             CASE WHEN EXISTS (SELECT 1 FROM sqt q
                               WHERE q.query_id = p.query_id
                                 AND q.tok = p.tok)
                  THEN 1 ELSE 0 END AS m
      FROM pos p
    ),
    wins AS (
      SELECT query_id, doc_id, pos AS start,
             SUM(m) OVER (PARTITION BY query_id, doc_id ORDER BY pos
                          RANGE BETWEEN CURRENT ROW
                          AND {_SNIP_W - 1} FOLLOWING) AS matched
      FROM flagged
    ),
    best AS (
      SELECT query_id, doc_id, start, matched
      FROM (SELECT query_id, doc_id, start, matched,
                   ROW_NUMBER() OVER (PARTITION BY query_id, doc_id
                                      ORDER BY matched DESC, start) AS rr
            FROM wins)
      WHERE rr = 1
    )
    SELECT b.query_id, b.doc_id,
           CAST(b.start AS INTEGER) AS snippet_start,
           CAST(b.matched AS INTEGER) AS matched_terms,
           array_to_string(
             list_slice(sbt.t, b.start + 1, b.start + {_SNIP_W}),
             ' ') AS snippet
    FROM best b JOIN sbt ON sbt.doc_id = b.doc_id
    """


@register("x129_snippets", _x129_oracle())
def x129(spark: SparkSession, sf: str) -> DataFrame:
    """Best-window snippet extraction (retrieval.best_snippet) over
    the persisted BM25 index's top-5 hits: for every ranked (query,
    doc) pair, the 8-token span of the document with the most
    query-term occurrences, ties to the earliest start — integer
    counts with positional tie-breaks, bit-stable in any engine. Hits
    and the query-term set broadcast into the corpus scan; per-doc
    window state is bounded by |hits| x doc length. The oracle nests
    the full BM25 index replay as the hit source, so the whole
    rank-then-snippet serving flow is certified end-to-end."""

    def build(table: str) -> None:
        d = load_tables(spark, sf, "documents")["documents"]
        retrieval.write_bm25_index(d, "text", "doc_id", table)

    table = _ensure_bm25_index(spark, sf, "full", build)
    d = load_tables(spark, sf, "documents")["documents"]
    hits = retrieval.bm25_index_probe(
        spark, table, _queries_df(spark, sf), "text", "doc_id",
        k=_SNIP_HITS, k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    ).select("query_id", "doc_id")
    return retrieval.best_snippet(
        d, "text", "doc_id", hits, _queries_df(spark, sf),
        "text", "doc_id", window=_SNIP_W,
    )


# ---------------------------------------------------------------------------
# x130: two-stage late interaction — token-level ANN candidate
# generation (the persisted LSH index) + MaxSim re-scoring of the
# surviving pairs only (ColBERT's retrieve-then-rescore topology).
# ---------------------------------------------------------------------------


def _x130_oracle() -> str:
    from wren_engine_spark.queries.llmops import _NORM2, _lsh_oracle

    lsh = _lsh_oracle(query_pred="vec_id < 16", k=5)
    return f"""
    WITH lshq AS (
      SELECT query_id, neighbor_id FROM ({lsh}) l
    ),
    cand AS (
      SELECT DISTINCT query_id // 8 AS query_id,
                      neighbor_id // 8 AS doc_id
      FROM lshq WHERE neighbor_id // 8 <> query_id // 8
    ),
    base AS (
      SELECT vec_id // 8 AS doc_id, vec_id % 8 AS tok_pos, embedding,
             {_NORM2.format(v='embedding')} AS norm2
      FROM embeddings
    ),
    q AS (SELECT doc_id AS query_id, tok_pos, embedding AS qe,
                 norm2 AS qn FROM base WHERE doc_id < 2),
    pairs AS (
      SELECT q.query_id, q.tok_pos, d.doc_id,
             CAST(ROUND(1000000.0 *
               list_reduce(list_prepend(0.0,
                   [CAST(s[1] AS DOUBLE)*CAST(s[2] AS DOUBLE)
                    FOR s IN list_zip(q.qe, d.embedding)]),
                   (acc, v) -> acc + v)
               / (sqrt(q.qn) * sqrt(d.norm2))) AS BIGINT) AS qc
      FROM q
      JOIN cand c ON c.query_id = q.query_id
      JOIN base d ON d.doc_id = c.doc_id
      WHERE d.doc_id <> q.query_id
    ),
    best AS (
      SELECT query_id, tok_pos, doc_id, MAX(qc) AS best
      FROM pairs GROUP BY 1, 2, 3
    ),
    scored AS (
      SELECT query_id, doc_id, CAST(SUM(best) AS BIGINT) AS qscore
      FROM best GROUP BY 1, 2
    )
    SELECT query_id, doc_id,
           CAST(qscore AS DOUBLE) / 1000000.0 AS maxsim,
           CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT query_id, doc_id, qscore,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY qscore DESC, doc_id) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """


@register("x130_pruned_maxsim", _x130_oracle())
def x130(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage late interaction (ColBERT's retrieve-then-rescore,
    served from persisted state): stage 1 probes the persisted
    hyperplane-LSH index (x63's) with EVERY query token vector and
    unions the hit docs into bounded (query, doc) candidate pairs;
    stage 2 re-scores only those pairs with the exact MaxSim kernel
    (retrieval.maxsim_topk(candidates=...)). The pairwise stage
    materializes |candidate pairs| x tokens instead of |corpus| x
    tokens — the re-rank topology a 100 TB late-interaction deployment
    runs — and a pruned score equals the brute-force x127 score for
    every surviving pair (shared kernel). The oracle replays the full
    seeded-plane LSH probe per token, the candidate union, and the
    restricted MaxSim — bit-for-bit."""
    import hashlib as _hashlib

    from wren_engine_spark.operators import similarity

    e = load_tables(spark, sf, "embeddings")["embeddings"]
    ann_table = f"ann_idx_{_hashlib.md5(sf.encode()).hexdigest()[:10]}"
    if not spark.catalog.tableExists(ann_table):
        similarity.write_ann_index(
            e, "vec_id", "embedding", ann_table, dim=64, nbits=10, tables=4
        )
    probe = e.filter(F.col("vec_id") < 16).select("vec_id", "embedding")
    hits = similarity.ann_index_topk(
        spark, ann_table, probe, "vec_id", "embedding", dim=64, k=5
    )
    cand = (
        hits.select(
            F.expr("query_id div 8").alias("query_id"),
            F.expr("neighbor_id div 8").alias("doc_id"),
        )
        .filter(F.col("doc_id") != F.col("query_id"))
        .distinct()
    )
    docs = e.select(
        F.expr("vec_id div 8").alias("doc_id"),
        F.col("embedding").alias("vec"),
    )
    qv = e.filter(F.expr("vec_id div 8") < 2).select(
        F.expr("vec_id div 8").alias("query_id"),
        (F.col("vec_id") % 8).alias("tok_pos"),
        F.col("embedding").alias("vec"),
    )
    return retrieval.maxsim_topk(
        docs, qv, doc_id_col="doc_id", query_id_col="query_id",
        query_tok_col="tok_pos", vec_col="vec", k=5, candidates=cand,
    )


# ---------------------------------------------------------------------------
# x131: MMR diversification — the greedy diversity re-rank over a
# query's top-k, the one genuinely SEQUENTIAL serving operator
# (applyInPandas on Spark; the oracle unrolls the selection loop as
# chained CTEs — no recursion, plain ANSI).
# ---------------------------------------------------------------------------

_MMR_K, _MMR_N, _MMR_LN, _MMR_LD = 8, 4, 1, 2


def _x131_oracle() -> str:
    from wren_engine_spark.queries.llmops import _NORM2

    qc = (
        "CAST(ROUND(1000000.0 * "
        "list_reduce(list_prepend(0.0, "
        "[CAST(s[1] AS DOUBLE)*CAST(s[2] AS DOUBLE) "
        "FOR s IN list_zip({a}, {b})]), (acc, v) -> acc + v) "
        "/ (sqrt({an}) * sqrt({bn}))) AS BIGINT)"
    )
    head = f"""
    WITH base AS (
      SELECT vec_id, embedding, {_NORM2.format(v='embedding')} AS norm2
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe, norm2 AS qn
          FROM base WHERE vec_id < 3),
    relp AS (
      SELECT q.query_id, d.vec_id AS doc_id,
             {qc.format(a='q.qe', b='d.embedding', an='q.qn', bn='d.norm2')} AS rel
      FROM q, base d WHERE d.vec_id <> q.query_id
    ),
    cand AS (
      SELECT query_id, doc_id, rel
      FROM (SELECT query_id, doc_id, rel,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rel DESC, doc_id) AS rr
            FROM relp)
      WHERE rr <= {_MMR_K}
    ),
    cv AS (
      SELECT c.query_id, c.doc_id, c.rel, b.embedding, b.norm2
      FROM cand c JOIN base b ON b.vec_id = c.doc_id
    ),
    prs AS (
      SELECT a.query_id, a.doc_id, b.doc_id AS other_id,
             {qc.format(a='a.embedding', b='b.embedding', an='a.norm2', bn='b.norm2')} AS sim
      FROM cv a JOIN cv b
        ON b.query_id = a.query_id AND b.doc_id <> a.doc_id
    ),
    s1 AS (
      SELECT query_id, doc_id
      FROM (SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rel DESC, doc_id) AS rr
            FROM cand)
      WHERE rr = 1
    ),
    sel1 AS (SELECT query_id, doc_id, 1 AS mmr_rank FROM s1)"""
    parts = [head]
    coef = _MMR_LD - _MMR_LN
    for i in range(2, _MMR_N + 1):
        prev = f"sel{i - 1}"
        parts.append(f""",
    obj{i} AS (
      SELECT c.query_id, c.doc_id,
             {_MMR_LN} * c.rel - {coef} * COALESCE(
               (SELECT MAX(p.sim) FROM prs p
                JOIN {prev} s ON s.query_id = p.query_id
                             AND s.doc_id = p.other_id
                WHERE p.query_id = c.query_id
                  AND p.doc_id = c.doc_id), 0) AS obj
      FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM {prev} s
                        WHERE s.query_id = c.query_id
                          AND s.doc_id = c.doc_id)
    ),
    s{i} AS (
      SELECT query_id, doc_id
      FROM (SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY obj DESC, doc_id) AS rr
            FROM obj{i})
      WHERE rr = 1
    ),
    sel{i} AS (
      SELECT query_id, doc_id, mmr_rank FROM {prev}
      UNION ALL
      SELECT query_id, doc_id, {i} AS mmr_rank FROM s{i}
    )""")
    parts.append(f"""
    SELECT query_id, doc_id, CAST(mmr_rank AS INTEGER) AS mmr_rank
    FROM sel{_MMR_N}
    """)
    return "".join(parts)


@register("x131_mmr_diversify", _x131_oracle())
def x131(spark: SparkSession, sf: str) -> DataFrame:
    """MMR diversity re-rank (retrieval.mmr_diversify): take each
    query's top-8 by quantized cosine, then greedily select 4 — each
    step maximizing lam*relevance − (1−lam)*max-similarity-to-selected
    (lam = 1/2, so the integer objective is rel − maxsim exactly).
    Greedy MMR is sequential WITHIN a query, so the Spark side is an
    applyInPandas per-query group (bounded k^2 pair state, distributed
    across queries — the contract case for the Pandas-UDF escape
    hatch); the oracle unrolls the 4-step selection as chained CTEs.
    Integer micro-unit relevance and similarity with id tie-breaks
    make every pick bit-stable in both engines."""
    from wren_engine_spark.operators.similarity import _dot_dec, with_norm

    e = load_tables(spark, sf, "embeddings")["embeddings"]
    base = with_norm(e, "embedding", "__n2")
    q = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qe"),
        F.col("__n2").alias("__qn"),
    )
    qc_rel = F.round(
        F.lit(1_000_000.0)
        * _dot_dec("__qe", "embedding")
        / (F.sqrt(F.col("__qn")) * F.sqrt(F.col("__n2")))
    ).cast("bigint")
    from pyspark.sql import Window as W

    relp = (
        base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            qc_rel.alias("rel"),
        )
    )
    wr = W.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("doc_id"))
    cand = (
        relp.withColumn("__rr", F.row_number().over(wr))
        .filter(F.col("__rr") <= _MMR_K)
        .select("query_id", "doc_id", "rel")
    )
    cv = cand.join(
        base.select(
            F.col("vec_id").alias("doc_id"), "embedding", "__n2"
        ),
        "doc_id",
    )
    a = cv.select(
        "query_id", "doc_id", "rel",
        F.col("embedding").alias("__ea"), F.col("__n2").alias("__na"),
    )
    bb = cv.select(
        F.col("query_id").alias("__qb"),
        F.col("doc_id").alias("other_id"),
        F.col("embedding").alias("__eb"),
        F.col("__n2").alias("__nb"),
    )
    qc_sim = F.round(
        F.lit(1_000_000.0)
        * _dot_dec("__ea", "__eb")
        / (F.sqrt(F.col("__na")) * F.sqrt(F.col("__nb")))
    ).cast("bigint")
    pairs = (
        a.join(
            F.broadcast(bb),
            (F.col("query_id") == F.col("__qb"))
            & (F.col("doc_id") != F.col("other_id")),
            "left",
        )
        .select("query_id", "doc_id", "rel", "other_id", qc_sim.alias("sim"))
    )
    return retrieval.mmr_diversify(
        pairs, n=_MMR_N, lam_num=_MMR_LN, lam_den=_MMR_LD
    )
