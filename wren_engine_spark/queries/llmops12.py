"""Round-9 retrieval additions: deterministic BM25 ranking (x120).

The lexical serving ladder's top rung: x114's overlap ranking is the
rank-fusion-friendly baseline; BM25 is what production lexical search
actually scores with. Determinism follows the x52 quantized micro-nat
convention — each per-(query, doc, term) contribution is quantized to
a BIGINT before summing, so the score is an order-independent integer
sum and the ranking is engine-portable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (query bodies)

from wren_engine_spark.operators import retrieval
from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.registry import register

_WS = r"[ \t\n\x0B\f\r]+"
_K1, _B, _MAXDF, _QN, _K = 1.2, 0.75, 1.0, 1_000_000, 10


@register(
    "x120_bm25_topk",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '{_WS}'),
                         x -> x <> '') AS t
      FROM documents
    ),
    tl AS (SELECT doc_id, len(t) AS dl, t FROM toks),
    occ AS (SELECT doc_id, dl, unnest(t) AS tok FROM tl),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    sdl AS (SELECT CAST(SUM(dl) AS DOUBLE) AS sumdl FROM tl),
    qt AS (
      SELECT DISTINCT doc_id AS query_id, tok FROM occ WHERE doc_id < 3
    ),
    dfq AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
      FROM occ WHERE tok IN (SELECT tok FROM qt) GROUP BY tok
    ),
    idf AS (
      SELECT tok,
             ln(1.0 + (n - df + 0.5) / (df + 0.5)) AS idf, n, sumdl
      FROM dfq, tot, sdl
      WHERE df <= {_MAXDF!r} * n
    ),
    tf AS (
      SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM occ GROUP BY 1, 2, 3
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
    WHERE rnk <= {_K}
    """,
)
def x120(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic BM25 top-k (operators/retrieval.bm25_topk): the
    production lexical scorer over the same broadcast posting-list
    discipline as the x114 overlap ranking — the corpus token explode
    never exchanges on the token key (tf groups by (doc, term): the
    doc id in the key spreads hot terms; df is computed only for the
    bounded query-term set through broadcasts; the posting join
    broadcasts the per-(query, term) idf table). Scores follow the
    x52 quantized micro-unit convention: one ln per query term over
    exact integer-derived doubles, every contribution quantized to a
    BIGINT, per-pair score = order-independent integer sum — the
    DuckDB replay is bit-for-bit, including the (score DESC, doc_id)
    ranking. At 100 TB: two combinable corpus aggregates (tf, dl) +
    one broadcast posting join; no token-keyed shuffle of raw
    occurrence rows anywhere."""
    d = load_tables(spark, sf, "documents")["documents"]
    qids = d.filter(F.col("doc_id") < 3).select("doc_id")
    return retrieval.bm25_topk(
        d, "doc_id", "text", qids,
        k=_K, k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    )


# ---------------------------------------------------------------------------
# x121: hybrid RRF with BM25 as the lexical leg (the production RAG stack)
# ---------------------------------------------------------------------------

# BM25 lexical CTE chain producing `hlex` (query docs < 4, rank <= 10)
# — the x120 scoring replayed verbatim, feeding x114's fusion CTE.
_X121_BM25_LEX = f"""
    bt AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '{_WS}'),
                         x -> x <> '') AS t
      FROM documents
    ),
    btl AS (SELECT doc_id, len(t) AS dl, t FROM bt),
    bocc AS (SELECT doc_id, dl, unnest(t) AS tok FROM btl),
    btot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    bsdl AS (SELECT CAST(SUM(dl) AS DOUBLE) AS sumdl FROM btl),
    bqt AS (
      SELECT DISTINCT doc_id AS query_id, tok FROM bocc WHERE doc_id < 4
    ),
    bdf AS (
      SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
      FROM bocc WHERE tok IN (SELECT tok FROM bqt) GROUP BY tok
    ),
    bidf AS (
      SELECT tok,
             ln(1.0 + (n - df + 0.5) / (df + 0.5)) AS idf, n, sumdl
      FROM bdf, btot, bsdl
      WHERE df <= {_MAXDF!r} * n
    ),
    btf AS (
      SELECT doc_id, dl, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM bocc GROUP BY 1, 2, 3
    ),
    bsc AS (
      SELECT q.query_id, t.doc_id,
             CAST(ROUND({float(_QN)!r} * (i.idf * (t.tf * {_K1 + 1.0!r})
                  / (t.tf + {_K1!r} * ({1.0 - _B!r}
                       + {_B!r} * (CAST(t.dl AS DOUBLE) * i.n / i.sumdl)))))
                  AS BIGINT) AS qc
      FROM btf t
      JOIN bqt q ON q.tok = t.tok
      JOIN bidf i ON i.tok = t.tok
      WHERE t.doc_id <> q.query_id
    ),
    bagg AS (
      SELECT query_id, doc_id, CAST(SUM(qc) AS BIGINT) AS qscore
      FROM bsc GROUP BY 1, 2
    ),
    hlex AS (
      SELECT query_id, doc_id, lex_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY qscore DESC, doc_id) AS lex_rank
        FROM bagg) WHERE lex_rank <= 10
    )"""


def _x121_oracle() -> str:
    from wren_engine_spark.queries.llmops11 import _X114_VEC

    return f"""
    WITH {_X121_BM25_LEX},
    {_X114_VEC},
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


@register("x121_hybrid_rrf_bm25", _x121_oracle())
def x121(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid retrieval with BM25 as the lexical leg — the production
    RAG serving stack: x120's deterministic BM25 ranks (quantized
    micro-nat integer scores, restrict-then-aggregate posting plan)
    fused with the int8-quantized cosine ranks (x45 kernel) by RRF
    (sum of 1/(60+rank)). The fusion consumes ONLY the two integer
    rank columns, so swapping the overlap approximation (x114) for
    BM25 changes candidate ordering, never the fusion arithmetic —
    the fused score stays a two-term IEEE double sum, bit-identical
    in any engine, certified end-to-end by the oracle's replay of
    BOTH rankings and the fusion. Same plan discipline both legs: no
    exchange of the unrestricted corpus explode (lexical), broadcast
    query side into one corpus scan (vector)."""
    d = load_tables(spark, sf, "documents")["documents"]
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    qids = d.filter(F.col("doc_id") < 4).select("doc_id")
    return retrieval.hybrid_rrf_topk(
        d, "doc_id", "text", e, "vec_id", "embedding", qids,
        k_lex=10, k_vec=10, rrf_k=60, topk=5,
        max_df_frac=_MAXDF, lexical="bm25",
        k1=_K1, b=_B, quantum=_QN,
    )


# ---------------------------------------------------------------------------
# x132: retrieval-quality evaluation — recall@k / MRR / nDCG@k of the
# BM25 lexical ranking judged against the exact quantized-cosine
# vector top-k as ground truth (the cross-modal agreement eval every
# hybrid stack tunes its fusion by). The ANN family's recall rows
# (x94/x108) get their lexical/ranked counterpart; the gain tables
# are precomputed integers, so neither engine evaluates a log.
# ---------------------------------------------------------------------------


def _x132_oracle() -> str:
    from wren_engine_spark.operators.retrieval import dcg_gain_table
    from wren_engine_spark.queries.llmops11 import _X114_VEC

    gains, cums = dcg_gain_table(10)
    gvals = ", ".join(f"({r}, {g})" for r, g in gains)
    ivals = ", ".join(f"({r}, {c})" for r, c in cums)
    return f"""
    WITH {_X121_BM25_LEX},
    {_X114_VEC},
    egain(grnk, g) AS (VALUES {gvals}),
    eicum(ncap, idcg) AS (VALUES {ivals}),
    etruth AS (SELECT query_id, doc_id FROM hvec),
    enrel AS (
      SELECT query_id, CAST(COUNT(*) AS INTEGER) AS nrel
      FROM etruth GROUP BY query_id
    ),
    ehits AS (
      SELECT l.query_id, l.lex_rank AS rnk,
             CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS hit, g.g
      FROM hlex l
      LEFT JOIN etruth t
        ON t.query_id = l.query_id AND t.doc_id = l.doc_id
      JOIN egain g ON g.grnk = l.lex_rank
    ),
    eperq AS (
      SELECT query_id, CAST(SUM(hit) AS INTEGER) AS hits,
             CAST(SUM(hit * g) AS BIGINT) AS qdcg,
             MIN(CASE WHEN hit = 1 THEN rnk END) AS first
      FROM ehits GROUP BY query_id
    )
    SELECT n.query_id,
           n.nrel AS n_rel,
           COALESCE(p.hits, 0) AS hits,
           CAST(COALESCE(p.hits, 0) AS DOUBLE)
             / CAST(n.nrel AS DOUBLE) AS recall_k,
           COALESCE(CAST(1 AS DOUBLE) / CAST(p.first AS DOUBLE),
                    CAST(0 AS DOUBLE)) AS mrr,
           CAST(COALESCE(p.qdcg, 0) AS DOUBLE)
             / CAST(i.idcg AS DOUBLE) AS ndcg_k
    FROM enrel n
    LEFT JOIN eperq p ON p.query_id = n.query_id
    JOIN eicum i ON i.ncap = LEAST(n.nrel, 10)
    """


@register("x132_retrieval_eval", _x132_oracle())
def x132(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking-quality evaluation (retrieval.ranking_metrics): x120's
    BM25 top-10 (query docs 0-3) scored against the exact int8-
    quantized cosine top-10 over the embeddings table as ground truth
    — per-query recall@10, MRR, nDCG@10. The offline eval loop that
    tunes k1/b/rrf_k: both serving legs are already oracle-certified
    (x120/x114), and this entry certifies the measurement arithmetic
    itself — integer gain tables precomputed driver-side (no log in
    either engine), DCG an order-independent integer sum, every
    published double ONE division of exact integers. At scale both
    inputs are bounded top-k frames; truth and the k-row gain tables
    broadcast, one combinable per-query aggregate."""
    from wren_engine_spark.operators.similarity import quantized_cosine_topk

    d = load_tables(spark, sf, "documents")["documents"]
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    qids = d.filter(F.col("doc_id") < 4).select("doc_id")
    ranked = retrieval.bm25_topk(
        d, "doc_id", "text", qids,
        k=10, k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    ).select("query_id", "doc_id", "rnk")
    qvecs = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    truth = quantized_cosine_topk(
        e, "vec_id", "embedding", qvecs, k=10
    ).select("query_id", F.col("neighbor_id").alias("doc_id"))
    return retrieval.ranking_metrics(ranked, truth, k=10)


# ---------------------------------------------------------------------------
# x133: RRF fusion-constant sweep — the eval->tune loop for the hybrid
# stack (the retrieval counterpart of x117's nprobe tuner): sweep
# rrf_k over a grid, score each fused top-10 by mean nDCG@10 against
# the EXACT cosine top-10 (the gold ranking the quantized legs
# approximate), return the swept grid highest-first.
# ---------------------------------------------------------------------------


def _x133_oracle() -> str:
    from wren_engine_spark.operators.retrieval import dcg_gain_table
    from wren_engine_spark.queries.llmops import _NORM2
    from wren_engine_spark.queries.llmops11 import _X114_VEC

    gains, cums = dcg_gain_table(10)
    gvals = ", ".join(f"({r}, {g})" for r, g in gains)
    ivals = ", ".join(f"({r}, {c})" for r, c in cums)
    grid = ", ".join(f"({v})" for v in _X133_GRID)
    return f"""
    WITH {_X121_BM25_LEX},
    {_X114_VEC},
    xbase AS (
      SELECT vec_id, embedding, {_NORM2.format(v='embedding')} AS norm2
      FROM embeddings
    ),
    xq AS (SELECT vec_id AS query_id, embedding AS qe, norm2 AS qn
           FROM xbase WHERE vec_id < 4),
    xp AS (
      SELECT query_id, vec_id AS doc_id,
             list_reduce(list_prepend(0.0,
                 [CAST(s[1] AS DOUBLE)*CAST(s[2] AS DOUBLE)
                  FOR s IN list_zip(qe, embedding)]),
                 (acc, v) -> acc + v) / (sqrt(qn) * sqrt(norm2)) AS sim
      FROM xq, xbase WHERE vec_id <> query_id
    ),
    xtruth AS (
      SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, doc_id) AS rnk
        FROM xp) WHERE rnk <= 10
    ),
    tgrid(rrf_k) AS (VALUES {grid}),
    tgain(grnk, g) AS (VALUES {gvals}),
    ticum(ncap, idcg) AS (VALUES {ivals}),
    tcand AS (
      SELECT COALESCE(l.query_id, v.query_id) AS query_id,
             COALESCE(l.doc_id, v.doc_id) AS doc_id,
             l.lex_rank, v.vec_rank
      FROM hlex l FULL OUTER JOIN hvec v
        ON v.query_id = l.query_id AND v.doc_id = l.doc_id
    ),
    tfus AS (
      SELECT g.rrf_k, c.query_id, c.doc_id,
             COALESCE(CAST(1 AS DOUBLE)
                 / (CAST(g.rrf_k AS DOUBLE) + CAST(c.lex_rank AS DOUBLE)),
               CAST(0 AS DOUBLE))
           + COALESCE(CAST(1 AS DOUBLE)
                 / (CAST(g.rrf_k AS DOUBLE) + CAST(c.vec_rank AS DOUBLE)),
               CAST(0 AS DOUBLE)) AS score
      FROM tcand c CROSS JOIN tgrid g
    ),
    ttop AS (
      SELECT rrf_k, query_id, doc_id, rnk FROM (
        SELECT rrf_k, query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY rrf_k, query_id
                                  ORDER BY score DESC, doc_id) AS rnk
        FROM tfus) WHERE rnk <= 10
    ),
    tnrel AS (
      SELECT query_id, CAST(COUNT(*) AS INTEGER) AS nrel
      FROM xtruth GROUP BY query_id
    ),
    tper AS (
      SELECT f.rrf_k, f.query_id,
             CAST(SUM((CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END) * g.g)
                  AS BIGINT) AS qdcg
      FROM ttop f
      LEFT JOIN xtruth t
        ON t.query_id = f.query_id AND t.doc_id = f.doc_id
      JOIN tgain g ON g.grnk = f.rnk
      GROUP BY f.rrf_k, f.query_id
    ),
    tq AS (
      SELECT b.rrf_k,
             CAST(ROUND(1000000000.0 *
                  (CAST(COALESCE(p.qdcg, 0) AS DOUBLE)
                   / CAST(b.idcg AS DOUBLE))) AS BIGINT) AS nint
      FROM (
        SELECT g.rrf_k, n.query_id, i.idcg
        FROM tnrel n CROSS JOIN tgrid g
        JOIN ticum i ON i.ncap = LEAST(n.nrel, 10)
      ) b
      LEFT JOIN tper p
        ON p.rrf_k = b.rrf_k AND p.query_id = b.query_id
    ),
    tsum AS (
      SELECT rrf_k, CAST(SUM(nint) AS BIGINT) AS s,
             CAST(COUNT(*) AS INTEGER) AS nq
      FROM tq GROUP BY rrf_k
    )
    SELECT rrf_k,
           CAST(s AS DOUBLE) / (CAST(nq AS DOUBLE) * 1000000000.0)
             AS mean_ndcg,
           CAST(ROW_NUMBER() OVER (
               ORDER BY CAST(s AS DOUBLE) / CAST(nq AS DOUBLE) DESC,
                        rrf_k) AS INTEGER) AS rnk
    FROM tsum
    """


_X133_GRID = [10, 30, 60, 120]


@register("x133_rrf_tune", _x133_oracle())
def x133(spark: SparkSession, sf: str) -> DataFrame:
    """RRF fusion-constant sweep (retrieval.rrf_tune): x120's BM25
    top-10 and the int8-quantized cosine top-10 (the two production
    serving legs, both oracle-certified) fused at each rrf_k in
    {10, 30, 60, 120}, each fused top-10 scored by mean nDCG@10
    against the EXACT cosine top-10 as gold — the eval->tune loop
    that gives hybrid_rrf_topk's fusion constant a measured value,
    mirroring x117's nprobe tuner for the ANN side. Per-query nDCG
    quantizes to an integer before the cross-query mean (order-
    independent sum, one final division); the gain tables come from
    the shared dcg_gain_table kernel, so no engine evaluates a log.
    Every frame is bounded: candidates x grid, broadcast truth and
    literals, combinable aggregates."""
    from wren_engine_spark.operators.similarity import (
        cosine_topk,
        quantized_cosine_topk,
    )

    d = load_tables(spark, sf, "documents")["documents"]
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    qids = d.filter(F.col("doc_id") < 4).select("doc_id")
    lex = retrieval.bm25_topk(
        d, "doc_id", "text", qids,
        k=10, k1=_K1, b=_B, max_df_frac=_MAXDF, quantum=_QN,
    ).select("query_id", "doc_id", F.col("rnk").alias("lex_rank"))
    qvecs = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    vec = quantized_cosine_topk(
        e, "vec_id", "embedding", qvecs, k=10
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rnk").alias("vec_rank"),
    )
    truth = cosine_topk(e, "vec_id", "embedding", qvecs, k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id")
    )
    return retrieval.rrf_tune(lex, vec, truth, grid=_X133_GRID, k=10)
