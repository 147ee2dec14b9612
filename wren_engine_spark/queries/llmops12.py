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
