"""Round-6 additions, batch 4: robust time-series anomaly flags,
Holt linear-trend smoothing, diversity-capped retrieval, per-source
encoding health, and join-key skew diagnostics (SURVEY §2 extension
block).

Oracle convention unchanged (queries/registry.py docstring): exact
integer arithmetic wherever a value feeds a comparison or a hash,
IDENTICAL operation order for the few double expressions, identical
aliases both sides. Discipline: every entry lands with (a) a DuckDB
oracle, (b) a plan assert for its scale story (tests/test_plans.py),
(c) a brute-force property test (tests/test_llmops8.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wren_engine_spark.operators import layout, metrics, similarity, text
from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.llmops import _NORM2
from wren_engine_spark.queries.registry import register

# ---------------------------------------------------------------------------
# m8: per-series robust anomaly flags (Hampel filter: median + MAD)
# ---------------------------------------------------------------------------


@register(
    "m8_robust_anomaly",
    """
    WITH q AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(FLOOR(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
               AS qv
      FROM events
    ),
    daily AS (
      SELECT event_type, day, CAST(SUM(qv) AS BIGINT) AS daily_total_q
      FROM q GROUP BY event_type, day
    ),
    r AS (
      SELECT event_type, daily_total_q,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY daily_total_q) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    med AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN daily_total_q
                           ELSE 0 END)
                + SUM(CASE WHEN rn = (n + 2) // 2 THEN daily_total_q
                           ELSE 0 END) AS BIGINT) AS med2
      FROM r GROUP BY event_type
    ),
    d AS (
      SELECT daily.event_type, daily.day, daily.daily_total_q, med.med2,
             ABS(2 * daily.daily_total_q - med.med2) AS dev2
      FROM daily JOIN med USING (event_type)
    ),
    r2 AS (
      SELECT event_type, dev2,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev2) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM d
    ),
    mad AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN dev2 ELSE 0 END)
                + SUM(CASE WHEN rn = (n + 2) // 2 THEN dev2 ELSE 0 END)
               AS BIGINT) AS mad4
      FROM r2 GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.daily_total_q, d.med2, mad.mad4,
           (2 * d.dev2 > 3 * mad.mad4) AS is_anomaly
    FROM d JOIN mad USING (event_type)
    """,
)
def m8(spark: SparkSession, sf: str) -> DataFrame:
    """Hampel-filter anomaly flags over per-event-type daily totals:
    a day is anomalous when its total deviates from the series median
    by more than 3x the series MAD. Medians use the exact rank-pair
    definition over once-quantized integers, so the flag is a pure
    integer comparison — no interpolation, no float ordering. Daily
    rollup is one map-side-combinable groupBy; the rank windows run on
    series-cardinality x days rows (operators/metrics.py
    robust_anomaly docstring for the 100 TB shape)."""
    e = load_tables(spark, sf, "events")["events"]
    return metrics.robust_anomaly(
        e, "event_type", "ts", "value", quantum=1_000_000, k_num=3, k_den=1
    )


# ---------------------------------------------------------------------------
# m9: Holt linear-trend smoothing (level + trend + 1-step forecast)
# ---------------------------------------------------------------------------


@register(
    "m9_holt_forecast",
    """
    WITH RECURSIVE ser AS (
      SELECT user_id, event_type, CAST(value AS DOUBLE) AS v,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    n AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
          FROM ser GROUP BY user_id, event_type),
    rec AS (
      SELECT user_id, event_type, 0 AS rn,
             CAST(0.0 AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
      FROM n
      UNION ALL
      SELECT r.user_id, r.event_type, r.rn + 1,
             0.5 * s.v + 0.5 * (r.l + r.b),
             0.25 * ((0.5 * s.v + 0.5 * (r.l + r.b)) - r.l) + 0.75 * r.b
      FROM rec r
      JOIN ser s ON s.user_id = r.user_id AND s.event_type = r.event_type
                AND s.rn = r.rn + 1
    )
    SELECT n.user_id, n.event_type, n.n_events,
           r.l AS level, r.b AS trend, r.l + r.b AS forecast
    FROM n JOIN rec r ON r.user_id = n.user_id
       AND r.event_type = n.event_type AND r.rn = n.n_events
    """,
)
def m9(spark: SparkSession, sf: str) -> DataFrame:
    """Per-series Holt linear smoothing (alpha=0.5, beta=0.25 — both
    exact in binary): final level, trend, and one-step forecast per
    (user, event_type) series. One fixed left-fold IEEE sequence with
    the level update inlined identically inside the trend update; the
    oracle replays it bit-for-bit via a recursive CTE (NOT a
    struct-typed list_reduce: DuckDB 1.0 evaluates struct lambda
    fields sequentially in place, so a later field reading acc.l sees
    the CURRENT iteration's l — scalar projections in a recursive CTE
    have no such hazard). Same scale shape as m7: one groupBy on the
    series key."""
    e = load_tables(spark, sf, "events")["events"]
    return metrics.holt_linear(
        e, ["user_id", "event_type"], ["ts", "event_id"], "value",
        alpha=0.5, beta=0.25,
    )


# ---------------------------------------------------------------------------
# x88: diversity-capped retrieval (top-k with a per-label cap)
# ---------------------------------------------------------------------------


@register(
    "x88_diverse_topk",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding, {_NORM2.format(v='embedding')} AS norm2
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qe, norm2 AS qn
          FROM base WHERE vec_id < 8),
    pairs AS (
      SELECT query_id, vec_id AS neighbor_id, label AS neighbor_label,
             list_reduce(list_prepend(0.0,
                 [CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
                  FOR s IN list_zip(qe, embedding)]), (acc, v) -> acc + v)
               / (sqrt(qn) * sqrt(norm2)) AS sim
      FROM q, base WHERE vec_id <> query_id
    ),
    capped AS (
      SELECT * FROM (
        SELECT query_id, neighbor_id, neighbor_label, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id, neighbor_label
                                  ORDER BY sim DESC, neighbor_id) AS lr
        FROM pairs) t WHERE lr <= 2
    ),
    ranked AS (
      SELECT query_id, neighbor_id, neighbor_label, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rnk
      FROM capped
    )
    SELECT query_id, neighbor_id, neighbor_label,
           ROUND(sim, 6) AS cosine_sim, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def x88(spark: SparkSession, sf: str) -> DataFrame:
    """Diversity-capped retrieval: per query vector, the cosine top-5
    with at most 2 results per label — the cluster-capped answer list
    that keeps retrieval from collapsing onto one near-duplicate
    cluster (the SQL-exact stand-in for greedy MMR). Query side
    broadcasts, corpus never shuffles for the similarity step, and the
    per-label cut bounds the final ranking window at cap x n_labels
    rows per query."""
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.diverse_topk(
        e, "vec_id", "embedding", "label", queries, k=5, per_label_cap=2
    )


# ---------------------------------------------------------------------------
# x89: per-source encoding / charset health
# ---------------------------------------------------------------------------


@register(
    "x89_encoding_health",
    """
    WITH per AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS chars,
             CAST(strlen(text) AS BIGINT) AS bytes,
             CAST(length(text) - length(translate(text,
                  chr(9) || chr(10) || chr(13), '')) AS BIGINT) AS ctrl,
             CAST(strpos(text, '�') > 0 AS BIGINT) AS repl
      FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS total_chars,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(bytes) - SUM(chars) AS BIGINT) AS multibyte_overhead,
           CAST(SUM(bytes) AS DOUBLE) / CAST(SUM(chars) AS DOUBLE)
             AS bytes_per_char,
           CAST(SUM(ctrl) AS BIGINT) AS n_ctrl_chars,
           CAST(SUM(repl) AS BIGINT) AS n_docs_replacement
    FROM per GROUP BY source
    """,
)
def x89(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source encoding health: UTF-8 code points vs octets
    (multibyte density), TAB/LF/CR counts via the translate-delta
    trick, and documents containing U+FFFD — the mis-decoded-mirror
    detector. Exact integer sums throughout; one projection + one
    map-side-combinable groupBy with source-cardinality groups."""
    d = load_tables(spark, sf, "documents")["documents"]
    return text.encoding_health(d, "text", "source")


# ---------------------------------------------------------------------------
# x90: join-key skew profile
# ---------------------------------------------------------------------------


@register(
    "x90_key_skew_profile",
    """
    WITH counts AS (
      SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM counts),
    top AS (SELECT key, cnt FROM counts ORDER BY cnt DESC, key ASC LIMIT 10)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS INTEGER)
             AS rnk,
           key, cnt, total_rows, n_keys,
           CAST(cnt AS DOUBLE) / CAST(total_rows AS DOUBLE) AS share,
           CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
             / CAST(total_rows AS DOUBLE) AS skew_ratio
    FROM top, tot
    """,
)
def x90(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew diagnostic on the events fact's user_id: the 10
    hottest keys with their share of all rows and their multiple of
    the mean key frequency — the report that decides broadcast vs
    salt vs AQE skew-join before a production join ships. One
    map-side-combinable groupBy, a deterministic TakeOrdered cut
    (count desc, key asc), and a broadcast two-scalar totals row."""
    e = load_tables(spark, sf, "events")["events"]
    return layout.key_skew_profile(e, "user_id", top_n=10)
