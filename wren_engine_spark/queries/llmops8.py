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
from wren_engine_spark.queries.memo import session_uid
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
           CASE WHEN SUM(chars) > 0
                THEN CAST(SUM(bytes) AS DOUBLE) / CAST(SUM(chars) AS DOUBLE)
                END AS bytes_per_char,
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


# ---------------------------------------------------------------------------
# Batch 5: seasonality, calibrated quality, streaming anomaly alerts,
# decontamination impact report
# ---------------------------------------------------------------------------

from wren_engine_spark.operators import selection  # noqa: E402
from wren_engine_spark.queries.llmops6 import _QUALITY_CTE  # noqa: E402
from wren_engine_spark.queries.llmops7 import _SPAN_CTES  # noqa: E402


@register(
    "m10_seasonality_profile",
    """
    WITH g AS (
      SELECT event_type, CAST(dayofweek(ts) AS INTEGER) AS dow,
             CAST(hour(ts) AS INTEGER) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_value
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, dow, hour, n_events, mean_value,
           CAST(n_events AS DOUBLE)
             / CAST(SUM(n_events) OVER (PARTITION BY event_type) AS DOUBLE)
             AS share_of_key
    FROM g
    """,
)
def m10(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type day-of-week x hour-of-day seasonality matrix
    (count, exact decimal-sum mean, share of the type's weekly
    volume) — the weekly-rhythm baseline capacity planning and
    anomaly scoring read. dow is 0=Sunday..6 on both engines (Spark
    dayofweek()-1 == DuckDB dayofweek()). One map-side-combinable
    groupBy; the share window runs on <=168 rows per key."""
    e = load_tables(spark, sf, "events")["events"]
    return metrics.seasonality_profile(e, "event_type", "ts", "value")


@register(
    "x91_quality_calibration",
    f"""
    WITH {_QUALITY_CTE},
    d AS (SELECT t.doc_id, t.source, q.quality_score
          FROM documents t JOIN q ON q.doc_id = t.doc_id),
    r AS (
      SELECT doc_id, source, quality_score,
             RANK() OVER (PARTITION BY source
                          ORDER BY quality_score ASC) AS rnk,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM d
    )
    SELECT doc_id, source, quality_score,
           CASE WHEN n > 1
                THEN CAST(rnk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS pct_rank,
           (CASE WHEN n > 1
                 THEN CAST(rnk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                 ELSE CAST(0.0 AS DOUBLE) END) >= 0.5 AS keep
    FROM r
    """,
)
def x91(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-domain quality calibration: each document's x7 quality
    score mapped to its percentile rank WITHIN its source ((rank-1)/
    (n-1), ties share a percentile), plus a keep flag at the 0.5
    calibrated threshold — so one cutoff means the same thing in
    every domain instead of letting a verbose domain eat a terse
    domain's budget. Window input is (id, source, score); text never
    moves."""
    d = load_tables(spark, sf, "documents")["documents"]
    return selection.quality_calibration(
        d, "text", "doc_id", "source", keep_quantile=0.5
    )


@register(
    "t14_stream_anomaly_alerts",
    """
    WITH q AS (
      SELECT event_id, event_type,
             CAST(FLOOR(CAST(value AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
               AS qv
      FROM events
    ),
    r AS (
      SELECT event_type, qv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY qv) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM q
    ),
    med AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN qv ELSE 0 END)
                + SUM(CASE WHEN rn = (n + 2) // 2 THEN qv ELSE 0 END)
               AS BIGINT) AS med2
      FROM r GROUP BY event_type
    ),
    d AS (
      SELECT q.event_id, q.event_type, q.qv, med.med2,
             ABS(2 * q.qv - med.med2) AS dev2
      FROM q JOIN med USING (event_type)
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
    SELECT d.event_id, d.event_type, d.qv AS value_q, d.med2, mad.mad4
    FROM d JOIN mad USING (event_type)
    WHERE 2 * d.dev2 > 3 * mad.mad4
    """,
)
def t14(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming anomaly alerts: the events stream scored against
    BATCH-computed per-type robust stats (metrics.robust_stats med2/
    mad4) via a stateless stream-static join + integer Hampel flag —
    the lambda-architecture pattern where a heavy exact batch job
    refreshes the reference profile and the stream applies it per
    event. availableNow replay over the single events file; the
    static stats side is dimension-sized and broadcast per
    microbatch; no streaming state at all (no watermark needed — the
    filter is stateless). Only anomalous events are emitted."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from wren_engine_spark.streaming.ops import run_available_now

    e = load_tables(spark, sf, "events")["events"]
    stats = metrics.robust_stats(e, "event_type", "value", quantum=1_000_000)
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    scored = (
        src.select(
            "event_id",
            "event_type",
            F.floor(F.col("value").cast("double") * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("value_q"),
        )
        .join(F.broadcast(stats.select("event_type", "med2", "mad4")), "event_type")
        .filter(
            F.lit(2) * F.abs(F.lit(2) * F.col("value_q") - F.col("med2"))
            > F.lit(3) * F.col("mad4")
        )
    )
    out = run_available_now(spark, scored, "t14_stream_sink", "append")
    return out.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        "event_type",
        F.col("value_q").cast("bigint").alias("value_q"),
        F.col("med2").cast("bigint").alias("med2"),
        F.col("mad4").cast("bigint").alias("mad4"),
    )


@register(
    "x92_decontamination_report",
    f"""
    WITH {_SPAN_CTES},
    per_doc AS (
      SELECT b.doc_id, b.n_tokens,
             COALESCE(s.removed, CAST(0 AS BIGINT)) AS n_tokens_removed
      FROM (SELECT doc_id, CAST(len(th) AS BIGINT) AS n_tokens
            FROM thall WHERE doc_id % 10 <> 0) b
      LEFT JOIN (SELECT doc_id,
                        CAST(SUM(span_end - span_start + 1) AS BIGINT)
                          AS removed
                 FROM spans GROUP BY doc_id) s ON s.doc_id = b.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN p.n_tokens_removed > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS docs_affected,
           CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(p.n_tokens_removed) AS BIGINT) AS tokens_removed,
           CASE WHEN SUM(p.n_tokens) > 0
                THEN CAST(SUM(p.n_tokens_removed) AS DOUBLE)
                     / CAST(SUM(p.n_tokens) AS DOUBLE)
                END AS removal_rate
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.source
    """,
)
def x92(spark: SparkSession, sf: str) -> DataFrame:
    """Decontamination impact report: x86/x87's span surgery rolled up
    per source — training docs touched, tokens excised, and the
    removal rate that tells a curation team WHICH mirror leaked the
    held-out set. Spans are disjoint by construction (islands merge
    any windows within the window length), so per-doc removed tokens
    are exact span-length sums; the rollup is one groupBy on the
    dimension-sized (doc, counts) frame joined to the source map."""
    d = load_tables(spark, sf, "documents")["documents"]
    train = d.filter(F.col("doc_id") % 10 != 0)
    test = d.filter(F.col("doc_id") % 10 == 0)
    spans = text.contamination_spans(train, test, "text", "doc_id", window_tokens=8)
    cleaned = text.remove_spans(train, spans, "text", "doc_id")
    per_src = cleaned.join(
        d.select("doc_id", "source"), "doc_id"
    )
    return per_src.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("n_tokens_removed") > 0, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("docs_affected"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_tokens_removed").cast("long").alias("tokens_removed"),
        # NULL, not an ANSI divide-by-zero crash, for a source whose
        # training docs are all empty (x89's hardening, same hazard)
        F.when(
            F.sum("n_tokens") > 0,
            F.sum("n_tokens_removed").cast("double")
            / F.sum("n_tokens").cast("double"),
        ).alias("removal_rate"),
    )


# ---------------------------------------------------------------------------
# x93/x94: product-quantization ANN (ADC) + its recall gate
# ---------------------------------------------------------------------------

# per-subspace PQ CTE chain: slice -> 1 quantized-Lloyd iteration
# (x85's template on the slice) -> encode -> per-query ADC table
_PQ_SUB = """
pos{s} AS (
  SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
         qx[CAST({off} + i AS INTEGER)] AS qv
  FROM (SELECT vec_id, qx, unnest(generate_series(1, {sub})) AS i FROM q)
),
c0_{s} AS (
  SELECT cluster, CAST(i - 1 AS INTEGER) AS dim,
         qx[CAST({off} + i AS INTEGER)] AS val
  FROM (SELECT cluster, qx, unnest(generate_series(1, {sub})) AS i FROM init)
),
d1_{s} AS (
  SELECT p.vec_id, c.cluster,
         CAST(SUM((p.qv - c.val) * (p.qv - c.val)) AS BIGINT) AS dist
  FROM pos{s} p JOIN c0_{s} c ON c.dim = p.dim
  GROUP BY p.vec_id, c.cluster
),
a1_{s} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cluster ASC) AS rn
    FROM d1_{s}) WHERE rn = 1
),
u1_{s} AS (
  SELECT a.cluster, p.dim,
         CAST(floor(CAST(CAST(SUM(p.qv) AS BIGINT) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS val
  FROM a1_{s} a JOIN pos{s} p ON p.vec_id = a.vec_id
  GROUP BY a.cluster, p.dim
),
c1_{s} AS (
  SELECT sp.cluster, dm.dim, COALESCE(u.val, c.val) AS val
  FROM spine sp CROSS JOIN dims dm
  LEFT JOIN u1_{s} u ON u.cluster = sp.cluster AND u.dim = dm.dim
  JOIN c0_{s} c ON c.cluster = sp.cluster AND c.dim = dm.dim
),
d2_{s} AS (
  SELECT p.vec_id, c.cluster,
         CAST(SUM((p.qv - c.val) * (p.qv - c.val)) AS BIGINT) AS dist
  FROM pos{s} p JOIN c1_{s} c ON c.dim = p.dim
  GROUP BY p.vec_id, c.cluster
),
code_{s} AS (
  SELECT vec_id, cluster AS code FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cluster ASC) AS rn
    FROM d2_{s}) WHERE rn = 1
),
qd_{s} AS (
  SELECT p.vec_id AS query_id, c.cluster,
         CAST(SUM((p.qv - c.val) * (p.qv - c.val)) AS BIGINT) AS d
  FROM pos{s} p JOIN c1_{s} c ON c.dim = p.dim
  WHERE p.vec_id < 8
  GROUP BY 1, 2
)"""

_PQ_CTES = (
    """
    q AS (
      SELECT vec_id,
             [CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
              FOR x IN embedding] AS qx
      FROM embeddings
    ),
    init AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS cluster, qx
      FROM (SELECT vec_id, qx FROM q ORDER BY vec_id LIMIT 4)
    ),
    spine AS (SELECT DISTINCT cluster FROM init),
    dims AS (SELECT CAST(i - 1 AS INTEGER) AS dim
             FROM (SELECT unnest(generate_series(1, 32)) AS i)),"""
    + _PQ_SUB.format(s=0, off=0, sub=32)
    + ","
    + _PQ_SUB.format(s=1, off=32, sub=32)
    + """,
    ad AS (
      SELECT qd0.query_id, k0.vec_id AS neighbor_id, qd0.d + qd1.d AS adist
      FROM code_0 k0
      JOIN code_1 k1 ON k1.vec_id = k0.vec_id
      JOIN qd_0 qd0 ON qd0.cluster = k0.code
      JOIN qd_1 qd1 ON qd1.query_id = qd0.query_id AND qd1.cluster = k1.code
      WHERE k0.vec_id <> qd0.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, adist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adist ASC, neighbor_id ASC) AS rnk
      FROM ad
    )"""
)


@register(
    "x93_pq_ann",
    f"""
    WITH {_PQ_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def x93(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation:
    2 subspaces x 4 codes trained by one quantized-Lloyd iteration
    (64 dims compress to 2 small ints per vector), queries answered by
    summing per-subspace integer L2^2 table lookups on the codes —
    the corpus scan never touches raw vectors after encoding. All
    integer arithmetic plus the one shared floor(sum/n) division, so
    DuckDB replays training + encoding + ADC bit-for-bit
    (operators/similarity.py pq_topk for the 100 TB shape)."""
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.pq_topk(
        e, "vec_id", "embedding", queries,
        n_subspaces=2, k_codes=4, iters=1, topk=5,
    )


@register(
    "x94_pq_recall",
    f"""
    WITH {_PQ_CTES},
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
        FROM exd) WHERE rn <= 5
    )
    SELECT p.query_id, CAST(COUNT(e.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(e.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_5
    FROM ranked p
    LEFT JOIN ext e ON e.query_id = p.query_id
                   AND e.neighbor_id = p.neighbor_id
    WHERE p.rnk <= 5
    GROUP BY p.query_id
    """,
)
def x94(spark: SparkSession, sf: str) -> DataFrame:
    """PQ recall gate (the x62 pattern for vectors): per query,
    how many of the ADC top-5 appear in the EXACT quantized-L2 top-5 —
    the accuracy number that decides whether 2-byte codes are enough
    or the pipeline needs more subspaces. Both sides integer-exact
    with id tie-breaks, so recall is deterministic; the exact side is
    the brute-force broadcast scan (bounded query set), the PQ side
    probes the PERSISTED x99 index (bit-identical to the inline
    train+score, pytest-pinned) so one training pays for both
    entries."""
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    pq = x99(spark, sf)
    qn = 1000000.0
    qz = lambda c: F.expr(  # noqa: E731
        f"transform({c}, x -> cast(floor(cast(x as double) * {qn!r} "
        f"+ 0.5) as bigint))"
    )
    corpus = e.select(F.col("vec_id").alias("neighbor_id"), qz("embedding").alias("__qx"))
    qs = queries.select("query_id", qz("qvec").alias("__qq"))
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
        .filter(F.col("__rn") <= 5)
        .select("query_id", F.col("neighbor_id").alias("__exact_nid"))
    )
    joined = pq.join(
        ext,
        (pq["query_id"] == ext["query_id"])
        & (pq["neighbor_id"] == ext["__exact_nid"]),
        "left",
    )
    return joined.groupBy(pq["query_id"].alias("query_id")).agg(
        F.count("__exact_nid").cast("long").alias("n_hits"),
        (F.count("__exact_nid").cast("double") / F.lit(5.0)).alias("recall_at_5"),
    )


# ---------------------------------------------------------------------------
# Batch 7: reshard movement, cluster-size histogram, vocab coverage,
# split-leakage audit
# ---------------------------------------------------------------------------

from wren_engine_spark.operators import dedup  # noqa: E402
from wren_engine_spark.operators.selection import ring_positions  # noqa: E402
from wren_engine_spark.queries.llmops import _CLUSTER_ORACLE, _PAIRS_CTES  # noqa: E402


def _sql_list(vals) -> str:
    return "[" + ", ".join(str(int(v)) for v in vals) + "]"


_OLD_RING = ring_positions(8, vnodes=16, seed=42)
_NEW_RING = ring_positions(10, vnodes=16, seed=42)


def _ring_expr(ring) -> str:
    pos = _sql_list(p for p, _ in ring)
    shards = _sql_list(s for _, s in ring)
    return (
        f"list_extract({shards}, COALESCE(list_position({pos}, "
        f"list_min([p FOR p IN {pos} IF p >= h])), 1))"
    )


@register(
    "x95_reshard_movement",
    f"""
    WITH h AS (
      SELECT ((doc_id * 31 + 42) % 2147483647)
             * ((doc_id * 48271 + 49) % 2147483647) % 2147483647 AS h
      FROM documents
    ),
    flags AS (
      SELECT CASE WHEN h % 8 <> h % 10 THEN 1 ELSE 0 END AS mod_moved,
             CASE WHEN {_ring_expr(_OLD_RING)} <> {_ring_expr(_NEW_RING)}
                  THEN 1 ELSE 0 END AS ring_moved
      FROM h
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(mod_moved) AS BIGINT) AS mod_moved,
             CAST(SUM(ring_moved) AS BIGINT) AS ring_moved
      FROM flags
    )
    SELECT 'mod' AS policy, n_docs, mod_moved AS n_moved,
           CAST(mod_moved AS DOUBLE) / CAST(n_docs AS DOUBLE) AS moved_frac
    FROM agg
    UNION ALL
    SELECT 'ring', n_docs, ring_moved,
           CAST(ring_moved AS DOUBLE) / CAST(n_docs AS DOUBLE)
    FROM agg
    """,
)
def x95(spark: SparkSession, sf: str) -> DataFrame:
    """Resharding cost analysis for 8 -> 10 shards: documents moved
    under plain hash-mod placement vs a 16-vnode consistent-hash ring
    — the receipt for why a growing corpus layout uses ring placement
    (mod reassigns ~90% of everything; the ring hands off only the
    new shards' arcs, ~20%). Doc hash is x65's portable
    Mersenne-reduced product; ring positions are seeded integer
    constants inlined as literals on BOTH engines; lookup is an
    in-row HOF (no join, no shuffle); the report is one aggregate."""
    d = load_tables(spark, sf, "documents")["documents"]
    return selection.reshard_movement(
        d, "doc_id", n_old=8, n_new=10, vnodes=16, seed=42
    )


@register(
    "x96_cluster_size_histogram",
    f"""
    WITH sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM ({_CLUSTER_ORACLE}) c GROUP BY cluster_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_docs FROM documents)
    SELECT s.cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) * s.cluster_size AS BIGINT) AS n_docs,
           CAST(COUNT(*) * s.cluster_size AS DOUBLE)
             / CAST(t.total_docs AS DOUBLE) AS doc_share
    FROM sizes s CROSS JOIN tot t
    GROUP BY s.cluster_size, t.total_docs
    """,
)
def x96(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-cluster size histogram: how many near-dup clusters of
    each size exist and what share of the corpus they hold — the
    dedup-observability readout (a fat head of large clusters means
    boilerplate mirrors; mass at size 1 means a mostly-unique corpus).
    Rides x24's connected components; the histogram itself is two
    bounded aggregates over cluster-cardinality rows."""
    d = load_tables(spark, sf, "documents")["documents"]
    clusters = dedup.duplicate_clusters(d, "text", "doc_id", n=3, threshold=0.8)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    total = d.agg(F.count(F.lit(1)).cast("long").alias("total_docs"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .crossJoin(F.broadcast(total))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("n_clusters") * F.col("cluster_size"))
            .cast("long")
            .alias("n_docs"),
            (
                (F.col("n_clusters") * F.col("cluster_size")).cast("double")
                / F.col("total_docs").cast("double")
            ).alias("doc_share"),
        )
    )


@register(
    "x97_vocab_coverage",
    r"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(lower(text)),
             '[ \t\n\x0B\f\r]+')) AS tok
      FROM documents
    ),
    counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM tok GROUP BY tok),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct
            FROM counts),
    top AS (SELECT tok, cnt FROM counts
            ORDER BY cnt DESC, tok ASC LIMIT 5000),
    ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rn,
             CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM top
    ),
    eff AS (
      SELECT CAST(n.vocab_size AS INTEGER) AS vocab_size, t.total_tokens,
             CAST(LEAST(CAST(n.vocab_size AS BIGINT), t.n_distinct)
               AS BIGINT) AS eff_vocab
      FROM (SELECT unnest([100, 500, 1000, 5000]) AS vocab_size) n
      CROSS JOIN tot t
    )
    SELECT e.vocab_size, e.eff_vocab, r.cum AS covered_tokens,
           e.total_tokens,
           CAST(r.cum AS DOUBLE) / CAST(e.total_tokens AS DOUBLE) AS coverage
    FROM ranked r JOIN eff e ON r.rn = e.eff_vocab
    ORDER BY vocab_size
    """,
)
def x97(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary coverage curve: the corpus-token share covered by
    the top-{{100,500,1000,5000}} tokens (count desc, token asc —
    deterministic) — the tokenizer-sizing report. The candidate head
    is a bounded TakeOrdered cut, so the rank window never sees the
    full vocabulary; a size larger than the distinct-token count
    clamps to the full vocabulary (the synthetic corpus has only ~31
    distinct tokens, so all four sizes clamp and read 1.0 there —
    the curve separates on a real corpus)."""
    d = load_tables(spark, sf, "documents")["documents"]
    return text.vocab_coverage(d, "text", sizes=(100, 500, 1000, 5000))


@register(
    "x98_split_leakage_audit",
    f"""
    WITH {_PAIRS_CTES},
    cls AS (
      SELECT CASE
               WHEN (id_a % 10 = 0) <> (id_b % 10 = 0) THEN 'cross_split'
               WHEN id_a % 10 = 0 THEN 'within_test'
               ELSE 'within_train' END AS pair_scope
      FROM pairs
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_pairs FROM cls)
    SELECT c.pair_scope, CAST(COUNT(*) AS BIGINT) AS n_pairs, t.total_pairs,
           CAST(COUNT(*) AS DOUBLE) / CAST(t.total_pairs AS DOUBLE) AS share
    FROM cls c CROSS JOIN tot t
    GROUP BY c.pair_scope, t.total_pairs
    """,
)
def x98(spark: SparkSession, sf: str) -> DataFrame:
    """Split-leakage audit: classify every exact near-dup pair (the
    x3 skew-proof pipeline at 0.8) by whether it stays inside the
    naive doc_id%10 train/test split or CROSSES it — the post-hoc
    check that quantifies how much a hash split leaks (and why x64
    assigns whole near-dup clusters to one side: its cross count is
    zero by construction). Classification is a projection on the pair
    ids; the report is one bounded aggregate."""
    d = load_tables(spark, sf, "documents")["documents"]
    pairs = dedup.jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.8)
    is_test = lambda c: (F.col(c) % 10) == 0  # noqa: E731
    scope = (
        F.when(is_test("id_a") != is_test("id_b"), F.lit("cross_split"))
        .when(is_test("id_a"), F.lit("within_test"))
        .otherwise(F.lit("within_train"))
    )
    cls = pairs.select(scope.alias("pair_scope"))
    total = cls.agg(F.count(F.lit(1)).cast("long").alias("total_pairs"))
    return (
        cls.groupBy("pair_scope")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .crossJoin(F.broadcast(total))
        .select(
            "pair_scope",
            "n_pairs",
            "total_pairs",
            (
                F.col("n_pairs").cast("double")
                / F.col("total_pairs").cast("double")
            ).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# x99: persisted-PQ-index probe (build-once/probe-many, driver-checked)
# ---------------------------------------------------------------------------

_PQ_INDEX_MEMO: dict = {}


def _ensure_pq_index(spark: SparkSession, sf: str) -> str:
    """Build-once memo for the persisted PQ index (x99 + t15 share it,
    so they can never probe different indexes): corpus-keyed path under
    the session warehouse, rebuilt only when codes or meta are absent
    (an index written before meta persistence existed rebuilds too)."""
    import hashlib
    import os

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    path = f"{wh}/pq_index_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    key = (session_uid(spark), sf)
    complete = os.path.isdir(f"{path}/codes") and os.path.isdir(f"{path}/meta")
    if _PQ_INDEX_MEMO.get(key) != path or not complete:
        e = load_tables(spark, sf, "embeddings")["embeddings"]
        similarity.write_pq_index(
            e, "vec_id", "embedding", path, n_subspaces=2, k_codes=4, iters=1
        )
        _PQ_INDEX_MEMO[key] = path
    return path


@register(
    "x99_pq_index_probe",
    f"""
    WITH {_PQ_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def x99(spark: SparkSession, sf: str) -> DataFrame:
    """Build-once/probe-many PQ: persist the codebooks + per-vector
    codes once (similarity.write_pq_index, memoized per (session,
    sf) at a corpus-keyed path) and serve the 8-query probe through
    the codes-only scan (similarity.pq_index_topk — no embedding
    column anywhere in the probe plan, pytest-asserted). The probe is
    bit-identical to x93's inline train+score, so the SAME unrolled
    oracle certifies the persisted path with its own driver row —
    x63's discipline applied to the PQ index. Probe p50 at sf0.1:
    929 ms vs 6.4 s inline (SCALING.md)."""
    path = _ensure_pq_index(spark, sf)
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.pq_index_topk(spark, path, queries, topk=5)


@register(
    "t15_stream_vector_search",
    f"""
    WITH {_PQ_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def t15(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING vector search: query vectors arrive as a stream, each
    builds its integer ADC tables in-row (codebook centroids inlined
    as literals from the persisted x99 index), stream-static joins
    the encoded codes table, and a streaming groupBy takes the
    per-query top-5 via an in-row sort of the collected candidate
    pairs — online RAG retrieval where the corpus never leaves its
    compressed persisted form. Bit-identical to the batch probe, so
    x93's unrolled oracle certifies the STREAMING path too
    (availableNow bounded replay, complete mode). 12th oracle-checked
    streaming entry."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from wren_engine_spark.streaming.ops import run_available_now

    path = _ensure_pq_index(spark, sf)
    schema = spark.read.parquet(f"{sf}/embeddings.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf)
    )
    qstream = src.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = similarity.pq_stream_search(spark, path, qstream, topk=5)
    res = run_available_now(spark, out, "t15_stream_sink", "complete")
    return res.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
        F.col("adist").cast("bigint").alias("adist"),
        F.col("rnk").cast("int").alias("rnk"),
    )
