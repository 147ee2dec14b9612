"""Round-5 LLM-pipeline additions: leakage-safe splitting and
deterministic shard layout — the two remaining "ship the corpus to the
trainer" steps after dedup/filter/sample (SURVEY §2 extension block).

Oracle convention unchanged: pure integer hash arithmetic both sides,
identical aliases, no RNG (see queries/registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wren_engine_spark.operators import dedup, selection
from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.llmops import _PAIRS_CTES
from wren_engine_spark.queries.registry import register

# ---------------------------------------------------------------------------
# x64: leakage-safe train/val/test split (cluster-granular assignment)
# ---------------------------------------------------------------------------


@register(
    "x64_leakage_safe_split",
    f"""
    WITH RECURSIVE {_PAIRS_CTES},
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
      UNION
      SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node
    ),
    comp AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    hashed AS (
      SELECT doc_id, cluster_id,
             ((cluster_id * 31 + 42) % 2147483647)
               * ((cluster_id * 48271 + 49) % 2147483647) % 1000 AS h
      FROM labeled
    )
    SELECT doc_id, cluster_id,
           CASE WHEN h < 900 THEN 'train'
                WHEN h < 950 THEN 'val'
                ELSE 'test' END AS split
    FROM hashed
    """,
)
def x64(spark: SparkSession, sf: str) -> DataFrame:
    """Train/val/test split that CANNOT leak near-duplicates across
    splits: split assignment is per near-dup CLUSTER (exact Jaccard
    pairs -> connected components, min-label cluster id), decided by
    portable integer hash — so a test doc never has a >=0.8 near-dup
    in train, the eval-contamination failure of naive row-hash splits.
    90/5/5 per-mille budget; deterministic on every engine and layout.
    tests assert the no-leakage invariant directly on the pair set."""
    d = load_tables(spark, sf, "documents")["documents"]
    return selection.leakage_safe_split(d, "text", "doc_id")


# ---------------------------------------------------------------------------
# x65: deterministic shard layout (shard + stable intra-shard position)
# ---------------------------------------------------------------------------


@register(
    "x65_shard_assignments",
    """
    WITH h AS (
      SELECT doc_id,
             CAST(((doc_id * 31 + 42) % 2147483647)
               * ((doc_id * 48271 + 49) % 2147483647)
               % 2147483647 % 8 AS INTEGER) AS shard,
             ((doc_id * 37 + 55) % 2147483647)
               * ((doc_id * 69621 + 71) % 2147483647) % 1000000007 AS h2
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h2, doc_id)
                AS BIGINT) AS pos
    FROM h
    """,
)
def x65(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic training-shard layout: shard by portable integer
    hash (balanced in expectation, reproducible — unlike randomSplit /
    monotonically_increasing_id, which depend on physical partitioning)
    plus a stable position within the shard (second independent hash,
    doc-id tie-break), so shard k read in position order is the same
    byte stream on every run and engine. At 100 TB the write path is
    repartition(n, shard) + sortWithinPartitions — one hash shuffle,
    no global sort (selection.shard_assignments)."""
    d = load_tables(spark, sf, "documents")["documents"]
    return selection.shard_assignments(d, "doc_id", n_shards=8)


# ---------------------------------------------------------------------------
# t12: streaming point-in-time join against the SCD2 dimension
# ---------------------------------------------------------------------------

from wren_engine_spark.queries.llmops4 import _SCD2_CTES  # noqa: E402


@register(
    "t12_stream_point_in_time_join",
    f"""
    WITH {_SCD2_CTES}
    SELECT e.event_id, e.user_id, e.ts, v.segment
    FROM events e JOIN versioned v
      ON e.user_id = v.user_id
     AND e.ts >= v.valid_from
     AND (v.valid_to IS NULL OR e.ts < v.valid_to)
    """,
)
def t12(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time-correct feature join, STREAMING: events replayed
    through readStream join the (batch-built) SCD2 segment history on
    user_id with the validity-interval predicate — each event sees the
    segment that was current AT ITS OWN TIMESTAMP, never a later
    version (the feature-store leakage rule for training examples).
    Stream-static join, availableNow drain; the oracle is the batch
    interval join over the same versioned CTE, so the driver
    hash-checks temporal correctness end-to-end
    (streaming/ops.point_in_time_join)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from wren_engine_spark.queries.llmops4 import m5
    from wren_engine_spark.streaming.ops import (
        point_in_time_join,
        run_available_now,
    )

    dim = m5(spark, sf).drop("is_current")
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
            ),
        )
    src = src.select("event_id", "user_id", "ts")
    out = point_in_time_join(src, dim, "user_id", "ts")
    return run_available_now(spark, out, "t12_stream_sink", "append").select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "segment",
    )


# ---------------------------------------------------------------------------
# f10: case-insensitive pattern matching (ILIKE family)
# ---------------------------------------------------------------------------


@register(
    "f10_ilike_matching",
    """
    SELECT p_partkey,
           (p_name ILIKE '%green%') AS has_green,
           (p_name NOT ILIKE '%metal%') AS no_metal,
           (p_name ILIKE 'a_____%') AS a_then_five,
           ((p_name ILIKE '%rose%') OR (p_name ILIKE '%peru%')) AS rose_or_peru
    FROM part
    """,
)
def f10(spark: SparkSession, sf: str) -> DataFrame:
    """Case-insensitive LIKE family (ILIKE / NOT ILIKE / single-char
    wildcards / disjunctive any-match) — identical operator syntax in
    Spark (3.3+) and DuckDB, so the oracle is the same predicate text;
    stays whole-stage-codegen JVM-side (no regex UDF)."""
    load_tables(spark, sf, "part")
    return spark.sql(
        """
        SELECT p_partkey,
               (p_name ILIKE '%green%') AS has_green,
               (p_name NOT ILIKE '%metal%') AS no_metal,
               (p_name ILIKE 'a_____%') AS a_then_five,
               ((p_name ILIKE '%rose%') OR (p_name ILIKE '%peru%')) AS rose_or_peru
        FROM part
        """
    )


# ---------------------------------------------------------------------------
# x66: edit-distance similarity join (Ed-Join)
# ---------------------------------------------------------------------------


@register(
    "x66_edit_distance_pairs",
    """
    WITH keys AS (SELECT doc_id, substr(text, 1, 40) AS s FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.s, b.s) AS INTEGER) AS edit_distance
    FROM keys a JOIN keys b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.s, b.s) <= 2
    """,
)
def x66(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT edit-distance pairs (levenshtein <= 2) over 40-char
    document openings via the Ed-Join prefix filter
    (dedup.edit_distance_pairs): k edits destroy at most k*q distinct
    q-grams, so candidates must collide on one of each string's k*q+1
    rarest grams — the PPJoin theorem on the q-gram set, with the same
    skew-proof broadcast-hot-head order (no shuffle of the exploded
    gram set on the gram key). Exact levenshtein verify restores
    precision, so the output is identical to the naive quadratic
    oracle. The string-key complement of x3 for titles/URLs/openings
    where token-set Jaccard is too coarse."""
    d = load_tables(spark, sf, "documents")["documents"]
    keyed = d.select("doc_id", F.expr("substring(text, 1, 40)").alias("k40"))
    return dedup.edit_distance_pairs(keyed, "k40", "doc_id", k=2, q=2)


# ---------------------------------------------------------------------------
# x67: asymmetric containment join (excerpt / quote detection)
# ---------------------------------------------------------------------------


@register(
    "x67_containment_pairs",
    r"""
    WITH norm AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS toks
      FROM documents
    ),
    ok AS (SELECT * FROM norm WHERE len(toks) >= 3),
    pos AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks)-2)) AS i FROM ok),
    sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS g FROM pos),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS contained_id, b.doc_id AS container_id, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT contained_id, container_id,
           CAST(c AS DOUBLE) / CAST(s.n AS DOUBLE) AS containment
    FROM inter JOIN sizes s ON s.doc_id = contained_id
    WHERE CAST(c AS DOUBLE) / CAST(s.n AS DOUBLE) >= 0.9
    """,
)
def x67(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric shingle-containment pairs (>= 90% of the contained
    doc's trigrams inside the container — excerpt/quote detection,
    inexpressible as symmetric Jaccard): one-sided prefix filter under
    the skew-proof rare-tail order, candidate join split rare/hot —
    tail keys carry <= cap rows per side (skew-free shuffle by
    construction), hot-prefix docs broadcast against the streaming
    index (the index never shuffles on the shingle key) — then exact
    array_intersect verify (dedup.containment_pairs). Oracle is the
    naive quadratic containment join."""
    d = load_tables(spark, sf, "documents")["documents"]
    return dedup.containment_pairs(d, "text", "doc_id", n=3, threshold=0.9)
