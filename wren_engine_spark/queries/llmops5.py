"""Round-5 LLM-pipeline additions: leakage-safe splitting and
deterministic shard layout — the two remaining "ship the corpus to the
trainer" steps after dedup/filter/sample (SURVEY §2 extension block).

Oracle convention unchanged: pure integer hash arithmetic both sides,
identical aliases, no RNG (see queries/registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wren_engine_spark.operators import selection
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
