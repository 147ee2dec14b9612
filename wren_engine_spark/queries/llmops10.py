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
