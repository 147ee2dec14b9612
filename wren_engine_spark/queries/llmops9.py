"""Round-7 LLM-pipeline additions: PQ index lifecycle (append without
retrain) — the index-freshness story a continuously-ingesting corpus
needs on top of round 6's build-once/probe-many PQ family.

Oracle convention unchanged (queries/registry.py docstring): exact
integer arithmetic wherever a value feeds a comparison or a hash,
IDENTICAL operation order for the few double expressions, identical
aliases both sides. Discipline per the round-5 verdict: every entry
lands with (a) a DuckDB oracle, (b) a plan assert for its scale story,
(c) a brute-force property test (tests/test_llmops9.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wren_engine_spark.operators import similarity, text
from wren_engine_spark.queries.io import load_tables
from wren_engine_spark.queries.llmops7 import _TOKHASH
from wren_engine_spark.queries.memo import session_uid
from wren_engine_spark.queries.registry import register

# ---------------------------------------------------------------------------
# x100: append to the persisted PQ index with FROZEN codebooks, probe
# across old + new rows. The oracle replays the full lifecycle: train
# on the base corpus only (vec_id % 5 != 0), encode EVERYTHING with
# those codebooks (append ≡ rebuild-encode under frozen codebooks, the
# operator's contract), then ADC-rank the probes. Mirrors
# queries/llmops8.py's _PQ_SUB template with the train/encode split.
# ---------------------------------------------------------------------------

# per-subspace chain: posb (base-only) feeds TRAINING (d1/a1/u1),
# pos (all rows) feeds ENCODING (d2/code) and the query tables (qd)
_PQA_SUB = """
posb{s} AS (
  SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
         qx[CAST({off} + i AS INTEGER)] AS qv
  FROM (SELECT vec_id, qx, unnest(generate_series(1, {sub})) AS i FROM qb)
),
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
  FROM posb{s} p JOIN c0_{s} c ON c.dim = p.dim
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
  FROM a1_{s} a JOIN posb{s} p ON p.vec_id = a.vec_id
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

_PQA_CTES = (
    """
    q AS (
      SELECT vec_id,
             [CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
              FOR x IN embedding] AS qx
      FROM embeddings
    ),
    qb AS (SELECT vec_id, qx FROM q WHERE vec_id % 5 <> 0),
    init AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER)
               AS cluster, qx
      FROM (SELECT vec_id, qx FROM qb ORDER BY vec_id LIMIT 4)
    ),
    spine AS (SELECT DISTINCT cluster FROM init),
    dims AS (SELECT CAST(i - 1 AS INTEGER) AS dim
             FROM (SELECT unnest(generate_series(1, 32)) AS i)),"""
    + _PQA_SUB.format(s=0, off=0, sub=32)
    + ","
    + _PQA_SUB.format(s=1, off=32, sub=32)
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

_PQ_APPEND_MEMO: dict = {}


def _ensure_appended_pq_index(spark: SparkSession, sf: str) -> str:
    """Build-once memo for the appended-PQ-index lifecycle: build the
    index on the BASE corpus (vec_id % 5 != 0), append the delta
    (vec_id % 5 == 0) with frozen codebooks, and mark completion. The
    marker is removed before any rebuild and recreated only after the
    append, so a partially-built index can never be mistaken for an
    appended one (and re-running can never double-append)."""
    import hashlib
    import os

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    path = f"{wh}/pq_app_index_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    marker = f"{path}/_APPENDED"
    key = (session_uid(spark), sf)
    complete = (
        os.path.isdir(f"{path}/codes")
        and os.path.isdir(f"{path}/meta")
        and os.path.isfile(marker)
    )
    if _PQ_APPEND_MEMO.get(key) != path or not complete:
        e = load_tables(spark, sf, "embeddings")["embeddings"]
        base = e.filter(F.col("vec_id") % 5 != 0)
        delta = e.filter(F.col("vec_id") % 5 == 0)
        for m in (marker, f"{path}/_COMPACTED"):
            if os.path.isfile(m):
                os.remove(m)
        # write_pq_index overwrites codes/codebooks/meta wholesale, so
        # any previously-appended files are gone before the re-append
        similarity.write_pq_index(
            base, "vec_id", "embedding", path,
            n_subspaces=2, k_codes=4, iters=1,
        )
        similarity.pq_index_append(spark, path, delta, "vec_id", "embedding")
        with open(marker, "w", encoding="utf-8") as f:
            f.write("appended\n")
        _PQ_APPEND_MEMO[key] = path
    return path


def _ensure_compacted_pq_index(spark: SparkSession, sf: str) -> str:
    """x101's half of the lifecycle: the appended index, compacted.
    Compaction is content-preserving, so running it once per built
    index is purely an I/O-shape change; the marker makes re-entry a
    no-op instead of a redundant rewrite."""
    import os

    path = _ensure_appended_pq_index(spark, sf)
    marker = f"{path}/_COMPACTED"
    if not os.path.isfile(marker):
        similarity.pq_index_compact(spark, path)
        with open(marker, "w", encoding="utf-8") as f:
            f.write("compacted\n")
    return path


@register(
    "x100_pq_index_append",
    f"""
    WITH {_PQA_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def x100(spark: SparkSession, sf: str) -> DataFrame:
    """PQ index lifecycle — append without retrain: the index is built
    on the base corpus only (vec_id % 5 != 0), the delta batch is
    encoded with the FROZEN codebooks and appended
    (similarity.pq_index_append — per-subspace narrow argmin maps over
    the delta, corpus never re-read), and the probe ranks across old
    AND new rows through the identical codes-only ADC scan
    (similarity.pq_index_topk). The oracle replays train-on-base /
    encode-everything / rank, which IS the operator's contract: under
    frozen codebooks, append ≡ rebuild-encode, so appended rows probe
    bit-identically to build-time rows. Composes with x70/x73/t13's
    ingestion family (those decide WHAT to ingest; this keeps the ANN
    index fresh for what was accepted)."""
    path = _ensure_appended_pq_index(spark, sf)
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.pq_index_topk(spark, path, queries, topk=5)


_PQ_STREAM_APPEND_MEMO: dict = {}


def _ensure_stream_appended_pq_index(spark: SparkSession, sf: str) -> str:
    """t16's index: build on the base corpus, then the delta arrives
    as a STREAM and every microbatch foreachBatch-appends through the
    same frozen-codebook encoder (similarity.pq_index_append) —
    Structured Streaming's canonical pattern for feeding a
    non-streaming sink. availableNow-bounded with the run_available_now
    timeout discipline; the checkpoint is wiped on rebuild so a
    re-built index can never skip the delta as already-processed."""
    import hashlib
    import os
    import shutil

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    path = f"{wh}/pq_sapp_index_{hashlib.md5(sf.encode()).hexdigest()[:10]}"
    marker = f"{path}/_STREAM_APPENDED"
    key = (session_uid(spark), sf)
    complete = (
        os.path.isdir(f"{path}/codes")
        and os.path.isdir(f"{path}/meta")
        and os.path.isfile(marker)
    )
    if _PQ_STREAM_APPEND_MEMO.get(key) != path or not complete:
        if os.path.isfile(marker):
            os.remove(marker)
        if os.path.isdir(f"{path}/_checkpoint"):
            shutil.rmtree(f"{path}/_checkpoint")
        e = load_tables(spark, sf, "embeddings")["embeddings"]
        base = e.filter(F.col("vec_id") % 5 != 0)
        similarity.write_pq_index(
            base, "vec_id", "embedding", path,
            n_subspaces=2, k_codes=4, iters=1,
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
            similarity.pq_index_append(
                spark, path, batch_df, "vec_id", "embedding",
                epoch_id=epoch_id,
            )

        q = (
            src.writeStream.foreachBatch(_append)
            .option("checkpointLocation", f"{path}/_checkpoint")
            .trigger(availableNow=True)
            .start()
        )
        # run_available_now's bound: a wedged replay surfaces as a
        # fast, attributable error, never a hung harness
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("t16 stream append did not terminate")
        with open(marker, "w", encoding="utf-8") as f:
            f.write("stream-appended\n")
        _PQ_STREAM_APPEND_MEMO[key] = path
    return path


@register(
    "t16_stream_index_append",
    f"""
    WITH {_PQA_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def t16(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING ingestion into the persisted PQ index (x100's
    lifecycle with the delta arriving as a stream): each microbatch
    foreachBatch-appends through the frozen-codebook encoder —
    per-row encoding is batching-invariant, so however availableNow
    slices the delta, the index content is identical to the batch
    append, and the SAME unrolled train-on-base/encode-all oracle
    certifies the streamed path with its own driver row (t13's
    batch/stream-agreement discipline, applied to index maintenance).
    The probe itself is the codes-only ADC scan. 13th oracle-checked
    streaming entry; first foreachBatch sink in the corpus — the
    pattern a production pipeline uses to feed ANY non-streaming
    store from a stream."""
    path = _ensure_stream_appended_pq_index(spark, sf)
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.pq_index_topk(spark, path, queries, topk=5)


@register(
    "x101_pq_index_compact",
    f"""
    WITH {_PQA_CTES}
    SELECT query_id, neighbor_id, CAST(adist AS BIGINT) AS adist,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def x101(spark: SparkSession, sf: str) -> DataFrame:
    """PQ index lifecycle, maintenance half — compact after append:
    every ingestion batch appends >= 1 parquet file, so a
    continuously-fed index degrades into small files whose per-file
    open cost dominates the narrow codes scan. x101 compacts the
    appended index (similarity.pq_index_compact — shuffle-free
    coalesce rewrite, atomic directory swap, codebooks/meta untouched)
    and probes it through the SAME oracle as x100: compaction is
    content-preserving by contract, so the bit-identical driver row is
    the certification. tests/test_llmops9.py pins the file-count drop
    and before/after probe equality."""
    path = _ensure_compacted_pq_index(spark, sf)
    e = load_tables(spark, sf, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.pq_index_topk(spark, path, queries, topk=5)


# ---------------------------------------------------------------------------
# x102: Bloom-filter decontamination screen — constant-size membership
# test before the exact span pass (x86). The window-hash CTEs mirror
# llmops7._SPAN_CTES (same two-plane construction); each window sets
# k=3 bits with the reduce-before-small-modulus rule.
# ---------------------------------------------------------------------------

_X102_NBITS = 1024 * 63
_X102_MULTS = (48271, 69621, 16807)


def _x102_pos(mult: int) -> str:
    return f"((wh % 2147483647) * {mult} % 2147483647) % {_X102_NBITS}"


@register(
    "x102_bloom_decontamination_screen",
    rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS t
      FROM documents
    ),
    thall AS (SELECT doc_id, {_TOKHASH} AS th FROM toks),
    ok AS (SELECT doc_id, th FROM thall WHERE len(th) >= 8),
    wins AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT), th[i:i+7]),
                 (acc, h) -> (acc * 1000003 + h) % 2147483647) * 2147483629
           + list_reduce(list_prepend(CAST(0 AS BIGINT), th[i:i+7]),
                 (acc, h) -> (acc * 999983 + h) % 2147483629) AS wh
      FROM ok, LATERAL unnest(generate_series(1, len(th) - 7)) AS u(i)
    ),
    heldpos AS (
      SELECT {_x102_pos(_X102_MULTS[0])} AS p FROM wins WHERE doc_id % 10 = 0
      UNION
      SELECT {_x102_pos(_X102_MULTS[1])} FROM wins WHERE doc_id % 10 = 0
      UNION
      SELECT {_x102_pos(_X102_MULTS[2])} FROM wins WHERE doc_id % 10 = 0
    ),
    words AS (
      SELECT p // 63 AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)) AS v
      FROM heldpos GROUP BY 1
    ),
    probe AS (
      SELECT doc_id,
             {_x102_pos(_X102_MULTS[0])} AS p1,
             {_x102_pos(_X102_MULTS[1])} AS p2,
             {_x102_pos(_X102_MULTS[2])} AS p3
      FROM wins WHERE doc_id % 10 <> 0
    ),
    hitw AS (
      SELECT pr.doc_id,
             CASE WHEN ((w1.v >> CAST(pr.p1 % 63 AS INTEGER)) & 1) = 1
                   AND ((w2.v >> CAST(pr.p2 % 63 AS INTEGER)) & 1) = 1
                   AND ((w3.v >> CAST(pr.p3 % 63 AS INTEGER)) & 1) = 1
                  THEN 1 ELSE 0 END AS hit
      FROM probe pr
      LEFT JOIN words w1 ON w1.w = pr.p1 // 63
      LEFT JOIN words w2 ON w2.w = pr.p2 // 63
      LEFT JOIN words w3 ON w3.w = pr.p3 // 63
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(hit) AS BIGINT) AS n_bloom_hits,
           (SUM(hit) > 0) AS maybe_contaminated
    FROM hitw GROUP BY doc_id
    """,
)
def x102(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter contamination screen: flags which training docs
    (doc_id % 10 != 0) MIGHT contain a held-out 8-token window using a
    fixed 8 KB filter (1024 x 63-bit words) that rides the plan as a
    literal — no join, no shuffle, no broadcast that scales with the
    held-out corpus (operators/text.bloom_decontamination_screen).
    False positives possible and deterministic (the oracle replays
    every bit: the two-plane window hashes, the k=3
    reduce-before-small-modulus positions, the bit_or packing); false
    negatives impossible — the guarantee that lets the exact x86 span
    pass read only the screened subset. Build side is one bit_or
    groupBy with <= 1024 reduce groups; the filter is bounded driver
    state (1024 longs)."""
    d = load_tables(spark, sf, "documents")["documents"]
    train = d.filter(F.col("doc_id") % 10 != 0)
    test = d.filter(F.col("doc_id") % 10 == 0)
    return text.bloom_decontamination_screen(
        train, test, "text", "doc_id", window_tokens=8, n_words=1024
    )


# ---------------------------------------------------------------------------
# x103: perceptual image hashing (aHash) over REAL decoded BMP pixels —
# the multimodal analog of the text simhash. The deterministic pixel
# pattern (multimodal._build_bmp: byte j of the top-down array is
# (doc_id*31 + j) % 251, stride 96 = width 32 * 3 bytes, zero padding)
# lets the oracle re-derive every pixel and replay the integer
# cross-multiplied bit rule exactly.
# ---------------------------------------------------------------------------

from wren_engine_spark.operators import multimodal  # noqa: E402


@register(
    "x103_image_ahash",
    """
    WITH dims AS (
      SELECT doc_id,
             GREATEST(CAST(ceil(octet_length(encode(text)) / 96.0) AS BIGINT),
                      1) AS h
      FROM documents
    ),
    pix AS (
      SELECT d.doc_id, d.h,
             (((j // 96) * 8) // d.h) * 8 + ((j % 96) // 12) AS cell,
             (d.doc_id * 31 + j) % 251 AS v
      FROM dims d, LATERAL unnest(generate_series(0, d.h * 96 - 1)) AS u(j)
    ),
    tot AS (SELECT doc_id, SUM(v) AS ts, COUNT(*) AS tn FROM pix GROUP BY 1),
    cl AS (SELECT doc_id, cell, SUM(v) AS cs, COUNT(*) AS cn
           FROM pix GROUP BY 1, 2),
    bits AS (
      SELECT c.doc_id, c.cell,
             CASE WHEN c.cs * t.tn >= t.ts * c.cn THEN 1 ELSE 0 END AS bit
      FROM cl c JOIN tot t USING (doc_id)
    ),
    packed AS (
      SELECT doc_id,
             SUM(CASE WHEN cell < 32
                 THEN bit * (CAST(1 AS BIGINT) << CAST(cell AS INTEGER))
                 ELSE 0 END) AS h_lo,
             SUM(CASE WHEN cell >= 32
                 THEN bit * (CAST(1 AS BIGINT) << CAST(cell - 32 AS INTEGER))
                 ELSE 0 END) AS h_hi
      FROM bits GROUP BY doc_id
    )
    SELECT d.doc_id, d.h AS height,
           CAST(p.h_lo AS BIGINT) AS h_lo, CAST(p.h_hi AS BIGINT) AS h_hi,
           'bmp' AS status
    FROM dims d JOIN packed p USING (doc_id)
    """,
)
def x103(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual average-hash over REAL decoded images: render each
    document payload as a genuine 24-bpp BMP (multimodal.encode_bmp),
    decode the pixel matrix, and hash the 8x8 block-mean lattice with
    the integer cross-multiplied bit rule — packed into two 32-bit
    halves for engine-portable Hamming joins
    (multimodal.image_ahash). The image analog of the text simhash:
    tests/test_llmops9.py pins the banded Hamming near-dup join
    (image_ahash_pairs) on planted visually-identical images and a
    pure-Python pixel replay. Arrow-batched mapInPandas end-to-end,
    narrow, no shuffle; at 100 TB this is one codec-bound pass per
    image, then all dedup happens on 8-byte hashes."""
    d = load_tables(spark, sf, "documents")["documents"]
    payloads = multimodal.attach_binary_payload(d, "text", "doc_id")
    return multimodal.image_ahash(multimodal.encode_bmp(payloads))


# ---------------------------------------------------------------------------
# x104: energy-delta audio fingerprint over real decoded PCM — the
# audio analog of x103's image aHash (sample j of doc d is
# ((d*37 + j*7919) % 65536) - 32768, multimodal._build_wav).
# ---------------------------------------------------------------------------


@register(
    "x104_audio_fingerprint",
    """
    WITH n AS (
      SELECT doc_id, GREATEST(n_chars, 1) AS ns FROM documents
    ),
    fr AS (
      SELECT doc_id, ns, (j * 32) // ns AS f,
             CAST((doc_id * 37 + j * 7919) % 65536 - 32768 AS BIGINT) AS s
      FROM n, LATERAL unnest(generate_series(0, ns - 1)) AS u(j)
    ),
    fe AS (
      SELECT doc_id, f, SUM(s * s) AS e, COUNT(*) AS c
      FROM fr GROUP BY 1, 2
    ),
    bits AS (
      SELECT a.doc_id, a.f,
             CASE WHEN b.e * a.c >= a.e * b.c THEN 1 ELSE 0 END AS bit
      FROM fe a JOIN fe b ON b.doc_id = a.doc_id AND b.f = a.f + 1
    ),
    packed AS (
      SELECT doc_id,
             SUM(bit * (CAST(1 AS BIGINT) << CAST(f AS INTEGER))) AS fp
      FROM bits GROUP BY doc_id
    )
    SELECT n.doc_id, CAST(n.ns AS BIGINT) AS n_samples,
           CAST(COALESCE(p.fp, 0) AS BIGINT) AS fingerprint,
           'wav' AS status
    FROM n LEFT JOIN packed p USING (doc_id)
    """,
)
def x104(spark: SparkSession, sf: str) -> DataFrame:
    """Energy-delta audio fingerprint over REAL decoded PCM (the x51
    WAV path feeding multimodal.audio_fingerprint): 32 frames, exact
    integer frame energies, bit f set iff frame f+1's mean energy >=
    frame f's by integer cross-multiplication — the classic acoustic-
    fingerprint shape, cross-engine exact. Frames absent from short
    clips (n < 32 samples) contribute 0 bits identically on both
    sides (missing-neighbor join vs the non-empty check). One
    codec-bound Arrow pass per clip, then dedup happens on 4-byte
    fingerprints."""
    d = load_tables(spark, sf, "documents")["documents"]
    src = d.select(
        "doc_id", F.greatest(F.col("n_chars"), F.lit(1)).alias("n_samples")
    )
    return multimodal.audio_fingerprint(
        multimodal.encode_wav(src, "doc_id", "n_samples")
    )
