"""Deduplication operators.

Scale design (100 TB of documents):
  - exact/fingerprint dedup: hash-groupBy — one shuffle on a short hash
    key, map-side combine; no data movement of full texts beyond the
    first projection.
  - n-gram Jaccard: inverted-index self-join on shingles (explode ->
    distinct -> join on shingle) instead of a quadratic cross join; the
    join key distribution is bounded by dropping ultra-frequent shingles
    when requested (``max_doc_freq``), the standard stop-shingle guard
    against skew.
  - MinHash-LSH: signature matrix via a broadcast permutation table; the
    only wide shuffle is groupBy(doc, perm) on fixed-width ints;
    band-bucket join produces candidates, so cost scales with collisions,
    not pairs.
  - SimHash: 64 bit-counters per doc computed in one aggregation pass.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wren_engine_spark.operators.textnorm import WS_RE

# 31-bit universal-hash domain: a*h + b stays < 2^62, safe under ANSI
# long arithmetic (no overflow) while 2^31 slots is plenty for minhash.
_MERSENNE31 = (1 << 31) - 1


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate grouping by md5 of the raw text; keeps the minimum
    id as the canonical representative. Returns (id, content_hash)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "content_hash")
    )


def normalize_text(col) -> F.Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace — the
    canonical form used by fingerprint dedup."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Near-exact dedup on the normalized-text md5 fingerprint.
    Returns (fingerprint, n_docs, min_id)."""
    return (
        df.select(
            F.col(id_col),
            F.md5(normalize_text(F.col(text_col)).cast("binary")).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("min_id"))
    )


def shingle_arrays(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, unit: str = "word"
) -> DataFrame:
    """Per-doc DISTINCT shingle array, computed entirely map-side:
    (id, __sh array<string>, __n int). No explode, no shuffle — the
    dedup happens inside the row via array_distinct, so a corpus scan
    stays one narrow stage regardless of size.

    Word shingles are the standard unit for large-scale text dedup: the
    shingle space is sparse (vocab^n), so inverted-index joins stay near
    linear — unlike char n-grams whose dense space makes every doc pair
    collide. Pure array HOFs (split/sequence/slice/concat_ws), no Python.
    """
    if unit == "word":
        src = F.split(F.trim(F.lower(F.col(text_col))), WS_RE)
        min_len = F.size("__src") >= n
        arr = F.expr(
            f"array_distinct(transform(sequence(1, size(__src) - {n - 1}), "
            f"i -> concat_ws(' ', slice(__src, i, {n}))))"
        )
    else:
        src = F.lower(F.col(text_col))
        min_len = F.length("__src") >= n
        arr = F.expr(
            f"array_distinct(transform(sequence(1, length(__src) - {n - 1}), "
            f"i -> substring(__src, i, {n})))"
        )
    return (
        df.select(F.col(id_col), src.alias("__src"))
        .filter(min_len)
        .select(id_col, arr.alias("__sh"))
        .withColumn("__n", F.size("__sh"))
    )


def word_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    return shingle_arrays(df, text_col, id_col, n, "word").select(
        id_col, F.explode("__sh").alias("shingle")
    )


def char_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 5) -> DataFrame:
    """Distinct character n-gram shingles per doc: (id, shingle)."""
    return shingle_arrays(df, text_col, id_col, n, "char").select(
        id_col, F.explode("__sh").alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
    unit: str = "word",
    freq_mode: str = "broadcast_head",
    hot_df_cap: int = 64,
) -> DataFrame:
    """EXACT n-gram Jaccard similarity for all pairs above ``threshold``.

    Prefix-filtered similarity join (PPJoin-style; Xiao et al., WWW'08):
    shingles are globally ordered by (document frequency, shingle), each
    doc indexes only its first floor((1-t)*|d|)+1 rarest shingles, and
    candidate pairs must collide on a prefix shingle. The prefix-filter
    theorem guarantees no pair with jaccard >= t is missed, so the output
    is identical to the naive quadratic join — but hot shingles (which
    appear in everyone's suffix, never in prefixes) no longer explode the
    join. Candidates are then verified with an exact intersection count.

    Candidates surviving size + position filters are verified with an
    exact intersection count via array_intersect on the per-doc shingle
    arrays (built map-side, no explode/distinct shuffle).

    ``max_doc_freq`` additionally drops ultra-frequent shingles entirely
    (approximation; changes semantics — off by default).

    All fractional boundary comparisons are epsilon-padded toward
    KEEPING the pair: e.g. floor((1-0.8)*50) evaluates to floor(9.99..)
    = 9 in binary FP while the prefix theorem requires 10, which would
    silently drop true boundary pairs. Padding only weakens pruning —
    the exact verify step restores precision.

    At 100 TB: doc frequency is a map-side-combinable
    ``groupBy(shingle).count()`` joined back onto the exploded shingles
    (never a count-over-window — a window pins a hot shingle's whole
    occurrence list to one task), one doc-partitioned window for the
    prefix rank (bounded by doc length), one prefix self-join, and a
    candidate-verify join against the doc arrays; candidate volume
    follows true near-duplicate density rather than corpus size
    squared. Skewed prefix shingles are bounded by construction (a
    shingle lands in a prefix only while globally rare).

    ``freq_mode`` picks how the frequency ORDER reaches each shingle:

    - ``'exact'``: shuffle-join the full frequency table back
      on the shingle key. Optimal prefix ordering (fewest candidates),
      but the join-back concentrates a hot shingle's occurrence rows in
      one task, and AQE's skew split cannot rescue it — the rule only
      matches plain two-shuffle SMJ children, not the
      ``Sort(HashAggregate(Shuffle))`` the frequency side planates to.
      Opt-in (A/B comparison; near-uniform shingle frequencies).
    - ``'broadcast_head'`` (DEFAULT — a web-corpus trigram can sit in
      half the documents, and one such key makes ``'exact'`` a
      straggler at scale): broadcast only the HOT head of the
      frequency table (df > ``hot_df_cap`` — by Zipf a tiny set,
      corpus_occurrences/cap entries max) and give every tail shingle
      frequency bucket 0, ordered lexicographically. The prefix-filter
      theorem needs only a GLOBALLY CONSISTENT total order, not the
      true frequency order, so the output is IDENTICAL (the exact
      verify step is unchanged); prefixes still exclude exactly the
      hot shingles that cause quadratic blowup. The shingle join
      becomes a broadcast hash join: NO shuffle on the shingle key
      anywhere, so no hot-key task exists at any corpus size — the
      100 TB mode. Tradeoff: tail prefixes are lexicographic rather
      than rarest-first, admitting up to ~``hot_df_cap`` extra
      candidates per prefix shingle.

    Returns (id_a, id_b, jaccard) with id_a < id_b.

    Plan-build note (round 11): the pipeline is expressed as SQL-string
    expressions (``selectExpr``/``F.expr``) with explicit ``D``-suffixed
    double literals via ``repr`` (round-trip exact, so every literal is
    bit-identical to the former ``F.lit`` doubles), and consecutive
    narrow projections are merged. Each string costs ONE py4j round
    trip where the Column-algebra form paid one per operator; the
    resolved plan — and therefore the output — is unchanged.
    """
    eps = 1e-9
    epsl = f"{eps!r}D"
    # docs feeds three branches (explode, verify-a, verify-b) and prefix
    # feeds the self-join twice: cache both so the scan+shingle and the
    # two window passes run once, not 4x
    docs = shingle_arrays(df, text_col, id_col, n, unit).cache()
    sh = docs.select(id_col, "__n", F.explode("__sh").alias("shingle"))
    # Doc frequency via groupBy + join, NEVER count() OVER (PARTITION BY
    # shingle): a window puts a hot shingle's entire occurrence list into
    # one task with no map-side combine — a straggler at web-corpus
    # scale. The groupBy's partial aggregation shrinks the second shuffle
    # to distinct shingles, and AQE turns the join broadcast / splits
    # skewed partitions at runtime.
    if freq_mode not in ("exact", "broadcast_head"):
        raise ValueError("freq_mode must be 'exact' or 'broadcast_head'")
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    if max_doc_freq is not None:
        keep = freq.filter(F.col("__df") <= max_doc_freq)
        sh = sh.join(keep.select("shingle"), "shingle", "left_semi")
        docs = sh.groupBy(id_col).agg(F.collect_list("shingle").alias("__sh"))
        docs = docs.withColumn("__n", F.size("__sh"))
        sh = docs.select(id_col, "__n", F.explode("__sh").alias("shingle"))
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    if freq_mode == "broadcast_head":
        head = freq.filter(F.col("__df") > hot_df_cap).withColumnRenamed(
            "__df", "__hdf"
        )
        with_df = sh.join(F.broadcast(head), "shingle", "left").selectExpr(
            id_col, "__n", "shingle",
            "CAST(coalesce(__hdf, 0) AS BIGINT) AS __df",
        )
    else:
        with_df = sh.join(freq, "shingle")
    # prefix length |d| - ceil(t*|d|) + 1, via epsilon-padded floor
    prefix = with_df.selectExpr(
        id_col, "shingle", "__n",
        f"row_number() OVER (PARTITION BY {id_col}"
        " ORDER BY __df, shingle) AS __rn",
    ).filter(
        f"__rn <= CAST(floor({(1.0 - threshold)!r}D * __n + {epsl}) AS INT) + 1"
    ).cache()
    a = prefix.selectExpr(
        f"{id_col} AS id_a", "shingle", "__n AS __na", "__rn AS __pa"
    )
    b = prefix.selectExpr(
        f"{id_col} AS id_b", "shingle", "__n AS __nb", "__rn AS __pb"
    )
    # size filter: jaccard >= t forces t*|B| <= |A| <= |B|/t;
    # position filter (PPJoin): overlap upper bound from the prefix
    # match positions must still reach the required overlap
    # t/(1+t) * (|A|+|B|)
    tl = f"{threshold!r}D"
    cand = (
        a.join(
            b,
            (a["shingle"] == b["shingle"])
            & F.expr(
                f"id_a < id_b AND __na >= {tl} * __nb - {epsl}"
                f" AND __nb >= {tl} * __na - {epsl}"
                " AND 1 + least(__na - __pa, __nb - __pb) >="
                f" {(threshold / (1.0 + threshold))!r}D * (__na + __nb) - {epsl}"
            ),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    da = docs.selectExpr(f"{id_col} AS id_a", "__sh AS __sha")
    db = docs.selectExpr(f"{id_col} AS id_b", "__sh AS __shb")
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .selectExpr(
            "id_a", "id_b",
            "size(array_intersect(__sha, __shb)) AS __c",
            "size(__sha) AS __na", "size(__shb) AS __nb",
        )
        .selectExpr(
            "id_a", "id_b",
            "CAST(__c AS DOUBLE) / CAST(__na + __nb - __c AS DOUBLE) AS jaccard",
        )
        .filter(f"jaccard >= {tl}")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_perm: int = 64, n: int = 3,
    seed: int = 42, unit: str = "word",
) -> DataFrame:
    """MinHash signature matrix: (id, perm_id, minhash).

    Universal hashing h_i(x) = (a_i * x + b_i) mod p over xxhash64
    shingle hashes; the permutation table is tiny and broadcast."""
    rng = random.Random(seed)
    perms = [(i, rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31)) for i in range(num_perm)]
    spark = df.sparkSession
    pdf = spark.createDataFrame(perms, "perm_id INT, a LONG, b LONG")
    shingler = word_shingles if unit == "word" else char_shingles
    sh = shingler(df, text_col, id_col, n).select(
        id_col, F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE31)).alias("__h")
    )
    return (
        sh.join(F.broadcast(pdf))
        .select(
            id_col,
            "perm_id",
            F.pmod(F.col("a") * F.col("__h") + F.col("b"), F.lit(_MERSENNE31)).alias("__ph"),
        )
        .groupBy(id_col, "perm_id")
        .agg(F.min("__ph").alias("minhash"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    seed: int = 42,
    unit: str = "word",
) -> DataFrame:
    """LSH banding over MinHash signatures.

    Docs sharing >=1 band bucket become candidates; the estimated Jaccard
    (matching-minhash fraction) is attached so callers can threshold.
    Returns (id_a, id_b, n_shared_bands, est_jaccard).
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, text_col, id_col, num_perm, n, seed, unit)
    banded = sig.withColumn("band", (F.col("perm_id") / rows_per_band).cast("int"))
    band_sig = banded.groupBy(id_col, "band").agg(
        F.md5(
            F.to_json(F.sort_array(F.collect_list(F.struct("perm_id", "minhash"))))
        ).alias("bsig")
    )
    a = band_sig.select(F.col(id_col).alias("id_a"), "band", "bsig")
    b = band_sig.select(F.col(id_col).alias("id_b"), "band", "bsig")
    cand = (
        a.join(b, ["band", "bsig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    siga = sig.select(F.col(id_col).alias("id_a"), "perm_id", F.col("minhash").alias("mh_a"))
    sigb = sig.select(F.col(id_col).alias("id_b"), "perm_id", F.col("minhash").alias("mh_b"))
    est = (
        cand.join(siga, "id_a")
        .join(sigb, ["id_b", "perm_id"])
        .groupBy("id_a", "id_b", "n_shared_bands")
        .agg(
            (
                F.sum(F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0))
                / F.lit(num_perm)
            ).cast("double").alias("est_jaccard")
        )
    )
    return est


def simhash_near_dup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= max_hamming.

    Banded LSH join with a pigeonhole guarantee: split the 64-bit
    signature into ``bands`` equal slices; two signatures within
    Hamming distance ``bands - 1`` MUST agree on at least one slice, so
    with ``bands > max_hamming`` the candidate join is lossless and the
    result is exactly the brute-force pair set. One band-key shuffle +
    bit_count verify — never a cross product.

    Returns (id_a, id_b, hamming).
    """
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for exact recall")
    width = 64 // bands
    sig = simhash64(df, text_col, id_col)
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for i in range(bands)
        ]
    )
    banded = sig.select(id_col, "simhash", F.explode(band_arr).alias("b")).select(
        id_col, "simhash", F.col("b.band").alias("band"), F.col("b.val").alias("val")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("__sa"), "band", "val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("__sb"), "band", "val"
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.expr("__sa ^ __sb")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 5, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS algorithm): hash every character k-gram, slide a window of
    ``w`` consecutive hashes, keep each window's minimum. Guarantees at
    least one shared fingerprint for any common substring of length
    >= w + k - 1, with density ~2/(w+1).

    Built as explode + frame-window min (one shuffle on doc id); the
    fingerprint set is orders of magnitude smaller than the k-gram set,
    so downstream overlap joins stay cheap at corpus scale.

    Returns distinct (id, fingerprint).
    """
    from pyspark.sql import Window as W

    t = F.lower(F.col(text_col))
    grams = (
        df.select(F.col(id_col), t.alias("__t"))
        .filter(F.length("__t") >= k + w - 1)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.length("__t") - (k - 1))).alias("__pos"),
            "__t",
        )
        .select(
            F.col(id_col),
            "__pos",
            F.xxhash64(F.substring(F.col("__t"), F.col("__pos"), k)).alias("__h"),
            (F.length("__t") - (k - 1)).alias("__ngrams"),
        )
    )
    win = W.partitionBy(id_col).orderBy("__pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("__wmin", F.min("__h").over(win))
        # only positions with a full w-window define fingerprints
        .filter(F.col("__pos") <= F.col("__ngrams") - (w - 1))
        .select(F.col(id_col), F.col("__wmin").alias("fingerprint"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    shortcut: bool = True,
    canonical_edges: bool = False,
) -> DataFrame:
    """Connected components over an undirected edge list by iterative
    min-label propagation: every node starts labeled with its own id and
    repeatedly takes the minimum label among itself and its neighbors
    until a fixpoint. Returns (node, component) where ``component`` is
    the minimum node id in the component.

    This is the step that turns pairwise near-duplicate EDGES into
    duplicate CLUSTERS (pick one representative per component) — pair
    output alone under-deletes because near-duplication is transitive
    in practice (A~B, B~C but A!~C).

    Scale: each iteration is one hash join (neighbor labels) + one
    groupBy-min, both shuffling on node id; iterations needed = graph
    diameter, which for duplicate clusters is small (near-clique
    components). Lineage is truncated per iteration with
    ``localCheckpoint`` so the plan does not grow across iterations;
    convergence is detected by the (monotonically non-increasing) sum
    of labels going stationary.

    ``shortcut=True`` (default, r4) adds POINTER JUMPING after each
    propagation step: comp(u) <- comp(comp(u)) via one self-join. Label
    distance to the component minimum then halves every round on top of
    the propagation step, so adversarial long chains converge in
    O(log diameter) rounds instead of O(diameter) — the same guarantee
    class as large-star/small-star (Kiveris et al., SoCC'14) with the
    join primitives already here. On near-clique duplicate graphs (the
    common case) it costs one extra small join for the same 2-3 rounds.
    The fixpoint is identical: comp values are always node ids inside
    the component, monotonically non-increasing, bounded by the min.

    ``canonical_edges=True`` asserts the caller's edge list is already
    DISTINCT with ``src < dst`` strictly (no self-loops) — true of every
    pair generator here (jaccard_pairs / minhash verification emit
    unique ordered pairs). The symmetrized union is then distinct by
    construction and the dedup shuffle over the edge list is skipped —
    at corpus scale that is one full exchange+aggregate over the pair
    set. The assertion is safe-by-construction: a wrong claim can only
    leave duplicate edge ROWS, which the per-round ``min`` absorbs —
    the fixpoint labels (and the per-node convergence sum) are
    identical either way, only wasted work differs.

    ``connected_components.last_rounds`` records the rounds the last
    call used (test instrumentation).
    """
    # ALL checkpoints lazy (r11; r10 kept edges eager): the edge plan,
    # sym, and the initial labels persist with truncated lineage as the
    # ROUND-1 convergence collect computes them — each is a single RDD
    # node in that job's DAG, so the (possibly expensive) edge plan
    # still runs exactly once even though sym references it twice.
    # 2 pre-loop driver actions (r10) -> 0.
    one_way = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=False
    )
    sym = one_way.union(
        one_way.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    if not canonical_edges:
        sym = sym.distinct()
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select("u").distinct().select(F.col("u").alias("node"), F.col("u").alias("comp"))
    ).localCheckpoint(eager=False)
    # No initial-sum collect: round 1 strictly lowers some label on any
    # graph with a non-self-loop edge (a node adjacent to a smaller id
    # takes it), so comparing round 1 against a never-equal sentinel
    # costs zero extra rounds there; the degenerate cases break via the
    # None check (empty graph -> sum(comp) is None: no labels exist, a
    # fixpoint by definition). Self-loop-only graphs pay one extra
    # round — no generator here emits self-loops.
    prev_sum: object = object()
    rounds = 0
    for i in range(max_iter):
        rounds = i + 1
        nb = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(F.col("u").alias("node"), "comp")
        )
        labels = labels.union(nb).groupBy("node").agg(F.min("comp").alias("comp"))
        if shortcut:
            # pointer jump: comp(u) <- comp(comp(u)); every comp value
            # is itself a labeled node, so the join is total
            l2 = labels.select(
                F.col("node").alias("__cn"), F.col("comp").alias("__cc")
            )
            labels = labels.join(l2, labels["comp"] == l2["__cn"]).select(
                "node", F.col("__cc").alias("comp")
            )
        # lazy checkpoint + the convergence sum in ONE job per round
        # (was two: an eager materialization plus a separate collect)
        labels = labels.localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum or cur_sum is None:
            break
        prev_sum = cur_sum
    connected_components.last_rounds = rounds
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def duplicate_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Full dedup clustering: exact n-gram Jaccard pairs above
    ``threshold`` -> connected components -> every document labeled with
    its cluster id (singletons keep their own id). Returns
    (id, cluster_id)."""
    pairs = jaccard_pairs(df, text_col, id_col, n=n, threshold=threshold)
    # jaccard_pairs emits DISTINCT ordered pairs (id_a < id_b): skip the
    # symmetrize-dedup shuffle (see connected_components docstring)
    comp = connected_components(pairs, canonical_edges=True)
    return (
        df.select(id_col)
        .join(comp, F.col(id_col) == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )


def scalable_duplicate_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """The 100 TB near-dup clustering pipeline: MinHash-LSH candidate
    generation -> EXACT Jaccard verification on candidates only ->
    connected components -> every document labeled (id, cluster_id).

    Contrast with ``duplicate_clusters`` (exact prefix-filtered join):
    this variant's candidate volume is bounded by LSH collisions —
    tunable via bands/rows — so cost tracks true duplicate density even
    when the corpus' shingle-frequency profile defeats prefix filtering.
    Verification keeps precision exact (no false merges); recall is the
    standard LSH S-curve, 1-(1-t^r)^b (~0.9998 at t=0.8 with 16x4).
    """
    cand = minhash_lsh_candidates(
        df, text_col, id_col, num_perm=num_perm, bands=bands, n=n, seed=seed
    ).select("id_a", "id_b")
    docs = shingle_arrays(df, text_col, id_col, n)
    da = docs.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"))
    inter = F.size(F.array_intersect("__sha", "__shb"))
    verified = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                inter.cast("double")
                / (F.size("__sha") + F.size("__shb") - inter).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # the LSH candidate set is groupBy(id_a, id_b)-unique with
    # id_a < id_b, and verification only filters it: canonical edges
    comp = connected_components(verified, canonical_edges=True)
    return (
        df.select(id_col)
        .join(comp, F.col(id_col) == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )


def incremental_dedup(
    new_df: DataFrame, corpus_df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Incremental ingest dedup: canonical representatives of the NEW
    batch (exact content-hash dedup within the batch) that do not
    already exist in the corpus — the per-ingest step of a continuously
    growing training set. Returns (id, content_hash).

    One groupBy on the batch (small) + one anti join against corpus
    hashes; at 100 TB the corpus side is a pre-materialized hash table
    partitioned on content_hash, so each ingest shuffles only the batch
    and probes in place."""
    batch = exact_dedup(new_df, text_col, id_col)
    corpus_hashes = corpus_df.select(
        F.md5(F.col(text_col).cast("binary")).alias("content_hash")
    )
    return batch.join(corpus_hashes, "content_hash", "left_anti").select(
        id_col, "content_hash"
    )


# Portable Bloom probe positions: fold the fingerprint STRING through
# the base-31 polynomial (as in simhash_portable), then k universal
# hashes (a_s*h + b_s) mod m with fixed odd multipliers. Every product
# stays under 2^63 (a_s < 2^32, h < 2^31), so Spark (ANSI) and DuckDB
# compute identical positions — giving the bloom-screened pipeline an
# exact SQL oracle (x33), unlike the xxhash64 mode.
_BLOOM_A0, _BLOOM_DA = 2654435761, 40503
_BLOOM_B0 = 97


def _portable_pos(fp_col: str, seed_col: str, m_bits: int):
    h = F.expr(
        f"aggregate(transform(sequence(1, length({fp_col})), "
        f"i -> ascii(substring({fp_col}, i, 1))), "
        f"cast(0 as bigint), (acc, c) -> pmod(acc * 31 + c, 2147483647))"
    )
    a = F.lit(_BLOOM_A0) + F.lit(_BLOOM_DA) * F.col(seed_col)
    return F.pmod(a * h + F.lit(_BLOOM_B0) + F.col(seed_col), F.lit(m_bits))


def bloom_table(
    df: DataFrame,
    fp_col: str,
    m_bits: int = 1 << 22,
    k: int = 5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Build a Bloom filter AS A DISTRIBUTED TABLE: one row per 64-bit
    word of the bit array, ``(word BIGINT, bits BIGINT)``.

    Each fingerprint sets ``k`` positions — ``xxhash64(fp, seed) mod m``
    in the default mode, or the engine-portable polynomial universal
    hash (``hash_mode='portable'``, SQL-oracle-checkable) — and
    positions aggregate into word-level masks with ``bit_or`` (map-side
    combinable — the per-partition partials are already word masks).
    Unlike a driver-side sketch (``df.stat.bloomFilter``), this filter
    never leaves the cluster and is mergeable across ingest runs by
    unioning tables and re-bit_or'ing. Size: m/64 rows max (a few MB for
    billions of bits), broadcastable at probe time.
    """
    probes = df.select(F.col(fp_col).alias("__fp")).select(
        "__fp", F.explode(F.expr(f"sequence(0, {k - 1})")).alias("__seed")
    )
    if hash_mode == "portable":
        pos = _portable_pos("__fp", "__seed", m_bits)
    else:
        pos = F.pmod(F.xxhash64(F.col("__fp"), F.col("__seed")), F.lit(m_bits))
    return (
        probes.select(
            (pos / 64).cast("long").alias("word"),
            (pos % 64).cast("int").alias("__bit"),
        )
        .groupBy("word")
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), __bit))").alias("bits")
        )
    )


def bloom_incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    m_bits: int = 1 << 22,
    k: int = 5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Bloom-guarded incremental ingest dedup: returns batch docs that
    are DEFINITELY NEW (not content-identical to any corpus doc).

    The Bloom guarantee runs in the safe direction for training data: a
    fingerprint present in the corpus always probes positive (no false
    negatives), so no known duplicate can slip through; a small
    fp-rate fraction of genuinely-new docs is over-dropped
    (``tests/test_operators.py`` bounds both directions).

    At 100 TB this replaces the anti-join's full corpus-side shuffle
    with a probe against an m/64-row broadcast table — the corpus is
    touched once (or incrementally, since word masks merge by bit_or)
    regardless of how many ingest batches follow. Returns
    (id, content_hash).
    """
    fp = F.md5(F.col(text_col).cast("binary")).alias("__fp")
    bloom = bloom_table(corpus_df.select(fp), "__fp", m_bits, k, hash_mode)
    batch = new_df.select(F.col(id_col), fp)
    probes = batch.select(
        id_col, "__fp", F.explode(F.expr(f"sequence(0, {k - 1})")).alias("__seed")
    )
    if hash_mode == "portable":
        pos = _portable_pos("__fp", "__seed", m_bits)
    else:
        pos = F.pmod(F.xxhash64(F.col("__fp"), F.col("__seed")), F.lit(m_bits))
    probed = probes.select(
        id_col,
        "__fp",
        (pos / 64).cast("long").alias("word"),
        (pos % 64).cast("int").alias("__bit"),
    ).join(F.broadcast(bloom), "word", "left")
    hit = F.when(
        F.col("bits").isNotNull()
        & (
            F.expr("bits & shiftleft(CAST(1 AS BIGINT), __bit)") != 0
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    verdict = probed.groupBy(id_col, "__fp").agg(
        F.min(hit).alias("__all_hit")  # all k probes must hit => probable dup
    )
    return (
        verdict.filter(F.col("__all_hit") == 0)
        .select(F.col(id_col), F.col("__fp").alias("content_hash"))
    )


def contamination(
    test: DataFrame,
    train: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    unit: str = "word",
) -> DataFrame:
    """Train/test contamination check: for every test document, the
    fraction of its distinct word n-grams that appear anywhere in the
    training corpus. Returns (id, n_shingles, n_overlap,
    contamination_ratio).

    Shape: test shingles (map-side arrays, exploded) LEFT SEMI join the
    distinct train shingle set, then a per-doc count — cost scales with
    shingle volume, never test x train pairs. At 100 TB the train
    shingle set is the big side: keep the semi join shuffle-partitioned
    on the shingle (Spark does), or swap the exact semi join for a
    Bloom/xxhash64 filter broadcast when approximate membership is
    acceptable.
    """
    tsh = shingle_arrays(test, text_col, id_col, n, unit).select(
        id_col, F.explode("__sh").alias("shingle")
    )
    # no distinct on the train side: LEFT SEMI is set-semantics already,
    # and deduplicating first would cost a full extra shuffle
    trsh = shingle_arrays(train, text_col, id_col, n, unit).select(
        F.explode("__sh").alias("shingle")
    )
    per_doc = tsh.join(trsh, "shingle", "left_semi").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    sizes = tsh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        sizes.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            "n_shingles",
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
            (
                F.coalesce("n_overlap", F.lit(0)).cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("contamination_ratio"),
        )
    )


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sum +1/-1 weighted
    by token-hash bits, sign -> bit. One explode + one aggregation.
    Returns (id, simhash)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), WS_RE)).alias("tok"),
    ).filter(F.length("tok") > 0)
    hashed = toks.select(id_col, F.xxhash64("tok").alias("__h"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    counted = hashed.groupBy(id_col).agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return counted.select(F.col(id_col), sim.alias("simhash"))


# Engine-portable polynomial token hash: base-31 code-point fold mod the
# Mersenne prime 2^31-1. Every term stays far inside int64 (acc < 2^31,
# *31 + codepoint < 2^36), so ANSI-mode Spark and DuckDB both evaluate
# the identical integer sequence — unlike xxhash64, whose implementation
# is engine-specific.
_PORTABLE_MOD = (1 << 31) - 1
_PORTABLE_BASE = 31
PORTABLE_SIMHASH_BITS = 31

_PORTABLE_TOKEN_HASH = (
    "aggregate(transform(sequence(1, length(tok)), i -> ascii(substring(tok, i, 1))), "
    f"cast(0 as bigint), (acc, c) -> pmod(acc * {_PORTABLE_BASE} + c, {_PORTABLE_MOD}))"
)


def simhash_portable(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """31-bit SimHash over whitespace tokens using the PORTABLE
    polynomial token hash — same sign-of-bit-sums construction as
    :func:`simhash64`, but every step (code-point fold, bit tests,
    sign aggregation) is exact integer arithmetic any SQL engine
    reproduces bit-for-bit, so the full signature is oracle-checkable
    (x42) rather than rows-only. Same single explode + one map-side-
    combinable aggregation shape as simhash64; 31 columns instead of
    64. Returns (id, simhash)."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), WS_RE)).alias("tok"),
    ).filter(F.length("tok") > 0)
    hashed = toks.select(F.col(id_col), F.expr(_PORTABLE_TOKEN_HASH).alias("__h"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(PORTABLE_SIMHASH_BITS)
    ]
    counted = hashed.groupBy(id_col).agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for i in range(PORTABLE_SIMHASH_BITS):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return counted.select(F.col(id_col), sim.alias("simhash"))


def portable_simhash_near_dup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by Hamming distance over the PORTABLE
    31-bit simhash — the same pigeonhole-banded join as
    :func:`simhash_near_dup` (bands > max_hamming => lossless, never a
    cross product), treating the signature as 32 bits (bit 31 is always
    0). Because the signature itself is engine-portable, the whole pair
    set has an exact brute-force SQL oracle (x43). Returns
    (id_a, id_b, hamming)."""
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for exact recall")
    width = 32 // bands
    sig = simhash_portable(df, text_col, id_col)
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for i in range(bands)
        ]
    )
    banded = sig.select(id_col, "simhash", F.explode(band_arr).alias("b")).select(
        id_col, "simhash", F.col("b.band").alias("band"), F.col("b.val").alias("val")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("__sa"), "band", "val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("__sb"), "band", "val"
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.expr("__sa ^ __sb")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def source_shingle_overlap(
    df: DataFrame, text_col: str, group_col: str, n: int = 3
) -> DataFrame:
    """Pairwise shingle-set Jaccard BETWEEN groups (sources/domains) —
    the corpus-level overlap matrix used to spot redundant crawls and
    plan mixing weights.

    Shingles are distinct word n-grams per group (same normalization as
    ``jaccard_pairs``); output one row per unordered group pair:
    (src_a, src_b, n_a, n_b, n_common, jaccard) with src_a < src_b.

    Scale: one shuffle keyed on the shingle builds the sorted list of
    groups containing it; the k(k-1)/2 pair expansion happens inside
    the row (array HOF), so nothing is joined against itself and the
    pair counts aggregate map-side. A shingle in k groups emits
    k(k-1)/2 rows, bounded by (#groups)^2 — sources are few
    (tens/hundreds), so the expansion is tiny next to the corpus scan.
    """
    sh = (
        shingle_arrays(df, text_col, group_col, n, "word")
        .select(group_col, F.explode("__sh").alias("__g"))
        .distinct()
        .cache()
    )
    sizes = sh.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    # per-shingle sorted group list -> in-row unordered pair expansion
    groups = sh.groupBy("__g").agg(
        F.sort_array(F.collect_set(group_col)).alias("__gs")
    )
    pairs = groups.filter(F.size("__gs") >= 2).select(
        F.explode(
            F.expr(
                "flatten(transform(__gs, (x, i) -> "
                "transform(slice(__gs, i + 2, size(__gs)), "
                "y -> struct(x AS src_a, y AS src_b))))"
            )
        ).alias("__p")
    )
    inter = (
        pairs.select("__p.src_a", "__p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(group_col).alias("src_a"), F.col("__n").alias("n_a"))
    sb = sizes.select(F.col(group_col).alias("src_b"), F.col("__n").alias("n_b"))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


def chunk_dedup_rewrite(
    df: DataFrame, text_col: str, id_col: str, chunk_tokens: int = 16
) -> DataFrame:
    """Corpus-wide keep-first chunk dedup with document REWRITE — the
    scrubbing counterpart of ``chunk_boilerplate_stats`` (C4/CCNet-style
    line dedup, chunk analogue; the corpus here is single-line so fixed
    token windows stand in for lines; on newline-structured corpora pass
    the line split instead).

    Every document's token stream is cut into ``chunk_tokens``-token
    windows; for each distinct chunk string only the FIRST occurrence
    corpus-wide survives (first = lowest ``(id, chunk position)``), all
    later occurrences are dropped, and each document is reassembled from
    its surviving chunks in original order. Returns per doc:
    (id, n_chunks, n_kept, dedup_text).

    Scale: chunking is map-side; the keep-first winner per chunk is one
    ``min(struct(id, pos))`` groupBy on the chunk string (map-side
    combinable — no window/sort over the corpus); the winner set joins
    back on the chunk hash. Reassembly sorts only within a document
    (``array_sort`` of that doc's surviving chunks, bounded by doc
    length, not corpus size).
    """
    toks = F.split(F.trim(F.col(text_col)), WS_RE)
    chunks = df.select(F.col(id_col), toks.alias("__t")).select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(__t) / {chunk_tokens}.0) "
                f"as int) - 1), i -> concat_ws(' ', slice(__t, "
                f"i * {chunk_tokens} + 1, {chunk_tokens})))"
            )
        ).alias("__pos", "__chunk"),
    )
    winners = chunks.groupBy("__chunk").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("__pos").alias("p"))).alias(
            "__first"
        )
    )
    marked = chunks.join(winners, "__chunk").withColumn(
        "__keep",
        (F.col("__first.i") == F.col(id_col)) & (F.col("__first.p") == F.col("__pos")),
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("__keep").cast("int")).cast("bigint").alias("n_kept"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list("
                    "CASE WHEN __keep THEN struct(__pos AS p, __chunk AS c) END)), "
                    "s -> s.c)"
                ),
            ).alias("dedup_text"),
        )
    )


def simhash_cross_contamination(
    test_df: DataFrame,
    train_df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """NEAR-duplicate cross-corpus decontamination: for every test-set
    document, count training documents within ``max_hamming`` bits of
    its portable simhash — the fuzzy complement of the exact n-gram
    overlap check (contamination/x26), catching benchmark leakage that
    survives paraphrase-level edits (Lee et al. ACL'22 report ~1%+ of
    eval sets leak this way).

    Same lossless pigeonhole banding as portable_simhash_near_dup
    (bands > max_hamming), joined ACROSS corpora: the train side never
    self-joins, band values distribute the work, and at 100 TB the
    (small) test side's banded signatures broadcast. Returns one row
    per test doc: (id, n_near_dup_train, contaminated).
    """
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for exact recall")
    width = 32 // bands
    mask = (1 << width) - 1

    def banded(df, side):
        sig = simhash_portable(df, text_col, id_col)
        arr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit(mask))
                    .alias("val"),
                )
                for i in range(bands)
            ]
        )
        return sig.select(
            F.col(id_col).alias(f"id_{side}"),
            F.col("simhash").alias(f"__s{side}"),
            F.explode(arr).alias("b"),
        ).select(
            f"id_{side}", f"__s{side}",
            F.col("b.band").alias("band"), F.col("b.val").alias("val"),
        )

    t = banded(test_df, "t")
    r = banded(train_df, "r")
    hits = (
        F.broadcast(t)
        .join(r, ["band", "val"])
        .select(
            "id_t",
            "id_r",
            F.bit_count(F.expr("__st ^ __sr")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_t", "id_r")
        .distinct()
        .groupBy("id_t")
        .agg(F.count(F.lit(1)).alias("n_near_dup_train"))
    )
    base = test_df.select(F.col(id_col))
    return base.join(
        hits.withColumnRenamed("id_t", id_col), id_col, "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("n_near_dup_train"), F.lit(0)).cast("bigint").alias(
            "n_near_dup_train"
        ),
        (F.coalesce(F.col("n_near_dup_train"), F.lit(0)) > 0).alias("contaminated"),
    )


def edit_distance_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    k: int = 2,
    q: int = 2,
    hot_gram_cap: int = 64,
    short_bucket_budget: int = 50_000_000,
) -> DataFrame:
    """EXACT edit-distance similarity join: all pairs with
    levenshtein(a, b) <= ``k`` (Ed-Join shape; Xiao, Wang & Lin,
    VLDB'08) — the string-key complement of ``jaccard_pairs`` for
    near-identical titles / URLs / openings where token-set similarity
    is too coarse.

    Candidate filter (no false negatives): k edits destroy at most
    ``k*q`` of a string's DISTINCT q-grams, so two strings within
    distance k must share a q-gram among the first ``k*q + 1`` of
    their gram sets under ANY globally consistent order — the same
    prefix-filter theorem as PPJoin, so the same skew-proof frequency
    order applies (broadcast hot head, lexicographic tail: no shuffle
    of the exploded gram set on the gram key). The theorem needs the
    smaller side to OWN more than k*q grams; strings with <= k*q grams
    (length <= q*(k+1)-1, including gram-less ones) instead pair
    exhaustively inside a bounded length bucket.
    A length filter |len_a - len_b| <= k prunes candidates before the
    exact ``levenshtein`` verify, which restores full precision.

    At 100 TB: one narrow gram map + combinable frequency groupBy +
    broadcast attach + bounded-prefix self-join; candidate volume
    follows true near-duplicate density. The few-gram bucket's
    cross-pairing is guarded in-plan: if the short-string population
    would generate more than ``short_bucket_budget`` candidate pairs
    (a pathological key column — e.g. millions of empty/near-empty
    keys — whose TRUE pair output is itself quadratic), the job fails
    loudly at execution instead of silently going quadratic (r5
    verdict item 5).

    NULL keys follow SQL semantics and produce no pairs —
    ``levenshtein(NULL, x)`` is NULL, never <= k (the r5 advisor's
    operator/oracle divergence: the old version coalesced NULL to ''
    and paired it with every short string).

    Returns (id_a, id_b, edit_distance) with id_a < id_b.
    """
    from pyspark.sql import Window as W

    s = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(id_col), F.col(col).alias("__s"))
        .withColumn("__len", F.length("__s"))
    )
    grams = s.filter(F.col("__len") >= q).select(
        id_col,
        "__len",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, length(__s) - {q - 1}), "
                f"i -> substring(__s, i, {q})))"
            )
        ).alias("__g"),
    )
    freq = grams.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))
    head = freq.filter(F.col("__df") > hot_gram_cap).withColumnRenamed(
        "__df", "__hdf"
    )
    ranked = (
        grams.join(F.broadcast(head), "__g", "left")
        .withColumn("__o", F.coalesce(F.col("__hdf"), F.lit(0)).cast("bigint"))
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(id_col).orderBy(F.col("__o"), F.col("__g"))
            ),
        )
    )
    prefix = ranked.filter(F.col("__rn") <= k * q + 1).select(
        id_col, "__g", "__len"
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), "__g", F.col("__len").alias("__la")
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), "__g", F.col("__len").alias("__lb")
    )
    cand = (
        a.join(b, "__g")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= k)
        )
        .select("id_a", "id_b")
    )
    # Few-gram bucket: the prefix theorem needs |A ∩ B| >= |A| - k*q
    # >= 1, i.e. AT LEAST k*q + 1 grams on the smaller side — a string
    # with <= k*q grams (length <= q*(k+1) - 1) can sit within
    # distance k while sharing ZERO grams (hypothesis counterexample:
    # 'aa' vs 'cba' at k=2, q=2). Every such string pairs exhaustively
    # against strings within the length filter instead; the bucket is
    # near-empty keys only, bounded by construction for real key
    # columns.
    short_max = q * (k + 1) - 1
    shorts = s.filter(F.col("__len") <= short_max).select(
        F.col(id_col).alias("id_a"), F.lit(1).alias("__b")
    )
    near = s.filter(F.col("__len") <= short_max + k).select(
        F.col(id_col).alias("id_b"), F.lit(1).alias("__b")
    )
    # in-plan budget guard: |shorts| * |near| is this bucket's pair
    # volume; assert_true raises at execution when it exceeds the
    # budget (the filter form survives column pruning — an unused
    # projected column would be optimized away)
    guard = (
        shorts.agg(F.count(F.lit(1)).alias("__ns"))
        .crossJoin(near.agg(F.count(F.lit(1)).alias("__nn")))
        .withColumn("__b", F.lit(1))
    )
    shorts_guarded = shorts.join(F.broadcast(guard), "__b").filter(
        F.assert_true(
            F.col("__ns") * F.col("__nn") <= F.lit(short_bucket_budget),
            F.concat(
                F.lit(
                    "edit_distance_pairs: short-string bucket would "
                    "generate "
                ),
                (F.col("__ns") * F.col("__nn")).cast("string"),
                F.lit(
                    f" candidate pairs (> short_bucket_budget="
                    f"{short_bucket_budget}); the <= {short_max}-char "
                    "key population is pathological (near-empty keys?) "
                    "— dedupe or filter them first, or raise the budget"
                ),
            ),
        ).isNull()
    ).select("id_a", "__b")
    cand_short = (
        shorts_guarded.join(near, "__b")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
    )
    sa = s.select(F.col(id_col).alias("id_a"), F.col("__s").alias("__sa"))
    sb = s.select(F.col(id_col).alias("id_b"), F.col("__s").alias("__sb"))
    return (
        cand.unionByName(cand_short)
        .distinct()
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__sa", "__sb").cast("int").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= k)
    )


_CONTAINMENT_CACHE: list = []


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.9,
    hot_df_cap: int = 64,
) -> DataFrame:
    """EXACT asymmetric containment join: all ordered pairs where at
    least ``threshold`` of A's distinct n-gram shingles also appear in
    B — excerpt/quote detection (a short doc living inside a long one),
    which symmetric Jaccard cannot express: J(A,B) goes to zero as B
    grows even at containment 1.0.

    Candidate filter (no false negatives): containment >= t forces an
    overlap of ceil(t*|A|), so B must contain one of A's first
    |A| - ceil(t*|A|) + 1 shingles under any globally consistent order
    — the prefix-filter theorem applied one-sided. The order is the
    same skew-proof broadcast-hot-head ordering as ``jaccard_pairs``.
    The exact ``array_intersect`` verify restores precision.

    Candidate join, 100 TB shape (round-6 rework — the r5 version
    joined the prefix against the UNFILTERED exploded shingle set,
    which degrades to a skewed-key sort-merge shuffle once the
    inverted index outgrows broadcast). The join is split on the same
    rare/hot boundary as the ordering itself:

    - RARE pass: prefix entries on tail shingles join the inverted
      index ANTI-JOINED against the broadcast hot head. Every
      surviving key has global doc frequency <= ``hot_df_cap``, so
      both join sides carry at most ``cap`` rows per key — a
      sort-merge shuffle of this pass is skew-free BY CONSTRUCTION at
      any corpus size (no hot-key task can exist).
    - HOT pass: prefix entries on hot shingles exist only for docs
      whose tail shingles cannot fill the prefix — i.e. docs that are
      at least ceil(t*|A|) boilerplate (hot) shingles, a vanishing
      fraction of any real corpus and at most
      corpus_shingle_occurrences/cap docs even adversarially. This
      small side is EXPLICITLY broadcast and the unfiltered index
      streams over it: the index side is never shuffled on the
      shingle key, so the hot occurrence lists stay distributed. If a
      pathological corpus makes the hot-prefix side exceed the
      broadcast limit, the job fails loudly rather than degrading to
      a skewed shuffle.

    Union of the two passes is exactly the original candidate set, so
    the output is bit-identical to the r5 operator (x67's oracle is
    unchanged).

    Returns (contained_id, container_id, containment) with
    containment = |A ∩ B| / |A| >= threshold; both directions emitted
    when both hold (near-equal docs).
    """
    eps = 1e-9
    # evict the previous invocation's cache (same pattern as x4's
    # _X4_CACHE): repeated calls in one session must not accumulate
    # executor storage
    while _CONTAINMENT_CACHE:
        _CONTAINMENT_CACHE.pop().unpersist()
    docs = shingle_arrays(df, text_col, id_col, n).cache()
    _CONTAINMENT_CACHE.append(docs)
    sh = docs.select(id_col, "__n", F.explode("__sh").alias("shingle"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    head = freq.filter(F.col("__df") > hot_df_cap).withColumnRenamed(
        "__df", "__hdf"
    )
    from pyspark.sql import Window as W

    ranked = (
        sh.join(F.broadcast(head), "shingle", "left")
        .withColumn("__o", F.coalesce(F.col("__hdf"), F.lit(0)).cast("bigint"))
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(id_col).orderBy(F.col("__o"), F.col("shingle"))
            ),
        )
    )
    prefix = ranked.filter(
        F.col("__rn")
        <= F.floor((1.0 - threshold) * F.col("__n") + eps).cast("int") + F.lit(1)
    ).select(F.col(id_col).alias("contained_id"), "shingle", "__o")
    inv = sh.select(F.col(id_col).alias("container_id"), "shingle")
    # rare pass: tail-key x tail-index — <= cap rows per key on BOTH
    # sides, skew-free under any join strategy
    prefix_rare = prefix.filter(F.col("__o") == 0).drop("__o")
    inv_rare = inv.join(
        F.broadcast(head.select("shingle")), "shingle", "left_anti"
    )
    cand_rare = prefix_rare.join(inv_rare, "shingle")
    # hot pass: broadcast the (tiny) hot-prefix side; the unfiltered
    # index is the streaming side — no shingle-key shuffle of inv
    prefix_hot = prefix.filter(F.col("__o") > 0).drop("__o")
    cand_hot = inv.join(F.broadcast(prefix_hot), "shingle")
    cand = (
        cand_rare.unionByName(cand_hot)
        .filter(F.col("contained_id") != F.col("container_id"))
        .select("contained_id", "container_id")
        .distinct()
    )
    da = docs.select(
        F.col(id_col).alias("contained_id"),
        F.col("__sh").alias("__sha"),
        F.col("__n").alias("__na"),
    )
    db = docs.select(
        F.col(id_col).alias("container_id"), F.col("__sh").alias("__shb")
    )
    inter = F.size(F.array_intersect("__sha", "__shb"))
    return (
        cand.join(da, "contained_id")
        .join(db, "container_id")
        .select(
            "contained_id",
            "container_id",
            (inter.cast("double") / F.col("__na").cast("double")).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select("contained_id", "container_id", "containment")
    )


def write_simhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    table: str,
    bands: int = 4,
    buckets: int = 16,
) -> str:
    """Persist the corpus's banded PORTABLE simhash signatures as a
    bucketed table — the build-once half of incremental near-dup
    ingestion (the dedup complement of similarity.write_ann_index):
    one row per (band, val, id, simhash), pigeonhole-banded exactly
    like :func:`portable_simhash_near_dup` so a probe with
    max_hamming < bands is lossless.

    At 100 TB the signature table is ~1/1000th of the corpus bytes
    (one long per doc x bands) and is written once per corpus version;
    every subsequent ingestion batch probes it instead of re-reading
    the corpus text.
    """
    banded = _banded_signatures(df, text_col, id_col, bands)
    from wren_engine_spark.operators import layout

    spark = df.sparkSession
    out = layout.write_bucketed(
        banded.repartition(buckets, F.col("val")), table, "val", buckets
    )
    # a rebuild resets the index wholesale: stale tombstones from the
    # previous incarnation must not delete freshly re-indexed docs
    layout.drop_managed_table(spark, f"{table}__tombstones")
    # meta sidecar: appends must band and bucket EXACTLY like the
    # build (the PQ-index lesson — parameters live with the index,
    # never with the caller)
    layout.write_small_table(
        spark,
        spark.createDataFrame(
            [(int(bands), int(buckets))], "bands INT, buckets INT"
        ),
        f"{table}__meta",
    )
    return out


def _banded_signatures(
    df: DataFrame, text_col: str, id_col: str, bands: int
) -> DataFrame:
    """(corpus_id, corpus_simhash, band, val) rows — the ONE banding
    implementation behind the index build and the ingestion append, so
    the two can never band differently."""
    width = 32 // bands
    sig = simhash_portable(df, text_col, id_col)
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for i in range(bands)
        ]
    )
    return sig.select(id_col, "simhash", F.explode(band_arr).alias("b")).select(
        F.col(id_col).alias("corpus_id"),
        F.col("simhash").alias("corpus_simhash"),
        F.col("b.band").alias("band"),
        F.col("b.val").alias("val"),
    )


def simhash_index_append(
    spark,
    table: str,
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> int:
    """Append an ACCEPTED ingestion batch to the persisted simhash
    index without re-reading or re-hashing the corpus — the
    index-freshness step after ``ingest_decisions`` accepts a batch
    (the dedup complement of ``similarity.pq_index_append``). Band
    count and bucket count come from the index's own ``__meta``
    sidecar, and the signatures are computed by the identical banding
    kernel (``_banded_signatures``), so future probes treat appended
    docs exactly like build-time docs; Spark additionally validates
    the bucket spec on the append write. Cost: one narrow map over
    the batch + a bucketed append — the corpus is never touched.

    Returns the number of appended docs.
    """
    from wren_engine_spark.operators import index_meta

    meta = index_meta.table_meta_row(spark, table)
    if meta is None:
        raise ValueError(
            f"simhash_index_append: index '{table}' has no __meta "
            "sidecar; rebuild it with write_simhash_index before "
            "appending"
        )
    # the returned count is observed DURING the append write (one job,
    # one pass — it cannot disagree with what was written, and the
    # batch's upstream lineage runs exactly once, so the old
    # persist+count+write double-pass is gone)
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    banded = _banded_signatures(observed, text_col, id_col, int(meta.bands))
    from wren_engine_spark.operators import layout

    layout.write_bucketed(
        banded.repartition(int(meta.buckets), F.col("val")),
        table,
        "val",
        int(meta.buckets),
        mode="append",
    )
    return int(obs.get["n"])


def simhash_index_delete(spark, table: str, ids) -> dict:
    """Tombstone-delete docs from the persisted simhash index — the
    dedup-family twin of ``similarity.ann_index_delete``: ids append
    to ``{table}__tombstones`` (column ``corpus_id``, the index's id
    column) and every probe anti-joins them out until
    ``simhash_index_compact`` folds them. Same merge-on-read contract
    and shadowing rule as the other index families."""
    from wren_engine_spark.operators import index_meta, layout

    if index_meta.table_meta_row(spark, table) is None:
        raise ValueError(
            f"simhash_index_delete: index '{table}' has no __meta "
            "sidecar; rebuild it with write_simhash_index"
        )
    return layout.bucketed_index_delete(spark, table, ids, "corpus_id")


def simhash_index_compact(spark, table: str) -> dict:
    """Compact the persisted simhash index after many appends: one
    file per bucket, pending tombstones folded into the rewrite,
    two-rename swap (``layout.compact_bucketed``). Content-preserving
    by contract — probes bit-identical before and after."""
    from wren_engine_spark.operators import index_meta, layout

    m = index_meta.table_meta_row(spark, table)
    if m is None:
        raise ValueError(
            f"simhash_index_compact: index '{table}' has no __meta "
            "sidecar; rebuild it with write_simhash_index"
        )
    return layout.compact_bucketed(
        spark, table, "val", int(m.buckets), tombstone_key="corpus_id"
    )


def simhash_index_probe(
    spark,
    table: str,
    delta: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    allow_legacy: bool = False,
) -> DataFrame:
    """Probe a persisted simhash index with an ingestion batch: which
    corpus docs is each NEW doc a near-duplicate of (Hamming <=
    ``max_hamming`` over the portable 31-bit simhash)?

    The probe-many half of incremental dedup: the delta batch's banded
    signatures are EXPLICITLY broadcast and the index streams over
    them — the (huge) index side is never shuffled, and nothing about
    the original corpus text is re-read or re-hashed. Candidates
    collide on an intact band (pigeonhole: bands > max_hamming makes
    this lossless); the exact bit_count verify restores precision.

    Returns (delta_id, corpus_id, hamming).
    """
    from wren_engine_spark.operators import index_meta

    # the index's __meta sidecar (write_simhash_index) is authoritative
    # for the band count: probing with a different banding than the
    # build silently loses recall, the exact failure the sidecar
    # exists to prevent. The read is memoized per (session, index) —
    # it only changes on rebuild, which rewrites the sidecar's files
    # and busts the token — so a probe costs no extra Spark job after
    # the first. A missing sidecar is an ERROR for indexes this
    # package wrote; probing a pre-meta index with the caller's band
    # count requires an explicit allow_legacy=True.
    m = index_meta.table_meta_row(spark, table)
    if m is not None:
        bands = int(m.bands)
    elif not allow_legacy:
        raise ValueError(
            f"simhash_index_probe: index '{table}' has no __meta sidecar; "
            "rebuild it with write_simhash_index, or pass "
            "allow_legacy=True to probe a pre-meta index with the "
            "caller's band count"
        )
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for exact recall")
    idx = spark.table(table)
    # tombstoned ids (simhash_index_delete) anti-join out — broadcast,
    # no extra shuffle; an index with no tombstones pays nothing
    from wren_engine_spark.operators import layout

    tomb = layout.bucketed_tombstones(spark, table)
    if tomb is not None:
        idx = idx.join(
            F.broadcast(tomb.select("corpus_id")), "corpus_id", "left_anti"
        )
    q = _banded_signatures(delta, text_col, id_col, bands).select(
        F.col("corpus_id").alias("delta_id"),
        F.col("corpus_simhash").alias("__ds"),
        "band",
        "val",
    )
    return (
        idx.join(F.broadcast(q), ["band", "val"])
        .filter(F.col("corpus_id") != F.col("delta_id"))
        .select(
            "delta_id",
            "corpus_id",
            F.bit_count(F.expr("corpus_simhash ^ __ds")).cast("int").alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_index_probe_stream(
    spark,
    table: str,
    delta_stream: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    qname: str = "simhash_probe_stream",
    available_now: bool = True,
    processing_time: str | None = None,
    checkpoint: str | None = None,
    timeout_sec: int = 300,
):
    """24/7 delete-visible streaming probe of a persisted simhash
    index: each microbatch of the document stream runs the BATCH
    :func:`simhash_index_probe` inside ``foreachBatch``, so the
    tombstone set (and the ``__meta`` sidecar after a rebuild) is
    re-resolved on EVERY batch — a ``simhash_index_delete`` issued
    between microbatches is honored by the next batch without a query
    restart. This is the operator the t13 docstring's
    delete-visibility contract points long-running deployments at: a
    plain stream-static join (t13's availableNow shape) freezes the
    tombstone resolution at definition time, which is correct for
    scheduled bounded drains but not for continuous ingestion.

    Results (delta_id, corpus_id, hamming) append to the managed
    table ``qname``. With ``available_now`` (default) returns that
    table's DataFrame after the bounded drain; with
    ``processing_time`` returns the live query handle (caller stops
    it). At 100 TB the per-batch plan is the probe's own: delta
    signatures broadcast, index side scanned in place, never
    shuffled."""
    from wren_engine_spark.streaming.foreach import run_foreach_batch

    def _fn(bspark, batch_df, _batch_id):
        return simhash_index_probe(
            bspark, table, batch_df, text_col, id_col,
            max_hamming=max_hamming,
        )

    return run_foreach_batch(
        spark, delta_stream, _fn, qname,
        available_now=available_now, processing_time=processing_time,
        checkpoint=checkpoint, timeout_sec=timeout_sec,
    )


def simhash_portable_expr(text_col: str):
    """The PORTABLE 31-bit simhash as ONE per-row nested
    higher-order-function expression — no explode, no aggregation, so
    it is legal in a streaming SELECT (map-only) and costs zero
    shuffles anywhere. Bit-identical to :func:`simhash_portable`
    (pytest equivalence): same token split, same polynomial code-point
    fold, same sign-of-bit-sums — just folded in-row instead of
    explode+groupBy. Token-less documents yield signature 0 (the
    exploded form yields NO row); callers that need parity filter
    empty docs first.

    This is the streaming-ingestion kernel: a document stream can
    compute its signature and band keys entirely map-side and probe a
    static persisted index (t13) without any stateful aggregation
    before the join.
    """
    tok_hash = (
        "aggregate(transform(sequence(1, length(t)), "
        "i -> cast(ascii(substring(t, i, 1)) as bigint)), "
        f"cast(0 as bigint), (acc, c) -> pmod(acc * {_PORTABLE_BASE} + c, "
        f"{_PORTABLE_MOD}))"
    )
    # the pattern sits inside a SQL string LITERAL, which unescapes
    # backslashes before the regex engine sees them ('\x0B' would
    # corrupt the class into literal x/0/B characters — splitting
    # 'fox' on x); double them so the regex receives WS_RE verbatim
    ws_sql = WS_RE.replace("\\", "\\\\")
    counts = (
        "aggregate("
        f"transform(filter(split(lower({text_col}), '{ws_sql}'), "
        f"t -> length(t) > 0), t -> {tok_hash}), "
        f"array_repeat(cast(0 as bigint), {PORTABLE_SIMHASH_BITS}), "
        "(acc, h) -> zip_with(acc, "
        f"sequence(0, {PORTABLE_SIMHASH_BITS - 1}), "
        "(a, j) -> a + if(((h >> j) & 1) = 1, 1, -1)))"
    )
    return F.expr(
        "aggregate(zip_with("
        + counts
        + f", sequence(0, {PORTABLE_SIMHASH_BITS - 1}), "
        "(c, j) -> if(c > 0, shiftleft(cast(1 as bigint), j), "
        "cast(0 as bigint))), cast(0 as bigint), (a, b) -> a | b)"
    )


def ingest_decisions(
    spark,
    table: str,
    delta: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """The full ingestion-cycle decision for a new batch against a
    persisted corpus index: a batch doc is ACCEPTED iff it is the
    representative (min id) of its within-batch near-dup cluster AND
    no member of that cluster is a near-duplicate of the existing
    corpus. Composes :func:`simhash_index_probe` (corpus matches — the
    index streams, batch broadcasts) with
    :func:`portable_simhash_near_dup` + :func:`connected_components`
    over the batch itself (two near-dups arriving TOGETHER must not
    both be accepted — the self-dedup naive probe-only ingestion
    misses). Cluster-level semantics (one representative per
    component, component rejected wholesale on any corpus hit) are
    deterministic and parallel, unlike sequential greedy acceptance.

    At 100 TB: the corpus side is the bucketed signature index (never
    the corpus text); the batch side is ingestion-batch-sized
    throughout (its pair graph, components, and flags live on the
    batch, not the corpus).

    Returns (id, cluster_id, corpus_dup, accepted).
    """
    from pyspark.sql import Window as W

    probe = simhash_index_probe(
        spark, table, delta, text_col, id_col, max_hamming, bands
    )
    doc_dups = probe.groupBy("delta_id").agg(
        F.count(F.lit(1)).alias("__nd")
    )
    pairs = portable_simhash_near_dup(
        delta, text_col, id_col, max_hamming, bands
    )
    # The batch pair graph is INGESTION-BATCH-bounded (the probe
    # already broadcasts the batch's banded signatures, and comp is
    # broadcast below — both land on the driver either way), so the
    # component labels come from ONE collect + driver union-find
    # instead of the iterative Spark CC loop: the loop's per-round
    # lazy-checkpoint + convergence collect cost ~36 scheduler
    # round-trips per call (4 rounds x ~7 AQE stage jobs + setup) for
    # a graph whose edge list already fits in the comp broadcast.
    # Union always attaches the larger root under the smaller, so a
    # root IS the min member — identical labels to
    # connected_components (min id per component).
    parent: dict = {}

    def _find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for e in pairs.select("id_a", "id_b").collect():
        a, b = e[0], e[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = _find(a), _find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    id_type = dict(delta.dtypes)[id_col]
    comp = spark.createDataFrame(
        [(n, _find(n)) for n in parent],
        schema=f"node {id_type}, component {id_type}",
    )
    # comp and doc_dups are both bounded by the INGESTION BATCH (the
    # probe already broadcasts the batch's banded signatures by the
    # same argument), so attach them as broadcast joins: the batch ids
    # are never shuffled to meet them.
    labeled = (
        delta.select(id_col)
        .join(F.broadcast(comp), F.col(id_col) == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )
    flags = labeled.join(
        F.broadcast(doc_dups), labeled[id_col] == doc_dups["delta_id"], "left"
    ).select(
        F.col(id_col),
        "cluster_id",
        F.col("__nd").isNotNull().alias("corpus_dup"),
    )
    # cluster-level any-corpus-dup via a window over the SAME flags
    # frame instead of groupBy + self-join: the aggregate+join shape
    # planned the whole probe/CC/flags subtree TWICE (no reused
    # exchange — 496-node plan, 32 shuffles) and re-shuffled both
    # copies on cluster_id; the window computes max-over-cluster in
    # place on the single copy with ONE cluster_id exchange. Same
    # value per row: max(corpus_dup) over all rows of the cluster.
    return flags.select(
        F.col(id_col),
        "cluster_id",
        "corpus_dup",
        (
            (F.col(id_col) == F.col("cluster_id"))
            & (
                F.max(F.col("corpus_dup").cast("int")).over(
                    W.partitionBy("cluster_id")
                )
                == 0
            )
        ).alias("accepted"),
    )


def dedup_scope_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    policies: dict[str, list[str]],
) -> DataFrame:
    """Dedup-SCOPE policy comparison: how many documents survive exact
    dedup when duplicates are collapsed globally vs only within a
    grouping (per-source, per-language, ...) — the report a curation
    team reads before picking a dedup scope (global dedup removes
    legitimately re-hosted content; per-source keeps one copy per
    mirror).

    ``policies`` maps policy name -> grouping columns (empty list =
    global). A survivor is one (grouping, content-hash) combination.
    Returns one row per policy: (policy, total_docs, survivors,
    removed, removal_rate), removal_rate = removed/total as the double
    ratio of two exact integers.

    At 100 TB: each policy is one map-side-combinable groupBy over
    (scope cols, md5) — short fixed-width keys, no text movement past
    the first projection; the union of per-policy scalar rows is
    driver-trivial.
    """
    hashed = df.select(
        F.col(id_col),
        *[F.col(c) for c in sorted({c for cols in policies.values() for c in cols})],
        F.md5(F.col(text_col).cast("binary")).alias("__h"),
    )
    out = None
    for name, cols in policies.items():
        surv = (
            hashed.groupBy(*(cols + ["__h"]))
            .agg(F.lit(1))
            .agg(F.count(F.lit(1)).alias("survivors"))
        )
        tot = hashed.agg(F.count(F.lit(1)).alias("total_docs"))
        row = (
            tot.crossJoin(surv)
            .select(
                F.lit(name).alias("policy"),
                "total_docs",
                "survivors",
                (F.col("total_docs") - F.col("survivors")).alias("removed"),
                (
                    (F.col("total_docs") - F.col("survivors")).cast("double")
                    / F.col("total_docs").cast("double")
                ).alias("removal_rate"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
