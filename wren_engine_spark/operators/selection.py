"""Training-data *selection* operators: importance-resampling weights
(DSIR, Xie et al., NeurIPS 2023 — "Data Selection for Language Models
via Importance Resampling") over hashed n-gram features, and
bigram-LM cross-entropy quality scoring (CCNet-style, Wenzek et al.
2020).

Reference-parity note: the reference engine (wren-engine) has no data
selection surface; this extends the LLM-pipeline operator family the
brief asks for (SURVEY §2 extension block), alongside dedup/quality
scoring in operators/{dedup,text}.py.

Design for 100 TB:
  - features are HASHED bigrams (fixed B buckets), so the global
    "distribution" state is two B-row tables — broadcastable no matter
    the corpus size;
  - the per-bucket counts are plain map-side-combinable ``groupBy``
    sums (two corpus passes, each one shuffle of at most B keys after
    partial aggregation);
  - per-document weights are one explode + broadcast-join + groupBy
    over doc_id — no self-joins, no windows over hot keys.

Engine-portable determinism: token hashing uses the base-31 code-point
fold mod 2^31-1 (same construction as dedup.simhash_portable — exact
int64 arithmetic in any engine), and the per-bucket log-likelihood
ratios are QUANTIZED to integer micro-nats before the per-document sum,
so the final weights are exact integer sums (associative — independent
of partial-aggregation order; the strategy x31_label_centroids
established) and the DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wren_engine_spark.operators.textnorm import WS_RE

# base-31 polynomial hash of a string column named by `col`, mod the
# Mersenne prime 2^31-1 (see dedup._PORTABLE_TOKEN_HASH)
_PORTABLE_MOD = (1 << 31) - 1


def _portable_hash_expr(col: str) -> str:
    return (
        f"aggregate(transform(sequence(1, length({col})), "
        f"i -> ascii(substring({col}, i, 1))), "
        f"cast(0 as bigint), (acc, c) -> pmod(acc * 31 + c, {_PORTABLE_MOD}))"
    )


def _bigram_buckets(df: DataFrame, text_col: str, id_col, n_buckets: int) -> DataFrame:
    """Explode each document into hashed-bigram feature buckets.

    Returns one row per bigram OCCURRENCE: (id_col..., bucket). The
    bigram string is ``tok_i + ' ' + tok_{i+1}`` over lowercase
    whitespace tokens; bucket = portable_hash(bigram) mod n_buckets.
    """
    ids = [id_col] if isinstance(id_col, str) else list(id_col)
    toks = df.select(
        *[F.col(c) for c in ids],
        F.split(F.trim(F.lower(F.col(text_col))), WS_RE).alias("__t"),
    ).filter(F.size("__t") >= 2)
    bigrams = toks.select(
        *[F.col(c) for c in ids],
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 1), "
                "i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1)))"
            )
        ).alias("bg"),
    )
    return bigrams.select(
        *[F.col(c) for c in ids],
        F.expr(f"pmod({_portable_hash_expr('bg')}, {n_buckets})").alias("bucket"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    target_filter,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    micro: int = 1_000_000,
) -> DataFrame:
    """Per-document DSIR importance weights log p_target(x)/p_raw(x)
    under hashed-bigram bag-of-ngrams models with add-one smoothing.

    ``target_filter`` is a Column predicate selecting the target-domain
    documents (e.g. ``F.col('source') == 'wiki'``). Every document gets
    a weight; downstream resampling keeps the top-k (or Gumbel-top-k)
    by weight.

    weight(doc) = sum over bigram occurrences b of
        qlr[bucket(b)] / micro,
    where qlr = round(micro * (ln p_t[k] - ln p_r[k])) is the quantized
    per-bucket log-ratio and
        p_t[k] = (n_t[k] + 1) / (N_t + B),   p_r likewise over ALL docs.

    Returns (id_col, n_bigrams, weight) with weight DOUBLE (an exact
    integer count of micro-nats divided by ``micro`` — engine-portable).
    """
    # ONE corpus pass builds both models: each occurrence carries an
    # is-target flag, and a single map-side-combinable groupBy(bucket)
    # yields raw and target counts together (a second filtered explode
    # of the corpus would double the dominant scan+tokenize cost)
    occ = _bigram_buckets(
        docs.withColumn("__tgt", target_filter), text_col, [id_col, "__tgt"], n_buckets
    )
    counts = (
        occ.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_r"),
            F.sum(F.col("__tgt").cast("bigint")).alias("n_t"),
        )
        .cache()  # B rows; reused by the totals action and the ratio join
    )
    raw_counts = counts.select("bucket", "n_r")
    tgt_counts = counts.select("bucket", "n_t")
    tot_r, tot_t = counts.agg(F.sum("n_r"), F.sum("n_t")).first()
    tot_r, tot_t = tot_r or 0, tot_t or 0

    # dense B-row ratio table (missing buckets get the smoothed floor)
    spark = docs.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    lr = (
        buckets.join(F.broadcast(raw_counts), "bucket", "left")
        .join(F.broadcast(tgt_counts), "bucket", "left")
        .select(
            "bucket",
            F.round(
                F.lit(float(micro))
                * (
                    F.log(
                        (F.coalesce(F.col("n_t"), F.lit(0)) + F.lit(1)).cast("double")
                        / F.lit(float(tot_t + n_buckets))
                    )
                    - F.log(
                        (F.coalesce(F.col("n_r"), F.lit(0)) + F.lit(1)).cast("double")
                        / F.lit(float(tot_r + n_buckets))
                    )
                )
            )
            .cast("bigint")
            .alias("qlr"),
        )
    )

    per_doc = (
        occ.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("qlr").cast("double") / F.lit(float(micro))).alias("weight"),
        )
    )
    return per_doc


def bigram_lm_cross_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    micro: int = 1_000_000,
) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed bigram LM
    trained on the corpus itself — the CCNet-style (Wenzek et al. 2020)
    LM-quality signal: low cross-entropy = head-like fluent text, high =
    tail/noise. (CCNet uses a pretrained KenLM; training on the corpus
    keeps this self-contained and oracle-checkable — swap the count
    tables for imported KenLM counts in production.)

    ce(doc) = -(1/n) * sum over bigram occurrences (w1,w2) of
        ln( (c(w1,w2) + 1) / (c1(w1) + V) )
    where c1(w) counts occurrences of w as a bigram head and V is the
    distinct bigram-head vocabulary.

    Determinism: each bigram's log-prob is quantized to integer
    micro-nats before the per-doc sum (exact, associative — partial
    aggregation order can't change the result), then divided by
    (micro * n) exactly once.

    Scale: two map-side-combinable groupBys build the count tables
    (bigram table ~ O(vocab^2) keys worst case — for open-vocab web
    corpora use the hashed-feature variant, dsir_importance_weights);
    scoring is explode + two equi-joins + one groupBy(doc). No windows,
    no driver state beyond the V scalar.

    Returns (id_col, n_bigrams, cross_entropy).
    """
    ids = [id_col]
    toks = docs.select(
        *[F.col(c) for c in ids],
        F.split(F.trim(F.lower(F.col(text_col))), WS_RE).alias("__t"),
    ).filter(F.size("__t") >= 2)
    occ = toks.select(
        *[F.col(c) for c in ids],
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 1), "
                "i -> struct(element_at(__t, i) AS w1, element_at(__t, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select(*ids, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    c12 = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).cache()
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("__nk")
    )
    # vocab (distinct bigram heads) as a broadcast 1-row aggregate
    # instead of a driver-side count: no separate job, no barrier —
    # the whole score is one DAG (same integer arithmetic bit-for-bit)
    vocab = F.broadcast(c1.agg(F.count(F.lit(1)).alias("__vocab")))

    logp = c12.join(c1.select("w1", "c1"), "w1").crossJoin(vocab).select(
        "w1",
        "w2",
        F.round(
            F.lit(-float(micro))
            * F.log(
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("__vocab")).cast("double")
            )
        )
        .cast("bigint")
        .alias("qnll"),
    )
    return (
        occ.join(logp, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum("qnll").cast("double")
                / (F.count(F.lit(1)) * F.lit(micro)).cast("double")
            ).alias("cross_entropy"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    weight_col,
    id_col: str = "doc_id",
    rate: float = 0.3,
    seed: int = 42,
    scale: int = 1_000_000,
) -> DataFrame:
    """Deterministic weight-proportional Bernoulli sampling: document i
    is kept iff hash(seed, i) mod scale < p_i * scale, with inclusion
    probability p_i = min(rate * w_i / mean_w, 1) — so expected sample
    mass follows the weights (length-proportional token sampling,
    upweighting curated sources, temperature-flattened mixtures) and
    the SAME rows are chosen on every engine, run, and partitioning:
    the decision is pure integer arithmetic on the portable hash, no
    RNG state, no floats near a boundary (the threshold p_i*scale is
    rounded once to an integer).

    Spark's df.sample() cannot do weights and is partition-layout
    dependent; this is the reproducible 100 TB alternative (one narrow
    pass + one broadcast mean).

    Returns (id_col, weight, threshold, sampled).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # EXACT corpus totals (decimal sum + count), not a float avg — a
    # double mean depends on partial-aggregation order and would move
    # rounding boundaries between engines/runs. DECIMAL(38,6), not
    # BIGINT: fractional weights (DSIR importance weights,
    # temperature-flattened mixture rates, all < 1.0) must contribute
    # exactly, not truncate per-row to 0
    tot, cnt = docs.agg(
        F.sum(w.cast("decimal(38,6)")), F.count(F.lit(1))
    ).first()
    if not tot:
        return docs.select(
            F.col(id_col),
            w.cast("double").alias("weight"),
            F.lit(0).cast("bigint").alias("threshold"),
            F.lit(False).alias("sampled"),
        )
    # threshold = round(w * cnt * rate*scale / tot): every operand an
    # exact integer-valued double, ONE division, ONE round
    thr = F.least(
        F.lit(scale).cast("bigint"),
        F.round(
            w.cast("double") * F.lit(float(cnt)) * F.lit(float(rate * scale))
            / F.lit(float(tot))
        ).cast("bigint"),
    )
    h = F.expr(
        f"pmod(pmod(cast({id_col} as bigint) * 31 + {seed}, 2147483647)"
        f" * pmod(cast({id_col} as bigint) * 48271 + {seed + 7}, 2147483647),"
        f" {scale})"
    )
    return docs.select(
        F.col(id_col),
        w.cast("double").alias("weight"),
        thr.alias("threshold"),
        (h < thr).alias("sampled"),
    )


def leakage_safe_split(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    train_per_mille: int = 900,
    val_per_mille: int = 50,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across
    splits: documents are first clustered by exact n-gram Jaccard
    near-duplication (prefix-filtered pairs -> connected components,
    the x24 pipeline), then the SPLIT is decided per CLUSTER by pure
    integer hash arithmetic — every member of a near-dup cluster lands
    in the same split, so a test document can never have a >=threshold
    near-duplicate in train (the standard eval-contamination failure
    of naive row-hash splits).

    Deterministic and engine/layout-invariant: the cluster id is the
    component's MIN doc id and the split hash is the same portable
    integer family as weighted_sample — no RNG state, reproducible on
    any engine. Default 90/5/5 per-mille budget.

    At 100 TB this costs the dedup-clustering pipeline (bucketed, not
    all-pairs, via the skew-proof default) plus one narrow hash map —
    and it is work a training pipeline must do anyway to dedup.

    Returns (id_col, cluster_id, split IN ('train','val','test')).
    """
    from wren_engine_spark.operators import dedup

    clusters = dedup.duplicate_clusters(
        docs, text_col, id_col, n=n, threshold=threshold
    )
    # bigint BEFORE multiplying: an int-typed id column would overflow
    # int32 at cluster_id*48271 and diverge from the oracle's BIGINT
    # arithmetic (same convention as shard_assignments/weighted_sample)
    cid = F.col("cluster_id").cast("bigint")
    h = F.pmod(
        F.pmod(cid * 31 + F.lit(seed), F.lit(2147483647))
        * F.pmod(cid * 48271 + F.lit(seed + 7), F.lit(2147483647)),
        F.lit(1000),
    )
    split = (
        F.when(h < F.lit(train_per_mille), F.lit("train"))
        .when(h < F.lit(train_per_mille + val_per_mille), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return clusters.select(F.col(id_col), "cluster_id", split.alias("split"))


def shard_assignments(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Deterministic training-shard layout: every document gets a shard
    (portable integer hash — balanced in expectation, reproducible on
    any engine, never dependent on input partitioning the way
    df.randomSplit / monotonically_increasing_id are) and a stable
    position within its shard (rank by a second independent hash, doc
    id as tie-break), so a training job reading shard k in position
    order sees the SAME byte stream on every run and engine.

    At 100 TB the write path is `repartition(n_shards, shard)` +
    `sortWithinPartitions(pos)` — one hash shuffle, no global sort;
    the rank window here is per-shard (corpus/n_shards rows) and
    exists to make the contract oracle-checkable row-by-row.

    Returns (id_col, shard, pos).
    """
    from pyspark.sql import Window as W

    idc = F.col(id_col).cast("bigint")
    # reduce the product mod the Mersenne prime BEFORE the small-modulus
    # fold: the raw product of (31d+s) and (48271d+s') always has an
    # even factor, so `product % n_shards` would only ever hit even
    # shards — the odd-prime reduction destroys that parity structure
    h1 = F.pmod(
        F.pmod(
            F.pmod(idc * 31 + F.lit(seed), F.lit(2147483647))
            * F.pmod(idc * 48271 + F.lit(seed + 7), F.lit(2147483647)),
            F.lit(2147483647),
        ),
        F.lit(n_shards),
    ).cast("int")
    h2 = F.pmod(
        F.pmod(idc * 37 + F.lit(seed + 13), F.lit(2147483647))
        * F.pmod(idc * 69621 + F.lit(seed + 29), F.lit(2147483647)),
        F.lit(1_000_000_007),
    )
    w = W.partitionBy("shard").orderBy(F.col("__h2"), F.col(id_col))
    return (
        docs.select(F.col(id_col), h1.alias("shard"), h2.alias("__h2"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select(id_col, "shard", "pos")
    )


def mixing_schedule(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    keep_fraction: float = 0.5,
    n_shards: int = 8,
    seed: int = 137,
) -> DataFrame:
    """APPLY a domain-mixing policy: deterministically resample the
    corpus so every source contributes (in expectation) equally —
    ``mixing_weights``' uniform-mix multiplier turned into an actual
    training epoch — and lay the kept docs out in shards with stable
    positions (the ``shard_assignments`` layout). The step between
    "we computed mixing weights" (x34) and "the trainer reads a
    mixed, sharded epoch" (x65).

    Per-doc keep probability p_s = min(1, keep_fraction * total_docs /
    (n_sources * n_docs_s)): each source's expected contribution is
    keep_fraction * total/n_sources, so over-represented domains are
    down-sampled while small domains keep everything (p capped at 1 —
    upsampling is a repetition policy, out of scope). Selection is the
    portable integer-hash Bernoulli of ``weighted_sample`` (reduce the
    two-factor product mod the Mersenne prime BEFORE comparing — the
    raw product is always even), so the schedule is reproducible on
    any engine and any layout; the threshold is
    floor(p_s * 2147483647) computed with one double multiply-divide
    chain in a fixed order, identical in the oracle.

    At 100 TB: one combinable per-source count, a broadcast join of
    the (tiny) per-source thresholds, a narrow hash filter, and the
    shard window (per-shard, bounded by shard size — the same cost
    shape as x65). Returns (id, source, shard, pos) for KEPT docs.
    """
    from pyspark.sql import Window as W

    per = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("__ns"))
    tot = per.agg(
        F.sum("__ns").alias("__td"), F.count(F.lit(1)).alias("__s")
    )
    thr = (
        per.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.least(
                F.floor(
                    F.lit(keep_fraction)
                    * (
                        F.col("__td").cast("double")
                        / (F.col("__s") * F.col("__ns")).cast("double")
                    )
                    * F.lit(2147483647.0)
                ).cast("bigint"),
                F.lit(2147483647).cast("bigint"),
            ).alias("__thr"),
        )
    )
    idc = F.col(id_col).cast("bigint")
    m = F.lit(2147483647)
    keep_h = F.pmod(
        F.pmod(idc * 31 + F.lit(seed), m)
        * F.pmod(idc * 48271 + F.lit(seed + 7), m),
        m,
    )
    shard = F.pmod(
        F.pmod(
            F.pmod(idc * 131 + F.lit(seed + 37), m)
            * F.pmod(idc * 40692 + F.lit(seed + 41), m),
            m,
        ),
        F.lit(n_shards),
    ).cast("int")
    pos_h = F.pmod(
        F.pmod(idc * 37 + F.lit(seed + 13), m)
        * F.pmod(idc * 69621 + F.lit(seed + 29), m),
        F.lit(1_000_000_007),
    )
    kept = (
        docs.select(F.col(id_col), F.col(source_col))
        .join(F.broadcast(thr), source_col)
        .filter(keep_h < F.col("__thr"))
        .select(
            F.col(id_col),
            F.col(source_col),
            shard.alias("shard"),
            pos_h.alias("__ph"),
        )
    )
    w = W.partitionBy("shard").orderBy(F.col("__ph"), F.col(id_col))
    return kept.withColumn("pos", F.row_number().over(w).cast("bigint")).select(
        id_col, source_col, "shard", "pos"
    )


def repetition_schedule(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 211,
) -> DataFrame:
    """Domain equalization WITH repetition: every source contributes
    the same expected row count td/s (td = corpus size, s = number of
    sources) by giving each doc of source ``s_i`` w = td/(s*n_i)
    copies — floor(w) guaranteed repeats plus one more with
    probability frac(w), decided by the portable integer-hash
    Bernoulli. Under-represented domains repeat (the standard
    "N epochs of the small corpus" policy); over-represented domains
    thin naturally (w < 1 leaves floor = 0 and only the fractional
    draw). The repetition complement of ``mixing_schedule``'s capped
    down-sampling.

    Deterministic on any engine/layout: w's double chain has one fixed
    operation order, the fractional threshold is floor((w - floor(w))
    * 2^31-1), and the per-doc draw reduces the two-factor product mod
    the Mersenne prime before comparing. Copies are materialized
    in-row via sequence+explode — a narrow map whose output volume is
    exactly the schedule (bounded by max(w) per doc, never corpus^2).

    Returns (id, source, copy_idx) with copy_idx in 1..n_copies.
    """
    per = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("__ns"))
    tot = per.agg(F.sum("__ns").alias("__td"), F.count(F.lit(1)).alias("__s"))
    w = F.col("__td").cast("double") / (F.col("__s") * F.col("__ns")).cast(
        "double"
    )
    thr = (
        per.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.floor(w).cast("bigint").alias("__base"),
            F.floor((w - F.floor(w)) * F.lit(2147483647.0)).cast(
                "bigint"
            ).alias("__fthr"),
        )
    )
    idc = F.col(id_col).cast("bigint")
    m = F.lit(2147483647)
    draw = F.pmod(
        F.pmod(idc * 31 + F.lit(seed), m)
        * F.pmod(idc * 48271 + F.lit(seed + 7), m),
        m,
    )
    n_copies = (F.col("__base") + (draw < F.col("__fthr")).cast("bigint")).alias(
        "__nc"
    )
    return (
        docs.select(F.col(id_col), F.col(source_col))
        .join(F.broadcast(thr), source_col)
        .select(F.col(id_col), F.col(source_col), n_copies)
        .filter(F.col("__nc") >= 1)
        .select(
            id_col,
            source_col,
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("__nc"))).alias(
                "copy_idx"
            ),
        )
    )


def budget_trim(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """Token-budget curation: per group (language/source), keep the
    highest-quality documents until the group's token budget is spent.

    The budget is ``floor(total_group_tokens * budget_num /
    budget_den)`` — a FRACTION, so the semantics are scale-invariant.
    Documents are ranked by the deterministic x7 quality score
    (quality desc, id asc tie-break); a doc is kept iff the running
    token total THROUGH it fits the budget (greedy prefix — the
    standard "fill the mixture to N tokens" selection step).

    All budget arithmetic is exact integers; only the quality ORDER
    uses doubles, and that formula is the hash-green x7 expression on
    both engines, so the sort is identical.

    At 100 TB: one narrow projection, one map-side-combinable groupBy
    for the totals (broadcast back — group count is small), one window
    per group for the running sum. The per-group window is the
    inherent cost of a global greedy order; groups (languages/sources)
    are the unit of parallelism, so skew follows the language mix —
    acceptable because the window input is (id, tokens, quality), not
    the text. Returns (id, group, n_tokens, cum_tokens, budget_tokens,
    kept).
    """
    from pyspark.sql import Window as W

    from wren_engine_spark.operators.text import quality_score

    toks = df.select(
        F.col(id_col),
        F.col(group_col),
        F.size(F.split(F.trim(F.col(text_col)), WS_RE)).cast("bigint").alias(
            "n_tokens"
        ),
    )
    quality = quality_score(df, text_col, id_col)
    totals = toks.groupBy(group_col).agg(
        F.floor(
            F.sum("n_tokens").cast("double") * F.lit(float(budget_num))
            / F.lit(float(budget_den))
        )
        .cast("bigint")
        .alias("budget_tokens")
    )
    w = (
        W.partitionBy(group_col)
        .orderBy(F.col("quality_score").desc(), F.col(id_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = (
        toks.join(quality, id_col)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(F.broadcast(totals), group_col)
    )
    return ranked.select(
        F.col(id_col),
        F.col(group_col),
        "n_tokens",
        "cum_tokens",
        "budget_tokens",
        (F.col("cum_tokens") <= F.col("budget_tokens")).alias("kept"),
    )


def curriculum_deciles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Curriculum bucketing: within each group (language), rank
    documents by the deterministic x7 quality score (desc, id asc
    tie-break) and assign difficulty deciles with NTILE plus the
    position within the decile — the ordering a curriculum-training
    schedule consumes (easy/high-quality buckets first).

    NTILE semantics are the SQL standard ones (larger buckets first
    when the partition does not divide evenly), identical in Spark and
    DuckDB given the same total order — and the order IS total (score,
    then id).

    Returns (id, group, difficulty_decile, pos_in_decile).

    At 100 TB: the input to both windows is (id, group, score) — the
    text never moves. One shuffle on the group key for NTILE, one on
    (group, decile) for the position; groups are the parallelism unit,
    skew follows the language mix (acceptable on a 3-column frame).
    """
    from pyspark.sql import Window as W

    from wren_engine_spark.operators.text import quality_score

    q = quality_score(df, text_col, id_col)
    base = df.select(F.col(id_col), F.col(group_col)).join(q, id_col)
    w = W.partitionBy(group_col).orderBy(
        F.col("quality_score").desc(), F.col(id_col).asc()
    )
    with_dec = base.withColumn(
        "difficulty_decile", F.ntile(n_buckets).over(w)
    )
    w2 = W.partitionBy(group_col, "difficulty_decile").orderBy(
        F.col("quality_score").desc(), F.col(id_col).asc()
    )
    return with_dec.select(
        F.col(id_col),
        F.col(group_col),
        F.col("difficulty_decile").cast("int").alias("difficulty_decile"),
        F.row_number().over(w2).cast("bigint").alias("pos_in_decile"),
    )


def quality_calibration(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    keep_quantile: float = 0.5,
) -> DataFrame:
    """Cross-domain quality calibration: map each document's raw x7
    quality score to its PERCENTILE RANK within its own source, so a
    single keep-threshold means the same thing in every domain (a raw
    cutoff lets a verbose domain eat a terse domain's budget — the
    same failure x75's per-source floors guard, expressed here as a
    reusable per-document feature instead of a floor).

    ``pct_rank`` is computed manually as (rank-1)/(n-1) from RANK()
    over (score ASC) and the group count — exact integers into one
    double division, identical both engines (ties share a rank and
    therefore a percentile; a single-row group calibrates to 0.0).
    ``keep`` is pct_rank >= keep_quantile.

    At 100 TB: the window input is (id, group, score) — text never
    moves; one shuffle on the group key. Returns (id, group,
    quality_score, pct_rank, keep).
    """
    from pyspark.sql import Window as W

    from wren_engine_spark.operators.text import quality_score

    q = quality_score(df, text_col, id_col)
    base = df.select(F.col(id_col), F.col(group_col)).join(q, id_col)
    wg = W.partitionBy(group_col)
    r = base.select(
        id_col,
        group_col,
        "quality_score",
        F.rank().over(wg.orderBy(F.col("quality_score").asc())).alias("__rnk"),
        F.count(F.lit(1)).over(wg).alias("__n"),
    )
    pr = F.when(
        F.col("__n") > 1,
        (F.col("__rnk") - F.lit(1)).cast("double")
        / (F.col("__n") - F.lit(1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return r.select(
        id_col,
        group_col,
        "quality_score",
        pr.alias("pct_rank"),
        (pr >= F.lit(float(keep_quantile))).alias("keep"),
    )


_RING_M = 2147483647


def ring_positions(n_shards: int, vnodes: int = 16, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic consistent-hash ring: ``vnodes`` positions per
    shard on the [0, 2^31-1) ring, spread by a double LCG pass over a
    seeded linear mix. Pure integer arithmetic on constants — the SAME
    list is inlined as literals into both the Spark plan and the SQL
    oracle, so there is nothing engine-specific to diverge. Returned
    sorted by (position, shard) so a duplicate position (improbable
    but possible) resolves to the lowest shard id on both sides."""
    out = []
    for s in range(n_shards):
        for v in range(vnodes):
            p = (s * 48271 + v * 69621 + seed * 31 + 7919) % _RING_M
            p = (p * 48271 + 12345) % _RING_M
            p = (p * 69621 + 97) % _RING_M
            out.append((p, s))
    out.sort()
    return out


def reshard_movement(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_old: int = 8,
    n_new: int = 10,
    vnodes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Resharding cost analysis: when shard count grows n_old ->
    n_new, how many documents MOVE under (a) plain hash-mod layout
    (shard = h mod n — x65's scheme) vs (b) a consistent-hash ring
    with ``vnodes`` virtual nodes per shard? Mod-based layouts move
    ~(1 - 1/n_new) of everything (every key reassigns); a ring only
    hands off the arcs claimed by the new shards' vnodes (~the new
    capacity share) — THE reason a 100 TB corpus layout that expects
    growth uses ring placement for incremental shards, and this
    operator produces the receipt.

    The document hash is x65's portable Mersenne-reduced product; ring
    positions are seeded integer constants inlined as literals on both
    engines (``ring_positions``), and ring lookup is an in-row HOF
    (first position >= h, wrapping to the ring minimum) — no join, no
    shuffle for the assignment; the report is one map-side-combinable
    aggregate per policy. Returns (policy, n_docs, n_moved,
    moved_frac).
    """
    idc = F.col(id_col).cast("bigint")
    h = F.pmod(
        F.pmod(idc * 31 + F.lit(seed), F.lit(_RING_M))
        * F.pmod(idc * 48271 + F.lit(seed + 7), F.lit(_RING_M)),
        F.lit(_RING_M),
    )

    def ring_shard(ring: list[tuple[int, int]]) -> F.Column:
        pos = "array(" + ",".join(f"{p}L" for p, _ in ring) + ")"
        shards = "array(" + ",".join(str(s) for _, s in ring) + ")"
        # first vnode clockwise from h (wrap to ring start)
        return F.expr(
            f"element_at({shards}, cast(coalesce("
            f"array_position({pos}, array_min(filter({pos}, p -> p >= __h))), "
            f"1) as int))"
        ).cast("int")

    base = docs.select(h.alias("__h"))
    old_ring = ring_positions(n_old, vnodes, seed)
    new_ring = ring_positions(n_new, vnodes, seed)
    flags = base.select(
        (F.pmod(F.col("__h"), F.lit(n_old)) != F.pmod(F.col("__h"), F.lit(n_new)))
        .cast("long")
        .alias("__mod_moved"),
        (ring_shard(old_ring) != ring_shard(new_ring)).cast("long").alias("__ring_moved"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__mod_moved").cast("long").alias("mod_moved"),
        F.sum("__ring_moved").cast("long").alias("ring_moved"),
    )
    return agg.selectExpr(
        "stack(2, 'mod', mod_moved, 'ring', ring_moved) as (policy, n_moved)",
        "n_docs",
    ).select(
        "policy",
        "n_docs",
        "n_moved",
        # NULL on an empty corpus instead of an ANSI divide-by-zero
        F.when(
            F.col("n_docs") > 0,
            F.col("n_moved").cast("double") / F.col("n_docs").cast("double"),
        ).alias("moved_frac"),
    )
