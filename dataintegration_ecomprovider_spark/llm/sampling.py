"""Deterministic sampling / corpus-mix operators for training-data pipelines
(BASELINE north star; no counterpart in the reference — net-new surface like
llm/dedup.py).

All three operators are **hash-deterministic**: membership depends only on
the row's id (via md5), never on RNG state, partitioning, or cluster size —
re-running the pipeline, retrying a task, or resizing the cluster yields the
same sample.  That property is what makes them safe at 100 TB:

- `split_assign` (train/val/test) is **map-only** — a projection over the
  scan, no shuffle at all; Catalyst pushes the surviving-column pruning into
  the parquet reader.
- `stratified_topk` (exact per-stratum cap) shuffles once on the stratum key
  and sorts only within strata.  For skewed strata at extreme scale prefer
  `rebalance_mix`, which never sorts.
- `rebalance_mix` (equalize strata) aggregates per-stratum counts (tiny,
  map-side combined), broadcasts the keep-fraction table, and filters
  map-side — two passes over the corpus but no wide shuffle of it.

md5 (not xxhash64) so every operator is exactly reproducible in the DuckDB
oracle: bucket = first 4 hex chars of md5(cast(id as string)) ∈ [0, 65536).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 65536  # 16^4: 4 hex chars of md5


def hash_bucket(col: Column) -> Column:
    """Deterministic bucket in [0, 65536) from md5 of the stringified id."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("int")


def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """Add `bucket` and `split` ('val'/'test'/'train') columns.

    Map-only: split membership is a pure function of the id, so the split is
    stable under re-runs and under corpus growth (new docs land in splits at
    the configured rates without reshuffling old ones)."""
    t_val = int(val_frac * BUCKETS)
    t_test = int((val_frac + test_frac) * BUCKETS)
    b = hash_bucket(F.col(id_col))
    return docs.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < t_val, F.lit("val"))
        .when(F.col("bucket") < t_test, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def stratified_topk(
    docs: DataFrame, strata_col: str, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Exactly k rows per stratum, chosen by md5 rank (deterministic).

    One shuffle on the stratum key; the order-by is (md5(id), id) so ties
    are impossible and the selection is independent of input partitioning."""
    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    return (
        docs.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
    )


def rebalance_mix(
    docs: DataFrame, strata_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Downsample every stratum to ≈ the smallest stratum's size (equal mix).

    keep_fraction(stratum) = min_count / count; a row survives iff its hash
    bucket < floor(65536 * keep_fraction).  The count table is tiny (one row
    per stratum) and broadcast, so the corpus itself is filtered map-side —
    the scalable alternative to sorting within skewed strata."""
    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("cnt"))
    min_cnt = counts.agg(F.min("cnt").alias("mn"))
    thresholds = counts.crossJoin(F.broadcast(min_cnt)).select(
        strata_col,
        F.floor(F.lit(float(BUCKETS)) * F.col("mn") / F.col("cnt"))
        .cast("int")
        .alias("keep_below"),
    )
    return (
        docs.join(F.broadcast(thresholds), strata_col)
        .filter(hash_bucket(F.col(id_col)) < F.col("keep_below"))
        .drop("keep_below")
    )


def temperature_mix(
    docs: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    weight_col: Column | None = None,
) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual/source-mix
    rule from mBERT/XLM-R and the Llama data recipes): stratum i is kept
    with probability proportional to ``p_i^alpha / p_i`` where ``p_i`` is
    its corpus share — ``alpha=1`` keeps the natural mix, ``alpha=0``
    equalizes every stratum (rebalance_mix's policy), values between
    up-sample the tail without flattening the head.  Kept fractions are
    normalized so the LARGEST resulting stratum keeps everything
    (pure downsampling — deterministic, no row duplication).

    `weight_col` sizes strata by a weight (e.g. token counts) instead of
    row counts — mixes are usually specified over tokens, not documents.

    Survival is the same deterministic md5-bucket rule as rebalance_mix /
    split_assign, so the sample is reproducible and oracle-checkable.
    The per-stratum threshold table is tiny and broadcast; the corpus is
    filtered map-side with zero extra shuffles."""
    w = weight_col if weight_col is not None else F.lit(1)
    counts = docs.groupBy(strata_col).agg(F.sum(w).alias("cnt"))
    # keep_i ∝ cnt_i^(alpha-1), normalized so max keep == 1
    powed = counts.select(
        strata_col, "cnt", F.pow(F.col("cnt"), F.lit(alpha - 1.0)).alias("k")
    )
    mx = powed.agg(F.max("k").alias("mk"))
    thresholds = powed.crossJoin(F.broadcast(mx)).select(
        strata_col,
        F.floor(F.lit(float(BUCKETS)) * F.col("k") / F.col("mk"))
        .cast("int")
        .alias("keep_below"),
    )
    return (
        docs.join(F.broadcast(thresholds), strata_col)
        .filter(hash_bucket(F.col(id_col)) < F.col("keep_below"))
        .drop("keep_below")
    )


def quality_filter_by_quantile(
    docs: DataFrame,
    score: Column,
    group_col: str,
    quantile: float = 0.25,
) -> DataFrame:
    """Keep rows whose quality `score` is at or above the per-group
    `quantile` cutoff — the corpus-curation step that drops the worst tail
    of each language/source instead of applying one global threshold.

    Shape: per-group exact percentile (one small aggregate, map-side
    combined), broadcast the one-row-per-group cutoff table, filter the
    corpus map-side — the corpus is never sorted or widely shuffled.  At
    extreme group cardinality swap `percentile` for `approx_percentile`
    (same plan, sketch state); the exact form is the default so the DuckDB
    oracle can check it."""
    scored = docs.withColumn("__score", score)
    cutoffs = scored.groupBy(group_col).agg(
        F.expr(f"percentile(__score, {quantile})").alias("__cutoff")
    )
    return (
        scored.join(F.broadcast(cutoffs), group_col)
        .filter(F.col("__score") >= F.col("__cutoff"))
        .select(*docs.columns)
    )


def pack_sequences(
    docs: DataFrame,
    token_col: Column,
    bin_tokens: int,
    partition_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic sequence packing: within each `partition_col` group,
    docs ordered by id accumulate into bins of ≈ `bin_tokens` tokens —
    bin_id = floor(running-total-before-this-doc / bin_tokens).  The
    training-data step that turns a document corpus into
    fixed-token-budget shards.

    Shape: one shuffle on the partition key + a running-sum window within
    it.  Parallelism = number of partition_col groups, so partition on a
    key with enough cardinality (lang, source, or a hash_bucket(id) % N
    when no natural key exists); a single global packing order would
    serialize, which is why the operator refuses to run without a
    partition column.  Deterministic: ordering is (id), never arrival
    order."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tokens = docs.withColumn("__tok", token_col)
    return (
        tokens.withColumn(
            "bin_id",
            F.floor(
                F.coalesce(F.sum("__tok").over(w), F.lit(0)) / F.lit(bin_tokens)
            ).cast("bigint"),
        )
        .withColumnRenamed("__tok", "n_tokens")
    )


def mixture_plan(
    docs: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    budget: float,
    weight_col: Column | None = None,
) -> DataFrame:
    """Token-budget mixture PLAN (the Llama/Dolma data-recipe step
    temperature_mix can't express): given target mixture `weights` per
    stratum and a total token `budget`, compute how much of each stratum
    to take — including taking a stratum MORE than once (upsampling
    epochs), which every published recipe does for small high-quality
    sources (books, wiki) while large web crawls are downsampled.

    Per stratum s with available mass ``avail_s`` (rows, or `weight_col`
    sums — recipes are specified over tokens, not documents):
    ``rate_s = budget * w_s / Σw / avail_s``; the plan materializes as
    ``epochs_s = floor(rate_s)`` full passes plus a deterministic
    fractional sample of ``rate_s - epochs_s`` (as a md5-bucket
    threshold, see apply_mixture).  Strata absent from `weights` are
    excluded (weight 0).

    Scale shape: ONE tiny aggregate over the corpus (map-side combined,
    O(strata) output) joined to the O(strata) weight table — the plan is
    metadata-sized and broadcastable; nothing else touches the corpus.
    Returns (strata_col, avail, weight, target, rate, epochs,
    keep_below)."""
    spark = docs.sparkSession
    norm = 0.0
    for v in weights.values():  # fixed iteration order = reproducible sum
        norm += float(v)
    if norm <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    w = weight_col if weight_col is not None else F.lit(1)
    avail = docs.groupBy(strata_col).agg(F.sum(w).alias("avail"))
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()],
        f"{strata_col} string, weight double",
    )
    rate = (
        F.col("weight") / F.lit(norm) * F.lit(float(budget)) / F.col("avail")
    )
    return (
        avail.join(F.broadcast(wdf), strata_col)
        .withColumn("target", F.col("weight") / F.lit(norm) * F.lit(float(budget)))
        .withColumn("rate", rate)
        .withColumn("epochs", F.floor("rate").cast("int"))
        .withColumn(
            "keep_below",
            F.floor(
                (F.col("rate") - F.col("epochs")) * F.lit(float(BUCKETS))
            ).cast("int"),
        )
    )


def apply_mixture(
    docs: DataFrame,
    plan: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize a mixture_plan: each doc in stratum s appears in
    epochs 0..epochs_s-1 unconditionally, plus in the fractional epoch
    ``epochs_s`` iff ``md5_bucket(id ':' epoch) < keep_below_s`` — so an
    upsampled stratum repeats whole (every copy tagged with a distinct
    `epoch`, the column trainers key shuffling on) and the fractional
    remainder is a fresh deterministic subsample, decorrelated from the
    full epochs and from split_assign's md5(id) rule by the ':epoch'
    suffix.

    Scale shape: broadcast the O(strata) plan, explode each row into its
    ≤ epochs_s+1 candidate copies, filter map-side — row multiplication
    happens at the scan with NO shuffle; output size is the budget, not
    corpus × max-epochs.  Hash-deterministic like every sampler here:
    re-runs, retries and resizes reproduce the same mixture, and the
    DuckDB oracle replays it exactly."""
    p = F.broadcast(plan.select(strata_col, "epochs", "keep_below"))
    frac_bucket = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col(id_col).cast("string"),
                    F.col("epoch").cast("string"),
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")
    return (
        docs.join(p, strata_col)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("epochs")))
        )
        .filter(
            (F.col("epoch") < F.col("epochs")) | (frac_bucket < F.col("keep_below"))
        )
        .drop("epochs", "keep_below")
    )
