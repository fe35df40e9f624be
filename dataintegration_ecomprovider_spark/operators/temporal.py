"""Temporal operators Spark lacks as built-ins: as-of join and
multi-resolution time-bucket rollup.

**As-of join** (each left row picks the most recent right row at-or-before
its timestamp, per key) is expressed as the classic UNION + running-`last`
window — one shuffle on the join key, each partition sorted once, no
per-row subquery and no range cross-join.  At 100 TB this is the only
shape that works: the naive `l JOIN r ON key AND r.ts <= l.ts` + top-1
explodes into |l|x|r| per key before pruning, while the union-window form
is O(|l|+|r|) shuffled bytes.  DuckDB's native ASOF JOIN provides an
exact second-engine oracle for it.

**Multi-resolution rollup** (hypertable-style continuous-aggregate
cascade): aggregate the finest bucket from raw data ONCE, then derive
each coarser resolution by re-aggregating the previous level's partials
— never re-scanning raw events.  Requires aggs expressed as
(partial_from_raw, merge_of_partials, finish) triples; the provided
count/sum forms cover the standard additive family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "right_",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the columns of the latest
    right row with ``right.ts <= left.ts`` for the same key (nulls when no
    such row, or when it is older than ``tolerance_seconds``).

    Right rows sharing (key, ts) must be pre-deduplicated by the caller if
    a deterministic winner matters — same contract as DuckDB ASOF JOIN.

    Plan shape: union the two inputs, window partitionBy(key)
    orderBy(ts, side) with a running ``last(right_struct, ignorenulls)``;
    right rows sort before left rows at equal ts so ties match (>= not >).
    """
    on = list(on)
    right_cols = [c for c in right.columns if c not in on]
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("_asof_payload"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns
          if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.struct(*right_cols).alias("_asof_payload"),
    ).select(*l_tagged.columns)  # align column order for union
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_asof_match", F.last("_asof_payload", ignorenulls=True).over(w))
        .filter(F.col("_asof_side") == 1)
    )
    if tolerance_seconds is not None:
        in_range = (
            F.unix_micros(F.col("_asof_ts"))
            - F.unix_micros(F.col(f"_asof_match.{right_ts}"))
        ) <= int(tolerance_seconds * 1_000_000)
        matched = matched.withColumn(
            "_asof_match", F.when(in_range, F.col("_asof_match"))
        )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_asof_match.{c}").alias(f"{right_prefix}{c}") for c in right_cols
    ]
    return matched.select(*out_cols)


# (bucket, re-agg source column) pairs for the additive agg family
def rollup_time_buckets(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    group_cols: Sequence[str] = (),
    value_col: str = "value",
    resolutions: Sequence[str] = ("minute", "hour", "day"),
) -> DataFrame:
    """Count + sum(value) per (resolution bucket, group_cols), computed as
    a cascade: finest resolution aggregates the raw events; every coarser
    level re-aggregates the finer level's partials (count -> sum of
    counts, sum -> sum of sums).  Output: resolution, bucket_start,
    group_cols, n_events, total_value.

    ``resolutions`` must go fine -> coarse (each a valid ``date_trunc``
    unit).  Raw data is scanned exactly once regardless of how many
    resolutions are requested — the continuous-aggregate property that
    matters when "raw" is 100 TB and the day level is KBs.
    """
    group_cols = list(group_cols)
    finest, *coarser = list(resolutions)
    level = events.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"), *group_cols
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(value_col).alias("_sum_raw"),
    )
    levels = [(finest, level)]
    for res in coarser:
        level = level.groupBy(
            F.date_trunc(res, F.col("bucket_start")).alias("bucket_start"),
            *group_cols,
        ).agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("_sum_raw").alias("_sum_raw"),
        )
        levels.append((res, level))
    out = None
    for res, lv in levels:
        piece = lv.select(
            F.lit(res).alias("resolution"),
            "bucket_start",
            *group_cols,
            "n_events",
            F.round(F.col("_sum_raw"), 2).alias("total_value"),
        )
        out = piece if out is None else out.unionByName(piece)
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    point_prefix: str = "p_",
) -> DataFrame:
    """Point-in-interval join WITHOUT an equi-key.

    Spark's native plan for ``p JOIN i ON p.ts BETWEEN i.start AND i.end``
    is a broadcast-nested-loop — |P|x|I| comparisons, hopeless at scale.
    This bucketizes time instead: each interval explodes into the fixed
    ``bucket_seconds`` buckets it overlaps, each point maps to its single
    bucket, and a plain equi-join on bucket + an exact containment filter
    does the rest.  Each qualifying (point, interval) pair meets in
    exactly one bucket (the point's), so no dedup pass is needed.

    Cost model: shuffle is O(|P| + |I| * avg_interval_len / bucket_len);
    pick ``bucket_seconds`` near the median interval length.  Hot buckets
    (skewed time ranges) split via AQE skew-join handling.
    """
    b = int(bucket_seconds) * 1_000_000
    i_cols = intervals.columns
    p_cols = [c for c in points.columns]
    exploded = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_col)) / b).cast("long"),
                (F.unix_micros(F.col(end_col)) / b).cast("long"),
            )
        ),
    )
    pts = points.select(
        *[F.col(c).alias(f"{point_prefix}{c}") for c in p_cols]
    ).withColumn(
        "_rj_bucket",
        (F.unix_micros(F.col(f"{point_prefix}{point_ts}")) / b).cast("long"),
    )
    ts = F.col(f"{point_prefix}{point_ts}")
    return (
        exploded.join(pts, "_rj_bucket")
        .filter((ts >= F.col(start_col)) & (ts <= F.col(end_col)))
        .drop("_rj_bucket")
    )


def gapfill(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str = "ts",
    step_seconds: int = 60,
    agg_value: Column | None = None,
    locf: bool = True,
) -> DataFrame:
    """Regularize a time series: one row per ``step_seconds`` bucket per
    group between that group's first and last observation, with
    ``n_events`` (0 on empty buckets) and ``bucket_value`` (sum of values;
    LOCF carry-forward on empty buckets when ``locf``, else null).

    Everything is per-group: the spine is a per-group ``sequence`` +
    ``explode`` (size bounded by the group's time span / step), the fill
    is a `last(ignorenulls)` window partitioned by group — no global
    window, no driver-side time range.
    """
    group_cols = list(group_cols)
    b = int(step_seconds) * 1_000_000
    val = agg_value if agg_value is not None else F.sum("value")
    bucketed = df.groupBy(
        *group_cols,
        (F.unix_micros(F.col(ts_col)) / b).cast("long").alias("_gf_bucket"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        val.alias("_gf_val"),
    )
    spine = (
        bucketed.groupBy(*group_cols)
        .agg(F.min("_gf_bucket").alias("_lo"), F.max("_gf_bucket").alias("_hi"))
        .withColumn("_gf_bucket", F.explode(F.sequence("_lo", "_hi")))
        .drop("_lo", "_hi")
    )
    joined = spine.join(bucketed, [*group_cols, "_gf_bucket"], "left")
    if locf:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy("_gf_bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = joined.withColumn(
            "bucket_value", F.last("_gf_val", ignorenulls=True).over(w)
        )
    else:
        filled = joined.withColumn("bucket_value", F.col("_gf_val"))
    return filled.select(
        *group_cols,
        F.timestamp_micros(F.col("_gf_bucket") * b).alias("bucket_start"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        "bucket_value",
    )


def time_weighted_avg(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-group time-weighted average: each observation holds its value
    until the next one (last observation gets zero weight), weights are
    exact integer microsecond gaps.  One partitioned window — the shape
    streams per group at any scale.
    """
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(ts_col, tiebreak_col)
    gap = (
        F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))
    ).cast("double")
    weighted = df.withColumn("_twa_w", F.coalesce(gap, F.lit(0.0)))
    return weighted.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.round(
            F.sum(F.col("_twa_w") * F.col(value_col)) / F.sum("_twa_w"), 6
        ).alias("twa"),
    )
