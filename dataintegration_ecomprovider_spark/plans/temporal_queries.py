"""Temporal operator queries: as-of join and multi-resolution rollup over
the `events` table (operators/temporal.py).

The as-of oracle uses DuckDB's native ASOF JOIN — an independent
implementation of the same semantics, making this the strongest kind of
cross-engine check.  Timestamps are output as formatted strings (session
is pinned UTC) and the match gap as exact integer microseconds so no
float comparison is involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.operators import temporal
from dataintegration_ecomprovider_spark.plans.registry import QueryDef

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def q_asof_click_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click matched to the same user's most recent view at-or-before
    it (operators/temporal.py::asof_join — union + running-last window,
    one shuffle on user_id)."""
    ev = Catalog(spark, sf_dir).table("events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")  # deterministic winner on (key, ts) ties
        .agg(F.max("event_id").alias("event_id"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = temporal.asof_join(clicks, views, ["user_id"], right_prefix="view_")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("click_ts"),
        F.col("view_event_id"),
        F.date_format("view_ts", _TS_FMT_SPARK).alias("view_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("view_ts")))
        .cast("bigint")
        .alias("gap_micros"),
    )


ORACLE_ASOF = f"""
WITH views AS (
  SELECT user_id, ts, MAX(event_id) AS event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
       v.event_id AS view_event_id,
       strftime(v.ts, '{_TS_FMT_DUCK}') AS view_ts,
       CAST(date_diff('microsecond', v.ts, c.ts) AS BIGINT) AS gap_micros
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


def q_rollup_time_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute/hour/day rollup per event type via the continuous-aggregate
    cascade (operators/temporal.py::rollup_time_buckets — raw events
    scanned once; coarser levels re-aggregate finer partials)."""
    ev = Catalog(spark, sf_dir).table("events")
    out = temporal.rollup_time_buckets(
        ev, group_cols=["event_type"], resolutions=("minute", "hour", "day")
    )
    return out.select(
        "resolution",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "event_type",
        "n_events",
        "total_value",
    )


ORACLE_ROLLUP = """
WITH minute AS (
  SELECT date_trunc('minute', ts) AS b, event_type,
         COUNT(*) AS n, SUM(value) AS s
  FROM events GROUP BY 1, 2
),
hour AS (
  SELECT date_trunc('hour', b) AS b, event_type, SUM(n) AS n, SUM(s) AS s
  FROM minute GROUP BY 1, 2
),
day AS (
  SELECT date_trunc('day', b) AS b, event_type, SUM(n) AS n, SUM(s) AS s
  FROM hour GROUP BY 1, 2
)
SELECT 'minute' AS resolution, strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
       event_type, CAST(n AS BIGINT) AS n_events, ROUND(s, 2) AS total_value
FROM minute
UNION ALL
SELECT 'hour', strftime(b, '%Y-%m-%d %H:%M:%S'), event_type,
       CAST(n AS BIGINT), ROUND(s, 2) FROM hour
UNION ALL
SELECT 'day', strftime(b, '%Y-%m-%d %H:%M:%S'), event_type,
       CAST(n AS BIGINT), ROUND(s, 2) FROM day
"""


def q_range_join_signup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure (no equi-key) point-in-interval join: every click falling in a
    30-minute window opened by any signup (operators/temporal.py::range_join
    — time-bucketized equi-join + exact containment filter, NOT the
    broadcast-nested-loop Spark would plan for a raw BETWEEN join)."""
    ev = Catalog(spark, sf_dir).table("events")
    intervals = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "ts")
    out = temporal.range_join(
        clicks,
        intervals,
        start_col="start_ts",
        end_col="end_ts",
        bucket_seconds=1800,
    )
    return out.select(
        "interval_id",
        F.col("p_event_id").alias("point_id"),
        (
            F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("start_ts"))
        ).cast("bigint").alias("offset_micros"),
    )


ORACLE_RANGE_JOIN = """
WITH iv AS (
  SELECT event_id AS interval_id, ts AS start_ts,
         ts + INTERVAL 30 MINUTE AS end_ts
  FROM events WHERE event_type = 'signup'
),
pt AS (SELECT event_id AS point_id, ts FROM events WHERE event_type = 'click')
SELECT iv.interval_id, pt.point_id,
       CAST(date_diff('microsecond', iv.start_ts, pt.ts) AS BIGINT)
         AS offset_micros
FROM iv JOIN pt ON pt.ts >= iv.start_ts AND pt.ts <= iv.end_ts
"""


def q_gapfill_minute_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type minute series over the first three days, empty
    minutes filled (count 0, value carried forward) — operators/
    temporal.py::gapfill: per-group sequence spine + partitioned
    last(ignorenulls), no global window or driver-side time range."""
    ev = (
        Catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
    )
    out = temporal.gapfill(
        ev,
        group_cols=["event_type"],
        step_seconds=60,
        agg_value=F.round(F.sum("value"), 2),
    )
    return out.select(
        "event_type",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n_events",
        "bucket_value",
    )


ORACLE_GAPFILL = """
WITH b AS (
  SELECT event_type, epoch_us(ts) // 60000000 AS bkt,
         COUNT(*) AS n, ROUND(SUM(value), 2) AS v
  FROM events WHERE ts < TIMESTAMP '2024-01-04'
  GROUP BY 1, 2
),
sp AS (
  SELECT event_type, unnest(range(lo, hi + 1)) AS bkt
  FROM (SELECT event_type, MIN(bkt) AS lo, MAX(bkt) AS hi FROM b GROUP BY 1)
),
j AS (
  SELECT sp.event_type, sp.bkt, b.n, b.v
  FROM sp LEFT JOIN b USING (event_type, bkt)
)
SELECT event_type,
       strftime(make_timestamp(bkt * 60000000), '%Y-%m-%d %H:%M:%S')
         AS bucket_start,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bkt
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bucket_value
FROM j
"""


def q_twa_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average event value, each observation held
    until the next (operators/temporal.py::time_weighted_avg — one
    partitioned lead window, exact integer-microsecond weights)."""
    ev = Catalog(spark, sf_dir).table("events")
    return temporal.time_weighted_avg(ev, group_cols=["user_id"])


ORACLE_TWA = """
WITH t AS (
  SELECT user_id, value,
         CAST(COALESCE(date_diff('microsecond', ts,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)), 0)
           AS DOUBLE) AS w
  FROM events
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
       CASE WHEN SUM(w) > 0
            THEN ROUND(SUM(w * value) / SUM(w), 6) END AS twa
FROM t GROUP BY user_id
"""


def q_scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 versions of each user's current event type: consecutive
    same-type events collapse into one validity interval
    (operators/history.py::scd2_from_changelog — lag-collapse + lead-close
    over one shuffle on user_id)."""
    from dataintegration_ecomprovider_spark.operators.history import (
        scd2_from_changelog,
    )

    ev = Catalog(spark, sf_dir).table("events")
    out = scd2_from_changelog(
        ev,
        keys=["user_id"],
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_col="event_id",
    )
    return out.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", _TS_FMT_SPARK).alias("valid_from"),
        F.date_format("valid_to", _TS_FMT_SPARK).alias("valid_to"),
        "is_current",
    )


ORACLE_SCD2 = f"""
WITH c AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
),
v AS (
  SELECT user_id, event_type, ts, event_id
  FROM c WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type,
       strftime(ts, '{_TS_FMT_DUCK}') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '{_TS_FMT_DUCK}') AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM v
"""


QUERIES = {
    "asof_click_to_view": QueryDef(q_asof_click_to_view, ORACLE_ASOF),
    "rollup_time_cascade": QueryDef(q_rollup_time_cascade, ORACLE_ROLLUP),
    "range_join_signup_windows": QueryDef(
        q_range_join_signup_windows, ORACLE_RANGE_JOIN
    ),
    "gapfill_minute_locf": QueryDef(q_gapfill_minute_locf, ORACLE_GAPFILL),
    "twa_user_values": QueryDef(q_twa_user_values, ORACLE_TWA),
    "scd2_event_type_history": QueryDef(
        q_scd2_event_type_history, ORACLE_SCD2
    ),
}
