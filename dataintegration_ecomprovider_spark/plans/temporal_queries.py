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


QUERIES = {
    "asof_click_to_view": QueryDef(q_asof_click_to_view, ORACLE_ASOF),
    "rollup_time_cascade": QueryDef(q_rollup_time_cascade, ORACLE_ROLLUP),
}
