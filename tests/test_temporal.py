"""As-of join + multi-resolution rollup (operators/temporal.py).

Covers the semantics a DuckDB-oracle query can't isolate: equal-ts ties
match (>= semantics), tolerance windows null out stale matches, unmatched
left rows survive with null payloads, and the rollup cascade equals a
direct from-raw aggregation at every resolution.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.operators import temporal


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_join_basic_and_ties(spark):
    trades = _mk(
        spark,
        [
            (1, "A", _ts("2024-01-01 10:00:05")),
            (2, "A", _ts("2024-01-01 10:00:10")),  # ties quote at same ts
            (3, "B", _ts("2024-01-01 09:00:00")),  # before any quote
            (4, "C", _ts("2024-01-01 12:00:00")),  # key with no quotes
        ],
        ["trade_id", "sym", "ts"],
    )
    quotes = _mk(
        spark,
        [
            ("A", _ts("2024-01-01 10:00:00"), 100.0),
            ("A", _ts("2024-01-01 10:00:10"), 101.0),
            ("B", _ts("2024-01-01 09:30:00"), 50.0),
        ],
        ["sym", "ts", "px"],
    )
    out = {
        r["trade_id"]: r
        for r in temporal.asof_join(
            trades, quotes, ["sym"], right_prefix="q_"
        ).collect()
    }
    assert out[1]["q_px"] == 100.0
    assert out[2]["q_px"] == 101.0  # equal-ts quote matches (>=, not >)
    assert out[3]["q_px"] is None  # no quote at-or-before
    assert out[4]["q_px"] is None  # key absent from right
    assert len(out) == 4  # left rows preserved 1:1


def test_asof_join_tolerance(spark):
    left = _mk(spark, [(1, "A", _ts("2024-01-01 10:00:00"))], ["id", "k", "ts"])
    right = _mk(
        spark, [("A", _ts("2024-01-01 09:00:00"), 7.0)], ["k", "ts", "v"]
    )
    loose = temporal.asof_join(
        left, right, ["k"], tolerance_seconds=7200
    ).collect()[0]
    tight = temporal.asof_join(
        left, right, ["k"], tolerance_seconds=60
    ).collect()[0]
    assert loose["right_v"] == 7.0
    assert tight["right_v"] is None  # match exists but is too old


def test_asof_join_single_shuffle_plan(spark):
    left = _mk(spark, [(1, "A", _ts("2024-01-01 10:00:00"))], ["id", "k", "ts"])
    right = _mk(
        spark, [("A", _ts("2024-01-01 09:00:00"), 7.0)], ["k", "ts", "v"]
    )
    plan = temporal.asof_join(left, right, ["k"])._jdf.queryExecution().executedPlan().toString()
    # union + window form: no join node, no cartesian, exactly one exchange
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_rollup_cascade_matches_direct(spark):
    rows = [
        (i, "t" + str(i % 2), _ts("2024-03-01 00:00:00") + dt.timedelta(seconds=37 * i), float(i))
        for i in range(500)
    ]
    ev = _mk(spark, rows, ["event_id", "event_type", "ts", "value"])
    got = temporal.rollup_time_buckets(
        ev, group_cols=["event_type"], resolutions=("minute", "hour", "day")
    )
    for res in ("minute", "hour", "day"):
        direct = ev.groupBy(
            F.date_trunc(res, "ts").alias("bucket_start"), "event_type"
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        lhs = {
            (r["bucket_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in got.filter(F.col("resolution") == res).collect()
        }
        rhs = {
            (r["bucket_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in direct.collect()
        }
        assert lhs == rhs, f"cascade != direct at {res}"


def test_rollup_scans_raw_once(spark):
    from dataintegration_ecomprovider_spark.catalog import Catalog
    from tests.conftest import SF_DIR

    ev = Catalog(spark, SF_DIR).table("events")
    out = temporal.rollup_time_buckets(
        ev, group_cols=["event_type"], resolutions=("minute", "hour", "day")
    )
    out.collect()  # AQE finalizes the plan at execution
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the hour branch must reuse the minute exchange and the day branch the
    # hour exchange — i.e. coarser levels re-aggregate partials instead of
    # re-scanning raw events (the continuous-aggregate property)
    assert plan.count("ReusedExchange") >= 2
