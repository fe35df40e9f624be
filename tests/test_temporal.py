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


def test_range_join_boundaries_and_spanning(spark):
    intervals = _mk(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 13:00:00")),  # spans 4 hourly buckets
            (2, _ts("2024-01-01 10:30:00"), _ts("2024-01-01 10:40:00")),
        ],
        ["iid", "start_ts", "end_ts"],
    )
    points = _mk(
        spark,
        [
            (10, _ts("2024-01-01 10:00:00")),  # == start (inclusive)
            (11, _ts("2024-01-01 13:00:00")),  # == end (inclusive)
            (12, _ts("2024-01-01 12:15:00")),  # mid, different bucket than start
            (13, _ts("2024-01-01 09:59:59")),  # just outside
            (14, _ts("2024-01-01 10:35:00")),  # inside both intervals
        ],
        ["pid", "ts"],
    )
    out = temporal.range_join(
        points, intervals, start_col="start_ts", end_col="end_ts", bucket_seconds=3600
    )
    pairs = sorted((r["iid"], r["p_pid"]) for r in out.collect())
    assert pairs == [(1, 10), (1, 11), (1, 12), (1, 14), (2, 14)]


def test_range_join_no_nested_loop_plan(spark):
    intervals = _mk(
        spark, [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        ["iid", "start_ts", "end_ts"],
    )
    points = _mk(spark, [(10, _ts("2024-01-01 10:30:00"))], ["pid", "ts"])
    plan = (
        temporal.range_join(points, intervals, start_col="start_ts", end_col="end_ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gapfill_fills_and_carries(spark):
    ev = _mk(
        spark,
        [
            (1, "a", _ts("2024-01-01 00:00:10"), 2.0),
            (2, "a", _ts("2024-01-01 00:00:50"), 3.0),
            # minute 00:01 empty
            (3, "a", _ts("2024-01-01 00:02:05"), 7.0),
            (4, "b", _ts("2024-01-01 00:05:00"), 1.0),
        ],
        ["event_id", "event_type", "ts", "value"],
    )
    out = {
        (r["event_type"], r["bucket_start"].strftime("%H:%M")): (
            r["n_events"], r["bucket_value"],
        )
        for r in temporal.gapfill(
            ev, group_cols=["event_type"], step_seconds=60
        ).collect()
    }
    assert out[("a", "00:00")] == (2, 5.0)
    assert out[("a", "00:01")] == (0, 5.0)  # empty minute exists, value carried
    assert out[("a", "00:02")] == (1, 7.0)
    assert out[("b", "00:05")] == (1, 1.0)
    assert ("b", "00:04") not in out  # spine is per-group, not global


def test_gapfill_null_fill_mode(spark):
    ev = _mk(
        spark,
        [
            (1, "a", _ts("2024-01-01 00:00:10"), 2.0),
            (2, "a", _ts("2024-01-01 00:02:05"), 7.0),
        ],
        ["event_id", "event_type", "ts", "value"],
    )
    rows = {
        r["bucket_start"].strftime("%H:%M"): r["bucket_value"]
        for r in temporal.gapfill(
            ev, group_cols=["event_type"], step_seconds=60, locf=False
        ).collect()
    }
    assert rows["00:01"] is None


def test_scd2_collapses_noop_changes(spark):
    from dataintegration_ecomprovider_spark.operators.history import scd2_from_changelog

    log = _mk(
        spark,
        [
            (1, "u1", _ts("2024-01-01 00:00:00"), "bronze"),
            (2, "u1", _ts("2024-01-02 00:00:00"), "bronze"),  # no-op touch
            (3, "u1", _ts("2024-01-03 00:00:00"), "gold"),
            (4, "u1", _ts("2024-01-04 00:00:00"), "gold"),    # no-op touch
            (5, "u2", _ts("2024-01-01 00:00:00"), "silver"),
        ],
        ["change_id", "user", "ts", "tier"],
    )
    out = scd2_from_changelog(
        log, keys=["user"], ts_col="ts", attr_cols=["tier"], tiebreak_col="change_id"
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user"], []).append(r)
    u1 = sorted(by_user["u1"], key=lambda r: r["valid_from"])
    assert [r["tier"] for r in u1] == ["bronze", "gold"]  # touches collapsed
    assert u1[0]["valid_to"] == u1[1]["valid_from"]  # contiguous intervals
    assert (u1[0]["is_current"], u1[1]["is_current"]) == (False, True)
    assert by_user["u2"][0]["is_current"] is True


def test_time_weighted_avg_hand_computed(spark):
    ev = _mk(
        spark,
        [
            (1, "u", _ts("2024-01-01 00:00:00"), 10.0),  # held 60 s
            (2, "u", _ts("2024-01-01 00:01:00"), 20.0),  # held 180 s
            (3, "u", _ts("2024-01-01 00:04:00"), 99.0),  # last: zero weight
        ],
        ["event_id", "user_id", "ts", "value"],
    )
    row = temporal.time_weighted_avg(ev, group_cols=["user_id"]).collect()[0]
    # (60*10 + 180*20) / 240 = 17.5 — the trailing 99 never counts
    assert row["n_obs"] == 3 and row["twa"] == 17.5
