"""publish.metadata_aggregate / aggregate_table — metadata-only COUNT /
MIN / MAX / NULL_COUNT with an exactness boundary: every case the sidecar
cannot answer EXACTLY must return None (and aggregate_table must fall back
to a scan that gives the same answer shape)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.plans import publish


def _store(spark, tmp_path, df, **kw):
    root = str(tmp_path / "store")
    publish.publish_tables(spark, {"t": df}, root, **kw)
    return root


def test_count_min_max_nulls_exact(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10.5, "a"), (2, -3.25, None), (3, 99.0, "zz")],
        "k long, x double, s string",
    ).repartition(2)
    root = _store(spark, tmp_path, df, table_keys={"t": ["k"]})
    got = publish.metadata_aggregate(
        root, "t",
        [("count",), ("min", "x"), ("max", "x"), ("min", "s"),
         ("max", "s"), ("null_count", "s"), ("null_count", "x")],
    )
    assert got == {
        "count": 3, "min_x": -3.25, "max_x": 99.0,
        "min_s": "a", "max_s": "zz", "null_count_s": 1, "null_count_x": 0,
    }


def test_all_null_file_is_skipped_for_min_max(spark, tmp_path):
    # partition 1 holds only NULL x: no min/max there, but nulls == rows
    # so the file is provably value-free and min/max stay answerable
    a = spark.createDataFrame([(1, None), (2, None)], "k long, x double")
    b = spark.createDataFrame([(3, 5.0)], "k long, x double")
    root = _store(
        spark, tmp_path, a.coalesce(1).unionByName(b.coalesce(1))
    )
    got = publish.metadata_aggregate(
        root, "t", [("min", "x"), ("max", "x"), ("null_count", "x")]
    )
    assert got == {"min_x": 5.0, "max_x": 5.0, "null_count_x": 2}


def test_string_at_truncation_cap_refuses(spark, tmp_path):
    long_s = "m" * 40  # recorded min/max are truncated bounds, not values
    df = spark.createDataFrame([(1, long_s), (2, "zz")], "k long, s string")
    root = _store(spark, tmp_path, df.coalesce(1))
    assert publish.metadata_aggregate(root, "t", [("min", "s")]) is None
    # but count / null_count still answer
    assert publish.metadata_aggregate(
        root, "t", [("count",), ("null_count", "s")]
    ) == {"count": 2, "null_count_s": 0}
    # and the fallback scans out the true values
    got, src = publish.aggregate_table(
        spark, root, "t", [("min", "s"), ("max", "s")]
    )
    assert src == "scan" and got == {"min_s": long_s, "max_s": "zz"}


def test_partition_column_min_max_refuses(spark, tmp_path):
    # numeric partition values materialize as path STRINGS ("10" < "9"):
    # min/max must refuse; count still answers
    df = spark.createDataFrame(
        [(9, "a"), (10, "b"), (2, "c")], "p long, v string"
    )
    root = _store(spark, tmp_path, df, partition_by={"t": ["p"]})
    assert publish.metadata_aggregate(root, "t", [("min", "p")]) is None
    assert publish.metadata_aggregate(root, "t", [("count",)]) == {"count": 3}
    got, src = publish.aggregate_table(spark, root, "t", [("min", "p")])
    assert src == "scan" and got == {"min_p": 2}


def test_mor_delta_falls_back_until_compact(spark, tmp_path):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, x double")
    root = _store(spark, tmp_path, df, table_keys={"t": ["k"]})
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame([(2, 20.0), (3, 3.0)], "k long, x double"),
    )
    aggs = [("count",), ("min", "x"), ("max", "x")]
    assert publish.metadata_aggregate(root, "t", aggs) is None
    got_scan, src = publish.aggregate_table(spark, root, "t", aggs)
    assert src == "scan"
    publish.compact(spark, root, "t")
    got_md, src = publish.aggregate_table(spark, root, "t", aggs)
    assert src == "metadata"
    assert got_md == got_scan == {"count": 3, "min_x": 1.0, "max_x": 20.0}


def test_untracked_column_and_no_stats_refuse(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.0)], "k long, x double")
    root = _store(spark, tmp_path, df, stats_columns={"t": ["k"]})
    assert publish.metadata_aggregate(root, "t", [("min", "x")]) is None
    root2 = str(tmp_path / "nostats")
    publish.publish_tables(spark, {"t": df}, root2, collect_stats=False)
    assert publish.metadata_aggregate(root2, "t", [("count",)]) is None


def test_renamed_and_dropped_columns(spark, tmp_path):
    df = spark.createDataFrame([(1, 5.0, "x")], "k long, a double, b string")
    root = _store(spark, tmp_path, df, table_keys={"t": ["k"]})
    publish.rename_column(spark, root, "t", "a", "a2")
    got = publish.metadata_aggregate(root, "t", [("min", "a2")])
    assert got == {"min_a2": 5.0}
    publish.drop_column(spark, root, "t", "b")
    with pytest.raises(KeyError, match="dropped"):
        publish.metadata_aggregate(root, "t", [("min", "b")])


def test_timestamp_iso_agrees_between_sources(spark, tmp_path):
    rows = [
        (1, datetime.datetime(2024, 3, 1, 12, 30, 45)),
        (2, datetime.datetime(2023, 1, 2, 3, 4, 5)),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    root = _store(spark, tmp_path, df, table_keys={"t": ["k"]})
    aggs = [("min", "ts"), ("max", "ts")]
    md = publish.metadata_aggregate(root, "t", aggs)
    assert md == {
        "min_ts": "2023-01-02T03:04:05", "max_ts": "2024-03-01T12:30:45",
    }
    # force the scan path (MoR delta) and compare representations
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame(
            [(3, datetime.datetime(2025, 6, 7, 8, 9, 10))],
            "k long, ts timestamp",
        ),
    )
    got, src = publish.aggregate_table(spark, root, "t", aggs)
    assert src == "scan"
    assert got == {
        "min_ts": "2023-01-02T03:04:05", "max_ts": "2025-06-07T08:09:10",
    }


def test_timestamp_micros_fraction_round_trips(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 1, 12, 30, 45, 500000))],
        "k long, ts timestamp",
    )
    root = _store(spark, tmp_path, df, table_keys={"t": ["k"]})
    md = publish.metadata_aggregate(root, "t", [("min", "ts")])
    assert md == {"min_ts": "2024-03-01T12:30:45.500000"}
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame(
            [(2, datetime.datetime(2025, 1, 1, 0, 0, 0, 7))],
            "k long, ts timestamp",
        ),
    )
    got, src = publish.aggregate_table(
        spark, root, "t", [("min", "ts"), ("max", "ts")]
    )
    assert src == "scan" and got == {
        "min_ts": "2024-03-01T12:30:45.500000",
        "max_ts": "2025-01-01T00:00:00.000007",
    }


def test_timestamp_boundary_equality_prune_keeps_file(spark, tmp_path):
    """Regression: tz-aware stat ISO ("...+00:00") vs naive predicate ISO
    would lexicographically mis-order and falsely SKIP the file holding
    the exact boundary value.  Unreachable while Spark wrote INT96
    (no stats at all); reachable since TIMESTAMP_MICROS."""
    ts = datetime.datetime(2024, 3, 1, 12, 30, 45)
    df = spark.createDataFrame([(1, ts)], "k long, ts timestamp")
    root = _store(spark, tmp_path, df.coalesce(1), table_keys={"t": ["k"]})
    kept, total = publish.prune_files(root, "t", [("ts", "=", ts)])
    assert total == 1 and len(kept) == 1
    # and the scan returns the row
    assert publish.scan_table(
        spark, root, "t", [("ts", "=", ts)]
    ).count() == 1
    # a genuinely out-of-range probe still skips
    kept, _ = publish.prune_files(
        root, "t", [("ts", ">", datetime.datetime(2030, 1, 1))]
    )
    assert kept == []


def test_version_time_travel(spark, tmp_path):
    df1 = spark.createDataFrame([(1, 1.0)], "k long, x double")
    root = _store(spark, tmp_path, df1, table_keys={"t": ["k"]})
    publish.merge_into(
        spark, root, "t", spark.createDataFrame([(2, 9.0)], "k long, x double")
    )
    assert publish.metadata_aggregate(
        root, "t", [("count",), ("max", "x")], version=1
    ) == {"count": 1, "max_x": 1.0}
    assert publish.metadata_aggregate(
        root, "t", [("count",), ("max", "x")]
    ) == {"count": 2, "max_x": 9.0}


def test_where_scoped_count_on_partitioned_table(spark, tmp_path):
    """COUNT(*) WHERE p = <partition value> is pure metadata: every kept
    file must-matches the predicate (partition min == max == value)."""
    df = spark.createDataFrame(
        [(1, 10.0, "x"), (1, 20.0, "y"), (2, 30.0, "z")],
        "p long, v double, s string",
    )
    root = _store(spark, tmp_path, df, partition_by={"t": ["p"]})
    got = publish.metadata_aggregate(
        root, "t", [("count",), ("min", "v"), ("max", "v")],
        where=[("p", "=", 1)],
    )
    assert got == {"count": 2, "min_v": 10.0, "max_v": 20.0}
    # a predicate matching nothing answers 0, not None
    assert publish.metadata_aggregate(
        root, "t", [("count",)], where=[("p", "=", 99)]
    ) == {"count": 0}


def test_where_straddling_files_falls_back(spark, tmp_path):
    # one file holds v in [1, 10]: "v > 5" neither must- nor cannot-match
    df = spark.createDataFrame(
        [(1, 1.0), (2, 10.0)], "k long, v double"
    ).coalesce(1)
    root = _store(spark, tmp_path, df, table_keys={"t": ["k"]})
    assert publish.metadata_aggregate(
        root, "t", [("count",)], where=[("v", ">", 5.0)]
    ) is None
    got, src = publish.aggregate_table(
        spark, root, "t", [("count",), ("max", "v")], where=[("v", ">", 5.0)]
    )
    assert src == "scan" and got == {"count": 1, "max_v": 10.0}
    # whereas a predicate every row satisfies stays metadata-only
    got, src = publish.aggregate_table(
        spark, root, "t", [("count",)], where=[("v", ">=", 1.0)]
    )
    assert src == "metadata" and got == {"count": 2}


def test_zero_spark_jobs_on_metadata_path(spark, tmp_path):
    """The headline claim: the metadata path never touches the cluster."""
    df = spark.createDataFrame([(1, 2.0), (2, 4.0)], "k long, x double")
    root = _store(spark, tmp_path, df, table_keys={"t": ["k"]})
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    got, src = publish.aggregate_table(
        spark, root, "t", [("count",), ("min", "x"), ("max", "x")]
    )
    assert src == "metadata" and got["count"] == 2
    assert tracker.getJobIdsForGroup(None) == before


def test_profile_table_reports_without_refusing(spark, tmp_path):
    long_s = "m" * 40
    df = spark.createDataFrame(
        [(1, 2.5, long_s), (2, None, "zz"), (3, 9.0, None)],
        "k long, x double, s string",
    )
    root = _store(spark, tmp_path, df.coalesce(1), table_keys={"t": ["k"]})
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame([(4, 1.0, "a")], "k long, x double, s string"),
    )
    p = publish.profile_table(root, "t")
    assert p["keys"] == ["k"] and p["files"]["rows"] == 3
    assert p["deltas_pending"] == {"count": 1, "rows": 1}
    assert p["columns"]["k"] == {
        "min": 1, "max": 3, "null_fraction": 0.0, "exact": True,
    }
    assert p["columns"]["x"]["null_fraction"] == round(1 / 3, 6)
    assert p["columns"]["x"]["exact"] is True
    s_col = p["columns"]["s"]
    assert s_col["exact"] is False  # truncated bounds, flagged not refused
    assert s_col["min"] == long_s[:32] and s_col["null_fraction"] == round(1 / 3, 6)
