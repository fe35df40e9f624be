"""Round-4 store layout: file-level min/max statistics + data skipping
(publish.write_stats_sidecar / scan_table) and hive-partitioned publish
(partition_by) with partition pruning.

The reference has no versioned store (it re-runs jobs against a mutable
database); these are the operations a 100 TB parquet-backed deployment
needs so selective reads touch the dozen files that matter instead of
listing a million (the Delta/Iceberg data-skipping role)."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.plans import publish

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "store")


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_publish_records_stats_and_sidecar(spark, store):
    df = _orders(spark).repartitionByRange(4, "o_custkey")
    m = publish.publish_tables(spark, {"orders": df}, store)
    entry = m["tables"]["orders"]
    assert entry["rows"] == df.count()
    assert entry["num_files"] == 4
    assert entry["bytes"] > 0
    sidecar = json.load(open(os.path.join(entry["path"], publish.STATS_FILE)))
    assert len(sidecar["files"]) == 4
    for e in sidecar["files"]:
        mn, mx, nulls = e["stats"]["o_custkey"]
        assert mn is not None and mn <= mx and nulls == 0
    stats = publish.table_stats(store, "orders")
    assert stats == {"rows": entry["rows"], "bytes": entry["bytes"], "num_files": 4}


def test_scan_table_prunes_files_and_matches_full_read(spark, store):
    df = _orders(spark).repartitionByRange(8, "o_custkey")
    publish.publish_tables(spark, {"orders": df}, store)
    lo, hi = 10, 60
    where = [("o_custkey", ">", lo), ("o_custkey", "<=", hi)]
    kept, total = publish.prune_files(store, "orders", where)
    assert total == 8 and 0 < len(kept) < total  # skipping actually happened
    scanned = publish.scan_table(spark, store, "orders", where)
    assert len(scanned.inputFiles()) == len(kept)
    full = publish.read_table(spark, store, "orders").filter(
        (F.col("o_custkey") > lo) & (F.col("o_custkey") <= hi)
    )
    assert _rows(scanned) == _rows(full)


def test_scan_table_timestamp_and_in_and_null_predicates(spark, store):
    df = _orders(spark).withColumn(
        "maybe", F.when(F.col("o_orderkey") % 2 == 0, F.col("o_orderstatus"))
    ).repartitionByRange(4, "o_orderdate")
    publish.publish_tables(spark, {"orders": df}, store)
    # temporal range predicate against ISO-serialized timestamp stats
    where = [("o_orderdate", ">=", "1999-01-01")]
    kept, total = publish.prune_files(store, "orders", where)
    assert len(kept) < total
    scanned = publish.scan_table(spark, store, "orders", where)
    full = publish.read_table(spark, store, "orders").filter(
        F.col("o_orderdate") >= "1999-01-01"
    )
    assert _rows(scanned) == _rows(full)
    # IN + is_not_null run through the same residual filter
    where2 = [("o_orderstatus", "in", ["F", "O"]), ("maybe", "is_not_null")]
    scanned2 = publish.scan_table(spark, store, "orders", where2)
    full2 = publish.read_table(spark, store, "orders").filter(
        F.col("o_orderstatus").isin("F", "O") & F.col("maybe").isNotNull()
    )
    assert _rows(scanned2) == _rows(full2)


def test_scan_table_impossible_predicate_is_empty_with_schema(spark, store):
    df = _orders(spark).repartitionByRange(4, "o_custkey")
    publish.publish_tables(spark, {"orders": df}, store)
    out = publish.scan_table(spark, store, "orders", [("o_custkey", "<", -1)])
    assert out.count() == 0
    assert out.columns == publish.read_table(spark, store, "orders").columns


def test_scan_without_stats_falls_back_to_filter(spark, store):
    df = _orders(spark)
    publish.publish_tables(spark, {"orders": df}, store, collect_stats=False)
    assert publish.table_stats(store, "orders") is None
    out = publish.scan_table(spark, store, "orders", [("o_custkey", "<=", 50)])
    full = publish.read_table(spark, store, "orders").filter(F.col("o_custkey") <= 50)
    assert _rows(out) == _rows(full)


def test_partitioned_publish_prunes_partitions(spark, store):
    df = _orders(spark).withColumn("o_year", F.year("o_orderdate"))
    publish.publish_tables(
        spark, {"orders": df}, store, partition_by={"orders": ["o_year"]}
    )
    r = publish.read_table(spark, store, "orders")
    years = [row[0] for row in r.select("o_year").distinct().collect()]
    assert len(years) > 1
    target = years[0]
    flt = r.filter(F.col("o_year") == target)
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan
    assert flt.count() == df.filter(F.col("o_year") == target).count()
    # scan_table prunes on the partition column from path-derived stats
    kept, total = publish.prune_files(store, "orders", [("o_year", "=", target)])
    assert len(kept) < total
    scanned = publish.scan_table(spark, store, "orders", [("o_year", "=", target)])
    assert _rows(scanned.drop("o_year")) == _rows(flt.drop("o_year"))


def test_partition_spec_carries_forward_and_compact_preserves_it(spark, store):
    df = _orders(spark).withColumn("o_year", F.year("o_orderdate"))
    publish.publish_tables(
        spark, {"orders": df}, store, partition_by={"orders": ["o_year"]},
        table_keys={"orders": ["o_orderkey"]},
    )
    # second publish WITHOUT partition_by keeps the layout (like keys)
    publish.publish_tables(spark, {"orders": df.limit(500)}, store)
    entry = publish.current_manifest(store)["tables"]["orders"]
    assert entry["partition_by"] == ["o_year"]
    assert any("o_year=" in p for p in publish._data_files(entry["path"]))
    # merge_into republishes partitioned too (carry-forward through publish)
    extra = df.limit(10).withColumn("o_totalprice", F.lit(1.0))
    publish.merge_into(spark, store, "orders", extra)
    entry = publish.current_manifest(store)["tables"]["orders"]
    assert entry["partition_by"] == ["o_year"]
    before = _rows(publish.read_table(spark, store, "orders"))
    res = publish.compact(spark, store, "orders")
    entry = publish.current_manifest(store)["tables"]["orders"]
    assert entry["partition_by"] == ["o_year"]
    assert res["files_after"] <= res["files_before"]
    assert _rows(publish.read_table(spark, store, "orders")) == before


def test_partition_and_bucket_are_mutually_exclusive(spark, store):
    df = _orders(spark)
    with pytest.raises(ValueError, match="mutually exclusive"):
        publish.publish_tables(
            spark, {"orders": df}, store,
            partition_by={"orders": ["o_orderstatus"]},
            bucket_keys={"orders": ["o_orderkey"]},
        )


def test_compact_recomputes_stats(spark, store):
    df = _orders(spark).repartition(16)
    publish.publish_tables(spark, {"orders": df}, store)
    assert publish.table_stats(store, "orders")["num_files"] == 16
    res = publish.compact(spark, store, "orders", target_files=2)
    assert res["files_after"] == 2
    stats = publish.table_stats(store, "orders")
    assert stats["num_files"] == 2 and stats["rows"] == df.count()
    # skipping still works on the compacted layout
    out = publish.scan_table(spark, store, "orders", [("o_custkey", "<=", 50)])
    full = publish.read_table(spark, store, "orders").filter(F.col("o_custkey") <= 50)
    assert _rows(out) == _rows(full)
