"""store_changes streaming source: tailing the versioned store's CDC feed
as a Structured Streaming source (Spark 4 Python DataSource API)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.plans import publish
from dataintegration_ecomprovider_spark.streaming.store_source import (
    StoreChangesDataSource,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def store(tmp_path, spark):
    root = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, name string, val double",
    )
    publish.publish_tables(spark, {"t": v1}, root, table_keys={"t": ["id"]})
    v2 = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id bigint, name string, val double",
    )
    publish.publish_tables(spark, {"t": v2}, root)
    v3 = spark.createDataFrame(
        [(2, "B", 25.0), (3, "c", 30.0), (4, "d", 40.0), (5, "e", 50.0)],
        "id bigint, name string, val double",
    )
    publish.publish_tables(spark, {"t": v3}, root)
    return root


def _read_stream(spark, root, ckpt, **opts):
    """Run one availableNow pass of the store_changes source into a
    parquet sink (supports checkpoint recovery, unlike memory) and return
    everything the sink holds so far."""
    spark.dataSource.register(StoreChangesDataSource)
    out = ckpt + "_out"
    reader = (
        spark.readStream.format("store_changes")
        .option("root", root)
        .option("table", "t")
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_stream_from_earliest_and_checkpoint_resume(spark, store, tmp_path):
    """Tailing from version 0 nets the whole history into the first batch
    (everything in the current version arrives as an insert); after new
    versions land, RESTARTING on the same checkpoint resumes from the
    committed offset and delivers exactly the incremental diff —
    read_changes is the JVM-side oracle for both."""
    ck = str(tmp_path / "ck1")
    got = _read_stream(spark, store, ck, startingVersion="earliest")
    expected = publish.read_table_at(spark, store, "t", 3).withColumn(
        "change_type", F.lit("insert")
    )
    assert _rows(got) == _rows(expected)

    # advance the store: one update + one delete relative to v3
    v4 = spark.createDataFrame(
        [(2, "B2", 26.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id bigint, name string, val double",
    )
    publish.publish_tables(spark, {"t": v4}, store)
    got2 = _read_stream(spark, store, ck, startingVersion="earliest")
    # memory sink accumulates across restarts: batch 2 rows == diff(3→4)
    delta = publish.read_changes(spark, store, "t", 3, 4, keys=["id"])
    assert _rows(got2) == sorted(_rows(got) + _rows(delta))


def test_stream_from_specific_version_and_key_shards(spark, store, tmp_path):
    """startingVersion=2 yields only the v2→v3 delta, however many key
    shards the batch fans out over."""
    got = _read_stream(
        spark, store, str(tmp_path / "ck2"), startingVersion="2", partitions="3"
    )
    expected = publish.read_changes(spark, store, "t", 2, 3, keys=["id"])
    assert _rows(got) == _rows(expected)
    assert _rows(got) == sorted(
        [(2, "B", 25.0, "update"), (5, "e", 50.0, "insert")]
    )


def test_stream_over_merge_on_read_table(spark, tmp_path):
    """A MoR chain must tail identically to the JVM-side read_changes:
    the pyarrow version reader replays the delta log (upserts override
    the base, delete markers drop keys) instead of serving stale base
    rows."""
    root = str(tmp_path / "morstore")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, name string, val double",
    )
    publish.publish_tables(spark, {"t": v1}, root, table_keys={"t": ["id"]})
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame(
            [(2, "B", 25.0), (4, "d", 40.0)], "id bigint, name string, val double"
        ),
        deletes=spark.createDataFrame([(1,)], "id bigint"),
    )
    got = _read_stream(
        spark, root, str(tmp_path / "ckm"), startingVersion="1", partitions="2"
    )
    expected = publish.read_changes(spark, root, "t", 1, 2, keys=["id"])
    assert _rows(got) == _rows(expected)
    assert _rows(got) == sorted(
        [(1, "a", 10.0, "delete"), (2, "B", 25.0, "update"), (4, "d", 40.0, "insert")]
    )

    # a second delta on the same chain tails incrementally too
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame([(2, "B2", 26.0)], "id bigint, name string, val double"),
    )
    got2 = _read_stream(
        spark, root, str(tmp_path / "ckm2"), startingVersion="2"
    )
    assert _rows(got2) == sorted([(2, "B2", 26.0, "update")])


def test_stream_requires_keys(spark, tmp_path):
    root = str(tmp_path / "nokeys")
    publish.publish_tables(
        spark, {"t": spark.createDataFrame([(1,)], "id bigint")}, root
    )
    spark.dataSource.register(StoreChangesDataSource)
    with pytest.raises(Exception, match="key columns"):
        (
            spark.readStream.format("store_changes")
            .option("root", root).option("table", "t").load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck3"))
            .trigger(availableNow=True).start().awaitTermination(60)
        )


def test_stream_over_partitioned_table(spark, tmp_path):
    """Tailing a hive-partitioned table: the partition column comes back
    as a normal column in the change feed (path-derived via pyarrow hive
    partitioning), and the diff semantics are unchanged."""
    root = str(tmp_path / "pstore")
    v1 = spark.createDataFrame(
        [(1, 2020, "a"), (2, 2021, "b")], "id bigint, yr int, name string"
    )
    publish.publish_tables(
        spark, {"t": v1}, root,
        table_keys={"t": ["id"]}, partition_by={"t": ["yr"]},
    )
    v2 = spark.createDataFrame(
        [(1, 2020, "a"), (2, 2021, "B"), (3, 2022, "c")],
        "id bigint, yr int, name string",
    )
    publish.publish_tables(spark, {"t": v2}, root)
    got = _read_stream(spark, root, str(tmp_path / "ckp"), startingVersion="1")
    rows = {(r["id"], r["yr"], r["name"], r["change_type"]) for r in got.collect()}
    assert rows == {(2, 2021, "B", "update"), (3, 2022, "c", "insert")}
