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


def test_shard_reader_is_vectorized_and_partition_exhaustive(spark, tmp_path):
    """The round-4 reader hashed every row in Python (md5 of repr(key))
    and to_pylist-ed the full table once PER SHARD.  Pin the rebuilt
    shape: shard ids come from one vectorized pandas row-hash per scan
    batch (no per-row hash function exists in the module any more), the
    shards partition the keyspace exactly (disjoint + exhaustive, stable
    across calls), and the diff of the sharded union equals the JVM-side
    read_changes oracle."""
    import pandas as pd

    from dataintegration_ecomprovider_spark.streaming import store_source

    # the per-row hash helper is gone — the scan path has no per-row Python
    assert not hasattr(store_source, "_key_shard")
    assert not hasattr(store_source, "_version_rows")

    root = str(tmp_path / "store")
    n = 5000
    v1 = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("val"),
    )
    publish.publish_tables(spark, {"t": v1}, root, table_keys={"t": ["id"]})

    cols, keys = ["id", "name", "val"], ["id"]
    num_shards = 4
    frames = [
        store_source._version_frame(root, "t", 1, cols, keys, s, num_shards)
        for s in range(num_shards)
    ]
    sizes = [len(f) for f in frames]
    assert sum(sizes) == n  # exhaustive
    assert all(sz > 0 for sz in sizes)  # hash actually spreads
    ids = sorted(pd.concat(frames)["id"].astype("int64").tolist())
    assert ids == list(range(n))  # disjoint (no key in two shards)

    # stability: the same shard re-read returns the same keys
    again = store_source._version_frame(root, "t", 1, cols, keys, 2, num_shards)
    assert sorted(again["id"].astype("int64").tolist()) == sorted(
        frames[2]["id"].astype("int64").tolist()
    )

    # sharded diff == JVM oracle, including null handling
    v2 = v1.filter(F.col("id") != 3).unionByName(
        spark.createDataFrame(
            [(3, "CHANGED", None), (n + 1, "new", 1.0)],
            "id bigint, name string, val double",
        )
    )
    publish.publish_tables(spark, {"t": v2}, root)
    got = sorted(
        row
        for s in range(num_shards)
        for row in store_source._diff_frames(
            store_source._version_frame(root, "t", 1, cols, keys, s, num_shards),
            store_source._version_frame(root, "t", 2, cols, keys, s, num_shards),
            cols,
            keys,
        )
    )
    expected = sorted(
        tuple(r)
        for r in publish.read_changes(
            spark, root, "t", 1, 2, keys=["id"]
        ).collect()
    )
    assert got == expected


def test_stream_over_schema_evolved_mor_table(spark, tmp_path):
    """After merge_into_mor(evolve_schema=True) the stream's schema comes
    from the entry's recorded (widened) schema, not the narrow base
    parquet — pre-evolution rows tail with nulls in the new column."""
    root = str(tmp_path / "evostore")
    publish.publish_tables(
        spark,
        {"t": spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")},
        root, table_keys={"t": ["id"]},
    )
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame(
            [(2, "b2", 22.0), (3, "c", 33.0)], "id bigint, name string, val double"
        ),
        evolve_schema=True,
    )
    got = _read_stream(spark, root, str(tmp_path / "cke"), startingVersion="1")
    assert got.columns == ["id", "name", "val", "change_type"]
    rows = _rows(got)
    assert rows == sorted([
        (2, "b2", 22.0, "update"),
        (3, "c", 33.0, "insert"),
    ])
    # from version 0: pre-evolution rows arrive null-filled
    got0 = _read_stream(spark, root, str(tmp_path / "cke0"), startingVersion="earliest")
    assert (1, "a", None, "insert") in _rows(got0)


def test_mor_tail_reads_delta_suffix_not_both_versions(spark, tmp_path):
    """The O(delta) fast path (the batch _mor_changes_fast ported to the
    tail): for a base-sharing MoR version chain a micro-batch must read
    (a) ONLY the suffix delta files and (b) a key-scoped, stats-pruned
    subset of the base — never reconstruct both versions in full.  Pins
    bytes-read ∝ delta via the actual scan sources, and byte-identical
    output vs the JVM-side read_changes oracle."""
    from pyspark.sql.datasource import InputPartition

    from dataintegration_ecomprovider_spark.streaming import store_source

    root = str(tmp_path / "morfast")
    n = 4000
    # base clustered on the key → per-file [min, max] key ranges are
    # disjoint, so the scoped read can prove most files irrelevant
    base = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        F.col("id").cast("double").alias("val"),
    ).repartitionByRange(8, "id").sortWithinPartitions("id")
    publish.publish_tables(spark, {"t": base}, root, table_keys={"t": ["id"]})
    path = publish.current_manifest(root)["tables"]["t"]["path"]
    base_files = {os.path.join(path, os.path.basename(f))
                  for f in publish._data_files(path)}
    assert len(base_files) == 8

    # two MoR commits touching a handful of keys in ONE file's range
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame(
            [(10, "upd10", 1.5), (11, "upd11", 2.5), (n + 7, "new", 7.0)],
            "id bigint, name string, val double",
        ),
        deletes=spark.createDataFrame([(12,)], "id bigint"),
    )
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame(
            [(10, "upd10b", 1.75)], "id bigint, name string, val double"
        ),
    )

    cols, keys = ["id", "name", "val"], ["id"]
    scanned: list = []
    orig = store_source._scan_frames

    def spy(source, want_cols, *a, **kw):
        scanned.append(source)
        return orig(source, want_cols, *a, **kw)

    try:
        store_source._scan_frames = spy
        part = store_source._shard_partition(
            root, "t", 2, 3, cols, keys, 0, 1, ())
        got = sorted(
            store_source.StoreChangesStreamReader.read(_reader_stub(), part)
        )
    finally:
        store_source._scan_frames = orig

    expected = sorted(
        tuple(r)
        for r in publish.read_changes(spark, root, "t", 2, 3, keys=keys).collect()
    )
    assert got == expected == [(10, "upd10b", 1.75, "update")]

    # scan sources: the v2→v3 batch may touch the ONE suffix delta dir,
    # the from-version's own delta dir (key-scoped), and a PRUNED base
    # file list — never the full base directory, never the to-version
    # reconstructed
    entry3 = publish.tables_at(root, 3)["t"]
    suffix_dir = entry3["deltas"][-1]["path"]
    prior_delta_dir = entry3["deltas"][0]["path"]
    base_list_scans = [s for s in scanned if isinstance(s, list)]
    assert base_list_scans, f"base scan was not file-pruned: {scanned}"
    for files in base_list_scans:
        assert len(files) < len(base_files)  # ∝ delta, not table
        assert set(files) <= base_files
    dir_scans = {s for s in scanned if isinstance(s, str)}
    assert suffix_dir in dir_scans
    assert path not in dir_scans, "full base directory was scanned"
    assert dir_scans <= {suffix_dir, prior_delta_dir}


def _reader_stub():
    """A bare object exposing nothing — StoreChangesStreamReader.read is
    effectively static (all state travels in the partition tuple), so the
    fast-path test invokes it without building a reader/session."""
    class _R:
        pass

    return _R()


def test_mor_tail_fast_path_matches_generic_under_where_and_shards(
    spark, tmp_path
):
    """Property pin: for a MoR chain the fast path must equal the full
    two-version reconstruction row-for-row — across key shards, with a
    filtered view, including no-op re-upserts (dropped), deletes of
    absent keys (no row), and updates into/out of the predicate slice."""
    from dataintegration_ecomprovider_spark.streaming import store_source

    root = str(tmp_path / "morprop")
    base = spark.createDataFrame(
        [(i, "grp" + str(i % 3), float(i)) for i in range(60)],
        "id bigint, grp string, val double",
    )
    publish.publish_tables(spark, {"t": base}, root, table_keys={"t": ["id"]})
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame(
            [
                (1, "grp1", 1.0),     # no-op re-upsert → must NOT surface
                (2, "grp0", 99.0),    # value update within slice
                (3, "grp9", 3.0),     # grp update OUT of any slice
                (70, "grp0", 70.0),   # insert
            ],
            "id bigint, grp string, val double",
        ),
        deletes=spark.createDataFrame([(5,), (500,)], "id bigint"),  # 500 absent
    )

    cols, keys = ["id", "grp", "val"], ["id"]
    for where in ([], [("grp", "=", "grp0")]):
        for num_shards in (1, 3):
            fast_rows, generic_rows = [], []
            for s in range(num_shards):
                fast = store_source._mor_tail_frames(
                    root, "t", 1, 2, cols, keys, s, num_shards, where)
                assert fast is not None, "fast path not taken"
                fast_rows.extend(
                    store_source._diff_frames(fast[0], fast[1], cols, keys))
                generic_rows.extend(store_source._diff_frames(
                    store_source._version_frame(
                        root, "t", 1, cols, keys, s, num_shards, where),
                    store_source._version_frame(
                        root, "t", 2, cols, keys, s, num_shards, where),
                    cols, keys))
            assert sorted(fast_rows) == sorted(generic_rows), (where, num_shards)
    # a compact used to break the base-sharing chain; round 7 bridges it
    # via rewrite_of provenance — a compact-only span is change-free
    publish.compact(spark, root, "t")
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame([(2, "grp0", 100.0)],
                              "id bigint, grp string, val double"),
    )
    fast23 = store_source._mor_tail_frames(
        root, "t", 2, 3, cols, keys, 0, 1, ())
    assert fast23 is not None and len(fast23[0]) == len(fast23[1]) == 0
    fast24 = store_source._mor_tail_frames(
        root, "t", 2, 4, cols, keys, 0, 1, ())
    assert fast24 is not None  # bridged ACROSS the rewrite
    assert sorted(
        store_source._diff_frames(fast24[0], fast24[1], cols, keys)
    ) == [(2, "grp0", 100.0, "update")]
    fast = store_source._mor_tail_frames(
        root, "t", 3, 4, cols, keys, 0, 1, ())
    assert fast is not None  # the new chain works too


def test_stream_filtered_view_with_boolean_tree(spark, tmp_path):
    """The `where` option accepts nested OR/NOT trees (round 6): the
    pyarrow pushdown, the pandas Kleene-logic residual mask, and the JVM
    read_changes oracle must agree — including null rows under NOT,
    where SQL three-valued logic excludes them."""
    import json as _json

    root = str(tmp_path / "orstore")
    publish.publish_tables(
        spark,
        {"t": spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "c", 40.0)],
            "id bigint, name string, val double",
        )},
        root, table_keys={"t": ["id"]},
    )
    publish.publish_tables(
        spark,
        {"t": spark.createDataFrame(
            [(1, "a", 11.0), (2, "b", 20.0), (3, None, 33.0), (5, "b", 50.0)],
            "id bigint, name string, val double",
        )},
        root,
    )
    where = [("or", ("name", "=", "a"), ("not", ("val", "<", 45.0)))]
    got = _read_stream(
        spark, root, str(tmp_path / "ckor"), startingVersion="1",
        where=_json.dumps(where),
    )
    expected = publish.read_changes(
        spark, root, "t", 1, 2, keys=["id"], where=where
    )
    assert _rows(got) == _rows(expected)
    # id=3 (null name, val<45) is outside the view in BOTH versions under
    # three-valued logic; id=1 updates in-slice; id=5 enters via NOT arm
    assert _rows(got) == sorted(
        [(1, "a", 11.0, "update"), (5, "b", 50.0, "insert")]
    )


def test_named_stream_holds_vacuum_retention_lease(spark, store, tmp_path):
    """A stream started with .option("reader", name) registers a
    retention floor at its NEXT offset and renews it at every epoch
    commit — vacuum then refuses to prune the version the checkpoint
    will diff from, so a restart after vacuum keeps working; an
    anonymous stream gets no lease (documented Delta-style hazard)."""
    ck = str(tmp_path / "cklease")
    got = _read_stream(
        spark, store, ck, startingVersion="2", reader="repl-loop"
    )
    assert got.count() == 2  # v2→v3 diff
    floors = publish.active_reader_floors(store)
    # the floor tracks the last PLANNED batch's from-version (Spark may
    # stop an availableNow run before commit() fires) — never higher
    # than the checkpointed offset, so always protective
    assert floors["repl-loop"]["version"] in (2, 3)

    # four more versions land; vacuum hard to keep_versions=1
    for i in range(4):
        publish.publish_tables(
            spark,
            {"t": spark.createDataFrame(
                [(100 + i, "z", 1.0)], "id bigint, name string, val double"
            )},
            store,
        )
    res = publish.vacuum(spark, store, keep_versions=1)
    assert res["reader_floors"]["repl-loop"] in (2, 3)
    assert 3 not in res["removed_versions"]
    # the checkpointed stream RESUMES across the vacuum: its from-version
    # survived, so the next pass delivers the 3→7 diff exactly
    got2 = _read_stream(spark, store, ck, startingVersion="2", reader="repl-loop")
    expected = publish.read_changes(spark, store, "t", 3, 7, keys=["id"])
    assert _rows(got2) == sorted(_rows(got) + _rows(expected))
    # the restart re-planned from the checkpoint: the floor advanced past
    # the vacuum-era version even though startingVersion still says 2
    assert publish.active_reader_floors(store)["repl-loop"]["version"] >= 3


def test_stream_filtered_view_changes(spark, store, tmp_path):
    """The `where` option tails the FILTERED view's CDC — the streaming
    twin of read_changes(where=...): both version frames filter through
    the pushed-down predicate, so rows updated out of the slice arrive
    as deletes."""
    import json as _json

    # store fixture: v2→v3 changes id=2 name b→B and inserts id=5
    got = _read_stream(
        spark, store, str(tmp_path / "ckw"), startingVersion="2",
        where=_json.dumps([["name", "in", ["b", "e"]]]),
    )
    expected = publish.read_changes(
        spark, store, "t", 2, 3, keys=["id"],
        where=[("name", "in", ["b", "e"])],
    )
    assert _rows(got) == _rows(expected)
    # id=2's rename to "B" leaves the filtered view -> delete of old row;
    # id=5 ("e") enters it -> insert
    assert _rows(got) == sorted(
        [(2, "b", 25.0, "delete"), (5, "e", 50.0, "insert")]
    )


def test_stream_filtered_view_over_mor_markers(spark, tmp_path):
    """Delta delete markers (null value columns) must still retract
    filtered-in base rows: the predicate is pushed ONLY into the base
    scan, never into delta files."""
    import json as _json

    root = str(tmp_path / "morwstore")
    publish.publish_tables(
        spark,
        {"t": spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
            "id bigint, name string, val double",
        )},
        root, table_keys={"t": ["id"]},
    )
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame([(3, "a", 33.0)], "id bigint, name string, val double"),
        deletes=spark.createDataFrame([(1,)], "id bigint"),
    )
    got = _read_stream(
        spark, root, str(tmp_path / "ckwm"), startingVersion="1",
        where=_json.dumps([["name", "=", "a"]]),
    )
    expected = publish.read_changes(
        spark, root, "t", 1, 2, keys=["id"], where=[("name", "=", "a")],
    )
    assert _rows(got) == _rows(expected)
    assert _rows(got) == sorted(
        [(1, "a", 10.0, "delete"), (3, "a", 33.0, "insert")]
    )


def test_expired_lease_not_reseeded_at_init(spark, store):
    """ADVICE r6: after an outage longer than the lease TTL, a reader
    restart must NOT re-seed the floor at __init__-time _initial (which
    defaults to the CURRENT version — far past the checkpointed offset);
    the floor is only re-established at partitions() time from the real
    batch offset.  __init__ seeds only when NO lease record exists."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from dataintegration_ecomprovider_spark.streaming.store_source import (
        StoreChangesStreamReader,
    )

    schema = StructType([
        StructField("id", LongType()), StructField("name", StringType()),
        StructField("change_type", StringType()),
    ])
    # an EXPIRED lease at the checkpoint-era version survives __init__
    publish.register_reader(store, "stale", 1, ttl_seconds=-1.0)
    r = StoreChangesStreamReader(
        schema, {"root": store, "table": "t", "reader": "stale"}
    )
    rec = publish._read_readers(store)["stale"]
    assert rec["version"] == 1, "expired lease was re-seeded at _initial"
    # partitions() re-establishes the floor from the REAL batch offset
    r.partitions({"version": 2}, {"version": 3})
    assert publish.active_reader_floors(store)["stale"]["version"] == 2

    # a reader with NO record at all still seeds its initial offset
    StoreChangesStreamReader(
        schema, {"root": store, "table": "t", "reader": "fresh"}
    )
    assert publish.active_reader_floors(store)["fresh"]["version"] == 3


def test_mor_tail_bridges_maintain_store_compaction(spark, tmp_path):
    """Round 7: a micro-batch whose span contains maintain_store's
    nightly compact still reads bytes ∝ delta.  The compact commit
    carries rewrite_of provenance, the tail composes suffix deltas
    across it, and the batch touches ONLY (a) the post-compact suffix
    delta dir, (b) the from-version's own delta dir (key-scoped) and
    (c) a PRUNED old-base file list — never the full old base, never
    the compacted new base.  A compact-only span scans NOTHING."""
    from dataintegration_ecomprovider_spark.streaming import store_source

    root = str(tmp_path / "morbridge")
    n = 4000
    base = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        F.col("id").cast("double").alias("val"),
    ).repartitionByRange(8, "id").sortWithinPartitions("id")
    publish.publish_tables(spark, {"t": base}, root, table_keys={"t": ["id"]})
    old_base = publish.current_manifest(root)["tables"]["t"]["path"]
    old_base_files = {os.path.join(old_base, os.path.basename(f))
                      for f in publish._data_files(old_base)}

    publish.merge_into_mor(  # v2
        spark, root, "t",
        spark.createDataFrame(
            [(10, "upd10", 1.5), (n + 7, "new", 7.0)],
            "id bigint, name string, val double",
        ),
    )
    report = publish.maintain_store(spark, root, max_deltas=0)  # v3: compact
    assert "t" in report["compacted"], report
    new_base = publish.current_manifest(root)["tables"]["t"]["path"]
    assert new_base != old_base
    publish.merge_into_mor(  # v4
        spark, root, "t",
        spark.createDataFrame(
            [(10, "upd10b", 1.75), (12, "upd12", 3.0)],
            "id bigint, name string, val double",
        ),
        deletes=spark.createDataFrame([(11,)], "id bigint"),
    )

    cols, keys = ["id", "name", "val"], ["id"]
    scanned: list = []
    orig = store_source._scan_frames

    def spy(source, want_cols, *a, **kw):
        scanned.append(source)
        return orig(source, want_cols, *a, **kw)

    try:
        store_source._scan_frames = spy
        part = store_source._shard_partition(root, "t", 2, 4, cols, keys, 0, 1, ())
        got = sorted(
            store_source.StoreChangesStreamReader.read(_reader_stub(), part)
        )
        scanned_24, scanned[:] = list(scanned), []
        part23 = store_source._shard_partition(root, "t", 2, 3, cols, keys, 0, 1, ())
        got23 = sorted(
            store_source.StoreChangesStreamReader.read(_reader_stub(), part23)
        )
        scanned_23 = list(scanned)
    finally:
        store_source._scan_frames = orig

    expected = sorted(
        tuple(r)
        for r in publish.read_changes(spark, root, "t", 2, 4, keys=keys).collect()
    )
    assert got == expected == sorted([
        (10, "upd10b", 1.75, "update"),
        (11, "name11", 11.0, "delete"),
        (12, "upd12", 3.0, "update"),
    ])

    # compact-only span: provably change-free, zero rows, ZERO scans
    assert got23 == []
    assert scanned_23 == []

    # bytes ∝ delta across the rewrite: pruned old-base file lists only,
    # and the directories touched are exactly the two delta dirs
    entry2 = publish.tables_at(root, 2)["t"]
    entry4 = publish.tables_at(root, 4)["t"]
    from_delta_dir = entry2["deltas"][0]["path"]
    suffix_dir = entry4["deltas"][-1]["path"]
    base_list_scans = [s for s in scanned_24 if isinstance(s, list)]
    assert base_list_scans, f"old-base scan was not file-pruned: {scanned_24}"
    for files in base_list_scans:
        assert len(files) < len(old_base_files)
        assert set(files) <= old_base_files
    dir_scans = {s for s in scanned_24 if isinstance(s, str)}
    assert suffix_dir in dir_scans
    assert dir_scans <= {suffix_dir, from_delta_dir}
    assert old_base not in dir_scans and new_base not in dir_scans


def test_stream_over_conditional_backend_store(spark, tmp_path):
    """Round 9: a store durably opted into the conditional-write commit
    backend (_PROTOCOL.json) streams its CDC tail correctly — the Python
    DataSource's WORKER PROCESSES re-resolve the backend from the config
    file (a session-only set_protocol could never reach them), proving
    the streaming path reads manifests through the seam, not from a root
    MANIFEST.json (which this store does not have)."""
    from dataintegration_ecomprovider_spark.plans import (
        commit_protocol as cp,
    )

    root = str(tmp_path / "condstore")
    cp.persist_protocol(root, "conditional")
    try:
        v1 = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)],
            "id bigint, name string, val double",
        )
        publish.publish_tables(spark, {"t": v1}, root,
                               table_keys={"t": ["id"]})
        publish.merge_into_mor(
            spark, root, "t",
            spark.createDataFrame([(2, "B", 25.0), (3, "c", 30.0)],
                                  "id bigint, name string, val double"),
            deletes=spark.createDataFrame([(1,)], "id bigint"),
        )
        assert not os.path.exists(os.path.join(root, "MANIFEST.json"))
        got = _read_stream(spark, root, str(tmp_path / "ckc"),
                           startingVersion="1")
        expected = publish.read_changes(spark, root, "t", 1, 2, keys=["id"])
        assert _rows(got) == _rows(expected)
        assert _rows(got) == sorted([
            (1, "a", 10.0, "delete"), (2, "B", 25.0, "update"),
            (3, "c", 30.0, "insert"),
        ])
    finally:
        cp._REGISTRY.pop(root, None)


def test_stream_over_partial_update_chain(spark, tmp_path):
    """Round 9: the pyarrow replay handles PARTIAL deltas — set columns
    overlay in commit order, unset columns ride through, delete markers
    still win — and the tail matches read_changes exactly (the O(delta)
    fast path detects the partial suffix and falls back)."""
    root = str(tmp_path / "pstore")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, name string, val double",
    )
    publish.publish_tables(spark, {"t": base}, root, table_keys={"t": ["id"]})
    publish.merge_into_mor(  # v2: full upsert
        spark, root, "t",
        spark.createDataFrame([(2, "B", 25.0), (4, "d", 40.0)],
                              "id bigint, name string, val double"),
    )
    publish.merge_into_mor(  # v3: partial — val only
        spark, root, "t",
        spark.createDataFrame([(1, 111.0), (2, 222.0)], "id bigint, val double"),
        partial_update=True, insert_new=False,
    )
    publish.merge_into_mor(  # v4: delete one overlaid key
        spark, root, "t",
        spark.createDataFrame([], "id bigint, name string, val double"),
        deletes=spark.createDataFrame([(2,)], "id bigint"),
    )
    got = _read_stream(spark, root, str(tmp_path / "ckp"),
                       startingVersion="1")
    expected = publish.read_changes(spark, root, "t", 1, 4, keys=["id"])
    assert _rows(got) == _rows(expected)
    assert _rows(got) == sorted([
        (1, "a", 111.0, "update"), (2, "b", 20.0, "delete"),
        (4, "d", 40.0, "insert"),
    ])
