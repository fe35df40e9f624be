"""Transaction watermarks (`txn=(app_id, batch_id)`) — the exactly-once
commit primitive: replayed batches are manifest-level no-ops, watermarks
survive unrelated commits, and the store→store streaming pipeline
composes both halves into end-to-end exactly-once change propagation."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.plans import publish


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _rows(spark, root, name):
    return {
        (r["k"], r["v"])
        for r in publish.read_table(spark, root, name).collect()
    }


def test_publish_tables_txn_skips_replay(spark, tmp_path):
    root = str(tmp_path / "store")
    m1 = publish.publish_tables(
        spark, {"t": _df(spark, [(1, "a")])}, root,
        table_keys={"t": ["k"]}, txn=("app", 0),
    )
    assert m1["version"] == 1 and m1["txns"] == {"app": 0}
    assert publish.last_txn(root, "app") == 0
    assert publish.last_txn(root, "other") is None

    # replay of batch 0: no new version, no new data dir, old data intact
    n_dirs = len(glob.glob(os.path.join(root, "data", "*")))
    m2 = publish.publish_tables(
        spark, {"t": _df(spark, [(9, "REPLAY")])}, root, txn=("app", 0),
    )
    assert m2.get("txn_skipped") is True
    assert m2["version"] == 1
    assert len(glob.glob(os.path.join(root, "data", "*"))) == n_dirs
    assert _rows(spark, root, "t") == {(1, "a")}

    # the NEXT batch commits normally and advances the watermark
    m3 = publish.publish_tables(
        spark, {"t": _df(spark, [(2, "b")])}, root, txn=("app", 1),
    )
    assert m3["version"] == 2 and m3["txns"] == {"app": 1}
    # a LOWER replayed id is also skipped (watermark is monotone)
    m4 = publish.publish_tables(
        spark, {"t": _df(spark, [(9, "X")])}, root, txn=("app", 0),
    )
    assert m4.get("txn_skipped") is True and m4["version"] == 2


def test_merge_into_mor_txn_no_duplicate_delta(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": _df(spark, [(1, "a"), (2, "b")])}, root,
        table_keys={"t": ["k"]},
    )
    m1 = publish.merge_into_mor(
        spark, root, "t", _df(spark, [(2, "B2"), (3, "c")]), txn=("s", 0)
    )
    entry = m1["tables"]["t"]
    assert len(entry["deltas"]) == 1 and m1["txns"] == {"s": 0}

    n_dirs = len(glob.glob(os.path.join(root, "data", "*")))
    m2 = publish.merge_into_mor(
        spark, root, "t", _df(spark, [(3, "REPLAY")]), txn=("s", 0)
    )
    assert m2.get("txn_skipped") is True
    assert len(m2["tables"]["t"]["deltas"]) == 1
    # the staged replay delta was cleaned up, not orphaned
    assert len(glob.glob(os.path.join(root, "data", "*"))) == n_dirs
    assert _rows(spark, root, "t") == {(1, "a"), (2, "B2"), (3, "c")}

    # CDC consumers see the batch exactly once
    changes = publish.read_changes(spark, root, "t", 1).collect()
    assert {(r["k"], r["change_type"]) for r in changes} == {
        (2, "update"), (3, "insert"),
    }


def test_merge_into_cow_txn_skips_replay(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": _df(spark, [(1, "a")])}, root, table_keys={"t": ["k"]},
    )
    publish.merge_into(spark, root, "t", _df(spark, [(2, "b")]), txn=("c", 7))
    v = publish.current_manifest(root)["version"]
    m = publish.merge_into(
        spark, root, "t", _df(spark, [(2, "REPLAY")]), txn=("c", 7)
    )
    assert m.get("txn_skipped") is True
    assert publish.current_manifest(root)["version"] == v
    assert _rows(spark, root, "t") == {(1, "a"), (2, "b")}


def test_txn_watermark_survives_unrelated_commits(spark, tmp_path):
    """Renames, compaction and second tables must not erase the map —
    every manifest constructor carries it forward (_history_fields)."""
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": _df(spark, [(1, "a")])}, root,
        table_keys={"t": ["k"]}, txn=("app", 3),
    )
    publish.rename_column(spark, root, "t", "v", "val")
    publish.publish_tables(spark, {"u": _df(spark, [(5, "z")])}, root)
    publish.compact(spark, root, "t")
    publish.rollback(root, publish.current_manifest(root)["version"] - 1)
    assert publish.last_txn(root, "app") == 3
    # and a replay STILL skips after all of that
    m = publish.publish_tables(
        spark, {"t2": _df(spark, [(1, "x")])}, root, txn=("app", 3),
    )
    assert m.get("txn_skipped") is True


def test_two_apps_do_not_interfere(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": _df(spark, [(1, "a")])}, root,
        table_keys={"t": ["k"]}, txn=("a1", 5),
    )
    # a different app with a lower id commits fine
    m = publish.merge_into_mor(
        spark, root, "t", _df(spark, [(2, "b")]), txn=("a2", 0)
    )
    assert m.get("txn_skipped") is None
    assert m["txns"] == {"a1": 5, "a2": 0}


def _ck(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"txn_{tag}_")


def test_stream_into_store_exactly_once_commits(spark, tmp_path):
    """The MoR ingest stream with exactly_once_app: re-running the SAME
    batches against a fresh checkpoint (the worst-case replay — every
    batch re-delivered) moves neither the version nor the delta log."""
    from dataintegration_ecomprovider_spark.streaming.incremental import (
        file_stream,
        stream_into_store,
    )

    src = str(tmp_path / "in")
    os.makedirs(src)
    # disjoint keys per file so the final state is independent of the
    # file-discovery order
    _df(spark, [(1, "a"), (2, "b")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _df(spark, [(3, "c"), (4, "d")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    root = str(tmp_path / "store")
    schema = _df(spark, [(0, "x")]).schema

    def run(app):
        q = stream_into_store(
            file_stream(spark, src, schema, max_files_per_trigger=1),
            root, "t", ["k"], _ck("ck"),
            mor=True, exactly_once_app=app,
        )
        q.awaitTermination(120)

    run("ingest")
    v1 = publish.current_manifest(root)["version"]
    got1 = _rows(spark, root, "t")
    assert got1 == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}

    # fresh checkpoint, same batch ids, same app → all replays skipped
    run("ingest")
    assert publish.current_manifest(root)["version"] == v1
    assert _rows(spark, root, "t") == got1

    # fresh checkpoint under a NEW app id = a deliberate reprocess: the
    # merges apply again (idempotent upserts), versions advance
    run("ingest2")
    assert publish.current_manifest(root)["version"] > v1
    assert _rows(spark, root, "t") == got1


def test_stream_store_to_store_follows_exactly_once(spark, tmp_path):
    """The full pipeline: upstream commits (insert/update/delete) propagate
    through store_changes → transform → MoR sink; a checkpoint-resume run
    converges, and a full fresh-checkpoint replay is a downstream no-op."""
    from dataintegration_ecomprovider_spark.streaming.incremental import (
        stream_store_to_store,
    )

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    publish.publish_tables(
        spark, {"t": _df(spark, [(1, "a"), (2, "b"), (3, "c")])},
        src_root, table_keys={"t": ["k"]},
    )
    publish.merge_into_mor(
        spark, src_root, "t", _df(spark, [(2, "B2"), (4, "d")]),
        deletes=_df(spark, [(3, "_")]),
    )

    def transform(df):
        # row-local reshape + a filter: key 4 never reaches downstream
        return df.filter(F.col("k") != 4).select(
            "k", F.upper("v").alias("v")
        )

    ck = _ck("s2s")
    q = stream_store_to_store(
        spark, src_root, "t", dst_root, "d", ck, "hop1",
        transform=transform,
    )
    q.awaitTermination(120)
    assert _rows(spark, dst_root, "d") == {(1, "A"), (2, "B2")}
    v1 = publish.current_manifest(dst_root)["version"]

    # more upstream churn: update 1, delete 2, insert 5 — resume the SAME
    # checkpoint and converge
    publish.merge_into_mor(
        spark, src_root, "t", _df(spark, [(1, "a9"), (5, "e")]),
        deletes=_df(spark, [(2, "_")]),
    )
    q = stream_store_to_store(
        spark, src_root, "t", dst_root, "d", ck, "hop1",
        transform=transform,
    )
    q.awaitTermination(120)
    assert _rows(spark, dst_root, "d") == {(1, "A9"), (5, "E")}
    v2 = publish.current_manifest(dst_root)["version"]
    assert v2 > v1

    # catastrophic replay: fresh checkpoint re-delivers EVERY batch from
    # version 0 — the txn watermark absorbs all of it
    q = stream_store_to_store(
        spark, src_root, "t", dst_root, "d", _ck("s2s_fresh"), "hop1",
        transform=transform,
    )
    q.awaitTermination(120)
    assert publish.current_manifest(dst_root)["version"] == v2
    assert _rows(spark, dst_root, "d") == {(1, "A9"), (5, "E")}

    # downstream CDC saw each key's journey exactly once per commit
    chg = publish.read_changes(spark, dst_root, "d", 1, v2).collect()
    assert {(r["k"], r["change_type"]) for r in chg} == {
        (1, "update"), (2, "delete"), (5, "insert"),
    }


def test_replay_store_to_store_is_downstream_noop(spark, tmp_path):
    """replay_store_to_store (round 14): re-deliver every batch a finished
    run's commit log recorded, through the same sink, WITHOUT a second
    stream start — the downstream version must not move, the replayed
    batch set must equal the checkpoint's commit log, and the spans must
    tile the streamed version range."""
    import os

    from dataintegration_ecomprovider_spark.streaming.incremental import (
        replay_store_to_store,
        stream_store_to_store,
    )

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    publish.publish_tables(
        spark, {"t": _df(spark, [(1, "a"), (2, "b"), (3, "c")])},
        src_root, table_keys={"t": ["k"]},
    )
    publish.merge_into_mor(
        spark, src_root, "t", _df(spark, [(2, "B2"), (4, "d")]),
        deletes=_df(spark, [(3, "_")]),
    )

    def transform(df):
        return df.filter(F.col("k") != 4).select("k", F.upper("v").alias("v"))

    ck = _ck("s2s_replay")
    q = stream_store_to_store(
        spark, src_root, "t", dst_root, "d", ck, "hop1",
        transform=transform,
    )
    q.awaitTermination(120)
    assert _rows(spark, dst_root, "d") == {(1, "A"), (2, "B2")}
    v1 = publish.current_manifest(dst_root)["version"]

    rep = replay_store_to_store(
        spark, ck, src_root, "t", dst_root, "d", "hop1",
        transform=transform,
    )
    # the replay covered exactly the commit log's batches, spanning the
    # whole streamed version range from the earliest start
    committed = sorted(
        int(f) for f in os.listdir(os.path.join(ck, "commits"))
        if f.isdigit()
    )
    assert rep["batches"] == committed and committed
    assert rep["spans"][committed[0]][0] == 0
    assert (
        rep["spans"][committed[-1]][1]
        == publish.current_manifest(src_root)["version"]
    )
    # ... and the sink absorbed all of it: no new version, same rows
    assert publish.current_manifest(dst_root)["version"] == v1
    assert _rows(spark, dst_root, "d") == {(1, "A"), (2, "B2")}

    # a checkpoint with no completed batch is a vacuous proof: refuse
    with pytest.raises(ValueError, match="no completed batch"):
        replay_store_to_store(
            spark, str(tmp_path / "empty_ck"), src_root, "t",
            dst_root, "d", "hop1", transform=transform,
        )


def test_transform_must_preserve_keys(spark, tmp_path):
    from dataintegration_ecomprovider_spark.streaming.incremental import (
        stream_store_to_store,
    )

    src_root = str(tmp_path / "src")
    publish.publish_tables(
        spark, {"t": _df(spark, [(1, "a")])}, src_root,
        table_keys={"t": ["k"]},
    )
    q = stream_store_to_store(
        spark, src_root, "t", str(tmp_path / "dst"), "d", _ck("bad"),
        "hop", transform=lambda df: df.select("v"),
    )
    with pytest.raises(Exception, match="preserve the key columns"):
        q.awaitTermination(120)
    try:
        q.stop()
    except Exception:
        pass


def test_merge_many_mor_is_atomic_and_txn_gated(spark, tmp_path):
    """Multi-table MERGE: one version for N tables; every intermediate
    version is a consistent cross-table snapshot; a replayed batch skips
    atomically."""
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark,
        {
            "orders": _df(spark, [(1, "o1"), (2, "o2")]),
            "lines": spark.createDataFrame(
                [(10, 1, "l1"), (11, 2, "l2")], "line_id long, k long, v string"
            ),
        },
        root,
        table_keys={"orders": ["k"], "lines": ["line_id"]},
    )
    v0 = publish.current_manifest(root)["version"]
    m = publish.merge_many_mor(
        spark, root,
        {
            "orders": {"staging": _df(spark, [(3, "o3")]),
                       "deletes": _df(spark, [(2, "_")])},
            "lines": {"staging": spark.createDataFrame(
                [(12, 3, "l3")], "line_id long, k long, v string"
            ), "deletes": spark.createDataFrame(
                [(11,)], "line_id long"
            )},
        },
        txn=("job", 0),
    )
    assert m["version"] == v0 + 1  # ONE commit for both tables
    orders = {r["k"] for r in publish.read_table(spark, root, "orders").collect()}
    lines = {r["line_id"] for r in publish.read_table(spark, root, "lines").collect()}
    assert orders == {1, 3} and lines == {10, 12}
    # no historical version shows orders moved without lines
    for v in range(1, m["version"] + 1):
        o = publish.read_table_at(spark, root, "orders", v).count()
        l = publish.read_table_at(spark, root, "lines", v).count()
        assert (o, l) in {(2, 2)} if v == v0 else True
    # cross-table CDC sees both tables change at the SAME version
    co = publish.read_changes(spark, root, "orders", v0).collect()
    cl = publish.read_changes(spark, root, "lines", v0).collect()
    assert {(r["k"], r["change_type"]) for r in co} == {(3, "insert"), (2, "delete")}
    assert {(r["line_id"], r["change_type"]) for r in cl} == {(12, "insert"), (11, "delete")}

    # replayed batch: ONE skip for the whole transaction, nothing staged
    import glob
    import os

    n_dirs = len(glob.glob(os.path.join(root, "data", "*")))
    m2 = publish.merge_many_mor(
        spark, root,
        {"orders": {"staging": _df(spark, [(9, "REPLAY")])}},
        txn=("job", 0),
    )
    assert m2.get("txn_skipped") is True
    assert publish.current_manifest(root)["version"] == m["version"]
    assert len(glob.glob(os.path.join(root, "data", "*"))) == n_dirs


def test_merge_many_mor_parity_with_single_merges(spark, tmp_path):
    """Each table's final state must equal what per-table merge_into_mor
    produces (shared implementation, pinned)."""
    many_root = str(tmp_path / "many")
    one_root = str(tmp_path / "one")
    for root in (many_root, one_root):
        publish.publish_tables(
            spark,
            {"a": _df(spark, [(1, "x"), (2, "y")]),
             "b": _df(spark, [(5, "p")])},
            root, table_keys={"a": ["k"], "b": ["k"]},
        )
    specs = {
        "a": {"staging": _df(spark, [(2, "Y2"), (3, "z")]),
              "insert_new": False},
        "b": {"staging": _df(spark, [(5, "P2"), (6, "q")]),
              "update_existing": False},
    }
    publish.merge_many_mor(spark, many_root, specs)
    for name, spec in specs.items():
        publish.merge_into_mor(
            spark, one_root, name, spec["staging"],
            insert_new=spec.get("insert_new", True),
            update_existing=spec.get("update_existing", True),
        )
    for name in ("a", "b"):
        assert _rows(spark, many_root, name) == _rows(spark, one_root, name)


def test_stream_store_to_store_schema_evolution_across_restart(spark, tmp_path):
    """Upstream widens mid-pipeline: the restarted stream (new schema
    pinned at start) carries the new column downstream when
    evolve_schema=True; pre-evolution downstream rows read as nulls."""
    from dataintegration_ecomprovider_spark.streaming.incremental import (
        stream_store_to_store,
    )

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    publish.publish_tables(
        spark, {"t": _df(spark, [(1, "a"), (2, "b")])},
        src_root, table_keys={"t": ["k"]},
    )
    ck = _ck("evo")
    q = stream_store_to_store(
        spark, src_root, "t", dst_root, "d", ck, "hop",
        evolve_schema=True,
    )
    q.awaitTermination(120)

    # upstream widens and updates one row
    publish.merge_into_mor(
        spark, src_root, "t",
        spark.createDataFrame(
            [(2, "B2", 42), (3, "c", 7)], "k long, v string, extra long"
        ),
        evolve_schema=True,
    )
    # restart the stream: the new schema is pinned now, the resumed
    # checkpoint replays only the widened version's changes
    q = stream_store_to_store(
        spark, src_root, "t", dst_root, "d", ck, "hop",
        evolve_schema=True,
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["v"], r["extra"])
        for r in publish.read_table(spark, dst_root, "d").collect()
    }
    assert got == {(1, "a", None), (2, "B2", 42), (3, "c", 7)}


def test_stream_store_to_store_partitioned_source(spark, tmp_path):
    """partitions=4 fans the CDC diff over key-hash shards; the composed
    pipeline result is identical to the single-shard run."""
    from dataintegration_ecomprovider_spark.streaming.incremental import (
        stream_store_to_store,
    )

    src_root = str(tmp_path / "src")
    publish.publish_tables(
        spark, {"t": _df(spark, [(i, f"v{i}") for i in range(40)])},
        src_root, table_keys={"t": ["k"]},
    )
    publish.merge_into_mor(
        spark, src_root, "t",
        _df(spark, [(i, f"V{i}") for i in range(0, 40, 5)] + [(100, "new")]),
        deletes=_df(spark, [(7, "_"), (13, "_")]),
    )
    results = {}
    for nparts in (1, 4):
        dst_root = str(tmp_path / f"dst{nparts}")
        q = stream_store_to_store(
            spark, src_root, "t", dst_root, "d", _ck(f"p{nparts}"),
            f"hop{nparts}", partitions=nparts,
        )
        q.awaitTermination(120)
        results[nparts] = _rows(spark, dst_root, "d")
    assert results[1] == results[4]
    assert (100, "new") in results[1] and (7, "v7") not in results[1]
