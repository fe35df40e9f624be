"""maintain_training_shards: the shard export follows the store table
through insert/update/delete touching ONLY affected shard directories,
recovers from interrupted swaps, and always equals a from-scratch
re-export of the current state."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.llm import export
from dataintegration_ecomprovider_spark.plans import publish

N_SHARDS = 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _read_export(spark, path):
    return {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(
            *[
                os.path.join(path, d)
                for d in os.listdir(path)
                if d.startswith("shard=") and ".old-" not in d
                and any(not f.startswith(("_", "."))
                        for f in os.listdir(os.path.join(path, d)))
            ]
        ).collect()
    } if any(d.startswith("shard=") for d in os.listdir(path)) else set()


def _expected(spark, root):
    return {
        (r["doc_id"], r["text"])
        for r in publish.read_table(spark, root, "documents").collect()
    }


@pytest.fixture()
def seeded(spark, tmp_path):
    root = str(tmp_path / "store")
    path = str(tmp_path / "export")
    publish.publish_tables(
        spark,
        {"documents": _docs(spark, [(i, f"text {i}") for i in range(40)])},
        root, table_keys={"documents": ["doc_id"]},
    )
    rep = export.maintain_training_shards(
        spark, root, path, num_shards=N_SHARDS
    )
    assert rep["mode"] == "seed" and rep["rows"] == 40
    return root, path


def test_delta_rewrites_only_affected_shards(spark, seeded):
    root, path = seeded
    # churn: update doc 1, insert 100, delete 2
    publish.merge_into_mor(
        spark, root, "documents",
        _docs(spark, [(1, "UPDATED"), (100, "new doc")]),
        deletes=_docs(spark, [(2, "_")]),
    )
    # fingerprint every shard dir before the refresh
    before = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path) if d.startswith("shard=")
    }
    rep = export.maintain_training_shards(
        spark, root, path, num_shards=N_SHARDS
    )
    assert rep["mode"] == "delta"
    changed = {
        int(r["shard"]) for r in export.shard_assign(
            _docs(spark, [(1, ""), (100, ""), (2, "")]), N_SHARDS
        ).select("shard").collect()
    }
    assert set(rep["affected_shards"]) == changed
    for d, listing in before.items():
        n = int(d.split("=")[1])
        if n not in changed:
            assert sorted(os.listdir(os.path.join(path, d))) == listing
    assert _read_export(spark, path) == _expected(spark, root)
    m = json.load(open(os.path.join(path, export.SHARDS_FILE)))
    assert m["rows"] == 40  # 40 + 1 insert - 1 delete
    assert sum(s["rows"] for s in m["shards"].values()) == 40

    # idempotent noop at the same watermark
    rep = export.maintain_training_shards(
        spark, root, path, num_shards=N_SHARDS
    )
    assert rep["mode"] == "noop"


def test_full_shard_deletion_and_revival(spark, seeded):
    root, path = seeded
    # delete EVERY doc of one shard
    all_docs = publish.read_table(spark, root, "documents")
    target = int(
        export.shard_assign(all_docs, N_SHARDS)
        .select("shard").first()["shard"]
    )
    victims = export.shard_assign(all_docs, N_SHARDS).filter(
        F.col("shard") == target
    ).select("doc_id", "text")
    n_victims = victims.count()
    publish.merge_into_mor(
        spark, root, "documents",
        victims.limit(0), deletes=victims,
    )
    rep = export.maintain_training_shards(
        spark, root, path, num_shards=N_SHARDS
    )
    assert target in rep["affected_shards"]
    assert rep["rows"] == 40 - n_victims
    assert _read_export(spark, path) == _expected(spark, root)
    m = json.load(open(os.path.join(path, export.SHARDS_FILE)))
    assert str(target) not in m["shards"]

    # revival: new docs land in the emptied shard again
    revive = export.shard_assign(
        _docs(spark, [(i, f"r{i}") for i in range(200, 260)]), N_SHARDS
    ).filter(F.col("shard") == target).select("doc_id", "text")
    assert revive.count() > 0
    publish.merge_into_mor(spark, root, "documents", revive)
    rep = export.maintain_training_shards(
        spark, root, path, num_shards=N_SHARDS
    )
    assert target in rep["affected_shards"]
    assert _read_export(spark, path) == _expected(spark, root)


def test_interrupted_swap_recovers(spark, seeded):
    root, path = seeded
    # simulate a crash between retire and install: shard dir renamed away,
    # plus an abandoned staging build from before any swap began
    live = next(
        os.path.join(path, d) for d in sorted(os.listdir(path))
        if d.startswith("shard=")
    )
    os.rename(live, live + ".old-deadbeef")
    os.makedirs(os.path.join(path, ".staging-deadbeef", "shard=0"))
    publish.merge_into_mor(
        spark, root, "documents", _docs(spark, [(300, "post-crash")])
    )
    rep = export.maintain_training_shards(
        spark, root, path, num_shards=N_SHARDS
    )
    assert rep["mode"] == "delta"
    assert not [
        d for d in os.listdir(path)
        if ".old-" in d or d.startswith(".staging-deadbeef")
    ]
    assert _read_export(spark, path) == _expected(spark, root)


def test_matches_full_reexport(spark, seeded, tmp_path):
    root, path = seeded
    publish.merge_into_mor(
        spark, root, "documents",
        _docs(spark, [(i, f"gen2 {i}") for i in range(0, 40, 3)]
              + [(i, f"new {i}") for i in range(500, 520)]),
        deletes=_docs(spark, [(i, "_") for i in range(0, 40, 7)]),
    )
    export.maintain_training_shards(spark, root, path, num_shards=N_SHARDS)

    fresh = str(tmp_path / "fresh")
    export.write_training_shards(
        publish.read_table(spark, root, "documents"), fresh,
        N_SHARDS, fmt="parquet",
    )
    assert _read_export(spark, path) == _read_export(spark, fresh)
    m_inc = json.load(open(os.path.join(path, export.SHARDS_FILE)))
    m_full = json.load(open(os.path.join(fresh, export.SHARDS_FILE)))
    assert {k: v["rows"] for k, v in m_inc["shards"].items()} == {
        k: v["rows"] for k, v in m_full["shards"].items()
    }
