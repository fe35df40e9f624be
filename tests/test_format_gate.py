"""Manifest format-version gate: readers refuse stores requiring a newer
reader; writers refuse stores requiring a newer writer but may still
read; every commit stamps (and never downgrades) the declared versions."""

from __future__ import annotations

import json
import os

import pytest

from dataintegration_ecomprovider_spark.plans import publish


def _bump(root, **fmt):
    path = os.path.join(root, "MANIFEST.json")
    m = json.load(open(path, encoding="utf-8"))
    m["format"] = {**m.get("format", {}), **fmt}
    json.dump(m, open(path, "w", encoding="utf-8"))


def test_commits_stamp_format(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": spark.createDataFrame([(1,)], "k long")}, root,
        table_keys={"t": ["k"]},
    )
    m = publish.current_manifest(root)
    assert m["format"] == {
        "reader": publish.READER_VERSION, "writer": publish.WRITER_VERSION,
    }


def test_newer_reader_requirement_refuses_reads(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": spark.createDataFrame([(1,)], "k long")}, root,
    )
    _bump(root, reader=99)
    with pytest.raises(publish.FormatVersionError, match="reader version 99"):
        publish.read_table(spark, root, "t")


def test_newer_writer_requirement_allows_reads_refuses_writes(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": spark.createDataFrame([(1,)], "k long")}, root,
        table_keys={"t": ["k"]},
    )
    _bump(root, writer=99)
    assert publish.read_table(spark, root, "t").count() == 1
    with pytest.raises(publish.FormatVersionError, match="writer version 99"):
        publish.merge_into_mor(
            spark, root, "t", spark.createDataFrame([(2,)], "k long"),
        )
    # nothing landed and no staging leaked into a committed version
    assert publish.current_manifest(root)["version"] == 1


def test_declared_versions_never_downgrade(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": spark.createDataFrame([(1,)], "k long")}, root,
        table_keys={"t": ["k"]},
    )
    # a foreign writer raised the reader floor within what we support
    _bump(root, reader=publish.READER_VERSION)
    publish.merge_into_mor(
        spark, root, "t", spark.createDataFrame([(2,)], "k long"),
    )
    assert (
        publish.current_manifest(root)["format"]["reader"]
        >= publish.READER_VERSION
    )
