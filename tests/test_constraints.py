"""Persisted table constraints (publish.set_constraints — the Delta
CHECK-constraint role): declared once on the manifest entry, enforced by
EVERY write path — publish_tables validates the staged full state,
merge_into_mor validates its delta-sized staging against the row-local
subset — and a violating write aborts before anything becomes visible.
Value-preserving rewrites skip re-validation; renames follow the specs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.plans import publish


def _t(spark, n=10):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.lit("ok").alias("status"),
    )


def _store(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": _t(spark)}, root, table_keys={"t": ["k"]}
    )
    publish.set_constraints(root, "t", [
        ["not_null", "v"],
        ["values_in", "status", ["ok", "hold"]],
        ["range", "v", 0, 10_000],
        ["unique", "k"],
    ])
    return root


def test_publish_enforces_persisted_constraints(spark, tmp_path):
    root = _store(spark, tmp_path)
    assert publish.table_constraints(root, "t")[0] == ["not_null", "v"]
    v_before = publish.current_manifest(root)["version"]
    # a violating full publish aborts; nothing becomes visible
    bad = _t(spark).withColumn(
        "status", F.when(F.col("k") == 3, "BAD").otherwise("ok")
    )
    with pytest.raises(publish.ValidationError, match="persisted constraint"):
        publish.publish_tables(spark, {"t": bad}, root)
    assert publish.current_manifest(root)["version"] == v_before
    # a clean publish carries the constraints onto the new entry
    publish.publish_tables(spark, {"t": _t(spark, 12)}, root)
    assert publish.table_constraints(root, "t") != []


def test_mor_merge_enforces_row_local_constraints(spark, tmp_path):
    root = _store(spark, tmp_path)
    v_before = publish.current_manifest(root)["version"]
    with pytest.raises(publish.ValidationError, match="merge staging"):
        publish.merge_into_mor(
            spark, root, "t",
            spark.createDataFrame([(1, -5, "ok")], "k long, v long, status string"),
        )
    # an OMITTED not_null column is a violation too: the delta's null
    # replaces the row's value at read time
    with pytest.raises(publish.ValidationError, match="merge staging"):
        publish.merge_into_mor(
            spark, root, "t",
            spark.createDataFrame([(1, "ok")], "k long, status string"),
        )
    assert publish.current_manifest(root)["version"] == v_before
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame([(1, 5, "hold")], "k long, v long, status string"),
    )
    assert publish.read_table(spark, root, "t").filter(
        F.col("k") == 1
    ).collect()[0]["status"] == "hold"


def test_constraints_follow_renames_and_block_drops(spark, tmp_path):
    root = _store(spark, tmp_path)
    publish.rename_column(spark, root, "t", "v", "value")
    specs = publish.table_constraints(root, "t")
    assert ["not_null", "value"] in specs and ["range", "value", 0, 10000] in specs
    # enforcement works through the column map (logical name in staging,
    # physical name in the files)
    with pytest.raises(publish.ValidationError):
        publish.merge_into_mor(
            spark, root, "t",
            spark.createDataFrame([(1, None, "ok")], "k long, value long, status string"),
        )
    with pytest.raises(ValueError, match="referenced by constraints"):
        publish.drop_column(spark, root, "t", "status")
    publish.set_constraints(root, "t", [])
    publish.drop_column(spark, root, "t", "status")  # now allowed


def test_rewrites_skip_revalidation_but_carry_constraints(spark, tmp_path):
    root = _store(spark, tmp_path)
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame([(2, 7, "hold")], "k long, v long, status string"),
    )
    publish.compact(spark, root, "t")
    entry = publish.current_manifest(root)["tables"]["t"]
    assert entry.get("constraints"), "compact must carry constraints"
    assert entry.get("rewrite_of") is not None
    # still enforced after the rewrite
    with pytest.raises(publish.ValidationError):
        publish.merge_into_mor(
            spark, root, "t",
            spark.createDataFrame([(3, 99999, "ok")], "k long, v long, status string"),
        )


def test_set_constraints_rejects_unknown_kinds(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(spark, {"t": _t(spark)}, root)
    with pytest.raises(ValueError, match="kind must be one of"):
        publish.set_constraints(root, "t", [["no_such_kind", "v"]])
