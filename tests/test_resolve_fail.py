"""E5 failure mode — FailOnMissingGroups: rows referencing missing
dimension values abort with a row dump (reference
src/EcomDestinationWriter.cs:4566-4590, src/EcomProvider.cs:1002-1005)."""

from __future__ import annotations

import pytest

from dataintegration_ecomprovider_spark.operators.resolve import (
    MissingReferencesError,
    fail_on_missing,
)


@pytest.fixture()
def groups(spark):
    return spark.createDataFrame(
        [("GRP1", "Shoes"), ("GRP2", "Hats")], "group_id string, group_name string"
    )


def test_missing_groups_raise_with_row_dump(spark, groups):
    staged = spark.createDataFrame(
        [
            ("P1", "GRP1", 10),
            ("P2", "NOPE", 20),
            ("P3", "grp2", 30),   # case-variant → resolves (ci collation)
            ("P4", "GONE", 40),
        ],
        "product_id string, group_ref string, sorting int",
    )
    with pytest.raises(MissingReferencesError) as exc:
        fail_on_missing(staged, groups, "group_ref", "group_id")
    err = exc.value
    assert {r["product_id"] for r in err.rows} == {"P2", "P4"}
    # the message carries the reference's per-row dump format
    assert 'Failed row: [product_id: "P2"]' in str(err)
    assert '[group_ref: "NOPE"]' in str(err)


def test_all_resolved_passes_through(spark, groups):
    staged = spark.createDataFrame(
        [("P1", "GRP1"), ("P2", "grp2"), ("P3", None)],
        "product_id string, group_ref string",
    )
    out = fail_on_missing(staged, groups, "group_ref", "group_id")
    assert out is staged  # unchanged DataFrame, no new lineage


def test_case_sensitive_mode_flags_variants(spark, groups):
    staged = spark.createDataFrame(
        [("P1", "grp1")], "product_id string, group_ref string"
    )
    with pytest.raises(MissingReferencesError):
        fail_on_missing(staged, groups, "group_ref", "group_id", case_insensitive=False)


def test_dump_limit_bounds_payload(spark, groups):
    staged = spark.createDataFrame(
        [(f"P{i}", f"MISSING{i}") for i in range(25)],
        "product_id string, group_ref string",
    )
    with pytest.raises(MissingReferencesError) as exc:
        fail_on_missing(staged, groups, "group_ref", "group_id", dump_limit=5)
    assert len(exc.value.rows) == 5
    assert "more rows omitted" in str(exc.value)
