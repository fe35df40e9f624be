"""Case-insensitive key matching + duplicate-staging-key guard in the merge
algebra — the reference's SQL Server collation semantics (OrdinalIgnoreCase,
src/EcomDestinationWriter.cs:50-52, :1053) and its duplicate-key failure
contract ("Subquery returned more than 1 value" → duplicate ProductNumber
rows, src/EcomProvider.cs:1052-1053)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from dataintegration_ecomprovider_spark.operators import merge


def _tables(spark):
    dest = spark.createDataFrame(
        [("Widget-A", 1, "old"), ("widget-b", 2, "old"), ("GADGET", 3, "old")],
        "k string, v int, src string",
    )
    staging = spark.createDataFrame(
        [("WIDGET-A", 10, "new"), ("Widget-B", 20, "new"), ("fresh", 40, "new")],
        "k string, v int, src string",
    )
    return dest, staging


def test_case_variant_keys_update_not_insert(spark):
    dest, staging = _tables(spark)
    out = merge.upsert(dest, staging, ["k"], case_insensitive=True)
    rows = {r.k: (r.v, r.src) for r in out.collect()}
    # WIDGET-A/Widget-B matched case-insensitively → UPDATE, keeping the
    # DEST key casing (an UPDATE never rewrites the PK)
    assert rows == {
        "Widget-A": (10, "new"),
        "widget-b": (20, "new"),
        "GADGET": (3, "old"),
        "fresh": (40, "new"),
    }
    # case-SENSITIVE comparison would instead insert the case variants
    cs = merge.upsert(dest, staging, ["k"], case_insensitive=False)
    assert cs.count() == 6


def test_delete_family_case_insensitive(spark):
    dest, staging = _tables(spark)
    gone = merge.delete_incoming(dest, staging, ["k"], case_insensitive=True)
    assert {r.k for r in gone.collect()} == {"GADGET"}
    kept = merge.remove_missing(dest, staging, ["k"], case_insensitive=True)
    assert {r.k for r in kept.collect()} == {"Widget-A", "widget-b"}
    soft = merge.deactivate_missing(
        dest, staging, ["k"], {"src": F.lit("inactive")}, case_insensitive=True
    )
    assert {r.k: r.src for r in soft.collect()} == {
        "Widget-A": "old", "widget-b": "old", "GADGET": "inactive",
    }


def test_duplicate_staging_key_raises(spark):
    dest, _ = _tables(spark)
    dup = spark.createDataFrame(
        [("X1", 1, "a"), ("X1", 2, "b"), ("ok", 3, "c")],
        "k string, v int, src string",
    )
    out = merge.upsert(dest, dup, ["k"], validate_unique=True)
    with pytest.raises(Exception, match="duplicate staging key"):
        out.collect()
    # case-variant duplicates count as duplicates under ci collation
    ci_dup = spark.createDataFrame(
        [("X1", 1, "a"), ("x1", 2, "b")], "k string, v int, src string"
    )
    ci_out = merge.upsert(
        dest, ci_dup, ["k"], validate_unique=True, case_insensitive=True
    )
    with pytest.raises(Exception, match="duplicate staging key"):
        ci_out.collect()
    # ...but pass the case-SENSITIVE check
    assert merge.upsert(dest, ci_dup, ["k"], validate_unique=True).count() == 5


def test_unique_staging_passes_guard(spark):
    dest, staging = _tables(spark)
    out = merge.upsert(
        dest, staging, ["k"], validate_unique=True, case_insensitive=True
    )
    assert out.count() == 4


def test_single_pass_matches_two_pass(spark):
    """The single-pass full-outer upsert must agree with the reference's
    literal two-statement form (UPDATE join + INSERT anti-join)."""
    dest, staging = _tables(spark)
    for kwargs in (
        {},
        {"insert_new": False},
        {"update_existing": False},
        {"set_on_update": {"src": F.lit("upd")}},
        {"set_on_insert": {"src": F.lit("ins")}},
    ):
        one = merge.upsert(dest, staging, ["k"], **kwargs)
        two = merge.upsert_two_pass(dest, staging, ["k"], **kwargs)
        assert one.exceptAll(two).count() == 0
        assert two.exceptAll(one).count() == 0
