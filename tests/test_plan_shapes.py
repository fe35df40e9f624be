"""Physical-plan shape guards for the scale properties the engine relies
on: predicate/projection pushdown to the parquet scan, broadcast dimension
joins, one staging scan in the single-pass upsert, shuffle-free map-only
sampling.  These assert PROPERTIES of the executed plan, not its exact
text, so they survive Catalyst version drift."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.operators import merge
from dataintegration_ecomprovider_spark.operators.export_views import products_export_view
from dataintegration_ecomprovider_spark.plans.read_queries import q_scan_projection
from dataintegration_ecomprovider_spark.llm.sampling import split_assign
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushes_filter_and_prunes_columns(spark):
    df = q_scan_projection(spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    # at least one real pushed filter, not an empty list
    assert not re.search(r"PushedFilters: \[\s*\]", plan), plan[:1500]
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in scan"
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    # the projection needs few columns; the scan must not read the table wide
    assert len(read_cols) <= 6, f"scan reads too many columns: {read_cols}"


def test_products_export_joins_broadcast(spark):
    df = products_export_view(Catalog(spark, SF_DIR))
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # DIMENSION joins must not fall back to shuffle joins; the only
    # shuffle join allowed is the per-product aggregate join-back keyed on
    # the product key (both sides are product-sized at scale, so SMJ/
    # shuffled-hash is the correct strategy there)
    for line in _plan(df).splitlines():
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            assert "partkey" in line, f"dim join shuffles: {line.strip()}"


def test_single_pass_upsert_scans_staging_once(spark):
    cat = Catalog(spark, SF_DIR)
    orders = cat.table("orders")
    dest = orders.filter(F.col("o_orderkey") % 3 != 0)
    staging = orders.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_orderstatus", F.lit("U")
    )
    one = _plan(merge.upsert(dest, staging, ["o_orderkey"]))
    two = _plan(merge.upsert_two_pass(dest, staging, ["o_orderkey"]))
    # orders.parquet appears once per scan subtree: single-pass = dest +
    # staging = 2 scans; two-pass re-reads staging (and dest) = more
    assert one.count("orders.parquet") == 2, one[:2000]
    assert two.count("orders.parquet") > 2


def test_split_assign_is_map_only(spark):
    docs = Catalog(spark, SF_DIR).table("documents")
    out = split_assign(docs, "doc_id", val_frac=0.1, test_frac=0.1)
    plan = _plan(out)
    assert "Exchange" not in plan, f"sampling shuffles:\n{plan[:2000]}"
