"""A4 pivot-value discovery: the distinct-scan producing the dynamic
column list + the reference's ProductCategory|cat|field naming scheme
(src/EcomProvider.cs:352-364, src/EcomSourceReader.cs:267-279)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.operators.pivot import (
    category_field_columns,
    discover_pivot_values,
    pivot_eav,
)


def test_discovery_sorted_distinct_nonnull(spark):
    eav = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "b"), (4, None), (5, "c")],
        "id int, k string",
    )
    assert discover_pivot_values(eav, F.col("k")) == ["a", "b", "c"]


def test_category_field_naming_scheme(spark):
    eav = spark.createDataFrame(
        [("P1", "CAT1", "Color", "red"), ("P2", "CAT1", "Size", "L"),
         ("P3", "CAT2", "Color", "blue"), ("P4", "CAT1", "Color", "green")],
        "product_id string, cat string, field string, val string",
    )
    cols = category_field_columns(eav, "cat", "field")
    assert cols == [
        "ProductCategory|CAT1|Color",
        "ProductCategory|CAT1|Size",
        "ProductCategory|CAT2|Color",
    ]
    # discovered columns feed pivot_eav directly (the reference's
    # PIVOT ... IN (<discovered>) shape)
    wide = pivot_eav(
        eav.withColumn("k", F.concat_ws("|", F.lit("ProductCategory"), "cat", "field")),
        ["product_id"], "k", cols, F.max("val"),
    )
    assert set(wide.columns) == {"product_id", *cols}


def test_discovery_cardinality_guard(spark):
    big = spark.range(50).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="more than 10 distinct"):
        discover_pivot_values(big, F.col("k"), max_values=10)


def test_discovery_memoized_per_cache_key(spark):
    """With a cache_key the distinct-scan runs once per key: a second build
    returns the memoized list without touching the (changed) source, and a
    different key re-scans.  clear_discovery_cache() resets."""
    from dataintegration_ecomprovider_spark.operators.pivot import (
        clear_discovery_cache,
    )

    clear_discovery_cache()
    try:
        eav1 = spark.createDataFrame([("a",), ("b",)], "k string")
        eav2 = spark.createDataFrame([("z",)], "k string")
        key = ("test", "k")
        assert discover_pivot_values(eav1, F.col("k"), cache_key=key) == ["a", "b"]
        # same key: memo wins even though the source frame differs
        assert discover_pivot_values(eav2, F.col("k"), cache_key=key) == ["a", "b"]
        # different key: real scan
        assert discover_pivot_values(eav2, F.col("k"), cache_key=("test", "k2")) == ["z"]
        # no key: never cached
        assert discover_pivot_values(eav2, F.col("k")) == ["z"]
        clear_discovery_cache()
        assert discover_pivot_values(eav2, F.col("k"), cache_key=key) == ["z"]
    finally:
        clear_discovery_cache()
