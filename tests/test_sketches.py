"""Sketch-aggregate error bounds: HLL++ distinct counts within rsd, the
quantile sketch within tolerance of the exact percentile.

The oracle-checked query surfaces the bound as boolean columns
(hll_within_5pct / p50_within_5pct — both engines assert their own sketch);
these tests pin the raw estimates to tighter bounds than the query's 5%.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.plans.read_queries import q_sketch_aggregates
from tests.conftest import SF_DIR


def _raw_estimates(spark):
    li = Catalog(spark, SF_DIR).table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("hll"),
        F.expr("percentile(l_quantity, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("p50"),
    ).collect()


def test_sketch_estimates_within_bounds(spark):
    rows = _raw_estimates(spark)
    assert rows
    for r in rows:
        assert r.exact_distinct > 0
        rel_err = abs(r.hll - r.exact_distinct) / r.exact_distinct
        assert rel_err < 0.10, f"{r.l_returnflag}: HLL error {rel_err:.3f}"
        # the quantile sketch at accuracy 10000 is near-exact on this data
        assert abs(r.p50 - r.exact_p50) <= max(1.0, 0.05 * r.exact_p50)


def test_sketch_query_bounds_hold(spark):
    rows = q_sketch_aggregates(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.hll_within_5pct and r.p50_within_5pct, r


def test_sketch_estimates_deterministic(spark):
    a = {r.l_returnflag: (r.hll, r.p50) for r in _raw_estimates(spark)}
    b = {r.l_returnflag: (r.hll, r.p50) for r in _raw_estimates(spark)}
    assert a == b
