"""Sketch-aggregate error bounds: HLL++ distinct counts within rsd, the
quantile sketch within tolerance of the exact percentile."""

from __future__ import annotations

from dataintegration_ecomprovider_spark.plans.read_queries import q_sketch_aggregates
from tests.conftest import SF_DIR


def test_sketch_estimates_within_bounds(spark):
    rows = q_sketch_aggregates(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        exact, approx = r.exact_distinct_parts, r.approx_distinct_parts
        assert exact > 0
        rel_err = abs(approx - exact) / exact
        assert rel_err < 0.10, f"{r.l_returnflag}: HLL error {rel_err:.3f}"
        # the quantile sketch at accuracy 10000 is near-exact on this data
        assert abs(r.approx_p50_qty - r.exact_p50_qty) <= max(1.0, 0.05 * r.exact_p50_qty)


def test_sketch_estimates_deterministic(spark):
    a = {r.l_returnflag: (r.approx_distinct_parts, r.approx_p50_qty)
         for r in q_sketch_aggregates(spark, SF_DIR).collect()}
    b = {r.l_returnflag: (r.approx_distinct_parts, r.approx_p50_qty)
         for r in q_sketch_aggregates(spark, SF_DIR).collect()}
    assert a == b
