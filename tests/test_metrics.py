"""A7 observation-based metrics: counters ride the action, no second scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.operators.metrics import with_row_metrics
from tests.conftest import SF_DIR


def test_with_row_metrics_counts_the_executed_pass(spark):
    orders = Catalog(spark, SF_DIR).table("orders").filter(F.col("o_orderkey") % 2 == 0)
    instrumented, obs = with_row_metrics(
        orders, F.round(F.sum("o_totalprice"), 2).alias("total_price")
    )
    n = instrumented.count()  # the action that carries the observation
    got = obs.get
    assert got["rows_seen"] == n
    expected_total = orders.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    assert got["total_price"] == expected_total
