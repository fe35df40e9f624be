"""Bucketed-join plan proof: joining two tables bucketed on the join key
runs WITHOUT a shuffle on either side (the Exchange disappears), and the
result matches the plain join."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.operators.bucketing import bucketed, write_bucketed
from tests.conftest import SF_DIR


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_exchange_free(spark, no_broadcast):
    cat = Catalog(spark, SF_DIR)
    li = cat.table("lineitem").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    orders = cat.table("orders")

    write_bucketed(li, "bt_lineitem_agg", ["l_orderkey"], num_buckets=8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bt_orders", ["l_orderkey"], num_buckets=8,
    )
    a, b = bucketed(spark, "bt_lineitem_agg"), bucketed(spark, "bt_orders")

    joined = a.join(b, "l_orderkey")
    plan = _plan(joined)
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"

    # and the shuffle-free plan computes the same rows as the plain join
    plain = li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    )
    assert joined.count() == plain.count()
    assert joined.exceptAll(plain).count() == 0

    # aggregation on the bucket key is also exchange-free
    agg_plan = _plan(a.groupBy("l_orderkey").agg(F.sum("qty")))
    assert "Exchange" not in agg_plan

    spark.sql("DROP TABLE IF EXISTS bt_lineitem_agg")
    spark.sql("DROP TABLE IF EXISTS bt_orders")
