"""Surrogate-ID allocation (operators/surrogate.py).

The interesting property after the scale refactor: `global_rank` must
produce the exact 1..N total-order ranks WITHOUT a single-partition
window over the data — the only global window allowed is the one over
the per-partition counts (≤ num_partitions rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.operators import surrogate


def test_global_rank_is_total_order(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 5000).alias("k"), F.col("id").alias("payload")
    )
    out = surrogate.global_rank(df, [F.col("k")], "r", num_partitions=8)
    rows = sorted((r["k"], r["r"]) for r in out.collect())
    # k is a permutation of 0..4999, so rank must be k+1 exactly
    assert rows == [(k, k + 1) for k in range(5000)]


def test_global_rank_stable_across_input_partitioning(spark):
    base = spark.range(0, 1000).select((F.col("id") * 7 % 1000).alias("k"))
    a = surrogate.global_rank(base.repartition(3), [F.col("k")], "r", num_partitions=4)
    b = surrogate.global_rank(base.repartition(17), [F.col("k")], "r", num_partitions=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_global_rank_no_single_partition_data_window(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    out = surrogate.global_rank(df, [F.col("k")], "r", num_partitions=4)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the row_number window over the data must be partitioned by the
    # range-bucket id — a windowspec without _gr_pid would mean the old
    # single-partition funnel came back.  (A SinglePartition exchange does
    # remain, but only under the counts aggregate: ≤ num_partitions rows.)
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "_gr_pid" in line, f"global row_number window: {line}"
    assert "Exchange rangepartitioning" in plan


def test_assign_surrogate_ids_continues_high_water(spark):
    df = spark.createDataFrame(
        [("P1", "a"), (None, "b"), ("", "c"), (" ", "d"), ("P2", "e")],
        ["pid", "name"],
    )
    out = {
        r["name"]: r["pid"]
        for r in surrogate.assign_surrogate_ids(
            df, "pid", "ImportedPROD", [F.col("name")], offset=41, num_partitions=3
        ).collect()
    }
    assert out["a"] == "P1" and out["e"] == "P2"  # keyed rows untouched
    # b, c, d need ids; ranked by name → 42, 43, 44
    assert (out["b"], out["c"], out["d"]) == (
        "ImportedPROD42",
        "ImportedPROD43",
        "ImportedPROD44",
    )
