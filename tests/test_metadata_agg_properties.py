"""Hypothesis property test for metadata_aggregate's exactness contract:
over randomized frames (nulls, strings straddling the 32-char truncation
cap, random partition counts, random predicates) the metadata path must
either REFUSE (None) or agree EXACTLY with the scan — never a third
option.  publish_tables is slow, so the generated space is kept small."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from dataintegration_ecomprovider_spark.plans import publish

VALS = st.lists(
    st.tuples(
        st.integers(0, 50),
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        st.one_of(st.none(), st.text("ab", min_size=0, max_size=40)),
    ),
    min_size=1,
    max_size=30,
)

AGGS = [
    ("count",),
    ("min", "x"), ("max", "x"), ("null_count", "x"),
    ("min", "s"), ("max", "s"), ("null_count", "s"),
]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=VALS,
    nparts=st.integers(1, 4),
    bound=st.integers(0, 50),
)
def test_metadata_agrees_with_scan_or_refuses(spark, tmp_path_factory, rows, nparts, bound):
    seen, dedup = set(), []
    for k, x, s in rows:
        if k not in seen:
            seen.add(k)
            dedup.append((k, x, s))
    df = spark.createDataFrame(
        dedup, "k long, x double, s string"
    ).repartition(nparts)
    root = str(tmp_path_factory.mktemp("mdprop") / "store")
    publish.publish_tables(
        spark, {"t": df}, root,
        table_keys={"t": ["k"]}, stats_columns={"t": ["k", "x", "s"]},
    )
    for where in ([], [("k", "<=", bound)]):
        md = publish.metadata_aggregate(root, "t", AGGS, where=where)
        got, src = publish.aggregate_table(
            spark, root, "t", AGGS, where=where
        )
        if md is None:
            assert src == "scan"
        else:
            assert src == "metadata"
        # the contract: whatever path answered, the answer equals the
        # scan's ground truth
        scan_df = publish.scan_table(spark, root, "t", where)
        import pyspark.sql.functions as F

        row = scan_df.agg(
            F.count(F.lit(1)).alias("count"),
            F.min("x").alias("min_x"), F.max("x").alias("max_x"),
            F.sum(F.when(F.col("x").isNull(), 1).otherwise(0))
            .cast("long").alias("null_count_x"),
            F.min("s").alias("min_s"), F.max("s").alias("max_s"),
            F.sum(F.when(F.col("s").isNull(), 1).otherwise(0))
            .cast("long").alias("null_count_s"),
        ).collect()[0].asDict()
        if row["count"] == 0:
            row["null_count_x"] = row["null_count_s"] = 0
        assert got == row, (where, src)
