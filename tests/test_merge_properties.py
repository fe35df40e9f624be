"""Hypothesis property tests for the merge algebra (SURVEY §2.6) — the
invariants the reference's transaction guarantees, checked over generated
key/value tables instead of just the fixture slices."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.operators import merge

ROWS = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 5), st.text("abc", min_size=0, max_size=3)),
    min_size=0,
    max_size=25,
)


def _df(spark, rows):
    # dedupe keys (the merge contract requires unique staging keys)
    seen, out = set(), []
    for k, v, s in rows:
        if k not in seen:
            seen.add(k)
            out.append((k, v, s))
    return spark.createDataFrame(out or [(0, 0, "")], "k int, v int, s string")


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(dest_rows=ROWS, staging_rows=ROWS)
def test_upsert_key_algebra_and_idempotence(spark, dest_rows, staging_rows):
    dest, staging = _df(spark, dest_rows), _df(spark, staging_rows)
    out = merge.upsert(dest, staging, ["k"])
    out_keys = {r.k for r in out.select("k").collect()}
    dest_keys = {r.k for r in dest.select("k").collect()}
    staging_keys = {r.k for r in staging.select("k").collect()}
    # keys(result) == keys(dest) ∪ keys(staging); no duplicates introduced
    assert out_keys == dest_keys | staging_keys
    assert out.count() == len(out_keys)
    # every staged key carries staging's values (U1 update wins)
    staged_vals = {r.k: (r.v, r.s) for r in staging.collect()}
    for r in out.collect():
        if r.k in staged_vals:
            assert (r.v, r.s) == staged_vals[r.k]
    # idempotence: re-running the same merge changes nothing (the
    # reference's re-run incremental model)
    again = merge.upsert(out, staging, ["k"])
    assert again.exceptAll(out).count() == 0 and out.exceptAll(again).count() == 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(dest_rows=ROWS, staging_rows=ROWS)
def test_delete_family_partitions_dest(spark, dest_rows, staging_rows):
    dest, staging = _df(spark, dest_rows), _df(spark, staging_rows)
    kept = merge.remove_missing(dest, staging, ["k"])
    dropped = merge.delete_incoming(dest, staging, ["k"])
    # remove_missing keeps exactly the semi-join; delete_incoming the anti —
    # together they partition dest
    assert kept.count() + dropped.count() == dest.count()
    staging_keys = {r.k for r in staging.select("k").collect()}
    for r in kept.collect():
        assert r.k in staging_keys
    for r in dropped.collect():
        assert r.k not in staging_keys


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(dest_rows=ROWS, staging_rows=ROWS)
def test_deactivate_missing_preserves_rows(spark, dest_rows, staging_rows):
    dest, staging = _df(spark, dest_rows), _df(spark, staging_rows)
    out = merge.deactivate_missing(dest, staging, ["k"], flags={"s": F.lit("X")})
    # soft delete never changes cardinality or keys
    assert out.count() == dest.count()
    staging_keys = {r.k for r in staging.select("k").collect()}
    orig = {r.k: r.s for r in dest.collect()}
    for r in out.collect():
        assert r.s == ("X" if r.k not in staging_keys else orig[r.k])
