"""Version-diff (CDC) + small-file compaction over the versioned store.

read_changes answers "what changed between version A and B" as tagged
insert/update/delete rows — the incremental feed the reference approximates
by idempotent job re-runs (IsFirstJobRun, src/EcomProvider.cs:25, :937-966).
compact bounds the per-micro-batch file accumulation of stream_into_store
(one version per batch) the way Delta OPTIMIZE does.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.plans import publish

from tests.conftest import SF_DIR, assert_frames_match


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_read_changes_tags_insert_update_delete(spark, tmp_path):
    root = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "id bigint, name string, val double",
    )
    v2 = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", None), (4, "d", 40.0)],
        "id bigint, name string, val double",
    )
    publish.publish_tables(spark, {"t": v1}, root)
    publish.publish_tables(spark, {"t": v2}, root)

    changes = publish.read_changes(spark, root, "t", 1, 2, keys=["id"])
    assert changes.columns == ["id", "name", "val", "change_type"]
    assert _rows(changes) == {
        (1, "a", 10.0, "delete"),   # old row's values survive on delete
        (2, "b", 25.0, "update"),
        (4, "d", 40.0, "insert"),
    }
    # row 3 is unchanged (null == null is null-safe-equal) and excluded

    # to_version defaults to the current version
    assert _rows(publish.read_changes(spark, root, "t", 1, keys=["id"])) == _rows(changes)


def test_read_changes_null_transitions_are_updates(spark, tmp_path):
    root = str(tmp_path / "store")
    v1 = spark.createDataFrame([(1, None), (2, "x")], "id bigint, name string")
    v2 = spark.createDataFrame([(1, "now"), (2, None)], "id bigint, name string")
    publish.publish_tables(spark, {"t": v1}, root)
    publish.publish_tables(spark, {"t": v2}, root)
    changes = publish.read_changes(spark, root, "t", 1, 2, keys=["id"])
    assert _rows(changes) == {(1, "now", "update"), (2, None, "update")}


def test_read_changes_case_insensitive_keys(spark, tmp_path):
    """A key that only changed casing must diff as ONE update (new casing
    reported), not delete+insert — same ci() normalization as the merge
    family (operators/merge._k)."""
    root = str(tmp_path / "store")
    v1 = spark.createDataFrame([("Widget", 1), ("Gadget", 2)], "sku string, qty int")
    v2 = spark.createDataFrame([("WIDGET", 5), ("Gadget", 2)], "sku string, qty int")
    publish.publish_tables(spark, {"t": v1}, root)
    publish.publish_tables(spark, {"t": v2}, root)

    ci = publish.read_changes(
        spark, root, "t", 1, 2, keys=["sku"], case_insensitive=True
    )
    assert _rows(ci) == {("WIDGET", 5, "update")}

    cs = publish.read_changes(spark, root, "t", 1, 2, keys=["sku"])
    assert _rows(cs) == {("Widget", 1, "delete"), ("WIDGET", 5, "insert")}


def test_read_changes_requires_keys_and_valid_version(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": spark.createDataFrame([(1,)], "id bigint")}, root
    )
    with pytest.raises(ValueError, match="key columns"):
        publish.read_changes(spark, root, "t", 1, 1)
    with pytest.raises(ValueError, match="key columns"):
        publish.read_changes(spark, root, "t", 1, 1, keys=["nope"])
    with pytest.raises(KeyError):
        publish.read_changes(spark, root, "t", 7, keys=["id"])


def test_read_changes_composes_with_run_job(spark, tmp_path):
    """Diff of two job runs == the second run's staged deltas: publish the
    pre-job state as v1, run the U1-U3 job, publish the result as v2 —
    read_changes reports exactly the rows the mapping touched."""
    from dataintegration_ecomprovider_spark.plans.pipeline import (
        ColumnRule, MappingSpec, run_job,
    )

    root = str(tmp_path / "store")
    cat = Catalog(spark, SF_DIR)
    dest0 = cat.table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    ).filter(F.col("o_orderkey") % 3 != 0)
    publish.publish_tables(spark, {"orders": dest0}, root)

    spec = MappingSpec(
        source_table="orders",
        dest_table="orders",
        columns=(
            ColumnRule("o_orderkey", "o_orderkey", is_key=True),
            ColumnRule("o_custkey", "o_custkey"),
            ColumnRule("o_orderstatus", script="constant", script_value="Z"),
        ),
        conditional=F.col("o_orderkey") % 2 == 0,
    )
    state = run_job(cat, {"orders": publish.read_table(spark, root, "orders")}, [spec])
    publish.publish_tables(spark, {"orders": state["orders"]}, root)

    changes = publish.read_changes(spark, root, "orders", 1, 2, keys=["o_orderkey"])
    got = changes.groupBy("change_type").count().collect()
    by_type = {r["change_type"]: r["count"] for r in got}

    orders = cat.table("orders")
    n_insert = orders.filter(
        (F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") % 2 == 0)
    ).count()
    n_update = orders.filter(
        (F.col("o_orderkey") % 3 != 0)
        & (F.col("o_orderkey") % 2 == 0)
        & (F.col("o_orderstatus") != "Z")
    ).count()
    assert by_type.get("insert", 0) == n_insert
    assert by_type.get("update", 0) == n_update
    assert "delete" not in by_type  # an upsert never deletes
    assert changes.filter(
        (F.col("change_type") == "update") & (F.col("o_orderstatus") != "Z")
    ).count() == 0


def test_version_diff_query_matches_oracle(spark, oracle):
    from dataintegration_ecomprovider_spark.plans.write_queries import (
        ORACLE_VERSION_DIFF, q_version_diff,
    )

    spark_pdf = q_version_diff(spark, SF_DIR).toPandas()
    oracle_pdf = oracle.execute(ORACLE_VERSION_DIFF).df()
    assert_frames_match(spark_pdf, oracle_pdf, "u12_version_diff")


def test_compact_plain_table_row_identical_bounded_files(spark, tmp_path):
    """Many small versions (the stream_into_store pattern: one per
    micro-batch) → compact → same rows, fewer files, new version; the
    pre-compact version stays readable (time travel) until vacuumed."""
    root = str(tmp_path / "store")
    orders = Catalog(spark, SF_DIR).table("orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    publish.publish_tables(spark, {"orders": orders.filter(F.col("o_orderkey") % 5 == 0).repartition(4)}, root)
    for m in range(1, 5):
        publish.merge_into(
            spark, root, "orders",
            orders.filter(F.col("o_orderkey") % 5 == m).repartition(4),
            ["o_orderkey"],
        )
    # fragment the current version the way a many-partition shuffle write
    # would at scale (AQE coalesces this tiny fixture to one file otherwise)
    publish.publish_tables(
        spark, {"orders": publish.read_table(spark, root, "orders").repartition(16)}, root
    )
    before = publish.read_table(spark, root, "orders")
    n_before = before.count()
    v_before = publish.current_manifest(root)["version"]

    stats = publish.compact(spark, root, "orders", target_files=2)
    assert stats["files_after"] <= 2 < stats["files_before"]
    assert stats["version"] == v_before + 1

    after = publish.read_table(spark, root, "orders")
    assert after.count() == n_before
    assert _rows(after) == _rows(publish.read_table_at(spark, root, "orders", v_before))
    # compaction is just another version: vacuum reclaims the fragmented one
    publish.vacuum(spark, root, keep_versions=1)
    assert publish.read_table(spark, root, "orders").count() == n_before


def test_compact_bucketed_table_preserves_exchange_free_merge(spark, tmp_path):
    """Compacting a bucketed table must preserve the bucketed layout: the
    next merge against it still plans with no Exchange on the dest side."""
    root = str(tmp_path / "store")
    orders = Catalog(spark, SF_DIR).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    publish.publish_tables(
        spark, {"orders": orders.filter(F.col("o_orderkey") % 2 == 0)},
        root, bucket_keys={"orders": ["o_orderkey"]}, num_buckets=8,
    )
    publish.merge_into(
        spark, root, "orders", orders.filter(F.col("o_orderkey") % 3 == 0),
        ["o_orderkey"], bucketed=True, num_buckets=8,
    )
    n = publish.read_table(spark, root, "orders").count()

    stats = publish.compact(spark, root, "orders")
    entry = publish.current_manifest(root)["tables"]["orders"]
    assert isinstance(entry, dict) and entry["bucket_keys"] == ["o_orderkey"]
    assert stats["files_after"] <= 8
    assert publish.read_table(spark, root, "orders").count() == n

    from dataintegration_ecomprovider_spark.operators import bucketing, merge

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dest = publish.read_table(spark, root, "orders")
        staging = bucketing.stage_for_merge(
            spark, orders.filter(F.col("o_orderkey") % 7 == 0),
            ["o_orderkey"], "tcdc_stg", 8,
        )
        plan = merge.upsert(dest, staging, ["o_orderkey"])._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS tcdc_stg")


def test_vacuum_commits_manifest_before_deleting_data(spark, tmp_path, monkeypatch):
    """Crash-ordering contract: the pruned manifest is committed BEFORE any
    data directory is removed, so a crash mid-vacuum can only orphan
    unreferenced directories — never leave the manifest pointing at deleted
    data (read_table_at keeps its KeyError contract)."""
    import shutil as _shutil

    root = str(tmp_path / "store")
    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    publish.publish_tables(spark, {"t": df}, root)
    publish.publish_tables(spark, {"t": spark.createDataFrame([(2, "b")], "id bigint, name string")}, root)
    publish.publish_tables(spark, {"t": spark.createDataFrame([(3, "c")], "id bigint, name string")}, root)

    calls = []
    real_rmtree = _shutil.rmtree

    def crashing_rmtree(path, *a, **kw):
        calls.append(path)
        raise RuntimeError("simulated crash during delete")

    monkeypatch.setattr(_shutil, "rmtree", crashing_rmtree)
    with pytest.raises(RuntimeError, match="simulated crash"):
        publish.vacuum(spark, root, keep_versions=1)
    monkeypatch.setattr(_shutil, "rmtree", real_rmtree)

    # the manifest no longer references the pruned versions (committed
    # first), and the surviving current version is intact
    m = publish.current_manifest(root)
    assert m.get("history", []) == []
    with pytest.raises(KeyError):
        publish.read_table_at(spark, root, "t", 1)
    assert _rows(publish.read_table(spark, root, "t")) == {(3, "c")}


def test_collect_orphans_reclaims_unreferenced_only(spark, tmp_path):
    """Orphan collection: a crashed publish's staging dir (unreferenced by
    any committed version) is reclaimed; referenced dirs and too-recent
    dirs survive."""
    import os
    import shutil

    root = str(tmp_path / "store")
    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    publish.publish_tables(spark, {"t": df}, root)

    # simulate a publish that crashed before its manifest swap: a staged
    # directory exists but no manifest references it
    entry = publish.current_manifest(root)["tables"]["t"]
    live_path = entry["path"] if isinstance(entry, dict) else entry
    orphan = os.path.join(root, "data", "deadbeef-crashed", "t")
    shutil.copytree(live_path, orphan)

    # too recent: protected by the in-flight guard
    res = publish.collect_orphans(spark, root, min_age_seconds=3600)
    assert res["removed_paths"] == []
    assert os.path.isdir(orphan)

    # old enough: reclaimed; the committed version is untouched
    res = publish.collect_orphans(spark, root, min_age_seconds=0)
    assert res["removed_paths"] == [os.path.normpath(orphan)]
    assert not os.path.exists(os.path.dirname(orphan))  # empty txid dir pruned
    assert _rows(publish.read_table(spark, root, "t")) == {(1, "a")}

    # idempotent
    assert publish.collect_orphans(spark, root, min_age_seconds=0)["removed_paths"] == []


def test_collect_orphans_spares_history_versions(spark, tmp_path):
    """Historical (time-travelable) versions are referenced — never
    collected."""
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": spark.createDataFrame([(1,)], "id bigint")}, root
    )
    publish.publish_tables(
        spark, {"t": spark.createDataFrame([(2,)], "id bigint")}, root
    )
    assert publish.collect_orphans(spark, root, min_age_seconds=0)["removed_paths"] == []
    assert _rows(publish.read_table_at(spark, root, "t", 1)) == {(1,)}


def test_apply_changes_reconstructs_every_version(spark, tmp_path):
    """CDC completeness: replaying read_changes(v-1, v) onto a replica of
    version v-1 reproduces version v EXACTLY, for every step in a chain of
    merges — an incremental consumer never needs a full re-read."""
    root = str(tmp_path / "store")
    orders = Catalog(spark, SF_DIR).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    publish.publish_tables(
        spark, {"orders": orders.filter(F.col("o_orderkey") % 2 == 0)}, root
    )
    publish.merge_into(
        spark, root, "orders",
        orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
            "o_orderstatus", F.lit("M")
        ),
        ["o_orderkey"],
    )
    # a version with deletes too: keep only % 5 == 0
    keep = publish.read_table(spark, root, "orders").filter(
        F.col("o_orderkey") % 5 == 0
    )
    publish.publish_tables(spark, {"orders": keep}, root)

    replica = publish.read_table_at(spark, root, "orders", 1)
    n_versions = publish.current_manifest(root)["version"]
    for v in range(2, n_versions + 1):
        delta = publish.read_changes(spark, root, "orders", v - 1, v, keys=["o_orderkey"])
        replica = publish.apply_changes(replica, delta, ["o_orderkey"])
        expect = publish.read_table_at(spark, root, "orders", v)
        assert _rows(replica.select("o_orderkey", "o_custkey", "o_orderstatus")) == _rows(
            expect.select("o_orderkey", "o_custkey", "o_orderstatus")
        ), f"replica diverged at version {v}"


def test_merge_into_evolve_schema_widens_table(spark, tmp_path):
    """A batch carrying a NEW column widens the store table (mergeSchema
    semantics): touched rows carry the value, untouched rows null; the
    previous version keeps the narrow schema; read_changes reports the
    widening as updates."""
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark,
        {"t": spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")},
        root,
    )
    batch = spark.createDataFrame(
        [(2, "b2", "eu"), (3, "c", "us")], "id bigint, name string, region string"
    )
    publish.merge_into(spark, root, "t", batch, ["id"], evolve_schema=True)

    now = publish.read_table(spark, root, "t")
    assert set(now.columns) == {"id", "name", "region"}
    assert _rows(now) == {(1, "a", None), (2, "b2", "eu"), (3, "c", "us")}
    assert publish.read_table_at(spark, root, "t", 1).columns == ["id", "name"]

    changes = publish.read_changes(spark, root, "t", 1, 2, keys=["id"])
    # row 1's widened column is null → null-safe-equal to the absent old
    # column → genuinely unchanged, so only the touched rows appear
    assert _rows(changes) == {
        (2, "b2", "eu", "update"),
        (3, "c", "us", "insert"),
    }


def test_upsert_evolve_schema_insert_only_mode(spark):
    """Under insert-only mode a new column populates ONLY inserted rows —
    matched rows are untouched by contract, so their new column is null."""
    from dataintegration_ecomprovider_spark.operators import merge

    dest = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
    staging = spark.createDataFrame(
        [(2, "B", "x"), (3, "c", "y")], "id bigint, name string, extra string"
    )
    out = merge.upsert(
        dest, staging, ["id"], update_existing=False, evolve_schema=True
    )
    assert _rows(out) == {(1, "a", None), (2, "b", None), (3, "c", "y")}


def test_manifest_key_metadata_drives_cdc_and_merge(spark, tmp_path):
    """Keys declared once at publish time (table_keys=...) persist in the
    manifest, carry forward across versions, and become the defaults for
    merge_into and read_changes — no caller-side key bookkeeping."""
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark,
        {"t": spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")},
        root,
        table_keys={"t": ["id"]},
    )
    assert publish.table_keys(root, "t") == ["id"]

    # keys=None resolves from the manifest
    publish.merge_into(
        spark, root, "t",
        spark.createDataFrame([(2, "B"), (3, "c")], "id bigint, name string"),
    )
    # carried forward through the merge's own publish
    assert publish.table_keys(root, "t") == ["id"]
    changes = publish.read_changes(spark, root, "t", 1)
    assert _rows(changes) == {(2, "B", "update"), (3, "c", "insert")}

    # a table with no recorded keys still demands them explicitly
    publish.publish_tables(
        spark, {"u": spark.createDataFrame([(1,)], "id bigint")}, root
    )
    assert publish.table_keys(root, "u") is None
    with pytest.raises(ValueError, match="no recorded keys"):
        publish.merge_into(spark, root, "u", spark.createDataFrame([(2,)], "id bigint"))


def test_bucketed_publish_reports_logical_keys(spark, tmp_path):
    """A bucketed publish on materialized __k_ norm columns still reports
    the LOGICAL key names through table_keys()."""
    from dataintegration_ecomprovider_spark.operators import bucketing

    root = str(tmp_path / "store")
    df = spark.createDataFrame([("Widget", 1)], "sku string, qty int")
    df, bucket_cols = bucketing.norm_bucket_columns(df, ["sku"], case_insensitive=True)
    publish.publish_tables(
        spark, {"t": df}, root, bucket_keys={"t": bucket_cols}, num_buckets=4
    )
    assert publish.table_keys(root, "t") == ["sku"]

    # compaction keeps the keys-carrying bucketed entry intact
    publish.compact(spark, root, "t")
    assert publish.table_keys(root, "t") == ["sku"]
    entry = publish.current_manifest(root)["tables"]["t"]
    assert entry.get("bucket_keys") == bucket_cols


def test_concurrent_publishers_lose_nothing(spark, tmp_path):
    """N threads publishing DIFFERENT tables into one store root: the
    commit lock serializes the manifest chain, so every publish lands —
    no last-writer-wins loss of another table's commit."""
    import threading

    root = str(tmp_path / "store")
    errs = []

    def pub(i: int) -> None:
        try:
            publish.publish_tables(
                spark,
                {f"t{i}": spark.createDataFrame([(i,)], "id bigint")},
                root,
            )
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append(e)

    threads = [threading.Thread(target=pub, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    m = publish.current_manifest(root)
    assert m["version"] == 8
    assert {f"t{i}" for i in range(8)} <= set(m["tables"])


def test_cas_publish_conflict_raises(spark, tmp_path):
    root = str(tmp_path / "store")
    df = spark.createDataFrame([(1,)], "id bigint")
    publish.publish_tables(spark, {"t": df}, root)
    with pytest.raises(publish.ConcurrentPublishError, match="expected 0"):
        publish.publish_tables(spark, {"t": df}, root, expected_version=0)
    # matching expectation commits
    publish.publish_tables(spark, {"t": df}, root, expected_version=1)
    assert publish.current_manifest(root)["version"] == 2


def test_concurrent_merge_into_serializes(spark, tmp_path):
    """Two concurrent merge_into calls on ONE table: CAS + retry means
    neither merge's rows are lost (without it, both would read the same
    base version and the later commit would drop the earlier's updates)."""
    import threading

    root = str(tmp_path / "store")
    publish.publish_tables(
        spark,
        {"t": spark.createDataFrame([(0, "base")], "id bigint, v string")},
        root,
        table_keys={"t": ["id"]},
    )

    errs = []

    def merge(lo: int) -> None:
        try:
            publish.merge_into(
                spark, root, "t",
                spark.createDataFrame(
                    [(lo, f"w{lo}"), (lo + 1, f"w{lo + 1}")], "id bigint, v string"
                ),
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=merge, args=(lo,)) for lo in (10, 20)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    rows = _rows(publish.read_table(spark, root, "t"))
    assert rows == {
        (0, "base"), (10, "w10"), (11, "w11"), (20, "w20"), (21, "w21")
    }
    assert publish.current_manifest(root)["version"] == 3


def test_read_changes_over_bucketed_versions_is_exchange_free(spark, tmp_path):
    """The scale path composes: a store kept bucketed on its key (the
    bucketed merge loop) gives CDC for free — both versions read
    co-located, so the full-outer diff plans with ZERO Exchange."""
    root = str(tmp_path / "store")
    base = Catalog(spark, SF_DIR).table("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    publish.publish_tables(
        spark, {"orders": base.filter(F.col("o_orderkey") % 3 != 0)}, root,
        bucket_keys={"orders": ["o_orderkey"]}, num_buckets=8,
    )
    publish.publish_tables(
        spark, {"orders": base.filter(F.col("o_orderkey") % 4 != 0)}, root,
        bucket_keys={"orders": ["o_orderkey"]}, num_buckets=8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        changes = publish.read_changes(spark, root, "orders", 1, 2, keys=["o_orderkey"])
        plan = changes._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert changes.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# --- hypothesis: diff/apply round-trip over arbitrary frames ---------------
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_CDC_ROWS = st.lists(
    st.tuples(
        st.integers(0, 20),
        st.one_of(st.none(), st.integers(0, 3)),
        st.text("xy", min_size=0, max_size=2),
    ),
    min_size=0,
    max_size=15,
)


def _cdc_df(spark, rows):
    seen, out = set(), []
    for k, v, s in rows:
        if k not in seen:
            seen.add(k)
            out.append((k, v, s))
    return spark.createDataFrame(out or [(99, None, "")], "k int, v int, s string")


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(old_rows=_CDC_ROWS, new_rows=_CDC_ROWS)
def test_diff_apply_roundtrip_property(spark, old_rows, new_rows):
    """For ARBITRARY frames A, B (unique keys, null-bearing values):
    apply_changes(A, diff_frames(A, B)) is row-identical to B, the diff of
    a frame with itself is empty, and every tagged row is consistent with
    membership in A/B."""
    a = _cdc_df(spark, old_rows)
    b = _cdc_df(spark, new_rows)
    delta = publish.diff_frames(a, b, ["k"])
    rebuilt = publish.apply_changes(a, delta, ["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, b.collect()))

    assert publish.diff_frames(a, a, ["k"]).count() == 0

    a_keys = {r.k for r in a.collect()}
    b_keys = {r.k for r in b.collect()}
    for r in delta.collect():
        if r["change_type"] == "insert":
            assert r.k in b_keys and r.k not in a_keys
        elif r["change_type"] == "delete":
            assert r.k in a_keys and r.k not in b_keys
        else:
            assert r.k in a_keys and r.k in b_keys


def test_read_changes_with_predicate_scopes_both_versions(spark, tmp_path):
    """read_changes(where=...) is CDC of the FILTERED view —
    diff(filter(old), filter(new)) — with both snapshot scans going
    through file-level skipping.  Rows updated INTO the predicate set
    arrive as inserts, rows updated out of it as deletes."""
    root = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0)],
        "id bigint, grp string, val double",
    )
    publish.publish_tables(spark, {"t": v1}, root, table_keys={"t": ["id"]})
    # id=2 leaves grp a; id=3 enters it; id=1 value-updates inside it;
    # id=5 inserts inside it; id=4 changes outside it (invisible)
    v2 = spark.createDataFrame(
        [(1, "a", 11.0), (2, "b", 20.0), (3, "a", 30.0), (4, "b", 44.0),
         (5, "a", 50.0)],
        "id bigint, grp string, val double",
    )
    publish.publish_tables(spark, {"t": v2}, root)

    got = publish.read_changes(
        spark, root, "t", 1, 2, keys=["id"], where=[("grp", "=", "a")]
    )
    assert sorted(tuple(r) for r in got.collect()) == sorted([
        (1, "a", 11.0, "update"),
        (2, "a", 20.0, "delete"),   # left the filtered view (old row)
        (3, "a", 30.0, "insert"),   # entered the filtered view
        (5, "a", 50.0, "insert"),
    ])
    # oracle: the generic diff of the two filtered snapshots
    expected = publish.diff_frames(
        publish.read_table_at(spark, root, "t", 1).filter("grp = 'a'"),
        publish.read_table_at(spark, root, "t", 2).filter("grp = 'a'"),
        ["id"],
    )
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in expected.collect()
    )


def test_read_changes_with_predicate_on_mor_fast_path(spark, tmp_path):
    """The O(delta) MoR fast path honors `where` identically to the
    generic filtered diff."""
    root = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id bigint, grp string, val double",
    )
    publish.publish_tables(spark, {"t": v1}, root, table_keys={"t": ["id"]})
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame(
            [(1, "b", 10.0), (3, "a", 33.0), (4, "a", 44.0)],
            "id bigint, grp string, val double",
        ),
        deletes=spark.createDataFrame([(2,)], "id bigint"),
    )
    got = publish.read_changes(
        spark, root, "t", 1, 2, keys=["id"], where=[("grp", "=", "a")]
    )
    expected = publish.diff_frames(
        publish.read_table_at(spark, root, "t", 1).filter("grp = 'a'"),
        publish.read_table_at(spark, root, "t", 2).filter("grp = 'a'"),
        ["id"],
    )
    rows = sorted(tuple(r) for r in got.collect())
    assert rows == sorted(tuple(r) for r in expected.collect())
    assert rows == sorted([
        (1, "a", 10.0, "delete"),   # moved out of grp a
        (2, "a", 20.0, "delete"),   # deleted outright
        (3, "a", 33.0, "insert"),   # moved into grp a
        (4, "a", 44.0, "insert"),
    ])


def test_scan_table_at_prunes_historical_version(spark, tmp_path):
    """Time-travel scans skip files too: the stats sidecar lives in the
    immutable version directory, so a historical selective read opens
    only the covering files."""
    root = str(tmp_path / "store")
    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    publish.publish_tables(
        spark, {"t": df.repartitionByRange(8, "k")}, root
    )
    publish.publish_tables(
        spark, {"t": df.filter("k < 100").repartitionByRange(2, "k")}, root
    )
    got = publish.scan_table_at(spark, root, "t", 1, where=[("k", "=", 1500)])
    assert [tuple(r) for r in got.collect()] == [(1500, 3000)]
    # version 2 no longer holds the row; the historical scan still does
    assert publish.scan_table(spark, root, "t", [("k", "=", 1500)]).count() == 0


def test_filtered_cdc_across_schema_evolution(spark, tmp_path):
    """read_changes(where=...) on a column the OLD version predates: the
    old side reads the column as null (matching nothing), so every
    post-evolution row entering the slice arrives as an insert — both on
    the generic path and the MoR fast path."""
    root = str(tmp_path / "store")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id bigint, name string"
    )
    publish.publish_tables(spark, {"t": v1}, root, table_keys={"t": ["id"]})
    publish.merge_into_mor(
        spark, root, "t",
        spark.createDataFrame(
            [(2, "b2", "EU"), (3, "c", "US")],
            "id bigint, name string, region string",
        ),
        evolve_schema=True,
    )
    got = publish.read_changes(
        spark, root, "t", 1, 2, keys=["id"], where=[("region", "=", "EU")]
    )
    assert sorted(tuple(r) for r in got.collect()) == [
        (2, "b2", "EU", "insert")
    ]
    # generic path (bypass the MoR suffix): compact first, then diff
    publish.compact(spark, root, "t")
    got = publish.read_changes(
        spark, root, "t", 1, 3, keys=["id"], where=[("region", "is_null")]
    )
    # v1 rows all had null region (absent); at v3 ids 2,3 have regions:
    # id=2 leaves the null-region slice (delete of old image), id=1 stays
    rows = sorted(tuple(r) for r in got.collect())
    assert (2, "b", None, "delete") in rows
    assert all(t[0] != 1 for t in rows)  # unchanged inside the slice
