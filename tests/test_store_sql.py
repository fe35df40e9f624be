"""SQL DML front-end (plans/store_sql.py): MERGE / DELETE / INSERT
statements must round-trip to EXACTLY the state the Python merge API
produces — the U1-U3 mode matrix, delete-incoming, and both engines
(copy-on-write and merge-on-read)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.plans import publish
from dataintegration_ecomprovider_spark.plans.store_sql import store_sql


def _dest(spark, n=20):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.lit("old").alias("tag"),
    )


def _staging(spark):
    # overlaps keys 15..19, new keys 20..24
    return spark.range(15, 25).select(
        F.col("id").alias("k"),
        (F.col("id") * 100).alias("v"),
        F.lit("new").alias("tag"),
    )


def _rows(spark, root, name="t"):
    return sorted(
        tuple(r) for r in publish.read_table(spark, root, name).collect()
    )


def _seed(spark, tmp_path, sub):
    root = str(tmp_path / sub)
    publish.publish_tables(
        spark, {"t": _dest(spark)}, root, table_keys={"t": ["k"]}
    )
    return root


MODES = [
    # (sql WHEN clauses, insert_new, update_existing)
    ("WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
     True, True),
    ("WHEN NOT MATCHED THEN INSERT *", True, False),
    ("WHEN MATCHED THEN UPDATE SET *", False, True),
]


@pytest.mark.parametrize("mor", [False, True], ids=["cow", "mor"])
@pytest.mark.parametrize(
    "clauses,insert_new,update_existing", MODES,
    ids=["upsert", "insert_only", "update_only"],
)
def test_merge_mode_matrix_matches_python_api(
    spark, tmp_path, mor, clauses, insert_new, update_existing
):
    sql_root = _seed(spark, tmp_path, "sql")
    py_root = _seed(spark, tmp_path, "py")
    _staging(spark).createOrReplaceTempView("stg")

    store_sql(spark, sql_root, mor=mor).sql(
        f"MERGE INTO t USING stg ON t.k = stg.k {clauses}"
    )
    fn = publish.merge_into_mor if mor else publish.merge_into
    fn(
        spark, py_root, "t", _staging(spark), keys=["k"],
        insert_new=insert_new, update_existing=update_existing,
    )
    assert _rows(spark, sql_root) == _rows(spark, py_root)


@pytest.mark.parametrize("mor", [False, True], ids=["cow", "mor"])
def test_merge_delete_incoming_matches_python_api(spark, tmp_path, mor):
    sql_root = _seed(spark, tmp_path, "sql")
    py_root = _seed(spark, tmp_path, "py")
    _staging(spark).createOrReplaceTempView("stg")

    store_sql(spark, sql_root, mor=mor).sql(
        "MERGE INTO t USING stg ON t.k = stg.k WHEN MATCHED THEN DELETE"
    )
    if mor:
        publish.merge_into_mor(
            spark, py_root, "t", _staging(spark).select("k").limit(0),
            keys=["k"], deletes=_staging(spark).select("k"),
        )
    else:
        from dataintegration_ecomprovider_spark.operators import merge

        dest = publish.read_table(spark, py_root, "t")
        publish.publish_tables(
            spark,
            {"t": merge.delete_incoming(dest, _staging(spark), ["k"])},
            py_root,
        )
    got = _rows(spark, sql_root)
    assert got == _rows(spark, py_root)
    assert {r[0] for r in got} == set(range(15))  # 15..19 removed


def test_merge_source_forms_and_on_orientations(spark, tmp_path):
    """Source as a subquery over the store's own views; ON written
    source-first; aliases on both sides."""
    root = _seed(spark, tmp_path, "s")
    publish.publish_tables(
        spark, {"extra": _staging(spark)}, root,
        table_keys={"extra": ["k"]},
    )
    store_sql(spark, root).sql(
        "MERGE INTO t AS d USING (SELECT k, v, 'sub' AS tag "
        "FROM store_extra WHERE k < 22) s "
        "ON s.k = d.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r["k"]: (r["v"], r["tag"])
           for r in publish.read_table(spark, root, "t").collect()}
    assert got[16] == (1600, "sub") and got[21] == (2100, "sub")
    assert got[5] == (10, "old") and 23 not in got
    # another STORE TABLE as the bare source
    store_sql(spark, root).sql(
        "MERGE INTO t USING extra ON t.k = extra.k "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r["k"]: r["tag"]
           for r in publish.read_table(spark, root, "t").collect()}
    assert got[23] == "new" and got[16] == "sub"  # insert-only kept 16


def test_delete_from_and_insert_into(spark, tmp_path):
    root = _seed(spark, tmp_path, "s")
    store_sql(spark, root).sql("DELETE FROM t WHERE v >= 30 AND tag = 'old'")
    assert {r["k"] for r in publish.read_table(spark, root, "t").collect()} \
        == set(range(15))
    store_sql(spark, root).sql(
        "INSERT INTO t SELECT k + 100 AS k, v, 'ins' AS tag FROM store_t"
    )
    got = publish.read_table(spark, root, "t")
    assert got.count() == 30
    assert got.filter(F.col("tag") == "ins").count() == 15
    # INSERT fails LOUDLY on existing keys (keyed table — a silent skip
    # loses refreshed rows, a silent append breaks uniqueness)...
    with pytest.raises(ValueError, match="already exist"):
        store_sql(spark, root).sql(
            "INSERT INTO t SELECT k + 100 AS k, v + 1 AS v, 'dup' AS tag "
            "FROM store_t WHERE k < 15"
        )
    # ...and INSERT OR IGNORE restores the skip-existing form
    store_sql(spark, root).sql(
        "INSERT OR IGNORE INTO t SELECT k + 100 AS k, v + 1 AS v, "
        "'dup' AS tag FROM store_t WHERE k < 15"
    )
    assert publish.read_table(spark, root, "t").filter(
        F.col("tag") == "dup"
    ).count() == 0


def test_rejections(spark, tmp_path):
    root = _seed(spark, tmp_path, "s")
    _staging(spark).createOrReplaceTempView("stg")
    s = store_sql(spark, root)
    with pytest.raises(ValueError, match="AND-ed column equalities"):
        s.sql("MERGE INTO t USING stg ON t.k > stg.k "
              "WHEN MATCHED THEN UPDATE SET *")
    with pytest.raises(ValueError, match="same column on both sides"):
        s.sql("MERGE INTO t USING stg ON t.k = stg.v "
              "WHEN MATCHED THEN UPDATE SET *")
    with pytest.raises(ValueError, match="WHEN clause"):
        s.sql("MERGE INTO t USING stg ON t.k = stg.k")
    with pytest.raises(ValueError, match="cannot combine"):
        s.sql("MERGE INTO t USING stg ON t.k = stg.k "
              "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *")
    with pytest.raises(ValueError, match="unsupported statement"):
        s.sql("TRUNCATE TABLE t")


def test_select_version_and_timestamp_as_of(spark, tmp_path):
    """Read-side time travel through the SQL session: VERSION AS OF joins
    two different versions of one table in a single statement."""
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": spark.createDataFrame([(1, "a")], "k long, v string")},
        root, table_keys={"t": ["k"]},
    )
    ts_between = publish.current_manifest(root)["committed_at_unix"] + 0.001
    publish.merge_into(
        spark, root, "t",
        spark.createDataFrame([(1, "a2"), (2, "b")], "k long, v string"),
    )
    s = store_sql(spark, root)
    now = {(r["k"], r["v"]) for r in s.sql("SELECT * FROM store_t").collect()}
    assert now == {(1, "a2"), (2, "b")}
    old = {(r["k"], r["v"]) for r in s.sql(
        "SELECT * FROM store_t VERSION AS OF 1"
    ).collect()}
    assert old == {(1, "a")}
    import datetime as _dt

    iso = _dt.datetime.fromtimestamp(
        ts_between, tz=_dt.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%S.%f")
    asof = {(r["k"], r["v"]) for r in s.sql(
        f"SELECT * FROM store_t TIMESTAMP AS OF '{iso}'"
    ).collect()}
    assert asof == {(1, "a")}
    # both versions joined in ONE statement
    diff = s.sql(
        "SELECT cur.k FROM store_t cur LEFT ANTI JOIN "
        "(SELECT * FROM store_t VERSION AS OF 1) prev ON cur.k = prev.k"
    ).collect()
    assert [r["k"] for r in diff] == [2]


def test_optimize_vacuum_history_restore(spark, tmp_path):
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark,
        {"t": spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "k long, x double"
        ).repartition(8)},
        root, table_keys={"t": ["k"]},
    )
    publish.merge_into(
        spark, root, "t",
        spark.createDataFrame([(1, 999.0)], "k long, x double"),
    )
    s = store_sql(spark, root)
    hist = s.sql("DESCRIBE HISTORY t").collect()
    assert [r["version"] for r in hist] == [2, 1]

    m = s.sql("OPTIMIZE t ZORDER BY (k, x)")
    assert publish.current_manifest(root)["version"] == 3
    assert m["version"] == 3 and m["files_after"] <= m["files_before"]
    assert (
        publish.current_manifest(root)["tables"]["t"].get("rewrite_of") == 2
    )

    s.sql("RESTORE VERSION AS OF 2")
    got = {r["k"] for r in s.sql(
        "SELECT k FROM store_t WHERE x = 999.0"
    ).collect()}
    assert got == {1}

    rep = s.sql("VACUUM RETAIN 1 VERSIONS")
    assert isinstance(rep, dict)
    import pytest as _pytest

    with _pytest.raises(Exception):
        s.sql("SELECT * FROM store_t VERSION AS OF 1").collect()


def test_ctas_drop_detail_and_time_vacuum(spark, tmp_path):
    root = _seed(spark, tmp_path, "s")
    s = store_sql(spark, root)
    s.sql(
        "CREATE TABLE big KEYED BY (k) AS "
        "SELECT k, v * 10 AS v FROM store_t WHERE k < 5"
    )
    assert publish.table_keys(root, "big") == ["k"]
    got = {(r["k"], r["v"]) for r in s.sql("SELECT * FROM store_big").collect()}
    assert got == {(i, i * 20) for i in range(5)}
    with pytest.raises(ValueError, match="already exists"):
        s.sql("CREATE TABLE big AS SELECT 1 AS x")

    detail = s.sql("DESCRIBE DETAIL big").collect()[0]
    assert detail["rows"] == 5 and detail["deltas_pending"] == 0
    assert '"min": 0' in detail["columns"]

    s.sql("DROP TABLE big")
    assert "big" not in publish.current_manifest(root)["tables"]

    # time-based retention keeps everything younger than the window
    rep = s.sql("VACUUM RETAIN 1 HOURS")
    assert rep["removed_versions"] == []


def test_vacuum_keep_seconds_window(spark, tmp_path):
    """Count window says prune, time window says keep — time wins; a
    zero-second window lets the count window rule."""
    root = str(tmp_path / "store")
    for i in range(4):
        publish.publish_tables(
            spark,
            {"t": spark.createDataFrame([(i,)], "k long")},
            root, table_keys={"t": ["k"]},
        )
    rep = publish.vacuum(spark, root, keep_versions=1, keep_seconds=3600)
    assert rep["removed_versions"] == []
    rep = publish.vacuum(spark, root, keep_versions=1, keep_seconds=0)
    assert rep["removed_versions"] == [1, 2, 3]


def test_merge_source_can_time_travel(spark, tmp_path):
    """USING a time-traveled subquery: restore old rows selectively —
    the SQL form of a partial rollback."""
    root = _seed(spark, tmp_path, "s")
    store_sql(spark, root).sql("DELETE FROM t WHERE k >= 10")
    assert publish.read_table(spark, root, "t").count() == 10
    store_sql(spark, root).sql(
        "MERGE INTO t USING "
        "(SELECT * FROM store_t VERSION AS OF 1 WHERE k >= 15) s "
        "ON t.k = s.k WHEN NOT MATCHED THEN INSERT *"
    )
    assert {r["k"] for r in publish.read_table(spark, root, "t").collect()} \
        == set(range(10)) | set(range(15, 20))


def test_export_table_statement_is_cdc_maintained(spark, tmp_path):
    root = _seed(spark, tmp_path, "s")
    out = str(tmp_path / "exp")
    s = store_sql(spark, root)
    rep = s.sql(f"EXPORT TABLE t TO '{out}' SHARDS 4")
    assert rep["mode"] == "seed" and rep["rows"] == 20
    s.sql("DELETE FROM t WHERE k >= 18")
    rep = s.sql(f"EXPORT TABLE t TO '{out}' SHARDS 4")
    assert rep["mode"] == "delta" and rep["rows"] == 18
    import os as _os

    shard_dirs = [
        _os.path.join(out, d) for d in _os.listdir(out)
        if d.startswith("shard=") and any(
            not f.startswith(("_", "."))
            for f in _os.listdir(_os.path.join(out, d)))
    ]
    got = {r["k"] for r in spark.read.parquet(*shard_dirs).collect()}
    assert got == set(range(18))


def test_transaction_block_commits_atomically(spark, tmp_path):
    root = _seed(spark, tmp_path, "s")
    publish.publish_tables(
        spark, {"u": _dest(spark, 5)}, root, table_keys={"u": ["k"]}
    )
    _staging(spark).createOrReplaceTempView("stg")
    v0 = publish.current_manifest(root)["version"]
    s = store_sql(spark, root)
    with s.transaction(txn=("job", 1)) as tx:
        r = tx.sql("MERGE INTO t USING stg ON t.k = stg.k "
                   "WHEN MATCHED THEN UPDATE SET * "
                   "WHEN NOT MATCHED THEN INSERT *")
        assert r == {"deferred": "t"}
        tx.sql("MERGE INTO u USING stg ON u.k = stg.k "
               "WHEN MATCHED THEN DELETE")
        with pytest.raises(ValueError, match="only MERGE"):
            tx.sql("OPTIMIZE t")
        with pytest.raises(ValueError, match="one statement per table"):
            tx.sql("MERGE INTO t USING stg ON t.k = stg.k "
                   "WHEN NOT MATCHED THEN INSERT *")
    m = publish.current_manifest(root)
    assert m["version"] == v0 + 1  # ONE version for both tables
    assert {r["k"] for r in publish.read_table(spark, root, "t").collect()} \
        == set(range(25))
    assert {r["k"] for r in publish.read_table(spark, root, "u").collect()} \
        == set(range(5))  # staging keys 15..24 matched nothing in u

    # replay of the whole block is one atomic skip
    with s.transaction(txn=("job", 1)) as tx:
        tx.sql("MERGE INTO t USING stg ON t.k = stg.k "
               "WHEN MATCHED THEN UPDATE SET *")
    assert publish.current_manifest(root)["version"] == m["version"]


def test_transaction_block_aborts_on_error(spark, tmp_path):
    root = _seed(spark, tmp_path, "s")
    _staging(spark).createOrReplaceTempView("stg")
    v0 = publish.current_manifest(root)["version"]
    s = store_sql(spark, root)
    with pytest.raises(RuntimeError, match="boom"):
        with s.transaction() as tx:
            tx.sql("MERGE INTO t USING stg ON t.k = stg.k "
                   "WHEN NOT MATCHED THEN INSERT *")
            raise RuntimeError("boom")
    assert publish.current_manifest(root)["version"] == v0
    assert s._tx_merges is None  # block state cleaned up


def test_transaction_block_accepts_insert(spark, tmp_path):
    root = _seed(spark, tmp_path, "s")
    publish.publish_tables(
        spark, {"u": _dest(spark, 3)}, root, table_keys={"u": ["k"]}
    )
    _staging(spark).createOrReplaceTempView("stg")
    v0 = publish.current_manifest(root)["version"]
    s = store_sql(spark, root)
    with s.transaction() as tx:
        tx.sql("MERGE INTO t USING stg ON t.k = stg.k "
               "WHEN NOT MATCHED THEN INSERT *")
        tx.sql("INSERT INTO u SELECT k + 50 AS k, v, tag FROM stg")
        with pytest.raises(ValueError, match="only MERGE INTO / INSERT"):
            tx.sql("VACUUM")
    m = publish.current_manifest(root)
    assert m["version"] == v0 + 1
    assert publish.read_table(spark, root, "t").count() == 25
    assert {r["k"] for r in publish.read_table(spark, root, "u").collect()} \
        == set(range(3)) | set(range(65, 75))


# ---- round 9: UPDATE / BY SOURCE / mixed blocks / paren unwrap ----------

@pytest.mark.parametrize("mor", [False, True], ids=["cow", "mor"])
def test_update_statement_matches_python_semantics(spark, tmp_path, mor):
    root = _seed(spark, tmp_path, f"upd_{mor}")
    store_sql(spark, root, mor=mor).sql(
        "UPDATE t SET v = v + k, tag = concat(tag, '!') WHERE k >= 15"
    )
    got = {r["k"]: (r["v"], r["tag"])
           for r in publish.read_table(spark, root, "t").collect()}
    for k in range(20):
        if k >= 15:
            # SET exprs see PRE-update values (v was k*2)
            assert got[k] == (k * 2 + k, "old!")
        else:
            assert got[k] == (k * 2, "old")


def test_update_rejections(spark, tmp_path):
    root = _seed(spark, tmp_path, "updrej")
    s = store_sql(spark, root)
    with pytest.raises(ValueError, match="unknown column"):
        s.sql("UPDATE t SET nope = 1 WHERE k = 0")
    with pytest.raises(ValueError, match="assigned twice"):
        s.sql("UPDATE t SET v = 1, v = 2 WHERE k = 0")


def test_update_null_predicate_rows_untouched(spark, tmp_path):
    root = str(tmp_path / "updnull")
    dest = spark.createDataFrame(
        [(0, None, "a"), (1, 5, "b"), (2, 50, "c")], "k long, v long, tag string"
    )
    publish.publish_tables(spark, {"t": dest}, root, table_keys={"t": ["k"]})
    store_sql(spark, root).sql("UPDATE t SET tag = 'big' WHERE v > 10")
    got = {r["k"]: r["tag"]
           for r in publish.read_table(spark, root, "t").collect()}
    assert got == {0: "a", 1: "b", 2: "big"}  # NULL predicate = no match


def test_merge_not_matched_by_source_delete(spark, tmp_path):
    from dataintegration_ecomprovider_spark.operators import merge as m_ops

    root = _seed(spark, tmp_path, "bsd")
    stg = _staging(spark)
    stg.createOrReplaceTempView("stg")
    expect = sorted(tuple(r) for r in m_ops.remove_missing(
        m_ops.upsert(_dest(spark), stg, ["k"]), stg, ["k"]
    ).collect())
    store_sql(spark, root).sql(
        "MERGE INTO t USING stg ON t.k = stg.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    assert _rows(spark, root) == expect
    # full sync: dest == staging exactly
    assert {r["k"] for r in publish.read_table(spark, root, "t").collect()} \
        == set(range(15, 25))


def test_merge_not_matched_by_source_update(spark, tmp_path):
    root = _seed(spark, tmp_path, "bsu")
    _staging(spark).createOrReplaceTempView("stg")
    store_sql(spark, root).sql(
        "MERGE INTO t USING stg ON t.k = stg.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'stale'"
    )
    got = {r["k"]: r["tag"]
           for r in publish.read_table(spark, root, "t").collect()}
    assert all(got[k] == "stale" for k in range(15))       # U7 soft delete
    assert all(got[k] == "new" for k in range(15, 20))     # matched updated
    assert 20 not in got                                   # no INSERT clause


def test_mixed_transaction_block_one_version(spark, tmp_path):
    root = _seed(spark, tmp_path, "mix")
    publish.publish_tables(
        spark, {"u": _dest(spark, 10), "w": _dest(spark, 8)}, root,
        table_keys={"u": ["k"], "w": ["k"]},
    )
    _staging(spark).createOrReplaceTempView("stg")
    v0 = publish.current_manifest(root)["version"]
    with store_sql(spark, root).transaction(txn=("mix", 1)) as tx:
        tx.sql("MERGE INTO t USING stg ON t.k = stg.k "
               "WHEN MATCHED THEN UPDATE SET * "
               "WHEN NOT MATCHED THEN INSERT *")
        tx.sql("DELETE FROM u WHERE k >= 5")
        tx.sql("UPDATE w SET v = v + 1000 WHERE k < 3")
    m = publish.current_manifest(root)
    assert m["version"] == v0 + 1  # ONE version for all three tables
    assert publish.read_table(spark, root, "t").count() == 25
    assert {r["k"] for r in publish.read_table(spark, root, "u").collect()} \
        == set(range(5))
    got_w = {r["k"]: r["v"]
             for r in publish.read_table(spark, root, "w").collect()}
    assert got_w == {k: k * 2 + (1000 if k < 3 else 0) for k in range(8)}
    # replay of the whole mixed block is one atomic skip
    with store_sql(spark, root).transaction(txn=("mix", 1)) as tx:
        tx.sql("DELETE FROM u WHERE k >= 0")
    assert publish.current_manifest(root)["version"] == m["version"]
    assert publish.read_table(spark, root, "u").count() == 5


def test_transaction_full_sync_merge(spark, tmp_path):
    root = _seed(spark, tmp_path, "txsync")
    _staging(spark).createOrReplaceTempView("stg")
    with store_sql(spark, root).transaction() as tx:
        tx.sql("MERGE INTO t USING stg ON t.k = stg.k "
               "WHEN MATCHED THEN UPDATE SET * "
               "WHEN NOT MATCHED THEN INSERT * "
               "WHEN NOT MATCHED BY SOURCE THEN DELETE")
        with pytest.raises(ValueError, match="standalone"):
            tx.sql("MERGE INTO t USING stg ON t.k = stg.k "
                   "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = 'x'")
    assert {r["k"] for r in publish.read_table(spark, root, "t").collect()} \
        == set(range(15, 25))


def test_nested_paren_subquery_source(spark, tmp_path):
    # a USING subquery whose text ENDS with a nested ')' must survive
    # unwrapping (str.strip("()") would eat the inner paren too)
    root = _seed(spark, tmp_path, "paren")
    _staging(spark).createOrReplaceTempView("stg")
    store_sql(spark, root).sql(
        "MERGE INTO t USING (SELECT * FROM stg WHERE k IN (16, 21)) s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r["k"]: r["tag"]
           for r in publish.read_table(spark, root, "t").collect()}
    assert got[16] == "new" and got[21] == "new"
    assert got[17] == "old" and 22 not in got


def test_unwrap_parens_unit():
    from dataintegration_ecomprovider_spark.plans.store_sql import (
        _unwrap_parens,
    )

    assert _unwrap_parens("(SELECT a FROM t)") == "SELECT a FROM t"
    assert _unwrap_parens("((SELECT a))") == "SELECT a"
    assert _unwrap_parens("(SELECT 1 WHERE k IN (1,2))") \
        == "SELECT 1 WHERE k IN (1,2)"
    # (a) UNION (b): outer parens do NOT wrap the whole text
    assert _unwrap_parens("(SELECT 1) UNION (SELECT 2)") \
        == "(SELECT 1) UNION (SELECT 2)"


def test_alter_table_statements(spark, tmp_path):
    root = str(tmp_path / "alt")
    publish.publish_tables(
        spark,
        {"t": spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "k long, v int, tag string"
        )},
        root, table_keys={"t": ["k"]},
    )
    s = store_sql(spark, root)
    s.sql("ALTER TABLE t RENAME COLUMN tag TO label")
    assert "label" in publish.read_table(spark, root, "t").columns
    s.sql("ALTER TABLE t ALTER COLUMN v TYPE bigint")
    assert dict(publish.read_table(spark, root, "t").dtypes)["v"] == "bigint"
    s.sql("ALTER TABLE t DROP COLUMN label")
    assert "label" not in publish.read_table(spark, root, "t").columns
    with pytest.raises(ValueError, match="not a lossless widening"):
        s.sql("ALTER TABLE t ALTER COLUMN v TYPE int")
    with pytest.raises(ValueError, match="unsupported ALTER"):
        s.sql("ALTER TABLE t ADD CONSTRAINT x CHECK (v > 0)")


def test_begin_commit_rollback_statements(spark, tmp_path):
    """The pure-SQL transaction trio: BEGIN stages, COMMIT lands ONE
    atomic version, ROLLBACK discards; txn watermark via AS/BATCH."""
    root = _seed(spark, tmp_path, "bcr")
    publish.publish_tables(
        spark, {"u": _dest(spark, 5)}, root, table_keys={"u": ["k"]}
    )
    _staging(spark).createOrReplaceTempView("stg")
    s = store_sql(spark, root)
    v0 = publish.current_manifest(root)["version"]

    # ROLLBACK discards everything
    s.sql("BEGIN TRANSACTION")
    s.sql("MERGE INTO t USING stg ON t.k = stg.k "
          "WHEN NOT MATCHED THEN INSERT *")
    assert s.sql("ROLLBACK") == {"transaction": "rolled_back"}
    assert publish.current_manifest(root)["version"] == v0
    assert publish.read_table(spark, root, "t").count() == 20

    # COMMIT lands one version for two tables, replay-gated by the txn
    s.sql("BEGIN TRANSACTION AS 'job' BATCH 3")
    s.sql("MERGE INTO t USING stg ON t.k = stg.k "
          "WHEN NOT MATCHED THEN INSERT *")
    s.sql("DELETE FROM u WHERE k >= 3")
    s.sql("COMMIT")
    m = publish.current_manifest(root)
    assert m["version"] == v0 + 1
    assert publish.read_table(spark, root, "t").count() == 25
    assert publish.read_table(spark, root, "u").count() == 3

    # replaying the same BATCH is an atomic no-op
    s.sql("BEGIN TRANSACTION AS 'job' BATCH 3")
    s.sql("DELETE FROM u WHERE k >= 0")
    s.sql("COMMIT")
    assert publish.current_manifest(root)["version"] == m["version"]
    assert publish.read_table(spark, root, "u").count() == 3

    # guards
    with pytest.raises(ValueError, match="outside a transaction"):
        s.sql("COMMIT")
    with pytest.raises(ValueError, match="outside a transaction"):
        s.sql("ROLLBACK")
    s.sql("BEGIN")
    with pytest.raises(ValueError, match="already inside"):
        s.sql("BEGIN TRANSACTION")
    assert s.sql("ROLLBACK") == {"transaction": "rolled_back"}


def test_update_without_where_hits_every_row(spark, tmp_path):
    root = _seed(spark, tmp_path, "updall")
    store_sql(spark, root).sql("UPDATE t SET tag = 'all'")
    assert publish.read_table(spark, root, "t").filter(
        F.col("tag") != "all"
    ).count() == 0


@pytest.mark.parametrize("mor", [False, True], ids=["cow", "mor"])
def test_insert_values_statement(spark, tmp_path, mor):
    root = _seed(spark, tmp_path, f"vals_{mor}")
    s = store_sql(spark, root, mor=mor)
    s.sql("INSERT INTO t VALUES (100, 1, 'v'), (101, 2, 'v')")
    got = {r["k"]: (r["v"], r["tag"])
           for r in publish.read_table(spark, root, "t").collect()}
    assert got[100] == (1, "v") and got[101] == (2, "v")
    # explicit column list: unnamed columns null-fill
    s.sql("INSERT INTO t (k, tag) VALUES (102, 'partial')")
    got = {r["k"]: (r["v"], r["tag"])
           for r in publish.read_table(spark, root, "t").collect()}
    assert got[102] == (None, "partial")
    # the loud-duplicate contract applies to VALUES too
    with pytest.raises(ValueError, match="already exist"):
        s.sql("INSERT INTO t VALUES (100, 9, 'dup')")
    s.sql("INSERT OR IGNORE INTO t VALUES (100, 9, 'dup'), (103, 3, 'v')")
    got = {r["k"]: r["tag"]
           for r in publish.read_table(spark, root, "t").collect()}
    assert got[100] == "v" and got[103] == "v"


def test_insert_values_in_transaction_block(spark, tmp_path):
    root = _seed(spark, tmp_path, "valstx")
    _staging(spark).createOrReplaceTempView("stg")
    v0 = publish.current_manifest(root)["version"]
    s = store_sql(spark, root)
    s.sql("BEGIN TRANSACTION")
    s.sql("INSERT INTO t (k, v, tag) VALUES (200, 1, 'tx')")
    s.sql("COMMIT")
    assert publish.current_manifest(root)["version"] == v0 + 1
    assert publish.read_table(spark, root, "t").filter(
        F.col("k") == 200
    ).count() == 1


def test_merge_with_schema_evolution(spark, tmp_path):
    """Delta's MERGE WITH SCHEMA EVOLUTION syntax: staging-only columns
    widen the table (metadata-only on MoR; new type widenings compose);
    without the clause the same statement refuses on MoR and drops the
    column on CoW-upsert semantics preserved by the engine."""
    root = _seed(spark, tmp_path, "evo")
    spark.createDataFrame(
        [(21, 1, "n", "EU")], "k long, v long, tag string, region string"
    ).createOrReplaceTempView("evo_stg")
    with pytest.raises(ValueError, match="evolve_schema"):
        store_sql(spark, root, mor=True).sql(
            "MERGE INTO t USING evo_stg ON t.k = evo_stg.k "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    store_sql(spark, root, mor=True).sql(
        "MERGE WITH SCHEMA EVOLUTION INTO t USING evo_stg "
        "ON t.k = evo_stg.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    got = publish.read_table(spark, root, "t")
    assert "region" in got.columns
    rows = {r["k"]: r["region"] for r in got.collect()}
    assert rows[21] == "EU" and rows[0] is None


def test_ctas_partitioned_by(spark, tmp_path):
    import os

    root = _seed(spark, tmp_path, "ctp")
    store_sql(spark, root).sql(
        "CREATE TABLE bytag KEYED BY (k) PARTITIONED BY (tag) "
        "AS SELECT k, v, tag FROM store_t"
    )
    entry = publish.current_manifest(root)["tables"]["bytag"]
    assert entry.get("partition_by") == ["tag"]
    assert any(
        d.startswith("tag=") for d in os.listdir(entry["path"])
        if not d.startswith("_")
    )
    assert publish.read_table(spark, root, "bytag").count() == 20
    # partition pruning works through the hive layout
    kept, total = publish.prune_files(root, "bytag", [("tag", "=", "old")])
    assert len(kept) >= 1


def test_table_changes_reads_cdc(spark, tmp_path):
    """Round 10: SELECT over table_changes('t', v1[, v2]) resolves
    through read_changes with Delta's version mapping (startVersion =
    first commit included), composes with ordinary SQL, and matches the
    Python API exactly."""
    root = _seed(spark, tmp_path, "tc")
    s = store_sql(spark, root)
    s.sql("UPDATE t SET v = v + 1 WHERE k < 3")             # v2
    s.sql("DELETE FROM t WHERE k = 10")                     # v3
    s.sql("INSERT INTO t VALUES (100, 0, 'fresh')")         # v4

    got = sorted(
        (r["k"], r["change_type"])
        for r in s.sql("SELECT k, change_type FROM table_changes('t', 2)")
        .collect()
    )
    expect = sorted(
        (r["k"], r["change_type"])
        for r in publish.read_changes(
            spark, root, "t", from_version=1
        ).collect()
    )
    assert got == expect
    assert ("h" not in dict(got)) and (100, "insert") in got
    assert (10, "delete") in got

    # bounded window: only v2's commits
    only_v2 = sorted(
        (r["k"], r["change_type"])
        for r in s.sql(
            "SELECT k, change_type FROM table_changes('t', 2, 2)"
        ).collect()
    )
    assert only_v2 == [(0, "update"), (1, "update"), (2, "update")]

    # composes: aggregation over the CDC feed in plain SQL
    n = s.sql(
        "SELECT COUNT(*) AS n FROM table_changes('t', 2) "
        "WHERE change_type = 'update'"
    ).collect()[0]["n"]
    assert n == 3


@pytest.mark.parametrize("mor", [False, True])
def test_replace_where_matches_delete_plus_insert(spark, tmp_path, mor):
    """REPLACE WHERE (one statement) lands exactly the state of
    DELETE-matching + INSERT in a transaction, on both engines; incoming
    rows that escape the predicate's scope are rejected."""
    root_a = _seed(spark, tmp_path, f"rw_{mor}")
    root_b = _seed(spark, tmp_path, f"rw2_{mor}")
    src = "SELECT k, CAST(7 AS bigint) AS v, 'repl' AS tag FROM store_t WHERE k >= 18"

    s = store_sql(spark, root_a, mor=mor)
    s.sql(f"INSERT INTO t REPLACE WHERE k >= 15 {src}")

    # reference state: delete matched-but-not-reinserted, then upsert
    # the incoming rows (two commits — the parity claim is on the STATE)
    sb = store_sql(spark, root_b, mor=mor)
    sb.sql("DELETE FROM t WHERE k >= 15 AND k < 18")
    sb.sql(
        "MERGE INTO t USING (SELECT k, CAST(7 AS bigint) AS v, "
        "'repl' AS tag FROM store_t WHERE k >= 18) s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert _rows(spark, root_a) == _rows(spark, root_b)
    assert all(r[2] == "repl" for r in _rows(spark, root_a) if r[0] >= 15)

    with pytest.raises(ValueError, match="do not satisfy"):
        s.sql(
            "INSERT INTO t REPLACE WHERE k >= 15 "
            "SELECT k, v, tag FROM store_t"  # includes k < 15 rows
        )


def test_replace_where_in_transaction_block(spark, tmp_path):
    """REPLACE WHERE joins an atomic multi-table block: one version, and
    a key both deleted-by-predicate and re-inserted lands as the new row
    (delete-wins can never eat a replacement)."""
    root = _seed(spark, tmp_path, "rwtx")
    publish.publish_tables(
        spark, {"u": _dest(spark, 5)}, root, table_keys={"u": ["k"]},
    )
    s = store_sql(spark, root, mor=True)
    v0 = publish.current_manifest(root)["version"]
    s.sql("BEGIN")
    s.sql(
        "INSERT INTO t REPLACE WHERE k >= 10 "
        "SELECT k, CAST(0 AS bigint) AS v, 'x' AS tag "
        "FROM store_t WHERE k >= 12 AND k < 14"
    )
    s.sql("DELETE FROM u WHERE k = 1")
    out = s.sql("COMMIT")
    assert out["version"] == v0 + 1  # ONE version for both tables
    t_rows = _rows(spark, root)
    assert [r[0] for r in t_rows] == list(range(10)) + [12, 13]
    assert all(r[2] == "x" for r in t_rows if r[0] >= 10)
    assert sorted(r[0] for r in _rows(spark, root, "u")) == [0, 2, 3, 4]


def test_insert_overwrite_replaces_table(spark, tmp_path):
    """INSERT OVERWRITE replaces the whole table in one commit; keys
    carry forward (a later keyed merge works), prior versions stay
    readable, and it refuses to run inside a transaction block."""
    root = _seed(spark, tmp_path, "iow")
    s = store_sql(spark, root)
    v0 = publish.current_manifest(root)["version"]
    s.sql(
        "INSERT OVERWRITE t SELECT k, CAST(1 AS bigint) AS v, "
        "'ow' AS tag FROM store_t WHERE k < 4"
    )
    assert _rows(spark, root) == [
        (0, 1, "ow"), (1, 1, "ow"), (2, 1, "ow"), (3, 1, "ow")
    ]
    # keys carried: keyed DML still works without re-declaring
    s.sql("INSERT INTO t VALUES (50, 5, 'new')")
    assert (50, 5, "new") in _rows(spark, root)
    # time travel to the pre-overwrite state
    old = publish.read_table_at(spark, root, "t", v0)
    assert old.count() == 20
    s.sql("BEGIN")
    with pytest.raises(ValueError, match="cannot join"):
        s.sql("INSERT OVERWRITE t SELECT * FROM store_t")
    s.sql("ROLLBACK")


# --- materialized views (round 10: SQL front-end for the IVM layer) --------
def _mv_seed(spark, tmp_path, sub):
    root = str(tmp_path / sub)
    fact = spark.createDataFrame(
        [(1, "s1", 10, None), (2, "s1", 20, 5), (3, "s2", 5, 6)],
        "id bigint, shop string, val bigint, opt bigint",
    )
    dim = spark.createDataFrame(
        [("s1", "Berlin"), ("s2", "Oslo")], "shop string, city string"
    )
    publish.publish_tables(
        spark, {"orders": fact, "shops": dim}, root,
        table_keys={"orders": ["id"], "shops": ["shop"]},
    )
    return root


def test_create_matview_aggregate_seeds_and_refreshes_o_delta(spark, tmp_path):
    root = _mv_seed(spark, tmp_path, "mv_agg")
    sq = store_sql(spark, root)
    seed = sq.sql(
        "CREATE MATERIALIZED VIEW totals AS SELECT shop, COUNT(*) AS cnt, "
        "SUM(val) AS sum_val, MIN(val), MAX(val) FROM orders GROUP BY shop"
    )
    assert seed["mode"] == "seed"
    got = {r["shop"]: (r["cnt"], r["sum_val"], r["min_val"], r["max_val"])
           for r in sq.sql("SELECT * FROM store_totals").collect()}
    assert got == {"s1": (2, 30, 10, 20), "s2": (1, 5, 5, 5)}
    # delta: insert s2, update s1 value, delete nothing
    publish.merge_into(
        spark, root, "orders",
        spark.createDataFrame([(4, "s2", 7, None), (1, "s1", 11, None)],
                              "id bigint, shop string, val bigint, opt bigint"),
        keys=["id"],
    )
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    assert rep["errors"] == {}
    assert rep["views"]["totals"]["mode"] == "delta"
    got = {r["shop"]: (r["cnt"], r["sum_val"])
           for r in sq.sql("SELECT * FROM store_totals").collect()}
    assert got == {"s1": (2, 31), "s2": (2, 12)}


def test_create_matview_aggregate_where_slice(spark, tmp_path):
    root = _mv_seed(spark, tmp_path, "mv_agg_where")
    sq = store_sql(spark, root)
    sq.sql(
        "CREATE MATERIALIZED VIEW s1_totals AS SELECT shop, COUNT(*), "
        "SUM(val) FROM orders WHERE shop = 's1' AND val > 10 GROUP BY shop"
    )
    got = [tuple(r) for r in sq.sql(
        "SELECT shop, cnt, sum_val FROM store_s1_totals").collect()]
    assert got == [("s1", 1, 20)]
    # the registry persisted the predicate tree (JSON round-trip)
    from dataintegration_ecomprovider_spark.plans import materialize

    spec = materialize.declared_views(root)["s1_totals"]
    assert spec["src_where"] == [["shop", "=", "s1"], ["val", ">", 10]]


def test_create_matview_join_and_drop(spark, tmp_path):
    root = _mv_seed(spark, tmp_path, "mv_join")
    sq = store_sql(spark, root)
    r = sq.sql(
        "CREATE MATERIALIZED VIEW with_city AS SELECT orders.*, shops.city "
        "FROM orders LEFT JOIN shops ON orders.shop = shops.shop"
    )
    assert r["mode"] == "seed"
    got = {r["id"]: r["city"]
           for r in sq.sql("SELECT id, city FROM store_with_city").collect()}
    assert got == {1: "Berlin", 2: "Berlin", 3: "Oslo"}
    views = {r["view"]: r["kind"]
             for r in sq.sql("SHOW MATERIALIZED VIEWS").collect()}
    assert views == {"with_city": "join"}
    assert sq.sql("DROP MATERIALIZED VIEW with_city") == {"dropped": True}
    assert sq.sql("SHOW MATERIALIZED VIEWS").count() == 0
    # the data table survives the declaration drop (DROP TABLE owns it)
    assert publish.read_table(spark, root, "with_city").count() == 3


def test_create_matview_rejections(spark, tmp_path):
    root = _mv_seed(spark, tmp_path, "mv_rej")
    sq = store_sql(spark, root)
    with pytest.raises(ValueError, match="canonical column name 'sum_val'"):
        sq.sql("CREATE MATERIALIZED VIEW x AS SELECT shop, SUM(val) AS total "
               "FROM orders GROUP BY shop")
    with pytest.raises(ValueError, match="must appear in GROUP BY"):
        sq.sql("CREATE MATERIALIZED VIEW x AS SELECT city, COUNT(*) "
               "FROM orders GROUP BY shop")
    with pytest.raises(ValueError, match="already exists"):
        sq.sql("CREATE MATERIALIZED VIEW orders AS SELECT shop, COUNT(*) "
               "FROM orders GROUP BY shop")
    with pytest.raises(ValueError, match="unknown source table"):
        sq.sql("CREATE MATERIALIZED VIEW x AS SELECT shop, COUNT(*) "
               "FROM nope GROUP BY shop")
    # a keyless projection falls through to the per-row shape and is
    # rejected there (the declaration must not survive the failure)
    with pytest.raises(ValueError, match="carry the source key"):
        sq.sql("CREATE MATERIALIZED VIEW x AS SELECT shop FROM orders")
    from dataintegration_ecomprovider_spark.plans import materialize

    assert "x" not in materialize.declared_views(root)


def test_matview_statements_rejected_inside_transaction(spark, tmp_path):
    root = _mv_seed(spark, tmp_path, "mv_txn")
    with store_sql(spark, root).transaction(txn=("mv", 1)) as tx:
        with pytest.raises(ValueError, match="inside a transaction"):
            tx.sql("CREATE MATERIALIZED VIEW v AS SELECT shop, COUNT(*) "
                   "FROM orders GROUP BY shop")
        tx.sql("DELETE FROM orders WHERE id = 3")


def test_predicate_tree_parser():
    from dataintegration_ecomprovider_spark.plans.store_sql import (
        parse_predicate_tree,
    )

    assert parse_predicate_tree("a = 1") == [("a", "=", 1)]
    assert parse_predicate_tree("a == 1 AND b >= 2.5") == [
        ("a", "=", 1), ("b", ">=", 2.5)
    ]
    assert parse_predicate_tree(
        "(a < 1 OR b IN ('x', 'it''s')) AND NOT c IS NULL AND d != 7"
    ) == [
        ("or", ("a", "<", 1), ("b", "in", ["x", "it's"])),
        ("not", ("c", "is_null")),
        ("not", ("d", "=", 7)),
    ]
    assert parse_predicate_tree("a IS NOT NULL") == [("a", "is_not_null")]
    with pytest.raises(ValueError, match="literal"):
        parse_predicate_tree("a = b")
    with pytest.raises(ValueError, match="trailing|tokenize|unbalanced"):
        parse_predicate_tree("a = 1 extra ~~")


def test_explain_returns_plan_over_store_refs(spark, tmp_path):
    root = _mv_seed(spark, tmp_path, "mv_explain")
    sq = store_sql(spark, root)
    plan = sq.sql(
        "EXPLAIN FORMATTED SELECT shop, SUM(val) FROM store_orders "
        "WHERE shop = 's1' GROUP BY shop"
    ).collect()[0][0]
    assert "HashAggregate" in plan or "Aggregate" in plan
    # time-travel refs resolve before planning, like any SELECT
    v0 = sq.sql(
        "EXPLAIN SELECT * FROM store_orders VERSION AS OF 1"
    ).collect()[0][0]
    assert "Scan" in v0 or "Relation" in v0


def test_create_matview_projection_lifecycle(spark, tmp_path):
    """Per-row projection views (round 10): scalar-function view
    maintained O(batch) from CDC — updates re-project, deletes retract,
    rows filtered OUT by an update retract too."""
    root = _mv_seed(spark, tmp_path, "mv_proj")
    sq = store_sql(spark, root)
    seed = sq.sql(
        "CREATE MATERIALIZED VIEW order_feats AS SELECT id, "
        "val * 2 AS dbl, concat(shop, ':', cast(val as string)) AS tag "
        "FROM orders WHERE val >= 10"
    )
    assert seed["mode"] == "seed"
    got = {r["id"]: (r["dbl"], r["tag"])
           for r in sq.sql("SELECT * FROM store_order_feats").collect()}
    assert got == {1: (20, "s1:10"), 2: (40, "s1:20")}
    # update: row 1 leaves the filter, row 3 enters it; insert row 4;
    # delete row 2
    publish.merge_into_mor(
        spark, root, "orders",
        spark.createDataFrame(
            [(1, "s1", 5, None), (3, "s2", 50, None), (4, "s3", 11, None)],
            "id bigint, shop string, val bigint, opt bigint",
        ),
        keys=["id"],
        deletes=spark.createDataFrame([(2,)], "id bigint"),
    )
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    assert rep["errors"] == {}
    assert rep["views"]["order_feats"]["mode"] == "delta"
    got = {r["id"]: (r["dbl"], r["tag"])
           for r in sq.sql("SELECT * FROM store_order_feats").collect()}
    assert got == {3: (100, "s2:50"), 4: (22, "s3:11")}
    views = {r["view"]: r["kind"]
             for r in sq.sql("SHOW MATERIALIZED VIEWS").collect()}
    assert views == {"order_feats": "projection"}


def test_split_select_items_respects_parens_and_strings():
    from dataintegration_ecomprovider_spark.plans.store_sql import (
        _split_select_items,
    )

    assert _split_select_items(
        "id, round(val, 2) AS r, concat(a, ',', b) AS c, 'x,''y' AS s"
    ) == ["id", "round(val, 2) AS r", "concat(a, ',', b) AS c",
          "'x,''y' AS s"]


# --- AVG + HAVING matviews (round 11) ---------------------------------------
def test_create_matview_avg_having_lifecycle(spark, tmp_path):
    """AVG(c) maintains sum_<c> + cnt and derives avg_<c> at read time;
    HAVING is a read-time post-filter — groups enter and leave the slice
    as counts evolve with NO maintenance-path involvement."""
    root = _mv_seed(spark, tmp_path, "mv_avg")
    sq = store_sql(spark, root)
    seed = sq.sql(
        "CREATE MATERIALIZED VIEW shop_avg AS SELECT shop, COUNT(*) AS cnt, "
        "AVG(val) AS avg_val FROM orders GROUP BY shop HAVING cnt >= 2"
    )
    assert seed["mode"] == "seed"
    # s1: 2 rows avg 15; s2: 1 row — filtered by HAVING
    got = {r["shop"]: (r["cnt"], r["avg_val"])
           for r in sq.sql("SELECT * FROM store_shop_avg").collect()}
    assert got == {"s1": (2, 15.0)}
    # the PHYSICAL table keeps every group (sum_val + cnt + the non-null
    # count that is AVG's true denominator, no avg col)
    phys = publish.read_table(spark, root, "shop_avg")
    assert set(phys.columns) == {"shop", "cnt", "sum_val", "nncnt_val"}
    assert phys.count() == 2
    # delta: s2 gains a row -> enters the HAVING slice; s1 updates
    publish.merge_into(
        spark, root, "orders",
        spark.createDataFrame([(4, "s2", 7, None), (1, "s1", 16, None)],
                              "id bigint, shop string, val bigint, opt bigint"),
        keys=["id"],
    )
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    assert rep["errors"] == {} and rep["views"]["shop_avg"]["mode"] == "delta"
    got = {r["shop"]: (r["cnt"], r["avg_val"])
           for r in sq.sql("SELECT * FROM store_shop_avg").collect()}
    assert got == {"s1": (2, 18.0), "s2": (2, 6.0)}
    # deletes shrink s2 back out of the slice
    sq.sql("DELETE FROM orders WHERE id = 4")
    sq.sql("REFRESH MATERIALIZED VIEWS")
    got = {r["shop"]: r["avg_val"]
           for r in sq.sql("SELECT * FROM store_shop_avg").collect()}
    assert set(got) == {"s1"}


def test_create_matview_avg_nullable_matches_sql_avg(spark, tmp_path):
    """AVG over a NULLable column excludes NULLs from numerator AND
    denominator (ADVICE r11: dividing by COUNT(*) silently diverged from
    SELECT AVG(c)); an all-null group reads avg NULL, exactly SQL."""
    root = _mv_seed(spark, tmp_path, "mv_avg_null")
    sq = store_sql(spark, root)
    sq.sql(
        "CREATE MATERIALIZED VIEW shop_opt AS SELECT shop, COUNT(*) AS cnt, "
        "AVG(opt) AS avg_opt FROM orders GROUP BY shop"
    )
    # s1: opts (NULL, 5) -> avg 5.0 (NOT 2.5); s2: (6) -> 6.0
    got = {r["shop"]: (r["cnt"], r["avg_opt"])
           for r in sq.sql("SELECT * FROM store_shop_opt").collect()}
    assert got == {"s1": (2, 5.0), "s2": (1, 6.0)}
    # delta: s2's only non-null opt goes NULL -> whole group all-null
    publish.merge_into(
        spark, root, "orders",
        spark.createDataFrame([(3, "s2", 5, None)],
                              "id bigint, shop string, val bigint, opt bigint"),
        keys=["id"],
    )
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    assert rep["errors"] == {} and rep["views"]["shop_opt"]["mode"] == "delta"
    got = {r["shop"]: (r["cnt"], r["avg_opt"])
           for r in sq.sql("SELECT * FROM store_shop_opt").collect()}
    assert got == {"s1": (2, 5.0), "s2": (1, None)}


def test_matview_avg_schema_evolution_reseeds(spark, tmp_path):
    """A view whose physical table predates a maintained column (here:
    nncnt_<c>, simulated by dropping it) re-seeds on the next refresh
    instead of failing analysis or silently diverging (ADVICE r11)."""
    from dataintegration_ecomprovider_spark.plans import materialize

    root = _mv_seed(spark, tmp_path, "mv_avg_evo")
    sq = store_sql(spark, root)
    sq.sql(
        "CREATE MATERIALIZED VIEW shop_avg AS SELECT shop, COUNT(*) AS cnt, "
        "AVG(val) AS avg_val FROM orders GROUP BY shop"
    )
    # simulate a pre-round-12 physical table: republish without nncnt_val
    old = publish.read_table(spark, root, "shop_avg").drop("nncnt_val")
    publish.publish_tables(spark, {"shop_avg": old}, root)
    # advance the source so the refresh is not a noop
    publish.merge_into(
        spark, root, "orders",
        spark.createDataFrame([(9, "s2", 8, 1)],
                              "id bigint, shop string, val bigint, opt bigint"),
        keys=["id"],
    )
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    assert rep["errors"] == {} and rep["views"]["shop_avg"]["mode"] == "seed"
    got = {r["shop"]: r["avg_val"]
           for r in sq.sql("SELECT * FROM store_shop_avg").collect()}
    assert got == {"s1": 15.0, "s2": 6.5}


def test_create_matview_sum_expr_and_exact_distinct_lifecycle(spark, tmp_path):
    """SUM(<expr>) maintains the expression's sum exactly through the ±
    delta feed (old-side evaluated over __old values), and
    COUNT(DISTINCT c) is EXACT via the companion pair table, derived at
    read time; HAVING may reference the derived cntd column."""
    root = str(tmp_path / "mv_expr")
    fact = spark.createDataFrame(
        [(1, "s1", 10, 7), (2, "s1", 20, 7), (3, "s2", 5, 9), (4, "s1", 20, 8)],
        "id bigint, shop string, val bigint, cust bigint",
    )
    publish.publish_tables(
        spark, {"orders": fact}, root, table_keys={"orders": ["id"]}
    )
    sq = store_sql(spark, root)
    seed = sq.sql(
        "CREATE MATERIALIZED VIEW v AS SELECT shop, COUNT(*) AS cnt, "
        "SUM(val * 2 + 1) AS sum_x, COUNT(DISTINCT cust) AS cntd_cust "
        "FROM orders GROUP BY shop HAVING cntd_cust >= 1"
    )
    assert seed["mode"] == "seed"
    assert seed["companions"] == {"v__xd_cust": "seed"}
    got = {r["shop"]: (r["cnt"], r["sum_x"], r["cntd_cust"])
           for r in sq.sql("SELECT * FROM store_v").collect()}
    # s1: vals 10,20,20 -> 21+41+41 = 103; custs {7,8} -> 2
    assert got == {"s1": (3, 103, 2), "s2": (1, 11, 1)}
    # delta: row 3 moves s2->s1 with a NEW cust; row 4 deleted (its cust
    # 8 must leave the distinct set exactly)
    publish.merge_into_mor(
        spark, root, "orders",
        spark.createDataFrame([(3, "s1", 5, 11)],
                              "id bigint, shop string, val bigint, cust bigint"),
        keys=["id"],
        deletes=spark.createDataFrame([(4,)], "id bigint"),
    )
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    assert rep["errors"] == {} and rep["views"]["v"]["mode"] == "delta"
    assert rep["views"]["v"]["companions"] == {"v__xd_cust": "delta"}
    got = {r["shop"]: (r["cnt"], r["sum_x"], r["cntd_cust"])
           for r in sq.sql("SELECT * FROM store_v").collect()}
    # s1: rows {1,2,3}: 21+41+11 = 73; custs {7,11} -> 2; s2 retracted
    assert got == {"s1": (3, 73, 2)}


def test_matview_exact_distinct_ignores_nulls(spark, tmp_path):
    """COUNT(DISTINCT c) excludes NULLs (SQL); an all-null group reads 0."""
    root = str(tmp_path / "mv_cntd_null")
    fact = spark.createDataFrame(
        [(1, "s1", 7), (2, "s1", None), (3, "s2", None)],
        "id bigint, shop string, cust bigint",
    )
    publish.publish_tables(
        spark, {"orders": fact}, root, table_keys={"orders": ["id"]}
    )
    sq = store_sql(spark, root)
    sq.sql(
        "CREATE MATERIALIZED VIEW v AS SELECT shop, COUNT(*) AS cnt, "
        "COUNT(DISTINCT cust) AS cntd_cust FROM orders GROUP BY shop"
    )
    got = {r["shop"]: (r["cnt"], r["cntd_cust"])
           for r in sq.sql("SELECT * FROM store_v").collect()}
    assert got == {"s1": (2, 1), "s2": (1, 0)}


def test_matview_sum_expr_requires_alias_and_cntd_canonical(spark, tmp_path):
    root = _mv_seed(spark, tmp_path, "mv_expr_err")
    sq = store_sql(spark, root)
    with pytest.raises(ValueError, match="aggregate-view select items"):
        sq.sql(
            "CREATE MATERIALIZED VIEW v1 AS SELECT shop, COUNT(*) AS cnt, "
            "SUM(val * 2) FROM orders GROUP BY shop"
        )
    with pytest.raises(ValueError, match="canonical column name"):
        sq.sql(
            "CREATE MATERIALIZED VIEW v2 AS SELECT shop, COUNT(*) AS cnt, "
            "COUNT(DISTINCT val) AS n_vals FROM orders GROUP BY shop"
        )
    # neither failed CREATE may leave a declaration behind
    from dataintegration_ecomprovider_spark.plans import materialize

    assert not set(materialize.declared_views(root)) & {"v1", "v2"}


def test_matview_sum_expr_alias_collisions_fail_at_create(spark, tmp_path):
    """ADVICE r12: a SUM(<expr>) alias colliding with a canonical
    maintained column (cnt, sum_<c>, ...), a group column, or another
    expr alias must fail the CREATE with a clear message — not surface
    later as an opaque duplicate-column error at seed-publish time."""
    root = _mv_seed(spark, tmp_path, "mv_expr_alias")
    sq = store_sql(spark, root)
    bad = [
        "SUM(val * 2) AS cnt, COUNT(*) AS cnt",             # canonical cnt
        "SUM(val) AS sum_val, SUM(val * 2) AS sum_val",     # canonical sum_
        "SUM(val * 2) AS shop",                             # group column
        "SUM(val * 2) AS x, SUM(val * 3) AS x",             # duplicate alias
        "AVG(val) AS avg_val, SUM(val * 2) AS nncnt_val",   # avg companion
    ]
    for i, items in enumerate(bad):
        with pytest.raises(ValueError, match="collides"):
            sq.sql(
                f"CREATE MATERIALIZED VIEW bad{i} AS SELECT shop, {items} "
                "FROM orders GROUP BY shop"
            )
    from dataintegration_ecomprovider_spark.plans import materialize

    assert not set(materialize.declared_views(root)) & {
        f"bad{i}" for i in range(len(bad))
    }


def test_create_matview_star_rollup_lifecycle(spark, tmp_path):
    """Round-13 star rollup: ``SELECT dim.c, AGG(fact.x) FROM fact JOIN
    dim ... GROUP BY dim.c`` composes an internal join view feeding an
    aggregate view; one REFRESH pass keeps both current O(delta) through
    BOTH feeds — including a dim rename moving rows ACROSS groups."""
    root = _mv_seed(spark, tmp_path, "mv_rollup")
    sq = store_sql(spark, root)
    seed = sq.sql(
        "CREATE MATERIALIZED VIEW city_stats AS "
        "SELECT shops.city, COUNT(*) AS cnt, SUM(orders.val) AS sum_val "
        "FROM orders JOIN shops ON orders.shop = shops.shop "
        "GROUP BY shops.city"
    )
    assert seed["mode"] == "seed"
    assert seed["join_view"] == {"dst": "city_stats__j", "mode": "seed"}
    got = {r["city"]: (r["cnt"], r["sum_val"])
           for r in sq.sql("SELECT * FROM store_city_stats").collect()}
    assert got == {"Berlin": (2, 30), "Oslo": (1, 5)}
    # the internal join view is plumbing: hidden from SHOW
    shown = {r["view"] for r in sq.sql("SHOW MATERIALIZED VIEWS").collect()}
    assert shown == {"city_stats"}
    # fact delta (update + delete + insert) ...
    publish.merge_into_mor(
        spark, root, "orders",
        spark.createDataFrame(
            [(4, "s2", 40, None), (1, "s1", 15, None)],
            "id bigint, shop string, val bigint, opt bigint",
        ),
        keys=["id"],
        deletes=spark.createDataFrame([(3,)], "id bigint"),
    )
    # ... and a dim rename crossing groups: s2 moves Oslo -> Berlin
    publish.merge_into_mor(
        spark, root, "shops",
        spark.createDataFrame([("s2", "Berlin")], "shop string, city string"),
        keys=["shop"],
    )
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    assert rep["errors"] == {}
    assert rep["views"]["city_stats__j"]["mode"] == "delta"
    assert rep["views"]["city_stats"]["mode"] == "delta"
    got = {r["city"]: (r["cnt"], r["sum_val"])
           for r in sq.sql("SELECT * FROM store_city_stats").collect()}
    # rows now: (1,s1,15),(2,s1,20),(4,s2,40); both shops in Berlin —
    # the Oslo group retracted exactly, its rows folded into Berlin
    assert got == {"Berlin": (3, 75)}
    # DROP removes the rollup AND its internal join-view declaration
    assert sq.sql("DROP MATERIALIZED VIEW city_stats")["dropped"] is True
    from dataintegration_ecomprovider_spark.plans import materialize

    assert not set(materialize.declared_views(root)) & {
        "city_stats", "city_stats__j"
    }


def test_matview_rollup_rejects_unqualified_and_dim_where(spark, tmp_path):
    root = _mv_seed(spark, tmp_path, "mv_rollup_err")
    sq = store_sql(spark, root)
    with pytest.raises(ValueError, match="table-qualified"):
        sq.sql(
            "CREATE MATERIALIZED VIEW r1 AS SELECT shops.city, "
            "COUNT(*) AS cnt FROM orders JOIN shops ON "
            "orders.shop = shops.shop GROUP BY city"
        )
    with pytest.raises(ValueError, match="fact-side only"):
        sq.sql(
            "CREATE MATERIALIZED VIEW r2 AS SELECT shops.city, "
            "COUNT(*) AS cnt FROM orders JOIN shops ON "
            "orders.shop = shops.shop WHERE shops.city = 'Oslo' "
            "GROUP BY shops.city"
        )
    from dataintegration_ecomprovider_spark.plans import materialize

    assert not set(materialize.declared_views(root)) & {
        "r1", "r1__j", "r2", "r2__j"
    }


def test_create_matview_avg_with_explicit_sum_dedups(spark, tmp_path):
    """SUM(val) and AVG(val) in one view maintain ONE sum_val column."""
    root = _mv_seed(spark, tmp_path, "mv_avg_sum")
    sq = store_sql(spark, root)
    sq.sql(
        "CREATE MATERIALIZED VIEW both_v AS SELECT shop, COUNT(*) AS cnt, "
        "SUM(val) AS sum_val, AVG(val) AS avg_val FROM orders GROUP BY shop"
    )
    got = {r["shop"]: (r["sum_val"], r["avg_val"])
           for r in sq.sql("SELECT * FROM store_both_v").collect()}
    assert got == {"s1": (30, 15.0), "s2": (5, 5.0)}
    phys_cols = set(publish.read_table(spark, root, "both_v").columns)
    assert phys_cols == {"shop", "cnt", "sum_val", "nncnt_val"}


def test_create_matview_avg_canonical_alias_enforced(spark, tmp_path):
    root = _mv_seed(spark, tmp_path, "mv_avg_alias")
    sq = store_sql(spark, root)
    with pytest.raises(ValueError, match="canonical column name 'avg_val'"):
        sq.sql("CREATE MATERIALIZED VIEW x AS SELECT shop, COUNT(*) AS cnt, "
               "AVG(val) AS mean_val FROM orders GROUP BY shop")


def test_create_matview_bad_having_leaves_no_declaration(spark, tmp_path):
    from dataintegration_ecomprovider_spark.plans import materialize

    root = _mv_seed(spark, tmp_path, "mv_bad_having")
    sq = store_sql(spark, root)
    with pytest.raises(Exception):
        sq.sql("CREATE MATERIALIZED VIEW x AS SELECT shop, COUNT(*) AS cnt "
               "FROM orders GROUP BY shop HAVING nope > 1")
    assert "x" not in materialize.declared_views(root)
    # and the failed CREATE published NO table either (validation is
    # plan-time, before declare/seed)
    assert "x" not in publish.current_manifest(root)["tables"]
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    assert rep["errors"] == {}


def test_create_matview_seed_failure_rolls_back_all_branches(spark, tmp_path):
    """A WHERE column absent from the source passes the syntax-only
    predicate parse but fails at seed — the aggregate AND join branches
    must drop the declaration like the projection branch always did
    (round-10 ADVICE)."""
    from dataintegration_ecomprovider_spark.plans import materialize

    root = _mv_seed(spark, tmp_path, "mv_seed_fail")
    sq = store_sql(spark, root)
    with pytest.raises(Exception):
        sq.sql("CREATE MATERIALIZED VIEW agg_bad AS SELECT shop, COUNT(*) "
               "FROM orders WHERE ghost_col = 1 GROUP BY shop")
    with pytest.raises(Exception):
        sq.sql("CREATE MATERIALIZED VIEW join_bad AS "
               "SELECT orders.*, shops.city FROM orders "
               "LEFT JOIN shops ON orders.shop = shops.shop "
               "WHERE ghost_col = 1")
    views = materialize.declared_views(root)
    assert "agg_bad" not in views and "join_bad" not in views
    rep = sq.sql("REFRESH MATERIALIZED VIEWS")
    assert rep["errors"] == {}


def test_predicate_tree_parser_tolerates_surrounding_whitespace():
    from dataintegration_ecomprovider_spark.plans.store_sql import (
        parse_predicate_tree,
    )

    assert parse_predicate_tree("a = 1 ") == [("a", "=", 1)]
    assert parse_predicate_tree("  a = 1\n") == [("a", "=", 1)]


def test_sql_matview_avg_registry_query_matches_oracle(spark, oracle):
    # folded into u12_sql_matview_expr (round-12 governance) — the
    # oracle keeps value-checking here and in test_retired_fastpaths
    from dataintegration_ecomprovider_spark.plans.registry import all_queries
    from tests.conftest import SF_DIR, assert_frames_match

    qd = all_queries(include_retired=True)["u12_sql_matview_avg"]
    assert_frames_match(
        qd.fn(spark, SF_DIR).toPandas(),
        oracle.execute(qd.oracle).fetchdf(),
        "u12_sql_matview_avg",
    )


def test_sql_matview_expr_registry_query_matches_oracle(spark, oracle):
    from dataintegration_ecomprovider_spark.plans.registry import all_queries
    from tests.conftest import SF_DIR, assert_frames_match

    qd = all_queries()["u12_sql_matview_expr"]
    assert_frames_match(
        qd.fn(spark, SF_DIR).toPandas(),
        oracle.execute(qd.oracle).fetchdf(),
        "u12_sql_matview_expr",
    )


def test_matview_having_can_reference_derived_avg(spark, tmp_path):
    """HAVING applies AFTER avg derivation in the read overlay, so it
    can filter on avg_<c> itself — the natural SQL reading."""
    root = _mv_seed(spark, tmp_path, "mv_avg_having_on_avg")
    sq = store_sql(spark, root)
    sq.sql(
        "CREATE MATERIALIZED VIEW rich AS SELECT shop, COUNT(*) AS cnt, "
        "AVG(val) AS avg_val FROM orders GROUP BY shop "
        "HAVING avg_val > 10"
    )
    got = {r["shop"]: r["avg_val"]
           for r in sq.sql("SELECT * FROM store_rich").collect()}
    assert got == {"s1": 15.0}  # s2 avg 5.0 filtered out
