"""Multi-writer concurrency over one store root: the commit protocol's
small critical sections must serialize concurrent writers WITHOUT losing
updates — across tables, within one table (CAS retry), and under
duplicate-transaction races."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.plans import publish


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


def test_concurrent_mor_writers_on_different_tables(spark, tmp_path):
    """4 threads × 3 MoR merges each on 4 different tables: every delta
    lands (deltas are staged outside the lock, appended under it), no
    writer overwrites another's manifest entry."""
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {f"t{i}": _df(spark, [(0, 0)]) for i in range(4)},
        root, table_keys={f"t{i}": ["k"] for i in range(4)},
    )
    v0 = publish.current_manifest(root)["version"]

    def writer(i: int) -> None:
        for j in range(3):
            publish.merge_into_mor(
                spark, root, f"t{i}", _df(spark, [(j + 1, i * 100 + j)])
            )

    with ThreadPoolExecutor(4) as pool:
        list(pool.map(writer, range(4)))

    m = publish.current_manifest(root)
    assert m["version"] == v0 + 12  # every commit its own version
    for i in range(4):
        assert len(m["tables"][f"t{i}"]["deltas"]) == 3
        got = {
            (r["k"], r["v"])
            for r in publish.read_table(spark, root, f"t{i}").collect()
        }
        assert got == {(0, 0)} | {(j + 1, i * 100 + j) for j in range(3)}


def test_concurrent_cow_merges_same_table_lose_nothing(spark, tmp_path):
    """6 concurrent copy-on-write merges with disjoint keys into ONE
    table: merge_into's CAS-retry (expected_version + re-read) must land
    all 6 key sets — the read-modify-write lost-update hazard."""
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": _df(spark, [(0, 0)])}, root, table_keys={"t": ["k"]}
    )

    def writer(i: int) -> None:
        publish.merge_into(
            spark, root, "t", _df(spark, [(i + 1, i), (i + 101, i)])
        )

    with ThreadPoolExecutor(6) as pool:
        list(pool.map(writer, range(6)))

    got = {r["k"] for r in publish.read_table(spark, root, "t").collect()}
    assert got == {0} | {i + 1 for i in range(6)} | {i + 101 for i in range(6)}


def test_duplicate_txn_race_commits_exactly_once(spark, tmp_path):
    """6 threads race the SAME (app, batch) txn with DIFFERENT payloads:
    exactly one delta may land (the lock-guarded watermark gate), and the
    losers' staged files are cleaned up."""
    import glob
    import os

    root = str(tmp_path / "store")
    publish.publish_tables(
        spark, {"t": _df(spark, [(0, 0)])}, root, table_keys={"t": ["k"]}
    )
    n_dirs_before = len(glob.glob(os.path.join(root, "data", "*")))

    def writer(i: int) -> dict:
        return publish.merge_into_mor(
            spark, root, "t", _df(spark, [(99, i)]), txn=("race", 5)
        )

    with ThreadPoolExecutor(6) as pool:
        results = list(pool.map(writer, range(6)))

    skipped = [r for r in results if r.get("txn_skipped")]
    committed = [r for r in results if not r.get("txn_skipped")]
    assert len(committed) == 1 and len(skipped) == 5
    m = publish.current_manifest(root)
    assert len(m["tables"]["t"]["deltas"]) == 1
    assert m["txns"] == {"race": 5}
    # exactly one winner's staging directory remains
    assert (
        len(glob.glob(os.path.join(root, "data", "*"))) == n_dirs_before + 1
    )
    got = {r["k"] for r in publish.read_table(spark, root, "t").collect()}
    assert got == {0, 99}


def test_concurrent_publish_and_maintenance(spark, tmp_path):
    """A compacting maintainer racing three MoR writers: compaction's
    rewrite_of provenance and the writers' delta appends interleave under
    the lock without corrupting reconstruction."""
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark,
        {"t": spark.range(200).select(
            F.col("id").alias("k"), F.lit(0).alias("v"))},
        root, table_keys={"t": ["k"]},
    )

    def writer(i: int) -> None:
        publish.merge_into_mor(
            spark, root, "t", _df(spark, [(1000 + i, i), (i, i + 1)])
        )

    def maintainer(_: int) -> None:
        publish.compact(spark, root, "t")

    with ThreadPoolExecutor(4) as pool:
        futs = [pool.submit(writer, i) for i in range(3)]
        futs.append(pool.submit(maintainer, 0))
        for f in futs:
            f.result()

    df = publish.read_table(spark, root, "t")
    assert df.count() == 203
    got = {r["k"]: r["v"] for r in df.collect()}
    for i in range(3):
        assert got[1000 + i] == i and got[i] == i + 1
