"""The store's commit protocol (plans/commit_protocol.py): the seam U12's
atomicity rests on — advisory lock + atomic manifest swap on POSIX, a CAS
backend for object stores.

Fault-injection coverage pinned here:
- a crashed holder's stale lock is taken over by EXACTLY ONE of many
  simultaneous waiters (the token-guarded reap — the un-guarded unlink
  let two takers interleave so one removed the other's fresh lock,
  yielding two concurrent commit critical sections);
- a reaped (stalled-past-staleness) holder's release never removes the
  new holder's lock;
- a crash between staging and the manifest swap leaves the previous
  version fully readable, and a retry commits cleanly;
- based_on CAS: a swap based on a version the store moved past is
  rejected (lost-update guard);
- the InMemoryCasProtocol backend runs full store lifecycles through the
  seam — proving no store code path bypasses it with raw file access.
"""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.plans import publish
from dataintegration_ecomprovider_spark.plans.commit_protocol import (
    CommitConflict,
    InMemoryCasProtocol,
    LOCK_FILE,
    PosixCommitProtocol,
    protocol_for,
    set_protocol,
)


def _age(path: str, seconds: float) -> None:
    past = time.time() - seconds
    os.utime(path, (past, past))


def _plant_stale_lock(root: str, token: str = "deadbeef", age: float = 400.0) -> str:
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, LOCK_FILE)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(token)
    _age(path, age)
    return path


def test_stale_lock_single_taker_under_contention(tmp_path):
    """A crashed writer's lock + N simultaneous waiters: every waiter
    eventually acquires, and the critical section is NEVER concurrently
    held — the exact race the un-guarded takeover had."""
    root = str(tmp_path / "store")
    _plant_stale_lock(root)
    proto = PosixCommitProtocol()
    holders = []
    max_holders = []
    mu = threading.Lock()
    errors = []

    def worker(i):
        try:
            with proto.lock(root, timeout=30.0, stale=300.0):
                with mu:
                    holders.append(i)
                    max_holders.append(len(holders))
                time.sleep(0.01)  # widen any double-acquire window
                with mu:
                    holders.remove(i)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert max(max_holders) == 1  # never two concurrent critical sections
    assert len(max_holders) == 8  # everyone got through
    assert not os.path.exists(os.path.join(root, LOCK_FILE))


def test_reap_never_removes_fresh_lock(tmp_path):
    """The exact round-7 race, interleaved deterministically: waiter A
    observes the crashed holder's stale token, but BEFORE A acts, waiter
    B reaps the lock and writer C acquires a fresh one.  A's reap must
    leave C's lock alone — the un-guarded unlink removed it, yielding
    two concurrent commit critical sections."""
    root = str(tmp_path / "store")
    _plant_stale_lock(root, token="A-stale")
    path = os.path.join(root, LOCK_FILE)

    # replay the protocol's own reap steps with the race injected between
    # the observe-read and the intent claim
    class Interleaved(PosixCommitProtocol):
        def _maybe_reap(self, p, stale):
            if time.time() - os.path.getmtime(p) <= stale:
                return
            with open(p, encoding="utf-8") as fh:
                observed = fh.read()
            # ... B wins here: reaps the stale lock; C acquires fresh
            os.unlink(p)
            with open(p, "w", encoding="utf-8") as fh:
                fh.write("C-token")
            _age(p, 400.0)  # worst case: C's lock even LOOKS stale
            intent = p + ".reap-" + observed[:32]
            os.close(os.open(intent, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            try:
                # the token guard under the claimed intent
                with open(p, encoding="utf-8") as fh:
                    if fh.read() == observed:
                        os.unlink(p)
            finally:
                os.unlink(intent)

    Interleaved()._maybe_reap(path, 300.0)
    # C's lock survived A's reap
    with open(path, encoding="utf-8") as fh:
        assert fh.read() == "C-token"


def test_reap_intent_is_single_claimant_per_token(tmp_path):
    """Only one waiter ever claims the reap intent for a given token; a
    second waiter observing the same stale token backs off."""
    root = str(tmp_path / "store")
    path = _plant_stale_lock(root, token="T1")
    proto = PosixCommitProtocol()
    # a live claimant already holds the intent for T1
    intent = path + ".reap-T1"
    os.close(os.open(intent, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
    proto._maybe_reap(path, stale=300.0)
    assert os.path.exists(path)  # backed off — lock untouched
    # the claimant crashed: its intent goes stale and is reclaimed, then
    # the next pass reaps the lock normally
    _age(intent, 400.0)
    proto._maybe_reap(path, stale=300.0)  # reclaims the stale intent
    proto._maybe_reap(path, stale=300.0)  # now reaps the lock
    assert not os.path.exists(path)
    assert not os.path.exists(intent)


def test_stalled_holder_release_leaves_new_lock_alone(tmp_path):
    """A holder that stalled past the staleness window and was reaped
    must not unlink the NEW holder's lock at release time."""
    root = str(tmp_path / "store")
    os.makedirs(root, exist_ok=True)
    proto = PosixCommitProtocol()
    path = os.path.join(root, LOCK_FILE)
    with proto.lock(root):
        # while "stalled": the lock is reaped and re-acquired by another
        os.unlink(path)
        with open(path, "w", encoding="utf-8") as fh:
            fh.write("newholder")
    # release was token-guarded: the new holder's lock survives
    with open(path, encoding="utf-8") as fh:
        assert fh.read() == "newholder"
    os.unlink(path)


def test_crash_between_stage_and_swap_keeps_old_version(spark, tmp_path):
    """kill -9 between staging and the manifest swap: the previous
    version stays fully readable, no partial state is visible, the lock
    is not left held (the crash is simulated at the swap boundary, after
    which the writer process is gone), and a retry commits cleanly."""
    root = str(tmp_path / "store")
    df1 = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    publish.publish_tables(spark, {"t": df1}, root, table_keys={"t": ["k"]})
    v1 = publish.current_manifest(root)["version"]

    class CrashAtSwap(PosixCommitProtocol):
        def swap_manifest(self, r, txid, manifest, based_on=None):
            raise OSError("simulated crash at the commit point")

    df2 = spark.range(5).select(F.col("id").alias("k"), F.lit(2).alias("v"))
    set_protocol(root, CrashAtSwap())
    try:
        with pytest.raises(OSError, match="simulated crash"):
            publish.publish_tables(spark, {"t": df2}, root)
    finally:
        set_protocol(root, None)
    # old version intact and readable; the failed txid's staging is
    # invisible (it lives under data/<txid>/ which no manifest references)
    assert publish.current_manifest(root)["version"] == v1
    got = {r["k"]: r["v"] for r in publish.read_table(spark, root, "t").collect()}
    assert got == {i: 1 for i in range(10)}
    assert not os.path.exists(os.path.join(root, LOCK_FILE))
    # retry succeeds
    publish.publish_tables(spark, {"t": df2}, root)
    assert publish.read_table(spark, root, "t").count() == 5


def test_based_on_cas_rejects_moved_manifest(tmp_path):
    """swap_manifest(based_on=N) is refused once the live version moved
    past N — the lost-update guard a reaped-but-alive writer hits."""
    root = str(tmp_path / "store")
    os.makedirs(root, exist_ok=True)
    proto = PosixCommitProtocol()
    proto.swap_manifest(root, "tx1", {"version": 1, "tables": {}}, based_on=0)
    proto.swap_manifest(root, "tx2", {"version": 2, "tables": {}}, based_on=1)
    with pytest.raises(CommitConflict):
        proto.swap_manifest(
            root, "tx3", {"version": 2, "tables": {"x": "p"}}, based_on=1
        )
    # the refused swap left no temp residue and did not move the manifest
    assert proto.read_manifest(root)["version"] == 2
    assert [f for f in os.listdir(root) if f.startswith("MANIFEST.json.tmp")] == []


def test_inmemory_cas_runs_full_store_lifecycle(spark, tmp_path):
    """The object-store-shaped CAS backend carries a full store
    lifecycle — publish, MoR merge, CDC read, time travel, constraints,
    sync state — proving every store code path commits and reads through
    the CommitProtocol seam (raw MANIFEST.json access would diverge:
    the in-memory backend never writes one)."""
    root = str(tmp_path / "store")
    proto = InMemoryCasProtocol()
    set_protocol(root, proto)
    try:
        df = spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        publish.publish_tables(spark, {"t": df}, root, table_keys={"t": ["k"]})
        assert not os.path.exists(os.path.join(root, publish.MANIFEST))
        publish.merge_into_mor(
            spark, root, "t",
            spark.createDataFrame([(1, 111), (50, 500)], "k long, v long"),
            deletes=spark.createDataFrame([(2,)], "k long"),
        )
        got = {r["k"]: r["v"] for r in publish.read_table(spark, root, "t").collect()}
        assert got[1] == 111 and got[50] == 500 and 2 not in got
        # time travel + CDC still work (manifest history via the seam)
        assert publish.read_table_at(spark, root, "t", 1).count() == 20
        changes = publish.read_changes(spark, root, "t", from_version=1)
        kinds = {(r["k"]): r["change_type"] for r in changes.collect()}
        assert kinds[50] == "insert" and kinds[2] == "delete"
        # sync-state aux rides the seam too
        publish._set_sync_state(root, "cursor", 7)
        assert publish._sync_state(root) == {"cursor": 7}
        assert not os.path.exists(os.path.join(root, publish.SYNC_FILE))
    finally:
        set_protocol(root, None)


def test_inmemory_cas_detects_racing_writers(tmp_path):
    """Two writers based on the same version: the CAS admits one and
    rejects the other with CommitConflict — the object-store story where
    no advisory lock exists."""
    root = "mem://race"
    proto = InMemoryCasProtocol()
    proto.swap_manifest(root, "t0", {"version": 1, "tables": {}}, based_on=0)
    proto.swap_manifest(root, "t1", {"version": 2, "tables": {"a": "p"}},
                        based_on=1)
    with pytest.raises(CommitConflict):
        proto.swap_manifest(root, "t2", {"version": 2, "tables": {"b": "q"}},
                            based_on=1)
    assert proto.conflicts == 1
    assert proto.read_manifest(root)["tables"] == {"a": "p"}


def test_protocol_registry_scoped_per_root(tmp_path):
    """set_protocol registers per store root; other roots keep the POSIX
    default; clearing restores it."""
    proto = InMemoryCasProtocol()
    set_protocol("mem://a", proto)
    try:
        assert protocol_for("mem://a") is proto
        assert isinstance(protocol_for(str(tmp_path)), PosixCommitProtocol)
    finally:
        set_protocol("mem://a", None)
    assert isinstance(protocol_for("mem://a"), PosixCommitProtocol)


def test_lock_timeout_still_raises(tmp_path):
    """A FRESH (non-stale) foreign lock is honored until timeout."""
    root = str(tmp_path / "store")
    _plant_stale_lock(root, token="live", age=0.0)
    proto = PosixCommitProtocol()
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        with proto.lock(root, timeout=0.3):
            pass
    assert time.monotonic() - t0 >= 0.3
    # the foreign lock was not disturbed
    with open(os.path.join(root, LOCK_FILE), encoding="utf-8") as fh:
        assert fh.read() == "live"


def _lock_worker(args):
    """Module-level so multiprocessing can pickle it: acquire the lock,
    record enter/exit in an O_APPEND log (atomic per write), hold
    briefly."""
    root, idx = args
    import os as _os
    import time as _time

    from dataintegration_ecomprovider_spark.plans.commit_protocol import (
        PosixCommitProtocol,
    )

    proto = PosixCommitProtocol()
    log = _os.path.join(root, "events.log")
    with proto.lock(root, timeout=60.0, stale=300.0):
        fd = _os.open(log, _os.O_WRONLY | _os.O_APPEND | _os.O_CREAT)
        _os.write(fd, f"enter {idx}\n".encode())
        _os.close(fd)
        _time.sleep(0.02)
        fd = _os.open(log, _os.O_WRONLY | _os.O_APPEND)
        _os.write(fd, f"exit {idx}\n".encode())
        _os.close(fd)
    return idx


def test_stale_lock_takeover_across_processes(tmp_path):
    """REAL processes (not GIL-sharing threads) race over a crashed
    writer's stale lock: every worker eventually enters, and the
    enter/exit log shows zero overlapping critical sections — the
    cross-process form of the token-guarded reap guarantee."""
    import multiprocessing as mp

    root = str(tmp_path / "store")
    _plant_stale_lock(root)
    ctx = mp.get_context("spawn")
    with ctx.Pool(6) as pool:
        done = pool.map(_lock_worker, [(root, i) for i in range(6)])
    assert sorted(done) == list(range(6))
    events = open(os.path.join(root, "events.log"), encoding="utf-8").read().split()
    pairs = list(zip(events[::2], events[1::2]))
    depth = 0
    for kind, _idx in pairs:
        depth += 1 if kind == "enter" else -1
        assert 0 <= depth <= 1, f"overlapping critical sections: {pairs}"
    assert depth == 0 and len(pairs) == 12
    assert not os.path.exists(os.path.join(root, LOCK_FILE))
