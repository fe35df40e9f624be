"""U12 — multi-table atomic publish (stage → validate → swap).

The reference wraps its whole merge phase in one SqlTransaction
(src/EcomProvider.cs:1018-1036, rollback :1072-1073).  Spark has no
cross-table transaction, so the engine provides the same all-or-nothing
visibility with a manifest swap (SURVEY §4 "custom work #1"):

1. every output table is written to ``<root>/data/<txid>/<table>/`` —
   staging is invisible to readers;
2. each staged table is validated (re-readable, expected schema, row-count
   invariants) while still invisible;
3. a single atomic ``os.replace`` of the MANIFEST file flips every table to
   the new version at once.  A crash anywhere before step 3 leaves the
   previous version fully intact; old versions remain for time-travel /
   rollback until vacuumed.

At 100 TB this costs nothing extra: the data write happens once (Spark's
normal parquet job commit), and the swap is one metadata rename — the same
pattern Delta/Iceberg use for their commit step.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import uuid
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "MANIFEST.json"


class ValidationError(RuntimeError):
    pass


class ConcurrentPublishError(RuntimeError):
    """The manifest advanced past the version a CAS publish expected —
    another writer committed first.  Re-read and retry (merge_into does)."""


def _manifest_path(root: str) -> str:
    return os.path.join(root, MANIFEST)


@contextlib.contextmanager
def _manifest_lock(root: str, timeout: float = 60.0, stale: float = 300.0):
    """Advisory commit lock: serializes the read-manifest → build → swap
    critical section across processes on the same store root (O_CREAT|
    O_EXCL is atomic on POSIX and most shared filesystems).  Only the
    COMMIT is serialized — staging writes and validation run fully
    concurrently outside it, so the lock is held for milliseconds.  A lock
    older than `stale` seconds is presumed abandoned (crashed writer) and
    taken over."""
    path = os.path.join(root, ".MANIFEST.lock")
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(path) > stale:
                    os.unlink(path)
                    continue
            except OSError:
                continue  # holder released between the existence check and stat
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"could not acquire manifest lock {path} within {timeout}s"
                )
            time.sleep(0.02)
    try:
        yield
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass


def current_manifest(root: str) -> dict:
    path = _manifest_path(root)
    if not os.path.exists(path):
        return {"version": 0, "txid": None, "tables": {}}
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def _read_entry(spark: SparkSession, entry) -> DataFrame:
    """Resolve one manifest table entry.  Plain string = parquet path;
    dict = metadata-carrying entry ({"path", optional "table" +
    "bucket_keys" + "num_buckets" for bucketed tables, optional "keys"}).
    Bucketed tables read via the session catalog so bucket metadata
    survives and joins on the bucket keys skip their Exchange.  If the
    catalog entry is gone (new session against an old manifest), fall back
    to the parquet path — correct, just without the bucket co-location."""
    if isinstance(entry, str):
        return spark.read.parquet(entry)
    if "table" in entry:
        try:
            return spark.table(entry["table"])
        except Exception:
            pass
    return spark.read.parquet(entry["path"])


def table_keys(root: str, name: str) -> list[str] | None:
    """The key columns recorded for `name` in the current manifest (the
    store-level analog of the reference's IsPrimaryKey schema flags,
    src/EcomProvider.cs:393-406), or None if never declared.  Recorded at
    publish time (publish_tables(table_keys=...) or any merge_into /
    bucketed publish) and carried forward across versions, so CDC reads
    and incremental merges need no caller-side key bookkeeping."""
    manifest = current_manifest(root)
    entry = manifest["tables"].get(name)
    if isinstance(entry, dict):
        keys = entry.get("keys") or entry.get("bucket_keys")
        if keys:
            # bucket keys may be materialized __k_ norm columns; report
            # the logical key names
            return [k[4:] if k.startswith("__k_") else k for k in keys]
    return None


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read the current committed version of `name` (readers never see
    in-flight staging directories)."""
    manifest = current_manifest(root)
    if name not in manifest["tables"]:
        raise KeyError(f"table {name!r} has no committed version under {root}")
    return _read_entry(spark, manifest["tables"][name])


def publish_tables(
    spark: SparkSession,
    outputs: Mapping[str, DataFrame],
    root: str,
    validators: Mapping[str, Callable[[DataFrame], None]] | None = None,
    bucket_keys: Mapping[str, list] | None = None,
    num_buckets: int = 32,
    table_keys: Mapping[str, Sequence[str]] | None = None,
    expected_version: int | None = None,
) -> dict:
    """Stage every output, validate, then commit with one manifest swap.

    Concurrency: the commit (read-latest-manifest → chain → swap) runs
    under an advisory lock, so concurrent publishers to the SAME root
    serialize and never lose each other's tables.  `expected_version`
    adds compare-and-swap semantics: the commit aborts with
    ConcurrentPublishError if the store moved past that version while
    this publish was staging — the read-modify-write guard merge_into
    uses to retry instead of silently overwriting a concurrent merge.

    `validators[name]` is called with the RE-READ staged DataFrame and
    raises to abort the whole publish (nothing becomes visible — the
    reference's rollback).  Returns the new manifest.

    `bucket_keys[name]` publishes that table BUCKETED on those columns
    (an external table at the staged path, registered per-version in the
    session catalog): the next job's merge against it — and any reader
    joining on the keys — skips its Exchange.  This closes the loop with
    run_job(bucketed_staging=True): destination tables round-trip through
    publish/read_table without ever re-shuffling on their merge keys,
    the analog of the reference keeping destination tables indexed on
    their keys across job runs.  For case-insensitive STRING merge keys,
    bucket on the materialized `__k_<key>` norm columns (see
    operators/bucketing.norm_bucket_columns) — bucketing the raw casing
    co-locates nothing for a ci() comparison.

    `table_keys[name]` records that table's logical key columns in the
    manifest (see table_keys()): CDC reads and incremental merges then
    need no caller-side key bookkeeping.  Keys recorded by a previous
    version carry forward automatically — declare once per table, not per
    publish.
    """
    os.makedirs(root, exist_ok=True)
    txid = f"{int(time.time() * 1000):x}-{uuid.uuid4().hex[:8]}"
    staged_paths: dict[str, object] = {}
    prev = current_manifest(root)

    def _keys_for(name: str) -> list[str] | None:
        if table_keys and name in table_keys:
            return list(table_keys[name])
        prev_entry = prev["tables"].get(name)
        if isinstance(prev_entry, dict) and prev_entry.get("keys"):
            return list(prev_entry["keys"])
        return None

    for name, df in outputs.items():
        path = os.path.join(root, "data", txid, name)
        keys_meta = _keys_for(name)
        if bucket_keys and name in bucket_keys:
            keys = list(bucket_keys[name])
            tname = f"pub_{name}_{txid}".replace("-", "_")
            (
                df.repartition(num_buckets, *keys)
                .write.mode("errorifexists")
                .bucketBy(num_buckets, *keys)
                .sortBy(*keys)
                .option("path", path)
                .saveAsTable(tname)
            )
            entry: dict = {
                "path": path, "table": tname,
                "bucket_keys": keys, "num_buckets": num_buckets,
            }
            if keys_meta:
                entry["keys"] = keys_meta
            staged_paths[name] = entry
        elif keys_meta:
            df.write.mode("errorifexists").parquet(path)
            staged_paths[name] = {"path": path, "keys": keys_meta}
        else:
            df.write.mode("errorifexists").parquet(path)
            staged_paths[name] = path

    for name, entry in staged_paths.items():
        staged = _read_entry(spark, entry)
        if not staged.schema.fields:
            raise ValidationError(f"{name}: staged table has no columns")
        if validators and name in validators:
            validators[name](staged)

    # commit critical section: re-read the manifest as it stands NOW
    # (staging/validation may be long) and chain the swap off it, under
    # the advisory lock so concurrent publishers serialize
    with _manifest_lock(root):
        prev = current_manifest(root)
        if expected_version is not None and prev["version"] != expected_version:
            raise ConcurrentPublishError(
                f"store at version {prev['version']}, expected "
                f"{expected_version} — another writer committed first"
            )
        manifest = {
            "version": prev["version"] + 1,
            "txid": txid,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            # carry forward tables not touched by this publish (the
            # reference's transaction only touches staged tables; others
            # keep their state)
            "tables": {**prev["tables"], **staged_paths},
            # committed-version history: staged data dirs are never
            # rewritten, so old versions stay readable (time travel /
            # rollback) until a vacuum prunes them
            "history": (
                prev.get("history", [])
                + [{"version": prev["version"], "txid": prev.get("txid"), "tables": prev["tables"]}]
                if prev["version"] else []
            ),
        }
        return _commit(root, txid, manifest)


def _commit(root: str, txid: str, manifest: dict) -> dict:
    tmp = _manifest_path(root) + f".tmp-{txid}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, _manifest_path(root))  # the atomic commit point
    return manifest


def read_table_at(spark: SparkSession, root: str, name: str, version: int) -> DataFrame:
    """Time travel: read `name` as of a committed version."""
    manifest = current_manifest(root)
    if manifest["version"] == version:
        tables = manifest["tables"]
    else:
        matches = [h for h in manifest.get("history", []) if h["version"] == version]
        if not matches:
            raise KeyError(f"version {version} not in history under {root}")
        tables = matches[0]["tables"]
    if name not in tables:
        raise KeyError(f"table {name!r} absent at version {version}")
    return _read_entry(spark, tables[name])


def rollback(root: str, version: int) -> dict:
    """Re-commit an older version's table map as a NEW version (the data
    dirs are immutable, so rollback is another manifest swap), serialized
    against concurrent publishers by the commit lock."""
    with _manifest_lock(root):
        manifest = current_manifest(root)
        matches = [h for h in manifest.get("history", []) if h["version"] == version]
        if not matches:
            raise KeyError(f"version {version} not in history under {root}")
        txid = f"rollback-{version}-{uuid.uuid4().hex[:8]}"
        new = {
            "version": manifest["version"] + 1,
            "txid": txid,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "tables": matches[0]["tables"],
            "history": manifest.get("history", []) + [
                {"version": manifest["version"], "txid": manifest.get("txid"),
                 "tables": manifest["tables"]}
            ],
        }
        return _commit(root, txid, new)


def vacuum(spark: SparkSession, root: str, keep_versions: int = 2) -> dict:
    """Prune history: keep the current version plus the newest
    `keep_versions - 1` historical versions; delete data directories (and
    drop bucketed-table catalog entries) referenced ONLY by pruned
    versions.  Time travel/rollback remain available within the kept
    window.  At 100 TB this is the storage-reclamation step a versioned
    store needs — the same role as Delta VACUUM; like there, a reader
    pinned to a pruned version loses it, so keep_versions is an
    operational retention policy, not a correctness knob.

    Returns {"removed_versions": [...], "removed_paths": [...]}.
    """
    import shutil

    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")

    # The prune decision and its manifest commit form one critical section
    # (a publish landing in between would chain off the un-pruned
    # manifest and resurrect history).  Deletion happens OUTSIDE the lock
    # — the pruned dirs are unreferenced the instant the commit lands.
    with _manifest_lock(root):
        manifest = current_manifest(root)
        history = manifest.get("history", [])
        keep_hist = history[len(history) - (keep_versions - 1):] if keep_versions > 1 else []
        pruned = history[: len(history) - len(keep_hist)]
        if not pruned:
            return {"removed_versions": [], "removed_paths": []}

        def paths_of(tables: dict) -> set[str]:
            out = set()
            for entry in tables.values():
                out.add(entry["path"] if isinstance(entry, dict) else entry)
            return out

        live: set[str] = paths_of(manifest["tables"])
        for h in keep_hist:
            live |= paths_of(h["tables"])

        # Commit the pruned manifest FIRST, then delete data.  A crash
        # between the two steps leaves orphaned-but-unreferenced
        # directories (harmless, re-collectable by collect_orphans); the
        # reverse order would leave a manifest still referencing versions
        # whose data is gone, breaking read_table_at's KeyError contract
        # with a raw parquet error.
        new_manifest = dict(manifest)
        new_manifest["history"] = keep_hist
        _commit(root, manifest.get("txid") or "vacuum", new_manifest)

    removed_paths: list[str] = []
    for h in pruned:
        for name, entry in h["tables"].items():
            path = entry["path"] if isinstance(entry, dict) else entry
            if path in live:
                continue
            if isinstance(entry, dict) and entry.get("table"):
                spark.sql(f"DROP TABLE IF EXISTS {entry['table']}")
            shutil.rmtree(path, ignore_errors=True)
            removed_paths.append(path)
            live.add(path)  # don't double-remove across pruned versions
    return {
        "removed_versions": [h["version"] for h in pruned],
        "removed_paths": removed_paths,
    }


def collect_orphans(
    spark: SparkSession,
    root: str,
    min_age_seconds: float = 24 * 3600,
) -> dict:
    """Remove data directories under `<root>/data/` that NO committed
    version (current or history) references — the leftovers of a publish
    that crashed before its manifest swap, or of a vacuum that crashed
    after its manifest commit (vacuum deletes data only after committing
    the pruned manifest, so its crash residue is always unreferenced and
    safe to collect — see vacuum).

    `min_age_seconds` guards the race with an IN-FLIGHT publish: a staging
    directory being written right now is also unreferenced (its manifest
    swap hasn't happened yet), so only directories untouched for at least
    this long are collected (default 24 h — far beyond any publish's
    validate window; tests pass 0).  Mirrors Delta VACUUM's retention
    check for exactly this reason.

    Returns {"removed_paths": [...]}.
    """
    import shutil

    manifest = current_manifest(root)

    def paths_of(tables: dict) -> set[str]:
        return {
            os.path.normpath(e["path"] if isinstance(e, dict) else e)
            for e in tables.values()
        }

    referenced = paths_of(manifest["tables"])
    for h in manifest.get("history", []):
        referenced |= paths_of(h["tables"])

    data_root = os.path.join(root, "data")
    removed: list[str] = []
    now = time.time()
    if os.path.isdir(data_root):
        for txid in sorted(os.listdir(data_root)):
            txdir = os.path.join(data_root, txid)
            if not os.path.isdir(txdir):
                continue
            for table in sorted(os.listdir(txdir)):
                path = os.path.normpath(os.path.join(txdir, table))
                if path in referenced:
                    continue
                newest = max(
                    (os.path.getmtime(os.path.join(dp, f))
                     for dp, _dn, fs in os.walk(path) for f in fs),
                    default=os.path.getmtime(path),
                )
                if now - newest < min_age_seconds:
                    continue
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
            if not os.listdir(txdir):
                os.rmdir(txdir)
    return {"removed_paths": removed}


def merge_into(
    spark: SparkSession,
    root: str,
    name: str,
    staging: DataFrame,
    keys: Sequence[str] | None = None,
    insert_new: bool = True,
    update_existing: bool = True,
    bucketed: bool = False,
    num_buckets: int = 32,
    evolve_schema: bool = False,
) -> dict:
    """Incremental MERGE against the published store: read the current
    committed version, apply the U1-U3 upsert, publish the new state as the
    next version.  One call = one reference job run; crash-safe because the
    publish is all-or-nothing.

    `bucketed=True` keeps the destination bucketed on `keys` across
    versions: each merge reads a bucketed dest (its join side needs no
    Exchange) and republishes bucketed, so repeated incremental loads —
    the reference's re-run-the-job idempotent feed — never re-shuffle the
    accumulated destination, only the (small) incoming staging.

    `evolve_schema=True` lets a batch carrying NEW columns widen the
    table (merge.upsert mergeSchema semantics); because versions are
    immutable, old versions keep the narrow schema and read_changes
    reports the widening as updates on the touched rows.

    Concurrency: the merge is a read-modify-write, so it publishes with
    compare-and-swap on the version it read and RETRIES from a fresh read
    if another writer committed in between — two concurrent merge_into
    calls against one table serialize instead of losing one's updates."""
    from dataintegration_ecomprovider_spark.operators import merge as merge_ops

    if keys is None:
        keys = table_keys(root, name)
        if not keys:
            raise ValueError(
                f"table {name!r} has no recorded keys — pass keys= or "
                "publish with publish_tables(table_keys=...)"
            )
    last_err: ConcurrentPublishError | None = None
    for _attempt in range(5):
        base_version = current_manifest(root)["version"]
        dest = read_table(spark, root, name)
        new_state = merge_ops.upsert(
            dest, staging, list(keys),
            insert_new=insert_new, update_existing=update_existing,
            evolve_schema=evolve_schema,
        )
        try:
            return publish_tables(
                spark, {name: new_state}, root,
                bucket_keys={name: list(keys)} if bucketed else None,
                num_buckets=num_buckets,
                table_keys={name: list(keys)},
                expected_version=base_version,
            )
        except ConcurrentPublishError as e:
            last_err = e  # rebuild against the advanced version and retry
    raise last_err


def read_changes(
    spark: SparkSession,
    root: str,
    name: str,
    from_version: int,
    to_version: int | None = None,
    keys: Sequence[str] | None = None,
    case_insensitive: bool = False,
    change_col: str = "change_type",
) -> DataFrame:
    """Version-diff (CDC) read: the rows that changed between two committed
    versions of `name`, tagged ``insert`` / ``update`` / ``delete``.

    This is the feed every downstream incremental consumer wants: instead
    of re-reading the full table per version (the reference's incremental
    model is "re-run the job idempotently", IsFirstJobRun,
    /root/reference/src/EcomProvider.cs:25, :937-966), a versioned store
    can answer "what changed" exactly — a key-wise full-outer join of the
    two versions:

    - key only in `to_version`  → ``insert`` (the new row),
    - key only in `from_version` → ``delete`` (the old row),
    - key in both with any non-key column differing (null-safe) →
      ``update`` (the new row); unchanged rows are dropped.

    `keys` identify rows across versions; `case_insensitive=True` matches
    string keys through the same ci() normalization the merge family uses
    (operators/merge._k), so a key that merely changed casing diffs as an
    update, not a delete+insert.

    Scale shape: one shuffle per side on the key columns — the minimal
    cost of a full key-wise diff — and Catalyst prunes the comparison to
    the columns actually selected downstream.  Columns are taken from the
    NEW version's schema; a column absent from the old version compares as
    null — after a schema widening, rows appear as updates exactly where
    the new column holds a non-null value.
    """
    from dataintegration_ecomprovider_spark.operators import merge as merge_ops

    if keys is None:
        keys = table_keys(root, name)
    if not keys:
        raise ValueError("read_changes requires the table's key columns")
    if to_version is None:
        to_version = current_manifest(root)["version"]
    old = read_table_at(spark, root, name, from_version)
    new = read_table_at(spark, root, name, to_version)

    keys = list(keys)
    cols = [c for c in new.columns if not c.startswith("__k_")]
    missing = [k for k in keys if k not in cols]
    if missing:
        raise ValueError(f"key columns {missing} not in table {name!r}")
    for c in cols:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None))
    old = old.select(cols)
    new = new.select(cols)

    old, norm = merge_ops._with_norm_keys(old, keys, case_insensitive)
    new, _ = merge_ops._with_norm_keys(new, keys, case_insensitive)
    data_cols = [c for c in cols if c not in keys]
    old = old.select(
        *norm,
        F.lit(True).alias("__old_present"),
        *[F.col(c).alias(f"__old_{c}") for c in cols],
    )
    new = new.select(*norm, F.lit(True).alias("__new_present"), *cols)

    joined = new.join(old, norm, "full_outer")
    differs = F.lit(False)
    for c in data_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__old_{c}"))
    change = (
        F.when(F.col("__old_present").isNull(), F.lit("insert"))
        .when(F.col("__new_present").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    # delete rows surface the OLD version's values (the new side is all
    # null because the row is gone); insert/update rows are exactly the new
    # version's row — including genuine nulls, hence the presence marker
    # rather than a value coalesce
    out_cols = [
        F.when(F.col("__new_present").isNull(), F.col(f"__old_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in cols
    ]
    return (
        joined.withColumn(change_col, change)
        .filter(F.col(change_col).isNotNull())
        .select(*out_cols, change_col)
    )


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    case_insensitive: bool = False,
    change_col: str = "change_type",
) -> DataFrame:
    """Apply a read_changes feed to a replica: insert/update rows upsert,
    delete rows delete — the downstream half of the CDC loop.  By
    construction, ``apply_changes(version N, read_changes(N, M))`` is
    row-identical to version M (tests/test_cdc.py proves it across a chain
    of versions), so an incremental consumer that follows the feed never
    re-reads a full table.

    Scale shape: one key-shuffle join for the upsert half and one anti-join
    for the delete half — both against the (small) change set, with the
    replica side broadcast-eligible per batch; the same algebra as one
    reference job run, driven by the diff instead of the full source."""
    from dataintegration_ecomprovider_spark.operators import merge as merge_ops

    ups = changes.filter(F.col(change_col) != "delete").drop(change_col)
    dels = changes.filter(F.col(change_col) == "delete").drop(change_col)
    out = merge_ops.upsert(
        target, ups, list(keys),
        case_insensitive=case_insensitive, evolve_schema=True,
    )
    return merge_ops.delete_incoming(
        out, dels, list(keys), case_insensitive=case_insensitive
    )


def _data_files(path: str) -> list[str]:
    """Parquet data files under a table directory (commit markers and
    metadata excluded)."""
    out = []
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(dirpath, f))
    return out


def compact(
    spark: SparkSession,
    root: str,
    name: str,
    target_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction: rewrite `name`'s CURRENT version into
    target-size files and publish the rewrite atomically as a NEW version.
    Row-identical by construction — the rewrite is a plain re-write of the
    committed data, committed through the same manifest swap, so readers
    either see the old layout or the compacted one, never a mix.

    Why it exists: ``stream_into_store`` commits one version per
    micro-batch (streaming/incremental.py), so a continuously-fed table
    accumulates per-batch file counts without bound; at 100 TB the
    read-side file listing and per-file open cost become the bottleneck
    long before the data itself does.  Delta/Iceberg ship OPTIMIZE /
    rewriteDataFiles for exactly this; this is the versioned store's
    equivalent, safe to run concurrently with readers (old versions stay
    readable until vacuumed).

    Bucketed tables are re-written bucketed on the same keys and bucket
    count — one file per bucket — so the exchange-free merge path
    (merge_into(bucketed=True) / run_job(dest_bucketed=...)) survives
    compaction.  Plain tables coalesce (no shuffle) to
    max(1, ceil(bytes / target_file_bytes)) files, or `target_files` when
    given.

    Returns {"version", "files_before", "files_after", "bytes"}.
    """
    import math

    manifest = current_manifest(root)
    if name not in manifest["tables"]:
        raise KeyError(f"table {name!r} has no committed version under {root}")
    entry = manifest["tables"][name]
    path = entry["path"] if isinstance(entry, dict) else entry
    files = _data_files(path)
    total_bytes = sum(os.path.getsize(f) for f in files)

    df = _read_entry(spark, entry)
    if isinstance(entry, dict) and entry.get("bucket_keys"):
        # preserve the bucketed layout: same keys, same bucket count
        new_manifest = publish_tables(
            spark, {name: df}, root,
            bucket_keys={name: list(entry["bucket_keys"])},
            num_buckets=int(entry["num_buckets"]),
        )
    else:
        n = target_files or max(1, math.ceil(total_bytes / target_file_bytes))
        new_manifest = publish_tables(spark, {name: df.coalesce(n)}, root)

    new_entry = new_manifest["tables"][name]
    new_path = new_entry["path"] if isinstance(new_entry, dict) else new_entry
    return {
        "version": new_manifest["version"],
        "files_before": len(files),
        "files_after": len(_data_files(new_path)),
        "bytes": total_bytes,
    }
