"""Pluggable commit protocol for the versioned store (U12's foundation).

The store's all-or-nothing visibility (SURVEY §4 "custom work #1" — the
reference's SqlTransaction envelope, src/EcomProvider.cs:1018-1036) rests
on exactly three primitives, extracted here behind one seam:

1. ``lock(root)`` — serialize the read-manifest → build → swap critical
   section across writers (held for milliseconds; staging/validation run
   outside it);
2. ``swap_manifest(root, ...)`` — atomically publish a new manifest, the
   single commit point;
3. ``read_manifest`` / ``read_aux`` / ``write_aux`` — consistent reads of
   the manifest and the small shared sidecar files (sync watermarks,
   reader leases).

``PosixCommitProtocol`` (the default) implements them with O_CREAT|O_EXCL
advisory locking and atomic rename — correct on local and most shared
POSIX filesystems, which is where the test suites and single-cluster
deployments live.  On an object store (S3/GCS — where a 100 TB store
actually lives) neither primitive exists; there the protocol must be a
conditional-PUT/compare-and-swap backend (S3 If-None-Match/If-Match, GCS
generation preconditions, or a DynamoDB-style lock service — the problem
Delta solves with LogStore).  ``InMemoryCasProtocol`` is the reference
CAS implementation: no advisory lock at all for correctness — writers
race to an atomic version CAS and losers get ``CommitConflict`` — which
is exactly the object-store shape, so it doubles as the seam's
conformance test double (tests/test_commit_protocol.py runs full store
lifecycles through it, proving nothing in the store bypasses the seam).

Every swap carries ``based_on`` — the manifest version the writer read at
the start of its critical section.  CAS backends reject a swap whose
``based_on`` no longer matches the live version (the lost-update guard);
the POSIX backend re-checks it immediately before the rename, shrinking
the lost-update window of a pathological writer (one that stalled past
the lock's staleness takeover and lost its lock mid-section) from the
whole critical section to microseconds.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
import uuid

MANIFEST = "MANIFEST.json"
LOCK_FILE = ".MANIFEST.lock"


class CommitConflict(RuntimeError):
    """The manifest advanced past the version this swap was based on —
    another writer committed first.  Re-read and retry."""


class CommitProtocol:
    """The acquire / CAS-swap / release seam.  Subclass per storage
    backend; register per store root with ``set_protocol``."""

    def lock(self, root: str, timeout: float = 60.0, stale: float = 300.0):
        """Context manager serializing the commit critical section."""
        raise NotImplementedError

    def read_manifest(self, root: str) -> dict | None:
        """The current committed manifest, or None if never committed."""
        raise NotImplementedError

    def swap_manifest(
        self, root: str, txid: str, manifest: dict,
        based_on: int | None = None,
    ) -> None:
        """Atomically publish `manifest` as the current version.
        `based_on`: the version the writer's critical section started
        from; backends reject the swap (CommitConflict) when the live
        version has moved past it."""
        raise NotImplementedError

    def read_aux(self, root: str, filename: str) -> dict | None:
        """A small shared sidecar document (sync state, reader leases)."""
        raise NotImplementedError

    def write_aux(self, root: str, filename: str, doc: dict) -> None:
        """Atomically replace a sidecar document (call under lock() when
        the update is read-modify-write)."""
        raise NotImplementedError


class PosixCommitProtocol(CommitProtocol):
    """O_EXCL advisory lock + atomic-rename swap (the default backend).

    Staleness takeover is TOKEN-GUARDED so two waiters that both observe
    a crashed writer's lock can never double-acquire: each lock carries a
    unique token; reaping a stale lock first claims a per-token "reap
    intent" file (O_EXCL — exactly one claimant per token, ever, since
    tokens never repeat), then re-reads the lock and unlinks it only if
    it STILL carries the observed token.  Between that re-read and the
    unlink the lock cannot change hands: creation requires absence, the
    only other unlinkers are the (dead) holder and other reapers — who
    cannot hold the intent for this token.  The un-guarded version of
    this path was the race: waiter B's unlink could remove waiter A's
    freshly-created lock, yielding two concurrent critical sections.

    Release is equally token-guarded: a holder that stalled past the
    staleness window and was reaped finds a foreign token at release time
    and leaves the new holder's lock alone (its eventual swap then fails
    the based_on re-check instead of silently losing an update).
    """

    @contextlib.contextmanager
    def lock(self, root: str, timeout: float = 60.0, stale: float = 300.0):
        path = os.path.join(root, LOCK_FILE)
        token = uuid.uuid4().hex
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(fd, token.encode())
                finally:
                    os.close(fd)
                break
            except FileExistsError:
                self._maybe_reap(path, stale)
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"could not acquire manifest lock {path} "
                        f"within {timeout}s"
                    )
                time.sleep(0.02)
        try:
            yield
        finally:
            try:
                with open(path, encoding="utf-8") as fh:
                    mine = fh.read() == token
                if mine:
                    os.unlink(path)
            except OSError:
                pass

    def _maybe_reap(self, path: str, stale: float) -> None:
        """Take over a crashed writer's lock, at most once per token."""
        try:
            if time.time() - os.path.getmtime(path) <= stale:
                return
            with open(path, encoding="utf-8") as fh:
                observed = fh.read()
        except OSError:
            return  # released between the existence check and the read
        intent = path + ".reap-" + (observed[:32] or "empty")
        try:
            os.close(os.open(intent, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        except FileExistsError:
            # another waiter owns the reap for this token.  If IT crashed
            # between claiming and reaping, its intent goes stale too and
            # is reclaimed here (the double-crash path: two independent
            # `stale`-length windows must elapse before it can matter).
            try:
                if time.time() - os.path.getmtime(intent) > stale:
                    os.unlink(intent)
            except OSError:
                pass
            return
        try:
            # sole claimant for this token: re-read, remove ONLY if the
            # lock still carries the token observed stale — a fresh lock
            # (new token) must never be unlinked
            try:
                with open(path, encoding="utf-8") as fh:
                    if fh.read() == observed:
                        os.unlink(path)
            except OSError:
                pass
        finally:
            try:
                os.unlink(intent)
            except OSError:
                pass

    def read_manifest(self, root: str) -> dict | None:
        path = os.path.join(root, MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)

    def swap_manifest(
        self, root: str, txid: str, manifest: dict,
        based_on: int | None = None,
    ) -> None:
        path = os.path.join(root, MANIFEST)
        tmp = path + f".tmp-{txid}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, indent=2)
        if based_on is not None:
            # last-moment lost-update guard (see class docstring); the
            # read→rename pair is not atomic on POSIX — the CAS backends
            # are where this check is airtight
            cur = self.read_manifest(root)
            if (cur["version"] if cur else 0) != based_on:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise CommitConflict(
                    f"manifest at {root} moved past version {based_on}"
                )
        os.replace(tmp, path)  # the atomic commit point

    def read_aux(self, root: str, filename: str) -> dict | None:
        path = os.path.join(root, filename)
        if not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)

    def write_aux(self, root: str, filename: str, doc: dict) -> None:
        tmp = os.path.join(root, filename + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(doc, fh)
        os.replace(tmp, os.path.join(root, filename))


class InMemoryCasProtocol(CommitProtocol):
    """Reference compare-and-swap backend — the object-store commit shape
    (S3 If-Match conditional PUT / GCS generation preconditions) played
    in process memory.  The lock is only an in-process courtesy (it
    cannot span hosts, exactly like object stores have no advisory
    locks); CORRECTNESS comes from swap_manifest's atomic version CAS —
    two writers based on the same version race, one wins, the loser gets
    CommitConflict and must re-read and retry.  Used by the conformance
    tests to prove every store code path commits through the seam."""

    def __init__(self) -> None:
        self._mu = threading.RLock()
        self._locks: dict[str, threading.RLock] = {}
        self._manifests: dict[str, dict] = {}
        self._aux: dict[tuple[str, str], dict] = {}
        self.conflicts = 0  # observability for tests

    def _root_lock(self, root: str) -> threading.RLock:
        with self._mu:
            return self._locks.setdefault(root, threading.RLock())

    @contextlib.contextmanager
    def lock(self, root: str, timeout: float = 60.0, stale: float = 300.0):
        lk = self._root_lock(root)
        if not lk.acquire(timeout=timeout):
            raise TimeoutError(f"could not acquire in-memory lock for {root}")
        try:
            yield
        finally:
            lk.release()

    def read_manifest(self, root: str) -> dict | None:
        with self._mu:
            m = self._manifests.get(root)
            return json.loads(json.dumps(m)) if m is not None else None

    def swap_manifest(
        self, root: str, txid: str, manifest: dict,
        based_on: int | None = None,
    ) -> None:
        with self._mu:  # the atomic CAS
            cur = self._manifests.get(root)
            cur_version = cur["version"] if cur else 0
            if based_on is not None and cur_version != based_on:
                self.conflicts += 1
                raise CommitConflict(
                    f"manifest at {root} moved past version {based_on}"
                )
            self._manifests[root] = json.loads(json.dumps(manifest))

    def read_aux(self, root: str, filename: str) -> dict | None:
        with self._mu:
            doc = self._aux.get((root, filename))
            return json.loads(json.dumps(doc)) if doc is not None else None

    def write_aux(self, root: str, filename: str, doc: dict) -> None:
        with self._mu:
            self._aux[(root, filename)] = json.loads(json.dumps(doc))


_DEFAULT = PosixCommitProtocol()
_REGISTRY: dict[str, CommitProtocol] = {}


def protocol_for(root: str) -> CommitProtocol:
    """The commit protocol governing `root` (the POSIX backend unless one
    was registered)."""
    return _REGISTRY.get(root, _DEFAULT)


def set_protocol(root: str, protocol: CommitProtocol | None) -> None:
    """Register (or, with None, clear) the commit protocol for a store
    root — how an object-store CAS backend is dropped in."""
    if protocol is None:
        _REGISTRY.pop(root, None)
    else:
        _REGISTRY[root] = protocol
