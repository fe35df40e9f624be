"""One REUSED scratch store root per (process, tag), emptied at the start
of each call: lifecycle queries publish full versioned stores, and the
returned DataFrame stays lazy until the driver collects it — so the store
must outlive the query function.  A fresh mkdtemp per call therefore
leaked one store per invocation (×3 under the median-of-3 bench loop);
reusing one root per query bounds scratch disk to a single store per
query per process, reclaimed at interpreter exit."""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_TMP_ROOTS: dict[str, str] = {}


def scratch_store_root(tag: str) -> str:
    root = _TMP_ROOTS.get(tag)
    if root is None:
        root = _TMP_ROOTS[tag] = tempfile.mkdtemp(prefix=f"{tag}_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    else:
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
    return root
