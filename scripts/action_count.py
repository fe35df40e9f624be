"""Driver-orchestration profile of one declared query (guide §1.2).

Usage: python scripts/action_count.py <query_name> [sf_dir] [reps]

Counts, per rep: Spark JOBS and STAGES launched (statusTracker ids),
manifest JSON reads/writes, history-spill reads, sync-state (aux) file
reads/writes, and parquet footer reads — the driver-side fixed costs the
round-13/14 optimization waves attack.  Purely a diagnostic; never
imported by query paths.
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from dataintegration_ecomprovider_spark import runtime
from dataintegration_ecomprovider_spark.session import get_spark

COUNTS: dict[str, int] = defaultdict(int)


def _count(mod, name: str, label: str) -> None:
    fn = getattr(mod, name, None)
    if fn is None:
        return

    def counted(*a, **kw):
        COUNTS[label] += 1
        return fn(*a, **kw)

    setattr(mod, name, counted)


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from dataintegration_ecomprovider_spark.plans import (
        commit_protocol, publish,
    )

    proto = commit_protocol.PosixCommitProtocol
    _count(proto, "read_manifest", "manifest_read")
    _count(proto, "swap_manifest", "manifest_swap")
    _count(proto, "read_aux", "aux_read")
    _count(proto, "write_aux", "aux_write")
    _count(publish, "_spilled_entries", "spill_read")
    _count(publish, "_footer_spark_schema", "footer_schema")
    _count(publish, "_data_files", "data_files_walk")

    spark = get_spark("action-count")
    from dataintegration_ecomprovider_spark.plans.registry import all_queries

    queries = {n: qd.fn for n, qd in all_queries(include_retired=True).items()}
    queries["products_export_j4_p6_a1_a8"] = entrymod._q_products_export
    tracker = spark.sparkContext.statusTracker()

    for rep in range(reps):
        COUNTS.clear()
        jobs0 = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        runtime.release_caches(spark)
        jobs1 = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(jobs1 - jobs0)
        nstages = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is not None:
                nstages += len(info.stageIds)
        print(
            f"rep {rep}: wall {wall:.3f}s  jobs {len(new_jobs)}  "
            f"stages {nstages}"
        )
        for k in sorted(COUNTS):
            print(f"  {COUNTS[k]:6d}  {k}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
