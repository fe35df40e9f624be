"""Per-callee job/stage/wall attribution for one declared query.

Usage: python scripts/job_attrib.py <query_name> [sf_dir] [reps]

Wraps the store/maintenance entry points and records, per call, the
wall time and how many Spark jobs/stages launched inside it (exclusive
attribution: nested wrapped calls subtract).  Diagnostic only.
"""

from __future__ import annotations

import functools
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from dataintegration_ecomprovider_spark import runtime
from dataintegration_ecomprovider_spark.session import get_spark

CUM = defaultdict(lambda: [0.0, 0, 0, 0])  # wall, jobs, stages, calls
STACK: list[list[float]] = []  # per-frame child [wall, jobs, stages]
TRACKER = None


def _jobs_stages() -> tuple[int, int]:
    ids = TRACKER.getJobIdsForGroup(None) or []
    nst = 0
    for j in ids:
        info = TRACKER.getJobInfo(j)
        if info is not None:
            nst += len(info.stageIds)
    return len(ids), nst


def _wrap(mod, name: str, label: str):
    fn = getattr(mod, name, None)
    if fn is None or not callable(fn):
        return

    @functools.wraps(fn)
    def timed(*a, **kw):
        STACK.append([0.0, 0, 0])
        j0, s0 = _jobs_stages()
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            dt = time.perf_counter() - t0
            j1, s1 = _jobs_stages()
            frame = STACK.pop()
            c = CUM[label]
            c[0] += dt - frame[0]
            c[1] += (j1 - j0) - frame[1]
            c[2] += (s1 - s0) - frame[2]
            c[3] += 1
            if STACK:
                STACK[-1][0] += dt
                STACK[-1][1] += j1 - j0
                STACK[-1][2] += s1 - s0

    setattr(mod, name, timed)


def main() -> int:
    global TRACKER
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from dataintegration_ecomprovider_spark.llm import (
        incremental as llm_inc,
    )
    from dataintegration_ecomprovider_spark.llm import (
        lm, search, similarity,
    )
    from dataintegration_ecomprovider_spark.llm import (
        export as llm_export,
    )
    from dataintegration_ecomprovider_spark.plans import (
        materialize, publish, store_sql,
    )

    for mod, fns in [
        (publish, [
            "publish_tables", "merge_into", "merge_into_mor", "merge_many_mor",
            "read_changes", "write_stats_sidecar", "compact",
        ]),
        (materialize, [
            "maintain_aggregate", "maintain_join", "maintain_rowwise_view",
            "apply_join_delta", "apply_aggregate_delta",
        ]),
        (store_sql, ["execute_sql"]),
        (search, ["maintain_text_index", "maintain_doc_lengths",
                  "maintain_term_df", "bm25_topk"]),
        (similarity, ["maintain_pq_codes", "maintain_topic_assignments",
                      "train_pq_codebook", "ivfpq_topk", "kmeans_refine",
                      "pq_refine_codebook", "opq_train", "ivfpq_index"]),
        (lm, ["maintain_lm_model"]),
        (llm_export, ["maintain_training_shards"]),
        (llm_inc, ["ingest_batch", "maintain_dedup_index"]),
    ]:
        for f in fns:
            _wrap(mod, f, f"{mod.__name__.rsplit('.', 1)[-1]}.{f}")

    spark = get_spark("job-attrib")
    TRACKER = spark.sparkContext.statusTracker()
    from dataintegration_ecomprovider_spark.plans.registry import all_queries

    queries = {n: qd.fn for n, qd in all_queries(include_retired=True).items()}
    queries["products_export_j4_p6_a1_a8"] = entrymod._q_products_export

    for rep in range(reps):
        CUM.clear()
        j0, s0 = _jobs_stages()
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        j1, s1 = _jobs_stages()
        runtime.release_caches(spark)
        print(
            f"\n=== rep {rep}: total {t_total:.3f}s (build {t_build:.3f}s) "
            f"jobs {j1 - j0}  stages {s1 - s0}"
        )
        acc_w, acc_j, acc_s = 0.0, 0, 0
        for label, (w, j, s, n) in sorted(CUM.items(), key=lambda kv: -kv[1][0]):
            acc_w += w; acc_j += j; acc_s += s
            print(f"  {w:8.3f}s  j={j:<3d} st={s:<4d} x{n:<3d} {label}")
        print(f"  {t_total - acc_w:8.3f}s  j={j1 - j0 - acc_j:<3d} "
              f"st={s1 - s0 - acc_s:<4d}      (residual)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
