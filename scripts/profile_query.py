"""Per-phase wall-clock breakdown of one declared query (guide §1).

Usage: python scripts/profile_query.py <query_name> [sf_dir] [reps]

Wraps the store/maintenance entry points (publish.*, materialize.*,
store_sql.*, llm maintenance fns) with wall timers, runs the query
through the noop sink, and prints cumulative seconds per wrapped callee
(exclusive of nested wrapped calls) plus the residual — so "where does a
10 s lifecycle query spend its time" is answerable without the Spark UI.
Purely a diagnostic; never imported by query paths.
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

CUM: dict[str, float] = defaultdict(float)
CALLS: dict[str, int] = defaultdict(int)
STACK: list[list[float]] = []  # per-frame: [child_time]


def _wrap(mod, name: str, label: str):
    fn = getattr(mod, name, None)
    if fn is None or not callable(fn):
        return
    @functools.wraps(fn)
    def timed(*a, **kw):
        STACK.append([0.0])
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            dt = time.perf_counter() - t0
            frame = STACK.pop()
            CUM[label] += dt - frame[0]  # exclusive time
            CALLS[label] += 1
            if STACK:
                STACK[-1][0] += dt
    setattr(mod, name, timed)


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from dataintegration_ecomprovider_spark.plans import (
        materialize, publish, store_sql,
    )
    from dataintegration_ecomprovider_spark.llm import (
        lm, search, similarity, export as llm_export, incremental as llm_inc,
    )

    for mod, fns in [
        (publish, [
            "publish_tables", "merge_into", "merge_into_mor", "merge_many_mor",
            "read_table", "read_changes", "write_stats_sidecar",
            "write_bloom_sidecar", "refresh_bloom_sidecar", "vacuum",
        ]),
        (materialize, [
            "maintain_aggregate", "maintain_join", "maintain_rowwise_view",
            "read_aggregate_view",
        ]),
        (store_sql, ["execute_sql", "execute_statements"]),
        (search, ["maintain_text_index", "maintain_doc_lengths",
                  "maintain_term_df", "bm25_topk"]),
        (similarity, ["maintain_pq_codes", "maintain_topic_assignments",
                      "train_pq_codebook", "ivfpq_topk", "train_ivf_index"]),
        (lm, ["maintain_lm_model", "train_ngram_lm", "train_kn_lm",
              "score_documents_kn", "score_documents_ngram"]),
        (llm_export, ["maintain_training_shards"]),
        (llm_inc, ["ingest_batch"]),
    ]:
        for f in fns:
            _wrap(mod, f, f"{mod.__name__.rsplit('.', 1)[-1]}.{f}")

    spark = get_spark("profile")
    from dataintegration_ecomprovider_spark.plans.registry import all_queries
    queries = {n: qd.fn for n, qd in all_queries(include_retired=True).items()}
    queries["products_export_j4_p6_a1_a8"] = entrymod._q_products_export

    for rep in range(reps):
        CUM.clear(); CALLS.clear()
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        runtime.release_caches(spark)
        print(f"\n=== rep {rep}: total {t_total:.3f}s "
              f"(build {t_build:.3f}s, final noop {t_total - t_build:.3f}s)")
        acc = 0.0
        for label, secs in sorted(CUM.items(), key=lambda kv: -kv[1]):
            acc += secs
            print(f"  {secs:8.3f}s  x{CALLS[label]:<3d} {label}")
        print(f"  {t_total - acc:8.3f}s  (unwrapped residual)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
