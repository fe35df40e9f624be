"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion through the noop sink (all columns
materialized — count() alone would let Catalyst prune the work away).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from dataintegration_ecomprovider_spark.session import get_spark

HEADLINE = [
    "products_export_j4_p6_a1_a8",  # flagship: joins + string-agg + top-1
    "j6_self_join_related",         # self-join pair explosion + agg
    "j17_e18_semi_join_chain",      # semi-join chain selection
    "a4_pivot",                     # EAV pivot
    "u1_u2_upsert_full",            # upsert matrix
    "u9_relation_swap",             # relation swap (agg + anti + union)
    "e5_membership_explode",        # encode + explode round-trip
    "e1_a3_surrogate_ids",          # high-water + windowed allocation
    "e15_e16_u12_pipeline_run_job", # full RunJob pipeline (2 mappings)
    "stream_sessionization",        # gap sessions (lag + cumsum windows)
    "llm_dedup_exact",              # content-hash dedup
    "llm_dedup_minhash_lsh",        # minhash LSH + jaccard verify
    "llm_sim_cosine_topk",          # brute-force ANN baseline
    "llm_sim_ivf_topk",             # IVF-bucketed ANN (scale path)
    "llm_near_dup_embedding_lsh",   # embedding near-dup, LSH-pruned
    "llm_text_quality",             # text feature extraction
    "llm_fingerprint",              # rolling-hash fingerprint
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    queries = entrymod.queries()

    # one generic warmup action so the first measured query doesn't absorb
    # JVM/codegen startup (it is not one of the measured queries)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
