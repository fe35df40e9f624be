"""Commit-cost telemetry rollup (round 11, VERDICT r10 #8): run a
representative slice of commit-heavy lifecycle queries, then aggregate
the ``commit_wall_ms`` stamps their stores' manifests carry — p50/p95
per store lifecycle — from the RECORDED artifacts alone (publish
stamps every manifest; this script adds no instrumentation).  The
table this prints feeds SCALE.md's commit-telemetry section so the
next commit-cost drift bisects itself from stored manifests instead of
needing a fresh probe harness.

Usage: ``python scripts/commit_rollup.py [query-name ...]`` (defaults
to the standard slice below) — prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataintegration_ecomprovider_spark import runtime
from dataintegration_ecomprovider_spark.session import get_spark

# commit-heavy lifecycles spanning the protocol surface: multi-table
# atomic, SQL transaction block, MoR merges, IVM refresh, partial-column
# deltas, CDC-maintained index, exactly-once streaming, etag-CAS backend
SLICE = [
    "u12_multi_table_txn",
    "u12_sql_transaction",
    "u12_merge_on_read",
    "u12_sql_matview",
    "u12_partial_update",
    "llm_text_index_cdc",
    "stream_store_to_store",
    "u12_object_store_commit",
]


def main() -> None:
    from dataintegration_ecomprovider_spark.plans import publish, scratch
    from dataintegration_ecomprovider_spark.plans.registry import all_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    wanted = sys.argv[1:] or SLICE
    spark = get_spark("commit-rollup")
    queries = all_queries(include_retired=True)
    for name in wanted:
        queries[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        runtime.release_caches(spark)

    # every scratch store root the slice touched, straight from the
    # manifests: one commit_wall_ms per committed version
    rollup: dict[str, dict] = {}
    for tag, root in scratch._TMP_ROOTS.items():
        try:
            manifest = publish.current_manifest(root)
        except Exception:
            continue
        walls = [
            h["commit_wall_ms"]
            for h in publish._all_history(root, manifest) + [manifest]
            if h.get("commit_wall_ms") is not None
        ]
        if not walls:
            continue
        rollup[tag] = {
            "commits": len(walls),
            "p50_ms": round(statistics.median(walls), 1),
            # clamp to the observed max: the inclusive-exclusive quantile
            # estimator extrapolates past it on small samples
            "p95_ms": round(
                min(statistics.quantiles(walls, n=20)[-1], max(walls)), 1
            ) if len(walls) >= 2 else round(walls[0], 1),
            "max_ms": round(max(walls), 1),
            "total_ms": round(sum(walls), 1),
        }
    print(json.dumps(
        {"probe": "commit_wall_rollup", "sf_dir": sf_dir,
         "queries": wanted, "stores": rollup}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
