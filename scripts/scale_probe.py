"""10x scale probe (local[32]): synthesize ~sf1 from sf0.1 by shifted-key
union, persist it as parquet, and time the heavy surfaces — records the
scale-up behavior SCALE.md cites.  Usage:
``python scripts/scale_probe.py [substring ...]`` — extra args restrict
the run to queries whose name contains any substring (the full suite
exceeds a 10-minute window; run it in slices).

Shifted copies make every duplicated document a TRUE near-dup of its
original, so the minhash number is adversarial (candidate pairs grow far
faster than 10x); organic 10x data has a smaller verify set.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark import runtime
from dataintegration_ecomprovider_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/sfprobe_r4"
COPIES = 10
PASSTHROUGH = ["region", "nation", "customer", "supplier", "part", "events"]


def synthesize(spark) -> None:
    if os.path.exists(os.path.join(OUT, "_READY")):
        return
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)
    for t in PASSTHROUGH:
        os.symlink(f"{BASE}/{t}.parquet", f"{OUT}/{t}.parquet")

    def shifted_union(df, col):
        mx = df.agg(F.max(col)).collect()[0][0] + 1
        out = None
        for i in range(COPIES):
            c = df.withColumn(col, F.col(col) + F.lit(i * mx))
            out = c if out is None else out.unionByName(c)
        return out

    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    shifted_union(orders, "o_orderkey").write.parquet(f"{OUT}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    shifted_union(li, "l_orderkey").write.parquet(f"{OUT}/lineitem.parquet")
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    shifted_union(docs, "doc_id").write.parquet(f"{OUT}/documents.parquet")
    # embeddings duplicate as EXACT near-dups (vectors unchanged, ids
    # shifted) — adversarial for semantic dedup / ANN: dup-heavy cells
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    shifted_union(emb, "vec_id").write.parquet(f"{OUT}/embeddings.parquet")
    open(os.path.join(OUT, "_READY"), "w").close()


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark)

    import __spark_entry__ as entrymod

    queries = entrymod._all()
    names = [
        "products_export_j4_p6_a1_a8",
        "e15_e16_u12_pipeline_run_job",
        "u12_pipeline_run_job_bucketed",
        "e5_membership_explode",
        "u9_relation_swap",
        "llm_dedup_minhash_lsh",
        "llm_chunk_documents",
        "llm_fingerprint",
        "u12_version_diff",      # CDC diff at 10x (two publishes + full-outer)
        "u12_cdc_apply",         # diff + replay round-trip at 10x
        "u12_data_skipping_scan",  # stats collection + pruned scan at 10x
        "u12_store_replicate",     # seed + delta sync at 10x
        "llm_semantic_dedup",      # cluster-scoped pair work at 10x
        "u12_incremental_aggregate",  # IVM refresh at 10x
        "u12_incremental_join",    # join-view scoped rebuild at 10x
        "u12_merge_on_read",       # MoR delta merges + reconstruction at 10x
        "u12_bloom_scan",          # bloom build + pruned point lookup at 10x
        "stream_interval_join",    # interval-join state shape at 10x
        # round-7 surfaces
        "u12_column_mapping",      # rename/drop metadata + MoR in new names
        "u12_constraints_quarantine",      # constraint-gated MoR merge at 10x
        "u12_constraints_quarantine_cow",  # same split on the CoW path
        "llm_text_index_cdc",      # inverted-index seed + CDC refresh at 10x
        "llm_mixture_epochs",      # token-budget mixture + epoch spread
        # round-8 surfaces
        "u12_partition_evolution",  # spec declaration + lazy migration
        "llm_text_search_ranked",   # BM25 from three maintained tables
        "llm_decontaminate_incremental_portable",  # persisted decon index
        "u12_sql_merge",            # SQL MERGE front-end
        "u12_metadata_agg",         # metadata-only aggregates lifecycle
        "stream_store_to_store",    # exactly-once CDC pipeline + replay
        "llm_training_shards_incremental",  # O(affected shards) export refresh
        "u12_multi_table_txn",      # N staged deltas, one manifest swap
    ]
    wanted = sys.argv[1:]
    if wanted:
        names = [n for n in names if any(w in n for w in wanted)]
    timings = {}
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark, OUT).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
        runtime.release_caches(spark)

    # merge-on-read vs copy-on-write at 10x: same staging batch (0.1% of
    # the table) merged into the same published lineitem-sized base —
    # the per-merge write-amplification trade quantified
    import tempfile

    from dataintegration_ecomprovider_spark.plans import publish

    store_probes = ("merge_cow", "merge_mor", "schema_changes")
    if wanted and not any(any(w in n for n in store_probes) for w in wanted):
        print(json.dumps(
            {"probe": "10x_sf0.1", "copies": COPIES, "queries": timings}
        ))
        spark.stop()
        return

    base = spark.read.parquet(f"{OUT}/lineitem.parquet").select(
        F.concat_ws("#", "l_orderkey", "l_linenumber").alias("k"),
        "l_quantity", "l_extendedprice", "l_shipdate",
    )
    staging = base.sample(0.001, seed=7).withColumn(
        "l_quantity", F.col("l_quantity") + 1
    )
    staging.persist().count()
    for label, fn in [
        ("merge_cow", lambda r: publish.merge_into(spark, r, "t", staging)),
        ("merge_mor", lambda r: publish.merge_into_mor(spark, r, "t", staging)),
    ]:
        root = tempfile.mkdtemp(prefix=f"probe_{label}_")
        publish.publish_tables(spark, {"t": base}, root, table_keys={"t": ["k"]})
        t0 = time.perf_counter()
        fn(root)
        timings[label + "_write"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        publish.read_table(spark, root, "t").write.format("noop").mode(
            "overwrite"
        ).save()
        timings[label + "_read"] = round(time.perf_counter() - t0, 2)
        shutil.rmtree(root, ignore_errors=True)
    staging.unpersist()

    # schema_changes is a pure manifest-history walk (no Spark job):
    # probe its metadata cost over a 60-commit span
    root = tempfile.mkdtemp(prefix="probe_schemaev_")
    publish.publish_tables(
        spark,
        {"t": spark.range(100).select(
            F.col("id").alias("k"), F.col("id").alias("c0"))},
        root, table_keys={"t": ["k"]},
    )
    for i in range(30):
        publish.rename_column(spark, root, "t", f"c{i}", f"c{i + 1}")
    t0 = time.perf_counter()
    n_events = len(publish.schema_changes(root, "t", 1, 31))
    timings["schema_changes_walk_30"] = round(time.perf_counter() - t0, 3)
    assert n_events == 30, n_events
    shutil.rmtree(root, ignore_errors=True)

    print(json.dumps({"probe": "10x_sf0.1", "copies": COPIES, "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
