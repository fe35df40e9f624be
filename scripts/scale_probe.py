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


def _contention_worker(args) -> dict:
    """One writer process: M commits against a shared store root through
    its CommitProtocol (lock → read manifest → next version → CAS swap),
    the exact critical section every publish runs.  Returns its wall
    time and this process's contention counters."""
    root, writer_id, commits, backend = args
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from dataintegration_ecomprovider_spark.plans import commit_protocol as cp

    proto = (
        cp.ConditionalCommitProtocol() if backend == "conditional"
        else cp.PosixCommitProtocol()
    )
    cp.reset_contention_stats()
    conflicts = 0
    t0 = time.perf_counter()
    for i in range(commits):
        while True:
            with proto.lock(root, timeout=120.0):
                prev = proto.read_manifest(root) or {"version": 0, "tables": {}}
                manifest = {
                    "version": prev["version"] + 1,
                    "txid": f"w{writer_id}-{i}",
                    "tables": prev["tables"],
                }
                try:
                    proto.swap_manifest(
                        root, manifest["txid"], manifest,
                        based_on=prev["version"],
                    )
                    break
                except cp.CommitConflict:
                    conflicts += 1  # re-read and retry (shouldn't happen
                    continue        # under the lock; counted to prove it)
    wall = time.perf_counter() - t0
    return {"wall": wall, "conflicts": conflicts, **cp.CONTENTION_STATS}


def _contention_probe() -> dict:
    """N concurrent writer processes × M commits against ONE store root,
    on both commit backends: commits/sec, lock-wait polls, lost lease-CAS
    races, takeovers.  The question (VERDICT r9 #6): does the etag-CAS
    backend's retry behavior stay sane under real multi-writer
    contention, or does it storm?"""
    import multiprocessing as mp
    import tempfile

    from dataintegration_ecomprovider_spark.plans import commit_protocol as cp

    out: dict = {}
    M = 40
    for backend in ("posix", "conditional"):
        for n in (1, 2, 4, 8):
            root = tempfile.mkdtemp(prefix=f"cont_{backend}_{n}_")
            if backend == "conditional":
                cp.persist_protocol(root, "conditional")
            ctx = mp.get_context("spawn")
            t0 = time.perf_counter()
            with ctx.Pool(n) as pool:
                stats = pool.map(
                    _contention_worker,
                    [(root, i, M, backend) for i in range(n)],
                )
            wall = time.perf_counter() - t0
            proto = (
                cp.ConditionalCommitProtocol() if backend == "conditional"
                else cp.PosixCommitProtocol()
            )
            final = proto.read_manifest(root)
            # every commit landed exactly once: the version count IS the
            # serialization proof under maximal contention
            assert final["version"] == n * M, (backend, n, final["version"])
            out[f"{backend}_w{n}"] = {
                "commits_per_sec": round(n * M / wall, 1),
                "waits": sum(s["waits"] for s in stats),
                "lost_cas_races": sum(s["lost_cas_races"] for s in stats),
                "takeovers": sum(s["takeovers"] for s in stats),
                "conflicts": sum(s["conflicts"] for s in stats),
            }
            shutil.rmtree(root, ignore_errors=True)
    return out


def _bpe_ceiling_probe(spark) -> dict:
    """Measure the BPE encode paths across merge-list sizes (round 12,
    verdict task): the nested-replace chain's plan-build cost and the
    driver-stack ceiling it hits (StackOverflow in the Column→Catalyst
    conversion between 256 and 384 nested replaces — measured, pinned
    as bpe.REPLACE_CHAIN_MAX), and the Arrow-batched greedy encoder the
    gate switches to above it, whose cost is merge-count-independent.
    20k docs × 40 words; times include plan build + noop execution."""
    import string
    import time as _t

    from dataintegration_ecomprovider_spark.llm import bpe

    def synth_merges(n):
        pool = string.ascii_lowercase
        out, i = [], 0
        for a in pool:
            for b in pool:
                for c in pool:
                    out.append({"lft": a + b, "rgt": c})
                    i += 1
                    if i >= n:
                        return out
        return out

    docs = spark.range(20_000).select(
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.col("id") + i * 7, F.lit(997)).cast("string"),
                ),
            ),
        ).alias("text")
    )
    out: dict[str, dict] = {}
    # the chain AT its gate (fast path) + the greedy path at tokenizer
    # scales the chain cannot reach (1k/8k/32k — GPT-2 is 50k merges)
    for n in (bpe.REPLACE_CHAIN_MAX, 1_000, 8_000, 32_000):
        t0 = _t.perf_counter()
        df = docs.select(
            bpe.encoded_string(F.col("text"), synth_merges(n)).alias("s")
        )
        _ = df.schema
        t_build = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out[str(n)] = {
            "path": "chain" if n <= bpe.REPLACE_CHAIN_MAX else "greedy_udf",
            "build_s": round(t_build, 2),
            "exec_s": round(_t.perf_counter() - t0, 2),
        }
    return out


def _ann_clustered_probe(spark) -> dict:
    """Residual vs non-residual IVFPQ on CLUSTERED embeddings (round 12,
    verdict task): the round-11 probe used structureless noise — exactly
    the case faiss's by_residual default loses, because residuals have
    no concentration to exploit.  This fixture is the opposite: a
    mixture of Gaussians (the standard synthetic shape for clustered
    embedding spaces — 24 centers, within-cluster sigma 0.15 of the
    center scale, dim 64, 5,000 vectors, seeded numpy), where the
    coarse quantizer explains most of each vector and the m·k codebook
    budget should go to the residual.  Same recall protocol as every
    ANN row: brute-force top-10 ground truth over a 20-query panel;
    raw-ADC recall (probe ALL cells, no re-rank) isolates pure code
    quality; the re-ranked rows show the serve path."""
    import numpy as np

    from dataintegration_ecomprovider_spark.llm import similarity

    rng = np.random.default_rng(7)
    n, dim, k_clusters = 5_000, 64, 24
    centers = rng.normal(0.0, 1.0, (k_clusters, dim))
    assign = rng.integers(0, k_clusters, n)
    vecs = centers[assign] + rng.normal(0.0, 0.15, (n, dim))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).persist()
    emb.count()
    queries_df = emb.filter(F.col("vec_id") < 20)
    K = 10

    def topk_ids(df):
        out: dict[int, set] = {}
        for r in df.select("query_id", "neighbor_id").collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    gt = topk_ids(similarity.brute_force_topk(emb, queries_df, k=K))

    def recall(got):
        hits = sum(len(got.get(q, set()) & g) for q, g in gt.items())
        return round(hits / sum(len(g) for g in gt.values()), 3)

    out: dict[str, float] = {}
    for residual in (False, True):
        idx = similarity.ivfpq_index(
            emb, n_centroids=32, m=8, codebook_size=16, pq_iters=2,
            residual=residual,
        )
        for t in idx.values():
            if hasattr(t, "persist"):
                t.persist().count()
        tag = "residual" if residual else "plain"
        out[f"raw_adc_{tag}"] = recall(topk_ids(similarity.ivfpq_topk(
            queries_df, idx["centroids"], idx["codebook"], idx["codes"],
            k=K, n_probe=32, rerank=None, index=idx,
        )))
        out[f"reranked_{tag}"] = recall(topk_ids(similarity.ivfpq_topk(
            queries_df, idx["centroids"], idx["codebook"], idx["codes"],
            k=K, n_probe=8, rerank=200, embeddings=emb, index=idx,
        )))
        for t in idx.values():
            if hasattr(t, "unpersist"):
                t.unpersist()
    # OPQ (round 13, Ge et al. 2013): learn the rotation on the corpus
    # (flat-PQ objective), rotate the space once (distance-preserving,
    # so the brute-force ground truth transfers verbatim), then run the
    # UNCHANGED IVFPQ pipeline on the rotated frame — this is exactly
    # how an OPQ-IVFPQ deployment composes (rotate at ingest + query)
    opq = similarity.opq_train(emb, m=8, codebook_size=16, opq_iters=2)
    emb_rot = similarity.rotate_vectors(emb, opq["rotation"]).persist()
    emb_rot.count()
    q_rot = emb_rot.filter(F.col("vec_id") < 20)
    idx = similarity.ivfpq_index(
        emb_rot, n_centroids=32, m=8, codebook_size=16, pq_iters=2,
        residual=False,
    )
    for t in idx.values():
        if hasattr(t, "persist"):
            t.persist().count()
    out["raw_adc_opq"] = recall(topk_ids(similarity.ivfpq_topk(
        q_rot, idx["centroids"], idx["codebook"], idx["codes"],
        k=K, n_probe=32, rerank=None, index=idx,
    )))
    out["reranked_opq"] = recall(topk_ids(similarity.ivfpq_topk(
        q_rot, idx["centroids"], idx["codebook"], idx["codes"],
        k=K, n_probe=8, rerank=200, embeddings=emb_rot, index=idx,
    )))
    # the full IVFOPQ composition (Ge et al. §IVFOPQ): rotation + coarse
    # quantizer + RESIDUAL codes — rotating the space also rotates the
    # residuals, so the existing residual path composes for free
    idx_r = similarity.ivfpq_index(
        emb_rot, n_centroids=32, m=8, codebook_size=16, pq_iters=2,
        residual=True,
    )
    out["raw_adc_opq_residual"] = recall(topk_ids(similarity.ivfpq_topk(
        q_rot, idx_r["centroids"], idx_r["codebook"], idx_r["codes"],
        k=K, n_probe=32, rerank=None, index=idx_r,
    )))
    out["reranked_opq_residual"] = recall(topk_ids(similarity.ivfpq_topk(
        q_rot, idx_r["centroids"], idx_r["codebook"], idx_r["codes"],
        k=K, n_probe=8, rerank=200, embeddings=emb_rot, index=idx_r,
    )))
    # flat-PQ ablation: sampled codebook vs OPQ codebook+rotation —
    # isolates the rotation+Lloyd gain from the coarse quantizer
    def flat_recall(**kw):
        return recall(topk_ids(similarity.pq_topk(
            emb, queries_df, k=K, m=8, codebook_size=16, **kw
        )))

    out["flat_raw_sampled"] = flat_recall()
    out["flat_raw_opq"] = flat_recall(
        codebook=opq["codebook"], rotation=opq["rotation"]
    )
    for t in idx.values():
        if hasattr(t, "unpersist"):
            t.unpersist()
    emb_rot.unpersist()
    emb.unpersist()

    # ANISOTROPIC variant (round 13): same mixture, but with a
    # fast-decaying per-dim variance profile mixed through a fixed dense
    # orthogonal matrix — variance smeared ACROSS subspace boundaries,
    # the correlated-coordinates case OPQ exists for (Ge et al. 2013).
    # The isotropic fixture above gives rotation nothing to exploit
    # (random Gaussian centers have no preferred basis); this one does.
    scales = np.array([1.0 / (1 + 0.35 * i) for i in range(dim)])
    mix, _ = np.linalg.qr(rng.normal(0.0, 1.0, (dim, dim)))
    vecs2 = (
        (centers[assign] + rng.normal(0.0, 0.15, (n, dim))) * scales
    ) @ mix.T
    emb2 = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs2[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    ).persist()
    emb2.count()
    q2 = emb2.filter(F.col("vec_id") < 20)
    gt2 = topk_ids(similarity.brute_force_topk(emb2, q2, k=K))

    def recall2(got):
        hits = sum(len(got.get(q, set()) & g) for q, g in gt2.items())
        return round(hits / sum(len(g) for g in gt2.values()), 3)

    idx = similarity.ivfpq_index(
        emb2, n_centroids=32, m=8, codebook_size=16, pq_iters=2,
        residual=False,
    )
    out["aniso_raw_adc_plain"] = recall2(topk_ids(similarity.ivfpq_topk(
        q2, idx["centroids"], idx["codebook"], idx["codes"],
        k=K, n_probe=32, rerank=None, index=idx,
    )))
    opq2 = similarity.opq_train(emb2, m=8, codebook_size=16, opq_iters=2)
    emb2_rot = similarity.rotate_vectors(emb2, opq2["rotation"]).persist()
    emb2_rot.count()
    q2_rot = emb2_rot.filter(F.col("vec_id") < 20)
    idx2 = similarity.ivfpq_index(
        emb2_rot, n_centroids=32, m=8, codebook_size=16, pq_iters=2,
        residual=False,
    )
    out["aniso_raw_adc_opq"] = recall2(topk_ids(similarity.ivfpq_topk(
        q2_rot, idx2["centroids"], idx2["codebook"], idx2["codes"],
        k=K, n_probe=32, rerank=None, index=idx2,
    )))
    out["aniso_reranked_plain"] = recall2(topk_ids(similarity.ivfpq_topk(
        q2, idx["centroids"], idx["codebook"], idx["codes"],
        k=K, n_probe=8, rerank=200, embeddings=emb2, index=idx,
    )))
    out["aniso_reranked_opq"] = recall2(topk_ids(similarity.ivfpq_topk(
        q2_rot, idx2["centroids"], idx2["codebook"], idx2["codes"],
        k=K, n_probe=8, rerank=200, embeddings=emb2_rot, index=idx2,
    )))
    emb2_rot.unpersist()
    emb2.unpersist()
    return out


def _temporal_10x_probe(spark) -> dict:
    """10× probes for the two windowed temporal queries (round 13,
    VERDICT r12 #7 — graded since round 2 but never probed).  `events`
    is a PASSTHROUGH symlink in the shared ~sf1 synthesis (the stream
    probes' cross-round numbers depend on its size staying fixed), so
    this probe builds its OWN events-only 10× dir: user_id AND event_id
    shift per copy — 10× rows and 10× window partitions, the shape a
    1000-executor windowed job actually scales along (both queries are
    one shuffle on user_id + lag/lead windows; more users = more
    parallel partitions, per-partition work constant)."""
    out_dir = "/tmp/sfprobe_r13_events"
    if not os.path.exists(os.path.join(out_dir, "_READY")):
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir)
        for t in [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "documents", "embeddings",
        ]:
            os.symlink(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")
        ev = spark.read.parquet(f"{BASE}/events.parquet")
        mx_u = ev.agg(F.max("user_id")).collect()[0][0] + 1
        mx_e = ev.agg(F.max("event_id")).collect()[0][0] + 1
        big = None
        for i in range(COPIES):
            c = ev.withColumn(
                "user_id", F.col("user_id") + F.lit(i * mx_u)
            ).withColumn("event_id", F.col("event_id") + F.lit(i * mx_e))
            big = c if big is None else big.unionByName(c)
        big.write.parquet(f"{out_dir}/events.parquet")
        open(os.path.join(out_dir, "_READY"), "w").close()
    from dataintegration_ecomprovider_spark.plans.registry import all_queries

    queries = all_queries(include_retired=True)
    res: dict[str, float] = {}
    for name in ("twa_user_values", "scd2_event_type_history"):
        for tag, d in (("1x", BASE), ("10x", out_dir)):
            t0 = time.perf_counter()
            queries[name].fn(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            runtime.release_caches(spark)
            res[f"{name}_{tag}"] = round(time.perf_counter() - t0, 2)
    return res


def main() -> None:
    if sys.argv[1:] and all("temporal_10x" in w for w in sys.argv[1:]):
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        print(json.dumps({"probe": "temporal_10x",
                          "temporal_10x": _temporal_10x_probe(spark)}))
        spark.stop()
        return
    if sys.argv[1:] and all("contention" in w for w in sys.argv[1:]):
        print(json.dumps({"probe": "commit_contention",
                          "contention": _contention_probe()}))
        return
    if sys.argv[1:] and all("bpe_ceiling" in w for w in sys.argv[1:]):
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        print(json.dumps({"probe": "bpe_ceiling",
                          "bpe_ceiling": _bpe_ceiling_probe(spark)}))
        spark.stop()
        return
    if sys.argv[1:] and all("ann_clustered" in w for w in sys.argv[1:]):
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        print(json.dumps({"probe": "ann_clustered",
                          "ann_clustered": _ann_clustered_probe(spark)}))
        spark.stop()
        return
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    synthesize(spark)

    import __spark_entry__ as entrymod
    from dataintegration_ecomprovider_spark.plans.registry import all_queries

    # include_retired: the probe times the hash-seeded FAST paths too —
    # they are off the driver surface but still the production hot path
    queries = {n: qd.fn for n, qd in all_queries(include_retired=True).items()}
    queries["products_export_j4_p6_a1_a8"] = entrymod._q_products_export
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
        # round-9 surfaces
        "u12_object_store_commit",  # etag-CAS commit backend lifecycle
        "u12_type_widening",        # metadata widening, MoR + CoW engines
        "u12_sql_update",           # CoW rewrite + O(matched) MoR delta
        "u12_sql_transaction",      # BEGIN/COMMIT/ROLLBACK atomic block
        "llm_repeated_spans_maximal",  # 3-level doubling + coverage joins
        "u12_partial_update",       # narrow partial deltas + overlay read
        # round-10 surfaces
        "llm_sim_ivfpq_topk",       # composed coarse-probe + ADC + re-rank
        "u12_sql_table_changes",    # SQL CDC read lifecycle
        "u12_insert_overwrite",     # one-statement scoped replace
        "u12_sql_matview",          # SQL-declared IVM view: seed + O(delta) refresh
        "llm_bpe_train",            # merge learning on the vocab table (corpus-size-free loop)
        "llm_bpe_token_counts",     # trained-tokenizer replace-chain corpus scan
        "llm_lm_perplexity",        # bigram backoff scoring: one pass + count joins
        # round-11 surfaces
        "llm_lm_perplexity_trigram",  # order-3 chain: one extra count table + joins
        "llm_bpe_encode_ids",       # id encoding: replace chain + broadcast vocab join
        "u12_sql_matview_avg",      # AVG/HAVING view: same O(delta) refresh, read overlay
        # round-12 surfaces
        "llm_lm_perplexity_kn",     # interpolated KN: continuation tables + scalar kstats
        "u12_sql_matview_expr",     # SUM(expr) + exact-distinct companion lifecycle
        # round-13 surfaces
        "u12_sql_matview_join",     # star rollup: join view + aggregate view, both CDC feeds
        "llm_lm_perplexity_mkn",    # modified KN: class counts + 3-discount kstats
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

    # --- ANN recall at 10x (round 9): latency alone would hide a recall
    # regression — cell/bucket quality can silently degrade as the space
    # fills.  Ground truth = brute-force top-10 for a fixed query panel;
    # each approximate engine's recall@10 is |ANN ∩ GT| / |GT|.  The 10x
    # synthesis is ADVERSARIAL for IVF (every vector has 9 exact twins —
    # dup-heavy cells), so a floor that holds here holds on organic data.
    recalls: dict[str, float] = {}
    if not wanted or any("ann_recall" in w or w in "ann_recall"
                         for w in wanted):
        from dataintegration_ecomprovider_spark.llm import similarity

        emb = spark.read.parquet(f"{OUT}/embeddings.parquet")
        queries_df = emb.filter(F.col("vec_id") < 20)
        K = 10

        def topk_ids(df):
            out: dict[int, set] = {}
            for r in df.select("query_id", "neighbor_id").collect():
                out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return out

        t0 = time.perf_counter()
        gt = topk_ids(similarity.brute_force_topk(emb, queries_df, k=K))
        timings["ann_recall_brute"] = round(time.perf_counter() - t0, 2)
        engines = {
            "ivf": lambda: similarity.ivf_topk(
                emb, queries_df, k=K, n_centroids=32, n_probe=8
            ),
            "lsh": lambda: similarity.lsh_topk(
                emb, queries_df, k=K, planes=8
            ),
            "sq8": lambda: similarity.brute_force_topk_quantized(
                emb, queries_df, k=K
            ),
            # the production two-stage PQ: ADC shortlist from codes,
            # exact re-rank of 200 of ~5000 (4%) — reported, not floored
            # (raw-PQ recall is data-dependent; see SCALE.md)
            "pq": lambda: similarity.pq_topk(
                emb, queries_df, k=K, m=8, codebook_size=16, rerank=200
            ),
        }
        # the round-10 composed index: coarse-probe 8/32 cells, ADC only
        # within them, exact re-rank — the serve path whose ADC work is
        # O(probed cells) instead of flat PQ's O(corpus codes).  Built
        # once outside the timer (an index build is amortized across
        # queries in production); the timing row is SERVE cost.
        ivfpq_idx = similarity.ivfpq_index(
            emb, n_centroids=32, m=8, codebook_size=16, pq_iters=1
        )
        for t in ivfpq_idx.values():
            if hasattr(t, "persist"):
                t.persist().count()
        engines["ivfpq"] = lambda: similarity.ivfpq_topk(
            queries_df, ivfpq_idx["centroids"], ivfpq_idx["codebook"],
            ivfpq_idx["codes"], k=K, n_probe=8, rerank=200, embeddings=emb,
            index=ivfpq_idx,
        )
        # residual IVFPQ (faiss by_residual default): same geometry, codes
        # encode unit(v) − unit(centroid) — the round-10 verdict's
        # unproven-surface item; measured on the same corpus + floor
        # protocol as the by_residual=false row so the documented default
        # is the evidence-backed one
        ivfpq_res_idx = similarity.ivfpq_index(
            emb, n_centroids=32, m=8, codebook_size=16, pq_iters=1,
            residual=True,
        )
        for t in ivfpq_res_idx.values():
            if hasattr(t, "persist"):
                t.persist().count()
        engines["ivfpq_residual"] = lambda: similarity.ivfpq_topk(
            queries_df, ivfpq_res_idx["centroids"],
            ivfpq_res_idx["codebook"], ivfpq_res_idx["codes"], k=K,
            n_probe=8, rerank=200, embeddings=emb, index=ivfpq_res_idx,
        )
        for label, fn in engines.items():
            t0 = time.perf_counter()
            got = topk_ids(fn())
            timings[f"ann_recall_{label}"] = round(time.perf_counter() - t0, 2)
            hits = sum(len(got.get(q, set()) & g) for q, g in gt.items())
            total = sum(len(g) for g in gt.values())
            recalls[label] = round(hits / total, 3) if total else 1.0
        # ADC sublinearity evidence for SCALE.md: candidates the IVFPQ
        # serve path ADC-scored (Σ probed |cell| per query) vs the
        # corpus size flat PQ scans per query
        n_corpus = emb.count()
        probes_df = similarity._assign_to_centroids(
            queries_df.select(
                F.col("vec_id").alias("query_id"),
                similarity._unit(
                    F.col("embedding").cast("array<double>")
                ).alias("qv"),
            ),
            ivfpq_idx["centroids"], "query_id", "qv", keep=8,
        ).select("query_id", "cid")
        cell_sizes = ivfpq_idx["codes"].groupBy("cid").count()
        avg_cands = (
            probes_df.join(cell_sizes, "cid").groupBy("query_id")
            .agg(F.sum("count").alias("c")).agg(F.avg("c")).first()[0]
        )
        recalls["ivfpq_adc_candidates_frac"] = round(
            float(avg_cands) / n_corpus, 3
        )
        # k-means-trained vs hash-sampled PQ codebooks, isolated on RAW
        # ADC recall (no re-rank, probe every cell → pure code quality).
        # Measured on the UNDUPLICATED base corpus: the 10x synthesis
        # gives every vector 9 exact twins whose codes are identical
        # under ANY codebook, so it cannot distinguish codebook quality.
        base_emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
        base_q = base_emb.filter(F.col("vec_id") < 20)
        base_gt = topk_ids(similarity.brute_force_topk(base_emb, base_q, k=K))

        def raw_adc_recall(pq_iters: int, residual: bool = False) -> float:
            idx = similarity.ivfpq_index(
                base_emb, n_centroids=32, m=8, codebook_size=16,
                pq_iters=pq_iters, residual=residual,
            )
            got = topk_ids(similarity.ivfpq_topk(
                base_q, idx["centroids"], idx["codebook"],
                idx["codes"], k=K, n_probe=32, rerank=None, index=idx,
            ))
            hits = sum(len(got.get(q, set()) & g) for q, g in base_gt.items())
            return round(hits / sum(len(g) for g in base_gt.values()), 3)

        recalls["pq_raw_sampled"] = raw_adc_recall(0)
        recalls["pq_raw_trained"] = raw_adc_recall(2)
        # residual codes isolated the same way: probe ALL cells, no
        # re-rank — pure code-quality comparison vs the by_residual=false
        # row above (faiss defaults to residual because the codebook's
        # resolution goes to the part the coarse quantizer didn't explain)
        recalls["pq_raw_residual"] = raw_adc_recall(2, residual=True)
        assert recalls["pq_raw_trained"] >= recalls["pq_raw_sampled"], recalls
        for t in ivfpq_idx.values():
            if hasattr(t, "unpersist"):
                t.unpersist()
        for t in ivfpq_res_idx.values():
            if hasattr(t, "unpersist"):
                t.unpersist()
        # the floor: IVF at n_probe=8/32 cells must keep recall@10 ≥ 0.9;
        # SQ8 scans everything (quantization is the only loss) — ≥ 0.9
        # too.  IVFPQ re-ranked must clear 0.85 (it inherits IVF's probe
        # miss AND PQ's code noise; the floor is set under the measured
        # value with margin, like the others).  LSH@8 planes is reported,
        # not asserted: its recall/probe trade is the tunable, the number
        # in SCALE.md tracks drift.
        assert recalls["ivf"] >= 0.9, f"IVF recall regressed: {recalls}"
        assert recalls["sq8"] >= 0.9, f"SQ8 recall regressed: {recalls}"
        assert recalls["ivfpq"] >= 0.85, f"IVFPQ recall regressed: {recalls}"
        assert recalls["ivfpq_residual"] >= 0.85, (
            f"residual IVFPQ recall regressed: {recalls}"
        )

    store_probes = ("merge_cow", "merge_mor", "schema_changes")
    if wanted and not any(any(w in n for n in store_probes) for w in wanted):
        print(json.dumps(
            {"probe": "10x_sf0.1", "copies": COPIES, "queries": timings,
             "ann_recall": recalls}
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

    print(json.dumps({"probe": "10x_sf0.1", "copies": COPIES,
                      "queries": timings, "ann_recall": recalls}))
    spark.stop()


if __name__ == "__main__":
    main()
