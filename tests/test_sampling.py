"""Invariants for the deterministic sampling operators (llm/sampling.py):
split stability/coverage, exact stratified caps, and rebalance proportions.
The value-level gates are the DuckDB oracles (llm_split_hash,
llm_sample_stratified, llm_rebalance_mix)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.llm import sampling
from tests.conftest import SF_DIR


def _docs(spark):
    return Catalog(spark, SF_DIR).table("documents")


def test_split_assign_partitions_and_is_deterministic(spark):
    docs = _docs(spark)
    a = sampling.split_assign(docs)
    total = docs.count()
    by_split = dict(a.groupBy("split").count().collect())
    assert sum(by_split.values()) == total  # every row in exactly one split
    # rates within a loose tolerance of the configured 10/10/80
    assert 0.04 < by_split.get("val", 0) / total < 0.16
    assert 0.04 < by_split.get("test", 0) / total < 0.16
    # repartitioning the input cannot change any assignment
    b = sampling.split_assign(docs.repartition(7))
    assert a.select("doc_id", "split").exceptAll(b.select("doc_id", "split")).count() == 0


def test_split_assign_stable_under_corpus_growth(spark):
    """Docs present before growth keep their split after new docs arrive."""
    docs = _docs(spark)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    grown = sampling.split_assign(docs).filter(F.col("doc_id") % 2 == 0)
    alone = sampling.split_assign(half)
    assert grown.select("doc_id", "split").exceptAll(alone.select("doc_id", "split")).count() == 0


def test_stratified_topk_exact_cap_and_no_ties(spark):
    docs = _docs(spark)
    k = 20
    out = sampling.stratified_topk(docs, "lang", k=k)
    per = out.groupBy("lang").count().collect()
    sizes = dict(docs.groupBy("lang").count().collect())
    for row in per:
        assert row["count"] == min(k, sizes[row["lang"]])
    # rank is dense 1..k within each stratum
    mx = out.groupBy("lang").agg(F.max("sample_rank").alias("m"), F.count(F.lit(1)).alias("c"))
    assert all(r["m"] == r["c"] for r in mx.collect())


def test_rebalance_mix_equalizes_within_tolerance(spark):
    docs = _docs(spark)
    out = sampling.rebalance_mix(docs, "lang")
    sizes = dict(out.groupBy("lang").count().collect())
    mn = min(dict(docs.groupBy("lang").count().collect()).values())
    # hash thresholding is approximate: each stratum lands near the min size
    for lang, n in sizes.items():
        assert 0.5 * mn <= n <= 1.5 * mn, (lang, n, mn)
    # subset of the corpus, no duplication
    assert out.count() == out.dropDuplicates(["doc_id"]).count()


def test_pack_sequences_bin_capacity_and_determinism(spark):
    from dataintegration_ecomprovider_spark.llm import text as text_ops

    docs = _docs(spark)
    out = sampling.pack_sequences(
        docs, text_ops.n_words(F.col("text")), bin_tokens=500, partition_col="lang"
    )
    # every bin except possibly the last per group holds >= bin_tokens only
    # once overfilled by its final doc: total per bin < bin_tokens + max doc
    per_bin = out.groupBy("lang", "bin_id").agg(F.sum("n_tokens").alias("tot"))
    max_doc = out.agg(F.max("n_tokens")).first()[0]
    assert all(r.tot < 500 + max_doc for r in per_bin.collect())
    # bins are dense from 0 within each group
    bins = out.groupBy("lang").agg(
        F.min("bin_id").alias("lo"), F.countDistinct("bin_id").alias("n"),
        F.max("bin_id").alias("hi"))
    assert all(r.lo == 0 and r.hi == r.n - 1 for r in bins.collect())
    # deterministic across runs
    a = {(r.doc_id, r.bin_id) for r in out.collect()}
    b = {(r.doc_id, r.bin_id) for r in sampling.pack_sequences(
        docs, text_ops.n_words(F.col("text")), bin_tokens=500, partition_col="lang"
    ).collect()}
    assert a == b


def test_quality_filter_keeps_upper_quantile(spark):
    from dataintegration_ecomprovider_spark.llm import text as text_ops

    docs = _docs(spark)
    out = sampling.quality_filter_by_quantile(
        docs, text_ops.n_words(F.col("text")), "lang", quantile=0.5
    )
    # roughly half of each group survives; never more than the group
    kept = dict(out.groupBy("lang").count().collect())
    sizes = dict(docs.groupBy("lang").count().collect())
    for lang, n in sizes.items():
        assert 0.3 * n <= kept.get(lang, 0) <= n
    # schema is unchanged (helper columns dropped)
    assert out.columns == docs.columns


def test_temperature_mix_interpolates_between_natural_and_equal(spark):
    """alpha=1 keeps everything (natural mix); alpha=0 equals
    rebalance_mix's equal-size policy (same thresholds); alpha=0.5 lies
    between; the tail stratum always keeps everything."""
    from dataintegration_ecomprovider_spark.llm.sampling import (
        rebalance_mix, temperature_mix,
    )

    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else ("mid" if i < 990 else "small"))
         for i in range(1000)],
        "doc_id bigint, lang string",
    )

    def sizes(df):
        return {r["lang"]: r["n"] for r in
                df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}

    nat = sizes(temperature_mix(docs, "lang", alpha=1.0))
    assert nat == {"big": 900, "mid": 90, "small": 10}  # keep == 1 everywhere

    eq = sizes(temperature_mix(docs, "lang", alpha=0.0))
    assert eq == sizes(rebalance_mix(docs, "lang"))

    half = sizes(temperature_mix(docs, "lang", alpha=0.5))
    assert half["small"] == 10  # tail keeps everything
    assert eq["big"] <= half["big"] <= nat["big"]
    assert half["big"] < nat["big"]  # head actually downsampled
    # expected keep fraction for the head at alpha=0.5 is sqrt(10/900)
    assert abs(half["big"] / 900 - (10 / 900) ** 0.5) < 0.05


def test_temperature_mix_token_weighted(spark):
    """weight_col sizes strata by tokens: a stratum with few huge docs
    downsamples like a big stratum."""
    from dataintegration_ecomprovider_spark.llm.sampling import temperature_mix

    docs = spark.createDataFrame(
        [(i, "heavy", 10_000) for i in range(50)]
        + [(100 + i, "light", 10) for i in range(50)],
        "doc_id bigint, lang string, n_tokens bigint",
    )
    out = temperature_mix(
        docs, "lang", alpha=0.5, weight_col=F.col("n_tokens")
    )
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes.get("light", 0) == 50           # small-token stratum kept
    assert 0 < sizes.get("heavy", 0) < 50        # heavy-token stratum thinned


def test_write_training_shards_deterministic_manifest(spark, tmp_path):
    """Sharded JSONL export: one data file per shard dir, manifest row
    sums match, same doc lands in the same shard on re-export, and the
    written rows round-trip."""
    import json
    import os

    from dataintegration_ecomprovider_spark.llm.export import (
        SHARDS_FILE, shard_assign, write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(500)], "doc_id bigint, text string"
    )
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, num_shards=4)
    assert manifest["rows"] == 500 and len(manifest["shards"]) == 4
    assert sum(s["rows"] for s in manifest["shards"].values()) == 500
    with open(os.path.join(out, SHARDS_FILE)) as fh:
        assert json.load(fh)["rows"] == 500

    for n in range(4):
        d = os.path.join(out, f"shard={n}")
        data_files = [f for f in os.listdir(d) if not f.startswith(("_", "."))]
        assert len(data_files) == 1, d  # co-located: one file per shard

    back = spark.read.json(out)
    assert back.count() == 500
    # determinism: assignment equals a fresh shard_assign of the same ids
    expected = {
        (r.doc_id, r.shard) for r in shard_assign(docs, 4).collect()
    }
    got = {(r.doc_id, int(r.shard)) for r in back.collect()}
    assert got == expected


def test_mixture_plan_budget_and_epochs(spark):
    """mixture_plan: rates follow budget*w/Σw/avail; upsampled strata get
    floor(rate) full epochs + a fractional threshold; a stratum missing
    from the weights is excluded entirely."""
    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    weights = {"en": 0.5, "de": 0.5}  # fr/es/zh get weight 0 → excluded
    plan = sampling.mixture_plan(
        docs, "lang", weights, budget=2.0 * total,
        weight_col=F.col("n_chars"),
    )
    rows = {r["lang"]: r for r in plan.collect()}
    assert set(rows) == {"en", "de"}
    for lang, r in rows.items():
        assert abs(r["rate"] - (total / r["avail"])) < 1e-9
        assert r["epochs"] == int(r["rate"])
        assert 0 <= r["keep_below"] < sampling.BUCKETS
        assert r["rate"] >= 1  # budget 2× corpus over half the mass


def test_apply_mixture_materializes_epochs_deterministically(spark):
    """apply_mixture: every doc of an upsampled stratum appears exactly
    floor(rate) times unconditionally (epochs 0..floor-1), the fractional
    epoch is an id-hash subsample of the right size, and the mixture is
    identical under repartitioning (hash-deterministic)."""
    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    weights = {"en": 0.75, "zh": 0.25}
    plan = sampling.mixture_plan(
        docs, "lang", weights, budget=3.0 * total, weight_col=F.col("n_chars")
    )
    out = sampling.apply_mixture(docs, plan, "lang")
    prows = {r["lang"]: r for r in plan.collect()}
    per_doc = {
        (r["lang"], r["doc_id"]): r["n"]
        for r in out.groupBy("lang", "doc_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    # every doc appears epochs or epochs+1 times, never less/more
    for (lang, _doc), n in per_doc.items():
        assert n in (prows[lang]["epochs"], prows[lang]["epochs"] + 1)
    # fractional-epoch size ≈ keep_below/BUCKETS of the stratum
    for lang, p in prows.items():
        docs_n = docs.filter(F.col("lang") == lang).count()
        frac_n = sum(
            1 for (l, _d), n in per_doc.items()
            if l == lang and n == p["epochs"] + 1
        )
        expected = docs_n * p["keep_below"] / sampling.BUCKETS
        assert abs(frac_n - expected) <= max(6.0, 0.35 * docs_n)
    # epoch tags are distinct per copy, so downstream shuffles can key on them
    assert out.groupBy("lang", "doc_id", "epoch").count().filter(
        F.col("count") > 1
    ).count() == 0
    # deterministic under repartition
    again = sampling.apply_mixture(
        docs.repartition(13), plan, "lang"
    )
    assert out.select("doc_id", "lang", "epoch").exceptAll(
        again.select("doc_id", "lang", "epoch")
    ).count() == 0


def test_training_shards_epoch_salt_and_seeded_order(spark, tmp_path):
    """Epoch-mixed export: salt_cols=("epoch",) spreads an upsampled
    doc's copies across shards instead of piling them into one, and
    shuffle_seed writes each shard in the deterministic md5(seed:id:epoch)
    order — byte-identical on re-export, different under another seed."""
    import hashlib
    import json
    import os

    from dataintegration_ecomprovider_spark.llm.export import (
        write_training_shards,
    )

    docs = _docs(spark).select("doc_id", "lang", "n_chars")
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    plan = sampling.mixture_plan(
        docs, "lang", {"en": 0.5, "de": 0.5}, budget=4.0 * total,
        weight_col=F.col("n_chars"),
    )
    mixed = sampling.apply_mixture(docs, plan, "lang")

    def export(seed, sub):
        out = str(tmp_path / sub)
        write_training_shards(
            mixed, out, num_shards=4, salt_cols=("epoch",),
            shuffle_seed=seed,
        )
        orders = {}
        for n in range(4):
            d = os.path.join(out, f"shard={n}")
            files = [f for f in os.listdir(d) if not f.startswith(("_", "."))]
            rows = []
            for f in sorted(files):
                with open(os.path.join(d, f)) as fh:
                    rows += [json.loads(line) for line in fh if line.strip()]
            orders[n] = [(r["doc_id"], r["epoch"]) for r in rows]
        return orders

    first = export(7, "a")
    # copies of at least one multi-epoch doc land in different shards
    shard_of = {}
    spread = False
    for n, rows in first.items():
        for doc, epoch in rows:
            prev = shard_of.setdefault(doc, n)
            if prev != n:
                spread = True
    assert spread
    # each shard's file order IS the md5(seed:id:epoch) order
    for n, rows in first.items():
        keys = [
            hashlib.md5(f"7:{doc}:{epoch}".encode()).hexdigest()
            for doc, epoch in rows
        ]
        assert keys == sorted(keys), f"shard {n} not in seeded order"
    # re-export reproduces the exact order; a new seed permutes it
    assert export(7, "b") == first
    other = export(8, "c")
    assert sorted(v for rows in other.values() for v in rows) == sorted(
        v for rows in first.values() for v in rows
    )
    assert other != first
