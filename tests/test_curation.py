"""Semantics tests for llm/curation.py on planted fixtures — cases the
synthetic corpus can't exercise (real PII hits, known contamination,
degenerate repetition)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.llm import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_flags_degenerate_doc(spark):
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam spam"),          # all one word
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, ""),                                   # empty
            (4, "a b a b a b a b"),                    # bigram loop
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.repetition_metrics(docs).collect()
    }
    assert out[1]["dup_word_ratio"] == 1.0
    assert out[1]["top_word_ratio"] == 1.0
    assert not out[1]["keep"]
    assert out[2]["dup_word_ratio"] == 0.0
    assert out[2]["keep"]
    assert out[3]["word_count"] == 0 and out[3]["keep"]
    # doc 4: 7 bigrams, "a b" appears 4 times
    assert out[4]["top_bigram_ratio"] == round(4 / 7, 6)
    assert not out[4]["keep"]


def test_decontaminate_planted_overlap(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            (1, "quick brown fox somewhere else entirely"),  # 1 shared 3-gram
            (2, "totally unrelated words here now"),          # none
            (3, "the quick brown fox jumps elsewhere"),       # several shared
        ],
    )
    out = {
        r["doc_id"]: r
        for r in curation.decontaminate(corpus, bench, n=3, threshold=0.3).collect()
    }
    assert out[1]["n_overlap"] == 1 and not out[1]["contaminated"]
    assert out[2]["n_overlap"] == 0 and out[2]["overlap_ratio"] == 0.0
    # doc 3 shares "the quick brown", "quick brown fox", "brown fox jumps"
    assert out[3]["n_overlap"] == 3 and out[3]["contaminated"]


def test_pii_scrub_counts_and_redacts(spark):
    df = _docs(
        spark,
        [(1, "mail a.user+x@sub.example.org or 192.168.001.042 call 555-123-4567 done")],
    )
    cols = curation.pii_scrub(F.col("text"))
    row = df.select(
        cols["n_emails"].alias("e"),
        cols["n_ipv4"].alias("i"),
        cols["n_phones"].alias("p"),
        cols["redacted"].alias("r"),
    ).collect()[0]
    assert (row["e"], row["i"], row["p"]) == (1, 1, 1)
    assert row["r"] == "mail <EMAIL> or <IP> call <PHONE> done"


def test_pii_scrub_no_false_positives_on_plain_text(spark):
    df = _docs(spark, [(1, "plain words only, version 1.2 of 3 things")])
    cols = curation.pii_scrub(F.col("text"))
    row = df.select(
        cols["n_emails"].alias("e"), cols["n_ipv4"].alias("i"), cols["n_phones"].alias("p")
    ).collect()[0]
    assert (row["e"], row["i"], row["p"]) == (0, 0, 0)


def test_decontaminate_exact_substring(spark):
    """A verbatim 64+-char quote flags; a paraphrase (no 64-char exact
    window shared) does not; short docs never match."""
    from dataintegration_ecomprovider_spark.llm.curation import decontaminate_exact

    secret = "the quick brown fox jumps over the lazy dog while seventeen owls watch silently from the oak"
    bench = spark.createDataFrame([(100, secret)], "doc_id bigint, text string")
    corpus = spark.createDataFrame(
        [
            (1, f"prefix junk {secret} suffix junk"),          # verbatim quote
            (2, secret.replace("seventeen", "eighteen")),       # paraphrase
            (3, "way too short"),                               # < window
            (4, "x" * 200),                                     # unrelated
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.n_hits, r.contaminated)
        for r in decontaminate_exact(corpus, bench, window=64).collect()
    }
    assert got[1][1] is True and got[1][0] > 0
    assert got[2] == (0, False)  # the edit breaks every 64-window crossing it
    assert got[3] == (0, False)
    assert got[4] == (0, False)


def test_line_dedup_removes_global_boilerplate(spark):
    from dataintegration_ecomprovider_spark.llm.curation import line_dedup

    banner = "SUBSCRIBE TO OUR NEWSLETTER FOR MORE"
    docs = spark.createDataFrame(
        [
            (1, f"unique first body line here\n{banner}\nok"),
            (2, f"a different body line entirely\n{banner}\nok"),
            (3, f"third doc distinct content line\n{banner}"),
            (4, banner),  # all lines removed -> empty text
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: (r.text, r.n_removed) for r in line_dedup(docs).collect()}
    assert got[1] == ("unique first body line here\nok", 1)
    assert got[2] == ("a different body line entirely\nok", 1)
    assert got[3] == ("third doc distinct content line", 1)
    assert got[4] == ("", 1)
    # short lines ("ok") are never candidates even though repeated


def _bench(spark, rows):
    return spark.createDataFrame(rows, "bench_id long, text string")


def test_incremental_contamination_matches_recompute(spark, tmp_path):
    """The persisted decontamination index (corpus shingles + benchmark
    shingles + contamination, all CDC-maintained) must equal a
    from-scratch decontaminate() over the current corpus/benchmark state
    at every step — and adding a NEW benchmark must re-flag exactly the
    docs containing its shingles, via the index probe, not a corpus
    re-scan."""
    from dataintegration_ecomprovider_spark.plans import publish

    corpus0 = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "machine learning models train on deduplicated corpora daily"),
        (3, "completely unrelated words about gardening and cooking herbs"),
        (4, "the quick brown fox jumps over the lazy dog again"),
    ]
    bench0 = [(100, "machine learning models train on clean data")]
    root = str(tmp_path / "store")
    publish.publish_tables(
        spark,
        {
            "documents": spark.createDataFrame(corpus0, "doc_id long, text string"),
            "benchmarks": _bench(spark, bench0),
        },
        root,
        table_keys={"documents": ["doc_id"], "benchmarks": ["bench_id"]},
    )
    maintainers = (
        curation.maintain_corpus_shingles,
        curation.maintain_benchmark_shingles,
        curation.maintain_contamination,
    )
    for fn in maintainers:
        assert fn(spark, root)["mode"] == "seed"

    def stored():
        return {
            r["doc_id"]: (
                r["n_shingles"], r["n_overlap"],
                r["overlap_ratio"], r["contaminated"],
            )
            for r in publish.read_table(spark, root, "contamination").collect()
        }

    def recomputed():
        docs = publish.read_table(spark, root, "documents")
        bench = publish.read_table(spark, root, "benchmarks")
        return {
            r["doc_id"]: (
                r["n_shingles"], r["n_overlap"],
                r["overlap_ratio"], r["contaminated"],
            )
            for r in curation.decontaminate(
                docs, bench, id_col="doc_id", n=3, threshold=0.05
            ).collect()
            if r["n_shingles"] > 0
        }

    assert stored() == recomputed()
    assert stored()[2][3] is True   # overlaps bench 100
    assert stored()[1][3] is False

    # NEW benchmark = doc 1's exact text → docs 1 and 4 (shared prefix)
    # must re-flag; doc 2's row must NOT change identity
    publish.merge_into_mor(
        spark, root, "benchmarks",
        _bench(spark, [(101, corpus0[0][1])]),
    )
    assert curation.maintain_corpus_shingles(spark, root)["mode"] == "empty"
    assert curation.maintain_benchmark_shingles(spark, root)["mode"] == "delta"
    assert curation.maintain_contamination(spark, root)["mode"] == "delta"
    assert stored() == recomputed()
    assert stored()[1][3] is True and stored()[4][3] is True

    # corpus churn: delete doc 3, rewrite doc 4 clean, insert doc 5
    # copying benchmark 100's text
    publish.merge_into_mor(
        spark, root, "documents",
        spark.createDataFrame(
            [(4, "totally fresh vocabulary nothing shared here"),
             (5, bench0[0][1])],
            "doc_id long, text string",
        ),
        deletes=spark.createDataFrame([(3,)], "doc_id long"),
    )
    assert curation.maintain_corpus_shingles(spark, root)["mode"] == "delta"
    assert curation.maintain_benchmark_shingles(spark, root)["mode"] == "empty"
    assert curation.maintain_contamination(spark, root)["mode"] == "delta"
    got = stored()
    assert got == recomputed()
    assert 3 not in got              # retracted with its shingle rows
    assert got[5][3] is True and got[5][1] == got[5][0]  # full overlap
    assert got[4][3] is False

    # retire benchmark 101: docs 1 and 4 lose their overlap
    publish.merge_into_mor(
        spark, root, "benchmarks",
        _bench(spark, []).limit(0),
        deletes=spark.createDataFrame([(101,)], "bench_id long"),
    )
    assert curation.maintain_benchmark_shingles(spark, root)["mode"] == "delta"
    assert curation.maintain_contamination(spark, root)["mode"] == "delta"
    assert stored() == recomputed()
    assert stored()[1][3] is False
