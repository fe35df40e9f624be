"""Bigram stupid-backoff LM scoring (llm/lm.py): hand-computed scores,
edge cases, pruning semantics, and DuckDB oracle parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.llm import lm
from tests.conftest import SF_DIR, assert_frames_match


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _micro(lp: float) -> int:
    return int(round(lp * lm.MICRO))


def _avg(micros: list[int]) -> float:
    # mirror lm._finalize: round-half-away of sm/n in exact ints, then
    # one exact division by 1e6
    sm, n = sum(micros), len(micros)
    q = (2 * abs(sm) + n) // (2 * n)
    return (-q if sm < 0 else q) / float(lm.MICRO)


def test_hand_computed_scores(spark):
    """train: 'a b a', 'b a' → uni a:3 b:2 (N=5, V=2); bigrams
    (a,b):1 (b,a):2; ctx a:1 b:2.  Score 'a b c':
    (a,b) = ln(1/1) = 0; (b,c) backs off = ln(0.4·(0+1)/7)."""
    train = _docs(spark, [(1, "a b a"), (2, "b a")])
    model = lm.train_bigram_lm(train)
    out = lm.score_documents(_docs(spark, [(10, "a b c")]), model).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_scored"] == 2
    micros = [
        _micro(math.log(1) - math.log(1)),
        _micro(math.log(0.4) + math.log(0 + 1) - math.log(5 + 2)),
    ]
    assert r["avg_logprob"] == _avg(micros)
    assert r["ppl"] == round(math.exp(-r["avg_logprob"]), 3)


def test_backoff_uses_unigram_count(spark):
    """'b b' is an unseen bigram but b is a frequent unigram — its
    backoff beats an unseen word's."""
    train = _docs(spark, [(1, "a b a"), (2, "b a")])
    model = lm.train_bigram_lm(train)
    out = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.score_documents(
            _docs(spark, [(1, "b b"), (2, "b z")]), model
        ).collect()
    }
    lp_bb = _avg([_micro(math.log(0.4) + math.log(2 + 1) - math.log(7))])
    lp_bz = _avg([_micro(math.log(0.4) + math.log(0 + 1) - math.log(7))])
    assert out == {1: lp_bb, 2: lp_bz}
    assert out[1] > out[2]


def test_short_docs_are_excluded(spark):
    model = lm.train_bigram_lm(_docs(spark, [(1, "a b")]))
    out = lm.score_documents(
        _docs(spark, [(1, "solo"), (2, ""), (3, None), (4, "a b")]), model
    ).collect()
    assert [r["doc_id"] for r in out] == [4]


def test_min_count_prunes_to_backoff(spark):
    """With min_count=2 the (a,b):1 bigram is pruned → its positions
    back off; the context table keeps FULL counts so retained bigrams
    normalize unchanged."""
    train = _docs(spark, [(1, "a b a"), (2, "b a")])
    full = lm.train_bigram_lm(train)
    pruned = lm.train_bigram_lm(train, min_count=2)
    assert pruned["bigrams"].count() == 1  # only (b,a):2 survives
    target = _docs(spark, [(9, "a b")])
    got = lm.score_documents(target, pruned).collect()[0]
    # a,b pruned → backoff on uni(b)=2 (uni min_count=2 keeps a:3, b:2)
    assert got["avg_logprob"] == _avg(
        [_micro(math.log(0.4) + math.log(2 + 1) - math.log(5 + 2))]
    )
    # and the full model scored it as a seen bigram
    full_got = lm.score_documents(target, full).collect()[0]
    assert full_got["avg_logprob"] == _avg([_micro(math.log(1) - math.log(1))])


def test_scoring_is_train_slice_independent_of_target(spark):
    """Scoring docs outside the training slice only reads the model —
    the English-trained model scores any language's tokens."""
    train = _docs(spark, [(1, "the cat sat")])
    model = lm.train_bigram_lm(train)
    out = lm.score_documents(_docs(spark, [(5, "der hund")]), model).collect()
    assert out[0]["n_scored"] == 1


def test_registry_query_matches_oracle(spark, oracle):
    from dataintegration_ecomprovider_spark.plans.registry import all_queries

    qd = all_queries()["llm_lm_perplexity"]
    assert_frames_match(
        qd.fn(spark, SF_DIR).toPandas(),
        oracle.execute(qd.oracle).fetchdf(),
        "llm_lm_perplexity",
    )


def test_stored_lm_model_is_cdc_maintained(spark, tmp_path):
    """The stored model (5 maintained tables composed from rowwise +
    aggregate maintainers) scores identically to the in-memory model,
    through seed AND delta (doc update, slice exit, delete, insert)."""
    from dataintegration_ecomprovider_spark.plans import publish

    root = str(tmp_path / "lm_store")
    docs = spark.createDataFrame(
        [(1, "a b a", "en"), (2, "b a", "en"), (3, "x y", "de")],
        "doc_id bigint, text string, lang string",
    )
    publish.publish_tables(
        spark, {"documents": docs}, root, table_keys={"documents": ["doc_id"]}
    )
    rep = lm.maintain_lm_model(spark, root, train_lang="en")
    assert {k: v["mode"] for k, v in rep.items()} == {
        "tokens": "seed", "bigrams": "seed", "unigram_counts": "seed",
        "bigram_counts": "seed", "ctx_counts": "seed",
    }

    targets = spark.createDataFrame(
        [(10, "a b c"), (11, "b b")], "doc_id bigint, text string"
    )

    def stored_scores():
        return {
            r["doc_id"]: (r["n_scored"], r["avg_logprob"], r["ppl"])
            for r in lm.score_documents(
                targets, lm.stored_model(spark, root)
            ).collect()
        }

    def direct_scores(train_df):
        return {
            r["doc_id"]: (r["n_scored"], r["avg_logprob"], r["ppl"])
            for r in lm.score_documents(
                targets, lm.train_bigram_lm(train_df)
            ).collect()
        }

    assert stored_scores() == direct_scores(
        docs.filter(F.col("lang") == "en").select("doc_id", "text")
    )

    # delta: doc 1 re-texts, doc 2 leaves the train slice (lang flip),
    # doc 4 arrives, doc 3 (never in slice) deletes
    publish.merge_into_mor(
        spark, root, "documents",
        spark.createDataFrame(
            [(1, "a a b", "en"), (2, "b a", "fr"), (4, "c a b", "en")],
            "doc_id bigint, text string, lang string",
        ),
        deletes=spark.createDataFrame([(3,)], "doc_id bigint"),
    )
    rep = lm.maintain_lm_model(spark, root, train_lang="en")
    assert all(v["mode"] == "delta" for v in rep.values()), rep
    final_train = spark.createDataFrame(
        [(1, "a a b"), (4, "c a b")], "doc_id bigint, text string"
    )
    assert stored_scores() == direct_scores(final_train)
    # pruning composes with the stored tables too
    pruned = lm.stored_model(spark, root, min_count=2)
    assert pruned["bigrams"].count() <= \
        lm.stored_model(spark, root)["bigrams"].count()


# --- trigram stupid backoff (round 11) --------------------------------------
def test_trigram_hand_computed_backoff_chain(spark):
    """train: 'a b a', 'b a c' → uni a:3 b:2 c:1 (N=6, V=3); bigrams
    (a,b):1 (b,a):2 (a,c):1, ctx a:2 b:2; trigrams (a,b,a):1 (b,a,c):1,
    ctx2 (a,b):1 (b,a):1.  Score 'a b a c z' — one position per chain
    level: bigram head, trigram hit x2, full floor."""
    train = _docs(spark, [(1, "a b a"), (2, "b a c")])
    model = lm.train_trigram_lm(train)
    out = lm.score_documents_trigram(
        _docs(spark, [(10, "a b a c z")]), model
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_scored"] == 4
    micros = [
        _micro(math.log(1) - math.log(2)),            # head (a,b)
        _micro(math.log(1) - math.log(1)),            # (a,b,a) trigram
        _micro(math.log(1) - math.log(1)),            # (b,a,c) trigram
        _micro(2 * math.log(0.4) + math.log(0 + 1) - math.log(6 + 3)),
    ]
    assert r["avg_logprob"] == _avg(micros)
    assert r["ppl"] == round(math.exp(-r["avg_logprob"]), 3)


def test_trigram_backs_off_to_seen_bigram(spark):
    """(b,a,b) is an unseen trigram but (a,b) is a seen bigram: the
    middle backoff level fires with ONE 0.4 factor."""
    train = _docs(spark, [(1, "a b a"), (2, "b a c")])
    model = lm.train_trigram_lm(train)
    out = lm.score_documents_trigram(_docs(spark, [(1, "b a b")]), model).collect()
    r = out[0]
    assert r["n_scored"] == 2
    micros = [
        _micro(math.log(2) - math.log(2)),                      # head (b,a)
        _micro(math.log(0.4) + math.log(1) - math.log(2)),      # 0.4·c(a,b)/ctx(a)
    ]
    assert r["avg_logprob"] == _avg(micros)


def test_trigram_two_token_doc_scores_bigram_head_only(spark):
    train = _docs(spark, [(1, "a b a")])
    model = lm.train_trigram_lm(train)
    out = lm.score_documents_trigram(_docs(spark, [(7, "a b")]), model).collect()
    assert out[0]["n_scored"] == 1
    # same value the bigram model assigns: n_scored is len-1 in both
    big = lm.score_documents(
        _docs(spark, [(7, "a b")]), lm.train_bigram_lm(train)
    ).collect()
    assert out[0]["avg_logprob"] == big[0]["avg_logprob"]


def test_trigram_min_count_prunes_trigrams_but_keeps_ctx2(spark):
    """min_count=2 prunes both 1-count trigrams → every trigram position
    backs off; ctx2 keeps FULL counts so a retained trigram would
    normalize unchanged."""
    train = _docs(spark, [(1, "a b a"), (2, "b a c")])
    pruned = lm.train_trigram_lm(train, min_count=2)
    assert pruned["trigrams"].count() == 0
    assert pruned["contexts2"].count() == 2
    out = lm.score_documents_trigram(
        _docs(spark, [(3, "a b a")]), pruned
    ).collect()[0]
    micros = [
        # head (a,b): bigram (a,b):1 also pruned → 0.4·uni floor on
        # w=b (ucnt 2, retained by the prune)
        _micro(math.log(0.4) + math.log(2 + 1) - math.log(6 + 3)),
        # (a,b,a): trigram pruned, bigram (b,a):2 retained → 0.4 level
        _micro(math.log(0.4) + math.log(2) - math.log(2)),
    ]
    assert out["avg_logprob"] == _avg(micros)


def test_trigram_registry_query_matches_oracle(spark, oracle):
    from dataintegration_ecomprovider_spark.plans.registry import all_queries

    qd = all_queries()["llm_lm_perplexity_trigram"]
    assert_frames_match(
        qd.fn(spark, SF_DIR).toPandas(),
        oracle.execute(qd.oracle).fetchdf(),
        "llm_lm_perplexity_trigram",
    )


# --- generic order-N engine (round 11) ---------------------------------------
def _fixture_docs(spark, n=120):
    from dataintegration_ecomprovider_spark.catalog import Catalog

    docs = Catalog(spark, SF_DIR).table("documents")
    return docs.filter(F.col("doc_id") < n)


def test_ngram_order2_reproduces_bigram_scorer(spark):
    """The generic engine at order 2 IS the bigram scorer — same counts,
    same chain, same micro-nat values on real fixture text."""
    docs = _fixture_docs(spark)
    train = docs.filter(F.col("lang") == "en")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in lm.score_documents_ngram(
            docs, lm.train_ngram_lm(train, order=2)
        ).collect()
    }
    want = {
        r["doc_id"]: tuple(r)[1:]
        for r in lm.score_documents(docs, lm.train_bigram_lm(train)).collect()
    }
    assert got == want


def test_ngram_order3_reproduces_trigram_scorer(spark):
    docs = _fixture_docs(spark)
    train = docs.filter(F.col("lang") == "en")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in lm.score_documents_ngram(
            docs, lm.train_ngram_lm(train, order=3)
        ).collect()
    }
    want = {
        r["doc_id"]: tuple(r)[1:]
        for r in lm.score_documents_trigram(
            docs, lm.train_trigram_lm(train)
        ).collect()
    }
    assert got == want


def test_ngram_order4_hand_computed_chain(spark):
    """train 'a b c d a b c e' → 4-grams each once; score 'a b c d z':
    head positions walk the shortened contexts, the 4-gram (a,b,c,d)
    hits, and z falls through the whole chain to the 0.4^3 floor."""
    train = _docs(spark, [(1, "a b c d a b c e")])
    model = lm.train_ngram_lm(train, order=4)
    out = lm.score_documents_ngram(_docs(spark, [(9, "a b c d z")]), model).collect()
    r = out[0]
    assert r["n_scored"] == 4
    # uni: a2 b2 c2 d1 e1 -> N=8 V=5; bigrams (a,b):2 (b,c):2 (c,d):1
    # (d,a):1 (c,e):1; trigrams (a,b,c):2 (b,c,d):1 (c,d,a):1 (d,a,b):1
    # (b,c,e):1; 4-grams (a,b,c,d):1 (b,c,d,a):1 (c,d,a,b):1 (d,a,b,c):1
    # (a,b,c,e):1
    micros = [
        _micro(math.log(2) - math.log(2)),   # pos2 (a,b)
        _micro(math.log(2) - math.log(2)),   # pos3 (a,b,c) trigram ctx2(a,b)=2
        _micro(math.log(1) - math.log(2)),   # pos4 (a,b,c,d): ctx3(a,b,c)=2
        _micro(3 * math.log(0.4) + math.log(0 + 1) - math.log(8 + 5)),  # z
    ]
    assert r["avg_logprob"] == _avg(micros)


def test_ngram_rejects_order_one(spark):
    with pytest.raises(ValueError, match="order >= 2"):
        lm.train_ngram_lm(_docs(spark, [(1, "a b")]), order=1)


def test_5gram_registry_query_matches_oracle(spark, oracle):
    from dataintegration_ecomprovider_spark.plans.registry import all_queries

    qd = all_queries()["llm_lm_perplexity_5gram"]
    assert_frames_match(
        qd.fn(spark, SF_DIR).toPandas(),
        oracle.execute(qd.oracle).fetchdf(),
        "llm_lm_perplexity_5gram",
    )
