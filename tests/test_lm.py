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
    return round(sum(micros) / (len(micros) * float(lm.MICRO)), 6)


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
