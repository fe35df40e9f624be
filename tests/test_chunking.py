"""Sliding-window chunking invariants (llm/chunking.py): full coverage of
every word, exact overlap, lossless reconstruction at stride==max_words,
and the zero-shuffle plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.catalog import Catalog
from dataintegration_ecomprovider_spark.llm.chunking import chunk_documents
from tests.conftest import SF_DIR


def _docs(spark):
    return Catalog(spark, SF_DIR).table("documents")


def test_partitioning_chunks_reconstruct_document(spark):
    """stride == max_words: chunks partition the word sequence exactly, so
    re-joining them reproduces the whitespace-normalized document."""
    docs = _docs(spark)
    chunks = chunk_documents(docs, max_words=25, stride=25)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("chunk_id", F.col("chunk_text").alias("t")))
                    ),
                    lambda s: s["t"],
                ),
            ).alias("rebuilt")
        )
    )
    orig = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        F.concat_ws(" ", F.split(F.trim("text"), "\\s+")).alias("norm"),
    )
    diff = (
        rebuilt.join(orig, "doc_id")
        .filter(F.col("rebuilt") != F.col("norm"))
        .count()
    )
    assert diff == 0
    assert rebuilt.count() == orig.count()


def test_overlap_and_counts(spark):
    docs = _docs(spark)
    chunks = chunk_documents(docs, max_words=40, stride=30).toPandas()
    assert (chunks["chunk_words"] >= 1).all()
    assert (chunks["chunk_words"] <= 40).all()
    # word-count conservation: sum over chunks = n_words + overlap*(chunks-1)
    per_doc = chunks.groupby("doc_id").agg(
        total=("chunk_words", "sum"), k=("chunk_id", "count")
    )
    nw = (
        _docs(spark)
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.size(F.split(F.trim("text"), "\\s+")).alias("n"))
        .toPandas()
        .set_index("doc_id")["n"]
    )
    for doc_id, row in per_doc.iterrows():
        n = int(nw[doc_id])
        # chunk i starts at i*30; all words covered, overlap = 10 between
        # consecutive full windows, last window clamps
        covered = sum(min(40, n - i * 30) for i in range(int(row["k"])))
        assert row["total"] == covered
        # the final chunk must reach the last word
        assert (int(row["k"]) - 1) * 30 + min(40, n - (int(row["k"]) - 1) * 30) == n


def test_stride_validation(spark):
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(_docs(spark), max_words=10, stride=11)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(_docs(spark), max_words=10, stride=0)


def test_chunking_is_shuffle_free(spark):
    plan = (
        chunk_documents(_docs(spark), max_words=50, stride=25)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan[:1500]


# --- property: chunk arithmetic matches a pure-Python model ----------------
from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    n_words=st.integers(min_value=1, max_value=400),
    max_words=st.integers(min_value=1, max_value=60),
    data=st.data(),
)
def test_chunk_arithmetic_matches_python_model(spark, n_words, max_words, data):
    stride = data.draw(st.integers(min_value=1, max_value=max_words))
    text = " ".join(f"w{i}" for i in range(n_words))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = (
        chunk_documents(docs, max_words=max_words, stride=stride)
        .orderBy("chunk_id")
        .collect()
    )
    words = text.split()
    expect = []
    i = 0
    while True:
        expect.append(" ".join(words[i : i + max_words]))
        if i + max_words >= n_words:
            break
        i += stride
    assert [r["chunk_text"] for r in got] == expect
    assert [r["chunk_words"] for r in got] == [len(c.split()) for c in expect]
