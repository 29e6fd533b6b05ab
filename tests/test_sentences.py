"""Sentence segmentation: builtin fast path semantics, UDTF parity
(row-identical to the codegen path), and plan shape (no shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dataeng_azure_spotify_spark.functions.sentences import (
    make_sentence_split_udtf,
    split_sentences,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="Hello world. How are you?! Fine."),
            Row(doc_id=2, text="...leading dots. trailing   "),
            Row(doc_id=3, text="no terminal punctuation at all"),
            Row(doc_id=4, text=""),
            Row(doc_id=5, text=None),
        ],
        "doc_id long, text string",
    )


def test_split_sentences_semantics(docs):
    got = {
        (r["doc_id"], r["sentence_idx"]): (r["sentence"], r["n_tokens"])
        for r in split_sentences(docs).collect()
    }
    assert got == {
        (1, 0): ("Hello world", 2),
        (1, 1): ("How are you", 3),
        (1, 2): ("Fine", 1),
        (2, 0): ("leading dots", 2),
        (2, 1): ("trailing", 1),
        (3, 0): ("no terminal punctuation at all", 5),
    }


def test_udtf_matches_builtin_path(spark, docs):
    udtf_cls = make_sentence_split_udtf()
    spark.udtf.register("sentence_split_udtf", udtf_cls)
    docs.createOrReplaceTempView("sent_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_tokens "
        "FROM sent_docs d, LATERAL sentence_split_udtf(d.text) s"
    )
    assert sorted(map(tuple, via_udtf.collect())) == sorted(
        map(tuple, split_sentences(docs).collect())
    )


def test_split_sentences_is_shuffle_free(docs):
    plan = split_sentences(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # builtin path never leaves the JVM
