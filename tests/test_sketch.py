"""Misra-Gries heavy hitters: exactness vs the naive groupBy at small k
(forcing decrements), empty/edge inputs, and broadcast-semi plan shape."""

from __future__ import annotations

import random

from pyspark.sql import Row, functions as F

from dataeng_azure_spotify_spark.operators.sketch import heavy_hitters


def _exact(docs, min_count):
    from dataeng_azure_spotify_spark.functions.text import tokens_col

    return {
        (r["token"], r["n"])
        for r in docs.select(F.explode(tokens_col("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
        .collect()
    }


def test_heavy_hitters_exact_under_tiny_k(spark):
    # zipf-ish corpus with vocab ≫ k so pass-1 MUST decrement; the
    # two-pass result must still equal the exact groupBy + HAVING
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(rng.choices(vocab, weights=[1 / (j + 1) for j in range(200)], k=50)))
            for i in range(40)
        ]
    ).repartition(8)
    # k=4: error budget D ≫ thresholds → exact-fallback path, still exact
    for min_count in (5, 25, 80):
        got = {
            (r["token"], r["n"])
            for r in heavy_hitters(docs, min_count, k_per_partition=4).collect()
        }
        assert got == _exact(docs, min_count)
    # k=512: D < threshold → certified sketch path, identical answer
    for min_count in (25, 80):
        got = {
            (r["token"], r["n"])
            for r in heavy_hitters(docs, min_count, k_per_partition=512).collect()
        }
        assert got == _exact(docs, min_count)


def test_heavy_hitters_empty_and_blank_docs(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="   ")]
    )
    assert heavy_hitters(docs, 1).count() == 0


def test_heavy_hitters_threshold_above_everything(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b a")])
    assert heavy_hitters(docs, 10).count() == 0
    got = {(r["token"], r["n"]) for r in heavy_hitters(docs, 2).collect()}
    assert got == {("a", 2)}


def test_heavy_hitters_plan_broadcast_semi_join(spark):
    docs = spark.createDataFrame([Row(doc_id=i, text="x y z") for i in range(10)])
    plan = (
        heavy_hitters(docs, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # pass 2 must semi-join the token stream against broadcast candidates
    # (only candidate keys reach the final count's shuffle)
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
