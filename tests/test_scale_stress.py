"""Scale-shaped stress checks over the docgen source: the operators'
exactness/balance claims exercised at 100-1000x the fixture corpus
size (still seconds on local[4] — the point is row volume through the
real code paths, not wall-clock)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.sources.docgen import register


def _docs(spark, n, parts=8, seed=5):
    register(spark)
    return (
        spark.read.format("docgen")
        .option("n", n).option("parts", parts).option("seed", seed)
        .load()
    )


@pytest.mark.slow
def test_heavy_hitters_exact_at_200k_docs(spark):
    from dataeng_azure_spotify_spark.operators.sketch import heavy_hitters

    docs = _docs(spark, 200_000)
    # ~10M tokens over a 29-word vocab; D = N/(k+1) ≈ 2.4k < threshold
    # → certified sketch path at real volume
    got = {
        (r["token"], r["n"])
        for r in heavy_hitters(docs, 300_000, k_per_partition=4096).collect()
    }
    want = {
        (r["token"], r["n"])
        for r in docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= 300_000)
        .collect()
    }
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_shard_balance_at_500k_rows(spark):
    from dataeng_azure_spotify_spark.operators.curation import shard_corpus

    docs = _docs(spark, 500_000, parts=16)
    sizes = [
        r["n"] for r in shard_corpus(docs, 64)
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(sizes) == 64
    mean = sum(sizes) / 64
    # hash balance: every shard within ±5% of mean at n/shard ≈ 7.8k
    assert all(abs(s - mean) / mean < 0.05 for s in sizes)


@pytest.mark.slow
def test_exact_dedup_on_generated_duplicates(spark):
    from dataeng_azure_spotify_spark.operators.dedup import exact_dedup_groups

    # two generations with the same seed → every doc duplicated once;
    # ids offset so the pairs are (i, i + 1M)
    a = _docs(spark, 50_000)
    b = a.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    groups = exact_dedup_groups(a.unionByName(b))
    # every text occurs exactly twice → every hash group has size 2 and
    # the canonical copy is the original (lower) id
    # (robust to chance text collisions within a generation: sizes stay
    # even and mass is conserved either way)
    assert groups.filter(F.col("group_size") % 2 != 0).count() == 0
    assert groups.filter(F.col("rep_id") >= 1_000_000).count() == 0
    assert groups.agg(F.sum("group_size")).collect()[0][0] == 100_000
