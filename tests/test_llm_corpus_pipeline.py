"""End-to-end LLM corpus curation pipeline (plans/llm_corpus.py):
the full gate chain composed on the Pipeline runner — monotone
shrinkage, per-stage audit counts, deterministic re-runs, and stage
semantics spot-checks (the operators themselves are oracle-certified;
this is the plumbing test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.plans.llm_corpus import (
    build_llm_corpus_pipeline,
)

SF = "/root/testdata/sf0.001"


def test_llm_corpus_pipeline_end_to_end(spark, tmp_path):
    docs = spark.read.parquet(SF + "/documents.parquet")
    n_raw = docs.count()

    p = build_llm_corpus_pipeline(
        docs,
        str(tmp_path / "run1"),
        blocklist=("dup",),
        max_blocked_ppm=40000,
        mix_total=100,
        n_shards=4,
    )
    assert p.order() == [
        "gate_blocklist",
        "gate_quality",
        "dedup_exact",
        "dedup_near",
        "rewrite_spans",
        "mix",
        "shards",
    ]
    audit = p.run(spark)

    # monotone shrinkage through the gates; rewrite/shards preserve rows
    assert n_raw >= audit["gate_blocklist"] >= audit["gate_quality"]
    assert audit["gate_quality"] >= audit["dedup_exact"]
    assert audit["dedup_exact"] >= audit["dedup_near"] > 0
    assert audit["rewrite_spans"] == audit["dedup_near"]
    assert audit["mix"] == 100  # exact largest-remainder apportionment
    assert audit["shards"] == 100

    # every stage actually filtered or transformed: the final table has
    # the shard column, intact ids, and cleaned text
    final = spark.read.parquet(str(tmp_path / "run1" / "shards"))
    assert set(final.columns) >= {"doc_id", "text", "shard"}
    assert final.select("shard").distinct().count() <= 4
    assert final.filter(F.col("text").isNull()).count() == 0

    # determinism: a second run from scratch lands the identical final
    # shard assignment (every stage is seeded-hash / integer-exact)
    p2 = build_llm_corpus_pipeline(
        docs,
        str(tmp_path / "run2"),
        blocklist=("dup",),
        max_blocked_ppm=40000,
        mix_total=100,
        n_shards=4,
    )
    audit2 = p2.run(spark)
    assert audit2 == audit
    final2 = spark.read.parquet(str(tmp_path / "run2" / "shards"))
    a = sorted(
        (r["doc_id"], r["shard"], r["text"])
        for r in final.select("doc_id", "shard", "text").collect()
    )
    b = sorted(
        (r["doc_id"], r["shard"], r["text"])
        for r in final2.select("doc_id", "shard", "text").collect()
    )
    assert a == b
