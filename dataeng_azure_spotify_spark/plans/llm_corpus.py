"""End-to-end LLM training-corpus curation as a declared pipeline —
the composition story: every gate this engine ships, chained in the
order a real pretraining pipeline runs them (C4/Gopher/LLaMA recipe),
on the :class:`~.pipeline.Pipeline` DLT-analogue runner.

Stage graph (each stage lands a parquet table under ``workdir`` —
the medallion habit, so any stage's output is inspectable and the
pipeline is resumable at stage granularity)::

    raw documents
      → gate_blocklist   (C4 bad-words ppm gate)
      → gate_quality     (trained NB classifier, Gopher-weak-labeled)
      → dedup_exact      (md5 keep-lowest-id)
      → dedup_near       (MinHash-LSH pairs → connected components →
                          keep one survivor per cluster)
      → rewrite_spans    (ExactSubstr: excise duplicated spans)
      → mix              (temperature-scaled source rebalance)
      → shards           (deterministic hash shards)

Every stage is the already-oracle-certified operator — this module
adds NO new math, only the composition, so the e2e determinism test
(tests/test_llm_corpus_pipeline.py) is about plumbing: monotone
shrinkage, stage-count audit, and bit-identical re-runs.

Scale: each stage is corpus-linear with the shuffle structure its
operator documents (SCALE_DESIGN.md); staging through parquet between
stages costs one write+read per stage but buys stage-granular
restart, inspection, and lineage cuts — at 100 TB that trade is the
standard medallion answer, and a caller who wants it fused can chain
the same operators lazily instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.functions.text import (
    gopher_pass_col,
    token_count,
)
from dataeng_azure_spotify_spark.operators.curation import (
    blocklist_filter,
    shard_corpus,
    temperature_mix,
)
from dataeng_azure_spotify_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
)
from dataeng_azure_spotify_spark.operators.graph import (
    component_representatives,
    connected_components,
)
from dataeng_azure_spotify_spark.operators.quality_nb import (
    nb_quality_train_score,
)
from dataeng_azure_spotify_spark.operators.substring import (
    remove_duplicate_spans,
)
from dataeng_azure_spotify_spark.plans.pipeline import Pipeline


def build_llm_corpus_pipeline(
    docs: DataFrame,
    workdir: str,
    blocklist: "tuple[str, ...]" = ("dup",),
    max_blocked_ppm: int = 40000,
    nb_min_score_nano: int = 0,
    mix_total: int = 100,
    mix_alpha: float = 0.5,
    n_shards: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Pipeline:
    """Declare the curation DAG over ``docs``; run with
    ``pipeline.run(spark)``. Each node writes
    ``<workdir>/<stage>/`` parquet and returns its row count, so
    ``run()``'s result dict doubles as the per-stage audit table."""

    def _path(stage: str) -> str:
        return os.path.join(workdir, stage)

    def _land(df: DataFrame, stage: str) -> int:
        df.write.mode("overwrite").parquet(_path(stage))
        return df.sparkSession.read.parquet(_path(stage)).count()

    def _read(spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(_path(stage))

    p = Pipeline(name="llm_corpus")

    def gate_blocklist(spark: SparkSession) -> int:
        keep = (
            blocklist_filter(
                docs,
                blocklist,
                max_blocked_ppm=max_blocked_ppm,
                text_col=text_col,
                id_col=id_col,
            )
            .filter(F.col("keep"))
            .select(id_col)
        )
        return _land(docs.join(keep, id_col, "left_semi"), "gate_blocklist")

    def gate_quality(spark: SparkSession) -> int:
        cur = _read(spark, "gate_blocklist")
        scored = nb_quality_train_score(
            cur, gopher_pass_col(text_col), id_col=id_col, text_col=text_col
        )
        keep = scored.filter(
            F.col("score_nano") > F.lit(int(nb_min_score_nano))
        ).select(id_col)
        return _land(cur.join(keep, id_col, "left_semi"), "gate_quality")

    def dedup_exact(spark: SparkSession) -> int:
        cur = _read(spark, "gate_quality")
        reps = exact_dedup_groups(cur, text_col, id_col).select(
            F.col("rep_id").alias(id_col)
        )
        return _land(cur.join(reps, id_col, "left_semi"), "dedup_exact")

    def dedup_near(spark: SparkSession) -> int:
        cur = _read(spark, "dedup_exact")
        pairs = minhash_lsh_pairs(cur, text_col, id_col).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        labels = connected_components(pairs)
        scores = cur.select(
            F.col(id_col).alias("node"),
            token_count(text_col).alias("score"),
        )
        # keep the longest member of every near-dup cluster; docs in no
        # cluster are their own component (connected_components only
        # labels edge endpoints, so the join keeps singletons via the
        # anti side)
        survivors = component_representatives(labels, scores).select(
            F.col("node").alias(id_col)
        )
        clustered = labels.select(F.col("node").alias(id_col))
        untouched = cur.join(clustered, id_col, "left_anti").select(id_col)
        keep = survivors.unionByName(untouched)
        return _land(cur.join(keep, id_col, "left_semi"), "dedup_near")

    def rewrite_spans(spark: SparkSession) -> int:
        cur = _read(spark, "dedup_near")
        clean = remove_duplicate_spans(cur, text_col, id_col).select(
            id_col, F.col("text_clean").alias(text_col)
        )
        carried = [c for c in cur.columns if c not in (text_col,)]
        out = cur.select(*carried).join(clean, id_col)
        return _land(out, "rewrite_spans")

    def mix(spark: SparkSession) -> int:
        cur = _read(spark, "rewrite_spans")
        chosen = temperature_mix(
            cur, total_n=mix_total, alpha=mix_alpha, id_col=id_col
        ).select(id_col)
        return _land(cur.join(chosen, id_col, "left_semi"), "mix")

    def shards(spark: SparkSession) -> int:
        cur = _read(spark, "mix")
        return _land(shard_corpus(cur, n_shards, id_col=id_col), "shards")

    p.add("gate_blocklist", gate_blocklist, (),
          "C4 bad-words ppm gate")
    p.add("gate_quality", gate_quality, ("gate_blocklist",),
          "trained NB quality classifier, Gopher weak labels")
    p.add("dedup_exact", dedup_exact, ("gate_quality",),
          "md5 exact dedup, keep lowest id")
    p.add("dedup_near", dedup_near, ("dedup_exact",),
          "MinHash-LSH near-dup clusters, keep longest member")
    p.add("rewrite_spans", rewrite_spans, ("dedup_near",),
          "ExactSubstr duplicated-span excision")
    p.add("mix", mix, ("rewrite_spans",),
          "temperature-scaled source rebalance")
    p.add("shards", shards, ("mix",),
          "deterministic hash shards")
    return p
