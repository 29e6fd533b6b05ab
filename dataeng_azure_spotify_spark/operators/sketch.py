"""Bounded-memory frequency sketches: exact heavy hitters via a
two-pass Misra-Gries candidate filter.

The naive "which tokens appear ≥ T times in the corpus" query is a
full-vocabulary ``groupBy(token)`` — at 100 TB the token shuffle is the
entire corpus re-keyed on a heavy-tailed vocabulary (billions of
singleton keys moving through the exchange just to be discarded by the
HAVING). The sketch path never shuffles the tail:

- **Pass 1 (candidates)**: each input partition runs a Misra-Gries
  summary with ``k`` counters over its own tokens (vectorized: Arrow
  batches are counted with ``value_counts`` and MG-merged, so the
  Python loop is per *distinct-token-per-batch*, not per token). A
  partition emits ≤ k (token, count) rows plus one decrement-total row.
  MG guarantees ``true_p ≤ mg_p + d_p`` per partition, hence globally
  ``true ≤ Σ mg_p + D`` with ``D = Σ d_p ≤ N/(k+1)``. When the
  threshold clears the error budget (``T > D``), every token with true
  count ≥ T appears in some summary and the candidate set
  ``{token : Σ mg_p + D ≥ T}`` is a certified superset; otherwise the
  operator falls back to the exact full aggregation (the sketch may
  not have seen a qualifying tail token at all), so the result is
  exact at ANY k — k only decides whether the cheap path engages.
- **Pass 2 (exact)**: broadcast-semi-join the token stream against the
  (small) candidate set and count exactly. Only candidate keys shuffle.

Result is EXACT (same rows as the full groupBy + HAVING), which is what
makes it oracle-checkable; the sketch is purely a shuffle reducer.

Sketch merge follows the standard mergeable-summaries construction
(Agarwal et al., "Mergeable Summaries", PODS'12): combine counts, then
subtract the (k+1)-th largest and drop non-positive counters.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dataeng_azure_spotify_spark.functions.text import tokens_col

_MG_SCHEMA = StructType(
    [
        StructField("token", StringType()),
        StructField("cnt", LongType()),
        StructField("is_decr", BooleanType()),
    ]
)


def _mg_merge(counters: dict, batch_counts: pd.Series, k: int) -> int:
    """Merge exact batch counts into a k-counter MG summary in place.

    Returns the decrement applied this merge (0 if the combined summary
    already fits in k counters).
    """
    for tok, c in batch_counts.items():
        counters[tok] = counters.get(tok, 0) + int(c)
    if len(counters) <= k:
        return 0
    # subtract the (k+1)-th largest count from everything, drop ≤ 0
    delta = sorted(counters.values(), reverse=True)[k]
    if delta == 0:
        return 0
    for tok in list(counters):
        c = counters[tok] - delta
        if c > 0:
            counters[tok] = c
        else:
            del counters[tok]
    return delta


def _mg_partition(k: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        decrements = 0
        for pdf in batches:
            decrements += _mg_merge(counters, pdf["token"].value_counts(), k)
        out = pd.DataFrame(
            {
                "token": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [decrements],
                "is_decr": [False] * len(counters) + [True],
            }
        )
        yield out.astype({"cnt": "int64"})

    return run


def heavy_hitters(
    docs: DataFrame,
    min_count: int,
    text_col: str = "text",
    k_per_partition: int = 4096,
) -> DataFrame:
    """Exact tokens with global frequency ≥ ``min_count``.

    Returns ``(token string, n long)`` — identical to
    ``tokens.groupBy(token).count().filter(n >= min_count)`` but the
    vocabulary tail never enters a shuffle; only ≤ k-per-partition
    candidate keys do. ``k_per_partition`` trades candidate-set size
    (driver/broadcast pressure) against pass-1 summary memory; the
    output is exact for any value.
    """
    tokens = docs.select(F.explode(tokens_col(text_col)).alias("token"))
    exact_path = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= F.lit(min_count))
    )
    summary = tokens.mapInPandas(_mg_partition(k_per_partition), _MG_SCHEMA)
    summary = summary.persist()
    # D = global decrement total (≤ N/(k+1)); per-token global undercount
    # is ≤ D, so a token ABSENT from every summary has true count ≤ D.
    # The scalar collect is bounded: ≤ #partitions rows → 1.
    d_total = int(
        summary.filter("is_decr")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)))
        .collect()[0][0]
    )
    if min_count <= d_total:
        # The error budget swallows the threshold: the sketch cannot
        # certify that summary-absent tokens are below min_count, so the
        # sketch path would MISS true heavy hitters. Fall back to the
        # full exact aggregation (correct at any k; costs the vocabulary
        # shuffle the sketch exists to avoid). Callers wanting the cheap
        # path at scale size k_per_partition ≳ total_tokens / min_count.
        summary.unpersist()
        return exact_path
    candidates = (
        summary.filter(~F.col("is_decr"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("mg"))
        .filter(F.col("mg") + F.lit(d_total) >= F.lit(min_count))
        .select("token")
        # eager localCheckpoint (not persist): materializes the tiny
        # candidate set off the cached summary NOW, and its blocks are
        # reclaimed by the ContextCleaner once callers drop the returned
        # DataFrame — a persist() here would pin the candidate set in
        # the cache manager for the session's life with no unpersist path
        .localCheckpoint(eager=True)
    )
    summary.unpersist()
    return (
        tokens.join(F.broadcast(candidates), on="token", how="leftsemi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= F.lit(min_count))
    )
