"""Scale-validation measurements for the heavy dedup family.

Shared by the slow-marked assertions in ``tests/test_scale_stress.py``
and the table-producing CLI ``docs/scale_validation.py`` (whose output
is committed in ``docs/BENCH_NOTES.md``): one function that runs the
candidate-generation stages of PPJoin / MinHash-LSH / SimHash, the
connected-components convergence, and the Misra-Gries candidate pass
over a :func:`.sources.docgen.near_dup_corpus` corpus at a given scale
and returns the counts the 100 TB growth claims are judged on.
"""

from __future__ import annotations

import math
import time

from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import graph as G
from .operators.sketch import _MG_SCHEMA, _mg_partition, tokens_col
from .sources.docgen import near_dup_corpus


def simhash_raw_model(n_docs: int, max_hamming: int) -> float:
    """Closed-form expected raw band-bucket comparisons for uniform
    fingerprints: Σ_bands C(n,2) / 2^bits(band). The measured/model
    agreement is the evidence that band buckets stay hash-uniform (no
    skew collapse) as the corpus grows."""
    n_bands = max_hamming + 1
    band_bits = D.SIMHASH_BITS // n_bands + (1 if D.SIMHASH_BITS % n_bands else 0)
    pairs = n_docs * (n_docs - 1) / 2
    total = 0.0
    remaining = D.SIMHASH_BITS
    for _ in range(n_bands):
        bits = min(band_bits, remaining)
        remaining -= bits
        total += pairs / (1 << bits)
    return total


def scale_measure(spark, n: int, max_hamming: int = 6) -> dict:
    """Measure candidate/convergence/sketch growth at ``n`` base docs.

    Returns a dict of counts; see ``docs/scale_validation.py`` for the
    column meanings and ``docs/BENCH_NOTES.md`` for the committed
    1x/10x/100x table and its reading.
    """
    t0 = time.time()
    corpus = near_dup_corpus(spark, n).localCheckpoint(eager=True)
    n_docs = corpus.count()

    sh, jac_cand = D.ngram_jaccard_candidates(corpus, n=3, threshold=0.5)
    jac_candidates = jac_cand.count()
    true_pairs_df = D._verify_jaccard(
        jac_cand, sh, 0.5, shingle_col="hshingles"
    ).localCheckpoint(eager=True)
    true_pairs = true_pairs_df.count()

    _, mh_cand = D.minhash_lsh_candidates(corpus, n=3)
    mh_candidates = mh_cand.count()

    sim_pairs = D.simhash_neardup_pairs(corpus, max_hamming=max_hamming).count()
    bands = D.simhash_bands(D.simhash_fingerprints(corpus), max_hamming)
    a, b = bands.alias("a"), bands.alias("b")
    sim_raw = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).count()

    edges = true_pairs_df.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels = G.star_components(edges)
    n_components = labels.select("component").distinct().count()
    cc_rounds = G._LAST_STAR_ROUNDS
    n_nodes = labels.count()
    cc_budget = max(1, math.ceil(math.log2(max(2, n_nodes)))) ** 2

    # heavy hitters on the BUILTIN vocabulary (token-dense regime):
    # certified-sketch-path candidate set, replicating the operator's
    # pass-1 exactly (the corpus above uses the synthetic vocab, so
    # re-generate with vocab=0)
    hh_docs = near_dup_corpus(spark, n, vocab=0)
    tokens = hh_docs.select(F.explode(tokens_col("text")).alias("token"))
    total_tokens = tokens.count()
    min_count = max(1, total_tokens // 58)  # ~half the mean per-word mass
    summary = tokens.mapInPandas(_mg_partition(4096), _MG_SCHEMA).localCheckpoint(
        eager=True
    )
    d_total = int(
        summary.filter("is_decr")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)))
        .collect()[0][0]
    )
    hh_candidates = (
        summary.filter(~F.col("is_decr"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("mg"))
        .filter(F.col("mg") + F.lit(d_total) >= F.lit(min_count))
        .count()
    )

    return {
        "n_base": n,
        "n_docs": n_docs,
        "true_pairs": true_pairs,
        "jac_candidates": jac_candidates,
        "mh_candidates": mh_candidates,
        "sim_pairs": sim_pairs,
        "sim_raw": sim_raw,
        "sim_raw_model": round(simhash_raw_model(n_docs, max_hamming)),
        "n_components": n_components,
        "cc_rounds": cc_rounds,
        "cc_budget": cc_budget,
        "hh_total_tokens": total_tokens,
        "hh_min_count": min_count,
        "hh_candidates": hh_candidates,
        "hh_certified": min_count > d_total,
        "sec": round(time.time() - t0, 1),
    }
