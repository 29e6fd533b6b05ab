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
from .operators import similarity as S
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


def embedding_corpus(spark, n: int, dim: int = 32, dup_every: int = 10):
    """Deterministic synthetic embeddings with KNOWN near-dup structure:
    ``n`` hash-derived unit-free vectors (components uniform in
    [-1, 1], pure function of (id, dim) — no RNG state, any two builds
    identical) plus one lightly-noised copy of every ``dup_every``-th
    vector at id offset 10⁸. Unrelated 32-d hash vectors have
    |cosine| ≲ 0.5 w.h.p. while the noised copies sit at ≈ 0.9997, so
    a 0.9 threshold separates true near-dups from chance exactly."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                (
                    F.pmod(
                        F.xxhash64(F.concat_ws("_", F.col("id"), d)),
                        F.lit(2001),
                    )
                    - F.lit(1000)
                )
                / F.lit(1000.0)
            ).cast("float"),
        ).alias("embedding"),
    )
    dups = base.filter(F.col("vec_id") % dup_every == 0).select(
        (F.col("vec_id") + 100_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x: (
                x
                + (
                    F.pmod(F.xxhash64(F.concat_ws("|", F.col("vec_id"), x)), F.lit(101))
                    - F.lit(50)
                )
                / F.lit(5000.0)
            ).cast("float"),
        ).alias("embedding"),
    )
    return base.unionByName(dups)


def embedding_scale_measure(spark, n: int, threshold: float = 0.9) -> dict:
    """Embedding-tier growth measurement at ``n`` base vectors:

    - blocked-GEMM near-dup join: verified pairs (must track true dup
      mass, linear) and the exact shuffle fan-out rows ``n_docs × B``
      (every vector's block participates in exactly B of the
      B(B+1)/2 block pairs — the declared replication cost, linear in
      n for fixed block count, never an n² pair table);
    - IVF probe economics: fraction of the corpus scanned by an
      ``nprobe``-bucket probe (≈ nprobe/num_centroids independent of
      n) and probe recall vs the exact top-1.
    """
    t0 = time.time()
    corpus = embedding_corpus(spark, n).localCheckpoint(eager=True)
    n_docs = corpus.count()

    num_blocks = max(
        4, math.isqrt(2 * spark.sparkContext.defaultParallelism) + 1
    )
    pairs = S.cosine_neardup_pairs(
        corpus, threshold=threshold, num_blocks=num_blocks
    ).count()
    # closed form: block b appears in pairs (i,b) i<=b and (b,j) j>=b —
    # B pairs total — so every vector is shipped B times (empirically
    # re-verified against a fanned.count() in the review pass)
    fan_rows = n_docs * num_blocks

    num_centroids, nprobe, n_queries = 64, 8, 10
    centroids = S.kmeans_centroids(corpus, k=num_centroids, iters=1)
    assignment = S.ivf_assign(corpus, centroids)
    sizes = assignment.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("long").alias("bn")
    )
    # recall queries are vectors WITH a planted near-dup (their true
    # 1-NN is the ≈0.9997-cosine copy): a scale-independent signal —
    # for dup-less vectors the "nearest" is an arbitrary ~0.5-cosine
    # stranger, which measures the random geometry, not the index
    queries = corpus.filter(
        (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 10 * n_queries)
    )
    probes = S.cosine_topk(
        queries,
        centroids.withColumnRenamed("centroid_id", "vec_id"),
        k=nprobe,
        exact=False,
        exclude_self=False,
    ).select(F.col("query_id"), F.col("neighbor_id").alias("centroid_id"))
    scanned = (
        probes.join(sizes, on="centroid_id")
        .agg(F.coalesce(F.sum("bn"), F.lit(0)))
        .first()[0]
    )
    probe_fraction = float(scanned) / (n_docs * n_queries)

    exact1 = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(queries, corpus, k=1).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(
            queries, corpus, k=1, num_centroids=num_centroids, nprobe=nprobe
        ).collect()
    }
    recall = len(exact1 & approx) / max(1, len(exact1))

    return {
        "n_base": n,
        "n_docs": n_docs,
        "true_dups": n // 10,
        "gemm_pairs": pairs,
        "num_blocks": num_blocks,
        "fan_rows": int(fan_rows),
        "probe_fraction": round(probe_fraction, 4),
        "ivf_recall_top1": round(recall, 3),
        "sec": round(time.time() - t0, 1),
    }


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

    # directed containment (r12): asymmetric prefix filter at t=0.8 —
    # candidates must track true directed pairs, not corpus²
    csh, c_cand = D.ngram_containment_candidates(corpus, n=3, threshold=0.8)
    cont_candidates = c_cand.count()
    # verify from the candidates already built — re-calling
    # ngram_containment_pairs would re-run the whole candidate stage
    cont_pairs = D._verify_containment(c_cand, csh, 0.8).count()

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
        "cont_pairs": cont_pairs,
        "cont_candidates": cont_candidates,
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


def substring_scale_measure(spark, n: int, k: int = 8) -> dict:
    """Substring-tier (Lee et al. span dedup) growth measurement at
    ``n`` base docs on the :func:`near_dup_corpus` fixture (planted
    whole-doc near-copies ⇒ long shared k-token runs, linear in n):

    - ``gram_rows``: the gram-table volume (one row per token
      position) — the quantity shuffled once; must grow ∝ token count;
    - ``dup_positions``: duplicated k-gram starts — tracks planted
      duplicate MASS (linear), the substring analogue of the PPJoin
      candidates == true-pairs claim. A pairwise (doc_a, doc_b, span)
      formulation would grow ∝ Σ C(m_g, 2) over gram frequencies
      instead — quadratic in a boilerplate gram's document frequency;
    - ``span_rows`` / ``stat_rows``: merged-interval outputs, bounded
      by dup_positions and n respectively.
    """
    from .operators import substring as SS

    t0 = time.time()
    corpus = near_dup_corpus(spark, n).localCheckpoint(eager=True)
    n_docs = corpus.count()
    gram_rows = SS.kgram_position_table(corpus, k=k).count()
    dup_positions = SS._dup_positions(corpus, "text", "doc_id", k, 2).count()
    span_rows = SS.duplicate_spans(corpus, k=k).count()
    stats = SS.dup_span_stats(corpus, k=k).localCheckpoint(eager=True)
    stat_rows = stats.count()
    docs_with_dups = stats.filter(F.col("n_spans") > 0).count()
    corpus.unpersist()
    return {
        "n_docs": n_docs,
        "gram_rows": gram_rows,
        "dup_positions": dup_positions,
        "span_rows": span_rows,
        "stat_rows": stat_rows,
        "docs_with_dups": docs_with_dups,
        "sec": round(time.time() - t0, 1),
    }


def semantic_scale_measure(
    spark, n: int, k: int, threshold: float = 0.9
) -> dict:
    """SemDeDup growth measurement at ``n`` base vectors with ``k``
    clusters (the scale knob — grow k ∝ n so mean cluster size stays
    flat):

    - prune quality on the planted near-dups of :func:`embedding_corpus`
      (noised copies at cos ≈ 0.9997 vs chance ≲ 0.5): recall = planted
      copies pruned / planted, and false prunes (non-planted docs
      pruned — must be zero at a 0.9 threshold);
    - cluster economics: mean cluster size n/k, max/mean skew ratio,
      and Σc²/n — the per-document quadratic compare mass, the number
      that must stay FLAT as n and k grow together for the per-task
      O(c²·d) bound to hold at 100 TB.
    """
    t0 = time.time()
    corpus = embedding_corpus(spark, n).localCheckpoint(eager=True)
    n_docs = corpus.count()
    res = S.semantic_dedup(
        corpus, threshold=threshold, k=k, iters=1
    ).localCheckpoint(eager=True)
    pruned = {r.vec_id for r in res.filter(~F.col("kept")).collect()}
    planted = {
        r.vec_id
        for r in corpus.filter(F.col("vec_id") >= 100_000_000).collect()
    }
    sizes = [
        r.c
        for r in res.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    mean_c = sum(sizes) / len(sizes)
    sq_mass = sum(c * c for c in sizes)
    return {
        "n_docs": n_docs,
        "k": k,
        "planted": len(planted),
        "pruned": len(pruned),
        "recall": len(pruned & planted) / max(1, len(planted)),
        "false_prunes": len(pruned - planted),
        "mean_cluster": mean_c,
        "max_over_mean": max(sizes) / mean_c,
        "sq_mass_per_doc": sq_mass / n_docs,
        "sec": round(time.time() - t0, 1),
    }
