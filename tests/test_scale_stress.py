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
def test_candidate_growth_linear_not_quadratic_10x_100x(spark):
    """The dedup tier's central 100 TB claim, measured: candidate-pair
    volume tracks TRUE near-dup mass (linear), not n², as the corpus
    grows 10x → 100x fixture size. docs/scale_validation.py is the
    table-producing twin (full numbers in docs/BENCH_NOTES.md)."""
    from dataeng_azure_spotify_spark.validation import scale_measure

    lo = scale_measure(spark, 2_000)
    hi = scale_measure(spark, 20_000)
    growth = hi["true_pairs"] / lo["true_pairs"]  # ~10x by construction
    assert 8 <= growth <= 12

    # PPJoin + MinHash: candidates within 2% of true pairs at BOTH
    # scales (the 64-bit hash spaces admit ~no chance candidates), so
    # candidate growth == true-pair growth — a quadratic stage would
    # show ~100x here
    for k in ("jac_candidates", "mh_candidates"):
        assert lo[k] <= lo["true_pairs"] * 1.02, (k, lo)
        assert hi[k] <= hi["true_pairs"] * 1.02, (k, hi)

    # directed containment (r12): the asymmetric prefix filter must
    # likewise keep candidates at true directed-pair mass (linear), not
    # probe-prefix × corpus
    assert lo["cont_candidates"] <= lo["cont_pairs"] * 1.02, lo
    assert hi["cont_candidates"] <= hi["cont_pairs"] * 1.02, hi
    assert hi["cont_pairs"] / lo["cont_pairs"] <= growth * 1.2

    # SimHash: the POST-FILTER pair set grows linearly ...
    assert hi["sim_pairs"] / lo["sim_pairs"] <= growth * 1.2
    # ... while the raw in-join comparison volume is quadratic over the
    # fixed band space BY DESIGN (it never shuffles) and must match the
    # closed form within 25% — hash-uniform buckets, no skew collapse
    assert 0.75 <= hi["sim_raw"] / hi["sim_raw_model"] <= 1.25, hi


@pytest.mark.slow
def test_cc_rounds_follow_diameter_not_corpus_size(spark):
    """Connected-components rounds are pinned by component diameter
    (fixed mutation-chain length in the corpus), not by n: growing the
    corpus 10x must not grow the round count, and rounds stay far under
    the O(log² n) star-contraction budget."""
    import math

    from dataeng_azure_spotify_spark.validation import scale_measure

    lo = scale_measure(spark, 2_000)
    hi = scale_measure(spark, 20_000)
    assert hi["cc_rounds"] <= lo["cc_rounds"] + 1, (lo, hi)
    for m in (lo, hi):
        budget = math.ceil(math.log2(m["n_docs"])) ** 2
        assert m["cc_rounds"] <= budget, m


@pytest.mark.slow
def test_mg_candidate_set_vocabulary_bounded_at_scale(spark):
    """Misra-Gries pass-2 candidate tokens stay vocabulary-bounded while
    token volume grows 10x, with the certified-exactness condition
    (min_count > D) holding at both scales."""
    from dataeng_azure_spotify_spark.validation import scale_measure

    lo = scale_measure(spark, 2_000)
    hi = scale_measure(spark, 20_000)
    assert hi["hh_total_tokens"] >= 8 * lo["hh_total_tokens"]
    assert lo["hh_certified"] and hi["hh_certified"]
    assert hi["hh_candidates"] <= 32 and lo["hh_candidates"] <= 32


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


@pytest.mark.slow
def test_embedding_tier_growth_linear_and_probe_fraction_stable(spark):
    """Embedding-tier twin of the dedup growth validation: blocked-GEMM
    near-dup pairs track true dup mass (linear), the shuffle fan-out is
    the closed-form n x B replication (never an n^2 pair table),
    the IVF probe scans ~nprobe/num_centroids of the corpus REGARDLESS
    of n, and probe recall on planted near-dups stays perfect."""
    from dataeng_azure_spotify_spark.validation import embedding_scale_measure

    lo = embedding_scale_measure(spark, 2_000)
    hi = embedding_scale_measure(spark, 20_000)
    # exact linearity: every planted dup found, nothing else admitted
    assert lo["gemm_pairs"] == lo["true_dups"]
    assert hi["gemm_pairs"] == hi["true_dups"]
    assert hi["fan_rows"] == 10 * lo["fan_rows"]  # linear replication
    # probe economics independent of corpus size (~ 8/64 = 0.125)
    for m in (lo, hi):
        assert 0.04 <= m["probe_fraction"] <= 0.25, m
    assert abs(hi["probe_fraction"] - lo["probe_fraction"]) < 0.08
    assert lo["ivf_recall_top1"] >= 0.9 and hi["ivf_recall_top1"] >= 0.9


@pytest.mark.slow
def test_salting_bounds_hot_key_reduce_group_at_scale(spark):
    """Skew-mitigation validation at row volume: with 90% of 200k rows
    on ONE key, the unsalted aggregate funnels the hot key into a
    single reduce group; salting must split it across ~salt_buckets
    near-equal partials (the property that keeps one straggler reducer
    from serializing a 100 TB shuffle), while the merged result stays
    exactly equal to the unsalted aggregate."""
    from dataeng_azure_spotify_spark.operators.skew import (
        SALT_COL,
        _salt_of,
        salted_aggregate,
    )

    n, buckets = 200_000, 16
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise((F.col("id") % 1000).cast("string"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    n_hot = df.filter(F.col("k") == "hot").count()
    assert n_hot >= int(0.85 * n)

    # stage-1 reduce-group sizes under the salt
    stage1 = (
        df.withColumn(SALT_COL, _salt_of(["v"], buckets))
        .groupBy("k", SALT_COL)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hot_parts = [r["n"] for r in stage1.filter(F.col("k") == "hot").collect()]
    assert len(hot_parts) == buckets
    assert max(hot_parts) <= 1.5 * n_hot / buckets  # no straggler bucket

    got = {
        (r["k"], r["total"], r["n"])
        for r in salted_aggregate(
            df,
            keys=["k"],
            aggs=[
                F.sum("ptotal").alias("total"),
                F.sum("pn").cast("long").alias("n"),
            ],
            partial_aggs=[
                F.sum("v").alias("ptotal"),
                F.count(F.lit(1)).alias("pn"),
            ],
            salt_buckets=buckets,
        ).collect()
    }
    want = {
        (r["k"], r["total"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want


@pytest.mark.slow
def test_labels_index_probe_prune_and_order_tradeoff(spark):
    """NearDupLabels append-probe economics, measured on realistic
    fixture text at 1x/10x corpus (500 → 5000 docs), fixed 20-doc
    batch: (a) the PPJoin length+positional filters cut hash-order
    candidates at least 2x; (b) the append-stable hash order costs
    NOTHING vs a rarest-first ordering of the same probe at the larger
    scale (collision mass growth is intrinsic to the data, not the
    order). Numbers in the module docstring / docs/BENCH_NOTES.md."""
    from pyspark.sql import Window

    from dataeng_azure_spotify_spark.operators.cluster_index import (
        _explode_prefix,
        _ppjoin_prune,
    )
    from dataeng_azure_spotify_spark.operators.dedup import _doc_shingle_hashes

    def sorted_sh(df):
        return (
            _doc_shingle_hashes(df, "text", "doc_id", 3)
            .withColumn("doc", F.col("doc").cast("long"))
            .withColumn("hshingles", F.array_sort("hshingles"))
        )

    batch = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(20)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    bpre = _explode_prefix(sorted_sh(batch), 0.5).localCheckpoint(eager=True)

    counts = {}
    for sf in ("sf0.01", "sf0.1"):
        corpus = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        cpre = _explode_prefix(sorted_sh(corpus), 0.5)
        raw = (
            bpre.alias("np")
            .join(cpre.alias("op"), F.col("np.s") == F.col("op.s"))
            .select("np.doc", "op.doc").distinct().count()
        )
        pruned = (
            bpre.alias("np")
            .join(
                cpre.alias("op"),
                (F.col("np.s") == F.col("op.s"))
                & _ppjoin_prune(
                    F.col("np.n_sh"), F.col("np.pos"),
                    F.col("op.n_sh"), F.col("op.pos"), 0.5,
                ),
            )
            .select("np.doc", "op.doc").distinct().count()
        )
        counts[sf] = (raw, pruned)
        assert pruned * 2 <= raw, (sf, raw, pruned)  # (a)

    # (b): rarest-first twin of the LARGE probe (corpus+batch frequency
    # ranking, the batch path's ordering) must not beat the pruned
    # stable order — otherwise the index is leaving candidates on the
    # table that re-ranking would save
    corpus = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    alld = corpus.select("doc_id", "text").union(batch.select("doc_id", "text"))
    sh = _doc_shingle_hashes(alld, "text", "doc_id", 3)
    ex = sh.select("doc", "n_sh", F.explode("hshingles").alias("s"))
    freq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("f"))
    ranked = ex.join(freq, "s").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc").orderBy(F.col("f").asc(), F.col("s").asc())
        ),
    )
    plen = F.col("n_sh") - F.ceil(F.lit(0.5) * F.col("n_sh") - F.lit(1e-9)) + 1
    idx = ranked.filter(F.col("rk") <= plen).select("doc", "s")
    a, b = idx.alias("a"), idx.alias("b")
    rarest = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("da"), F.col("b.doc").alias("db"))
        .distinct()
        # batch-x-corpus ONLY (xor): the stable-order probe it is
        # compared against never counts batch-x-batch pairs
        .filter((F.col("da") >= 10_000_000) != (F.col("db") >= 10_000_000))
        .count()
    )
    _, pruned_big = counts["sf0.1"]
    assert pruned_big <= rarest * 1.2, (pruned_big, rarest)


@pytest.mark.slow
def test_semantic_dedup_growth_cluster_economics(spark):
    """SemDeDup's 100 TB claim: with k grown ∝ n, the per-document
    quadratic compare mass Σc²/n (what one cluster task costs) stays
    FLAT as the corpus grows 10×, cluster skew stays bounded, recall
    on planted ≈0.9997-cosine copies stays high, and a 0.9 threshold
    admits zero false prunes (chance cosines ≲ 0.5)."""
    from dataeng_azure_spotify_spark.validation import semantic_scale_measure

    lo = semantic_scale_measure(spark, 2_000, k=16)
    hi = semantic_scale_measure(spark, 20_000, k=160)
    for m in (lo, hi):
        assert m["false_prunes"] == 0, m
        assert m["recall"] >= 0.9, m
        assert m["max_over_mean"] <= 20.0, m
    # mean cluster size flat by construction (n/k fixed); the bound that
    # matters is the quadratic mass per doc — one 10× step may shift it
    # by skew, but it must not grow ~10× (which would mean k isn't a
    # real knob and per-task cost scales with the corpus)
    assert hi["sq_mass_per_doc"] <= 3.0 * lo["sq_mass_per_doc"], (lo, hi)


@pytest.mark.slow
def test_substring_dup_growth_linear_10x(spark):
    """Substring-tier 100 TB claim, measured: gram-table volume grows
    with token count and duplicated positions track planted duplicate
    MASS (both ~10x at 10x docs) — never pairwise in a gram's document
    frequency. Committed 1x/10x/100x table in docs/BENCH_NOTES.md."""
    from dataeng_azure_spotify_spark.validation import substring_scale_measure

    lo = substring_scale_measure(spark, 2_000)
    hi = substring_scale_measure(spark, 20_000)
    assert 9 <= hi["gram_rows"] / lo["gram_rows"] <= 11
    assert 8 <= hi["dup_positions"] / lo["dup_positions"] <= 12
    assert 8 <= hi["span_rows"] / lo["span_rows"] <= 12
    # every doc gets a stats row; planted near-dups are the dup'd docs
    assert hi["stat_rows"] == hi["n_docs"]
    assert hi["docs_with_dups"] >= 2 * (20_000 // 10)
