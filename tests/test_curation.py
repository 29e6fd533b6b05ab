"""Curation-operator semantics (oracle parity is in parity.py; these
tests pin the properties the oracle can't see — budget bounds, recall,
determinism, plan shape)."""

from __future__ import annotations

from pyspark.sql import Row

from dataeng_azure_spotify_spark.operators.curation import (
    contamination_check,
    length_quantile_filter,
    pack_sequences,
    repetition_stats,
    source_mix,
    stratified_sample,
)


def _docs(spark, texts, langs=None, sources=None):
    rows = [
        Row(
            doc_id=i,
            text=t,
            lang=(langs[i] if langs else "en"),
            source=(sources[i] if sources else "s0"),
        )
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows)


def test_pack_sequences_budget_and_coverage(spark):
    texts = [("w " * (10 * (i % 7 + 1))).strip() for i in range(40)]
    df = _docs(spark, texts)
    bins = pack_sequences(df, budget_tokens=50, shards=4).collect()
    # every document lands in exactly one bin
    assert sum(b.n_docs for b in bins) == 40
    # open-bin packing: a bin STARTS below the budget boundary, so it can
    # overflow only by its last document (< budget + max single doc)
    max_doc = 70
    for b in bins:
        assert b.total_tokens < 50 + max_doc
    # bins fill greedily: within a shard, ids are contiguous across bins
    by_shard: dict[int, list] = {}
    for b in bins:
        by_shard.setdefault(b.shard, []).append(b)
    for shard_bins in by_shard.values():
        shard_bins.sort(key=lambda b: b.bin_id)
        for prev, nxt in zip(shard_bins, shard_bins[1:]):
            assert prev.max_doc_id < nxt.min_doc_id


def test_pack_sequences_no_global_window(spark):
    """The cumulative sum must be per-shard — a global Window.orderBy
    would plan Exchange SinglePartition (the 100 TB killer)."""
    df = _docs(spark, ["a b c"] * 8)
    plan = pack_sequences(df)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_contamination_flags_only_overlapping_train_docs(spark):
    shared = "alpha beta gamma delta epsilon"
    texts = [
        shared + " zeta",            # doc 0 → test slice (0 % 97 == 0)
        "intro " + shared,           # doc 1 → shares the 5-gram
        "totally different words here now",  # doc 2 → clean
    ]
    out = contamination_check(_docs(spark, texts), n=5, test_mod=97).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].n_shared_grams == 1 and out[0].n_test_docs == 1


def test_repetition_stats_hand_computed(spark):
    # "a b c a b c a b c": 7 grams total, 3 distinct, top gram 'a b c' ×3
    out = repetition_stats(
        _docs(spark, ["a b c a b c a b c"]), n=3
    ).collect()[0]
    assert out.total_grams == 7
    assert out.distinct_grams == 3
    assert out.top_gram_count == 3
    assert abs(out.dup_gram_ratio - (1 - 3 / 7)) < 1e-12
    assert abs(out.top_gram_ratio - 3 / 7) < 1e-12


def test_stratified_sample_rates_and_determinism(spark):
    df = _docs(
        spark,
        ["x"] * 200,
        langs=["en" if i % 2 else "de" for i in range(200)],
    )
    none_kept = stratified_sample(df, {"en": 0, "de": 0})
    assert none_kept.count() == 0
    all_kept = stratified_sample(df, {})
    assert all_kept.count() == 200
    half = stratified_sample(df, {"en": 50})
    # de untouched, en roughly halved (hash-uniform, not exact)
    assert half.filter("lang = 'de'").count() == 100
    n_en = half.filter("lang = 'en'").count()
    assert 30 <= n_en <= 70
    # deterministic: same inputs → identical kept set
    a = {r.doc_id for r in half.collect()}
    b = {r.doc_id for r in stratified_sample(df, {"en": 50}).collect()}
    assert a == b


def test_length_quantile_filter_trims_tails_per_stratum(spark):
    texts = [("w " * (i + 1)).strip() for i in range(100)]
    out = length_quantile_filter(_docs(spark, texts), lo=0.1, hi=0.9)
    kept = sorted(r.n_tokens for r in out.collect())
    # percent_rank over 100 rows: rank (i)/(99); keep 0.1..0.9 → ~81 rows
    assert 75 <= len(kept) <= 85
    assert kept[0] > 1 and kept[-1] < 100


def test_source_mix_shares_sum_to_one_million(spark):
    df = _docs(
        spark,
        ["t " * 5] * 10,
        langs=["en"] * 10,
        sources=["a"] * 7 + ["b"] * 3,
    )
    rows = source_mix(df).collect()
    assert sum(r.n_docs for r in rows) == 10
    # integer-floor shares: sum within rounding slack of 1e6
    total_ppm = sum(r.doc_share_ppm for r in rows)
    assert 1_000_000 - len(rows) < total_ppm <= 1_000_000


def test_chunk_documents_overlap_and_coverage(spark):
    from dataeng_azure_spotify_spark.operators.curation import chunk_documents

    toks = [f"t{i}" for i in range(100)]
    df = _docs(spark, [" ".join(toks), ""])
    rows = sorted(
        chunk_documents(df, chunk_size=40, overlap=10).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    # empty doc yields nothing; 100 tokens, stride 30 → starts 1,31,61
    # (a start at 91 would repeat tokens chunk 61-100 already carries)
    assert [r.doc_id for r in rows] == [0, 0, 0]
    assert [r.n_chunk_tokens for r in rows] == [40, 40, 40]
    c0, c1 = rows[0].chunk_text.split(), rows[1].chunk_text.split()
    assert c0[30:] == c1[:10]  # consecutive chunks share `overlap` tokens
    # every token appears in some chunk
    seen = {t for r in rows for t in r.chunk_text.split()}
    assert seen == set(toks)

    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_size=10, overlap=10)


def test_cap_per_source_caps_deterministically(spark):
    from dataeng_azure_spotify_spark.operators.curation import cap_per_source

    rows = [(i, f"src{i % 2}") for i in range(10)]  # 5 docs per source
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = cap_per_source(df, max_per_key=3)
    got = {(r.source, r.doc_id) for r in out.collect()}
    # lowest 3 doc_ids survive per source
    assert got == {("src0", 0), ("src0", 2), ("src0", 4),
                   ("src1", 1), ("src1", 3), ("src1", 5)}
    # cap above group size keeps everything
    assert cap_per_source(df, max_per_key=99).count() == 10


def test_strip_shared_boilerplate_hand_computed(spark):
    from dataeng_azure_spotify_spark.operators.curation import (
        strip_shared_boilerplate,
    )

    rows = [
        # docs 1 and 2 share the trigram "legal footer text"; doc 3 is clean
        Row(doc_id=1, text="alpha beta legal footer text gamma"),
        Row(doc_id=2, text="delta legal footer text"),
        Row(doc_id=3, text="totally original content here"),
        Row(doc_id=4, text="hi"),  # < n tokens: untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_tokens, r.n_boilerplate_tokens, r.cleaned_text)
        for r in strip_shared_boilerplate(df, n=3, min_docs=2).collect()
    }
    assert out[1] == (6, 3, "alpha beta gamma")
    assert out[2] == (4, 3, "delta")
    assert out[3] == (4, 0, "totally original content here")
    assert out[4] == (1, 0, "hi")


def test_strip_shared_boilerplate_fully_covered_doc_empties(spark):
    from dataeng_azure_spotify_spark.operators.curation import (
        strip_shared_boilerplate,
    )

    rows = [
        Row(doc_id=1, text="the same exact text"),
        Row(doc_id=2, text="the same exact text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_boilerplate_tokens, r.cleaned_text)
        for r in strip_shared_boilerplate(df, n=4, min_docs=2).collect()
    }
    assert out == {1: (4, ""), 2: (4, "")}


def test_ngram_lm_score_hand_computed(spark):
    from dataeng_azure_spotify_spark.operators.curation import ngram_lm_score

    rows = [
        Row(doc_id=1, text="a b c"),
        Row(doc_id=2, text="a b x"),
        Row(doc_id=3, text="z"),  # < 2 tokens: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_bigrams, r.lm_score) for r in ngram_lm_score(df).collect()}
    # corpus bigrams: "a b" x2, "b c" x1, "b x" x1; contexts: a->2, b->2
    # doc1: P(b|a)=2/2=1, P(c|b)=1/2 -> avg 0.75; doc2 same shape
    assert set(out) == {1, 2}
    assert out[1][0] == 2 and abs(out[1][1] - 0.75) < 1e-9
    assert out[2][0] == 2 and abs(out[2][1] - 0.75) < 1e-9

    # a repetitive doc of one dominant bigram scores near 1
    rep = spark.createDataFrame(
        [Row(doc_id=1, text="spam spam spam spam"), Row(doc_id=2, text="spam spam")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lm_score for r in ngram_lm_score(rep).collect()}
    assert got[1] == 1.0 and got[2] == 1.0


def test_sample_weighted_n_deterministic_and_weight_biased(spark):
    from dataeng_azure_spotify_spark.operators.curation import sample_weighted_n
    from pyspark.sql import Row

    # 200 light rows (w=1) + 20 heavy rows (w=100): heavies should be
    # strongly over-represented in a 40-row draw
    df = spark.createDataFrame(
        [Row(doc_id=i, w=1) for i in range(200)]
        + [Row(doc_id=1000 + i, w=100) for i in range(20)]
    )
    a = {r["doc_id"] for r in sample_weighted_n(df, 40, "w").collect()}
    b = {r["doc_id"] for r in sample_weighted_n(df, 40, "w").collect()}
    assert a == b and len(a) == 40  # deterministic, exact n
    n_heavy = sum(1 for d in a if d >= 1000)
    # expected ≈ all 20 heavies present; even a weak draw keeps most
    assert n_heavy >= 15


def test_sample_weighted_n_excludes_nonpositive_weights(spark):
    from pyspark.sql import Row

    from dataeng_azure_spotify_spark.operators.curation import sample_weighted_n

    df = spark.createDataFrame(
        [Row(doc_id=1, w=0), Row(doc_id=2, w=-3), Row(doc_id=3, w=None),
         Row(doc_id=4, w=7)],
        "doc_id long, w int",
    )
    got = [r["doc_id"] for r in sample_weighted_n(df, 10, "w").collect()]
    assert got == [4]


def test_sample_weighted_n_plans_as_top_k(spark):
    from pyspark.sql import Row

    from dataeng_azure_spotify_spark.operators.curation import sample_weighted_n

    df = spark.createDataFrame([Row(doc_id=i, w=i + 1) for i in range(50)])
    plan = (
        sample_weighted_n(df, 5, "w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_compression_ratio_flags_repetitive_text(spark):
    """Repetitive/templated text must compress far below natural-ish
    prose; NULL/empty text yields NULL ratio; counts are exact byte
    lengths."""
    import zlib

    from dataeng_azure_spotify_spark.functions.text import compression_ratio

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs away home"),
        (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert got[2].compression_ratio < got[1].compression_ratio
    assert got[3].compression_ratio is None and got[3].n_bytes is None
    assert got[4].compression_ratio is None and got[4].n_bytes == 0
    # exact against local zlib at the same level
    for doc_id, text in rows[:2]:
        b = text.encode("utf-8")
        assert got[doc_id].n_bytes == len(b)
        assert got[doc_id].n_compressed == len(zlib.compress(b, 6))
