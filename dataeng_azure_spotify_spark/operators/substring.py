"""Substring-level exact deduplication — the span tier of the dedup
family (Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better", ExactSubstr): find ≥k-token runs that occur MORE THAN
ONCE anywhere in the corpus (license boilerplate, repeated headers,
templated navigation — inside otherwise-unique documents), and report
them as per-document spans and coverage statistics.

This completes the tier ladder: doc-level exact (``dedup.py``),
n-gram/MinHash/SimHash near-dup (``dedup.py``), embedding/semantic
(``similarity.py``), and now sub-document spans. It differs from
:func:`..curation.strip_shared_boilerplate` in two load-bearing ways:
duplication is counted by TOTAL OCCURRENCE (a gram repeated twice
within one document is a duplicated span — Lee et al.'s definition;
boilerplate needs ≥min_docs DISTINCT docs), and the output is span
STRUCTURE (maximal merged intervals, lengths, coverage fraction) —
the signals a curation pipeline thresholds on — not a rewritten text.

Distributed formulation (no suffix array): every ≥k-token duplicated
substring is exactly a maximal run of duplicated k-grams, so

    1. explode each doc into its k-gram table (doc, pos, g) —
       one gram per token position, g = hash60 of the gram text;
    2. mark grams whose corpus-wide occurrence count ≥ 2 — a count
       aggregation + an equi-join back on ``g`` (the sorted-gram-
       table/adjacent-duplicate detection, expressed as the shuffle
       Catalyst/AQE can skew-split; the join's gram-side exchange
       reuses the aggregation's);
    3. per doc, merge duplicated positions into maximal intervals
       [pos, pos+k) with one sort window (spans merge when the gap
       between consecutive duplicated starts is ≤ k).

Cost is linear in corpus token count: the gram table has one row per
token position, shuffled once on the 60-bit gram key; steps 3+ shuffle
only duplicated positions on doc id. Nothing is pairwise — a gram
occurring a million times contributes a million (doc, pos) rows, not
10^12 pairs — which is what makes this tier safe where the naive
"emit (doc_a, doc_b, span) pairs" formulation is quadratic in a
boilerplate gram's document frequency. Candidate-volume linearity at
1×/10×/100× is measured in docs/SCALE_DESIGN.md.

Reference parity note: the reference repo has no substring tier (its
dedup surface is doc-level DISTINCT/dropDuplicates in the DLT silver
notebooks, e.g. local_spotify_dab/src/silver/Silver_Dimensions.py);
this module is part of the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.functions.text import hash60, tokens_col

from .dedup import _spread


def kgram_position_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """(doc, pos, g): one row per token position 0 ≤ pos ≤ n_tokens−k,
    ``g`` = hash60 of the k-gram starting there. Docs with < k tokens
    contribute nothing (no k-gram → can never hold a duplicated span).
    The tokenizer runs ONCE per doc into a materialized column; grams
    are built off the attribute (expressions inside lambda bodies are
    not CSE'd — see dedup.shingles_col)."""
    toks = F.col("__toks")
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    gram_structs = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            hash60(F.array_join(F.slice(toks, i + 1, k), " ")).alias("g"),
        ),
    )
    return (
        _spread(df)
        .select(F.col(id_col).alias("doc"), tokens_col(text_col).alias("__toks"))
        .filter(F.size(toks) >= k)
        .select("doc", F.explode(gram_structs).alias("pg"))
        .select("doc", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    )


def _dup_positions(
    df: DataFrame, text_col: str, id_col: str, k: int, min_count: int
) -> DataFrame:
    """(doc, pos) of every k-gram whose corpus-wide occurrence count
    (by multiplicity — within-doc repeats count) is ≥ ``min_count``.
    One gram-table shuffle: the groupBy partial-aggregates map-side,
    and the join back is on the same key, so the gram side's exchange
    is reused; AQE skew-splits a hot boilerplate gram's join partition
    (a Window count over ``partition by g`` would buffer the whole hot
    partition on one task instead)."""
    grams = kgram_position_table(df, text_col, id_col, k)
    dup_g = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("g")
    )
    return grams.join(dup_g, "g").select("doc", "pos")


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated spans per document: merged intervals of
    duplicated k-gram starts. Two duplicated starts q < q' belong to
    the same span when q' − q ≤ k (their [q, q+k) windows overlap or
    touch), so a span covers tokens [span_start, span_start+span_len).

    Returns (``id_col``, span_start, span_len, n_grams) — n_grams is
    the number of duplicated k-gram positions merged into the span
    (span_len − k + 1 iff every interior position is duplicated; a
    smaller value means the span has non-duplicated gram gaps ≤ k
    bridged by overlap). Deterministic, no RNG.

    Scale: the heavy stage is the gram-table shuffle in
    :func:`_dup_positions`; span merging shuffles only (doc, pos) rows
    of duplicated grams on doc id and windows within each doc."""
    dup = _dup_positions(df, text_col, id_col, k, min_count)
    wdoc = Window.partitionBy("doc").orderBy("pos")
    wrun = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = dup.withColumn(
        "__new",
        F.when(
            F.lag("pos").over(wdoc).isNull()
            | (F.col("pos") - F.lag("pos").over(wdoc) > k),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("__span", F.sum("__new").over(wrun))
    return (
        marked.groupBy("doc", "__span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k) - F.min("pos")).cast("long").alias("span_len"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
        .select(
            F.col("doc").alias(id_col),
            F.col("span_start").cast("long").alias("span_start"),
            "span_len",
            "n_grams",
        )
    )


def dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplicated-span coverage — the thresholding signal
    (Lee et al. drop or trim documents whose duplicated fraction is
    high): (``id_col``, n_tokens, n_dup_positions, covered_tokens,
    n_spans, max_span_len, dup_token_frac) for EVERY input document
    (zeros when nothing is duplicated or the doc has < k tokens).

    ``covered_tokens`` is the exact size of the union of the [q, q+k)
    intervals (= Σ span_len); ``dup_token_frac`` is the IEEE division
    of the two exact counts — identical in every engine."""
    spans = duplicate_spans(df, text_col, id_col, k, min_count)
    stats = spans.groupBy(id_col).agg(
        F.sum("n_grams").cast("long").alias("n_dup_positions"),
        F.sum("span_len").cast("long").alias("covered_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.max("span_len").cast("long").alias("max_span_len"),
    )
    base = df.select(
        F.col(id_col),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
    )
    joined = base.join(stats, id_col, "left")
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)  # noqa: E731
    return joined.select(
        id_col,
        "n_tokens",
        zero("n_dup_positions"),
        zero("covered_tokens"),
        zero("n_spans"),
        zero("max_span_len"),
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double")
        )
        .alias("dup_token_frac"),
    )
