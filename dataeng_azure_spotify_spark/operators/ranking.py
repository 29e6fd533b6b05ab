"""Term-weighting retrieval operators: TF-IDF characteristic terms and
BM25 ranked search over the documents corpus (beyond-reference surface,
same tier as the dedup/curation families — a training-data pipeline uses
these for corpus inspection, query-based decontamination sweeps, and
cheap relevance filters before an embedding pass).

Cross-engine determinism (the oracle contract): no ``ln``/``log`` —
transcendental libm results differ in final ulps between the JVM and
DuckDB, which would flip near-tie ranks. Both operators use the
log-free rational idf forms instead:

- TF-IDF: ``idf_t = (N + 1) / (df_t + 1)`` — linear idf, exact as an
  integer-ratio double (IEEE division of exact integers is identical
  everywhere). Log's monotonicity preserves SAME-TERM orderings
  (ranking documents for one term, or one term's weight across docs),
  NOT cross-term orderings within a document: tf·idf vs tf·log(idf)
  can rank two different terms differently when their tfs differ, so
  the linear form up-weights rare terms relative to the log family —
  a deliberate, documented weighting choice, not a drop-in log-TF-IDF.
- BM25: ``idf_t = (N - df_t + 0.5) / (df_t + 0.5)`` — the classic BM25
  idf argument without the log wrapper; the same same-term/cross-term
  caveat applies to multi-term query totals.

Per-term scores are pure double expressions over exact integers (token
counts, doc frequencies, doc lengths) written with the same operation
tree in the Spark and DuckDB twins, so they agree bit-for-bit; per-doc
BM25 totals quantize each term score to 1e-10 fixed point and sum
BIGINTs, so addition is exact and commutative (raw double summation
order differs between engines).

Scale notes (100 TB):

- Both are explode → groupBy(doc, term) → groupBy(term) pipelines: all
  partial-aggregation-friendly single shuffles on bounded keys (vocab ≪
  corpus). The corpus-size scalar rides along as a broadcast 1-row
  cross join — never a driver ``collect``.
- The per-doc top-k rank filter plans as ``WindowGroupLimit`` (per-
  partition group limit below the shuffle), the same shape asserted for
  ``topk_per_group`` in tests/test_plans.py.
- BM25 filters the exploded tokens to the query vocabulary FIRST, so
  the shuffled volume is |matching tokens|, not |corpus tokens|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.functions.text import tokens_col
from dataeng_azure_spotify_spark.operators.dedup import _spread


def _doc_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, term, tf) — whitespace tokens, exact term frequency."""
    return (
        _spread(df)
        .select(F.col(id_col).alias("doc"), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF.

    Score = ``tf * (N + 1) / (df_t + 1)`` (LINEAR rational idf — see
    the module note on how this weighting differs from log TF-IDF).
    Ties break lexicographically on the term, so ranks are total and
    engine-independent. Returns (doc_id, term, tf, score, rank).
    """
    # lazy-checkpoint the (doc, term, tf) table: the score join and the
    # df_t aggregation both consume it, and exchange reuse does not fire
    # across the two subtrees (verified on the final AQE plan), so
    # without the checkpoint the corpus explode + (doc, term) shuffle
    # ran TWICE (guide §3.3 "materialising an intermediate", §2.4).
    # Post-aggregation (doc, term, tf) is far narrower than the corpus
    # text, and materializing it costs about what its shuffle write
    # already paid — recomputing cost a second scan + explode + shuffle.
    tf = _doc_terms(df, text_col, id_col).localCheckpoint(eager=False)
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_t"))
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    score = (F.col("tf") * (F.col("n_docs") + F.lit(1))).cast("double") / (
        F.col("df_t") + F.lit(1)
    ).cast("double")
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(), F.col("term"))
    return (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc").alias(id_col), "term", "tf", "score", "rank"
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query by BM25.

    Per matching (doc, term):

        idf_t   = (N - df_t + 0.5) / (df_t + 0.5)          (rational, module note)
        tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        s_term  = idf_t * tf_norm

    with dl = whitespace token count and avgdl its corpus mean (computed
    as exact-integer sum/count, not a streaming double mean — partial-sum
    order then cannot perturb it). Per-term scores quantize to 1e-10
    fixed point (``floor(s * 1e10)`` as BIGINT — floor of an identical
    double is identical) so the per-doc total is an exact integer sum,
    order-free on any engine. Returns (doc_id, score, rank), rank ties
    broken by doc id.

    df_t counts documents containing the term over the WHOLE corpus
    (standard BM25), not just query matches.
    """
    tf = _doc_terms(df, text_col, id_col)
    # doc length = token count per doc, straight from size(tokens) — the
    # previous sum-of-tf derivation re-ran the full corpus explode and
    # shuffled every distinct (doc, term) pair TWICE more (once for dl,
    # once for sum_dl) just to add up counts the array length already
    # holds (guide §2.3/§2.4). sum(size) ≡ sum(tf) per doc exactly:
    # size counts token instances, tf sums them by term. Null-text docs
    # (size null) aggregate to 0 and zero-token docs now appear with
    # dl=0 — neither can match a query term, so the inner join and
    # sum_dl are unchanged row-for-row.
    dl = (
        df.select(
            F.col(id_col).alias("doc"),
            F.coalesce(F.size(tokens_col(text_col)), F.lit(0))
            .cast("long")
            .alias("__n"),
        )
        .groupBy("doc")
        .agg(F.sum("__n").cast("long").alias("dl"))
    )
    # corpus stats ride as a 1-row broadcast; avgdl divides exact ints
    stats = dl.agg(F.sum("dl").cast("long").alias("sum_dl")).crossJoin(
        df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    # lazy-checkpoint the filtered matches: the isin filter pushes below
    # the (doc, term) aggregation in BOTH consuming subtrees (score join
    # and df_t), but exchange reuse does not fire across them, so the
    # filtered corpus explode ran twice. Matches are query-vocabulary
    # rows only — tiny relative to the corpus at any scale.
    matches = tf.filter(
        F.col("term").isin(list(query_terms))
    ).localCheckpoint(eager=False)
    dft = matches.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_t")
    )
    idf = (
        (F.col("n_docs") - F.col("df_t")).cast("double") + F.lit(0.5)
    ) / (F.col("df_t").cast("double") + F.lit(0.5))
    tf_norm = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("dl").cast("double") / avgdl)
        )
    )
    topk = (
        matches.join(dft, "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "s_fixed", F.floor(idf * tf_norm * F.lit(1e10)).cast("long")
        )
        .groupBy("doc")
        .agg(F.sum("s_fixed").cast("long").alias("s_total"))
        .withColumn("score", F.col("s_total").cast("double") / F.lit(1e10))
        # global top-k via sort+limit, which plans as the distributed
        # TakeOrderedAndProject (per-partition heads, tiny driver merge) —
        # NOT a single-partition Window.orderBy over the whole corpus
        .orderBy(F.col("score").desc(), F.col("doc"))
        .limit(k)
    )
    # rank assignment runs over at most k rows — the one place a global
    # window is harmless
    w = Window.orderBy(F.col("score").desc(), F.col("doc"))
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(F.col("doc").alias(id_col), "score", "rank")
    )
