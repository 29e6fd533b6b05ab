"""Similarity search over embedding columns (``array<float>``) —
beyond-reference surface (BASELINE.json north star).

- :func:`cosine_topk` — exact brute-force top-k: the correctness
  baseline. Dot products are accumulated in DECIMAL (each
  float32·float32 product is exact in double, and decimal addition is
  order-independent), so Spark and DuckDB produce bit-identical cosines
  and identical rankings — no tolerance needed in the oracle.
- :func:`ivf_assign` / :func:`ivf_topk` — IVF-style partitioned ANN:
  vectors are bucketed by nearest centroid; a query probes only the
  ``nprobe`` nearest buckets. At 100 TB the bucket id becomes the
  partition key, so a probe scans ``nprobe/num_centroids`` of the data.
  Centroid selection here is deterministic (every k-th vector) — on a
  real corpus you'd plug k-means centroids in; the bucketing algebra is
  identical.

Physical shape: the small side (queries / centroids) broadcasts and the
dot product is a single JVM higher-order expression
(``zip_with`` + ``aggregate``) evaluated per (query, vector) row of a
broadcast nested-loop join — NO posexplode, NO shuffle for the scoring
pass (the only shuffle is the final per-query top-k window). The
decimal fold uses DECIMAL(30,20): addition widens to (31,20) ≤ 38 so no
precision-loss rounding occurs and the fold is bit-equal to a
``SUM(DECIMAL(38,20))`` group-by, which is what the DuckDB oracle runs.
For very wide vectors a Pandas-UDF BLAS path can replace the
expression; at 64-d it whole-stage-codegens and is compute-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# scale 20 matches the oracle's DECIMAL(38,20) products; precision 30
# leaves integer headroom so per-step additions never trigger Spark's
# precision-loss scale reduction (30,20)+(30,20) -> (31,20) -> exact
DOT_DECIMAL = "decimal(30,20)"


def _dot(a, b) -> Column:
    """Exact decimal-accumulated dot product of two float vectors."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DOT_DECIMAL)
    )
    return F.aggregate(
        prods, F.lit(0).cast(DOT_DECIMAL), lambda acc, x: (acc + x).cast(DOT_DECIMAL)
    ).cast("double")


def _dot_double(a, b) -> Column:
    """Double-precision dot product — ~4× cheaper than the decimal fold.
    For approximate paths (IVF assignment/probing) where last-ulp
    cross-engine reproducibility is not part of the contract."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(vec) -> Column:
    """L2 norm, decimal-accumulated for cross-engine determinism."""
    sq = F.transform(
        vec, lambda x: (x.cast("double") * x.cast("double")).cast(DOT_DECIMAL)
    )
    return F.sqrt(
        F.aggregate(
            sq, F.lit(0).cast(DOT_DECIMAL), lambda acc, x: (acc + x).cast(DOT_DECIMAL)
        ).cast("double")
    )


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(vec_col).alias(f"{prefix}_vec"),
        _norm(F.col(vec_col)).alias(f"{prefix}_norm"),
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exact: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, rank, neighbor_id, cosine). Self-matches excluded.
    Ties break by neighbor_id ascending (total order → deterministic).
    The query side broadcasts; scoring is a broadcast nested-loop join
    with the dot product inlined as one codegen'd expression — the only
    shuffle in the plan is the per-query rank window.

    ``exact=False`` swaps the decimal fold for double arithmetic —
    used by internal approximate stages (IVF probes) where cross-engine
    bit-reproducibility isn't part of the contract.
    """
    dot = _dot if exact else _dot_double
    qf = _with_norm(queries, id_col, vec_col, "q")
    cf = _with_norm(corpus, id_col, vec_col, "c")
    scored = (
        F.broadcast(qf)
        .crossJoin(cf)
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("dot", dot(F.col("q_vec"), F.col("c_vec")))
    )
    return _rank_topk(scored, k)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Round cosine to 12 dp *before* ranking: double→decimal rounding
    differs across engines in the last ulp, so ranking on the rounded
    value (with id tiebreak) keeps the top-k reproducible everywhere."""
    scored = scored.withColumn(
        "cosine", F.round(F.col("dot") / (F.col("q_norm") * F.col("c_norm")), 12)
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            "rank",
            F.col("c_id").alias("neighbor_id"),
            "cosine",
        )
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cosine ≥ threshold — the embedding tier of the dedup family.

    Two phases, candidates then verification — all-pairs decimal scoring
    would be O(n²·d) in interpreted decimal arithmetic:

    1. *Candidates*: blocked GEMM. The corpus matrix broadcasts to every
       partition (same memory contract as a broadcast join) and each
       partition multiplies its row block against it with numpy — one
       vectorized ``block @ corpus.T`` per Arrow batch via
       ``mapInPandas``. A 1e-6 margin under the threshold guarantees no
       true pair is lost to double rounding (error bound ~1e-12).
       At 100 TB the broadcast side becomes per-bucket blocks
       (sign-random-projection banding) — the phase shape is unchanged.
    2. *Verify*: exact decimal ``zip_with`` dot on the surviving pairs
       only; cosine rounds to 12 dp before the threshold, bit-identical
       to the DuckDB oracle.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    rows = df.select(F.col(id_col).cast("long"), vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))
    margin = threshold - 1e-6

    def gen_candidates(batches):
        c_ids, c_mat, c_norms = bc.value
        for pdf in batches:
            block_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            if block.size == 0:
                continue
            b_norms = np.sqrt((block * block).sum(axis=1))
            cos = (block @ c_mat.T) / np.outer(b_norms, c_norms)
            bi, ci = np.nonzero(cos >= margin)
            a_ids, b_ids = block_ids[bi], c_ids[ci]
            keep = a_ids < b_ids
            yield pd.DataFrame(
                {"vec_id_a": a_ids[keep], "vec_id_b": b_ids[keep]}
            )

    candidates = df.select(F.col(id_col).cast("long"), vec_col).mapInPandas(
        gen_candidates, schema="vec_id_a long, vec_id_b long"
    )
    a = _with_norm(df, id_col, vec_col, "q").withColumnRenamed("q_id", "vec_id_a")
    b = _with_norm(df, id_col, vec_col, "c").withColumnRenamed("c_id", "vec_id_b")
    return (
        candidates.join(F.broadcast(a), "vec_id_a")
        .join(F.broadcast(b), "vec_id_b")
        .withColumn("dot", _dot(F.col("q_vec"), F.col("c_vec")))
        .withColumn(
            "cosine", F.round(F.col("dot") / (F.col("q_norm") * F.col("c_norm")), 12)
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_id_a", "vec_id_b", "cosine")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine).

    Returns (vec_id, centroid_id). This is the build step of an IVF
    index; persisted partitioned-by-centroid it gives pruned ANN scans.
    Centroids broadcast; one scoring pass over the corpus, one window.
    """
    cf = _with_norm(corpus, id_col, vec_col, "c")
    kf = _with_norm(
        centroids.withColumnRenamed(centroid_id, "k_id"), "k_id", vec_col, "q"
    )
    scored = (
        cf.crossJoin(F.broadcast(kf))
        .withColumn("dot", _dot_double(F.col("c_vec"), F.col("q_vec")))
        .withColumn("cosine", F.col("dot") / (F.col("c_norm") * F.col("q_norm")))
    )
    w = Window.partitionBy("c_id").orderBy(F.col("cosine").desc(), F.col("q_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("c_id").alias(id_col), F.col("q_id").alias(centroid_id))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    every_kth_centroid: int = 50,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Deterministic centroid set (every k-th corpus vector), corpus bucketed
    by nearest centroid, each query probes its ``nprobe`` nearest buckets
    and brute-forces only those. Recall < 1 by construction; the pytest
    suite measures it against :func:`cosine_topk`.
    """
    centroids = corpus.filter((F.col(id_col) % every_kth_centroid) == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col)
    )
    assignment = ivf_assign(corpus, centroids, id_col, vec_col)
    bucketed = corpus.join(assignment, on=id_col)

    # probe list: nprobe nearest centroids per query (double arithmetic —
    # probing is approximate routing, not part of the exactness contract)
    probes = cosine_topk(
        queries,
        centroids.withColumnRenamed("centroid_id", id_col),
        id_col,
        vec_col,
        k=nprobe,
        exact=False,
    ).select(F.col("query_id"), F.col("neighbor_id").alias("centroid_id"))

    # restrict the corpus to probed buckets per query, then exact scoring
    sub = bucketed.join(F.broadcast(probes), on="centroid_id").select(
        F.col("query_id").alias("probe_query"),
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
    ).withColumn("c_norm", _norm(F.col("c_vec")))
    qf = _with_norm(queries, id_col, vec_col, "q")
    scored = (
        F.broadcast(qf)
        .join(sub, qf["q_id"] == sub["probe_query"])
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("dot", _dot_double(F.col("q_vec"), F.col("c_vec")))
    )
    return _rank_topk(scored, k)
