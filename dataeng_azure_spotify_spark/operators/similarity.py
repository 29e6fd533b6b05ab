"""Similarity search over embedding columns (``array<float>``) —
beyond-reference surface (BASELINE.json north star).

- :func:`cosine_topk` — exact brute-force top-k: the correctness
  baseline. Dot products are accumulated in DECIMAL(38,20) (each
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

Everything is exploded-join algebra over (id, pos, val) triples — pure
JVM expressions, no Python UDF in the hot path. For very wide vectors a
Pandas-UDF BLAS path can replace the explode; at 64-d the explode plan
whole-stage-codegens and is shuffle-bound, not CPU-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT_DECIMAL = "decimal(38,20)"


def _flatten(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    """(id, pos, val) triples from an array column; val cast to double."""
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.posexplode(vec_col).alias("pos", f"{prefix}_val"),
    ).withColumn(f"{prefix}_val", F.col(f"{prefix}_val").cast("double"))


def _norms(df: DataFrame, id_col: str, vec_col: str, out: str) -> DataFrame:
    """Per-vector L2 norm, decimal-accumulated for determinism."""
    flat = _flatten(df, id_col, vec_col, "n")
    return flat.groupBy("n_id").agg(
        F.sqrt(
            F.sum((F.col("n_val") * F.col("n_val")).cast(DOT_DECIMAL)).cast("double")
        ).alias(out)
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, rank, neighbor_id, cosine). Self-matches excluded.
    Ties break by neighbor_id ascending (total order → deterministic).
    The query side is expected small (it broadcasts); the corpus side
    streams through one shuffle on the vector position join.
    """
    qf = _flatten(queries, id_col, vec_col, "q")
    cf = _flatten(corpus, id_col, vec_col, "c")
    dots = (
        F.broadcast(qf)
        .join(cf, on="pos")
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id")
        .agg(
            F.sum((F.col("q_val") * F.col("c_val")).cast(DOT_DECIMAL))
            .cast("double")
            .alias("dot")
        )
    )
    qn = _norms(queries, id_col, vec_col, "q_norm").withColumnRenamed("n_id", "q_id")
    cn = _norms(corpus, id_col, vec_col, "c_norm").withColumnRenamed("n_id", "c_id")
    scored = dots.join(F.broadcast(qn), "q_id").join(cn, "c_id")
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
    """
    cf = _flatten(corpus, id_col, vec_col, "c")
    kf = _flatten(centroids.withColumnRenamed(centroid_id, "k_id"), "k_id", vec_col, "k")
    dots = (
        cf.join(F.broadcast(kf), on="pos")
        .groupBy("c_id", "k_id")
        .agg(
            F.sum((F.col("c_val") * F.col("k_val")).cast(DOT_DECIMAL))
            .cast("double")
            .alias("dot")
        )
    )
    cn = _norms(corpus, id_col, vec_col, "c_norm").withColumnRenamed("n_id", "c_id")
    kn = _norms(
        centroids.withColumnRenamed(centroid_id, "k_id"), "k_id", vec_col, "k_norm"
    ).withColumnRenamed("n_id", "k_id")
    scored = (
        dots.join(cn, "c_id")
        .join(F.broadcast(kn), "k_id")
        .withColumn("cosine", F.col("dot") / (F.col("c_norm") * F.col("k_norm")))
    )
    w = Window.partitionBy("c_id").orderBy(F.col("cosine").desc(), F.col("k_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("c_id").alias(id_col), F.col("k_id").alias(centroid_id))
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

    # probe list: nprobe nearest centroids per query
    probes = cosine_topk(
        queries,
        centroids.withColumnRenamed("centroid_id", id_col),
        id_col,
        vec_col,
        k=nprobe,
    ).select(F.col("query_id"), F.col("neighbor_id").alias("centroid_id"))

    # restrict the corpus to probed buckets per query, then exact top-k
    sub = bucketed.join(probes, on="centroid_id").select(
        F.col("query_id").alias("probe_query"), F.col(id_col), F.col(vec_col)
    )
    qf = _flatten(queries, id_col, vec_col, "q")
    cf = sub.select(
        "probe_query",
        F.col(id_col).alias("c_id"),
        F.posexplode(vec_col).alias("pos", "c_val"),
    ).withColumn("c_val", F.col("c_val").cast("double"))
    dots = (
        F.broadcast(qf)
        .join(cf, (qf["pos"] == cf["pos"]) & (qf["q_id"] == cf["probe_query"]))
        .drop(cf["pos"])
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id")
        .agg(
            F.sum((F.col("q_val") * F.col("c_val")).cast(DOT_DECIMAL))
            .cast("double")
            .alias("dot")
        )
    )
    qn = _norms(queries, id_col, vec_col, "q_norm").withColumnRenamed("n_id", "q_id")
    cn = _norms(corpus, id_col, vec_col, "c_norm").withColumnRenamed("n_id", "c_id")
    scored = dots.join(F.broadcast(qn), "q_id").join(cn, "c_id")
    return _rank_topk(scored, k)
