"""Product quantization (PQ) — the ANN memory-compression scale path
(Jégou, Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
Search"; the FAISS IVF-PQ recipe). Beyond-reference surface, completing
the embedding-compression family (int8 codes, JL projection, PCA):
where :func:`quantize_embeddings` keeps d bytes/vector, PQ keeps
``m`` CODES — 4-16 bytes regardless of d — so a 100 TB float corpus
becomes a few TB of codes scanned entirely JVM/Arrow-side, while
queries score against it WITHOUT decompression via ADC (asymmetric
distance computation: per-query lookup tables over the codebook).

Spark-first decomposition:

- **Train** (:func:`pq_train`): per-subspace L2 k-means on a BOUNDED
  deterministic sample — the ``k`` smallest ``xxhash64(id)`` rows (the
  ``kmeans_centroids`` init discipline; FAISS likewise trains PQ on a
  sample). The sample is collected once (``train_n`` × d floats, a
  driver-bounded quantity independent of corpus size — the BPE
  merge-table / DsirModel precedent), and the m Lloyd loops run in
  numpy with hash-order-deterministic init and first-index tie-breaks,
  so training is bit-reproducible.
- **Encode** (:func:`pq_encode`): one Arrow-batched ``mapInPandas``
  pass over the corpus — per subspace, argmin L2 to the broadcast
  codebook (m × 2^nbits × d/m floats, tiny). Row-parallel,
  corpus-linear, no shuffle.
- **Query** (:func:`pq_topk`): per query, an m × 2^nbits
  inner-product lookup table; each corpus code's approximate score is
  m TABLE GATHERS (never a d-dim float op). One ``mapInPandas`` scan
  emits per-partition partial top-k, then a global window takes the
  final k — the blocked-GEMM partial-bests discipline, never an n×q
  score table.

Cosine semantics: with ``normalize=True`` (default) vectors are
unit-normalized before train/encode and queries before LUT
construction, so the ADC score approximates cosine — consistent with
the rest of the ANN family. Zero-norm vectors stay zero (score 0,
never NaN — the ``semantic_dedup`` contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: codebook row layout (sub-quantizer index, code id, sub-centroid)
PQ_CODEBOOK_SCHEMA = "sub int, code int, centroid array<float>"


def _as_matrix(vecs, d: int | None = None):
    import numpy as np

    m = np.array(list(vecs), dtype=np.float64)
    if m.ndim == 1:  # empty
        m = np.zeros((0, d or 1))
    return m


def _unitize(mat):
    """Row-normalize; zero-norm rows stay zero (no NaN)."""
    import numpy as np

    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    return np.where(norms > 0.0, mat / np.where(norms > 0, norms, 1.0), 0.0)


def _lloyd_codebook(mat, m: int, nbits: int, iters: int, name: str):
    """The shared PQ trainer kernel: per-subspace L2 Lloyd iterations
    over a (pre-sampled, pre-normalized/residualized) matrix. Returns
    codebook rows [(sub, code, centroid), ...]. Deterministic: init =
    first ``k`` sample subvectors, argmin ties break on the first
    index, empty clusters keep their previous centroid."""
    import numpy as np

    k = 1 << int(nbits)
    d = mat.shape[1]
    if d % m != 0:
        raise ValueError(
            f"{name}: vector dim {d} not divisible by m={m} sub-quantizers"
        )
    ds = d // m
    rows = []
    for sub in range(m):
        x = mat[:, sub * ds : (sub + 1) * ds]
        cent = x[: min(k, len(x))].copy()
        if len(cent) < k:  # tiny corpus: pad by repeating (legal, degenerate)
            cent = np.vstack([cent] * ((k // max(len(cent), 1)) + 1))[:k]
        for _ in range(int(iters)):
            # GEMM distance form (the _encode_mat identity): argmin of
            # ||x-c||² needs only -2x·c + ||c||² — O(n·k·ds) BLAS
            # instead of materializing the (n, k, ds) difference tensor
            # (r13: the tensor form was ~6× slower at k=256 and
            # allocation-bound; argmin ties still break on the first
            # index)
            d2 = -2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)
            assign = d2.argmin(axis=1)  # first-index tie-break
            # vectorized per-cluster means: one indexed scatter-add +
            # bincount instead of k boolean-mask selections per
            # iteration (the mask loop was ~k·iters·m Python-level
            # array scans — the dominant trainer cost at nbits=8)
            sums = np.zeros((k, ds))
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=k).astype(np.float64)
            nonempty = counts > 0
            # empty clusters keep their previous centroid
            cent[nonempty] = (
                sums[nonempty] / counts[nonempty, None]
            )
        rows.extend(
            (sub, ci, cent[ci].astype(np.float32).tolist()) for ci in range(k)
        )
    return rows


def _encode_mat(mat, cb):
    """Argmin-L2 code assignment of a (n, d) matrix against a
    (m, k, d/m) codebook tensor — the shared encode kernel (raw PQ and
    residual IVF-PQ). Returns (n, m) int32 codes."""
    import numpy as np

    mq, _k, ds = cb.shape
    codes = np.zeros((len(mat), mq), dtype=np.int32)
    for sub in range(mq):
        x = mat[:, sub * ds : (sub + 1) * ds]
        # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2 — argmin needs only the
        # last two terms; vectorized over the batch
        d2 = -2.0 * (x @ cb[sub].T) + (cb[sub] ** 2).sum(axis=1)
        codes[:, sub] = d2.argmin(axis=1)
    return codes


def _bounded_sample(
    corpus: DataFrame, train_n: int, cols: "list", name: str
):
    """The deterministic bounded training sample every driver-side
    trainer uses: the ``train_n`` hash-smallest ids, re-sorted by id —
    collected once, corpus-size-independent."""
    sample = (
        corpus.select(F.col(cols[0]).cast("long").alias("vid"), *cols[1:])
        .withColumn("__h", F.xxhash64("vid"))
        .orderBy("__h", "vid")
        .limit(int(train_n))
        .drop("__h")
        .orderBy("vid")
        .collect()  # BOUNDED: train_n × d floats, corpus-size-independent
    )
    if not sample:
        raise ValueError(f"{name}: empty corpus")
    return sample


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    nbits: int = 4,
    iters: int = 8,
    train_n: int = 16384,
    normalize: bool = True,
) -> DataFrame:
    """Train the PQ codebook: ``m`` sub-quantizers × ``2^nbits`` codes
    each, L2 Lloyd iterations on a deterministic bounded sample.
    Returns the codebook DataFrame (``sub``, ``code``, ``centroid``)
    with ``m × 2^nbits`` rows. Requires d divisible by ``m``.

    Determinism: the sample is the ``train_n`` hash-smallest ids (ties
    impossible on distinct ids), rows sorted by id before Lloyd, init =
    first ``k`` sample subvectors, argmin ties break on the first
    index, empty clusters keep their previous centroid — two trains on
    the same corpus are bit-identical (pinned in tests)."""
    spark = corpus.sparkSession
    sample = _bounded_sample(
        corpus, train_n, [id_col, F.col(vec_col).alias("v")], "pq_train"
    )
    mat = _as_matrix([r["v"] for r in sample])
    if normalize:
        mat = _unitize(mat)
    rows = _lloyd_codebook(mat, int(m), int(nbits), int(iters), "pq_train")
    return spark.createDataFrame(rows, PQ_CODEBOOK_SCHEMA)


def _codebook_tensor(codebook: DataFrame):
    """(m, k, ds) float64 tensor from the codebook rows — O(m·2^nbits)
    driver state, broadcast via task closures."""
    import numpy as np

    rows = codebook.select("sub", "code", "centroid").collect()
    m = 1 + max(r["sub"] for r in rows)
    k = 1 + max(r["code"] for r in rows)
    ds = len(rows[0]["centroid"])
    t = np.zeros((m, k, ds), dtype=np.float64)
    for r in rows:
        t[r["sub"], r["code"]] = r["centroid"]
    return t


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """(``id_col``, codes array<int>) — each vector compressed to m
    code ids (argmin L2 per subspace against the broadcast codebook).
    One Arrow-batched row-parallel pass, no shuffle."""
    cb = _codebook_tensor(codebook)
    mq, _k, ds = cb.shape

    def enc(batch_iter):
        import pandas as pd

        for pdf in batch_iter:
            mat = _as_matrix(pdf["__v"], d=mq * ds)
            if normalize and len(mat):
                mat = _unitize(mat)
            yield pd.DataFrame(
                {"__id": pdf["__id"], "codes": list(_encode_mat(mat, cb))}
            )

    from dataeng_azure_spotify_spark.operators.similarity import (
        _require_integral_id,
    )

    _require_integral_id(corpus, id_col, "pq_encode")
    out = corpus.select(
        F.col(id_col).cast("long").alias("__id"), F.col(vec_col).alias("__v")
    ).mapInPandas(enc, "__id long, codes array<int>")
    return out.select(F.col("__id").alias(id_col), "codes")


def pq_decode(
    codes: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(``id_col``, ``vec_col``) — reconstruction (concatenated
    sub-centroids); the test surface for quantization error."""
    cb = _codebook_tensor(codebook)

    def dec(batch_iter):
        import numpy as np
        import pandas as pd

        for pdf in batch_iter:
            out = [
                np.concatenate(
                    [cb[s, c] for s, c in enumerate(cs)]
                ).astype(np.float32)
                for cs in pdf["codes"]
            ]
            yield pd.DataFrame({"__id": pdf["__id"], "__v": out})

    out = codes.select(
        F.col(id_col).cast("long").alias("__id"), "codes"
    ).mapInPandas(dec, "__id long, __v array<float>")
    return out.select(F.col("__id").alias(id_col), F.col("__v").alias(vec_col))


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k neighbors of each query over the COMPRESSED
    corpus via ADC: per query an m × 2^nbits inner-product lookup
    table (q_sub · centroid), each code row scored with m gathers —
    the d-dim float math happens once per (query, codebook) pair, not
    per corpus row. Returns (query_id, neighbor_id, score) with score
    the ADC approximate cosine/IP, ranked per query (score desc,
    neighbor_id asc — the :func:`cosine_topk` total order).

    Scale: queries+LUTs broadcast (q × m × 2^nbits doubles), ONE scan
    of the code table emitting per-partition partial top-k (≤
    partitions × q × k rows), then a global window takes the final k —
    never an n×q score table."""
    import numpy as np

    cb = _codebook_tensor(codebook)
    mq, kk, ds = cb.shape
    q_rows = queries.select(
        F.col(id_col).cast("long").alias("qid"), F.col(vec_col).alias("v")
    ).collect()  # broadcast-scale: the ANN query set is O(queries)
    if not q_rows:
        return codes.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, score double"
        )
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    qmat = _as_matrix([r["v"] for r in q_rows], d=mq * ds)
    if normalize:
        qmat = _unitize(qmat)
    # LUT[q, sub, code] = q_sub · centroid(sub, code)
    lut = np.einsum("qsd,skd->qsk", qmat.reshape(len(qmat), mq, ds), cb)

    def score(batch_iter):
        import pandas as pd

        for pdf in batch_iter:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy()
            cmat = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            # gather: scores[q, n] = Σ_sub LUT[q, sub, code[n, sub]]
            scores = np.zeros((len(qids), len(ids)))
            for sub in range(mq):
                scores += lut[:, sub, cmat[:, sub]]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                s = scores[qi]
                mask = ids != qids[qi] if exclude_self else np.ones(
                    len(ids), dtype=bool
                )
                cand = np.flatnonzero(mask)
                if not len(cand):
                    continue
                # partial top-k under the SAME total order as the final
                # window (score desc, id asc) — a tie straddling the
                # k-boundary must keep the smaller id (lexsort: last key
                # is primary)
                top = cand[np.lexsort((ids[cand], -s[cand]))[: int(k)]]
                out_q.extend([int(qids[qi])] * len(top))
                out_n.extend(int(i) for i in ids[top])
                out_s.extend(float(x) for x in s[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
            )

    partial = codes.select(
        F.col(id_col).cast("long").alias("__id"), "codes"
    ).mapInPandas(score, "query_id long, neighbor_id long, score double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
        .select("query_id", "neighbor_id", "score")
    )


# -- IVF-PQ composition ------------------------------------------------
#
# The FAISS IVFADC recipe (Jégou et al. 2011 §IV): route queries with a
# coarse IVF quantizer, PQ-encode each vector's RESIDUAL against its
# assigned (unit-normalized) coarse centroid, and score probed buckets
# by ADC over the residual codes plus the exact per-(query, centroid)
# bias:
#
#     q̂ · û  =  q̂ · ĉ  +  q̂ · (û − ĉ)  ≈  q̂ · ĉ  +  LUT_q[codes]
#
# Residuals concentrate near zero, so the same code budget quantizes
# them far more finely than raw vectors — measurably higher recall at
# identical bytes/vector than raw-vector PQ (pinned in tests and
# docs/BENCH_NOTES.md).
#
# At 100 TB: the probe touches ~nprobe/num_centroids of the corpus via
# centroid partition pruning AND reads only the (id, codes) columns of
# the probed rows — with codes stored as a COLUMN of the bucket table,
# Parquet's columnar layout delivers the 16-byte/vector ADC scan while
# the float vectors stay on disk for exact re-rank and maintenance
# (IvfIndex.add_codes; the ReadSchema pin in tests/test_pq.py).


def residual_codebook(
    bucketed: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    nbits: int = 4,
    iters: int = 8,
    train_n: int = 16384,
) -> DataFrame:
    """Train a PQ codebook on IVF RESIDUALS: ``unit(vec) −
    unit(centroid)`` over a deterministic bounded sample of the
    bucketed corpus (``bucketed`` must carry ``centroid_id``).
    Same determinism contract as :func:`pq_train`."""
    spark = bucketed.sparkSession
    cent = centroids.select(
        F.col("centroid_id"), F.col(vec_col).alias("__cvec")
    )
    sample = _bounded_sample(
        bucketed.join(F.broadcast(cent), on="centroid_id"),
        train_n,
        [id_col, F.col(vec_col).alias("v"), F.col("__cvec").alias("c")],
        "residual_codebook",
    )
    vmat = _unitize(_as_matrix([r["v"] for r in sample]))
    cmat = _unitize(_as_matrix([r["c"] for r in sample]))
    rows = _lloyd_codebook(
        vmat - cmat, int(m), int(nbits), int(iters), "residual_codebook"
    )
    return spark.createDataFrame(rows, PQ_CODEBOOK_SCHEMA)


def residual_encode(
    bucketed: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(``id_col``, centroid_id, codes) — each bucketed vector's
    residual against its own unit centroid compressed to m code ids.
    One broadcast centroid join + one Arrow-batched row-parallel pass,
    no corpus shuffle."""
    cb = _codebook_tensor(codebook)
    mq, _k, ds = cb.shape

    def enc(batch_iter):
        import pandas as pd

        for pdf in batch_iter:
            v = _unitize(_as_matrix(pdf["__v"], d=mq * ds))
            c = _unitize(_as_matrix(pdf["__c"], d=mq * ds))
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "centroid_id": pdf["__cid"],
                    "codes": list(_encode_mat(v - c, cb)),
                }
            )

    cent = centroids.select(
        F.col("centroid_id"), F.col(vec_col).alias("__cvec")
    )
    out = (
        bucketed.join(F.broadcast(cent), on="centroid_id")
        .select(
            F.col(id_col).cast("long").alias("__id"),
            F.col("centroid_id").cast("long").alias("__cid"),
            F.col(vec_col).alias("__v"),
            F.col("__cvec").alias("__c"),
        )
        .mapInPandas(enc, "__id long, centroid_id long, codes array<int>")
    )
    return out.select(F.col("__id").alias(id_col), "centroid_id", "codes")


def adc_probe_topk(
    queries: DataFrame,
    centroids: DataFrame,
    coded: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    nprobe: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_vectors: DataFrame | None = None,
    rerank: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """The shared IVF-PQ query tail: route each query to its ``nprobe``
    nearest centroids (driver-side — queries and centroids are both
    O(bounded) collections), then ONE scan of the probed slice of the
    code table scoring ``bias(q, c) + Σ_sub LUT_q[sub, code]`` and
    emitting per-partition partial top-k; a global window takes the
    final k. With ``rerank`` (≥ k), the per-query ADC top-``rerank``
    shortlist is re-scored EXACTLY against ``rerank_vectors`` (full
    floats, fetched for shortlist ids only) before the final k — the
    FAISS refine step, turning ADC's approximation error into a
    shortlist-recall question.

    Scale: the probed scan is partition-pruned to the probed
    centroids by a literal ``isin`` on the partition column and reads
    ONLY (centroid_id, ``id_col``, codes); the rerank join touches
    q × rerank rows. Returns (query_id, neighbor_id, score) under the
    (score desc, id asc) total order."""
    import numpy as np

    spark = coded.sparkSession
    cb = _codebook_tensor(codebook)
    mq, _kk, ds = cb.shape
    d = mq * ds
    q_rows = queries.select(
        F.col(id_col).cast("long").alias("qid"), F.col(vec_col).alias("v")
    ).collect()  # broadcast-scale: the ANN query set is O(queries)
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, score double"
        )
    c_rows = centroids.select(
        F.col("centroid_id").cast("long").alias("cid"),
        F.col(vec_col).alias("v"),
    ).collect()  # O(num_centroids)
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    qmat = _unitize(_as_matrix([r["v"] for r in q_rows], d=d))
    cids = np.array([r["cid"] for r in c_rows], dtype=np.int64)
    cmat = _unitize(_as_matrix([r["v"] for r in c_rows], d=d))
    # routing: nprobe nearest centroids per query (raw-vector cosine,
    # matching _probe_and_score's router) + the exact unit-space bias
    # q̂·ĉ used by the ADC identity
    route = qmat @ cmat.T  # (q, k) — driver-side, bounded
    order = np.lexsort((cids[None, :].repeat(len(qids), 0), -route), axis=1)
    probed = order[:, : int(nprobe)]  # centroid INDEXES per query
    lut = np.einsum("qsd,skd->qsk", qmat.reshape(len(qmat), mq, ds), cb)
    # per-centroid probe lists: cid -> [(query index, bias), ...]
    by_cid: dict = {}
    for qi in range(len(qids)):
        for ci in probed[qi]:
            by_cid.setdefault(int(cids[ci]), []).append(
                (qi, float(route[qi, ci]))
            )
    probed_cids = sorted(by_cid)

    def score(batch_iter):
        import pandas as pd

        for pdf in batch_iter:
            if not len(pdf):
                continue
            out_q, out_n, out_s = [], [], []
            for cid, grp in pdf.groupby("__cid", sort=True):
                plist = by_cid.get(int(cid))
                if not plist:
                    continue
                ids = grp["__id"].to_numpy()
                cmat_codes = np.array(list(grp["codes"]), dtype=np.int64)
                for qi, bias in plist:
                    s = np.full(len(ids), bias)
                    for sub in range(mq):
                        s += lut[qi, sub, cmat_codes[:, sub]]
                    mask = (
                        ids != qids[qi]
                        if exclude_self
                        else np.ones(len(ids), dtype=bool)
                    )
                    cand = np.flatnonzero(mask)
                    if not len(cand):
                        continue
                    # partial top under the final window's total order
                    # (score desc, id asc; lexsort: last key primary)
                    n_keep = int(rerank or k)
                    top = cand[
                        np.lexsort((ids[cand], -s[cand]))[:n_keep]
                    ]
                    out_q.extend([int(qids[qi])] * len(top))
                    out_n.extend(int(i) for i in ids[top])
                    out_s.extend(float(x) for x in s[top])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
            )

    partial = (
        coded.filter(F.col("centroid_id").isin(probed_cids))
        .select(
            F.col("centroid_id").cast("long").alias("__cid"),
            F.col(id_col).cast("long").alias("__id"),
            "codes",
        )
        .mapInPandas(score, "query_id long, neighbor_id long, score double")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    if rerank is None:
        return (
            partial.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= int(k))
            .select("query_id", "neighbor_id", "score")
        )
    if rerank_vectors is None:
        raise ValueError("adc_probe_topk: rerank requires rerank_vectors")
    if int(rerank) < int(k):
        raise ValueError(
            f"adc_probe_topk: rerank={rerank} must be >= k={k}"
        )
    shortlist = (
        partial.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(rerank))
        .select("query_id", "neighbor_id")
    )
    # exact re-score of the shortlist only: fetch full floats for the
    # q × rerank shortlist ids, score q̂·û in numpy batches
    vecs = rerank_vectors.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).alias("__nv"),
    )
    qlut = {int(qids[i]): qmat[i] for i in range(len(qids))}

    def rescore(batch_iter):
        import pandas as pd

        for pdf in batch_iter:
            if not len(pdf):
                continue
            nmat = _unitize(_as_matrix(pdf["__nv"], d=d))
            s = [
                float(qlut[int(q)] @ nmat[i])
                for i, q in enumerate(pdf["query_id"])
            ]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "score": s,
                }
            )

    exact = shortlist.join(vecs, "neighbor_id").select(
        "query_id", "neighbor_id", F.col("__nv")
    ).mapInPandas(rescore, "query_id long, neighbor_id long, score double")
    return (
        exact.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
        .select("query_id", "neighbor_id", "score")
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 1,
    m: int = 4,
    nbits: int = 4,
    pq_iters: int = 8,
    train_n: int = 16384,
    rerank: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """One-shot IVF-PQ approximate top-k: coarse k-means routing +
    residual-PQ ADC within the probed buckets (+ optional exact
    re-rank). The ad-hoc twin of ``IvfIndex.add_codes`` +
    ``IvfIndex.query_adc`` — same math, index-less."""
    from dataeng_azure_spotify_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
    )

    centroids = kmeans_centroids(
        corpus, id_col, vec_col, k=num_centroids, iters=kmeans_iters
    )
    # emit_vec passes the vector through ivf_assign's cogroup task, so
    # no corpus-sized re-join on the id is needed to re-attach it
    bucketed = ivf_assign(
        corpus, centroids, id_col, vec_col, emit_vec=True
    )
    cb = residual_codebook(
        bucketed, centroids, id_col, vec_col,
        m=m, nbits=nbits, iters=pq_iters, train_n=train_n,
    )
    coded = residual_encode(bucketed, centroids, cb, id_col, vec_col)
    return adc_probe_topk(
        queries, centroids, coded, cb,
        k=k, nprobe=nprobe, id_col=id_col, vec_col=vec_col,
        rerank_vectors=corpus if rerank is not None else None,
        rerank=rerank, exclude_self=exclude_self,
    )
