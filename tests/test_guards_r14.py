"""Round-14 contract guards: pins for the two semantics-narrowing
edges flagged in VERDICT r13 (the `_lsh_bands` mixed-dimension raise
and the `_lloyd_codebook` GEMM distance form) plus the two ADVICE r13
items (the gopher ``sum_len`` regex/token-fold equivalence and the
``(query_id, neighbor_id)`` uniqueness contract the fused ANN recall
certificate relies on)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.catalog import Catalog
from dataeng_azure_spotify_spark.functions.text import tokens_col
from dataeng_azure_spotify_spark.operators.pq import _lloyd_codebook
from dataeng_azure_spotify_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
)

SF = "/root/testdata/sf0.001"


def test_lsh_bands_raises_on_mixed_dimension_corpus(spark):
    """r13 narrowed `_lsh_bands` from computing a value on rows longer
    than the probed first-row dimension to RAISING — pin the message so
    the contract change stays deliberate (VERDICT r13 §What's-wrong 4a).
    Rows SHORTER than the probed dim still fold over their own
    elements (legacy semantics, second assertion)."""
    from dataeng_azure_spotify_spark.operators.similarity import _lsh_bands

    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0, 3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="mixed-dimension"):
        _lsh_bands(
            mixed, "vec_id", "embedding", num_planes=8, bands=2, salt="s"
        ).collect()

    shorter = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0])],
        "vec_id long, embedding array<double>",
    )
    out = _lsh_bands(
        shorter, "vec_id", "embedding", num_planes=8, bands=2, salt="s"
    ).collect()
    assert sorted({r.id for r in out}) == [1, 2]  # both rows banded


def test_lloyd_codebook_near_tie_assignment_deterministic():
    """The GEMM distance identity (−2x·c + ‖c‖²) must keep the
    first-index tie-break of the exact ‖x−c‖² form on a synthetic
    duplicate-distance corpus (VERDICT r13 §What's-wrong 4b): points
    exactly equidistant from two centroids, including the all-zero
    point against symmetric ±v seeds."""
    # init = first k sample subvectors → centroids are rows 0..3.
    # Rows 4.. are exactly equidistant from centroid 0 and centroid 1
    # (midpoint construction with exact float arithmetic).
    base = np.array(
        [
            [2.0, 0.0],   # centroid 0 seed
            [-2.0, 0.0],  # centroid 1 seed (symmetric: ties at x=0)
            [0.0, 4.0],   # centroid 2 seed
            [0.0, -4.0],  # centroid 3 seed
            [0.0, 0.0],   # equidistant from c0/c1 (and c2/c3)
            [0.0, 1.0],   # equidistant from c0/c1
            [0.0, -1.0],  # equidistant from c0/c1
        ],
        dtype=np.float64,
    )
    rows = _lloyd_codebook(base, m=1, nbits=2, iters=3, name="t")

    # reference: exact difference-tensor Lloyd with the same tie-break
    k, ds = 4, 2
    cent = base[:k].copy()
    for _ in range(3):
        d2 = ((base[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for ci in range(k):
            sel = base[assign == ci]
            if len(sel):
                cent[ci] = sel.mean(axis=0)
    want = [(0, ci, cent[ci].astype(np.float32).tolist()) for ci in range(k)]
    assert rows == want


def test_gopher_sum_len_equals_token_length_fold(spark):
    """ADVICE r13: `length(regexp_replace(trim(c), '\\s+', ''))` must
    equal the per-token length fold for every input — the equivalence
    holds only because tokens_col splits on the same \\s+ class, so a
    future tokenizer change must break THIS test before it silently
    desynchronizes mean_word_len."""
    rows = [
        ("plain words here",),
        ("  leading and trailing  ",),
        ("tab\tsep\nnewline\r\nmix",),
        ("nbsp stays_in_token",),  # \s does not match NBSP
        ("",),
        ("   ",),
        (None,),
        ("one",),
        ("héllo wörld ünïcode",),
        ("a  b   c\t\td",),
    ]
    df = spark.createDataFrame(rows, "text string")
    c = F.col("text")
    regex_form = F.length(F.regexp_replace(F.trim(c), r"\s+", "")).cast("long")
    fold_form = F.aggregate(
        F.transform(tokens_col("text"), F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("long")
    out = df.select(
        regex_form.alias("regex_len"), fold_form.alias("fold_len")
    ).collect()
    for r in out:
        assert r.regex_len == r.fold_len, (r.regex_len, r.fold_len)


def test_rank_topk_emits_unique_pairs(spark):
    """The fused recall certificate (`__spark_entry__.py
    _ann_recall_certificate`) left-joins the two neighbor lists and
    counts rows — correct ONLY while (query_id, neighbor_id) is unique
    in both lists (ADVICE r13). Pin the contract at the _rank_topk
    boundary for every list producer the certificates consume."""
    emb = Catalog(spark, SF).load("embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    for df in (
        cosine_topk(qs, emb, k=5),
        ivf_topk(qs, emb, k=5, num_centroids=8, nprobe=3),
        lsh_topk(qs, emb, k=5, num_planes=24, bands=8),
    ):
        pairs = df.groupBy("query_id", "neighbor_id").count()
        dups = pairs.filter(F.col("count") > 1).count()
        assert dups == 0
