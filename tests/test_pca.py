"""Distributed PCA: property tests (no SQL oracle possible — float64
partition sums are layout-dependent; see operators/pca.py docstring)."""

from __future__ import annotations

import math

import pytest

from dataeng_azure_spotify_spark.operators.pca import PcaModel, pca_fit, pca_project


def _mk(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pca_recovers_planted_subspace(spark):
    """Data on a 2-D plane inside 6-D: two components explain ~all
    variance, components are orthonormal, projection reconstructs."""
    import numpy as np

    rng_rows = []
    # deterministic "random": hash-free LCG so the test is replayable
    state = 12345
    def nxt():
        nonlocal state
        state = (1103515245 * state + 12345) % (1 << 31)
        return state / (1 << 31) - 0.5
    for i in range(200):
        a, b = nxt() * 4, nxt() * 2
        # plane spanned by (1,1,0,0,0,0)/sqrt2 and (0,0,1,-1,0,0)/sqrt2
        v = [a / math.sqrt(2), a / math.sqrt(2), b / math.sqrt(2),
             -b / math.sqrt(2), 0.0, 0.0]
        rng_rows.append((i, v))
    df = _mk(spark, rng_rows)
    model = pca_fit(df, k=3)

    comps = np.asarray(model.components)
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-8)
    # variance concentrated in 2 components
    ev = model.explained_variance
    assert ev[0] >= ev[1] >= ev[2] >= 0
    assert ev[2] < 1e-10 * (ev[0] + ev[1] + 1e-30)

    # projection + reconstruction: residual ~0 for in-plane data
    proj = pca_project(df, model, whiten=False)
    got = {r.vec_id: [r.pc0, r.pc1, r.pc2] for r in proj.collect()}
    mean = np.asarray(model.mean)
    for i, v in rng_rows[:20]:
        y = np.asarray(got[i])
        recon = mean + y @ comps
        assert np.allclose(recon, np.asarray(v), atol=1e-5), i


def test_pca_fit_deterministic_and_model_roundtrip(spark, tmp_path):
    rows = [(i, [float(i % 7), float((3 * i) % 5), 1.0, 0.5]) for i in range(60)]
    df = _mk(spark, rows).repartition(4)
    m1 = pca_fit(df, k=2)
    m2 = pca_fit(df, k=2)
    assert m1.components == m2.components and m1.mean == m2.mean

    p = str(tmp_path / "pca.json")
    m1.save(p)
    m3 = PcaModel.load(p)
    assert m3.components == m1.components
    out = pca_project(df, m3)
    assert out.columns == ["vec_id", "pc0", "pc1"] and out.count() == 60


def test_pca_whiten_unit_variance(spark):
    rows = [(i, [float(i), float(-2 * i), 0.0]) for i in range(50)]
    df = _mk(spark, rows)
    model = pca_fit(df, k=1)
    vals = [r.pc0 for r in pca_project(df, model, whiten=True).collect()]
    n = len(vals)
    mu = sum(vals) / n
    var = sum((v - mu) ** 2 for v in vals) / n
    assert abs(var - 1.0) < 1e-6


def test_pca_empty_input_raises(spark):
    df = _mk(spark, []).filter("vec_id > 0")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(df, k=2)
