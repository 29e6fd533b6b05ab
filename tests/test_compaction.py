"""Artifact compaction: fold run partitions into one consolidated
partition while preserving probe results byte-identically, replay of
folded runs, retraction, and crash-convergence at every commit window
(see operators/compaction.py for the protocol)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.operators import compaction as C


def _run_dirs(table_path: str, nested: bool = True) -> int:
    return C.count_run_partitions(table_path, nested=nested)


# --------------------------------------------------------------------------
# SubstringDupIndex
# --------------------------------------------------------------------------

UNIQ = [
    f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h" for i in range(8)
]


def _substring_state(spark, tmp_path):
    """Index with 4 admitted runs (one rejection in e0) + a probe batch."""
    from dataeng_azure_spotify_spark.operators.substring import (
        IncrementalSubstringDedup,
    )

    W = "alpha bravo charlie delta echo foxtrot golf hotel"
    adm = IncrementalSubstringDedup(
        spark, str(tmp_path / "sub"), max_dup_frac=0.5, k=8, num_buckets=2
    )
    batches = {
        "e0": [(1, f"{W} india {W}"), (2, UNIQ[0]), (3, UNIQ[1])],
        "e1": [(10, UNIQ[0]), (11, UNIQ[2])],  # 10 rejected vs store
        "e2": [(20, UNIQ[3])],
        "e3": [(30, UNIQ[4]), (31, UNIQ[5])],
    }
    admitted = {}
    dfs = {}
    for rid, rows in batches.items():
        dfs[rid] = spark.createDataFrame(rows, "doc_id long, text string")
        admitted[rid] = {
            r.doc_id for r in adm.admit(dfs[rid], run_id=rid).collect()
        }
    assert admitted["e0"] == {2, 3} and admitted["e1"] == {11}
    probe = spark.createDataFrame(
        [(90, UNIQ[2]), (91, UNIQ[6])], "doc_id long, text string"
    )
    return adm.index, dfs, admitted, probe


def _grams_snapshot(idx):
    return {
        (r.g, r.doc, r.c) for r in idx.grams().select("g", "doc", "c").collect()
    }


def _coverage_snapshot(idx, probe):
    return {
        tuple(r) for r in idx.coverage(probe, "probe-run").collect()
    }


def test_substring_compact_probe_identical(spark, tmp_path):
    """compact folds every run into one partition per bucket; gram rows,
    coverage, and admission decisions are byte-identical; the dir count
    collapses; folded-run replay answers from the registry."""
    idx, dfs, admitted, probe = _substring_state(spark, tmp_path)
    before_rows = _grams_snapshot(idx)
    before_cov = _coverage_snapshot(idx, probe)
    dirs_before = _run_dirs(idx._grams_path)
    assert dirs_before >= 4  # several runs × touched buckets

    summary = idx.compact("compact-1")
    # the incremental bootstrap's build() wrote no gram partitions, so
    # only the four admitted epochs fold
    assert set(summary["folded_runs"]) == {"e0", "e1", "e2", "e3"}
    assert summary["partition_dirs_after"] <= 2  # ≤ one per touched bucket
    assert summary["partition_dirs_after"] < dirs_before

    assert _grams_snapshot(idx) == before_rows
    assert _coverage_snapshot(idx, probe) == before_cov
    runs_left = {r.run for r in idx.grams().select("run").distinct().collect()}
    assert runs_left == {"compact-1"}

    # folded-run replay: the exactly-once crash window (epoch admitted,
    # checkpoint not committed, compaction ran before restart)
    for rid in ("e0", "e1", "e3"):
        replay = {
            r.doc_id for r in idx.admit_batch(dfs[rid], rid).collect()
        }
        assert replay == admitted[rid], rid
    # and it mutated nothing
    assert _grams_snapshot(idx) == before_rows

    # no-op re-invocation (crash-after-commit retry path)
    again = idx.compact("compact-1")
    assert again["folded_runs"] == [] and again["replay"]


def test_substring_compact_then_admit_then_recompact(spark, tmp_path):
    """Post-compact admissions land normally; a second compact folds the
    previous tag + the new runs; replays of runs folded by EITHER
    compaction still answer exactly; superseded markers are dropped."""
    idx, dfs, admitted, probe = _substring_state(spark, tmp_path)
    idx.compact("compact-1")

    b4 = spark.createDataFrame(
        [(40, UNIQ[6]), (41, UNIQ[1])], "doc_id long, text string"
    )
    got4 = {r.doc_id for r in idx.admit_batch(b4, "e4").collect()}
    assert got4 == {40}  # 41 duplicates folded doc 3's text
    before_rows = _grams_snapshot(idx)

    s2 = idx.compact("compact-2")
    assert set(s2["folded_runs"]) == {"compact-1", "e4"}
    assert _grams_snapshot(idx) == before_rows
    assert not os.path.exists(os.path.join(idx._clog.path, "compact-1"))

    for rid in ("e0", "e1"):
        replay = {r.doc_id for r in idx.admit_batch(dfs[rid], rid).collect()}
        assert replay == admitted[rid], rid
    assert {r.doc_id for r in idx.admit_batch(b4, "e4").collect()} == {40}


def test_substring_compact_remove_interplay(spark, tmp_path):
    """remove() after compact retracts from the consolidated partition
    AND the registry: the doc's twin becomes admissible and a folded-run
    replay no longer returns the removed doc."""
    idx, dfs, admitted, probe = _substring_state(spark, tmp_path)
    idx.compact("compact-1")

    assert idx.remove(spark.createDataFrame([(3,)], "doc_id long")) > 0
    assert 3 not in {r.doc for r in idx.grams().select("doc").collect()}
    replay0 = {r.doc_id for r in idx.admit_batch(dfs["e0"], "e0").collect()}
    assert replay0 == {2}  # 3 retracted, not resurrected by the registry
    twin = spark.createDataFrame([(50, UNIQ[1])], "doc_id long, text string")
    assert {r.doc_id for r in idx.admit_batch(twin, "e5").collect()} == {50}


def test_substring_compact_crash_windows(spark, tmp_path, monkeypatch):
    """Every commit window of a crashed compact leaves reads exact, and
    a same-tag retry converges to the clean end state."""
    idx, dfs, admitted, probe = _substring_state(spark, tmp_path)
    before_rows = _grams_snapshot(idx)
    before_cov = _coverage_snapshot(idx, probe)

    # -- crash AFTER step 2 (consolidated rows written, marker not):
    real_commit = C.CompactionLog.commit

    def boom(self, tag, folded):
        raise RuntimeError("crash before marker commit")

    monkeypatch.setattr(C.CompactionLog, "commit", boom)
    with pytest.raises(RuntimeError):
        idx.compact("compact-1")
    monkeypatch.setattr(C.CompactionLog, "commit", real_commit)
    # uncommitted tag rows are invisible; nothing folded
    assert _grams_snapshot(idx) == before_rows
    assert _coverage_snapshot(idx, probe) == before_cov
    assert "compact-1" not in {
        r.run for r in idx.grams().select("run").distinct().collect()
    }

    # -- retry crashes AFTER step 3 (marker committed, dirs not deleted):
    real_delete = C.delete_folded_partitions
    calls = {"n": 0}

    def boom_delete(table_path, folded, nested):
        if folded:  # the post-commit deletion (sweep sees empty set here)
            raise RuntimeError("crash before dir deletion")
        calls["n"] += 1
        return real_delete(table_path, folded, nested)

    monkeypatch.setattr(C, "delete_folded_partitions", boom_delete)
    with pytest.raises(RuntimeError):
        idx.compact("compact-1")
    monkeypatch.setattr(C, "delete_folded_partitions", real_delete)
    # marker committed: reads exact despite lingering folded dirs
    assert _grams_snapshot(idx) == before_rows
    assert _coverage_snapshot(idx, probe) == before_cov
    assert _run_dirs(idx._grams_path) > 2  # dirs still there...
    final = idx.compact("compact-1")  # ...until the retry sweeps them
    assert final["folded_runs"] == [] and final["swept_dirs"] > 0
    assert _run_dirs(idx._grams_path) <= 2
    assert _grams_snapshot(idx) == before_rows
    assert _coverage_snapshot(idx, probe) == before_cov
    # replay still answered from the registry after the crashy history
    replay = {r.doc_id for r in idx.admit_batch(dfs["e1"], "e1").collect()}
    assert replay == admitted["e1"]


def test_substring_compact_guards(spark, tmp_path):
    """Tag namespace enforced on both sides: compact refuses plain run
    ids, admission refuses ids in the compact namespace."""
    idx, dfs, admitted, probe = _substring_state(spark, tmp_path)
    with pytest.raises(ValueError, match="compact-"):
        idx.compact("e9")
    with pytest.raises(ValueError, match="reserved"):
        idx.admit_batch(dfs["e1"], "compact-sneaky")
