"""Auto-compaction policy (operators/compaction.py maybe_autocompact,
r10): artifacts fold their own run partitions at admission commit once
the live count crosses max_live_runs — a long stream's per-probe file
listing stays bounded WITHOUT a manual compact() call — and replay
semantics survive the auto-fold (same epoch → same deterministic tag →
the idempotent protocol resumes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.operators.compaction import (
    CompactionLog,
    maybe_autocompact,
)
from dataeng_azure_spotify_spark.operators.substring import (
    IncrementalSubstringDedup,
)

# slow tier (r14): multi-round compaction e2e — exceeds the driver verify window; run with -m slow
pytestmark = pytest.mark.slow

_SCHEMA = "doc_id long, text string"


def _batch(spark, epoch: int, n: int = 3):
    words = "alpha bravo charlie delta echo foxtrot golf hotel india"
    return spark.createDataFrame(
        [
            (epoch * 100 + i, f"e{epoch} d{i} {words} tail{epoch} t{i}")
            for i in range(n)
        ],
        _SCHEMA,
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_substring_autocompact_bounds_dirs_and_matches_control(
    spark, tmp_path
):
    """Ten admitted epochs with max_live_runs=3: the live run count
    never exceeds threshold+1 (the fold fires at the commit that
    crosses it), the admitted sets equal a policy-less control's, and
    the final coverage probe is byte-identical."""
    inc = IncrementalSubstringDedup(
        spark, str(tmp_path / "auto"), max_dup_frac=1.0, max_live_runs=3
    )
    ctl = IncrementalSubstringDedup(
        spark, str(tmp_path / "ctl"), max_dup_frac=1.0
    )
    for e in range(10):
        b = _batch(spark, e)
        got = _ids(inc.admit(b, run_id=f"e{e}"))
        want = _ids(ctl.admit(b, run_id=f"e{e}"))
        assert got == want, f"epoch {e} admitted set diverged"
        assert inc.index.live_run_count() <= 4, (
            f"epoch {e}: live runs {inc.index.live_run_count()}"
        )
    assert ctl.index.live_run_count() == 10  # control really accreted
    probe = _batch(spark, 99)
    a = sorted(map(tuple, inc.index.coverage(probe, "probe").collect()))
    b = sorted(map(tuple, ctl.index.coverage(probe, "probe").collect()))
    assert a == b


def test_autocompact_replay_of_folded_and_triggering_epochs(
    spark, tmp_path
):
    """Exactly-once across the auto-fold: replaying an epoch the policy
    folded — including the very epoch whose commit TRIGGERED the fold —
    returns the identical admitted set with no state mutation."""
    inc = IncrementalSubstringDedup(
        spark, str(tmp_path / "s"), max_dup_frac=1.0, max_live_runs=2
    )
    first = {}
    for e in range(5):
        first[e] = _ids(inc.admit(_batch(spark, e), run_id=f"e{e}"))
    folded = inc.index._clog.folded_originals()
    assert folded, "no auto-fold fired"
    n_live = inc.index.live_run_count()
    # a folded epoch and the latest (triggering or post-fold) epoch
    for e in sorted({min(int(r[1:]) for r in folded), 4}):
        replay = _ids(inc.admit(_batch(spark, e), run_id=f"e{e}"))
        assert replay == first[e], f"epoch {e} replay diverged"
        assert inc.index.live_run_count() == n_live


def test_autocompact_crash_mid_fold_resumes_on_replay(
    spark, tmp_path, monkeypatch
):
    """Crash INSIDE the auto-fold (between consolidated write and
    marker commit): the epoch's replay re-admits identically AND
    re-triggers the SAME tag, resuming the protocol to completion."""
    inc = IncrementalSubstringDedup(
        spark, str(tmp_path / "s"), max_dup_frac=1.0, max_live_runs=1
    )
    first0 = _ids(inc.admit(_batch(spark, 0), run_id="e0"))

    real_commit = CompactionLog.commit
    monkeypatch.setattr(
        CompactionLog,
        "commit",
        lambda self, tag, runs: (_ for _ in ()).throw(
            RuntimeError("injected crash before marker commit")
        ),
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        inc.admit(_batch(spark, 1), run_id="e1")
    monkeypatch.setattr(CompactionLog, "commit", real_commit)

    # nothing committed: readers still see both live runs
    assert inc.index._clog.committed() == {}
    # replay of the crashed epoch: identical admitted rows, fold resumes
    replay1 = _ids(inc.admit(_batch(spark, 1), run_id="e1"))
    assert replay1 == _ids(_batch(spark, 1))
    assert "compact-auto-e1" in inc.index._clog.committed()
    assert inc.index.live_run_count() == 1
    # earlier epoch still replays from the registry
    assert _ids(inc.admit(_batch(spark, 0), run_id="e0")) == first0


def test_autocompact_validation_and_reuse_guard(spark, tmp_path):
    inc = IncrementalSubstringDedup(
        spark, str(tmp_path / "s"), max_dup_frac=1.0, max_live_runs=1
    )
    with pytest.raises(ValueError, match="max_live_runs must be >= 1"):
        maybe_autocompact(inc.index, "e0", 0)
    with pytest.raises(ValueError, match="run_id is required"):
        maybe_autocompact(inc.index, None, 3)
    # fire a real auto-fold under e1, then accrete PAST the threshold
    # again without the policy (raw admit_batch) so the next policy
    # check with the REUSED e1 id reaches the committed-tag guard
    # instead of the low-count no-op
    inc.admit(_batch(spark, 0), run_id="e0")
    inc.admit(_batch(spark, 1), run_id="e1")  # folds under compact-auto-e1
    assert "compact-auto-e1" in inc.index._clog.committed()
    inc.index.admit_batch(_batch(spark, 2), "e2", max_dup_frac=1.0)
    inc.index.admit_batch(_batch(spark, 3), "e3", max_dup_frac=1.0)
    assert inc.index.live_run_count() > 1
    with pytest.raises(ValueError, match="reused across epochs"):
        maybe_autocompact(inc.index, "e1", 1)


def test_semantic_admitter_autocompact_bounds_dirs(spark, tmp_path):
    """The semantic tier's knob: keeper run dirs stay bounded across
    six epochs and admitted sets match the policy-less control."""
    from dataeng_azure_spotify_spark.operators.similarity import (
        IncrementalSemanticDedup,
    )

    def vecs(e):
        return spark.createDataFrame(
            [
                (e * 10 + i, [float(e + 1), float(i), 1.0, 0.0])
                for i in range(3)
            ],
            "vec_id long, embedding array<float>",
        )

    auto = IncrementalSemanticDedup(
        spark, str(tmp_path / "auto"), threshold=0.999, k=2, iters=1,
        max_live_runs=2,
    )
    ctl = IncrementalSemanticDedup(
        spark, str(tmp_path / "ctl"), threshold=0.999, k=2, iters=1
    )
    for e in range(6):
        got = sorted(r.vec_id for r in auto.admit(vecs(e), run_id=f"e{e}").collect())
        want = sorted(r.vec_id for r in ctl.admit(vecs(e), run_id=f"e{e}").collect())
        assert got == want, f"epoch {e}"
        assert auto.index.live_run_count() <= 3
    assert ctl.index.live_run_count() >= 5


def test_admission_stream_labels_autocompact(spark, tmp_path):
    """The labels-index leg of run_admission_stream: five drained
    epochs with labels_max_live_runs=2 keep the label artifact's run
    count bounded and the labels identical to a policy-less control."""
    from dataeng_azure_spotify_spark.operators.cluster_index import (
        NearDupLabels,
    )
    from dataeng_azure_spotify_spark.operators.dedup import IncrementalDedup
    from dataeng_azure_spotify_spark.streaming.admission import (
        run_admission_stream,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    auto_idx = NearDupLabels.build(
        spark.createDataFrame([], _SCHEMA), str(tmp_path / "lbl_auto")
    )
    ctl_idx = NearDupLabels.build(
        spark.createDataFrame([], _SCHEMA), str(tmp_path / "lbl_ctl")
    )

    for e in range(5):
        _batch(spark, e).write.mode("append").parquet(inp)
        src = spark.readStream.schema(_SCHEMA).parquet(inp)
        run_admission_stream(
            src,
            IncrementalDedup(spark, str(tmp_path / "state")),
            out,
            chk,
            labels_index=auto_idx,
            labels_max_live_runs=2,
        )
        ctl_idx.append(_batch(spark, e), run_id=f"ctl-e{e}")
    assert auto_idx.live_run_count() <= 3
    assert ctl_idx.live_run_count() >= 5
    a = sorted(
        (r["doc_id"], r["cluster_id"]) for r in auto_idx.labels().collect()
    )
    b = sorted(
        (r["doc_id"], r["cluster_id"]) for r in ctl_idx.labels().collect()
    )
    assert a == b


def test_policy_without_run_id_fails_before_admission(spark, tmp_path):
    """max_live_runs set + run_id=None must fail BEFORE the admission
    commit — failing after would leave a committed adhoc run the
    caller did not expect."""
    from dataeng_azure_spotify_spark.operators.similarity import (
        IncrementalSemanticDedup,
    )

    inc = IncrementalSubstringDedup(
        spark, str(tmp_path / "s"), max_live_runs=2
    )
    with pytest.raises(ValueError, match="run_id is None"):
        inc.admit(_batch(spark, 0))
    assert not inc.index.exists()  # nothing was committed

    sem = IncrementalSemanticDedup(
        spark, str(tmp_path / "sem"), max_live_runs=2
    )
    with pytest.raises(ValueError, match="run_id is None"):
        sem.admit(
            spark.createDataFrame(
                [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
            )
        )
    assert not sem.index.exists()
