"""Incremental materialized aggregates: delta maintenance must equal a
from-scratch aggregation of surviving rows, survive replays and
compaction, and drop fully-retracted groups."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, functions as F

from dataeng_azure_spotify_spark.operators.ivm import MaterializedAggregate

SCHEMA = "k string, v double, op int"


def _view(spark, mat):
    return {
        r["k"]: (r["n_rows"], float(r["total"]))
        for r in mat.current(spark).collect()
    }


def _scratch(spark, rows):
    """Ground truth: aggregate the multiset of surviving rows."""
    live: dict = {}
    for k, v, op in rows:
        live.setdefault(k, []).append((v, op))
    out = {}
    for k, vs in live.items():
        n = sum(op for _, op in vs)
        if n > 0:
            out[k] = (n, round(sum(v * op for v, op in vs), 4))
    return out


def test_delta_maintenance_matches_scratch(spark, tmp_path):
    rng = random.Random(3)
    mat = MaterializedAggregate(
        str(tmp_path / "state"), keys=["k"], sums={"total": "v"}
    )
    history = []
    inserted = []
    for run in range(4):
        batch = []
        for _ in range(60):
            if inserted and rng.random() < 0.3:
                k, v = inserted.pop(rng.randrange(len(inserted)))
                batch.append((k, v, -1))  # retract an existing row
            else:
                k, v = f"g{rng.randrange(6)}", round(rng.uniform(0, 99), 2)
                inserted.append((k, v))
                batch.append((k, v, 1))
        history.extend(batch)
        mat.apply_delta(
            spark.createDataFrame(batch, SCHEMA), run_id=f"r{run}", op_col="op"
        )
    got = _view(spark, mat)
    want = _scratch(spark, history)
    assert got == want

    # replaying an already-applied run must not change the view
    replay = [h for h in history[-60:]]
    mat.apply_delta(spark.createDataFrame(replay, SCHEMA), run_id="r3", op_col="op")
    assert _view(spark, mat) == want

    # compaction folds runs but preserves the answer
    mat.compact(spark)
    assert _view(spark, mat) == want


def test_fully_retracted_group_disappears(spark, tmp_path):
    mat = MaterializedAggregate(
        str(tmp_path / "state"), keys=["k"], sums={"total": "v"}
    )
    mat.apply_delta(
        spark.createDataFrame([("a", 5.0, 1), ("b", 1.0, 1)], SCHEMA),
        run_id="r0", op_col="op",
    )
    mat.apply_delta(
        spark.createDataFrame([("a", 5.0, -1)], SCHEMA),
        run_id="r1", op_col="op",
    )
    assert _view(spark, mat) == {"b": (1, 1.0)}


def test_insert_only_default_and_validation(spark, tmp_path):
    mat = MaterializedAggregate(
        str(tmp_path / "state"), keys=["k"], sums={"total": "v"}
    )
    mat.apply_delta(
        spark.createDataFrame([Row(k="a", v=2.0), Row(k="a", v=3.0)]),
        run_id="only",
    )
    assert _view(spark, mat) == {"a": (2, 5.0)}
    with pytest.raises(ValueError):
        mat.apply_delta(
            spark.createDataFrame([Row(k="a", v=1.0)]), run_id="../evil"
        )
    with pytest.raises(ValueError):
        MaterializedAggregate(str(tmp_path / "s2"), keys=[])
    with pytest.raises(ValueError):
        MaterializedAggregate(
            str(tmp_path / "s3"), keys=["k"], sums={"k": "v"}
        )


def test_streaming_front_end_matches_batch(spark, tmp_path):
    src, chk = str(tmp_path / "src"), str(tmp_path / "chk")
    rows = [("a", 1.5, 1), ("a", 2.5, 1), ("b", 4.0, 1), ("a", 1.5, -1)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    mat = MaterializedAggregate(
        str(tmp_path / "state"), keys=["k"], sums={"total": "v"}
    )
    mat.process_stream(
        spark.readStream.schema(SCHEMA).parquet(src), chk, op_col="op"
    )
    assert _view(spark, mat) == {"a": (1, 2.5), "b": (1, 4.0)}
    # draining again with no new files is a no-op
    mat.process_stream(
        spark.readStream.schema(SCHEMA).parquet(src), chk, op_col="op"
    )
    assert _view(spark, mat) == {"a": (1, 2.5), "b": (1, 4.0)}


def test_apply_change_feed_follows_snapshot_table(spark, tmp_path):
    """The CDF→IVM composition: a grouped SUM/COUNT view maintained
    purely from a snapshot table's change_feed equals a from-scratch
    aggregation of the LIVE snapshot at every point — across inserts,
    updates (pre/post cancel and re-add), and deletes — and
    re-applying an overlapping version window never double-counts
    (per-commit run ids overwrite idempotently)."""
    from dataeng_azure_spotify_spark.streaming.gold import (
        ParquetSnapshotTable,
    )

    t = ParquetSnapshotTable(spark, str(tmp_path / "gold"))
    S = "id long, k string, v double"
    mat = MaterializedAggregate(
        str(tmp_path / "view"), keys=["k"], sums={"total": "v"}
    )

    def scratch():
        return {
            r["k"]: (r["n"], float(r["s"]))
            for r in t.read()
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(18,4)")).alias("s"),
            )
            .collect()
        }

    t.overwrite(spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", 2.0), (3, "b", 4.0)], S))
    # version 0 is the initial snapshot — seed the view from it directly
    mat.apply_delta(t.read_version(0), run_id="cdf-v0")
    assert _view(spark, mat) == scratch()

    t.overwrite(spark.createDataFrame(
        [(1, "a", 9.0), (3, "b", 4.0), (4, "b", 1.0)], S))  # upd 1, del 2, ins 4
    applied = mat.apply_change_feed(t.change_feed(["id"], 1))
    assert applied == [1]
    assert _view(spark, mat) == scratch() == {"a": (1, 9.0), "b": (2, 5.0)}

    t.overwrite(spark.createDataFrame([(4, "b", 1.0)], S))  # del 1, del 3
    # overlapping re-pull: versions 1 AND 2 — v1 re-overwrites its run
    applied = mat.apply_change_feed(t.change_feed(["id"], 1))
    assert applied == [1, 2]
    assert _view(spark, mat) == scratch() == {"b": (1, 1.0)}
    # fully-retracted group "a" is gone, and a second overlapping
    # re-apply is still a no-op
    mat.apply_change_feed(t.change_feed(["id"], 2))
    assert _view(spark, mat) == scratch()


def test_sync_pulls_only_unapplied_versions(spark, tmp_path):
    """sync() packages the polling loop: applied versions come from the
    view's own run partitions, the window from the table's history, and
    only the missing commits are pulled (zero joins on a cdf_keys
    table) — idempotent, crash-resumable, empty when current."""
    from dataeng_azure_spotify_spark.streaming.gold import (
        ParquetSnapshotTable,
    )

    S = "id long, k string, v double"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    mat = MaterializedAggregate(
        str(tmp_path / "state"), keys=["k"], sums={"total": "v"}
    )

    def scratch():
        return {
            (r["k"]): (r["n"], float(r["s"]))
            for r in t.read()
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(18,4)")).alias("s"),
            )
            .collect()
        }

    t.overwrite(spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", 2.0), (3, "b", 4.0)], S))
    mat.apply_delta(t.read_version(0), run_id="cdf-v0")  # seed from v0
    assert mat.sync(spark, t) == []  # nothing past the initial snapshot

    t.overwrite(spark.createDataFrame(
        [(1, "a", 9.0), (3, "b", 4.0), (4, "b", 1.0)], S))
    t.overwrite(spark.createDataFrame([(4, "b", 1.0)], S))
    assert mat.sync(spark, t) == [1, 2]  # both pulled in one call
    assert _view(spark, mat) == scratch() == {"b": (1, 1.0)}
    assert mat.sync(spark, t) == []  # already current
    t.overwrite(spark.createDataFrame([(4, "b", 2.0), (5, "a", 3.0)], S))
    assert mat.sync(spark, t) == [3]  # only the new commit
    assert _view(spark, mat) == scratch() == {"a": (1, 3.0), "b": (1, 2.0)}
    # keyless tables need explicit key_cols
    bare = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="key_cols"):
        mat.sync(spark, bare)


def test_sync_rederives_crashed_partial(spark, tmp_path):
    """ADVICE r11: a crash mid apply_delta leaves a run=cdf-vN
    directory WITHOUT Spark's _SUCCESS marker — sync() must treat it
    as unapplied and re-derive it, not skip the version forever."""
    import os

    from dataeng_azure_spotify_spark.streaming.gold import (
        ParquetSnapshotTable,
    )

    S = "id long, k string, v double"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    mat = MaterializedAggregate(
        str(tmp_path / "state"), keys=["k"], sums={"total": "v"}
    )
    t.overwrite(spark.createDataFrame([(1, "a", 1.0)], S))
    mat.apply_delta(t.read_version(0), run_id="cdf-v0")
    t.overwrite(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], S))
    assert mat.sync(spark, t) == [1]

    t.overwrite(spark.createDataFrame([(2, "b", 5.0)], S))
    # simulate a crash mid-apply of v2: uncommitted (no _SUCCESS)
    # partial directory exists, marker still at 1
    os.makedirs(os.path.join(str(tmp_path / "state"), "run=cdf-v2"))
    with open(mat._marker_path(), "w") as f:
        f.write("1")
    assert mat.sync(spark, t) == [2]  # re-derived, not skipped
    assert _view(spark, mat) == {"b": (1, 5.0)}
    assert mat.sync(spark, t) == []


def test_sync_after_compact_does_not_double_count(spark, tmp_path):
    """compact() folds the run=cdf-vN partitions into one baseline —
    without the _synced_upto marker surviving it, the next sync()
    would re-pull every commit ON TOP of the baseline and double-count
    (latent r11 bug, found while fixing the _SUCCESS gating)."""
    from dataeng_azure_spotify_spark.streaming.gold import (
        ParquetSnapshotTable,
    )

    S = "id long, k string, v double"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    mat = MaterializedAggregate(
        str(tmp_path / "state"), keys=["k"], sums={"total": "v"}
    )
    t.overwrite(spark.createDataFrame([(1, "a", 1.0)], S))
    mat.apply_delta(t.read_version(0), run_id="cdf-v0")
    t.overwrite(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], S))
    t.overwrite(spark.createDataFrame([(1, "a", 4.0), (2, "b", 2.0)], S))
    assert mat.sync(spark, t) == [1, 2]
    before = _view(spark, mat)
    mat.compact(spark)
    assert _view(spark, mat) == before
    assert mat.sync(spark, t) == []  # marker survived the fold
    assert _view(spark, mat) == before
    t.overwrite(spark.createDataFrame([(2, "b", 9.0)], S))
    assert mat.sync(spark, t) == [3]  # only the new commit
    assert _view(spark, mat) == {"b": (1, 9.0)}


def test_compact_drops_crashed_partial_and_keeps_gap_rederivable(
    spark, tmp_path
):
    """ADVICE r12: compact() must not (a) fold a crashed
    (_SUCCESS-less) run partial's task-committed fragments into the
    baseline, nor (b) advance the marker past the crashed version —
    either way sync() would re-derive the gap on top of data already
    baked in, silently double-counting."""
    import os
    import shutil

    from dataeng_azure_spotify_spark.streaming.gold import (
        ParquetSnapshotTable,
    )

    S = "id long, k string, v double"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    mat = MaterializedAggregate(
        str(tmp_path / "state"), keys=["k"], sums={"total": "v"}
    )
    t.overwrite(spark.createDataFrame([(1, "a", 1.0)], S))
    mat.apply_delta(t.read_version(0), run_id="cdf-v0")
    t.overwrite(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], S))
    t.overwrite(spark.createDataFrame([(2, "b", 5.0)], S))
    assert mat.sync(spark, t) == [1, 2]
    # simulate a crash mid-apply of v2: the partial's data files were
    # task-committed but the job never wrote _SUCCESS
    os.remove(os.path.join(str(tmp_path / "state"), "run=cdf-v2", "_SUCCESS"))
    with open(mat._marker_path(), "w") as f:
        f.write("1")  # marker never reached v2 either
    mat.compact(spark)
    # the crashed fragments were dropped, the marker stayed at the
    # contiguous committed prefix (1), and sync re-derives v2 exactly
    # once — the view equals from-scratch
    assert mat.sync(spark, t) == [2]
    assert _view(spark, mat) == {"b": (1, 5.0)}

    # committed versions stranded ABOVE an uncommitted gap refuse the
    # compact loudly: folding them would double-count once sync
    # re-pulls the gap
    t.overwrite(spark.createDataFrame([(2, "b", 7.0)], S))
    assert mat.sync(spark, t) == [3]
    shutil.rmtree(os.path.join(str(tmp_path / "state"), "run=cdf-v2"),
                  ignore_errors=True)  # damaged/uncommitted gap at v2...
    os.makedirs(os.path.join(str(tmp_path / "state"), "run=cdf-v2"))
    with open(mat._marker_path(), "w") as f:
        f.write("1")  # ...with committed v3 above it
    with pytest.raises(ValueError, match="above the uncommitted gap"):
        mat.compact(spark)


def test_apply_delta_names_missing_columns(spark, tmp_path):
    mat = MaterializedAggregate(
        str(tmp_path / "state"), keys=["k"], sums={"total": "v"}
    )
    with pytest.raises(ValueError, match="lacks column"):
        mat.apply_delta(
            spark.createDataFrame([("a",)], "k string"), run_id="r0"
        )


def test_sync_marker_advances_on_noop_and_direct_feed_paths(spark, tmp_path):
    """Review r12: the marker must advance even when sync() has
    nothing to pull (crash between a prior apply and its marker
    write), and compact() must derive it from the committed run
    partitions when the view was maintained via apply_change_feed
    directly — both otherwise reopen the compact-then-double-count
    window."""
    import os

    from dataeng_azure_spotify_spark.streaming.gold import (
        ParquetSnapshotTable,
    )

    S = "id long, k string, v double"
    # path 1: sync, crash before marker write (simulated by deleting
    # the marker), re-sync -> [] but marker recreated; compact safe
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    mat = MaterializedAggregate(
        str(tmp_path / "s1"), keys=["k"], sums={"total": "v"}
    )
    t.overwrite(spark.createDataFrame([(1, "a", 1.0)], S))
    mat.apply_delta(t.read_version(0), run_id="cdf-v0")
    t.overwrite(spark.createDataFrame([(1, "a", 2.0)], S))
    assert mat.sync(spark, t) == [1]
    os.remove(mat._marker_path())  # crash-between-apply-and-marker
    assert mat.sync(spark, t) == []
    assert os.path.exists(mat._marker_path())  # marker recovered
    before = _view(spark, mat)
    mat.compact(spark)
    assert mat.sync(spark, t) == []
    assert _view(spark, mat) == before

    # path 2: apply_change_feed directly (no sync, no marker), then
    # compact -> marker derived from the folded run partitions
    mat2 = MaterializedAggregate(
        str(tmp_path / "s2"), keys=["k"], sums={"total": "v"}
    )
    mat2.apply_delta(t.read_version(0), run_id="cdf-v0")
    mat2.apply_change_feed(t.change_feed(["id"], 1))
    mat2.compact(spark)
    assert mat2.sync(spark, t) == []  # folded v1 not re-pulled
    assert _view(spark, mat2) == before


def test_sync_empty_change_window_writes_marker_without_state_crash(
    spark, tmp_path
):
    """Review r12: a no-op commit yields an EMPTY change window —
    apply_change_feed writes no run partition, so the marker write
    must create the state dir itself instead of crashing."""
    from dataeng_azure_spotify_spark.streaming.gold import (
        ParquetSnapshotTable,
    )

    S = "id long, k string, v double"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    rows = [(1, "a", 1.0)]
    t.overwrite(spark.createDataFrame(rows, S))
    t.overwrite(spark.createDataFrame(rows, S))  # v1: no-op commit
    mat = MaterializedAggregate(
        str(tmp_path / "view"), keys=["k"], sums={"total": "v"}
    )
    assert mat.sync(spark, t) == []  # empty window, no crash
    # marker recorded the scanned-through version; a later sync after
    # a REAL commit pulls only that commit
    t.overwrite(spark.createDataFrame([(1, "a", 5.0)], S))
    mat.apply_delta(t.read_version(0), run_id="seed")
    assert mat.sync(spark, t) == [2]
