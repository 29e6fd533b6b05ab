"""SCD1/SCD2 hard cases (SURVEY.md §7 M4): out-of-order sequence_by,
multiple changes per key in one batch, ties, null keys, re-delivery."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from dataeng_azure_spotify_spark.operators.scd import (
    CURRENT_COL,
    END_COL,
    START_COL,
    apply_scd1,
    apply_scd2,
    scd2_from_history,
)


def _t(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _rows(spark, rows):
    return spark.createDataFrame(rows)


def test_scd1_basic_upsert(spark):
    target = _rows(spark, [Row(k=1, v="a", seq=_t(1), id=1), Row(k=2, v="b", seq=_t(1), id=2)])
    updates = _rows(spark, [Row(k=1, v="a2", seq=_t(2), id=3), Row(k=3, v="c", seq=_t(1), id=4)])
    out = {r.k: r.v for r in apply_scd1(target, updates, ["k"], "seq", ["id"]).collect()}
    assert out == {1: "a2", 2: "b", 3: "c"}


def test_scd1_stale_update_ignored(spark):
    target = _rows(spark, [Row(k=1, v="new", seq=_t(5), id=1)])
    updates = _rows(spark, [Row(k=1, v="old", seq=_t(2), id=2)])
    out = apply_scd1(target, updates, ["k"], "seq", ["id"]).collect()
    assert out[0].v == "new"


def test_scd1_equal_seq_update_wins(spark):
    # Delta merge condition is s.seq >= t.seq → update replaces on tie.
    target = _rows(spark, [Row(k=1, v="t", seq=_t(3), id=9)])
    updates = _rows(spark, [Row(k=1, v="u", seq=_t(3), id=9)])
    out = apply_scd1(target, updates, ["k"], "seq", ["id"]).collect()
    assert out[0].v == "u"


def test_scd1_multi_change_batch_keeps_latest(spark):
    updates = _rows(
        spark,
        [Row(k=1, v="x1", seq=_t(1), id=1), Row(k=1, v="x3", seq=_t(3), id=3),
         Row(k=1, v="x2", seq=_t(2), id=2)],
    )
    out = apply_scd1(None, updates, ["k"], "seq", ["id"]).collect()
    assert len(out) == 1 and out[0].v == "x3"


def test_scd2_full_history_intervals(spark):
    changes = _rows(
        spark,
        [Row(k=1, v="a", seq=_t(1), id=1), Row(k=1, v="b", seq=_t(3), id=2),
         Row(k=2, v="z", seq=_t(2), id=3)],
    )
    out = scd2_from_history(changes, ["k"], "seq", ["id"]).collect()
    by = {(r.k, r.v): r for r in out}
    assert by[(1, "a")][START_COL] == _t(1) and by[(1, "a")][END_COL] == _t(3)
    assert by[(1, "b")][END_COL] is None and by[(1, "b")][CURRENT_COL]
    assert by[(2, "z")][END_COL] is None


def test_scd2_out_of_order_sequence(spark):
    # late-arriving middle version still lands in the right interval
    changes = _rows(
        spark,
        [Row(k=1, v="v3", seq=_t(5), id=3), Row(k=1, v="v1", seq=_t(1), id=1),
         Row(k=1, v="v2", seq=_t(3), id=2)],
    )
    out = {r.v: r for r in scd2_from_history(changes, ["k"], "seq", ["id"]).collect()}
    assert out["v1"][END_COL] == _t(3)
    assert out["v2"][END_COL] == _t(5)
    assert out["v3"][END_COL] is None


def test_scd2_incremental_equals_full_rebuild(spark):
    all_changes = [
        Row(k=1, v="a", seq=_t(1), id=1), Row(k=1, v="b", seq=_t(4), id=2),
        Row(k=2, v="p", seq=_t(2), id=3), Row(k=2, v="q", seq=_t(6), id=4),
        Row(k=3, v="s", seq=_t(3), id=5),
    ]
    first, second = all_changes[:3], all_changes[3:]
    target = scd2_from_history(_rows(spark, first), ["k"], "seq", ["id"])
    merged = apply_scd2(target, _rows(spark, second), ["k"], "seq", ["id"])
    full = scd2_from_history(_rows(spark, all_changes), ["k"], "seq", ["id"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_scd2_incremental_late_arrival_rewrites_history(spark):
    target = scd2_from_history(
        _rows(spark, [Row(k=1, v="a", seq=_t(1), id=1), Row(k=1, v="c", seq=_t(9), id=2)]),
        ["k"], "seq", ["id"],
    )
    late = _rows(spark, [Row(k=1, v="b", seq=_t(5), id=3)])
    out = {r.v: r for r in apply_scd2(target, late, ["k"], "seq", ["id"]).collect()}
    assert out["a"][END_COL] == _t(5)
    assert out["b"][END_COL] == _t(9)
    assert out["c"][END_COL] is None


def test_scd2_drop_unchanged_suppresses_noop_versions(spark):
    changes = _rows(
        spark,
        [Row(k=1, v="a", seq=_t(1), id=1), Row(k=1, v="a", seq=_t(2), id=2),
         Row(k=1, v="b", seq=_t(3), id=3)],
    )
    out = scd2_from_history(
        changes, ["k"], "seq", ["id"], drop_unchanged=True, tracked_cols=["v"]
    ).collect()
    assert len(out) == 2  # the repeated 'a' created no version
    by = {r.v: r for r in out}
    assert by["a"][END_COL] == _t(3)


def test_scd2_untouched_keys_pass_through(spark):
    target = scd2_from_history(
        _rows(spark, [Row(k=1, v="a", seq=_t(1), id=1), Row(k=2, v="z", seq=_t(1), id=2)]),
        ["k"], "seq", ["id"],
    )
    upd = _rows(spark, [Row(k=1, v="b", seq=_t(2), id=3)])
    out = apply_scd2(target, upd, ["k"], "seq", ["id"])
    k2 = [r for r in out.collect() if r.k == 2]
    assert len(k2) == 1 and k2[0].v == "z" and k2[0][CURRENT_COL]


def test_scd2_tracked_cols_ignores_untracked_churn(spark):
    """track_history_column_list parity: changes in untracked columns do
    not open new versions when drop_unchanged is on."""
    changes = _rows(
        spark,
        [
            Row(k=1, v="a", noise="x", seq=_t(1)),
            Row(k=1, v="a", noise="y", seq=_t(2)),  # only untracked col moved
            Row(k=1, v="b", noise="y", seq=_t(3)),  # tracked col moved
        ],
    )
    out = scd2_from_history(
        changes, ["k"], "seq", drop_unchanged=True, tracked_cols=["v"]
    ).orderBy("seq").collect()
    assert [r.v for r in out] == ["a", "b"]
    assert out[0][END_COL] == _t(3)  # closed by the *tracked* change


def test_cdc_flow_track_history_except(spark, tmp_path):
    from dataeng_azure_spotify_spark.streaming.gold import CdcFlow, ParquetSnapshotTable

    flow = CdcFlow(
        name="d", gold_base=str(tmp_path / "g"), keys=["k"], sequence_by="seq",
        scd_type=2, drop_unchanged=True, track_history_except=["noise"],
    )
    flow.merge_batch(spark, _rows(spark, [Row(k=1, v="a", noise="x", seq=_t(1))]))
    flow.merge_batch(spark, _rows(spark, [Row(k=1, v="a", noise="z", seq=_t(2))]))
    flow.merge_batch(spark, _rows(spark, [Row(k=1, v="b", noise="z", seq=_t(3))]))
    out = ParquetSnapshotTable(spark, str(tmp_path / "g")).read().orderBy("seq").collect()
    assert [r.v for r in out] == ["a", "b"]  # noise-only change suppressed
