"""As-of join semantics: inclusive bound, no-prior-row NULLs, same-ts
tiebreak, and independence across keys."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from dataeng_azure_spotify_spark.operators.asof import asof_join


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(id=1, k=1, ts=_t(9)),    # before any right row -> NULL
            Row(id=2, k=1, ts=_t(10)),   # exactly at right ts -> inclusive
            Row(id=3, k=1, ts=_t(11)),   # between -> latest prior
            Row(id=4, k=2, ts=_t(12)),   # other key, no right rows -> NULL
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_t(10), px=100.0),
            Row(k=1, ts=_t(10, 30), px=200.0),
        ]
    )
    out = {
        r.id: r.px
        for r in asof_join(
            left, right, on=["k"], left_time="ts", right_time="ts",
            payload_cols=["px"],
        ).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 200.0, 4: None}


def test_asof_join_same_instant_tiebreak(spark):
    left = spark.createDataFrame([Row(id=1, k=1, ts=_t(10))])
    right = spark.createDataFrame(
        [Row(k=1, ts=_t(10), seq=1, px=1.0), Row(k=1, ts=_t(10), seq=2, px=2.0)]
    )
    out = asof_join(
        left, right, on=["k"], left_time="ts", right_time="ts",
        payload_cols=["px"], right_seq_tiebreakers=["seq"],
    ).collect()
    assert out[0].px == 2.0  # highest-seq right row at the instant wins


def test_asof_join_rejects_column_clash(spark):
    import pytest

    left = spark.createDataFrame([Row(id=1, k=1, ts=_t(10), px=0.0)])
    right = spark.createDataFrame([Row(k=1, ts=_t(9), px=1.0)])
    with pytest.raises(ValueError, match="clash"):
        asof_join(left, right, on=["k"], left_time="ts", right_time="ts",
                  payload_cols=["px"])


def test_range_join_containment_and_open_intervals(spark):
    from dataeng_azure_spotify_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [
            Row(id=1, k=1, ts=_t(9, 30)),    # inside [9, 10)
            Row(id=2, k=1, ts=_t(10)),       # boundary: starts [10, ∞)
            Row(id=3, k=1, ts=_t(8)),        # before all intervals
            Row(id=4, k=2, ts=_t(9, 30)),    # other key
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, s=_t(9), e=_t(10), tag="early"),
            Row(k=1, s=_t(10), e=None, tag="open"),
            Row(k=2, s=_t(9), e=_t(11), tag="other"),
        ]
    )
    inner = {
        (r.id, r.tag)
        for r in range_join(
            left, right, on=["k"], left_time="ts",
            right_start="s", right_end="e", bin_seconds=1800,
        ).collect()
    }
    assert inner == {(1, "early"), (2, "open"), (4, "other")}

    left_join = {
        (r.id, r.tag)
        for r in range_join(
            left, right, on=["k"], left_time="ts",
            right_start="s", right_end="e", bin_seconds=1800, how="left",
        ).collect()
    }
    assert left_join == inner | {(3, None)}


def test_range_join_left_null_columns_and_duplicates(spark):
    """Matched left rows containing NULLs must NOT re-emit as unmatched
    (the anti branch joins on a generated row id, not null-unsafe column
    equality), and duplicate left rows each keep their own match row."""
    from dataeng_azure_spotify_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [
            Row(id=None, k=1, ts=_t(9, 30)),   # NULL col, matched
            Row(id=7, k=1, ts=_t(9, 30)),      # dup pair: both matched
            Row(id=7, k=1, ts=_t(9, 30)),
            Row(id=None, k=1, ts=_t(8)),       # NULL col, unmatched
        ]
    )
    right = spark.createDataFrame([Row(k=1, s=_t(9), e=_t(10), tag="w")])
    rows = range_join(
        left, right, on=["k"], left_time="ts",
        right_start="s", right_end="e", bin_seconds=1800, how="left",
    ).collect()
    assert len(rows) == 4
    assert sum(1 for r in rows if r.tag == "w") == 3
    assert sum(1 for r in rows if r.tag is None and r.id is None) == 1

    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        range_join(left, right, on=["k"], left_time="ts",
                   right_start="s", right_end="e", how="full")


def test_asof_join_matches_naive_definition_randomized(spark):
    """Property: asof_join == per-row argmax over right rows with
    right_ts <= left_ts (computed in plain Python)."""
    import itertools
    import random

    rng = random.Random(7)
    for trial in range(5):
        lrows = [
            (i, rng.randint(1, 3), _t(rng.randint(1, 23)))
            for i in range(rng.randint(1, 8))
        ]
        rrows = [
            (rng.randint(1, 3), _t(rng.randint(1, 23)), float(j))
            for j in range(rng.randint(0, 8))
        ]
        left = spark.createDataFrame(lrows, "id int, k int, ts timestamp")
        right = spark.createDataFrame(rrows, "k int, ts timestamp, px double")

        def naive(i, k, ts):
            cands = [(rts, px) for rk, rts, px in rrows if rk == k and rts <= ts]
            if not cands:
                return None
            best_ts = max(c[0] for c in cands)
            # same-instant tiebreak: max px stands in for max seq here
            return max(px for rts, px in cands if rts == best_ts)

        expected = {(i, naive(i, k, ts)) for i, k, ts in lrows}
        # use px itself as the seq tiebreaker to make ties deterministic
        got = {
            (r.id, r.px)
            for r in asof_join(
                left, right.withColumn("seq", right["px"]),
                on=["k"], left_time="ts", right_time="ts",
                payload_cols=["px"], right_seq_tiebreakers=["seq"],
            ).collect()
        }
        assert got == expected, f"trial {trial}: {got} != {expected}"


def test_interval_join_window_semantics(spark):
    import datetime as dt

    from dataeng_azure_spotify_spark.operators.asof import interval_join

    base = dt.datetime(2024, 5, 1, 12, 0, 0)

    def t(seconds):
        return base + dt.timedelta(seconds=seconds)

    views = spark.createDataFrame(
        [(1, 100, t(0)), (2, 100, t(1000)), (3, 200, t(0))],
        "view_id long, user_id long, view_ts timestamp",
    )
    clicks = spark.createDataFrame(
        [
            (10, 100, t(0)),     # exactly at view 1: EXCLUDED (lower open)
            (11, 100, t(300)),   # within 600s of view 1
            (12, 100, t(600)),   # exactly at +600: INCLUDED (upper closed)
            (13, 100, t(601)),   # just past: excluded
            (14, 200, t(599)),   # other user, within view 3's window
            (15, 999, t(10)),    # no matching view user
        ],
        "click_id long, user_id long, click_ts timestamp",
    )
    out = interval_join(views, clicks, ["user_id"], "view_ts", "click_ts", 0, 600)
    got = {(r.view_id, r.click_id) for r in out.collect()}
    # view 1 (0,600]: clicks 11, 12 (600 inclusive; 0 excluded; 601 out)
    # view 2 (1000,1600]: none; view 3 (user 200): click 14
    assert got == {(1, 11), (1, 12), (3, 14)}


def test_interval_join_ntz_immune_to_session_dst(spark):
    """NTZ timestamps straddling a spring-forward gap: the wall-clock
    gap is 66 min (> 600 s window) and must NOT join, even with the
    session zone set to one where a naive cast would compress the
    nonexistent 02:00-03:00 hour into a 6-min absolute gap."""
    import datetime as dt

    from dataeng_azure_spotify_spark.operators.asof import interval_join

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        views = spark.createDataFrame(
            [(1, 100, dt.datetime(2024, 3, 10, 1, 59, 0))],
            "view_id long, user_id long, view_ts timestamp_ntz",
        )
        clicks = spark.createDataFrame(
            [(10, 100, dt.datetime(2024, 3, 10, 3, 5, 0))],
            "click_id long, user_id long, click_ts timestamp_ntz",
        )
        out = interval_join(
            views, clicks, ["user_id"], "view_ts", "click_ts", 0, 600
        )
        assert out.count() == 0
        # and a genuinely-in-window NTZ pair still joins under the same tz
        clicks2 = spark.createDataFrame(
            [(11, 100, dt.datetime(2024, 3, 10, 2, 4, 0))],
            "click_id long, user_id long, click_ts timestamp_ntz",
        )
        assert interval_join(
            views, clicks2, ["user_id"], "view_ts", "click_ts", 0, 600
        ).count() == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_range_join_left_id_col_skips_checkpoint_and_matches(spark, tmp_path):
    """The caller-supplied unique-id path must produce the same result
    as the generated-id path, with no lineage truncation (no RDD scan
    in the plan — the whole point is that the fact side is never pinned
    to executor-local storage). Inputs go through parquet so the only
    possible RDD scan would be a checkpoint, not the fixture itself."""
    from dataeng_azure_spotify_spark.operators.asof import range_join

    spark.createDataFrame(
        [
            Row(id=1, k=1, ts=_t(9, 30)),
            Row(id=2, k=1, ts=_t(8)),       # unmatched
            Row(id=3, k=2, ts=_t(9, 30)),   # wrong key, unmatched
        ]
    ).write.parquet(str(tmp_path / "l"))
    spark.createDataFrame(
        [Row(k=1, s=_t(9), e=_t(10), tag="w")]
    ).write.parquet(str(tmp_path / "r"))
    left = spark.read.parquet(str(tmp_path / "l"))
    right = spark.read.parquet(str(tmp_path / "r"))
    kw = dict(on=["k"], left_time="ts", right_start="s", right_end="e",
              bin_seconds=1800, how="left")
    got = range_join(left, right, left_id_col="id", **kw)
    want = {(r.id, r.tag) for r in range_join(left, right, **kw).collect()}
    assert {(r.id, r.tag) for r in got.collect()} == want == {
        (1, "w"), (2, None), (3, None)
    }
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan and "LogicalRDD" not in plan


def test_range_join_left_id_col_null_id_not_duplicated(spark):
    """A NULL id on a MATCHED left row must not re-emit as unmatched —
    the anti-join is null-safe (NULL behaves like a value; uniqueness
    of ids, including at most one NULL, is the caller's contract)."""
    from dataeng_azure_spotify_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [Row(id=None, k=1, ts=_t(9, 30)), Row(id=5, k=1, ts=_t(8))]
    )
    right = spark.createDataFrame([Row(k=1, s=_t(9), e=_t(10), tag="w")])
    rows = range_join(
        left, right, on=["k"], left_time="ts", right_start="s",
        right_end="e", bin_seconds=1800, how="left", left_id_col="id",
    ).collect()
    assert len(rows) == 2
    assert {(r.id, r.tag) for r in rows} == {(None, "w"), (5, None)}


def test_range_join_left_id_col_validation(spark):
    from dataeng_azure_spotify_spark.operators.asof import range_join
    import pytest

    left = spark.createDataFrame([Row(id=1, k=1, ts=_t(9, 30))])
    right = spark.createDataFrame([Row(k=1, s=_t(9), e=_t(10), id=9)])
    with pytest.raises(ValueError, match="not a left column"):
        range_join(left, right, on=["k"], left_time="ts", right_start="s",
                   right_end="e", how="left", left_id_col="missing")
    with pytest.raises(ValueError, match="also exists on the right"):
        range_join(left, right, on=["k"], left_time="ts", right_start="s",
                   right_end="e", how="left", left_id_col="id")
