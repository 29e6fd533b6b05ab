"""Event-analytics operators: funnel ordering semantics, cohort offsets,
anomaly-flag edges, and gap-fill spine/fill behavior."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from dataeng_azure_spotify_spark.operators.analytics import (
    cohort_retention,
    daily_metric_anomalies,
    funnel,
    gap_fill,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def ev(spark):
    rows = [
        # u1 completes view -> click -> purchase in order
        Row(user_id=1, ts=_ts("2024-01-01 10:00:00"), event_type="view", value=1.0),
        Row(user_id=1, ts=_ts("2024-01-01 11:00:00"), event_type="click", value=2.0),
        Row(user_id=1, ts=_ts("2024-01-02 09:00:00"), event_type="purchase", value=9.5),
        # u2 clicks BEFORE viewing: click must not count (no later click)
        Row(user_id=2, ts=_ts("2024-01-01 08:00:00"), event_type="click", value=1.0),
        Row(user_id=2, ts=_ts("2024-01-01 09:00:00"), event_type="view", value=1.0),
        # u3 views only
        Row(user_id=3, ts=_ts("2024-01-03 10:00:00"), event_type="view", value=4.0),
    ]
    return spark.createDataFrame(rows)


def test_funnel_enforces_step_order(ev):
    out = {r["step"]: r["n_users"] for r in funnel(
        ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_same_timestamp_not_counted(spark):
    # step 2 must be STRICTLY after step 1 — equal timestamps don't count
    rows = [
        Row(user_id=1, ts=_ts("2024-01-01 10:00:00"), event_type="a", value=0.0),
        Row(user_id=1, ts=_ts("2024-01-01 10:00:00"), event_type="b", value=0.0),
    ]
    out = {r["step"]: r["n_users"] for r in funnel(
        spark.createDataFrame(rows), ["a", "b"]).collect()}
    assert out == {"a": 1, "b": 0}


def test_funnel_uses_earliest_qualifying_step_time(spark):
    # u1: a@10, b@11, a@12 — step b qualifies via the EARLIEST a (10:00),
    # and step c after b@11 counts even though the later a is at 12:00
    rows = [
        Row(user_id=1, ts=_ts("2024-01-01 10:00:00"), event_type="a", value=0.0),
        Row(user_id=1, ts=_ts("2024-01-01 11:00:00"), event_type="b", value=0.0),
        Row(user_id=1, ts=_ts("2024-01-01 12:00:00"), event_type="a", value=0.0),
        Row(user_id=1, ts=_ts("2024-01-01 13:00:00"), event_type="c", value=0.0),
    ]
    out = {r["step"]: r["n_users"] for r in funnel(
        spark.createDataFrame(rows), ["a", "b", "c"]).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}


def test_funnel_empty_steps_raises(ev):
    with pytest.raises(ValueError):
        funnel(ev, [])


def test_cohort_retention_offsets(spark):
    rows = [
        # u1 first active Mon Jan 1 week; active again Jan 10 (offset 1)
        Row(user_id=1, ts=_ts("2024-01-02 10:00:00")),
        Row(user_id=1, ts=_ts("2024-01-10 10:00:00")),
        # u2 first active week of Jan 8
        Row(user_id=2, ts=_ts("2024-01-10 12:00:00")),
    ]
    ev = spark.createDataFrame(rows).withColumn("event_type", F.lit("x"))
    out = {
        (r["cohort_week"].isoformat(), r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_metric_anomalies_flags_spike_and_skips_warmup(spark):
    days = [f"2024-01-{d:02d}" for d in range(1, 10)]
    vals = [10.0] * 8 + [100.0]  # flat baseline then a 10x spike
    # two values per day so stddev>0 needs the jitter below
    rows = []
    for day, v in zip(days, vals):
        rows.append(Row(event_type="m", ts=_ts(f"{day} 01:00:00"), value=v))
        rows.append(Row(event_type="m", ts=_ts(f"{day} 02:00:00"), value=v + day_jitter(day)))
    out = daily_metric_anomalies(
        spark.createDataFrame(rows), trailing_days=7, z_thresh=2.0
    ).orderBy("day").collect()
    # first day: no trailing data -> NULL z, not anomalous
    assert out[0]["z_score"] is None and out[0]["is_anomaly"] is False
    # spike day is flagged
    assert out[-1]["is_anomaly"] is True and abs(out[-1]["z_score"]) > 2.0
    # a mid-baseline day is not
    assert out[4]["is_anomaly"] is False


def day_jitter(day: str) -> float:
    # deterministic small per-day jitter so the trailing variance is > 0
    return (int(day[-2:]) % 3) * 0.5


def test_metric_anomalies_zero_variance_is_not_anomalous(spark):
    rows = [
        Row(event_type="m", ts=_ts(f"2024-01-{d:02d} 01:00:00"), value=5.0)
        for d in range(1, 6)
    ] + [Row(event_type="m", ts=_ts("2024-01-06 01:00:00"), value=50.0)]
    out = daily_metric_anomalies(spark.createDataFrame(rows)).orderBy("day").collect()
    # trailing window has zero variance -> NULL z, false flag (no div-by-0)
    assert out[-1]["z_score"] is None and out[-1]["is_anomaly"] is False


def test_gap_fill_zero_fills_and_forward_fills(spark):
    rows = [
        Row(user_id=1, ts=_ts("2024-01-01 10:00:00"), value=4.0),
        Row(user_id=1, ts=_ts("2024-01-01 11:00:00"), value=6.0),
        Row(user_id=1, ts=_ts("2024-01-04 10:00:00"), value=2.0),
        Row(user_id=2, ts=_ts("2024-01-02 10:00:00"), value=1.0),
    ]
    out = {
        (r["k"], r["day"].isoformat()): (r["n_events"], r["value_filled"])
        for r in gap_fill(spark.createDataFrame(rows)).collect()
    }
    assert out[(1, "2024-01-01")] == (2, 10.0)  # daily total
    assert out[(1, "2024-01-02")] == (0, 10.0)  # gap: zero count, ffill
    assert out[(1, "2024-01-03")] == (0, 10.0)
    assert out[(1, "2024-01-04")] == (1, 2.0)
    assert out[(2, "2024-01-02")] == (1, 1.0)  # single-day key: 1-row spine
    assert len(out) == 5


def test_funnel_plan_reuses_user_key_no_cartesian(ev):
    plan = funnel(
        ev, ["view", "click", "purchase"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_funnel_one_pass_matches_join_funnel(ev, spark):
    from dataeng_azure_spotify_spark.operators.analytics import funnel_one_pass

    a = sorted(map(tuple, funnel(ev, ["view", "click", "purchase"]).collect()))
    b = sorted(map(tuple, funnel_one_pass(ev, ["view", "click", "purchase"]).collect()))
    assert a == b
    # corpus-scale cross-check too
    docs = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    docs = docs.withColumn("ts", F.col("ts").cast("timestamp"))
    a = sorted(map(tuple, funnel(docs, ["view", "click", "purchase"]).collect()))
    b = sorted(map(tuple, funnel_one_pass(docs, ["view", "click", "purchase"]).collect()))
    assert a == b


def test_funnel_one_pass_no_cascade_on_equal_ts(spark):
    from pyspark.sql import Row

    from dataeng_azure_spotify_spark.operators.analytics import funnel_one_pass

    rows = [
        Row(user_id=1, ts=_ts("2024-01-01 10:00:00"), event_type="a", value=0.0),
        Row(user_id=1, ts=_ts("2024-01-01 10:00:00"), event_type="b", value=0.0),
    ]
    out = {r["step"]: r["n_users"] for r in funnel_one_pass(
        spark.createDataFrame(rows), ["a", "b"]).collect()}
    assert out == {"a": 1, "b": 0}


def test_funnel_one_pass_plan_single_scan_single_user_shuffle(spark):
    from dataeng_azure_spotify_spark.operators.analytics import funnel_one_pass

    docs = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = (
        funnel_one_pass(docs, ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("FileScan parquet") == 1
    # user-key exchange + the final scalar agg's single-partition
    # exchange - never one per step
    assert p.count("Exchange ") <= 2
    # the step-type filter must reach the scan
    assert "PushedFilters: [In(event_type" in p or "isin" in p.lower()


def test_funnel_one_pass_rejects_duplicate_steps(ev):
    import pytest as _pytest

    from dataeng_azure_spotify_spark.operators.analytics import funnel_one_pass

    with _pytest.raises(ValueError):
        funnel_one_pass(ev, ["a", "a"])
