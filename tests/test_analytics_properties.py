"""Property tests for the event-analytics operators: invariants that
must hold for ANY event log, not just the fixtures — funnel count
monotonicity and permutation invariance, gap-fill spine completeness,
and transition-count mass conservation."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, functions as F

from dataeng_azure_spotify_spark.operators.analytics import (
    funnel,
    funnel_one_pass,
    gap_fill,
)

pytestmark = pytest.mark.slow

_BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),            # user
        st.integers(min_value=0, max_value=3_000_000),    # seconds offset
        st.sampled_from(["view", "click", "purchase", "other"]),
        st.floats(min_value=0.0, max_value=99.0, width=32),
    ),
    min_size=1,
    max_size=60,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                user_id=u,
                ts=_BASE + dt.timedelta(seconds=s),
                event_type=et,
                value=float(round(v, 2)),
            )
            for (u, s, et, v) in rows
        ],
        "user_id long, ts timestamp, event_type string, value double",
    )


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=events_strategy)
def test_funnel_counts_monotone_and_variants_agree(spark, rows):
    ev = _df(spark, rows)
    steps = ["view", "click", "purchase"]
    a = {r["step_idx"]: r["n_users"] for r in funnel(ev, steps).collect()}
    b = {r["step_idx"]: r["n_users"] for r in funnel_one_pass(ev, steps).collect()}
    assert a == b  # join-based and one-pass plans agree on any input
    # funnel counts never increase with depth
    assert a[1] >= a[2] >= a[3] >= 0


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=events_strategy, seed=st.integers(min_value=0, max_value=9))
def test_funnel_is_row_order_invariant(spark, rows, seed):
    import random

    ev = _df(spark, rows)
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    ev2 = _df(spark, shuffled).repartition(5)
    a = sorted(map(tuple, funnel_one_pass(ev, ["view", "click"]).collect()))
    b = sorted(map(tuple, funnel_one_pass(ev2, ["view", "click"]).collect()))
    assert a == b


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=events_strategy)
def test_gap_fill_spine_is_complete_and_counts_conserve(spark, rows):
    ev = _df(spark, rows)
    out = gap_fill(ev).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        days = sorted(r["day"] for r in rs)
        # spine has EVERY day between the key's min and max, exactly once
        assert len(days) == (days[-1] - days[0]).days + 1
        assert len(set(days)) == len(days)
        # zero-filled days never carry events; totals conserve mass
        assert sum(r["n_events"] for r in rs) == sum(
            1 for (u, _, _, _) in rows if u == k
        )
        # forward fill: value_filled is non-null from the first day on
        first = min(days)
        assert all(
            r["value_filled"] is not None for r in rs if r["day"] >= first
        )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=events_strategy)
def test_event_transitions_mass_conservation(spark, rows):
    from pyspark.sql import Window

    ev = _df(spark, rows).withColumn(
        "event_id", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .count()
    )
    total_transitions = trans.agg(F.coalesce(F.sum("count"), F.lit(0))).collect()[0][0]
    n_users = len({u for (u, _, _, _) in rows})
    # per key: transitions = events - 1
    assert total_transitions == len(rows) - n_users
