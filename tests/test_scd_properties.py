"""Property-based SCD2 invariants (hypothesis) — the merge is the
engine's hardest piece (SURVEY.md §7 hardness ranking), so its contract
is checked over randomized change streams, not just hand-picked cases:

1. interval partition: per key, versions tile [first_seq, ∞) — each
   version's __END_AT equals the next version's __START_AT, exactly one
   open (__IS_CURRENT) row per key.
2. batch-split independence: folding the stream through apply_scd2 in
   ANY batch split (including out-of-order deliveries) equals the
   one-shot scd2_from_history rebuild.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from dataeng_azure_spotify_spark.operators.scd import (
    CURRENT_COL,
    END_COL,
    START_COL,
    apply_scd2,
    scd2_from_history,
)

# one change row: (key, day, value); (key, day) is unique per stream —
# the sequence column is the total order within a key
change_streams = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=1, max_value=9),
        st.sampled_from("abc"),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[1]),
)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, seq=dt.datetime(2024, 1, d)) for k, d, v in rows]
    )


def _canon(df):
    return {
        (r.k, r.v, r.seq, r[START_COL], r[END_COL], r[CURRENT_COL])
        for r in df.collect()
    }


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=change_streams)
def test_scd2_intervals_tile_per_key(spark, rows):
    out = scd2_from_history(_df(spark, rows), ["k"], "seq").collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    assert len(out) == len(rows)  # every change opens exactly one version
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r[START_COL])
        opens = [r for r in versions if r[CURRENT_COL]]
        assert len(opens) == 1 and opens[0] is versions[-1]
        for a, b in zip(versions, versions[1:]):
            assert a[END_COL] == b[START_COL]  # no gaps, no overlaps
        assert versions[-1][END_COL] is None
        for r in versions:
            assert r[START_COL] == r.seq


@pytest.mark.slow
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=change_streams, data=st.data())
def test_scd2_incremental_equals_rebuild_any_split(spark, rows, data):
    cut = data.draw(st.integers(min_value=0, max_value=len(rows)))
    shuffled = data.draw(st.permutations(rows))
    first, second = shuffled[:cut], shuffled[cut:]

    target = (
        scd2_from_history(_df(spark, first), ["k"], "seq") if first else None
    )
    merged = (
        apply_scd2(target, _df(spark, second), ["k"], "seq")
        if second
        else target
    )
    rebuilt = scd2_from_history(_df(spark, rows), ["k"], "seq")
    assert _canon(merged) == _canon(rebuilt)
