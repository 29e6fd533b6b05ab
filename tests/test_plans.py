"""Physical-plan regression tests: the scale contract of each operator
family, asserted on the optimized plan (task brief: "explain the plan and
iterate until it's the plan you'd want").

These lock in properties that silently regress otherwise: filters
reaching the parquet scan, column pruning, dims broadcasting instead of
shuffling the fact, and partial aggregation before the exchange.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    qs = entry.queries()
    return {name: _plan(qs[name](spark, SF)) for name in (
        "star_join_agg", "pricing_summary", "star_join_wide", "topk_per_group",
        "incremental_filter", "distinct_agg",
    )}


def test_pricing_filter_pushed_to_scan(plans):
    p = plans["pricing_summary"]
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_pricing_scan_prunes_columns(plans):
    p = plans["pricing_summary"]
    scan_schema = p.split("ReadSchema: ")[1].splitlines()[0]
    # 6 referenced columns out of 16 — pruning must reach the scan
    assert "l_orderkey" not in scan_schema and "l_comment" not in scan_schema
    assert "l_quantity" in scan_schema


def test_star_join_broadcasts_every_dim(plans):
    p = plans["star_join_wide"]
    # 6 dims -> 6 broadcast joins, and the fact side never shuffles:
    assert p.count("BroadcastHashJoin") == 6
    assert "SortMergeJoin" not in p


def test_star_agg_is_partial_then_final(plans):
    p = plans["star_join_agg"]
    assert p.count("HashAggregate") >= 2  # map-side partial + final


def test_topk_uses_window_group_limit(plans):
    # rank()<=k pushes a per-partition top-k below the shuffle
    assert "WindowGroupLimit" in plans["topk_per_group"]


def test_incremental_filter_evaluates_in_scan_stage(plans):
    """events.ts arrives as parquet TIMESTAMP(NANOS): the micros
    conversion makes the watermark predicate non-pushable to row-group
    stats (a foreign-file limitation — engine-written bronze is micros,
    where the same predicate lands in PushedFilters, see
    test_pricing_filter_pushed_to_scan). It must still evaluate inside
    the vectorized scan stage, not in a separate filter exchange."""
    p = plans["incremental_filter"]
    assert "DataFilters: [isnotnull(ts" in p
    assert "Exchange" not in p


def test_distinct_agg_expands_not_joins(plans):
    # multi-count-distinct should plan as Expand + aggregates, not a
    # self-join per distinct column
    p = plans["distinct_agg"]
    assert "Expand" in p and "Join" not in p
