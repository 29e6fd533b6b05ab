"""Connected-components operator: label propagation fixpoint semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.operators.graph import (
    component_sizes,
    connected_components,
)


def _labels(df):
    return {r.node: r.component for r in df.collect()}


def test_two_components_and_isolated_node(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "node long")
    out = connected_components(edges, nodes=nodes)
    assert _labels(out) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_chain_converges_to_min_id(spark):
    # a 12-node chain: diameter 11, needs several propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    out = connected_components(edges)
    assert set(_labels(out).values()) == {0}


def test_orientation_and_duplicates_ignored(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (3, 3)], "src long, dst long"
    )
    out = connected_components(edges)
    assert _labels(out) == {1: 1, 2: 1, 3: 1}


def test_component_sizes(spark):
    edges = spark.createDataFrame([(1, 2), (4, 5), (5, 6)], "src long, dst long")
    out = component_sizes(connected_components(edges))
    got = {(r.node, r.component, r.size) for r in out.collect()}
    assert got == {(1, 1, 2), (2, 1, 2), (4, 4, 3), (5, 4, 3), (6, 4, 3)}


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=2)
