from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from dataeng_azure_spotify_spark.operators.relational import (
    bucketize,
    constant_inject,
    drop_columns,
    expectations_drop,
    latest_per_key,
    non_empty,
    scalar_max,
    watermark_filter,
)


def _events(spark):
    rows = [
        Row(id=1, k="a", seq=dt.datetime(2024, 1, 1), v=10),
        Row(id=2, k="a", seq=dt.datetime(2024, 1, 3), v=20),
        Row(id=3, k="b", seq=dt.datetime(2024, 1, 2), v=30),
        Row(id=4, k="b", seq=dt.datetime(2024, 1, 2), v=40),
    ]
    return spark.createDataFrame(rows)


def test_drop_columns(spark):
    df = _events(spark)
    assert drop_columns(df, ["v", "seq"]).columns == ["id", "k"]


def test_watermark_filter(spark):
    df = _events(spark)
    out = watermark_filter(df, "seq", dt.datetime(2024, 1, 1)).collect()
    assert sorted(r.id for r in out) == [2, 3, 4]


def test_bucketize_bounds():
    pass  # covered end-to-end by parity test bucketize_case_when


def test_bucketize(spark):
    df = _events(spark)
    out = bucketize(df, "v", "flag", [(15, "low"), (35, "medium")], "high")
    got = {r.id: r.flag for r in out.collect()}
    assert got == {1: "low", 2: "medium", 3: "medium", 4: "high"}


def test_constant_inject(spark):
    out = constant_inject(_events(spark), "cdc", "x").select("cdc").distinct().collect()
    assert [r.cdc for r in out] == ["x"]


def test_expectations_drop_all_rules(spark):
    df = _events(spark)
    out = expectations_drop(df, {"r1": "v > 10", "r2": "k = 'a'"})
    assert [r.id for r in out.collect()] == [2]


def test_expectations_observe_metrics(spark):
    df = _events(spark)
    out = expectations_drop(df, {"r1": "v > 10"}, observe_name="exp")
    assert out.count() == 3  # metrics attached without changing semantics


def test_latest_per_key_deterministic_tiebreak(spark):
    df = _events(spark)
    out = latest_per_key(df, ["k"], "seq", tiebreakers=["id"]).collect()
    got = {r.k: r.id for r in out}
    # key b has two rows with equal seq → highest id wins (total order)
    assert got == {"a": 2, "b": 4}


def test_scalar_max(spark):
    df = _events(spark)
    assert scalar_max(df, "seq").first()["cdc"] == dt.datetime(2024, 1, 3)


def test_non_empty(spark):
    df = _events(spark)
    assert non_empty(df) is True
    assert non_empty(df.filter("v > 100")) is False
