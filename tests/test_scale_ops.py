"""Scale-path operators: salted skew joins/aggregations and bucketed
co-located joins (task-brief scale requirements: "broadcast small dims,
bucketing for co-located joins, salting for skew")."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.catalog import Catalog
from dataeng_azure_spotify_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    # hot key 1 holds 90% of rows — the salting target
    left = spark.createDataFrame(
        [Row(k=1 if i % 10 else 2, v=i) for i in range(1000)]
    )
    right = spark.createDataFrame([Row(k=1, name="hot"), Row(k=2, name="cold")])
    plain = {(r.k, r.v, r.name) for r in left.join(right, "k").collect()}
    salted = {
        (r.k, r.v, r.name)
        for r in salted_join(left, right, ["k"], salt_buckets=8).collect()
    }
    assert salted == plain


def test_salted_join_left_outer_keeps_unmatched(spark):
    left = spark.createDataFrame([Row(k=1, v=1), Row(k=9, v=2)])
    right = spark.createDataFrame([Row(k=1, name="hit")])
    out = {
        (r.k, r.v, r.name)
        for r in salted_join(left, right, ["k"], salt_buckets=4, how="left").collect()
    }
    assert out == {(1, 1, "hit"), (9, 2, None)}


def test_salted_join_rejects_replication_breaking_join_types(spark):
    import pytest

    left = spark.createDataFrame([Row(k=1, v=1)])
    right = spark.createDataFrame([Row(k=1, name="hit")])
    for how in ("right", "full", "outer", "left_anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, ["k"], salt_buckets=4, how=how)


def test_salted_aggregate_matches_direct(spark):
    df = spark.createDataFrame(
        [Row(k=1 if i % 20 else 2, v=float(i)) for i in range(2000)]
    )
    direct = {
        (r.k, r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").cast("long").alias("s"))
        .collect()
    }
    two_stage = {
        (r.k, r.n, r.s)
        for r in salted_aggregate(
            df,
            ["k"],
            partial_aggs=[
                F.count(F.lit(1)).alias("pn"),
                F.sum("v").alias("ps"),
            ],
            aggs=[
                F.sum("pn").alias("n"),
                F.sum("ps").cast("long").alias("s"),
            ],
            salt_buckets=8,
        ).collect()
    }
    assert two_stage == direct


def test_bucketed_join_has_no_shuffle(spark):
    """The point of bucketing: a same-key bucketed⋈bucketed join plans
    without any Exchange (shuffle) operator."""
    cat = Catalog(spark, SF)
    li = cat["lineitem"].select("l_orderkey", "l_quantity")
    od = cat["orders"].select("o_orderkey", "o_totalprice")
    b_li = cat.write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8)
    b_od = cat.write_bucketed(od, "b_orders", ["o_orderkey"], num_buckets=8)

    joined = b_li.join(b_od, b_li["l_orderkey"] == b_od["o_orderkey"])
    # disable broadcast so the test exercises the co-located path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
