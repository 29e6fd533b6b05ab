"""Data layout: partition-pruned reads, dynamic partition overwrite,
small-file compaction, and watermarked streaming window aggregation."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.sources.layout import (
    compact_partition,
    write_partitioned,
)


def _sales(spark, rows):
    return spark.createDataFrame([Row(day=d, region=r, amount=a) for d, r, a in rows])


def test_write_partitioned_prunes_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    write_partitioned(
        _sales(spark, [("d1", "eu", 1), ("d1", "us", 2), ("d2", "eu", 3)]),
        path,
        ["day"],
    )
    assert sorted(d for d in os.listdir(path) if d.startswith("day=")) == [
        "day=d1", "day=d2",
    ]
    pruned = spark.read.parquet(path).filter(F.col("day") == "d1")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    assert pruned.count() == 2


def test_dynamic_overwrite_touches_only_present_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    write_partitioned(
        _sales(spark, [("d1", "eu", 1), ("d2", "eu", 3)]), path, ["day"]
    )
    # backfill d2 only — d1 must survive
    write_partitioned(_sales(spark, [("d2", "us", 9)]), path, ["day"])
    out = {(r.day, r.region, r.amount) for r in spark.read.parquet(path).collect()}
    assert out == {("d1", "eu", 1), ("d2", "us", 9)}


def test_compact_partition_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(5):  # five appends -> >= 5 files
        _sales(spark, [("d1", "eu", i)]).coalesce(1).write.mode("append").parquet(path)
    df_before = {r.amount for r in spark.read.parquet(path).collect()}
    n_before = compact_partition(spark, path, target_files=1)
    assert n_before >= 5
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1
    assert {r.amount for r in spark.read.parquet(path).collect()} == df_before


def test_streaming_windowed_agg_with_watermark(spark, tmp_path):
    """§2.8 gap in streaming mode: watermarked tumbling-window counts over
    a file stream, append output emits only finalized windows."""
    src, out, chk = (str(tmp_path / d) for d in ("src", "out", "chk"))
    schema = "user_id long, ts timestamp"

    def write(rows):
        spark.createDataFrame(
            [Row(user_id=u, ts=dt.datetime(2024, 1, 1, h, mi)) for u, h, mi in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", chk)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write([(1, 9, 0), (2, 9, 30)])
    drain()
    # second batch advances event time past 10:00 + 10min watermark,
    # finalizing the 9:00 window
    write([(3, 10, 30)])
    drain()
    finalized = {
        (r.ws, r.n)
        for r in spark.read.schema("ws timestamp, n long").parquet(out).collect()
    }
    assert (dt.datetime(2024, 1, 1, 9, 0), 2) in finalized


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join (clicks x purchases within 1 hour),
    watermarked on both sides so join state is bounded — the remaining
    §2.8 streaming primitive."""
    c_src, p_src, out, chk = (
        str(tmp_path / d) for d in ("clicks", "purchases", "out", "chk")
    )
    schema = "user_id long, ts timestamp"

    def write(path, rows):
        spark.createDataFrame(
            [Row(user_id=u, ts=dt.datetime(2024, 1, 1, h, mi)) for u, h, mi in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(path)

    write(c_src, [(1, 9, 0), (1, 12, 0), (2, 9, 5)])
    write(p_src, [(1, 9, 30), (2, 11, 0)])

    clicks = (
        spark.readStream.schema(schema).parquet(c_src)
        .withWatermark("ts", "10 minutes")
        .select(F.col("user_id"), F.col("ts").alias("click_ts"))
    )
    purchases = (
        spark.readStream.schema(schema).parquet(p_src)
        .withWatermark("ts", "10 minutes")
        .select(F.col("user_id"), F.col("ts").alias("purchase_ts"))
    )
    joined = clicks.join(
        purchases,
        (clicks["user_id"] == purchases["user_id"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (purchases["purchase_ts"] <= clicks["click_ts"] + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(clicks["user_id"], "click_ts", "purchase_ts")
    q = (
        joined.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.click_ts, r.purchase_ts)
        for r in spark.read.schema(
            "user_id long, click_ts timestamp, purchase_ts timestamp"
        ).parquet(out).collect()
    }
    # only user 1's 9:00 click has a purchase within the following hour
    assert got == {
        (1, dt.datetime(2024, 1, 1, 9, 0), dt.datetime(2024, 1, 1, 9, 30))
    }


def test_zorder_write_tightens_per_file_ranges(spark, tmp_path):
    """write_zordered: per-file (min,max) spans of BOTH clustered
    columns must shrink vs an unsorted layout — the data-skipping
    property multi-dimensional clustering exists for."""
    from pyspark.sql import functions as F

    from dataeng_azure_spotify_spark.sources.layout import (
        with_zorder_code,
        write_zordered,
    )

    n = 4096
    # two independent dimensions (decorrelated by multiplicative hashing)
    df = spark.range(n).select(
        ((F.col("id") * 48271) % 4096).alias("a"),
        ((F.col("id") * 16807) % 4096).alias("b"),
    )

    def avg_spans(path):
        g = (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                (F.max("a") - F.min("a")).alias("sa"),
                (F.max("b") - F.min("b")).alias("sb"),
            )
            .agg(F.avg("sa").alias("sa"), F.avg("sb").alias("sb"))
            .first()
        )
        return g["sa"], g["sb"]

    base = str(tmp_path / "plain")
    df.repartition(16).write.parquet(base)
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["a", "b"], bits=12, num_files=16)

    sa0, sb0 = avg_spans(base)
    sa1, sb1 = avg_spans(zpath)
    # random layout spans ~ full range (4095); 16 z-ordered files give
    # 4 bits of prefix -> each dimension's span shrinks ~4x
    assert sa1 < sa0 * 0.5 and sb1 < sb0 * 0.5, (sa0, sb0, sa1, sb1)
    # same rows either way
    assert spark.read.parquet(zpath).count() == n

    # code determinism + bit budget guard
    c1 = with_zorder_code(df, ["a", "b"], bits=12).agg(F.sum("zcode")).first()[0]
    c2 = with_zorder_code(df, ["a", "b"], bits=12).agg(F.sum("zcode")).first()[0]
    assert c1 == c2
    import pytest

    with pytest.raises(ValueError, match="BIGINT"):
        with_zorder_code(df, ["a", "b"], bits=32)


def test_file_stats_manifest_prunes_zordered_reads(spark, tmp_path):
    """build_file_stats + pruned_read: on a z-ordered layout, a narrow
    two-column predicate must touch a strict subset of files and return
    exactly the full-scan answer."""
    from dataeng_azure_spotify_spark.sources.layout import (
        build_file_stats,
        pruned_read,
        write_zordered,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    path = str(tmp_path / "li_z")
    write_zordered(li, path, ["l_partkey", "l_suppkey"], num_files=8)

    stats = build_file_stats(spark, path, ["l_partkey", "l_suppkey"])
    n_files = stats.count()
    assert n_files >= 4  # layout actually split into multiple files

    preds = {"l_partkey": (10, 40), "l_suppkey": (1, 5)}
    pruned = pruned_read(spark, stats, preds)
    touched = {f for (f,) in pruned.select(F.input_file_name()).distinct().collect()}
    assert 0 < len(touched) < n_files  # skipping really skipped files

    full = li.filter(
        F.col("l_partkey").between(10, 40) & F.col("l_suppkey").between(1, 5)
    )
    got = sorted(pruned.select("l_orderkey", "l_linenumber").collect())
    want = sorted(full.select("l_orderkey", "l_linenumber").collect())
    assert got == want and len(got) > 0


def test_pruned_read_empty_envelope_keeps_schema(spark, tmp_path):
    from dataeng_azure_spotify_spark.sources.layout import (
        build_file_stats,
        pruned_read,
        write_zordered,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    path = str(tmp_path / "li_z2")
    write_zordered(li, path, ["l_partkey"], num_files=4)
    stats = build_file_stats(spark, path, ["l_partkey"])
    out = pruned_read(spark, stats, {"l_partkey": (-100, -50)})
    assert out.count() == 0
    assert out.schema == spark.read.parquet(path).schema


def test_bucketed_join_drops_both_exchanges(spark):
    """write_bucketed pays the key shuffle once at write time: a join
    of two tables bucketed on the same key with the same bucket count
    plans WITHOUT any Exchange (both sides read pre-distributed), and
    a groupBy on the bucket key also skips the shuffle. The same join
    over plain parquet tables plans two Exchanges — asserted as the
    control so the pin can't pass vacuously."""
    from pyspark.sql import functions as F

    from dataeng_azure_spotify_spark.sources.layout import write_bucketed

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("w")
    )
    write_bucketed(left, "bkt_left", ["k"], 8, sort_cols=["k"])
    write_bucketed(right, "bkt_right", ["k"], 8, sort_cols=["k"])
    # at this toy size the planner correctly prefers broadcast, which
    # sidesteps bucketing entirely ("Bucketed: false (disabled by query
    # planner)") — disable it so the test exercises the shuffle-join
    # path a 100 TB fact-fact join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        assert j.count() == 500  # correctness of the co-located join

        agg_plan = (
            spark.table("bkt_left")
            .groupBy("k")
            .agg(F.sum("v"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in agg_plan, agg_plan

        # control: the identical join over non-bucketed data shuffles
        ctrl = left.join(right, "k")
        ctrl_plan = ctrl._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in ctrl_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # the session is shared module-wide: don't leak catalog tables
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
