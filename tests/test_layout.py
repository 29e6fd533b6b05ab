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
