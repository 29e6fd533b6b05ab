"""Custom stateful streaming operator (applyInPandasWithState
sessionization) — state carries across micro-batches via the checkpoint,
and the streamed closed-session output matches the batch twin."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from dataeng_azure_spotify_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)

EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("ts", TimestampType(), True),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        [Row(user_id=u, ts=dt.datetime(2024, 1, 1, h, mi)) for u, h, mi in rows],
        EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, src, out, chk):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_sessionize_stream_state_spans_microbatches(spark, tmp_path):
    src, out, chk = (str(tmp_path / d) for d in ("src", "out", "chk"))
    os.makedirs(src, exist_ok=True)

    # batch 1: user 1 has two events 10 min apart (one open session);
    # user 2 has one event
    _write_batch(spark, src, [(1, 9, 0), (1, 9, 10), (2, 9, 0)])
    _drain(spark, src, out, chk)
    first = spark.read.schema(
        StructType(
            [
                StructField("user_id", LongType(), True),
                StructField("session_start", TimestampType(), True),
                StructField("session_end", TimestampType(), True),
                StructField("n_events", LongType(), True),
            ]
        )
    ).parquet(out)
    assert first.count() == 0  # nothing closed yet — sessions held in state

    # batch 2: user 1 returns 2h later -> closes the earlier session
    # (proving state survived the restart); user 2 event within gap.
    _write_batch(spark, src, [(1, 11, 30), (2, 9, 20)])
    _drain(spark, src, out, chk)
    closed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    assert closed == {
        (1, dt.datetime(2024, 1, 1, 9, 0), dt.datetime(2024, 1, 1, 9, 40), 2)
    }


def test_sessionize_batch_matches_session_window(spark):
    rows = [
        Row(user_id=1, ts=dt.datetime(2024, 1, 1, 9, 0)),
        Row(user_id=1, ts=dt.datetime(2024, 1, 1, 9, 10)),
        Row(user_id=1, ts=dt.datetime(2024, 1, 1, 12, 0)),
        Row(user_id=2, ts=dt.datetime(2024, 1, 1, 9, 0)),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    ours = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(df, include_open=True).collect()
    }
    builtin = {
        (r.user_id, r.start, r.end, r.n)
        for r in df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "user_id",
            F.col("session_window.start").alias("start"),
            F.col("session_window.end").alias("end"),
            "n",
        )
        .collect()
    }
    assert ours == builtin


from dataeng_azure_spotify_spark.streaming.stateful import (
    quota_admit_stream,
    transform_with_state_available,
)

#: Both quota implementations; the modern-API leg runs only where the
#: transformWithState protobuf worker dependency is installed.
QUOTA_IMPLS = [
    "applyInPandas",
    pytest.param(
        "tws",
        marks=pytest.mark.skipif(
            not transform_with_state_available(),
            reason="protobuf (transformWithState worker dep) not installed",
        ),
    ),
]


@pytest.mark.parametrize("impl", QUOTA_IMPLS)
def test_quota_admit_stream_enforces_cumulative_cap(spark, tmp_path, impl):
    """Streaming per-key quota: at most k rows per key over the stream's
    LIFETIME — the counter survives in the checkpointed state store
    across bounded drains."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    old_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    if impl == "tws":  # transformWithState requires the RocksDB provider
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        def drain():
            stream = spark.readStream.schema(
                "doc_id long, source string"
            ).parquet(src)
            q = (
                quota_admit_stream(stream, max_per_key=2, impl=impl)
                .writeStream.format("parquet")
                .outputMode("append")
                .option("checkpointLocation", chk)
                .option("path", sink)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        spark.createDataFrame(
            [(3, "src0"), (1, "src0"), (2, "src0"), (10, "src1")],
            "doc_id long, source string",
        ).coalesce(1).write.mode("append").parquet(src)
        drain()
        got1 = {(r.doc_id, r.source) for r in spark.read.parquet(sink).collect()}
        # order_col-ordered admission within the batch: lowest ids win
        assert got1 == {(1, "src0"), (2, "src0"), (10, "src1")}

        spark.createDataFrame(
            [(4, "src0"), (11, "src1")], "doc_id long, source string"
        ).coalesce(1).write.mode("append").parquet(src)
        drain()
        got2 = {(r.doc_id, r.source) for r in spark.read.parquet(sink).collect()}
        # src0's quota was exhausted in drain 1; src1 still had budget
        assert got2 == got1 | {(11, "src1")}
    finally:
        if old_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old_provider
            )
