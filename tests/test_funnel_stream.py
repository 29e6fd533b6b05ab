"""Streaming funnel-stage tracker: state must span micro-batches,
advances must be append-final, and per-step counts must equal the
batch funnel operator under ordered delivery."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row

from dataeng_azure_spotify_spark.operators.analytics import funnel
from dataeng_azure_spotify_spark.streaming.funnel import (
    FUNNEL_OUTPUT_SCHEMA,
    funnel_stage_stream,
)

SCHEMA = "user_id long, ts timestamp, event_type string"
STEPS = ["view", "click", "purchase"]


def _write(spark, src, rows):
    spark.createDataFrame(
        [Row(user_id=u, ts=dt.datetime(2024, 1, 1, h, m), event_type=e)
         for (u, h, m, e) in rows],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)


def _drain(spark, src, out, chk):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        funnel_stage_stream(stream, STEPS)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _emitted(spark, out):
    return {
        (r.user_id, r.step, r.step_idx, r.step_ts)
        for r in spark.read.schema(FUNNEL_OUTPUT_SCHEMA).parquet(out).collect()
    }


def test_funnel_stream_state_spans_batches_and_matches_batch_op(
    spark, tmp_path
):
    src, out, chk = (str(tmp_path / d) for d in ("src", "out", "chk"))
    os.makedirs(src, exist_ok=True)

    # batch 1: u1 views+clicks; u2 clicks BEFORE viewing (click must not
    # count); u3 views
    b1 = [(1, 9, 0, "view"), (1, 9, 30, "click"),
          (2, 9, 0, "click"), (2, 9, 10, "view"),
          (3, 9, 5, "view")]
    _write(spark, src, b1)
    _drain(spark, src, out, chk)
    got1 = _emitted(spark, out)
    assert (1, "view", 1, dt.datetime(2024, 1, 1, 9, 0)) in got1
    assert (1, "click", 2, dt.datetime(2024, 1, 1, 9, 30)) in got1
    assert not any(u == 2 and s == "click" for (u, s, _, _) in got1)

    # batch 2: u1 purchases (stage carried across the restart); u2's
    # later click now follows their view
    b2 = [(1, 10, 0, "purchase"), (2, 10, 0, "click")]
    _write(spark, src, b2)
    _drain(spark, src, out, chk)
    got2 = _emitted(spark, out)
    assert (1, "purchase", 3, dt.datetime(2024, 1, 1, 10, 0)) in got2
    assert (2, "click", 2, dt.datetime(2024, 1, 1, 10, 0)) in got2

    # per-step totals equal the batch funnel over the full history
    all_rows = spark.createDataFrame(
        [Row(user_id=u, ts=dt.datetime(2024, 1, 1, h, m), event_type=e)
         for (u, h, m, e) in b1 + b2],
        SCHEMA,
    )
    want = {(r["step"], r["n_users"]) for r in funnel(all_rows, STEPS).collect()}
    from collections import Counter

    counts = Counter(s for (_, s, _, _) in got2)
    got = {(s, counts.get(s, 0)) for s in STEPS}
    assert got == want


def test_funnel_stream_same_timestamp_does_not_advance(spark, tmp_path):
    src, out, chk = (str(tmp_path / d) for d in ("src", "out", "chk"))
    os.makedirs(src, exist_ok=True)
    _write(spark, src, [(1, 9, 0, "view"), (1, 9, 0, "click")])
    _drain(spark, src, out, chk)
    got = _emitted(spark, out)
    assert {s for (_, s, _, _) in got} == {"view"}
