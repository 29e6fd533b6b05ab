"""Streaming as-of enrichment: state must carry the latest dimension
version across micro-batches, results must equal the batch asof_join
under ordered delivery, and replayed drains must be idempotent."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.operators.asof import asof_join
from dataeng_azure_spotify_spark.streaming.asof import asof_enrich_stream

L_SCHEMA = "k long, ts timestamp, ev string"
R_SCHEMA = "k long, rt timestamp, val double"
OUT_SCHEMA = "k long, ts timestamp, ev string, val double"


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


def _write(spark, path, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, lsrc, rsrc, out, chk):
    ls = spark.readStream.schema(L_SCHEMA).parquet(lsrc)
    rs = spark.readStream.schema(R_SCHEMA).parquet(rsrc)
    q = (
        asof_enrich_stream(
            ls, rs, on=["k"], left_time="ts", right_time="rt"
        )
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
        (r.k, r.ts, r.ev, r.val)
        for r in spark.read.schema(OUT_SCHEMA).parquet(out).collect()
    }


def test_asof_stream_matches_batch_join_across_batches(spark, tmp_path):
    lsrc, rsrc, out, chk = (
        str(tmp_path / d) for d in ("l", "r", "out", "chk")
    )
    for d in (lsrc, rsrc):
        os.makedirs(d, exist_ok=True)

    # batch 1: version v1 at 9:00; events before (NULL payload), at the
    # exact version instant (inclusive match), and after
    r1 = [Row(k=1, rt=_ts(9), val=1.0)]
    l1 = [
        Row(k=1, ts=_ts(8, 30), ev="before"),
        Row(k=1, ts=_ts(9, 0), ev="at"),
        Row(k=1, ts=_ts(9, 30), ev="after"),
        Row(k=2, ts=_ts(9, 0), ev="no_dim"),
    ]
    _write(spark, rsrc, R_SCHEMA, r1)
    _write(spark, lsrc, L_SCHEMA, l1)
    _drain(spark, lsrc, rsrc, out, chk)
    got1 = _emitted(spark, out)
    assert (1, _ts(8, 30), "before", None) in got1
    assert (1, _ts(9, 0), "at", 1.0) in got1  # inclusive tie rule
    assert (1, _ts(9, 30), "after", 1.0) in got1
    assert (2, _ts(9, 0), "no_dim", None) in got1

    # batch 2: version v2 supersedes; a STALE duplicate of v1 arrives
    # too (state must not regress); new events pick up v2
    r2 = [Row(k=1, rt=_ts(10), val=2.0), Row(k=1, rt=_ts(9), val=1.0)]
    l2 = [
        Row(k=1, ts=_ts(10, 15), ev="late"),
        Row(k=1, ts=None, ev="null_ts"),
    ]
    _write(spark, rsrc, R_SCHEMA, r2)
    _write(spark, lsrc, L_SCHEMA, l2)
    _drain(spark, lsrc, rsrc, out, chk)
    got2 = _emitted(spark, out)
    assert (1, _ts(10, 15), "late", 2.0) in got2
    assert (1, None, "null_ts", None) in got2  # batch NULL-ts contract

    # equality with the batch as-of join over the full history
    lall = spark.createDataFrame(l1 + l2, L_SCHEMA)
    rall = spark.createDataFrame(r1 + r2, R_SCHEMA)
    want = {
        (r.k, r.ts, r.ev, r.val)
        for r in asof_join(
            lall, rall, on=["k"], left_time="ts", right_time="rt"
        ).collect()
    }
    assert got2 == want

    # replayed drain with no new data: append-final, nothing re-emitted
    before = spark.read.schema(OUT_SCHEMA).parquet(out).count()
    _drain(spark, lsrc, rsrc, out, chk)
    assert spark.read.schema(OUT_SCHEMA).parquet(out).count() == before


def test_asof_stream_payload_clash_rejected(spark):
    l = spark.createDataFrame([], L_SCHEMA)
    r = spark.createDataFrame([], "k long, rt timestamp, ev string")
    try:
        asof_enrich_stream(l, r, on=["k"], left_time="ts", right_time="rt")
    except ValueError as e:
        assert "clash" in str(e)
    else:
        raise AssertionError("clashing payload column was not rejected")


def test_asof_stream_multiple_keys_independent_state(spark, tmp_path):
    lsrc, rsrc, out, chk = (
        str(tmp_path / d) for d in ("l", "r", "out", "chk")
    )
    for d in (lsrc, rsrc):
        os.makedirs(d, exist_ok=True)
    _write(
        spark,
        rsrc,
        R_SCHEMA,
        [Row(k=1, rt=_ts(9), val=1.0), Row(k=2, rt=_ts(11), val=9.0)],
    )
    _write(
        spark,
        lsrc,
        L_SCHEMA,
        [Row(k=1, ts=_ts(10), ev="a"), Row(k=2, ts=_ts(10), ev="b")],
    )
    _drain(spark, lsrc, rsrc, out, chk)
    got = _emitted(spark, out)
    assert (1, _ts(10), "a", 1.0) in got
    assert (2, _ts(10), "b", None) in got  # k=2's version is later


def test_asof_stream_randomized_matches_batch(spark, tmp_path):
    """Randomized parity: seeded random event/version interleavings,
    delivered event-time-ordered across three micro-batches, must equal
    the batch as-of join exactly."""
    import random

    rng = random.Random(20260814)
    lrows, rrows = [], []
    seen_rt = set()
    for i in range(120):
        k = rng.randint(1, 5)
        t = _ts(8 + rng.randint(0, 9), rng.randint(0, 59))
        if rng.random() < 0.4:
            if (k, t) in seen_rt:
                continue  # equal (key, rt) versions are undefined
                # without a seq tiebreaker — in BOTH operators (the
                # batch contract documents right_seq_tiebreakers)
            seen_rt.add((k, t))
            rrows.append(Row(k=k, rt=t, val=float(i)))
        else:
            lrows.append(Row(k=k, ts=t, ev=f"e{i}"))

    # ordered delivery: split the GLOBAL time order into 3 batches,
    # right-before-left at equal instants (the operator's inclusive tie
    # rule — a version delivered AFTER a same-instant event would be
    # transition-time late by contract)
    allrows = sorted(
        [("L", r) for r in lrows] + [("R", r) for r in rrows],
        key=lambda x: (
            (x[1].ts, 1) if x[0] == "L" else (x[1].rt, 0)
        ),
    )
    thirds = [allrows[: len(allrows) // 3],
              allrows[len(allrows) // 3 : 2 * len(allrows) // 3],
              allrows[2 * len(allrows) // 3 :]]

    lsrc, rsrc, out, chk = (
        str(tmp_path / d) for d in ("l", "r", "out", "chk")
    )
    for d in (lsrc, rsrc):
        os.makedirs(d, exist_ok=True)
    for batch in thirds:
        lb = [r for (s, r) in batch if s == "L"]
        rb = [r for (s, r) in batch if s == "R"]
        if lb:
            _write(spark, lsrc, L_SCHEMA, lb)
        if rb:
            _write(spark, rsrc, R_SCHEMA, rb)
        _drain(spark, lsrc, rsrc, out, chk)

    got = _emitted(spark, out)
    want = {
        (r.k, r.ts, r.ev, r.val)
        for r in asof_join(
            spark.createDataFrame(lrows, L_SCHEMA),
            spark.createDataFrame(rrows, R_SCHEMA),
            on=["k"],
            left_time="ts",
            right_time="rt",
        ).collect()
    }
    assert got == want
