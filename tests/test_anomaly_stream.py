"""Streaming anomaly monitor: incremental partial-total state must stay
DataFrame-equal to the batch operator, including after epoch replays
and state compaction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from dataeng_azure_spotify_spark.operators.analytics import daily_metric_anomalies
from dataeng_azure_spotify_spark.streaming.anomaly import AnomalyMonitor

SCHEMA = "event_type string, ts timestamp, value double"


def _rows(day_vals):
    out = []
    for day, vals in day_vals:
        for i, v in enumerate(vals):
            out.append(
                Row(
                    event_type="m",
                    ts=dt.datetime(2024, 1, day, 1 + i),
                    value=v,
                )
            )
    return out


def _canon(df):
    return sorted(
        (r["grp"], r["day"].isoformat(), r["day_total"],
         None if r["z_score"] is None else round(r["z_score"], 9),
         r["is_anomaly"])
        for r in df.collect()
    )


def test_streaming_monitor_matches_batch_operator(spark, tmp_path):
    src, chk, state = (str(tmp_path / d) for d in ("src", "chk", "state"))
    mon = AnomalyMonitor(state, trailing_days=3, z_thresh=2.0)

    batch1 = _rows([(1, [10.0, 10.5]), (2, [9.5, 10.0]), (3, [10.25, 9.75])])
    batch2 = _rows([(3, [0.25]), (4, [100.0, 50.0])])  # day-3 late rows + spike

    def land(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        mon.process_stream(spark.readStream.schema(SCHEMA).parquet(src), chk)

    land(batch1)
    drain()
    land(batch2)
    drain()

    all_events = spark.createDataFrame(batch1 + batch2, SCHEMA)
    want = _canon(daily_metric_anomalies(all_events, trailing_days=3))
    got = _canon(mon.current(spark))
    assert got == want
    # the spike day actually flags (the test is not vacuous)
    assert any(day == "2024-01-04" and flag for (_, day, _, _, flag) in got)

    # a no-new-data drain must not change the answer (epoch idempotence)
    drain()
    assert _canon(mon.current(spark)) == want

    # compaction folds epochs but must preserve the answer
    mon.compact_state(spark)
    assert _canon(mon.current(spark)) == want


def test_partial_totals_reaggregate_exactly(spark):
    """Decimal day-totals computed per-batch then re-summed equal the
    one-pass total — the invariant the epoch-partial state relies on."""
    from dataeng_azure_spotify_spark.operators.analytics import daily_totals

    b1 = spark.createDataFrame(_rows([(1, [0.1, 0.2, 0.4])]), SCHEMA)
    b2 = spark.createDataFrame(_rows([(1, [0.3, 0.7])]), SCHEMA)
    partials = daily_totals(b1).unionByName(daily_totals(b2))
    resum = partials.groupBy("grp", "day").agg(
        F.sum("day_total").cast("decimal(18,4)").alias("day_total")
    )
    one_pass = daily_totals(b1.unionByName(b2))
    assert sorted(map(tuple, resum.collect())) == sorted(
        map(tuple, one_pass.collect())
    )
