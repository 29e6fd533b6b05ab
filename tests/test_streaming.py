"""Streaming silver layer: exactly-once bounded drains, rescue-mode
schema evolution, stateful dedup (SURVEY.md §2.1 S6-S8, §2.5, §2.8)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from dataeng_azure_spotify_spark.streaming.rescue import RESCUE_COL, read_bronze_stream
from dataeng_azure_spotify_spark.streaming.silver import (
    SilverTable,
    dedup_stream,
    write_silver_stream,
)
import pytest

# slow tier (r14): structured-streaming epochs (wall-clock-bound) — exceeds the driver verify window; run with -m slow
pytestmark = pytest.mark.slow


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows).write.mode("append").parquet(path)


def test_bounded_stream_drains_then_stops(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    _write_batch(spark, bronze, [Row(id=1, v="a"), Row(id=2, v="b")])
    t = SilverTable(
        "t", bronze, str(tmp_path / "silver"), str(tmp_path / "chk")
    )
    t.run(spark)
    out = spark.read.parquet(str(tmp_path / "silver"))
    assert out.count() == 2
    assert RESCUE_COL not in out.columns  # dropped before landing


def test_exactly_once_across_runs(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    _write_batch(spark, bronze, [Row(id=1, v="a")])
    t = SilverTable("t", bronze, str(tmp_path / "silver"), str(tmp_path / "chk"))
    t.run(spark)
    t.run(spark)  # no new files → no duplicates
    assert spark.read.parquet(str(tmp_path / "silver")).count() == 1
    _write_batch(spark, bronze, [Row(id=2, v="b")])
    t.run(spark)  # only the new file is processed
    assert spark.read.parquet(str(tmp_path / "silver")).count() == 2


def test_rescue_packs_unexpected_columns(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    chk = str(tmp_path / "chk")
    # run 1 establishes the declared schema (id, v)
    _write_batch(spark, bronze, [Row(id=1, v="a")])
    t = SilverTable(
        "t", bronze, str(tmp_path / "silver"), chk,
        clean=lambda df: df,  # keep the rescue column visible
    )
    t.run(spark)
    # run 2 ships a drifted schema with an extra column
    _write_batch(spark, bronze, [Row(id=2, v="b", surprise="x")])
    t.run(spark)
    out = spark.read.parquet(str(tmp_path / "silver"))
    assert set(out.columns) == {"id", "v", RESCUE_COL}
    rescued = {r.id: r[RESCUE_COL] for r in out.collect()}
    assert rescued[1] is None
    assert rescued[2] is not None and "surprise" in rescued[2]


def test_streaming_dedup_by_key(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    _write_batch(
        spark,
        bronze,
        [Row(k=1, v="a", ts=dt.datetime(2024, 1, 1)),
         Row(k=1, v="a-dup", ts=dt.datetime(2024, 1, 1, 1)),
         Row(k=2, v="b", ts=dt.datetime(2024, 1, 1))],
    )
    stream = read_bronze_stream(spark, bronze, str(tmp_path / "chk" / "schema"))
    deduped = dedup_stream(stream.drop(RESCUE_COL), ["k"])
    write_silver_stream(
        deduped, str(tmp_path / "silver"), str(tmp_path / "chk" / "sink")
    )
    out = spark.read.parquet(str(tmp_path / "silver"))
    assert out.count() == 2
    assert sorted(r.k for r in out.collect()) == [1, 2]


def test_streaming_dedup_state_spans_runs(spark, tmp_path):
    """dropDuplicates state persists in the checkpoint across bounded runs
    (the reference's cross-micro-batch statefulness note,
    Silver_Dimensions.py:487-494)."""
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    chk = str(tmp_path / "chk")

    def run():
        stream = read_bronze_stream(spark, bronze, chk + "/schema")
        write_silver_stream(
            dedup_stream(stream.drop(RESCUE_COL), ["k"]), silver, chk + "/sink"
        )

    _write_batch(spark, bronze, [Row(k=1, v="a")])
    run()
    _write_batch(spark, bronze, [Row(k=1, v="a-again"), Row(k=2, v="b")])
    run()
    out = spark.read.parquet(silver)
    assert out.count() == 2  # k=1 re-delivery suppressed by state


def test_silver_catalog_table_sink(spark, tmp_path):
    """table_name lands the silver sink as a metastore table AND at the
    path (external table) — the reference's dual landing of every silver
    table (Silver_Dimensions.py:591-601, SURVEY.md S8)."""
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    _write_batch(spark, bronze, [Row(id=1, v="a"), Row(id=2, v="b")])
    t = SilverTable(
        "t", bronze, silver, str(tmp_path / "chk"),
        table_name="silver_events_test",
    )
    try:
        t.run(spark)
        by_name = spark.table("silver_events_test")
        assert by_name.count() == 2
        assert spark.read.parquet(silver).count() == 2  # same landing
        # incremental drain appends to BOTH resolutions
        _write_batch(spark, bronze, [Row(id=3, v="c")])
        t.run(spark)
        assert spark.table("silver_events_test").count() == 3
        assert spark.read.parquet(silver).count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS silver_events_test")


def test_cdc_flow_backend_resolution_and_merge_condition():
    """Backend gating: auto→parquet here (delta absent), pinned delta
    raises, and the Delta MERGE sequence guard matches apply_scd1's
    lexicographic (sequence, tiebreakers) ordering."""
    import pytest

    from dataeng_azure_spotify_spark.delta_support import delta_available
    from dataeng_azure_spotify_spark.streaming.gold import (
        CdcFlow,
        _lexicographic_newer,
    )

    flow = CdcFlow(name="f", gold_base="/tmp/x", keys=["k"], sequence_by="seq")
    expected = "delta" if delta_available() else "parquet"
    assert flow._resolved_backend() == expected

    with pytest.raises(ValueError, match="unknown backend"):
        CdcFlow(name="f", gold_base="/tmp/x", keys=["k"], sequence_by="seq",
                backend="iceberg")._resolved_backend()
    if not delta_available():
        with pytest.raises(RuntimeError, match="delta-spark"):
            CdcFlow(name="f", gold_base="/tmp/x", keys=["k"],
                    sequence_by="seq", backend="delta")._resolved_backend()

    # null-safe lexicographic ordering (parquet twin: desc NULLS LAST —
    # non-null beats NULL, both-NULL ties go to the update); semantic
    # truth-table coverage lives in tests/test_hardening.py
    gt = "(s.seq > t.seq OR (s.seq IS NOT NULL AND t.seq IS NULL))"
    assert _lexicographic_newer("seq", []) == f"(({gt} OR s.seq <=> t.seq))"
    gtb = "(s.tb > t.tb OR (s.tb IS NOT NULL AND t.tb IS NULL))"
    assert _lexicographic_newer("seq", ["tb"]) == (
        f"({gt}) OR (s.seq <=> t.seq AND ({gtb} OR s.tb <=> t.tb))"
    )


def test_watermarked_window_agg_stream_matches_batch_twin(spark, tmp_path):
    """SURVEY §2.8 gap-fill: a checkpointed streaming run of the tumbling
    window aggregation with withWatermark, in append mode through
    write_silver_stream, converges to the same end state as the batch
    twin (q_events_tumbling's shape) over the same data.

    Append-mode mechanics exercised: the watermark used during batch N
    is derived from data seen through batch N-1, so windows emit one
    drain AFTER the watermark passes their end; a late row arriving
    above the current watermark is aggregated, and windows still inside
    the lateness horizon (the sentinel's) are withheld from the sink.
    """
    import pyspark.sql.functions as F

    src = str(tmp_path / "events")
    sink = str(tmp_path / "agg")
    chk = str(tmp_path / "chk")
    base = dt.datetime(2024, 3, 1, 0, 0, 0)

    def ev(minutes, typ):
        return Row(ts=base + dt.timedelta(minutes=minutes), event_type=typ)

    def drain():
        stream = (
            spark.readStream.schema("ts timestamp, event_type string")
            .parquet(src)
            .withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
            )
        )
        write_silver_stream(stream, sink, chk)

    # wave 1: hour-0 events + early hour-1 (max ts 75min -> wm 45min)
    _write_batch(
        spark, src,
        [ev(1, "a"), ev(5, "b"), ev(30, "a"), ev(59, "b"), ev(61, "a"), ev(75, "b")],
    )
    drain()
    # wave 2: rest of hour-1, one LATE hour-0 row still above the 45min
    # watermark (minute 50), and a sentinel far ahead (minute 300)
    _write_batch(spark, src, [ev(80, "a"), ev(110, "b"), ev(50, "a"), ev(300, "x")])
    drain()
    # wave 3: second sentinel advances processing so the now-closed
    # hour-0/hour-1 windows (wm 270min) actually emit
    _write_batch(spark, src, [ev(301, "x")])
    drain()

    got = {
        (r.window_start, r.event_type, r.n_events)
        for r in spark.read.parquet(sink).collect()
    }
    batch_twin = {
        (r.window_start, r.event_type, r.n_events)
        for r in (
            spark.read.parquet(src)
            .filter(F.col("ts") < base + dt.timedelta(minutes=300))
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"), "event_type", "n_events"
            )
            .collect()
        )
    }
    assert got == batch_twin
    # the sentinel window is inside the lateness horizon: not emitted
    assert not any(t == "x" for _, t, _ in got)


def test_watermarked_session_window_stream_matches_batch_twin(spark, tmp_path):
    """Session windows (30-min gap) under watermark, append mode: sessions
    merge across micro-batches in state and emit once the watermark
    passes their close; the converged sink equals the batch twin."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "events")
    sink = str(tmp_path / "sess")
    chk = str(tmp_path / "chk")
    base = dt.datetime(2024, 4, 1, 0, 0, 0)

    def ev(minutes, user):
        return Row(ts=base + dt.timedelta(minutes=minutes), user_id=user)

    def drain():
        stream = (
            spark.readStream.schema("ts timestamp, user_id long")
            .parquet(src)
            .withWatermark("ts", "30 minutes")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )
        write_silver_stream(stream, sink, chk)

    _write_batch(spark, src, [ev(0, 1), ev(10, 1), ev(5, 2)])
    drain()
    # u1@20 merges into u1's open session across the batch boundary;
    # u1@120 opens a second session; u99 is the watermark-advancing sentinel
    _write_batch(spark, src, [ev(20, 1), ev(120, 1), ev(300, 99)])
    drain()
    _write_batch(spark, src, [ev(301, 99)])
    drain()

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(sink).collect()
    }
    batch_twin = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in (
            spark.read.parquet(src)
            .filter(F.col("user_id") != 99)
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
            .collect()
        )
    }
    assert got == batch_twin
    # the cross-batch merge produced ONE 3-event session for user 1
    assert (1, base, base + dt.timedelta(minutes=50), 3) in got
    # sentinel sessions stay inside the lateness horizon: never emitted
    assert not any(u == 99 for u, *_ in got)


# ---------------------------------------------------------------------------
# Cross-run admission tier through a checkpointed stream (§2.8 + LLM tier):
# streaming end-state must equal the batch loop, including a replayed epoch.
# ---------------------------------------------------------------------------

_DOC_SCHEMA = "doc_id long, text string"

_B1 = [
    Row(doc_id=1, text="the quick brown fox"),
    Row(doc_id=2, text="lorem ipsum dolor"),
    Row(doc_id=3, text="The  quick BROWN fox"),  # in-batch dup of 1 (normalized)
]
_B2 = [
    Row(doc_id=10, text="lorem ipsum dolor"),  # cross-epoch dup of 2
    Row(doc_id=11, text="completely new text"),
]


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_streaming_admission_matches_batch_loop(spark, tmp_path):
    from dataeng_azure_spotify_spark.operators.dedup import IncrementalDedup
    from dataeng_azure_spotify_spark.streaming.admission import (
        read_admitted,
        run_admission_stream,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")

    def drain():
        src = spark.readStream.schema(_DOC_SCHEMA).parquet(inp)
        admitter = IncrementalDedup(spark, str(tmp_path / "state_stream"))
        run_admission_stream(src, admitter, out, chk)

    _write_batch(spark, inp, _B1)
    drain()
    _write_batch(spark, inp, _B2)
    drain()

    # batch twin over the same micro-batches, separate state
    twin = IncrementalDedup(spark, str(tmp_path / "state_batch"))
    got_batch = _ids(twin.admit(spark.createDataFrame(_B1, _DOC_SCHEMA))) + _ids(
        twin.admit(spark.createDataFrame(_B2, _DOC_SCHEMA))
    )
    assert _ids(read_admitted(spark, out)) == sorted(got_batch) == [1, 2, 11]

    # state parity: same seen-hash set either way
    h_stream = {
        r.text_hash
        for r in spark.read.parquet(str(tmp_path / "state_stream")).collect()
    }
    h_batch = {
        r.text_hash
        for r in spark.read.parquet(str(tmp_path / "state_batch")).collect()
    }
    assert h_stream == h_batch and len(h_stream) == 3


def test_replayed_epoch_rewrites_identical_output(spark, tmp_path):
    """Crash-replay: re-running a committed epoch's foreachBatch body
    (same run_id) must reproduce the SAME admitted rows and leave state
    untouched — the exactly-once contract of run-tracked admission."""
    from dataeng_azure_spotify_spark.operators.dedup import IncrementalDedup

    state = str(tmp_path / "state")
    inc = IncrementalDedup(spark, state)
    b1 = spark.createDataFrame(_B1, _DOC_SCHEMA)

    first = _ids(inc.admit(b1, run_id="epoch-0"))
    n_state = spark.read.parquet(state).count()
    replay = _ids(inc.admit(b1, run_id="epoch-0"))
    assert replay == first == [1, 2]
    assert spark.read.parquet(state).count() == n_state  # no re-append

    # a DIFFERENT run replaying the same content admits nothing
    assert _ids(inc.admit(b1, run_id="epoch-9")) == []


def test_incremental_lsh_replay_run_id(spark, tmp_path):
    from dataeng_azure_spotify_spark.operators.dedup import IncrementalLsh

    state = str(tmp_path / "lsh_state")
    inc = IncrementalLsh(spark, state, threshold=0.5)
    rows = [
        Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=2, text="totally different words here now ok"),
        Row(doc_id=3, text="hi"),  # shingle-less: admits, id-tracked
    ]
    b = spark.createDataFrame(rows, _DOC_SCHEMA)

    first = _ids(inc.admit(b, run_id="epoch-0"))
    n_state = spark.read.parquet(state).count()
    replay = _ids(inc.admit(b, run_id="epoch-0"))
    assert replay == first == [1, 2, 3]
    assert spark.read.parquet(state).count() == n_state
    # near-dup of doc 1 in a later epoch still rejects against history
    later = spark.createDataFrame(
        [Row(doc_id=20, text="alpha beta gamma delta epsilon zeta")], _DOC_SCHEMA
    )
    assert _ids(inc.admit(later, run_id="epoch-1")) == []


def test_embedding_admission_stream_with_replay(spark, tmp_path):
    """The third admitter (IncrementalEmbeddingDedup) through the same
    checkpointed foreachBatch front-end: streamed end-state matches the
    batch loop, and a replayed epoch (same run_id) re-returns identical
    admissions without growing the index."""
    from dataeng_azure_spotify_spark.operators.similarity import (
        IncrementalEmbeddingDedup,
    )
    from dataeng_azure_spotify_spark.streaming.admission import (
        read_admitted,
        run_admission_stream,
    )

    def vec(*xs):
        return [float(x) for x in xs]

    schema = "vec_id long, embedding array<float>"
    b1 = [(1, vec(1, 0, 0, 0)), (2, vec(1, 0.01, 0, 0)), (3, vec(0, 1, 0, 0))]
    b2 = [(10, vec(0.99, 0.01, 0, 0)), (11, vec(0, 0, 1, 0))]

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")

    def drain():
        src = spark.readStream.schema(schema).parquet(inp)
        admitter = IncrementalEmbeddingDedup(
            spark, str(tmp_path / "idx"), threshold=0.95,
            num_centroids=2, nprobe=2,
        )
        # no id_col kwarg: the embedding admitter fixes it at
        # construction, and the helper rejects unsupported overrides
        run_admission_stream(src, admitter, out, str(tmp_path / "chk"))

    spark.createDataFrame(b1, schema).write.mode("append").parquet(inp)
    drain()
    spark.createDataFrame(b2, schema).write.mode("append").parquet(inp)
    drain()
    got = {r.vec_id for r in read_admitted(spark, out).collect()}
    assert got == {1, 3, 11}

    # crash-replay of epoch 1: same run_id re-returns {11}, index untouched
    admitter = IncrementalEmbeddingDedup(
        spark, str(tmp_path / "idx"), threshold=0.95, num_centroids=2, nprobe=2
    )
    n_rows = admitter.index.buckets().count()
    import hashlib
    import os as _os

    ns = hashlib.md5(
        _os.path.abspath(str(tmp_path / "chk")).encode()
    ).hexdigest()[:12]
    replay = admitter.admit(
        spark.createDataFrame(b2, schema), run_id=f"{ns}-epoch-1"
    )
    assert {r.vec_id for r in replay.collect()} == {11}
    assert admitter.index.buckets().count() == n_rows


def test_stream_stream_interval_join_matches_batch_twin(spark, tmp_path):
    """Stream-stream time-interval join (views ⋈ clicks within 10 min,
    watermarked both sides) converges to the batch interval_join over
    the same data — SURVEY §2.8 beyond-reference surface: the reference
    has no stream-stream joins at all."""
    import datetime as dt

    from dataeng_azure_spotify_spark.operators.asof import interval_join

    base = dt.datetime(2024, 6, 1, 9, 0, 0)

    def t(seconds):
        return base + dt.timedelta(seconds=seconds)

    views = [(1, 100, t(0)), (2, 100, t(2000)), (3, 200, t(50))]
    clicks = [
        (10, 100, t(300)),   # matches view 1
        (11, 100, t(2300)),  # matches view 2
        (12, 200, t(700)),   # outside view 3's 600s window
        (13, 200, t(100)),   # matches view 3
    ]
    v_schema = "view_id long, user_id long, view_ts timestamp"
    c_schema = "click_id long, user_id long, click_ts timestamp"
    v_dir, c_dir = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(views, v_schema).write.parquet(v_dir)
    spark.createDataFrame(clicks, c_schema).write.parquet(c_dir)

    vs = (
        spark.readStream.schema(v_schema).parquet(v_dir)
        .withWatermark("view_ts", "10 minutes")
        .withColumnRenamed("user_id", "v_user")
    )
    cs = (
        spark.readStream.schema(c_schema).parquet(c_dir)
        .withWatermark("click_ts", "10 minutes")
    )
    from pyspark.sql import functions as F

    joined = vs.join(
        cs,
        F.expr(
            "v_user = user_id AND "
            "click_ts > view_ts AND "
            "click_ts <= view_ts + interval 600 seconds"
        ),
    ).select("view_id", "click_id", F.col("v_user").alias("user_id"))
    sink = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r.view_id, r.click_id, r.user_id)
        for r in spark.read.parquet(sink).collect()
    }
    batch = interval_join(
        spark.createDataFrame(views, v_schema),
        spark.createDataFrame(clicks, c_schema),
        ["user_id"],
        "view_ts",
        "click_ts",
        0,
        600,
    )
    expected = {
        (r.view_id, r.click_id, r.user_id) for r in batch.collect()
    }
    assert streamed == expected == {(1, 10, 100), (2, 11, 100), (3, 13, 200)}


def test_lsh_admission_stream_end_to_end(spark, tmp_path):
    """IncrementalLsh through the checkpointed stream front-end — the
    third admitter wired e2e (exact + embedding covered above): near-dup
    of an earlier epoch is rejected, novel text admits, end state
    matches the batch loop."""
    from dataeng_azure_spotify_spark.operators.dedup import IncrementalLsh
    from dataeng_azure_spotify_spark.streaming.admission import (
        read_admitted,
        run_admission_stream,
    )

    b1 = [
        Row(doc_id=1, text="alpha beta gamma delta epsilon zeta eta theta"),
        Row(doc_id=2, text="one two three four five six seven eight"),
    ]
    b2 = [
        Row(doc_id=10, text="alpha beta gamma delta epsilon zeta eta iota"),  # near-dup of 1
        Row(doc_id=11, text="completely different vocabulary in this row here"),
    ]
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")

    def drain():
        src = spark.readStream.schema(_DOC_SCHEMA).parquet(inp)
        adm = IncrementalLsh(spark, str(tmp_path / "state_s"), threshold=0.5)
        run_admission_stream(src, adm, out, str(tmp_path / "chk"))

    _write_batch(spark, inp, b1)
    drain()
    _write_batch(spark, inp, b2)
    drain()
    got = _ids(read_admitted(spark, out))

    twin = IncrementalLsh(spark, str(tmp_path / "state_b"), threshold=0.5)
    exp = _ids(twin.admit(spark.createDataFrame(b1, _DOC_SCHEMA))) + _ids(
        twin.admit(spark.createDataFrame(b2, _DOC_SCHEMA))
    )
    assert got == sorted(exp) == [1, 2, 11]


def test_stream_stream_left_outer_join_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: an unmatched view emits (view,
    NULL) only once the watermark passes its join window — pinned
    because the emit-on-expiry semantics are the subtle half of
    stream-stream joins."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 6, 2, 8, 0, 0)

    def t(seconds):
        return base + dt.timedelta(seconds=seconds)

    v_schema = "view_id long, user_id long, view_ts timestamp"
    c_schema = "click_id long, c_user long, click_ts timestamp"
    v_dir, c_dir = str(tmp_path / "v"), str(tmp_path / "c")
    sink, chk = str(tmp_path / "out"), str(tmp_path / "chk")

    def drain():
        vs = (
            spark.readStream.schema(v_schema).parquet(v_dir)
            .withWatermark("view_ts", "0 seconds")
        )
        cs = (
            spark.readStream.schema(c_schema).parquet(c_dir)
            .withWatermark("click_ts", "0 seconds")
        )
        j = vs.join(
            cs,
            F.expr(
                "user_id = c_user AND click_ts > view_ts "
                "AND click_ts <= view_ts + interval 600 seconds"
            ),
            "leftOuter",
        ).select("view_id", "click_id")
        q = (
            j.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # epoch 1: view 1 (will match), view 2 (never matches); one click
    spark.createDataFrame(
        [(1, 100, t(0)), (2, 200, t(0))], v_schema
    ).write.mode("append").parquet(v_dir)
    spark.createDataFrame(
        [(10, 100, t(100))], c_schema
    ).write.mode("append").parquet(c_dir)
    drain()
    # epoch 2: far-future events on BOTH sides — the global watermark is
    # the MIN across watermarked inputs, so a stale view stream would
    # pin it at t(0) forever and the NULL row could never emit
    spark.createDataFrame(
        [(98, 998, t(10_000))], v_schema
    ).write.mode("append").parquet(v_dir)
    spark.createDataFrame(
        [(99, 999, t(10_000))], c_schema
    ).write.mode("append").parquet(c_dir)
    drain()
    # epoch 3: one more micro-batch so the advanced watermark (computed
    # at the END of epoch 2's batch) is applied to evict view 2's state
    spark.createDataFrame(
        [(97, 997, t(10_001))], c_schema
    ).write.mode("append").parquet(c_dir)
    drain()

    rows = {(r.view_id, r.click_id) for r in spark.read.parquet(sink).collect()}
    assert (1, 10) in rows
    assert (2, None) in rows


def test_admission_stream_maintains_labels_index(spark, tmp_path):
    """Streaming ingest maintains the SAME NearDupLabels artifact batch
    curation reads: stream N batches through the admission front-end
    with labels_index= → the artifact's labels equal a from-scratch
    batch build over the union of admitted survivors."""
    from dataeng_azure_spotify_spark.operators.cluster_index import NearDupLabels
    from dataeng_azure_spotify_spark.operators.dedup import IncrementalLsh
    from dataeng_azure_spotify_spark.streaming.admission import (
        read_admitted,
        run_admission_stream,
    )

    b1 = [
        Row(doc_id=1, text="alpha beta gamma delta epsilon zeta eta theta"),
        Row(doc_id=2, text="one two three four five six seven eight"),
    ]
    b2 = [
        # LSH threshold 0.9 admits this J≈0.56 near-dup of doc 1; the
        # label index (threshold 0.5) then clusters it WITH doc 1 —
        # admission policy and labeling threshold are independent knobs
        Row(doc_id=10, text="alpha beta gamma delta epsilon zeta eta iota"),
        Row(doc_id=11, text="completely different vocabulary in this row here"),
    ]
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    idx = NearDupLabels.init(spark, str(tmp_path / "ndl"), threshold=0.5)

    def drain():
        src = spark.readStream.schema(_DOC_SCHEMA).parquet(inp)
        adm = IncrementalLsh(spark, str(tmp_path / "state_s"), threshold=0.9)
        run_admission_stream(
            src, adm, out, str(tmp_path / "chk"), labels_index=idx
        )

    _write_batch(spark, inp, b1)
    drain()
    _write_batch(spark, inp, b2)
    drain()

    admitted = read_admitted(spark, out)
    assert _ids(admitted) == [1, 2, 10, 11]
    got = {
        (r.doc_id, r.cluster_id) for r in idx.labels().collect()
    }
    want = {
        (r.doc_id, r.cluster_id)
        for r in NearDupLabels.build(
            admitted, str(tmp_path / "ndl_batch"), threshold=0.5
        ).labels().collect()
    }
    assert got == want
    assert (10, 1) in got  # near-dup clustered with doc 1 across epochs

    # replayed epoch (same run_id): labels unchanged, no duplicates
    import hashlib
    import os as _os

    ns = hashlib.md5(
        _os.path.abspath(str(tmp_path / "chk")).encode()
    ).hexdigest()[:12]
    adm = IncrementalLsh(spark, str(tmp_path / "state_s"), threshold=0.9)
    replay = adm.admit(
        spark.createDataFrame(b2, _DOC_SCHEMA), run_id=f"{ns}-epoch-1"
    )
    idx.append(replay, run_id=f"{ns}-epoch-1")
    assert {
        (r.doc_id, r.cluster_id) for r in idx.labels().collect()
    } == want
    assert idx.labels().count() == 4


def test_semantic_admission_stream_with_replay(spark, tmp_path):
    """The fourth admitter (IncrementalSemanticDedup) through the same
    checkpointed foreachBatch front-end: the streamed end-state admits
    exactly the semantically-novel vectors, and a replayed epoch (same
    run_id) re-returns identical admissions without duplicating the
    keeper store."""
    from dataeng_azure_spotify_spark.operators.similarity import (
        IncrementalSemanticDedup,
    )
    from dataeng_azure_spotify_spark.streaming.admission import (
        read_admitted,
        run_admission_stream,
    )

    def vec(*xs):
        return [float(x) for x in xs]

    schema = "vec_id long, embedding array<float>"
    b1 = [(1, vec(1, 0, 0, 0)), (2, vec(1, 0.01, 0, 0)), (3, vec(0, 1, 0, 0))]
    b2 = [(10, vec(0.99, 0.01, 0, 0)), (11, vec(0, 0, 1, 0))]

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")

    def drain():
        src = spark.readStream.schema(schema).parquet(inp)
        admitter = IncrementalSemanticDedup(
            spark, str(tmp_path / "idx"), threshold=0.95, k=2
        )
        run_admission_stream(src, admitter, out, str(tmp_path / "chk"))

    spark.createDataFrame(b1, schema).write.mode("append").parquet(inp)
    drain()
    spark.createDataFrame(b2, schema).write.mode("append").parquet(inp)
    drain()
    got = {r.vec_id for r in read_admitted(spark, out).collect()}
    assert got == {1, 3, 11}  # 2 ~ 1 in-batch; 10 ~ stored keeper 1

    # crash-replay of epoch 1: same run_id re-returns {11}, keeper
    # store unchanged (dynamic overwrite of the run's own partitions)
    admitter = IncrementalSemanticDedup(
        spark, str(tmp_path / "idx"), threshold=0.95, k=2
    )
    n_keep = admitter.index.keepers().count()
    import hashlib
    import os as _os

    ns = hashlib.md5(
        _os.path.abspath(str(tmp_path / "chk")).encode()
    ).hexdigest()[:12]
    replay = admitter.admit(
        spark.createDataFrame(b2, schema), run_id=f"{ns}-epoch-1"
    )
    assert {r.vec_id for r in replay.collect()} == {11}
    assert admitter.index.keepers().count() == n_keep

    # crash-replay of epoch 0 — the BOOTSTRAP epoch (crash after the
    # index build but before the sink commit): the re-delivered batch
    # goes through admit_batch (index exists now), must recognize the
    # build's keepers as its own attempt via the shared run_id, and
    # re-return the identical admitted rows. Under the old anonymous
    # 'build' run tag this returned EMPTY and the overwrite sink lost
    # every epoch-0 document.
    replay0 = admitter.admit(
        spark.createDataFrame(b1, schema), run_id=f"{ns}-epoch-0"
    )
    assert {r.vec_id for r in replay0.collect()} == {1, 3}
    assert admitter.index.keepers().count() == n_keep
    # keeper attribution survives the replay: epoch-0 keepers carry the
    # epoch's run tag, not 'build'
    runs = {
        r["run"]
        for r in admitter.index.keepers().select("run").distinct().collect()
    }
    assert runs == {f"{ns}-epoch-0", f"{ns}-epoch-1"}
