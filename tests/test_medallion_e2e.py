"""End-to-end medallion flow (SURVEY.md §3): incremental bronze extract →
streaming silver with dedup → gold SCD2 via CDC flow — orchestrated by the
Pipeline runner with run-logging, across TWO incremental cycles."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.delta_support import delta_available
from dataeng_azure_spotify_spark.observability import RunLog, failed_runs_last
from dataeng_azure_spotify_spark.operators.scd import CURRENT_COL, END_COL
from dataeng_azure_spotify_spark.plans.pipeline import Pipeline
from dataeng_azure_spotify_spark.sources.ingest import TableConfig, incremental_extract
from dataeng_azure_spotify_spark.sources.watermark import WatermarkStore
from dataeng_azure_spotify_spark.streaming.gold import CdcFlow, ParquetSnapshotTable
from dataeng_azure_spotify_spark.streaming.rescue import RESCUE_COL, read_bronze_stream
from dataeng_azure_spotify_spark.streaming.silver import dedup_stream, write_silver_stream

# slow tier (r14): full medallion pipeline e2e — exceeds the driver verify window; run with -m slow
pytestmark = pytest.mark.slow


def _users(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, name=n, updated_at=dt.datetime(2024, 1, d)) for u, n, d in rows]
    )


#: Both gold backends; the delta leg runs only where delta-spark ships.
BACKENDS = [
    "parquet",
    pytest.param(
        "delta",
        marks=pytest.mark.skipif(
            not delta_available(), reason="delta-spark not installed"
        ),
    ),
]


@pytest.mark.parametrize("backend", BACKENDS)
def test_full_medallion_two_cycles(spark, tmp_path, backend):
    base = str(tmp_path)
    store = WatermarkStore(base + "/wm")
    log = RunLog(spark, base + "/runlog")
    # Silver lands as a METASTORE table and gold stages from that table
    # name (reference: spark.readStream.table("spotify.silver.<t>"),
    # FactStream.py:49-60) — not from the storage path.
    silver_table = f"spotify_silver.users_e2e_{backend}"
    flow = CdcFlow(
        name="dim_user",
        gold_base=base + "/gold/dim_user",
        keys=["user_id"],
        sequence_by="updated_at",
        scd_type=2,
        tiebreakers=["name"],
        expectations={"key not null": "user_id IS NOT NULL"},
        backend=backend,
        source_table=silver_table,
    )

    def run_cycle(source_df, run_id):
        pipe = Pipeline(name=f"cycle-{run_id}")
        pipe.add(
            "bronze",
            lambda s: log.timed(
                run_id, "bronze",
                lambda: incremental_extract(
                    s, source_df, TableConfig("users", "updated_at"), store,
                    base + "/bronze",
                ).rows,
            ),
        )

        def silver(s):
            stream = read_bronze_stream(
                s, base + "/bronze/users", base + "/chk/schema"
            )
            write_silver_stream(
                dedup_stream(stream.drop(RESCUE_COL), ["user_id", "updated_at"]),
                base + "/silver/users",
                base + "/chk/silver",
                table_name=silver_table,
            )
            return silver_table

        pipe.add("silver", lambda s: log.timed(run_id, "silver", lambda: silver(s)),
                 depends_on=("bronze",))

        def gold(s):
            # checkpointed stream over the silver TABLE: each cycle
            # merges exactly the files appended since the last drain
            flow.run_from_table(s, base + "/chk/gold")
            return "ok"

        pipe.add("gold", lambda s: log.timed(run_id, "gold", lambda: gold(s)),
                 depends_on=("silver",))
        pipe.run(spark)

    # cycle 1: initial load (3 users, one with a null key → dropped by rules)
    src1 = spark.createDataFrame(
        [Row(user_id=1, name="ana", updated_at=dt.datetime(2024, 1, 1)),
         Row(user_id=2, name="bo", updated_at=dt.datetime(2024, 1, 1)),
         Row(user_id=None, name="ghost", updated_at=dt.datetime(2024, 1, 1))]
    )
    run_cycle(src1, "r1")
    gold1 = flow.table(spark).read()
    assert gold1.count() == 2  # ghost dropped by expectations
    assert gold1.filter(F.col(CURRENT_COL)).count() == 2

    # cycle 2: user 1 changes name; user 3 appears
    src2 = spark.createDataFrame(
        [Row(user_id=1, name="ana", updated_at=dt.datetime(2024, 1, 1)),
         Row(user_id=2, name="bo", updated_at=dt.datetime(2024, 1, 1)),
         Row(user_id=1, name="ana-maria", updated_at=dt.datetime(2024, 1, 5)),
         Row(user_id=3, name="cy", updated_at=dt.datetime(2024, 1, 4))]
    )
    run_cycle(src2, "r2")
    gold2 = flow.table(spark).read()

    u1 = {r.name: r for r in gold2.filter(F.col("user_id") == 1).collect()}
    assert len(u1) == 2  # two versions of user 1
    assert u1["ana"][END_COL] == dt.datetime(2024, 1, 5)  # closed by the change
    assert u1["ana-maria"][CURRENT_COL]
    assert gold2.filter(F.col("user_id") == 3).count() == 1

    # watermark advanced: a third cycle with the same source is a no-op
    run_cycle(src2, "r3")
    assert flow.table(spark).read().count() == gold2.count()

    # run log captured every component; no failures in the alert window
    logged = log.read()
    assert logged.filter(F.col("status") == "Succeeded").count() == 9
    assert failed_runs_last(log, minutes=5).count() == 0


def test_cdc_flow_run_stream_checkpointed(spark, tmp_path):
    """CdcFlow.run_stream: the silver dir as a file stream, foreachBatch
    SCD2 merge, checkpoint ensures each drain only merges NEW files."""
    silver = str(tmp_path / "silver")
    flow = CdcFlow(
        name="dim_user", gold_base=str(tmp_path / "gold"), keys=["user_id"],
        sequence_by="updated_at", scd_type=2, tiebreakers=["name"],
    )

    def drain():
        stream = spark.readStream.schema(
            "user_id bigint, name string, updated_at timestamp"
        ).parquet(silver)
        flow.run_stream(spark, stream, str(tmp_path / "chk"))

    _users(spark, [(1, "ana", 1), (2, "bo", 1)]).coalesce(1).write.mode(
        "append"
    ).parquet(silver)
    drain()
    g1 = ParquetSnapshotTable(spark, flow.gold_base).read()
    assert g1.count() == 2 and g1.filter(F.col(CURRENT_COL)).count() == 2

    _users(spark, [(1, "ana-maria", 5)]).coalesce(1).write.mode(
        "append"
    ).parquet(silver)
    drain()
    g2 = ParquetSnapshotTable(spark, flow.gold_base).read()
    assert g2.count() == 3  # v2 of user 1 appended, v1 closed
    cur = {r.name for r in g2.filter(F.col(CURRENT_COL)).collect()}
    assert cur == {"ana-maria", "bo"}


def test_snapshot_time_travel(spark, tmp_path):
    """Retained snapshots are readable as versions (Delta-history
    analogue) until vacuum reclaims them."""
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(_users(spark, [(1, "ana", 1)]))
    t.overwrite(_users(spark, [(1, "ana", 1), (2, "bo", 2)]))
    assert len(t.history()) == 2
    assert t.read_version(0).count() == 1   # the pre-merge state
    assert t.read_version(-1).count() == 2  # == read()
    t.vacuum(keep_last=1)
    assert len(t.history()) == 1


def _cf_rows(df):
    return {
        tuple(r) for r in df.select(
            "id", "v", "_change_type", "_commit_version"
        ).collect()
    }


def test_change_feed_insert_update_delete_semantics(spark, tmp_path):
    """Delta CDF semantics on the snapshot backend: key-diffing
    consecutive versions yields exact insert / update pre+post / delete
    rows stamped with the committing version; ranges filter; a no-op
    overwrite contributes zero change rows; NULL-safe value compare."""
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    S = "id long, v string"
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b"), (4, None)], S))
    t.overwrite(
        spark.createDataFrame([(1, "a"), (2, "B"), (3, "c"), (4, None)], S)
    )  # v1: update 2, insert 3; 4 NULL->NULL is NOT an update
    t.overwrite(
        spark.createDataFrame([(1, "a"), (3, "c"), (4, "x")], S)
    )  # v2: delete 2, NULL->x update on 4

    assert _cf_rows(t.change_feed(["id"], 1, 1)) == {
        (2, "b", "update_preimage", 1),
        (2, "B", "update_postimage", 1),
        (3, "c", "insert", 1),
    }
    assert _cf_rows(t.change_feed(["id"], 2)) == {
        (2, "B", "delete", 2),
        (4, None, "update_preimage", 2),
        (4, "x", "update_postimage", 2),
    }
    assert len(_cf_rows(t.change_feed(["id"], 1))) == 6  # both versions

    t.overwrite(spark.createDataFrame([(1, "a"), (3, "c"), (4, "x")], S))
    assert t.change_feed(["id"], 3).count() == 0  # no-op commit


def test_change_feed_guards(spark, tmp_path):
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    S = "id long, v string"
    t.overwrite(spark.createDataFrame([(1, "a")], S))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], S))
    t.overwrite(spark.createDataFrame([(2, "b")], S))
    with pytest.raises(ValueError, match="from_version must be >= 1"):
        t.change_feed(["id"], 0)
    with pytest.raises(ValueError, match="outside committed range"):
        t.change_feed(["id"], 1, 9)
    with pytest.raises(ValueError, match="not in table"):
        t.change_feed(["nope"], 1)
    t.vacuum(keep_last=1)  # drops snapshots 0 and 1
    with pytest.raises(ValueError, match="vacuumed"):
        t.change_feed(["id"], 1)
    # duplicate keys make the diff ambiguous -> loud refusal
    d = ParquetSnapshotTable(spark, str(tmp_path / "dup"))
    d.overwrite(spark.createDataFrame([(1, "a"), (1, "b")], S))
    d.overwrite(spark.createDataFrame([(1, "a")], S))
    with pytest.raises(ValueError, match="duplicate key"):
        d.change_feed(["id"], 1).count()


def test_change_feed_from_cdc_flow_gold_table(spark, tmp_path):
    """The consumer story: an SCD1 CdcFlow's gold table exposes its
    per-epoch changes through change_feed — what a downstream
    incremental reader consumes instead of re-diffing snapshots."""
    silver = str(tmp_path / "silver")
    flow = CdcFlow(
        name="dim_user", gold_base=str(tmp_path / "gold"),
        keys=["user_id"], sequence_by="updated_at", scd_type=1,
        tiebreakers=["name"],
    )

    def drain():
        stream = spark.readStream.schema(
            "user_id bigint, name string, updated_at timestamp"
        ).parquet(silver)
        flow.run_stream(spark, stream, str(tmp_path / "chk"))

    _users(spark, [(1, "ana", 1), (2, "bo", 1)]).coalesce(1).write.mode(
        "append"
    ).parquet(silver)
    drain()
    _users(spark, [(1, "ana-maria", 5), (3, "cy", 2)]).coalesce(1).write.mode(
        "append"
    ).parquet(silver)
    drain()

    feed = ParquetSnapshotTable(spark, flow.gold_base).change_feed(
        ["user_id"], 1
    )
    got = sorted(
        (r.user_id, r.name, r._change_type, r._commit_version)
        for r in feed.collect()
    )
    assert got == sorted([
        (1, "ana", "update_preimage", 1),
        (1, "ana-maria", "update_postimage", 1),
        (3, "cy", "insert", 1),
    ])


# ---- r11: commit-time change partials (O(changes) CDF) -------------------


def _no_joins(df) -> bool:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return "Join" not in plan


def test_change_feed_persisted_partials_parity_and_zero_joins(spark, tmp_path):
    """A cdf_keys table persists each commit's diff once; pulls read the
    partials — byte-identical rows to the derived-diff control over the
    same history, with ZERO joins in the pull plan (the O(changes)
    cost model real Delta CDF has)."""
    S = "id long, v string"
    hist = [
        [(1, "a"), (2, "b"), (4, None)],
        [(1, "a"), (2, "B"), (3, "c"), (4, None)],
        [(1, "a"), (3, "c"), (4, "x")],
    ]
    fast = ParquetSnapshotTable(spark, str(tmp_path / "f"), cdf_keys=["id"])
    slow = ParquetSnapshotTable(spark, str(tmp_path / "s"))
    for rows in hist:
        fast.overwrite(spark.createDataFrame(rows, S))
        slow.overwrite(spark.createDataFrame(rows, S))
    got = fast.change_feed(["id"], 1)
    assert _no_joins(got), "partial-backed pull must not re-derive joins"
    assert not _no_joins(slow.change_feed(["id"], 1))  # control derives
    assert _cf_rows(got) == _cf_rows(slow.change_feed(["id"], 1))
    # windows filter on the persisted path too
    assert _cf_rows(fast.change_feed(["id"], 2, 2)) == _cf_rows(
        slow.change_feed(["id"], 2, 2)
    )


def test_change_feed_partials_survive_vacuum(spark, tmp_path):
    """Change partials outlive their snapshots: after vacuum drops the
    old snapshots, the same window still serves from persisted
    partials (the derived path would raise 'vacuumed')."""
    S = "id long, v string"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    t.overwrite(spark.createDataFrame([(1, "a")], S))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], S))
    t.overwrite(spark.createDataFrame([(2, "b")], S))
    t.vacuum(keep_last=1)
    assert len(t.history()) == 1
    assert _cf_rows(t.change_feed(["id"], 1)) == {
        (2, "b", "insert", 1),
        (1, "a", "delete", 2),
    }


def test_change_feed_commit_time_guards(spark, tmp_path):
    """cdf_keys moves the duplicate-key refusal to COMMIT time (before
    the repoint — the old table stays live), and a pull with a
    different key definition than the committing writer's refuses."""
    S = "id long, v string"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    t.overwrite(spark.createDataFrame([(1, "a")], S))
    with pytest.raises(ValueError, match="duplicate key"):
        t.overwrite(spark.createDataFrame([(2, "x"), (2, "y")], S))
    assert [r.id for r in t.read().collect()] == [1]  # old version live
    assert len(t.history()) == 1
    t.overwrite(spark.createDataFrame([(1, "a"), (3, "c")], S))
    with pytest.raises(ValueError, match="cdf_keys"):
        t.change_feed(["v"], 1)
    with pytest.raises(ValueError, match="not in incoming snapshot"):
        t.overwrite(spark.createDataFrame([("a",)], "other string"))


def test_change_feed_partial_crash_falls_back_to_derivation(spark, tmp_path):
    """A partial without Spark's _SUCCESS footer (crashed step) is
    invisible: the pull falls back to deriving that version's diff
    from retained snapshots and still returns exact rows."""
    import os

    S = "id long, v string"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    t.overwrite(spark.createDataFrame([(1, "a")], S))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], S))
    os.remove(os.path.join(t._changes_dir(1), "_SUCCESS"))
    feed = t.change_feed(["id"], 1)
    assert not _no_joins(feed)  # derivation ran for the crashed version
    assert _cf_rows(feed) == {(2, "b", "insert", 1)}


def test_scd1_cdc_flow_commits_change_partials(spark, tmp_path):
    """CdcFlow (SCD1) gold tables now carry commit-time CDF: the
    consumer's pull over a streamed history runs zero joins."""
    silver = str(tmp_path / "silver")
    flow = CdcFlow(
        name="dim_user", gold_base=str(tmp_path / "gold"),
        keys=["user_id"], sequence_by="updated_at", scd_type=1,
        tiebreakers=["name"], backend="parquet",
    )

    def drain():
        stream = spark.readStream.schema(
            "user_id bigint, name string, updated_at timestamp"
        ).parquet(silver)
        flow.run_stream(spark, stream, str(tmp_path / "chk"))

    _users(spark, [(1, "ana", 1), (2, "bo", 1)]).coalesce(1).write.mode(
        "append"
    ).parquet(silver)
    drain()
    _users(spark, [(1, "ana-maria", 5), (3, "cy", 2)]).coalesce(1).write.mode(
        "append"
    ).parquet(silver)
    drain()
    feed = flow.table(spark).change_feed(["user_id"], 1)
    assert _no_joins(feed)
    got = sorted(
        (r.user_id, r.name, r._change_type) for r in feed.collect()
    )
    assert got == sorted([
        (1, "ana", "update_preimage"),
        (1, "ana-maria", "update_postimage"),
        (3, "cy", "insert"),
    ])


def test_overwrite_cleans_same_version_orphans(spark, tmp_path):
    """A writer that crashed after writing its snapshot but before the
    repoint leaves an orphan directory at the version the retry then
    commits. The committing overwrite removes the failed attempt, so
    history()/read_version/diff derivation can never resolve that
    version to the crashed attempt's data."""
    import os

    S = "id long, v string"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    t.overwrite(spark.createDataFrame([(1, "a")], S))
    # crashed attempt at version 1: snapshot written, never repointed
    orphan = os.path.join(str(tmp_path / "t"), "snap-00000001-deadbeefcafe")
    spark.createDataFrame([(99, "junk")], S).write.parquet(orphan)
    assert len(t.history()) == 1  # orphan invisible (uncommitted)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], S))
    assert not os.path.exists(orphan)
    assert len(t.history()) == 2
    assert {r.id for r in t.read_version(1).collect()} == {1, 2}
    assert _cf_rows(t.change_feed(["id"], 1)) == {(2, "b", "insert", 1)}


def test_change_feed_across_schema_change(spark, tmp_path):
    """r12: a schema-changing overwrite persists a FULL-REWRITE partial
    (delete-all + insert-all — Delta's overwriteSchema CDF semantics),
    so change windows crossing the commit stay servable, under the
    newest schema (earlier rows null-fill added columns), with zero
    joins — and keep serving after the pre-change snapshots vacuum."""
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (3, "c")], "id long, v string"))  # v1: plain diff
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10), (3, "c", 30)], "id long, v string, w int"
    ))  # v2: adds column w -> full-rewrite partial

    feed = t.change_feed(["id"], 1)
    assert _no_joins(feed)  # both versions served from partials
    got = {
        tuple(r) for r in feed.select(
            "id", "v", "w", "_change_type", "_commit_version"
        ).collect()
    }
    assert got == {
        # v1 rows under the NEW schema: w null-filled
        (2, "b", None, "delete", 1),
        (3, "c", None, "insert", 1),
        # v2 = every old row deleted (w unknown -> null), every new
        # row inserted with real values
        (1, "a", None, "delete", 2),
        (3, "c", None, "delete", 2),
        (1, "a", 10, "insert", 2),
        (3, "c", 30, "insert", 2),
    }
    # single-version window crossing nothing keeps the old shape's data
    assert t.change_feed(["id"], 1, 1).count() == 2
    t.vacuum(keep_last=1)
    assert len(t.history()) == 1
    assert {
        tuple(r) for r in t.change_feed(["id"], 1).select(
            "id", "_change_type", "_commit_version"
        ).collect()
    } == {(r[0], r[3], r[4]) for r in got}


def test_schema_change_drop_column_feed_is_forward_schema(spark, tmp_path):
    """Dropping a column: the feed across the commit serves the NEW
    (narrower) schema; the dropped column's history stays readable via
    read_version, and an IVM view summing the dropped column refuses
    loudly instead of folding garbage."""
    from dataeng_azure_spotify_spark.operators.ivm import MaterializedAggregate

    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    t.overwrite(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, k string, x double"))
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, k string"))  # v1 drops x
    feed = t.change_feed(["id"], 1)
    assert set(feed.columns) == {"id", "k", "_change_type", "_commit_version"}
    assert feed.count() == 4  # delete-all + insert-all
    mat = MaterializedAggregate(
        str(tmp_path / "view"), keys=["k"], sums={"sx": "x"}
    )
    mat.apply_delta(t.read_version(0), run_id="cdf-v0")
    with pytest.raises(ValueError, match="lacks column"):
        mat.sync(spark, t)


def test_ivm_sync_folds_correctly_across_added_column(spark, tmp_path):
    """r12 pinned semantics: an IVM view summing a column ADDED by a
    schema-changing commit folds the crossing feed EXACTLY — the
    full-rewrite partial's deletes cancel every pre-change row (which
    never contributed to the new column) and its inserts add the real
    values, so the view equals a from-scratch aggregate of the live
    snapshot."""
    from dataeng_azure_spotify_spark.operators.ivm import MaterializedAggregate

    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    t.overwrite(spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, k string"))
    mat = MaterializedAggregate(
        str(tmp_path / "view"), keys=["k"], sums={"sw": "w"}
    )
    # seed from v0 under the view's schema (w not yet present -> null)
    mat.apply_delta(
        t.read_version(0).withColumn("w", F.lit(None).cast("double")),
        run_id="cdf-v0",
    )
    t.overwrite(spark.createDataFrame(
        [(1, "a", 5.0), (3, "b", 7.0)], "id long, k string, w double"))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 6.0), (3, "b", 7.0), (4, "b", 1.0)],
        "id long, k string, w double"))
    assert mat.sync(spark, t) == [1, 2]
    got = {
        r["k"]: (r["n_rows"], float(r["sw"]))
        for r in mat.current(spark).collect()
    }
    want = {
        r["k"]: (r["n"], float(r["s"]))
        for r in t.read().groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("w").cast("decimal(18,4)")).alias("s"),
        ).collect()
    }
    assert got == want == {"a": (1, 6.0), "b": (2, 8.0)}


def test_overwrite_without_partial_clears_crashed_stale_partial(
    spark, tmp_path
):
    """A keyless table never writes partials — but a crashed prior
    attempt (or a pre-downgrade layout) may have left a COMMITTED one
    at the version being committed. The commit removes it, so
    change_feed can never serve a failed attempt's stale diff for a
    committed version."""
    import os

    S = "id long, v string"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, "a")], S))
    # stale committed partial at version 1 from a crashed attempt
    stale = t._changes_dir(1)
    spark.createDataFrame(
        [(99, "junk", "insert", 1)],
        "id long, v string, _change_type string, _commit_version long",
    ).write.parquet(stale)
    assert os.path.exists(os.path.join(stale, "_SUCCESS"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], S))
    assert not os.path.exists(stale)  # removed at commit
    assert _cf_rows(t.change_feed(["id"], 1)) == {(2, "b", "insert", 1)}


def test_vacuum_change_partial_retention(spark, tmp_path):
    """vacuum(keep_changes=N) bounds the _changes control plane
    Delta-style: the newest N versions' partials survive, older pulls
    raise the vacuumed-range error; default retains everything."""
    import os

    S = "id long, v string"
    t = ParquetSnapshotTable(spark, str(tmp_path / "t"), cdf_keys=["id"])
    rows = [(1, "a")]
    t.overwrite(spark.createDataFrame(rows, S))
    for i in range(2, 6):  # versions 1..4
        rows = rows + [(i, chr(96 + i))]
        t.overwrite(spark.createDataFrame(rows, S))
    changes_root = os.path.join(str(tmp_path / "t"), "_changes")
    assert len(os.listdir(changes_root)) == 4
    t.vacuum(keep_last=1)  # default: partials all retained
    assert len(os.listdir(changes_root)) == 4
    t.vacuum(keep_last=1, keep_changes=2)  # keep v3, v4 only
    assert sorted(os.listdir(changes_root)) == ["v=00000003", "v=00000004"]
    assert t.change_feed(["id"], 3).count() == 2
    with pytest.raises(ValueError, match="vacuumed"):
        t.change_feed(["id"], 1)
