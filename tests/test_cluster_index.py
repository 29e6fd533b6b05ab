"""NearDupLabels persisted cluster index: build/append semantics.

The contract under test (operators/cluster_index.py): the artifact's
labels are EXACTLY the from-scratch ``ngram_jaccard_pairs`` +
``connected_components`` labeling — for the initial build AND after any
sequence of incremental appends — so every clusters-family consumer
(leakage-safe splits, per-source dup rates, survivor selection) can read
the artifact instead of recomputing corpus-wide pair-gen + CC per query.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.operators.cluster_index import NearDupLabels
from dataeng_azure_spotify_spark.operators.dedup import ngram_jaccard_pairs
from dataeng_azure_spotify_spark.operators.graph import connected_components

# slow tier (r14): incremental near-dup index e2e — exceeds the driver verify window; run with -m slow
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


def _batch_labels(docs, threshold=0.5, n=3):
    """The from-scratch reference labeling the artifact must equal."""
    pairs = ngram_jaccard_pairs(docs, threshold=threshold, n=n)
    return connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        nodes=docs.select(F.col("doc_id").alias("node")),
    )


def _as_dict(labels_df, k="doc_id", v="cluster_id"):
    return {r[k]: r[v] for r in labels_df.collect()}


def _corpus(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


@pytest.fixture()
def docs(spark):
    return _corpus(spark)


def test_build_equals_batch_labels(spark, docs, tmp_path):
    idx = NearDupLabels.build(docs, str(tmp_path / "ndl"))
    got = _as_dict(idx.labels())
    want = _as_dict(_batch_labels(docs), k="node", v="component")
    assert got == want and len(got) == docs.count()


def test_with_sizes_matches_group_counts(spark, docs, tmp_path):
    idx = NearDupLabels.build(docs, str(tmp_path / "ndl"))
    rows = idx.with_sizes().collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    for r in rows:
        assert r.cluster_size == len(by_cluster[r.cluster_id])


def test_append_equals_build_on_union(spark, docs, tmp_path):
    # three slices by doc_id ranges — appends cross slice boundaries,
    # so near-dup pairs straddle (old × new candidates must be found)
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    c1, c2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    base = docs.filter(F.col("doc_id") <= c1)
    b1 = docs.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2))
    b2 = docs.filter(F.col("doc_id") > c2)

    idx = NearDupLabels.build(base, str(tmp_path / "incr"))
    idx.append(b1, run_id="r1")
    out = idx.append(b2, run_id="r2")
    # append returns the batch's own labels
    assert set(_as_dict(out)) == {r.doc_id for r in b2.collect()}

    got = _as_dict(idx.labels())
    want = _as_dict(
        NearDupLabels.build(docs, str(tmp_path / "full")).labels()
    )
    assert got == want


def test_append_merges_existing_clusters(spark, tmp_path):
    # clusters {1,2} and {10,11}; doc 20 is near both → one merged
    # cluster labeled by the overall min (1)
    # J(bridge, t_a) = J(bridge, t_b) = 4/(10+6-4) = 1/3 ≥ 0.3
    t_a = "alpha beta gamma delta epsilon zeta eta theta"
    t_b = "one two three four five six seven eight"
    bridge = "alpha beta gamma delta epsilon zeta one two three four five six"
    base = spark.createDataFrame(
        [
            Row(doc_id=1, text=t_a),
            Row(doc_id=2, text=t_a + " extra"),
            Row(doc_id=10, text=t_b),
            Row(doc_id=11, text=t_b + " more"),
            Row(doc_id=30, text="totally unrelated content about spark plans"),
        ]
    )
    idx = NearDupLabels.build(base, str(tmp_path / "m"), threshold=0.3)
    before = _as_dict(idx.labels())
    assert before[1] == before[2] == 1 and before[10] == before[11] == 10
    assert before[30] == 30

    batch = spark.createDataFrame([Row(doc_id=20, text=bridge)])
    idx.append(batch, run_id="bridge")
    after = _as_dict(idx.labels())
    assert after[1] == after[2] == after[10] == after[11] == after[20] == 1
    assert after[30] == 30
    # equality with the from-scratch build on the union
    want = _as_dict(
        NearDupLabels.build(
            base.union(batch), str(tmp_path / "m_full"), threshold=0.3
        ).labels()
    )
    assert after == want


def test_new_doc_becomes_cluster_min(spark, tmp_path):
    # a new doc with a SMALLER id than the existing cluster min must
    # relabel the old cluster to its id (labels = component min, same
    # as a from-scratch build)
    t = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    base = spark.createDataFrame(
        [Row(doc_id=100, text=t), Row(doc_id=101, text=t + " sed")]
    )
    idx = NearDupLabels.build(base, str(tmp_path / "min"), threshold=0.3)
    idx.append(
        spark.createDataFrame([Row(doc_id=7, text=t + " do")]), run_id="small"
    )
    got = _as_dict(idx.labels())
    assert got == {100: 7, 101: 7, 7: 7}


def test_committed_replay_is_noop(spark, docs, tmp_path):
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    base, batch = (
        docs.filter(F.col("doc_id") <= cut),
        docs.filter(F.col("doc_id") > cut),
    )
    idx = NearDupLabels.build(base, str(tmp_path / "rp"))
    first = _as_dict(idx.append(batch, run_id="e1"))
    again = _as_dict(idx.append(batch, run_id="e1"))  # committed replay
    assert first == again
    assert idx.runs().count("e1") == 1  # marker written once
    assert _as_dict(idx.labels()) == _as_dict(
        NearDupLabels.build(docs, str(tmp_path / "rp_full")).labels()
    )


def test_crash_replay_converges(spark, docs, tmp_path, monkeypatch):
    # crash AFTER the label-bucket rewrite but BEFORE the run marker:
    # the replay must recompute against the pre-run state and converge
    # to the same labels as an uninterrupted append
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    base, batch = (
        docs.filter(F.col("doc_id") <= cut),
        docs.filter(F.col("doc_id") > cut),
    )
    idx = NearDupLabels.build(base, str(tmp_path / "cr"))

    real_mark = NearDupLabels._mark_run

    def boom(self, run_id):
        raise RuntimeError("simulated crash before run-marker commit")

    monkeypatch.setattr(NearDupLabels, "_mark_run", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.append(batch, run_id="e1")
    monkeypatch.setattr(NearDupLabels, "_mark_run", real_mark)

    idx.append(batch, run_id="e1")  # replay with the SAME run_id
    got = _as_dict(idx.labels())
    want = _as_dict(
        NearDupLabels.build(docs, str(tmp_path / "cr_full")).labels()
    )
    assert got == want
    # every doc labeled exactly once (the dropDuplicates safety net)
    assert idx.labels().count() == len(got)


def test_crash_replay_new_doc_merged_into_old_cluster(spark, tmp_path, monkeypatch):
    # THE corrupting replay shape (r7 review finding): the crashed
    # attempt already wrote the batch doc's label row (50 → cluster 1,
    # bucket 1). On replay the label lookup must NOT see that row —
    # otherwise doc 50 contracts away, new_labels re-files it as
    # (50, 50) in bucket 50, and the index carries two conflicting
    # rows for one doc.
    t = "alpha beta gamma delta epsilon zeta eta theta"
    base = spark.createDataFrame(
        [Row(doc_id=1, text=t), Row(doc_id=2, text=t + " extra")]
    )
    idx = NearDupLabels.build(base, str(tmp_path / "mc"), threshold=0.3)
    assert _as_dict(idx.labels()) == {1: 1, 2: 1}

    def boom(self, run_id):
        raise RuntimeError("simulated crash before run-marker commit")

    monkeypatch.setattr(NearDupLabels, "_mark_run", boom)
    batch = spark.createDataFrame([Row(doc_id=50, text=t + " near")])
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.append(batch, run_id="e1")
    # the crashed attempt's label write IS visible mid-crash
    assert _as_dict(idx.labels())[50] == 1

    monkeypatch.undo()
    idx.append(batch, run_id="e1")
    assert _as_dict(idx.labels()) == {1: 1, 2: 1, 50: 1}
    assert idx.labels().count() == 3  # exactly one row per doc


def test_crash_between_write_and_clean_converges(spark, tmp_path, monkeypatch):
    # a cross-bucket merge relabels every row of a bucket away; crash
    # AFTER the dynamic-overwrite write but BEFORE the emptied-partition
    # clean leaves stale duplicate labels — the replay must re-derive
    # the relabel from the duplicated state and converge
    t_a = "alpha beta gamma delta epsilon zeta eta theta"
    t_b = "one two three four five six seven eight"
    bridge = "alpha beta gamma delta epsilon zeta one two three four five six"
    base = spark.createDataFrame(
        [
            Row(doc_id=1, text=t_a),
            Row(doc_id=10, text=t_b),
        ]
    )
    idx = NearDupLabels.build(base, str(tmp_path / "wc"), threshold=0.3)
    real_clean = NearDupLabels._clean_emptied

    def boom(self, buckets):
        if buckets:
            raise RuntimeError("simulated crash before emptied-bucket clean")
        real_clean(self, buckets)

    monkeypatch.setattr(NearDupLabels, "_clean_emptied", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.append(
            spark.createDataFrame([Row(doc_id=20, text=bridge)]),
            run_id="e1",
        )
    # stale duplicate visible mid-crash: doc 10 labeled both 1 and 10
    mid = sorted((r.doc_id, r.cluster_id) for r in idx.labels().collect())
    assert (10, 1) in mid and (10, 10) in mid

    monkeypatch.setattr(NearDupLabels, "_clean_emptied", real_clean)
    idx.append(
        spark.createDataFrame([Row(doc_id=20, text=bridge)]), run_id="e1"
    )
    assert _as_dict(idx.labels()) == {1: 1, 10: 1, 20: 1}
    assert idx.labels().count() == 3


def test_double_admit_raises(spark, docs, tmp_path):
    idx = NearDupLabels.build(docs, str(tmp_path / "da"))
    with pytest.raises(ValueError, match="already in the index"):
        idx.append(docs.limit(3), run_id="dup-run")


def test_build_run_id_reserved(spark, docs, tmp_path):
    idx = NearDupLabels.build(docs, str(tmp_path / "rr"))
    with pytest.raises(ValueError, match="reserved"):
        idx.append(docs.limit(1), run_id="build")


def test_init_then_appends_equal_build(spark, docs, tmp_path):
    # the from-scratch streaming shape: empty init, every doc arrives
    # through append
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    b1, b2 = (
        docs.filter(F.col("doc_id") <= cut),
        docs.filter(F.col("doc_id") > cut),
    )
    idx = NearDupLabels.init(spark, str(tmp_path / "st"))
    assert idx.labels().count() == 0
    idx.append(b1, run_id="e0")
    idx.append(b2, run_id="e1")
    got = _as_dict(idx.labels())
    want = _as_dict(
        NearDupLabels.build(docs, str(tmp_path / "st_full")).labels()
    )
    assert got == want


def test_append_rewrites_only_touched_buckets(spark, tmp_path):
    # an append whose batch touches one cluster must leave every other
    # bucket's files untouched (dynamic partition overwrite)
    rows = [
        Row(doc_id=i, text=f"unique content block number {i} with distinct words w{i}")
        for i in range(40)
    ]
    t = "shared near duplicate text body for the touched cluster"
    rows += [Row(doc_id=100, text=t), Row(doc_id=101, text=t + " v2")]
    base = spark.createDataFrame(rows)
    path = str(tmp_path / "tb")
    idx = NearDupLabels.build(base, path, threshold=0.3, num_buckets=8)

    lbl_dir = os.path.join(path, "labels")
    def snapshot():
        out = {}
        for b in os.listdir(lbl_dir):
            if not b.startswith("bucket="):
                continue
            d = os.path.join(lbl_dir, b)
            out[b] = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )
        return out

    before = snapshot()
    idx.append(
        spark.createDataFrame([Row(doc_id=102, text=t + " v3")]),
        run_id="touch",
    )
    after = snapshot()
    touched = {b for b in after if before.get(b) != after[b]}
    # cluster 100 lives in bucket 100 % 8 == 4; nothing else moves
    assert touched == {"bucket=4"}
    untouched = set(before) - touched
    assert untouched and all(before[b] == after[b] for b in untouched)


def test_append_refuses_older_artifact_format(spark, docs, tmp_path):
    # a v1-era index (meta rows carry no format_version; prefix rows
    # carry no n_sh/pos) must be rejected loudly — NULL-filled filter
    # columns would silently drop every new-vs-old candidate
    path = str(tmp_path / "v1")
    idx = NearDupLabels.build(docs, path)
    meta = idx.meta
    spark.createDataFrame(
        [(meta["threshold"], meta["n"], meta["num_buckets"],
          meta["text_col"], meta["id_col"])],
        "threshold double, n int, num_buckets int, text_col string, id_col string",
    ).coalesce(1).write.mode("overwrite").parquet(idx._meta_path)
    stale = NearDupLabels.load(spark, path)
    with pytest.raises(ValueError, match="format"):
        stale.append(docs.limit(1), run_id="v1-era")


def test_rebuild_over_appended_index_discards_stale_runs(spark, docs, tmp_path):
    # build() over an existing index must leave NOTHING of the old one:
    # its run-partitioned dirs are written with dynamic overwrite, which
    # alone would only replace run=build — stale append partitions would
    # feed later appends and stale run markers would short-circuit a
    # reused run_id as a replay
    path = str(tmp_path / "rb")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    half = docs.filter(F.col("doc_id") <= cut)
    old = NearDupLabels.build(docs, path)
    old.append(
        spark.createDataFrame(
            [Row(doc_id=10_000_001, text="completely fresh appended doc")]
        ),
        run_id="old-epoch",
    )
    rebuilt = NearDupLabels.build(half, path)
    assert "old-epoch" not in rebuilt.runs()
    got = _as_dict(rebuilt.labels())
    want = _as_dict(_batch_labels(half), k="node", v="component")
    assert got == want  # no doc from the discarded index survives
    # and the reused run_id is NOT mistaken for a committed replay
    rebuilt.append(
        spark.createDataFrame(
            [Row(doc_id=10_000_002, text="another fresh appended doc")]
        ),
        run_id="old-epoch",
    )
    assert 10_000_002 in _as_dict(rebuilt.labels())


def test_reads_refuse_newer_artifact_format(spark, docs, tmp_path):
    # an index written by FUTURE code must not be silently misread (or
    # worse, "upgraded" by a rebuild) — labels() and append() both stop
    path = str(tmp_path / "vnext")
    idx = NearDupLabels.build(docs, path)
    meta = idx.meta
    spark.createDataFrame(
        [(meta["threshold"], meta["n"], meta["num_buckets"],
          meta["text_col"], meta["id_col"], 99)],
        "threshold double, n int, num_buckets int, text_col string, "
        "id_col string, format_version int",
    ).coalesce(1).write.mode("overwrite").parquet(idx._meta_path)
    future = NearDupLabels.load(spark, path)
    with pytest.raises(ValueError, match="upgrade this engine"):
        future.labels()
    with pytest.raises(ValueError, match="upgrade this engine"):
        future.append(docs.limit(1), run_id="vnext-era")


def test_rebuild_refuses_to_destroy_newer_artifact(spark, docs, tmp_path):
    # build() over a NEWER-format index must refuse before deleting
    # anything (rebuild is the upgrade path for OLDER layouts only)
    path = str(tmp_path / "vnext_rb")
    idx = NearDupLabels.build(docs, path)
    meta = idx.meta
    spark.createDataFrame(
        [(meta["threshold"], meta["n"], meta["num_buckets"],
          meta["text_col"], meta["id_col"], 99)],
        "threshold double, n int, num_buckets int, text_col string, "
        "id_col string, format_version int",
    ).coalesce(1).write.mode("overwrite").parquet(idx._meta_path)
    with pytest.raises(ValueError, match="refusing to rebuild"):
        NearDupLabels.build(docs, path)
    assert os.path.exists(idx._labels_path)  # nothing was deleted


def test_metaless_crash_state_reads_as_absent(spark, docs, tmp_path):
    # meta is written LAST by build(); if a crash leaves component dirs
    # without meta, the index must read as absent — labels() empty,
    # runs() empty — never as half-rebuilt data
    import shutil

    path = str(tmp_path / "crashed")
    idx = NearDupLabels.build(docs, path)
    shutil.rmtree(idx._meta_path)
    crashed = NearDupLabels.load(spark, path)
    assert not crashed.exists()
    assert crashed.labels().count() == 0
    assert crashed.runs() == []


def test_rebuild_from_own_labels_lineage(spark, docs, tmp_path):
    # rebuild whose input DataFrame lazily READS this index's artifact:
    # the clear must not destroy the build's own input (inputs are
    # materialized before the artifact is cleared)
    path = str(tmp_path / "selfref")
    idx = NearDupLabels.build(docs, path)
    keep = idx.labels().select("doc_id")  # lazy read of the artifact
    subset = docs.join(keep, "doc_id")
    rebuilt = NearDupLabels.build(subset, path)
    got = _as_dict(rebuilt.labels())
    want = _as_dict(_batch_labels(docs), k="node", v="component")
    assert got == want  # keep == all docs, so labels equal from-scratch


def test_layout_version_reporting(spark, docs, tmp_path):
    # cache owners rebuild on ver < FORMAT_VERSION; absent reads None
    from dataeng_azure_spotify_spark.operators.cluster_index import (
        FORMAT_VERSION,
    )

    absent = NearDupLabels.load(spark, str(tmp_path / "nope"))
    assert absent.layout_version() is None
    idx = NearDupLabels.build(docs, str(tmp_path / "cur"))
    assert idx.layout_version() == FORMAT_VERSION
    meta = idx.meta
    spark.createDataFrame(
        [(meta["threshold"], meta["n"], meta["num_buckets"],
          meta["text_col"], meta["id_col"])],
        "threshold double, n int, num_buckets int, text_col string, id_col string",
    ).coalesce(1).write.mode("overwrite").parquet(idx._meta_path)
    assert NearDupLabels.load(spark, str(tmp_path / "cur")).layout_version() == 1


def test_footerless_runs_dir_reads_as_zero_runs(spark, docs, tmp_path):
    # a crash during _mark_run can leave runs/ existing with no committed
    # parquet footer (only _temporary debris); the schema-explicit read
    # must see zero runs — not brick every later append with a
    # schema-inference AnalysisException
    import os
    import shutil

    path = str(tmp_path / "footerless")
    idx = NearDupLabels.build(docs, path)
    shutil.rmtree(idx._runs_path)
    os.makedirs(idx._runs_path)  # exists, but empty — no footer to infer
    assert NearDupLabels.load(spark, path).runs() == []
    # and the index remains appendable
    more = docs.select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    ).limit(3)
    NearDupLabels.load(spark, path).append(more, run_id="after-crash")
    assert "after-crash" in NearDupLabels.load(spark, path).runs()


# -- remove (right-to-be-forgotten) ------------------------------------

T_A = "alpha beta gamma delta epsilon zeta eta theta"
T_B = "one two three four five six seven eight"
BRIDGE = "alpha beta gamma delta epsilon zeta one two three four five six"


def _ids_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id long")


def test_remove_equals_build_on_remaining(spark, docs, tmp_path):
    # remove a spread of docs (every 7th — lands inside real clusters)
    # from the corpus-scale index; labels must equal a from-scratch
    # build on the remaining corpus
    idx = NearDupLabels.build(docs, str(tmp_path / "rm"))
    rm_ids = [r.doc_id for r in docs.select("doc_id").collect()][::7]
    out = idx.remove(_ids_df(spark, rm_ids), run_id="gdpr1")
    assert out["removed_labels"] == len(rm_ids) and not out["replay"]
    remaining = docs.join(_ids_df(spark, rm_ids), "doc_id", "left_anti")
    want = _as_dict(
        NearDupLabels.build(remaining, str(tmp_path / "rm_full")).labels()
    )
    assert _as_dict(idx.labels()) == want


def test_remove_splits_bridged_cluster(spark, tmp_path):
    # doc 20 is the witness bridging {1,2} and {10,11}; removing it must
    # SPLIT the merged cluster back into two components
    base = spark.createDataFrame(
        [
            Row(doc_id=1, text=T_A),
            Row(doc_id=2, text=T_A + " extra"),
            Row(doc_id=10, text=T_B),
            Row(doc_id=11, text=T_B + " more"),
            Row(doc_id=20, text=BRIDGE),
        ]
    )
    idx = NearDupLabels.build(base, str(tmp_path / "sp"), threshold=0.3)
    assert set(_as_dict(idx.labels()).values()) == {1}  # one merged cluster
    out = idx.remove(_ids_df(spark, [20]), run_id="forget20")
    assert out["affected_clusters"] == 1
    got = _as_dict(idx.labels())
    # {1,2} and {10,11} are each internally near-dup pairs: the merged
    # cluster splits back into exactly those two components
    assert got == {1: 1, 2: 1, 10: 10, 11: 10}
    want = _as_dict(
        NearDupLabels.build(
            base.filter(F.col("doc_id") != 20),
            str(tmp_path / "sp_full"),
            threshold=0.3,
        ).labels()
    )
    assert got == want


def test_remove_purges_shingles_so_no_ghost_links(spark, tmp_path):
    # after removal, a new near-dup of the REMOVED doc must become a
    # singleton (no candidate edge to a deleted document), and the
    # stored shingle/prefix partitions must no longer contain the doc
    base = spark.createDataFrame(
        [Row(doc_id=1, text="completely separate subject matter here"),
         Row(doc_id=2, text=T_A)]
    )
    path = str(tmp_path / "gh")
    idx = NearDupLabels.build(base, path, threshold=0.3)
    idx.remove(_ids_df(spark, [2]), run_id="forget2")
    assert _as_dict(idx.labels()) == {1: 1}
    for part in ("shingles", "prefix"):
        stored = spark.read.parquet(os.path.join(path, part))
        assert stored.filter(F.col("doc") == 2).count() == 0
    # the would-be near-dup of the deleted doc arrives later
    idx.append(
        spark.createDataFrame([Row(doc_id=50, text=T_A + " near")]),
        run_id="later",
    )
    assert _as_dict(idx.labels()) == {1: 1, 50: 50}
    # and the removed id itself may be re-admitted under a new run
    idx.append(spark.createDataFrame([Row(doc_id=2, text=T_A)]), run_id="back")
    got = _as_dict(idx.labels())
    assert got[2] == got[50] == 2  # re-linked to the new near-dup


def test_remove_committed_replay_is_noop(spark, tmp_path):
    base = spark.createDataFrame(
        [Row(doc_id=1, text=T_A), Row(doc_id=2, text=T_A + " extra")]
    )
    idx = NearDupLabels.build(base, str(tmp_path / "rn"), threshold=0.3)
    first = idx.remove(_ids_df(spark, [2]), run_id="g1")
    assert first["removed_labels"] == 1
    again = idx.remove(_ids_df(spark, [2]), run_id="g1")
    assert again["replay"] and again["removed_labels"] == 0
    assert idx.runs().count("g1") == 1
    assert _as_dict(idx.labels()) == {1: 1}


def test_remove_crash_replay_converges(spark, tmp_path, monkeypatch):
    # crash BEFORE the run marker: replaying the same run_id must
    # converge to the same final state (split case included)
    base = spark.createDataFrame(
        [
            Row(doc_id=1, text=T_A),
            Row(doc_id=2, text=T_A + " extra"),
            Row(doc_id=10, text=T_B),
            Row(doc_id=11, text=T_B + " more"),
            Row(doc_id=20, text=BRIDGE),
        ]
    )
    idx = NearDupLabels.build(base, str(tmp_path / "cr"), threshold=0.3)

    def boom(self, run_id):
        raise RuntimeError("simulated crash before run-marker commit")

    monkeypatch.setattr(NearDupLabels, "_mark_run", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.remove(_ids_df(spark, [20]), run_id="g1")
    monkeypatch.undo()

    idx.remove(_ids_df(spark, [20]), run_id="g1")  # replay, same run_id
    got = _as_dict(idx.labels())
    assert got == {1: 1, 2: 1, 10: 10, 11: 10}
    assert idx.labels().count() == 4
    for part in ("shingles", "prefix"):
        stored = spark.read.parquet(os.path.join(str(tmp_path / "cr"), part))
        assert stored.filter(F.col("doc") == 20).count() == 0


def test_remove_crash_between_write_and_clean_converges(
    spark, tmp_path, monkeypatch
):
    # whole-cluster removal empties its bucket; crash AFTER the label
    # write but BEFORE the emptied-bucket clean leaves the stale rows —
    # the replay must re-derive the removal from them and converge
    base = spark.createDataFrame(
        [
            Row(doc_id=2, text=T_A),
            Row(doc_id=3, text=T_A + " extra"),
            Row(doc_id=10, text=T_B),
        ]
    )
    idx = NearDupLabels.build(base, str(tmp_path / "wc"), threshold=0.3)
    assert _as_dict(idx.labels()) == {2: 2, 3: 2, 10: 10}
    real_clean = NearDupLabels._clean_emptied

    def boom(self, buckets):
        if buckets:
            raise RuntimeError("simulated crash before emptied-bucket clean")
        real_clean(self, buckets)

    monkeypatch.setattr(NearDupLabels, "_clean_emptied", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.remove(_ids_df(spark, [2, 3]), run_id="g1")
    # stale rows of the emptied bucket are visible mid-crash
    assert {r.doc_id for r in idx.labels().collect()} >= {2, 3}

    monkeypatch.setattr(NearDupLabels, "_clean_emptied", real_clean)
    idx.remove(_ids_df(spark, [2, 3]), run_id="g1")
    assert _as_dict(idx.labels()) == {10: 10}
    assert idx.labels().count() == 1


def test_remove_rewrites_only_touched_buckets(spark, tmp_path):
    # removing one cluster's doc must leave every other bucket's files
    # byte-untouched (dynamic partition overwrite + targeted clean)
    rows = [
        Row(doc_id=i, text=f"unique content block number {i} with distinct words w{i}")
        for i in range(40)
    ]
    t = "shared near duplicate text body for the touched cluster"
    rows += [Row(doc_id=100, text=t), Row(doc_id=101, text=t + " v2")]
    base = spark.createDataFrame(rows)
    path = str(tmp_path / "tb")
    idx = NearDupLabels.build(base, path, threshold=0.3, num_buckets=8)

    lbl_dir = os.path.join(path, "labels")

    def snapshot():
        out = {}
        for b in os.listdir(lbl_dir):
            if not b.startswith("bucket="):
                continue
            d = os.path.join(lbl_dir, b)
            out[b] = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        return out

    before = snapshot()
    # cluster {100, 101} lives in bucket 100 % 8 == 4; removing 100
    # relabels the survivor to cluster 101 — bucket 101 % 8 == 5
    idx.remove(_ids_df(spark, [100]), run_id="t1")
    after = snapshot()
    touched = {b for b in set(before) | set(after) if before.get(b) != after.get(b)}
    assert touched == {"bucket=4", "bucket=5"}
    untouched = set(before) - touched
    assert untouched and all(before[b] == after[b] for b in untouched)
    got = _as_dict(idx.labels())
    assert got[101] == 101 and 100 not in got


def test_remove_absent_ids_is_safe(spark, tmp_path):
    base = spark.createDataFrame([Row(doc_id=1, text=T_A)])
    idx = NearDupLabels.build(base, str(tmp_path / "ab"), threshold=0.3)
    out = idx.remove(_ids_df(spark, [999]), run_id="g0")
    assert out["removed_labels"] == 0 and out["affected_clusters"] == 0
    assert _as_dict(idx.labels()) == {1: 1}
