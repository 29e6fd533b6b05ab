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
