"""Engine facade: pure delegation (every attribute IS the underlying
function) and the README quickstart pipeline runs end-to-end on it."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_facade_is_pure_delegation(spark):
    """Zero logic: each namespace attribute must be identical (is) to
    the module-level function/class it fronts — the facade can never
    drift from the engine."""
    from dataeng_azure_spotify_spark import Engine
    from dataeng_azure_spotify_spark.operators import (
        analytics,
        asof,
        curation,
        dedup,
        graph,
        ranking,
        relational,
        scd,
        similarity,
        sketch,
    )
    from dataeng_azure_spotify_spark.streaming import asof as stream_asof
    from dataeng_azure_spotify_spark.streaming import funnel as stream_funnel

    eng = Engine(spark, SF)
    assert eng.dedup.exact is dedup.exact_dedup_groups
    assert eng.dedup.minhash_pairs is dedup.minhash_lsh_pairs
    assert eng.dedup.simhash_pairs is dedup.simhash_neardup_pairs
    assert eng.graph.components is graph.connected_components
    assert eng.graph.pagerank is graph.pagerank
    assert eng.similarity.topk is similarity.cosine_topk
    assert eng.similarity.index is similarity.IvfIndex
    assert eng.scd.upsert is scd.apply_scd1
    assert eng.scd.asof_join is asof.asof_join
    assert eng.analytics.funnel is analytics.funnel
    assert eng.curate.decontaminate is curation.decontaminate
    assert eng.curate.heavy_hitters is sketch.heavy_hitters
    assert eng.rank.bm25_topk is ranking.bm25_topk
    assert eng.relational.expectations_drop is relational.expectations_drop
    assert eng.stream.funnel is stream_funnel.funnel_stage_stream
    assert eng.stream.asof_enrich is stream_asof.asof_enrich_stream

    from dataeng_azure_spotify_spark.functions import text as text_fns
    from dataeng_azure_spotify_spark.sources import jsonl

    assert eng.ingest.read_jsonl is jsonl.read_jsonl
    assert eng.ingest.jsonl_documents is jsonl.jsonl_documents
    assert eng.text.compression_ratio is text_fns.compression_ratio


def test_quickstart_pipeline_end_to_end(spark, tmp_path):
    """The README quickstart, verbatim shape: bronze→silver (clean +
    dedup) → gold (SCD1 + versioned snapshot) → curation (near-dup
    clusters, survivor pick, quality filter) → analytics, all from one
    Engine handle."""
    from dataeng_azure_spotify_spark import Engine

    eng = Engine(spark, SF)

    # silver: expectations + latest-per-key dedup over raw events
    events = eng.relational.expectations_drop(
        eng.table("events"), {"has_user": "user_id IS NOT NULL"}
    )
    events = eng.relational.latest_per_key(
        events, keys=["event_id"], sequence_by="ts"
    )
    assert events.count() > 0

    # gold: SCD1 customer dimension + versioned snapshot table
    cust = eng.table("customer")
    n_cust = cust.count()
    updates = cust.withColumn("c_acctbal", F.col("c_acctbal") + 1).withColumn(
        "__seq", F.lit(2)
    )
    dim = eng.scd.upsert(
        cust.withColumn("__seq", F.lit(1)),
        updates,
        keys=["c_custkey"],
        sequence_by="__seq",
    )
    snap = eng.stream.snapshot_table(spark, str(tmp_path / "gold_customer"))
    snap.overwrite(dim)
    assert snap.read().count() == n_cust

    # curation: near-dup pairs -> components -> keep the best copy
    docs = eng.table("documents")
    pairs = eng.dedup.simhash_pairs(docs, max_hamming=6)
    labels = eng.graph.components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        nodes=docs.select(F.col("doc_id").alias("node")),
    )
    scores = docs.select(
        F.col("doc_id").alias("node"), F.length("text").alias("score")
    )
    best = eng.graph.keep_best(labels, scores)
    n_docs, n_best = docs.count(), best.count()
    assert 0 < n_best <= n_docs

    # analytics over the silver events
    fun = eng.analytics.funnel(events, steps=["view", "click", "purchase"])
    assert {r["step"] for r in fun.collect()} == {"view", "click", "purchase"}

    # catalog SQL with an extra DataFrame view
    top = eng.sql(
        "SELECT component, COUNT(*) n FROM comp GROUP BY 1 ORDER BY n DESC LIMIT 1",
        comp=labels,
    )
    assert top.count() == 1


def test_engine_sql_cleans_up_created_views(spark):
    from dataeng_azure_spotify_spark import Engine

    eng = Engine(spark, SF)
    df = spark.createDataFrame([(1,)], "x long")
    assert eng.sql("SELECT SUM(x) s FROM tmp_probe_v", tmp_probe_v=df).collect()[0].s == 1
    # view created by the call is gone; the returned DataFrame resolved
    # eagerly so it kept working anyway
    assert not spark.catalog.tableExists("tmp_probe_v")
    # pre-existing views survive (replaced content, but not dropped)
    spark.createDataFrame([(5,)], "x long").createOrReplaceTempView("keep_v")
    eng.sql("SELECT * FROM keep_v", keep_v=df).collect()
    assert spark.catalog.tableExists("keep_v")
    spark.catalog.dropTempView("keep_v")


def test_engine_sql_refuses_permanent_table_shadowing(spark, tmp_path):
    """A kwarg named like a PERMANENT table must raise — creating the
    temp view would silently shadow that table for the whole session
    (temp views win name resolution), and the old cleanup logic would
    then never drop it (tableExists was true before the call)."""
    from dataeng_azure_spotify_spark import Engine

    eng = Engine(spark, SF)
    df = spark.createDataFrame([(1,)], "x long")
    spark.sql("DROP TABLE IF EXISTS perm_probe_t")
    spark.createDataFrame([(9,)], "x long").write.mode("overwrite").option(
        "path", str(tmp_path / "perm_probe_t")
    ).saveAsTable("perm_probe_t")
    try:
        try:
            eng.sql("SELECT * FROM perm_probe_t", perm_probe_t=df)
        except ValueError as e:
            assert "permanent" in str(e)
        else:
            raise AssertionError("permanent-table collision did not raise")
        # and no shadowing temp view was left behind
        assert (
            spark.sql("SELECT x FROM perm_probe_t").collect()[0].x == 9
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS perm_probe_t")


def test_engine_sql_drops_views_when_query_raises(spark):
    """Views created by a failing call must not outlive it: neither a
    mid-loop permanent-table collision nor a bad query may leak the
    kwarg views already created (cleanup runs in a finally)."""
    import pytest as _pytest

    from dataeng_azure_spotify_spark import Engine

    eng = Engine(spark, SF)
    df = spark.createDataFrame([(1,)], "x long")
    with _pytest.raises(Exception):
        eng.sql("SELECT broken syntax FROM nowhere(", leak_probe_v=df)
    assert not spark.catalog.tableExists("leak_probe_v")
    # mid-loop collision: first kwarg view created, second raises on a
    # permanent-table collision — the first must still be dropped
    spark.sql("DROP TABLE IF EXISTS perm_probe_u")
    spark.createDataFrame([(9,)], "x long").write.saveAsTable("perm_probe_u")
    try:
        with _pytest.raises(ValueError):
            eng.sql(
                "SELECT 1", a_first_view=df, perm_probe_u=df
            )
        assert not spark.catalog.tableExists("a_first_view")
    finally:
        spark.sql("DROP TABLE IF EXISTS perm_probe_u")


def test_engine_sql_case_insensitive_pre_temp(spark):
    """Spark identifiers are case-insensitive by default: a kwarg that
    names a pre-existing temp view in different case must REPLACE it
    (documented behavior), not be misclassified as a permanent-table
    collision."""
    from dataeng_azure_spotify_spark import Engine

    eng = Engine(spark, SF)
    spark.createDataFrame([(5,)], "x long").createOrReplaceTempView("CaseView")
    try:
        df = spark.createDataFrame([(7,)], "x long")
        out = eng.sql("SELECT SUM(x) s FROM caseview", CASEVIEW=df)
        assert out.collect()[0].s == 7  # replaced content
        assert spark.catalog.tableExists("caseview")  # not dropped
    finally:
        spark.catalog.dropTempView("CaseView")


def test_register_artifact_validation(spark, tmp_path):
    """Registry guards: no remove() -> TypeError; duplicate name ->
    ValueError (a silent replace would drop one artifact from every
    future GDPR fan-out); default name is ClassName:path."""
    import pytest as _pytest

    from dataeng_azure_spotify_spark import Engine
    from dataeng_azure_spotify_spark.operators.similarity import IvfIndex

    eng = Engine(spark, SF)
    with _pytest.raises(TypeError, match="remove"):
        eng.register_artifact(object())
    emb = eng.table("embeddings").limit(20)
    idx = IvfIndex.build(emb, str(tmp_path / "ivf"), num_centroids=2)
    name = eng.register_artifact(idx)
    assert name == f"IvfIndex:{tmp_path / 'ivf'}"
    with _pytest.raises(ValueError, match="already registered"):
        eng.register_artifact(idx)
    assert eng.register_artifact(idx, name="ivf2") == "ivf2"


def test_remove_document_fans_out_to_all_artifacts(spark, tmp_path):
    """One remove_document call retracts a doc from all four persisted
    artifact classes and returns a per-artifact summary; a same-run_id
    re-invocation is a no-op on every artifact (the crash-retry
    contract); run_id is demanded exactly when a registered artifact
    needs it."""
    import pytest as _pytest

    from dataeng_azure_spotify_spark import Engine
    from dataeng_azure_spotify_spark.operators.cluster_index import (
        NearDupLabels,
    )
    from dataeng_azure_spotify_spark.operators.similarity import (
        IvfIndex,
        SemanticDedupIndex,
    )
    from dataeng_azure_spotify_spark.operators.substring import (
        SubstringDupIndex,
    )

    eng = Engine(spark, SF)
    docs = eng.table("documents").limit(40).localCheckpoint(eager=True)
    emb = eng.table("embeddings").limit(40).localCheckpoint(eager=True)

    labels = NearDupLabels.build(docs, str(tmp_path / "ndl"))
    grams = SubstringDupIndex.build(docs, str(tmp_path / "sub"), k=8)
    ivf = IvfIndex.build(emb, str(tmp_path / "ivf"), num_centroids=4)
    sem = SemanticDedupIndex.build(
        emb, str(tmp_path / "sem"), threshold=0.99, k=4, iters=1
    )
    for art in (labels, grams, ivf, sem):
        eng.register_artifact(art)
    assert len(eng.artifacts) == 4

    # a target id present in every artifact (semantic keepers are the
    # narrowest set; labels/buckets hold everything)
    kept_vids = {r.vid for r in sem.keepers().select("vid").collect()}
    gram_docs = {r.doc for r in grams.grams().select("doc").distinct().collect()}
    doc_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    common = sorted(kept_vids & gram_docs & doc_ids)
    assert common, "test corpus has no id shared by all four artifacts"
    target = common[0]

    # run_id demanded because NearDupLabels is registered
    with _pytest.raises(ValueError, match="run_id is required"):
        eng.remove_document([target])

    summary = eng.remove_document([target], run_id="gdpr-1")
    assert set(summary) == set(eng.artifacts)
    assert {s["class"] for s in summary.values()} == {
        "NearDupLabels",
        "SubstringDupIndex",
        "IvfIndex",
        "SemanticDedupIndex",
    }
    assert labels.labels().filter(F.col("doc_id") == target).count() == 0
    assert grams.grams().filter(F.col("doc") == target).count() == 0
    assert ivf.buckets().filter(F.col("vec_id") == target).count() == 0
    assert sem.keepers().filter(F.col("vid") == target).count() == 0
    ndl = summary[f"NearDupLabels:{tmp_path / 'ndl'}"]["result"]
    assert ndl["removed_labels"] == 1 and not ndl.get("replay")

    # crash-retry: same ids + run_id re-invoked is a no-op everywhere
    before = (
        labels.labels().count(),
        grams.grams().count(),
        ivf.buckets().count(),
        sem.keepers().count(),
    )
    replay = eng.remove_document([target], run_id="gdpr-1")
    assert replay[f"NearDupLabels:{tmp_path / 'ndl'}"]["result"]["replay"]
    assert (
        labels.labels().count(),
        grams.grams().count(),
        ivf.buckets().count(),
        sem.keepers().count(),
    ) == before


def test_remove_document_run_id_optional_without_ledgered_artifacts(
    spark, tmp_path
):
    """Only idempotent-by-construction artifacts registered -> run_id
    is not demanded (their remove() takes none); DataFrame ids work."""
    from dataeng_azure_spotify_spark import Engine
    from dataeng_azure_spotify_spark.operators.similarity import IvfIndex

    eng = Engine(spark, SF)
    emb = eng.table("embeddings").limit(20).localCheckpoint(eager=True)
    ivf = IvfIndex.build(emb, str(tmp_path / "ivf"), num_centroids=2)
    eng.register_artifact(ivf, name="ivf")
    some_id = emb.select("vec_id").first().vec_id
    ids_df = spark.createDataFrame([(some_id,)], "vec_id long")
    summary = eng.remove_document(ids_df)
    assert summary["ivf"]["class"] == "IvfIndex"
    assert ivf.buckets().filter(F.col("vec_id") == some_id).count() == 0
