"""docgen Python DataSource: determinism across reads/partitionings,
partition math, schema, and composition with the curation tier."""

from __future__ import annotations

import pytest

from dataeng_azure_spotify_spark.sources.docgen import register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("docgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_docgen_deterministic_across_partitionings(spark):
    a = _read(spark, n=500, parts=2, seed=11).collect()
    b = _read(spark, n=500, parts=7, seed=11).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 500
    assert {r["doc_id"] for r in a} == set(range(500))


def test_docgen_seed_changes_content_not_ids(spark):
    a = {r["doc_id"]: r["text"] for r in _read(spark, n=50, seed=1).collect()}
    b = {r["doc_id"]: r["text"] for r in _read(spark, n=50, seed=2).collect()}
    assert set(a) == set(b)
    assert any(a[i] != b[i] for i in a)


def test_docgen_partition_count_and_empty(spark):
    df = _read(spark, n=100, parts=8)
    assert df.rdd.getNumPartitions() == 8
    assert _read(spark, n=0).count() == 0


def test_docgen_schema_and_consistency(spark):
    df = _read(spark, n=20)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    for r in df.collect():
        assert r["n_chars"] == len(r["text"])
        assert r["lang"] in ("en", "de", "fr", "es")


def test_docgen_feeds_curation_ops(spark):
    from dataeng_azure_spotify_spark.operators.curation import sample_exact_n

    docs = _read(spark, n=300, parts=4)
    assert sample_exact_n(docs, 25).count() == 25


def test_docgen_rejects_bad_options(spark):
    register(spark)
    with pytest.raises(Exception):
        spark.read.format("docgen").option("parts", 0).load().collect()
