"""Table profiler: values, null/distinct accounting, single-job plan,
approx mode; corpus sharding: determinism, balance, file layout."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from dataeng_azure_spotify_spark.operators.curation import (
    shard_corpus,
    write_sharded,
)
from dataeng_azure_spotify_spark.operators.profile import profile_table


@pytest.fixture()
def tbl(spark):
    return spark.createDataFrame(
        [
            Row(id=1, name="alice", score=10),
            Row(id=2, name=None, score=30),
            Row(id=3, name="bob", score=30),
            Row(id=4, name="alice", score=None),
        ],
        "id long, name string, score long",
    )


def test_profile_table_values(tbl):
    got = {r["column"]: r.asDict() for r in profile_table(tbl).collect()}
    assert set(got) == {"id", "name", "score"}
    assert got["id"] == {
        "column": "id", "n_rows": 4, "n_nulls": 0, "n_distinct": 4,
        "min_value": "1", "max_value": "4",
    }
    assert (got["name"]["n_nulls"], got["name"]["n_distinct"]) == (1, 2)
    assert (got["name"]["min_value"], got["name"]["max_value"]) == ("alice", "bob")
    assert (got["score"]["n_nulls"], got["score"]["n_distinct"]) == (1, 2)


def test_profile_table_single_scan_plan(tbl):
    plan = profile_table(tbl)._jdf.queryExecution().executedPlan().toString()
    # one aggregate pipeline (Expand for the multi-distinct), not one
    # scan per column: no Union in the plan
    assert "Union" not in plan


def test_profile_table_approx_mode(tbl):
    got = {r["column"]: r["n_distinct"] for r in
           profile_table(tbl, approx=True).collect()}
    # HLL at this cardinality is exact
    assert got == {"id": 4, "name": 2, "score": 2}


def test_shard_corpus_deterministic_and_balanced(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="w " * 5) for i in range(2000)]
    )
    a = shard_corpus(docs, 8).groupBy("shard").count().collect()
    b = shard_corpus(docs, 8).groupBy("shard").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    sizes = [r["count"] for r in a]
    assert len(sizes) == 8
    assert max(sizes) < 2 * min(sizes)  # hash balance at n/shard=250
    shards = {r["shard"] for r in a}
    assert shards == set(range(8))


def test_shard_corpus_rejects_bad_n(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        shard_corpus(docs, 0)


def test_write_sharded_one_file_per_shard(spark, tmp_path):
    import os

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(500)]
    )
    path = str(tmp_path / "shards")
    write_sharded(docs, path, n_shards=4)
    shard_dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert shard_dirs == [f"shard={i}" for i in range(4)]
    for d in shard_dirs:
        files = [f for f in os.listdir(os.path.join(path, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500
