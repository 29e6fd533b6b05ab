"""Incremental ingestion lifecycle (SURVEY.md §3.1): watermark seed →
filtered extract → parquet append → watermark refresh → skip-on-empty."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Row

from dataeng_azure_spotify_spark.sources.ingest import (
    TableConfig,
    incremental_extract,
    ingest_tables,
)
from dataeng_azure_spotify_spark.sources.watermark import SEED_WATERMARK, WatermarkStore


def _src(spark, days):
    return spark.createDataFrame(
        [Row(id=i, updated_at=dt.datetime(2024, 1, d)) for i, d in enumerate(days)]
    )


def test_watermark_seed_and_roundtrip(tmp_path):
    store = WatermarkStore(str(tmp_path))
    assert store.read("t") == SEED_WATERMARK
    store.write("t", "2024-01-05 00:00:00")
    assert store.read("t") == "2024-01-05 00:00:00"
    # state file layout mirrors bronze/<table>_cdc/cdc.json
    assert os.path.exists(tmp_path / "t_cdc" / "cdc.json")


def test_first_extract_takes_everything(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    src = _src(spark, [1, 2, 3])
    res = incremental_extract(
        spark, src, TableConfig("t", "updated_at"), store, str(tmp_path / "bronze")
    )
    assert res.rows == 3 and res.wrote_file
    assert store.read("t") == "2024-01-03 00:00:00"
    assert spark.read.parquet(str(tmp_path / "bronze" / "t")).count() == 3


def test_second_extract_only_new_rows(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    bronze = str(tmp_path / "bronze")
    cfg = TableConfig("t", "updated_at")
    incremental_extract(spark, _src(spark, [1, 2]), cfg, store, bronze)
    res = incremental_extract(spark, _src(spark, [1, 2, 5]), cfg, store, bronze)
    assert res.rows == 1  # only day-5 row is past the watermark
    assert spark.read.parquet(bronze + "/t").count() == 3  # append, not overwrite


def test_empty_extract_skips_write_and_watermark(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    bronze = str(tmp_path / "bronze")
    cfg = TableConfig("t", "updated_at")
    src = _src(spark, [1, 2])
    incremental_extract(spark, src, cfg, store, bronze)
    wm = store.read("t")
    res = incremental_extract(spark, src, cfg, store, bronze)  # nothing new
    assert res.rows == 0 and not res.wrote_file
    assert store.read("t") == wm  # watermark untouched (A2 false branch)


def test_from_date_override(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    store.write("t", "2024-01-02 00:00:00")
    cfg = TableConfig("t", "updated_at", from_date="2024-01-01 00:00:00")
    res = incremental_extract(
        spark, _src(spark, [1, 2, 3]), cfg, store, str(tmp_path / "bronze")
    )
    # override reaches further back than the stored watermark
    assert res.rows == 2


def test_concurrent_multi_table_ingest(spark, tmp_path):
    store = WatermarkStore(str(tmp_path / "wm"))
    sources = {"a": _src(spark, [1, 2]), "b": _src(spark, [3])}
    configs = [TableConfig("a", "updated_at"), TableConfig("b", "updated_at")]
    results = ingest_tables(spark, sources, configs, store, str(tmp_path / "bronze"))
    assert results["a"].rows == 2 and results["b"].rows == 1
