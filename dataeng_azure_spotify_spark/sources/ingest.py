"""Incremental (watermark-driven) extract → bronze parquet.

Parity: the reference's ``incremental_ingestion`` ADF pipeline (SURVEY.md
§3.1): per table — Lookup last watermark (S2) → extract ``SELECT * WHERE
cdc_col > '<wm>'`` (S1, ``pipeline/incremental_ingestion.json:89``) →
append snappy parquet per-run file (S3, :94-119) → if rows > 0, refresh
watermark with ``SELECT MAX(cdc_col)`` over the *whole source* (A1, :192)
else delete the empty output (S11, :138-169). ``from_date`` overrides the
stored watermark for debug/backfill runs (``guides/setup.md:303-317``).

Spark-first differences (improvements, SURVEY.md §4.1):

- The skip-on-empty check short-circuits (``limit(1)``) *before* any file
  is written — no write-then-delete dance.
- Tables ingest concurrently (``ThreadPoolExecutor``); the reference's
  ForEach is ``isSequential: true``. Spark's scheduler interleaves the
  per-table jobs across the cluster.
- The extract filter is a pushed-down predicate: against JDBC it becomes
  the WHERE clause executed by the source database (exactly the
  reference's behavior); against a lake source it becomes parquet
  predicate pushdown / partition pruning.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.sources.watermark import WatermarkStore


@dataclass
class TableConfig:
    """One entry of the reference's ``loop_input.json``
    (``data_scripts/loop_input.json:1-33``): schema+table collapse to a
    source path/DataFrame here; ``cdc_col`` is the watermark column;
    ``from_date`` optionally overrides the stored watermark."""

    table: str
    cdc_col: str
    from_date: str | None = None


@dataclass
class ExtractResult:
    table: str
    rows: int
    watermark_before: str
    watermark_after: str
    wrote_file: bool


def incremental_extract(
    spark: SparkSession,
    source: DataFrame,
    cfg: TableConfig,
    store: WatermarkStore,
    bronze_base: str,
) -> ExtractResult:
    """One table's incremental hop: filter > wm → append parquet → refresh wm."""
    wm = cfg.from_date or store.read(cfg.table)
    # Snapshot the slice ONCE (executor-side, no driver collect): the
    # old limit/write/count trio evaluated the filtered source three
    # times — three pushdown queries against a live JDBC source, and a
    # reported row count that could disagree with the rows actually
    # written if the source moved between evaluations. The checkpoint
    # is bounded by the incremental slice, not the table.
    extract = source.filter(
        F.col(cfg.cdc_col) > F.lit(wm)
    ).localCheckpoint(eager=True)
    rows = extract.count()

    # A2 / S11: short-circuit empty extracts before writing anything.
    if rows == 0:
        return ExtractResult(cfg.table, 0, wm, wm, wrote_file=False)

    out_dir = os.path.join(bronze_base, cfg.table)
    extract.write.mode("append").parquet(out_dir)

    # A1: watermark refresh from the WHOLE source (reference semantics:
    # MAX over the source table, not the extracted slice — json:192).
    new_wm = source.agg(F.max(F.col(cfg.cdc_col)).alias("cdc")).first()["cdc"]
    new_wm_str = str(new_wm)
    store.write(cfg.table, new_wm_str)
    return ExtractResult(cfg.table, rows, wm, new_wm_str, wrote_file=True)


def ingest_tables(
    spark: SparkSession,
    sources: dict[str, DataFrame],
    configs: list[TableConfig],
    store: WatermarkStore,
    bronze_base: str,
    max_parallel: int = 4,
) -> dict[str, Any]:
    """Concurrent per-table ingestion loop (C7). The reference loops
    sequentially (``pipeline/incremental_ingestion.json:15``); here a
    thread pool submits each table's Spark jobs concurrently and the
    scheduler fills the cluster."""
    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
        futures = {
            cfg.table: pool.submit(
                incremental_extract, spark, sources[cfg.table], cfg, store, bronze_base
            )
            for cfg in configs
        }
        return {t: f.result() for t, f in futures.items()}
