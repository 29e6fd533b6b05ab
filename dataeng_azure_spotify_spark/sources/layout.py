"""Data layout management: partitioned writes and small-file compaction.

The reference writes bronze as one parquet file per extract run
(``<table>_<runTimestamp>``, ``pipeline/incremental_ingestion.json:
109-119``) — at production cadence that is the classic small-files
problem, and streaming sinks make it worse (one file per micro-batch per
partition). These utilities are the engine's answer:

- :func:`write_partitioned` — land a table partitioned by low-cardinality
  columns (date, region) so queries prune whole directories
  (``PartitionFilters`` in the scan). Dynamic partition overwrite
  replaces only the partitions present in the batch — the idempotent
  reprocessing primitive for backfills.
- :func:`compact_partition` — rewrite a directory (or one partition) to
  ``target_files`` files via coalesce. Run it behind the streaming sink
  on a schedule; readers see either the old or the new layout (write to
  side dir + atomic swap), never a half-compacted one.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Partitioned parquet write; with ``dynamic=True`` an overwrite
    touches only the partitions present in ``df`` (Spark's dynamic
    partition-overwrite mode), not the whole table."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partition(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
) -> int:
    """Rewrite ``path`` (a leaf partition or a flat table dir) into
    ``target_files`` parquet files. Returns the number of files before
    compaction. Atomic: writes a sibling dir then swaps via rename, so a
    concurrent reader lists either the old files or the new ones."""
    before = [
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    if len(before) <= target_files:
        return len(before)
    df = spark.read.parquet(path)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(before)
