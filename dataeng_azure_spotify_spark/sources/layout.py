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
from pyspark.sql import functions as F


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
    from dataeng_azure_spotify_spark.statefs import statefs_for

    before = [
        f for f in statefs_for(path, spark).listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    if len(before) <= target_files:
        return len(before)
    df = spark.read.parquet(path)
    atomic_swap_dir(
        path,
        lambda tmp: df.coalesce(target_files)
        .write.mode("overwrite")
        .parquet(tmp),
    )
    return len(before)


def with_zorder_code(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    code_col: str = "zcode",
) -> DataFrame:
    """Attach a Morton (Z-order) code interleaving the rank-scaled bits
    of ``cols`` — the multi-dimensional clustering key behind
    ``OPTIMIZE ZORDER BY``-style layout: sorting by the code co-locates
    rows that are close in EVERY listed column, so parquet min/max
    stats prune multi-predicate scans that a single-column sort can
    only prune on its leading column.

    Each (numeric) column is linearly mapped to ``[0, 2^bits)`` using
    its global min/max (one O(|cols|) scalar aggregate — the only
    action), then bits interleave round-robin. The map is the same
    IEEE double expression tree as the DuckDB twin, so codes are
    engine-identical and the query oracle hash-matches.

    2 columns × 16 bits is the practical default; beyond ~3-4 columns
    Z-order locality washes out (the curse of interleaving) — prefer
    partitioning on the extra columns instead.
    """
    if not (1 <= bits * len(cols) <= 63):
        raise ValueError("bits * len(cols) must fit a positive BIGINT")
    row = df.agg(
        *[F.min(F.col(c)).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c)).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).first()
    top = (1 << bits) - 1
    code = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = row[f"mn_{i}"], row[f"mx_{i}"]
        if mn is None or mx is None:
            raise ValueError(
                f"with_zorder_code: column {c!r} has no non-NULL values "
                "(empty input or all-NULL column)"
            )
        rng = max(int(mx) - int(mn), 1)
        bucket = F.floor(
            (F.col(c) - F.lit(int(mn))).cast("double")
            * F.lit(float(top))
            / F.lit(float(rng))
        ).cast("long")
        for j in range(bits):
            code = code + F.shiftleft(
                F.shiftright(bucket, j).bitwiseAND(F.lit(1)),
                j * len(cols) + i,
            )
    return df.withColumn(code_col, code)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Land ``df`` clustered by the Z-order code of ``cols``:
    range-partitioned on the code (contiguous code ranges per file) and
    sorted within files, then the helper column dropped. Readers get
    tight per-file min/max on every listed column — the data-skipping
    layout for multi-dimensional filters at 100 TB."""
    coded = with_zorder_code(df, cols, bits=bits, code_col="__z")
    (
        coded.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def build_file_stats(
    spark: SparkSession,
    path: str,
    cols: list[str],
) -> DataFrame:
    """Per-file min/max manifest for ``cols`` — the table-format-free
    data-skipping index (what Delta/Iceberg keep in their metadata
    layer). One distributed pass; output is O(#files) rows:
    ``(file, <c>_min, <c>_max, n_rows)``.

    Pairs with :func:`write_zordered`: clustering makes per-file ranges
    tight, the manifest makes them queryable WITHOUT opening footers at
    plan time. Persist it next to the table and refresh on compaction.
    """
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        df.select(F.input_file_name().alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def pruned_read(
    spark: SparkSession,
    stats: DataFrame,
    predicates: dict[str, tuple],
) -> DataFrame:
    """Manifest-pruned scan: read ONLY files whose [min, max] envelope
    overlaps every ``col: (lo, hi)`` predicate, then apply the exact
    filter to the surviving rows.

    The manifest collect is driver-side but bounded at O(#files) — the
    same planning cost every table format pays; the data plane touches
    only surviving files. Returns an empty (filtered) frame when no
    file qualifies.
    """
    cond = F.lit(True)
    exact = F.lit(True)
    for c, (lo, hi) in predicates.items():
        cond = cond & (F.col(f"{c}_max") >= F.lit(lo)) & (
            F.col(f"{c}_min") <= F.lit(hi)
        )
        exact = exact & F.col(c).between(F.lit(lo), F.lit(hi))
    files = [r["file"] for r in stats.filter(cond).select("file").collect()]
    if not files:
        # preserve schema: scan nothing by filtering an all-false read
        any_file = [r["file"] for r in stats.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("pruned_read: empty stats manifest")
        return spark.read.parquet(*any_file).filter(F.lit(False))
    return spark.read.parquet(*files).filter(exact)


def atomic_swap_dir(path: str, write_tmp) -> None:
    """Write-then-rename directory swap: ``write_tmp(tmp_path)`` builds
    the replacement next to ``path``, then two renames publish it.
    Readers list either the old tree or the new one, never a mix; NOT
    safe against a concurrent WRITER appending into ``path`` mid-swap.
    Shared by parquet compaction and the streaming state compactors
    (one copy of the discipline, not three drifting ones). Renames go
    through StateFS, so scheme'd paths swap via the Hadoop FileSystem
    (with object stores' weaker rename atomicity — see statefs.py)."""
    from dataeng_azure_spotify_spark.statefs import statefs_for

    fs = statefs_for(path)
    tmp = f"{path}__swap_{uuid.uuid4().hex[:8]}"
    write_tmp(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    fs.rename(path, old)
    fs.rename(tmp, path)
    fs.rmtree(old)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: "list[str]",
    num_buckets: int,
    sort_cols: "list[str] | None" = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a BUCKETED catalog table: rows are
    hash-distributed into ``num_buckets`` files by ``bucket_cols`` at
    write time, so joins and aggregations keyed on those columns read
    the data ALREADY co-located — Catalyst drops the Exchange on every
    bucketed side (pinned in tests/test_layout.py). This is the
    repeated-join amortization the task calls for: pay one shuffle at
    write time, never again — at 100 TB a fact table joined every run
    against the same key saves a full-corpus shuffle per query.
    ``sort_cols`` additionally sorts within each bucket file (helps
    merge joins and range scans). Both join sides must use the same
    ``num_buckets`` for the exchange-free plan.

    Bucketing metadata lives in the session catalog (``saveAsTable``;
    plain ``parquet(path)`` writes cannot carry it), so read back with
    ``spark.table(table)``.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(
        int(num_buckets), *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
