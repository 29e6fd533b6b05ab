"""Relational operators — projections, predicates, expectations, dedup,
watermark aggregates (SURVEY.md §2.2, §2.4, §2.5).

All of these are thin, composable wrappers over built-in DataFrame ops so
Catalyst sees the full declarative plan (predicate pushdown, column
pruning, partial aggregation are free). Nothing here ever collects to the
driver except the intentionally-scalar watermark reads.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def drop_columns(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """Projection-away of named columns.

    Parity: reference ``local_spotify_dab/utils/transformations.py:1-4``
    (``reusable().dropColumns``), applied to drop ``_rescued_data`` at
    ``Silver_Dimensions.py:495-502`` (SURVEY.md §2.2 P1). Spark prunes the
    dropped columns all the way down to the parquet scan.
    """
    return df.drop(*columns)


def watermark_filter(df: DataFrame, cdc_col: str, last_cdc: Any) -> DataFrame:
    """Strictly-greater watermark predicate ``cdc_col > last_cdc``.

    Parity: the incremental-extract WHERE clause embedded in the source
    query, ``pipeline/incremental_ingestion.json:89`` (SURVEY.md §2.2 P2).
    Expressed as a plain filter so it pushes down to the parquet/JDBC scan
    — at 100 TB with date-partitioned bronze this becomes partition
    pruning, reading only new partitions.
    """
    return df.filter(F.col(cdc_col) > F.lit(last_cdc))


def bucketize(
    df: DataFrame,
    src_col: str,
    out_col: str,
    bounds: list[tuple[float, str]],
    default_label: str,
) -> DataFrame:
    """CASE-WHEN conditional bucketing.

    Parity: the ``durationFlag`` enrichment ``when(duration_sec < 150,
    'low').when(< 300, 'medium').otherwise('high')`` at reference
    ``Silver_Dimensions.py:911-918`` (SURVEY.md §2.2 P3). ``bounds`` is an
    ordered list of ``(upper_exclusive, label)``.
    """
    col = F.col(src_col)
    expr: Column | None = None
    for upper, label in bounds:
        cond = col < F.lit(upper)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = F.lit(default_label) if expr is None else expr.otherwise(default_label)
    return df.withColumn(out_col, expr)


def constant_inject(df: DataFrame, name: str, value: Any) -> DataFrame:
    """Constant-column injection.

    Parity: ADF ``additionalColumns`` adding the ``cdc`` literal from a
    prior activity output, ``pipeline/incremental_ingestion.json:220-229``
    (SURVEY.md §2.2 P4).
    """
    return df.withColumn(name, F.lit(value))


def expectations_drop(
    df: DataFrame, rules: Mapping[str, str], observe_name: str | None = None
) -> DataFrame:
    """Data-quality expectations with drop semantics.

    Parity: DLT ``expect_all_or_drop={"rule 1": "user_id IS NOT NULL"}`` —
    rows failing ANY rule are dropped before reaching the target
    (reference ``.../transformations/DimUser.py:45-47,91-94``, SURVEY.md
    §2.2 P5). Metrics come from Catalyst ``observe()`` (no extra pass, no
    driver collect): one failure counter per rule plus a kept-rows count,
    retrievable via a ``pyspark.sql.Observation`` or QueryExecutionListener.
    """
    if not rules:
        return df
    conds = [F.expr(rule) for rule in rules.values()]
    keep = conds[0]
    for c in conds[1:]:
        keep = keep & c
    if observe_name:
        metrics = [
            F.sum(F.when(~F.coalesce(c, F.lit(False)), 1).otherwise(0)).alias(
                f"failed_{name}"
            )
            for name, c in zip(rules.keys(), conds)
        ]
        df = df.observe(observe_name, F.count(F.lit(1)).alias("rows_in"), *metrics)
    return df.filter(keep)


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    sequence_by: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Keep the newest row per business key (batch dedup).

    Batch-checkable twin of the reference's streaming
    ``dropDuplicates(["user_id"])`` (``Silver_Dimensions.py:499-502``,
    SURVEY.md §2.5 D1/D2) and the core primitive inside SCD1/SCD2
    (SURVEY.md §2.7). Implemented as ``row_number() = 1`` over
    ``partitionBy(keys) orderBy(sequence_by DESC, tiebreakers DESC)`` —
    a single shuffle on the key columns with partial ordering per
    partition; at scale AQE splits skewed keys.

    ``tiebreakers`` must make the ordering total (deterministic result) —
    pass a unique id column.
    """
    order = [F.col(sequence_by).desc()] + [
        F.col(t).desc() for t in (tiebreakers or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scalar_max(df: DataFrame, col: str, alias: str = "cdc") -> DataFrame:
    """Scalar MAX aggregate — the watermark refresh.

    Parity: ``SELECT MAX(<cdc_col>) as cdc FROM <table>`` run against the
    whole source table, ``pipeline/incremental_ingestion.json:192``
    (SURVEY.md §2.4 A1). Spark computes this as partial max per partition
    + single final reduce — no full shuffle.
    """
    return df.agg(F.max(F.col(col)).alias(alias))


def non_empty(df: DataFrame) -> bool:
    """Non-empty check gating the watermark update vs file delete.

    Parity: ADF ``@greater(activity(...).output.dataRead, 0)``,
    ``pipeline/incremental_ingestion.json:133-137`` (SURVEY.md §2.4 A2).
    ``limit(1)`` short-circuits the scan — never a full count at scale.
    """
    return df.limit(1).count() > 0
