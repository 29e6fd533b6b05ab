"""Column-level data profiling — the "what's in this table" pass every
pipeline runs before trusting a new source.

One wide aggregate computes per-column null counts, distinct counts,
and min/max in a SINGLE scan (no per-column jobs), then unpivots to a
long ``(column, …)`` frame. Exact ``count_distinct`` by default because
the correctness oracle needs determinism; at 100 TB pass
``approx=True`` to swap in ``approx_count_distinct`` (HLL, no extra
shuffle) — the only difference is that column.

min/max are cast to string AFTER aggregation so heterogeneous column
types fit one schema; numeric→string casts are plain (no scientific
notation for integral types) and string min/max is byte-order in both
Spark and DuckDB for ASCII data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_nulls, n_distinct,
    min_value, max_value)`` — one scan, one row per profiled column."""
    cols = cols or [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).cast("long").alias(f"__nn_{c}"),
            distinct(c).cast("long").alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    # explode one array-of-structs off the single aggregate row — a
    # UNION of per-column selects would re-execute the (scan + agg) once
    # per column; this keeps it one job regardless of column count
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("n_rows"),
                        F.col(f"__nn_{c}").alias("n_nulls"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__mn_{c}").alias("min_value"),
                        F.col(f"__mx_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
