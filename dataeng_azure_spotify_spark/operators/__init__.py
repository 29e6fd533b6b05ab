"""Operator layer: relational ops, SCD/CDC merges, dedup family,
similarity search, and windowed event analytics."""

from dataeng_azure_spotify_spark.operators.relational import (
    bucketize,
    constant_inject,
    drop_columns,
    expectations_drop,
    latest_per_key,
    non_empty,
    scalar_max,
    watermark_filter,
)

__all__ = [
    "bucketize",
    "constant_inject",
    "drop_columns",
    "expectations_drop",
    "latest_per_key",
    "non_empty",
    "scalar_max",
    "watermark_filter",
]
