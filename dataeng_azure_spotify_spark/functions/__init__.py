"""Scalar function library: email validation (reference parity) and the
beyond-reference text-analysis functions for LLM data pipelines."""

from dataeng_azure_spotify_spark.functions.email import (
    EMAIL_REGEX,
    is_valid_email_col,
    is_valid_email_udf,
)

__all__ = ["EMAIL_REGEX", "is_valid_email_col", "is_valid_email_udf"]
