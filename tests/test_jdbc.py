"""JDBC incremental source (SURVEY.md §2.1 S1, §2.4 A1): query text and
reader options — no database ships in this environment, so the contract
under test is the pushdown construction."""

from __future__ import annotations

import pytest

from dataeng_azure_spotify_spark.sources.jdbc import (
    JdbcTable,
    incremental_query,
    max_watermark_query,
    reader_options,
)

SRC = JdbcTable(
    url="jdbc:sqlserver://example.invalid:1433;database=spotify",
    schema="dbo",
    table="FactStream",
    cdc_col="stream_timestamp",
    driver="com.microsoft.sqlserver.jdbc.SQLServerDriver",
    properties={"user": "etl", "password": "x"},
)


def test_incremental_query_matches_reference_shape():
    q = incremental_query(SRC, "2025-10-07T19:49:56")
    assert q == (
        "SELECT * FROM dbo.FactStream "
        "WHERE stream_timestamp > '2025-10-07T19:49:56'"
    )


def test_max_watermark_query():
    assert max_watermark_query(SRC) == (
        "SELECT MAX(stream_timestamp) AS cdc FROM dbo.FactStream"
    )


def test_reader_options_single_stream():
    opts = reader_options(SRC, "1900-01-01")
    assert opts["url"] == SRC.url
    assert opts["dbtable"].startswith("(SELECT * FROM dbo.FactStream")
    assert opts["driver"] == SRC.driver
    assert opts["user"] == "etl"
    assert "partitionColumn" not in opts


def test_reader_options_partitioned():
    opts = reader_options(
        SRC, "1900-01-01",
        partition_column="stream_id", num_partitions=16,
        lower_bound=0, upper_bound=1_000_000,
    )
    assert opts["numPartitions"] == "16"
    assert opts["partitionColumn"] == "stream_id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000000")


def test_partitioned_read_requires_bounds():
    with pytest.raises(ValueError):
        reader_options(SRC, "1900-01-01", partition_column="stream_id")
