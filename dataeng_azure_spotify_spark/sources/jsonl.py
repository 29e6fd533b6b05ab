"""Batch JSONL corpus source with rescue semantics.

Web-scale text corpora ship as JSON-lines (one document per line, often
with malformed/truncated lines mixed in); the bronze contract for that
format is the same as the streaming file source's
(:mod:`..streaming.rescue`): NEVER silently drop a line — parse what
matches the declared schema and capture everything else raw in
``_rescued_data`` for quarantine/repair. Implemented on Spark's native
JSON reader (PERMISSIVE + ``columnNameOfCorruptRecord`` — JVM-side
parsing, no Python in the scan path), so schema pruning and predicate
pushdown behave like any other file scan.

At 100 TB: JSONL is splittable by line, so the scan parallelizes by
file-split like parquet; use :func:`..sources.layout` compaction to
parquet after the bronze hop — JSONL is an INGEST format, not a query
format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: same column name as the streaming rescue contract
RESCUE_COL = "_rescued_data"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    rescue_col: str = RESCUE_COL,
) -> DataFrame:
    """Read JSON-lines under ``path`` against a DECLARED schema.

    Lines that parse land in typed columns; malformed lines (bad JSON,
    impossible types) land raw in ``rescue_col`` with NULL typed
    columns. Fields present in the data but absent from the schema are
    simply not read (schema projection) — they are NOT rescue events.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if rescue_col in schema.names:
        raise ValueError(f"schema already contains {rescue_col!r}")
    full = StructType(schema.fields + [StructField(rescue_col, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", rescue_col)
        .json(path)
    )


def split_rescued(
    df: DataFrame, rescue_col: str = RESCUE_COL
) -> tuple[DataFrame, DataFrame]:
    """``(clean, quarantine)``: clean rows (rescue column dropped) and
    the raw quarantined lines — the standard bronze fork."""
    # one materialization serving both forks: Spark refuses queries
    # that reference ONLY the corrupt-record column of a raw JSON scan
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the scan
    # would need re-parsing with different required columns), and a
    # bronze fork re-reading the raw files twice would be wasteful
    # anyway; lazy localCheckpoint blocks are GC-reclaimed with the
    # forks (no session-lifetime cache pin)
    df = df.localCheckpoint(eager=False)
    clean = df.filter(F.col(rescue_col).isNull()).drop(rescue_col)
    quarantine = df.filter(F.col(rescue_col).isNotNull()).select(
        F.col(rescue_col).alias("raw")
    )
    return clean, quarantine


#: the engine's documents-table schema, for corpus convenience reads
DOCUMENTS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def jsonl_documents(
    spark: SparkSession, path: str, fill_n_chars: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus into the engine's ``documents`` shape:
    ``(clean, quarantine)`` with ``n_chars`` computed from ``text``
    when the source omits it (a length recomputed at ingest can never
    drift from the text it describes)."""
    clean, quarantine = split_rescued(read_jsonl(spark, path, DOCUMENTS_DDL))
    if fill_n_chars:
        clean = clean.withColumn(
            "n_chars",
            F.coalesce(
                F.col("n_chars"), F.length("text").cast("long")
            ),
        )
    return clean, quarantine
