"""Bronze → silver streaming layer: checkpointed bounded streams.

Parity (SURVEY.md §2.1 S6-S9, §2.5 D1-D2, §2.8, §3.2): per table the
reference builds an Auto Loader stream → optional clean (drop
``_rescued_data``, dedup by key, durationFlag bucketing) → Delta append
sink with a stable checkpoint and ``trigger(availableNow=True)`` (or
``once=True``) so each run drains exactly the new files then stops —
"batch-like semantics while still using Structured Streaming"
(``Silver_Dimensions.py:333-338``, sinks :377-395 et al.).

OSS mapping: Delta is unavailable in this environment, so the sink is the
Structured Streaming **parquet file sink**, which provides the same
exactly-once contract via the checkpoint + per-directory ``_spark_metadata``
commit log (a restarted run never re-writes a committed batch). On a
Delta-capable cluster ``fmt='delta'`` drops in unchanged.

Streaming dedup: ``dropDuplicates(keys)`` keeps per-key state across
micro-batches in the checkpoint — unbounded, as the reference itself
acknowledges (``Silver_Dimensions.py:487-494``). :func:`dedup_stream`
exposes the production-grade bounded variant
(``withWatermark`` + ``dropDuplicatesWithinWatermark``) for 100 TB use.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from dataeng_azure_spotify_spark.catalog import ensure_database
from dataeng_azure_spotify_spark.delta_support import default_table_format
from dataeng_azure_spotify_spark.streaming.rescue import RESCUE_COL, read_bronze_stream


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    watermark_col: str | None = None,
    delay: str = "1 hour",
) -> DataFrame:
    """Stateful streaming dedup by business key.

    Without a watermark this is the reference's exact operator
    (``dropDuplicates(['user_id'])``, ``Silver_Dimensions.py:499-502``) —
    state grows with distinct keys. With ``watermark_col`` it becomes
    ``dropDuplicatesWithinWatermark``: state is evicted past the lateness
    bound, the correct choice for unbounded 100 TB streams.
    """
    if watermark_col is None:
        return df.dropDuplicates(keys)
    return df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(keys)


def write_silver_stream(
    df: DataFrame,
    output_path: str,
    checkpoint: str,
    fmt: str | None = None,
    table_name: str | None = None,
    await_termination: bool = True,
):
    """Checkpointed append sink, bounded run (``availableNow`` trigger).

    One stable checkpoint per sink — deleting it resets the stream,
    exactly the reference's operational model
    (``Silver_Dimensions.py:345-356``, :416-437).

    ``fmt`` defaults to delta when ``delta-spark`` is importable, else the
    parquet file sink (same exactly-once contract via the per-directory
    ``_spark_metadata`` commit log).

    ``table_name`` additionally lands the sink as a metastore table
    (``.toTable``): with ``output_path`` set the table is EXTERNAL at that
    path, so the data lands once but resolves both by path and by name —
    the reference's dual path+catalog landing of every silver table
    (``Silver_Dimensions.py:591-601``, SURVEY.md §2.1 S8).
    """
    writer = (
        df.writeStream.format(fmt or default_table_format())
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .option("path", output_path)
        .trigger(availableNow=True)
    )
    if table_name:
        ensure_database(df.sparkSession, table_name)
        q = writer.toTable(table_name)
    else:
        q = writer.start()
    if await_termination:
        q.awaitTermination()
    return q


@dataclass
class SilverTable:
    """Declarative bronze→silver table: source dir, clean fn, sink dirs."""

    name: str
    bronze_dir: str
    silver_dir: str
    checkpoint_dir: str
    clean: Callable[[DataFrame], DataFrame] | None = None
    #: Optional metastore table name for the dual path+catalog landing
    #: (reference lands every silver table both ways).
    table_name: str | None = None

    def run(self, spark: SparkSession) -> str:
        """Drain new bronze files into silver; returns the output path."""
        stream = read_bronze_stream(
            spark,
            self.bronze_dir,
            schema_location=os.path.join(self.checkpoint_dir, "schema"),
        )
        if self.clean is not None:
            stream = self.clean(stream)
        else:
            # Tables without cleaning still drop the rescue column before
            # landing (reference: FactStream/DimDate land as-is,
            # Silver_Dimensions.py:1032-1034 — rescue is ingest plumbing).
            stream = stream.drop(RESCUE_COL)
        write_silver_stream(
            stream,
            self.silver_dir,
            os.path.join(self.checkpoint_dir, "sink"),
            table_name=self.table_name,
        )
        return self.silver_dir
