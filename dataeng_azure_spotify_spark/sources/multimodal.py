"""Multimodal (image/audio/video) column handling for training-data
pipelines — beyond-reference surface (BASELINE.json north star).

Design: media travel as opaque ``binary`` columns with a typed metadata
struct; all per-item compute (decode, feature-extract, resize,
frame-sample) runs as Arrow-batched ``mapInPandas`` stages so bytes never
round-trip through Python row-at-a-time. Batches arrive as
``pandas.Series`` of ``bytes`` — the natural unit for handing to a codec
library.

The actual codecs (PIL/torchaudio/av) are NOT available in this
environment, so the decode kernel is stubbed: by default it raises
``NotImplementedError`` naming the missing dependency; with
``fake=True`` it computes a deterministic fake "feature" (byte-level
stats) so the Spark-side plumbing — schema, batching, partitioning,
output shape — is fully exercised and tested.

Scale notes: media rows are large and skew-prone. ``repartition_for_media``
re-partitions by a target partition byte budget *before* the UDF stage so
one executor never holds a pathological batch, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds Arrow batch
memory inside the stage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal row: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("mime_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_mean", DoubleType(), True),
        StructField("byte_entropy_proxy", DoubleType(), True),
    ]
)


def _decode_batch(payloads: pd.Series, modality: str, fake: bool) -> pd.DataFrame:
    """Decode kernel. Real codecs are not installed in this environment."""
    if not fake:
        raise NotImplementedError(
            f"decoding {modality!r} requires a codec library (e.g. PIL/pyav) "
            "that is not installed; pass fake=True for the deterministic stub"
        )
    import numpy as np

    n_bytes, means, ent = [], [], []
    for p in payloads:
        if p is None:
            n_bytes.append(None), means.append(None), ent.append(None)
            continue
        arr = np.frombuffer(p, dtype=np.uint8)
        n_bytes.append(int(arr.size))
        means.append(float(arr.mean()) if arr.size else 0.0)
        # entropy proxy: distinct-byte fraction (deterministic, cheap)
        ent.append(float(np.unique(arr).size) / 256.0)
    return pd.DataFrame(
        {"n_bytes": n_bytes, "byte_mean": means, "byte_entropy_proxy": ent}
    )


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over a MEDIA_SCHEMA DataFrame.

    ``mapInPandas`` keeps each partition as an iterator of Arrow batches;
    per batch the payload Series goes to the decode kernel in one call.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_batch(pdf["payload"], "mixed", fake)
            out = pd.DataFrame(
                {"media_id": pdf["media_id"], "modality": pdf["modality"]}
            )
            yield pd.concat([out, feats], axis=1)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic MEDIA_SCHEMA table derived from the documents corpus
    (no real media ships with the test data): payload = UTF-8 bytes of the
    text, modality assigned round-robin by id. Gives the multimodal
    pipeline a reproducible input whose byte-level features an external
    oracle can recompute from the text."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        # pmod: signed % gives index 0 (error) / -1 (silent wraparound)
        # for negative ids
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        modality.alias("modality"),
        F.concat(F.lit("application/x-fake-"), modality).alias("mime_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.length(F.col(text_col)) * 40).cast("long").alias("duration_ms"),
    )


def _rows_from_file_metadata(df: DataFrame, avg_item_bytes: int) -> int | None:
    """Row-count estimate from driver-side file listing — NO Spark job.

    Media tables are payload-dominated and media bytes barely compress,
    so on-disk size / avg_item_bytes ≈ row count. Returns None for
    non-file-backed plans or non-local filesystems without sizes.
    """
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None
        try:
            total += os.path.getsize(parsed.path or uri)
        except OSError:
            return None
    return max(1, total // max(1, avg_item_bytes))


def repartition_for_media(
    df: DataFrame,
    avg_item_bytes: int,
    target_partition_bytes: int = 128 << 20,
    row_count_hint: int | None = None,
) -> DataFrame:
    """Spread large binary rows so partitions stay within a byte budget.

    At 100 TB the file-size-based split doesn't see post-decode blow-up;
    partition count is derived from payload size instead of row count.

    Pure transformation — no Spark action. Row count comes from
    ``row_count_hint`` when the caller knows it, else from driver-side
    file metadata (:func:`_rows_from_file_metadata`); in-memory plans
    with no hint fall back to the cluster's default parallelism.
    """
    per_part = max(1, target_partition_bytes // max(1, avg_item_bytes))
    rows = (
        row_count_hint
        if row_count_hint is not None
        else _rows_from_file_metadata(df, avg_item_bytes)
    )
    if rows is None:
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    else:
        n_parts = max(1, (rows + per_part - 1) // per_part)
    return df.repartition(n_parts)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan video frame sampling: one output row per planned frame.

    The decode itself is stubbed (no codec); the *plumbing* — exploding a
    duration into frame timestamps and carrying the payload reference —
    is the real Spark work and is exercised in tests.
    """
    return df.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
