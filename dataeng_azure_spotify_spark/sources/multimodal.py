"""Multimodal (image/audio/video) column handling for training-data
pipelines — beyond-reference surface (BASELINE.json north star).

Design: media travel as opaque ``binary`` columns with a typed metadata
struct; all per-item compute (decode, feature-extract, resize,
frame-sample) runs as Arrow-batched ``mapInPandas`` stages so bytes never
round-trip through Python row-at-a-time. Batches arrive as
``pandas.Series`` of ``bytes`` — the natural unit for handing to a codec
library.

Codec support is tiered (r7):

- **Real decode, stdlib-only** (:func:`extract_real_features`): WAV-PCM
  via the stdlib ``wave`` module and PNG via ``zlib`` inflate + a numpy
  scanline unfilter (all five PNG filter types; 8-bit gray/RGB/RGBA).
  No external codec library involved — the formats whose containers the
  standard library can open get genuinely decoded, and the features
  (sample rate, RMS, pixel means, dimensions) come from the decoded
  samples/pixels, not the container bytes.
- **Honest stub** for everything else (JPEG/H.264/...): the compressed
  codecs genuinely need PIL/pyav, which are not installed here, so the
  kernel raises ``NotImplementedError`` naming the missing dependency.
- ``fake=True`` on :func:`extract_features` keeps the deterministic
  byte-stat path — the cross-engine-oracle leg (an external SQL engine
  can recompute byte stats from the source text; it cannot re-run a
  codec).

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


#: Real-decode feature row: container-level dims + sample/pixel stats.
REAL_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),  # wav | png
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("mean_value", DoubleType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def _decode_wav(payload: bytes):
    """WAV-PCM → (float64 samples in [-1, 1), n_channels, sample_rate)
    — stdlib ``wave`` for the container, numpy for the PCM block."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, rate, nframes = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(nframes)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} not supported")
    return x, nch, rate


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (8-bit, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_png(payload: bytes):
    """PNG → (uint8 array [h, w, channels], width, height) — pure
    ``zlib`` inflate + numpy scanline unfilter (all 5 filter types).
    8-bit depth, non-interlaced; anything else raises (honest about the
    subset a stdlib decoder can cover)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace} "
                    "outside the stdlib decoder's 8-bit non-interlaced subset"
                )
            meta = (w, h, _PNG_CHANNELS[color])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, ch = meta
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch
    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f, line = int(rows[y, 0]), rows[y, 1:]
        up = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:  # None
            out[y] = line
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-ch] — a per-
            # channel-stride cumulative sum; uint8 accumulate wraps mod
            # 256, exactly the PNG spec arithmetic
            out[y] = np.add.accumulate(
                line.reshape(-1, ch), axis=0, dtype=np.uint8
            ).reshape(-1)
        elif f == 2:  # Up — vectorized over the full scanline
            out[y] = line + up
        elif f in (3, 4):  # Average / Paeth need the left RECON value —
            # inherently sequential per pixel; plain loop (decode cost
            # is dominated by inflate for real images)
            cur = out[y]
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(up[i])
                if f == 3:
                    cur[i] = (int(line[i]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(out[y - 1][i - ch]) if (i >= ch and y) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
    return out.reshape(h, w, ch), w, h


def _real_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Dispatch on payload magic bytes: WAV and PNG decode for real;
    other modalities raise the honest codec stub."""
    import numpy as np

    out = {k: [] for k in (
        "kind", "width", "height", "n_channels", "sample_rate",
        "n_samples", "mean_value", "rms",
    )}

    def emit(**kw):
        for k in out:
            out[k].append(kw.get(k))

    for p in pdf["payload"]:
        if p is None:
            emit()
        elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            x, nch, rate = _decode_wav(bytes(p))
            emit(
                kind="wav",
                n_channels=nch,
                sample_rate=rate,
                n_samples=int(x.size // max(1, nch)),
                mean_value=float(x.mean()) if x.size else 0.0,
                rms=float(np.sqrt((x * x).mean())) if x.size else 0.0,
            )
        elif p[:8] == _PNG_MAGIC:
            px, w, h = _decode_png(bytes(p))
            emit(
                kind="png",
                width=w,
                height=h,
                n_channels=int(px.shape[2]),
                mean_value=float(px.mean()),
                rms=float(np.sqrt((px.astype(np.float64) ** 2).mean())),
            )
        else:
            raise NotImplementedError(
                "real decode supports stdlib-decodable containers (WAV-PCM, "
                "PNG); this payload needs a codec library (e.g. PIL/pyav) "
                "that is not installed"
            )
    return pd.DataFrame(out)


def extract_real_features(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL feature extraction (WAV/PNG stdlib decode):
    same mapInPandas shape as :func:`extract_features`, but the features
    come from decoded samples/pixels. Raises inside the kernel for
    payloads only a real codec library could open."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _real_decode_batch(pdf)
            out = pd.DataFrame({"media_id": pdf["media_id"]})
            yield pd.concat([out, feats], axis=1)

    return df.mapInPandas(run, schema=REAL_FEATURE_SCHEMA)


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
