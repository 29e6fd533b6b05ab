"""Schema tracking + rescue-column emulation (Auto Loader analogue).

Parity: the reference ingests bronze with Databricks Auto Loader:
``spark.readStream.format('cloudFiles')`` with ``cloudFiles.format=
parquet``, ``schemaEvolutionMode='rescue'`` and a persisted
``schemaLocation`` (``Silver_Dimensions.py:310-319``, explained
:300-308); unexpected columns land in a ``_rescued_data`` JSON column
instead of failing the stream, and the silver clean step drops it
(:499-502). SURVEY.md §2.1 S6, §4.3.

OSS Spark has no ``cloudFiles`` source, so this module emulates the two
Databricks-only pieces (SURVEY.md §4.3):

- **Persisted schema**: the first run peeks the input files' footer
  schema (driver-side pyarrow, no data read) and persists it as JSON next
  to the checkpoint — the declared schema, stable across runs.
- **Rescue**: each run re-peeks the actual file schema; columns NOT in
  the declared schema are read anyway, packed into a ``_rescued_data``
  JSON string column, and dropped from the top level. Declared columns
  always come out in declared order, so downstream silver logic never
  breaks on upstream schema drift.

The data path stays fully streaming: ``spark.readStream.schema(s)
.parquet(dir)`` — incremental file discovery + exactly-once offsets come
from the Structured Streaming file source + checkpoint, same as Auto
Loader's own bookkeeping.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

RESCUE_COL = "_rescued_data"


#: Max files whose footers are unified per run. Schema drift arrives in the
#: NEWEST files, so the sample is mtime-descending — on a 100 TB directory
#: this stays a bounded driver-side metadata scan.
_SCHEMA_SAMPLE_FILES = 256


def _peek_file_schema(path: str) -> StructType:
    """Union schema of the files currently in ``path`` (footers only).

    ``pyarrow.dataset(...).schema`` reflects only the first fragment, so
    drifted columns in later files would be invisible; instead the footers
    of the newest ``_SCHEMA_SAMPLE_FILES`` files are read and unified.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    files: list[tuple[float, str]] = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") and not n.startswith(("_", ".")):
                p = os.path.join(root, n)
                try:  # tolerate concurrent compaction/retention deletes
                    files.append((os.path.getmtime(p), p))
                except OSError:
                    continue
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    files.sort(reverse=True)
    files = [p for _, p in files]
    schemas = [pq.read_schema(f) for f in files[:_SCHEMA_SAMPLE_FILES]]
    return from_arrow_schema(pa.unify_schemas(schemas, promote_options="permissive"))


class SchemaTracker:
    """Persist the declared schema at ``schema_location`` (JSON).
    Routed through StateFS (r11) so object-store schema locations work
    like Auto Loader's ``cloudFiles.schemaLocation`` does."""

    def __init__(self, schema_location: str) -> None:
        from dataeng_azure_spotify_spark.statefs import statefs_for

        self.schema_location = schema_location
        self._file = os.path.join(schema_location, "schema.json")
        self.fs = statefs_for(schema_location)

    def load(self) -> StructType | None:
        if not self.fs.exists(self._file):
            return None
        return StructType.fromJson(
            json.loads(self.fs.read_bytes(self._file).decode())
        )

    def save(self, schema: StructType) -> None:
        self.fs.makedirs(self.schema_location)
        self.fs.write_atomic(
            self._file, json.dumps(schema.jsonValue()).encode()
        )


def read_bronze_stream(
    spark: SparkSession,
    path: str,
    schema_location: str,
    add_rescue: bool = True,
) -> DataFrame:
    """Streaming read of a bronze directory with rescue-mode evolution.

    Returns a streaming DataFrame with the *declared* columns plus
    ``_rescued_data`` (NULL on rows where nothing was rescued).

    Scope vs Auto Loader: ADDED columns are rescued; an incompatible
    TYPE CHANGE to a declared column still fails the scan (Auto Loader
    would route those values into the rescue column) — handling it
    needs per-file schema reconciliation at read time, which the
    parquet batch reader cannot express without reading every column
    as string. Declared-column type drift therefore surfaces loudly
    rather than silently.
    """
    tracker = SchemaTracker(schema_location)
    declared = tracker.load()
    try:
        actual = _peek_file_schema(path)
    except FileNotFoundError:
        if declared is None:
            raise  # first run truly needs at least one file to infer
        # bronze drained/archived after a prior run: the persisted
        # declared schema drives an empty no-op stream instead of
        # killing the whole silver/pipeline run
        actual = declared
    if declared is None:
        declared = actual
        tracker.save(declared)

    declared_names = set(declared.fieldNames())
    extra_fields = [f for f in actual.fields if f.name not in declared_names]

    # Read with the widest schema we know about so new columns are not
    # silently dropped (parquet is read by name; missing cols → null).
    read_schema = StructType(declared.fields + extra_fields)
    df = spark.readStream.schema(read_schema).parquet(path)

    if not add_rescue:
        return df.select(*declared.fieldNames())

    if extra_fields:
        # to_json drops null struct fields, so an unconditional call
        # would stamp '{}' on every pre-drift row; only rows where some
        # extra column is actually present get a payload — the Auto
        # Loader contract (NULL = nothing rescued) the module mirrors
        any_extra = None
        for f in extra_fields:
            c = F.col(f.name).isNotNull()
            any_extra = c if any_extra is None else (any_extra | c)
        rescued = F.when(
            any_extra,
            F.to_json(F.struct(*[F.col(f.name) for f in extra_fields])),
        )
    else:
        rescued = F.lit(None).cast("string")
    return df.withColumn(RESCUE_COL, rescued).select(
        *declared.fieldNames(), RESCUE_COL
    )
