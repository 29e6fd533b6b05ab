"""Per-table CDC watermark state — the reference's ``cdc.json`` mechanism.

Parity: the reference keeps one ``bronze/<table>_cdc/cdc.json`` per table
holding ``{"cdc": "<last extracted value>"}``, seeded with
``{"cdc": "1900-01-01"}`` (``data_scripts/cdc.json:1``, seeded by
``terraform/02_storage_account/main.tf:37-44``); the pipeline Lookup reads
it (``pipeline/incremental_ingestion.json:17-43``) and a Copy rewrites it
with ``SELECT MAX(cdc_col)`` after a non-empty extract (:199-257).
SURVEY.md §2.1 S2/S4, §3.1.

Improvement over the reference (noted in SURVEY.md §3.1): the reference's
read-modify-write of ``cdc.json`` is not transactional. Here the write
goes to a temp file then an atomic rename (StateFS) so a crashed
run never leaves a torn watermark. On a real deployment this store is one
tiny Delta table (key, watermark) written transactionally; the JSON-file
layout is kept for behavioral parity and zero-dependency local runs.
"""

from __future__ import annotations

import json
import os

from dataeng_azure_spotify_spark.statefs import statefs_for

SEED_WATERMARK = "1900-01-01"


class WatermarkStore:
    """Directory of ``<table>_cdc/cdc.json`` files under ``base``.
    Control-plane IO goes through StateFS (r11): local bases stay
    pure-POSIX; scheme'd bases (``abfss://``, ``s3a://``, ``file://``)
    reach the session JVM's Hadoop FileSystem."""

    def __init__(self, base: str, seed: str = SEED_WATERMARK) -> None:
        self.base = base
        self.seed = seed
        self.fs = statefs_for(base)
        self.fs.makedirs(base)

    def _path(self, table: str) -> str:
        return os.path.join(self.base, f"{table}_cdc", "cdc.json")

    def read(self, table: str) -> str:
        """Current watermark; missing state file → the 1900-01-01 seed."""
        path = self._path(table)
        if not self.fs.exists(path):
            return self.seed
        return json.loads(self.fs.read_bytes(path).decode())["cdc"]

    def write(self, table: str, value: str) -> None:
        """Atomic replace (temp file + rename) — crash-safe."""
        path = self._path(table)
        self.fs.makedirs(os.path.dirname(path))
        self.fs.write_atomic(path, json.dumps({"cdc": value}).encode())
