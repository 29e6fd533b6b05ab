"""Silver → gold streaming CDC flows (the DLT ``create_auto_cdc_flow``
analogue, SURVEY.md §2.7 C1-C6, §3.3).

Each gold table is a checkpointed streaming query over the silver append
stream whose ``foreachBatch`` body applies the SCD merge
(``operators.scd``) against the materialized gold table:

    silver stream ─▶ foreachBatch(batch):
        target  = read gold snapshot
        merged  = apply_scd1|apply_scd2(target, batch, keys, sequence_by)
        atomically replace gold snapshot with merged

On Delta-capable clusters the body becomes ``DeltaTable.merge`` (SCD1:
``whenMatchedUpdateAll(condition='s.seq >= t.seq')``; SCD2: close + insert
version rows) and the snapshot swap disappears. Here the snapshot is a
parquet directory swapped via atomic rename — the same recovery contract:
a crashed batch leaves the old snapshot intact, and the streaming
checkpoint replays the batch (the merge is idempotent: re-merging the
same rows yields the same table).

Expectations (``expect_all_or_drop``) attach before the merge, exactly
where DLT enforces them (reference ``DimUser.py:91-94``).
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession

from dataeng_azure_spotify_spark.operators.relational import expectations_drop
from dataeng_azure_spotify_spark.operators.scd import apply_scd1, apply_scd2


class ParquetSnapshotTable:
    """A table stored as versioned parquet snapshots with atomic swap.

    Layout: ``<base>/_current`` is a text pointer to the live snapshot
    directory ``<base>/snap-<uuid>``. Writers write a full new snapshot
    then atomically repoint; readers resolve the pointer. This gives
    single-writer atomic replace without a transaction log — the local
    stand-in for Delta's MERGE commit.
    """

    def __init__(self, spark: SparkSession, base: str) -> None:
        self.spark = spark
        self.base = base
        os.makedirs(base, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.base, "_current")

    def exists(self) -> bool:
        return os.path.exists(self._pointer)

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        with open(self._pointer) as f:
            snap = f.read().strip()
        return self.spark.read.parquet(os.path.join(self.base, snap))

    def history(self) -> list[str]:
        """Snapshot names, oldest → newest (mtime order) — the retained
        versions, Delta-history style. The live one is last unless vacuum
        already dropped intermediates."""
        snaps = [d for d in os.listdir(self.base) if d.startswith("snap-")]
        return sorted(snaps, key=lambda d: os.path.getmtime(os.path.join(self.base, d)))

    def read_version(self, version: int) -> DataFrame:
        """Time travel: read the version-th retained snapshot (negative
        indices from the end, -1 = newest). Raises IndexError if vacuumed."""
        return self.spark.read.parquet(
            os.path.join(self.base, self.history()[version])
        )

    def overwrite(self, df: DataFrame) -> None:
        """Write a new snapshot and atomically repoint.

        Old snapshots are retained (like Delta's versioned files): lazy
        DataFrames already planned against a prior snapshot keep working.
        Call :meth:`vacuum` to reclaim space once readers have drained.
        """
        snap = f"snap-{uuid.uuid4().hex[:12]}"
        path = os.path.join(self.base, snap)
        df.write.mode("overwrite").parquet(path)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(snap)
        os.replace(tmp, self._pointer)

    def vacuum(self, keep_last: int = 2) -> None:
        """Delete all but the newest ``keep_last`` snapshots (by mtime),
        never the live one."""
        if not self.exists():
            return
        with open(self._pointer) as f:
            live = f.read().strip()
        snaps = sorted(
            (d for d in os.listdir(self.base) if d.startswith("snap-")),
            key=lambda d: os.path.getmtime(os.path.join(self.base, d)),
            reverse=True,
        )
        for d in snaps[keep_last:]:
            if d != live:
                shutil.rmtree(os.path.join(self.base, d), ignore_errors=True)


@dataclass
class CdcFlow:
    """Declarative CDC flow — mirrors ``create_auto_cdc_flow``'s signature
    (reference ``FactStream.py:93-103``, ``DimUser.py:115-125``):
    target path, keys, sequence_by, scd_type 1|2, optional expectations."""

    name: str
    gold_base: str
    keys: list[str]
    sequence_by: str
    scd_type: int = 1
    tiebreakers: list[str] = field(default_factory=list)
    expectations: Mapping[str, str] = field(default_factory=dict)
    drop_unchanged: bool = False
    #: ``track_history_column_list`` / ``track_history_except_column_list``
    #: parity (reference defaults both to None → all columns tracked,
    #: ``DimArtist.py:102-103``). ``track_history_cols`` wins if both set.
    track_history_cols: list[str] | None = None
    track_history_except: list[str] | None = None

    def _tracked_cols(self, batch: DataFrame) -> list[str] | None:
        if self.track_history_cols is not None:
            return self.track_history_cols
        if self.track_history_except is not None:
            skip = set(self.track_history_except) | set(self.keys) | {self.sequence_by}
            return [c for c in batch.columns if c not in skip]
        return None

    def merge_batch(self, spark: SparkSession, batch: DataFrame) -> None:
        """The foreachBatch body — also usable directly for batch CDC."""
        table = ParquetSnapshotTable(spark, self.gold_base)
        if self.expectations:
            batch = expectations_drop(batch, self.expectations)
        target = table.read()
        if self.scd_type == 1:
            merged = apply_scd1(
                target, batch, self.keys, self.sequence_by, self.tiebreakers
            )
        else:
            merged = apply_scd2(
                target,
                batch,
                self.keys,
                self.sequence_by,
                self.tiebreakers,
                self.drop_unchanged,
                self._tracked_cols(batch),
            )
        table.overwrite(merged)

    def run_stream(
        self, spark: SparkSession, silver_stream: DataFrame, checkpoint: str
    ):
        """Checkpointed bounded streaming run of this flow."""
        q = (
            silver_stream.writeStream.foreachBatch(
                lambda batch, _id: self.merge_batch(spark, batch)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q
