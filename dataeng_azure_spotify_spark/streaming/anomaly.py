"""Streaming twin of the daily-anomaly detector.

Batch (:func:`...operators.analytics.daily_metric_anomalies`) computes
daily totals + trailing z-scores over the whole event log; this module
maintains the SAME answer incrementally under a checkpointed
``availableNow`` stream, so an alerting job can run per-trigger without
ever rescanning history.

Exactly-once state without merges: each micro-batch writes its
per-(grp, day) DECIMAL partial totals to its own ``epoch=N`` partition
with idempotent overwrite — the same epoch-partition discipline as
:mod:`.admission`. A crashed epoch is re-delivered with the same id and
rewrites an identical partition; no read-modify-write race, no replay
double-count. Decimal partials are exact and re-aggregable, so
``sum(partials)`` equals the one-pass batch total bit-for-bit, and
:func:`current` feeds the re-aggregated totals through the identical
``zscores_from_daily`` stage — the monitor's output is therefore
DataFrame-equal to the batch operator on the union of all epochs (the
pytest pins exactly that, plus equality after a replay).

State growth is O(groups × days) per epoch — partials, not events —
and epochs compact away: ``compact_state`` folds all epoch partitions
into one (run it on a schedule like any small-files job; readers see
old or new layout, never half of each).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataeng_azure_spotify_spark.operators.analytics import (
    daily_totals,
    zscores_from_daily,
)


class AnomalyMonitor:
    """Incrementally-maintained daily totals + trailing z-score flags."""

    def __init__(
        self,
        state_dir: str,
        metric_col: str = "value",
        group_col: str = "event_type",
        ts_col: str = "ts",
        trailing_days: int = 7,
        z_thresh: float = 2.0,
    ) -> None:
        self.state_dir = state_dir
        self.metric_col = metric_col
        self.group_col = group_col
        self.ts_col = ts_col
        self.trailing_days = trailing_days
        self.z_thresh = z_thresh

    # -- stream side -------------------------------------------------------

    def process_stream(self, source: DataFrame, checkpoint: str):
        """Drain ``source`` (a streaming DataFrame of events) into the
        partial-totals state under an ``availableNow`` trigger.

        Epoch partitions are namespaced by a hash of the checkpoint
        location (the admission.py rationale): state outlives any one
        checkpoint, and a NEW checkpoint restarts epoch ids at 0 — a
        bare ``epoch=0`` from a later pipeline would silently overwrite
        the first pipeline's partials (or a compacted baseline) while
        older epochs keep double-counting.
        """
        import hashlib

        ns = hashlib.md5(os.path.abspath(checkpoint).encode()).hexdigest()[:12]

        def handle(batch: DataFrame, epoch_id: int) -> None:
            partial = daily_totals(
                batch, self.metric_col, self.group_col, self.ts_col
            )
            partial.write.mode("overwrite").parquet(
                os.path.join(self.state_dir, f"epoch={ns}-{epoch_id}")
            )

        q = (
            source.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    # -- read side ---------------------------------------------------------

    def _totals(self, spark: SparkSession) -> DataFrame:
        partials = spark.read.parquet(self.state_dir).drop("epoch")
        return (
            partials.groupBy("grp", "day")
            .agg(F.sum("day_total").cast("decimal(18,4)").alias("day_total"))
        )

    def current(self, spark: SparkSession) -> DataFrame:
        """The full anomaly table over everything ingested so far —
        DataFrame-equal to the batch operator on the same events."""
        return zscores_from_daily(
            self._totals(spark),
            trailing_days=self.trailing_days,
            z_thresh=self.z_thresh,
        )

    def compact_state(self, spark: SparkSession) -> None:
        """Fold all epoch partitions into one ``epoch=baseline`` partial.

        NOTE: run only while no stream is writing the same state dir;
        the swap is atomic for readers (old or new listing), not for a
        concurrent writer appending a new epoch mid-swap.
        """
        from dataeng_azure_spotify_spark.sources.layout import atomic_swap_dir

        folded = self._totals(spark)
        # "baseline" can never collide with the namespaced epoch ids
        atomic_swap_dir(
            self.state_dir,
            lambda tmp: folded.write.mode("overwrite").parquet(
                os.path.join(tmp, "epoch=baseline")
            ),
        )
