"""SCD Type 1 / Type 2 CDC operators — the reference's centerpiece
(SURVEY.md §2.7).

Parity targets (all five gold flows use the same API):

- SCD1 upsert: ``create_auto_cdc_flow(target='fact_stream', keys=
  ['stream_id'], sequence_by='stream_timestamp', stored_as_scd_type=1)``
  — reference ``.../transformations/FactStream.py:93-103``; rationale
  (late/corrected events overwrite by sequence) :15-25.
- SCD2 history: same API with ``stored_as_scd_type=2`` producing
  ``__START_AT``/``__END_AT`` validity columns — ``DimUser.py:115-125``,
  ``DimArtist.py:96-106``, ``DimTrack.py:84-94``, ``DimDate.py:12-22``.
  ``track_history_column_list`` is None everywhere → change detection on
  all columns (``DimArtist.py:102-103``).

Spark-first design: the core is pure DataFrame algebra (window functions
over the key partitions), so Catalyst plans it as ONE shuffle on the
business key followed by per-partition sorting — no driver-side loops.
At scale:

- SCD1 merge shuffles only ``target ∪ updates`` on the key; with a
  key-bucketed target table the shuffle disappears entirely (both sides
  co-partitioned).
- SCD2 incremental touches only *affected* keys (semi/anti join split),
  so a micro-batch of K changed keys rewrites O(K·versions) rows, not the
  whole dimension. On Delta-capable clusters the same logic drops into
  ``MERGE INTO``; here the sink rewrites parquet snapshots atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START_COL = "__START_AT"
END_COL = "__END_AT"
CURRENT_COL = "__IS_CURRENT"


def _order_cols(sequence_by: str, tiebreakers: list[str] | None, desc: bool):
    cols = [F.col(sequence_by)] + [F.col(t) for t in (tiebreakers or [])]
    return [c.desc() for c in cols] if desc else [c.asc() for c in cols]


def apply_scd1(
    target: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    sequence_by: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """SCD Type 1 upsert: latest-truth overwrite per business key.

    Merge semantics match Delta ``whenMatchedUpdateAll(condition=
    "s.seq >= t.seq")`` (SURVEY.md §2.7 C1): an update with an equal or
    newer ``sequence_by`` replaces the target row; stale/late updates are
    ignored; unseen keys insert. Implemented as union + row_number so a
    whole micro-batch with multiple changes per key collapses in one pass.

    ``tiebreakers`` break exact sequence ties deterministically *within* a
    side; across sides an update beats a target row with the same
    (sequence, tiebreakers) — the ``>=`` in the merge condition.
    """
    upd = updates.withColumn("__src", F.lit(1))
    if target is None:
        unioned = upd
    else:
        unioned = target.withColumn("__src", F.lit(0)).unionByName(upd)
    order = _order_cols(sequence_by, (tiebreakers or []) + ["__src"], desc=True)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def scd2_from_history(
    changes: DataFrame,
    keys: list[str],
    sequence_by: str,
    tiebreakers: list[str] | None = None,
    drop_unchanged: bool = False,
    tracked_cols: list[str] | None = None,
) -> DataFrame:
    """Build a full SCD2 table from a pile of change rows.

    Each change row becomes one version: ``__START_AT`` = its sequence
    value, ``__END_AT`` = the next version's sequence for the same key
    (``lead()``), NULL for the current version; ``__IS_CURRENT`` flags the
    open row. This is exactly the validity-interval semantics of
    ``create_auto_cdc_flow(..., stored_as_scd_type=2)``.

    ``drop_unchanged=True`` reproduces DLT's change detection: a row whose
    tracked columns (default: all non-key, non-sequence columns) equal the
    previous version's is suppressed — no spurious version.

    One shuffle on ``keys``; per-key ordering by (sequence, tiebreakers)
    must be total for deterministic output.
    """
    order = _order_cols(sequence_by, tiebreakers, desc=False)
    w = Window.partitionBy(*keys).orderBy(*order)

    df = changes
    if drop_unchanged:
        tracked = tracked_cols or [
            c for c in df.columns if c not in set(keys) | {sequence_by}
        ]
        prev = F.lag(F.struct(*tracked)).over(w)
        df = (
            df.withColumn("__same", prev.eqNullSafe(F.struct(*tracked)))
            .filter(~F.coalesce(F.col("__same"), F.lit(False)))
            .drop("__same")
        )
        # recompute the window over the surviving rows
        w = Window.partitionBy(*keys).orderBy(*order)

    out = df.withColumn(START_COL, F.col(sequence_by)).withColumn(
        END_COL, F.lead(F.col(sequence_by)).over(w)
    )
    return out.withColumn(CURRENT_COL, F.col(END_COL).isNull())


def apply_scd2(
    target: DataFrame | None,
    updates: DataFrame,
    keys: list[str],
    sequence_by: str,
    tiebreakers: list[str] | None = None,
    drop_unchanged: bool = False,
    tracked_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental SCD2 merge: fold a batch of updates into an existing
    SCD2 target (the ``foreachBatch`` body of the gold CDC flow).

    Only the keys present in ``updates`` are touched: the target splits
    into affected (left-semi) and untouched (left-anti) halves, the
    affected histories are rebuilt from their underlying change rows plus
    the new updates (correct under out-of-order ``sequence_by`` and
    multi-change batches — SURVEY.md §7 M4 hard cases), and the untouched
    half passes through unchanged. A micro-batch touching K keys costs
    O(K · versions-per-key), independent of dimension size.
    """
    if target is None:
        return scd2_from_history(
            updates, keys, sequence_by, tiebreakers, drop_unchanged, tracked_cols
        )

    affected_keys = updates.select(*keys).distinct()
    target_affected = target.join(F.broadcast(affected_keys), on=keys, how="left_semi")
    target_rest = target.join(F.broadcast(affected_keys), on=keys, how="left_anti")

    # Each existing SCD2 row *is* the change row that opened it.
    change_cols = [c for c in target.columns if c not in (START_COL, END_COL, CURRENT_COL)]
    prior_changes = target_affected.select(*change_cols)
    # distinct() makes the merge idempotent: a re-delivered row identical to
    # an existing version collapses instead of opening a spurious duplicate
    # (Delta MERGE's matched-row no-op equivalent)
    all_changes = prior_changes.unionByName(updates.select(*change_cols)).distinct()

    rebuilt = scd2_from_history(
        all_changes, keys, sequence_by, tiebreakers, drop_unchanged, tracked_cols
    )
    return target_rest.unionByName(rebuilt)
