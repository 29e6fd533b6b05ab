"""Streaming as-of enrichment — the stateful twin of
:func:`...operators.asof.asof_join` (the late-arriving-dimension
enrichment a 100 TB event pipeline runs continuously: every event gets
the dimension version in effect at its event time).

Spark's watermarked stream-stream joins give interval semantics, not
as-of ("latest right row ≤ left time") — expressing as-of through them
needs an unbounded join range plus a per-pair latest filter, which is
exactly the quadratic shape the batch operator avoids. This twin keeps
the batch operator's sort-merge idea in explicit state instead: both
streams union into one keyed stream; per key the fold walks rows in
``(time, side)`` order (right-at-equal-time before left — the batch
operator's inclusive tie rule), carrying ONE current payload in the
state store. Bounded state: latest version per key, regardless of how
many updates or events flow.

Ordering contract (same as :mod:`.funnel`): state folds each
micro-batch in event-time order, but a right-side version arriving in a
LATER micro-batch than an event it should have enriched is too late —
the event was already emitted with the then-current payload
(transition-time semantics). Deliver per-key event-time-ordered batches
(the availableNow file-drain pattern used throughout this repo) and the
result equals the batch as-of join — pinned, including a replayed
micro-batch, in tests/test_asof_stream.py. Right rows OLDER than the
carried state are ignored (state only advances), so replays and
duplicated right rows are idempotent.

Cite (parity target): reference pipelines enrich facts against SCD
dimension versions at load time (local_spotify_dab silver→gold); this
operator is the continuous form of that point-in-time lookup.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructField, StructType, TimestampType

_T, _SIDE = "__t", "__side"


def asof_enrich_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Enrich the ``left`` event stream with the latest ``right`` payload
    whose ``right_time <= left_time`` per key (NULLs before the first
    version). Output: ``on + left's other columns + payload_cols`` —
    the batch :func:`...operators.asof.asof_join` column contract.

    Payload columns must be atomic types (they ride the state store).
    A NULL ``right_time`` matches nothing and a NULL ``left_time``
    yields a NULL payload — the batch operator's NULL contract.
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in set(on) | {right_time}
    ]
    left_extra = [c for c in left.columns if c not in set(on) | {left_time}]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns clash with left side: {sorted(clash)}")
    r_type = dict(zip(right.schema.names, right.schema.fields))
    l_type = dict(zip(left.schema.names, left.schema.fields))

    tagged_left = left.select(
        *on,
        F.col(left_time).cast("timestamp").alias(_T),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_extra],
        *[F.lit(None).cast(r_type[c].dataType).alias(c) for c in payload_cols],
    )
    tagged_right = (
        right.filter(F.col(right_time).isNotNull())
        .select(
            *on,
            F.col(right_time).cast("timestamp").alias(_T),
            F.lit(0).alias(_SIDE),
            *[F.lit(None).cast(l_type[c].dataType).alias(c) for c in left_extra],
            *[F.col(c) for c in payload_cols],
        )
    )
    unioned = tagged_left.unionByName(tagged_right)

    out_schema = StructType(
        [l_type[c] for c in on]
        + [StructField(left_time, TimestampType())]
        + [l_type[c] for c in left_extra]
        + [r_type[c] for c in payload_cols]
    )
    state_schema = StructType(
        [StructField("__rt", TimestampType())]
        + [r_type[c] for c in payload_cols]
    )
    n_on = len(on)

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        cur = list(state.get) if state.exists else None  # [rt, p1..pk]
        ev = pd.concat(list(pdfs))
        # NULL left_time → NULL payload (emitted below, outside the
        # time walk); NULL right_time was filtered at the source
        nat_left = ev[ev[_T].isna() & (ev[_SIDE] == 1)]
        ev = ev.dropna(subset=[_T]).sort_values([_T, _SIDE], kind="stable")
        out = []
        # to_dict (not itertuples): namedtuple field mangling would
        # rename the leading-underscore internal columns
        for d in ev.to_dict("records"):
            if d[_SIDE] == 0:
                rt = pd.Timestamp(d[_T])
                # state only advances: older/duplicate versions (late
                # delivery, replays) never regress the carried payload
                if cur is None or not (pd.Timestamp(cur[0]) > rt):
                    cur = [rt] + [d[c] for c in payload_cols]
            else:
                payload = cur[1:] if cur is not None else [None] * len(payload_cols)
                out.append(
                    list(key)
                    + [d[_T]]
                    + [d[c] for c in left_extra]
                    + list(payload)
                )
        for d in nat_left.to_dict("records"):
            out.append(
                list(key)
                + [None]
                + [d[c] for c in left_extra]
                + [None] * len(payload_cols)
            )
        if cur is not None:
            rt = pd.Timestamp(cur[0])
            state.update(tuple([rt.to_pydatetime()] + cur[1:]))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return unioned.groupBy(*on).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
