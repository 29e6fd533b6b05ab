"""Streaming funnel-stage tracking — the stateful twin of
:func:`...operators.analytics.funnel`.

Each user carries ``(stage, stage_ts)`` in the state store: stage k
means steps 0..k-1 are complete, ``stage_ts`` is the time of the
earliest qualifying step-(k-1) event. A micro-batch's events for a key
fold in event-time order; every advance emits one APPEND-final row
``(user, step, step_idx, step_ts)`` — a reached stage never un-reaches,
so the stream composes with exactly-once file sinks, and per-step
``count`` over the emitted rows equals the batch operator's funnel
counts.

Ordering contract: state folds each micro-batch in ``ts`` order, but a
step event arriving in an EARLIER micro-batch than its predecessor
step's event is gone by the time the predecessor lands (the batch twin,
which sees all history, would count it). Deliver per-user event-time
ordered batches (the availableNow file-drain pattern used throughout
this repo) or accept transition-time semantics — the pytest pins
equality with the batch operator under ordered delivery, which is the
honest guarantee. Bounded state: two fields per user, no timeline
buffering.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: output schema for the DEFAULT key column (long user_id); the actual
#: schema is derived per call from the input's key column name/type
FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("step", StringType()),
        StructField("step_idx", IntegerType()),
        StructField("step_ts", TimestampType()),
    ]
)


def _output_schema(df: DataFrame, user_col: str) -> StructType:
    return StructType(
        [
            StructField(user_col, df.schema[user_col].dataType),
            StructField("step", StringType()),
            StructField("step_idx", IntegerType()),
            StructField("step_ts", TimestampType()),
        ]
    )

#: (stage reached so far, timestamp of the latest completed stage)
FUNNEL_STATE_SCHEMA = StructType(
    [StructField("stage", IntegerType()), StructField("stage_ts", TimestampType())]
)


def funnel_stage_stream(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Emit one row per per-user funnel-stage advance (append-final)."""
    if not steps:
        raise ValueError("funnel_stage_stream needs at least one step")

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            stage, stage_ts = state.get
            stage_ts = pd.Timestamp(stage_ts)
        else:
            stage, stage_ts = 0, None
        ev = pd.concat(list(pdfs))
        # NULL-ts contract of the batch twin (analytics.funnel filters
        # ts IS NOT NULL up front): a NaT first-step event must not
        # advance stage 0 with a NaT stage_ts and then block all later
        # stages with an un-orderable timestamp.
        ev = ev[[ts_col, type_col]].dropna(subset=[ts_col]).sort_values(ts_col)
        out = []
        for ts, et in zip(ev[ts_col], ev[type_col]):
            if stage >= len(steps) or et != steps[stage]:
                continue
            # first step needs no predecessor; later steps strictly after
            if stage > 0 and not (pd.Timestamp(ts) > stage_ts):
                continue
            stage += 1
            stage_ts = pd.Timestamp(ts)
            out.append((steps[stage - 1], stage, stage_ts))
        if out:
            state.update((int(stage), stage_ts.to_pydatetime()))
            yield pd.DataFrame(
                {
                    user_col: [key[0]] * len(out),
                    "step": [o[0] for o in out],
                    "step_idx": [o[1] for o in out],
                    "step_ts": [o[2] for o in out],
                }
            )

    return df.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=_output_schema(df, user_col),
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
