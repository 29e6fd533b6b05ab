"""Custom stateful streaming operator: per-key sessionization with
explicit state (``applyInPandasWithState``) — beyond-reference surface
(the reference's only stateful op is streaming ``dropDuplicates``,
``Silver_Dimensions.py:487-494``; SURVEY.md §2.8 lists stateful ops as a
gap this engine fills).

Built-in ``session_window`` covers windowed aggregation; this operator is
the template for semantics the built-ins can't express: arbitrary
per-key state (running session accumulator), custom emission rules
(close a session only when a later event proves the gap), and
Arrow-batched per-group compute. State lives in the streaming state
store (checkpointed, exactly-once across micro-batch restarts); at
100 TB state is partitioned by the grouping key across executors and
each micro-batch touches only keys present in the batch.

``sessionize_batch`` is the batch twin with identical semantics, used by
tests (and usable as a backfill path) — streaming output after N
micro-batches equals the batch run over the concatenated input, for the
*closed* sessions; the trailing open session per key stays in state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

#: output schema for the DEFAULT key column (long user_id); the actual
#: schema is derived per call from the input's key column name/type
SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", LongType(), False),
    ]
)


def _session_output_schema(df, key_col: str) -> StructType:
    return StructType(
        [
            StructField(key_col, df.schema[key_col].dataType, False),
            StructField("session_start", TimestampType(), False),
            StructField("session_end", TimestampType(), False),
            StructField("n_events", LongType(), False),
        ]
    )

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_start", TimestampType(), True),
        StructField("last_ts", TimestampType(), True),
        StructField("n_events", LongType(), True),
    ]
)


def _close_sessions(
    ts_sorted: pd.Series,
    carried: Tuple | None,
    gap_seconds: int,
) -> Tuple[list, Tuple | None]:
    """Fold a sorted event-time series into closed sessions + open tail."""
    closed: list = []
    gap = pd.Timedelta(seconds=gap_seconds)
    if carried is None:
        start = last = None
        n = 0
    else:
        start, last, n = carried
    for ts in ts_sorted:
        if last is not None and ts - last > gap:
            closed.append((start, last + gap, n))
            start, last, n = ts, ts, 1
        elif last is None:
            start, last, n = ts, ts, 1
        else:
            # late arrival (ts ≤ last, possible across micro-batches on
            # an unwatermarked stream): fold it into the open session
            # WITHOUT moving the frontier backwards — a raw last=ts
            # would let a later event "reopen" time and emit a session
            # whose end precedes its start. The open session's span is
            # [min(start, ts), max(last, ts)].
            start, last, n = min(start, ts), max(last, ts), n + 1
    open_tail = None if last is None else (start, last, n)
    return closed, open_tail


def sessionize_stream(
    df: DataFrame, key_col: str = "user_id", ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming sessionization with explicit per-key state.

    A session closes when a later event for the same key arrives more
    than ``gap_seconds`` after the previous one; the close emits
    ``(key, session_start, session_end = last_ts + gap, n_events)``.
    The open trailing session is carried in the state store across
    micro-batches. Emitted rows are final (a closed session never
    reopens), so the operator declares append output mode and composes
    with exactly-once file sinks.
    """

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        carried = None
        if state.exists:
            s, l, n = state.get
            carried = (pd.Timestamp(s), pd.Timestamp(l), n)
        ts_all = pd.concat([pdf[ts_col] for pdf in pdfs]).sort_values()
        closed, open_tail = _close_sessions(ts_all, carried, gap_seconds)
        if open_tail is not None:
            state.update((open_tail[0].to_pydatetime(),
                          open_tail[1].to_pydatetime(), int(open_tail[2])))
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=_session_output_schema(df, key_col),
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_batch(
    df: DataFrame, key_col: str = "user_id", ts_col: str = "ts",
    gap_seconds: int = 1800, include_open: bool = False,
) -> DataFrame:
    """Batch twin of :func:`sessionize_stream` (same fold, no state store).

    With ``include_open=True`` the trailing open session per key is also
    emitted (end = last_ts + gap) — that variant equals the built-in
    ``session_window`` aggregation and the backfill semantics.
    """

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].iloc[0]
        closed, open_tail = _close_sessions(
            pdf[ts_col].sort_values(), None, gap_seconds
        )
        if include_open and open_tail is not None:
            closed.append(
                (open_tail[0], open_tail[1] + pd.Timedelta(seconds=gap_seconds),
                 open_tail[2])
            )
        return pd.DataFrame(
            {
                key_col: [key] * len(closed),
                "session_start": [c[0] for c in closed],
                "session_end": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )

    return df.select(key_col, ts_col).groupBy(key_col).applyInPandas(
        fold, schema=_session_output_schema(df, key_col)
    )


def transform_with_state_available(spark=None) -> bool:
    """True iff the ``transformWithStateInPandas`` path can actually run.

    Two independent requirements, both probed:

    - the ``protobuf`` Python package (the Spark 4.x arbitrary-state API
      drives its stateful worker over a protobuf channel; not installed
      in this sandbox — no package index, installs prohibited — same
      situation as delta-spark, see ``delta_support.py``);
    - the RocksDB state store provider (``transformWithState`` rejects
      the default HDFS-backed provider at runtime). When a ``spark``
      session is given, the configured
      ``spark.sql.streaming.stateStore.providerClass`` is checked;
      without one the protobuf probe alone decides (callers on the tws
      path must configure RocksDB themselves — the test suite does).

    Falls back to ``applyInPandasWithState`` of identical semantics when
    either leg is missing.
    """
    import importlib.util

    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent 'google' namespace absent entirely
        has_protobuf = False
    if not has_protobuf:
        return False
    if spark is not None:
        provider = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", ""
        )
        return "RocksDB" in (provider or "")
    return True


class _QuotaProcessor(StatefulProcessor):
    """Per-key admission quota with a single ValueState counter — the
    ``transformWithStateInPandas`` (Spark 4.x arbitrary-state API) twin
    of the batch :func:`..operators.curation.cap_per_source`.

    State per key is ONE long (admitted-so-far): bounded by key
    cardinality, never by row volume — safe for unbounded 100 TB streams.
    """

    def __init__(self, order_col: str, max_per_key: int) -> None:
        self._order_col = order_col
        self._max = max_per_key

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._admitted = handle.getValueState("admitted", "n long")

    def handleInputRows(self, key, rows, timer_values):
        used = self._admitted.get()[0] if self._admitted.exists() else 0
        budget = self._max - used
        if budget <= 0:
            # quota exhausted in an earlier batch: drop everything
            for _ in rows:
                pass
            return
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values(self._order_col, kind="mergesort")
        admit = batch.head(budget)
        self._admitted.update((used + len(admit),))
        if len(admit):
            yield admit

    def close(self) -> None:
        pass


def quota_admit_stream(
    df: DataFrame,
    key_col: str = "source",
    order_col: str = "doc_id",
    max_per_key: int = 10,
    impl: str = "auto",
) -> DataFrame:
    """Streaming per-key admission quota: admit at most ``max_per_key``
    rows per ``key_col`` over the stream's lifetime, ``order_col``-ordered
    within each micro-batch, arrival-ordered across batches.

    Single-batch output equals the batch :func:`cap_per_source`; across
    batches the quota is enforced cumulatively through the checkpointed
    state store (exactly-once with the file sink). Emitted rows are final
    (admission never revokes), so the operator declares append mode.

    ``impl``: ``"tws"`` uses ``transformWithStateInPandas`` (Spark 4.x
    arbitrary-state API; needs the protobuf worker dependency and the
    RocksDB state store provider), ``"applyInPandas"`` uses
    ``applyInPandasWithState`` (works everywhere), ``"auto"`` picks tws
    where its worker can run. Both carry the same one-long-per-key state
    and admission semantics.
    """
    if impl == "auto":
        # gate on BOTH the protobuf worker and the configured RocksDB
        # provider — a cluster with protobuf but the default HDFS store
        # would pick a path that fails at runtime otherwise
        impl = (
            "tws"
            if transform_with_state_available(df.sparkSession)
            else "applyInPandas"
        )
    if impl == "tws":
        return df.groupBy(key_col).transformWithStateInPandas(
            _QuotaProcessor(order_col, max_per_key),
            outputStructType=df.schema,
            outputMode="append",
            timeMode="none",
        )
    if impl != "applyInPandas":
        raise ValueError(f"unknown impl {impl!r}")
    out_schema = df.schema

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        used = state.get[0] if state.exists else 0
        budget = max_per_key - used
        if budget <= 0:
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(order_col, kind="mergesort")
        admit = batch.head(budget)
        state.update((used + len(admit),))
        if len(admit):
            yield admit

    return df.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
