"""As-of (point-in-time) join — the canonical consumer of SCD2 history:
"which version/value was in effect when this event happened?".

Spark has no ASOF JOIN operator (DuckDB/Pandas do); the naive
formulation — range join + latest-per-pair — explodes quadratically per
key. This implementation is the sort-merge formulation as pure DataFrame
algebra:

    union(left, right) tagged by side
      → one shuffle on the key, one per-key sort by (time, side, seq)
      → ``last(right_payload, ignoreNulls)`` over the running window
      → keep left rows, unpack the carried payload

Cost is one shuffle + sort of |L|+|R| — the same shape Spark plans for a
sort-merge join — and it never materializes candidate pairs. Inclusive
semantics: a right row at exactly ``left_time`` matches (right sorts
before left on the tie). With multiple right rows at one instant the
latest by ``right_seq`` tiebreaker wins — a total order keeps the result
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE, _T, _PAYLOAD = "__side", "__t", "__rv"
_BIN = "__bin"
_RID = "__rid"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    right_seq_tiebreakers: list[str] | None = None,
) -> DataFrame:
    """LEFT as-of join: every left row + the payload of the latest right
    row with ``right_time <= left_time`` for the same key (NULLs when no
    prior right row exists). Payload columns keep their names; clashes
    with left columns are rejected (alias them on the right first).
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in set(on) | {right_time}
    ]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns clash with left side: {sorted(clash)}")

    tb = right_seq_tiebreakers or []
    # A NULL right_time sorts NULLS FIRST (= "earliest ever") and its
    # payload would carry to every left row; as-of semantics say a NULL
    # time matches nothing. Left rows with NULL left_time then sort at
    # the partition head and naturally get a NULL payload.
    right = right.filter(F.col(right_time).isNotNull())
    r = right.select(
        *on,
        F.col(right_time).alias(_T),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
        *[F.col(c).alias(f"__tb_{c}") for c in tb],
    )
    l = left.select(
        "*",
        F.col(left_time).alias(_T),
        F.lit(1).alias(_SIDE),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(_T).asc(), F.col(_SIDE).asc()] + [
        F.col(f"__tb_{c}").asc_nulls_first() for c in tb
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__last", F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = carried.filter(F.col(_SIDE) == 1)
    for c in payload_cols:
        out = out.withColumn(c, F.col(f"__last.{c}"))
    drop = [_T, _SIDE, _PAYLOAD, "__last"] + [f"__tb_{c}" for c in tb]
    return out.drop(*drop)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_start: str,
    right_end: str,
    bin_seconds: int = 3600,
    how: str = "inner",
    left_id_col: str | None = None,
) -> DataFrame:
    """Interval containment join: left rows × right intervals with
    ``right_start <= left_time < right_end`` (NULL ``right_end`` = open).

    A raw range predicate gives Catalyst nothing to hash on — the plan
    degrades to a per-key cross product. The classic fix is binning:
    quantize time into ``bin_seconds`` buckets, explode each right
    interval into the bins it overlaps, equi-join on (key, bin), then
    re-check the exact predicate. Shuffle is by (key, bin) — skew-free
    as long as intervals are not grossly longer than ``bin_seconds``
    (each interval lands in ~len/bin bins; pick the bin near the median
    interval length).

    Open-ended intervals can't explode into bins; they're joined by key
    in a separate branch and unioned — at scale the open set is the
    "current versions" slice, far smaller than history.

    ``left_id_col``: for ``how="left"``, a column of ``left`` that is
    already unique per row (a primary key). The unmatched-row recovery
    anti-joins on it directly — no generated id, no localCheckpoint, so
    the left side keeps its full lineage (recomputable after executor
    loss; nothing is pinned to non-replicated local storage). Without
    it the operator falls back to ``monotonically_increasing_id`` + a
    lazy localCheckpoint to make the generated id stable across the two
    branch references — correct, but it materializes the whole left
    side, which a fact-sized left at cluster scale should not pay.
    Two caller contracts come with the fast path: (a) ids are unique
    and non-null — a duplicated (or repeated-NULL: the anti-join is
    null-SAFE, so NULL behaves like any other value) id makes every
    copy of the row count as matched when any one copy matches; (b)
    ``left`` is deterministic under re-evaluation — the matched branch
    and the anti-join branch each recompute it (a sampled / shuffle-
    order-dependent left can emit or drop rows inconsistently; that is
    exactly what the checkpointed fallback pins against).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type {how!r}")
    lt, rs, re_ = F.col(left_time), F.col(right_start), F.col(right_end)
    # The left branch recovers unmatched rows by anti-joining on a
    # generated row id rather than on all left columns: column-equality
    # anti joins are null-UNSAFE (a matched left row with any NULL column
    # would fail its own equality and re-emit as unmatched) and collapse
    # duplicate left rows. The id is assigned before matching so both
    # branches share one lineage.
    rid = left_id_col or _RID
    if how == "left" and left_id_col is None:
        # the matched branch and the anti-join branch BOTH consume the
        # id-stamped left; monotonically_increasing_id is only stable
        # across the two references if the subtree evaluates once — a
        # lazy localCheckpoint pins the assignment (materializes at
        # first action; only the outer variant pays it). A caller-
        # supplied left_id_col avoids all of this (see docstring).
        left = left.withColumn(
            _RID, F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
    elif how == "left":
        if left_id_col not in left.columns:
            raise ValueError(f"left_id_col {left_id_col!r} is not a left column")
        if left_id_col in right.columns:
            # the inner match keeps both sides' columns; a shared name
            # would make the recovery select ambiguous — fail at the API
            raise ValueError(
                f"left_id_col {left_id_col!r} also exists on the right "
                "side — alias one of them first"
            )
    # _wall_seconds, not unix_timestamp: NTZ inputs must not route
    # through the session zone (DST shifts are value-dependent — the
    # interval_join rationale below applies identically here)
    l_binned = left.withColumn(
        _BIN,
        F.floor(_wall_seconds(left, left_time) / bin_seconds).cast("long"),
    )

    closed = right.filter(re_.isNotNull())
    # end bin WITHOUT the -1: unix seconds truncate sub-second ends, so
    # "end-1" under-covers the final second of an interval like
    # [10:00, 11:00:00.5) and drops true matches. The un-shifted floor
    # is a superset; the exact lt < re filter below re-checks.
    bins = F.sequence(
        F.floor(_wall_seconds(right, right_start) / bin_seconds).cast("long"),
        F.floor(_wall_seconds(right, right_end) / bin_seconds).cast("long"),
    )
    r_binned = closed.withColumn(_BIN, F.explode(bins))
    matched_closed = l_binned.join(r_binned, on + [_BIN], "inner").filter(
        (rs <= lt) & (lt < re_)
    ).drop(_BIN)

    open_ended = right.filter(re_.isNull())
    matched_open = (
        l_binned.drop(_BIN).join(open_ended, on, "inner").filter(rs <= lt)
    )
    matched = matched_closed.unionByName(matched_open)
    if how == "inner":
        return matched
    right_only = [c for c in matched.columns if c not in left.columns]
    # null-SAFE anti equality: a NULL id must count as "matched" like any
    # other value — plain equality evaluates NULL and would re-emit an
    # already-matched NULL-id row as unmatched (a silent duplicate). The
    # matched ids are renamed so the anti-join condition never references
    # the same attribute from both lineages of this self-join.
    mids = matched.select(F.col(rid).alias("__mid")).distinct()
    unmatched = left.join(
        mids, F.col(rid).eqNullSafe(F.col("__mid")), "left_anti"
    )
    for c in right_only:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(matched.schema[c].dataType))
    out = matched.unionByName(unmatched)
    return out if left_id_col else out.drop(_RID)


def _wall_seconds(df: DataFrame, c: str):
    """Monotone seconds-since-epoch for binning, per timestamp type.

    TIMESTAMP → ``unix_seconds`` (instant-based, exact). TIMESTAMP_NTZ →
    wall-clock seconds from tz-free field extraction: casting NTZ to
    TIMESTAMP would route through the session zone, whose DST shift is
    VALUE-dependent (two NTZ values straddling a spring-forward gap move
    by different amounts, corrupting window membership near the
    transition)."""
    t = dict(df.dtypes)[c]
    col = F.col(c)
    if t == "timestamp":
        return F.unix_seconds(col)
    if t == "timestamp_ntz":
        return (
            F.unix_date(F.to_date(col)).cast("long") * 86400
            + F.hour(col).cast("long") * 3600
            + F.minute(col).cast("long") * 60
            + F.second(col).cast("long")
        )
    raise TypeError(f"{c!r} must be TIMESTAMP or TIMESTAMP_NTZ, got {t}")


def wall_micros(df: DataFrame, c: str):
    """Microseconds-since-epoch in the column's OWN semantics: instant
    micros for TIMESTAMP, wall-clock micros for TIMESTAMP_NTZ (tz-free
    fields + the ``SSSSSS`` fraction — never a session-zone cast, which
    is DST-unsafe; see :func:`_wall_seconds`). Differences of two values
    of the same type are therefore exact and engine-portable (DuckDB's
    ``epoch_us`` on its NTZ-like TIMESTAMP agrees)."""
    t = dict(df.dtypes)[c]
    if t == "timestamp":
        return F.unix_micros(F.col(c))
    return _wall_seconds(df, c) * F.lit(1_000_000) + F.date_format(
        F.col(c), "SSSSSS"
    ).cast("long")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """Event-to-event interval join: pairs sharing the ``on`` keys with
    ``right_ts ∈ (left_ts + lower_seconds, left_ts + upper_seconds]`` —
    the attribution shape (view→click within 10 minutes), and the batch
    twin of Spark's stream-stream time-interval join (where the same
    range predicate rides the state store + watermarks instead; parity
    pinned in tests/test_streaming.py).

    Like :func:`range_join`, a raw range predicate would plan as a
    per-key cross product, so the window is binned: bin width = window
    length, each LEFT row explodes into the bins its (±1-padded) window
    overlaps, the join is an equi-join on (keys, bin), and the exact
    predicate is re-checked with NATIVE timestamp comparisons (interval
    arithmetic in the columns' own type — wall-clock for NTZ,
    instant-based for TIMESTAMP — never a cross-type cast, so DST
    transitions in the session zone cannot flip membership). Shuffle is
    by (key, bin); per-key skew is bounded by the window length.

    ``left_ts``/``right_ts`` must be distinct column names (both survive
    into the output row); both sides must share one timestamp type.
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    lo_s = _wall_seconds(left, left_ts) + F.lit(int(lower_seconds))
    hi_s = _wall_seconds(left, left_ts) + F.lit(int(upper_seconds))
    r_s = _wall_seconds(right, right_ts)
    bin_s = max(upper_seconds - lower_seconds, 1)
    # ±1-bin padding: the bin key is second-truncated, the exact check
    # below is not — padding keeps the bin cover a strict superset.
    l = left.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                (F.floor(lo_s / bin_s) - 1).cast("long"),
                (F.floor(hi_s / bin_s) + 1).cast("long"),
            )
        ),
    )
    r = right.withColumn(_BIN, F.floor(r_s / bin_s).cast("long"))
    lower_iv = F.make_dt_interval(secs=F.lit(int(lower_seconds)))
    upper_iv = F.make_dt_interval(secs=F.lit(int(upper_seconds)))
    return (
        l.join(r, on + [_BIN], "inner")
        .filter(
            (F.col(right_ts) > F.col(left_ts) + lower_iv)
            & (F.col(right_ts) <= F.col(left_ts) + upper_iv)
        )
        .drop(_BIN)
    )
