"""Event-analytics operators: funnels, cohort retention, anomaly
detection, and time-series gap filling.

The reference's exploration notebooks stop at static star-schema SQL
(SURVEY.md §2.10); a production events pipeline on the same data always
grows these four shapes next, so they're part of the engine surface:

- ``funnel``: ordered multi-step conversion funnel (step N counts only
  users whose step-N event happened *after* their step-N-1 event).
- ``cohort_retention``: classic signup-cohort × period-offset retention
  matrix.
- ``daily_metric_anomalies``: per-group daily metric with a trailing
  z-score flag — the batch twin of a streaming alert rule
  (observability.py holds the monitoring analogue).
- ``gap_fill``: per-key daily resample with zero-fill for counts and
  forward-fill (last non-null) for values.

Scale notes (100 TB): every shape here is one-or-two shuffles on the
natural key. The funnel's per-step joins are all on the SAME user key,
so the exchange from the first per-user aggregation is reused by every
subsequent step join (no re-shuffle per step); reached-user sets shrink
monotonically, and AQE downgrades the later joins to broadcast once a
step's survivors fit. Cohort/gap-fill group by (key, day) — partial
aggregation makes the map side absorb the per-day fan-in before the
shuffle. Nothing collects to the driver; the date spine in ``gap_fill``
is generated per-key with ``sequence()`` (no driver-side calendar).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dec(col: Column | str, scale: int = 4) -> Column:
    """Exact decimal accumulator cast — makes SUMs order-independent so
    results hash-match a single-threaded oracle (see STAR_AGG_SQL note in
    __spark_entry__.py)."""
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(
        f"decimal(18,{scale})"
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel over an event log.

    A user counts for step ``i`` iff they performed ``steps[i]`` strictly
    AFTER their (earliest qualifying) ``steps[i-1]`` event; the reported
    per-user time for step ``i`` is the EARLIEST such qualifying event.
    Returns one row per step: ``(step, step_idx, n_users)``.

    Each step is: filter events to that type, join to the survivors of
    the previous step (equi-join on ``user_col``), keep events after the
    previous step's time, and take the per-user minimum. All joins share
    the user-key partitioning, and the survivor set only shrinks.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    # NULL timestamps are unordered and dropped up front — keeping them
    # would make the join variant count a step-1 user whose only event
    # has no time while the one-pass fold (and any sane reading) skips it
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("et"),
    ).filter(F.col(ts_col).isNotNull())
    reached = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("step_t"))
    )
    counts = [reached.select(F.count(F.lit(1)).cast("long").alias("n_users"),
                             F.lit(steps[0]).alias("step"),
                             F.lit(1).alias("step_idx"))]
    for i, step in enumerate(steps[1:], start=2):
        reached = (
            ev.filter(F.col("et") == step)
            .join(reached, on="u")
            .filter(F.col("t") > F.col("step_t"))
            .groupBy("u")
            .agg(F.min("t").alias("step_t"))
        )
        counts.append(
            reached.select(F.count(F.lit(1)).cast("long").alias("n_users"),
                           F.lit(step).alias("step"),
                           F.lit(i).alias("step_idx"))
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.select("step", F.col("step_idx").cast("int"), "n_users")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix.

    Cohort = Monday of the week of each user's first event; for every
    (cohort, week-offset) cell, the number of distinct cohort users
    active in that week. Returns
    ``(cohort_week date, week_offset int, n_users long)``.

    Two shuffles: per-user MIN (cohort assignment) and the final
    (cohort, offset) distinct-count; the cohort join back onto activity
    is on the user key. ``date_trunc('week', …)`` is Monday-start in
    both Spark and ISO SQL engines.
    """
    # NULL-ts contract (whole event-analytics family): rows without an
    # event time carry no cohort/week information — dropped explicitly,
    # and every oracle twin states the same WHERE ts IS NOT NULL.
    ev = events.select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("t")
    ).filter(F.col("t").isNotNull())
    cohorts = ev.groupBy("u").agg(
        F.date_trunc("week", F.min("t")).cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "u", F.date_trunc("week", F.col("t")).cast("date").alias("active_week")
    ).distinct()
    return (
        activity.join(cohorts, on="u")
        .select(
            "u",
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("u").alias("n_users"))
    )


def daily_totals(
    events: DataFrame,
    metric_col: str = "value",
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact per-(group, day) decimal metric totals —
    ``(grp, day, day_total decimal(18,4))``. Decimal sums are
    order-independent AND re-aggregable: partial day totals from
    separate batches sum to the same value as one pass over the union,
    which is what lets the streaming monitor keep per-epoch partials.
    """
    return (
        events.select(
            F.col(group_col).alias("grp"),
            F.col(ts_col).cast("date").alias("day"),
            _dec(metric_col).alias("v"),
        )
        # NULL-ts contract: no event time → no day bucket (oracle twins
        # state the same WHERE ts IS NOT NULL)
        .filter(F.col("day").isNotNull())
        .groupBy("grp", "day")
        # Narrow the SUM back to (18,4): (18,4)×(18,4) → (37,8) fits the
        # 38-digit decimal cap EXACTLY in every engine, so the windowed
        # Σx² below stays order-independent (a (28,4) square would force
        # lossy precision reduction in Spark and overflow in DuckDB).
        .agg(F.sum("v").cast("decimal(18,4)").alias("day_total"))
    )


def zscores_from_daily(
    daily: DataFrame,
    trailing_days: int = 7,
    z_thresh: float = 2.0,
) -> DataFrame:
    """Trailing z-score stage over ``(grp, day, day_total)`` rows (the
    output of :func:`daily_totals`, or re-aggregated partials of it)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(-trailing_days, -1)
    )
    stats = daily.select(
        "grp",
        "day",
        "day_total",
        F.count("day_total").over(w).alias("n_prev"),
        F.sum("day_total").over(w).alias("s1"),
        F.sum(F.col("day_total") * F.col("day_total")).over(w).alias("s2"),
    )
    n = F.col("n_prev").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mean = s1 / n
    var = (s2 - (s1 * s1) / n) / (n - F.lit(1.0))
    std = F.sqrt(var)
    x = F.col("day_total").cast("double")
    z = (x - mean) / std
    usable = (F.col("n_prev") >= 2) & (var > 0)
    return stats.select(
        "grp",
        "day",
        x.alias("day_total"),
        F.when(usable, z).alias("z_score"),
        F.when(usable, F.abs(z) > F.lit(z_thresh)).otherwise(F.lit(False)).alias(
            "is_anomaly"
        ),
    )


def daily_metric_anomalies(
    events: DataFrame,
    metric_col: str = "value",
    group_col: str = "event_type",
    ts_col: str = "ts",
    trailing_days: int = 7,
    z_thresh: float = 2.0,
) -> DataFrame:
    """Per-group daily metric totals with a trailing z-score anomaly flag.

    For each (group, day): the day's metric total, the mean/stddev of the
    previous ``trailing_days`` observed day-totals, and
    ``is_anomaly = |z| > z_thresh``. Days with fewer than 2 trailing
    observations (or zero variance) get a NULL z and ``false`` flag.

    Cross-engine determinism: the day totals and the trailing window's
    Σx / Σx² accumulate in DECIMAL (exact, order-independent); the
    mean/variance/z arithmetic then runs in DOUBLE with one fixed
    formula, so identical exact inputs give bit-identical IEEE results
    in any engine — no rounding slop in the comparison.
    ``streaming.anomaly.AnomalyMonitor`` is the incremental twin: it
    re-aggregates per-epoch partials of :func:`daily_totals` and runs
    the same :func:`zscores_from_daily` stage.
    """
    return zscores_from_daily(
        daily_totals(events, metric_col, group_col, ts_col),
        trailing_days=trailing_days,
        z_thresh=z_thresh,
    )


def gap_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    metric_col: str = "value",
) -> DataFrame:
    """Daily resample per key: zero-fill missing days' counts and
    forward-fill the last observed daily TOTAL (exact decimal sum — a
    mean would need a decimal division whose engine-specific rounding
    breaks oracle parity; divide day_value by n_events downstream if a
    mean is wanted).

    Builds each key's date spine with ``sequence(min_day, max_day)``
    (generated executor-side per key — no driver calendar), left-joins
    the observed daily aggregates, then ``last(..., ignorenulls=True)``
    over an ordered window carries values across gaps. Returns
    ``(key, day, n_events long, value_filled double)``.
    """
    from pyspark.sql import Window

    ev = events.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).cast("date").alias("day"),
        _dec(metric_col).alias("v"),
    ).filter(F.col("day").isNotNull())  # family NULL-ts contract
    daily = ev.groupBy("k", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        # daily TOTAL, not mean: the decimal sum is exact and casts to
        # double losslessly at these magnitudes, while a mean's decimal
        # division rounds on engine-specific scales (half-up vs
        # half-even at the .00005 boundary would break the oracle hash)
        F.sum("v").cast("double").alias("day_value"),
    )
    spine = (
        ev.groupBy("k")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("k", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    w = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, on=["k", "day"], how="left")
        .select(
            "k",
            "day",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.last("day_value", ignorenulls=True).over(w).alias("value_filled"),
        )
    )


def funnel_one_pass(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Single-pass funnel — same semantics and output as :func:`funnel`,
    different physical plan.

    :func:`funnel` re-joins the event log once per step (k scans, k
    shuffles — fine when the optimizer can prune each step's filter,
    costly when the fact is 100 TB). This variant computes every
    user's stage times in ONE pass: filter to step-typed events, one
    groupBy(user) building the time-sorted event array, then a
    ``F.aggregate`` fold whose state is a k-field struct of earliest
    qualifying stage timestamps (stage i fills at the first event of
    type steps[i] strictly after stage i-1's time; within one event the
    fold reads the PRE-event state, so an event can't cascade two
    stages). Per-user memory is O(events-of-step-types per user), and
    the plan is 1 scan + 1 user-key exchange + a scalar aggregate.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_one_pass requires distinct step names")
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("et"),
    ).filter(F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull())
    per_user = ev.groupBy("u").agg(
        F.sort_array(F.collect_list(F.struct("t", "et"))).alias("evs")
    )
    k = len(steps)
    init = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"s{i}") for i in range(k)]
    )

    def update(acc, x):
        fields = []
        for i, step in enumerate(steps):
            cur = acc[f"s{i}"]
            if i == 0:
                fill = F.when(x["et"] == step, x["t"])
            else:
                prev = acc[f"s{i-1}"]
                fill = F.when(
                    (x["et"] == step) & prev.isNotNull() & (x["t"] > prev),
                    x["t"],
                )
            fields.append(F.coalesce(cur, fill).alias(f"s{i}"))
        return F.struct(*fields)

    stages = per_user.select(F.aggregate("evs", init, update).alias("st"))
    counts = stages.agg(
        *[
            F.count(F.col("st")[f"s{i}"]).cast("long").alias(f"n{i}")
            for i in range(k)
        ]
    )
    return counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(step).alias("step"),
                        F.lit(i + 1).cast("int").alias("step_idx"),
                        F.col(f"n{i}").alias("n_users"),
                    )
                    for i, step in enumerate(steps)
                ]
            )
        ).alias("r")
    ).select("r.*")
