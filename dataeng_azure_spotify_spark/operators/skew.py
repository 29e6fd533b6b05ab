"""Skew mitigation for shuffle joins and aggregations (100 TB design;
task brief: "skewed keys hurt ... salting for skew, AQE for runtime
re-plan").

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on by default
in ``session.get_spark``) handles most cases at runtime; explicit salting
remains the tool when (a) the skewed side feeds an *aggregation* (AQE
does not split skewed aggregation partitions), or (b) the join is
sort-merge with one pathological key that AQE's split factor can't tame.

Both operators are pure DataFrame algebra and deterministic: the salt is
a hash of stable row attributes, not a random number, so retries and
replays produce identical partitioning (a requirement under streaming
exactly-once replay).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _salt_of(cols: list[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from non-key attributes."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast("int")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed large side against a smaller side with salting.

    The skewed side's hot keys are spread across ``salt_buckets`` shuffle
    partitions by salting the join key; the other side replicates each row
    ``salt_buckets`` times (explode) so every salted partition finds its
    match. Semantics equal the plain join; the shuffle no longer has a
    single partition holding an entire hot key.

    Use when the "small" side is too big to broadcast but far smaller
    than the skewed side (replication factor = ``salt_buckets``).

    Only ``inner``/``left``/``left_semi`` preserve plain-join semantics:
    the replicated right side would emit each unmatched right row once
    per salt bucket under ``right``/``full``/``left_anti``-from-the-right
    shapes, so those are rejected outright.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi only, got {how!r} "
            "(the salted right side replicates rows, breaking right/full/anti)"
        )
    non_key = [c for c in skewed.columns if c not in keys]
    if not non_key:
        # hashing the key columns would give every row of a hot key the
        # SAME salt — the full skew plus an extra shuffle, silently.
        # Surface it instead: a keys-only frame has nothing to spread on.
        raise ValueError(
            "salted_join: the skewed side has no non-key columns to "
            "derive a salt from — add a distinguishing column (or use "
            "the plain join; salting a keys-only frame cannot spread a "
            "hot key)"
        )
    left = skewed.withColumn(SALT_COL, _salt_of(non_key, salt_buckets))
    right = small.withColumn(
        SALT_COL,
        F.explode(F.array([F.lit(i).cast("int") for i in range(salt_buckets)])),
    )
    return left.join(right, keys + [SALT_COL], how).drop(SALT_COL)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    partial_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 groups by (keys, salt) — the hot key's rows split across
    ``salt_buckets`` reducers; stage 2 merges the partials per key. The
    caller supplies both stages because the merge of an aggregate is
    aggregate-specific (``count``→``sum``, ``sum``→``sum``, ``max``→``max``
    ...). Spark's own partial aggregation gives the same effect for
    algebraic aggregates; this operator is for when the planner can't —
    e.g. ``collect_list``/exact-distinct pipelines over a hot key.
    """
    non_key = [c for c in df.columns if c not in keys]
    if not non_key:
        raise ValueError(
            "salted_aggregate: no non-key columns to derive a salt from "
            "— a keys-only frame would put the whole hot key in one "
            "salt bucket (see salted_join)"
        )
    salted = df.withColumn(SALT_COL, _salt_of(non_key, salt_buckets))
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*aggs)
