"""Crash-safe run-partition compaction for the persisted artifacts.

Every admitting artifact (NearDupLabels, SemanticDedupIndex,
SubstringDupIndex; IvfIndex appends files rather than partitions)
accretes one ``run=<id>`` partition directory per admitted run. At
streaming cadence that is thousands of directories per bucket, and the
file-listing cost of every probe grows without bound — the operational
gap a real user of these artifacts hits first. ``compact()`` folds the
committed run partitions into ONE consolidated ``run=<tag>`` partition
per bucket while preserving the artifacts' exactly-once replay and
retraction semantics.

Commit protocol (shared by the three run-partitioned artifacts; each
step idempotent, so a crashed ``compact`` retried with the SAME tag
converges from any intermediate state):

1. (artifact-specific) write the per-run admitted-id REGISTRY for the
   folded runs — the information replay needs once the row-level run
   attribution is gone. Idempotent dynamic overwrite keyed by run.
2. write the consolidated rows under ``run=<tag>`` (dynamic overwrite
   of exactly the tag's partitions). Readers IGNORE rows under an
   uncommitted compact tag, so a crash here leaves every read exact.
3. write the marker ``compactions/<tag>/`` (parquet rows naming the
   folded runs; the ``_SUCCESS`` footer Spark commits last is the
   atomic commit point). From this instant readers use the tag rows
   and EXCLUDE the folded runs' rows.
4. delete the folded ``run=`` directories (idempotent rmtree) and any
   superseded markers. Readers never needed this step for correctness
   — it is what reclaims the file listings.

Reader contract: every artifact read of a run-partitioned table goes
through :meth:`CompactionLog.live_run_filter`, which keeps a row iff
its run is (a) not folded by any committed compaction and (b) not an
UNCOMMITTED compact tag. Both double-reads (crash between 3 and 4)
and phantom reads (crash between 2 and 3) are thereby impossible.

Replay of a folded run: the artifact's ``admit``/``append`` consults
:meth:`CompactionLog.folded_originals` first and answers from the
registry — the same admitted rows the original attempt returned, with
no state mutation (the rows are already in the consolidated
partition). This preserves the exactly-once contract for the common
crash window (epoch admitted and sunk, checkpoint not yet committed,
artifact compacted before the stream restarts).

Single-writer contract (the same one every artifact method already
assumes): do not run ``compact`` concurrently with admissions or
removals on the same artifact. Compact between streaming runs — a
run that crashed MID-WRITE and was never redelivered before
compaction has only partial rows stored, and folding freezes that
partial state into the registry; quiesce first.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from dataeng_azure_spotify_spark.statefs import statefs_for

#: Reserved namespace for consolidated-partition tags. Admission
#: validators refuse run_ids with this prefix so a compact tag can
#: never collide with a live run.
COMPACT_PREFIX = "compact-"

#: artifact subdirectory holding one marker dir per committed compaction
COMPACTIONS = "compactions"


def is_compact_tag(run: str) -> bool:
    return str(run).startswith(COMPACT_PREFIX)


def validate_compact_tag(tag: str, where: str) -> None:
    """Tags name partition directories (the run_id charset rule) and
    must live in the reserved namespace so admission validators can
    keep live runs out of it."""
    if not re.fullmatch(r"[A-Za-z0-9._-]+", tag or "") or not is_compact_tag(
        tag
    ):
        raise ValueError(
            f"{where}: compaction tag must be [A-Za-z0-9._-]+ and start "
            f"with {COMPACT_PREFIX!r} (it names a partition directory "
            f"and must never collide with a live run_id); got {tag!r}"
        )


def reject_compact_namespace(run_id: str, where: str) -> None:
    """Admission-side guard: live run_ids must stay out of the compact
    namespace, or a later ``compact(tag)`` could fold them into a
    partition a replay would misattribute."""
    if is_compact_tag(run_id):
        raise ValueError(
            f"{where}: run_id {run_id!r} uses the reserved "
            f"{COMPACT_PREFIX!r} namespace (compaction tags); pick "
            "another id"
        )


class CompactionLog:
    """The committed-compaction ledger of one artifact: marker dirs
    under ``<artifact>/compactions/<tag>/`` whose parquet rows name the
    folded runs; a marker is committed iff its ``_SUCCESS`` footer
    exists (Spark writes it last)."""

    def __init__(self, spark: SparkSession, artifact_path: str) -> None:
        self.spark = spark
        self.path = os.path.join(artifact_path, COMPACTIONS)
        # control-plane IO goes through StateFS (r11): local paths stay
        # pure-POSIX; scheme'd paths (abfss://, s3a://, file://) reach
        # the session JVM's Hadoop FileSystem
        self.fs = statefs_for(artifact_path, spark)

    # -- reads ----------------------------------------------------------
    def committed(self) -> dict[str, list[str]]:
        """{tag: [folded runs]} for every committed marker.

        Markers are tiny (O(folded runs) strings) and immutable once
        their ``_SUCCESS`` exists, so they are read DRIVER-SIDE with
        pyarrow — zero Spark jobs. This runs on EVERY artifact read
        (``live_run_filter``), and the per-tag ``spark.read`` it
        replaced cost one Spark job per committed compaction per read:
        at streaming cadence with auto-compaction that grew probe
        latency linearly in fold count (measured r10,
        docs/BENCH_NOTES.md). Marker bytes come through StateFS, so
        object-store state dirs read the same way (one metadata fetch
        per marker file, still zero Spark jobs)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not self.fs.isdir(self.path):
            return {}
        out: dict[str, list[str]] = {}
        for tag in self.fs.listdir(self.path):
            d = os.path.join(self.path, tag)
            if not self.fs.isdir(d) or not self.fs.exists(
                os.path.join(d, "_SUCCESS")
            ):
                continue  # uncommitted (crashed) marker — ignored
            folded: list[str] = []
            for fn in self.fs.listdir(d):
                if not fn.endswith(".parquet") or fn.startswith("."):
                    continue
                buf = pa.BufferReader(
                    self.fs.read_bytes(os.path.join(d, fn))
                )
                col = pq.read_table(buf, columns=["folded_run"]).column(
                    "folded_run"
                )
                folded.extend(str(v) for v in col.to_pylist())
            out[tag] = folded
        return out

    def folded(self) -> set[str]:
        """Every run (original or superseded tag) folded by a committed
        compaction — rows under these must be ignored by all readers."""
        return {r for fl in self.committed().values() for r in fl}

    def folded_originals(self) -> set[str]:
        """Folded ORIGINAL run_ids (compact tags excluded) — the set
        whose replays must be answered from the registry."""
        return {r for r in self.folded() if not is_compact_tag(r)}

    def live_run_filter(self, run_col: str = "run") -> Column:
        """Keep-condition for run-partitioned artifact reads: drop rows
        folded by a committed compaction, and rows under an uncommitted
        compact tag (a crashed step-2 write). Plain ``isin`` over O(runs)
        literals — evaluated at the scan, partition-prunable."""
        committed = self.committed()
        folded = {r for fl in committed.values() for r in fl}
        c = F.col(run_col)
        keep = ~c.isin(sorted(folded)) if folded else F.lit(True)
        tags = sorted(committed)
        in_namespace = c.startswith(COMPACT_PREFIX)
        committed_tag = c.isin(tags) if tags else F.lit(False)
        return keep & (~in_namespace | committed_tag)

    # -- writes ---------------------------------------------------------
    def commit(self, tag: str, folded_runs: list[str]) -> None:
        """Write the marker (the atomic commit point — step 3)."""
        (
            self.spark.createDataFrame(
                [(r,) for r in sorted(folded_runs)], "folded_run string"
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(self.path, tag))
        )

    def drop_marker(self, tag: str) -> None:
        self.fs.rmtree(os.path.join(self.path, tag))


def delete_folded_partitions(
    table_path: str, folded: set[str], nested: bool
) -> int:
    """Step 4: remove the folded ``run=`` directories. ``nested`` means
    the run level sits under a first-level partition
    (``bucket=*/run=*`` / ``cid=*/run=*``); otherwise ``run=*`` is
    top-level. Idempotent; returns directories removed."""
    fs = statefs_for(table_path)
    if not fs.isdir(table_path) or not folded:
        return 0
    removed = 0
    parents = (
        [
            os.path.join(table_path, d)
            for d in fs.listdir(table_path)
            if "=" in d and fs.isdir(os.path.join(table_path, d))
        ]
        if nested
        else [table_path]
    )
    for parent in parents:
        for r in folded:
            d = os.path.join(parent, f"run={r}")
            if fs.isdir(d):
                fs.rmtree(d)
                removed += 1
    return removed


def count_run_partitions(table_path: str, nested: bool) -> int:
    """Observability for the before/after table: number of ``run=``
    directories currently on disk."""
    fs = statefs_for(table_path)
    if not fs.isdir(table_path):
        return 0
    parents = (
        [
            os.path.join(table_path, d)
            for d in fs.listdir(table_path)
            if "=" in d and fs.isdir(os.path.join(table_path, d))
        ]
        if nested
        else [table_path]
    )
    return sum(
        1
        for parent in parents
        for d in fs.listdir(parent)
        if d.startswith("run=") and fs.isdir(os.path.join(parent, d))
    )


def distinct_run_names(table_path: str, nested: bool) -> set[str]:
    """Distinct ``run=<name>`` partition names currently on disk (one
    listing pass; names, not per-bucket dir counts)."""
    fs = statefs_for(table_path)
    if not fs.isdir(table_path):
        return set()
    parents = (
        [
            os.path.join(table_path, d)
            for d in fs.listdir(table_path)
            if "=" in d and fs.isdir(os.path.join(table_path, d))
        ]
        if nested
        else [table_path]
    )
    return {
        d[len("run="):]
        for parent in parents
        for d in fs.listdir(parent)
        if d.startswith("run=") and fs.isdir(os.path.join(parent, d))
    }


def maybe_autocompact(artifact, run_id: str, max_live_runs) -> "dict | None":
    """Admission-commit compaction policy (r10): when the artifact's
    LIVE run-partition count (``artifact.live_run_count()``) exceeds
    ``max_live_runs``, fold it now under the DETERMINISTIC tag
    ``compact-auto-<run_id>`` — so at streaming cadence the per-probe
    file-listing cost stays bounded without anyone remembering to call
    ``compact()`` by hand.

    Crash-resumable by construction: a replayed epoch re-enters with
    the SAME run_id, its admit answers from run-tracked state/registry
    (no mutation), the live count is re-checked — if the crashed
    auto-fold committed, the count is back under the threshold and
    this is a no-op; if it crashed mid-protocol, the SAME tag is
    retried and ``compact``'s idempotent 4-step protocol resumes from
    wherever it stopped. The single-writer contract holds because the
    policy runs inside the admission commit path (sequential per
    stream), never concurrently with it; and a run that crashed
    MID-WRITE is repaired by its own replay BEFORE any later
    admission's policy can fold it (the policy only fires at the end
    of a successful admit).

    Returns ``compact()``'s summary dict when the fold fired, else
    None. ``max_live_runs=None`` disables the policy."""
    if max_live_runs is None:
        return None
    if int(max_live_runs) < 1:
        raise ValueError(
            f"maybe_autocompact: max_live_runs must be >= 1, got "
            f"{max_live_runs}"
        )
    if run_id is None:
        raise ValueError(
            "maybe_autocompact: run_id is required when max_live_runs "
            "is set — the auto-fold tag is derived from it so a crashed "
            "fold resumes under the replayed epoch's identical tag"
        )
    if artifact.live_run_count() <= int(max_live_runs):
        return None
    tag = f"{COMPACT_PREFIX}auto-{run_id}"
    validate_compact_tag(tag, "maybe_autocompact")
    # run_id-reuse guard: a LOW live count short-circuits the
    # crash-retry case above, so reaching a committed tag here means
    # new runs accreted since this run_id's fold committed — i.e. the
    # caller reused a run_id across epochs. Folding a NEW set under a
    # committed tag would orphan the tag's earlier folds from the
    # marker (their replays would silently take the wrong path).
    if tag in artifact._clog.committed():
        raise ValueError(
            f"maybe_autocompact: tag {tag!r} is already committed but "
            "the live-run count is above threshold again — run_id "
            f"{run_id!r} was reused across epochs; auto-compaction "
            "requires unique per-epoch run ids"
        )
    return artifact.compact(tag)
