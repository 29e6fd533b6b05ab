"""Streaming front-end for the cross-run admission tier.

Wires an incremental admitter (:class:`...operators.dedup.
IncrementalDedup`, :class:`...operators.dedup.IncrementalLsh`,
:class:`...operators.similarity.IncrementalEmbeddingDedup`, or any
object with the same ``admit(batch, ..., run_id=)`` shape) through a
checkpointed ``foreachBatch`` stream — the same bounded-trigger shape
:mod:`..streaming.gold` uses for CDC merges (reference parity: the
reference's continuous ingestion loop is ADF trigger + Databricks job;
here the stream IS the loop).

Exactly-once story, end to end:

- the **checkpoint** guarantees each source file lands in exactly one
  epoch, and a crashed epoch is re-delivered with the SAME epoch id;
- the admitter's **run-tracked state** makes a replayed epoch return
  exactly the rows the crashed attempt admitted (state append happens
  once; the replay reads it back instead of re-appending);
- the **sink** writes each epoch to its own ``epoch=N`` partition with
  ``overwrite`` mode, so a replay rewrites an identical partition
  rather than appending duplicates.

The ``run_id`` handed to the admitter is namespaced by a hash of the
checkpoint location, not the bare epoch number: admitter state is
long-lived and may outlive any one checkpoint, and epoch ids restart at
0 for every new checkpoint — an un-namespaced ``epoch-0`` from a later
pipeline would alias the first pipeline's ``epoch-0`` state rows and be
mis-read as a crash replay (re-admitting duplicates and overwriting the
earlier run's output partition).

A plain ``append`` sink plus a merely state-idempotent admitter is NOT
exactly-once: a crash after the state append but before the sink commit
would mark documents as seen while never delivering them (the replay
admits zero rows). The run-tracked re-admission closes exactly that
window.

At 100 TB this is the shape that matters: per-epoch work is
O(batch × log state) — the admitters join against parquet state on
8-byte keys / banded signatures — and the output is a partitioned
parquet corpus any downstream reader consumes with partition pruning
on ``epoch``.
"""

from __future__ import annotations

import hashlib
import inspect
import os

from pyspark.sql import DataFrame

_UNSET = object()


def run_admission_stream(
    source: DataFrame,
    admitter,
    output_dir: str,
    checkpoint: str,
    text_col=_UNSET,
    id_col=_UNSET,
    labels_index=None,
):
    """Bounded (``availableNow``) checkpointed admission run.

    ``source``: a streaming DataFrame of documents. Each micro-batch is
    passed to ``admitter.admit(...)`` with
    ``run_id=f"{checkpoint_hash}-epoch-{id}"`` and the admitted slice
    lands in ``{output_dir}/epoch={id}/`` via idempotent overwrite.
    Returns the finished query.

    ``text_col``/``id_col`` forward to ``admit`` only when given;
    passing one the admitter's ``admit`` does not accept raises (the
    embedding admitter, for example, fixes its id column at
    construction — silently dropping an explicit override would run the
    stream against the wrong column with no pointer to the cause).

    ``labels_index``: an optional :class:`...operators.cluster_index.
    NearDupLabels` — each epoch's ADMITTED survivors are appended to it
    under the same namespaced run_id, so streaming ingest maintains the
    very cluster-label artifact batch curation reads (leakage-safe
    splits, dup-rate dashboards) instead of leaving admitted docs
    unlabeled. Exactly-once composes: the admitter's run-tracked state
    makes a replayed epoch admit identical rows, the sink overwrite is
    idempotent, and ``NearDupLabels.append`` is itself replay-safe for
    a crashed or committed run_id — whichever of the three steps the
    crash interrupts, the re-delivered epoch converges.
    """
    admit_params = set(inspect.signature(admitter.admit).parameters)
    if "run_id" not in admit_params:
        raise TypeError(
            f"{type(admitter).__name__}.admit lacks run_id support — "
            "exactly-once epoch replay requires run-tracked admission"
        )
    extra = {}
    for name, val in (("text_col", text_col), ("id_col", id_col)):
        if val is _UNSET:
            continue
        if name not in admit_params:
            raise TypeError(
                f"{type(admitter).__name__}.admit does not accept "
                f"{name!r} — configure it on the admitter instead"
            )
        extra[name] = val
    ns = hashlib.md5(os.path.abspath(checkpoint).encode()).hexdigest()[:12]

    def handle(batch: DataFrame, epoch_id: int) -> None:
        run_id = f"{ns}-epoch-{epoch_id}"
        admitted = admitter.admit(batch, run_id=run_id, **extra)
        epoch_path = os.path.join(output_dir, f"epoch={epoch_id}")
        admitted.write.mode("overwrite").parquet(epoch_path)
        if labels_index is not None:
            # label the epoch's survivors from their landed parquet (one
            # deterministic snapshot — re-running the admit lineage here
            # could double-execute non-idempotent admitter state reads)
            spark = batch.sparkSession
            labels_index.append(spark.read.parquet(epoch_path), run_id=run_id)

    q = (
        source.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_admitted(spark, output_dir: str) -> DataFrame:
    """The admitted corpus across all epochs (partition column dropped)."""
    return spark.read.parquet(output_dir).drop("epoch")
