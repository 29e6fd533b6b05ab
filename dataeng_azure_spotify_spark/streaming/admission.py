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


def _admit_accepts_run_id(admitter) -> bool:
    fn = getattr(admitter, "admit", None)
    if not callable(fn):
        return False
    return "run_id" in inspect.signature(fn).parameters


def _state_paths(admitter) -> "list[str]":
    """Best-effort persistent-state paths of an admitter, for the
    shared-state refusal: ``state_dir`` on the incremental admitters,
    plus the wrapped index's ``path``/``state_dir`` when present
    (following :class:`BoundAdmitter`'s ``inner``). Stateless gates
    (blocklist/NB/DSIR) report none."""
    paths = set()
    seen = set()
    frontier = [admitter]
    while frontier:
        owner = frontier.pop()
        if owner is None or id(owner) in seen:
            continue
        seen.add(id(owner))
        for attr in ("state_dir", "path"):
            p = getattr(owner, attr, None)
            if isinstance(p, str) and p:
                paths.add(os.path.abspath(p))
        frontier.extend(
            getattr(owner, a, None) for a in ("index", "inner", "_inc")
        )
    return sorted(paths)


class BoundAdmitter:
    """Adapter fixing an admitter's call-time column kwargs at
    construction, so gates whose ``admit`` takes ``text_col``/
    ``id_col`` per call (:class:`...operators.dedup.IncrementalDedup`,
    :class:`...operators.dedup.IncrementalLsh`) satisfy the uniform
    ``admit(batch, run_id=)`` shape a :class:`ChainedAdmitter` calls.
    Kwargs are validated against the inner ``admit`` signature up
    front — a typo'd column name must fail at construction, not run
    the stream against the wrong column."""

    def __init__(self, inner, **kwargs) -> None:
        params = set(inspect.signature(inner.admit).parameters)
        bad = sorted(set(kwargs) - params)
        if bad:
            raise TypeError(
                f"BoundAdmitter: {type(inner).__name__}.admit does not "
                f"accept {bad}"
            )
        if "run_id" not in params:
            raise TypeError(
                f"BoundAdmitter: {type(inner).__name__}.admit lacks "
                "run_id — cannot participate in replay-convergent chains"
            )
        self.inner = inner
        self.kwargs = kwargs

    def admit(self, batch: DataFrame, run_id: str | None = None) -> DataFrame:
        return self.inner.admit(batch, run_id=run_id, **self.kwargs)


class SemanticGateStage:
    """First-class embedding/semantic gate for a curation chain (r11):
    per batch, JOIN a keyed embeddings table onto the documents (one
    broadcast-or-shuffled equi-join on the id — never a corpus
    shuffle: the batch side is O(epoch)), run the wrapped
    :class:`...operators.similarity.IncrementalSemanticDedup`, then
    drop the joined vector column so downstream gates and the sink see
    the original document schema. Before this, a semantic gate
    required the caller to hand-join embeddings upstream and pass a
    pre-built stage through ``extra_stages``.

    ``missing_embedding``: a document without an embedding row cannot
    be judged —

    - ``"error"`` (default): fail the epoch loudly naming the id
      (lazily, via ``raise_error`` inside the gate's own
      materialization — no extra probe action);
    - ``"admit"``: pass it through ungated (the LSH shingle-less
      discipline — deterministic, so replay convergence holds).

    Replay convergence: the join is deterministic, the inner gate is
    replay-convergent, and the pass-through slice is stateless — so
    the stage satisfies the chain's induction unchanged. State-path
    refusals see the inner gate's ``state_dir`` through ``inner``."""

    def __init__(
        self,
        inner,
        embeddings: DataFrame,
        id_col: str = "doc_id",
        missing_embedding: str = "error",
    ) -> None:
        if missing_embedding not in ("error", "admit"):
            raise ValueError(
                "missing_embedding must be 'error' or 'admit', got "
                f"{missing_embedding!r}"
            )
        vec = getattr(inner, "vec_col", None)
        if not vec:
            raise TypeError(
                f"SemanticGateStage: {type(inner).__name__} exposes no "
                "vec_col — wrap an IncrementalSemanticDedup-shaped gate"
            )
        if id_col != getattr(inner, "id_col", id_col):
            raise ValueError(
                f"SemanticGateStage: id_col {id_col!r} differs from the "
                f"inner gate's {inner.id_col!r}"
            )
        bad = [c for c in (id_col, vec) if c not in embeddings.columns]
        if bad:
            raise ValueError(
                f"SemanticGateStage: embeddings table lacks column(s) {bad}"
            )
        # duplicate embedding rows for one id would MULTIPLY batch rows
        # through the left join — a document admitted (and written to
        # the corpus sink) more than once. The r12 construction-time
        # scan was point-in-time over a lazily-read source (duplicates
        # appearing AFTER construction still multiplied rows) and paid
        # a full-table job even when the stream never started (ADVICE
        # r12). The guard is now LIVE: the join side pre-aggregates to
        # one row per id carrying its duplicate count, and admit()
        # raises in-join the moment a batch touches a duplicated id —
        # every epoch checks exactly the rows it reads, no extra job.
        from pyspark.sql import functions as F

        self.inner = inner
        self.id_col = id_col
        self.vec_col = vec
        self.missing_embedding = missing_embedding
        self.embeddings = embeddings.select(id_col, vec).groupBy(id_col).agg(
            F.first(vec).alias(vec),
            F.count(F.lit(1)).alias("__n_emb"),
        )

    def admit(self, batch: DataFrame, run_id: str | None = None) -> DataFrame:
        from pyspark.sql import functions as F

        if self.vec_col in batch.columns:
            raise ValueError(
                f"SemanticGateStage: batch already carries "
                f"{self.vec_col!r} — pre-joined flows should pass the "
                "inner gate directly (via extra_stages), not re-join"
            )
        joined = (
            batch.join(self.embeddings, self.id_col, "left")
            .withColumn(
                self.vec_col,
                # live duplicate-id guard (see __init__): NULL __n_emb
                # (no embedding row) falls through to the missing logic
                F.when(
                    F.col("__n_emb") > 1,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "SemanticGateStage: embeddings table has "
                                f"duplicate rows for {self.id_col}="
                            ),
                            F.col(self.id_col).cast("string"),
                            F.lit(
                                " — one embedding per document "
                                "(dropDuplicates upstream with an "
                                "explicit pick rule if the table is "
                                "multi-versioned)"
                            ),
                        )
                    ).cast(self.embeddings.schema[self.vec_col].dataType),
                ).otherwise(F.col(self.vec_col)),
            )
            .drop("__n_emb")
        )
        missing = F.col(self.vec_col).isNull()
        if self.missing_embedding == "error":
            guarded = joined.withColumn(
                self.vec_col,
                F.when(
                    missing,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "SemanticGateStage: no embedding row for "
                                f"{self.id_col}="
                            ),
                            F.col(self.id_col).cast("string"),
                        )
                    ).cast(joined.schema[self.vec_col].dataType),
                ).otherwise(F.col(self.vec_col)),
            )
            return self.inner.admit(guarded, run_id=run_id).drop(self.vec_col)
        gated = self.inner.admit(joined.filter(~missing), run_id=run_id)
        return gated.drop(self.vec_col).unionByName(
            joined.filter(missing).drop(self.vec_col)
        )


class ChainedAdmitter:
    """Sequential multi-gate admission under ONE per-epoch ``run_id``
    — the streaming twin of :mod:`...plans.llm_corpus`'s batch gate
    chain (blocklist → NB quality → exact → LSH near-dup → semantic →
    substring rewrite, or any subset/order).

    ``ChainedAdmitter`` satisfies the admitter contract itself
    (``admit(batch, run_id=) -> admitted slice``), so it drops into
    :func:`run_admission_stream` unchanged: ONE checkpoint, ONE
    namespaced epoch run_id threaded verbatim through every gate, ONE
    idempotent epoch output partition — instead of N separate streams
    with N checkpoints and no cross-gate atomicity story.

    **Exactly-once across the chain, by induction.** Each constituent
    gate is individually replay-convergent: calling ``admit`` again
    with the same ``run_id`` returns exactly the rows the first
    attempt admitted, without re-mutating state (run-tracked state for
    the incremental gates; determinism for the stateless ones). A
    crash between gate N and N+1 leaves gates 1..N committed and
    N+1.. untouched; the checkpoint re-delivers the epoch with the
    SAME id, so gate 1 sees its original input, returns its original
    output (replay path), which is gate 2's original input, and so on
    — gates 1..N answer from state, gates N+1.. run as if for the
    first time, and the chain's output is identical no matter where
    the crash fell. The epoch-partition overwrite sink then commits
    the identical result. ``tests/test_chained_admission.py`` pins
    this with a crash injected at every boundary.

    **Construction refusals** (each would silently break the replay
    induction): a stage whose ``admit`` lacks ``run_id``; the same
    admitter INSTANCE twice (its second replay would alias the first
    stage's run-tracked rows); two stages sharing a persistent state
    path (same aliasing through the artifact); duplicate stage names.

    Scale: per-epoch cost is the sum of the member gates' costs — each
    is O(batch × log state) by its own contract — and admission state
    stays per-gate (no combined artifact), so retraction/compaction
    keep working per artifact via ``Engine.remove_document`` /
    ``compact_artifacts``.

    **Per-gate admission funnel (r11).** With ``funnel=True`` (the
    default) every ``admit`` records, per gate, how many rows entered,
    survived and were rejected — the batch pipeline's per-stage audit
    table (``plans/llm_corpus.py``) brought to the stream, and the
    first dashboard a production curation user builds. The counts for
    the latest epoch are in :attr:`last_funnel`; the full per-run map
    in :attr:`funnels`; :func:`run_admission_stream` lands them in an
    :class:`...observability.AdmissionFunnelLog` when given one.

    Funnel cost model (what matters at 100 TB): each gate boundary is
    localCheckpointed (executor-side cache of the O(batch) slice —
    NOT the corpus) and counted FROM THE CACHE — so the funnel adds
    zero re-scans of the source files, zero shuffles, and zero extra
    evaluations of any gate's logic (downstream gates and the sink
    read the cache instead of re-executing upstream lineage, which
    they previously did once per internal action). The count jobs
    scan ExistingRDD blocks only — pinned by plan in
    ``tests/test_chained_admission.py``. Funnel counts telescope by
    construction AND by replay convergence: a crash-replayed epoch
    reproduces the never-crashed funnel exactly (pinned).

    ``stages``: iterable of admitters, or ``(name, admitter)`` pairs
    (bare admitters auto-name ``s{i}-{ClassName}``). Gate order is
    chain order; put transform stages (e.g. :class:`...operators.
    substring.SubstringRewriteStage`) last so earlier gates judge the
    original text.
    """

    def __init__(self, stages, funnel: bool = True) -> None:
        self.funnel = bool(funnel)
        #: per-run funnel rows: {run_id: [{"stage", "n_in",
        #: "n_admitted", "n_rejected"}, ...] in chain order}
        self.funnels: "dict[str | None, list[dict]]" = {}
        self.stages: "list[tuple[str, object]]" = []
        seen_names: set = set()
        seen_instances: dict = {}
        seen_paths: dict = {}
        for i, entry in enumerate(stages):
            if isinstance(entry, tuple):
                name, adm = entry
            else:
                name, adm = f"s{i}-{type(entry).__name__}", entry
            if not _admit_accepts_run_id(adm):
                raise TypeError(
                    f"ChainedAdmitter stage {name!r}: "
                    f"{type(adm).__name__}.admit missing or lacks "
                    "run_id — every gate must be replay-convergent for "
                    "the chain's exactly-once induction to hold"
                )
            if name in seen_names:
                raise ValueError(
                    f"ChainedAdmitter: duplicate stage name {name!r}"
                )
            if id(adm) in seen_instances:
                raise ValueError(
                    f"ChainedAdmitter: stage {name!r} reuses the same "
                    f"admitter instance as {seen_instances[id(adm)]!r} — "
                    "its replay would alias the earlier stage's "
                    "run-tracked state rows under the shared run_id"
                )
            for p in _state_paths(adm):
                if p in seen_paths:
                    raise ValueError(
                        f"ChainedAdmitter: stage {name!r} shares state "
                        f"path {p} with stage {seen_paths[p]!r} — two "
                        "gates mutating one artifact under the shared "
                        "run_id breaks replay convergence"
                    )
                seen_paths[p] = name
            seen_names.add(name)
            seen_instances[id(adm)] = name
            self.stages.append((name, adm))
        if not self.stages:
            raise ValueError("ChainedAdmitter: empty stage list")

    def admit(self, batch: DataFrame, run_id: str | None = None) -> DataFrame:
        """Fold ``batch`` through every gate in order under the SAME
        ``run_id``; return the final admitted (possibly transformed)
        slice. Each stateful gate materializes its own decision before
        mutating its state (their documented discipline), so the
        returned DataFrame is safe to write even though later actions
        re-execute the stateless gates' lineage.

        With :attr:`funnel` on, gate boundaries are checkpointed and
        counted from cache (see the class docstring's cost model) and
        the per-gate rows land in ``self.funnels[run_id]``."""
        if not self.funnel:
            cur = batch
            for _name, adm in self.stages:
                cur = adm.admit(cur, run_id=run_id)
            return cur
        rows: "list[dict]" = []
        cur = batch.localCheckpoint(eager=True)
        n_in = cur.count()
        for name, adm in self.stages:
            out = adm.admit(cur, run_id=run_id).localCheckpoint(eager=True)
            n_out = out.count()
            rows.append(
                {
                    "stage": name,
                    "n_in": n_in,
                    "n_admitted": n_out,
                    "n_rejected": n_in - n_out,
                }
            )
            cur, n_in = out, n_out
        self.funnels[run_id] = rows
        return cur

    @property
    def last_funnel(self) -> "list[dict] | None":
        """The most recent epoch's per-gate funnel rows (chain order),
        or None before the first funnel-enabled admit."""
        if not self.funnels:
            return None
        return next(reversed(self.funnels.values()))


def run_admission_stream(
    source: DataFrame,
    admitter,
    output_dir: str,
    checkpoint: str,
    text_col=_UNSET,
    id_col=_UNSET,
    labels_index=None,
    labels_max_live_runs=None,
    funnel_log=None,
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

    ``labels_max_live_runs``: auto-compaction policy for the labels
    index (r10): when set, each epoch's label append is followed by a
    live-run-count check that folds the index under the deterministic
    tag ``compact-auto-<run_id>`` once it exceeds the threshold — so a
    long-running stream's run-partition count stays bounded without a
    manual ``compact()`` call. Crash-resumable (same epoch → same tag
    → the idempotent protocol resumes); see
    :func:`...operators.compaction.maybe_autocompact`. Stateful
    ADMITTERS take their own ``max_live_runs`` constructor knob
    (IncrementalSubstringDedup, IncrementalSemanticDedup).

    ``funnel_log``: an optional :class:`...observability.
    AdmissionFunnelLog` — when the admitter exposes per-gate funnel
    rows for the epoch (a funnel-enabled :class:`ChainedAdmitter`),
    they land there AFTER the epoch's corpus partition commits, as an
    idempotent per-run overwrite. Exactly-once composes the same way
    the labels index does: a crash before the funnel write is healed
    by the replayed epoch recomputing the identical funnel (replay
    convergence) and rewriting the identical partition.
    """
    from dataeng_azure_spotify_spark.operators.compaction import (
        maybe_autocompact,
    )

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
            maybe_autocompact(labels_index, run_id, labels_max_live_runs)
        if funnel_log is not None:
            rows = getattr(admitter, "funnels", {}).get(run_id)
            if rows is None:
                raise TypeError(
                    f"{type(admitter).__name__} recorded no funnel for "
                    f"{run_id!r} — funnel_log needs a funnel-enabled "
                    "ChainedAdmitter (or an admitter with the same "
                    "funnels contract)"
                )
            funnel_log.record(run_id, rows)

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
