"""ChainedAdmitter — the streaming twin of plans/llm_corpus.py's gate
chain: one checkpoint, one per-epoch run_id threaded through every
gate, exactly-once END-TO-END. The core pin is crash-at-every-boundary
replay convergence: whichever gate boundary the crash falls on, the
re-delivered epoch converges to the identical admitted set and
identical per-gate artifact state."""

from __future__ import annotations

import os

import pytest

from dataeng_azure_spotify_spark.operators.curation import BlocklistAdmitter
from dataeng_azure_spotify_spark.operators.dedup import (
    IncrementalDedup,
    IncrementalLsh,
)
from dataeng_azure_spotify_spark.operators.substring import (
    SubstringRewriteStage,
)
from dataeng_azure_spotify_spark.streaming.admission import (
    BoundAdmitter,
    ChainedAdmitter,
    read_admitted,
    run_admission_stream,
)

# slow tier (r14): streaming admission-chain e2e — exceeds the driver verify window; run with -m slow
pytestmark = pytest.mark.slow

_SCHEMA = "doc_id long, text string"

# 12 unique tokens + a 10-token boilerplate block shared across docs:
# long enough that the k=8 substring tier sees duplicated 8-gram runs,
# short enough that boiler-sharing docs stay BELOW the 0.6 LSH
# threshold (J = 8 shared 3-shingles / 32 = 0.25) while one-word edits
# stay above it (J ≈ 17/23 ≈ 0.74).
_UNIQ1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
_BOILER = "mu nu xi omicron pi rho sigma tau upsilon phi"
_UNIQ5 = (
    "quebec romeo sierra tango uniform victor whiskey xray yankee zulu "
    "november december"
)
_UNIQ12 = (
    "one two three four five six seven eight nine ten eleven twelve"
)
_TEXT13 = (
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen "
    "twenty twentyone twentytwo"
)

_B1 = [
    (1, f"{_UNIQ1} {_BOILER}"),  # survives; boiler excised
    (2, "bad bad bad words here"),  # blocklist: 600000 ppm > budget
    (3, f"Alpha  bravo charlie delta echo foxtrot golf hotel india "
        f"juliet kilo lima {_BOILER}"),  # exact dup of 1 (normalized)
    (4, f"{_UNIQ1} {_BOILER}".replace("foxtrot", "FOXTROT-X")),  # near-dup of 1
    (5, f"{_UNIQ5} {_BOILER}"),  # survives; boiler excised
]
_B2 = [
    (10, f"ALPHA bravo charlie delta echo foxtrot golf hotel india "
         f"juliet kilo lima {_BOILER}"),  # cross-epoch exact dup of 1
    (11, f"{_UNIQ1} {_BOILER}".replace("phi", "phi-variant")),  # near-dup of 1
    (12, f"{_UNIQ12} {_BOILER}"),  # boiler vs STORED corpus -> excised
    (13, _TEXT13),  # clean, untouched
]
_E1_EXPECT = {(1, _UNIQ1), (5, _UNIQ5)}
_E2_EXPECT = {(12, _UNIQ12), (13, _TEXT13)}


def _mk_stages(spark, root: str):
    """The 4-gate chain every test uses: C4 blocklist -> exact dedup ->
    LSH near-dup -> substring-span rewrite, state under ``root``."""
    return [
        ("blocklist", BlocklistAdmitter(["bad"], max_blocked_ppm=100000)),
        ("exact", BoundAdmitter(
            IncrementalDedup(spark, os.path.join(root, "exact")))),
        ("lsh", BoundAdmitter(
            IncrementalLsh(spark, os.path.join(root, "lsh"), threshold=0.6))),
        ("rewrite", SubstringRewriteStage(
            spark, os.path.join(root, "substr"))),
    ]


def _rows(df):
    return {(r["doc_id"], r["text"]) for r in df.select("doc_id", "text").collect()}


def _state_counts(spark, root: str) -> dict:
    """Row counts of each gate's persistent state (the cross-run
    artifacts whose convergence the crash tests assert)."""
    out = {}
    for leg in ("exact", "lsh"):
        p = os.path.join(root, leg)
        out[leg] = (
            spark.read.parquet(p).count() if os.path.isdir(p) and any(
                f.endswith(".parquet") for f in os.listdir(p)
            ) else 0
        )
    gp = os.path.join(root, "substr", "grams")
    out["substr"] = (
        spark.read.parquet(gp).count() if os.path.isdir(gp) else 0
    )
    return out


class _CrashAfter:
    """Wrapper injecting a crash AT the boundary after its gate: the
    inner admit runs fully (state mutations included — that is the
    point), its output is forced, then the epoch dies."""

    def __init__(self, inner):
        self.inner = inner

    def admit(self, batch, run_id=None):
        out = self.inner.admit(batch, run_id=run_id)
        out.count()  # force lazy (stateless-gate) lineage too
        raise RuntimeError("injected crash at gate boundary")


class _CrashOnce:
    """Crash the FIRST invocation only — the streaming restart shape."""

    def __init__(self, inner):
        self.inner = inner
        self.crashed = False

    def admit(self, batch, run_id=None):
        out = self.inner.admit(batch, run_id=run_id)
        if not self.crashed:
            out.count()
            self.crashed = True
            raise RuntimeError("injected first-attempt crash")
        return out


def test_chain_two_epochs_each_gate_fires(spark, tmp_path):
    """Baseline semantics: every gate drops/rewrites what it should,
    within the batch (epoch 1) and against history (epoch 2)."""
    chain = ChainedAdmitter(_mk_stages(spark, str(tmp_path / "s")))
    b1 = spark.createDataFrame(_B1, _SCHEMA)
    b2 = spark.createDataFrame(_B2, _SCHEMA)
    assert _rows(chain.admit(b1, run_id="e0")) == _E1_EXPECT
    assert _rows(chain.admit(b2, run_id="e1")) == _E2_EXPECT


def test_chain_construction_refusals(spark, tmp_path):
    class _NoRunId:
        def admit(self, batch):
            return batch

    with pytest.raises(TypeError, match="run_id"):
        ChainedAdmitter([_NoRunId()])
    with pytest.raises(ValueError, match="empty"):
        ChainedAdmitter([])
    gate = BlocklistAdmitter(["x"])
    with pytest.raises(ValueError, match="duplicate stage name"):
        ChainedAdmitter([("g", gate), ("g", BlocklistAdmitter(["y"]))])
    with pytest.raises(ValueError, match="same .* instance|reuses"):
        ChainedAdmitter([("a", gate), ("b", gate)])
    p = str(tmp_path / "shared")
    with pytest.raises(ValueError, match="shares state path"):
        ChainedAdmitter([
            ("a", BoundAdmitter(IncrementalDedup(spark, p))),
            ("b", BoundAdmitter(IncrementalDedup(spark, p))),
        ])


def test_bound_admitter_validates_kwargs(spark, tmp_path):
    inner = IncrementalDedup(spark, str(tmp_path / "st"))
    with pytest.raises(TypeError, match="does not accept"):
        BoundAdmitter(inner, nope_col="text")
    bound = BoundAdmitter(inner, text_col="text", id_col="doc_id")
    got = bound.admit(
        spark.createDataFrame([(1, "a b"), (2, "a b")], _SCHEMA),
        run_id="e0",
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [1]


def test_chain_crash_at_every_boundary_replay_converges(spark, tmp_path):
    """THE exactly-once pin: for each boundary k (crash after gate k
    fully committed, before gate k+1 ran), the re-delivered epoch —
    through a FRESH chain over the same state, the process-restart
    shape — admits the identical set, leaves every gate's artifact in
    the identical state as the never-crashed control, and the NEXT
    epoch proceeds unharmed."""
    b1 = spark.createDataFrame(_B1, _SCHEMA)
    b2 = spark.createDataFrame(_B2, _SCHEMA)

    control_root = str(tmp_path / "control")
    control = ChainedAdmitter(_mk_stages(spark, control_root))
    assert _rows(control.admit(b1, run_id="e0")) == _E1_EXPECT
    control_state_e0 = _state_counts(spark, control_root)
    assert _rows(control.admit(b2, run_id="e1")) == _E2_EXPECT

    n_gates = 4
    for k in range(n_gates):
        root = str(tmp_path / f"crash{k}")
        stages = _mk_stages(spark, root)
        name_k, gate_k = stages[k]
        stages[k] = (name_k, _CrashAfter(gate_k))
        crashing = ChainedAdmitter(stages)
        with pytest.raises(RuntimeError, match="injected crash"):
            crashing.admit(b1, run_id="e0")

        # process restart: fresh chain instances over the same state
        replay = ChainedAdmitter(_mk_stages(spark, root))
        assert _rows(replay.admit(b1, run_id="e0")) == _E1_EXPECT, (
            f"replay diverged after crash at boundary {k}"
        )
        assert _state_counts(spark, root) == control_state_e0, (
            f"artifact state diverged after crash at boundary {k}"
        )
        # replay-of-replay: still identical, state still unchanged
        assert _rows(replay.admit(b1, run_id="e0")) == _E1_EXPECT
        assert _state_counts(spark, root) == control_state_e0
        # and the next epoch proceeds exactly like the control
        assert _rows(replay.admit(b2, run_id="e1")) == _E2_EXPECT, (
            f"epoch 2 diverged after crash at boundary {k}"
        )


def test_chain_streaming_end_to_end_with_restart(spark, tmp_path):
    """The chain through run_admission_stream: one checkpoint, the
    first attempt dies mid-chain (after the LSH gate committed), the
    restarted stream re-delivers the epoch with the same id and the
    landed corpus equals the batch-chain control — then a second epoch
    drains normally."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    root = str(tmp_path / "state")

    spark.createDataFrame(_B1, _SCHEMA).write.mode("append").parquet(inp)

    stages = _mk_stages(spark, root)
    stages[2] = (stages[2][0], _CrashOnce(stages[2][1]))
    chain = ChainedAdmitter(stages)

    def drain():
        src = spark.readStream.schema(_SCHEMA).parquet(inp)
        run_admission_stream(src, chain, out, chk)

    with pytest.raises(Exception, match="injected first-attempt crash"):
        drain()
    drain()  # restart: same checkpoint, epoch re-delivered, same run_id
    assert _rows(read_admitted(spark, out)) == _E1_EXPECT

    spark.createDataFrame(_B2, _SCHEMA).write.mode("append").parquet(inp)
    drain()
    assert _rows(read_admitted(spark, out)) == _E1_EXPECT | _E2_EXPECT


def test_rewrite_stage_pure_transform_and_cross_epoch_store(spark, tmp_path):
    """SubstringRewriteStage alone: default max_dup_frac=1.0 admits
    everything; within-epoch duplicated spans are excised from BOTH
    carriers; epoch-2 docs are cleaned against epoch-1's STORED
    boilerplate; extra columns carry through."""
    stage = SubstringRewriteStage(spark, str(tmp_path / "st"))
    b1 = spark.createDataFrame(
        [(1, f"{_UNIQ1} {_BOILER}", "web"), (5, f"{_UNIQ5} {_BOILER}", "web")],
        "doc_id long, text string, source string",
    )
    got1 = stage.admit(b1, run_id="e0")
    assert _rows(got1) == {(1, _UNIQ1), (5, _UNIQ5)}
    assert {r["source"] for r in got1.collect()} == {"web"}

    b2 = spark.createDataFrame(
        [(12, f"{_UNIQ12} {_BOILER}", "web")],
        "doc_id long, text string, source string",
    )
    # epoch 2 carries the boiler ONCE — only the stored corpus makes
    # it a duplicate, so this pins rewrite-vs-store (not just in-batch)
    assert _rows(stage.admit(b2, run_id="e1")) == {(12, _UNIQ12)}


def test_engine_curation_stream_one_call(spark, tmp_path):
    """Engine.curation_stream builds the standard chain, drains the
    source exactly-once across two calls, and lands the cleaned
    corpus."""
    from dataeng_azure_spotify_spark.engine import Engine

    eng = Engine(spark)
    inp = str(tmp_path / "in")
    wd = str(tmp_path / "wd")
    spark.createDataFrame(_B1, _SCHEMA).write.mode("append").parquet(inp)

    def src():
        return spark.readStream.schema(_SCHEMA).parquet(inp)

    chain = eng.curation_stream(
        src(), wd, blocklist=("bad",), max_blocked_ppm=100000,
        lsh_threshold=0.6,
    )
    assert [n for n, _ in chain.stages] == [
        "blocklist", "dedup_exact", "dedup_near", "rewrite_spans",
    ]
    admitted = read_admitted(spark, os.path.join(wd, "admitted"))
    assert _rows(admitted) == _E1_EXPECT

    spark.createDataFrame(_B2, _SCHEMA).write.mode("append").parquet(inp)
    eng.curation_stream(
        src(), wd, blocklist=("bad",), max_blocked_ppm=100000,
        lsh_threshold=0.6,
    )
    admitted = read_admitted(spark, os.path.join(wd, "admitted"))
    assert _rows(admitted) == _E1_EXPECT | _E2_EXPECT


def test_curation_stream_with_autocompact_stays_bounded(spark, tmp_path):
    """The two r10 features composed: a long curation stream
    (8 drained epochs through Engine.curation_stream with
    max_live_runs=2) keeps the rewrite-stage artifact's run-partition
    count bounded by self-compaction, while the landed corpus stays
    identical to an unbounded-policy control run over the same
    batches."""
    from dataeng_azure_spotify_spark.engine import Engine
    from dataeng_azure_spotify_spark.operators.substring import (
        SubstringDupIndex,
    )

    eng = Engine(spark)
    words = "alpha bravo charlie delta echo foxtrot golf hotel india"

    def batch(e):
        return spark.createDataFrame(
            [(e * 100 + i, f"e{e} d{i} {words} t{e} x{i}") for i in range(2)],
            _SCHEMA,
        )

    def run(workdir, inp, **kw):
        src = spark.readStream.schema(_SCHEMA).parquet(inp)
        return eng.curation_stream(
            src, workdir, exact=True, near_dup=False, rewrite=True, **kw
        )

    auto_in, ctl_in = str(tmp_path / "ain"), str(tmp_path / "cin")
    auto_wd, ctl_wd = str(tmp_path / "awd"), str(tmp_path / "cwd")
    for e in range(8):
        batch(e).write.mode("append").parquet(auto_in)
        batch(e).write.mode("append").parquet(ctl_in)
        run(auto_wd, auto_in, max_live_runs=2)
        run(ctl_wd, ctl_in)

    auto_sub = SubstringDupIndex(spark, os.path.join(auto_wd, "state", "substring"))
    ctl_sub = SubstringDupIndex(spark, os.path.join(ctl_wd, "state", "substring"))
    assert auto_sub.live_run_count() <= 3
    assert ctl_sub.live_run_count() == 8
    a = _rows(read_admitted(spark, os.path.join(auto_wd, "admitted")))
    c = _rows(read_admitted(spark, os.path.join(ctl_wd, "admitted")))
    assert a == c and len(a) == 16


def test_curation_stream_semantic_gate_via_extra_stages(spark, tmp_path):
    """The documented embedding path: join embeddings upstream, pass an
    IncrementalSemanticDedup (keyed on doc_id) through extra_stages —
    it slots between the dedup gates and the rewrite under the same
    checkpoint/run_id, and a cross-epoch semantic twin is rejected."""
    from dataeng_azure_spotify_spark.engine import Engine
    from dataeng_azure_spotify_spark.operators.similarity import (
        IncrementalSemanticDedup,
    )

    eng = Engine(spark)
    schema = "doc_id long, text string, embedding array<float>"
    words = "alpha bravo charlie delta echo foxtrot golf hotel india"
    b1 = [
        (1, f"one {words} x", [1.0, 0.0, 0.0, 0.0]),
        (2, f"two {words} y", [0.0, 1.0, 0.0, 0.0]),
        (3, f"bad bad bad {words}", [0.0, 0.0, 1.0, 0.0]),  # blocklist
    ]
    b2 = [
        (10, f"ten {words} z", [1.0, 1e-4, 0.0, 0.0]),  # semantic twin of 1
        (11, f"eleven {words} w", [0.0, 0.0, 0.0, 1.0]),
    ]
    inp = str(tmp_path / "in")
    wd = str(tmp_path / "wd")
    sem = IncrementalSemanticDedup(
        spark, os.path.join(wd, "state", "semantic"),
        threshold=0.95, k=2, iters=1, id_col="doc_id",
    )

    def run():
        src = spark.readStream.schema(schema).parquet(inp)
        return eng.curation_stream(
            src, wd, blocklist=("bad",), max_blocked_ppm=100000,
            near_dup=False, extra_stages=(("semantic", sem),),
        )

    spark.createDataFrame(b1, schema).write.mode("append").parquet(inp)
    chain = run()
    assert [n for n, _ in chain.stages] == [
        "blocklist", "dedup_exact", "semantic", "rewrite_spans",
    ]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(inp)
    run()
    got = {
        r["doc_id"]
        for r in read_admitted(
            spark, os.path.join(wd, "admitted")
        ).collect()
    }
    assert got == {1, 2, 11}  # 3 blocklisted, 10 semantically deduped


# ---- r11: per-gate admission funnel + one-call semantic gate --------------


def test_funnel_counts_telescope_and_stay_cached(spark, tmp_path):
    """The per-gate funnel over the canonical 4-gate chain: counts
    match each gate's documented drops, telescope (gate N's admitted =
    gate N+1's input), and the funnel-enabled chain's output plan
    reads the boundary CACHE (ExistingRDD), never the source files —
    the 'no extra corpus action' cost model."""
    chain = ChainedAdmitter(_mk_stages(spark, str(tmp_path / "s")))
    out = chain.admit(spark.createDataFrame(_B1, _SCHEMA), run_id="e0")
    f = chain.last_funnel
    assert [r["stage"] for r in f] == ["blocklist", "exact", "lsh", "rewrite"]
    assert [(r["n_in"], r["n_admitted"]) for r in f] == [
        (5, 4),  # blocklist drops doc 2
        (4, 3),  # exact dedup drops doc 3
        (3, 2),  # lsh drops doc 4
        (2, 2),  # rewrite transforms, never drops
    ]
    for a, b in zip(f, f[1:]):
        assert a["n_admitted"] == b["n_in"]
    assert all(r["n_rejected"] == r["n_in"] - r["n_admitted"] for r in f)
    assert f[-1]["n_admitted"] == out.count() == 2
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # a checkpointed boundary logical-plans as LogicalRDD (the cached
    # blocks); any file re-read would show a parquet relation instead
    assert "LogicalRDD" in plan and "parquet" not in plan.lower()
    assert chain.funnels["e0"] == f


def test_funnel_disabled_records_nothing(spark, tmp_path):
    chain = ChainedAdmitter(
        _mk_stages(spark, str(tmp_path / "s")), funnel=False
    )
    got = _rows(chain.admit(spark.createDataFrame(_B1, _SCHEMA), run_id="e0"))
    assert got == _E1_EXPECT
    assert chain.last_funnel is None and chain.funnels == {}


def test_funnel_log_replay_convergence(spark, tmp_path):
    """Crash-replay pin for the funnel: a stream whose first epoch dies
    at a gate boundary replays under the same epoch id, reproduces the
    never-crashed control's funnel EXACTLY, and the landed funnel-log
    partition telescopes with the epoch's output partition."""
    from dataeng_azure_spotify_spark.observability import AdmissionFunnelLog

    inp = str(tmp_path / "in")
    spark.createDataFrame(_B1, _SCHEMA).write.mode("append").parquet(inp)

    def src():
        return spark.readStream.schema(_SCHEMA).parquet(inp)

    # control: never crashes
    ctl_chain = ChainedAdmitter(_mk_stages(spark, str(tmp_path / "cs")))
    ctl_log = AdmissionFunnelLog(spark, str(tmp_path / "cf"))
    run_admission_stream(
        src(), ctl_chain, str(tmp_path / "cout"), str(tmp_path / "cchk"),
        funnel_log=ctl_log,
    )
    ctl_funnel = ctl_chain.last_funnel

    # crashing arm: LSH gate dies on its first attempt
    stages = _mk_stages(spark, str(tmp_path / "xs"))
    stages[2] = ("lsh", _CrashOnce(stages[2][1]))
    x_chain = ChainedAdmitter(stages)
    x_log = AdmissionFunnelLog(spark, str(tmp_path / "xf"))
    with pytest.raises(Exception, match="injected first-attempt crash"):
        run_admission_stream(
            src(), x_chain, str(tmp_path / "xout"), str(tmp_path / "xchk"),
            funnel_log=x_log,
        )
    assert x_chain.funnels == {}  # crash preceded the funnel commit
    run_admission_stream(  # restart: same checkpoint -> same epoch id
        src(), x_chain, str(tmp_path / "xout"), str(tmp_path / "xchk"),
        funnel_log=x_log,
    )
    strip = lambda rows: [  # noqa: E731
        (r["stage"], r["n_in"], r["n_admitted"], r["n_rejected"])
        for r in rows
    ]
    assert strip(x_chain.last_funnel) == strip(ctl_funnel)
    logged = sorted(
        (r.stage, r.n_in, r.n_admitted, r.n_rejected)
        for r in x_log.read().collect()
    )
    assert logged == sorted(strip(ctl_funnel))
    # the funnel's terminal count is the landed epoch partition
    landed = read_admitted(spark, str(tmp_path / "xout"))
    assert x_chain.last_funnel[-1]["n_admitted"] == landed.count()
    # run ids line up between log and chain
    (logged_run,) = {r.run_id for r in x_log.read().collect()}
    assert logged_run in x_chain.funnels


def test_funnel_log_requires_funnel_contract(spark, tmp_path):
    from dataeng_azure_spotify_spark.observability import AdmissionFunnelLog

    inp = str(tmp_path / "in")
    spark.createDataFrame(_B1, _SCHEMA).write.mode("append").parquet(inp)
    bare = BoundAdmitter(IncrementalDedup(spark, str(tmp_path / "st")))
    with pytest.raises(Exception, match="funnel"):
        run_admission_stream(
            spark.readStream.schema(_SCHEMA).parquet(inp),
            bare,
            str(tmp_path / "out"),
            str(tmp_path / "chk"),
            funnel_log=AdmissionFunnelLog(spark, str(tmp_path / "f")),
        )


_SEM_SCHEMA = "doc_id long, text string"
_SEM_WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india"


def _sem_embeddings(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (10, [1.0, 1e-4, 0.0, 0.0]),  # semantic twin of 1
        (11, [0.0, 0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, embedding array<float>"
    )


def test_curation_stream_semantic_knob_one_call(spark, tmp_path):
    """The r11 one-call semantic gate: pass embeddings= and the chain
    gains a 'semantic' stage between the dedup tiers and the rewrite —
    no hand-built extra_stages — with the vector column absent from
    the admitted output and the funnel reporting the semantic drop."""
    from dataeng_azure_spotify_spark.engine import Engine

    eng = Engine(spark)
    inp, wd = str(tmp_path / "in"), str(tmp_path / "wd")
    b1 = [
        (1, f"one {_SEM_WORDS} x"),
        (2, f"two {_SEM_WORDS} y"),
        (3, f"bad bad bad {_SEM_WORDS}"),
    ]
    b2 = [(10, f"ten {_SEM_WORDS} z"), (11, f"eleven {_SEM_WORDS} w")]

    def run():
        src = spark.readStream.schema(_SEM_SCHEMA).parquet(inp)
        return eng.curation_stream(
            src, wd, blocklist=("bad",), max_blocked_ppm=100000,
            near_dup=False, embeddings=_sem_embeddings(spark),
            semantic_threshold=0.95, semantic_k=2, semantic_iters=1,
        )

    spark.createDataFrame(b1, _SEM_SCHEMA).write.mode("append").parquet(inp)
    chain = run()
    assert [n for n, _ in chain.stages] == [
        "blocklist", "dedup_exact", "semantic", "rewrite_spans",
    ]
    spark.createDataFrame(b2, _SEM_SCHEMA).write.mode("append").parquet(inp)
    chain = run()
    admitted = read_admitted(spark, os.path.join(wd, "admitted"))
    assert "embedding" not in admitted.columns
    got = {r["doc_id"] for r in admitted.collect()}
    assert got == {1, 2, 11}  # 3 blocklisted, 10 semantically deduped
    sem = [r for r in chain.last_funnel if r["stage"] == "semantic"][0]
    assert (sem["n_in"], sem["n_admitted"]) == (2, 1)  # epoch 2: 10 dropped


def test_semantic_gate_stage_crash_replay_converges(spark, tmp_path):
    """Crash-replay convergence for the joined semantic stage itself:
    first attempt dies after the semantic gate mutated its index; the
    replayed epoch admits the identical set (run-tracked keepers)."""
    from dataeng_azure_spotify_spark.operators.similarity import (
        IncrementalSemanticDedup,
    )
    from dataeng_azure_spotify_spark.streaming.admission import (
        SemanticGateStage,
    )

    inp = str(tmp_path / "in")
    rows = [(1, f"one {_SEM_WORDS}"), (10, f"ten {_SEM_WORDS} z"),
            (11, f"eleven {_SEM_WORDS} w")]
    spark.createDataFrame(rows, _SEM_SCHEMA).write.mode("append").parquet(inp)

    def mk(root):
        return ChainedAdmitter([
            ("semantic", SemanticGateStage(
                IncrementalSemanticDedup(
                    spark, os.path.join(root, "sem"),
                    threshold=0.95, k=2, iters=1, id_col="doc_id",
                ),
                _sem_embeddings(spark),
            )),
        ])

    ctl = mk(str(tmp_path / "c"))
    run_admission_stream(
        spark.readStream.schema(_SEM_SCHEMA).parquet(inp), ctl,
        str(tmp_path / "cout"), str(tmp_path / "cchk"),
    )
    ctl_rows = _rows(read_admitted(spark, str(tmp_path / "cout")))

    stages = mk(str(tmp_path / "x")).stages
    x = ChainedAdmitter([("semantic", _CrashOnce(stages[0][1]))])
    with pytest.raises(Exception, match="injected first-attempt crash"):
        run_admission_stream(
            spark.readStream.schema(_SEM_SCHEMA).parquet(inp), x,
            str(tmp_path / "xout"), str(tmp_path / "xchk"),
        )
    run_admission_stream(
        spark.readStream.schema(_SEM_SCHEMA).parquet(inp), x,
        str(tmp_path / "xout"), str(tmp_path / "xchk"),
    )
    assert _rows(read_admitted(spark, str(tmp_path / "xout"))) == ctl_rows
    assert {r[0] for r in ctl_rows} == {1, 11}  # 10 deduped vs 1


def test_semantic_gate_refusals_and_missing_modes(spark, tmp_path):
    from dataeng_azure_spotify_spark.operators.similarity import (
        IncrementalSemanticDedup,
    )
    from dataeng_azure_spotify_spark.streaming.admission import (
        SemanticGateStage,
    )

    emb = _sem_embeddings(spark)

    def inner(name):
        return IncrementalSemanticDedup(
            spark, str(tmp_path / name), threshold=0.95, k=2, iters=1,
            id_col="doc_id",
        )

    with pytest.raises(ValueError, match="missing_embedding"):
        SemanticGateStage(inner("a"), emb, missing_embedding="nope")
    with pytest.raises(ValueError, match="lacks column"):
        SemanticGateStage(inner("b"), emb.select("doc_id"))
    with pytest.raises(ValueError, match="id_col"):
        SemanticGateStage(inner("c"), emb, id_col="other")

    # 'admit' mode: the embedding-less doc passes through ungated
    st = SemanticGateStage(inner("d"), emb, missing_embedding="admit")
    batch = spark.createDataFrame(
        [(1, "t1"), (99, "no embedding row")], _SEM_SCHEMA
    )
    got = {r["doc_id"] for r in st.admit(batch, run_id="e0").collect()}
    assert got == {1, 99}

    # 'error' mode: fails loudly naming the id
    st2 = SemanticGateStage(inner("e"), emb, missing_embedding="error")
    with pytest.raises(Exception, match="doc_id=99"):
        st2.admit(batch, run_id="e0").count()

    # pre-joined batches must not be re-joined
    st3 = SemanticGateStage(inner("f"), emb)
    pre = batch.join(emb, "doc_id")
    with pytest.raises(ValueError, match="already carries"):
        st3.admit(pre, run_id="e0")


def test_curation_stream_nb_model_column_validation(spark, tmp_path):
    """A NB model trained on other column names fails at chain
    CONSTRUCTION, not mid-stream against the wrong column."""
    from dataeng_azure_spotify_spark.engine import Engine
    from dataeng_azure_spotify_spark.operators.quality_nb import (
        NbQualityModel,
    )
    from pyspark.sql import functions as F

    eng = Engine(spark)
    docs = spark.createDataFrame(
        [(i, f"doc {i} alpha bravo charlie") for i in range(8)],
        "uid long, body string",
    )
    model = NbQualityModel.fit(
        docs, F.col("uid") % 2 == 0, str(tmp_path / "nb"),
        id_col="uid", text_col="body", buckets=64,
    )
    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "x")], _SEM_SCHEMA
    ).write.mode("append").parquet(inp)
    src = spark.readStream.schema(_SEM_SCHEMA).parquet(inp)
    with pytest.raises(ValueError, match="trained on columns"):
        eng.curation_stream(src, str(tmp_path / "wd"), nb_model=model)


def test_semantic_gate_refuses_duplicate_embedding_ids(spark, tmp_path):
    """ADVICE r11 + r12: duplicate embedding rows for one id would
    multiply batch rows through the left join — a doc admitted (and
    written) twice. The guard is LIVE (r12 ADVICE): construction pays
    no job, and the refusal fires in-join the moment a batch touches a
    duplicated id — so duplicates appearing after construction are
    caught too (the r12 constructor scan was point-in-time)."""
    from dataeng_azure_spotify_spark.operators.similarity import (
        IncrementalSemanticDedup,
    )
    from dataeng_azure_spotify_spark.streaming.admission import (
        SemanticGateStage,
    )

    dup = _sem_embeddings(spark).unionByName(
        spark.createDataFrame(
            [(1, [0.5, 0.5, 0.0, 0.0])], "doc_id long, embedding array<float>"
        )
    )
    inner = IncrementalSemanticDedup(
        spark, str(tmp_path / "s"), threshold=0.95, k=2, iters=1,
        id_col="doc_id",
    )
    st = SemanticGateStage(inner, dup)  # no eager job, no refusal yet
    batch = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="duplicate"):
        st.admit(batch, run_id="r1").count()
    # a batch that never touches the duplicated id admits normally
    clean = spark.createDataFrame([(2, "y")], "doc_id long, text string")
    assert [r["doc_id"] for r in st.admit(clean, run_id="r2").collect()] == [2]


def test_funnel_log_run_id_sanitized(spark, tmp_path):
    """ADVICE r11: run_id names an output directory — traversal
    characters must refuse (same guard as ivm._safe_run_dir), on both
    the write and the filtered-read path."""
    from dataeng_azure_spotify_spark.observability import AdmissionFunnelLog

    log = AdmissionFunnelLog(spark, str(tmp_path / "f"))
    rows = [{"stage": "g", "n_in": 1, "n_admitted": 1, "n_rejected": 0}]
    with pytest.raises(ValueError, match="run_id"):
        log.record("../evil", rows)
    with pytest.raises(ValueError, match="run_id"):
        log.record("a/b", rows)
    log.record("ok-1", rows)
    with pytest.raises(ValueError, match="run_id"):
        log.read("../evil")
    assert log.read("ok-1").count() == 1


def test_unified_funnel_one_schema_batch_and_streaming(spark, tmp_path):
    """r12 (verdict Next #5): batch pipeline audit counts and streaming
    epoch funnels land in ONE table with ONE schema, read through one
    API (Engine.funnel) — not two shapes."""
    from dataeng_azure_spotify_spark.engine import Engine
    from dataeng_azure_spotify_spark.observability import (
        FUNNEL_LOG_SCHEMA,
        AdmissionFunnelLog,
    )

    workdir = tmp_path / "w"
    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma dup dup dup")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(inp)
    eng = Engine(spark)
    src = spark.readStream.schema("doc_id long, text string").parquet(inp)
    eng.curation_stream(
        src, str(workdir), blocklist=("dup",), exact=True,
        near_dup=False, rewrite=False,
    )
    streaming = eng.funnel(str(workdir))
    assert streaming.count() > 0

    # batch side: a Pipeline.run()-shaped ordered counts map bridges
    # into the SAME log via record_pipeline
    log = AdmissionFunnelLog(spark, f"{workdir}/funnel")
    log.record_pipeline(
        "batch-2024.01.01", n_input=3,
        stage_counts={"gate_blocklist": 2, "dedup_exact": 1},
    )
    both = eng.funnel(str(workdir))
    # parquet reads relax nullability; names + types are the contract
    assert [(f.name, f.dataType) for f in both.schema.fields] == [
        (f.name, f.dataType) for f in FUNNEL_LOG_SCHEMA.fields
    ]
    batch_rows = [
        r.asDict()
        for r in eng.funnel(str(workdir), "batch-2024.01.01")
        .orderBy("stage_idx")
        .collect()
    ]
    assert [
        (r["stage"], r["n_in"], r["n_admitted"], r["n_rejected"])
        for r in batch_rows
    ] == [("gate_blocklist", 3, 2, 1), ("dedup_exact", 2, 1, 1)]
    # telescoping invariant holds across the union: every run's gate
    # N+1 n_in equals gate N n_admitted
    for rid in {r["run_id"] for r in both.select("run_id").collect()}:
        seq = [
            r.asDict()
            for r in both.filter(both["run_id"] == rid)
            .orderBy("stage_idx").collect()
        ]
        for a, b in zip(seq, seq[1:]):
            assert b["n_in"] == a["n_admitted"]
