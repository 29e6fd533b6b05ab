"""One user-facing entry point over the whole engine.

Every capability already exists as a module-level function or class;
this facade only ORGANIZES them (zero logic — each attribute IS the
underlying function, so signatures, docstrings and behavior are
identical) so a user composes a pipeline from one import instead of
twenty::

    from dataeng_azure_spotify_spark import Engine

    eng = Engine(spark, "/data/sf0.1")
    docs = eng.table("documents")
    pairs = eng.dedup.minhash_pairs(docs)
    labels = eng.graph.components(
        pairs.selectExpr("doc_a as src", "doc_b as dst"))
    best = eng.graph.keep_best(labels, scores)

Namespaces: ``relational`` (projection/expectations/watermark),
``scd`` (SCD1/SCD2 + as-of consumption), ``dedup``, ``graph``,
``similarity`` (ANN/embeddings), ``text`` (column functions +
quality), ``curate`` (corpus curation), ``analytics`` (event
analytics), ``rank`` (TF-IDF/BM25), ``stream`` (stateful/streaming
twins), plus ``table``/``sql`` catalog access. The README quickstart
walks a bronze→silver→gold→curation pipeline end-to-end on this
surface; ``docs/API.md`` maps every query id to the same functions.
"""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog
from .functions import email as _email
from .functions import sentences as _sentences
from .functions import text as _text
from .observability import RunLog
from .operators import analytics as _analytics
from .operators import asof as _asof
from .operators import cluster_index as _cluster_index
from .operators import bpe as _bpe
from .operators import unigram as _unigram
from .operators import curation as _curation
from .operators import quality_nb as _quality_nb
from .operators import substring as _substring
from .operators import dedup as _dedup
from .operators import graph as _graph
from .operators import ivm as _ivm
from .operators import pca as _pca
from .operators import pq as _pq
from .operators import profile as _profile
from .operators import ranking as _ranking
from .operators import relational as _relational
from .operators import scd as _scd
from .operators import similarity as _similarity
from .operators import sketch as _sketch
from .operators import skew as _skew
from .sources import ingest as _ingest
from .sources import jsonl as _jsonl
from .sources import layout as _layout
from .sources import watermark as _watermark
from .streaming import admission as _admission
from .streaming import anomaly as _anomaly
from .streaming import asof as _stream_asof
from .streaming import funnel as _stream_funnel
from .streaming import gold as _gold
from .streaming import rescue as _rescue
from .streaming import silver as _silver
from .streaming import stateful as _stateful


class Engine:
    """Facade over the engine's operator tiers (pure delegation)."""

    def __init__(self, spark: SparkSession, data_dir: str | None = None) -> None:
        self.spark = spark
        self.catalog = Catalog(spark, data_dir)
        #: name -> persisted artifact registered for unified retraction
        #: (see :meth:`register_artifact` / :meth:`remove_document`)
        self.artifacts: dict[str, object] = {}

        self.relational = SimpleNamespace(
            drop_columns=_relational.drop_columns,
            watermark_filter=_relational.watermark_filter,
            bucketize=_relational.bucketize,
            constant_inject=_relational.constant_inject,
            expectations_drop=_relational.expectations_drop,
            latest_per_key=_relational.latest_per_key,
            scalar_max=_relational.scalar_max,
            non_empty=_relational.non_empty,
        )
        self.scd = SimpleNamespace(
            upsert=_scd.apply_scd1,
            history=_scd.apply_scd2,
            from_history=_scd.scd2_from_history,
            asof_join=_asof.asof_join,
            range_join=_asof.range_join,
            interval_join=_asof.interval_join,
        )
        self.dedup = SimpleNamespace(
            exact=_dedup.exact_dedup_groups,
            jaccard_pairs=_dedup.ngram_jaccard_pairs,
            minhash_pairs=_dedup.minhash_lsh_pairs,
            simhash_fingerprints=_dedup.simhash_fingerprints,
            simhash_pairs=_dedup.simhash_neardup_pairs,
            incremental=_dedup.IncrementalDedup,
            incremental_lsh=_dedup.IncrementalLsh,
            labels_index=_cluster_index.NearDupLabels,
            dup_spans=_substring.duplicate_spans,
            dup_span_stats=_substring.dup_span_stats,
            remove_dup_spans=_substring.remove_duplicate_spans,
            substring_index=_substring.SubstringDupIndex,
            incremental_substring=_substring.IncrementalSubstringDedup,
        )
        self.graph = SimpleNamespace(
            components=_graph.connected_components,
            sizes=_graph.component_sizes,
            keep_best=_graph.component_representatives,
            pagerank=_graph.pagerank,
        )
        self.similarity = SimpleNamespace(
            topk=_similarity.cosine_topk,
            neardup_pairs=_similarity.cosine_neardup_pairs,
            knn_1nn=_similarity.cosine_1nn_gemm,
            ivf_topk=_similarity.ivf_topk,
            lsh_topk=_similarity.lsh_topk,
            semantic_dedup=_similarity.semantic_dedup,
            index=_similarity.IvfIndex,
            incremental=_similarity.IncrementalEmbeddingDedup,
            quantize=_similarity.quantize_embeddings,
            jl_project=_similarity.jl_project,
            pca_fit=_pca.pca_fit,
            pca_project=_pca.pca_project,
            pq_train=_pq.pq_train,
            pq_encode=_pq.pq_encode,
            pq_decode=_pq.pq_decode,
            pq_topk=_pq.pq_topk,
            ivfpq_topk=_pq.ivfpq_topk,
            pq_residual_codebook=_pq.residual_codebook,
            pq_residual_encode=_pq.residual_encode,
            adc_probe_topk=_pq.adc_probe_topk,
        )
        self.text = SimpleNamespace(
            tokens=_text.tokens_col,
            token_count=_text.token_count,
            quality_score=_text.quality_score,
            lang_id=_text.lang_id,
            normalize=_text.normalize_text,
            fingerprint=_text.fingerprint,
            kgram_fingerprints=_text.kgram_fingerprints,
            gopher_quality=_text.gopher_quality,
            gopher_pass=_text.gopher_pass_col,
            compression_ratio=_text.compression_ratio,
            stats=_text.text_stats,
            sentences=_sentences.split_sentences,
            is_valid_email=_email.is_valid_email_col,
        )
        self.curate = SimpleNamespace(
            pack_sequences=_curation.pack_sequences,
            contamination_check=_curation.contamination_check,
            decontaminate=_curation.decontaminate,
            repetition_stats=_curation.repetition_stats,
            stratified_sample=_curation.stratified_sample,
            sample_exact_n=_curation.sample_exact_n,
            sample_weighted=_curation.sample_weighted_n,
            length_quantile_filter=_curation.length_quantile_filter,
            chunk=_curation.chunk_documents,
            source_mix=_curation.source_mix,
            temperature_mix=_curation.temperature_mix,
            cap_per_source=_curation.cap_per_source,
            shard=_curation.shard_corpus,
            write_sharded=_curation.write_sharded,
            strip_boilerplate=_curation.strip_shared_boilerplate,
            lm_score=_curation.ngram_lm_score,
            dsir_select=_curation.dsir_select,
            dsir_model=_curation.DsirModel,
            dsir_admitter=_curation.DsirAdmitter,
            nb_quality=_quality_nb.nb_quality_train_score,
            nb_quality_model=_quality_nb.NbQualityModel,
            nb_quality_admitter=_quality_nb.NbQualityAdmitter,
            nb_threshold_sweep=_quality_nb.nb_threshold_sweep,
            blocklist_filter=_curation.blocklist_filter,
            blocklist_admitter=_curation.BlocklistAdmitter,
            bpe_train=_bpe.bpe_train,
            bpe_tokenizer=_bpe.BpeTokenizer,
            unigram_train=_unigram.unigram_train,
            unigram_tokenizer=_unigram.UnigramTokenizer,
            heavy_hitters=_sketch.heavy_hitters,
            profile=_profile.profile_table,
        )
        self.analytics = SimpleNamespace(
            funnel=_analytics.funnel,
            funnel_one_pass=_analytics.funnel_one_pass,
            cohort_retention=_analytics.cohort_retention,
            anomalies=_analytics.daily_metric_anomalies,
            gap_fill=_analytics.gap_fill,
            salted_join=_skew.salted_join,
            salted_aggregate=_skew.salted_aggregate,
            materialized_aggregate=_ivm.MaterializedAggregate,
        )
        self.rank = SimpleNamespace(
            tfidf_top_terms=_ranking.tfidf_top_terms,
            bm25_topk=_ranking.bm25_topk,
        )
        self.ingest = SimpleNamespace(
            incremental_extract=_ingest.incremental_extract,
            tables=_ingest.ingest_tables,
            watermarks=_watermark.WatermarkStore,
            rescue_read=_rescue.read_bronze_stream,
            read_jsonl=_jsonl.read_jsonl,
            jsonl_documents=_jsonl.jsonl_documents,
            write_partitioned=_layout.write_partitioned,
            write_bucketed=_layout.write_bucketed,
            write_zordered=_layout.write_zordered,
            compact_partition=_layout.compact_partition,
        )
        self.stream = SimpleNamespace(
            dedup=_silver.dedup_stream,
            silver=_silver.SilverTable,
            write_silver=_silver.write_silver_stream,
            cdc_flow=_gold.CdcFlow,
            snapshot_table=_gold.ParquetSnapshotTable,
            sessionize=_stateful.sessionize_stream,
            quota_admit=_stateful.quota_admit_stream,
            funnel=_stream_funnel.funnel_stage_stream,
            asof_enrich=_stream_asof.asof_enrich_stream,
            admission=_admission.run_admission_stream,
            chained=_admission.ChainedAdmitter,
            bound=_admission.BoundAdmitter,
            rewrite_stage=_substring.SubstringRewriteStage,
            read_admitted=_admission.read_admitted,
            anomaly_monitor=_anomaly.AnomalyMonitor,
        )

    # -- catalog conveniences ------------------------------------------
    def table(self, name: str) -> DataFrame:
        """Load a catalog table (``region nation customer supplier part
        orders lineitem events documents embeddings`` in the test
        layout, or any ``<name>.parquet``/``<name>/`` under data_dir)."""
        return self.catalog.load(name)

    def sql(self, query: str, **tables: DataFrame):
        """Run SQL over catalog tables; pass extra DataFrames as
        keyword views. Views that did not exist before the call are
        dropped again after it (``spark.sql`` resolves them eagerly, so
        the returned DataFrame keeps working); a pre-existing temp view
        with the same name is REPLACED for the session — pick fresh
        names if you need to keep yours. A kwarg that collides with a
        PERMANENT catalog table raises: the temp view would shadow that
        table for every later query in the session (temp views resolve
        first), which is never what the caller meant."""
        # catalog enumeration only when kwarg views are passed (the
        # no-kwarg convenience path stays one spark.sql call); Spark
        # identifiers are case-insensitive by default, so compare folded
        pre_temp = (
            {
                t.name.lower()
                for t in self.spark.catalog.listTables()
                if t.tableType == "TEMPORARY"
                and t.namespace in (None, [], ())
            }
            if tables
            else set()
        )
        created = []
        try:
            for name, df in tables.items():
                if name.lower() not in pre_temp and self.spark.catalog.tableExists(
                    name
                ):
                    raise ValueError(
                        f"Engine.sql view {name!r} collides with a permanent "
                        "catalog table — the temp view would shadow it for "
                        "the rest of the session; pick a different kwarg name"
                    )
                if name.lower() not in pre_temp:
                    created.append(name)
                df.createOrReplaceTempView(name)
            return self.spark.sql(query)
        finally:
            # drop created views even when the collision check or the
            # query itself raises — no view may outlive a failed call
            for name in created:
                self.spark.catalog.dropTempView(name)

    def run_log(self, path: str) -> RunLog:
        """Append-only run log (observability surface)."""
        return RunLog(self.spark, path)

    def funnel(
        self, workdir: str, run_id: "str | None" = None
    ) -> DataFrame:
        """THE funnel reader (r12): per-stage admitted/rejected rows
        for every run recorded under ``<workdir>/funnel`` — streaming
        epochs (:meth:`curation_stream` lands one per epoch) and batch
        pipeline runs (:meth:`...observability.AdmissionFunnelLog.
        record_pipeline` bridges a :class:`...plans.pipeline.Pipeline`
        run's audit counts into the same table) share one schema, so a
        user queries ONE shape instead of two. ``run_id`` narrows to a
        single run."""
        from .observability import AdmissionFunnelLog

        import os as _os

        return AdmissionFunnelLog(
            self.spark, _os.path.join(workdir, "funnel")
        ).read(run_id)

    # -- unified retraction over persisted artifacts --------------------
    def register_artifact(self, artifact, name: str | None = None) -> str:
        """Register a persisted artifact (NearDupLabels, IvfIndex,
        SemanticDedupIndex, SubstringDupIndex, or anything exposing a
        ``remove(ids[, run_id])`` method) for unified retraction via
        :meth:`remove_document`. Returns the registry name (default
        ``ClassName:path``). Registering a second artifact under an
        existing name raises — a silent replace would drop one
        artifact from every future GDPR fan-out."""
        rm = getattr(artifact, "remove", None)
        if not callable(rm):
            raise TypeError(
                "register_artifact: artifact has no callable remove() — "
                f"got {type(artifact).__name__}"
            )
        if name is None:
            path = getattr(artifact, "path", None)
            name = type(artifact).__name__ + (f":{path}" if path else "")
        if name in self.artifacts:
            raise ValueError(
                f"register_artifact: {name!r} is already registered; "
                "pass an explicit name to keep both"
            )
        self.artifacts[name] = artifact
        return name

    def remove_document(
        self, ids, run_id: str | None = None
    ) -> dict[str, dict]:
        """Retract documents from EVERY registered artifact in one call
        — the API a right-to-be-forgotten pipeline actually invokes.
        ``ids`` is a DataFrame whose first column is the doc/vector id,
        or a plain iterable of ints. Returns ``{artifact_name:
        {"class": ..., "result": <that artifact's remove() return>}}``
        so the caller can log per-artifact evidence.

        ``run_id`` is REQUIRED when any registered artifact's
        ``remove`` takes one (NearDupLabels — its exactly-once
        committed-replay contract needs the caller's ledger id;
        synthesizing one here would make a re-invoked crashed fan-out
        look like a fresh request). Artifacts whose ``remove`` is
        signature-less stay idempotent by construction and ignore it.
        The fan-out itself is resumable for the same reason: re-calling
        with the same ids and run_id is a no-op on every artifact
        (committed-replay for NearDupLabels, already-gone rows for the
        rest), so a crash between artifacts is retried by re-invoking.
        """
        import inspect

        if not isinstance(ids, DataFrame):
            ids = self.spark.createDataFrame(
                [(int(i),) for i in ids], "doc_id long"
            )
        takers = {
            name: "run_id"
            in inspect.signature(art.remove).parameters
            for name, art in self.artifacts.items()
        }
        if run_id is None and any(takers.values()):
            need = sorted(n for n, t in takers.items() if t)
            raise ValueError(
                "remove_document: run_id is required — registered "
                f"artifact(s) {need} use it for exactly-once replay "
                "attribution"
            )
        # materialize once: every artifact's remove re-reads the id set
        ids = ids.localCheckpoint(eager=True)
        out: dict[str, dict] = {}
        for name, art in self.artifacts.items():
            result = (
                art.remove(ids, run_id=run_id)
                if takers[name]
                else art.remove(ids)
            )
            out[name] = {"class": type(art).__name__, "result": result}
        return out

    def curation_stream(
        self,
        source: DataFrame,
        workdir: str,
        *,
        blocklist: "tuple[str, ...] | None" = None,
        max_blocked_ppm: int = 40000,
        nb_model=None,
        nb_min_score_nano: int = 0,
        exact: bool = True,
        near_dup: bool = True,
        lsh_threshold: float = 0.5,
        rewrite: bool = True,
        max_dup_frac: float = 1.0,
        max_live_runs: "int | None" = None,
        embeddings: "DataFrame | None" = None,
        semantic_threshold: float = 0.85,
        semantic_k: int = 64,
        semantic_iters: int = 2,
        missing_embedding: str = "error",
        extra_stages: "tuple" = (),
        funnel: bool = True,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        """One-call STREAMING twin of :func:`...plans.llm_corpus.
        build_llm_corpus_pipeline`'s gate chain: build the standard
        curation gates (blocklist → NB quality → exact dedup → LSH
        near-dup → [extra_stages] → substring rewrite) over per-gate
        state under ``<workdir>/state/``, then run ONE checkpointed
        ``availableNow`` admission pass of ``source`` (checkpoint
        ``<workdir>/_checkpoint``, admitted corpus
        ``<workdir>/admitted`` — read it back with
        ``stream.read_admitted``). Exactly-once END-TO-END across all
        gates: one checkpoint, one per-epoch run_id threaded through
        the whole :class:`...streaming.admission.ChainedAdmitter`
        (see its docstring for the crash-replay induction).

        Gates are included only when configured: ``blocklist`` tuple
        enables the C4 gate; a trained ``NbQualityModel`` enables the
        quality gate (training is an offline batch step — fit one with
        ``curate.nb_quality_model``; its trained id/text columns are
        validated against this stream's ``id_col``/``text_col`` at
        construction — a model fit on other columns would otherwise
        silently gate the wrong column); ``exact``/``near_dup``/
        ``rewrite`` toggle the dedup tiers. An ``embeddings``
        DataFrame (keyed on ``id_col``, vector column ``embedding``)
        enables the SEMANTIC gate in one call (r11): a
        :class:`...streaming.admission.SemanticGateStage` joins the
        embeddings per batch (one equi-join on the id — O(epoch), no
        corpus shuffle), runs an
        :class:`...operators.similarity.IncrementalSemanticDedup`
        over ``<workdir>/state/semantic`` at ``semantic_threshold``,
        and drops the vector column again; ``missing_embedding``
        picks 'error' (default) or 'admit' for docs without an
        embedding row. Pre-joined/custom semantic flows keep working
        through ``extra_stages`` (inserted after the semantic gate,
        before the rewrite). The batch pipeline's mix/shards stages
        are corpus-global re-balancing, not per-batch gates — run
        them as batch post-processing over the admitted corpus.

        ``funnel`` (default on, r11): per-epoch per-gate admitted/
        rejected counts — recorded on the returned chain
        (``chain.funnels``) and landed in the
        :class:`...observability.AdmissionFunnelLog` at
        ``<workdir>/funnel`` after each epoch's corpus partition
        commits (idempotent per-run overwrite; a crash-replayed epoch
        rewrites an identical funnel). Read it back with
        ``AdmissionFunnelLog(spark, f"{workdir}/funnel").read()``.

        Returns the ``ChainedAdmitter`` — call ``curation_stream``
        again after new source files land (same ``workdir``) and the
        same chain state + checkpoint continue where they left off.

        ``max_live_runs``: the auto-compaction policy
        (:func:`...operators.compaction.maybe_autocompact`) for the
        chain's run-partitioned artifact (the substring index): at
        streaming cadence its per-epoch ``run=`` partitions fold
        themselves under ``compact-auto-<run_id>`` whenever an
        admission commit pushes the live count past the threshold, so
        a long-running curation stream's file listings stay bounded
        with no manual ``compact()`` call.

        Scale: per-epoch cost is the sum of the member gates
        (each O(batch × log state)); the admitted corpus lands
        epoch-partitioned for pruned downstream reads.
        """
        import os as _os

        from .observability import AdmissionFunnelLog
        from .operators.curation import BlocklistAdmitter
        from .operators.dedup import IncrementalDedup, IncrementalLsh
        from .operators.quality_nb import NbQualityAdmitter
        from .operators.substring import SubstringRewriteStage
        from .streaming.admission import (
            BoundAdmitter,
            ChainedAdmitter,
            SemanticGateStage,
            run_admission_stream,
        )

        if nb_model is not None:
            m = nb_model._meta()
            if (m.id_col, m.text_col) != (id_col, text_col):
                raise ValueError(
                    "curation_stream: nb_model was trained on columns "
                    f"(id={m.id_col!r}, text={m.text_col!r}) but this "
                    f"stream curates (id={id_col!r}, text={text_col!r}) "
                    "— a mismatched model would gate the wrong column; "
                    "fit the model on the stream's columns"
                )
        state = _os.path.join(workdir, "state")
        stages: list = []
        if blocklist:
            stages.append((
                "blocklist",
                BlocklistAdmitter(
                    blocklist,
                    max_blocked_ppm=max_blocked_ppm,
                    text_col=text_col,
                    id_col=id_col,
                ),
            ))
        if nb_model is not None:
            stages.append((
                "nb_quality",
                NbQualityAdmitter(
                    nb_model, min_score_nano=nb_min_score_nano
                ),
            ))
        if exact:
            stages.append((
                "dedup_exact",
                BoundAdmitter(
                    IncrementalDedup(
                        self.spark, _os.path.join(state, "exact")
                    ),
                    text_col=text_col,
                    id_col=id_col,
                ),
            ))
        if near_dup:
            stages.append((
                "dedup_near",
                BoundAdmitter(
                    IncrementalLsh(
                        self.spark,
                        _os.path.join(state, "lsh"),
                        threshold=lsh_threshold,
                    ),
                    text_col=text_col,
                    id_col=id_col,
                ),
            ))
        if embeddings is not None:
            from .operators.similarity import IncrementalSemanticDedup

            stages.append((
                "semantic",
                SemanticGateStage(
                    IncrementalSemanticDedup(
                        self.spark,
                        _os.path.join(state, "semantic"),
                        threshold=semantic_threshold,
                        k=semantic_k,
                        iters=semantic_iters,
                        id_col=id_col,
                        max_live_runs=max_live_runs,
                    ),
                    embeddings,
                    id_col=id_col,
                    missing_embedding=missing_embedding,
                ),
            ))
        stages.extend(extra_stages)
        if rewrite:
            stages.append((
                "rewrite_spans",
                SubstringRewriteStage(
                    self.spark,
                    _os.path.join(state, "substring"),
                    max_dup_frac=max_dup_frac,
                    id_col=id_col,
                    text_col=text_col,
                    max_live_runs=max_live_runs,
                ),
            ))
        chain = ChainedAdmitter(stages, funnel=funnel)
        run_admission_stream(
            source,
            chain,
            _os.path.join(workdir, "admitted"),
            _os.path.join(workdir, "_checkpoint"),
            funnel_log=(
                AdmissionFunnelLog(
                    self.spark, _os.path.join(workdir, "funnel")
                )
                if funnel
                else None
            ),
        )
        return chain

    def compact_artifacts(self, tag: str) -> dict[str, dict]:
        """Run crash-safe ``compact`` on every registered artifact that
        supports it, in one maintenance call (the lifecycle twin of
        :meth:`remove_document`): run-partitioned artifacts fold their
        committed run partitions into one consolidated ``run=<tag>``
        partition; IvfIndex (whose compact is file-level and tag-less)
        rewrites each bucket to one file. ``tag`` must start with
        ``compact-``; retrying a crashed fan-out with the SAME tag
        resumes it on every artifact. Single-writer: quiesce
        admissions/removals first. Returns a per-artifact summary."""
        import inspect

        out: dict[str, dict] = {}
        for name, art in self.artifacts.items():
            fn = getattr(art, "compact", None)
            if not callable(fn):
                out[name] = {
                    "class": type(art).__name__,
                    "result": None,
                    "skipped": "no compact()",
                }
                continue
            result = (
                fn(tag)
                if "tag" in inspect.signature(fn).parameters
                else fn()
            )
            out[name] = {"class": type(art).__name__, "result": result}
        return out
