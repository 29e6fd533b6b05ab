"""Run-log + alerting analogue of the reference's monitoring stack
(SURVEY.md §2.11).

Parity: the reference ships pipeline run status to Azure Log Analytics
and fires scheduled KQL alert rules on ``status == "Failed" |
"Succeeded"`` over 5-minute windows (``terraform/07_monitoring/main.tf:
38-56`` queries, :93-135 rules; reference ``README.md:152-155``).

Spark-native mapping: every engine run appends one row to a parquet
run-log table via :class:`RunLog`; a ``StreamingQueryListener``
(:class:`QueryRunListener`) captures streaming progress events the same
way. The KQL alert queries become plain DataFrame queries over the log
(:func:`failed_runs_last`), runnable on a schedule by any cron/driver.
"""

from __future__ import annotations

import datetime as dt
import traceback
from typing import Any, Callable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RUN_LOG_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("component", StringType(), False),
        StructField("status", StringType(), False),  # Succeeded | Failed
        StructField("started_at", TimestampType(), False),
        StructField("ended_at", TimestampType(), False),
        StructField("rows_processed", LongType(), True),
        StructField("error", StringType(), True),
    ]
)


class RunLog:
    """Append-only parquet run log (the Log Analytics table analogue)."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def record(
        self,
        run_id: str,
        component: str,
        status: str,
        started_at: dt.datetime,
        ended_at: dt.datetime,
        rows_processed: int | None = None,
        error: str | None = None,
    ) -> None:
        row = [(run_id, component, status, started_at, ended_at, rows_processed, error)]
        self.spark.createDataFrame(row, RUN_LOG_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)

    def timed(self, run_id: str, component: str, fn: Callable[[], Any]) -> Any:
        """Run ``fn`` and record Succeeded/Failed with timing — the
        engine-side equivalent of ADF activity status reporting."""
        start = dt.datetime.utcnow()
        try:
            result = fn()
        except Exception:
            self.record(
                run_id, component, "Failed", start, dt.datetime.utcnow(),
                error=traceback.format_exc(limit=3),
            )
            raise
        rows = result if isinstance(result, int) else None
        self.record(run_id, component, "Succeeded", start, dt.datetime.utcnow(), rows)
        return result

    def read(self) -> DataFrame:
        from dataeng_azure_spotify_spark.statefs import statefs_for

        if not statefs_for(self.path, self.spark).exists(self.path):
            # fresh deployment: the alert query runs BEFORE the first
            # run is recorded — an empty log, not a crashed monitor
            return self.spark.createDataFrame([], RUN_LOG_SCHEMA)
        return self.spark.read.schema(RUN_LOG_SCHEMA).parquet(self.path)


FUNNEL_LOG_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage_idx", LongType(), False),
        StructField("stage", StringType(), False),
        StructField("n_in", LongType(), False),
        StructField("n_admitted", LongType(), False),
        StructField("n_rejected", LongType(), False),
    ]
)


class AdmissionFunnelLog:
    """Per-epoch, per-gate admission funnel table (r11) — the streaming
    twin of the batch curation pipeline's per-stage audit counts
    (``plans/llm_corpus.py``): one row per (run_id, gate) with entered/
    admitted/rejected counts, written as its own ``run=<run_id>``
    partition via idempotent overwrite — a crash-replayed epoch
    reproduces an identical funnel (the chain's replay convergence)
    and rewrites an identical partition, never duplicate rows. Empty
    until the first funnel-enabled epoch commits."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        from dataeng_azure_spotify_spark.statefs import statefs_for

        self.spark = spark
        self.path = path
        self.fs = statefs_for(path, spark)

    @staticmethod
    def _safe_run_id(run_id: str) -> str:
        """``run_id`` names an output directory — the shared
        artifact-tier traversal guard applies ('/' or '..' would write
        outside the funnel dir and break the recursive read)."""
        from dataeng_azure_spotify_spark.statefs import validate_run_id

        return validate_run_id(run_id, what="funnel")

    def record(self, run_id: str, rows: "list[dict]") -> None:
        """Land one epoch's funnel (chain-ordered gate dicts with
        ``stage``/``n_in``/``n_admitted``/``n_rejected`` keys, as
        :class:`...streaming.admission.ChainedAdmitter` produces).
        The per-run directory deliberately avoids ``run=`` naming:
        ``run_id`` is already a data column, and partition inference
        on an identically-named directory key would collide."""
        run_id = self._safe_run_id(run_id)
        data = [
            (
                str(run_id),
                int(i),
                str(r["stage"]),
                int(r["n_in"]),
                int(r["n_admitted"]),
                int(r["n_rejected"]),
            )
            for i, r in enumerate(rows)
        ]
        (
            self.spark.createDataFrame(data, FUNNEL_LOG_SCHEMA)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{self.path}/r-{run_id}")
        )

    def record_pipeline(
        self,
        run_id: str,
        n_input: int,
        stage_counts: "Mapping[str, int]",
    ) -> None:
        """Land a BATCH pipeline run's per-stage audit counts under
        the SAME schema the streaming chain uses (r12, one funnel
        surface for both halves): ``stage_counts`` is the ordered
        ``{stage: surviving_rows}`` map a LINEAR
        :meth:`...plans.pipeline.Pipeline.run` returns (stages in
        execution order — Python dicts preserve it), ``n_input`` the
        row count fed to the first stage. Each stage's ``n_in`` is
        the previous entry's survivor count, so the recorded funnel
        telescopes exactly like the streaming one. Idempotent
        per-run overwrite, same as :meth:`record`.

        LINEAR CHAINS ONLY: the telescoping inference assumes each
        stage consumes the previous entry's output (true of
        ``plans/llm_corpus.py``, the primary producer). A BRANCHING
        DAG (two gates both reading one upstream stage) would record
        the wrong ``n_in`` for the second branch — pass explicit
        per-stage dicts through :meth:`record` for those instead.

        Non-monotone stages (a shard/explode stage can EMIT more rows
        than it read) record a negative ``n_rejected`` — faithful
        counts beat a clamped lie; dashboards can floor at 0."""
        rows = []
        n_in = int(n_input)
        for stage, n_out in stage_counts.items():
            n_out = int(n_out)
            rows.append(
                {
                    "stage": str(stage),
                    "n_in": n_in,
                    "n_admitted": n_out,
                    "n_rejected": n_in - n_out,
                }
            )
            n_in = n_out
        self.record(run_id, rows)

    def read(self, run_id: "str | None" = None) -> DataFrame:
        """All recorded funnels — batch and streaming runs share one
        schema, so one reader serves both. ``run_id`` filters to one
        run's rows (still ordered by ``stage_idx``)."""
        if not self.fs.exists(self.path):
            out = self.spark.createDataFrame([], FUNNEL_LOG_SCHEMA)
        else:
            out = (
                self.spark.read.schema(FUNNEL_LOG_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(self.path)
            )
        if run_id is not None:
            out = out.filter(F.col("run_id") == self._safe_run_id(run_id))
        return out


def failed_runs_last(log: RunLog, minutes: int = 5) -> DataFrame:
    """The KQL alert query re-expressed (status == 'Failed', 5-min window,
    reference ``terraform/07_monitoring/main.tf:38-56``)."""
    cutoff = dt.datetime.utcnow() - dt.timedelta(minutes=minutes)
    return (
        log.read()
        .filter((F.col("status") == "Failed") & (F.col("ended_at") >= F.lit(cutoff)))
        .groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("failures"))
    )


class QueryRunListener:
    """StreamingQueryListener recording per-query progress into a RunLog.

    Attach with ``spark.streams.addListener(QueryRunListener(log))``.
    """

    def __new__(cls, log: RunLog):
        from pyspark.sql.streaming import StreamingQueryListener

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):  # noqa: N802
                self._starts = getattr(self, "_starts", {})
                self._starts[event.id] = dt.datetime.utcnow()

            def onQueryProgress(self, event):  # noqa: N802
                pass

            def onQueryIdle(self, event):  # noqa: N802
                pass

            def onQueryTerminated(self, event):  # noqa: N802
                started = getattr(self, "_starts", {}).pop(
                    event.id, dt.datetime.utcnow()
                )
                status = "Failed" if event.exception else "Succeeded"
                log.record(
                    str(event.id), "streaming_query", status,
                    started, dt.datetime.utcnow(),
                    error=event.exception,
                )

        return _Listener()
