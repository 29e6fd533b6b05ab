"""Table registry over parquet directories.

Plays the role of the reference's Unity Catalog three-level namespace
(``spotify.silver.dim_user`` etc. — reference
``terraform/10_databricks_uc/main.tf:26-84``,
``local_spotify_dab/src/silver/Silver_Dimensions.py:591``) and of its
external-location path resolution (``Silver_Dimensions.py:82-170``,
SURVEY.md §2.1 S12): names resolve to storage paths via config, with an
environment-variable fallback, instead of UC ``DESCRIBE EXTERNAL LOCATION``.

At 100 TB each "table" is a partitioned parquet/Delta directory; the scan
still goes through ``spark.read.parquet`` so partition pruning, predicate
pushdown and column pruning apply unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The driver-provided corpus (TESTDATA.md). TPC-H-ish star schema +
#: an events stream table + LLM-pipeline tables (documents, embeddings).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables: always broadcast-eligible in star joins.
SMALL_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Resolve table names to DataFrames over a parquet directory tree.

    ``sf_dir`` is the root holding ``<table>.parquet`` files (driver layout)
    or ``<table>/`` directories (engine-written layout) — both resolve.
    """

    def __init__(self, spark: SparkSession, sf_dir: str | None = None) -> None:
        self.spark = spark
        self.sf_dir = sf_dir or DEFAULT_SF_DIR
        self._cache: dict[str, DataFrame] = {}
        # Pin the session timezone here as well as in session.get_spark:
        # externally-built sessions (the driver's oracle harness) otherwise
        # inherit the host TZ, shifting day/window boundaries in
        # date_format/window queries away from the timezone-naive DuckDB
        # oracle on any non-UTC machine.
        self.spark.conf.set("spark.sql.session.timeZone", "UTC")

    def path(self, name: str) -> str:
        from dataeng_azure_spotify_spark.statefs import statefs_for

        flat = os.path.join(self.sf_dir, f"{name}.parquet")
        nested = os.path.join(self.sf_dir, name)
        if statefs_for(flat, self.spark).exists(flat):
            return flat
        return nested

    def load(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = self._read(self.path(name))
        return self._cache[name]

    def _read(self, path: str) -> DataFrame:
        """Read parquet, normalizing nanosecond timestamps to Spark's
        microsecond TimestampType.

        Some writers emit parquet ``TIMESTAMP(NANOS)`` (e.g. pandas/arrow
        defaults), which Spark rejects outright. We read those columns as
        raw nanosecond longs (``spark.sql.legacy.parquet.nanosAsLong``) and
        floor-convert to microseconds — the same truncation DuckDB applies
        when casting TIMESTAMP_NS to TIMESTAMP, so both engines agree.

        Note: the conversion expression sits between predicates and the
        scan, so timestamp filters on converted columns evaluate inside
        the vectorized scan stage but cannot prune row groups. This only
        affects FOREIGN nanos files — the engine's own writers emit
        microsecond timestamps, where the same predicates reach
        ``PushedFilters`` (asserted in tests/test_plans.py).
        """
        ns_cols = _nanos_timestamp_cols(path)
        if not ns_cols:
            return self.spark.read.parquet(path)
        # NOTE: the conf stays set for the session — the returned frame
        # is lazy and its scan re-resolves parquet types at execution,
        # so a save/restore here would corrupt later actions on it.
        # Session-wide effect: OTHER nanos files read outside the
        # catalog will also surface as longs instead of erroring.
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df

    def register_all(self, tables: tuple[str, ...] = TABLES) -> None:
        """Register every table as a temp view so ``spark.sql`` works —
        the reference's Jinja query layer executes rendered SQL strings
        against catalog tables (``Jinja/jinja_notebook.py:332-334``).

        Strict: a missing table raises instead of silently leaving a stale
        temp view from a prior registration in place (a silent fallback to
        old data is the worst failure mode an ETL catalog can have).
        """
        from dataeng_azure_spotify_spark.statefs import statefs_for

        for name in tables:
            p = self.path(name)
            if not statefs_for(p, self.spark).exists(p):
                raise FileNotFoundError(
                    f"table {name!r} not found under {self.sf_dir!r}"
                )
            self.load(name).createOrReplaceTempView(name)

    def __getitem__(self, name: str) -> DataFrame:
        return self.load(name)

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        bucket_cols: list[str],
        num_buckets: int = 16,
        sort_cols: list[str] | None = None,
    ) -> DataFrame:
        """Persist a table bucketed (and optionally sorted) by join key.

        Two tables bucketed on the same key with the same bucket count
        join with NO shuffle on either side (and no sort when sorted) —
        the co-located join strategy for repeated large-fact⋈large-fact
        joins at 100 TB, where re-shuffling the fact every query is the
        dominant cost. Bucket files are plain parquet + metastore bucket
        spec, so predicate pushdown/column pruning are unchanged.
        """
        writer = (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(name)
        return self.spark.table(name)


def ensure_database(spark: SparkSession, table_name: str) -> None:
    """Create the database of a ``db.table`` name if absent.

    Stands in for the reference's pre-provisioned UC schemas
    (``terraform/10_databricks_uc/main.tf:26-84`` creates ``silver`` /
    ``gold`` before any write) — on OSS metastores the namespace is one
    idempotent DDL away, so sinks create it on first use. No-op for
    unqualified names.
    """
    if "." in table_name:
        db = table_name.rsplit(".", 1)[0]
        # backtick-quote each namespace level: unquoted interpolation
        # turns catalog.db.table into CREATE DATABASE catalog.db (wrong
        # namespace) and breaks on names needing quoting. CREATE
        # NAMESPACE handles multi-level names where the catalog does.
        quoted = ".".join(
            "`" + part.replace("`", "``") + "`" for part in db.split(".")
        )
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {quoted}")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (driver-side footer peek)."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []
