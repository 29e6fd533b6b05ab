"""Optional Delta Lake backend probe + session wiring.

The reference's silver/gold layers are Delta end-to-end:
``writeStream.format('delta')...toTable(...)`` sinks
(``local_spotify_dab/src/silver/Silver_Dimensions.py:591-601``) and DLT
CDC merges over Delta tables (``.../gold/spotify_etl/transformations/
FactStream.py:93-103``). OSS ``delta-spark`` provides the same format
and ``DeltaTable.merge`` API; this sandbox doesn't ship it, so every
Delta feature in this engine is gated on :func:`delta_available` with a
parquet-based fallback carrying the same semantics
(``streaming.gold.ParquetSnapshotTable``, parquet file-sink commit logs).

On a Delta-capable cluster nothing changes in caller code: sessions pick
up the Delta SQL extension automatically, ``fmt='delta'`` sinks become
real, and ``CdcFlow(backend='auto')`` resolves to transactional MERGE.

Installation status (checked 2026-08-13, round 4): installing
``delta-spark`` in this sandbox is not possible —

1. package installation is prohibited by the environment contract
   (no ``pip install`` / ``apt install``; only baked-in packages);
2. there is no package index reachable anyway: ``pip download
   delta-spark --no-deps`` returns nothing (empty target dir); and
3. even with the Python package present, the Delta *format* needs the
   JVM artifact ``io.delta:delta-spark_2.13`` resolved from Maven at
   session start (``spark.jars.packages``) — no network, no jar, no
   format.

Hence the one skipped test (the Delta-backend leg) stays skipped here;
the gated code paths are exercised on any cluster where
``delta_available()`` is True.
"""

from __future__ import annotations

import importlib.util
from functools import lru_cache


@lru_cache(maxsize=1)
def delta_available() -> bool:
    """True iff the ``delta-spark`` package is importable."""
    return importlib.util.find_spec("delta") is not None


def delta_session_confs() -> dict[str, str]:
    """Builder configs enabling Delta SQL/catalog support (empty when the
    package is absent, so callers can apply unconditionally)."""
    if not delta_available():
        return {}
    return {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": (
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        ),
    }


def default_table_format() -> str:
    """The format streaming/table sinks use when the caller doesn't pin
    one: ``delta`` where available, else ``parquet`` (whose file-sink
    commit log supplies the same exactly-once append contract)."""
    return "delta" if delta_available() else "parquet"
