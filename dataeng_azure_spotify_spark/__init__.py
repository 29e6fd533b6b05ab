"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference medallion ETL platform
(Ch3rry-Pi3-Data-Engineering/DataEng-Azure-Spotify, surveyed in SURVEY.md).

Built Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
Structured Streaming for the incremental layers, Pandas UDFs only where
built-in operators cannot express the semantics. Designed for a large
multi-executor cluster (partition-aware, broadcast-aware, AQE on) even
though tests run on local[N].
"""

from dataeng_azure_spotify_spark.session import get_spark
from dataeng_azure_spotify_spark.catalog import Catalog, TABLES


def __getattr__(name):
    # Engine imports most of the package; lazy so `import
    # dataeng_azure_spotify_spark` stays light for module-level users
    if name == "Engine":
        from dataeng_azure_spotify_spark.engine import Engine

        return Engine
    raise AttributeError(name)


__all__ = ["get_spark", "Catalog", "TABLES", "Engine"]
__version__ = "0.1.0"
