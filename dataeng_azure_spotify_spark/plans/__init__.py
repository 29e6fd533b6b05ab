"""Query-plan / orchestration layer: star-query builder (Jinja SQL + DataFrame)
and the declarative pipeline runner (the DLT analogue)."""

from dataeng_azure_spotify_spark.plans.star_query import (
    JoinSpec,
    StarQuery,
    build_star_dataframe,
    render_star_sql,
)
from dataeng_azure_spotify_spark.plans.pipeline import Pipeline, Transformation

__all__ = [
    "JoinSpec",
    "StarQuery",
    "build_star_dataframe",
    "render_star_sql",
    "Pipeline",
    "Transformation",
]
