"""Parameterized star-join query builder.

Parity target: the reference's Jinja query layer (SURVEY.md §2.10 Q1,
§2.3 J1) — reference ``local_spotify_dab/Jinja/jinja_notebook.py``:
config list-of-dicts ``{table, alias, cols, condition}`` (:44-92), Jinja
template emitting ``SELECT <cols> FROM <fact> LEFT JOIN <dim> ON
<condition>`` in config order (:211-221), rendered (:273-288) and executed
via ``spark.sql`` (:332-334). LEFT JOIN is chosen so fact rows are never
dropped (:208-209).

Two equivalent frontends are provided:

- :func:`render_star_sql` — keeps the Jinja contract: same config shape in,
  ANSI SQL string out. Running it through ``spark.sql`` gives Catalyst the
  whole plan, so join reordering / broadcast selection are automatic.
- :func:`build_star_dataframe` — pure DataFrame composition with explicit
  ``broadcast()`` hints on small dimensions. At 100 TB the fact side must
  never shuffle for a dim lookup; broadcasting every dim keeps the star
  join a single scan-side stage (no exchange on the fact table).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from jinja2 import Template
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Same shape as the reference's template (jinja_notebook.py:211-221):
# first entry is the base/fact table, the rest LEFT JOIN in config order.
_STAR_TEMPLATE = Template(
    """SELECT {{ select_list | join(', ') }}
FROM {{ base.table }} AS {{ base.alias }}
{%- for t in joins %}
LEFT JOIN {{ t.table }} AS {{ t.alias }} ON {{ t.condition }}
{%- endfor %}"""
)


@dataclass
class JoinSpec:
    """One table entry in a star query — mirrors the reference's
    ``{table, alias, cols, condition}`` dicts (jinja_notebook.py:44-92)."""

    table: str
    alias: str
    cols: list[str]
    condition: str | None = None  # None for the base (fact) table
    broadcast: bool = False  # hint: small dim, ship to every executor


@dataclass
class StarQuery:
    specs: list[JoinSpec] = field(default_factory=list)

    def sql(self) -> str:
        return render_star_sql(self.specs)

    def dataframe(self, spark: SparkSession) -> DataFrame:
        return build_star_dataframe(spark, self.specs)


def render_star_sql(specs: list[JoinSpec]) -> str:
    """Render the star query to a SQL string (Jinja path, Q1 parity)."""
    if not specs:
        raise ValueError("star query needs at least a base table spec")
    for t in specs[1:]:
        if not t.condition:
            raise ValueError(f"joined table {t.table} needs a join condition")
    select_list = [f"{t.alias}.{c}" for t in specs for c in t.cols]
    return _STAR_TEMPLATE.render(
        select_list=select_list, base=specs[0], joins=specs[1:]
    )


def build_star_dataframe(spark: SparkSession, specs: list[JoinSpec]) -> DataFrame:
    """DataFrame twin of the rendered SQL with explicit broadcast hints.

    LEFT JOIN semantics in config order (reference jinja_notebook.py:216-220).
    Each dim marked ``broadcast=True`` is hinted so the fact table is never
    shuffled for that join — on a 1000-executor cluster this keeps the whole
    star join inside one whole-stage-codegen span over the fact scan.
    """
    if not specs:
        raise ValueError("star query needs at least a base table spec")
    base = specs[0]
    df = spark.table(base.table).alias(base.alias)
    for t in specs[1:]:
        right = spark.table(t.table).alias(t.alias)
        if t.broadcast:
            right = F.broadcast(right)
        df = df.join(right, on=F.expr(t.condition), how="left")
    cols = [F.col(f"{t.alias}.{c}") for t in specs for c in t.cols]
    return df.select(*cols)
