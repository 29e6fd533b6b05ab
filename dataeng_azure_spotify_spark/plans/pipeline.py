"""Declarative transformation pipeline — the DLT analogue.

Parity target: the reference's gold DLT pipeline (SURVEY.md §3.3) —
``local_spotify_dab/resources/spotify_dab_etl.pipeline.yml:13-14`` globs a
``transformations/`` directory; each module declares staging views
(``spark.readStream.table``), streaming tables
(``dlt.create_streaming_table``) and CDC flows
(``dlt.create_auto_cdc_flow``); the DLT runtime resolves the dataset
dependency graph and runs flows in topological order.

Here: a :class:`Pipeline` holds named :class:`Transformation` nodes with
explicit ``depends_on`` edges; :meth:`Pipeline.run` topologically sorts and
executes each node's ``fn(spark)``. Nodes are plain callables so a node can
be a batch transform, a bounded ``availableNow`` streaming query, or an SCD
merge (engine.operators.scd).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any, Callable

from pyspark.sql import SparkSession


@dataclass
class Transformation:
    name: str
    fn: Callable[[SparkSession], Any]
    depends_on: tuple[str, ...] = ()
    description: str = ""


@dataclass
class Pipeline:
    """Topologically-ordered run of declared transformations.

    The reference runs its five gold flows on a shared DLT cluster with the
    graph ``silver.<t> → <t>_stg → gold.<t>`` (SURVEY.md §3.3 step 2); this
    runner executes independent branches sequentially for determinism —
    parallel branches are a driver-side concern (a ThreadPool over the
    ready set) and Spark schedules their jobs concurrently anyway.
    """

    name: str = "pipeline"
    _nodes: dict[str, Transformation] = field(default_factory=dict)

    def add(
        self,
        name: str,
        fn: Callable[[SparkSession], Any],
        depends_on: tuple[str, ...] = (),
        description: str = "",
    ) -> "Pipeline":
        if name in self._nodes:
            raise ValueError(f"duplicate transformation {name!r}")
        self._nodes[name] = Transformation(name, fn, tuple(depends_on), description)
        return self

    def transformation(self, name: str, depends_on: tuple[str, ...] = ()):
        """Decorator form, mirroring DLT's function-per-dataset style."""

        def deco(fn: Callable[[SparkSession], Any]):
            self.add(name, fn, depends_on, description=fn.__doc__ or "")
            return fn

        return deco

    def order(self) -> list[str]:
        graph = {n: set(t.depends_on) for n, t in self._nodes.items()}
        for node, deps in graph.items():
            missing = deps - graph.keys()
            if missing:
                raise ValueError(f"{node} depends on undeclared node(s) {missing}")
        return list(TopologicalSorter(graph).static_order())

    def run(self, spark: SparkSession) -> dict[str, Any]:
        results: dict[str, Any] = {}
        for name in self.order():
            results[name] = self._nodes[name].fn(spark)
        return results
