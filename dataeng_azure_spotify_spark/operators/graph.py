"""Distributed connected components — the clustering step a dedup
pipeline needs AFTER pair generation (reference parity: the reference's
dedup stops at per-key ``dropDuplicates``; near-dup *clusters* are part
of the beyond-reference LLM-curation surface, composing with
``ngram_jaccard_pairs`` / ``minhash_lsh_pairs`` / ``simhash_neardup``).

Algorithm: iterative min-label propagation (Pregel-style) in pure
DataFrame algebra. Every node starts labeled with its own id; each round
replaces a node's label with the minimum over its own and its
neighbors' labels; a fixpoint means every node carries the smallest id
reachable from it — the canonical component id.

Scale notes (100 TB):

- Rounds needed = graph diameter. Near-dup graphs are piles of small
  dense clusters (diameter 2-4), so propagation converges in a handful
  of rounds; the per-round cost is one shuffled join edges⋈labels on
  ``dst`` plus one groupBy — both partition-parallel, nothing
  corpus-sized on the driver or in a broadcast.
- For adversarial high-diameter graphs (long chains), swap the body for
  the large-star/small-star edge-rewriting of Kiveris et al.
  ("Connected Components in MapReduce and Beyond", SoCC'14), which
  converges in O(log² n) rounds with the same join-per-round shape.
- Lineage is truncated each round with an eager ``localCheckpoint``
  (executor-side, no driver round-trip) — without it round k recomputes
  rounds 1..k-1 and the plan grows quadratically.
- The convergence probe is one tiny aggregate action per round
  (count of changed labels), the standard driver-coordinated fixpoint
  loop — the same shape as the k-means refinement in
  :mod:`..operators.similarity`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "node",
    max_iters: int = 25,
) -> DataFrame:
    """Component labels for an undirected graph.

    ``edges``: (src, dst) pairs, any orientation, duplicates fine.
    ``nodes``: optional (id_col) universe — isolated nodes (no edges)
    appear in the output as singleton components; defaults to the nodes
    present in ``edges``.

    Returns (``id_col``, component) where component is the smallest node
    id in the connected component — deterministic, engine-independent.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iters`` rounds (diameter bound exceeded — see module notes for
    the O(log² n) alternative).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # symmetrize once; self-loops are harmless but add join volume — drop
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if nodes is not None:
        universe = nodes.select(F.col(id_col).cast("long").alias("node")).distinct()
    else:
        universe = (
            und.select(F.col("src").alias("node"))
            .union(und.select(F.col("dst").alias("node")))
            .distinct()
        )
    und = und.localCheckpoint(eager=True)
    labels = universe.select("node", F.col("node").alias("component"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iters):
        # min incoming neighbor label per node, then fold in own label
        msgs = (
            und.join(labels, und["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_min"), F.col("component")) < F.col("component"))
                .alias("__changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.agg(
            F.sum(F.col("__changed").cast("long")).alias("n")
        ).first()["n"]
        labels = new_labels.drop("__changed")
        if not changed:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds; "
        "graph diameter exceeds the propagation budget — use the "
        "large-star/small-star variant for chain-heavy graphs"
    )


def component_sizes(labels: DataFrame, id_col: str = "node") -> DataFrame:
    """Attach per-component cardinality: (id_col, component, size)."""
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return labels.join(sizes, "component").select(id_col, "component", "size")
