"""Hierarchy flattening — the recursive-CTE workload (org charts,
bill-of-materials, account rollup trees) Spark SQL cannot express
directly. Same engine mechanics as ``llm.cluster``'s iterative
min-label propagation: a driver loop over bounded-depth joins, each
round persisted + counted (the count is the loop's exit condition —
a deliberate, O(1)-result driver action, like connected_components').

Scale: each round is one equi-join of the still-walking rows against
the edge relation keyed on the child — shuffle ∝ unresolved rows,
which SHRINKS every round as rows reach their root; round count is
the tree DEPTH (organizational trees: ~10), never the node count.
Broadcast the edge relation when the hierarchy table is
dimension-sized (the common case) to make every round shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_hierarchy(
    edges: DataFrame,
    id_col: str = "node",
    parent_col: str = "parent",
    max_depth: int = 30,
    broadcast_edges: bool = True,
) -> DataFrame:
    """Resolve every node to its root: (node, root, depth, path) with
    ``path`` the root→node id chain ('0/3/25'). Roots are rows whose
    parent is NULL (depth 0, path = id). Raises after ``max_depth``
    rounds — a cycle or a deeper-than-expected tree; both deserve a
    loud failure, not an infinite loop.
    """
    # keep the caller's id type (numeric keys, string org codes, ...)
    # — a silent cast("long") would null out non-numeric hierarchies
    # and return structurally-valid nonsense
    e = edges.select(
        F.col(id_col).alias("__child"),
        F.col(parent_col).alias("__parent"),
    )
    if broadcast_edges:
        e = F.broadcast(e)
    state = edges.select(
        F.col(id_col).alias("node"),
        F.col(id_col).alias("cur"),
        F.lit(0).alias("depth"),
        F.col(id_col).cast("string").alias("path"),
    )
    resolved = None
    steps: list[DataFrame] = []
    try:
        for _ in range(max_depth):
            step = (
                state.join(e, state["cur"] == e["__child"], "left")
                .select(
                    "node",
                    F.col("__parent").alias("next"),
                    "depth",
                    "path",
                    F.col("cur"),
                )
                .persist()
            )
            step.count()
            steps.append(step)
            done = step.filter(F.col("next").isNull()).select(
                "node", F.col("cur").alias("root"), "depth", "path"
            )
            resolved = done if resolved is None else resolved.unionByName(done)
            walking = step.filter(F.col("next").isNotNull()).select(
                "node",
                F.col("next").alias("cur"),
                (F.col("depth") + 1).alias("depth"),
                F.concat(
                    F.col("next").cast("string"), F.lit("/"), F.col("path")
                ).alias("path"),
            )
            if walking.isEmpty():
                # materialize the result off the per-round caches, then
                # release every round (the cluster.py retention lesson)
                out = resolved.persist()
                out.count()
                return out
            state = walking
    finally:
        for s in steps:
            s.unpersist()
    raise RuntimeError(
        f"hierarchy deeper than max_depth={max_depth} (or cyclic) — "
        "raise max_depth for legitimately deep trees"
    )
