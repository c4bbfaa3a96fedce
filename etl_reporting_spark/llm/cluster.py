"""Duplicate-cluster resolution: connected components over near-dup
pairs, turning pairwise hits into per-document dedup decisions.

Pairwise detectors (MinHash/LSH, SimHash, n-gram Jaccard — llm/dedup.py)
emit edges; an actual corpus dedup needs the transitive closure: if
A~B and B~C, all three are one cluster and exactly one survives. This
module computes components with iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors label(u))

repeated to fixpoint — each round is one |E| shuffle (edges ⋈ labels,
groupBy min), and the number of rounds is the cluster diameter, which
for near-dup graphs is small (dup clusters are dense cliques-of-
variants, not long chains). Each round materializes (persist + count)
so lineage stays flat, mirroring the k-means loop
(similarity.train_ivf_centroids). For adversarial graphs with long
chains the published O(log n)-round alternative is the large-star/
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) — same join/agg primitives, more
rounds of bookkeeping; the propagation loop is the right default for
the dedup workload.

Scale notes: the label table holds only edge ENDPOINTS (nodes that
appear in some pair), not the full corpus — singleton documents (the
overwhelming majority at 100 TB) never enter the loop and are
attached afterwards with one left join, cluster_id = own id.

Reference parity: the reference has no graph operator; this extends
its dedup surface (SURVEY.md §2-LLM) the way its MERGE extends joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Components of the undirected graph given as a pair list.

    Returns (node, component) for every node appearing in ``pairs``,
    where ``component`` is the minimum node id in the node's component
    — a deterministic canonical label. Raises if the propagation has
    not converged after ``max_iterations`` rounds (diameter larger
    than the dedup workload ever produces — see module doc).
    """
    edges = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .persist()
    )
    # no eager materialization: the first round's convergence count
    # materializes edges and labels in the same job
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["d"] == labels["node"])
            .groupBy(F.col("s").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component")) < F.col("component")).alias(
                    "__changed"
                ),
            )
            .persist()
        )
        # the count materializes the persisted frame, so the previous
        # round's cache can be dropped and the new frame reused as-is
        changed = new_labels.filter(F.col("__changed")).count()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels.select("node", "component")
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds; "
        "the graph has chains longer than a near-dup workload produces — "
        "raise max_iterations or switch to large-star/small-star"
    )


def near_duplicate_clusters(
    docs: DataFrame,
    k: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document dedup verdicts: MinHash+LSH pairs → connected
    components → min-id canonical election per cluster.

    Output: (doc_id, cluster_id, cluster_size, is_canonical) for EVERY
    document — singletons are their own cluster of size 1 and always
    canonical. Downstream curation keeps ``is_canonical`` rows, the
    same min-id election exact_dedup_map uses for byte-identical dups.
    """
    from etl_reporting_spark.llm.dedup import minhash_near_duplicates

    pairs = minhash_near_duplicates(
        docs, k=k, min_jaccard=min_jaccard, text_col=text_col, id_col=id_col
    )
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    labelled = comp.join(sizes, "component").select(
        F.col("node").alias(id_col),
        F.col("component").alias("cluster_id"),
        "cluster_size",
    )
    return (
        docs.select(id_col)
        .join(labelled, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
            (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col)).alias("is_canonical"),
        )
    )
