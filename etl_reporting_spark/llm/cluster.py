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
(similarity.train_ivf_centroids).

For adversarial graphs with long chains — serial scrapes where page N
near-dups page N+1 — diameter-many rounds is too many; pass
``algorithm="star"`` for the O(log n)-round large-star/small-star
alternation (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14): large-star hangs every neighbor larger than u off
u's minimum neighbor, small-star re-hangs the smaller ones, and the
edge list contracts to per-component stars in logarithmically many
alternations. Same join/agg primitives; propagation stays the default
because dup clusters are shallow and its per-round cost is lower.

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

from etl_reporting_spark.caching import track


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 25,
    algorithm: str = "propagation",
    cleanup: list | None = None,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Components of the undirected graph given as a pair list.

    Returns (node, component) for every node appearing in ``pairs``,
    where ``component`` is the minimum node id in the node's component
    — a deterministic canonical label. ``algorithm="propagation"``
    (default) runs diameter-many min-label rounds;
    ``algorithm="star"`` runs the O(log n)-round large-star/small-star
    alternation for chain-shaped graphs (see module doc). Both raise
    if not converged after ``max_iterations`` rounds.

    SIZE-GATED DRIVER FAST PATH: near-dup edge lists are
    banding-bounded and orders of magnitude smaller than the corpus —
    routinely thousands of pairs from millions of documents. When the
    edge count is ≤ ``driver_max_edges`` (default 1M ≈ tens of MB),
    both algorithms collect the edges and run union-find on the
    driver: exact same labels, zero iterative Spark jobs, and each
    distributed round costs more in scheduling than the whole local
    pass. Above the gate, the distributed loops run. Set
    ``driver_max_edges=0`` to force distributed execution.

    The distributed result reads from a persisted frame (each round
    materializes); pass a ``cleanup`` list to receive that frame and
    release it once the result is consumed — otherwise the final cache
    lives until session end (repeated calls in one session
    accumulate). The driver path returns a plain local DataFrame and
    never touches the list.
    """
    if driver_max_edges > 0:
        edges = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
            F.col("a") != F.col("b")
        )
        edges.persist()
        n_edges = edges.count()
        if n_edges <= driver_max_edges:
            labels = _union_find_local(edges)
            edges.unpersist()
            return labels
        edges.unpersist()
    if algorithm == "star":
        labels, _rounds = _star_components(
            pairs, src=src, dst=dst, max_iterations=max_iterations
        )
        track(labels, cleanup)
        return labels.select("node", "component")
    if algorithm != "propagation":
        raise ValueError(
            f"unknown algorithm {algorithm!r}: expected 'propagation' or 'star'"
        )
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
            track(labels, cleanup)
            return labels.select("node", "component")
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds; "
        "the graph has chains longer than a near-dup workload produces — "
        "raise max_iterations or pass algorithm='star'"
    )


def _union_find_local(edges: DataFrame) -> DataFrame:
    """Union-find with path compression over a collected edge list,
    labels = min node id per component — identical output to the
    distributed algorithms, linear-ish time, no iterative jobs. Only
    reached through the ``driver_max_edges`` size gate."""
    from pyspark.sql.types import StructField, StructType

    rows = edges.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for node in parent:
        root = find(node)
        m = comp_min.get(root)
        if m is None or node < m:
            comp_min[root] = node
    out = [(node, comp_min[find(node)]) for node in parent]
    node_type = edges.schema["a"].dataType
    schema = StructType(
        [StructField("node", node_type, False), StructField("component", node_type, False)]
    )
    return edges.sparkSession.createDataFrame(out, schema)


def _star_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 50,
) -> "tuple[DataFrame, int]":
    """Large-star/small-star alternation (Kiveris et al., SoCC'14),
    returning (persisted star-edge labels as (node, component), rounds
    used). Each round:

    - LARGE-STAR: for every node u (both edge orientations), hang each
      neighbor v > u off m = min(Γ(u) ∪ {u}) — strictly-larger nodes
      detach from chain interiors toward local minima.
    - SMALL-STAR: orient every edge (u, v) with v < u, hang v and u
      off m = min(Γ₍₎(u) ∪ {u}) — the smaller neighbors collapse onto
      the minimum.

    The edge set contracts to one star per component (every node
    pointing at the component minimum) in O(log n) alternations even
    on a path graph, where min-label propagation needs diameter
    rounds. Convergence = edge-set fixpoint, detected from a
    (count, sum-of-hash) checksum computed in the same aggregate that
    materializes the round — no extra shuffle, and a checksum
    collision would need two distinct edge sets with equal count AND
    equal 64-bit hash sum mid-run.

    Each round ends in ``localCheckpoint(eager=True)``, not persist:
    a round references the previous edge set several times (bidir
    union, two star joins), so the LOGICAL plan grows multiplicatively
    per round and would overflow the planner's stack long before data
    size matters — checkpointing truncates lineage to the materialized
    blocks. Local (executor-block) checkpointing trades fault
    tolerance for speed, the standard choice for short iterative
    refinement; on a long-running production cluster where executor
    loss mid-algorithm must be survivable, set a checkpoint dir and
    swap in ``.checkpoint()``.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def checksum(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    def finish(e: DataFrame, rounds: int) -> "tuple[DataFrame, int]":
        labels = (
            e.select(F.col("a").alias("node"), F.col("b").alias("component"))
            .union(e.select(F.col("b").alias("node"), F.col("b").alias("component")))
            .distinct()
            .persist()
        )
        labels.count()
        # e is a localCheckpoint: its blocks release via the context
        # cleaner once the frame is unreferenced.
        return labels, rounds

    prev_sum = checksum(edges)
    if prev_sum[0] == 0:
        return finish(edges, 0)
    for rounds in range(1, max_iterations + 1):
        bidir = edges.select("a", "b").union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        lmin = (
            bidir.groupBy("a")
            .agg(F.min("b").alias("__mb"))
            .select("a", F.least(F.col("__mb"), F.col("a")).alias("m"))
        )
        large = (
            bidir.join(lmin, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        oriented = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        ).filter(F.col("u") != F.col("v"))
        smin = oriented.groupBy("u").agg(F.min("v").alias("m"))
        with_min = oriented.join(smin, "u")
        small = (
            with_min.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(smin.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        new_edges = small.distinct().localCheckpoint(eager=True)  # truncates lineage
        new_sum = checksum(new_edges)
        edges = new_edges
        if new_sum == prev_sum:
            return finish(edges, rounds)
        prev_sum = new_sum
    raise RuntimeError(
        f"star components did not converge in {max_iterations} rounds"
    )


def near_duplicate_clusters(
    docs: DataFrame,
    k: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    algorithm: str = "propagation",
    cleanup: list | None = None,
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
    comp = connected_components(
        pairs, src="doc_a", dst="doc_b", algorithm=algorithm, cleanup=cleanup
    )
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
