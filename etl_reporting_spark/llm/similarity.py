"""Embedding similarity search over ``array<float>`` columns.

Two paths:
- ``cosine_topk_bruteforce`` — exact: every query vector scored
  against every candidate. The dot product folds in DECIMAL (exact,
  order-independent → reproducible by the DuckDB oracle); the final
  cosine is one double expression. Candidate scoring is
  embarrassingly parallel: queries broadcast, candidates stay
  partitioned — the correct baseline at any scale when the query set
  is small.
- ``cosine_topk_lsh`` — the scale path: random-hyperplane signatures
  bucket candidates so each query only scores its bucket's cohort.
  Hyperplane weights derive deterministically from md5, so the index
  is reproducible run-to-run (though the oracle check for this one is
  rows-only — the semantics are approximate by design).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_reporting_spark.caching import track

# Sequential left-to-right double fold: float→double promotion and
# IEEE multiply/add are bit-identical across engines when the order
# is fixed, and aggregate() folds in array order (the oracle mirrors
# with list_reduce). Exact-decimal folds were rejected: engines round
# float→decimal differently (DuckDB scales in float space).
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM2 = (
    "aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)


# --- unrolled vector folds (round-14 optimization, round-15 rescope) -
#
# Higher-order-function lambdas (aggregate / zip_with / transform) are
# CodegenFallback: every element goes through an interpreted closure
# with per-pair array allocation. For a KNOWN vector length the same
# fold unrolls into a flat left-associated arithmetic chain over
# codegen'd element_at calls — measured 5.4x faster on the sf3 PQ
# subspace scoring relation (25.6M pairs × 8 elements,
# OPTIMIZATION_r14.md) and BIT-IDENTICAL by construction: the unrolled
# chain ((…(0.0 + t1) + t2)… + tn) adds the same doubles in the same
# order as the lambda fold. A per-row size() guard falls back to the
# original fold expression whenever the runtime length differs from
# the hint, so the builders are exact for EVERY input, not just
# hint-sized ones.
#
# ROUND-15 RESCOPE: round 14 unrolled every site up to 256 terms. The
# driver's own bench showed the 64-term sites are a verified NET
# REGRESSION at bench scale (ann_cosine_lsh 3.2x, semdedup_flags 3.2x,
# ann_cosine_topk/int8/recall_sweep 1.8x slower at sf0.1, and the
# 8-iteration training gate +57%): each 64-term chain plus the full
# fold duplicated inside its CASE guard multiplies expression-tree
# size across plans that were already 600-2000 lines, and the
# per-plan analysis/codegen constant cost dominates small inputs and
# iterated training plans. The cap is therefore 16: the PQ/ADC
# subspace kernels (sub = dim/m = 8 — the relation that is provably
# large AND per-row cheap, where the 5.4x was actually measured) keep
# the unroll; every dim-64 site gets the fold back (its r13 shape).
_UNROLL_MAX = 16


def _unrolled(a: str, b: "str | None", dim: "int | None", term: str, fold: str) -> str:
    if not dim or dim > _UNROLL_MAX:
        return fold
    acc = "CAST(0 AS DOUBLE)"
    for i in range(1, dim + 1):
        x = f"element_at({a}, {i})"
        y = f"element_at({b}, {i})" if b else ""
        acc = f"({acc} + {term.format(x=x, y=y)})"
    guard = f"size({a}) = {dim}" + (f" AND size({b}) = {dim}" if b else "")
    return f"(CASE WHEN {guard} THEN {acc} ELSE {fold} END)"


def dot_sql(a: str, b: str, dim: "int | None" = None) -> str:
    """Sequential-fold dot product (see ``_DOT``), unrolled to flat
    codegen arithmetic when the vector length hint is given."""
    return _unrolled(
        a, b, dim, "(CAST({x} AS DOUBLE) * CAST({y} AS DOUBLE))", _DOT.format(a=a, b=b)
    )


def norm2_sql(a: str, dim: "int | None" = None) -> str:
    """Sequential-fold squared norm (see ``_NORM2``), unrolled to flat
    codegen arithmetic when the vector length hint is given."""
    return _unrolled(
        a, None, dim, "(CAST({x} AS DOUBLE) * CAST({x} AS DOUBLE))", _NORM2.format(a=a)
    )


def l2_sql(a: str, b: str, dim: "int | None" = None) -> str:
    """Sequential-fold squared L2 distance (the ``_SUBFOLD_L2``
    convention), unrolled to flat codegen arithmetic when the vector
    length hint is given."""
    fold = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return _unrolled(
        a,
        b,
        dim,
        "((CAST({x} AS DOUBLE) - CAST({y} AS DOUBLE))"
        " * (CAST({x} AS DOUBLE) - CAST({y} AS DOUBLE)))",
        fold,
    )


def _cosine_expr() -> F.Column:
    return F.col("dot").cast("double") / (
        F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double"))
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (query_id, rank, neighbor_id, cosine). Ties break on
    neighbor id so ranking is total and reproducible. ``dim`` is the
    unroll hint for the dot/norm folds (size-guarded — wrong hints
    cost the fold fallback, never correctness).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(norm2_sql(vec_col, dim)).alias("qn"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.expr(norm2_sql(vec_col, dim)).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dot", F.expr(dot_sql("qvec", "cvec", dim)))
        .withColumn("cosine", _cosine_expr())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


@lru_cache(maxsize=None)
def _plane_signs(plane: int, dim: int) -> tuple[float, ...]:
    """±1 sign vector for deterministic hyperplane ``plane``:
    sign[d] = +1 iff the 1-based hex-alphabet position of the first
    hex char of md5(f"{plane}|{d}") is even — the exact predicate the
    expression-side construction used, reproduced once driver-side.
    The matrix is CONSTANT per (plane, dim); recomputing it per row
    cost planes × dim md5 calls per vector for no information."""
    hexa = "0123456789abcdef"
    return tuple(
        1.0 if (hexa.index(hashlib.md5(f"{plane}|{d}".encode()).hexdigest()[0]) + 1) % 2 == 0
        else -1.0
        for d in range(dim)
    )


def _hyperplane_sign(vec_col: str, plane: int, dim: int) -> F.Column:
    """Sign of <v, h_plane> where h_plane[d] ∈ {-1,+1} derives from
    md5(plane|d) parity — a deterministic random hyperplane.

    The sign matrix is embedded as an array literal (precomputed in
    ``_plane_signs``), so the per-row work is one zip_with multiply
    fold — no hashing in the expression. ``x * ±1.0`` is an exact IEEE
    sign flip, so results are bit-identical to the old in-expression
    md5 construction (and to the DuckDB oracle, which still derives
    the signs from md5 on its side). Unrolled (size-guarded) to flat
    codegen arithmetic — same left-associated add order, no
    interpreted lambda per element."""
    signs = _plane_signs(plane, dim)
    fold = (
        f"aggregate(zip_with({vec_col}, array({', '.join(f'{s}D' for s in signs)}),"
        f" (x, s) -> CAST(x AS DOUBLE) * s),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    if dim <= _UNROLL_MAX:
        acc = "CAST(0 AS DOUBLE)"
        for i in range(1, dim + 1):
            acc = f"({acc} + (CAST(element_at({vec_col}, {i}) AS DOUBLE) * {signs[i - 1]}D))"
        terms = f"(CASE WHEN size({vec_col}) = {dim} THEN {acc} ELSE {fold} END)"
    else:
        terms = fold
    return (F.expr(terms) > 0).cast("int")


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets, then exact
    cosine within the query's bucket only. At scale the candidate set
    per query is |corpus| / 2^planes instead of |corpus|; the bucket
    join shuffles on the signature key."""
    def signature(df: DataFrame, out: str) -> DataFrame:
        sig = F.concat_ws(
            "", *[_hyperplane_sign(vec_col, p, dim).cast("string") for p in range(planes)]
        )
        return df.withColumn(out, sig)

    q = signature(queries, "bucket").select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(norm2_sql(vec_col, dim)).alias("qn"),
        "bucket",
    )
    c = signature(embeddings, "bucket").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.expr(norm2_sql(vec_col, dim)).alias("cn"),
        "bucket",
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dot", F.expr(dot_sql("qvec", "cvec", dim)))
        .withColumn("cosine", _cosine_expr())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_nearest: int = 1,
    with_rank: bool = False,
    with_vec: bool = False,
    dim: int = 64,
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (IVF
    coarse quantization). Centroids broadcast; one pass over the
    corpus; ties break on centroid id — fully deterministic given
    fixed centroids. ``n_nearest > 1`` keeps one row per (vector,
    cell) for the top cells — the multi-probe query side;
    ``with_rank`` adds the cell's probe rank as ``probe_rn`` so a
    single n_probe_max assignment can be filtered to any smaller
    probe count downstream (the recall-sweep pattern). ``with_vec``
    appends the winning centroid's vector as ``__cvec`` (the residual
    path's subtrahend) without a second join.

    The ``n_nearest == 1`` corpus path replaces the previous
    ``row_number`` window over (cosine DESC, centroid_id ASC) with a
    per-vector ``MAX(struct(cosine, -centroid_id, …))`` aggregate:
    Spark's struct ordering (NaN greatest, lexicographic fields) makes
    the selection bit-identical. Honest plan shape (round-15
    correction): struct MAX has no mutable buffer, so this is a
    partial SORTAGGREGATE — the map side still sorts its scored rows
    by group key — but the n_centroids candidates per vector collapse
    to one row inside the scan task, so the exchange carries N compact
    rows instead of N·n_centroids full-width rows, and no Window pass
    runs after the shuffle. (A
    fully map-only ``array_max``-over-broadcast-array formulation was
    measured first and REJECTED: collapsed projections re-inline the
    whole scoring fold into downstream join keys, and the gate-level
    read came out ~40% slower than this aggregate form — see
    OPTIMIZATION_r14.md.) Multi-probe (queries: tiny) keeps the window
    formulation; non-numeric ids fall back to it too (the argmax
    struct needs ``-id`` for the ascending tie-break)."""
    from pyspark.sql.types import NumericType

    if (
        n_nearest == 1
        and not with_rank
        # BOTH relations must carry numeric ids: the argmax struct
        # negates the CENTROIDS' id for the ascending tie-break, and a
        # string centroid id would cast to double (NULL), silently
        # breaking determinism instead of falling back to the window.
        and isinstance(embeddings.schema[id_col].dataType, NumericType)
        and isinstance(centroids.schema[id_col].dataType, NumericType)
    ):
        c = centroids.select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).alias("__cvec"),
            F.expr(norm2_sql(vec_col, dim)).alias("__cn"),
        )
        v = embeddings.select(
            F.col(id_col),
            F.col(vec_col),
            F.expr(norm2_sql(vec_col, dim)).alias("__qn"),
        )
        cosine = F.col("__dot").cast("double") / (
            F.sqrt(F.col("__qn").cast("double")) * F.sqrt(F.col("__cn").cast("double"))
        )
        fields = [
            cosine.alias("s"),
            (-F.col("__cid")).alias("negid"),
            F.col("__cid").alias("cid"),
        ]
        if with_vec:
            fields.append(F.col("__cvec").alias("cvec"))
        scored = (
            v.crossJoin(F.broadcast(c))
            .withColumn("__dot", F.expr(dot_sql(vec_col, "__cvec", dim)))
            .select(F.col(id_col), F.col(vec_col), F.struct(*fields).alias("__cand"))
        )
        g = scored.groupBy(id_col).agg(
            F.first(vec_col).alias(vec_col), F.max("__cand").alias("__best")
        )
        cols = [F.col(id_col), F.col(vec_col), F.col("__best.cid").alias("centroid_id")]
        if with_vec:
            cols.append(F.col("__best.cvec").alias("__cvec"))
        return g.select(*cols)

    c = centroids.select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("cvec"),
        F.expr(norm2_sql(vec_col, dim)).alias("cn"),
    )
    v = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.expr(norm2_sql(vec_col, dim)).alias("qn"),
    )
    scored = (
        v.crossJoin(F.broadcast(c))
        .withColumn("dot", F.expr(dot_sql(vec_col, "cvec", dim)))
        .withColumn("cosine", _cosine_expr())
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cosine").desc(), F.col("centroid_id").asc())
    ranked = scored.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= n_nearest
    )
    out_cols = [id_col, vec_col, "centroid_id"]
    if with_vec:
        ranked = ranked.withColumn("__cvec", F.col("cvec"))
        out_cols.append("__cvec")
    if with_rank:
        return ranked.select(*out_cols, F.col("__rn").alias("probe_rn"))
    return ranked.select(*out_cols)


def kmeans_step_components(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """One Lloyd iteration of k-means, long form: assign every vector
    to its nearest centroid (``ivf_assign``), then the new centroid
    components as (centroid_id, pos, mean_val, n_members) — the
    training loop the IVF docstring defers to.

    ``exact=True`` sums each component as an ordered double fold
    (members sorted by id inside ``collect_list``): bit-identical in
    any engine, which is what the gate verifies. Member lists live in
    memory per (centroid, pos) group, so this mode is bounded by
    cluster size — for 100 TB training use ``exact=False``: a plain
    partial+final SUM whose float association order varies with the
    shuffle (last-ulp nondeterminism, statistically irrelevant for
    k-means, and nothing downstream hash-checks it).
    """
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    if not exact:
        comp = assigned.select(
            "centroid_id", F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        return (
            comp.groupBy("centroid_id", "pos")
            .agg(
                (F.sum(F.col("val").cast("double")) / F.count(F.lit(1))).alias("mean_val"),
                F.count(F.lit(1)).alias("n_members"),
            )
        )
    return _kmeans_exact_mean_components(assigned, id_col, vec_col)


def _kmeans_exact_mean_components(
    assigned: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Exact (ordered-fold) per-centroid means from an assignment
    relation, component form (centroid_id, pos, mean_val, n_members):
    posexplode to scalar components, collect each (centroid, pos)
    group's members SORTED BY MEMBER ID, fold sequentially. Per
    component the doubles add in id-ascending order, so the means are
    bit-identical to any whole-vector formulation that folds in the
    same member order.

    MEMORY BOUND (round-15): round 14 collected whole member VECTORS
    per centroid group — one shuffle, but per-group aggregation state
    of cluster_size × dim doubles, so one hot cluster widened the
    buffer dim× and could OOM its executor (guide §5). The component
    form keeps per-group state at cluster_size scalars, spread over
    dim× more (centroid, pos) groups that distribute across tasks —
    the price is the exploded exchange and the rebuild-by-pos
    aggregation. Member lists still grow with cluster size (the
    ordered fold fundamentally needs the whole ordered list — any
    bounded-state partial aggregation would merge partials in shuffle
    order and break bit-exactness), so exact=True remains the
    gate/oracle mode; 100 TB training uses ``exact=False``
    (partial+final SUM)."""
    comp = assigned.select(
        "centroid_id", F.col(id_col), F.posexplode(F.col(vec_col)).alias("pos", "val")
    )
    g = comp.groupBy("centroid_id", "pos").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(id_col).alias("i"), F.col("val").cast("double").alias("v"))
            )
        ).alias("__vals"),
        F.count(F.lit(1)).alias("n_members"),
    )
    ordered_sum = F.aggregate(
        F.expr("transform(__vals, s -> s.v)"),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return g.select(
        "centroid_id",
        "pos",
        (ordered_sum / F.col("n_members").cast("double")).alias("mean_val"),
        "n_members",
    )


def kmeans_step(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """One Lloyd iteration, array form: new centroids shaped like the
    input centroid relation (id, vector) so iterations chain:
    ``centroids = kmeans_step(emb, centroids)`` until movement is
    small. Empty clusters simply drop (their id yields no row), the
    standard restart-or-shrink situation left to the caller.

    Both paths run the component aggregation
    (``kmeans_step_components``) and re-collect by position — the
    exact path's per-group state stays cluster_size scalars, never
    cluster_size × dim (see ``_kmeans_exact_mean_components``)."""
    parts = kmeans_step_components(embeddings, centroids, id_col, vec_col, exact=exact)
    rebuilt = F.expr("transform(array_sort(__pairs), s -> s.m)")
    return (
        parts.groupBy("centroid_id")
        .agg(
            F.collect_list(F.struct(F.col("pos").alias("p"), F.col("mean_val").alias("m"))).alias(
                "__pairs"
            )
        )
        .select(F.col("centroid_id").alias(id_col), rebuilt.alias(vec_col))
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Lloyd-iterate from the first ``n_centroids`` vectors to trained
    IVF centroids. Each iteration is materialized (persist + count)
    before the next — without that, N iterations stack into one plan
    whose lineage re-runs every assignment N times. The previous
    iteration's cache is released as soon as its successor exists.
    ``exact=False`` (plain SUM means) is the training default; the
    last-ulp shuffle nondeterminism only matters to hash checks."""
    from etl_reporting_spark.caching import track

    centroids = embeddings.filter(F.col(id_col) < n_centroids).select(id_col, vec_col)
    prev = None
    for _ in range(iterations):
        centroids = kmeans_step(
            embeddings, centroids, id_col=id_col, vec_col=vec_col, exact=exact
        ).persist()
        centroids.count()
        if prev is not None:
            prev.unpersist()
        prev = centroids
    # the returned (tiny: n_centroids × dim doubles) frame stays
    # persisted so downstream plans reuse it; an active cache_scope
    # releases it on exit
    return track(centroids)


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    n_probe: int = 1,
    dim: int = 64,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus against the given (or
    seed) centroids, then each query scores only its nearest cells'
    inverted lists. Pass ``centroids=train_ivf_centroids(...)`` for a
    trained index; the default seeds keep the operator deterministic
    for the oracle. Candidate work per query is
    |corpus|·n_probe/n_centroids; the cluster join shuffles on
    centroid_id.

    ``n_probe`` is the standard recall lever: a true neighbor in an
    adjacent cell is invisible at n_probe=1; probing the query's
    n_probe nearest cells recovers it at linearly-bounded extra cost
    (production indexes run n_probe 8-64 of thousands of cells)."""
    if centroids is None:
        centroids = embeddings.filter(F.col(id_col) < n_centroids)
    corpus = ivf_assign(embeddings, centroids, id_col, vec_col)
    probes = ivf_assign(queries, centroids, id_col, vec_col, n_nearest=n_probe)

    q = probes.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(norm2_sql(vec_col, dim)).alias("qn"),
        "centroid_id",
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.expr(norm2_sql(vec_col, dim)).alias("cn"),
        "centroid_id",
    )
    scored = (
        c.join(q, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dot", F.expr(dot_sql("qvec", "cvec", dim)))
        .withColumn("cosine", _cosine_expr())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _band_signature(vec_col: str, band: int, planes_per_band: int, dim: int) -> F.Column:
    """Concatenated hyperplane-sign bits for one LSH band (plane
    indices ``band*r .. band*r+r-1`` so bands never share planes)."""
    return F.concat_ws(
        "",
        *[
            _hyperplane_sign(vec_col, band * planes_per_band + j, dim).cast("string")
            for j in range(planes_per_band)
        ],
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    min_cosine: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    bands: int = 6,
    planes_per_band: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ t).

    ``method="lsh"`` (default, the scale path): banded random-
    hyperplane LSH generates candidate pairs — vectors agreeing on
    every plane of at least one band — then exact cosine verifies
    candidates only. One explode (bands per vector), one shuffle on
    (band, signature), and two id-joins to re-fetch vectors; work is
    proportional to bucket collisions, never corpus². Recall tuning:
    a pair at angle θ survives one band with p=(1-θ/π)^r, and all
    ``bands`` bands miss with (1-p)^bands — raise ``bands`` (or lower
    ``planes_per_band``) for looser thresholds. The defaults suit
    tight thresholds (≥0.95); the sf-gate query passes bands=12, r=2
    for its deliberately loose 0.45 threshold (total recall there).

    ``method="exact"``: brute-force all-pairs — O(n²), an explicit
    opt-in for small corpora or recall audits.
    """
    e = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.expr(norm2_sql(vec_col, dim)).alias("n2"),
    )
    if method == "exact":
        pairs = (
            e.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"), F.col("n2").alias("qn"))
            .crossJoin(
                e.select(
                    F.col("vid").alias("id_b"), F.col("vec").alias("vb"), F.col("n2").alias("cn")
                )
            )
            .filter(F.col("id_a") < F.col("id_b"))
        )
    elif method == "lsh":
        sigs = embeddings.select(
            F.col(id_col).alias("vid"),
            F.posexplode(
                F.array(
                    *[_band_signature(vec_col, b, planes_per_band, dim) for b in range(bands)]
                )
            ).alias("band", "sig"),
        )
        cand = (
            sigs.select(F.col("vid").alias("id_a"), "band", "sig")
            .join(sigs.select(F.col("vid").alias("id_b"), "band", "sig"), ["band", "sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        pairs = cand.join(
            e.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"), F.col("n2").alias("qn")),
            "id_a",
        ).join(
            e.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"), F.col("n2").alias("cn")),
            "id_b",
        )
    else:
        raise ValueError(f"unknown method {method!r}: expected 'lsh' or 'exact'")
    return (
        pairs.withColumn("dot", F.expr(dot_sql("va", "vb", dim)))
        .withColumn("cosine", _cosine_expr())
        .filter(F.col("cosine") >= F.lit(min_cosine))
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame | None = None,
    n_centroids: int = 8,
    min_cosine: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cleanup: list | None = None,
    dim: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the corpus, then look for
    near-duplicate pairs ONLY within each cluster, flagging every
    vector that has an earlier-id cluster-mate with cosine ≥
    ``min_cosine``. Keeping the minimum id per semantic group is the
    deterministic stand-in for the paper's "keep one random/lowest-
    centroid-similarity member".

    Returns one row per input vector: (id, centroid_id,
    is_semantic_dup) — callers drop ``is_semantic_dup = 1`` rows to
    materialize the deduplicated corpus, or keep the frame as a fate
    report.

    Scale design: the whole point of the cluster pass is that the
    quadratic pair search never crosses cluster boundaries. Work is
    Σ c_i² over cluster sizes, not n²; size ``n_centroids`` ∝ n /
    target_cluster_size to keep c_i bounded as the corpus grows (the
    paper uses ~100k clusters for ~100M docs). The pair join shuffles
    on centroid_id only; a skewed hot cluster is the one failure mode
    — raise ``n_centroids`` (or pre-train centroids with
    ``train_ivf_centroids`` so they track the density) rather than
    relying on AQE, which can split partitions but not shrink the
    pair count. Default centroids are the deterministic id-seed rows
    (reproducible for the oracle); production passes trained
    centroids.
    """
    if centroids is None:
        centroids = embeddings.filter(F.col(id_col) < n_centroids)
    # Three consumers (both pair-join sides + the fate join) would
    # re-run the assignment crossJoin three times; materialize it once
    # — in production the cluster assignment is a table anyway. Pass
    # ``cleanup`` to release the cache once the output is consumed.
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col).persist()
    assigned.count()
    track(assigned, cleanup)
    m = assigned.select(
        F.col(id_col).alias("vid"),
        "centroid_id",
        F.col(vec_col).alias("vec"),
        F.expr(norm2_sql(vec_col, dim)).alias("n2"),
    )
    dup_ids = (
        m.select(F.col("vid").alias("id_a"), "centroid_id",
                 F.col("vec").alias("va"), F.col("n2").alias("qn"))
        .join(
            m.select(F.col("vid").alias("id_b"), "centroid_id",
                     F.col("vec").alias("vb"), F.col("n2").alias("cn")),
            "centroid_id",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dot", F.expr(dot_sql("va", "vb", dim)))
        .withColumn("cosine", _cosine_expr())
        .filter(F.col("cosine") >= F.lit(min_cosine))
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    return (
        assigned.join(dup_ids, assigned[id_col] == dup_ids["dup_id"], "left")
        .select(
            id_col,
            "centroid_id",
            F.when(F.col("dup_id").isNotNull(), 1).otherwise(0).alias("is_semantic_dup"),
        )
    )


def mine_hard_negatives(
    embeddings: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 5,
    fetch_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: per
    query, the k STRONGEST neighbors that are not labeled positives —
    the pairs that sharpen a retrieval model fastest. ``positives``
    is (query_id, pos_id); the query itself is always excluded.

    Over-fetches ``fetch_k`` (default k + 8) candidates from the
    exact scorer, anti-joins the positive pairs, re-ranks, keeps k.
    At corpus scale swap the candidate source for the LSH/IVF/PQ
    scorers — the anti-join + re-rank tail is source-agnostic. The
    positives relation is per-query-sized (broadcast); the re-rank
    window rides the same query_id partitioning the scorer produced,
    so no extra shuffle.

    Caveat by design: if a query has more than fetch_k − k positives
    inside the fetched head, fewer than k negatives return — raise
    ``fetch_k`` (the standard recall/over-fetch trade).
    """
    if fetch_k is None:
        fetch_k = k + 8
    cands = cosine_topk_bruteforce(embeddings, queries, k=fetch_k, id_col=id_col, vec_col=vec_col)
    pos = positives.select(
        F.col("query_id"), F.col("pos_id").alias("neighbor_id")
    )
    neg = cands.join(F.broadcast(pos), ["query_id", "neighbor_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("query_id", "neg_rank", "neighbor_id", "cosine")
    )
