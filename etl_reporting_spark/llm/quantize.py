"""Scalar int8 quantization for embedding columns.

At 100 TB an ``array<float>`` embedding column is often the single
widest column in the lake; per-vector scalar quantization to 8-bit
codes cuts it 4× (and the shuffle/scan bytes of every downstream ANN
pass with it). This module keeps the whole path deterministic and
oracle-checkable:

- ``quantize_embeddings`` — per-vector min/max scalar quantization:
  ``q_i = floor((x_i - mn) / scale + 0.5)`` with
  ``scale = (mx - mn) / levels``. ``floor`` (not ``round``) because
  IEEE floor is exact and identical across engines, while
  double-round implementations differ in how they decimalize.
  Constant vectors (``mx == mn``) quantize to all-zero codes.
- ``dequantized_dot`` (expression builder) — the dot product of two
  dequantized vectors expands algebraically to

      sa*sb*Σ(qa·qb) + sa*mnb*Σqa + sb*mna*Σqb + d*mna*mnb

  where every Σ is an INTEGER sum (exact, order-independent) and the
  final combination is a handful of fixed-shape double ops — so the
  "approximate" quantized cosine is itself bit-reproducible, unlike
  a float-accumulated dot.
- ``cosine_topk_quantized`` — brute-force top-k over the quantized
  codes: same shape as ``similarity.cosine_topk_bruteforce`` (queries
  broadcast, corpus partitioned, per-query window rank) but the
  corpus side carries int8 codes + 3 scalars instead of floats.

Scale notes: quantization is a narrow per-row projection (no
shuffle); the integer sums Σq and Σq² are precomputed once per vector
at quantize time, so the scoring join does one integer zip-fold per
pair — the cheapest exactly-reproducible scoring kernel available
without native SIMD.

Reference parity: the reference has no vector layer; this extends the
beyond-reference ANN family (SURVEY.md §6) with the storage-scale
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Integer fold over the quantized codes — BIGINT accumulation is
# exact and order-independent, so any engine reproduces it.
_QSUM = "aggregate({a}, CAST(0 AS BIGINT), (acc, v) -> acc + CAST(v AS BIGINT))"
_QDOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)),"
    " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def _qsum_sql(a: str, dim: "int | None" = None) -> str:
    """Σ codes as BIGINT — unrolled (size-guarded) to flat codegen
    arithmetic when the length hint is given; integer addition is
    exact and associative, so unrolling cannot change the value."""
    from etl_reporting_spark.llm.similarity import _UNROLL_MAX

    fold = _QSUM.format(a=a)
    if not dim or dim > _UNROLL_MAX:
        return fold
    acc = "CAST(0 AS BIGINT)"
    for i in range(1, dim + 1):
        acc = f"({acc} + CAST(element_at({a}, {i}) AS BIGINT))"
    return f"(CASE WHEN size({a}) = {dim} THEN {acc} ELSE {fold} END)"


def _qdot_sql(a: str, b: str, dim: "int | None" = None) -> str:
    """Σ code products as BIGINT — unrolled like ``_qsum_sql``."""
    from etl_reporting_spark.llm.similarity import _UNROLL_MAX

    fold = _QDOT.format(a=a, b=b)
    if not dim or dim > _UNROLL_MAX:
        return fold
    acc = "CAST(0 AS BIGINT)"
    for i in range(1, dim + 1):
        acc = (
            f"({acc} + (CAST(element_at({a}, {i}) AS BIGINT)"
            f" * CAST(element_at({b}, {i}) AS BIGINT)))"
        )
    return f"(CASE WHEN size({a}) = {dim} AND size({b}) = {dim} THEN {acc} ELSE {fold} END)"


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    levels: int = 255,
    dim: int = 64,
) -> DataFrame:
    """Add per-vector scalar-quantization columns:

    - ``q_mn`` / ``q_mx`` — the vector's value range (double);
    - ``q_scale`` — ``(mx - mn) / levels`` (0.0 for constant vectors);
    - ``qvec`` — ``array<int>`` codes in [0, levels];
    - ``q_sum`` / ``q_norm2`` — Σq and Σq² (bigint), precomputed so
      downstream scoring never re-folds the codes for norms.

    Narrow projection — no shuffle, fuses into the scan.
    """
    mn = F.expr(
        f"aggregate({vec_col}, CAST('Infinity' AS DOUBLE),"
        " (acc, v) -> least(acc, CAST(v AS DOUBLE)))"
    )
    mx = F.expr(
        f"aggregate({vec_col}, CAST('-Infinity' AS DOUBLE),"
        " (acc, v) -> greatest(acc, CAST(v AS DOUBLE)))"
    )
    out = df.withColumn("q_mn", mn).withColumn("q_mx", mx)
    scale = F.when(
        F.col("q_mx") > F.col("q_mn"),
        (F.col("q_mx") - F.col("q_mn")) / F.lit(float(levels)),
    ).otherwise(F.lit(0.0))
    out = out.withColumn("q_scale", scale)
    qvec = F.when(
        F.col("q_scale") > 0.0,
        F.expr(
            f"transform({vec_col}, x -> CAST(floor("
            "(CAST(x AS DOUBLE) - q_mn) / q_scale + 0.5D) AS INT))"
        ),
    ).otherwise(F.expr(f"transform({vec_col}, x -> 0)"))
    out = out.withColumn("qvec", qvec)
    return out.withColumn("q_sum", F.expr(_qsum_sql("qvec", dim))).withColumn(
        "q_norm2", F.expr(_qdot_sql("qvec", "qvec", dim))
    )


def _dequant_dot(a: str, b: str, dim_expr: str, dim: "int | None" = None) -> F.Column:
    """<deq(a), deq(b)> from integer sums + scalars (see module doc).

    ``{a}_qvec/_q_sum/_q_mn/_q_scale`` columns must exist for both
    prefixes; ``dim_expr`` is the shared dimensionality expression.
    """
    qdot = F.expr(_qdot_sql(f"{a}_qvec", f"{b}_qvec", dim)).cast("double")
    sa, sb = F.col(f"{a}_q_scale"), F.col(f"{b}_q_scale")
    ma, mb = F.col(f"{a}_q_mn"), F.col(f"{b}_q_mn")
    qa, qb = F.col(f"{a}_q_sum").cast("double"), F.col(f"{b}_q_sum").cast("double")
    d = F.expr(dim_expr).cast("double")
    return sa * sb * qdot + sa * mb * qa + sb * ma * qb + d * ma * mb


def _dequant_norm2(p: str, dim_expr: str) -> F.Column:
    """<deq(p), deq(p)> = s²Σq² + 2·s·mn·Σq + d·mn²."""
    s, m = F.col(f"{p}_q_scale"), F.col(f"{p}_q_mn")
    q1 = F.col(f"{p}_q_sum").cast("double")
    q2 = F.col(f"{p}_q_norm2").cast("double")
    d = F.expr(dim_expr).cast("double")
    return s * s * q2 + F.lit(2.0) * s * m * q1 + d * m * m


def cosine_topk_quantized(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
    dim: int = 64,
) -> DataFrame:
    """Brute-force top-k cosine over int8-quantized vectors.

    Same plan shape as the float baseline (queries broadcast, corpus
    partitioned, one per-query window rank) but the scoring kernel is
    the integer-sum dequantized dot — 4× less corpus I/O and an
    exactly-reproducible "approximate" score. Ties break on neighbor
    id; ranks are total.
    """

    def _prefixed(df: DataFrame, p: str, out_id: str) -> DataFrame:
        q = quantize_embeddings(df, vec_col=vec_col, levels=levels, dim=dim)
        return q.select(
            F.col(id_col).alias(out_id),
            F.col("qvec").alias(f"{p}_qvec"),
            F.col("q_mn").alias(f"{p}_q_mn"),
            F.col("q_scale").alias(f"{p}_q_scale"),
            F.col("q_sum").alias(f"{p}_q_sum"),
            F.col("q_norm2").alias(f"{p}_q_norm2"),
        )

    q = _prefixed(queries, "q", "query_id")
    c = _prefixed(embeddings, "c", "neighbor_id")
    dim_e = "size(q_qvec)"
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dot", _dequant_dot("q", "c", dim_e, dim))
        .withColumn(
            "cosine",
            F.col("dot")
            / (F.sqrt(_dequant_norm2("q", dim_e)) * F.sqrt(_dequant_norm2("c", dim_e))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# --- Product quantization (PQ) -------------------------------------
#
# The IVF+PQ pairing is the standard 100 TB ANN architecture: IVF
# (similarity.cosine_topk_ivf) prunes the candidate list to one
# cluster, PQ compresses each candidate to m one-byte codes so the
# scoring pass reads m bytes per vector instead of 4·dim, and scoring
# itself becomes table lookups (ADC) — no per-pair float vector math.
# Everything below is deterministic (seed codebooks, ordered folds,
# total tie-breaks) so even this doubly-approximate path is
# oracle-checked value-for-value.

from etl_reporting_spark.llm.similarity import _DOT as _SUBFOLD_DOT  # noqa: E402
from etl_reporting_spark.llm.similarity import dot_sql, l2_sql, norm2_sql  # noqa: E402

_SUBFOLD_L2 = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
    " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _subspaces(df: DataFrame, m: int, sub: int, vec_col: str, out: str) -> DataFrame:
    """Explode a vector column into its m subvectors: (…, subspace,
    out=array slice). Narrow; one row per (row, subspace)."""
    parts = F.array(
        *[F.slice(F.col(vec_col), s * sub + 1, sub) for s in range(m)]
    )
    return df.select(*df.columns, F.posexplode(parts).alias("subspace", out))


def pq_codebook(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codebook from the deterministic id-seed vectors: subspace
    s's codes are the seeds' s-th slices. (subspace, code, subvec,
    cn2) — m·n_codes rows, always broadcastable. Production trains
    each subspace's codes with per-subspace Lloyd iterations (the
    ``kmeans_step`` pattern applied to the sliced relation); the
    seed version keeps the gate reproducible, and every downstream
    contract (encode, LUT, ADC) is codebook-agnostic."""
    sub = dim // m
    seeds = embeddings.filter(F.col(id_col) < n_codes).select(
        F.col(id_col).alias("code"), vec_col
    )
    return _subspaces(seeds, m, sub, vec_col, "subvec").select(
        "subspace",
        "code",
        "subvec",
        F.expr(dot_sql("subvec", "subvec", sub)).alias("cn2"),
    )


def pq_train_codebook(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Lloyd-train the PQ codebook — ALL m subspaces in one relation
    per iteration (subspace is just another grouping column, so one
    assignment join + one mean aggregate trains every subspace's
    codes simultaneously; never m separate k-means jobs). Seeds from
    ``pq_codebook``; each iteration materializes (persist + count)
    exactly like ``train_ivf_centroids``, or N iterations stack into
    one plan that re-runs assignment N times.

    Means default to the plain partial+final AVG (shuffle-order float
    association — the ``exact=False`` convention of
    ``kmeans_step_components``): training output usually feeds recall
    measurements and serving, not hash gates. ``exact=True`` switches
    to the ordered double fold (members sorted by ``id_col`` inside
    ``collect_list``) — bit-identical in any engine, which is what
    lets the TRAINED serving stack be value-hash-oracled end-to-end
    (``ann_recall_sweep_trained``); like the kmeans twin, this mode
    holds one member list per (subspace, code, pos) group in memory,
    so it is for gate-scale corpora — 100 TB training uses the
    default. Pass the result as
    ``codebook=`` to ``pq_encode`` / ``ivfpq_candidates``; for
    residual encoding, train on ``residualize(...)`` output so the
    codes model residuals. What training guarantees is Lloyd's
    monotone quantization-error decrease (pinned in
    tests/test_ann_recall.py); whether that moves end RECALL is
    corpus-dependent — on the synthetic gate corpus 3 iterations
    measurably do not flip residual past plain (the raw corpus
    clusters so tightly that nearest-corpus-vector seed quantization
    is already strong), which is why the serving-quality lever this
    repo ships is the exact-rerank refine stage, not codebook
    training."""
    sub = dim // m
    codebook = pq_codebook(embeddings, m, n_codes, dim, id_col, vec_col).select(
        "subspace", "code", "subvec"
    )
    ex = _subspaces(
        embeddings.select(id_col, vec_col), m, sub, vec_col, "xsub"
    ).select(id_col, "subspace", "xsub").persist()
    ex.count()
    prev = None
    try:
        for _ in range(iterations):
            # assignment argmin as MIN(struct(dist, code)) — same
            # (dist ASC, code ASC) selection the previous window made.
            # Struct MIN plans as a partial SortAggregate (map side
            # still sorts by group key), but the exchange carries N·m
            # best-rows, not N·m·n_codes candidates, and no Window
            # pass follows the shuffle.
            scored = ex.join(F.broadcast(codebook), "subspace").withColumn(
                "dist", F.expr(l2_sql("xsub", "subvec", sub))
            )
            assigned = (
                scored.groupBy(id_col, "subspace")
                .agg(
                    F.min(F.struct(F.col("dist"), F.col("code"))).alias("__best"),
                    F.first("xsub").alias("xsub"),
                )
                .select(id_col, "subspace", F.col("__best.code").alias("code"), "xsub")
            )
            comp = assigned.select(
                id_col, "subspace", "code", F.posexplode("xsub").alias("pos", "val")
            )
            if exact:
                # exact means in COMPONENT form: collect each
                # (subspace, code, pos) group's member scalars sorted
                # by member id and fold sequentially — bit-identical
                # to any formulation that adds the same doubles in the
                # same id order. Round-15 memory bound: the round-14
                # whole-subvector collect held cluster_size × sub
                # doubles per group (one hot code widens the buffer
                # sub×, guide §5); the component form keeps per-group
                # state at cluster_size scalars spread over sub× more
                # groups, at the cost of the exploded exchange + the
                # rebuild-by-pos aggregation.
                g = comp.groupBy("subspace", "code", "pos").agg(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(id_col).alias("i"),
                                F.col("val").cast("double").alias("v"),
                            )
                        )
                    ).alias("__vals"),
                    F.count(F.lit(1)).alias("__n"),
                )
                ordered_sum = F.aggregate(
                    F.expr("transform(__vals, s -> s.v)"),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                means = g.select(
                    "subspace",
                    "code",
                    "pos",
                    (ordered_sum / F.col("__n").cast("double")).alias("mv"),
                )
            else:
                means = comp.groupBy("subspace", "code", "pos").agg(
                    F.avg(F.col("val").cast("double")).alias("mv")
                )
            new_cb = means.groupBy("subspace", "code").agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, mv))),"
                    " s -> s.mv)"
                ).alias("__new")
            )
            # a code that lost every assignment this iteration has no
            # mean row — LEFT-join onto the previous codebook and
            # carry its old centroid forward, so the effective
            # n_codes can never silently shrink for later iterations
            # and serving (dead codes simply stop moving; standard
            # Lloyd practice short of reseeding)
            codebook = (
                codebook.select(
                    "subspace", "code", F.col("subvec").alias("__prev")
                )
                .join(F.broadcast(new_cb), ["subspace", "code"], "left")
                .select(
                    "subspace",
                    "code",
                    F.coalesce("__new", "__prev").alias("subvec"),
                )
                .persist()
            )
            codebook.count()
            if prev is not None:
                prev.unpersist()
            prev = codebook
    finally:
        ex.unpersist()
    from etl_reporting_spark.caching import track

    # tiny (m·n_codes rows) persisted frame; cache_scope releases it
    return track(codebook).withColumn(
        "cn2", F.expr(dot_sql("subvec", "subvec", sub))
    )


def materialize_index(df: DataFrame) -> DataFrame:
    """Collect a TINY trained-index artifact (IVF centroids, PQ
    codebook — n_centroids·dim / m·n_codes·sub doubles) into a fresh
    local relation, CUTTING its lineage. Persisting alone is not
    enough for iteratively-trained frames: the cache short-circuits
    execution, but every downstream reference still inlines the full
    k-iteration logical plan, and a serving query that mentions the
    index five times hands Catalyst five copies of the training tree
    — analysis time, not execution time, becomes the bottleneck (the
    classic iterative-lineage trap; measured 80+ s of pure planning
    on the trained sweep before this cut). This is also what a real
    deployment does: the index is BUILT once, written out, and read
    back as plain data — doubles round-trip bit-exact, so hash gates
    are unaffected. Only ever call it on broadcast-sized frames."""
    return df.sparkSession.createDataFrame(df.collect(), df.schema)


def pq_encode(
    embeddings: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Assign each vector its nearest code per subspace (L2 in the
    subspace, ties to the lowest code — total order). Output
    (id, subspace, code): m small ints per vector, the 4·dim/m×
    compressed representation the scan/shuffle then carries.

    Plan: one narrow subspace explode, one BROADCAST join against the
    codebook (m·n_codes rows), then the argmin as a per-(vector,
    subspace) ``MIN(struct(dist, code))`` aggregate — Spark's struct
    ordering (NaN greatest, lexicographic) reproduces the previous
    ``row_number`` over (dist ASC, code ASC) bit-for-bit. Honest plan
    shape (round-15 correction): struct-typed MIN has no mutable
    aggregation buffer, so this compiles to a partial SORTAGGREGATE —
    the map side still sorts its N·m·n_codes candidate rows by group
    key before collapsing, the same order of work the window's sort
    paid. What the rewrite actually buys is the EXCHANGE: the partial
    aggregate collapses each group's n_codes scored rows to one best
    row map-side, so the shuffle carries N·m compact rows instead of
    the full scored relation, and no final Window pass runs after it.
    (A fully map-only array-fold formulation measured slower at gate
    level — collapsed projections re-inline the scoring fold into
    downstream join keys — see OPTIMIZATION_r14.md.)

    ``extra_cols`` pass through unchanged (e.g. ``centroid_id`` from
    a preceding assignment), so IVF+PQ callers need no join of codes
    back onto cells."""
    sub = dim // m
    ex = _subspaces(
        embeddings.select(id_col, vec_col, *extra_cols), m, sub, vec_col, "xsub"
    ).select(id_col, "subspace", "xsub", *extra_cols)
    scored = ex.join(
        F.broadcast(codebook.select("subspace", "code", "subvec")), "subspace"
    ).withColumn("dist", F.expr(l2_sql("xsub", "subvec", sub)))
    g = scored.groupBy(id_col, "subspace").agg(
        F.min(F.struct(F.col("dist"), F.col("code"))).alias("__best"),
        *[F.first(c).alias(c) for c in extra_cols],
    )
    return g.select(
        id_col, "subspace", F.col("__best.code").alias("code"), *extra_cols
    )


def _adc_topk(
    codes: DataFrame, lut: DataFrame, id_col: str, k: int, cell_match: bool
) -> DataFrame:
    """Shared LUT/ADC scoring tail of the PQ scorers: broadcast the
    per-query lookup table, probe it per (subspace, code) — plus the
    IVF cell equality when pruning — and fold the per-subspace dots
    and code norms IN SUBSPACE ORDER for bit-reproducible scores.
    The probe side's join columns are renamed first: codes and lut
    share the codebook lineage, and same-lineage column refs in a
    join condition are ambiguous (Spark's "trivially true predicate"
    trap)."""
    lut_r = lut.withColumnRenamed("subspace", "l_subspace").withColumnRenamed(
        "code", "l_code"
    )
    cond = (F.col("subspace") == F.col("l_subspace")) & (
        F.col("code") == F.col("l_code")
    )
    if cell_match:
        cond = cond & (F.col("centroid_id") == F.col("qcell"))
    parts = (
        codes.join(F.broadcast(lut_r), cond)
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(
            F.first("qn2").alias("qn2"),
            F.array_sort(
                F.collect_list(F.struct("subspace", "pdot", "cn2"))
            ).alias("__m"),
        )
        .withColumn(
            "adc_dot",
            F.expr("aggregate(__m, CAST(0 AS DOUBLE), (acc, e) -> acc + e.pdot)"),
        )
        .withColumn(
            "approx_cn2",
            F.expr("aggregate(__m, CAST(0 AS DOUBLE), (acc, e) -> acc + e.cn2)"),
        )
    )
    scored = parts.withColumn(
        "adc_score",
        F.col("adc_dot") / (F.sqrt(F.col("qn2")) * F.sqrt(F.col("approx_cn2"))),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("neighbor_id"), "adc_score")
    )


def cosine_topk_pq(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query,
    precompute LUT[subspace, code] = <q_sub, c_sub> (queries·m·n_codes
    rows — tiny, broadcast), then every corpus vector's approximate
    dot is the SUM of m table lookups over its codes and its
    approximate norm the sum of its codes' cn2 — no float vector
    arithmetic per pair at all, which is the entire point of PQ at
    scale: the scoring pass streams (id, subspace, code) ints and
    probes an in-memory table.

    Both per-pair sums fold over subspaces IN ORDER (array_sort +
    sequential fold, the ``kmeans_step`` convention) so the double
    arithmetic is bit-reproducible; ranking ties break on neighbor
    id. Returns (query_id, rank, neighbor_id, adc_score) with
    adc_score ≈ cosine(q, x)."""
    if codebook is None:
        codebook = pq_codebook(embeddings, m, n_codes, dim, id_col, vec_col)
    sub = dim // m
    codes = pq_encode(embeddings, codebook, m, dim, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(dot_sql(vec_col, vec_col, dim)).alias("qn2"),
    )
    lut = (
        _subspaces(q, m, sub, "qvec", "qsub")
        .join(F.broadcast(codebook), "subspace")
        .select(
            "query_id",
            "qn2",
            "subspace",
            "code",
            F.expr(dot_sql("qsub", "subvec", sub)).alias("pdot"),
            "cn2",
        )
    )
    return _adc_topk(codes, lut, id_col, k, cell_match=False)


def cosine_topk_ivfpq(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    codebook: DataFrame | None = None,
    n_probe: int = 1,
    residual: bool = False,
) -> DataFrame:
    """The composed serving path — IVF prune × PQ compress × ADC
    score: each query scores ONLY its centroid cell's inverted list
    (candidates ∝ |corpus|/n_centroids), and each candidate costs m
    LUT probes over its byte codes instead of a float dot. This is
    the architecture that serves billion-vector indexes; both halves
    (``similarity.cosine_topk_ivf``, ``cosine_topk_pq``) stay
    independently gated, and this composition is gated end-to-end.

    Scale: the cell join shuffles on (centroid_id ⋈) with the LUT
    broadcast; candidate work per query is |corpus|·n_probe/n_centroids
    · m integer probes. ``n_probe > 1`` (multi-probe) and
    ``residual=True`` (PQ over x − centroid — see the residual
    section below) route through ``ivfpq_candidates``; the default
    single-probe plain path keeps its original plan so the
    long-standing ann_cosine_ivfpq value hash is untouched."""
    from etl_reporting_spark.llm.similarity import ivf_assign

    if n_probe != 1 or residual:
        cands = ivfpq_candidates(
            embeddings,
            queries,
            n_probe=n_probe,
            residual=residual,
            n_centroids=n_centroids,
            m=m,
            n_codes=n_codes,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
            centroids=centroids,
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("adc_score").desc(), F.col("neighbor_id").asc()
        )
        return (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "adc_score")
        )

    if centroids is None:
        centroids = embeddings.filter(F.col(id_col) < n_centroids)
    if codebook is None:
        codebook = pq_codebook(embeddings, m, n_codes, dim, id_col, vec_col)
    sub = dim // m
    # cell id rides through the encode pass (extra_cols) — no join of
    # codes back onto a separate assignment relation
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    codes = pq_encode(
        assigned, codebook, m, dim, id_col, vec_col, extra_cols=("centroid_id",)
    )
    qcells = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("centroid_id").alias("qcell")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(dot_sql(vec_col, vec_col, dim)).alias("qn2"),
    ).join(qcells, "query_id")
    lut = (
        _subspaces(q, m, sub, "qvec", "qsub")
        .join(F.broadcast(codebook), "subspace")
        .select(
            "query_id",
            "qn2",
            "qcell",
            "subspace",
            "code",
            F.expr(dot_sql("qsub", "subvec", sub)).alias("pdot"),
            "cn2",
        )
    )
    return _adc_topk(codes, lut, id_col, k, cell_match=True)


# --- Residual encoding + multi-probe (round-7) ---------------------
#
# The classic IVF+PQ refinement: PQ quantizes x − c(cell(x)) instead
# of x. Residuals are much smaller in magnitude than raw vectors, so
# the same 16-code budget spends its resolution on the part of the
# vector the coarse quantizer didn't already explain — the ADC score
# error drops and recall at a fixed n_probe rises (Jégou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011,
# §IV.C). The reconstruction is x ≈ c + r̂, so
#
#     <q, x>  ≈ <q, c>           (exact, per probed cell)
#             + Σ_s LUT_r[s, code_s]      (residual ADC lookups)
#     ‖x‖²    ≈ ‖c‖² + Σ_s (2·<c_s, r̂_s> + ‖r̂_s‖²)
#
# where <c_s, r̂_s> comes from a (cell, subspace, code) table of
# n_centroids·m·n_codes rows — broadcast-sized at any corpus scale.
# Every added term is a fixed-shape double op folded in subspace
# order, so the residual path is value-hash-oracled exactly like the
# plain one.


def residualize(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Replace each vector with its IVF residual x − c(cell(x)).

    Returns (id, centroid_id, vec_col=residual array<double>). One
    map-only assignment pass (``ivf_assign`` with ``with_vec`` carries
    the winning centroid's vector out of the broadcast candidate
    array) + one narrow zip_with — no shuffle, no join."""
    from etl_reporting_spark.llm.similarity import ivf_assign

    assigned = ivf_assign(embeddings, centroids, id_col, vec_col, with_vec=True)
    return assigned.select(
        id_col,
        "centroid_id",
        F.expr(
            f"zip_with({vec_col}, __cvec,"
            " (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        ).alias(vec_col),
    )


def ivfpq_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    n_probe: int = 1,
    residual: bool = False,
    n_centroids: int = 8,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    codebook: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Scored IVF+PQ candidate set with the probe rank exposed:
    (query_id, probe_rn, neighbor_id, adc_score), one row per
    (query, candidate) pair whose candidate lives in one of the
    query's ``n_probe`` nearest cells. Rank/filter downstream for a
    top-k (``cosine_topk_ivfpq``) or sweep probe_rn thresholds from
    ONE encode+score pass (``ann_recall_sweep`` — candidate work is
    paid once at n_probe_max, not once per operating point).

    ``residual=True`` PQ-encodes x − c(cell(x)) (see module note):
    same plan shape — the only additions are two broadcast-sized
    tables (per-cell base terms, per-(cell,subspace,code) cross
    dots) folded into the LUT before the single scoring join.

    ``codes=`` (round-14) serves from a PRE-ENCODED corpus — rows of
    (id_col, subspace, code, centroid_id), e.g. a persisted index's
    inverted lists (``ann_index.PersistedAnnIndex``) — skipping the
    per-query encode pass entirely; ``centroids`` and ``codebook``
    (the FROZEN artifacts the codes were encoded against) are then
    required, and ``embeddings`` is never touched. Scoring is
    byte-identical to the inline path because ``pq_encode`` is pure
    in (vector, codebook)."""
    from etl_reporting_spark.llm.similarity import ivf_assign

    if codes is not None and (centroids is None or codebook is None):
        raise ValueError(
            "pre-encoded codes= requires the frozen centroids= and "
            "codebook= they were encoded against"
        )
    if centroids is None:
        centroids = embeddings.filter(F.col(id_col) < n_centroids)
    sub = dim // m

    if codes is None:
        # ONE map-only assignment pass serves both the cell id and (in
        # residual mode) the subtrahend centroid vector; the cell id
        # then rides through the encode pass (extra_cols) — the
        # previous formulation assigned twice (cells + residualize)
        # and joined codes back onto cells by id.
        assigned = ivf_assign(
            embeddings, centroids, id_col, vec_col, with_vec=residual
        )
        if residual:
            enc_src = assigned.select(
                id_col,
                "centroid_id",
                F.expr(
                    f"zip_with({vec_col}, __cvec,"
                    " (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
                ).alias(vec_col),
            )
        else:
            enc_src = assigned.select(id_col, "centroid_id", vec_col)
        if codebook is None:
            # caller-supplied codebooks (e.g. pq_train_codebook output)
            # must match the encoding: trained on residualize(...)
            # output when residual=True, on raw vectors otherwise
            codebook = pq_codebook(enc_src, m, n_codes, dim, id_col, vec_col)
        codes = pq_encode(
            enc_src, codebook, m, dim, id_col, vec_col, extra_cols=("centroid_id",)
        )

    probes = ivf_assign(
        queries, centroids, id_col, vec_col, n_nearest=n_probe, with_rank=True
    )
    q = probes.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.expr(dot_sql(vec_col, vec_col, dim)).alias("qn2"),
        F.col("centroid_id").alias("qcell"),
        "probe_rn",
    )
    if residual:
        # Per-cell base terms: <q, c> (exact part of the dot) and
        # ‖c‖² (base of the reconstructed norm).
        centn = centroids.select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).alias("__cvec"),
            F.expr(dot_sql(vec_col, vec_col, dim)).alias("base_cn2"),
        )
        q = (
            q.join(F.broadcast(centn), F.col("qcell") == F.col("__cid"))
            .withColumn("base_dot", F.expr(dot_sql("qvec", "__cvec", dim)))
            .drop("__cid", "__cvec")
        )
    else:
        q = q.withColumn("base_dot", F.lit(0.0)).withColumn("base_cn2", F.lit(0.0))

    lut = (
        _subspaces(q, m, sub, "qvec", "qsub")
        .join(F.broadcast(codebook.select("subspace", "code", "subvec", "cn2")), "subspace")
        .select(
            "query_id",
            "qn2",
            "qcell",
            "probe_rn",
            "base_dot",
            "base_cn2",
            "subspace",
            "code",
            F.expr(dot_sql("qsub", "subvec", sub)).alias("pdot"),
            "cn2",
        )
    )
    if residual:
        # Cross dots <c_s, codevec_s>: the norm correction's middle
        # term, keyed by the candidate's cell — which the scoring
        # join pins equal to qcell, so it composes into the LUT.
        csl = _subspaces(
            centroids.select(F.col(id_col).alias("__ccell"), F.col(vec_col).alias("__cv")),
            m,
            sub,
            "__cv",
            "__csub",
        ).select(
            "__ccell",
            F.col("subspace").alias("__csubspace"),
            "__csub",
        )
        ccdot = csl.join(
            F.broadcast(codebook.select(F.col("subspace").alias("__csubspace"),
                                        F.col("code").alias("__ccode"), "subvec")),
            "__csubspace",
        ).select(
            "__ccell",
            "__csubspace",
            "__ccode",
            F.expr(dot_sql("__csub", "subvec", sub)).alias("__ccdot"),
        )
        lut = (
            lut.join(
                F.broadcast(ccdot),
                (F.col("qcell") == F.col("__ccell"))
                & (F.col("subspace") == F.col("__csubspace"))
                & (F.col("code") == F.col("__ccode")),
            )
            .withColumn("cn2", F.lit(2.0) * F.col("__ccdot") + F.col("cn2"))
            .drop("__ccell", "__csubspace", "__ccode", "__ccdot")
        )

    lut_r = lut.withColumnRenamed("subspace", "l_subspace").withColumnRenamed(
        "code", "l_code"
    )
    cond = (
        (F.col("subspace") == F.col("l_subspace"))
        & (F.col("code") == F.col("l_code"))
        & (F.col("centroid_id") == F.col("qcell"))
    )
    parts = (
        codes.join(F.broadcast(lut_r), cond)
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(
            F.first("qn2").alias("qn2"),
            F.first("probe_rn").alias("probe_rn"),
            F.first("base_dot").alias("base_dot"),
            F.first("base_cn2").alias("base_cn2"),
            F.array_sort(
                F.collect_list(F.struct("subspace", "pdot", "cn2"))
            ).alias("__m"),
        )
        .withColumn(
            "adc_dot",
            F.col("base_dot")
            + F.expr("aggregate(__m, CAST(0 AS DOUBLE), (acc, e) -> acc + e.pdot)"),
        )
        .withColumn(
            "approx_cn2",
            F.col("base_cn2")
            + F.expr("aggregate(__m, CAST(0 AS DOUBLE), (acc, e) -> acc + e.cn2)"),
        )
    )
    return parts.select(
        "query_id",
        "probe_rn",
        F.col(id_col).alias("neighbor_id"),
        (
            F.col("adc_dot") / (F.sqrt(F.col("qn2")) * F.sqrt(F.col("approx_cn2")))
        ).alias("adc_score"),
    )


def exact_rerank(
    candidates: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "adc_score",
    dim: int = 64,
) -> DataFrame:
    """Refine stage (the "R" of IVFADC-R, Jégou et al. 2011 §V):
    shortlist the top-``shortlist`` candidates per query by the
    approximate score, exact-cosine ONLY those, re-rank, keep top-k.

    This is the lever that closes the ADC-vs-exact ranking gap: the
    measured sweep (plans/llm_queries.ann_recall_sweep) shows seed-
    codebook ADC alone ranks at recall@5 ≈ 0.4-0.5 while the same
    shortlist refined exactly reaches the IVF cell ceiling (≥ 0.8 at
    every probed level). Cost: ``shortlist`` full-width vector reads
    + exact dots per query — candidates ∝ n_queries·shortlist, so the
    refine join is query-sized, never corpus-sized. The exact cosine
    reuses the brute-force fold/tie-break conventions, so refined
    output stays value-hash-oracled.

    Returns (query_id, rank, neighbor_id, cosine).
    """
    from etl_reporting_spark.llm.similarity import _cosine_expr

    w_s = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col("neighbor_id").asc()
    )
    short = (
        candidates.withColumn("__srn", F.row_number().over(w_s))
        .filter(F.col("__srn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
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
        short.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("dot", F.expr(dot_sql("qvec", "cvec", dim)))
        .withColumn("cosine", _cosine_expr())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
