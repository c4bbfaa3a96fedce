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


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    levels: int = 255,
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
    return out.withColumn("q_sum", F.expr(_QSUM.format(a="qvec"))).withColumn(
        "q_norm2", F.expr(_QDOT.format(a="qvec", b="qvec"))
    )


def _dequant_dot(a: str, b: str, dim_expr: str) -> F.Column:
    """<deq(a), deq(b)> from integer sums + scalars (see module doc).

    ``{a}_qvec/_q_sum/_q_mn/_q_scale`` columns must exist for both
    prefixes; ``dim_expr`` is the shared dimensionality expression.
    """
    qdot = F.expr(_QDOT.format(a=f"{a}_qvec", b=f"{b}_qvec")).cast("double")
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
) -> DataFrame:
    """Brute-force top-k cosine over int8-quantized vectors.

    Same plan shape as the float baseline (queries broadcast, corpus
    partitioned, one per-query window rank) but the scoring kernel is
    the integer-sum dequantized dot — 4× less corpus I/O and an
    exactly-reproducible "approximate" score. Ties break on neighbor
    id; ranks are total.
    """

    def _prefixed(df: DataFrame, p: str, out_id: str) -> DataFrame:
        q = quantize_embeddings(df, vec_col=vec_col, levels=levels)
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
    dim = "size(q_qvec)"
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dot", _dequant_dot("q", "c", dim))
        .withColumn(
            "cosine",
            F.col("dot")
            / (F.sqrt(_dequant_norm2("q", dim)) * F.sqrt(_dequant_norm2("c", dim))),
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
