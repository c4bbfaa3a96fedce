"""Corpus-hygiene operators for pretraining pipelines: line-level
boilerplate dedup, per-source quotas, distinct-cardinality sketches,
and deterministic training-order assignment.

These fill the gap between document-level dedup (``llm.dedup``) and
sampling (``llm.sampling``): real web corpora need *sub-document*
cleaning (the same nav-bar/footer line repeated across millions of
pages — the C4/RefinedWeb "remove lines seen in many documents" rule),
*per-source caps* (no single crawl domain may dominate the mixture),
cheap *cardinality estimates* over groups too large to COUNT(DISTINCT)
exactly, and a *reproducible global shuffle* that fixes the order
training examples are consumed in.

Design rules shared with the rest of the llm layer:

- every decision keys on md5 of row content — rerun- and
  repartition-stable, and reproducible by the DuckDB oracles;
- narrow expressions + the minimum shuffle count: the frequent-line
  set is aggregated small then broadcast back (anti-join, no second
  wide shuffle of the corpus); quotas and ordering use one window per
  group/shard and stay WindowGroupLimit-eligible where a rank filter
  follows;
- no driver-side collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash32(col: Column, salt: str = "") -> Column:
    """First 8 md5 hex chars of (salt || value) as a 32-bit int —
    the shared deterministic ordering/bucketing key."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def frequent_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_doc_frac: float | None = None,
    min_docs: int | None = None,
) -> DataFrame:
    """Lines (text split on ``delimiter``) that occur in at least
    ``min_docs`` documents (or ``min_doc_frac`` of the corpus) —
    the boilerplate set line-level dedup removes.

    Scale shape: explode → per-doc DISTINCT line (map-side combinable
    groupBy) → count docs per line → threshold filter. The output is
    tiny relative to the corpus (only lines shared across many docs
    survive), which is what makes :func:`remove_frequent_lines`'s
    broadcast anti-join viable at 100 TB.
    """
    if (min_doc_frac is None) == (min_docs is None):
        raise ValueError("pass exactly one of min_doc_frac / min_docs")
    lines = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.col(text_col), F.lit(delimiter), -1)).alias("line"),
    ).filter(F.length("line") > 0)
    per_doc = lines.distinct()  # one vote per (doc, line)
    counts = per_doc.groupBy("line").agg(F.count(F.lit(1)).alias("n_docs"))
    if min_docs is None:
        total = df.select(F.count(F.lit(1)).alias("__n"))
        counts = counts.crossJoin(F.broadcast(total)).filter(
            F.col("n_docs") >= F.ceil(F.lit(float(min_doc_frac)) * F.col("__n"))
        ).drop("__n")
    else:
        counts = counts.filter(F.col("n_docs") >= F.lit(int(min_docs)))
    return counts


def remove_frequent_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_doc_frac: float | None = None,
    min_docs: int | None = None,
    boilerplate: DataFrame | None = None,
) -> DataFrame:
    """C4/RefinedWeb-style line-level boilerplate removal: drop every
    line that appears in ≥ threshold documents, reassemble the
    remaining lines in their original order.

    Returns the input columns with ``text_col`` rewritten plus
    ``n_lines_kept`` / ``n_lines_removed``. Documents whose every
    line is boilerplate survive with empty text (count columns make
    them easy to filter downstream).

    Scale shape: the only corpus-wide shuffle is the per-doc
    reassembly groupBy; the boilerplate set is computed small
    (:func:`frequent_lines`) and hinted broadcast into a left-anti
    lookup, so the corpus is never joined wide-to-wide. Pass a
    precomputed ``boilerplate`` frame (column ``line``) to reuse one
    scan across daily increments — the signature-store pattern.
    """
    if boilerplate is None:
        boilerplate = frequent_lines(
            df, id_col, text_col, delimiter,
            min_doc_frac=min_doc_frac, min_docs=min_docs,
        )
    keep_cols = [c for c in df.columns if c != text_col]
    # Empty segments stay in (flagged dead below) so every document
    # anchors the reassembly groupBy — no recovery join needed for
    # docs whose text is empty or all-delimiter.
    lines = df.select(
        *keep_cols,
        F.posexplode(F.split(F.col(text_col), F.lit(delimiter), -1)).alias(
            "__pos", "__line"
        ),
    )
    flagged = lines.join(
        F.broadcast(boilerplate.select(F.col("line").alias("__line"), F.lit(True).alias("__bp"))),
        "__line",
        "left",
    )
    # Reassemble: collect (pos, line, is_bp) per doc, sort by position
    # (array_sort on the struct — pos leads, so order is original),
    # then rebuild text from the non-boilerplate lines.
    rebuilt = (
        flagged.groupBy(*keep_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__line", "__bp"))
            ).alias("__parts")
        )
        .select(
            *keep_cols,
            F.array_join(
                F.transform(
                    F.filter(
                        "__parts",
                        lambda p: p["__bp"].isNull() & (F.length(p["__line"]) > 0),
                    ),
                    lambda p: p["__line"],
                ),
                delimiter,
            ).alias(text_col),
            F.size(
                F.filter(
                    "__parts",
                    lambda p: p["__bp"].isNull() & (F.length(p["__line"]) > 0),
                )
            ).alias("n_lines_kept"),
            F.size(F.filter("__parts", lambda p: p["__bp"].isNotNull())).alias(
                "n_lines_removed"
            ),
        )
    )
    return rebuilt


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    id_col: str = "doc_id",
    salt: str = "cap",
    keep_col: str | None = None,
) -> DataFrame:
    """Per-source/domain quota: keep at most ``max_rows`` rows per
    group, selected by deterministic hash order (not arrival order,
    which is partition-layout-dependent, and not "first N", which
    biases toward old data).

    One hash-partitioned window per group with a rank filter — the
    exact shape Spark rewrites to WindowGroupLimit, so each group's
    scan stops accumulating past ``max_rows`` map-side before the
    shuffle. With ``keep_col`` set, rows are labelled instead of
    filtered (per-doc fate reporting, mirroring curate_corpus).
    """
    order = _hash32(F.col(id_col), salt)
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col).asc())
    rn = F.row_number().over(w)
    if keep_col is not None:
        return df.withColumn(keep_col, rn <= F.lit(int(max_rows)))
    return (
        df.withColumn("__rn", rn)
        .filter(F.col("__rn") <= F.lit(int(max_rows)))
        .drop("__rn")
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "",
) -> DataFrame:
    """K-minimum-values distinct-cardinality sketch per group:
    ``est_distinct ≈ (k-1) / kth_min_hash_fraction``.

    The deterministic, oracle-checkable alternative to
    approx_count_distinct (HLL±: partition-order-dependent merge, not
    reproducible cross-engine). Scale shape — two bounded shuffles,
    no unbounded state:

    1. ``distinct(group, hash)`` — map-side combinable, output ≤ true
       cardinality;
    2. per-group ``row_number ≤ k`` over hash order —
       WindowGroupLimit caps map-side state at k rows per group;
    3. final groupBy takes the count and the k-th (max surviving)
       hash.

    Groups with < k distinct values report the exact count
    (``exact=true``). Estimates use the 32-bit hash as a fraction of
    2^32; a single double division keeps the arithmetic
    bit-reproducible in DuckDB.
    """
    h = _hash32(F.col(value_col), salt)
    hashed = df.select(F.col(group_col).alias("grp"), h.alias("__h")).distinct()
    w = Window.partitionBy("grp").orderBy(F.col("__h").asc())
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= F.lit(int(k))
    )
    agg = topk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__h").alias("kth_hash"),
    )
    frac = F.col("kth_hash").cast("double") / F.lit(float(2**32))
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_kept"),
        (F.col("n_kept") < F.lit(int(k))).alias("exact"),
        F.when(F.col("n_kept") < F.lit(int(k)), F.col("n_kept").cast("double"))
        .otherwise((F.lit(float(k - 1))) / frac)
        .alias("est_distinct"),
    )


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    shards: int = 256,
    salt: str = "epoch0",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle for training-example order: every
    row gets a ``(shard, pos)`` address that is a pure function of
    (salt, id). A different ``salt`` ("epoch1", …) yields an
    independent permutation — reshuffling between epochs without RNG
    state or a corpus-wide sort.

    Scale shape: shard assignment is a narrow expression; position is
    one row_number window per shard (corpus/shards rows each), so the
    only shuffle is hash-partitioning by shard — no global orderBy,
    no single-reducer tail. Readers stream shard files in shard order
    and rows in pos order and observe the same sequence everywhere.
    """
    h = _hash32(F.col(id_col), salt)
    out = df.withColumn(shard_col, F.pmod(h, F.lit(int(shards))))
    w = Window.partitionBy(shard_col).orderBy(
        _hash32(F.col(id_col), salt + "|pos").asc(), F.col(id_col).asc()
    )
    return out.withColumn(pos_col, F.row_number().over(w))


def sampled_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = 256,
    salt: str = "q",
) -> DataFrame:
    """Deterministic sampled quantiles per group — the reproducible
    alternative to percentile_approx (whose KLL-style sketch is
    partition-merge-order-dependent) when a group is too large for
    exact percentiles.

    The sample is the k hash-smallest rows per group (uniform: row
    ids hash uniformly; WindowGroupLimit caps map-side state at k, as
    in :func:`kmv_distinct`), and the quantiles are EXACT interpolated
    percentiles over that sample — Spark's ``percentile`` and
    DuckDB's ``percentile_cont`` share the a + f·(b−a) rule, so
    results reproduce bit-for-bit cross-engine. Sampling error
    ~1/sqrt(k) per quantile; groups smaller than k are exact.
    """
    h = _hash32(F.col(id_col), salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    samp = (
        df.select(group_col, value_col, id_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(k)))
    )
    aggs = [F.count(F.lit(1)).alias("n_sampled")]
    for q in percentiles:
        aggs.append(
            F.expr(f"percentile({value_col}, {q!r})").alias(f"p{int(round(q * 100))}")
        )
    return samp.groupBy(group_col).agg(*aggs)


def global_sampled_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    quantiles: dict[str, float],
    k: int = 256,
    salt: str = "gq",
) -> DataFrame:
    """One-row threshold frame: EXACT interpolated percentiles over
    the k hash-smallest rows of the WHOLE relation — the corpus-wide
    (ungrouped) twin of :func:`sampled_quantiles`, for operators that
    need a global cut-point (CCNet tertiles, DSIR top-fraction)
    without a whole-corpus percentile buffer.

    Why not exact ``percentile()`` over everything: Spark's exact
    percentile aggregate buffers every distinct value in its merge
    state, and division-produced double scores are essentially all
    distinct — at 10⁹ documents that is a multi-GB single-task
    buffer. Here state is bounded everywhere: Catalyst rewrites the
    rank filter into ``TakeOrderedAndProject(k)`` (verified in the
    physical plan) — each map task keeps a k-row heap, the merge
    task sees ≤ k·num_partitions rows, and the percentile buffers ≤
    k values, regardless of corpus size. Sampling error ~1/sqrt(k)
    per quantile; corpora smaller than k are exact.

    Determinism: the sample is keyed by the md5-derived ``_hash32``
    of the row id (uniform, engine-independent), and the percentile
    interpolation (a + f·(b−a)) matches DuckDB's percentile_cont —
    so an oracle drawing the identical sample reproduces the
    thresholds bit-for-bit.

    ``quantiles`` maps output column name -> percentile fraction.
    """
    h = _hash32(F.col(id_col), salt)
    # Single-partition window by construction: Catalyst rewrites the
    # rn <= k filter below into TakeOrderedAndProject(limit=k)
    # (verified in the executed physical plan), so the one task sees
    # <= k rows — the "No Partition Defined for Window" warning is
    # benign here.
    w = Window.partitionBy(F.lit(0)).orderBy(h.asc(), F.col(id_col).asc())
    samp = (
        df.select(value_col, id_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(int(k)))
    )
    aggs = [
        F.expr(f"percentile({value_col}, {q!r})").alias(name)
        for name, q in quantiles.items()
    ]
    return samp.agg(*aggs)


def countmin_sketch(
    df: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
    salt: str = "cm",
) -> DataFrame:
    """Count-min sketch build: frequency estimation in depth×width
    bounded state, the streaming/mergeable alternative to an exact
    term census when the vocabulary is unbounded (URLs, n-grams,
    user-ids). Each input row lands in one bucket per sketch row
    (md5-derived ``_hash32`` with a per-row salt — deterministic and
    cross-engine-reproducible, unlike hash functions with engine-
    private seeds); counts are summed per (sketch_row, bucket).

    Output: (sketch_row, bucket, cnt) — at most depth·width rows
    regardless of input size, always broadcastable. Point queries via
    :func:`countmin_estimate`; two sketches with identical
    (depth, width, salt) merge by adding counts (union + re-sum) —
    the property that makes this the right shape for per-partition /
    per-day build then combine.

    Scale: one narrow explode (depth per row, a small constant) into
    ONE map-side-combinable groupBy whose key space is depth·width —
    partial aggregation collapses everything executor-side, so the
    shuffle moves at most depth·width rows per task, not the corpus.
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    buckets = F.array(
        *[(_hash32(F.col(term_col), f"{salt}{d}") % width) for d in range(depth)]
    )
    return (
        df.select(F.posexplode(buckets).alias("sketch_row", "bucket"), w.alias("__w"))
        .groupBy("sketch_row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cm",
) -> DataFrame:
    """Point-query a count-min sketch: estimate = MIN over sketch
    rows of the count in bucket h_d(term) (an absent bucket is 0).
    The classic guarantee: estimate ≥ true count always, and ≤ true
    + ε·N with probability 1−δ for width = e/ε, depth = ln(1/δ).

    The sketch (≤ depth·width rows) broadcasts; per-term work is one
    explode + one broadcast join + one min — never a corpus scan.
    """
    buckets = F.array(
        *[(_hash32(F.col(term_col), f"{salt}{d}") % width) for d in range(depth)]
    )
    probes = terms.select(
        F.col(term_col), F.posexplode(buckets).alias("sketch_row", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["sketch_row", "bucket"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate"))
    )


def bloom_build(
    df: DataFrame,
    term_col: str,
    m_bits: int = 4096,
    k: int = 5,
    salt: str = "bf",
) -> DataFrame:
    """Bloom filter build: set membership in m_bits of state — the
    shape for "have we seen this URL / span / benchmark phrase"
    screens where the reference set is huge but the answer is one
    bit. Bit positions come from k salted ``_hash32`` draws
    (deterministic, cross-engine-reproducible); the filter
    materializes as packed 32-bit words (word_idx = pos >> 5,
    bit = pos & 31 — shift/mask arithmetic identical across engines
    on positive ints, no float-division rounding divergence):
    (word_idx, word) with at
    most m_bits/32 rows — always broadcastable, and two filters with
    identical (m_bits, k, salt) merge by OR-ing words.

    32-bit packing (not 64) is deliberate: every word value stays in
    [0, 2^32) — positive in a signed BIGINT — so shifts/ORs behave
    identically in Spark and DuckDB with no two's-complement edge at
    bit 63.

    Scale: one narrow explode (k per row) into one map-side-
    combinable bit_or groupBy over ≤ m_bits/32 keys; the shuffle
    moves at most m_bits/32 rows per task regardless of corpus size.
    False-positive rate ≈ (1 - e^(-k·n/m))^k; size m_bits ≈ 1.44·k·n
    for the classic optimum.
    """
    pos = [(_hash32(F.col(term_col), f"{salt}{i}") % m_bits) for i in range(k)]
    words = F.array(
        *[
            F.struct(
                F.shiftright(p, 5).alias("word_idx"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), p.bitwiseAND(F.lit(31)).cast("int")
                ).alias("word"),
            )
            for p in pos
        ]
    )
    return (
        df.select(F.explode(words).alias("w"))
        .select("w.word_idx", "w.word")
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )


def bloom_contains(
    bloom: DataFrame,
    terms: DataFrame,
    term_col: str,
    m_bits: int = 4096,
    k: int = 5,
    salt: str = "bf",
) -> DataFrame:
    """Probe a Bloom filter: a term is a member iff ALL k of its bits
    are set (no false negatives ever; false positives at the designed
    rate). The filter (≤ m_bits/32 rows) broadcasts; per-term work is
    one explode + one broadcast join + one conjunction aggregate —
    never a scan of the original set.
    """
    pos = [(_hash32(F.col(term_col), f"{salt}{i}") % m_bits) for i in range(k)]
    probes = terms.select(
        F.col(term_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.shiftright(p, 5).alias("word_idx"),
                        F.call_function(
                            "shiftleft", F.lit(1).cast("long"), p.bitwiseAND(F.lit(31)).cast("int")
                        ).alias("need"),
                    )
                    for p in pos
                ]
            )
        ).alias("w"),
    ).select(term_col, "w.word_idx", "w.need")
    return (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "__hit",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("need")) == F.col("need")).cast(
                "int"
            ),
        )
        .groupBy(term_col)
        .agg(F.min("__hit").alias("bloom_member"))
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 8,
    salt: str = "",
) -> DataFrame:
    """HyperLogLog distinct-cardinality sketch per group (Flajolet et
    al. 2007) — the register-array sibling of :func:`kmv_distinct`,
    deterministic and oracle-checkable unlike approx_count_distinct
    (whose HLL± merge is partition-order-dependent).

    Register = top ``p`` bits of the 32-bit md5 hash; rho = leading-
    zero count of the remaining ``32 - p`` bits + 1 (computed as
    ``(32 - p + 1) - bit_length(w)`` via the base-2 string length —
    no libm). State is ≤ 2^p rows per group (a per-register MAX —
    map-side combinable, mergeable across days by the same MAX).
    The estimate keeps every float op bit-reproducible: 2^{-M} is an
    EXACT integer shift (``1.0 / (1 << M)``), and the register sum
    adds ≤ 2^p dyadic rationals of granularity ≥ 2^-(33-p) — exactly
    representable, so even the "approximate" estimate hash-matches
    cross-engine. Raw HLL estimator only (alpha_m · m² / Σ2^{-M_j});
    the low-range linear-counting and high-range corrections need
    ``ln`` (libm, last-ulp engine-dependent) and are deliberately
    omitted — production reads ``n_registers_hit`` to decide if the
    raw estimate is in its accurate band.

    Returns (group, n_registers_hit, sum_inv bigint-exact double,
    est_distinct).
    """
    m = 1 << p
    # alpha_m for m >= 128 (Flajolet et al. §4): 0.7213 / (1 + 1.079/m)
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    h = _hash32(F.col(value_col), salt)
    w_bits = 32 - p
    hashed = df.select(
        F.col(group_col).alias("grp"),
        (h / F.lit(1 << w_bits)).cast("long").alias("__reg"),
        (h % F.lit(1 << w_bits)).alias("__w"),
    )
    rho = F.when(F.col("__w") == 0, F.lit(w_bits + 1)).otherwise(
        F.lit(w_bits + 1) - F.length(F.conv(F.col("__w"), 10, 2))
    )
    regs = (
        hashed.withColumn("__rho", rho)
        .groupBy("grp", "__reg")
        .agg(F.max("__rho").alias("__m"))
    )
    agg = regs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_registers_hit"),
        F.sum(
            F.expr(
                "1.0D / CAST(shiftleft(CAST(1 AS BIGINT), CAST(__m AS INT))"
                " AS DOUBLE)"
            )
        ).alias("sum_inv"),
    )
    est = (
        F.lit(alpha)
        * F.lit(float(m * m))
        / (
            F.col("sum_inv")
            + (F.lit(m) - F.col("n_registers_hit")).cast("double")
        )
    )
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_registers_hit").cast("bigint").alias("n_registers_hit"),
        F.col("sum_inv"),
        est.alias("est_distinct"),
    )

