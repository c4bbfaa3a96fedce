"""Deterministic sampling / dataset-split operators for training-data
pipelines.

Spark's own ``randomSplit`` / ``sample`` draw per-partition random
streams, so results change whenever the input's partitioning changes —
unacceptable for a 100 TB corpus that must reproduce the same
train/val/test membership across reruns, AQE re-plans, and cluster
resizes. These operators key every decision on ``md5(id)`` instead:

- narrow column expressions, zero shuffles, no RNG state;
- membership is a pure function of the row's id (+ salt), stable under
  any re-partitioning and incrementally consistent (new rows never move
  old rows between splits);
- reproducible by any engine that has md5 — which is what the DuckDB
  oracles verify.

The bucket is the first 8 hex chars of md5 (32 uniform bits), taken
``pmod`` the bucket count. With 10**3-ish bucket counts the 2**32
modulus bias is < 0.0001% — negligible against the statistical noise of
any real split.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(
    id_col: str | Column, buckets: int = 1000, salt: str = ""
) -> Column:
    """Uniform deterministic bucket in [0, buckets): first 8 md5 hex
    chars of (salt || id) as a 32-bit int, mod buckets. A different
    ``salt`` gives an independent assignment (e.g. one for splitting,
    one for subsampling) without correlation between the two."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hexpart = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    return F.pmod(F.conv(hexpart, 16, 10).cast("long"), F.lit(buckets))


def with_hash_split(
    df: DataFrame,
    weights: Mapping[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    split_name: str = "split",
    buckets: int = 1000,
) -> DataFrame:
    """Label each row with a split name by cumulative-weight ranges
    over the hash bucket — the deterministic replacement for
    ``randomSplit``. ``weights`` values must sum to 1.0; iteration
    order fixes which splits absorb the rounding remainder (the last
    split gets every bucket past the final boundary)."""
    total = float(sum(weights.values()))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = hash_bucket(id_col, buckets=buckets, salt=salt)
    names = list(weights)
    expr: Column | None = None
    cum = 0.0
    # when/otherwise chain over cumulative boundaries; boundaries are
    # int(round(...)) so both engines compare against exact integers.
    for name in names[:-1]:
        cum += float(weights[name])
        bound = int(round(cum * buckets))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_name, label)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
    buckets: int = 100_000,
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by hash bucket — stable
    across reruns and repartitioning, unlike ``DataFrame.sample``.
    The filter is a narrow predicate, so it pushes down and composes
    with partition pruning."""
    bound = int(round(float(fraction) * buckets))
    return df.filter(hash_bucket(id_col, buckets=buckets, salt=salt) < F.lit(bound))


def pack_documents(
    df: DataFrame,
    budget_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shards: int = 256,
    shard_salt: str = "pack",
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (pretraining
    sample assembly): docs are sharded by hash (so packing
    parallelizes — one window per shard, never a whole-corpus sort),
    ordered by id within the shard, and a doc joins the pack its
    START offset falls in (``floor(start / budget)``).

    Boundary-fill semantics, the standard distributed approximation of
    first-fit: docs are never split, every pack's start boundary is
    exact, and a pack can overrun its budget by at most the tail of
    its last document. Output adds ``shard``, ``pack_id`` (unique
    across shards), and ``pack_offset`` (the doc's start within the
    pack). Deterministic: identical across reruns and repartitioning.
    """
    from pyspark.sql import Window

    shard = hash_bucket(id_col, buckets=shards, salt=shard_salt)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("shard", shard).withColumn(
        "__end", F.sum(F.col(token_col).cast("long")).over(w)
    )
    start = F.col("__end") - F.col(token_col)
    pack_in_shard = F.floor(start / F.lit(budget_tokens))
    return (
        out.withColumn("pack_id", F.col("shard") * F.lit(2**32) + pack_in_shard)
        .withColumn("pack_offset", start - pack_in_shard * F.lit(budget_tokens))
        .drop("__end")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    buckets: int = 100_000,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive
    (e.g. keep 100% of books, 10% of common-crawl). Deterministic
    twin of ``sampleBy``: same hash-bucket rule, one narrow filter,
    no RNG. Strata absent from ``fractions`` get
    ``default_fraction``."""
    bucket = hash_bucket(id_col, buckets=buckets, salt=salt)
    bound: Column = F.lit(int(round(float(default_fraction) * buckets)))
    for value, frac in fractions.items():
        bound = (
            F.when(F.col(strata_col) == F.lit(value), F.lit(int(round(float(frac) * buckets))))
            .otherwise(bound)
        )
    return df.filter(bucket < bound)


def mixture_weights(
    df: DataFrame,
    group_col: str,
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture weights per source/language/domain:
    ``w(g) ∝ n(g)^alpha``, the standard up-weighting of small sources
    when assembling a multi-source training mixture (alpha=1 is
    proportional, alpha→0 is uniform; multilingual pipelines typically
    use 0.25–0.7).

    Returns one row per group: ``n_docs``, ``w_raw`` (n^alpha),
    ``weight`` (normalized), and ``planned_docs =
    min(n, floor(budget * weight))`` — the per-group quota a
    downstream sampler enforces.

    Determinism: alpha ∈ {1.0, 0.5, 0.25} computes via repeated
    ``sqrt`` (IEEE-correctly-rounded in every engine → bit-exact);
    other alphas fall back to ``pow`` (libm — reproducible on one
    engine, not guaranteed across engines). The normalizing total is a
    left fold over the groups in group order (``aggregate`` over
    ``array_sort(collect_list)``), not a partition-order ``SUM`` —
    group counts are tiny (one row per source), so the single-row
    fold costs nothing and makes the weights reproducible.
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    n = F.col("n_docs").cast("double")
    if alpha == 1.0:
        w_raw = n
    elif alpha == 0.5:
        w_raw = F.sqrt(n)
    elif alpha == 0.25:
        w_raw = F.sqrt(F.sqrt(n))
    else:
        w_raw = F.pow(n, F.lit(float(alpha)))
    counts = counts.withColumn("w_raw", w_raw)
    total = counts.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("grp"), F.col("w_raw")))),
            F.lit(0.0),
            lambda acc, s: acc + s["w_raw"],
        ).alias("w_total")
    )
    out = counts.crossJoin(F.broadcast(total))
    weight = F.col("w_raw") / F.col("w_total")
    planned = F.least(
        F.col("n_docs"),
        F.floor(F.lit(float(budget)) * weight).cast("long"),
    )
    return out.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "w_raw",
        weight.alias("weight"),
        planned.alias("planned_docs"),
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    budget: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "mix",
    keep_col: str | None = None,
) -> DataFrame:
    """Select ~``budget`` rows with per-group quotas from
    ``mixture_weights`` — the composed data-mixing pass: weights
    (tiny, broadcast back onto the corpus) + one hash-ordered rank
    window per group (WindowGroupLimit-eligible, same shape as
    ``corpusops.cap_per_group``). With ``keep_col`` set, rows are
    labelled instead of filtered (fate reporting). Deterministic:
    membership is a pure function of (salt, id, group census).
    """
    from pyspark.sql import Window

    quotas = mixture_weights(df, group_col, budget=budget, alpha=alpha).select(
        F.col(group_col), F.col("planned_docs")
    )
    hexpart = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )
    order = F.conv(hexpart, 16, 10).cast("long")
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col).asc())
    ranked = df.join(F.broadcast(quotas), on=group_col, how="inner").withColumn(
        "__rn", F.row_number().over(w)
    )
    if keep_col is not None:
        return ranked.withColumn(
            keep_col, F.col("__rn") <= F.col("planned_docs")
        ).drop("__rn", "planned_docs")
    return ranked.filter(F.col("__rn") <= F.col("planned_docs")).drop(
        "__rn", "planned_docs"
    )


def pack_documents_bfd(
    df: DataFrame,
    budget_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    shards: int = 256,
    shard_salt: str = "pack",
) -> DataFrame:
    """Best-fit-decreasing packing — the higher-utilization
    alternative to :func:`pack_documents`' boundary fill, for when
    pad-token waste matters more than streaming simplicity. Docs
    shard by hash exactly as ``pack_documents`` (parallelism = shard
    count, no global state); WITHIN a shard the classic BFD runs in
    an Arrow-batched ``applyInPandas``: sort by (tokens DESC, id),
    place each doc into the fullest bin it still fits (ties: lowest
    bin), open a new bin when none fits. Oversized docs (> budget)
    get a bin of their own rather than being dropped silently.

    Deterministic: the shard assignment is hash-based and the
    in-shard order is total, so reruns and repartitioning reproduce
    bit-identically (the per-shard pandas group arrives complete —
    groupBy semantics — regardless of upstream partitioning).

    BFD is O(n log n) per shard with a small constant; shards bound
    the group size, so executor memory holds one shard's doc list,
    never the corpus. Returns (doc_id, shard, bin_idx, bin_fill) —
    bin_fill repeated per member for downstream utilization audits.
    """
    import bisect

    import pandas as pd

    budget = int(budget_tokens)

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        docs = sorted(
            zip(pdf[id_col], pdf[token_col]), key=lambda x: (-int(x[1]), int(x[0]))
        )
        # bins kept sorted by remaining capacity for bisect lookup:
        # entries are (remaining, bin_idx)
        bins: list[tuple[int, int]] = []
        fills: dict[int, int] = {}
        assign: dict[int, int] = {}
        for doc, tok in docs:
            doc, tok = int(doc), int(tok)
            # smallest remaining >= tok ("best fit"); ties → the entry
            # with the lowest bin_idx at that remaining (tuple order)
            i = bisect.bisect_left(bins, (tok, -1))
            if i < len(bins):
                rem, b = bins.pop(i)
                bins.insert(bisect.bisect_left(bins, (rem - tok, b)), (rem - tok, b))
                assign[doc] = b
                fills[b] += tok
            else:
                b = len(fills)
                fills[b] = tok
                rem = max(budget - tok, 0)
                bins.insert(bisect.bisect_left(bins, (rem, b)), (rem, b))
                assign[doc] = b
        shard_val = int(pdf["shard"].iloc[0])
        return pd.DataFrame(
            {
                id_col: list(assign.keys()),
                "shard": shard_val,
                "bin_idx": [assign[d] for d in assign],
                "bin_fill": [fills[assign[d]] for d in assign],
            }
        )

    shard = hash_bucket(id_col, buckets=shards, salt=shard_salt)
    return (
        df.select(F.col(id_col), F.col(token_col), shard.alias("shard"))
        .groupBy("shard")
        .applyInPandas(
            pack, schema=f"{id_col} long, shard int, bin_idx int, bin_fill long"
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    weights: "Mapping[str, float]",
    clusters: DataFrame | None = None,
    id_col: str = "doc_id",
    salt: str = "",
    split_name: str = "split",
    k: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across
    splits: the hash-split key is the document's near-dup CLUSTER id,
    not its own id — every member of a cluster lands in the same
    split by construction. Splitting doc-wise first and deduping
    later (or vice versa, per split) is the classic eval-contamination
    bug: a test document's near-twin in train inflates every metric.

    Pass ``clusters`` (a ``near_duplicate_clusters`` output, usually
    materialized by the nightly dedup pass) to reuse existing work;
    otherwise it is derived here with (k, min_jaccard). Output: one
    row per doc — (id, cluster_id, cluster_size, split).

    Scale: one id-join against the cluster table on top of whatever
    the cluster pass cost; the split itself is the same narrow
    hash-bucket expression as :func:`with_hash_split`.
    """
    if clusters is None:
        from etl_reporting_spark.llm.cluster import near_duplicate_clusters

        clusters = near_duplicate_clusters(
            docs, k=k, min_jaccard=min_jaccard, text_col=text_col, id_col=id_col
        )
    labeled = with_hash_split(
        clusters.select(id_col, "cluster_id", "cluster_size"),
        weights,
        id_col="cluster_id",
        salt=salt,
        split_name=split_name,
    )
    return labeled


def epoch_plan(
    df: DataFrame,
    group_col: str,
    token_col: str,
    budget_tokens: int,
    alpha: float = 0.5,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Data-constrained epoch planning: given per-source token
    inventories, a temperature mixture and a total token budget,
    decide how many EPOCHS of each source to run (Muennighoff et al.
    2023, arXiv:2305.16264 — repeating data up to ~4 epochs costs
    little vs fresh data; beyond that returns decay, hence the
    ``max_epochs`` cap).

    One row per source: ``available_tokens``, the temperature weight
    (``available^alpha``, normalized with the same group-ordered fold
    as :func:`mixture_weights`), ``ideal_tokens = budget·weight``,
    ``epochs = min(max_epochs, ideal/available)``,
    ``planned_tokens = floor(min(ideal, available·max_epochs))``, and
    ``capped`` — true when the cap bites, i.e. the mixture wants more
    of this source than ``max_epochs`` passes can supply. A planner
    that redistributes the unabsorbed budget iterates this relation
    (it is one tiny row per source — driver-side iteration is free);
    the single-pass plan is what the gate verifies.

    Determinism: integer token sums; sqrt-family weights
    (IEEE-correctly-rounded); the normalizing total folds in group
    order; everything after is one multiply/divide/min per row.
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).alias("available_tokens"),
    )
    n = F.col("available_tokens").cast("double")
    if alpha == 1.0:
        w_raw = n
    elif alpha == 0.5:
        w_raw = F.sqrt(n)
    elif alpha == 0.25:
        w_raw = F.sqrt(F.sqrt(n))
    else:
        w_raw = F.pow(n, F.lit(float(alpha)))
    counts = counts.withColumn("w_raw", w_raw)
    total = counts.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("grp"), F.col("w_raw")))),
            F.lit(0.0),
            lambda acc, s: acc + s["w_raw"],
        ).alias("w_total")
    )
    out = counts.crossJoin(F.broadcast(total))
    weight = F.col("w_raw") / F.col("w_total")
    ideal = F.lit(float(budget_tokens)) * weight
    avail = F.col("available_tokens").cast("double")
    cap = avail * F.lit(float(max_epochs))
    return out.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "available_tokens",
        "w_raw",
        weight.alias("weight"),
        ideal.alias("ideal_tokens"),
        F.least(F.lit(float(max_epochs)), ideal / avail).alias("epochs"),
        F.floor(F.least(ideal, cap)).cast("long").alias("planned_tokens"),
        (ideal > cap).alias("capped"),
    )
