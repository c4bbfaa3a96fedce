"""DSIR-style data selection: hashed n-gram importance weighting.

Pretraining pipelines select web documents that "look like" a trusted
target corpus (Wikipedia, books) by importance weighting in a hashed
n-gram feature space (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling", arXiv:2302.03169). The distributed
shape is the part that matters at 100 TB, and it is exactly the
CCNet/charlm shape this engine already runs (llm/langmodel.py):

1. featurize every document into hashed n-gram BUCKETS — word
   unigrams + bigrams hashed to ``buckets`` ids. Narrow explode, no
   UDF; the md5-derived bucket is reproducible in any engine.
2. train two bucket-count models: the TARGET sample's distribution
   and the raw corpus ("proposal") distribution. Both are
   ``buckets``-sized however large the corpus is → always
   broadcastable.
3. score every document in one broadcast-join pass; select the top
   fraction.

Determinism convention (why there are two scores): DSIR's paper
weight is ``log w(d) = Σ_b c_db·[log p_t(b) − log p_p(b)]``. A float
log-sum is not bit-reproducible across engines (libm ``ln`` is not
IEEE-correctly-rounded, unlike +,×,÷,sqrt — the reason charlm_score
uses integer sums). So:

- ``importance`` (the ORACLE-HASHED gate score) is the integer-exact
  surrogate: ``(target_mass+1)/(proposal_mass+1)`` scaled by the
  corpus/target size ratio, where ``target_mass = Σ_b c_db·t_b`` and
  ``proposal_mass = Σ_b c_db·p_b`` are pure integer sums. Documents
  whose buckets are relatively heavy in the target score high —
  same feature space, same architecture, bit-exact everywhere.
- ``log_weight`` (``with_log_weight=True``) is the paper's add-λ
  log-ratio sum, computed with a bucket-SORTED fold so it is
  deterministic within one engine; tests verify it against a numpy
  replay to 1e-9, and it is deliberately kept OUT of the hashed gate.

Scale notes: featurization is narrow; both models build with
map-side-combined groupBys whose output is bounded by ``buckets``;
scoring shuffles once on (doc, bucket) then once on doc — both keyed
on the id the explode preserved. The only broadcast relations are
``buckets``-sized. Selection threshold is an exact percentile over a
k-hash-smallest sample (bounded state, broadcast back — no global
sort, no whole-corpus percentile buffer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_reporting_spark.llm.corpusops import _hash32


def hashed_ngram_buckets(
    docs: DataFrame,
    buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bucket, cnt): per-document hashed n-gram bucket counts.
    Word n-grams for each n in ``ns``, md5-hashed into ``buckets``
    ids (salted per n so a unigram and a bigram never collide by
    construction of the same string)."""
    # tokenize ONCE into a materialized column — the gram expressions
    # previously inlined split() up to three times each (size bound,
    # sequence bound, slice source), re-splitting every document per
    # reference; same tokens, same grams
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    )
    grams = []
    for n in ns:
        if n == 1:
            grams.append("transform(__toks, w -> concat('1|', w))")
        else:
            grams.append(
                f"CASE WHEN size(__toks) >= {n} THEN"
                f" transform(sequence(1, size(__toks) - {n - 1}),"
                f" i -> concat('{n}|', concat_ws(' ', slice(__toks, i, {n}))))"
                f" ELSE array() END"
            )
    expr = " , ".join(grams)
    exploded = toks.select(
        F.col(id_col), F.explode(F.expr(f"concat({expr})")).alias("__gram")
    )
    bucket = F.pmod(_hash32(F.col("__gram"), "dsir"), F.lit(int(buckets)))
    return (
        exploded.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_model(
    docs: DataFrame,
    buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(bucket, cnt): corpus-wide bucket counts — the broadcastable
    distribution model (≤ ``buckets`` rows at any corpus size)."""
    return (
        hashed_ngram_buckets(docs, buckets, ns, id_col, text_col)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def importance_scores(
    docs: DataFrame,
    target: DataFrame,
    buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
    id_col: str = "doc_id",
    text_col: str = "text",
    target_model: DataFrame | None = None,
    proposal_model: DataFrame | None = None,
    with_log_weight: bool = False,
    smoothing: float = 1.0,
    cleanup: list | None = None,
) -> DataFrame:
    """Per-document importance vs the target corpus:
    (id, n_grams, target_mass, proposal_mass, importance
    [, log_weight]).

    ``importance`` is size-normalized so ~1.0 means "as target-like
    as an average proposal doc": with T = Σ t_b and P = Σ p_b,
    ``importance = ((target_mass+1)·(P+1)) / ((proposal_mass+1)·(T+1))``
    — integer sums and one double multiply/divide (both IEEE-exact),
    so the value hashes identically in any engine. Pass precomputed
    ``target_model``/``proposal_model`` to reuse nightly models (the
    production pattern — the target model rarely changes)."""
    doc_buckets = hashed_ngram_buckets(docs, buckets, ns, id_col, text_col)
    if proposal_model is None:
        # The per-doc bucket counts feed BOTH the default proposal
        # model (Σ_docs c_db = p_b — algebraically the same counts)
        # and the scoring join. Spark does not reuse the exchange
        # across those two consumers (verified: zero ReusedExchange
        # in the executed plan), so without a persist the expensive
        # featurization pass — word split, n-gram build, md5 — runs
        # TWICE over the corpus. The persisted relation is narrow
        # (id, bucket, cnt), a fraction of the text it derives from;
        # persisted only when releasable (active cache_scope or an
        # explicit cleanup list) — a persist nothing can release
        # would leak for the session lifetime, so a bare call takes
        # the recompute instead.
        from etl_reporting_spark.caching import maybe_persist

        doc_buckets = maybe_persist(doc_buckets, cleanup)
    t_model = (
        target_model
        if target_model is not None
        else bucket_model(target, buckets, ns, id_col, text_col)
    ).select("bucket", F.col("cnt").alias("__t_cnt"))
    p_model = (
        proposal_model.select("bucket", F.col("cnt").alias("__p_cnt"))
        if proposal_model is not None
        else doc_buckets.groupBy("bucket").agg(F.sum("cnt").alias("__p_cnt"))
    )

    totals = t_model.agg(F.sum("__t_cnt").alias("__T")).crossJoin(
        p_model.agg(F.sum("__p_cnt").alias("__P"))
    )
    joined = (
        doc_buckets.join(F.broadcast(t_model), "bucket", "left")
        .join(F.broadcast(p_model), "bucket", "left")
        .select(
            F.col(id_col),
            "bucket",
            "cnt",
            F.coalesce("__t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("__p_cnt", F.lit(0)).alias("p_cnt"),
        )
    )

    aggs = [
        F.sum("cnt").alias("n_grams"),
        F.sum(F.col("cnt") * F.col("t_cnt")).alias("target_mass"),
        F.sum(F.col("cnt") * F.col("p_cnt")).alias("proposal_mass"),
    ]
    if with_log_weight:
        # bucket-sorted fold: deterministic order within one engine;
        # verified against numpy in tests, kept out of the hash gate
        lam = float(smoothing)
        aggs.append(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("bucket", "cnt", "t_cnt", "p_cnt"))
                ),
                F.lit(0.0),
                lambda acc, s: acc
                + s["cnt"].cast("double")
                * (
                    F.log(s["t_cnt"].cast("double") + F.lit(lam))
                    - F.log(s["p_cnt"].cast("double") + F.lit(lam))
                ),
            ).alias("__lw_partial")
        )
    scored = joined.groupBy(id_col).agg(*aggs)

    scored = scored.crossJoin(F.broadcast(totals))
    importance = (
        (F.col("target_mass") + F.lit(1)).cast("double")
        * (F.col("__P") + F.lit(1)).cast("double")
    ) / (
        (F.col("proposal_mass") + F.lit(1)).cast("double")
        * (F.col("__T") + F.lit(1)).cast("double")
    )
    out_cols = [
        F.col(id_col),
        "n_grams",
        "target_mass",
        "proposal_mass",
        importance.alias("importance"),
    ]
    if with_log_weight:
        lam = float(smoothing)
        b = float(1024 if buckets is None else buckets)
        # the constant term: − n_grams·[log(T+λB) − log(P+λB)]
        lw = F.col("__lw_partial") - F.col("n_grams").cast("double") * (
            F.log(F.col("__T").cast("double") + F.lit(lam * b))
            - F.log(F.col("__P").cast("double") + F.lit(lam * b))
        )
        out_cols.append(lw.alias("log_weight"))
    return scored.select(*out_cols)


def select_top_fraction(
    scored: DataFrame,
    fraction: float = 0.25,
    score_col: str = "importance",
    id_col: str = "doc_id",
    k: int = 256,
) -> DataFrame:
    """Deterministic selection of the most target-like ``fraction``.

    The threshold is an exact interpolated percentile over the ``k``
    hash-smallest docs
    (:func:`~etl_reporting_spark.llm.corpusops.global_sampled_quantiles`
    — bounded state at any corpus size; a whole-corpus exact
    ``percentile()`` would buffer every distinct double score on one
    merge task). DSIR's paper likewise selects by a threshold
    estimated from a sample, not a global sort. The selected fraction
    is therefore ``fraction ± O(1/sqrt(k))``; corpora ≤ k rows get
    the exact cut. Ties on the threshold value break by the md5 hash
    of the id, so reruns and repartitions select the same set. Adds
    ``selected`` without dropping fate rows."""
    from etl_reporting_spark.llm.corpusops import global_sampled_quantiles

    thresh = global_sampled_quantiles(
        scored,
        score_col,
        id_col,
        {"__thr": 1.0 - fraction},
        k=k,
        salt="dsir-thr",
    )
    tie = F.pmod(_hash32(F.col(id_col), "dsir-tie"), F.lit(2)) == 0
    return scored.crossJoin(F.broadcast(thresh)).withColumn(
        "selected",
        (F.col(score_col) > F.col("__thr"))
        | ((F.col(score_col) == F.col("__thr")) & tie),
    ).drop("__thr")
