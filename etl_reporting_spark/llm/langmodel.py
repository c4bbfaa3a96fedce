"""Character-n-gram language-model scoring (CCNet-style LM filter).

Web-corpus pipelines score every document against a reference
language model and drop the tails (CCNet buckets by Wikipedia-LM
perplexity; Gopher/DCLM keep an LM-score feature). A real KenLM is a
native dependency this engine can't assume, but the distributed
shape — train counts on a reference corpus, broadcast the model,
score every document in one narrow pass — is the part that matters
at 100 TB, and a char-bigram frequency model exercises it end to end
with exactly-reproducible arithmetic:

- ``char_ngram_counts`` — the training pass: explode each doc into
  character n-grams (one narrow ``transform(sequence(...))`` +
  explode, no UDF), count corpus-wide. The model is
  vocabulary-sized (≤ charset²  for bigrams), tiny at any corpus
  scale → always broadcastable.
- ``charlm_score`` — the scoring pass: re-explode, broadcast-join
  the model, and aggregate two INTEGER sums per doc (n-grams seen,
  total document frequency of those n-grams). The score
  ``avg_df = hit_sum / n_ngrams`` is one double division — docs of
  unusual character composition (wrong language, mojibake, binary
  junk) score low. Integer accumulation keeps it bit-reproducible
  across engines, unlike a Σ log p float fold.

Scale shape: training is one groupBy over the exploded n-grams
(map-side combinable — the combine collapses each partition to ≤
model-size rows before the shuffle); scoring is one broadcast join +
one groupBy keyed by doc id (the same key the explode preserved, so
AQE can coalesce; no wide join). Score against a *different* corpus
by passing its ``char_ngram_counts`` as ``model`` — the CCNet
pattern (train on trusted text, score the crawl).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngram_rows(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, ngram) rows: every length-n character window of text.
    Docs shorter than n characters contribute no rows (and therefore
    drop out of scoring — matching the oracle's join semantics)."""
    # sequence(1, 0) would generate DESCENDING [1, 0], so short docs
    # must take the empty-array branch, not a clamped bound.
    grams = F.expr(
        f"CASE WHEN length({text_col}) >= {n} THEN"
        f" transform(sequence(1, length({text_col}) - {n - 1}),"
        f" i -> substring({text_col}, i, {n}))"
        f" ELSE array() END"
    )
    return df.select(F.col(id_col), F.explode(grams).alias("ngram"))


def char_ngram_counts(
    df: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide character-n-gram document frequencies:
    (ngram, cnt). Output cardinality ≤ charset^n — broadcastable."""
    return (
        _ngram_rows(df, n, id_col, text_col)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def charlm_score(
    df: DataFrame,
    model: DataFrame | None = None,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score each doc by mean corpus frequency of its character
    n-grams: (id, n_ngrams, hit_sum, avg_df). ``model`` defaults to
    counts trained on ``df`` itself (self-scoring — flags outliers
    within the corpus); pass a reference corpus's counts for
    CCNet-style cross-corpus filtering. N-grams absent from the
    model contribute 0 to ``hit_sum`` but still count in
    ``n_ngrams``, so out-of-vocabulary text is penalized."""
    # Fold duplicate n-grams per doc BEFORE the model join: the probe
    # side shrinks from Σ positions (≈ corpus characters) to distinct
    # (doc, ngram) rows — an order of magnitude on natural text — and
    # the groupBy's map-side combine does the folding pre-shuffle.
    # Σ_positions model[g] ≡ Σ_distinct doc_cnt(g)·model[g], so the
    # integer outputs are unchanged.
    doc_grams = (
        _ngram_rows(df, n, id_col, text_col)
        .groupBy(id_col, "ngram")
        .agg(F.count(F.lit(1)).alias("__doc_cnt"))
    )
    if model is None:
        # Self-scoring default: explicit two-pass (explode for the
        # model, explode for scoring). Round-14 tried deriving the
        # model from the SAME per-doc gram relation (Σ_docs doc_cnt(g)
        # ≡ corpus count(g), same integers) claiming ReuseExchange
        # would share the (id, ngram) exchange — but the reuse never
        # materializes in the physical plan (the model lives under the
        # join's BroadcastExchange build, planned as its own query
        # stage): measured +1 exchange on text_charlm_score (5 vs the
        # budgeted 4) and +2 on text_ccnet_buckets (9 vs 7) with FLAT
        # wall-clock (2.20 → 2.13 s sf0.1, within noise). Reverted
        # round-15 — the model branch aggregates straight off the raw
        # explode, whose groupBy(ngram) map-side combine collapses each
        # partition to ≤ vocab rows before its (tiny) shuffle.
        model = char_ngram_counts(df, n=n, id_col=id_col, text_col=text_col)
    joined = doc_grams.join(F.broadcast(model), on="ngram", how="left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("__doc_cnt").alias("n_ngrams"),
            F.sum(F.col("__doc_cnt") * F.coalesce(F.col("cnt"), F.lit(0))).alias(
                "hit_sum"
            ),
        )
        .withColumn(
            "avg_df",
            F.col("hit_sum").cast("double") / F.col("n_ngrams").cast("double"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    model: DataFrame | None = None,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 256,
    cleanup: list | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): split the corpus into head/middle/tail tertiles
    by reference-LM score — downstream pipelines train on head+middle
    or reweight by bucket. Here the LM is ``charlm_score``'s
    bit-reproducible frequency model (high ``avg_df`` = common,
    fluent text = head).

    Tertile thresholds come from
    :func:`~etl_reporting_spark.llm.corpusops.global_sampled_quantiles`
    — exact interpolated percentiles over the ``k`` hash-smallest
    docs, bounded state at any corpus size (an exact whole-corpus
    ``percentile()`` would buffer every distinct double score on one
    merge task — a single-task memory bomb at 10⁹ docs). The tiny
    threshold row broadcasts back; the comparison is exact-double
    compatible in both engines because Spark's ``percentile`` and
    DuckDB's ``percentile_cont`` share the a + f·(b−a) interpolation
    (same convention as gate a12), and the sample is keyed by the
    engine-independent md5 hash of the doc id. CCNet's own thresholds
    are likewise computed on a fixed-size sample of the crawl, not
    the full corpus. Corpora ≤ k get exact tertiles.

    ``scored`` feeds both the threshold sample and the output rows;
    it is persisted only when releasable (active ``cache_scope`` or
    explicit ``cleanup`` list), else recomputed once."""
    from etl_reporting_spark.caching import maybe_persist
    from etl_reporting_spark.llm.corpusops import global_sampled_quantiles

    scored = maybe_persist(
        charlm_score(df, model=model, n=n, id_col=id_col, text_col=text_col),
        cleanup,
    )
    thr = global_sampled_quantiles(
        scored,
        "avg_df",
        id_col,
        {"__p_head": 2 / 3, "__p_mid": 1 / 3},
        k=k,
        salt="ccnet-thr",
    )
    bucket = (
        F.when(F.col("avg_df") >= F.col("__p_head"), F.lit("head"))
        .when(F.col("avg_df") >= F.col("__p_mid"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .select(id_col, "n_ngrams", "hit_sum", "avg_df", bucket.alias("bucket"))
    )
