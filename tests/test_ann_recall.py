"""Residual IVF+PQ + exact-rerank refine (round-7, closes the
round-5 #6 ask): the recall sweep's operating point and the algebra
behind the residual ADC score.

The headline contract pinned here: `ann_recall_sweep` reports
recall@5 ≥ 0.8 at a measured operating point — in fact the refine
stage reaches ≥ 0.8 at EVERY (encoding, n_probe) point on this
corpus, including n_probe=1 (≈3% of the corpus scanned). Reference
has no ANN; this is north-star scope (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_01 = "/root/testdata/sf0.01"


def _emb(spark, sf_dir=SF_DIR):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_residualize_reconstructs_exactly(spark):
    """x == c(cell(x)) + residual, elementwise (double arithmetic is
    exact for a - b followed by b + (a - b) only up to rounding — but
    the residual is defined as the double difference, so adding the
    double centroid back reproduces the double cast of x exactly)."""
    from etl_reporting_spark.llm.quantize import residualize

    emb = _emb(spark)
    centroids = emb.filter(F.col("vec_id") < 8)
    res = residualize(emb, centroids)
    c = centroids.select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    back = (
        res.join(F.broadcast(c), "centroid_id")
        .withColumn(
            "recon",
            F.expr(
                "zip_with(embedding, cvec, (r, cv) -> r + CAST(cv AS DOUBLE))"
            ),
        )
        .join(
            _emb(spark).select("vec_id", F.col("embedding").alias("orig")),
            "vec_id",
        )
        .withColumn(
            "max_err",
            F.expr(
                "aggregate(zip_with(recon, orig,"
                " (a, b) -> abs(a - CAST(b AS DOUBLE))),"
                " CAST(0 AS DOUBLE), (acc, v) -> greatest(acc, v))"
            ),
        )
    )
    worst = back.agg(F.max("max_err")).collect()[0][0]
    # c + (x - c) re-rounds once; for float32-ranged inputs widened
    # to double the round-trip error is below 1e-12 of the values.
    assert worst < 1e-12


def test_ivfpq_candidates_plain_matches_ivfpq_topk(spark):
    """Ranking ivfpq_candidates(n_probe=1, plain) reproduces the
    long-standing cosine_topk_ivfpq gate output value-for-value —
    the generalized path and the original path are the same math."""
    from etl_reporting_spark.llm.quantize import cosine_topk_ivfpq, ivfpq_candidates

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    legacy = cosine_topk_ivfpq(emb, queries, k=5, m=8, n_codes=16).collect()
    cands = ivfpq_candidates(emb, queries, n_probe=1, residual=False,
                             n_centroids=8, n_codes=16)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    new = (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id", F.col("adc_score"))
        .collect()
    )
    legacy_map = {(r.query_id, r.rank): (r.neighbor_id, r.adc_score) for r in legacy}
    new_map = {(r.query_id, r.rank): (r.neighbor_id, r.adc_score) for r in new}
    assert legacy_map == new_map


def test_multiprobe_candidates_nest(spark):
    """probe_rn<=1 candidates ⊂ probe_rn<=2 ⊂ ... and scores agree on
    the shared pairs (the sweep's one-pass-filter-later premise)."""
    from etl_reporting_spark.llm.quantize import ivfpq_candidates

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    cands = ivfpq_candidates(emb, queries, n_probe=3, n_centroids=8, n_codes=16)
    rows = cands.collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r.probe_rn, {})[(r.query_id, r.neighbor_id)] = r.adc_score
    keys1 = set(by_probe.get(1, {}))
    keys12 = keys1 | set(by_probe.get(2, {}))
    all_keys = {(r.query_id, r.neighbor_id) for r in rows}
    assert keys1 and keys1 < all_keys and keys12 <= all_keys
    # a candidate appears under exactly one probe rank (its own cell)
    assert len(rows) == len(all_keys)


def test_exact_rerank_matches_bruteforce_on_full_candidates(spark):
    """Reranking ALL pairs exactly reproduces brute-force top-k —
    the refine stage's scoring is literally the brute-force kernel."""
    from etl_reporting_spark.llm.quantize import exact_rerank
    from etl_reporting_spark.llm.similarity import cosine_topk_bruteforce

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 3)
    # synthesize a full candidate list with a constant fake score:
    # shortlist larger than the corpus → rerank sees every pair
    n = emb.count()
    pairs = (
        queries.select(F.col("vec_id").alias("query_id"))
        .crossJoin(F.broadcast(emb.select(F.col("vec_id").alias("neighbor_id"))))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_score", F.lit(0.0))
    )
    refined = exact_rerank(pairs, emb, queries, k=5, shortlist=n + 1).collect()
    exact = cosine_topk_bruteforce(emb, queries, k=5).collect()
    assert {(r.query_id, r.rank, r.neighbor_id) for r in refined} == {
        (r.query_id, r.rank, r.neighbor_id) for r in exact
    }
    ref_cos = {(r.query_id, r.rank): r.cosine for r in refined}
    ex_cos = {(r.query_id, r.rank): r.cosine for r in exact}
    assert ref_cos == ex_cos  # bit-identical kernel


def test_sweep_operating_point_at_sf001(spark):
    """The verdict's 'done' criterion: a measured recall@5 ≥ 0.8
    point, and the refine stage dominating raw ADC everywhere."""
    from etl_reporting_spark.plans.llm_queries import ann_recall_sweep

    rows = ann_recall_sweep(spark, SF_DIR_01).collect()
    assert len(rows) == 8
    best = max(r.recall_refined for r in rows)
    assert best >= 0.8
    for r in rows:
        assert r.recall_refined >= 0.8, (r.encoding, r.n_probe, r.recall_refined)
        assert r.recall_refined >= r.recall_adc


def _sse(spark, enc_src, codebook):
    """k-means objective: mean squared subspace distance of each
    vector to its assigned code (the quantity Lloyd minimizes)."""
    from etl_reporting_spark.llm.quantize import _SUBFOLD_L2, _subspaces

    ex = _subspaces(
        enc_src.select("vec_id", "embedding"), 8, 8, "embedding", "xsub"
    ).select("vec_id", "subspace", "xsub")
    scored = ex.join(
        F.broadcast(codebook.select("subspace", "code", "subvec")), "subspace"
    ).withColumn("dist", F.expr(_SUBFOLD_L2.format(a="xsub", b="subvec")))
    w = Window.partitionBy("vec_id", "subspace").orderBy(
        F.col("dist").asc(), F.col("code").asc()
    )
    best = scored.withColumn("r", F.row_number().over(w)).filter("r = 1")
    return best.agg(F.avg("dist")).collect()[0][0]


def test_trained_codebook_lowers_quantization_error(spark):
    """pq_train_codebook is a real Lloyd loop: within-cluster SSE
    strictly drops vs the seed codebook, for BOTH plain and residual
    encodings (Lloyd's monotone-objective guarantee). Recall impact
    is corpus-dependent and deliberately NOT asserted — on this
    corpus the refine stage, not training, is the serving lever
    (documented in the operator and sweep docstrings)."""
    from etl_reporting_spark.llm.quantize import (
        pq_codebook,
        pq_train_codebook,
        residualize,
    )

    emb = _emb(spark, SF_DIR_01)
    cent = emb.filter(F.col("vec_id") < 32)
    for enc_src in (emb, residualize(emb, cent).select("vec_id", "embedding")):
        seed = pq_codebook(enc_src, m=8, n_codes=16, dim=64)
        trained = pq_train_codebook(enc_src, m=8, n_codes=16, iterations=2)
        assert _sse(spark, enc_src, trained) < _sse(spark, enc_src, seed)


def test_training_carries_dead_codes_forward(spark):
    """A code that loses every assignment must NOT vanish from the
    codebook (the advisor's silent-shrink finding): duplicate seed
    vectors tie-break every point to the lower code, starving the
    higher one — training still returns all m·n_codes rows, with the
    starved code's centroid carried forward unchanged."""
    from etl_reporting_spark.llm.quantize import pq_train_codebook

    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 1.0, 1.0, 1.0]),
        (2, [2.0, 2.0, 2.0, 2.0]),
        (3, [2.0, 2.0, 2.0, 2.0]),  # duplicate of seed 2 → code 3 starves
        (4, [0.1, 0.1, 0.1, 0.1]),
        (5, [1.1, 0.9, 1.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train_codebook(emb, m=2, n_codes=4, dim=4, iterations=3).collect()
    assert len(cb) == 2 * 4  # every (subspace, code) survives
    starved = {(r["subspace"], r["code"]): r["subvec"] for r in cb}
    for s in (0, 1):
        assert starved[(s, 3)] == [2.0, 2.0]  # carried forward verbatim


def test_trained_sweep_flips_residual_past_plain(spark):
    """The round-8 serving point (round-7 "What's missing" #3): with
    TRAINED centroids + codebooks, residual ADC recall beats plain at
    every probed level ≥ 2 (reversing the seed-codebook finding the
    r7 sweep documents), and the refine stage reaches recall@5 ≥ 0.85
    at shortlist 24 < 32. Deterministic end-to-end (exact-fold
    training), so these are exact measured values, not noisy bounds —
    the same rows the DuckDB oracle hash-matches."""
    from etl_reporting_spark.plans.llm_queries import ann_recall_sweep_trained

    rows = ann_recall_sweep_trained(spark, SF_DIR_01).collect()
    adc = {(r["encoding"], r["n_probe"]): r["recall_adc"] for r in rows}
    ref = {(r["encoding"], r["n_probe"]): r["recall_refined"] for r in rows}
    for p in (2, 4, 6):
        assert adc[("residual", p)] > adc[("plain", p)], (p, adc)
    # the trained-residual serving recommendation: n_probe=6,
    # shortlist 24 — smaller shortlist than the seed sweep's 32
    assert ref[("residual", 6)] >= 0.85
    # refine never degrades ADC ranking at any measured point
    for key, r in ref.items():
        assert r >= adc[key] - 1e-9, key


def test_caller_codebook_plumbs_through_ivfpq(spark):
    """ivfpq_candidates accepts a trained codebook and still produces
    a full, correctly-shaped candidate set (sanity: every query gets
    candidates; scores finite)."""
    from etl_reporting_spark.llm.quantize import ivfpq_candidates, pq_train_codebook

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 3)
    cb = pq_train_codebook(emb, m=8, n_codes=8, iterations=1)
    cands = ivfpq_candidates(
        emb, queries, n_probe=2, n_centroids=8, n_codes=8, codebook=cb
    ).collect()
    qids = {r.query_id for r in cands}
    assert qids == {0, 1, 2}
    assert all(r.adc_score == r.adc_score for r in cands)  # no NaN
