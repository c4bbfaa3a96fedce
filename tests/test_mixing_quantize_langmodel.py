"""Tests for temperature mixture sampling, int8 embedding
quantization, and the char-bigram LM scoring pass."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_reporting_spark.llm.langmodel import char_ngram_counts, charlm_score
from etl_reporting_spark.llm.quantize import (
    cosine_topk_quantized,
    quantize_embeddings,
)
from etl_reporting_spark.llm.sampling import mixture_weights, temperature_sample
from etl_reporting_spark.llm.similarity import cosine_topk_bruteforce


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 3}", "the quick brown fox " * (3 + i % 5)) for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


@pytest.fixture(scope="module")
def emb(spark):
    # deterministic pseudo-embeddings, dim 8
    rows = [
        (i, [math.sin(0.7 * i + 0.3 * d) for d in range(8)]) for i in range(40)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# ---------------- mixture / temperature sampling ----------------


def test_mixture_weights_normalize_and_flatten(spark, docs):
    out = {r["source"]: r.asDict() for r in
           mixture_weights(docs, "source", budget=30, alpha=0.5).collect()}
    assert abs(sum(v["weight"] for v in out.values()) - 1.0) < 1e-12
    for v in out.values():
        assert v["planned_docs"] <= v["n_docs"]
        assert abs(v["w_raw"] - math.sqrt(v["n_docs"])) < 1e-12
    # alpha=1 is proportional; sqrt flattens toward uniform
    prop = {r["source"]: r["weight"] for r in
            mixture_weights(docs, "source", budget=30, alpha=1.0).collect()}
    big = max(out, key=lambda s: out[s]["n_docs"])
    small = min(out, key=lambda s: out[s]["n_docs"])
    assert out[big]["weight"] <= prop[big] + 1e-12
    assert out[small]["weight"] >= prop[small] - 1e-12


def test_temperature_sample_respects_quotas(spark, docs):
    planned = {r["source"]: r["planned_docs"] for r in
               mixture_weights(docs, "source", budget=30, alpha=0.5).collect()}
    picked = (
        temperature_sample(docs, "source", budget=30, alpha=0.5)
        .groupBy("source").count().collect()
    )
    for r in picked:
        assert r["count"] == planned[r["source"]]


def test_temperature_sample_stable_under_repartition(spark, docs):
    a = {r["doc_id"] for r in
         temperature_sample(docs, "source", budget=30).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         temperature_sample(docs.repartition(7), "source", budget=30)
         .select("doc_id").collect()}
    assert a == b and len(a) > 0


# ---------------- int8 quantization ----------------


def test_quantize_codes_in_range_and_roundtrip(spark, emb):
    q = quantize_embeddings(emb).collect()
    for r in q:
        vec = [float(x) for x in r["embedding"]]
        assert all(0 <= c <= 255 for c in r["qvec"])
        assert r["q_sum"] == sum(r["qvec"])
        assert r["q_norm2"] == sum(c * c for c in r["qvec"])
        if r["q_scale"] > 0:
            # dequantized value within half a step of the original
            for x, c in zip(vec, r["qvec"]):
                assert abs((r["q_mn"] + c * r["q_scale"]) - x) <= r["q_scale"] / 2 + 1e-9


def test_quantize_constant_vector_is_zero(spark):
    df = spark.createDataFrame(
        [(1, [2.5, 2.5, 2.5])], "vec_id long, embedding array<float>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert r["q_scale"] == 0.0 and list(r["qvec"]) == [0, 0, 0]


def test_quantized_topk_tracks_float_topk(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
             for r in cosine_topk_bruteforce(emb, queries, k=3).collect()}
    quant = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
             for r in cosine_topk_quantized(emb, queries, k=3).collect()}
    assert set(exact) == set(quant)
    for key, (_, cos_f) in exact.items():
        _, cos_q = quant[key]
        # 8-bit codes keep cosine within ~1% on smooth vectors
        assert abs(cos_f - cos_q) < 0.02


def test_quantize_is_narrow(spark, emb):
    plan = quantize_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------- char-bigram LM scoring ----------------


def test_charlm_counts_and_score(spark):
    df = spark.createDataFrame(
        [(1, "ababab"), (2, "ababab"), (3, "zq")], "doc_id long, text string"
    )
    counts = {r["ngram"]: r["cnt"] for r in char_ngram_counts(df).collect()}
    # "ababab" has ab,ba,ab,ba,ab -> per doc: ab=3, ba=2
    assert counts["ab"] == 6 and counts["ba"] == 4 and counts["zq"] == 1
    scores = {r["doc_id"]: r for r in charlm_score(df).collect()}
    assert scores[1]["n_ngrams"] == 5
    assert scores[1]["hit_sum"] == 3 * 6 + 2 * 4
    # the gibberish doc scores far below the typical ones
    assert scores[3]["avg_df"] < scores[1]["avg_df"]


def test_charlm_short_docs_drop(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in charlm_score(df).collect()}
    assert ids == {1}


def test_charlm_cross_corpus_model(spark):
    ref = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    crawl = spark.createDataFrame(
        [(10, "hello hello"), (11, "qqqq")], "doc_id long, text string"
    )
    model = char_ngram_counts(ref)
    scores = {r["doc_id"]: r for r in charlm_score(crawl, model=model).collect()}
    # out-of-vocabulary bigrams count in n_ngrams but add nothing
    assert scores[11]["hit_sum"] == 0 and scores[11]["n_ngrams"] == 3
    assert scores[10]["avg_df"] > scores[11]["avg_df"]


def test_charlm_scoring_plan_broadcasts_model(spark, docs):
    plan = charlm_score(docs.select("doc_id", "text"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pq_adc_recovers_separated_clusters(spark):
    import pyspark.sql.functions as F
    from etl_reporting_spark.llm.quantize import cosine_topk_pq, pq_codebook, pq_encode

    # 16 seed vectors (codebook); 0/16/32 share direction A, 1/17 share
    # direction B — PQ codes for same-direction vectors are identical,
    # so ADC ranks them top.
    def vec(kind, dim=64):
        if kind == "A":
            return [1.0 if i % 2 == 0 else 0.2 for i in range(dim)]
        if kind == "B":
            return [-1.0 if i % 4 == 0 else 0.5 for i in range(dim)]
        return [0.1 * ((i * 7 + kind) % 13 - 6) for i in range(dim)]

    rows = [(i, vec(i)) for i in range(2, 16)]
    rows += [(0, vec("A")), (16, vec("A")), (32, vec("A")), (1, vec("B")), (17, vec("B"))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = pq_codebook(emb, m=8, n_codes=16)
    assert cb.count() == 8 * 16
    codes = pq_encode(emb, cb, m=8)
    # identical vectors -> identical code words in every subspace
    c0 = {r["subspace"]: r["code"] for r in codes.filter("vec_id = 0").collect()}
    c16 = {r["subspace"]: r["code"] for r in codes.filter("vec_id = 16").collect()}
    assert c0 == c16 and len(c0) == 8
    out = cosine_topk_pq(emb, emb.filter(F.col("vec_id") == 0), k=2, m=8, n_codes=16)
    top = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    assert set(top) == {16, 32}  # the A-direction twins outrank everything


def test_ivfpq_subset_of_pq_same_cell(spark):
    import pyspark.sql.functions as F
    from etl_reporting_spark.llm.quantize import cosine_topk_ivfpq, cosine_topk_pq
    from etl_reporting_spark.llm.similarity import ivf_assign

    rows = [(i, [float((i * 13 + j * 7) % 11 - 5) for j in range(64)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") == 3)
    full = cosine_topk_pq(emb, queries, k=40, m=8, n_codes=16)
    pruned = cosine_topk_ivfpq(emb, queries, k=40, n_centroids=4, m=8, n_codes=16)
    cells = {r["vec_id"]: r["centroid_id"]
             for r in ivf_assign(emb, emb.filter(F.col("vec_id") < 4)).collect()}
    got = {r["neighbor_id"]: r["adc_score"] for r in pruned.collect()}
    ref = {r["neighbor_id"]: r["adc_score"] for r in full.collect()}
    # IVF+PQ returns exactly the query's cell-mates, with PQ's scores
    assert set(got) == {v for v, c in cells.items() if c == cells[3] and v != 3}
    assert all(got[n] == ref[n] for n in got)
