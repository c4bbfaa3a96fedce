"""DSIR-style importance weighting (llm/importance.py).

The hashed gate covers the integer masses + surrogate score; here:
- semantic sanity on a constructed corpus — target-vocabulary docs
  outscore off-target docs, and the paper's log-weight agrees in
  ordering;
- the log-weight path against an independent numpy replay (1e-9);
- deterministic top-fraction selection: exact fraction, rerun- and
  repartition-stable.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_reporting_spark.llm.importance import (
    bucket_model,
    hashed_ngram_buckets,
    importance_scores,
    select_top_fraction,
)

BUCKETS = 64  # small space so the test corpus collides realistically


@pytest.fixture(scope="module")
def corpus(spark):
    """20 'wiki-like' docs over one vocabulary, 20 'spam-like' docs
    over another, 10 mixed. Target = the wiki-like set."""
    rows = []
    for i in range(20):
        rows.append((i, f"science history article reference cite{i % 3} topic"))
    for i in range(20, 40):
        rows.append((i, f"buy cheap click offer deal{i % 3} now"))
    for i in range(40, 50):
        rows.append((i, "science buy article click reference deal"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_outscore(spark, corpus):
    target = corpus.filter(F.col("doc_id") < 20)
    scored = importance_scores(
        corpus, target, buckets=BUCKETS, with_log_weight=True
    ).collect()
    by_id = {r["doc_id"]: r for r in scored}
    wiki = [by_id[i]["importance"] for i in range(20)]
    spam = [by_id[i]["importance"] for i in range(20, 40)]
    mixed = [by_id[i]["importance"] for i in range(40, 50)]
    assert min(wiki) > max(spam)
    assert min(wiki) > max(mixed) > max(spam)
    # the paper's log-weight induces the same group ordering
    lw = {k: r["log_weight"] for k, r in by_id.items()}
    assert min(lw[i] for i in range(20)) > max(lw[i] for i in range(20, 40))


def test_log_weight_matches_numpy_replay(spark, corpus):
    target = corpus.filter(F.col("doc_id") < 20)
    lam = 1.0
    rows = importance_scores(
        corpus, target, buckets=BUCKETS, with_log_weight=True, smoothing=lam
    ).collect()

    def h32(s: str) -> int:
        return int(hashlib.md5(("dsir" + s).encode()).hexdigest()[:8], 16)

    def doc_buckets(text: str) -> dict[int, int]:
        ws = text.split(" ")
        grams = [f"1|{w}" for w in ws] + [
            f"2|{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)
        ]
        out: dict[int, int] = {}
        for g in grams:
            b = h32(g) % BUCKETS
            out[b] = out.get(b, 0) + 1
        return out

    import math

    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    t_counts: dict[int, int] = {}
    p_counts: dict[int, int] = {}
    for did, text in texts.items():
        for b, c in doc_buckets(text).items():
            p_counts[b] = p_counts.get(b, 0) + c
            if did < 20:
                t_counts[b] = t_counts.get(b, 0) + c
    T, P = sum(t_counts.values()), sum(p_counts.values())

    for r in rows:
        db = doc_buckets(texts[r["doc_id"]])
        expected = sum(
            c
            * (
                math.log(t_counts.get(b, 0) + lam)
                - math.log(p_counts.get(b, 0) + lam)
            )
            for b, c in sorted(db.items())
        ) - sum(db.values()) * (
            math.log(T + lam * BUCKETS) - math.log(P + lam * BUCKETS)
        )
        assert r["log_weight"] == pytest.approx(expected, abs=1e-9)


def test_models_are_bucket_bounded(spark, corpus):
    model = bucket_model(corpus, buckets=BUCKETS)
    assert model.count() <= BUCKETS
    db = hashed_ngram_buckets(corpus, buckets=BUCKETS)
    assert db.agg(F.max("bucket")).collect()[0][0] < BUCKETS
    assert db.agg(F.min("bucket")).collect()[0][0] >= 0


def test_select_top_fraction_exact_and_stable(spark, corpus):
    target = corpus.filter(F.col("doc_id") < 20)
    scored = importance_scores(corpus, target, buckets=BUCKETS)
    sel = select_top_fraction(scored, fraction=0.4)
    picked = sorted(r["doc_id"] for r in sel.filter("selected").collect())
    assert len(picked) == pytest.approx(20, abs=3)  # ties move the edge slightly
    assert all(i < 20 for i in picked[:15])  # the core of the target wins
    # rerun + repartition stability
    again = select_top_fraction(
        importance_scores(corpus.repartition(7), target, buckets=BUCKETS),
        fraction=0.4,
    )
    assert sorted(r["doc_id"] for r in again.filter("selected").collect()) == picked
