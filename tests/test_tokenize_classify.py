"""BPE training primitives and the linear quality classifier."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_reporting_spark.llm.classify import quality_classifier_score
from etl_reporting_spark.llm.tokenize import (
    apply_merges,
    best_pair,
    bpe_train,
    merge_pair_column,
    pair_counts,
    with_symbols,
    word_freqs,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestBpe:
    def test_word_freqs_and_pair_counts(self, spark):
        docs = _corpus(spark, ["low low lower", "lowest low"])
        words = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
        assert words == {"low": 3, "lower": 1, "lowest": 1}
        pc = {
            (r["sym_a"], r["sym_b"]): r["n"]
            for r in pair_counts(with_symbols(word_freqs(docs))).collect()
        }
        # 'l','o' appears once in each of the 3 distinct words,
        # weighted by freq: 3 + 1 + 1
        assert pc[("l", "o")] == 5 and pc[("o", "w")] == 5
        assert pc[("w", "e")] == 2  # lower + lowest

    def test_merge_greedy_non_overlapping(self, spark):
        df = spark.createDataFrame([(["a", "a", "a", "a"],)], "symbols array<string>")
        out = df.select(
            merge_pair_column(F.col("symbols"), "a", "a").alias("m")
        ).first()["m"]
        assert out == ["aa", "aa"]
        df3 = spark.createDataFrame([(["a", "a", "a"],)], "symbols array<string>")
        assert df3.select(
            merge_pair_column(F.col("symbols"), "a", "a").alias("m")
        ).first()["m"] == ["aa", "a"]

    def test_train_learns_frequent_subword(self, spark):
        docs = _corpus(spark, ["low low low lower lowest", "low lowest"] * 3)
        merges = bpe_train(docs, n_merges=3)
        assert len(merges) == 3
        # 'l'+'o' then 'lo'+'w' dominate any corpus of low* words
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", "w")

    def test_apply_merges_roundtrip(self, spark):
        docs = _corpus(spark, ["low lower"])
        toks = (
            apply_merges(docs, [("l", "o"), ("lo", "w"), ("e", "r")])
            .first()["bpe_tokens"]
        )
        assert toks == ["low", "low", "er"]

    def test_best_pair_deterministic_tiebreak(self, spark):
        # 'ab' and 'ba' pairs tie at freq 1 → lexicographic winner (a,b)
        docs = _corpus(spark, ["ab ba"])
        assert best_pair(with_symbols(word_freqs(docs))) == ("a", "b")

    def test_empty_vocab(self, spark):
        docs = _corpus(spark, ["a b c"])  # every word single-char: no pairs
        assert best_pair(with_symbols(word_freqs(docs))) is None
        assert bpe_train(docs, n_merges=2) == []


class TestQualityClassifier:
    def test_prose_beats_punct_soup(self, spark):
        docs = _corpus(
            spark,
            [
                "the cat sat on the mat and it was a fine day for sitting",
                "$$$ ### !!! @@@ %%% ^^^ &&& *** ((( )))",
            ],
        )
        rows = {r["doc_id"]: r for r in quality_classifier_score(docs).collect()}
        assert rows[0]["quality_score"] > rows[1]["quality_score"]
        assert rows[0]["keep"] is True and rows[1]["keep"] is False

    def test_threshold_and_custom_weights(self, spark):
        docs = _corpus(spark, ["the a of to in plain words here"])
        strict = quality_classifier_score(docs, threshold=10.0).first()
        assert strict["keep"] is False
        only_len = quality_classifier_score(
            docs,
            weights={"bias": 0.0, "stopword_ratio": 0.0, "punct_ratio": 0.0,
                     "mean_token_len": 0.0, "len_norm": 1.0},
        ).first()
        assert abs(only_len["quality_score"] - 8 / 256) < 1e-12

    def test_no_shuffle_plan(self, spark):
        docs = _corpus(spark, ["a few words"])
        plan = quality_classifier_score(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestAssembleTrainingSet:
    def _build(self, spark, n=200, cap=30):
        from etl_reporting_spark.llm.curate import assemble_training_set

        docs = spark.createDataFrame(
            [
                (
                    i,
                    "the a of to in good plain words here and it is that for " * 3
                    if i % 4 != 0
                    else "$$$ ### !!!",  # every 4th doc is junk
                    f"src{i % 3}",
                )
                for i in range(n)
            ],
            "doc_id long, text string, source string",
        )
        return assemble_training_set(docs, max_per_source=cap, shards=4)

    def test_fates_partition_the_corpus(self, spark):
        out = self._build(spark).collect()
        assert len(out) == 200
        fates = {r["fate"] for r in out}
        assert "filtered_quality" in fates and "capped" in fates
        for r in out:
            if r["fate"] in ("filtered_quality", "capped"):
                assert r["split"] is None and r["pos"] is None
            else:
                assert r["fate"] == r["split"] and r["pos"] is not None

    def test_cap_counts_only_kept_docs(self, spark):
        from pyspark.sql import functions as F

        out = self._build(spark, cap=30)
        per = (
            out.filter(F.col("split").isNotNull())
            .groupBy("source")
            .count()
            .collect()
        )
        assert all(r["count"] == 30 for r in per)  # 50 kept per source, capped at 30

    def test_pos_dense_within_split_shard(self, spark):
        from pyspark.sql import functions as F

        out = self._build(spark)
        per = (
            out.filter(F.col("pos").isNotNull())
            .groupBy("split", "shard")
            .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn"))
            .collect()
        )
        assert per and all(r["n"] == r["mx"] and r["mn"] == 1 for r in per)
