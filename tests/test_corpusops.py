"""corpusops: line-level boilerplate dedup, per-group caps, KMV
distinct sketch, deterministic training order."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_reporting_spark.llm.corpusops import (
    cap_per_group,
    frequent_lines,
    kmv_distinct,
    remove_frequent_lines,
    training_order,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRemoveFrequentLines:
    def test_multiline_boilerplate_removed_order_preserved(self, spark):
        nav = "home | products | contact"
        foot = "copyright 2026 example corp"
        docs = _docs(
            spark,
            [
                (1, f"{nav}\nunique article one\n{foot}"),
                (2, f"{nav}\nsecond story text\nmore of it\n{foot}"),
                (3, f"{nav}\nthird doc body\n{foot}"),
                (4, "standalone page with no template"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in remove_frequent_lines(docs, min_docs=3).collect()
        }
        assert out[1]["text"] == "unique article one"
        assert out[2]["text"] == "second story text\nmore of it"
        assert out[2]["n_lines_kept"] == 2
        assert out[2]["n_lines_removed"] == 2
        assert out[4]["text"] == "standalone page with no template"
        assert out[4]["n_lines_removed"] == 0

    def test_all_boilerplate_doc_survives_empty(self, spark):
        docs = _docs(spark, [(1, "same"), (2, "same"), (3, "same")])
        out = remove_frequent_lines(docs, min_docs=2).collect()
        assert len(out) == 3
        assert all(r["text"] == "" and r["n_lines_removed"] == 1 for r in out)

    def test_empty_text_doc_is_total(self, spark):
        docs = _docs(spark, [(1, ""), (2, "a\nb"), (3, "a\nc")])
        out = {r["doc_id"]: r for r in remove_frequent_lines(docs, min_docs=2).collect()}
        assert out[1]["text"] == ""
        assert out[1]["n_lines_kept"] == 0 and out[1]["n_lines_removed"] == 0
        assert out[2]["text"] == "b"

    def test_one_vote_per_doc(self, spark):
        # A line repeated inside ONE doc counts once toward doc frequency.
        docs = _docs(spark, [(1, "x\nx\nx"), (2, "y")])
        bp = frequent_lines(docs, min_docs=2)
        assert bp.count() == 0

    def test_precomputed_boilerplate_reuse(self, spark):
        corpus = _docs(spark, [(1, "nav\na"), (2, "nav\nb"), (3, "nav\nc")])
        bp = frequent_lines(corpus, min_docs=3)
        batch = _docs(spark, [(10, "nav\nfresh")])
        out = remove_frequent_lines(batch, boilerplate=bp).collect()
        assert out[0]["text"] == "fresh" and out[0]["n_lines_removed"] == 1


class TestCapPerGroup:
    def test_cap_and_determinism_under_repartition(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("string").alias("source"),
        )
        a = cap_per_group(df, "source", 10)
        b = cap_per_group(df.repartition(7), "source", 10)
        assert a.groupBy("source").count().agg(F.max("count")).first()[0] == 10
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(
            r["doc_id"] for r in b.collect()
        )

    def test_small_group_untouched(self, spark):
        df = spark.range(5).select(
            F.col("id").alias("doc_id"), F.lit("only").alias("source")
        )
        assert cap_per_group(df, "source", 10).count() == 5

    def test_label_mode_keeps_all_rows(self, spark):
        df = spark.range(30).select(
            F.col("id").alias("doc_id"), F.lit("s").alias("source")
        )
        out = cap_per_group(df, "source", 10, keep_col="kept")
        assert out.count() == 30
        assert out.filter("kept").count() == 10


class TestKmvDistinct:
    def test_exact_below_k(self, spark):
        df = spark.range(40).select(
            F.lit("g").alias("grp"), (F.col("id") % 17).alias("v")
        )
        r = kmv_distinct(df, "grp", "v", k=64).first()
        assert r["exact"] is True
        assert r["n_kept"] == 17 and r["est_distinct"] == 17.0

    def test_estimate_within_tolerance(self, spark):
        # 5000 distinct values, k=256: KMV relative error ~1/sqrt(k-2)≈6%;
        # assert a loose 3-sigma band so the test is not flaky by design
        # (it's deterministic anyway — the band documents expected quality).
        df = spark.range(5000).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
        r = kmv_distinct(df, "grp", "v", k=256).first()
        assert r["exact"] is False
        assert abs(r["est_distinct"] - 5000) / 5000 < 0.2

    def test_duplicates_do_not_inflate(self, spark):
        base = spark.range(1000).select(F.lit("g").alias("grp"), F.col("id").alias("v"))
        dup = base.union(base).union(base)
        assert (
            kmv_distinct(dup, "grp", "v", k=128).first()["est_distinct"]
            == kmv_distinct(base, "grp", "v", k=128).first()["est_distinct"]
        )


class TestTrainingOrder:
    def test_is_permutation_and_stable(self, spark):
        df = spark.range(500).select(F.col("id").alias("doc_id"))
        out = training_order(df, shards=8, salt="e0")
        assert out.count() == 500
        # each shard's positions are 1..n_shard
        per = out.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
        )
        assert all(r["n"] == r["mx"] and r["mn"] == 1 for r in per.collect())
        again = training_order(df.repartition(13), shards=8, salt="e0")
        assert (
            out.select("doc_id", "shard", "pos")
            .exceptAll(again.select("doc_id", "shard", "pos"))
            .count()
            == 0
        )

    def test_salt_changes_permutation(self, spark):
        df = spark.range(500).select(F.col("id").alias("doc_id"))
        a = training_order(df, shards=8, salt="e0")
        b = training_order(df, shards=8, salt="e1")
        moved = (
            a.alias("a")
            .join(b.alias("b"), "doc_id")
            .filter("a.shard != b.shard OR a.pos != b.pos")
            .count()
        )
        assert moved > 400


class TestSampledQuantiles:
    def test_small_group_exact(self, spark):
        df = spark.createDataFrame(
            [("g", float(v), i) for i, v in enumerate([1, 2, 3, 4, 5])],
            "grp string, v double, id long",
        )
        from etl_reporting_spark.llm.corpusops import sampled_quantiles

        r = sampled_quantiles(df, "grp", "v", "id", percentiles=(0.5,), k=64).first()
        assert r["n_sampled"] == 5 and r["p50"] == 3.0

    def test_sample_estimate_close_and_stable(self, spark):
        from pyspark.sql import functions as F

        from etl_reporting_spark.llm.corpusops import sampled_quantiles

        df = spark.range(10_000).select(
            F.lit("g").alias("grp"),
            F.col("id").cast("double").alias("v"),
            F.col("id").alias("id"),
        )
        a = sampled_quantiles(df, "grp", "v", "id", k=512).first()
        b = sampled_quantiles(df.repartition(13), "grp", "v", "id", k=512).first()
        assert a["n_sampled"] == 512
        assert abs(a["p50"] - 5000) / 5000 < 0.15  # ~1/sqrt(512) noise band
        assert (a["p50"], a["p90"], a["p99"]) == (b["p50"], b["p90"], b["p99"])


def test_countmin_overestimates_and_merges(spark):
    import pyspark.sql.functions as F
    from etl_reporting_spark.llm.corpusops import countmin_estimate, countmin_sketch

    rows = [(t,) for t in ["a"] * 50 + ["b"] * 7 + ["c"] * 1 + [f"x{i}" for i in range(40)]]
    df = spark.createDataFrame(rows, "term string")
    sk = countmin_sketch(df, "term", depth=4, width=16)
    assert sk.count() <= 4 * 16  # bounded state regardless of input
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)], "term string")
    est = {r["term"]: r["cm_estimate"] for r in
           countmin_estimate(sk, probes, "term", depth=4, width=16).collect()}
    assert est["a"] >= 50 and est["b"] >= 7 and est["c"] >= 1  # never undercounts
    assert est["a"] <= 50 + 48  # width 16 over ~98 tokens: collisions bounded
    # mergeability: sketch(A ∪ B) == sketch(A) + sketch(B) bucket-wise
    a = countmin_sketch(df.filter(F.col("term") == "a"), "term", depth=4, width=16)
    b = countmin_sketch(df.filter(F.col("term") != "a"), "term", depth=4, width=16)
    merged = (a.unionByName(b).groupBy("sketch_row", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    whole = {(r["sketch_row"], r["bucket"]): r["cnt"] for r in sk.collect()}
    got = {(r["sketch_row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_bloom_no_false_negatives_and_merge(spark):
    import pyspark.sql.functions as F
    from etl_reporting_spark.llm.corpusops import bloom_build, bloom_contains

    present = [(f"term{i}",) for i in range(200)]
    df = spark.createDataFrame(present, "term string")
    bloom = bloom_build(df, "term", m_bits=4096, k=5)
    assert bloom.count() <= 4096 // 32  # packed words, bounded state
    probes = spark.createDataFrame(
        present[:20] + [(f"absent{i}",) for i in range(20)], "term string"
    )
    got = {r["term"]: r["bloom_member"] for r in
           bloom_contains(bloom, probes, "term", m_bits=4096, k=5).collect()}
    assert all(got[f"term{i}"] == 1 for i in range(20))  # NEVER a false negative
    # m=4096, k=5, n=200 → fp ≈ 3e-4: the 20 absent probes stay clean
    assert sum(got[f"absent{i}"] for i in range(20)) == 0
    # mergeability: bloom(A ∪ B) == bloom(A) OR bloom(B) word-wise
    a = bloom_build(df.filter(F.col("term") < "term2"), "term", m_bits=4096, k=5)
    b = bloom_build(df.filter(F.col("term") >= "term2"), "term", m_bits=4096, k=5)
    merged = (a.unionByName(b).groupBy("word_idx")
              .agg(F.expr("bit_or(word)").alias("word")))
    assert {(r["word_idx"], r["word"]) for r in merged.collect()} == \
           {(r["word_idx"], r["word"]) for r in bloom.collect()}


class TestGlobalSampledQuantiles:
    """Corpus-wide bounded-state thresholds (round-6 verdict #1): the
    whole-relation twin of sampled_quantiles that replaced the exact
    whole-corpus percentile() in ccnet_buckets / select_top_fraction."""

    def test_exact_when_corpus_fits_in_k(self, spark):
        from etl_reporting_spark.llm.corpusops import global_sampled_quantiles

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 102)], "doc_id long, score double"
        )
        row = global_sampled_quantiles(
            df, "score", "doc_id", {"p50": 0.5, "p90": 0.9}, k=256
        ).collect()[0]
        # 101 rows <= k: the sample IS the corpus, so percentiles are exact
        assert row["p50"] == 51.0
        assert row["p90"] == 91.0

    def test_deterministic_across_repartition(self, spark):
        from etl_reporting_spark.llm.corpusops import global_sampled_quantiles

        df = spark.createDataFrame(
            [(i, float(i * 37 % 1009)) for i in range(2000)],
            "doc_id long, score double",
        )
        a = global_sampled_quantiles(
            df, "score", "doc_id", {"t": 0.75}, k=64
        ).collect()[0]["t"]
        b = global_sampled_quantiles(
            df.repartition(13), "score", "doc_id", {"t": 0.75}, k=64
        ).collect()[0]["t"]
        assert a == b  # hash-keyed sample: layout-independent

    def test_plan_is_bounded_topk_not_full_window(self, spark):
        """The scale claim itself: Catalyst must rewrite the rank
        filter into TakeOrderedAndProject(k) — per-task k-row heaps —
        not a full shuffle-everything Sort+Window."""
        from etl_reporting_spark.llm.corpusops import global_sampled_quantiles

        df = spark.range(10_000).select(
            F.col("id").alias("doc_id"), (F.col("id") * 1.0).alias("score")
        )
        plan = global_sampled_quantiles(
            df, "score", "doc_id", {"t": 0.5}, k=128
        )._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "128" in plan

    def test_sample_error_is_small(self, spark):
        from etl_reporting_spark.llm.corpusops import global_sampled_quantiles

        n = 20_000
        df = spark.range(n).select(
            F.col("id").alias("doc_id"), (F.col("id") * 1.0).alias("score")
        )
        t = global_sampled_quantiles(
            df, "score", "doc_id", {"t": 0.5}, k=512
        ).collect()[0]["t"]
        # uniform scores: sampled median within ~3/sqrt(k) of true median
        assert abs(t / n - 0.5) < 3 / (512 ** 0.5)


def test_hll_sketch_is_mergeable_and_in_error_band(spark):
    """HLL contract: per-register MAX over two disjoint halves equals
    the whole-corpus sketch (the cross-day merge), and the raw
    estimate lands within the m=256 ±3σ band (σ = 1.04/√m ≈ 6.5%) of
    the true cardinality on a uniform corpus."""
    from etl_reporting_spark.llm.corpusops import hll_distinct
    from pyspark.sql import functions as F

    n = 3000
    df = spark.createDataFrame(
        [("g", i) for i in range(n)], "grp string, v long"
    )
    whole = hll_distinct(df, "grp", "v", p=8).collect()[0]
    est = whole["est_distinct"]
    assert abs(est - n) / n < 3 * 1.04 / (256 ** 0.5)

    # mergeability: sketch(a ∪ b) == register-max merge of the halves
    a = df.filter(F.col("v") < 1500)
    b = df.filter(F.col("v") >= 1500)
    merged = hll_distinct(a.unionByName(b), "grp", "v", p=8).collect()[0]
    assert merged["sum_inv"] == whole["sum_inv"]
    assert merged["est_distinct"] == whole["est_distinct"]

