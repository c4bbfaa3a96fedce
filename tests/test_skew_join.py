"""Skew-stress evidence for the join layer (round-4 verdict #5).

SCALE.md leans on AQE skew splitting + ``salted_join`` for the 100 TB
story; these tests prove it on a genuinely skewed fact — 80% of rows
on ONE key — instead of asserting it from the docstring:

- correctness: salted output == plain join output, inner and left;
- the bound: with AQE and broadcast off (the regime salted_join is
  for — both sides too big to broadcast, a single key bigger than any
  split), the plain shuffle join lands >=70% of its output in one
  task while the salted join's largest task stays near 1/salt_buckets;
- the diagnostic: skew_report's skew_ratio is the number that tells
  an operator to reach for the salt.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from etl_reporting_spark.operators.skew import salted_join, skew_report

HOT_SHARE = 0.8
N_FACT = 60_000
N_KEYS = 1_000


@contextmanager
def _shuffle_join_regime(spark):
    """Force the shuffle-join path salted_join is designed for: no
    broadcast rescue, no AQE runtime splitting."""
    saved = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        yield
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.fixture(scope="module")
def skewed(spark):
    """(fact, dim): fact has 80% of rows on key 1, the rest uniform;
    dim has one row per key (fan-out 1, so output size == fact size)."""
    fact = spark.range(N_FACT).select(
        F.when(F.col("id") % 5 != 0, F.lit(1))
        .otherwise(F.col("id") % N_KEYS)
        .cast("long")
        .alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), F.concat(F.lit("attr_"), F.col("id")).alias("attr")
    )
    return fact, dim


def _partition_shares(df) -> list[float]:
    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in rows)
    return sorted((r["count"] / total for r in rows), reverse=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, skewed, how):
    fact, dim = skewed
    plain = fact.join(dim, ["k"], how).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
        F.count("attr").alias("matched"),
    )
    salted = salted_join(fact, dim, ["k"], salt_buckets=16, how=how).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
        F.count("attr").alias("matched"),
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salting_bounds_the_hot_task(spark, skewed):
    fact, dim = skewed
    with _shuffle_join_regime(spark):
        plain_shares = _partition_shares(fact.join(dim, ["k"], "inner"))
        salted_shares = _partition_shares(
            salted_join(fact, dim, ["k"], salt_buckets=16, how="inner")
        )
    # plain: the hot key hashes to ONE task that does 80% of the work
    assert plain_shares[0] >= 0.7, f"expected a straggler task, got {plain_shares[:4]}"
    # salted: the hot key spreads over 16 (key, salt) buckets; with
    # the 4 test shuffle partitions no task should exceed ~40%
    assert salted_shares[0] <= 0.45, f"salting left a straggler: {salted_shares[:4]}"


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_hot_keys_matches_plain_join(spark, skewed, how):
    """hot_keys-bounded salting (round-14): cold keys keep ONE right
    copy (salt 0), hot keys explode ×buckets — output identical to
    the plain join and to full salting."""
    fact, dim = skewed
    plain = fact.join(dim, ["k"], how).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
        F.count("attr").alias("matched"),
    )
    salted = salted_join(
        fact, dim, ["k"], salt_buckets=16, how=how, hot_keys=[1]
    ).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
        F.count("attr").alias("matched"),
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_hot_keys_still_bounds_the_hot_task(spark, skewed):
    fact, dim = skewed
    with _shuffle_join_regime(spark):
        shares = _partition_shares(
            salted_join(
                fact, dim, ["k"], salt_buckets=16, how="inner", hot_keys=[1]
            )
        )
    assert shares[0] <= 0.45, f"hot-key salting left a straggler: {shares[:4]}"


def test_salted_join_hot_keys_bounds_the_explode(spark, skewed):
    """The right side must carry |dim| + buckets·|hot| rows, not
    buckets·|dim| — the entire point of the hot-key bound."""
    _, dim = skewed
    from etl_reporting_spark.operators.skew import salted_join as sj  # noqa: F401

    exploded = salted_join(
        dim.select("k", "attr"), dim, ["k"], salt_buckets=16, how="inner",
        hot_keys=[1],
    )
    # fan-out 1 everywhere: each left row meets exactly one right row
    assert exploded.count() == dim.count()


def test_skew_report_flags_the_hot_key(spark, skewed):
    fact, _ = skewed
    top = skew_report(fact, "k", top_k=3).collect()
    hottest = top[0]
    assert hottest["key_value"] == 1
    assert hottest["share"] == pytest.approx(HOT_SHARE, abs=0.01)
    # avg rows/key ~ N_FACT/n_keys; the hot key is hundreds of times that
    assert hottest["skew_ratio"] > 100


def test_hot_keys_from_report_derives_the_hot_set(spark, skewed):
    """report → hot_keys wiring (round-15): the derived set contains
    exactly the keys at ≥ threshold share — here the one 80% key —
    and feeding it to salted_join reproduces the plain join."""
    from etl_reporting_spark.operators.skew import hot_keys_from_report

    fact, dim = skewed
    hot = hot_keys_from_report(fact, "k", share_threshold=0.05)
    assert hot == [1]
    # a threshold above the hot share yields no hot keys (everything
    # cold: salt 0 everywhere, still the plain join)
    assert hot_keys_from_report(fact, "k", share_threshold=0.9) == []
    # inline-probe mode: the seeded sample still flags the 80% key
    # (and could only ever change WHICH keys salt, never the output)
    assert hot_keys_from_report(fact, "k", sample_fraction=0.02) == [1]
    with _shuffle_join_regime(spark):
        plain = (
            fact.join(dim, ["k"], "inner")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        )
        salted = (
            salted_join(fact, dim, ["k"], hot_keys=hot)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        )
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )


# ------------------------------------------------------ skew_aware_join

def test_skew_aware_join_equals_plain(spark, skewed):
    from etl_reporting_spark.operators.skew import skew_aware_join

    fact, dim = skewed
    for how in ("inner", "left"):
        plain = fact.join(dim, ["k"], how)
        two_path = skew_aware_join(fact, dim, ["k"], how=how, min_hot_rows=1000)
        a = sorted(plain.collect())
        b = sorted(two_path.select(*plain.columns).collect())
        assert a == b, how


def test_skew_aware_join_null_keys_cold_path(spark):
    """NULL keys must neither match (inner) nor disappear (left)."""
    from etl_reporting_spark.operators.skew import skew_aware_join

    fact = spark.createDataFrame(
        [(1, 10), (1, 11), (None, 12), (2, 13)], "k long, v long"
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, attr string")
    out = skew_aware_join(fact, dim, ["k"], how="left", hot_keys=[1]).collect()
    assert len(out) == 4
    null_row = [r for r in out if r["k"] is None][0]
    assert null_row["attr"] is None


def test_skew_aware_join_broadcasts_the_hot_slice(spark, skewed):
    """The hot path must be a broadcast join (no shuffle skew by
    construction); with broadcast globally disabled the explicit
    F.broadcast hint still wins."""
    from etl_reporting_spark.operators.skew import skew_aware_join

    fact, dim = skewed
    with _shuffle_join_regime(spark):
        out = skew_aware_join(fact, dim, ["k"], hot_keys=[1])
        out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_skew_aware_join_no_hot_keys_is_plain_join(spark, skewed):
    from etl_reporting_spark.operators.skew import skew_aware_join

    fact, dim = skewed
    out = skew_aware_join(fact, dim, ["k"], min_hot_rows=10**9)
    assert out.count() == fact.join(dim, ["k"]).count()
