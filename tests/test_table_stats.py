"""ANALYZE-style statistics + cost-based join advice for WAP tables.

One fused scan publishes per-column stats (exact counts/min/max, HLL
NDV + the mergeable sketch, avg_len) into the commit log; key-shape
stats add the skew triad; join_advice turns two tables' metadata into
broadcast / shuffle / salted-shuffle with no job. Staleness is always
explicit. Runs under both storage backends.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_reporting_spark.operators.stats import (
    apply_join_advice,
    collect_key_stats,
    collect_table_stats,
    estimated_bytes,
    join_advice,
    table_stats,
    union_ndv,
)
from etl_reporting_spark.operators.wap import create_partitioned_wap_table

pytestmark = pytest.mark.usefixtures("wap_storage_backend")


def _facts(spark, n=2000, hot=0):
    df = spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 5).cast("int").alias("grp"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id").cast("double") * 1.5)
        .alias("val"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )
    if hot:
        hotdf = spark.range(hot).select(
            F.lit(1).cast("int").alias("k"),
            F.lit(0).cast("int").alias("grp"),
            F.lit(1.0).alias("val"),
            F.lit("hot").alias("name"),
        )
        df = df.unionByName(hotdf)
    return df


def test_exact_stats_match_direct_computation(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _facts(spark), ["grp"]
    )
    collect_table_stats(t)
    s = table_stats(t)
    assert s["row_count"] == 2000
    assert s["staleness"] == 0
    v = s["columns"]["val"]
    assert v["null_count"] == len([i for i in range(2000) if i % 7 == 0])
    assert v["min"] == 1.5  # id=0 is null (0%7==0), so min is id=1
    assert v["max"] == 1999 * 1.5
    k = s["columns"]["k"]
    assert (k["min"], k["max"], k["null_count"]) == (0, 1999, 0)
    assert "avg_len" in s["columns"]["name"]


def test_ndv_within_tolerance_and_sketch_mergeable(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _facts(spark), ["grp"]
    )
    collect_table_stats(t)
    s = table_stats(t)
    assert abs(s["columns"]["k"]["ndv"] - 2000) / 2000 < 0.05
    assert s["columns"]["grp"]["ndv"] == 5  # tiny domains are near-exact

    # a second table over an overlapping key domain: union NDV from
    # sketches alone must approximate the true distinct-union
    other = spark.range(1500, 3000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 5).cast("int").alias("grp"),
        F.lit(1.0).alias("val"),
        F.lit("x").alias("name"),
    )
    t2 = create_partitioned_wap_table(
        spark, str(tmp_path / "t2"), other, ["grp"]
    )
    collect_table_stats(t2)
    est = union_ndv([table_stats(t), table_stats(t2)], "k", spark)
    assert abs(est - 3000) / 3000 < 0.05


def test_staleness_tracks_data_commits_only(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _facts(spark), ["grp"]
    )
    collect_table_stats(t)
    assert table_stats(t)["staleness"] == 0
    t.add_check_constraint("val_ok", "val IS NULL OR val >= 0")
    assert table_stats(t)["staleness"] == 0  # metadata commits don't stale
    t.delete_rows("k < 10")
    assert table_stats(t)["staleness"] == 1
    collect_table_stats(t)
    s = table_stats(t)
    assert s["staleness"] == 0
    assert s["row_count"] == 1990  # k 0..9 deleted; re-analyze sees the mask


def test_stats_survive_unrelated_commits_via_sticky_carry(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _facts(spark), ["grp"]
    )
    collect_table_stats(t)
    t.delete_rows("k = 5")
    s = table_stats(t)  # still present, just stale
    assert s["analyzed_version"] == 1
    assert s["staleness"] == 1


def test_unanalyzed_table_raises(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _facts(spark), ["grp"]
    )
    with pytest.raises(LookupError, match="no statistics"):
        table_stats(t)


def test_estimated_bytes_projection_sensitivity(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _facts(spark), ["grp"]
    )
    collect_table_stats(t)
    s = table_stats(t)
    full = estimated_bytes(s)
    narrow = estimated_bytes(s, ["k"])
    assert narrow < full
    assert narrow >= s["row_count"] * 4
    with pytest.raises(ValueError, match="not analyzed"):
        estimated_bytes(s, ["nope"])


def test_key_stats_capture_the_skew_triad(spark, tmp_path):
    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _facts(spark, hot=500), ["grp"]
    )
    collect_key_stats(t, ["k"])
    s = table_stats(t)
    ks = s["keys"]["k"]
    assert ks["max_key_rows"] == 501  # key 1: one base row + 500 hot
    assert ks["mean_key_rows"] < 2.0
    assert ks["n_keys"] == 2000


def test_join_advice_broadcast_small_side(spark, tmp_path):
    big = create_partitioned_wap_table(
        spark, str(tmp_path / "big"), _facts(spark), ["grp"]
    )
    dim = spark.range(5).select(
        F.col("id").cast("int").alias("grp"),
        F.concat(F.lit("g"), F.col("id")).alias("label"),
    )
    small = create_partitioned_wap_table(
        spark, str(tmp_path / "small"), dim, ["grp"]
    )
    collect_table_stats(big)
    collect_table_stats(small)
    adv = join_advice(big, small, on=["grp"])
    assert adv["strategy"] == "broadcast_right"
    joined = apply_join_advice(big.read(), small.read(), ["grp"], adv)
    plain = big.read().join(small.read(), "grp")
    assert joined.count() == plain.count() == 2000
    # the containment estimate is sane: 2000*5/max(5,5) = 2000
    assert adv["estimated_output_rows"] == 2000


def test_join_advice_salted_on_hot_key(spark, tmp_path):
    left = create_partitioned_wap_table(
        spark, str(tmp_path / "l"), _facts(spark, hot=2000), ["grp"]
    )
    right = create_partitioned_wap_table(
        spark, str(tmp_path / "r"), _facts(spark), ["grp"]
    )
    collect_table_stats(left)
    collect_key_stats(left, ["k"])
    collect_table_stats(right)
    # force both sides "too big to broadcast" so the skew rule decides
    adv = join_advice(left, right, on=["k"], broadcast_threshold_bytes=1)
    assert adv["strategy"] == "salted_shuffle"
    assert 2 <= adv["salt"] <= 32
    got = apply_join_advice(left.read(), right.read(), ["k"], adv)
    plain = left.read().join(right.read(), "k")
    # salting must not change the result
    assert got.count() == plain.count()


def test_join_advice_plain_shuffle_without_skew(spark, tmp_path):
    a = create_partitioned_wap_table(
        spark, str(tmp_path / "a"), _facts(spark), ["grp"]
    )
    b = create_partitioned_wap_table(
        spark, str(tmp_path / "b"), _facts(spark), ["grp"]
    )
    collect_table_stats(a)
    collect_table_stats(b)
    adv = join_advice(a, b, on=["k"], broadcast_threshold_bytes=1)
    assert adv["strategy"] == "shuffle"
    assert any("stale" not in r for r in adv["reasons"])


def test_advice_reports_staleness(spark, tmp_path):
    a = create_partitioned_wap_table(
        spark, str(tmp_path / "a"), _facts(spark), ["grp"]
    )
    b = create_partitioned_wap_table(
        spark, str(tmp_path / "b"), _facts(spark), ["grp"]
    )
    collect_table_stats(a)
    collect_table_stats(b)
    a.delete_rows("k < 100")
    adv = join_advice(a, b, on=["k"])
    assert any("stale" in r for r in adv["reasons"])


def test_maintenance_plan_flags_stale_stats(spark, tmp_path):
    """The staleness advisor: an analyzed table whose stats fall
    behind gets an 'analyze' action; fresh stats and never-analyzed
    tables do not."""
    from etl_reporting_spark.operators.wap import maintenance_plan

    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _facts(spark), ["grp"]
    )
    # never analyzed: no action, no summary key
    plan = maintenance_plan(t)
    assert not any(a["action"] == "analyze" for a in plan["actions"])
    assert "stats_staleness" not in plan["summary"]

    collect_table_stats(t)
    plan = maintenance_plan(t, max_stats_staleness=2)
    assert plan["summary"]["stats_staleness"] == 0
    assert not any(a["action"] == "analyze" for a in plan["actions"])

    for i in range(3):
        t.delete_rows(f"k = {i}")
    plan = maintenance_plan(t, max_stats_staleness=2)
    assert plan["summary"]["stats_staleness"] == 3
    acts = [a for a in plan["actions"] if a["action"] == "analyze"]
    assert acts and "stale" in acts[0]["reason"]
    # applying the advice clears it
    collect_table_stats(t)
    plan = maintenance_plan(t, max_stats_staleness=2)
    assert not any(a["action"] == "analyze" for a in plan["actions"])


def test_overlap_ndv_from_sketches_alone(spark, tmp_path):
    """Key-domain overlap via inclusion-exclusion over stored HLL
    sketches: two tables with keys 0..1999 and 1500..2999 overlap on
    500 keys — estimated within the compounded sketch error, with
    containment fractions on both sides."""
    from etl_reporting_spark.operators.stats import overlap_ndv

    a = create_partitioned_wap_table(
        spark, str(tmp_path / "a"), _facts(spark), ["grp"]
    )
    bdf = spark.range(1500, 3000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 5).cast("int").alias("grp"),
        F.lit(1.0).alias("val"),
        F.lit("x").alias("name"),
    )
    b = create_partitioned_wap_table(spark, str(tmp_path / "b"), bdf, ["grp"])
    collect_table_stats(a)
    collect_table_stats(b)
    ov = overlap_ndv(table_stats(a), table_stats(b), "k", spark)
    assert abs(ov["intersection"] - 500) / 500 < 0.25  # three-way error
    assert 0.15 < ov["containment_a"] < 0.35   # 500/2000
    assert 0.25 < ov["containment_b"] < 0.45   # 500/1500
    # disjoint domains read ≈ zero intersection
    ddf = spark.range(50000, 52000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 5).cast("int").alias("grp"),
        F.lit(1.0).alias("val"),
        F.lit("x").alias("name"),
    )
    d = create_partitioned_wap_table(spark, str(tmp_path / "d"), ddf, ["grp"])
    collect_table_stats(d)
    ov2 = overlap_ndv(table_stats(a), table_stats(d), "k", spark)
    assert ov2["intersection"] < 0.05 * 2000


def test_estimated_bytes_refuses_key_stats_only_tables(spark, tmp_path):
    from etl_reporting_spark.operators.stats import estimated_bytes

    t = create_partitioned_wap_table(
        spark, str(tmp_path / "t"), _facts(spark), ["grp"]
    )
    collect_key_stats(t, ["k"])
    with pytest.raises(ValueError, match="no column statistics"):
        estimated_bytes(table_stats(t))
