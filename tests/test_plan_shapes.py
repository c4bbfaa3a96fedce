"""Plan-shape regression tests: the physical-plan properties SCALE.md
claims (pushdown, broadcast, WindowGroupLimit, no cross products)
must survive refactors. These read .explain output — cheap, no jobs
beyond file-footer reads."""

from __future__ import annotations

import contextlib
import io

import pytest

from etl_reporting_spark.plans.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: partkey/suppkey never read
    assert "l_partkey" not in plan


def test_j1_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j1_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    # region filter pushed into its scan
    assert "EqualTo(r_name,AMERICA)" in plan


def test_u2_rollup_scans_events_once(spark, sf_dir):
    """The 6-frequency rollup must derive the coarser levels from the
    daily aggregate, not re-scan the fact per level — at 100 TB that's
    a 6× scan + shuffle reduction."""
    import re

    plan = _plan(spark, sf_dir, "u2_period_rollup")
    # formatted mode shows each scan twice (tree + detail header); count
    # the numbered detail headers, one per physical scan node
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, plan


def test_dedup_latest_gets_window_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "w1_dedup_latest")
    # partial (pre-shuffle) + final top-1 per key
    assert plan.count("WindowGroupLimit") >= 2


def test_asof_join_single_shuffle_no_cross_product(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j5_asof_join")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # exactly one exchange (on the key) feeds the single window
    assert plan.count("+- Exchange") == 1
    assert plan.count("+- Window") == 1


def test_outliers_broadcast_stats_not_global_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "a9_outlier_events")
    assert "Window" not in plan  # stats via agg+broadcast, not empty OVER()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_interval_join_keeps_equi_key(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j6_interval_binding")
    assert "CartesianProduct" not in plan
    # hash join on user_id with the interval as residual condition
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "o3_top_orders")
    assert "TakeOrderedAndProject" in plan  # no global sort


@pytest.mark.parametrize("name", ["flagship_active_claimants", "u2_period_rollup"])
def test_no_cartesian_anywhere(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan


def test_emb_near_dup_lsh_pairs_no_cartesian(spark, sf_dir):
    from etl_reporting_spark.plans.llm_queries import LLM_QUERIES

    df = LLM_QUERIES["emb_near_duplicates"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_events_cutoff_pushes_timestamp_filter(spark, sf_dir):
    """The point-in-time cutoff must reach the parquet scan as a plain
    col<=literal in the column's own type (Spark 4.1 reads the
    TIMESTAMP(NANOS) column as TIMESTAMP_NTZ) — row-group pruning
    locally, partition pruning on a date-partitioned 100 TB fact."""
    import datetime as dt

    from etl_reporting_spark.io import events_at_or_before

    df = events_at_or_before(spark, sf_dir, dt.datetime(2024, 1, 15))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "LessThanOrEqual(ts,2024-01-15" in plan, plan
    # and the column is still a usable timestamp type
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")


def test_incremental_predicate_reaches_scan(spark, sf_dir):
    """The injected high-water-mark predicate must push to the parquet
    scan so run 2 of an incremental load reads only new row groups."""
    from etl_reporting_spark.io import Engine

    eng = Engine(spark)
    eng.register_testdata(sf_dir)
    df = eng.execute_query_from_file(
        "reports/incremental_orders/orders_batch.sql",
        substitutions={"BATCH_CUTOFF": "1996-12-31"},
        incremental_column="o_orderdate",
        last_load_value="1996-06-30",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "GreaterThan(o_orderdate,1996-06-30" in plan  # timestamp_ntz renders T00:00


def _llm_plan(spark, sf_dir, name: str) -> str:
    from etl_reporting_spark.plans.llm_queries import LLM_QUERIES

    df = LLM_QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_minhash_pipeline_no_cartesian_and_narrow_shingles(spark, sf_dir):
    """The near-dup pipeline's only joins are the banded candidate join
    and the inverted-index verify — never a cross product — and
    shingling must stay in-row: no Exchange between the scan and the
    signature aggregate's own shuffle (the old .distinct() added one)."""
    plan = _llm_plan(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # array_distinct happens in the row; no dedicated distinct shuffle
    assert "array_distinct" in plan


def test_hash_split_is_narrow(spark, sf_dir):
    """Split labelling is a pure projection: the only exchange in the
    gate query belongs to its groupBy, not the labelling."""
    plan = _llm_plan(spark, sf_dir, "sample_hash_split")
    import re

    # one hash exchange for the groupBy + one range exchange for the
    # final orderBy; the labelling itself adds nothing.
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_pii_redaction_is_narrow(spark, sf_dir):
    import re

    plan = _llm_plan(spark, sf_dir, "text_pii_redaction")
    # the gate's orderBy adds one range exchange; redaction itself is a
    # pure projection with no shuffle
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) <= 1 and "rangepartitioning" in plan
    # regexp work happens in the projection, not a UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_topk_gets_window_group_limit(spark, sf_dir):
    """The per-doc top-k rank filter must prune groups before the final
    shuffle (partial + final WindowGroupLimit), not rank every term."""
    plan = _plan(spark, sf_dir, "text_tfidf_topterms")
    assert plan.count("WindowGroupLimit") >= 2


def test_vocab_head_uses_take_ordered(spark, sf_dir):
    """Corpus-vocabulary top-k must be TakeOrderedAndProject
    (per-partition heaps) — a global Sort of the vocabulary would be
    the scale killer at a 100 TB corpus."""
    plan = _plan(spark, sf_dir, "text_vocab_head")
    assert "TakeOrderedAndProject" in plan
    assert "+- Sort" not in plan


def test_cube_pre_aggregates_single_fact_scan(spark, sf_dir):
    """CUBE must run over the pre-aggregated grain, not Expand the raw
    fact 4× — one parquet scan, and the Expand sits above the first
    aggregate."""
    import re

    plan = _plan(spark, sf_dir, "a14_cube")
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, plan


def test_ann_lsh_signature_stage_free_of_md5(spark, sf_dir):
    """The random-hyperplane sign matrices are constants, precomputed
    driver-side and embedded as array literals — no md5 may survive in
    the ANN-LSH or embedding-near-dup plans (it used to run
    planes × dim times per row)."""
    for name in ("ann_cosine_lsh", "emb_near_duplicates"):
        assert "md5" not in _plan(spark, sf_dir, name).lower(), name


def test_simhash_blocks_are_16_bit(spark, sf_dir):
    """The 64-bit SimHash blocks on 16-bit block values (65,536
    buckets each) — the plan must show the 65535 mask, and none of the
    old 4-bit nibble construction (mask 15)."""
    plan = _plan(spark, sf_dir, "dedup_simhash_pairs")
    assert "65535" in plan
    assert "& 15)" not in plan


def test_source_cap_gets_window_group_limit(spark, sf_dir):
    """Per-group quota is a rank filter — Spark must cap map-side
    state at max_rows per group before the shuffle."""
    plan = _plan(spark, sf_dir, "sample_source_cap")
    assert plan.count("WindowGroupLimit") >= 2


def test_kmv_sketch_bounded_state(spark, sf_dir):
    """KMV = distinct + per-group top-k: WindowGroupLimit bounds state
    at k rows per group; no cross product anywhere."""
    plan = _plan(spark, sf_dir, "sketch_kmv_distinct")
    assert plan.count("WindowGroupLimit") >= 2
    assert "CartesianProduct" not in plan


def test_line_dedup_broadcasts_boilerplate(spark, sf_dir):
    """The frequent-line set joins back by broadcast — the corpus is
    never the build side of a wide shuffle join."""
    plan = _plan(spark, sf_dir, "corpus_line_dedup")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bpe_pairs_take_ordered(spark, sf_dir):
    """Top-k merge candidates via TakeOrderedAndProject, not a global
    sort."""
    plan = _plan(spark, sf_dir, "bpe_pair_step")
    assert "TakeOrderedAndProject" in plan


def test_quality_classifier_is_narrow(spark, sf_dir):
    """The corpus-wide scoring pass must stay shuffle-free (ordering
    excepted: the gate's orderBy is presentation, not the operator)."""
    from etl_reporting_spark.io import load_table
    from etl_reporting_spark.llm.classify import quality_classifier_score

    df = quality_classifier_score(load_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_url_blocklist_is_broadcast_equi_join(spark, sf_dir):
    """The suffix explode must buy an equi hash join against the
    broadcast blocklist — never a LIKE/endswith nested loop."""
    plan = _plan(spark, sf_dir, "url_blocklist")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_sketches_partial_aggregate(spark, sf_dir):
    """Count-min and Bloom builds must map-side combine: each task
    ships at most depth*width / m/32 rows, not the corpus."""
    for gate in ("sketch_countmin", "sketch_bloom_screen"):
        plan = _plan(spark, sf_dir, gate)
        assert "partial_" in plan or "HashAggregate" in plan, gate
        assert "CartesianProduct" not in plan, gate


def test_pq_encode_argmin_is_partial_aggregate(spark, sf_dir):
    """The per-(vector, subspace) code argmin must compile to a
    MIN(struct) aggregate with a map-side partial — the exchange
    carries one best-row per group, never the n_codes-wide scored
    candidate relation, and no Window operator appears in the encode
    subtree. (Struct MIN plans as a partial SortAggregate — the map
    side still sorts by group key, like the window it replaced; the
    verified win is the exchange shrink plus the missing post-shuffle
    Window, not sort elimination.)"""
    from etl_reporting_spark.llm.quantize import pq_codebook, pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq_codebook(emb, 8, 16, 64)
    df = pq_encode(emb, cb, 8, 64)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan
    # count SHUFFLE exchanges only: the codebook's broadcast build
    # prints as "BroadcastExchange (n)", whose substring would match a
    # bare "Exchange (" count (the round-14 version of this assertion
    # did exactly that and failed at 2 <= 1)
    import re

    shuffles = re.findall(r"(?<![A-Za-z])Exchange \(", plan)
    assert len(shuffles) <= 1, plan


def test_forward_fill_single_fill_window(spark, sf_dir):
    """One running fill window per key — no extra global sort beyond
    the output order-by, no nested loop from the spine join."""
    plan = _plan(spark, sf_dir, "ts_forward_fill")
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan


def test_table_diff_single_outer_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j12_table_diff")
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
