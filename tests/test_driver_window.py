"""The driver-window ordering contract, pinned.

The driver verifies only the FIRST 50 ``queries()`` entries against
the DuckDB oracle (rows + schema + value hash); everything after row
50 gets local-only verification. A careless dict edit could silently
push a gate out of the driver-verified window — this test makes that
a red build instead.
"""

from __future__ import annotations

import __spark_entry__ as entry


EXPECTED_WINDOW = [
    "w8_sessionization",
    "flagship_active_claimants",
    "w1_dedup_latest",
    "w3_scd2_intervals",
    # round-14 rotation: see queries.py window notes — seven in
    # (three new round-14 gates + four zero-driver-history locals),
    # seven out, each 12-13 rounds driver-green with a driver-green
    # family representative staying in-window
    "u5_period_growth",
    "j5_asof_join",
    "q1_pricing_summary",
    "j1_revenue_by_nation",
    "p6_customers_without_orders",
    "a5_duplicate_detection",
    "ivm_agg_retraction",
    "a8_error_rate_by_type",
    "a9_outlier_events",
    "u2_period_rollup",
    "wap_sql_surface",
    "wap_merge_sql",
    "wap_update_delete_sql",
    "j7_scalar_config_join",
    "wap_cdf_stream_ivm",
    "wap_dv_lifecycle",
    "dq_drift_check",
    "f2_count_difference",
    # round-11 rotation: the two new table-format gates take the hard
    # driver signal; s4_multi_statement (script family keeps
    # sql_script_mixed) and a12_percentiles (agg family keeps six
    # reps) rotate to the locally-verified tail, each with 8+ rounds
    # of driver-green history
    "wap_hidden_partitioning",
    "wap_table_stats",
    # round-12 rotation: the spec-evolution gate (era-union prune,
    # cross-era DV merge, era rewrite vs one relational twin) takes
    # the hard driver signal; a13_pivot rotates to the locally-
    # verified tail with 10 rounds of driver-green history
    # (CORRECTNESS_r02-r11; the aggregate family keeps
    # a5/a7/a8/a9/u2/a14 driver-verified)
    "wap_spec_evolution",
    # round-14 second-half rotation: the three gates added after the
    # first rotation (min/max restore, retractable approx screen,
    # change-feed index sync) take the hard driver signal on debut;
    # fn_date_gallery (13 rounds driver-green, gallery family keeps
    # fn_conditional_gallery), a14_cube and j5b_asof_tolerance (8
    # rounds each, agg/join families keep multiple reps) rotate to
    # the locally-verified tail
    "incremental_dq_minmax_restore",
    # round-13 rotation: the staged-migration branch composition, the
    # two round-12 local-only table-format gates, and the incremental
    # DQ battery take the hard driver signal; fn_string_gallery,
    # f3_month_periods, dq_carrier_scoped and p2_exclude_projection
    # rotate to the locally-verified tail, each with 10-11 rounds of
    # driver-green history (CORRECTNESS_r02/r03-r12) and a
    # driver-verified family representative staying in-window
    "wap_branch_evolved",
    "fn_conditional_gallery",
    "sample_leakage_safe_split",
    "incremental_dq_dim_delete",
    "wap_rename_column",
    "dq_battery",
    "wap_update_dv",
    "inc_watermark_load",
    "j10_merge_upsert",
    "incremental_dq_cdf",
    "report_lifecycle_summary",
    "ann_index_incremental",
    # round-11 rotation: report_monthly_revenue -> locally-verified
    # tail (8 rounds driver-green; reports family keeps 3 driver
    # reps) to admit the new mixed-script DML gate
    "sql_script_mixed",
    "dq_report_battery",
    "incremental_dq_battery",
    "ann_index_cdf_sync",
    "w13_rolling_window",
    "incremental_dq_approx_retract",
    "fuzzy_address_dedup",
    "ivm_join_maintenance",
    "text_dsir_select",
    "mm_decode_throughput",
    "j14_skew_aware_join",
    "ann_recall_sweep_trained",
]


def test_driver_window_is_pinned():
    names = list(entry.queries())
    assert names[:50] == EXPECTED_WINDOW


def test_window_split_contains_the_round6_rotation():
    """Round-6 rotation: the six NEW capabilities are driver-verified
    (tolerance as-of, RANGE rolling window, fuzzy dedup, join IVM,
    sampled-threshold DSIR selection, vectorized-codec throughput).
    Rotated out to the locally-verified tail: fn_try_to_date and
    f1_udf_in_sql (their F1/date families keep driver-green
    representatives) and the four round-5 LLM picks (driver-green in
    CORRECTNESS_r05)."""
    new_r6 = {
        # j5b_asof_tolerance held the window r6-r13 (8 rounds
        # driver-green) and rotated to the tail in the round-14
        # second-half rotation
        "w13_rolling_window",
        "fuzzy_address_dedup",
        "ivm_join_maintenance",
        "text_dsir_select",
        "mm_decode_throughput",
    }
    assert new_r6 <= set(EXPECTED_WINDOW)
    rotated_out = {
        "fn_try_to_date",
        "f1_udf_in_sql",
        "dedup_minhash_lsh",
        "ann_cosine_topk",
        "dedup_cluster_resolution",
        "ann_cosine_ivfpq",
    }
    names = list(entry.queries())
    assert rotated_out.isdisjoint(EXPECTED_WINDOW)
    assert rotated_out <= set(names[50:])  # still present, locally verified


def test_window_split_contains_the_round7_rotation():
    """Round-7 rotation (round-5 ask #7 as named + that round's new
    gate): j14_skew_aware_join stays driver-verified; mm_decode_real
    and ann_recall_sweep held the window through r7 (driver-green in
    CORRECTNESS_r07) and rotated to the locally-verified tail in r8.
    Rotated out in r7 with 4+ rounds of driver-green history:
    a2_distinct_counts, p10_like_patterns, u3_intersect_except."""
    assert "j14_skew_aware_join" in set(EXPECTED_WINDOW)
    rotated_out = {"a2_distinct_counts", "p10_like_patterns", "u3_intersect_except"}
    names = list(entry.queries())
    assert rotated_out.isdisjoint(EXPECTED_WINDOW)
    assert rotated_out <= set(names[50:])  # still present, locally verified


def test_window_split_contains_the_round8_rotation():
    """Round-8 rotation (round-7 verdict #7 + the round's new serving
    gate): wap_dv_lifecycle (partitioned CREATE → DV delete → DV
    merge → schema evolution, read through the masked path) and
    ann_recall_sweep_trained (trained IVF+PQ + refine, hash-oracled
    through five chained Lloyd iterations) get the hard driver
    signal. Rotated to the locally-verified tail, each driver-green
    in CORRECTNESS_r07: ann_recall_sweep (superseded in-window by its
    trained twin) and mm_decode_real (the codec family keeps
    mm_decode_throughput driver-verified)."""
    new_r8 = {"wap_dv_lifecycle", "ann_recall_sweep_trained"}
    assert new_r8 <= set(EXPECTED_WINDOW)
    rotated_out = {"ann_recall_sweep", "mm_decode_real"}
    names = list(entry.queries())
    assert rotated_out.isdisjoint(EXPECTED_WINDOW)
    assert rotated_out <= set(names[50:])  # still present, locally verified


def test_every_query_has_oracle_or_is_documented():
    """Every gate needs an oracle twin for the correctness compare;
    any exception must be a deliberate, named omission (none today)."""
    names = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= names, f"orphan oracles: {sorted(oracles - names)}"
    assert names == oracles, f"gates without oracle: {sorted(names - oracles)}"


def test_window_split_contains_the_round9_rotation():
    """Round-9 rotation: the two new WAP capabilities are
    driver-verified — wap_sql_surface (spark.sql over version-pinned
    WAP views) and wap_cdf_stream_ivm (the change feed as an
    exactly-once incremental stream maintaining an IVM aggregate).
    Rotated out with 4+ rounds of driver-green history
    (CORRECTNESS_r05-r08): o3_top_orders (O1 ordering runs inside
    every gate) and a10_conditional_insert (the aggregate family
    keeps seven driver-green representatives)."""
    new_r9 = {"wap_sql_surface", "wap_cdf_stream_ivm"}
    assert new_r9 <= set(EXPECTED_WINDOW)
    rotated_out = {"o3_top_orders", "a10_conditional_insert"}
    names = list(entry.queries())
    assert rotated_out.isdisjoint(EXPECTED_WINDOW)
    assert rotated_out <= set(names[50:])  # still present, locally verified


def test_window_split_contains_the_round10_rotation():
    """Round-10 rotation: the two new SQL-DML gates are
    driver-verified — wap_merge_sql (the reference-shaped MERGE
    statement text routed onto the merge ladder, all three branches
    conditioned) and wap_update_delete_sql (UPDATE as
    partition-granular rewrite + DELETE as deletion vectors, both as
    text). Rotated out with 7+ rounds of driver-green history
    (CORRECTNESS_r02-r09): u1_union_distinct (the set-op family keeps
    u2_period_rollup and u4_union_by_name driver-verified) and
    w45_event_ordering (the window family keeps w1/w3/w8/w9/w13
    driver-verified)."""
    new_r10 = {"wap_merge_sql", "wap_update_delete_sql"}
    assert new_r10 <= set(EXPECTED_WINDOW)
    rotated_out = {"u1_union_distinct", "w45_event_ordering"}
    names = list(entry.queries())
    assert rotated_out.isdisjoint(EXPECTED_WINDOW)
    assert rotated_out <= set(names[50:])  # still present, locally verified


def test_window_split_contains_the_round13_rotation():
    """Round-13 rotation: the staged-migration composition gate
    (wap_branch_evolved — fork, rename + evolve + cross-era DV merge
    on the branch, publish over disjoint main progress and a main-side
    ANALYZE) plus the three round-12 local-green gates
    (wap_rename_column, wap_update_dv, incremental_dq_battery) get the
    hard driver signal. Rotated to the locally-verified tail, each
    with 10-11 rounds of driver-green history: fn_string_gallery,
    f3_month_periods, dq_carrier_scoped, p2_exclude_projection."""
    new_r13 = {
        "wap_branch_evolved",
        "wap_rename_column",
        "wap_update_dv",
        "incremental_dq_battery",
    }
    assert new_r13 <= set(EXPECTED_WINDOW)
    rotated_out = {
        "fn_string_gallery",
        "f3_month_periods",
        "dq_carrier_scoped",
        "p2_exclude_projection",
    }
    names = list(entry.queries())
    assert rotated_out.isdisjoint(EXPECTED_WINDOW)
    assert rotated_out <= set(names[50:])  # still present, locally verified


def test_window_split_contains_the_round11_rotation():
    """Round-11 rotation: the two new table-format gates are
    driver-verified — wap_hidden_partitioning (Iceberg transforms:
    pruned reads hash-matched against full-scan twins) and
    wap_table_stats (ANALYZE statistics reconstructed from metadata
    vs the data's truth). Rotated out with 8+ rounds of driver-green
    history (CORRECTNESS_r02-r10): s4_multi_statement (the script
    family keeps sql_script_mixed driver-verified) and
    a12_percentiles (the aggregate family keeps a5/a7/a8/a9/u2/a14
    driver-verified)."""
    new_r11 = {"wap_hidden_partitioning", "wap_table_stats"}
    assert new_r11 <= set(EXPECTED_WINDOW)
    rotated_out = {"s4_multi_statement", "a12_percentiles"}
    names = list(entry.queries())
    assert rotated_out.isdisjoint(EXPECTED_WINDOW)
    assert rotated_out <= set(names[50:])  # still present, locally verified


def test_window_split_contains_the_round14_rotation():
    """Round-14 rotation: the three new round-14 gates are
    driver-verified — incremental_dq_dim_delete (dim-DELETE
    re-orphaning closes the last incremental ≡ batch exception),
    incremental_dq_cdf (the battery fed purely from the table
    format's change feed with exact retraction), and
    ann_index_incremental (persisted ANN index, frozen-codebook
    growth) — alongside four long-local-only gates with zero driver
    history (u5_period_growth, ivm_agg_retraction, dq_drift_check,
    sample_leakage_safe_split). Rotated to the locally-verified tail
    with 12-13 rounds of driver-green history each:
    w9_scd2_apply_changes, a7_grouped_report, u4_union_by_name,
    f1_working_days, j6_interval_binding, fn_json_gallery,
    report_claimant_detail."""
    new_r14 = {
        "incremental_dq_dim_delete",
        "incremental_dq_cdf",
        "ann_index_incremental",
        "u5_period_growth",
        "ivm_agg_retraction",
        "dq_drift_check",
        "sample_leakage_safe_split",
    }
    assert new_r14 <= set(EXPECTED_WINDOW)
    rotated_out = {
        "w9_scd2_apply_changes",
        "a7_grouped_report",
        "u4_union_by_name",
        "f1_working_days",
        "j6_interval_binding",
        "fn_json_gallery",
        "report_claimant_detail",
    }
    names = list(entry.queries())
    assert rotated_out.isdisjoint(EXPECTED_WINDOW)
    assert rotated_out <= set(names[50:])  # still present, locally verified
