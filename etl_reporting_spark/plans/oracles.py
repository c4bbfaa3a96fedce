"""DuckDB oracle SQL twins for every SQL-expressible query in
``queries.py``. Tables region/nation/customer/supplier/part/orders/
lineitem/events/documents/embeddings are pre-registered views over the
same parquet files the Spark queries read.

Same determinism convention as queries.py: exact DECIMAL aggregation,
final CAST to DOUBLE; identical double expression trees for derived
values; identical column aliases (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from etl_reporting_spark.plans.llm_oracles import LLM_ORACLE_SQL

EVENTS_CUTOFF_SQL = "TIMESTAMP '2024-01-15 00:00:00'"

ORACLE_SQL: dict[str, str] = {}
ORACLE_SQL.update(LLM_ORACLE_SQL)

ORACLE_SQL["flagship_active_claimants"] = f"""
WITH latest AS (
  SELECT * FROM (
    SELECT e.*, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events e WHERE ts <= {EVENTS_CUTOFF_SQL}
  ) t WHERE rn = 1
)
SELECT r.r_name AS region_name, l.event_type AS event_type,
       COUNT(*) AS n_claimants,
       COUNT(DISTINCT c.c_mktsegment) AS n_segments,
       CAST(SUM(CAST(l.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM latest l
JOIN customer c ON l.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
ORDER BY 1, 2
"""

ORACLE_SQL["w1_dedup_latest"] = f"""
SELECT user_id, event_id, event_type, ts, value FROM (
  SELECT e.*, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events e WHERE ts <= {EVENTS_CUTOFF_SQL}
) t WHERE rn = 1
"""

ORACLE_SQL["w3_scd2_intervals"] = """
SELECT user_id, event_id,
       ts AS row_effective,
       strftime(COALESCE(LEAD(ts) OVER w, TIMESTAMP '9999-12-31 00:00:00'),
                '%Y-%m-%d %H:%M:%S') AS row_expiration,
       CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS current_row_indicator,
       RANK() OVER w AS version_rank
FROM events WHERE event_type = 'signup'
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
"""

ORACLE_SQL["j5_asof_join"] = """
WITH views AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
), purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS pts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id, ts, purchase_id, purchase_value FROM (
  SELECT v.user_id, v.event_id, v.ts, p.purchase_id, p.purchase_value,
         ROW_NUMBER() OVER (
           PARTITION BY v.event_id
           ORDER BY p.pts DESC NULLS LAST, p.purchase_id DESC NULLS LAST) AS rn
  FROM views v LEFT JOIN purchases p
    ON v.user_id = p.user_id AND p.pts <= v.ts
) t WHERE rn = 1
"""

ORACLE_SQL["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      AS sum_disc_price,
  CAST(SUM((CAST(l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
      * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
      AS sum_charge,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLE_SQL["j1_revenue_by_nation"] = """
SELECT n.n_name AS nation_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA'
GROUP BY 1
ORDER BY 1
"""

ORACLE_SQL["p6_customers_without_orders"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND TRIM(CAST(c_custkey AS VARCHAR)) NOT IN (
    SELECT TRIM(CAST(o_custkey AS VARCHAR)) FROM orders
    WHERE o_custkey IS NOT NULL AND o_orderdate >= DATE '2001-01-01')
ORDER BY c_custkey
"""

ORACLE_SQL["a5_duplicate_detection"] = """
SELECT user_id, event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS event_day,
       COUNT(*) AS dup_count
FROM events
GROUP BY 1, 2, 3
HAVING COUNT(*) > 2
ORDER BY 1, 2, 3
"""

ORACLE_SQL["a7_grouped_report"] = """
SELECT
  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'Grand Total'
       ELSE CAST(o_orderstatus AS VARCHAR) END AS order_status,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice,
  CAST(GROUPING(o_orderstatus) AS INTEGER) AS rollup_level
FROM orders
GROUP BY ROLLUP(o_orderstatus)
"""

ORACLE_SQL["a14_cube"] = """
SELECT
  CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END AS event_type,
  CASE WHEN GROUPING(day_name) = 1 THEN 'ALL' ELSE day_name END AS day_name,
  CAST(GROUPING(event_type) * 2 + GROUPING(day_name) AS INTEGER) AS cube_level,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM (SELECT event_type, dayname(ts) AS day_name, value FROM events) base
GROUP BY CUBE(event_type, day_name)
ORDER BY cube_level, event_type, day_name
"""

ORACLE_SQL["a8_error_rate_by_type"] = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS event_day,
  COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
  COUNT(*) AS n_events,
  COUNT(*) FILTER (WHERE event_type = 'error') * CAST(100.0 AS DOUBLE)
    / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0) AS error_rate_pct,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
    / NULLIF(CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE), 0.0)
    AS avg_purchase_value
FROM events
GROUP BY 1
ORDER BY 1
"""

ORACLE_SQL["a9_outlier_events"] = """
WITH stats AS (
  SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s2,
         CAST(COUNT(value) AS DOUBLE) AS n
  FROM events
)
SELECT event_id, user_id, event_type, value
FROM events, stats
WHERE value > s1 / n + 3.0 * sqrt((s2 - s1 * s1 / n) / (n - 1.0))
ORDER BY event_id
"""

_U2_PERIOD_EXPRS = {
    "DAILY": "date_trunc('day', ts)",
    "WEEKLY": "date_trunc('week', ts)",
    "MONTHLY": "date_trunc('month', ts)",
    "QUARTERLY": "date_trunc('quarter', ts)",
    "SEMIANNUAL": (
        "make_date(CAST(year(ts) AS INTEGER),"
        " CASE WHEN month(ts) <= 6 THEN 1 ELSE 7 END, 1)"
    ),
    "YEARLY": "date_trunc('year', ts)",
}
_U2_LEVELS = "\nUNION ALL\n".join(
    f"SELECT '{label}' AS frequency, CAST({expr} AS TIMESTAMP) AS period_start,\n"
    "       COUNT(*) AS n_events,\n"
    "       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value\n"
    "FROM events GROUP BY 2"
    for label, expr in _U2_PERIOD_EXPRS.items()
)
ORACLE_SQL["u2_period_rollup"] = f"""
{_U2_LEVELS}
ORDER BY frequency, period_start
"""

ORACLE_SQL["o3_top_orders"] = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""

ORACLE_SQL["j7_scalar_config_join"] = """
WITH cfg AS (SELECT MAX(o_orderdate) AS max_orderdate FROM orders)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
FROM orders, cfg
WHERE o_orderdate >= max_orderdate - INTERVAL 12 MONTH
GROUP BY 1
ORDER BY 1
"""

ORACLE_SQL["fn_date_gallery"] = """
SELECT o_orderkey,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
  last_day(CAST(o_orderdate AS DATE)) AS month_end,
  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3_months,
  CAST(year(o_orderdate) AS INTEGER) AS order_year,
  CAST(month(o_orderdate) AS INTEGER) AS order_month,
  make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1)
    AS first_of_month,
  strftime(o_orderdate, '%m/%d/%Y') AS formatted_date,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
    AS days_to_2002
FROM orders
WHERE o_orderkey <= 1000
ORDER BY o_orderkey
"""

ORACLE_SQL["fn_string_gallery"] = """
SELECT c_custkey,
  TRIM('  ' || c_name || '  ') AS trimmed_name,
  c_name || '#' || c_mktsegment AS concat_name,
  substring(c_name, 1, 8) AS name_prefix,
  CAST(instr(c_name, '#') AS INTEGER) AS hash_pos,
  CAST(length(c_name) AS INTEGER) AS name_len,
  upper(c_mktsegment) AS segment_upper,
  CASE WHEN contains('CORP\\' || c_name, '\\')
       THEN substring('CORP\\' || c_name,
                      length('CORP\\' || c_name)
                        - strpos(reverse('CORP\\' || c_name), '\\') + 2)
       ELSE 'CORP\\' || c_name END AS stripped_user
FROM customer
WHERE c_custkey <= 500
ORDER BY c_custkey
"""

ORACLE_SQL["fn_conditional_gallery"] = """
SELECT c_custkey,
  CASE WHEN c_acctbal < 0 THEN 'negative'
       WHEN c_acctbal < 5000 THEN 'low'
       ELSE 'high' END AS bal_band,
  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS segment_or_default,
  abs(round(c_acctbal, 0)) AS abs_rounded_bal,
  greatest(c_acctbal, 0.0) AS floored_bal,
  md5(c_name) AS name_md5,
  TRY_CAST(right(c_name, 2) AS INTEGER) AS name_suffix_num,
  CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS positive_flag
FROM customer
WHERE c_custkey <= 500
ORDER BY c_custkey
"""

ORACLE_SQL["f1_working_days"] = """
WITH j AS (
  SELECT l.l_orderkey, l.l_linenumber,
         CAST(o.o_orderdate AS DATE) AS order_dt,
         CAST(l.l_shipdate AS DATE) AS ship_dt
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey <= 2000
), calc AS (
  SELECT *, date_diff('day', order_dt, ship_dt) + 1 AS n,
         isodow(order_dt) - 1 AS d0
  FROM j
)
SELECT l_orderkey, l_linenumber, order_dt, ship_dt,
  CAST(CASE WHEN ship_dt < order_dt THEN 0 ELSE
    (n // 7) * 5
    + GREATEST(LEAST(n % 7, 5 - d0), 0)
    + LEAST(GREATEST(d0 + (n % 7) - 7, 0), 5)
  END AS INTEGER) AS working_days
FROM calc
ORDER BY l_orderkey, l_linenumber
"""

ORACLE_SQL["j6_interval_binding"] = """
WITH s AS (
  -- lint: sentinel-ok (exp only bounds the join predicate, never projected)
  SELECT user_id, event_id AS version_id, ts AS eff,
         COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts ASC),
                  TIMESTAMP '9999-12-31 00:00:00') AS exp
  FROM events WHERE event_type = 'signup'
),
p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.user_id, p.event_id, p.ts, s.version_id
FROM p JOIN s ON p.user_id = s.user_id AND p.ts >= s.eff AND p.ts < s.exp
ORDER BY p.event_id
"""

ORACLE_SQL["f3_month_periods"] = """
SELECT CAST(d AS DATE) AS period_start_dt,
       last_day(CAST(d AS DATE)) AS period_end_dt,
       CAST(year(d) AS INTEGER) AS period_year,
       CAST(month(d) AS INTEGER) AS period_month,
       'ACME' AS carrier_name
FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-12-01', INTERVAL 1 MONTH) AS t(d)
ORDER BY 1
"""

ORACLE_SQL["dq_battery"] = """
WITH v1 AS (
  SELECT 'DQ-001' AS test_id, COUNT(*) AS failed_rows
  FROM customer WHERE c_name IS NULL OR CAST(c_name AS VARCHAR) = ''
), v2 AS (
  SELECT 'DQ-002', COUNT(*) FROM (
    SELECT TRIM(CAST(o_orderkey AS VARCHAR)) AS k FROM orders
    GROUP BY 1 HAVING COUNT(*) > 1) t
), v3 AS (
  SELECT 'DQ-003', COUNT(*) FROM (
    SELECT l_orderkey, l_linenumber FROM lineitem
    GROUP BY 1, 2 HAVING COUNT(*) > 1) t
), v4 AS (
  SELECT 'DQ-004', COUNT(*) FROM orders o
  WHERE TRIM(CAST(o.o_custkey AS VARCHAR)) NOT IN (
    SELECT DISTINCT TRIM(CAST(c_custkey AS VARCHAR)) FROM customer)
), v5 AS (
  SELECT 'DQ-005', COUNT(*) FROM customer WHERE c_acctbal < 0
), v6 AS (
  SELECT 'DQ-006', COUNT(*) FROM lineitem WHERE l_discount = 0
), v7 AS (
  SELECT 'DQ-007', COUNT(*) FROM events, (
    SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s2,
           CAST(COUNT(value) AS DOUBLE) AS n
    FROM events) st
  WHERE value > s1 / n + 3.0 * sqrt((s2 - s1 * s1 / n) / (n - 1.0))
)
SELECT test_id, CASE WHEN failed_rows = 0 THEN 'PASS' ELSE 'FAIL' END AS status, failed_rows
FROM (
  SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3
  UNION ALL SELECT * FROM v4 UNION ALL SELECT * FROM v5 UNION ALL SELECT * FROM v6
  UNION ALL SELECT * FROM v7
) t
ORDER BY test_id
"""

ORACLE_SQL["j10_merge_upsert"] = """
WITH target AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey <= 1000
), source AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
  FROM customer WHERE c_custkey > 500 AND c_custkey <= 1500
)
SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
       CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
       CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal
FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
WHERE s.c_custkey IS NOT NULL  -- WHEN NOT MATCHED BY SOURCE THEN DELETE
ORDER BY 1
"""

ORACLE_SQL["wap_dv_lifecycle"] = """
-- Final visible state of the WAP create→DV-delete→DV-merge→evolve
-- chain: keys <= 80 survive unless deleted (pre-merge rows, original
-- balance); every merge-source row (80, 140] is the appended new
-- version (+100), INCLUDING previously-deleted keys in that range
-- (the merge appends unconditionally; its mask only retracts visible
-- matches). c_name was dropped; note was added after every write, so
-- it reads NULL everywhere.
SELECT c_custkey, c_mktsegment, c_acctbal, CAST(NULL AS VARCHAR) AS note
FROM customer
WHERE c_custkey <= 80 AND c_custkey % 7 <> 0
UNION ALL
SELECT c_custkey, c_mktsegment, c_acctbal + 100.0 AS c_acctbal,
       CAST(NULL AS VARCHAR) AS note
FROM customer
WHERE c_custkey > 80 AND c_custkey <= 140
ORDER BY c_custkey
"""

ORACLE_SQL["wap_time_travel"] = """
-- v1 = full base; v2 = base minus the DV-deleted keys. Time travel
-- must show the deleted rows at v1 (vectors are per-version state).
SELECT CAST(1 AS INTEGER) AS snapshot, c_custkey, c_mktsegment, c_acctbal
FROM customer WHERE c_custkey <= 300
UNION ALL
SELECT CAST(2 AS INTEGER) AS snapshot, c_custkey, c_mktsegment, c_acctbal
FROM customer WHERE c_custkey <= 300 AND c_custkey % 5 <> 0
ORDER BY snapshot, c_custkey
"""

ORACLE_SQL["wap_change_feed"] = """
-- CDF of the DV merge: matched keys (100, 120] emit pre+post images
-- (+50 on the post side); source-only keys (120, 140] are inserts.
SELECT 'update_preimage' AS _change_type, c_custkey, c_mktsegment, c_acctbal
FROM customer WHERE c_custkey > 100 AND c_custkey <= 120
UNION ALL
SELECT 'update_postimage' AS _change_type, c_custkey, c_mktsegment,
       c_acctbal + 50.0 AS c_acctbal
FROM customer WHERE c_custkey > 100 AND c_custkey <= 120
UNION ALL
SELECT 'insert' AS _change_type, c_custkey, c_mktsegment,
       c_acctbal + 50.0 AS c_acctbal
FROM customer WHERE c_custkey > 120 AND c_custkey <= 140
ORDER BY c_custkey, _change_type
"""

ORACLE_SQL["wap_cdf_stream_ivm"] = """
-- Rebuild twin of the STREAMED aggregate view: final visible rows of
-- the create -> DV-delete(%4) -> DV-merge((100,160], +25) ->
-- DV-delete(%9) chain, aggregated directly. Keys <= 100 survive both
-- deletes at original balance; every merge-source key (100, 160]
-- (including %4-deleted keys it re-inserts) carries +25 and then
-- faces the %9 delete.
WITH final AS (
  SELECT c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer
  WHERE c_custkey <= 100 AND c_custkey % 4 <> 0 AND c_custkey % 9 <> 0
  UNION ALL
  SELECT c_mktsegment, CAST(c_acctbal + 25.0 AS DECIMAL(18,2)) AS bal
  FROM customer
  WHERE c_custkey > 100 AND c_custkey <= 160 AND c_custkey % 9 <> 0
)
SELECT c_mktsegment, COUNT(*) AS n_rows,
       CAST(SUM(bal) AS DOUBLE) AS sum_acctbal
FROM final
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLE_SQL["wap_sql_surface"] = """
-- spark.sql over version-pinned WAP views: v1 = base (keys <= 200),
-- v2 = base minus the DV-deleted keys (divisible by 3); decimal-exact
-- segment sums at both snapshots.
SELECT snapshot, c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM (
  SELECT CAST(1 AS INTEGER) AS snapshot, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey <= 200
  UNION ALL
  SELECT CAST(2 AS INTEGER) AS snapshot, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey <= 200 AND c_custkey % 3 <> 0
)
GROUP BY snapshot, c_mktsegment
ORDER BY snapshot, c_mktsegment
"""

ORACLE_SQL["wap_merge_sql"] = """
-- MERGE statement text routed onto the WAP merge ladder: matched &
-- (source.bal > 0) -> update; source-only & (bal <= 9000) -> insert;
-- target-only & (bal < 0) -> delete. The source covers every bucket
-- partition, so the delete scope is the whole table.
WITH tgt AS (
  SELECT c_custkey, c_custkey % 4 AS bucket, c_mktsegment,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer WHERE c_custkey <= 200
),
src AS (
  SELECT c_custkey, c_custkey % 4 AS bucket, c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DECIMAL(18,2)) AS bal
  FROM customer WHERE c_custkey > 150 AND c_custkey <= 250
),
final AS (
  SELECT t.c_custkey, t.bucket, t.c_mktsegment,
         CASE WHEN s.bal > 0 THEN s.bal ELSE t.bal END AS bal
  FROM tgt t JOIN src s ON t.c_custkey = s.c_custkey AND t.bucket = s.bucket
  UNION ALL
  SELECT t.c_custkey, t.bucket, t.c_mktsegment, t.bal
  FROM tgt t
  WHERE NOT EXISTS (
    SELECT 1 FROM src s
    WHERE s.c_custkey = t.c_custkey AND s.bucket = t.bucket
  ) AND NOT (t.bal < 0)
  UNION ALL
  SELECT s.c_custkey, s.bucket, s.c_mktsegment, s.bal
  FROM src s
  WHERE NOT EXISTS (
    SELECT 1 FROM tgt t
    WHERE t.c_custkey = s.c_custkey AND t.bucket = s.bucket
  ) AND s.bal <= 9000
)
SELECT c_custkey, bucket, c_mktsegment, CAST(bal AS DOUBLE) AS bal
FROM final
ORDER BY c_custkey
"""

ORACLE_SQL["wap_update_delete_sql"] = """
-- UPDATE (partition-granular rewrite; pre-update values; type kept)
-- then DELETE (deletion vectors) as statement text, in order.
SELECT c_custkey, c_custkey % 3 AS bucket, c_mktsegment,
       CAST(
         CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 0
              THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 10
                        AS DECIMAL(18,2))
              ELSE CAST(c_acctbal AS DECIMAL(18,2)) END
         AS DOUBLE) AS bal
FROM customer
WHERE c_custkey <= 300 AND c_custkey % 7 <> 0
ORDER BY c_custkey
"""

ORACLE_SQL["sql_script_mixed"] = """
-- SET $SEG = MACHINERY; MERGE (matched & seg<>$SEG -> update bal,
-- source-only & seg<>$SEG -> insert); SELECT aggregate over the
-- refreshed view. tgt = custkey<=180, src = 120<custkey<=240 at
-- bal+50; both derive from customer so a matched row's segment is
-- identical on both sides.
WITH tgt AS (
  SELECT c_custkey, c_custkey % 3 AS bucket, c_mktsegment,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer WHERE c_custkey <= 180
),
src AS (
  SELECT c_custkey, c_custkey % 3 AS bucket, c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 50 AS DECIMAL(18,2)) AS bal
  FROM customer WHERE c_custkey > 120 AND c_custkey <= 240
),
merged AS (
  SELECT t.c_custkey, t.bucket, t.c_mktsegment,
         CASE WHEN s.c_custkey IS NOT NULL
                   AND s.c_mktsegment <> 'MACHINERY'
              THEN s.bal ELSE t.bal END AS bal
  FROM tgt t
  LEFT JOIN src s
    ON t.c_custkey = s.c_custkey AND t.bucket = s.bucket
  UNION ALL
  SELECT s.c_custkey, s.bucket, s.c_mktsegment, s.bal
  FROM src s
  WHERE NOT EXISTS (
    SELECT 1 FROM tgt t
    WHERE t.c_custkey = s.c_custkey AND t.bucket = s.bucket
  ) AND s.c_mktsegment <> 'MACHINERY'
)
SELECT bucket,
       COUNT(*) AS n_rows,
       CAST(SUM(bal) AS DOUBLE) AS total_bal
FROM merged
WHERE c_mktsegment <> 'MACHINERY'
GROUP BY bucket
ORDER BY bucket
"""

ORACLE_SQL["u1_union_distinct"] = """
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
"""

ORACLE_SQL["w45_event_ordering"] = """
SELECT user_id, event_id, ts,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS decision_rank,
       MIN(ts) OVER (PARTITION BY user_id) AS first_decision_ts
FROM events WHERE event_type = 'error'
ORDER BY user_id, decision_rank
"""

ORACLE_SQL["p10_like_patterns"] = """
SELECT p_partkey, p_name, p_type, p_brand
FROM part
WHERE p_name LIKE '%red%' AND p_type LIKE 'ECO%'
ORDER BY p_partkey
"""

ORACLE_SQL["fn_json_gallery"] = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
       CAST(to_json(struct_pack(event_id := event_id,
                                event_type := event_type))
            AS VARCHAR) AS diag_payload
FROM events WHERE event_id < 500
ORDER BY event_id
"""

_REPORT_STEPS = f"""
latest AS (
  SELECT user_id, event_id, event_type, ts, value FROM (
    SELECT e.*, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events e WHERE ts <= {EVENTS_CUTOFF_SQL}
  ) t WHERE rn = 1
),
detail AS (
  SELECT
    c.c_custkey   AS "Customer Key",
    c.c_name      AS "Customer Name",
    c.c_mktsegment AS "Market Segment",
    n.n_name      AS "Nation",
    r.r_name      AS "Region",
    u.event_type  AS "Last Event Type",
    strftime(u.ts, '%m/%d/%Y') AS "Last Event Date",
    u.value       AS "Last Event Value",
    CASE WHEN u.event_type = 'purchase' THEN 1 ELSE 0 END AS "Active Purchaser Flag"
  FROM latest u
  JOIN customer c ON u.user_id = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
)
"""

ORACLE_SQL["report_lifecycle_summary"] = f"""
WITH {_REPORT_STEPS}
SELECT "Region" AS region_name,
       "Last Event Type" AS event_type,
       COUNT(*) AS n_claimants,
       CAST(SUM("Active Purchaser Flag") AS BIGINT) AS n_purchasers,
       CAST(SUM(CAST("Last Event Value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM detail
GROUP BY "Region", "Last Event Type"
ORDER BY region_name, event_type
"""

ORACLE_SQL["report_claimant_detail"] = f"""
WITH {_REPORT_STEPS}
SELECT * FROM detail ORDER BY "Customer Key"
"""

ORACLE_SQL["u3_intersect_except"] = """
SELECT user_id, 'both' AS set_op FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'error'
)
UNION ALL
SELECT user_id, 'click_not_signup' AS set_op FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'signup'
)
ORDER BY set_op, user_id
"""

ORACLE_SQL["p2_exclude_projection"] = """
SELECT * EXCLUDE (c_acctbal) FROM customer ORDER BY c_custkey
"""

ORACLE_SQL["fn_try_to_date"] = """
SELECT o_orderkey,
       strftime(o_orderdate, '%m/%d/%Y') AS date_str,
       CAST(try_strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y') AS DATE) AS parsed_back,
       CAST(try_strptime('13/45/' || CAST(year(o_orderdate) AS VARCHAR), '%m/%d/%Y') AS DATE)
         AS invalid_parse
FROM orders WHERE o_orderkey <= 1000
ORDER BY o_orderkey
"""

ORACLE_SQL["a2_distinct_counts"] = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP)) AS n_active_days,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLE_SQL["dq_report_battery"] = f"""
WITH {_REPORT_STEPS},
v1 AS (SELECT 'R-001' AS test_id, COUNT(*) AS failed_rows FROM detail WHERE "Customer Key" IS NULL),
v2 AS (SELECT 'R-002', COUNT(*) FROM (
  SELECT "Customer Key" FROM detail GROUP BY 1 HAVING COUNT(*) > 1) t),
v3 AS (SELECT 'R-003', COUNT(*) FROM detail
  WHERE try_strptime("Last Event Date", '%m/%d/%Y') IS NULL),
v4 AS (SELECT 'R-004', COUNT(*) FROM detail WHERE "Last Event Value" < 0),
v5 AS (SELECT 'R-005', COUNT(*) FROM detail
  WHERE "Active Purchaser Flag" = 1 AND "Last Event Type" != 'purchase'),
v6 AS (SELECT 'R-006', COUNT(*) FROM detail
  WHERE "Customer Key" NOT IN (SELECT DISTINCT c_custkey FROM customer))
SELECT test_id, CASE WHEN failed_rows = 0 THEN 'PASS' ELSE 'FAIL' END AS status, failed_rows
FROM (
  SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3
  UNION ALL SELECT * FROM v4 UNION ALL SELECT * FROM v5 UNION ALL SELECT * FROM v6
) t
ORDER BY test_id
"""

# dq_carrier_scoped: one row per carrier × table × check; the scoping
# predicate mirrors runner.synthesize_carrier_condition per table shape.
_CARRIER_CHECKS = []
for _carrier in ("BUILDING", "MACHINERY"):
    for _t_name, _scope in (
        ("cc_name", f"c_mktsegment = '{_carrier}'"),
        ("cc_dim", f"md5(c_mktsegment) = md5('{_carrier}')"),
        ("cc_none", "1=1"),
    ):
        _CARRIER_CHECKS.append(
            f"SELECT '{_carrier}' AS carrier, '{_t_name}-NEG' AS test_id,\n"
            f"  (SELECT COUNT(*) FROM customer WHERE {_scope} AND c_acctbal < 0)"
            " AS failed_rows"
        )
        _CARRIER_CHECKS.append(
            f"SELECT '{_carrier}', '{_t_name}-NULL',\n"
            f"  (SELECT COUNT(*) FROM customer WHERE {_scope} AND c_name IS NULL)"
        )

ORACLE_SQL["dq_carrier_scoped"] = (
    "WITH checks AS (\n"
    + "\nUNION ALL\n".join(_CARRIER_CHECKS)
    + "\n)\nSELECT carrier, test_id,\n"
    "  CASE WHEN failed_rows = 0 THEN 'PASS' ELSE 'FAIL' END AS status,\n"
    "  failed_rows\nFROM checks ORDER BY carrier, test_id"
)

# inc_watermark_load: the incrementally-built table must equal one
# full load at the final batch cutoff.
ORACLE_SQL["inc_watermark_load"] = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate <= DATE '1996-12-31'
ORDER BY o_orderkey
"""

ORACLE_SQL["f1_udf_in_sql"] = """
WITH j AS (
  SELECT l.l_orderkey, l.l_linenumber,
         CAST(o.o_orderdate AS DATE) AS s, CAST(l.l_shipdate AS DATE) AS e
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey <= 1000
), calc AS (
  SELECT *, date_diff('day', s, e) + 1 AS n, isodow(s) - 1 AS d0 FROM j
)
SELECT l_orderkey, l_linenumber,
  CAST(CASE WHEN e < s THEN 0 ELSE
    (n // 7) * 5
    + GREATEST(LEAST(n % 7, 5 - d0), 0)
    + LEAST(GREATEST(d0 + (n % 7) - 7, 0), 5)
  END AS INTEGER) AS ship_working_days
FROM calc
ORDER BY l_orderkey, l_linenumber
"""

ORACLE_SQL["w8_sessionization"] = """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sessions AS (
  SELECT *, SUM(boundary) OVER (  -- lint: sum-ok (re-cast BIGINT in final projection)
    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
  (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS duration_sec
FROM sessions
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""

ORACLE_SQL["a10_conditional_insert"] = """
SELECT n_nationkey, n_name, n_regionkey
FROM nation
WHERE n_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 15)
ORDER BY n_nationkey
"""

ORACLE_SQL["u4_union_by_name"] = """
SELECT c_custkey, c_name, 'names' AS branch, CAST(NULL AS DOUBLE) AS c_acctbal
FROM customer WHERE c_custkey <= 100
UNION ALL
SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, 'balances' AS branch, c_acctbal
FROM customer WHERE c_custkey > 1400
ORDER BY c_custkey
"""

ORACLE_SQL["f2_count_difference"] = """
SELECT
  CAST(src_rows AS BIGINT) AS src_rows,
  CAST(tgt_rows AS BIGINT) AS tgt_rows,
  CAST(abs(src_rows - tgt_rows) AS BIGINT) AS count_difference
FROM
  (SELECT COUNT(*) AS src_rows FROM orders WHERE o_orderdate < DATE '1996-01-01'),
  (SELECT COUNT(*) AS tgt_rows FROM orders WHERE o_orderstatus = 'O')
"""

ORACLE_SQL["s4_multi_statement"] = """
SELECT r.r_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name ORDER BY r.r_name
"""

ORACLE_SQL["a12_percentiles"] = """
SELECT o_orderpriority,
  CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS median_price,
  CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE) AS p90_price,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLE_SQL["a13_pivot"] = """
SELECT CAST(ts AS DATE) AS event_date,
  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
  CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
FROM events GROUP BY 1 ORDER BY 1
"""

# Full-rebuild twin of the incremental scd2_apply_changes gate: if the
# incremental path is correct it must equal the LEAD chain over the
# whole history.
ORACLE_SQL["w9_scd2_apply_changes"] = """
SELECT user_id, event_id,
       ts AS row_effective,
       strftime(COALESCE(LEAD(ts) OVER w, TIMESTAMP '9999-12-31 00:00:00'),
                '%Y-%m-%d %H:%M:%S') AS row_expiration,
       CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS current_row_indicator
FROM events WHERE event_type = 'signup'
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
ORDER BY user_id, ts
"""

ORACLE_SQL["report_monthly_revenue"] = """
WITH scoped AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, r.r_name AS region_name
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE o.o_orderdate >= DATE '1995-01-01' AND o.o_orderdate < DATE '1995-07-01'
),
monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         region_name,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM scoped GROUP BY 1, 2
)
SELECT month, region_name, n_orders, revenue,
  CAST(CAST(revenue AS DECIMAL(18,2)) AS DOUBLE)
    / CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER (PARTITION BY month)
           AS DOUBLE) AS region_share
FROM monthly ORDER BY month, region_name
"""

# a15: the oracle is the FULL RECOMPUTE over all of orders — the gate
# computes the same numbers incrementally (three batch partials
# merged), so the hash match PROVES merge(partials) ≡ recompute.
# Decimal-exact sums; doubles only in the final derived expressions,
# mirrored shape-for-shape.
ORACLE_SQL["a15_incremental_rollup"] = """
WITH p AS (
  SELECT o_orderpriority,
    CAST(COUNT(*) AS BIGINT) AS p_cnt,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS p_sum,
    MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS p_min,
    MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS p_max,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4)) * CAST(o_totalprice AS DECIMAL(19,4)))
         AS DECIMAL(38,8)) AS p_sumsq
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
  p_cnt AS n_rows,
  CAST(p_sum AS DOUBLE) AS sum_value,
  CAST(p_min AS DOUBLE) AS min_value,
  CAST(p_max AS DOUBLE) AS max_value,
  CAST(p_sum AS DOUBLE) / CAST(p_cnt AS DOUBLE) AS avg_value,
  -- DECIMAL(38,8)→DOUBLE is not correctly rounded in DuckDB for
  -- int128-backed values (off by 1 ulp vs Spark's BigDecimal path);
  -- VARCHAR→DOUBLE goes through strtod, which is — route through it.
  CASE WHEN p_cnt > 1 THEN sqrt(greatest(
    (CAST(CAST(p_sumsq AS VARCHAR) AS DOUBLE)
     - CAST(p_sum AS DOUBLE) * CAST(p_sum AS DOUBLE) / CAST(p_cnt AS DOUBLE))
    / (CAST(p_cnt AS DOUBLE) - 1.0), 0.0)
  ) END AS stddev_value
FROM p ORDER BY o_orderpriority
"""

ORACLE_SQL["ops_skew_report"] = """
WITH c AS (
  SELECT user_id AS key_value, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY user_id
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         CAST(MAX(n_rows) AS BIGINT) AS max_rows
  FROM c
)
SELECT key_value, n_rows,
  CAST(n_rows AS DOUBLE) / CAST(total_rows AS DOUBLE) AS share,
  n_keys, total_rows,
  CAST(total_rows AS DOUBLE) / CAST(n_keys AS DOUBLE) AS avg_rows_per_key,
  CAST(max_rows AS DOUBLE)
    / (CAST(total_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)) AS skew_ratio
FROM c, s
ORDER BY n_rows DESC, key_value ASC
LIMIT 10
"""

# Drift: TVD folds |delta| in category order (list_reduce ≡ Spark's
# sorted-struct aggregate fold), halved at the end.
ORACLE_SQL["dq_drift_check"] = """
WITH cur AS (
  SELECT event_type AS category, CAST(COUNT(*) AS BIGINT) AS n_cur
  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY event_type
),
base AS (
  SELECT event_type AS category, CAST(COUNT(*) AS BIGINT) AS n_base
  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY event_type
),
j AS (
  SELECT COALESCE(cur.category, base.category) AS category,
    COALESCE(n_cur, 0) AS n_cur, COALESCE(n_base, 0) AS n_base
  FROM cur FULL OUTER JOIN base ON cur.category = base.category
),
t AS (SELECT CAST(SUM(n_cur) AS BIGINT) AS t_cur, CAST(SUM(n_base) AS BIGINT) AS t_base FROM j),
sh AS (
  SELECT category, n_cur, n_base,
    CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE) AS share_cur,
    CAST(n_base AS DOUBLE) / CAST(t_base AS DOUBLE) AS share_base,
    abs(CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE)
        - CAST(n_base AS DOUBLE) / CAST(t_base AS DOUBLE)) AS abs_delta
  FROM j, t
),
tv AS (
  SELECT list_reduce(list(abs_delta ORDER BY category), (acc, x) -> acc + x) / 2.0 AS tvd
  FROM sh
)
SELECT category, n_cur, n_base, share_cur, share_base, abs_delta, tvd,
  tvd <= 0.1 AS passed
FROM sh, tv
ORDER BY category
"""

# Cohort retention: date_trunc('week') is Monday-start in both
# engines; offsets are day-diffs // 7 on exact dates.
ORACLE_SQL["w10_cohort_retention"] = """
WITH first AS (
  SELECT user_id AS u, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_period
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS active_period
  FROM events
),
j AS (
  SELECT a.u, f.cohort_period,
    CAST((a.active_period - f.cohort_period) // 7 AS INTEGER) AS period_offset
  FROM activity a JOIN first f USING (u)
),
c AS (
  SELECT cohort_period, period_offset, CAST(COUNT(DISTINCT u) AS BIGINT) AS n_active
  FROM j GROUP BY cohort_period, period_offset
),
s AS (
  SELECT cohort_period, CAST(COUNT(DISTINCT u) AS BIGINT) AS cohort_size
  FROM first GROUP BY cohort_period
)
SELECT c.cohort_period, c.period_offset, c.n_active, s.cohort_size,
  CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
FROM c JOIN s USING (cohort_period)
ORDER BY c.cohort_period, c.period_offset
"""

# Funnel: stage-(i) conversion = earliest stage-i event at/after the
# stage-(i-1) conversion time, per user; counts + window conversions.
ORACLE_SQL["w11_funnel_conversion"] = """
WITH s0 AS (
  SELECT user_id AS u, MIN(ts) AS stage_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS stage_ts
  FROM events e JOIN s0 ON e.user_id = s0.u
  WHERE e.event_type = 'click' AND e.ts >= s0.stage_ts
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS stage_ts
  FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'purchase' AND e.ts >= s1.stage_ts
  GROUP BY e.user_id
),
stacked AS (
  SELECT 0 AS stage_idx, 'view' AS stage, CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_users
  UNION ALL
  SELECT 1, 'click', CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
  UNION ALL
  SELECT 2, 'purchase', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
)
SELECT stage_idx, stage, n_users,
  CASE WHEN stage_idx = 0 THEN 1.0
       WHEN lag(n_users) OVER (ORDER BY stage_idx) > 0
         THEN CAST(n_users AS DOUBLE) / CAST(lag(n_users) OVER (ORDER BY stage_idx) AS DOUBLE)
  END AS conv_from_prev,
  CASE WHEN first_value(n_users) OVER (ORDER BY stage_idx) > 0
         THEN CAST(n_users AS DOUBLE)
              / CAST(first_value(n_users) OVER (ORDER BY stage_idx) AS DOUBLE)
  END AS conv_from_first
FROM stacked ORDER BY stage_idx
"""

# Hierarchy flatten: DuckDB runs the REAL recursive CTE; the Spark
# side is the iterative walker — the hash match proves the loop ≡
# SQL recursion.
ORACLE_SQL["h1_hierarchy_flatten"] = """
WITH RECURSIVE e AS (
  SELECT doc_id AS node,
    CASE WHEN doc_id = 0 THEN NULL ELSE doc_id // 7 END AS parent
  FROM documents
),
walk AS (
  SELECT node, node AS cur, 0 AS depth, CAST(node AS VARCHAR) AS path
  FROM e
  UNION ALL
  SELECT w.node, e.parent AS cur, w.depth + 1,
    CAST(e.parent AS VARCHAR) || '/' || w.path
  FROM walk w JOIN e ON w.cur = e.node
  WHERE e.parent IS NOT NULL
)
SELECT node, cur AS root, CAST(depth AS INTEGER) AS depth, path
FROM walk w
WHERE NOT EXISTS (
  SELECT 1 FROM e WHERE e.node = w.cur AND e.parent IS NOT NULL
)
ORDER BY node
"""

# j12: same mutation recipe, diff via full-outer + null-safe compares.
ORACLE_SQL["j12_table_diff"] = """
WITH new AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 5.0 ELSE o_totalprice END AS o_totalprice,
    CASE WHEN o_orderkey % 11 = 0 THEN '9-RECLASSIFIED' ELSE o_orderpriority END AS o_orderpriority,
    o_orderstatus
  FROM orders WHERE o_orderkey % 97 != 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, o_orderpriority, o_orderstatus
  FROM orders WHERE o_orderkey % 101 = 0
),
j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
    o.o_orderkey IS NULL AS is_added, n.o_orderkey IS NULL AS is_removed,
    o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
      AND o.o_totalprice IS DISTINCT FROM n.o_totalprice AS ch_price,
    o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
      AND o.o_orderpriority IS DISTINCT FROM n.o_orderpriority AS ch_prio,
    o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
      AND o.o_orderstatus IS DISTINCT FROM n.o_orderstatus AS ch_status
  FROM orders o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
),
statused AS (
  SELECT k,
    CASE WHEN is_added THEN 'added'
         WHEN is_removed THEN 'removed'
         WHEN ch_price OR ch_prio OR ch_status THEN 'changed'
         ELSE 'unchanged' END AS status,
    ch_price, ch_prio, ch_status
  FROM j
),
counts AS (
  SELECT status AS metric, CAST(COUNT(*) AS BIGINT) AS n FROM statused GROUP BY status
  UNION ALL
  SELECT 'col:o_totalprice', CAST(COUNT(*) AS BIGINT) FROM statused WHERE ch_price
  UNION ALL
  SELECT 'col:o_orderpriority', CAST(COUNT(*) AS BIGINT) FROM statused WHERE ch_prio
)
SELECT metric, n FROM counts WHERE n > 0 OR metric NOT LIKE 'col:%'
ORDER BY metric
"""

ORACLE_SQL["dq_drift_numeric"] = """
WITH b AS (
  SELECT ts,
    CAST(CASE WHEN value IS NULL THEN 11
      WHEN CAST(floor((CAST(value AS DOUBLE) - 0.0) / 1000.0 * 10) AS INTEGER) < 0 THEN -1
      WHEN CAST(floor((CAST(value AS DOUBLE) - 0.0) / 1000.0 * 10) AS INTEGER) >= 10 THEN 10
      ELSE CAST(floor((CAST(value AS DOUBLE) - 0.0) / 1000.0 * 10) AS INTEGER)
    END AS VARCHAR) AS category
  FROM events
),
cur AS (
  SELECT category, CAST(COUNT(*) AS BIGINT) AS n_cur FROM b
  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY category
),
base AS (
  SELECT category, CAST(COUNT(*) AS BIGINT) AS n_base FROM b
  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY category
),
j AS (
  SELECT COALESCE(cur.category, base.category) AS category,
    COALESCE(n_cur, 0) AS n_cur, COALESCE(n_base, 0) AS n_base
  FROM cur FULL OUTER JOIN base ON cur.category = base.category
),
t AS (SELECT CAST(SUM(n_cur) AS BIGINT) AS t_cur, CAST(SUM(n_base) AS BIGINT) AS t_base FROM j),
sh AS (
  SELECT category, n_cur, n_base,
    CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE) AS share_cur,
    CAST(n_base AS DOUBLE) / CAST(t_base AS DOUBLE) AS share_base,
    abs(CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE)
        - CAST(n_base AS DOUBLE) / CAST(t_base AS DOUBLE)) AS abs_delta
  FROM j, t
),
tv AS (
  SELECT list_reduce(list(abs_delta ORDER BY category), (acc, x) -> acc + x) / 2.0 AS tvd
  FROM sh
)
SELECT category, n_cur, n_base, share_cur, share_base, abs_delta, tvd,
  tvd <= 0.1 AS passed
FROM sh, tv
ORDER BY CAST(category AS INTEGER)
"""

# Forward fill: same slot arithmetic (floor(epoch/step)*step), spine
# via range(lo, hi+step, step), per-slot latest by arg_max, fill via
# last_value IGNORE NULLS over the running frame.
ORACLE_SQL["ts_forward_fill"] = """
WITH src AS (
  SELECT event_type, ts, value FROM events WHERE user_id < 5 AND value IS NOT NULL
),
obs AS (
  SELECT event_type AS k,
    CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS slot_s,
    (MAX({'t': ts, 'v': value})).v AS v
  FROM src
  GROUP BY 1, 2
),
bounds AS (
  SELECT event_type AS k,
    CAST(floor(epoch(MIN(ts)) / 3600) * 3600 AS BIGINT) AS lo,
    CAST(floor(epoch(MAX(ts)) / 3600) * 3600 AS BIGINT) AS hi
  FROM src GROUP BY 1
),
spine AS (
  SELECT k, unnest(range(lo, hi + 3600, 3600)) AS slot_s FROM bounds
),
f AS (
  SELECT s.k, s.slot_s, o.v,
    last_value(o.v IGNORE NULLS) OVER (
      PARTITION BY s.k ORDER BY s.slot_s
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS filled
  FROM spine s LEFT JOIN obs o ON s.k = o.k AND s.slot_s = o.slot_s
)
SELECT k AS event_type, make_timestamp(slot_s * 1000000) AS slot_ts,
  v AS observed, filled AS value
FROM f ORDER BY event_type, slot_ts
"""

ORACLE_SQL["fn_window_gallery"] = """
WITH src AS (
  SELECT event_id, event_type, CAST(value AS DECIMAL(18,4)) AS v
  FROM events WHERE event_id < 200
)
SELECT event_id, event_type,
  ntile(4) OVER w AS quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume,
  CAST(nth_value(v, 2) OVER (
    PARTITION BY event_type ORDER BY event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS DOUBLE) AS second_value,
  CAST(SUM(v) OVER f3 AS DOUBLE) / CAST(COUNT(v) OVER f3 AS DOUBLE) AS moving_avg3
FROM src
WINDOW w AS (PARTITION BY event_type ORDER BY event_id),
  f3 AS (PARTITION BY event_type ORDER BY event_id
         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
ORDER BY event_id
"""

# Period-over-period growth: decimal-exact monthly sums, lag over the
# month sequence, doubles only in the derived delta/rate.
ORACLE_SQL["u5_period_growth"] = """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev  -- lint: sum-ok (decimal)
  FROM orders GROUP BY 1
)
SELECT month, n_orders,
  CAST(rev AS DOUBLE) AS revenue,
  CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE) AS prev_revenue,
  CAST(rev - lag(rev) OVER (ORDER BY month) AS DOUBLE) AS delta,
  CASE WHEN lag(rev) OVER (ORDER BY month) IS NOT NULL
        AND lag(rev) OVER (ORDER BY month) != 0
       THEN CAST(rev - lag(rev) OVER (ORDER BY month) AS DOUBLE)
            / CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE)
  END AS growth_rate
FROM m ORDER BY month
"""

# Stickiness: distinct (user, day) base, two rollups, one division.
ORACLE_SQL["w12_stickiness"] = """
WITH ud AS (
  SELECT DISTINCT user_id,
    CAST(date_trunc('day', ts) AS DATE) AS day,
    CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
),
dau AS (
  SELECT week, CAST(SUM(dau) AS BIGINT) AS dau_sum, CAST(COUNT(*) AS BIGINT) AS n_days
  FROM (SELECT week, day, COUNT(*) AS dau FROM ud GROUP BY 1, 2) d
  GROUP BY week
),
wau AS (
  SELECT week, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau FROM ud GROUP BY week
)
SELECT dau.week, wau.wau, dau.n_days,
  CAST(dau_sum AS DOUBLE) / CAST(n_days AS DOUBLE) AS avg_dau,
  CAST(dau_sum AS DOUBLE) / CAST(n_days * wau AS DOUBLE) AS stickiness
FROM dau JOIN wau USING (week)
ORDER BY dau.week
"""

# Salted skew join: the salt is internal to the operator, so the
# oracle is the PLAIN equi-join on the skewed derived key — value
# equality IS the proof the salt doesn't leak into results.
ORACLE_SQL["j13_salted_join"] = """
WITH skewed AS (
  SELECT CASE WHEN event_id % 5 != 0 THEN 1 ELSE user_id END AS k, value
  FROM events
)
SELECT c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM skewed s JOIN customer c ON s.k = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY mktsegment
"""

# Two-path skew join: grouping by the hot/cold split verifies the
# broadcast-hot-slice path and the plain-cold path independently;
# the union must equal the plain equi-join row-for-row.
ORACLE_SQL["j14_skew_aware_join"] = """
WITH skewed AS (
  SELECT CASE WHEN event_id % 5 != 0 THEN 1 ELSE user_id END AS k, value
  FROM events
)
SELECT c.c_mktsegment AS mktsegment,
       (s.k = 1) AS is_hot,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM skewed s JOIN customer c ON s.k = c.c_custkey
GROUP BY c.c_mktsegment, (s.k = 1)
ORDER BY mktsegment, is_hot
"""

# Fuzzy dedup: the full q-gram-blocked pipeline replayed — planted
# one-char-deletion twins of 300 part names, trigram inverted
# index with df cap 50, length-bucket pass for strings under the
# (k+1)*q lemma floor, exact levenshtein verify (DuckDB's and Spark's
# levenshtein agree exactly).
ORACLE_SQL["fuzzy_address_dedup"] = """
WITH cust AS (
  SELECT p_partkey AS id, p_name AS text
  FROM part WHERE p_partkey <= 300
),
mut AS (
  SELECT id + 100000 AS id,
         substr(text, 1, (id % length(text)) + 1 - 1)
           || substr(text, (id % length(text)) + 1 + 1, 1000) AS text
  FROM cust
),
allr AS (SELECT * FROM cust UNION ALL SELECT * FROM mut),
grams AS (
  SELECT DISTINCT id, g FROM (
    SELECT id,
           unnest(list_transform(
             generate_series(1, greatest(length(text) - 2, 1)),
             i -> substr(text, i, 3))) AS g
    FROM allr
  ) WHERE length(g) = 3
),
kept AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 50
),
gk AS (SELECT grams.id, grams.g FROM grams JOIN kept USING (g)),
block_cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM gk a JOIN gk b ON a.g = b.g AND a.id < b.id
),
shorts AS (SELECT id, length(text) AS n FROM allr WHERE length(text) < 9),
short_cand AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM shorts a JOIN shorts b
    ON a.id < b.id AND abs(a.n - b.n) <= 2
),
cand AS (
  SELECT id_a, id_b FROM block_cand
  UNION
  SELECT id_a, id_b FROM short_cand
)
SELECT c.id_a, c.id_b,
       CAST(levenshtein(ta.text, tb.text) AS INTEGER) AS edit_distance
FROM cand c
JOIN allr ta ON ta.id = c.id_a
JOIN allr tb ON tb.id = c.id_b
WHERE abs(length(ta.text) - length(tb.text)) <= 2
  AND levenshtein(ta.text, tb.text) <= 2
ORDER BY c.id_a, c.id_b
"""

# As-of with tolerance: "latest within 7 days at or before" — the
# latest-prior row IS the latest-within-tolerance when it qualifies,
# and no row qualifies when it doesn't, so the LEFT JOIN restricted to
# the tolerance window + rank-1 is exactly the operator's
# null-out-stale-match semantics. matched_pts is the freshness probe.
ORACLE_SQL["j5b_asof_tolerance"] = """
WITH views AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
), purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS pts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id, ts, purchase_id, purchase_value, matched_pts FROM (
  SELECT v.user_id, v.event_id, v.ts, p.purchase_id, p.purchase_value,
         p.pts AS matched_pts,
         ROW_NUMBER() OVER (
           PARTITION BY v.event_id
           ORDER BY p.pts DESC NULLS LAST, p.purchase_id DESC NULLS LAST) AS rn
  FROM views v LEFT JOIN purchases p
    ON v.user_id = p.user_id AND p.pts <= v.ts
   AND p.pts >= v.ts - INTERVAL 7 DAY
) t WHERE rn = 1
"""

# IVM join gate: the oracle recomputes the join FROM SCRATCH — the
# operator must make increment == recompute, so the identity's three
# delta terms (and no overlap between them) are what's under test.
ORACLE_SQL["ivm_join_maintenance"] = """
SELECT o.o_orderpriority,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      AS revenue,
  COUNT(*) AS n_rows
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
ORDER BY 1
"""

# RANGE-frame rolling aggregate: epoch-day numeric ordering so both
# engines share identical frame boundaries; DECIMAL sum inside the
# frame, one cast at the edge (the a12/q1 convention).
ORACLE_SQL["w13_rolling_window"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey
    ORDER BY datediff('day', DATE '1990-01-01', o_orderdate)
    RANGE BETWEEN 89 PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS rolling_90d_total,
  COUNT(*) OVER (
    PARTITION BY o_custkey
    ORDER BY datediff('day', DATE '1990-01-01', o_orderdate)
    RANGE BETWEEN 89 PRECEDING AND CURRENT ROW
  ) AS rolling_90d_orders
FROM orders
WHERE o_custkey <= 500
ORDER BY o_custkey, o_orderdate, o_orderkey
"""

# Aggregate-IVM-with-retractions gate: the oracle builds the EFFECTIVE
# final set directly (base minus cancellations, updated rows at the
# uplifted price, plus inserts) and aggregates from scratch — the
# signed counting must land on the identical state. lint: sum-ok
# (decimal sums, one cast at the edge).
ORACLE_SQL["ivm_agg_retraction"] = """
WITH o AS (
  SELECT o_orderkey, o_orderpriority, o_orderdate,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
base AS (SELECT * FROM o WHERE o_orderdate < DATE '1995-01-01'),
final AS (
  SELECT o_orderpriority,
         CASE WHEN price > 300000
              THEN CAST(price * CAST(1.05 AS DECIMAL(3,2)) AS DECIMAL(18,2))
              ELSE price END AS price
  FROM base WHERE o_orderkey % 10 <> 0
  UNION ALL
  SELECT o_orderpriority, price FROM o
  WHERE o_orderdate >= DATE '1995-01-01'
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(price) AS DOUBLE) AS total_price
FROM final
GROUP BY 1
ORDER BY 1
"""

ORACLE_SQL["wap_hidden_partitioning"] = """
-- Twin of the two pruned-read families: pruning is metadata-only and
-- must return exactly what a full scan + the raw predicate returns.
WITH base AS (
  SELECT o_custkey, o_orderdate,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders WHERE o_orderkey <= 20000
)
SELECT 'range' AS part, strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(price) AS DOUBLE) AS sum_price
FROM base
WHERE o_orderdate BETWEEN DATE '1994-01-01' AND DATE '1995-12-31'
GROUP BY 2
UNION ALL
SELECT 'cust370' AS part, strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(price) AS DOUBLE) AS sum_price
FROM base
WHERE o_custkey = 370
GROUP BY 2
ORDER BY part, month
"""

ORACLE_SQL["wap_spec_evolution"] = """
-- Twin of the spec-evolution lifecycle: the final logical content is
-- the 1994-1996 selection with +10 on the merge window (every merge
-- key pre-exists, so the upsert is pure update). 'range' must equal
-- the raw-predicate selection (era-union pruning is metadata-only);
-- 'rewritten' must equal 'all' (migration moves bytes, not content).
WITH base AS (
  SELECT o_orderkey, o_orderdate,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
  WHERE o_orderkey <= 20000
    AND o_orderdate BETWEEN DATE '1994-01-01' AND DATE '1996-12-31'
),
final AS (
  SELECT o_orderdate,
         CASE WHEN o_orderdate BETWEEN DATE '1995-01-10'
                                   AND DATE '1995-02-20'
              THEN CAST(price + 10 AS DECIMAL(18,2))
              ELSE price END AS price
  FROM base
)
SELECT 'all' AS part, strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders, CAST(SUM(price) AS DOUBLE) AS sum_price
FROM final GROUP BY 2
UNION ALL
SELECT 'range' AS part, strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders, CAST(SUM(price) AS DOUBLE) AS sum_price
FROM final
WHERE o_orderdate BETWEEN DATE '1995-01-15' AND DATE '1995-03-31'
GROUP BY 2
UNION ALL
SELECT 'rewritten' AS part, strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders, CAST(SUM(price) AS DOUBLE) AS sum_price
FROM final GROUP BY 2
ORDER BY part, month
"""

ORACLE_SQL["wap_branch_evolved"] = """
-- Twin of the staged-migration lifecycle: the published content is
-- era-0 January-1995 (+5 on the 05..25 merge window), the branch's
-- 1996 slice, and main's disjoint 1998-06 slice (written under the
-- OLD column name — the rename's chain must serve it). 'pruned' must
-- equal the raw-predicate selection across the era boundary.
WITH base AS (
  SELECT o_orderkey, o_orderdate,
         CAST(o_totalprice AS DECIMAL(18,2)) AS amount
  FROM orders
  WHERE o_orderkey <= 12000
    AND (o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
         OR o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
         OR o_orderdate BETWEEN DATE '1998-06-01' AND DATE '1998-06-30')
),
final AS (
  SELECT o_orderdate,
         CASE WHEN o_orderdate BETWEEN DATE '1995-01-05'
                                   AND DATE '1995-01-25'
              THEN CAST(amount + 5 AS DECIMAL(18,2))
              ELSE amount END AS amount
  FROM base
)
SELECT 'all' AS part, strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders, CAST(SUM(amount) AS DOUBLE) AS sum_amount
FROM final GROUP BY 2
UNION ALL
SELECT 'pruned' AS part, strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders, CAST(SUM(amount) AS DOUBLE) AS sum_amount
FROM final
WHERE o_orderdate BETWEEN DATE '1995-01-15' AND DATE '1996-03-31'
GROUP BY 2
ORDER BY part, month
"""

ORACLE_SQL["incremental_dq_battery"] = """
-- Twin of the incremental battery: every check recomputed over the
-- FULL arrived data (orders keys <= 1000 arrived twice — the late
-- duplicate delivery the state-merged duplicate check must catch).
WITH arrived_orders AS (
  SELECT * FROM orders
  UNION ALL
  SELECT * FROM orders WHERE o_orderkey <= 1000
),
checks AS (
  SELECT 'IDQ-001' AS test_id,
         (SELECT COUNT(*) FROM customer
          WHERE c_name IS NULL OR CAST(c_name AS VARCHAR) = '') AS failed_rows
  UNION ALL
  SELECT 'IDQ-002',
         (SELECT COUNT(*) FROM (
            SELECT TRIM(CAST(o_orderkey AS VARCHAR)) AS k
            FROM arrived_orders GROUP BY 1 HAVING COUNT(*) > 1))
  UNION ALL
  SELECT 'IDQ-003',
         (SELECT COUNT(*) FROM (
            SELECT TRIM(CAST(l_orderkey AS VARCHAR)) AS k1,
                   TRIM(CAST(l_linenumber AS VARCHAR)) AS k2
            FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1))
  UNION ALL
  SELECT 'IDQ-004',
         (SELECT COUNT(*) FROM arrived_orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'IDQ-005',
         (SELECT COUNT(*) FROM customer WHERE c_acctbal < 0)
  UNION ALL
  SELECT 'IDQ-006',
         (SELECT COUNT(*) FROM lineitem WHERE l_discount = 0)
  UNION ALL
  SELECT 'IDQ-007',
         (SELECT CAST(
            CASE WHEN AVG(CAST(o_totalprice AS DOUBLE)) < 1.0
                   OR AVG(CAST(o_totalprice AS DOUBLE)) > 1e9
                 THEN 1 ELSE 0 END
          + CASE WHEN MIN(CAST(o_totalprice AS DOUBLE)) < 0.0
                 THEN 1 ELSE 0 END AS BIGINT)
          FROM arrived_orders)
)
SELECT test_id,
       CASE WHEN failed_rows = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
       CAST(failed_rows AS BIGINT) AS failed_rows
FROM checks
ORDER BY test_id
"""

ORACLE_SQL["incremental_dq_dim_delete"] = """
-- Twin of the dim-delete battery: every check recomputed against the
-- FINAL dim (customer minus the %7 DELETE, plus the re-added <= 300
-- slice). A matched row the delete failed to re-orphan, or a
-- re-added key that failed to retro-heal, diverges here.
WITH final_dim AS (
  SELECT c_custkey FROM customer
  WHERE c_custkey % 7 <> 0 OR c_custkey <= 300
),
checks AS (
  SELECT 'IDD-001' AS test_id,
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM final_dim d
                            WHERE d.c_custkey = o.o_custkey)) AS failed_rows
  UNION ALL
  SELECT 'IDD-002',
         (SELECT COUNT(*) FROM (
            SELECT TRIM(CAST(o_orderkey AS VARCHAR)) AS k
            FROM orders GROUP BY 1 HAVING COUNT(*) > 1))
  UNION ALL
  SELECT 'IDD-003',
         (SELECT CAST(CASE WHEN MIN(CAST(o_totalprice AS DOUBLE)) < 0.0
                      THEN 1 ELSE 0 END AS BIGINT)
          FROM orders)
)
SELECT test_id,
       CASE WHEN failed_rows = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
       CAST(failed_rows AS BIGINT) AS failed_rows
FROM checks
ORDER BY test_id
"""

ORACLE_SQL["incremental_dq_cdf"] = """
-- Twin of the change-feed battery: every check recomputed over the
-- FINAL snapshot (keys <= 500 price-negated by the DV merge; all
-- other rows as created/appended). A missed retraction (preimage not
-- subtracted) or a double-folded postimage diverges here.
WITH final AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey <= 500 THEN -CAST(o_totalprice AS DOUBLE)
              ELSE CAST(o_totalprice AS DOUBLE) END AS price
  FROM orders
),
checks AS (
  SELECT 'CDQ-001' AS test_id,
         (SELECT COUNT(*) FROM final WHERE price < 0) AS failed_rows
  UNION ALL
  SELECT 'CDQ-002',
         (SELECT COUNT(*) FROM (
            SELECT TRIM(CAST(o_orderkey AS VARCHAR)) AS k
            FROM final GROUP BY 1 HAVING COUNT(*) > 1))
  UNION ALL
  SELECT 'CDQ-003',
         (SELECT COUNT(*) FROM final o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'CDQ-004',
         (SELECT CAST(CASE WHEN AVG(price) < -1e9 OR AVG(price) > 1e9
                      THEN 1 ELSE 0 END AS BIGINT)
          FROM final)
)
SELECT test_id,
       CASE WHEN failed_rows = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
       CAST(failed_rows AS BIGINT) AS failed_rows
FROM checks
ORDER BY test_id
"""

ORACLE_SQL["incremental_dq_minmax_restore"] = """
-- Twin of the min/max restore battery: the sentinels (keys 1000001/
-- 1000002, prices -1e6 / 9e7) were created then DV-deleted, so the
-- FINAL snapshot is exactly orders keys <= 30000 — a battery still
-- holding the ever-seen extremes would report 3 violated bounds
-- (min, max, and the mean the sentinels dragged) instead of
-- recomputing PASS from the survivors.
WITH final AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS p
  FROM orders WHERE o_orderkey <= 30000
),
checks AS (
  SELECT 'MDQ-001' AS test_id,
         (SELECT CAST(
            (CASE WHEN AVG(p) < 0 OR AVG(p) > 1000000 THEN 1 ELSE 0 END)
          + (CASE WHEN MIN(p) < 0 THEN 1 ELSE 0 END)
          + (CASE WHEN MAX(p) > 1000000 THEN 1 ELSE 0 END) AS BIGINT)
          FROM final) AS failed_rows
  UNION ALL
  SELECT 'MDQ-002',
         (SELECT COUNT(*) FROM final WHERE p < 0)
)
SELECT test_id,
       CASE WHEN failed_rows = 0 THEN 'PASS' ELSE 'FAIL' END AS status,
       CAST(failed_rows AS BIGINT) AS failed_rows
FROM checks
ORDER BY test_id
"""

ORACLE_SQL["incremental_dq_approx_retract"] = """
-- Twin of the retractable approx-duplicate screen: every key <= 30000
-- was duplicated (copy slab) then the slab was DV-deleted. Pre-phase:
-- the exact duplicate-row count (= |keys|) dwarfs the tolerance (50)
-- plus any linear-counting noise, so the STATUS is deterministic even
-- though the sketch's magnitude is not (reported NULL). Post-phase:
-- the slab's deletes returned every bucket counter to base occupancy,
-- so the verdict is exactly PASS/0 — the claim under test is that the
-- sketch SHRANK (the HLL variant cannot).
WITH k AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey <= 30000
),
phases AS (
  SELECT 'pre' AS phase, 'ADQ-001' AS test_id,
         CASE WHEN (SELECT COUNT(*) FROM k) > 50
              THEN 'FAIL' ELSE 'PASS' END AS status,
         CAST(NULL AS BIGINT) AS failed_rows
  UNION ALL
  SELECT 'post', 'ADQ-001', 'PASS', CAST(0 AS BIGINT)
)
SELECT phase, test_id, status, failed_rows
FROM phases
ORDER BY phase, test_id
"""

ORACLE_SQL["wap_update_dv"] = """
-- Twin of the DV-update lifecycle: delete %9, then +10 on 50-150,
-- then the %13 partition-move — in order (a %13 key in 50-150 moves
-- WITH its +10 balance). A resurrected delete, a lost update, or a
-- row left behind by the move diverges here.
WITH base AS (
  SELECT c_custkey, c_mktsegment,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer
  WHERE c_custkey <= 250 AND c_custkey % 9 <> 0
),
bumped AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 13 = 0 THEN 'MOVED'
              ELSE c_mktsegment END AS c_mktsegment,
         CASE WHEN c_custkey BETWEEN 50 AND 150
              THEN CAST(bal + 10 AS DECIMAL(18,2))
              ELSE bal END AS bal
  FROM base
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(bal) AS DOUBLE) AS sum_bal
FROM bumped
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLE_SQL["wap_rename_column"] = """
-- Twin of the rename lifecycle: base (≤200, pre-rename files) plus
-- the appended family (200-260, new physical name), with +25 applied
-- to the merge window (100-230, spanning the rename seam). A NULLed
-- pre-rename column or a missed cross-seam match diverges here.
WITH base AS (
  SELECT c_custkey, c_mktsegment,
         CAST(c_acctbal AS DECIMAL(18,2)) AS balance
  FROM customer WHERE c_custkey <= 260
),
final AS (
  SELECT c_mktsegment,
         CASE WHEN c_custkey > 100 AND c_custkey <= 230
              THEN CAST(balance + 25 AS DECIMAL(18,2))
              ELSE balance END AS balance
  FROM base
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(balance) AS DOUBLE) AS sum_balance
FROM final
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLE_SQL["wap_table_stats"] = """
-- Twin of the metadata-reconstructed statistics: ANALYZE's commit-log
-- stats must equal what the data actually says.
WITH base AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer WHERE c_custkey <= 600
)
SELECT 'c_custkey' AS col_name, COUNT(*) AS row_count,
       COUNT(*) - COUNT(c_custkey) AS null_count,
       CAST(MIN(c_custkey) AS DOUBLE) AS min_num,
       CAST(MAX(c_custkey) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM base
UNION ALL
SELECT 'bal', COUNT(*), COUNT(*) - COUNT(bal),
       CAST(MIN(bal) AS DOUBLE), CAST(MAX(bal) AS DOUBLE),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
FROM base
UNION ALL
SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       MIN(c_mktsegment), MAX(c_mktsegment)
FROM base
ORDER BY col_name
"""

ORACLE_SQL["wap_insert_sql"] = """
-- Twin of the INSERT-text gate: base family, the INSERT..SELECT
-- family (status NULL-fills - not listed), and the two VALUES rows.
SELECT c_custkey, c_mktsegment,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
       'base' AS status
FROM customer WHERE c_custkey <= 150
UNION ALL
SELECT c_custkey, c_mktsegment,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
       CAST(NULL AS VARCHAR) AS status
FROM customer WHERE c_custkey > 150 AND c_custkey <= 200
UNION ALL
SELECT 900001, 'MACHINERY', CAST(11.50 AS DOUBLE), 'manual'
UNION ALL
SELECT 900002, 'BUILDING', CAST(-2.25 AS DOUBLE), 'manual'
ORDER BY c_custkey
"""

ORACLE_SQL["wap_branch_publish"] = """
-- Twin of the published state: branch mutations (bucket 0: +50 on
-- (100,140], minus the %14 deletes) AND main's disjoint progress
-- (bucket 1: -10 on (200,220]) must BOTH land - the rebase's
-- correctness IS this hash.
WITH base AS (
  SELECT c_custkey, c_custkey % 2 AS bucket,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer WHERE c_custkey <= 220
)
SELECT c_custkey, bucket,
       CAST(CASE
         WHEN bucket = 1 AND c_custkey > 200 AND c_custkey <= 220
           THEN CAST(bal - 10 AS DECIMAL(18,2))
         WHEN bucket = 0 AND c_custkey > 100 AND c_custkey <= 140
           THEN CAST(bal + 50 AS DECIMAL(18,2))
         ELSE bal
       END AS DOUBLE) AS bal
FROM base
WHERE NOT (bucket = 0 AND c_custkey % 7 = 0)
ORDER BY c_custkey
"""

ORACLE_SQL["wap_schema_widen"] = """
-- Twin of the widened table: narrow-era rows coerced to the wide
-- committed schema plus the one row only the wide types can hold.
SELECT CAST(c_custkey AS BIGINT) AS custkey, c_mktsegment,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal
FROM customer WHERE c_custkey <= 300
UNION ALL
SELECT CAST(1099511627776 AS BIGINT), 'MACHINERY',
       CAST(123456789.12 AS DOUBLE)
ORDER BY custkey
"""

ORACLE_SQL["wap_manifest_roundtrip"] = """
-- Twin of the manifest-consumed snapshot: the post-delete selection.
-- A manifest missing a live file or leaking a superseded one
-- diverges here immediately.
SELECT p_brand,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM part
WHERE p_partkey <= 1000 AND p_partkey % 3 <> 0
GROUP BY p_brand
ORDER BY p_brand
"""
