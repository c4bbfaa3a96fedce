-- Summary: claimant counts and value sums by region × event type,
-- the companion rollup of the reference's report pair
-- (new_rfb_and_total_claimants_active.py:47-67).
SELECT
  `Region`                               AS region_name,
  `Last Event Type`                      AS event_type,
  COUNT(*)                               AS n_claimants,
  CAST(SUM(`Active Purchaser Flag`) AS BIGINT) AS n_purchasers,
  CAST(SUM(CAST(`Last Event Value` AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM claimant_detail
GROUP BY `Region`, `Last Event Type`
ORDER BY region_name, event_type
