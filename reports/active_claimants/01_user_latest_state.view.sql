-- Latest event per user at the report cutoff (W1 dedup-latest + P4
-- point-in-time), the universal CTE prologue of the reference's
-- reports (…detail.sql:26-33). $REPORT_END_DT renders client-side.
SELECT user_id, event_id, event_type, ts, value
FROM (
  SELECT e.*,
         ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events e
  WHERE ts <= CAST($REPORT_END_DT AS TIMESTAMP)
) t
WHERE rn = 1
