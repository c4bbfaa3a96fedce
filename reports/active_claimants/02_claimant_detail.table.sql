-- Detail rows: active claimants with dimension context and the
-- reference's presentation conventions — quoted mixed-case aliases
-- and MM/dd/yyyy formatted dates (…detail.sql:258-293).
SELECT
  c.c_custkey                       AS `Customer Key`,
  c.c_name                          AS `Customer Name`,
  c.c_mktsegment                    AS `Market Segment`,
  n.n_name                          AS `Nation`,
  r.r_name                          AS `Region`,
  u.event_type                      AS `Last Event Type`,
  date_format(u.ts, 'MM/dd/yyyy')   AS `Last Event Date`,
  u.value                           AS `Last Event Value`,
  CASE WHEN u.event_type = 'purchase' THEN 1 ELSE 0 END AS `Active Purchaser Flag`
FROM user_latest_state u
JOIN customer c ON u.user_id = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
