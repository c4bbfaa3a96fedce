-- Period-scoped order base with dimension context: the $REPORT_*
-- session vars render client-side like the reference's templated
-- report SQL (S3), and the date predicates push to the orders scan.
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
       n.n_name AS nation_name, r.r_name AS region_name
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= CAST($REPORT_START_DT AS DATE)
  AND o.o_orderdate <  CAST($REPORT_END_DT AS DATE)
