-- Incremental source extract with a batch-arrival cutoff (simulates
-- "what the source system contains as of this run") and the
-- {{AND_CONDITION}} marker where the engine injects the high-water-mark
-- predicate on later runs (reference connector:425-453).
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate <= DATE '{{BATCH_CUTOFF}}' {{AND_CONDITION}}
