-- Month-grain rollup with the engine's decimal-exact SUM convention.
SELECT date_format(date_trunc('MONTH', o_orderdate), 'yyyy-MM') AS `Month`,
       region_name AS `Region`,
       COUNT(*) AS `Order Count`,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS `Revenue`
FROM orders_in_period
GROUP BY date_format(date_trunc('MONTH', o_orderdate), 'yyyy-MM'), region_name
