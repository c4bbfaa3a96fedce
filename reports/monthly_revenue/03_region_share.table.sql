-- Share-of-month via a DECIMAL window sum (exact under any partition
-- order) with one final double division — the cross-engine
-- determinism convention for windowed ratios.
SELECT `Month` AS month,
       `Region` AS region_name,
       `Order Count` AS n_orders,
       `Revenue` AS revenue,
       CAST(CAST(`Revenue` AS DECIMAL(18,2)) AS DOUBLE)
         / CAST(SUM(CAST(`Revenue` AS DECIMAL(18,2))) OVER (PARTITION BY `Month`)
                AS DOUBLE) AS region_share
FROM monthly_revenue
ORDER BY month, region_name
