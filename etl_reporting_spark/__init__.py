"""etl_reporting_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference batch ETL + reporting framework
(``s685/etl-reporting``): CDC dedup-latest semantics, point-in-time /
as-of joins, SCD2 interval derivation, report aggregation with
subtotal rollups, MERGE upsert, a data-quality check vocabulary, and
report export writers — plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB-class partitioned execution.

Everything is declarative DataFrame / Spark SQL so Catalyst + AQE own
physical planning (predicate pushdown, column pruning, broadcast vs
shuffle joins, skew handling). Python touches data only behind
Arrow-batched Pandas UDFs, never row-at-a-time.
"""

from etl_reporting_spark.session import get_spark, stop_spark
from etl_reporting_spark.io import Engine, WriteMode, TableType

__all__ = ["get_spark", "stop_spark", "Engine", "WriteMode", "TableType"]

__version__ = "0.1.0"
