from etl_reporting_spark.plans.queries import QUERIES
from etl_reporting_spark.plans.oracles import ORACLE_SQL

__all__ = ["QUERIES", "ORACLE_SQL"]
