"""SQL entry point (SURVEY §7.1 step 6): register the catalog as temp views
and run ANSI SQL via spark.sql.

The corpus oracles in queries.py are written in ANSI SQL precisely so the
same strings run on BOTH engines: DuckDB (the correctness oracle) and Spark
SQL (the user-facing surface). tests/test_sql_surface.py executes every
ANSI-dialect oracle through ``run_sql`` and asserts it matches the
DataFrame-API plan's results — users can bring their SQL as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from f1_data_pipeline_spark.catalog import load_tables


class SqlSession:
    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.tables = load_tables(spark, sf_dir)
        self.tables.register_views()

    def run(self, sql: str) -> DataFrame:
        return self.spark.sql(sql)


def open_sql(spark: SparkSession, sf_dir: str | None = None) -> SqlSession:
    return SqlSession(spark, sf_dir)
