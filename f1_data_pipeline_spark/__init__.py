"""f1_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (``ftenorioinkluziva/f1_data_pipeline``,
surveyed in SURVEY.md): bronze text-line ingest, per-topic decode/flatten to
typed silver tables, a full relational query surface (SURVEY §2.12), and
scale-out extension operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB-class clusters.

Everything is declarative DataFrame/SQL so Catalyst + Tungsten own the
physical plan; Python UDFs appear only where no builtin exists (raw-deflate
inflate, Python-literal line parse) and are Arrow-vectorized.
"""

from f1_data_pipeline_spark.session import ensure_session_confs, get_spark


def load_tables(spark, sf_dir=None):
    from f1_data_pipeline_spark.catalog import load_tables as _lt

    return _lt(spark, sf_dir)


def open_sql(spark, sf_dir=None):
    from f1_data_pipeline_spark.sql import open_sql as _os

    return _os(spark, sf_dir)


def all_queries():
    from f1_data_pipeline_spark.queries import all_queries as _aq

    return _aq()


__all__ = ["get_spark", "ensure_session_confs", "load_tables", "open_sql", "all_queries"]
__version__ = "0.1.0"
