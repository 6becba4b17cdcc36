from f1_data_pipeline_spark.ingest.bronze import read_bronze, read_bronze_stream
from f1_data_pipeline_spark.ingest.decode import build_silver

__all__ = ["read_bronze", "read_bronze_stream", "build_silver"]
