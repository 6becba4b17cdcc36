"""Wire-format analysis utility (analyze_f1_data.py:8-80 parity, S3/W1):
per-topic line counts and the first N sample payloads per topic — the
fixture-discovery tool, expressed as two small Catalyst plans instead of a
driver-side loop (so it works on a 100 TB bronze archive, not just a local
file)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from f1_data_pipeline_spark.ingest.bronze import read_bronze


def topic_counts(bronze: DataFrame) -> DataFrame:
    """Lines per topic (corrupt lines under topic NULL)."""
    return bronze.groupBy("topic").agg(F.count("*").alias("n")).orderBy("topic")


def topic_samples(bronze: DataFrame, n: int = 3, payload_chars: int = 120) -> DataFrame:
    """First ``n`` lines per topic in arrival order (W1 per-group limit —
    WindowGroupLimit prunes to n rows per topic before any shuffle)."""
    w = Window.partitionBy("topic").orderBy("ordinal")
    return (
        bronze.where(F.col("topic").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .select(
            "topic",
            "ordinal",
            F.substring("payload", 1, payload_chars).alias("sample"),
        )
        .orderBy("topic", "ordinal")
    )


def analyze_wire(
    spark: SparkSession, path: str, samples_per_topic: int = 3
) -> tuple[DataFrame, DataFrame]:
    bronze = read_bronze(spark, path)
    return topic_counts(bronze), topic_samples(bronze, samples_per_topic)
