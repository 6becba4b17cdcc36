"""SparkSession factory with scale-oriented defaults.

Config rationale (SURVEY §7.1 step 1):

- AQE on: runtime re-planning (skew-join splitting, dynamic coalescing of
  shuffle partitions) is the single biggest lever when the same code must run
  at sf0.001 locally and at 100 TB on a 1000-executor cluster.
- Arrow on: every pandas UDF / ``applyInPandas``/``mapInPandas`` crossing is
  Arrow-batched instead of pickled row-at-a-time.
- Session timezone pinned to UTC: the reference mixes tz-aware and tz-naive
  timestamps (SURVEY §7.4); we normalize to UTC instants internally and this
  also keeps the DuckDB oracle comparison deterministic.
- ``shuffle.partitions`` defaults to the local core count; on a real cluster
  AQE coalesces from a deliberately-high initial number, so we set the
  *initial* number high and let AQE shrink it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs the engine's semantics depend on,
    for sessions built by someone else (the driver, a notebook): UTC
    timestamps and nanos-parquet reading. Safe to call repeatedly."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static in some deployments; catalog handles both shapes
    return spark


def get_spark(
    app_name: str = "f1_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when running outside a
    cluster; on a real deployment the cluster manager supplies it and this
    argument is left ``None``.
    """
    cpus = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # nested-schema pruning so from_json/struct projections prune at scan
        # (SURVEY §4: reference hand-prunes telemetry channels; Catalyst does it
        # for us when this is on)
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # parquet pushdown is on by default; make the intent explicit
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet stores ts as TIMESTAMP(NANOS) which Spark
        # cannot read natively; read as long and convert in the catalog
        # (micros truncation — same as DuckDB's ns→µs behavior).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # managed-table root for bucketed tables (static conf — must be set
        # before the session exists)
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
