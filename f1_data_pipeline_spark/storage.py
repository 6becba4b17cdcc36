"""Physical-layout helpers for the 100 TB path: bucketing (co-located,
shuffle-free joins/aggregations) and salting (hot-key skew).

The reference has no layout story (single Postgres). At cluster scale the
two questions that dominate join cost are "is the shuffle necessary?"
(bucketing removes it for stable keys) and "does one key overwhelm one
task?" (salting + AQE skew-join split). Both are provided as plain
DataFrame helpers so pipelines opt in per table/join.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (+ sorted) managed table.

    Two tables bucketed the same way join with NO exchange and NO sort —
    at 100 TB this turns the nightly fact⋈fact join from the dominant
    shuffle into a zip of pre-sorted buckets (asserted in
    tests/test_storage.py by inspecting the physical plan).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previously-failed write can leave an orphaned managed location that
    # blocks re-creation — clear it (local-fs path; object stores use the
    # catalog's purge)
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:") :]
    loc = os.path.join(wh, table.lower())
    if wh and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)

    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys: the left (large, skewed) side gets a
    deterministic salt derived from its full row hash, the right side is
    replicated ``num_salts``× — so one hot key spreads over ``num_salts``
    tasks instead of melting one.

    Deterministic (hash-based, not rand()) so retries/speculative tasks
    agree. AQE's skew-join split handles moderate skew automatically; this
    is for the pathological key that exceeds a single executor even after
    AQE splits. Result is exactly the plain join's rows.
    """
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Hive-style partitioned parquet layout (e.g. silver tables by date):
    queries filtering on the partition column scan ONLY matching
    directories — `PartitionFilters` in the plan, zero I/O for pruned
    partitions. The 100 TB default for every time-keyed silver/gold table
    (asserted in tests/test_storage.py)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def compact(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ceil(total_bytes / target) files.

    Streaming sinks (and the reference's per-batch appends) accrete many
    tiny files; at 100 TB that inflates scan task counts and NameNode/
    listing pressure. Returns the new file count. For partitioned layouts
    run per-partition (compact the day that closed, not the table)."""
    import glob
    import math
    import os as _os

    files = [f for f in glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)]
    total = sum(_os.path.getsize(f) for f in files)
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    base = path.rstrip("/")
    tmp = base + "__compact_tmp"
    old = base + "__compact_old"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    # verify the staged copy is complete before touching the original
    if not _os.path.exists(_os.path.join(tmp, "_SUCCESS")):
        raise RuntimeError(f"staged compaction at {tmp} missing _SUCCESS marker")
    # swap via two renames so the original is never deleted before the
    # replacement is in place: a crash leaves either the original (step 1
    # not reached), or the staged copy installed with the original intact
    # under __compact_old (recoverable). Both renames are same-directory,
    # hence atomic on POSIX. Lakehouse tables use a transactional commit
    # (Delta/Iceberg snapshot swap) instead.
    import shutil as _shutil

    _shutil.rmtree(old, ignore_errors=True)  # stale leftover from a crash
    _os.rename(base, old)
    try:
        _os.rename(tmp, base)
    except Exception:
        _os.rename(old, base)  # roll back: restore the original
        raise
    _shutil.rmtree(old)
    return n


def repartition_for(df: DataFrame, keys: list[str], partitions: int | None = None) -> DataFrame:
    """Pre-partition once, reuse across several keyed operations — the
    'reuse a partitioning across stages' rule: groupBy/join on the same keys
    afterwards reuse this exchange instead of re-shuffling."""
    return df.repartition(partitions, *[F.col(k) for k in keys]) if partitions else df.repartition(*[F.col(k) for k in keys])
