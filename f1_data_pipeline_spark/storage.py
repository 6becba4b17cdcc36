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

from pyspark.sql import DataFrame, SparkSession
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


def dataset_exists(spark: SparkSession, path: str) -> bool:
    """URI-capable existence probe through the Hadoop FileSystem API:
    ``os.path.exists`` only sees the local filesystem, so index/existence
    checks that must also work on ``hdfs://``/``s3a://`` paths go through
    the path's own FileSystem (resolved from the Hadoop conf, same as
    every Spark reader/writer)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def write_json_artifact(spark: SparkSession, path: str, obj) -> None:
    """Persist a small (KB-scale) model artifact — codebooks, centroids,
    fitted stats — as a ONE-ROW parquet dataset at ``path``.

    Why not ``open(path, "w")``: a bare ``open`` binds the artifact to the
    driver's local filesystem, so an index written to ``s3a://…`` loses
    its metadata (deployment-breaking at cluster scale). Spark's own
    writer speaks every configured filesystem, commits atomically via
    ``_SUCCESS``, and an underscore-prefixed ``path`` is invisible to
    readers of the parent dataset directory (FileInputFormat hidden-file
    convention) — the artifact can live INSIDE the index it describes."""
    import json

    spark.createDataFrame([(json.dumps(obj),)], "json string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def read_json_artifact(spark: SparkSession, path: str):
    """Read back a ``write_json_artifact`` payload from any URI."""
    import json

    row = spark.read.parquet(path).head()
    if row is None:
        raise ValueError(
            f"empty model artifact at {path} — the dataset exists but holds "
            f"no row (interrupted write?); rebuild the artifact"
        )
    return json.loads(row["json"])


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


# Staged-swap suffixes shared by every rewrite-in-place sink (compact,
# upsert_parquet). A dataset at ``base`` is only ever replaced by: write the
# replacement to ``base__swap_tmp``, verify ``_SUCCESS``, rename the original
# aside to ``base__swap_old``, rename tmp into place, drop old. Both renames
# are same-directory, hence atomic on POSIX.
SWAP_TMP_SUFFIX = "__swap_tmp"
SWAP_OLD_SUFFIX = "__swap_old"


def recover_swap(path: str) -> bool:
    """Recover from a crash inside a staged swap's rename window.

    If ``path`` is missing but ``path__swap_old`` exists, a previous swap
    died between rename(base→old) and rename(tmp→base): restore the
    original with one rename. Returns True when a recovery happened. Every
    staged-swap entry point calls this first, so the crash window
    self-heals on the next operation instead of failing on a missing path.
    """
    old = path.rstrip("/") + SWAP_OLD_SUFFIX
    if not os.path.exists(path) and os.path.isdir(old):
        os.rename(old, path)
        return True
    return False


def staged_swap(base: str, tmp: str) -> None:
    """Install the staged dataset at ``tmp`` as ``base`` crash-safely.

    Verifies the stage is complete (``_SUCCESS``), then renames the original
    aside and the stage into place. A crash at ANY point leaves either the
    original (stage incomplete / first rename not reached, or rollback), or
    the new table installed — never neither; the one window where ``base``
    is momentarily absent is healed by ``recover_swap`` on the next call.

    Single-writer assumption: concurrent writers to the same path are not
    coordinated (that is a lakehouse transaction log's job — Delta/Iceberg
    snapshot commit replaces this helper at 100 TB); a concurrent READER can
    observe the brief missing-path window during the two renames.
    """
    if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
        raise RuntimeError(f"staged dataset at {tmp} missing _SUCCESS marker")
    old = base + SWAP_OLD_SUFFIX
    shutil.rmtree(old, ignore_errors=True)  # stale leftover from a crash
    if os.path.exists(base):
        os.rename(base, old)
    try:
        os.rename(tmp, base)
    except Exception:
        if os.path.isdir(old):
            os.rename(old, base)  # roll back: restore the original
        raise
    shutil.rmtree(old, ignore_errors=True)


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
    run per-partition (compact the day that closed, not the table).
    Crash-safe via ``staged_swap``; single-writer (see staged_swap)."""
    import glob
    import math

    base = path.rstrip("/")
    recover_swap(base)  # heal a swap interrupted by a previous crash
    files = [f for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)]
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = base + SWAP_TMP_SUFFIX
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    staged_swap(base, tmp)
    return n


def repartition_for(df: DataFrame, keys: list[str], partitions: int | None = None) -> DataFrame:
    """Pre-partition once, reuse across several keyed operations — the
    'reuse a partitioning across stages' rule: groupBy/join on the same keys
    afterwards reuse this exchange instead of re-shuffling."""
    return df.repartition(partitions, *[F.col(k) for k in keys]) if partitions else df.repartition(*[F.col(k) for k in keys])


# ---------------------------------------------------------------------------
# Snapshot tables: versioned parquet + immutable commit log (time travel)
# ---------------------------------------------------------------------------
#
# The minimal lakehouse commit protocol (the shape Delta/Iceberg formalize):
# every write lands in an immutable ``v=N`` directory, and a commit is the
# ATOMIC creation of an immutable per-version record ``_manifests/N.json``
# (create-no-overwrite — no mutable pointer, no rename, which is exactly
# what object stores without atomic rename need; Delta's _delta_log uses
# the same shape). A crashed writer can never expose a half-written table,
# concurrent readers always see a complete snapshot, and old versions stay
# readable until vacuumed. Every filesystem touch goes through the Hadoop
# FileSystem API resolved from the path itself, so a table dir may be
# ``file:``/``hdfs://``/``s3a://`` — never the driver's local os module.
# Caveat inherited from the substrate: create-no-overwrite is atomic on
# HDFS/POSIX; on S3 proper single-writer discipline (or a commit service)
# is still required, as with every log-structured table format.

SNAPSHOT_MANIFEST_DIR = "_manifests"


def _snap_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _snap_path(jvm, *parts: str):
    return jvm.org.apache.hadoop.fs.Path("/".join(x.rstrip("/") for x in parts))


def snapshot_version(spark: SparkSession, table_dir: str) -> int:
    """Current committed version (0 = no commit yet): the max N among the
    immutable ``_manifests/N.json`` commit records."""
    fs, jvm = _snap_fs(spark, table_dir)
    mdir = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR)
    if not fs.exists(mdir):
        return 0
    versions = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.endswith(".json") and name[:-5].isdigit():
            versions.append(int(name[:-5]))
    return max(versions, default=0)


def snapshot_write(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as the next table version and return it.

    Protocol: (1) CLAIM the staging dir ``v=N`` by atomically creating
    ``v=N/_CLAIM`` (``createNewFile`` — create-no-overwrite); (2) write
    parquet into the claimed dir (append mode, so the claim marker
    survives) and verify ``_SUCCESS``; (3) COMMIT by atomically creating
    the immutable record ``_manifests/N.json``. Readers only follow
    committed records, so a crash at any point before (3) leaves an
    orphan stage readers never saw.

    Single-writer protocol, cheaply ENFORCED (optimistic concurrency):
    a writer refuses to stage if ``v=N+1`` already exists — two writers
    that both read version N cannot both stage into the same directory
    (one fails fast instead of them overwriting each other mid-write);
    the ones that tie on the exists-check are broken by the atomic _CLAIM
    create, and the ones that somehow both stage are broken by the atomic
    commit create. A leftover dir from a CRASHED writer also trips the
    guard; the remedy is stated in the error (delete the orphan — the
    missing commit record proves it was never committed). True
    multi-writer commit needs a coordination service (what Delta's commit
    coordinator provides), exactly as for any log-structured format."""
    import json

    spark = df.sparkSession
    fs, jvm = _snap_fs(spark, table_dir)
    version = snapshot_version(spark, table_dir) + 1
    vdir = f"{table_dir.rstrip('/')}/v={version}"
    vpath = _snap_path(jvm, vdir)
    if fs.exists(vpath):
        raise RuntimeError(
            f"snapshot_write: staging dir v={version} already exists under "
            f"{table_dir} — either a concurrent writer is staging version "
            f"{version} (snapshot tables are single-writer) or a crashed "
            f"writer left an orphan; if _manifests/{version}.json is "
            f"absent, the orphan was never committed and is safe to delete"
        )
    if not fs.createNewFile(_snap_path(jvm, vdir, "_CLAIM")):
        raise RuntimeError(
            f"snapshot_write: lost the staging race for v={version} under "
            f"{table_dir} (snapshot tables are single-writer)"
        )
    # append, not overwrite: overwrite would delete the dir and with it the
    # _CLAIM marker that holds the stage against concurrent writers
    df.write.mode("append").parquet(vdir)
    if not fs.exists(_snap_path(jvm, vdir, "_SUCCESS")):
        raise RuntimeError(f"snapshot stage at {vdir} missing _SUCCESS marker")
    record = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{version}.json")
    try:
        out = fs.create(record, False)  # create-no-overwrite: THE commit
    except Exception as e:
        raise RuntimeError(
            f"snapshot_write: commit record for v={version} already exists "
            f"under {table_dir} — a concurrent writer committed first "
            f"(snapshot tables are single-writer)"
        ) from e
    try:
        out.write(bytearray(json.dumps({"version": version, "dir": f"v={version}"}).encode()))
    finally:
        out.close()
    return version


def snapshot_read(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the latest committed snapshot, or time-travel to ``version``."""
    fs, jvm = _snap_fs(spark, table_dir)
    v = version if version is not None else snapshot_version(spark, table_dir)
    if v < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    if not fs.exists(_snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{v}.json")):
        raise FileNotFoundError(f"snapshot version {v} was never committed in {table_dir}")
    vdir = f"{table_dir.rstrip('/')}/v={v}"
    if not fs.exists(_snap_path(jvm, vdir, "_SUCCESS")):
        raise FileNotFoundError(f"snapshot version {v} not found in {table_dir}")
    return spark.read.parquet(vdir)


def snapshot_vacuum(spark: SparkSession, table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete snapshot data dirs older than the newest ``keep_last``;
    returns the versions removed. Commit records are KEPT (they are the
    table history, like Delta's log) — time travel to a vacuumed version
    raises FileNotFoundError because its data is gone, while the current
    version can never be deleted: ``keep_last`` is clamped to >= 1."""
    import re

    fs, jvm = _snap_fs(spark, table_dir)
    keep_last = max(1, keep_last)
    current = snapshot_version(spark, table_dir)
    removed = []
    for st in fs.listStatus(_snap_path(jvm, table_dir)):
        m = re.fullmatch(r"v=(\d+)", st.getPath().getName())
        if not m:
            continue
        v = int(m.group(1))
        if v <= current - keep_last:
            fs.delete(st.getPath(), True)
            removed.append(v)
    return sorted(removed)


def snapshot_compact(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Lakehouse-native small-files compaction: rewrite the CURRENT
    snapshot into ceil(total_bytes/target) files committed as a NEW
    version — the versioned twin of ``compact``. No rename window at
    all: readers of version N are untouched while N+1 stages, the commit
    is the same atomic record create as any write, and the bloated
    version remains time-travelable until ``snapshot_vacuum`` reclaims
    it. URI-capable end-to-end (sizes via the Hadoop FS ContentSummary,
    not os.path). Returns (new_version, file_count)."""
    import math

    fs, jvm = _snap_fs(spark, table_dir)
    v = snapshot_version(spark, table_dir)
    if v < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    vdir = f"{table_dir.rstrip('/')}/v={v}"
    total = fs.getContentSummary(_snap_path(jvm, vdir)).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(vdir).repartition(n)
    return snapshot_write(df, table_dir), n
