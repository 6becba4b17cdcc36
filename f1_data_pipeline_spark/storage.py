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
# Snapshot tables: versioned parquet + atomic manifest pointer (time travel)
# ---------------------------------------------------------------------------
#
# The minimal lakehouse commit protocol (the shape Delta/Iceberg formalize):
# every write lands in an immutable ``v=N`` directory, and readers follow a
# one-line manifest that is REPLACED atomically — so a crashed writer can
# never expose a half-written table, concurrent readers always see a
# complete snapshot, and old versions stay readable until vacuumed. At
# cluster scale the same layout works on any Hadoop filesystem; the rename
# on object stores without atomic rename should go through a commit service
# (as Delta does) — documented, not hidden.

SNAPSHOT_MANIFEST = "_MANIFEST.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, SNAPSHOT_MANIFEST)


def snapshot_version(table_dir: str) -> int:
    """Current committed version (0 = no commit yet)."""
    import json

    try:
        with open(_manifest_path(table_dir)) as f:
            return int(json.load(f)["version"])
    except FileNotFoundError:
        return 0


def snapshot_write(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as the next table version and return it.

    Write order is the whole protocol: (1) parquet lands in ``v=N`` and is
    verified complete via ``_SUCCESS``; (2) the manifest is written beside
    it to a temp name and renamed over the old one (atomic on POSIX/HDFS).
    A crash before (2) leaves an orphan ``v=N`` dir readers never saw.

    Single-writer protocol, cheaply ENFORCED (optimistic concurrency):
    staging refuses to start if ``v=N+1`` already exists — two writers
    that both read version N cannot both stage into the same directory
    (one fails fast instead of them overwriting each other mid-write with
    last-manifest-wins over possibly mixed files). A leftover dir from a
    CRASHED writer also trips this; the remedy is stated in the error
    (delete the orphan — the manifest proves it was never committed).
    True multi-writer commit needs a coordination service (what Delta's
    commit coordinator provides); this protocol is explicitly
    single-writer, like a plain Hive table."""
    import json

    os.makedirs(table_dir, exist_ok=True)
    version = snapshot_version(table_dir) + 1
    vdir = os.path.join(table_dir, f"v={version}")
    try:
        # atomic claim: exists-check-then-write would let two writers that
        # both read version N pass the check before either created the dir
        os.makedirs(vdir)
    except FileExistsError:
        raise RuntimeError(
            f"snapshot_write: staging dir {vdir} already exists — either a "
            f"concurrent writer is staging version {version} (snapshot "
            f"tables are single-writer) or a crashed writer left an orphan; "
            f"if the manifest still points at v={version - 1}, the orphan "
            f"was never committed and is safe to delete"
        ) from None
    df.write.mode("overwrite").parquet(vdir)
    if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
        raise RuntimeError(f"snapshot stage at {vdir} missing _SUCCESS marker")
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "dir": f"v={version}"}, f)
    os.replace(tmp, _manifest_path(table_dir))
    return version


def snapshot_read(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the latest committed snapshot, or time-travel to ``version``."""
    v = version if version is not None else snapshot_version(table_dir)
    if v < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    vdir = os.path.join(table_dir, f"v={v}")
    if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
        raise FileNotFoundError(f"snapshot version {v} not found in {table_dir}")
    return spark.read.parquet(vdir)


def snapshot_vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete snapshot versions older than the newest ``keep_last``;
    returns the versions removed. Never touches the committed version:
    ``keep_last`` is clamped to >= 1, so even ``keep_last=0`` cannot
    delete what the manifest points at."""
    import re

    keep_last = max(1, keep_last)
    current = snapshot_version(table_dir)
    removed = []
    for name in sorted(os.listdir(table_dir)):
        m = re.fullmatch(r"v=(\d+)", name)
        if not m:
            continue
        v = int(m.group(1))
        if v <= current - keep_last:
            shutil.rmtree(os.path.join(table_dir, name))
            removed.append(v)
    return removed
