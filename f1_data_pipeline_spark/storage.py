"""Physical-layout helpers for the 100 TB path: bucketing (co-located,
shuffle-free joins/aggregations) and salting (hot-key skew).

The reference has no layout story (single Postgres). At cluster scale the
two questions that dominate join cost are "is the shuffle necessary?"
(bucketing removes it for stable keys) and "does one key overwhelm one
task?" (salting + AQE skew-join split). Both are provided as plain
DataFrame helpers so pipelines opt in per table/join.
"""

from __future__ import annotations

import functools
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
    every Spark reader/writer); local paths short-circuit to a syscall
    (the `_snap_fs` fast path — no py4j round-trip)."""
    fs, jvm = _snap_fs(spark, path)
    return bool(fs.exists(_snap_path(jvm, path)))


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


class SnapshotConflictError(RuntimeError):
    """A concurrent writer won the staging or commit race. The loser's
    work was never exposed (readers only follow committed records); the
    caller may re-derive its write against the NEW current version and
    try again — blind full-replace writers can do so automatically via
    ``snapshot_write(..., retries=N)``, read-modify-write maintainers
    must re-read first (which ``expected_version`` enforces)."""


class ConstraintViolationError(ValueError):
    """A PERSISTENT table CHECK constraint (``snapshot_add_constraint``)
    rejected rows a write tried to stage. Nothing was committed — the
    orphan stage is removed before raising."""


def _constraint_observation(staged_df: DataFrame, constraints: dict):
    """Attach one violation counter per stored constraint to the staging
    plan (a single ``Observation`` — counted DURING the write itself, no
    extra table pass). NULL rule results count as violations, matching
    ``check_expectations``. Returns ``(df, observation, names)``."""
    from pyspark.sql import Observation

    names = sorted(constraints)
    obs = Observation()
    aggs = [
        F.sum(
            (~F.coalesce(F.expr(constraints[n]), F.lit(False))).cast("long")
        ).alias(f"c{i}")
        for i, n in enumerate(names)
    ]
    return staged_df.observe(obs, *aggs), obs, names


def _enforce_constraints(
    spark: SparkSession, table_dir: str, vdir: str, obs, names: list[str], what: str
) -> None:
    """Read the staging write's violation counters; on any violation,
    remove the (never-committed) stage and raise typed with per-rule
    counts. Called between staging and the commit record, so a bad batch
    can never become a committed version."""
    got = obs.get
    bad = {
        n: int(got[f"c{i}"] or 0)
        for i, n in enumerate(names)
        if int(got[f"c{i}"] or 0)
    }
    if bad:
        fs, jvm = _snap_fs(spark, table_dir)
        fs.delete(_snap_path(jvm, vdir), True)
        raise ConstraintViolationError(
            f"{what}: table CHECK constraint violations {bad} under "
            f"{table_dir} — nothing was committed; fix the batch or "
            f"snapshot_drop_constraint first"
        )


# ---------------------------------------------------------------------------
# Local-filesystem fast path for the commit protocol's metadata IO.
#
# Every manifest read, claim, existence probe and pointer write used to go
# through the JVM Hadoop FileSystem via py4j — ~0.5-2 ms of socket
# round-trips PER CALL from the driver's Python process, against ~3 µs for
# the same syscall issued directly (measured r13; a 12-commit protocol
# round-trip makes ~1k such calls, so the chatter alone was ~1s/query of
# pure driver latency, multiplied per trigger in streaming). For `file:`
# paths the classes below implement the exact slice of the Hadoop
# FileSystem/Path/FileStatus surface this module uses, on plain Python
# syscalls, with Hadoop's observable semantics (rename refuses an existing
# destination, delete returns False on a missing path, createNewFile is the
# create-no-overwrite probe — here genuinely O_EXCL-atomic, strictly
# stronger than RawLocalFileSystem's check-then-create). Remote schemes
# (hdfs:, viewfs:, s3a:, …) keep the JVM FileSystem unchanged — the fast
# path is a dispatch in `_snap_fs`, never a semantics fork: the hard-link /
# EEXIST commit protocol is identical on both faces.
# ---------------------------------------------------------------------------


class _PyHadoopPath:
    """org.apache.hadoop.fs.Path stand-in for local paths: carries the
    string, answers the URI/parent/name surface the module uses."""

    __slots__ = ("_s",)

    def __init__(self, s):
        self._s = str(s)

    def __str__(self):
        return self._s

    def __repr__(self):
        return self._s

    def toUri(self):
        return self

    # URI face (Java Path.toUri().getScheme()/getPath())
    def getScheme(self):
        return "file" if self._s.startswith("file:") else None

    def getPath(self):
        s = self._s
        if s.startswith("file://"):
            return s[len("file://"):] or "/"
        if s.startswith("file:"):
            return s[len("file:"):]
        return s

    def getParent(self):
        import posixpath

        return _PyHadoopPath(posixpath.dirname(self.getPath().rstrip("/")))

    def getName(self):
        import posixpath

        return posixpath.basename(self.getPath().rstrip("/"))


class _PyFileStatus:
    __slots__ = ("_p", "_is_dir", "_len", "_mtime_ms")

    def __init__(self, p: str, is_dir: bool, length: int, mtime_ms: int):
        self._p = p
        self._is_dir = is_dir
        self._len = length
        self._mtime_ms = mtime_ms

    def getPath(self):
        return _PyHadoopPath(self._p)

    def getLen(self):
        return self._len

    def getModificationTime(self):
        return self._mtime_ms

    def isDirectory(self):
        return self._is_dir


class _PyContentSummary:
    __slots__ = ("_length",)

    def __init__(self, length: int):
        self._length = length

    def getLength(self):
        return self._length


def _py_local(p) -> str:
    """The os-level path of a str or _PyHadoopPath (file: scheme stripped)."""
    if isinstance(p, _PyHadoopPath):
        return p.getPath()
    s = str(p)
    if s.startswith("file://"):
        return s[len("file://"):] or "/"
    if s.startswith("file:"):
        return s[len("file:"):]
    return s


class _PyLocalFS:
    """The slice of org.apache.hadoop.fs.FileSystem this module uses,
    on direct syscalls, mimicking Hadoop's local-FS observable behavior."""

    def exists(self, p) -> bool:
        return os.path.exists(_py_local(p))

    def mkdirs(self, p) -> bool:
        os.makedirs(_py_local(p), exist_ok=True)
        return True

    def create(self, p, overwrite=True):
        path = _py_local(p)
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)  # Hadoop create() makes parents
        if overwrite:
            return open(path, "wb")
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        return os.fdopen(fd, "wb")

    def createNewFile(self, p) -> bool:
        path = _py_local(p)
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        try:
            os.close(os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            return True
        except FileExistsError:
            return False

    def open(self, p):
        return open(_py_local(p), "rb")

    def delete(self, p, recursive=False) -> bool:
        path = _py_local(p)
        try:
            if os.path.isdir(path):
                if recursive:
                    shutil.rmtree(path)
                else:
                    os.rmdir(path)
            else:
                os.remove(path)
            return True
        except FileNotFoundError:
            return False

    def rename(self, src, dst) -> bool:
        s, d = _py_local(src), _py_local(dst)
        # Hadoop local rename REFUSES an existing destination (returns
        # false); POSIX rename would silently replace it — preserve the
        # Hadoop contract the checkpoint/pointer writers rely on
        if os.path.exists(d) or not os.path.exists(s):
            return False
        try:
            os.rename(s, d)
            return True
        except OSError:
            return False

    def listStatus(self, p):
        path = _py_local(p)
        out = []
        with os.scandir(path) as it:
            for e in it:
                st = e.stat()
                out.append(
                    _PyFileStatus(
                        f"{path.rstrip('/')}/{e.name}",
                        e.is_dir(),
                        st.st_size,
                        int(st.st_mtime * 1000),
                    )
                )
        return out

    def getContentSummary(self, p):
        total = 0
        for root, _dirs, files in os.walk(_py_local(p)):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        return _PyContentSummary(total)


class _PyIOUtils:
    @staticmethod
    def toString(stream, charset):
        return stream.read().decode(charset)


class _PyJavaFile:
    __slots__ = ("_p",)

    def __init__(self, p):
        self._p = str(p)

    def toPath(self):
        return self._p


class _PyFiles:
    @staticmethod
    def createLink(link, existing):
        os.link(str(existing), str(link))


class _Ns:
    """Attribute-chain namespace so the shim answers the same dotted jvm
    paths the py4j gateway does (jvm.org.apache.hadoop.fs.Path, …)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


_PY_JVM = _Ns(
    org=_Ns(
        apache=_Ns(
            hadoop=_Ns(fs=_Ns(Path=_PyHadoopPath)),
            commons=_Ns(io=_Ns(IOUtils=_PyIOUtils)),
        )
    ),
    java=_Ns(
        io=_Ns(File=_PyJavaFile),
        nio=_Ns(file=_Ns(Files=_PyFiles)),
    ),
)
_PY_LOCAL_FS = _PyLocalFS()


def _is_local_uri(path: str) -> bool:
    if "://" in path:
        return path.split("://", 1)[0] == "file"
    return True  # plain paths and file:/ forms are local


def _snap_fs(spark: SparkSession, path: str):
    if _is_local_uri(path):
        return _PY_LOCAL_FS, _PY_JVM
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _snap_path(jvm, *parts: str):
    return jvm.org.apache.hadoop.fs.Path("/".join(str(x).rstrip("/") for x in parts))


def snapshot_version(spark: SparkSession, table_dir: str) -> int:
    """Current committed version (0 = no commit yet).

    With a manifest-log checkpoint present (written every
    ``SNAPSHOT_CHECKPOINT_INTERVAL`` commits — the Delta
    ``_last_checkpoint`` shape), resolution is O(1) pointer read +
    O(tail) existence probes: versions are CONTIGUOUS by the staging
    protocol, so probing forward from the checkpointed version finds the
    head without listing the whole ``_manifests/`` directory — after a
    year of streaming appends (100k+ commits) a full listing per version
    read is the difference between metadata ops and a directory scan.
    Without a checkpoint (young table, or a torn pointer) it falls back
    to the full listing — correctness never depends on the checkpoint."""
    fs, jvm = _snap_fs(spark, table_dir)
    ckv = _checkpoint_version(spark, table_dir)
    if ckv is not None:
        v = ckv
        while fs.exists(
            _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{v + 1}.json")
        ):
            v += 1
        if v > ckv or fs.exists(
            _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{v}.json")
        ):
            return v
        # a pointer whose own version was never committed is corrupt —
        # fall through to the listing rather than report a phantom head
    mdir = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR)
    if not fs.exists(mdir):
        return 0
    versions = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.endswith(".json") and name[:-5].isdigit():
            versions.append(int(name[:-5]))
    return max(versions, default=0)


# Manifest-log checkpointing (the Delta `_last_checkpoint` shape): every
# N commits the writer compacts the per-version SUMMARY records (version,
# commit time, op label, file/row/byte totals, lineage markers — exactly
# the `snapshot_history` row) into an immutable `_manifests/N.ckpt.json`
# and repoints the overwritable `_manifests/_last_checkpoint` at it.
# History / as-of / version resolution then read O(1) + O(tail) instead
# of O(all versions). The checkpoint is an OPTIMIZATION, never a
# correctness dependency: a missing, torn, or stale pointer falls back to
# the full manifest scan, and checkpoint writes are best-effort (a failed
# checkpoint can never fail a commit). Data-bearing manifests are still
# read individually when file lists are needed — each N.json is already
# self-contained, so unlike Delta no state reconstruction is involved.
SNAPSHOT_CHECKPOINT_INTERVAL = 10
_CKPT_POINTER = "_last_checkpoint"


def _history_rec(v: int, m: dict) -> dict:
    """The per-version summary record shared by ``snapshot_history`` and
    the manifest-log checkpoint (they must agree byte-for-byte — the
    checkpoint IS cached history)."""
    rec: dict = {"version": v}
    if m.get("ts") is not None:
        rec["ts"] = m["ts"]
    if m.get("op"):
        rec["op"] = m["op"]
    for k in ("restored_from", "optimized_from", "restamped_from",
              "cloned_from", "constraint_added", "constraint_dropped"):
        if k in m:
            rec[k] = m[k]
    files = m.get("files")
    if files is None:
        rec.update(
            {"n_files": None, "rows": None, "bytes": None,
             "n_staged": None, "n_carried": None}
        )
    else:
        own = f"v={v}/"
        rec.update(
            {
                "n_files": len(files),
                "rows": sum(e.get("rows", 0) for e in files),
                "bytes": sum(e.get("bytes", 0) for e in files),
                "n_staged": sum(e["path"].startswith(own) for e in files),
                "n_carried": sum(not e["path"].startswith(own) for e in files),
            }
        )
    return rec


def _checkpoint_version(spark: SparkSession, table_dir: str) -> int | None:
    """POINTER-ONLY read of the checkpointed version cursor — what
    ``snapshot_version`` needs. The compacted log itself is O(all
    versions) bytes (MBs on a 100k-commit table); version resolution
    must never pay that, only history/as-of consumers do."""
    import json

    try:
        fs, jvm = _snap_fs(spark, table_dir)
        ptr = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, _CKPT_POINTER)
        if not fs.exists(ptr):
            return None
        stream = fs.open(ptr)
        try:
            txt = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
        return int(json.loads(txt)["version"])
    except Exception:
        return None


def _read_checkpoint(spark: SparkSession, table_dir: str) -> dict | None:
    """The latest manifest-log checkpoint ``{"version": N, "log":
    [rec, ...]}`` — or None when absent/torn (callers fall back to the
    full manifest scan; the pointer is overwritten non-atomically by
    design, exactly Delta's `_last_checkpoint` contract)."""
    import json

    fs, jvm = _snap_fs(spark, table_dir)

    def _read(path) -> str:
        stream = fs.open(path)
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    try:
        ptr = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, _CKPT_POINTER)
        if not fs.exists(ptr):
            return None
        meta = json.loads(_read(ptr))
        ck = json.loads(
            _read(_snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, meta["path"]))
        )
        if int(ck["version"]) != int(meta["version"]) or "log" not in ck:
            return None
        # a genuine checkpoint's own version is always a committed record
        # (commits precede checkpoints; expiry never deletes at-or-above
        # the checkpoint). A PHANTOM version here is pointer corruption —
        # trusting it would make as-of/history answer from a fake log and
        # would let snapshot_expire_log delete history the log does not
        # actually carry. One exists() probe; consumers fall back to the
        # full manifest scan.
        if not fs.exists(
            _snap_path(
                jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{int(ck['version'])}.json"
            )
        ):
            return None
        return ck
    except Exception:
        return None


def snapshot_checkpoint(spark: SparkSession, table_dir: str) -> int:
    """Force a manifest-log checkpoint at the CURRENT version and return
    it (the automatic cadence is every ``SNAPSHOT_CHECKPOINT_INTERVAL``
    commits; this is the explicit lever — e.g. before handing a table to
    a high-frequency streaming tail). Incremental: only the manifests
    since the previous checkpoint are read."""
    version = snapshot_version(spark, table_dir)
    if version < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    _checkpoint_now(spark, table_dir, version, None)
    return version


def _checkpoint_now(
    spark: SparkSession, table_dir: str, version: int, payload: dict | None
) -> None:
    """Build the compacted log up to ``version`` (previous checkpoint +
    tail manifest reads; ``payload`` short-circuits the newest read when
    the caller just committed it) and publish it."""
    import json
    import uuid

    prev = _read_checkpoint(spark, table_dir)
    if prev is not None and int(prev["version"]) >= version:
        return  # a concurrent writer already checkpointed at-or-past us
    log, start = ([], 1) if prev is None else (list(prev["log"]), int(prev["version"]) + 1)
    for v in range(start, version + 1):
        if v == version and payload is not None:
            log.append(_history_rec(v, payload))
            continue
        try:
            log.append(_history_rec(v, _read_manifest(spark, table_dir, v)))
        except FileNotFoundError:
            continue
    fs, jvm = _snap_fs(spark, table_dir)
    mdir = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR)
    ck = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{version}.ckpt.json")
    if not fs.exists(ck):
        tmp = _snap_path(jvm, str(mdir), f".{version}.ckpt.{uuid.uuid4().hex}.tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(json.dumps({"version": version, "log": log}).encode()))
        finally:
            out.close()
        if not fs.rename(tmp, ck):
            fs.delete(tmp, False)  # lost a duplicate-checkpoint race: fine
    # repoint: tmp + delete + rename. The pointer is the ONLY overwritten
    # file in the protocol; a reader hitting the delete/rename window (or
    # a torn write) falls back to the listing — never a wrong answer.
    ptr = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, _CKPT_POINTER)
    tmp2 = _snap_path(jvm, str(mdir), f".{_CKPT_POINTER}.{uuid.uuid4().hex}.tmp")
    out = fs.create(tmp2, True)
    try:
        out.write(
            bytearray(
                json.dumps(
                    {"version": version, "path": f"{version}.ckpt.json"}
                ).encode()
            )
        )
    finally:
        out.close()
    fs.delete(ptr, False)
    if not fs.rename(tmp2, ptr):
        fs.delete(tmp2, False)


def _maybe_checkpoint(
    spark: SparkSession, table_dir: str, version: int, payload: dict
) -> None:
    """Auto-checkpoint on the interval cadence, best-effort: called after
    every successful commit publish; any failure is swallowed (the next
    interval retries, and readers never depend on checkpoint presence)."""
    interval = SNAPSHOT_CHECKPOINT_INTERVAL
    if not interval or interval < 1 or version % interval:
        return
    try:
        _checkpoint_now(spark, table_dir, version, payload)
    except Exception:
        pass


def snapshot_version_asof(spark: SparkSession, table_dir: str, ts: float) -> int:
    """The version committed at-or-before unix time ``ts`` (Delta's
    ``TIMESTAMP AS OF``): commit records carry their wall-clock commit
    time, so this is a pure manifest scan. Raises if the table's first
    commit is later than ``ts``.

    Clock skew between writers is handled the way Delta handles
    non-monotonic commit times — each version's EFFECTIVE time is
    clamped to the running maximum of all earlier commits, so versions
    never travel back in time and the answer is always a version that
    was genuinely current at ``ts``. Under clamping the qualifying set
    is exactly every version BEFORE the first commit stamped after
    ``ts``, so the scan stops at that first late record instead of
    reading every manifest (O(answer) reads for an old as-of).
    Pre-stamp-era records (no ``ts`` field) are treated as infinitely
    old: they never terminate the scan and any as-of reaches past them.

    With a manifest-log checkpoint the scan walks the compacted
    (version, ts) log first — tiny records, zero manifest reads — and
    touches real manifests only for the post-checkpoint tail."""
    best = 0
    ck = _read_checkpoint(spark, table_dir)
    start, stopped = 1, False
    if ck is not None:
        for rec in ck["log"]:
            if rec.get("ts") is not None and float(rec["ts"]) > ts:
                stopped = True
                break
            best = int(rec["version"])
        start = int(ck["version"]) + 1
    if not stopped:
        for v in range(start, snapshot_version(spark, table_dir) + 1):
            try:
                m = _read_manifest(spark, table_dir, v)
            except FileNotFoundError:
                continue
            if m.get("ts") is not None and float(m["ts"]) > ts:
                # clamped times are monotone: every later version's
                # effective time is at least this one's — nothing further
                # can qualify
                break
            best = v
    if best < 1:
        raise FileNotFoundError(
            f"no snapshot committed at or before ts={ts} in {table_dir}"
        )
    return best


def _probe_merge_batch(
    spark: SparkSession,
    entries: list[dict],
    keys: list[str],
    probe_df: DataFrame,
    what: str,
) -> set[str]:
    """ONE Spark job serving both pre-stage gates of the merge family —
    previously two separate passes over the change batch per commit:

    1. ANSI MERGE cardinality (at most one change row per key tuple,
       key components non-null) — raises typed on violation.
    2. Manifest-level envelope pruning: the set of file paths whose
       composite [min,max] envelope admits at least one change-key tuple
       (a file can hold a tuple only if EVERY key column's envelope
       admits its component — the per-column conjunction Delta/Iceberg
       stats give). Collected driver-side because it IS the rewrite
       plan, bounded by the FILE count, never the change count.

    The fused plan is one groupBy over the change keys (the same shuffle
    the old distinct() paid) left-joined against the broadcast
    (KB-scale) envelope table, folded to a single row — so update
    batches of any size make one pass and never round-trip rows through
    the driver."""
    knames = [f"__k{i}" for i in range(len(keys))]
    keyed = (
        probe_df.select(*[F.col(k).alias(n) for k, n in zip(keys, knames)])
        .groupBy(*knames)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    nonnull = F.lit(True)
    for n in knames:
        nonnull = nonnull & F.col(n).isNotNull()
    env_rows = [
        tuple(
            [e["path"]]
            + [v for k in keys for v in (e["stats"][k]["min"], e["stats"][k]["max"])]
        )
        for e in entries
        if e.get("rows", 0) > 0
        and all(e["stats"][k]["min"] is not None for k in keys)
    ]
    joined, path_col = keyed, F.lit(None).cast("string")
    if env_rows:
        env_cols = ["__path"] + [
            n for i in range(len(keys)) for n in (f"__min{i}", f"__max{i}")
        ]
        env = spark.createDataFrame(env_rows, env_cols)
        cond = F.lit(True)
        for i in range(len(keys)):
            cond = cond & (
                (F.col(f"__k{i}") >= F.col(f"__min{i}"))
                & (F.col(f"__k{i}") <= F.col(f"__max{i}"))
            )
        joined = keyed.join(F.broadcast(env), cond, "left")
        path_col = F.col("__path")
    row = joined.agg(
        F.max("__n").alias("__mx"),
        F.max(F.when(nonnull, 0).otherwise(1)).alias("__has_null"),
        F.collect_set(path_col).alias("__touched"),
    ).head()
    if row["__has_null"]:
        raise ValueError(f"{what}: change batch has NULL {keys!r} keys")
    if row["__mx"] is not None and row["__mx"] > 1:
        raise ValueError(
            f"{what}: change batch has duplicate {keys!r} keys — a target "
            f"row must match at most one change row; fold the batch to one "
            f"row per key (e.g. merge.cdc_apply) first"
        )
    return set(row["__touched"])


def _check_staged_against(
    spark: SparkSession, table_dir: str, vdir: str, version: int,
    derived_from: int, what: str,
) -> None:
    """Read-modify-write staleness gate, applied AFTER staging: a commit
    derived from version N must stage as N+1. If a concurrent writer
    committed in the window between the caller's manifest read and its
    staging claim, the staged version is higher and the carried file
    list is STALE — committing it would silently erase the concurrent
    commit's files (a lost update the create-no-overwrite commit record
    cannot catch, because the versions differ). The orphan stage is
    removed and a retryable conflict raised instead. Blind full-replace
    writes (``snapshot_write``) don't need this — they carry nothing."""
    if version != derived_from + 1:
        fs, jvm = _snap_fs(spark, table_dir)
        fs.delete(_snap_path(jvm, vdir), True)
        raise SnapshotConflictError(
            f"{what}: staged v={version} but the write was derived from "
            f"v={derived_from} — a concurrent writer committed in between "
            f"and the carried file list is stale; re-read and re-derive"
        )


def _stage_version(df: DataFrame, table_dir: str) -> tuple[int, str]:
    """CLAIM and write the next version's staging dir (steps 1–2 of the
    commit protocol); returns ``(version, staging_dir)``. See
    ``snapshot_write`` for the protocol rationale.

    The claim must be ATOMIC, not check-then-create: Hadoop's
    ``createNewFile`` on the local FS is exists()-then-create, so two
    threads racing the same version could both "claim" it and then write
    parquet jobs into ONE directory — each job's commit tears down the
    other's ``_temporary`` tree, and worse, the winner's manifest would
    list the loser's committed part-files (duplicate rows once the loser
    retries). Found by the concurrent-append stress test. On ``file:``
    paths the claim is therefore published by hard link (the same
    EEXIST-atomic syscall the commit record uses); elsewhere
    ``create(overwrite=false)`` is the namespace-atomic primitive."""
    spark = df.sparkSession
    version = snapshot_version(spark, table_dir) + 1
    vdir = _claim_version_dir(spark, table_dir, version)
    fs, jvm = _snap_fs(spark, table_dir)
    # append, not overwrite: overwrite would delete the dir and with it the
    # _CLAIM marker that holds the stage against concurrent writers
    df.write.mode("append").parquet(vdir)
    if not fs.exists(_snap_path(jvm, vdir, "_SUCCESS")):
        raise RuntimeError(f"snapshot stage at {vdir} missing _SUCCESS marker")
    return version, vdir


def _claim_version_dir(spark: SparkSession, table_dir: str, version: int) -> str:
    """ATOMICALLY claim the ``v=N`` staging dir for ``version`` and
    return it — the mutual-exclusion step every writer of version-N side
    files (staged parquet, deletion vectors, materialized change files)
    must take before writing, so two writers deriving the same next
    version can never interleave into one directory. Raises
    ``SnapshotConflictError`` on a lost race."""
    import uuid

    fs, jvm = _snap_fs(spark, table_dir)
    vdir = f"{table_dir.rstrip('/')}/v={version}"
    vpath = _snap_path(jvm, vdir)
    if fs.exists(vpath):
        raise SnapshotConflictError(
            f"snapshot_write: staging dir v={version} already exists under "
            f"{table_dir} — either a concurrent writer is staging version "
            f"{version} or a crashed writer left an orphan; if "
            f"_manifests/{version}.json is absent, the orphan was never "
            f"committed and is safe to delete"
        )
    claim = _snap_path(jvm, vdir, "_CLAIM")
    lost = SnapshotConflictError(
        f"snapshot_write: lost the staging race for v={version} under "
        f"{table_dir} to a concurrent writer"
    )
    if claim.toUri().getScheme() in (None, "file"):
        fs.mkdirs(vpath)
        tmp = _snap_path(jvm, vdir, f"._claim.{uuid.uuid4().hex}.tmp")
        fs.create(tmp, True).close()
        try:
            _publish_by_link(jvm, claim, tmp)
        except Exception as e:
            # same trichotomy as the commit record: only a LOST RACE is a
            # conflict (retryable); IO/config failures must fail loudly or
            # they'd burn every retry on a hopeless loop
            if fs.exists(claim):
                raise lost from e
            raise RuntimeError(
                f"snapshot_write: publishing staging claim {claim} failed "
                f"for a non-conflict reason (permissions? no hard-link "
                f"support?): {e}"
            ) from e
        finally:
            fs.delete(tmp, False)
    else:
        try:
            out = fs.create(claim, False)
            out.close()
        except Exception as e:
            # same trichotomy on remote stores: the claim now existing
            # proves a lost race; anything else (permissions, network) is
            # a real IO failure that must not burn retries as "conflicts"
            if fs.exists(claim):
                raise lost from e
            raise RuntimeError(
                f"snapshot_write: creating staging claim {claim} failed "
                f"for a non-conflict reason: {e}"
            ) from e
    return vdir


def _merge_txn(manifest: dict, properties: dict | None) -> dict | None:
    """SetTransaction-style stamp retention (the Delta ``txn`` action):
    the ``txn`` sub-map of commit properties — streaming writers'
    ``{app_id: last_applied_batch}`` idempotence stamps — must survive
    every data-changing commit or a crash-replayed micro-batch would
    re-apply after an unrelated writer touched the table. Every keyed
    write path merges the PREVIOUS manifest's ``txn`` map under any
    stamps the new write carries (new wins per app_id). Content-
    preserving maintenance already carries ``properties`` wholesale;
    ``snapshot_write`` (full replace) deliberately resets — replacing a
    table's content invalidates what the stamps attest."""
    prev = (manifest.get("properties") or {}).get("txn") or {}
    out = dict(properties or {})
    merged = {**prev, **(out.get("txn") or {})}
    if merged:
        out["txn"] = merged
    return out or None


def _props_payload(props: dict) -> dict:
    """JSON-safe commit properties; one level of dict nesting (the
    ``txn`` stamp map) keeps its structure instead of stringifying."""
    return {
        k: (
            {kk: _json_safe(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else _json_safe(v)
        )
        for k, v in props.items()
    }


def _json_safe(v):
    """Stats values must survive a JSON round-trip AND order the same way
    afterwards: numbers/strings/bools pass through; date/timestamp become
    ISO-8601 strings (whose lexicographic order IS chronological order, so
    string comparison against an ISO literal prunes correctly); anything
    else falls back to ``str`` on the same reasoning as Python's repr."""
    import datetime

    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    return str(v)


def _pa_fs(path: str):
    """``(pyarrow FileSystem, fs-internal path)`` — the same URI-capable
    resolution ``feedsource._fs`` uses, local here so the storage module
    stays importable without the ingest package."""
    from pyarrow import fs as pafs

    if "://" in path or path.startswith("file:"):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


# Parquet physical types whose FOOTER statistics decode to the same
# Python values the Spark stats job collects (so the two stat sources are
# interchangeable byte-for-byte in the manifest): integrals, UTF-8
# strings (unsigned-byte order == code-point order under UTF-8), dates,
# booleans. Floats are EXCLUDED (a NaN-polluted chunk's footer min/max
# silently diverges from Spark's NaN-aware aggregate — same rule the
# Arrow writer path applies value-side), INT96 timestamps carry no stats
# at all, and anything else falls back to the Spark job below.
_FOOTER_TRUSTED_PHYSICAL = {"INT32", "INT64", "BOOLEAN", "BYTE_ARRAY"}


def _footer_file_entries(
    table_dir: str, version: int, names: dict[str, int],
    stats_cols: list[str] | None,
) -> list[dict] | None:
    """Manifest entries for the staged files read from their parquet
    FOOTERS — no Spark job, no data IO beyond one footer per file. Every
    byte staged was already scanned once by the writer; re-reading it
    all (the fallback Spark aggregate below) just to recompute what the
    parquet writer already recorded is the dominant per-commit constant
    at small batch sizes and a full second read of the batch at large
    ones. Returns None whenever ANY requested stat is not provably
    footer-recoverable in Spark-job parity form (float/double columns,
    INT96 timestamps, missing chunk statistics, truncated string bounds,
    unreadable footers …) — the caller then runs the Spark job, so
    correctness never depends on footer quality."""
    import concurrent.futures as cf
    import datetime

    try:
        import pyarrow.parquet as pq

        f, root = _pa_fs(table_dir)
    except Exception:
        return None
    vroot = f"{root.rstrip('/')}/v={version}"
    cols = list(stats_cols or [])

    def _canon_stat(v):
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return _json_safe(v)

    def one(name: str) -> dict | None:
        with f.open_input_file(f"{vroot}/{name}") as src:
            md = pq.ParquetFile(src).metadata
        e: dict = {
            "path": f"v={version}/{name}",
            "rows": int(md.num_rows),
            "bytes": names[name],
        }
        if not cols or md.num_rows == 0:
            return e  # zero-row files carry no stats key (Spark-job parity)
        idx = {
            md.schema.column(j).path: j for j in range(md.num_columns)
        }
        stats: dict = {}
        for c in cols:
            j = idx.get(c)
            if j is None:
                return None  # column absent from this footer: not provable
            mn = mx = None
            nulls = 0
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                cc = rg.column(j)
                st = cc.statistics
                if st is None or not st.has_null_count:
                    return None
                nulls += int(st.null_count)
                if not st.has_min_max:
                    if st.null_count == rg.num_rows:
                        continue  # all-null chunk: contributes nulls only
                    return None
                if cc.physical_type not in _FOOTER_TRUSTED_PHYSICAL:
                    return None
                gmn, gmx = st.min, st.max
                for bound in (gmn, gmx):
                    if isinstance(bound, str) and len(bound.encode()) >= 64:
                        # parquet-mr truncates long binary bounds (valid
                        # but inexact) — not Spark-job parity, fall back
                        return None
                    if isinstance(bound, bytes):
                        return None  # raw binary: stringification diverges
                mn = gmn if mn is None or gmn < mn else mn
                mx = gmx if mx is None or gmx > mx else mx
            stats[c] = {
                "min": _canon_stat(mn),
                "max": _canon_stat(mx),
                "nulls": nulls,
            }
        e["stats"] = stats
        return e

    try:
        with cf.ThreadPoolExecutor(max_workers=min(16, len(names))) as ex:
            out = list(ex.map(one, sorted(names)))
    except Exception:
        return None
    if any(e is None for e in out):
        return None
    return out


def _staged_file_entries(
    spark: SparkSession, table_dir: str, version: int, stats_cols: list[str] | None
) -> list[dict]:
    """Manifest entries for the files just staged under ``v=N``: relative
    path + row count, plus per-file min/max for each of ``stats_cols``.

    Primary source: the parquet FOOTERS the staging write already
    produced (``_footer_file_entries`` — zero data IO). Fallback: ONE
    Spark job over only the new files (grouped by ``input_file_name`` —
    the incremental cost Delta pays at write time for the same reason)
    whenever any requested stat is not footer-recoverable in exact
    Spark-job parity (float/double stats, INT96 timestamps, truncated
    string bounds …). Either way the entries are what lets readers and
    upserts skip whole files without listing or opening them."""
    fs, jvm = _snap_fs(spark, table_dir)
    vdir = f"{table_dir.rstrip('/')}/v={version}"
    names: dict[str, int] = {}
    for st in fs.listStatus(_snap_path(jvm, vdir)):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            names[name] = int(st.getLen())
    if not names:
        return []
    footer = _footer_file_entries(table_dir, version, names, stats_cols)
    if footer is not None:
        return footer
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in stats_cols or []:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
        )
    per_file = (
        spark.read.parquet(vdir)
        .groupBy(F.input_file_name().alias("__file"))
        .agg(*aggs)
        .collect()  # bounded: one row per staged FILE (the manifest itself
        # is a driver-side record — KBs per thousand files)
    )
    by_name = {r["__file"].rstrip("/").rsplit("/", 1)[-1]: r for r in per_file}
    entries = []
    for name in sorted(names):
        r = by_name.get(name)
        e: dict = {
            "path": f"v={version}/{name}",
            "rows": int(r["__rows"]) if r else 0,
            "bytes": names[name],
        }
        if stats_cols and r is not None:
            e["stats"] = {
                c: {
                    "min": _json_safe(r[f"__min_{c}"]),
                    "max": _json_safe(r[f"__max_{c}"]),
                    "nulls": int(r[f"__nulls_{c}"]),
                }
                for c in stats_cols
            }
        entries.append(e)
    return entries


def _bloom_ctypes(df: DataFrame, cols: list[str]) -> dict[str, str]:
    """Enforce + classify each Bloom column's type: the driver-side probe
    must stringify its literal EXACTLY as the Spark build cast did, which
    only holds for strings and integrals (floats/bools/timestamps
    stringify differently between the engines) — a mismatch would be a
    false-negative prune, i.e. silently wrong reads."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    ctypes: dict[str, str] = {}
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, StringType):
            ctypes[c] = "string"
        elif isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
            ctypes[c] = "integral"
        else:
            raise ValueError(
                f"bloom_cols: column {c!r} has type {dt.simpleString()} — "
                f"Bloom skipping supports string and integral key columns "
                f"(other types stringify differently between the build cast "
                f"and the driver-side probe)"
            )
    return ctypes


def _bloom_file_entries(
    spark: SparkSession,
    table_dir: str,
    version: int,
    cols: list[str],
    m: int,
    h: int,
) -> dict[str, dict]:
    """Per-file Bloom filters for the files just staged under ``v=N``:
    ``{file_name: {col: {m, h, words}}}``.

    Built entirely executor-side: the h bit positions per value are the
    same md5-derived positions ``_bloom_positions`` computes in Python
    (engine-portable on string/integer keys — the cast-to-string must
    agree between Spark and Python, so float keys are not supported),
    distinct (file, position) pairs aggregate per file, and the packing
    into 64-bit words happens inside Catalyst — the driver only ever
    receives the packed filter, m/64 longs per (file, column).

    Cost: one scan of the new files per column. Size: ~m/8 bytes per
    (file, column) in the manifest (JSON-int inflated) — at the default
    16 Kbit that is ~2-5 KB per entry, so bloom_cols shares the
    manifest's stated driver-side bound and is opt-in per table."""
    vdir = f"{table_dir.rstrip('/')}/v={version}"
    df = spark.read.parquet(vdir)
    ctypes = _bloom_ctypes(df, cols)
    # ONE scan covers every bloom column: explode (col, position) pairs,
    # distinct per (file, col, pos), pack per (file, col) executor-side
    pairs = []
    for c in cols:
        for j in range(h):
            p = (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col(c).cast("string"), F.lit(f"|{j}"))),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("long")
                % m
            )
            pairs.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(F.lit(c).alias("c"), p.alias("p")),
                )
            )
    nwords = m // 64
    rows = (
        df.select(
            F.input_file_name().alias("__f"),
            F.explode(F.array_compact(F.array(*pairs))).alias("__e"),
        )
        .select("__f", F.col("__e.c").alias("__c"), F.col("__e.p").alias("__p"))
        .distinct()
        .groupBy("__f", "__c")
        .agg(F.collect_set("__p").alias("__ps"))
        .select(
            "__f",
            "__c",
            F.expr(
                f"transform(sequence(0, {nwords - 1}), w -> "
                f"aggregate(filter(__ps, p -> int(p / 64) = w), 0L, "
                f"(acc, p) -> acc | shiftleft(1L, int(p % 64))))"
            ).alias("__words"),
        )
        .collect()  # bounded: m/64 longs per staged FILE per column
    )
    out: dict[str, dict] = {}
    for r in rows:
        name = r["__f"].rstrip("/").rsplit("/", 1)[-1]
        out.setdefault(name, {})[r["__c"]] = {
            "m": m,
            "h": h,
            "ctype": ctypes[r["__c"]],
            "words": [int(x) for x in r["__words"]],
        }
    return out


def _apply_blooms(
    spark: SparkSession,
    table_dir: str,
    version: int,
    entries: list[dict],
    spec: dict | None,
) -> None:
    """Attach per-file Bloom entries for the just-staged files according
    to the table's bloom spec (no-op without one). Carried entries keep
    the blooms they were committed with."""
    if not spec or not spec.get("cols"):
        return
    if not any(e["path"].startswith(f"v={version}/") for e in entries):
        return  # nothing staged (e.g. a pure-delete merge): no dir to scan
    bl = _bloom_file_entries(
        spark, table_dir, version, spec["cols"], spec["m"], spec["h"]
    )
    for e in entries:
        name = e["path"].rsplit("/", 1)[-1]
        if e["path"].startswith(f"v={version}/") and name in bl:
            e["bloom"] = bl[name]


def _publish_by_link(jvm, record, tmp) -> None:
    """``link(tmp, record)`` — the single atomic syscall that IS the
    commit on ``file:`` paths. Module-level so failure-injection tests
    can substitute a non-EEXIST error."""
    jvm.java.nio.file.Files.createLink(
        jvm.java.io.File(record.toUri().getPath()).toPath(),
        jvm.java.io.File(tmp.toUri().getPath()).toPath(),
    )


def _commit_record(spark: SparkSession, table_dir: str, version: int, payload: dict) -> None:
    """Step 3 of the protocol: atomically create the immutable commit
    record ``_manifests/N.json`` (create-no-overwrite IS the commit).

    On ``file:`` paths the record is PUBLISHED BY HARD LINK: the payload
    is fully written to a hidden per-writer temp file first, then
    ``link(tmp, N.json)`` claims the name — a single atomic syscall that
    fails with EEXIST if any other writer committed first (closing the
    check-then-create race Hadoop's RawLocalFileSystem has in
    ``create(overwrite=false)``), and the record is complete the instant
    it becomes visible, so a concurrent ``_read_manifest`` can never see
    a half-written commit. On HDFS, ``create(overwrite=false)`` is
    already an atomic namespace operation and is used directly; object
    stores without conditional PUT keep the documented single-writer
    caveat, as with every log-structured table format."""
    import json
    import uuid

    fs, jvm = _snap_fs(spark, table_dir)
    record = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{version}.json")
    payload.setdefault("ts", round(__import__("time").time(), 3))
    conflict = SnapshotConflictError(
        f"snapshot_write: commit record for v={version} already exists "
        f"under {table_dir} — a concurrent writer committed first; "
        f"re-derive against the new current version and retry"
    )
    if record.toUri().getScheme() in (None, "file"):
        mdir = record.getParent()
        fs.mkdirs(mdir)
        tmp = _snap_path(jvm, str(mdir), f".{version}.json.{uuid.uuid4().hex}.tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(json.dumps(payload).encode()))
        finally:
            out.close()
        try:
            _publish_by_link(jvm, record, tmp)
        except Exception as e:
            # only a LOST RACE is a conflict (retryable); permissions,
            # cross-device links, or a filesystem without hard links are
            # real failures — mapping them to SnapshotConflictError would
            # burn snapshot_write(retries=N) on a hopeless retry loop and
            # let stream maintainers swallow a persistent IO error forever.
            # The race check is the record itself: if the name now exists,
            # someone committed first.
            if fs.exists(record):
                raise conflict from e
            raise RuntimeError(
                f"snapshot_write: publishing commit record {record} failed "
                f"for a non-conflict reason (permissions? cross-device "
                f"tmp? no hard-link support?): {e}"
            ) from e
        finally:
            fs.delete(tmp, False)
        _maybe_checkpoint(spark, table_dir, version, payload)
        return
    try:
        out = fs.create(record, False)  # create-no-overwrite: THE commit
    except Exception as e:
        raise conflict from e
    try:
        out.write(bytearray(json.dumps(payload).encode()))
    finally:
        out.close()
    _maybe_checkpoint(spark, table_dir, version, payload)


def _manifest_schema(manifest: dict):
    """The committed read-contract schema as a StructType (None for
    pre-schema v1-era records). Single parse point for every consumer —
    snapshot_read, the merge core, the change feed, delete, optimize."""
    import json

    from pyspark.sql.types import StructType

    sch = manifest.get("schema")
    return StructType.fromJson(json.loads(sch)) if sch else None


def _manifest_reader(spark: SparkSession, manifest: dict):
    """A reader honoring the manifest's schema contract: files committed
    before a schema evolution surface NULL for columns added later, and
    no multi-file footer-inference pass is paid. Falls back to plain
    inference only for v1-era records with no recorded schema."""
    sch = _manifest_schema(manifest)
    return spark.read.schema(sch) if sch is not None else spark.read


def _read_manifest(spark: SparkSession, table_dir: str, version: int) -> dict:
    """Load the commit record for ``version`` through the path's own
    Hadoop FileSystem (URI-capable — no driver-local ``open``)."""
    import json

    fs, jvm = _snap_fs(spark, table_dir)
    record = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{version}.json")
    if not fs.exists(record):
        raise FileNotFoundError(
            f"snapshot version {version} was never committed in {table_dir}"
        )
    stream = fs.open(record)
    try:
        txt = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(txt)


def check_expectations(df: DataFrame, expectations: dict[str, str]) -> None:
    """CHECK-constraint gate: every row must satisfy every expectation
    (``name -> SQL boolean expression``). ONE scan counts all violations
    together (sum-of-cases aggregate, map-side combined — not one job per
    rule); raises with per-rule counts if any row fails. NULL results
    count as violations — an expectation must be provably true."""
    if not expectations:
        return
    aggs = [
        F.sum(
            F.when(F.coalesce(F.expr(cond), F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, cond in expectations.items()
    ]
    row = df.agg(*aggs).head()
    bad = {name: int(row[name] or 0) for name in expectations if (row[name] or 0) > 0}
    if bad:
        raise ValueError(
            "expectations violated: "
            + ", ".join(f"{n} ({c} rows, rule: {expectations[n]!r})" for n, c in sorted(bad.items()))
        )


def snapshot_write(
    df: DataFrame,
    table_dir: str,
    stats_cols: list[str] | None = None,
    expectations: dict[str, str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 16384,
    bloom_hashes: int = 5,
    properties: dict | None = None,
    expected_version: int | None = None,
    retries: int = 0,
    constraints: dict[str, str] | None = None,
    change_files: bool | None = None,
    _op: str = "write",
) -> int:
    """Commit ``df`` as the next table version and return it.

    ``change_files=True`` enables CHANGE DATA FEED materialization for
    the table (Delta's ``delta.enableChangeDataFeed`` trade): every
    rewrite commit — the merge family (``snapshot_upsert`` /
    ``snapshot_apply_cdc`` / ``snapshot_merge``), COW
    ``snapshot_delete``, ``snapshot_restore``, and a full REPLACE via
    ``snapshot_write`` itself — additionally persists its NET row-level
    diff under ``_changes/v=N/`` and records it in the manifest, so the
    ``snapshotfeed`` changeFeed (stream and batch) replays rewrites as
    CDC rows instead of raising: a cdf table's changeFeed NEVER refuses.
    The flag is a table property carried by every subsequent commit;
    ``None`` (default) inherits the current table's flag on a replace,
    ``False`` disables it.

    Every commit record carries an ``op`` label (the Delta
    ``commitInfo.operation`` shape) so history and the ``snapshotfeed``
    streaming source can tell CONTENT-PRESERVING maintenance (optimize /
    compact / restamp / constraint DDL) from data changes without
    guessing structurally. ``_op`` is internal plumbing for the
    maintenance wrappers that stage through this function.

    Concurrency controls (optimistic, Delta-style):

    ``expected_version`` — compare-and-swap for READ-MODIFY-WRITE
    maintainers: the commit succeeds only as version
    ``expected_version + 1``. If any other writer committed after the
    caller read version ``expected_version``, this raises
    ``SnapshotConflictError`` instead of committing a result derived
    from a stale read (the lost-update every external-offset /
    last-writer-wins design permits). The caller re-reads and re-derives.

    ``retries`` — automatic retry-with-next-version for BLIND writers
    whose content does not depend on the previous version (full-replace
    ingest): on a staging/commit race the loser cleans its orphan stage
    and re-claims the new next version, up to ``retries`` times. Mutually
    exclusive with ``expected_version`` (retrying a CAS would silently
    commit the stale derivation it exists to prevent).

    ``properties`` is an arbitrary JSON-safe dict stamped into the commit
    record (the Delta ``commitInfo``/txn shape) and read back via
    ``snapshot_properties``. Because it commits ATOMICALLY WITH the data,
    it is the exactly-once lever for derived tables: a consumer that
    records "this rollup reflects source version N" inside its own
    commit can always resume from the right span after a crash — no
    separate offset store whose update can tear away from the data write
    (``analytics.sync_rollup_from_changes`` is the worked example).

    ``bloom_cols`` additionally stores a per-file Bloom filter for each
    listed column (string/integer keys) — the point-lookup skipping
    lever for HASH-DISTRIBUTED keys, whose min/max envelope spans the
    whole domain and prunes nothing. ``snapshot_read(where=[(col, '=',
    v)])`` probes the filters driver-side: a miss proves absence (no
    false negatives — pruning stays exact), a false positive costs one
    extra file read (rate ≈ (1−e^(−h·n/m))^h; the 16 Kbit / 5-hash
    default holds <1% to ~2k distinct keys per file). The spec persists
    in the commit record, and every maintenance path (upsert, CDC apply,
    delete, compact) rebuilds filters for the files it stages, so
    skipping power survives table maintenance exactly like stats_cols.

    Protocol: (1) CLAIM the staging dir ``v=N`` by atomically creating
    ``v=N/_CLAIM`` (``createNewFile`` — create-no-overwrite); (2) write
    parquet into the claimed dir (append mode, so the claim marker
    survives) and verify ``_SUCCESS``; (3) COMMIT by atomically creating
    the immutable record ``_manifests/N.json``. Readers only follow
    committed records, so a crash at any point before (3) leaves an
    orphan stage readers never saw.

    The commit record carries the version's explicit FILE LIST (relative
    paths + row counts + the dataframe schema), and — when ``stats_cols``
    is given — per-file min/max for those columns. The file list is what
    lets ``snapshot_upsert`` commit a new version that REFERENCES
    untouched files instead of rewriting them (copy-on-write), and the
    stats are what lets ``snapshot_read(where=...)`` and the upsert's
    touched-file selection skip files entirely — at 100 TB the difference
    between a query and a table scan is made at this manifest level,
    before any file is listed or opened (the same job Delta/Iceberg give
    their stats). Cost: one extra Spark job over only the new files.

    Known bound, stated rather than hidden: the manifest is one
    driver-side JSON record — ~100 bytes per file entry, so practical to
    roughly 10⁵ files per version (a ~10 TB version at 128 MB files);
    past that the file list itself needs to become a parquet dataset
    read distributed (Delta's checkpointed _delta_log, Iceberg's
    manifest-list indirection — the same evolution this protocol would
    take).

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
    coordinator provides), exactly as for any log-structured format.

    ``expectations`` (``name -> SQL boolean expression``) gate the commit
    like Delta CHECK constraints: one aggregate scan counts violations of
    every rule together BEFORE anything is staged; any violation raises
    with per-rule counts and nothing is written — a bad batch can never
    become a committed version."""
    spark = df.sparkSession
    if bloom_cols and (
        bloom_bits < 64 or bloom_bits % 64 or bloom_hashes < 1
    ):
        raise ValueError(
            f"bloom_bits must be a positive multiple of 64 and "
            f"bloom_hashes >= 1 (got {bloom_bits}, {bloom_hashes}) — the "
            f"filter packs into 64-bit words, and a ragged width would "
            f"silently drop the trailing bit range"
        )
    if bloom_cols:
        # fail BEFORE staging on an unsupported key type (the builder
        # re-checks, but by then a claim dir exists)
        _bloom_ctypes(df, list(bloom_cols))
    if expectations:
        check_expectations(df, expectations)
    if expected_version is not None and retries:
        raise ValueError(
            "snapshot_write: expected_version and retries are mutually "
            "exclusive — auto-retrying a CAS commit would re-commit the "
            "stale derivation the CAS exists to reject; re-read and "
            "re-derive in the caller instead"
        )
    bloom_spec = (
        {"cols": list(bloom_cols), "m": int(bloom_bits), "h": int(bloom_hashes)}
        if bloom_cols
        else None
    )
    attempts = 1 + max(0, int(retries))
    for attempt in range(attempts):
        if expected_version is not None:
            cur = snapshot_version(spark, table_dir)
            if cur != expected_version:
                raise SnapshotConflictError(
                    f"snapshot_write: table {table_dir} is at version {cur} "
                    f"but the caller derived its write from version "
                    f"{expected_version} — a concurrent writer committed in "
                    f"between; re-read and re-derive"
                )
        vdir = None
        try:
            # persistent CHECK constraints survive a full-replace write
            # (Delta semantics: constraints live on the TABLE until
            # dropped); ``constraints`` adds/declares rules at write time
            # (the fresh-table and deep-clone path). Both sets gate the
            # new rows INSIDE the staging write — no extra pass.
            cur = snapshot_version(spark, table_dir)
            prior_manifest = (
                _read_manifest(spark, table_dir, cur) if cur >= 1 else {}
            )
            prior = prior_manifest.get("constraints")
            cdf = (
                bool(change_files)
                if change_files is not None
                else bool(prior_manifest.get("cdf"))
            )
            effective = {**(prior or {}), **(constraints or {})} or None
            staged_df, c_obs, c_names = (
                _constraint_observation(df, effective)
                if effective
                else (df, None, [])
            )
            version, vdir = _stage_version(staged_df, table_dir)
            if expected_version is not None and version != expected_version + 1:
                raise SnapshotConflictError(
                    f"snapshot_write: staged v={version} but the CAS expects "
                    f"v={expected_version + 1} under {table_dir}"
                )
            if c_obs is not None:
                _enforce_constraints(
                    spark, table_dir, vdir, c_obs, c_names, "snapshot_write"
                )
            entries = _staged_file_entries(spark, table_dir, version, stats_cols)
            _apply_blooms(spark, table_dir, version, entries, bloom_spec)
            payload = {
                "version": version,
                "dir": f"v={version}",
                "files": entries,
                "schema": df.schema.json(),
                "op": _op,
            }
            if effective:
                payload["constraints"] = effective
            if bloom_spec:
                payload["bloom_spec"] = bloom_spec
            if cdf:
                payload["cdf"] = True
                if (
                    _op == "write"
                    and cur >= 1
                    and prior_manifest.get("files") is not None
                ):
                    # a full REPLACE on a cdf table materializes the
                    # NETTED multiset diff of old state vs staged state
                    # (old rows leaving emit as deletes, new rows as
                    # inserts; identical rows cancel via exceptAll, so a
                    # replace that merely re-clusters identical content
                    # nets to an empty feed). Columns follow the NEW
                    # schema: old rows are read under THEIR OWN manifest
                    # schema and projected onto it — added columns
                    # NULL-fill, dropped columns leave the comparison,
                    # and a retyped column try_casts (a replace may
                    # change any type; scanning old files with the new
                    # schema would crash the diff). O(old+new) — the
                    # honest cost of a replace, paid once at write time.
                    old_paths = [
                        _entry_uri(table_dir.rstrip("/"), x["path"])
                        for x in prior_manifest["files"]
                    ]
                    prior_schema = _manifest_schema(prior_manifest)
                    if old_paths and prior_schema is not None:
                        prior_names = {f.name for f in prior_schema.fields}
                        old_live = _apply_dv(
                            spark.read.schema(prior_schema).parquet(*old_paths),
                            _dv_read(spark, table_dir, prior_manifest),
                            _dv_deleted(prior_manifest),
                        ).select(
                            [
                                (
                                    F.col(f.name).try_cast(f.dataType)
                                    if f.name in prior_names
                                    else F.lit(None).cast(f.dataType)
                                ).alias(f.name)
                                for f in df.schema.fields
                            ]
                        )
                    else:
                        old_live = spark.createDataFrame([], df.schema)
                    new_rows = spark.read.schema(df.schema).parquet(vdir)
                    payload["changes"] = _materialize_changes(
                        spark, table_dir, version,
                        old_live.exceptAll(new_rows)
                        .withColumn("_change_type", F.lit("delete"))
                        .unionByName(
                            new_rows.exceptAll(old_live)
                            .withColumn("_change_type", F.lit("insert"))
                        ),
                    )
            if properties:
                payload["properties"] = _props_payload(properties)
            _commit_record(spark, table_dir, version, payload)
            return version
        except SnapshotConflictError:
            # our stage (if we got that far) was never committed — remove
            # the orphan so it can't trip the next claimant's exists-check
            if vdir is not None:
                fs, jvm = _snap_fs(spark, table_dir)
                fs.delete(_snap_path(jvm, vdir), True)
            if attempt + 1 >= attempts or expected_version is not None:
                raise
            import time

            time.sleep(0.05 * (attempt + 1))
    raise AssertionError("unreachable")


def snapshot_append(
    df: DataFrame,
    table_dir: str,
    stats_cols: list[str] | None = None,
    properties: dict | None = None,
    expected_version: int | None = None,
    retries: int = 0,
    evolve_schema: bool = False,
    cluster_by: list[str] | None = None,
    cluster_files: int | None = None,
) -> int:
    """APPEND-ONLY commit: stage ``df``'s rows as new files and commit a
    version that carries every existing file (and the current deletion
    vector) by reference, verbatim. Nothing is rewritten or re-scanned —
    the commit costs O(new rows) regardless of table size, which is the
    ingest shape for event logs and training-data corpora (the
    reference's K1/K2 bulk appends, loader.py:64-116, land here when the
    sink is the lakehouse instead of Postgres). Until now every lakehouse
    write was replace (``snapshot_write``) or keyed merge
    (``snapshot_upsert``/``snapshot_merge``); a plain append needed
    neither keys nor a rewrite and had no API.

    Appends are also the ONLY commit kind the ``snapshotfeed`` streaming
    source tails natively (Delta's exact contract: appended files stream
    as new rows; anything that removes or tombstones rows is a "change
    commit").

    Contract details, all matching the write/upsert family:
    - the batch must match the committed schema; ``evolve_schema=True``
      widens the table with new columns and NULL-fills omitted ones
      (the commit records the merged schema; carried files null-fill
      through the read contract).
    - persistent CHECK constraints gate the NEW rows only (existing rows
      already passed at their own commit time) via one Observation inside
      the staging write — no extra pass.
    - per-file stats (default: the same columns the current manifest
      tracks) and Bloom filters (the table's spec) are built for the new
      files only, so skipping power is uniform across the table.
    - ``expected_version`` is the usual CAS; ``retries`` auto-retries a
      lost staging/commit race — safe for appends even though they are
      not blind writes, because the staged rows do not depend on the
      version they land on. On a table with NO commit yet the first
      append creates it (one atomic v1 commit).
    - ``cluster_by`` range-clusters THIS batch's files on the given
      columns (into ``cluster_files`` files, default one per shuffle
      partition): stats skipping is only as good as the physical
      clustering under it, and an unclustered append gives every new
      file a full-range envelope that later upserts/reads can never
      prune. Clustering is per batch — cheap (one range shuffle over
      the batch, never the table) and exactly what a time-keyed ingest
      needs, since batches arrive roughly time-ordered anyway.
    """
    spark = df.sparkSession
    if expected_version is not None and retries:
        raise ValueError(
            "snapshot_append: expected_version and retries are mutually "
            "exclusive — a CAS loser must re-read before re-deriving"
        )
    attempts = 1 + max(0, int(retries))
    for attempt in range(attempts):
        if expected_version is not None:
            cur0 = snapshot_version(spark, table_dir)
            if cur0 != expected_version:
                raise SnapshotConflictError(
                    f"snapshot_append: table {table_dir} is at version "
                    f"{cur0}, caller expected {expected_version}"
                )
        vdir = None
        try:
            cur = snapshot_version(spark, table_dir)
            if cur < 1:
                # first commit IS table creation (structurally a pure
                # append); no retries inside — a lost race here must fall
                # through to the APPEND path, not a full replace. The CAS
                # pin is MANDATORY: with expected_version=None a writer
                # that fully commits v1 between our version read and
                # snapshot_write's staging would be silently ERASED by
                # this full replace landing as v2. Pinning 0 makes
                # snapshot_write's own CAS/staged-version check raise a
                # retryable SnapshotConflictError instead, and the retry
                # re-reads cur>=1 and takes the append path.
                first = df
                if cluster_by:
                    first = (
                        df.repartitionByRange(cluster_files, *cluster_by)
                        if cluster_files
                        else df.repartitionByRange(*cluster_by)
                    )
                return snapshot_write(
                    first,
                    table_dir,
                    stats_cols=stats_cols,
                    properties=properties,
                    expected_version=0 if expected_version is None else expected_version,
                    _op="append",
                )
            manifest = _read_manifest(spark, table_dir, cur)
            entries = manifest.get("files")
            if entries is None:
                raise ValueError(
                    "snapshot_append needs a file-list manifest — rewrite "
                    "the table once with snapshot_write (v1-era record)"
                )
            tschema = _manifest_schema(manifest)
            table_cols = (
                [f.name for f in tschema.fields]
                if tschema is not None
                else list(df.columns)
            )
            extra = [c for c in df.columns if c not in table_cols]
            missing = [c for c in table_cols if c not in df.columns]
            if (extra or missing) and not evolve_schema:
                raise ValueError(
                    f"snapshot_append: batch columns {sorted(df.columns)} "
                    f"do not match the table schema {sorted(table_cols)} "
                    f"(extra {extra}, missing {missing}) — pass "
                    f"evolve_schema=True to widen / null-fill"
                )
            if tschema is not None:
                # name-only matching would let a type-drifted batch commit
                # under the old manifest schema and poison every later read
                # ("Parquet column cannot be converted") — reject it here
                batch_types = dict(df.dtypes)
                drift = {
                    f.name: (f.dataType.simpleString(), batch_types[f.name])
                    for f in tschema.fields
                    if f.name in batch_types
                    and f.dataType.simpleString() != batch_types[f.name]
                }
                if drift:
                    raise ValueError(
                        f"snapshot_append: batch column types diverge from "
                        f"the table schema (column: (table, batch)): {drift} "
                        f"— cast the batch before appending"
                    )
            appended = df
            if missing and tschema is not None:
                for f in tschema.fields:
                    if f.name in missing:
                        appended = appended.withColumn(
                            f.name, F.lit(None).cast(f.dataType)
                        )
            appended = appended.select(table_cols + extra)
            constraints = manifest.get("constraints")
            staged_df, c_obs, c_names = (
                _constraint_observation(appended, constraints)
                if constraints
                else (appended, None, [])
            )
            cached = None
            if cluster_by:
                if constraints:
                    # repartitionByRange samples its input (a second
                    # evaluation); the persist keeps the violation
                    # counters single-fire
                    cached = staged_df.persist()
                    staged_df = cached
                staged_df = (
                    staged_df.repartitionByRange(cluster_files, *cluster_by)
                    if cluster_files
                    else staged_df.repartitionByRange(*cluster_by)
                )
            try:
                version, vdir = _stage_version(staged_df, table_dir)
            finally:
                if cached is not None:
                    cached.unpersist()
            # unconditional (CAS subsumed): the carried file list came
            # from `cur`'s manifest — a concurrent commit in between
            # would be erased by committing it
            _check_staged_against(
                spark, table_dir, vdir, version, cur, "snapshot_append"
            )
            if c_obs is not None:
                _enforce_constraints(
                    spark, table_dir, vdir, c_obs, c_names, "snapshot_append"
                )
            scols = stats_cols
            if scols is None:
                with_stats = next((e for e in entries if e.get("stats")), None)
                scols = sorted(with_stats["stats"]) if with_stats else None
            new_entries = _staged_file_entries(spark, table_dir, version, scols)
            bloom_spec = manifest.get("bloom_spec")
            _apply_blooms(spark, table_dir, version, new_entries, bloom_spec)
            if extra:
                # evolved columns are NULLABLE by definition — every
                # pre-evolution row reads NULL for them, whatever the
                # batch's own nullability was (F.lit() is non-null)
                from pyspark.sql.types import StructField, StructType

                merged = StructType(
                    [
                        StructField(f.name, f.dataType, True, f.metadata)
                        if f.name in extra
                        else f
                        for f in appended.schema.fields
                    ]
                )
            payload = {
                "version": version,
                "dir": f"v={version}",
                # chronological: carried files first, this batch's last
                "files": entries + new_entries,
                "schema": (
                    merged.json()
                    if extra
                    else manifest.get("schema") or appended.schema.json()
                ),
                "op": "append",
            }
            if constraints:
                payload["constraints"] = constraints
            if manifest.get("dv"):
                # untouched files keep their deletion-vector entries; the
                # new files have none by construction
                payload["dv"] = manifest["dv"]
            if bloom_spec:
                payload["bloom_spec"] = bloom_spec
            if manifest.get("cdf"):
                payload["cdf"] = True
            props = _merge_txn(manifest, properties)
            if props:
                payload["properties"] = _props_payload(props)
            _commit_record(spark, table_dir, version, payload)
            return version
        except SnapshotConflictError:
            if vdir is not None:
                fs, jvm = _snap_fs(spark, table_dir)
                fs.delete(_snap_path(jvm, vdir), True)
            if attempt + 1 >= attempts or expected_version is not None:
                raise
            import time

            time.sleep(0.05 * (attempt + 1))
    raise AssertionError("unreachable")


def snapshot_properties(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> dict:
    """The ``properties`` dict a version was committed with (empty dict
    if none) — the read side of the exactly-once consumer pattern."""
    v = version if version is not None else snapshot_version(spark, table_dir)
    if v < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    return _read_manifest(spark, table_dir, v).get("properties") or {}


_WHERE_OPS = ("=", "<", "<=", ">", ">=", "in", "is_null", "is_not_null")


def _entry_all_match(entry: dict, where: list[tuple]) -> bool:
    """True when the file's stats PROVE every live row satisfies the
    conjunction — the inverse of ``_entry_prunable``: then the file's
    manifest row count IS its contribution to a filtered COUNT, no scan.
    NULL rows fail every comparison, so any nulls in a compared column
    disprove all-match. Missing stats, unknown ops, or incomparable
    types never prove (safe fallback: the file gets scanned)."""
    stats = entry.get("stats") or {}
    rows = entry.get("rows", 0)
    if rows <= 0:
        return False
    for col, op, val in where:
        s = stats.get(col)
        if s is None:
            return False
        mn, mx, nulls = s.get("min"), s.get("max"), s.get("nulls")
        if op == "is_null":
            if not (nulls is not None and nulls == rows):
                return False
            continue
        if op == "is_not_null":
            if nulls != 0:
                return False
            continue
        if op == "in":
            # provable only in the constant-file case: every row equals
            # the single enveloped value and that value is in the list
            if (
                nulls == 0
                and isinstance(val, (list, tuple))
                and any(
                    v is not None
                    and _stats_comparable(mn, _json_safe(v))
                    and mn == mx == _json_safe(v)
                    for v in val
                )
            ):
                continue
            return False
        if (
            nulls != 0
            or mn is None
            or mx is None
            or not _stats_comparable(mn, val)
            or not _stats_comparable(mx, val)
        ):
            return False
        if op == "=" and not (mn == val and mx == val):
            return False
        if op == "<" and not (mx < val):
            return False
        if op == "<=" and not (mx <= val):
            return False
        if op == ">" and not (mn > val):
            return False
        if op == ">=" and not (mn >= val):
            return False
        if op not in _WHERE_OPS:
            return False
    return True


_TS_OFFSET_SUFFIX = None  # compiled lazily (module import stays light)


def _tz_suffix_mixed(a: str, b: str) -> bool:
    """True when exactly ONE of two strings carries an ISO-8601 UTC-offset
    suffix (``Z`` / ``±HH:MM``): an offset-bearing timestamp string orders
    lexicographically ABOVE its naive twin at the same instant
    (``'…+00:00' > '…'``), so pruning on a mixed pair would silently drop
    matching files at equality boundaries. Mixed pairs are simply not
    comparable — less pruning, never a wrong result."""
    global _TS_OFFSET_SUFFIX
    if _TS_OFFSET_SUFFIX is None:
        import re as _re

        _TS_OFFSET_SUFFIX = _re.compile(r"(?:Z|[+-]\d{2}:\d{2})$")
    return bool(_TS_OFFSET_SUFFIX.search(a)) != bool(_TS_OFFSET_SUFFIX.search(b))


def _stats_comparable(a, b) -> bool:
    """Only prune when the stats value and the literal share a total
    order we can evaluate driver-side: both numeric (bool excluded —
    Python would happily order True against 1) or both strings — and for
    strings, both in the same timestamp frame (naive vs offset-suffixed
    ISO strings do NOT order consistently; see ``_tz_suffix_mixed``)."""
    num = (int, float)
    if isinstance(a, bool) or isinstance(b, bool):
        return False
    if isinstance(a, num) and isinstance(b, num):
        return True
    if isinstance(a, str) and isinstance(b, str):
        return not _tz_suffix_mixed(a, b)
    return False


def _bloom_positions(value, m: int, h: int) -> list[int]:
    """The ``h`` bit positions a value sets in an ``m``-bit file Bloom
    filter: ``md5(str(value) + '|' + str(j))`` first 13 hex chars mod m —
    deliberately derivable in pure Python AND pure Catalyst (conv/
    substring/md5), so the filter is built executor-side by Spark and
    probed driver-side with no JVM round-trip."""
    import hashlib

    return [
        int(hashlib.md5(f"{value}|{j}".encode()).hexdigest()[:13], 16) % m
        for j in range(h)
    ]


def _bloom_probe_safe(bloom: dict, value) -> bool:
    """Only probe when the Python literal's stringification provably
    matches the Spark-side CAST(col AS STRING) the filter was built
    from — the Bloom analogue of ``_stats_comparable``. The spec records
    the column's type class at build time: ``string`` probes accept str
    literals only, ``integral`` probes accept non-bool ints only. A
    cross-typed literal (float vs int, bool, int against a string
    column) silently stringifies differently on the two sides, and a
    mismatched probe is a FALSE NEGATIVE — wrong empty reads — so those
    fall through to the stats/residual path instead."""
    ctype = bloom.get("ctype")
    if ctype == "string":
        return isinstance(value, str)
    if ctype == "integral":
        return isinstance(value, int) and not isinstance(value, bool)
    return False  # unknown/legacy spec: never prune on it


def _bloom_might_contain(bloom: dict, value) -> bool:
    """Driver-side probe of a manifest Bloom entry (``words`` are the
    filter's 64-bit words as Spark signed longs; Python's arbitrary-
    precision two's complement makes ``(w >> k) & 1`` read the raw bit
    correctly for negative words)."""
    words, m, h = bloom["words"], bloom["m"], bloom["h"]
    for p in _bloom_positions(value, m, h):
        if not (words[p // 64] >> (p % 64)) & 1:
            return False
    return True


def _entry_prunable(entry: dict, where: list[tuple]) -> bool:
    """True when the file's [min,max] envelope PROVES no row can satisfy
    the conjunction. All-null stats (min and max both null) prune under
    any comparison — SQL comparisons against NULL are never true. Missing
    stats, unknown ops, or incomparable types never prune (safe
    fallback: the residual filter still runs on every surviving row).

    Point predicates additionally probe the file's Bloom filter when the
    manifest carries one for the column (``snapshot_write(bloom_cols=…)``)
    — the skipping lever for hash-distributed keys, whose min/max
    envelope spans everything and prunes nothing. A Bloom miss is a
    PROOF of absence (no false negatives), so pruning stays exact; a
    false positive merely reads one extra file."""
    blooms = entry.get("bloom") or {}
    stats = entry.get("stats") or {}
    for col, op, raw in where:
        if op == "=" and col in blooms and raw is not None:
            if _bloom_probe_safe(blooms[col], raw) and not _bloom_might_contain(
                blooms[col], raw
            ):
                return True
        if op == "in":
            # prunable only when EVERY element is provably absent from the
            # file — a Bloom miss is a proof, landing outside the [min,max]
            # envelope is a proof; one possible element keeps the file.
            # NULL elements match no row (SQL IN), so they never block the
            # proof. The multi-key point-lookup skipping lever: read K keys
            # from a hash-distributed table and open only files whose Bloom
            # might hold one.
            if not isinstance(raw, (list, tuple)) or not raw:
                continue  # malformed/empty: the exact filter decides
            bl = blooms.get(col)
            s_in = stats.get(col)
            mn_i = s_in.get("min") if s_in else None
            mx_i = s_in.get("max") if s_in else None
            if s_in and mn_i is None and mx_i is None and entry.get("rows", 0) > 0:
                return True  # all-null column: IN never evaluates true

            def _absent(v) -> bool:
                if bl is not None and _bloom_probe_safe(
                    bl, v
                ) and not _bloom_might_contain(bl, v):
                    return True
                sv = _json_safe(v)
                return (
                    mn_i is not None
                    and mx_i is not None
                    and _stats_comparable(mn_i, sv)
                    and _stats_comparable(mx_i, sv)
                    and (sv < mn_i or sv > mx_i)
                )

            if all(v is None or _absent(v) for v in raw):
                return True
            continue
        s = stats.get(col)
        if s is None or op not in _WHERE_OPS:
            continue
        # stats were stored through _json_safe (timestamps/dates as
        # ISO-8601 strings whose lexicographic order IS chronological);
        # a datetime/date literal must compare in the same canonical form
        val = _json_safe(raw)
        mn, mx = s.get("min"), s.get("max")
        nulls = s.get("nulls")  # absent on pre-r9 manifests: never prunes
        if op == "is_null":
            if nulls == 0 and entry.get("rows", 0) > 0:
                return True
            continue
        if op == "is_not_null":
            if nulls is not None and nulls == entry.get("rows", -1) and nulls > 0:
                return True
            continue
        if mn is None and mx is None and entry.get("rows", 0) > 0:
            return True
        # BOTH bounds must be comparable with the literal: one writer's
        # canonicalization keeps min/max in one form today, but the
        # prune-proof must be locally sound against any future mixed-form
        # manifest (a tz-suffixed max beside a naive min would otherwise
        # be compared lexicographically-wrong below)
        if (
            mn is None
            or mx is None
            or not _stats_comparable(mn, val)
            or not _stats_comparable(mx, val)
        ):
            continue
        if op == "=" and (val < mn or val > mx):
            return True
        if op == "<" and not (mn < val):
            return True
        if op == "<=" and not (mn <= val):
            return True
        if op == ">" and not (mx > val):
            return True
        if op == ">=" and not (mx >= val):
            return True
    return False


def _where_expr(where: list[tuple], qualify: str | None = None):
    """The same conjunction as a real Column predicate — applied to the
    surviving files so the result is exact regardless of how much the
    manifest level could prune (pruning is a superset guarantee, the
    filter is the semantics). ``qualify`` prefixes column references
    with a dataframe alias (``"t"`` → ``t.col``) so the predicate
    resolves unambiguously inside a join."""
    import operator as _op

    def _c(col: str):
        return F.col(f"{qualify}.{col}") if qualify else F.col(col)

    ops = {"=": _op.eq, "<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge}
    expr = F.lit(True)
    for col, op, val in where:
        if op == "is_null":
            expr = expr & _c(col).isNull()
        elif op == "is_not_null":
            expr = expr & _c(col).isNotNull()
        elif op == "in":
            if not isinstance(val, (list, tuple)) or not val:
                raise ValueError(
                    f"snapshot_read: where op 'in' needs a non-empty list "
                    f"of values (got {val!r})"
                )
            expr = expr & _c(col).isin(list(val))
        elif op not in ops:
            raise ValueError(f"snapshot_read: unsupported where op {op!r} (use one of {_WHERE_OPS})")
        else:
            expr = expr & ops[op](_c(col), F.lit(val))
    return expr


# Deletion vectors (merge-on-read deletes, the Delta DV shape): a version
# may carry a small (path, pos) parquet dataset of DELETED row positions —
# ``path`` is the data file's table-relative path ("v=K/part-….parquet"),
# ``pos`` its parquet row index (``_metadata.row_index``). A DV delete
# commits in O(matching rows) without rewriting ANY data file — the lever
# for scattered right-to-erasure deletes on a 100 TB table, where
# copy-on-write would rewrite a 128 MB file per tombstoned row. Readers
# subtract positions with one broadcast anti-join; every physical rewrite
# (compact, optimize, upsert-touched files) PURGES its files' entries, so
# DVs never accumulate past maintenance. Mass deletes should stay
# copy-on-write (mode="cow"): a DV grows with the deleted-row count.
_DV_RELPATH_RE = r"(v=\d+/[^/]+)$"


def _entry_uri(base: str, path: str) -> str:
    """Resolve a manifest entry path: relative entries live under the
    table dir; absolute entries (URI or /-rooted — how a SHALLOW CLONE
    references its source's files) pass through untouched."""
    return path if "://" in path or path.startswith("/") else f"{base}/{path}"


def _dv_key(entry_path: str) -> str:
    """A manifest entry path's deletion-vector key: the last two path
    segments ("v=K/part-….parquet") — the same normalization
    ``_apply_dv`` extracts from ``_metadata.file_path``, so it matches
    whether the entry is table-relative or absolute (shallow clones)."""
    return "/".join(entry_path.rstrip("/").split("/")[-2:])


def _dv_deleted(manifest: dict) -> int | None:
    """The manifest's total deleted-position count (None when the version
    carries no deletion vector) — the broadcast-gate input."""
    dv = manifest.get("dv")
    return dv.get("deleted") if dv else None


def _dv_read(spark: SparkSession, table_dir: str, manifest: dict) -> DataFrame | None:
    """The (path, pos) deleted-positions dataset of a committed version,
    or None when the version carries no deletion vector."""
    dv = manifest.get("dv")
    if not dv:
        return None
    return spark.read.schema("path string, pos long").parquet(
        _entry_uri(table_dir.rstrip("/"), dv["dir"])
    )


# Broadcasting the deletion vector is right only while it is small (the
# scattered right-to-erasure shape). A mass DV delete makes the position
# table a real dataset that grows with the deleted-row count; forcing it
# through a broadcast would ship every position to every task and OOM the
# driver/executors at exactly the scale merge-on-read targets. The manifest
# carries the exact total (``dv.deleted``), so readers gate on it: at or
# below this many positions the DV broadcasts, above it the subtraction
# runs as a plain (shuffled) anti-join. Tests may lower this to force the
# large path on small fixtures.
DV_BROADCAST_MAX_POSITIONS = 1_000_000


def _dv_side(dvdf: DataFrame, deleted: int | None) -> DataFrame:
    """The DV join side under the broadcast gate: ``deleted`` is the
    manifest's position count (None = unknown → broadcast, the pre-gate
    behavior every in-package caller avoids by passing the manifest
    total)."""
    dv = dvdf.select(F.col("path").alias("__dv_path"), F.col("pos").alias("__dv_pos"))
    if deleted is not None and deleted > DV_BROADCAST_MAX_POSITIONS:
        return dv
    return F.broadcast(dv)


def _apply_dv(
    df: DataFrame, dvdf: DataFrame | None, deleted: int | None = None
) -> DataFrame:
    """Subtract deleted positions from a parquet scan: one anti-join on
    (relative path, row index) — broadcast while the DV is small, plain
    shuffle above ``DV_BROADCAST_MAX_POSITIONS`` (pass the manifest's
    ``dv.deleted`` as ``deleted``). The scan must come straight from
    ``spark.read.parquet`` so ``_metadata`` is still addressable."""
    if dvdf is None:
        return df
    marked = df.withColumn(
        "__dv_path", F.regexp_extract(F.col("_metadata.file_path"), _DV_RELPATH_RE, 1)
    ).withColumn("__dv_pos", F.col("_metadata.row_index"))
    return marked.join(
        _dv_side(dvdf, deleted),
        ["__dv_path", "__dv_pos"],
        "left_anti",
    ).drop("__dv_path", "__dv_pos")


def _write_dv(
    spark: SparkSession, table_dir: str, version: int, dvdf: DataFrame | None
) -> dict | None:
    """Persist a deletion-vector dataset under the (already-claimed)
    ``v=N/_dv`` and return its manifest block — per-file deleted counts
    (bounded by the FILE count, the same driver-state bound as the file
    list itself) plus the total. None/empty → no block."""
    if dvdf is None:
        return None
    counts = {
        r["path"]: r["cnt"]
        for r in dvdf.groupBy("path").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    if not counts:
        return None
    rel = f"v={version}/_dv"
    dvdf.coalesce(1).write.mode("append").parquet(f"{table_dir.rstrip('/')}/{rel}")
    return {"dir": rel, "files": counts, "deleted": int(sum(counts.values()))}


def snapshot_read(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    where: list[tuple] | None = None,
    as_of_ts: float | None = None,
) -> DataFrame:
    """Read the latest committed snapshot, or time-travel to ``version``
    (or to the version committed at-or-before unix time ``as_of_ts`` —
    Delta's TIMESTAMP AS OF; mutually exclusive with ``version``).

    ``where`` is a conjunction of ``(column, op, literal)`` triples
    (ops ``= < <= > >= in is_null is_not_null``; ``in`` takes a non-empty
    list and prunes a file only when EVERY element is provably absent —
    Bloom miss or outside the envelope — the multi-key point-lookup
    skipping lever). It is applied twice, at two different costs:
    once DRIVER-SIDE against the manifest's per-file min/max — files whose
    envelope cannot contain a match are never listed, opened, or scanned
    (manifest-level data skipping, the 100 TB lever) — and once as a real
    pushed-down filter on the surviving files, so the result is exactly
    the filtered table even when stats are absent. Date/timestamp columns
    store ISO-8601 string stats; pass the literal in the same form."""
    from pyspark.errors import AnalysisException

    fs, jvm = _snap_fs(spark, table_dir)
    if as_of_ts is not None:
        if version is not None:
            raise ValueError("snapshot_read: pass version OR as_of_ts, not both")
        version = snapshot_version_asof(spark, table_dir, as_of_ts)
    v = version if version is not None else snapshot_version(spark, table_dir)
    if v < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _read_manifest(spark, table_dir, v)
    entries = manifest.get("files")
    if entries is None:
        # v1 record (no file list): whole-directory read, filter only
        vdir = f"{table_dir.rstrip('/')}/v={v}"
        if not fs.exists(_snap_path(jvm, vdir, "_SUCCESS")):
            raise FileNotFoundError(f"snapshot version {v} not found in {table_dir}")
        df = spark.read.parquet(vdir)
        return df.where(_where_expr(where)) if where else df
    if where:
        entries = [e for e in entries if not _entry_prunable(e, where)]
    if not entries:
        empty = spark.createDataFrame([], _manifest_schema(manifest))
        return empty.where(_where_expr(where)) if where else empty
    base = table_dir.rstrip("/")
    try:
        df = _manifest_reader(spark, manifest).parquet(
            *[_entry_uri(base, e["path"]) for e in entries]
        )
    except AnalysisException as e:
        raise FileNotFoundError(
            f"snapshot version {v} in {table_dir} references missing data "
            f"files (vacuumed?): {e}"
        ) from e
    df = _apply_dv(df, _dv_read(spark, table_dir, manifest), _dv_deleted(manifest))
    return df.where(_where_expr(where)) if where else df


def snapshot_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key: str | list[str],
    stats_cols: list[str] | None = None,
    cluster_files: int | None = None,
    merge_mode: str = "replace",
    evolve_schema: bool = False,
    expectations: dict[str, str] | None = None,
    properties: dict | None = None,
    expected_version: int | None = None,
) -> int:
    """Copy-on-write last-write-wins upsert committed as a new version.
    ``properties`` / ``expected_version`` behave as on ``snapshot_write``
    (exactly-once stamp committed atomically with the data; CAS against
    the version the batch was derived from).

    ``expectations`` gate the commit exactly as on ``snapshot_write``:
    every rule is checked against the INCOMING batch (one aggregate
    scan, before anything stages or any touched file is read) — survivor
    rows already passed the gate when their own version committed, so
    re-checking the table would be O(table) for nothing.

    ``evolve_schema=True`` accepts a batch whose columns differ from the
    committed schema: new columns are ADDED to the table (rows in carried
    files read them as NULL — the manifest schema is the read contract,
    so old files are never rewritten), and columns the batch omits are
    null-filled on the batch side. Without it a column mismatch raises —
    a typo'd batch must never silently drop a table column.

    ``merge_mode="replace"`` (default) replaces the whole matched row —
    the reference's K4 shape. ``"coalesce"`` merges column-wise: a NULL
    in the update keeps the stored value (K5, ``COALESCE(EXCLUDED.c,
    t.c)`` — the partial-update semantics the reference's lap merge
    uses); cost is one extra equi-join on rows of the touched files only.

    The Delta-MERGE cost model, not the full-rewrite one: files whose
    ``key`` min/max envelope cannot contain any update key are CARRIED
    into the new version's manifest by reference — their bytes are never
    read, rewritten, or moved, and their stats entries come along
    verbatim. Only files that might hold a matching key are read,
    anti-joined against the update keys, and re-staged together with the
    updates. On a 100 TB table a keyed CDC batch therefore costs
    O(touched files + updates), not O(table).

    Touched-file selection is itself a Spark job — the (KB-scale) manifest
    envelope table broadcast against the DISTINCT update keys — so update
    batches of any size never round-trip through the driver.

    Requires the current version to carry ``key`` stats (write with
    ``stats_cols=[key, ...]``); raises otherwise instead of silently
    degrading to a full rewrite. Update keys must be unique and non-null
    (last-write-wins needs an order *within* the batch that the caller
    must resolve first — ``merge.cdc_apply`` is the changelog-folding
    twin). ``stats_cols`` defaults to the columns the current manifest
    tracks, so skipping power survives round after round of upserts.

    ``key`` may be a LIST of columns (composite key): the touched-file
    envelope intersects every key column's [min,max] (per-column
    conjunction — the multi-column pruning Delta/Iceberg stats give),
    uniqueness/non-null applies to the tuple, and clustering ranges over
    the columns in order. Everything below reads "key" as "key tuple".

    ``cluster_files`` range-partitions the staged (rewritten) rows by
    ``key`` into that many files. Without it the staged files inherit
    whatever layout the update batch arrived in — after a hash shuffle
    that means every file's key envelope spans the whole range and
    NOTHING can be skipped next round. Min/max skipping is only as good
    as the physical clustering under it (the reason Delta/Iceberg pair
    stats with clustering); any table maintained by repeated upserts
    should cluster."""
    if expectations:
        check_expectations(updates, expectations)
    keys = [key] if isinstance(key, str) else list(key)
    delete_keys = updates.select(*keys).limit(0)
    return _merge_into_snapshot(
        spark, table_dir, updates, delete_keys, key, stats_cols, cluster_files,
        what="snapshot_upsert", merge_mode=merge_mode, evolve_schema=evolve_schema,
        properties=properties, expected_version=expected_version,
    )


def snapshot_apply_cdc(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    key: str | list[str],
    op_col: str = "op",
    delete_ops: tuple[str, ...] = ("D", "d", "delete"),
    stats_cols: list[str] | None = None,
    cluster_files: int | None = None,
    evolve_schema: bool = False,
    expectations: dict[str, str] | None = None,
    properties: dict | None = None,
    expected_version: int | None = None,
) -> int:
    """Apply a FOLDED changelog (one row per key: its final upsert state
    or a delete tombstone) to the table in ONE copy-on-write commit —
    the Debezium→lakehouse shape. Rows whose ``op_col`` is in
    ``delete_ops`` remove their key; every other row upserts
    last-write-wins (the op column itself is not stored). Folding a raw
    I/U/D log down to one row per key is the caller's step —
    ``merge.cdc_apply`` for batch logs, or the per-batch ``max_by`` fold
    the streaming maintainer does; this function then applies upserts
    AND deletes against one shared touched-file set, so a mixed batch
    still costs O(touched files + batch), never two table passes."""
    # NULL op must not make a row vanish from BOTH sides (isin is NULL on
    # NULL input): anything not provably a delete is an upsert
    is_delete = F.coalesce(F.col(op_col).isin(*delete_ops), F.lit(False))
    ups = changes.where(~is_delete).drop(op_col)
    if expectations:
        # gate the UPSERT rows only: a delete tombstone carries no
        # payload for a CHECK constraint to hold over
        check_expectations(ups, expectations)
    keys = [key] if isinstance(key, str) else list(key)
    delete_keys = changes.where(is_delete).select(*keys)
    return _merge_into_snapshot(
        spark, table_dir, ups, delete_keys, key, stats_cols, cluster_files,
        what="snapshot_apply_cdc", evolve_schema=evolve_schema,
        properties=properties, expected_version=expected_version,
    )


def _merge_into_snapshot(
    spark: SparkSession,
    table_dir: str,
    upserts: DataFrame,
    delete_keys: DataFrame,
    key: str | list[str],
    stats_cols: list[str] | None,
    cluster_files: int | None,
    what: str,
    merge_mode: str = "replace",
    evolve_schema: bool = False,
    properties: dict | None = None,
    expected_version: int | None = None,
) -> int:
    """Shared copy-on-write merge core for ``snapshot_upsert`` (no
    deletes) and ``snapshot_apply_cdc`` (upserts + tombstones): one
    envelope join selects the files any change key could live in; those
    files' rows are anti-joined against ALL change keys and re-staged
    together with the upserts; everything else is carried by reference."""
    keys = [key] if isinstance(key, str) else list(key)
    current = snapshot_version(spark, table_dir)
    if current < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    if expected_version is not None and current != expected_version:
        raise SnapshotConflictError(
            f"{what}: table {table_dir} is at version {current} but the "
            f"change batch was derived from version {expected_version} — "
            f"a concurrent writer committed in between; re-read and re-derive"
        )
    manifest = _read_manifest(spark, table_dir, current)
    entries = manifest.get("files")
    if entries is None or any(
        "stats" not in e or any(k not in e["stats"] for k in keys)
        for e in entries
        if e.get("rows", 0) > 0
    ):
        raise ValueError(
            f"{what} needs per-file stats for {keys!r} in the current "
            f"manifest — rewrite the table once with "
            f"snapshot_write(df, table_dir, stats_cols={keys!r} + ...)"
        )
    if stats_cols is None:
        with_stats = next((e for e in entries if e.get("stats")), None)
        stats_cols = sorted(with_stats["stats"]) if with_stats else list(keys)

    all_keys = upserts.select(*keys).unionByName(delete_keys.select(*keys))
    touched = _probe_merge_batch(spark, entries, keys, all_keys, what)
    carried = [e for e in entries if e["path"] not in touched]

    if merge_mode not in ("replace", "coalesce"):
        raise ValueError(f"{what}: unknown merge_mode {merge_mode!r}")
    # column reconciliation against the committed table schema: a batch
    # with extra columns EVOLVES the schema (old rows read as NULL) and a
    # batch with missing columns null-fills them — both only under
    # evolve_schema=True; otherwise mismatches raise instead of silently
    # dropping table columns from the rewritten files
    tschema = _manifest_schema(manifest)
    table_cols = [f.name for f in tschema.fields] if tschema else upserts.columns
    extra = [c for c in upserts.columns if c not in table_cols]
    missing = [c for c in table_cols if c not in upserts.columns]
    if (extra or missing) and not evolve_schema:
        raise ValueError(
            f"{what}: change batch columns {sorted(upserts.columns)} do not "
            f"match the table schema {sorted(table_cols)} "
            f"(extra {extra}, missing {missing}) — pass evolve_schema=True "
            f"to add new columns / null-fill omitted ones"
        )
    if missing and tschema is not None:
        for f in tschema.fields:
            if f.name in missing:
                upserts = upserts.withColumn(f.name, F.lit(None).cast(f.dataType))
    cols = table_cols + extra
    upserts = upserts.select(cols)
    base = table_dir.rstrip("/")
    old_dv = _dv_read(spark, table_dir, manifest)
    if touched:
        # read survivors with the COMMITTED schema (carried files cannot
        # hold evolved columns), then null-fill any newly added columns;
        # deletion-vectored rows must not resurrect through the rewrite
        existing = _apply_dv(
            _manifest_reader(spark, manifest).parquet(
                *[_entry_uri(base, p) for p in sorted(touched)]
            ),
            old_dv,
            _dv_deleted(manifest),
        )
        for c in extra:
            existing = existing.withColumn(
                c, F.lit(None).cast(upserts.schema[c].dataType)
            )
        survivors = existing.select(cols).join(all_keys, keys, "left_anti")
        if merge_mode == "coalesce":
            # column-wise K5 merge: matched rows keep stored values where
            # the update is NULL; update keys absent from the touched
            # files are pure inserts (the envelopes prove they exist
            # nowhere else)
            val_cols = [c for c in cols if c not in keys]
            renamed = upserts.select(
                *keys, *[F.col(c).alias(f"__new_{c}") for c in val_cols]
            )
            matched = (
                existing.select(cols)
                .join(renamed, keys)
                .select(
                    *keys,
                    *[
                        F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
                        for c in val_cols
                    ],
                )
                .select(cols)
            )
            inserts = upserts.join(
                existing.select(*keys), keys, "left_anti"
            )
            staged_df = survivors.unionByName(matched).unionByName(inserts)
        else:
            staged_df = survivors.unionByName(upserts)
    elif upserts.isEmpty():
        return current  # pure delete of absent keys: nothing to commit
    else:
        staged_df = upserts
    constraints = manifest.get("constraints")
    c_obs, c_names = None, []
    if constraints:
        staged_df, c_obs, c_names = _constraint_observation(staged_df, constraints)
    cached = None
    if cluster_files:
        if constraints:
            # repartitionByRange samples its input (a second evaluation);
            # the persist keeps the violation counters single-fire
            cached = staged_df.persist()
            staged_df = cached
        staged_df = staged_df.repartitionByRange(cluster_files, *keys)
    try:
        version, vdir = _stage_version(staged_df, table_dir)
    finally:
        if cached is not None:
            cached.unpersist()
    _check_staged_against(spark, table_dir, vdir, version, current, what)
    if c_obs is not None:
        _enforce_constraints(spark, table_dir, vdir, c_obs, c_names, what)
    new_entries = _staged_file_entries(spark, table_dir, version, stats_cols) + carried
    bloom_spec = manifest.get("bloom_spec")
    _apply_blooms(spark, table_dir, version, new_entries, bloom_spec)
    payload = {
        "version": version,
        "dir": f"v={version}",
        "files": new_entries,
        "op": {"snapshot_upsert": "upsert", "snapshot_apply_cdc": "cdc"}.get(
            what, what
        ),
    }
    # touched files were rewritten with their deletion vectors applied,
    # so their DV entries are purged; carried files' entries ride along
    # (matched on the DV two-segment key — entry paths may be absolute)
    if old_dv is not None:
        carried_keys = sorted({_dv_key(e["path"]) for e in carried})
        dv_block = _write_dv(
            spark, table_dir, version,
            old_dv.where(F.col("path").isin(carried_keys)) if carried_keys else None,
        )
        if dv_block:
            payload["dv"] = dv_block
    payload.update({
        # an evolved batch commits the MERGED schema (readers
        # null-fill carried files); otherwise the committed schema
        # is carried forward unchanged
        "schema": (
            staged_df.schema.json()
            if extra
            else manifest.get("schema") or staged_df.schema.json()
        ),
    })
    if constraints:
        payload["constraints"] = constraints
    props = _merge_txn(manifest, properties)
    if props:
        payload["properties"] = _props_payload(props)
    if bloom_spec:
        payload["bloom_spec"] = bloom_spec
    if manifest.get("cdf"):
        payload["cdf"] = True
        if touched:
            # materialize this rewrite's CDC rows so changeFeed consumers
            # replay it instead of refusing: old = the touched files'
            # live rows (already DV-applied above), new = the staged
            # files just written — the diff never scans carried files
            # explicit schema: a rewrite that deletes every touched
            # row stages ZERO data files, and schema inference over an
            # empty dir would fail
            payload["changes"] = _write_change_files(
                spark, table_dir, version,
                existing.select(cols),
                spark.read.schema(staged_df.schema).parquet(vdir).select(cols),
                keys, cols,
            )
    _commit_record(spark, table_dir, version, payload)
    return version


def snapshot_merge(
    spark: SparkSession,
    table_dir: str,
    source: DataFrame,
    key: str | list[str],
    when_matched: str | None = "update",
    matched_condition: str | None = None,
    update_set: dict[str, str] | None = None,
    when_not_matched: str | None = "insert",
    not_matched_condition: str | None = None,
    when_not_matched_by_source: str | None = None,
    not_matched_by_source_condition: str | list[tuple] | None = None,
    stats_cols: list[str] | None = None,
    cluster_files: int | None = None,
    properties: dict | None = None,
    expected_version: int | None = None,
    evolve_schema: bool = False,
) -> tuple[int, dict]:
    """Full tri-clause MERGE INTO (the Delta/ANSI shape), one
    copy-on-write commit; returns ``(version, metrics)`` with metrics
    ``{"updated", "deleted", "inserted", "copied"}``.

    ``evolve_schema=True`` accepts source columns the table lacks
    (Delta's ``withSchemaEvolution``): they are ADDED to the committed
    schema — rows in carried files read them as NULL through the
    manifest read contract, no carried file is rewritten — and flow into
    inserted/updated rows; without it an extra source column raises.

    Clauses (each optional, each with an optional SQL condition over the
    aliases ``s`` = source row, ``t`` = target row):

    - ``when_matched="update"`` rewrites the matched target row.
      ``update_set`` maps column → SQL expression (``{"val": "t.val +
      s.delta"}``); unmentioned columns keep their target value. Default
      (None) = replace every column from the source (``UPDATE SET *``).
      ``when_matched="delete"`` removes the matched row instead
      (condition-gated, like ``WHEN MATCHED AND cond THEN DELETE``);
      ``None`` carries matched rows unchanged.
    - ``when_not_matched="insert"`` inserts source rows with no match
      (``INSERT *``; table columns the source lacks are null-filled).
    - ``when_not_matched_by_source="delete"`` removes target rows with
      no source match — the full-sync clause (``WHEN NOT MATCHED BY
      SOURCE THEN DELETE``). With a free-form SQL condition (or none)
      this clause forces EVERY data file into the rewrite (any file may
      hold an unmatched row); without the clause the merge keeps the
      upsert cost model — only envelope-touched files rewrite,
      everything else carries by reference, O(touched files + source).
      Pass ``not_matched_by_source_condition`` as WHERE-TRIPLES (the
      ``snapshot_read(where=...)`` format, e.g. ``[("ts", "<",
      cutoff)]``) and the clause is additionally PRUNED at the manifest
      level: files whose stats envelope proves no row satisfies the
      condition are carried, not rewritten — the "delete stale rows not
      in today's feed" pattern then costs O(stale files + touched
      files), not O(table).

    ``key`` may be a LIST of columns (composite equality merge — ``ON
    t.k1 = s.k1 AND t.k2 = s.k2``): envelope pruning intersects every
    key column's [min,max], and the cardinality rule applies to the
    tuple.

    Mechanics shared with the upsert core: one full-outer join on the
    touched files' live rows (deletion vectors applied — DV'd rows can
    neither match nor resurrect), row counts observed inside the staging
    write (``Observation`` — no second pass), rewritten files' DV entries
    purged / carried files' entries ride along, ``expected_version`` CAS
    and ``properties`` stamp as on ``snapshot_write``. Duplicate or NULL
    source keys raise (a target row must match at most one source row —
    the ANSI MERGE cardinality rule).

    Re-expresses (and generalizes) the reference's ON CONFLICT upsert
    loaders (reference loader.py:165-193, supabase_loader.py:140-172) as
    a declarative lakehouse commit."""
    from pyspark.sql import Observation

    if when_matched not in ("update", "delete", None):
        raise ValueError(f"snapshot_merge: when_matched={when_matched!r}")
    if when_not_matched not in ("insert", None):
        raise ValueError(f"snapshot_merge: when_not_matched={when_not_matched!r}")
    if when_not_matched_by_source not in ("delete", None):
        raise ValueError(
            f"snapshot_merge: when_not_matched_by_source="
            f"{when_not_matched_by_source!r}"
        )
    current = snapshot_version(spark, table_dir)
    if current < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    if expected_version is not None and current != expected_version:
        raise SnapshotConflictError(
            f"snapshot_merge: table {table_dir} is at version {current}, "
            f"caller expected {expected_version}"
        )
    keys = [key] if isinstance(key, str) else list(key)
    manifest = _read_manifest(spark, table_dir, current)
    entries = manifest.get("files")
    if entries is None or any(
        "stats" not in e or any(k not in e["stats"] for k in keys)
        for e in entries
        if e.get("rows", 0) > 0
    ):
        raise ValueError(
            f"snapshot_merge needs per-file stats for {keys!r} in the "
            f"current manifest — rewrite the table once with "
            f"snapshot_write(df, table_dir, stats_cols={keys!r} + ...)"
        )
    if stats_cols is None:
        with_stats = next((e for e in entries if e.get("stats")), None)
        stats_cols = sorted(with_stats["stats"]) if with_stats else list(keys)
    tschema = _manifest_schema(manifest)
    cols = [f.name for f in tschema.fields]
    extra = [c for c in source.columns if c not in cols]
    if any(k not in source.columns for k in keys) or (extra and not evolve_schema):
        raise ValueError(
            f"snapshot_merge: source columns {sorted(source.columns)} must "
            f"be a subset of the table schema {sorted(cols)} and include "
            f"{keys!r} (extra: {extra}) — pass evolve_schema=True to add "
            f"new columns"
        )
    cols = cols + extra

    nbs_triples = (
        not_matched_by_source_condition
        if isinstance(not_matched_by_source_condition, list)
        else None
    )
    base = table_dir.rstrip("/")
    touched = _probe_merge_batch(spark, entries, keys, source, "snapshot_merge")
    if when_not_matched_by_source:
        if nbs_triples is not None:
            # a file whose envelope PROVES no row satisfies the by-source
            # condition cannot lose a row to this clause: it joins the
            # rewrite only if the source's keys touch it
            touched |= {
                e["path"] for e in entries if not _entry_prunable(e, nbs_triples)
            }
        else:
            # free-form SQL condition: any file may hold an unmatched row
            touched = {e["path"] for e in entries}
    carried = [e for e in entries if e["path"] not in touched]

    src = source
    for f in tschema.fields:
        if f.name not in source.columns:
            src = src.withColumn(f.name, F.lit(None).cast(f.dataType))
    src = src.select(cols)
    join_cond = F.lit(True)
    for k in keys:
        join_cond = join_cond & (F.col(f"t.{k}") == F.col(f"s.{k}"))
    if touched:
        # committed read contract: carried/touched files cannot hold
        # evolved columns — null-fill them with the SOURCE's types
        tgt = _apply_dv(
            _manifest_reader(spark, manifest).parquet(
                *[_entry_uri(base, p) for p in sorted(touched)]
            ),
            _dv_read(spark, table_dir, manifest),
            _dv_deleted(manifest),
        )
        for c in extra:
            tgt = tgt.withColumn(c, F.lit(None).cast(src.schema[c].dataType))
        tgt = tgt.select(cols)
    else:
        # no file can hold a source key: every source row is unmatched
        tgt = spark.createDataFrame([], src.schema)
    # side-presence MARKERS, not key nullability: a target row whose key
    # column is NULL (legal in the table — only the SOURCE is validated
    # non-null) never equi-matches, and classifying it by t.key IS NULL
    # would mistake it for a source-only row and insert/skip it away;
    # the marker identifies the side regardless of key content
    j = (
        tgt.withColumn("__t", F.lit(True))
        .alias("t")
        .join(
            src.withColumn("__s", F.lit(True)).alias("s"),
            join_cond,
            "full_outer",
        )
    )

    t_k, s_k = F.col("t.__t"), F.col("s.__s")
    true_ = F.lit(True)
    m_cond = F.expr(matched_condition) if matched_condition else true_
    i_cond = F.expr(not_matched_condition) if not_matched_condition else true_
    if nbs_triples is not None:
        d_cond = _where_expr(nbs_triples, qualify="t")
    elif not_matched_by_source_condition:
        d_cond = F.expr(not_matched_by_source_condition)
    else:
        d_cond = true_
    action = (
        F.when(
            t_k.isNull(),
            F.when(
                F.lit(when_not_matched == "insert") & F.coalesce(i_cond, F.lit(False)),
                F.lit("I"),
            ).otherwise(F.lit("skip")),
        )
        .when(
            s_k.isNull(),
            F.when(
                F.lit(when_not_matched_by_source == "delete")
                & F.coalesce(d_cond, F.lit(False)),
                F.lit("D"),
            ).otherwise(F.lit("C")),
        )
        .otherwise(
            F.when(
                F.lit(when_matched == "update") & F.coalesce(m_cond, F.lit(False)),
                F.lit("U"),
            )
            .when(
                F.lit(when_matched == "delete") & F.coalesce(m_cond, F.lit(False)),
                F.lit("MD"),
            )
            .otherwise(F.lit("C"))
        )
    )

    def _value(c: str):
        if update_set is None:
            upd = F.col(f"s.{c}")  # UPDATE SET *: replace from the source
        elif c in update_set:
            upd = F.expr(update_set[c])
        else:
            upd = F.col(f"t.{c}")  # explicit SET: unmentioned cols keep target
        return (
            F.when(F.col("__action") == "I", F.col(f"s.{c}"))
            .when(F.col("__action") == "U", upd)
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
        )

    obs = Observation()
    tagged = j.withColumn("__action", action).observe(
        obs,
        F.sum((F.col("__action") == "U").cast("long")).alias("updated"),
        F.sum(F.col("__action").isin("D", "MD").cast("long")).alias("deleted"),
        F.sum((F.col("__action") == "I").cast("long")).alias("inserted"),
        F.sum((F.col("__action") == "C").cast("long")).alias("copied"),
    )
    staged_df = (
        tagged.where(~F.col("__action").isin("skip", "D", "MD"))
        .select(
            *[
                F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k)
                for k in keys
            ],
            *[_value(c) for c in cols if c not in keys],
        )
        .select(cols)
    )
    constraints = manifest.get("constraints")
    c_obs, c_names = None, []
    if constraints:
        staged_df, c_obs, c_names = _constraint_observation(staged_df, constraints)
    cached = None
    if cluster_files:
        # repartitionByRange SAMPLES its input (a second full evaluation)
        # — without this persist the CollectMetrics nodes would fire twice
        # and every observed count would double
        cached = staged_df.persist()
        staged_df = cached.repartitionByRange(cluster_files, *keys)
    try:
        version, vdir = _stage_version(staged_df, table_dir)
    finally:
        if cached is not None:
            cached.unpersist()
    _check_staged_against(
        spark, table_dir, vdir, version, current, "snapshot_merge"
    )
    if c_obs is not None:
        _enforce_constraints(spark, table_dir, vdir, c_obs, c_names, "snapshot_merge")
    metrics = {k: int(v or 0) for k, v in obs.get.items()}
    if not (metrics["updated"] or metrics["deleted"] or metrics["inserted"]):
        # pure no-op merge: don't commit a version that only re-copies
        fs, jvm = _snap_fs(spark, table_dir)
        fs.delete(_snap_path(jvm, vdir), True)
        return current, metrics
    staged = _staged_file_entries(spark, table_dir, version, stats_cols)
    bloom_spec = manifest.get("bloom_spec")
    new_entries = staged + carried
    _apply_blooms(spark, table_dir, version, new_entries, bloom_spec)
    payload = {
        "version": version,
        "dir": f"v={version}",
        "files": new_entries,
        "op": "merge",
        # an evolved merge commits the WIDENED schema (carried files
        # null-fill the new columns through the read contract)
        "schema": (
            staged_df.schema.json()
            if extra
            else manifest.get("schema") or staged_df.schema.json()
        ),
    }
    old_dv = _dv_read(spark, table_dir, manifest)
    if old_dv is not None:
        carried_keys = sorted({_dv_key(e["path"]) for e in carried})
        dv_block = _write_dv(
            spark, table_dir, version,
            old_dv.where(F.col("path").isin(carried_keys)) if carried_keys else None,
        )
        if dv_block:
            payload["dv"] = dv_block
    if constraints:
        payload["constraints"] = constraints
    props = _merge_txn(manifest, properties)
    if props:
        payload["properties"] = _props_payload(props)
    if bloom_spec:
        payload["bloom_spec"] = bloom_spec
    if manifest.get("cdf"):
        payload["cdf"] = True
        if touched:
            # same CDF materialization as the upsert core: tgt holds the
            # touched files' pre-merge live rows, the staged dir the
            # post-merge state of that region
            payload["changes"] = _write_change_files(
                spark, table_dir, version,
                tgt.select(cols),
                spark.read.schema(staged_df.schema).parquet(vdir).select(cols),
                keys, cols,
            )
    try:
        _commit_record(spark, table_dir, version, payload)
    except SnapshotConflictError:
        fs, jvm = _snap_fs(spark, table_dir)
        fs.delete(_snap_path(jvm, vdir), True)  # never committed
        raise
    return version, metrics


def _keyed_diff(
    old_df: DataFrame, new_df: DataFrame, keys: list[str], cols: list[str]
) -> DataFrame:
    """NET row-level diff of two keyed states — the CDC core shared by
    ``snapshot_changes`` (batch version diff) and the merge family's
    change-file materialization: each key yields 0 (identical rows), 1
    (``insert``/``delete``), or 2 (``update_preimage``/
    ``update_postimage``) change events from ONE full-outer join (the
    only shuffle) and a null-safe struct compare. The join itself is
    null-safe too: a NULL-keyed row (legal in merge targets) carried
    unchanged through a rewrite must MATCH its own pre-image and emit
    nothing — plain equality would put its two copies on opposite
    outer-join sides and fabricate a delete+insert pair. Assumes the
    keyed-state contract (one row per key, the merge family's own
    invariant); duplicate keys in either state fan the join out."""
    val_cols = [c for c in cols if c not in keys]
    o = old_df.select(*keys, F.struct(*val_cols).alias("__old"))
    n = new_df.select(*keys, F.struct(*val_cols).alias("__new"))
    cond = functools.reduce(
        lambda a, b: a & b, [o[k].eqNullSafe(n[k]) for k in keys]
    )
    j = o.join(n, cond, "full_outer").select(
        *[F.coalesce(o[k], n[k]).alias(k) for k in keys],
        o["__old"],
        n["__new"],
    )
    old, new = F.col("__old"), F.col("__new")

    def _ev(side, change):
        return F.struct(side.alias("vals"), F.lit(change).alias("_change_type"))

    events = (
        F.when(old.isNull(), F.array(_ev(new, "insert")))
        .when(new.isNull(), F.array(_ev(old, "delete")))
        .when(
            ~old.eqNullSafe(new),
            F.array(_ev(old, "update_preimage"), _ev(new, "update_postimage")),
        )
    )  # otherwise NULL: explode drops the row
    return (
        j.select(*keys, F.explode(events).alias("__e"))
        .select(
            *keys,
            *[F.col(f"__e.vals.{c}").alias(c) for c in val_cols],
            F.col("__e._change_type").alias("_change_type"),
        )
        .select(*cols, "_change_type")
    )


def _write_change_files(
    spark: SparkSession,
    table_dir: str,
    version: int,
    old_df: DataFrame,
    new_df: DataFrame,
    keys: list[str],
    cols: list[str],
) -> list[dict]:
    """Materialize a rewrite commit's NET row-level diff as parquet under
    ``_changes/v=N/`` and return its manifest entries (``path/rows/
    bytes``, paths table-relative) — Delta's enableChangeDataFeed trade:
    pay O(changed rows) once at write time so changeFeed consumers replay
    the rewrite as CDC rows instead of refusing (or re-deriving the diff
    per consumer). ``old_df``/``new_df`` are the touched files' live rows
    before and after the commit, so the diff never scans carried files —
    the upsert cost model extends to its change feed. Crash debris from
    a previous attempt at the SAME version is overwritten: the staging
    claim for N is already ours, and the records only publish with the
    commit."""
    return _materialize_changes(
        spark, table_dir, version, _keyed_diff(old_df, new_df, keys, cols)
    )


def _materialize_changes(
    spark: SparkSession, table_dir: str, version: int, changes: DataFrame
) -> list[dict]:
    """Write an already-typed change DataFrame (data columns +
    ``_change_type``) under ``_changes/v=N/`` and return its manifest
    entries — the storage half shared by the keyed-diff (upsert/MERGE),
    predicate-delete, and restore materializations."""
    changes = changes.withColumn(
        "_change_type", F.col("_change_type").cast("string")
    )
    cdir = f"{table_dir.rstrip('/')}/_changes/v={version}"
    changes.write.mode("overwrite").parquet(cdir)
    fs, jvm = _snap_fs(spark, table_dir)
    names: dict[str, int] = {}
    for st in fs.listStatus(_snap_path(jvm, cdir)):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            names[name] = int(st.getLen())
    import pyarrow.parquet as pq

    f, root = _pa_fs(table_dir)
    entries = []
    for name in sorted(names):
        with f.open_input_file(
            f"{root.rstrip('/')}/_changes/v={version}/{name}"
        ) as srcf:
            rows = int(pq.ParquetFile(srcf).metadata.num_rows)
        entries.append(
            {
                "path": f"_changes/v={version}/{name}",
                "rows": rows,
                "bytes": names[name],
            }
        )
    return entries


def snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    key: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level change feed between two committed versions — the Delta
    CDF / Iceberg changelog shape: every row of the result is a table row
    plus a ``_change_type`` column in ``insert | delete |
    update_preimage | update_postimage``. Net semantics over the span
    (a key upserted in v+1 and deleted in v+2 reads as one delete from
    v→v+2); call per adjacent pair for per-commit granularity.

    The 100 TB lever is manifest-level: data files are immutable, so any
    file carried by reference from ``from_version`` into ``to_version``
    cannot contain a changed row — both endpoint manifests are diffed
    DRIVER-SIDE and only the files unique to one side are ever listed,
    opened, or scanned (test-pinned via ``inputFiles``). On a table
    maintained by keyed upserts that is O(touched files), not O(table).
    The rows of rewritten-but-unchanged survivors (a touched file holds
    10k rows, one key updated) are dropped by a null-safe struct compare
    after one full-outer join keyed by ``key`` — the only shuffle, and it
    moves changed-file rows only.

    Columns follow ``to_version``'s manifest schema; rows read from
    pre-evolution files surface NULL for columns added later (the same
    fill ``snapshot_read`` applies)."""
    current = snapshot_version(spark, table_dir)
    v_to = to_version if to_version is not None else current
    if from_version > v_to:
        raise ValueError(
            f"snapshot_changes: from_version {from_version} > to_version {v_to}"
        )
    m_from = _read_manifest(spark, table_dir, from_version)
    m_to = _read_manifest(spark, table_dir, v_to)
    old_df, new_df, cols = _state_diff_sides(
        spark, table_dir, m_from, m_to, "snapshot_changes"
    )
    return _keyed_diff(old_df, new_df, [key], cols)


def _state_diff_sides(
    spark: SparkSession,
    table_dir: str,
    m_from: dict,
    m_to: dict,
    caller: str,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """File-wise (old_rows, new_rows, cols) sides of the state diff
    between two manifests — the manifest-level CDC core shared by
    ``snapshot_changes`` (keyed diff downstream) and the RESTORE
    change-file materialization (keyless multiset diff: old side emits
    as deletes, new side as inserts, after the caller nets identical
    rows out with an ``exceptAll`` pair — rewritten-but-identical
    survivors appear in both sides when restoring across a COW
    rewrite). Only files unique to one side, plus DV-delta positions
    in shared files, are ever opened."""
    if m_from.get("files") is None or m_to.get("files") is None:
        raise ValueError(
            f"{caller} needs file-list manifests on both endpoints "
            f"(v1-era whole-directory records carry no file identity)"
        )
    schema = _manifest_schema(m_to)
    if schema is None:
        raise ValueError(
            f"{caller}: the target version carries no schema "
            f"(v1-era record) — rewrite the table once with snapshot_write"
        )
    cols = [f.name for f in schema.fields]
    from_paths = {e["path"] for e in m_from["files"]}
    to_paths = {e["path"] for e in m_to["files"]}
    base = table_dir.rstrip("/")
    # columns follow m_to's schema, but each side's FILES are read under
    # their OWN manifest schema and projected onto it with try_cast —
    # diffing across a type-changing replace (int v1, string v2, restore
    # to v1) would otherwise crash the old-side parquet scan with a
    # physical-type mismatch; added columns NULL-fill, dropped columns
    # leave the comparison
    from_schema = _manifest_schema(m_from) or schema

    def _read(paths: set[str], src=None) -> DataFrame:
        src = src if src is not None else schema
        if not paths:
            return spark.createDataFrame([], schema)
        # explicit schema: pre-evolution files fill missing columns with
        # NULL, and no footer-merging schema inference pass is paid
        return spark.read.schema(src).parquet(
            *[_entry_uri(base, p) for p in sorted(paths)]
        )

    # each endpoint's LIVE rows honor that endpoint's deletion vector
    # (_metadata only resolves on a real file scan, so skip empty sides)
    dv_from = _dv_read(spark, table_dir, m_from)
    dv_to = _dv_read(spark, table_dir, m_to)

    def _read_live(paths: set[str], dv, deleted, src) -> DataFrame:
        if not paths:
            return spark.createDataFrame([], schema)
        names = {f.name for f in src.fields}
        return _apply_dv(_read(paths, src), dv, deleted).select(
            [
                (
                    F.col(f.name).try_cast(f.dataType)
                    if f.name in names
                    else F.lit(None).cast(f.dataType)
                ).alias(f.name)
                for f in schema.fields
            ]
        )

    old_df = _read_live(
        from_paths - to_paths, dv_from, _dv_deleted(m_from), from_schema
    )
    new_df = _read_live(
        to_paths - from_paths, dv_to, _dv_deleted(m_to), schema
    )
    if dv_from is not None or dv_to is not None:
        # DV delta over SHARED files: positions deleted between the
        # endpoints are live-at-from rows (they surface as deletes); a
        # restore can resurrect positions the other way. Only files named
        # in the delta are ever opened — the manifest-diff bound holds.
        empty_dv = spark.createDataFrame([], "path string, pos long")
        f_dv = dv_from if dv_from is not None else empty_dv
        t_dv = dv_to if dv_to is not None else empty_dv
        shared = from_paths & to_paths
        # DV keys are two-segment; map back to the manifest entry paths
        # (possibly absolute on a clone) to locate the files to open
        shared_by_key = {_dv_key(p): p for p in shared}

        def _dv_delta_rows(delta: DataFrame) -> DataFrame:
            delta = delta.where(
                F.col("path").isin(sorted(shared_by_key))
                if shared_by_key
                else F.lit(False)
            )
            keys = [r["path"] for r in delta.select("path").distinct().collect()]
            paths = [shared_by_key[k] for k in keys]
            if not paths:
                return spark.createDataFrame([], schema)
            rows = (
                _read(set(paths))
                .withColumn(
                    "__dv_path",
                    F.regexp_extract(F.col("_metadata.file_path"), _DV_RELPATH_RE, 1),
                )
                .withColumn("__dv_pos", F.col("_metadata.row_index"))
            )
            # the delta is bounded by the larger endpoint's DV — gate the
            # broadcast on that bound like every other DV join
            bound = max(_dv_deleted(m_from) or 0, _dv_deleted(m_to) or 0)
            return rows.join(
                _dv_side(delta, bound),
                ["__dv_path", "__dv_pos"],
                "semi",
            ).select(cols)

        newly_deleted = _dv_delta_rows(t_dv.exceptAll(f_dv))
        resurrected = _dv_delta_rows(f_dv.exceptAll(t_dv))
        old_df = old_df.unionByName(newly_deleted)
        new_df = new_df.unionByName(resurrected)
    return old_df, new_df, cols


def snapshot_changes_since(
    spark: SparkSession,
    table_dir: str,
    key: str,
    offset_dir: str,
) -> tuple[DataFrame, int]:
    """Incremental change-feed consumer: the changes committed since this
    consumer's last acknowledged version — the table-to-table sync shape
    (Delta CDF + a consumer group offset).

    Returns ``(feed, version)``. The FIRST call (no offset yet) delivers
    the whole current table as ``insert`` rows — the initial load.
    Afterwards each call returns ``snapshot_changes(last_acked,
    current)``; when nothing new is committed the feed is empty (same
    schema). The offset only advances when the caller invokes
    ``snapshot_ack(spark, offset_dir, version)`` AFTER materializing the
    feed downstream — two-phase on purpose: a crash between read and ack
    re-delivers the same span (at-least-once), and an idempotent keyed
    sink (the repo's upsert family) makes that effectively-once — the
    same contract the streaming sinks document.

    The offset is a one-row parquet artifact via ``write_json_artifact``,
    so consumer state lives on the same URI-capable filesystem as the
    table — no driver-local files."""
    current = snapshot_version(spark, table_dir)
    if current < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    if not dataset_exists(spark, offset_dir):
        last = None  # first run: no offset yet
    else:
        import json

        try:
            payload = read_json_artifact(spark, offset_dir)
        except json.JSONDecodeError:
            # present-but-unparseable payload: corruption, not a torn ack
            raise
        except ValueError:
            # torn ack (dataset exists but holds NO row): overwrite-based
            # offsets lose the previous value mid-ack, so the only safe
            # recovery is the initial load — the idempotent downstream
            # apply the contract requires makes the re-load converge
            # rather than duplicate.
            payload = None
        if payload is None:
            last = None
        else:
            # a payload that EXISTS must parse — a readable artifact with
            # a missing/garbage acked_version is corruption, and silently
            # re-delivering the full table (then acking over it) would
            # paper over it; int()/KeyError surface to the caller
            last = int(payload["acked_version"])
    if last is None:
        feed = snapshot_read(spark, table_dir, version=current).withColumn(
            "_change_type", F.lit("insert")
        )
        return feed, current
    if last > current:
        raise ValueError(
            f"consumer offset {last} is ahead of the table's current "
            f"version {current} in {table_dir} — was the table restored or "
            f"recreated? reset the offset dir to re-sync"
        )
    if last == current:
        feed = (
            snapshot_read(spark, table_dir, version=current)
            .limit(0)
            .withColumn("_change_type", F.lit("insert"))
        )
        return feed, current
    return snapshot_changes(spark, table_dir, key, last, current), current


def snapshot_ack(spark: SparkSession, offset_dir: str, version: int) -> None:
    """Acknowledge a consumed change span: persist ``version`` as this
    consumer's offset (overwrite — the artifact writer commits via
    ``_SUCCESS``, so a torn ack is unreadable and re-delivers)."""
    write_json_artifact(spark, offset_dir, {"acked_version": int(version)})


def _manifest_blooms_for_test(spark: SparkSession, table_dir: str, version: int) -> dict:
    """Test hook: {path: bloom-entry} for a committed version."""
    m = _read_manifest(spark, table_dir, version)
    return {e["path"]: e["bloom"] for e in m.get("files", []) if e.get("bloom")}


def snapshot_history(
    spark: SparkSession, table_dir: str, check_available: bool = False
) -> list[dict]:
    """Table history from the commit log (the DESCRIBE HISTORY shape):
    one record per committed version — file/row/byte totals and how many
    files were newly staged vs carried by reference from older versions.
    Pure manifest reads — no data files are listed or opened, so history
    on a 100 TB table costs KBs of JSON. With a manifest-log checkpoint
    the checkpointed prefix is served straight from the compacted log
    (zero manifest reads — the checkpoint stores exactly these records);
    only the tail reads real manifests. ``check_available=True``
    additionally probes every referenced file's existence (False once
    vacuum reclaimed any of it) — one FS round-trip per file, so opt-in;
    it needs the per-version FILE LISTS and therefore always takes the
    full manifest-read path — versions whose records ``snapshot_expire_log``
    retired are then served from the checkpointed summaries with
    ``available=False`` (their data files are unverifiable and typically
    vacuumed past the horizon), so both flag values return the SAME
    version set."""
    fs, jvm = _snap_fs(spark, table_dir)
    out = []
    start = 1
    ck = _read_checkpoint(spark, table_dir)
    if not check_available:
        if ck is not None:
            out.extend(dict(rec) for rec in ck["log"])
            start = int(ck["version"]) + 1
    # expired versions live only in the compacted log; the availability
    # path must not silently return a shorter history than the default
    ck_recs = (
        {int(rec["version"]): rec for rec in ck["log"]}
        if (check_available and ck is not None)
        else {}
    )
    for v in range(start, snapshot_version(spark, table_dir) + 1):
        try:
            m = _read_manifest(spark, table_dir, v)
        except FileNotFoundError:
            if v in ck_recs:
                out.append({**dict(ck_recs[v]), "available": False})
            continue
        rec = _history_rec(v, m)
        if check_available:
            files = m.get("files")
            if files is None:
                rec["available"] = bool(
                    fs.exists(_snap_path(jvm, table_dir, f"v={v}", "_SUCCESS"))
                )
            else:
                rec["available"] = all(
                    fs.exists(_snap_path(jvm, table_dir, e["path"])) for e in files
                )
        out.append(rec)
    return out


def snapshot_stats_agg(
    spark: SparkSession,
    table_dir: str,
    cols: list[str] | None = None,
    version: int | None = None,
) -> DataFrame:
    """METADATA-ONLY aggregates: exact ``COUNT(*)``, ``MIN``/``MAX`` and
    null counts answered from the commit manifest's per-file stats
    instead of scanning data — the lakehouse fast path Delta/Iceberg
    expose for ``SELECT count(*) FROM t`` (Delta's metadata-only query,
    Iceberg's manifest stats). On a 100 TB table this is KBs of JSON
    versus a full scan; the answer is EXACT, never approximate, because
    the same write paths that maintain skipping stats maintain these.

    Returns a ONE-ROW DataFrame: ``n_rows`` (bigint) plus, per requested
    column, ``min_<c>``/``max_<c>`` (the column's own type) and
    ``nulls_<c>`` (bigint).

    Correctness under merge-on-read: a file with deletion-vector debt has
    stale stats (the min might be a tombstoned row), so its contribution
    is recomputed by scanning ONLY the DV'd files with the vector applied
    — exact at the cost of O(dirty files), never O(table). Row counts
    stay pure metadata even then (the manifest carries exact per-file
    deleted counts). Files lacking recorded stats for a requested column
    are likewise scanned (and only them). With no DV and full stats the
    plan touches ZERO data files — ``result.inputFiles() == []``,
    test-pinned."""
    v = version if version is not None else snapshot_version(spark, table_dir)
    if v < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _read_manifest(spark, table_dir, v)
    entries = manifest.get("files")
    if entries is None:
        raise ValueError(
            "snapshot_stats_agg needs a file-list manifest — rewrite the "
            "table once with snapshot_write (v1-era record found)"
        )
    schema = _manifest_schema(manifest)
    if schema is None:
        raise ValueError(
            "snapshot_stats_agg: the version carries no schema (v1-era "
            "record) — rewrite the table once with snapshot_write"
        )
    cols = list(cols or [])
    types = {f.name: f.dataType for f in schema.fields}
    unknown = [c for c in cols if c not in types]
    if unknown:
        raise ValueError(
            f"snapshot_stats_agg: columns {unknown} not in the table "
            f"schema {sorted(types)}"
        )
    dv_counts = (manifest.get("dv") or {}).get("files", {})
    total = sum(e.get("rows", 0) for e in entries) - (_dv_deleted(manifest) or 0)

    def _dirty(e: dict) -> bool:
        if e.get("rows", 0) == 0:
            return False  # nothing to contribute either way
        if dv_counts.get(_dv_key(e["path"]), 0) > 0:
            return True  # stats may describe tombstoned rows
        st = e.get("stats") or {}
        return any(c not in st for c in cols)

    dirty = [e for e in entries if _dirty(e)]
    clean = [e for e in entries if not _dirty(e) and e.get("rows", 0) > 0]

    # driver-side fold over the clean files' recorded stats; values are
    # JSON-safe (_json_safe) where ISO timestamp strings order
    # chronologically, so min/max comparison is plain Python
    mins: dict[str, object] = {c: None for c in cols}
    maxs: dict[str, object] = {c: None for c in cols}
    nulls: dict[str, int] = {c: 0 for c in cols}
    for e in clean:
        for c in cols:
            s = e["stats"][c]
            nulls[c] += int(s.get("nulls", 0))
            for v_, acc, better in ((s["min"], mins, min), (s["max"], maxs, max)):
                if v_ is None:
                    continue  # all-NULL file for this column
                acc[c] = v_ if acc[c] is None else better(acc[c], v_)

    if dirty:
        base = table_dir.rstrip("/")
        dirty_keys = sorted({_dv_key(e["path"]) for e in dirty})
        dv = _dv_read(spark, table_dir, manifest)
        scanned = _apply_dv(
            _manifest_reader(spark, manifest).parquet(
                *[_entry_uri(base, e["path"]) for e in dirty]
            ),
            dv.where(F.col("path").isin(dirty_keys)) if dv is not None else None,
            _dv_deleted(manifest),
        )
        aggs = []
        for c in cols:
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        row = scanned.agg(*aggs).head() if cols else None
        for c in cols:
            nulls[c] += int(row[f"__nulls_{c}"] or 0)
            for v_, acc, better in (
                (_json_safe(row[f"__min_{c}"]), mins, min),
                (_json_safe(row[f"__max_{c}"]), maxs, max),
            ):
                if v_ is None:
                    continue
                acc[c] = v_ if acc[c] is None else better(acc[c], v_)

    out = [F.lit(int(total)).cast("long").alias("n_rows")]
    for c in cols:
        t = types[c]
        out.append(F.lit(mins[c]).cast(t).alias(f"min_{c}"))
        out.append(F.lit(maxs[c]).cast(t).alias(f"max_{c}"))
        out.append(F.lit(int(nulls[c])).cast("long").alias(f"nulls_{c}"))
    return spark.range(1).select(*out)


def snapshot_count(
    spark: SparkSession,
    table_dir: str,
    where: list[tuple] | None = None,
    version: int | None = None,
) -> int:
    """Exact FILTERED count with manifest-level evaluation: each file is
    classified by its stats envelope — provably zero matching rows
    (``_entry_prunable``: skipped), provably ALL rows matching
    (``_entry_all_match``: counted from the manifest, minus nothing —
    all-match is only provable on DV-clean files), or undecided (scanned
    with the residual filter and deletion vector applied).

    On a range-clustered event log, ``where=[("ts", ">=", a), ("ts",
    "<=", b)]`` opens only the (at most two) BOUNDARY files the window
    partially covers — interior files contribute their manifest row
    counts without being listed or opened, which at 100 TB is the
    difference between a windowed count and a windowed scan. Without
    ``where`` this is the pure metadata count (exact under DV debt: the
    manifest carries per-file deleted totals)."""
    v = version if version is not None else snapshot_version(spark, table_dir)
    if v < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _read_manifest(spark, table_dir, v)
    entries = manifest.get("files")
    if entries is None:
        raise ValueError(
            "snapshot_count needs a file-list manifest — rewrite the "
            "table once with snapshot_write (v1-era record found)"
        )
    dv_counts = (manifest.get("dv") or {}).get("files", {})
    if not where:
        return sum(e.get("rows", 0) for e in entries) - (
            _dv_deleted(manifest) or 0
        )
    total = 0
    partial: list[dict] = []
    for e in entries:
        if e.get("rows", 0) <= 0:
            continue
        if _entry_prunable(e, where):
            continue  # proves zero matching rows — contributes nothing
        if not dv_counts.get(_dv_key(e["path"]), 0) and _entry_all_match(
            e, where
        ):
            total += e["rows"]  # proves every row matches — no scan
        else:
            partial.append(e)
    if partial:
        base = table_dir.rstrip("/")
        dirty_keys = sorted({_dv_key(e["path"]) for e in partial})
        dv = _dv_read(spark, table_dir, manifest)
        scanned = _apply_dv(
            _manifest_reader(spark, manifest).parquet(
                *[_entry_uri(base, e["path"]) for e in partial]
            ),
            dv.where(F.col("path").isin(dirty_keys)) if dv is not None else None,
            _dv_deleted(manifest),
        )
        total += scanned.where(
            F.coalesce(_where_expr(where), F.lit(False))
        ).count()
    return total


def snapshot_delete(
    spark: SparkSession,
    table_dir: str,
    where: list[tuple],
    stats_cols: list[str] | None = None,
    mode: str = "cow",
) -> tuple[int, int]:
    """Predicate delete committed as a new version; returns
    ``(new_version, rows_deleted)``.

    ``mode="cow"`` (default) rewrites candidate files minus matches —
    right for deletes that hollow out whole key ranges. ``mode="dv"``
    commits a DELETION VECTOR instead (the Delta/Iceberg merge-on-read
    shape): no data file is rewritten — candidate files are scanned once
    for matching (file, row-index) positions, which append to the
    version's ``_dv`` dataset; readers subtract them with one broadcast
    anti-join. O(matching rows) write cost makes it the lever for
    SCATTERED deletes (GDPR erasure of single rows across thousands of
    128 MB files); physical maintenance (optimize/compact, or an upsert
    touching the file) purges entries as it rewrites, so the debt never
    outlives maintenance. For mass deletes stay with ``cow`` — the DV
    grows with the deleted-row count.

    The takedown/right-to-erasure shape a training-data table needs:
    files whose stats envelope PROVES no row matches (``_entry_prunable``
    — the same driver-side skipping ``snapshot_read`` uses) are carried
    into the new manifest by reference, untouched; only candidate files
    are read, filtered to survivors, and re-staged. Cost is O(candidate
    files), not O(table) — on a key-clustered 100 TB table a targeted
    delete touches a handful of files. Files without stats are simply
    candidates (correct, just not skipped).

    SQL DELETE semantics: rows where the predicate is TRUE go; rows
    where it is FALSE **or NULL** stay. ``rows_deleted`` falls out of
    the manifests for free (candidate rows minus staged rows) — no extra
    count job. ``stats_cols`` defaults to what the current manifest
    tracks, so skipping power survives the rewrite."""
    current = snapshot_version(spark, table_dir)
    if current < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _read_manifest(spark, table_dir, current)
    entries = manifest.get("files")
    if entries is None:
        raise ValueError(
            f"snapshot_delete needs a file-list manifest — rewrite the "
            f"table once with snapshot_write (any stats_cols) under {table_dir}"
        )
    if stats_cols is None:
        with_stats = next((e for e in entries if e.get("stats")), None)
        stats_cols = sorted(with_stats["stats"]) if with_stats else None

    if mode not in ("cow", "dv"):
        raise ValueError(f"snapshot_delete: unknown mode {mode!r}")
    candidates = [e for e in entries if not _entry_prunable(e, where)]
    if not candidates:
        return current, 0  # no file can hold a match: nothing to commit
    candidate_paths = {c["path"] for c in candidates}
    carried = [e for e in entries if e["path"] not in candidate_paths]
    base = table_dir.rstrip("/")
    old_dv = _dv_read(spark, table_dir, manifest)
    if mode == "dv":
        cand_df = _manifest_reader(spark, manifest).parquet(
            *[_entry_uri(base, e["path"]) for e in candidates]
        )
        matches = (
            cand_df.withColumn(
                "path",
                F.regexp_extract(F.col("_metadata.file_path"), _DV_RELPATH_RE, 1),
            )
            .withColumn("pos", F.col("_metadata.row_index"))
            .where(F.coalesce(_where_expr(where), F.lit(False)))
            .select("path", "pos")
        )
        if old_dv is not None:
            # already-deleted rows must not double-count (or re-match);
            # same broadcast gate as the readers — the accumulated DV can
            # itself be past broadcast size
            side = old_dv
            if (_dv_deleted(manifest) or 0) <= DV_BROADCAST_MAX_POSITIONS:
                side = F.broadcast(old_dv)
            matches = matches.join(side, ["path", "pos"], "left_anti")
        new_dv = matches if old_dv is None else old_dv.unionByName(matches)
        fs, jvm = _snap_fs(spark, table_dir)
        version = current + 1
        vdir = f"{base}/v={version}"
        if fs.exists(_snap_path(jvm, vdir)):
            raise SnapshotConflictError(
                f"snapshot_delete: staging dir v={version} already exists "
                f"under {table_dir} — concurrent writer or crashed orphan"
            )
        if not fs.createNewFile(_snap_path(jvm, vdir, "_CLAIM")):
            raise SnapshotConflictError(
                f"snapshot_delete: lost the staging race for v={version}"
            )
        dv_block = _write_dv(spark, table_dir, version, new_dv)
        old_total = (manifest.get("dv") or {}).get("deleted", 0)
        deleted_now = (dv_block["deleted"] if dv_block else 0) - old_total
        if deleted_now == 0:
            fs.delete(_snap_path(jvm, vdir), True)  # no match: nothing to commit
            return current, 0
        payload = {
            "version": version,
            "dir": f"v={version}",
            "files": entries,  # every data file carried by reference
            "schema": manifest.get("schema"),
            "dv": dv_block,
            "op": "delete",
        }
        for carry in ("bloom_spec", "constraints", "cdf"):
            if manifest.get(carry):
                payload[carry] = manifest[carry]
        txn = _merge_txn(manifest, None)
        if txn:
            # streaming writers' idempotence stamps survive a delete
            payload["properties"] = _props_payload(txn)
        try:
            _commit_record(spark, table_dir, version, payload)
        except SnapshotConflictError:
            fs.delete(_snap_path(jvm, vdir), True)  # never committed
            raise
        return version, deleted_now
    keep = ~F.coalesce(_where_expr(where), F.lit(False))
    # manifest schema = read contract: after a schema evolution the
    # candidate files can differ in width — inferring from one footer
    # could rewrite survivors minus an evolved column
    live = _apply_dv(
        _manifest_reader(spark, manifest).parquet(
            *[_entry_uri(base, e["path"]) for e in candidates]
        ),
        old_dv,
        _dv_deleted(manifest),
    )
    survivors = live.where(keep)
    version, vdir_cow = _stage_version(survivors, table_dir)
    _check_staged_against(
        spark, table_dir, vdir_cow, version, current, "snapshot_delete"
    )
    staged = _staged_file_entries(spark, table_dir, version, stats_cols)
    dv_counts = (manifest.get("dv") or {}).get("files", {})
    live_candidates = sum(
        e.get("rows", 0) - dv_counts.get(_dv_key(e["path"]), 0) for e in candidates
    )
    deleted = live_candidates - sum(e["rows"] for e in staged)
    bloom_spec = manifest.get("bloom_spec")
    _apply_blooms(spark, table_dir, version, staged, bloom_spec)
    payload = {
        "version": version,
        "dir": f"v={version}",
        "files": staged + carried,
        "schema": manifest.get("schema") or survivors.schema.json(),
        "op": "delete",
    }
    # rewritten candidates physically drop their deleted rows; only the
    # carried files' deletion-vector entries survive (two-segment key:
    # entry paths may be absolute on a shallow clone)
    if old_dv is not None:
        carried_keys = sorted({_dv_key(e["path"]) for e in carried})
        dv_block = _write_dv(
            spark, table_dir, version,
            old_dv.where(F.col("path").isin(carried_keys)) if carried_keys else None,
        )
        if dv_block:
            payload["dv"] = dv_block
    if bloom_spec:
        payload["bloom_spec"] = bloom_spec
    if manifest.get("cdf"):
        payload["cdf"] = True
        # a predicate delete's CDC is exactly the predicate-matched live
        # rows (no keyed diff needed): materialize them as `delete`
        # change rows so the changeFeed replays the rewrite. Cost: ONE
        # additional scan of the candidate files (deliberately re-read
        # rather than persisted — mass deletes are the COW use case, and
        # caching gigabytes of candidates to save a parquet re-scan is
        # the wrong trade); still O(candidates), never O(table)
        payload["changes"] = _materialize_changes(
            spark, table_dir, version,
            live.where(F.coalesce(_where_expr(where), F.lit(False)))
            .withColumn("_change_type", F.lit("delete")),
        )
    if manifest.get("constraints"):
        # deletes cannot create violating rows: carry, don't re-check
        payload["constraints"] = manifest["constraints"]
    txn = _merge_txn(manifest, None)
    if txn:
        # streaming writers' idempotence stamps survive a delete
        payload["properties"] = _props_payload(txn)
    _commit_record(spark, table_dir, version, payload)
    return version, deleted


def snapshot_clone(
    spark: SparkSession,
    source_dir: str,
    clone_dir: str,
    shallow: bool = True,
) -> int:
    """Clone the source table's CURRENT state into a NEW table directory.

    ``shallow=True`` (the Delta SHALLOW CLONE shape): the clone's v1
    manifest references the source's data files (and deletion vector) by
    ABSOLUTE URI — zero bytes move, the clone costs one manifest read
    and one atomic commit regardless of table size. The clone is a fully
    independent table from that instant: upserts/deletes/CDC on it stage
    their own (relative) files and simply carry the absolute entries,
    the change feed diffs as usual, and ITS vacuum never touches the
    source's files (reachability only sweeps under the clone's own
    directory). The dev/test-against-prod and experiment-branch shape.

    A shallow clone REGISTERS itself under the source's ``_clones/``
    directory (one small JSON per clone: clone path + pinned source
    version). ``snapshot_vacuum`` on the source reads the registry and
    protects every live registered clone's pinned version — files a
    clone still depends on survive reclamation, closing the
    vacuum-breaks-clones hole Delta merely documents. The narrowed
    residual caveat: a clone whose directory was deleted out-of-band is
    detected and its registration dropped, but a clone REACHED ONLY
    through a deleted intermediate clone (grandclone chains) loses its
    protection with the intermediate; ``snapshot_vacuum(force=True)``
    ignores registrations entirely (the old behavior).

    ``shallow=False`` copies the data: one ``snapshot_read`` →
    ``snapshot_write`` with the source's stats/bloom spec re-derived —
    O(table), fully independent lifecycle."""
    current = snapshot_version(spark, source_dir)
    if current < 1:
        raise FileNotFoundError(f"no committed snapshot in {source_dir}")
    if snapshot_version(spark, clone_dir) > 0:
        raise ValueError(
            f"snapshot_clone: {clone_dir} already holds a committed table"
        )
    manifest = _read_manifest(spark, source_dir, current)
    entries = manifest.get("files")
    if entries is None:
        raise ValueError("snapshot_clone needs a file-list manifest")
    if not shallow:
        df = snapshot_read(spark, source_dir)
        with_stats = next((e for e in entries if e.get("stats")), None)
        spec = manifest.get("bloom_spec") or {}
        return snapshot_write(
            df,
            clone_dir,
            stats_cols=sorted(with_stats["stats"]) if with_stats else None,
            bloom_cols=spec.get("cols"),
            bloom_bits=spec.get("m", 16384),
            bloom_hashes=spec.get("h", 5),
            constraints=manifest.get("constraints"),
        )
    src_base = source_dir.rstrip("/")
    # _entry_uri keeps a clone-of-a-clone from double-prefixing entries
    # the source itself holds by absolute reference
    abs_entries = [{**e, "path": _entry_uri(src_base, e["path"])} for e in entries]
    payload = {
        "version": 1,
        "dir": "v=1",
        "files": abs_entries,
        "schema": manifest.get("schema"),
        "cloned_from": {"table": src_base, "version": current},
        "op": "clone",
    }
    for carry in ("bloom_spec", "constraints", "cdf"):
        if manifest.get(carry):
            payload[carry] = manifest[carry]
    if manifest.get("dv"):
        dv = manifest["dv"]
        payload["dv"] = {**dv, "dir": _entry_uri(src_base, dv["dir"])}
    _commit_record(spark, clone_dir, 1, payload)
    # register with the source so ITS vacuum can protect the pinned
    # version (idempotent create; registration loss only reopens the
    # documented keep_last caveat, never corrupts either table)
    import json
    import uuid

    fs, jvm = _snap_fs(spark, source_dir)
    fs.mkdirs(_snap_path(jvm, src_base, "_clones"))
    token = uuid.uuid4().hex
    reg = _snap_path(jvm, src_base, "_clones", f"{token}.json")
    # write-then-rename: a crash mid-write leaves only a dot-hidden tmp
    # (invisible to vacuum's registry scan), never a torn .json that
    # would block every future non-force vacuum on the source
    tmp = _snap_path(jvm, src_base, "_clones", f".{token}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(
            bytearray(
                json.dumps(
                    {"clone": clone_dir.rstrip("/"), "source_version": current}
                ).encode()
            )
        )
    finally:
        out.close()
    if not fs.rename(tmp, reg):
        fs.delete(tmp, False)
        raise RuntimeError(
            f"snapshot_clone: failed to publish clone registration {reg} — "
            f"the clone is committed but unprotected from the source's "
            f"vacuum; re-run registration or vacuum with care"
        )
    return 1


def snapshot_restamp(
    spark: SparkSession, table_dir: str, properties: dict,
    expected_version: int | None = None,
) -> int:
    """Metadata-only commit: a new version referencing the CURRENT file
    list (and deletion vector) verbatim, with new ``properties``. Zero
    bytes move. The exactly-once stamp mover for derived-table
    maintainers whose change span nets to ZERO content change — the
    stamp must still advance atomically or every later sync re-reads the
    same span. ``expected_version`` applies the usual CAS."""
    current = snapshot_version(spark, table_dir)
    if current < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    if expected_version is not None and current != expected_version:
        raise SnapshotConflictError(
            f"snapshot_restamp: table {table_dir} is at version {current}, "
            f"caller expected {expected_version}"
        )
    manifest = _read_manifest(spark, table_dir, current)
    if manifest.get("files") is None:
        raise ValueError("snapshot_restamp needs a file-list manifest")
    payload = {
        "version": current + 1,
        "dir": f"v={current + 1}",
        "files": manifest["files"],
        "schema": manifest.get("schema"),
        # the NEW properties replace the old wholesale (that is what a
        # restamp is) — except streaming writers' txn idempotence
        # stamps, which must survive every commit or a crash-replayed
        # micro-batch would re-append after an interleaved restamp
        "properties": _props_payload(_merge_txn(manifest, properties) or {}),
        "restamped_from": current,
        "op": "restamp",
    }
    for carry in ("bloom_spec", "dv", "constraints", "cdf"):
        if manifest.get(carry):
            payload[carry] = manifest[carry]
    _commit_record(spark, table_dir, current + 1, payload)
    return current + 1


def snapshot_clean_orphans(
    spark: SparkSession,
    table_dir: str,
    dry_run: bool = False,
    staging_grace_sec: float = 3600.0,
) -> list[int]:
    """Remove CRASHED-WRITER orphan stages: ``v=N`` directories carrying
    a ``_CLAIM`` marker but no ``_manifests/N.json`` commit record. Such
    a directory was never visible to any reader (readers only follow
    committed records) but blocks the next writer's staging claim for
    version N — the commit-protocol errors tell the operator to delete
    it; this is that remedy as a safe API. Also sweeps the DataSource
    writer's ``_staging/`` leftovers (task-written files a crashed driver
    never moved under ``v=N/`` — no manifest ever references them), but
    ONLY staging subdirs whose newest file is older than
    ``staging_grace_sec`` (default 1 h): the commit-conflict error routes
    operators here while OTHER writers may be live (``multiWriter``), and
    a live writer's in-flight staging files are by definition recent —
    the age gate keeps the recovery call safe to run beside them. A
    crashed writer's stage trips the gate on the next day's sweep (or
    pass ``staging_grace_sec=0`` when provably no writer is active).
    Returns the versions removed, followed by the swept staging subdirs
    as ``"_staging/<name>"`` strings (``dry_run=True`` runs the SAME
    scans — including the age-gated staging one — and reports everything
    the real run would delete, without deleting).

    Safety: only UNCOMMITTED stages above the current version qualify.
    A claimed-but-uncommitted stage at or below the current version is
    impossible under the protocol (the version number was consumed by
    whoever committed it); directories without a _CLAIM marker are
    pre-protocol data and are left alone. NOTE: a LIVE writer's stage
    looks identical to a crashed one mid-write — run this only when no
    writer is active, exactly like VACUUM's single-operator assumption."""
    import re

    fs, jvm = _snap_fs(spark, table_dir)
    if not fs.exists(_snap_path(jvm, table_dir)):
        return []
    current = snapshot_version(spark, table_dir)
    removed = []
    for st in fs.listStatus(_snap_path(jvm, table_dir)):
        name = st.getPath().getName()
        m = re.fullmatch(r"v=(\d+)", name)
        if not m:
            continue
        v = int(m.group(1))
        if v <= current:
            continue
        if not fs.exists(_snap_path(jvm, table_dir, name, "_CLAIM")):
            continue
        if fs.exists(
            _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{v}.json")
        ):
            continue  # committed between the version read and here
        if not dry_run:
            fs.delete(st.getPath(), True)
        removed.append(v)
    swept = []
    sdir = _snap_path(jvm, table_dir, "_staging")
    if fs.exists(sdir):
        import time

        cutoff_ms = (time.time() - max(0.0, staging_grace_sec)) * 1000.0
        leftover = False
        for sub in fs.listStatus(sdir):
            newest = sub.getModificationTime()
            if sub.isDirectory():
                for fst in fs.listStatus(sub.getPath()):
                    newest = max(newest, fst.getModificationTime())
            if newest < cutoff_ms:
                if not dry_run:
                    fs.delete(sub.getPath(), True)
                swept.append(f"_staging/{sub.getPath().getName()}")
            else:
                leftover = True  # possibly a LIVE writer's stage: keep
        if not leftover and not dry_run:
            fs.delete(sdir, True)
    return sorted(removed) + sorted(swept)


def snapshot_constraints(spark: SparkSession, table_dir: str) -> dict:
    """The table's persistent CHECK constraints (``name -> SQL boolean
    expression``), empty when none were ever added."""
    v = snapshot_version(spark, table_dir)
    if v < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    return dict(_read_manifest(spark, table_dir, v).get("constraints") or {})


def snapshot_add_constraint(
    spark: SparkSession, table_dir: str, name: str, expr: str
) -> int:
    """ALTER TABLE ADD CONSTRAINT (the Delta shape): validate that every
    CURRENT row satisfies ``expr`` (one aggregate scan — adding a
    constraint a table already violates must fail, not lie), then commit
    a metadata-only version carrying the file list verbatim plus the new
    rule. From that version on, EVERY write path — ``snapshot_write``
    (full replace), ``snapshot_upsert`` / ``snapshot_apply_cdc`` (and
    the streaming maintainer built on them), ``snapshot_merge`` —
    enforces the rule on the rows it stages, counting violations inside
    the staging write itself (an ``Observation``, no extra pass) and
    aborting the commit typed (``ConstraintViolationError``) before the
    record is published. Maintenance that moves rows without changing
    them (delete, optimize, compact, restore, clones, restamp) carries
    the constraint set; enforcement on staged rows is therefore
    inductive over the whole history. NULL rule results count as
    violations, as in ``check_expectations``."""
    current = snapshot_version(spark, table_dir)
    if current < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _read_manifest(spark, table_dir, current)
    if manifest.get("files") is None:
        raise ValueError("snapshot_add_constraint needs a file-list manifest")
    existing = dict(manifest.get("constraints") or {})
    if existing.get(name) == expr:
        return current  # idempotent re-add: nothing to commit
    if name in existing:
        raise ValueError(
            f"snapshot_add_constraint: {name!r} already exists with a "
            f"different expression ({existing[name]!r}) — drop it first"
        )
    check_expectations(snapshot_read(spark, table_dir), {name: expr})
    payload = {
        "version": current + 1,
        "dir": f"v={current + 1}",
        "files": manifest["files"],
        "schema": manifest.get("schema"),
        "constraints": {**existing, name: expr},
        "constraint_added": name,
        "op": "add-constraint",
    }
    for carry in ("bloom_spec", "dv", "properties", "cdf"):
        if manifest.get(carry):
            payload[carry] = manifest[carry]
    _commit_record(spark, table_dir, current + 1, payload)
    return current + 1


def snapshot_drop_constraint(
    spark: SparkSession, table_dir: str, name: str
) -> int:
    """ALTER TABLE DROP CONSTRAINT: metadata-only commit without the
    named rule. Raises KeyError if the constraint does not exist (a
    typo'd drop must not silently succeed)."""
    current = snapshot_version(spark, table_dir)
    if current < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _read_manifest(spark, table_dir, current)
    existing = dict(manifest.get("constraints") or {})
    if name not in existing:
        raise KeyError(
            f"snapshot_drop_constraint: no constraint {name!r} on {table_dir}"
        )
    del existing[name]
    payload = {
        "version": current + 1,
        "dir": f"v={current + 1}",
        "files": manifest["files"],
        "schema": manifest.get("schema"),
        "constraint_dropped": name,
        "op": "drop-constraint",
    }
    if existing:
        payload["constraints"] = existing
    for carry in ("bloom_spec", "dv", "properties", "cdf"):
        if manifest.get(carry):
            payload[carry] = manifest[carry]
    _commit_record(spark, table_dir, current + 1, payload)
    return current + 1


def snapshot_restore(spark: SparkSession, table_dir: str, to_version: int) -> int:
    """Commit ``to_version``'s state as the NEW current version (the
    RESTORE shape): the new commit record simply references the old
    version's file list — zero bytes move, the operation costs one
    manifest read and one atomic record create regardless of table size,
    and the rolled-back-over versions stay time-travelable until
    vacuumed. Reachability vacuum then treats the restored version's
    files as current, so a restore also PROTECTS them. Raises if the
    target's data is no longer fully present (vacuumed) — restoring to a
    hole would commit a version that cannot be read."""
    fs, jvm = _snap_fs(spark, table_dir)
    manifest = _read_manifest(spark, table_dir, to_version)
    files = manifest.get("files")
    if files is None:
        raise ValueError(
            f"snapshot_restore: version {to_version} in {table_dir} has a "
            f"v1 (no-file-list) manifest — read it and snapshot_write the "
            f"rows instead"
        )
    missing = [
        e["path"]
        for e in files
        if not fs.exists(_snap_path(jvm, _entry_uri(table_dir.rstrip("/"), e["path"])))
    ]
    if manifest.get("dv") and not fs.exists(
        _snap_path(jvm, _entry_uri(table_dir.rstrip("/"), manifest["dv"]["dir"]))
    ):
        missing.append(manifest["dv"]["dir"])
    if missing:
        raise FileNotFoundError(
            f"snapshot_restore: version {to_version} in {table_dir} is no "
            f"longer fully present (vacuumed?) — {len(missing)} file(s) "
            f"missing, e.g. {missing[0]}"
        )
    current = snapshot_version(spark, table_dir)
    m_cur = _read_manifest(spark, table_dir, current)
    version = current + 1
    payload = {
        "version": version,
        "dir": f"v={version}",
        "files": files,
        "schema": manifest.get("schema"),
        "restored_from": to_version,
        "op": "restore",
    }
    if manifest.get("dv"):
        # the restored state's deletion vector IS part of that state; the
        # pointer is version-relative and the dataset is vacuum-protected
        payload["dv"] = manifest["dv"]
    if manifest.get("bloom_spec"):
        payload["bloom_spec"] = manifest["bloom_spec"]
    claimed = None
    if manifest.get("cdf") or m_cur.get("cdf"):
        # once enabled, a restore never silently drops the feed contract
        # (either endpoint's flag keeps it on)
        payload["cdf"] = True
        if (
            m_cur.get("files") is not None
            and m_cur.get("schema")
            and manifest.get("schema")
        ):
            # hold the v=N claim while writing _changes/v=N: a
            # concurrent writer deriving the same next version must not
            # interleave its own change files into our directory (the
            # merge family holds this claim implicitly via its staging)
            claimed = _claim_version_dir(spark, table_dir, version)
            # a restore only re-references immutable files, so the
            # file-wise multiset diff is exact net CDC once identical
            # rows cancel: restoring across a COW rewrite puts a
            # survivor's row content in BOTH sides (old = the rewritten
            # file, new = the original), and the exceptAll pair nets
            # those out so only true churn emits (delete for rows
            # leaving, insert for rows returning; DV deltas on shared
            # files included). Both sides are bounded by files unique
            # to one side — O(span churn), never O(table).
            old_side, new_side, cdc_cols = _state_diff_sides(
                spark, table_dir, m_cur, manifest, "snapshot_restore"
            )
            payload["changes"] = _materialize_changes(
                spark, table_dir, version,
                old_side.exceptAll(new_side)
                .withColumn("_change_type", F.lit("delete"))
                .unionByName(
                    new_side.exceptAll(old_side)
                    .withColumn("_change_type", F.lit("insert"))
                ),
            )
    if manifest.get("constraints"):
        # the restored version's rows passed ITS constraint set; that set
        # (not a later one) travels with the restored state
        payload["constraints"] = manifest["constraints"]
    if manifest.get("properties"):
        # the restored content IS the target version's: its stamp applies
        payload["properties"] = manifest["properties"]
    try:
        _commit_record(spark, table_dir, version, payload)
    except SnapshotConflictError:
        if claimed is not None:
            # our claim and change files were never published — remove
            # them so the next claimant's exists-check doesn't trip
            fs.delete(_snap_path(jvm, claimed), True)
            fs.delete(_snap_path(jvm, table_dir, "_changes", f"v={version}"), True)
        raise
    return version


def _live_clone_pins(
    spark: SparkSession, table_dir: str, caller: str, drop_stale: bool
) -> list[tuple[str, int]]:
    """LIVE shallow-clone registrations under ``_clones/`` as
    ``(clone_dir, pinned_source_version)`` pairs — the versions that both
    ``snapshot_vacuum`` (reachability) and ``snapshot_expire_log``
    (expiry clamp) must honor. Registrations whose clone table no longer
    exists are stale: deleted when ``drop_stale`` (a real maintenance
    run), kept and ignored otherwise (dry runs must not mutate). A torn
    registration fails typed — it is indistinguishable from a live
    clone's protection record, and silently skipping it could let the
    caller destroy state that clone still reads."""
    import json

    fs, jvm = _snap_fs(spark, table_dir)
    cdir = _snap_path(jvm, table_dir, "_clones")
    regs = [
        r
        for r in (fs.listStatus(cdir) if fs.exists(cdir) else [])
        # dot-hidden names are in-flight registration tmps
        if r.getPath().getName().endswith(".json")
        and not r.getPath().getName().startswith(".")
    ]
    pins: list[tuple[str, int]] = []
    for rst in regs:
        stream = fs.open(rst.getPath())
        try:
            txt = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()
        try:
            reg = json.loads(txt)
            clone, pin = reg["clone"], int(reg["source_version"])
        except (ValueError, KeyError, TypeError) as e:
            # a torn registration (clone writer crashed mid-write on a
            # pre-atomic-rename layout) could belong to a LIVE clone —
            # fail typed and actionable instead of guessing (force=True
            # on vacuum ignores registrations entirely)
            raise ValueError(
                f"{caller}: unreadable clone registration {rst.getPath()} "
                f"— if no live clone references this table, delete the "
                f"file (or, for vacuum, run force=True, which ignores "
                f"clone protection entirely): {e}"
            ) from e
        try:
            alive = snapshot_version(spark, clone) >= 1
        except Exception:
            alive = False  # unreachable storage: assume gone
        if not alive:
            if drop_stale:
                fs.delete(rst.getPath(), False)  # stale registration
            continue
        pins.append((clone, pin))
    return pins


def snapshot_expire_log(
    spark: SparkSession,
    table_dir: str,
    keep_last: int = 100,
    dry_run: bool = False,
) -> list[int]:
    """Bound the commit LOG (Delta's ``logRetentionDuration``, in version
    units): delete manifest records older than the newest ``keep_last``
    versions, plus checkpoint files the current pointer no longer needs.
    Returns the expired version numbers.

    A year of streaming appends leaves 100k+ ``_manifests/N.json``
    records; version resolution is already O(1)+O(tail) via the
    manifest-log checkpoint, but the directory itself still grows without
    bound and every fallback listing pays it. Expiry is SAFE BY
    CONSTRUCTION in this order:

    1. a fresh checkpoint is forced at the CURRENT version first, so
       ``snapshot_history`` / ``snapshot_version_asof`` keep serving the
       expired versions' summaries from the compacted log (better than
       Delta, which forgets expired history);
    2. only then are records older than the cut deleted. Data files are
       NOT touched — carried files stay readable because reachability is
       decided by ``snapshot_vacuum`` from the KEPT manifests, never by
       log age.

    What expiry gives up, stated: time travel (``snapshot_read(version=
    N)`` / ``restore`` / ``snapshotfeed startingVersion=N``) to an
    expired version raises FileNotFoundError — the same contract every
    log-structured format has past its retention horizon. ``keep_last``
    is clamped to >= 1 (the current version is never expirable).

    Live shallow clones (registered under ``_clones/``) pin a source
    version whose manifest is the ONLY record of which files they carry
    — checkpoint summaries hold counts, not file lists — and clone-aware
    ``snapshot_vacuum`` reads exactly that manifest to protect the
    clone's data. Expiring it would blind vacuum and make the clone's
    files reclaimable, so the cut is CLAMPED below the oldest live
    clone's pin (expiry past a long-lived clone is a no-op until the
    clone is dropped or its registration removed). Stale registrations
    are dropped in passing (kept under ``dry_run``); a torn registration
    fails typed, exactly as in ``snapshot_vacuum``."""
    keep_last = max(1, int(keep_last))
    current = snapshot_version(spark, table_dir)
    if current < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    cut = current - keep_last  # expire versions <= cut
    if cut < 1:
        return []
    pins = _live_clone_pins(
        spark, table_dir, "snapshot_expire_log", drop_stale=not dry_run
    )
    if pins:
        cut = min(cut, min(p for _, p in pins) - 1)
        if cut < 1:
            return []
    fs, jvm = _snap_fs(spark, table_dir)
    expired = [
        v
        for v in range(1, cut + 1)
        if fs.exists(
            _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{v}.json")
        )
    ]
    if dry_run or not expired:
        return expired
    # checkpoint BEFORE deleting: the compacted log is what keeps
    # history/as-of whole across the horizon
    _checkpoint_now(spark, table_dir, current, None)
    ck = _read_checkpoint(spark, table_dir)
    if ck is None or int(ck["version"]) < current:
        raise RuntimeError(
            f"snapshot_expire_log: could not establish a checkpoint at "
            f"v{current} under {table_dir} — refusing to delete history "
            f"the compacted log does not carry"
        )
    for v in expired:
        fs.delete(
            _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR, f"{v}.json"), False
        )
        # a version's materialized change files (_changes/v=N, cdf
        # tables) live exactly as long as its commit record: the feed
        # plans them FROM the manifest, so they are unreadable past it
        cdir = _snap_path(jvm, table_dir, "_changes", f"v={v}")
        if fs.exists(cdir):
            fs.delete(cdir, True)
    # checkpoint files below the live pointer are superseded
    mdir = _snap_path(jvm, table_dir, SNAPSHOT_MANIFEST_DIR)
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.endswith(".ckpt.json"):
            head = name[: -len(".ckpt.json")]
            if head.isdigit() and int(head) < int(ck["version"]):
                fs.delete(st.getPath(), False)
    return expired


def snapshot_vacuum(
    spark: SparkSession,
    table_dir: str,
    keep_last: int = 2,
    dry_run: bool = False,
    force: bool = False,
) -> list[int]:
    """Reclaim data not reachable from the newest ``keep_last`` versions;
    returns the versions whose directories were removed or emptied.
    ``dry_run=True`` reports the same list without deleting anything —
    the look-before-you-reclaim step.

    Shallow clones made from this table (registered under ``_clones/``
    at clone time) are PROTECTED: each live clone's pinned source
    version counts as reachable, so reclaiming can never break a
    registered clone's unrewritten entries. Registrations whose clone
    table no longer exists are stale — dropped during a real run, kept
    (and still honored) under ``dry_run``. ``force=True`` ignores the
    registry and reclaims as if no clones existed — the explicit
    I-know-better flag for abandoned clones on unreachable storage.

    Reachability, not age, decides: copy-on-write upserts make newer
    manifests reference files living in OLDER version directories, so an
    old ``v=N`` dir is swept file-by-file — anything a kept manifest still
    lists survives in place, the rest is deleted, and the dir goes only
    when nothing reachable remains in it. Vacuum itself never deletes
    commit records (they are the table history, like Delta's log; only
    ``snapshot_expire_log`` retires them, and it clamps below live clone
    pins) — time travel to a vacuumed version raises FileNotFoundError
    because its data is gone, while the current version can never be
    deleted: ``keep_last`` is clamped to >= 1. A v1 manifest (no file
    list) keeps its whole directory. If a LIVE clone's pinned manifest is
    missing (out-of-band loss), vacuum fails typed rather than guess."""
    import re

    fs, jvm = _snap_fs(spark, table_dir)
    keep_last = max(1, keep_last)
    current = snapshot_version(spark, table_dir)
    reachable: set[str] = set()
    whole_dirs: set[str] = set()
    dv_dirs: set[str] = set()
    for v in range(max(1, current - keep_last + 1), current + 1):
        try:
            m = _read_manifest(spark, table_dir, v)
        except FileNotFoundError:
            continue
        files = m.get("files")
        if files is None:
            whole_dirs.add(f"v={v}")
        else:
            reachable.update(e["path"] for e in files)
        if m.get("dv"):
            # a kept version's deletion vector is part of its state; the
            # dataset may live in an OLDER version's dir (carried by a
            # restore), so protect it by name like any reachable file
            dv_dirs.add(m["dv"]["dir"])
    if not force:
        # live registered shallow clones pin their cloned source version
        for clone, pin in _live_clone_pins(
            spark, table_dir, "snapshot_vacuum", drop_stale=not dry_run
        ):
            try:
                m = _read_manifest(spark, table_dir, pin)
            except FileNotFoundError:
                # the pin's manifest is the ONLY file-level record of what
                # the clone carries (checkpoint summaries are counts, not
                # file lists) — proceeding blind would delete a LIVE
                # clone's data. snapshot_expire_log clamps below live pins
                # so this is unreachable through the APIs; it means
                # out-of-band record loss (or a pre-clamp expiry). Fail
                # typed, never silently reclaim.
                raise FileNotFoundError(
                    f"snapshot_vacuum: live clone {clone} pins source "
                    f"version {pin}, but _manifests/{pin}.json is gone "
                    f"(expired out-of-band?) — without its file list "
                    f"vacuum cannot tell which files the clone still "
                    f"reads. Drop or re-clone the clone (then delete its "
                    f"_clones/ registration), or run force=True to "
                    f"reclaim as if no clones existed"
                ) from None
            files = m.get("files")
            if files is None:
                whole_dirs.add(f"v={pin}")
            else:
                reachable.update(e["path"] for e in files)
            if m.get("dv"):
                dv_dirs.add(m["dv"]["dir"])
    removed = []
    for st in fs.listStatus(_snap_path(jvm, table_dir)):
        name = st.getPath().getName()
        m = re.fullmatch(r"v=(\d+)", name)
        if not m or name in whole_dirs:
            continue
        v = int(m.group(1))
        if v > current - keep_last:
            continue
        kept_any = False
        swept_any = False
        for fst in fs.listStatus(st.getPath()):
            rel = f"{name}/{fst.getPath().getName()}"
            if rel in reachable or rel in dv_dirs:
                kept_any = True
            elif fst.getPath().getName().endswith(".parquet"):
                if not dry_run:
                    fs.delete(fst.getPath(), False)
                swept_any = True
        if not kept_any:
            if not dry_run:
                fs.delete(st.getPath(), True)
            removed.append(v)
        elif swept_any:
            removed.append(v)  # swept of unreachable data; carried files stay
    # DataSource-writer staging leftovers: files under `_staging/` are
    # NEVER referenced by a manifest (commits MOVE them into `v=N/`
    # first), so anything still there is a crashed/aborted writer's
    # residue — reclaimable under the same single-operator assumption
    # that covers orphan `v=N` stages (a LIVE writer's in-flight stage
    # looks identical; run vacuum only when no writer is active).
    sdir = _snap_path(jvm, table_dir, "_staging")
    if not dry_run and fs.exists(sdir):
        fs.delete(sdir, True)
    return sorted(removed)


def snapshot_compact(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    stats_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Lakehouse-native small-files compaction: rewrite the CURRENT
    snapshot into ceil(total_bytes/target) files committed as a NEW
    version — the versioned twin of ``compact``. No rename window at
    all: readers of version N are untouched while N+1 stages, the commit
    is the same atomic record create as any write, and the bloated
    version remains time-travelable until ``snapshot_vacuum`` reclaims
    it. Reads through the manifest (after copy-on-write upserts the
    current version's data spans several ``v=`` dirs) and sizes from the
    manifest's per-file byte counts — URI-capable end-to-end. By default
    re-derives ``stats_cols`` from the current manifest so compaction
    never silently drops the table's skipping power.
    Returns (new_version, file_count)."""
    import math

    fs, jvm = _snap_fs(spark, table_dir)
    v = snapshot_version(spark, table_dir)
    if v < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _read_manifest(spark, table_dir, v)
    entries = manifest.get("files")
    if entries is None:
        vdir = f"{table_dir.rstrip('/')}/v={v}"
        total = fs.getContentSummary(_snap_path(jvm, vdir)).getLength()
    else:
        total = sum(e.get("bytes", 0) for e in entries)
        if stats_cols is None:
            with_stats = next((e for e in entries if e.get("stats")), None)
            stats_cols = sorted(with_stats["stats"]) if with_stats else None
    n = max(1, math.ceil(total / target_file_bytes))
    df = snapshot_read(spark, table_dir).repartition(n)
    spec = manifest.get("bloom_spec") or {}
    return (
        snapshot_write(
            df,
            table_dir,
            stats_cols=stats_cols,
            bloom_cols=spec.get("cols"),
            bloom_bits=spec.get("m", 16384),
            bloom_hashes=spec.get("h", 5),
            # content-preserving maintenance: the table still reflects
            # whatever its properties claimed (exactly-once consumers
            # must survive an operator compacting their rollup)
            properties=manifest.get("properties"),
            # the rewritten content was READ from version v — a commit
            # that isn't v+1 would erase a concurrent writer's changes
            expected_version=v,
            _op="compact",
        ),
        n,
    )


def snapshot_optimize(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    small_file_bytes: int | None = None,
    stats_cols: list[str] | None = None,
    zorder_by: list[str] | None = None,
    dv_fraction: float | None = None,
) -> tuple[int, int, int]:
    """Bin-packing OPTIMIZE (the Delta shape): coalesce ONLY the
    current version's small files into ~target-sized ones and carry
    every adequately-sized file by reference — maintenance cost is
    O(small files), never O(table). After years of trickle upserts a
    100 TB table holds a long tail of KB-scale commit files; rewriting
    the whole table to fix them (what ``snapshot_compact`` does) costs
    a full pass, while this touches only the tail. Files at or above
    ``small_file_bytes`` (default target/2) never move — their bytes,
    stats, and Bloom entries ride into the new manifest verbatim.

    ``dv_fraction`` (0–1) additionally rewrites any file whose
    DELETION-VECTOR debt exceeds that fraction of its rows — the
    tombstone-compaction lever: merge-on-read deletes cost nothing at
    commit time but tax every subsequent read with the anti-join, so a
    maintenance policy (not incidental small-file packing) must bound
    the debt. The per-file deleted counts already live in the manifest,
    so the trigger reads zero data; rewriting the file materializes its
    survivors and PURGES its DV entries. Under-threshold files are
    carried untouched, entries intact.

    Returns ``(version, files_rewritten, files_carried)``; a no-op
    (fewer than 2 small files and no DV-debt trigger) commits nothing
    and returns the current version. Stats and Bloom filters are
    re-derived for the packed files from the manifest's own spec, so
    skipping power survives, and the rewritten-over version stays
    time-travelable until vacuumed."""
    import math

    v = snapshot_version(spark, table_dir)
    if v < 1:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    manifest = _read_manifest(spark, table_dir, v)
    entries = manifest.get("files")
    if entries is None:
        raise ValueError(
            "snapshot_optimize needs a file-list manifest — rewrite once "
            "with snapshot_write (v1-era record found)"
        )
    cutoff = small_file_bytes if small_file_bytes is not None else target_file_bytes // 2
    dv_counts = (manifest.get("dv") or {}).get("files", {})

    def _dv_heavy(e: dict) -> bool:
        if dv_fraction is None or not dv_counts:
            return False
        rows = e.get("rows") or 0
        return rows > 0 and dv_counts.get(_dv_key(e["path"]), 0) / rows >= dv_fraction

    small = [e for e in entries if e.get("bytes", 0) < cutoff or _dv_heavy(e)]
    carried = [e for e in entries if e.get("bytes", 0) >= cutoff and not _dv_heavy(e)]
    # DV debt past policy is reason enough to rewrite even ONE file;
    # plain size-packing still needs >= 2 small files to be worth a commit
    if len(small) < 2 and not any(_dv_heavy(e) for e in small):
        return v, 0, len(entries)
    if stats_cols is None:
        with_stats = next((e for e in entries if e.get("stats")), None)
        stats_cols = sorted(with_stats["stats"]) if with_stats else None
    base = table_dir.rstrip("/")
    total_small = sum(e.get("bytes", 0) for e in small)
    n = max(1, math.ceil(total_small / target_file_bytes))
    old_dv = _dv_read(spark, table_dir, manifest)
    packed = _apply_dv(
        _manifest_reader(spark, manifest).parquet(
            *[_entry_uri(base, e["path"]) for e in small]
        ),
        old_dv,
        _dv_deleted(manifest),
    )
    if zorder_by:
        # OPTIMIZE ... ZORDER BY: the packed tail is re-clustered on the
        # interleaved key so multi-dimensional min/max skipping works on
        # the result (Delta's shape); ranges come from one aggregate over
        # ONLY the small files being packed — still O(small files)
        from f1_data_pipeline_spark.operators.layout import (
            bucketize,
            interleave_bits,
            zorder_layout,
        )

        bounds = packed.agg(
            *[F.min(c).cast("double").alias(f"__lo_{c}") for c in zorder_by],
            *[F.max(c).cast("double").alias(f"__hi_{c}") for c in zorder_by],
        ).head()
        # a column that is all-NULL in the packed tail (or a tail emptied
        # by deletion-vector subtraction) has NULL bounds — it carries no
        # clustering signal, so its interleave term is skipped rather than
        # crashing on None arithmetic; with no usable column left, fall
        # back to plain coalesce packing
        terms = [
            bucketize(
                F.col(c).cast("double"),
                bounds[f"__lo_{c}"],
                max(bounds[f"__hi_{c}"], bounds[f"__lo_{c}"] + 1e-12),
            )
            for c in zorder_by
            if bounds[f"__lo_{c}"] is not None and bounds[f"__hi_{c}"] is not None
        ]
        if terms:
            zkey = interleave_bits(terms)
            # drop the helper AFTER the range-shuffle + local sort (a plain
            # projection — keeps the clustered order, keeps the table schema)
            packed = zorder_layout(packed, zkey, n).drop("__z")
        else:
            packed = packed.coalesce(n)
    else:
        packed = packed.coalesce(n)
    version, vdir_opt = _stage_version(packed, table_dir)
    _check_staged_against(
        spark, table_dir, vdir_opt, version, v, "snapshot_optimize"
    )
    staged = _staged_file_entries(spark, table_dir, version, stats_cols)
    bloom_spec = manifest.get("bloom_spec")
    _apply_blooms(spark, table_dir, version, staged, bloom_spec)
    payload = {
        "version": version,
        "dir": f"v={version}",
        "files": staged + carried,
        "schema": manifest.get("schema") or packed.schema.json(),
        "optimized_from": v,
        "op": "optimize",
    }
    # packed files drop their deletion-vector debt physically; only the
    # carried (already well-sized) files' entries survive (two-segment
    # key: entry paths may be absolute on a shallow clone)
    if old_dv is not None:
        carried_keys = sorted({_dv_key(e["path"]) for e in carried})
        dv_block = _write_dv(
            spark, table_dir, version,
            old_dv.where(F.col("path").isin(carried_keys)) if carried_keys else None,
        )
        if dv_block:
            payload["dv"] = dv_block
    if bloom_spec:
        payload["bloom_spec"] = bloom_spec
    if manifest.get("cdf"):
        payload["cdf"] = True
    if manifest.get("constraints"):
        # packing moves rows, never changes them: carry, don't re-check
        payload["constraints"] = manifest["constraints"]
    if manifest.get("properties"):
        # content-preserving: carry the exactly-once consumer stamp
        payload["properties"] = manifest["properties"]
    _commit_record(spark, table_dir, version, payload)
    return version, len(small), len(carried)
