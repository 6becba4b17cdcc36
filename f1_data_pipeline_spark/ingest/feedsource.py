"""`snapshotfeed` — a Structured Streaming SOURCE over lakehouse snapshot
tables (the Delta table-streaming shape: ``spark.readStream.format(
"delta")``, re-expressed for this repo's commit protocol).

``spark.readStream.format("snapshotfeed").load(table_dir)`` turns a
snapshot table (storage.py's ``_manifests/N.json`` commit protocol) into
a streaming source:

* **Offsets ARE table versions.** Each microbatch covers a committed
  version span ``(start, end]`` — deterministic, so checkpoint recovery
  replays the exact same rows and the engine's offset log gives
  end-to-end exactly-once into an idempotent sink (T4).
* **The first batch is the full current snapshot** (deletion-vector
  aware), then the stream TAILS the log: each later batch reads ONLY the
  files appended in its version span — O(new data) per batch on a 100 TB
  table, never O(table). ``startingVersion=N`` skips the initial
  snapshot and replays commits from version N instead.
* **Append commits stream natively; change commits are explicit.** A
  version that removes files or touches the deletion vector (upsert /
  delete / merge / restore / full replace) cannot be expressed as a pure
  row tail; the source fails with a clear message — or skips the commit
  under ``skipChangeCommits=true`` — exactly Delta's streaming contract.
* **``changeFeed=true`` streams CDC rows instead** (Delta's
  ``readChangeFeed``): every row carries ``_change_type`` and
  ``_commit_version``. Appends and the initial snapshot emit
  ``insert``; DELETION-VECTOR commits emit the tombstoned rows as
  ``delete`` — the DV delta is file-local (new positions per file), so
  each executor diffs the two position sets for its one file and takes
  exactly those rows: an append + DV-delete table (the GDPR-capable
  event-log shape this storage targets) is fully streamable INCLUDING
  deletes, with no precomputed change files. Rewrite commits
  (upsert/merge/cow-delete/restore) remain explicit failures/skips —
  the same boundary Delta solves only by persisting change files at
  write time. A downstream keyed apply (``snapshot_apply_cdc`` with
  ``op_col='_change_type'``, folding by ``_commit_version``) turns the
  feed into an exactly-once maintained replica.
  Content-preserving maintenance (OPTIMIZE / compact / restamp /
  constraint DDL, identified by the commit's ``op`` label) is always
  skipped silently: the rows did not change, so the stream must not
  re-emit them.
* **maxVersionsPerBatch=N** rate-limits steady-state reads (the
  ``maxFilesPerTrigger`` admission-control analog, in commit units).
  The FIRST batch of a reader's lifetime is uncapped: the engine asks
  for ``latestOffset`` before anything reveals the committed offset
  (observed call order — no admission-control hook exists in the Python
  source API), and capping against a GUESSED floor could return an
  offset behind the checkpoint, which the engine would commit and then
  re-deliver the gap — a duplicate bug. So the cap binds from the
  second batch of a continuous run onward (exactly-once always holds;
  only the first batch's sizing is coarse).

Why a first-class source instead of the batch consumer
(``snapshot_changes_since`` + ``snapshot_ack``): the batch consumer is
at-least-once with a caller-managed two-phase ack; this source rides the
engine's own offset log and watermark/trigger machinery, so a downstream
``stream_snapshot_upsert`` or windowed aggregate gets checkpointed
exactly-once semantics with zero consumer bookkeeping — the reference's
continuous extract→load loop (extractor.py:21-58 feeding loader.py)
becomes one ``readStream``/``writeStream`` pair end to end.

Scale/deployment note: offset planning reads ONLY manifest JSON (KBs per
version); executors read their one parquet file each via Arrow and yield
RecordBatches (zero row-at-a-time Python). Manifest access here uses
plain file IO, so the source currently requires a locally-mountable
table dir (local disk / NFS / FUSE); an object-store deployment would
swap ``_read_json``/``_list_versions`` for fsspec — the protocol itself
is already URI-capable.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFEST_DIR = "_manifests"

# commit ops that never change table CONTENT — the stream skips them
# silently (re-emitting rows a rewrite merely moved would duplicate the
# feed). Pre-op-era manifests are recognized by their marker keys.
_MAINTENANCE_OPS = {
    "optimize",
    "compact",
    "restamp",
    "add-constraint",
    "drop-constraint",
}
_MAINTENANCE_KEYS = (
    "optimized_from",
    "restamped_from",
    "constraint_added",
    "constraint_dropped",
)


def _local_dir(path: str) -> str:
    if path.startswith("file://"):
        path = path[len("file://") :]
    elif path.startswith("file:"):
        path = path[len("file:") :]
    return path.rstrip("/")


def _list_versions(table_dir: str) -> list[int]:
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def _read_json(table_dir: str, version: int) -> dict:
    p = os.path.join(table_dir, _MANIFEST_DIR, f"{version}.json")
    try:
        with open(p, "rb") as f:
            return json.loads(f.read())
    except FileNotFoundError:
        raise FileNotFoundError(
            f"snapshotfeed: version {version} was never committed (or was "
            f"removed) under {table_dir} — cannot plan the batch"
        ) from None


def _abs_entry(table_dir: str, path: str) -> str:
    # shallow-clone manifests hold ABSOLUTE entry paths; regular entries
    # are table-relative (same resolution rule as storage._entry_uri)
    if path.startswith("/") or "://" in path or path.startswith("file:"):
        return _local_dir(path) if path.startswith("file:") else path
    return f"{table_dir}/{path}"


def _dv_key(entry_path: str) -> str:
    return "/".join(entry_path.rstrip("/").split("/")[-2:])


class _FeedFile(InputPartition):
    """One appended (or initial-snapshot) data file; ``dv_dir`` names the
    version's deletion-vector dataset when positions must be subtracted.

    Change-feed delta partitions set ``delta_from``: the rows to emit are
    the file positions present in ``dv_dir`` but NOT in ``delta_from``
    (new tombstones → ``change='delete'``; with the dirs swapped, a
    restore's resurrected positions → ``change='insert'``)."""

    def __init__(
        self,
        path: str | None,
        dv_dir: str | None = None,
        dv_key: str | None = None,
        version: int | None = None,
        change: str = "insert",
        delta_from: str | None = None,
        delta: bool = False,
    ):
        self.path = path
        self.dv_dir = dv_dir
        self.dv_key = dv_key
        self.version = version
        self.change = change
        self.delta_from = delta_from
        self.delta = delta


def _read_file(part: _FeedFile, schema_json: str, change_feed: bool):
    """Executor-side read of one partition — shared by the batch and
    stream readers: open the parquet file with Arrow, subtract (or diff)
    deletion-vector positions, project onto the declared data schema
    (pre-evolution files null-fill later columns), append change-feed
    metadata columns when enabled, and yield RecordBatches."""
    if part.path is None:
        return
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    declared = StructType.fromJson(json.loads(schema_json))
    meta_cols = {"_change_type", "_commit_version"} if change_feed else set()
    data_fields = StructType(
        [f for f in declared.fields if f.name not in meta_cols]
    )
    target = to_arrow_schema(data_fields)
    # nullability-tolerant cast: pre-evolution files null-fill added
    # columns, and Spark treats arrow nullability as advisory here
    target = pa.schema([f.with_nullable(True) for f in target])
    tbl = pq.read_table(part.path)

    def _positions(dv_dir: str | None) -> set[int]:
        if not dv_dir:
            return set()
        import pyarrow.compute as pc

        dv = pq.read_table(dv_dir)
        return {
            int(p)
            for p in dv.filter(pc.equal(dv["path"], part.dv_key))["pos"].to_pylist()
        }

    def _project(sub, change):
        cols = {}
        for field in target:
            if field.name in sub.column_names:
                cols[field.name] = sub.column(field.name)
            else:
                cols[field.name] = pa.nulls(sub.num_rows, field.type)
        out = pa.table(cols).cast(target)
        if change_feed:
            n = out.num_rows
            out = out.append_column(
                "_change_type", pa.array([change] * n, pa.string())
            ).append_column(
                "_commit_version",
                pa.array([int(part.version or 0)] * n, pa.int64()),
            )
        yield from out.to_batches()

    if part.delta:
        # change-feed delta over one file: new tombstones stream as
        # deletes; positions a restore removed from the DV resurface
        # as inserts — both exact set differences of the two datasets
        cur, prev = _positions(part.dv_dir), _positions(part.delta_from)
        for positions, change in (
            (sorted(cur - prev), "delete"),
            (sorted(prev - cur), "insert"),
        ):
            if not positions:
                continue
            yield from _project(
                tbl.take(pa.array(positions, type=pa.int64())), change
            )
        return
    if part.dv_dir:
        pos = _positions(part.dv_dir)
        if pos:
            keep = [i for i in range(tbl.num_rows) if i not in pos]
            # explicit index type: an empty keep-list (fully-deleted
            # file) would otherwise infer a null-typed indices array
            tbl = tbl.take(pa.array(keep, type=pa.int64()))
    yield from _project(tbl, part.change)


def _live_file_partitions(
    table_dir: str, version: int, where: list[tuple] | None = None
) -> list[_FeedFile]:
    """One partition per LIVE data file of a committed version (DV
    attached where positions must be subtracted), optionally pruned by
    the manifest envelope/Bloom stats against pushed-down where-triples
    — a superset guarantee (pruning never drops a matching row; the
    engine still applies the exact filters to the surviving rows)."""
    m = _read_json(table_dir, version)
    if m.get("files") is None:
        raise ValueError(
            "snapshotfeed needs file-list manifests — rewrite the table "
            "once with snapshot_write (v1-era record found)"
        )
    dv = m.get("dv")
    dv_files = (dv or {}).get("files", {})
    dv_dir = _abs_entry(table_dir, dv["dir"]) if dv else None
    parts: list[_FeedFile] = []
    if where:
        from f1_data_pipeline_spark.storage import _entry_prunable
    for entry in m["files"]:
        if not entry.get("rows", 0):
            continue
        if where and _entry_prunable(entry, where):
            continue
        key = _dv_key(entry["path"])
        parts.append(
            _FeedFile(
                _abs_entry(table_dir, entry["path"]),
                dv_dir if dv_files.get(key) else None,
                key,
                version=version,
            )
        )
    if not parts:
        parts.append(_FeedFile(None))  # zero-row scan, planner satisfied
    return parts


class SnapshotFeedBatchReader(DataSourceReader):
    """BATCH reader for snapshot tables through the standard source API:
    ``spark.read.format("snapshotfeed").load(dir)`` (and therefore plain
    SQL: ``CREATE TEMPORARY VIEW t USING snapshotfeed OPTIONS (path
    ...)``) — the same live-row semantics as ``storage.snapshot_read``,
    with ``version=N`` time travel and pushed-down filters pruned at the
    MANIFEST level (min/max envelopes + per-file Bloom probes) before
    any file is listed or opened. Pruning is a superset guarantee, so
    every pushed filter is returned to the engine for exact re-apply —
    the same contract parquet's PushedFilters carry."""

    def __init__(self, schema, options):
        path = options.get("path")
        if not path:
            raise ValueError(
                "snapshotfeed requires a table dir: .load('/path/to/table')"
            )
        self._dir = _local_dir(path)
        v = options.get("version")
        self._version = int(v) if v is not None else None
        self._schema_json = schema.json()
        self._where: list[tuple] = []

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if isinstance(attr, tuple) and len(attr) == 1 else None
            if col is not None:
                if type(f) in ops:
                    self._where.append((col, ops[type(f)], f.value))
                elif isinstance(f, IsNull):
                    self._where.append((col, "is_null", None))
                elif isinstance(f, IsNotNull):
                    self._where.append((col, "is_not_null", None))
            # ALL filters go back to the engine: manifest pruning is a
            # superset guarantee, never an exact evaluation
            yield f

    def partitions(self):
        versions = _list_versions(self._dir)
        if not versions:
            raise FileNotFoundError(
                f"snapshotfeed: no committed snapshot in {self._dir}"
            )
        v = self._version if self._version is not None else versions[-1]
        return _live_file_partitions(self._dir, v, self._where)

    def read(self, part: _FeedFile):
        yield from _read_file(part, self._schema_json, False)


class SnapshotFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options):
        path = options.get("path")
        if not path:
            raise ValueError(
                "snapshotfeed requires a table dir: .load('/path/to/table')"
            )
        self._dir = _local_dir(path)
        self._schema_json = schema.json()
        sv = options.get("startingversion", options.get("startingVersion"))
        self._starting = int(sv) if sv is not None else None
        self._skip_changes = str(
            options.get("skipchangecommits", options.get("skipChangeCommits", "false"))
        ).lower() in ("true", "1")
        mv = options.get("maxversionsperbatch", options.get("maxVersionsPerBatch"))
        self._max_versions = int(mv) if mv else None
        if self._max_versions is not None and self._max_versions < 1:
            raise ValueError("snapshotfeed: maxVersionsPerBatch must be >= 1")
        self._change_feed = str(
            options.get("changefeed", options.get("changeFeed", "false"))
        ).lower() in ("true", "1")
        if self._change_feed:
            names = [f.name for f in schema.fields]
            if "_change_type" not in names or "_commit_version" not in names:
                raise ValueError(
                    "snapshotfeed: changeFeed=true needs _change_type and "
                    "_commit_version in the schema (omit .schema() — the "
                    "source declares them itself)"
                )
        self._last_end: int | None = None

    # -- driver-side planning (manifest JSON only, no data IO) ----------

    def initialOffset(self) -> dict:
        versions = _list_versions(self._dir)
        if not versions:
            raise FileNotFoundError(
                f"snapshotfeed: no committed snapshot in {self._dir}"
            )
        if self._starting is not None:
            if self._starting < 1:
                raise ValueError(
                    "snapshotfeed: startingVersion must be >= 1 (omit it "
                    "for the initial-snapshot-then-tail default)"
                )
            return {"version": self._starting - 1, "mode": "replay"}
        return {"version": 0, "mode": "snapshot"}

    def latestOffset(self) -> dict:
        versions = _list_versions(self._dir)
        cur = versions[-1] if versions else 0
        # cap only against a KNOWN cursor (set by this run's previous
        # partitions() call). Guessing a floor here could return an
        # offset BEHIND the engine's committed checkpoint, which it
        # would commit and then re-deliver the gap — never regress.
        if self._max_versions is not None and self._last_end is not None:
            cur = min(cur, self._last_end + self._max_versions)
        return {"version": cur, "mode": "replay"}

    def partitions(self, start: dict, end: dict) -> list[_FeedFile]:
        s, e = int(start["version"]), int(end["version"])
        self._last_end = e
        parts: list[_FeedFile] = []
        if start.get("mode") == "snapshot":
            # initial batch: the FULL live table at version e (DV-aware)
            parts.extend(
                p
                for p in _live_file_partitions(self._dir, e)
                if p.path is not None
            )
        else:
            for v in range(s + 1, e + 1):
                m = _read_json(self._dir, v)
                op = m.get("op")
                if op in _MAINTENANCE_OPS or (
                    op is None and any(k in m for k in _MAINTENANCE_KEYS)
                ):
                    continue  # content-preserving: nothing to emit
                # v=1 is table birth: its predecessor is the empty table
                prev = _read_json(self._dir, v - 1) if v > 1 else {"files": []}
                if m.get("files") is None or prev.get("files") is None:
                    raise ValueError(
                        "snapshotfeed needs file-list manifests on both "
                        "span endpoints (v1-era record found)"
                    )
                prev_paths = {x["path"] for x in prev["files"]}
                added = [x for x in m["files"] if x["path"] not in prev_paths]
                removed = prev_paths - {x["path"] for x in m["files"]}
                dv_changed = (m.get("dv") or None) != (prev.get("dv") or None)
                if self._change_feed and dv_changed and not removed:
                    # deletion-vector-only commit: the change IS file-local
                    # (new tombstoned positions per file), so it streams as
                    # delete rows — no rewrite to reconcile. One partition
                    # per affected file; the executor diffs the two DV
                    # datasets for its file and emits both directions
                    # (delete for new tombstones; a restore that shrank a
                    # DV resurfaces those rows as inserts).
                    cur_dv, prev_dv = m.get("dv"), prev.get("dv")
                    cur_counts = (cur_dv or {}).get("files", {})
                    prev_counts = (prev_dv or {}).get("files", {})
                    by_key = {
                        _dv_key(x["path"]): x["path"] for x in m["files"]
                    }
                    cur_dir = (
                        _abs_entry(self._dir, cur_dv["dir"]) if cur_dv else None
                    )
                    prev_dir = (
                        _abs_entry(self._dir, prev_dv["dir"]) if prev_dv else None
                    )
                    for key in sorted(set(cur_counts) | set(prev_counts)):
                        if (
                            op == "delete"
                            and cur_counts.get(key, 0) == prev_counts.get(key, 0)
                        ):
                            # a DELETE commit only ADDS positions, so an
                            # unchanged count proves unchanged positions.
                            # A restore swaps the whole DV dataset and can
                            # preserve a count while changing positions —
                            # those files must be diffed, not skipped.
                            continue
                        if key not in by_key:
                            continue  # file left the table in an earlier commit
                        parts.append(
                            _FeedFile(
                                _abs_entry(self._dir, by_key[key]),
                                cur_dir,
                                key,
                                version=v,
                                change="delete",
                                delta_from=prev_dir,
                                delta=True,
                            )
                        )
                    for entry in added:
                        if entry.get("rows", 0):
                            parts.append(
                                _FeedFile(
                                    _abs_entry(self._dir, entry["path"]),
                                    version=v,
                                )
                            )
                    continue
                if removed or dv_changed:
                    if self._skip_changes:
                        continue
                    raise ValueError(
                        f"snapshotfeed: version {v} of {self._dir} is a "
                        f"CHANGE commit (op={op or 'unknown'}; "
                        f"{len(removed)} file(s) removed"
                        f"{', deletion vector changed' if dv_changed else ''}) "
                        f"— a streaming tail can only replay appends. "
                        f"Restart the stream with a fresh checkpoint (the "
                        f"initial snapshot re-baselines), or set "
                        f"skipChangeCommits=true to skip such commits."
                    )
                for entry in added:
                    if entry.get("rows", 0):
                        parts.append(
                            _FeedFile(
                                _abs_entry(self._dir, entry["path"]), version=v
                            )
                        )
        if not parts:
            # an all-maintenance (or empty-append) span still runs as a
            # zero-row batch; a sentinel keeps the planner satisfied
            parts.append(_FeedFile(None))
        return parts

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine's checkpoint; nothing to clean

    # -- executor-side read: one parquet file -> Arrow batches ----------

    def read(self, part: _FeedFile):
        yield from _read_file(part, self._schema_json, self._change_feed)


class SnapshotFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snapshotfeed"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "snapshotfeed requires a table dir: .load('/path/to/table')"
            )
        tdir = _local_dir(path)
        versions = _list_versions(tdir)
        if not versions:
            raise FileNotFoundError(f"snapshotfeed: no committed snapshot in {tdir}")
        # batch time travel reads the TARGET version's committed schema
        # (a later evolution must not leak columns into an old snapshot)
        v = self.options.get("version")
        m = _read_json(tdir, int(v) if v is not None else versions[-1])
        sch = m.get("schema")
        if not sch:
            raise ValueError(
                "snapshotfeed: the table carries no committed schema "
                "(v1-era record) — rewrite it once with snapshot_write"
            )
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        base = StructType.fromJson(json.loads(sch))
        if str(
            self.options.get("changefeed", self.options.get("changeFeed", "false"))
        ).lower() in ("true", "1"):
            return StructType(
                base.fields
                + [
                    StructField("_change_type", StringType(), False),
                    StructField("_commit_version", LongType(), False),
                ]
            )
        return base

    def reader(self, schema) -> SnapshotFeedBatchReader:
        if str(
            self.options.get("changefeed", self.options.get("changeFeed", "false"))
        ).lower() in ("true", "1"):
            raise ValueError(
                "snapshotfeed: changeFeed is a STREAMING option (a batch "
                "read of a snapshot is all inserts by definition) — use "
                "spark.readStream, or storage.snapshot_changes for a "
                "batch change feed between two versions"
            )
        return SnapshotFeedBatchReader(schema, self.options)

    def streamReader(self, schema) -> SnapshotFeedStreamReader:
        return SnapshotFeedStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotently register the format on a session:
    ``spark.readStream.format('snapshotfeed').load(table_dir)`` /
    ``spark.read.format('snapshotfeed').load(table_dir)``. The batch
    reader implements ``pushFilters`` (manifest-level pruning), which
    Spark refuses to even initialize unless the runtime conf
    ``spark.sql.python.filterPushdown.enabled`` is on — enable it here
    so a registered session can always read the format."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotFeedDataSource)
