"""Gold-layer analytics (SURVEY §2.6 A4–A9, §2.1 S5, dashboard.py parity)
— plus ``observe()`` in-flight metrics, the Spark-native replacement for the
reference's hand-rolled throughput counters (main_supabase.py:27-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def table_counts(tables: dict[str, DataFrame]) -> dict[str, int]:
    """A4: COUNT(*) per table (dashboard.py:56-60). Parquet count() is
    metadata-only (aggregate pushdown) — no data scan."""
    return {name: df.count() for name, df in tables.items()}


def recent_counts(df: DataFrame, ts_col: str, minutes: int = 5) -> DataFrame:
    """A5: rows in the trailing window, anchored at max(ts) so the query is
    deterministic on replayed data (dashboard.py:65-68)."""
    mx = df.agg(F.max(ts_col).alias("_mx"))
    return (
        df.crossJoin(F.broadcast(mx))
        .where(F.col(ts_col) > F.col("_mx") - F.expr(f"INTERVAL {minutes} MINUTE"))
        .agg(F.count("*").alias("c"))
    )


def last_update(df: DataFrame, ts_col: str) -> DataFrame:
    """A6: MAX(created_at) freshness probe (dashboard.py:71-74)."""
    return df.agg(F.max(ts_col).alias("last_update"))


def observed_run(df: DataFrame, measures: dict[str, F.Column]) -> tuple[DataFrame, Observation]:
    """A9: attach observe() metrics — computed during the SAME job that
    materializes ``df`` (zero extra passes), replacing the reference's
    driver-side counters. Read ``obs.get`` after an action."""
    obs = Observation()
    named = [c.alias(n) for n, c in measures.items()]
    return df.observe(obs, *named), obs


def verify_tables(spark: SparkSession, expected: dict[str, list[str]]) -> dict[str, dict]:
    """S5 catalog introspection (verify_tables.py:89-206 analog): for each
    expected table, report existence + missing/extra columns."""
    report: dict[str, dict] = {}
    for name, cols in expected.items():
        exists = spark.catalog.tableExists(name)
        entry: dict = {"exists": exists, "missing": [], "extra": []}
        if exists:
            actual = [c.name for c in spark.catalog.listColumns(name)]
            entry["missing"] = sorted(set(cols) - set(actual))
            entry["extra"] = sorted(set(actual) - set(cols))
        report[name] = entry
    return report


def sketch_rollup(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """Mergeable-cardinality rollup: per-group Apache DataSketches HLL
    sketches (``hll_sketch_agg``) plus a grand-total row computed by
    UNIONING the group sketches — not by re-scanning the data. Output:
    (group, distinct_est) with group='__TOTAL__' for the union row.

    This is the 100 TB incremental-rollup pattern the exact
    ``count(distinct)`` can't give you: persist the binary ``sketch``
    column per day/partition, then answer "distinct users this quarter"
    by merging kilobyte sketches instead of re-shuffling a quarter of raw
    keys. Sketches combine map-side; accuracy ~1.6%/sqrt(2^lg_k)
    (lg_k=12 → ~2.5% rel err, asserted ≤5% in tests vs exact counts).

    ``sketches`` (the intermediate with the binary column) is returned by
    ``sketch_table`` below for persistence; this function returns the
    human-readable estimates. This is the gold-layer single-key face of
    the canonical generalized machinery in ``operators/sketches.py``
    (multi-key, arbitrary rollup levels, KLL/KMV siblings) — both paths
    share one implementation.
    """
    from f1_data_pipeline_spark.operators.sketches import hll_rollup

    sk = sketch_table(df, group_col, value_col, lg_k)
    per = sk.select(group_col, F.hll_sketch_estimate("sketch").alias("distinct_est"))
    total = hll_rollup(sk, []).select(
        F.lit("__TOTAL__").alias(group_col),
        F.col("approx_distinct").alias("distinct_est"),
    )
    return per.unionByName(total).orderBy(group_col)


def sketch_table(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """The persistable form: (group, sketch binary). Write this to parquet
    per ingest increment; later rollups ``hll_union_agg`` across
    increments without touching raw data. Delegates to
    ``operators/sketches.hll_distinct`` (the canonical implementation)."""
    from f1_data_pipeline_spark.operators.sketches import hll_distinct

    return hll_distinct(df, [group_col], value_col, lg_k).select(group_col, "sketch")


def misra_gries_candidates(
    df: DataFrame, col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra–Gries frequency summaries: each task folds its
    stream of values into a counter bounded at ``capacity`` entries
    (standard decrement-merge, so executor memory is O(capacity) no
    matter how many distincts the partition holds — the property a plain
    per-partition ``value_counts`` lacks). Output is the union of summary
    rows ``(value, lower_bound)``, sized ≤ capacity × num_tasks.

    Guarantee (Misra–Gries 1982): any value with global frequency
    > N/(capacity+1) appears in at least one partition summary — so the
    union is a complete candidate set for heavy hitters above that
    threshold."""
    import pandas as pd

    def kernel(batches):
        counter: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counter[v] = counter.get(v, 0) + int(c)
                if len(counter) > capacity:
                    d = min(counter.values())
                    counter = {
                        k: n - d for k, n in counter.items() if n - d > 0
                    }
        if counter:
            yield pd.DataFrame(
                {col: list(counter), "lower_bound": list(counter.values())}
            )

    return df.select(col).mapInPandas(
        kernel, f"{col} string, lower_bound long"
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """EXACT global top-k most frequent values in two passes:
    bounded-memory Misra–Gries candidate summaries per partition
    (``misra_gries_candidates``), then one exact recount restricted to the
    broadcast candidate set. No full GROUP BY over all distincts ever
    happens — the only wide shuffle carries candidate rows.

    Exact as long as the true k-th frequency exceeds N/(capacity+1)
    (the MG completeness threshold); ``capacity`` defaults to 8·k, far
    past that bound on any skewed (Zipfian) distribution. Ties broken by
    value so the result is deterministic.

    The guarantee is RUNTIME-CHECKED, not assumed (a flat distribution
    can put the true k-th below the threshold, silently dropping top-k
    members): the plan carries two broadcast 1-row aggregates — N (total
    non-null values) and the candidate coverage (Σ candidate counts,
    candidate cardinality) — and an ``assert_true`` filter raises at
    execution time unless either (a) the candidates cover every
    occurrence (Σ == N, i.e. nothing was ever decremented away — then the
    recount is trivially exact), or (b) there are ≥ k candidates and
    every returned count exceeds N/(capacity+1) (then no absent value can
    outrank any returned row). On failure the error says to raise
    ``capacity``. The check is lazy — it rides the same job the caller
    triggers. Honest cost accounting: N adds ONE column-pruned
    ``count(col)`` scan on top of the summary and recount passes — cheap
    relative to either Python pass, and the alternatives are worse
    (deriving N from the summary pass would evaluate that mapInPandas
    subplan twice, since its two consumers share no exchange Spark could
    reuse)."""
    capacity = capacity or 8 * k
    cands = (
        misra_gries_candidates(df, col, capacity).select(col).distinct()
    )
    recount = (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    top = recount.orderBy(F.desc("cnt"), col).limit(k)
    total = df.agg(F.count(col).alias("__N"))
    coverage = recount.agg(
        F.sum("cnt").alias("__covered"), F.count("*").alias("__ncand")
    )
    exact = (F.col("__covered") == F.col("__N")) | (
        (F.col("__ncand") >= F.lit(k))
        & (F.col("cnt") > F.col("__N") / F.lit(capacity + 1))
    )
    return (
        top.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(coverage))
        .where(
            F.assert_true(
                exact,
                F.concat(
                    F.lit(
                        "heavy_hitters: Misra-Gries completeness guarantee does "
                        f"not hold for k={k}, capacity={capacity} (true k-th "
                        "frequency <= N/(capacity+1)); raise capacity"
                    )
                ),
            ).isNull()
        )
        .select(col, "cnt")
        .orderBy(F.desc("cnt"), col)
    )


def partial_aggregate(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """The persistable partial-aggregate state for incremental rollup
    maintenance: per key → (n, sum, min, max). Every measure here is
    ALGEBRAIC — mergeable by pairwise combination — which is exactly what
    makes the increment pattern sound; averages are derived at read time
    (``finalize_aggregate``), never stored."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("s"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )


def merge_partial_aggregates(state: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a new increment's partials into the persisted state: union +
    one keyed re-aggregate (sum of n/s, min of mn, max of mx). The
    100 TB daily-rollup loop: each day aggregates ONLY its own data, and
    quarter-to-date state updates by merging day-sized partials — history
    is never re-scanned (same contract as ``sketch_rollup`` for distinct
    counts). The merge shuffles |state keys| + |delta keys| rows, not
    facts."""
    both = state.unionByName(delta)
    return both.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def finalize_aggregate(state: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time view over the partial state: derived avg joins the
    algebraic measures; no information lives only here."""
    return state.select(
        *keys,
        F.col("n"),
        F.col("s").alias("total"),
        (F.col("s") / F.col("n")).alias("avg"),
        F.col("mn").alias("min"),
        F.col("mx").alias("max"),
    )


def sync_rollup_from_changes(
    spark: SparkSession,
    source_dir: str,
    source_key: str,
    rollup_dir: str,
    group_keys: list[str],
    value_col: str,
) -> tuple[int, int]:
    """Exactly-once incremental view maintenance: keep a ``group_keys →
    (n, s)`` gold rollup snapshot table in sync with a source snapshot
    table by applying its CHANGE FEED, never re-scanning history.

    Deletes subtract and updates adjust exactly because count and sum
    are abelian-group (invertible) measures — insert/update_postimage
    rows contribute +1/+value, delete/update_preimage rows −1/−value,
    and groups whose count reaches zero leave the rollup. min/max are
    deliberately NOT maintained here: they are not invertible under
    deletes (losing the current min forces a rescan) — the append-only
    ``merge_partial_aggregates`` family covers them.

    Exactly-once without an offset store: each rollup commit stamps the
    source version it reflects into its OWN commit record
    (``snapshot_write(properties=...)``), atomically with the data. A
    crash between reading the feed and committing redoes the span (the
    rollup still names the old version); a crash after committing is
    already durable (the rollup names the new version and the next sync
    starts there). There is no window where the applied data and the
    recorded position can disagree — the flaw every external-offset
    design (including ``snapshot_changes_since`` + idempotent sink)
    works around rather than removes.

    Concurrent maintainers are safe too: the commit is a compare-and-swap
    on the rollup version read at entry (``expected_version``), so two
    syncs that both read stamp N cannot both apply the same span — the
    loser's commit raises ``SnapshotConflictError`` without touching the
    table, and re-invoking it re-reads the moved stamp and applies only
    what remains (test-pinned in test_storage.py).

    Cost per sync: the feed reads only endpoint-diff files (O(touched
    files)), the signed delta is one keyed aggregate over change rows,
    and the merge joins it against the group-count-sized rollup. The
    rollup rewrite is a full write of a GOLD-sized table — KBs-MBs —
    which is the honest simple shape (clustered upserts would save
    nothing at that size). Returns (rollup_version, source_version)."""
    from f1_data_pipeline_spark.storage import (
        snapshot_changes,
        snapshot_properties,
        snapshot_read,
        snapshot_version,
        snapshot_write,
    )

    src_ver = snapshot_version(spark, source_dir)
    if src_ver < 1:
        raise FileNotFoundError(f"no committed snapshot in {source_dir}")
    try:
        rollup_ver = snapshot_version(spark, rollup_dir)
    except FileNotFoundError:
        rollup_ver = 0
    if rollup_ver < 1:
        # initial materialization: one aggregate over the current source.
        # n > 0 matches the steady-state contract (a group exists while it
        # has ≥1 NON-NULL measure) — without it, an all-NULL-value group
        # would appear here with n=0 yet be evicted by the first
        # incremental merge, diverging from a from-scratch rebuild.
        init = (
            snapshot_read(spark, source_dir)
            .groupBy(*group_keys)
            .agg(
                F.count(value_col).alias("n"),
                F.sum(value_col).cast("double").alias("s"),
            )
            .where(F.col("n") > 0)
        )
        v = snapshot_write(
            init,
            rollup_dir,
            properties={"source_version": src_ver},
            expected_version=rollup_ver,
        )
        return v, src_ver
    last = snapshot_properties(spark, rollup_dir).get("source_version")
    if last is None:
        raise ValueError(
            f"rollup at {rollup_dir} carries no source_version property — "
            f"not maintained by sync_rollup_from_changes; rebuild it"
        )
    last = int(last)
    if last == src_ver:
        return rollup_ver, src_ver  # caught up: no empty commit
    feed = snapshot_changes(spark, source_dir, source_key, last, src_ver)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        feed.withColumn("__sgn", sign)
        .groupBy(*group_keys)
        .agg(
            F.sum(
                F.when(F.col(value_col).isNotNull(), F.col("__sgn")).otherwise(0)
            ).alias("dn"),
            F.sum(F.col("__sgn") * F.coalesce(F.col(value_col), F.lit(0.0))).alias(
                "ds"
            ),
        )
    )
    cur = snapshot_read(spark, rollup_dir)
    # NULL group keys are legitimate groupBy groups, so the merge join
    # must be null-safe — a plain equi-join would never match them and
    # every sync would append another NULL-key row instead of adjusting
    d = delta.select(
        *[F.col(k).alias(f"__d_{k}") for k in group_keys], "dn", "ds"
    )
    cond = None
    for k in group_keys:
        c = F.col(k).eqNullSafe(F.col(f"__d_{k}"))
        cond = c if cond is None else (cond & c)
    merged = (
        cur.join(d, cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(k), F.col(f"__d_{k}")).alias(k)
                for k in group_keys
            ],
            (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
            .cast("long")
            .alias("n"),
            (
                F.coalesce(F.col("s"), F.lit(0.0))
                + F.coalesce(F.col("ds"), F.lit(0.0))
            ).alias("s"),
        )
        .where(F.col("n") > 0)
    )
    # CAS on the rollup version read above: if a concurrent maintainer
    # committed after we read source_version=last, OUR delta was derived
    # from a span the table no longer reflects — committing it would
    # double-apply that span. The conflict loser raises (typed) and the
    # caller simply re-invokes, which re-reads the moved stamp and
    # resyncs only the remaining span.
    v = snapshot_write(
        merged,
        rollup_dir,
        properties={"source_version": src_ver},
        expected_version=rollup_ver,
    )
    return v, src_ver


def sync_replica_from_changes(
    spark: SparkSession,
    source_dir: str,
    key: str,
    replica_dir: str,
    cluster_files: int | None = None,
) -> tuple[int, int]:
    """Exactly-once snapshot-table REPLICATION off the change feed: keep
    ``replica_dir`` row-identical to ``source_dir`` by applying only the
    changes since the last synced source version — never re-copying the
    table. The cross-region / environment-promotion shape.

    Same exactly-once lever as ``sync_rollup_from_changes``: each replica
    commit stamps the source version it reflects into its OWN commit
    record, atomically with the data, and commits with a CAS on the
    replica version read at entry — a crash redoes the span (the keyed
    CDC apply is idempotent), a concurrent replicator loses the CAS
    typed-loudly, and there is no external offset to tear.

    Per sync: the feed reads only endpoint-diff files of the SOURCE
    (O(touched files)); the net span folds to at most one row per
    changed key (``snapshot_changes`` already nets pre/post pairs, so
    dropping preimages leaves one event per key); the apply costs
    O(touched replica files + changed keys). A span that nets to zero
    rows still advances the stamp through a metadata-only ``restamp``
    commit. Deletion-vector deletes on the source replicate for free —
    the feed surfaces them as delete events. Returns
    ``(replica_version, source_version)``."""
    from f1_data_pipeline_spark.storage import (
        snapshot_apply_cdc,
        snapshot_changes,
        snapshot_properties,
        snapshot_read,
        snapshot_restamp,
        snapshot_version,
        snapshot_write,
    )

    src_ver = snapshot_version(spark, source_dir)
    if src_ver < 1:
        raise FileNotFoundError(f"no committed snapshot in {source_dir}")
    try:
        rep_ver = snapshot_version(spark, replica_dir)
    except FileNotFoundError:
        rep_ver = 0
    if rep_ver < 1:
        init = snapshot_read(spark, source_dir)
        if cluster_files:
            init = init.repartitionByRange(cluster_files, key)
        v = snapshot_write(
            init,
            replica_dir,
            stats_cols=[key],
            properties={"source_version": src_ver},
            expected_version=0,
        )
        return v, src_ver
    last = snapshot_properties(spark, replica_dir).get("source_version")
    if last is None:
        raise ValueError(
            f"replica at {replica_dir} carries no source_version property — "
            f"not maintained by sync_replica_from_changes; rebuild it"
        )
    last = int(last)
    if last == src_ver:
        return rep_ver, src_ver  # caught up: no empty commit
    feed = snapshot_changes(spark, source_dir, key, last, src_ver)
    # PERSIST the folded span: the merge core evaluates its input three
    # times (duplicate-key gate, envelope join, staged write), and the
    # CDF plan above it (endpoint diff + full-outer net + DV delta) is
    # the expensive part of a sync — re-running it per evaluation
    # triples the sync cost. The cached set is at most one row per
    # changed key (disk-spillable), exactly the working set a replicator
    # must hold anyway.
    ops = (
        feed.where(F.col("_change_type") != "update_preimage")
        .withColumn(
            "op",
            F.when(F.col("_change_type") == "delete", F.lit("D")).otherwise(
                F.lit("U")
            ),
        )
        .drop("_change_type")
    ).persist()
    try:
        v = snapshot_apply_cdc(
            spark,
            replica_dir,
            ops,
            key=key,
            op_col="op",
            stats_cols=[key],
            cluster_files=cluster_files,
            properties={"source_version": src_ver},
            expected_version=rep_ver,
        )
    finally:
        ops.unpersist()
    if v == rep_ver:
        # the span netted to zero applied change (e.g. restore round-trip,
        # or deletes of keys the replica never held): the stamp must still
        # advance or every later sync re-reads this span forever
        v = snapshot_restamp(
            spark, replica_dir, {"source_version": src_ver},
            expected_version=rep_ver,
        )
    return v, src_ver
