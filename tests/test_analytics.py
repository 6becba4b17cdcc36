"""Gold-layer analytics tests: dashboard parity (A4–A6), observe metrics
(A9), catalog introspection (S5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from f1_data_pipeline_spark.analytics import (
    last_update,
    observed_run,
    recent_counts,
    table_counts,
    verify_tables,
)
from f1_data_pipeline_spark.catalog import load_tables
from tests.conftest import SF_DIR


def test_table_counts_and_freshness(spark):
    t = load_tables(spark, SF_DIR)
    counts = table_counts({"events": t.events, "nation": t.nation})
    assert counts["events"] == 1000 and counts["nation"] == 25
    lu = last_update(t.events, "ts").collect()[0]["last_update"]
    assert lu is not None


def test_recent_counts_matches_manual(spark):
    t = load_tables(spark, SF_DIR)
    got = recent_counts(t.events, "ts", minutes=5).collect()[0]["c"]
    mx = t.events.agg(F.max("ts")).collect()[0][0]
    manual = t.events.where(
        F.col("ts") > F.lit(mx) - F.expr("INTERVAL 5 MINUTE")
    ).count()
    assert got == manual > 0


def test_observe_metrics_single_pass(spark):
    t = load_tables(spark, SF_DIR)
    df, obs = observed_run(
        t.events,
        {"rows": F.count(F.lit(1)), "null_props": F.sum(F.isnull("props").cast("int"))},
    )
    df.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == 1000
    assert obs.get["null_props"] >= 0


def test_verify_tables_report(spark):
    t = load_tables(spark, SF_DIR)
    t.events.createOrReplaceTempView("events_v")
    rep = verify_tables(
        spark,
        {"events_v": ["event_id", "ts", "nope"], "missing_table": ["x"]},
    )
    assert rep["events_v"]["exists"] and rep["events_v"]["missing"] == ["nope"]
    assert not rep["missing_table"]["exists"]


def test_rate_observer_collects_progress(spark, tmp_path):
    """K8/T2: the StreamingQueryListener records per-batch rows/durations
    and flags slow batches."""
    import time

    from f1_data_pipeline_spark.ingest.fixture import generate
    from f1_data_pipeline_spark.streaming import RateObserver, stream_silver

    obs = RateObserver(slow_batch_ms=0.001)  # everything counts as slow
    obs.attach(spark)
    d = tmp_path / "src"
    d.mkdir()
    generate(str(d / "w.txt"), n_lines=80, seed=6)
    qs = stream_silver(spark, str(d), str(tmp_path / "ck"), str(tmp_path / "out"), entities=["weather"])
    for q in qs:
        q.awaitTermination(120)
    # listener delivery is async; give it a beat (a loaded host can delay
    # the listener bus well past 10s — observed in the r13 full-suite run)
    for _ in range(90):
        if obs.progress:
            break
        time.sleep(0.5)
    assert obs.progress, "no progress events recorded"
    assert any(p["numInputRows"] > 0 for p in obs.progress)
    assert all(p["slow"] for p in obs.progress if p["numInputRows"] > 0)


def test_approx_aggregates_within_tolerance(spark):
    """Scale-path approximations: approx_count_distinct and
    approx_percentile land within tolerance of exact values (the 100 TB
    substitutes for q_a2 / x_percentiles)."""
    from pyspark.sql import functions as F

    from f1_data_pipeline_spark.catalog import load_tables

    t = load_tables(spark, SF_DIR)
    row = t.orders.agg(
        F.approx_count_distinct("o_custkey").alias("acd"),
        F.count_distinct("o_custkey").alias("cd"),
        F.approx_percentile("o_totalprice", 0.5, 10000).alias("ap"),
        F.median("o_totalprice").alias("m"),
    ).collect()[0]
    assert abs(row["acd"] - row["cd"]) / row["cd"] < 0.05
    assert abs(row["ap"] - row["m"]) / row["m"] < 0.05


def test_sketch_rollup_accuracy_and_mergeability(spark, tmp_path):
    """HLL sketch rollup: per-group and union-total estimates within 5% of
    exact; and sketches persisted to parquet then UNIONED across two
    disjoint increments reproduce the whole-corpus estimate exactly —
    the incremental-rollup contract."""
    from pyspark.sql import functions as F

    from f1_data_pipeline_spark.analytics import sketch_rollup, sketch_table
    from f1_data_pipeline_spark.catalog import load_tables

    t = load_tables(spark, SF_DIR)
    est = {r[0]: r[1] for r in sketch_rollup(t.events, "event_type", "user_id").collect()}
    exact = {
        r[0]: r[1]
        for r in t.events.groupBy("event_type")
        .agg(F.count_distinct("user_id"))
        .collect()
    }
    exact["__TOTAL__"] = t.events.select("user_id").distinct().count()
    for k, v in exact.items():
        assert abs(est[k] - v) / v < 0.05, (k, est[k], v)

    # persistence + merge: two disjoint halves, sketched separately,
    # written to parquet, unioned — same estimate as sketching everything
    lo = t.events.where(F.col("event_id") % 2 == 0)
    hi = t.events.where(F.col("event_id") % 2 == 1)
    for name, part in (("lo", lo), ("hi", hi)):
        sketch_table(part, "event_type", "user_id").write.mode("overwrite").parquet(
            str(tmp_path / name)
        )
    merged = (
        spark.read.parquet(str(tmp_path / "lo"), str(tmp_path / "hi"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e"))
        .collect()[0]["e"]
    )
    whole = (
        sketch_table(t.events, "event_type", "user_id")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e"))
        .collect()[0]["e"]
    )
    assert merged == whole


def test_incremental_aggregate_merge_equals_full_recompute(spark, tmp_path):
    """Materialized-rollup maintenance: state built from increments (with
    a parquet persistence hop, as in production) must equal the
    from-scratch aggregate over all data — including derived avg."""
    from pyspark.sql import functions as F

    from f1_data_pipeline_spark.analytics import (
        finalize_aggregate, merge_partial_aggregates, partial_aggregate,
    )
    from f1_data_pipeline_spark.catalog import load_tables

    ev = load_tables(spark, SF_DIR).events
    days = [ev.where(F.col("event_id") % 3 == i) for i in range(3)]

    state = partial_aggregate(days[0], ["event_type"], "value")
    for i, d in enumerate(days[1:]):
        p = str(tmp_path / f"state_{i}")
        state.write.mode("overwrite").parquet(p)
        state = merge_partial_aggregates(
            spark.read.parquet(p), partial_aggregate(d, ["event_type"], "value"),
            ["event_type"],
        )

    got = {
        r.event_type: (r.n, round(r.total, 6), round(r.avg, 6), r.min, r.max)
        for r in finalize_aggregate(state, ["event_type"]).collect()
    }
    want = {
        r.event_type: (r.n, round(r.total, 6), round(r.avg, 6), r.min, r.max)
        for r in finalize_aggregate(
            partial_aggregate(ev, ["event_type"], "value"), ["event_type"]
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        # float sums may differ in the last ulp across grouping orders
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6
        assert abs(got[k][2] - want[k][2]) < 1e-9
        assert got[k][3:] == want[k][3:]


# --- heavy hitters (Misra-Gries candidates + exact recount) ----------------


def test_heavy_hitters_exact_on_zipfian(spark):
    from f1_data_pipeline_spark.analytics import heavy_hitters

    # Zipf-ish: value i appears ~1000/i times
    rows = [(f"v{i:03d}",) for i in range(1, 80) for _ in range(1000 // i)]
    df = spark.createDataFrame(rows, "term string").repartition(7)
    got = [(r.term, r.cnt) for r in heavy_hitters(df, "term", k=10).collect()]
    want = [
        (r.term, r.cnt)
        for r in df.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(10)
        .collect()
    ]
    assert got == want


def test_heavy_hitters_survives_singleton_flood(spark):
    """Adversarial: 5 heavy values drowned in 20k distinct singletons —
    a per-partition value_counts would hold 20k entries; MG holds ≤cap."""
    from f1_data_pipeline_spark.analytics import heavy_hitters

    heavies = [(f"hh{i}",) for i in range(5) for _ in range(500)]
    noise = [(f"n{i}",) for i in range(20000)]
    df = spark.createDataFrame(heavies + noise, "term string").repartition(9)
    # heavies are 500/22500 ≈ 2.2% of the stream → need capacity+1 > 45
    # for the MG completeness guarantee; 64 clears it with margin
    got = [
        (r.term, r.cnt)
        for r in heavy_hitters(df, "term", k=5, capacity=64).collect()
    ]
    assert got == [(f"hh{i}", 500) for i in range(5)]


def test_heavy_hitters_raises_when_guarantee_fails(spark):
    """A flat distribution with an undersized capacity must RAISE, not
    silently return a wrong top-k (r5 advisor finding): 200 distinct
    values x 20, capacity 4 -> every count is far below N/(capacity+1)
    and the candidate set can't cover the stream, so neither exactness
    condition holds. Raising capacity past the distinct count makes the
    same call succeed via full coverage."""
    import pytest

    from f1_data_pipeline_spark.analytics import heavy_hitters

    rows = [(f"v{i:03d}",) for i in range(200) for _ in range(20)]
    df = spark.createDataFrame(rows, "term string").repartition(8)

    with pytest.raises(Exception, match="heavy_hitters.*raise capacity"):
        heavy_hitters(df, "term", k=5, capacity=4).collect()

    got = [
        (r.term, r.cnt)
        for r in heavy_hitters(df, "term", k=5, capacity=256).collect()
    ]
    assert got == [(f"v{i:03d}", 20) for i in range(5)]


def test_misra_gries_summary_bounded(spark):
    from f1_data_pipeline_spark.analytics import misra_gries_candidates

    noise = [(f"n{i}",) for i in range(5000)]
    df = spark.createDataFrame(noise, "term string").repartition(1)
    out = misra_gries_candidates(df, "term", capacity=40).collect()
    assert len(out) <= 40  # one partition -> one summary, capped


def test_misra_gries_guarantee_at_threshold(spark):
    """An item with freq > N/(capacity+1) must appear in the candidate
    union even at a deliberately tiny capacity."""
    from f1_data_pipeline_spark.analytics import misra_gries_candidates

    n_noise = 900
    heavy = [("HH",)] * 150  # 150 > 1050/(8+1) ≈ 117
    noise = [(f"n{i}",) for i in range(n_noise)]
    df = spark.createDataFrame(heavy + noise, "term string").repartition(3)
    cands = {r.term for r in misra_gries_candidates(df, "term", 8).collect()}
    assert "HH" in cands


def test_sync_rollup_from_changes_exactly_once(spark, tmp_path):
    """CDF-driven incremental view maintenance: the rollup equals a
    from-scratch recompute after inserts, updates, AND deletes; a
    caught-up sync commits nothing (re-running after a 'crash' between
    feed and commit is the same call — same result, exactly once);
    groups whose last member is deleted leave the rollup."""
    from pyspark.sql import functions as F

    from f1_data_pipeline_spark.analytics import sync_rollup_from_changes
    from f1_data_pipeline_spark.storage import (
        snapshot_delete,
        snapshot_properties,
        snapshot_read,
        snapshot_upsert,
        snapshot_write,
    )

    src = str(tmp_path / "src")
    roll = str(tmp_path / "rollup")

    def mk(lo, hi, grp, val_mult=1.0):
        return (
            spark.range(lo, hi)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % grp).cast("string").alias("g"),
                (F.col("id") * val_mult).cast("double").alias("x"),
            )
        )

    def recompute():
        return {
            (r["g"], r["n"], round(r["s"], 6))
            for r in snapshot_read(spark, src)
            .groupBy("g")
            .agg(F.count("x").alias("n"), F.sum("x").alias("s"))
            .collect()
        }

    def rollup_rows():
        return {
            (r["g"], r["n"], round(r["s"], 6))
            for r in snapshot_read(spark, roll).collect()
        }

    snapshot_write(mk(0, 200, 5), src, stats_cols=["k"])
    v, sv = sync_rollup_from_changes(spark, src, "k", roll, ["g"], "x")
    assert (v, sv) == (1, 1)
    assert rollup_rows() == recompute()

    # updates (values change) + inserts into a NEW group value
    ups = mk(150, 260, 5, val_mult=10.0).withColumn(
        "g", F.when(F.col("k") >= 200, F.lit("newgrp")).otherwise(F.col("g"))
    )
    snapshot_upsert(spark, src, ups, key="k")
    # delete an entire group's rows: g='0' has k % 5 == 0
    snapshot_delete(spark, src, where=[("k", "=", 145)])
    v2, sv2 = sync_rollup_from_changes(spark, src, "k", roll, ["g"], "x")
    assert sv2 == 3 and v2 == 2
    assert rollup_rows() == recompute()
    assert snapshot_properties(spark, roll) == {"source_version": 3}

    # caught up: version-preserving no-op (exactly-once on retry)
    v3, _ = sync_rollup_from_changes(spark, src, "k", roll, ["g"], "x")
    assert v3 == v2 and rollup_rows() == recompute()

    # delete the whole new group: its rollup row must vanish
    snapshot_delete(spark, src, where=[("k", ">=", 200)])
    sync_rollup_from_changes(spark, src, "k", roll, ["g"], "x")
    assert rollup_rows() == recompute()
    assert not [r for r in rollup_rows() if r[0] == "newgrp"]

    # NULL group keys are real groups: the null-safe merge must adjust
    # the existing NULL-key row, not append a second one per sync
    nulls = (
        spark.range(9000, 9003)
        .select(
            F.col("id").alias("k"),
            F.lit(None).cast("string").alias("g"),
            F.col("id").cast("double").alias("x"),
        )
    )
    snapshot_upsert(spark, src, nulls, key="k")
    sync_rollup_from_changes(spark, src, "k", roll, ["g"], "x")
    assert rollup_rows() == recompute()
    snapshot_upsert(
        spark, src,
        nulls.where("k = 9000").withColumn("x", F.lit(777.0)), key="k",
    )
    sync_rollup_from_changes(spark, src, "k", roll, ["g"], "x")
    assert rollup_rows() == recompute()
    assert len([r for r in rollup_rows() if r[0] is None]) == 1

    # an operator compacting the rollup must not break the consumer:
    # content-preserving maintenance carries the exactly-once stamp
    from f1_data_pipeline_spark.storage import snapshot_optimize

    snapshot_optimize(spark, roll, target_file_bytes=1 << 20)
    assert snapshot_properties(spark, roll).get("source_version") is not None
    snapshot_upsert(spark, src, mk(0, 1, 5, val_mult=3.0), key="k")
    sync_rollup_from_changes(spark, src, "k", roll, ["g"], "x")
    assert rollup_rows() == recompute()


def test_sync_rollup_concurrent_maintainers_cannot_double_apply(spark, tmp_path, monkeypatch):
    """r8 advice: two maintainers that both read source stamp N must not
    both apply the same change span. The commit is a CAS on the rollup
    version read at entry, so the interleaved loser raises the typed
    conflict WITHOUT committing, and a plain re-invoke converges to the
    from-scratch answer — never a double-applied delta."""
    import pytest
    from pyspark.sql import functions as F

    import f1_data_pipeline_spark.analytics as A
    import f1_data_pipeline_spark.storage as S

    src = str(tmp_path / "src")
    roll = str(tmp_path / "rollup")

    def mk(lo, hi, mult=1.0):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * mult).cast("double").alias("x"),
        )

    def recompute():
        return {
            (r["g"], r["n"], round(r["s"], 6))
            for r in S.snapshot_read(spark, src)
            .groupBy("g")
            .agg(F.count("x").alias("n"), F.sum("x").alias("s"))
            .collect()
        }

    def rollup_rows():
        return {
            (r["g"], r["n"], round(r["s"], 6))
            for r in S.snapshot_read(spark, roll).collect()
        }

    S.snapshot_write(mk(0, 60), src, stats_cols=["k"])
    A.sync_rollup_from_changes(spark, src, "k", roll, ["g"], "x")
    S.snapshot_upsert(spark, src, mk(30, 90, mult=5.0), key="k")

    # interleave: maintainer B completes a full sync INSIDE maintainer
    # A's read-feed step, after A has already read the rollup stamp
    real_changes = S.snapshot_changes
    fired = {"done": False}

    def racy_changes(sp, table_dir, key, lo, hi):
        if not fired["done"]:
            fired["done"] = True
            A.sync_rollup_from_changes(sp, src, "k", roll, ["g"], "x")
        return real_changes(sp, table_dir, key, lo, hi)

    monkeypatch.setattr(S, "snapshot_changes", racy_changes)
    with pytest.raises(S.SnapshotConflictError):
        A.sync_rollup_from_changes(spark, src, "k", roll, ["g"], "x")
    monkeypatch.setattr(S, "snapshot_changes", real_changes)

    # B's sync applied the span exactly once; A's loss committed nothing
    assert rollup_rows() == recompute()
    stamp = int(S.snapshot_properties(spark, roll)["source_version"])
    assert stamp == S.snapshot_version(spark, src)
    # A's retry is a caught-up no-op — still exactly once
    v_before = S.snapshot_version(spark, roll)
    A.sync_rollup_from_changes(spark, src, "k", roll, ["g"], "x")
    assert S.snapshot_version(spark, roll) == v_before
    assert rollup_rows() == recompute()


def test_sync_replica_from_changes_exactly_once(spark, tmp_path):
    """CDF-driven table replication: the replica is row-identical to the
    source after inserts, updates, copy-on-write deletes AND
    deletion-vector deletes; a caught-up sync commits nothing; a span
    netting to zero still advances the stamp (restamp, no data move);
    and re-running after a 'crash' converges (keyed idempotence)."""
    from pyspark.sql import functions as F

    from f1_data_pipeline_spark.analytics import sync_replica_from_changes
    import f1_data_pipeline_spark.storage as S

    src = str(tmp_path / "src")
    rep = str(tmp_path / "replica")

    def mk(lo, hi, mult=1.0):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("string").alias("g"),
            (F.col("id") * mult).cast("double").alias("x"),
        )

    def rows(d):
        return {
            (r["k"], r["g"], r["x"]) for r in S.snapshot_read(spark, d).collect()
        }

    S.snapshot_write(mk(0, 120).repartitionByRange(4, "k"), src, stats_cols=["k"])
    v, sv = sync_replica_from_changes(spark, src, "k", rep, cluster_files=4)
    assert (v, sv) == (1, 1)
    assert rows(rep) == rows(src)

    # mixed span: updates + inserts + a cow delete + a DV delete
    S.snapshot_upsert(spark, src, mk(100, 140, mult=7.0), key="k")
    S.snapshot_delete(spark, src, [("k", "<", 10)])
    S.snapshot_delete(spark, src, [("k", "=", 55)], mode="dv")
    v2, sv2 = sync_replica_from_changes(spark, src, "k", rep, cluster_files=4)
    assert sv2 == S.snapshot_version(spark, src) and v2 > v
    assert rows(rep) == rows(src)
    assert 55 not in {r[0] for r in rows(rep)}

    # caught up: version-preserving no-op
    v3, _ = sync_replica_from_changes(spark, src, "k", rep)
    assert v3 == v2

    # zero-net span: delete then restore — the stamp must still advance
    S.snapshot_delete(spark, src, [("k", "=", 70)], mode="dv")
    S.snapshot_restore(spark, src, S.snapshot_version(spark, src) - 1)
    v4, sv4 = sync_replica_from_changes(spark, src, "k", rep)
    assert v4 > v3  # restamp committed
    assert int(S.snapshot_properties(spark, rep)["source_version"]) == sv4
    assert rows(rep) == rows(src)
    # and the next sync is a clean no-op (the stamp really moved)
    v5, _ = sync_replica_from_changes(spark, src, "k", rep)
    assert v5 == v4


def test_stream_table_maintainer_drives_replica(spark, tmp_path):
    """The metronome deployment shape: a rate-source streaming query
    fires the exactly-once replica sync on a cadence; new source commits
    land in the replica without any manual re-invoke."""
    import time

    from pyspark.sql import functions as F

    import f1_data_pipeline_spark.storage as S
    import f1_data_pipeline_spark.streaming as strm
    from f1_data_pipeline_spark.analytics import sync_replica_from_changes

    src = str(tmp_path / "src")
    rep = str(tmp_path / "replica")
    S.snapshot_write(
        spark.range(50)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("x"))
        .repartitionByRange(2, "k"),
        src,
        stats_cols=["k"],
    )

    q = strm.stream_table_maintainer(
        spark,
        lambda: sync_replica_from_changes(spark, src, "k", rep),
        checkpoint=str(tmp_path / "ck"),
        interval_seconds=1.0,
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if S.snapshot_read(spark, rep).count() == 50:
                    break
            except FileNotFoundError:
                pass
            time.sleep(1)
        assert S.snapshot_read(spark, rep).count() == 50
        # a new source commit flows through on the next ticks
        S.snapshot_upsert(
            spark,
            src,
            spark.range(50, 60).select(
                F.col("id").alias("k"), (F.col("id") * 2.0).alias("x")
            ),
            key="k",
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if S.snapshot_read(spark, rep).count() == 60:
                break
            time.sleep(1)
        assert S.snapshot_read(spark, rep).count() == 60
    finally:
        q.stop()
