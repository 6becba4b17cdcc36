#!/usr/bin/env python
"""Benchmark harness: run the full registered query corpus at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is measured end-to-end per query (plan + execute) into the noop
sink, so driver-side materialization cost is excluded and full pipeline
execution (scan → shuffle → sink) is included. Session is warmed first so
JVM/codegen startup doesn't pollute query times.

Two corpus passes, both reported, neither hidden in the other:

* **Sequential** (the headline ``value`` = per-query sum + transform):
  uncontended per-query latencies, directly comparable round-over-round
  and to the r1 baseline numbers.
* **Concurrent** (``corpus_wall_concurrent_sec``,
  $SPARK_GRAFT_BENCH_CONCURRENCY driver threads, default 6, heavy queries
  first): corpus wall-clock the way a multi-tenant engine actually runs —
  per-query cost at small SF is dominated by single-threaded driver-side
  Catalyst analysis + codegen compile, so overlapping queries is the honest
  throughput number. Set the env var to 0/1 to skip this pass.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SILVER_ENTITIES = ("car_telemetry", "car_positions", "weather", "race_control", "lap_data")


def bench_transform(spark) -> dict:
    """BASELINE protocol #1, isolated from the corpus: bronze→silver
    transform throughput on replayed wire-format data (reference point:
    23 rows/s sink-bound, ~29 silver rows per input line — BASELINE.md).

    Warm-up runs the FULL path twice on a small file: the first pass forks
    the pandas-UDF worker pool, the second lets the JVM JIT the decode
    codegen — without it the timed run measures compiler warmth, not the
    pipeline (the r1→r2 "11% regression" was exactly this).

    The five silver entities materialize CONCURRENTLY, mirroring the
    production shape (the streaming layer fans the same five entities out
    to parallel sinks); sequential materialization leaves the cluster idle
    between jobs and under-reports throughput by ~20%.
    """
    import tempfile

    from f1_data_pipeline_spark.ingest import build_silver, read_bronze
    from f1_data_pipeline_spark.ingest.fixture import generate
    from f1_data_pipeline_spark.session import default_parallelism

    def run(wire: str, parts: int) -> tuple[int, float]:
        bronze = read_bronze(spark, wire, partitions=parts).cache()
        t0 = time.perf_counter()
        bronze.count()  # parse once; the entity plans reuse the cache
        silver = build_silver(bronze)
        with ThreadPoolExecutor(len(SILVER_ENTITIES)) as ex:
            rows = sum(ex.map(lambda n: silver[n].count(), SILVER_ENTITIES))
        dt = time.perf_counter() - t0
        bronze.unpersist()
        return rows, dt

    with tempfile.TemporaryDirectory() as td:
        warm_wire = os.path.join(td, "warm.txt")
        generate(warm_wire, n_lines=1000, seed=7)
        run(warm_wire, parts=2)
        run(warm_wire, parts=2)

        wire = os.path.join(td, "wire.txt")
        n_lines = 20000
        generate(wire, n_lines=n_lines, seed=42)
        # ~2.5k wire lines per task keeps Arrow/worker overhead amortized at
        # this size; a real deployment gets parallelism from file splits
        parts = max(2, min(default_parallelism(), n_lines // 2500))
        out_rows, transform_sec = run(wire, parts)

    return {
        "transform_sec": round(transform_sec, 4),
        "transform_rows_per_sec": round(out_rows / transform_sec, 1),
        "transform_output_rows": out_rows,
        "transform_input_lines": n_lines,
    }


def bench_upsert(spark, n_rows: int = 20_000, partitions: int = 8) -> dict:
    """K4/K6 sink throughput: the driver-funnel upsert (one connection,
    ``toLocalIterator``) vs the executor-side ``foreachPartition`` path, 8
    partitions each, keyed ON CONFLICT upserts into a DuckDB target.

    DuckDB is single-writer per file, so the executor path writes one shard
    file per partition (``TaskContext.partitionId()``) — emulating the
    connection-per-worker parallelism a server database (the reference's
    Postgres) gives on a single table. Same statements, same chunking, same
    per-row DB cost on both paths; the measured difference is purely the
    funnel."""
    import os
    import shutil
    import tempfile

    import duckdb

    from f1_data_pipeline_spark.sinks import (
        jdbc_upsert_writer,
        jdbc_upsert_writer_distributed,
    )

    df = (
        spark.range(n_rows)
        .selectExpr("CAST(id AS INT) k", "concat('v', id) v", "CAST(id*10 AS INT) n")
        .repartition(partitions)
        .cache()
    )
    df.count()
    td = tempfile.mkdtemp(prefix="f1dp_upsert_bench_")
    ddl = "CREATE TABLE IF NOT EXISTS kv (k INTEGER PRIMARY KEY, v VARCHAR, n INTEGER)"
    try:
        driver_db = os.path.join(td, "driver.duckdb")
        c = duckdb.connect(driver_db)
        c.execute(ddl)
        c.close()
        write_driver = jdbc_upsert_writer(
            lambda: duckdb.connect(driver_db), "kv", ["k"]
        )
        t0 = time.perf_counter()
        write_driver(df, 0)
        driver_sec = time.perf_counter() - t0

        shard_dir = os.path.join(td, "shards")
        os.makedirs(shard_dir)

        def connect():
            import os as _os

            import duckdb as _duckdb
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            conn = _duckdb.connect(_os.path.join(shard_dir, f"shard_{pid}.duckdb"))
            conn.execute(ddl)
            return conn

        write_exec = jdbc_upsert_writer_distributed(connect, "kv", ["k"])
        t0 = time.perf_counter()
        write_exec(df, 0)
        exec_sec = time.perf_counter() - t0

        written = sum(
            duckdb.connect(os.path.join(shard_dir, f))
            .execute("SELECT count(*) FROM kv")
            .fetchone()[0]
            for f in os.listdir(shard_dir)
        )
        assert written == n_rows, f"executor upsert wrote {written}/{n_rows} rows"
    finally:
        df.unpersist()
        shutil.rmtree(td, ignore_errors=True)
    return {
        "upsert_rows": n_rows,
        "upsert_partitions": partitions,
        "upsert_driver_sec": round(driver_sec, 4),
        "upsert_executor_sec": round(exec_sec, 4),
        "upsert_driver_rows_per_sec": round(n_rows / driver_sec, 1),
        "upsert_executor_rows_per_sec": round(n_rows / exec_sec, 1),
        "upsert_executor_speedup": round(driver_sec / exec_sec, 2),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from f1_data_pipeline_spark.session import get_spark
    from f1_data_pipeline_spark.queries import all_queries

    spark = get_spark(app_name="bench")
    # ship the package to Python workers: mapInPandas kernels need to import
    # it even when bench is launched from outside the repo dir
    import __spark_entry__

    __spark_entry__._configure(spark)
    queries = all_queries()

    # Warm up: JVM, codegen, parquet footer caches.
    spark.range(1000).selectExpr("sum(id)").collect()
    queries["q_s1"].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Machine-speed canaries: fixed workloads whose only variable is the
    # host (shared-VM CPU steal moved measured throughput >2x within one
    # session). Judge round-over-round numbers relative to these.
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
    canary_spark = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc += i
    canary_python = round(time.perf_counter() - t0, 4)

    transform = bench_transform(spark)
    upsert = bench_upsert(spark)

    failed: list[str] = []

    def run_one(name: str, into: dict) -> None:
        t0 = time.perf_counter()
        try:
            df = queries[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            into[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # one broken query must not kill the bench
            failed.append(f"{name}: {type(e).__name__}")

    # Pass 1 — sequential: comparable per-query latencies.
    timings: dict[str, float] = {}
    for name in sorted(queries):
        run_one(name, timings)
    seq_sum = round(sum(timings.values()), 4)

    # Pass 2 — concurrent: corpus wall-clock under multi-tenant load.
    # longest-first order minimizes makespan (measured heavy hitters).
    concurrency = int(os.environ.get("SPARK_GRAFT_BENCH_CONCURRENCY", "6"))
    conc_timings: dict[str, float] = {}
    corpus_wall_concurrent = None
    if concurrency > 1:
        heavy = [
            "x_dedup_ngram", "x_dedup_simhash", "x_sim_pairs", "f1_lap_table",
            "f1_session_report", "f1_weather_10min", "f1_positions_latest",
            "x_multimodal_features", "x_sim_ivf", "x_percentiles",
        ]
        order = [n for n in heavy if n in queries] + [
            n for n in sorted(queries) if n not in heavy
        ]
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=concurrency) as ex:
            list(ex.map(lambda n: run_one(n, conc_timings), order))
        corpus_wall_concurrent = round(time.perf_counter() - t0, 4)

    timings["f1_transform_20k_lines"] = transform["transform_sec"]
    # the r1-comparable headline: sequential latencies + the transform
    total = round(seq_sum + transform["transform_sec"], 4)
    print(
        json.dumps(
            {
                "metric": "query_corpus_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "per_query_sum_sec": seq_sum,
                "concurrency": concurrency,
                "corpus_wall_concurrent_sec": corpus_wall_concurrent,
                "transform_rows_per_sec": transform["transform_rows_per_sec"],
                "transform_output_rows": transform["transform_output_rows"],
                "transform_input_lines": transform["transform_input_lines"],
                **upsert,
                "canary_spark_sum_sec": canary_spark,
                "canary_python_loop_sec": canary_python,
                "failed": failed,
            }
        )
    )


if __name__ == "__main__":
    main()