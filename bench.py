#!/usr/bin/env python
"""Benchmark harness: run the full registered query corpus at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is measured end-to-end per query (plan + execute) into the noop
sink, so driver-side materialization cost is excluded and full pipeline
execution (scan → shuffle → sink) is included. Session is warmed first so
JVM/codegen startup doesn't pollute query times.

The corpus runs CONCURRENTLY ($SPARK_GRAFT_BENCH_CONCURRENCY driver threads,
default 6, heavy queries scheduled first): profiling shows per-query cost at
small SF is dominated by one-time Catalyst analysis + whole-stage-codegen
compile (driver-side, single-threaded per query), so overlapping queries is
the honest way to measure corpus throughput — exactly how a multi-tenant
engine runs. ``value`` is the corpus WALL-CLOCK (plus the sequential
transform benchmark); per-query entries are each query's own elapsed time
under that concurrency (they sum to more than the wall-clock).
Set SPARK_GRAFT_BENCH_CONCURRENCY=1 for sequential per-query latencies.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

    timings: dict[str, float] = {}
    failed: list[str] = []

    # BASELINE protocol #1 first, isolated from the corpus: bronze→silver
    # transform throughput on replayed wire-format data (reference point:
    # 23 rows/s sink-bound, ~29 silver rows per input line — BASELINE.md).
    # Its own mini warm-up spins up the pandas-UDF worker pool so the timed
    # run measures the pipeline, not cold Python-worker forks.
    import tempfile

    from f1_data_pipeline_spark.ingest import build_silver, read_bronze
    from f1_data_pipeline_spark.ingest.fixture import generate
    from f1_data_pipeline_spark.session import default_parallelism

    with tempfile.TemporaryDirectory() as td:
        warm_wire = os.path.join(td, "warm.txt")
        generate(warm_wire, n_lines=1000, seed=7)
        wb = read_bronze(spark, warm_wire, partitions=2).cache()
        wb.count()
        warm_silver = build_silver(wb)
        for name in ("car_telemetry", "car_positions", "weather", "race_control", "lap_data"):
            warm_silver[name].count()
        wb.unpersist()

        wire = os.path.join(td, "wire.txt")
        n_lines = 20000
        generate(wire, n_lines=n_lines, seed=42)
        # ~2.5k wire lines per task keeps Arrow/worker overhead amortized at
        # this size; a real deployment gets parallelism from file splits
        parts = max(2, min(default_parallelism(), n_lines // 2500))
        bronze = read_bronze(spark, wire, partitions=parts).cache()
        t0 = time.perf_counter()
        bronze.count()  # parse once; the entity plans reuse the cache
        silver = build_silver(bronze)
        out_rows = 0
        for name in ("car_telemetry", "car_positions", "weather", "race_control", "lap_data"):
            out_rows += silver[name].count()
        transform_sec = time.perf_counter() - t0
        bronze.unpersist()
        timings["f1_transform_20k_lines"] = round(transform_sec, 4)
        transform_rows_per_sec = round(out_rows / transform_sec, 1)

    # longest-first order minimizes makespan under concurrency (measured
    # heavy hitters; everything else alphabetical)
    heavy = [
        "x_sim_pairs", "f1_lap_table", "x_dedup_ngram", "x_dedup_simhash",
        "f1_session_report", "f1_weather_10min", "f1_positions_latest",
        "x_multimodal_features", "x_sim_ivf", "x_percentiles",
    ]
    order = [n for n in heavy if n in queries] + [
        n for n in sorted(queries) if n not in heavy
    ]

    def run_one(name: str) -> None:
        t0 = time.perf_counter()
        try:
            df = queries[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # one broken query must not kill the bench
            failed.append(f"{name}: {type(e).__name__}")

    from concurrent.futures import ThreadPoolExecutor

    concurrency = int(os.environ.get("SPARK_GRAFT_BENCH_CONCURRENCY", "6"))
    corpus_t0 = time.perf_counter()
    if concurrency <= 1:
        for name in order:
            run_one(name)
    else:
        with ThreadPoolExecutor(max_workers=concurrency) as ex:
            list(ex.map(run_one, order))
    corpus_wall = time.perf_counter() - corpus_t0

    # corpus wall-clock + the (sequential) transform benchmark: the time to
    # actually run everything, directly comparable to a sequential run's sum
    total = round(corpus_wall + transform_sec, 4)
    print(
        json.dumps(
            {
                "metric": "query_corpus_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "concurrency": concurrency,
                "corpus_wall_sec": round(corpus_wall, 4),
                "per_query_sum_sec": round(sum(timings.values()), 4),
                "transform_rows_per_sec": transform_rows_per_sec,
                "transform_output_rows": out_rows,
                "transform_input_lines": n_lines,
                "failed": failed,
            }
        )
    )


if __name__ == "__main__":
    main()
