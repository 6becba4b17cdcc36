#!/usr/bin/env python
"""Benchmark harness: run the full registered query corpus at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is measured end-to-end per query (plan + execute) into the noop
sink, so driver-side materialization cost is excluded and full pipeline
execution (scan → shuffle → sink) is included. Session is warmed first so
JVM/codegen startup doesn't pollute query times.
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
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            df = queries[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # one broken query must not kill the bench
            failed.append(f"{name}: {type(e).__name__}")

    # BASELINE protocol #1: bronze→silver transform throughput on replayed
    # wire-format data (reference point: 23 rows/s sink-bound, ~29 silver
    # rows per input line — BASELINE.md).
    import tempfile

    from f1_data_pipeline_spark.ingest import build_silver, read_bronze
    from f1_data_pipeline_spark.ingest.fixture import generate

    with tempfile.TemporaryDirectory() as td:
        wire = os.path.join(td, "wire.txt")
        n_lines = 20000
        generate(wire, n_lines=n_lines, seed=42)
        from f1_data_pipeline_spark.session import default_parallelism

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

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "query_corpus_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "transform_rows_per_sec": transform_rows_per_sec,
                "transform_output_rows": out_rows,
                "transform_input_lines": n_lines,
                "failed": failed,
            }
        )
    )


if __name__ == "__main__":
    main()
