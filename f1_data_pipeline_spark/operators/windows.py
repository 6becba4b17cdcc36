"""Scale-safe global window frames (SURVEY §2 W4 at 100 TB).

An unkeyed ``ORDER BY`` window (``avg(x) OVER (ORDER BY k ROWS n PRECEDING)``)
forces Spark to move EVERY row into one partition (``WindowExec: No
Partition Defined``) — the last single-node bottleneck a 100 TB pipeline
can hide. ``global_rolling_avg`` computes the identical frame with the
classic two-pass decomposition:

1. **Range-partition** by the order key (``repartitionByRange``): each
   partition holds a contiguous, disjoint key range, so "the previous
   ``n-1`` rows" of any row live either in its own partition or in the
   tail of the immediately-preceding one.
2. **Local pass**: per-partition ROWS-frame aggregates through a window
   *keyed by partition id* — fully parallel.
3. **Carry-ins**: each partition's last ``n-1`` rows (≤ ``P·(n-1)`` rows
   total — tiny) are re-keyed to the next partition and broadcast-joined
   to its first ``n-1`` rows, completing frames that cross the boundary.

Every shuffle is keyed, every join against boundary data is a broadcast;
no operator ever sees more than one partition's rows plus an ``n-1``-row
tail. The driver touches only the ``P``-row per-partition count table
(the same legitimately-small class of data as an IVF codebook).

Determinism note: range-partition boundaries are RESAMPLED on every
evaluation (AQE can change the upstream partitioning between jobs, which
reseeds the sampler), so anything derived from two separate evaluations —
the count table vs the main plan — can silently disagree. The ranged
dataset is therefore pinned with a disk-backed ``persist`` before anything
reads it: one extra dataset-sized spill to executor local disk, the same
order of cost as the shuffle that produced it, and the price ANY
multi-pass algorithm over a global order pays for consistency. The cached
partitions stay registered until the caller clears them
(``spark.catalog.clearCache()``) — same lifecycle as a bucketed temp table.
"""

from __future__ import annotations

from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from f1_data_pipeline_spark.catalog import Tables
from f1_data_pipeline_spark.queries import query


def global_rolling_avg(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    frame_rows: int = 100,
    partitions: int = 32,
    out_col: str = "ma",
    finisher: Callable[[Column, Column], Column] | None = None,
) -> DataFrame:
    """``avg(value) OVER (ORDER BY order_cols ROWS frame_rows-1 PRECEDING
    AND CURRENT ROW)`` without a single-partition window.

    ``order_cols`` must be a TOTAL order (include a tiebreaker column) —
    the same requirement any deterministic global window has. Each range
    partition must end up with at least ``frame_rows`` rows so a frame
    spans at most one boundary; the helper verifies this from the P-row
    count table and raises with guidance if violated (lower ``partitions``
    — at scale, size ``partitions ≈ rows / target_partition_rows``, which
    is always ≫ ``frame_rows``).

    ``finisher(total_sum, total_count) -> Column`` overrides the default
    ``try_divide(sum, count)`` — use it for exact integer arithmetic
    (e.g. cents) where the division/rounding must be pinned. NULLs in
    ``value_col`` follow SQL ``avg``: excluded from both sum and count.

    Two passes over the input (partition counts + the main plan), both
    embarrassingly parallel.
    """
    n = int(frame_rows)
    if n < 1:
        raise ValueError("frame_rows must be >= 1")
    order = [F.col(c) for c in order_cols]
    keep_cols = df.columns

    ranged = (
        df.repartitionByRange(partitions, *order)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.DISK_ONLY)
    )

    # Pass 1: the P-row partition-count table — groupBy on the (pinned)
    # ranged scan, no window needed. Collected on the driver to (a) validate
    # the min-partition-size precondition and (b) pin tail membership
    # without a descending second window. The collect also materializes the
    # persist, freezing the boundaries every later branch reads.
    pstats = sorted(
        (r["__pid"], r["c"])
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    )
    pids = [p for p, _ in pstats]
    if len(pstats) > 1 and (
        pids != list(range(len(pstats))) or min(c for _, c in pstats) < n
    ):
        total = sum(c for _, c in pstats)
        raise ValueError(
            f"range partitioning produced partitions with fewer than "
            f"frame_rows={n} rows (counts={pstats}); re-run with partitions "
            f"<= {max(1, total // (2 * n))} so every frame spans at most one "
            f"partition boundary"
        )

    w = Window.partitionBy("__pid").orderBy(*order)
    wf = w.rowsBetween(-(n - 1), Window.currentRow)
    local = ranged.select(
        *keep_cols,
        "__pid",
        F.row_number().over(w).alias("__rn"),
        F.sum(value_col).over(wf).alias("__lsum"),
        F.count(value_col).over(wf).alias("__lcnt"),
    )

    if n == 1 or len(pstats) <= 1:
        # no frame ever crosses a boundary
        out, csum, ccnt = local, F.lit(None), F.lit(None)
    else:
        cnt_col = F.create_map(
            *[F.lit(x) for pc in pstats for x in pc]
        )  # tiny literal map pid -> count
        # tails: the last n-1 rows of every partition, re-keyed to the NEXT
        # partition id; __from_end = 0 for the partition's very last row.
        tails = (
            local.withColumn("__pcnt", cnt_col[F.col("__pid")])
            .where(F.col("__rn") > F.col("__pcnt") - (n - 1))
            .select(
                (F.col("__pid") + 1).alias("__cpid"),
                (F.col("__pcnt") - F.col("__rn")).alias("__from_end"),
                F.col(value_col).alias("__tval"),
            )
        )
        # a boundary row at local position r (r < n) is missing the deepest
        # n-r rows of the previous partition: exactly __from_end < n - r
        boundary = local.where((F.col("__rn") <= n - 1) & (F.col("__pid") > 0))
        carry = (
            boundary.join(
                F.broadcast(tails),
                (F.col("__cpid") == F.col("__pid"))
                & (F.col("__from_end") < n - F.col("__rn")),
            )
            .groupBy("__pid", "__rn")
            .agg(
                F.sum("__tval").alias("__csum"),
                F.count("__tval").alias("__ccnt"),
            )
        )
        out = local.join(F.broadcast(carry), ["__pid", "__rn"], "left")
        csum, ccnt = F.col("__csum"), F.col("__ccnt")

    tot_sum = F.col("__lsum") + F.coalesce(csum, F.lit(0))
    tot_cnt = F.col("__lcnt") + F.coalesce(ccnt, F.lit(0))
    fin = finisher if finisher is not None else F.try_divide
    return out.select(*keep_cols, fin(tot_sum, tot_cnt).alias(out_col))


@query(
    "x_rolling_scaled",
    """SELECT o_orderkey, o_orderdate,
              ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
                    / (100.0 * COUNT(*) OVER w), 2) AS ma
       FROM orders
       WINDOW w AS (ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
       ORDER BY o_orderdate, o_orderkey LIMIT 200""",
)
def x_rolling_scaled(t: Tables) -> DataFrame:
    """q_w4's global moving average through the two-pass range-partitioned
    decomposition — the executable 100 TB form of the single-partition
    window that q_w4 pins semantically. The measure is summed as exact
    integer cents (order-independent — double summation order differs
    between the local+carry split and a sequential frame walk, and between
    engines; integer sums cannot drift), then divided and rounded once.
    Matches the DuckDB oracle bit-for-bit at every SF, unlike q_w4's
    documented 1-ulp sf0.1 flip."""
    cents = t.orders.select(
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("__cents"),
    )
    out = global_rolling_avg(
        cents,
        ["o_orderdate", "o_orderkey"],
        "__cents",
        frame_rows=100,
        partitions=4,
        finisher=lambda s, c: F.round(s / (100.0 * c), 2),
    )
    return (
        out.select("o_orderkey", "o_orderdate", "ma")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(200)
    )
