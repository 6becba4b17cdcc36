"""Z-order (Morton-curve) data layout: multi-dimensional file clustering
so min/max footer pruning works on BOTH filter dimensions at once.

Why this exists at 100 TB: a table sorted by one column prunes scans on
that column only — a filter on the second dimension still reads every
file. Interleaving the bits of two (or more) bucketized dimensions into a
single Morton key and range-partitioning + sorting files by that key gives
every file a tight min/max envelope in *each* dimension, so a filter on
either column skips most files (the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``; public literature: Morton 1966, the original
space-filling-curve layout paper).

Everything is pure Catalyst integer arithmetic — codegen'd, no UDFs, no
driver participation. ``zorder_layout`` is one ``repartitionByRange``
(Spark samples the key distribution itself — no driver-side quantile
collection) plus a partition-local sort: exactly one shuffle to lay out
any amount of data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from f1_data_pipeline_spark.catalog import Tables
from f1_data_pipeline_spark.queries import query


def interleave_bits(cols: list[Column], bits: int = 8) -> Column:
    """Morton key: interleave the low ``bits`` bits of each non-negative
    integer column. With d columns the result occupies d*bits bits; bit i
    of column j lands at position i*d + j. Unrolled into a codegen-able
    sum of shift/mask terms (d*bits adds — for the typical 2×8 that is 16
    integer ops per row, fully whole-stage-codegen'd)."""
    d = len(cols)
    if d < 1:
        raise ValueError("interleave_bits needs at least one column")
    terms = []
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            terms.append(F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * d + j))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def bucketize(col: Column, lo: float, hi: float, bits: int = 8) -> Column:
    """Map a numeric column into [0, 2**bits) with equal-width buckets over
    [lo, hi]; out-of-range values clamp to the edge buckets. Fixed bounds
    keep the key deterministic and mergeable across incremental writes (a
    sampled-quantile bucketing would re-bucket history on every append)."""
    n = 2**bits
    raw = F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(hi - lo) * n)
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), raw)).cast("long")


def zorder_layout(df: DataFrame, zkey: Column, n_files: int) -> DataFrame:
    """Cluster ``df`` into ``n_files`` write tasks by Morton key: one
    range-shuffle (Spark's own reservoir sampling picks the boundaries)
    and a partition-local sort. Each output file then holds a compact
    Morton range = a tight min/max envelope in every interleaved
    dimension. Write with ``.write.parquet`` downstream; readers prune on
    footer stats with no further cooperation."""
    return df.withColumn("__z", zkey).repartitionByRange(
        n_files, F.col("__z")
    ).sortWithinPartitions("__z")


# Fixed bucketing domains for the demo query: stable across scale factors
# (testdata o_custkey is dense from 1; o_totalprice is bounded by the
# generator). Out-of-range rows clamp — the layout degrades gracefully
# instead of erroring.
_CK_HI = 4096.0
_PRICE_HI = 60000.0
_BITS = 8


def _zorder_sql() -> str:
    """DuckDB oracle: the identical shift/mask arithmetic, spelled with
    SQL bit operators."""
    terms = []
    for j, c in enumerate(("bx", "by")):
        for i in range(_BITS):
            terms.append(f"((({c} >> {i}) & 1) << {i * 2 + j})")
    z = " | ".join(terms)
    return f"""WITH b AS (
         SELECT o_orderkey,
                least(255, greatest(0, CAST(floor(
                  CAST(o_custkey AS DOUBLE) / {_CK_HI} * 256) AS BIGINT))) AS bx,
                least(255, greatest(0, CAST(floor(
                  o_totalprice / {_PRICE_HI} * 256) AS BIGINT))) AS by
         FROM orders),
       z AS (SELECT o_orderkey, bx, by, {z} AS zval FROM b)
       SELECT zval >> 8 AS zbin,
              CAST(count(*) AS BIGINT) AS n,
              CAST(min(bx) AS BIGINT) AS min_bx, CAST(max(bx) AS BIGINT) AS max_bx,
              CAST(min(by) AS BIGINT) AS min_by, CAST(max(by) AS BIGINT) AS max_by
       FROM z GROUP BY zbin ORDER BY zbin"""


@query("x_zorder", _zorder_sql())
def x_zorder(t: Tables) -> DataFrame:
    """Morton-key layout statistics over orders: bucketize (custkey,
    totalprice) to 8 bits each, interleave to a 16-bit key, and report per
    256-key bin the row count and the min/max envelope of each dimension —
    the same envelope a parquet footer would carry per file after
    ``zorder_layout``. Tight per-bin envelopes on BOTH columns are the
    whole point. Pure codegen arithmetic; one aggregate shuffle."""
    o = t.orders
    bx = bucketize(F.col("o_custkey"), 0.0, _CK_HI, _BITS)
    by = bucketize(F.col("o_totalprice"), 0.0, _PRICE_HI, _BITS)
    z = interleave_bits([F.col("bx"), F.col("by")], _BITS)
    return (
        o.select("o_orderkey", bx.alias("bx"), by.alias("by"))
        .withColumn("zval", z)
        .groupBy(F.shiftright(F.col("zval"), 8).alias("zbin"))
        .agg(
            F.count("*").alias("n"),
            F.min("bx").alias("min_bx"),
            F.max("bx").alias("max_bx"),
            F.min("by").alias("min_by"),
            F.max("by").alias("max_by"),
        )
        .orderBy("zbin")
    )
