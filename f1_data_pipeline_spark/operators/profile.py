"""Column profiling: one-pass per-column statistics for data-quality
triage over an arbitrary table (the batch generalization of the wire-side
``ingest/analyze.py`` topic scanner; reference parity: the ad-hoc
``analyze_f1_data.py:8-80`` inspection loop, re-expressed as ONE Catalyst
aggregate instead of a per-column driver loop).

At 100 TB the profile is the first query a curation run executes, so its
shape matters:

* **Single scan.** Every metric for every column is computed in one
  ``agg`` — the table is read once, partial aggregates combine map-side,
  and only O(columns) bytes reach the final reduce.
* **Bounded shuffle bytes for distincts.** ``count(distinct col)`` on a
  text column would shuffle every distinct document body; the profiler
  counts distinct **md5 fingerprints** instead, so shuffled rows are 32
  bytes regardless of value width (collision probability ~n²/2¹²⁸,
  irrelevant at any feasible n). Spark plans multi-distinct aggregates
  with a single Expand, one shuffle total.
* **Unpivot is plan-side.** The wide 1-row aggregate explodes to one row
  per column inside the same job — no driver-side loop, no N jobs for N
  columns (the classic ``df.describe()`` anti-pattern at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_data_pipeline_spark.catalog import Tables
from f1_data_pipeline_spark.queries import query


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct, min_s,
    max_s, avg_len).

    min/max are computed on the NATIVE type (so numeric columns order
    numerically) and cast to string afterwards for a type-stable output
    schema; ``n_distinct`` counts md5 fingerprints of the string form
    (bounded shuffle width — see module docstring); ``avg_len`` is the
    mean string-rendered length, a cheap width indicator for storage
    planning.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"{c}__rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"{c}__nulls"),
                F.countDistinct(F.md5(s)).alias(f"{c}__distinct"),
                F.min(F.col(c)).cast("string").alias(f"{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max"),
                F.round(F.avg(F.length(s)), 4).alias(f"{c}__avglen"),
            ]
        )
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_s"),
            F.col(f"{c}__max").alias("max_s"),
            F.col(f"{c}__avglen").alias("avg_len"),
        )
        for c in cols
    ]
    return (
        wide.select(F.explode(F.array(*structs)).alias("m"))
        .select("m.*")
        .orderBy("column")
    )


def _profile_oracle_sql(table: str, cols: list[str]) -> str:
    parts = [
        f"""SELECT '{c}' AS "column",
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               CAST(count(DISTINCT md5(CAST({c} AS VARCHAR))) AS BIGINT)
                 AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_s,
               CAST(max({c}) AS VARCHAR) AS max_s,
               ROUND(avg(length(CAST({c} AS VARCHAR))), 4) AS avg_len
        FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@query("x_profile", _profile_oracle_sql("documents", _DOC_COLS))
def x_profile(t: Tables) -> DataFrame:
    """One-pass column profile of the documents table (nulls, distincts
    via bounded-width md5 fingerprints, native-typed min/max, mean
    rendered width). Single scan + single Expand-planned aggregate; the
    per-column unpivot happens inside the plan, not on the driver."""
    return profile_table(t.documents, _DOC_COLS)


# --- Winsorized group statistics --------------------------------------------


def winsorize_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorized statistics: exact interpolated percentiles at
    ``lo``/``hi``, the raw mean, and the mean after clamping values into
    [p_lo, p_hi] — the robust-mean treatment outlier-heavy quality
    metrics need before they feed threshold decisions (one wild value
    otherwise drags a domain's average score).

    Two keyed shuffles on ``group_col`` (percentile aggregate, then the
    clamped re-aggregate) + one keyed join of the group-sized bounds
    table back onto the rows. The percentile aggregate is Spark's exact
    ``percentile`` (linear interpolation, same definition as DuckDB's
    ``quantile_cont``), so engines agree bit-for-bit on clean doubles."""
    bounds = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {hi})").alias("p_hi"),
    )
    clamped = df.join(bounds, group_col).withColumn(
        "__w",
        F.least(F.greatest(F.col(value_col), F.col("p_lo")), F.col("p_hi")),
    )
    return clamped.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.round(F.max("p_lo"), 4).alias("p_lo"),
        F.round(F.max("p_hi"), 4).alias("p_hi"),
        F.round(F.avg(value_col), 4).alias("mean_raw"),
        F.round(F.avg("__w"), 4).alias("mean_winsorized"),
    )


@query(
    "x_winsorize",
    """WITH b AS (SELECT event_type,
                         quantile_cont(value, 0.05) AS p_lo,
                         quantile_cont(value, 0.95) AS p_hi
                  FROM events GROUP BY event_type)
       SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
              ROUND(max(b.p_lo), 4) AS p_lo,
              ROUND(max(b.p_hi), 4) AS p_hi,
              ROUND(avg(e.value), 4) AS mean_raw,
              ROUND(avg(least(greatest(e.value, b.p_lo), b.p_hi)), 4)
                AS mean_winsorized
       FROM events e JOIN b USING (event_type)
       GROUP BY e.event_type ORDER BY e.event_type""",
)
def x_winsorize(t: Tables) -> DataFrame:
    """Winsorized per-event-type value statistics (5th/95th percentile
    clamp) via ``winsorize_stats``."""
    return winsorize_stats(t.events, "event_type", "value").orderBy("event_type")
