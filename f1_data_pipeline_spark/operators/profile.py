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

from pyspark.sql import DataFrame, Window
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


def distribution_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
) -> DataFrame:
    """Per-group Kolmogorov-Smirnov drift against the whole corpus:
    ``ks = max_i |CDF_group(g_i) − CDF_corpus(g_i)|`` evaluated on the
    corpus's own exact decile grid — the numeric-distribution
    counterpart of ``text.source_kl_divergence``'s vocabulary drift
    (a source whose document-length / quality-score distribution walks
    away from the corpus is the mixture-tuning and ingest-regression
    signal this row feeds).

    Exact and engine-portable by construction: the grid is Spark's
    exact interpolated ``percentile`` (DuckDB ``quantile_cont``, same
    definition), CDFs are plain conditional counts at the grid points,
    and the max runs over |probs| doubles — so the oracle reproduces
    every statistic bit-for-bit, unlike a sketch-based KS. Restricting
    the sup to a fixed grid lower-bounds the true KS; deciles are the
    standard operating resolution for drift gates.

    Plan shape: ONE aggregate over the corpus for the grid (a 1-row
    broadcast), then ONE keyed aggregate computing all grid counts as
    map-side-combined conditional sums (no explode — scan volume is
    unchanged by grid size); corpus totals derive from the group frame
    (group-count-sized) — nothing quadratic, nothing driver-side."""
    k = len(probs)
    grid = df.agg(
        F.expr(
            f"percentile({value_col}, array({', '.join(f'{p}D' for p in probs)}))"
        ).alias("__g")
    )
    per_group = (
        df.crossJoin(F.broadcast(grid))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    (F.col(value_col) <= F.element_at("__g", i + 1)).cast("long")
                ).alias(f"__c{i}")
                for i in range(k)
            ],
        )
    )
    w = Window.partitionBy()
    tot = per_group.select(
        group_col,
        "n",
        *[F.col(f"__c{i}") for i in range(k)],
        F.sum("n").over(w).alias("__N"),
        *[F.sum(f"__c{i}").over(w).alias(f"__t{i}") for i in range(k)],
    )
    diffs = [
        F.abs(
            F.col(f"__c{i}") * 1.0 / F.col("n")
            - F.col(f"__t{i}") * 1.0 / F.col("__N")
        )
        for i in range(k)
    ]
    return tot.select(
        group_col,
        F.col("n").cast("long").alias("n"),
        F.round(F.greatest(*diffs), 4).alias("ks"),
    )


_DRIFT_PROBS = "0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9"


@query(
    "x_source_drift",
    f"""WITH g AS (SELECT quantile_cont(n_chars, [{_DRIFT_PROBS}]) AS g
                   FROM documents),
       pg AS (SELECT source, count(*) AS n,
                     {', '.join(f'sum(CASE WHEN n_chars <= g[{i + 1}] THEN 1 ELSE 0 END) AS c{i}' for i in range(9))}
              FROM documents, g GROUP BY source),
       tt AS (SELECT *, sum(n) OVER () AS nn,
                     {', '.join(f'sum(c{i}) OVER () AS t{i}' for i in range(9))}
              FROM pg)
       SELECT source, CAST(n AS BIGINT) AS n,
              ROUND(greatest({', '.join(f'abs(c{i} * 1.0 / n - t{i} * 1.0 / nn)' for i in range(9))}), 4) AS ks
       FROM tt ORDER BY source""",
)
def x_source_drift(t: Tables) -> DataFrame:
    """Per-source KS drift of the document-length distribution against
    the corpus, on the corpus's exact decile grid — bit-for-bit
    oracle-checked (exact percentile grid + integer conditional counts,
    identical division order on both engines)."""
    return distribution_drift(t.documents, "source", "n_chars").orderBy("source")
