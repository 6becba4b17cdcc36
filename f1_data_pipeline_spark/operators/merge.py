"""Merge operators: last-non-null-wins per key (K5/A3).

The reference merges partial lap records two ways — in-batch linear probe
(transformer.py:236-249) and SQL ``ON CONFLICT … COALESCE`` upsert
(loader.py:262-278). Both reduce to: per key, for each column take the most
recent non-null value. Here that is one hash aggregate using ``max_by`` over
a null-guarded ordering key — a single shuffle with map-side partials,
deterministic because the ordinal is explicit (SURVEY §7.4), and skew-safe
under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def last_non_null_merge(
    df: DataFrame, keys: list[str], order_col: str, cols: list[str] | None = None
) -> DataFrame:
    """Collapse to one row per ``keys``: each non-key column gets its value
    from the highest-``order_col`` row where that column is non-null."""
    if cols is None:
        cols = [c for c in df.columns if c not in keys and c != order_col]
    aggs = [
        F.max_by(c, F.when(F.col(c).isNotNull(), F.col(order_col))).alias(c)
        for c in cols
    ]
    return df.groupBy(*keys).agg(*aggs)


def first_non_null_merge(
    df: DataFrame, keys: list[str], order_col: str, cols: list[str] | None = None
) -> DataFrame:
    """First-wins variant (``min_by``): the K4 upsert flavor where an
    existing value is kept and only missing fields are filled."""
    if cols is None:
        cols = [c for c in df.columns if c not in keys and c != order_col]
    aggs = [
        F.min_by(c, F.when(F.col(c).isNotNull(), F.col(order_col))).alias(c)
        for c in cols
    ]
    return df.groupBy(*keys).agg(*aggs)
