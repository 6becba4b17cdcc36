"""DuckDB-oracle corpus test (SURVEY §5.2 item 1, mirrors the driver's t2
gate): every SQL-expressible registered query must match DuckDB on row
count, column names, and values (order-insensitive, epsilon on floats)."""

from __future__ import annotations

import math

import pytest

from f1_data_pipeline_spark.queries import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle is None)


def normalize(rows, columns):
    """Sort columns by name, then rows, so comparison is order-insensitive."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def approx_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_matches_oracle(name, spark, ducks):
    q = QUERIES[name]
    sdf = q.builder(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ducks.execute(q.oracle)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"

    sn = normalize(s_rows, s_cols)
    dn = normalize(d_rows, d_cols)
    for i, (sr, dr) in enumerate(zip(sn, dn)):
        assert all(approx_equal(a, b) for a, b in zip(sr, dr)), (
            f"{name}: row {i} differs: spark={sr} duckdb={dr}"
        )


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(name, spark):
    q = QUERIES[name]
    df = q.builder(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
