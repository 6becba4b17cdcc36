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


# --- Driver-faithful type-representation contract (round-6 hardening) ----
#
# The external harness fetches both engines' results through pandas and
# hashes the STRINGIFIED cells. DuckDB types that stringify differently
# from Spark's — HUGEINT (windowed/plain SUM over integers → int128 →
# float64 "1435.0" on fetch) and DECIMAL — therefore hash-mismatch even
# when the math is identical (the round-5 x_seq_pack red row). fetchall()
# returns Python ints for HUGEINT, which is why the value sweep above
# cannot catch it. This test pins the representation layer instead: every
# oracle's DESCRIBE type must be stringify-compatible with the Spark
# column's type. Cheap — no query executes on either engine.

_INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
_INT_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_FLT_SPARK = {"float", "double"}
_FLT_DUCK = {"FLOAT", "DOUBLE"}


def _compatible(spark_t: str, duck_t: str) -> bool:
    d = duck_t.upper()
    if spark_t in _INT_SPARK:
        return d in _INT_DUCK
    if spark_t in _FLT_SPARK:
        # DECIMAL fetches to float64 via pandas, stringifying like a double
        # (q_c4 was driver-hash-green with a DECIMAL(2,1) oracle column);
        # it is only hazardous against an integral Spark column.
        return d in _FLT_DUCK or d.startswith("DECIMAL")
    if spark_t == "boolean":
        return d == "BOOLEAN"
    # strings/timestamps/dates/arrays: stringification is engine-agnostic
    # for the forms the corpus uses; the value sweep covers them.
    return True


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_types_match_spark(name, spark, ducks):
    q = QUERIES[name]
    duck_types = {
        r[0]: r[1] for r in ducks.execute(f"DESCRIBE ({q.oracle})").fetchall()
    }
    spark_types = {
        f.name: f.dataType.simpleString()
        for f in q.builder(spark, SF_DIR).schema.fields
    }
    bad = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if c in duck_types and not _compatible(spark_types[c], duck_types[c])
    }
    assert not bad, (
        f"{name}: oracle column types stringify differently from Spark "
        f"(CAST the oracle output, e.g. HUGEINT→BIGINT): {bad}"
    )
