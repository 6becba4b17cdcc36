"""S4 JDBC read surface. The container ships no JDBC driver jar, so the
end-to-end read test skips cleanly when the driver class is absent — the
helper's error path and the query-builder surface are tested regardless."""

from __future__ import annotations

import pytest

from f1_data_pipeline_spark.jdbc import (
    JdbcDriverMissing,
    _driver_available,
    read_jdbc,
    table_stats_query,
)

PG_DRIVER = "org.postgresql.Driver"


def test_missing_driver_raises_typed_error(spark):
    if _driver_available(spark, PG_DRIVER):
        pytest.skip("postgres driver present; covered by the e2e test")
    with pytest.raises(JdbcDriverMissing, match="--packages"):
        read_jdbc(spark, "jdbc:postgresql://db/f1", "public.lap_data")


def test_partitioned_read_requires_bounds(spark):
    with pytest.raises((ValueError, JdbcDriverMissing)):
        read_jdbc(
            spark,
            "jdbc:postgresql://db/f1",
            "public.lap_data",
            partition_column="session_id",
        )


def test_table_stats_query_shape():
    q = table_stats_query("lap_data", session_id=7)
    assert q.startswith("(SELECT") and q.endswith(") AS stats")
    assert "WHERE session_id = 7" in q
    assert "COUNT(*) FILTER" in q
    assert "MAX(created_at) AS last_record" in q
    assert "WHERE session_id" not in table_stats_query("lap_data")


def test_jdbc_read_end_to_end(spark):
    """Runs only when a JDBC driver jar is actually on the classpath."""
    if not _driver_available(spark, PG_DRIVER):
        pytest.skip("no JDBC driver jar in this environment")
    df = read_jdbc(
        spark,
        "jdbc:postgresql://localhost/f1",
        table_stats_query("lap_data"),
    )
    assert {"total", "recent", "last_record"} <= set(df.columns)
