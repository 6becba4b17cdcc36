"""S4 JDBC read surface, exercised END-TO-END against embedded Derby —
the pure-JVM database bundled with the Spark distribution itself (its
driver is always on the classpath). The Postgres direction (the
reference's actual serving DB) still has no jar in this container, so its
tests cover the typed-error path and the pushdown query builder.
"""

from __future__ import annotations

import pytest

from f1_data_pipeline_spark.jdbc import (
    DERBY_EMBEDDED_DRIVER,
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
    assert "FROM racing.lap_data" in table_stats_query("lap_data", schema="racing")


def test_table_stats_query_rejects_injection():
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        table_stats_query("lap_data; DROP TABLE x--")
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        table_stats_query("lap_data", schema='public"."hidden')


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """A Derby database seeded THROUGH the JDBC write path with a lap-shaped
    table; yields (url, source_rows)."""
    db = tmp_path_factory.mktemp("derby") / "f1db"
    url = f"jdbc:derby:{db};create=true"
    src = spark.createDataFrame(
        [(s, d, lap, 80.0 + (s * 7 + d + lap) % 20) for s in (1, 2) for d in (1, 4, 16) for lap in range(1, 11)],
        "session_id int, driver_number int, lap_number int, lap_time double",
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "lap_data")
        .option("driver", DERBY_EMBEDDED_DRIVER)
        .mode("overwrite")
        .save()
    )
    return url, {tuple(r) for r in src.collect()}


def test_jdbc_read_end_to_end(spark, derby):
    """S4 read direction moves real rows: full-table scan through read_jdbc
    matches what was written."""
    url, expected = derby
    df = read_jdbc(spark, url, "lap_data", driver=DERBY_EMBEDDED_DRIVER)
    assert {tuple(r) for r in df.collect()} == expected
    assert len(expected) == 60


def test_jdbc_partitioned_read_parallel_cursors(spark, derby):
    """Partitioned scan: 4 ranges on session_id produce 4 JDBC cursors
    (4 RDD partitions) and the same rows as the serial scan."""
    url, expected = derby
    df = read_jdbc(
        spark,
        url,
        "lap_data",
        driver=DERBY_EMBEDDED_DRIVER,
        partition_column="lap_number",
        lower_bound=1,
        upper_bound=11,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert {tuple(r) for r in df.collect()} == expected


def test_jdbc_pushdown_subquery(spark, derby):
    """The dashboard-poll shape: the DATABASE executes the aggregate, Spark
    receives only the result rows (reference dashboard.py:56-81)."""
    url, expected = derby
    # Spark's JDBC writer creates quoted (case-exact) column names; Derby
    # folds unquoted identifiers to uppercase, so the subquery quotes them.
    sub = (
        '(SELECT "session_id", COUNT(*) AS "laps", MAX("lap_time") AS "slowest" '
        'FROM lap_data GROUP BY "session_id") AS stats'
    )
    got = {
        r["session_id"]: (r["laps"], r["slowest"])
        for r in read_jdbc(spark, url, sub, driver=DERBY_EMBEDDED_DRIVER).collect()
    }
    by_session: dict[int, list[float]] = {}
    for s, _d, _l, t in expected:
        by_session.setdefault(s, []).append(t)
    assert got == {s: (len(v), max(v)) for s, v in by_session.items()}


def test_jdbc_filter_pushdown_in_plan(spark, derby):
    """A filter on the JDBC relation appears as PushedFilters in the scan
    (the database applies it; Spark never sees non-matching rows)."""
    url, _ = derby
    df = read_jdbc(spark, url, "lap_data", driver=DERBY_EMBEDDED_DRIVER).where(
        "session_id = 1"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "session_id" in plan
    assert df.count() == 30


@pytest.fixture(scope="module")
def derby_merge_db(spark, tmp_path_factory):
    """A Derby DB with a conventionally-created (unquoted DDL) target table
    seeded through the JVM-side connection; yields its JDBC url."""
    db = tmp_path_factory.mktemp("derby_merge") / "mergedb"
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_EMBEDDED_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE sessions (k INT PRIMARY KEY, v VARCHAR(50), n INT)")
    st.execute("INSERT INTO sessions VALUES (1, 'a', 10), (2, 'b', 20)")
    conn.close()
    return url


def _read_sessions(spark, url):
    df = read_jdbc(spark, url, "sessions", driver=DERBY_EMBEDDED_DRIVER)
    return {r["K"]: (r["V"], r["N"]) for r in df.collect()}


def test_jdbc_merge_upsert_batch(spark, derby_merge_db):
    """One MERGE transaction updates matched keys and inserts new ones —
    the reference's ON CONFLICT semantics through real JDBC."""
    from f1_data_pipeline_spark.jdbc import jdbc_merge_upsert_writer

    url = derby_merge_db
    write = jdbc_merge_upsert_writer(url, "sessions", ["k"], DERBY_EMBEDDED_DRIVER)
    batch = spark.createDataFrame(
        [(2, "b2", 21), (3, "c", 30)], "k int, v string, n int"
    )
    write(batch, 0)
    assert _read_sessions(spark, url) == {
        1: ("a", 10), 2: ("b2", 21), 3: ("c", 30)
    }
    # redelivery of the same batch is a no-op (T4 effectively-once)
    write(batch, 1)
    assert _read_sessions(spark, url) == {
        1: ("a", 10), 2: ("b2", 21), 3: ("c", 30)
    }


def test_jdbc_merge_rejects_bad_identifiers(spark):
    from f1_data_pipeline_spark.jdbc import jdbc_merge_upsert_writer

    with pytest.raises(ValueError, match="invalid SQL identifier"):
        jdbc_merge_upsert_writer("url", "t; DROP TABLE x", ["k"], DERBY_EMBEDDED_DRIVER)
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        jdbc_merge_upsert_writer("url", "t", ["k--"], DERBY_EMBEDDED_DRIVER)


def test_jdbc_merge_streaming_foreachbatch(spark, derby_merge_db, tmp_path):
    """A streaming query upserts micro-batches into Derby through MERGE:
    the full streaming -> real-JDBC sink path, end to end in-container."""
    from f1_data_pipeline_spark.jdbc import jdbc_merge_upsert_writer

    url = derby_merge_db
    src = tmp_path / "stream_src"
    spark.createDataFrame(
        [(3, "c2", 31), (4, "d", 40)], "k int, v string, n int"
    ).write.parquet(str(src))

    write = jdbc_merge_upsert_writer(
        url, "sessions", ["k"], DERBY_EMBEDDED_DRIVER, stage_table="sessions_stream_stage"
    )
    q = (
        spark.readStream.schema("k int, v string, n int")
        .parquet(str(src))
        .writeStream.foreachBatch(write)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _read_sessions(spark, url)
    assert got[3] == ("c2", 31) and got[4] == ("d", 40) and got[1] == ("a", 10)
