"""Real-Postgres-dialect e2e: the upsert sinks against a genuine
PostgreSQL 15 server.

r3 left exactly one S4/K4 gap: the ON CONFLICT dialect the reference
actually targets (supabase_loader.py:182-249, loader.py:202-278) was
proven against DuckDB and the JDBC wire path against Derby, but never
against Postgres itself. This module closes it: a throwaway cluster is
initdb'd under /tmp and started socket-only (the server refuses root, so
it runs via ``su postgres``; trust auth, no TCP), and the SAME sink
writers used everywhere else talk to it through the stdlib wire client
(`pgwire.py`). Skips cleanly when the server binaries or the postgres
user are absent.
"""

from __future__ import annotations

import os
import pwd
import shutil
import subprocess
import tempfile

import pytest

from f1_data_pipeline_spark import pgwire

PG_BIN = "/usr/lib/postgresql/15/bin"


def _su(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
        capture_output=True,
        text=True,
        cwd="/tmp",
    )


@pytest.fixture(scope="module")
def pg_sock():
    if not os.path.exists(os.path.join(PG_BIN, "initdb")):
        pytest.skip("postgres server binaries not installed")
    try:
        pwd.getpwnam("postgres")
    except KeyError:
        pytest.skip("no postgres OS user (server refuses to run as root)")
    base = tempfile.mkdtemp(prefix="f1dp_pg_")
    os.chmod(base, 0o777)
    data = os.path.join(base, "data")
    r = _su(f"{PG_BIN}/initdb -D {data} -A trust -U postgres")
    if r.returncode:
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = _su(
        f"{PG_BIN}/pg_ctl -D {data} -o '-k {base} -c listen_addresses=' "
        f"-l {base}/pg.log -w start"
    )
    if r.returncode:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")
    try:
        yield base
    finally:
        _su(f"{PG_BIN}/pg_ctl -D {data} -m fast stop")
        shutil.rmtree(base, ignore_errors=True)


def test_wire_client_basics(pg_sock):
    conn = pgwire.connect(pg_sock)
    try:
        row = conn.execute(
            "SELECT 1 AS i, 2.5 AS f, TRUE AS b, NULL AS n, 'it''s' AS s"
        ).fetchone()
        assert row == (1, 2.5, True, None, "it's")
        # parameter binding escapes quotes and handles None/bytes
        row = conn.execute("SELECT ?, ?, ?", ["a'b", None, 7]).fetchone()
        assert row == ("a'b", None, 7)
        with pytest.raises(pgwire.PgError) as e:
            conn.execute("SELECT * FROM no_such_table")
        assert e.value.sqlstate == "42P01"  # undefined_table
        conn.rollback()  # error aborted the txn; client must recover
        assert conn.execute("SELECT 41 + 1").fetchone() == (42,)
    finally:
        conn.close()


def test_transaction_rollback_discards_writes(pg_sock):
    conn = pgwire.connect(pg_sock)
    try:
        conn.execute("CREATE TABLE txt (v TEXT)")
        conn.commit()
        conn.execute("INSERT INTO txt VALUES ('gone')")
        conn.rollback()
        assert conn.execute("SELECT count(*) FROM txt").fetchone() == (0,)
    finally:
        conn.close()


def test_reference_upsert_dialect_last_write_wins(pg_sock, spark):
    """K4 against real Postgres: the exact INSERT .. ON CONFLICT DO UPDATE
    SET col = EXCLUDED.col statement (supabase_loader.py:182-249), driver
    funnel, re-delivery idempotent."""
    from f1_data_pipeline_spark.sinks import jdbc_upsert_writer

    conn = pgwire.connect(pg_sock)
    conn.execute("CREATE TABLE kv (k INT PRIMARY KEY, v TEXT, n INT)")
    conn.commit()
    conn.close()

    connect = pgwire.connector(pg_sock)
    write = jdbc_upsert_writer(connect, "kv", ["k"])
    df1 = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k int, v string, n int")
    write(df1, 0)
    df2 = spark.createDataFrame([(2, "B2", 22), (3, "c", 30)], "k int, v string, n int")
    write(df2, 1)
    write(df2, 1)  # at-least-once re-delivery must be a no-op

    conn = pgwire.connect(pg_sock)
    got = conn.execute("SELECT k, v, n FROM kv ORDER BY k").fetchall()
    conn.close()
    assert got == [(1, "a", 10), (2, "B2", 22), (3, "c", 30)]


def test_reference_coalesce_merge_dialect(pg_sock, spark):
    """K5 against real Postgres: col = COALESCE(EXCLUDED.col, t.col) — the
    reference's lap-data fill-missing-only merge (loader.py:262-278)."""
    from f1_data_pipeline_spark.sinks import jdbc_upsert_writer

    conn = pgwire.connect(pg_sock)
    conn.execute(
        "CREATE TABLE laps (driver INT, lap INT, t_s1 FLOAT, t_s2 FLOAT,"
        " PRIMARY KEY (driver, lap))"
    )
    conn.commit()
    conn.close()

    connect = pgwire.connector(pg_sock)
    write = jdbc_upsert_writer(connect, "laps", ["driver", "lap"], coalesce_merge=True)
    schema = "driver int, lap int, t_s1 double, t_s2 double"
    write(spark.createDataFrame([(1, 1, 30.5, None)], schema), 0)
    # NULL incoming must PRESERVE the existing sector time (the COALESCE
    # point); non-null incoming overwrites as usual
    write(spark.createDataFrame([(1, 1, None, 31.7)], schema), 1)
    write(spark.createDataFrame([(1, 1, 99.9, None)], schema), 2)

    conn = pgwire.connect(pg_sock)
    got = conn.execute("SELECT t_s1, t_s2 FROM laps WHERE driver=1 AND lap=1").fetchone()
    conn.close()
    assert got == (99.9, 31.7)


def test_streaming_wire_to_postgres_upsert(pg_sock, spark, tmp_path):
    """The reference's COMPLETE production topology, end-to-end for real:
    wire-format stream → typed silver entity → ON CONFLICT upsert into a
    genuine Postgres (extractor → transformer → asyncpg loader, main.py) —
    with a second checkpointed replay proving effectively-once delivery."""
    from f1_data_pipeline_spark import streaming as strm
    from f1_data_pipeline_spark.ingest import build_silver, read_bronze
    from f1_data_pipeline_spark.ingest.fixture import generate
    from f1_data_pipeline_spark.sinks import jdbc_upsert_writer

    wire_dir = tmp_path / "wire"
    wire_dir.mkdir()
    generate(str(wire_dir / "wire.txt"), n_lines=250, seed=11)

    conn = pgwire.connect(pg_sock)
    conn.execute(
        """CREATE TABLE drivers (
             driver_number INTEGER PRIMARY KEY, name TEXT, team TEXT,
             country_code TEXT, team_color TEXT, first_name TEXT,
             last_name TEXT, short_name TEXT, broadcast_name TEXT)"""
    )
    conn.commit()
    conn.close()

    upsert = jdbc_upsert_writer(pgwire.connector(pg_sock), "drivers", ["driver_number"])
    for i in range(2):  # T4: re-delivery must be a no-op
        q = strm.stream_keyed_upsert(
            spark, str(wire_dir), str(tmp_path / f"ck{i}"), "drivers", upsert
        )
        assert q.awaitTermination(120)

    conn = pgwire.connect(pg_sock)
    rows = conn.execute("SELECT driver_number, name FROM drivers ORDER BY 1").fetchall()
    conn.close()
    batch = build_silver(read_bronze(spark, str(wire_dir / "wire.txt")))["drivers"]
    assert len(rows) == batch.count()
    assert all(name.startswith("Driver ") for _, name in rows)


def test_distributed_upsert_from_executors(pg_sock, spark):
    """K6 cluster-scale path against real Postgres: every partition opens
    its own wire connection ON THE EXECUTOR (foreachPartition) — the
    connection-per-worker parallelism the reference gets from asyncpg."""
    from f1_data_pipeline_spark.sinks import jdbc_upsert_writer_distributed

    conn = pgwire.connect(pg_sock)
    conn.execute("CREATE TABLE dist (k INT PRIMARY KEY, v TEXT)")
    conn.commit()
    conn.close()

    connect = pgwire.connector(pg_sock)
    write = jdbc_upsert_writer_distributed(connect, "dist", ["k"], num_partitions=4)
    df = spark.range(200).selectExpr("CAST(id AS INT) k", "concat('v', id) v")
    write(df, 0)
    write(df, 0)  # partition-level replay is idempotent

    conn = pgwire.connect(pg_sock)
    n, distinct = conn.execute("SELECT count(*), count(DISTINCT k) FROM dist").fetchone()
    sample = conn.execute("SELECT v FROM dist WHERE k = 123").fetchone()
    conn.close()
    assert (n, distinct) == (200, 200)
    assert sample == ("v123",)
