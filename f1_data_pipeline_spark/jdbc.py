"""JDBC read source (SURVEY §2 S4): the dashboard-direction of the wire.

The reference's dashboard polls live Postgres tables over asyncpg
(`/root/reference/dashboard.py:56-81`, `main.py:106-112`); the Spark-native
equivalent is `spark.read.jdbc`, which plans the read as a JDBCRelation scan
with predicate pushdown into the database and optional partitioned parallel
reads.

No Postgres jar ships in this container, so the helpers raise a clear,
typed error when a requested driver class is absent instead of an opaque
Py4J trace. In production, launch with::

    spark-submit --packages org.postgresql:postgresql:42.7.4 ...

and pass ``driver="org.postgresql.Driver"``.

The read path IS exercised end-to-end in-container: Spark's own
distribution bundles Apache Derby (``derby-10.16``, an embedded pure-JVM
SQL database used by the Hive metastore), whose JDBC driver
(``DERBY_EMBEDDED_DRIVER``) is already on the classpath — the test suite
writes a table through ``df.write.jdbc`` and reads it back through
``read_jdbc``, including the partitioned-scan and pushdown-subquery forms
(tests/test_jdbc.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# Embedded Derby: bundled with the Spark distribution itself (metastore
# dependency), so it is the one JDBC endpoint guaranteed present wherever
# Spark runs. Single-JVM only — an e2e-test / dev endpoint, not a serving DB.
DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


class JdbcDriverMissing(RuntimeError):
    """Raised when the requested JDBC driver class is not on the classpath."""


def _driver_available(spark: SparkSession, driver: str) -> bool:
    try:
        # ForName through the JVM gateway: same lookup the DataSource performs.
        spark._jvm.java.lang.Class.forName(driver)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """S4: read a database table (or pushdown subquery) as a DataFrame.

    ``table_or_query`` is either a table name (``public.lap_data``) or a
    parenthesized subquery alias (``(SELECT ... ) AS t``) — the subquery form
    is how the reference dashboard's per-session COUNT/MAX polls
    (`dashboard.py:56-81`) translate: the database executes the aggregate,
    Spark receives only the result rows.

    Partitioned reads: pass ``partition_column``/``lower_bound``/
    ``upper_bound``/``num_partitions`` to split the scan into parallel JDBC
    cursors — the only way a 1000-executor cluster reads a big table without
    serializing on one connection. The column must be indexed and roughly
    uniform (the reference schema's ``session_id`` or ``date`` columns).
    """
    if not _driver_available(spark, driver):
        raise JdbcDriverMissing(
            f"JDBC driver {driver!r} not on the classpath; launch with "
            f"--packages (e.g. org.postgresql:postgresql:42.7.4)"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
        .option("driver", driver)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned read needs lower_bound, upper_bound and num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


_IDENTIFIER = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_identifiers(*idents: str) -> None:
    for ident in idents:
        if not _IDENTIFIER.match(ident):
            raise ValueError(
                f"invalid SQL identifier {ident!r}: must match {_IDENTIFIER.pattern}"
            )


def jdbc_merge_upsert_writer(
    url: str,
    table: str,
    keys: list[str],
    driver: str,
    stage_table: str | None = None,
    stage_partitions: int | None = None,
):
    """K4/K6 through the ACTUAL JDBC path: a ``foreachBatch`` sink that
    upserts each micro-batch with standard SQL ``MERGE`` in ONE database
    transaction.

    Two steps per batch, mirroring how a warehouse loads at scale:

    1. **Stage in parallel** — ``df.write.jdbc`` overwrites a staging table;
       Spark opens one INSERT cursor per partition (``stage_partitions``
       bounds the connection count), so the data movement is distributed.
    2. **Merge set-based** — one ``MERGE INTO target USING stage ON keys``
       statement on a JVM-side connection, committed atomically: the
       database applies update-or-insert in one transaction, the exact
       semantics of the reference's ``INSERT … ON CONFLICT DO UPDATE``
       batches (`loader.py:202-278`) at micro-batch granularity (K6).

    Keyed MERGE is idempotent under batch redelivery (T4). Works against
    any MERGE-capable JDBC database; exercised end-to-end in-container
    against embedded Derby (tests/test_jdbc.py), including a streaming
    ``foreachBatch`` run. Staged columns are quoted case-exact (Spark's
    JDBC writer creates quoted columns); the target table is referenced
    unquoted, matching a conventionally-created schema.
    """
    stage = stage_table or f"{table}_stage"
    _check_identifiers(table, stage, *keys)

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        cols = batch_df.columns
        _check_identifiers(*cols)
        missing = [k for k in keys if k not in cols]
        if missing:
            raise ValueError(f"merge keys {missing} not in batch columns {cols}")
        df = (
            batch_df.repartition(stage_partitions) if stage_partitions else batch_df
        )
        (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", stage)
            .option("driver", driver)
            .mode("overwrite")
            .save()
        )
        spark = batch_df.sparkSession
        jvm = spark._jvm  # type: ignore[union-attr]
        jvm.java.lang.Class.forName(driver)
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            conn.setAutoCommit(False)
            on = " AND ".join(f't.{k} = s."{k}"' for k in keys)
            sets = ", ".join(f't.{c} = s."{c}"' for c in cols if c not in keys)
            ins_cols = ", ".join(cols)
            ins_vals = ", ".join(f's."{c}"' for c in cols)
            st = conn.createStatement()
            st.executeUpdate(
                f"MERGE INTO {table} t USING {stage} s ON {on} "
                f"WHEN MATCHED THEN UPDATE SET {sets} "
                f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
            )
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    return write


def table_stats_query(
    table: str, session_id: int | None = None, schema: str = "public"
) -> str:
    """The dashboard's polling aggregate as ONE pushdown subquery
    (`dashboard.py:56-81` issues three round-trips; one scan suffices).

    Feed the result to ``read_jdbc(spark, url, table_stats_query(...))``.
    ``table`` and ``schema`` are validated against a strict identifier
    pattern — they are interpolated into SQL, so free-form input is
    rejected rather than risking injection. Postgres dialect (FILTER,
    now()), matching the reference's serving database.
    """
    for ident in (table, schema):
        if not _IDENTIFIER.match(ident):
            raise ValueError(
                f"invalid SQL identifier {ident!r}: must match {_IDENTIFIER.pattern}"
            )
    where = f"WHERE session_id = {int(session_id)}" if session_id is not None else ""
    return (
        f"(SELECT COUNT(*) AS total, "
        f"COUNT(*) FILTER (WHERE created_at > now() - interval '5 minutes') AS recent, "
        f"MAX(created_at) AS last_record "
        f"FROM {schema}.{table} {where}) AS stats"
    )
