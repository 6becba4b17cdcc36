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
