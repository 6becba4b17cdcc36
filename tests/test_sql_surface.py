"""SQL-surface equivalence: every ANSI-dialect oracle string must run
verbatim through spark.sql and produce the same result as the DataFrame-API
plan — the 'bring your SQL as-is' guarantee."""

from __future__ import annotations

import pytest

from f1_data_pipeline_spark.queries import all_queries
from f1_data_pipeline_spark.sql import open_sql
from tests.conftest import SF_DIR

QUERIES = all_queries()

# x_* oracles intentionally use DuckDB-native syntax (ASOF JOIN, list_*,
# string_split, ->>, date_diff('second',…)) with no Spark twin — the Spark
# side of those IS the DataFrame operator. Everything named q_* is ANSI.
# q_c5's oracle uses DuckDB's ->> JSON operator (Spark spells it
# get_json_object) — the one q_* dialect exception.
ANSI = sorted(
    n for n in QUERIES if n.startswith("q_") and QUERIES[n].oracle and n != "q_c5"
)


@pytest.mark.parametrize("name", ANSI)
def test_oracle_sql_runs_on_spark(name, spark):
    q = QUERIES[name]
    sql = open_sql(spark, SF_DIR)
    via_sql = sql.run(q.oracle)
    via_df = q.builder(spark, SF_DIR)
    a = sorted(tuple(str(x) for x in r) for r in via_sql.collect())
    b = sorted(tuple(str(x) for x in r) for r in via_df.collect())
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert a == b, f"{name}: spark.sql result differs from DataFrame plan"
