"""SQL-surface parity: every Q1-Q13 Spark-SQL statement (sql.py) must
produce exactly the rows of its DataFrame implementation (queries.py).
Catalyst compiles both to plans over the same scans, so any divergence is
a semantics bug in one of the two surfaces."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from kafkastreams_tp3_is_spark.sql import QUERY_SQL, register_views, run_sql
from tests.conftest import SF_DIR


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect()), cols


@pytest.mark.parametrize("name", sorted(QUERY_SQL))
def test_sql_matches_dataframe_impl(spark, name):
    sql_rows, sql_cols = _rows(run_sql(spark, SF_DIR, name))
    df_rows, df_cols = _rows(entry.queries()[name](spark, SF_DIR))
    assert sql_cols == df_cols
    assert sql_rows == df_rows


def test_adhoc_sql_over_registered_views(spark):
    register_views(spark, SF_DIR)
    n_routes = spark.sql("SELECT COUNT(*) AS n FROM routes").collect()[0]["n"]
    n_orders = spark.sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
    assert n_routes == n_orders > 0
    top = spark.sql("""
        SELECT transport_type, COUNT(*) AS n FROM trips
        GROUP BY transport_type ORDER BY n DESC, transport_type LIMIT 1
    """).collect()
    assert len(top) == 1 and top[0]["n"] > 0
