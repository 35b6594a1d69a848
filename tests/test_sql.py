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


def test_register_operator_views_enables_adhoc_joins(spark):
    """Operator outputs as SQL views: an ad-hoc query joining tfidf
    against corpus_stats must run and agree with the DataFrame result;
    an unknown view name must fail fast."""
    import pytest

    from kafkastreams_tp3_is_spark.operators.retrieval import tfidf_topk
    from kafkastreams_tp3_is_spark.sql import register_operator_views
    from tests.conftest import SF_DIR

    register_operator_views(spark, SF_DIR, ["tfidf_topk", "corpus_stats"])
    out = spark.sql("""
        SELECT t.doc_id, t.term, t.tfidf
        FROM tfidf_topk t
        WHERE t.rnk = 1
        ORDER BY t.doc_id
    """).collect()
    want = sorted(
        ((r["doc_id"], r["term"], r["tfidf"])
         for r in tfidf_topk(spark, SF_DIR).collect() if r["rnk"] == 1))
    assert [(r["doc_id"], r["term"], r["tfidf"]) for r in out] == want
    joined = spark.sql("""
        SELECT COUNT(*) AS n FROM tfidf_topk t
        JOIN corpus_stats s ON s.n_docs > 0
    """).collect()[0]["n"]
    assert joined > 0
    with pytest.raises(ValueError, match="unknown operator views"):
        register_operator_views(spark, SF_DIR, ["nope"])
