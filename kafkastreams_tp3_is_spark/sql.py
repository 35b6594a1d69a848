"""SQL entry surface: run the engine's queries — or any ad-hoc query —
as Spark SQL over registered views.

The reference's "query language" is the hand-built Kafka Streams DSL
(SURVEY section 3); this engine is declarative end to end, so the whole
surface is ALSO reachable as SQL: ``register_views`` publishes the raw
testdata tables plus the derived ``routes``/``trips`` views as temp views,
and ``QUERY_SQL`` carries Q1-Q13 as Spark-SQL statements. Catalyst compiles
these to the same physical plans as the DataFrame implementations in
queries.py — tests/test_sql.py asserts value parity for all 13.

The statements are the oracles.py strings (single source of truth for the
SQL semantics) with the one dialect difference patched: DuckDB's bare
``CAST(x AS VARCHAR)`` is ``CAST(x AS STRING)`` in Spark SQL. Everything
else — ||-concat, date_trunc, window functions, scalar subqueries — is
common ANSI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .oracles import ORACLES, Q_NAMES
from .schemas import TESTDATA_TABLES
from .session import configure_for_engine
from .views import load, routes, trips


def _duckdb_to_spark_sql(stmt: str) -> str:
    """Patch the one dialect difference between the DuckDB oracle
    statements and Spark SQL: bare ``CAST(x AS VARCHAR)`` is
    ``CAST(x AS STRING)``. Any NEW Q oracle must stay in the common-ANSI
    subset (no list_filter/unnest/list_dot_product etc. — those oracles
    are DuckDB-only and must not be listed in Q_NAMES)."""
    return stmt.replace("AS VARCHAR", "AS STRING")


#: Q1-Q13 as Spark-SQL statements (self-contained: each carries its
#: routes/trips derivation CTE, so they also run without register_views).
#: Keyed by the explicit Q_NAMES allowlist — NOT a name-prefix filter,
#: which would silently pull variant oracles into the SQL surface.
QUERY_SQL: dict[str, str] = {
    name: _duckdb_to_spark_sql(ORACLES[name]) for name in Q_NAMES
}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Publish the raw parquet tables and the derived route/trip views as
    temp views, making the whole engine queryable via ``spark.sql``."""
    configure_for_engine(spark)
    for t in TESTDATA_TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    routes(spark, sf_dir).createOrReplaceTempView("routes")
    trips(spark, sf_dir).createOrReplaceTempView("trips")


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ``query`` — a Q-name from QUERY_SQL or an ad-hoc SQL string —
    against the registered views."""
    register_views(spark, sf_dir)
    return spark.sql(QUERY_SQL.get(query, query))


def register_operator_views(spark: SparkSession, sf_dir: str,
                            names: list[str]) -> dict[str, DataFrame]:
    """Publish the OUTPUT of registry operators (``__spark_entry__.
    queries()`` names) as temp views, so ad-hoc Spark SQL can filter,
    join, and aggregate over them — e.g. join ``tfidf_topk`` against
    ``corpus_stats`` without touching the DataFrame API.

    Views are lazy plans: nothing executes until the SQL that reads them
    runs, and Catalyst optimizes the ad-hoc query TOGETHER with the
    operator's plan (filters push down into the operator). ``names`` is
    explicit rather than 'register everything' because a few operators
    run bounded driver-side work at plan-construction time (size-guard
    counts, IVF centroid training) that should not be paid for views
    never queried.

    Returns {name: DataFrame} — the frames carrying any operator-owned
    persisted internals (cache.py ownership), so a long-lived session
    can ``cache.release`` each one when done with its view instead of
    reaching for clearCache. Release semantics for PIPELINE-backed
    operators (``pipeline_standard_clean``/``pipeline_full_clean``, whose
    internals are localCheckpoint barriers with truncated lineage):
    ``release(df)`` defaults to ``consumed=True``, which frees the
    barrier blocks and makes the VIEW permanently unqueryable — call
    ``cache.release(df, consumed=False)`` instead if SQL will still read
    the view, and the full release only once the view is retired."""
    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise ValueError(f"unknown operator views {unknown}; registry "
                         f"has {len(registry)} entries")
    out: dict[str, DataFrame] = {}
    for n in names:
        df = registry[n](spark, sf_dir)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
