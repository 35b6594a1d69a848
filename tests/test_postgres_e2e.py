"""Live-Postgres end-to-end for the relational surface (S7/S8) — OPT-IN.

The sandbox ships neither a Postgres server nor psycopg2, so the suite
normally proves the upsert/incremental logic against DBAPI stand-ins
(tests/test_jdbc.py: SQLite shares the INSERT .. ON CONFLICT syntax).
This module closes the remaining environmental gap — the reference's
actual sink database is Postgres (reference
config/sink-passangers_per_route.json:9-18 connection.url
jdbc:postgresql://database:5432/project3, insert.mode=upsert;
config/route-suppliers.json:9-13 incrementing-id source) — when a real
server exists:

    docker compose -f integration/docker-compose.yml up -d database
    SPARK_GRAFT_PG_DSN="host=localhost port=5432 dbname=project3 \
    user=postgres password=My01pass" \
    python -m pytest tests/test_postgres_e2e.py -q

Covers, against genuine Postgres semantics (not a stand-in's):
  - S7 upsert idempotency: the same batch applied twice leaves the same
    rows (ON CONFLICT (key) DO UPDATE), with paramstyle='format'
    (psycopg2's %s binding — the marker difference that never surfaces
    on SQLite).
  - S7 auto-create + auto-evolve: the sink creates the result table and
    widens it mid-stream via ALTER TABLE ADD COLUMN.
  - S8 incremental polling over a SERIAL id: only rows above the stored
    watermark come back, across two successive inserts.
"""

from __future__ import annotations

import os
import uuid

import pytest

DSN = os.environ.get("SPARK_GRAFT_PG_DSN")

pytestmark = pytest.mark.skipif(
    not DSN, reason="live-Postgres e2e: set SPARK_GRAFT_PG_DSN to run")

# real driver when installed; otherwise the stdlib wire-protocol driver
# (sources/minipg.py) — the server stays genuine Postgres either way,
# which is the point of this module. scripts/pg_e2e_local.py launches a
# socket-only trust-auth local server and runs this file against it.
try:
    import psycopg2
except ImportError:
    from kafkastreams_tp3_is_spark.sources import minipg as psycopg2


def _connect_fn(dsn: str):
    """Zero-arg picklable connection factory for the executor side.
    The minipg fallback loads by FILE PATH inside the closure so Python
    workers never need the package importable (the suite's standing
    executor-closure rule); the psycopg2 path re-imports by name."""
    if psycopg2.__name__ == "psycopg2":
        def f():
            import psycopg2 as pg
            return pg.connect(dsn)
        return f
    path = psycopg2.__file__

    def f():
        import importlib.util
        spec = importlib.util.spec_from_file_location("_minipg_exec", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.connect(dsn)
    return f


@pytest.fixture()
def pg_table():
    """A unique table name per test, dropped afterwards."""
    name = f"e2e_{uuid.uuid4().hex[:12]}"
    yield name
    con = psycopg2.connect(DSN)
    try:
        with con.cursor() as cur:
            cur.execute(f"DROP TABLE IF EXISTS {name}")
        con.commit()
    finally:
        con.close()


def test_upsert_sink_idempotent_and_evolving(spark, pg_table):
    from kafkastreams_tp3_is_spark.sources.jdbc import DbUpsertSink

    sink = DbUpsertSink(pg_table, ["route_id"], _connect_fn(DSN),
                        max_writers=4, paramstyle="format")
    batch = spark.createDataFrame(
        [(1, 100), (2, 200)], "route_id long, total long")
    sink.process(batch, batch_id=0)
    sink.process(batch, batch_id=0)   # at-least-once replay: same rows
    updated = spark.createDataFrame(
        [(2, 250, 0.5)], "route_id long, total long, occupancy double")
    sink.process(updated, batch_id=1)  # widens the table mid-stream

    con = psycopg2.connect(DSN)
    try:
        with con.cursor() as cur:
            cur.execute(f"SELECT route_id, total, occupancy FROM {pg_table} "
                        f"ORDER BY route_id")
            rows = cur.fetchall()
    finally:
        con.close()
    assert rows == [(1, 100, None), (2, 250, 0.5)]


def test_incremental_source_serial_watermark(spark, pg_table):
    from kafkastreams_tp3_is_spark.sources.jdbc import IncrementalSource

    con = psycopg2.connect(DSN)
    try:
        with con.cursor() as cur:
            cur.execute(f"CREATE TABLE {pg_table} "
                        f"(id SERIAL PRIMARY KEY, name TEXT)")
            cur.execute(f"INSERT INTO {pg_table} (name) VALUES ('a'), ('b')")
        con.commit()
        src = IncrementalSource(spark, _connect_fn(DSN), pg_table,
                                paramstyle="format")
        first = src.poll().collect()
        assert sorted(r["name"] for r in first) == ["a", "b"]
        assert src.poll().count() == 0          # watermark holds
        with con.cursor() as cur:
            cur.execute(f"INSERT INTO {pg_table} (name) VALUES ('c')")
        con.commit()
        second = src.poll().collect()
        assert [r["name"] for r in second] == ["c"]   # only the new row
    finally:
        con.close()
