"""S7/S8: relational upsert sink + incremental source, against SQLite
(the in-container stand-in for the reference's Postgres — same
ON CONFLICT upsert syntax)."""

from __future__ import annotations

import sqlite3

import pytest

from kafkastreams_tp3_is_spark import queries as q
from kafkastreams_tp3_is_spark.sources.jdbc import DbUpsertSink, IncrementalSource
from tests.conftest import SF_DIR


@pytest.fixture()
def db_path(tmp_path):
    return str(tmp_path / "sink.db")


def _connect_fn(path):
    return lambda: sqlite3.connect(path, timeout=30)


def test_upsert_q5_twice_is_idempotent(spark, db_path):
    out = q.q5_passengers_per_route(spark, SF_DIR)
    sink = DbUpsertSink("passengers_per_route", ["route_id"],
                        _connect_fn(db_path), max_writers=1)
    sink.process(out, 0)
    sink.process(out, 1)  # at-least-once redelivery
    con = sqlite3.connect(db_path)
    n_db, = con.execute("SELECT COUNT(*) FROM passengers_per_route").fetchone()
    assert n_db == out.count()
    got = dict(con.execute(
        "SELECT route_id, passengerCount FROM passengers_per_route").fetchall())
    expect = {r["route_id"]: r["passengerCount"] for r in out.collect()}
    assert got == expect
    con.close()


def test_upsert_updates_changed_keys(spark, db_path):
    sink = DbUpsertSink("t", ["k"], _connect_fn(db_path), max_writers=1)
    sink.process(spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long"), 0)
    sink.process(spark.createDataFrame([("b", 9), ("c", 3)], "k string, v long"), 1)
    con = sqlite3.connect(db_path)
    got = dict(con.execute("SELECT k, v FROM t").fetchall())
    con.close()
    assert got == {"a": 1, "b": 9, "c": 3}


def test_incremental_source_polls_only_new_rows(spark, db_path):
    con = sqlite3.connect(db_path)
    con.execute("CREATE TABLE route_suppliers (id INTEGER PRIMARY KEY,"
                " supplier TEXT, route_id TEXT)")
    con.executemany("INSERT INTO route_suppliers VALUES (?, ?, ?)",
                    [(1, "S1", "R1"), (2, "S2", "R2")])
    con.commit()

    src = IncrementalSource(spark, _connect_fn(db_path), "route_suppliers")
    first = src.poll()
    assert first.count() == 2 and src.last_max == 2

    con.executemany("INSERT INTO route_suppliers VALUES (?, ?, ?)",
                    [(3, "S3", "R3")])
    con.commit()
    con.close()

    second = src.poll()
    rows = second.collect()
    assert len(rows) == 1 and rows[0]["supplier"] == "S3"
    assert src.poll().count() == 0


# --- S12 topic admin (sources/admin.py) --------------------------------

def test_topic_spec_validation():
    import pytest

    from kafkastreams_tp3_is_spark.sources.admin import topic_spec

    assert topic_spec("Routes_topic", 3, 1) == {
        "name": "Routes_topic", "partitions": 3, "replication_factor": 1}
    for bad in ("", ".", "..", "has space", "x" * 250):
        with pytest.raises(ValueError):
            topic_spec(bad)
    with pytest.raises(ValueError):
        topic_spec("ok", partitions=0)
    with pytest.raises(ValueError):
        topic_spec("ok", replication_factor=0)


def test_ensure_topics_without_kafka_clients_raises_actionable(spark):
    import pytest

    from kafkastreams_tp3_is_spark.sources.admin import ensure_topics

    # this container has no kafka-clients jar: the call must fail fast
    # with the remediation in the message, not a raw py4j stack
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        ensure_topics(spark, "localhost:9092", [{"name": "out_topic"}])


def test_upsert_auto_evolves_widened_schema(spark, db_path):
    """auto.evolve: a batch carrying a NEW column against a previously
    created table must ALTER TABLE ADD COLUMN and keep upserting —
    earlier rows read NULL for it, re-upserted keys get the value
    (the Connect sink's auto.evolve=true,
    config/sink-passangers_per_route.json:16-17)."""
    sink = DbUpsertSink("evolving", ["k"], _connect_fn(db_path),
                        max_writers=1)
    v1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    sink.process(v1, 0)
    v2 = spark.createDataFrame([("b", 20, 0.5), ("c", 30, 0.7)],
                               "k string, v long, score double")
    sink.process(v2, 1)
    con = sqlite3.connect(db_path)
    rows = {k: (v, s) for k, v, s in
            con.execute("SELECT k, v, score FROM evolving").fetchall()}
    con.close()
    assert rows == {"a": (1, None), "b": (20, 0.5), "c": (30, 0.7)}


def test_upsert_evolves_even_when_table_preexists(spark, db_path):
    """A sink attached to an already-existing table (fresh sink object,
    _created False but CREATE IF NOT EXISTS no-ops) must still evolve."""
    con = sqlite3.connect(db_path)
    con.execute("CREATE TABLE pre (k TEXT, PRIMARY KEY (k))")
    con.commit(); con.close()
    sink = DbUpsertSink("pre", ["k"], _connect_fn(db_path), max_writers=1)
    widened = spark.createDataFrame([("x", 7)], "k string, n long")
    sink.process(widened, 0)
    con = sqlite3.connect(db_path)
    assert con.execute("SELECT k, n FROM pre").fetchall() == [("x", 7)]
    con.close()


def test_partitioned_incremental_options_push_down_watermark(spark):
    """The fact-scale S8 form: the option map must push the incremental
    predicate into the dbtable subquery AND carry consistent range-split
    bounds so executors read disjoint id ranges in parallel."""
    src = IncrementalSource(spark, lambda: None, "route_suppliers",
                            id_col="id")
    src.last_max = 41
    opts = src.partitioned_options("jdbc:postgresql://db/x",
                                   upper_bound=100_041, num_partitions=16)
    assert "WHERE id > 41" in opts["dbtable"]
    assert opts["partitionColumn"] == "id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("42", "100041")
    assert opts["numPartitions"] == "16"
    # degenerate watermark (no rows beyond last_max): bounds stay ordered
    empty = src.partitioned_options("jdbc:postgresql://db/x",
                                    upper_bound=0)
    assert int(empty["upperBound"]) >= int(empty["lowerBound"])


def test_partitioned_options_alias_handles_schema_qualified_tables(spark):
    src = IncrementalSource(spark, lambda: None, "public.route_suppliers",
                            id_col="id")
    opts = src.partitioned_options("jdbc:postgresql://db/x", 100)
    alias = opts["dbtable"].rsplit(" AS ", 1)[1]
    assert "." not in alias, f"dotted subquery alias is invalid SQL: {alias}"
    assert "FROM public.route_suppliers" in opts["dbtable"]


def test_upsert_sql_paramstyles():
    """The same upsert logic must render qmark markers for
    sqlite3/duckdb and format markers for psycopg2 (the real-Postgres
    driver) — the marker difference a SQLite-only test never surfaces."""
    import pytest

    from kafkastreams_tp3_is_spark.sources.jdbc import (
        DbUpsertSink, upsert_sql)

    q = upsert_sql(["k", "v"], "t", ["k"])
    assert q == ("INSERT INTO t (k, v) VALUES (?, ?) "
                 "ON CONFLICT (k) DO UPDATE SET v = excluded.v")
    f = upsert_sql(["k", "v"], "t", ["k"], paramstyle="format")
    assert f == ("INSERT INTO t (k, v) VALUES (%s, %s) "
                 "ON CONFLICT (k) DO UPDATE SET v = excluded.v")
    # keyless append form
    assert upsert_sql(["a"], "t", [], "format") == \
        "INSERT INTO t (a) VALUES (%s)"
    with pytest.raises(ValueError, match="paramstyle"):
        DbUpsertSink("t", ["k"], lambda: None, paramstyle="numeric")
