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
