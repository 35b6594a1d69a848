"""Broker-backed Kafka end-to-end smoke (SURVEY S1/S2/S12) — OPT-IN.

This sandbox ships no Kafka broker and no spark-sql-kafka connector jar,
so the suite normally exercises the serde/admin layers with in-memory
frames only. When a real broker exists, run this module to close the
loop the reference's MainStreamApp runs continuously
(MainStreamApp.java:22-34: consume Routes/Trips topics -> aggregate ->
emit to an output topic):

    SPARK_GRAFT_KAFKA_BOOTSTRAP=localhost:9092 \\
    SPARK_GRAFT_KAFKA_PACKAGES=org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.0 \\
    python -m pytest tests/test_kafka_smoke.py -q

SPARK_GRAFT_KAFKA_BOOTSTRAP gates the whole module (skipped cleanly when
unset). SPARK_GRAFT_KAFKA_PACKAGES is resolved via spark.jars.packages
on a DEDICATED session (the shared test session has no connector jar);
omit it if your Spark install already carries the connector.

The test round-trips: ensure topics (S12 AdminClient path) -> produce
routes/trips batches onto uniquely-suffixed topics (S2 batch write) ->
consume the trips topic as a typed stream (S1 + S3) -> run Q5
(passengers per route) as an update-mode streaming aggregate -> emit
(key, value-JSON) records to an output topic (S2/S4) -> batch-read the
output topic back, collapse by key like the Connect JDBC upsert sink
does, and compare against the batch Q5 answer over the same data.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="broker-backed smoke: set SPARK_GRAFT_KAFKA_BOOTSTRAP to run")


@pytest.fixture(scope="module")
def kafka_spark():
    """Session with the Kafka connector on the classpath.

    spark.jars.packages only takes effect on a FRESH JVM, and stopping
    another module's shared session to rebuild would leave the rest of a
    combined suite running on a dead SparkContext — so when package
    resolution is requested while a session is already active, SKIP with
    instructions to run this module standalone instead of sabotaging the
    suite. Without SPARK_GRAFT_KAFKA_PACKAGES the connector must already
    be on the classpath and any session (existing or new) works."""
    from pyspark.sql import SparkSession

    pkgs = os.environ.get("SPARK_GRAFT_KAFKA_PACKAGES")
    active = SparkSession.getActiveSession()
    if pkgs and active is not None:
        pytest.skip(
            "SPARK_GRAFT_KAFKA_PACKAGES needs a fresh JVM; run this "
            "module standalone: python -m pytest tests/test_kafka_smoke.py")
    builder = (SparkSession.builder.master("local[4]")
               .appName("kafka-smoke")
               .config("spark.sql.shuffle.partitions", "4")
               .config("spark.sql.session.timeZone", "UTC"))
    if pkgs:
        builder = builder.config("spark.jars.packages", pkgs)
    spark = builder.getOrCreate()
    yield spark
    if active is None:
        spark.stop()


def test_q5_consume_aggregate_emit_roundtrip(kafka_spark, tmp_path):
    from kafkastreams_tp3_is_spark.sources.admin import ensure_topics
    from kafkastreams_tp3_is_spark.sources.generators import (
        route_batch, trip_batch)
    from kafkastreams_tp3_is_spark.sources.kafka import (
        to_kafka_records, trip_stream, write_kafka_stream)
    from kafkastreams_tp3_is_spark.queries import q5_logic

    spark = kafka_spark
    run_id = uuid.uuid4().hex[:8]
    routes_topic = f"smoke_routes_{run_id}"
    trips_topic = f"smoke_trips_{run_id}"
    out_topic = f"smoke_q5_out_{run_id}"

    # S12: topic admin against the live broker (3 partitions like the
    # reference's KafkaTopicUtils call sites)
    created = ensure_topics(
        spark, BOOTSTRAP,
        [{"name": t, "partitions": 3} for t in
         (routes_topic, trips_topic, out_topic)])
    assert set(created) == {routes_topic, trips_topic, out_topic}

    # produce deterministic fixtures (S9/S10 generators) onto the topics
    routes = route_batch(spark, 50)
    trips = trip_batch(spark, 400, n_routes=50)
    (to_kafka_records(routes, "route_id").write.format("kafka")
     .option("kafka.bootstrap.servers", BOOTSTRAP)
     .option("topic", routes_topic).save())
    (to_kafka_records(trips, "trip_id").write.format("kafka")
     .option("kafka.bootstrap.servers", BOOTSTRAP)
     .option("topic", trips_topic).save())

    # S1/S3: typed stream off the trips topic; Q5 aggregate; S2/S4 emit
    stream = trip_stream(spark, BOOTSTRAP, topic=trips_topic)
    agg = q5_logic(None, stream)
    q = write_kafka_stream(
        to_kafka_records(agg, "route_id"), BOOTSTRAP, out_topic,
        str(tmp_path / "ckpt"), output_mode="update",
        trigger_available_now=True)
    q.awaitTermination()

    # read the output topic back and collapse by key, as the Connect
    # JDBC upsert sink does for the reference (latest record per key)
    raw = (spark.read.format("kafka")
           .option("kafka.bootstrap.servers", BOOTSTRAP)
           .option("subscribe", out_topic)
           .option("startingOffsets", "earliest").load()
           .select(F.col("key").cast("string").alias("k"),
                   F.col("value").cast("string").alias("v"),
                   "timestamp", "offset"))
    rows = raw.collect()
    latest: dict[str, int] = {}
    order: dict[str, tuple] = {}
    for r in rows:
        key = (r["timestamp"], r["offset"])
        if r["k"] not in order or key > order[r["k"]]:
            order[r["k"]] = key
            latest[r["k"]] = json.loads(r["v"])["passengerCount"]

    want = {r["route_id"]: r["passengerCount"]
            for r in q5_logic(None, trips).collect()}
    assert latest == want
