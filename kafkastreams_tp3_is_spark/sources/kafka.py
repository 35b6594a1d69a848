"""Kafka source/sink + JSON serdes (SURVEY S1-S4).

The reference consumes keyed JSON POJOs from ``Routes_topic``/``Trips_topic``
(/root/reference/src/main/java/streamFunctions/AvailableSeatsPerRoute.java:29-32)
and emits string results to one output topic per query
(PassengersPerRoute.java:60). Spark-first realization:

  S1 scan  -> spark.readStream.format("kafka") + from_json
  S2 sink  -> writeStream.format("kafka") with (key, value) strings
  S3 deser -> from_json; malformed records become NULL and are dropped
              (the reference *throws* and kills the task,
              utils/JsonDeserializer.java:24-26 — our drop-and-continue is
              the documented, strictly-more-robust deviation, SURVEY 7.7)
  S4 ser   -> to_json(struct(...))

The parse/serialize helpers are pure DataFrame transforms over
(key binary/string, value binary/string, timestamp) records so they are
fully testable without a broker: tests drive them with in-memory frames
shaped like Kafka source output. The readStream/writeStream wrappers only
assemble options around them (they additionally need the
spark-sql-kafka-0-10 connector jar on the cluster).

Scale: from_json/to_json are JVM expressions inside whole-stage codegen;
parsing is a narrow map over source partitions (1 Kafka partition = 1 Spark
input partition; parallelism follows the topic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import ROUTE_JSON_SCHEMA, TRIP_JSON_SCHEMA

ROUTES_TOPIC = "Routes_topic"
TRIPS_TOPIC = "Trips_topic"


def parse_json_records(records: DataFrame, schema: T.StructType,
                       ts_col: str = "timestamp") -> DataFrame:
    """S3: typed rows from raw Kafka-shaped records.

    ``records`` needs (value binary-or-string, `ts_col` timestamp); the
    Kafka record timestamp becomes ``event_ts`` (the reference windows on
    ingestion time — SURVEY 1.2 "Time"). Malformed JSON is dropped: in
    PERMISSIVE mode from_json yields a NULL struct (null input) or an
    all-null struct (unparseable input), so a row survives only if at least
    one field parsed. The drop count is observable via F.observe if needed.
    """
    parsed = records.withColumn(
        "__rec", F.from_json(F.col("value").cast("string"), schema))
    any_field = None
    for f in schema.fields:
        c = F.col(f"__rec.{f.name}").isNotNull()
        any_field = c if any_field is None else (any_field | c)
    return (parsed
            .where(F.col("__rec").isNotNull() & any_field)
            .select(*[F.col(f"__rec.{f.name}").alias(f.name) for f in schema.fields],
                    F.col(ts_col).alias("event_ts")))


def to_kafka_records(df: DataFrame, key_col: str | None,
                     value_cols: list[str] | None = None) -> DataFrame:
    """S4: (key string, value string) records; value = JSON object of
    ``value_cols`` (default: all non-key columns)."""
    cols = value_cols or [c for c in df.columns if c != key_col]
    key = (F.col(key_col).cast("string") if key_col
           else F.lit(None).cast("string"))
    return df.select(key.alias("key"),
                     F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"))


def read_kafka_stream(spark: SparkSession, brokers: str, topic: str,
                      schema: T.StructType,
                      starting_offsets: str = "earliest") -> DataFrame:
    """S1: continuous typed stream from a Kafka topic."""
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", brokers)
           .option("subscribe", topic)
           .option("startingOffsets", starting_offsets)
           .load())
    return parse_json_records(raw, schema)


def route_stream(spark: SparkSession, brokers: str,
                 topic: str = ROUTES_TOPIC) -> DataFrame:
    return read_kafka_stream(spark, brokers, topic, ROUTE_JSON_SCHEMA)


def trip_stream(spark: SparkSession, brokers: str,
                topic: str = TRIPS_TOPIC) -> DataFrame:
    return read_kafka_stream(spark, brokers, topic, TRIP_JSON_SCHEMA)


def write_kafka_stream(records: DataFrame, brokers: str, topic: str,
                       checkpoint_dir: str, output_mode: str = "update",
                       trigger_available_now: bool = False):
    """S2: emit (key, value) string records to an output topic. Update mode
    matches the reference's continuous-refinement emission (SURVEY W4);
    returns the started StreamingQuery. ``trigger_available_now`` drains
    the currently-available input and stops — the run-to-completion mode
    the broker smoke test (tests/test_kafka_smoke.py) uses."""
    writer = (records.writeStream.format("kafka")
              .option("kafka.bootstrap.servers", brokers)
              .option("topic", topic)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode(output_mode))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
