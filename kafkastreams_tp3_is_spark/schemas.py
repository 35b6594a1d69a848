"""Canonical schemas.

Route / Trip mirror the reference POJOs
(/root/reference/src/main/java/classes/Route.java:3-29,
 /root/reference/src/main/java/classes/Trip.java:3-28): row-oriented JSON
records with String keys; capacity is the only numeric field. An explicit
``event_ts`` TimestampType stands in for Kafka ingestion time (the reference
producers never set record timestamps — SURVEY.md section 1.2 "Time").
"""

from __future__ import annotations

from pyspark.sql import types as T

ROUTE_SCHEMA = T.StructType([
    T.StructField("route_id", T.StringType(), False),
    T.StructField("origin", T.StringType(), True),
    T.StructField("destination", T.StringType(), True),
    T.StructField("transport_type", T.StringType(), True),
    T.StructField("capacity", T.IntegerType(), True),
    T.StructField("operator", T.StringType(), True),
    T.StructField("event_ts", T.TimestampType(), True),
])

TRIP_SCHEMA = T.StructType([
    T.StructField("trip_id", T.StringType(), False),
    T.StructField("route_id", T.StringType(), True),
    T.StructField("origin", T.StringType(), True),
    T.StructField("destination", T.StringType(), True),
    T.StructField("transport_type", T.StringType(), True),
    T.StructField("passenger_name", T.StringType(), True),
    T.StructField("event_ts", T.TimestampType(), True),
])

# Kafka-facing JSON schemas exclude event_ts (it comes from the Kafka record
# timestamp on the wire), matching the reference where time is ingestion time.
ROUTE_JSON_SCHEMA = T.StructType([f for f in ROUTE_SCHEMA if f.name != "event_ts"])
TRIP_JSON_SCHEMA = T.StructType([f for f in TRIP_SCHEMA if f.name != "event_ts"])

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
