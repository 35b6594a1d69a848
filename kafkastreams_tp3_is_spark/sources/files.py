"""File-based streaming sources — the broker-less stand-in for the Kafka
topics, used by the streaming tests and any parquet-landing-zone deployment.

A directory of parquet files is treated as an append-only topic: Structured
Streaming's FileStreamSource picks up files in arrival order, and
``maxFilesPerTrigger=1`` yields one micro-batch per file — the closest
batch-reproducible analogue of Kafka's record flow. The derived routes/trips
transforms (views.routes_from_orders / trips_from_lineitem) apply unchanged
on top because they are pure projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..views import routes_from_orders, trips_from_lineitem


def stream_parquet(spark: SparkSession, path: str,
                   max_files_per_trigger: int | None = 1) -> DataFrame:
    """Append-only stream over a parquet directory (schema inferred from the
    existing files; the file source requires it up front)."""
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def route_file_stream(spark: SparkSession, orders_dir: str,
                      max_files_per_trigger: int | None = 1) -> DataFrame:
    """Streaming routes: orders landing zone -> Route records (S1 analogue)."""
    return routes_from_orders(
        stream_parquet(spark, orders_dir, max_files_per_trigger))


def trip_file_stream(spark: SparkSession, lineitem_dir: str,
                     max_files_per_trigger: int | None = 1) -> DataFrame:
    """Streaming trips: lineitem landing zone -> Trip records."""
    return trips_from_lineitem(
        stream_parquet(spark, lineitem_dir, max_files_per_trigger))
