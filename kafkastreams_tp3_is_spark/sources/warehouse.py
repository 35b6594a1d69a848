"""Bucketed-table warehouse utilities — the co-located-join path for
100 TB deployments.

Kafka Streams co-partitions by topic partitioning (every re-key crosses a
repartition topic — SURVEY section 3); the Spark-native equivalent for
repeatedly-joined tables is BUCKETING: write both sides bucketed (and
sorted) by the join key, and every subsequent equi-join or groupBy on that
key runs with ZERO Exchange — the shuffle is paid once at write time and
amortized over every downstream query. tests/test_plans.py asserts the
exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, path: str | None = None) -> None:
    """Persist ``df`` as a bucketed+sorted table. Both sides of a future
    join must use the SAME bucket count and columns."""
    writer = (df.write.mode("overwrite")
              .bucketBy(num_buckets, *bucket_cols)
              .sortBy(*bucket_cols))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket columns: the planner
    uses the bucket distribution on both sides, so the plan contains no
    Exchange (verify with .explain)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
