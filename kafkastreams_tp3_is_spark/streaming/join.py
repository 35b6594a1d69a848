"""KStream ⋈ KStream windowed (interval) stream-stream join.

The reference joins streams only against KTables (SURVEY section 2.4
J1–J4); Kafka Streams' other join family — ``KStream.join(KStream,
JoinWindows.of(...))``, where BOTH sides are unbounded and each event
pairs with opposite-side events inside a time tolerance — has no
reference site, so this module adds it the same way W5 added
sliding/session windows: full Spark-native semantics, a batch twin for
the oracle, and a stream==batch parity test.

Spark realization: Structured Streaming's native stream-stream inner
join. Both sides get a watermark; the join condition carries the
equality key AND the event-time interval bound, which is what lets the
engine size each side's state store (rows are evicted once the
opposite watermark passes their interval's edge — the exact analogue of
Kafka Streams' window-retention-bounded join stores).

Scale (100 TB/day streams): state per side is bounded by
rate x (interval + watermark delay); the join is co-partitioned on the
equality key (one shuffle per side, exactly like the batch join), and
emission is append-mode — each match emits once, no retraction. The
demo fixture pins shuffle partitions to a bounded count for its fresh
checkpoint (state-store count is frozen at checkpoint creation; see
stateful.py's sizing note).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_stream_interval_join(left: DataFrame, right: DataFrame,
                                key: str, left_ts: str, right_ts: str,
                                tolerance_days: int,
                                watermark: str,
                                how: str = "inner") -> DataFrame:
    """Join two STREAMING frames on ``key`` where ``right_ts`` is within
    ±``tolerance_days`` of ``left_ts``. ``how`` is ``inner`` (KStream
    ``join``) or ``leftOuter`` (KStream ``leftJoin``): the outer variant
    emits an unmatched left row with null right columns once the
    watermark proves no in-interval partner can still arrive — the same
    moment Kafka Streams' left join emits its null result at window
    close.

    ``watermark`` is the lateness bound for BOTH sides: it controls
    state eviction (and thus drops events arriving later than the bound,
    exactly like Kafka Streams' grace). For the inner join a bound >=
    the fixture's full time span makes the stream's output provably
    equal to the batch join — the parity the oracle checks. For the
    outer join the null emissions additionally need the watermark to
    PASS a row's interval edge, so the parity pytest drives the
    watermark forward with a sentinel final batch.

    The right side's key column is renamed before the join so the output
    carries a single unambiguous key column."""
    rk = f"__{key}_r"
    lw = left.withWatermark(left_ts, watermark)
    rw = (right.withColumnRenamed(key, rk)
               .withWatermark(right_ts, watermark))
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(right_ts)
           >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance_days} DAYS"))
        & (F.col(right_ts)
           <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance_days} DAYS")))
    return lw.join(rw, cond, how).drop(rk)


def trips_route_update_stream_join(spark: SparkSession, sf_dir: str,
                                   tolerance_days: int = 365,
                                   mod: int = 20) -> DataFrame:
    """Driver-gate fixture (full hash oracle): trips whose ship time is
    within ±``tolerance_days`` of their route's capacity UPDATE, both
    sides replayed as FILE STREAMS (two files per side -> each side's
    second batch must join against opposite-side state buffered from the
    first — the cross-batch buffering that makes this a real
    stream-stream join and not a disguised batch one).

    Both sides are sliced to ``key % mod == 0`` BEFORE derivation (the
    stateful demo's prefilter discipline), and the watermark (3700 days)
    exceeds the synthetic data's full time span, so nothing is
    late-dropped and the output equals the batch interval join the
    DuckDB oracle restates. Output: (trip_id, route_id, trip_ts,
    update_ts, capacity)."""
    from ..views import load, route_updates_from_orders, trips_from_lineitem

    trips = (trips_from_lineitem(
                 load(spark, sf_dir, "lineitem")
                 .where(F.col("l_orderkey") % mod == 0))
             .select("trip_id", "route_id",
                     F.col("event_ts").cast("timestamp").alias("trip_ts")))
    updates = (route_updates_from_orders(
                   load(spark, sf_dir, "orders")
                   .where(F.col("o_orderkey") % mod == 0))
               .select("route_id", "capacity",
                       F.col("event_ts").cast("timestamp")
                        .alias("update_ts")))

    workdir = tempfile.mkdtemp(prefix="ssjoin_")
    t_dir = os.path.join(workdir, "trips")
    u_dir = os.path.join(workdir, "updates")
    # two files per side via a b-partition (route-key parity split keeps
    # both batches non-trivial); maxFilesPerTrigger=1 -> 2 micro-batches
    # per side, so matches straddle the batch boundary by construction
    (trips.withColumn("b", (F.xxhash64("trip_id") % 2 == 0).cast("int"))
     .coalesce(1).write.partitionBy("b").mode("overwrite").parquet(t_dir))
    (updates.withColumn("b", (F.xxhash64("route_id") % 2 == 0).cast("int"))
     .coalesce(1).write.partitionBy("b").mode("overwrite").parquet(u_dir))

    t_schema = spark.read.parquet(t_dir).schema
    u_schema = spark.read.parquet(u_dir).schema
    t_stream = (spark.readStream.schema(t_schema)
                .option("maxFilesPerTrigger", "1").parquet(t_dir).drop("b"))
    u_stream = (spark.readStream.schema(u_schema)
                .option("maxFilesPerTrigger", "1").parquet(u_dir).drop("b"))

    joined = stream_stream_interval_join(
        t_stream, u_stream, key="route_id",
        left_ts="trip_ts", right_ts="update_ts",
        tolerance_days=tolerance_days, watermark="3700 days")

    rows: list = []

    def collect_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows.extend(batch_df.collect())

    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "16")
    try:
        q = (joined.writeStream.foreachBatch(collect_batch)
             .outputMode("append")
             .option("checkpointLocation", os.path.join(workdir, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, prev_parts)
        import shutil
        shutil.rmtree(workdir, ignore_errors=True)

    cols = ["trip_id", "route_id", "trip_ts", "update_ts", "capacity"]
    out_schema = joined.select(*cols).schema
    return spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in rows], schema=out_schema)
