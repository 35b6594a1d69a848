"""KTable latest-per-key as a TRUE incremental stateful streaming operator.

The reference's core abstraction is the KTable: a changelog stream collapsed
to latest-value-per-key, re-emitting a key only when its value changes
(reference sites: streamFunctions/MostOccupiedOperator.java:61-65,
LeastOccupiedTransportTypeWindow.java:49-52 build KTables from re-keyed
streams). views.latest_per_key is the batch realization (row_number over a
full history); this module is the *streaming* realization: per-key state via
``applyInPandasWithState`` holding only the latest event-time seen, emitting
a row exactly when it beats the state — i.e. the KTable changelog itself.

Scale notes (100 TB): state is ONE long per key (the latest timestamp), kept
in the state store co-partitioned by key — no history accumulates, unlike
the recompute harness. Emissions are changed-keys-only (update semantics),
so the sink traffic is the changelog rate, not the input rate. This is the
per-key-state shape Kafka Streams itself uses for ``toTable``.

At extreme key cardinality the per-key Python kernel invocation of
``applyInPandasWithState`` is the bottleneck; Spark 4's
``transformWithStateInPandas`` (RocksDB-backed, richer state API) is the
successor. RE-VERIFIED BLOCKED (round 7, re-checked round 12, pyspark
4.1.2): a complete
minimal port (StatefulProcessor with a getValueState handle, grouped
parquet file stream, availableNow trigger) fails at runtime with
``STREAM_FAILED ... TransformWithStateInPySpark driver worker exited
unexpectedly (crashed) SQLSTATE: XXKST``; the crash is the driver
worker importing the state-server protocol messages —
``pyspark.sql.streaming.proto.StateMessage_pb2`` line 23 does ``from
google.protobuf import descriptor`` and the container has no
``google`` package (``ModuleNotFoundError: No module named 'google'``)
with installs frozen. Everything above the protocol layer imports and
compiles fine (StatefulProcessor, the api-client, the driver-worker
module), so the port is mechanical the day protobuf exists: the kernel
body here (argmax + one-long state compare) maps 1:1 onto
``StatefulProcessor.handleInputRows``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def latest_per_key_stream(stream_df: DataFrame, key_cols: list[str],
                          ts_col: str) -> DataFrame:
    """Streaming latest-per-key: emits a key's row iff its ``ts_col`` is
    strictly newer than everything previously seen for that key (first
    occurrence always emits). Within one micro-batch the max-ts row wins,
    ties broken by batch order (last wins) — the changelog collapse Kafka
    Streams applies under caching.

    The kernel is a self-contained closure (imports inside): executor
    Python workers must not need this module importable.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = stream_df.schema
    cols = [f.name for f in out_schema.fields]
    state_schema = T.StructType([T.StructField("max_ts", T.LongType())])
    ordered = stream_df.withColumn("__ts", F.col(ts_col).cast("timestamp"))

    def emit_latest(key, pdf_iter, state):
        import pandas as pd

        best = None            # (ts_nanos, single-row DataFrame)
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            # vectorized argmax; reversed scan makes the LAST max-ts row win
            tsn = pdf["__ts"].astype("int64").to_numpy()
            i = len(tsn) - 1 - int(tsn[::-1].argmax())
            if best is None or int(tsn[i]) >= best[0]:
                best = (int(tsn[i]), pdf.iloc[[i]][cols])
        if best is not None:
            prev = state.get[0] if state.exists else None
            if prev is None or best[0] > prev:
                state.update((best[0],))
                yield best[1]

    return (ordered.groupBy(*key_cols)
            .applyInPandasWithState(
                emit_latest,
                outputStructType=out_schema,
                stateStructType=state_schema,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def dedup_exact_stream(stream_df: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """Streaming exact deduplication: emit only the FIRST document seen
    per md5(text). ``dropDuplicates`` keeps per-key state in the state
    store co-partitioned by the digest — the streaming twin of
    operators/dedup.dedup_exact's batch groupBy, and the shape Kafka
    Streams implements as a dedup-by-key processor.

    Scale: state is one 16-byte digest per DISTINCT document (not per
    input row); dedup keys must live forever for global exactness, so no
    watermark is applied — a bounded-window variant would add
    ``withWatermark`` before this call and Spark ages the state out."""
    return (stream_df
            .withColumn("text_md5", F.md5(F.col(text_col)))
            .dropDuplicates(["text_md5"]))


def latest_route_capacity_stateful(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """A9 in its native streaming form, driver-checkable: replay the
    re-emitted route changelog (views.routes_reemitted) through
    ``latest_per_key_stream`` with availableNow, collapse the emitted
    changelog by key (what the Connect JDBC upsert sink does), and return
    the final state — checked against a dedicated DuckDB row_number oracle.

    The replay keeps only keys that actually receive an update, and an
    eighth of those (route ids divisible by 80 — a subset of the
    every-10th re-emission set), so EVERY key in the demo still exercises
    the duplicate-key state transition while the per-key Python
    state-kernel invocation count stays bounded
    (``applyInPandasWithState`` calls the kernel once per key per batch;
    that per-key cost is the price of true incremental state and is paid
    on the changelog's key cardinality, by design — the demo buys the
    same semantic coverage at 1/80 of the full key space).

    The in-process sink receives only route-level changelog rows (key-
    cardinality, not fact-cardinality); a production deployment points the
    same stream at sources/jdbc.DbUpsertSink instead.
    """
    from ..views import load, route_updates_from_orders, routes_from_orders
    from .runner import MemoryUpsertSink

    # derive the demo changelog from PRE-FILTERED orders: route_id =
    # 'Route_' + o_orderkey, so key % 80 == orderkey % 80 and the filter
    # runs on the integer column before any string derivation (1/80 of
    # the projection work; 80 | key implies 10 | key, so every demo key
    # is in the re-emission set and gets exactly 2 events). Only the 3
    # columns the demo consumes are staged — narrower Arrow batches
    # through the per-key Python state kernel.
    o80 = (load(spark, sf_dir, "orders")
           .where(F.col("o_orderkey") % 80 == 0))
    cols = ["route_id", "capacity", "event_ts"]
    # stage + checkpoint on tmpfs when the box has one: the demo's
    # parquet staging, WAL commits, and per-batch state-store commits
    # are all fsync-latency-bound at this tiny size
    # tmpfs staging is a latency trick at demo scale, not a storage
    # strategy: the staged changelog grows with sf (orders/80), and
    # /dev/shm is RAM-backed — filling it ENOSPC-fails the write or
    # pressures the whole box. Only use it when the source table is
    # comfortably small; estimate from the orders parquet's on-disk
    # bytes (a safe over-bound for a 1/80, 3-column slice).
    shm = "/dev/shm"
    use_shm = False
    if os.path.isdir(shm):
        import shutil as _sh

        # walk the orders DATASET PATH itself: a single-file table is
        # one 'orders.parquet' file, a standard Spark layout is an
        # 'orders.parquet/' directory of part-*.parquet files — summing
        # every *.parquet under the path covers both (a basename filter
        # saw 0 bytes for the directory layout, which read as "tiny"
        # and staged an arbitrarily large changelog into RAM)
        orders_path = os.path.join(sf_dir, "orders.parquet")
        if os.path.isfile(orders_path):
            src_bytes = os.path.getsize(orders_path)
        else:
            src_bytes = sum(
                os.path.getsize(os.path.join(r, n))
                for r, _d, ns in os.walk(orders_path)
                for n in ns if n.endswith(".parquet"))
        # a zero estimate means the layout defeated the walk — treat
        # as UNKNOWN size and keep the staging on disk
        use_shm = 0 < src_bytes < min(_sh.disk_usage(shm).free // 4,
                                      1 << 30)
    workdir = tempfile.mkdtemp(prefix="latest_stateful_",
                               dir=shm if use_shm else None)
    src_dir = os.path.join(workdir, "in")
    # 2 files / maxFilesPerTrigger=1 -> exactly 2 micro-batches, staged
    # ASYMMETRICALLY in ONE write (single plan compile): batch file b=0
    # carries every original plus the updates of three quarters of the
    # keys (within-batch collapse), b=1 only the remaining quarter's
    # updates (the cross-batch duplicate-key state transition — those
    # keys' originals are in the other file by construction, whichever
    # order the trigger picks). Same rows, same final state, same
    # oracle — but the per-key Python kernel fires 1875 + 469 times
    # instead of ~2 x 1875 (applyInPandasWithState invokes it once per
    # key per batch, and the second trigger pays only its own key set).
    late = F.col("o_orderkey") % 320 == 0
    (routes_from_orders(o80)
     .unionByName(route_updates_from_orders(o80.where(~late)))
     .withColumn("b", F.lit(0))
     .unionByName(route_updates_from_orders(o80.where(late))
                  .withColumn("b", F.lit(1)))
     .select(*cols, "b").coalesce(1)
     .write.partitionBy("b").mode("overwrite").parquet(src_dir))
    changelog = spark.read.parquet(src_dir).drop("b")

    stream = (spark.readStream.schema(changelog.schema.add("b", "integer"))
              .option("maxFilesPerTrigger", "1").parquet(src_dir)
              .drop("b"))
    latest = latest_per_key_stream(stream, ["route_id"], "event_ts")
    sink = MemoryUpsertSink(["route_id"])
    # A stateful stream's state-store partition count is frozen from
    # spark.sql.shuffle.partitions at checkpoint creation. Under the
    # driver's default (200), each micro-batch pays 200 state-store
    # open/commit cycles + Python worker round trips for a demo-sized
    # key set — pure fixed overhead; too FEW serializes the per-key
    # Python kernel onto a couple of workers (2 partitions measured
    # ~4.1 s/batch vs ~1.1 s at 16 on this corpus). Pin a bounded count
    # for THIS fresh checkpoint and restore the caller's conf afterwards
    # (on a real cluster this is sized to key cardinality / executor
    # count).
    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "16")
    try:
        q = (latest.writeStream.foreachBatch(sink.process)
             .outputMode("update")
             .option("checkpointLocation", os.path.join(workdir, "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, prev_parts)
        # the sink rows are already in driver memory; reclaim the staged
        # input + checkpoint (tmpfs is a shared, bounded resource)
        import shutil
        shutil.rmtree(workdir, ignore_errors=True)

    out = spark.createDataFrame(
        [(r["route_id"], r["capacity"], r["event_ts"]) for r in sink.rows()],
        schema=T.StructType([
            T.StructField("route_id", T.StringType()),
            T.StructField("capacity", T.IntegerType()),
            T.StructField("last_event_ts",
                          changelog.schema["event_ts"].dataType),
        ]))
    return out
