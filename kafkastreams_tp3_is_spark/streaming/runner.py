"""Continuous execution of the Q1-Q13 logic functions (SURVEY W4 + section 4
"Incremental view maintenance").

Two strategies, mirroring what Structured Streaming supports natively vs
what needs the recompute harness:

1. ``run_update_mode_agg`` — single-level streaming aggregations (Q1, Q5,
   Q7, Q9, windowed counts): the streaming groupBy runs in **update** output
   mode, and each micro-batch's changed rows are upserted into the sink by
   key — exactly the reference's changelog-emission + Connect-JDBC-upsert
   collapse (sink-passangers_per_route.json:13-15).

2. ``RecomputeHarness`` — everything else (agg ⋈ agg, agg-over-agg, argmax
   over joined ratios: Q2-Q4, Q6, Q8, Q10-Q13). Spark cannot join two
   streaming aggregates in one continuous query, so per micro-batch the
   harness appends the new input rows to an accumulated store and re-runs
   the UNCHANGED batch logic over the whole history, upserting results.
   Sound because inputs are append-only and every query aggregates full
   history (SURVEY section 4 bottom line); the final state provably equals
   the batch answer (prefix consistency — tests/test_streaming.py).

The sink abstraction emulates what Kafka Connect does for the reference:
``MemoryUpsertSink`` collapses the update stream by key in-process (tests);
``sources/jdbc.py`` provides the real distributed JDBC upsert sink. Keys
never seen again simply keep their last value — the Connect sink never
deletes either.

Scale notes: the recompute harness re-reads accumulated parquet each
trigger — per-trigger work grows with stream age, so it is the GENERAL
fallback for ad-hoc logic only. The production path for the Q1-Q13 shapes
is streaming/partial_agg.py: maintained keyed partial aggregates merged
per trigger (O(batch + aggregate) inputs, the reference's own incremental
cost model), with stage-2 finalize over aggregate-sized frames. Both
keep all heavy lifting distributed — only sink-bound aggregate rows ever
reach the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # the conversion-layer exception family for the Arrow sink path
    from pyarrow.lib import ArrowException as _ArrowError
except ImportError:  # pragma: no cover - pyarrow is baked into the env
    class _ArrowError(Exception):
        pass


class MemoryUpsertSink:
    """Key-upsert sink emulating Connect's JDBC upsert collapse: the last
    update per key wins; no deletes. Driver-side by design — it receives
    only aggregate-sized result rows, never fact rows."""

    def __init__(self, key_cols: list[str]):
        self.key_cols = key_cols
        self.state: dict[tuple, dict] = {}
        self.batches = 0

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        self.batches += 1
        # Arrow collection: to_pylist() yields the same Python-native
        # values as Row.asDict(recursive=True) — int stays int (None for
        # nulls, no pandas float64 coercion), timestamps are datetime,
        # structs are dicts — at ~4x less driver time than collect() on
        # the 150k-row per-route results (measured 1.9 s -> 0.45 s at
        # sf0.1), which dominated the topology's per-trigger latency.
        # One divergence to repair: Arrow hands TIMESTAMP back tz-AWARE
        # (UTC) where Row gives a naive datetime in the session TZ (the
        # engine pins UTC), so strip the tzinfo after normalizing to UTC
        # to keep sink state byte-compatible with collect().
        import datetime as _dt

        def _naive(v):
            # Recurses through structs (dicts) and arrays (lists) so a
            # timestamp NESTED in the sink schema (e.g. a raw window
            # struct) gets the same repair as a top-level one — the
            # byte-compatibility promise is recursive because
            # Row.asDict(recursive=True) is (ADVICE r11).
            if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            if isinstance(v, dict):
                return {k: _naive(x) for k, x in v.items()}
            if isinstance(v, list):
                return [_naive(x) for x in v]
            return v

        try:
            arrow_rows = batch_df.toArrow().to_pylist()
        except (TypeError, ValueError, _ArrowError) as exc:
            # Conversion-layer failures ONLY (PySparkTypeError /
            # PySparkValueError are TypeError/ValueError subclasses;
            # pyarrow raises ArrowException): an unsupported sink-schema
            # type falls back to the collect() path. Genuine Spark JOB
            # errors (CapturedException / Py4JJavaError) propagate —
            # re-running the whole batch via collect() would double the
            # work and mask the original failure (ADVICE r11).
            import logging
            logging.getLogger(__name__).info(
                "MemoryUpsertSink: non-Arrow-convertible sink schema "
                "(%s); using the Row.asDict path", exc)
            rows = [r.asDict(recursive=True) for r in batch_df.collect()]
        else:
            rows = [{k: _naive(v) for k, v in d.items()}
                    for d in arrow_rows]
        for d in rows:
            key = (tuple(d[k] for k in self.key_cols) if self.key_cols
                   else ("__global__",))
            self.state[key] = d

    def rows(self) -> list[dict]:
        return list(self.state.values())


def windowed_counts_stream(trips_stream: DataFrame,
                           watermark: str = "0 seconds") -> DataFrame:
    """W1-W3 in native streaming form: tumbling 1-hour trip counts per
    transport type with an explicit watermark (grace 0, matching the
    reference's ofSizeWithNoGrace/ofSizeAndGrace(1h, ZERO) —
    TransportTypeMaxPassengersWindow.java:32,
    LeastOccupiedTransportTypeWindow.java:68). Rows later than the
    watermark are dropped, exactly the reference's late-data policy.
    event_ts is cast to (tz-aware) TIMESTAMP — watermarks reject
    TIMESTAMP_NTZ — which under the engine's UTC session TZ keeps the same
    wall-clock instants."""
    return (trips_stream
            .withColumn("event_ts", F.col("event_ts").cast("timestamp"))
            .withWatermark("event_ts", watermark)
            .groupBy(F.window("event_ts", "1 hour").alias("w"),
                     "transport_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("w.start").alias("window_start"),
                    "transport_type", "cnt"))


class WindowedExtremumSink:
    """Incremental per-window argmax/argmin over an UPDATE stream of
    windowed aggregates — stage 2 of the native Q11/Q12 path (reference:
    TransportTypeMaxPassengersWindow.java:28-53,
    LeastOccupiedTransportTypeWindow.java:39-94).

    Structured Streaming cannot chain a second stateful extremum onto a
    windowed aggregation inside one continuous update-mode query, and the
    recompute harness re-reads full history every trigger. This sink is
    the incremental-view middle ground: the streaming engine maintains the
    heavy windowed counts (distributed, watermarked, update mode); per
    micro-batch the sink upserts the CHANGED aggregate rows — aggregate-
    sized, never fact-sized — into its per-window contender maps and
    re-derives the extremum ONLY for windows the batch touched, reading
    ONLY that window's map: O(touched windows x contenders-per-window)
    work per trigger, independent of history length.

    Mutable state is bounded: contender maps are keyed by window, and
    windows the stream's watermark has closed are EVICTED (pass
    ``window_duration_sec`` + ``watermark_delay_sec`` matching the
    upstream aggregation; a window whose end + delay lies before the
    newest window start seen can never receive another update — the
    engine drops such rows — so its map is dead weight). With eviction on,
    mutable state is open-windows x contenders regardless of stream age;
    ``window_duration_sec=None`` disables eviction for unwatermarked /
    replay usage. ``state`` holds one FINAL row per window — that is the
    sink's output (the Connect upsert table never deletes); a distributed
    upsert sink (sources/jdbc.py) would hold it out of driver memory.

    ``score`` maps (contender, raw value) -> ranking value (identity for
    Q11's count; occupancy% against a capacity dimension for Q12);
    ties break on the smallest contender string, matching the batch
    argmax/argmin operators' deterministic tie-break.
    """

    def __init__(self, mode: str = "max", out_value: str = "maxPassengers",
                 window_col: str = "window_start",
                 contender_col: str = "transport_type",
                 value_col: str = "cnt", score=None,
                 window_duration_sec: int | None = None,
                 watermark_delay_sec: int = 0):
        if mode not in ("max", "min"):
            raise ValueError(f"mode must be max/min, got {mode!r}")
        self.mode = mode
        self.out_value = out_value
        self.window_col = window_col
        self.contender_col = contender_col
        self.value_col = value_col
        self.score = score or (lambda contender, value: value)
        self.window_duration_sec = window_duration_sec
        self.watermark_delay_sec = watermark_delay_sec
        self.counts: dict[object, dict[object, float]] = {}
        self.state: dict[object, dict] = {}
        self.evicted = 0
        self.batches = 0

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        self.batches += 1
        touched = set()
        max_w = None
        for row in batch_df.collect():
            d = row.asDict()
            w = d[self.window_col]
            c = d[self.contender_col]
            self.counts.setdefault(w, {})[c] = self.score(
                c, d[self.value_col])
            touched.add(w)
            if max_w is None or w > max_w:
                max_w = w
        for w in touched:
            contenders = self.counts[w].items()
            key = ((lambda cv: (-cv[1], cv[0])) if self.mode == "max"
                   else (lambda cv: (cv[1], cv[0])))
            best_c, best_v = sorted(contenders, key=key)[0]
            self.state[w] = {self.window_col: w, "transportType": best_c,
                             self.out_value: best_v}
        if self.window_duration_sec is not None and max_w is not None:
            self._evict_closed(max_w)

    def _evict_closed(self, max_window_start) -> None:
        """Drop contender maps of watermark-closed windows. A row for
        window w proves an event at >= w.start, so the engine's watermark
        is >= max_window_start - delay; any window with
        end + delay < max_window_start is past it and will never be
        updated again (late rows are dropped upstream). Eviction runs
        AFTER the batch's rows are applied, matching the engine's
        advance-watermark-at-batch-end order."""
        import datetime as _dt
        horizon = max_window_start - _dt.timedelta(
            seconds=self.window_duration_sec + self.watermark_delay_sec)
        dead = [w for w in self.counts if w < horizon]
        for w in dead:
            del self.counts[w]
        self.evicted += len(dead)

    def rows(self) -> list[dict]:
        return list(self.state.values())


def q11_windowed_argmax_sink(
        window_duration_sec: int | None = None,
        watermark_delay_sec: int = 0) -> WindowedExtremumSink:
    """Q11 native-streaming stage 2: per-window transport type with the
    MAX trip count. Compose with windowed_counts_stream via
    run_update_mode_agg; pass the stream's window duration / watermark
    delay to bound sink state to open windows."""
    return WindowedExtremumSink(mode="max", out_value="maxPassengers",
                                window_duration_sec=window_duration_sec,
                                watermark_delay_sec=watermark_delay_sec)


def q12_windowed_argmin_sink(cap_per_type: dict,
                             window_duration_sec: int | None = None,
                             watermark_delay_sec: int = 0
                             ) -> WindowedExtremumSink:
    """Q12 native-streaming stage 2: per-window transport type with MIN
    occupancy% = windowed count / all-time capacity per type * 100, with
    the reference's null/zero-capacity -> 0.0 guard
    (LeastOccupiedTransportTypeWindow.java:39-94). ``cap_per_type`` is the
    capacity dimension (transport-type domain, 5 entries — bounded), e.g.
    routes.groupBy(transport_type).sum(capacity) collected, or maintained
    by a latest-per-key KTable stream at full fidelity. Pass the stream's
    window duration / watermark delay to bound sink state to open
    windows, same as the q11 factory."""
    def occupancy(contender, cnt):
        cap = cap_per_type.get(contender)
        if not cap:
            return 0.0
        return cnt / cap * 100

    return WindowedExtremumSink(mode="min", out_value="occupancy",
                                score=occupancy,
                                window_duration_sec=window_duration_sec,
                                watermark_delay_sec=watermark_delay_sec)


def run_update_mode_agg(agg_df: DataFrame, sink, checkpoint_dir: str,
                        output_mode: str = "update") -> None:
    """Strategy 1: native streaming aggregation -> upsert sink. ``agg_df``
    is a streaming aggregate (e.g. q5_logic over a streaming trips frame).
    Runs to completion of available data (availableNow). Default update
    mode emits changed keys only (the reference's changelog emission);
    session-window aggregations require "complete" — pass it explicitly."""
    q = (agg_df.writeStream
         .foreachBatch(sink.process)
         .outputMode(output_mode)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


class RecomputeHarness:
    """Strategy 2: per-trigger full recompute of a batch logic function over
    accumulated append-only inputs.

    The two typed input streams are tagged and JSON-envelope-unioned into
    ONE streaming query (so each trigger sees new data from both sources —
    the Spark analogue of the reference's single topology consuming two
    topics), then per micro-batch: split by tag -> append to the
    accumulated parquet store -> re-run ``logic(routes, trips)`` -> upsert.
    """

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        self._schemas: dict[str, T.StructType] = {}

    def _acc_dir(self, tag: str) -> str:
        return os.path.join(self.workdir, f"acc_{tag}")

    def _accumulated(self, tag: str) -> DataFrame:
        path = self._acc_dir(tag)
        schema = self._schemas[tag]
        if os.path.isdir(path):
            # batches live in b<batch_id> subdirs (see process());
            # recursiveFileLookup reads them flat WITHOUT partition
            # discovery, so the explicit schema stays authoritative.
            return (self.spark.read.schema(schema)
                    .option("recursiveFileLookup", "true").parquet(path))
        return self.spark.createDataFrame([], schema)

    def run(self, routes_stream: DataFrame, trips_stream: DataFrame,
            logic, sink, checkpoint_dir: str | None = None) -> None:
        self.run_many(routes_stream, trips_stream, {"q": (logic, sink)},
                      checkpoint_dir)

    def run_many(self, routes_stream: DataFrame, trips_stream: DataFrame,
                 jobs: dict[str, tuple],
                 checkpoint_dir: str | None = None) -> None:
        """Run MANY query logics over the same accumulated inputs in one
        topology — the MainStreamApp shape (all queries share the two
        input topics and one runtime; each emits to its own sink). Per
        trigger the inputs are appended ONCE, then every logic re-runs."""
        self._schemas = {"routes": routes_stream.schema,
                         "trips": trips_stream.schema}
        tagged = (
            routes_stream.select(
                F.lit("routes").alias("src"),
                F.to_json(F.struct(*routes_stream.columns)).alias("js"))
            .unionByName(trips_stream.select(
                F.lit("trips").alias("src"),
                F.to_json(F.struct(*trips_stream.columns)).alias("js")))
        )

        def process(batch_df: DataFrame, batch_id: int) -> None:
            for tag in ("routes", "trips"):
                part = (batch_df.where(F.col("src") == tag)
                        .select(F.from_json("js", self._schemas[tag]).alias("r"))
                        .select("r.*"))
                if part.isEmpty():
                    continue
                # foreachBatch is at-least-once under checkpointed
                # recovery: a replayed batch must not duplicate history.
                # Each batch overwrites its OWN batch_id-named subdir, so
                # replays are idempotent and the accumulated store stays
                # exactly-once (ADVICE r10).
                part.write.mode("overwrite").parquet(
                    os.path.join(self._acc_dir(tag), f"b{batch_id:010d}"))
            routes = self._accumulated("routes")
            trips = self._accumulated("trips")
            for logic, sink in jobs.values():
                sink.process(logic(routes, trips), batch_id)

        q = (tagged.writeStream
             .foreachBatch(process)
             .outputMode("append")
             .option("checkpointLocation",
                     checkpoint_dir or os.path.join(self.workdir, "ckpt"))
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()


def _windowed_stream_demo(spark: SparkSession, sf_dir: str, sink,
                          prefix: str) -> "WindowedExtremumSink":
    """Shared staging for the native-streaming Q11/Q12 demo fixtures:
    project the trip fact to the two columns the windowed count needs,
    land it as a 4-file parquet zone (maxFilesPerTrigger=1 -> 4 genuine
    micro-batches), run the engine-maintained windowed counts in update
    mode into the per-window extremum sink. Watermark is replay-wide
    (the 4-file zone shuffles event order, and the demo's contract is
    final-state == batch); the shuffle-partition pin bounds state-store
    open/commit cycles per micro-batch (see stateful.py's note)."""
    import os
    import shutil
    import tempfile

    from ..views import load, trips_from_lineitem

    workdir = tempfile.mkdtemp(prefix=prefix)
    src = os.path.join(workdir, "trips")
    (trips_from_lineitem(load(spark, sf_dir, "lineitem"))
     .select("event_ts", "transport_type")
     .repartition(4).write.mode("overwrite").parquet(src))
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "16")
    try:
        run_update_mode_agg(
            windowed_counts_stream(stream, watermark="4000 days"),
            sink, os.path.join(workdir, "ckpt"))
    finally:
        spark.conf.set(conf_key, prev)
        shutil.rmtree(workdir, ignore_errors=True)
    return sink


def _update_mode_demo(spark: SparkSession, view_df: DataFrame,
                      logic, key_cols: list[str], prefix: str
                      ) -> "MemoryUpsertSink":
    """Shared staging for the native-streaming unwindowed demo fixtures:
    land the (batch) view as a 4-file parquet zone, replay it with
    maxFilesPerTrigger=1 (4 genuine micro-batches), run ``logic`` over
    the stream in update mode into a key-upsert sink. The engine
    maintains the aggregate state store across triggers — the Kafka
    Streams KTable contract — and the demo's gate is final-state ==
    batch (prefix consistency)."""
    import shutil
    import tempfile

    workdir = tempfile.mkdtemp(prefix=prefix)
    src = os.path.join(workdir, "fact")
    view_df.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    sink = MemoryUpsertSink(key_cols)
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "16")
    try:
        run_update_mode_agg(logic(stream), sink,
                            os.path.join(workdir, "ckpt"))
    finally:
        spark.conf.set(conf_key, prev)
        shutil.rmtree(workdir, ignore_errors=True)
    return sink


def q5_passengers_per_route_stream(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Driver-gate DEMO fixture (full hash against the SAME oracle as
    batch Q5): A1 per-key count in native streaming form — the engine's
    update-mode keyed state store maintains the per-route counts across
    4 micro-batches (PassengersPerRoute.java:37-40's groupBy().count()
    KTable), the upsert sink collapses the changelog, and the final
    state must equal the batch q5_logic answer exactly."""
    from .. import queries as _q
    from ..session import configure_for_engine
    from ..views import trips

    configure_for_engine(spark)
    sink = _update_mode_demo(
        spark, trips(spark, sf_dir).select("route_id"),
        lambda s: _q.q5_logic(None, s), ["route_id"], "q5stream_")
    return spark.createDataFrame(
        [(r["route_id"], int(r["passengerCount"])) for r in sink.rows()],
        "route_id string, passengerCount bigint")


def q7_total_capacity_available_stream(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Driver-gate DEMO fixture (full hash against the SAME oracle as
    batch Q7): A3/A4 global SUM in native streaming form — the
    reference's two-level re-aggregation with subtractor
    (TotalCapacityAvailable.java:35-57) realized as the engine's
    update-mode global aggregate state; integer sums make the final
    state bit-identical to the batch answer."""
    from .. import queries as _q
    from ..session import configure_for_engine
    from ..views import routes

    configure_for_engine(spark)
    sink = _update_mode_demo(
        spark, routes(spark, sf_dir).select("capacity"),
        lambda s: _q.q7_logic(s, None), [], "q7stream_")
    rows = sink.rows()
    assert len(rows) == 1, "global aggregate must collapse to one row"
    return spark.createDataFrame(
        [(int(rows[0]["totalCapacity"]),)], "totalCapacity bigint")


def q11_transport_type_max_passengers_window_stream(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate DEMO fixture (full hash against the SAME oracle as
    batch Q11): W1-W4 in native streaming form end to end — tumbling
    1-hour counts maintained by the engine in update mode, per-window
    argmax re-derived incrementally by WindowedExtremumSink for touched
    windows only. Final state must equal the batch q11_logic answer
    (prefix consistency), which the driver checks directly against the
    DuckDB date_trunc oracle."""
    from ..session import configure_for_engine

    configure_for_engine(spark)
    sink = _windowed_stream_demo(spark, sf_dir, q11_windowed_argmax_sink(),
                                 "q11stream_")
    return spark.createDataFrame(
        [(r["window_start"], r["transportType"], int(r["maxPassengers"]))
         for r in sink.rows()],
        "window_start timestamp, transportType string, maxPassengers bigint")


def q12_least_occupied_transport_type_window_stream(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate DEMO fixture (full hash against the SAME oracle as
    batch Q12): the windowed-count stream scored as occupancy%% against
    the bounded capacity dimension (5 transport types, collected once),
    per-window argmin in the sink. The sink's cnt / cap * 100 python
    floats repeat _occupancy's IEEE operation order, so the final state
    is bit-identical to the batch answer and hash-checks against the
    batch Q12 oracle."""
    from ..session import configure_for_engine
    from ..views import routes

    configure_for_engine(spark)
    cap = {r["transport_type"]: r["cap"]
           for r in (routes(spark, sf_dir)
                     .groupBy("transport_type")
                     .agg(F.sum("capacity").alias("cap"))).collect()}
    sink = _windowed_stream_demo(spark, sf_dir,
                                 q12_windowed_argmin_sink(cap),
                                 "q12stream_")
    return spark.createDataFrame(
        [(r["window_start"], r["transportType"], float(r["occupancy"]))
         for r in sink.rows()],
        "window_start timestamp, transportType string, occupancy double")
