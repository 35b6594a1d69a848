"""Synthetic Route/Trip record generators (SURVEY S9-S11).

The reference's producers emit one record per timer tick with small value
domains (producers/RoutesProducer.java:28-60: sequential routeId, 10
origins/destinations, capacity in [1,200], 10 operators, 5 transport types;
producers/TripsProducer.java:32-56: routeId uniform over Route_0..99, 1000
passenger names; the scenario pair RoutesProducerCenario/TripsProducerCenario
keeps FK integrity by sampling trips only from recently produced routes).

Spark-first realization: every generator is a pure projection over a
monotonically increasing counter column, so the SAME expressions run on

  - ``spark.range(n)``           -> deterministic batch fixtures, and
  - ``spark.readStream.format("rate")`` -> a live stream at N rows/sec
    (the rate source provides (timestamp, value)).

Determinism comes from xxhash64 of the counter (seeded) instead of
java.util.Random(5) — reproducible AND branch-free/codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSPORT_TYPES = ["Bus", "Taxi", "Train", "Metro", "Scooter"]
_SEED_CAP, _SEED_OP, _SEED_ORIG, _SEED_DEST, _SEED_TYPE = 11, 13, 17, 19, 23
_SEED_ROUTE_FK, _SEED_PAX = 29, 31


def _pick(counter: F.Column, seed: int, n: int) -> F.Column:
    """Deterministic uniform choice in [0, n) from the counter."""
    return F.pmod(F.xxhash64(counter, F.lit(seed)), F.lit(n))


def _ts(df: DataFrame) -> F.Column:
    """Event time: the rate source's own timestamp when streaming, else a
    deterministic minute-spaced clock from the counter (batch fixtures)."""
    if "timestamp" in df.columns:
        return F.col("timestamp")
    return F.timestamp_seconds(F.lit(1700000000) + F.col("value") * 60)


def synthetic_routes(counter_df: DataFrame) -> DataFrame:
    """Route records from a (value [, timestamp]) frame — S9."""
    v = F.col("value")
    tt = F.array(*[F.lit(t) for t in TRANSPORT_TYPES])
    return counter_df.select(
        F.concat(F.lit("Route_"), v.cast("string")).alias("route_id"),
        F.concat(F.lit("Origin_"), _pick(v, _SEED_ORIG, 10).cast("string")).alias("origin"),
        F.concat(F.lit("Destination_"), _pick(v, _SEED_DEST, 10).cast("string")).alias("destination"),
        F.element_at(tt, (_pick(v, _SEED_TYPE, 5) + 1).cast("int")).alias("transport_type"),
        (_pick(v, _SEED_CAP, 200) + 1).cast("int").alias("capacity"),
        F.concat(F.lit("Operator_"), _pick(v, _SEED_OP, 10).cast("string")).alias("operator"),
        _ts(counter_df).alias("event_ts"),
    )


def synthetic_trips(counter_df: DataFrame, n_routes: int = 100,
                    route_id_offset: int = 0) -> DataFrame:
    """Trip records from a counter frame — S10. routeId uniform over the
    first ``n_routes`` route ids (TripsProducer.java:41), passenger over
    1000 names. ``route_id_offset`` shifts the sampled id window so
    correlated-scenario trips reference only the most recent routes."""
    v = F.col("value")
    fk = _pick(v, _SEED_ROUTE_FK, n_routes) + F.lit(route_id_offset)
    tt = F.array(*[F.lit(t) for t in TRANSPORT_TYPES])
    return counter_df.select(
        F.concat(F.lit("Trip_"), v.cast("string")).alias("trip_id"),
        F.concat(F.lit("Route_"), fk.cast("string")).alias("route_id"),
        F.concat(F.lit("Origin_"), _pick(v, _SEED_ORIG, 10).cast("string")).alias("origin"),
        F.concat(F.lit("Destination_"), _pick(v, _SEED_DEST, 10).cast("string")).alias("destination"),
        F.element_at(tt, (_pick(fk, _SEED_TYPE, 5) + 1).cast("int")).alias("transport_type"),
        F.concat(F.lit("Passenger_"), _pick(v, _SEED_PAX, 1000).cast("string")).alias("passenger_name"),
        _ts(counter_df).alias("event_ts"),
    )


def route_batch(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic batch fixture of n routes."""
    return synthetic_routes(spark.range(n).withColumnRenamed("id", "value"))


def trip_batch(spark: SparkSession, n: int, n_routes: int = 100,
               route_id_offset: int = 0) -> DataFrame:
    """Deterministic batch fixture of n trips, FK-consistent with
    route_batch(n_routes + route_id_offset) — the S11 correlated scenario."""
    return synthetic_trips(spark.range(n).withColumnRenamed("id", "value"),
                           n_routes, route_id_offset)


def route_rate_stream(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """Live Route stream at N rows/sec (reference: 1 route / 5 s)."""
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())
    return synthetic_routes(rate)


def trip_rate_stream(spark: SparkSession, rows_per_second: int = 1,
                     n_routes: int = 100) -> DataFrame:
    """Live Trip stream at N rows/sec (reference: 1 trip / 5 s)."""
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())
    return synthetic_trips(rate, n_routes)
