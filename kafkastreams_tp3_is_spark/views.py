"""Shared base views.

The driver testdata is TPC-H-ish (orders/lineitem/...), with no routes/trips
tables, so the engine derives them deterministically:

  routes <- orders    (small dimension; one Route per order)
  trips  <- lineitem  (fact; one Trip = one passenger, FK l_orderkey)

Every derived column is a pure function of integer keys so the DuckDB oracle
(oracles.py ROUTES_CTE / TRIPS_CTE) can state the *identical* expression and
hash-match bit-for-bit. Numeric rules: aggregates stay integral (BIGINT);
doubles appear only as a final division/multiplication of two exact integers,
so Spark and DuckDB produce identical IEEE-754 results regardless of
aggregation order. (Summing doubles would be order-dependent and break the
hash.)

Scale notes (100 TB): routes derives one row per orders row, so it SCALES
WITH SF — never force-broadcast it (AQE picks the join strategy); trips
derives 1:1 from the fact scan with no shuffle (all derivations are narrow
projections, so parquet column pruning still applies -- only the referenced
orders/lineitem columns are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# (applicationId, semanticHash) -> probed partition count; see spread().
# Bounded (r16, ADVICE r15): entries from a DIFFERENT application are
# evicted whenever a new application inserts (a long-lived process that
# restarts sessions would otherwise accrete dead-app entries forever),
# and within one application the size is capped — at the cap the cache
# resets rather than evicting piecemeal (the probe is a cheap re-pay;
# a FIFO/LRU structure isn't worth the bookkeeping for a plan-property
# memo). Correctness is unaffected either way: a missing entry only
# re-probes.
_SPREAD_PROBE_CACHE: dict[tuple[str, int], int] = {}
_SPREAD_PROBE_CACHE_MAX = 4096


def spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Scale-adaptive parallelism floor for CPU-heavy row-local stages
    (optimization r15; guide §2.4/§2.5): hash-repartition ``df`` on
    ``key`` up to the session's defaultParallelism, but ONLY when its
    current partitioning is narrower. The gate corpora are single small
    parquet files — one scan task — which serializes every per-row
    kernel (gram hashing, winnowing folds, Arrow kernels) onto one core
    of local[N]; at cluster scale the scan already carries >= cluster
    parallelism, the condition is false, and the full-payload shuffle an
    unconditional repartition would cost is skipped. Deterministic hash
    partitioning on ``key`` (never round-robin), so retried tasks
    reproduce their row assignment (guide §2.5/SPARK-38388)."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    try:
        # The partition-count probe (df.rdd) pays full physical planning
        # — measured 0.25-1.5 s on union-shaped fixture frames, per
        # CONSTRUCTION. Memoize it per (application, semantic plan):
        # semanticHash costs ~10 ms and identical semantic plans read
        # the same sources within an application. The cache holds a
        # PLAN PROPERTY for this heuristic only — a stale count could
        # at worst skip or add the floor (performance, never
        # correctness); results always recompute from the inputs.
        app = sc.applicationId
        k = (app, df.semanticHash())
        cur = _SPREAD_PROBE_CACHE.get(k)
        if cur is None:
            cur = df.rdd.getNumPartitions()
            if any(a != app for a, _ in _SPREAD_PROBE_CACHE) or \
                    len(_SPREAD_PROBE_CACHE) >= _SPREAD_PROBE_CACHE_MAX:
                _SPREAD_PROBE_CACHE.clear()
            _SPREAD_PROBE_CACHE[k] = cur
    except Exception:
        return df
    return df.repartition(n, key) if cur < n else df


def routes_from_orders(o: DataFrame) -> DataFrame:
    """Route derivation as a pure DataFrame transform — works identically on
    a batch scan and a file/Kafka streaming source (streaming/runner.py).

    Mirrors the reference Route POJO
    (/root/reference/src/main/java/classes/Route.java:3-29) and the scenario
    producer domains (producers/RoutesProducerCenario.java:40-52): 5 transport
    types, capacity in [1,200], small operator domain.
    """
    return o.select(
        F.concat(F.lit("Route_"), F.col("o_orderkey").cast("string")).alias("route_id"),
        F.concat(F.lit("Origin_"), (F.col("o_custkey") % 10).cast("string")).alias("origin"),
        F.concat(F.lit("Destination_"), (F.col("o_orderkey") % 10).cast("string")).alias("destination"),
        F.concat(F.lit("Type_"), (F.col("o_orderkey") % 5).cast("string")).alias("transport_type"),
        ((F.floor(F.col("o_totalprice")) % 200) + 1).cast("int").alias("capacity"),
        F.concat(F.lit("Operator_"), (F.col("o_orderkey") % 7).cast("string")).alias("operator"),
        F.col("o_orderdate").alias("event_ts"),
    )


def routes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch route dimension: orders parquet -> routes_from_orders."""
    return routes_from_orders(load(spark, sf_dir, "orders"))


def trips_from_lineitem(li: DataFrame) -> DataFrame:
    """Trip derivation as a pure DataFrame transform (one row = one
    passenger, /root/reference/src/main/java/streamFunctions/
    TotalPassengers.java:31-34).

    transport_type is derived from the FK the same way routes derives it from
    the PK, so trip.transport_type == its route's transport_type by
    construction (the scenario producer copies it from the route —
    producers/TripsProducerCenario.java:64) without needing a join here.
    """
    return li.select(
        F.concat(F.lit("Trip_"), F.col("l_orderkey").cast("string"),
                 F.lit("_"), F.col("l_linenumber").cast("string")).alias("trip_id"),
        F.concat(F.lit("Route_"), F.col("l_orderkey").cast("string")).alias("route_id"),
        F.concat(F.lit("Origin_"), (F.col("l_partkey") % 10).cast("string")).alias("origin"),
        F.concat(F.lit("Destination_"), (F.col("l_suppkey") % 10).cast("string")).alias("destination"),
        F.concat(F.lit("Type_"), (F.col("l_orderkey") % 5).cast("string")).alias("transport_type"),
        F.concat(F.lit("Passenger_"), (F.col("l_partkey") % 200).cast("string")).alias("passenger_name"),
        F.col("l_shipdate").alias("event_ts"),
    )


def trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch trip fact: lineitem parquet -> trips_from_lineitem."""
    return trips_from_lineitem(load(spark, sf_dir, "lineitem"))


def latest_per_key(df: DataFrame, key_cols: list[str], ts_col: str,
                   tiebreak_cols: list[str] | None = None) -> DataFrame:
    """KTable ``toTable`` / latest-value-per-key semantics (SURVEY section 2.3
    A9; reference sites e.g. streamFunctions/MostOccupiedOperator.java:61-65).

    Batch realization: row_number over (key ORDER BY ts DESC, tiebreaks DESC)
    = 1. One shuffle on the key; at scale this is the standard dedup pattern
    and AQE coalesces the post-shuffle partitions.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .drop("__rn"))


def route_updates_from_orders(o: DataFrame) -> DataFrame:
    """The RE-EMISSION projection: a later Route record (capacity
    shifted, event_ts + 1 day) for each input orders row — a pure
    function of the keys so the DuckDB oracle can restate it. Shared by
    ``routes_reemitted`` (every 10th route) and the stateful streaming
    demo (which pre-filters orders to its 1/80 key subset BEFORE the
    derivation, so the projection runs on 1/80 of the scan instead of
    filtering afterwards on a substring of the derived key)."""
    return o.select(
        F.concat(F.lit("Route_"), F.col("o_orderkey").cast("string")).alias("route_id"),
        F.concat(F.lit("Origin_"), (F.col("o_custkey") % 10).cast("string")).alias("origin"),
        F.concat(F.lit("Destination_"), (F.col("o_orderkey") % 10).cast("string")).alias("destination"),
        F.concat(F.lit("Type_"), (F.col("o_orderkey") % 5).cast("string")).alias("transport_type"),
        (((F.floor(F.col("o_totalprice")) + 37) % 200) + 1).cast("int").alias("capacity"),
        F.concat(F.lit("Operator_"), (F.col("o_orderkey") % 7).cast("string")).alias("operator"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 DAY")).alias("event_ts"),
    )


def routes_reemitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routes WITH re-emissions: every 10th route gets a second, later
    record with a different capacity — the changelog shape the reference's
    KTable semantics exists for (updated Route records on the topic)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    return routes(spark, sf_dir).unionByName(route_updates_from_orders(o))


def latest_route_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 exercised against real duplicate keys: latest Route record per
    route_id over the re-emitted changelog (the reference's KTable
    ``toTable`` / latest-value aggregation,
    streamFunctions/MostOccupiedOperator.java:61-65). Oracle-checked via a
    row_number-based DuckDB query."""
    latest = latest_per_key(routes_reemitted(spark, sf_dir),
                            ["route_id"], "event_ts")
    return latest.select("route_id", "capacity",
                         F.col("event_ts").alias("last_event_ts"))


# The shared base aggregates (capacity/passengers per route, SURVEY 2.3
# A1/A3) live in queries.py as *_logic functions so both batch wrappers and
# the streaming recompute harness reuse one definition.
