"""OLAP-cube and sketch operators beyond the reference's surface:
multi-resolution rollups (one-pass GROUPING SETS) and approximate
quantiles (the bounded-memory sketch path for percentile dashboards).

rollup: Spark compiles ``rollup()`` to ONE Expand + aggregate — every
resolution level shares the same scan and the same map-side partial
aggregation, one shuffle total, vs one scan + shuffle per level for the
naive UNION ALL (which is exactly how the DuckDB oracle restates it —
the point of an oracle is the naive formulation).

quantiles: ``percentile_approx`` is Spark's Greenwald-Khanna sketch —
fixed-size state per group, mergeable across partitions, the only
quantile that works at 100 TB (an exact percentile needs a full sort).
Approximate by construction -> rows-only driver gate + an error-bound
pytest against the exact per-group percentile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..views import load
from .events import load_events

_EPOCH = "1970-01-01 00:00:00"


def trip_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trip counts at every resolution of the (transport_type, day, hour)
    hierarchy in ONE pass: level 0 = per hour, 1 = per day, 3 = per type,
    7 = grand total (Spark grouping_id semantics). Coarser levels emit
    'ALL' / epoch sentinels instead of nulls (null-free gate output).

    Scale: a single Expand(4x) + map-side-combined count + one shuffle of
    aggregate-sized rows — the cube fan-out never touches the wire
    unaggregated.

    Derivation pushdown (r16, the queries.py r15 pattern; guide §2.3):
    ``transport_type`` = Type_<l_orderkey % 5> is injective in the int
    key, so the 4x Expand and the hash agg run on the raw long and the
    string is decorated on the aggregate rows (<= 4 x 5 x days x hours);
    a never-null int key makes the rolled-up NULL unambiguous, so the
    'ALL' coalesce is unchanged."""
    li = load(spark, sf_dir, "lineitem")
    t = li.select(
        (F.col("l_orderkey") % 5).alias("_t"),
        F.date_trunc("day", "l_shipdate").alias("day"),
        F.date_trunc("hour", "l_shipdate").alias("hour"))
    epoch = F.lit(_EPOCH).cast("timestamp")
    type_str = F.concat(F.lit("Type_"), F.col("_t").cast("string"))
    return (t.rollup("_t", "day", "hour")
             .agg(F.count(F.lit(1)).alias("cnt"),
                  F.grouping_id().alias("level"))
             .select(
                 F.coalesce(type_str, F.lit("ALL"))
                  .alias("transport_type"),
                 F.coalesce("day", epoch).alias("day"),
                 F.coalesce("hour", epoch).alias("hour"),
                 F.col("level").cast("int").alias("level"),
                 "cnt"))


def events_value_quantiles(spark: SparkSession, sf_dir: str,
                           accuracy: int = 10000) -> DataFrame:
    """Per-event-type p50/p90/p99 of ``value`` via the GK sketch
    (percentile_approx). Output one row per (event_type, quantile).
    rows-only gate; tests/test_olap.py bounds the rank error against the
    exact percentile."""
    ev = load_events(spark, sf_dir).select("event_type", "value")
    qs = [0.5, 0.9, 0.99]
    agg = (ev.groupBy("event_type")
             .agg(F.percentile_approx("value", qs, accuracy).alias("vals")))
    pairs = F.arrays_zip(F.array(*[F.lit(q) for q in qs]).alias("q"),
                         F.col("vals").alias("v"))
    return (agg.select("event_type", F.explode(pairs).alias("p"))
               .select("event_type", F.col("p.q").alias("quantile"),
                       F.col("p.v").alias("value_approx")))


def events_value_quantiles_exact(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The EXACT verification twin of events_value_quantiles:
    nearest-rank percentiles — the value at row_number ceil(q * n) in
    per-group value order. No interpolation (interpolated percentiles
    mix ``(1-d)*a + d*b`` float rounding that engines disagree on);
    the selected value is one that EXISTS in the data, and the rank is
    ceil over the same IEEE product in both engines, so the gate is a
    full hash match. Tied values at the boundary are harmless: every
    row at a given rank inside a tie run carries the same value.

    Scale note: exact per-group quantiles sort each group (one shuffle
    + per-group window scan) — the verification-twin cost model; the GK
    sketch above remains the bounded-state scale path."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir).select("event_type", "value")
    # asc_nulls_last: Spark's bare ASC ranks NULLs first, DuckDB's
    # ORDER BY ranks them last — with NULL values present the two
    # engines would select different rows at rank ceil(q*n) (the same
    # divergence key_skew_profile guards against)
    w = Window.partitionBy("event_type") \
              .orderBy(F.col("value").asc_nulls_last())
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"))
    q = F.explode(F.array(*[F.lit(x) for x in (0.5, 0.9, 0.99)]))
    return (ranked.withColumn("quantile", q)
            .where(F.col("rn")
                   == F.ceil(F.col("quantile") * F.col("n").cast("double"))
                       .cast("bigint"))
            .select("event_type", "quantile", "value"))
