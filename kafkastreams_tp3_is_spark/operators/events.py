"""Event-stream analytics over the ``events`` table (event_id, ts, user_id,
event_type, value, props-JSON) — capabilities BEYOND the reference's
operator surface (SURVEY 2.5 W5 / 2.6 list them as absent there, free in
Spark): session windows, sliding windows, JSON-path extraction, and ranked
top-k. Each is oracle-checked against a DuckDB restatement.

All four are single-shuffle patterns: sessionization shuffles once on
user_id, sliding counts once on (window, type) after a 4x in-map window
fan-out, JSON aggregation once on event_type, top-k once on event_type with
a bounded per-group sort. Aggregate outputs stay integral (counts/sums of
ints) so results hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import configure_for_engine
from ..views import load


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts restored to TimestampType. Handles both parquet
    encodings the driver has shipped: TIMESTAMP(NANOS) — which Spark's
    reader only accepts as long via nanosAsLong (session.py), converted
    here by integer DIV to micros, the same floor-truncation DuckDB's
    CAST(ts AS TIMESTAMP) applies — and native timestamp[us], which needs
    no conversion."""
    configure_for_engine(spark)
    ev = load(spark, sf_dir, "events")
    t = ev.schema["ts"].dataType.typeName()
    if t == "timestamp":
        return ev
    if t == "timestamp_ntz":
        # session tz is UTC (session.py), so this cast is value-preserving;
        # watermarks/windows require TIMESTAMP (LTZ), not NTZ
        return ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def sessionize(spark: SparkSession, sf_dir: str,
               gap: str = "30 minutes") -> DataFrame:
    """User sessions = maximal event runs with < 30 min between events
    (session_window — Spark-native, batch and streaming alike). Output:
    user_id, session_start, n_events."""
    ev = load_events(spark, sf_dir)
    return (ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
              .agg(F.count(F.lit(1)).alias("n_events"))
              .select("user_id", F.col("w.start").alias("session_start"),
                      "n_events"))


def sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per (1-hour window sliding by 15 min, event_type). Each event
    lands in exactly 4 epoch-aligned windows — the in-map fan-out is
    constant, then one hash agg."""
    ev = load_events(spark, sf_dir)
    return (ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"),
                       "event_type")
              .agg(F.count(F.lit(1)).alias("n_events"))
              .select(F.col("w.start").alias("window_start"), "event_type",
                      "n_events"))


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction + aggregation: per event_type, the count,
    distinct users, and exact integer sum of the props.k field."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.countDistinct("user_id").alias("n_users"),
                   F.sum(k).alias("sum_k")))


def topk_users(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k users by event count per event_type (ranking window function —
    absent from the reference, SURVEY 2.6). Tie-break: smallest user_id."""
    ev = load_events(spark, sf_dir)
    counts = (ev.groupBy("event_type", "user_id")
                .agg(F.count(F.lit(1)).alias("n_events")))
    w = Window.partitionBy("event_type").orderBy(F.col("n_events").desc(),
                                                 F.col("user_id").asc())
    return (counts.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("event_type", "user_id", "n_events",
                          F.col("rank").cast("int").alias("rank")))


def user_anomaly(spark: SparkSession, sf_dir: str,
                 z_threshold: float = 2.0) -> DataFrame:
    """Per-user activity anomalies: hourly event counts z-scored against
    the user's own mean/variance over their observed hours; |z| >=
    ``z_threshold`` flags a spike or lull hour.

    Exactness: mean and variance are computed from INTEGER count
    aggregates in explicit rational form
    (var = (n*sum_sq - total^2) / (n*(n-1)), sample variance), so the
    doubles — including sqrt, which IEEE 754 defines exactly — are
    bit-identical to the DuckDB restatement; no avg()/stddev() builtin
    whose internal summation order could differ. Users with < 2 observed
    hours or zero variance emit z = 0.0 (null-free gate).

    Scale: one hash agg on (user, hour), one on user (aggregate-sized),
    one join back keyed on user — the per-user side is one row, AQE
    broadcasts it. No windows over raw events, no driver state."""
    ev = load_events(spark, sf_dir)
    hourly = (ev.groupBy("user_id",
                         F.date_trunc("hour", F.col("ts")).alias("hour"))
                .agg(F.count(F.lit(1)).alias("cnt")))
    per_user = hourly.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"))
    n = F.col("n_hours").cast("double")
    mean = F.col("total").cast("double") / n
    var = ((n * F.col("sum_sq").cast("double")
            - F.col("total").cast("double") * F.col("total").cast("double"))
           / (n * (F.col("n_hours") - F.lit(1)).cast("double")))
    z = F.when((F.col("n_hours") >= 2) & (var > 0),
               (F.col("cnt").cast("double") - mean) / F.sqrt(var)
               ).otherwise(F.lit(0.0))
    return (hourly.join(per_user, "user_id")
            .select("user_id", "hour", "cnt", z.alias("z"))
            .withColumn("is_anomaly", F.abs(F.col("z")) >= z_threshold))


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by their first-active day, with
    distinct-user counts per (cohort day, day offset) — the classic
    product-analytics rollup (day-0 cohort size, day-N returners).

    Output: (cohort_day 'yyyy-MM-dd' string, day_offset, n_users).
    All-integer aggregates; the day is rendered as a string so both
    engines hash identical values (date dtypes cross the pandas bridge
    differently per engine).

    Scale: the (user, day) activity set is one distinct per user-day
    (map-side combined); first-day is an aggregate over it; the final
    count groups the aggregate-sized activity relation. Never more than
    one row per user-day in any shuffle."""
    ev = load_events(spark, sf_dir)
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (days.join(first, "user_id")
            .groupBy("cohort_day",
                     F.datediff(F.col("day"), F.col("cohort_day"))
                      .alias("day_offset"))
            .agg(F.countDistinct("user_id").alias("n_users"))
            .select(F.date_format("cohort_day", "yyyy-MM-dd")
                     .alias("cohort_day"),
                    F.col("day_offset").cast("int").alias("day_offset"),
                    "n_users"))


def funnel(spark: SparkSession, sf_dir: str,
           steps: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Sequential conversion funnel: per user, the earliest time each
    step was reached with every prior step completed STRICTLY earlier —
    the product-analytics primitive (view -> click -> purchase). Step
    semantics are sequential-min: t1 = min(view), t2 = min(click with
    ts > t1), t3 = min(purchase with ts > t2); a purchase before the
    first valid click does not count. Output per user: epoch-micro
    times per step (-1 sentinel when the step was never reached — the
    gate is null-free) and steps_completed.

    Scale: one aggregation plus one user-key equi-join per funnel step,
    all shuffling on the same user_id key — with co-partitioned exchange
    reuse the event table moves once per step and nothing is ever
    collected; step count is a constant of the query, not of the data.
    Timestamps compare as the micro-truncated values both engines store
    (load_events DIV-truncation == DuckDB CAST)."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    users = ev.select("user_id").distinct()
    prev = None  # (frame with user_id + t{i}, column name)
    outs = []
    for i, step in enumerate(steps, start=1):
        col = f"t{i}"
        if prev is None:
            s = (ev.where(F.col("event_type") == step)
                   .groupBy("user_id").agg(F.min("ts").alias(col)))
        else:
            pf, pc = prev
            s = (ev.where(F.col("event_type") == step)
                   .join(pf, "user_id")
                   .where(F.col("ts") > F.col(pc))
                   .groupBy("user_id").agg(F.min("ts").alias(col)))
        outs.append((s, col))
        prev = (s, col)
    out = users
    for s, _ in outs:
        out = out.join(s, "user_id", "left")
    reached = [F.col(c).isNotNull().cast("bigint") for _, c in outs]
    steps_completed = reached[0]
    for r in reached[1:]:
        steps_completed = steps_completed + r
    sel = [F.col("user_id")]
    for i, (_, c) in enumerate(outs):
        sel.append(F.coalesce(F.unix_micros(F.col(c)), F.lit(-1))
                   .alias(f"t_{steps[i]}_us"))
    sel.append(steps_completed.alias("steps_completed"))
    return out.select(*sel)
