"""Streaming topology entry point — the engine's MainStreamApp.

The reference registers all 13 continuous queries on ONE StreamsBuilder
consuming Routes_topic/Trips_topic and emits each query's changelog to its
own output topic (MainStreamApp.java:20-38 in the reference repo). Spark
analogue: one foreachBatch topology over the tag-unioned input streams —
per trigger, the new records merge ONCE into the shared maintained
partial-aggregate stores (streaming/partial_agg.py), every query's
finalize re-derives its result from those aggregate-sized stores, and each
result upserts into its per-query sink (the Connect-JDBC collapse of the
reference's changelog emission).

This is the reference's own cost model — incremental stage-1 maintenance
(its RocksDB aggregates + subtractors, TotalOccupancyPercentage.java:
65-88) with cheap stage-2 over aggregates — and improves on it by
maintaining each base aggregate once for all queries where the reference
rebuilds capacity-per-route five times (SURVEY section 4 'Topology/plan
reuse'). Per-trigger input volume is O(batch + aggregates), never
O(history); the general full-recompute fallback (runner.RecomputeHarness)
remains for ad-hoc logic with no declared partial-aggregate form.

``TOPOLOGY`` doubles as the registry of per-query upsert keys — the
record keys of the reference's output topics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .partial_agg import FINALIZE, IncrementalAggHarness
from .runner import MemoryUpsertSink

# query -> upsert key columns (the reference's output-topic record keys;
# [] = single-row global result under a constant key)
TOPOLOGY: dict[str, list[str]] = {
    "q1": ["route_id"],
    "q2": ["transport_type"],
    "q3": [],
    "q4": ["route_id"],
    "q5": ["route_id"],
    "q6": ["transport_type"],
    "q7": [],
    "q8": [],
    "q9": [],
    "q10": [],
    "q11": ["window_start"],
    "q12": ["window_start"],
    "q13": [],
}


def run_topology(spark: SparkSession, routes_stream: DataFrame,
                 trips_stream: DataFrame, workdir: str,
                 sinks: dict[str, object] | None = None,
                 stats: dict | None = None,
                 changelog: bool = True,
                 bucketed: bool = False,
                 n_buckets: int = 32) -> dict[str, object]:
    """Attach all 13 queries to the shared input streams and run to
    completion of available data. Returns the per-query sinks (defaults
    to in-memory upsert sinks keyed per TOPOLOGY; pass DbUpsertSink
    instances for the JDBC path). Pass a dict as ``stats`` to receive
    the harness's per-trigger record (trigger wall seconds, fact rows
    aggregated, stored aggregate rows read) — the cost-model evidence
    bench.py's topology_13q section publishes."""
    if sinks is None:
        sinks = {name: MemoryUpsertSink(keys)
                 for name, keys in TOPOLOGY.items()}
    jobs = {name: (FINALIZE[name], sinks[name]) for name in TOPOLOGY}
    # bucketed=True selects the hash-bucketed store layout (changed-key
    # buckets only are rewritten per trigger — the billion-key shape)
    h = IncrementalAggHarness(spark, workdir, bucketed=bucketed,
                              n_buckets=n_buckets)
    h.run_many(routes_stream, trips_stream, jobs, changelog=changelog)
    if stats is not None:
        stats["n_triggers"] = len(h.trigger_secs)
        stats["trigger_secs"] = h.trigger_secs
        stats["fact_rows_per_trigger"] = h.fact_rows_per_trigger
        stats["agg_rows_read_per_trigger"] = h.agg_rows_read_per_trigger
        stats["phase_secs"] = h.phase_secs
    return sinks
