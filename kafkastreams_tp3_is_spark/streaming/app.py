"""Streaming topology entry point — the engine's MainStreamApp.

The reference registers all 13 continuous queries on ONE StreamsBuilder
consuming Routes_topic/Trips_topic and emits each query's changelog to its
own output topic (MainStreamApp.java:20-38 in the reference repo). Spark
analogue: one foreachBatch topology over the tag-unioned input streams —
per trigger, new records append to the accumulated inputs once, every
query logic re-runs over them, and each result upserts into its per-query
sink (the Connect-JDBC collapse of the reference's changelog emission).

The recompute strategy is the one execution mode that covers ALL 13
shapes — aggregate⋈aggregate joins, argmax over non-monotone ratios,
windowed argmax — with exact final-state parity (SURVEY §5.3); the
single-level aggregations (Q5/Q9/...) can equally run as native
update-mode streaming queries via streaming/runner.run_update_mode_agg.

``TOPOLOGY`` doubles as the registry of per-query upsert keys — the
record keys of the reference's output topics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..queries import QUERY_LOGIC
from .runner import MemoryUpsertSink, RecomputeHarness

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
                 sinks: dict[str, object] | None = None) -> dict[str, object]:
    """Attach all 13 queries to the shared input streams and run to
    completion of available data. Returns the per-query sinks (defaults
    to in-memory upsert sinks keyed per TOPOLOGY; pass DbUpsertSink
    instances for the JDBC path)."""
    if sinks is None:
        sinks = {name: MemoryUpsertSink(keys)
                 for name, keys in TOPOLOGY.items()}
    jobs = {name: (QUERY_LOGIC[name], sinks[name]) for name in TOPOLOGY}
    RecomputeHarness(spark, workdir).run_many(routes_stream, trips_stream,
                                              jobs)
    return sinks
