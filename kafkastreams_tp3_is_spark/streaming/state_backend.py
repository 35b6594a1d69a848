"""Streaming state-store backend selection.

The default HDFSBackedStateStoreProvider keeps every state-store
version as JVM heap maps — fine for the demo-sized key sets the gate
fixtures run, but at 100 TB the keyed state of a streaming dedup or
windowed aggregation (one entry per distinct key / open window) out-
grows executor heap and turns into GC churn. Spark 4 ships
RocksDBStateStoreProvider in the box: off-heap + local-disk state with
bounded memory, incremental (changelog) checkpointing, and snapshot
maintenance — the backend Structured Streaming deployments run at
scale (public Spark docs, SPARK-42792 et al.).

The provider is chosen per QUERY at first checkpoint creation from the
session conf, so a scoped setter is the right interface: wrap the
``writeStream.start()`` call, and restore the caller's conf after —
existing checkpoints keep the provider they were created with.

Parity is pinned in tests/test_streaming.py: the windowed-count +
extremum path and the applyInPandasWithState latest-per-key kernel
produce identical final state under RocksDB and under the default
provider (state backends must never change RESULTS, only where state
lives)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming."
                    "state.RocksDBStateStoreProvider")
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_KEY = ("spark.sql.streaming.stateStore.rocksdb."
                  "changelogCheckpointing.enabled")


@contextmanager
def rocksdb_state_store(spark: SparkSession, changelog: bool = True):
    """Scoped switch to the RocksDB state store for queries STARTED
    inside the block. ``changelog=True`` also enables incremental
    changelog checkpointing (upload deltas per batch instead of full
    RocksDB snapshots — the production default for high-rate state)."""
    prev_provider = spark.conf.get(_PROVIDER_KEY, None)
    prev_changelog = spark.conf.get(_CHANGELOG_KEY, None)
    spark.conf.set(_PROVIDER_KEY, ROCKSDB_PROVIDER)
    spark.conf.set(_CHANGELOG_KEY, "true" if changelog else "false")
    try:
        yield spark
    finally:
        for key, prev in ((_PROVIDER_KEY, prev_provider),
                          (_CHANGELOG_KEY, prev_changelog)):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
