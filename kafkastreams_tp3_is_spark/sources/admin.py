"""Kafka topic administration (SURVEY section 2.1 S12; reference
utils/KafkaTopicUtils.java:25-38): create output topics that don't exist
yet, so sink jobs never race topic auto-creation.

This is a broker-side RPC with no query semantics, which is why SURVEY
scoped it optional — but the engine ships a working analogue so the one
remaining S-row has code: ``ensure_topics`` drives Kafka's AdminClient
through the Spark JVM (py4j) when the Kafka connector/client jars are on
the classpath (``--packages org.apache.spark:spark-sql-kafka-0-10_*``),
and fails with a clear, actionable error otherwise — this container
ships neither a broker nor kafka-clients, so only the spec-validation
layer is exercised by tests.

The validation layer (``topic_spec``) enforces Kafka's own topic rules
(legal chars, 249-char limit, no "." / "..", positive partition and
replication counts) so misconfigurations fail fast in Python instead of
deep inside a py4j stack trace.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

_LEGAL_TOPIC = re.compile(r"^[A-Za-z0-9._-]+$")
_ADMIN_CLASS = "org.apache.kafka.clients.admin.AdminClient"


def topic_spec(name: str, partitions: int = 1,
               replication_factor: int = 1) -> dict:
    """Validated NewTopic spec, per Kafka's topic naming/config rules."""
    if not name or name in (".", "..") or len(name) > 249 \
            or not _LEGAL_TOPIC.match(name):
        raise ValueError(
            f"illegal topic name {name!r}: 1-249 chars of [A-Za-z0-9._-], "
            "not '.' or '..'")
    if partitions < 1:
        raise ValueError(f"partitions must be >= 1, got {partitions}")
    if not 1 <= replication_factor <= 32767:
        raise ValueError(
            f"replication_factor must be in [1, 32767], got "
            f"{replication_factor}")
    return {"name": name, "partitions": int(partitions),
            "replication_factor": int(replication_factor)}


def ensure_topics(spark: SparkSession, bootstrap_servers: str,
                  specs: list[dict]) -> list[str]:
    """Create every topic in ``specs`` that does not already exist
    (reference parity: KafkaTopicUtils.createTopicIfNotExists). Returns
    the names actually created. Requires kafka-clients on the Spark JVM
    classpath and a reachable broker."""
    specs = [topic_spec(**s) for s in specs]
    jvm = spark.sparkContext._jvm
    try:
        jvm.java.lang.Class.forName(_ADMIN_CLASS)
    except Exception as exc:
        raise RuntimeError(
            "kafka-clients is not on the Spark classpath; launch with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
            "<spark-version> (or add the kafka-clients jar) to use "
            "ensure_topics") from exc
    props = jvm.java.util.Properties()
    props.setProperty("bootstrap.servers", bootstrap_servers)
    admin = getattr(jvm, _ADMIN_CLASS).create(props)
    try:
        existing = set(admin.listTopics().names().get())
        to_create = [s for s in specs if s["name"] not in existing]
        if to_create:
            topics = jvm.java.util.ArrayList()
            for s in to_create:
                topics.add(jvm.org.apache.kafka.clients.admin.NewTopic(
                    s["name"],
                    jvm.java.util.Optional.of(
                        jvm.java.lang.Integer.valueOf(s["partitions"])),
                    jvm.java.util.Optional.of(
                        jvm.java.lang.Short.valueOf(
                            jvm.java.lang.Short.parseShort(
                                str(s["replication_factor"]))))))
            admin.createTopics(topics).all().get()
        return [s["name"] for s in to_create]
    finally:
        admin.close()
