"""Training-corpus export sink: the last stage of the pipeline —
materialize the cleaned, packed corpus as sharded parquet with a
verifiable manifest.

Write discipline for a 100 TB corpus:
  - the frame is repartitioned ON the shard key before partitionBy, so
    each task owns whole shards and every shard directory gets exactly
    one file per task that owns it — partitionBy without the repartition
    makes every task write into every shard (tasks x shards small
    files, the classic output-explosion);
  - rows are sorted within partitions by doc_id, so shard files are
    byte-deterministic across runs (same input -> same files);
  - the manifest (one row per shard: doc/token counts + an order-
    insensitive xor checksum over doc content hashes) is computed from
    the same frame in the same job and written beside the data. A
    downstream consumer — or a re-run — verifies a shard by recomputing
    its manifest row; tests do exactly that round-trip.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import pack_sequences
from ..operators.pipeline import corpus_clean


def shard_manifest(packed: DataFrame) -> DataFrame:
    """(shard, n_docs, n_tokens, content_xor) from a packed frame —
    the verification row a consumer recomputes per shard."""
    return (packed.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.bit_xor(F.xxhash64("doc_id", "n_tokens", "pack_id"))
                  .alias("content_xor")))


def export_training_shards(spark: SparkSession, sf_dir: str, out_dir: str,
                           budget: int = 2048,
                           n_shards: int = 16) -> DataFrame:
    """Clean -> pack -> write sharded + manifest; returns the manifest.

    Composition: corpus_clean survivors (exact dedup + quality floor +
    language confirmation) keep their pack placement from pack_sequences
    (shard, pack_id, offsets). Data lands in ``out_dir``/data partitioned
    by shard (one file per shard, doc_id-ordered), the manifest in
    ``out_dir``/manifest."""
    keep = corpus_clean(spark, sf_dir).select("doc_id")
    packed = (pack_sequences(spark, sf_dir, budget, n_shards)
              .join(keep, "doc_id"))
    (packed.repartition(n_shards, "shard")
           .sortWithinPartitions("doc_id")
           .write.mode("overwrite")
           .partitionBy("shard")
           .parquet(os.path.join(out_dir, "data")))
    manifest = shard_manifest(packed)
    (manifest.coalesce(1).write.mode("overwrite")
             .parquet(os.path.join(out_dir, "manifest")))
    return spark.read.parquet(os.path.join(out_dir, "manifest"))
