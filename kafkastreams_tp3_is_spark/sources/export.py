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
    return _write_shards(packed, out_dir, n_shards)


def _write_shards(packed: DataFrame, out_dir: str,
                  n_shards: int) -> DataFrame:
    spark = packed.sparkSession
    (packed.repartition(n_shards, "shard")
           .sortWithinPartitions("doc_id")
           .write.mode("overwrite")
           .partitionBy("shard")
           .parquet(os.path.join(out_dir, "data")))
    manifest = shard_manifest(packed)
    (manifest.coalesce(1).write.mode("overwrite")
             .parquet(os.path.join(out_dir, "manifest")))
    return spark.read.parquet(os.path.join(out_dir, "manifest"))


def export_corpus_shards(docs: DataFrame, out_dir: str,
                         budget: int = 2048,
                         n_shards: int = 16) -> DataFrame:
    """Frame-based export: pack ANY (doc_id, text) corpus frame (already
    cleaned/deduped by the caller) and write sharded data + manifest with
    the same discipline as :func:`export_training_shards`. Because the
    pack layout is a pure function of (doc_id, n_tokens, n_shards,
    budget), a streamed corpus and a batch corpus holding the same
    documents export BYTE-identical shards and manifests — the equality
    the streaming round-trip test pins."""
    from ..operators.curation import pack_sequences_df

    packed = pack_sequences_df(docs.select("doc_id", "text"), budget,
                               n_shards)
    return _write_shards(packed, out_dir, n_shards)


def export_streamed_corpus(spark: SparkSession, doc_stream: DataFrame,
                           work_dir: str, out_dir: str,
                           clean_spec: list[dict] | None = None,
                           jaccard_threshold: float = 0.8,
                           budget: int = 2048,
                           n_shards: int = 16) -> DataFrame:
    """End-to-end streaming ingestion -> training shards, one availableNow
    run: documents stream through StreamingCorpusDedup (optional
    declarative pre-clean + within-batch and cross-corpus near-dup
    suppression into a persistent corpus store under ``work_dir``), and
    the resulting corpus exports via :func:`export_corpus_shards`.
    Returns the manifest. Re-running with new stream data re-exports the
    grown corpus; the corpus/signature stores resume from disk."""
    from ..streaming.incremental import StreamingCorpusDedup

    sink = StreamingCorpusDedup(
        spark, os.path.join(work_dir, "corpus"),
        jaccard_threshold=jaccard_threshold, clean_spec=clean_spec)
    sink.run(doc_stream, os.path.join(work_dir, "checkpoint"))
    return export_corpus_shards(sink.corpus().select("doc_id", "text"),
                                out_dir, budget, n_shards)
