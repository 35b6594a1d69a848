"""Streaming corpus ingestion with incremental near-dup suppression —
the production loop the batch operators compose into: documents arrive
continuously, and only never-seen-before content reaches the training
corpus.

Per micro-batch (foreachBatch):
  1. within-batch dedup: MinHash-LSH pairs -> connected components ->
     keep each cluster's canonical (minimum doc_id) document;
  2. cross-corpus dedup: dedup_against_df(survivors, accumulated corpus)
     drops anything near-duplicating already-ingested content;
  3. the remaining documents append to the corpus store.

All heavy work is DataFrame-distributed; the driver only coordinates.
State is the corpus parquet itself — at test scale its signatures are
recomputed per trigger, which the dedup_against_df docstring already
flags as the thing a production deployment replaces with a persisted
signature table (signatures are deterministic in doc content, so storing
them columnar beside the corpus is a pure cache).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cache
from ..operators.dedup import dedup_against_df, dedup_minhash_lsh_df
from ..operators.graph import connected_components_df


class StreamingCorpusDedup:
    """foreachBatch sink: maintain a near-dup-free corpus under a stream
    of (doc_id, text) documents. Exactly-once per document content: a
    near-dup arriving in the same batch as its original, in a later
    batch, or transitively through a chain is suppressed either by the
    within-batch clustering or by the cross-corpus check."""

    def __init__(self, spark: SparkSession, corpus_dir: str,
                 jaccard_threshold: float = 0.8, k: int = 9):
        self.spark = spark
        self.corpus_dir = corpus_dir
        self.threshold = jaccard_threshold
        self.k = k
        self.batches = 0

    def _corpus(self) -> DataFrame | None:
        if not os.path.isdir(self.corpus_dir):
            return None
        return self.spark.read.parquet(self.corpus_dir)

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        self.batches += 1
        batch = batch_df.select("doc_id", "text")
        if batch.isEmpty():
            return
        # 1. within-batch: cluster near-dups, keep canonical docs only
        pairs = dedup_minhash_lsh_df(
            batch, jaccard_threshold=self.threshold, k=self.k)
        cc = connected_components_df(pairs)
        non_canonical = (cc.where(F.col("node") != F.col("component"))
                           .select(F.col("node").alias("doc_id")))
        survivors = batch.join(non_canonical, "doc_id", "left_anti")
        # 2. cross-corpus: drop anything near-duplicating ingested content.
        # Hold the frames that carry operator-owned persists (pairs, and
        # the raw dedup_against_df result BEFORE .select().distinct()
        # strips the ownership attribute) so the per-trigger caches are
        # released after the terminal write — a long-running stream must
        # not accumulate one persisted frame per micro-batch.
        against = None
        corpus = self._corpus()
        if corpus is not None:
            against = dedup_against_df(survivors, corpus,
                                       jaccard_threshold=self.threshold,
                                       k=self.k)
            dup_new = (against
                       .select(F.col("new_id").alias("doc_id")).distinct())
            survivors = survivors.join(dup_new, "doc_id", "left_anti")
        # 3. append the genuinely new documents
        try:
            survivors.write.mode("append").parquet(self.corpus_dir)
        finally:
            cache.release(pairs)
            if against is not None:
                cache.release(against)

    def run(self, doc_stream: DataFrame, checkpoint_dir: str) -> None:
        q = (doc_stream.writeStream
             .foreachBatch(self.process)
             .outputMode("append")
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    def corpus(self) -> DataFrame:
        return self.spark.read.parquet(self.corpus_dir)
