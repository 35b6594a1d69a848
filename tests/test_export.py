"""Export-sink round-trip: the written shards must verify against the
manifest, be deterministic across runs, and cover exactly the cleaned
corpus."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafkastreams_tp3_is_spark.operators.pipeline import corpus_clean  # noqa: E402
from kafkastreams_tp3_is_spark.sources.export import (  # noqa: E402
    export_training_shards, shard_manifest)
from tests.conftest import SF_DIR  # noqa: E402


def test_export_round_trip_and_determinism(spark, tmp_path):
    m1 = export_training_shards(spark, SF_DIR, str(tmp_path / "run1"),
                                n_shards=4)
    data = spark.read.parquet(str(tmp_path / "run1" / "data"))
    # coverage: exactly the cleaned corpus, no dupes
    kept = corpus_clean(spark, SF_DIR).count()
    assert data.count() == kept
    assert data.select("doc_id").distinct().count() == kept
    # every written shard re-verifies against its manifest row
    recomputed = {r["shard"]: (r["n_docs"], r["n_tokens"], r["content_xor"])
                  for r in shard_manifest(data).collect()}
    written = {r["shard"]: (r["n_docs"], r["n_tokens"], r["content_xor"])
               for r in m1.collect()}
    assert recomputed == written
    assert set(written) == {0, 1, 2, 3}
    # determinism: a second export produces identical manifests
    m2 = export_training_shards(spark, SF_DIR, str(tmp_path / "run2"),
                                n_shards=4)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_export_one_file_per_shard(spark, tmp_path):
    export_training_shards(spark, SF_DIR, str(tmp_path / "run"), n_shards=4)
    import glob
    for shard in range(4):
        files = glob.glob(str(tmp_path / "run" / "data" / f"shard={shard}"
                              / "*.parquet"))
        assert len(files) == 1, \
            f"shard {shard}: repartition-on-shard must yield one file"


def test_streamed_export_manifest_equals_batch_pipeline(
        spark, planted_docs, tmp_path):
    """The full streaming loop: planted docs arrive in micro-batches
    (near-dup copies in LATER batches than their originals), stream
    through StreamingCorpusDedup, and export as training shards under
    ONE availableNow run. The manifest must equal the batch pipeline's
    (batch LSH clustering -> canonical survivors -> same exporter) on
    the same input — streamed and batch corpora of identical content
    produce byte-identical shard layouts."""
    from kafkastreams_tp3_is_spark.operators.graph import (
        duplicate_clusters_lsh_df)
    from kafkastreams_tp3_is_spark.sources.export import (
        export_corpus_shards, export_streamed_corpus)

    docs, _ = planted_docs
    src = tmp_path / "stream_in"
    for lo, hi in ((0, 20), (20, 100), (100, 300)):
        (docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
             .repartition(1).write.mode("append").parquet(str(src)))
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    streamed = export_streamed_corpus(
        spark, stream, str(tmp_path / "work"), str(tmp_path / "out_stream"),
        jaccard_threshold=0.7, budget=256, n_shards=4)

    clusters = duplicate_clusters_lsh_df(docs, threshold=0.7)
    survivors = docs.join(
        clusters.where(~F.col("is_canonical")).select("doc_id"),
        "doc_id", "left_anti")
    batch = export_corpus_shards(survivors, str(tmp_path / "out_batch"),
                                 budget=256, n_shards=4)

    key = ["shard", "n_docs", "n_tokens", "content_xor"]
    got = sorted(tuple(r[k] for k in key) for r in streamed.collect())
    want = sorted(tuple(r[k] for k in key) for r in batch.collect())
    assert got == want and len(got) == 4
    # and the exported DATA directories agree row-for-row
    a = spark.read.parquet(str(tmp_path / "out_stream" / "data"))
    b = spark.read.parquet(str(tmp_path / "out_batch" / "data"))
    cols = sorted(a.columns)
    assert sorted(map(tuple, a.select(cols).collect())) == \
        sorted(map(tuple, b.select(cols).collect()))
