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
