"""compact_parquet (sources/maintenance.py): content-identical rewrite,
sizing formula, partition-layout preservation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafkastreams_tp3_is_spark.sources.maintenance import (
    compact_parquet, plan_file_count)


def _rows(df):
    return sorted(tuple(str(x) for x in r)
                  for r in df.select(*sorted(df.columns)).collect())


def _data_files(path):
    out = []
    for root, _d, names in os.walk(path):
        out += [os.path.join(root, n) for n in names
                if n.endswith(".parquet") and not n.startswith((".", "_"))]
    return out


def test_plan_file_count_is_exact_ceil_div():
    assert plan_file_count(0, 100) == 1          # never zero
    assert plan_file_count(1, 100) == 1
    assert plan_file_count(100, 100) == 1
    assert plan_file_count(101, 100) == 2
    # bigint territory: exact integer ceil, no double rounding
    assert plan_file_count((1 << 54) + 1, 1 << 54) == 2


def test_compact_unpartitioned_merges_files_and_preserves_rows(
        spark, tmp_path):
    path = str(tmp_path / "flat")
    (spark.range(5_000)
     .select("id", (F.col("id") % 7).alias("v"))
     .repartition(40).write.parquet(path))
    before_rows = _rows(spark.read.parquet(path))
    assert len(_data_files(path)) == 40
    stats = compact_parquet(spark, path, target_mb=256)
    assert stats["files_before"] == 40
    # everything fits one 256 MB target file
    assert stats["files_after"] == 1 == len(_data_files(path))
    assert _rows(spark.read.parquet(path)) == before_rows


def test_compact_preserves_hive_partition_layout(spark, tmp_path):
    path = str(tmp_path / "parted")
    (spark.range(3_000)
     .select("id", (F.col("id") % 3).alias("part"),
             (F.col("id") * 2).alias("v"))
     .repartition(10)
     .write.partitionBy("part").parquet(path))
    before_rows = _rows(spark.read.parquet(path))
    assert len(_data_files(path)) == 30            # 10 per partition
    compact_parquet(spark, path, target_mb=256)
    files = _data_files(path)
    assert len(files) == 3                         # one per partition
    # the col=value directories survive, so partition discovery (and
    # pruning) still sees the column
    assert {f.split("/")[-2] for f in files} == {
        "part=0", "part=1", "part=2"}
    after = spark.read.parquet(path)
    assert _rows(after) == before_rows
    pruned = after.where(F.col("part") == 1)
    assert pruned.count() == 1_000


def test_compact_empty_directory_is_a_safe_noop(spark, tmp_path):
    path = str(tmp_path / "empty")
    os.makedirs(path)
    stats = compact_parquet(spark, path)
    assert stats == {"files_before": 0, "files_after": 0, "bytes": 0}
    assert os.path.isdir(path)                     # dataset not destroyed
