"""Z-order clustered layout: Morton key correctness and the actual
pruning mechanism (per-file footer spans on BOTH dimensions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreams_tp3_is_spark.sources.zorder import (
    file_column_spans,
    mean_span_fraction,
    write_zordered,
    zorder_key,
)


def _morton2(x: int, y: int, bits: int = 21) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 2, 3, 500, 123456)
            for y in (0, 1, 7, 99, 2**20)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y",
                              zorder_key(["x", "y"]).alias("z")).collect()}
    for (x, y), z in got.items():
        assert z == _morton2(x, y)


def test_zorder_key_overflow_guard():
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)


@pytest.fixture(scope="module")
def grid_df(spark):
    # a 256x256 grid of (u, v) pairs — uniform in both dims, the shape
    # where single-column sorting is maximally misleading
    return (spark.range(256 * 256)
            .select((F.col("id") % 256).alias("u"),
                    (F.col("id") / 256).cast("long").alias("v"),
                    F.col("id").alias("payload")))


def test_zordered_layout_clusters_both_dims(grid_df, tmp_path):
    """The point of the layout: the z-ordered files have materially
    tighter footer spans on BOTH dims than a u-sorted control of the
    same file count (which is tight on u and full-range on v)."""
    z_path, s_path = str(tmp_path / "z"), str(tmp_path / "sorted_u")
    n_files = 16
    write_zordered(grid_df, ["u", "v"], z_path, n_files=n_files)
    (grid_df.repartitionByRange(n_files, "u").sortWithinPartitions("u")
     .write.mode("overwrite").parquet(s_path))

    z = file_column_spans(z_path, ["u", "v"])
    s = file_column_spans(s_path, ["u", "v"])
    assert len(z) == n_files and len(s) == n_files

    zu, zv = mean_span_fraction(z, "u"), mean_span_fraction(z, "v")
    su, sv = mean_span_fraction(s, "u"), mean_span_fraction(s, "v")
    # control: near-perfect on u, useless on v
    assert su < 0.15 and sv > 0.9
    # z-order: BOTH dims prunable — each file covers well under half
    # the range of either dimension (16 files on a 2-d curve ~ 1/4 per
    # dim in the ideal tiling)
    assert zu < 0.5 and zv < 0.5
    # and a point-ish predicate on v actually skips most files
    v_hit = sum(1 for f in z if f["v"][0] <= 42 <= f["v"][1])
    assert v_hit <= len(z) // 2


def test_zordered_data_is_lossless(grid_df, tmp_path, spark):
    path = str(tmp_path / "z2")
    write_zordered(grid_df, ["u", "v"], path, n_files=8)
    got = spark.read.parquet(path)
    assert got.count() == 256 * 256
    assert got.agg(F.sum("payload")).collect()[0][0] == \
        grid_df.agg(F.sum("payload")).collect()[0][0]
    assert "__zkey" not in got.columns
