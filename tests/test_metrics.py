"""Observation metrics (metrics.py — the P6 peek replacement): metrics
are collected during the SAME job, match the true counts, and do not
perturb the observed frame's rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreams_tp3_is_spark.metrics import collect_metrics, observed


def test_collect_metrics_counts_rows_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)],
        "id long, v string")
    m = collect_metrics(df, "t")
    assert m["n_rows"] == 4
    assert m["nulls_id"] == 0
    assert m["nulls_v"] == 2


def test_observed_frame_rows_unchanged_and_single_pass(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    out, obs = observed(df.where(F.col("id") % 2 == 0), "evens")
    rows = sorted(r["id"] for r in out.collect())
    assert rows == [0, 2, 4, 6, 8]
    assert dict(obs.get)["n_rows"] == 5  # collected by the SAME action


def test_observed_composes_mid_pipeline(spark):
    """Observe between stages: the metric sees the intermediate
    cardinality while downstream transforms continue on the same frame —
    the reference's peek-between-operators shape."""
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    mid, obs = observed(df.where(F.col("id") < 30), "after_filter")
    final = mid.groupBy((F.col("id") % 3).alias("g")).count()
    assert final.count() == 3
    assert dict(obs.get)["n_rows"] == 30


def test_collect_metrics_empty_frame_yields_zero_not_null(spark):
    df = spark.createDataFrame([(1, "a")], "id long, v string").where(F.lit(False))
    m = collect_metrics(df, "empty")
    assert m == {"n_rows": 0, "nulls_id": 0, "nulls_v": 0}
