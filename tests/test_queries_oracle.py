"""Spark queries() vs DuckDB oracle_sql() at sf0.001 — the local mirror of
the driver's correctness gate (row count + columns + exact values, floats
bit-identical)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_frames_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        # rows-only check, like the driver's weaker gate
        assert sdf.count() >= 0
        return
    ddf = duck.execute(ORACLES[name]).fetchdf()
    assert_frames_match(sdf, ddf)


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_bench_classification_names_exist():
    """BASELINE/DEMO bench sets and the Q_NAMES allowlist must reference
    real registry entries — a silent rename would misclassify timings or
    shrink the reference metric without failing anything."""
    import bench
    from kafkastreams_tp3_is_spark.oracles import Q_NAMES

    names = set(QUERIES)
    assert bench.BASELINE_QUERIES <= names
    assert bench.DEMO_QUERIES <= names
    assert bench.COMPOSED_QUERIES <= names
    assert set(Q_NAMES) <= names
    assert len(Q_NAMES) == 13
    assert set(Q_NAMES) <= set(ORACLES)
