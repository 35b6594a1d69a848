"""Bucketed-layout join: values match the plain derivation and the
physical plan is exchange-free — the layout shuffle is paid once at
write time, never per query."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def no_broadcast(spark):
    """The bucketing premise is a dimension too big to broadcast (at
    100 TB routes scales with SF — SURVEY 'never force-broadcast it');
    disable auto-broadcast so the planner must prove co-location."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    yield
    spark.conf.set(key, prev)


def test_bucketed_join_is_exchange_free_and_exact(spark, tmp_path,
                                                  no_broadcast):
    from kafkastreams_tp3_is_spark.sources.bucketed import (
        bucketed_occupancy_join, write_bucketed_tables)
    from kafkastreams_tp3_is_spark.views import routes, trips

    rt, tt = write_bucketed_tables(spark, SF_DIR, str(tmp_path),
                                   n_buckets=8)
    try:
        out = bucketed_occupancy_join(spark, rt, tt)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the whole query — scan, join, aggregation — runs without ANY
        # exchange: bucket partitioning satisfies the join AND the
        # groupBy distribution
        assert "Exchange" not in plan, plan
        got = sorted(tuple(r) for r in out.collect())
        pax = (trips(spark, SF_DIR).groupBy("route_id")
               .agg(F.count(F.lit(1)).alias("passengers")))
        want = sorted(tuple(r) for r in
                      routes(spark, SF_DIR).join(pax, "route_id")
                      .select("route_id", "capacity", "passengers")
                      .collect())
        assert got == want and len(got) > 0
        # mismatched bucket counts must NOT silently keep the claim: a
        # plain (unbucketed) read of the same data re-introduces the
        # exchange — proving the assert above is load-bearing
        plain = (spark.read.parquet(str(tmp_path / tt))
                 .groupBy("route_id")
                 .agg(F.count(F.lit(1)).alias("passengers"))
                 .join(spark.read.parquet(str(tmp_path / rt)), "route_id"))
        assert "Exchange" in \
            plain._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {rt}")
        spark.sql(f"DROP TABLE IF EXISTS {tt}")
