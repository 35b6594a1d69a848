"""Bucketed-table layout for shuffle-free fact⋈dimension joins.

The reference joins re-keyed trip streams against route tables on every
query (SURVEY §2.4 J1-J4); at 100 TB the join's exchange of the fact side
IS the dominant cost. Spark's answer is Hive-style bucketing: write both
tables ``bucketBy(n, route_id)`` once, and every subsequent equi-join on
route_id reads co-located buckets with NO Exchange on either side —
the shuffle is paid once at layout time, amortized over every downstream
query (the same trade the signature store makes for shingling).

Mechanics that make it work (and that the pytest pins):
  - both sides bucketed on the SAME column with the SAME bucket count
    (mismatched counts re-shuffle the smaller side);
  - ``spark.sql.sources.bucketing.enabled`` on (default);
  - one file per bucket per table (the writer enforces this by
    repartitioning on the bucket column first — many files per bucket
    make Spark fall back to a sort per file);
  - ``sortBy`` within buckets lets the join run as a sort-merge with the
    sort elided too.

Bucketed layout requires the table catalog (``saveAsTable``): plain
``parquet(path)`` writes carry no bucket metadata, so reads can't trust
the layout. The tables are EXTERNAL (explicit ``path`` option), so
dropping them from the catalog leaves the data files in place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..views import routes, trips


def write_bucketed_tables(spark: SparkSession, sf_dir: str, path: str,
                          n_buckets: int = 16,
                          names: tuple[str, str] = ("routes_bucketed",
                                                    "trips_bucketed")
                          ) -> tuple[str, str]:
    """Write routes and trips as external bucketed+sorted tables on
    route_id. One layout shuffle per table, then co-located forever.
    Returns the catalog table names."""
    route_name, trip_name = names
    for name, df in ((route_name, routes(spark, sf_dir)),
                     (trip_name, trips(spark, sf_dir))):
        (df.repartition(n_buckets, "route_id")
           .write.bucketBy(n_buckets, "route_id").sortBy("route_id")
           .option("path", os.path.join(path, name))
           .mode("overwrite")
           .saveAsTable(name))
    return route_name, trip_name


def bucketed_occupancy_join(spark: SparkSession,
                            route_table: str = "routes_bucketed",
                            trip_table: str = "trips_bucketed"
                            ) -> DataFrame:
    """The Q4 join shape (trips ⋈ routes on route_id) over the bucketed
    layout: per-route passenger counts against capacity. With both
    tables bucketed on route_id the plan contains NO Exchange — the
    aggregation reuses the join's bucket partitioning too (route_id is
    the grouping key), so the whole query is exchange-free
    (plan-asserted in tests/test_bucketed.py)."""
    from pyspark.sql import functions as F

    t = spark.table(trip_table)
    r = spark.table(route_table)
    pax = t.groupBy("route_id").agg(F.count(F.lit(1)).alias("passengers"))
    return (r.join(pax, "route_id")
             .select("route_id", "capacity", "passengers"))
