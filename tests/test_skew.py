"""salted_join (operators/skew.py): value parity with the plain join on a
skewed dataset, salt-spread verification, and plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafkastreams_tp3_is_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k facts, 90% on one hot key; 20-row dimension
    fact = (spark.range(10_000)
            .select(F.when(F.col("id") % 10 < 9, "hot")
                     .otherwise(F.concat(F.lit("k"), (F.col("id") % 20).cast("string")))
                     .alias("k"),
                    F.col("id").alias("val")))
    dim = (spark.range(20)
           .select(F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
                   (F.col("id") * 100).alias("payload"))
           .union(spark.createDataFrame([("hot", -1)], ["k", "payload"])))
    return fact, dim


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in
                  df.select(*sorted(df.columns)).collect())


def test_salted_inner_matches_plain(spark, skewed):
    fact, dim = skewed
    assert _rows(salted_join(fact, dim, ["k"])) == _rows(fact.join(dim, ["k"]))


def test_salted_left_matches_plain(spark, skewed):
    fact, dim = skewed
    # drop the hot key from dim so the left join has unmatched fact rows
    dim_miss = dim.where(F.col("k") != "hot")
    assert (_rows(salted_join(fact, dim_miss, ["k"], how="left"))
            == _rows(fact.join(dim_miss, ["k"], "left")))


def test_hot_key_spreads_over_salts(spark, skewed):
    fact, dim = skewed
    joined = salted_join(fact, dim, ["k"], n_salts=8)
    # re-derive the salt distribution of the hot key: every salt bucket
    # must receive a nontrivial share (deterministic hash over ~9k rows)
    f = fact.withColumn(
        "s", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8)))
    counts = [r["n"] for r in (f.where(F.col("k") == "hot")
                               .groupBy("s").agg(F.count("*").alias("n"))
                               .collect())]
    assert len(counts) == 8 and min(counts) > 500
    assert joined.count() == fact.join(dim, ["k"]).count()


def test_rejects_dim_preserving_joins(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")


def test_q2_approx_within_error_bound(spark):
    """The HLL variant of Q2 must stay within a small relative error of
    the exact distinct-count answer per transport type (rsd=2%, assert a
    conservative 5%)."""
    from kafkastreams_tp3_is_spark.queries import (
        q2_approx_average_passengers_per_transport_type,
        q2_average_passengers_per_transport_type)
    from tests.conftest import SF_DIR

    exact = {r["transport_type"]: r["averagePassengers"]
             for r in q2_average_passengers_per_transport_type(
                 spark, SF_DIR).collect()}
    approx = {r["transport_type"]: r["averagePassengers"]
              for r in q2_approx_average_passengers_per_transport_type(
                  spark, SF_DIR).collect()}
    assert set(exact) == set(approx)
    for t, v in exact.items():
        assert abs(approx[t] - v) / v < 0.05, (t, approx[t], v)


def test_salted_join_rejects_preexisting_salt_column(spark):
    import pytest

    from kafkastreams_tp3_is_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, "a")], ["k", "__salt"])
    dim = spark.createDataFrame([(1, "x")], ["k", "v"])
    with pytest.raises(ValueError, match="__salt"):
        salted_join(fact, dim, ["k"])
    with pytest.raises(ValueError, match="__salt"):
        salted_join(dim, fact, ["k"])


def test_key_skew_profile_detects_planted_hot_key(spark, skewed):
    """The profiler must rank a planted 90%-hot key first with its exact
    count and share, and cum_share must be monotone non-decreasing in
    rank, ending at the top-N coverage (here 100%: only 21 keys, but the
    fixture asks for 25)."""
    from kafkastreams_tp3_is_spark.operators.skew import key_skew_profile_df

    fact, _ = skewed
    rows = (key_skew_profile_df(fact, "k", top_n=25)
            .orderBy("rank").collect())
    assert rows[0]["key"] == "hot"
    assert rows[0]["n_rows"] == 9_000
    assert abs(rows[0]["share"] - 0.9) < 1e-12
    cums = [r["cum_share"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-12          # 21 keys < top_n


def test_key_skew_profile_cut_is_take_ordered(spark, skewed):
    """The global heaviest-N cut must compile to TakeOrderedAndProject
    (per-partition top-N + driver merge), not a full single-partition
    sort of the key space — the window only ever sees top_n rows."""
    from kafkastreams_tp3_is_spark.operators.skew import key_skew_profile_df

    fact, _ = skewed
    plan = (key_skew_profile_df(fact, "k")
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_key_skew_profile_null_key_ranks_nulls_last_on_ties(spark):
    """A NULL key (the classic hot key) must be counted as a group, and
    on COUNT ties must sort after every non-null key — DuckDB/standard
    NULLS LAST, which the oracle comparison depends on."""
    from kafkastreams_tp3_is_spark.operators.skew import key_skew_profile_df

    df = spark.createDataFrame(
        [(None,)] * 5 + [("a",)] * 5 + [("b",)] * 2,
        "k string")
    rows = key_skew_profile_df(df, "k", top_n=10).orderBy("rank").collect()
    assert [(r["key"], r["n_rows"]) for r in rows] == [
        ("a", 5), (None, 5), ("b", 2)]
    assert abs(rows[1]["cum_share"] - 10 / 12) < 1e-12
