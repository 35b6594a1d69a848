"""Skew-mitigation join utilities.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions, but it only works for
sort-merge joins and after a shuffle has already materialized the skew.
Explicit SALTING is the planner-independent tool: spread each hot key
over ``n_salts`` sub-keys on the fact side and replicate the dimension
side once per sub-key, so no single task ever owns a whole hot key.

Cost model: dimension side is duplicated n_salts times (choose n_salts ~
the factor by which the hottest key exceeds a partition's budget), fact
side gets one extra narrow column. Worth it exactly when one key's rows
exceed what one task can hold — the classic null-key / power-law fact
join at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(fact: DataFrame, dim: DataFrame, on: list[str],
                how: str = "inner", n_salts: int = 16) -> DataFrame:
    """Equi-join ``fact`` (skewed side) with ``dim`` (replicated side) on
    ``on``, value-identical to ``fact.join(dim, on, how)``.

    The fact side's salt is a deterministic hash of its whole row (so
    re-runs and retried tasks salt identically — no rng); the dim side
    explodes one copy per salt value. Join key becomes on + [salt], which
    spreads each hot key's rows over n_salts shuffle partitions.

    Only fact-preserving joins are supported: 'inner' and 'left' (each
    fact row meets exactly one copy of its dim row). 'right'/'full' would
    multiply unmatched dim rows by n_salts — use the unsalted join there.

    Limitation: the salt hashes the whole fact ROW, so fully-identical
    duplicate fact rows all land in one salt bucket — a hot key made of
    verbatim duplicates stays unspread. That trade is deliberate: a
    per-row component (monotonically_increasing_id) would spread them but
    is partition-layout-dependent, breaking the determinism that makes
    retried tasks salt identically. De-duplicate or pre-aggregate
    verbatim-duplicate facts before salting instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    for side, cols in (("fact", fact.columns), ("dim", dim.columns)):
        if _SALT in cols:
            raise ValueError(
                f"{side} input already has a {_SALT!r} column — it would "
                "silently collide with the internal salt key")
    fact_cols = [F.col(c) for c in fact.columns]
    f = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(*fact_cols), F.lit(n_salts)).cast("int"))
    # sequence of int literals is already array<int>; a generator cannot be
    # nested inside cast()
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return f.join(d, on + [_SALT], how).drop(_SALT)


def key_skew_profile_df(df: DataFrame, key_col: str,
                        top_n: int = 10) -> DataFrame:
    """Shuffle-planning diagnostics for a join/aggregation key: the
    ``top_n`` heaviest keys with exact row counts, global share, and
    cumulative share — the numbers that decide whether a key needs
    ``salted_join`` / AQE skew splitting (one key holding >1/partitions
    of the rows will straggle its task) BEFORE the expensive job runs.

    Output: (key, n_rows, rank, share, cum_share), rank 1 = heaviest,
    ties broken by key value for determinism.

    Exactness: counts and the cumulative sum are exact bigints; share
    and cum_share are ONE division each of exact integers — bit-stable
    across engines (full hash oracle).

    Scale: one count aggregation (map-side partial combine), then the
    global heaviest-N cut runs as TakeOrderedAndProject — per-partition
    top-N merged on the driver, never a full sort — and the window that
    ranks/accumulates runs AFTER the cut, over top_n rows only, so its
    single-partition exchange moves ``top_n`` rows, not the key space."""
    from pyspark.sql import Window

    # NULL is the classic hot key, so it ranks like any other key — but
    # tie order must be asc_nulls_LAST: Spark's bare ASC sorts nulls
    # first while DuckDB (and the SQL standard default the oracle uses)
    # sorts them last, and the cross-engine gate compares tie order
    order = [F.col("n_rows").desc(), F.col("key").asc_nulls_last()]
    counts = (df.groupBy(F.col(key_col).alias("key"))
                .agg(F.count(F.lit(1)).alias("n_rows")))
    total = counts.agg(F.sum("n_rows").alias("total"))
    top = counts.orderBy(*order).limit(top_n)
    w = (Window.orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = (top.withColumn("rank",
                             F.row_number().over(Window.orderBy(*order)))
                 .withColumn("cum", F.sum("n_rows").over(w)))
    return (ranked.crossJoin(F.broadcast(total))
            .select("key", "n_rows", "rank",
                    (F.col("n_rows").cast("double")
                     / F.col("total").cast("double")).alias("share"),
                    (F.col("cum").cast("double")
                     / F.col("total").cast("double")).alias("cum_share")))


def key_skew_profile(spark, sf_dir: str) -> DataFrame:
    """Driver-gate fixture: heaviest route keys of the trip fact — the
    profile a planner would consult before sizing the route-key joins
    this package runs everywhere (queries.py Q4/Q6, bucketed layout)."""
    from ..views import trips

    return key_skew_profile_df(trips(spark, sf_dir), "route_id")
