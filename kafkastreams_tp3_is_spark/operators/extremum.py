"""Argmax / argmin operators (SURVEY section 2.3 A7/A8).

The reference implements these as running extrema over a changelog with a
strict comparison (first-seen wins ties, e.g.
streamFunctions/NamePassengerMostTrips.java:34-53). Batch final-state
semantics with a *deterministic* tie-break (smallest key string) is the
correctness target (SURVEY section 7 fidelity notes 2-4): arrival order is
not reproducible, lexicographic order is.

Realization:
  - grouped: row_number() OVER (PARTITION BY group ORDER BY value, tiebreak)
    == 1 — one shuffle on the group key, partial sort per group.
  - global: orderBy(...).limit(1) — compiles to TakeOrderedAndProject, a
    distributed per-partition top-k + driver merge; no single-partition
    window, no full sort. Both operate on *aggregated* rows (one per key),
    never the raw fact table, so they hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _extreme(df: DataFrame, value_col: str, ascending: bool,
             group_cols: list[str] | None,
             tiebreak_cols: list[str]) -> DataFrame:
    value: Column = F.col(value_col).asc() if ascending else F.col(value_col).desc()
    order = [value] + [F.col(c).asc() for c in tiebreak_cols]
    if not group_cols:
        return df.orderBy(*order).limit(1)
    # Grouped path (optimization r15, guide §2.3 "aggregate before you
    # shuffle"): the winning row is the lexicographic MIN of
    # struct(orderkey..., full row), one map-side-combinable aggregate —
    # instead of shuffling EVERY row to its group's partition and
    # sorting it for row_number (which also serializes each group into
    # one task; group domains here are tiny — 5 transport types, hour
    # windows — so the window form is both a shuffle and a skew).
    # ORDER-KEY EQUIVALENCE: ascending uses the value as-is (struct
    # comparison puts a NULL field first, = ASC NULLS FIRST, the window
    # default). Descending inverts an integral value with bitwiseNOT —
    # monotone strictly decreasing, overflow-free under ANSI — but that
    # maps NULL to NULL, which min() would put FIRST where the window's
    # DESC puts NULLS LAST; so the agg path requires a provably
    # non-null value column. Non-integral or nullable descending values
    # keep the window form. The trailing full row makes the comparison
    # key total, so ties beyond the declared tiebreaks resolve
    # deterministically (the window form left them to partition order).
    field = df.schema[value_col]
    use_agg = ascending or (field.dataType.simpleString() in _INTEGRAL
                            and not field.nullable)
    if not use_agg:
        w = Window.partitionBy(*group_cols).orderBy(*order)
        return (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1)
                  .drop("__rn"))
    key = ([F.col(value_col)] if ascending
           else [F.bitwise_not(F.col(value_col))])
    key += [F.col(c) for c in tiebreak_cols]
    packed = F.struct(
        *[k.alias(f"__k{i}") for i, k in enumerate(key)],
        *[F.col(c).alias(f"__p{i}") for i, c in enumerate(df.columns)])
    won = df.groupBy(*group_cols).agg(F.min(packed).alias("__m"))
    return won.select(*[F.col(f"__m.__p{i}").alias(c)
                        for i, c in enumerate(df.columns)])


def argmax(df: DataFrame, value_col: str, *,
           group_cols: list[str] | None = None,
           tiebreak_cols: list[str] = ()) -> DataFrame:
    """Row(s) with the maximum ``value_col`` (per group if given)."""
    return _extreme(df, value_col, False, group_cols, list(tiebreak_cols))


def argmin(df: DataFrame, value_col: str, *,
           group_cols: list[str] | None = None,
           tiebreak_cols: list[str] = ()) -> DataFrame:
    """Row(s) with the minimum ``value_col`` (per group if given)."""
    return _extreme(df, value_col, True, group_cols, list(tiebreak_cols))
