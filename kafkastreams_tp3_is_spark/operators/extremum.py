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


def _extreme(df: DataFrame, value_col: str, ascending: bool,
             group_cols: list[str] | None,
             tiebreak_cols: list[str]) -> DataFrame:
    value: Column = F.col(value_col).asc() if ascending else F.col(value_col).desc()
    order = [value] + [F.col(c).asc() for c in tiebreak_cols]
    if not group_cols:
        return df.orderBy(*order).limit(1)
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1)
              .drop("__rn"))


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
