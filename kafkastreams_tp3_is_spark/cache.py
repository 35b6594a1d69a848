"""Persist-lifecycle ownership for operator-internal caches.

Several operators materialize an intermediate frame (LSH signatures,
band buckets, PPJoin prefixes) because multiple downstream consumers
would otherwise recompute it. The persist call lives inside the
operator, but the storage lives until somebody unpersists it — in a
long-lived session a library caller would leak executor storage memory
query after query, and ``spark.catalog.clearCache()`` is a sledgehammer
that also evicts caches the caller owns.

Contract: an operator that persists internals attaches them to its
result frame via ``owned``; callers release them with ``release(df)``
once the result has been consumed (after the terminal action — the
frames must stay persisted while the result is still lazy). Composed
operators transfer ownership with ``owned(out, *persisted(intermediate))``
so the attachment always rides the frame the caller actually holds.
bench.py's per-query clearCache remains correct for its
one-process-per-run usage; ``release`` is the surgical tool for
embedders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_graft_persisted"


def owned(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Attach persisted internal ``frames`` to ``result`` and return it."""
    acc = list(getattr(result, _ATTR, []))
    acc.extend(frames)
    setattr(result, _ATTR, acc)
    return result


def persisted(df: DataFrame) -> list[DataFrame]:
    """The persisted internals attached to ``df`` (empty if none)."""
    return list(getattr(df, _ATTR, []))


def release(df: DataFrame) -> None:
    """Unpersist every internal frame attached to ``df``. Call after the
    result has been fully consumed; the result stays usable but its next
    action recomputes the formerly cached stages."""
    for f in persisted(df):
        f.unpersist()
    setattr(df, _ATTR, [])
