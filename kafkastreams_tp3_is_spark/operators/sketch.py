"""Heavy hitters over the corpus token stream with bounded memory:
per-partition Misra-Gries summaries generate a small candidate superset,
then one exact recount pass over candidates only produces EXACT counts —
the standard two-pass scheme that turns an approximate sketch into an
exact answer without ever hash-aggregating the full vocabulary.

Why not just groupBy(token)? At bench scale that is fine (and is exactly
what the DuckDB oracle does); at 100 TB the full-vocabulary aggregation
shuffles one row per distinct token per partition — for web text that is
billions of keys of long-tail garbage that heavy-hitter analysis then
throws away. The sketch pass keeps per-partition state at
O(capacity) = O(support_inv), ships only candidate tokens (bounded by
partitions x capacity), and the recount join touches candidate rows
only. Exactness of the final output is unconditional; the sketch only
controls WHICH tokens get recounted, and its guarantee (below) ensures
every true heavy hitter is a candidate.

Guarantee (Misra-Gries / mergeable-summaries, public: Misra & Gries '82;
Agarwal et al., PODS'12): a summary of capacity c over n tokens
undercounts any token by at most n/c. With c = safety * support_inv, a
token with global share >= 1/support_inv has, in at least one partition,
local share >= 1/support_inv > (1/c) * safety >= undercount share — so it
survives that partition's summary. The pytest pins candidate-superset
behavior on adversarially skewed data.

Thresholding is pure integer arithmetic (count * support_inv >= total),
so the gate is exact — no float boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cache import owned
from ..views import load
from .retrieval import lower_tokens_col

_CAND_SCHEMA = T.StructType([T.StructField("token", T.StringType())])


def _mg_partition_candidates(capacity: int):
    """mapInPandas kernel: one Misra-Gries summary per partition.
    Per Arrow batch the token counts are folded in vectorized
    (value_counts), then the summary is compressed back to ``capacity``
    by the mergeable-summaries rule: subtract the (capacity+1)-th largest
    weight from every entry, drop the non-positive. State never exceeds
    capacity + batch-distinct entries."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            for tok, c in pdf["token"].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
            if len(counts) > capacity:
                dec = sorted(counts.values(), reverse=True)[capacity]
                counts = {t: c - dec for t, c in counts.items() if c > dec}
        yield pd.DataFrame({"token": list(counts.keys())})

    return kernel


def heavy_hitters_df(docs: DataFrame, support_inv: int = 32,
                     safety: int = 4,
                     broadcast_max_candidates: int = 2_000_000) -> DataFrame:
    """Tokens with global frequency >= total/``support_inv``, with exact
    counts and share. Output: (token, n_occurrences, share).

    share is the single division n_occurrences/total of exact integers;
    the keep predicate is integer-only (n * support_inv >= total)."""
    occurrences = docs.select(
        F.explode(lower_tokens_col()).alias("token"))
    # persisted: the size-guard count and the recount join would each
    # re-run the whole MG sketch pass otherwise (caller releases via
    # cache.release; bench/one-shot callers use clearCache)
    candidates = (occurrences
                  .mapInPandas(_mg_partition_candidates(safety * support_inv),
                               schema=_CAND_SCHEMA)
                  .distinct()
                  .persist())
    # candidate cardinality is bounded by shuffle-partitions x capacity,
    # but measure before broadcasting (same contract as decontaminate)
    build = (F.broadcast(candidates)
             if candidates.count() <= broadcast_max_candidates
             else candidates)
    total = occurrences.agg(F.count(F.lit(1)).alias("total"))
    exact = (occurrences.join(build, "token")
             .groupBy("token")
             .agg(F.count(F.lit(1)).alias("n_occurrences")))
    out = (exact.crossJoin(F.broadcast(total))
           .where(F.col("n_occurrences") * support_inv >= F.col("total"))
           .select("token", "n_occurrences",
                   (F.col("n_occurrences").cast("double")
                    / F.col("total").cast("double")).alias("share")))
    return owned(out, candidates)


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate fixture: tokens holding >= 1/32 of all token
    occurrences (the synthetic corpus has a ~30-word vocabulary, so the
    threshold splits it: both the kept and dropped branches run)."""
    return heavy_hitters_df(load(spark, sf_dir, "documents"),
                            support_inv=32)
