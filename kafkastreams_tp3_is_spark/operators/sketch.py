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
from ..views import load, spread
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


# --- Bloom-prefiltered benchmark decontamination ------------------------

# The second bit position derives from the shingle hash via XOR/shift
# mixing ONLY: bitwise ops can neither overflow (Spark 4 runs ANSI mode,
# where a 64-bit multiply like the splitmix64 finalizer would ERROR) nor
# diverge between the JVM build side and the numpy probe side, which
# must replay the derivation bit-identically. xxhash64-of-a-long would
# be JVM-only.

def _bloom_positions(h: F.Column, m_bits: int) -> F.Column:
    """The two bit positions a shingle hash sets/tests."""
    mixed = (h.bitwiseXOR(F.shiftrightunsigned(h, 33))
              .bitwiseXOR(F.shiftleft(h, 21)))
    return F.array(F.pmod(h, F.lit(m_bits)),
                   F.pmod(mixed, F.lit(m_bits)))


def packed_bitset(positions: DataFrame, m_bits: int):
    """Distributed bit-block packing: aggregate a frame of bit positions
    ``p`` (0 <= p < m_bits) into 64-bit blocks EXECUTOR-side —
    ``groupBy(p div 64) + bit_or(shiftleft(1, p % 64))`` — and collect
    only the ceil(m_bits/64) packed longs (~16 MB at the 2^27 sizing the
    docstring below recommends, vs a 134M-row per-position collect).
    Returns a numpy uint64 array; bit p of the set is
    ``(arr[p >> 6] >> (p & 63)) & 1``. Real bits, 1/8 the bytes of a
    bool array — at 2^27 the probe-side payload is ~16 MB, small enough
    for an ``sc.broadcast`` torrent instead of per-task closure
    serialization."""
    import numpy as np

    rows = (positions
            .groupBy(F.expr("p div 64").alias("blk"))
            .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                        "CAST(p % 64 AS INT)))").alias("bits"))
            .collect())
    arr = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    if rows:
        blks = np.array([r["blk"] for r in rows], dtype=np.int64)
        vals = np.array([r["bits"] for r in rows], dtype=np.int64)
        arr[blks] = vals.view(np.uint64)
    return arr


def bloom_decontaminate_df(train: DataFrame, benchmark: DataFrame,
                           k: int = 5, min_overlap: int = 10,
                           m_bits: int = 1 << 20) -> DataFrame:
    """Decontamination with a Bloom prefilter — the 100 TB shape of
    curation.decontaminate_df when the benchmark's shingle table is too
    large to broadcast but a BITSET over it is not: a benchmark of 100M
    distinct shingles needs ~800 MB as longs yet ~16 MB as a 2^27-bit
    Bloom filter, and the filter prunes the expensive join down to
    candidate documents only.

    Three phases, final verdicts EXACT (full hash-match oracle — the
    sketch only decides which documents get the exact recount):

      build  the benchmark's distinct shingle hashes (8-byte longs, the
             curation discipline) each set 2 bit positions: pmod(h, m)
             and an XOR/shift-derived second. The positions pack into
             64-bit blocks EXECUTOR-side (``packed_bitset``); the driver
             collects ceil(m_bits/64) longs and broadcasts the ~m/8-byte
             bitset to the probe tasks. SIZE m
             to ~10x the benchmark's distinct-shingle count (default
             2^20 covers ~10^5 shingles at ~18% fill with 2 probes);
             an undersized filter saturates and the prefilter
             degenerates to the plain exact join — verdicts stay
             correct, pruning stops.
      probe  an Arrow-batched numpy kernel upper-bounds each training
             doc's shared-shingle count by testing both bits per shingle
             hash. Bloom filters have NO false negatives, so
             upper_bound >= true n_shared always; docs with
             upper_bound < min_overlap are provably clean and skip
             phase 3 (pytest pins the superset invariant).
      exact  candidates (upper_bound >= min_overlap) alone re-join the
             real benchmark shingles for exact counts; verdicts merge
             back over all training docs.

    Output: (doc_id, contaminated) for every training doc — identical
    verdicts to decontaminate_df (pytest + shared-restatement oracle),
    at a join cost proportional to the contaminated tail instead of the
    whole corpus."""
    from collections.abc import Iterator as _Iter

    from .curation import _hashed_kgram_set

    # ONE distinct benchmark shingle-hash frame serves both phases: the
    # bit positions here AND the exact recount join below (re-shingling
    # the benchmark for phase 3 would be a second full benchmark scan)
    bench_sh = (benchmark
                .select(F.explode(_hashed_kgram_set(k)).alias("s"))
                .distinct()
                .persist())
    # no distinct before the bit-pack (r15): bit_or is idempotent, so
    # packed_bitset's block aggregate absorbs duplicate positions in its
    # map-side combine — the distinct only added a full shuffle of the
    # 2x|bench shingles| position rows
    bench_pos = (bench_sh
                 .select(F.explode(_bloom_positions(F.col("s"), m_bits))
                         .alias("p")))
    bc_bits = train.sparkSession.sparkContext.broadcast(
        packed_bitset(bench_pos, m_bits))

    def probe(batches: _Iter) -> _Iter:
        # Same bit test + XOR/shift mixing as dedup.
        # bloom_decontaminate_spans_df's prefilter kernel. The copies
        # cannot share a module helper (closures must stay
        # self-contained for executor shipping — see the comment
        # there); drift is caught by an EXECUTABLE guard instead:
        # tests/test_property.py::
        # test_bloom_bit_math_jvm_vs_numpy_bit_identical pins this math
        # to the JVM build side bit-for-bit, and the verdict-equality
        # tests pin each kernel to the same bitset end-to-end
        import numpy as _np
        import pandas as _pd

        w = bc_bits.value

        def isset(pos):
            # pos: nonnegative int64 positions < m_bits
            return ((w[pos >> 6]
                     >> (pos & _np.int64(63)).astype(_np.uint64))
                    & _np.uint64(1)).astype(bool)

        with _np.errstate(over="ignore"):
            for pdf in batches:
                ubs = []
                for hs in pdf["hs"]:
                    h = _np.asarray(hs, dtype=_np.int64)
                    if h.size == 0:
                        ubs.append(0)
                        continue
                    p1 = _np.mod(h, m_bits)
                    hu = h.view(_np.uint64)
                    # unsigned >>33 / wrapping <<21, matching the JVM's
                    # shiftrightunsigned / shiftleft bit-for-bit
                    mixed = (h
                             ^ (hu >> _np.uint64(33)).view(_np.int64)
                             ^ (hu << _np.uint64(21)).view(_np.int64))
                    p2 = _np.mod(mixed, m_bits)
                    ubs.append(int(_np.count_nonzero(
                        isset(p1) & isset(p2))))
                yield _pd.DataFrame({"doc_id": pdf["doc_id"], "ub": ubs})

    # parallelism floor (r15): the shingle transform + numpy probe are
    # row-local CPU off a possibly single-file scan
    train = spread(train)
    train_sh = train.select("doc_id", _hashed_kgram_set(k).alias("hs"))
    ub_schema = T.StructType([T.StructField("doc_id", T.LongType()),
                              T.StructField("ub", T.LongType())])
    ub = train_sh.mapInPandas(probe, schema=ub_schema)
    candidates = ub.where(F.col("ub") >= min_overlap).select("doc_id")
    cand_train = train.join(candidates, "doc_id", "left_semi")
    # exact recount against the SAME persisted benchmark hashes, with
    # the curation module's measured-broadcast discipline (count what is
    # shipped; shuffle join above the bound)
    build = (F.broadcast(bench_sh)
             if bench_sh.count() <= 2_000_000 else bench_sh)
    exact = (cand_train
             .select("doc_id", F.explode(_hashed_kgram_set(k)).alias("s"))
             .join(build, "s")
             .groupBy("doc_id")
             .agg(F.count(F.lit(1)).alias("n_shared")))
    verdict = (train.select("doc_id")
               .join(exact, "doc_id", "left")
               .select("doc_id",
                       (F.coalesce(F.col("n_shared"),
                                   F.lit(0).cast("bigint"))
                        >= min_overlap).alias("contaminated")))
    return owned(verdict, bench_sh)


def bloom_decontaminate(spark: SparkSession, sf_dir: str, k: int = 5,
                        min_overlap: int = 190) -> DataFrame:
    """Driver-gate fixture: the decontaminate split (every 50th doc is
    the benchmark) through the Bloom-prefiltered path. min_overlap=190
    is the discriminative threshold (curation n_shared spans ~20-250 on
    this corpus), so both verdict branches appear in the gate output."""
    docs = load(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 50 == 0
    return bloom_decontaminate_df(docs.where(~is_bench),
                                  docs.where(is_bench), k, min_overlap)
