"""Edit-distance similarity join over the ``documents`` table — the
approximate STRING-join family (entity resolution, typo-duplicate
detection) the LSH/minhash set-similarity operators don't cover:
find document pairs within Levenshtein distance ``max_dist``.

Algorithm: PassJoin (Li/Deng/Jiang/Feng, ICDE'12 "PASS-JOIN: A
Partition-based Method for Similarity Joins" — public work). Pigeonhole
over edits: partition every string into ``d+1`` contiguous segments;
a string within edit distance ``d`` of it must contain at least one of
those segments EXACTLY, starting within ``±d`` of its source position.
Candidates therefore come from an EQUI-JOIN on (source length, segment
index, segment hash) between each document's d+1 segments and every
document's enumerated probe substrings — never an all-pairs loop — and
only candidates pay the exact Levenshtein verify.

Scale: the segment side emits d+1 rows per doc, the probe side
(2d+1)·(d+1)·(2d+1) rows per doc (75 at d=2) — both linear in corpus
size, 8-byte md5-prefix join keys (a hash collision only adds a
candidate; the verify rejects it identically in both engines). Hot
segments cannot form cliques the way hot LSH buckets can: a segment is
~len/(d+1) consecutive characters at an exact source length, so
sharing one is already near-duplicate evidence; the ``min_len`` floor
keeps segments long enough to stay discriminative (short strings are
better served by brute force within length groups). At 100 TB both
sides hash-partition on the join key; AQE handles residual skew. For
very large ``d`` use threshold-bounded verify
(``levenshtein(a, b, threshold)``, O(d·n) early-exit) — the gate uses
the plain spelling because DuckDB has no threshold argument.

Gate: exact integers end to end (deterministic candidate set, integer
distance) -> full-hash DuckDB oracle restating the same partition
arithmetic (FLOOR-based: DuckDB CAST(double AS INT) rounds where Spark
truncates, so both engines floor explicitly on integer-exact doubles).
Spark's ``levenshtein`` counts CHARACTER edits while DuckDB 1.0.0's
counts BYTE edits — identical on the all-ASCII test corpora the gate
runs on; the operator itself is character-correct on unicode (both
pinned in tests/test_fuzzy.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..views import load


def _md5_prefix(col: F.Column) -> F.Column:
    """The repo's cross-engine 60-bit string hash spelling."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def edit_distance_pairs_df(docs: DataFrame, max_dist: int = 2,
                           min_len: int = 24) -> DataFrame:
    """(doc_a < doc_b, dist) for every pair of documents with
    ``levenshtein(text_a, text_b) <= max_dist``, via PassJoin candidate
    generation. Documents shorter than ``min_len`` chars are excluded
    (contract: short strings belong in a per-length-group brute force;
    the floor keeps segments discriminative)."""
    d = int(max_dist)
    k = d + 1
    txt = F.coalesce(F.col("text"), F.lit(""))
    base = (docs.select("doc_id", txt.alias("t"))
            .where(F.length("t") >= int(min_len))
            .select("doc_id", "t", F.length("t").alias("n")))

    def seg_arith(src_n: F.Column, j: F.Column):
        """1-based start and length of segment ``j`` of a string of
        length ``src_n`` split into k even segments (first k - n%k take
        floor(n/k) chars, the rest one more). FLOOR keeps the integer
        arithmetic identical across engines."""
        b = F.floor(src_n / k).cast("int")
        rem = (src_n % k).cast("int")
        extra = F.greatest(F.lit(0), j - (F.lit(k) - rem))
        start = (j * b + extra + 1).cast("int")
        length = F.when(j >= F.lit(k) - rem, b + 1).otherwise(b).cast("int")
        return start, length

    # segment side: the d+1 segments of every doc, keyed (src_n, j, h)
    j_arr = F.array(*[F.lit(j) for j in range(k)])
    segs = (base.select(F.col("doc_id").alias("a_id"), "t",
                        F.col("n").alias("src_n"),
                        F.explode(j_arr).alias("j")))
    s_start, s_len = seg_arith(F.col("src_n"), F.col("j"))
    a_side = (segs.select("a_id", "src_n", "j",
                          s_start.alias("pos"), s_len.alias("len"), "t")
              .select("a_id", "src_n", "j",
                      _md5_prefix(F.expr("substring(t, pos, len)"))
                      .alias("h")))

    # probe side: for every candidate source length src_n in [m-d, m+d]
    # and segment j of THAT length, substrings starting within +-d of
    # the segment's source position. (dn, j, ds) is a 75-element
    # literal cross product — one explode, then scalar arithmetic.
    combos = F.array(*[
        F.struct(F.lit(dn).alias("dn"), F.lit(j).alias("j"),
                 F.lit(ds).alias("ds"))
        for dn in range(-d, d + 1)
        for j in range(k)
        for ds in range(-d, d + 1)])
    probes = (base.select(F.col("doc_id").alias("b_id"), "t",
                          F.col("n").alias("m"),
                          F.explode(combos).alias("c"))
              .select("b_id", "t", "m",
                      (F.col("m") + F.col("c.dn")).alias("src_n"),
                      F.col("c.j").alias("j"), F.col("c.ds").alias("ds")))
    p_start, p_len = seg_arith(F.col("src_n"), F.col("j"))
    b_side = (probes
              .where(F.col("src_n") >= int(min_len))
              .select("b_id", "src_n", "j",
                      (p_start + F.col("ds")).cast("int").alias("pos"),
                      p_len.alias("len"), "t", "m")
              .where((F.col("pos") >= 1)
                     & (F.col("pos") + F.col("len") - 1 <= F.col("m")))
              .select("b_id", "src_n", "j",
                      _md5_prefix(F.expr("substring(t, pos, len)"))
                      .alias("h")))

    cands = (a_side.join(b_side, ["src_n", "j", "h"])
             .where(F.col("a_id") != F.col("b_id"))
             .select(F.least("a_id", "b_id").alias("doc_a"),
                     F.greatest("a_id", "b_id").alias("doc_b"))
             .distinct())

    ta = base.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    tb = base.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    return (cands.join(ta, "doc_a").join(tb, "doc_b")
            .select("doc_a", "doc_b",
                    F.levenshtein("ta", "tb").cast("int").alias("dist"))
            .where(F.col("dist") <= d))


def fuzzy_edit_pairs(spark: SparkSession, sf_dir: str,
                     max_dist: int = 2) -> DataFrame:
    """Driver-gate fixture (full hash): edit-distance pairs over the
    documents table plus planted typo twins — every 25th document (long
    enough) gets a copy with one character deleted (position 40) and
    one substituted (position 80 -> '~'), landing at distance <= 2;
    recovery of every planted pair is the PassJoin completeness
    guarantee, asserted in pytest alongside brute-force equivalence."""
    docs = load(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    edited = F.concat(
        F.substring(t, 1, 39), F.substring(t, 41, 39), F.lit("~"),
        F.expr("substring(coalesce(text, ''), 81, 2147483647)"))
    planted = (docs.where((F.col("doc_id") % 25 == 0)
                          & (F.length(t) >= 81))
               .select((F.col("doc_id") + F.lit(8_000_000_000))
                       .alias("doc_id"), edited.alias("text")))
    both = docs.select("doc_id", "text").unionByName(planted)
    return edit_distance_pairs_df(both, max_dist=max_dist)


def fuzzy_dup_clusters(spark: SparkSession, sf_dir: str,
                       max_dist: int = 2) -> DataFrame:
    """Typo-duplicate clusters — the dedup composition over the
    edit-distance join: PassJoin pairs (same planted fixture as
    ``fuzzy_edit_pairs``) chained into Large-Star/Small-Star connected
    components, cluster_id = min doc_id, canonical = the record a
    dedup pass keeps. Mirrors ``duplicate_clusters_lsh``'s
    edges -> CC -> canonical shape with edit-distance edges: every
    stage sub-quadratic (segment equi-join candidates, log-round CC).
    Full-hash gate: the oracle nests the fuzzy-pair SQL inside the
    recursive-closure spelling the other cluster oracles use."""
    from .graph import _clusters

    pairs = (fuzzy_edit_pairs(spark, sf_dir, max_dist)
             .select(F.col("doc_a").alias("a_id"),
                     F.col("doc_b").alias("b_id")))
    return _clusters(pairs)
