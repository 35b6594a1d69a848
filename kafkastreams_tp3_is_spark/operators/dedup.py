"""Deduplication operators for training-data pipelines, over ``documents``.

Five families, each designed shuffle-minimal for 100 TB inputs:

  exact          hash-groupBy on the full text (one shuffle on md5(text);
                 the 128-bit digest, not the document body, is the shuffle key)
  minhash-lsh    shingle -> minhash signature -> band buckets -> bucket join
                 (candidate pairs only; never all-pairs)
  simhash        64-bit weighted fingerprint; near-dups = small hamming
                 distance within radix buckets
  ngram-jaccard  exact Jaccard on shingle sets for candidate pairs
  embedding      cosine near-dup over the embeddings table (see similarity.py)

Everything below the signature computation is built-in functions; signatures
use xxhash64 (JVM, codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..views import load

# --- exact dedup -------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: md5(text) -> keep lowest doc_id, count copies.

    Scale: the shuffle key is the 16-byte digest; with
    spark.sql.shuffle.partitions sized to the cluster this is one map-side-
    combined hash agg over the scan."""
    docs = load(spark, sf_dir, "documents")
    return (docs.groupBy(F.md5("text").alias("text_md5"))
                .agg(F.min("doc_id").alias("keep_doc_id"),
                     F.count(F.lit(1)).alias("n_copies")))


# --- shingling ---------------------------------------------------------

def _shingles(text_col, k: int = 5) -> F.Column:
    """Character k-gram shingle set (distinct), via sequence+transform —
    JVM-side, no UDF."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(k))))


def shingle_sets(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", _shingles("text", k).alias("shingles"))


# --- MinHash + LSH -----------------------------------------------------

def minhash_signatures(df: DataFrame, num_hashes: int = 32,
                       shingle_col: str = "shingles") -> DataFrame:
    """MinHash signature per row: for hash i, min over shingles of
    xxhash64(shingle, seed=i). All JVM expressions (xxhash64 + array_min +
    transform); signature width fixed -> one narrow projection."""
    sig = F.array(*[
        F.array_min(F.transform(F.col(shingle_col),
                                lambda s, i=i: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ])
    return df.withColumn("minhash", sig)


def minhash_lsh_pairs(df: DataFrame, num_hashes: int = 32, bands: int = 8,
                      id_col: str = "doc_id") -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of r rows,
    bucket-join on (band_idx, band_hash), emit candidate pairs (a < b).

    Scale: the only shuffle is on band-bucket keys; candidate generation is
    a self-equi-join on those keys — never an all-pairs cross join. Huge
    buckets (degenerate shingles) are bounded by AQE skew-join splitting."""
    r = num_hashes // bands
    bands_col = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(*[F.col("minhash")[b * r + j] for j in range(r)]).alias("bucket"))
        for b in range(bands)
    ])
    exploded = (df.select(id_col, "minhash")
                  .withColumn("bb", F.explode(bands_col))
                  .select(id_col, F.col("bb.band").alias("band"),
                          F.col("bb.bucket").alias("bucket")))
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (a.join(b, ["band", "bucket"])
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("a_id"),
                     F.col(f"b.{id_col}").alias("b_id"))
             .distinct())


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str,
                      num_hashes: int = 32, bands: int = 8,
                      jaccard_threshold: float = 0.8) -> DataFrame:
    """End-to-end near-dup detection: LSH candidates verified by exact
    Jaccard on shingle sets; emits (a_id, b_id, jaccard) above threshold."""
    sets_df = shingle_sets(spark, sf_dir)
    sigs = minhash_signatures(sets_df, num_hashes)
    cands = minhash_lsh_pairs(sigs, num_hashes, bands)
    return _verify_jaccard(cands, sets_df, jaccard_threshold)


def _verify_jaccard(pairs: DataFrame, sets_df: DataFrame,
                    threshold: float) -> DataFrame:
    a_sets = sets_df.select(F.col("doc_id").alias("a_id"),
                            F.col("shingles").alias("a_sh"))
    b_sets = sets_df.select(F.col("doc_id").alias("b_id"),
                            F.col("shingles").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
    union = F.size(F.array_union("a_sh", "b_sh")).cast("double")
    return (pairs.join(a_sets, "a_id").join(b_sets, "b_id")
                 .select("a_id", "b_id", (inter / union).alias("jaccard"))
                 .where(F.col("jaccard") >= threshold))


# --- n-gram Jaccard (exact, for candidate verification / small inputs) --

def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str, k: int = 5,
                        threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard over *bucketed* candidates: documents sharing at
    least one rare shingle-bucket are compared. For driver-gate determinism
    this uses the LSH candidate path with exact verification."""
    return dedup_minhash_lsh(spark, sf_dir, jaccard_threshold=threshold)


# --- SimHash -----------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", bits: int = 64) -> DataFrame:
    """SimHash over whitespace tokens: each token's 64-bit hash votes +1/-1
    per bit; the sign of the per-bit vote sum forms the fingerprint. Kept as
    ``sim_bits`` array<int> (0/1) plus a hex rendering — all JVM expressions
    (xxhash64 / bit_get / aggregate), narrow map, no shuffle."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    votes = F.aggregate(
        toks,
        F.array(*[F.lit(0).cast("long") for _ in range(bits)]),
        lambda acc, tok: F.zip_with(
            acc,
            F.transform(F.sequence(F.lit(0), F.lit(bits - 1)),
                        lambda i: F.when(F.bit_get(F.xxhash64(tok), i) == 1,
                                         F.lit(1).cast("long"))
                                   .otherwise(F.lit(-1).cast("long"))),
            lambda a, b: a + b),
    )
    sim_bits = F.transform(votes, lambda v: F.when(v > 0, 1).otherwise(0))
    return (df.withColumn("sim_bits", sim_bits)
              .withColumn("simhash",
                          F.conv(F.concat_ws("", F.col("sim_bits")), 2, 16)))


def dedup_simhash(spark: SparkSession, sf_dir: str,
                  max_hamming: int = 3, bits: int = 64) -> DataFrame:
    """SimHash near-dup pairs: fingerprints bucketed by 16-bit radix chunks
    (a pair within hamming distance 3 of 64 bits shares at least one of the
    4 chunks exactly — pigeonhole); hamming verified on candidates.

    Scale: shuffle on (chunk_idx, chunk_value) buckets only — never
    all-pairs; skewed buckets handled by AQE skew-join."""
    docs = load(spark, sf_dir, "documents")
    fps = simhash(docs, bits=bits).select("doc_id", "sim_bits")
    n_chunks = bits // 16
    chunks = F.array(*[
        F.struct(F.lit(c).alias("chunk"),
                 F.concat_ws("", F.slice(F.col("sim_bits"), c * 16 + 1, 16)).alias("val"))
        for c in range(n_chunks)
    ])
    exploded = fps.withColumn("ch", F.explode(chunks)).select(
        "doc_id", "sim_bits",
        F.col("ch.chunk").alias("chunk"), F.col("ch.val").alias("val"))
    a, b = exploded.alias("a"), exploded.alias("b")
    hamming = F.aggregate(
        F.zip_with(F.col("a.sim_bits"), F.col("b.sim_bits"),
                   lambda x, y: F.abs(x - y).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (a.join(b, ["chunk", "val"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("a_id"),
                     F.col("b.doc_id").alias("b_id"),
                     hamming.alias("hamming"))
             .where(F.col("hamming") <= max_hamming)
             .distinct())
