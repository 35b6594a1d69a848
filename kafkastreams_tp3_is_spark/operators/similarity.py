"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

Two paths:
  - brute-force cosine top-k: the exact baseline. Query set broadcast to
    every partition of the corpus; per-partition top-k then global top-k
    (TakeOrdered semantics via window row_number over query_id).
  - LSH-bucketed ANN (random hyperplane signs): the scale path. Corpus and
    queries hash to sign-bit buckets; only same-bucket pairs are scored.

Dot products use F.zip_with + F.aggregate on double-cast arrays — sequential
left-to-right fold, bit-reproducible against the DuckDB list oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..views import load


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def _as_double(col: str) -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str,
                           n_queries: int = 5, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors
    (lowest vec_ids), excluding self. Output: query_id, neighbor_id, rank.

    Scale: queries are a tiny broadcast side; the corpus scan is
    embarrassingly parallel; ranking shuffles only n_queries * |corpus|
    scored rows, and the per-query top-k is a bounded window."""
    emb = load(spark, sf_dir, "embeddings")
    queries = (emb.orderBy("vec_id").limit(n_queries)
                  .select(F.col("vec_id").alias("query_id"),
                          _as_double("embedding").alias("q_vec")))
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"),
                        _as_double("embedding").alias("c_vec"))
    scored = (corpus.crossJoin(F.broadcast(queries))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      (_dot(F.col("q_vec"), F.col("c_vec"))
                       / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))))
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank"))


def random_hyperplane_buckets(df: DataFrame, vec_col: str = "embedding",
                              n_planes: int = 8, seed: int = 42,
                              dim: int | None = None) -> DataFrame:
    """Sign-bit LSH bucket per vector: for plane p, pseudo-random +-1
    weights derived from xxhash64(p, dim_index, seed) — fully deterministic,
    no stored model. Bucket = integer of sign bits."""
    vec = _as_double(vec_col)
    d = dim if dim is not None else None
    # weight(p, i) in {-1, +1} via hash parity — computed inline, JVM-side
    def plane_sign(p: int) -> F.Column:
        prods = F.zip_with(
            vec,
            F.transform(F.sequence(F.lit(0), F.size(vec) - 1),
                        lambda i: F.when(
                            F.xxhash64(F.lit(p), i, F.lit(seed)).bitwiseAND(F.lit(1)) == 1,
                            F.lit(1.0)).otherwise(F.lit(-1.0))),
            lambda x, w: x * w)
        s = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(s >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))

    bucket = plane_sign(0)
    for p in range(1, n_planes):
        bucket = bucket.bitwiseOR(plane_sign(p))
    return df.withColumn("bucket", bucket)


def cosine_topk_lsh(spark: SparkSession, sf_dir: str,
                    n_queries: int = 5, k: int = 10,
                    n_planes: int = 8) -> DataFrame:
    """ANN top-k: score only corpus vectors in the query's hyperplane
    bucket. At 100 TB this turns the all-pairs scan into a bucket-equi-join
    (shuffle on bucket id); recall is tunable via n_planes / multi-probe."""
    emb = load(spark, sf_dir, "embeddings")
    bucketed = random_hyperplane_buckets(emb, n_planes=n_planes)
    queries = (bucketed.orderBy("vec_id").limit(n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       _as_double("embedding").alias("q_vec"),
                       F.col("bucket").alias("q_bucket")))
    corpus = bucketed.select(F.col("vec_id").alias("neighbor_id"),
                             _as_double("embedding").alias("c_vec"),
                             F.col("bucket").alias("c_bucket"))
    scored = (corpus.join(F.broadcast(queries),
                          F.col("c_bucket") == F.col("q_bucket"))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      (_dot(F.col("q_vec"), F.col("c_vec"))
                       / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))))
                      .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "rank"))


def embedding_near_dup(spark: SparkSession, sf_dir: str,
                       threshold: float = 0.95, n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join:
    (a_id, b_id) with cosine >= threshold, a < b."""
    emb = load(spark, sf_dir, "embeddings")
    bucketed = (random_hyperplane_buckets(emb, n_planes=n_planes)
                .select("vec_id", _as_double("embedding").alias("vec"), "bucket"))
    a = bucketed.select(F.col("vec_id").alias("a_id"), F.col("vec").alias("a_vec"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("b_id"), F.col("vec").alias("b_vec"), "bucket")
    cos = (_dot(F.col("a_vec"), F.col("b_vec"))
           / (_norm(F.col("a_vec")) * _norm(F.col("b_vec"))))
    return (a.join(b, "bucket")
             .where(F.col("a_id") < F.col("b_id"))
             .select("a_id", "b_id", cos.alias("cosine"))
             .where(F.col("cosine") >= threshold)
             .distinct())
