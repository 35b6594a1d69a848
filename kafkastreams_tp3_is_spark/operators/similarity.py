"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

Paths:
  - brute-force cosine top-k: the exact baseline. Query set broadcast to
    every partition of the corpus; per-partition top-k then global top-k.
  - exact cosine near-dup pairs: all-pairs verification baseline,
    SQL-expressible -> hash-checked against DuckDB.
  - banded sign-LSH (random hyperplanes): the scale path for both top-k and
    near-dup. n_planes sign bits per vector, split into bands of
    ``band_bits`` bits; candidates = pairs sharing one band key exactly.
    With 16-bit bands the key space is 65,536 per band, so within-bucket
    population SHRINKS as corpora grow more diverse (vs the old 8-plane /
    256-bucket scheme whose buckets grew quadratically). Recall is tuned by
    the band count b and width r: P(candidate) = 1 - (1 - p^r)^b with
    p = 1 - theta/pi.

Sign bits come from ONE Arrow-batched numpy matmul per batch (a
self-contained pandas UDF — no package import on executors); scoring dot
products use F.zip_with + F.aggregate on double-cast arrays — sequential
left-to-right fold, bit-reproducible against the DuckDB list oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cache import owned, persisted
from ..views import load


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def _as_double(col: str) -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _cosine(a: F.Column, b: F.Column) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


# --- exact paths -------------------------------------------------------

def _bruteforce_ranked(emb: DataFrame, n_queries: int) -> DataFrame:
    """Exact cosine of the first ``n_queries`` vectors (lowest vec_ids)
    against the whole corpus (self excluded), densely ranked per query
    by (cosine desc, neighbor_id asc): (query_id, neighbor_id, cosine,
    rank). Shared by the top-k baseline and the contrastive-triplet
    miner. Queries are a tiny broadcast side; the corpus scan is
    embarrassingly parallel; ranking shuffles n_queries * |corpus|
    scored rows."""
    queries = (emb.orderBy("vec_id").limit(n_queries)
                  .select(F.col("vec_id").alias("query_id"),
                          _as_double("embedding").alias("q_vec")))
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"),
                        _as_double("embedding").alias("c_vec"))
    scored = (corpus.crossJoin(F.broadcast(queries))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      _cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w))


def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str,
                           n_queries: int = 5, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors
    (lowest vec_ids), excluding self. Output: query_id, neighbor_id, rank.

    Scale: see _bruteforce_ranked; the per-query top-k cut is a bounded
    window."""
    emb = load(spark, sf_dir, "embeddings")
    return (_bruteforce_ranked(emb, n_queries)
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def mmr_rerank_df(emb: DataFrame, n_queries: int = 5, k: int = 10,
                  shortlist: int = 40, lam: float = 0.7) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98) — the diversity pass of a retrieval stack: per query,
    greedily pick ``k`` results maximizing
    ``lam * cos(q, d) - (1 - lam) * max cos(d, already_selected)``,
    so near-duplicate hits cannot crowd the result list the way they do
    in a plain top-k over an undeduplicated corpus. Output: (query_id,
    neighbor_id, relevance, mmr_rank 1..k).

    Shape for scale: relevance ranking is the existing broadcast-scored
    exact pass (ANN shortlists at corpus scale) CUT to ``shortlist``
    rows per query FIRST; only those bounded groups reach the Python
    side, where one ``applyInPandas`` kernel per query runs the
    O(shortlist^2) greedy in numpy. Driver never sees rows; group size
    is shortlist-bounded by construction, so per-key state is O(1) in
    corpus size. Ties break (score desc, neighbor_id asc) making the
    output deterministic.

    FULL-HASH gate since r12: the pairwise sims accumulate in dimension
    order (one vectorized add per dimension, not a BLAS matmul whose
    pairwise/FMA summation reorders), and the norm is sqrt(self-dot) in
    the same order (np.linalg.norm is dnrm2's SCALED form, a different
    bit pattern) — exactly the arithmetic DuckDB's list_dot_product /
    sqrt restate, so the oracle (ORACLES['mmr_rerank'], k unrolled
    greedy stages) re-derives bit-identical scores. The relevance column
    was already the JVM-fold cosine the ann_cosine_topk gate pins. A
    pytest additionally runs an independent numpy reference greedy plus
    the first-pick==rank-1 invariant."""
    short = (_bruteforce_ranked(emb, n_queries)
             .where(F.col("rank") <= shortlist))
    cand = short.join(
        emb.select(F.col("vec_id").alias("neighbor_id"),
                   _as_double("embedding").alias("n_vec")),
        "neighbor_id")

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("rank").reset_index(drop=True)
        v = np.asarray([np.asarray(e, dtype=np.float64)
                        for e in pdf["n_vec"]])
        # dimension-ordered accumulation == the sequential fold DuckDB's
        # list_dot_product computes (bit-identical; BLAS matmul is not)
        dots = np.zeros((len(v), len(v)))
        for t in range(v.shape[1]):
            dots += np.outer(v[:, t], v[:, t])
        norms = np.maximum(np.sqrt(np.diagonal(dots)), 1e-30)
        sims = dots / np.outer(norms, norms)
        rel = pdf["cosine"].to_numpy(dtype=np.float64)
        ids = pdf["neighbor_id"].to_numpy()
        selected: list[int] = []
        remaining = list(range(len(pdf)))
        while remaining and len(selected) < k:
            if selected:
                penal = sims[np.ix_(remaining, selected)].max(axis=1)
                scores = lam * rel[remaining] - (1.0 - lam) * penal
            else:
                scores = lam * rel[remaining]
            # argmax with (score desc, neighbor_id asc) tie-break
            best = min(range(len(remaining)),
                       key=lambda t: (-scores[t], ids[remaining[t]]))
            selected.append(remaining.pop(best))
        return pd.DataFrame({
            "query_id": pdf["query_id"].iloc[0],
            "neighbor_id": ids[selected],
            "relevance": rel[selected],
            "mmr_rank": np.arange(1, len(selected) + 1, dtype=np.int32)})

    return cand.groupBy("query_id").applyInPandas(
        kernel, schema="query_id bigint, neighbor_id bigint, "
                       "relevance double, mmr_rank int")


def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate fixture (FULL HASH since r12; ORACLES['mmr_rerank']
    unrolls the 10 greedy stages over the same bit-stable arithmetic —
    see mmr_rerank_df): MMR-diversified top-10 over the embeddings
    table, defaults pinned by the oracle's literals.

    Gate-stability note (ADVICE r12): the hash gate leans on DuckDB's
    list_dot_product being a sequential non-FMA in-dimension-order fold
    and numpy's elementwise += matching it bit-for-bit — implementation
    details an engine/BLAS version bump could flip in the last ulp. The
    PRIMARY exactness pin is the pure-numpy reference in
    tests/test_retrieval.py (same machine, same float semantics); if a
    future DuckDB/numpy upgrade ever flips low bits, demote this gate to
    rows-only (drop the oracle entry) and keep the pytest as the proof,
    per the similar float-state precedent of the trained-IVF entries."""
    return mmr_rerank_df(load(spark, sf_dir, "embeddings"))


def contrastive_triplets_df(emb: DataFrame, n_queries: int = 5,
                            k: int = 10, n_neg: int = 3) -> DataFrame:
    """Hard-negative triplet mining for contrastive training
    (query, positive, negative): per query the positive is the exact
    rank-1 cosine neighbor and the negatives are the ``n_neg`` vectors
    ranked JUST OUTSIDE the top ``k`` (ranks k+1..k+n_neg) — the
    standard 'hard negative' band: similar enough to be informative,
    dissimilar enough to be true negatives (in-batch-random negatives
    are too easy; rank-2..k would be false negatives in a near-dup
    corpus). Output: (query_id, pos_id, pos_cosine, neg_id, neg_cosine,
    neg_rank 1..n_neg) — one row per (query, negative), positive
    repeated.

    Everything is deterministic and the cosine fold is bit-identical to
    DuckDB's list_dot_product (module docstring), so the gate is a full
    hash oracle. Scale: one broadcast-scored pass + one bounded window —
    the same shape as the top-k baseline; at corpus scale the ranked
    frame would come from the ANN paths instead (the miner only needs
    ranks 1 and k+1..k+n_neg)."""
    ranked = _bruteforce_ranked(emb, n_queries)
    pos = (ranked.where(F.col("rank") == 1)
           .select("query_id", F.col("neighbor_id").alias("pos_id"),
                   F.col("cosine").alias("pos_cosine")))
    neg = (ranked.where((F.col("rank") > k) & (F.col("rank") <= k + n_neg))
           .select("query_id", F.col("neighbor_id").alias("neg_id"),
                   F.col("cosine").alias("neg_cosine"),
                   (F.col("rank") - F.lit(k)).cast("int").alias("neg_rank")))
    return pos.join(neg, "query_id")


def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate fixture: hard-negative triplets over the embeddings
    table (full hash oracle)."""
    return contrastive_triplets_df(load(spark, sf_dir, "embeddings"))


def embedding_near_dup_exact_df(emb: DataFrame, threshold: float = 0.4,
                                n_blocks: int = 16) -> DataFrame:
    """Exact cosine near-dup pairs (a_id < b_id, cosine >= threshold) by
    all-pairs comparison — the verification baseline, hash-checked against
    the DuckDB list_dot_product oracle. Still O(N^2) by definition (use
    the IVF/LSH paths at scale), but executed block-wise:

      stage 1  vectors hash into n_blocks groups; every unordered block
               pair (one row each after collect_list) runs ONE numpy
               matmul in mapInPandas, emitting candidate ids with 1e-9
               slack under the threshold — ~100x less work per pair than
               a per-row array fold, and no N^2 wide join rows.
      stage 2  survivors (a tiny set) are re-scored with the sequential
               zip_with/aggregate fold, whose IEEE-754 operation order
               matches DuckDB's list_dot_product — emitted cosines stay
               bit-identical to the oracle. The 1e-9 slack is ~1e5 x the
               worst float64 matmul-vs-fold divergence for 64-dim unit
               vectors, so stage 1 cannot drop a pair stage 2 accepts."""
    bid = F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    blocks = (emb.select("vec_id", "embedding", bid.alias("bid"))
                 .groupBy("bid")
                 .agg(F.collect_list(F.struct("vec_id", "embedding"))
                       .alias("rows")))
    bp = (blocks.select(F.col("bid").alias("abid"), F.col("rows").alias("a_rows"))
          .join(blocks.select(F.col("bid").alias("bbid"),
                              F.col("rows").alias("b_rows")),
                F.col("abid") <= F.col("bbid")))
    slack = threshold - 1e-9

    def block_pairs(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            out_a, out_b = [], []
            for a_rows, b_rows, same in zip(
                    pdf["a_rows"], pdf["b_rows"],
                    pdf["abid"] == pdf["bbid"]):
                aids = np.array([r["vec_id"] for r in a_rows])
                A = np.stack([r["embedding"] for r in a_rows]).astype(np.float64)
                A /= np.linalg.norm(A, axis=1, keepdims=True)
                if same:
                    # symmetric matrix: keep one orientation of each pair
                    ii, jj = np.nonzero(A @ A.T >= slack)
                    keep = aids[ii] < aids[jj]
                    out_a.append(aids[ii][keep])
                    out_b.append(aids[jj][keep])
                else:
                    bids_ = np.array([r["vec_id"] for r in b_rows])
                    B = np.stack([r["embedding"] for r in b_rows]).astype(np.float64)
                    B /= np.linalg.norm(B, axis=1, keepdims=True)
                    # cross-block entries are unique; just order the ids
                    ii, jj = np.nonzero(A @ B.T >= slack)
                    out_a.append(np.minimum(aids[ii], bids_[jj]))
                    out_b.append(np.maximum(aids[ii], bids_[jj]))
            empty = np.array([], dtype=np.int64)
            yield pd.DataFrame({
                "a_id": np.concatenate(out_a) if out_a else empty,
                "b_id": np.concatenate(out_b) if out_b else empty})

    # each unordered pair meets in exactly one block-pair row (abid <=
    # bbid; triangle within diagonal blocks), so no dedup is needed
    cands = bp.mapInPandas(block_pairs, "a_id long, b_id long")
    a = (emb.select(F.col("vec_id").alias("a_id"),
                    _as_double("embedding").alias("a_vec"))
            .withColumn("a_norm", _norm(F.col("a_vec"))))
    b = (emb.select(F.col("vec_id").alias("b_id"),
                    _as_double("embedding").alias("b_vec"))
            .withColumn("b_norm", _norm(F.col("b_vec"))))
    cos = _dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_norm") * F.col("b_norm"))
    return (cands.join(a, "a_id").join(b, "b_id")
                 .select("a_id", "b_id", cos.alias("cosine"))
                 .where(F.col("cosine") >= threshold))


def embedding_near_dup_exact(spark: SparkSession, sf_dir: str,
                             threshold: float = 0.4) -> DataFrame:
    return embedding_near_dup_exact_df(load(spark, sf_dir, "embeddings"),
                                       threshold)


def semantic_decontaminate_df(corpus: DataFrame, benchmark: DataFrame,
                              threshold: float = 0.3) -> DataFrame:
    """SEMANTIC decontamination: drop-verdict training vectors whose
    embedding is cosine-close to ANY benchmark vector — the
    paraphrase-robust complement of the verbatim paths
    (``dedup.decontaminate_spans`` / ``sketch.bloom_decontaminate``
    catch exact n-gram/span leakage; a reworded eval question leaks
    with zero verbatim overlap but high embedding cosine).

    Output, one row per corpus vector: (vec_id, n_bench_hits =
    #benchmark vectors with cosine >= threshold, semantically_
    contaminated = n_bench_hits >= 1). The emitted columns are integer/
    boolean ONLY — the cosine is decision state, never output — so the
    hash gate rides on the threshold verdicts alone.

    Two stages, the ``embedding_near_dup_exact_df`` discipline:

      stage 1  the benchmark is BOUNDED BY CONTRACT (real benchmark
               suites are fixed-size — the verbatim paths' standing
               contract), so its normalized float64 matrix ships as an
               sc.broadcast into a self-contained mapInPandas kernel:
               one numpy matmul per Arrow batch of corpus rows emits
               candidate (vec_id, bench_id) pairs with 1e-9 slack
               under the threshold. Linear one-pass corpus scan, no
               shuffle, no N x B join rows — non-candidates (the
               overwhelming majority of a clean corpus) never leave
               the kernel.
      stage 2  candidates (a tiny set) re-score with the sequential
               zip_with/aggregate fold whose IEEE-754 operation order
               matches DuckDB's list_dot_product bit-for-bit, so the
               >= threshold verdict is decided on bit-identical
               doubles in both engines. The 1e-9 slack is ~1e5 x the
               worst matmul-vs-fold divergence for 64-dim vectors, so
               stage 1 cannot drop a pair stage 2 would accept.

    100 TB: the corpus side streams through the matmul kernel
    embarrassingly parallel; the broadcast is |bench| x dim float64
    (MB-scale for real suites); the agg + final left join shuffle only
    candidate hits (broadcast-sized). If a benchmark ever outgrew the
    broadcast, the IVF probe path (``ivf.query_ivf_index`` over a
    benchmark-built index) is the shortlist replacement — same verdict
    contract."""
    import numpy as np

    sc = corpus.sparkSession.sparkContext
    bench_rows = benchmark.select("vec_id", "embedding").collect()
    bids = np.array([r["vec_id"] for r in bench_rows], dtype=np.int64)
    M = np.stack([r["embedding"] for r in bench_rows]).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    bc = sc.broadcast((bids, M.T.copy()))
    slack = threshold - 1e-9

    def candidates(batches):
        import numpy as _np
        import pandas as _pd

        b_ids, mt = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf["vec_id"].to_numpy(dtype=_np.int64)
            A = _np.stack(pdf["embedding"].to_numpy()).astype(_np.float64)
            A /= _np.linalg.norm(A, axis=1, keepdims=True)
            ii, jj = _np.nonzero(A @ mt >= slack)
            yield _pd.DataFrame({"vec_id": cids[ii],
                                 "bench_id": b_ids[jj]})

    cand = (corpus.select("vec_id", "embedding")
            .mapInPandas(candidates, "vec_id long, bench_id long"))
    c_vec = corpus.select("vec_id", _as_double("embedding").alias("c_vec"))
    b_vec = benchmark.select(F.col("vec_id").alias("bench_id"),
                             _as_double("embedding").alias("b_vec"))
    hits = (cand.join(c_vec, "vec_id").join(F.broadcast(b_vec), "bench_id")
            .where(_cosine(F.col("c_vec"), F.col("b_vec")) >= threshold)
            .groupBy("vec_id")
            .agg(F.count(F.lit(1)).alias("n_bench_hits")))
    return (corpus.select("vec_id")
            .join(hits, "vec_id", "left")
            .select("vec_id",
                    F.coalesce("n_bench_hits", F.lit(0).cast("bigint"))
                     .alias("n_bench_hits"))
            .withColumn("semantically_contaminated",
                        F.col("n_bench_hits") >= 1))


def semantic_decontaminate(spark: SparkSession, sf_dir: str,
                           threshold: float = 0.3) -> DataFrame:
    """Driver-gate fixture: the decontaminate split transplanted to the
    embeddings table (every 50th vec_id is the benchmark) under
    cosine-threshold semantics. Full hash oracle — the output is
    integer/boolean only, decided on the fold cosine that DuckDB's
    list_dot_product reproduces bit-for-bit."""
    emb = load(spark, sf_dir, "embeddings")
    is_bench = F.col("vec_id") % 50 == 0
    return semantic_decontaminate_df(emb.where(~is_bench),
                                     emb.where(is_bench), threshold)


# --- banded sign-LSH ---------------------------------------------------

def band_buckets(df: DataFrame, vec_col: str = "embedding",
                 n_planes: int = 64, band_bits: int = 16,
                 seed: int = 42) -> DataFrame:
    """Adds ``buckets`` array<long>: one key per band, where key =
    (band_id << 48) | integer of that band's hyperplane sign bits.

    The hyperplane matrix is regenerated deterministically from the seed on
    every executor (np.random.default_rng) — no model state to ship. One
    vectorized matmul per Arrow batch; the UDF closure is self-contained
    (numpy only), so workers never import this package."""
    n_bands = n_planes // band_bits

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(emb):
        import numpy as np
        import pandas as pd
        M = np.stack(emb.to_numpy())              # (batch, dim)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((M.shape[1], n_planes))
        bits = (M @ planes) >= 0                  # (batch, n_planes)
        weights = (1 << np.arange(band_bits, dtype=np.int64))
        keys = bits.reshape(len(M), n_bands, band_bits).astype(np.int64) @ weights
        keys = keys + (np.arange(n_bands, dtype=np.int64) << 48)
        return pd.Series(list(keys))

    return df.withColumn("buckets", _buckets(F.col(vec_col)))


def embedding_near_dup_df(emb: DataFrame, threshold: float = 0.95,
                          n_planes: int = 64, band_bits: int = 16,
                          seed: int = 42) -> DataFrame:
    """LSH-bucketed cosine near-dup pairs: candidates share at least one
    16-bit band key; cosine verified exactly. For planted duplicates at
    cosine ~0.999 the 4x16-bit banding catches >99.8% of pairs; raise
    n_planes (more bands) for higher recall at lower thresholds."""
    from pyspark import StorageLevel

    # persisted: both self-join sides consume this frame — without the
    # barrier the Arrow-batched matmul UDF (and the explode) re-runs once
    # per side (same discipline as dedup.py's signature persist)
    bucketed = (band_buckets(emb, n_planes=n_planes, band_bits=band_bits,
                             seed=seed)
                .select("vec_id", _as_double("embedding").alias("vec"),
                        F.explode("buckets").alias("bucket"))
                .withColumn("nrm", _norm(F.col("vec")))
                .persist(StorageLevel.MEMORY_AND_DISK))
    a = bucketed.select(F.col("vec_id").alias("a_id"),
                        F.col("vec").alias("a_vec"),
                        F.col("nrm").alias("a_norm"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("b_id"),
                        F.col("vec").alias("b_vec"),
                        F.col("nrm").alias("b_norm"), "bucket")
    cos = _dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_norm") * F.col("b_norm"))
    out = (a.join(b, "bucket")
            .where(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id", cos.alias("cosine"))
            .where(F.col("cosine") >= threshold)
            .dropDuplicates(["a_id", "b_id"]))
    # caller releases the bucketed cache via cache.release(out)
    return owned(out, bucketed)


def embedding_near_dup(spark: SparkSession, sf_dir: str,
                       threshold: float = 0.95) -> DataFrame:
    return embedding_near_dup_df(load(spark, sf_dir, "embeddings"), threshold)


def cosine_topk_lsh(spark: SparkSession, sf_dir: str,
                    n_queries: int = 5, k: int = 10,
                    n_planes: int = 64, band_bits: int = 4,
                    seed: int = 42) -> DataFrame:
    """ANN top-k: score only corpus vectors sharing a band key with the
    query. Moderate-similarity neighbors need COARSE bands (band_bits=4 ->
    16 bands of 16 buckets: ~90% recall at cosine ~0.5); near-dup search
    uses fine 16-bit bands instead. Approximate relative to the EXACT
    ranking, but fully deterministic given the seed — so since r11 the
    driver gate is a FULL HASH oracle (ORACLES['ann_cosine_topk_lsh']
    embeds the seed-42 hyperplanes as literals and re-derives band keys,
    candidates, and the exact-cosine ranking, the technique r10 proved
    on ann_recall_lsh); recall vs exact stays measured in tests and by
    the ann_recall_lsh driver row."""
    from pyspark import StorageLevel

    # persisted: the query head and the corpus scan both consume the
    # UDF-bucketed frame
    bucketed = band_buckets(load(spark, sf_dir, "embeddings"),
                            n_planes=n_planes, band_bits=band_bits,
                            seed=seed).persist(StorageLevel.MEMORY_AND_DISK)
    queries = (bucketed.orderBy("vec_id").limit(n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       _as_double("embedding").alias("q_vec"),
                       F.explode("buckets").alias("bucket")))
    corpus = (bucketed
              .select(F.col("vec_id").alias("neighbor_id"),
                      _as_double("embedding").alias("c_vec"),
                      F.explode("buckets").alias("bucket")))
    cands = (corpus.join(F.broadcast(queries), "bucket")
             .where(F.col("neighbor_id") != F.col("query_id"))
             .dropDuplicates(["query_id", "neighbor_id"]))
    scored = cands.select("query_id", "neighbor_id",
                          _cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return owned(scored.withColumn("rank", F.row_number().over(w))
                       .where(F.col("rank") <= k)
                       .select("query_id", "neighbor_id", "rank"),
                 bucketed)


# --- int8 scalar quantization ------------------------------------------

def ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str,
                        n_queries: int = 5, k: int = 10,
                        n_planes: int = 64, band_bits: int = 4,
                        seed: int = 42) -> DataFrame:
    """Registry wrapper for the FULL-HASH driver gate on
    ``cosine_topk_lsh``: the DuckDB oracle (ORACLES['ann_cosine_topk_lsh'])
    embeds n_queries/k/seed and the 64x64 seed-42 hyperplanes as
    LITERALS, so a non-default invocation routed through the gate would
    silently compare against a mismatched oracle — same pin guard
    ``ann_recall_lsh``/``ann_recall_ivf`` carry (ADVICE r11).
    ``cosine_topk_lsh`` itself stays unpinned for general use."""
    pinned = (5, 10, 64, 4, 42)
    got = (n_queries, k, n_planes, band_bits, seed)
    if got != pinned:
        raise ValueError(
            f"ann_cosine_topk_lsh oracle pins (n_queries, k, n_planes, "
            f"band_bits, seed)={pinned}; got {got} — call "
            f"cosine_topk_lsh directly for other settings")
    return cosine_topk_lsh(spark, sf_dir, n_queries, k,
                           n_planes, band_bits, seed)


def sq8_quantize(vec_col: F.Column) -> tuple[F.Column, F.Column]:
    """Symmetric per-vector int8 quantization: ``scale = max|x_i|`` and
    ``q_i = floor(x_i * 127.0 / scale + 0.5)`` (round-half-up written as
    a floor so Spark and DuckDB round identically — their native round()
    disagree on half-even vs half-away). Returns (q_vec array<bigint>,
    scale double). ``greatest(scale, 1e-30)`` guards the all-zero vector
    (it quantizes to all zeros instead of dividing by zero).

    This is the FAISS ``SQ8`` storage recipe: 4x smaller than float32
    (1 byte + one scale per vector), which at 100 TB of embeddings is
    the difference between a corpus that fits executor memory / Arrow
    batches and one that doesn't.

    NOTE: this returns raw expressions for single-use/test contexts;
    anything that evaluates the codes per row must go through
    ``sq8_quantized`` (staged columns) — inlining these expressions
    costs O(dim^2) interpreted work per occurrence."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    scale = F.greatest(F.array_max(F.transform(v, F.abs)), F.lit(1e-30))
    q = F.transform(v, lambda x: F.floor(x * F.lit(127.0) / scale
                                         + F.lit(0.5)).cast("bigint"))
    return q, scale


def _qdot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def sq8_quantized(df: DataFrame, vec_col: str = "embedding",
                  keep: list[str] | None = None) -> DataFrame:
    """``sq8_quantize`` staged as real columns — the execution path every
    sq8 consumer must use. Inlining the quantize EXPRESSION re-evaluates
    the nested scale aggregate once per array element and once per
    expression occurrence: O(dim^2) interpreted HOF work per row per use
    (measured 3.5x slower on the sf0.1 top-k). Staging each step as its
    own column evaluates it once per row; Catalyst keeps the projections
    separate because the higher-order functions are non-cheap, so
    CollapseProject cannot re-inline them.

    Returns ``keep`` columns (default: everything but the vector) plus
    ``qv`` (array<bigint> codes) and ``qq`` (bigint self-dot)."""
    if keep is None:
        keep = [c for c in df.columns if c != vec_col]
    v = df.withColumn("_sq8_v", F.transform(F.col(vec_col),
                                            lambda x: x.cast("double")))
    v = v.withColumn("_sq8_s", F.greatest(
        F.array_max(F.transform(F.col("_sq8_v"), F.abs)), F.lit(1e-30)))
    v = v.withColumn("qv", F.transform(
        F.col("_sq8_v"),
        lambda x: F.floor(x * F.lit(127.0) / F.col("_sq8_s")
                          + F.lit(0.5)).cast("bigint")))
    v = v.withColumn("qq", _qdot(F.col("qv"), F.col("qv")))
    return v.select(*keep, "qv", "qq")


def qcos(qdot: F.Column, a_qq: F.Column, b_qq: F.Column) -> F.Column:
    """Quantized cosine — THE one spelling every sq8 scorer must use
    (similarity top-k, two-phase shortlist, ivf sq8 probe): the hash
    oracles restate exactly this operation order, so a second spelling
    drifting from it would silently break a bit-exact gate."""
    return (qdot.cast("double")
            / (F.sqrt(a_qq.cast("double")) * F.sqrt(b_qq.cast("double"))))


def _sq8_scored(emb: DataFrame, n_queries: int) -> DataFrame:
    """Shared sq8 phase 1: quantize the query head (cut BEFORE
    quantization — n_queries rows, not the corpus twice) and the corpus,
    broadcast the head, score every pair. Returns (query_id,
    neighbor_id, qdot, qcos)."""
    queries = (sq8_quantized(emb.orderBy("vec_id").limit(n_queries),
                             keep=["vec_id"])
               .select(F.col("vec_id").alias("query_id"),
                       F.col("qv").alias("a_qv"), F.col("qq").alias("a_qq")))
    corpus = (sq8_quantized(emb, keep=["vec_id"])
              .select(F.col("vec_id").alias("neighbor_id"),
                      F.col("qv").alias("b_qv"), F.col("qq").alias("b_qq")))
    return (corpus.crossJoin(F.broadcast(queries))
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id",
                    _qdot(F.col("a_qv"), F.col("b_qv")).alias("qdot"),
                    "a_qq", "b_qq")
            .select("query_id", "neighbor_id", "qdot",
                    qcos(F.col("qdot"), F.col("a_qq"),
                         F.col("b_qq")).alias("qcos")))


def cosine_topk_sq8_df(emb: DataFrame, n_queries: int = 5,
                       k: int = 10) -> DataFrame:
    """ANN top-k over int8 scalar-quantized vectors — the memory-at-scale
    companion to cosine_topk_bruteforce (same query set, same ranking
    shape). Per pair the score is the QUANTIZED cosine: an exact bigint
    dot product of the two int8 vectors divided by the product of their
    exact integer norms. Every arithmetic step is either exact integer
    math or a float op with one IEEE-754-identical spelling in both
    engines (sqrt of an integer-valued double, one product, one divide),
    so unlike interpolated-float scores this ranking is full-hash
    verifiable against DuckDB. The per-vector float scales cancel out of
    the cosine up to quantization error, so they are not needed at
    search time — only the 1-byte codes are.

    Output: query_id, neighbor_id, qdot (exact bigint int8 dot), rank.

    Scale: the quantized corpus is a 64-byte-per-row scan (vs 256 for
    float32); queries are a tiny broadcast; per-query top-k is a bounded
    window over n_queries * |corpus| scored rows. Compose with the IVF
    cell filter (ivf.py) to prune the scan; recall vs the float baseline
    is pytest-floored (tests/test_sq8.py)."""
    scored = _sq8_scored(emb, n_queries)
    w = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "neighbor_id", "qdot", "rank"))


def cosine_topk_sq8(spark: SparkSession, sf_dir: str,
                    n_queries: int = 5, k: int = 10) -> DataFrame:
    return cosine_topk_sq8_df(load(spark, sf_dir, "embeddings"),
                              n_queries, k)


def ann_recall_sq8_df(emb: DataFrame, n_queries: int = 5,
                      k: int = 10) -> DataFrame:
    """Recall@k evaluation of the sq8 quantized ranking against the
    exact float ranking — the quality-control report every ANN
    deployment ships with its index: per query, how many of the true
    top-k the approximate path returned. Output: (query_id, n_hits,
    k, recall) with n_hits exact bigint and recall ONE division.

    Both sides are existing full-hash-verified rankings, so the
    evaluation itself is full-hash verifiable too — rare for ANN
    tooling, possible here because the sq8 ranking is exact-integer.
    Scale: two bounded ranked frames (n_queries x k rows each) and one
    equi-join; the expensive part is the underlying rankings, which at
    corpus scale come from the IVF/LSH paths instead."""
    exact = (_bruteforce_ranked(emb, n_queries)
             .where(F.col("rank") <= k)
             .select("query_id", "neighbor_id"))
    approx = (cosine_topk_sq8_df(emb, n_queries, k)
              .select("query_id", "neighbor_id"))
    hits = (exact.join(approx, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits")))
    # the query-id universe is the bounded head the rankings share — a
    # distinct() over `exact` would re-evaluate the whole n_queries x
    # corpus scoring subtree a second time just to recover these ids
    qids = (emb.orderBy("vec_id").limit(n_queries)
            .select(F.col("vec_id").alias("query_id")))
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint"))
    return (qids.join(hits, "query_id", "left")
            .select("query_id", n_hits.alias("n_hits"),
                    F.lit(k).cast("int").alias("k"),
                    (n_hits.cast("double") / F.lit(float(k)))
                    .alias("recall")))


def ann_recall_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate fixture (full hash oracle — both underlying rankings
    are already hash-verified): per-query recall@10 of the sq8 ranking
    vs the exact float ranking."""
    return ann_recall_sq8_df(load(spark, sf_dir, "embeddings"))


def embedding_matryoshka_recall_df(emb: DataFrame,
                                   dims: tuple = (16, 32, 64),
                                   n_queries: int = 5,
                                   k: int = 10) -> DataFrame:
    """Matryoshka truncation evaluation (Kusupati et al., NeurIPS'22):
    recall@k of exact cosine retrieval over the first ``d`` embedding
    coordinates, per prefix width d, against the full-dimension exact
    ranking — the table an embedding-pipeline owner reads before
    shipping truncated vectors to cut index storage/bandwidth (an MRL
    checkpoint preserves prefix quality; this measures how much THIS
    corpus's retrieval keeps at each width). The full-width row is a
    built-in self-check: recall exactly 1.0 by construction.

    Output: (dim, query_id, n_hits, k, recall) — counts exact bigints,
    recall ONE division, the truncated cosine the same sequential fold
    as every exact oracle (slicing commutes with the fold), so the
    whole report is full-hash verifiable.

    Scale (r16 restructure; guide §2.4 "remove shuffles outright" /
    §1.2): ONE corpus scan computes every prefix cosine AND the
    full-width baseline cosine per (neighbor, query) pair — prefix
    slices and norms are projected once per corpus row, amortized over
    the broadcast query head. The full-width ranking is materialized as
    an ``in_full`` flag by one window over query_id BEFORE the per-dim
    explode, so the hit count per dim is a plain filtered aggregate —
    |top-k(d) ∩ top-k(full)| counted from the flag — and the previous
    full-vs-trunc self-join (which re-planned the whole scored subtree,
    a second corpus scan) disappears. The r15 plan pair pins 4 scans +
    4 window exchanges collapsing to 1 scan + 2 window exchanges.
    Every cosine is the same ``_dot(q, c) / (norm(q) * norm(c))``
    sequential fold as before — precomputing norms as columns changes
    evaluation count, not IEEE operation order — and both windows keep
    the (cosine desc, neighbor_id asc) order, so the report stays
    full-hash verifiable."""
    dims = tuple(int(d) for d in dims)
    qhead = (emb.orderBy("vec_id").limit(n_queries)
             .select(F.col("vec_id").alias("query_id"),
                     _as_double("embedding").alias("q_full")))
    queries = qhead.select(
        "query_id", "q_full",
        *[F.slice("q_full", 1, d).alias(f"q_{d}") for d in dims])
    queries = queries.select(
        "query_id", "q_full", *[f"q_{d}" for d in dims],
        _norm(F.col("q_full")).alias("nq_full"),
        *[_norm(F.col(f"q_{d}")).alias(f"nq_{d}") for d in dims])
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"),
                        _as_double("embedding").alias("c_full"))
    corpus = corpus.select(
        "neighbor_id", "c_full",
        *[F.slice("c_full", 1, d).alias(f"c_{d}") for d in dims])
    corpus = corpus.select(
        "neighbor_id", "c_full", *[f"c_{d}" for d in dims],
        _norm(F.col("c_full")).alias("nc_full"),
        *[_norm(F.col(f"c_{d}")).alias(f"nc_{d}") for d in dims])
    pairs = (corpus.crossJoin(F.broadcast(queries))
             .where(F.col("neighbor_id") != F.col("query_id"))
             .select(
                 "query_id", "neighbor_id",
                 (_dot(F.col("q_full"), F.col("c_full"))
                  / (F.col("nq_full") * F.col("nc_full")))
                 .alias("cos_full"),
                 *[(_dot(F.col(f"q_{d}"), F.col(f"c_{d}"))
                    / (F.col(f"nq_{d}") * F.col(f"nc_{d}")))
                   .alias(f"cos_{d}") for d in dims]))
    w_full = Window.partitionBy("query_id") \
        .orderBy(F.col("cos_full").desc(), F.col("neighbor_id").asc())
    flagged = (pairs
               .withColumn("in_full",
                           F.row_number().over(w_full) <= k)
               .select("query_id", "neighbor_id", "in_full",
                       F.explode(F.array(*[
                           F.struct(F.lit(d).alias("dim"),
                                    F.col(f"cos_{d}").alias("cosine"))
                           for d in dims])).alias("e"))
               .select("query_id", "neighbor_id", "in_full",
                       F.col("e.dim").alias("dim"),
                       F.col("e.cosine").alias("cosine")))
    w = Window.partitionBy("dim", "query_id") \
        .orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    hits = (flagged.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .groupBy("dim", "query_id")
            .agg(F.sum(F.when(F.col("in_full"), F.lit(1))
                       .otherwise(F.lit(0)))
                 .cast("bigint").alias("n_hits")))
    qids = (emb.orderBy("vec_id").limit(n_queries)
            .select(F.col("vec_id").alias("query_id")))
    grid = qids.select(
        "query_id",
        F.explode(F.array(*[F.lit(d) for d in dims])).alias("dim"))
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint"))
    return (grid.join(hits, ["dim", "query_id"], "left")
            .select(F.col("dim").cast("int").alias("dim"), "query_id",
                    n_hits.alias("n_hits"),
                    F.lit(k).cast("int").alias("k"),
                    (n_hits.cast("double") / F.lit(float(k)))
                    .alias("recall")))


def embedding_matryoshka_recall(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Driver-gate fixture (full hash oracle): recall@10 of exact
    retrieval over 16/32/64-wide embedding prefixes vs the full 64-dim
    ranking."""
    return embedding_matryoshka_recall_df(load(spark, sf_dir,
                                               "embeddings"))


def cosine_topk_sq8_rescored_df(emb: DataFrame, n_queries: int = 5,
                                k: int = 10,
                                shortlist: int = 30) -> DataFrame:
    """Two-phase retrieval — the production ANN serving pattern (FAISS
    SQ8 + refine): a cheap int8 scan shortlists ``shortlist`` candidates
    per query by quantized cosine, then ONLY the shortlist is re-scored
    with full-precision float cosine to produce the final top-k. At
    100 TB the first phase reads 1-byte codes (4x less scan than
    float32) and the second touches shortlist * n_queries rows — the
    float vectors never stream through the hot loop.

    Exactness contract: the rescore uses the same zip_with/aggregate
    fold as cosine_topk_bruteforce, so any candidate's final cosine is
    IDENTICAL to the exact path's; the only approximation is shortlist
    membership. With shortlist >= 3k the planted-corpus shortlist
    contains the entire true top-k (pytest-pinned equality with the
    exact baseline at sf0.001).

    Output: query_id, neighbor_id, cosine, rank."""
    scored = _sq8_scored(emb, n_queries)
    w1 = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(),
                                                F.col("neighbor_id").asc())
    cands = (scored.withColumn("srank", F.row_number().over(w1))
                   .where(F.col("srank") <= shortlist)
                   .select("query_id", "neighbor_id"))
    # phase 2: float vectors fetched for the shortlist only
    qf = (emb.orderBy("vec_id").limit(n_queries)
             .select(F.col("vec_id").alias("query_id"),
                     _as_double("embedding").alias("q_vec")))
    cf = emb.select(F.col("vec_id").alias("neighbor_id"),
                    _as_double("embedding").alias("c_vec"))
    rescored = (cands.join(F.broadcast(qf), "query_id")
                .join(cf, "neighbor_id")
                .select("query_id", "neighbor_id",
                        _cosine(F.col("q_vec"),
                                F.col("c_vec")).alias("cosine")))
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                                F.col("neighbor_id").asc())
    return (rescored.withColumn("rank", F.row_number().over(w2))
                    .where(F.col("rank") <= k)
                    .select("query_id", "neighbor_id", "cosine", "rank"))


def cosine_topk_sq8_rescored(spark: SparkSession, sf_dir: str,
                             n_queries: int = 5, k: int = 10,
                             shortlist: int = 30) -> DataFrame:
    return cosine_topk_sq8_rescored_df(load(spark, sf_dir, "embeddings"),
                                       n_queries, k, shortlist)


# --- recall reports for the approximate ANN variants ---------------------

def _recall_report(emb: DataFrame, approx: DataFrame,
                   n_queries: int, k: int) -> DataFrame:
    """Recall@k of ``approx`` (query_id, neighbor_id rows) against the
    exact brute-force top-k — the ann_recall_sq8 report shape:
    (query_id, n_hits, k, recall), n_hits an exact bigint intersection
    count, recall ONE division. The query-id universe is the bounded
    head all the top-k fixtures share."""
    exact = (_bruteforce_ranked(emb, n_queries)
             .where(F.col("rank") <= k)
             .select("query_id", "neighbor_id"))
    hits = (exact.join(approx.select("query_id", "neighbor_id"),
                       ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits")))
    qids = (emb.orderBy("vec_id").limit(n_queries)
            .select(F.col("vec_id").alias("query_id")))
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint"))
    return (qids.join(hits, "query_id", "left")
            .select("query_id", n_hits.alias("n_hits"),
                    F.lit(k).cast("int").alias("k"),
                    (n_hits.cast("double") / F.lit(float(k)))
                    .alias("recall")))


def ann_recall_lsh(spark: SparkSession, sf_dir: str,
                   n_queries: int = 5, k: int = 10) -> DataFrame:
    """Driver-gate fixture (full hash): per-query recall@10 of the REAL
    banded-LSH ranking (``cosine_topk_lsh``, default 64 planes / 4-bit
    bands / seed 42) against the exact brute-force ranking.

    Hash-gateable because nothing in the LSH path is actually
    nondeterministic: the hyperplanes are a pure function of the seed
    (np.random.default_rng(42).standard_normal), so the DuckDB oracle
    embeds the same 64x64 plane constants as literals and re-derives
    the sign-bit band keys, candidate set, and exact-cosine ranking.
    The one cross-engine risk is summation order in the projection
    (numpy matmul vs the oracle's sequential list_dot_product): a sign
    can only differ when |projection| falls inside the reordering
    error (~1e-13 on O(1)-scale projections), and the gate fails
    LOUDLY if that ever happens — it does not on the test corpora."""
    if (n_queries, k) != (5, 10):
        # the DuckDB oracle (ORACLES['ann_recall_lsh']) embeds these as
        # literals (LIMIT 5, /10.0, the 64x64 plane constants); a
        # non-default invocation would gate against a silently
        # mismatched oracle (ADVICE r10)
        raise ValueError(
            f"ann_recall_lsh oracle pins n_queries=5, k=10; "
            f"got ({n_queries}, {k}) — use cosine_topk_lsh + "
            f"_recall_report directly for other settings")
    emb = load(spark, sf_dir, "embeddings")
    approx = cosine_topk_lsh(spark, sf_dir, n_queries, k)
    return owned(_recall_report(emb, approx, n_queries, k),
                 *persisted(approx))


def _ivf_flat_ranked(emb: DataFrame, n_queries: int = 5, k: int = 10,
                     n_centroids: int = 32, m_assign: int = 2,
                     nprobe: int = 12) -> DataFrame:
    """IVF probe over DETERMINISTIC untrained centroids — the first
    ``n_centroids`` corpus vectors by vec_id, cell ids in vec_id order.
    Exercises the identical probe machinery as the kmeans-trained path
    (top-m cell assignment by cosine, candidate join on cell, exact
    rescoring, dense rank) but with every step restatable in SQL:
    assignment uses the sequential-fold cosine (same IEEE order as the
    DuckDB list_dot_product oracle), ties broken (cosine desc, cell
    asc). K-means training only improves cell balance/recall, never
    correctness — so this twin is what makes the IVF probe machinery
    full-hash gateable while the trained variant's recall stays a
    rows-only report with a pytest floor."""
    cents = (emb.orderBy("vec_id").limit(n_centroids)
             .select(F.col("vec_id").alias("cvid"),
                     _as_double("embedding").alias("cent")))
    # norms precomputed ONCE per row (r16; guide §2.3 — the previous
    # inline _cosine re-folded norm(v) per centroid pair and norm(cent)
    # per vector): dot/(nv * nc) is the identical IEEE expression with
    # the factors evaluated once, so every cosine is bit-unchanged
    # (oracle re-proven)
    cents = (cents.withColumn(
                 "cell", F.row_number().over(Window.orderBy("cvid")) - 1)
             .select("cell", "cent", _norm(F.col("cent")).alias("ncent")))

    def top_cells(vecs: DataFrame, m: int) -> DataFrame:
        vn = vecs.select("vec_id", "v", _norm(F.col("v")).alias("nv"))
        scored = (vn.crossJoin(F.broadcast(cents))
                  .select("vec_id", "v", "nv", "cell",
                          (_dot(F.col("v"), F.col("cent"))
                           / (F.col("nv") * F.col("ncent")))
                          .alias("ccos")))
        w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(),
                                                 F.col("cell").asc())
        return (scored.withColumn("r", F.row_number().over(w))
                .where(F.col("r") <= m)
                .select("vec_id", "v", "nv", "cell"))

    corpus = emb.select("vec_id", _as_double("embedding").alias("v"))
    queries = (emb.orderBy("vec_id").limit(n_queries)
               .select("vec_id", _as_double("embedding").alias("v")))
    ccells = top_cells(corpus, m_assign).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("c_vec"),
        F.col("nv").alias("nc"), "cell")
    qcells = top_cells(queries, nprobe).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q_vec"),
        F.col("nv").alias("nq"), "cell")
    cands = (ccells.join(F.broadcast(qcells), "cell")
             .where(F.col("neighbor_id") != F.col("query_id")))
    scored = cands.select(
        "query_id", "neighbor_id",
        (_dot(F.col("q_vec"), F.col("c_vec"))
         / (F.col("nq") * F.col("nc"))).alias("cosine"))
    # Multi-assign duplicates (a neighbor sharing two probed cells of
    # the same query) are EXACT row duplicates — same vectors, same
    # cosine — so after the window sort they are ADJACENT and one
    # lag-compare inside the SAME window partitioning dedups them: no
    # dropDuplicates exchange on (query, neighbor) (r15; the
    # _query_ivf_index_rows pattern — one shuffle for the whole tail,
    # the post-filter re-rank reuses the partitioning)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("neighbor_id").asc())
    return (scored
            .withColumn("_prev", F.lag("neighbor_id").over(w))
            .where(F.col("_prev").isNull()
                   | (F.col("_prev") != F.col("neighbor_id")))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str,
                        n_queries: int = 5, k: int = 10) -> DataFrame:
    """Driver-gate fixture (full hash since r13): the deterministic
    flat-centroid IVF top-k RANKING itself (``_ivf_flat_ranked`` — the
    first-32-vectors centroid grid, top-2 cell assignment, nprobe-12
    candidate join, exact rescoring). The same property that made
    ``ann_recall_ivf`` hash-gateable in r10 applies to the ranking: every
    step is a pure function of pinned constants, so the DuckDB oracle
    (ORACLES['ann_cosine_topk_ivf']) restates the whole probe and the
    result list verifies value-by-value. The kmeans-TRAINED ranking stays
    the separate rows-only ``ann_recall_ivf_trained``/stored entries with
    pytest recall floors (float training state, not SQL-restatable)."""
    if (n_queries, k) != (5, 10):
        # the oracle pins these as literals (LIMIT 5, rank <= 10)
        raise ValueError(
            f"ann_cosine_topk_ivf oracle pins n_queries=5, k=10; "
            f"got ({n_queries}, {k}) — use _ivf_flat_ranked directly "
            f"for other settings")
    return _ivf_flat_ranked(load(spark, sf_dir, "embeddings"),
                            n_queries, k)


def ann_recall_ivf(spark: SparkSession, sf_dir: str,
                   n_queries: int = 5, k: int = 10) -> DataFrame:
    """Driver-gate fixture (full hash): per-query recall@10 of the
    deterministic flat-centroid IVF probe (``_ivf_flat_ranked``) against
    the exact ranking. This is the hash-gateable certificate for the
    IVF PROBE machinery — cell assignment, candidate generation, exact
    rescoring, ranking — which is shared with the kmeans-trained
    variants; the trained centroids themselves are float training state
    (pairwise-summed numpy means) with no bit-identical SQL
    restatement, so the trained variant's recall is the separate
    rows-only ``ann_recall_ivf_trained`` row with a pytest floor."""
    if (n_queries, k) != (5, 10):
        # ORACLES['ann_recall_ivf'] pins these as literals (ADVICE r10)
        raise ValueError(
            f"ann_recall_ivf oracle pins n_queries=5, k=10; "
            f"got ({n_queries}, {k}) — use _ivf_flat_ranked + "
            f"_recall_report directly for other settings")
    emb = load(spark, sf_dir, "embeddings")
    approx = _ivf_flat_ranked(emb, n_queries, k)
    return _recall_report(emb, approx, n_queries, k)


def ann_recall_ivf_trained(spark: SparkSession, sf_dir: str,
                           n_queries: int = 5, k: int = 10) -> DataFrame:
    """Driver-visible recall report for the REAL kmeans-trained IVF
    ranking (``cosine_topk_ivf`` defaults). Rows-only gate — the
    trained centroids are not SQL-restatable — with the recall floor
    pinned in pytest (tests/test_sq8.py::test_ann_recall_reports)."""
    from .ivf import cosine_topk_ivf

    emb = load(spark, sf_dir, "embeddings")
    approx = cosine_topk_ivf(spark, sf_dir, n_queries, k)
    return _recall_report(emb, approx, n_queries, k)


def ann_recall_stored(spark: SparkSession, sf_dir: str,
                      n_queries: int = 5, k: int = 10) -> DataFrame:
    """Driver-visible recall report for the stored-index probe path
    (``ann_cosine_topk_stored_probe``: build-once scratch IVF index,
    probe-only query). Rows-only gate, pytest recall floor — same
    reason as the trained variant (kmeans centroids in the stored
    index)."""
    from .ivf import ann_cosine_topk_stored_probe

    emb = load(spark, sf_dir, "embeddings")
    approx = ann_cosine_topk_stored_probe(spark, sf_dir, n_queries, k)
    return _recall_report(emb, approx, n_queries, k)
