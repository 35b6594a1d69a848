"""DSIR-style importance resampling for training-data selection.

Public method: Xie et al., *Data Selection for Language Models via
Importance Resampling* (NeurIPS 2023). A raw corpus is scored against a
small TARGET corpus by a bag-of-hashed-n-grams importance weight

    log w(d) = sum_{g in grams(d)} [ ln p_target(bucket(g))
                                     - ln p_raw(bucket(g)) ]

with Laplace-smoothed bucket multinomials, and the top candidates (or a
Gumbel-top-k sample, the paper's actual resampling rule) are kept.

Spark-first layout — the whole scorer is TWO tiny shuffles at any scale:

1. bucket distributions: explode word bigrams map-side, hash each gram to
   one of ``n_buckets`` ids, and groupBy(bucket) with map-side partial
   aggregation — the shuffle moves at most ``n_buckets`` rows per task,
   independent of corpus size;
2. the per-document score: the two bucket tables are CONTRACT-BOUNDED
   (<= n_buckets rows), so they come back to the driver (same ownership
   rule as the IVF centroids) and ride into the executors as two map
   LITERALS inside one ``F.aggregate`` fold over the doc's gram array —
   ZERO shuffle, no join, whole-stage codegen end to end;
3. top-k: ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject
   (per-partition heaps + a k-row merge), never a global sort.

The gram hash is md5-derived (``conv(substring(md5(g),1,8),16,10) %
n_buckets``) because DuckDB computes the IDENTICAL bucket ids
(``('0x'||substring(md5(g),1,8))::BIGINT``), which is what makes the
driver gates below full-hash instead of rows-only.

Float discipline: Spark's ``ln`` and DuckDB's ``ln`` are NOT bit-identical
(measured ~7% of ratio-of-small-int inputs differ in the last ulp), so no
gated column ever carries a log — the gates hash doc ids, ranks, and
integer gram/count aggregates; weights stay internal ranking state whose
cross-engine gaps (>= 1e-3 between distinct documents) dwarf the ~1e-15
accumulated ulp noise, and the gate fails LOUDLY if that ever stops being
true. Ratios that ARE emitted (`dsir_bucket_stats.ratio`) are one division
of exact integer aggregates, which IEEE 754 rounds identically everywhere.

Reference scope note: the reference engine (Kafka Streams DSL, e.g.
Query5.java's per-key counts) has no corpus-selection surface; this module
is part of the training-data-pipeline extension the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..views import load, spread
from .text import tokens_col

N_BUCKETS = 256
TARGET_LANG = "en"
K_SELECT = 100
GUMBEL_SEED = 42


def _bigrams(text_col: str = "text") -> Column:
    """Word-bigram array (space-joined token pairs); empty for docs with
    fewer than two tokens. zip_with over the two shifted slices — never
    an indexed transform (ANSI element_at bounds checks; and the two-arg
    transform lambda receives the ARRAY INDEX, a known footgun)."""
    t = tokens_col(text_col)
    n = F.size(t)
    return F.when(n >= 2, F.zip_with(
        F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )).otherwise(F.array().cast("array<string>"))


def _bucket_of(gram: Column, n_buckets: int) -> Column:
    """Hashed-n-gram bucket id in [0, n_buckets): md5-derived so DuckDB
    re-derives the same id (see module docstring)."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets))


def _bucket_counts(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, cnt) over all word bigrams of ``docs`` — one map-side
    explode + a <= n_buckets-row shuffle (partial agg combines first)."""
    # no parallelism floor here (r15, measured): like text._word_counts,
    # the explode aggregates map-side to <= n_buckets rows, so the
    # narrow scan beats paying a full-text shuffle first (+0.25s at
    # sf0.1); the per-DOC scoring fold in _score_against DOES spread
    return (docs
            .select(F.explode(_bigrams()).alias("gram"))
            .select(_bucket_of(F.col("gram"), n_buckets).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def dsir_bucket_stats_df(docs: DataFrame,
                         target_lang: str = TARGET_LANG,
                         n_buckets: int = N_BUCKETS) -> DataFrame:
    """The two hashed-bigram bucket multinomials the DSIR weight is built
    from: per bucket, the TARGET gram count (docs with ``lang ==
    target_lang``), the RAW gram count (every other doc), and the
    Laplace-smoothed count ratio ``(ct+1)/(cr+1)`` — one division of
    exact integers, so bit-stable. Buckets unseen on one side surface
    with count 0 (full outer join + coalesce), never dropped."""
    ct = (_bucket_counts(docs.where(F.col("lang") == target_lang), n_buckets)
          .withColumnRenamed("cnt", "target_count"))
    cr = (_bucket_counts(docs.where(F.col("lang") != target_lang), n_buckets)
          .withColumnRenamed("cnt", "raw_count"))
    # both sides are <= n_buckets rows; broadcast keeps this shuffle-free
    joined = ct.join(F.broadcast(cr), "bucket", "full_outer")
    t = F.coalesce(F.col("target_count"), F.lit(0)).cast("long")
    r = F.coalesce(F.col("raw_count"), F.lit(0)).cast("long")
    return joined.select(
        "bucket",
        t.alias("target_count"),
        r.alias("raw_count"),
        ((t + F.lit(1)).cast("double") / (r + F.lit(1)).cast("double"))
        .alias("ratio"))


def dsir_bucket_stats(spark: SparkSession, sf_dir: str,
                      target_lang: str = TARGET_LANG,
                      n_buckets: int = N_BUCKETS) -> DataFrame:
    return dsir_bucket_stats_df(load(spark, sf_dir, "documents"),
                                target_lang, n_buckets)


def _maps_from_rows(rows: list, n_buckets: int
                    ) -> tuple[Column, Column, int, int]:
    """Densified bucket->count map literals (mt, mr) plus the total gram
    masses (Nt, Nr) from collected bucket-stats rows. Densifying to ALL
    bucket ids keeps ANSI ``element_at`` total (no missing-key error)."""
    ct = {r["bucket"]: r["target_count"] for r in rows}
    cr = {r["bucket"]: r["raw_count"] for r in rows}
    keys = list(range(n_buckets))
    mt = F.map_from_arrays(
        F.lit(keys).cast("array<bigint>"),
        F.lit([ct.get(b, 0) for b in keys]).cast("array<bigint>"))
    mr = F.map_from_arrays(
        F.lit(keys).cast("array<bigint>"),
        F.lit([cr.get(b, 0) for b in keys]).cast("array<bigint>"))
    return mt, mr, sum(ct.values()), sum(cr.values())


def _score_against(docs: DataFrame, stats_rows: list,
                   n_buckets: int) -> DataFrame:
    """Score EVERY row of ``docs`` against the given bucket stats: one
    F.aggregate fold per doc over its bucket-id array against the
    broadcast map literals — no join, no shuffle, codegen throughout.
    The stats rows are contract-bounded driver state (<= n_buckets) —
    the IVF-centroid rule."""
    mt, mr, n_t, n_r = _maps_from_rows(stats_rows, n_buckets)
    # parallelism floor (r15): the per-gram md5 bucket transform +
    # array_sort + 4-field struct fold is heavy row-local CPU off a
    # possibly single-file scan
    docs = spread(docs)
    buckets = F.transform(_bigrams(),
                          lambda g: _bucket_of(g, n_buckets))
    # normalizer term of the smoothed multinomial ratio, constant per gram
    z = F.lit(float(0)) + (F.log(F.lit(float(n_r + n_buckets)))
                           - F.log(F.lit(float(n_t + n_buckets))))
    # fold over the SORTED bucket array (ADVICE r13, oracles.py logw
    # note — closed r15): sorting makes _logw a pure function of the
    # doc's bucket-count MULTISET, exactly like the oracle's
    # bucket-ordered list_aggregate fold — two docs with equal
    # multisets but different gram order now tie BIT-EXACTLY in both
    # engines and fall through to the doc_id tiebreak together,
    # closing the one residual cross-engine top-k ordering hazard on
    # this never-emitted float. The integer sums are order-free; the
    # sort is one row-local pass per doc.
    folded = F.aggregate(
        F.array_sort(F.col("_buckets")),
        F.struct(F.lit(0).cast("long").alias("n"),
                 F.lit(0).cast("long").alias("st"),
                 F.lit(0).cast("long").alias("sr"),
                 F.lit(0.0).alias("w")),
        lambda acc, b: F.struct(
            (acc["n"] + 1).alias("n"),
            (acc["st"] + F.element_at(mt, b)).alias("st"),
            (acc["sr"] + F.element_at(mr, b)).alias("sr"),
            (acc["w"]
             + F.log((F.element_at(mt, b) + F.lit(1)).cast("double")
                     / (F.element_at(mr, b) + F.lit(1)).cast("double"))
             + z).alias("w")))
    return (docs
            .withColumn("_buckets", buckets)
            .withColumn("_f", folded)
            .select("doc_id", "lang",
                    F.col("_f.n").alias("n_grams"),
                    F.col("_f.st").alias("sum_target_count"),
                    F.col("_f.sr").alias("sum_raw_count"),
                    F.col("_f.w").alias("_logw")))


def _scored_candidates(docs_all: DataFrame,
                       target_lang: str, n_buckets: int) -> DataFrame:
    """Candidate (non-target) docs of ONE corpus scored against that
    corpus's own bucket stats — the single-corpus selection path."""
    rows = dsir_bucket_stats_df(docs_all, target_lang, n_buckets).collect()
    return _score_against(docs_all.where(F.col("lang") != target_lang),
                          rows, n_buckets)


_TAKE_ORDERED_MAX = 1_000_000


def _ranked(scored: DataFrame, key: Column, k: int) -> DataFrame:
    """Top-``k`` by (key desc, doc_id asc) with a 1-based rank column.
    TakeOrderedAndProject first (per-partition heaps, no global sort);
    the row_number window then runs over k rows only.

    For huge ``k`` (rank-everyone asks) the limit path is a trap:
    TakeOrderedAndProject allocates an O(limit) buffer PER TASK, so a
    k=1e9 request over an N-partition scoring stage tries N concurrent
    multi-GB heaps and OOMs (observed at local[32] the moment the
    scoring stage gained a parallelism floor). Past
    ``_TAKE_ORDERED_MAX`` we rank through the global sort + row_number
    window and filter rank <= k — identical rows, per-task memory
    O(partition) instead of O(k)."""
    base = scored.withColumn("_key", key)
    w = Window.orderBy(F.col("_key").desc(), F.col("doc_id").asc())
    if k <= _TAKE_ORDERED_MAX:
        ranked = (base
                  .orderBy(F.col("_key").desc(), F.col("doc_id").asc())
                  .limit(k)
                  .withColumn("rank", F.row_number().over(w)))
    else:
        ranked = (base.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))
    return ranked.select("doc_id", "lang", "rank", "n_grams",
                         "sum_target_count", "sum_raw_count")


def dsir_persist_stats(stats_df: DataFrame, path: str) -> None:
    """Persist a bucket-stats table as the reusable DSIR scorer state —
    the production handoff: stats are trained once on a fixed
    target/raw snapshot, then every future crawl increment is scored
    against the STORED table without touching the original corpora
    (the stored-IVF-index pattern applied to DSIR)."""
    stats_df.write.mode("overwrite").parquet(path)


def dsir_score_increment_df(new_docs: DataFrame, stats: DataFrame,
                            n_buckets: int = N_BUCKETS,
                            k: int = K_SELECT) -> DataFrame:
    """Score a NEW document increment against a persisted stats table
    and keep the top-``k``: every increment row is a candidate (no lang
    exclusion — the increment was not part of the stats corpora).
    Per-increment cost is one fold per doc; the stats read is
    <= n_buckets rows regardless of how big the original corpora were."""
    rows = stats.collect()
    return _ranked(_score_against(new_docs, rows, n_buckets),
                   F.col("_logw"), k)


def dsir_select_increment(spark: SparkSession, sf_dir: str,
                          n_buckets: int = N_BUCKETS,
                          k: int = 50) -> DataFrame:
    """Driver-gate fixture (full hash): the incremental production
    shape end to end — train bucket stats on the EVEN-doc_id half of
    the corpus (target = its 'en' docs), persist them to a parquet
    stats store and read them back, then score the ODD half as the
    arriving increment and keep the top-50. The oracle re-derives the
    even-half stats and the odd-half scores directly."""
    import shutil
    import tempfile

    if (n_buckets, k) != (N_BUCKETS, 50):
        raise ValueError(
            f"dsir_select_increment oracle pins (n_buckets, k)="
            f"({N_BUCKETS}, 50); got {(n_buckets, k)} — use "
            f"dsir_score_increment_df directly for other settings")
    docs = load(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 2 == 0)
    inc = docs.where(F.col("doc_id") % 2 == 1)
    workdir = tempfile.mkdtemp(prefix="dsir_stats_")
    try:
        dsir_persist_stats(dsir_bucket_stats_df(base, TARGET_LANG,
                                                n_buckets),
                           workdir)
        stats = spark.read.parquet(workdir)
        # materialize driver-side before the tempdir vanishes
        out = dsir_score_increment_df(inc, stats, n_buckets, k)
        rows = out.collect()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def dsir_select_df(docs: DataFrame,
                   target_lang: str = TARGET_LANG,
                   n_buckets: int = N_BUCKETS,
                   k: int = K_SELECT) -> DataFrame:
    """Deterministic DSIR selection: the top-``k`` candidate docs by
    importance weight (ties broken by doc_id). Emitted columns are the
    hash-stable ones — rank + integer gram aggregates; the float weight
    stays internal (module docstring, float discipline)."""
    scored = _scored_candidates(docs, target_lang, n_buckets)
    return _ranked(scored, F.col("_logw"), k)


def dsir_select(spark: SparkSession, sf_dir: str,
                target_lang: str = TARGET_LANG,
                n_buckets: int = N_BUCKETS,
                k: int = K_SELECT) -> DataFrame:
    return dsir_select_df(load(spark, sf_dir, "documents"),
                          target_lang, n_buckets, k)


def dsir_resample_gumbel(spark: SparkSession, sf_dir: str,
                         target_lang: str = TARGET_LANG,
                         n_buckets: int = N_BUCKETS,
                         k: int = K_SELECT,
                         seed: int = GUMBEL_SEED) -> DataFrame:
    """The paper's actual resampling rule: sample ``k`` docs WITHOUT
    replacement proportionally to w(d) via the Gumbel-top-k trick —
    rank by ``log w(d) + Gumbel(0,1)`` where the Gumbel noise is a PURE
    FUNCTION of (doc_id, seed): u = (md5-derived 24-bit int + 0.5) / 2^24,
    g = -ln(-ln(u)). Deterministic given the seed, so the driver gate is
    a full hash (the oracle re-derives the same noise); emitted columns
    stay integer/rank-only per the module's float discipline."""
    scored = _scored_candidates(
        load(spark, sf_dir, "documents"), target_lang, n_buckets)
    u = ((F.conv(F.substring(
            F.md5(F.concat_ws("#", F.col("doc_id"), F.lit(seed))), 1, 6),
            16, 10).cast("long").cast("double") + F.lit(0.5))
         / F.lit(float(1 << 24)))
    return _ranked(scored, F.col("_logw") - F.log(-F.log(u)), k)


# --- pin-guarded registry wrappers (oracles embed the defaults) ---------

def _pin(name: str, got: tuple, pinned: tuple) -> None:
    if got != pinned:
        raise ValueError(
            f"{name} oracle pins {pinned}; got {got} — call the "
            f"unpinned operator directly for other settings")


def dsir_bucket_stats_gate(spark: SparkSession, sf_dir: str,
                           target_lang: str = TARGET_LANG,
                           n_buckets: int = N_BUCKETS) -> DataFrame:
    _pin("dsir_bucket_stats", (target_lang, n_buckets),
         (TARGET_LANG, N_BUCKETS))
    return dsir_bucket_stats(spark, sf_dir, target_lang, n_buckets)


def dsir_select_gate(spark: SparkSession, sf_dir: str,
                     target_lang: str = TARGET_LANG,
                     n_buckets: int = N_BUCKETS,
                     k: int = K_SELECT) -> DataFrame:
    _pin("dsir_select", (target_lang, n_buckets, k),
         (TARGET_LANG, N_BUCKETS, K_SELECT))
    return dsir_select(spark, sf_dir, target_lang, n_buckets, k)


def dsir_resample_gumbel_gate(spark: SparkSession, sf_dir: str,
                              target_lang: str = TARGET_LANG,
                              n_buckets: int = N_BUCKETS,
                              k: int = K_SELECT,
                              seed: int = GUMBEL_SEED) -> DataFrame:
    _pin("dsir_resample_gumbel", (target_lang, n_buckets, k, seed),
         (TARGET_LANG, N_BUCKETS, K_SELECT, GUMBEL_SEED))
    return dsir_resample_gumbel(spark, sf_dir, target_lang, n_buckets,
                                k, seed)
