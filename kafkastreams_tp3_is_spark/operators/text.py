"""Text-analysis operators for a large-scale training-data pipeline, over the
``documents`` table (doc_id, text, lang, source, n_chars).

All hot-path expressions are built-in pyspark.sql.functions — JVM-side
throughout, never a Python worker (higher-order array expressions like the
fingerprint's aggregate run interpreted in the JVM, outside whole-stage
codegen; the scalar paths codegen fully). Everything is a narrow per-row
map — no shuffle — so it scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..views import load

# Small per-language stopword marker sets for the n-gram-free heuristic
# language id. Deliberately tiny and deterministic.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "dans"],
    "es": ["el", "la", "los", "es", "una", "que", "por", "con"],
}

_PUNCT = r"[.,!?;:'\"()\[\]{}-]"


def tokens_col(text_col: str = "text") -> F.Column:
    """Whitespace tokenization with empty-token filtering (deterministic,
    matches the oracle's regexp split)."""
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token count per document: whitespace tokens + a BPE-ish proxy count
    (4 chars/token heuristic over non-space chars)."""
    docs = load(spark, sf_dir, "documents")
    nonspace = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    return docs.select(
        "doc_id",
        F.size(tokens_col()).cast("bigint").alias("n_tokens"),
        F.ceil(nonspace.cast("double") / 4.0).cast("bigint").alias("n_tokens_bpe_est"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: mean word length, punctuation ratio,
    stopword(en) ratio, and a composite score. Ratios are single divisions of
    exact integer counts (bit-reproducible vs the SQL oracle)."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens_col()
    n_tok = F.size(toks).cast("bigint")
    n_chars = F.length(F.col("text")).cast("bigint")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(_PUNCT), 0)).cast("bigint")
    n_stop = F.size(F.filter(F.transform(toks, lambda x: F.lower(x)),
                             lambda x: x.isin(*[w for w in _LANG_MARKERS["en"]]))).cast("bigint")
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.when(n_tok == 0, F.lit(0.0))
         .otherwise(n_chars.cast("double") / n_tok.cast("double")).alias("mean_word_len"),
        F.when(n_chars == 0, F.lit(0.0))
         .otherwise(n_punct.cast("double") / n_chars.cast("double")).alias("punct_ratio"),
        F.when(n_tok == 0, F.lit(0.0))
         .otherwise(n_stop.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language id over {en,de,fr,es}: the language whose
    marker set hits the most tokens wins; 'und' (undetermined) when no
    marker hits. Tie-break: language code ascending."""
    docs = load(spark, sf_dir, "documents")
    lowered = F.transform(tokens_col(), lambda x: F.lower(x))
    def _marker_hits(words: list[str]) -> F.Column:
        return F.size(F.filter(lowered, lambda x: x.isin(*words))).cast("bigint")

    hits = {lang: _marker_hits(words) for lang, words in _LANG_MARKERS.items()}
    # argmax over a fixed tiny set of columns, expressed as a when-chain:
    # deterministic, codegen-friendly, no UDF. Iterating in reverse-sorted
    # order with >= means the lexicographically smallest language wins ties.
    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("bigint")
    for lang in sorted(_LANG_MARKERS, reverse=True):
        h = hits[lang]
        cond = (h >= best_hits) & (h > 0)
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, h).otherwise(best_hits)
    return docs.select("doc_id", F.col("lang").alias("lang_true"),
                       best_lang.alias("lang_pred"))


def vocab_top_tokens(spark: SparkSession, sf_dir: str,
                     k: int = 100) -> DataFrame:
    """Corpus-level vocabulary: the ``k`` most frequent whitespace tokens
    with occurrence counts and ranks (count desc, token asc — fully
    deterministic). The counting stage of tokenizer training (BPE/WordPiece
    vocabularies start from exactly this corpus-frequency table).

    Scale: explode + one map-side-combined hash agg — the shuffle carries
    one (token, partial_count) row per distinct token per partition, not
    the exploded occurrences; the global top-k over the aggregated vocab
    compiles to TakeOrderedAndProject (no single-partition sort of the
    full vocabulary)."""
    docs = load(spark, sf_dir, "documents")
    counts = (docs.select(F.explode(tokens_col()).alias("token"))
                  .groupBy("token")
                  .agg(F.count(F.lit(1)).alias("n_occurrences")))
    top = (counts.orderBy(F.col("n_occurrences").desc(),
                          F.col("token").asc())
                 .limit(k))
    return top.select(
        "token", "n_occurrences",
        F.row_number().over(
            Window.orderBy(F.col("n_occurrences").desc(),
                           F.col("token").asc())).alias("rank"))


FP_BASE = 31
FP_MOD = 1 << 40  # keeps acc*31 + codepoint < 2^45, no BIGINT overflow


def fingerprint_col(text_col: str = "text") -> F.Column:
    """Polynomial rolling hash (base 31, mod 2^40) over the document's
    codepoints — pure JVM expressions (split + aggregate + ascii), fully
    codegen'd, no Python in the hot path. Matches the DuckDB list_reduce
    oracle bit-for-bit."""
    chars = F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * FP_BASE + F.ascii(c), F.lit(FP_MOD)),
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint per document (rolling hash), hash-checked against
    the DuckDB oracle. A narrow per-row map: no shuffle, linear scale-out."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_col("text").alias("fingerprint"))


# --- repetition signals (Gopher-style quality filters) -----------------

def _top_gram_frac(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, top_frac): frequency share of the most common word n-gram
    = max n-gram count / (n_tokens - n + 1). Grams are hashed to 64-bit
    longs inside the gram-building transform (xxhash64 over the n member
    tokens) so only 8-byte keys ever reach the shuffle — the same
    hash-first discipline as dedup.py's shingles; a collision could only
    perturb one doc's max count and is negligible at 2^-64.

    Scale: explode -> (doc_id, gram-hash) map-side-combined count ->
    per-doc max. Both aggregates shuffle aggregate-sized rows keyed by
    doc_id; nothing quadratic, no strings past the scan."""
    toks = tokens_col()
    n_tok = F.size(toks)
    grams = F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(1), n_tok - (n - 1)),
            lambda i: F.xxhash64(*[F.element_at(toks, i + j)
                                   for j in range(n)]))
    ).otherwise(F.array().cast("array<bigint>"))
    ex = docs.select("doc_id", F.explode(grams).alias("g"))
    per = ex.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    return (per.groupBy("doc_id")
            .agg(F.max("c").alias("m"), F.sum("c").alias("total"))
            .select("doc_id",
                    (F.col("m").cast("double")
                     / F.col("total").cast("double")).alias("top_frac")))


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition statistics, the Gopher-family quality
    filters (Rae et al. 2021, appendix A — public heuristics) restated
    for a corpus without line structure:

      dup_token_frac   1 - distinct/total whitespace tokens (row-local,
                       no shuffle: array_distinct inside the projection)
      top_2gram_frac   frequency share of the most common word bigram
      top_3gram_frac   ... trigram

    Ratios are single divisions of exact integer counts, so the DuckDB
    oracle is bit-identical. Zero/short docs yield 0.0 by guard."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens_col()
    n_tok = F.size(toks).cast("bigint")
    n_dis = F.size(F.array_distinct(toks)).cast("bigint")
    base = docs.select(
        "doc_id", n_tok.alias("n"), n_dis.alias("nd"))
    g2 = _top_gram_frac(docs, 2).withColumnRenamed("top_frac", "f2")
    g3 = _top_gram_frac(docs, 3).withColumnRenamed("top_frac", "f3")
    out = (base.join(g2, "doc_id", "left").join(g3, "doc_id", "left")
           .select(
               "doc_id",
               F.col("n").alias("n_tokens"),
               F.when(F.col("n") == 0, F.lit(0.0))
                .otherwise((F.col("n") - F.col("nd")).cast("double")
                           / F.col("n").cast("double"))
                .alias("dup_token_frac"),
               F.coalesce(F.col("f2"), F.lit(0.0)).alias("top_2gram_frac"),
               F.coalesce(F.col("f3"), F.lit(0.0)).alias("top_3gram_frac")))
    return out


def quality_filter(spark: SparkSession, sf_dir: str,
                   min_tokens: int = 15,
                   max_mean_word_len: float = 5.9,
                   max_top_2gram_frac: float = 0.08) -> DataFrame:
    """C4/Gopher-style document filter verdicts: each rule as an explicit
    boolean flag plus the composite ``kept`` — the shape a curation
    pipeline audits (why was this doc dropped?) rather than a bare
    filter. Thresholds are corpus-tuned so the gate exercises both
    branches of every flag. Narrow maps + the repetition aggregates;
    everything integer-exact or single-division."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens_col()
    n_tok = F.size(toks).cast("bigint")
    n_chars = F.length(F.col("text")).cast("bigint")
    mean_wl = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        n_chars.cast("double") / n_tok.cast("double"))
    rep = repetition_signals(spark, sf_dir).select("doc_id",
                                                   "top_2gram_frac")
    flags = (docs.select("doc_id",
                         (n_tok < min_tokens).alias("flag_too_short"),
                         (mean_wl > max_mean_word_len)
                         .alias("flag_long_words"))
             .join(rep, "doc_id")
             .withColumn("flag_repetitive",
                         F.col("top_2gram_frac") > max_top_2gram_frac))
    return flags.select(
        "doc_id", "flag_too_short", "flag_long_words", "flag_repetitive",
        (~(F.col("flag_too_short") | F.col("flag_long_words")
           | F.col("flag_repetitive"))).alias("kept"))
