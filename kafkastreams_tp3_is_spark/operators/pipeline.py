"""End-to-end training-corpus cleaning: the composition a real data
pipeline runs before tokenization — exact dedup, quality floor, language
confirmation — expressed as one declarative DataFrame flow so Catalyst
fuses the per-document signals into a single scan + one dedup shuffle.

Keep rules (deliberately simple, all oracle-expressible):
  - exact-duplicate groups keep only the lowest doc_id (md5 groups);
  - quality floor: >= 10 tokens and punctuation ratio <= 0.25;
  - language confirmed: the stopword-marker prediction matches the
    labeled lang (or is 'und' — don't drop short ambiguous docs).

Output: (doc_id, n_tokens, lang) of surviving documents — the cleaned
corpus manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..views import load
from .text import _LANG_MARKERS, _PUNCT, tokens_col


def corpus_clean(spark: SparkSession, sf_dir: str,
                 min_tokens: int = 10,
                 max_punct_ratio: float = 0.25) -> DataFrame:
    """Cleaned-corpus manifest. One scan computes all per-doc signals
    (narrow map); the only shuffle is the md5 dedup groupBy; the keep-list
    join is aggregate-sized per text group."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens_col()
    n_tok = F.size(toks).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(_PUNCT), 0)).cast("bigint")
    lowered = F.transform(toks, lambda x: F.lower(x))

    def hits(words: list[str]) -> F.Column:
        return F.size(F.filter(lowered, lambda x: x.isin(*words))).cast("bigint")

    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("bigint")
    for lang in sorted(_LANG_MARKERS, reverse=True):
        h = hits(_LANG_MARKERS[lang])
        cond = (h >= best_hits) & (h > 0)
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, h).otherwise(best_hits)

    scored = docs.select(
        "doc_id", "lang", "text",
        n_tok.alias("n_tokens"),
        F.when(n_chars == 0, F.lit(0.0))
         .otherwise(n_punct.cast("double") / n_chars.cast("double")).alias("punct_ratio"),
        best_lang.alias("lang_pred"),
    )
    keep = (docs.groupBy(F.md5("text").alias("text_md5"))
                .agg(F.min("doc_id").alias("keep_doc_id")))
    return (scored
            .join(keep, F.md5(scored["text"]) == keep["text_md5"])
            .where((F.col("doc_id") == F.col("keep_doc_id"))
                   & (F.col("n_tokens") >= min_tokens)
                   & (F.col("punct_ratio") <= max_punct_ratio)
                   & ((F.col("lang_pred") == F.col("lang"))
                      | (F.col("lang_pred") == "und")))
            .select("doc_id", "n_tokens", "lang"))
