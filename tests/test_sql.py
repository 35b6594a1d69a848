"""SQL-surface parity: every Q1-Q13 Spark-SQL statement (sql.py) must
produce exactly the rows of its DataFrame implementation (queries.py).
Catalyst compiles both to plans over the same scans, so any divergence is
a semantics bug in one of the two surfaces."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from kafkastreams_tp3_is_spark.sql import QUERY_SQL, register_views, run_sql
from tests.conftest import SF_DIR


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect()), cols


@pytest.mark.parametrize("name", sorted(QUERY_SQL))
def test_sql_matches_dataframe_impl(spark, name):
    sql_rows, sql_cols = _rows(run_sql(spark, SF_DIR, name))
    df_rows, df_cols = _rows(entry.queries()[name](spark, SF_DIR))
    assert sql_cols == df_cols
    assert sql_rows == df_rows


def test_adhoc_sql_over_registered_views(spark):
    register_views(spark, SF_DIR)
    n_routes = spark.sql("SELECT COUNT(*) AS n FROM routes").collect()[0]["n"]
    n_orders = spark.sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
    assert n_routes == n_orders > 0
    top = spark.sql("""
        SELECT transport_type, COUNT(*) AS n FROM trips
        GROUP BY transport_type ORDER BY n DESC, transport_type LIMIT 1
    """).collect()
    assert len(top) == 1 and top[0]["n"] > 0


def test_register_operator_views_enables_adhoc_joins(spark):
    """Operator outputs as SQL views: an ad-hoc query joining tfidf
    against corpus_stats must run and agree with the DataFrame result;
    an unknown view name must fail fast."""
    import pytest

    from kafkastreams_tp3_is_spark.operators.retrieval import tfidf_topk
    from kafkastreams_tp3_is_spark.sql import register_operator_views
    from tests.conftest import SF_DIR

    register_operator_views(spark, SF_DIR, ["tfidf_topk", "corpus_stats"])
    out = spark.sql("""
        SELECT t.doc_id, t.term, t.tfidf
        FROM tfidf_topk t
        WHERE t.rnk = 1
        ORDER BY t.doc_id
    """).collect()
    want = sorted(
        ((r["doc_id"], r["term"], r["tfidf"])
         for r in tfidf_topk(spark, SF_DIR).collect() if r["rnk"] == 1))
    assert [(r["doc_id"], r["term"], r["tfidf"]) for r in out] == want
    joined = spark.sql("""
        SELECT COUNT(*) AS n FROM tfidf_topk t
        JOIN corpus_stats s ON s.n_docs > 0
    """).collect()[0]["n"]
    assert joined > 0
    with pytest.raises(ValueError, match="unknown operator views"):
        register_operator_views(spark, SF_DIR, ["nope"])


def test_round5_operators_reachable_as_sql_views(spark):
    """SQL parity for the round-5/6 additions: each registers as a temp
    view and answers an ad-hoc aggregate consistent with a known
    invariant of the operator (not just COUNT(*) > 0)."""
    from kafkastreams_tp3_is_spark import cache
    from kafkastreams_tp3_is_spark.sql import register_operator_views
    from tests.conftest import SF_DIR

    frames = register_operator_views(
        spark, SF_DIR,
        ["paragraph_dedup", "decontaminate_spans", "events_funnel",
         "vocab_drift", "corpus_diff", "pack_efficiency",
         "decontaminate_spans_bloom", "media_dhash_pairs"])

    def one(q):
        return spark.sql(q).collect()[0][0]

    # paragraph dedup: every document survives with n_dropped <= n_blocks
    assert one("SELECT COUNT(*) FROM paragraph_dedup "
               "WHERE n_dropped > n_blocks") == 0
    assert one("SELECT COUNT(*) FROM paragraph_dedup") > 0
    # span decontamination: flag agrees with the count, and the Bloom
    # twin view returns the identical aggregate
    assert one("SELECT COUNT(*) FROM decontaminate_spans "
               "WHERE span_contaminated <> (n_bench_spans >= 1)") == 0
    assert one("SELECT SUM(n_bench_spans) FROM decontaminate_spans") == \
        one("SELECT SUM(n_bench_spans) FROM decontaminate_spans_bloom")
    # funnel: sequential-min ordering — a reached step strictly follows
    # its predecessor
    assert one("SELECT COUNT(*) FROM events_funnel "
               "WHERE t_click_us >= 0 "
               "AND (t_view_us < 0 OR t_click_us <= t_view_us)") == 0
    assert one("SELECT COUNT(*) FROM events_funnel "
               "WHERE steps_completed NOT BETWEEN 0 AND 3") == 0
    # vocab drift: delta is exactly the count difference, top-n bounded
    assert one("SELECT COUNT(*) FROM vocab_drift "
               "WHERE delta <> cnt_new - cnt_old") == 0
    assert 0 < one("SELECT COUNT(*) FROM vocab_drift") <= 100
    # corpus diff: statuses partition the id space
    assert one("SELECT COUNT(*) FROM corpus_diff WHERE status NOT IN "
               "('added','removed','changed','unchanged')") == 0
    # pack efficiency: waste consistent with the ceil-div pack count
    assert one("SELECT COUNT(*) FROM pack_efficiency "
               "WHERE waste_tokens <> n_packs * 2048 - total_tokens") == 0
    # dHash pairs: inside the guarantee radius
    assert one("SELECT COUNT(*) FROM media_dhash_pairs "
               "WHERE hamming > 3") == 0
    assert one("SELECT COUNT(*) FROM media_dhash_pairs") > 0
    for df in frames.values():
        cache.release(df)


def test_round6_7_operators_reachable_as_sql_views(spark):
    """SQL smoke for the round-6 additions (VERDICT r6 Next #9) plus the
    round-7 newcomers: each registers through the generic view path and
    answers an ad-hoc aggregate consistent with a known invariant of the
    operator — not just COUNT(*) > 0."""
    from kafkastreams_tp3_is_spark.sql import register_operator_views
    from tests.conftest import SF_DIR

    register_operator_views(
        spark, SF_DIR,
        ["materialize_mixture", "events_value_quantiles_exact",
         "ann_cosine_topk_sq8", "source_overlap_matrix",
         "key_skew_profile",
         "ngram_lm_score", "domain_mixture_report", "dedup_suffix_prefix"])

    def one(q):
        return spark.sql(q).collect()[0][0]

    # materialized mixture: every emitted copy number is valid
    # (1-based within its doc's n_copies)
    assert one("SELECT COUNT(*) FROM materialize_mixture "
               "WHERE copy < 0 OR copy > n_copies") == 0
    assert one("SELECT COUNT(*) FROM materialize_mixture") > 0
    # exact quantiles: nearest-rank values are monotone in the quantile
    assert one("SELECT COUNT(*) FROM ("
               "SELECT event_type, quantile, value, "
               "LAG(value) OVER (PARTITION BY event_type "
               "ORDER BY quantile) p "
               "FROM events_value_quantiles_exact) WHERE p > value") == 0
    # sq8 ANN: ranks are 1..k dense per query
    assert one("SELECT COUNT(*) FROM (SELECT query_id, COUNT(*) n, "
               "MAX(rank) mx, MIN(rank) mn FROM ann_cosine_topk_sq8 "
               "GROUP BY query_id) WHERE n <> mx OR mn <> 1") == 0
    # overlap matrix: unordered pairs only, strictly positive counts
    assert one("SELECT COUNT(*) FROM source_overlap_matrix "
               "WHERE source_a > source_b OR n_dup_pairs <= 0") == 0
    # skew profile: shares in (0,1], top rows ordered by share desc
    assert one("SELECT COUNT(*) FROM key_skew_profile "
               "WHERE share <= 0 OR share > 1") == 0
    # LM familiarity: familiar <= total bigrams and the ratio is exact
    assert one("SELECT COUNT(*) FROM ngram_lm_score WHERE "
               "n_familiar > n_bigrams OR familiarity < 0 "
               "OR familiarity > 1") == 0
    assert one("SELECT COUNT(*) FROM ngram_lm_score WHERE n_bigrams > 0 "
               "AND familiarity <> CAST(n_familiar AS DOUBLE) / n_bigrams"
               ) == 0
    # mixture report: shares sum to 1 (exact integer mass over one total)
    assert abs(one("SELECT SUM(token_share) FROM domain_mixture_report")
               - 1.0) < 1e-9
    assert one("SELECT COUNT(*) FROM domain_mixture_report "
               "WHERE n_distinct_texts > n_docs") == 0
    # suffix/prefix continuation: every planted (doc, doc+1e6) pair is
    # recovered, and boundaries are exactly 40 chars
    assert one("SELECT COUNT(*) FROM dedup_suffix_prefix "
               "WHERE length(boundary) <> 40") == 0
    # eligibility mirrors the fixture: a planted boundary needs
    # length(text) >= 40 (page A must pass the operator's k-filter)
    assert one("SELECT COUNT(*) FROM dedup_suffix_prefix "
               "WHERE next_id = prev_id + 1000000") == \
        one("SELECT COUNT(DISTINCT doc_id) FROM parquet.`"
            f"{SF_DIR}/documents.parquet` WHERE length(text) >= 40")


def test_round7_operators_reachable_as_sql_views(spark):
    """SQL smoke for the round-7 session-2 additions through the same
    generic view path, each checked against an operator invariant."""
    from kafkastreams_tp3_is_spark.sql import register_operator_views
    from tests.conftest import SF_DIR

    register_operator_views(
        spark, SF_DIR,
        ["containment_pairs", "contrastive_triplets", "select_token_budget",
         "embedding_gram_sq8", "bpe_train"])

    def one(q):
        return spark.sql(q).collect()[0][0]

    # containment: score is a valid fraction and pairs are asymmetric
    # (contained side recorded as such)
    assert one("SELECT COUNT(*) FROM containment_pairs "
               "WHERE containment < 0 OR containment > 1") == 0
    # triplets: negatives are never more similar than the positive and
    # neg_rank is a valid 1-based band index
    assert one("SELECT COUNT(*) FROM contrastive_triplets "
               "WHERE neg_cosine > pos_cosine OR neg_rank < 1") == 0
    # budget selection: verdict for EVERY document, never null
    assert one("SELECT COUNT(*) FROM select_token_budget "
               "WHERE selected IS NULL") == 0
    assert one("SELECT COUNT(*) FROM select_token_budget") == \
        one(f"SELECT COUNT(*) FROM parquet.`{SF_DIR}/documents.parquet`")
    # gram triangle: i <= j, diagonal non-negative, one n_vecs value
    assert one("SELECT COUNT(*) FROM embedding_gram_sq8 WHERE i > j") == 0
    assert one("SELECT COUNT(*) FROM embedding_gram_sq8 "
               "WHERE i = j AND gram < 0") == 0
    assert one("SELECT COUNT(DISTINCT n_vecs) FROM embedding_gram_sq8") == 1
    # BPE merges: rounds are dense 1..n and merged = left || right
    assert one("SELECT COUNT(*) FROM bpe_train "
               "WHERE merged <> CONCAT(left, right)") == 0
    assert one("SELECT MAX(round) - COUNT(*) FROM bpe_train") == 0
