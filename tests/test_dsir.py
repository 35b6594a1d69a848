"""DSIR importance resampling (operators/dsir.py) — properties the hash
gates can't see: selection actually prefers target-like documents,
integer aggregates are internally consistent, the Gumbel rule is a real
resample (not the argmax list in disguise), and the score stage stays
join- and shuffle-free."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafkastreams_tp3_is_spark.operators import dsir
from tests.conftest import SF_DIR


def test_bucket_stats_shape_and_ratio(spark):
    rows = dsir.dsir_bucket_stats(spark, SF_DIR).collect()
    assert 0 < len(rows) <= dsir.N_BUCKETS
    assert len({r["bucket"] for r in rows}) == len(rows)
    for r in rows:
        assert 0 <= r["bucket"] < dsir.N_BUCKETS
        assert r["target_count"] >= 0 and r["raw_count"] >= 0
        assert r["target_count"] + r["raw_count"] > 0  # never both absent
        assert r["ratio"] == (r["target_count"] + 1) / (r["raw_count"] + 1)


def test_select_consistent_aggregates(spark):
    """n_grams must equal the doc's real bigram count and the count sums
    must be reproducible from the stats table — the fold and the
    broadcast maps agree with the distributional ground truth."""
    stats = {r["bucket"]: (r["target_count"], r["raw_count"])
             for r in dsir.dsir_bucket_stats(spark, SF_DIR).collect()}
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()}
    sel = dsir.dsir_select(spark, SF_DIR).collect()
    assert [r["rank"] for r in sel] == list(range(1, len(sel) + 1))
    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % dsir.N_BUCKETS

    for r in sel[:20]:
        toks = [t for t in docs[r["doc_id"]].split() if t]
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        assert r["n_grams"] == len(grams)
        st = sum(stats.get(bucket(g), (0, 0))[0] for g in grams)
        sr = sum(stats.get(bucket(g), (0, 0))[1] for g in grams)
        assert (r["sum_target_count"], r["sum_raw_count"]) == (st, sr)


def test_select_prefers_target_like_docs(spark):
    """The mean per-gram log-ratio of the selected head must exceed the
    non-selected candidates' — DSIR picks docs whose hashed-bigram
    distribution looks like the target corpus."""
    stats = {r["bucket"]: (r["target_count"], r["raw_count"])
             for r in dsir.dsir_bucket_stats(spark, SF_DIR).collect()}
    nt = sum(v[0] for v in stats.values())
    nr = sum(v[1] for v in stats.values())
    z = math.log(nr + dsir.N_BUCKETS) - math.log(nt + dsir.N_BUCKETS)

    def mean_logratio(rows):
        tot, n = 0.0, 0
        for r in rows:
            if r["n_grams"] == 0:
                continue
            # coarse per-doc proxy from the gated integer sums
            tot += (math.log((r["sum_target_count"] / r["n_grams"]) + 1)
                    - math.log((r["sum_raw_count"] / r["n_grams"]) + 1) + z)
            n += 1
        return tot / n

    k = dsir.K_SELECT
    all_ranked = dsir.dsir_select(spark, SF_DIR,
                                  k=10 ** 9)  # rank everyone
    head = [r for r in all_ranked.collect() if r["rank"] <= k]
    tail = [r for r in all_ranked.collect() if r["rank"] > k]
    assert len(head) > 0 and len(tail) > 0
    assert mean_logratio(head) > mean_logratio(tail)


def test_gumbel_is_seeded_and_differs_from_argmax(spark):
    sel = [r["doc_id"] for r in dsir.dsir_select(spark, SF_DIR).collect()]
    g1 = [r["doc_id"] for r in
          dsir.dsir_resample_gumbel(spark, SF_DIR).collect()]
    g2 = [r["doc_id"] for r in
          dsir.dsir_resample_gumbel(spark, SF_DIR).collect()]
    g7 = [r["doc_id"] for r in
          dsir.dsir_resample_gumbel(spark, SF_DIR, seed=7).collect()]
    assert g1 == g2, "same seed must replay the same sample"
    assert g1 != g7, "different seeds must differ"
    assert g1 != sel, "noise must actually perturb the argmax ranking"
    # stochastic but importance-BIASED: most of the sample overlaps the
    # deterministic head at sf0.001 corpus sizes
    assert len(set(g1) & set(sel)) >= len(sel) // 2


def test_score_stage_is_join_free(spark):
    """The per-doc scorer must be map literals + one aggregate fold —
    no join, and no shuffle OF THE STATS, in the plan before the top-k
    (the 100 TB design: bucket stats ride broadcast-free as literals).
    The one exchange allowed is the r15 spread() parallelism floor — a
    scale-adaptive hash repartition of the DOCS on doc_id (skipped when
    the scan already carries cluster parallelism), never a stats join."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = dsir._scored_candidates(
        docs, dsir.TARGET_LANG, dsir.N_BUCKETS)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Join" not in plan
    exchanges = [ln for ln in plan.splitlines()
                 if "Exchange" in ln and "ReusedExchange" not in ln]
    assert len(exchanges) <= 1, plan
    assert all("hashpartitioning(doc_id" in ln for ln in exchanges), plan


def test_pin_guards(spark):
    with pytest.raises(ValueError, match="oracle pins"):
        dsir.dsir_bucket_stats_gate(spark, SF_DIR, n_buckets=64)
    with pytest.raises(ValueError, match="oracle pins"):
        dsir.dsir_select_gate(spark, SF_DIR, target_lang="fr")
    with pytest.raises(ValueError, match="oracle pins"):
        dsir.dsir_resample_gumbel_gate(spark, SF_DIR, seed=7)


def test_select_increment_scores_against_stored_stats(spark):
    """The incremental path: (a) only increment (odd doc_id) docs are
    selected, with NO lang exclusion (the increment was not part of the
    stats corpora, so its 'en' docs compete too); (b) ranks are
    contiguous from 1; (c) the gated integer aggregates are
    reproducible from independently recomputed even-half stats."""
    import hashlib

    from kafkastreams_tp3_is_spark.operators.dsir import (
        dsir_bucket_stats_df, dsir_select_increment)

    sel = dsir_select_increment(spark, SF_DIR).collect()
    assert [r["rank"] for r in sel] == list(range(1, len(sel) + 1))
    assert all(r["doc_id"] % 2 == 1 for r in sel)
    assert any(r["lang"] == "en" for r in sel), \
        "increment 'en' docs must compete (they ARE target-like)"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = {r["bucket"]: (r["target_count"], r["raw_count"])
             for r in dsir_bucket_stats_df(
                 docs.where("doc_id % 2 = 0")).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % dsir.N_BUCKETS

    for r in sel[:10]:
        toks = [t for t in texts[r["doc_id"]].split() if t]
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        st = sum(stats.get(bucket(g), (0, 0))[0] for g in grams)
        sr = sum(stats.get(bucket(g), (0, 0))[1] for g in grams)
        assert (r["n_grams"], r["sum_target_count"],
                r["sum_raw_count"]) == (len(grams), st, sr)


def test_duplicate_text_docs_tie_break_matches_oracle(spark, tmp_path):
    """ADVICE r12 regression: two candidate docs with IDENTICAL text
    must get identical logw in BOTH engines and tie-break on doc_id.
    Spark's sequential per-gram fold is bit-deterministic per text; the
    oracle now folds per-bucket contributions in bucket order
    (list_aggregate over an ORDER BY bucket list), so the tie is exact
    there too instead of splitting by an ulp of SUM() reordering.
    Corpus: interleaved exact-duplicate candidate pairs so every rank
    position is exercised."""
    import duckdb

    import __spark_entry__ as entrymod
    from tests.conftest import assert_frames_match

    rows = []
    for i in range(10):
        rows.append((i, f"alpha beta gamma delta epsilon word{i}",
                     "en", "web", 30))
    texts = [f"alpha beta zeta theta kappa word{j}" for j in range(15)]
    did = 100
    for j, t in enumerate(texts):
        rows.append((did, t, "de", "web", len(t)))
        did += 1
        if j < 10:   # exact text duplicate under a different doc_id
            rows.append((did, t, "fr", "web", len(t)))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    sf_dir = str(tmp_path / "dupdocs_sf")
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet/*.parquet')")
    Q, O = entrymod.queries(), entrymod.oracle_sql()
    try:
        for name in ("dsir_select", "dsir_resample_gumbel"):
            assert_frames_match(Q[name](spark, sf_dir),
                                con.execute(O[name]).fetchdf())
    finally:
        con.close()
