"""Hand-computed and property checks for the round-4 retrieval /
reporting operators (retrieval.py, sketch.py, corpus_stats,
contamination_overlap, embedding_kmeans_assign). The sf0.001 oracle
parity runs in test_queries_oracle.py; these pin the semantics on inputs
small enough to verify by hand and the scale behaviors the oracle can't
see (MG state bounds, candidate-superset, plan shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreams_tp3_is_spark.operators.retrieval import (
    bm25_search_df, tfidf_topk_df, tokenize_ids_df)
from kafkastreams_tp3_is_spark.operators.sketch import (
    _mg_partition_candidates, heavy_hitters_df)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- tfidf -------------------------------------------------------------

def test_tfidf_hand_computed(spark):
    # 3 docs; "rare" only in doc 0, "common" everywhere
    docs = _docs(spark, [(0, "rare common common"),
                         (1, "common"),
                         (2, "common common")])
    out = {(r["doc_id"], r["term"]): r
           for r in tfidf_topk_df(docs, k=5).collect()}
    # doc0: rare tf=1 df=1 -> 1*(4)/(2)=2.0 ; common tf=2 df=3 -> 2*4/4=2.0
    # tie on score -> term asc: "common" rnk 1, "rare" rnk 2
    assert out[(0, "common")]["tfidf"] == 2.0
    assert out[(0, "rare")]["tfidf"] == 2.0
    assert out[(0, "common")]["rnk"] == 1
    assert out[(0, "rare")]["rnk"] == 2
    assert out[(1, "common")]["tf"] == 1 and out[(1, "common")]["df"] == 3


def test_tfidf_k_truncates(spark):
    docs = _docs(spark, [(0, "a b c d e f g h")])
    assert tfidf_topk_df(docs, k=3).count() == 3


# --- bm25 --------------------------------------------------------------

def test_bm25_ranks_matching_docs_first_and_scores_zero_without_hits(spark):
    docs = _docs(spark, [(0, "spark spark query"),
                         (1, "spark other words here"),
                         (2, "nothing relevant at all")])
    rows = {r["doc_id"]: r for r in bm25_search_df(docs, top_n=10).collect()}
    assert rows[2]["score"] == 0.0
    assert rows[0]["score"] > rows[1]["score"] > 0.0
    assert [rows[i]["rnk"] for i in (0, 1, 2)] == [1, 2, 3]
    assert rows[0]["tf_spark"] == 2 and rows[0]["tf_query"] == 1
    assert rows[1]["tf_query"] == 0


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # same tf, different lengths -> shorter doc scores higher
    docs = _docs(spark, [(0, "spark x"),
                         (1, "spark " + "x " * 60)])
    rows = {r["doc_id"]: r for r in bm25_search_df(docs, top_n=10).collect()}
    assert rows[0]["score"] > rows[1]["score"]


def test_bm25_is_shuffle_free_over_documents(spark):
    """One narrow projection + a broadcast 1-row stats frame: the only
    Exchange allowed is the single-partition one feeding the global
    stats aggregate and the final top-n window — never a hash shuffle
    of document rows."""
    docs = _docs(spark, [(0, "spark query"), (1, "vector")])
    plan = (bm25_search_df(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange hashpartitioning" not in plan


def test_bm25_global_topn_is_take_ordered_not_full_sort(spark):
    """The global top-n must be TakeOrderedAndProject (per-task heaps,
    driver merge) — never an Exchange SinglePartition funneling every
    scored document through one task before ranking."""
    docs = _docs(spark, [(i, f"spark doc {i}") for i in range(50)])
    plan = (bm25_search_df(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "TakeOrderedAndProject" in plan
    # exactly ONE SinglePartition exchange: the 1-row global-stats
    # aggregate (map-side partials -> merge). The ranking itself must
    # contribute none — scored rows reach the driver via per-task heaps.
    assert plan.count("Exchange SinglePartition") == 1


# --- tokenize_ids ------------------------------------------------------

def test_tokenize_ids_layout_and_determinism(spark):
    docs = _docs(spark, [(7, "The  quick fox"), (8, "")])
    rows = sorted(tokenize_ids_df(docs).collect(),
                  key=lambda r: (r["doc_id"], r["pos"]))
    assert [(r["doc_id"], r["pos"], r["token"]) for r in rows] == [
        (7, 0, "the"), (7, 1, "quick"), (7, 2, "fox")]
    assert all(0 <= r["token_id"] < 32000 for r in rows)
    # same token -> same id across docs
    docs2 = _docs(spark, [(9, "fox fox")])
    ids = {r["token"]: r["token_id"]
           for r in tokenize_ids_df(docs2).collect()}
    assert ids["fox"] == [r["token_id"] for r in rows if r["token"] == "fox"][0]


def test_tokenize_ids_no_shuffle(spark):
    docs = _docs(spark, [(0, "a b c")])
    plan = (tokenize_ids_df(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "Exchange" not in plan


# --- heavy hitters -----------------------------------------------------

def test_mg_kernel_bounds_state_and_keeps_heavy_key(spark):
    """Adversarial stream: one key at 30% share drowned in unique noise.
    The MG summary must keep it while never holding more than capacity
    entries after compression."""
    import pandas as pd
    n_noise = 7000
    tokens = ["HEAVY"] * 3000 + [f"noise{i}" for i in range(n_noise)]
    kernel = _mg_partition_candidates(capacity=8)
    batches = [pd.DataFrame({"token": tokens[i:i + 500]})
               for i in range(0, len(tokens), 500)]
    out = list(kernel(iter(batches)))
    assert len(out) == 1
    kept = set(out[0]["token"])
    assert "HEAVY" in kept
    assert len(kept) <= 8 + 500  # capacity + one uncompressed batch


def test_heavy_hitters_exact_on_skewed_corpus(spark):
    # 60% a, 25% b, ~15% unique junk; support 1/4 -> exactly {a, b}
    text_hot = " ".join(["a"] * 60 + ["b"] * 25)
    junk = " ".join(f"junk{i}" for i in range(15))
    docs = _docs(spark, [(0, text_hot), (1, junk)])
    out = {r["token"]: r for r in
           heavy_hitters_df(docs, support_inv=4).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["n_occurrences"] == 60
    assert out["a"]["share"] == 60.0 / 100.0


def test_heavy_hitters_candidates_survive_partitioning(spark):
    """The superset guarantee must hold when the heavy key's occurrences
    are spread across many partitions mixed with per-partition-local
    noise."""
    rows = []
    for p in range(8):
        body = ("hot " * 40) + " ".join(f"p{p}w{i}" for i in range(60))
        rows.append((p, body))
    docs = _docs(spark, rows).repartition(8, "doc_id")
    out = {r["token"] for r in
           heavy_hitters_df(docs, support_inv=5).collect()}
    assert "hot" in out


# --- corpus_stats ------------------------------------------------------

def test_corpus_stats_lower_median(spark, tmp_path):
    from kafkastreams_tp3_is_spark.operators.text import corpus_stats
    rows = [(i, "x" * n, "en", "s", n)
            for i, n in enumerate([1, 5, 9, 100])]  # even n -> lower median 5
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    out = corpus_stats(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["median_chars"] == 5
    assert r["n_docs"] == 4 and r["min_chars"] == 1 and r["max_chars"] == 100
    assert r["avg_chars"] == (1 + 5 + 9 + 100) / 4.0


# --- contamination_overlap --------------------------------------------

def test_contamination_overlap_fraction(spark):
    from kafkastreams_tp3_is_spark.operators.curation import (
        contamination_overlap_df)
    bench = _docs(spark, [(100, "abcdefgh")])
    # doc 0 is an exact substring copy -> every gram shared; doc 1 disjoint
    train = _docs(spark, [(0, "abcdefgh"), (1, "zzzzzzzz")])
    out = {r["doc_id"]: r for r in
           contamination_overlap_df(train, bench, k=5).collect()}
    assert out[0]["overlap_frac"] == 1.0
    assert out[1]["n_shared"] == 0 and out[1]["overlap_frac"] == 0.0
    assert out[0]["n_grams"] == 4  # 8 chars -> 4 distinct 5-grams


def test_contamination_attribution_picks_max_overlap_bench_doc(spark):
    from kafkastreams_tp3_is_spark.operators.curation import (
        contamination_attribution_df)
    # bench 100 shares 4 grams with doc 0; bench 101 shares only 1
    bench = _docs(spark, [(100, "abcdefgh"), (101, "abcdeZZZ")])
    train = _docs(spark, [(0, "abcdefgh"), (1, "qqqqqqqq")])
    out = contamination_attribution_df(train, bench, k=5).collect()
    assert len(out) == 1  # doc 1 shares nothing -> absent
    r = out[0]
    assert (r["doc_id"], r["bench_doc_id"], r["n_shared"]) == (0, 100, 4)


def test_contamination_attribution_tie_breaks_on_smaller_bench_id(spark):
    from kafkastreams_tp3_is_spark.operators.curation import (
        contamination_attribution_df)
    bench = _docs(spark, [(7, "abcdef"), (3, "abcdef")])
    train = _docs(spark, [(0, "abcdef")])
    r = contamination_attribution_df(train, bench, k=5).collect()[0]
    assert r["bench_doc_id"] == 3


# --- embedding_kmeans_assign ------------------------------------------

def test_kmeans_assign_covers_all_vectors_deterministically(spark):
    from kafkastreams_tp3_is_spark.operators.ivf import (
        embedding_kmeans_assign)
    a = embedding_kmeans_assign(spark, "/root/testdata/sf0.001",
                                n_clusters=8)
    b = embedding_kmeans_assign(spark, "/root/testdata/sf0.001",
                                n_clusters=8)
    pa = sorted((r["vec_id"], r["cluster"]) for r in a.collect())
    pb = sorted((r["vec_id"], r["cluster"]) for r in b.collect())
    assert pa == pb  # deterministic
    n_vecs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").count()
    assert len(pa) == n_vecs  # total coverage, one row per vector
    clusters = {c for _, c in pa}
    assert len(clusters) > 1 and all(0 <= c < 8 for c in clusters)


# --- doc_commonness ----------------------------------------------------

def test_doc_commonness_hand_computed(spark, tmp_path):
    from kafkastreams_tp3_is_spark.operators.text import doc_commonness
    rows = [(0, "a a b", "en", "s", 5), (1, "b", "en", "s", 1),
            (2, "", "en", "s", 0)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in doc_commonness(spark, str(tmp_path)).collect()}
    # corpus counts: a=2, b=2, total=4
    # doc0: (2+2+2)/(3*4) = 0.5 ; doc1: 2/(1*4) = 0.5 ; doc2: empty -> 0
    assert out[0]["commonness"] == 6 / 12
    assert out[1]["commonness"] == 2 / 4
    assert out[2]["commonness"] == 0.0 and out[2]["n_tokens"] == 0


def test_doc_commonness_ranks_rare_doc_lowest(spark, tmp_path):
    from kafkastreams_tp3_is_spark.operators.text import doc_commonness
    rows = [(i, "common words here", "en", "s", 1) for i in range(9)]
    rows.append((9, "xylophone quixotic zephyr", "en", "s", 1))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r["commonness"]
           for r in doc_commonness(spark, str(tmp_path)).collect()}
    assert out[9] < min(out[i] for i in range(9))


# --- events_user_anomaly ----------------------------------------------

def test_user_anomaly_flags_spike_hour(spark, tmp_path):
    from kafkastreams_tp3_is_spark.operators.events import user_anomaly
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: 2 events/hour for 9 hours, then a 40-event spike hour
    for h in range(9):
        for _ in range(2):
            rows.append((eid, base + dt.timedelta(hours=h), 1, "c", 0.0, "{}")); eid += 1
    for _ in range(40):
        rows.append((eid, base + dt.timedelta(hours=9), 1, "c", 0.0, "{}")); eid += 1
    # user 2: single observed hour -> z must be 0, never flagged
    rows.append((eid, base, 2, "c", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    df.write.parquet(f"{tmp_path}/events.parquet")
    out = user_anomaly(spark, str(tmp_path)).collect()
    flagged = {(r["user_id"], r["hour"].hour) for r in out if r["is_anomaly"]}
    assert (1, 9) in flagged
    assert all(u != 2 for u, _ in flagged)
    z_by_hour = {r["hour"].hour: r["z"] for r in out if r["user_id"] == 1}
    assert z_by_hour[9] > 2.0 and all(z_by_hour[h] < 0 for h in range(9))


# --- pack_token_sequences ---------------------------------------------

def test_pack_token_sequences_layout(spark):
    from kafkastreams_tp3_is_spark.operators.retrieval import (
        pack_token_sequences_df, tokenize_ids_df)
    docs = _docs(spark, [(i, " ".join(f"w{j}" for j in range(10)))
                         for i in range(6)])
    toks = tokenize_ids_df(docs)
    out = pack_token_sequences_df(toks, seq_len=8, n_shards=2).collect()
    assert len(out) == 60  # one row per token, nothing lost
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r["seq_index"], r["pos_in_seq"]))
        # positions are a dense 0..n-1 stream cut every 8 tokens
        stream = [(r["seq_index"], r["pos_in_seq"]) for r in rows]
        assert stream == [(i // 8, i % 8) for i in range(len(rows))]
        # a document's tokens are contiguous in the stream (concat, THEN cut)
        seen, prev = set(), None
        for r in rows:
            if r["doc_id"] != prev:
                assert r["doc_id"] not in seen, "doc split non-contiguously"
                seen.add(r["doc_id"]); prev = r["doc_id"]


def test_pack_token_sequences_no_single_partition_window(spark):
    from kafkastreams_tp3_is_spark.operators.retrieval import (
        pack_token_sequences, )
    df = pack_token_sequences(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_mix_by_cluster_quota_and_determinism(spark):
    from kafkastreams_tp3_is_spark.operators.ivf import mix_by_cluster
    a = mix_by_cluster(spark, "/root/testdata/sf0.001", quota=10,
                       n_clusters=4)
    rows = [(r["vec_id"], r["cluster"], r["rank_in_cluster"])
            for r in a.collect()]
    per_cluster = {}
    for _, c, rk in rows:
        per_cluster.setdefault(c, []).append(rk)
    for c, ranks in per_cluster.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10
    b = mix_by_cluster(spark, "/root/testdata/sf0.001", quota=10,
                       n_clusters=4)
    assert sorted(rows) == sorted(
        (r["vec_id"], r["cluster"], r["rank_in_cluster"])
        for r in b.collect())


def test_pack_bpe_sequences_packs_encode_docs(spark):
    """The pack-over-BPE loop: pack_bpe_sequences lays out EXACTLY the
    bpe_encode_docs rows — same row count, same per-doc token multiset —
    and shard 0's stream reproduces the (md5(doc_id), doc_id, pos)
    order cut every 128, independently recomputed in Python."""
    import hashlib
    from collections import Counter

    from kafkastreams_tp3_is_spark.operators.retrieval import (
        pack_bpe_sequences)
    from kafkastreams_tp3_is_spark.operators.text import bpe_encode_docs
    from tests.conftest import SF_DIR

    packed = pack_bpe_sequences(spark, SF_DIR).collect()
    enc = bpe_encode_docs(spark, SF_DIR).collect()
    assert len(packed) == len(enc) > 0
    assert (Counter((r["doc_id"], r["token_id"]) for r in packed)
            == Counter((r["doc_id"], r["token_id"]) for r in enc))
    by_doc: dict[int, list] = {}
    for r in enc:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["token_id"]))

    def h(d):
        return hashlib.md5(str(d).encode()).hexdigest()

    docs0 = [d for d in by_doc if int(h(d)[:4], 16) % 16 == 0]
    stream = [t for d in sorted(docs0, key=lambda d: (h(d), d))
              for _, t in sorted(by_doc[d])]
    got0 = sorted((r["seq_index"], r["pos_in_seq"], r["token_id"])
                  for r in packed if r["shard"] == 0)
    want0 = sorted((i // 128, i % 128, t) for i, t in enumerate(stream))
    assert got0 == want0


def test_hybrid_rrf_matches_python_replay_and_fuses_modalities(spark):
    """hybrid_search_rrf on the sf0.001 corpus equals an independent
    Python replay of RRF over the engine's own two top-50 rankings
    (scores as exact fixed-order double sums), and the fusion genuinely
    uses both modalities: a doc present in both rankings must outscore
    a doc holding only the strictly-worse rank in a single ranking."""
    from kafkastreams_tp3_is_spark.operators.retrieval import (
        bm25_search_df, hybrid_search_rrf)
    from kafkastreams_tp3_is_spark.operators.similarity import (
        _bruteforce_ranked)
    from kafkastreams_tp3_is_spark.views import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents")
    emb = load(spark, SF_DIR, "embeddings")
    lex = {r["doc_id"]: r["rnk"]
           for r in bm25_search_df(docs, top_n=50).collect()}
    sem = {r["neighbor_id"]: r["rank"]
           for r in _bruteforce_ranked(emb, 1)
           .where(F.col("rank") <= 50).collect()}
    want = {}
    for d in set(lex) | set(sem):
        s = 0.0
        s += 1.0 / (60.0 + lex[d]) if d in lex else 0.0
        s += 1.0 / (60.0 + sem[d]) if d in sem else 0.0
        want[d] = s
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = hybrid_search_rrf(spark, SF_DIR).orderBy("rrf_rank").collect()
    assert [(r["doc_id"], r["rrf_score"]) for r in got] == top
    # sentinel contract: absent modality is -1, present is the rank
    for r in got:
        assert r["lex_rank"] == lex.get(r["doc_id"], -1)
        assert r["sem_rank"] == sem.get(r["doc_id"], -1)
    # both modalities contribute to the fused top-20
    assert any(r["lex_rank"] > 0 for r in got)
    assert any(r["sem_rank"] > 0 for r in got)


def test_hybrid_rrf_ann_contract_and_overlap_floor(spark):
    """hybrid_search_rrf_ann (VERDICT r14 ask #2): the stored-IVF
    fusion keeps the exact twin's output contract (dense rrf_rank
    1..20, -1 sentinels, score = fixed-order sum of the two rank
    terms) and its fused top-20 overlaps the exact fusion's top-20 at
    >= the ann_recall_ivf band (0.6); the LEXICAL side must be
    bit-identical between the twins (the ANN swap touches only the
    semantic shortlist)."""
    from kafkastreams_tp3_is_spark.operators.retrieval import (
        hybrid_search_rrf, hybrid_search_rrf_ann)
    from tests.conftest import SF_DIR

    exact = hybrid_search_rrf(spark, SF_DIR).orderBy("rrf_rank").collect()
    ann = hybrid_search_rrf_ann(spark, SF_DIR).orderBy("rrf_rank").collect()

    assert [r["rrf_rank"] for r in ann] == list(range(1, 21))
    for r in ann:
        want = 0.0
        if r["lex_rank"] > 0:
            want += 1.0 / (60.0 + r["lex_rank"])
        if r["sem_rank"] > 0:
            want += 1.0 / (60.0 + r["sem_rank"])
        assert r["rrf_score"] == want
        assert r["lex_rank"] >= -1 and r["sem_rank"] >= -1
        assert r["lex_rank"] != 0 and r["sem_rank"] != 0

    # lexical ranks identical wherever the same doc appears in both
    exact_lex = {r["doc_id"]: r["lex_rank"] for r in exact}
    for r in ann:
        if r["doc_id"] in exact_lex:
            assert r["lex_rank"] == exact_lex[r["doc_id"]]

    overlap = (len({r["doc_id"] for r in ann}
                   & {r["doc_id"] for r in exact}) / 20.0)
    assert overlap >= 0.6, overlap
    # both modalities still contribute through the ANN shortlist
    assert any(r["sem_rank"] > 0 for r in ann)
    assert any(r["lex_rank"] > 0 for r in ann)
