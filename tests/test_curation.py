"""Invariant tests for the curation operators beyond the oracle mirror:
idempotence, determinism, packing contiguity, and planted-contamination
recall — properties the value-hash oracle alone does not state."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafkastreams_tp3_is_spark.operators.curation import (  # noqa: E402
    decontaminate, mix_by_source, normalize_text, pack_sequences,
    sample_deterministic)
from kafkastreams_tp3_is_spark.views import load  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402


def test_normalize_is_idempotent_and_canonical(spark):
    """normalize(normalize(x)) == normalize(x), including on planted messy
    inputs (mixed case, tabs, runs of spaces, leading/trailing blanks)."""
    messy = spark.createDataFrame(
        [(1, "  Mixed   CASE\t\ttabs  "), (2, "already clean"),
         (3, ""), (4, "   "), (5, "A\nB\r\nC")],
        ["doc_id", "text"])
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    once = messy.select("doc_id", norm.alias("text"))
    twice = once.select("doc_id", norm.alias("text"))
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))
    got = dict(once.collect())
    assert got[1] == "mixed case tabs"
    assert got[3] == "" and got[4] == ""
    assert got[5] == "a b c"


def test_pack_sequences_offsets_contiguous_per_shard(spark):
    """Within every shard, documents laid out in doc_id order must tile the
    token stream exactly: each offset equals the previous offset plus the
    previous length, starting at 0 (recomputed independently in pandas)."""
    pdf = (pack_sequences(spark, SF_DIR).toPandas()
           .sort_values(["shard", "doc_id"]))
    for _, grp in pdf.groupby("shard"):
        expect = 0
        for _, row in grp.iterrows():
            assert row["offset_in_shard"] == expect
            assert row["pack_id"] == expect // 2048
            expect += row["n_tokens"]


def test_sample_deterministic_is_stable_under_corpus_growth(spark):
    """Membership is a pure function of doc_id: sampling the corpus and
    sampling any subset agree on every shared doc — the ablation-stability
    property rng sampling lacks."""
    full = {r["doc_id"] for r in
            sample_deterministic(spark, SF_DIR).collect()}
    assert full  # non-vacuous: ~10% of 500 docs
    docs = load(spark, SF_DIR, "documents")
    half_ids = {r["doc_id"]
                for r in docs.where(F.col("doc_id") % 2 == 0)
                             .select("doc_id").collect()}
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    half_sample = {r["doc_id"] for r in
                   docs.where(F.col("doc_id") % 2 == 0)
                       .where(key < "1a").select("doc_id").collect()}
    assert half_sample == full & half_ids


def test_decontaminate_flags_planted_benchmark_copy(spark):
    """A verbatim copy of a benchmark document must be contaminated; the
    benchmark docs themselves never appear in the output."""
    out = decontaminate(spark, SF_DIR).toPandas()
    assert (out["doc_id"] % 50 != 0).all()
    docs = load(spark, SF_DIR, "documents")
    bench0 = docs.where(F.col("doc_id") % 50 == 0).limit(1).collect()[0]
    planted = spark.createDataFrame(
        [(999_001, bench0["text"], "en", "srcX", len(bench0["text"]))],
        docs.schema)
    import kafkastreams_tp3_is_spark.views as views
    orig_load = views.load

    def load_with_plant(sp, sf, table):
        df = orig_load(sp, sf, table)
        return df.unionByName(planted) if table == "documents" else df
    # decontaminate reads through operators.curation.load (same function)
    import kafkastreams_tp3_is_spark.operators.curation as cur
    cur.load, views.load = load_with_plant, load_with_plant
    try:
        out2 = decontaminate(spark, SF_DIR).toPandas()
    finally:
        cur.load, views.load = orig_load, orig_load
    row = out2[out2["doc_id"] == 999_001]
    assert len(row) == 1 and bool(row["contaminated"].iloc[0])


def test_mix_by_source_quota_and_determinism(spark):
    out = mix_by_source(spark, SF_DIR, quota=7).toPandas()
    per_src = out.groupby("source").size()
    assert (per_src <= 7).all()
    again = mix_by_source(spark, SF_DIR, quota=7).toPandas()
    key = ["source", "rank_in_source"]
    assert out.sort_values(key)["doc_id"].tolist() == \
        again.sort_values(key)["doc_id"].tolist()


def test_decontaminate_broadcast_is_size_guarded(spark):
    """The contract fix for the r2 'benchmark side grows with the corpus'
    hazard: an oversized benchmark must NOT be broadcast (shuffle join
    instead), a small one must be; both paths produce identical values."""
    from kafkastreams_tp3_is_spark.operators.curation import (
        contamination_hits_df, decontaminate_df)

    train = spark.createDataFrame(
        [(i, f"training document body number {i} with shared tail") for i in range(1, 40)],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "training document body number 7 with shared tail"),
         (101, "completely unrelated benchmark prompt")],
        ["doc_id", "text"])
    small_plan = contamination_hits_df(train, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastExchange" in small_plan
    # Above the contract bound the operator must WITHHOLD the broadcast
    # HINT. AQE may still broadcast a genuinely tiny cached frame by its
    # measured size (desired at runtime), so pin the hint's absence with
    # auto-broadcast off — only an explicit hint could broadcast here.
    thresholds = ["spark.sql.autoBroadcastJoinThreshold",
                  "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    saved = {k: spark.conf.get(k, None) for k in thresholds}
    try:
        for k in thresholds:
            spark.conf.set(k, "-1")
        big_plan = contamination_hits_df(
            train, bench, broadcast_max_shingles=1)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastExchange" not in big_plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    via_broadcast = decontaminate_df(train, bench, min_overlap=10)
    via_shuffle = decontaminate_df(train, bench, min_overlap=10,
                                   broadcast_max_shingles=1)
    assert sorted(map(tuple, via_broadcast.collect())) == \
        sorted(map(tuple, via_shuffle.collect()))
    flagged = {r.doc_id for r in via_broadcast.where("contaminated").collect()}
    assert 7 in flagged


def test_mix_temperature_flattens_and_is_deterministic(spark):
    """tau=0.5 property: a source 4x the size of another gets only ~2x
    the quota (sqrt flattening), and repeated runs select the identical
    membership (content-addressed fill)."""
    from kafkastreams_tp3_is_spark.operators.curation import mix_temperature

    out1 = mix_temperature(spark, SF_DIR).collect()
    out2 = mix_temperature(spark, SF_DIR).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    quotas = {r["source"]: r["quota"] for r in out1}
    n_docs = {r["source"]: r["n"] for r in
              (load(spark, SF_DIR, "documents").groupBy("source")
               .agg(F.count(F.lit(1)).alias("n"))).collect()}
    # per-source selection respects the quota and never exceeds the source
    from collections import Counter
    picked = Counter(r["source"] for r in out1)
    for s, c in picked.items():
        assert c == min(quotas[s], n_docs[s])
    # flattening: quota ratio grows at most like sqrt of the size ratio
    # (+1 slack for the integer floor)
    import math
    for a in quotas:
        for b in quotas:
            if n_docs[a] >= 4 * n_docs[b]:
                assert quotas[a] <= quotas[b] * math.sqrt(
                    n_docs[a] / n_docs[b]) + 1


def test_global_shuffle_is_a_deterministic_permutation(spark):
    """(shard, pos_in_shard) must be a bijection over the corpus —
    positions within each shard are exactly 0..len(shard)-1 — identical
    across runs, and a different seed must give a genuinely different
    order while remaining a bijection."""
    from kafkastreams_tp3_is_spark.operators.curation import global_shuffle

    out1 = global_shuffle(spark, SF_DIR, seed="s0").collect()
    out2 = global_shuffle(spark, SF_DIR, seed="s0").collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))

    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(out1) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in out1:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    assert sum(len(v) for v in by_shard.values()) == n_docs
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(len(positions))), shard
    # no pathological skew: 500 docs over 16 shards, each shard nonempty
    # and no shard hoards more than 3x the mean
    assert len(by_shard) == 16
    assert max(len(v) for v in by_shard.values()) <= 3 * n_docs / 16

    other = global_shuffle(spark, SF_DIR, seed="s1").collect()
    order_a = [r["doc_id"] for r in sorted(
        out1, key=lambda r: (r["shard"], r["pos_in_shard"]))]
    order_b = [r["doc_id"] for r in sorted(
        other, key=lambda r: (r["shard"], r["pos_in_shard"]))]
    assert order_a != order_b, "seed must change the permutation"
    assert sorted(order_a) == sorted(order_b)


def test_doc_chunk_covers_text_exactly(spark):
    """Chunks must tile each document: chunk 0 starts at 0, consecutive
    starts differ by the stride, every chunk except the last is full
    width, the last reaches exactly the end of the text, and
    concatenating the non-overlapped prefixes reconstructs the text."""
    from kafkastreams_tp3_is_spark.operators.curation import doc_chunk

    docs = {r["doc_id"]: r["text"]
            for r in load(spark, SF_DIR, "documents").collect()}
    rows = doc_chunk(spark, SF_DIR, chunk_chars=600, overlap=100).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    stride = 500
    for doc_id, chunks in by_doc.items():
        text = docs[doc_id]
        n = len(text)
        chunks.sort(key=lambda r: r["chunk_index"])
        assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["chunk_start"] == c["chunk_index"] * stride
            assert c["chunk_text"] == text[c["chunk_start"]:
                                           c["chunk_start"] + 600]
            assert c["chunk_len"] == len(c["chunk_text"])
        last = chunks[-1]
        if n <= 600:
            assert len(chunks) == 1 and last["chunk_text"] == text
        else:
            # full-width everywhere but the tail; tail lands exactly on n
            for c in chunks[:-1]:
                assert c["chunk_len"] == 600
            assert last["chunk_start"] + last["chunk_len"] == n
            assert 100 < last["chunk_len"] <= 600
        # stitching the stride-prefixes of each chunk + the tail of the
        # last reproduces the document
        rebuilt = "".join(c["chunk_text"][:stride] for c in chunks[:-1])
        rebuilt += last["chunk_text"]
        assert rebuilt == text


def test_doc_chunk_rejects_degenerate_overlap(spark):
    from kafkastreams_tp3_is_spark.operators.curation import doc_chunk

    with pytest.raises(ValueError):
        doc_chunk(spark, SF_DIR, chunk_chars=100, overlap=100)


def test_stratified_sample_rates_and_stability(spark):
    """Per-source keep-rates track the configured fractions, membership
    is a pure function of doc_id (subset-stable when fractions shrink),
    and the plan is shuffle-free (pure filter over the scan)."""
    from kafkastreams_tp3_is_spark.operators.curation import (
        stratified_sample)

    docs = load(spark, SF_DIR, "documents")
    totals = {r["source"]: r["cnt"] for r in
              docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
              .collect()}
    out = stratified_sample(spark, SF_DIR).collect()
    kept: dict[str, int] = {}
    for r in out:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
    fracs = {"web": 0.05, "news": 0.20, "books": 0.50}
    for src, total in totals.items():
        frac = fracs.get(src, 0.10)
        # binomial-ish tolerance at small strata: +-4 sqrt(n p (1-p)) + 2
        tol = 4 * (total * frac * (1 - frac)) ** 0.5 + 2
        assert abs(kept.get(src, 0) - frac * total) <= tol, src

    # halving a fraction must select a SUBSET (content-addressed keys)
    half = stratified_sample(
        spark, SF_DIR, fractions={"web": 0.05, "news": 0.10, "books": 0.25})
    ids_half = {r["doc_id"] for r in half.collect()}
    ids_full = {r["doc_id"] for r in out}
    assert ids_half <= ids_full

    # shuffle-free: no Exchange in the physical plan
    plan = stratified_sample(spark, SF_DIR)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_efficiency_arithmetic(spark):
    from kafkastreams_tp3_is_spark.operators.curation import (
        pack_efficiency_df)
    docs = spark.createDataFrame(
        [(0, " ".join(["w"] * 100)),    # shard 0: 100 tokens
         (2, " ".join(["w"] * 50)),     # shard 0: +50 -> 150 total
         (1, " ".join(["w"] * 64))],    # shard 1: exactly one pack
        "doc_id long, text string")
    rows = {r["shard"]: r for r in
            pack_efficiency_df(docs, budget=64, n_shards=2).collect()}
    s0 = rows[0]
    assert (s0["n_docs"], s0["total_tokens"], s0["n_packs"],
            s0["waste_tokens"]) == (2, 150, 3, 42)
    assert s0["utilization"] == 150 / 192
    s1 = rows[1]
    assert (s1["n_packs"], s1["waste_tokens"], s1["utilization"]) == (1, 0, 1.0)


def test_corpus_diff_statuses(spark):
    from kafkastreams_tp3_is_spark.operators.curation import corpus_diff_df
    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh")], "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff_df(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_materialize_mixture_regimes_and_determinism(spark):
    """All four weight regimes behave: 0 epochs drops the source, 2.5
    epochs gives every doc 2 or 3 copies with the 3rd on a deterministic
    ~50% of docs, unlisted sources default to exactly 1 copy, and copy
    ids tile [0, n_copies). Membership of the fractional copy is a pure
    function of doc_id (stable across calls)."""
    from collections import Counter

    from kafkastreams_tp3_is_spark.operators.curation import (
        materialize_mixture_df)

    rows = [(i, "A" if i % 3 == 0 else "B" if i % 3 == 1 else "C")
            for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = materialize_mixture_df(docs, {"A": 0, "B": 2500}).collect()
    by_doc = Counter((r["doc_id"]) for r in out)
    srcs = {r["doc_id"]: r["source"] for r in out}
    assert "A" not in srcs.values()                      # dropped
    b_counts = {d: c for d, c in by_doc.items() if srcs[d] == "B"}
    c_counts = {d: c for d, c in by_doc.items() if srcs[d] == "C"}
    assert set(c_counts.values()) == {1}                 # default 1 epoch
    assert set(b_counts.values()) <= {2, 3} and len(b_counts) == 100
    frac3 = sum(1 for c in b_counts.values() if c == 3) / len(b_counts)
    assert 0.3 < frac3 < 0.7, frac3                      # ~50% extra copy
    # copy ids tile 0..n-1 per doc
    copies = {}
    for r in out:
        copies.setdefault(r["doc_id"], []).append(r["copy"])
    assert all(sorted(v) == list(range(len(v))) for v in copies.values())
    # content-addressed: a second run is identical
    again = materialize_mixture_df(docs, {"A": 0, "B": 2500}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_source_overlap_matrix_counts_planted_pairs(spark):
    """Hand-computed matrix: text 'x' appears 2x in A and 3x in B, 'y'
    1x in each of A and C; uniques contribute nothing. Expected:
    (A,A)=1 within-pair, (A,B)=6 cross, (A,C)=1, (B,B)=3."""
    from kafkastreams_tp3_is_spark.operators.curation import (
        source_overlap_matrix_df)

    rows = ([("x", "A")] * 2 + [("x", "B")] * 3 + [("y", "A"), ("y", "C")]
            + [("u1", "A"), ("u2", "B"), (None, "C")])
    docs = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): r["n_dup_pairs"]
           for r in source_overlap_matrix_df(docs).collect()}
    assert got == {("A", "A"): 1, ("A", "B"): 6, ("A", "C"): 1,
                   ("B", "B"): 3}


def test_domain_mixture_report_hand_computed(spark):
    """Exact per-source math on a 2-source corpus with one
    within-source duplicate AND one NULL-text document: counts,
    dup_ratio, and token_share all verifiable by hand; shares sum to
    exactly 1. The NULL-text row pins the ADVICE fix — it must count as
    0 tokens (never NULL or -1) and hash as '' for distinctness."""
    from kafkastreams_tp3_is_spark.operators.curation import (
        domain_mixture_report_df)

    docs = spark.createDataFrame(
        [(1, "one two three", "en", "A", 13),
         (2, "one two three", "en", "A", 13),   # dup within A
         (3, "four five", "en", "A", 9),
         (4, "six", "en", "B", 3),
         (5, None, "en", "B", 0),               # NULL text: 0 tokens
         ], "doc_id long, text string, lang string, source string, "
           "n_chars int")
    got = {r["source"]: r.asDict()
           for r in domain_mixture_report_df(docs).collect()}
    a, b = got["A"], got["B"]
    assert (a["n_docs"], a["n_tokens"], a["n_distinct_texts"]) == (3, 8, 2)
    assert (b["n_docs"], b["n_tokens"], b["n_distinct_texts"]) == (2, 1, 2)
    assert a["dup_ratio"] == 1 / 3 and b["dup_ratio"] == 0.0
    assert a["token_share"] == 8 / 9 and b["token_share"] == 1 / 9
    assert a["token_share"] + b["token_share"] == 1.0


def test_select_token_budget_equals_global_greedy(spark):
    """The bucketed two-pass selection must reproduce the naive GLOBAL
    greedy exactly: order docs by (familiarity desc, doc_id asc), take
    while cumulative tokens <= budget. Verified row-for-row against a
    Python restatement at sf0.001, plus both verdict branches present
    and the kept token mass within budget but within one doc of it."""
    from kafkastreams_tp3_is_spark.operators.curation import (
        select_token_budget)
    from tests.conftest import SF_DIR

    budget = 20_000
    rows = select_token_budget(spark, SF_DIR, budget=budget).collect()
    got = {r["doc_id"]: r for r in rows}

    order = sorted(rows, key=lambda r: (-r["familiarity"], r["doc_id"]))
    cum, want_sel = 0, set()
    for r in order:
        # strict greedy-PREFIX semantics: the first doc that does not
        # fit ends the selection — no knapsack backfill with smaller
        # later docs (cumulative sums are monotone in the operator, so
        # everything after the first overflow is out)
        if cum + r["n_tokens"] > budget:
            break
        cum += r["n_tokens"]
        want_sel.add(r["doc_id"])
    got_sel = {d for d, r in got.items() if r["selected"]}
    assert got_sel == want_sel
    assert 0 < len(got_sel) < len(got), "both branches must run"
    kept = sum(got[d]["n_tokens"] for d in got_sel)
    assert kept <= budget


def test_select_token_budget_null_text_is_zero_tokens(spark):
    """A NULL-text document must flow through selection as 0 tokens
    (the ADVICE fix): it never poisons the cumulative sum with NULL/-1
    and, being free, is selected whenever its familiarity rank is
    reached before the budget closes."""
    from kafkastreams_tp3_is_spark.operators.curation import (
        select_token_budget_df)

    docs = spark.createDataFrame(
        [(1, "aa bb aa bb aa bb", "en", "A", 17),
         (2, "aa bb aa bb", "en", "A", 11),
         (3, None, "en", "A", 0),
         (4, "zz yy xx ww vv uu tt ss", "en", "A", 23),
         ], "doc_id long, text string, lang string, source string, "
           "n_chars int")
    rows = {r["doc_id"]: r
            for r in select_token_budget_df(docs, budget=12).collect()}
    assert len(rows) == 4
    assert rows[3]["n_tokens"] == 0
    tot = sum(r["n_tokens"] for r in rows.values() if r["selected"])
    assert tot <= 12


def test_split_by_content_coassigns_exact_duplicates(spark):
    """The whole point of the content-keyed split: byte-identical
    documents ALWAYS land in the same split, while the id-keyed split
    demonstrably separates some of them on the same corpus."""
    from kafkastreams_tp3_is_spark.operators.curation import (
        split_by_content_df)

    # 60 distinct texts, each replanted under 3 different ids
    rows = []
    for i in range(60):
        for r in range(3):
            rows.append((i * 10 + r * 1000, f"doc body number {i} " * 5,
                         "en", "web"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    got = split_by_content_df(docs).toPandas()
    assert len(got) == 180
    # a split key maps to exactly one split name
    assert (got.groupby("split_key")["split"].nunique() == 1).all()
    # every replant trio (ids i*10, i*10+1000, i*10+2000) shares a split
    splits = {i: {got[got.doc_id == i * 10 + r * 1000]["split"].iloc[0]
                  for r in range(3)} for i in range(60)}
    assert all(len(s) == 1 for s in splits.values())

    # the id-keyed split separates at least one duplicate trio here —
    # the leakage this operator eliminates
    id_key = got.copy()
    import hashlib
    id_key["id_split"] = [
        "train" if hashlib.md5(str(d).encode()).hexdigest()[:2] < "e6"
        else "val" if hashlib.md5(str(d).encode()).hexdigest()[:2] < "f3"
        else "test" for d in id_key["doc_id"]]
    sep = any(len({id_key[id_key.doc_id == i * 10 + r * 1000]
                   ["id_split"].iloc[0] for r in range(3)}) > 1
              for i in range(60))
    assert sep


def test_split_by_content_thresholds_and_nulls(spark):
    """Null text hashes as '' (never a null key), and the hex
    thresholds reproduce hand-computed assignments."""
    import hashlib

    from kafkastreams_tp3_is_spark.operators.curation import (
        split_by_content_df)

    docs = spark.createDataFrame(
        [(1, None, "en", "web"), (2, "alpha", "en", "web"),
         (3, "beta", "de", "news")],
        "doc_id long, text string, lang string, source string")
    got = {r["doc_id"]: (r["split_key"], r["split"])
           for r in split_by_content_df(docs).collect()}

    def want(text):
        inner = hashlib.md5((text or "").encode()).hexdigest()
        key = hashlib.md5(inner.encode()).hexdigest()[:2]
        return key, ("train" if key < "e6" else "val" if key < "f3"
                     else "test")

    assert got[1] == want(None)
    assert got[2] == want("alpha")
    assert got[3] == want("beta")


def test_curriculum_order_stages_and_shuffle(spark):
    """(a) stages partition the corpus and are monotone in difficulty —
    every doc in stage s has n_tokens <= every doc in stage s+1 (value
    ties can never straddle a stage); (b) within-(stage, shard)
    positions are contiguous from 0; (c) the within-stage order is
    deterministic per seed and changes with the seed while stages do
    not; (d) the registry wrapper pins the oracle's parameters."""
    import pytest

    from kafkastreams_tp3_is_spark.operators.curation import (
        curriculum_order, curriculum_order_df)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = curriculum_order_df(docs).collect()
    n = docs.count()
    assert len(rows) == n
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r)
    assert sorted(by_stage) == [0, 1, 2, 3]
    for s in range(3):
        assert (max(r["n_tokens"] for r in by_stage[s])
                <= min(r["n_tokens"] for r in by_stage[s + 1]))
    from collections import Counter
    for (s, sh), grp in Counter(
            (r["stage"], r["shard"]) for r in rows).items():
        poss = sorted(r["pos_in_shard"] for r in rows
                      if r["stage"] == s and r["shard"] == sh)
        assert poss == list(range(grp))

    a = sorted(map(tuple, curriculum_order_df(docs).collect()))
    assert a == sorted(map(tuple, rows))
    b = {r["doc_id"]: (r["stage"], r["shard"], r["pos_in_shard"])
         for r in curriculum_order_df(docs, seed="c1").collect()}
    keep = {r["doc_id"]: r["stage"] for r in rows}
    assert all(b[d][0] == keep[d] for d in keep), "stages seed-independent"
    assert any(b[d][1:] != (r["shard"], r["pos_in_shard"])
               for d, r in ((r["doc_id"], r) for r in rows)), \
        "order must change with the seed"

    with pytest.raises(ValueError, match="oracle pins"):
        curriculum_order(spark, SF_DIR, seed="c9")
