"""Planted-case tests for the text repetition/filter operators — the
oracle mirror proves engine parity; these pin the SEMANTICS on inputs
with hand-computable answers."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from kafkastreams_tp3_is_spark.operators.text import (  # noqa: E402
    _top_gram_frac, repetition_signals)


def test_top_gram_frac_hand_computed(spark):
    # "a b a b a": bigrams = (a b),(b a),(a b),(b a) -> max 2 of 4 = 0.5
    # trigram check on doc 2: "x x x x" -> (x x x) x2 of 2 -> 1.0
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x x x x"), (3, "unique words only here"),
         (4, "solo"), (5, "")],
        ["doc_id", "text"])
    f2 = {r["doc_id"]: r["top_frac"] for r in _top_gram_frac(df, 2).collect()}
    assert f2[1] == 0.5
    assert f2[2] == 1.0
    assert f2[3] == 1.0 / 3.0
    assert 4 not in f2 and 5 not in f2  # too short: no bigram rows
    f3 = {r["doc_id"]: r["top_frac"] for r in _top_gram_frac(df, 3).collect()}
    assert f3[2] == 1.0


def test_repetition_signals_guards_and_dup_frac(spark, monkeypatch):
    from kafkastreams_tp3_is_spark.operators import text as text_mod

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "all distinct tokens here"), (3, "")],
        ["doc_id", "text"])
    monkeypatch.setattr(text_mod, "load", lambda s, d, t: df)
    rows = {r["doc_id"]: r for r in
            text_mod.repetition_signals(spark, "ignored").collect()}
    assert rows[1]["dup_token_frac"] == 0.75       # 4 tokens, 1 distinct
    assert rows[1]["top_2gram_frac"] == 1.0
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[3]["n_tokens"] == 0
    assert rows[3]["dup_token_frac"] == 0.0
    assert rows[3]["top_2gram_frac"] == 0.0        # guard, not null


def test_lang_confusion_counts_cover_all_docs(spark):
    from kafkastreams_tp3_is_spark.operators.text import lang_confusion
    from tests.conftest import SF_DIR
    rows = lang_confusion(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["is_correct"] == (r["lang_true"] == r["lang_pred"])


def test_quality_decile_filter_drops_about_a_tenth(spark):
    from kafkastreams_tp3_is_spark.operators.text import (
        quality_decile_filter)
    from tests.conftest import SF_DIR
    rows = quality_decile_filter(spark, SF_DIR).collect()
    n = len(rows)
    dropped = [r for r in rows if not r["kept"]]
    # at least the ceil(n/10) target; ties can push it higher but never
    # past the next distinct score value
    assert len(dropped) >= (n + 9) // 10
    thresh = rows[0]["threshold"]
    assert all(r["commonness"] <= thresh for r in dropped)
    assert all(r["commonness"] > thresh for r in rows if r["kept"])


def test_cohort_retention_hand_computed(spark, tmp_path):
    from kafkastreams_tp3_is_spark.operators.events import cohort_retention
    import datetime as dt
    rows = []
    eid = 0
    d0 = dt.datetime(2024, 3, 1, 12)
    # users 1,2 first seen day 0; user 1 returns day 2; user 3 first day 1
    for uid, day in [(1, 0), (2, 0), (1, 2), (3, 1)]:
        rows.append((eid, d0 + dt.timedelta(days=day), uid, "c", 0.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    df.write.parquet(f"{tmp_path}/events.parquet")
    out = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in cohort_retention(spark, str(tmp_path)).collect()}
    assert out == {("2024-03-01", 0): 2, ("2024-03-01", 2): 1,
                   ("2024-03-02", 0): 1}


def test_vocab_drift_counts_and_ordering(spark):
    from kafkastreams_tp3_is_spark.operators.text import vocab_drift_df

    old = spark.createDataFrame(
        [(1, "aa aa aa bb cc"), (2, "bb dd")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "aa bb bb bb cc"), (2, "ee ee")], "doc_id long, text string")
    rows = vocab_drift_df(old, new, top_n=3).collect()
    # deltas: aa 3->1 = -2, ee 0->2 = +2, bb 2->3 = +1, dd 1->0 = -1,
    # cc 0 -> top3 by (|delta| desc, token asc) = aa, ee, bb
    assert [(r["token"], r["delta"]) for r in rows] == \
        [("aa", -2), ("ee", 2), ("bb", 1)]
    assert rows[0]["cnt_old"] == 3 and rows[0]["cnt_new"] == 1


def test_ngram_lm_score_hand_computed(spark):
    """Bigram familiarity on a corpus small enough to verify by hand:
    'a b' occurs in docs 1 and 2 (corpus count 2 -> familiar at
    min_count=2), every other bigram is unique (unfamiliar); doc 3 has
    one token -> zero bigrams, zero score; doc 4 repeats 'x y' twice
    within itself (within-doc occurrences count toward the corpus
    total)."""
    from kafkastreams_tp3_is_spark.operators.text import ngram_lm_score_df

    docs = spark.createDataFrame(
        [(1, "a b c"),        # bigrams: 'a b'(corpus 2), 'b c'(1)
         (2, "a b"),          # 'a b'
         (3, "solo"),         # no bigrams
         (4, "x y x y"),      # 'x y' x2, 'y x' x1 -> 'x y' familiar
         ], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["n_familiar"], r["familiarity"])
           for r in ngram_lm_score_df(docs, min_count=2).collect()}
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (1, 1, 1.0)
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (3, 2, 2 / 3)


def test_bpe_merge_candidates_hand_computed(spark):
    """Pair counting on a corpus small enough to count by hand — per
    OCCURRENCE (BPE counts corpus frequency, not document frequency),
    1-char tokens contribute nothing, ties rank lexicographically."""
    from kafkastreams_tp3_is_spark.operators.text import (
        bpe_merge_candidates)

    # monkeypatch-free: drive the same logic through a temp view is
    # overkill — restate the fixture inline via the loader contract
    import kafkastreams_tp3_is_spark.operators.text as textmod

    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "ab a")],
        "doc_id long, text string")
    real_load = textmod.load
    textmod.load = lambda _s, _d, _t: docs
    try:
        got = [(r["pair"], r["n_occurrences"], r["rank"])
               for r in bpe_merge_candidates(spark, "ignored").collect()]
    finally:
        textmod.load = real_load
    # 'abab' -> ab,ba,ab ; 'ab' -> ab ; 'ab' -> ab ; 'a' -> none
    # => ab x4, ba x1
    assert got == [("ab", 4, 1), ("ba", 1, 2)]


def _ref_bpe(token_counts: dict[str, int], n_merges: int):
    """Pure-Python reference BPE trainer: same tie-break (count desc,
    left asc, right asc) and same greedy left-to-right non-overlapping
    apply as bpe_train_df's JVM fold."""
    items = [[list(w), c] for w, c in sorted(token_counts.items())
             if len(w) >= 2]
    merges = []
    for rnd in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in items:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), n = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rnd, a, b, a + b, n))
        for item in items:
            out: list[str] = []
            for s in item[0]:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            item[0] = out
    return merges


def test_bpe_train_matches_reference(spark):
    """The distributed trainer reproduces the reference merge table
    EXACTLY on a corpus exercising overlap ('aaa' under merge (a,a)
    must yield ['aa','a']), ties, and cross-round interaction (later
    rounds see merged symbols)."""
    from collections import Counter

    from kafkastreams_tp3_is_spark.operators.text import bpe_train_df

    texts = ["aaa banana banana bandana", "low lower lowest low low",
             "aaa aaa banana b", "newer newest new new new"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    tokens = Counter(w for t in texts for w in t.split())
    want = _ref_bpe(dict(tokens), 10)
    got = [(r["round"], r["left"], r["right"], r["merged"],
            r["n_occurrences"])
           for r in bpe_train_df(docs, n_merges=10)
           .orderBy("round").collect()]
    assert got == want


def test_bpe_train_stops_when_no_pairs(spark):
    """Single-character-token corpora have no adjacent pairs: the
    trainer returns an empty merge table instead of looping."""
    from kafkastreams_tp3_is_spark.operators.text import bpe_train_df

    docs = spark.createDataFrame([(1, "a b c a b")],
                                 "doc_id long, text string")
    assert bpe_train_df(docs, n_merges=5).count() == 0


def test_null_text_documents_agree_with_oracle(spark, tmp_path):
    """ADVICE r9: tokens_col coalesces NULL text to '' but the oracle
    macros used to tokenize raw text (NULL -> NULL tokens), so a
    NULL-text document would break per-doc full-hash gates. Pin the
    mirrored fix end to end: a corpus containing NULL and empty texts
    must hash-match between the Spark fixtures and the DuckDB oracles
    for the per-document text family."""
    import duckdb

    import __spark_entry__ as entrymod
    from tests.conftest import assert_frames_match

    rows = [(1, "alpha beta gamma the and", "en", "web", 24),
            (2, None, "en", "web", 0),
            (3, "", "de", "book", 0),
            (4, "  der und  ist ", "de", "book", 15)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    sf_dir = str(tmp_path / "nulltext_sf")
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')")
    Q, O = entrymod.queries(), entrymod.oracle_sql()
    # ADVICE r10: pack_sequences / paragraph_dedup tokenized RAW text
    # (NULL -> NULL n_tokens poisoning the running offset sum / block
    # count) while their oracles already coalesced — cover them here too.
    for name in ("text_token_count", "text_quality_score", "text_lang_id",
                 "pack_sequences", "paragraph_dedup", "tokenize_ids"):
        sdf = Q[name](spark, sf_dir)
        assert_frames_match(sdf, con.execute(O[name]).fetchdf())
        # the gate contract is NULL-free output
        pdf = sdf.toPandas()
        assert not pdf.isna().any().any(), name
    con.close()


def test_bpe_encode_vocab_conserves_chars_and_degenerates(spark):
    """(a) character-mass conservation: every post-merge symbol still
    carries its characters, so sum(n_occurrences * len(symbol)) equals
    the corpus's total token characters; (b) with 0 merges the vocab is
    exactly the corpus character-frequency table; (c) the round-8 vocab
    contains at least one multi-character (merged) symbol with the
    trained merge spelled by bpe_train_df."""
    from collections import Counter

    from kafkastreams_tp3_is_spark.operators.text import (
        bpe_encode_vocab_df, bpe_train_df)
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = [t for r in docs.select("text").collect()
            for t in (r["text"] or "").split() if t]
    char_mass = sum(len(t) for t in toks)

    vocab = {r["symbol"]: r["n_occurrences"]
             for r in bpe_encode_vocab_df(docs, 8).collect()}
    assert sum(len(s) * n for s, n in vocab.items()) == char_mass

    merges = [r["merged"] for r in bpe_train_df(docs, 8).collect()]
    assert any(len(s) > 1 for s in vocab), "8 merges must merge something"
    # the LAST merge's product survives (nothing can consume it afterwards)
    assert merges[-1] in vocab

    base = {r["symbol"]: r["n_occurrences"]
            for r in bpe_encode_vocab_df(docs, 0).collect()}
    want = Counter(c for t in toks for c in t)
    assert base == dict(want)


def _ref_bpe_apply(tok: str, merges) -> list[str]:
    """Reference encode: apply learned merges in round order, each a
    greedy left-to-right non-overlapping pass (same semantics as
    _apply_merge's JVM fold)."""
    syms = list(tok)
    for _, a, b, _, _ in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_encode_docs_matches_reference(spark):
    """Per-document BPE encoding reproduces the pure-Python reference:
    every doc's symbol sequence is its tokens' greedy merge application
    laid out in token order, positions are dense 0.., and token_id is
    the lexicographic rank of the symbol in the post-merge vocabulary."""
    from collections import Counter

    from kafkastreams_tp3_is_spark.operators.text import bpe_encode_docs_df

    texts = ["aaa banana banana bandana", "low lower lowest low low",
             "aaa aaa banana b", "newer newest new new new", "x"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    tokens = Counter(w for t in texts for w in t.split())
    merges = _ref_bpe(dict(tokens), 8)
    want_seqs = {i: [s for w in t.split() for s in _ref_bpe_apply(w, merges)]
                 for i, t in enumerate(texts)}
    vocab = sorted({s for seq in want_seqs.values() for s in seq})
    ids = {s: n for n, s in enumerate(vocab)}
    got: dict[int, list] = {}
    for r in bpe_encode_docs_df(docs, 8).orderBy("doc_id", "pos").collect():
        got.setdefault(r["doc_id"], []).append(
            (r["pos"], r["symbol"], r["token_id"]))
    assert set(got) == set(want_seqs)
    for i, seq in want_seqs.items():
        g = got[i]
        assert [s for _, s, _ in g] == seq, i
        assert [p for p, _, _ in g] == list(range(len(seq))), i
        assert [t for _, _, t in g] == [ids[s] for s in seq], i


def test_bpe_pipe_token_contract(spark):
    """ADVICE r12: a token containing '|' must fail LOUDLY (the
    wrapped-symbol DuckDB oracle uses '|' as the symbol delimiter)
    instead of silently desynchronizing the hash gates."""
    import pytest

    from kafkastreams_tp3_is_spark.operators.text import bpe_train_df

    docs = spark.createDataFrame([(1, "ok a|b ok")],
                                 "doc_id long, text string")
    with pytest.raises(ValueError, match="data contract"):
        bpe_train_df(docs, 2)


def test_bpe_pipe_token_contract_distributed_path(spark, monkeypatch):
    """The '|' contract must ALSO fire on the distributed-trainer path
    (vocabulary above the local ceiling routes through _word_counts'
    own check)."""
    import pytest

    import kafkastreams_tp3_is_spark.operators.text as textmod

    monkeypatch.setattr(textmod, "_BPE_LOCAL_VOCAB_MAX", 0)
    docs = spark.createDataFrame([(1, "ok a|b ok")],
                                 "doc_id long, text string")
    with pytest.raises(ValueError, match="data contract"):
        textmod.bpe_train_df(docs, 2)


def test_bpe_local_and_distributed_trainers_agree(spark, monkeypatch):
    """r15 optimization guard: _bpe_train_core's driver-local merge loop
    (vocabulary under _BPE_LOCAL_VOCAB_MAX — the gate regime) must
    produce EXACTLY the distributed round loop's output: same merge
    table, same post-merge tok->syms dictionary, same word counts. The
    corpus exercises overlap ('aaa' under (a,a) -> ['aa','a']), ties,
    cross-round interaction, and multi-char repeats."""
    import kafkastreams_tp3_is_spark.operators.text as textmod

    texts = ["aaa banana banana bandana", "low lower lowest low low",
             "aaa aaa banana b", "newer newest new new new",
             "xyxyxy xyx yy zz zz"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def core_snapshot():
        merges, words, wc = textmod._bpe_train_core(docs, 6)
        word_rows = sorted((r["tok"], list(r["syms"]), r["cnt"])
                           for r in words.collect())
        wc_rows = sorted((r["tok"], r["cnt"]) for r in wc.collect())
        return merges, word_rows, wc_rows

    local = core_snapshot()
    monkeypatch.setattr(textmod, "_BPE_LOCAL_VOCAB_MAX", 0)
    dist = core_snapshot()
    assert local[0] == dist[0], "merge tables diverge"
    assert local[1] == dist[1], "post-merge dictionaries diverge"
    assert local[2] == dist[2], "word counts diverge"


def test_bpe_compression_stats_hand_computed(spark):
    """chars/token on a corpus small enough to verify by hand: symbol
    counts come from the reference encode, character mass equals the
    whitespace-token character mass, zero-token docs count toward
    n_docs with zero sums."""
    from collections import Counter

    from kafkastreams_tp3_is_spark.operators.text import (
        bpe_compression_stats_df)

    rows = [(0, "aa aa aa bb", "web"), (1, "aa bb", "web"),
            (2, "", "book"), (3, "cc", "book")]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, source string")
    tokens = Counter(w for _, t, _ in rows for w in t.split())
    merges = _ref_bpe(dict(tokens), 8)
    enc = {i: [s for w in t.split() for s in _ref_bpe_apply(w, merges)]
           for i, t, _ in rows}
    want = {}
    for i, t, src in rows:
        nd, nt, nc = want.get(src, (0, 0, 0))
        want[src] = (nd + 1, nt + len(enc[i]),
                     nc + sum(len(s) for s in enc[i]))
    got = {r["source"]: (r["n_docs"], r["n_tokens"], r["n_chars"],
                         r["chars_per_token"])
           for r in bpe_compression_stats_df(docs, 8).collect()}
    assert set(got) == set(want)
    for src, (nd, nt, nc) in want.items():
        ratio = nc / nt if nt else 0.0
        assert got[src] == (nd, nt, nc, ratio), src


def test_bpe_stored_tokenizer_roundtrip_and_oov(spark, tmp_path):
    """The persisted tokenizer reproduces the in-process encode exactly
    (same corpus -> same merges, vocab ids, per-doc layout), and an
    increment symbol outside the trained vocabulary encodes as the -1
    UNK sentinel."""
    from kafkastreams_tp3_is_spark.operators.text import (
        bpe_encode_docs_df, bpe_encode_with_tokenizer,
        bpe_persist_tokenizer)

    base = spark.createDataFrame(
        [(0, "aaa banana banana bandana"), (2, "low lower lowest low")],
        "doc_id long, text string")
    path = str(tmp_path / "tok")
    bpe_persist_tokenizer(base, path, n_merges=8)
    merges = spark.read.parquet(f"{path}/merges")
    vocab = spark.read.parquet(f"{path}/vocab")

    def rows(df):
        return sorted((r["doc_id"], r["pos"], r["symbol"], r["token_id"])
                      for r in df.collect())

    # round-trip: encoding the training corpus through the STORED
    # tokenizer equals the train-and-encode-in-one-pass result
    assert rows(bpe_encode_with_tokenizer(base, merges, vocab)) == \
        rows(bpe_encode_docs_df(base, 8))

    # increment with unseen characters ('zq!' never occur in base):
    # every unseen single-char symbol must come back as UNK -1, known
    # symbols keep their stored ids
    inc = spark.createDataFrame([(1, "aaa zq!")], "doc_id long, text string")
    got = rows(bpe_encode_with_tokenizer(inc, merges, vocab))
    by_symbol = {s: t for _, _, s, t in got}
    assert by_symbol["z"] == -1 and by_symbol["q"] == -1 \
        and by_symbol["!"] == -1
    known = {r["symbol"]: r["token_id"] for r in vocab.collect()}
    for _, _, s, t in got:
        if s not in ("z", "q", "!"):
            assert t == known[s], s
