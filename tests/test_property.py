"""Property-based (hypothesis) equivalence tests: randomized corpora,
including multibyte/astral unicode, checked against brute-force Python
references. These go beyond the fixed-corpus oracles: they exercise the
operators' kernels on adversarial shapes (empty docs, docs shorter than
one span, shared motifs planted across documents) the testdata never
produces."""

from __future__ import annotations

import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, "/root/repo")

from tests.conftest import SF_DIR  # noqa: E402  (spark fixture import path)

# mixed-width alphabet: ASCII, 2-byte, 3-byte, and astral (4-byte UTF-8)
_ALPHA = "ab α€😀"

_doc = st.text(alphabet=_ALPHA, min_size=0, max_size=60)
_motif = st.text(alphabet=_ALPHA, min_size=7, max_size=12)


@st.composite
def _corpus(draw):
    """3-6 random docs; with a planted motif inserted into >= 2 of them so
    true cross-document repeats exist in most examples."""
    docs = draw(st.lists(_doc, min_size=3, max_size=6))
    motif = draw(_motif)
    where = draw(st.lists(st.integers(0, len(docs) - 1), min_size=2,
                          max_size=3))
    out = []
    for i, t in enumerate(docs):
        if i in where:
            cut = draw(st.integers(0, len(t)))
            t = t[:cut] + motif + t[cut:]
        out.append((i, t))
    return out


def _brute_repeated_spans(docs, L, min_docs=2):
    from collections import defaultdict

    occ = defaultdict(set)
    for did, t in docs:
        for i in range(len(t) - L + 1):
            occ[t[i:i + L]].add(did)
    rep = {g for g, s in occ.items() if len(s) >= min_docs}
    out = {}
    for did, t in docs:
        pos = [i for i in range(len(t) - L + 1) if t[i:i + L] in rep]
        covered = set()
        for i in pos:
            covered.update(range(i, i + L))
        frac = (len(covered) / len(t)) if len(t) else 0.0
        out[did] = (len(pos), frac)
    return out


@settings(max_examples=12, deadline=None)
@given(_corpus())
def test_repeated_spans_matches_bruteforce_on_unicode(spark, corpus):
    """The rolling-hash kernel must agree with a raw-string brute force on
    arbitrary unicode corpora: identical repeated-position counts and
    bit-identical coverage fractions (same integer division), including
    docs shorter than one span (0 spans, 0.0 fraction) and empty docs."""
    from kafkastreams_tp3_is_spark import cache
    from kafkastreams_tp3_is_spark.operators.dedup import repeated_spans_df

    L = 5
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    res = repeated_spans_df(df, span_len=L)
    try:
        got = {r["doc_id"]: (r["n_repeated_spans"], r["dup_char_fraction"])
               for r in res.collect()}
    finally:
        cache.release(res)
    want = _brute_repeated_spans(corpus, L)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1 << 40), _doc), min_size=1,
                max_size=6, unique_by=lambda t: t[0]))
def test_doc_chunk_df_tiles_arbitrary_unicode(spark, rows):
    """doc_chunk semantics on arbitrary unicode: chunks tile the text with
    the configured stride and reconstruct it exactly (character-based
    positions, not bytes)."""
    from kafkastreams_tp3_is_spark.operators.curation import doc_chunk

    chunk, overlap, stride = 12, 4, 8
    # route through a temp view shaped like the documents table
    df = spark.createDataFrame(
        [(i, t, "x", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long")
    import kafkastreams_tp3_is_spark.operators.curation as cur
    orig_load = cur.load
    cur.load = lambda _s, _d, _t: df
    try:
        out = doc_chunk(spark, SF_DIR, chunk_chars=chunk, overlap=overlap)
        by_doc: dict = {}
        for r in out.collect():
            by_doc.setdefault(r["doc_id"], []).append(r)
    finally:
        cur.load = orig_load
    texts = dict(rows)
    assert set(by_doc) == set(texts)
    for did, chunks in by_doc.items():
        t = texts[did]
        chunks.sort(key=lambda r: r["chunk_index"])
        rebuilt = "".join(c["chunk_text"][:stride] for c in chunks[:-1])
        rebuilt += chunks[-1]["chunk_text"]
        assert rebuilt == t
        for c in chunks:
            assert c["chunk_text"] == t[c["chunk_start"]:
                                        c["chunk_start"] + chunk]


# --- round-4 kernels ---------------------------------------------------

_ws_doc = st.text(alphabet=_ALPHA + "\t\n ", min_size=0, max_size=60)


@settings(max_examples=12, deadline=None)
@given(st.lists(_ws_doc, min_size=1, max_size=5))
def test_tokenize_ids_matches_python_reference(spark, texts):
    """tokenize_ids on random mixed-width unicode == Python reference:
    same (pos, token) stream per doc, ids in [0, 32000), equal tokens ->
    equal ids."""
    import hashlib
    import re

    from kafkastreams_tp3_is_spark.operators.retrieval import (
        tokenize_ids_df)

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {}
    for r in tokenize_ids_df(docs).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["pos"], r["token"], r["token_id"]))
    for d in got.values():
        d.sort()
    want = {}
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"\s+", t.lower()) if w != ""]
        want[i] = [
            (p, w,
             int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 32000)
            for p, w in enumerate(toks)]
    want = {k: v for k, v in want.items() if v}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abc", min_size=1, max_size=3),
                          st.integers(1, 50)),
                min_size=1, max_size=12),
       st.integers(2, 6))
def test_heavy_hitters_match_exact_counts(spark, weighted, support_inv):
    """heavy_hitters on a random weighted token multiset == the exact
    filter count*support_inv >= total, regardless of partitioning."""
    from kafkastreams_tp3_is_spark.operators.sketch import heavy_hitters_df

    tokens = []
    for tok, w in weighted:
        tokens.extend([tok] * w)
    text = " ".join(tokens)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = {(r["token"], r["n_occurrences"])
           for r in heavy_hitters_df(docs, support_inv=support_inv).collect()}
    from collections import Counter
    c = Counter(tokens)
    total = sum(c.values())
    want = {(t, n) for t, n in c.items() if n * support_inv >= total}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(_ws_doc, min_size=1, max_size=6),
       st.integers(2, 16))
def test_pack_token_sequences_is_dense_and_lossless(spark, texts, seq_len):
    """Packing any random corpus yields, per shard, a dense 0..n-1 token
    stream cut every seq_len, covering exactly the tokenized corpus."""
    from kafkastreams_tp3_is_spark.operators.retrieval import (
        pack_token_sequences_df, tokenize_ids_df)

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    toks = tokenize_ids_df(docs)
    n_tokens = toks.count()
    out = pack_token_sequences_df(toks, seq_len=seq_len, n_shards=4).collect()
    assert len(out) == n_tokens
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(
            (r["seq_index"], r["pos_in_seq"]))
    for stream in by_shard.values():
        stream.sort()
        assert stream == [(i // seq_len, i % seq_len)
                          for i in range(len(stream))]


def test_bloom_prefilter_has_no_false_negatives_and_matches_exact(spark):
    """The Bloom upper bound must dominate the true shared-shingle count
    for EVERY training doc (no false negatives by construction), and the
    final verdicts must equal the exact path's."""
    from pyspark.sql import functions as F

    from kafkastreams_tp3_is_spark.operators.curation import decontaminate_df
    from kafkastreams_tp3_is_spark.operators.sketch import (
        bloom_decontaminate_df)
    from kafkastreams_tp3_is_spark.views import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents")
    is_bench = F.col("doc_id") % 50 == 0
    train, bench = docs.where(~is_bench), docs.where(is_bench)
    for min_overlap in (50, 190):
        got = {r["doc_id"]: r["contaminated"]
               for r in bloom_decontaminate_df(
                   train, bench, min_overlap=min_overlap).collect()}
        want = {r["doc_id"]: r["contaminated"]
                for r in decontaminate_df(
                    train, bench, min_overlap=min_overlap).collect()}
        assert got == want
    assert len(got) == train.count()
    assert any(got.values()) and not all(got.values()), \
        "fixture must exercise both verdict branches"


@settings(max_examples=8, deadline=None)
@given(_corpus())
def test_bloom_span_decontaminate_matches_unfiltered_on_unicode(spark,
                                                                corpus):
    """The Bloom-prefiltered span decontamination must equal the
    unfiltered operator row-for-row on arbitrary unicode corpora —
    including multibyte/astral text, empty docs, and docs shorter than
    one span (the prefilter may only prune, never change a verdict)."""
    from kafkastreams_tp3_is_spark import cache
    from kafkastreams_tp3_is_spark.operators.dedup import (
        bloom_decontaminate_spans_df, decontaminate_spans_df)

    L = 5
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    train = df.where("doc_id % 2 = 0")
    bench = df.where("doc_id % 2 = 1")
    a = decontaminate_spans_df(train, bench, span_len=L)
    b = bloom_decontaminate_spans_df(train, bench, span_len=L,
                                     m_bits=1 << 12)
    try:
        got_a = sorted(tuple(r) for r in a.collect())
        got_b = sorted(tuple(r) for r in b.collect())
    finally:
        cache.release(a)
        cache.release(b)
    assert got_a == got_b


@st.composite
def _fingerprints(draw):
    """Random 64-bit fingerprints with planted near copies: every id
    10_000+i is id i's fingerprint with 0-3 random bits flipped, so true
    hamming<=3 pairs exist in every example alongside far pairs."""
    base = draw(st.lists(st.integers(0, (1 << 64) - 1), min_size=2,
                         max_size=8, unique=True))
    rows = [(i, v) for i, v in enumerate(base)]
    for i, v in enumerate(base[:3]):
        nflip = draw(st.integers(0, 3))
        positions = draw(st.lists(st.integers(0, 63), min_size=nflip,
                                  max_size=nflip, unique=True))
        for p in positions:
            v ^= 1 << p
        rows.append((10_000 + i, v))
    return rows


@settings(max_examples=10, deadline=None)
@given(_fingerprints())
def test_hamming_pairs_equal_bruteforce(spark, rows):
    """The 20-table block-combination machinery must produce EXACTLY the
    all-pairs hamming<=3 answer on arbitrary fingerprints (recall is
    guaranteed by pigeonhole; precision by the bit_count verify) —
    including fingerprints with the sign bit set and exact duplicates."""
    from itertools import combinations

    from kafkastreams_tp3_is_spark.operators.dedup import hamming_pairs_df

    to_signed = lambda v: v - (1 << 64) if v >= (1 << 63) else v
    df = spark.createDataFrame(
        [(i, to_signed(v)) for i, v in rows], "doc_id long, sim_long long")
    got = {(r["a_id"], r["b_id"]): r["hamming"]
           for r in hamming_pairs_df(df).collect()}
    fps = dict(rows)
    want = {(a, b): bin(fps[a] ^ fps[b]).count("1")
            for a, b in combinations(sorted(fps), 2)
            if bin(fps[a] ^ fps[b]).count("1") <= 3}
    assert got == want


def test_packed_bitset_matches_per_position_build(spark):
    """The distributed bit-block aggregation (groupBy(p div 64) +
    bit_or(shiftleft)) must produce the EXACT bitset a per-position
    driver collect builds — including block 0, the last partial block,
    and bit 63 (the sign bit of the packed long)."""
    import numpy as np

    from kafkastreams_tp3_is_spark.operators.sketch import packed_bitset

    m_bits = 200  # deliberately not a multiple of 64: 4 blocks, last partial
    pos = [0, 1, 63, 64, 65, 127, 128, 190, 199, 199, 63]  # dups too
    df = spark.createDataFrame([(p,) for p in pos], "p long")
    got = packed_bitset(df, m_bits)
    want = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    for p in pos:
        want[p >> 6] |= np.uint64(1) << np.uint64(p & 63)
    assert got.dtype == np.uint64 and len(got) == 4
    assert (got == want).all()
    # empty set -> all-zero bitset of the right shape
    empty = packed_bitset(df.where("p < 0"), m_bits)
    assert (empty == 0).all() and len(empty) == 4


@given(vecs=st.lists(
    st.lists(st.floats(min_value=-1e6, max_value=1e6,
                       allow_nan=False, allow_infinity=False,
                       width=32),
             min_size=4, max_size=8),
    min_size=1, max_size=6))
@settings(max_examples=25, deadline=None)
def test_sq8_quantizer_properties_on_random_vectors(spark, vecs):
    """For arbitrary finite float vectors (including all-zero and
    near-zero), the staged quantizer must (a) emit codes in [-127, 127],
    (b) keep every code within 0.5 of the ideal x*127/scale computed in
    python float64 (same IEEE ops), and (c) agree exactly with the
    expression form sq8_quantize — staging is an execution-plan change,
    not a semantics change."""
    from kafkastreams_tp3_is_spark.operators.similarity import (
        sq8_quantize, sq8_quantized)
    from pyspark.sql import functions as F
    import math

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    staged = {r["vec_id"]: (r["qv"], r["qq"])
              for r in sq8_quantized(df).collect()}
    qv_expr, _ = sq8_quantize(F.col("embedding"))
    expr = {r["vec_id"]: r["q"]
            for r in df.select("vec_id", qv_expr.alias("q")).collect()}
    # float32 storage first, like the parquet embeddings
    as_f32 = {r["vec_id"]: r["e"]
              for r in df.select("vec_id", F.col("embedding").alias("e"))
                         .collect()}
    for vid, (qv, qq) in staged.items():
        assert qv == expr[vid]
        v = as_f32[vid]
        scale = max(max((abs(x) for x in v), default=0.0), 1e-30)
        for x, code in zip(v, qv):
            assert -127 <= code <= 127
            ideal = x * 127.0 / scale
            assert abs(code - ideal) <= 0.5 + 1e-9, (x, scale, code)
        assert qq == sum(c * c for c in qv)
        assert math.isfinite(qq)


@given(rows=st.lists(
    st.tuples(st.sampled_from(["t0", "t1", "t2", "t3", ""]),
              st.sampled_from(["A", "B", "C"])),
    min_size=0, max_size=24))
@settings(max_examples=25, deadline=None)
def test_source_overlap_matrix_matches_bruteforce(spark, rows):
    """Random (text, source) corpora vs an all-pairs python reference:
    every unordered doc pair with equal text contributes to exactly one
    (source_a<=source_b) cell."""
    from collections import Counter
    from itertools import combinations

    from kafkastreams_tp3_is_spark.operators.curation import (
        source_overlap_matrix_df)

    docs = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): r["n_dup_pairs"]
           for r in source_overlap_matrix_df(docs).collect()}
    want = Counter()
    for (i, (ta, sa)), (j, (tb, sb)) in combinations(enumerate(rows), 2):
        if ta == tb:
            want[tuple(sorted((sa, sb)))] += 1
    assert got == dict(want)


def test_bloom_bit_math_jvm_vs_numpy_bit_identical(spark):
    """Executable sync guard for the two hand-copied numpy probe
    kernels (sketch.bloom_decontaminate_df / dedup.
    bloom_decontaminate_spans_df): the XOR/shift mixing + double-mod
    below is the SINGLE reference restatement of their shared math, and
    it must reproduce the JVM build side (_bloom_positions) bit-for-bit
    on adversarial int64 hashes — signed overflow of the wrapping <<21,
    sign-extension of >>33, and pmod of negative mixes are exactly
    where a drifted copy diverges. The end-to-end verdict-equality
    tests above then tie each closure's copy to the same JVM bitset
    (a drifted closure produces false negatives and flips verdicts),
    so JVM==reference here plus verdicts==exact there pins all three
    copies together without forcing the closures to import module
    helpers (they must stay self-contained for executor shipping)."""
    import numpy as np

    from pyspark.sql import functions as F
    from kafkastreams_tp3_is_spark.operators.sketch import _bloom_positions

    m_bits = 1 << 20
    rng = np.random.default_rng(7)
    hashes = np.concatenate([
        rng.integers(-(2 ** 63), 2 ** 63 - 1, size=4096, dtype=np.int64),
        np.array([0, 1, -1, 2 ** 63 - 1, -(2 ** 63), 63, -64,
                  (1 << 33) - 1, -(1 << 33), (1 << 21), -(1 << 21)],
                 dtype=np.int64),
    ])

    df = spark.createDataFrame([(int(h),) for h in hashes], "h long")
    jvm = (df.select("h", _bloom_positions(F.col("h"), m_bits).alias("ps"))
           .collect())
    jvm_pos = {r["h"]: tuple(r["ps"]) for r in jvm}

    h = hashes
    hu = h.view(np.uint64)
    p1 = np.mod(h, m_bits)
    mixed = (h
             ^ (hu >> np.uint64(33)).view(np.int64)
             ^ (hu << np.uint64(21)).view(np.int64))
    p2 = np.mod(mixed, m_bits)
    for i, hv in enumerate(h.tolist()):
        assert jvm_pos[hv] == (int(p1[i]), int(p2[i])), hex(hv & (2**64 - 1))


def _brute_winnow(text, k, w, hash_fn):
    """Naive SIGMOD'03 winnowing: hash every k-gram, rightmost minimum
    of each w-window, dedup. The reference the sparse-table kernel in
    operators.dedup._winnow_df must reproduce exactly."""
    t = text or ""
    hashes = [hash_fn(t[i:i + k]) for i in range(len(t) - k + 1)]
    out = set()
    for j in range(len(hashes) - w + 1):
        win = hashes[j:j + w]
        mn = min(win)
        pos = j + max(i for i, h in enumerate(win) if h == mn)
        out.add((pos, hashes[pos]))
    return out


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHA, min_size=0, max_size=80),
                min_size=1, max_size=5))
def test_winnow_kernel_matches_bruteforce(spark, texts):
    """The zip_with/least sparse-table winnowing kernel (and its
    adjacent-compare dedup) must emit EXACTLY the naive per-window
    rightmost-min fingerprint set on arbitrary texts — including empty
    strings, texts shorter than k, and texts with heavy repeats (where
    the monotone-argmin dedup argument is doing real work). Hash parity
    comes from restating the md5-prefix bigint in Python."""
    import hashlib

    from kafkastreams_tp3_is_spark.operators.dedup import (
        winnow_fingerprints_df)

    k, w = 8, 4

    def md5_prefix(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints_df(docs, k, w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in enumerate(texts):
        want = _brute_winnow(t, k, w, md5_prefix)
        assert got.get(i, set()) == want, f"doc {i}: {t!r}"


@settings(max_examples=12, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHA, min_size=0, max_size=80),
                min_size=1, max_size=5))
def test_winnow_fast_numpy_kernel_matches_bruteforce(spark, texts):
    """The Arrow-batched numpy winnowing kernel must emit EXACTLY the
    naive per-window rightmost-min set under ITS hash (the splitmix64-
    finalized polynomial over UTF-32 codepoints, restated here in plain
    Python with uint64 wraparound) — same selection contract as the JVM
    kernel's property test."""
    from kafkastreams_tp3_is_spark.operators.dedup import (
        winnow_fingerprints_fast_df)

    k, w = 8, 4
    M = (1 << 64) - 1

    def poly_hash(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 1099511628211 + ord(ch)) & M
        h ^= h >> 30
        h = (h * 0xBF58476D1CE4E5B9) & M
        h ^= h >> 27
        h = (h * 0x94D049BB133111EB) & M
        h ^= h >> 31
        # signed int64 view BEFORE selection — the kernel's min is the
        # signed bigint min, same as the JVM twins'
        return h - (1 << 64) if h >= (1 << 63) else h

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints_fast_df(docs, k, w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in enumerate(texts):
        want = _brute_winnow(t, k, w, poly_hash)
        assert got.get(i, set()) == want, f"doc {i}: {t!r}"


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHA, min_size=0, max_size=40),
                min_size=1, max_size=4))
def test_fast_winnow_duckdb_oracle_matches_reference(texts):
    """The DuckDB wrapping-uint64 restatement of the fast-winnow gram
    hash + selection (oracles._FAST_GRAMS — UHUGEINT-mod-2^64
    multiplies, staged xor/shift passes, signed view) must equal the
    plain-Python uint64 reference on ARBITRARY unicode, astral chars
    included — the oracle itself, not just the kernel, is pinned."""
    import duckdb

    from kafkastreams_tp3_is_spark.oracles import (_FAST_GRAMS,
                                                   _winnow_fps_sql)

    k, w = 8, 4
    M = (1 << 64) - 1

    def poly_hash(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 1099511628211 + ord(ch)) & M
        h ^= h >> 30
        h = (h * 0xBF58476D1CE4E5B9) & M
        h ^= h >> 27
        h = (h * 0x94D049BB133111EB) & M
        h ^= h >> 31
        return h - (1 << 64) if h >= (1 << 63) else h

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)",
                    [(i, t) for i, t in enumerate(texts)])
    got: dict = {}
    for doc_id, pos, fp in con.execute(
            _winnow_fps_sql("d", _FAST_GRAMS)).fetchall():
        got.setdefault(doc_id, set()).add((pos, fp))
    con.close()
    for i, t in enumerate(texts):
        want = _brute_winnow(t, k, w, poly_hash)
        assert got.get(i, set()) == want, f"doc {i}: {t!r}"


def test_lsh_projection_margin_dwarfs_reordering_error():
    """ann_recall_lsh's cross-engine validity rests on no projection
    sign flipping between numpy's BLAS summation order and the
    oracle's sequential fold. The reordering error is ~n*eps*|terms|
    ~ 1e-13; assert the smallest |projection| over the whole sf0.001
    corpus x all 64 planes is orders of magnitude above it, so the
    sign set — hence the bucket keys, candidates, and the recall
    report — is engine-order-invariant with wide margin."""
    import numpy as np
    import pyarrow.parquet as pq

    emb = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet").to_pandas()
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    planes = np.random.default_rng(42).standard_normal((M.shape[1], 64))
    margin = np.abs(M @ planes).min()
    assert margin > 1e-9, f"projection margin {margin} too small"
