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
