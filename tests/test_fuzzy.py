"""Edit-distance similarity join (PassJoin): brute-force equivalence,
planted-pair recovery, unicode char semantics, and the gate's ASCII
precondition."""

from __future__ import annotations

import random
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafkastreams_tp3_is_spark.operators.fuzzy import (  # noqa: E402
    edit_distance_pairs_df, fuzzy_edit_pairs)
from tests.conftest import SF_DIR  # noqa: E402


def _brute(spark, docs, d, min_len):
    a = docs.selectExpr("doc_id AS doc_a", "text AS ta") \
            .where(f"length(coalesce(ta, '')) >= {min_len}")
    b = docs.selectExpr("doc_id AS doc_b", "text AS tb") \
            .where(f"length(coalesce(tb, '')) >= {min_len}")
    return {(r["doc_a"], r["doc_b"], r["dist"]) for r in
            a.crossJoin(b).where("doc_a < doc_b")
             .select("doc_a", "doc_b",
                     F.levenshtein("ta", "tb").cast("int").alias("dist"))
             .where(f"dist <= {d}").collect()}


def test_passjoin_equals_bruteforce_random_corpus(spark):
    """PassJoin completeness + precision: on a random corpus with
    planted 1/2-edit clones, the candidate-join + verify must produce
    EXACTLY the brute-force levenshtein<=d pair set (no false
    negatives from the segment windows, no false positives from hash
    candidates surviving the verify)."""
    rng = random.Random(3)
    alpha = "abcdefgh "
    rows = []
    for i in range(60):
        s = "".join(rng.choice(alpha)
                    for _ in range(rng.randint(24, 90)))
        rows.append((i, s))
    for i in range(0, 60, 7):
        ls = list(rows[i][1])
        if len(ls) > 30:
            del ls[7]          # one deletion
        ls[3] = "z"            # one substitution
        rows.append((1000 + i, "".join(ls)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"], r["dist"]) for r in
           edit_distance_pairs_df(docs, max_dist=2, min_len=24).collect()}
    want = _brute(spark, docs, 2, 24)
    assert got == want and len(want) >= 9


def test_fuzzy_gate_fixture_recovers_every_planted_pair(spark):
    """Every planted typo twin (delete char 40, substitute char 80) of
    a long-enough every-25th doc must be recovered at distance <= 2,
    paired with its source."""
    out = fuzzy_edit_pairs(spark, SF_DIR).collect()
    planted = {(r["doc_a"], r["doc_b"]) for r in out
               if r["doc_b"] >= 8_000_000_000}
    n_expected = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                  .where("doc_id % 25 = 0 AND "
                         "length(coalesce(text, '')) >= 81").count())
    assert len(planted) >= n_expected
    direct = {(a, b) for a, b in planted if b == a + 8_000_000_000}
    assert len(direct) == n_expected


def test_unicode_char_edits_and_gate_ascii_precondition(spark, duck):
    """The OPERATOR counts character edits on unicode (Spark
    levenshtein semantics): 'café'->'cafe' is ONE edit even though é
    is two UTF-8 bytes. The GATE's cross-engine validity rests on the
    corpus being ASCII (DuckDB levenshtein counts bytes) — assert the
    test corpus actually is."""
    docs = spark.createDataFrame(
        [(1, "café " + "x" * 24), (2, "cafe " + "x" * 24)],
        "doc_id long, text string")
    rows = edit_distance_pairs_df(docs, max_dist=1, min_len=24).collect()
    assert [(r["doc_a"], r["doc_b"], r["dist"]) for r in rows] == [(1, 2, 1)]

    n_non_ascii = duck.execute(
        "SELECT COUNT(*) FROM documents "
        "WHERE text IS NOT NULL AND NOT text ~ '^[\\x00-\\x7F]*$'"
    ).fetchone()[0]
    assert n_non_ascii == 0, "gate precondition: ASCII corpus"


def test_min_len_contract_excludes_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "short"), (2, "short"), (3, "a" * 30), (4, "a" * 30)],
        "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]) for r in
           edit_distance_pairs_df(docs, max_dist=2, min_len=24).collect()}
    assert got == {(3, 4)}


def test_fuzzy_dup_clusters_canonicals(spark):
    """Planted typo twins must land in 2-clusters whose canonical is
    the ORIGINAL doc (min id), and every emitted cluster must be
    internally consistent (cluster_id = min member, exactly one
    canonical per cluster)."""
    from collections import defaultdict

    from kafkastreams_tp3_is_spark.operators.fuzzy import (
        fuzzy_dup_clusters)

    rows = fuzzy_dup_clusters(spark, SF_DIR).collect()
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r)
    assert by_cluster
    for cid, members in by_cluster.items():
        ids = {m["doc_id"] for m in members}
        assert cid == min(ids)
        assert sum(1 for m in members if m["is_canonical"]) == 1
        twins = {i for i in ids if i >= 8_000_000_000}
        for t in twins:
            assert t - 8_000_000_000 in ids   # twin clustered with source


def _brute_all(spark, docs, d):
    """Brute-force levenshtein<=d over the WHOLE corpus (no length
    floor) — the ground truth for the full-corpus union."""
    a = docs.selectExpr("doc_id AS doc_a",
                        "coalesce(text, '') AS ta")
    b = docs.selectExpr("doc_id AS doc_b",
                        "coalesce(text, '') AS tb")
    return {(r["doc_a"], r["doc_b"], r["dist"]) for r in
            a.crossJoin(b).where("doc_a < doc_b")
             .select("doc_a", "doc_b",
                     F.levenshtein("ta", "tb").cast("int").alias("dist"))
             .where(f"dist <= {d}").collect()}


def test_short_companion_plus_segment_path_equals_bruteforce(spark):
    """The r10 verdict's missing piece: edit_distance_pairs_all_df
    (segment path >= min_len UNION short-string companion) must equal
    brute force over a MIXED-length corpus — reference-scale short keys
    (Route_7/Trip_42 sizes), identical short strings (distance 0),
    BOUNDARY pairs straddling min_len (23 vs 24/25 chars — covered by
    neither the old segment path nor a naive both-short rule), and the
    long strings the segment path owns."""
    from kafkastreams_tp3_is_spark.operators.fuzzy import (
        edit_distance_pairs_all_df, edit_distance_pairs_short_df)

    rng = random.Random(11)
    alpha = "abcdefgh "
    rows = [
        (1, "Route_7"), (2, "Rout_7"), (3, "Route_7"),     # typo + exact dup
        (4, "Trip_42"), (5, "Trip_421"), (6, "Trxp_42"),
        (7, ""), (8, None),                                 # empty/NULL
        (9, "b" * 23), (10, "b" * 24), (11, "b" * 25),      # boundary band
        (12, "b" * 26),                                     # long side only
    ]
    for i in range(40):
        rows.append((100 + i, "".join(
            rng.choice(alpha) for _ in range(rng.randint(1, 60)))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"], r["dist"]) for r in
           edit_distance_pairs_all_df(docs, max_dist=2,
                                      min_len=24).collect()}
    want = _brute_all(spark, docs, 2)
    assert got == want
    # the planted structure actually exercised every family
    assert (1, 3, 0) in want                      # identical short keys
    assert (1, 2, 1) in want                      # short typo
    assert (9, 11, 2) in want and (9, 10, 1) in want   # boundary pairs
    assert (10, 12, 2) in want                    # both >= min_len
    # disjointness: the short companion emits ONLY pairs whose shorter
    # side is under min_len (no double counting in the union)
    short = edit_distance_pairs_short_df(docs, max_dist=2, min_len=24)
    assert short.count() == short.distinct().count()
    lens = {r["doc_id"]: len(r["text"] or "") for r in docs.collect()}
    for ra, rb, _ in {(r["doc_a"], r["doc_b"], r["dist"])
                      for r in short.collect()}:
        assert min(lens[ra], lens[rb]) < 24


def test_fuzzy_all_gate_fixture_recovers_planted_short_pairs(spark):
    """Driver fixture: every planted Route_<id>/Rout_<id> twin must be
    recovered at distance 1, every planted exact short duplicate at
    distance 0, and the long typo twins stay recovered."""
    from kafkastreams_tp3_is_spark.operators.fuzzy import (
        fuzzy_edit_pairs_all)
    from kafkastreams_tp3_is_spark.views import load

    docs = load(spark, SF_DIR, "documents")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    pairs = {(r["doc_a"], r["doc_b"]): r["dist"] for r in
             fuzzy_edit_pairs_all(spark, SF_DIR).collect()}
    planted50 = [i for i in ids if i % 50 == 0]
    assert planted50
    for i in planted50:
        assert pairs.get((9_000_000_000 + i, 9_500_000_000 + i)) == 1
    for i in ids:
        if i % 100 == 0:
            assert pairs.get((9_000_000_000 + i, 9_750_000_000 + i)) == 0
    long_twins = [(i, 8_000_000_000 + i) for i in ids if i % 25 == 0]
    assert any(p in pairs for p in long_twins)


def test_cross_table_join_equals_bruteforce(spark):
    """edit_distance_join_df (the A-x-B variant): directional PassJoin
    for long pairs + length-banded short path must equal brute force
    over mixed-length corpora on BOTH sides, including boundary pairs
    and pairs where the LEFT string is the longer one (the self-join's
    least/greatest canonicalization does not exist here)."""
    from kafkastreams_tp3_is_spark.operators.fuzzy import (
        edit_distance_join_df)

    rng = random.Random(7)
    alpha = "abcdefgh "
    left_rows = [(1, "Route_7"), (2, "b" * 25), (3, "b" * 23), (4, None)]
    right_rows = [(100, "Rout_7"), (101, "b" * 24), (102, "b" * 23),
                  (103, "")]
    for i in range(30):
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 60)))
        (left_rows if i % 2 else right_rows).append((200 + i, s))
        if i % 5 == 0:  # cross-table near-twin: one substitution
            (right_rows if i % 2 else left_rows).append(
                (300 + i, ("z" + s[1:]) if s else s))
    left = spark.createDataFrame(left_rows, "doc_id long, text string")
    right = spark.createDataFrame(right_rows, "doc_id long, text string")
    got = {(r["l_id"], r["r_id"], r["dist"]) for r in
           edit_distance_join_df(left, right, max_dist=2,
                                 min_len=24).collect()}
    lf = left.selectExpr("doc_id AS l_id", "coalesce(text,'') AS tl")
    rf = right.selectExpr("doc_id AS r_id", "coalesce(text,'') AS tr")
    want = {(r["l_id"], r["r_id"], r["dist"]) for r in
            lf.crossJoin(rf)
            .select("l_id", "r_id",
                    F.levenshtein("tl", "tr").cast("int").alias("dist"))
            .where("dist <= 2").collect()}
    assert got == want
    assert (1, 100, 1) in want            # short cross twin
    assert (2, 101, 1) in want            # long boundary-ish pair
    assert (3, 101, 1) in want and (3, 102, 0) in want  # 23 vs 24 / 23


def test_fuzzy_dedup_against_drops_exactly_planted(spark):
    """Driver fixture semantics: the %40 long docs (1-char-substituted
    reference twins) and the planted Rout_<id> keys drop; everything
    else survives (no accidental contamination on the synthetic
    corpus)."""
    from kafkastreams_tp3_is_spark.operators.fuzzy import (
        fuzzy_dedup_against)
    from kafkastreams_tp3_is_spark.views import load

    docs = load(spark, SF_DIR, "documents")
    long_enough = {r["doc_id"] for r in docs
                   .where("doc_id % 40 = 0 AND "
                          "length(coalesce(text,'')) >= 51")
                   .select("doc_id").collect()}
    keys50 = {r["doc_id"] for r in
              docs.where("doc_id % 50 = 0").select("doc_id").collect()}
    out = {r["doc_id"]: r["dropped"] for r in
           fuzzy_dedup_against(spark, SF_DIR).collect()}
    for i in long_enough:
        assert out[i], f"planted mutated twin for doc {i} not caught"
    for i in keys50:
        assert out[9_500_000_000 + i], f"short typo key for {i} not caught"
    survivors = [i for i, dropped in out.items() if not dropped]
    assert survivors, "fixture must not drop the whole corpus"


def test_fuzzy_dup_clusters_all_short_key_families(spark):
    """Full-corpus clusters: every planted short-key family
    (Route_<id> clean dup + Rout_<id> typo) must land in ONE component
    whose canonical is the lowest planted id, alongside the long
    typo-twin clusters the base composition already covers."""
    from collections import defaultdict

    from kafkastreams_tp3_is_spark.operators.fuzzy import (
        fuzzy_dup_clusters_all)
    from kafkastreams_tp3_is_spark.views import load

    rows = fuzzy_dup_clusters_all(spark, SF_DIR).collect()
    cluster_of = {r["doc_id"]: r["cluster_id"] for r in rows}
    by_cluster = defaultdict(set)
    for r in rows:
        by_cluster[r["cluster_id"]].add(r["doc_id"])
    docs = load(spark, SF_DIR, "documents")
    for i in [r["doc_id"] for r in
              docs.where("doc_id % 50 = 0").select("doc_id").collect()]:
        route, typo = 9_000_000_000 + i, 9_500_000_000 + i
        assert cluster_of[route] == cluster_of[typo], i
        if i % 100 == 0:  # exact dup planted too
            assert cluster_of[route] == cluster_of[9_750_000_000 + i], i
    for cid, members in by_cluster.items():
        assert cid == min(members)


def test_fixture_pairs_equal_direct_computation(spark):
    """The r16 shared candidate inventory must be invisible in the
    result: fuzzy_edit_pairs (candidates read back from the per-process
    parquet store, verify per call) equals edit_distance_pairs_df run
    directly over the same planted corpus — row-for-row."""
    from kafkastreams_tp3_is_spark.operators import fuzzy

    direct = fuzzy.edit_distance_pairs_df(
        fuzzy._fixture_long_corpus(spark, SF_DIR))
    via_store = fuzzy.fuzzy_edit_pairs(spark, SF_DIR)
    a = sorted(map(tuple, via_store.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b and len(a) > 0
    # and the store is per-session: the same session reuses the path
    p1 = fuzzy._ensure_fixture_candidates(spark, SF_DIR, 2)
    p2 = fuzzy._ensure_fixture_candidates(spark, SF_DIR, 2)
    assert p1 == p2
