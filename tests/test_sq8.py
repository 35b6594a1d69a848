"""int8 scalar-quantized ANN (operators/similarity.py sq8 family).

The oracle gate already pins the quantized ranking bit-for-bit against
DuckDB; these tests pin the properties the oracle can't see — fidelity
to the FLOAT baseline, the quantizer's error bound, and the zero-vector
guard.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreams_tp3_is_spark.operators.similarity import (
    cosine_topk_bruteforce, cosine_topk_sq8, sq8_quantize)

from tests.conftest import SF_DIR


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_sq8_topk_overlap_floor(spark):
    """int8 quantization of 64-dim vectors must keep >=90% of the float
    top-10 per query (measured 100% on the synthetic corpus at sf0.001
    and sf0.01; the floor leaves headroom for unlucky boundary ties)."""
    exact = _topk_sets(cosine_topk_bruteforce(spark, SF_DIR))
    quant = _topk_sets(cosine_topk_sq8(spark, SF_DIR))
    hit = sum(len(exact[q] & quant[q]) for q in exact)
    tot = sum(len(exact[q]) for q in exact)
    assert hit / tot >= 0.9, (hit, tot)


def test_sq8_quantizer_error_bound(spark):
    """Round-half-up quantization: every code is within 0.5 of the ideal
    x*127/scale, and codes never leave [-127, 127]."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv, scale = sq8_quantize(F.col("embedding"))
    err = F.array_max(F.zip_with(
        qv, F.transform("embedding", lambda x: x.cast("double")),
        lambda q, x: F.abs(q.cast("double") - x * F.lit(127.0) / scale)))
    row = (emb.select(err.alias("err"),
                      F.array_max(F.transform(qv, F.abs)).alias("amax"))
              .agg(F.max("err").alias("e"), F.max("amax").alias("m"))
              .first())
    assert row["e"] <= 0.5 + 1e-12, row
    assert row["m"] <= 127, row


def test_sq8_rescored_matches_exact_baseline(spark):
    """Two-phase retrieval (int8 shortlist of 3k, float rescore) must
    reproduce the exact float top-k EXACTLY — same neighbor at every
    (query, rank) — because the rescore fold is the same arithmetic as
    the brute-force path and the shortlist contains the true top-k."""
    from kafkastreams_tp3_is_spark.operators.similarity import (
        cosine_topk_sq8_rescored_df)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in cosine_topk_sq8_rescored_df(emb).collect()}
    want = {(r["query_id"], r["rank"]): r["neighbor_id"]
            for r in cosine_topk_bruteforce(spark, SF_DIR).collect()}
    assert got == want


def test_sq8_zero_vector_guard(spark):
    """The all-zero vector must quantize to all zeros (scale floored at
    1e-30 — no division by zero, no NULL/NaN codes) with qdot 0."""
    df = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [0.5, -1.0] + [0.0] * 6)],
        "vec_id long, embedding array<float>")
    qv, _ = sq8_quantize(F.col("embedding"))
    rows = {r["vec_id"]: r["q"] for r in df.select("vec_id",
                                                   qv.alias("q")).collect()}
    assert rows[1] == [0] * 8
    assert None not in rows[2] and rows[2][1] == -127


def test_sq8_topk_plan_shape(spark):
    """The sq8 scorer's plan must keep its scale invariants: the tiny
    quantized query head rides ONE BroadcastExchange into the pair scan
    (a broadcast nested-loop, never a CartesianProduct shuffle), and the
    per-query top-k is pre-pruned map-side — a Partial WindowGroupLimit
    below the rank Exchange plus the Final above it."""
    plan = (cosine_topk_sq8(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("BroadcastExchange") == 1
    assert "CartesianProduct" not in plan
    assert plan.count("WindowGroupLimit") == 2      # Partial + Final


def test_matryoshka_recall_full_width_is_one_and_bounded(spark):
    """Matryoshka evaluation invariants: the full-width row is recall
    1.0 for EVERY query (truncating at the full dimension is the
    identity, so the ranking equals the baseline by construction), and
    every (n_hits, recall) pair is consistent and within [0, k]."""
    from kafkastreams_tp3_is_spark.operators.similarity import (
        embedding_matryoshka_recall)
    from tests.conftest import SF_DIR

    rows = embedding_matryoshka_recall(spark, SF_DIR).collect()
    dims = {r["dim"] for r in rows}
    assert dims == {16, 32, 64}
    n_queries = len({r["query_id"] for r in rows})
    assert len(rows) == 3 * n_queries
    for r in rows:
        assert 0 <= r["n_hits"] <= r["k"]
        assert r["recall"] == r["n_hits"] / r["k"]
        if r["dim"] == 64:
            assert r["n_hits"] == r["k"], "full width must be identity"


def test_ann_recall_reports(spark):
    """Recall floors for the driver-visible ANN recall reports: the
    hash-gated flat-IVF and LSH reports plus the rows-only trained/
    stored reports must all clear a 0.6 per-query floor at sf0.001
    (actual values 0.8-1.0), and every row must satisfy the
    (n_hits, k, recall) consistency invariant."""
    from kafkastreams_tp3_is_spark.operators.similarity import (
        ann_recall_ivf, ann_recall_ivf_trained, ann_recall_lsh,
        ann_recall_stored)

    for fn in (ann_recall_lsh, ann_recall_ivf, ann_recall_ivf_trained,
               ann_recall_stored):
        rows = fn(spark, SF_DIR).collect()
        assert len(rows) == 5, fn.__name__
        for r in rows:
            assert r["k"] == 10
            assert 0 <= r["n_hits"] <= r["k"], fn.__name__
            assert r["recall"] == r["n_hits"] / r["k"], fn.__name__
            assert r["recall"] >= 0.6, (fn.__name__, r)


def test_ivf_flat_probe_subset_of_exact_when_all_cells_probed(spark):
    """With nprobe = n_centroids and m_assign = n_centroids the flat
    IVF probe degenerates to brute force — its top-10 must EQUAL the
    exact ranking (machinery-correctness invariant, not a recall
    statement)."""
    from kafkastreams_tp3_is_spark.operators.similarity import (
        _bruteforce_ranked, _ivf_flat_ranked)
    from kafkastreams_tp3_is_spark.views import load

    emb = load(spark, SF_DIR, "embeddings")
    got = {(r["query_id"], r["neighbor_id"], r["rank"])
           for r in _ivf_flat_ranked(emb, n_queries=3, k=10,
                                     n_centroids=8, m_assign=8,
                                     nprobe=8).collect()}
    want = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in _bruteforce_ranked(emb, 3)
            .where("rank <= 10").collect()}
    assert got == want


def test_ann_cosine_topk_lsh_gate_pins_parameters(spark):
    """The registry's hash-gated wrapper refuses non-default parameters:
    the DuckDB oracle embeds n_queries/k/planes/bands/seed as literals,
    so a non-default call would gate against a mismatched oracle
    (ADVICE r11). The general operator stays unpinned."""
    import pytest

    from kafkastreams_tp3_is_spark.operators.similarity import (
        ann_cosine_topk_lsh)

    with pytest.raises(ValueError, match="oracle pins"):
        ann_cosine_topk_lsh(spark, SF_DIR, n_queries=3)
    with pytest.raises(ValueError, match="oracle pins"):
        ann_cosine_topk_lsh(spark, SF_DIR, seed=7)
