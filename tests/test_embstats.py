"""Embedding Gram / PCA operators (the registry oracle test covers the
Gram triangle's full DuckDB hash; these pin the properties the rows-only
PCA gate cannot)."""

from __future__ import annotations

import numpy as np
import pytest

from kafkastreams_tp3_is_spark.operators.embstats import (
    _pca_components,
    embedding_gram_sq8_df,
    embedding_pca_project_df,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def small_emb(spark):
    rng = np.random.RandomState(11)
    # anisotropic cloud: dim 0 has 5x the spread of the rest, so PC1 is
    # knowable in advance (up to sign, which the operator fixes)
    x = rng.randn(300, 8).astype(np.float64)
    x[:, 0] *= 5.0
    rows = [(i, [float(v) for v in x[i]]) for i in range(300)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_gram_triangle_shape_and_diagonal(small_emb):
    g = embedding_gram_sq8_df(small_emb).toPandas()
    d = 8
    assert len(g) == d * (d + 1) // 2
    assert (g["n_vecs"] == 300).all()
    diag = g[g["i"] == g["j"]]
    assert len(diag) == d and (diag["gram"] >= 0).all()
    # sum_qi on the diagonal is sum_qj (same dim)
    assert (diag["sum_qi"] == diag["sum_qj"]).all()


def test_gram_matches_numpy_exactly(small_emb):
    g = embedding_gram_sq8_df(small_emb).toPandas()
    pdf = small_emb.toPandas()
    v = np.asarray([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
    scale = np.maximum(np.abs(v).max(axis=1), 1e-30)
    qv = np.floor(v * 127.0 / scale[:, None] + 0.5).astype(np.int64)
    ref = qv.T @ qv
    sums = qv.sum(axis=0)
    for r in g.itertuples():
        assert r.gram == ref[r.i, r.j]
        assert r.sum_qi == sums[r.i] and r.sum_qj == sums[r.j]


def test_pca_components_orthonormal_and_ordered(small_emb):
    rows = [r.asDict() for r in embedding_gram_sq8_df(small_emb).collect()]
    comps, mean, evar = _pca_components(rows, 4)
    assert comps.shape == (4, 8)
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    assert (np.diff(evar) <= 1e-9).all()          # descending variance
    # sign convention: each component's largest-|value| coord positive
    for k in range(4):
        assert comps[k, int(np.argmax(np.abs(comps[k])))] > 0
    # the anisotropic axis dominates PC1
    assert int(np.argmax(np.abs(comps[0]))) == 0


def test_pca_projection_properties(small_emb):
    p = embedding_pca_project_df(small_emb, n_components=3).toPandas()
    assert len(p) == 300 and p["vec_id"].is_unique
    y = np.vstack(p.sort_values("vec_id")["pc"].values)
    assert y.shape == (300, 3)
    # projections of CENTERED data: per-component mean ~ 0
    np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-6)
    # captured variance is non-increasing across components
    var = y.var(axis=0)
    assert (np.diff(var) <= 1e-9).all()


def test_pca_projection_deterministic(small_emb):
    a = embedding_pca_project_df(small_emb, n_components=2).toPandas()
    b = embedding_pca_project_df(small_emb, n_components=2).toPandas()
    ya = np.vstack(a.sort_values("vec_id")["pc"].values)
    yb = np.vstack(b.sort_values("vec_id")["pc"].values)
    assert np.array_equal(ya, yb)


def test_gram_registry_fixture_runs(spark):
    from kafkastreams_tp3_is_spark.operators.embstats import (
        embedding_gram_sq8,
        embedding_pca_project,
    )

    g = embedding_gram_sq8(spark, SF_DIR)
    assert g.count() == 64 * 65 // 2
    # registry fixture emits scalar (vec_id, component, value) rows so the
    # driver's pandas canonicalizer never sees an array cell
    p = embedding_pca_project(spark, SF_DIR)
    assert p.columns == ["vec_id", "component", "value"]
    one_vec = p.filter(p.vec_id == p.limit(1).collect()[0]["vec_id"])
    comps = sorted(r["component"] for r in one_vec.collect())
    assert comps == [0, 1, 2, 3]


def test_snapshot_drift_detects_planted_shift(spark):
    """Drift report semantics on a hand-planted shift: snapshot B is A
    with dim 0 shifted by a constant — mean_delta fires on dim 0 only
    (quantization noise bounded elsewhere), counts are exact, and
    identical snapshots report zero drift everywhere."""
    import numpy as np

    from kafkastreams_tp3_is_spark.operators.embstats import (
        embedding_snapshot_drift_df)

    rng = np.random.RandomState(5)
    x = rng.randn(200, 6)
    rows_a = [(i, [float(v) for v in x[i]]) for i in range(200)]
    y = x.copy()
    y[:, 0] += 3.0
    rows_b = [(i, [float(v) for v in y[i]]) for i in range(200)]
    a = spark.createDataFrame(rows_a, "vec_id long, embedding array<float>")
    b = spark.createDataFrame(rows_b, "vec_id long, embedding array<float>")

    d = embedding_snapshot_drift_df(a, b).toPandas().set_index("i")
    assert (d["n_a"] == 200).all() and (d["n_b"] == 200).all()
    # dim 0's mean moved DOWN in A relative to B by ~3 in raw units;
    # sq8 codes are per-vector scaled, so just require dim 0 to dominate
    assert abs(d.loc[0, "mean_delta"]) > 3 * max(
        abs(d.loc[i, "mean_delta"]) for i in range(1, 6))

    zero = embedding_snapshot_drift_df(a, a).toPandas()
    assert (zero["mean_delta"] == 0.0).all()
    assert (zero["var_a"] == zero["var_b"]).all()
