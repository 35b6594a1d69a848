"""Corpus-level embedding statistics: exact integer Gram/covariance
accumulation and PCA projection.

The reference has no embedding surface (its analytics stop at
route/trip aggregates); this module adds the second-moment machinery a
training-data pipeline runs over an embedding corpus — duplicate-axis
discovery, whitening, low-dimensional projection for visualization and
IVF seeding.

Design for 100 TB:
  - The Gram matrix is accumulated with ONE ``mapInPandas`` pass that
    does a per-batch int64 matmul (X^T X over sq8 codes) and emits one
    d(d+1)/2-row partial triangle per batch. The shuffle therefore
    carries n_batches x 2,080 rows (d=64) — independent of corpus row
    count — and the final agg is a trivial groupBy over d^2 keys.
  - All accumulated quantities are EXACT BIGINTs over int8 codes
    (|code| <= 127, so 10^14 vectors fit in int64 per cell), which is
    what makes the full DuckDB hash oracle possible — float SUMs are
    order-dependent and can never hash-match across engines.
  - PCA eigendecomposition happens on the driver over the d x d
    covariance (a 64 x 64 float matrix — bounded by embedding dim, not
    corpus size), exactly how Spark MLlib's own PCA does it; the
    projection back over the corpus is one Arrow-batched numpy matmul
    per batch against the broadcast component matrix.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..views import load


def _make_sq8_np():
    """Factory for the kernel-side sq8 quantizer: one vectorized
    float64 numpy pass over a pandas Series of float vectors —
    BIT-IDENTICAL to the JVM staging in similarity.sq8_quantized (cast
    float->double is exact, abs/max are exact, and x*127.0, /s, +0.5,
    floor are each one IEEE-754 double op in the same order in both
    implementations; neither fuses), so every code agrees with the
    DuckDB oracle's restatement exactly like the JVM path did (A/B
    checksum + oracle re-proven, r16). Returns the int64 code matrix.

    A FACTORY, not a module function, on purpose: mapInPandas closures
    must be self-contained (pickled by value) — a kernel referencing a
    module-level helper pickles by reference and executor workers then
    need the package importable (the driver-contract verify runs from
    /tmp and caught exactly that)."""
    def quantize(vec_series):
        import numpy as np

        x = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in vec_series], dtype=np.float64)
        s = np.maximum(np.max(np.abs(x), axis=1), 1e-30)
        return np.floor(x * 127.0 / s[:, None] + 0.5).astype(np.int64)
    return quantize


def embedding_gram_sq8_df(emb: DataFrame,
                          vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle second-moment accumulation over sq8-quantized
    embeddings: for every dim pair i <= j (0-based),

      gram    = sum over vectors of qv[i] * qv[j]   (exact bigint)
      n_vecs  = corpus row count                    (exact bigint)
      sum_qi  = sum over vectors of qv[i]           (exact bigint)
      sum_qj  = sum over vectors of qv[j]           (exact bigint)

    — everything needed to form the covariance ((gram - sum_qi*sum_qj/n)
    / n) WITHOUT a second corpus pass, all integer-exact so the DuckDB
    oracle hash-matches bit-for-bit. Quantization is the one shared sq8
    rule (floor-half-up to |127|, similarity.sq8_quantized), restated
    identically in the oracle.

    Scale: the kernel reduces each Arrow batch to one 2,080-row partial
    triangle (d=64); shuffle volume is O(n_batches * d^2), not O(rows).

    r16 (guide §4.2): quantization happens INSIDE the Arrow kernel via
    :func:`_make_sq8_np` — the JVM sq8 staging (three interpreted
    higher-order-function projections per row) fed a kernel that is
    already a numpy batch matmul, so the codes are now produced by the
    equivalent vectorized float64 ops on the raw vectors (bit-identical:
    see _make_sq8_np), and the Python boundary ships 4-byte floats
    instead of 8-byte longs."""
    _sq8 = _make_sq8_np()

    def gram_batches(it: Iterator["pd.DataFrame"]):  # noqa: F821
        import numpy as np
        import pandas as pd

        acc = None
        sums = None
        n = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = _sq8(pdf[vec_col])
            g = x.T @ x
            acc = g if acc is None else acc + g
            s = x.sum(axis=0)
            sums = s if sums is None else sums + s
            n += len(pdf)
        if acc is None:
            return
        iu = np.triu_indices(acc.shape[0])
        yield pd.DataFrame({
            "i": iu[0].astype("int32"),
            "j": iu[1].astype("int32"),
            "gram_part": acc[iu],
            "sum_qi_part": sums[iu[0]],
            "sum_qj_part": sums[iu[1]],
            "n_part": np.int64(n),
        })

    schema = ("i int, j int, gram_part bigint, sum_qi_part bigint, "
              "sum_qj_part bigint, n_part bigint")
    partials = emb.select(vec_col).mapInPandas(gram_batches, schema=schema)
    return (partials.groupBy("i", "j")
            .agg(F.sum("gram_part").cast("bigint").alias("gram"),
                 F.sum("n_part").cast("bigint").alias("n_vecs"),
                 F.sum("sum_qi_part").cast("bigint").alias("sum_qi"),
                 F.sum("sum_qj_part").cast("bigint").alias("sum_qj")))


def embedding_gram_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate fixture (FULL hash oracle — every output column an
    exact bigint/int): the sq8 Gram triangle of the embeddings table."""
    return embedding_gram_sq8_df(load(spark, sf_dir, "embeddings"))


def _pca_components(gram_rows: list, n_components: int):
    """Driver-side eigendecomposition of the covariance reconstructed
    from the integer Gram triangle. Returns (components [p x d] float64,
    means [d] float64, explained_variance [p]). Sign convention: each
    component's largest-|value| coordinate is positive (ties broken by
    lowest index), making the output deterministic across LAPACK
    builds up to that convention."""
    import numpy as np

    d = max(r["j"] for r in gram_rows) + 1
    n = gram_rows[0]["n_vecs"]
    g = np.zeros((d, d), dtype=np.float64)
    s = np.zeros(d, dtype=np.float64)
    for r in gram_rows:
        g[r["i"], r["j"]] = r["gram"]
        g[r["j"], r["i"]] = r["gram"]
        s[r["i"]] = r["sum_qi"]
        s[r["j"]] = r["sum_qj"]
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T               # p x d
    for k in range(comps.shape[0]):
        pivot = int(np.argmax(np.abs(comps[k])))
        if comps[k, pivot] < 0:
            comps[k] = -comps[k]
    return comps, mean, evals[order]


def embedding_pca_project_df(emb: DataFrame, n_components: int = 4,
                             vec_col: str = "embedding") -> DataFrame:
    """Project every embedding onto the top ``n_components`` principal
    axes of the sq8-quantized corpus: (vec_id, pc array<double> of
    length p). Two passes: the Gram pass above (collect is the bounded
    d(d+1)/2 triangle, 2,080 rows at d=64 — dimension-bounded, never
    corpus-bounded), then one projection pass (per-batch numpy matmul
    against the broadcast p x d component matrix).

    Gate is rows-only by design: eigenvectors come from LAPACK on the
    driver and DuckDB has no eigensolver; exactness is pinned instead by
    pytest properties (component orthonormality, variance ordering,
    determinism across runs, centered-projection mean ~ 0)."""
    gram_rows = [r.asDict() for r in embedding_gram_sq8_df(emb, vec_col)
                 .collect()]
    comps, mean, _ = _pca_components(gram_rows, n_components)
    comps_l = [[float(v) for v in row] for row in comps]
    mean_l = [float(v) for v in mean]
    _sq8 = _make_sq8_np()

    def project(it: Iterator["pd.DataFrame"]):  # noqa: F821
        import numpy as np
        import pandas as pd

        w = np.asarray(comps_l, dtype=np.float64)      # p x d
        m = np.asarray(mean_l, dtype=np.float64)
        for pdf in it:
            if len(pdf) == 0:
                continue
            # r16 (guide §4.2): quantize inside the kernel
            # (_make_sq8_np, bit-identical to the retired JVM staging);
            # int64 codes -> float64 is exact for |code| <= 127
            x = _sq8(pdf[vec_col]).astype(np.float64)
            y = (x - m) @ w.T                          # rows x p
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "pc": list(y)})

    return emb.select("vec_id", vec_col).mapInPandas(
        project, schema="vec_id bigint, pc array<double>")


def embedding_pca_project(spark: SparkSession, sf_dir: str,
                          n_components: int = 4) -> DataFrame:
    """Driver-gate fixture (rows-only; exactness properties pytest-
    pinned): top-4 PCA projection of the embeddings table, exploded to
    scalar ``(vec_id, component, value)`` rows so the driver's pandas
    canonicalizer (sort_values over every column) never sees an array
    cell — the array-shaped API stays on ``embedding_pca_project_df``."""
    proj = embedding_pca_project_df(load(spark, sf_dir, "embeddings"),
                                    n_components)
    return proj.select(
        "vec_id",
        F.posexplode("pc").alias("component", "value"),
    ).select(
        F.col("vec_id"),
        F.col("component").cast("int").alias("component"),
        F.col("value"),
    )


def embedding_snapshot_drift_df(emb_a: DataFrame,
                                emb_b: DataFrame) -> DataFrame:
    """Per-dimension distribution drift between two embedding-corpus
    snapshots — the monitoring table that catches a broken encoder
    deploy or a shifted ingest mix before it poisons retrieval: for
    every dim i,

      n_a, n_b, sum_a, sum_b, sq_a, sq_b   exact bigints over sq8 codes
      mean_delta                           sum_a/n_a - sum_b/n_b
      var_a, var_b                         sq/n - (sum/n)^2

    The integer accumulators ride the Gram kernel's diagonal (one
    mapInPandas pass per snapshot, d-bounded shuffle); the float
    columns are fixed operation-order arithmetic on those exact
    integers, so the whole report is full-hash verifiable. At scale
    snapshot B is yesterday's persisted accumulator row, not a second
    corpus pass."""
    def diag(emb, side):
        return (embedding_gram_sq8_df(emb)
                .where(F.col("i") == F.col("j"))
                .select("i", F.col("n_vecs").alias(f"n_{side}"),
                        F.col("sum_qi").alias(f"sum_{side}"),
                        F.col("gram").alias(f"sq_{side}")))

    a, b = diag(emb_a, "a"), diag(emb_b, "b")

    def mean(side):
        return (F.col(f"sum_{side}").cast("double")
                / F.col(f"n_{side}").cast("double"))

    def var(side):
        m = mean(side)
        return (F.col(f"sq_{side}").cast("double")
                / F.col(f"n_{side}").cast("double")) - m * m

    return (a.join(b, "i")
            .select("i", "n_a", "n_b", "sum_a", "sum_b", "sq_a", "sq_b",
                    (mean("a") - mean("b")).alias("mean_delta"),
                    var("a").alias("var_a"), var("b").alias("var_b")))


def embedding_snapshot_drift(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Driver-gate fixture (full hash oracle): drift between the
    embeddings table and a deterministic mutated snapshot (every 10th
    vector dropped — a biased-ingest simulation the oracle restates
    verbatim)."""
    emb = load(spark, sf_dir, "embeddings")
    return embedding_snapshot_drift_df(
        emb, emb.where(F.col("vec_id") % 10 != 0))
