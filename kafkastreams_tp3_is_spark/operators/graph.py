"""Graph operators for training-data pipelines: connected components and
duplicate clustering.

Pairwise near-dup detection (dedup.py, similarity.py, ivf.py) emits EDGES;
an actual dedup pass needs CLUSTERS — the transitive closure of those
edges — so one canonical document survives per group of mutual
near-duplicates (A~B and B~C put A, C in one cluster even when A!~C
directly).

Connected components runs the alternating Large-Star / Small-Star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public algorithm), which converges in O(log n) rounds
of pure DataFrame ops:

  large-star  every node connects its LARGER neighbors to the minimum of
              its neighborhood (incl. itself)
  small-star  every node connects its smaller-or-equal neighbors and
              itself to that minimum

Each round is one groupBy + one self-join — no driver-side graph state,
no collect; per-round lineage is truncated with localCheckpoint so the
plan stays bounded (at cluster scale, point the checkpoint at durable
storage instead). The fixed point is a star forest: every node points
directly at its component's minimum id, which becomes the cluster id.

Label-propagation (min over neighbors, repeat) needs diameter-many
rounds — a chain of D near-dup docs takes D shuffles; the alternating
algorithm contracts paths exponentially instead, the property that makes
CC tractable on 100 TB edge sets.

Two driver-gate entries chain pair-producers into components:

  ``duplicate_clusters``      EXACT k-gram Jaccard pairs (dedup.py
                              ngram_jaccard_pairs_df) — the verification
                              twin, whose DuckDB oracle restates the whole
                              thing (all-pairs Jaccard edges + WITH
                              RECURSIVE transitive closure).
  ``duplicate_clusters_lsh``  MinHash-LSH candidate pairs (dedup.py
                              dedup_minhash_lsh_df) — the PRODUCTION
                              composition: the sub-quadratic edge producer
                              feeding the log-round cluster algorithm, the
                              actual 100 TB dedup pipeline. On this corpus
                              the LSH pair set provably equals the exact
                              set (tests/test_dedup_recall.py), so it
                              carries the same recursive-closure oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import owned, persisted
from ..views import load
from .dedup import dedup_minhash_lsh_df, ngram_jaccard_pairs_df

# Driver-local CC ceiling (optimization r15, guide §1.2/§8): the
# alternating-star rounds exist for edge sets that cannot sit on one
# machine; a near-dup edge set is usually MUCH smaller than the corpus
# (pairs are the exception, not the rule). Up to this many canonical
# edges the component labelling runs as one driver-side union-find over
# the already-materialized first checkpoint — zero Spark jobs per round
# instead of one (measured 2.1 s -> ~0.5 s for the CC tail every cluster
# entry pays at sf0.1) — and the result is the IDENTICAL star forest:
# component = min id is algorithm-independent, and the union-find keeps
# the smaller root as parent so the final root IS the component minimum
# (equality vs the distributed rounds is pytest-pinned). Above the
# ceiling the distributed loop below runs unchanged.
_CC_LOCAL_EDGE_MAX = int(
    os.environ.get("SPARK_GRAFT_CC_LOCAL_EDGES", "1000000"))


def _canonical(e: DataFrame) -> DataFrame:
    """Orient every edge (u > v), drop self-loops, dedup."""
    u, v = F.col("u"), F.col("v")
    return (e.where(u != v)
             .select(F.greatest(u, v).alias("u"), F.least(u, v).alias("v"))
             .distinct())


def _checksum(e: DataFrame):
    """(n_edges, xor-hash) in one action — the convergence test."""
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64("u", "v")).alias("h")).collect()[0]
    return row["n"], row["h"]


def connected_components_df(edges: DataFrame, src: str = "a_id",
                            dst: str = "b_id",
                            max_iter: int = 30,
                            checkpoint_dir: str | None = None) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    component = the smallest node id reachable through the undirected
    edge set. Alternating Large-Star / Small-Star until the edge set
    reaches its fixed point (checksum-equal two rounds running).

    Scale: each round shuffles the current edge set twice (neighborhood
    groupBy + re-orientation); the edge count never grows above the
    input's and path contraction is exponential, so rounds ~ log of the
    largest component's diameter. Skewed hub nodes (one doc near-dup to
    millions) land in one neighborhood aggregate — AQE skew splitting
    plus the min-only semantics (the aggregate is a single long) keep
    that bounded.

    ``checkpoint_dir``: per-round lineage truncation is
    ``localCheckpoint`` by default — blocks live on executor local disk,
    so a lost executor forces recomputation from a lineage that no
    longer exists (fatal mid-iteration at long job lengths). Pass a
    durable path (HDFS/S3 at cluster scale) to switch every round to a
    reliable ``checkpoint()``: rounds survive executor loss at the cost
    of a filesystem write per round. Both modes produce identical
    components (pytest-pinned). Each round checkpoints into its own
    ``round-N`` subdirectory and the PREVIOUS round's files are deleted
    as soon as the new checkpoint has materialized (Spark's own cleaner
    only removes reliable checkpoints under a non-default conf, so a
    long-running caller — the streaming sink checkpoints per
    micro-batch — would otherwise fill the filesystem with
    batches x rounds edge-set snapshots). Only the FINAL round's files
    survive the call: the returned frame still reads them lazily, so the
    caller deletes checkpoint_dir after consuming the result."""

    def _fs_delete(sc, path: str) -> None:
        # Hadoop FileSystem API via the JVM: works for local paths,
        # HDFS, and object stores alike
        jp = sc._jvm.org.apache.hadoop.fs.Path(path)
        jp.getFileSystem(sc._jsc.hadoopConfiguration()).delete(jp, True)

    rounds = {"i": 0, "prev": None, "saved_ckpt": None}

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=True)
        import os as _os
        sc = df.sparkSession.sparkContext
        # setCheckpointDir mutates GLOBAL SparkContext state; remember the
        # caller's dir the first time so the function can put it back
        # (restored after the iteration below) — otherwise any later
        # checkpoint() in the session silently lands in our round dir
        if rounds["i"] == 0:
            rounds["saved_ckpt"] = sc.getCheckpointDir()
        path = _os.path.join(checkpoint_dir, f"round-{rounds['i']}")
        sc.setCheckpointDir(path)
        out = df.checkpoint(eager=True)
        # eager=True has fully materialized round-i; round-(i-1) is no
        # longer referenced by any live lineage — reclaim it now
        if rounds["prev"] is not None:
            _fs_delete(sc, rounds["prev"])
        rounds["prev"] = path
        rounds["i"] += 1
        return out

    def _restore_ckpt_dir(sc) -> None:
        # best effort: the public API cannot UNSET a checkpoint dir, so a
        # session that never had one keeps the last round dir configured
        # (harmless — the files there are the final round's, still read
        # lazily by the returned frame). A saved dir that no longer
        # EXISTS is not restored either: setCheckpointDir mkdirs its
        # target, which would resurrect a directory its owner already
        # reclaimed (the streaming sink deletes per-batch CC subtrees;
        # restoring batch N's dir from batch N+1 leaked an empty copy)
        saved = rounds["saved_ckpt"]
        if checkpoint_dir is None or saved is None:
            return
        jp = sc._jvm.org.apache.hadoop.fs.Path(saved)
        if jp.getFileSystem(sc._jsc.hadoopConfiguration()).exists(jp):
            sc.setCheckpointDir(saved)

    e = _canonical(edges.select(F.col(src).alias("u"),
                                F.col(dst).alias("v")))
    try:
        e, complete = _run_rounds(e, _truncate, max_iter)
    finally:
        _restore_ckpt_dir(edges.sparkSession.sparkContext)
    if complete:
        # local union-find already emitted the COMPLETE labelling (root
        # self-rows included) — the exceptAll/distinct roots derivation
        # below would re-plan two branches of the star frame for rows
        # the driver already knows (r16; guide §2.4)
        return e.select(F.col("u").alias("node"),
                        F.col("v").alias("component"))
    # fixed point is a star forest: u -> component min. Roots appear only
    # on the v side; give them a self row.
    nodes = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (e.select(F.col("v").alias("node"))
              .exceptAll(e.select(F.col("u").alias("node")))
              .distinct()
              .select("node", F.col("node").alias("component")))
    return nodes.unionByName(roots)


def _run_rounds(e: DataFrame, _truncate, max_iter: int
                ) -> tuple[DataFrame, bool]:
    """The alternating Large-Star / Small-Star iteration of
    connected_components_df, split out so the caller can wrap it in the
    checkpoint-dir restore. Returns ``(frame, complete)``: the
    distributed loop yields the star-forest EDGE set (complete=False,
    roots appear only on the v side); the local union-find fast path
    yields the full (node, component) labelling INCLUDING root
    self-rows (complete=True), so the caller skips the roots
    derivation (r16).

    r15: the convergence checksum rides the round's checkpoint job as
    ``observe`` metrics (CollectMetrics evaluates during the
    materializing action) instead of a separate ``_checksum`` collect —
    one action per round instead of two; values identical, including the
    (0, None) empty-edge-set fixed point."""
    from pyspark.sql import Observation

    def _truncate_and_checksum(df: DataFrame):
        obs = Observation()
        out = _truncate(df.observe(
            obs, F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h")))
        m = obs.get
        return out, (m["n"], m["h"])

    e, (n_prev, h_prev) = _truncate_and_checksum(e)
    # The local path always runs to full convergence, so it is only
    # equivalent to the distributed loop when max_iter is not an
    # effective bound — gate it on the default (30 rounds contract
    # paths by ~2^30; ADVICE r15: a caller passing a small max_iter
    # asks for bounded rounds and must get the distributed loop).
    if (n_prev is not None and n_prev <= _CC_LOCAL_EDGE_MAX
            and max_iter >= 30):
        # Local fast path: the canonical edge set fits on the driver
        # (bounded by _CC_LOCAL_EDGE_MAX; the count came free with the
        # materializing checkpoint's observe). Union-find with the
        # smaller root kept as parent makes every final root the
        # component minimum, so emitting (node -> root) for non-root
        # nodes IS the distributed loop's star-forest fixed point.
        rows = e.collect()
        parent: dict = {}
        for r in rows:
            u, v = r["u"], r["v"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            if u != v:
                if u < v:
                    parent[v] = u
                else:
                    parent[u] = v
        labels = []
        roots = set()
        for x in parent:
            r_ = x
            while parent[r_] != r_:
                r_ = parent[r_]
            roots.add(r_)
            if x != r_:
                labels.append((x, r_))
        # root self-rows: the complete labelling (matches the
        # distributed path's nodes ∪ roots exactly — u-side rows are
        # the non-roots, each root appears once)
        labels.extend((r_, r_) for r_ in sorted(roots))
        spark = e.sparkSession
        if len(labels) > 100_000:
            # near the ceiling a plain createDataFrame embeds a
            # multi-MB LocalRelation into every downstream plan
            # (ADVICE r15); parallelize keeps the rows off the plan.
            # Small outputs stay LocalRelations — Catalyst evaluates
            # those driver-side without a job, which the r15 coalesce
            # experiment measured as the faster shape.
            rdd = spark.sparkContext.parallelize(labels)
            return spark.createDataFrame(rdd, e.schema), True
        return spark.createDataFrame(labels, e.schema), True
    for _ in range(max_iter):
        # large-star: neighborhoods of BOTH directions; m = min(N(u) + {u});
        # larger neighbors point at m
        sym = e.unionByName(e.select(F.col("v").alias("u"),
                                     F.col("u").alias("v")))
        m = (sym.groupBy("u")
                .agg(F.least(F.min("v"), F.col("u")).alias("m")))
        e = _canonical(
            sym.join(m, "u")
               .where(F.col("v") > F.col("u"))
               .select(F.col("v").alias("u"), F.col("m").alias("v")))
        # small-star: edges oriented large->small; u and its smaller
        # neighbors all point at the neighborhood min
        m2 = (e.groupBy("u")
               .agg(F.least(F.min("v"), F.col("u")).alias("m")))
        with_m = e.join(m2, "u")
        e = _canonical(
            with_m.select(F.col("v").alias("u"), F.col("m").alias("v"))
                  .unionByName(with_m.select("u", F.col("m").alias("v"))))
        e, (n_cur, h_cur) = _truncate_and_checksum(e)
        if (n_cur, h_cur) == (n_prev, h_prev):
            break
        n_prev, h_prev = n_cur, h_cur
    return e, False


def _clusters(pairs: DataFrame, id_col: str = "doc_id",
              checkpoint_dir: str | None = None) -> DataFrame:
    """(id_col, cluster_id, is_canonical) from an (a_id, b_id) edge set:
    cluster_id = min id of the connected component — the record a dedup
    pass keeps. Singleton records (no near-dup) are not emitted; a full
    manifest is an anti-join away."""
    cc = connected_components_df(pairs.select("a_id", "b_id"),
                                 checkpoint_dir=checkpoint_dir)
    out = cc.select(F.col("node").alias(id_col),
                    F.col("component").alias("cluster_id"),
                    (F.col("node") == F.col("component"))
                    .alias("is_canonical"))
    # transfer ownership of the edge producer's persisted internals
    return owned(out, *persisted(pairs))


def duplicate_clusters_df(docs: DataFrame, k: int = 9,
                          threshold: float = 0.8) -> DataFrame:
    """Near-duplicate clusters over (doc_id, text): exact k-gram Jaccard
    pairs >= threshold chained into connected components. The exact-edge
    verification twin of ``duplicate_clusters_lsh_df`` — same closure,
    edges from the super-linear-worst-case PPJoin path, kept because its
    semantics are restatable 1:1 in the DuckDB oracle."""
    return _clusters(ngram_jaccard_pairs_df(docs, k, threshold))


def duplicate_clusters_lsh_df(docs: DataFrame, num_hashes: int = 32,
                              bands: int = 8, threshold: float = 0.8,
                              k: int = 9,
                              checkpoint_dir: str | None = None) -> DataFrame:
    """The production dedup pipeline end-to-end: MinHash-LSH candidate
    pairs (bucketed, never all-pairs — dedup.py dedup_minhash_lsh_df)
    verified by exact Jaccard, then chained into Large-Star/Small-Star
    connected components. Every stage is sub-quadratic and shuffle-
    bounded, so the composition survives a 100 TB corpus: band buckets
    scale with distinct signatures, Jaccard verification touches candidate
    pairs only, and CC runs O(log n) rounds over an edge set that near-dup
    structure keeps sparse. scripts/scale_smoke.py runs this at 10x."""
    pairs = dedup_minhash_lsh_df(docs, num_hashes, bands, threshold, k)
    return _clusters(pairs, checkpoint_dir=checkpoint_dir)


def semantic_dup_clusters_df(emb: DataFrame, threshold: float = 0.4,
                             n_centroids: int = 32, m_assign: int = 4,
                             checkpoint_dir: str | None = None) -> DataFrame:
    """SEMANTIC dedup end-to-end: embedding-cosine near-dup pairs chained
    into connected components — the vector-space counterpart of
    ``duplicate_clusters_lsh`` (paraphrases and translations that shingle
    dedup can never catch land in one cluster when their embeddings
    agree). Edges come from the IVF cell-bucketed candidate generator
    (operators/ivf.py — linear in N with bounded cells, never all-pairs),
    exact-cosine verified, so the composition keeps every stage
    sub-quadratic and the cluster step log-round: the same scale shape as
    the text pipeline. Output (vec_id, cluster_id, is_canonical);
    cluster_id = min vec_id of the component.

    Gate: rows-only by design (IVF recall is approximate); the exact-edge
    twin ``semantic_dup_clusters_exact`` carries the full recursive-
    closure oracle, and tests/test_graph.py floors the IVF variant's
    cluster agreement against it."""
    from .ivf import embedding_near_dup_ivf_df

    pairs = embedding_near_dup_ivf_df(emb, threshold, n_centroids,
                                      m_assign)
    return _clusters(pairs, id_col="vec_id", checkpoint_dir=checkpoint_dir)


def semantic_dup_clusters_exact_df(emb: DataFrame,
                                   threshold: float = 0.4) -> DataFrame:
    """Verification twin of ``semantic_dup_clusters_df``: edges from the
    exact all-pairs cosine baseline (O(N^2) by definition — baseline
    section of the bench, not the scale path), closure identical. Its
    DuckDB oracle restates everything: list_dot_product cosine edges +
    WITH RECURSIVE transitive closure."""
    from .similarity import embedding_near_dup_exact_df

    pairs = embedding_near_dup_exact_df(emb, threshold)
    return _clusters(pairs, id_col="vec_id")


def duplicate_clusters(spark: SparkSession, sf_dir: str, k: int = 9,
                       threshold: float = 0.8) -> DataFrame:
    return duplicate_clusters_df(load(spark, sf_dir, "documents"), k,
                                 threshold)


def duplicate_clusters_lsh(spark: SparkSession, sf_dir: str,
                           num_hashes: int = 32, bands: int = 8,
                           threshold: float = 0.8) -> DataFrame:
    return duplicate_clusters_lsh_df(load(spark, sf_dir, "documents"),
                                     num_hashes, bands, threshold)


def semantic_dup_clusters(spark: SparkSession, sf_dir: str,
                          threshold: float = 0.4) -> DataFrame:
    return semantic_dup_clusters_df(load(spark, sf_dir, "embeddings"),
                                    threshold)


def semantic_dup_clusters_exact(spark: SparkSession, sf_dir: str,
                                threshold: float = 0.4) -> DataFrame:
    return semantic_dup_clusters_exact_df(load(spark, sf_dir, "embeddings"),
                                          threshold)
