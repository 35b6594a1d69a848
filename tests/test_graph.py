"""Connected-components / duplicate-clustering tests (operators/graph.py).

The Large-Star/Small-Star fixed point must equal the true transitive
closure — verified on hand-built graphs covering chains (transitivity),
multiple components, and star hubs, plus the planted-duplicate corpus
where the expected clusters are known by construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreams_tp3_is_spark.operators.graph import (
    connected_components_df, duplicate_clusters_df)


def _components(spark, edges):
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    rows = connected_components_df(df).collect()
    comp = {r["node"]: r["component"] for r in rows}
    assert len(rows) == len(comp), "every node exactly once"
    return comp


def test_chain_collapses_to_min(spark):
    # A-B, B-C, C-D: one component rooted at the min id, even though
    # 1 and 4 share no direct edge
    comp = _components(spark, [(2, 1), (3, 2), (4, 3)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_stay_disjoint(spark):
    comp = _components(spark, [(1, 2), (5, 6), (6, 7), (10, 11)])
    assert comp == {1: 1, 2: 1, 5: 5, 6: 5, 7: 5, 10: 10, 11: 10}


def test_long_path_converges_within_log_rounds(spark):
    # a 64-node path needs only ~log2(64) alternating rounds; max_iter=30
    # default gives huge headroom — this pins that convergence happens at
    # all and the labels are exact
    edges = [(i + 1, i) for i in range(1, 64)]
    comp = _components(spark, edges)
    assert set(comp.values()) == {1}
    assert len(comp) == 64


def test_cc_local_and_distributed_agree(spark, monkeypatch):
    """r15 optimization guard: the driver-local union-find shortcut
    (edge sets under _CC_LOCAL_EDGE_MAX) must label components exactly
    like the distributed alternating-star rounds — chains, hubs,
    disjoint components, duplicate/reversed edges, self-loops."""
    import kafkastreams_tp3_is_spark.operators.graph as graphmod

    cases = [
        [(i + 1, i) for i in range(1, 64)],                      # path
        [(1, 2), (5, 6), (6, 7), (10, 11)],                      # disjoint
        [(100, i) for i in range(1, 20)] + [(200, 201)],         # hub
        [(2, 1), (1, 2), (2, 2), (3, 2), (9, 4), (4, 9)],        # dup/self
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, ["a_id", "b_id"])
        local = {(r["node"], r["component"])
                 for r in graphmod.connected_components_df(df).collect()}
        monkeypatch.setattr(graphmod, "_CC_LOCAL_EDGE_MAX", -1)
        dist = {(r["node"], r["component"])
                for r in graphmod.connected_components_df(df).collect()}
        monkeypatch.undo()
        assert local == dist, edges


def test_duplicate_clusters_on_planted_corpus(spark, planted_docs):
    df, planted = planted_docs
    clusters = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
                for r in duplicate_clusters_df(df, threshold=0.7).collect()}
    # every planted pair must land in one cluster, canonical = min id
    for a, b in planted:
        assert a in clusters and b in clusters
        assert clusters[a][0] == clusters[b][0] == min(
            x for x, (c, _) in clusters.items() if c == clusters[a][0])
    # exactly one canonical doc per cluster
    canon = [d for d, (c, is_c) in clusters.items() if is_c]
    assert len(canon) == len({c for c, _ in clusters.values()})
    for d in canon:
        assert clusters[d][0] == d


def test_duplicate_clusters_lsh_on_planted_corpus(spark, planted_docs):
    # the production composition (LSH edges -> CC) must recover the same
    # planted clusters the exact-edge twin does
    from kafkastreams_tp3_is_spark.operators.graph import (
        duplicate_clusters_lsh_df)

    df, planted = planted_docs
    clusters = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
                for r in duplicate_clusters_lsh_df(
                    df, threshold=0.7).collect()}
    for a, b in planted:
        assert a in clusters and b in clusters
        assert clusters[a][0] == clusters[b][0]
    exact = {r["doc_id"]: r["cluster_id"]
             for r in duplicate_clusters_df(df, threshold=0.7).collect()}
    lsh = {d: c for d, (c, _) in clusters.items()}
    assert lsh == exact


def test_semantic_dup_clusters_agreement_with_exact(spark):
    """The IVF-edge semantic clusters must substantially agree with the
    exact-edge twin: every same-cluster pair the IVF variant emits is a
    same-cluster pair of the exact closure (IVF edges are a subset of
    exact edges, so components can only split, never merge wrongly), and
    pairwise recall clears a floor."""
    from itertools import combinations

    from kafkastreams_tp3_is_spark import cache
    from kafkastreams_tp3_is_spark.operators.graph import (
        semantic_dup_clusters, semantic_dup_clusters_exact)
    from tests.conftest import SF_DIR

    ivf = semantic_dup_clusters(spark, SF_DIR)
    exact = semantic_dup_clusters_exact(spark, SF_DIR)
    try:
        ivf_rows = {r["vec_id"]: r["cluster_id"] for r in ivf.collect()}
        exact_rows = {r["vec_id"]: r["cluster_id"] for r in exact.collect()}
    finally:
        cache.release(ivf)
        cache.release(exact)

    def same_pairs(m):
        byc: dict = {}
        for vid, c in m.items():
            byc.setdefault(c, []).append(vid)
        return {frozenset(p) for vs in byc.values()
                for p in combinations(sorted(vs), 2)}

    p_ivf, p_exact = same_pairs(ivf_rows), same_pairs(exact_rows)
    # precision: IVF same-cluster pairs are a subset of the exact closure
    assert p_ivf <= p_exact
    # recall floor on same-cluster pairs
    assert len(p_ivf) >= 0.9 * len(p_exact), (len(p_ivf), len(p_exact))
    # canonical discipline: one canonical per cluster, = min member
    for m in (ivf_rows, exact_rows):
        byc: dict = {}
        for vid, c in m.items():
            byc.setdefault(c, []).append(vid)
        for c, vs in byc.items():
            assert c == min(vs)


def test_durable_checkpoint_mode_matches_local(spark, tmp_path,
                                               monkeypatch):
    """checkpoint_dir switches per-round lineage truncation from
    localCheckpoint (executor-local blocks) to reliable checkpoint()
    (durable storage, survives executor loss). Both modes must produce
    identical components, and the durable mode must actually write
    round state under the given directory. The local union-find
    shortcut is disabled here: the per-round checkpoint rotation only
    exists on the distributed loop (r15)."""
    import os

    import kafkastreams_tp3_is_spark.operators.graph as graphmod

    monkeypatch.setattr(graphmod, "_CC_LOCAL_EDGE_MAX", -1)
    edges = [(i + 1, i) for i in range(1, 32)] + [(100, 99), (101, 100)]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    local = {(r["node"], r["component"])
             for r in connected_components_df(df).collect()}
    ckpt = str(tmp_path / "cc_ckpt")
    durable = {(r["node"], r["component"])
               for r in connected_components_df(
                   df, checkpoint_dir=ckpt).collect()}
    assert durable == local
    walked = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert walked, "reliable checkpoint wrote nothing under checkpoint_dir"
    # per-round rotation: earlier rounds are reclaimed as soon as the
    # next checkpoint materializes — only the FINAL round's directory
    # survives (the returned frame still reads it lazily)
    round_dirs = [d for d in os.listdir(ckpt) if d.startswith("round-")]
    assert len(round_dirs) == 1, \
        f"stale per-round checkpoints not reclaimed: {sorted(round_dirs)}"
