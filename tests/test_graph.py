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
