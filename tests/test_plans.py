"""Plan-quality regression tests: the optimizations the engine relies on at
100 TB (column pruning to the parquet scan, no cartesian products, codegen
on narrow maps) must be visible in the physical plan, not just assumed.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from kafkastreams_tp3_is_spark import queries as q
from kafkastreams_tp3_is_spark.operators.text import fingerprint
from tests.conftest import SF_DIR


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q1_scan_prunes_to_two_columns(spark):
    plan = _plan(spark, q.q1_available_seats_per_route(spark, SF_DIR))
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan, \
        "orders scan must read only the columns the derivation needs"


def test_q4_trips_scan_prunes_to_fk_only(spark):
    plan = _plan(spark, q.q4_occupancy_per_route(spark, SF_DIR))
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan, \
        "lineitem scan must be pruned to the join/group key"


def test_q5_single_shuffle(spark):
    plan = _plan(spark, q.q5_passengers_per_route(spark, SF_DIR))
    # partial agg -> one exchange -> final agg; any second exchange means a
    # redundant shuffle crept in
    assert plan.count("+- Exchange") <= 1


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_no_cartesian_product_anywhere(name, spark):
    """CartesianProductExec = unbounded all-pairs shuffle — never acceptable.
    (Bounded BroadcastNestedLoopJoin is allowed: q8's 1x1 cross join and the
    exact all-pairs baselines use it deliberately.)"""
    df = entrymod.queries()[name](spark, SF_DIR)
    assert "CartesianProduct" not in _plan(spark, df), name


def test_fingerprint_stays_jvm_side(spark):
    """The rolling-hash fingerprint must be a JVM expression projection
    (higher-order functions run interpreted JVM-side, outside whole-stage
    codegen, but never in a Python worker)."""
    plan = _plan(spark, fingerprint(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, \
        "fingerprint must not fall back to a Python UDF"
    assert "aggregate(filter(split(" in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """The co-located-join path: writing both join sides bucketed by the
    key eliminates every shuffle from the subsequent join (the bucketed
    analogue of Kafka Streams co-partitioned state-store joins)."""
    from pyspark.sql import functions as F

    from kafkastreams_tp3_is_spark.queries import (
        capacity_per_route_logic, passengers_per_route_logic)
    from kafkastreams_tp3_is_spark.sources.warehouse import (
        colocated_join, write_bucketed)
    from kafkastreams_tp3_is_spark.views import routes, trips

    spark.sql("DROP TABLE IF EXISTS cap_b")
    spark.sql("DROP TABLE IF EXISTS pax_b")
    write_bucketed(capacity_per_route_logic(routes(spark, SF_DIR)),
                   "cap_b", ["route_id"], 8, str(tmp_path / "cap_b"))
    write_bucketed(passengers_per_route_logic(trips(spark, SF_DIR)),
                   "pax_b", ["route_id"], 8, str(tmp_path / "pax_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join must rely on the bucket distribution
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(spark, "cap_b", "pax_b", ["route_id"], "left")
        plan = _plan(spark, joined)
        assert "Exchange" not in plan, "bucketed join must be shuffle-free"
        n = joined.count()
        assert n == capacity_per_route_logic(routes(spark, SF_DIR)).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_corpus_clean_single_scan_one_dedup_shuffle(spark):
    """corpus_clean computes all per-doc signals in a narrow projection;
    the only exchanges allowed are the md5-dedup aggregation and its
    keep-list join back (no extra shuffles from the signal computation)."""
    from kafkastreams_tp3_is_spark.operators.pipeline import corpus_clean

    plan = _plan(spark, corpus_clean(spark, SF_DIR))
    assert plan.count("+- Exchange") <= 3
    assert "CartesianProduct" not in plan


def test_ivf_near_dup_no_wide_pair_join(spark):
    """The IVF candidate stage must be the grouped-matmul applyInPandas
    (FlatMapGroupsInPandas), not a row-level self-join materializing wide
    vector pairs; the exact rescoring join runs only on survivors."""
    from kafkastreams_tp3_is_spark.operators.ivf import embedding_near_dup_ivf

    plan = _plan(spark, embedding_near_dup_ivf(spark, SF_DIR))
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan


def test_curation_row_maps_have_no_shuffle(spark):
    """sample/normalize are pure per-row maps: zero exchanges, no Python
    workers — scan, project, filter, done. pii_scrub's regexp chain is
    heavy row-local CPU, so it carries the scale-adaptive spread() floor
    (r15): at most ONE deterministic hash repartition on doc_id (skipped
    when the scan is already wide), still no Python workers and nothing
    else exchanging."""
    from kafkastreams_tp3_is_spark.operators.curation import (
        normalize_text, pii_scrub, sample_deterministic)

    for fn in (sample_deterministic, normalize_text):
        plan = _plan(spark, fn(spark, SF_DIR))
        assert "Exchange" not in plan, fn.__name__
        assert "EvalPython" not in plan, fn.__name__
    plan = _plan(spark, pii_scrub(spark, SF_DIR))
    assert plan.count("Exchange (") <= 1, "pii_scrub: only the spread floor"
    if "Exchange" in plan:
        assert "hashpartitioning(doc_id" in plan, \
            "pii_scrub's only exchange must be the deterministic spread"
    assert "EvalPython" not in plan


def test_pack_sequences_window_is_sharded_not_global(spark):
    """The packing window must hash-partition on the shard key — a global
    running sum would show Exchange SinglePartition (the single-task
    bottleneck the sharded design exists to avoid)."""
    from kafkastreams_tp3_is_spark.operators.curation import pack_sequences

    plan = _plan(spark, pack_sequences(spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan


def test_decontaminate_benchmark_side_broadcasts(spark):
    """The eval-set shingle join must broadcast the bounded benchmark side,
    never shuffle the exploded training corpus against it."""
    from kafkastreams_tp3_is_spark.operators.curation import decontaminate

    plan = _plan(spark, decontaminate(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_simhash_partial_aggregation(spark):
    """The simhash vote aggregation must partial-aggregate map-side (the
    explode never crosses the shuffle): plan shows two HashAggregate
    levels around one Exchange for the vote sums."""
    from kafkastreams_tp3_is_spark.operators.dedup import simhash
    from kafkastreams_tp3_is_spark.views import load

    fp = simhash(load(spark, SF_DIR, "documents")).select("doc_id", "sim_bits")
    plan = _plan(spark, fp)
    assert "partial_count" in plan, "map-side partial aggregation missing"


def test_repeated_spans_shares_one_hash_pass_and_shuffles_longs(spark):
    """repeated_spans' contract: the L-fold substring+hash explosion is
    computed ONCE (persisted; both the repeated-gram branch and the
    position branch read the cache) and only 64-bit hashes ever reach an
    exchange — the text column stays below the first shuffle."""
    from kafkastreams_tp3_is_spark import cache
    from kafkastreams_tp3_is_spark.operators.dedup import repeated_spans

    df = repeated_spans(spark, SF_DIR)
    try:
        plan = _plan(spark, df)
        assert plan.count("InMemoryTableScan") >= 2, \
            "both branches must reuse the persisted hash rows"
        # the position inventory joins the measured-and-small repeated-hash
        # set map-side: the full explosion must NOT shuffle on h
        assert "BroadcastHashJoin" in plan, \
            "repeated-hash set should broadcast at gate scale"
        # every exchange partitions on doc_id or the gram hash — never text
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "text" not in line, line
    finally:
        cache.release(df)


def test_repetition_signals_is_shuffle_free(spark):
    """The round-3 rewrite's contract: repetition stats are a pure
    row-local projection — no explode/groupBy pipeline, no Python
    workers. r15: both kernels are heavy row-local CPU (gram-hash folds /
    regexp chains), so they carry the scale-adaptive spread() floor: at
    most ONE deterministic hash repartition on doc_id (skipped when the
    scan is already wide), and nothing else may exchange."""
    from kafkastreams_tp3_is_spark.operators.text import (
        quality_filter, repetition_signals)

    for fn in (repetition_signals, quality_filter):
        plan = _plan(spark, fn(spark, SF_DIR))
        assert plan.count("Exchange (") <= 1, fn.__name__
        if "Exchange" in plan:
            assert "hashpartitioning(doc_id" in plan, fn.__name__
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_df_side_is_aggregate_sized_and_stats_broadcast(spark):
    """tfidf joins the doc-term tf frame with the term-df frame and a
    1-row corpus count: the count must come in as a broadcast, and the
    plan must contain no cartesian product. (The tf<->df join key is the
    term; AQE picks broadcast vs shuffle by size at runtime.)"""
    from kafkastreams_tp3_is_spark.operators.retrieval import tfidf_topk
    plan = _plan(spark, tfidf_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_heavy_hitters_recount_joins_broadcast_candidates(spark):
    """The exact recount pass must probe a BROADCAST candidate set (the
    MG output is bounded by partitions x capacity) — a shuffle of the
    full occurrence stream onto token keys would defeat the sketch."""
    from kafkastreams_tp3_is_spark.operators.sketch import heavy_hitters
    plan = _plan(spark, heavy_hitters(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_corpus_stats_single_scan_shared_shuffle(spark):
    """Aggregates and the lower-median window both partition on
    (source, lang): the plan must reuse that partitioning rather than
    introduce extra wide exchanges (<= 3 hash exchanges total: base
    shuffle + agg + window-side)."""
    from kafkastreams_tp3_is_spark.operators.text import corpus_stats
    plan = _plan(spark, corpus_stats(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") <= 3


def test_tfidf_plan_shape_row_linear(spark):
    """Pins the intended row-linear plan shape behind the r7 profiling
    note in tfidf_topk_df's docstring: exactly the three expected wide
    exchanges (tf agg on (doc_id, term), df agg on term unless AQE
    broadcasts first, window on doc_id) — a fourth wide exchange means
    a redundant repartition crept in; both aggregates must have a
    partial (map-side combine) phase so the shuffle carries aggregate
    rows, not exploded occurrences; and no global Sort outside the
    window (the per-doc top-k must never sort the corpus globally)."""
    from kafkastreams_tp3_is_spark.operators.retrieval import tfidf_topk

    plan = _plan(spark, tfidf_topk(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert "partial_count" in plan  # map-side combine before shuffle
    assert "CartesianProduct" not in plan


def test_embedding_gram_single_exchange(spark):
    """The Gram triangle's scale contract: ONE mapInPandas pass whose
    partial triangles are the ONLY thing shuffled (one Exchange for the
    (i, j) agg), dimension-bounded — never a per-row or per-pair
    shuffle."""
    from kafkastreams_tp3_is_spark.operators.embstats import (
        embedding_gram_sq8)

    plan = _plan(spark, embedding_gram_sq8(spark, SF_DIR))
    assert plan.count("Exchange") <= 2, plan  # partial->final agg only
    assert "MapInPandas" in plan
    assert "Join" not in plan


def test_winnow_fingerprints_no_join_no_python(spark):
    """Fingerprinting is a row-local projection + one distinct: no join
    anywhere, and everything stays JVM-side (md5/conv/array folds —
    never a Python worker)."""
    from kafkastreams_tp3_is_spark.operators.dedup import (
        winnow_fingerprints)

    plan = _plan(spark, winnow_fingerprints(spark, SF_DIR))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_round_uses_partial_aggregation(spark):
    """One BPE round's pair count must map-side combine (partial
    HashAggregate before the Exchange) so the shuffle carries per-pair
    partials, not per-occurrence rows."""
    from pyspark.sql import functions as F

    from kafkastreams_tp3_is_spark.operators.text import bpe_merge_candidates

    plan = _plan(spark, bpe_merge_candidates(spark, SF_DIR))
    # partial_count appears in the pre-shuffle HashAggregate
    assert "partial_count" in plan


def test_pipeline_plan_growth_bounded(spark):
    """FULL_CLEAN_SPEC's analyzed plan must stay O(stages): each
    corpus-relative stage re-references its survivor subtree, so
    without the _stage_barrier localCheckpoint truncation the explain
    tree grows MULTIPLICATIVELY (13,692 Exchange nodes at 6 stages,
    VERDICT r9). With the barrier each statistic-bearing stage starts
    from a LogicalRDD leaf — a few dozen Exchanges total."""
    from kafkastreams_tp3_is_spark.operators.pipeline import (
        pipeline_full_clean)

    df = pipeline_full_clean(spark, SF_DIR)
    plan = _plan(spark, df)
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 60, f"plan re-bloated: {n_exchange} Exchanges"
    assert "LogicalRDD" in _plan(spark, df) or "Scan ExistingRDD" in plan


def test_source_column_filters_reach_the_scan(spark):
    """Entries whose predicates touch SOURCE columns must show a
    non-empty PushedFilters on the parquet scan (the audit's n_filters
    field separates 'no filter exists' from 'filter not pushed';
    this pins 'pushed' for the ones where pushdown is possible —
    derived-column predicates like quality signals legitimately cannot
    push)."""
    import re

    from kafkastreams_tp3_is_spark.operators.curation import (
        decontaminate, sample_deterministic)
    from kafkastreams_tp3_is_spark.operators.events import funnel
    from kafkastreams_tp3_is_spark.operators.temporal import (
        error_incident_events)

    for fn in (decontaminate, sample_deterministic, funnel,
               error_incident_events):
        plan = _plan(spark, fn(spark, SF_DIR))
        assert re.search(r"PushedFilters: \[[^\]]", plan), \
            f"{fn.__name__}: source-column filter did not reach the scan"
