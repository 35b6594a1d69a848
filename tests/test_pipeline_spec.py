"""Declarative pipeline composer: spec validation, stage composition
order, and single-plan fusion. Oracle parity of the registered fixture
runs in test_queries_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreams_tp3_is_spark.operators.pipeline import (
    STAGES, STANDARD_CLEAN_SPEC, build_pipeline)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_unknown_stage_and_param_fail_at_build_time():
    with pytest.raises(ValueError, match="unknown stage"):
        build_pipeline([{"stage": "explode_corpus"}])
    with pytest.raises(ValueError, match="unknown params"):
        build_pipeline([{"stage": "min_tokens", "tokens": 5}])
    with pytest.raises(ValueError, match="missing 'stage'"):
        build_pipeline([{"n": 5}])


def test_stage_order_matters_normalize_before_dedup(spark):
    """'A  B' and 'a b' are the same document only AFTER normalize —
    dedup placed after normalize must collapse them; before, it must
    not."""
    df = _docs(spark, [(1, "A  B c d e", "en"), (2, "a b c d e", "en")])
    after = build_pipeline([{"stage": "normalize"},
                            {"stage": "dedup_exact"}])(df)
    assert [r["doc_id"] for r in after.collect()] == [1]
    before = build_pipeline([{"stage": "dedup_exact"},
                             {"stage": "normalize"}])(df)
    assert sorted(r["doc_id"] for r in before.collect()) == [1, 2]


def test_filters_compose(spark):
    df = _docs(spark, [(1, "one two three", "en"),
                       (2, "a b c d e f g h i j k l", "en"),
                       (3, "x y z p q r s t u v w only de", "de")])
    out = build_pipeline([{"stage": "min_tokens", "n": 5},
                          {"stage": "lang_keep", "langs": ["en"]}])(df)
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_narrow_stages_fuse_into_one_scan_no_extra_shuffle(spark):
    """normalize + min_tokens + sample_hex are narrow maps/filters: the
    compiled plan over a single source must contain NO exchange at all —
    proof the composer introduces no per-stage materialization."""
    df = _docs(spark, [(1, "a b", "en")])
    out = build_pipeline([{"stage": "normalize"},
                          {"stage": "min_tokens", "n": 1},
                          {"stage": "sample_hex", "cutoff": "ff"}])(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_standard_spec_is_jsonable_and_registered_stages_cover_it():
    import json
    spec = json.loads(json.dumps(STANDARD_CLEAN_SPEC))
    assert [s["stage"] in STAGES for s in spec] == [True] * len(spec)
    build_pipeline(spec)  # validates


def test_sample_hex_rejects_non_hex_cutoffs():
    for bad in ("C0", "zz", "1", "abc", 12):
        with pytest.raises(ValueError):
            build_pipeline([{"stage": "sample_hex", "cutoff": bad}])([])


def test_dedup_near_stage_collapses_variants_after_normalize(spark):
    """A spacing/case variant survives near-dedup alone (different
    shingles) but collapses once normalize runs first — and the stage
    leaves NO persisted internals pinned (connected components already
    consumed them eagerly; the stage releases before returning)."""
    from kafkastreams_tp3_is_spark import cache

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo")
    df = spark.createDataFrame(
        [(1, base, "en"),
         (2, base.upper().replace(" ", "  "), "en"),   # variant of 1
         (3, "completely different words entirely here now", "en")],
        "doc_id long, text string, lang string")
    out = build_pipeline([{"stage": "normalize"},
                          {"stage": "dedup_near", "threshold": 0.7}])(df)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    assert cache.persisted(out) == [], \
        "dedup_near must release its consumed LSH caches"


def test_dedup_exact_stage_is_total_over_null_text(spark):
    """md5(NULL) is NULL and an equi-join would silently drop NULL-text
    rows; the stage hashes COALESCE(text, '') so all NULL/'' rows form
    one group and exactly one canonical (lowest doc_id) survives."""
    pipe = build_pipeline([{"stage": "dedup_exact"}])
    docs = _docs(spark, [(1, None, "en"), (2, None, "en"), (3, "", "en"),
                         (4, "real text", "en")])
    kept = {r["doc_id"] for r in pipe(docs).collect()}
    assert kept == {1, 4}, "one canonical for the NULL/'' group + the real doc"


def test_decontaminate_stage_drops_bench_rows_and_contaminated_train(spark):
    """bench_mod rows are eval data (always excluded); training rows
    sharing >= min_overlap distinct 5-grams with any benchmark text drop
    as contaminated; disjoint-content training rows survive."""
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    pipe = build_pipeline([
        {"stage": "decontaminate", "bench_mod": 2, "min_overlap": 5}])
    docs = _docs(spark, [
        (2, bench_text, "en"),                       # benchmark (id % 2 == 0)
        (1, bench_text + " extra tail", "en"),       # contaminated train
        (3, "zzz qqq xxx www vvv uuu ttt", "en"),    # clean train
    ])
    kept = {r["doc_id"] for r in pipe(docs).collect()}
    assert kept == {3}


def test_quality_decile_stage_is_corpus_relative(spark):
    """The decile threshold is computed over the frame the stage
    receives: with drop_den=4, the bottom quarter (the one doc built
    from vocabulary no other doc shares) drops, common-vocabulary docs
    survive."""
    common = "alpha beta gamma delta epsilon"
    pipe = build_pipeline([{"stage": "quality_decile", "drop_num": 1,
                            "drop_den": 4}])
    docs = _docs(spark, [(i, common, "en") for i in range(3)]
                 + [(99, "qq ww ee rr tt", "en")])
    kept = {r["doc_id"] for r in pipe(docs).collect()}
    assert kept == {0, 1, 2}


def test_repeated_spans_stage_drops_boilerplate_heavy_docs(spark):
    """A doc whose chars are fully covered by 30-char spans recurring in
    another doc exceeds max_frac and drops; unique-content docs stay."""
    shared = "x" * 80  # every 30-gram recurs in both copies
    pipe = build_pipeline([
        {"stage": "repeated_spans_max_frac", "max_frac": 0.5}])
    docs = _docs(spark, [
        (1, shared, "en"), (2, shared, "en"),
        (3, "".join(chr(97 + (i * 7) % 26) for i in range(80)), "en")])
    kept = {r["doc_id"] for r in pipe(docs).collect()}
    assert kept == {3}


def test_full_clean_spec_is_jsonable_and_covered():
    import json as _json
    from kafkastreams_tp3_is_spark.operators.pipeline import FULL_CLEAN_SPEC
    assert _json.loads(_json.dumps(FULL_CLEAN_SPEC)) == FULL_CLEAN_SPEC
    build_pipeline(FULL_CLEAN_SPEC)  # validates stages + params


def test_release_frees_checkpoint_barriers_deterministically(spark):
    """ADVICE r10: _stage_barrier's localCheckpoint blocks used to be
    freed only when the ContextCleaner GC'd the RDD — nondeterministic
    in long-lived embedder sessions. Barrier frames now ride the stage
    output via cache.owned_checkpoint, and cache.release(result) must
    drop their executor blocks immediately."""
    from kafkastreams_tp3_is_spark import cache

    def storage_ids():
        return {i.id() for i in
                spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    before = storage_ids()
    pipe = build_pipeline([
        {"stage": "min_tokens", "n": 1},
        {"stage": "quality_decile", "drop_num": 1, "drop_den": 4},
        {"stage": "repeated_spans_max_frac", "max_frac": 0.9}])
    common = "alpha beta gamma delta epsilon"
    docs = _docs(spark, [(i, common + f" d{i}", "en") for i in range(8)])
    out = pipe(docs)
    out.collect()  # consume
    assert cache.checkpointed(out), "barrier frames must ride the output"
    assert storage_ids() - before, "barriers should hold blocks pre-release"
    cache.release(out)
    assert storage_ids() <= before, \
        "release must free barrier blocks deterministically"
    assert not cache.checkpointed(out) and not cache.persisted(out)
