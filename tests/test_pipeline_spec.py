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
