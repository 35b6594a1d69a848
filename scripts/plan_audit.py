"""Physical-plan audit over the whole registry: for every batch entry,
capture a plan fingerprint — exchange count, broadcast joins,
sort-merge joins, cartesian products, whole-stage-codegen spans,
Python-UDF evaluators, and whether the parquet scan carries pushed
filters / partition filters — and write PLAN_AUDIT.json.

This is the committed, re-runnable form of the plan review the build
does by hand with .explain("formatted"): a CartesianProduct or a
row-at-a-time PythonUDF appearing in any entry fails the audit (exit
1), so plan regressions surface as an artifact diff rather than a
bench surprise. tests/test_plans.py pins per-operator shapes; this
sweeps everything.

Streaming fixtures (the demos) are skipped: their query functions run
a real micro-batch drain as a side effect, and their plan of record is
the batch twin the oracle checks.

Usage: python scripts/plan_audit.py   (writes PLAN_AUDIT.json, one
JSON summary line to stdout)
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kafkastreams_tp3_is_spark.session import get_spark  # noqa: E402

# entries whose callables RUN work eagerly (streaming drains, index
# builds) — their registered plan is a scratch-sink read, so auditing
# it would measure the fixture, not the operator
SKIP = {
    "q11_window_max_stream",
    "q12_window_min_stream",
    "q5_stream_passengers_per_route",
    "q7_stream_total_capacity",
    "trips_route_update_stream_join",
    "trips_route_update_stream_left_join",
    "trips_route_update_stream_outer_join",
    "latest_route_capacity_stateful",
    "bpe_encode_increment_stream",
    "dsir_select_increment_stream",
    "repeated_span_scrub_stream",
    "ann_index_increment_stream",
}

COUNTERS = {
    "exchanges": r"\bExchange\b",
    "broadcast_exchanges": r"\bBroadcastExchange\b",
    "sort_merge_joins": r"\bSortMergeJoin\b",
    "broadcast_hash_joins": r"\bBroadcastHashJoin\b",
    "cartesian_products": r"\bCartesianProduct\b",
    "nested_loop_joins": r"\bBroadcastNestedLoopJoin\b",
    "codegen_spans": r"\*\(\d+\)",
    "python_row_udfs": r"\bBatchEvalPython\b",
    "pandas_udfs": r"\bArrowEvalPython\b|\bMapInPandas\b|\bFlatMapGroupsInPandas\b",
}


def fingerprint(plan: str) -> dict:
    out = {k: len(re.findall(p, plan)) for k, p in COUNTERS.items()}
    # Distinguish "no filter exists" from "filter not pushed" (ADVICE
    # r9: a bare pushed_filters=false wall is meaningless when most
    # fixtures scan whole tables — nothing to push). n_filters counts
    # physical Filter nodes; pushed_filters stays "some scan carries a
    # non-empty PushedFilters". n_filters > 0 with pushed_filters
    # false is only suspicious when the filter touches source columns
    # — derived-column predicates (quality signals, hashes) cannot
    # push; test_plans.py asserts pushdown on entries that DO filter
    # source columns at the scan.
    out["n_filters"] = len(re.findall(r"\bFilter \(", plan))
    # ANY scan carrying a non-empty PushedFilters list counts (the old
    # spelling `not search("PushedFilters: []")` flipped the flag false
    # whenever one OTHER scan in the same plan legitimately had nothing
    # to push — e.g. events_funnel's user-universe scan next to three
    # fully-pushed event_type scans)
    out["pushed_filters"] = bool(re.search(r"PushedFilters: \[[^\]]", plan))
    return out


def classify_filters(jdf) -> dict:
    """Split the physical Filter nodes by WHERE they sit in the tree
    (VERDICT r10: 49 entries flagged pushed_filters=false needed human
    adjudication to see they were HAVING-style post-aggregate filters):

    - post_agg_filters    — an Aggregate/Window in the subtree: the
      predicate is over derived values (HAVING); CANNOT push to a scan.
    - post_join_filters   — a join (but no aggregate) in the subtree:
      residual/derived predicates on join output.
    - derived_col_filters — a Project/Generate/Python-eval/Expand below
      computes columns first: the predicate references computed values
      (hashes, cosines, exploded rows); CANNOT push either.
    - expr_scan_filters   — sits on the scan but the predicate is an
      EXPRESSION over source columns (length(coalesce(text, '')) >= 24,
      doc_id % 25 = 0, ...): no parquet source can push a computed
      predicate, only bare column comparisons. Not a defect.
    - null_guard_filters  — IsNotNull-only conditions: the optimizer's
      join-key null guards (it inserts them above every inner-join
      input; on nested/array columns parquet cannot absorb them). Not
      written by any operator, not a defect.
    - cached_scan_filters — above an InMemoryTableScan / LogicalRDD /
      LocalTableScan: a persisted or literal intermediate, no file
      source to push into. Not a defect.
    - pushed_residual_filters — pushable by shape AND the file scan
      below carries matching non-empty dataFilters: pushdown DID
      happen; Spark always re-applies the exact predicate above the
      scan because parquet pushdown is advisory (row-group/page
      pruning). The normal healthy pattern.
    - scan_adjacent_filters — on a FILE scan with EMPTY dataFilters yet
      pushable by shape: the ONLY suspicious bucket — a nonzero count
      here means a predicate the scan should have absorbed
      (test_plans.py asserts pushdown for the entries that filter
      source columns at the scan).

    Walks the pre-AQE sparkPlan tree (toJSON pre-order with
    num-children; AdaptiveSparkPlanExec hides its input plan from
    toJSON, and filter placement is decided before AQE anyway)."""
    nodes = json.loads(jdf.queryExecution().sparkPlan().toJSON())

    def span(i: int) -> int:
        j = i + 1
        for _ in range(int(nodes[i].get("num-children", 0))):
            j = span(j)
        return j

    derived_markers = ("Project", "Generate", "ArrowEval", "BatchEval",
                       "MapInPandas", "FlatMapGroupsInPandas", "Expand",
                       "MapPartitions")
    # expression node classes a parquet source CAN translate to pushed
    # filters: bare attribute/literal comparisons and boolean structure
    pushable = {"AttributeReference", "Literal", "And", "Or", "Not",
                "EqualTo", "EqualNullSafe", "GreaterThan", "LessThan",
                "GreaterThanOrEqual", "LessThanOrEqual", "In", "InSet",
                "IsNull", "IsNotNull", "StartsWith", "EndsWith",
                "Contains"}

    def cond_classes(x, acc):
        if isinstance(x, list):
            for y in x:
                cond_classes(y, acc)
        elif isinstance(x, dict):
            if "class" in x:
                acc.add(x["class"].rsplit(".", 1)[-1])
            for v in x.values():
                cond_classes(v, acc)
        return acc

    counts = {"scan_adjacent_filters": 0, "post_agg_filters": 0,
              "post_join_filters": 0, "derived_col_filters": 0,
              "expr_scan_filters": 0, "null_guard_filters": 0,
              "cached_scan_filters": 0, "pushed_residual_filters": 0}
    for i, n in enumerate(nodes):
        if n.get("class", "").rsplit(".", 1)[-1] != "FilterExec":
            continue
        end = span(i)
        sub = [nodes[k].get("class", "").rsplit(".", 1)[-1]
               for k in range(i + 1, end)]
        klass = cond_classes(n.get("condition"), set())
        scan_pushed = any(
            nodes[k].get("class", "").rsplit(".", 1)[-1]
            == "FileSourceScanExec" and nodes[k].get("dataFilters")
            for k in range(i + 1, end))
        if any("Aggregate" in c or "Window" in c for c in sub):
            counts["post_agg_filters"] += 1
        elif any("Join" in c for c in sub):
            counts["post_join_filters"] += 1
        elif any(m in c for c in sub for m in derived_markers):
            counts["derived_col_filters"] += 1
        elif klass - pushable:
            counts["expr_scan_filters"] += 1
        elif klass <= {"IsNotNull", "AttributeReference", "And"}:
            counts["null_guard_filters"] += 1
        elif any(c in ("InMemoryTableScanExec", "LogicalRDD",
                       "RDDScanExec", "LocalTableScanExec") for c in sub):
            counts["cached_scan_filters"] += 1
        elif scan_pushed:
            counts["pushed_residual_filters"] += 1
        else:
            counts["scan_adjacent_filters"] += 1
    return counts


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    from _stamp import git_stamp
    stamp = git_stamp()
    entries, bad = {}, []
    for name, fn in entrymod.queries().items():
        if name in SKIP:
            entries[name] = {"skipped": "streaming/eager fixture"}
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("simple"))
        except Exception as exc:   # noqa: BLE001 — audit must not die
            entries[name] = {"error": str(exc)[:200]}
            bad.append(name)
            continue
        fp = fingerprint(plan)
        try:
            fp.update(classify_filters(df._jdf))
        except Exception as exc:   # noqa: BLE001
            fp["filter_classify_error"] = str(exc)[:120]
        entries[name] = fp
        if fp["cartesian_products"] or fp["python_row_udfs"]:
            bad.append(name)
    result = {"metric": "plan_audit", "sf_dir": sf_dir, **stamp,
              "n_entries": len(entries), "violations": bad,
              "entries": entries}
    with open(os.path.join(REPO, "PLAN_AUDIT.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"metric": "plan_audit", "n": len(entries),
                      "violations": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
