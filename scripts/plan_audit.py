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
import subprocess
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
    "trips_route_update_stream_join",
    "trips_route_update_stream_left_join",
    "trips_route_update_stream_outer_join",
    "latest_route_capacity_stateful",
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
    out["pushed_filters"] = "PushedFilters: [" in plan and \
        not re.search(r"PushedFilters: \[\]", plan)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd=REPO).stdout.strip()
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
        entries[name] = fp
        if fp["cartesian_products"] or fp["python_row_udfs"]:
            bad.append(name)
    result = {"metric": "plan_audit", "sf_dir": sf_dir, "git_sha": sha,
              "n_entries": len(entries), "violations": bad,
              "entries": entries}
    with open(os.path.join(REPO, "PLAN_AUDIT.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"metric": "plan_audit", "n": len(entries),
                      "violations": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
