"""Dump explain('formatted') for registry entries WITHOUT evaluating
them — the judge-facing plans/r15/<name>_<tag>.txt artifact when only
the plan (not a timing) is needed. opt_profile.py dumps the same plans
but pays a warm eval + 3 timed runs per entry.

Usage: python scripts/dump_plans.py --tag after name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreams_tp3_is_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    queries = entrymod.queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    plans_dir = args.out_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15")
    os.makedirs(plans_dir, exist_ok=True)
    for name in args.names:
        df = queries[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
