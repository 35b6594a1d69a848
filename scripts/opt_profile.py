"""Optimization-round profiler: time selected registry entries in
isolation (same methodology as bench.py — force_full_eval, median of
n runs, clearCache between samples) and optionally dump their
explain("formatted") plans to plans/<round>/<name>_<tag>.txt.

Usage:
  python scripts/opt_profile.py [--runs N] [--plans TAG] [--round rNN]
                                name [name ...]

The plan dump is the judge-facing before/after artifact; the timing is
the local iteration loop (guide section 1: measure first, re-measure
after each change).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import force_full_eval  # noqa: E402
from kafkastreams_tp3_is_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="dump explain('formatted') to plans/<round>/"
                         "<name>_<TAG>.txt")
    ap.add_argument("--round", default="r16",
                    help="plans subdirectory (default r16)")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    queries = entrymod.queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")

    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py: footers + one codegen-triggering aggregate
    from pyspark.sql import functions as F
    from kafkastreams_tp3_is_spark.schemas import TESTDATA_TABLES
    for t in TESTDATA_TABLES:
        spark.read.parquet(f"{args.sf_dir}/{t}.parquet").count()
    (spark.read.parquet(f"{args.sf_dir}/orders.parquet").limit(1000)
     .groupBy((F.col("o_orderkey") % 7).alias("g"))
     .agg(F.sum("o_totalprice"), F.count(F.lit(1))).collect())

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.round)
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    results = {}
    for name in args.names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"opt-profile: {name}")
        # untimed warm pass (codegen compile) like bench.py's pre-pass
        df = fn(spark, args.sf_dir)
        if args.plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
        force_full_eval(df)
        spark.catalog.clearCache()
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            checksum, n = force_full_eval(fn(spark, args.sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        med = sorted(samples)[len(samples) // 2]
        results[name] = (med, min(samples), samples, checksum, n)
        print(f"{name}: median={med}s min={min(samples)}s samples={samples}"
              f" checksum={checksum} rows={n}", flush=True)
    print("TOTAL median:", round(sum(v[0] for v in results.values()), 3))


if __name__ == "__main__":
    main()
