"""Warm-probe latency of the persisted IVF index (VERDICT r6-r8 ask):
index pre-ensured, session warm, median of 7 timed probes. Prints one
JSON line and is the source of the number cited in
ann_cosine_topk_stored_probe's docstring.

Usage: python scripts/warm_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkastreams_tp3_is_spark.operators.ivf import (  # noqa: E402
    ann_cosine_topk_stored_probe, ensure_stored_index)
from kafkastreams_tp3_is_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("warm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_stored_index(spark, sf_dir)                 # build OUTSIDE timing
    ann_cosine_topk_stored_probe(spark, sf_dir).count()  # codegen warmup
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        n = ann_cosine_topk_stored_probe(spark, sf_dir).count()
        ts.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"metric": "warm_probe", "sf_dir": sf_dir,
                      "runs": ts, "median_s": sorted(ts)[len(ts) // 2],
                      "rows": n}))


if __name__ == "__main__":
    main()
