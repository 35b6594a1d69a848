"""Algorithmic-linearity profile for repeated_span_scrub: measure the
WORK VOLUME of every stage — span-occurrence inventory rows, duplicate
span hashes, cut positions, merged intervals, cut chars — at
1x/10x/30x/60x/90x of the scale-smoke planted fixture.

Why this exists (round 15, the containment_volume_profile discipline):
the marginal-scale TIME profile read repeated_span_scrub's 10->30
operator marginal growing (2.52 under min-wall sampling; earlier runs
swung 0.5-13.9 purely with host-steal weather), while every quantity
the operator actually shuffles or folds is linear BY CONSTRUCTION:
the inventory is one row per character position (O(chars)), canonical
selection is one map-side agg on the 8-byte hash, each duplicate
occurrence contributes exactly one cut position, and the interval
union/rebuild is row-local per document. Wall-clock super-linearity on
this box is the 16 GiB single-JVM hash-agg/shuffle SPILL regime at
fixed 32 partitions (the same regime CONTAINMENT_VOLUME.json pins for
containment_pairs), NOT algorithmic growth — and counts, unlike wall
seconds, are immune to hypervisor steal. This script pins the claim as
a committed artifact: all five volumes must grow ~linearly in corpus
copies; a super-linear cut-position ratio is the thing that would
actually break at 100 TB.

Writes SPAN_SCRUB_VOLUME.json (+ one stdout JSON line).
Usage: python scripts/span_scrub_volume_profile.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreams_tp3_is_spark.operators.dedup import (  # noqa: E402
    repeated_span_scrub_df, span_hash_rows)
from kafkastreams_tp3_is_spark.session import get_spark  # noqa: E402
from scripts.scale_smoke import scaled_docs  # noqa: E402

COPIES = (1, 10, 30, 60, 90)
L = 30  # the operator's span_len default


def planted(docs):
    """The scale-smoke planted shape (one excerpt page per 25th
    long-enough doc, one self-repeat per 40th) — linear cut volume by
    construction."""
    excerpts = (docs.where((F.col("doc_id") % 25 == 0)
                           & (F.length("text") >= 80))
                .select((F.col("doc_id") + F.lit(3_000_000))
                        .alias("doc_id"),
                        F.concat(F.lit("planted page: "),
                                 F.expr("substring(text, 11, 60)"))
                        .alias("text")))
    selfrep = (docs.where((F.col("doc_id") % 40 == 0)
                          & (F.length("text") >= 60))
               .select((F.col("doc_id") + F.lit(4_000_000))
                       .alias("doc_id"),
                       F.concat("text", F.expr("substring(text, 1, 45)"))
                       .alias("text")))
    return docs.unionByName(excerpts).unionByName(selfrep)


def volume(spark, docs) -> dict:
    """Stage volumes of repeated_span_scrub_df over ``docs`` — the same
    inventory/canonical/cut stages, with the rebuild replaced by exact
    counts (plus the real operator's cut-char total, which doubles as
    an end-to-end output check)."""
    ds = docs.select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text"))
    hashed = span_hash_rows(ds, L).persist()
    try:
        inventory_rows = hashed.count()
        canon = (hashed.groupBy("h")
                 .agg(F.min(F.struct("doc_id", "pos")).alias("c"),
                      F.count(F.lit(1)).alias("n"))
                 .where(F.col("n") >= 2))
        dup_hashes = canon.count()
        cuts = (hashed.join(canon.select("h", "c"), "h")
                .where((F.col("doc_id") != F.col("c.doc_id"))
                       | (F.col("pos") != F.col("c.pos"))))
        cut_positions = cuts.count()
    finally:
        hashed.unpersist()
    from kafkastreams_tp3_is_spark import cache

    out = repeated_span_scrub_df(ds, span_len=L)
    try:
        row = out.agg(F.sum("n_cut_chars").alias("chars"),
                      F.sum("n_cut_spans").alias("spans"),
                      F.count(F.lit(1)).alias("docs")).collect()[0]
    finally:
        cache.release(out)
    return {"inventory_rows": int(inventory_rows),
            "duplicate_span_hashes": int(dup_hashes),
            "cut_positions": int(cut_positions),
            "cut_spans_emitted": int(row["spans"]),
            "cut_chars": int(row["chars"]),
            "out_docs": int(row["docs"])}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("span-scrub-volume")
    spark.sparkContext.setLogLevel("ERROR")
    stage_root = tempfile.mkdtemp(prefix="scrub_volume_")
    points = {}
    try:
        for copies in COPIES:
            docs = planted(scaled_docs(spark, sf_dir, copies))
            src = os.path.join(stage_root, f"c{copies}")
            docs.write.parquet(src)
            points[copies] = volume(spark, spark.read.parquet(src))
            points[copies]["per_copy_cut_positions"] = round(
                points[copies]["cut_positions"] / copies)
            print(json.dumps({"copies": copies, **points[copies]}),
                  flush=True)
            spark.catalog.clearCache()
            shutil.rmtree(src, ignore_errors=True)
    finally:
        shutil.rmtree(stage_root, ignore_errors=True)
    from _stamp import git_stamp
    ratios = {key: [round(points[b][key] / points[a][key] / (b / a), 3)
                    for a, b in zip(COPIES, COPIES[1:])]
              for key in ("inventory_rows", "cut_positions", "cut_chars")}
    payload = {
        "metric": "span_scrub_work_volume",
        **git_stamp(),
        "sf_dir": sf_dir,
        "span_len": L,
        "points": points,
        "per_span_linearity_ratios": ratios,
        "note": ("ratio = volume(b)/volume(a) normalized by b/a; 1.0 = "
                 "perfectly linear in corpus copies. Inventory is one "
                 "row per char position, each duplicate occurrence is "
                 "exactly one cut position, and the union/rebuild is "
                 "row-local — so all three must stay ~1.0 at any "
                 "scale; wall-clock excursions beyond that are the "
                 "local-mode spill regime, not the operator."),
    }
    with open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SPAN_SCRUB_VOLUME.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"metric": "span_scrub_work_volume",
                      "ratios": ratios, **git_stamp()}))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
