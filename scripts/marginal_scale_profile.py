"""Marginal-cost scale profiles for the heaviest timed registry
entries: ``winnow_pairs`` (6.99 s at sf0.1) and ``bloom_decontaminate``
(4.80 s) per VERDICT r9 ask #4, plus ``fuzzy_edit_pairs`` (3.0 s, the
round-10 PassJoin newcomer) per VERDICT r10 ask #6 — the
TFIDF_SCALE.md method generalized.

Method (TFIDF_SCALE.md's, with one refinement): at 1x/10x/30x of the
sf0.1 scale-smoke cipher corpus, time each op twice —
  (a) FIXTURE-INCLUSIVE over the lazy scaled frame (scale_smoke's
      number), and
  (b) OPERATOR-ONLY over the same rows STAGED TO A PARQUET SNAPSHOT
      first (untimed write), so the timed region is the operator over
      the same vectorized parquet scan production pays. A persisted
      InMemoryRelation (the tfidf profiler's isolation) measured +60%
      on the winnow kernel — columnar-cache deserialization of long
      text rows costs more than re-scanning parquet — which would
      pollute the operator number with cache-read cost.
Fit marginal seconds per corpus copy on the disjoint spans (1->10)/9
and (10->30)/20: super-linear work makes the marginal GROW between
spans; linear work keeps growth ~1.0. Fixtures are the SAME planted
shapes scale_smoke uses, so output volume scales linearly with rows by
construction (winnow: prefix-shifted twins every 25th doc; bloom: the
every-50th-doc benchmark split with min_overlap=190).

Writes MARGINAL_SCALE.md + one JSON line to stdout.
Usage: python scripts/marginal_scale_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreams_tp3_is_spark.operators.retrieval import (  # noqa: E402
    tfidf_topk_df)
from kafkastreams_tp3_is_spark.operators.text import (  # noqa: E402
    bpe_encode_docs_df)
from kafkastreams_tp3_is_spark.session import get_spark  # noqa: E402
from scripts.scale_smoke import (  # noqa: E402
    _bloom_decontaminate, _containment_planted, _dsir_planted,
    _fuzzy_planted, _span_scrub_planted, _winnow_pairs_planted,
    scaled_docs)

OPS = [("winnow_pairs", _winnow_pairs_planted),
       ("bloom_decontaminate", _bloom_decontaminate),
       ("fuzzy_edit_pairs", _fuzzy_planted),
       # DSIR: bucket stats bounded at 256 rows at any scale, scoring is
       # a per-doc fold — operator-only marginal growth should sit ~1.0
       ("dsir_select", _dsir_planted),
       # r13 ask #4: tfidf_topk read 4.07x in the 10x smoke; its shuffle
       # rows are distinct (doc, term) / term — linear for a cipher-
       # bounded vocabulary, so the marginal should be flat
       ("tfidf_topk", tfidf_topk_df),
       # r13 ask #4: the BPE encode chain — ONE corpus word count, 8
       # vocabulary-bounded merge rounds, a broadcast dictionary join
       # linear in token occurrences
       ("bpe_encode_docs", bpe_encode_docs_df),
       # r14: the rebuilt containment pipeline (df<=64 hot-shingle cap +
       # extended-prefix count filter) — candidates are bounded at
       # cap x prefix rows, so the marginal must be flat where the old
       # uncapped join grew with df
       ("containment_pairs", _containment_planted),
       # r14 ask (VERDICT r14 "what's wrong" #4): the new worst smoke
       # ratio (4.04x committed, 2.84x on a second run — likely fixed
       # floor + noise); span inventory is O(chars), canonical
       # selection one hash agg, the rebuild row-local — the
       # operator-only marginal should be flat
       ("repeated_span_scrub", _span_scrub_planted)]

# one-line design rationale per op, rendered under "Reading" in the MD
READINGS = {
    "winnow_pairs": (
        "expression-kernel fingerprinting, row-local; shuffle only on "
        "the df<=20-cut fingerprint join"),
    "bloom_decontaminate": (
        "bitset build + per-row probe + bounded candidate join; "
        "floor-dominated at this scale (marginal in the tens of ms — "
        "the growth ratio is noise on a near-zero slope)"),
    "fuzzy_edit_pairs": (
        "PassJoin: per-doc linear segment/probe emission, candidates "
        "from an equi-join on (len, seg, hash), Levenshtein verify on "
        "candidates only"),
    "dsir_select": (
        "bucket stats bounded at 256 rows at any scale; scoring is one "
        "map-literal fold per doc, selection a TakeOrdered top-k"),
    "tfidf_topk": (
        "two map-side-combined aggregations over distinct (doc, term) "
        "and term keys plus a term-keyed join — rows linear in token "
        "occurrences, vocabulary cipher-bounded"),
    "bpe_encode_docs": (
        "one corpus-sized word count, 8 vocabulary-bounded merge "
        "rounds (constant in corpus size), broadcast dictionary join "
        "linear in token occurrences"),
    "containment_pairs": (
        "r14 rebuild: df<=64 cap bounds per-shingle join fan-out, the "
        "2p extended prefix + count filter bounds verify candidates; "
        "every stage linear in corpus rows. Its time marginal on THIS "
        "box grows past ~30 copies anyway — that is the 16 GiB "
        "single-JVM hash-agg/shuffle SPILL regime at fixed 32 shuffle "
        "partitions, not candidate growth: CONTAINMENT_VOLUME.json "
        "measures candidates at 5.14M/copy, exactly linear through 90 "
        "copies (and a 512 initialPartitionNum probe only added "
        "small-task overhead). A cluster sizes this away; the "
        "algorithmic bound (candidates <= sum 2p*cap) is the committed "
        "claim"),
    "repeated_span_scrub": (
        "O(chars) rolling-hash span inventory (Arrow kernel), ONE "
        "map-side-combined canonical agg on the 8-byte span hash, "
        "per-doc window interval union, row-local rebuild fold. Its "
        "time marginal on THIS box grows past ~30 copies anyway — "
        "that is the same 16 GiB single-JVM spill regime "
        "CONTAINMENT_VOLUME.json pins for containment_pairs, not "
        "algorithmic growth: SPAN_SCRUB_VOLUME.json measures every "
        "stage volume (inventory rows, duplicate hashes, cut "
        "positions, cut chars) at EXACTLY 1.0-linear per copy through "
        "90 copies — counts, unlike wall seconds, are immune to the "
        "host's steal weather. A cluster sizes the spill away; the "
        "algorithmic bound (one inventory row per char, one cut per "
        "duplicate occurrence, row-local rebuild) is the committed "
        "claim"),
}

COPIES = (1, 10, 30)

# A sample is CLEAN when hypervisor steal during it averages under
# half a core (steal_s / wall_s <= 0.5) — an ABSOLUTE rate, not a
# fraction of wall x ncpu: a wall-scaled budget lets a slow sample
# "pass" with more absolute steal than the fast sample it displaced
# (observed: a 66 s sample with 22 steal-s passed while 14 s samples
# with 16-22 steal-s failed, and the printed growth ratio quadrupled).
MAX_STEAL_CORES = 0.5
MAX_ATTEMPTS = 8
WANT_CLEAN = 3


def _steal_s() -> float:
    """Cumulative hypervisor steal seconds (/proc/stat cpu field 8).
    This box is a guest on a shared host: host-side contention shows
    up as steal, not as any visible process — the r15 median-of-3 run
    still read 8.6/52.3/5.9 s for three back-to-back samples of the
    same staged data. Recording per-sample steal makes that pollution
    auditable instead of silent."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]) / os.sysconf("SC_CLK_TCK")


def timed(fn, docs):
    s0 = _steal_s()
    t0 = time.perf_counter()
    out = fn(docs)
    row = out.agg(
        F.bit_xor(F.xxhash64(*[F.col(c) for c in out.columns])).alias("x"),
        F.count(F.lit(1)).alias("n")).collect()[0]
    return (round(time.perf_counter() - t0, 2), row["n"],
            round(_steal_s() - s0, 2))


def _is_clean(wall_s: float, steal_s: float) -> bool:
    return steal_s <= MAX_STEAL_CORES * wall_s


def timed_clean(fn, docs, spark, want_clean=WANT_CLEAN):
    """``timed`` with steal-gated RESAMPLING and a min-WALL estimate.

    Steal is strictly additive one-sided noise: a sample can run SLOWER
    than the true operator cost under host contention, never faster, so
    the minimum wall time over ALL attempts is always the tightest
    upper bound on the true cost — a dirty fast sample beats a clean
    slow one (the earlier clean-only estimator rejected 14 s samples
    for their steal and reported a displaced 66 s "clean" sample,
    quadrupling a growth ratio). The steal gate therefore only decides
    WHEN TO STOP SAMPLING: keep sampling until ``want_clean`` attempts
    ran with under half a core of average steal (or MAX_ATTEMPTS), so
    a burst that outlasts three back-to-back samples (observed: 116
    steal-seconds inside a 15.6 s wall) buys more attempts instead of
    polluting the estimate. ``polluted`` flags an estimate whose chosen
    minimum itself still carried heavy steal — the true cost is LOWER
    than printed, conservative in the super-linearity direction. Every
    attempt and its steal seconds stay recorded for audit."""
    samples = []
    n_clean = 0
    for _ in range(MAX_ATTEMPTS):
        t_op, n, st_op = timed(fn, docs)
        samples.append([t_op, st_op])
        if _is_clean(t_op, st_op):
            n_clean += 1
        spark.catalog.clearCache()
        if n_clean >= want_clean:
            break
    best = min(samples, key=lambda s: s[0])
    return best[0], best[1], n, samples, not _is_clean(*best)


def marginals(pts: dict, key: str) -> tuple[float, float, float | None]:
    t1, t10, t30 = (pts[c][key] for c in COPIES)
    m_low = (t10 - t1) / 9.0
    m_high = (t30 - t10) / 20.0
    growth = round(m_high / m_low, 2) if m_low > 0 else None
    return round(m_low, 3), round(m_high, 3), growth


def run_op(name: str, fn, sf_dir: str) -> dict:
    """Profile ONE op inside THIS process's (fresh) JVM."""
    import shutil
    import tempfile

    spark = get_spark("marginal-scale-profile")
    spark.sparkContext.setLogLevel("ERROR")
    stage_root = tempfile.mkdtemp(prefix="marginal_stage_")
    try:
        warm = scaled_docs(spark, sf_dir, 1)
        timed(fn, warm)                          # untimed codegen warmup
        spark.catalog.clearCache()
        points = {}
        for copies in COPIES:
            d = scaled_docs(spark, sf_dir, copies)
            # fixture-inclusive: steal-gated like the operator number
            # (the fixture column feeds a growth ratio too)
            # (want_clean=1: the single-shot semantics this column
            # always had, retried only when a steal burst hit it)
            t_fix, st_fix, n, fix_samples, fix_polluted = \
                timed_clean(fn, d, spark, want_clean=1)
            # timed_clean clears cache after every sample (the bench.py
            # rule): leaked persisted frames otherwise GC-pressure
            # every later timing
            src = os.path.join(stage_root, f"{name}_{copies}")
            d.write.parquet(src)                 # untimed materialization
            ds = spark.read.parquet(src)
            n_docs = ds.count()
            # operator-only: min CLEAN of steal-gated samples (see
            # timed_clean — min-of-3 alone still chose a sample with
            # 116 steal-seconds during the r15 host-contention window)
            t_op, st_op, _, samples, op_polluted = \
                timed_clean(fn, ds, spark)
            shutil.rmtree(src, ignore_errors=True)
            points[copies] = {"t_fixture": t_fix,
                              "t_fixture_steal_s": st_fix,
                              "t_fixture_samples": fix_samples,
                              "t_fixture_polluted": fix_polluted,
                              "t_operator": t_op,
                              "t_operator_steal_s": st_op,
                              "t_operator_samples": samples,
                              "t_operator_polluted": op_polluted,
                              "n_docs": n_docs, "out_rows": n}
        fl, fh, fg = marginals(points, "t_fixture")
        ol, oh, og = marginals(points, "t_operator")
        return {
            "points": points,
            "fixture_marginal_s_per_copy": [fl, fh], "fixture_growth": fg,
            "operator_marginal_s_per_copy": [ol, oh], "operator_growth": og,
        }
    finally:
        shutil.rmtree(stage_root, ignore_errors=True)


def main() -> None:
    import subprocess

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        # child mode: one op in a fresh JVM, result as a marker line
        fn = dict(OPS)[sys.argv[2]]
        result = run_op(sys.argv[2], fn, sf_dir)
        print("MARGINAL_ONE " + json.dumps({sys.argv[2]: result}))
        return

    # Parent mode: ONE FRESH JVM PER OP (subprocess). clearCache alone
    # was not enough: with all ops sharing a JVM, the last-profiled op's
    # first 30x sample read 71.7s vs 12.0s on the third sample of the
    # same staged data — accumulated code-cache/heap/broadcast residue
    # from seven earlier ops, the same effect bench.py's isolated
    # reference-query prepass exists to exclude. Per-op isolation makes
    # the growth ratios reproducible across runs.
    results = {}
    for name, _fn in OPS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("MARGINAL_ONE ")), None)
        if proc.returncode != 0 or line is None:
            sys.exit(f"per-op child failed for {name}: "
                     f"{proc.stderr[-500:]}")
        results.update(json.loads(line[len("MARGINAL_ONE "):]))
        print(f"done {name}", flush=True)
    # child JSON round-trips the copies keys as strings
    results = {name: {**r, "points": {int(c): p
                                      for c, p in r["points"].items()}}
               for name, r in results.items()}

    print(json.dumps({"metric": "marginal_scale_profile",
                      "sf_dir": sf_dir, "ops": results}))

    sections = []
    for name, r in results.items():
        pts = r["points"]
        rows = "\n".join(
            f"| {c} | {pts[c]['n_docs']:,} | {pts[c]['t_fixture']} "
            f"| {pts[c]['t_operator']}"
            f"{' (POLLUTED)' if pts[c].get('t_operator_polluted') else ''} "
            f"| {pts[c].get('t_operator_steal_s', '-')} "
            f"| {pts[c]['out_rows']:,} |"
            for c in COPIES)
        ol, oh = r["operator_marginal_s_per_copy"]
        fl, fh = r["fixture_marginal_s_per_copy"]
        sections.append(f"""## {name}

| copies | docs | fixture s | operator s | op steal s | out rows |
|---|---|---|---|---|---|
{rows}

- operator-only marginal s/copy: **{ol} -> {oh}**
  (growth **{r['operator_growth']}**; 1.0 = linear, >1.3 = super-linear)
- fixture-inclusive marginal s/copy: **{fl} -> {fh}**
  (growth **{r['fixture_growth']}**)
""")

    readings = "\n".join(f"- `{name}`: {READINGS.get(name, '')}"
                         for name, _ in OPS)
    md = (f"""# Marginal-cost scale profiles: {", ".join(n for n, _ in OPS)}

**Question** (VERDICT r9 ask #4, r10 ask #6, r13 ask #4): the heaviest
timed registry entries and the flagged 10x-smoke ratios — do they hide
super-linear work?

**Method** (`scripts/marginal_scale_profile.py`, = TFIDF_SCALE.md's
with parquet-snapshot isolation): at 1x/10x/30x of the scale-smoke
cipher corpus, time each op (post-warmup) over the LAZY fixture frame
and over the SAME rows staged to a parquet snapshot first (untimed
write — a persisted InMemoryRelation measured +60% on the winnow
kernel from columnar-cache deserialization of long text rows, so the
snapshot keeps the timed region = operator over the production
vectorized scan). Fit marginal seconds per corpus copy on the disjoint
spans 1->10 and 10->30: super-linear work makes the operator-only
marginal GROW between spans; harness scan cost and the fixed floor
only pollute the fixture-inclusive column. Growth ratios are only
meaningful when the absolute marginal is well above noise — a
floor-dominated op (total seconds barely moving across 30x) is
reported as such, not as a growth number.

**Estimator + steal audit** (round 15): the operator number is the
MINIMUM WALL over steal-gated post-warmup samples of the same staged
snapshot. This guest shares a host, and host contention arrives as
multi-second hypervisor-steal bursts no process listing shows (a
median-of-3 run read 8.6/52.3/5.9 s for back-to-back samples of
identical staged data; single bursts of 100-400 steal-seconds were
recorded). Steal is strictly additive one-sided noise — a sample can
run slower than the true operator cost, never faster — so min-wall
over ALL attempts is always the tightest upper bound on the true
cost; the per-sample steal reading (/proc/stat, recorded beside every
attempt) only decides WHEN TO STOP SAMPLING (resample until 3
attempts averaged under half a core of steal, cap 8), so a burst that
outlasts the first samples buys more attempts instead of polluting
the estimate. A point whose chosen minimum itself still carried heavy
steal is flagged POLLUTED — its true cost is LOWER than printed,
conservative in the super-linearity direction. Every attempt and its
steal seconds stay in the JSON for audit.

"""
          + "\n".join(sections) +
          """
**Fixture-period caveat** (round 11): the scaled corpus's consonant
rotation has period 19, so at 30 copies the ORIGINAL fixture made
copies i and i+19 exact duplicates — quadratic cross-copy duplicate
structure that measured the fixture, not the operator (first caught
here: fuzzy_edit_pairs emitted 375k pairs at 30x vs the ~6k a linear
plant produces, a spurious 13x growth ratio). scale_smoke.scaled_docs
now rotates vowels by copy // 19 (period 95); copies 0..18 — every
1x/10x number ever published — are byte-identical to the old fixture.

**Reading** (design rationale per op; the measured operator-only
marginals above are the empirical confirmation at a 30x corpus — the
flat-marginal criterion TFIDF_SCALE.md established; growth near 1.0 =
no quadratic stage surfaced at 30x; where the absolute marginal is
tens of milliseconds per copy the op is FLOOR-DOMINATED and the growth
ratio is noise on a near-zero slope):

""" + readings + "\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MARGINAL_SCALE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
