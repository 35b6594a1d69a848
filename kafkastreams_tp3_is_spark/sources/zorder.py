"""Z-order (Morton-curve) clustered write layout for multi-column file
pruning.

A sort on ONE column gives tight per-file min/max ranges on that column
and useless full-range stats on every other — so parquet footer pruning
(and Spark's partition/row-group skipping on top of it) only helps the
sorted dimension. Interleaving the bits of several columns into one
Morton key and range-sorting the write on that key trades a little
tightness on each dimension for non-trivial tightness on ALL of them:
range predicates on ANY keyed column can now skip most files. This is
Delta Lake's ``OPTIMIZE ZORDER BY`` / Iceberg's z-ordered rewrite, as a
plain Spark writer.

At 100 TB the effect is the difference between a per-user or per-day
probe scanning the whole events table and it touching a handful of
files: footer stats are free to read, and the layout shuffle — one
``repartitionByRange`` on the Morton key — is paid once, amortized over
every later selective scan (the same trade as the bucketed-table
layout, aimed at range predicates instead of equi-joins).

The pytest pins the mechanism, not just the outcome: per-file parquet
footer (min, max) spans on BOTH keyed columns, compared against a
single-column-sorted control layout of the same file count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str], bits: int = 21) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.
    Out-of-range values are CLAMPED to [0, 2^bits - 1] first —
    truncating instead would wrap 2^bits back onto 0 (and sign-extend
    negatives onto the range maximum), scattering the largest values
    among the smallest and silently destroying the clustering; clamping
    keeps them packed at the range edges where they still prune.
    NULLs coalesce to 0 BEFORE the clamp: ``least``/``greatest`` skip
    NULL inputs, so an un-coalesced NULL would silently clamp to the
    range MAXIMUM (least(NULL, hi) = hi) and co-cluster with the
    largest values; pinning NULLs to the range floor keeps them in one
    corner of the curve where a NULL-heavy file still prunes.
    ``len(cols) * bits`` must fit a signed 64-bit key — 2 cols x 21
    bits (values to ~2M) or 3 x 21 by default; widen ``bits`` for
    larger domains. Pure JVM bitwise expressions, codegen-friendly,
    no UDF."""
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits overflows a "
                         "signed 64-bit Morton key")
    n = len(cols)
    hi = F.lit((1 << bits) - 1).cast("bigint")
    key = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        v = F.greatest(F.lit(0).cast("bigint"),
                       F.least(F.coalesce(F.col(c).cast("bigint"),
                                          F.lit(0).cast("bigint")), hi))
        for b in range(bits):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def write_zordered(df: DataFrame, cols: list[str], path: str,
                   n_files: int = 16, bits: int = 21) -> None:
    """Write ``df`` as ``n_files`` parquet files range-clustered on the
    Morton key of ``cols``. ``repartitionByRange`` samples the key to
    build balanced range bounds (one shuffle — the layout cost);
    ``sortWithinPartitions`` tightens row-group stats inside each file
    too, so both file-level AND row-group-level pruning benefit."""
    key = zorder_key(cols, bits).alias("__zkey")
    (df.withColumn("__zkey", key)
       .repartitionByRange(n_files, F.col("__zkey"))
       .sortWithinPartitions("__zkey")
       .drop("__zkey")
       .write.mode("overwrite").parquet(path))


def file_column_spans(path: str, cols: list[str]) -> list[dict]:
    """Per-file (min, max) footer statistics for ``cols`` — the numbers
    a pruning scan consults. Returns one dict per data file. Reads ONLY
    footers (pyarrow metadata), no row data."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        if md.num_row_groups == 0:       # empty range bucket: no stats
            continue
        spans: dict = {"file": name}
        for ci in range(md.num_columns):
            col = md.row_group(0).column(ci).path_in_schema
            if col not in cols:
                continue
            stats = [md.row_group(rg).column(ci).statistics
                     for rg in range(md.num_row_groups)]
            if all(st is not None and st.has_min_max for st in stats):
                spans[col] = (min(st.min for st in stats),
                              max(st.max for st in stats))
        if all(c in spans for c in cols):  # skip stats-less files
            out.append(spans)
    return out


def mean_span_fraction(spans: list[dict], col: str) -> float:
    """Clustering quality on one column: the average fraction of the
    GLOBAL value range each file's (min, max) span covers. 1.0 = every
    file spans everything (no pruning possible); n_files^-1-ish =
    perfectly sorted on that column."""
    lo = min(s[col][0] for s in spans)
    hi = max(s[col][1] for s in spans)
    width = max(hi - lo, 1)
    return sum((s[col][1] - s[col][0]) / width for s in spans) / len(spans)
