"""Table-maintenance utilities: small-file compaction.

Streaming sinks, fine-grained partitionBy writes, and high-parallelism
jobs all leave parquet directories with far more files than the data
warrants; at 100 TB the resulting per-file open/footer costs dominate
scan planning (the classic "small files problem") and the NameNode/
object-store listing bill grows with file count, not bytes. Compaction
is the standard maintenance pass (Delta OPTIMIZE / Iceberg rewrite_
data_files do the same job): rewrite a directory to files sized near a
target, preserving the partition layout.

Sizing strategy: measure, don't guess — the target file count per
partition directory is ceil(directory_bytes / target_bytes) computed
from the ACTUAL on-disk bytes of the existing files, so compression and
encoding ratios carry over to the rewrite (estimating bytes from row
counts would misfire by the compression factor). The rewrite itself is
one coalesce/repartition + write per job, executor-side only.

No registry entry: this is a write-side maintenance op (its effect is a
directory layout, not a query result); correctness is pytest-gated —
content identical pre/post, file count matches the sizing formula,
partition directories preserved (tests/test_maintenance.py).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def _dir_stats(path: str) -> tuple[int, int]:
    """(data_bytes, data_files) of a directory tree, counting parquet
    data files only (not _SUCCESS / checksums / metadata)."""
    total, files = 0, 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, n))
                files += 1
    return total, files


def plan_file_count(data_bytes: int, target_bytes: int) -> int:
    """Files a directory of ``data_bytes`` should compact into: integer
    ceil-division, never zero (bigint-exact, same discipline as
    pack_efficiency's ceil-div)."""
    return max(1, -(-data_bytes // max(1, target_bytes)))


def compact_parquet(spark: SparkSession, path: str,
                    target_mb: int = 256) -> dict:
    """Rewrite the parquet dataset at ``path`` into files of roughly
    ``target_mb`` each, preserving any Hive-style ``col=value`` partition
    directory layout (each leaf directory is compacted independently, so
    partition pruning keeps working unchanged).

    Writes to a sibling temp directory, then swaps via two os.rename
    calls (local-filesystem assumption, like the signature store's
    compact; object stores would copy-then-delete). The swap is NOT a
    single atomic step: a crash between the renames leaves the data in
    the ``._compact_old`` sibling — so a leftover ``._compact_old`` /
    ``._compact_tmp`` makes the next run REFUSE with recovery guidance
    instead of silently no-opping on the now-missing path. Returns
    {"files_before": n, "files_after": m, "bytes": b}.

    Scale notes: one Spark write job per leaf directory, sized by that
    leaf's OWN on-disk bytes (non-recursive); the rewrite uses
    coalesce(n) (shuffle-free) when merging down and repartition(n)
    when the plan needs MORE files than the scan's input partitions —
    coalesce cannot split, and silently under-producing files would
    break the sizing contract. Row ORDER within the rewritten files is
    not preserved (parquet datasets are unordered by contract)."""
    old = path.rstrip("/") + "._compact_old"
    tmp = path.rstrip("/") + "._compact_tmp"
    for leftover in (old, tmp):
        if os.path.exists(leftover):
            raise RuntimeError(
                f"{leftover} exists — a previous compaction crashed "
                "mid-swap. Recover manually: the complete dataset is in "
                f"either {path} or {leftover}; move it back into place "
                "and delete the leftover directories before re-running.")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no dataset directory at {path}")
    leaves = []
    for root, dirs, names in os.walk(path):
        if any(n.endswith(".parquet") and not n.startswith((".", "_"))
               for n in names):
            leaves.append(root)
    bytes_total, files_before = _dir_stats(path)
    if not leaves:
        # nothing to compact — and proceeding would rename the dataset
        # away and then fail renaming a temp dir that was never written
        return {"files_before": 0, "files_after": 0, "bytes": 0}
    if len(leaves) > 1 and os.path.normpath(path) in map(
            os.path.normpath, leaves):
        # data files at the root of a partitioned layout: Spark's
        # partition discovery rejects mixed depths — fail BEFORE any
        # rewrite rather than mid-loop with a half-written tmp
        raise ValueError(
            f"{path} mixes root-level parquet files with partition "
            "subdirectories; clean the stray root files first")
    target_bytes = target_mb * (1 << 20)
    for leaf in leaves:
        rel = os.path.relpath(leaf, path)
        dest = tmp if rel == "." else os.path.join(tmp, rel)
        leaf_bytes = sum(
            os.path.getsize(os.path.join(leaf, n))
            for n in os.listdir(leaf)
            if n.endswith(".parquet") and not n.startswith((".", "_")))
        n_files = plan_file_count(leaf_bytes, target_bytes)
        df = spark.read.parquet(leaf)
        n_parts = df.rdd.getNumPartitions()
        sized = (df.coalesce(n_files) if n_files <= n_parts
                 else df.repartition(n_files))
        sized.write.mode("overwrite").parquet(dest)
    os.rename(path, old)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(old)
    _, files_after = _dir_stats(path)
    return {"files_before": files_before, "files_after": files_after,
            "bytes": bytes_total}
