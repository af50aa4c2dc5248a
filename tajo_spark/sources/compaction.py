"""Small-file compaction for parquet table directories.

Beyond-reference operational capability: long-running ingest (streaming
sinks, per-batch appends, incremental rollups) fragments a table into
many small files; at 100 TB the scan-planning cost and per-file open
overhead dominate long before data volume does (the classic small-files
problem this repo's own `spread_by` guards the read side against —
compaction fixes the write side at the source).

Scale design: compaction is per-partition-directory and embarrassingly
parallel across partitions; each directory is rewritten into
ceil(bytes / target_file_size) files via a repartition (even-sized
output), with the rewrite landing in place through a temp directory +
atomic rename so concurrent readers never observe a half-compacted
directory listing.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _dir_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet files directly in path."""
    n, b = 0, 0
    for entry in os.scandir(path):
        if entry.is_file() and entry.name.endswith(".parquet"):
            n += 1
            b += entry.stat().st_size
    return n, b


def compact_directory(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> dict:
    """Rewrite one parquet directory into ~target-sized files.

    No-op (returns ``{"compacted": False}``) when the directory already
    holds fewer than ``min_files`` files — rewriting well-sized data
    only churns storage. Returns before/after file counts otherwise.
    """
    n_files, total = _dir_stats(path)
    if n_files < min_files:
        return {"compacted": False, "files": n_files, "bytes": total}
    n_out = max(1, math.ceil(total / target_file_bytes))
    if n_out >= n_files:
        return {"compacted": False, "files": n_files, "bytes": total}

    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    swap = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, swap)
    os.rename(tmp, path)
    shutil.rmtree(swap)
    return {
        "compacted": True,
        "files_before": n_files,
        "files_after": _dir_stats(path)[0],
        "bytes": total,
    }


def compact_partitioned(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> list[dict]:
    """Compact every leaf partition directory under ``root``
    (``k=v`` layout); partitions are independent so failures in one
    leave every other partition intact."""
    results = []
    for dirpath, dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames) and not any(
            d.startswith(".") for d in (os.path.basename(dirpath),)
        ):
            r = compact_directory(
                spark, dirpath, target_file_bytes, min_files
            )
            r["path"] = dirpath
            results.append(r)
    return results
