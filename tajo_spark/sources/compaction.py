"""Small-file compaction for parquet table directories.

Beyond-reference operational capability: long-running ingest (streaming
sinks, per-batch appends, incremental rollups) fragments a table into
many small files; at 100 TB the scan-planning cost and per-file open
overhead dominate long before data volume does (the classic small-files
problem this repo's own `spread_by` guards the read side against —
compaction fixes the write side at the source).

Concurrency contract — this is an OFFLINE maintenance operation on a
plain filesystem layout: run it when no writer targets the directory
(pause the ingest for the partition, or compact only partitions past
the ingest watermark). Without a transaction log (Delta/Iceberg) a
directory swap cannot be atomic with respect to concurrent writers;
what IS guaranteed here:

* a failed rewrite cleans up after itself and leaves the original
  directory untouched;
* files that appear in the directory between the listing and the swap
  are salvaged back into the compacted directory, not deleted;
* readers see either the old or the new listing except during a brief
  two-rename window (POSIX cannot atomically swap directories).

Scale design: compaction is per-partition-directory and embarrassingly
parallel across partitions; each directory is rewritten into
ceil(bytes / target_file_size) files via a repartition (even-sized
output).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _parquet_files(path: str) -> dict[str, int]:
    """{name: bytes} of the parquet files directly in path."""
    return {
        e.name: e.stat().st_size
        for e in os.scandir(path)
        if e.is_file() and e.name.endswith(".parquet")
    }


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
    listed = _parquet_files(path)
    n_files, total = len(listed), sum(listed.values())
    if n_files < min_files:
        return {"compacted": False, "files": n_files, "bytes": total}
    n_out = max(1, math.ceil(total / target_file_bytes))
    if n_out >= n_files:
        return {"compacted": False, "files": n_files, "bytes": total}

    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    try:
        df = spark.read.parquet(path)
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)  # original untouched
        raise
    swap = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, swap)
    os.rename(tmp, path)
    # salvage files a straggling writer appended after our listing —
    # they carry rows the rewrite didn't include
    for name in set(_parquet_files(swap)) - set(listed):
        os.rename(os.path.join(swap, name), os.path.join(path, name))
    shutil.rmtree(swap)
    return {
        "compacted": True,
        "files_before": n_files,
        "files_after": len(_parquet_files(path)),
        "bytes": total,
    }


def compact_partitioned(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> list[dict]:
    """Compact every leaf partition directory under ``root``
    (``k=v`` layout); partitions are independent so a failure in one
    leaves every other partition intact. Hidden and metadata
    directories (``.`` / ``_`` prefixed: ``_temporary``, ``_delta_log``)
    are never entered."""
    results = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith((".", "_"))]
        if any(f.endswith(".parquet") for f in filenames):
            r = compact_directory(
                spark, dirpath, target_file_bytes, min_files
            )
            r["path"] = dirpath
            results.append(r)
    return results
