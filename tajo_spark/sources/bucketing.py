"""Bucketed-table storage: pre-shuffled layout for co-located joins.

Reference parity: Tajo's ColPartitionStoreExec hash-partition variant
(tajo-core/.../physical/HashBasedColPartitionStoreExec.java) writes
hash-partitioned output so later scans can exploit the layout; Spark's
first-class version is bucketing — `bucketBy(n, key)` at write time
records the hash partitioning in the catalog, and joins/aggregations on
the bucket key then skip their shuffle entirely.

Scale design: at 100 TB the dominant cost of a fact-fact join is the
two-sided shuffle. Bucketing both fact tables on the join key at ingest
amortizes that shuffle into the (one-time) write: every subsequent
join/groupBy on the key is exchange-free (pinned in
tests/test_bucketing.py). Bucket counts must match across tables being
joined; pick ~(total size / 128 MB) rounded to a power of two, and
sortBy(key) inside buckets to get merge-join-ready runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *keys: str,
    num_buckets: int = 32,
    sort: bool = True,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and in-bucket sorted) catalog table."""
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> dict | None:
    """Bucket metadata for ``table`` (num buckets + columns), or None if
    the table isn't bucketed — lets callers assert co-location before
    relying on an exchange-free plan."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r.col_name: r.data_type for r in rows}
    if "Num Buckets" not in info:
        return None
    return {
        "num_buckets": int(info["Num Buckets"]),
        "bucket_columns": info.get("Bucket Columns", ""),
        "sort_columns": info.get("Sort Columns", ""),
    }
