"""Incremental time-bucketed rollup maintenance.

Beyond-reference capability: continuous-aggregate ("hypertable rollup")
maintenance — a date-partitioned rollup table kept current as late or
new event batches arrive, without ever recomputing history.

Scale design: correctness under late data comes from recomputing each
affected partition FROM SOURCE (idempotent, no read-modify-write races)
— but only the partitions the incoming batch touches. With
``spark.sql.sources.partitionOverwriteMode=dynamic``, the overwrite
replaces exactly the partitions present in the written frame and leaves
every other partition's files untouched (pinned in
tests/test_rollup.py by file-identity). Cost per batch is
O(|affected partitions|), independent of table history; the affected
date set ships as a broadcast semi-join so the source scan can prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rollup_events(events: DataFrame) -> DataFrame:
    """The rollup definition: daily counts + exact-integer value sums
    per event type (same integer-unit discipline as the streaming
    twins, so batch/stream/rollup all agree bit-for-bit)."""
    return events.groupBy(
        F.to_date("ts").alias("event_date"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.round(F.col("value") * 10000).cast("long")) / 10000.0).alias(
            "total_value"
        ),
    )


def build_rollup(events: DataFrame, path: str) -> None:
    """Initial full build, date-partitioned layout."""
    rollup_events(events).write.partitionBy("event_date").mode(
        "overwrite"
    ).parquet(path)


def maintain_rollup(
    spark: SparkSession, source: DataFrame, batch: DataFrame, path: str
) -> int:
    """Refresh only the partitions ``batch`` touches; returns how many.

    ``source`` must be the full current source (including the batch) —
    the affected partitions are recomputed from it, which makes the
    operation idempotent and late-data-safe.

    The affected DATE KEYS (not data) are collected to the driver: the
    set is bounded by partitions-per-batch, and an `isin` literal list
    is the only predicate shape that pushes down to prune a
    date-partitioned source (a semi-join on `to_date(ts)` cannot).
    NULL event times refresh the null-date partition via an explicit
    isNull branch (isin never matches NULL).
    """
    dates = [
        r.event_date
        for r in batch.select(F.to_date("ts").alias("event_date"))
        .distinct()
        .collect()
    ]
    if not dates:
        return 0
    src_date = F.to_date(source["ts"])
    cond = src_date.isin([d for d in dates if d is not None])
    if None in dates:
        cond = cond | src_date.isNull()
    scoped = source.filter(cond)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rollup_events(scoped).write.partitionBy("event_date").mode(
            "overwrite"
        ).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(dates)
