"""Small-file compaction tests (sources/compaction.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tajo_spark.sources import compaction


def _files(path):
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(0, 10_000).withColumn("v", F.col("id") * 2).repartition(
        20
    ).write.parquet(path)
    assert len(_files(path)) == 20

    r = compaction.compact_directory(spark, path, target_file_bytes=1 << 30)
    assert r["compacted"] and r["files_before"] == 20 and r["files_after"] == 1
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(10_000))


def test_compact_noop_when_already_small(spark, tmp_path):
    path = str(tmp_path / "ok")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    r = compaction.compact_directory(spark, path)
    assert r["compacted"] is False
    assert len(_files(path)) == 1


def test_compact_partitioned_preserves_partition_values(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.range(0, 2_000).withColumn("p", (F.col("id") % 3).cast("int"))
    df.repartition(10).write.partitionBy("p").parquet(path)
    before_per_part = len(_files(os.path.join(path, "p=0")))
    assert before_per_part >= 4

    results = compaction.compact_partitioned(
        spark, path, target_file_bytes=1 << 30
    )
    done = [r for r in results if r["compacted"]]
    assert len(done) == 3
    back = spark.read.parquet(path)
    assert back.count() == 2_000
    assert {r.p for r in back.select("p").distinct().collect()} == {0, 1, 2}


def test_compact_salvages_straggler_files(spark, tmp_path, monkeypatch):
    # a file appended between the listing and the swap must survive
    path = str(tmp_path / "straggle")
    spark.range(0, 1_000).repartition(8).write.parquet(path)

    import tajo_spark.sources.compaction as C

    straggler_src = str(tmp_path / "late")
    spark.range(5_000, 5_100).coalesce(1).write.parquet(straggler_src)
    late_file = [
        f for f in __import__("os").listdir(straggler_src)
        if f.endswith(".parquet")
    ][0]

    orig_rename = C.os.rename
    injected = {"done": False}

    def rename_with_straggler(src, dst):
        # inject the straggler right before the first swap rename
        if not injected["done"] and src == path:
            injected["done"] = True
            C.shutil.copy(
                C.os.path.join(straggler_src, late_file),
                C.os.path.join(path, "late-" + late_file),
            )
        orig_rename(src, dst)

    monkeypatch.setattr(C.os, "rename", rename_with_straggler)
    r = C.compact_directory(spark, path, target_file_bytes=1 << 30)
    assert r["compacted"]
    # 1000 original rows + 100 salvaged straggler rows
    assert spark.read.parquet(path).count() == 1_100


def test_compact_partitioned_skips_metadata_dirs(spark, tmp_path):
    import os

    path = str(tmp_path / "meta")
    spark.range(0, 500).repartition(5).write.parquet(path)
    hidden = os.path.join(path, "_temporary", "0")
    os.makedirs(hidden)
    spark.range(0, 10).coalesce(1).write.parquet(os.path.join(hidden, "attempt"))

    from tajo_spark.sources import compaction

    results = compaction.compact_partitioned(
        spark, path, target_file_bytes=1 << 30
    )
    touched = {r["path"] for r in results}
    assert all("_temporary" not in p for p in touched)
