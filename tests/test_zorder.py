"""Z-order clustering tests: both dimensions must become skippable
(sources/zorder.py), unlike a single-column sort."""

from __future__ import annotations

import random

from tajo_spark.sources import zorder


def test_zorder_makes_both_dimensions_skippable(spark, tmp_path):
    rnd = random.Random(11)
    rows = [(rnd.randint(0, 99_999), rnd.randint(0, 99_999)) for _ in range(40_000)]
    df = spark.createDataFrame(rows, "x long, y long")

    zpath = str(tmp_path / "zordered")
    zorder.zorder_write(df, zpath, ["x", "y"], n_files=16)

    # single-column sorted baseline: perfect on x, useless on y
    spath = str(tmp_path / "xsorted")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        spath
    )

    # a 10%-selective range predicate on EACH dimension
    q = (45_000, 55_000)
    zx = zorder.skip_fraction(zorder.file_minmax(zpath, "x"), *q)
    zy = zorder.skip_fraction(zorder.file_minmax(zpath, "y"), *q)
    sx = zorder.skip_fraction(zorder.file_minmax(spath, "x"), *q)
    sy = zorder.skip_fraction(zorder.file_minmax(spath, "y"), *q)

    # x-sort: x highly skippable, y not at all
    assert sx >= 0.7 and sy == 0.0
    # z-order: BOTH dimensions skip a meaningful share of files
    assert zx >= 0.25 and zy >= 0.25, (zx, zy)

    # and the data round-trips
    assert spark.read.parquet(zpath).count() == 40_000


def test_zorder_preserves_schema_and_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, 1000 - i, f"s{i}") for i in range(1000)], "a long, b long, s string"
    )
    p = str(tmp_path / "z3")
    zorder.zorder_write(df, p, ["a", "b"], n_files=4)
    back = spark.read.parquet(p)
    assert back.columns == ["a", "b", "s"]
    assert back.count() == 1000
    assert back.agg({"a": "sum"}).collect()[0][0] == sum(range(1000))
