"""Deterministic sampling operator tests (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tajo_spark.operators import sampling


def test_sample_stable_under_repartition(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r.k for r in sampling.deterministic_sample(df, "k", 0.2).collect()}
    b = {
        r.k
        for r in sampling.deterministic_sample(
            df.repartition(17, "k"), "k", 0.2
        ).collect()
    }
    assert a == b
    # within 3 percentage points of the target fraction
    assert abs(len(a) / 5000 - 0.2) < 0.03


def test_split_column_partitions_everything(spark):
    df = spark.range(0, 4000).select(
        sampling.split_column(F.col("id")).alias("s")
    )
    counts = {r.s: r.n for r in df.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 4000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_sample_is_filter_only_plan(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "k")
    plan = (
        sampling.deterministic_sample(df, "k", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_sample_full_and_zero_fractions(spark):
    import pytest
    from tajo_spark.operators.sampling import sample_threshold_hex

    df = spark.range(0, 100).withColumnRenamed("id", "k")
    assert sampling.deterministic_sample(df, "k", 1.0).count() == 100
    assert sampling.deterministic_sample(df, "k", 0.0).count() == 0
    with pytest.raises(ValueError):
        sample_threshold_hex(1.0)


def test_stratified_topk_exact_k_per_group_and_deterministic(spark, ddb):
    from tajo_spark.queries.registry import all_queries
    import tests.conftest as C

    spec = all_queries()["sample_stratified_topk"]
    a = spec.spark(spark, C.SF_DIR).toPandas()
    b = spec.spark(spark, C.SF_DIR).toPandas()
    counts = a.groupby("lang").size()
    assert (counts == 20).all()
    assert sorted(map(tuple, a.values.tolist())) == sorted(
        map(tuple, b.values.tolist())
    )
    opdf = ddb.execute(spec.oracle).fetchdf()
    C.assert_frames_match(a, opdf, "sample_stratified_topk")
