"""Bucketed-table tests: the join on the bucket key must be
exchange-free on both sides (the 100 TB co-located join path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tajo_spark.catalog import load_table
from tajo_spark.sources import bucketing
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    bucketing.write_bucketed(orders, "b_orders", "o_custkey", num_buckets=8)
    bucketing.write_bucketed(
        customer, "b_customer", "c_custkey", num_buckets=8
    )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucket_spec_recorded(spark, bucketed_tables):
    spec = bucketing.bucket_spec(spark, "b_orders")
    assert spec is not None
    assert spec["num_buckets"] == 8
    assert "o_custkey" in spec["bucket_columns"]
    assert bucketing.bucket_spec(spark, "b_customer")["num_buckets"] == 8


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select("o_orderkey", "c_name")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    agg = (
        spark.table("b_orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_results_match_plain(spark, bucketed_tables):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    plain = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()
    bucketed = (
        spark.table("b_orders")
        .join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert plain == bucketed
