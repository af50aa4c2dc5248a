"""Temporal join queries: as-of (point-in-time) and range/interval joins.

Beyond-reference capability — the reference's join inventory
(PhysicalPlannerImpl.java:628-720) stops at the 9 classic join types;
point-in-time feature lookup and time-window joins are core
training-data-pipeline operators. DuckDB's native ASOF JOIN is the
oracle for the as-of query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tajo_spark.catalog import load_table
from tajo_spark.operators import temporal
from tajo_spark.queries.registry import query


@query(
    "asof_join_events_orders",
    "temporal",
    doc="Point-in-time join: each event picks up the most recent prior "
    "order (inclusive) of the same customer — union+window plan, one "
    "shuffle on the key (operators/temporal.py::asof_join); oracle is "
    "DuckDB's native ASOF LEFT JOIN.",
    oracle="""
        WITH r AS (
            SELECT o_custkey, o_orderdate,
                   round(max(o_totalprice), 2) AS last_order_price
            FROM orders GROUP BY o_custkey, o_orderdate)
        SELECT e.event_id, e.user_id, e.ts,
               r.o_orderdate AS matched_ts, r.last_order_price
        FROM events e ASOF LEFT JOIN r
          ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    # one row per (customer, date): dedupe makes the as-of winner
    # deterministic on both engines
    last_orders = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.round(F.max("o_totalprice"), 2).alias("last_order_price")
    )
    return temporal.asof_join(
        events.select("event_id", "user_id", "ts"),
        last_orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_vals=["last_order_price"],
    )


@query(
    "range_join_order_week_events",
    "temporal",
    doc="Keyed interval join: per order, activity of the same customer "
    "in the 7 days from order date — equi-join on the key with the "
    "range as residual filter (operators/temporal.py::range_join), so "
    "the shuffle is keyed, never a nested loop.",
    oracle="""
        SELECT o.o_orderkey,
               count(e.event_id) AS events_in_week,
               round(coalesce(sum(e.value), 0), 2) AS value_in_week
        FROM orders o LEFT JOIN events e
          ON e.user_id = o.o_custkey
         AND e.ts >= o.o_orderdate
         AND e.ts < o.o_orderdate + INTERVAL 7 DAY
        GROUP BY o.o_orderkey
    """,
)
def range_join_order_week_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    joined = temporal.range_join(
        events.select("event_id", "user_id", "ts", "value"),
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        on=[("user_id", "o_custkey")],
        point="ts",
        start=orders["o_orderdate"],
        end=orders["o_orderdate"] + F.expr("INTERVAL 7 DAYS"),
        how="right",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("event_id").alias("events_in_week"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("value_in_week"),
    )
