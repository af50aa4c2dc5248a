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
    "range_join_event_burst",
    "temporal",
    doc="Per event, how many events the same user produced in the "
    "strictly-preceding hour (burst/velocity feature). Plan: a RANGE "
    "frame over (user, unix-micros ts) — ONE keyed shuffle + sort, no "
    "pair materialization; the equivalent keyed interval self-join "
    "(operators/temporal.py::range_join, still the right tool when the "
    "two sides differ) explodes |in-window pairs| rows through the "
    "join before re-aggregating, strictly worse for a self-aggregate "
    "at any scale.",
    oracle="""
        SELECT a.event_id,
               count(b.b_id) AS prior_events_1h,
               round(coalesce(sum(b.b_value), 0), 2) AS prior_value_1h
        FROM events a LEFT JOIN (
            SELECT user_id AS b_user, ts AS b_ts, event_id AS b_id,
                   value AS b_value
            FROM events) b
          ON b.b_user = a.user_id
         AND b.b_ts >= a.ts - INTERVAL 1 HOUR
         AND b.b_ts < a.ts
        GROUP BY a.event_id
    """,
)
def range_join_event_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    # [ts - 1h, ts): µs offsets [-3_600_000_000, -1] — RANGE bounds are
    # inclusive on both ends, so -1 encodes the strict "< ts" edge
    # (events sharing a timestamp are frame peers and correctly excluded)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, -1)
    )
    return events.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("prior_events_1h"),
        F.round(F.coalesce(F.sum("value").over(w), F.lit(0.0)), 2).alias(
            "prior_value_1h"
        ),
    )
