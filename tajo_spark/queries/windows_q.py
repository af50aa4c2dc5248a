"""Window function coverage (SURVEY.md §2.5).

Reference executes rank, row_number, first_value, last_value, lag, lead
via a single WindowAggExec (P/WindowAggExec.java:46); dense_rank /
percent_rank / cume_dist are parsed but unresolvable
(SQLAnalyzer.java:394-399) — superset here. Tajo's default frame is
UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING (WindowSpec.java:82-83), which
differs from the ANSI/Spark default, so every value-function query pins
an explicit frame on both engine and oracle sides.

Determinism: every ORDER BY inside a window ends with a unique key so
row_number/lag/lead are stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tajo_spark.catalog import load_table
from tajo_spark.queries.registry import query


@query(
    "window_ranking",
    "window",
    doc="rank/dense_rank/percent_rank/cume_dist/row_number over "
    "PARTITION BY + ORDER BY — ref engine/function/window/Rank.java:41, "
    "RowNumber.java; dense_rank family is superset.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               rank()         OVER w AS rnk,
               dense_rank()   OVER w AS drnk,
               row_number()   OVER w AS rn,
               round(percent_rank() OVER w, 4) AS prnk,
               round(cume_dist()    OVER w, 4) AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.round(F.percent_rank().over(w), 4).alias("prnk"),
        F.round(F.cume_dist().over(w), 4).alias("cdist"),
    )


@query(
    "window_lag_lead",
    "window",
    doc="lag/lead with offset + default — ref engine/function/window/Lag*.java, "
    "builtin/Lead*.java.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               lag(o_totalprice, 1)  OVER w AS prev_price,
               lead(o_totalprice, 2) OVER w AS next2_price,
               coalesce(lag(o_totalprice, 1) OVER w, -1.0) AS prev_or_neg1
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 2).over(w).alias("next2_price"),
        F.coalesce(F.lag("o_totalprice", 1).over(w), F.lit(-1.0)).alias(
            "prev_or_neg1"
        ),
    )


@query(
    "window_first_last",
    "window",
    doc="first_value/last_value with explicit full-partition frame — ref "
    "FirstValue*.java / builtin/LastValue*.java; frame pinned because "
    "Tajo's default (WindowSpec.java:82-83) ≠ ANSI default.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               first_value(o_orderkey) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS first_order,
               last_value(o_orderkey) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS last_order
        FROM orders
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    )


@query(
    "window_running_agg",
    "window",
    doc="Running sum / moving average with ROWS frames — ref "
    "WindowAggExec.java frame evaluation (:125-131); Tajo supports only "
    "CURRENT ROW vs UNBOUNDED end bounds — offset frames are superset.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_total,
               round(avg(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                 AS moving_avg3,
               count(*) OVER (PARTITION BY o_custkey) AS cust_orders
        FROM orders
    """,
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(wo.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(
            F.avg("o_totalprice").over(wo.rowsBetween(-2, 0)), 4
        ).alias("moving_avg3"),
        F.count(F.lit(1)).over(W.partitionBy("o_custkey")).alias("cust_orders"),
    )


@query(
    "window_topk_per_group",
    "window",
    doc="Top-K per group via row_number filter — the reference expresses "
    "this as window+subquery (TestWindowQuery patterns); canonical Spark "
    "OLAP idiom, shuffle-once.",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
        ) t WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        cust.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "window_ntile_frames",
    "window",
    doc="ntile + explicit ROWS/RANGE frames (superset: reference parses "
    "frames but executes only two end-bound shapes, "
    "WindowAggExec.java:125-131; Spark runs the full ANSI frame spec).",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ntile(4) OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice, o_orderkey) AS quartile,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0 AS roll3,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
                 AS run_total
        FROM orders
    """,
)
def window_ntile_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    by_price = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    by_date = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(by_price).alias("quartile"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(
                by_date.rowsBetween(-2, 0)
            )
            / 100.0
        ).alias("roll3"),
        # exact integer-cents running total: float accumulation order and
        # exact-half rounding both differ between engines; int64 cents /
        # 100.0 renders bit-identically everywhere
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(
                by_date.rangeBetween(W.unboundedPreceding, W.currentRow)
            )
            / 100.0
        ).alias("run_total"),
    )
