"""TPC-H benchmark queries, adapted to the driver's trimmed schemas.

Reference: /root/reference/tajo-core/benchmark/tpch/q1.sql..q22.sql
(Tajo ships TPC-H as its benchmark corpus; BenchmarkSet.java:115-129).
The driver's tables omit some TPC-H columns (no partsupp, no
l_shipmode/l_commitdate, no o_shippriority, no c_phone) — queries
needing them are adapted; the adapted predicate is noted per query.

All float aggregates rounded identically on both sides (see
registry.py module doc).

Broadcast discipline (mirrors the reference's size-gated
BroadcastJoinRule.java:44-65): region/nation (fixed 5/25 rows) and
one-row aggregates carry unconditional ``F.broadcast`` hints — they
cannot grow with scale.  Everything that grows with the corpus
(part, supplier, per-part aggregates over lineitem) goes through
``broadcast_if_dim`` (plans/hints.py), which hints only under a size
bound and otherwise lets AQE pick the strategy from runtime sizes —
so at 100 TB these joins degrade to shuffle instead of OOMing on a
forced broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tajo_spark.catalog import load_table
from tajo_spark.plans.hints import broadcast_if_dim as bdim
from tajo_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "tpch_q1",
    "tpch",
    doc="Pricing summary report: scan+filter+hash agg (8 aggs) — "
    "ref tajo-core/benchmark/tpch/q1.sql; HashAggregateExec "
    "P/HashAggregateExec.java:36. Spark plans partial+final hash agg.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)        AS sum_qty,
               round(sum(l_extendedprice), 2)   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4)        AS avg_qty,
               round(avg(l_extendedprice), 4)   AS avg_price,
               round(avg(l_discount), 4)        AS avg_disc,
               count(*)                          AS count_order
        FROM lineitem
        WHERE l_shipdate <= '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_disc_price()), 2).alias("sum_disc_price"),
            F.round(F.sum(_disc_price() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    "tpch",
    doc="Shipping priority: 3-way join + agg + deterministic top-10 — "
    "ref tpch/q3.sql (adapted: no o_shippriority column). "
    "Spark plans TakeOrderedAndProject for the limit.",
    oracle="""
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < '1997-03-15'
          AND l_shipdate > '1997-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q4",
    "tpch",
    doc="Order priority checking via EXISTS→left-semi join — ref tpch/q4.sql "
    "(adapted: l_quantity>45 replaces commitdate<receiptdate; those columns "
    "don't exist in the driver tables). Tajo rewrites IN-subquery to semi "
    "join (InSubqueryRewriteRule.java:117); Spark does the same natively.",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q5",
    "tpch",
    doc="Local supplier volume: 6-way join with broadcast dims — ref "
    "tpch/q5.sql. region/nation/supplier are broadcast (Tajo: "
    "BroadcastJoinRule.java:44; Spark: broadcast() hint + AQE).",
    oracle="""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
        GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            bdim(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))
    )


@query(
    "tpch_q6",
    "tpch",
    doc="Forecasting revenue change: pure scan+filter+global agg — ref "
    "tpch/q6.sql. All predicates push to the parquet scan.",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
    )


@query(
    "tpch_q7",
    "tpch",
    doc="Volume shipping between two nations by year — ref tpch/q7.sql "
    "(adapted: driver nations are NATION_1/NATION_2). year() cast to "
    "BIGINT on the Spark side to match DuckDB's year() type.",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier, lineitem, orders, customer, nation n1, nation n2
            WHERE s_suppkey = l_suppkey
              AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey
              AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(bdim(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _disc_price().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@query(
    "tpch_q10",
    "tpch",
    doc="Returned-item reporting: 4-way join + agg + deterministic top-20 — "
    "ref tpch/q10.sql (adapted: no c_address/c_phone/c_comment columns).",
    oracle="""
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
          AND l_returnflag = 'R'
          AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q13",
    "tpch",
    doc="Customer distribution: left outer join with ON-clause extra "
    "predicate + double aggregation — ref tpch/q13.sql.",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q14",
    "tpch",
    doc="Promotion effect: join + conditional agg ratio — ref tpch/q14.sql "
    "(p_type LIKE 'PROMO%' matches the driver's single-word types).",
    oracle="""
        SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    part = _t(spark, sf_dir, "part")
    joined = li.join(bdim(part), li.l_partkey == part.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type").like("PROMO%"), _disc_price()).otherwise(F.lit(0.0))
    )
    return joined.agg(
        F.round(100.0 * promo / F.sum(_disc_price()), 4).alias("promo_revenue")
    )


@query(
    "tpch_q15",
    "tpch",
    doc="Top supplier: derived revenue view + scalar-subquery max — ref "
    "tpch/q15.sql. Tajo cannot execute scalar subqueries "
    "(SURVEY.md §2.2); Spark can — implemented via join on the max.",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    # materialize the revenue view once: it feeds BOTH the join and the
    # max-subquery, Catalyst does not reuse the exchange across the two
    # consumers (0 ReusedExchange in the executed plan), and without
    # this the 3-month lineitem scan + aggregation run twice. The
    # checkpoint is |suppliers| rows — dimension-sized at any SF.
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_disc_price()), 2).alias("total_revenue"))
        .localCheckpoint()
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q18",
    "tpch",
    doc="Large volume customer: IN-subquery with HAVING → semi join + "
    "3-way join + agg — ref tpch/q18.sql (threshold 300 fits the "
    "driver's quantity distribution).",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 2) AS sum_qty
        FROM customer, orders, lineitem
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
          AND c_custkey = o_custkey
          AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    # No hints here: orders and the per-order HAVING aggregate are
    # fact-sized by construction, and the session policy (session.py,
    # plans/hints.py module docstring) bans static estimate-based
    # broadcasts engine-wide — the r06/r07 memory rungs caught the
    # column-pruned estimate slipping under the threshold while the
    # real HashedRelation was ~400 MB (un-spillable build OOM).  AQE
    # still upgrades genuinely-small sides from MEASURED sizes.
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tot"))
        .filter(F.col("tot") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "big_key"),
                    orders.o_orderkey == F.col("big_key"), "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "tpch_q19",
    "tpch",
    doc="Discounted revenue: join with disjunctive multi-range predicate — "
    "ref tpch/q19.sql (adapted: no l_shipinstruct/l_shipmode columns).",
    oracle="""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
                AND p_size BETWEEN 1 AND 5)
            OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
                AND p_size BETWEEN 1 AND 10)
            OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
                AND p_size BETWEEN 1 AND 15))
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(bdim(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12")
         & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23")
           & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34")
           & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return joined.filter(cond).agg(F.round(F.sum(_disc_price()), 2).alias("revenue"))


@query(
    "tpch_q22",
    "tpch",
    doc="Global sales opportunity: scalar subquery + NOT EXISTS anti join — "
    "ref tpch/q22.sql (adapted: cntrycode from c_nationkey, no c_phone; "
    "anti join on customers without completed-'P' orders).",
    oracle="""
        SELECT cntrycode, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM (
            SELECT c_nationkey % 5 AS cntrycode, c_acctbal, c_custkey
            FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0.00)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderstatus = 'P')
        ) custsale
        GROUP BY cntrycode
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    eligible = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return (
        eligible.select(
            (F.col("c_nationkey") % 5).alias("cntrycode"), F.col("c_acctbal")
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# --- Tajo micro-benchmark queries (tajo-core/benchmark/simple/*.sql) ---


@query(
    "micro_groupby1",
    "micro",
    doc="ref benchmark/simple/groupby1.sql: group by one key, 3 aggs.",
    oracle="""
        SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty,
               max(l_quantity) AS max_qty, min(l_quantity) AS min_qty
        FROM lineitem GROUP BY l_orderkey
    """,
)
def micro_groupby1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_quantity").alias("min_qty"),
    )


@query(
    "micro_groupby2",
    "micro",
    doc="ref benchmark/simple/groupby2.sql: group by two keys.",
    oracle="""
        SELECT l_orderkey, l_linenumber, round(sum(l_quantity), 2) AS sum_qty,
               max(l_quantity) AS max_qty, min(l_quantity) AS min_qty
        FROM lineitem GROUP BY l_orderkey, l_linenumber
    """,
)
def micro_groupby2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey", "l_linenumber").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_quantity").alias("min_qty"),
    )


@query(
    "micro_selection",
    "micro",
    doc="ref benchmark/simple/selection3.sql: projection + filter; both "
    "push into the parquet scan (SeqScanExec parity, P/SeqScanExec.java:48).",
    oracle="""
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_shipdate <= '1998-12-01'
    """,
)
def micro_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") <= "1998-12-01").select(
        "l_orderkey", "l_linenumber"
    )


@query(
    "micro_selection1",
    "micro",
    doc="ref benchmark/simple/selection1.sql: full-width SELECT * scan.",
    oracle="SELECT * FROM lineitem",
)
def micro_selection1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem")


@query(
    "micro_selection2",
    "micro",
    doc="ref benchmark/simple/selection2.sql: pure two-column projection "
    "— column pruning reaches the parquet scan (ReadSchema shows only "
    "the projected columns).",
    oracle="SELECT l_orderkey, l_linenumber FROM lineitem",
)
def micro_selection2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# Derived partsupp (FIXTURES.md §1 note: the driver generated no partsupp
# table; it is synthesized deterministically — 4 suppliers per part with
# arithmetic-hash availqty/supplycost — identically on the Spark side and
# in every DuckDB oracle, so TPC-H q2/q9/q11/q16/q20 stay runnable).
# --------------------------------------------------------------------------

_PARTSUPP_CTE = """
        partsupp AS (
            SELECT p_partkey AS ps_partkey,
                   CAST((p_partkey + k * (ns.n // 4)) % ns.n AS BIGINT)
                     AS ps_suppkey,
                   CAST((p_partkey * 7 + k * 13) % 9999 + 1 AS INT)
                     AS ps_availqty,
                   CAST(((p_partkey * 31 + k * 17) % 90000) / 100.0 + 1.0
                     AS DOUBLE) AS ps_supplycost
            FROM part,
                 (SELECT count(*) AS n FROM supplier) ns,
                 (SELECT unnest([0, 1, 2, 3]) AS k) ks
        )"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized partsupp: |part| x 4 rows, keys/attrs pure arithmetic.

    Declarative end-to-end: the supplier count enters the plan as a
    broadcast 1-row aggregate (no driver-side collect), so at 100 TB this
    is a map-only projection over ``part`` — no shuffle.
    """
    part = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("n_supp"))
    k = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("k")
    pk = F.col("p_partkey")
    return (
        part.select(pk, k)
        .join(F.broadcast(n))
        .select(
            pk.alias("ps_partkey"),
            ((pk + F.col("k") * F.floor(F.col("n_supp") / 4)) % F.col("n_supp"))
            .cast("long")
            .alias("ps_suppkey"),
            ((pk * 7 + F.col("k") * 13) % 9999 + 1).cast("int").alias("ps_availqty"),
            (((pk * 31 + F.col("k") * 17) % 90000) / 100.0 + 1.0)
            .cast("double")
            .alias("ps_supplycost"),
        )
    )


@query(
    "tpch_q2",
    "tpch",
    doc="Minimum-cost supplier per part — ref tpch/q2.sql (adapted: "
    "p_mfgr/s_address absent; p_type=ECONOMY, r_name=EUROPE; partsupp "
    "derived per FIXTURES.md). The correlated min-supplycost subquery is "
    "expressed as a broadcast-able per-part min join — at 100 TB the "
    "min-agg side is tiny relative to partsupp.",
    oracle=f"""
        WITH {_PARTSUPP_CTE},
        eu AS (
            SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
            FROM partsupp, supplier, nation, region
            WHERE s_suppkey = ps_suppkey AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        mn AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost
               FROM eu GROUP BY ps_partkey)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        FROM part, eu, mn
        WHERE part.p_partkey = eu.ps_partkey AND eu.ps_partkey = mn.ps_partkey
          AND eu.ps_supplycost = mn.min_cost
          AND p_size = 15 AND p_type = 'ECONOMY'
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    eu = (
        ps.join(bdim(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    # per-part min as a broadcast side: |parts| rows regardless of corpus
    # size, so the large eu side never shuffles (a window-min would
    # shuffle+sort all of eu — worse at scale, though faster at toy SF)
    mn = eu.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("min_cost"))
    flt = part.filter((F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY"))
    return (
        eu.join(bdim(mn.withColumnRenamed("ps_partkey", "mn_partkey")),
                (F.col("ps_partkey") == F.col("mn_partkey"))
                & (F.col("ps_supplycost") == F.col("min_cost")))
        .join(flt, F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q8",
    "tpch",
    doc="National market share — ref tpch/q8.sql (adapted: nation "
    "NATION_1, region EUROPE, p_type=ECONOMY). Two nation dims joined "
    "broadcast; conditional-sum ratio per year.",
    oracle="""
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_1' THEN volume
                              ELSE 0 END) / sum(volume), 4) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM part, supplier, lineitem, orders, customer,
                 nation n1, nation n2, region
            WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
              AND s_nationkey = n2.n_nationkey
              AND o_orderdate BETWEEN '1995-01-01' AND '1996-12-31'
              AND p_type = 'ECONOMY') all_nations
        GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        li.join(bdim(part), li.l_partkey == part.p_partkey)
        .join(bdim(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = joined.select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        _disc_price().alias("volume"),
        "nation",
    )
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            4,
        ).alias("mkt_share")
    )


@query(
    "tpch_q9",
    "tpch",
    doc="Product-type profit by nation/year — ref tpch/q9.sql (partsupp "
    "derived; p_name LIKE '%widget%'). Fact-to-fact joins "
    "lineitem⋈partsupp⋈orders shuffle on their keys (partsupp is "
    "4x|part| — fact-sized at scale, so NOT broadcast-hinted; AQE may "
    "still broadcast it at small SF); part/supplier/nation dims "
    "broadcast.",
    oracle=f"""
        WITH {_PARTSUPP_CTE}
        SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        FROM (
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - ps_supplycost * l_quantity AS amount
            FROM part, supplier, lineitem, partsupp, orders, nation
            WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
              AND ps_partkey = l_partkey AND p_partkey = l_partkey
              AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
              AND p_name LIKE '%widget%') profit
        GROUP BY nation, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier")
    ps = derived_partsupp(spark, sf_dir)
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    joined = (
        li.join(bdim(part), li.l_partkey == part.p_partkey)
        .join(bdim(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (_disc_price() - F.col("ps_supplycost") * F.col("l_quantity")).alias(
                "amount"
            ),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@query(
    "tpch_q11",
    "tpch",
    doc="Important stock identification — ref tpch/q11.sql (partsupp "
    "derived; threshold = 1.5x the average per-part value, scale-"
    "invariant vs the reference's 0.0001/SF constant). The global total "
    "enters as a broadcast 1-row aggregate (no collect).",
    oracle=f"""
        WITH {_PARTSUPP_CTE},
        nat AS (
            SELECT ps_partkey, ps_supplycost * ps_availqty AS v
            FROM partsupp, supplier, nation
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_1'),
        per_part AS (SELECT ps_partkey, sum(v) AS value FROM nat
                     GROUP BY ps_partkey),
        thresh AS (SELECT 1.5 * sum(v) / count(DISTINCT ps_partkey) AS t
                   FROM nat)
        SELECT ps_partkey, round(value, 2) AS value
        FROM per_part, thresh WHERE value > t
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat = (
        ps.join(bdim(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
        )
    )
    per_part = nat.groupBy("ps_partkey").agg(F.sum("v").alias("value"))
    thresh = nat.agg(
        (F.lit(1.5) * F.sum("v") / F.count_distinct(F.col("ps_partkey"))).alias("t")
    )
    return (
        per_part.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("t"))
        .select("ps_partkey", F.round("value", 2).alias("value"))
    )


@query(
    "tpch_q12",
    "tpch",
    doc="Shipping-priority classes — ref tpch/q12.sql (adapted: no "
    "l_shipmode/l_receiptdate in driver schema → group by l_returnflag, "
    "late = l_shipdate > o_orderdate). Conditional counts per class.",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey AND l_shipdate > o_orderdate
          AND l_shipdate BETWEEN '1996-01-01' AND '1997-12-31'
        GROUP BY l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "tpch_q16",
    "tpch",
    doc="Supplier count by part attributes — ref tpch/q16.sql (partsupp "
    "derived; s_comment filter dropped, column absent). count(DISTINCT) "
    "over a broadcast part-dim join.",
    oracle=f"""
        WITH {_PARTSUPP_CTE}
        SELECT p_brand, p_type, p_size,
               count(DISTINCT ps_suppkey) AS supplier_cnt
        FROM partsupp, part
        WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#1'
          AND p_size IN (1, 9, 15, 20, 24, 30, 42, 49)
        GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 15, 20, 24, 30, 42, 49)
    )
    return (
        ps.join(bdim(part), ps.ps_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("ps_suppkey")).alias("supplier_cnt"))
    )


@query(
    "tpch_q17",
    "tpch",
    doc="Small-quantity-order revenue — ref tpch/q17.sql (p_container "
    "absent → brand filter only). The correlated avg-quantity subquery "
    "becomes a per-part partial agg joined back to lineitem — the agg "
    "side is |parts| rows, broadcast-able at any scale.",
    oracle="""
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = part.p_partkey)
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(bdim(part), li.l_partkey == part.p_partkey)
        .join(bdim(per_part_avg), F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "tpch_q20",
    "tpch",
    doc="Potential part promotion — ref tpch/q20.sql (partsupp derived; "
    "s_address absent → s_acctbal projected). Nested IN-subqueries "
    "become semi-joins; the correlated availqty>0.5*sum(l_quantity) "
    "subquery is a per-(part,supp) agg joined to partsupp.",
    oracle=f"""
        WITH {_PARTSUPP_CTE}
        SELECT s_name, s_acctbal
        FROM supplier, nation
        WHERE s_nationkey = n_nationkey AND n_name = 'NATION_1'
          AND s_suppkey IN (
            SELECT ps_suppkey FROM partsupp
            WHERE ps_partkey IN (SELECT p_partkey FROM part
                                 WHERE p_name LIKE 'large%')
              AND ps_availqty > (
                SELECT 0.5 * sum(l_quantity) FROM lineitem
                WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                  AND l_shipdate >= '1996-01-01'
                  AND l_shipdate < '1997-01-01'))
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("large%"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = li.groupBy(
        F.col("l_partkey").alias("sh_partkey"), F.col("l_suppkey").alias("sh_suppkey")
    ).agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    qualified = (
        ps.join(
            bdim(part.select("p_partkey")),
            ps.ps_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("sh_partkey"))
            & (F.col("ps_suppkey") == F.col("sh_suppkey")),
            "inner",
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualified, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "tpch_q21",
    "tpch",
    doc="Suppliers who kept orders waiting — ref tpch/q21.sql (adapted: "
    "no l_receiptdate/l_commitdate → late means l_shipdate > "
    "o_orderdate). EXISTS → left-semi, NOT EXISTS → left-anti joins on "
    "orderkey with residual suppkey/date conditions.",
    oracle="""
        SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
        GROUP BY s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    # No hints on orders / the lineitem self-join legs: the session
    # policy bans static estimate-based broadcasts engine-wide (the
    # r06 memory rung watched the static planner broadcast the
    # 3-column lineitem leg from a pruned-width estimate and die in
    # the un-spillable build under a capped heap); AQE upgrades from
    # runtime sizes where a side is genuinely small.
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    base = (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    with_other = base.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    sole_late = with_other.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey"))
        & (F.col("x_shipdate") > F.col("o_orderdate")),
        "left_anti",
    )
    return (
        sole_late.join(
            bdim(
                supp.join(
                    F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
