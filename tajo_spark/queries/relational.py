"""Relational operator coverage: joins, aggregation, set ops, subqueries,
sort/limit — one registry entry per operator row in SURVEY.md §2.

Join parity: Tajo's nine join types (Plan.proto:222-231) all map to a
single ``df.join(..., how)`` call; hash-vs-merge selection
(PhysicalPlannerImpl.java:297-331) is delegated to Catalyst+AQE, which
picks broadcast-hash / shuffled-hash / sort-merge from runtime sizes.
RIGHT_SEMI / RIGHT_ANTI are expressed by swapping inputs, exactly as
the reference does (PhysicalPlannerImpl.java:681-758).

Set-op parity: Tajo executes only UNION [ALL]
(P/UnionExec.java:30); INTERSECT/EXCEPT are planned but not executable
(SURVEY.md §2.7) — we implement them anyway (superset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tajo_spark.catalog import load_table
from tajo_spark.queries.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Joins (SURVEY.md §2.3)
# --------------------------------------------------------------------------


@query(
    "join_inner_hash",
    "join",
    doc="Inner equi-join nation⋈region with broadcast dim — ref "
    "P/HashJoinExec.java:29 + BroadcastJoinRule.java:44.",
    oracle="""
        SELECT n_name, r_name FROM nation JOIN region
        ON n_regionkey = r_regionkey
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_name", "r_name")


@query(
    "join_left_outer",
    "join",
    doc="Left outer join with unmatched-side nulls — ref "
    "P/HashLeftOuterJoinExec.java:29. Customers vs their 'P' orders.",
    oracle="""
        SELECT c_custkey, o_orderkey
        FROM customer LEFT OUTER JOIN
             (SELECT * FROM orders WHERE o_orderstatus = 'P') p_orders
        ON c_custkey = o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "o_orderkey"
    )


@query(
    "join_right_outer",
    "join",
    doc="Right outer merge-join parity — ref P/RightOuterMergeJoinExec.java:33.",
    oracle="""
        SELECT o_orderkey, c_custkey
        FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') p_orders
        RIGHT OUTER JOIN customer ON o_custkey = c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "right").select(
        "o_orderkey", "c_custkey"
    )


@query(
    "join_full_outer",
    "join",
    doc="Full outer join — ref P/HashFullOuterJoinExec.java:35 / "
    "P/MergeFullOuterJoinExec.java:34. High-balance customers vs "
    "high-balance suppliers on nationkey-disjoint sets.",
    oracle="""
        SELECT c.c_custkey, s.s_suppkey
        FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
        FULL OUTER JOIN (SELECT * FROM supplier WHERE s_acctbal > 0) s
        ON c.c_nationkey = s.s_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)
    return cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full").select(
        "c_custkey", "s_suppkey"
    )


@query(
    "join_cross",
    "join",
    doc="Cross join (Tajo runs it as hash join with empty keys, "
    "PhysicalPlannerImpl.java:334-356; Spark plans BroadcastNestedLoop).",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return region.crossJoin(F.broadcast(nation)).select("r_name", "n_name")


@query(
    "join_left_semi",
    "join",
    doc="Left semi join: parts that appear in lineitem — ref "
    "P/HashLeftSemiJoinExec.java:33.",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                            WHERE l_quantity > 49)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49)
    return part.join(li, part.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name"
    )


@query(
    "join_left_anti",
    "join",
    doc="Left anti join: parts never ordered at quantity > 49 — ref "
    "P/HashLeftAntiJoinExec.java:33.",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
                                WHERE l_quantity > 49)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49)
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@query(
    "join_non_equi",
    "join",
    doc="Theta (non-equi) join: Tajo evaluates these as residual filters in "
    "CommonJoinExec; Spark plans a nested-loop join, which the reference "
    "lacks entirely (SURVEY.md §2.3 — superset). Suppliers richer than "
    "same-nation top customer.",
    oracle="""
        SELECT s_suppkey, c_custkey FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        WHERE c_acctbal > 9900
    """,
)
def join_non_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    return supp.join(
        cust,
        (supp.s_nationkey == cust.c_nationkey) & (supp.s_acctbal > cust.c_acctbal),
    ).select("s_suppkey", "c_custkey")


# --------------------------------------------------------------------------
# Aggregation (SURVEY.md §2.4)
# --------------------------------------------------------------------------


@query(
    "agg_having",
    "aggregate",
    doc="GROUP BY + HAVING (post-agg filter) — ref P/HavingExec.java:28.",
    oracle="""
        SELECT o_custkey, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_custkey HAVING count(*) > 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .filter(F.col("n_orders") > 12)
    )


@query(
    "agg_distinct_multi",
    "aggregate",
    doc="Multi-DISTINCT aggregation in one GROUP BY — Tajo builds a 3-stage "
    "distributed plan (DistinctGroupbyBuilder.java:57, ~1700 LoC); Catalyst's "
    "Expand-based rewrite does this natively.",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey)  AS distinct_parts,
               count(DISTINCT l_suppkey)  AS distinct_supps,
               count(*)                   AS n_rows,
               round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty
        FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
    )


@query(
    "agg_stats",
    "aggregate",
    doc="Statistical aggregates: stddev/variance/corr — ref builtin "
    "StdDevPop/StdDevSamp/VarPop/VarSamp/Corr (SURVEY.md §2.4).",
    oracle="""
        SELECT l_returnflag,
               round(stddev_pop(l_quantity), 4)  AS sd_pop,
               round(stddev_samp(l_quantity), 4) AS sd_samp,
               round(var_pop(l_quantity), 4)     AS v_pop,
               round(var_samp(l_quantity), 4)    AS v_samp,
               round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr
        FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_pop("l_quantity"), 4).alias("sd_pop"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_samp"),
        F.round(F.var_pop("l_quantity"), 4).alias("v_pop"),
        F.round(F.var_samp("l_quantity"), 4).alias("v_samp"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
    )


@query(
    "agg_percentiles",
    "aggregate",
    doc="Exact percentile aggregates (linear interpolation): Spark "
    "percentile == DuckDB quantile_cont. Superset — the reference has "
    "no percentile builtin. Note: exact percentile buffers group values; "
    "at 100 TB use approx_percentile (t-digest sketch, mergeable "
    "partials) — same API shape, sketch checked rows-only elsewhere.",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.25)
                 / 100.0 AS p25,
               quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.50)
                 / 100.0 AS p50,
               quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.90)
                 / 100.0 AS p90,
               quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.99)
                 / 100.0 AS p99
        FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Percentile over exact integer cents, NOT raw doubles + round(2):
    # the two engines interpolate lo/hi with formulas that differ in the
    # last ulp, and a coarse round amplifies that across a .xx5 boundary
    # (the exact-half gotcha). Integer inputs make the interpolation
    # arithmetic identical to well past the compare precision.
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    # ONE percentile aggregate with an array of percentages, not four:
    # exact percentile buffers every group value per aggregate, so four
    # scalar calls buffer (and sort) the group 4x — the array form
    # shares one buffer (r11: 4.6 s -> measured after, the slowest
    # rotation-bench row)
    names = [(0.25, "p25"), (0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
    pcts = F.percentile(cents, F.array(*[F.lit(p) for p, _ in names]))
    return (
        li.groupBy("l_returnflag")
        .agg(pcts.alias("__pcts"))
        .select(
            "l_returnflag",
            *[
                (F.col("__pcts")[i] / 100.0).alias(name)
                for i, (_, name) in enumerate(names)
            ],
        )
    )


@query(
    "agg_string_agg",
    "aggregate",
    doc="string_agg — ref engine/function/builtin/StringAgg.java. Order "
    "pinned by sorting the collected list so the result is deterministic "
    "under any partitioning (required at 100 TB).",
    oracle="""
        SELECT r_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM region JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_regionkey
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .groupBy("r_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
        )
    )


@query(
    "agg_rollup",
    "aggregate",
    doc="ROLLUP — Tajo parses but never executes cube/rollup "
    "(LogicalPlanner.java:984-992, SURVEY.md §2.4) — superset via "
    "df.rollup().",
    oracle="""
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("superset",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_cube",
    "aggregate",
    doc="CUBE — superset (reference parses only; SURVEY.md §2.4).",
    oracle="""
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("superset",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "agg_grouping_sets",
    "aggregate",
    doc="GROUPING SETS — superset (grammar SQLParser.g4:1116-1146 parses, "
    "planner drops; we execute).",
    oracle="""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    tags=("superset",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM parquet.`{sf_dir}/lineitem.parquet`
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "agg_global",
    "aggregate",
    doc="Global (no GROUP BY) aggregation with min/max/avg/count over a "
    "join-free scan; two-phase partial/final agg at scale.",
    oracle="""
        SELECT count(*) AS n, count(DISTINCT o_custkey) AS n_cust,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_custkey").alias("n_cust"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k (SURVEY.md §2.6)
# --------------------------------------------------------------------------


@query(
    "sort_nulls_topk",
    "sort",
    doc="ORDER BY multi-key with NULLS FIRST/LAST + LIMIT (top-k) — ref "
    "P/ExternalSortExec.java:75 + P/LimitExec.java:28; Spark plans "
    "TakeOrderedAndProject (no global sort materialization).",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END
                 AS price_if_final
        FROM orders
        ORDER BY price_if_final DESC NULLS FIRST, o_orderkey
        LIMIT 25
    """,
)
def sort_nulls_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.when(F.col("o_orderstatus") == "P", F.lit(None))
            .otherwise(F.col("o_totalprice"))
            .alias("price_if_final"),
        )
        .orderBy(F.col("price_if_final").desc_nulls_first(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "sort_global",
    "sort",
    doc="Global sort on a full table (range-shuffle + merge in both engines: "
    "Tajo GlobalPlanner.buildSortPlan:783, Spark range partitioner). "
    "Order-insensitive hash still validates content; sort exercised for plan.",
    oracle="""
        SELECT c_custkey, c_acctbal FROM customer ORDER BY c_acctbal DESC,
        c_custkey
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select("c_custkey", "c_acctbal").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY.md §2.7)
# --------------------------------------------------------------------------


def _halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_custkey") % 3 != 0).select("c_nationkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_nationkey")
    return a, b


_SETOP_A = "SELECT c_nationkey FROM customer WHERE c_custkey % 3 <> 0"
_SETOP_B = "SELECT c_nationkey FROM customer WHERE c_acctbal > 5000"


@query(
    "setop_union_all",
    "setop",
    doc="UNION ALL (concatenation) — ref P/UnionExec.java:30.",
    oracle=f"{_SETOP_A} UNION ALL {_SETOP_B}",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.union(b)


@query(
    "setop_union_distinct",
    "setop",
    doc="UNION DISTINCT = union + dedup agg — ref LogicalPlanner.java:1442.",
    oracle=f"{_SETOP_A} UNION {_SETOP_B}",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.union(b).distinct()


@query(
    "setop_intersect",
    "setop",
    doc="INTERSECT — reference plans but cannot execute (SortIntersectExec "
    "only reachable from tests; SURVEY.md §2.7) — superset.",
    oracle=f"{_SETOP_A} INTERSECT {_SETOP_B}",
    tags=("superset",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.intersect(b)


@query(
    "setop_intersect_all",
    "setop",
    doc="INTERSECT ALL — superset (SURVEY.md §2.7).",
    oracle=f"{_SETOP_A} INTERSECT ALL {_SETOP_B}",
    tags=("superset",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.intersectAll(b)


@query(
    "setop_except",
    "setop",
    doc="EXCEPT — superset (SURVEY.md §2.7).",
    oracle=f"{_SETOP_A} EXCEPT {_SETOP_B}",
    tags=("superset",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.subtract(b)


@query(
    "setop_except_all",
    "setop",
    doc="EXCEPT ALL — superset (SURVEY.md §2.7).",
    oracle=f"{_SETOP_A} EXCEPT ALL {_SETOP_B}",
    tags=("superset",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _halves(spark, sf_dir)
    return a.exceptAll(b)


# --------------------------------------------------------------------------
# Subqueries (SURVEY.md §2.2 — IN/NOT IN are reference parity; EXISTS,
# correlated, scalar are superset: ExprAnnotator.java:412-414 rejects them)
# --------------------------------------------------------------------------


@query(
    "subq_in",
    "subquery",
    doc="Uncorrelated IN subquery → left semi join — ref "
    "InSubqueryRewriteRule.java:117.",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'MACHINERY')
    """,
)
def subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    return orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@query(
    "subq_not_in",
    "subquery",
    doc="NOT IN subquery → left anti join (null-safe) — ref "
    "InSubqueryRewriteRule.java:126.",
    oracle="""
        SELECT o_orderkey FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_acctbal < 0)
    """,
)
def subq_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    return orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).select("o_orderkey")


@query(
    "subq_exists_correlated",
    "subquery",
    doc="Correlated EXISTS — reference rejects at annotation "
    "(ExprAnnotator.java:412-414) — superset via Spark SQL.",
    oracle="""
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > c.c_acctbal * 50)
    """,
    tags=("superset",),
)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        f"""
        SELECT c_custkey FROM parquet.`{sf_dir}/customer.parquet` c
        WHERE EXISTS (SELECT 1 FROM parquet.`{sf_dir}/orders.parquet` o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > c.c_acctbal * 50)
        """
    )


@query(
    "subq_scalar",
    "subquery",
    doc="Scalar subquery in predicate — reference has algebra only, no "
    "annotation path (SURVEY.md §2.2) — superset.",
    oracle="""
        SELECT p_partkey, p_retailprice FROM part
        WHERE p_retailprice > (SELECT avg(p_retailprice) * 1.5 FROM part)
    """,
    tags=("superset",),
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        f"""
        SELECT p_partkey, p_retailprice FROM parquet.`{sf_dir}/part.parquet`
        WHERE p_retailprice >
              (SELECT avg(p_retailprice) * 1.5
               FROM parquet.`{sf_dir}/part.parquet`)
        """
    )


@query(
    "subq_from_derived",
    "subquery",
    doc="FROM-clause derived table (sub-select) with outer agg — parity "
    "(TestUnionQuery/TestCaseByCases patterns).",
    oracle="""
        SELECT seg, count(*) AS n, round(avg(bal), 4) AS avg_bal
        FROM (SELECT c_mktsegment AS seg, c_acctbal AS bal
              FROM customer WHERE c_acctbal > 1000) t
        GROUP BY seg
    """,
)
def subq_from_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    inner = cust.filter(F.col("c_acctbal") > 1000).select(
        F.col("c_mktsegment").alias("seg"), F.col("c_acctbal").alias("bal")
    )
    return inner.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("bal"), 4).alias("avg_bal")
    )


@query(
    "select_no_from",
    "scan",
    doc="FROM-less SELECT (constant expressions) — ref P/EvalExprExec.java:30.",
    oracle="SELECT 1 + 1 AS two, upper('tajo') AS name, CAST(3.14 AS DOUBLE) AS pi_ish",
)
def select_no_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(1).select(
        F.lit(2).cast("int").alias("two"),
        F.lit("TAJO").alias("name"),
        F.lit(3.14).alias("pi_ish"),
    )


# --------------------------------------------------------------------------
# Nested RECORD types (SURVEY.md §1.2 RECORD; TestSelectNestedRecord,
# dataset/TestSelectNestedRecord/*; DDL sample0_ddl.sql:1 — nested structs
# as projection, group-by key, and join key)
# --------------------------------------------------------------------------


@query(
    "nested_project",
    "relational",
    doc="Nested struct construction + subfield projection (RECORD type, "
    "TestSelectNestedRecord.testSelect* parity): struct-of-struct built "
    "in-plan, dotted paths resolved by Catalyst.",
    oracle="""
        SELECT c_custkey,
               struct_pack(seg := c_mktsegment,
                           acct := struct_pack(bal := round(c_acctbal, 2),
                                               pos := c_acctbal > 0)
               ).seg AS seg,
               struct_pack(seg := c_mktsegment,
                           acct := struct_pack(bal := round(c_acctbal, 2),
                                               pos := c_acctbal > 0)
               ).acct.bal AS bal,
               struct_pack(seg := c_mktsegment,
                           acct := struct_pack(bal := round(c_acctbal, 2),
                                               pos := c_acctbal > 0)
               ).acct.pos AS pos
        FROM customer
    """,
)
def nested_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    rec = F.struct(
        F.col("c_mktsegment").alias("seg"),
        F.struct(
            F.round("c_acctbal", 2).alias("bal"),
            (F.col("c_acctbal") > 0).alias("pos"),
        ).alias("acct"),
    )
    return cust.select(
        "c_custkey",
        rec.getField("seg").alias("seg"),
        rec.getField("acct").getField("bal").alias("bal"),
        rec.getField("acct").getField("pos").alias("pos"),
    )


@query(
    "nested_group_by",
    "relational",
    doc="Nested field as group-by key "
    "(testNestedFieldAsGroupbyKey1.sql parity).",
    oracle="""
        WITH r AS (SELECT struct_pack(seg := c_mktsegment,
                                      nk := c_nationkey) AS rec,
                          c_acctbal
                   FROM customer)
        SELECT rec.seg AS seg, count(*) AS n,
               round(sum(c_acctbal), 2) AS total_bal
        FROM r GROUP BY rec.seg
    """,
)
def nested_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    r = cust.select(
        F.struct(
            F.col("c_mktsegment").alias("seg"), F.col("c_nationkey").alias("nk")
        ).alias("rec"),
        "c_acctbal",
    )
    return r.groupBy(F.col("rec.seg").alias("seg")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@query(
    "nested_join_key",
    "relational",
    doc="Nested field as join key (testNestedFieldAsJoinKey1.sql parity); "
    "the struct subfield drives a broadcast equi-join.",
    oracle="""
        WITH r AS (SELECT c_custkey,
                          struct_pack(seg := c_mktsegment,
                                      nk := c_nationkey) AS rec
                   FROM customer)
        SELECT n_name, count(*) AS n_cust
        FROM r JOIN nation ON rec.nk = n_nationkey
        GROUP BY n_name
    """,
)
def nested_join_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    r = cust.select(
        "c_custkey",
        F.struct(
            F.col("c_mktsegment").alias("seg"), F.col("c_nationkey").alias("nk")
        ).alias("rec"),
    )
    return (
        r.join(F.broadcast(nation), F.col("rec.nk") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@query(
    "join_right_semi",
    "join",
    doc="RIGHT SEMI join — reference executes it by swapping operands "
    "onto the left variant (PhysicalPlannerImpl.createRightSemiJoinPlan, "
    "PhysicalPlannerImpl.java:681-758); Spark has native right-side "
    "pushdown via left_semi with reversed inputs.",
    oracle="""
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem
                            WHERE l_quantity > 45)
    """,
)
def join_right_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    supp = load_table(spark, sf_dir, "supplier")
    # right-semi(li, supp) == left-semi(supp, li) — the reference's swap
    return supp.join(
        li, supp.s_suppkey == li.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "join_right_anti",
    "join",
    doc="RIGHT ANTI join via operand swap (PhysicalPlannerImpl.java:681 "
    "builds HashLeftAntiJoinExec with reversed children).",
    oracle="""
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem
                                WHERE l_quantity > 45)
    """,
)
def join_right_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        li, supp.s_suppkey == li.l_suppkey, "left_anti"
    ).select("s_suppkey", "s_name")


@query(
    "subq_cte_chain",
    "subquery",
    doc="Multi-CTE chain through the SQL path (WITH ... referencing an "
    "earlier CTE) — grammar SQLParser.g4 WITH support; executes via "
    "spark.sql with both CTEs inlined by Catalyst.",
    oracle="""
        WITH big_orders AS (
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE o_totalprice > 150000),
        per_cust AS (
            SELECT o_custkey, count(*) AS n_big,
                   round(sum(o_totalprice), 2) AS total
            FROM big_orders GROUP BY o_custkey)
        SELECT c_mktsegment, count(*) AS n_cust,
               round(sum(total), 2) AS segment_total
        FROM per_cust, customer
        WHERE o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
)
def subq_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tajo_spark.catalog import register_tables

    register_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE o_totalprice > 150000),
        per_cust AS (
            SELECT o_custkey, count(*) AS n_big,
                   round(sum(o_totalprice), 2) AS total
            FROM big_orders GROUP BY o_custkey)
        SELECT c_mktsegment, count(*) AS n_cust,
               round(sum(total), 2) AS segment_total
        FROM per_cust JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )


@query(
    "join_skew_salted",
    "join",
    doc="Skewed-key equi-join through the salted-join operator "
    "(operators/skew.py): 70% of lineitem rows collapse onto one "
    "derived hot key (the testdata has no natural join skew, so the "
    "skew is synthesized deterministically from l_orderkey), the other "
    "side is shuffle-hash-hinted so the join really shuffles, and "
    "salting spreads the hot key over 16 reducers instead of one. "
    "Result is compacted to per-returnflag sums so the driver hashes "
    "3 rows while the 600k-row join executes in full. Reference "
    "anchor: the enforcer's shuffle planning (Plan.proto:545-550) has "
    "no skew answer — this is the 100 TB mitigation AQE + salting "
    "provide.",
    oracle="""
        WITH lk AS (
            SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
                        ELSE l_orderkey END AS skew_key,
                   l_returnflag, l_quantity
            FROM lineitem),
        rk AS (
            SELECT CASE WHEN o_orderkey % 10 < 7 THEN 0
                        ELSE o_orderkey END AS skew_key,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM orders GROUP BY 1)
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(l_quantity * cnt) AS BIGINT) AS weighted_qty
        FROM lk JOIN rk USING (skew_key)
        GROUP BY l_returnflag
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tajo_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .cast("long")
        .alias("skew_key"),
        "l_returnflag",
        "l_quantity",
        "l_orderkey",
    )
    rk = (
        _t(spark, sf_dir, "orders")
        .select(
            F.when(F.col("o_orderkey") % 10 < 7, F.lit(0))
            .otherwise(F.col("o_orderkey"))
            .cast("long")
            .alias("skew_key")
        )
        .groupBy("skew_key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # force a real shuffled join: broadcasting the replicated side
        # would bypass the skew path this query exists to exercise
        .hint("shuffle_hash")
    )
    joined = salted_join(li, rk, on=["skew_key"], unique_col="l_orderkey")
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("l_quantity") * F.col("cnt")).cast("long").alias(
            "weighted_qty"
        ),
    )


@query(
    "agg_skew_salted",
    "skew",
    doc="Hot-key aggregation through the two-phase salted operator "
    "(operators/skew.salted_agg): event_type has only 5 distinct "
    "values, so an unsalted groupBy bottoms out on 5 reducers no "
    "matter how many cores exist; salting fans each hot key over 16 "
    "reducers in phase 1 and merges 5x16 partials in phase 2. "
    "Semantics-preserving — the oracle is the plain GROUP BY.",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(user_id) AS BIGINT) AS max_user
        FROM events GROUP BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tajo_spark.operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("long").alias("user_id")
    )
    return salted_agg(
        events,
        keys=["event_type"],
        aggs={
            "n_events": ("count", "user_id"),
            "max_user": ("max", "user_id"),
        },
        unique_col="user_id",
        salt=16,
    )
