"""Connected-components operator tests (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tajo_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r.node: r.component for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    n = 12
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_cycle_and_cross_edges(spark):
    got = _cc(spark, [(5, 6), (6, 7), (7, 5), (7, 2), (30, 31)])
    assert got[5] == got[6] == got[7] == got[2] == 2
    assert got[30] == got[31] == 30


def test_matches_oracle_on_real_pairs(spark, ddb):
    from tajo_spark.queries.registry import all_queries
    import tests.conftest as C

    spec = all_queries()["dedup_components"]
    spdf = spec.spark(spark, C.SF_DIR).toPandas()
    opdf = ddb.execute(spec.oracle).fetchdf()
    C.assert_frames_match(spdf, opdf, "dedup_components")


def test_convergence_probe_is_shuffle_free_scan(spark):
    # regression pin: the per-round convergence probe must read the
    # __changed flag folded into the label-update pass — a filter-scan
    # of the checkpointed blocks with no Join and no Exchange (round 1
    # paid a join+shuffle job per round just to detect convergence)
    from tajo_spark.operators import graph

    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    both = (
        df.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(df.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    out = graph._propagate_round(both, labels)
    assert "__changed" in out.columns
    probe_plan = (
        out.filter(F.col("__changed"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in probe_plan, probe_plan
    assert "Exchange" not in probe_plan, probe_plan


def test_raises_when_not_converged(spark):
    import pytest

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_star_variant_matches_simple_on_shapes(spark):
    # large-star/small-star (O(log n) rounds) must agree with the
    # simple min-label variant on chains, cliques, crosses, singletons
    from tajo_spark.operators.graph import connected_components_star

    cases = [
        [(1, 2), (2, 3), (10, 11)],
        [(i, i + 1) for i in range(30)],  # long chain: star's home turf
        [(5, 6), (6, 7), (7, 5), (7, 2), (30, 31)],
        [(1, 1)],  # self-loop collapses to a singleton
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        simple = {
            r.node: r.component
            for r in connected_components(df, max_iter=60).collect()
        }
        star = {
            r.node: r.component
            for r in connected_components_star(df).collect()
        }
        assert star == simple, edges


def test_star_variant_random_graphs(spark):
    import random

    from tajo_spark.operators.graph import connected_components_star

    rng = random.Random(7)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
    ]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    simple = {r.node: r.component for r in connected_components(df, max_iter=60).collect()}
    star = {r.node: r.component for r in connected_components_star(df).collect()}
    assert star == simple


def test_pagerank_symmetric_triangle_uniform(spark):
    from tajo_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "doc_a LONG, doc_b LONG"
    )
    out = {r.node: r.pagerank for r in pagerank(edges, n_iter=4).collect()}
    # full symmetry: stationary at exactly 1/3 each, every iteration
    assert all(abs(v - 0.333333) < 1e-6 for v in out.values())
    assert abs(sum(out.values()) - 1.0) < 1e-4


def test_pagerank_star_center_dominates_and_mass_conserved(spark):
    from tajo_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "doc_a LONG, doc_b LONG"
    )
    out = {r.node: r.pagerank for r in pagerank(edges, n_iter=5).collect()}
    leaves = [v for k, v in out.items() if k != 0]
    assert all(out[0] > lv * 2 for lv in leaves)
    assert len(set(leaves)) == 1  # symmetric leaves rank identically
    assert abs(sum(out.values()) - 1.0) < 1e-4  # undirected: no dangling loss


def test_pagerank_short_loop_runs_no_per_round_jobs(spark):
    # r13 pin: the rank update rebuilds from the CHECKPOINTED deg frame,
    # so pr is referenced once per round, lineage is linear, and a short
    # loop (n_iter < cadence 4) runs exactly 3 construction jobs — bi
    # checkpoint, deg checkpoint, deg.count — with the rounds deferred
    # to the consumer's single action (r12 paid one localCheckpoint job
    # + a rank-frame materialization per iteration)
    from tajo_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a LONG, doc_b LONG"
    )
    sc = spark.sparkContext

    def construction_jobs(n_iter: int, tag: str) -> int:
        sc.setJobGroup(tag, f"pagerank n_iter={n_iter} construction")
        df = pagerank(edges, n_iter=n_iter)
        sc.setJobGroup(None, None)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the unrolled rounds read the bi/deg checkpoints (ExistingRDD
        # scans), keeping the consumer plan bounded
        assert "ExistingRDD" in plan
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    # construction cost must NOT grow with n_iter below the cadence —
    # the bi/deg checkpoints and the count are the only jobs
    j1 = construction_jobs(1, "pr_short_1")
    j3 = construction_jobs(3, "pr_short_3")
    assert j1 == j3, f"per-round jobs leaked back in: {j1} vs {j3}"


def test_pagerank_long_loop_checkpoints_on_cadence(spark):
    # n_iter=5 crosses the every-4-rounds cadence: construction runs
    # MORE jobs than the short loop (the one truncation checkpoint),
    # bounding plan depth for long loops
    from tajo_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a LONG, doc_b LONG"
    )
    sc = spark.sparkContext

    def construction_jobs(n_iter: int, tag: str) -> int:
        sc.setJobGroup(tag, f"pagerank n_iter={n_iter} construction")
        pagerank(edges, n_iter=n_iter)
        sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    j3 = construction_jobs(3, "pr_cad_3")
    j5 = construction_jobs(5, "pr_cad_5")
    assert j5 > j3, f"cadence checkpoint missing: {j3} vs {j5}"


def test_pagerank_matches_serial_reference(spark):
    # trajectory pin across the cadence boundary: the distributed loop
    # (deg-join update, no per-round checkpoint) must reproduce a
    # serial NumPy-free simulation with the same 9-decimal per-round
    # rounding, on an asymmetric graph where every iteration moves mass
    from tajo_spark.operators.graph import pagerank

    pairs = [(1, 2), (2, 3), (3, 4), (1, 3)]
    n_iter, damping = 5, 0.85
    bi = pairs + [(b, a) for a, b in pairs]
    nodes = sorted({x for e in bi for x in e})
    deg = {u: sum(1 for a, _ in bi if a == u) for u in nodes}
    n = len(nodes)
    pr = {u: round(1.0 / n, 9) for u in nodes}
    for _ in range(n_iter):
        s = {u: 0.0 for u in nodes}
        for a, b in bi:
            s[b] += pr[a] / deg[a]
        pr = {
            u: round((1.0 - damping) / n + damping * s[u], 9)
            for u in nodes
        }
    expected = {u: round(v, 6) for u, v in pr.items()}

    edges = spark.createDataFrame(pairs, "doc_a LONG, doc_b LONG")
    got = {
        r.node: r.pagerank
        for r in pagerank(edges, n_iter=n_iter, damping=damping).collect()
    }
    assert got.keys() == expected.keys()
    for u in expected:
        assert abs(got[u] - expected[u]) < 1e-9, (u, got[u], expected[u])


def test_mirror_emits_both_orientations_once_per_input_row(spark):
    # r13 pin: the explode-mirror must emit the exact multiset the old
    # union-of-selects emitted (duplicates preserved — pagerank's deg
    # counts depend on multiplicity), from ONE reference to the input
    from tajo_spark.operators.graph import _mirror

    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 3), (4, 4)], "doc_a LONG, doc_b LONG"
    )
    got = sorted((r.a, r.b) for r in _mirror(edges, "doc_a", "doc_b").collect())
    want = sorted(
        [(1, 2), (2, 1), (1, 2), (2, 1), (2, 3), (3, 2), (4, 4), (4, 4)]
    )
    assert got == want


def test_auto_fallback_to_star_on_deep_chain(spark):
    """r07 verdict #3: when min-label propagation hasn't converged by
    round ~6 the operator must auto-select large-star/small-star
    instead of burning O(diameter) rounds.  A 120-chain (diameter ≫
    fallback threshold) must come back correct, via the star path."""
    import tajo_spark.operators.graph as G

    edges = [(i, i + 1) for i in range(120)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")

    called = {}
    real = G.connected_components_star

    def spy(*a, **k):
        called["star"] = True
        return real(*a, **k)

    G.connected_components_star, orig = spy, G.connected_components_star
    try:
        got = {
            r.node: r.component
            for r in G.connected_components(df, max_iter=60).collect()
        }
    finally:
        G.connected_components_star = orig
    assert called.get("star"), "fallback did not engage on a deep chain"
    assert got == {i: 0 for i in range(121)}


def test_fallback_preserves_components_with_selfloops_and_islands(spark):
    # shortcut-seeded star must keep every node of the original edge
    # set, including self-loop singletons, and must not merge islands
    from tajo_spark.operators.graph import connected_components

    edges = (
        [(i, i + 1) for i in range(40)]          # chain 0..40
        + [(100 + i, 101 + i) for i in range(40)]  # chain 100..140
        + [(999, 999)]                            # self-loop singleton
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.node: r.component
        for r in connected_components(df, max_iter=60).collect()
    }
    want = {i: 0 for i in range(41)}
    want.update({100 + i: 100 for i in range(41)})
    want[999] = 999
    assert got == want


def test_fallback_disabled_still_raises(spark):
    import pytest

    from tajo_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=8, star_fallback_after=None)


def test_pagerank_empty_edges_returns_empty(spark):
    # r13 review: an empty edge frame made the 1/n init literal divide
    # by zero while the plan was being built; now it returns the empty
    # (node, pagerank) frame
    from tajo_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "doc_a LONG, doc_b LONG")
    out = pagerank(edges, n_iter=3)
    assert out.columns == ["node", "pagerank"]
    assert out.count() == 0


def test_connected_components_empty_edges_returns_empty(spark):
    from tajo_spark.operators.graph import connected_components

    edges = spark.createDataFrame([], "doc_a LONG, doc_b LONG")
    out = connected_components(edges)
    assert out.columns == ["node", "component"]
    assert out.count() == 0
