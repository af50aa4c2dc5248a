"""As-of and range join operator tests (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tajo_spark.operators import temporal


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_basic(spark):
    left = _mk(
        spark,
        [(1, 5, "a"), (1, 10, "b"), (2, 3, "c"), (1, 2, "d"), (None, 4, "e")],
        "k int, ts int, v string",
    )
    right = _mk(
        spark, [(1, 5, "x"), (1, 7, "y"), (3, 1, "z")], "k int, ts int, rv string"
    )
    out = temporal.asof_join(
        left, right, "k", "k", "ts", "ts", ["rv"], direction="backward"
    )
    got = {(r.k, r.ts): (r.matched_ts, r.rv) for r in out.collect()}
    # inclusive at equal ts; no match -> nulls; NULL key never matches
    assert got[(1, 5)] == (5, "x")
    assert got[(1, 10)] == (7, "y")
    assert got[(1, 2)] == (None, None)
    assert got[(2, 3)] == (None, None)
    assert got[(None, 4)] == (None, None)
    assert out.count() == 5


def test_asof_forward(spark):
    left = _mk(spark, [(1, 5), (1, 8), (1, 20)], "k int, ts int")
    right = _mk(spark, [(1, 7, 70.0), (1, 8, 80.0)], "k int, ts int, val double")
    out = temporal.asof_join(
        left, right, "k", "k", "ts", "ts", ["val"], direction="forward"
    )
    got = {r.ts: (r.matched_ts, r.val) for r in out.collect()}
    assert got[5] == (7, 70.0)
    assert got[8] == (8, 80.0)  # inclusive
    assert got[20] == (None, None)


def test_asof_tiebreak_picks_greatest(spark):
    left = _mk(spark, [(1, 10)], "k int, ts int")
    right = _mk(
        spark,
        [(1, 10, 1, "lo"), (1, 10, 9, "hi"), (1, 10, 5, "mid")],
        "k int, ts int, seq int, v string",
    )
    out = temporal.asof_join(
        left, right, "k", "k", "ts", "ts", ["v"], tiebreak="seq"
    )
    assert [r.v for r in out.collect()] == ["hi"]


def test_asof_matches_duckdb_asof(spark, ddb):
    """Cross-engine check on real tables at the test SF."""
    from tajo_spark.queries.registry import all_queries
    import tests.conftest as C

    spec = all_queries()["asof_join_events_orders"]
    spdf = spec.spark(spark, C.SF_DIR).toPandas()
    opdf = ddb.execute(spec.oracle).fetchdf()
    assert len(spdf) == len(opdf)
    assert sorted(spdf.columns) == sorted(opdf.columns)


def test_asof_join_plan_single_key_shuffle(spark):
    """The union+window as-of must not plan a join at all — one exchange
    on the key plus an in-partition sort is the whole story."""
    left = _mk(spark, [(1, 5, "a")], "k int, ts int, v string")
    right = _mk(spark, [(1, 5, "x")], "k int, ts int, rv string")
    out = temporal.asof_join(left, right, "k", "k", "ts", "ts", ["rv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_range_join_is_not_nested_loop(spark):
    left = _mk(spark, [(1, 5)], "k int, p int")
    right = _mk(spark, [(1, 0, 10)], "k int, s int, e int")
    out = temporal.range_join(
        left, right, on=[("k", "k")], point="p",
        start=right["s"], end=right["e"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert out.count() == 1


def test_bucketed_range_join_matches_naive(spark):
    import random

    rnd = random.Random(7)
    pts = [(i, rnd.uniform(0, 1000)) for i in range(300)]
    ivs = [
        (j, lo, lo + rnd.uniform(0, 80))
        for j, lo in ((j, rnd.uniform(0, 1000)) for j in range(60))
    ]
    left = spark.createDataFrame(pts, "pid int, p double")
    right = spark.createDataFrame(ivs, "iid int, s double, e double")

    fast = temporal.bucketed_range_join(
        left, right, F.col("p"), F.col("s"), F.col("e"), bucket_width=50
    )
    naive = left.join(
        right, (left["p"] >= right["s"]) & (left["p"] < right["e"])
    )
    got = {(r.pid, r.iid) for r in fast.collect()}
    want = {(r.pid, r.iid) for r in naive.collect()}
    assert got == want and len(want) > 0
