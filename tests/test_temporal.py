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
    """Cross-engine value check on real tables at the test SF."""
    from tajo_spark.queries.registry import all_queries
    import tests.conftest as C

    spec = all_queries()["asof_join_events_orders"]
    spdf = spec.spark(spark, C.SF_DIR).toPandas()
    opdf = ddb.execute(spec.oracle).fetchdf()
    C.assert_frames_match(spdf, opdf, "asof_join_events_orders")


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


def test_asof_null_keys_and_ts_never_match(spark):
    left = _mk(spark, [(1, 5), (None, 5), (1, None)], "k int, ts int")
    right = _mk(
        spark,
        [(None, 1, "nullkey"), (1, None, "nullts"), (1, 3, "ok")],
        "k int, ts int, rv string",
    )
    out = temporal.asof_join(left, right, "k", "k", "ts", "ts", ["rv"])
    got = {(r.k, r.ts): r.rv for r in out.collect()}
    assert got[(1, 5)] == "ok"          # only the valid right row matches
    assert got[(None, 5)] is None       # NULL key never equals NULL
    assert got[(1, None)] is None       # NULL ts compares to nothing
    # forward direction: null left ts must also stay unmatched
    fwd = temporal.asof_join(
        left, right, "k", "k", "ts", "ts", ["rv"], direction="forward"
    )
    fgot = {(r.k, r.ts): r.rv for r in fwd.collect()}
    assert fgot[(1, None)] is None


def test_bucketed_range_join_ignores_inverted_intervals(spark):
    left = spark.createDataFrame([(1, 5.0)], "pid int, p double")
    right = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 1e9, 0.0), (3, 7.0, 7.0)],
        "iid int, s double, e double",
    )
    out = temporal.bucketed_range_join(
        left, right, F.col("p"), F.col("s"), F.col("e"), bucket_width=50
    )
    assert [(r.pid, r.iid) for r in out.collect()] == [(1, 1)]


def test_bucketed_range_join_boundary_end_excluded(spark):
    # interval ending exactly on a bucket boundary must not explode an
    # extra bucket (integer boundary arithmetic, not float epsilon)
    right = spark.createDataFrame([(1, 0.0, 100.0)], "iid int, s double, e double")
    left = spark.createDataFrame([(1, 100.0)], "pid int, p double")
    out = temporal.bucketed_range_join(
        left, right, F.col("p"), F.col("s"), F.col("e"), bucket_width=50
    )
    assert out.count() == 0  # p=100 not in [0,100)


def test_conversation_assembly_orders_and_filters(spark):
    """Trajectory assembly: in-session order is (ts, event_id), short
    sessions are dropped, gap splits episodes."""
    import datetime as dt

    from tajo_spark.operators.sessionize import conversation_assembly

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1, episode A: 3 turns in-gap; then a 40-min gap; then 2
        # turns (dropped: < 3)
        (0, t0, 1, "view"),
        (1, t0 + m, 1, "click"),
        (2, t0 + 2 * m, 1, "purchase"),
        (3, t0 + 50 * m, 1, "view"),
        (4, t0 + 51 * m, 1, "error"),
        # user 2: same-timestamp tie broken by event_id
        (10, t0, 2, "a"),
        (11, t0, 2, "b"),
        (12, t0 + m, 2, "c"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r.user_id, r.session_id): r
        for r in conversation_assembly(events).collect()
    }
    assert out[(1, 1)].transcript == "view -> click -> purchase"
    assert (1, 2) not in out          # 2-turn episode dropped
    assert out[(2, 1)].transcript == "a -> b -> c"
    assert out[(2, 1)].n_turns == 3
