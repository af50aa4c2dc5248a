"""Deterministic sampling operator tests (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tajo_spark.operators import sampling


def test_sample_stable_under_repartition(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r.k for r in sampling.deterministic_sample(df, "k", 0.2).collect()}
    b = {
        r.k
        for r in sampling.deterministic_sample(
            df.repartition(17, "k"), "k", 0.2
        ).collect()
    }
    assert a == b
    # within 3 percentage points of the target fraction
    assert abs(len(a) / 5000 - 0.2) < 0.03


def test_split_column_rejects_non_hex_bounds():
    import pytest

    # 'g0' sorts above 'ff', so if accepted it silently swallows every
    # row into that cut — the exact misconfiguration class the guard
    # exists to reject (r11 verdict: the class contained a stray 'g')
    for bad in ("g0", "gg", "CC", "c", "ccc"):
        with pytest.raises(ValueError, match="lowercase hex"):
            sampling.split_column(F.col("id"), cuts=(("train", bad),))
    # accepted boundary values still pass validation
    sampling.split_column(F.col("id"), cuts=(("train", "ff"),))
    sampling.split_column(F.col("id"), cuts=(("train", "00"),))


def test_split_column_partitions_everything(spark):
    df = spark.range(0, 4000).select(
        sampling.split_column(F.col("id")).alias("s")
    )
    counts = {r.s: r.n for r in df.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 4000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_sample_is_filter_only_plan(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "k")
    plan = (
        sampling.deterministic_sample(df, "k", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_sample_full_and_zero_fractions(spark):
    import pytest
    from tajo_spark.operators.sampling import sample_threshold_hex

    df = spark.range(0, 100).withColumnRenamed("id", "k")
    assert sampling.deterministic_sample(df, "k", 1.0).count() == 100
    assert sampling.deterministic_sample(df, "k", 0.0).count() == 0
    with pytest.raises(ValueError):
        sample_threshold_hex(1.0)


def test_stratified_topk_exact_k_per_group_and_deterministic(spark, ddb):
    from tajo_spark.queries.registry import all_queries
    import tests.conftest as C

    spec = all_queries()["sample_stratified_topk"]
    a = spec.spark(spark, C.SF_DIR).toPandas()
    b = spec.spark(spark, C.SF_DIR).toPandas()
    counts = a.groupby("lang").size()
    assert (counts == 20).all()
    assert sorted(map(tuple, a.values.tolist())) == sorted(
        map(tuple, b.values.tolist())
    )
    opdf = ddb.execute(spec.oracle).fetchdf()
    C.assert_frames_match(a, opdf, "sample_stratified_topk")


def test_global_shuffle_is_exact_permutation(spark):
    from pyspark.sql import Window as W

    df = spark.range(0, 3000).withColumnRenamed("id", "k")
    out = sampling.global_shuffle_position(df, "k", seed=7)
    rows = out.select("k", "shuffle_pos").collect()
    # positions are exactly 1..N (a permutation, no gaps/dupes)
    assert sorted(r.shuffle_pos for r in rows) == list(range(1, 3001))
    # two-phase rank equals the naive single-window global rank
    key = F.md5(
        F.concat(F.lit("7:"), F.col("k").cast("string")).cast("binary")
    )
    naive = {
        r.k: r.p
        for r in df.select(
            "k", F.row_number().over(W.orderBy(key, "k")).alias("p")
        ).collect()
    }
    assert {r.k: r.shuffle_pos for r in rows} == naive


def test_global_shuffle_keeps_null_id_rows_last(spark):
    # regression: NULL ids hash to a NULL key; before the sentinel
    # bucket the null-unsafe __bk join dropped those rows while their
    # count still shifted the cumulative offsets (3 in → 2 out with a
    # gap in positions). The oracle's row_number keeps them, NULLS LAST.
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], ["k"]
    )
    rows = sampling.global_shuffle_position(df, "k").collect()
    assert len(rows) == 4
    assert sorted(r.shuffle_pos for r in rows) == [1, 2, 3, 4]
    # the NULL-key rows take the LAST positions, matching ASC NULLS LAST
    null_pos = sorted(r.shuffle_pos for r in rows if r.k is None)
    assert null_pos == [3, 4]


def test_global_shuffle_stable_under_repartition(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k: r.shuffle_pos
         for r in sampling.global_shuffle_position(df, "k").collect()}
    b = {r.k: r.shuffle_pos
         for r in sampling.global_shuffle_position(
             df.repartition(13, "k"), "k").collect()}
    assert a == b


def test_global_shuffle_windows_are_bucket_partitioned(spark):
    # the data-sized window must be PARTITIONED by the hash-prefix
    # bucket; a regression to a naive global rank would show a window
    # spec that orders by the hash key __sk with no partition column
    # in front of it (single-partition bottleneck at scale).
    import re

    df = spark.range(0, 100).withColumnRenamed("id", "k")
    plan = (
        sampling.global_shuffle_position(df, "k")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "windowspecdefinition" in plan
    assert not re.search(r"windowspecdefinition\(__sk#\d+ ASC", plan)
    # the in-bucket rank window partitions on __bk then orders on __sk
    assert re.search(r"windowspecdefinition\(__bk#\d+, __sk#\d+ ASC", plan)


def test_temperature_mixture_keeps_rarest_fully(spark):
    # 900 'web' rows vs 100 'book' rows; T=2 must keep every book row
    # (rarest stratum rate == 1.0) and downsample web below 1.0
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 900, "web").otherwise("book").alias("src"),
    )
    out = sampling.temperature_mixture_sample(df, "k", "src", 2.0)
    rows = out.collect()
    by = {}
    for r in rows:
        by.setdefault(r.src, []).append(r)
    assert len(by["book"]) == 100  # kept in full
    # expected web rate: boost = share^(1/2-1) = share^-0.5;
    # rate_web = (0.9^-0.5)/(0.1^-0.5) = sqrt(0.1/0.9) ≈ 0.3333
    assert 0.25 * 900 < len(by["web"]) < 0.42 * 900
    assert abs(by["web"][0].keep_rate - 0.333333) < 1e-6
    # deterministic: identical membership under repartitioning
    again = sampling.temperature_mixture_sample(
        df.repartition(13, "k"), "k", "src", 2.0
    )
    assert {r.k for r in rows} == {r.k for r in again.collect()}


def test_temperature_mixture_plan_broadcasts_rates(spark):
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("src")
    )
    out = sampling.temperature_mixture_sample(df, "k", "src", 2.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the per-stratum rate table must join back as a broadcast, never a
    # full shuffle of the corpus side
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("SortMergeJoin") == 0


def test_temperature_one_is_natural_proportions(spark):
    # T=1 → boost = share^0 = 1 for every stratum → keep_rate 1.0 → no-op
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("src")
    )
    out = sampling.temperature_mixture_sample(df, "k", "src", 1.0)
    assert out.count() == 300


def test_cap_per_group_two_stage_matches_single_window(spark):
    # skew-shaped input: one hot group, ties in the primary sort key
    rows = [(i, "hot" if i % 10 != 0 else f"g{i % 7}", i % 13)
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id LONG, grp STRING, score INT") \
              .repartition(16)
    order = [F.desc("score"), F.asc("id")]
    fast = sampling.cap_per_group(df, ["grp"], order, k=25)
    plain = sampling.cap_per_group(df, ["grp"], order, k=25,
                                   two_stage=False)
    assert sorted((r.grp, r.id) for r in fast.collect()) == \
           sorted((r.grp, r.id) for r in plain.collect())
    # the cap binds on the hot group
    per = {r.grp: r.n for r in
           fast.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert per["hot"] == 25 and all(v <= 25 for v in per.values())


def test_cap_per_group_two_stage_plan_has_prestage_window(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", i) for i in range(100)],
        "id LONG, grp STRING, score INT")
    capped = sampling.cap_per_group(
        df, ["grp"], [F.desc("score"), F.asc("id")], k=5)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    # two Window operators: the salted partial pass + the exact final
    assert plan.count("Window") >= 2, plan


def test_mixture_token_plan_caps_epochs_and_reports_deficit(spark):
    """The data-constrained cap: a language whose target exceeds
    4 epochs of its supply realizes exactly 4x available and reports
    the rest as deficit; an amply-supplied language repeats <1 epoch
    with zero deficit; unbudgeted languages get share 0."""
    from pyspark.sql import Row

    from tajo_spark.operators import sampling

    rows = (
        # 'big': 1000 tokens available
        [Row(doc_id=i, lang="big", text=" ".join(["w"] * 100)) for i in range(10)]
        # 'scarce': 40 tokens available
        + [Row(doc_id=100 + i, lang="scarce", text=" ".join(["w"] * 10)) for i in range(4)]
        # 'extra': present but unbudgeted
        + [Row(doc_id=200, lang="extra", text="a b c")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    plan = {
        r.lang: r
        for r in sampling.mixture_token_plan(
            docs, {"big": 0.5, "scarce": 0.5}, token_budget=1000
        ).collect()
    }
    big, scarce, extra = plan["big"], plan["scarce"], plan["extra"]
    assert big.available_tokens == 1000 and big.target_tokens == 500
    assert big.epochs == 0.5 and big.realized_tokens == 500 and big.deficit == 0
    assert scarce.available_tokens == 40 and scarce.target_tokens == 500
    assert scarce.epochs == 4.0          # capped, not 12.5
    assert scarce.realized_tokens == 160  # 4 x 40
    assert scarce.deficit == 340
    assert extra.target_tokens == 0 and extra.realized_tokens == 0
    assert extra.available_tokens == 3


def test_materialize_epochs_repeats_and_downsamples(spark):
    """Epoch materialization: 2.5 epochs -> every doc twice plus ~half
    a third time; 0.5 epochs -> ~half the docs once; per-doc copy count
    is exactly floor+coin and deterministic across runs."""
    from pyspark.sql import Row

    from tajo_spark.operators import sampling

    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="rep" if i < 400 else "down", text="x")
         for i in range(800)],
        "doc_id long, lang string, text string",
    )
    plan = spark.createDataFrame(
        [("rep", 2.5), ("down", 0.5)], "lang string, epochs double"
    )
    out = sampling.materialize_epochs(docs, plan).toPandas()
    rep = out[out.lang == "rep"].groupby("doc_id").size()
    down = out[out.lang == "down"].groupby("doc_id").size()
    assert set(rep.unique()) == {2, 3}          # floor 2 + coin
    assert len(rep) == 400                      # every rep doc present
    assert set(down.unique()) == {1}            # 0 epochs floor + coin
    assert 120 <= len(down) <= 280              # ~half of 400, md5 coin
    # expected-volume contract: mean copies tracks epochs
    assert abs(rep.mean() - 2.5) < 0.15
    # epoch indices are 0..copies-1 per doc
    first = out[out.doc_id == out.doc_id.iloc[0]]
    assert sorted(first.epoch) == list(range(len(first)))
    # determinism
    again = sampling.materialize_epochs(docs, plan).toPandas()
    assert len(again) == len(out)


def test_mixture_token_plan_reports_absent_budgeted_language(spark):
    """A language with a budget share but NO corpus docs must still get
    a row (available 0, epochs 0, full deficit) — silently dropping it
    would hide exactly the signal deficit exists to surface."""
    from pyspark.sql import Row

    from tajo_spark.operators import sampling

    docs = spark.createDataFrame(
        [Row(doc_id=0, lang="en", text="a b c d")],
        "doc_id long, lang string, text string",
    )
    plan = {
        r.lang: r
        for r in sampling.mixture_token_plan(
            docs, {"en": 0.5, "ja": 0.5}, token_budget=100
        ).collect()
    }
    ja = plan["ja"]
    assert ja.available_tokens == 0 and ja.target_tokens == 50
    assert ja.epochs == 0.0 and ja.realized_tokens == 0 and ja.deficit == 50


def test_weighted_reservoir_basic_contract(spark):
    from tajo_spark.operators.sampling import weighted_reservoir_sample

    df = spark.createDataFrame(
        [(i, 10.0 if i < 5 else 0.1) for i in range(20)]
        + [(100, 0.0), (101, None), (102, -3.0)],
        "doc_id LONG, w DOUBLE",
    )
    out = weighted_reservoir_sample(df, k=8, weight_col="w").collect()
    assert len(out) == 8
    ids = {r.doc_id for r in out}
    assert not ids & {100, 101, 102}  # non-positive / NULL weights excluded
    # k >= population returns every eligible row
    full = weighted_reservoir_sample(df, k=100, weight_col="w").collect()
    assert len(full) == 20


def test_weighted_reservoir_prefers_heavy_rows(spark):
    """Inclusion probability rises with weight: across many seeds, the
    10x-weighted half must be sampled far more often (Efraimidis-
    Spirakis correctness, not argmax — some light rows still appear)."""
    from tajo_spark.operators.sampling import weighted_reservoir_sample

    df = spark.createDataFrame(
        [(i, 10.0 if i < 25 else 1.0) for i in range(50)],
        "doc_id LONG, w DOUBLE",
    )
    heavy = light = 0
    for seed in range(12):
        for r in weighted_reservoir_sample(
            df, k=10, weight_col="w", seed=seed
        ).collect():
            if r.doc_id < 25:
                heavy += 1
            else:
                light += 1
    assert heavy > light * 2
    assert light > 0  # it is a sample, not a top-k


def test_weighted_reservoir_deterministic_and_topk_plan(spark):
    from tajo_spark.operators.sampling import weighted_reservoir_sample

    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(200)], "doc_id LONG, w DOUBLE"
    )
    a = weighted_reservoir_sample(df, k=20, weight_col="w").collect()
    b = weighted_reservoir_sample(df, k=20, weight_col="w").collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    plan = (
        weighted_reservoir_sample(df, k=20, weight_col="w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # per-partition top-k, no sort


def test_key_skew_report_hand_computed(spark):
    """4 keys with sizes 1,1,2,4 (n=8): top1 = 0.5, Gini from the
    sorted-rank identity = 2*(1*1+2*1+3*2+4*4)/(4*8) - 5/4 = 0.3125."""
    from tajo_spark.operators.skew import key_skew_report

    rows = [("a",)] * 4 + [("b",)] * 2 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k STRING")
    r = key_skew_report(df, "k").collect()[0]
    assert r.n_keys == 4 and r.n_rows == 8
    assert abs(r.top1_share - 0.5) < 1e-9
    assert abs(r.top10_share - 1.0) < 1e-9
    assert abs(r.gini - 0.3125) < 1e-9


def test_key_skew_report_uniform_gini_zero(spark):
    from tajo_spark.operators.skew import key_skew_report

    df = spark.createDataFrame(
        [(str(i % 5),) for i in range(50)], "k STRING"
    )
    r = key_skew_report(df, "k").collect()[0]
    assert r.gini == 0.0 and abs(r.top1_share - 0.2) < 1e-9


def test_weighted_reservoir_by_group_caps_and_determinism(spark):
    from tajo_spark.operators.sampling import weighted_reservoir_by

    rows = [(i, "g" + str(i % 3), float(1 + i % 5)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING, w DOUBLE")
    out = weighted_reservoir_by(
        df, k_per_group=7, weight_col="w", group_col="lang"
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r.doc_id)
    assert set(by_grp) == {"g0", "g1", "g2"}
    assert all(len(v) == 7 for v in by_grp.values())
    again = weighted_reservoir_by(
        df, k_per_group=7, weight_col="w", group_col="lang"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_key_skew_report_no_per_key_window(spark):
    """Billion-key plan pin (VERDICT r06 #6): the only window runs
    over the count-of-counts aggregate (x, c) — never over per-key
    rows, so key cardinality cannot serialize the plan through one
    partition. Every windowspecdefinition must reference only the
    size/count attributes, not the key."""
    from tajo_spark.operators.skew import key_skew_report

    df = spark.createDataFrame(
        [(f"u{i % 7}",) for i in range(100)], "user_key STRING"
    )
    plan = (
        key_skew_report(df, "user_key")
        ._jdf.queryExecution().executedPlan().toString()
    )
    win_lines = [
        line for line in plan.splitlines()
        if "windowspecdefinition" in line
    ]
    assert win_lines, "expected the (x, c) cumulative windows"
    for line in win_lines:
        assert "k#" not in line and "user_key" not in line, line


def test_key_skew_report_matches_bruteforce_ranks(spark):
    """The count-of-counts block identity equals the per-key
    sorted-rank Gini bit for bit across heavy tie patterns and a
    long-tail mix (the two shapes where a block decomposition could
    drift)."""
    import numpy as np

    from tajo_spark.operators.skew import key_skew_report

    rng = np.random.default_rng(7)
    cases = [
        [1] * 50,                                # all ties
        list(rng.integers(1, 6, 40)),            # small ties mix
        list(rng.zipf(1.7, 60) % 97 + 1),        # long tail
        [1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89],  # distinct sizes
    ]
    for sizes in cases:
        rows = [
            (f"key{j}",) for j, s in enumerate(sizes) for _ in range(int(s))
        ]
        df = spark.createDataFrame(rows, "k STRING")
        r = key_skew_report(df, "k", round_to=9).collect()[0]
        x = np.sort(np.array(sizes, dtype=np.int64))
        n, t = len(x), x.sum()
        i = np.arange(1, n + 1, dtype=np.int64)
        gini = 2.0 * float((i * x).sum()) / (n * t) - (n + 1.0) / n
        assert r.n_keys == n and r.n_rows == t
        assert abs(r.gini - round(gini, 9)) < 1e-12, sizes
        assert abs(r.top1_share - round(float(x[-1]) / t, 9)) < 1e-12
        assert abs(
            r.top10_share - round(float(x[-10:].sum()) / t, 9)
        ) < 1e-12
