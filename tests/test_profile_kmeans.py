"""Unit tests for the round-5 additions: profile_columns (one-pass
column profiler), kmeans_lloyd (SQL-reproducible distributed Lloyd),
and bigram_logprob (add-k bigram LM scoring).  Their driver-facing
hash parity is covered by test_oracle_parity; these pin the operator
semantics and the plan shapes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tajo_spark.operators.profile import profile_columns
from tajo_spark.operators.similarity import kmeans_lloyd
from tajo_spark.operators.text import bigram_logprob
from tests.conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_profile_columns_nulls_and_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 2.5), (None, "bb", 1.5), (4, "a", None)],
        "id BIGINT, s STRING, x DOUBLE",
    )
    prof = {
        r.col_name: r
        for r in profile_columns(df, exact_distinct=True).collect()
    }
    assert prof["id"].n_nulls == 1 and prof["id"].n_distinct == 3
    assert prof["id"].min_s == "1" and prof["id"].max_s == "4"
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert prof["x"].n_nulls == 2 and prof["x"].min_s == "1.5"
    # avg_len ignores nulls: s lengths are 1,2,1 -> 1.33
    assert abs(prof["s"].avg_len - 1.33) < 1e-9


def test_profile_columns_numeric_min_is_native_not_lexicographic(spark):
    # lexicographic min of {9, 10} is "10"; native numeric min is 9
    df = spark.createDataFrame([(9,), (10,)], "n BIGINT")
    row = profile_columns(df, exact_distinct=True).collect()[0]
    assert row.min_s == "9" and row.max_s == "10"


def test_profile_columns_single_aggregate_plan(spark):
    """The approx (production) profile is ONE aggregate over one scan:
    no join, no Expand (that's the exact-distinct cost), no extra
    shuffle beyond the global agg's exchange."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        profile_columns(docs)  # approx_count_distinct default
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Expand" not in plan


def test_profile_columns_survives_hostile_column_names(spark):
    """Names with dots, spaces, and a name crafted to collide with a
    naive ``{name}__suffix`` aliasing scheme must profile correctly
    (df[c] index access + positional internal aliases)."""
    df = spark.createDataFrame(
        [(1, 2, 3), (None, 5, 6)],
        ["a.b", "a b", "x__nulls"],
    )
    prof = {r.col_name: r for r in profile_columns(df).collect()}
    assert set(prof) == {"a.b", "a b", "x__nulls"}
    assert prof["a.b"].n_nulls == 1
    assert prof["a b"].n_nulls == 0 and prof["a b"].min_s == "2"
    assert prof["x__nulls"].n_nulls == 0 and prof["x__nulls"].max_s == "6"


def test_kmeans_lloyd_truncates_lineage_per_iteration(spark):
    """Each Lloyd pass localCheckpoints the k-row centroid frame, so
    the final centroids' plan is a materialized scan (O(1) depth), not
    a replay of the whole trajectory — without this every downstream
    action re-scans the corpus n_iter+1 times."""
    emb = _emb(spark)
    _, cent = kmeans_lloyd(emb, k=4, n_iter=2)
    plan = cent._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert "Exchange" not in plan  # nothing left to compute


def test_kmeans_lloyd_assigns_every_vector_exactly_once(spark):
    emb = _emb(spark)
    assigned, cent = kmeans_lloyd(emb, k=8, n_iter=2)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert cent.count() <= 8


def test_kmeans_lloyd_inertia_monotone_nonincreasing(spark):
    """Lloyd's invariant: total squared distance never increases with
    more iterations (assignment and update steps each minimize it)."""
    emb = _emb(spark)
    inertias = []
    for t in (1, 2, 4):
        assigned, _ = kmeans_lloyd(emb, k=8, n_iter=t)
        inertias.append(
            assigned.agg(F.sum("sq_dist").alias("i")).collect()[0].i
        )
    assert inertias[0] >= inertias[1] - 1e-9
    assert inertias[1] >= inertias[2] - 1e-9


def test_kmeans_lloyd_recovers_separated_clusters(spark):
    rows = [(i, [10.0, 10.0] if i % 2 else [-10.0, -10.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    assigned, cent = kmeans_lloyd(df, k=2, n_iter=3)
    sizes = sorted(
        r.n for r in assigned.groupBy("cid").agg(F.count("*").alias("n")).collect()
    )
    assert sizes == [20, 20]
    # converged centroids sit on the two modes
    cs = sorted(r.c[0] for r in cent.collect())
    assert abs(cs[0] + 10.0) < 1e-9 and abs(cs[1] - 10.0) < 1e-9


def test_kmeans_lloyd_assignment_plan_broadcasts_centroids(spark):
    emb = _emb(spark)
    assigned, _ = kmeans_lloyd(emb, k=4, n_iter=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_logprob_hand_computed(spark):
    # corpus: "a b a b" and "a b"; bigrams: d1 {a b:2, b a:1}, d2 {a b:1}
    # joint: (a b)=3, (b a)=1; ctx: a->3, b->1; V=2; k=0.5
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id BIGINT, text STRING"
    )
    out = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    p_ab = (3 + 0.5) / (3 + 0.5 * 2)
    p_ba = (1 + 0.5) / (1 + 0.5 * 2)
    d1 = (2 * math.log(p_ab) + 1 * math.log(p_ba)) / 3
    assert out[1].n_bigrams == 3
    assert abs(out[1].avg_logp2 - round(d1, 3)) < 1e-9
    assert out[2].n_bigrams == 1
    assert abs(out[2].avg_logp2 - round(math.log(p_ab), 3)) < 1e-9


def test_bigram_logprob_short_docs_absent(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two words")],
        "doc_id BIGINT, text STRING",
    )
    ids = {r.doc_id for r in bigram_logprob(docs).collect()}
    assert ids == {3}
