"""Pipeline attrition ledger (operators/attrition.py) — first-match
stage charging, drop-set arm, fraction discipline, and the single-scan
plan pin for the registry composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from tajo_spark.operators.attrition import first_drop_attrition
from tests.conftest import SF_DIR


def _ledger(df):
    return {r.stage: (r.stage_pos, r.n_docs, r.n_tokens) for r in df.collect()}


def test_first_match_semantics_and_fractions(spark):
    rows = [
        (1, "a b"),          # short AND will be dup'd below — rule order decides
        (2, "a b"),          # exact dup of 1 → exact_dup (dup checked first here)
        (3, None),           # null
        (4, "x " * 60),      # 60 words, no stopwords → fails stopword stage
        (5, "ok " * 60),     # same shape
    ]
    docs = spark.createDataFrame(rows, "doc_id INT, text STRING")
    dup = (
        docs.alias("a")
        .join(docs.alias("b"), F.expr("a.text = b.text AND a.doc_id > b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id"))
    )
    toks = F.when(
        F.col("text").isNull(), F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    base = docs.withColumn("n_toks", toks)
    out = first_drop_attrition(
        base,
        [
            ("null_text", F.col("text").isNull()),
            ("exact_dup", dup),                      # DataFrame arm
            ("too_short", F.col("n_toks") < 50),
            ("no_stop", ~F.col("text").contains("the")),
        ],
        token_col="n_toks",
    )
    led = _ledger(out)
    assert led["null_text"] == (0, 1, 0)
    assert led["exact_dup"] == (1, 1, 2)   # doc 2: dup wins over too_short
    assert led["too_short"] == (2, 1, 2)   # doc 1: not a dup (min id kept)
    assert led["no_stop"][1] == 2          # docs 4 and 5
    assert "kept" not in led               # nothing survives this gauntlet
    # fractions of the INPUT corpus sum to 1
    fr = [r.frac_docs for r in out.collect()]
    assert abs(sum(fr) - 1.0) < 1e-9


def test_kept_row_and_docs_only_mode(spark):
    docs = spark.createDataFrame(
        [(1, "the fine doc"), (2, "zz")], "doc_id INT, text STRING"
    )
    out = first_drop_attrition(
        docs, [("tiny", F.length("text") < 5)]
    )
    led = {r.stage: r.n_docs for r in out.collect()}
    assert led == {"tiny": 1, "kept": 1}
    assert "n_tokens" not in out.columns and "frac_tokens" not in out.columns
    kept = [r for r in out.collect() if r.stage == "kept"][0]
    assert kept.stage_pos == 1  # terminal position = len(stages)


def test_registry_attrition_is_single_scan(spark):
    from tajo_spark.queries.registry import all_queries

    df = all_queries()["pipeline_attrition_report"].spark(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the AQE dump repeats the tree under '== Initial Plan =='
    plan = plan.split("== Initial Plan ==")[0]
    # ONE corpus scan: rules inline on the scan, dedup marker is a
    # window over md5 on the same scan (the join-composed first cut
    # read the corpus 4x)
    assert plan.count("Scan parquet") == 1, plan
    assert "SortMergeJoin" not in plan
    # ledger is ordered by pipeline position with kept last
    poss = [r.stage_pos for r in df.collect()]
    assert poss == sorted(poss)


def test_duplicate_and_dotted_stage_names(spark):
    import pytest as _pt

    docs = spark.createDataFrame([(1, "x")], "doc_id INT, text STRING")
    with _pt.raises(ValueError, match="duplicate stage names"):
        first_drop_attrition(
            docs,
            [("dup", F.lit(False)), ("dup", F.lit(True))],
        )
    # dotted names are labels, not column paths (positional markers)
    out = first_drop_attrition(
        docs, [("gopher.alpha", F.lit(True))]
    )
    assert [r.stage for r in out.collect()] == ["gopher.alpha"]
