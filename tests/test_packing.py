"""Sequence-packing invariants (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tajo_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, 50 + (i * 37) % 400) for i in range(200)],
        "doc_id BIGINT, n_tokens BIGINT",
    )


def test_every_doc_packed_exactly_once(spark, docs):
    out = pack_sequences(docs, max_tokens=512, num_partitions=8)
    assert out.count() == 200
    assert out.select("doc_id").distinct().count() == 200


def test_pack_budget_respected(spark, docs):
    out = pack_sequences(docs, max_tokens=512, num_partitions=8)
    sums = (
        out.filter(~F.col("oversize"))
        .groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    assert sums and all(r.t <= 512 for r in sums)


def test_oversize_docs_become_flagged_singletons(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 9000), (3, 120)], "doc_id BIGINT, n_tokens BIGINT"
    )
    out = pack_sequences(df, max_tokens=512, num_partitions=1).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].oversize and by_id[2].pack_pos == 0
    # nothing shares the oversize pack
    assert sum(1 for r in out if r.pack_id == by_id[2].pack_id) == 1
    assert not by_id[1].oversize and not by_id[3].oversize


def test_packing_is_deterministic(spark, docs):
    a = sorted(
        (r.doc_id, r.pack_id, r.pack_pos)
        for r in pack_sequences(docs, 512, num_partitions=8).collect()
    )
    b = sorted(
        (r.doc_id, r.pack_id, r.pack_pos)
        for r in pack_sequences(docs, 512, num_partitions=8).collect()
    )
    assert a == b


def test_positions_are_contiguous_within_pack(spark, docs):
    out = pack_sequences(docs, 512, num_partitions=4)
    rows = out.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("pack_pos").alias("mx"),
        F.min("pack_pos").alias("mn"),
    ).collect()
    for r in rows:
        assert (r.mn, r.mx) == (0, r.n - 1)


def test_rejects_nonpositive_budget(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
