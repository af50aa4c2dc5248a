"""Tablespace registry (TablespaceManager.java parity): URI-scheme
routing, the HBase extension-point contract, and third-party
registration (tajo-tablespace-example analogue)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tajo_spark.catalog import load_table
from tajo_spark.sources import tablespace as ts
from tests.conftest import SF_DIR


def test_file_scheme_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_name"
    )
    uri = f"file://{tmp_path}/nation_space"
    ts.write_uri(nation, uri, format="parquet")
    back = ts.read_uri(spark, uri, format="parquet")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )
    # bare paths default to the local filesystem space
    assert ts.tablespace_for(str(tmp_path)).scheme == "file"


def test_unknown_scheme_names_the_extension_point():
    with pytest.raises(ValueError, match="register_tablespace"):
        ts.tablespace_for("quux://bucket/table")


def test_hbase_space_documents_contract(spark):
    space = ts.tablespace_for("hbase://zk/table1")
    with pytest.raises(NotImplementedError, match="row-key range"):
        space.reader(spark, "hbase://zk/table1", {})
    assert space.writer is None  # read surface only until jars exist


def test_third_party_tablespace_plugs_in(spark):
    # the tajo-tablespace-example story: a new backend registers through
    # the public API and the engine routes URIs to it with no code change
    def http_json_reader(spark, uri, options):
        # stand-in for an HTTP fetch: derive rows from the uri itself
        host = uri.split("://", 1)[1].split("/", 1)[0]
        return spark.createDataFrame([(host, 1)], "host STRING, hits INT")

    ts.register_tablespace(
        ts.Tablespace("exhttp", http_json_reader, None, "example space")
    )
    df = ts.read_uri(spark, "exhttp://api.example.com/feed")
    assert df.collect()[0].host == "api.example.com"
    with pytest.raises(NotImplementedError, match="read-only"):
        ts.write_uri(df, "exhttp://api.example.com/feed")
