"""DDL lifecycle through the Engine (DDLExecutor.java /
CreateTableExecutor.java parity — SURVEY.md §2.11): CREATE TABLE /
CTAS / INSERT [OVERWRITE] / TRUNCATE / ALTER / DROP, database
namespaces, and partitioned CTAS with pruning."""

from __future__ import annotations

import pytest

from tajo_spark.engine import Engine
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def engine(spark):
    e = Engine(spark)
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl_t")
    yield e
    spark.sql("DROP DATABASE IF EXISTS ddl_t CASCADE")


def test_create_insert_select_drop(engine):
    engine.execute_sql(
        "CREATE TABLE ddl_t.kv (k INT4, v TEXT) USING PARQUET"
    )
    engine.execute_sql("INSERT INTO ddl_t.kv VALUES (1, 'a'), (2, 'b')")
    rows = engine.execute_sql(
        "SELECT k, v FROM ddl_t.kv ORDER BY k"
    ).collect()
    assert [(r.k, r.v) for r in rows] == [(1, "a"), (2, "b")]
    # INSERT OVERWRITE INTO (Tajo spelling) → full replace
    engine.execute_sql("INSERT OVERWRITE INTO ddl_t.kv VALUES (9, 'z')")
    rows = engine.execute_sql("SELECT k, v FROM ddl_t.kv").collect()
    assert [(r.k, r.v) for r in rows] == [(9, "z")]
    engine.execute_sql("DROP TABLE ddl_t.kv")
    assert "kv" not in [
        t.name for t in engine.spark.catalog.listTables("ddl_t")
    ]


def test_ctas(engine, spark):
    from tajo_spark.catalog import register_tables

    register_tables(spark, SF_DIR, ("nation",))
    engine.execute_sql(
        "CREATE TABLE ddl_t.nation_copy USING PARQUET "
        "AS SELECT n_nationkey, n_name FROM nation"
    )
    n = engine.execute_sql(
        "SELECT count(*) AS n FROM ddl_t.nation_copy"
    ).collect()[0].n
    assert n == spark.table("nation").count()
    engine.execute_sql("DROP TABLE ddl_t.nation_copy")


def test_truncate(engine):
    engine.execute_sql("CREATE TABLE ddl_t.tr (x INT4) USING PARQUET")
    engine.execute_sql("INSERT INTO ddl_t.tr VALUES (1), (2)")
    engine.execute_sql("TRUNCATE TABLE ddl_t.tr")
    assert engine.execute_sql("SELECT * FROM ddl_t.tr").count() == 0
    engine.execute_sql("DROP TABLE ddl_t.tr")


def test_alter_table(engine):
    # AlterTableNode parity: add column, rename column, set property
    engine.execute_sql("CREATE TABLE ddl_t.al (a INT4) USING PARQUET")
    engine.execute_sql("ALTER TABLE ddl_t.al ADD COLUMNS (b TEXT)")
    cols = [f.name for f in engine.spark.table("ddl_t.al").schema.fields]
    assert cols == ["a", "b"]
    engine.execute_sql(
        "ALTER TABLE ddl_t.al SET TBLPROPERTIES ('note'='x')"
    )
    engine.execute_sql("DROP TABLE ddl_t.al")


def test_partitioned_ctas_prunes(engine, spark):
    from tajo_spark.catalog import register_tables
    from tests.test_plans import plan_of

    register_tables(spark, SF_DIR, ("orders",))
    engine.execute_sql(
        "CREATE TABLE ddl_t.opart USING PARQUET "
        "PARTITIONED BY (o_orderstatus) "
        "AS SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders"
    )
    df = engine.execute_sql(
        "SELECT o_orderkey FROM ddl_t.opart WHERE o_orderstatus = 'F'"
    )
    plan = plan_of(df)
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    engine.execute_sql("DROP TABLE ddl_t.opart")


def test_analyze_table_stats_feed_cbo(engine, spark):
    # TableStatUpdateRewriter.java:39 / ANALYZE parity: stats recorded in
    # the catalog and visible to the cost-based optimizer
    engine.execute_sql(
        "CREATE TABLE ddl_t.st (x INT4, y TEXT) USING PARQUET"
    )
    engine.execute_sql(
        "INSERT INTO ddl_t.st VALUES (1,'a'), (2,'b'), (3,'c')"
    )
    engine.execute_sql(
        "ANALYZE TABLE ddl_t.st COMPUTE STATISTICS FOR ALL COLUMNS"
    )
    desc = {
        r.col_name: r.data_type
        for r in spark.sql("DESCRIBE TABLE EXTENDED ddl_t.st").collect()
    }
    assert "Statistics" in desc and "bytes" in desc["Statistics"]
    # column-level stats present (CBO inputs)
    xstats = spark.sql(
        "DESCRIBE EXTENDED ddl_t.st x"
    ).collect()
    info = {r.info_name: r.info_value for r in xstats}
    assert info.get("distinct_count") == "3"
    engine.execute_sql("DROP TABLE ddl_t.st")


def test_create_index_clusters_layout_and_prunes(engine, spark, tmp_path):
    # StoreIndexExec.java:39 / BSTIndexScanExec.java:46 parity: CREATE
    # INDEX re-clusters storage on the key so every parquet file covers
    # a tight disjoint key range and selective key predicates skip the
    # rest via pushed min/max filters — the Spark-first replacement for
    # the reference's BST side file (COVERAGE.md).
    import glob

    import pyarrow.parquet as pq

    path = str(tmp_path / "idx_t")
    # write deliberately shuffled data so pre-index files have
    # overlapping key ranges
    spark.range(0, 10000).selectExpr(
        "cast(pmod(id * 7919, 10000) as long) AS k", "id AS v"
    ).repartition(8).write.parquet(path)
    engine.create_external_table("idx_t", path, "PARQUET")
    before = sorted(tuple(r) for r in spark.table("idx_t").collect())

    engine.execute_sql("CREATE INDEX k_idx ON idx_t (k ASC)")
    assert "k_idx" in engine.indexes
    assert engine.indexes["k_idx"].table == "idx_t"

    after = sorted(tuple(r) for r in spark.table("idx_t").collect())
    assert after == before  # a layout rewrite, never a data change

    # file-level key ranges are disjoint after clustering
    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) > 1
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo  # disjoint (boundary value may touch)

    # the key predicate reaches the scan as a pushed filter
    df = spark.table("idx_t").filter("k = 4242")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(k,4242)" in plan
    assert [r.v for r in df.collect()] == [
        v for v in range(10000) if (v * 7919) % 10000 == 4242
    ]

    engine.execute_sql("DROP INDEX k_idx")
    assert "k_idx" not in engine.indexes
    engine.drop_table("idx_t")


def test_create_index_rejects_bad_targets(engine, spark):
    spark.range(0, 5).selectExpr("id AS a").createOrReplaceTempView(
        "idx_loose"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no tracked storage"):
        engine.execute_sql("CREATE INDEX i1 ON idx_loose (a)")
    with _pytest.raises(Exception):
        engine.execute_sql("CREATE INDEX i2 ON idx_loose ()")


def test_create_index_on_managed_table(engine, spark):
    engine.execute_sql(
        "CREATE TABLE ddl_t.mi (k INT4, v TEXT) USING PARQUET"
    )
    engine.execute_sql(
        "INSERT INTO ddl_t.mi VALUES (3,'c'), (1,'a'), (2,'b')"
    )
    engine.execute_sql("CREATE INDEX mi_idx ON ddl_t.mi (k)")
    rows = sorted(
        tuple(r) for r in spark.table("ddl_t.mi").collect()
    )
    assert rows == [(1, "a"), (2, "b"), (3, "c")]
    engine.execute_sql("DROP INDEX mi_idx")
    engine.execute_sql("DROP TABLE ddl_t.mi")


def test_create_table_like(engine, spark):
    """CREATE TABLE ... LIKE copies the schema without data
    (TestCreateTable.java:472 testCreateTableLike1 parity)."""
    engine.execute_sql("CREATE TABLE ddl_t.like_base (a INT4, b TEXT)")
    engine.execute_sql(
        "INSERT INTO ddl_t.like_base VALUES (1, 'x')"
    )
    engine.execute_sql("CREATE TABLE ddl_t.like_copy LIKE ddl_t.like_base")
    copy = spark.table("ddl_t.like_copy")
    assert copy.schema.simpleString() == "struct<a:int,b:string>"
    assert copy.count() == 0  # schema only, never data
    engine.execute_sql("DROP TABLE ddl_t.like_copy")
    engine.execute_sql("DROP TABLE ddl_t.like_base")


def test_alter_table_partition_mutation_and_repair(engine, spark, tmp_path):
    # AlterTableNode ADD/DROP PARTITION + repair partition parity
    # (SURVEY §2.11; reference executes these in DDLExecutor). Spark SQL
    # supports the same forms natively on a catalog-partitioned table.
    engine.execute_sql("DROP TABLE IF EXISTS ddl_t.pm")
    # Tajo spelling: partition columns are declared OUTSIDE the column
    # list (PARTITION BY COLUMN, SQLParser.g4 create-table rules); the
    # dialect folds them into the Spark schema + PARTITIONED BY names
    engine.execute_sql(
        "CREATE TABLE ddl_t.pm (k INT4) USING PARQUET "
        "PARTITION BY COLUMN (status TEXT)"
    )
    engine.execute_sql("INSERT INTO ddl_t.pm VALUES (1, 'A'), (2, 'B')")

    # ADD PARTITION: registers an (empty) partition in the catalog
    engine.execute_sql("ALTER TABLE ddl_t.pm ADD PARTITION (status='X')")
    parts = [
        r.partition for r in spark.sql("SHOW PARTITIONS ddl_t.pm").collect()
    ]
    assert "status=X" in parts

    # repair partition: drop files in by hand, then MSCK REPAIR picks
    # the directory up (the reference's "repair partition" form)
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED ddl_t.pm")
        .filter("col_name = 'Location'")
        .collect()[0]
        .data_type
    )
    spark.createDataFrame([(9,)], "k INT").write.mode("overwrite").parquet(
        loc + "/status=Z"
    )
    engine.execute_sql("MSCK REPAIR TABLE ddl_t.pm")
    parts = [
        r.partition for r in spark.sql("SHOW PARTITIONS ddl_t.pm").collect()
    ]
    assert "status=Z" in parts
    got = engine.execute_sql(
        "SELECT k FROM ddl_t.pm WHERE status = 'Z'"
    ).collect()
    assert [r.k for r in got] == [9]

    # DROP PARTITION: data no longer visible through the table
    engine.execute_sql("ALTER TABLE ddl_t.pm DROP PARTITION (status='B')")
    rows = engine.execute_sql(
        "SELECT k, status FROM ddl_t.pm ORDER BY k"
    ).collect()
    assert [(r.k, r.status) for r in rows] == [(1, "A"), (9, "Z")]
    engine.execute_sql("DROP TABLE ddl_t.pm")


def test_analyze_table_feeds_cbo_statistics(engine, spark):
    """TableStats parity (TableStats.java): ANALYZE TABLE populates
    catalog numRows/sizeInBytes, and the optimizer's relation stats
    switch from size-only guesses to exact row counts — the input the
    enabled CBO join-reorder consumes."""
    from tajo_spark.queries.sources_q import _fresh_managed_table

    _fresh_managed_table(spark, "stats_probe_t")
    spark.range(1234).selectExpr(
        "id AS k", "CAST(id % 7 AS STRING) AS v"
    ).write.saveAsTable("stats_probe_t")
    before = engine.table_stats("stats_probe_t")
    engine.analyze_table("stats_probe_t", columns=["k"])
    after = engine.table_stats("stats_probe_t")
    assert after["num_rows"] == 1234
    assert after["size_bytes"] and after["size_bytes"] > 0
    assert before["num_rows"] is None  # fresh table: no stats yet
    # the optimizer must see the exact rowCount on the relation
    plan_stats = (
        spark.table("stats_probe_t")
        ._jdf.queryExecution()
        .optimizedPlan()
        .stats()
        .toString()
    )
    # rowCount appears on the relation only when ANALYZE ran (it
    # renders scientific, e.g. 1.23E+3, so match presence not digits)
    assert "rowCount" in plan_stats, plan_stats
    spark.sql("DROP TABLE IF EXISTS stats_probe_t")


def test_analyze_table_rejects_temp_views(engine, spark, tmp_path):
    """ANALYZE on an Engine-registered external table (a temp view)
    must fail with guidance, not a raw AnalysisException."""
    import pytest as _pytest

    p = str(tmp_path / "ext")
    spark.range(5).write.parquet(p)
    engine.create_external_table("ext_stats_t", p, "parquet")
    with _pytest.raises(NotImplementedError, match="catalog table"):
        engine.analyze_table("ext_stats_t")
    engine.drop_table("ext_stats_t")


def test_ctas_declared_schema_domain_check(engine, spark):
    """LogicalPlanVerifier.ensureDomains parity: a CTAS column list
    retypes positionally, but only along Tajo-castable pairs
    (CatalogUtil.OPERATION_CASTING_MAP) — TEXT into INT8 is rejected
    (golden: TestCreateTable/negative/type_mismatch.sql), INT into
    TEXT/INT8 widening is allowed."""
    from tajo_spark.plans.dialect import CtasDataTypeMismatch

    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    ).createOrReplaceTempView("dom_src")
    with pytest.raises(CtasDataTypeMismatch, match="not compatible"):
        engine.execute_sql(
            "CREATE TABLE dom_bad (k TEXT, v INT8) AS SELECT * FROM dom_src"
        )
    engine.execute_sql("DROP TABLE IF EXISTS dom_ok")
    engine.execute_sql(
        "CREATE TABLE dom_ok (kk INT8, vv TEXT) AS SELECT * FROM dom_src"
    )
    got = spark.table("dom_ok")
    assert [f.dataType.simpleString() for f in got.schema] == [
        "bigint", "string",
    ]
    assert got.count() == 2
    engine.execute_sql("DROP TABLE dom_ok")
