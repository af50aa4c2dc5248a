"""Hive-serde formats (RCFILE/SEQUENCEFILE) + Hive UDF bridge.

These need ``enableHiveSupport()``, and a JVM hosts exactly one
SparkSession — the shared test session is in-memory-catalog — so the
whole surface runs in ONE subprocess with its own Hive session (same
pattern a second application would use; cost ≈ one extra session
startup for the entire file).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

from tajo_spark.functions.hive_bridge import jdk_available

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent(
    """
    import os, sys, tempfile
    from pyspark.sql import SparkSession, Row

    wh = tempfile.mkdtemp(prefix="tajo_hive_wh")
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.warehouse.dir", wh)
        .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={wh}")
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )
    from tajo_spark.sources import hive_formats as hf
    from tajo_spark.engine import Engine
    from tajo_spark.functions import hive_bridge as hb

    # --- RCFILE round-trip through the source API -----------------------
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=2, b="y"), Row(a=3, b=None)]
    )
    rc = os.path.join(wh, "rc_data")
    hf.write_rcfile(df, rc)
    back = hf.read_rcfile(spark, rc, "a INT, b STRING")
    rows = sorted((r.a, r.b) for r in back.collect())
    assert rows == [(1, "x"), (2, "y"), (3, None)], rows
    # files at the location are genuine RCFile containers
    datafiles = [f for f in os.listdir(rc) if not f.startswith((".", "_"))]
    assert datafiles, "no RCFile outputs written"
    with open(os.path.join(rc, datafiles[0]), "rb") as fh:
        assert fh.read(3) == b"RCF", "not an RCFile container"
    print("MARK rcfile_roundtrip_ok")

    # predicate/projection still work through the serde scan
    assert back.filter("a >= 2").select("a").count() == 2
    print("MARK rcfile_filter_ok")

    # --- engine DDL: CREATE EXTERNAL TABLE ... USING RCFILE -------------
    eng = Engine(spark)
    eng.create_external_table(
        "rc_tbl", rc, fmt="RCFILE", schema="a INT, b TEXT"
    )
    assert eng.sql("SELECT count(*) AS n FROM rc_tbl").collect()[0].n == 3
    print("MARK engine_rcfile_ok")

    # --- SEQUENCEFILE via Hive serde (typed columns) --------------------
    sq = os.path.join(wh, "seq_data")
    hf.write_sequencefile_serde(df, sq)
    sback = hf.read_sequencefile_serde(spark, sq, "a INT, b STRING")
    assert sorted((r.a, r.b) for r in sback.collect()) == rows
    print("MARK seqfile_serde_ok")

    # --- Hive UDF bridge (HiveFunctionLoader.java:47 parity) ------------
    if hb.jdk_available():
        src = (
            "import org.apache.hadoop.hive.ql.exec.UDF;\\n"
            "import org.apache.hadoop.io.Text;\\n"
            "public class TajoBridgeUpper extends UDF {\\n"
            "  public Text evaluate(Text s) {\\n"
            "    if (s == null) return null;\\n"
            "    return new Text(s.toString().toUpperCase());\\n"
            "  }\\n"
            "}\\n"
        )
        jar = hb.build_udf_jar(src, "TajoBridgeUpper", os.path.join(wh, "udf"))
        hb.register_hive_udf(spark, "bridge_upper", "TajoBridgeUpper", jar)
        out = spark.sql(
            "SELECT bridge_upper(b) AS u FROM rc_tbl WHERE a = 1"
        ).collect()
        assert out[0].u == "X", out
        # executes against real data paths, not just literals
        agg = spark.sql(
            "SELECT count(DISTINCT bridge_upper(b)) AS n FROM rc_tbl"
        ).collect()
        assert agg[0].n == 2, agg  # 'X','Y' (NULL excluded)
        hb.drop_hive_udf(spark, "bridge_upper")
        print("MARK hive_udf_ok")
    else:
        print("MARK hive_udf_skipped_no_jdk")

    # in-memory-catalog sessions must get the documented error, not a
    # stack trace from deep inside Hive
    spark.stop()
    print("MARK all_ok")
    """
)


@pytest.fixture(scope="module")
def hive_run():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"hive subprocess failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
    return proc.stdout


def test_rcfile_roundtrip(hive_run):
    assert "MARK rcfile_roundtrip_ok" in hive_run
    assert "MARK rcfile_filter_ok" in hive_run


def test_engine_create_external_rcfile(hive_run):
    assert "MARK engine_rcfile_ok" in hive_run


def test_sequencefile_serde_roundtrip(hive_run):
    assert "MARK seqfile_serde_ok" in hive_run


def test_hive_udf_bridge(hive_run):
    if not jdk_available():
        pytest.skip("no JDK for compiling the sample Hive UDF")
    assert "MARK hive_udf_ok" in hive_run


def test_in_memory_catalog_gets_clear_error(spark):
    """The shared (non-Hive) session raises the documented gate error."""
    from tajo_spark.sources import hive_formats as hf

    with pytest.raises(NotImplementedError, match="enableHiveSupport"):
        hf.read_rcfile(spark, "/tmp/nope", "a INT")
