"""JDBC wire-protocol entry point (Engine.serve_jdbc): a real
HiveServer2-protocol client must connect over TCP, run SQL on the
engine's OWN session (shared temp views — the single-session /
one-TajoMaster-catalog deployment shape), and read typed results.

The client is the hive-jdbc driver that ships in the pyspark wheel's
jars/, driven through BeeLine in a subprocess — an end-to-end JDBC
round trip through the exact driver class a BI tool would load
(reference parity target: tajo-jdbc TajoDriver.java:25).
"""

from __future__ import annotations

import glob
import os
import socket
import subprocess

import pytest

from tajo_spark.engine import Engine


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _beeline(port: int, sql: str) -> subprocess.CompletedProcess:
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    cp = ":".join(glob.glob(jars + "/*.jar"))
    return subprocess.run(
        [
            "java", "-cp", cp, "org.apache.hive.beeline.BeeLine",
            "-u", f"jdbc:hive2://127.0.0.1:{port}", "-n", "anon",
            "--silent=true", "--outputformat=csv2", "-e", sql,
        ],
        capture_output=True,
        text=True,
        timeout=180,
    )


@pytest.fixture(scope="module")
def jdbc(spark):
    engine = Engine(spark)
    port = _free_port()
    server = engine.serve_jdbc(port=port)
    # the Thrift listener comes up asynchronously; poll the socket
    import time

    for _ in range(100):
        try:
            socket.create_connection(("127.0.0.1", port), timeout=1).close()
            break
        except OSError:
            time.sleep(0.2)
    else:
        server.stop()
        pytest.fail("thrift server never opened its port")
    yield engine, port
    server.stop()


def test_jdbc_client_queries_engine_session(jdbc, spark):
    engine, port = jdbc
    spark.createDataFrame(
        [(1, "ok"), (2, "really")], "a INT, b STRING"
    ).createOrReplaceTempView("jdbc_probe_t")
    out = _beeline(port, "SELECT a, b FROM jdbc_probe_t ORDER BY a")
    assert out.returncode == 0, out.stderr[-2000:]
    # csv2: header row then data rows (beeline echoes its prompt ahead
    # of the first line — strip it)
    lines = [
        ln.strip().split("> ")[-1]
        for ln in out.stdout.splitlines()
        if "," in ln
    ]
    assert lines[0] == "a,b"
    assert lines[1:] == ["1,ok", "2,really"]


def test_jdbc_shares_session_state_and_udfs(jdbc, spark):
    # the engine's registered SQL functions (functions/registry.py)
    # must be callable over JDBC — proof the connection runs on the
    # engine's session, not an isolated one
    engine, port = jdbc
    out = _beeline(port, "SELECT ltrim('  x') AS v, 7 div 2 AS d")
    assert out.returncode == 0, out.stderr[-2000:]
    assert any(ln.strip() == "x,3" for ln in out.stdout.splitlines())
    # a temp view CREATED over JDBC is visible to the engine in-process
    # (single-session: one catalog, both directions)
    out = _beeline(
        port, "CREATE OR REPLACE TEMP VIEW jdbc_made_here AS SELECT 42 AS x"
    )
    assert out.returncode == 0, out.stderr[-2000:]
    got = engine.execute_sql("SELECT x FROM jdbc_made_here").collect()
    assert [r.x for r in got] == [42]


def test_jdbc_runs_aggregation_over_real_tables(jdbc, spark):
    # the switch-over claim: a BI tool pointed at the JDBC endpoint can
    # run the reference's query shapes against the engine's tables —
    # here a TPC-H q1-style aggregate over lineitem, checked against
    # the same aggregate computed in-process
    from tajo_spark.catalog import load_table
    from tests.conftest import SF_DIR

    engine, port = jdbc
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView(
        "jdbc_lineitem"
    )
    sql = (
        "SELECT l_returnflag, count(*) AS n, "
        "round(sum(l_quantity), 2) AS qty "
        "FROM jdbc_lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    out = _beeline(port, sql)
    assert out.returncode == 0, out.stderr[-2000:]
    got = [
        ln.strip().split("> ")[-1]
        for ln in out.stdout.splitlines()
        if "," in ln
    ]
    want = ["l_returnflag,n,qty"] + [
        f"{r.l_returnflag},{r.n},{r.qty}"
        for r in engine.execute_sql(sql).collect()
    ]
    assert got == want


def test_jdbc_classpath_gate_message():
    # the gate raises an actionable deployment message when the
    # thriftserver class is absent; here the jar ships, so assert the
    # Class.forName path resolves (the gate's happy side)
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    assert glob.glob(jars + "/spark-hive-thriftserver_*.jar")
