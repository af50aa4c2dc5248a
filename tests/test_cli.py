"""tsql-parity CLI tests (tajo_spark/cli.py) — mirror the reference's
CLI behaviors (TajoCli.java meta-commands, -c/-f batch modes,
DefaultTajoCliOutputFormatter result shape)."""

from __future__ import annotations

import io

import pytest

from tajo_spark.cli import Cli
from tajo_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


def run(engine, text, max_rows=1000):
    out = io.StringIO()
    cli = Cli(engine=engine, out=out, max_rows=max_rows)
    cli.run_script(text)
    return out.getvalue()


def test_select_formats_header_rows_footer(engine):
    got = run(engine, "SELECT 1 AS a, 'x' AS b;")
    lines = got.splitlines()
    assert lines[0] == "a,  b"
    assert set(lines[1]) == {"-"}
    assert lines[2] == "1,  x"
    assert lines[3].startswith("(1 rows, ")


def test_multiline_statement_and_two_statements(engine):
    got = run(engine, "SELECT 1 AS a\n;\nSELECT 2 AS b;")
    assert "a" in got and "b" in got
    assert got.count("rows,") == 2


def test_null_prints_empty_cell(engine):
    got = run(engine, "SELECT CAST(NULL AS INT) AS a, 2 AS b;")
    assert "\n,  2\n" in got


def test_truncation_cap(engine):
    got = run(engine, "SELECT * FROM range(10);", max_rows=3)
    assert "output truncated at 3 rows" in got
    assert "(3 rows" in got


def test_error_is_reported_not_raised(engine):
    got = run(engine, "SELECT definitely_missing_col FROM range(1);")
    assert got.startswith("ERROR: ")


def test_meta_commands(engine, spark):
    spark.range(3).createOrReplaceTempView("cli_demo")
    assert "cli_demo" in run(engine, "\\d")
    desc = run(engine, "\\d cli_demo")
    assert "id" in desc and "bigint" in desc
    assert "default" in run(engine, "\\l")
    fns = run(engine, "\\df to_char")
    assert "to_char" in fns
    helpout = run(engine, "\\?")
    assert "\\set" in helpout
    assert "invalid command" in run(engine, "\\zz")


def test_set_session_roundtrip(engine):
    out = run(engine, "\\set TIMEZONE UTC\n\\set")
    assert "TIMEZONE=UTC" in out


def test_trailing_statement_without_semicolon_runs(engine):
    got = run(engine, "SELECT 7 AS seven")
    assert "seven" in got and "7" in got


def test_quit_stops_processing(engine):
    got = run(engine, "\\q\nSELECT 1 AS a;")
    assert "(1 rows" not in got


def test_main_command_mode(engine, capsys, monkeypatch):
    # -c mode wires argv → run_script; reuse the module Engine so no
    # second SparkSession is built
    import tajo_spark.cli as cli_mod

    monkeypatch.setattr(cli_mod, "Engine", lambda: engine)
    assert cli_mod.main(["-c", "SELECT 5 AS five;"]) == 0
    cap = capsys.readouterr()
    assert "five" in cap.out and "5" in cap.out


def test_semicolon_inside_literal_not_a_terminator(engine):
    got = run(engine, "SELECT 'a;b' AS x\n;")
    assert "a;b" in got
    assert got.count("rows,") == 1


# ---- pure-Python properties (no Spark) -----------------------------------

from hypothesis import given
from hypothesis import strategies as st

from tajo_spark.cli import _last_terminator
from tajo_spark.engine import split_statements


@given(st.text(alphabet="ab1';-\n, ", max_size=80))
def test_last_terminator_invariants(s):
    cut = _last_terminator(s)
    if cut >= 0:
        assert s[cut] == ";"
        # the prefix up to the terminator is a complete script: feeding
        # it to the splitter must consume everything (no dangling text
        # after the last statement beyond whitespace/comments)
        stmts = split_statements(s[: cut + 1])
        rebuilt = ";".join(stmts)
        assert all(x.strip() for x in stmts)
        assert len(rebuilt) <= cut + 1


def test_main_batch_mode_exits_nonzero_on_error(engine, capsys, monkeypatch):
    import tajo_spark.cli as cli_mod

    monkeypatch.setattr(cli_mod, "Engine", lambda: engine)
    assert cli_mod.main(["-c", "SELECT definitely_missing FROM range(1);"]) == 1
    assert "ERROR:" in capsys.readouterr().out
