"""tsql-parity interactive shell over :class:`tajo_spark.engine.Engine`.

Reference: the ``tsql`` CLI (tajo-cli/src/main/java/org/apache/tajo/cli/
tsql/TajoCli.java:59) — reads ';'-terminated statements plus
backslash meta-commands, executes through the client API, and prints
results via DefaultTajoCliOutputFormatter (same dir,
DefaultTajoCliOutputFormatter.java: comma-separated columns, a dashed
header rule, and a ``(N rows, X sec)`` footer). Flags mirror TajoCli's
``-c <command>`` and ``-f <file>`` batch modes.

Meta-commands implemented (TajoCli registers these in its command map,
TajoCli.java ``commands`` field):

=========  =====================================================
``\\?``     help
``\\q``     quit
``\\l``     list databases
``\\d``     list tables; ``\\d name`` describes one table
``\\df``    list functions (optionally filtered by prefix)
``\\set``   show or set session variables (``\\set KEY val``)
``\\unset`` drop a session variable
=========  =====================================================

Scale note: results stream to the terminal through
``toLocalIterator`` capped at ``max_rows`` — the driver never
materializes an unbounded result set (the reference pages results the
same way: TajoResultSet fetches in chunks, QueryClient.java:98).
"""

from __future__ import annotations

import itertools
import sys
import time
from typing import IO

from tajo_spark.engine import Engine, split_statements

def _last_terminator(script: str) -> int:
    """Index of the last ';' that terminates a statement (outside
    single-quoted literals and ``--`` comments), or -1 — the same state
    tracking as :func:`tajo_spark.engine.split_statements`."""
    last = -1
    in_str = False
    i = 0
    while i < len(script):
        c = script[i]
        if in_str:
            if c == "'":
                if i + 1 < len(script) and script[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "-" and script[i : i + 2] == "--":
            while i < len(script) and script[i] != "\n":
                i += 1
            continue
        elif c == ";":
            last = i
        i += 1
    return last


PROMPT = "tajo> "
HELP = """General
  \\? ........................ show this help
  \\q ........................ quit
Catalog
  \\l ........................ list databases
  \\d [table] ................ list tables / describe a table
  \\df [prefix] .............. list functions
Session
  \\set [KEY value] .......... show / set session variables
  \\unset KEY ................ unset a session variable
Statements end with ';' and may span lines."""


class Cli:
    """The REPL state machine — I/O injected so tests drive it."""

    def __init__(
        self,
        engine: Engine | None = None,
        out: IO[str] | None = None,
        max_rows: int = 1000,
    ) -> None:
        self.engine = engine or Engine()
        self.out = out or sys.stdout
        self.max_rows = max_rows
        self._buf: list[str] = []
        self.done = False
        self.errors = 0  # statements that printed ERROR (batch exit code)

    # ---- line protocol ----------------------------------------------------
    def feed_line(self, line: str) -> None:
        """Accept one input line: meta-command (only at statement start,
        as in tsql) or SQL fragment; executes completed statements."""
        if not self._buf and line.lstrip().startswith("\\"):
            self._meta(line.strip())
            return
        self._buf.append(line)
        script = "\n".join(self._buf)
        if ";" not in line:
            return
        cut = _last_terminator(script)
        if cut < 0:  # every ';' so far sits inside a string literal
            return
        tail = script[cut + 1 :]
        self._buf = [tail] if tail.strip() else []
        for stmt in split_statements(script[: cut + 1]):
            self.execute(stmt)

    def run_script(self, text: str) -> None:
        for line in text.splitlines():
            if self.done:
                break
            self.feed_line(line)
        # a trailing statement without ';' still runs (tsql -f behavior)
        if not self.done and "".join(self._buf).strip():
            for stmt in split_statements("\n".join(self._buf)):
                self.execute(stmt)
            self._buf = []

    # ---- execution & formatting -------------------------------------------
    def execute(self, stmt: str) -> None:
        t0 = time.perf_counter()
        try:
            df = self.engine.execute_sql(stmt)
        except Exception as exc:  # surface engine errors like tsql's ERROR:
            first = str(exc).strip().splitlines()[0] if str(exc) else repr(exc)
            print(f"ERROR: {first}", file=self.out)
            self.errors += 1
            return
        elapsed = time.perf_counter() - t0
        if df is None:  # session directive / DDL with no result set
            print(f"OK ({elapsed:.3f} sec)", file=self.out)
            return
        self._print_result(df, elapsed)

    def _print_result(self, df, elapsed: float) -> None:
        cols = df.columns
        print(",  ".join(cols), file=self.out)
        print("-" * 42, file=self.out)
        n = 0
        # stream, never collect: one extra row probes truncation
        for row in itertools.islice(df.toLocalIterator(), self.max_rows + 1):
            n += 1
            if n > self.max_rows:
                print(
                    f"... output truncated at {self.max_rows} rows",
                    file=self.out,
                )
                break
            print(
                ",  ".join("" if v is None else str(v) for v in row),
                file=self.out,
            )
        shown = min(n, self.max_rows)
        print(f"({shown} rows, {elapsed:.3f} sec)", file=self.out)

    # ---- meta-commands -----------------------------------------------------
    def _meta(self, line: str) -> None:
        parts = line.split()
        cmd, args = parts[0], parts[1:]
        if cmd == "\\q":
            self.done = True
        elif cmd == "\\?":
            print(HELP, file=self.out)
        elif cmd == "\\l":
            for db in self.engine.databases():
                print(db, file=self.out)
        elif cmd == "\\d" and not args:
            for t in self.engine.tables():
                print(t, file=self.out)
        elif cmd == "\\d":
            for col, typ in self.engine.describe_table(args[0]):
                print(f"{col}\t{typ}", file=self.out)
        elif cmd == "\\df":
            pat = args[0] if args else None
            for fn in self.engine.functions(pat):
                print(fn, file=self.out)
        elif cmd == "\\set" and len(args) >= 2:
            self.engine.set_session(args[0], " ".join(args[1:]))
        elif cmd == "\\set":
            for k, v in sorted(self.engine.show_session().items()):
                print(f"{k}={v}", file=self.out)
        elif cmd == "\\unset" and args:
            self.engine.execute_sql(f"UNSET SESSION {args[0]}")
        else:
            print(f"invalid command: {cmd}  (try \\?)", file=self.out)


def main(argv: list[str] | None = None) -> int:
    """``python -m tajo_spark.cli [-c 'sql;'] [-f script.sql]`` — the
    TajoCli entry modes; with neither flag, an interactive loop."""
    import argparse

    p = argparse.ArgumentParser(prog="tsql", description="tajo_spark shell")
    p.add_argument("-c", dest="command", help="run statements and exit")
    p.add_argument("-f", dest="file", help="run a script file and exit")
    p.add_argument(
        "--serve",
        nargs="?",
        const=26880,  # the reference's REST port family (tajo-docs)
        type=int,
        metavar="PORT",
        help="serve the REST API (rest.py) instead of a shell",
    )
    p.add_argument(
        "--serve-jdbc",
        nargs="?",
        const=26002,  # the reference's client RPC port (TajoConf.java:138)
        type=int,
        metavar="PORT",
        help="serve the HiveServer2-protocol JDBC endpoint "
        "(Engine.serve_jdbc) instead of a shell",
    )
    a = p.parse_args(argv)

    if a.serve is not None:
        from tajo_spark.engine import Engine
        from tajo_spark.rest import make_server

        server = make_server(Engine(), host="127.0.0.1", port=a.serve)
        print(f"REST API on http://127.0.0.1:{server.server_address[1]}")
        server.serve_forever()
        return 0

    if a.serve_jdbc is not None:
        import time as _time

        from tajo_spark.engine import Engine

        server = Engine().serve_jdbc(port=a.serve_jdbc)
        print(f"JDBC (HiveServer2 protocol) on jdbc:hive2://127.0.0.1:{a.serve_jdbc}")
        try:
            while True:  # foreground like --serve
                _time.sleep(3600)
        except KeyboardInterrupt:  # Ctrl-C: clean stop, no traceback
            server.stop()
            return 0

    cli = Cli()
    if a.command:
        cli.run_script(a.command)
        return 1 if cli.errors else 0
    if a.file:
        with open(a.file, encoding="utf-8") as fh:
            cli.run_script(fh.read())
        return 1 if cli.errors else 0
    while not cli.done:
        try:
            cli.out.write(PROMPT if not cli._buf else "   -> ")
            cli.out.flush()
            line = input()
        except EOFError:
            break
        cli.feed_line(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
