#!/usr/bin/env python
"""Fuzz the pure-Python pre-Spark SQL layer (plans/dialect.py).

Engine.execute_sql runs four pure-Python stages before any Spark call:
parse_session_statement → parse_index_statement → the RENAME COLUMN
regex → dialect.translate (+ pop_ctas_check).  This sweep feeds those
stages mutated variants of the reference's own 683-file golden SQL
corpus plus structured junk.  Contract: each stage returns normally or
raises ValueError/NotImplementedError (engine error classes subclass
ValueError) — never IndexError/KeyError/AttributeError/TypeError/
UnboundLocalError/RecursionError, which would fail an Engine call
undiagnosably before Spark even parses.

Usage: python tools/fuzz_dialect.py [--per-file 6] [--seed 0]
Exit 0 = contract holds.
"""
from __future__ import annotations

import argparse
import glob
import random
import re
import sys

sys.path.insert(0, ".")

from tajo_spark.plans import dialect

Q_ROOT = "/root/reference/tajo-core-tests/src/test/resources/queries"
OK_ERRORS = (ValueError, NotImplementedError)

KEYWORDS = [
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "ORDER", "JOIN", "ON",
    "CREATE", "TABLE", "INDEX", "INSERT", "OVERWRITE", "INTO", "AS",
    "UNION", "ALL", "CASE", "WHEN", "THEN", "END", "NULL", "NOT",
    "PARTITION", "COLUMN", "USING", "LOCATION", "SET", "SESSION",
    "(", ")", ",", "'", "*", ";", ".", "--", "/*", "*/", "''", "\"",
]


def mutants(sql: str, rng: random.Random, n: int):
    toks = re.findall(r"\s+|\w+|[^\w\s]", sql)
    for _ in range(n):
        kind = rng.randrange(6)
        if kind == 0 and len(toks) > 2:            # delete a token
            i = rng.randrange(len(toks))
            yield "".join(toks[:i] + toks[i + 1:])
        elif kind == 1:                            # duplicate a token
            i = rng.randrange(len(toks))
            yield "".join(toks[:i] + [toks[i]] + toks[i:])
        elif kind == 2:                            # inject a keyword
            i = rng.randrange(len(toks) + 1)
            kw = rng.choice(KEYWORDS)
            yield "".join(toks[:i] + [f" {kw} "] + toks[i:])
        elif kind == 3:                            # truncate
            yield sql[: rng.randrange(1, max(2, len(sql)))]
        elif kind == 4 and len(toks) > 3:          # swap two tokens
            i, j = rng.randrange(len(toks)), rng.randrange(len(toks))
            toks2 = list(toks)
            toks2[i], toks2[j] = toks2[j], toks2[i]
            yield "".join(toks2)
        else:                                      # splice two halves
            cut = rng.randrange(len(sql))
            yield sql[cut:] + sql[:cut]


def stages(sql: str):
    yield "session", lambda: dialect.parse_session_statement(sql)
    yield "index", lambda: dialect.parse_index_statement(sql)
    yield "translate", lambda: (dialect.translate(sql),
                                dialect.pop_ctas_check())
    # typed-division scope scanners (r10): pure text walkers the engine
    # wraps in try/except — the contract is the same no-surprise set
    yield "div_sites", lambda: dialect.top_level_division_sites(sql)
    yield "div_subq", lambda: dialect.outer_select_spans(sql)
    yield "div_setop", lambda: dialect.setop_branch_spans(sql)
    yield "div_with", lambda: dialect.with_main_start(sql)
    yield "div_cte", lambda: _cte_spans_invariant(sql)


def _cte_spans_invariant(sql: str):
    """cte_body_spans plus the properties the engine's forward rewrite
    loop depends on: spans in-bounds, body within def, strictly ordered
    and non-overlapping. A violated invariant corrupts a rewrite
    silently, so it counts as a breach (AssertionError is not in
    OK_ERRORS)."""
    spans = dialect.cte_body_spans(sql)
    prev_end = -1
    for bs, be, de in spans:
        assert 0 <= bs <= be <= de <= len(sql), (bs, be, de, len(sql))
        assert bs > prev_end, (bs, prev_end)
        prev_end = de
    return spans


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-file", type=int, default=6)
    ap.add_argument("--seed", type=int, default=20260816)
    args = ap.parse_args()
    rng = random.Random(args.seed)

    files = sorted(glob.glob(f"{Q_ROOT}/**/*.sql", recursive=True))
    junk = [
        "", " ", ";", "''", "(((((", ")", "SELECT", "SELECT ''",
        "\x00SELECT 1", "SELECT 1 FROM " + "(" * 500 + ")" * 500,
        "CREATE INDEX ON", "SET SESSION", "ALTER TABLE RENAME COLUMN",
        "INSERT OVERWRITE TABLE", "-- only a comment", "/* unclosed",
        "'unclosed string", 'SELECT "unclosed ident',
        "\\set x 'y'", "CREATE TABLE t (" + "a INT4," * 2000 + ")",
    ]
    breaches: list[str] = []
    cases = 0
    for src in files:
        sql = open(src, encoding="utf-8", errors="replace").read()
        for mut in mutants(sql, rng, args.per_file):
            cases += 1
            for name, fn in stages(mut):
                try:
                    fn()
                except OK_ERRORS:
                    pass
                except Exception as e:
                    breaches.append(
                        f"{name}: {type(e).__name__}: {e} | "
                        f"src={src.split('/queries/')[-1]} | "
                        f"sql={mut[:160]!r}")
                    print("BREACH:", breaches[-1], flush=True)
    for j in junk:
        cases += 1
        for name, fn in stages(j):
            try:
                fn()
            except OK_ERRORS:
                pass
            except Exception as e:
                breaches.append(
                    f"{name}: {type(e).__name__}: {e} | sql={j[:120]!r}")
                print("BREACH:", breaches[-1], flush=True)
    print(f"{cases} cases, {len(breaches)} breaches")
    return 1 if breaches else 0


if __name__ == "__main__":
    sys.exit(main())
