"""Regen gate for the executed-DDL golden corpus (VERDICT r07 #7).

tools/ddl_golden_exec.py runs every ddl-or-side-effect golden file
end-to-end through Engine.execute_script with per-kind effect
assertions and writes ddl_exec_results.json; golden_audit.py folds the
counts into PARITY.md.  This gate keeps the three in sync without
re-running Spark:

  * every file the classifier labels DDL appears in the sidecar,
  * no sidecar row is a FAIL (real divergences must be fixed, not
    recorded),
  * PARITY.md's executed-DDL table matches the sidecar's counts.
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

SIDE = os.path.join(REPO, "ddl_exec_results.json")


def _rows():
    with open(SIDE) as fh:
        return json.load(fh)


def test_sidecar_covers_exactly_the_classified_ddl_files():
    import golden_audit as GA

    want = set(GA.ddl_file_list())
    got = {r["file"] for r in _rows()}
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )


def test_no_ddl_golden_fails():
    bad = [r for r in _rows() if r["status"] == "FAIL"]
    assert bad == [], "\n".join(
        f"{r['file']}: {r['note']}" for r in bad
    )


def test_every_row_has_an_effect_or_documented_gate():
    for r in _rows():
        assert r["status"] in (
            "executed-ok", "gated", "parse-only-reject", "unstageable"
        ), r
        if r["status"] != "executed-ok":
            assert r["note"], f"{r['file']}: non-ok row needs a reason"
        if r["status"] == "parse-only-reject":
            assert r["suite"] == "TestSQLAnalyzer", r


def test_parity_md_matches_sidecar():
    per = collections.Counter()
    for r in _rows():
        per[(r["suite"], r["status"])] += 1
    text = open(os.path.join(REPO, "PARITY.md")).read()
    m = re.search(
        r"## Executed DDL goldens.*?\n\|[^\n]*\|\n\|[-| ]*\|\n(.*?)(\n\n|\Z)",
        text,
        re.S,
    )
    assert m, "PARITY.md lacks the '## Executed DDL goldens' table"
    table = {}
    for line in m.group(1).strip().splitlines():
        cells = [c.strip().strip("`") for c in line.strip("|").split("|")]
        table[cells[0]] = tuple(int(c) for c in cells[1:5])
    suites = {r["suite"] for r in _rows()}
    assert set(table) == suites
    for s in suites:
        want = (
            per[(s, "executed-ok")],
            per[(s, "gated")],
            per[(s, "parse-only-reject")],
            per[(s, "unstageable")],
        )
        assert table[s] == want, (s, table[s], want)
