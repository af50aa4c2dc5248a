#!/usr/bin/env python
"""Execute the reference's DDL/side-effect golden files end-to-end.

PARITY.md's last unexecuted category (VERDICT r07 #7): the 161
``ddl-or-side-effect`` golden files were covered by representative
tests in tests/test_ddl.py but never run file-by-file.  This module
runs every one through ``Engine.execute_script`` with an EFFECT
assertion per statement kind — catalog existence, row counts, schema
changes, partition lists, table properties — the same post-conditions
the reference's own test classes assert (QueryTestCaseBase.executeDDL
+ per-class catalog assertions, e.g. TestAlterTable.java asserts
column/partition mutations against CatalogService).

Protocol per suite (mirrors the reference harness):
  * a fresh isolated database per suite (the reference uses one
    database per test class, QueryTestCaseBase.java:168);
  * ``${0}`` substitutes to the file stem minus a ``_ddl`` suffix
    (the name the reference's executeDDL callers pass);
  * ``${table.path}`` stages the suite's own dataset fixture
    (tajo-core-tests/src/test/resources/dataset/<Suite>/...) into a
    temp dir, or synthesizes two deterministic rows from the declared
    schema when the reference keeps the data inline in Java;
  * files execute creates-first (the reference's @Before methods run
    the *_ddl.sql fixtures before the mutation files);
  * absolute/remote LOCATION URIs in parse-only TestSQLAnalyzer
    fixtures are rebased to local temp paths (the reference never
    executes those files — rebasing lets the effect still be
    asserted instead of failing on a fake hdfs:// host).

Statuses:
  executed-ok       ran + effect assertion passed
  gated             rejected by a documented capability gate
                    (NotImplementedError / engine ValueError with gate
                    text — e.g. HASH/LIST partitioning, Tajo parses but
                    never executes these either: CreateTableNode carries
                    them, PhysicalPlanner has no executor)
  parse-only-reject TestSQLAnalyzer fixtures only: the reference
                    asserts the PARSE TREE and never resolves or
                    executes these statements; this harness executes
                    them anyway and records a post-parse rejection
                    (missing fixture table, unresolved column from a
                    double-quoted "string" the ANSI grammar makes an
                    identifier, ...) — parsing succeeded, which is the
                    reference's whole contract for the file
  unstageable       needs a fixture this harness cannot stage (listed
                    with the reason; none expected)
  FAIL              executed but the effect assertion failed, raised a
                    PARSE error on a file the reference parses, or
                    raised outside any gate — real divergences
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES_ROOT = "/root/reference/tajo-core-tests/src/test/resources/queries"
DATASET_ROOT = "/root/reference/tajo-core-tests/src/test/resources/dataset"

_CREATE_NAME_RE = re.compile(
    r"create\s+(?:external\s+)?table\s+(?:if\s+not\s+exists\s+)?"
    r"[\"`]?([A-Za-z_][\w.]*)[\"`]?",
    re.IGNORECASE,
)

# deterministic per-type sample values (two rows) for synthesized
# fixtures — enough for count/scan effect probes
_SAMPLES = {
    "int": ("1", "2"), "int4": ("1", "2"), "int8": ("1", "2"),
    "bigint": ("1", "2"), "smallint": ("1", "2"), "int2": ("1", "2"),
    "float": ("1.5", "2.5"), "float4": ("1.5", "2.5"),
    "float8": ("1.5", "2.5"), "double": ("1.5", "2.5"),
    "text": ("a", "b"), "varchar": ("a", "b"), "char": ("a", "b"),
    "bool": ("true", "false"), "boolean": ("true", "false"),
    "date": ("2020-01-01", "2020-01-02"),
    "timestamp": ("2020-01-01 00:00:00", "2020-01-02 00:00:00"),
    "time": ("01:02:03", "04:05:06"),
}


def _statement_kind(sql: str) -> str:
    low = re.sub(r"--[^\n]*", "", sql).strip().lower()
    for kind, pat in (
        ("ctas", r"create\s+(external\s+)?table\b[\s\S]*?\bas\s+select"),
        ("create_index", r"create\s+index\b"),
        ("create", r"create\s+(external\s+)?table\b"),
        ("insert_overwrite", r"insert\s+overwrite\b"),
        ("insert", r"insert\b"),
        ("alter_rename_table", r"alter\s+table\s+\S+\s+rename\s+to\b"),
        ("alter_rename_col", r"alter\s+table\s+\S+\s+rename\s+column\b"),
        ("alter_add_col", r"alter\s+table\s+\S+\s+add\s+column\b"),
        ("alter_add_part", r"alter\s+table\s+\S+\s+add\s+(if\s+not\s+exists\s+)?partition\b"),
        ("alter_drop_part", r"alter\s+table\s+\S+\s+drop\s+(if\s+exists\s+)?partition\b"),
        ("alter_repair", r"alter\s+table\s+\S+\s+repair\s+partition\b"),
        ("alter_set_prop", r"alter\s+table\s+\S+\s+set\s+property\b"),
        ("alter_unset_prop", r"alter\s+table\s+\S+\s+unset\s+property\b"),
        ("alter", r"alter\b"),
        ("drop", r"drop\s+table\b"),
        ("truncate", r"truncate\b"),
    ):
        if re.match(pat, low):
            return kind
    return "other"


def _split_cols(body: str) -> list[tuple[str, str]]:
    """'(a int, b text)' column body → [(name, type), ...]."""
    out = []
    depth = 0
    cur = ""
    items = []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        items.append(cur)
    for it in items:
        bits = it.strip().split(None, 1)
        if len(bits) == 2:
            out.append((bits[0].strip('`"'), bits[1].strip()))
    return out


def _synthesize_text(loc: str, cols: list[tuple[str, str]], delim: str) -> int:
    rows = []
    for i in range(2):
        vals = []
        for _, t in cols:
            base = re.sub(r"\(.*", "", t).strip().lower()
            vals.append(_SAMPLES.get(base, ("a", "b"))[i])
        rows.append(delim.join(vals))
    with open(os.path.join(loc, "part0.tbl"), "w") as fh:
        fh.write("\n".join(rows) + "\n")
    return 2


def _stage_location(
    suite: str, tname: str, sql_low: str, cols, tmproot: str
) -> tuple[str, int | None]:
    """Directory for ${table.path}: the suite's dataset fixture when
    one matches the table name, else two synthesized rows."""
    loc = os.path.join(tmproot, f"{suite}_{tname}")
    os.makedirs(loc, exist_ok=True)
    short = re.sub(r"_(large|parquet)$", "", tname)
    cand_dir = os.path.join(DATASET_ROOT, suite)
    if os.path.isdir(cand_dir):
        for entry in sorted(os.listdir(cand_dir)):
            stem = entry.split(".")[0]
            if stem in (tname, short):
                src = os.path.join(cand_dir, entry)
                if os.path.isfile(src):
                    shutil.copy(src, loc)
                    with open(src, errors="replace") as fh:
                        return loc, sum(
                            1 for ln in fh if ln.strip()
                        )
                n = 0
                for root, _dirs, fs in os.walk(src):
                    for f in fs:
                        shutil.copy(os.path.join(root, f), loc)
                        n += 1
                return loc, None  # fixture dir: row count unknown here
    if "using parquet" in sql_low or "using orc" in sql_low:
        # external parquet/orc with no fixture: stage an empty dir —
        # the create must still succeed and scan as 0 rows
        return loc, 0
    m = re.search(r"'text\.delimiter'\s*=\s*'([^']*)'", sql_low)
    delim = m.group(1) if m else "|"
    if delim.startswith("\\u"):
        delim = chr(int(delim[2:], 16))
    return loc, _synthesize_text(loc, cols, delim)


# negative DDL goldens: the reference's own test EXPECTS an exception
# (TestQueryValidation.java:71-86) — raising is the correct behavior
DDL_EXPECTED_REJECT = {
    "TestQueryValidation/create_external_table_with_tablespace.sql",
    "TestQueryValidation/create_external_table_without_location.sql",
}

_GATE_MARKERS = (
    "no spark datasource",
    "not a writable store format",
    "hash/list partition",
    "partition by hash",
    "partition by list",
    "map type",
    "not supported",
    "unsupported",
    "has no spark",
)


def _is_gate(exc: Exception) -> bool:
    if isinstance(exc, NotImplementedError):
        return True
    return any(m in str(exc).lower() for m in _GATE_MARKERS)


class _Probe:
    """Catalog effect probes against the suite's active database."""

    def __init__(self, eng):
        self.eng = eng
        self.spark = eng.spark

    def exists(self, name: str) -> bool:
        name = name.strip('`"')
        try:
            if self.spark.catalog.tableExists(name):
                return True
        except Exception:
            pass
        try:
            self.spark.table(name)
            return True
        except Exception:
            return False

    def count(self, name: str) -> int:
        return self.spark.table(name.strip('`"')).count()

    def cols(self, name: str) -> list[str]:
        return [
            c.lower()
            for c in self.spark.table(name.strip('`"')).columns
        ]

    def partitions(self, name: str) -> list[str]:
        return [
            r[0]
            for r in self.spark.sql(
                f"SHOW PARTITIONS {name.strip(chr(96))}"
            ).collect()
        ]

    def props(self, name: str) -> dict[str, str]:
        return {
            r["key"]: r["value"]
            for r in self.spark.sql(
                f"SHOW TBLPROPERTIES {name.strip(chr(96))}"
            ).collect()
        }


def _effect_check(kind: str, sql: str, probe: _Probe, pre: dict) -> str | None:
    """None = effect holds; otherwise a failure description."""
    low = re.sub(r"--[^\n]*", "", sql).lower()

    def name_after(pat):
        m = re.search(pat, low)
        return m.group(1).strip('`"') if m else None

    if kind in ("create", "ctas"):
        t = name_after(
            r"create\s+(?:external\s+)?table\s+(?:if\s+not\s+exists\s+)?([\w.\"`]+)"
        )
        if not t or not probe.exists(t):
            return f"table {t!r} missing after CREATE"
        n = probe.count(t)
        want = pre.get("staged_rows")
        if want is not None and n != want:
            return f"{t}: staged {want} rows, scanned {n}"
        if kind == "ctas" and pre.get("select_rows") is not None:
            if n != pre["select_rows"]:
                return f"{t}: CTAS select had {pre['select_rows']} rows, table has {n}"
        return None
    if kind == "create_index":
        nm = name_after(r"create\s+index\s+(?:if\s+not\s+exists\s+)?([\w\"`]+)")
        if nm and nm in getattr(probe.eng, "_indexes", {}):
            return None
        try:
            probe.eng.drop_index(nm)
            return None
        except Exception:
            return f"index {nm!r} not registered after CREATE INDEX"
    if kind in ("insert", "insert_overwrite"):
        if pre.get("loc_path") is not None:
            import os as _os

            files = [
                f for f in _os.listdir(pre["loc_path"])
                if not f.startswith((".", "_"))
            ]
            if not files:
                return f"no files written to {pre['loc_path']}"
            return None
        t = pre["target"]
        if not t:
            return None  # unprobeable target shape; executing sufficed
        n = probe.count(t)
        if kind == "insert_overwrite":
            exp = pre.get("select_rows")
            if exp is not None and n != exp:
                return f"{t}: OVERWRITE expected {exp} rows, has {n}"
            return None
        before = pre.get("count_before", 0)
        exp = pre.get("select_rows")
        if exp is not None and n != before + exp:
            return f"{t}: {before}+{exp} expected, has {n}"
        if exp is None and n < before:
            return f"{t}: count dropped {before} -> {n} on INSERT INTO"
        return None
    if kind == "alter_rename_table":
        old = name_after(r"alter\s+table\s+([\w.\"`]+)")
        new = name_after(r"rename\s+to\s+([\w.\"`]+)")
        if probe.exists(old):
            return f"{old} still present after RENAME TO {new}"
        if not probe.exists(new):
            return f"{new} missing after RENAME"
        return None
    if kind == "alter_rename_col":
        t = name_after(r"alter\s+table\s+([\w.\"`]+)")
        m = re.search(r"rename\s+column\s+([\w\"`]+)\s+to\s+([\w\"`]+)", low)
        old, new = m.group(1).strip('`"'), m.group(2).strip('`"')
        cols = probe.cols(t)
        if new not in cols or old in cols:
            return f"{t}: columns {cols} after RENAME COLUMN {old}->{new}"
        return None
    if kind == "alter_add_col":
        t = name_after(r"alter\s+table\s+([\w.\"`]+)")
        m = re.search(r"add\s+column\s+([\w\"`]+)", low)
        col = m.group(1).strip('`"')
        if col not in probe.cols(t):
            return f"{t}: {col} missing after ADD COLUMN"
        return None
    if kind in ("alter_add_part", "alter_drop_part", "alter_repair"):
        t = name_after(r"alter\s+table\s+([\w.\"`]+)")
        try:
            parts = probe.partitions(t)
        except Exception as exc:
            return f"{t}: SHOW PARTITIONS failed after {kind}: {exc}"
        spec = "/".join(
            f"{c}={v}"
            for c, v in re.findall(r"([a-z_]\w*)\s*=\s*'?(\w+)'?", low)
        )
        # membership, not count delta: *2 variants re-add/re-drop the
        # same spec with IF [NOT] EXISTS (the reference asserts the
        # catalog state, not a delta)
        if kind == "alter_add_part" and spec and spec not in parts:
            return f"{t}: partition {spec} absent after ADD ({parts})"
        if kind == "alter_drop_part" and spec and spec in parts:
            return f"{t}: partition {spec} still present after DROP"
        return None
    if kind in ("alter_set_prop", "alter_unset_prop"):
        t = name_after(r"alter\s+table\s+([\w.\"`]+)")
        m = re.search(r"(?:un)?set\s+property\s+\(?\s*'([^']+)'", low)
        key = m.group(1) if m else None
        props = probe.props(t)
        if kind == "alter_set_prop" and key and key not in props:
            return f"{t}: property {key!r} missing after SET PROPERTY"
        if kind == "alter_unset_prop" and key and key in props:
            return f"{t}: property {key!r} still present after UNSET"
        return None
    if kind == "drop":
        t = name_after(r"drop\s+table\s+(?:if\s+exists\s+)?([\w.\"`]+)")
        if probe.exists(t):
            return f"{t} still present after DROP"
        return None
    if kind == "truncate":
        t = name_after(r"truncate\s+(?:table\s+)?([\w.\"`]+)")
        if probe.count(t) != 0:
            return f"{t} non-empty after TRUNCATE"
        return None
    return None  # 'other' / 'alter' generic: executing IS the effect


def _order_key(rel: str, sql_low: str) -> tuple[int, str]:
    base = os.path.basename(rel)
    kind = _statement_kind(sql_low)
    if kind in ("create", "ctas", "create_index") or "_ddl" in base:
        rank = 0
    elif kind.startswith("insert"):
        rank = 1
    elif kind.startswith("alter") or kind == "truncate":
        rank = 2
    else:
        rank = 3
    return (rank, base)


def run_ddl_corpus(eng, ddl_files: list[str]) -> list[dict]:
    """Execute every DDL golden; returns one result row per file."""
    spark = eng.spark
    probe = _Probe(eng)
    tmproot = tempfile.mkdtemp(prefix="ddl_goldens_")
    results = []
    by_suite: dict[str, list[str]] = {}
    for rel in ddl_files:
        by_suite.setdefault(rel.split("/")[0], []).append(rel)
    try:
        for suite in sorted(by_suite):
            db = f"ddlg_{suite.lower()}"
            spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
            spark.sql(f"CREATE DATABASE {db}")
            spark.sql(f"USE {db}")
            files = sorted(
                by_suite[suite],
                key=lambda r: _order_key(
                    r, open(os.path.join(QUERIES_ROOT, r)).read().lower()
                ),
            )
            # Names this suite CREATES shadow any same-named staged
            # temp view (the reference harness uses one database per
            # test class, so its table1 never collides with another
            # fixture's table1) — park the views, restore after.
            created = set()
            for rel in files:
                txt = open(os.path.join(QUERIES_ROOT, rel)).read()
                stem = os.path.basename(rel)[: -len(".sql")]
                txt = txt.replace("${0}", re.sub(r"_ddl\d*$", "", stem))
                low = txt.lower()
                m = _CREATE_NAME_RE.search(txt)
                # IF NOT EXISTS creates are no-ops against an existing
                # relation in the reference — keep the staged view
                if m and "if not exists" not in low:
                    created.add(m.group(1).split(".")[-1].lower())
                for pat in (
                    r"alter\s+table\s+([\w.]+)",
                    r"drop\s+table\s+(?:if\s+exists\s+)?([\w.]+)",
                    r"truncate\s+(?:table\s+)?([\w.]+)",
                    r"insert\s+(?:overwrite\s+)?into\s+(?!location\b)"
                    r"(?:table\s+)?([\w.]+)",
                ):
                    for mm in re.finditer(pat, low):
                        name = mm.group(1).split(".")[-1]
                        if name != "default":
                            created.add(name)
            shadow = {}
            for t in spark.catalog.listTables():
                if t.isTemporary and t.name.lower() in created:
                    shadow[t.name] = spark.table(t.name)
                    spark.catalog.dropTempView(t.name)
            try:
                _suite_fixtures(eng, suite, tmproot)
                for rel in files:
                    results.append(
                        _run_one(eng, probe, suite, rel, tmproot)
                    )
            finally:
                for name, df in shadow.items():
                    df.createOrReplaceTempView(name)
                spark.sql("USE default")
                spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    finally:
        spark.sql("USE default")
        shutil.rmtree(tmproot, ignore_errors=True)
    return results


def _suite_fixtures(eng, suite: str, tmproot: str) -> None:
    """Per-suite prerequisites the reference's Java @Before blocks
    create outside the golden files."""
    if suite == "TestCreateIndex":
        # the suite indexes `lineitem`; the staged TPC-H fixture is a
        # temp VIEW (no tracked storage for the clustering rewrite), so
        # materialize it as a real external table in the suite db
        p = os.path.join(tmproot, "idx_lineitem_parquet")
        eng.spark.table("lineitem").write.mode("overwrite").parquet(p)
        eng.create_external_table("lineitem", p, "PARQUET")


def _ensure_prereqs(eng, probe, kind: str, low: str) -> None:
    """Create the databases / target tables the reference's Java test
    methods create inline before running the golden mutation file."""
    for dbm in re.finditer(
        r"(?:table|into|exists)\s+([a-z_]\w*)\.", low
    ):
        eng.spark.sql(f"CREATE DATABASE IF NOT EXISTS {dbm.group(1)}")
    pats = {
        "alter_rename_table": r'alter\s+table\s+([\w."`]+)',
        "alter_rename_col": r'alter\s+table\s+([\w."`]+)',
        "alter_add_col": r'alter\s+table\s+([\w."`]+)',
        "alter_add_part": r'alter\s+table\s+([\w."`]+)',
        "alter_drop_part": r'alter\s+table\s+([\w."`]+)',
        "alter_repair": r'alter\s+table\s+([\w."`]+)',
        "alter_set_prop": r'alter\s+table\s+([\w."`]+)',
        "alter_unset_prop": r'alter\s+table\s+([\w."`]+)',
        "drop": r'drop\s+table\s+(?:if\s+exists\s+)?([\w."`]+)',
        "truncate": r'truncate\s+(?:table\s+)?([\w."`]+)',
    }
    if kind in ("insert", "insert_overwrite") and "into location" not in low:
        m = re.search(
            r"insert\s+(?:overwrite\s+)?into\s+(?:table\s+)?([\w.\"`]+)"
            r"\s*(\(([^)]*)\))?", low
        )
        if m:
            t = m.group(1).strip('`"')
            if not probe.exists(t):
                # the reference's Java @Before created the target; build
                # it from the INSERT's own select schema (+ explicit
                # column list when given)
                msel = re.search(r"\b(select\b[\s\S]*)$", low)
                if msel:
                    try:
                        src = eng.execute_sql(
                            f"SELECT * FROM ({msel.group(1)}) __tgt LIMIT 0"
                        )
                        names = (
                            [c.strip() for c in m.group(3).split(",")]
                            if m.group(3) else list(src.columns)
                        )
                        defs = ", ".join(
                            f"`{n}` {f.dataType.simpleString()}"
                            for n, f in zip(names, src.schema.fields)
                        )
                        eng.spark.sql(
                            f"CREATE TABLE {t} ({defs}) USING parquet"
                        )
                    except Exception:
                        pass
        return
    pat = pats.get(kind)
    if not pat:
        return
    m = re.search(pat, low)
    if not m:
        return
    t = m.group(1).strip('`"')
    if probe.exists(t):
        return
    if kind in ("alter_add_part", "alter_drop_part", "alter_repair"):
        cols = sorted(set(re.findall(r"([a-z_]\w*)\s*=", low))) or ["p"]
        defs = ", ".join(f"{c} STRING" for c in cols)
        eng.spark.sql(
            f"CREATE TABLE {t} (data INT, {defs}) USING parquet "
            f"PARTITIONED BY ({', '.join(cols)})"
        )
        if kind in ("alter_drop_part",):
            # give DROP PARTITION something to drop
            spec = ", ".join(
                f"{c}='{v}'"
                for c, v in re.findall(r"([a-z_]\w*)\s*=\s*'?(\w+)'?", low)
            )
            if spec:
                eng.spark.sql(
                    f"ALTER TABLE {t} ADD IF NOT EXISTS PARTITION ({spec})"
                )
    elif kind == "alter_rename_col":
        mm = re.search(r'rename\s+column\s+([\w"`]+)', low)
        old = mm.group(1).strip('`"') if mm else "c0"
        eng.spark.sql(
            f"CREATE TABLE {t} ({old} STRING, __fill INT) USING parquet"
        )
    else:
        eng.spark.sql(f"CREATE TABLE {t} (id INT) USING parquet")


def _select_rows(eng, sql_low: str) -> int | None:
    m = re.search(r"\b(select\b[\s\S]*)$", sql_low)
    if not m:
        m = re.search(r"\bvalues\b([\s\S]*)$", sql_low)
        if m:
            return m.group(1).count("(") or None
        return None
    try:
        df = eng.execute_sql(
            f"SELECT count(*) c FROM ({m.group(1).rstrip(';')}) __ddl_n"
        )
        return int(df.collect()[0][0])
    except Exception:
        return None


def _run_one(eng, probe: _Probe, suite: str, rel: str, tmproot: str) -> dict:
    path = os.path.join(QUERIES_ROOT, rel)
    sql = open(path).read().strip().rstrip(";")
    stem = os.path.basename(rel)[: -len(".sql")]
    tname = re.sub(r"_ddl\d*$", "", stem)
    sql = sql.replace("${0}", tname)
    # the reference harness maps `default.` to the test database
    # (QueryTestCaseBase replaces it); our staged fixtures are temp
    # views, which live outside any database
    sql = re.sub(r"\bdefault\.", "", sql, flags=re.IGNORECASE)
    low0 = sql.lower()
    kind = _statement_kind(sql)
    row = {"suite": suite, "file": rel, "kind": kind}

    pre: dict = {}
    try:
        if "${table.path}" in sql:
            m = _CREATE_NAME_RE.search(sql)
            created = (m.group(1).split(".")[-1] if m else tname)
            cols_m = re.search(r"\(([^()]*(?:\([^()]*\)[^()]*)*)\)", sql)
            try:
                cols = _split_cols(cols_m.group(1)) if cols_m else []
            except Exception:
                cols = []
            loc, staged = _stage_location(suite, created, low0, cols, tmproot)
            sql = sql.replace("${table.path}", f"'{loc}'")
            pre["staged_rows"] = staged
        else:
            # parse-only fixtures sometimes carry absolute/remote URIs;
            # rebase so the effect is still assertable locally
            def _rebase(m):
                safe = os.path.join(
                    tmproot, "rebase_" + re.sub(r"\W+", "_", m.group(1))[-40:]
                )
                os.makedirs(safe, exist_ok=True)
                return f"location '{safe}'"

            sql = re.sub(
                r"location\s+'((?:hdfs|s3|file)://[^']+|/[^']+)'",
                _rebase,
                sql,
                flags=re.IGNORECASE,
            )

        low = sql.lower()
        if kind in ("insert", "insert_overwrite"):
            mloc = re.search(
                r"into\s+location\s+'([^']+)'", sql, re.IGNORECASE
            )
            if mloc:
                pre["loc_path"] = mloc.group(1)
                pre["target"] = None
            else:
                m = re.search(
                    r"insert\s+(?:overwrite\s+)?into\s+(?:table\s+)?"
                    r"([\w.\"`]+)", low
                )
                target = m.group(1).strip('`"') if m else None
                pre["target"] = target
                if target:
                    try:
                        pre["count_before"] = probe.count(target)
                    except Exception:
                        pre["count_before"] = None
            pre["select_rows"] = _select_rows(eng, low)
        if kind == "ctas":
            pre["select_rows"] = _select_rows(eng, low)
            pre.pop("staged_rows", None)  # CTAS location holds output
        if kind in ("alter_add_part", "alter_drop_part"):
            m = re.search(r"alter\s+table\s+([\w.\"`]+)", low)
            try:
                pre["parts_before"] = probe.partitions(
                    m.group(1).strip('`"')
                )
            except Exception:
                pre["parts_before"] = None

        _ensure_prereqs(eng, probe, kind, low)
        try:
            eng.execute_script(sql)
        except Exception as exc:
            # several parse-only fixtures (and multi-location suites)
            # re-create a name an earlier file took — the reference
            # runs each test method in its own database
            if "ALREADY_EXISTS" in str(exc) and kind in ("create", "ctas"):
                m = _CREATE_NAME_RE.search(sql)
                eng.spark.sql(
                    f"DROP TABLE IF EXISTS {m.group(1)}"
                )
                eng.execute_script(sql)
            else:
                raise
        if rel in DDL_EXPECTED_REJECT:
            row.update(
                status="FAIL",
                note="validation golden executed without the expected "
                "rejection",
            )
            return row
        fail = _effect_check(kind, sql, probe, pre)
        if fail:
            row.update(status="FAIL", note=fail)
        else:
            row.update(status="executed-ok", note="")
    except Exception as exc:
        if rel in DDL_EXPECTED_REJECT:
            row.update(
                status="executed-ok",
                note="correctly rejected (the reference's own test "
                f"expects an exception): {str(exc).splitlines()[0][:90]}",
            )
            return row
        is_parse = (
            "ParseException" in type(exc).__name__
            or "PARSE_SYNTAX_ERROR" in str(exc)
        )
        if _is_gate(exc):
            row.update(
                status="gated", note=str(exc).splitlines()[0][:120]
            )
        elif suite == "TestSQLAnalyzer" and not is_parse:
            # parse-only corpus: the reference asserts the parse tree
            # only; a post-parse rejection here is within contract
            row.update(
                status="parse-only-reject",
                note=f"{type(exc).__name__}: "
                f"{str(exc).splitlines()[0][:120]}",
            )
        else:
            row.update(
                status="FAIL",
                note=f"{type(exc).__name__}: {str(exc).splitlines()[0][:160]}",
            )
    return row


if __name__ == "__main__":
    import json
    import sys

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import golden_audit as GA

    from tajo_spark.engine import Engine
    from tajo_spark.session import build_spark

    spark = build_spark(app_name="ddl_goldens")
    eng = Engine(spark)
    GA.stage(spark)
    ddl = GA.ddl_file_list()
    rows = run_ddl_corpus(eng, ddl)
    print(json.dumps(rows, indent=1))
    bad = [r for r in rows if r["status"] == "FAIL"]
    print(f"\n{len(rows)} files: "
          f"{sum(r['status'] == 'executed-ok' for r in rows)} ok, "
          f"{sum(r['status'] == 'gated' for r in rows)} gated, "
          f"{len(bad)} FAIL")
    for r in bad:
        print("FAIL", r["file"], "--", r["note"])
    spark.stop()
