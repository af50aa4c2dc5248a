"""Tajo-SQL → Spark-SQL dialect shim.

We deliberately do NOT reimplement the reference's 1,657-line ANTLR
grammar (tajo-sql-parser/.../SQLParser.g4): Spark SQL already parses
the shared ANSI surface, so the shim only rewrites the Tajo-isms that
Spark spells differently, then hands the statement to ``spark.sql``
(the same architectural split the survey recommends — SURVEY.md §7.0).

Covered rewrites:
  * type names (DataTypes.proto:25-97): INT4→INT, FLOAT8→DOUBLE,
    TEXT→STRING, BLOB→BINARY, ...
  * ``x SIMILAR TO 'pat'`` → ``x RLIKE '^(translated)$'`` with the same
    SQL-regex→Java-regex conversion the reference performs
    (tajo-plan/.../expr/SimilarToPredicateEval.java).
  * CREATE [EXTERNAL] TABLE ... USING <fmt> [WITH (...)] [LOCATION p]
    (SQLParser.g4:108-130) → Spark ``USING <fmt> OPTIONS (...)``;
    Tajo storage option keys (text.delimiter, ...) → Spark reader
    option names.
  * ``INSERT OVERWRITE INTO`` → ``INSERT OVERWRITE TABLE``.
  * session statements ``SET SESSION k TO v`` / ``SET TIME ZONE`` →
    handled by the Engine (returns a directive, not SQL).

Everything else (SELECT surface, joins, window frames, set ops,
subqueries, CTEs) passes through untouched — Spark's dialect is a
strict superset of what the reference executes (SURVEY.md §2.2-2.7).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# --- type names --------------------------------------------------------------
# DataTypes.proto:25-97 → Spark SQL DDL types (SURVEY.md §1.2 table).
TYPE_MAP = {
    "BOOL": "BOOLEAN",
    "INT1": "TINYINT",
    "INT2": "SMALLINT",
    "INT4": "INT",
    "INT8": "BIGINT",
    "FLOAT4": "FLOAT",
    "FLOAT8": "DOUBLE",
    "TEXT": "STRING",
    # VARCHAR/NVARCHAR/NCHAR live in _normalize_ansi_types (they take
    # optional length args a word-level map would clobber:
    # varchar(255) must become VARCHAR(255), never STRING(255))
    "BLOB": "BINARY",
    "VARBINARY": "BINARY",
    "BYTEA": "BINARY",
    "NUMERIC": "DECIMAL",
    "TIMESTAMPTZ": "TIMESTAMP",
    "TIMETZ": "STRING",
    # Native since Spark 4.1 behind spark.sql.timeType.enabled (set in
    # session.py) — closes the TIME->STRING divergence round 1 documented
    "TIME": "TIME",
    "RECORD": "STRUCT",
}

_TYPE_RE = re.compile(
    r"\b(" + "|".join(TYPE_MAP) + r")\b", re.IGNORECASE
)

# --- storage formats ---------------------------------------------------------
# BuiltinStorages.java:22-36 → Spark datasource names.
FORMAT_MAP = {
    "TEXT": "csv",
    "CSV": "csv",
    "JSON": "json",
    "PARQUET": "parquet",
    "ORC": "orc",
    "AVRO": "avro",
    "RCFILE": None,        # unsupported: no Spark datasource (documented)
    "SEQUENCEFILE": None,  # unsupported: Hadoop-RDD only (sources/hadoop.py)
    "RAW": "binaryFile",
    "REGEX": "text",       # read as lines; regex applied by sources/regex.py
}

# Tajo table-property keys (TEXT/JSON serde options) → Spark reader options.
OPTION_MAP = {
    "text.delimiter": "sep",
    "text.null": "nullValue",
    "text.skip.headerlines": "header",  # value "1" → header true
    "timezone": "timeZone",
    "compression.codec": "compression",
}


# Lossy type mappings: Spark's TIME type (4.1+, enabled in session.py)
# carries no zone offset, so TIMETZ columns become STRING — values
# round-trip textually ('12:34:56+09') but lose temporal arithmetic.
# Surfaced as a one-line warning per statement rather than a silent
# rewrite; COVERAGE.md lists it as a documented divergence, not parity.
# (Plain TIME is native as of round 2 — no longer lossy.)
_LOSSY_TYPES = frozenset({"TIMETZ"})


def _normalize_ansi_types(sql: str) -> str:
    """ANSI multi-word / parameterized type spellings the reference
    parser accepts (SQLParser.g4 data_type rules, exercised by
    TestCreateTable/create_table_various_types.sql) → Spark spellings.
    Runs BEFORE the word-level TYPE_MAP so e.g. ``varchar(255)`` maps
    to ``VARCHAR(255)`` instead of the bare-``varchar``→STRING rule
    producing the unparseable ``STRING(255)``."""
    rules = [
        # multi-word first (longest match wins)
        (r"national\s+character\s+varying\s*\(\s*\d+\s*\)", "STRING"),
        (r"national\s+character\s+varying", "STRING"),
        (r"national\s+character\s*\(\s*(\d+)\s*\)", r"CHAR(\1)"),
        (r"national\s+character", "CHAR(1)"),
        (r"character\s+varying\s*\(\s*(\d+)\s*\)", r"VARCHAR(\1)"),
        (r"character\s+varying", "STRING"),
        (r"double\s+precision", "DOUBLE"),
        # bit/binary spellings → BINARY (length is storage advice Tajo
        # ignores too); zoned time/timestamp per the TIMETZ/TIMESTAMPTZ
        # lowering documented in COVERAGE.md
        (r"\bbit\s+varying\s*(\(\s*\d+\s*\))?", "BINARY"),
        (r"\bbinary\s+varying\s*(\(\s*\d+\s*\))?", "BINARY"),
        (r"\bvarbinary\s*(\(\s*\d+\s*\))?", "BINARY"),
        (r"\bbinary\s*\(\s*\d+\s*\)", "BINARY"),
        (r"\bbit\s*\(\s*\d+\s*\)", "BINARY"),
        (r"\bbit\b", "BINARY"),
        (r"\btime\s+with\s+time\s+zone", "STRING"),
        (r"\btimestamp\s+with\s+time\s+zone", "TIMESTAMP"),
        # parameterized single words whose bare TYPE_MAP target takes
        # no argument
        (r"\bn?varchar\s*\(\s*(\d+)\s*\)", r"VARCHAR(\1)"),
        (r"\bnchar\s*\(\s*(\d+)\s*\)", r"CHAR(\1)"),
        (r"\bcharacter\s*\(\s*(\d+)\s*\)", r"CHAR(\1)"),
        (r"\bchar\s*\(\s*(\d+)\s*\)", r"CHAR(\1)"),
        (r"\bfloat\s*\(\s*\d+\s*\)", "DOUBLE"),  # ANSI float(p>24)
        # bare forms Spark can't parse without a length
        (r"\bcharacter\b(?!\s*\()", "CHAR(1)"),
        (r"\bchar\b(?!\s*\()", "CHAR(1)"),
        (r"\bnchar\b(?!\s*\()", "CHAR(1)"),
        (r"\bnvarchar\b(?!\s*\()", "STRING"),
        (r"\bvarchar\b(?!\s*\()", "STRING"),
    ]
    for pat, rep in rules:
        sql = re.sub(pat, rep, sql, flags=re.IGNORECASE)
    return sql


def translate_type_names(sql: str) -> str:
    sql = _normalize_ansi_types(sql)
    lossy = {
        m.group(1).upper()
        for m in _TYPE_RE.finditer(sql)
        if m.group(1).upper() in _LOSSY_TYPES
    }
    if lossy:
        import warnings

        warnings.warn(
            f"Tajo type(s) {sorted(lossy)} have no Spark equivalent and "
            "map to STRING (text round-trip only; temporal arithmetic "
            "is lost) — see COVERAGE.md",
            stacklevel=3,
        )
    return _TYPE_RE.sub(lambda m: TYPE_MAP[m.group(1).upper()], sql)


# --- SIMILAR TO --------------------------------------------------------------
def sql_regex_to_java(pat: str) -> str:
    """SQL-standard regex (SIMILAR TO) → Java regex, the same conversion
    the reference applies (SimilarToPredicateEval.java): % → .*, _ → .,
    while [...] classes and (|) groups already align."""
    out = []
    i = 0
    in_class = False
    while i < len(pat):
        c = pat[i]
        if c == "\\" and i + 1 < len(pat):
            out.append(pat[i : i + 2])
            i += 2
            continue
        if c == "[":
            in_class = True
            out.append(c)
        elif c == "]":
            in_class = False
            out.append(c)
        elif not in_class and c == "%":
            out.append(".*")
        elif not in_class and c == "_":
            out.append(".")
        elif not in_class and c == ".":
            out.append("\\.")
        else:
            out.append(c)
        i += 1
    return "".join(out)


_SIMILAR_RE = re.compile(
    r"(\bNOT\s+)?\bSIMILAR\s+TO\s+'((?:[^']|'')*)'", re.IGNORECASE
)


def translate_similar_to(sql: str) -> str:
    def repl(m: re.Match) -> str:
        neg = "NOT " if m.group(1) else ""
        return f"{neg}RLIKE '^(?:{sql_regex_to_java(m.group(2))})$'"

    return _SIMILAR_RE.sub(repl, sql)


# --- DDL ---------------------------------------------------------------------
# --- CTAS declared-schema domain check ---------------------------------------
# Tajo's assignability matrix (CatalogUtil.java OPERATION_CASTING_MAP,
# consumed by LogicalPlanVerifier.ensureDomains:243): source type →
# the target types a CTAS/INSERT position may carry it into.  Absent
# pairs (TEXT → INT8, BOOLEAN → TEXT, ...) are DataTypeMismatch errors
# in the reference — golden: TestCreateTable/negative/type_mismatch.
_NUM_TARGETS = {"INT1", "INT2", "INT4", "INT8", "FLOAT4", "FLOAT8",
                "TEXT"}
TAJO_CASTABLE: dict[str, set[str]] = {
    "BOOLEAN": {"BOOLEAN"},
    "INT1": set(_NUM_TARGETS),
    "INT2": set(_NUM_TARGETS),
    "INT4": set(_NUM_TARGETS),
    "INT8": set(_NUM_TARGETS),
    "FLOAT4": set(_NUM_TARGETS),
    "FLOAT8": set(_NUM_TARGETS),
    "TEXT": {"TEXT", "VARCHAR", "TIMESTAMP"},
    "VARCHAR": {"TEXT", "VARCHAR", "TIMESTAMP"},
    "DATE": {"DATE", "TIME", "INTERVAL"},
    "TIME": {"TIME", "DATE"},
    "TIMESTAMP": {"TIMESTAMP", "TEXT", "VARCHAR"},
    "INTERVAL": {"DATE"},
}

# Spark type words (declared-list text after translate_column_defs,
# and DataType.simpleString() prefixes) → Tajo type names
_SPARK_TO_TAJO_TYPE = {
    "string": "TEXT", "varchar": "VARCHAR", "char": "TEXT",
    "bigint": "INT8", "int": "INT4", "integer": "INT4",
    "smallint": "INT2", "tinyint": "INT1",
    "float": "FLOAT4", "real": "FLOAT4", "double": "FLOAT8",
    "boolean": "BOOLEAN", "date": "DATE", "time": "TIME",
    "timestamp": "TIMESTAMP", "timestamp_ntz": "TIMESTAMP",
    "void": "NULL",
}


def tajo_type_of(spark_type_text: str) -> str | None:
    """'DOUBLE' / 'varchar(12)' / 'interval day to second' → Tajo type
    name, or None for types outside the matrix (no check applies)."""
    w = spark_type_text.strip().lower()
    if w.startswith("interval"):
        return "INTERVAL"
    w = re.split(r"[(\s]", w, 1)[0]
    return _SPARK_TO_TAJO_TYPE.get(w)


class CtasDataTypeMismatch(ValueError):
    """Tajo DataTypeMismatchException analogue (SyntaxErrorUtil
    .makeDataTypeMisMatch) for CTAS declared-schema positions."""


# side channel: translate_create_table stashes (declared_types,
# select_sql) here; Engine.execute_sql pops it and replays
# ensureDomains against the analyzed select schema before executing
_PENDING_CTAS_CHECK: list[tuple[list[str | None], str]] = []


def pop_ctas_check() -> tuple[list[str | None], str] | None:
    return _PENDING_CTAS_CHECK.pop() if _PENDING_CTAS_CHECK else None


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(EXTERNAL\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[\w.`\"]+)\s*(?P<cols>\([^)]*\))?\s*"
    r"(?:TABLESPACE\s+(?P<tspace>[\w`\"]+))?\s*"
    r"(?:USING\s+(?P<fmt>\w+))?\s*"
    r"(?:WITH\s*\((?P<opts>[^)]*)\))?\s*"
    r"(?:PARTITION\s+BY\s+COLUMN\s*\((?P<parts>[^)]*)\))?\s*"
    r"(?:LOCATION\s+'(?P<loc>[^']*)')?\s*(?P<asq>AS\s+.*)?$",
    re.IGNORECASE | re.DOTALL,
)


def _translate_options(opts: str) -> str:
    """``'text.delimiter'='|', ...`` → Spark OPTIONS body."""
    pairs = re.findall(r"'([^']+)'\s*=\s*'([^']*)'", opts)
    out = []
    for k, v in pairs:
        sk = OPTION_MAP.get(k.lower(), k)
        if sk == "header":
            v = "true" if v.strip() not in ("", "0") else "false"
        out.append(f"'{sk}'='{v}'")
    return ", ".join(out)


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren/angle depth 0."""
    parts, buf, depth = [], [], 0
    for c in s:
        if c in "(<":
            depth += 1
        elif c in ")>":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
    if buf:
        parts.append("".join(buf))
    return parts


def convert_record_types(cols: str) -> str:
    """Tajo nested-record DDL → Spark struct DDL:
    ``name RECORD (a TEXT, b RECORD (c TEXT))`` →
    ``name STRUCT<a: STRING, b: STRUCT<c: STRING>>`` (recursively).
    Reference: queries/TestSelectNestedRecord/sample0_ddl.sql:1."""
    out: list[str] = []
    i = 0
    while i < len(cols):
        m = re.match(r"RECORD\s*\(", cols[i:], re.IGNORECASE)
        if m:
            start = i + m.end()
            depth, j = 1, start
            while j < len(cols) and depth:
                if cols[j] == "(":
                    depth += 1
                elif cols[j] == ")":
                    depth -= 1
                j += 1
            inner = convert_record_types(cols[start : j - 1])
            fields = []
            for f in _split_top_level(inner):
                name, typ = f.strip().split(None, 1)
                fields.append(f"{name}: {typ}")
            out.append("STRUCT<" + ", ".join(fields) + ">")
            i = j
        else:
            out.append(cols[i])
            i += 1
    return "".join(out)


def _extract_column_list(sql: str) -> tuple[str, str | None]:
    """Pull the balanced (...) column list out of a CREATE TABLE head so
    nested RECORD parens don't confuse the statement regex. Returns
    (sql_with_placeholder, cols) — cols None when schemaless (CTAS /
    self-describing)."""
    head = re.match(
        r"^\s*CREATE\s+(?:EXTERNAL\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
        r"[\w.`\"]+\s*",
        sql,
        re.IGNORECASE,
    )
    if not head or head.end() >= len(sql) or sql[head.end()] != "(":
        return sql, None
    depth, j = 0, head.end()
    while j < len(sql):
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
            if depth == 0:
                break
        j += 1
    cols = sql[head.end() + 1 : j]
    return sql[: head.end()] + "(#COLS#)" + sql[j + 1 :], cols


def translate_column_defs(cols: str) -> str:
    """Translate type names per column definition, touching only the
    part after the column name — a column literally named ``text`` or
    ``time`` must not be rewritten."""
    out = []
    for field in _split_top_level(cols):
        f = field.strip()
        if not f:
            continue
        bits = f.split(None, 1)
        if len(bits) == 2:
            out.append(f"{bits[0]} {translate_type_names(bits[1])}")
        else:
            out.append(f)
    return ", ".join(out)


def translate_create_table(sql: str) -> str:
    original = sql.strip().rstrip(";")
    if re.search(r"PARTITION\s+BY\s+(HASH|LIST|RANGE)\b", original,
                 re.IGNORECASE):
        # the reference PARSES these (CreateTableNode carries the
        # method) but has no executor for them — COLUMN partitioning
        # is the one implemented method on both engines
        raise NotImplementedError(
            "HASH/LIST/RANGE table partitioning is parse-only in the "
            "reference and unimplemented here; use PARTITION BY COLUMN"
        )
    if re.search(r"\(\s*\*\s*\)", original):
        raise NotImplementedError(
            "self-describing (schemaless) CREATE TABLE (*) is gated: "
            "Spark tables declare a schema; self-describing JSON is "
            "read via inferred-schema views (sources/formats.py)"
        )
    sql, cols_body = _extract_column_list(original)
    m = _CREATE_RE.match(sql)
    if not m:
        return original  # never leak the (#COLS#) placeholder
    loc = m.group("loc")
    if m.group("tspace"):
        # named tablespace: resolve via the registry exactly like
        # TablespaceManager.getByName — an unknown name is a semantic
        # error (UndefinedTablespaceException), a known one roots the
        # table under the space's URI
        from tajo_spark.sources.tablespace import named_tablespace_root

        root = named_tablespace_root(m.group("tspace").strip('`"'))
        if root and not loc:
            tbl = m.group("name").strip('`"').split(".")[-1]
            loc = f"{root.rstrip('/')}/{tbl}"
    if m.group(1) and not loc:
        # reference parity: TestQueryValidation.java:84 expects
        # "LOCATION clause must be required for an external table"
        raise ValueError(
            "LOCATION clause must be required for an external table"
        )
    fmt = (m.group("fmt") or "PARQUET").upper()
    if fmt == "RAW" and not m.group(1):
        # managed CREATE ... USING RAW: the reference rejects RAW as a
        # store format (TestQueryValidation/invalid_store_format.sql)
        # and Spark's binaryFile source is read-only anyway
        raise ValueError("RAW is not a writable store format")
    spark_fmt = FORMAT_MAP.get(fmt, fmt.lower())
    if spark_fmt is None:
        raise NotImplementedError(
            f"storage format {fmt} has no Spark datasource "
            "(BuiltinStorages.java parity gap; see sources/)"
        )
    cols_sql = ""
    if cols_body is not None:
        cols_sql = "(" + translate_column_defs(
            convert_record_types(cols_body)
        ) + ")"
        if spark_fmt in ("csv", "json", "text"):
            # Spark's native TIME type has no csv/json writer; the
            # reference stores TIME textually in these formats too
            cols_sql = re.sub(
                r"\bTIME\b(?!STAMP)", "STRING", cols_sql
            )
    part_names: list[str] = []
    if m.group("parts"):
        # Tajo: PARTITION BY COLUMN (c TYPE, ...) declares partition
        # columns OUTSIDE the main column list (CreateTableNode appends
        # them to the table schema); Spark datasource tables want the
        # defs in the schema and names-only in PARTITIONED BY — so fold
        # typed defs into the column list
        part_defs = [
            c.strip()
            for c in _split_top_level(m.group("parts"))
            if c.strip()
        ]
        part_names = [d.split()[0] for d in part_defs]
        typed = [d for d in part_defs if len(d.split(None, 1)) == 2]
        if cols_sql and typed:
            cols_sql = (
                cols_sql[:-1]
                + ", "
                + translate_column_defs(", ".join(typed))
                + ")"
            )
    if m.group("asq") and cols_sql:
        # Tajo CTAS with a declared column list: the list RENAMES (and
        # retypes) the select outputs POSITIONALLY — data columns
        # first, partition columns after (CreateTableNode appends
        # them), matching the select's arity.  Spark forbids a schema
        # clause on CTAS, so rebuild as a projecting subquery with a
        # positional column-alias list.  The retype is NOT a free
        # cast: LogicalPlanVerifier.ensureDomains checks each
        # positional (select-type → declared-type) pair against
        # CatalogUtil.OPERATION_CASTING_MAP and rejects incompatible
        # ones (e.g. TEXT → INT8) — the Engine replays that check via
        # pop_ctas_check() before executing.
        all_defs = [
            d.strip()
            for d in _split_top_level(cols_sql[1:-1])
            if d.strip()
        ]
        names, types = [], []
        for d in all_defs:
            bits = d.split(None, 1)
            names.append(bits[0].strip('`"'))
            types.append(bits[1].strip() if len(bits) > 1 else None)
        alias = ", ".join(f"__c{i}" for i in range(len(all_defs)))
        proj = ", ".join(
            (
                f"CAST(__c{i} AS {t}) AS `{nm}`"
                if t
                else f"__c{i} AS `{nm}`"
            )
            for i, (nm, t) in enumerate(zip(names, types))
        )
        sel = re.sub(
            r"^\s*as\s+", "", m.group("asq"), flags=re.IGNORECASE
        )
        sel = shared_expression_rewrites(translate_type_names(sel))
        parts = [
            "CREATE TABLE",
            m.group(2) or "",
            m.group("name"),
            f"USING {spark_fmt}",
        ]
        if m.group("opts"):
            parts.append(
                f"OPTIONS ({_translate_options(m.group('opts'))})"
            )
        if part_names:
            parts.append(f"PARTITIONED BY ({', '.join(part_names)})")
        if loc:
            parts.append(f"LOCATION '{loc}'")
        parts.append(
            f"AS SELECT {proj} FROM ({sel}) __tajo_ctas({alias})"
        )
        _PENDING_CTAS_CHECK.append((list(types), sel))
        return " ".join(p for p in parts if p)
    parts = [
        "CREATE TABLE",
        m.group(2) or "",
        m.group("name"),
        cols_sql,
        f"USING {spark_fmt}",
    ]
    if m.group("opts"):
        parts.append(f"OPTIONS ({_translate_options(m.group('opts'))})")
    if part_names:
        parts.append(f"PARTITIONED BY ({', '.join(part_names)})")
    if loc:
        parts.append(f"LOCATION '{loc}'")
    if m.group("asq"):
        parts.append(
            shared_expression_rewrites(
                translate_type_names(m.group("asq"))
            )
        )
    return " ".join(p for p in parts if p)


# --- session statements ------------------------------------------------------
@dataclass(frozen=True)
class SessionDirective:
    """A statement the Engine applies to session state instead of Spark SQL."""

    kind: str  # "set" | "unset" | "timezone"
    key: str | None = None
    value: str | None = None


_SET_RE = re.compile(
    r"^\s*SET\s+SESSION\s+(\w+)\s+(?:(?:TO|=)\s+)?(.+?)\s*;?\s*$",
    re.IGNORECASE,
)
_UNSET_RE = re.compile(r"^\s*SET\s+SESSION\s+(\w+)\s+TO\s+DEFAULT\s*;?\s*$",
                       re.IGNORECASE)
_TZ_RE = re.compile(r"^\s*SET\s+TIME\s*ZONE\s+(?:TO\s+)?'?([^';]+)'?\s*;?\s*$",
                    re.IGNORECASE)
_CATALOG_RE = re.compile(
    r"^\s*SET\s+CATALOG\s+(?:\"([^\"]+)\"|'([^']+)'|(\w+))\s*;?\s*$",
    re.IGNORECASE,
)

# Tajo accepts bare timezone abbreviations (SET TIME ZONE 'PDT',
# TestSQLAnalyzer/settimezone*.sql); Java rejects most of them — map
# each onto its FIXED offset (an abbreviation denotes one offset;
# mapping to a DST-observing region id would drift an hour in summer).
TZ_ABBREVIATIONS = {
    "PST": "-08:00", "PDT": "-07:00",
    "MST": "-07:00", "MDT": "-06:00",
    "CST": "-06:00", "CDT": "-05:00",
    "EST": "-05:00", "EDT": "-04:00",
    "GMT": "UTC", "KST": "+09:00", "JST": "+09:00",
}


def parse_session_statement(sql: str) -> SessionDirective | None:
    if m := _UNSET_RE.match(sql):
        return SessionDirective("unset", key=m.group(1).upper())
    if m := _SET_RE.match(sql):
        return SessionDirective(
            "set", key=m.group(1).upper(), value=m.group(2).strip().strip("'")
        )
    if m := _TZ_RE.match(sql):
        tz = m.group(1)
        if tz.strip().upper() == "DEFAULT":
            return SessionDirective("timezone", value=None)
        return SessionDirective(
            "timezone", value=TZ_ABBREVIATIONS.get(tz.upper(), tz)
        )
    if m := _CATALOG_RE.match(sql):
        # Tajo's single catalog maps onto Spark's current database
        return SessionDirective(
            "catalog", value=m.group(1) or m.group(2) or m.group(3)
        )
    return None


# CREATE INDEX name ON table (col [ASC|DESC], ...) [USING method]
# (SQLParser.g4 index_statement; StoreIndexExec.java:39 builds the BST
# file, AccessPathRewriter.java:39 consumes it). The Spark-first
# equivalent is a key-clustered data rewrite — parsed here, executed by
# Engine.create_index.
_CREATE_INDEX_RE = re.compile(
    r"^\s*CREATE\s+INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[A-Za-z_]\w*)"
    r"\s+ON\s+(?P<table>[A-Za-z_][\w.]*)\s*\((?P<cols>[^)]*)\)"
    r"(?:\s+USING\s+(?P<method>\w+))?\s*$",
    re.IGNORECASE,
)
_DROP_INDEX_RE = re.compile(
    r"^\s*DROP\s+INDEX\s+(?:IF\s+EXISTS\s+)?(?P<name>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)


@dataclass(frozen=True)
class IndexStatement:
    kind: str  # "create" | "drop"
    name: str
    table: str | None = None
    # (column, ascending) pairs in declaration order
    cols: tuple[tuple[str, bool], ...] = ()


def parse_index_statement(sql: str) -> IndexStatement | None:
    s = sql.strip().rstrip(";")
    if m := _CREATE_INDEX_RE.match(s):
        cols = []
        for item in m.group("cols").split(","):
            bits = item.split()
            if not bits:
                continue
            if not re.fullmatch(r"[A-Za-z_]\w*", bits[0]):
                # expression index (TestCreateIndex
                # testCreateIndexOnExpression/-MultiExprs): the
                # BST-index analogue clusters STORAGE by columns
                # (engine.create_index); an expression key would need
                # a materialized column first — documented gate
                raise NotImplementedError(
                    "expression CREATE INDEX is not supported: the "
                    "index analogue clusters storage by columns; "
                    "materialize the expression as a column first"
                )
            asc = not (len(bits) > 1 and bits[1].upper() == "DESC")
            cols.append((bits[0], asc))
        if not cols:
            raise ValueError("CREATE INDEX requires at least one column")
        return IndexStatement(
            "create", m.group("name"), m.group("table"), tuple(cols)
        )
    if re.match(r"^\s*CREATE\s+INDEX\b", s, re.IGNORECASE):
        # CREATE INDEX shapes beyond the column-list grammar (partial
        # WHERE indexes) — same documented gate as expression keys
        raise NotImplementedError(
            "partial/conditional CREATE INDEX is not supported "
            "(column-list indexes only; engine.create_index)"
        )
    if m := _DROP_INDEX_RE.match(s):
        return IndexStatement("drop", m.group("name"))
    return None


_INSERT_OVERWRITE_RE = re.compile(
    r"\bINSERT\s+OVERWRITE\s+INTO\b", re.IGNORECASE
)

# INSERT [OVERWRITE] INTO LOCATION 'path' [USING fmt] — path-target
# inserts (InsertNode, LogicalPlanner.java:1589-1610) → Spark
# INSERT OVERWRITE DIRECTORY 'path' USING fmt
_INSERT_LOCATION_RE = re.compile(
    r"^\s*INSERT\s+(?:OVERWRITE\s+)?INTO\s+LOCATION\s+'(?P<loc>[^']+)'"
    r"(?:\s+USING\s+(?P<fmt>\w+))?"
    r"(?:\s+WITH\s*\((?P<opts>[^)]*)\))?\s+(?P<body>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def translate_insert_location(sql: str) -> str | None:
    m = _INSERT_LOCATION_RE.match(sql)
    if not m:
        return None
    fmt = (m.group("fmt") or "PARQUET").upper()
    spark_fmt = FORMAT_MAP.get(fmt, fmt.lower())
    if spark_fmt is None:
        raise NotImplementedError(f"format {fmt} unsupported on Spark")
    opts = ""
    if m.group("opts"):
        # WITH ('text.delimiter'='|','compression.codec'='...Codec')
        # → OPTIONS(...); Spark's compression option accepts codec
        # class names as well as short names
        opts = f"OPTIONS ({_translate_options(m.group('opts'))}) "
    return (
        f"INSERT OVERWRITE DIRECTORY '{m.group('loc')}' "
        f"USING {spark_fmt} {opts}{m.group('body')}"
    )

# --- to_char PostgreSQL format codes ----------------------------------------
_PG_CODES = ("YYYY", "HH24", "HH12", "MI", "DD", "DY", "MS")


def _translate_to_char_formats(sql: str) -> str:
    """Rewrite the *format literal* of ``to_char(expr, 'PG_FMT')`` calls
    to Java datetime patterns (ToCharTimestamp.java uses PostgreSQL codes;
    Spark's native to_char wants SimpleDateFormat). Balanced-paren scan so
    expressions containing quotes/commas (``timestamp '...'``) survive."""
    from tajo_spark.functions.registry import pg_format_to_java

    out = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find("to_char", i)
        if j < 0:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        # find the matching close paren
        k = sql.find("(", j)
        if k < 0:
            out.append(sql[j:])
            break
        depth, p, in_str = 0, k, False
        while p < len(sql):
            c = sql[p]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            p += 1
        call = sql[j : p + 1]
        m = re.search(r"'([^']*)'\s*\)$", call)
        if m and any(code in m.group(1) for code in _PG_CODES):
            call = (
                call[: m.start(1)]
                + pg_format_to_java(m.group(1))
                + call[m.end(1) :]
            )
        out.append(call)
        i = p + 1
    return "".join(out)


# --- PostgreSQL-style encode/decode codecs ----------------------------------
# Encode.java/Decode.java: encode(data, 'base64'|'hex'|'escape') — Spark's
# builtin encode/decode are CHARSET conversions and shadow any session
# function of the same name (system.builtin precedes system.session on the
# resolution path), so the codec forms must be rewritten at dialect level.
_CODEC_REWRITE = {
    ("encode", "base64"): "base64(CAST({0} AS BINARY))",
    ("encode", "hex"): "lower(hex(CAST({0} AS BINARY)))",
    ("decode", "base64"): "CAST(unbase64({0}) AS STRING)",
    ("decode", "hex"): "CAST(unhex({0}) AS STRING)",
    # 'escape' is DOCUMENTED in Encode.java/Decode.java but their
    # implementations return NULL for it (the trailing else branch,
    # Encode.java:92-93) — a typed NULL is exact reference parity, and
    # beats falling through to Spark's charset builtin, which would
    # error on the unknown charset 'escape'
    ("encode", "escape"): "CAST(NULL AS STRING)",
    ("decode", "escape"): "CAST(NULL AS STRING)",
}


def _translate_pg_codec(sql: str) -> str:
    """Rewrite ``encode(expr, 'codec')`` / ``decode(expr, 'codec')``
    calls (same balanced-paren scan as the to_char rewrite; charset
    forms — any second argument that is not a known codec literal —
    pass through to Spark's builtins untouched)."""
    for fname in ("encode", "decode"):
        out: list[str] = []
        i = 0
        low = sql.lower()
        while True:
            j = low.find(fname, i)
            if j < 0:
                out.append(sql[i:])
                break
            # must be a standalone identifier followed by '('
            before_ok = j == 0 or not (sql[j - 1].isalnum() or sql[j - 1] == "_")
            k = sql.find("(", j)
            if not before_ok or k < 0 or sql[j + len(fname):k].strip():
                out.append(sql[i : j + len(fname)])
                i = j + len(fname)
                continue
            out.append(sql[i:j])
            depth, p, in_str = 0, k, False
            while p < len(sql):
                c = sql[p]
                if in_str:
                    if c == "'":
                        in_str = False
                elif c == "'":
                    in_str = True
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
                p += 1
            call = sql[j : p + 1]
            m = re.fullmatch(
                rf"{fname}\s*\(\s*(?P<arg>.*?)\s*,\s*'(?P<codec>\w+)'\s*\)",
                call,
                re.IGNORECASE | re.DOTALL,
            )
            tmpl = m and _CODEC_REWRITE.get((fname, m.group("codec").lower()))
            if tmpl:
                out.append(tmpl.format(_translate_pg_codec(m.group("arg"))))
            else:
                out.append(call)
            i = p + 1
        sql = "".join(out)
    return sql


# Single-quoted SQL string literal (with '' escapes) — segments the
# statement so structural rewrites never touch string data.
_SQSTRING_RE = re.compile(r"'(?:[^']|'')*'")
# one-pass lexer alternation: a '...' literal OR a `...` quoted
# identifier (`` escapes a backtick, as translate_quoted_identifiers
# emits). Left-to-right matching means whichever opens first wins —
# so a backtick inside a literal, or an apostrophe inside a quoted
# identifier (SELECT "o'brien" → `o'brien`, ADVICE r08), never opens
# a phantom span.
_QUOTED_SPAN_RE = re.compile(r"'(?:[^']|'')*'|`(?:[^`]|``)*`")


def _outside_strings(sql: str, fn) -> str:
    """Apply ``fn`` to every segment of ``sql`` that lies outside
    single-quoted string literals and backtick-quoted identifiers
    (both pass through verbatim — rewrites must touch neither literal
    text nor identifier names)."""
    out, last = [], 0
    for m in _QUOTED_SPAN_RE.finditer(sql):
        out.append(fn(sql[last : m.start()]))
        out.append(m.group(0))
        last = m.end()
    out.append(fn(sql[last:]))
    return "".join(out)


# ANSI double-quoted identifiers ("lineitem".l_orderkey) → backticks.
# Tajo treats double quotes strictly as identifier quoting (ANSI), so
# every double-quoted run outside a single-quoted string is an
# identifier; Spark's default parser reads them as string literals.
# A doubled "" inside the identifier is the ANSI escape for one ".
_DQUOTED_RE = re.compile(r"\"((?:[^\"]|\"\")*)\"")


def translate_quoted_identifiers(sql: str) -> str:
    def seg(s: str) -> str:
        return _DQUOTED_RE.sub(
            lambda m: "`"
            + m.group(1).replace('""', '"').replace("`", "``")
            + "`",
            s,
        )

    return _outside_strings(sql, seg)


def _matching_paren(sql: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at ``open_idx``."""
    depth, j = 1, open_idx + 1
    while j < len(sql) and depth:
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
        j += 1
    return j


# Ranking window functions Tajo evaluates without ORDER BY (arbitrary
# intra-partition order, WindowAggExec); Spark requires an ordered
# window — inject the constant ORDER BY 1, which Spark accepts and
# which reproduces "arbitrary order" semantics. The argument list is
# matched with a balanced scan so nested parens (ntile(cast(4 as int)))
# don't escape the rewrite; OVER <window-name> forms are out of scope.
_RANKING_FN_RE = re.compile(
    r"\b(?:row_number|rank|dense_rank|percent_rank|cume_dist|ntile)\s*\(",
    re.IGNORECASE,
)
_OVER_RE = re.compile(r"\s*OVER\s*\(", re.IGNORECASE)


def _rewrite_over_bodies(sql: str, fn_re: re.Pattern, rewrite) -> str:
    """For every ``<fn>(args) OVER (body)`` where the function name
    matches ``fn_re``, replace body with ``rewrite(body)`` (balanced
    paren scan; None = leave unchanged)."""
    edits: list[tuple[int, int, str]] = []
    for m in fn_re.finditer(sql):
        args_end = _matching_paren(sql, m.end() - 1)
        over = _OVER_RE.match(sql, args_end)
        if not over:
            continue
        start = over.end()
        j = _matching_paren(sql, start - 1)
        new_body = rewrite(sql[start : j - 1])
        if new_body is not None:
            edits.append((start, j - 1, new_body))
    for s_, e_, rep in reversed(edits):
        sql = sql[:s_] + rep + sql[e_:]
    return sql


# A frame clause starts with ROWS|RANGE followed by a frame token —
# anchoring on the follower keeps a column literally named "rows" or
# "range" in the ORDER BY out of reach.
_FRAME_RE = re.compile(
    r"\b(?:ROWS|RANGE)\s+(?:BETWEEN|UNBOUNDED|CURRENT|\d).*$",
    re.IGNORECASE | re.DOTALL,
)


def _strip_trailing_frame(body: str) -> str:
    return _FRAME_RE.sub("", body)


def inject_window_order(sql: str) -> str:
    def rw(body: str):
        # Tajo IGNORES a frame clause on ranking functions (ordered
        # functions special-case, WindowAggExec.java:125-131); Spark
        # REJECTS one — strip it.
        stripped = _strip_trailing_frame(body)
        if re.search(r"\bORDER\s+BY\b", stripped, re.IGNORECASE):
            return stripped if stripped != body else None
        return stripped + (" " if stripped.strip() else "") + "ORDER BY 1"

    return _rewrite_over_bodies(sql, _RANKING_FN_RE, rw)


_WINDOW_CLAUSE_RE = re.compile(r"\bWINDOW\s+(\w+)\s+AS\s*\(", re.IGNORECASE)


def inline_named_windows(sql: str) -> str:
    """Replace every named-window reference (``OVER (w)`` / ``OVER w``)
    with its full definition inline, and drop the WINDOW clause.

    Each usage then carries its own copy of the spec, so the ranking
    (strip frame, ensure ORDER BY) and aggregate (force Tajo default
    frame) rewrites that follow apply per-usage — mixed ranking +
    aggregate users of one named window each get correct treatment,
    which no shared-definition edit could provide.
    """
    m = _WINDOW_CLAUSE_RE.search(sql)
    if not m:
        return sql
    # parse the comma-separated definition list: WINDOW w1 AS (..)[, w2 AS (..)]*
    defs: dict[str, str] = {}
    clause_start = m.start()
    pos = m.start()
    pat = re.compile(r"\s*(\w+)\s+AS\s*\(", re.IGNORECASE)
    pos = clause_start + len("WINDOW")
    while True:
        dm = pat.match(sql, pos)
        if not dm:
            break
        open_idx = dm.end() - 1
        close = _matching_paren(sql, open_idx)
        defs[dm.group(1).lower()] = sql[dm.end() : close - 1]
        pos = close
        cm = re.match(r"\s*,", sql[pos:])
        if not cm:
            break
        pos += cm.end()
    clause_end = pos
    body = sql[:clause_start] + sql[clause_end:]

    def sub_ref(mm: re.Match) -> str:
        name = (mm.group(1) or mm.group(2)).lower()
        if name in defs:
            return f"OVER ({defs[name]})"
        return mm.group(0)

    return re.sub(
        r"\bOVER\s*(?:\(\s*(\w+)\s*\)|(?!\s*\()\s+(\w+)\b)",
        sub_ref,
        body,
        flags=re.IGNORECASE,
    )


# Aggregate functions over an ORDER BY window with no explicit frame:
# Tajo's plan-level default frame is UNBOUNDED PRECEDING → UNBOUNDED
# FOLLOWING (tajo-plan/.../logical/WindowSpec.java:82-83 — whole
# partition), while Spark's ANSI default is RANGE → CURRENT ROW
# (running). Force Tajo's frame explicitly so `sum(x) OVER (ORDER BY
# y)` means the partition total, as it does on the reference
# (SURVEY.md §7.3.2). Ranking/offset functions are untouched — the
# reference executor special-cases ordered functions
# (WindowAggExec.java:125-131).
_AGG_FN_RE = re.compile(
    r"\b(?:sum|avg|count|min|max|stddev|stddev_pop|stddev_samp|"
    r"variance|var_pop|var_samp|first_value|last_value)\s*\(",
    re.IGNORECASE,
)
_TAJO_DEFAULT_FRAME = (
    " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
)


def force_tajo_window_frames(sql: str) -> str:
    def rw(body: str):
        if not re.search(r"\bORDER\s+BY\b", body, re.IGNORECASE):
            return None  # same default both engines: whole partition
        if re.search(r"\b(ROWS|RANGE)\b", body, re.IGNORECASE):
            return None  # explicit frame: user said what they meant
        return body + _TAJO_DEFAULT_FRAME

    return _rewrite_over_bodies(sql, _AGG_FN_RE, rw)


# ---------------------------------------------------------------------------
# Name-resolution laxity recovery. Tajo's resolver accepts two things
# ANSI/Spark reject (tajo-plan/.../nameresolver/NameResolver.java):
#   1. a SELECT-list alias referenced in that block's WHERE clause
#      (queries/TestSelectQuery/testWhereCond1.sql), and
#   2. the original table name used as a qualifier although the FROM
#      clause aliased the table (TestSortQuery/testSortWithAlias2.sql).
# The Engine applies these rewrites ONLY after Spark raises
# UNRESOLVED_COLUMN — never on the happy path, so conforming queries
# are untouched.
# ---------------------------------------------------------------------------

_RESERVED_ALIAS = frozenset(
    """select from where group order having union intersect except limit
    join inner left right full cross natural on as and or not in like
    between case when then else end distinct all by asc desc nulls
    using values window over partition lateral""".split()
)

_AS_ALIAS_RE = re.compile(
    r"^(.*\S)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", re.IGNORECASE | re.DOTALL
)


def _mask_string_bodies(sql: str) -> str:
    """Same length as ``sql`` with the bodies of string literals AND
    backtick-quoted identifiers blanked, so keyword/identifier scans
    never match inside either (a keyword or apostrophe inside
    `o'brien`-style quoted identifiers must be invisible to scans)."""
    return _QUOTED_SPAN_RE.sub(
        lambda m: m.group(0)[0] + " " * (len(m.group(0)) - 2) + m.group(0)[-1],
        sql,
    )


_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_CLAUSE_ENDERS = frozenset(
    ("group", "order", "having", "union", "intersect", "except", "limit",
     "window")
)


def _paren_depths(masked: str) -> list[int]:
    """Per-character paren depth (depth AT that character)."""
    out = [0] * len(masked)
    d = 0
    for i, c in enumerate(masked):
        if c == "(":
            d += 1
        elif c == ")":
            d -= 1
        out[i] = d
    return out


def _split_top_parens(s: str) -> list[str]:
    """Split on commas at paren depth 0 ONLY — unlike
    :func:`_split_top_level` this does not treat ``<``/``>`` as
    brackets, so comparison operators in a select list don't glue
    items together."""
    parts, buf, depth = [], [], 0
    for c in s:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
    if buf:
        parts.append("".join(buf))
    return parts


def _subquery_spans(masked: str) -> list[tuple[int, int]]:
    """Spans of every parenthesized subquery ``( select ... )`` —
    regions the enclosing block's rewrites must never touch (they have
    their own scope and get their own pass)."""
    spans = []
    for m in re.finditer(r"\(\s*select\b", masked, re.IGNORECASE):
        close = _matching_paren(masked, m.start())
        if close > 0:
            spans.append((m.start(), close + 1))
    return spans


def _split_top_paren_spans(s: str) -> list[tuple[int, int]]:
    """(start, end) spans of the comma-separated items of ``s`` at
    paren depth 0 — offset-preserving sibling of
    :func:`_split_top_parens` for callers that must slice the
    *original* (unmasked) text."""
    spans, start, depth = [], 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            spans.append((start, i))
            start = i + 1
    if s:
        spans.append((start, len(s)))
    return spans


def _select_where_spans(masked: str):
    """Yield (sel_start, sel_end, where_start, where_end) for every
    SELECT block, spans indexed into the original string. Walks the
    masked text with paren-depth tracking relative to each SELECT."""
    words = [
        (m.group(0).lower(), m.start(), m.end())
        for m in _WORD_RE.finditer(masked)
    ]
    pos_depth = _paren_depths(masked)
    for wi, (w, ws, we) in enumerate(words):
        if w != "select":
            continue
        base = pos_depth[ws] if ws < len(pos_depth) else 0
        sel_from = None
        where_s = where_e = None
        for w2, s2, e2 in words[wi + 1 :]:
            dd = pos_depth[s2] if s2 < len(pos_depth) else 0
            if dd < base:
                break  # this SELECT's block closed
            if dd != base:
                continue  # inside a subexpression/subquery
            if w2 == "from" and sel_from is None:
                sel_from = s2
            elif w2 == "where" and where_s is None and sel_from is not None:
                where_s = e2
            elif (
                where_s is not None
                and where_e is None
                and w2 in _CLAUSE_ENDERS
            ):
                where_e = s2
                break
            elif w2 == "select":
                # a sibling SELECT at the same depth (set-operation
                # branch): its clauses are not ours — stop scanning
                break
        if sel_from is None or where_s is None:
            continue
        if where_e is None:
            # clause runs to the end of this paren block (or statement)
            where_e = len(masked)
            for i in range(where_s, len(masked)):
                if pos_depth[i] < base:
                    where_e = i
                    break
        yield we, sel_from, where_s, where_e


def _one_alias_inline_pass(sql: str) -> str:
    """Apply AT MOST ONE block's alias-in-WHERE rewrite and return the
    result (== input when nothing to do). One edit per pass keeps every
    span offset valid — overlapping/nested edits with stale offsets
    were corrupting the SQL."""
    masked = _mask_string_bodies(sql)
    sub_spans = _subquery_spans(masked)
    for ls, le, ws, we in _select_where_spans(masked):
        aliases = {}
        sel_masked = masked[ls:le]
        for is_, ie in _split_top_paren_spans(sel_masked):
            m = _AS_ALIAS_RE.match(sel_masked[is_:ie])
            if m and m.group(2).lower() not in _RESERVED_ALIAS:
                alias = m.group(2)
                # the masked text only drives span detection — the
                # inlined expression is sliced from the ORIGINAL sql so
                # string literals inside it survive intact
                a, b = m.span(1)
                expr = sql[ls + is_ + a : ls + is_ + b].strip()
                # circular guard: an alias whose expression references
                # its own name would re-trigger forever (`a+1 AS a`);
                # scan the masked expr so literals never false-match
                if not re.search(
                    rf"(?<![\w.`]){re.escape(alias)}(?![\w(])",
                    m.group(1),
                    re.IGNORECASE,
                ):
                    aliases[alias.lower()] = expr
        if not aliases:
            continue

        def sub_alias(segment: str) -> str:
            def repl(m: re.Match) -> str:
                expr = aliases.get(m.group(0).lower())
                return f"({expr})" if expr else m.group(0)

            # no lookahead-( : an alias sharing a function's name must
            # not rewrite the call site into "(expr)(args)"
            return re.sub(
                r"(?<![\w.`])[A-Za-z_][A-Za-z0-9_]*(?!\s*\()",
                repl,
                segment,
            )

        # rewrite only the parts of the clause OUTSIDE nested
        # subqueries: those have their own scope (their columns may
        # legitimately shadow the alias name) and get their own pass
        pieces, cur = [], ws
        changed = False
        # a clause may end one char inside the subquery's closing paren
        # (where_e stops at the depth drop) — clamp, don't drop
        inner = [
            (s0, min(e0, we)) for s0, e0 in sub_spans if ws <= s0 < we
        ]
        for s0, e0 in sorted(inner):
            seg = sql[cur:s0]
            out = _outside_strings(seg, sub_alias)
            changed |= out != seg
            pieces.append(out)
            pieces.append(sql[s0:e0])  # subquery text verbatim
            cur = e0
        seg = sql[cur:we]
        out = _outside_strings(seg, sub_alias)
        changed |= out != seg
        pieces.append(out)
        if changed:
            return sql[:ws] + "".join(pieces) + sql[we:]
    return sql


def inline_where_aliases(sql: str) -> str:
    """Rewrite each SELECT block's WHERE clause, replacing references
    to that block's explicit ``expr AS alias`` select items with
    ``(expr)`` — Tajo laxity #1. Iterates one block-edit at a time to
    a fixpoint (bounded), so nested blocks never corrupt offsets."""
    for _ in range(8):  # bound: one pass per block needing a rewrite
        nxt = _one_alias_inline_pass(sql)
        if nxt == sql:
            return sql
        sql = nxt
    return sql


_FROM_ITEM_RE = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_.]*)\s+(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*$",
    re.IGNORECASE,
)
_FROM_JOIN_RE = re.compile(r"\b(from|join)\b", re.IGNORECASE)


def requalify_aliased_tables(sql: str) -> str:
    """Rewrite ``table.`` qualifiers to the FROM-clause alias when the
    table was aliased — Tajo laxity #2 (stale qualifier). Scope-safe:
    only top-level (depth-0) FROM/JOIN items build the map, and nested
    subquery text is never rewritten (an alias bound inside a subquery
    is not visible outside it, and vice versa)."""
    masked = _mask_string_bodies(sql)
    depths = _paren_depths(masked)
    sub_spans = _subquery_spans(masked)
    mapping: dict[str, str] = {}
    for m in _FROM_JOIN_RE.finditer(masked):
        if depths[m.start()] != 0:
            continue  # a subquery's FROM — different scope
        start = m.end()
        tail = masked[start:]
        stop = re.search(
            r"\b(where|group|order|having|union|intersect|except|limit|"
            r"join|inner|left|right|full|cross|on|window)\b",
            tail,
            re.IGNORECASE,
        )
        seg = tail[: stop.start()] if stop else tail
        for item in _split_top_parens(seg):
            im = _FROM_ITEM_RE.match(item)
            if not im:
                continue
            name, alias = im.group(1), im.group(2)
            if alias.lower() in _RESERVED_ALIAS or name.lower() == alias.lower():
                continue
            mapping[name.lower()] = alias
    if not mapping:
        return sql

    def requalify(segment: str) -> str:
        def repl(m: re.Match) -> str:
            alias = mapping.get(m.group(1).lower())
            return f"{alias}." if alias else m.group(0)

        return re.sub(
            r"(?<![\w.`])([A-Za-z_][A-Za-z0-9_]*)\s*\.", repl, segment
        )

    pieces, cur = [], 0
    for s0, e0 in sorted(sub_spans):
        if s0 < cur:
            continue  # nested inside an already-skipped span
        pieces.append(_outside_strings(sql[cur:s0], requalify))
        pieces.append(sql[s0:e0])  # subquery scope left untouched
        cur = e0
    pieces.append(_outside_strings(sql[cur:], requalify))
    return "".join(pieces)


def recover_name_resolution(sql: str) -> str:
    """Both laxity rewrites, in the order that composes: stale
    qualifiers first (so inlined alias expressions keep working
    qualifiers), then alias-in-WHERE inlining."""
    return inline_where_aliases(requalify_aliased_tables(sql))


def drop_preunion_orderby(sql: str) -> str:
    """Tajo accepts a branch-level ``ORDER BY`` immediately before a
    set operator (TestUnionQuery/testUnion10.sql, testUnionAll10.sql);
    ANSI/Spark bind ORDER BY to the whole set expression and raise a
    parse error. Dropping the clause is semantics-preserving: set-op
    input order has no observable effect (the reference's own result
    is defined by the outermost ORDER BY). Applied only after a parse
    failure — conforming queries never reach this rewrite."""
    masked = _mask_string_bodies(sql)
    words = [
        (m.group(0).lower(), m.start(), m.end())
        for m in _WORD_RE.finditer(masked)
    ]
    depths = _paren_depths(masked)
    spans = []
    wraps = []  # (branch_select_start, set_op_start)
    for idx, (w, s, _e) in enumerate(words):
        if w != "order" or idx + 1 >= len(words):
            continue
        if words[idx + 1][0] != "by":
            continue
        d = depths[s]

        def branch_select_start(order_idx: int, d: int):
            """Start of the enclosing branch's SELECT at depth d, and
            whether the scan stopped at a set operator (i.e. this is
            not the first branch)."""
            sel_start, after_setop = None, False
            for k in range(order_idx - 1, -1, -1):
                wk, sk, _ek = words[k]
                dk = depths[sk]
                if dk < d:
                    break
                if dk == d and wk in ("union", "intersect", "except"):
                    after_setop = True
                    break
                if dk == d and wk == "select":
                    sel_start = sk
            return sel_start, after_setop

        j = idx + 2
        saw_limit = False
        while j < len(words):
            w2, s2, _e2 = words[j]
            d2 = depths[s2]
            if d2 < d:
                # clause runs to the paren close.  If this branch
                # FOLLOWS a set operator, Spark would bind the clause
                # to the whole set expression (where the branch's
                # columns may not resolve); Tajo binds it to the LAST
                # branch — wrap that branch (CtasWithUnion.sql).
                if saw_limit:
                    sel_start, after_setop = branch_select_start(idx, d)
                    if sel_start is not None and after_setop:
                        ci = s
                        while ci < len(masked) and (
                            masked[ci] != ")" or depths[ci] >= d
                        ):
                            ci += 1
                        wraps.append((sel_start, ci))
                break
            if d2 == d:
                if w2 in ("union", "intersect", "except"):
                    if saw_limit:
                        # ORDER BY + LIMIT is load-bearing: wrap the
                        # whole branch in parens so Spark binds the
                        # clause branch-locally, exactly as Tajo
                        # evaluates it (CtasWithUnion.sql)
                        sel_start, _ = branch_select_start(idx, d)
                        if sel_start is not None:
                            wraps.append((sel_start, s2))
                    else:
                        spans.append((s, s2))
                    break
                if w2 in ("limit", "offset"):
                    saw_limit = True
            j += 1
    edits: list[tuple[int, str, int]] = []  # (pos, insert_text, drop_to)
    for s, e in spans:
        edits.append((s, "", e))
    for s, e in wraps:
        edits.append((s, "(", s))
        edits.append((e, ") ", e))
    for pos, ins, drop_to in sorted(edits, reverse=True):
        sql = sql[:pos] + ins + sql[drop_to:]
    return sql


# --- Tajo/PostgreSQL default null ordering -----------------------------------
# Tajo sorts ASC with NULLS LAST and DESC with NULLS FIRST when no
# NULLS clause is given (PostgreSQL convention; golden evidence:
# TestSortQuery.java:266-276 expects `order by name asc` → null LAST,
# `order by name desc` → null FIRST).  Spark's defaults are the exact
# opposite, so every un-annotated sort key gets the explicit spelling.
_ORDER_BY_RE = re.compile(r"\border\s+by\b", re.IGNORECASE)
_ITEM_END_KEYWORDS = re.compile(
    r"^(limit|offset|union|intersect|except|rows|range|window|for)$",
    re.IGNORECASE,
)
_WITHIN_GROUP_RE = re.compile(r"within\s+group\s*\($", re.IGNORECASE)


def pg_default_null_order(sql: str) -> str:
    masked = _mask_string_bodies(sql)
    out: list[str] = []
    cur = 0
    for m in _ORDER_BY_RE.finditer(masked):
        if m.start() < cur:
            continue  # inside a span an earlier ORDER BY already consumed
        # WITHIN GROUP (ORDER BY ...): Spark's inverse-distribution
        # syntax rejects a NULLS clause — leave those untouched
        before = masked[: m.start()].rstrip()
        opn = before.rfind("(")
        if opn != -1 and _WITHIN_GROUP_RE.search(
            masked[: opn + 1].rstrip()[-24:] or ""
        ):
            continue
        out.append(sql[cur : m.end()])
        i = m.end()
        depth = 0
        item_start = i
        items: list[tuple[int, int]] = []  # [start, end) spans of sort items

        def close_item(end: int) -> None:
            if masked[item_start:end].strip():
                items.append((item_start, end))

        while i < len(masked):
            c = masked[i]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                close_item(i)
                item_start = i + 1
            elif depth == 0 and (c.isalpha() or c == "_"):
                w = _WORD_RE.match(masked, i)
                if w and _ITEM_END_KEYWORDS.match(w.group(0)):
                    break
                if w:
                    i = w.end()
                    continue
            i += 1
        close_item(i)
        rewritten: list[str] = []
        for s0, e0 in items:
            item = sql[s0:e0]
            body = item.rstrip()
            pad = item[len(body):]
            low = body.lower()
            if re.search(r"\bnulls\s+(first|last)\s*$", low):
                rewritten.append(item)
            elif re.search(r"\bdesc\s*$", low):
                rewritten.append(body + " NULLS FIRST" + pad)
            elif re.search(r"\basc\s*$", low):
                rewritten.append(body + " NULLS LAST" + pad)
            else:
                rewritten.append(body + " ASC NULLS LAST" + pad)
        out.append(",".join(rewritten))
        cur = i
    out.append(sql[cur:])
    return "".join(out)


# --- unaliased literal select items ------------------------------------------
# Tajo names an unaliased literal select item by its TYPE with the
# unnamed-column prefix (?text for string literals — golden evidence:
# results/TestGroupByQuery/testGroupByWithConstantKeys4/5 headers).
# Spark names the literal column by its VALUE ('day' → day), which is
# indistinguishable from a user alias once the frame exists, so the
# dialect aliases bare string-literal items as `?text` here and the
# engine's autoname pass assigns the query-global sequence suffix.
_SELECT_LIST_ENDERS = frozenset(
    ("from", "where", "group", "order", "having", "union", "intersect",
     "except", "limit", "window")
)


def name_unaliased_text_literals(sql: str) -> str:
    masked = _mask_string_bodies(sql)
    n = len(sql)
    out: list[str] = []
    i = 0
    depth = 0
    in_sel: dict[int, bool] = {}
    last: dict[int, str] = {}  # last significant token class per depth
    def _next_ok(k: int) -> bool:
        while k < n and masked[k].isspace():
            k += 1
        return (
            k >= n
            or masked[k] in ",)"
            or bool(
                re.match(
                    r"(?i)(from|union|order|group|having|limit)\b",
                    masked[k:],
                )
            )
        )

    while i < n:
        c = masked[i]
        if c == "'":
            m = _SQSTRING_RE.match(sql, i)
            if m is None:  # defensive: translate() pre-checks this
                raise ValueError(
                    f"unterminated string literal at offset {i}"
                )
            end = m.end()
            ok = in_sel.get(depth) and last.get(depth) in (",", "SELECT")
            out.append(m.group(0))
            if ok and _next_ok(end):
                out.append(" AS `?text`")
            last[depth] = "LIT"
            i = end
            continue
        if c.isdigit() and in_sel.get(depth) and last.get(depth) in (
            ",", "SELECT"
        ):
            # bare numeric literal select item → Tajo names it ?number
            # (golden: results/TestSelectQuery/testSelectAsterisk5)
            m = re.match(r"\d+(\.\d+)?([eE][+-]?\d+)?", masked[i:])
            end = i + m.end()
            out.append(sql[i:end])
            if _next_ok(end):
                out.append(" AS `?number`")
            last[depth] = "LIT"
            i = end
            continue
        if c == "(":
            out.append(c)
            depth += 1
            in_sel[depth] = False
            last[depth] = "("
            i += 1
            continue
        if c == ")":
            out.append(c)
            in_sel.pop(depth, None)
            last.pop(depth, None)
            depth -= 1
            last[depth] = ")"
            i += 1
            continue
        if c.isalpha() or c == "_":
            w = _WORD_RE.match(masked, i)
            if w is None:  # non-ASCII identifier char (quoted idents)
                last[depth] = "WORD"
                out.append(sql[i])
                i += 1
                continue
            word = w.group(0).lower()
            if (
                word == "cast"
                and in_sel.get(depth)
                and last.get(depth) in (",", "SELECT")
            ):
                # unaliased CAST(...) select item → Tajo names it
                # ?cast (golden: results/TestTablePartitions/case9 —
                # Spark would name it by the inner column instead)
                k = w.end()
                while k < n and masked[k].isspace():
                    k += 1
                if k < n and masked[k] == "(":
                    end = _matching_paren(masked, k)
                    if _next_ok(end):
                        out.append(sql[i:end] + " AS `?cast`")
                        last[depth] = "LIT"
                        i = end
                        continue
            if word == "select":
                in_sel[depth] = True
                last[depth] = "SELECT"
            elif word in ("distinct", "all") and last.get(depth) == "SELECT":
                pass  # still at the head of the select list
            elif word in _SELECT_LIST_ENDERS:
                in_sel[depth] = False
                last[depth] = "WORD"
            else:
                last[depth] = "WORD"
            out.append(sql[i : w.end()])
            i = w.end()
            continue
        if not c.isspace():
            last[depth] = c
        out.append(sql[i])
        i += 1
    return "".join(out)


# --- concat null-skipping ----------------------------------------------------
# Tajo's concat SKIPS null/blank arguments (Concat.java:54-64:
# isBlankOrNull → continue; PostgreSQL behaves the same) where Spark's
# concat returns NULL if ANY argument is null.  concat_ws('', ...) has
# exactly the skip-nulls fold.  Golden evidence:
# results/TestUnionQuery/testUnion13 — concat('1993', p_name) over the
# null catalog rows yields '1993', not NULL.
_CONCAT_RE = re.compile(r"\bconcat\s*\(", re.IGNORECASE)


def concat_skip_nulls(sql: str) -> str:
    def seg(s: str) -> str:
        return _CONCAT_RE.sub("concat_ws('', ", s)

    # string literals must pass through untouched, and concat_ws itself
    # must not be re-rewritten (the (?<!_ws) is implicit: the pattern
    # requires the word boundary before 'concat', and 'concat_ws('
    # never re-matches because the rewrite inserts 'concat_ws')
    return _outside_strings(sql, seg)


# --- 1-arg round returns INT8 ------------------------------------------------
# Tajo's single-argument round (Round.java) returns INT8; Spark's
# returns the input type (double stays double).  Golden evidence:
# results/TestTablePartitions/case5 renders round(pow(...)) as
# integers.  The cast wrapper is transparent to the autoname pass
# (engine._tajo_autoname_prefix sees through cast(round(...))).
_ROUND_RE = re.compile(r"\bround\s*\(", re.IGNORECASE)


def round_to_int8(sql: str) -> str:
    masked = _mask_string_bodies(sql)
    out, cur = [], 0
    for m in _ROUND_RE.finditer(masked):
        if m.start() < cur:
            continue
        opn = masked.index("(", m.start())
        end = _matching_paren(masked, opn)
        body = masked[opn + 1 : end - 1]
        depth = 0
        has_comma = False
        for ch in body:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                has_comma = True
                break
        out.append(sql[cur : m.start()])
        if has_comma:
            out.append(sql[m.start() : end])
        else:
            out.append("cast(" + sql[m.start() : end] + " as bigint)")
        cur = end
    out.append(sql[cur:])
    return "".join(out)


# --- NOT IN (subquery): anti-join (null-ignoring) semantics ------------------
# Tajo evaluates NOT IN (subquery) as a plain anti-join: subquery NULLs
# are ignored and an outer NULL key row is KEPT (no match → keep).
# Standard three-valued logic (and Spark) yields UNKNOWN for both, so
# the row is dropped.  Golden evidence:
# results/TestInSubquery/testNotInSubQuery keeps the null-name rows and
# returns rows although the subquery side contains NULLs.
# The faithful rewrite is explicit (Catalyst's null-aware anti-join
# rewrite fires on the NOT IN predicate regardless of a wrapping
# coalesce, so that spelling does NOT work):
#   A NOT IN (sub)  →  (A IS NULL OR A NOT IN
#                       (SELECT __nn FROM (sub) __tajo_ni(__nn)
#                        WHERE __nn IS NOT NULL))
# The left operand is recognized when it is a bare (possibly
# qualified) column — the only shape in the reference corpus; other
# operand shapes keep standard semantics.
_NOT_IN_RE = re.compile(
    r"([A-Za-z_][\w.]*)\s+not\s+in\s*\(", re.IGNORECASE
)


def notin_antijoin(sql: str) -> str:
    masked = _mask_string_bodies(sql)
    out, cur = [], 0
    for m in _NOT_IN_RE.finditer(masked):
        if m.start() < cur:
            continue
        lhs = m.group(1)
        opn = masked.index("(", m.end() - 1)
        if not re.match(r"\s*select\b", masked[opn + 1 :], re.IGNORECASE):
            continue
        end = _matching_paren(masked, opn)
        sub = sql[opn + 1 : end - 1]
        out.append(sql[cur : m.start()])
        out.append(
            f"({lhs} IS NULL OR {lhs} NOT IN "
            f"(SELECT __nn FROM ({sub}) __tajo_ni(__nn) "
            "WHERE __nn IS NOT NULL))"
        )
        cur = end
    out.append(sql[cur:])
    return "".join(out)


# --- two-digit-year temporal literals ----------------------------------------
# Tajo's datetime parser reads '15-01-01'::date as 2015-01-01
# (PostgreSQL two-digit-year rule: yy < 70 → 20yy, else 19yy); Spark
# parses year 15 (or NULL).  Golden evidence:
# results/TestWindowQuery/testLagWithDefault.
_TWO_DIGIT_TEMPORAL_RE = re.compile(
    r"'(\d{2})-(\d{2}-\d{2}(?: [\d:.]+)?)'\s*::\s*(date|timestamp)\b",
    re.IGNORECASE,
)


def expand_two_digit_years(sql: str) -> str:
    def repl(m: re.Match) -> str:
        yy = int(m.group(1))
        century = 20 if yy < 70 else 19
        return f"'{century}{m.group(1)}-{m.group(2)}'::{m.group(3)}"

    return _TWO_DIGIT_TEMPORAL_RE.sub(repl, sql)


# --- nested-record projection naming -----------------------------------------
# Tajo names an unaliased nested-field projection by its full path with
# '/' separators, the table qualifier stripped (goldens:
# TestSelectNestedRecord/testSelect0 header ``name/first_name``,
# testNestedFieldAsJoinKey1 ``t1.user.id`` → ``user/id``).  Spark names
# it by the leaf field.  The rewrite aliases bare dotted select items;
# whether the first segment is a table/alias (strip) or a struct root
# (keep) is decided against the statement's FROM-clause identifiers.
_FROM_KEYWORDS = frozenset(
    ("join", "inner", "left", "right", "full", "outer", "cross", "on",
     "using", "as", "lateral", "natural", "and", "or", "not", "in",
     "exists", "select", "where", "group", "order", "having", "union",
     "intersect", "except", "limit", "by")
)
_PATH_RE = re.compile(
    r"[A-Za-z_]\w*(?:\.(?:[A-Za-z_]\w*|`[^`]+`))+"
)


def name_nested_path_items(sql: str) -> str:
    masked = _mask_string_bodies(sql)
    n = len(sql)
    depth = 0
    in_sel: dict[int, bool] = {}
    in_from: dict[int, bool] = {}
    in_on: dict[int, bool] = {}
    sel_seq: dict[int, int] = {}
    last: dict[int, str] = {}
    candidates: list[tuple[int, int, list[str], tuple[int, int]]] = []
    from_names: dict[tuple[int, int], set[str]] = {}
    i = 0
    while i < n:
        c = masked[i]
        if c == "(":
            depth += 1
            in_sel[depth] = False
            in_from[depth] = False
            last[depth] = "("
            i += 1
            continue
        if c == ")":
            in_sel.pop(depth, None)
            in_from.pop(depth, None)
            last.pop(depth, None)
            depth -= 1
            last[depth] = ")"
            i += 1
            continue
        if c == ",":
            last[depth] = ","
            if in_from.get(depth):
                in_on[depth] = False  # comma-join item after an ON
            i += 1
            continue
        if c.isalpha() or c == "_" or c == "`":
            m = _PATH_RE.match(masked, i)
            if (
                m
                and in_sel.get(depth)
                and last.get(depth) in (",", "SELECT")
            ):
                k = m.end()
                while k < n and masked[k].isspace():
                    k += 1
                ends_item = (
                    k >= n
                    or masked[k] in ",)"
                    or bool(
                        re.match(
                            r"(?i)(from|union|order|group|having|limit)\b",
                            masked[k:],
                        )
                    )
                )
                if ends_item:
                    segs = re.findall(r"`[^`]+`|[A-Za-z_]\w*", sql[i : m.end()])
                    candidates.append(
                        (i, m.end(), segs,
                         (depth, sel_seq.get(depth, 0)))
                    )
                last[depth] = "WORD"
                i = m.end()
                continue
            w = _WORD_RE.match(masked, i)
            if w is None:
                last[depth] = "WORD"
                i += 1
                continue
            word = w.group(0).lower()
            if word == "select":
                in_sel[depth] = True
                in_from[depth] = False
                sel_seq[depth] = sel_seq.get(depth, 0) + 1
                last[depth] = "SELECT"
            elif word in ("distinct", "all") and last.get(depth) == "SELECT":
                pass
            elif word == "from":
                in_sel[depth] = False
                in_from[depth] = True
                in_on[depth] = False
                last[depth] = "WORD"
            elif word in ("where", "group", "order", "having", "union",
                           "intersect", "except", "limit", "window", "on"):
                in_sel[depth] = False
                in_from[depth] = word == "on" and in_from.get(depth, False)
                # inside an ON expression every identifier is a column
                # reference, not a relation name — stop harvesting until
                # the next JOIN item (else ``on t1.user.id = ...`` would
                # poison the strip set with struct-root names)
                in_on[depth] = word == "on" and in_from.get(depth, False)
                last[depth] = "WORD"
            else:
                if word == "join":
                    in_on[depth] = False
                if (
                    in_from.get(depth)
                    and not in_on.get(depth)
                    and word not in _FROM_KEYWORDS
                ):
                    from_names.setdefault(
                        (depth, sel_seq.get(depth, 0)), set()
                    ).add(word)
                last[depth] = "WORD"
            i = w.end()
            continue
        if not c.isspace():
            last[depth] = c
        i += 1

    if not candidates:
        return sql
    out, cur = [], 0
    for s0, e0, segs, key in candidates:
        names = from_names.get(key, set())
        path = list(segs)
        # strip EVERY leading FROM-clause identifier, not just one: a
        # db-qualified reference ``JOINS.part_.p_partkey`` contributes
        # both ``joins`` and ``part_`` as FROM words, and Tajo renders
        # it by the bare column (golden:
        # TestInnerJoinQuery/testJoinOnMultipleDatabases header)
        while len(path) > 1 and path[0].lower() in names:
            path = path[1:]
        if len(path) < 2:
            continue  # a plain qualified column keeps Spark's leaf name
        alias = "/".join(p.strip("`") for p in path)
        out.append(sql[cur:e0])
        out.append(f" AS `{alias}`")
        cur = e0
    out.append(sql[cur:])
    return "".join(out)


# --- sum(DISTINCT ...) zero on all-null input --------------------------------
# Tajo's distinct-rewritten aggregation returns 0 (not SQL-standard
# NULL) when every input value in the group is NULL — golden evidence:
# results/TestGroupByQuery/testDistinctAggregation4/5/8 show
# sum(distinct l_orderkey)=0 beside sum(l_orderkey)=null for the
# all-null group.  Reproduce by wrapping in coalesce.
_SUM_DISTINCT_RE = re.compile(r"\bsum\s*\(\s*distinct\b", re.IGNORECASE)


def zero_sum_distinct(sql: str) -> str:
    masked = _mask_string_bodies(sql)
    out, cur = [], 0
    for m in _SUM_DISTINCT_RE.finditer(masked):
        if m.start() < cur:
            continue
        opn = masked.index("(", m.start())
        end = _matching_paren(masked, opn)
        out.append(sql[cur : m.start()])
        out.append("coalesce(" + sql[m.start() : end] + ", 0)")
        cur = end
    out.append(sql[cur:])
    return "".join(out)


def shared_expression_rewrites(s: str) -> str:
    """The Tajo-semantics expression rewrites applied to every query
    body — both standalone statements (translate) and selects embedded
    in CTAS/INSERT (translate_create_table)."""
    s = _outside_strings(
        s,
        lambda seg: re.sub(
            r"\bsplit_part\s*\(", "tajo_split_part(", seg,
            flags=re.IGNORECASE,
        ),
    )
    s = pg_default_null_order(s)
    s = zero_sum_distinct(s)
    s = concat_skip_nulls(s)
    s = round_to_int8(s)
    s = notin_antijoin(s)
    s = expand_two_digit_years(s)
    return s


_DIV_KEYWORDS = frozenset(
    "when then else end and or not in all any some exists between is as on "
    "where select distinct case from join over by escape union intersect "
    "except like ilike rlike similar to having group order limit".split()
)


def _blank_comments(masked: str) -> str:
    """Additionally blank -- and /* */ comment bodies (same length)."""
    out = list(masked)
    i, n = 0, len(masked)
    while i < n:
        if masked.startswith("--", i):
            j = masked.find("\n", i)
            j = n if j < 0 else j
            for k in range(i, j):
                out[k] = " "
            i = j
        elif masked.startswith("/*", i):
            j = masked.find("*/", i + 2)
            j = n if j < 0 else j + 2
            for k in range(i, j):
                out[k] = " "
            i = j
        else:
            i += 1
    return "".join(out)


def _div_operand_left(masked: str, i: int) -> tuple[int, int] | None:
    """(start, end) span of the tightest left operand of the '/' at
    ``i``, or None when the shape is not recognized (caller skips)."""
    j = i - 1
    while j >= 0 and masked[j].isspace():
        j -= 1
    if j < 0:
        return None
    end = j + 1
    if masked[j] == ")":
        depth = 1
        j -= 1
        while j >= 0 and depth:
            if masked[j] == ")":
                depth += 1
            elif masked[j] == "(":
                depth -= 1
            j -= 1
        if depth:
            return None
        # an adjacent-or-spaced name before '(' is a function call —
        # unless it is a keyword (CASE WHEN (x)/2 ...)
        k = j
        while k >= 0 and masked[k].isspace():
            k -= 1
        name_end = k + 1
        while k >= 0 and (masked[k].isalnum() or masked[k] in "_."):
            k -= 1
        name = masked[k + 1 : name_end]
        if name and name.lower() not in _DIV_KEYWORDS:
            return (k + 1, end)
        return (j + 1, end)
    if masked[j].isalnum() or masked[j] in "_.":
        while j >= 0 and (masked[j].isalnum() or masked[j] in "_."):
            j -= 1
        return (j + 1, end)
    return None


def _div_operand_right(masked: str, i: int) -> tuple[int, int] | None:
    """(start, end) span of the tightest right operand of the '/' at
    ``i`` (an optional sign, then a literal/identifier/call/paren)."""
    n = len(masked)
    j = i + 1
    while j < n and masked[j].isspace():
        j += 1
    if j >= n:
        return None
    start = j
    if masked[j] in "+-":
        j += 1
        while j < n and masked[j].isspace():
            j += 1
        if j >= n:
            return None
    if masked[j] == "(":
        depth = 1
        j += 1
        while j < n and depth:
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
            j += 1
        return None if depth else (start, j)
    if masked[j].isalnum() or masked[j] in "_.":
        while j < n and (masked[j].isalnum() or masked[j] in "_."):
            j += 1
        k = j
        while k < n and masked[k].isspace():
            k += 1
        if k < n and masked[k] == "(":
            word = masked[start:j].lower()
            if word in _DIV_KEYWORDS:
                return (start, j)
            depth = 1
            k += 1
            while k < n and depth:
                if masked[k] == "(":
                    depth += 1
                elif masked[k] == ")":
                    depth -= 1
                k += 1
            return None if depth else (start, k)
        return (start, j)
    return None


def top_level_division_sites(
    sql: str,
) -> tuple[list[tuple[int, int, int, int, int]], int]:
    """Division sites in the TOP-LEVEL select list, for the engine's
    Tajo typed-division rewrite (ExprAnnotator.java types ``/`` from
    the catalog: INTn / INTn stays integral in Tajo, while Spark's
    ``/`` always yields DOUBLE).

    Returns ``([(lstart, lend, slash, rstart, rend), ...], insert_at)``
    where ``insert_at`` is the offset at which a probe select item can
    be appended (just before the top-level FROM, or at the end of the
    select list of a FROM-less statement). Sites are found in the
    whole top-level statement — select list, WHERE, GROUP BY, HAVING,
    ORDER BY — since those clauses share the select list's name scope
    and so type correctly under a select-list probe; sites inside
    SUBQUERY spans (their own scope), strings, quoted identifiers,
    comments and chained divisions are skipped (or left for the
    caller's analysis probe to fail on harmlessly). A same-precedence
    chain on the LEFT ('f * a / b') widens the reported left span to
    the whole chain ('f * a'), because that is the expression a
    left-associative 'div' will actually bind (ADVICE r09).
    """
    masked = _blank_comments(_mask_string_bodies(sql))
    m = re.match(r"\s*SELECT\b", masked, re.IGNORECASE)
    if not m:
        return [], -1
    list_start = m.end()
    depth = 0
    insert_at = len(sql)
    i = list_start
    n = len(masked)
    while i < n:
        c = masked[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                insert_at = i
                break
        elif depth == 0 and c in "FfWwGgOoLlUuIiEeHh":
            kw = re.match(
                r"(FROM|WHERE|GROUP|ORDER|LIMIT|UNION|INTERSECT|EXCEPT"
                r"|HAVING|WINDOW)\b",
                masked[i:],
                re.IGNORECASE,
            )
            if kw and (i == 0 or not (masked[i - 1].isalnum() or masked[i - 1] == "_")):
                insert_at = i
                break
        i += 1
    # scan the whole top-level statement, but stop at a top-level set
    # operator (the second branch's scope is not the first's) and
    # exclude subquery interiors: a '(' whose first token is SELECT
    # opens a new name scope
    excluded = [False] * n
    for sub in re.finditer(r"\(\s*(?:SELECT|VALUES)\b", masked, re.IGNORECASE):
        d, k = 1, sub.start() + 1
        while k < n and d:
            if masked[k] == "(":
                d += 1
            elif masked[k] == ")":
                d -= 1
            k += 1
        for p in range(sub.start(), k):
            excluded[p] = True
    scan_end = len(sql)
    for setop in re.finditer(
        r"\b(UNION|INTERSECT|EXCEPT)\b", masked[insert_at:], re.IGNORECASE
    ):
        if not excluded[insert_at + setop.start()]:
            scan_end = insert_at + setop.start()
            break
    sites: list[tuple[int, int, int, int, int]] = []
    for j in range(list_start, scan_end):
        if masked[j] != "/" or excluded[j]:
            continue
        left = _div_operand_left(masked, j)
        right = _div_operand_right(masked, j)
        if left is None or right is None:
            continue
        # chained a/b/c: the textual tightest operands misbind — skip
        after = right[1]
        while after < n and masked[after].isspace():
            after += 1
        if after < n and masked[after] == "/":
            continue
        # same-precedence operator to the LEFT: 'f * a div b' parses
        # left-associatively as '(f*a) div b', so the tight operand
        # (a) is NOT what div binds (ADVICE r09 — a DOUBLE f turned a
        # previously-running query into a DATATYPE_MISMATCH failure).
        # Extend the left operand across the whole multiplicative
        # chain so the probe types exactly the expression 'div' will
        # receive; a '/' inside the chain means this site's binding
        # depends on another site's rewrite — skip it (chained-division
        # rule above). The tight RIGHT operand is already what div
        # binds under left-associativity, so no mirror walk is needed.
        bad_chain = False
        while True:
            before = left[0] - 1
            while before >= 0 and masked[before].isspace():
                before -= 1
            if before < 0:
                break
            ch = masked[before]
            if ch == "/":
                bad_chain = True
                break
            if ch in "*%":
                prev = _div_operand_left(masked, before)
                if prev is None:
                    bad_chain = True
                    break
                left = (prev[0], left[1])
                continue
            if ch.isalnum() or ch == "_":
                w = before
                while w >= 0 and (masked[w].isalnum() or masked[w] == "_"):
                    w -= 1
                if masked[w + 1 : before + 1].lower() == "div":
                    prev = _div_operand_left(masked, w + 1)
                    if prev is None:
                        bad_chain = True
                        break
                    left = (prev[0], left[1])
                    continue
            break
        if bad_chain:
            continue
        sites.append((left[0], left[1], j, right[0], right[1]))
    return sites, insert_at


def outer_select_spans(sql: str) -> list[tuple[int, int]]:
    """Outermost ``(SELECT ...)`` spans (offsets of both parens,
    end exclusive) — subquery and CTE bodies, each of which is a name
    scope of its own. The engine's typed-division rewrite recurses into
    each span's interior as a standalone statement (r09 VERDICT task 4):
    an uncorrelated body analyzes against the catalog on its own, while
    a correlated body's probe fails analysis and leaves its sites on
    ``/`` (the documented fail-safe direction). Nested subqueries are
    reached by the recursion, not listed here."""
    masked = _blank_comments(_mask_string_bodies(sql))
    n = len(masked)
    spans: list[tuple[int, int]] = []
    taken_until = -1
    for sub in re.finditer(r"\(\s*SELECT\b", masked, re.IGNORECASE):
        if sub.start() < taken_until:
            continue
        d, k = 1, sub.start() + 1
        while k < n and d:
            if masked[k] == "(":
                d += 1
            elif masked[k] == ")":
                d -= 1
            k += 1
        if d:
            continue
        spans.append((sub.start(), k))
        taken_until = k
    return spans


def setop_branch_spans(sql: str) -> list[tuple[int, int]]:
    """Top-level bare-SELECT branch spans of a set-operation statement
    (``[(start, end)] ``; empty when there is no top-level set operator
    or the statement doesn't lead with SELECT). Used by the engine's
    typed-division rewrite (r10): each branch is its own probe scope —
    probing the branch STANDALONE sidesteps the arity problem that made
    set-op statements a residual (an appended probe item breaks UNION
    branch arity, but a lone branch has no arity contract). Branches
    that are parenthesized ride the subquery recursion instead."""
    masked = _blank_comments(_mask_string_bodies(sql))
    if not re.match(r"\s*SELECT\b", masked, re.IGNORECASE):
        return []
    n = len(masked)
    depth = 0
    bounds: list[tuple[int, int]] = []
    i = 0
    while i < n:
        c = masked[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and c in "UuIiEe":
            kw = re.match(
                r"(UNION|INTERSECT|EXCEPT)\b(\s+(ALL|DISTINCT)\b)?",
                masked[i:],
                re.IGNORECASE,
            )
            if kw and (
                i == 0
                or not (masked[i - 1].isalnum() or masked[i - 1] == "_")
            ):
                bounds.append((i, i + kw.end()))
                i += kw.end()
                continue
        i += 1
    if not bounds:
        return []
    spans: list[tuple[int, int]] = []
    prev = 0
    for s, e in bounds:
        spans.append((prev, s))
        prev = e
    spans.append((prev, n))
    out: list[tuple[int, int]] = []
    for s, e in spans:
        while s < e and masked[s].isspace():
            s += 1
        if re.match(r"SELECT\b", masked[s:e], re.IGNORECASE):
            out.append((s, e))
    return out


def _with_clause_walk(
    sql: str,
) -> tuple[list[tuple[int, int, int]], int | None] | None:
    """Walk a top-level WITH clause (each ``name [(cols)] AS ( body )``
    consumed, comma-chained). Returns ``(ctes, main_start)`` where each
    CTE is ``(body_start, body_end, def_end)`` — the span INSIDE its
    parens plus the offset just past its closing paren — and
    ``main_start`` is the main statement's offset (None when it isn't a
    SELECT). Returns None when the statement isn't a recognized WITH."""
    masked = _blank_comments(_mask_string_bodies(sql))
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", masked, re.IGNORECASE)
    if not m:
        return None
    i, n = m.end(), len(masked)
    ctes: list[tuple[int, int, int]] = []
    while True:
        m2 = re.match(r'[\w"`]+\s*', masked[i:])
        if not m2 or m2.end() == 0:
            return None
        i += m2.end()
        if i < n and masked[i] == "(":  # optional column alias list
            d, i = 1, i + 1
            while i < n and d:
                if masked[i] == "(":
                    d += 1
                elif masked[i] == ")":
                    d -= 1
                i += 1
            while i < n and masked[i].isspace():
                i += 1
        m3 = re.match(r"AS\s*\(", masked[i:], re.IGNORECASE)
        if not m3:
            return None
        i += m3.end()
        body_start = i
        d = 1
        while i < n and d:
            if masked[i] == "(":
                d += 1
            elif masked[i] == ")":
                d -= 1
            i += 1
        if d:
            return None
        ctes.append((body_start, i - 1, i))
        while i < n and masked[i].isspace():
            i += 1
        if i < n and masked[i] == ",":
            i += 1
            while i < n and masked[i].isspace():
                i += 1
            continue
        break
    main = i if re.match(r"SELECT\b", masked[i:], re.IGNORECASE) else None
    return ctes, main


def with_main_start(sql: str) -> int | None:
    """Offset where the main statement begins after a top-level WITH
    clause, or None when the shape isn't recognized or the main
    statement isn't a SELECT. The engine's typed-division rewrite
    probes the main body with the WITH clause as a PREFIX so CTE names
    resolve (r10 — closes the WITH-statement residual)."""
    r = _with_clause_walk(sql)
    return None if r is None else r[1]


def cte_body_spans(sql: str) -> list[tuple[int, int, int]]:
    """Each top-level CTE's ``(body_start, body_end, def_end)`` — the
    body span inside its parens plus the offset just past its closing
    paren. The engine probes CTE body k with ``sql[:def_end(k-1)]`` as
    a prefix so chained CTE references type from the CTE schema, never
    from a same-named catalog table (ADVICE r10 medium)."""
    r = _with_clause_walk(sql)
    return [] if r is None else r[0]


def _check_strings_terminated(sql: str) -> None:
    """Reject an unterminated string literal up front (r08 fuzz find:
    every rewrite below assumes _SQSTRING_RE can close any literal it
    opens, and a dangling quote crashed name_unaliased_text_literals).
    Quotes inside -- and /* */ comments and inside "..."-delimited
    identifiers (SELECT "o'brien" is legal SQL — ADVICE r08) don't
    count."""
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in '"`':
            # quoted identifier ("" / `` escape a quote inside it)
            j = i + 1
            while j < n:
                if sql[j] == c:
                    if sql.startswith(c + c, j):
                        j += 2
                        continue
                    break
                j += 1
            i = n if j >= n else j + 1
        elif c == "'":
            m = _SQSTRING_RE.match(sql, i)
            if m is None:
                raise ValueError(
                    f"unterminated string literal at offset {i}"
                )
            i = m.end()
        elif c == "-" and sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
        elif c == "/" and sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            i += 1


def translate(sql: str) -> str:
    """Full statement rewrite (session statements excluded — those are
    routed by ``parse_session_statement`` first)."""
    # a prior translate whose caller never executed may have left a
    # stale CTAS domain-check entry; this statement owns the channel
    _PENDING_CTAS_CHECK.clear()
    _check_strings_terminated(sql)
    s = sql.strip().rstrip(";")
    s = translate_quoted_identifiers(s)
    # named windows are inlined FIRST so every OVER carries a full spec
    # and the per-usage rewrites below see inline bodies only
    s = inline_named_windows(s)
    s = inject_window_order(s)
    s = force_tajo_window_frames(s)
    # Tajo allows a parenthesized table reference, optionally with an
    # alias and column-alias list: FROM (t1), FROM (t1 x (a,b,c))
    s = re.sub(
        r"\b(FROM|JOIN)\s*\(\s*(?!SELECT\b|VALUES\b|TABLE\b|WITH\b)"
        r"([A-Za-z_][\w.]*(?:\s+(?!SELECT\b)[A-Za-z_]\w*)?"
        r"(?:\s*\([^()]*\))?)\s*\)",
        r"\1 \2",
        s,
        flags=re.IGNORECASE,
    )
    if re.match(r"^\s*CREATE\s+(EXTERNAL\s+)?TABLE\b", s, re.IGNORECASE):
        return translate_create_table(s)
    loc = translate_insert_location(s)
    if loc is not None:
        return loc
    s = _INSERT_OVERWRITE_RE.sub("INSERT OVERWRITE TABLE", s)
    s = translate_similar_to(s)
    s = _translate_to_char_formats(s)
    s = _translate_pg_codec(s)
    s = name_unaliased_text_literals(s)
    s = name_nested_path_items(s)
    s = shared_expression_rewrites(s)
    if re.match(r"^\s*ALTER\b", s, re.IGNORECASE):
        # Tajo ALTER dialect (AlterTableNode / SQLParser.g4) → Spark:
        #   ADD COLUMN c t        → ADD COLUMNS (c t)
        #   SET PROPERTY 'k'='v'  → SET TBLPROPERTIES ('k'='v')
        #   UNSET PROPERTY 'k'    → UNSET TBLPROPERTIES ('k')
        #   REPAIR PARTITION      → MSCK REPAIR TABLE t
        #   DROP PARTITION ... PURGE → PURGE is Tajo/Hive noise Spark
        #     rejects on non-Hive catalogs; dropping it keeps the
        #     same semantics (data files go with the partition)
        s = re.sub(
            r"\bADD\s+COLUMN\s+(.+)$",
            lambda m: "ADD COLUMNS ("
            + translate_column_defs(m.group(1).rstrip()) + ")",
            s,
            flags=re.IGNORECASE,
        )
        s = re.sub(
            r"\bSET\s+PROPERTY\s+(.+)$",
            r"SET TBLPROPERTIES (\1)",
            s,
            flags=re.IGNORECASE,
        )
        s = re.sub(
            r"\bUNSET\s+PROPERTY\s+(.+)$",
            r"UNSET TBLPROPERTIES (\1)",
            s,
            flags=re.IGNORECASE,
        )
        m_rep = re.match(
            r"^\s*ALTER\s+TABLE\s+([\w.\"`]+)\s+REPAIR\s+PARTITION\s*$",
            s,
            re.IGNORECASE,
        )
        if m_rep:
            return f"MSCK REPAIR TABLE {m_rep.group(1)}"
        s = re.sub(
            r"(\bDROP\s+(?:IF\s+EXISTS\s+)?PARTITION\s*\([^)]*\))\s+PURGE\b",
            r"\1",
            s,
            flags=re.IGNORECASE,
        )
        # only column-definition lists carry type names in ALTER; a
        # whole-statement rewrite would rename identifiers like a
        # column called "text"
        s = re.sub(
            r"\(([^()]*)\)",
            lambda m: "(" + translate_column_defs(m.group(1)) + ")",
            s,
        )
    # CAST(x AS INT4): rewrite only when the type name closes the cast —
    # a SELECT alias like "AS time" must stay untouched
    s = re.sub(
        r"\bAS\s+(" + "|".join(TYPE_MAP) + r")(\s*\))",
        lambda m: "AS " + TYPE_MAP[m.group(1).upper()] + m.group(2),
        s,
        flags=re.IGNORECASE,
    )
    # PostgreSQL cast syntax x::INT8 — Spark parses `::` natively, only
    # the Tajo/PG type name needs mapping; the `::` anchor means this
    # can never rename an ordinary identifier. Applied outside string
    # literals only, so data containing '::text' stays untouched.
    s = _outside_strings(
        s,
        lambda seg: re.sub(
            r"::\s*(" + "|".join(TYPE_MAP) + r")\b",
            lambda m: "::" + TYPE_MAP[m.group(1).upper()],
            seg,
            flags=re.IGNORECASE,
        ),
    )
    return s
