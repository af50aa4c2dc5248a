"""Tajo-surface EXPLAIN renderers (QueryExecutor.java:126 parity).

The reference's plain ``EXPLAIN`` prints the logical plan dump
(LogicalPlan.toString) and ``EXPLAIN GLOBAL`` prints the distributed
MasterPlan: an Execution Block Graph, the execution order, and one
per-block plan section (ExplainGlobalPlanPreprocessorTest golden
shapes).  Spark's physical plan carries the same information — stages
delimited by exchanges — so :func:`render_global` re-frames the REAL
Catalyst plan in Tajo's rendering: blocks are the exchange-delimited
stage slices (a shuffle exchange ends a block exactly like Tajo's
RangeShuffle/HashShuffle boundaries), broadcasts are annotated inside
their consuming block (Tajo's broadcast-join blocks inline the small
side the same way, BroadcastJoinRule.java:44-65).

:func:`render_logical` reproduces Tajo's dump byte-for-byte for the
single-scan projection shape the reference's own golden pins
(results/TestSelectQuery/testExplainSelect.result, plan-shape-fix
alphabetical in-schema); any other shape returns None and the caller
falls back to Spark's formatted plan, which is the honest surface for
plans Tajo could not produce.
"""

from __future__ import annotations

import re

# Spark simpleString -> Tajo type names (Type.java / TajoDataTypes)
TAJO_TYPES = {
    "tinyint": "INT1",
    "smallint": "INT2",
    "int": "INT4",
    "bigint": "INT8",
    "float": "FLOAT4",
    "double": "FLOAT8",
    "string": "TEXT",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}

_SIMPLE_SELECT = re.compile(
    r"(?is)^\s*select\s+(?P<cols>[a-z_][\w]*(?:\s*,\s*[a-z_][\w]*)*)"
    r"\s+from\s+(?:default\.)?(?P<table>[a-z_]\w*)\s*;?\s*$"
)


def render_logical(spark, sql: str) -> str | None:
    """Tajo's logical-plan dump for a bare single-table projection —
    the exact text LogicalPlanner produces for ``select c1, c2 from
    t`` with $TEST_PLAN_SHAPE_FIX_ENABLED (in-schema alphabetized).
    Returns None when the statement is any other shape or a column
    type has no Tajo name."""
    m = _SIMPLE_SELECT.match(sql)
    if not m:
        return None
    table = m.group("table").lower()
    cols = [c.strip() for c in m.group("cols").split(",")]
    try:
        fields = spark.table(table).schema.fields
    except Exception:
        return None
    types = {
        f.name.lower(): TAJO_TYPES.get(f.dataType.simpleString())
        for f in fields
    }
    if any(t is None for t in types.values()):
        return None
    if any(c.lower() not in types for c in cols):
        return None
    qual = f"default.{table}"
    tl = ", ".join(f"{qual}.{c.lower()} ({types[c.lower()]})" for c in cols)
    in_schema = ", ".join(
        f"{qual}.{n} ({t})" for n, t in sorted(types.items())
    )
    return (
        f"SCAN(0) on {qual}\n"
        f"  => target list: {tl}\n"
        f"  => out schema: {{({len(cols)}) {tl}}}\n"
        f"  => in schema: {{({len(types)}) {in_schema}}}"
    )


def _block_id(n: int) -> str:
    return f"eb_0000000000000_0000_{n:06d}"


def render_global(df) -> str:
    """Tajo's EXPLAIN GLOBAL surface over the REAL Spark plan: the
    exchange-delimited stage DAG as an Execution Block Graph +
    per-block plan sections.  Each shuffle exchange closes a block
    (Tajo's Hash/RangeShuffleFileWrite boundary); broadcast exchanges
    stay inside the consuming block with a ``[broadcast]`` marker
    (BroadcastJoinRule parity — the small side never forms a stage).
    Estimated sizes ride along when Spark computed statistics."""
    jplan = df._jdf.queryExecution().executedPlan()
    if jplan.nodeName().startswith("AdaptiveSparkPlan"):
        # render the STATIC plan (initialPlan — Scala private[sql] is
        # public at the bytecode level): EXPLAIN must not trigger
        # execution, and the static exchange structure is the stage
        # DAG the scheduler starts from (AQE may later coalesce)
        jplan = jplan.initialPlan()

    # blocks in POST-ORDER (children numbered before parents — Tajo's
    # execution order), each with its plan lines and child-block ids,
    # so a join of two shuffled inputs renders as SIBLING blocks under
    # their consumer, not a fake chain
    blocks: list[tuple[list[str], list[int]]] = []

    def walk_block(node) -> int:
        lines: list[str] = []
        kids: list[int] = []

        def walk(n, depth: int) -> None:
            name = n.nodeName()
            simple = n.simpleString(100)
            if (
                "Exchange" in name
                and "Broadcast" not in name
                and n.children().size() > 0
            ):
                # stage boundary: everything BELOW this exchange is
                # its own execution block (post-order id). A childless
                # ReusedExchange (AQE off + exchange reuse) falls
                # through to the plain-line branch instead of crashing
                # on children().apply(0) (r10 review).
                cid = walk_block(n.children().apply(0))
                kids.append(cid)
                lines.append(
                    "  " * depth
                    + f"SHUFFLE({simple.split(' ', 1)[-1][:80]}) "
                    + f"<= {_block_id(cid)}"
                )
                return
            marker = " [broadcast]" if "Broadcast" in name else ""
            lines.append("  " * depth + simple[:120] + marker)
            for i in range(n.children().size()):
                walk(n.children().apply(i), depth + 1)

        walk(node, 0)
        blocks.append((lines, kids))
        return len(blocks)

    root_id = walk_block(jplan)
    n = len(blocks)
    terminal = _block_id(n + 1)

    bar = "-" * 79
    out = [
        bar,
        f"Execution Block Graph (TERMINAL - {terminal})",
        bar,
        f"|-{terminal}",
    ]

    def render_tree(bid: int, depth: int) -> None:
        out.append("   " * depth + f"|-{_block_id(bid)}")
        for kid in blocks[bid - 1][1]:
            render_tree(kid, depth + 1)

    render_tree(root_id, 1)
    out += [bar, "Order of Execution", bar]
    for i in range(1, n + 1):
        out.append(f"{i}: {_block_id(i)}")
    out.append(f"{n + 1}: {terminal}")
    out.append(bar)
    for i, (lines, kids) in enumerate(blocks, start=1):
        role = (
            "ROOT" if i == root_id else ("LEAF" if not kids else "INTERMEDIATE")
        )
        out += [
            "",
            "=" * 55,
            f"Block Id: {_block_id(i)} [{role}]",
            "=" * 55,
            "",
        ]
        out += lines
    out += [
        "",
        "=" * 55,
        f"Block Id: {terminal} [TERMINAL]",
        "=" * 55,
    ]
    return "\n".join(out)
