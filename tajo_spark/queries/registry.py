"""Central query registry: one entry per implemented operator/capability.

Each :class:`QuerySpec` pairs
  * ``spark`` — a callable ``(spark, sf_dir) -> DataFrame`` built with
    the DataFrame API (Spark-first; Catalyst picks physical strategy),
  * ``oracle`` — the equivalent ANSI SQL runnable by DuckDB on the same
    parquet tables (or ``None`` for genuinely non-SQL-expressible ops,
    which the driver checks rows-only).

Column-name discipline: every computed column is aliased identically on
both sides, because the correctness gate sorts columns by name before
hashing values.

Float discipline: floating-point aggregates are rounded (usually to 2
decimals) on BOTH sides so that summation-order differences between
Spark's partial aggregation and DuckDB never flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str
    doc: str
    spark: SparkQuery
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    category: str,
    doc: str = "",
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a Spark query + its DuckDB oracle."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            category=category,
            doc=doc or (fn.__doc__ or ""),
            spark=fn,
            oracle=oracle,
            tags=tags,
        )
        return fn

    return wrap


# Names that already have a green driver row in a CORRECTNESS_r{N}.json
# artifact (round 1 truncated at the first 50 registry entries, so ordering
# decides who gets driver-side evidence).  We rotate: queries WITHOUT a green
# driver row yet are emitted first, verified ones last.
#
# The set is DERIVED from the checked-in artifacts at import time — the
# round-2 and round-3 verdicts both flagged a hand-maintained frozenset going
# stale, so hand-editing is retired (VERDICT.md r03 next-round #1).  A name
# counts as driver-verified when:
#   * any artifact shows ``hash_match: true`` (full value-hash green), or
#   * an artifact shows a rows-only green (``err == "no_oracle"`` with a
#     non-null ``spark_rows``) AND the registry entry still has no oracle —
#     if the query has since gained an oracle, it is re-queued so the driver
#     upgrades the row to hash-green (exactly what happened to
#     pack_sequences & co between r01 and r02).
_ARTIFACT_GLOB = "CORRECTNESS_r*.json"


def tracked_artifacts() -> list:
    """Git-TRACKED CORRECTNESS_r*.json paths (glob fallback sans git).

    The external driver drops its end-of-round artifact into the
    working tree AFTER the builder's final commit; deriving evidence
    from a raw glob therefore races the driver by construction and
    reddened the REGISTRY.md freshness gate two rounds running
    (VERDICT r06 "What's wrong" #1).  Tracked-only derivation is
    stable across a driver landing: the new artifact becomes evidence
    the moment it is committed (with REGISTRY.md regenerated in the
    same commit).
    """
    import subprocess
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    try:
        out = subprocess.run(
            ["git", "-C", str(root), "ls-files", _ARTIFACT_GLOB],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout
        paths = [root / line for line in out.splitlines() if line]
        if paths:
            return sorted(paths)
    except (OSError, subprocess.SubprocessError):
        pass
    return sorted(root.glob(_ARTIFACT_GLOB))


def _load_driver_rows() -> tuple[frozenset[str], frozenset[str]]:
    """Scan git-tracked CORRECTNESS artifacts → (hash_green, rows_only_green)."""
    import json

    hash_green: set[str] = set()
    rows_only: set[str] = set()
    for path in tracked_artifacts():
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                hash_green.add(name)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                rows_only.add(name)
    return frozenset(hash_green), frozenset(rows_only)


_HASH_GREEN, _ROWS_ONLY_GREEN = _load_driver_rows()


def driver_verified() -> frozenset[str]:
    """Names with sufficient driver evidence (requires REGISTRY populated
    to decide whether a rows-only green still lacks an oracle)."""
    return _HASH_GREEN | frozenset(
        n
        for n in _ROWS_ONLY_GREEN
        if n in REGISTRY and REGISTRY[n].oracle is None
    )

# Among the not-yet-verified queries, small categories first so they fit
# inside the driver's per-round query cap (round 1 truncated at 50);
# self-staging scan round-trips and the 22 TPC-H bodies go last within
# the unverified block (they rotate in over subsequent rounds).
_CATEGORY_RANK = {
    "window": 1,
    "micro": 2,
    "scan": 3,
    "tpch": 4,
    "skew": 5,
    # round-2+ additions queue BEHIND the round-1 backlog: the driver
    # cap should clear §2.3–§2.7 / TPC-H first (VERDICT.md next-round #1)
    "curation": 6,
}


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules exactly once.
    from tajo_spark.queries import (  # noqa: F401
        analytics_q,
        datapipe,
        functions_q,
        relational,
        sources_q,
        temporal_q,
        tpch,
        windows_q,
    )

    order = list(REGISTRY)
    _verified = driver_verified()
    ranked = sorted(
        range(len(order)),
        key=lambda i: (
            order[i] in _verified,
            _CATEGORY_RANK.get(REGISTRY[order[i]].category, 0),
            i,
        ),
    )
    return {order[i]: REGISTRY[order[i]] for i in ranked}
