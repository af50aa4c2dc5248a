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


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules exactly once.
    from tajo_spark.queries import (  # noqa: F401
        analytics_q,
        datapipe,
        functions_q,
        relational,
        temporal_q,
        tpch,
        windows_q,
    )

    return REGISTRY
