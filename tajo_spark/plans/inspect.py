"""Plan inspection: the EXPLAIN [GLOBAL] analogue as structured data.

The reference prints its logical/global plan trees for EXPLAIN
(QueryExecutor.java:126); at cluster scale what matters is the exchange
structure, scan pushdown, and join strategies — this module extracts
them from Spark's formatted plan so tests (tests/test_plans.py) and
users can assert on plan *properties* instead of string-matching whole
plans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            mode
        )
    )


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan — only meaningful after an action."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanReport:
    n_scans: int = 0
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    has_partial_agg: bool = False
    has_take_ordered: bool = False
    wholestage_codegen: bool = False
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)


def plan_report(df: DataFrame) -> PlanReport:
    text = formatted_plan(df)
    r = PlanReport()
    # count numbered plan nodes only — the formatted output repeats node
    # names in the per-node details section
    r.n_scans = len(re.findall(r"\(\d+\) Scan (?:parquet|csv|json|orc)", text))
    r.n_exchanges = len(
        re.findall(r"\(\d+\) (?:Broadcast)?Exchange", text)
    )
    r.n_broadcast_joins = len(
        re.findall(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join", text)
    )
    r.n_sortmerge_joins = len(re.findall(r"\(\d+\) SortMergeJoin", text))
    r.has_partial_agg = "partial_" in text
    r.has_take_ordered = "TakeOrderedAndProject" in text
    r.wholestage_codegen = "WholeStageCodegen" in text
    # greedy-to-line-end capture: filter lists may contain nested
    # brackets (e.g. In(col, [a,b])), so [^\]]* would truncate
    r.pushed_filters = re.findall(r"PushedFilters: \[(.*)\]", text)
    r.partition_filters = re.findall(r"PartitionFilters: \[(.*)\]", text)
    r.read_schemas = re.findall(r"ReadSchema: (\S+)", text)
    return r
