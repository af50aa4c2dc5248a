"""One-pass column profiler: per-column null counts, cardinality,
min/max, and average rendered length in a SINGLE aggregate over the
table — the corpus-QA summary a 100 TB ingest runs before anything
else (reference parallel: catalog statistics, TableStats.java /
ColumnStats.java, which Tajo collects per-column during writes; this
is the query-time equivalent over any relation).

Scale shape: ONE scan, one global aggregate (map-side combined).
Exact distinct counts expand the aggregate k-ways (Spark's Expand for
multiple count_distincts) — correct but k scans' worth of shuffle
rows; ``exact_distinct=False`` (the default) uses HyperLogLog++
``approx_count_distinct`` which keeps the pass single-width and is
the only honest choice at 100 TB.  The unpivot to one-row-per-column
happens AFTER aggregation on a single row — no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
    len_round: int = 2,
) -> DataFrame:
    """Profile ``cols`` (default: all columns) in one aggregate.

    Returns one row per column: ``col_name, n_nulls, n_distinct,
    min_s, max_s, avg_len`` — min/max aggregated in the column's
    NATIVE type (numeric min is numeric, not lexicographic) and cast
    to string afterwards for a uniform schema; ``avg_len`` is the
    mean rendered length of non-null values, rounded.
    """
    cols = list(cols or df.columns)
    nd = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls"),
            nd(F.col(c)).cast("long").alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            F.round(F.avg(F.length(F.col(c).cast("string"))), len_round)
            .alias(f"{c}__len"),
        ]
    row = df.agg(*aggs)
    packed = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.col(f"{c}__nd").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_s"),
                        F.col(f"{c}__max").alias("max_s"),
                        F.col(f"{c}__len").alias("avg_len"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return packed.select("p.*")
