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
    # backtick-quote every reference (with `` escaping) so names
    # containing dots/spaces/backticks resolve as literal column names,
    # never as struct paths; positional aliases (_p{i}_*) so no user
    # column name can collide with the internal wide-row naming scheme.
    aggs = []
    for i, c in enumerate(cols):
        v = df["`" + c.replace("`", "``") + "`"]
        aggs += [
            F.sum(F.when(v.isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_p{i}_nulls"),
            nd(v).cast("long").alias(f"_p{i}_nd"),
            F.min(v).cast("string").alias(f"_p{i}_min"),
            F.max(v).cast("string").alias(f"_p{i}_max"),
            F.round(F.avg(F.length(v.cast("string"))), len_round)
            .alias(f"_p{i}_len"),
        ]
    row = df.agg(*aggs)
    packed = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"_p{i}_nulls").alias("n_nulls"),
                        F.col(f"_p{i}_nd").alias("n_distinct"),
                        F.col(f"_p{i}_min").alias("min_s"),
                        F.col(f"_p{i}_max").alias("max_s"),
                        F.col(f"_p{i}_len").alias("avg_len"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("p")
    )
    return packed.select("p.*")
