"""Temporal join operators: as-of (point-in-time) join and range joins.

Beyond-reference capability: the reference engine has no as-of/interval
join (its join inventory is the 9 classic types, PhysicalPlannerImpl.java
joins only on equi/theta predicates); training-data pipelines need
point-in-time correctness (feature lookups "as of" an event time) and
time-window joins. DuckDB's native ``ASOF JOIN`` serves as the oracle.

Scale design:

* ``asof_join`` — the naive formulation is a range join (for each left
  row, max right ts <= left ts), which Spark would execute as a hash
  join on the equi-key with an O(|matches|) residual scan per key — or,
  keyless, a broadcast-nested-loop. Instead we use the canonical
  web-scale shape: tag both inputs, union them, and run ONE window
  (``last(..., ignorenulls=True)``) over ``partitionBy(key) orderBy(ts,
  side)``. Cost = one hash shuffle on the key + an in-partition sort —
  identical asymptotics to a sort-merge join, no per-key quadratic
  term, and skew behaves exactly like any keyed shuffle (salt upstream
  if one key dominates).
* ``range_join`` — keyed interval join expressed as an equi-join on the
  key with the range predicate as a residual filter: Catalyst plans the
  shuffle/broadcast on the key alone, so rows only meet partitions they
  could match.
* ``bucketed_range_join`` — KEYLESS point-in-interval join. A raw
  inequality join is a nested-loop (O(n·m)); bucketing time into
  fixed-width buckets, exploding each interval onto the buckets it
  overlaps, and equi-joining on the bucket id turns it into a hash
  join whose fan-out is |interval|/width per right row. Each point
  lands in exactly one bucket so no post-join dedup is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_SIDE = "__asof_side"
_KEY = "__asof_key"
_TS = "__asof_ts"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
    direction: str = "backward",
    tiebreak: Optional[str] = None,
) -> DataFrame:
    """Point-in-time left join: for every left row, attach ``right_vals``
    from the right row with the greatest ``right_ts`` <= ``left_ts``
    (``direction="backward"``, inclusive — DuckDB/pandas ``merge_asof``
    semantics) or the least ``right_ts`` >= ``left_ts`` (``"forward"``),
    matching on key equality. Unmatched left rows keep NULL values.

    The matched right timestamp is returned as column ``matched_ts``.

    ``tiebreak``: optional right column ordering duplicates of the same
    (key, ts) — the row with the greatest tiebreak value wins,
    deterministically. Without it, duplicate right (key, ts) rows make
    the winner partition-order dependent (same caveat as any SQL engine).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    match_fields = [F.col(right_ts).alias("matched_ts")] + [
        F.col(v).alias(v) for v in right_vals
    ]
    tb_type = dict(right.dtypes)[tiebreak] if tiebreak else "int"
    # SQL match semantics: a NULL key never equals anything and
    # `ts >= NULL` is never true, so null-key/null-ts right rows can
    # never be matched — drop them BEFORE the union (otherwise the
    # window's null-key partition and null-first sort order would
    # fabricate matches no SQL engine produces).
    r = right.filter(
        F.col(right_key).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(right_key).alias(_KEY),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        F.struct(*match_fields).alias(_MATCH),
    )
    match_type = r.schema[_MATCH].dataType
    l = left.select(
        "*",
        F.col(left_key).alias(_KEY),
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(match_type).alias(_MATCH),
    )
    left_types = dict(left.dtypes)
    r = r.select(
        "*",
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left.columns],
    )
    merged = l.unionByName(r.select(*l.columns))

    # null-ts LEFT rows must sort before every right row in scan order
    # (match = NULL, mirroring `NULL >= ts` = false): asc is nulls-first
    # already; desc needs it explicit.
    ts_order = (
        F.col(_TS).asc()
        if direction == "backward"
        else F.col(_TS).desc_nulls_first()
    )
    w = (
        W.partitionBy(_KEY)
        .orderBy(ts_order, F.col(_SIDE).asc(), F.col("__tb").asc_nulls_last())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = merged.withColumn(_MATCH, F.last(_MATCH, ignorenulls=True).over(w))
    out = matched.filter(F.col(_SIDE) == 1).select(
        *left.columns, F.col(_MATCH).alias("__m")
    )
    return out.select(
        *left.columns,
        F.col("__m.matched_ts").alias("matched_ts"),
        *[F.col(f"__m.{v}").alias(v) for v in right_vals],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple[str, str]],
    point: str,
    start: Column,
    end: Column,
    how: str = "inner",
) -> DataFrame:
    """Keyed point-in-interval join: ``left.point ∈ [start, end)`` with
    ``on`` as (left_col, right_col) equality pairs.

    The equi-keys carry the shuffle/broadcast; the range is a residual
    filter on the matched rows — the plan Catalyst picks is a plain
    hash/sort-merge join on the keys, never a nested loop.
    """
    cond = None
    for lc, rc in on:
        c = left[lc] == right[rc]
        cond = c if cond is None else cond & c
    cond = cond & (left[point] >= start) & (left[point] < end)
    return left.join(right, cond, how)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    point_expr: Column,
    start_expr: Column,
    end_expr: Column,
    bucket_width: int,
) -> DataFrame:
    """KEYLESS point-in-interval join via time bucketing.

    ``point_expr``/``start_expr``/``end_expr`` must be numeric (cast
    timestamps with ``unix_timestamp`` first). Each right interval is
    exploded onto every ``bucket_width``-sized bucket it overlaps; each
    left point hashes to exactly one bucket, so the bucket equi-join
    yields every qualifying pair exactly once (no dedup pass). Choose
    ``bucket_width`` ≈ the typical interval length: fan-out per right
    row is ~(len/width + 1) while per-bucket population stays bounded.
    """
    lb = left.withColumn("__bucket", F.floor(point_expr / bucket_width)).withColumn(
        "__p", point_expr
    )
    # last bucket: the one holding the largest point < __e — an interval
    # ending exactly on a boundary excludes that boundary's bucket
    # (integer arithmetic, not a float epsilon that underflows at
    # unix-timestamp magnitudes). Empty/inverted intervals (__e <= __s)
    # are dropped BEFORE the explode: F.sequence would otherwise step
    # DOWNWARD through a huge descending bucket range for one dirty row.
    last_bucket = F.floor(F.col("__e") / bucket_width) - F.when(
        F.col("__e") % bucket_width == 0, 1
    ).otherwise(0)
    rb = (
        right.withColumn("__s", start_expr)
        .withColumn("__e", end_expr)
        .filter(F.col("__e") > F.col("__s"))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(F.floor(F.col("__s") / bucket_width), last_bucket)
            ),
        )
    )
    joined = lb.join(rb, "__bucket").filter(
        (F.col("__p") >= F.col("__s")) & (F.col("__p") < F.col("__e"))
    )
    return joined.drop("__bucket", "__p", "__s", "__e")
