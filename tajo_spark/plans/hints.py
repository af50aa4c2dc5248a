"""Size-gated broadcast hinting.

The reference only broadcasts a join side when its *estimated volume* is
under a threshold (BroadcastJoinRule.java:44-65 checks the stage's input
volume against ``SessionVars`` BROADCAST_*_JOIN_THRESHOLD, defaulting to
a few MB).  An unconditional ``F.broadcast()`` hint in Spark does NOT do
that: a hint *overrides* ``spark.sql.autoBroadcastJoinThreshold``, so a
relation that grows with the corpus (TPC-H ``part``/``supplier``, a
per-part aggregate over ``lineitem``) would still be broadcast at 100 TB
— OOMing executors or hitting the 8 GB broadcast hard limit instead of
degrading to a shuffle join.

``broadcast_if_dim`` restores the reference's size-gated semantics: it
consults Catalyst's optimized-plan size estimate (file-size based for
scans, CBO/heuristic-propagated for derived plans — computed on the
driver, no job runs) and only attaches the hint when the estimate is
under the bound.  Oversized or unknown-size relations are returned
unhinted, leaving the decision to AQE, which re-plans with *actual*
runtime sizes and will still broadcast when genuinely small.

Fixed-cardinality dims (region=5 rows, nation=25 rows) and one-row
aggregates may keep unconditional hints — they cannot grow with scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Safe upper bound for a *hinted* broadcast build side.  Catalyst's
# estimate for a parquet scan is the compressed file size; 64 MiB
# compressed stays well under executor/driver headroom once decoded,
# and matches the session's autoBroadcastJoinThreshold (session.py) so
# the hint never claims more than AQE itself would allow.
BROADCAST_DIM_MAX_BYTES = 64 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size-in-bytes estimate for the optimized plan.

    Driver-side only — triggers analysis+optimization (milliseconds),
    never a Spark job.  Returns ``None`` when the estimate is
    unavailable.  Derived plans without CBO stats propagate pessimistic
    (large) estimates, which is the conservative direction for a
    broadcast gate.
    """
    try:
        big = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j converts scala BigInt to Python int when it fits; fall
        # back to string parsing for a raw JavaObject
        return big if isinstance(big, int) else int(str(big))
    except Exception:
        return None


def broadcast_if_dim(
    df: DataFrame, max_bytes: int = BROADCAST_DIM_MAX_BYTES
) -> DataFrame:
    """Hint ``broadcast(df)`` only when the plan-size estimate allows it.

    Use for relations whose cardinality grows with the corpus (TPC-H
    part/supplier, per-key aggregates over a fact table).  Under the
    bound → hinted broadcast (saves AQE a stage at small SF).  Over the
    bound, or unknown → unhinted; AQE decides from runtime sizes, so the
    plan degrades gracefully to shuffle join at 100 TB instead of OOMing
    on a forced broadcast.
    """
    size = plan_size_bytes(df)
    if size is not None and 0 <= size <= max_bytes:
        return F.broadcast(df)
    return df


def never_broadcast(df: DataFrame) -> DataFrame:
    """SHUFFLE_MERGE-hint a relation that is fact-sized BY CONSTRUCTION
    (a fact-table self-join leg, a per-key aggregate over the biggest
    table) so the static planner can never choose to broadcast it.

    Why the gate isn't enough: ``broadcast_if_dim`` withholds OUR hint,
    but Spark's own static threshold still compares Catalyst's
    file-size × column-pruning estimate against
    ``autoBroadcastJoinThreshold`` — and that estimate is optimistic
    for a skinny projection of a wide parquet fact table.  Measured in
    the round-6 memory rung: at 16x data the static planner broadcast
    a 3-column lineitem self-join leg (~10M rows as a HashedRelation);
    the build then died with "Not enough memory to build and broadcast
    the table" under a 2-4 GiB heap — broadcast builds are the ONE
    join path that cannot spill.  The merge hint removes the static
    decision; the join degrades to sort-merge, which spills.  The cost
    at small SF is bounded (one extra shuffle of a side that was small
    THERE), and correctness at 100 TB is not negotiable.
    """
    return df.hint("shuffle_merge")
