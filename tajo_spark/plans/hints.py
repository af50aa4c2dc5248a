"""Size-gated broadcast hinting.

The reference only broadcasts a join side when its volume is under a
threshold (BroadcastJoinRule.java:44-65 checks the stage's INPUT volume
against ``SessionVars`` BROADCAST_*_JOIN_THRESHOLD) — and because Tajo
runs stages sequentially, the volume it gates on is the *actual* bytes
the stage consumed, not an estimate.  The engine-wide policy
(session.py) gets the same honesty in three layers:

  * ``spark.sql.sources.fileCompressionFactor = 8`` — the static
    planner's estimate for a parquet leg is compressed file size ×
    pruned-width ratio, which UNDERSTATES the broadcast build cost by
    ~8x (decode ~4-6x on these tables + HashedRelation overhead ~2x).
    Twice (r06 lineitem self-join leg, r07 q18 orders leg) the memory
    rung watched that lie pick a ~400 MB un-spillable build under a
    capped heap.  Inflating the estimate to decoded-cost units kills
    the class at its root while keeping static broadcasts for
    genuinely small sides (an outright static ban was measured 43%
    slower across the bench — every dim join paid an extra exchange).
  * static + AQE ``autoBroadcastJoinThreshold = 64MB`` (in inflated /
    measured units respectively — statically ~8 MB of raw pruned
    parquet) — AQE re-checks every shuffle join from MEASURED sizes
    and upgrades or demotes at runtime.
  * Explicit hints below for relations that are dimension-sized — an
    unconditional ``F.broadcast()`` overrides the static threshold, so
    it may only ever be attached to something that cannot be
    fact-sized.

``broadcast_if_dim`` is that explicit path: it hints only when BOTH
Catalyst's optimized-plan estimate AND the plan's largest UNPRUNED leaf
scan are under the bound.  The leaf check is what the r06/r07 bug class
taught: a derived estimate under the bound means nothing when the
lineage bottoms out in a fact-scale scan — those stay unhinted and AQE
decides from runtime sizes.

Fixed-cardinality dims (region=5 rows, nation=25 rows) and one-row
aggregates may keep unconditional hints — they cannot grow with scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Safe upper bound for a *hinted* broadcast build side, in the SAME
# inflated (decoded-cost) units plan_size_bytes now reports under
# fileCompressionFactor=8: 256 MiB inflated ≈ 32 MiB of raw parquet ≈
# a few hundred MB decoded — comfortable on production executors,
# looser than the automatic threshold because a hint is a deliberate
# per-site claim, and still lineage-checked below.
BROADCAST_DIM_MAX_BYTES = 256 * 1024 * 1024


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


def max_leaf_bytes(df: DataFrame) -> int | None:
    """Largest UNPRUNED leaf-relation size estimate in the plan.

    Walks the ANALYZED logical plan (column pruning has not run yet,
    so a leaf's ``sizeInBytes`` is the relation's full file size, not
    the optimistic pruned-width number the r06/r07 memory rungs caught
    lying).  Driver-side only.  ``None`` when no leaf reports a size.
    """
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        worst = None
        for i in range(leaves.size()):
            s = leaves.apply(i).stats().sizeInBytes()
            s = s if isinstance(s, int) else int(str(s))
            if worst is None or s > worst:
                worst = s
        return worst
    except Exception:
        return None


def broadcast_if_dim(
    df: DataFrame, max_bytes: int = BROADCAST_DIM_MAX_BYTES
) -> DataFrame:
    """Hint ``broadcast(df)`` only when it is provably dimension-sized.

    Two gates, both required (see module docstring for the bug class):

    1. optimized-plan estimate ≤ ``max_bytes`` — the relation looks
       small after pruning/filtering;
    2. every leaf scan in its lineage ≤ ``max_bytes`` UNPRUNED — the
       estimate cannot be a pruned-width lie about a fact table.

    Under both → hinted broadcast (saves the probe-side shuffle AQE
    would need).  Anything else → unhinted; AQE decides from runtime
    sizes, so a genuinely-small fact aggregate still broadcasts at
    execution time while a misestimated one degrades to a spillable
    shuffle join instead of an un-spillable broadcast build.
    """
    size = plan_size_bytes(df)
    if size is None or not 0 <= size <= max_bytes:
        return df
    leaf = max_leaf_bytes(df)
    if leaf is None or leaf > max_bytes:
        return df
    return F.broadcast(df)
