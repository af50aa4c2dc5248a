"""Count-min sketch (Cormode & Muthukrishnan 2005) for heavy-hitter
term estimation — the constant-memory, MERGEABLE frequency summary.

Why it earns a place next to the exact top-k (`text_term_topk`): exact
per-term counts shuffle |distinct terms| keys — fine for one batch, but
a continuously-ingested 100 TB corpus tracking term drift across days
wants a summary that is (a) fixed-size regardless of vocabulary,
(b) mergeable across partitions/batches by plain addition (the same
property Spark exploits for HLL in approx_count_distinct), and
(c) one-sided: estimates NEVER undercount, and overcount is bounded by
``e/width * N`` with probability ``1 - e^-depth`` per query.

DataFrame shape: the sketch IS a DataFrame of ``depth × width``
counters — build = one explode (depth rows per token) + ONE
groupBy((row, bucket)) whose key space is bounded at depth*width
(8K cells here) no matter the corpus; map-side partial aggregation
collapses every task to at most the cell count before the shuffle.
Merging two sketches = unionByName + the same groupBy.  Estimation
joins the probe terms' cells against the BROADCAST sketch and takes
the per-term min across rows.

Hashing is the repo's cross-engine idiom: row j's bucket for term t is
``int(md5('j:' || t)[:8], 16) % width`` — DuckDB reproduces it
bit-for-bit, so the whole sketch (not just a contract) is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 2048


def _cms_bucket(term: Column, row: int, width: int) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), term).cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    terms: DataFrame,
    term_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """One-column frame of term occurrences → ``(row, bucket, c)``
    sketch counters (≤ depth×width rows)."""
    cells = terms.select(
        F.posexplode(
            F.array(
                *[
                    _cms_bucket(F.col(term_col), j, width)
                    for j in range(depth)
                ]
            )
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch merge = cell-wise addition — the property that makes the
    summary work across batches/streams/days."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    probe_terms: DataFrame,
    sketch: DataFrame,
    term_col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """``(term, cms_est)`` — min over the term's depth cells.  The
    sketch is broadcast (≤ depth×width rows by construction); probing
    is one explode + broadcast join + per-term min."""
    probes = probe_terms.select(
        term_col,
        F.posexplode(
            F.array(
                *[
                    _cms_bucket(F.col(term_col), j, width)
                    for j in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    # LEFT join + coalesce 0: an absent cell means "never incremented",
    # and a probe term all of whose cells are empty (count 0, no
    # collisions) must estimate 0, not vanish from the output
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_est"))
    )


def cms_heavy_hitters(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Exact top-k terms side-by-side with their count-min estimates:
    ``(term, true_count, cms_est, overcount)`` — ``overcount =
    cms_est - true_count >= 0`` ALWAYS (one-sidedness is structural:
    every cell a term hashes to counts at least all of that term's own
    occurrences).  The exact leg is the verification harness; at
    streaming scale only the sketch survives and the exact leg is the
    one-off audit you run on a sample.
    """
    from tajo_spark.operators import text as T
    from tajo_spark.operators.dedup import spread_by

    terms = (
        spread_by(docs, "doc_id")
        .select(F.explode(T.tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .localCheckpoint()  # feeds both the sketch and the exact counts
    )
    sketch = cms_build(terms, depth=depth, width=width)
    topk = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), "term")
        .limit(k)
    )
    return (
        cms_estimate(topk, sketch, depth=depth, width=width)
        .join(topk, "term")
        .select(
            "term",
            "true_count",
            "cms_est",
            (F.col("cms_est") - F.col("true_count")).alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# mergeable fixed-bin histogram → distributed quantile estimates

HIST_BINS = 64


def hist_build(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Fixed-range equi-width histogram — the MERGEABLE quantile
    summary completing the sketch family (Bloom: membership, CMS:
    frequency, histogram: distribution).  Where
    ``F.percentile``/``approx_percentile`` answer one batch, a
    continuously-ingested corpus tracking a distribution across days
    wants fixed-size state mergeable by plain cell addition — the same
    property the CMS exploits.

    Sketch = a DataFrame of at most ``bins`` (bin, n) cells: ONE
    groupBy whose key space is bounded regardless of corpus size
    (map-side combined).  Values below ``lo`` / above ``hi`` clamp
    into the edge bins (count-preserving, like every fixed-range
    histogram); NULLs are dropped.  Merging = unionByName + the same
    groupBy (``cms_merge`` shape).
    """
    w = (hi - lo) / bins
    b = (
        F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0), F.floor((F.col(value_col) - lo) / F.lit(w))
            ),
        )
        .cast("int")
        .alias("bin")
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(b)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def hist_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("bin")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def hist_quantiles(
    hist: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = HIST_BINS,
    round_to: int = 4,
) -> DataFrame:
    """Quantile estimates from the histogram: for each q, the first
    bin whose cumulative count reaches ``q * total``, linearly
    interpolated within the bin (the standard equi-width estimator —
    error bounded by one bin width).

    Distributed shape: ONE cumulative window over <= ``bins``
    AGGREGATE rows (the two-phase idiom — the window never sees data
    rows), the q probes cross-joined against the bin that spans each
    target rank.  Returns (q, est) rows, deterministic given the
    sketch.
    """
    from pyspark.sql import Window as W

    bad = [q for q in qs if not (0.0 <= float(q) <= 1.0)]
    if bad:
        raise ValueError(f"quantile probes must be in [0, 1]: {bad}")
    w = (hi - lo) / bins
    # unpartitioned window is BOUNDED by construction: it runs over the
    # histogram aggregate (≤ ``bins`` rows at any corpus size), never
    # the input — the single-partition WindowExec warning is benign
    # here (r13 Window audit)
    cum = hist.select(
        "bin",
        "n",
        F.sum("n").over(
            W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        ).alias("cum"),
    )
    total = hist.agg(F.sum("n").alias("total"))
    qdf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q DOUBLE"
    )
    targets = qdf.join(F.broadcast(total)).select(
        "q", (F.col("q") * F.col("total")).alias("rank"), "total"
    )
    # the spanning bin: smallest bin with cum >= rank; LEFT join so a
    # probe with no spanning bin (empty histogram) surfaces as a NULL
    # est row instead of silently vanishing from the output
    spanning = (
        targets.join(
            F.broadcast(cum), F.col("cum") >= F.col("rank"), "left"
        )
        .groupBy("q", "rank")
        .agg(F.min(F.struct("bin", "cum", "n")).alias("b"))
    )
    return spanning.select(
        "q",
        F.round(
            F.lit(lo)
            + (
                F.col("b.bin")
                + (
                    F.col("rank")
                    - (F.col("b.cum") - F.col("b.n"))
                )
                / F.greatest(F.col("b.n"), F.lit(1))
            )
            * F.lit(w),
            round_to,
        ).alias("est"),
    ).orderBy("q")


def hist_build_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Per-group fixed-range histogram: (grp, bin, n) — state bounded
    by |groups| x bins regardless of corpus (one groupBy, map-side
    combined)."""
    w = (hi - lo) / bins
    b = (
        F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0), F.floor((F.col(value_col) - lo) / F.lit(w))
            ),
        )
        .cast("int")
        .alias("bin")
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"), b)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def hist_l1_drift(a: DataFrame, b: DataFrame, round_to: int = 6) -> DataFrame:
    """Distribution-level drift per group: the L1 distance between two
    snapshots' normalized histograms, ``sum_bin |n_a/N_a - n_b/N_b|``
    in [0, 2] — the monitoring signal count-level drift reports miss
    (identical doc counts, shifted length distribution = a parser or
    chunker regression).

    Exactness trick: the per-bin terms are summed as INTEGERS —
    ``sum |n_a * N_b - n_b * N_a|`` — and divided by ``N_a * N_b``
    once at the end, so the result has NO floating summation-order
    dependence at all (cross-engine hash-exact by construction; the
    products stay within int64 up to ~3e9 rows per group per
    snapshot).  Defined for groups present in BOTH snapshots (inner
    join on totals); appearing/disappearing groups are
    count-level drift, covered by rollup.corpus_drift_report.

    One full-outer join of bounded cell tables + two broadcast-sized
    totals — nothing data-sized.
    """
    ta = a.groupBy("grp").agg(F.sum("n").cast("long").alias("na_tot"))
    tb = b.groupBy("grp").agg(F.sum("n").cast("long").alias("nb_tot"))
    cells = (
        a.select("grp", "bin", F.col("n").alias("na"))
        .join(
            b.select("grp", "bin", F.col("n").alias("nb")),
            ["grp", "bin"],
            "full_outer",
        )
        .fillna(0, ["na", "nb"])
    )
    return (
        cells.join(ta, "grp")
        .join(tb, "grp")
        .groupBy("grp")
        .agg(
            F.first("na_tot").alias("old_docs"),
            F.first("nb_tot").alias("new_docs"),
            F.round(
                F.sum(
                    F.abs(
                        F.col("na") * F.col("nb_tot")
                        - F.col("nb") * F.col("na_tot")
                    )
                ).cast("double")
                / (F.first("na_tot") * F.first("nb_tot")),
                round_to,
            ).alias("l1_drift"),
        )
    )
