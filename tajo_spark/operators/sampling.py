"""Deterministic sampling operators for reproducible dataset splits.

Beyond-reference capability: training pipelines need sampling that is
(a) reproducible across runs and engines, (b) stable under
repartitioning, and (c) row-local (no shuffle, no global state). The
standard trick is hashing a stable row id and comparing a fixed-width
hex prefix against a threshold — every engine with md5 reproduces the
exact same membership, unlike ``TABLESAMPLE``/``df.sample`` whose RNG
is engine- and partitioning-dependent.

Scale design: both operators are pure per-row projections/filters — no
shuffle, no driver state, trivially parallel at 100 TB; the md5 cost is
one digest per row (negligible next to the scan).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def id_md5(id_col: Column) -> Column:
    """md5 hex of the stringified id — THE shared hash recipe every
    sampling operator (and oracle SQL via ``md5(CAST(id AS VARCHAR))``)
    uses; keep the cast chain identical everywhere or cross-engine
    membership diverges."""
    return F.md5(id_col.cast("string").cast("binary"))


def seeded_md5(id_col: Column, seed: int) -> Column:
    """md5 hex of ``'{seed}:' || CAST(id AS VARCHAR)`` — the seeded
    variant of :func:`id_md5`, THE cross-engine-critical recipe for
    every seeded sampler and shuffler (oracles embed the identical
    ``md5('{seed}:' || ...)``). One copy (r11 review: four verbatim
    clones meant a fix to one could silently desynchronize the
    others)."""
    return F.md5(
        F.concat(F.lit(f"{seed}:"), id_col.cast("string")).cast("binary")
    )


def _es_key(id_col: str, weight_col: str, seed: int) -> Column:
    """Efraimidis-Spirakis weighted-sampling key: seeded md5 →
    52-bit-uniform u in (0,1] → round(-ln(u)/w, 9). Smallest-k keys =
    a weighted sample without replacement; the round-9 matches the
    oracle's literal so last-ulp log/div differences can't flip
    membership."""
    key = seeded_md5(F.col(id_col), seed)
    u = (
        F.conv(F.substring(key, 1, 13), 16, 10).cast("double") + 1.0
    ) / F.lit(float(16**13))
    return F.round(-F.log(u) / F.col(weight_col).cast("double"), 9)


def _bucket2(id_col: Column) -> Column:
    """First 2 hex chars of md5(id) — a uniform value in 256 buckets,
    compared lexicographically (hex strings are fixed-width lowercase,
    so string order == numeric order in every engine)."""
    return F.substring(id_md5(id_col), 1, 2)


def split_column(
    id_col: Column,
    cuts: Sequence[tuple[str, str]] = (("train", "cc"), ("val", "e6")),
    default: str = "test",
) -> Column:
    """Deterministic split label from a stable id.

    ``cuts`` are (label, exclusive-upper-bound) pairs over the 2-hex-char
    md5 prefix, checked in order; rows above every bound get ``default``.
    The default boundaries ('cc'=204, 'e6'=230) give ≈79.7 / 10.2 / 10.1 %.
    NULL ids get ``default`` (SQL CASE semantics: every NULL comparison
    falls through to the otherwise branch — same on both engines; if
    null-id rows must not pool in the default split, filter or
    backfill ids upstream).
    """
    if not cuts:
        raise ValueError("cuts must contain at least one (label, bound)")
    for _label, bound in cuts:
        # fixed-width lowercase hex, or the lexicographic compare is
        # silently wrong (uppercase sorts before lowercase letters:
        # 'CC' ≈ 62% where 'cc' = 79.7% — r11 review); mirrors
        # sample_threshold_hex's validation of the same recipe
        if len(bound) != 2 or bound.lower() != bound or any(
            c not in "0123456789abcdef" for c in bound
        ):
            raise ValueError(
                f"cut bound {bound!r} must be 2 lowercase hex chars"
            )
    b = _bucket2(id_col)
    expr = None
    for label, bound in cuts:
        cond = b < F.lit(bound)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(F.lit(default))


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by a 16-bit md5-prefix
    threshold on ``id_col`` — the same rows on every run, engine, and
    partitioning. Granularity is 1/65536; ``fraction >= 1`` keeps
    everything, ``<= 0`` keeps nothing."""
    if fraction >= 1.0:
        return df
    if fraction <= 0.0:
        return df.filter(F.lit(False))
    prefix = F.substring(id_md5(F.col(id_col)), 1, 4)
    return df.filter(prefix < F.lit(sample_threshold_hex(fraction)))


def sample_threshold_hex(fraction: float) -> str:
    """The 4-hex-char threshold ``deterministic_sample`` compares
    against — exposed so SQL oracles embed the identical literal. Only
    meaningful for 0 < fraction < 1 (a 5-char '10000' would compare
    wrongly against 4-char prefixes, so it is rejected)."""
    if not 0.0 < fraction < 1.0:
        raise ValueError(f"fraction must be in (0, 1), got {fraction}")
    return format(min(int(fraction * 65536), 65535), "04x")


def mixture_thresholds(
    rates: dict[str, float]
) -> dict[str, str]:
    """Per-stratum hex thresholds for ``mixture_sample`` — exposed so
    SQL oracles embed identical literals. rate>=1 → 'g' (every 4-hex
    prefix sorts below it), rate<=0 → '0000' (nothing sorts below)."""
    return {
        k: "g" if r >= 1.0 else ("0000" if r <= 0.0 else
                                 sample_threshold_hex(r))
        for k, r in rates.items()
    }


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Corpus-mixture construction: keep each row with its stratum's
    rate (per-source / per-language up- and down-weighting, the Dolma /
    Pile mixing step), decided by the shared md5-prefix recipe so
    membership is reproducible across engines, runs, and partitionings.

    Pure per-row filter — no shuffle, no RNG state, linear at 100 TB;
    the stratum column stays available for downstream mixture audits.
    """
    prefix = F.substring(id_md5(F.col(id_col)), 1, 4)
    thresholds = mixture_thresholds(rates)
    default_thr = mixture_thresholds({"_": default_rate})["_"]
    thr = None
    for val, bound in thresholds.items():
        cond = F.col(stratum_col) == F.lit(val)
        thr = (
            F.when(cond, bound) if thr is None else thr.when(cond, bound)
        )
    thr = F.lit(default_thr) if thr is None else thr.otherwise(default_thr)
    return df.filter(prefix < thr)


def global_shuffle_position(
    df: DataFrame, id_col: str, seed: int = 42, bucket_chars: int = 3
) -> DataFrame:
    """Deterministic global shuffle: assign every row its position in
    the md5(seed:id) permutation — the training-data shuffling step
    (epoch order must be reproducible across runs and engines, unlike
    ``df.orderBy(rand())``).

    Scale design: a naive ``row_number() OVER (ORDER BY hash)`` is a
    single-partition window — a 100 TB corpus would serialize through
    one task. Instead the permutation rank is computed in two phases on
    the hash's own prefix, mirroring how the range-partitioned global
    sort works (the reference's UniformRangePartition,
    tajo-core/.../planner/UniformRangePartition.java:48, computes sort
    ranges the same way — from key-space structure, not data movement):

    1. bucket = first ``bucket_chars`` hex chars of the hash (4096
       buckets by default) → per-bucket ``row_number`` over a window
       PARTITIONED by bucket (parallel, each bucket ~|rows|/4096);
    2. bucket row-counts (4096-row aggregate) → cumulative offsets via
       one tiny single-partition window over metadata-sized input,
       broadcast-joined back.

    position = offset(bucket) + rank-within-bucket, and because the
    bucket is a prefix of the hash, (bucket, hash, id) order equals
    (hash, id) order — the result is the exact global permutation rank,
    reproducible on any engine with md5.
    """
    # F.concat (not concat_ws): NULL ids must yield a NULL key exactly
    # like the oracle's `md5('seed:' || NULL)` — concat_ws silently
    # drops NULLs and would collapse every NULL-id row onto md5(seed)
    key = seeded_md5(F.col(id_col), seed)
    from pyspark.sql import Window as W

    # NULL keys ride a sentinel bucket that sorts AFTER every hex
    # prefix ('z' > 'f'), mirroring the oracle's ASC NULLS LAST default
    # — a bare substring would leave __bk NULL and the null-unsafe
    # bucket join below would silently drop those rows while their
    # count still shifted every cumulative offset
    sentinel = "z" * bucket_chars
    keyed = df.withColumn("__sk", key).withColumn(
        "__bk",
        F.coalesce(
            F.substring(F.col("__sk"), 1, bucket_chars), F.lit(sentinel)
        ),
    )
    in_bucket = F.row_number().over(
        W.partitionBy("__bk").orderBy("__sk", id_col)
    )
    # unpartitioned window is BOUNDED by construction: it runs over the
    # per-bucket aggregate (≤ 16^bucket_chars + 1 sentinel rows at any
    # corpus size), never the input — the single-partition WindowExec
    # warning is benign here (r13 Window audit)
    offsets = (
        keyed.groupBy("__bk")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    W.orderBy("__bk").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("__n")
    )
    return (
        keyed.join(F.broadcast(offsets), "__bk")
        .withColumn("shuffle_pos", (F.col("__off") + in_bucket).cast("long"))
        .drop("__sk", "__bk", "__off")
    )


def weighted_reservoir_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-
    Spirakis exponential-sort key (2006): row i gets
    ``r_i = -ln(u_i) / w_i`` and the k SMALLEST r win — provably a
    weighted sample without replacement, and (unlike sequential
    reservoir algorithms) embarrassingly parallel: the key is a pure
    projection, selection is one top-k.  The quality-weighted subset
    selection step of curation pipelines ("keep 1M docs, prefer high
    quality/length") that a plain `ORDER BY weight LIMIT k` gets wrong
    (that's argmax, not sampling — it has zero diversity).

    Determinism: u_i comes from the shared md5 recipe
    (``md5(seed:id)`` first 13 hex digits → 52-bit uniform in (0,1]),
    so any engine reproduces the same sample; the key is rounded to 9
    decimals BEFORE ranking on both engines (ties broken by id) so
    last-ulp ``ln`` differences between libm implementations cannot
    flip the cut (same discipline as the kmeans centroid rounding).
    Rows with NULL or non-positive weight are excluded.

    Scale shape (100 TB): zero-shuffle key projection +
    TakeOrderedAndProject (per-partition top-k, k rows to the driver
    stage) — no global sort, no window.
    """
    r = _es_key(id_col, weight_col, seed)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__es", r)
        # NULLS LAST: a NULL-id row has a NULL E-S key; Spark's ASC
        # default is nulls-FIRST (it would displace k real sample
        # members) while the oracle's ORDER BY default is nulls-last
        # (r11 review)
        .orderBy(F.col("__es").asc_nulls_last(), id_col)
        .limit(k)
        .select(
            id_col,
            F.col(weight_col).alias("w"),
            F.col("__es").alias("es_key"),
        )
    )


def weighted_reservoir_by(
    df: DataFrame,
    k_per_group: int,
    weight_col: str,
    group_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-stratum weighted sampling without replacement: the
    Efraimidis-Spirakis key of :func:`weighted_reservoir_sample`,
    ranked WITHIN each group — "k docs per language, length-weighted",
    the stratified form every mixture pipeline wants (global sampling
    lets a dominant stratum crowd out the tail).

    Scale shape: zero-shuffle key projection + ONE window shuffle
    keyed on the group column (rank within group, rows stop at
    ``k_per_group``) — same plan family as ``sample_stratified_topk``;
    group-size skew is bounded by the groups themselves (languages,
    sources), and the window emits at most k rows per group.
    """
    from pyspark.sql import Window as W

    r = _es_key(id_col, weight_col, seed)
    # nulls-last for the same reason as weighted_reservoir_sample
    w = W.partitionBy(group_col).orderBy(
        F.col("__es").asc_nulls_last(), id_col
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__es", r)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_per_group)
        .select(
            id_col,
            F.col(group_col).alias("grp"),
            F.col(weight_col).alias("w"),
            F.col("__es").alias("es_key"),
        )
    )


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-flattened corpus mixing: downsample common strata so
    source shares follow ``share^(1/T)`` — the multilingual/multi-source
    sampling rule of public LM pipelines (mBERT/XLM-R style; T=1 keeps
    natural proportions, T→∞ approaches uniform).

    Per stratum s with natural share p_s, the relative boost is
    ``p_s^(1/T - 1)``; normalizing by the max boost gives keep-rates in
    (0, 1] with the rarest stratum kept in full. Membership then rides
    the shared md5-prefix recipe, so the sample is reproducible across
    engines and partitionings.

    Scale design: the stratum histogram is a metadata-sized two-phase
    agg (|strata| rows); rates broadcast back; the filter itself is
    per-row. One tiny shuffle + one broadcast join at any corpus size.

    Rates are rounded to 6 decimals BEFORE the 16-bit threshold
    conversion on both engines — pow() last-ulp differences must not
    flip a threshold bucket.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    # NULL strata are excluded from the histogram AND the output (the
    # null-unsafe join below drops their rows on both engines anyway —
    # r11 review: counted in the histogram, a tiny NULL stratum could
    # claim the max boost and silently downsample the rarest REAL
    # stratum, breaking the kept-in-full guarantee)
    counts = (
        df.filter(F.col(stratum_col).isNotNull())
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    tot = counts.agg(F.sum("__c").alias("__tot"))
    exp = 1.0 / temperature - 1.0
    boosted = counts.join(F.broadcast(tot)).withColumn(
        "__boost", F.pow(F.col("__c") / F.col("__tot"), F.lit(exp))
    )
    mx = boosted.agg(F.max("__boost").alias("__mx"))
    rates = (
        boosted.join(F.broadcast(mx))
        .withColumn(
            "keep_rate", F.round(F.col("__boost") / F.col("__mx"), 6)
        )
        .withColumn(
            "__thr",
            F.when(F.col("keep_rate") >= 1.0, F.lit("g")).otherwise(
                F.lpad(
                    F.lower(
                        F.hex(
                            F.floor(F.col("keep_rate") * 65536).cast("int")
                        )
                    ),
                    4,
                    "0",
                )
            ),
        )
        .select(stratum_col, "keep_rate", "__thr")
    )
    prefix = F.substring(id_md5(F.col(id_col)), 1, 4)
    return (
        df.withColumn("__pfx", prefix)
        .join(F.broadcast(rates), stratum_col)
        .filter(F.col("__pfx") < F.col("__thr"))
        .drop("__pfx", "__thr")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    two_stage: bool = True,
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen by ``order_by`` — the
    per-domain document cap of C4/RefinedWeb-style curation (no single
    domain may dominate the training mix).  ``order_by`` must be a
    deterministic total order (include a unique id as the last key) or
    the kept set is not reproducible.

    Scale design: a bare ``row_number() OVER (PARTITION BY domain)``
    shuffles EVERY row of a hot domain into one task — the classic
    skew killer when one domain holds 10% of a 100 TB corpus.  With
    ``two_stage`` (default), a pre-stage first ranks rows within
    (group, input-partition) and keeps only ``k`` per cell — correct
    for ANY partitioning, because a row in the global top-k of its
    group is in the top-k of every subset containing it.  Each
    pre-stage window cell is at most one scan partition's share of the
    group, so no task sees the whole hot domain; the exact final
    window then ranks at most ``k × num_partitions`` survivors per
    group — bounded, and in practice metadata-sized.
    """
    from pyspark.sql import Window as W

    final = F.row_number().over(
        W.partitionBy(*group_cols).orderBy(*order_by)
    )
    if two_stage:
        # materialize the scan-partition id in a Project first: it is
        # non-deterministic, which a window PARTITION BY spec rejects
        pre = F.row_number().over(
            W.partitionBy("__cell", *group_cols).orderBy(*order_by)
        )
        df = (
            df.withColumn("__cell", F.spark_partition_id())
            .withColumn("__pre_rn", pre)
            .filter(F.col("__pre_rn") <= k)
            .drop("__pre_rn", "__cell")
        )
    return (
        df.withColumn("__rn", final)
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_token_plan(
    docs: DataFrame,
    shares: dict[str, float],
    token_budget: int,
    max_epochs: float = 4.0,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixture planner: turn target mixture ``shares`` and
    a total ``token_budget`` into a per-language data recipe, honoring
    the data-constrained repetition cap (epochs <= ``max_epochs`` —
    past ~4 epochs repeated data stops helping, Muennighoff et al.
    2023, arXiv:2305.16264).

    Returns one row per corpus language:
    ``(lang, available_tokens, target_tokens, epochs, realized_tokens,
    deficit)`` where ``epochs`` is the capped repetition factor the
    loader should use and ``deficit`` is what the cap leaves unfilled
    (to be re-allocated or accepted by the caller — re-allocation is a
    policy choice, not computed here).

    Cost shape: ONE corpus scan into a LANGUAGES-row aggregate
    (map-side partial sums), then pure projections — the plan is a
    broadcast-sized table no matter the corpus size.  Languages outside
    ``shares`` get share 0 (available but unbudgeted), and budgeted
    languages with NO corpus documents still get a row (available 0,
    epochs 0, full deficit) — dropping them would silently lose their
    slice of the budget, which is exactly the signal ``deficit`` exists
    to surface.
    """
    from tajo_spark.operators import text as T

    share_expr = F.lit(0.0)
    for lang, s in shares.items():
        share_expr = F.when(F.col(lang_col) == lang, float(s)).otherwise(
            share_expr
        )
    spark = docs.sparkSession
    spine = spark.createDataFrame(
        [(lang,) for lang in shares], f"{lang_col} string"
    )
    avail = (
        docs.filter(F.col(text_col).isNotNull())
        .groupBy(lang_col)
        .agg(F.sum(T.token_count(F.col(text_col))).alias("available_tokens"))
        .join(spine, lang_col, "full_outer")
        .select(
            lang_col,
            F.coalesce("available_tokens", F.lit(0)).alias(
                "available_tokens"
            ),
        )
    )
    target = F.round(F.lit(float(token_budget)) * share_expr, 0).cast("long")
    capped = F.round(
        F.least(
            target.cast("double"),
            F.col("available_tokens") * F.lit(float(max_epochs)),
        ),
        0,
    ).cast("long")
    return avail.select(
        lang_col,
        "available_tokens",
        target.alias("target_tokens"),
        F.when(F.col("available_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.least(
                    target / F.col("available_tokens"),
                    F.lit(float(max_epochs)),
                ),
                4,
            )
        )
        .alias("epochs"),
        capped.alias("realized_tokens"),
        (target - capped).alias("deficit"),
    )


EPOCH_SEED = 99


def materialize_epochs(
    docs: DataFrame,
    plan: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = EPOCH_SEED,
) -> DataFrame:
    """Turn a mixture plan's fractional ``epochs`` into the actual
    repeated training sample: each doc appears ``floor(epochs)`` times
    plus one more with probability ``epochs - floor(epochs)`` — so the
    expected per-language token count matches the plan exactly, and
    ``epochs < 1`` degrades to plain downsampling.  The extra-copy coin
    is ``md5(seed:doc_id)``, so membership is a pure function of
    (plan, seed): reproducible across engines, restarts, and workers.

    Returns ``(id_col, lang, epoch)`` — one row per materialized copy,
    ``epoch`` in ``0..copies-1`` so an epoch-aware loader can interleave
    repeats instead of concatenating them.

    Cost shape: ``plan`` is a LANGUAGES-row broadcast; everything else
    is a per-row projection + explode whose fan-out IS the requested
    repetition (output tokens ≈ realized plan tokens, the floor of any
    materialization).  No shuffle at all.
    """
    n_full = F.floor(F.col("epochs")).cast("int")
    frac = F.round(F.col("epochs") - n_full, 4)
    u = (
        F.conv(
            F.substring(seeded_md5(F.col(id_col), seed), 1, 6), 16, 10
        ).cast("double")
        + 0.5
    ) / F.lit(float(16**6))
    # coalesce: a NULL-id doc has a NULL coin flip — it must still get
    # its floor(epochs) deterministic full copies (the oracle's CASE
    # ... ELSE 0 END), not a NULL copies that explodes to zero rows
    # (r11 review: silent token-volume loss vs the plan)
    copies = (
        n_full + F.coalesce((u < frac).cast("int"), F.lit(0))
    ).alias("copies")
    return (
        docs.join(F.broadcast(plan.select(lang_col, "epochs")), lang_col)
        .select(id_col, lang_col, copies)
        .select(
            id_col,
            lang_col,
            F.explode(
                F.when(
                    F.col("copies") > 0,
                    F.sequence(F.lit(0), F.col("copies") - 1),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("epoch"),
        )
    )
