"""DSIR: Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) — pick raw-corpus documents that *look like* a small
curated target domain, by importance weights under hashed bag-of-n-gram
language models.

The public recipe, re-expressed as DataFrame algebra:

1. Featurize every document as counts over ``B`` hashed buckets of its
   unigrams + bigrams (the paper's hashed n-gram features).
2. Fit two multinomial bag-of-ngram models over the buckets: ``p_tgt``
   from the target docs, ``p_raw`` from the whole corpus (add-one
   smoothing so every bucket has mass in both).
3. Each candidate's log importance weight is
   ``log w(x) = sum_b c_x[b] * (ln p_tgt[b] - ln p_raw[b])`` — how much
   more likely the doc is under the target model.
4. Resample k docs WITHOUT replacement via the Gumbel top-k trick:
   rank by ``log w + Gumbel(0,1)`` and keep the top k.  Gumbel noise is
   derived from ``md5(seed:doc_id)`` so selection is a pure function of
   (corpus, seed) — reproducible across engines and re-runs.

Scale shape (100 TB): featurization is one explode over tokens+bigrams
(token-linear, zero shuffle) into ONE ``groupBy(doc_id, bucket)``
whose key count per doc is ``min(grams, B)``.  Both bucket models
aggregate FROM that lineage (localCheckpointed — one corpus scan
total), and each is a ``B``-row table (B=1024 → kilobytes), joined
back by BROADCAST.  Scoring is a map-side-combinable groupBy(doc_id);
selection is TakeOrdered top-k, never a global sort.  No stage touches
anything sized by corpus² and the only wide exchange keys are
uniformly-hashed (doc_id, bucket) pairs.

Reference parity note: the reference engine (apache/tajo,
tajo-core/.../function/builtin/*) has no curation layer; this module is
part of the beyond-reference training-data-pipeline surface the repo
adds on the same tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tajo_spark.operators import text
from tajo_spark.operators.dedup import spread_by

DSIR_BUCKETS = 1024
DSIR_SEED = 42


def _bucket(gram: Column, n_buckets: int) -> Column:
    """Cross-engine-deterministic feature hash: first 8 md5 hex digits
    as an int, mod B (same idiom as the Bloom filter's positions —
    DuckDB mirrors it as ``('0x' || substr(md5(g),1,8))::BIGINT % B``)."""
    return (
        F.conv(F.substring(F.md5(gram.cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def doc_bucket_counts(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """``(doc_id, is_target, bucket, c)`` — hashed unigram+bigram
    counts per document.  One explode, one groupBy; the ``is_target``
    flag rides along so the model fits need no join back to ``docs``."""
    grams = F.concat(
        F.filter(text.tokens(F.col(text_col)), lambda t: t != ""),
        text.word_ngrams(F.col(text_col), 2),
    )
    exploded = (
        spread_by(docs, id_col)
        .filter(F.col(text_col).isNotNull())
        .select(
            id_col,
            is_target.alias("is_target"),
            F.explode(grams).alias("gram"),
        )
    )
    return (
        exploded.withColumn("bucket", _bucket(F.col("gram"), n_buckets))
        .groupBy(id_col, "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bucket_log_ratio(
    dcb: DataFrame, n_buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """``(bucket, lam)`` with ``lam = ln p_tgt - ln p_raw`` under
    add-one smoothing, rounded to 8 dp (computed from integer counts,
    so the rounded table is bit-identical across engines).  B rows —
    broadcast-sized by construction."""
    spark = dcb.sparkSession
    tgt = (
        dcb.filter("is_target")
        .groupBy("bucket")
        .agg(F.sum("c").alias("ct"))
    )
    raw = dcb.groupBy("bucket").agg(F.sum("c").alias("cr"))
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    # tgt/raw are <= B rows by construction — broadcast is always
    # correct here, and waiting for AQE to notice costs a sort-merge
    # shuffle of the spine in the initial plan
    joined = (
        spine.join(F.broadcast(tgt), "bucket", "left")
        .join(F.broadcast(raw), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    # totals via a window-free broadcast scalar: aggregate the (already
    # tiny) joined table and cross-join the 1-row result back
    tots = joined.agg(
        F.sum("ct").alias("t_tot"), F.sum("cr").alias("r_tot")
    )
    return (
        joined.join(F.broadcast(tots))
        .select(
            "bucket",
            F.round(
                F.log((F.col("ct") + 1) / (F.col("t_tot") + n_buckets))
                - F.log((F.col("cr") + 1) / (F.col("r_tot") + n_buckets)),
                8,
            ).alias("lam"),
        )
    )


def gumbel_noise(id_col: Column, seed: int = DSIR_SEED) -> Column:
    """Deterministic Gumbel(0,1) draw per id: 24 md5 hex bits →
    ``u ∈ (0,1)`` (half-offset keeps u strictly interior) →
    ``-ln(-ln u)``."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")).cast("binary")),
                1,
                6,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(16**6))
    return -F.log(-F.log(u))


def dsir_select(
    docs: DataFrame,
    is_target: Column,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    seed: int = DSIR_SEED,
) -> DataFrame:
    """Gumbel top-k importance resampling: k non-target docs whose
    hashed-ngram profile is most target-like (noised).  Returns
    ``(doc_id, logw, score)`` — ``logw`` the clean importance weight,
    ``score`` the noised ranking quantity actually used for the draw."""
    dcb = doc_bucket_counts(
        docs, is_target, text_col, id_col, n_buckets
    ).localCheckpoint()
    lam = bucket_log_ratio(dcb, n_buckets)
    scored = (
        dcb.filter(~F.col("is_target"))
        .join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("c") * F.col("lam")), 4).alias("logw"))
        .select(
            id_col,
            "logw",
            F.round(
                F.col("logw") + gumbel_noise(F.col(id_col), seed), 4
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), id_col).limit(k)
