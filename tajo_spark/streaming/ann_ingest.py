"""Continuous embedding ingest into a persisted quantized IVF index.

The production ANN shape at 100 TB is not one-shot index builds: new
embeddings arrive continuously (fresh crawl shards, nightly encoder
runs) and must become searchable without re-reading the corpus.  The
reference has no streaming at all (SURVEY §2.10 — this whole module is
beyond-reference capability, same as streaming/pipeline.py); the
design here extends the incremental-dedup signature-store pattern to
the ANN index:

* the coarse quantizer is **frozen at bootstrap** (the standard
  IVF/FAISS deployment: centroids are fitted once on a sample and new
  vectors are only *assigned*, never re-fitted — re-fitting would
  invalidate every existing posting list);
* each micro-batch assigns map-only against the frozen centroids
  (model metadata broadcast by Spark ML, no shuffle), int8-quantizes,
  and writes ``partitionBy(centroid_id, __batch_id)`` with dynamic
  partition overwrite — a replayed batch rewrites exactly its own
  ``(centroid, batch)`` directories, so crash/replay is idempotent
  (same contract as the sharded-export and dedup-survivor streams);
* probes keep directory-level pruning: ``centroid_id`` stays the
  top-level partition key, so `ivf_q8_shortlist` scans only the
  ``nprobe`` probed centroid directories regardless of how many
  ingest batches have accumulated.  Small-file buildup from many
  micro-batches is the same maintenance problem as any streaming
  sink — `sources/compaction.py` compacts within ``centroid_id=…``
  directories offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tajo_spark.operators.similarity import (
    ivf_assign,
    l2_normalize,
    quantize_int8,
)


def assign_with_frozen_centroids(batch: DataFrame, model) -> DataFrame:
    """Map-only assignment of new vectors against an already-fitted
    KMeans model — the ingest path never re-fits (centroid drift would
    orphan every existing posting).  Same normalized feature space as
    the index build (`ivf_assign`)."""
    from pyspark.ml.functions import array_to_vector

    feat = batch.select(
        "vec_id",
        "embedding",
        array_to_vector(l2_normalize(F.col("embedding"))).alias("features"),
    )
    return (
        model.transform(feat)
        .withColumnRenamed("prediction", "centroid_id")
        .drop("features")
    )


def ivf_append_batch(
    batch: DataFrame, model, index_path: str, batch_id: int
) -> None:
    """Append one ingest batch to the quantized index, idempotently:
    dynamic partition overwrite replaces exactly the
    ``(centroid_id, __batch_id)`` directories this batch produces, so
    a replay of the same ``batch_id`` rewrites rather than duplicates."""
    (
        assign_with_frozen_centroids(batch, model)
        .select(
            "vec_id",
            quantize_int8(F.col("embedding")).alias("q8"),
            "centroid_id",
        )
        .withColumn("__batch_id", F.lit(batch_id).cast("long"))
        .write.partitionBy("centroid_id", "__batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(index_path)
    )


def ivf_ingest_init(
    emb: DataFrame, index_path: str, n_centroids: int = 16, seed: int = 42
):
    """Bootstrap the ingestable index: fit the coarse quantizer ONCE on
    the initial corpus and write it as batch ``-1`` in the same
    ``(centroid_id, __batch_id)`` layout every later append uses
    (`ivf_persist_index_q8`'s flat layout can't be mixed with batch
    partitions in one directory tree).  Returns the frozen model."""
    _, model = ivf_assign(emb, n_centroids=n_centroids, seed=seed)
    ivf_append_batch(emb, model, index_path, batch_id=-1)
    return model


def ivf_ingest_stream(
    stream_df: DataFrame, model, index_path: str, checkpoint: str
):
    """foreachBatch writer appending each micro-batch of (vec_id,
    embedding) rows to the index.  Restartable: the checkpoint tracks
    source progress, and replayed batch ids overwrite their own
    partitions.  Returns the unstarted ``DataStreamWriter`` (caller
    `.start()`s it — same convention as `incremental_dedup_stream`)."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        ivf_append_batch(batch, model, index_path, batch_id)

    return (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


# ---------------------------------------------------------------------------
# IVF-PQ ingest: same frozen-quantizer contract, one level deeper — the
# PQ codebooks are fitted once at bootstrap alongside the coarse
# centroids and new vectors are only ENCODED (assignment + residual
# code lookup, both map-only).  Re-fitting either layer would invalidate
# every persisted code, so the freeze is structural, not an option.


def pq_append_batch(
    batch: DataFrame, model, codebooks, index_path: str, batch_id: int
) -> None:
    """Append one micro-batch of (vec_id, embedding) rows to the
    persisted IVF-PQ index: map-only frozen-centroid assignment, then
    the Arrow-vectorized residual encode (operators/pq.py), written
    ``partitionBy(centroid_id, __batch_id)`` with dynamic overwrite —
    replayed batch ids rewrite exactly their own directories."""
    from tajo_spark.operators.pq import pq_encode_codes

    centers = [list(c) for c in model.clusterCenters()]
    assigned = assign_with_frozen_centroids(batch, model)
    (
        pq_encode_codes(assigned, centers, codebooks)
        .withColumn("__batch_id", F.lit(batch_id).cast("long"))
        .write.partitionBy("centroid_id", "__batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(index_path)
    )


def pq_ingest_init(
    emb: DataFrame,
    index_path: str,
    n_centroids: int = 16,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
):
    """Bootstrap the ingestable IVF-PQ index: fit coarse centroids AND
    PQ codebooks once on the initial corpus (driver-bounded residual
    sample, operators/pq.py::pq_train), write the corpus as batch
    ``-1``.  Returns (model, codebooks) — the frozen state every later
    append and probe shares."""
    import numpy as np

    from tajo_spark.operators.pq import pq_train

    assigned, model = ivf_assign(emb, n_centroids=n_centroids, seed=seed)
    centers = [
        np.asarray(c, dtype="float64") for c in model.clusterCenters()
    ]
    sample = (
        assigned.select(
            "vec_id",
            l2_normalize(F.col("embedding")).alias("vn"),
            "centroid_id",
        )
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        # deterministic + shard-order-unbiased sample (see
        # operators/pq.py::ivf_pq_persist_index), TakeOrdered
        .limit(4096)
        .collect()
    )  # bounded: PQ training sample, independent of corpus size
    res = np.stack(
        [np.asarray(r.vn) - centers[r.centroid_id] for r in sample]
    )
    codebooks = pq_train(res, m=m, ksub=ksub, seed=seed)
    pq_append_batch(emb, model, codebooks, index_path, batch_id=-1)
    return model, codebooks


def pq_ingest_stream(
    stream_df: DataFrame, model, codebooks, index_path: str, checkpoint: str
):
    """foreachBatch writer appending micro-batches to the IVF-PQ index
    under the frozen (centroids, codebooks) pair.  Same restart/replay
    contract as `ivf_ingest_stream`."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        pq_append_batch(batch, model, codebooks, index_path, batch_id)

    return (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def compact_index_batches(
    spark, index_path: str, upto_batch_id: int
) -> dict:
    """Fold committed ingest batches into the base partition — the
    maintenance pass that keeps the ``(centroid_id, __batch_id)`` tree
    from accumulating one directory level per micro-batch (file-count
    growth is the streaming-sink small-files problem;
    sources/compaction.py handles within-directory fragmentation, this
    handles the BATCH DIMENSION).

    Works on both index flavors (int8 ``q8`` and PQ ``codes`` columns
    pass through untouched).  Rows with ``__batch_id <= upto_batch_id``
    are rewritten as batch ``-1`` (the base) and their old batch
    directories removed, so probes scan one directory per probed
    centroid again.

    Safety contract (same offline posture as sources/compaction.py):
    only compact batches BELOW the stream checkpoint's committed
    horizon — foreachBatch never replays a committed batch id, so the
    folded rows can no longer be re-appended; a replay of the one
    in-flight batch (id > ``upto_batch_id``) still overwrites only its
    own directories.  Crash window: the rewrite lands the new base
    before old batch directories are removed, so a crash mid-removal
    leaves duplicates readable until the compaction is re-run.  Re-run
    IS idempotent because the fold deduplicates on ``vec_id`` (unique
    in the index by construction): a re-run that reads the
    already-folded base PLUS leftover batch directories collapses each
    vector back to one row before rewriting — without the dropDuplicates
    the crash-rerun would bake every leftover batch's rows into the
    base twice, permanently.
    """
    import os
    import shutil

    df = (
        spark.read.parquet(index_path)
        .filter(F.col("__batch_id") <= upto_batch_id)
        .dropDuplicates(["vec_id"])
        .withColumn("__batch_id", F.lit(-1).cast("long"))
    )
    before = df.count()
    (
        df.write.partitionBy("centroid_id", "__batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(index_path)
    )
    removed = 0
    for cent_dir in os.listdir(index_path):
        full = os.path.join(index_path, cent_dir)
        if not (os.path.isdir(full) and cent_dir.startswith("centroid_id=")):
            continue
        for batch_dir in os.listdir(full):
            if not batch_dir.startswith("__batch_id="):
                continue
            bid = int(batch_dir.split("=", 1)[1])
            if -1 < bid <= upto_batch_id:
                shutil.rmtree(os.path.join(full, batch_dir))
                removed += 1
    after = spark.read.parquet(index_path).filter(
        F.col("__batch_id") <= upto_batch_id
    ).count()
    return {
        "rows_folded": before,
        "rows_after": after,
        "batch_dirs_removed": removed,
    }
