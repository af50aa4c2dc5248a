"""Sharded training-data export: pack a corpus into size-bounded,
deterministically shuffled shard files plus a manifest — the terminal
sink of an LLM data pipeline (WebDataset/parquet-shard style loaders
consume fixed-size shards in a reproducible order).

Beyond-reference capability. Scale design:

* Shard assignment needs each row's CUMULATIVE byte offset in a
  deterministic global order.  A ``sum() OVER (ORDER BY ...)`` global
  window is a single-partition sort — the same scale killer
  ``global_shuffle_position`` (operators/sampling.py) avoids, and the
  fix is identical: bucket rows by a hex prefix of the order key,
  accumulate bytes inside each bucket in parallel, then
  broadcast-join the (tiny) per-bucket byte offsets back.  No task
  ever materializes more than one bucket (~1/4096 of the corpus).
* The order key is ``md5(seed:id)`` — so shards come out *shuffled*
  (a training-data requirement: each shard is an unbiased sample of
  the corpus, not a time- or source-contiguous slice) and the whole
  layout is reproducible across runs and engines from (seed, ids).
* ``shard_id = floor(cum_bytes_before / shard_bytes)``: every row
  lands in exactly one shard; a shard may overflow its target by at
  most one document, so the bound ``total_bytes < shard_bytes +
  max_doc_bytes`` holds without a second balancing pass and the rule
  stays pure SQL (oracle-checkable) — the streaming-friendly
  alternative to bin-packing heuristics whose output depends on
  arrival order (operators/packing.py covers the within-partition
  next-fit variant for token sequences).
* The physical write is ``partitionBy(shard_id)`` — one directory per
  shard, written by whichever tasks hold its rows; no repartition is
  forced, because a loader reads a shard as a directory, not a file.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# ONE copy of the shard filename rule shared by writer, cleaner, and
# verifier (r11 review: the regex literal was duplicated at two call
# sites in verify alone)
_SHARD_NAME_RE = _re.compile(r"shard-(\d+)\.tar$")


def shard_assign(
    df: DataFrame,
    id_col: str,
    bytes_col: str,
    shard_bytes: int,
    seed: int = 42,
    bucket_chars: int = 3,
    base_bytes: int = 0,
) -> DataFrame:
    """Add ``shard_id``: the row's shard under a deterministic
    md5-shuffled order and a ``shard_bytes`` target size.

    ``base_bytes`` offsets the cumulative counter — the continuation
    point for incremental export (streaming micro-batches keep filling
    the last partial shard instead of opening a fresh one per batch;
    see streaming/pipeline.py::shard_export_stream).

    The bucketed-prefix-cumsum scaffolding (md5 key, 'zzz' NULL
    sentinel, per-bucket window, broadcast offsets) mirrors
    operators/sampling.py::global_shuffle_position, where the NULL-key
    and sentinel-ordering rationale is documented — keep the two in
    lockstep when touching either."""
    key = F.md5(
        F.concat(
            F.lit(f"{seed}:"), F.col(id_col).cast("string")
        ).cast("binary")
    )
    sentinel = "z" * bucket_chars  # NULL ids sort after every hex prefix
    keyed = df.withColumn("__sk", key).withColumn(
        "__bk",
        F.coalesce(
            F.substring(F.col("__sk"), 1, bucket_chars), F.lit(sentinel)
        ),
    )
    in_bucket_before = F.coalesce(
        F.sum(bytes_col).over(
            W.partitionBy("__bk")
            .orderBy("__sk", id_col)
            .rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    # unpartitioned window is BOUNDED by construction: it runs over the
    # per-bucket aggregate (≤ 16^bucket_chars + 1 sentinel rows at any
    # corpus size), never the input — the single-partition WindowExec
    # warning is benign here (r13 Window audit)
    offsets = (
        keyed.groupBy("__bk")
        .agg(F.sum(bytes_col).alias("__n"))
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
        .withColumn(
            "shard_id",
            F.floor(
                (F.lit(base_bytes) + F.col("__off") + in_bucket_before)
                / F.lit(shard_bytes)
            ).cast("long"),
        )
        .drop("__sk", "__bk", "__off")
    )


def shard_manifest(sharded: DataFrame, bytes_col: str) -> DataFrame:
    """Per-shard manifest: (shard_id, n_docs, total_bytes)."""
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bytes_col).cast("long").alias("total_bytes"),
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    bytes_col: str,
    shard_bytes: int,
    seed: int = 42,
) -> DataFrame:
    """Write ``df`` as shard directories under ``path`` plus a
    ``_manifest`` dataset; returns the manifest DataFrame."""
    sharded = shard_assign(df, id_col, bytes_col, shard_bytes, seed=seed)
    sharded.write.partitionBy("shard_id").mode("overwrite").parquet(
        f"{path}/shards"
    )
    spark = df.sparkSession
    manifest = shard_manifest(
        spark.read.parquet(f"{path}/shards"), bytes_col
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/_manifest"
    )
    return spark.read.parquet(f"{path}/_manifest")


def verify_shards(spark, path: str, bytes_col: str) -> DataFrame:
    """Integrity check of a shard export: re-derive each shard's
    (n_docs, total_bytes) from the shard FILES and compare against the
    persisted ``_manifest`` — the consumer-side trust-but-verify step
    before a training run commits to a dataset (a partial upload, a
    lost part file, or a manifest from a stale write all surface as
    mismatches here, BEFORE the loader silently trains on a truncated
    corpus).

    Returns one row per shard id present on either side:
    ``(shard_id, manifest_docs, actual_docs, manifest_bytes,
    actual_bytes, ok)``.  Cost: one scan of the shard files into a
    SHARDS-row aggregate + a broadcast-sized full-outer join with the
    manifest — verification costs a read of the data it certifies,
    nothing more.
    """
    actual = shard_manifest(
        spark.read.parquet(f"{path}/shards"), bytes_col
    ).select(
        "shard_id",
        F.col("n_docs").alias("actual_docs"),
        F.col("total_bytes").alias("actual_bytes"),
    )
    manifest = spark.read.parquet(f"{path}/_manifest").select(
        "shard_id",
        F.col("n_docs").alias("manifest_docs"),
        F.col("total_bytes").alias("manifest_bytes"),
    )
    coalesced = manifest.join(actual, "shard_id", "full_outer").select(
        "shard_id",
        F.coalesce("manifest_docs", F.lit(0)).alias("manifest_docs"),
        F.coalesce("actual_docs", F.lit(0)).alias("actual_docs"),
        F.coalesce("manifest_bytes", F.lit(0)).alias("manifest_bytes"),
        F.coalesce("actual_bytes", F.lit(0)).alias("actual_bytes"),
    )
    # ok derives from the SAME coalesced columns the report shows, so a
    # future change to the absent-side default cannot diverge from it
    return coalesced.withColumn(
        "ok",
        (F.col("manifest_docs") == F.col("actual_docs"))
        & (F.col("manifest_bytes") == F.col("actual_bytes")),
    )


TAR_MANIFEST_DDL = (
    "shard_id BIGINT, n_items BIGINT, content_bytes BIGINT, "
    "tar_bytes BIGINT, tar_sha256 STRING"
)


def export_tar_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    content_col: str = "content",
    shard_bytes: int = 1 << 20,
    seed: int = 42,
) -> DataFrame:
    """WebDataset-style tar shard export for multimodal corpora: rows
    pack into size-bounded tar files, one entry pair per sample
    (``{id}.bin`` payload + ``{id}.json`` metadata), shards laid out by
    the same deterministic md5-shuffled :func:`shard_assign` rule as
    the parquet export.  The de-facto loader format for image/audio
    training data (a WebDataset reader streams tars sequentially — no
    per-sample seeks, object-store friendly).

    Determinism/task-retry safety: entries are written in id order
    with fixed timestamps/uid/gid, so a shard's BYTES are a pure
    function of its rows — a retried or speculatively-executed task
    rewrites an identical file through the :mod:`fsio` seam (local:
    atomic temp+rename; object store: one PUT).  ``path`` may be a
    URI (``s3://…``, ``hdfs://…``, ``file://…``) — byte I/O dispatches
    by scheme via pyarrow.fs, executor-side, no JVM gateway
    needed.  Returns the manifest (shard_id, n_items,
    content_bytes, tar_bytes, tar_sha256), also persisted at
    ``path/_manifest``; the tar write itself is ONE
    ``groupBy(shard_id).applyInPandas`` pass — each shard's samples
    land on one executor, bounded by shard_bytes, never the driver.

    Metadata JSON carries every non-id, non-content column (sorted
    keys, compact separators — byte-stable across engines).
    """
    import hashlib
    import io
    import json
    import tarfile

    import pandas as pd

    from tajo_spark.operators import fsio

    fsio.makedirs(path)
    # clear stale shards from a previous export to the same path (r11
    # review): the manifest was overwritten but leftover
    # shard-NNNNNN.tar files beyond the new corpus's count survived —
    # a WebDataset loader globbing shard-*.tar then trains on the old
    # corpus's tail, and verify reports them failed forever. Mirrors
    # the parquet path's mode('overwrite') semantics.
    for name in fsio.listdir(path):
        if _SHARD_NAME_RE.fullmatch(name):
            fsio.delete_file(fsio.join(path, name))
    meta_cols = [
        c for c in df.columns if c not in (id_col, content_col)
    ]
    # integral metadata columns, so the pandas NULL-promotion to
    # float64 can be undone before JSON (42 stays 42, not 42.0)
    int_meta = {
        f.name
        for f in df.schema.fields
        if f.name in meta_cols
        and f.dataType.simpleString() in ("tinyint", "smallint", "int", "bigint")
    }
    nb = (
        F.octet_length(F.col(content_col)).cast("long").alias("__nb")
    )
    sharded = shard_assign(
        df.withColumn("__nb", nb),
        id_col,
        "__nb",
        shard_bytes,
        seed=seed,
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["shard_id"].iloc[0])
        pdf = pdf.sort_values(id_col)
        # column-wise extraction once, then a plain-list loop:
        # pandas iterrows() paid ~10x this in per-row Series
        # construction and dominated the export leg of the sf1
        # spot-bench (r08 ratio 6.1x; the verify leg was flat)
        ids = pdf[id_col].tolist()
        payloads = pdf[content_col].tolist()
        meta_lists = [pdf[c].tolist() for c in meta_cols]
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for i, id_v in enumerate(ids):
                # any id type (r11 review: int() crashed on string ids
                # that shard_assign itself accepts, and truncated
                # floats into colliding entry names); NULL ids — the
                # sentinel bucket rows — get a per-shard ordinal name,
                # and '/' is sanitized out of entry names (URL ids)
                # collision-free escape: '%'→'%25' then '/'→'%2F'
                # (a lossy replace('/', '_') collided 'a/b' with 'a_b'
                # into the same entry names — ADVICE r11; identity for
                # ids containing neither char, so existing exports are
                # byte-stable)
                sid = (
                    f"__null_{i}"
                    if id_v is None or (isinstance(id_v, float) and pd.isna(id_v))
                    else str(id_v).replace("%", "%25").replace("/", "%2F")
                )
                payload = b"" if payloads[i] is None else bytes(payloads[i])

                def _jval(c, v):
                    if v is None or (
                        isinstance(v, float) and pd.isna(v)
                    ):
                        return None  # JSON null, never bare NaN
                    if c in int_meta:
                        return int(v)  # undo pandas float promotion
                    return v

                for name, data in (
                    (f"{sid}.bin", payload),
                    (
                        f"{sid}.json",
                        json.dumps(
                            {
                                c: _jval(c, vals[i])
                                for c, vals in zip(meta_cols, meta_lists)
                            },
                            sort_keys=True,
                            separators=(",", ":"),
                            default=str,
                        ).encode(),
                    ),
                ):
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    info.mtime = 0  # byte-stable across runs/retries
                    tar.addfile(info, io.BytesIO(data))
        blob = buf.getvalue()
        final = fsio.join(path, f"shard-{shard_id:06d}.tar")
        # fsio seam: local = temp + atomic rename; object store = one
        # PUT (already atomically visible). Retries rewrite identical
        # bytes either way, so speculative execution stays safe.
        fsio.write_bytes_atomic(final, blob)
        return pd.DataFrame(
            [
                (
                    shard_id,
                    len(pdf),
                    int(pdf["__nb"].sum()),
                    len(blob),
                    hashlib.sha256(blob).hexdigest(),
                )
            ],
            columns=[
                "shard_id",
                "n_items",
                "content_bytes",
                "tar_bytes",
                "tar_sha256",
            ],
        )

    manifest = sharded.groupBy("shard_id").applyInPandas(
        write_shard, schema=TAR_MANIFEST_DDL
    )
    # repartition(1), NOT coalesce(1) (r11 review): coalesce has no
    # shuffle barrier, so it collapsed the applyInPandas stage itself
    # to ONE task — every tar build, sha256, and upload serialized
    # through a single core. The exchange keeps shard writes at full
    # parallelism; only the metadata-sized manifest funnels to one file.
    manifest.repartition(1).write.mode("overwrite").parquet(
        f"{path}/_manifest"
    )
    return df.sparkSession.read.parquet(f"{path}/_manifest")


def verify_tar_shards(spark, path: str) -> DataFrame:
    """Consumer-side integrity check of a tar export: re-read every
    shard FILE (entry count, payload bytes, sha256 of the tar) and
    full-outer join against the persisted manifest — a partial upload,
    lost shard, or stale manifest surfaces as ``ok=false`` BEFORE a
    loader trains on it.  The file list is parallelized into one Arrow
    pass; each task reads whole shards, nothing row-wise."""
    import hashlib
    import io
    import tarfile

    import pandas as pd

    from tajo_spark.operators import fsio

    # Regex, not a fixed-width slice: shard ids >= 1,000,000 widen past
    # %06d and a [6:12] slice would truncate them, mis-joining rows.
    files = sorted(
        f for f in fsio.listdir(path)
        if _SHARD_NAME_RE.match(f)
    )
    listing = spark.createDataFrame(
        [(fsio.join(path, f),) for f in files], "file STRING"
    )

    def read_back(batches):
        for b in batches:
            rows = []
            for fpath in b["file"]:
                blob = fsio.read_bytes(fpath)
                n_items = 0
                content_bytes = 0
                with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
                    for m in tar.getmembers():
                        if m.name.endswith(".bin"):
                            n_items += 1
                            content_bytes += m.size
                m_id = _SHARD_NAME_RE.match(fpath.rsplit("/", 1)[-1])
                rows.append(
                    (
                        int(m_id.group(1)),
                        n_items,
                        content_bytes,
                        len(blob),
                        hashlib.sha256(blob).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard_id",
                    "n_items",
                    "content_bytes",
                    "tar_bytes",
                    "tar_sha256",
                ],
            )

    actual = listing.mapInPandas(read_back, schema=TAR_MANIFEST_DDL)
    manifest = spark.read.parquet(f"{path}/_manifest")
    a = actual.select(
        "shard_id",
        F.col("n_items").alias("actual_items"),
        F.col("content_bytes").alias("actual_content"),
        F.col("tar_sha256").alias("actual_sha"),
    )
    m = manifest.select(
        "shard_id",
        F.col("n_items").alias("manifest_items"),
        F.col("content_bytes").alias("manifest_content"),
        F.col("tar_sha256").alias("manifest_sha"),
    )
    joined = m.join(a, "shard_id", "full_outer").select(
        "shard_id",
        F.coalesce("manifest_items", F.lit(0)).alias("manifest_items"),
        F.coalesce("actual_items", F.lit(0)).alias("actual_items"),
        F.coalesce("manifest_content", F.lit(0)).alias("manifest_content"),
        F.coalesce("actual_content", F.lit(0)).alias("actual_content"),
        "manifest_sha",
        "actual_sha",
    )
    return joined.withColumn(
        "ok",
        (F.col("manifest_items") == F.col("actual_items"))
        & (F.col("manifest_content") == F.col("actual_content"))
        # null-SAFE (r11 review): a zero-entry alien tar with no
        # manifest row has 0==0 counts and a NULL manifest_sha — a
        # plain == made ok NULL, invisible to boolean gates
        & F.col("manifest_sha").eqNullSafe(F.col("actual_sha")),
    )
