"""Multimodal (image/audio/video) column operators.

Beyond-reference capability for training-data pipelines: media is
carried as an opaque ``binary`` column plus a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the heavy per-item work distributes with the
partitioning and never touches the driver.

Decoding: PNG + baseline JPEG images and WAV audio decode FOR REAL
via the pure-stdlib codecs in operators/codecs.py + operators/jpeg.py
(``fake=False`` paths of decode_image/decode_audio/resize_image/
embed_content — metadata reads parse only the container header,
O(header) per item; image consumers go through codecs.image_* which
dispatch on the sniffed container).  Remaining formats (WebP, MP3,
non-MJPEG video codecs) raise ``NotImplementedError``
there; a deployment drops PIL/ffmpeg into the same kernel seams.  With
``fake=True`` a deterministic fake decoder (seeded by content hash)
stands in — that twin remains the driver-oracle leg, and the
Spark-side plumbing (schemas, batch iteration, partition behavior,
column pruning) is identical on both paths.

Scale notes:
  * ``mapInPandas`` streams Arrow record batches — peak memory is one
    batch, bounded in BYTES, not just rows (Spark 4.x defaults:
    arrow.maxBytesPerBatch 64 MB AND maxRecordsPerBatch 10k,
    whichever trips first — so megabyte-scale media payloads cannot
    inflate a 10k-row batch into gigabytes), not one partition.
  * Binary payloads are pruned unless referenced: metadata-only
    queries never deserialize media bytes (parquet column pruning).
  * Feature extraction emits fixed-width vectors → downstream joins/
    ANN run on compact columns, media bytes dropped at the earliest
    projection.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_DDL = (
    "doc_id BIGINT, n_bytes BIGINT, content_key STRING, "
    "width INT, height INT, channels INT"
)
AUDIO_META_DDL = (
    "doc_id BIGINT, n_bytes BIGINT, content_key STRING, "
    "sample_rate INT, n_samples BIGINT, duration_s DOUBLE"
)
FRAME_DDL = "doc_id BIGINT, frame_idx INT, frame_key STRING"


def attach_binary(docs: DataFrame, payload_col: str = "text") -> DataFrame:
    """documents → (doc_id, content binary, meta struct): the canonical
    multimodal layout. Uses the text payload as stand-in bytes; a real
    corpus reads ``spark.read.format("binaryFile")``."""
    blob = F.col(payload_col).cast("binary")
    return docs.select(
        "doc_id",
        blob.alias("content"),
        F.struct(
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.substring(F.md5(blob), 1, 8).alias("content_key"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _fake_image_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dims derived from the content hash."""
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 3


def decode_image(batch: pd.DataFrame, fake: bool) -> pd.DataFrame:
    from tajo_spark.operators.codecs import image_header

    rows = []
    for doc_id, payload in zip(batch["doc_id"], batch["content"]):
        payload = bytes(payload)
        if fake:
            w, hgt, c = _fake_image_dims(payload)
        else:
            # real container parse — header only, O(header) per image;
            # image_header dispatches PNG/JPEG and raises on gated
            # formats (WebP/GIF need a PIL deployment)
            w, hgt, c = image_header(payload)
        rows.append(
            (
                doc_id,
                len(payload),
                hashlib.md5(payload).hexdigest()[:8],
                w,
                hgt,
                c,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["doc_id", "n_bytes", "content_key", "width", "height",
                 "channels"],
    )


def image_metadata(binary_df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode stage: (doc_id, content) → typed image metadata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield decode_image(batch, fake)

    return binary_df.select("doc_id", "content").mapInPandas(
        run, schema=IMAGE_META_DDL
    )


RESIZED_DDL = (
    "doc_id BIGINT, width INT, height INT, resized BINARY, "
    "resized_key STRING"
)


def resize_image(binary_df: DataFrame, max_side: int = 224,
                 fake: bool = True) -> DataFrame:
    """Resize stage: (doc_id, content) → fixed-bound thumbnail payload.

    With ``fake=False``, PNG payloads resize FOR REAL: stdlib decode →
    exact area-average (block-mean) downsample → PNG re-encode, the
    resized bytes in the output column (operators/codecs.py; non-PNG
    raises there — PIL/opencv widens only that seam).  The fake twin
    derives target dims from the fake decode and emits a
    deterministic payload-key, exercising the same schema/flow.
    Arrow-batched ``mapInPandas`` — per-batch memory is bounded by
    maxRecordsPerBatch, the binary column never transits a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tajo_spark.operators.codecs import (
            block_mean_resize,
            decode_image_px,
            encode_png,
        )

        for batch in batches:
            if not len(batch):
                continue
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["content"]):
                payload = bytes(payload)
                if fake:
                    w, hgt, _ = _fake_image_dims(payload)
                    scale = min(1.0, max_side / max(w, hgt))
                    rw = max(1, int(w * scale))
                    rh = max(1, int(hgt * scale))
                    key = hashlib.md5(
                        payload + f":{rw}x{rh}".encode()
                    ).hexdigest()
                    rows.append(
                        (doc_id, rw, rh, key.encode()[:16], key[:8])
                    )
                    continue
                # PNG/JPEG dispatch; raises on gated formats
                px = decode_image_px(payload)
                hgt, w = px.shape[:2]
                scale = min(1.0, max_side / max(w, hgt))
                rw = max(1, int(w * scale))
                rh = max(1, int(hgt * scale))
                out = encode_png(block_mean_resize(px, rw, rh))
                rows.append(
                    (
                        doc_id,
                        rw,
                        rh,
                        out,
                        hashlib.md5(out).hexdigest()[:8],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "resized",
                         "resized_key"],
            )

    return binary_df.select("doc_id", "content").mapInPandas(
        run, schema=RESIZED_DDL
    )


def decode_audio(batch: pd.DataFrame, fake: bool) -> pd.DataFrame:
    from tajo_spark.operators.codecs import audio_header

    rows = []
    for doc_id, payload in zip(batch["doc_id"], batch["content"]):
        payload = bytes(payload)
        if fake:
            h = hashlib.md5(payload).digest()
            sr = (8000, 16000, 44100, 48000)[h[0] % 4]
            n = 1000 + int.from_bytes(h[1:4], "big") % 100000
        else:
            # real container parse — header only (WAV or FLAC), no
            # frame read; MP3/video stay gated inside audio_header
            sr, n = audio_header(payload)
        rows.append(
            (
                doc_id,
                len(payload),
                hashlib.md5(payload).hexdigest()[:8],
                sr,
                n,
                round(n / sr, 4),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["doc_id", "n_bytes", "content_key", "sample_rate",
                 "n_samples", "duration_s"],
    )


def audio_metadata(binary_df: DataFrame, fake: bool = True) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield decode_audio(batch, fake)

    return binary_df.select("doc_id", "content").mapInPandas(
        run, schema=AUDIO_META_DDL
    )


def sample_frames(binary_df: DataFrame, every_n: int = 10,
                  max_frames: int = 8, fake: bool = True) -> DataFrame:
    """Frame-sampling stage (video → frames): one output row per sampled
    frame. Fan-out happens executor-side inside mapInPandas — no
    explode of materialized frames through a shuffle.

    ``fake=False`` runs on REAL video bytes: MJPEG-in-AVI parses via
    operators/avi.py, only the sampled ``00dc`` chunk spans are read,
    and each sampled frame decodes through the real JPEG codec —
    ``frame_key`` is the md5 of the decoded PIXELS, so the row proves
    an actual decode, not a container skim. Other codecs (H.264 & co)
    raise NotImplementedError at the same seam; a deployment drops
    ffmpeg into this kernel with identical batch shape and schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[tuple[Any, ...]] = []
            for doc_id, payload in zip(batch["doc_id"], batch["content"]):
                payload = bytes(payload)
                if fake:
                    n_frames = min(max_frames, 1 + len(payload) // every_n)
                    key = hashlib.md5(payload).hexdigest()[:8]
                    rows.extend(
                        (doc_id, i, f"{key}:{i * every_n}")
                        for i in range(n_frames)
                    )
                    continue
                from tajo_spark.operators.avi import (
                    decode_avi_frames,
                    video_header,
                )

                _, _, n_total, _ = video_header(payload)
                idxs = list(range(0, n_total, every_n))[:max_frames]
                for i, frame in zip(
                    idxs, decode_avi_frames(payload, idxs)
                ):
                    rows.append(
                        (
                            doc_id,
                            i,
                            hashlib.md5(frame.tobytes()).hexdigest()[:8],
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "frame_idx", "frame_key"]
                )

    return binary_df.select("doc_id", "content").mapInPandas(
        run, schema=FRAME_DDL
    )


def embed_content(binary_df: DataFrame, dim: int = 16,
                  fake: bool = True) -> DataFrame:
    """Feature-extraction stage: content → fixed-width float vector.

    fake twin: deterministic hash projection.  ``fake=False``: a real
    (if simple) visual feature — PNG decode → grayscale → ``dim``
    block means scaled to [-1, 1] (operators/codecs.py; non-PNG raises
    there).  A model deployment swaps the kernel body for a forward
    pass — batch shape and schema identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tajo_spark.operators.codecs import image_gray_signal

        for batch in batches:
            out = []
            for doc_id, payload in zip(batch["doc_id"], batch["content"]):
                payload = bytes(payload)
                if fake:
                    digest = hashlib.sha256(payload).digest()
                    vec = [
                        (digest[i % 32] - 127.5) / 127.5
                        for i in range(dim)
                    ]
                else:
                    sig = image_gray_signal(payload).astype(np.float64)
                    if len(sig) < dim:
                        sig = np.tile(sig, dim)[: dim]
                    bounds = (np.arange(dim + 1) * len(sig)) // dim
                    csum = np.concatenate([[0.0], np.cumsum(sig)])
                    means = (csum[bounds[1:]] - csum[bounds[:-1]]) / (
                        bounds[1:] - bounds[:-1]
                    )
                    vec = ((means - 127.5) / 127.5).tolist()
                out.append((doc_id, vec))
            if out:
                yield pd.DataFrame(out, columns=["doc_id", "embedding"])

    return binary_df.select("doc_id", "content").mapInPandas(
        run, schema="doc_id BIGINT, embedding ARRAY<DOUBLE>"
    )
