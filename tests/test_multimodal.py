"""Multimodal plumbing tests: schemas, determinism, fan-out shape, and
stub gating. The decode kernels are fakes (no codecs in-container); what
must be right is the Spark-side contract (see operators/multimodal.py)."""

from __future__ import annotations

import pytest

from tajo_spark.catalog import load_table
from tajo_spark.operators import multimodal as M
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def binary_df(spark):
    return M.attach_binary(load_table(spark, SF_DIR, "documents")).cache()


def test_attach_binary_schema(binary_df):
    assert dict(binary_df.dtypes)["content"] == "binary"
    meta = binary_df.schema["meta"].dataType
    assert [f.name for f in meta.fields] == ["n_bytes", "content_key", "mime"]


def test_image_metadata_deterministic(binary_df):
    a = {r.doc_id: (r.width, r.height, r.channels, r.content_key)
         for r in M.image_metadata(binary_df).collect()}
    b = {r.doc_id: (r.width, r.height, r.channels, r.content_key)
         for r in M.image_metadata(binary_df).collect()}
    assert a == b and len(a) == binary_df.count()
    w, h, c, _ = next(iter(a.values()))
    assert 64 <= w < 256 and 64 <= h < 256 and 1 <= c <= 3


def test_audio_metadata_schema(binary_df):
    row = M.audio_metadata(binary_df).first()
    assert row.sample_rate in (8000, 16000, 44100, 48000)
    assert abs(row.duration_s - row.n_samples / row.sample_rate) < 1e-3


def test_frame_sampling_fanout(binary_df):
    frames = M.sample_frames(binary_df, max_frames=4)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per_doc)
    assert len(per_doc) == binary_df.count()


def test_embed_content_fixed_width(binary_df):
    emb = M.embed_content(binary_df, dim=16)
    rows = emb.take(5)
    assert all(len(r.embedding) == 16 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r.embedding)


def test_real_decode_is_gated(binary_df):
    with pytest.raises(Exception) as ei:
        M.image_metadata(binary_df, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_resize_bounds_and_determinism(binary_df):
    out = M.resize_image(binary_df, max_side=128)
    rows = out.collect()
    assert rows, "resize produced no rows"
    assert dict(out.dtypes)["resized"] == "binary"
    for r in rows:
        assert max(r["width"], r["height"]) <= 128
        assert min(r["width"], r["height"]) >= 1
    again = {r["doc_id"]: r["resized_key"] for r in
             M.resize_image(binary_df, max_side=128).collect()}
    assert {r["doc_id"]: r["resized_key"] for r in rows} == again


def test_resize_real_kernel_is_gated(binary_df):
    with pytest.raises(Exception):
        M.resize_image(binary_df, fake=False).collect()
