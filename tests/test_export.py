"""Sharded training-data export (operators/export.py)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tajo_spark.operators import export


def _docs(spark, n=800):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        # uneven doc sizes, 20..420 bytes
        (20 + (F.col("id") * 37) % 400).cast("long").alias("nb"),
    )


def test_shard_assign_matches_global_window(spark):
    docs = _docs(spark).repartition(16)
    got = export.shard_assign(docs, "doc_id", "nb", shard_bytes=4096)
    # reference: single global cumulative window in one partition
    from pyspark.sql import Window as W

    key = F.md5(
        F.concat(F.lit("42:"), F.col("doc_id").cast("string")).cast(
            "binary"
        )
    )
    ref = (
        docs.withColumn("__k", key)
        .withColumn(
            "cb",
            F.coalesce(
                F.sum("nb").over(
                    W.orderBy("__k", "doc_id").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn("shard_id", F.floor(F.col("cb") / 4096).cast("long"))
    )
    assert {(r.doc_id, r.shard_id) for r in got.collect()} == {
        (r.doc_id, r.shard_id) for r in ref.collect()
    }


def test_shard_sizes_bounded_and_ids_contiguous(spark):
    docs = _docs(spark)
    sharded = export.shard_assign(docs, "doc_id", "nb", shard_bytes=4096)
    man = export.shard_manifest(sharded, "nb").collect()
    max_doc = docs.agg(F.max("nb")).first()[0]
    ids = sorted(r.shard_id for r in man)
    assert ids == list(range(len(ids)))  # contiguous from 0
    for r in man:
        # overflow bounded by one document; every non-final shard full
        assert r.total_bytes < 4096 + max_doc
    assert sum(r.n_docs for r in man) == 800


def test_write_shards_roundtrip(spark):
    docs = _docs(spark, n=300)
    path = tempfile.mkdtemp(prefix="tajo_spark_shards_")
    manifest = export.write_shards(
        docs, path, "doc_id", "nb", shard_bytes=2048
    )
    back = spark.read.parquet(f"{path}/shards")
    # every doc present exactly once, with its shard directory key
    assert back.count() == 300
    assert back.select("doc_id").distinct().count() == 300
    per_dir = {
        r.shard_id: r.n
        for r in back.groupBy("shard_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in manifest.collect():
        assert per_dir[r.shard_id] == r.n_docs


def test_shard_assign_no_global_single_partition_window(spark):
    # the data-sized cumulative-bytes window must be PARTITIONED by the
    # hash-prefix bucket; a regression to a naive global running sum
    # would show a window spec ordering on __sk with no partition key
    # (single-partition bottleneck at scale) — same pin as
    # global_shuffle_position's
    import re

    docs = _docs(spark)
    got = export.shard_assign(docs, "doc_id", "nb", shard_bytes=4096)
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition" in plan
    assert not re.search(r"windowspecdefinition\(__sk#\d+ ASC", plan)
    assert re.search(r"windowspecdefinition\(__bk#\d+, __sk#\d+ ASC", plan)


def test_verify_shards_green_and_detects_corruption(spark, tmp_path):
    """The consumer-side integrity gate: a clean export verifies ok on
    every shard; deleting one shard's files surfaces as a mismatch
    instead of a silently truncated corpus."""
    import os
    import shutil

    from pyspark.sql import Row

    from tajo_spark.operators import export as E

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x" * (50 + i % 37)) for i in range(300)],
        "doc_id long, text string",
    ).withColumn("n_bytes", F.length("text").cast("long"))
    path = str(tmp_path / "exp")
    E.write_shards(docs, path, "doc_id", "n_bytes", shard_bytes=4000)
    rep = E.verify_shards(spark, path, "n_bytes").toPandas()
    assert rep.ok.all() and len(rep) >= 2
    # corrupt: drop one shard directory entirely
    victim = sorted(rep.shard_id)[0]
    shutil.rmtree(os.path.join(path, "shards", f"shard_id={victim}"))
    rep2 = E.verify_shards(spark, path, "n_bytes").toPandas().set_index("shard_id")
    assert not rep2.loc[victim, "ok"]
    assert rep2.loc[victim, "actual_docs"] == 0
    assert rep2.drop(index=victim).ok.all()  # other shards still green


def test_tar_shards_roundtrip_and_corruption_detection(spark, tmp_path):
    """WebDataset-style tar export: real binary payloads round-trip
    (entries, payload bytes, sha), deterministic bytes across a
    rewrite, and a corrupted shard file surfaces as ok=false."""
    import hashlib
    import os
    import tarfile

    from tajo_spark.operators.export import (
        export_tar_shards,
        verify_tar_shards,
    )
    from tajo_spark.operators.jpeg import encode_jpeg

    import numpy as np

    rows = []
    for i in range(20):
        g = ((np.arange(24 * 24).reshape(24, 24) + i) % 256).astype(
            np.uint8
        )
        rows.append((i, bytearray(encode_jpeg(g)), f"lang{i % 3}"))
    df = spark.createDataFrame(
        rows, "doc_id LONG, content BINARY, lang STRING"
    )
    path = str(tmp_path / "tars")
    m1 = export_tar_shards(df, path, shard_bytes=4096).collect()
    assert sum(r.n_items for r in m1) == 20
    v = verify_tar_shards(spark, path).collect()
    assert all(r.ok for r in v) and len(v) == len(m1)

    # deterministic: a rewrite produces byte-identical shards
    shas1 = {r.shard_id: r.tar_sha256 for r in m1}
    m2 = export_tar_shards(df, path, shard_bytes=4096).collect()
    assert {r.shard_id: r.tar_sha256 for r in m2} == shas1

    # entries readable as a loader would read them
    first = sorted(
        f for f in os.listdir(path) if f.endswith(".tar")
    )[0]
    with tarfile.open(os.path.join(path, first)) as tar:
        names = tar.getnames()
        assert any(n.endswith(".bin") for n in names)
        assert any(n.endswith(".json") for n in names)

    # corruption: truncate one shard -> its row flips to ok=false
    victim = os.path.join(path, first)
    blob = open(victim, "rb").read()
    open(victim, "wb").write(blob[: len(blob) // 2])
    v2 = {r.shard_id: r.ok for r in verify_tar_shards(spark, path).collect()}
    bad = int(first[6:12])
    assert v2[bad] is False
    assert all(ok for sid, ok in v2.items() if sid != bad)


def test_tar_export_through_file_uri_seam(spark, tmp_path):
    """Object-store seam (VERDICT r06 #3): a ``file://`` URI drives
    the exact pyarrow.fs from_uri dispatch an ``s3://``/``hdfs://``
    path takes — write, list, read-back, and verify all through the
    seam, byte-identical to the POSIX path."""
    import os

    df = spark.createDataFrame(
        [(i, bytearray(f"payload-{i}".encode() * 40), f"s{i % 2}")
         for i in range(12)],
        "doc_id LONG, content BINARY, src STRING",
    )
    from tajo_spark.operators.export import (
        export_tar_shards,
        verify_tar_shards,
    )

    posix = str(tmp_path / "posix")
    uri = "file://" + str(tmp_path / "via_uri")
    m1 = {r.shard_id: r.tar_sha256
          for r in export_tar_shards(df, posix, shard_bytes=2048).collect()}
    m2 = {r.shard_id: r.tar_sha256
          for r in export_tar_shards(df, uri, shard_bytes=2048).collect()}
    assert m1 == m2  # deterministic bytes regardless of backend
    v = verify_tar_shards(spark, uri).collect()
    assert v and all(r.ok for r in v)
    # the URI write really landed where the URI says
    assert any(
        f.endswith(".tar") for f in os.listdir(str(tmp_path / "via_uri"))
    )


def test_verify_tar_parses_wide_shard_ids(spark, tmp_path):
    """ADVICE r06 export.py:317: shard ids >= 1,000,000 widen past
    %06d — the regex parse must keep the full id, not truncate it."""
    import os

    from tajo_spark.operators.export import (
        export_tar_shards,
        verify_tar_shards,
    )

    df = spark.createDataFrame(
        [(i, bytearray(b"x" * 100), "a") for i in range(4)],
        "doc_id LONG, content BINARY, src STRING",
    )
    path = str(tmp_path / "tars")
    export_tar_shards(df, path, shard_bytes=1 << 20)
    # simulate a wide id landing next to the real shard
    src = os.path.join(path, "shard-000000.tar")
    os.rename(src, os.path.join(path, "shard-1000000.tar"))
    ids = {r.shard_id for r in verify_tar_shards(spark, path).collect()}
    assert 1000000 in ids  # full id, not a [6:12]-sliced 100000
    assert 100000 not in ids


def test_tar_reexport_clears_stale_shards(spark, tmp_path):
    """r11 review: re-exporting a smaller corpus to the same path left
    the previous run's surplus shard-*.tar files mixed in — a loader
    globbing shard-*.tar trained on the stale tail. Overwrite now
    clears them, matching the parquet path's mode('overwrite')."""
    import os

    from tajo_spark.operators.export import (
        export_tar_shards,
        verify_tar_shards,
    )

    path = str(tmp_path / "tars")
    big = spark.createDataFrame(
        [(i, bytearray(b"x" * 4000), "a") for i in range(40)],
        "doc_id LONG, content BINARY, src STRING",
    )
    export_tar_shards(big, path, shard_bytes=16000)
    n_big = len([f for f in os.listdir(path) if f.endswith(".tar")])
    assert n_big > 1
    small = spark.createDataFrame(
        [(0, bytearray(b"y" * 100), "a")],
        "doc_id LONG, content BINARY, src STRING",
    )
    export_tar_shards(small, path, shard_bytes=16000)
    tars = [f for f in os.listdir(path) if f.endswith(".tar")]
    assert tars == ["shard-000000.tar"]  # stale shards gone
    v = verify_tar_shards(spark, path)
    assert all(r.ok for r in v.collect())


def test_tar_export_string_ids_and_null_content(spark, tmp_path):
    """r11 review: string ids (URLs) crashed int(); NULL content
    crashed bytes(None); and an alien zero-entry tar made verify's ok
    NULL instead of False (null-unsafe sha compare)."""
    import os
    import tarfile

    from tajo_spark.operators.export import (
        export_tar_shards,
        verify_tar_shards,
    )

    df = spark.createDataFrame(
        [
            ("http://a/x", bytearray(b"abc"), 7),
            ("doc-2", None, None),
            ("doc-3", bytearray(b"def"), 9),
        ],
        "doc_id STRING, content BINARY, score LONG",
    )
    path = str(tmp_path / "tars")
    export_tar_shards(df, path, shard_bytes=1 << 20)
    with tarfile.open(os.path.join(path, "shard-000000.tar")) as tar:
        names = set(tar.getnames())
        # '/' percent-escaped out of entry names (collision-free:
        # 'a/b' and 'a_b' must not share a name — ADVICE r11);
        # integral metadata stays integral in JSON (42 not 42.0),
        # NULL becomes JSON null
        assert "http:%2F%2Fa%2Fx.bin" in names
        meta = tar.extractfile("doc-3.json").read()
        assert meta == b'{"score":9}'
        meta2 = tar.extractfile("doc-2.json").read()
        assert meta2 == b'{"score":null}'

    v = {r.shard_id: r.ok for r in verify_tar_shards(spark, path).collect()}
    assert all(v.values())
    # alien zero-entry tar: ok must be FALSE, not NULL
    import io as _io

    empty = _io.BytesIO()
    tarfile.open(fileobj=empty, mode="w").close()
    with open(os.path.join(path, "shard-000099.tar"), "wb") as fh:
        fh.write(empty.getvalue())
    rows = {r.shard_id: r.ok for r in verify_tar_shards(spark, path).collect()}
    assert rows[99] is False


def test_tar_export_slash_ids_do_not_collide(spark, tmp_path):
    """ADVICE r11: lossy replace('/', '_') collided 'a/b' with 'a_b'
    into the same tar entry names (WebDataset loaders then dedupe
    arbitrarily); the percent-escape keeps them distinct."""
    import os
    import tarfile

    from tajo_spark.operators.export import export_tar_shards

    df = spark.createDataFrame(
        [("a/b", bytearray(b"x"), 1), ("a_b", bytearray(b"y"), 2)],
        "doc_id STRING, content BINARY, score LONG",
    )
    path = str(tmp_path / "tars")
    export_tar_shards(df, path, shard_bytes=1 << 20)
    names = []
    for shard in sorted(os.listdir(path)):
        if shard.endswith(".tar"):
            with tarfile.open(os.path.join(path, shard)) as tar:
                names.extend(tar.getnames())
    bins = sorted(n for n in names if n.endswith(".bin"))
    assert bins == ["a%2Fb.bin", "a_b.bin"]
    assert len(set(names)) == len(names)
