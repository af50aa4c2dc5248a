#!/usr/bin/env python
"""Fuzz the pure-Python Avro container parser (sources/avro_py.py).

Same contract as the codec sweep (tools/fuzz_codecs.py): mutated or
truncated container bytes through parse_header/decode_container must
raise ValueError/NotImplementedError only — never struct.error/
KeyError/IndexError/TypeError/EOFError/UnicodeDecodeError/MemoryError,
which would fail a whole scan task undiagnosably.  The varint-heavy
format makes length fields especially easy to blow out, so phase 2
hits every offset of the header region with boundary values.

Usage: python tools/fuzz_avro.py [--trials 1500]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from tajo_spark.sources import avro_py

OK_ERRORS = (ValueError, NotImplementedError)
BREACHES: list[str] = []


def _sample() -> bytes:
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("ok", T.BooleanType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )
    avro_schema = avro_py.spark_to_avro_schema(schema)
    rows = [
        (i, f"name-{i}", i * 0.5, [f"t{i % 3}", "x"], i % 2 == 0,
         bytes([i % 256]) * (i % 7))
        for i in range(200)
    ]
    out = avro_py.encode_container(rows, avro_schema, codec="deflate",
                                   block_rows=64)
    return out


def _try(tag: str, payload: bytes) -> None:
    for name, fn in (("parse_header", avro_py.parse_header),
                     ("decode_container", avro_py.decode_container)):
        try:
            fn(payload)
        except OK_ERRORS:
            pass
        except MemoryError:
            BREACHES.append(f"{name} {tag}: MemoryError")
            print("BREACH:", BREACHES[-1], flush=True)
        except Exception as e:
            BREACHES.append(
                f"{name} {tag}: {type(e).__name__}: {e}")
            print("BREACH:", BREACHES[-1], flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=1500)
    args = ap.parse_args()
    enc = _sample()
    print(f"sample container: {len(enc)} bytes", flush=True)

    # phase 2-style: boundary values at every header-region offset
    vals = [b"\x00", b"\xff", b"\x7f", b"\x80", b"\xff\xff\xff\xff\x0f",
            b"\x80\x80\x80\x80\x80\x80\x80\x80\x80\x01",
            b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"]
    hdr = min(600, len(enc))
    for off in range(hdr):
        for fv in vals:
            if off + len(fv) > len(enc):
                continue
            _try(f"field@{off}", enc[:off] + fv + enc[off + len(fv):])
    # truncation at every boundary
    for cut in range(0, len(enc), max(1, len(enc) // 800)):
        _try(f"trunc@{cut}", enc[:cut])
    # random mutation
    rng = np.random.default_rng(20260816)
    for t in range(args.trials):
        mut = bytearray(enc)
        if t % 3 == 0:
            mut = mut[: int(rng.integers(1, len(mut)))]
        else:
            for _ in range(1 + t % 4):
                mut[int(rng.integers(0, len(mut)))] ^= int(
                    rng.integers(1, 256))
        _try(f"rnd#{t}", bytes(mut))
    # garbage
    for t in range(200):
        _try(f"junk#{t}", bytes(rng.integers(0, 256, int(
            rng.integers(0, 64)), dtype=np.uint8)))
    print(f"\n{len(BREACHES)} breaches")
    return 1 if BREACHES else 0


if __name__ == "__main__":
    sys.exit(main())
