"""AVRO object-container files without spark-avro on the classpath.

Reference parity: the reference scans Avro natively
(tajo-storage-hdfs/.../avro/AvroScanner.java:53, writer
AvroAppender.java) as one of its catalog formats
(BuiltinStorages.java). Spark's ``spark-avro`` module is a separate
artifact that is not always deployable, so this module implements the
Avro 1.x **object container file** format (a public, fully-specified
binary format: magic ``Obj\\x01``, metadata map carrying the writer
schema JSON + codec, sync-marker-delimited blocks of binary-encoded
rows) in pure Python, executed distributed:

* **read**: one driver-side header peek resolves the writer schema →
  Spark schema. Small files go through a ``binaryFile`` scan → Arrow
  ``mapInArrow`` decode (Spark packs many small files per task). Files
  larger than the session's ``spark.sql.files.maxPartitionBytes`` are
  AUTOMATICALLY split on their sync markers into byte-range fragments
  (the Hadoop input-split contract: a task owns exactly the blocks
  anchored in its range), so one multi-GB container file fans out
  across executors — an upgrade over the reference's fragment-per-file
  unit (AvroScanner.java:53).
* **write**: every partition encodes its Arrow batches into ONE
  container file streamed through ``pyarrow.fs`` (so local, HDFS and
  S3 URIs all work executor-side), emitting a manifest row per file —
  no data ever moves through the driver.

Codecs: ``null`` and ``deflate`` (raw DEFLATE, per the spec — both
sides of the reference's io.compression defaults). Types: all Avro
primitives, records, enums, fixed, arrays, maps, nullable unions, and
the date / timestamp-micros / timestamp-millis logical types.
"""

from __future__ import annotations

import io
import json
import struct
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
_DEFAULT_BLOCK_ROWS = 4096

# ---------------------------------------------------------------------------
# binary primitives (Avro spec: zigzag varint longs, little-endian IEEE)
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _write_str(out: io.BytesIO, s: str) -> None:
    _write_bytes(out, s.encode("utf-8"))


class _Decoder:
    """Bounds-checked binary reader: every primitive raises ValueError
    on truncation or an implausible length instead of letting a raw
    IndexError/struct.error escape a scan task (r08 fuzz sweep,
    tools/fuzz_avro.py — mutated varint length fields are the easiest
    thing to blow out in this format)."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos

    def read_byte(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("truncated Avro data")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def read_long(self) -> int:
        n = shift = 0
        buf, pos, end = self.buf, self.pos, len(self.buf)
        while True:
            if pos >= end:
                raise ValueError("truncated Avro varint")
            b = buf[pos]
            pos += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                self.pos = pos
                return _unzigzag(n)
            shift += 7
            if shift > 63:  # a zigzag long is at most 10 bytes
                raise ValueError("Avro varint longer than 64 bits")

    def read_bytes(self) -> bytes:
        ln = self.read_long()
        if ln < 0 or self.pos + ln > len(self.buf):
            raise ValueError(
                f"Avro bytes length {ln} exceeds remaining input"
            )
        out = self.buf[self.pos : self.pos + ln]
        self.pos += ln
        return bytes(out)

    def read_str(self) -> str:
        return self.read_bytes().decode("utf-8")

    def read_fixed(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.buf):
            raise ValueError(
                f"Avro fixed length {n} exceeds remaining input"
            )
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return bytes(out)


# ---------------------------------------------------------------------------
# schema mapping (Avro JSON <-> Spark types)
# ---------------------------------------------------------------------------


def avro_to_spark_type(schema) -> tuple[T.DataType, bool]:
    """(spark type, nullable) for an Avro schema node."""
    if isinstance(schema, str):
        prim = {
            "null": T.NullType(),
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }
        return prim[schema], schema == "null"
    if isinstance(schema, list):  # union
        branches = [b for b in schema if b != "null"]
        if len(branches) != 1:
            raise NotImplementedError(f"non-simple union: {schema}")
        dt, _ = avro_to_spark_type(branches[0])
        return dt, True
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical == "date":
        return T.DateType(), False
    if logical in ("timestamp-micros", "timestamp-millis"):
        return T.TimestampType(), False
    if logical in ("local-timestamp-micros", "local-timestamp-millis"):
        return T.TimestampNTZType(), False
    if t == "record":
        fields = [
            T.StructField(f["name"], *avro_to_spark_type(f["type"]))
            for f in schema["fields"]
        ]
        return T.StructType(fields), False
    if t == "array":
        dt, nn = avro_to_spark_type(schema["items"])
        return T.ArrayType(dt, containsNull=nn), False
    if t == "map":
        dt, nn = avro_to_spark_type(schema["values"])
        return T.MapType(T.StringType(), dt, valueContainsNull=nn), False
    if t == "enum":
        return T.StringType(), False
    if t == "fixed":
        return T.BinaryType(), False
    return avro_to_spark_type(t)  # {"type": "long", ...} wrapper


def spark_to_avro_schema(schema: T.StructType, name: str = "topLevelRecord"):
    def conv(dt: T.DataType, nullable: bool, path: str):
        if isinstance(dt, T.BooleanType):
            core = "boolean"
        elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            core = "int"
        elif isinstance(dt, T.LongType):
            core = "long"
        elif isinstance(dt, T.FloatType):
            core = "float"
        elif isinstance(dt, T.DoubleType):
            core = "double"
        elif isinstance(dt, T.StringType):
            core = "string"
        elif isinstance(dt, T.BinaryType):
            core = "bytes"
        elif isinstance(dt, T.DateType):
            core = {"type": "int", "logicalType": "date"}
        elif isinstance(dt, T.TimestampNTZType):
            core = {"type": "long", "logicalType": "local-timestamp-micros"}
        elif isinstance(dt, T.TimestampType):
            core = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt, T.ArrayType):
            core = {
                "type": "array",
                "items": conv(dt.elementType, dt.containsNull, path + "_i"),
            }
        elif isinstance(dt, T.StructType):
            core = {
                "type": "record",
                "name": path,
                "fields": [
                    {
                        "name": f.name,
                        "type": conv(f.dataType, f.nullable, path + "_" + f.name),
                    }
                    for f in dt.fields
                ],
            }
        elif isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                # Avro maps require string keys (spec §Maps) — fail at
                # schema-conversion time on the driver, not as an
                # executor-side AttributeError mid-write after the
                # overwrite already wiped the target (r11 review)
                raise NotImplementedError(
                    f"Avro maps require string keys, got {dt.keyType}"
                )
            core = {
                "type": "map",
                "values": conv(dt.valueType, dt.valueContainsNull, path + "_v"),
            }
        else:
            raise NotImplementedError(f"no Avro mapping for {dt}")
        return ["null", core] if nullable else core

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": conv(f.dataType, f.nullable, f.name)}
            for f in schema.fields
        ],
    }


# ---------------------------------------------------------------------------
# value codec
# ---------------------------------------------------------------------------


def _check_count(count: int, dec: _Decoder) -> None:
    """Bound a decoded repeat count by the bytes that remain: items
    consume ≥0 bytes each, so a count wildly past the remaining input
    is corrupt (a fuzzed 2^50 count must not become a 2^50 loop).  The
    slack admits legitimate zero-byte items (null arrays) in sane
    numbers."""
    if count > len(dec.buf) - dec.pos + 65536:
        raise ValueError(f"implausible Avro repeat count {count}")


def _decode_value(schema, dec: _Decoder):
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return dec.read_byte() == 1
        if schema in ("int", "long"):
            return dec.read_long()
        if schema == "float":
            v = struct.unpack("<f", dec.read_fixed(4))[0]
            return v
        if schema == "double":
            v = struct.unpack("<d", dec.read_fixed(8))[0]
            return v
        if schema == "bytes":
            return dec.read_bytes()
        if schema == "string":
            return dec.read_str()
        raise NotImplementedError(schema)
    if isinstance(schema, list):  # union: branch index then value
        bi = dec.read_long()
        if not 0 <= bi < len(schema):
            raise ValueError(f"Avro union branch {bi} out of range")
        return _decode_value(schema[bi], dec)
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical == "date":
        import datetime

        try:
            return datetime.date(1970, 1, 1) + datetime.timedelta(
                days=dec.read_long()
            )
        except OverflowError as exc:
            # corrupt varint → absurd day offset; keep the module's
            # fuzz contract (decode errors are ValueError, r11 review)
            raise ValueError(f"Avro date out of range: {exc}") from exc
    if logical in (
        "timestamp-micros", "timestamp-millis",
        "local-timestamp-micros", "local-timestamp-millis",
    ):
        import datetime

        n = dec.read_long()
        us = n if logical.endswith("micros") else n * 1000
        try:
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                microseconds=us
            )
        except OverflowError as exc:
            raise ValueError(
                f"Avro timestamp out of range: {exc}"
            ) from exc
    if t == "record":
        # dicts, not tuples: Arrow converts dict cells to struct columns
        # for nested records; the top level is unpacked by the caller
        return {f["name"]: _decode_value(f["type"], dec) for f in schema["fields"]}
    if t == "enum":
        si = dec.read_long()
        syms = schema["symbols"]
        if not 0 <= si < len(syms):
            raise ValueError(f"Avro enum index {si} out of range")
        return syms[si]
    if t == "fixed":
        return dec.read_fixed(schema["size"])
    if t == "array":
        out = []
        while True:
            count = dec.read_long()
            if count == 0:
                return out
            if count < 0:
                count = -count
                dec.read_long()  # block byte size, unused
            _check_count(count, dec)
            for _ in range(count):
                out.append(_decode_value(schema["items"], dec))
    if t == "map":
        out = {}
        while True:
            count = dec.read_long()
            if count == 0:
                return out
            if count < 0:
                count = -count
                dec.read_long()
            _check_count(count, dec)
            for _ in range(count):
                # bind the key BEFORE decoding the value: Python
                # evaluates the assignment RHS first, which would consume
                # the value bytes as the key string
                k = dec.read_str()
                out[k] = _decode_value(schema["values"], dec)
    return _decode_value(t, dec)


def _encode_value(schema, v, out: io.BytesIO) -> None:
    if isinstance(schema, str):
        if schema == "null":
            return
        if v is None:
            raise ValueError(
                f"null value for non-nullable Avro type {schema!r} — "
                "declare the Spark column nullable (union with null) or "
                "filter nulls before writing"
            )
        if schema == "boolean":
            out.write(b"\x01" if v else b"\x00")
        elif schema in ("int", "long"):
            _write_long(out, int(v))
        elif schema == "float":
            out.write(struct.pack("<f", float(v)))
        elif schema == "double":
            out.write(struct.pack("<d", float(v)))
        elif schema == "bytes":
            _write_bytes(out, bytes(v))
        elif schema == "string":
            _write_str(out, str(v))
        else:
            raise NotImplementedError(schema)
        return
    if isinstance(schema, list):  # union — pick null vs the value branch
        if v is None:
            idx = schema.index("null")
            _write_long(out, idx)
            return
        idx = next(i for i, b in enumerate(schema) if b != "null")
        _write_long(out, idx)
        _encode_value(schema[idx], v, out)
        return
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical == "date":
        import datetime

        _write_long(out, (v - datetime.date(1970, 1, 1)).days)
        return
    if logical in (
        "timestamp-micros", "timestamp-millis",
        "local-timestamp-micros", "local-timestamp-millis",
    ):
        import datetime

        epoch = datetime.datetime(1970, 1, 1)
        if getattr(v, "tzinfo", None) is not None:
            # convert to the UTC instant, not the wall-clock reading —
            # stripping tzinfo directly would shift the stored
            # epoch-micros by the zone offset
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        if hasattr(v, "to_pydatetime"):
            v = v.to_pydatetime()
        delta = v - epoch
        us = delta.days * 86400_000_000 + delta.seconds * 1_000_000 + delta.microseconds
        _write_long(out, us if logical.endswith("micros") else us // 1000)
        return
    if t == "record":
        if isinstance(v, dict):
            for f in schema["fields"]:
                _encode_value(f["type"], v[f["name"]], out)
        else:
            for f, item in zip(schema["fields"], v):
                _encode_value(f["type"], item, out)
        return
    if t == "array":
        items = list(v)
        if items:
            _write_long(out, len(items))
            for item in items:
                _encode_value(schema["items"], item, out)
        _write_long(out, 0)
        return
    if t == "map":
        entries = dict(v)
        if entries:
            _write_long(out, len(entries))
            for k, item in entries.items():
                _write_str(out, k)
                _encode_value(schema["values"], item, out)
        _write_long(out, 0)
        return
    if t == "enum":
        _write_long(out, schema["symbols"].index(v))
        return
    if t == "fixed":
        out.write(bytes(v))
        return
    _encode_value(t, v, out)


# ---------------------------------------------------------------------------
# container framing
# ---------------------------------------------------------------------------


def parse_header(buf: bytes):
    """(schema, codec, sync_marker, position_after_header)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    dec = _Decoder(buf, 4)
    meta: dict[str, bytes] = {}
    while True:
        count = dec.read_long()
        if count == 0:
            break
        if count < 0:
            count = -count
            dec.read_long()
        _check_count(count, dec)
        for _ in range(count):
            k = dec.read_str()
            meta[k] = dec.read_bytes()
    sync = dec.read_fixed(SYNC_SIZE)
    if "avro.schema" not in meta:
        raise ValueError("Avro header missing avro.schema metadata")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    _validate_schema(schema)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, dec.pos


_PRIMITIVES = frozenset(
    ("null", "boolean", "int", "long", "float", "double", "bytes",
     "string")
)


def _validate_schema(schema, depth: int = 0) -> None:
    """Structural check of a parsed Avro schema so _decode_value can
    trust its shape: malformed schemas (fuzzed headers) raise
    ValueError here instead of KeyError/IndexError mid-decode;
    valid-but-unsupported constructs keep NotImplementedError."""
    if depth > 64:
        raise ValueError("Avro schema nesting too deep")
    if isinstance(schema, str):
        if schema not in _PRIMITIVES:
            raise NotImplementedError(
                f"unsupported/named Avro type reference {schema!r}"
            )
        return
    if isinstance(schema, list):
        for branch in schema:
            _validate_schema(branch, depth + 1)
        return
    if not isinstance(schema, dict):
        raise ValueError(f"malformed Avro schema node: {type(schema)}")
    if "type" not in schema:
        raise ValueError("Avro schema node missing 'type'")
    t = schema["type"]
    if t == "record":
        fields = schema.get("fields")
        if not isinstance(fields, list):
            raise ValueError("Avro record schema missing 'fields' list")
        for f in fields:
            if not isinstance(f, dict) or "name" not in f \
                    or "type" not in f:
                raise ValueError("malformed Avro record field")
            _validate_schema(f["type"], depth + 1)
    elif t == "enum":
        syms = schema.get("symbols")
        if not isinstance(syms, list) or not syms:
            raise ValueError("Avro enum schema missing 'symbols'")
    elif t == "fixed":
        if not isinstance(schema.get("size"), int) \
                or schema["size"] < 0:
            raise ValueError("Avro fixed schema missing valid 'size'")
    elif t == "array":
        if "items" not in schema:
            raise ValueError("Avro array schema missing 'items'")
        _validate_schema(schema["items"], depth + 1)
    elif t == "map":
        if "values" not in schema:
            raise ValueError("Avro map schema missing 'values'")
        _validate_schema(schema["values"], depth + 1)
    else:
        _validate_schema(t, depth + 1)


def decode_container(buf: bytes, expect_names: list[str] | None = None):
    """Yield decoded row tuples from a full container file's bytes.

    ``expect_names``: the column order the caller will zip positionally
    (read_avro passes the driver-peeked schema's fields). Each file is
    decoded with its OWN header schema; without this check a directory
    whose files drifted (same fields, different order — or different
    fields entirely) would silently misalign columns (r11 review).
    Same-set/different-order files are reordered to match; a different
    field set raises."""
    schema, codec, sync, pos = parse_header(buf)
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise NotImplementedError("top-level Avro schema must be a record")
    file_names = [f["name"] for f in schema["fields"]]
    if expect_names is not None and list(expect_names) != file_names:
        if sorted(expect_names) != sorted(file_names):
            raise ValueError(
                f"Avro file fields {file_names} do not match the "
                f"directory schema {list(expect_names)}"
            )
    dec = _Decoder(buf, pos)
    n = len(buf)
    while dec.pos < n:
        rows = dec.read_long()
        size = dec.read_long()
        if rows < 0:
            raise ValueError(f"negative Avro block row count {rows}")
        block = dec.read_fixed(size)
        if codec == "deflate":
            try:
                block = zlib.decompress(block, -15)
            except zlib.error as exc:
                raise ValueError(
                    f"corrupt Avro deflate block: {exc}"
                ) from exc
        elif codec != "null":
            raise NotImplementedError(f"Avro codec {codec!r}")
        if dec.read_fixed(SYNC_SIZE) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        bdec = _Decoder(block)
        _check_count(rows, bdec)
        names = list(expect_names) if expect_names is not None else file_names
        for _ in range(rows):
            rec = _decode_value(schema, bdec)
            yield tuple(rec[n] for n in names)


def _encode_header(out, schema, codec: str, sync: bytes) -> None:
    out.write(MAGIC)
    _write_long(out, 2)
    _write_str(out, "avro.schema")
    _write_bytes(out, json.dumps(schema).encode("utf-8"))
    _write_str(out, "avro.codec")
    _write_bytes(out, codec.encode("utf-8"))
    _write_long(out, 0)
    out.write(sync)


def encode_container(
    rows, schema, codec: str = "deflate", block_rows: int = _DEFAULT_BLOCK_ROWS
) -> bytes:
    """Container bytes for an iterable of row tuples (test/driver-side
    helper; the distributed writer streams the same framing)."""
    out = io.BytesIO()
    sync = uuid.uuid4().bytes
    _encode_header(out, schema, codec, sync)
    _write_blocks(out, rows, schema, codec, sync, block_rows)
    return out.getvalue()


def _write_blocks(out, rows, schema, codec, sync, block_rows) -> None:
    it = iter(rows)
    while True:
        block = io.BytesIO()
        n = 0
        for v in it:
            _encode_value(schema, v, block)
            n += 1
            if n >= block_rows:
                break
        if n == 0:
            return
        data = block.getvalue()
        if codec == "deflate":
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = comp.compress(data) + comp.flush()
        _write_long(out, n)
        _write_long(out, len(data))
        out.write(data)
        out.write(sync)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def _fs_for(path: str):
    # route through fsio._resolve so Hadoop's s3a://ₛ3n:// spellings
    # (the ones Spark's JVM writers in the same handlers REQUIRE) map
    # to pyarrow's s3 backend instead of raising ArrowInvalid — a
    # ValueError the FileNotFoundError/OSError probes upstream never
    # catch, so on S3 the state probe would kill the stream (ADVICE
    # r11 medium)
    from tajo_spark.operators.fsio import _resolve

    return _resolve(path)


def _expand_glob(fs, p: str) -> list[tuple[str, int]]:
    """Driver-side glob expansion (pyarrow.fs has no native glob):
    list the deepest non-glob parent recursively and match SEGMENT-wise
    (glob semantics: ``*``/``?`` never cross ``/`` — plain fnmatch on
    the full path would let ``dir/*.avro`` swallow subdirectory files).
    Metadata only — no data reads."""
    import fnmatch

    import pyarrow.fs as pafs

    pat_parts = p.split("/")
    for i, seg in enumerate(pat_parts):
        if any(c in seg for c in "*?["):
            break
    else:
        return []
    base = "/".join(pat_parts[:i])
    if not base:
        # no non-glob parent (glob in the first segment, or a relative
        # pattern): refusing beats the old "/" fallback, which listed
        # the filesystem root — a bucket-level listing (or error) on an
        # object store, a huge walk on a local FS (ADVICE r10)
        return []
    if fs.get_file_info(base).type != pafs.FileType.Directory:
        return []
    # level-by-level listing: segment matching makes only fixed-depth
    # paths matchable, so a recursive listing of the whole prefix
    # (r10 review: millions of LIST results under a deep warehouse
    # tree for 'warehouse/*.avro') buys nothing — walk one pattern
    # segment at a time, descending only into matching directories
    frontier = [base]
    for depth, seg in enumerate(pat_parts[i:]):
        last = depth == len(pat_parts) - i - 1
        nxt: list = []
        out: list[tuple[str, int]] = []
        for d in frontier:
            for f in fs.get_file_info(pafs.FileSelector(d)):
                if not fnmatch.fnmatchcase(f.base_name, seg):
                    continue
                if last and f.is_file:
                    out.append((f.path, f.size))
                elif not last and f.type == pafs.FileType.Directory:
                    nxt.append(f.path)
        if last:
            return sorted(out)
        frontier = nxt
        if not frontier:
            return []
    return []


def _peek_schema(path: str):
    """Driver-side header read of ONE file to resolve the schema —
    SelfDescSchemaBuildPhase parity (the reference infers Avro schemas
    from file metadata at plan time)."""
    fs, p = _fs_for(path)
    info = fs.get_file_info(p)
    import pyarrow.fs as pafs

    if info.type == pafs.FileType.Directory:
        files = [
            f.path
            for f in fs.get_file_info(pafs.FileSelector(p, recursive=True))
            if f.is_file and f.path.endswith(".avro")
        ]
        if not files:
            raise FileNotFoundError(f"no .avro files under {path}")
        p = sorted(files)[0]
    elif info.type != pafs.FileType.File:
        # glob pattern: pyarrow reports NotFound for 'dir/*.avro'
        # (ADVICE r09) — expand driver-side against the deepest
        # non-glob parent and peek the first match
        files = _expand_glob(fs, p)
        if not files:
            raise FileNotFoundError(f"no files match {path}")
        p = files[0][0]
    with fs.open_input_file(p) as f:
        head = f.read(1 << 20)  # header is tiny; 1 MiB is generous
    schema, _codec, _sync, _pos = parse_header(head)
    return schema


def _spark_schema_of(avro_schema) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f["name"], *avro_to_spark_type(f["type"]))
            for f in avro_schema["fields"]
        ]
    )


def _arrow_type_of(dt):
    """Spark → Arrow type for the subset the Avro codec produces.
    Used to build mapInArrow output batches explicitly, so null-vs-NaN
    survives (a pandas hop would fold NaN into null)."""
    import pyarrow as pa

    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.TimestampType):
        # session tz pinned UTC (session.py); decoded naive datetimes
        # ARE the UTC reading
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, T.TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        return pa.list_(_arrow_type_of(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(_arrow_type_of(dt.keyType), _arrow_type_of(dt.valueType))
    if isinstance(dt, T.StructType):
        return pa.struct(
            [pa.field(f.name, _arrow_type_of(f.dataType)) for f in dt.fields]
        )
    raise NotImplementedError(f"no Arrow mapping for {dt}")


def _rows_to_batch(rows: list[tuple], spark_schema: T.StructType):
    """Decoded row tuples → one Arrow RecordBatch with explicit types
    (from_pandas=False default: None→null, NaN stays a value)."""
    import pyarrow as pa

    cols = list(zip(*rows)) if rows else [[] for _ in spark_schema.fields]
    arrays = [
        pa.array(list(col), type=_arrow_type_of(f.dataType))
        for col, f in zip(cols, spark_schema.fields)
    ]
    return pa.RecordBatch.from_arrays(
        arrays, names=[f.name for f in spark_schema.fields]
    )


def _session_split_bytes(spark: SparkSession) -> int:
    """The session's scan-split size (``spark.sql.files.maxPartitionBytes``,
    default 128 MiB) so Avro fragments match parquet fragment granularity.
    Accepts Spark's byte-suffix spellings (``134217728b``, ``128m``…)."""
    raw = str(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    ).strip().lower()
    mult = 1
    for suffix, m in (
        ("pb", 1 << 50), ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20),
        ("kb", 1 << 10), ("p", 1 << 50), ("t", 1 << 40), ("g", 1 << 30),
        ("m", 1 << 20), ("k", 1 << 10), ("b", 1),
    ):
        if raw.endswith(suffix):
            raw, mult = raw[: -len(suffix)], m
            break
    return int(raw) * mult


def _list_avro_files(path: str) -> list[tuple[str, int]]:
    """[(path, size)] of the .avro files under ``path`` — metadata
    listing only, no data reads."""
    import pyarrow.fs as pafs

    fs, p = _fs_for(path)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.Directory:
        return sorted(
            (f.path, f.size)
            for f in fs.get_file_info(pafs.FileSelector(p, recursive=True))
            if f.is_file and f.path.endswith(".avro")
        )
    if info.type != pafs.FileType.File or info.size is None:
        # glob pattern / missing path: pyarrow reports NotFound with
        # size=None (ADVICE r09 — max() over None sizes raised
        # TypeError). Expand the glob driver-side; an empty result
        # makes 'auto' fall back to the binaryFile path.
        return _expand_glob(fs, p)
    return [(p, info.size)]


def read_avro(
    spark: SparkSession,
    path: str,
    split_bytes: int | str | None = "auto",
) -> DataFrame:
    """Distributed Avro scan (AvroScanner.java:53 parity, upgraded to
    Hadoop-style input splits).

    ``split_bytes="auto"`` (the default): if every file fits inside
    the session's ``spark.sql.files.maxPartitionBytes``, read via the
    binaryFile source + Arrow decode, one-or-more files per task —
    Spark packs small files, and per-file decode is exactly the
    reference scanner's fragment granularity. Any larger file is
    instead split on SYNC MARKERS into byte-range fragments: the
    driver plans (file, start, end) ranges from file sizes only, and
    each task seeks into its range, scans to the first block anchor it
    owns, and decodes just those blocks — so one multi-GB container
    file fans out across executors instead of serializing through one
    task. An int forces that split size; ``None`` forces
    whole-file-per-task.
    """
    avro_schema = _peek_schema(path)
    spark_schema = _spark_schema_of(avro_schema)

    files: list[tuple[str, int]] | None = None
    if split_bytes == "auto":
        limit = _session_split_bytes(spark)
        files = _list_avro_files(path)
        if not files or max(sz for _, sz in files) <= limit:
            split_bytes = None  # small files: let binaryFile pack them
        else:
            split_bytes = limit

    col_names = [f.name for f in spark_schema.fields]

    if split_bytes is None:
        # load the EXPLICIT file list (r11 review: a hard-coded
        # pathGlobFilter='*.avro' silently returned 0 rows for a
        # non-.avro single file or custom glob that _peek_schema and
        # the split path both read fine — results depended on file
        # size). _list_avro_files handles dir/file/glob uniformly.
        if files is None:
            files = _list_avro_files(path)
        if not files:
            raise FileNotFoundError(f"no Avro files at {path!r}")
        bf = (
            spark.read.format("binaryFile")
            .load([f for f, _ in files])
            .select("content")
        )

        def decode(batches):
            for batch in batches:
                for blob in batch.column(0).to_pylist():
                    rows = list(
                        decode_container(
                            bytes(blob), expect_names=col_names
                        )
                    )
                    yield _rows_to_batch(rows, spark_schema)

        return bf.mapInArrow(decode, schema=spark_schema)

    # --- split planning: metadata only, no data reads ----------------
    split_bytes = int(split_bytes)
    if split_bytes <= 0:
        raise ValueError(
            f"split_bytes must be positive, got {split_bytes}"
        )  # r11 review: <= 0 looped the planner forever
    fs, _p = _fs_for(path)
    if files is None:
        files = _list_avro_files(path)
    splits = []
    for fpath, size in files:
        start = 0
        while start < size:
            splits.append((fpath, start, min(start + split_bytes, size)))
            start += split_bytes
    plan = spark.createDataFrame(
        splits, "fpath STRING, start LONG, end LONG"
    ).repartition(max(len(splits), 1))

    def decode_split(batches):
        for batch in batches:
            for split in batch.to_pylist():
                rows = list(
                    _decode_range(
                        fs, split["fpath"], int(split["start"]),
                        int(split["end"]), expect_names=col_names,
                    )
                )
                if rows:
                    yield _rows_to_batch(rows, spark_schema)

    return plan.mapInArrow(decode_split, schema=spark_schema)


def _decode_range(
    fs,
    fpath: str,
    start: int,
    end: int,
    expect_names: list[str] | None = None,
):
    """Rows of the blocks ANCHORED in [start, end).

    A block's anchor is its first byte (the row-count varint): the
    header end for the first block, the end of the preceding sync for
    every other. Each split owns exactly the blocks whose anchor falls
    inside it, so consecutive splits partition the file's rows with no
    loss or duplication — the Hadoop sync-based split contract.
    """
    with fs.open_input_file(fpath) as f:
        head = f.read(1 << 20)
        schema, codec, sync, header_end = parse_header(head)
        names = [fld["name"] for fld in schema["fields"]]
        if expect_names is not None and list(expect_names) != names:
            # same drift guard as decode_container (r11 review)
            if sorted(expect_names) != sorted(names):
                raise ValueError(
                    f"Avro file fields {names} do not match the "
                    f"directory schema {list(expect_names)}"
                )
            names = list(expect_names)
        size = f.size()

        class _Ranged:
            """Grow-on-demand window over the file from ``base``."""

            def __init__(self, base: int) -> None:
                self.base = base
                self.buf = b""

            def ensure(self, upto: int) -> bytes:
                want = upto - self.base
                while len(self.buf) < want and self.base + len(self.buf) < size:
                    f.seek(self.base + len(self.buf))
                    self.buf += f.read(
                        max(want - len(self.buf), 4 << 20)
                    )
                return self.buf

        # locate the first owned anchor
        if start <= header_end:
            anchor = header_end
        else:
            # a sync ending in [start, end) starts in [start-16, end-16)
            win = _Ranged(start - SYNC_SIZE)
            probe = win.ensure(end)
            idx = probe.find(sync)
            if idx != -1 and (win.base + idx) >= end - SYNC_SIZE:
                idx = -1  # first sync starts beyond the owned window
            if idx == -1:
                return  # no anchor in range: all rows owned by neighbors
            anchor = win.base + idx + SYNC_SIZE
        if anchor >= end:
            return

        win = _Ranged(anchor)
        pos = anchor
        while pos < end and pos < size:
            # block header: two varints ≤ 20 bytes
            win.ensure(pos + 20)
            dec = _Decoder(win.buf, pos - win.base)
            n_rows = dec.read_long()
            blen = dec.read_long()
            data_start = win.base + dec.pos
            win.ensure(data_start + blen + SYNC_SIZE)
            dec = _Decoder(win.buf, data_start - win.base)
            if n_rows < 0:
                raise ValueError(
                    f"negative Avro block row count {n_rows}"
                )
            block = dec.read_fixed(blen)
            if codec == "deflate":
                try:
                    block = zlib.decompress(block, -15)
                except zlib.error as exc:
                    raise ValueError(
                        f"corrupt Avro deflate block: {exc}"
                    ) from exc
            elif codec != "null":
                raise NotImplementedError(f"Avro codec {codec!r}")
            if dec.read_fixed(SYNC_SIZE) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            bdec = _Decoder(block)
            _check_count(n_rows, bdec)
            for _ in range(n_rows):
                rec = _decode_value(schema, bdec)
                yield tuple(rec[n] for n in names)
            pos = win.base + dec.pos  # next anchor


def write_avro(
    df: DataFrame, path: str, codec: str = "deflate"
) -> list[tuple[str, int]]:
    """Distributed Avro write: each partition streams ONE container
    file through pyarrow.fs (local/HDFS/S3 executor-side — data never
    visits the driver); returns the [(file, rows)] manifest
    (AvroAppender parity).

    Overwrite semantics match the JVM path's ``mode('overwrite')``:
    existing directory contents are cleared first, so a rewrite never
    accumulates stale part files alongside new ones.

    Rows travel as Arrow record batches (``mapInArrow``), which keep
    SQL NULL and floating-point NaN distinct — NaN in a double column
    is written as the IEEE NaN bit pattern, NULL as the Avro null
    branch.  (The earlier pandas path conflated the two because pandas
    uses NaN as its missing-value sentinel.)"""
    import pyarrow as pa
    import pyarrow.fs as pafs

    avro_schema = spark_to_avro_schema(df.schema)
    fs, dirpath = _fs_for(path)
    info = fs.get_file_info(dirpath)
    if info.type == pafs.FileType.Directory:
        fs.delete_dir_contents(dirpath)
    elif info.type == pafs.FileType.File:
        fs.delete_file(dirpath)
    fs.create_dir(dirpath, recursive=True)

    def write_part(batches):
        import os

        fname = None
        tmp = None
        stream = None
        sync = uuid.uuid4().bytes
        n_total = 0
        try:
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                if stream is None:
                    # task-commit protocol (r11 review): stream into a
                    # '.tmp' name the readers exclude, rename to the
                    # final '.avro' only when the task completes — a
                    # failed attempt leaves at worst an ignored temp
                    # file, never a partial part a later read counts
                    # as data. The FINAL name is the partition id, so
                    # a retried/speculative attempt renames onto the
                    # same target (last-wins replace), never a
                    # duplicate; the uuid keeps concurrent attempts'
                    # TEMP streams from colliding.
                    from pyspark import TaskContext

                    ctx = TaskContext.get()
                    pid = ctx.partitionId() if ctx else 0
                    fname = f"part-{pid:05d}.avro"
                    tmp = os.path.join(
                        dirpath, f".{fname}.{uuid.uuid4().hex}.tmp"
                    )
                    stream = fs.open_output_stream(tmp)
                    head = io.BytesIO()
                    _encode_header(head, avro_schema, codec, sync)
                    stream.write(head.getvalue())
                # to_pylist() preserves null-vs-NaN and yields native
                # Python values (bytes, date, datetime) the encoder
                # expects
                cols = [c.to_pylist() for c in batch.columns]
                body = io.BytesIO()
                _write_blocks(body, zip(*cols), avro_schema, codec, sync,
                              _DEFAULT_BLOCK_ROWS)
                stream.write(body.getvalue())
                n_total += batch.num_rows
        except BaseException:
            if stream is not None:
                stream.close()
                fs.delete_file(tmp)
            raise
        if stream is not None:
            stream.close()
            fs.move(tmp, os.path.join(dirpath, fname))
            yield pa.RecordBatch.from_pydict(
                {"file": [fname], "rows": [n_total]}
            )

    manifest = df.mapInArrow(write_part, schema="file STRING, rows LONG")
    return [(r.file, r.rows) for r in manifest.collect()]
