"""Pure-Python Avro object-container codec (read + write).

The fork carries an AvroExec file source the reference never routes to
(physical_plan/file_format/avro.rs:39, reader crates/datafusion/src/avro_to_arrow/)
— its effective surface is "decode an Avro object container into columnar
batches".  This container ships no spark-avro jar and has no network to fetch
one, so the equivalent is built from the Avro 1.x spec directly:

    file  = magic 'Obj\\x01' + metadata map + 16-byte sync
            + blocks (long n_rows, long n_bytes, payload, sync)*
    meta  = avro map<bytes>: avro.schema (JSON), avro.codec (null | deflate)
    data  = zigzag-varint primitives, length-prefixed bytes/string,
            little-endian float/double, union = long branch index + value

Supported schema subset (everything the engine's ingestion model needs,
SURVEY §1.2 — flat records of primitives): record of {null, boolean, int,
long, float, double, bytes, string, enum, fixed, array<primitive>, union
["null", T]} with date / timestamp-millis / timestamp-micros logical types.
Codecs: null, deflate (raw zlib, per spec).

Scale shape (see external.read_avro): files are the parallel grain —
spark.read.format("binaryFile") distributes whole files to executors and
mapInPandas decodes there, so a 100 TB ingest of many files is
embarrassingly parallel.  Avro blocks inside one file are NOT split (that
needs sync-marker scanning, which even spark-avro only does per-file via
Hadoop input splits); the 2 GB binaryFile per-file cap is documented in the
reader docstring.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    def long(self) -> int:
        # zigzag varint
        shift, acc = 0, 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        return self.read(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")

    def map_bytes(self) -> dict[str, bytes]:
        out: dict[str, bytes] = {}
        while True:
            n = self.long()
            if n == 0:
                return out
            if n < 0:  # block form: abs(count) + byte size
                n = -n
                self.long()
            for _ in range(n):
                # NB: assignment evaluates the RHS first — read the key into
                # a local before the value, or the pair comes out swapped
                k = self.string()
                out[k] = self.bytes_()


def _decode_value(r: _Reader, schema):
    """Decode one value of `schema` (parsed JSON, possibly a str primitive)."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) != b"\x00"
        if t in ("int", "long"):
            return r.long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.bytes_()
        if t == "string":
            return r.string()
        raise ValueError(f"unsupported avro primitive: {t}")
    if isinstance(schema, list):  # union: long branch index, then value
        return _decode_value(r, schema[r.long()])
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode_value(r, f["type"]) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        items = []
        while True:
            n = r.long()
            if n == 0:
                return items
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                items.append(_decode_value(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.string()  # RHS-first evaluation: key must be read first
                out[k] = _decode_value(r, schema["values"])
    if t in ("int", "long", "float", "double", "boolean", "null", "bytes", "string"):
        return _decode_value(r, t)  # {"type": "int", "logicalType": ...} form
    raise ValueError(f"unsupported avro type: {t}")


def _decompress(payload: bytes, codec: str) -> bytes:
    if codec == "null":
        return payload
    if codec == "deflate":  # raw deflate, no zlib header (spec)
        return zlib.decompress(payload, -15)
    raise ValueError(f"unsupported avro codec: {codec}")


def parse_container(raw: bytes) -> tuple[dict, list[dict]]:
    """Decode a whole Avro object container -> (writer schema, row dicts)."""
    r = _Reader(raw)
    if r.read(4) != MAGIC:
        raise ValueError("not an avro object container (bad magic)")
    meta = r.map_bytes()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    rows: list[dict] = []
    while not r.at_end():
        n_rows = r.long()
        payload = _decompress(r.bytes_(), codec)
        if r.read(16) != sync:
            raise ValueError("avro block sync mismatch")
        br = _Reader(payload)
        for _ in range(n_rows):
            rows.append(_decode_value(br, schema))
    return schema, rows


# --------------------------------------------------------------------------
# encoder (tests + fixture generation)
# --------------------------------------------------------------------------


class _Writer:
    def __init__(self):
        self.out = io.BytesIO()

    def write(self, b: bytes):
        self.out.write(b)

    def long(self, v: int):
        v = (v << 1) ^ (v >> 63)  # zigzag
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.write(bytes([b | 0x80]))
            else:
                self.out.write(bytes([b]))
                return

    def bytes_(self, b: bytes):
        self.long(len(b))
        self.out.write(b)

    def string(self, s: str):
        self.bytes_(s.encode("utf-8"))


def _encode_value(w: _Writer, schema, v):
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            w.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            w.long(int(v))
        elif t == "float":
            w.write(struct.pack("<f", float(v)))
        elif t == "double":
            w.write(struct.pack("<d", float(v)))
        elif t == "bytes":
            w.bytes_(bytes(v))
        elif t == "string":
            w.string(str(v))
        else:
            raise ValueError(f"unsupported avro primitive: {t}")
        return
    if isinstance(schema, list):  # union: null -> branch of "null"
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if (v is None) == (bt == "null"):
                w.long(i)
                _encode_value(w, branch, v)
                return
        raise ValueError("no matching union branch")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode_value(w, f["type"], v[f["name"]])
    elif t == "enum":
        w.long(schema["symbols"].index(v))
    elif t == "fixed":
        w.write(bytes(v))
    elif t == "array":
        if v:
            w.long(len(v))
            for item in v:
                _encode_value(w, schema["items"], item)
        w.long(0)
    elif t == "map":
        if v:
            w.long(len(v))
            for mk, mv in v.items():
                w.string(mk)
                _encode_value(w, schema["values"], mv)
        w.long(0)
    else:
        _encode_value(w, t, v)


def write_container(
    schema: dict, rows: list[dict], codec: str = "null", block_rows: int = 4096
) -> bytes:
    """Encode rows into an Avro object container (deterministic sync marker
    derived from the schema so identical inputs give identical bytes)."""
    import hashlib

    w = _Writer()
    w.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    w.long(len(meta))
    for k, v in meta.items():
        w.string(k)
        w.bytes_(v)
    w.long(0)
    sync = hashlib.md5(json.dumps(schema).encode()).digest()
    w.write(sync)
    for start in range(0, len(rows), block_rows):
        block = rows[start : start + block_rows]
        bw = _Writer()
        for row in block:
            _encode_value(bw, schema, row)
        payload = bw.out.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        w.long(len(block))
        w.bytes_(payload)
        w.write(sync)
    return w.out.getvalue()


# --------------------------------------------------------------------------
# schema mapping (avro -> Spark), incl. logical types
# --------------------------------------------------------------------------


def avro_to_spark_type(schema):
    from pyspark.sql import types as T

    if isinstance(schema, list):  # union ["null", X] -> nullable X
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError(f"unsupported avro union: {schema}")
        return avro_to_spark_type(non_null[0])
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        t = schema["type"]
        if lt == "date":
            return T.DateType()
        if lt in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType()
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        if t == "array":
            return T.ArrayType(avro_to_spark_type(schema["items"]))
        if t == "map":
            return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]))
        schema = t
    return {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }[schema]


def avro_record_to_struct(schema: dict):
    from pyspark.sql import types as T

    if schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    return T.StructType(
        [
            T.StructField(
                f["name"],
                avro_to_spark_type(f["type"]),
                isinstance(f["type"], list) and "null" in f["type"],
            )
            for f in schema["fields"]
        ]
    )
