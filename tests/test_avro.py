"""Pure-Python Avro object-container codec + distributed reader.

The fork's AvroExec (physical_plan/file_format/avro.rs:39) is the surface
being matched; no spark-avro jar ships here, so sources/avro_py.py decodes
the container per the Avro 1.x spec and external.read_avro distributes the
decode via binaryFile + mapInPandas."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from tensorbase_spark.sources import avro_py, external

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "flag", "type": "boolean"},
        {"name": "ratio", "type": "double"},
        {"name": "ratio32", "type": "float"},
        {"name": "name", "type": "string"},
        {"name": "blob", "type": "bytes"},
        {"name": "maybe", "type": ["null", "long"]},
        {"name": "status", "type": {"type": "enum", "name": "st", "symbols": ["A", "B"]}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
    ],
}


def _rows(n=10):
    return [
        {
            "id": i,
            "flag": i % 2 == 0,
            "ratio": i * 0.5,
            "ratio32": float(i),
            "name": f"row-{i}",
            "blob": bytes([i % 256, 255]),
            "maybe": None if i % 3 == 0 else i * 10,
            "status": "A" if i % 2 == 0 else "B",
            "tags": [f"t{i}", "x"] if i % 4 else [],
            "d": 18000 + i,  # days since epoch
            "ts": 1_600_000_000_000_000 + i,  # micros
            "props": {"a": i, "b": i * 2} if i % 2 else {},
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    raw = avro_py.write_container(SCHEMA, _rows(), codec=codec, block_rows=3)
    schema, rows = avro_py.parse_container(raw)
    assert schema == SCHEMA
    assert rows == _rows()


def test_zigzag_longs():
    cases = [0, -1, 1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)]
    w = avro_py._Writer()
    for v in cases:
        w.long(v)
    r = avro_py._Reader(w.out.getvalue())
    assert [r.long() for _ in cases] == cases


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        avro_py.parse_container(b"PAR1" + b"\x00" * 32)


def test_avro_record_to_struct():
    from pyspark.sql import types as T

    st = avro_py.avro_record_to_struct(SCHEMA)
    got = {f.name: (f.dataType, f.nullable) for f in st.fields}
    assert got["id"] == (T.LongType(), False)
    assert got["maybe"] == (T.LongType(), True)
    assert got["status"] == (T.StringType(), False)
    assert got["tags"] == (T.ArrayType(T.StringType()), False)
    assert got["d"] == (T.DateType(), False)
    assert got["ts"] == (T.TimestampType(), False)


def test_read_avro_distributed(spark, tmp_path):
    """Two container files (one per codec) -> binaryFile+mapInPandas decode;
    values, dates, and timestamps must survive exactly."""
    d = str(tmp_path / "avro")
    os.makedirs(d)
    rows = _rows(20)
    half = len(rows) // 2
    for i, (chunk, codec) in enumerate([(rows[:half], "null"), (rows[half:], "deflate")]):
        with open(f"{d}/part-{i}.avro", "wb") as fh:
            fh.write(avro_py.write_container(SCHEMA, chunk, codec=codec))
    back = external.read_avro(spark, d)
    got = {r.id: r for r in back.collect()}
    assert len(got) == 20
    for i in (0, 7, 19):
        r = got[i]
        assert r.flag == (i % 2 == 0) and r.ratio == i * 0.5
        assert r.name == f"row-{i}" and bytes(r.blob) == bytes([i % 256, 255])
        assert r.maybe == (None if i % 3 == 0 else i * 10)
        assert r.status == ("A" if i % 2 == 0 else "B")
        assert r.tags == ([f"t{i}", "x"] if i % 4 else [])
        assert r.d == dt.date(1970, 1, 1) + dt.timedelta(days=18000 + i)
        assert r.ts == dt.datetime(1970, 1, 1) + dt.timedelta(
            microseconds=1_600_000_000_000_000 + i
        )


def test_read_avro_declared_bql_schema(spark, tmp_path):
    """An explicit BQL schema overrides column types (and the engine's
    declared-schema ingestion contract, SURVEY §1.1, holds for Avro too)."""
    d = str(tmp_path / "avro2")
    os.makedirs(d)
    simple = {
        "type": "record",
        "name": "s",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "v", "type": ["null", "double"]},
        ],
    }
    rows = [{"k": i, "v": None if i == 2 else i / 4} for i in range(5)]
    with open(f"{d}/a.avro", "wb") as fh:
        fh.write(avro_py.write_container(simple, rows))
    back = external.read_avro(spark, d, [("k", "Int64"), ("v", "Nullable(Float64)")])
    got = sorted((r.k, r.v) for r in back.collect())
    assert got == [(0, 0.0), (1, 0.25), (2, None), (3, 0.75), (4, 1.0)]
