"""BqlType parsing unit tests — ports the shape of the reference's type tests
(crates/meta/src/types.rs:555-782) onto the Spark mapping of SURVEY.md §1.2."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tensorbase_spark.types import parse_bql_type, spark_field


@pytest.mark.parametrize(
    "name,expected",
    [
        ("Int8", T.ByteType()),
        ("Int16", T.ShortType()),
        ("Int32", T.IntegerType()),
        ("Int64", T.LongType()),
        # unsigned widening: no unsigned ints in Spark (SURVEY §1.2)
        ("UInt8", T.ShortType()),
        ("UInt16", T.IntegerType()),
        ("UInt32", T.LongType()),
        ("UInt64", T.DecimalType(20, 0)),
        ("Float32", T.FloatType()),
        ("Float64", T.DoubleType()),
        ("Date", T.DateType()),
        ("DateTime", T.TimestampType()),
        ("String", T.StringType()),
        ("UUID", T.StringType()),
        ("LowCardinality(String)", T.StringType()),
        ("Decimal(12, 4)", T.DecimalType(12, 4)),
        ("Decimal32(3)", T.DecimalType(9, 3)),
        ("Decimal64(6)", T.DecimalType(18, 6)),
    ],
)
def test_simple_types(name, expected):
    assert parse_bql_type(name).spark_type == expected


def test_nullable_wrapper():
    p = parse_bql_type("Nullable(Int32)")
    assert p.spark_type == T.IntegerType()
    assert p.nullable is True
    # non-nullable default matches the reference (nullable is opt-in,
    # crates/lang/src/bql.pest:386-389)
    assert parse_bql_type("Int32").nullable is False


def test_fixed_string():
    p = parse_bql_type("FixedString(16)")
    assert p.spark_type == T.StringType()
    assert p.fixed_len == 16
    with pytest.raises(ValueError):
        parse_bql_type("FixedString(256)")


def test_datetime_tz():
    # tz IDs are case-sensitive in the JVM — declared case must survive
    p = parse_bql_type("DateTime('Asia/Shanghai')")
    assert p.spark_type == T.TimestampType()
    assert p.tz == "Asia/Shanghai"
    p64 = parse_bql_type("DateTime64(3, 'Asia/Shanghai')")
    assert p64.spark_type == T.TimestampType()
    assert p64.tz == "Asia/Shanghai"


@pytest.mark.parametrize("bad", ["Int128", "Enum8('a' = )", "Map(String)"])
def test_rejects_unsupported(bad):
    with pytest.raises(ValueError):
        parse_bql_type(bad)


def test_compound_types_parse():
    """Array/Map/Tuple/Enum are upstream-CH staples the reference rejects
    (SURVEY §1.2) — documented dialect superset; CODEC annotations drop."""
    assert parse_bql_type("Array(Int32)").spark_type == T.ArrayType(
        T.IntegerType(), True
    )
    assert parse_bql_type("Array(Nullable(String))").spark_type == T.ArrayType(
        T.StringType(), True
    )
    assert parse_bql_type("Map(String, Int64)").spark_type == T.MapType(
        T.StringType(), T.LongType(), True
    )
    st = parse_bql_type("Tuple(Int64, String)").spark_type
    assert [f.name for f in st.fields] == ["_1", "_2"]
    st = parse_bql_type("Tuple(x Int64, y String)").spark_type
    assert [(f.name, f.dataType) for f in st.fields] == [
        ("x", T.LongType()),
        ("y", T.StringType()),
    ]
    p = parse_bql_type("Enum8('red' = 1, 'green' = 2)")
    assert p.spark_type == T.StringType() and p.enum_values == ("red", "green")
    p = parse_bql_type("Enum16('a', 'b')")  # implicit numbering form
    assert p.enum_values == ("a", "b")
    assert parse_bql_type("String CODEC(ZSTD(3))").spark_type == T.StringType()
    assert parse_bql_type("Int64 CODEC(Delta, LZ4)").spark_type == T.LongType()


def test_spark_field():
    f = spark_field("ts", "Nullable(DateTime)")
    assert f == T.StructField("ts", T.TimestampType(), True)


def test_touint64_widens_to_decimal20(spark):
    """SURVEY §1.2: UInt64 has no Spark equivalent — toUInt64 widens to
    Decimal(20,0).  Runtime echo of the type-map row above; the driver-hashed
    ch_cast_multiif query narrows back via toInt64 because Decimal
    canonicalization differs between hashers (r2 verdict #1)."""
    from tensorbase_spark.engine import translate_sql

    df = spark.sql(translate_sql("select toUInt64(9223372036854775807) as u"))
    assert dict(df.dtypes)["u"] == "decimal(20,0)"
    assert int(df.collect()[0].u) == 9223372036854775807


def test_nested_type_mapping():
    """Nested(a T, b U) -> array<struct<a,b>> with subfield names recorded
    for the insert-zip boundary."""
    from tensorbase_spark.types import parse_bql_type

    p = parse_bql_type("Nested(url String, dur Int64)")
    assert p.spark_type.simpleString() == "array<struct<url:string,dur:bigint>>"
    assert p.nested_fields == ("url", "dur")
