"""BqlType -> Spark type mapping.

Mirrors the reference's type system (crates/meta/src/types.rs:96-111, physical
sizes :138-160, Arrow mapping :527-553) with the unsigned-widening rules from
SURVEY.md §1.2: Spark has no unsigned integers, so each UInt widens to the next
signed type that holds its full range; UInt64 maps to Decimal(20,0) so that
storage-facing paths round-trip the full range (sum() overflow semantics are
then decimal, which is the safer superset of the reference's wrapping u64).

Parse accepts the ClickHouse spellings the reference's grammar accepts
(crates/lang/src/bql.pest:361-389), including ``Nullable(T)``,
``Decimal(p,s)`` / ``Decimal32(s)`` / ``Decimal64(s)``, ``FixedString(n)``,
``LowCardinality(String)`` and ``DateTime('TZ')``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# BqlType name -> Spark DataType
# ---------------------------------------------------------------------------

_SIMPLE: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    # unsigned widening (SURVEY §1.2): no unsigned in Spark
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "float": T.DoubleType(),
    "date": T.DateType(),
    # reference Date16 = u16 days since epoch (crates/arrow/src/datatypes/datatype.rs:98)
    "date16": T.DateType(),
    # reference Timestamp32 = u32 unix seconds (datatype.rs:95); Spark is µs —
    # writes truncate to seconds for parity (catalog layer).
    "datetime": T.TimestampType(),
    "datetime64": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "largeutf8": T.StringType(),
    # LowCardinality is an encoding, not a logical type: Parquet dictionary
    # encoding gives the same effect for free (SURVEY §1.2).
    "lowcardinalitystring": T.StringType(),
    "lowcardinalitytinytext": T.StringType(),
    "uuid": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
}

_DECIMAL_RE = re.compile(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_DECIMAL32_RE = re.compile(r"^decimal32\s*\(\s*(\d+)\s*\)$")
_DECIMAL64_RE = re.compile(r"^decimal64\s*\(\s*(\d+)\s*\)$")
_FIXEDSTRING_RE = re.compile(r"^fixedstring\s*\(\s*(\d+)\s*\)$")
_NULLABLE_RE = re.compile(r"^nullable\s*\((.*)\)$", re.DOTALL)
_LOWCARD_RE = re.compile(r"^lowcardinality\s*\((.*)\)$", re.DOTALL)
_DATETIME_TZ_RE = re.compile(r"^datetime\s*\(\s*'([^']*)'\s*\)$")


@dataclass(frozen=True)
class ParsedType:
    spark_type: T.DataType
    nullable: bool = False
    fixed_len: int | None = None  # FixedString(n) length check, enforced on write
    tz: str | None = None  # DateTime('TZ') display timezone


def parse_bql_type(name: str) -> ParsedType:
    """Parse a ClickHouse/BQL type name into its Spark mapping.

    Raises ValueError for types the reference also rejects (Array, Map, Tuple,
    Enum, Int128 — SURVEY §1.2 'explicitly absent').
    """
    s = name.strip()
    low = s.lower()

    m = _NULLABLE_RE.match(low)
    if m:
        inner = parse_bql_type(m.group(1))
        return ParsedType(inner.spark_type, True, inner.fixed_len, inner.tz)

    m = _LOWCARD_RE.match(low)
    if m:
        inner = parse_bql_type(m.group(1))
        return ParsedType(inner.spark_type, inner.nullable, inner.fixed_len, inner.tz)

    if low in _SIMPLE:
        return ParsedType(_SIMPLE[low])

    m = _DECIMAL_RE.match(low)
    if m:
        p, sc = int(m.group(1)), int(m.group(2))
        if not (1 <= p <= 38):
            raise ValueError(f"Decimal precision out of range: {name}")
        # reference accepts p<=76 at parse but stores only p<=18
        # (crates/meta/src/types.rs:145-153,303); Spark holds p<=38.
        return ParsedType(T.DecimalType(p, sc))
    m = _DECIMAL32_RE.match(low)
    if m:
        return ParsedType(T.DecimalType(9, int(m.group(1))))
    m = _DECIMAL64_RE.match(low)
    if m:
        return ParsedType(T.DecimalType(18, int(m.group(1))))

    m = _FIXEDSTRING_RE.match(low)
    if m:
        n = int(m.group(1))
        if not (1 <= n <= 255):
            raise ValueError(f"FixedString length out of range: {name}")
        return ParsedType(T.StringType(), fixed_len=n)

    m = _DATETIME_TZ_RE.match(low)
    if m:
        return ParsedType(T.TimestampType(), tz=m.group(1))

    raise ValueError(f"unsupported type: {name!r}")


def spark_field(col_name: str, bql_type: str) -> T.StructField:
    p = parse_bql_type(bql_type)
    return T.StructField(col_name, p.spark_type, p.nullable)


def spark_type_name(bql_type: str) -> str:
    return parse_bql_type(bql_type).spark_type.simpleString()
