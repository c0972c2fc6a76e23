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
_NULLABLE_RE = re.compile(r"(?i)^nullable\s*\((.*)\)$", re.DOTALL)
_LOWCARD_RE = re.compile(r"(?i)^lowcardinality\s*\((.*)\)$", re.DOTALL)
_DATETIME_TZ_RE = re.compile(r"(?i)^datetime\s*\(\s*'([^']*)'\s*\)$")
# DateTime64(precision[, 'TZ']): Spark timestamps are fixed µs precision —
# the precision digit is accepted and dropped (µs covers CH's 0-6 range)
_DATETIME64_RE = re.compile(
    r"(?i)^datetime64\s*\(\s*\d+\s*(?:,\s*'([^']*)')?\s*\)$"
)
_AGGFN_RE = re.compile(r"(?i)^aggregatefunction\s*\((.*)\)$", re.DOTALL)
_ARRAY_RE = re.compile(r"(?i)^array\s*\((.*)\)$", re.DOTALL)
_MAP_RE = re.compile(r"(?i)^map\s*\((.*)\)$", re.DOTALL)
_TUPLE_RE = re.compile(r"(?i)^tuple\s*\((.*)\)$", re.DOTALL)
_ENUM_RE = re.compile(r"(?i)^enum(?:8|16)?\s*\((.*)\)$", re.DOTALL)
_NESTED_RE = re.compile(r"(?i)^nested\s*\((.*)\)$", re.DOTALL)
_CODEC_RE = re.compile(r"(?is)\s+codec\s*\(.*\)\s*$")


def _split_commas(text: str) -> list[str]:
    """Depth-0 comma split, quote-aware (local copy; engine.py has the
    canonical one but importing it here would be circular)."""
    out, depth, cur, i, n = [], 0, [], 0, len(text)
    while i < n:
        c = text[i]
        if c in "'\"":
            q = c
            cur.append(c)
            i += 1
            while i < n:
                cur.append(text[i])
                if text[i] == q:
                    break
                i += 1
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        out.append("".join(cur).strip())
    return out


@dataclass(frozen=True)
class ParsedType:
    spark_type: T.DataType
    nullable: bool = False
    fixed_len: int | None = None  # FixedString(n) length check, enforced on write
    tz: str | None = None  # DateTime('TZ') display timezone
    enum_values: tuple | None = None  # Enum8/16 allowed strings, enforced on write
    agg_fn: str | None = None  # AggregateFunction(fn, ...) column's fn name
    nested_fields: tuple | None = None  # Nested(...) subcolumn names, insert-zip
    # UInt64Reinterp: UInt64 stored as Int64 with two's-complement
    # reinterpretation (opt-in via SET uint64_storage = 'reinterpret';
    # default UInt64 stays the lossless Decimal(20, 0)).  Closes the
    # measured 1.6x Decimal ENCODE tax on the bulk-ingest path (PLANS.md
    # §10) for u64 id/hash workloads.  Semantics under reinterpretation:
    # equality, grouping, joins, count/countDistinct and partition hashing
    # are EXACT for the full u64 range (bijective bit mapping); ordering,
    # range predicates, min/max, sum and arithmetic follow the SIGNED
    # values, so they only match unsigned semantics while the data stays
    # below 2^63 — the id/hash case.  Values >= 2^63 appear negative;
    # toUInt64OrDefault-style display math is the caller's job.  Inserts
    # accept the full u64 range and wrap at the write boundary
    # (engine.insert_df).
    reinterp: bool = False


def parse_bql_type(name: str) -> ParsedType:
    """Parse a ClickHouse/BQL type name into its Spark mapping.

    The reference rejects Array/Map/Tuple/Enum (SURVEY §1.2 'explicitly
    absent'); upstream ClickHouse has all four and every real schema uses
    them, so they parse here as a documented dialect superset: Array(T) ->
    ArrayType, Map(K, V) -> MapType, Tuple -> StructType (named or
    positional _1.._n fields), Enum8/16('a' = 1, ...) -> StringType with
    the allowed-value set enforced at insert (like CH rejects unknown enum
    values).  A trailing ``CODEC(...)`` annotation is accepted and dropped:
    codecs pick CH's column compression; parquet + Spark's codec config
    covers the same ground at the storage layer.
    """
    s = _CODEC_RE.sub("", name.strip())
    low = s.lower()

    m = _AGGFN_RE.match(s)
    if m:
        # AggregateFunction(fn[, ArgType...]) — upstream-CH's stored-state
        # column type (pairs with ENGINE=AggregatingMergeTree and the
        # -State/-Merge combinators).  CH stores opaque binary states; the
        # faithful open mapping here stores the PLAIN sufficient statistic
        # the -State templates produce (functions/clickhouse.py): sum/count
        # -> the running number, min/max/any -> the value, avg -> a
        # (sum, count) struct, uniq/groupArray -> the element array.
        parts = _split_commas(m.group(1))
        fn = parts[0].strip().lower()
        arg = parse_bql_type(parts[1]) if len(parts) > 1 else None
        if fn == "count":
            st: T.DataType = T.LongType()
        elif fn == "sum":
            if arg is None:
                raise ValueError(f"AggregateFunction(sum) needs an arg type: {name}")
            st = (
                T.DoubleType()
                if isinstance(arg.spark_type, (T.FloatType, T.DoubleType))
                else T.LongType()
            )
        elif fn in ("min", "max", "any"):
            if arg is None:
                raise ValueError(f"AggregateFunction({fn}) needs an arg type: {name}")
            st = arg.spark_type
        elif fn == "avg":
            st = T.StructType(
                [
                    T.StructField("s", T.DoubleType(), True),
                    T.StructField("c", T.LongType(), True),
                ]
            )
        elif fn in ("uniq", "uniqexact", "grouparray"):
            if arg is None:
                raise ValueError(f"AggregateFunction({fn}) needs an arg type: {name}")
            st = T.ArrayType(arg.spark_type, True)
        else:
            raise ValueError(
                f"unsupported AggregateFunction fn {fn!r} (supported: count, "
                f"sum, min, max, any, avg, uniq, uniqExact, groupArray)"
            )
        return ParsedType(st, agg_fn=fn)

    m = _ARRAY_RE.match(s)
    if m:
        inner = parse_bql_type(m.group(1))
        return ParsedType(T.ArrayType(inner.spark_type, True))

    m = _MAP_RE.match(s)
    if m:
        parts = _split_commas(m.group(1))
        if len(parts) != 2:
            raise ValueError(f"Map needs exactly (K, V): {name}")
        k, v = parse_bql_type(parts[0]), parse_bql_type(parts[1])
        return ParsedType(T.MapType(k.spark_type, v.spark_type, True))

    m = _NESTED_RE.match(s)
    if m:
        # Nested(a T, b U) — CH's table-in-a-cell.  CH physically flattens
        # it to parallel `n.a Array(T)` columns with per-row equal lengths;
        # the Spark-native equivalent carrying the SAME query surface is
        # ONE array<struct<...>> column: `n.a` extracts array<T> (Spark
        # resolves field access over arrays of structs), ARRAY JOIN n
        # explodes to per-element rows where n.a is the scalar field —
        # both exactly CH's read semantics.  Inserts arrive CH-style as
        # per-subcolumn arrays and zip at the write boundary
        # (engine.insert_df), where equal lengths are enforced like CH.
        fields = []
        subnames = []
        for part in _split_commas(m.group(1)):
            nm = re.match(r"(?i)^(?P<fname>[a-z_]\w*)\s+(?P<ftyp>.+)$", part)
            if not nm:
                raise ValueError(f"cannot parse Nested element: {part!r}")
            fields.append(
                T.StructField(
                    nm.group("fname"),
                    parse_bql_type(nm.group("ftyp")).spark_type,
                    True,
                )
            )
            subnames.append(nm.group("fname"))
        return ParsedType(
            T.ArrayType(T.StructType(fields), True),
            nested_fields=tuple(subnames),
        )

    m = _TUPLE_RE.match(s)
    if m:
        fields = []
        for i, part in enumerate(_split_commas(m.group(1)), 1):
            try:  # positional element: the part IS a type
                fields.append(
                    T.StructField(f"_{i}", parse_bql_type(part).spark_type, True)
                )
                continue
            except ValueError:
                pass
            nm = re.match(r"(?i)^(?P<fname>[a-z_]\w*)\s+(?P<ftyp>.+)$", part)
            if not nm:  # named element: 'name Type'
                raise ValueError(f"cannot parse tuple element: {part!r}")
            fields.append(
                T.StructField(
                    nm.group("fname"),
                    parse_bql_type(nm.group("ftyp")).spark_type,
                    True,
                )
            )
        return ParsedType(T.StructType(fields))

    m = _ENUM_RE.match(s)
    if m:
        values = []
        for part in _split_commas(m.group(1)):
            em = re.match(r"^\s*'(?P<v>[^']*)'\s*(?:=\s*-?\d+\s*)?$", part)
            if not em:
                raise ValueError(f"cannot parse enum member: {part!r}")
            values.append(em.group("v"))
        if not values:
            raise ValueError(f"empty enum: {name}")
        return ParsedType(T.StringType(), enum_values=tuple(values))

    m = _NULLABLE_RE.match(s)
    if m:
        inner = parse_bql_type(m.group(1))
        return ParsedType(
            inner.spark_type, True, inner.fixed_len, inner.tz,
            inner.enum_values, reinterp=inner.reinterp,
        )

    m = _LOWCARD_RE.match(s)
    if m:
        inner = parse_bql_type(m.group(1))
        return ParsedType(
            inner.spark_type,
            inner.nullable,
            inner.fixed_len,
            inner.tz,
            inner.enum_values,
        )

    if low == "uint64reinterp":  # see ParsedType.reinterp
        return ParsedType(T.LongType(), reinterp=True)

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

    m = _DATETIME_TZ_RE.match(s)
    if m:
        return ParsedType(T.TimestampType(), tz=m.group(1))

    m = _DATETIME64_RE.match(s)
    if m:
        return ParsedType(T.TimestampType(), tz=m.group(1))

    raise ValueError(f"unsupported type: {name!r}")


def spark_field(col_name: str, bql_type: str) -> T.StructField:
    p = parse_bql_type(bql_type)
    return T.StructField(col_name, p.spark_type, p.nullable)


def spark_type_name(bql_type: str) -> str:
    return parse_bql_type(bql_type).spark_type.simpleString()
