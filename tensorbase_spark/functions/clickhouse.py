"""ClickHouse scalar-function shim as pure built-in Column expressions.

Reference surface: the vendored DataFusion fork's ClickHouse additions
(crates/datafusion/src/physical_plan/clickhouse.rs:39-140) plus the
partition-key expression functions evaluated by the basejit crate
(crates/runtime/src/mgmt.rs:408-469, e.g. toYYYYMMDD / rem).

Everything here is a composition of `pyspark.sql.functions` — JVM-side,
whole-stage-codegen'd, no Python UDFs — so these run at full speed inside
Catalyst at any scale.  Golden values mirrored from
crates/datafusion_tests/tests/clickhouse.rs (see tests/test_functions_clickhouse.py).

Each function accepts a Column or a column name string, like pyspark itself.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _as_ts(col: Column | str) -> Column:
    """ClickHouse toDateTime-style coercion: int -> unix seconds, str -> parse,
    timestamp passes through (clickhouse.rs:53, tests clickhouse.rs:147-240)."""
    c = _c(col)
    return (
        F.when(c.cast("timestamp").isNotNull(), c.cast("timestamp"))
        .otherwise(F.timestamp_seconds(c.cast("long")))
    )


# --- date/time parts (clickhouse.rs:39-59) ---------------------------------

def toYear(col):
    return F.year(_c(col)).alias("toYear")


toYYYY = toYear


def toQuarter(col):
    return F.quarter(_c(col))


def toMonth(col):
    return F.month(_c(col))


def toDayOfYear(col):
    return F.dayofyear(_c(col))


def toDayOfMonth(col):
    return F.dayofmonth(_c(col))


def toDayOfWeek(col):
    # ClickHouse: Monday=1..Sunday=7.  Spark dayofweek: Sunday=1..Saturday=7.
    # Shift: ((spark + 5) % 7) + 1  (clickhouse.rs:49; SURVEY §2.6 note).
    return ((F.dayofweek(_c(col)) + F.lit(5)) % 7 + F.lit(1)).cast("int")


def toHour(col):
    return F.hour(_c(col))


def toMinute(col):
    return F.minute(_c(col))


def toSecond(col):
    return F.second(_c(col))


def toDate(col):
    """CH toDate(int) is VALUE-dispatched: ints in the u16 Date domain
    (0..65535) are days-since-epoch (the reference's own MySQL suite:
    toDate(14610) = '2010-01-01', sanity_checks_mysql.rs:756-980), larger
    ints are unix seconds (datafusion golden clickhouse.rs:14-80:
    toDate(536457600) = '1987-01-01').  Strings/dates/timestamps take the
    cast path."""
    c = _c(col)
    # via string: try_cast(date/timestamp AS decimal) is an ANALYSIS
    # error in Spark 4.x, while anything casts to string
    as_num = c.cast("string").try_cast("decimal(20,0)")
    days = as_num.isNotNull() & (as_num >= 0) & (as_num <= 65535)
    return F.when(
        days, F.date_add(F.lit("1970-01-01").cast("date"), as_num.cast("int"))
    ).otherwise(F.to_date(_as_ts(c)))


def toDateTime(col):
    return _as_ts(col)


def toYYYYMM(col):
    c = _as_date_or_ts(col)
    return (F.year(c) * 100 + F.month(c)).cast("long")


def toYYYYMMDD(col):
    """Partition-key expression JIT'd by the reference at insert time
    (crates/runtime/src/mgmt.rs:444-461; golden: f(0)=19700101,
    f(1095379200)=20040917 per crates/runtime/src/write.rs:548-571).
    In Spark it is just a generated column — no JIT needed."""
    c = _as_date_or_ts(col)
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("long")


def _as_date_or_ts(col):
    """Accept date/timestamp directly; ints are unix seconds."""
    c = _c(col)
    return F.when(c.cast("timestamp").isNotNull(), c.cast("timestamp")).otherwise(
        F.timestamp_seconds(c.cast("long"))
    )


def rem(col, n):
    """Modulo partition expression (crates/tests_integ/benches/bench_ingestion.rs:39)."""
    return _c(col) % F.lit(n)


# --- strings (clickhouse.rs:61) --------------------------------------------

def endsWith(col, suffix):
    return _c(col).endswith(suffix)


def startsWith(col, prefix):
    return _c(col).startswith(prefix)


# --- UUID (clickhouse.rs:63-106) -------------------------------------------

_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"


def generateUUIDv4():
    return F.expr("uuid()")


def _canon_uuid(c: Column) -> Column:
    return F.lower(F.trim(c))


def toUUID(col):
    """Canonical-form string UUID (reference stores FixedSizeBinary(16);
    SURVEY §1.2 maps UUID -> canonical StringType)."""
    c = _canon_uuid(_c(col))
    return F.when(c.rlike(_UUID_RE), c)  # non-matching -> NULL (error in ref; NULL is the non-ANSI analogue)


def toUUIDOrNull(col):
    c = _canon_uuid(_c(col))
    return F.when(c.rlike(_UUID_RE), c).otherwise(F.lit(None))


def toUUIDOrZero(col):
    c = _canon_uuid(_c(col))
    return F.when(c.rlike(_UUID_RE), c).otherwise(F.lit("00000000-0000-0000-0000-000000000000"))


def UUIDStringToNum(col):
    """uuid string -> 16 raw bytes (clickhouse.rs:67)."""
    return F.unhex(F.regexp_replace(_canon_uuid(_c(col)), "-", ""))


def UUIDNumToString(col):
    """16 raw bytes -> canonical uuid string (clickhouse.rs:69)."""
    h = F.lower(F.hex(_c(col)))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


# ---------------------------------------------------------------------------
# Name registry: ClickHouse name -> builder.  Used by the dialect translator
# and by tests.  DataFusion-builtin names that Spark SQL already has verbatim
# (abs, ceil, concat, lower, md5, sha2, ...) need no entry — the translator
# passes them through.
# ---------------------------------------------------------------------------

CH_FUNCTIONS = {
    "toYear": toYear,
    "toYYYY": toYear,
    "toQuarter": toQuarter,
    "toMonth": toMonth,
    "toDayOfYear": toDayOfYear,
    "toDayOfMonth": toDayOfMonth,
    "toDayOfWeek": toDayOfWeek,
    "toHour": toHour,
    "toMinute": toMinute,
    "toSecond": toSecond,
    "toDate": toDate,
    "toDateTime": toDateTime,
    "toYYYYMM": toYYYYMM,
    "toYYYYMMDD": toYYYYMMDD,
    "rem": rem,
    "endsWith": endsWith,
    "startsWith": startsWith,
    "generateUUIDv4": generateUUIDv4,
    "toUUID": toUUID,
    "toUUIDOrNull": toUUIDOrNull,
    "toUUIDOrZero": toUUIDOrZero,
    "UUIDStringToNum": UUIDStringToNum,
    "UUIDNumToString": UUIDNumToString,
}

# SQL-text rewrite templates for the dialect layer: CH call -> Spark SQL text.
# {0}, {1} ... are the argument SQL fragments.
CH_SQL_TEMPLATES = {
    "toyear": "year({0})",
    "toyyyy": "year({0})",
    "toquarter": "quarter({0})",
    "tomonth": "month({0})",
    "todayofyear": "dayofyear({0})",
    "todayofmonth": "dayofmonth({0})",
    "todayofweek": "(((dayofweek({0}) + 5) % 7) + 1)",
    "tohour": "hour({0})",
    "tominute": "minute({0})",
    "tosecond": "second({0})",
    # both CASE branches must ANALYZE for every input type (a timestamp
    # arg never takes the days branch at runtime, but cast(ts as int) is
    # an analysis error) — so the days branch reuses the string-mediated
    # numeric, which is castable from anything
    "todate": (
        "(case when try_cast(cast({0} as string) as decimal(20,0)) "
        "between 0 and 65535 then date_add(date'1970-01-01', "
        "cast(try_cast(cast({0} as string) as decimal(20,0)) as int)) "
        "else to_date(cast({0} as timestamp)) end)"
    ),
    "todatetime": "cast({0} as timestamp)",
    "toyyyymm": "cast(year({0})*100 + month({0}) as bigint)",
    "toyyyymmdd": "cast(year({0})*10000 + month({0})*100 + dayofmonth({0}) as bigint)",
    "rem": "({0} % {1})",
    "endswith": "endswith({0}, {1})",
    "startswith": "startswith({0}, {1})",
    "generateuuidv4": "uuid()",
    # UUID family in the SQL-text layer (mirrors the Column builders above;
    # reference golden: sanity_checks.rs:1204, clickhouse.rs:63-106)
    "touuid": (
        "(case when lower(trim({0})) rlike "
        "'^[0-9a-f]{{8}}-[0-9a-f]{{4}}-[0-9a-f]{{4}}-[0-9a-f]{{4}}-"
        "[0-9a-f]{{12}}$' then lower(trim({0})) end)"
    ),
    "touuidornull": (
        "(case when lower(trim({0})) rlike "
        "'^[0-9a-f]{{8}}-[0-9a-f]{{4}}-[0-9a-f]{{4}}-[0-9a-f]{{4}}-"
        "[0-9a-f]{{12}}$' then lower(trim({0})) end)"
    ),
    "touuidorzero": (
        "coalesce(case when lower(trim({0})) rlike "
        "'^[0-9a-f]{{8}}-[0-9a-f]{{4}}-[0-9a-f]{{4}}-[0-9a-f]{{4}}-"
        "[0-9a-f]{{12}}$' then lower(trim({0})) end, "
        "'00000000-0000-0000-0000-000000000000')"
    ),
    "uuidstringtonum": "unhex(replace(lower(trim({0})), '-', ''))",
    "uuidnumtostring": (
        "concat_ws('-', substring(lower(hex({0})), 1, 8), "
        "substring(lower(hex({0})), 9, 4), substring(lower(hex({0})), 13, 4), "
        "substring(lower(hex({0})), 17, 4), substring(lower(hex({0})), 21, 12))"
    ),
    # introspection (upstream-CH session functions; SHOW-adjacent surface)
    "currentdatabase": "current_database()",
    "currentuser": "current_user()",
    # --- tier 9 (round-8 gap probe): bit distance/rotation, lenient
    # datetime parsing, clamped cumulative sums, bucket rounding, query
    # normalization.  All pure Spark SQL expressions; plain builtins the
    # dialect already passes through (hex/unhex/bin/repeat/least/greatest/
    # initcap/ascii) need no entries here. -------------------------------
    "bithammingdistance": (
        "cast(bit_count(cast({0} as bigint) ^ cast({1} as bigint)) as int)"
    ),
    "bitrotateleft": (
        "(shiftleft(cast({0} as bigint), {1}) | "
        "shiftrightunsigned(cast({0} as bigint), 64 - ({1})))"
    ),
    "bitrotateright": (
        "(shiftrightunsigned(cast({0} as bigint), {1}) | "
        "shiftleft(cast({0} as bigint), 64 - ({1})))"
    ),
    # CH best-effort: try the common layouts in order; null only when all
    # fail (the OrNull spelling is the same expression; plain CH would
    # throw, and the engine's non-ANSI session yields null instead — the
    # lenient edge documented for toDate as well)
    "parsedatetimebesteffort": (
        "coalesce(cast({0} as timestamp), "
        "try_to_timestamp({0}, 'dd/MM/yyyy HH:mm:ss'), "
        "try_to_timestamp({0}, 'dd/MM/yyyy'), "
        "try_to_timestamp({0}, 'dd.MM.yyyy'), "
        "try_to_timestamp({0}, 'yyyyMMddHHmmss'), "
        "try_to_timestamp({0}, 'yyyyMMdd'))"
    ),
    "parsedatetimebesteffortornull": (
        "coalesce(cast({0} as timestamp), "
        "try_to_timestamp({0}, 'dd/MM/yyyy HH:mm:ss'), "
        "try_to_timestamp({0}, 'dd/MM/yyyy'), "
        "try_to_timestamp({0}, 'dd.MM.yyyy'), "
        "try_to_timestamp({0}, 'yyyyMMddHHmmss'), "
        "try_to_timestamp({0}, 'yyyyMMdd'))"
    ),
    # running sum clamped at zero, CH semantics: a clamp RESETS the base
    "arraycumsumnonnegative": (
        "aggregate({0}, "
        "named_struct('a', cast(array() as array<double>), "
        "'s', cast(0.0 as double)), "
        "(acc, x) -> named_struct("
        "'a', concat(acc.a, array(greatest(acc.s + x, cast(0.0 as double)))), "
        "'s', greatest(acc.s + x, cast(0.0 as double))), "
        "acc -> acc.a)"
    ),
    # largest bucket bound <= x; below the smallest bound CH returns the
    # first element
    "rounddown": (
        "coalesce(array_max(filter({1}, __e -> __e <= {0})), "
        "element_at({1}, 1))"
    ),
    # literals -> '?' (CH normalizeQuery's core behavior: string literals
    # first, then bare numbers not inside identifiers)
    "normalizequery": (
        "regexp_replace(regexp_replace({0}, \"'[^']*'\", '?'), "
        "'(?<![a-zA-Z0-9_])[0-9]+(\\\\.[0-9]+)?', '?')"
    ),
    # ---- tier 12: the CH vector-distance family (ANN-adjacent scalar
    # functions over array columns; pure zip_with/aggregate compositions,
    # whole-stage-codegen'd — no UDF in the distance hot path) ------------
    "dotproduct": (
        "aggregate(zip_with({0}, {1}, (x, y) -> x * y), "
        "cast(0.0 as double), (s, v) -> s + v)"
    ),
    "l1distance": (
        "aggregate(zip_with({0}, {1}, (x, y) -> abs(x - y)), "
        "cast(0.0 as double), (s, v) -> s + v)"
    ),
    "l2squareddistance": (
        "aggregate(zip_with({0}, {1}, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (s, v) -> s + v)"
    ),
    "l2distance": (
        "sqrt(aggregate(zip_with({0}, {1}, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (s, v) -> s + v))"
    ),
    "linfdistance": (
        "array_max(zip_with({0}, {1}, (x, y) -> abs(x - y)))"
    ),
    "l1norm": (
        "aggregate({0}, cast(0.0 as double), (s, v) -> s + abs(v))"
    ),
    "l2norm": (
        "sqrt(aggregate({0}, cast(0.0 as double), (s, v) -> s + v * v))"
    ),
    "linfnorm": "array_max(transform({0}, v -> abs(v)))",
    # zero-magnitude vectors: CH answers nan (Spark's non-ANSI 0/0 would
    # silently NULL out of aggregates instead) — coalesce restores nan
    "cosinedistance": (
        "coalesce(1.0 - aggregate(zip_with({0}, {1}, (x, y) -> x * y), "
        "cast(0.0 as double), (s, v) -> s + v) / "
        "(sqrt(aggregate({0}, cast(0.0 as double), (s, v) -> s + v * v)) * "
        "sqrt(aggregate({1}, cast(0.0 as double), (s, v) -> s + v * v))), "
        "cast('NaN' as double))"
    ),
    "normalizel2": (
        "transform({0}, __nv -> coalesce(__nv / "
        "sqrt(aggregate({0}, cast(0.0 as double), (s, v) -> s + v * v)), "
        "cast('NaN' as double)))"
    ),
    # ---- tier 15: URL prefix ladders (web-corpus analytics).  Path
    # SEGMENT levels (CH also emits ?/# levels; this is the documented
    # path-segment subset): intermediate levels keep the trailing slash,
    # the full path does not. ---------------------------------------------
    "urlpathhierarchy": (
        "case when size(filter(split(parse_url({0}, 'PATH'), '/'), "
        "__us -> __us != '')) = 0 then array() else "
        "transform(sequence(1, size(filter(split(parse_url({0}, 'PATH'), "
        "'/'), __us -> __us != ''))), __ui -> concat('/', "
        "array_join(slice(filter(split(parse_url({0}, 'PATH'), '/'), "
        "__us -> __us != ''), 1, __ui), '/'), "
        "if(__ui < size(filter(split(parse_url({0}, 'PATH'), '/'), "
        "__us -> __us != '')), '/', ''))) end"
    ),
    "urlhierarchy": (
        "case when size(filter(split(parse_url({0}, 'PATH'), '/'), "
        "__us -> __us != '')) = 0 then array() else "
        "transform(sequence(1, size(filter(split(parse_url({0}, 'PATH'), "
        "'/'), __us -> __us != ''))), __ui -> concat("
        "regexp_extract({0}, '^([a-zA-Z]+://[^/]+)', 1), '/', "
        "array_join(slice(filter(split(parse_url({0}, 'PATH'), '/'), "
        "__us -> __us != ''), 1, __ui), '/'), "
        "if(__ui < size(filter(split(parse_url({0}, 'PATH'), '/'), "
        "__us -> __us != '')), '/', ''))) end"
    ),
    # ---- tier 14 (sub-milli unix timestamps, URL-safe base64) -----------
    "tounixtimestamp64micro": "unix_micros(cast({0} as timestamp))",
    "fromunixtimestamp64micro": "timestamp_micros(cast({0} as bigint))",
    # Spark timestamps are microsecond-grained: the Nano pair truncates
    # to whole microseconds (documented precision difference)
    "tounixtimestamp64nano": (
        "(unix_micros(cast({0} as timestamp)) * cast(1000 as bigint))"
    ),
    "fromunixtimestamp64nano": (
        "timestamp_micros(cast(cast({0} as bigint) / 1000 as bigint))"
    ),
    # CH base64URLEncode: URL-safe alphabet, padding stripped
    "base64urlencode": (
        "rtrim('=', translate(base64(cast({0} as binary)), '+/', '-_'))"
    ),
    "base64urldecode": (
        "cast(unbase64(concat(translate({0}, '-_', '+/'), "
        "repeat('=', (4 - length({0}) % 4) % 4))) as string)"
    ),
    # ---- tier 13 (time buckets, array-set similarity, map lambdas) ------
    "tostartoffiveminutes": (
        "timestamp_seconds(cast(floor(unix_timestamp("
        "cast({0} as timestamp)) / 300) * 300 as bigint))"
    ),
    "tostartoffifteenminutes": (
        "timestamp_seconds(cast(floor(unix_timestamp("
        "cast({0} as timestamp)) / 900) * 900 as bigint))"
    ),
    # two empty arrays: 0/0 is nan in CH; Spark's non-ANSI NULL is
    # restored to nan so aggregates poison instead of silently skipping
    "arrayjaccardindex": (
        "coalesce(cast(size(array_intersect({0}, {1})) as double) / "
        "cast(size(array_union({0}, {1})) as double), "
        "cast('NaN' as double))"
    ),
    # CH mapFilter(func, map) -> Spark map_filter(map, func); the lambda
    # grammar is identical, only the argument order swaps
    "mapfilter": "map_filter({1}, {0})",
    # ---- tier 11 (everyday date/time arithmetic gaps) -------------------
    "tolastdayofmonth": "last_day(cast({0} as date))",
    # Spark weekofyear IS the ISO week number
    "toisoweek": "weekofyear(cast({0} as date))",
    # ISO year = calendar year of the Thursday of that ISO week; Spark has
    # no isoyear builtin, so shift to the week's Thursday first
    # (isodow = ((dayofweek+5) % 7) + 1, Monday=1)
    "toisoyear": (
        "year(date_add(cast({0} as date), "
        "4 - (pmod(dayofweek(cast({0} as date)) + 5, 7) + 1)))"
    ),
    # days since the MJD epoch 1858-11-17 (inverse of fromModifiedJulianDay)
    "tomodifiedjulianday": "datediff(cast({0} as date), date'1858-11-17')",
    "fromunixtimestamp64milli": "timestamp_millis(cast({0} as bigint))",
    "tounixtimestamp64milli": "unix_millis(cast({0} as timestamp))",
    "addquarters": "add_months({0}, 3 * ({1}))",
    "subtractquarters": "add_months({0}, -3 * ({1}))",
}


def _digest_sql(args: list[str]) -> str:
    """digest(expr, 'algo') (crypto_expressions.rs; name map functions.rs:467).
    The algorithm argument must be a string literal, as in the reference."""
    algo = args[1].strip().strip("'\"").lower()
    if algo == "md5":
        return f"md5({args[0]})"
    if algo.startswith("sha") and algo[3:] in ("224", "256", "384", "512"):
        return f"sha2({args[0]}, {algo[3:]})"
    raise ValueError(f"digest: unsupported algorithm {algo!r}")


def _trunc_sql(args: list[str]) -> str:
    # DataFusion trunc(x) is numeric truncation toward zero
    # (math_expressions.rs); Spark's trunc is date-only, so rewrite the
    # 1-arg form and pass the date form through.
    if len(args) == 1:
        return f"cast(cast({args[0]} as bigint) as double)"
    return f"trunc({', '.join(args)})"


# DataFusion-builtin names whose Spark SQL spelling or semantics differ
# (name map functions.rs:410-520).  Names not listed here (abs, ceil, concat,
# split_part, btrim, bit_length, ...) are spelled identically in Spark SQL
# and pass through translate_sql untouched.  Values are either .format
# templates or callables over the translated argument fragments.
CH_SQL_TEMPLATES.update(
    {
        # DataFusion log(x) IS log10 (functions.rs:749) — Spark log(x) is ln.
        "log": "log10({0})",
        "trunc": _trunc_sql,
        "strpos": "locate({1}, {0})",
        "to_hex": "hex({0})",
        "chr": "char({0})",
        "sha224": "sha2({0}, 224)",
        "sha256": "sha2({0}, 256)",
        "sha384": "sha2({0}, 384)",
        "sha512": "sha2({0}, 512)",
        "digest": _digest_sql,
        # regexp_match returns the array of matches (regex_expressions.rs:235)
        "regexp_match": "regexp_extract_all({0}, {1}, 0)",
        "to_timestamp_seconds": "timestamp_seconds({0})",
        "to_timestamp_millis": "timestamp_millis({0})",
        "to_timestamp_micros": "timestamp_micros({0})",
        "random": "rand()",
    }
)


def _xxhash64_sql(args: list[str]) -> str:
    # CH's 64-bit hash family (cityHash64/sipHash64/farmHash64/intHash64)
    # is used for sharding, sampling and sort-scatter — all care about
    # distribution quality, not the exact CH bit pattern (which differs
    # between CH versions anyway).  Spark's variadic xxhash64 is the
    # JVM-codegen'd equivalent.  Documented value divergence from CH.
    return f"xxhash64({', '.join(args)})"


CH_SQL_TEMPLATES.update(
    {
        "cityhash64": _xxhash64_sql,
        "siphash64": _xxhash64_sql,
        "farmhash64": _xxhash64_sql,
        "farmfingerprint64": _xxhash64_sql,
        "inthash64": _xxhash64_sql,
        # 32-bit bucket hash -> Spark's murmur3 (also distribution-only)
        "inthash32": "hash({0})",
        # halfMD5: first 8 md5 bytes read big-endian as UInt64 — EXACTLY
        # reproducible from the hex digest (CH reads big-endian)
        "halfmd5": (
            "cast(conv(substring(md5(cast({0} as string)), 1, 16), 16, 10) "
            "as decimal(20,0))"
        ),
    }
)


def _remote_sql(args: list[str]) -> str:
    # remote('addr', db.table) table function (grammar bql.pest:133-139,
    # exec crates/runtime/src/read.rs:151-228).  The SQL-text form resolves
    # the local: loopback scheme against the session catalog; JDBC federation
    # needs reader options, so it lives in sources.external.remote.
    addr = args[0].strip().strip("'\"")
    tbl = args[1].strip().strip("'\"")
    if addr.startswith("local:"):
        return tbl
    raise ValueError(
        f"remote({addr!r}): SQL-text form supports the local: loopback only; "
        "use tensorbase_spark.sources.external.remote for JDBC"
    )


CH_SQL_TEMPLATES.update(
    {
        # numbers(N) table function (bql.pest:349-353) -> Spark's range()
        # table-valued function: a parallel synthetic scan, splittable by range.
        "numbers": "(select id as number from range({0}))",
        "remote": _remote_sql,
    }
)

def _datediff_sql(args: list[str]) -> str:
    """CH dateDiff('unit', start, end) = end - start; Spark's 2-arg
    datediff(end, start) passes through untouched."""
    if len(args) == 2:
        return f"datediff({args[0]}, {args[1]})"
    unit = args[0].strip().strip("'\"").lower()
    if unit == "day":
        return f"datediff({args[2]}, {args[1]})"
    if unit == "month":
        return (
            f"((year({args[2]}) * 12 + month({args[2]})) - "
            f"(year({args[1]}) * 12 + month({args[1]})))"
        )
    if unit == "year":
        return f"(year({args[2]}) - year({args[1]}))"
    raise ValueError(f"dateDiff: unsupported unit {unit!r}")


# ClickHouse-dialect extensions beyond the vendored fork's list: the -If
# aggregate combinators, uniq family, arrayJoin, everyday date helpers, and
# string predicates any ClickHouse user writes daily.  The reference would
# reject these at the grammar (bql.pest has no combinator forms); supporting
# them makes the dialect a practical superset.  All rewrite to codegen'd
# Spark built-ins.
CH_SQL_TEMPLATES.update(
    {
        "countif": "count_if({0})",
        "sumif": "sum(if({1}, {0}, null))",
        "avgif": "avg(if({1}, {0}, null))",
        "minif": "min(if({1}, {0}, null))",
        "maxif": "max(if({1}, {0}, null))",
        "uniq": "approx_count_distinct({0})",
        "uniqcombined": "approx_count_distinct({0})",
        "uniqcombined64": "approx_count_distinct({0})",
        "uniqhll12": "approx_count_distinct({0})",
        "uniqexact": "count(distinct {0})",
        "arrayjoin": "explode({0})",
        "empty": "(char_length({0}) = 0)",
        "notempty": "(char_length({0}) > 0)",
        "lcase": "lower({0})",
        "ucase": "upper({0})",
        "tostartofmonth": "date_trunc('month', {0})",
        "tostartofquarter": "date_trunc('quarter', {0})",
        "tostartofyear": "date_trunc('year', {0})",
        "tostartofday": "date_trunc('day', {0})",
        "tostartofhour": "date_trunc('hour', {0})",
        "tomonday": "date_sub({0}, (((dayofweek({0}) + 5) % 7)))",
        "adddays": "date_add({0}, {1})",
        "subtractdays": "date_sub({0}, {1})",
        "addmonths": "add_months({0}, {1})",
        "datediff": _datediff_sql,
        "yesterday": "date_sub(current_date(), 1)",
        "today": "current_date()",
        # everyday CH aggregates (upstream ClickHouse; absent from the fork's
        # aggregates.rs:52-67 list — dialect superset, all Spark built-ins)
        "argmax": "max_by({0}, {1})",
        "argmin": "min_by({0}, {1})",
        "avgweighted": "(sum(({0}) * ({1})) / sum({1}))",
        # any(expr) aggregate vs `> ANY (subquery)` comparison: only the
        # aggregate form rewrites; a subquery argument passes through.  A
        # real subquery needs a SELECT/WITH *keyword* (word boundary, maybe
        # parenthesized) — a column merely named `selection`/`withdrawn`
        # must still take the any_value rewrite.
        "any": lambda args: (
            f"any ({', '.join(args)})"
            if len(args) == 1
            and _re.match(r"(?is)\s*\(*\s*(select|with)\b", args[0])
            else f"any_value({args[0]})"
        ),
        "anylast": "any_value({0})",
        "grouparray": "collect_list({0})",
        "groupuniqarray": "collect_set({0})",
        "median": "percentile({0}, 0.5)",
        # ClickHouse's non-curried shorthand quantile(x) defaults to p=0.5;
        # the curried quantile(p)(x) form is handled by the parametric table
        # (translate_sql tries CH_PARAMETRIC_TEMPLATES first and only falls
        # through here when there is no second argument group).
        "quantile": "percentile({0}, 0.5)",
        "quantileexact": "percentile({0}, 0.5)",
        # CH array membership helpers
        "has": "array_contains({0}, {1})",
        "indexof": "array_position({0}, {1})",
    }
)


# Everyday-ClickHouse tier 3 (all upstream-CH names the fork's grammar could
# pass through as func_call_expr but the fork never registered — dialect
# superset; every rewrite is a JVM built-in expression).
CH_SQL_TEMPLATES.update(
    {
        "countequal": "size(filter({0}, v -> v = {1}))",
        "arrayproduct": "aggregate({0}, cast(1.0 as double), (a, x) -> a * x)",
        # CH range(n) = [0 .. n-1]; range(a, b[, s]) end-exclusive.  Spark's
        # sequence() is end-INCLUSIVE and auto-descends when start > stop, so
        # the empty case needs an explicit guard.
        "range": lambda args: (
            f"(case when {args[0]} <= 0 then array() "
            f"else sequence(0, {args[0]} - 1) end)"
            if len(args) == 1
            else (
                f"(case when {args[1]} <= {args[0]} then array() "
                f"else sequence({args[0]}, {args[1]} - 1"
                + (f", {args[2]}" if len(args) > 2 else "")
                + ") end)"
            )
        ),
        # dateAdd/dateSub(unit, n, d) — unit arrives as an ident or literal
        "dateadd": lambda args: (
            f"timestampadd({args[0].strip(chr(39))}, {args[1]}, {args[2]})"
        ),
        "datesub": lambda args: (
            f"timestampadd({args[0].strip(chr(39))}, -({args[1]}), {args[2]})"
        ),
        "now64": "now()",
        "mid": "substring({0}, {1}, {2})",
        # CH locate/position take (haystack, needle) — Spark's locate is the
        # REVERSED (needle, haystack); instr keeps CH's order
        "locate": "instr({0}, {1})",
        "splitbyregexp": "filter(split({1}, {0}), x -> x != '')",
        "alphatokens": "filter(split({0}, '[^A-Za-z]+'), x -> x != '')",
        "bittest": "cast((shiftright({0}, {1}) & 1) as tinyint)",
        "exp2": "power(2, {0})",
        "exp10": "power(10, {0})",
        "intexp2": "cast(power(2, {0}) as bigint)",
        "intexp10": "cast(power(10, {0}) as bigint)",
        "roundtoexp2": "cast(power(2, floor(log2({0}))) as bigint)",
        "ord": "ascii({0})",
        "unbin": "conv({0}, 2, 10)",
        # tier 10 (r9).  bin() pads to whole bytes like CH (CH pads to the
        # TYPE width; widths are erased here, so the spec is the minimal
        # byte width of the VALUE — deterministic, and what the oracle
        # computes).  byteSwap is the 64-bit swap over non-negative ints
        # (shiftrightunsigned keeps the byte lanes clean).
        "bin": (
            "lpad(conv(cast({0} as bigint), 10, 2), cast(ceil(length("
            "conv(cast({0} as bigint), 10, 2)) / 8.0) * 8 as int), '0')"
        ),
        "byteswap": (
            "(shiftleft(cast({0} as bigint) & 255, 56)"
            " + shiftleft(shiftrightunsigned(cast({0} as bigint), 8) & 255, 48)"
            " + shiftleft(shiftrightunsigned(cast({0} as bigint), 16) & 255, 40)"
            " + shiftleft(shiftrightunsigned(cast({0} as bigint), 24) & 255, 32)"
            " + shiftleft(shiftrightunsigned(cast({0} as bigint), 32) & 255, 24)"
            " + shiftleft(shiftrightunsigned(cast({0} as bigint), 40) & 255, 16)"
            " + shiftleft(shiftrightunsigned(cast({0} as bigint), 48) & 255, 8)"
            " + (shiftrightunsigned(cast({0} as bigint), 56) & 255))"
        ),
        # character-SET Jaccard (DuckDB's jaccard() has the same spec);
        # the trailing-empty token from split(s, '') is filtered out
        "stringjaccardindex": (
            "(cast(size(array_intersect("
            "filter(split({0}, ''), __t -> __t <> ''), "
            "filter(split({1}, ''), __t -> __t <> ''))) as double)"
            " / size(array_union("
            "filter(split({0}, ''), __t -> __t <> ''), "
            "filter(split({1}, ''), __t -> __t <> ''))))"
        ),
        "arrayrotateleft": (
            "concat(slice({0}, ({1} % size({0})) + 1, "
            "size({0}) - ({1} % size({0}))), "
            "slice({0}, 1, {1} % size({0})))"
        ),
        "arrayrotateright": (
            "concat(slice({0}, size({0}) - ({1} % size({0})) + 1, "
            "{1} % size({0})), "
            "slice({0}, 1, size({0}) - ({1} % size({0}))))"
        ),
        "arrayshiftleft": (
            "concat(slice({0}, {1} + 1, size({0}) - {1}), "
            "array_repeat({2}, {1}))"
        ),
        "arrayshiftright": (
            "concat(array_repeat({2}, {1}), "
            "slice({0}, 1, size({0}) - {1}))"
        ),
        "appendtrailingcharifabsent": "if(endswith({0}, {1}), {0}, concat({0}, {1}))",
        "tonullable": "({0})",
        "assumenotnull": "({0})",
        # overflow wraps already (ANSI off — DataFusion-6 parity, session.py);
        # Kahan compensation is moot in double aggregation with codegen'd sum
        "sumwithoverflow": "sum({0})",
        "sumkahan": "sum({0})",
        "groupbitand": "bit_and({0})",
        "groupbitor": "bit_or({0})",
        "groupbitxor": "bit_xor({0})",
        # enumeration + identity/introspection odds and ends
        # occurrence index per element: rank of this occurrence among equal
        # values so far — O(n²) HOF, bounded by array length (CH's own is
        # per-block quadratic too)
        "arrayenumerateuniq": (
            "transform({0}, (v, i) -> size(filter(slice({0}, 1, i + 1), u -> u = v)))"
        ),
        "tolowcardinality": "({0})",  # dictionary encoding is storage-level here
        "materialize": "({0})",
        "ignore": lambda args: "(0)",
        "totypename": "typeof({0})",
        # text-search helpers (the functions CH pairs with tokenbf skip
        # indexes; here the bloom-filter DDL covers the storage side and
        # these cover the expression side)
        "hastoken": (
            "array_contains(filter(split({0}, '[^A-Za-z0-9]+'), x -> x != ''), {1})"
        ),
        "hastokencaseinsensitive": (
            "array_contains(filter(split(lower({0}), '[^a-z0-9]+'), x -> x != ''),"
            " lower({1}))"
        ),
        "multisearchany": "exists({1}, x -> instr({0}, x) > 0)",
        "multisearchanycaseinsensitive": (
            "exists({1}, x -> instr(lower({0}), lower(x)) > 0)"
        ),
        # CH -Array combinators: the aggregate runs over all elements of all
        # array arguments in the group (sumArray([1,2]) + sumArray([3]) = 6)
        "sumarray": "sum(aggregate({0}, cast(0.0 as double), (a, x) -> a + x))",
        "countarray": "sum(size({0}))",
        "avgarray": (
            "(sum(aggregate({0}, cast(0.0 as double), (a, x) -> a + x))"
            " / sum(size({0})))"
        ),
        "minarray": "min(array_min({0}))",
        "maxarray": "max(array_max({0}))",
        # anyHeavy approximates the most frequent value; Spark's exact mode
        # (ties -> NULL-safe arbitrary in Spark, so pin determinism with
        # mode() which takes the first in sort order on ties in 4.x)
        "anyheavy": "mode({0})",
        # CH arrayFold((acc, x) -> ..., arr, init) vs Spark
        # aggregate(arr, init, (acc, x) -> ...): same lambda arrow syntax,
        # different argument order
        "arrayfold": "aggregate({1}, {2}, {0})",
        # arrayReduce('agg', arr): the common aggregator names as HOFs
        "arrayreduce": lambda args: {
            "'sum'": f"aggregate({args[1]}, cast(0.0 as double), (a, x) -> a + x)",
            "'max'": f"array_max({args[1]})",
            "'min'": f"array_min({args[1]})",
            "'avg'": (
                f"(aggregate({args[1]}, cast(0.0 as double), (a, x) -> a + x)"
                f" / size({args[1]}))"
            ),
            "'count'": f"size({args[1]})",
        }.get(
            args[0].strip().lower(),
            f"arrayReduce({', '.join(args)})",  # unknown aggregator: pass through
        ),
        # CH greatCircleDistance(lon1, lat1, lon2, lat2) -> meters (haversine,
    }
)


def _sequence_match_tmpl(params: list[str], args: list[str]) -> str:
    """sequenceMatch('(?1).*(?2)')(ts, c1, c2): true when some c1 event
    precedes some c2 event — exactly `min(ts | c1) < max(ts | c2)` in one
    aggregation pass.  Only the 2-step chain pattern compiles to a single
    aggregate expression; longer chains are event funnels — use the
    windowFunnel operator (operators/funnel.py), which CH users reach for at
    that complexity anyway."""
    pat = params[0].strip().strip("'\"").replace(" ", "")
    if pat != "(?1).*(?2)" or len(args) != 3:
        raise ValueError(
            "sequenceMatch: only the '(?1).*(?2)' 2-step chain is supported "
            "as an aggregate; use windowFunnel for longer sequences"
        )
    ts, c1, c2 = args
    # CH returns 0 when either step never fires; the bare comparison would
    # be NULL there
    return (
        f"coalesce(min(case when {c1} then {ts} end)"
        f" < max(case when {c2} then {ts} end), false)"
    )


# ClickHouse parametric aggregates — the curried name(params)(args) call
# shape (quantile(0.5)(x)).  Values are callables (params, args) -> SQL.
# CH's quantile* family is approximate (reservoir/t-digest); the Spark
# rewrite uses the exact interpolated percentile, which is deterministic and
# matches DuckDB's quantile_cont for oracle checks — documented superset.
CH_PARAMETRIC_TEMPLATES = {
    "quantile": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantileexact": lambda p, a: f"percentile({a[0]}, {p[0]})",
    # CH's tdigest/timing variants are EXPLICITLY sketch-based; Spark's
    # bounded-memory analogue is approx_percentile (accuracy 10000), not the
    # exact percentile — which buffers every group value and cannot run on a
    # 100 TB group.  quantile/quantileExact keep the exact mapping (CH
    # quantileExact is exact and buffering by contract too).
    "quantiletdigest": lambda p, a: f"approx_percentile({a[0]}, {p[0]}, 10000)",
    "quantiletiming": lambda p, a: f"approx_percentile({a[0]}, {p[0]}, 10000)",
    "quantiles": lambda p, a: f"percentile({a[0]}, array({', '.join(p)}))",
    "quantilesexact": lambda p, a: f"percentile({a[0]}, array({', '.join(p)}))",
    # uniqUpTo(N)(x): exact distinct count, saturating at N+1 (CH contract:
    # "up to N, N+1 means more than N")
    "uniqupto": lambda p, a: f"least(count(distinct {a[0]}), {p[0]} + 1)",
    "sequencematch": _sequence_match_tmpl,
    # topKWeighted(k)(x, w): weight-summed heavy hitters.  CH's is a
    # SpaceSaving sketch (approximate under eviction); the deterministic
    # analogue sums exact weights per value over the single-collect
    # lambda-binding buffer (the quantileExact contract) and takes the
    # top k by (weight desc, value asc) — a total order, tie-stable.
    "topkweighted": lambda p, a: (
        "element_at(transform(array(collect_list(named_struct("
        "'x', cast({x} as string), 'w', cast({w} as double)))), "
        "arr -> slice(transform(array_sort(transform("
        "array_distinct(transform(arr, q -> q.x)), v -> named_struct("
        "'nw', -aggregate(filter(arr, q -> q.x <=> v), cast(0.0 as double), "
        "(acc, q) -> acc + q.w), 'v', v))), s -> s.v), 1, {k})), 1)"
    ).format(x=a[0], w=a[1], k=int(p[0].strip())),
    # histogram(M)(x): CH's is an ADAPTIVE streaming histogram whose bin
    # edges depend on arrival order (documented non-deterministic); the
    # deterministic analogue is M equi-width bins over [min, max] — the
    # same (lo, hi, height) tuple-array shape, engine-reproducible.  The
    # M conditional sums expand inline, all inside one partial->final
    # aggregate pass.
    "histogram": lambda p, a: _histogram_tmpl(int(p[0].strip()), a[0]),
    # -- internal pair-form distribution aggregates ----------------------
    # Emitted ONLY by engine._rewrite_dist_aggs' two-level lowering: the
    # caller pre-aggregated to one row per (group, value) with __dc =
    # count(*) / __dw = sum(weight), so the buffer here holds DISTINCT
    # values (already map-side combined) instead of raw rows — the 100 TB
    # shape for topK/topKWeighted/histogram/entropy.
    # __topkpairs(k)(v, score): top-k values by (score desc, value asc);
    # v is distinct per group by construction, nulls skipped like
    # collect_list does in the single-pass form.
    "__topkpairs": lambda p, a: (
        f"transform(slice(array_sort(collect_list(case when {a[0]} is not "
        f"null then named_struct('negs', -({a[1]}), 'v', {a[0]}) end)), "
        f"1, {int(p[0].strip())}), __q -> __q.v)"
    ),
    "__histpairs": lambda p, a: _histpairs_tmpl(int(p[0].strip()), a[0], a[1]),
    # -- tier 25 ----------------------------------------------------------
    # groupArraySorted(k)(x): the k smallest values in ascending order
    "grouparraysorted": lambda p, a: (
        f"slice(array_sort(collect_list({a[0]})), 1, {int(p[0].strip())})"
    ),
    # bfloat16 is another CH sketch-quantile; same bounded-memory analogue
    "quantilebfloat16": lambda p, a: (
        f"approx_percentile({a[0]}, {p[0]}, 10000)"
    ),
    # the determinator argument only stabilizes CH's reservoir sampling —
    # the exact percentile is already deterministic, so it is ignored
    "quantiledeterministic": lambda p, a: f"percentile({a[0]}, {p[0]})",
    # quantileExactWeighted(p)(x, w): the value whose running weight
    # first reaches p * total over the value-sorted pairs (CH exact
    # semantics).  One buffered collect per group (the quantileExact
    # contract), all arithmetic in JVM lambdas.
    "quantileexactweighted": lambda p, a: (
        "element_at(transform(array(array_sort(collect_list("
        "named_struct('x', cast({x} as double), 'w', cast({w} as "
        "double))))), __arr -> element_at(transform(array(aggregate("
        "__arr, cast(0.0 as double), (__s, __q) -> __s + __q.w)), "
        "__tot -> aggregate(__arr, named_struct('cum', cast(0.0 as "
        "double), 'ans', cast(null as double)), (__acc, __q) -> case "
        "when __acc.ans is not null then __acc when __acc.cum + __q.w "
        ">= {p} * __tot then named_struct('cum', __acc.cum + __q.w, "
        "'ans', __q.x) else named_struct('cum', __acc.cum + __q.w, "
        "'ans', __acc.ans) end, __acc -> __acc.ans)), 1)), 1)"
    ).format(x=a[0], w=a[1], p=p[0]),
}

# plain topK(x) (no parameter list): upstream CH defaults to k = 10
CH_SQL_TEMPLATES["topk"] = (
    lambda a: CH_PARAMETRIC_TEMPLATES["topk"](["10"], a)
)


def _histogram_tmpl(m: int, x: str) -> str:
    # Bin edges derive from the group's min/max, and SQL forbids an
    # aggregate inside another aggregate's argument — so the group buffers
    # once via collect_list and every edge/count is an array expression
    # over that one buffer (Catalyst dedups the identical aggregate).
    # Buffering-per-group is this dialect's accepted contract for exact
    # order statistics (see quantileExact above); CH's adaptive histogram
    # is likewise a per-group in-memory structure.
    if not 1 <= m <= 64:
        raise ValueError("histogram(M): M must be in [1, 64]")
    # The buffer must be aggregated ONCE: M textual collect_list copies
    # each became their own aggregate buffer (measured: minutes at 150k
    # rows/group).  Binding it through a 1-element transform lambda —
    # transform(array(collect_list(x)), arr -> <M bins over arr>)[1] —
    # names the single buffer `arr`, so every bin references the lambda
    # variable, zero re-aggregation.  min/max are cheap native aggregates
    # (Catalyst dedups identical ones) and stay outside.
    lo, hi = f"min(cast({x} as double))", f"max(cast({x} as double))"
    w = f"(({hi}) - ({lo})) / {m}.0"
    bins = []
    for i in range(m):
        b_lo = f"({lo}) + {i} * ({w})"
        b_hi = f"({lo}) + {i + 1} * ({w})"
        upper = f"v < {b_hi}" if i < m - 1 else f"v <= ({hi})"
        cnt = f"size(filter(arr, v -> v >= ({b_lo}) and {upper}))"
        bins.append(
            f"named_struct('_1', {b_lo}, '_2', {b_hi}, "
            f"'_3', cast({cnt} as double))"
        )
    return (
        f"element_at(transform(array(collect_list(cast({x} as double))), "
        f"arr -> array({', '.join(bins)})), 1)"
    )


def _histpairs_tmpl(m: int, v: str, c: str) -> str:
    """Pair-form equi-width histogram (see __topkpairs note): ``v`` is the
    distinct value, ``c`` its pre-aggregated count.  Identical (lo, hi,
    height) output to _histogram_tmpl — heights sum the pair counts instead
    of sizing a raw-row buffer; min/max are native combinable aggregates."""
    if not 1 <= m <= 64:
        raise ValueError("histogram(M): M must be in [1, 64]")
    lo, hi = f"min(cast({v} as double))", f"max(cast({v} as double))"
    w = f"(({hi}) - ({lo})) / {m}.0"
    bins = []
    for i in range(m):
        b_lo = f"({lo}) + {i} * ({w})"
        b_hi = f"({lo}) + {i + 1} * ({w})"
        upper = f"__q.v < {b_hi}" if i < m - 1 else f"__q.v <= ({hi})"
        cnt = (
            f"aggregate(filter(arr, __q -> __q.v >= ({b_lo}) and {upper}), "
            f"cast(0 as bigint), (acc, __q) -> acc + __q.c)"
        )
        bins.append(
            f"named_struct('_1', {b_lo}, '_2', {b_hi}, "
            f"'_3', cast({cnt} as double))"
        )
    return (
        f"element_at(transform(array(collect_list(case when {v} is not null "
        f"then named_struct('v', cast({v} as double), 'c', {c}) end)), "
        f"arr -> array({', '.join(bins)})), 1)"
    )


def _entropypairs_sql(args: list[str]) -> str:
    """Pair-form Shannon entropy: args = (value, count).  N and the p*log2 p
    sum both derive from the ≤distinct-size count array inside one lambda
    chain (the single-collect binding idiom)."""
    v, c = args[0], args[1]
    return (
        f"element_at(transform(array(collect_list(case when {v} is not null "
        f"then cast({c} as double) end)), __a -> element_at(transform("
        f"array(aggregate(__a, cast(0.0 as double), (__s, __c) -> __s + __c)), "
        f"__n -> aggregate(__a, cast(0.0 as double), "
        f"(__acc, __c) -> __acc - (__c / __n) * log2(__c / __n))), 1)), 1)"
    )


CH_SQL_TEMPLATES["__entropypairs"] = _entropypairs_sql


def _json_tmpl(fmt: str):
    # JSONExtract*(json, 'key') -> get_json_object with a '$.key' path
    def f(args: list[str]) -> str:
        key = args[1].strip().strip("'\"")
        return fmt.format(args[0], f"'$.{key}'")

    return f


CH_SQL_TEMPLATES.update(
    {
        "jsonextractstring": _json_tmpl("get_json_object({0}, {1})"),
        "jsonextractint": _json_tmpl("cast(get_json_object({0}, {1}) as bigint)"),
        "jsonextractfloat": _json_tmpl("cast(get_json_object({0}, {1}) as double)"),
        "jsonhas": _json_tmpl("(get_json_object({0}, {1}) is not null)"),
        # CH string predicates (upstream; the fork's grammar has no LIKE at
        # all, SURVEY §2.3 — the function forms cover the same ground)
        "match": "({0} rlike {1})",
        "like": "({0} like {1})",
        "notlike": "({0} not like {1})",
        "ilike": "(lower({0}) like lower({1}))",
        "position": "locate({1}, {0})",
        "positionutf8": "locate({1}, {0})",
        "positioncaseinsensitive": "locate(lower({1}), lower({0}))",
        "base64encode": "base64({0})",
        "base64decode": "cast(unbase64({0}) as string)",
        "trybase64decode": "cast(unbase64({0}) as string)",  # ANSI off: NULL on bad input
        "ifempty": "(case when {0} is null or char_length({0}) = 0 then {1} else {0} end)",
        "countsubstrings": (
            "cast((char_length({0}) - char_length(replace({0}, {1}, '')))"
            " / char_length({1}) as int)"
        ),
    }
)


def _multiif_sql(args: list[str]) -> str:
    """multiIf(c1, v1, c2, v2, ..., else) -> CASE chain (ClickHouse
    conditional; upstream dialect — the fork has no such builtin)."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise ValueError("multiIf needs cond/value pairs plus an else")
    parts = ["CASE"]
    for i in range(0, len(args) - 1, 2):
        parts.append(f"WHEN {args[i]} THEN {args[i + 1]}")
    parts.append(f"ELSE {args[-1]} END")
    return "(" + " ".join(parts) + ")"


def _arraycount_sql(args: list[str]) -> str:
    if len(args) == 1:
        return f"size(filter({args[0]}, x -> x != 0))"
    return f"size(filter({args[1]}, {args[0]}))"


def _arraysum_sql(args: list[str]) -> str:
    if len(args) == 1:
        return f"aggregate({args[0]}, cast(0 as double), (acc, x) -> acc + x)"
    # arraySum(lambda, arr): map then fold
    return (
        f"aggregate(transform({args[1]}, {args[0]}), "
        "cast(0 as double), (acc, x) -> acc + x)"
    )


def _arraystringconcat_sql(args: list[str]) -> str:
    sep = args[1] if len(args) > 1 else "''"
    return f"array_join({args[0]}, {sep})"


def _splitbychar_sql(args: list[str]) -> str:
    # split(str, regex) in Spark: \Q...\E quotes the literal separator
    return f"split({args[1]}, concat('\\\\Q', {args[0]}, '\\\\E'))"


_CH_FMT_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%M": "mm", "%S": "ss", "%j": "DDD", "%e": "d",
    "%F": "yyyy-MM-dd", "%T": "HH:mm:ss", "%%": "%",
}


def _formatdatetime_sql(args: list[str]) -> str:
    """formatDateTime(ts, '%Y-%m-%d') with the common strftime codes mapped
    to Java datetime patterns; the format must be a string literal."""
    fmt = args[1].strip()
    if not (fmt.startswith("'") and fmt.endswith("'")):
        raise ValueError("formatDateTime: format must be a string literal")
    body = fmt[1:-1]
    out, i = [], 0
    while i < len(body):
        if body[i] == "%" and i + 1 < len(body):
            code = body[i : i + 2]
            if code not in _CH_FMT_TO_JAVA:
                raise ValueError(f"formatDateTime: unsupported code {code}")
            out.append(_CH_FMT_TO_JAVA[code])
            i += 2
        else:
            # literal chars inside a Java pattern need quoting when they are
            # letters; quote runs of non-% chars wholesale
            j = i
            while j < len(body) and body[j] != "%":
                j += 1
            lit = body[i:j]
            out.append("'" + lit.replace("'", "''") + "'" if lit.strip(" -:/,.") else lit)
            i = j
    return f"date_format({args[0]}, '{''.join(out)}')"


# Cast family (BqlType widening per SURVEY §1.2: UInt8->Short, UInt16->Int,
# UInt32->Long, UInt64->Decimal(20,0)).  With ANSI off a failed cast yields
# NULL, which makes the OrNull forms plain casts and OrZero a coalesce.
CH_SQL_TEMPLATES.update(
    {
        "toint8": "cast({0} as tinyint)",
        "toint16": "cast({0} as smallint)",
        "toint32": "cast({0} as int)",
        "toint64": "cast({0} as bigint)",
        "touint8": "cast({0} as smallint)",
        "touint16": "cast({0} as int)",
        "touint32": "cast({0} as bigint)",
        "touint64": "cast({0} as decimal(20,0))",
        "tofloat32": "cast({0} as float)",
        "tofloat64": "cast({0} as double)",
        "tostring": "cast({0} as string)",
        "toint32ornull": "cast({0} as int)",
        "toint64ornull": "cast({0} as bigint)",
        "tofloat64ornull": "cast({0} as double)",
        "toint32orzero": "coalesce(cast({0} as int), 0)",
        "toint64orzero": "coalesce(cast({0} as bigint), 0)",
        "tofloat64orzero": "coalesce(cast({0} as double), cast(0 as double))",
        "todecimal32": "cast({0} as decimal(9, {1}))",
        "todecimal64": "cast({0} as decimal(18, {1}))",
    }
)

# Array functions & higher-order lambdas.  ClickHouse puts the lambda FIRST
# (arrayMap(x -> e, arr)); Spark puts the array first — the templates
# reorder.  Lambda arrow syntax is identical, so fragments pass through.
CH_SQL_TEMPLATES.update(
    {
        "arraymap": "transform({1}, {0})",
        "arrayfilter": "filter({1}, {0})",
        "arrayexists": "exists({1}, {0})",
        "arrayall": "forall({1}, {0})",
        "arraycount": _arraycount_sql,
        "arraysum": _arraysum_sql,
        "arrayavg": "(aggregate({0}, cast(0 as double), (acc, x) -> acc + x)"
                    " / size({0}))",
        "arraymin": "array_min({0})",
        "arraymax": "array_max({0})",
        "arraydistinct": "array_distinct({0})",
        "arrayuniq": "size(array_distinct({0}))",
        "arraysort": "sort_array({0})",
        "arrayreversesort": "sort_array({0}, false)",
        "arrayreverse": "reverse({0})",
        "arrayconcat": "concat({0}, {1})",
        "arrayslice": "slice({0}, {1}, {2})",
        "arrayflatten": "flatten({0})",
        "arrayenumerate": (
            # sequence(1, 0) DESCENDS in Spark — empty arrays need the guard
            "(case when size({0}) = 0 then array() else sequence(1, size({0})) end)"
        ),
        "has": "array_contains({0}, {1})",
        "indexof": "array_position({0}, {1})",
        "arrayelement": "element_at({0}, {1})",
        "arraypushback": "concat({0}, array({1}))",
        "arraypushfront": "concat(array({1}), {0})",
        "arraystringconcat": _arraystringconcat_sql,
        # arrayFirst: NULL when no element matches (CH returns the type's
        # default value there — NULL is the honest Spark spelling)
        "arrayfirst": "element_at(filter({1}, {0}), 1)",
        # both engines return 0 for "no match" (Spark array_position contract)
        "arrayfirstindex": "array_position(transform({1}, {0}), true)",
        # CH arrayZip names tuple fields _1.._n (tupleElement(t, k) must
        # resolve); Spark's arrays_zip names fields after the inputs, so
        # zip manually via the 2-arg transform lambda's index.  Unequal
        # lengths pad with NULL (Spark element_at OOB), a documented
        # softening of CH's error.
        "arrayzip": lambda args: (
            "transform({0}, (__x, __i) -> named_struct('_1', __x{rest}))".format(
                args[0],
                rest="".join(
                    f", '_{k}', element_at({a}, __i + 1)"
                    for k, a in enumerate(args[1:], 2)
                ),
            )
        ),
        # adjacent deltas, first element 0 — zip with the 1-shifted array.
        # Empty-array guard: slice(x, 1, size-1) would get length -1 and
        # throw; CH returns [] there, so short-circuit size() = 0.
        "arraydifference": (
            "(case when size({0}) = 0 then slice({0}, 1, 0) "
            "else zip_with({0}, concat(array(element_at({0}, 1)), "
            "slice({0}, 1, size({0}) - 1)), (a, b) -> a - b) end)"
        ),
        "arraycumsum": (
            "aggregate({0}, cast(array() as array<double>), "
            "(acc, x) -> concat(acc, array(coalesce(element_at(acc, -1), "
            "cast(0 as double)) + x)))"
        ),
    }
)

# Conditionals, arithmetic, bit ops (upstream ClickHouse function spellings
# of plain operators — common in machine-generated CH SQL).
CH_SQL_TEMPLATES.update(
    {
        "multiif": _multiif_sql,
        "ifnull": "nvl({0}, {1})",
        "assumenotnull": "({0})",
        "isnull": "({0} is null)",
        "isnotnull": "({0} is not null)",
        "plus": "({0} + {1})",
        "minus": "({0} - {1})",
        "multiply": "({0} * {1})",
        "divide": "({0} / {1})",
        "intdiv": "({0} div {1})",
        "intdivorzero": "(case when {1} = 0 then 0 else {0} div {1} end)",
        "modulo": "({0} % {1})",
        "moduloorzero": "(case when {1} = 0 then 0 else {0} % {1} end)",
        "negate": "(- {0})",
        "bitand": "({0} & {1})",
        "bitor": "({0} | {1})",
        "bitxor": "({0} ^ {1})",
        "bitnot": "(~ {0})",
        "bitshiftleft": "shiftleft({0}, {1})",
        "bitshiftright": "shiftright({0}, {1})",
        "bitcount": "bit_count({0})",
    }
)

# Finer-grained datetime helpers + string split family.
CH_SQL_TEMPLATES.update(
    {
        "tostartofweek": "date_sub(to_date({0}), (dayofweek({0}) - 1))",
        "tostartofminute": "date_trunc('minute', {0})",
        "tostartoffiveminutes":
            "timestamp_seconds(floor(unix_timestamp({0}) / 300) * 300)",
        "tostartoftenminutes":
            "timestamp_seconds(floor(unix_timestamp({0}) / 600) * 600)",
        "tostartoffifteenminutes":
            "timestamp_seconds(floor(unix_timestamp({0}) / 900) * 900)",
        "addhours": "timestampadd(HOUR, {1}, {0})",
        "addminutes": "timestampadd(MINUTE, {1}, {0})",
        "addseconds": "timestampadd(SECOND, {1}, {0})",
        "addweeks": "date_add({0}, 7 * ({1}))",
        "addyears": "add_months({0}, 12 * ({1}))",
        "subtractmonths": "add_months({0}, - ({1}))",
        "subtractyears": "add_months({0}, -12 * ({1}))",
        "tounixtimestamp": "unix_timestamp({0})",
        "fromunixtimestamp": "timestamp_seconds({0})",
        "formatdatetime": _formatdatetime_sql,
        "splitbychar": _splitbychar_sql,
        "splitbystring": _splitbychar_sql,
        "lengthutf8": "char_length({0})",
        "lowerutf8": "lower({0})",
        "upperutf8": "upper({0})",
        "reverseutf8": "reverse({0})",
        "substringutf8": "substring({0}, {1}, {2})",
        "trimleft": "ltrim({0})",
        "trimright": "rtrim({0})",
        "trimboth": "trim({0})",
        "leftpad": "lpad({0}, {1}, {2})",
        "rightpad": "rpad({0}, {1}, {2})",
        # CH median/medianExact (the quantile(level)(expr) parameterized
        # syntax is out of scope for the rewriter; the alias forms cover the
        # common spelling).  percentile() is Spark's exact interpolated
        # quantile — matching CH medianExact semantics.
        "median": "percentile({0}, 0.5)",
        "medianexact": "percentile({0}, 0.5)",
        "mediantdigest": "approx_percentile({0}, 0.5, 10000)",
        "mediantiming": "approx_percentile({0}, 0.5, 10000)",
        "concatwithseparator": lambda args: f"concat_ws({', '.join(args)})",
    }
)


def _regex_group_idx(re_lit: str) -> int:
    """ClickHouse extract/extractAll return capture group 1 when the pattern
    has one, else the whole match.  For a string-literal pattern, detect an
    unescaped capturing '(' (not '(?:' / '(?=' / '(?!' / '(?<'); non-literal
    patterns default to group 1 (the common CH usage)."""
    s = re_lit.strip()
    if not (s.startswith("'") and s.endswith("'")):
        return 1
    body, i = s[1:-1], 0
    while i < len(body):
        c = body[i]
        if c == "\\":
            i += 2
            continue
        if c == "(" and not body.startswith("(?", i):
            return 1
        i += 1
    return 0


def _extract_sql(args: list[str]) -> str:
    # standard-SQL EXTRACT(field FROM ts) shares the name: one argument
    # containing a FROM keyword passes through untouched
    if len(args) != 2:
        return f"extract({', '.join(args)})"
    return f"regexp_extract({args[0]}, {args[1]}, {_regex_group_idx(args[1])})"


def _extractall_sql(args: list[str]) -> str:
    return f"regexp_extract_all({args[0]}, {args[1]}, {_regex_group_idx(args[1])})"


def _replaceone_sql(args: list[str]) -> str:
    # first literal occurrence only; Spark's replace/regexp_replace are
    # replace-all, so splice around locate()
    h, p, r = args
    return (
        f"(case when locate({p}, {h}) = 0 then {h} "
        f"else concat(substring({h}, 1, locate({p}, {h}) - 1), {r}, "
        f"substring({h}, locate({p}, {h}) + char_length({p}))) end)"
    )


# String replace/extract family + whitespace split (upstream-CH spellings;
# the fork only carries DataFusion's regexp_match/regexp_replace,
# SURVEY §2.6a — dialect superset, all codegen'd built-ins).
CH_SQL_TEMPLATES.update(
    {
        "replaceall": "replace({0}, {1}, {2})",
        "replaceone": _replaceone_sql,
        "replaceregexpall": "regexp_replace({0}, {1}, {2})",
        "extract": _extract_sql,
        "extractall": _extractall_sql,
        "countmatches": "size(regexp_extract_all({0}, {1}, 0))",
        "splitbywhitespace": "filter(split({0}, '\\\\s+'), x -> x != '')",
        "substringindex": "substring_index({0}, {1}, {2})",
    }
)

# Statistical aggregates (upstream-CH camelCase; the fork's aggregates.rs
# stops at count/sum/min/max/avg).  Spark's skewness/kurtosis are the
# POPULATION central-moment forms; CH kurtPop is Pearson (non-excess)
# kurtosis, hence the +3 shift.
CH_SQL_TEMPLATES.update(
    {
        "stddevpop": "stddev_pop({0})",
        "stddevsamp": "stddev_samp({0})",
        "varpop": "var_pop({0})",
        "varsamp": "var_samp({0})",
        "covarpop": "covar_pop({0}, {1})",
        "covarsamp": "covar_samp({0}, {1})",
        "skewpop": "skewness({0})",
        "kurtpop": "(kurtosis({0}) + 3)",
        # tier 25: the sample-moment variants rescale the population
        # forms by (n-1)/n powers — CH divides the central moments by n
        # but the SAMPLE variance by n-1, so
        # skewSamp = m3/varSamp^1.5 = skewPop * ((n-1)/n)^1.5 and
        # kurtSamp = m4/varSamp^2 = kurtPop * ((n-1)/n)^2
        "skewsamp": (
            "(skewness({0}) * pow((count({0}) - 1) "
            "/ cast(count({0}) as double), 1.5))"
        ),
        "kurtsamp": (
            "((kurtosis({0}) + 3) * pow((count({0}) - 1) "
            "/ cast(count({0}) as double), 2))"
        ),
        # CH uniqTheta is a theta sketch; Spark's bounded-memory
        # analogue is the HLL++ estimate (same approximate contract)
        "uniqthetasketch": "approx_count_distinct({0})",
        # maxIntersections(start, end): peak number of concurrently
        # open [start, end) intervals — sweep the sorted endpoint
        # events (+1 at start, -1 at end; ties close-before-open via
        # the struct sort order since -1 < 1) with a running maximum
        "maxintersections": (
            "element_at(transform(array(array_sort(flatten("
            "collect_list(array(named_struct('t', cast({0} as double), "
            "'d', 1), named_struct('t', cast({1} as double), "
            "'d', -1)))))), __arr -> aggregate(__arr, "
            "named_struct('cur', 0, 'mx', 0), (__acc, __q) -> "
            "named_struct('cur', __acc.cur + __q.d, "
            "'mx', greatest(__acc.mx, __acc.cur + __q.d)), "
            "__acc -> __acc.mx)), 1)"
        ),
    }
)

# Array set/structure ops beyond the HOF tiers.
CH_SQL_TEMPLATES.update(
    {
        "arrayintersect": "array_intersect({0}, {1})",
        "hasall": "forall({1}, __v -> array_contains({0}, __v))",
        "hasany": "arrays_overlap({0}, {1})",
        # dedupe CONSECUTIVE duplicates (keeps first of each run)
        "arraycompact": (
            "filter({0}, (__v, __i) -> __i = 0 "
            "or not (__v <=> element_at({0}, __i)))"
        ),
        "arraypopback": "slice({0}, 1, greatest(size({0}) - 1, 0))",
        "arraypopfront": "(case when size({0}) <= 1 then slice({0}, 1, 0) "
                         "else slice({0}, 2, size({0}) - 1) end)",
        # 3-arg form: arrayResize(arr, n, fill)
        "arrayresize": (
            "(case when size({0}) >= {1} then slice({0}, 1, {1}) "
            "else concat({0}, array_repeat({2}, {1} - size({0}))) end)"
        ),
    }
)


_INTERVAL_SECS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _tostartofinterval_sql(args: list[str]) -> str:
    """toStartOfInterval(ts, INTERVAL n unit) -> epoch-floor bucketing for
    second/minute/hour/day units; month/quarter/year route to date_trunc
    only for n=1 (CH's multi-month grids are origin-dependent)."""
    m = _re.match(r"(?is)^interval\s+(\d+)\s+(\w+)s?$", args[1].strip())
    if not m:
        raise ValueError(f"toStartOfInterval: cannot parse {args[1]!r}")
    n, unit = int(m.group(1)), m.group(2).lower().rstrip("s")
    if unit in _INTERVAL_SECS:
        step = n * _INTERVAL_SECS[unit]
        return f"timestamp_seconds(floor(unix_timestamp({args[0]}) / {step}) * {step})"
    if unit in ("month", "quarter", "year") and n == 1:
        return f"date_trunc('{unit}', {args[0]})"
    raise ValueError(f"toStartOfInterval: unsupported INTERVAL {n} {unit}")


CH_SQL_TEMPLATES.update(
    {
        "monthname": "date_format({0}, 'MMMM')",
        "dayname": "date_format({0}, 'EEEE')",
        # CH toWeek default mode 0 differs (Sunday-start, Jan-1-partial);
        # toISOWeek is the unambiguous one and Spark's weekofyear IS ISO
        "toisoweek": "weekofyear({0})",
        "toisoyear": "year(date_sub({0}, (((dayofweek({0}) + 5) % 7)) - 3))",
        "tostartofinterval": _tostartofinterval_sql,
        # timeSlot = toStartOfInterval(ts, 30 min) (CH docs)
        "timeslot": "timestamp_seconds(floor(unix_timestamp({0}) / 1800) * 1800)",
        "tolastdayofmonth": "last_day({0})",
        "todaysinmonth": "day(last_day({0}))",
    }
)


# URL function family (upstream ClickHouse URL functions — the single most
# common CH web-analytics surface; the fork registers none of these).  All
# map to Spark's JVM-side parse_url / string builtins.  CH returns '' (not
# NULL) for absent URL parts — coalesce matches that contract.
def _ipv4stringtonum_sql(args: list[str]) -> str:
    a = args[0]
    return (
        f"(cast(element_at(split({a}, '\\\\.'), 1) as bigint) * 16777216"
        f" + cast(element_at(split({a}, '\\\\.'), 2) as bigint) * 65536"
        f" + cast(element_at(split({a}, '\\\\.'), 3) as bigint) * 256"
        f" + cast(element_at(split({a}, '\\\\.'), 4) as bigint))"
    )


def _transform_sql(args: list[str]) -> str:
    """ClickHouse transform(x, from_array, to_array[, default]) -> a
    broadcast-free map lookup (element_at over map_from_arrays, JVM-side).
    Spark's own 2-arg transform(arr, lambda) HOF passes through unchanged
    (CH spells that arrayMap)."""
    if len(args) == 4:
        return (
            f"coalesce(element_at(map_from_arrays({args[1]}, {args[2]}),"
            f" {args[0]}), {args[3]})"
        )
    if len(args) == 3:
        # 3-arg CH form: unmatched keys keep x itself (same-type contract)
        return (
            f"coalesce(element_at(map_from_arrays({args[1]}, {args[2]}),"
            f" {args[0]}), {args[0]})"
        )
    return f"transform({', '.join(args)})"


CH_SQL_TEMPLATES.update(
    {
        "protocol": "coalesce(parse_url({0}, 'PROTOCOL'), '')",
        "domain": "coalesce(parse_url({0}, 'HOST'), '')",
        "domainwithoutwww": (
            "coalesce(regexp_replace(parse_url({0}, 'HOST'), '^www\\\\.', ''), '')"
        ),
        "topleveldomain": (
            "coalesce(substring_index(parse_url({0}, 'HOST'), '.', -1), '')"
        ),
        "path": "coalesce(parse_url({0}, 'PATH'), '')",
        "pathfull": (
            "concat(coalesce(parse_url({0}, 'PATH'), ''), "
            "coalesce(concat('?', parse_url({0}, 'QUERY')), ''))"
        ),
        "querystring": "coalesce(parse_url({0}, 'QUERY'), '')",
        "fragment": "coalesce(parse_url({0}, 'REF'), '')",
        "extracturlparameter": "coalesce(parse_url({0}, 'QUERY', {1}), '')",
        "cutquerystring": "substring_index({0}, '?', 1)",
        "cutfragment": "substring_index({0}, '#', 1)",
        # IPv4 numeric <-> dotted-quad (pure arithmetic, codegen'd)
        "ipv4numtostring": (
            "concat(cast(({0} div 16777216) % 256 as string), '.', "
            "cast(({0} div 65536) % 256 as string), '.', "
            "cast(({0} div 256) % 256 as string), '.', "
            "cast({0} % 256 as string))"
        ),
        "ipv4stringtonum": _ipv4stringtonum_sql,
        "isipv4string": (
            "({0} rlike '^((25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])\\\\.)"
            "{{3}}(25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])$')"
        ),
        "transform": _transform_sql,
    }
)

# topK(k)(x): CH's heavy-hitter aggregate (SpaceSaving sketch).  The rewrite
# is the deterministic exact form — frequency-desc, value-asc tie-break.
# This template is the single-pass FALLBACK for complex statement shapes;
# simple aggregate queries are lowered by engine._rewrite_dist_aggs to the
# two-level pair form (__topkpairs), whose big shuffle is map-side combined
# and whose buffer holds distinct values only — the 100 TB shape.
CH_PARAMETRIC_TEMPLATES["topk"] = lambda p, a: (
    f"transform(slice(array_sort(transform(array_distinct(collect_list({a[0]})), "
    f"v -> struct(-size(filter(collect_list({a[0]}), y -> y <=> v)) as negn, "
    f"v as v))), 1, {p[0]}), s -> s.v)"
)


# -State / -Merge combinators (upstream-CH partial-aggregate idiom: MVs
# store <agg>State, readers finish with <agg>Merge).  This engine's MV
# propagation stores plain partials, so the faithful Spark mapping is:
# State -> the partial's plain representation (sum/count/min/max pass
# through; uniq keeps the distinct SET, avg keeps a (sum, count) struct —
# the actual sufficient statistics), Merge -> the re-aggregation of those
# representations.  Two-level Merge(State) composes to the exact global
# aggregate (hash-verified in ch_state_merge).
CH_SQL_TEMPLATES.update(
    {
        "countstate": lambda args: f"count({args[0]})" if args and args[0].strip() else "count(*)",
        "countmerge": "cast(sum({0}) as bigint)",
        "sumstate": "sum({0})",
        "summerge": "sum({0})",
        "minstate": "min({0})",
        "minmerge": "min({0})",
        "maxstate": "max({0})",
        "maxmerge": "max({0})",
        "anystate": "any_value({0})",
        "anymerge": "any_value({0})",
        "uniqstate": "collect_set({0})",
        "uniqexactstate": "collect_set({0})",
        "uniqmerge": "size(array_distinct(flatten(collect_list({0}))))",
        "uniqexactmerge": "size(array_distinct(flatten(collect_list({0}))))",
        "grouparraystate": "collect_list({0})",
        "grouparraymerge": "flatten(collect_list({0}))",
        "avgstate": "named_struct('s', sum(cast({0} as double)), 'c', count({0}))",
        "avgmerge": "(sum({0}.s) / sum({0}.c))",
        # -SimpleState: CH's "state == plain value" marker for monoidal aggs
        "sumsimplestate": "sum({0})",
        "minsimplestate": "min({0})",
        "maxsimplestate": "max({0})",
        "anysimplestate": "any_value({0})",
    }
)


# Sketch-family aliases: CH's alternative approximate backends all map to
# Spark's HLL++ / t-digest equivalents (explicitly-approximate contract).
CH_SQL_TEMPLATES.update(
    {
        "uniqtheta": "approx_count_distinct({0})",
    }
)
CH_PARAMETRIC_TEMPLATES.update(
    {
        "quantiledeterministic": lambda p, a: f"percentile({a[0]}, {p[0]})",
        "quantilebfloat16": lambda p, a: f"approx_percentile({a[0]}, {p[0]}, 10000)",
    }
)


# Map/Tuple function family (upstream-CH; pairs with the Map(K,V)/Tuple
# compound types in types.py).  All JVM built-ins.
CH_SQL_TEMPLATES.update(
    {
        "mapkeys": "map_keys({0})",
        "mapvalues": "map_values({0})",
        "mapcontains": "array_contains(map_keys({0}), {1})",
        "mapfromarrays": "map_from_arrays({0}, {1})",
        "maplength": "size({0})",
        # CH window functions lagInFrame/leadInFrame -> Spark lag/lead.
        # Documented difference: the CH variants respect a custom frame;
        # Spark's lag/lead are frame-agnostic — identical under the default
        # frame, which is the overwhelmingly common spelling (CH's own docs
        # route frame-aware cases to any()/anyLast() OVER a frame, which
        # this dialect already supports via first/last).
        "laginframe": lambda args: f"lag({', '.join(args)})",
        "leadinframe": lambda args: f"lead({', '.join(args)})",
        # simpleLinearRegression(x, y) -> Tuple(k, b) of the least-squares
        # fit y = kx + b; positional _1/_2 naming so tupleElement works.
        # Stateless moment sums (covar_pop/var_pop/avg) — partial->final
        # aggregation, no ordering dependence.
        "simplelinearregression": lambda args: (
            "named_struct("
            f"'_1', covar_pop({args[0]}, {args[1]}) / var_pop({args[0]}), "
            f"'_2', avg({args[1]}) - "
            f"(covar_pop({args[0]}, {args[1]}) / var_pop({args[0]})) * avg({args[0]})"
            ")"
        ),
        # CH tuple(...) builds an unnamed tuple with positional elements;
        # emit explicit _1.._n field names (matching the Tuple(...) DDL
        # type's positional naming) so 1-based tupleElement resolves —
        # Spark's bare struct() would name fields after source columns
        "tuple": lambda args: "named_struct({})".format(
            ", ".join(f"'_{i}', {a}" for i, a in enumerate(args, 1))
        ),
        "tupleelement": lambda args: (
            f"({args[0]})._{args[1].strip()}"
            if args[1].strip().isdigit()
            else f"({args[0]}).{args[1].strip().strip(chr(39))}"
        ),
    }
)


def _age_sql(args: list[str]) -> str:
    """age('unit', d1, d2) — COMPLETE units between two dates/timestamps
    (CH semantics: truncating, unlike dateDiff's boundary counting)."""
    unit = args[0].strip().strip("'\"").lower()
    a, b = args[1], args[2]
    if unit == "day":
        return f"datediff(cast({b} as date), cast({a} as date))"
    if unit == "month":
        return f"cast(floor(months_between(cast({b} as date), cast({a} as date))) as bigint)"
    if unit == "year":
        return (
            f"cast(floor(months_between(cast({b} as date), "
            f"cast({a} as date)) / 12) as bigint)"
        )
    if unit == "week":
        return (
            f"cast(floor(datediff(cast({b} as date), cast({a} as date)) / 7)"
            " as bigint)"
        )
    if unit == "quarter":
        return (
            f"cast(floor(months_between(cast({b} as date), "
            f"cast({a} as date)) / 3) as bigint)"
        )
    if unit in ("hour", "minute", "second"):
        div = {"hour": 3600, "minute": 60, "second": 1}[unit]
        return (
            f"cast(floor((unix_timestamp(cast({b} as timestamp)) - "
            f"unix_timestamp(cast({a} as timestamp))) / {div}) as bigint)"
        )
    raise ValueError(f"age: unsupported unit {unit!r}")


def _datename_sql(args: list[str]) -> str:
    """dateName('part', d): the English name/number string of a date part."""
    part = args[0].strip().strip("'\"").lower()
    d = args[1]
    fmt = {
        "year": "yyyy", "month": "MMMM", "weekday": "EEEE",
        "dayofmonth": "d", "day": "d", "hour": "H", "minute": "m",
        "second": "s",
    }.get(part)
    if fmt is None:
        if part == "quarter":
            return f"cast(quarter({d}) as string)"
        raise ValueError(f"dateName: unsupported part {part!r}")
    return f"date_format(cast({d} as timestamp), '{fmt}')"


def _format_readable_size_sql(args: list[str]) -> str:
    """formatReadableSize(bytes) — '117.74 MiB'-style rendering (CH's
    1024-based units, two decimals)."""
    x = f"cast({args[0]} as double)"
    tiers = [("B", 1), ("KiB", 1024.0), ("MiB", 1024.0**2),
             ("GiB", 1024.0**3), ("TiB", 1024.0**4)]
    sql = f"format_string('%.2f PiB', {x} / {1024.0**5})"
    for unit, div in reversed(tiers):
        cond = f"abs({x}) < {div * 1024.0}"
        sql = (
            f"case when {cond} then format_string('%.2f {unit}', {x} / {div}) "
            f"else {sql} end"
        )
    return f"({sql})"


def _ch_transform_sql(args: list[str]) -> str:
    """CH transform(x, from_array, to_array[, default]) — the value mapper.
    CLASHES with Spark's 2-arg transform(array, lambda) HOF: only the 3/4
    arg forms take this rewrite; 2-arg passes through to the Spark HOF."""
    if len(args) == 2:
        return f"transform({args[0]}, {args[1]})"
    if len(args) == 3:
        return (
            f"coalesce(element_at(map_from_arrays({args[1]}, {args[2]}), "
            f"{args[0]}), {args[0]})"
        )
    if len(args) == 4:
        return (
            f"coalesce(element_at(map_from_arrays({args[1]}, {args[2]}), "
            f"{args[0]}), {args[3]})"
        )
    raise ValueError("transform takes 2 (Spark HOF) or 3-4 (CH mapper) args")


def _case_with_expression_sql(args: list[str]) -> str:
    """caseWithExpression(x, a, ra, b, rb, ..., default) -> CASE x WHEN."""
    if len(args) < 4 or len(args) % 2 != 0:
        raise ValueError(
            "caseWithExpression needs (x, match, result, ..., default)"
        )
    x, default = args[0], args[-1]
    whens = "".join(
        f" when {args[i]} then {args[i + 1]}"
        for i in range(1, len(args) - 1, 2)
    )
    return f"(case {x}{whens} else {default} end)"


CH_SQL_TEMPLATES.update(
    {
        "age": _age_sql,
        "datename": _datename_sql,
        "formatreadablesize": _format_readable_size_sql,
        "max2": "greatest({0}, {1})",
        "min2": "least({0}, {1})",
        "multisearchany": "exists({1}, __n -> contains({0}, __n))",
        "multisearchanycaseinsensitive": (
            "exists({1}, __n -> contains(lower({0}), lower(__n)))"
        ),
        "transform": _ch_transform_sql,
        "casewithexpression": _case_with_expression_sql,
        "isnan": "isnan({0})",
        "isfinite": "(not isnan({0}) and abs({0}) <> double('infinity'))",
        "isinfinite": "(abs({0}) = double('infinity'))",
        "tofixedstring": "rpad({0}, {1}, char(0))",
        # untuple(t): expand a tuple/struct into its fields (select-list
        # position; works for column references, CH's common use)
        "untuple": "{0}.*",
        # bar(x, min, max[, width=80]): unicode bar with eighth-block
        # fractional tail — CH's exact glyph set; pure string expression
        "bar": lambda args: _bar_sql(args),
        # entropy(x): Shannon entropy (bits) of the value distribution.
        # Per-group buffer via the same single-collect lambda binding as
        # histogram(M) — the quantileExact buffering contract.
        "entropy": lambda args: (
            "element_at(transform(array(collect_list(cast({x} as string))), "
            "a -> aggregate(array_distinct(a), cast(0.0 as double), "
            "(acc, v) -> acc - (cast(size(filter(a, e -> e <=> v)) as double)"
            " / size(a)) * log2(cast(size(filter(a, e -> e <=> v)) as double)"
            " / size(a)))), 1)"
        ).format(x=args[0]),
        # extractKeyValuePairs('a:1, b:2') -> map; CH's default pair
        # delimiters (',', ';', space) and ':' key-value delimiter
        "extractkeyvaluepairs": "str_to_map(trim({0}), '[,;\\\\s]+', '\\\\s*:\\\\s*')",
        # uniqTheta: CH's theta-sketch distinct estimator -> Spark's HLL
        # estimator (both bounded-memory approximate distincts)
        "uniqtheta": "approx_count_distinct({0})",
        "formatreadablequantity": (
            "(case"
            " when abs({0}) >= 1e9 then concat(cast(round({0} / 1e9, 2) as string), ' billion')"
            " when abs({0}) >= 1e6 then concat(cast(round({0} / 1e6, 2) as string), ' million')"
            " when abs({0}) >= 1e3 then concat(cast(round({0} / 1e3, 2) as string), ' thousand')"
            " else cast(round(cast({0} as double), 2) as string) end)"
        ),
    }
)


def _bar_sql(args: list[str]) -> str:
    if len(args) < 3:
        raise ValueError("bar(x, min, max[, width])")
    x, lo, hi = args[0], args[1], args[2]
    w = args[3] if len(args) > 3 else "80"
    frac = (
        f"greatest(least((cast({x} as double) - ({lo})) / "
        f"nullif(cast(({hi}) - ({lo}) as double), 0.0), 1.0), 0.0)"
    )
    units = f"cast(floor({frac} * ({w}) * 8) as int)"
    return (
        f"concat(repeat('█', cast(({units}) / 8 as int)), "
        f"case when ({units}) % 8 > 0 "
        f"then substring('▏▎▍▌▋▊▉', ({units}) % 8, 1) else '' end)"
    )

# topK(k)(x): CH's is an approximate space-saving sketch; this is the
# EXACT superset — most-frequent k elements, ties by value, as an array
# (stringify for driver hashing).  Single-pass FALLBACK form: simple
# aggregate statements are lowered to the pair form (__topkpairs above) by
# engine._rewrite_dist_aggs, which pre-combines counts map-side and buffers
# distinct values only; this O(n·distinct)-in-HOFs form remains for shapes
# the lowering can't prove safe.
CH_PARAMETRIC_TEMPLATES.update(
    {
        "topk": lambda p, a: (
            f"transform(slice(array_sort(transform(array_distinct("
            f"collect_list({a[0]})), __v -> named_struct('c', "
            f"-size(filter(collect_list({a[0]}), __y -> __y = __v)), "
            f"'v', __v))), 1, {p[0]}), __s -> __s.v)"
        ),
        "sparkbar": lambda p, a: _sparkbar_sql(p, a),
    }
)


def _sparkbar_sql(p: list[str], a: list[str]) -> str:
    """CH sparkbar(width[, min_x, max_x])(x, y): bucket the x range into
    `width` bins, sum y per bin, render each bin as one eighth-block
    glyph scaled to the tallest bin (' ' for empty bins).  A JVM
    aggregate over the collected (x, y) pairs — the pair list is bounded
    by the group size, same contract as the other collect-based CH
    aggregates (tier 28)."""
    if len(p) == 2:
        # upstream CH rejects the 2-parameter arity (width, min_x with no
        # max_x) — silently falling back to the data min/max would return
        # a wrong bar instead of an error (r13 ADVICE)
        raise ValueError(
            "sparkbar takes 1 (width) or 3 (width, min_x, max_x) "
            "parameters; got 2"
        )
    w = int(p[0].strip())
    if not (1 <= w <= 1024):
        raise ValueError("sparkbar width must be in [1, 1024]")
    x = a[0]
    y = a[1] if len(a) > 1 else "1"
    lo = (f"cast({p[1]} as double)" if len(p) > 2
          else f"min(cast({x} as double))")
    hi = (f"cast({p[2]} as double)" if len(p) > 2
          else f"max(cast({x} as double))")
    pairs = (f"collect_list(named_struct('x', cast({x} as double), "
             f"'y', cast({y} as double)))")
    bidx = (f"least(cast(floor((__p.x - __g.lo) / "
            f"nullif(__g.hi - __g.lo, 0.0) * {w}) as int), {w - 1})")
    sums = (f"transform(sequence(0, {w - 1}), __b -> "
            f"aggregate(filter(__g.ps, __p -> coalesce({bidx}, 0) = __b "
            f"and __p.x >= __g.lo and __p.x <= __g.hi), "
            f"cast(0 as double), (__acc, __p) -> __acc + __p.y))")
    # ceil so a bin at exactly 1/8 of the max renders the one-eighth
    # glyph and only the tallest bin reaches the full block
    glyph = (f"if(__v <= 0, ' ', substring('▁▂▃▄▅▆▇█', "
             f"greatest(least(cast(ceil(__v / array_max(__ss) * 8) "
             f"as int), 8), 1), 1))")
    return (
        f"element_at(transform(array(named_struct('ps', {pairs}, "
        f"'lo', {lo}, 'hi', {hi})), __g -> "
        f"element_at(transform(array({sums}), __ss -> "
        f"concat_ws('', transform(__ss, __v -> {glyph}))), 1)), 1)"
    )


def _gcd_sql(args: list[str]) -> str:
    """gcd(a, b) — Euclid unrolled through ``aggregate`` over a constant
    92-step ladder (the 64-bit worst case is ~91 iterations, consecutive
    Fibonacci numbers); each step is a codegen'd struct swap, no UDF."""
    a, b = args[0], args[1]
    return (
        f"aggregate(sequence(1, 92), named_struct("
        f"'a', abs(cast({a} as bigint)), 'b', abs(cast({b} as bigint))), "
        f"(__g, __i) -> if(__g.b = 0, __g, "
        f"named_struct('a', __g.b, 'b', __g.a % __g.b)), __g -> __g.a)"
    )


def _lcm_sql(args: list[str]) -> str:
    a, b = args[0], args[1]
    g = _gcd_sql(args)
    return (
        f"(case when {g} = 0 then cast(0 as bigint) else "
        f"abs(cast({a} as bigint) div ({g}) * cast({b} as bigint)) end)"
    )


# everyday tier 7 (upstream-CH surface the round-7 gap probe found missing)
CH_SQL_TEMPLATES.update(
    {
        "gcd": _gcd_sql,
        "lcm": _lcm_sql,
        # ifNotFinite(x, y): y when x is NaN/±Inf
        "ifnotfinite": (
            "(case when isnan(cast({0} as double)) or "
            "abs(cast({0} as double)) = double('Infinity') "
            "then {1} else {0} end)"
        ),
        # Modified Julian Day epoch is 1858-11-17
        "tomodifiedjulianday": "datediff(cast({0} as date), date'1858-11-17')",
        "frommodifiedjulianday": "date_add(date'1858-11-17', cast({0} as int))",
        "jsonextractkeys": "json_object_keys({0})",
        # arrayShuffle(arr[, seed]): with a seed, a DETERMINISTIC
        # hash-order permutation (engine-reproducible — CH's seeded form is
        # likewise deterministic, rng-based); unseeded falls through to
        # Spark's shuffle().
        "arrayshuffle": lambda args: (
            f"shuffle({args[0]})"
            if len(args) == 1
            else (
                f"transform(array_sort(transform({args[0]}, "
                f"__x -> named_struct('k', xxhash64(__x, {args[1]}), "
                f"'v', __x))), __s -> __s.v)"
            )
        ),
    }
)

def _sum_map_sql(args: list[str]) -> str:
    """sumMap(m): per-key value sums across the group, returned as CH's
    (sorted keys, values) tuple — named _1/_2 so tupleElement works.  The
    buffer is the group's map ENTRIES (collect_list of map_entries), the
    per-group analytics contract of quantileExact/topK; corpus-scale
    keyed sums use a plain explode + GROUP BY."""
    m = args[0]
    return (
        f"element_at(transform(array(flatten(collect_list(map_entries({m})))), "
        f"__ps -> named_struct("
        f"'_1', array_sort(array_distinct(transform(__ps, __p -> __p.key))), "
        f"'_2', transform(array_sort(array_distinct(transform(__ps, __p -> __p.key))), "
        f"__k -> aggregate(filter(__ps, __p -> __p.key <=> __k), "
        f"cast(0.0 as double), (__a, __p) -> __a + __p.value)))), 1)"
    )


def _minmax_map_sql(fn: str):
    def _f(args: list[str]) -> str:
        m = args[0]
        return (
            f"element_at(transform(array(flatten(collect_list(map_entries({m})))), "
            f"__ps -> named_struct("
            f"'_1', array_sort(array_distinct(transform(__ps, __p -> __p.key))), "
            f"'_2', transform(array_sort(array_distinct(transform(__ps, __p -> __p.key))), "
            f"__k -> array_{fn}(transform(filter(__ps, __p -> __p.key <=> __k), "
            f"__p -> __p.value))))), 1)"
        )

    return _f


def _format_sql(args: list[str]) -> str:
    """format('{}-{}', a, b): CH brace placeholders -> format_string.  The
    pattern must be a string literal (CH requires a constant pattern too);
    indexed {0} placeholders map to %1$s-style positions."""
    pat = args[0].strip()
    if not (pat.startswith("'") and pat.endswith("'")):
        raise ValueError("format: the pattern must be a string literal")
    body = pat[1:-1].replace("%", "%%").replace("{}", "%s")
    body = _re.sub(r"\{(\d+)\}", lambda m: f"%{int(m.group(1)) + 1}$s", body)
    rest = ", ".join(f"cast({a} as string)" for a in args[1:])
    return f"format_string('{body}'" + (f", {rest})" if rest else ")")


CH_SQL_TEMPLATES.update(
    {
        "summap": _sum_map_sql,
        "minmap": _minmax_map_sql("min"),
        "maxmap": _minmax_map_sql("max"),
        # sumCount(x) -> (sum, count) tuple
        "sumcount": (
            "named_struct('_1', sum({0}), '_2', count({0}))"
        ),
        "format": _format_sql,
        "initcaputf8": "initcap({0})",
        "corrstable": "corr({0}, {1})",
        "covarpopstable": "covar_pop({0}, {1})",
        "covarsampstable": "covar_samp({0}, {1})",
        "levenshteindistance": "levenshtein({0}, {1})",
        "editdistance": "levenshtein({0}, {1})",
        "editdistanceutf8": "levenshtein({0}, {1})",
        # add*/subtract* calendar family completeness (addDays/addMonths/...
        # exist upstream in this file; these are the missing mirrors)
        "addweeks": "date_add(cast({0} as date), 7 * cast({1} as int))",
        "subtractdays": "date_sub(cast({0} as date), cast({1} as int))",
        "subtractweeks": "date_sub(cast({0} as date), 7 * cast({1} as int))",
        "subtractmonths": "add_months(cast({0} as date), -cast({1} as int))",
        "subtractyears": "add_months(cast({0} as date), -12 * cast({1} as int))",
        "subtracthours": "(cast({0} as timestamp) - make_dt_interval(0, cast({1} as int)))",
        "subtractminutes": "(cast({0} as timestamp) - make_dt_interval(0, 0, cast({1} as int)))",
        "subtractseconds": "(cast({0} as timestamp) - make_dt_interval(0, 0, 0, cast({1} as double)))",
        # toRelative<unit>Num: units since epoch (CH's relative counters)
        "torelativedaynum": "datediff(cast({0} as date), date'1970-01-01')",
        "torelativehournum": (
            "cast(floor(unix_timestamp(cast({0} as timestamp)) / 3600) as bigint)"
        ),
        "torelativeminutenum": (
            "cast(floor(unix_timestamp(cast({0} as timestamp)) / 60) as bigint)"
        ),
        "torelativesecondnum": (
            "unix_timestamp(cast({0} as timestamp))"
        ),
    }
)

# emptyArray<T>() family: typed empty arrays
for _n, _t in (
    ("int8", "tinyint"), ("int16", "smallint"), ("int32", "int"),
    ("int64", "bigint"), ("uint8", "smallint"), ("uint16", "int"),
    ("uint32", "bigint"), ("uint64", "decimal(20,0)"),
    ("float32", "float"), ("float64", "double"), ("string", "string"),
    ("date", "date"), ("datetime", "timestamp"),
):
    CH_SQL_TEMPLATES[f"emptyarray{_n}"] = (
        "cast(array() as array<" + _t + ">)"
    )


def _round_bankers_sql(args: list[str]) -> str:
    """roundBankers(x[, n]) -> Spark bround (half-to-even; Spark's round
    is half-up, so plain round would be wrong on exact .5 ties)."""
    return (
        f"bround({args[0]})" if len(args) == 1
        else f"bround({args[0]}, {args[1]})"
    )


def _to_interval_sql(unit: str):
    """toIntervalYear/Month/Week/Day/Hour/Minute/Second(n) — interval
    constructors usable in date arithmetic; Spark's make_interval."""
    pos = {"year": 0, "month": 1, "week": 2, "day": 3,
           "hour": 4, "minute": 5, "second": 6}[unit]

    def tmpl(args: list[str]) -> str:
        parts = ["0"] * 7
        parts[pos] = f"({args[0]})"
        return f"make_interval({', '.join(parts)})"

    return tmpl


CH_SQL_TEMPLATES.update(
    {
        # camelCase alias of the standard date_trunc (same arg order)
        "datetrunc": "date_trunc({0}, {1})",
        # toTime: keep the time-of-day, pin the date to 1970-01-02 (CH)
        "totime": (
            "cast(concat('1970-01-02 ', date_format({0}, 'HH:mm:ss')) "
            "as timestamp)"
        ),
        "tokens": r"filter(split({0}, '\\s+'), __t -> __t <> '')",
        # character n-grams of a string (CH ngrams(s, n))
        "ngrams": (
            "transform(sequence(1, greatest(length({0}) - ({1}) + 1, 0)), "
            "__i -> substring({0}, __i, {1}))"
        ),
        "roundbankers": _round_bankers_sql,
        "tointervalyear": _to_interval_sql("year"),
        "tointervalmonth": _to_interval_sql("month"),
        "tointervalweek": _to_interval_sql("week"),
        "tointervalday": _to_interval_sql("day"),
        "tointervalhour": _to_interval_sql("hour"),
        "tointervalminute": _to_interval_sql("minute"),
        "tointervalsecond": _to_interval_sql("second"),
        # visitParam* — CH's fast-JSON accessors; same contract as
        # JSONExtract* here (get_json_object path lookup)
        "visitparamextractstring": "get_json_object({0}, concat('$.', {1}))",
        "visitparamextractraw": "get_json_object({0}, concat('$.', {1}))",
        "visitparamextractint": (
            "cast(get_json_object({0}, concat('$.', {1})) as bigint)"
        ),
        "visitparamextractfloat": (
            "cast(get_json_object({0}, concat('$.', {1})) as double)"
        ),
        "visitparamextractbool": (
            "(get_json_object({0}, concat('$.', {1})) = 'true')"
        ),
        "visitparamhas": (
            "(get_json_object({0}, concat('$.', {1})) is not null)"
        ),
    }
)


# ---- tier 16 (r10): phonetic + regex string utilities, shingle windows,
# contiguous-subsequence search, domain heuristics, readable time deltas,
# CH rounding ladders, 2-D morton interleave, IPv4 CIDR membership.  All
# pure Spark SQL compositions (whole-stage codegen, zero UDFs). ------------


def _first_significant_subdomain_sql(args: list[str]) -> str:
    """CH firstSignificantSubdomain heuristic: the label left of the
    effective TLD — when the second-to-last label is a generic registry
    (com/net/org/…) under a ccTLD, step one label further left."""
    # CH accepts bare hostnames too — parse_url needs a scheme, so fall
    # back to prefixing one (r10 review)
    host = (
        f"split(coalesce(parse_url({args[0]}, 'HOST'), "
        f"parse_url(concat('http://', {args[0]}), 'HOST'), ''), '\\\\.')"
    )
    second = f"element_at({host}, -2)"
    return (
        f"case when size({host}) < 2 then '' "
        f"when size({host}) >= 3 and {second} in ('com', 'net', 'org', "
        f"'co', 'gov', 'edu', 'mil', 'biz', 'info') "
        f"then element_at({host}, -3) else {second} end"
    )


def _format_readable_time_delta_sql(args: list[str]) -> str:
    """CH formatReadableTimeDelta, days-and-below subset (upstream's
    default maximum_unit is years with calendar-approximate months; this
    matches CH exactly for maximum_unit='days', i.e. any delta where
    calendar months don't enter)."""
    s = f"cast(floor({args[0]}) as bigint)"
    parts = []
    for name, div, hi in (
        ("day", 86400, None), ("hour", 3600, 86400),
        ("minute", 60, 3600), ("second", 1, 60),
    ):
        n = (f"cast({s} / {div} as bigint)" if hi is None
             else f"cast(({s} % {hi}) / {div} as bigint)")
        parts.append(
            f"if({n} > 0, concat({n}, ' {name}', if({n} = 1, '', 's')), "
            f"null)"
        )
    arr = (f"filter(array({', '.join(parts)}), "
           f"__fp -> __fp is not null)")
    return (
        f"case when size({arr}) = 0 then '0 seconds' "
        f"when size({arr}) = 1 then element_at({arr}, 1) "
        f"else concat(array_join(slice({arr}, 1, size({arr}) - 1), ', '), "
        f"' and ', element_at({arr}, -1)) end"
    )


def _is_ipv4_in_range_sql(args: list[str]) -> str:
    """CH isIPAddressInRange, IPv4 subset: prefix-compare the numeric
    forms (a /0 mask shifts both sides fully away -> always true)."""
    num = _ipv4stringtonum_sql([args[0]])
    base = _ipv4stringtonum_sql([f"element_at(split({args[1]}, '/'), 1)"])
    bits = f"cast(element_at(split({args[1]}, '/'), 2) as int)"
    return (
        f"(shiftright({num}, 32 - {bits}) = "
        f"shiftright({base}, 32 - {bits}))"
    )


CH_SQL_TEMPLATES.update(
    {
        "soundex": "soundex({0})",
        "translateutf8": "translate({0}, {1}, {2})",
        # regex metacharacter escaping (CH escape set; \x7b spells the
        # opening brace so the str.format template keeps no literal brace)
        "regexpquotemeta": (
            "regexp_replace({0}, '([\\\\\\\\|()^$.\\\\[\\\\]?*+\\\\x7b:-])', "
            "'\\\\\\\\$1')"
        ),
        "toyyyymmddhhmmss": (
            "cast(date_format(cast({0} as timestamp), 'yyyyMMddHHmmss') "
            "as bigint)"
        ),
        "arrayshingles": (
            "case when {1} < 1 or size({0}) < {1} then array() else "
            "transform(sequence(1, size({0}) - {1} + 1), "
            "__si -> slice({0}, __si, {1})) end"
        ),
        "hassubstr": (
            "case when size({1}) = 0 then true "
            "when size({0}) < size({1}) then false "
            "else exists(sequence(1, size({0}) - size({1}) + 1), "
            "__hi -> slice({0}, __hi, size({1})) = {1}) end"
        ),
        "firstsignificantsubdomain": _first_significant_subdomain_sql,
        "formatreadabletimedelta": _format_readable_time_delta_sql,
        # CH roundDuration / roundAge bucket ladders (web-analytics)
        "roundduration": (
            "case when {0} < 1 then 0 when {0} < 10 then 1 "
            "when {0} < 30 then 10 when {0} < 60 then 30 "
            "when {0} < 120 then 60 when {0} < 180 then 120 "
            "when {0} < 240 then 180 when {0} < 300 then 240 "
            "when {0} < 600 then 300 when {0} < 1200 then 600 "
            "when {0} < 1800 then 1200 when {0} < 3600 then 1800 "
            "when {0} < 7200 then 3600 when {0} < 18000 then 7200 "
            "when {0} < 36000 then 18000 else 36000 end"
        ),
        "roundage": (
            "case when {0} < 1 then 0 when {0} < 18 then 17 "
            "when {0} < 25 then 18 when {0} < 35 then 25 "
            "when {0} < 45 then 35 when {0} < 55 then 45 else 55 end"
        ),
        "todecimalstring": "cast(cast({0} as decimal(38, {1})) as string)",
        # 2-D morton interleave over 32-bit halves; the sign bit lands in
        # bit 63, so the result is the UInt64 pattern read as Int64
        # two's-complement (the engine's documented UInt64 stance)
        "mortonencode": (
            "aggregate(sequence(0, 31), cast(0 as bigint), (__ma, __mi) -> "
            "__ma | shiftleft(shiftright(cast({0} as bigint), __mi) & 1, "
            "2 * __mi) | shiftleft(shiftright(cast({1} as bigint), __mi) "
            "& 1, 2 * __mi + 1))"
        ),
        "isipaddressinrange": _is_ipv4_in_range_sql,
    }
)


# ---- tier 17 (r10): bit introspection, non-alpha tokenization, year-zero
# day counts, partial sort, server constants.  Pure SQL compositions. ------


def _bit_test_sql(op: str):
    """bitTestAll/Any(v, b1, b2, …): variadic bit positions -> one mask
    compare (All: every bit set; Any: at least one)."""

    def tmpl(args: list[str]) -> str:
        mask = " | ".join(
            f"shiftleft(cast(1 as bigint), cast({b} as int))"
            for b in args[1:]
        )
        v = f"(cast({args[0]} as bigint) & ({mask}))"
        return (f"({v} = ({mask}))" if op == "all" else f"({v} != 0)")

    return tmpl


def _split_by_non_alpha_sql(args: list[str]) -> str:
    # unicode letters+digits survive; everything else splits (the regex
    # braces live here, outside the str.format template namespace)
    return (
        f"filter(split({args[0]}, '[^\\\\p{{L}}\\\\p{{N}}]+'), "
        f"__sw -> __sw != '')"
    )


CH_SQL_TEMPLATES.update(
    {
        "cbrt": "cbrt({0})",
        # "1,4,16" — ascending powers of two present in the mask
        "bitmasktolist": (
            "array_join(filter(transform(sequence(0, 62), __bi -> "
            "if((shiftright(cast({0} as bigint), __bi) & 1) = 1, "
            "cast(shiftleft(cast(1 as bigint), __bi) as string), null)), "
            "__bv -> __bv is not null), ',')"
        ),
        "bittestall": _bit_test_sql("all"),
        "bittestany": _bit_test_sql("any"),
        "splitbynonalpha": _split_by_non_alpha_sql,
        # CH's year-zero day count matches MySQL TO_DAYS: year 0 is a
        # 366-day proleptic-Gregorian leap year (CH pins
        # DAYS_BETWEEN_YEARS_0_AND_1970 = 719528), so
        # toDaysSinceYearZero('2023-09-08') = 739136 =
        # datediff-from-0001-01-01 + 366.
        "todayssinceyearzero": (
            "(datediff(cast({0} as date), cast('0001-01-01' as date)) "
            "+ 366)"
        ),
        # CH contract: first `limit` elements sorted, the rest in
        # unspecified order — a full sort is a conforming implementation
        "arraypartialsort": "array_sort({1})",
        "nowinblock": "current_timestamp()",
        "fqdn": "'localhost'",
        "tcpport": "cast(9000 as int)",
    }
)


def _cut_to_first_significant_subdomain_sql(args: list[str]) -> str:
    """CH cutToFirstSignificantSubdomain: the firstSignificantSubdomain
    plus everything to its right ('news.clickhouse.com.tr' ->
    'clickhouse.com.tr'), using the same generic-registry heuristic as
    firstSignificantSubdomain (and the same bare-hostname fallback)."""
    host = (
        f"split(coalesce(parse_url({args[0]}, 'HOST'), "
        f"parse_url(concat('http://', {args[0]}), 'HOST'), ''), '\\\\.')"
    )
    second = f"element_at({host}, -2)"
    return (
        f"case when size({host}) < 2 then '' "
        f"when size({host}) >= 3 and {second} in ('com', 'net', 'org', "
        f"'co', 'gov', 'edu', 'mil', 'biz', 'info') "
        f"then array_join(slice({host}, -3, 3), '.') "
        f"else array_join(slice({host}, -2, 2), '.') end"
    )


def _format_readable_decimal_size_sql(args: list[str]) -> str:
    """CH formatReadableDecimalSize — like formatReadableSize but
    powers of 1000 ('123.46 MB')."""
    x = f"cast({args[0]} as double)"
    tiers = [("B", 1), ("KB", 1000.0), ("MB", 1000.0**2),
             ("GB", 1000.0**3), ("TB", 1000.0**4)]
    sql = f"format_string('%.2f PB', {x} / {1000.0**5})"
    for unit, div in reversed(tiers):
        cond = f"abs({x}) < {div * 1000.0}"
        sql = (
            f"case when {cond} then format_string('%.2f {unit}', {x} / {div}) "
            f"else {sql} end"
        )
    return f"({sql})"


def _time_slots_sql(args: list[str]) -> str:
    """CH timeSlots(start, duration[, size=1800]): every size-second
    grid point from floor(start) through floor(start + duration)."""
    sz = args[2] if len(args) > 2 else "1800"
    ut = f"unix_timestamp({args[0]})"
    return (
        f"transform(sequence("
        f"cast(floor({ut} / ({sz})) * ({sz}) as bigint), "
        f"cast(floor(({ut} + ({args[1]})) / ({sz})) * ({sz}) as bigint), "
        f"cast({sz} as bigint)), __ts -> timestamp_seconds(__ts))"
    )


_MYSQL_FMT_TO_SPARK = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "h": "hh", "l": "h", "i": "mm", "s": "ss",
    "S": "ss", "p": "a", "M": "MMMM", "b": "MMM", "a": "EEE",
    "j": "DDD", "T": "HH:mm:ss", "r": "hh:mm:ss a",
}


def _parse_datetime_sql(args: list[str]) -> str:
    """CH parseDateTime(str, format): MySQL % specifiers translated to
    Spark's pattern letters at rewrite time.  The format must be a
    string LITERAL (CH requires a constant format too); literal letters
    in the format are quoted for Spark's pattern grammar."""
    fmt = args[1].strip()
    if not (fmt.startswith("'") and fmt.endswith("'")):
        raise ValueError("parseDateTime: format must be a string literal")
    src, out, i = fmt[1:-1], [], 0
    while i < len(src):
        ch = src[i]
        if ch == "%":
            i += 1
            if i >= len(src):
                raise ValueError("parseDateTime: dangling % in format")
            spec = src[i]
            if spec == "%":
                out.append("%")
            elif spec in _MYSQL_FMT_TO_SPARK:
                out.append(_MYSQL_FMT_TO_SPARK[spec])
            else:
                raise ValueError(
                    f"parseDateTime: unsupported specifier %{spec}"
                )
        elif ch.isalpha():
            out.append(f"''{ch}''")  # literal letter, quoted for Spark
        else:
            out.append(ch)
        i += 1
    return f"to_timestamp({args[0]}, '{''.join(out)}')"


def _count_capture_groups(pat: str, fn: str) -> int:
    """Rewrite-time capture-group count of a string-literal regex (CH
    requires a constant pattern for the group-capture family too).
    Scans for unescaped opening parens outside character classes."""
    pat = pat.strip()
    if not (pat.startswith("'") and pat.endswith("'")):
        raise ValueError(f"{fn}: pattern must be a string literal")
    body = pat[1:-1]
    n, i, in_class = 0, 0, False
    while i < len(body):
        ch = body[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            # '(?' opens a non-capturing construct EXCEPT named groups:
            # '(?<name>…)' is capturing in Java/CH regex, while the
            # lookbehinds '(?<=' / '(?<!' are not (ADVICE r11)
            if (not body.startswith("(?", i)
                    or (body.startswith("(?<", i)
                        and not body.startswith("(?<=", i)
                        and not body.startswith("(?<!", i))):
                n += 1
        i += 1
    return n


def _extract_groups_sql(args: list[str]) -> str:
    """CH extractGroups(haystack, pattern): array of every capture
    group of the FIRST match (empty strings when unmatched).  The
    pattern must be a string literal (CH requires a constant too) —
    the group count is derived at rewrite time by scanning for
    unescaped, non-(?:...) opening parens."""
    pat = args[1].strip()
    n = _count_capture_groups(pat, "extractGroups")
    if n == 0:
        return "array()"
    parts = ", ".join(
        f"regexp_extract({args[0]}, {pat}, {g})" for g in range(1, n + 1)
    )
    # CH returns the EMPTY array when nothing matches (not [''])
    return f"if({args[0]} rlike {pat}, array({parts}), array())"


def _extract_all_groups_vertical_sql(args: list[str]) -> str:
    """CH extractAllGroupsVertical (alias extractAllGroups): one inner
    array [g1, g2, …] PER MATCH.  Every match substring is re-captured
    with the same literal pattern — its first (and only full) match is
    itself, so per-group regexp_extract over it yields that match's
    captures (tier 22)."""
    pat = args[1].strip()
    n = _count_capture_groups(pat, "extractAllGroups")
    if n == 0:
        raise ValueError("extractAllGroups: pattern has no capture groups")
    inner = ", ".join(
        f"regexp_extract(__m, {pat}, {g})" for g in range(1, n + 1)
    )
    return (
        f"transform(regexp_extract_all({args[0]}, {pat}, 0), "
        f"__m -> array({inner}))"
    )


def _extract_all_groups_horizontal_sql(args: list[str]) -> str:
    """CH extractAllGroupsHorizontal: one inner array PER GROUP, each
    holding that group's capture from every match (tier 22)."""
    pat = args[1].strip()
    n = _count_capture_groups(pat, "extractAllGroupsHorizontal")
    if n == 0:
        raise ValueError(
            "extractAllGroupsHorizontal: pattern has no capture groups"
        )
    per_group = ", ".join(
        f"regexp_extract_all({args[0]}, {pat}, {g})" for g in range(1, n + 1)
    )
    return f"array({per_group})"


def _mac_num_to_string_sql(args: list[str]) -> str:
    """CH MACNumToString: lower-case colon-separated hex pairs of the
    low 48 bits (tier 22).  The mask is what makes it the LOW 48 —
    lpad truncates a >12-char hex string from the RIGHT (r12 review)."""
    h = (
        f"lpad(lower(hex(cast({args[0]} as bigint) "
        "& 281474976710655)), 12, '0')"
    )
    parts = ", ".join(f"substring({h}, {i}, 2)" for i in (1, 3, 5, 7, 9, 11))
    return f"concat_ws(':', {parts})"


def _array_auc_sql(args: list[str]) -> str:
    """CH arrayAUC(scores, labels): ROC AUC by the rank-sum formula —
    for every positive, count negatives scored strictly below (plus
    half-credit for ties), over positives × negatives (tier 23).  CH
    docs example arrayAUC([0.1,0.4,0.35,0.8],[0,0,1,1]) = 0.75.
    O(P·N) inside one row's arrays via nested HOF lambdas (JVM-side)."""
    s, l = args[0], args[1]
    pairs = (
        f"zip_with({s}, {l}, (__s, __l) -> "
        "struct(__s as sc, __l as lb))"
    )
    pos = f"filter({pairs}, __p -> __p.lb > 0)"
    neg = f"filter({pairs}, __p -> __p.lb <= 0)"
    return (
        f"aggregate({pos}, cast(0 as double), (__acc, __pp) -> __acc "
        f"+ size(filter({neg}, __nn -> __nn.sc < __pp.sc)) "
        f"+ 0.5 * size(filter({neg}, __nn -> __nn.sc = __pp.sc))) "
        f"/ (cast(size({pos}) as double) * size({neg}))"
    )


# the standard full-form IPv6 alternation (every '::' compression arity)
# plus the IPv4-mapped tail; no zone ids, like upstream CH
_IPV6_RE = (
    "^("
    "([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    "|([0-9A-Fa-f]{1,4}:){1,7}:"
    "|([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
    "|([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2}"
    "|([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3}"
    "|([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4}"
    "|([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5}"
    "|[0-9A-Fa-f]{1,4}:(:[0-9A-Fa-f]{1,4}){1,6}"
    "|:((:[0-9A-Fa-f]{1,4}){1,7}|:)"
    # the dot must reach the JVM regex as '\.': Spark unescapes the SQL
    # string literal once, so the Python source needs FOUR backslashes
    "|::(ffff(:0{1,4})?:)?((25[0-5]|(2[0-4]|1?[0-9])?[0-9])\\\\.){3}"
    "(25[0-5]|(2[0-4]|1?[0-9])?[0-9])"
    ")$"
)


def _is_ipv6_string_sql(args: list[str]) -> str:
    """CH isIPv6String: 1/0 validity of an IPv6 literal (tier 23)."""
    return (
        f"cast(coalesce({args[0]} rlike '{_IPV6_RE}', false) as int)"
    )


def _json_type_sql(args: list[str]) -> str:
    """CH JSONType(json): the TOP-LEVEL value's CH type name ('Object',
    'Array', 'String', 'Bool', 'Null', 'Int64', 'Double'; '' when not
    recognizable).  Path arguments are not supported — get_json_object
    strips quoting, so a navigated value can't be classified faithfully
    (tier 23)."""
    if len(args) != 1:
        raise ValueError("JSONType: path arguments are not supported")
    t = f"trim({args[0]})"
    return (
        f"case when {args[0]} is null then 'Null' "
        f"when substring({t}, 1, 1) = '{{' then 'Object' "
        f"when substring({t}, 1, 1) = '[' then 'Array' "
        f"when substring({t}, 1, 1) = '\"' then 'String' "
        f"when {t} in ('true', 'false') then 'Bool' "
        f"when {t} = 'null' then 'Null' "
        f"when {t} rlike '^-?[0-9]+$' then 'Int64' "
        f"when {t} rlike "
        "'^-?[0-9]+(\\\\.[0-9]+)?([eE][+-]?[0-9]+)?$' then 'Double' "
        "else '' end"
    )


def _ngrams_frag(s: str) -> str:
    """SQL fragment: the 4-gram multiset of a string as an array (a
    string shorter than 4 chars contributes itself as its one gram) —
    the candidate unit of the CH ngram* text-similarity family."""
    return (
        f"transform(sequence(1, greatest(length({s}) - 3, 1)), "
        f"__i -> substring({s}, __i, 4))"
    )


def _ngram_common_frag(ga: str, gb: str) -> str:
    """SQL fragment: multiset-intersection size of two gram arrays —
    sum over distinct grams of the smaller per-side count."""
    return (
        f"aggregate(array_distinct({ga}), 0, (__acc, __g) -> __acc "
        f"+ least(size(filter({ga}, __x -> __x = __g)), "
        f"size(filter({gb}, __x -> __x = __g))))"
    )


def _ngram_distance_sql(args: list[str], fold: str = "") -> str:
    """CH ngramDistance(a, b): 4-gram multiset distance in [0, 1]
    (0 = identical) — 1 minus the Sørensen–Dice overlap of the two
    gram multisets, restated from first principles in the tier's
    oracle (tier 24)."""
    a = f"{fold}({args[0]})" if fold else args[0]
    b = f"{fold}({args[1]})" if fold else args[1]
    ga, gb = _ngrams_frag(a), _ngrams_frag(b)
    return (
        f"cast(1.0 - 2.0 * {_ngram_common_frag(ga, gb)} "
        f"/ (size({ga}) + size({gb})) as double)"
    )


def _ngram_search_sql(args: list[str], fold: str = "") -> str:
    """CH ngramSearch(haystack, needle): asymmetric 4-gram overlap in
    [0, 1] (1 = every needle gram present in the haystack) (tier 24)."""
    h = f"{fold}({args[0]})" if fold else args[0]
    n = f"{fold}({args[1]})" if fold else args[1]
    gh, gn = _ngrams_frag(h), _ngrams_frag(n)
    return (
        f"cast({_ngram_common_frag(gn, gh)} / cast(size({gn}) as double) "
        "as double)"
    )


def _json_extract_keys_and_values_sql(args: list[str]) -> str:
    """CH JSONExtractKeysAndValues(json, 'Type'): array of (key, value)
    pairs of a flat JSON object, values parsed as the literal type
    (tier 24)."""
    spark_t = "string"
    if len(args) > 1:
        ch_t = args[1].strip().strip("'\"").lower()
        spark_t = {
            "string": "string", "int64": "bigint", "int32": "int",
            "uint64": "bigint", "uint32": "bigint", "float64": "double",
            "float32": "float", "bool": "boolean",
        }.get(ch_t)
        if spark_t is None:
            raise ValueError(
                f"JSONExtractKeysAndValues: unsupported type {args[1]}"
            )
    return f"map_entries(from_json({args[0]}, 'map<string,{spark_t}>'))"


_ACCURATE_CAST_TYPES = {
    "int8": "tinyint", "int16": "smallint", "int32": "int",
    "int64": "bigint", "uint8": "smallint", "uint16": "int",
    "uint32": "bigint", "uint64": "decimal(20,0)", "float32": "float",
    "float64": "double", "string": "string", "date": "date",
    "datetime": "timestamp", "bool": "boolean",
}


def _accurate_cast_sql(args: list[str], strict: bool) -> str:
    """CH accurateCast(x, 'Type') / accurateCastOrNull: the 2-arg cast
    with a literal CH type name.  The OrNull form is try_cast.  The
    strict form must RAISE on a failed conversion (upstream CH's
    defining semantic) — and the session pins spark.sql.ansi.enabled
    =false, where a plain cast() silently returns NULL (strings) or
    wraps (numeric overflow), so it is spelled explicitly: try_cast
    probes convertibility (try_cast follows ANSI rules even with ANSI
    off), and a non-NULL input that fails the probe raises (tier 26)."""
    t = args[1].strip().strip("'\"").lower()
    st = _ACCURATE_CAST_TYPES.get(t)
    if st is None:
        raise ValueError(f"accurateCast: unsupported type {args[1]}")
    if not strict:
        return f"try_cast({args[0]} as {st})"
    return (
        f"if(try_cast({args[0]} as {st}) is null and ({args[0]}) is not "
        f"null, cast(raise_error(concat('accurateCast: cannot convert ', "
        f"cast({args[0]} as string), ' to {st}')) as {st}), "
        f"try_cast({args[0]} as {st}))"
    )


def _throw_if_sql(args: list[str]) -> str:
    """CH throwIf(cond[, message]): raise when the condition holds,
    else return 0 (tier 26)."""
    msg = args[1] if len(args) > 1 else "'throwIf condition met'"
    return (
        f"if(cast({args[0]} as boolean), "
        f"cast(raise_error({msg}) as int), 0)"
    )


def _morton_decode_sql(args: list[str]) -> str:
    """CH mortonDecode(2, code): deinterleave a 2-D morton code back to
    its (x, y) coordinates — inverse of mortonEncode (tier 26).  Only
    the 2-tuple form is supported (the encode side's arity too)."""
    if args[0].strip() != "2":
        raise ValueError("mortonDecode: only tuple size 2 is supported")
    code = f"cast({args[1]} as bigint)"

    def half(off: int) -> str:
        return (
            f"aggregate(sequence(0, 31), cast(0 as bigint), "
            f"(__a, __i) -> __a + shiftleft(shiftright({code}, "
            f"2 * __i + {off}) & 1, __i))"
        )

    return f"array({half(0)}, {half(1)})"


def _pad_utf8_sql(fn: str):
    """CH leftPadUTF8/rightPadUTF8 -> lpad/rpad (Spark pads are already
    character-based); the pad string defaults to a space (tier 22)."""

    def t(args: list[str]) -> str:
        pad = args[2] if len(args) > 2 else "' '"
        return f"{fn}({args[0]}, cast({args[1]} as int), {pad})"

    return t


def _to_datetime64_sql(args: list[str]) -> str:
    """CH toDateTime64(expr, scale): truncate the fractional seconds to
    `scale` digits (Spark timestamps are fixed micros, so scales beyond
    6 cap there).  A non-literal scale falls back to scale 6."""
    scale = 6
    if len(args) > 1:
        s = args[1].strip().strip("'\"")
        if s.isdigit():
            scale = min(6, int(s))
    f = 10 ** (6 - scale)
    ts = f"cast({args[0]} as timestamp)"
    if f == 1:
        return ts
    return (
        f"timestamp_micros(cast(floor(unix_micros({ts}) / {f}) * {f} "
        f"as bigint))"
    )


def _json_length_sql(args: list[str]) -> str:
    """CH JSONLength(json[, key]): element count of an array or object,
    0 for scalars/invalid (CH returns 0 when not applicable)."""
    if len(args) > 1:
        key = args[1].strip().strip("'\"")
        t = f"get_json_object({args[0]}, '$.{key}')"
    else:
        t = args[0]
    # size(NULL) is -1 under legacy sizeOfNull — nullif routes scalars
    # (where json_object_keys is NULL) to CH's 0
    return (
        f"coalesce(json_array_length({t}), "
        f"nullif(size(json_object_keys({t})), -1), 0)"
    )


_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_encode_sql(args: list[str]) -> str:
    """CH geohashEncode(longitude, latitude[, precision=12]) as a pure
    Spark expression.  Closed form (no interval-halving loop): global
    bit g is bit (g div 2) of the normalized longitude when g is even,
    of the latitude when odd; bit i of x in [0,1) is
    floor(x * 2^(i+1)) mod 2.  Each output char packs five global bits
    into one base-32 digit.  Doubles hold 2^31 exactly, so precision up
    to 12 (30 bits per dimension) is lossless."""
    lon, lat = args[0], args[1]
    prec = args[2] if len(args) > 2 else "12"
    lonn = f"((({lon}) + 180.0d) / 360.0d)"
    latn = f"((({lat}) + 90.0d) / 180.0d)"
    g = "(5 * __gp + __gb)"
    bit = (
        f"if({g} % 2 = 0, "
        f"cast(floor({lonn} * power(2.0d, cast({g} div 2 as double) "
        f"+ 1.0d)) as bigint) % 2, "
        f"cast(floor({latn} * power(2.0d, cast({g} div 2 as double) "
        f"+ 1.0d)) as bigint) % 2)"
    )
    val = (
        f"aggregate(sequence(0, 4), cast(0 as bigint), "
        f"(__ga, __gb) -> __ga * 2 + {bit})"
    )
    return (
        f"array_join(transform(sequence(0, cast({prec} as int) - 1), "
        f"__gp -> substring('{_GEOHASH32}', cast({val} as int) + 1, 1)),"
        f" '')"
    )


def _geohash_decode_sql(args: list[str]) -> str:
    """CH geohashDecode(hash) -> tuple(longitude, latitude) of the CELL
    CENTER (the CH docs example: 'ezs42' -> (-5.60302734375,
    42.60498046875)).  Inverse of the closed form above: fold the
    global bits into one integer per dimension, then denormalize the
    midpoint (v + 0.5) / 2^bits."""
    h = args[0]
    n5 = f"(5 * length({h}))"
    idx = (
        f"(instr('{_GEOHASH32}', substring({h}, __gg div 5 + 1, 1)) - 1)"
    )
    bit = f"(shiftright(cast({idx} as int), 4 - (__gg % 5)) % 2)"
    lonv = (
        f"aggregate(sequence(0, {n5} - 1), cast(0 as bigint), "
        f"(__gacc, __gg) -> if(__gg % 2 = 0, __gacc * 2 + {bit}, __gacc))"
    )
    latv = (
        f"aggregate(sequence(0, {n5} - 1), cast(0 as bigint), "
        f"(__gacc, __gg) -> if(__gg % 2 = 1, __gacc * 2 + {bit}, __gacc))"
    )
    lonbits = f"(({n5} + 1) div 2)"
    latbits = f"({n5} div 2)"
    lon = (
        f"((cast({lonv} as double) + 0.5d) "
        f"/ power(2.0d, cast({lonbits} as double)) * 360.0d - 180.0d)"
    )
    lat = (
        f"((cast({latv} as double) + 0.5d) "
        f"/ power(2.0d, cast({latbits} as double)) * 180.0d - 90.0d)"
    )
    return f"named_struct('_1', {lon}, '_2', {lat})"


def _map_arith_sql(op: str):
    """CH mapAdd/mapSubtract(m1, m2): union of keys, values combined
    with +/- (a missing key contributes 0)."""

    def f(args: list[str]) -> str:
        keys = f"array_union(map_keys({args[0]}), map_keys({args[1]}))"
        return (
            f"map_from_arrays({keys}, transform({keys}, __k -> "
            f"coalesce(element_at({args[0]}, __k), 0) {op} "
            f"coalesce(element_at({args[1]}, __k), 0)))"
        )

    return f


# Everyday tier 18: URL hierarchy cuts, URL parameter lists, week-end
# rounding, numeric bucketing, decimal readable sizes, the simpleJSON*
# canonical aliases of visitParam*, LIKE-filtered map lookups, time-slot
# grids, and first-match needle indexing.  Tier 19 rides in the same
# block: second truncation, DateTime64 casts, MySQL-format parsing,
# the JSONExtractBool/Raw/Length tail of the JSON family, and map
# arithmetic (mapAdd/mapSubtract/mapUpdate).  All pure Spark built-in
# expressions (JVM codegen; plan-pinned in tests/test_plans.py).
CH_SQL_TEMPLATES.update(
    {
        "cuttofirstsignificantsubdomain": (
            _cut_to_first_significant_subdomain_sql
        ),
        # raw 'k=v' pairs of the query string, in order
        "extracturlparameters": (
            "filter(split(coalesce(parse_url({0}, 'QUERY'), ''), '&'), "
            "__kv -> __kv != '')"
        ),
        # week starts Sunday here (mode 0, same as toStartOfWeek above),
        # so the last day is the following Saturday
        "tolastdayofweek": (
            "date_add(date_sub(to_date({0}), (dayofweek({0}) - 1)), 6)"
        ),
        "widthbucket": "width_bucket({0}, {1}, {2}, {3})",
        "formatreadabledecimalsize": _format_readable_decimal_size_sql,
        # Spark strings are decoded with invalid-byte replacement before
        # any expression sees them, so at the Column level toValidUTF8's
        # replace-invalid-sequences contract is already satisfied
        "tovalidutf8": "{0}",
        # simpleJSON* = the canonical upstream names for visitParam*
        "simplejsonextractstring": (
            "get_json_object({0}, concat('$.', {1}))"
        ),
        "simplejsonextractraw": "get_json_object({0}, concat('$.', {1}))",
        "simplejsonextractint": (
            "cast(get_json_object({0}, concat('$.', {1})) as bigint)"
        ),
        "simplejsonextractfloat": (
            "cast(get_json_object({0}, concat('$.', {1})) as double)"
        ),
        "simplejsonextractbool": (
            "coalesce(cast(get_json_object({0}, concat('$.', {1})) "
            "as boolean), false)"
        ),
        "simplejsonhas": (
            "get_json_object({0}, concat('$.', {1})) is not null"
        ),
        "mapcontainskeylike": (
            "exists(map_keys({0}), __k -> __k like {1})"
        ),
        "mapextractkeylike": (
            "map_filter({0}, (__k, __v) -> __k like {1})"
        ),
        "timeslots": _time_slots_sql,
        "tostartofsecond": "date_trunc('second', {0})",
        "todatetime64": _to_datetime64_sql,
        "parsedatetime": _parse_datetime_sql,
        "jsonextractbool": _json_tmpl(
            "coalesce(cast(get_json_object({0}, {1}) as boolean), false)"
        ),
        "jsonextractraw": _json_tmpl("get_json_object({0}, {1})"),
        "jsonlength": _json_length_sql,
        "mapadd": _map_arith_sql("+"),
        "mapsubtract": _map_arith_sql("-"),
        # keys of {1} insert-or-replace into {0} (upstream mapUpdate)
        "mapupdate": (
            "map_concat(map_filter({0}, (__k, __v) -> "
            "not array_contains(map_keys({1}), __k)), {1})"
        ),
        # tier 20: exact distinct over unrolled group arrays, canonical
        # IPv4 parse, central angles, and pure-SQL geohash
        "uniqarray": (
            "cast(size(array_distinct(flatten(collect_list("
            "array_distinct({0}))))) as bigint)"
        ),
        # canonical dotted-quad: parse to the u32 then re-render (the
        # num<->string pair above composed at rewrite time)
        "toipv4": lambda args: (
            "concat(cast(({n} div 16777216) % 256 as string), '.', "
            "cast(({n} div 65536) % 256 as string), '.', "
            "cast(({n} div 256) % 256 as string), '.', "
            "cast({n} % 256 as string))".format(
                n=_ipv4stringtonum_sql(args)
            )
        ),
        "greatcircleangle": (
            "degrees(2 * asin(sqrt("
            "power(sin(radians(({3}) - ({1})) / 2), 2) + "
            "cos(radians({1})) * cos(radians({3})) * "
            "power(sin(radians(({2}) - ({0})) / 2), 2))))"
        ),
        "geohashencode": _geohash_encode_sql,
        "geohashdecode": _geohash_decode_sql,
        # tier 21: compact-integer date forms, Snowflake-ID time
        # extraction, sub-second truncation, first-match group capture
        "yyyymmddtodate": (
            "to_date(lpad(cast(cast({0} as bigint) as string), 8, '0'), "
            "'yyyyMMdd')"
        ),
        "yyyymmddhhmmsstodatetime": (
            "to_timestamp(lpad(cast(cast({0} as bigint) as string), 14, "
            "'0'), 'yyyyMMddHHmmss')"
        ),
        # Twitter-epoch Snowflake IDs: milliseconds live in bits 22+
        # (epoch 1288834974657 = 2010-11-04T01:42:54.657Z)
        "snowflaketodatetime": (
            "timestamp_millis(shiftright(cast({0} as bigint), 22) "
            "+ 1288834974657)"
        ),
        "datetimetosnowflake": (
            "shiftleft(unix_millis(cast({0} as timestamp)) "
            "- 1288834974657, 22)"
        ),
        "tostartofmillisecond": (
            "timestamp_micros(cast(floor(unix_micros(cast({0} as "
            "timestamp)) / 1000) * 1000 as bigint))"
        ),
        "tostartofmicrosecond": "cast({0} as timestamp)",
        # quarter = 3 months (make_interval has no quarter slot)
        "tointervalquarter": (
            "make_interval(0, 3 * ({0}), 0, 0, 0, 0, 0)"
        ),
        "extractgroups": _extract_groups_sql,
        # a stable server identity constant, like fqdn()/tcpPort() above
        "serveruuid": "'7e6fa0a1-7e6f-a0a1-7e6f-a0a17e6fa0a1'",
        # 1-based index of the needle matching EARLIEST in the haystack
        # (0 when none match); ties go to the lowest needle index because
        # array_position returns the first occurrence
        "multisearchfirstindex": (
            "cast(coalesce(array_position("
            "transform({1}, __n -> instr({0}, __n)), "
            "array_min(filter(transform({1}, __n -> instr({0}, __n)), "
            "__p -> __p > 0))), 0) as bigint)"
        ),
        # tier 22: relative date numbers, per-match group capture, MAC
        # address codecs, map sorting, dense array enumeration, clamps
        # (all pure built-ins; each formula restated first-principles in
        # the tier's DuckDB oracle)
        "torelativeyearnum": "year(cast({0} as date))",
        # months on the year*12+month grid (CH DateLUT RelativeMonthNum)
        "torelativemonthnum": (
            "year(cast({0} as date)) * 12 + month(cast({0} as date))"
        ),
        # inverse of toDaysSinceYearZero (+366: year-0 is a leap year on
        # the proleptic grid CH counts over, tier 17)
        "fromdayssinceyearzero": (
            "date_add(date'0001-01-01', cast({0} as int) - 366)"
        ),
        # CH timeDiff(first, second) = seconds of (second - first)
        "timediff": (
            "unix_timestamp(cast({1} as timestamp)) "
            "- unix_timestamp(cast({0} as timestamp))"
        ),
        "utctimestamp": "current_timestamp()",
        "macstringtonum": (
            "cast(conv(replace(replace({0}, ':', ''), '-', ''), 16, 10) "
            "as bigint)"
        ),
        "macnumtostring": _mac_num_to_string_sql,
        # 1-based position of EACH needle (0 when absent), CH order
        "multisearchallpositions": (
            "transform({1}, __n -> cast(locate(__n, {0}) as bigint))"
        ),
        "extractallgroups": _extract_all_groups_vertical_sql,
        "extractallgroupsvertical": _extract_all_groups_vertical_sql,
        "extractallgroupshorizontal": _extract_all_groups_horizontal_sql,
        "jsonarraylength": "json_array_length({0})",
        "leftpadutf8": _pad_utf8_sql("lpad"),
        "rightpadutf8": _pad_utf8_sql("rpad"),
        "substringindexutf8": "substring_index({0}, {1}, {2})",
        # struct arrays sort lexicographically, i.e. by key first
        "mapsort": "map_from_entries(array_sort(map_entries({0})))",
        "mapreversesort": (
            "map_from_entries(sort_array(map_entries({0}), false))"
        ),
        # dense 1-based ids in order of first appearance
        "arrayenumeratedense": (
            "transform({0}, __x -> "
            "cast(array_position(array_distinct({0}), __x) as int))"
        ),
        "clamp": "greatest({1}, least({2}, {0}))",
        # tier 23: last-match array search, ROC AUC, IPv6 validation,
        # top-level JSON classification, map quantifiers, UUIDv7, and
        # session-timezone introspection
        # CH arrayLast(func, arr) — deviation: returns NULL (not the
        # type's default value) when nothing matches; Spark can't spell
        # a type-generic default inside one template
        "arraylast": "try_element_at(filter({1}, {0}), -1)",
        # 1-based index of the LAST match (0 when none): first match of
        # the reversed array, mirrored — array_position over the
        # transformed boolean array finds the first true
        "arraylastindex": (
            "coalesce(nullif(size({1}) + 1 "
            "- cast(array_position(transform(reverse({1}), {0}), true) "
            "as int), size({1}) + 1), 0)"
        ),
        "arrayauc": _array_auc_sql,
        "isipv6string": _is_ipv6_string_sql,
        "jsontype": _json_type_sql,
        # CH mapAll/mapExists(func(k,v), map) over Spark map_filter
        "mapall": "(size(map_filter({1}, {0})) = size({1}))",
        "mapexists": "(size(map_filter({1}, {0})) > 0)",
        # RFC 9562 UUIDv7: 48-bit unix-ms timestamp, version nibble 7,
        # variant 10xx, 74 random bits — composed from hex fragments
        "generateuuidv7": (
            "lower(concat("
            "substring(lpad(hex(unix_millis(now())), 12, '0'), 1, 8), '-', "
            "substring(lpad(hex(unix_millis(now())), 12, '0'), 9, 4), "
            "'-7', lpad(hex(cast(rand() * 4096 as int)), 3, '0'), '-', "
            "substring('89ab', cast(rand() * 4 as int) + 1, 1), "
            "lpad(hex(cast(rand() * 4096 as int)), 3, '0'), '-', "
            "lpad(hex(cast(rand() * 16777216 as int)), 6, '0'), "
            "lpad(hex(cast(rand() * 16777216 as int)), 6, '0')))"
        ),
        # the engine pins the session to UTC (wire convention tests):
        # the argument's timezone IS the session timezone
        "timezoneof": "'UTC'",
        "timezoneoffset": "cast(0 as int)",
        # tier 24: 4-gram text similarity, normalized-query hashing,
        # relative week numbers, flat-JSON pair extraction, elementwise
        # tuple arithmetic (the array tuple model of the vector family)
        "ngramdistance": _ngram_distance_sql,
        "ngramdistancecaseinsensitive": (
            lambda a: _ngram_distance_sql(a, fold="lower")
        ),
        "ngramsearch": _ngram_search_sql,
        "ngramsearchcaseinsensitive": (
            lambda a: _ngram_search_sql(a, fold="lower")
        ),
        # hash of the literal-stripped query text (normalizeQuery above)
        "normalizedqueryhash": (
            "xxhash64(regexp_replace(regexp_replace({0}, \"'[^']*'\", "
            "'?'), '(?<![a-zA-Z0-9_])[0-9]+(\\\\.[0-9]+)?', '?'))"
        ),
        # weeks since epoch on the Monday-rollover grid
        # (DateLUT: (days + 8 - iso_dow) / 7)
        "torelativeweeknum": (
            "cast(floor((datediff(cast({0} as date), date'1970-01-01') "
            "+ 8 - (pmod(dayofweek(cast({0} as date)) + 5, 7) + 1)) / 7) "
            "as int)"
        ),
        "jsonextractkeysandvalues": _json_extract_keys_and_values_sql,
        "identity": "{0}",
        # tier 26: digit counts, random distributions, bitmask
        # explosion, morton deinterleave, strict casts, throwIf
        "countdigits": (
            "length(cast(abs(cast({0} as bigint)) as string))"
        ),
        "randuniform": "({0} + rand() * ({1} - ({0})))",
        # Box–Muller from two independent uniforms
        "randnormal": (
            "({0} + ({1}) * sqrt(-2 * ln(rand())) * cos(2 * pi() "
            "* rand()))"
        ),
        "randbernoulli": "cast(rand() < ({0}) as tinyint)",
        "randexponential": "(-ln(rand()) / ({0}))",
        "randprintableascii": (
            "concat_ws('', transform(sequence(1, cast({0} as int)), "
            "__i -> char(32 + cast(rand() * 95 as int))))"
        ),
        # ascending powers of two present in the mask.  The full 64-bit
        # domain: shiftleft(1, 63) wraps to the bigint sign bit, whose
        # power-of-two component surfaces as Long.MIN_VALUE — the same
        # signed reinterpretation the mask itself carries, and the & test
        # round-trips it exactly.
        "bitmasktoarray": (
            "filter(transform(sequence(0, 63), __i -> "
            "shiftleft(cast(1 as bigint), __i)), "
            "__p -> (cast({0} as bigint) & __p) != 0)"
        ),
        # ascending 0-based positions of the set bits (bit 63 = the sign
        # bit of the signed reinterpretation; arithmetic shiftright still
        # reads it correctly since only bit 0 of the shifted value is
        # tested)
        "bitpositionstoarray": (
            "filter(sequence(cast(0 as bigint), cast(63 as bigint)), "
            "__i -> (shiftright(cast({0} as bigint), cast(__i as int)) "
            "& 1) = 1)"
        ),
        "tocolumntypename": "typeof({0})",
        "tostringcuttozero": "substring_index({0}, char(0), 1)",
        "throwif": _throw_if_sql,
        "accuratecast": lambda a: _accurate_cast_sql(a, strict=True),
        "accuratecastornull": lambda a: _accurate_cast_sql(a, strict=False),
        "mortondecode": _morton_decode_sql,
        "tupleplus": "zip_with({0}, {1}, (__a, __b) -> __a + __b)",
        "tupleminus": "zip_with({0}, {1}, (__a, __b) -> __a - __b)",
        "tuplemultiply": "zip_with({0}, {1}, (__a, __b) -> __a * __b)",
        "tupledivide": "zip_with({0}, {1}, (__a, __b) -> __a / __b)",
        "tuplenegate": "transform({0}, __a -> -__a)",
        "vectorsum": "zip_with({0}, {1}, (__a, __b) -> __a + __b)",
        "vectordifference": "zip_with({0}, {1}, (__a, __b) -> __a - __b)",
    }
)


# ---------------------------------------------------------------------------
# Everyday tier 27: date construction, snowflake-ID codecs, subsequence
# tests, time-delta parsing, jump consistent hashing, byte-level hamming,
# path/line extraction (upstream-CH names; all pure JVM expressions).


def _make_date_sql(args: list[str]) -> str:
    """CH makeDate(year, month, day) / makeDate(year, day_of_year): both
    arities (tier 27)."""
    if len(args) >= 3:
        return (
            f"make_date(cast({args[0]} as int), cast({args[1]} as int), "
            f"cast({args[2]} as int))"
        )
    return (
        f"date_add(make_date(cast({args[0]} as int), 1, 1), "
        f"cast({args[1]} as int) - 1)"
    )


def _make_datetime_sql(args: list[str]) -> str:
    """CH makeDateTime(year, month, day, hour, minute, second[, tz])
    (tier 27)."""
    if len(args) < 6:
        raise ValueError("makeDateTime needs (y, m, d, h, mi, s[, tz])")
    cast6 = ", ".join(f"cast({a} as int)" for a in args[:6])
    tz = f", {args[6]}" if len(args) > 6 else ""
    return f"make_timestamp({cast6}{tz})"


# Twitter snowflake epoch (ms): the upstream default for the ID codecs
_SNOWFLAKE_EPOCH_MS = 1288834974657


def _snowflake_id_to_datetime_sql(args: list[str]) -> str:
    """CH snowflakeIDToDateTime(id[, epoch_ms]): bits 22+ are the
    millisecond offset from the (Twitter) epoch (tier 27)."""
    epoch = args[1] if len(args) > 1 else str(_SNOWFLAKE_EPOCH_MS)
    return (
        f"timestamp_millis(cast({epoch} as bigint) + "
        f"shiftrightunsigned(cast({args[0]} as bigint), 22))"
    )


def _datetime_to_snowflake_id_sql(args: list[str]) -> str:
    """CH dateTimeToSnowflakeID(dt[, epoch_ms]): inverse of the above —
    machine/sequence bits zero, exactly as upstream documents (tier 27)."""
    epoch = args[1] if len(args) > 1 else str(_SNOWFLAKE_EPOCH_MS)
    return (
        f"shiftleft(unix_millis(cast({args[0]} as timestamp)) - "
        f"cast({epoch} as bigint), 22)"
    )


# hasSubsequence and its case-insensitive variant are registered by the
# tier-40 case-insensitive search block (_has_subsequence_sql below),
# which supersedes the original tier-27 definitions — the duplicates
# were deleted per r13 ADVICE (silent later-wins re-registration).


# parseTimeDelta unit vocabulary (upstream's parser accepts these
# spellings), in seconds
_TIME_DELTA_UNITS = {
    "ns": 1e-9, "nanosecond": 1e-9, "nanoseconds": 1e-9,
    "us": 1e-6, "microsecond": 1e-6, "microseconds": 1e-6,
    "ms": 1e-3, "millisecond": 1e-3, "milliseconds": 1e-3,
    "s": 1.0, "sec": 1.0, "secs": 1.0, "second": 1.0, "seconds": 1.0,
    "m": 60.0, "min": 60.0, "mins": 60.0, "minute": 60.0, "minutes": 60.0,
    "h": 3600.0, "hr": 3600.0, "hour": 3600.0, "hours": 3600.0,
    "d": 86400.0, "day": 86400.0, "days": 86400.0,
    "w": 604800.0, "week": 604800.0, "weeks": 604800.0,
}


def _parse_time_delta_sql(args: list[str]) -> str:
    """CH parseTimeDelta('1 min 35 seconds') -> Float64 seconds: extract
    every number+unit token, scale by the unit vocabulary, sum
    (tier 27).  [.] avoids regex-backslash escaping entirely."""
    units = ", ".join(
        f"'{u}', cast({v!r} as double)" for u, v in _TIME_DELTA_UNITS.items()
    )
    tok = "'[0-9]*[.]?[0-9]+ *[a-z]+'"
    return (
        f"aggregate(transform(regexp_extract_all(lower({args[0]}), {tok}, "
        f"0), __t -> cast(regexp_extract(__t, '([0-9]*[.]?[0-9]+)', 1) "
        f"as double) * coalesce(element_at(map({units}), "
        f"regexp_extract(__t, '([a-z]+)', 1)), cast(0 as double))), "
        f"cast(0 as double), (__a, __x) -> __a + __x)"
    )


def _jump_consistent_hash_sql(args: list[str]) -> str:
    """CH jumpConsistentHash(key, buckets) — the Lamport/Veach jump
    consistent hash (arXiv:1406.2294): b=j; key=key*2862933555777941757+1;
    j=(b+1)*(2^31/((key>>33)+1)) until j>=buckets, return b.  Spark
    bigint multiply wraps mod 2^64 exactly like the C uint64 (ANSI off),
    shiftrightunsigned matches the unsigned >>, and cast(double as
    bigint) truncates toward zero like the C conversion.  The loop is
    unrolled as a 64-step JVM aggregate with an early-exit guard — j
    strictly increases every step and multiplies by ~e in expectation,
    so 64 steps is astronomically beyond any real bucket count
    (tier 27)."""
    key, n = f"cast({args[0]} as bigint)", f"cast({args[1]} as bigint)"
    step = (
        "named_struct('b', __s.j, "
        "'j', cast(cast(__s.j + 1 as double) * (cast(2147483648 as double) "
        "/ cast(shiftrightunsigned(__s.k * 2862933555777941757 + 1, 33) "
        "+ 1 as double)) as bigint), "
        "'k', __s.k * 2862933555777941757 + 1)"
    )
    return (
        f"aggregate(sequence(1, 64), named_struct('b', "
        f"cast(-1 as bigint), 'j', cast(0 as bigint), 'k', {key}), "
        f"(__s, __i) -> if(__s.j >= {n}, __s, {step}), __s -> __s.b)"
    )


def _byte_hamming_distance_sql(args: list[str]) -> str:
    """CH byteHammingDistance(a, b): differing BYTE positions over the
    common prefix plus the length difference.  Byte-exact for any UTF-8
    input: compare two-hex-digit slices of hex(encode(s)) so multi-byte
    characters never alias (tier 27)."""
    ha = f"hex(encode({args[0]}, 'utf-8'))"
    hb = f"hex(encode({args[1]}, 'utf-8'))"
    la, lb = f"octet_length({args[0]})", f"octet_length({args[1]})"
    common = f"cast(least({la}, {lb}) as int)"
    return (
        f"(if({common} = 0, 0, aggregate(sequence(1, greatest({common}, "
        f"1)), 0, (__a, __i) -> __a + if(substring({ha}, 2 * __i - 1, 2) "
        f"= substring({hb}, 2 * __i - 1, 2), 0, 1))) "
        f"+ abs({la} - {lb}))"
    )


CH_SQL_TEMPLATES.update(
    {
        "makedate": _make_date_sql,
        "makedatetime": _make_datetime_sql,
        "snowflakeidtodatetime": _snowflake_id_to_datetime_sql,
        "datetimetosnowflakeid": _datetime_to_snowflake_id_sql,
        "parsetimedelta": _parse_time_delta_sql,
        "tobool": "cast({0} as boolean)",
        "jumpconsistenthash": _jump_consistent_hash_sql,
        "bytehammingdistance": _byte_hamming_distance_sql,
        # the text before the first newline (upstream splits on \n only)
        "firstline": "substring_index({0}, '\\n', 1)",
        # the path component after the last '/' or '\' (CH handles both)
        "basename": r"regexp_extract({0}, '[^/\\\\]*$', 0)",
    }
)


# ---------------------------------------------------------------------------
# Everyday tier 28: error functions, Jaro string similarities, two-sample
# proportion z-test, A/B-test sample sizing, sparkbar rendering — all pure
# JVM expressions; the normal-distribution pieces use published rational
# approximations (Numerical Recipes erfc, |rel err| < 1.2e-7; Acklam's
# inverse normal CDF, |rel err| < 1.15e-9), far below the 6-significant-
# digit resolution the correctness hashes compare at.


def _erfc_frag(x: str) -> str:
    """Numerical Recipes erfc(x) for any real x: t = 1/(1+|x|/2),
    erfc = t*exp(-x² + poly(t)), reflected for negative x."""
    t = f"(1.0 / (1.0 + abs({x}) / 2.0))"
    poly = (
        "(-1.26551223 + __u * (1.00002368 + __u * (0.37409196 + __u * "
        "(0.09678418 + __u * (-0.18628806 + __u * (0.27886807 + __u * "
        "(-1.13520398 + __u * (1.48851587 + __u * (-0.82215223 + __u * "
        "0.17087277)))))))))"
    )
    core = (
        f"element_at(transform(array({t}), __u -> "
        f"__u * exp(-({x}) * ({x}) + {poly})), 1)"
    )
    return f"if(({x}) >= 0, {core}, 2.0 - {core})"


# Acklam inverse-normal-CDF coefficients
_ACKLAM_A = (-3.969683028665376e+01, 2.209460984245205e+02,
             -2.759285104469687e+02, 1.383577518672690e+02,
             -3.066479806614716e+01, 2.506628277459239e+00)
_ACKLAM_B = (-5.447609879822406e+01, 1.615858368580409e+02,
             -1.556989798598866e+02, 6.680131188771972e+01,
             -1.328068155288572e+01)
_ACKLAM_C = (-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e+00, -2.549732539343734e+00,
             4.374664141464968e+00, 2.938163982698783e+00)
_ACKLAM_D = (7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e+00, 3.754408661907416e+00)


def _norm_quantile_frag(p: str) -> str:
    """Acklam's inverse normal CDF as SQL arithmetic: a central rational
    approximation in q = p - 1/2 and a tail form in sqrt(-2 ln p),
    mirrored for the upper tail."""
    a, b, c, d = _ACKLAM_A, _ACKLAM_B, _ACKLAM_C, _ACKLAM_D
    num_c = (f"((((({a[0]}*__r+{a[1]})*__r+{a[2]})*__r+{a[3]})*__r"
             f"+{a[4]})*__r+{a[5]})")
    den_c = (f"((((({b[0]}*__r+{b[1]})*__r+{b[2]})*__r+{b[3]})*__r"
             f"+{b[4]})*__r+1.0)")
    central = (f"element_at(transform(array((__q)*(__q)), __r -> "
               f"(__q) * {num_c} / {den_c}), 1)")
    central = (f"element_at(transform(array(({p}) - 0.5), __q -> "
               f"{central}), 1)")
    num_t = (f"((((({c[0]}*__r+{c[1]})*__r+{c[2]})*__r+{c[3]})*__r"
             f"+{c[4]})*__r+{c[5]})")
    den_t = (f"(((({d[0]}*__r+{d[1]})*__r+{d[2]})*__r+{d[3]})*__r+1.0)")
    lower = (f"element_at(transform(array(sqrt(-2.0 * ln({p}))), __r -> "
             f"{num_t} / {den_t}), 1)")
    upper = (f"element_at(transform(array(sqrt(-2.0 * ln(1.0 - ({p})))), "
             f"__r -> -({num_t} / {den_t})), 1)")
    return (f"case when ({p}) < 0.02425 then {lower} "
            f"when ({p}) > 0.97575 then {upper} else {central} end")


def _jaro_sql(args: list[str]) -> str:
    """CH jaroSimilarity(s1, s2): the classic Jaro similarity — greedy
    in-window character matching (each character matched at most once),
    transpositions = half the out-of-order matched pairs.  One JVM
    aggregate over the first string's positions carrying (used flags,
    matched chars, matched positions); empty input gives 0 (the same
    convention the DuckDB oracle uses) (tier 28)."""
    s1, s2 = args[0], args[1]
    a, b = f"split({s1}, '')", f"split({s2}, '')"
    cand = (
        "element_at(filter(sequence(1, size(__t.b)), __j -> "
        "__j >= __i - __t.w and __j <= __i + __t.w "
        "and not element_at(__s.used, __j) "
        "and element_at(__t.b, __j) = element_at(__t.a, __i)), 1)"
    )
    upd = (
        f"element_at(transform(array({cand}), __j0 -> "
        "if(__j0 is null, __s, named_struct("
        "'used', transform(sequence(1, size(__t.b)), __k -> "
        "  if(__k = __j0, true, element_at(__s.used, __k))), "
        "'m1', concat(__s.m1, array(element_at(__t.a, __i))), "
        "'mj', concat(__s.mj, array(__j0))))), 1)"
    )
    agg = (
        "aggregate(sequence(1, size(__t.a)), "
        "named_struct('used', transform(__t.b, __z -> false), "
        "'m1', cast(array() as array<string>), "
        "'mj', cast(array() as array<int>)), "
        f"(__s, __i) -> {upd})"
    )
    # transpositions: INTEGER half of the out-of-order matched pairs
    # (Winkler's original counting — an odd mismatch count floors, the
    # same convention the DuckDB oracle uses)
    formula = (
        "if(size(__st.m1) = 0, cast(0 as double), "
        "(cast(size(__st.m1) as double) / size(__t.a) "
        "+ cast(size(__st.m1) as double) / size(__t.b) "
        "+ cast(size(__st.m1) - (size(filter(zip_with(__st.m1, "
        "transform(array_sort(__st.mj), __j -> element_at(__t.b, __j)), "
        "(__x, __y) -> __x != __y), __z -> __z)) div 2) as double) "
        "/ size(__st.m1)) / 3)"
    )
    body = f"element_at(transform(array({agg}), __st -> {formula}), 1)"
    return (
        f"if(char_length({s1}) = 0 or char_length({s2}) = 0, "
        "cast(0 as double), "
        f"element_at(transform(array(named_struct('a', {a}, 'b', {b}, "
        f"'w', greatest(cast(floor(greatest(char_length({s1}), "
        f"char_length({s2})) / 2) as int) - 1, 0))), "
        f"__t -> {body}), 1))"
    )


def _jaro_winkler_sql(args: list[str]) -> str:
    """CH jaroWinklerSimilarity(s1, s2): Jaro boosted by the common
    prefix (up to 4 chars) at the standard 0.1 scaling, applied only
    above the classic 0.7 boost threshold — Winkler's original
    definition, and what the DuckDB oracle implements (tier 28)."""
    s1, s2 = args[0], args[1]
    j = _jaro_sql(args)
    prefix = (
        f"aggregate(sequence(1, 4), 0, (__acc, __i) -> "
        f"if(__acc = __i - 1 and substring({s1}, __i, 1) = "
        f"substring({s2}, __i, 1) and __i <= least(char_length({s1}), "
        f"char_length({s2})), __i, __acc))"
    )
    return (
        f"element_at(transform(array(cast({j} as double)), __jv -> "
        f"if(__jv > 0.7, __jv + {prefix} * 0.1 * (1 - __jv), __jv)), 1)"
    )


def _proportions_ztest_sql(args: list[str]) -> str:
    """CH proportionsZTest(successes_x, successes_y, trials_x, trials_y,
    conf_level, usevar 'pooled'|'unpooled'): two-sample proportion
    z-test.  Returns (z_statistic, p_value, ci_lower, ci_upper) — the
    p-value is the two-sided erfc(|z|/√2); the confidence interval is on
    the difference p_x − p_y with the unpooled standard error, at
    conf_level (tier 28)."""
    if len(args) < 6:
        raise ValueError(
            "proportionsZTest(sx, sy, tx, ty, conf_level, usevar)"
        )
    sx, sy, tx, ty, conf = (f"cast({a} as double)" for a in args[:5])
    usevar = args[5].strip().strip("'\"").lower()
    if usevar not in ("pooled", "unpooled"):
        raise ValueError("proportionsZTest usevar: 'pooled'|'unpooled'")
    p1, p2 = f"(({sx}) / ({tx}))", f"(({sy}) / ({ty}))"
    if usevar == "pooled":
        pp = f"((({sx}) + ({sy})) / (({tx}) + ({ty})))"
        se_z = f"sqrt({pp} * (1.0 - {pp}) * (1.0 / ({tx}) + 1.0 / ({ty})))"
    else:
        se_z = (f"sqrt({p1} * (1.0 - {p1}) / ({tx}) "
                f"+ {p2} * (1.0 - {p2}) / ({ty}))")
    se_ci = (f"sqrt({p1} * (1.0 - {p1}) / ({tx}) "
             f"+ {p2} * (1.0 - {p2}) / ({ty}))")
    z = f"(({p1} - {p2}) / {se_z})"
    zq = _norm_quantile_frag(f"(1.0 + {conf}) / 2.0")
    pval = _erfc_frag("abs(__z) / sqrt(2.0)")
    return (
        f"element_at(transform(array({z}), __z -> named_struct("
        f"'_1', __z, '_2', {pval}, "
        f"'_3', ({p1} - {p2}) - ({zq}) * {se_ci}, "
        f"'_4', ({p1} - {p2}) + ({zq}) * {se_ci})), 1)"
    )


def _min_sample_size_conversion_sql(args: list[str]) -> str:
    """CH minSampleSizeConversion(baseline, mde, power, alpha): minimum
    per-group sample size to detect an absolute `mde` change from the
    baseline conversion at the given power/significance —
    n = (z_{1−α/2} + z_{power})² · (p₁(1−p₁) + p₂(1−p₂)) / mde², with
    the detectable range (baseline − mde, baseline + mde) (tier 28)."""
    if len(args) < 4:
        raise ValueError(
            "minSampleSizeConversion(baseline, mde, power, alpha)"
        )
    base, mde, power, alpha = (f"cast({a} as double)" for a in args[:4])
    za = _norm_quantile_frag(f"1.0 - ({alpha}) / 2.0")
    zp = _norm_quantile_frag(f"({power})")
    p2 = f"(({base}) + ({mde}))"
    n = (
        f"element_at(transform(array(({za}) + ({zp})), __zs -> "
        f"__zs * __zs * (({base}) * (1.0 - ({base})) "
        f"+ {p2} * (1.0 - {p2})) / (({mde}) * ({mde}))), 1)"
    )
    return (
        f"named_struct('_1', {n}, '_2', ({base}) - ({mde}), "
        f"'_3', ({base}) + ({mde}))"
    )


def _min_sample_size_continuous_sql(args: list[str]) -> str:
    """CH minSampleSizeContinous(baseline, sigma, mde, power, alpha):
    minimum per-group sample size to detect a RELATIVE `mde` change of
    a continuous metric — n = 2·(z_{1−α/2} + z_{power})²·σ² /
    (mde·baseline)², detectable range baseline·(1 ∓ mde) (tier 28; the
    upstream name ships with the typo and the corrected alias)."""
    if len(args) < 5:
        raise ValueError(
            "minSampleSizeContinous(baseline, sigma, mde, power, alpha)"
        )
    base, sigma, mde, power, alpha = (
        f"cast({a} as double)" for a in args[:5]
    )
    za = _norm_quantile_frag(f"1.0 - ({alpha}) / 2.0")
    zp = _norm_quantile_frag(f"({power})")
    n = (
        f"element_at(transform(array(({za}) + ({zp})), __zs -> "
        f"2.0 * __zs * __zs * ({sigma}) * ({sigma}) "
        f"/ (({mde}) * ({base}) * ({mde}) * ({base}))), 1)"
    )
    return (
        f"named_struct('_1', {n}, "
        f"'_2', ({base}) * (1.0 - ({mde})), "
        f"'_3', ({base}) * (1.0 + ({mde})))"
    )


CH_SQL_TEMPLATES.update(
    {
        "erf": lambda a: f"(1.0 - {_erfc_frag(f'cast({a[0]} as double)')})",
        "erfc": lambda a: _erfc_frag(f"cast({a[0]} as double)"),
        "jarosimilarity": _jaro_sql,
        "jarowinklersimilarity": _jaro_winkler_sql,
        "proportionsztest": _proportions_ztest_sql,
        "minsamplesizeconversion": _min_sample_size_conversion_sql,
        "minsamplesizecontinous": _min_sample_size_continuous_sql,
        "minsamplesizecontinuous": _min_sample_size_continuous_sql,
    }
)


# ---------------------------------------------------------------------------
# Everyday tier 29: true Damerau-Levenshtein, point-in-polygon, great-
# circle distance, Java/Hive string hashes, CIDR ranges, nanosecond
# arithmetic, unaligned zips — all pure JVM expressions.


def _damerau_levenshtein_sql(args: list[str]) -> str:
    """CH damerauLevenshteinDistance(s1, s2): the TRUE (unrestricted)
    Damerau-Levenshtein distance — the full alphabet-map algorithm, so
    'ca' -> 'abc' is 2, not the OSA variant's 3.  The DP runs as one JVM
    aggregate over s1's positions; the outer state carries every
    completed row (the transposition case reaches back to row da[ch]-1)
    plus the last-occurrence map; the inner aggregate builds each row
    left-to-right carrying the row-local last-match column (tier 29).
    Verified character-for-character against DuckDB's native
    damerau_levenshtein."""
    s1, s2 = args[0], args[1]
    a, b = f"split({s1}, '')", f"split({s2}, '')"
    prevrow = "element_at(__o.rows, __i)"
    k = "coalesce(element_at(__o.da, element_at(__t.b, __j)), 0)"
    cost = "if(element_at(__t.a, __i) = element_at(__t.b, __j), 0, 1)"
    maxd = "(size(__t.a) + size(__t.b))"
    cell = (
        f"least(element_at({prevrow}, __j) + {cost}, "
        f"element_at(__n.r, __j) + 1, "
        f"element_at({prevrow}, __j + 1) + 1, "
        f"if(({k}) >= 1 and __n.db >= 1, "
        f"element_at(element_at(__o.rows, {k}), __n.db), {maxd}) "
        f"+ (__i - ({k}) - 1) + 1 + (__j - __n.db - 1))"
    )
    inner = (
        f"aggregate(sequence(1, size(__t.b)), "
        f"named_struct('r', array(__i), 'db', 0), "
        f"(__n, __j) -> named_struct("
        f"'r', concat(__n.r, array({cell})), "
        f"'db', if({cost} = 0, __j, __n.db)))"
    )
    upd_da = (
        "map_concat(map_filter(__o.da, (__k2, __v2) -> "
        "__k2 != element_at(__t.a, __i)), "
        "map(element_at(__t.a, __i), __i))"
    )
    outer = (
        f"aggregate(sequence(1, size(__t.a)), "
        f"named_struct('rows', array(sequence(0, size(__t.b))), "
        f"'da', map('', 0)), "
        f"(__o, __i) -> element_at(transform(array({inner}), __in -> "
        f"named_struct('rows', concat(__o.rows, array(__in.r)), "
        f"'da', {upd_da})), 1), "
        f"__o -> element_at(element_at(__o.rows, size(__t.a) + 1), "
        f"size(__t.b) + 1))"
    )
    return (
        f"if(char_length({s1}) = 0 or char_length({s2}) = 0, "
        f"char_length({s1}) + char_length({s2}), "
        f"element_at(transform(array(named_struct('a', {a}, 'b', {b})), "
        f"__t -> {outer}), 1))"
    )


def _point_in_polygon_sql(args: list[str]) -> str:
    """CH pointInPolygon((x, y), [(x1, y1), ...]): even-odd ray casting
    over the polygon's edges (the closing edge wraps last -> first); a
    horizontal ray from the point crosses an edge when the edge spans
    the point's y and the x intercept lies right of the point
    (tier 29)."""
    edges = (
        "transform(sequence(1, size(__t.pg)), __i -> named_struct("
        "'p', element_at(__t.pg, __i), "
        "'q', element_at(__t.pg, (__i % size(__t.pg)) + 1)))"
    )
    crossing = (
        "((__e.p._2 > __t.pt._2) != (__e.q._2 > __t.pt._2)) and "
        "__t.pt._1 < (__e.q._1 - __e.p._1) * (__t.pt._2 - __e.p._2) "
        "/ (__e.q._2 - __e.p._2) + __e.p._1"
    )
    return (
        f"element_at(transform(array(named_struct('pt', {args[0]}, "
        f"'pg', {args[1]})), __t -> cast(size(filter({edges}, "
        f"__e -> {crossing})) % 2 as tinyint)), 1)"
    )


# CH's great-circle sphere radius (meters)
_CH_EARTH_RADIUS_M = 6372797.560856


def _great_circle_distance_sql(args: list[str]) -> str:
    """CH greatCircleDistance(lon1, lat1, lon2, lat2) -> meters on the
    sphere (haversine at the radius upstream uses) (tier 29)."""
    lon1, lat1, lon2, lat2 = args[:4]
    hav = (
        f"power(sin(radians(cast({lat2} as double) "
        f"- cast({lat1} as double)) / 2), 2) "
        f"+ cos(radians(cast({lat1} as double))) "
        f"* cos(radians(cast({lat2} as double))) "
        f"* power(sin(radians(cast({lon2} as double) "
        f"- cast({lon1} as double)) / 2), 2)"
    )
    return f"({2 * _CH_EARTH_RADIUS_M} * asin(sqrt({hav})))"


def _ipv4_render(n: str) -> str:
    return (
        f"concat(cast(({n} div 16777216) % 256 as string), '.', "
        f"cast(({n} div 65536) % 256 as string), '.', "
        f"cast(({n} div 256) % 256 as string), '.', "
        f"cast({n} % 256 as string))"
    )


def _ipv4_cidr_to_range_sql(args: list[str]) -> str:
    """CH IPv4CIDRToRange(ip, prefix) -> (lowest, highest) addresses of
    the subnet, rendered dotted-quad (tier 29)."""
    num = _ipv4stringtonum_sql(args)
    mask = (f"(shiftleft(cast(4294967295 as bigint), "
            f"32 - cast({args[1]} as int)) & 4294967295)")
    lo = f"(({num}) & {mask})"
    hi = f"(({num}) | (4294967295 ^ {mask}))"
    return (
        f"named_struct('_1', {_ipv4_render(lo)}, "
        f"'_2', {_ipv4_render(hi)})"
    )


CH_SQL_TEMPLATES.update(
    {
        "dameraulevenshteindistance": _damerau_levenshtein_sql,
        # Spark's levenshtein is character-based — exactly the UTF8
        # variants' contract
        "levenshteindistanceutf8": "levenshtein({0}, {1})",
        "editdistanceutf8": "levenshtein({0}, {1})",
        "tounixtimestamp64second": "unix_seconds(cast({0} as timestamp))",
        "fromunixtimestamp64second": "timestamp_seconds(cast({0} as bigint))",
        # Spark timestamps are fixed micros: nanosecond arithmetic
        # truncates to the containing microsecond (documented domain cap)
        "addnanoseconds": (
            "timestamp_micros(unix_micros(cast({0} as timestamp)) "
            "+ cast({1} as bigint) div 1000)"
        ),
        "subtractnanoseconds": (
            "timestamp_micros(unix_micros(cast({0} as timestamp)) "
            "- cast({1} as bigint) div 1000)"
        ),
        # zip to the LONGER length, padding the short side with NULLs
        # (plain arrayZip requires equal sizes, matching CH)
        "arrayzipunaligned": (
            "transform(sequence(1, greatest(size({0}), size({1}))), "
            "__i -> named_struct('_1', element_at({0}, __i), "
            "'_2', element_at({1}, __i)))"
        ),
        "pointinpolygon": _point_in_polygon_sql,
        "greatcircledistance": _great_circle_distance_sql,
        # Java String.hashCode: h = 31*h + c over UTF-16 units (BMP
        # code points == their unit; int multiply wraps like the JVM)
        "javahash": (
            "aggregate(split({0}, ''), 0, "
            "(__h, __c) -> __h * 31 + ascii(__c))"
        ),
        "hivehash": (
            "(aggregate(split({0}, ''), 0, "
            "(__h, __c) -> __h * 31 + ascii(__c)) & 2147483647)"
        ),
        "ipv4cidrtorange": _ipv4_cidr_to_range_sql,
        "toipv4ordefault": (
            "if({0} rlike '^((25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])\\\\.)"
            "{{3}}(25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])$', {0}, "
            "'0.0.0.0')"
        ),
        "toipv6ordefault": lambda a: (
            f"if(coalesce({a[0]} rlike '{_IPV6_RE}', false), "
            f"{a[0]}, '::')"
        ),
    }
)


# ---------------------------------------------------------------------------
# Everyday tier 30: base58 codecs (full bignum long-division as JVM
# aggregates), Joda-syntax datetime formatting, random array sampling.

_BASE58_ALPHABET = (
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
)


def _base58_encode_sql(args: list[str]) -> str:
    """CH base58Encode(s): Bitcoin-alphabet base58 of the string's
    BYTES.  The value is treated as a big-endian base-256 number held as
    a digit array (hex-pair extraction, so multi-byte characters are
    byte-exact); each loop step long-divides the array by 58 and
    prepends the remainder's glyph.  One output character per step: the
    66-step unroll covers the 48-byte input cap ('Hello World!' ->
    '2NEpo7TZRRrLZSi2U', the published test vector); leading zero bytes
    render as leading '1's (tier 30)."""
    s = args[0]
    digits = (
        f"transform(sequence(1, greatest(octet_length({s}), 1)), __i -> "
        f"cast(conv(substring(hex(encode({s}, 'utf-8')), 2 * __i - 1, 2), "
        f"16, 10) as int))"
    )
    divstep = (
        "aggregate(__st.ds, named_struct('q', cast(array() as array<int>), "
        "'r', 0), (__d, __x) -> named_struct("
        "'q', concat(__d.q, array(cast((__d.r * 256 + __x) div 58 as int))), "
        "'r', cast((__d.r * 256 + __x) % 58 as int)))"
    )
    step = (
        f"if(array_max(__st.ds) = 0, __st, "
        f"element_at(transform(array({divstep}), __d -> named_struct("
        f"'ds', __d.q, "
        f"'out', concat(substring('{_BASE58_ALPHABET}', __d.r + 1, 1), "
        f"__st.out))), 1))"
    )
    loop = (
        f"aggregate(sequence(1, 66), "
        f"named_struct('ds', {digits}, 'out', ''), "
        f"(__st, __n) -> {step}, __st -> __st.out)"
    )
    zeros = (
        f"element_at(transform(array(array_position(transform({digits}, "
        f"__d -> __d != 0), true)), __p -> if(__p = 0, "
        f"octet_length({s}), cast(__p - 1 as int))), 1)"
    )
    return (
        f"if(octet_length({s}) = 0, '', "
        f"if(octet_length({s}) > 48, cast(raise_error("
        f"'base58Encode: input longer than 48 bytes') as string), "
        f"concat(repeat('1', {zeros}), {loop})))"
    )


def _base58_decode_body(s: str) -> str:
    vals = (
        f"transform(split({s}, ''), __c -> "
        f"cast(locate(__c, '{_BASE58_ALPHABET}') - 1 as int))"
    )
    mulstep = (
        "aggregate(__st.bs, named_struct('nb', cast(array() as array<int>), "
        "'c', __v), (__m, __b) -> named_struct("
        "'nb', concat(__m.nb, array(cast((__b * 58 + __m.c) % 256 as int))), "
        "'c', cast((__b * 58 + __m.c) div 256 as int)))"
    )
    step = (
        f"element_at(transform(array({mulstep}), __m -> "
        f"if(__m.c > 0, concat(__m.nb, array(__m.c)), __m.nb)), 1)"
    )
    loop = (
        f"aggregate({vals}, cast(array() as array<int>), "
        f"(__bs, __v) -> element_at(transform(array(named_struct("
        f"'bs', __bs)), __st -> {step}), 1))"
    )
    ones = (
        f"element_at(transform(array(array_position(transform(split({s}, "
        f"''), __c -> __c != '1'), true)), __p -> if(__p = 0, "
        f"char_length({s}), cast(__p - 1 as int))), 1)"
    )
    return (
        f"concat(repeat(char(0), {ones}), concat_ws('', "
        f"transform(reverse({loop}), __b -> char(__b))))"
    )


def _base58_decode_sql(args: list[str], lenient: bool = False) -> str:
    """CH base58Decode / tryBase58Decode: inverse multiply-accumulate
    into a little-endian byte array (one aggregate per input glyph);
    leading '1's restore leading zero bytes.  Bytes re-render through
    char(), so printable/Latin-1 payloads round-trip exactly; the strict
    form raises on a non-alphabet character, the try form returns ''
    (tier 30)."""
    s = args[0]
    body = _base58_decode_body(s)
    bad = (
        "''" if lenient else
        f"cast(raise_error(concat('base58Decode: invalid base58: ', "
        f"{s})) as string)"
    )
    return (
        f"if(char_length({s}) = 0, '', "
        f"if({s} rlike '^[1-9A-HJ-NP-Za-km-z]+$', {body}, {bad}))"
    )


CH_SQL_TEMPLATES.update(
    {
        "base58encode": _base58_encode_sql,
        "base58decode": lambda a: _base58_decode_sql(a, lenient=False),
        "trybase58decode": lambda a: _base58_decode_sql(a, lenient=True),
        # Spark's datetime patterns are the Joda/DateTimeFormatter
        # letters these CH functions advertise — direct mapping
        "formatdatetimeinjodasyntax": (
            "date_format(cast({0} as timestamp), {1})"
        ),
        "fromunixtimestampinjodasyntax": (
            "date_format(timestamp_seconds(cast({0} as bigint)), {1})"
        ),
        # nondeterministic (registered in the engine's cache-ineligible
        # set); k beyond the array size returns the whole shuffled array,
        # matching upstream
        "arrayrandomsample": (
            "slice(shuffle({0}), 1, least(cast({1} as int), size({0})))"
        ),
    }
)


# ---------------------------------------------------------------------------
# Everyday tier 31: categorical association measures (Cramér's V, Theil's
# U, contingency coefficient), mean z-test, Mann-Whitney U, interval
# sweeps, bounding ratio, delta sums, moving-window group arrays,
# exponential moving average — the CH aggregate-statistics surface, all
# as JVM aggregate expressions (collect-based folds where an order or a
# contingency table is needed).


def _pairs_frag(a: str, b: str) -> str:
    return (
        f"collect_list(named_struct('a', cast({a} as string), "
        f"'b', cast({b} as string)))"
    )


_CHI2_FRAG = (
    # chi-square over the contingency table derived from the collected
    # pairs: cells = distinct pairs; expected = row_total*col_total/n
    "aggregate(array_distinct(__ps), cast(0 as double), (__x2, __c) -> "
    "__x2 + element_at(transform(array(named_struct("
    "'o', cast(size(filter(__ps, __p -> __p = __c)) as double), "
    "'e', cast(size(filter(__ps, __p -> __p.a = __c.a)) as double) "
    "* size(filter(__ps, __p -> __p.b = __c.b)) / size(__ps))), "
    "__t -> (__t.o - __t.e) * (__t.o - __t.e) / __t.e), 1))"
)


def _assoc_sql(args: list[str], kind: str) -> str:
    """CH cramersV / cramersVBiasCorrected / contingency(a, b): the
    chi-square association family over the two columns' contingency
    table.  V = sqrt(chi2 / (n*(min(ka,kb)-1))); the bias-corrected form
    is Bergsma's phi2+ / min(k+-1, r+-1); contingency = sqrt(chi2/
    (chi2+n)) (tier 31)."""
    ps = _pairs_frag(args[0], args[1])
    ka = "size(array_distinct(transform(__ps, __p -> __p.a)))"
    kb = "size(array_distinct(transform(__ps, __p -> __p.b)))"
    n = "cast(size(__ps) as double)"
    if kind == "v":
        body = (
            f"sqrt(__x2 / ({n} * (least({ka}, {kb}) - 1)))"
        )
    elif kind == "bias":
        phi2c = (
            f"greatest(__x2 / {n} - cast(({ka} - 1) as double) "
            f"* ({kb} - 1) / ({n} - 1), cast(0 as double))"
        )
        kc = f"({ka} - cast(({ka} - 1) as double) * ({ka} - 1) / ({n} - 1))"
        rc = f"({kb} - cast(({kb} - 1) as double) * ({kb} - 1) / ({n} - 1))"
        body = f"sqrt({phi2c} / least({kc} - 1, {rc} - 1))"
    else:  # contingency coefficient
        body = f"sqrt(__x2 / (__x2 + {n}))"
    return (
        f"element_at(transform(array({ps}), __ps -> "
        f"element_at(transform(array({_CHI2_FRAG}), __x2 -> {body}), "
        f"1)), 1)"
    )


def _theils_u_sql(args: list[str]) -> str:
    """CH theilsU(a, b): the uncertainty coefficient U(a|b) =
    (H(a) − H(a|b)) / H(a), entropies from the collected contingency
    table (tier 31)."""
    ps = _pairs_frag(args[0], args[1])
    n = "cast(size(__ps) as double)"
    ha = (
        "aggregate(array_distinct(transform(__ps, __p -> __p.a)), "
        "cast(0 as double), (__h, __v) -> __h - "
        f"element_at(transform(array(cast(size(filter(__ps, "
        f"__p -> __p.a = __v)) as double) / {n}), __f -> "
        "__f * ln(__f)), 1))"
    )
    # H(a|b) = -sum_ab p_ab * ln(p_ab / p_b)
    hab = (
        "aggregate(array_distinct(__ps), cast(0 as double), "
        "(__h, __c) -> __h - element_at(transform(array(named_struct("
        f"'pab', cast(size(filter(__ps, __p -> __p = __c)) as double) "
        f"/ {n}, "
        f"'pb', cast(size(filter(__ps, __p -> __p.b = __c.b)) "
        f"as double) / {n})), "
        "__t -> __t.pab * ln(__t.pab / __t.pb)), 1))"
    )
    return (
        f"element_at(transform(array({ps}), __ps -> "
        f"element_at(transform(array({ha}), __ha -> "
        f"if(__ha = 0, cast(0 as double), (__ha - ({hab})) / __ha)), "
        f"1)), 1)"
    )


def _mean_ztest_sql(p: list[str], a: list[str]) -> str:
    """CH meanZTest(pop_var_x, pop_var_y, conf)(value, sample_index):
    two-sample z-test on means with KNOWN population variances.
    Returns (z_statistic, p_value, ci_low, ci_high) — p two-sided via
    erfc, CI on the mean difference at conf (tier 31)."""
    vx, vy, conf = (f"cast({x} as double)" for x in p[:3])
    v, g = a[0], a[1]
    mx = f"avg(if(cast({g} as int) = 0, cast({v} as double), null))"
    my = f"avg(if(cast({g} as int) = 1, cast({v} as double), null))"
    nx = f"sum(if(cast({g} as int) = 0, 1, 0))"
    ny = f"sum(if(cast({g} as int) = 1, 1, 0))"
    se = f"sqrt({vx} / ({nx}) + {vy} / ({ny}))"
    zq = _norm_quantile_frag(f"(1.0 + {conf}) / 2.0")
    pval = _erfc_frag("abs(__z) / sqrt(2.0)")
    return (
        f"element_at(transform(array((({mx}) - ({my})) / {se}), __z -> "
        f"named_struct('_1', __z, '_2', {pval}, "
        f"'_3', ({mx}) - ({my}) - ({zq}) * {se}, "
        f"'_4', ({mx}) - ({my}) + ({zq}) * {se})), 1)"
    )


def _mann_whitney_sql(args: list[str]) -> str:
    """CH mannWhitneyUTest(value, sample_index): rank-sum test.  U for
    sample 0 from midranks (ties averaged), z against the tie-corrected
    normal approximation, two-sided p via erfc — the same large-sample
    approximation upstream documents.  Midranks come from per-distinct-
    value counts (O(d·n), never O(n²)) (tier 31)."""
    v, g = args[0], args[1]
    ps = (
        f"collect_list(named_struct('v', cast({v} as double), "
        f"'g', cast({g} as int)))"
    )
    # per distinct value: less-than count, tie count, sample-0 tie count
    cell = (
        "named_struct("
        "'lt', cast(size(filter(__ps, __p -> __p.v < __u)) as double), "
        "'eq', cast(size(filter(__ps, __p -> __p.v = __u)) as double), "
        "'e0', cast(size(filter(__ps, __p -> __p.v = __u and __p.g = 0)) "
        "as double))"
    )
    # R1 = sum over values of midrank(value) * (#sample-0 ties at value);
    # tiesum = sum (t^3 - t) for the tie-corrected sigma
    fold = (
        f"aggregate(array_distinct(transform(__ps, __p -> __p.v)), "
        f"named_struct('r1', cast(0 as double), "
        f"'ts', cast(0 as double)), "
        f"(__s, __u) -> element_at(transform(array({cell}), __c -> "
        f"named_struct("
        f"'r1', __s.r1 + (__c.lt + (__c.eq + 1) / 2) * __c.e0, "
        f"'ts', __s.ts + __c.eq * __c.eq * __c.eq - __c.eq)), 1))"
    )
    n1 = "cast(size(filter(__ps, __p -> __p.g = 0)) as double)"
    n2 = "cast(size(filter(__ps, __p -> __p.g != 0)) as double)"
    nn = "cast(size(__ps) as double)"
    u = f"(__f.r1 - {n1} * ({n1} + 1) / 2)"
    mu = f"({n1} * {n2} / 2)"
    sig = (
        f"sqrt({n1} * {n2} / 12 * (({nn} + 1) "
        f"- __f.ts / ({nn} * ({nn} - 1))))"
    )
    pval = _erfc_frag("abs(__z) / sqrt(2.0)")
    return (
        f"element_at(transform(array({ps}), __ps -> "
        f"element_at(transform(array({fold}), __f -> "
        f"element_at(transform(array(({u} - {mu}) / {sig}), __z -> "
        f"named_struct('_1', {u}, '_2', {pval})), 1)), 1)), 1)"
    )


def _interval_length_sum_sql(args: list[str]) -> str:
    """CH intervalLengthSum(start, end): total length of the UNION of
    the per-group intervals — sort by start, sweep with a cover-end
    accumulator so overlaps never double-count (order-independent)
    (tier 31)."""
    ivs = (
        f"array_sort(collect_list(named_struct("
        f"'s', cast({args[0]} as double), 'e', cast({args[1]} as double))))"
    )
    # covered contribution: max(0, e - max(s, cover_end))
    step = (
        "named_struct("
        "'c', greatest(__a.c, __iv.e), "
        "'t', __a.t + greatest(__iv.e - greatest(__iv.s, __a.c), "
        "cast(0 as double)))"
    )
    return (
        f"aggregate({ivs}, named_struct("
        f"'c', cast(-1e308 as double), 't', cast(0 as double)), "
        f"(__a, __iv) -> {step}, __a -> __a.t)"
    )


def _ema_sql(p: list[str], a: list[str]) -> str:
    """CH exponentialMovingAverage(half_decay)(value, time): fold over
    the time-sorted points; both the value sum and the weight sum decay
    by half every `half_decay` time units between points, so the result
    is order-independent (tier 31)."""
    h = f"cast({p[0]} as double)"
    pts = (
        f"array_sort(collect_list(named_struct("
        f"'t', cast({a[1]} as double), 'v', cast({a[0]} as double))))"
    )
    decay = f"pow(0.5, (__p.t - __s.t) / {h})"
    step = (
        f"named_struct('t', __p.t, "
        f"'s', __s.s * {decay} + __p.v, "
        f"'w', __s.w * {decay} + 1.0)"
    )
    return (
        f"aggregate({pts}, named_struct('t', cast(0 as double), "
        f"'s', cast(0 as double), 'w', cast(0 as double)), "
        f"(__s, __p) -> {step}, __s -> __s.s / __s.w)"
    )


CH_SQL_TEMPLATES.update(
    {
        "cramersv": lambda a: _assoc_sql(a, "v"),
        "cramersvbiascorrected": lambda a: _assoc_sql(a, "bias"),
        "contingency": lambda a: _assoc_sql(a, "c"),
        "theilsu": _theils_u_sql,
        "mannwhitneyutest": _mann_whitney_sql,
        "intervallengthsum": _interval_length_sum_sql,
        # slope between the leftmost and rightmost points (by x)
        "boundingratio": (
            "((max_by(cast({1} as double), cast({0} as double)) "
            "- min_by(cast({1} as double), cast({0} as double))) "
            "/ (max(cast({0} as double)) - min(cast({0} as double))))"
        ),
        # sum of positive steps between consecutive collected values
        # (insertion-order dependent, exactly as upstream documents)
        "deltasum": (
            "aggregate(collect_list(cast({0} as double)), "
            "named_struct('p', cast(null as double), "
            "'s', cast(0 as double)), (__a, __x) -> named_struct("
            "'p', __x, 's', __a.s + if(__a.p is not null "
            "and __x > __a.p, __x - __a.p, cast(0 as double))), "
            "__a -> __a.s)"
        ),
        # running-total array over the collected order
        "grouparraymovingsum": (
            "element_at(transform(array(collect_list("
            "cast({0} as double))), __xs -> transform("
            "sequence(1, size(__xs)), __i -> aggregate(slice(__xs, 1, "
            "__i), cast(0 as double), (__a, __x) -> __a + __x))), 1)"
        ),
        "grouparraymovingavg": (
            "element_at(transform(array(collect_list("
            "cast({0} as double))), __xs -> transform("
            "sequence(1, size(__xs)), __i -> aggregate(slice(__xs, 1, "
            "__i), cast(0 as double), (__a, __x) -> __a + __x) "
            "/ __i)), 1)"
        ),
    }
)


# ---------------------------------------------------------------------------
# Everyday tier 32: the CH event-sequence aggregate family — windowFunnel,
# retention, sequenceMatch, sequenceCount — as collect-sort-fold JVM
# aggregates (the reference's runtime has none of these; upstream CH's
# algorithm is mirrored step for step and re-implemented independently in
# the DuckDB oracle via list_reduce with list-encoded state).


def _window_funnel_strict_sql(
    w: str, ts: str, conds: list[str], modes: set[str]
) -> str:
    """The strict-mode windowFunnel fold (tier 36): state is an array
    of (chain_start, last_match) per level plus a frozen flag; in
    'strict_order' mode rows matching NO condition enter the buffer as
    level-0 chain breakers.  See _window_funnel_sql for the mode
    contracts."""
    n = len(conds)
    matched = "filter(array(" + ", ".join(
        f"named_struct('t', {ts}, 'i', {k + 1}, "
        f"'c', coalesce(cast({c} as boolean), false))"
        for k, c in enumerate(conds)
    ) + "), __e -> __e.c)"
    mapped = (
        f"transform({matched}, __e -> "
        f"named_struct('t', __e.t, 'i', __e.i))"
    )
    if "strict_order" in modes:
        per_row = (
            f"(case when size({matched}) = 0 then "
            f"array(named_struct('t', {ts}, 'i', 0)) "
            f"else {mapped} end)"
        )
    else:
        per_row = mapped
    pairs = f"array_sort(flatten(collect_list({per_row})))"
    prev = "element_at(__s.a, __e.i - 1)"
    adv1 = "true"
    if "strict_order" in modes:
        adv1 = "__L.L = 0"
    if "strict_dedup" in modes:
        adv1 = f"({adv1}) and __L.L < 1"
    advk = (
        f"{prev}.st is not null and __e.t <= {prev}.st + {w}"
    )
    if "strict_increase" in modes:
        advk += f" and __e.t > {prev}.lt"
    if "strict_order" in modes:
        advk += " and __e.i = __L.L + 1"
    if "strict_dedup" in modes:
        advk += " and __e.i > __L.L"
    ok = (
        f"(case when __e.i = 1 then {adv1} "
        f"when __e.i > 1 then {advk} else false end)"
    )
    freezes = []
    if "strict_order" in modes:
        freezes.append("(__L.L >= 1 and not __o.ok)")
    if "strict_dedup" in modes:
        freezes.append("(__e.i >= 1 and __e.i <= __L.L)")
    freeze = " or ".join(freezes) if freezes else "false"
    newa = (
        f"transform(sequence(1, {n}), __k -> "
        f"if(__k = __e.i, if(__e.i = 1, "
        f"named_struct('st', __e.t, 'lt', __e.t), "
        f"named_struct('st', {prev}.st, 'lt', __e.t)), "
        f"element_at(__s.a, __k)))"
    )
    upd = (
        f"element_at(transform(array(named_struct('L', "
        f"size(filter(__s.a, __x -> __x.st is not null)))), __L -> "
        f"element_at(transform(array(named_struct('ok', {ok})), __o -> "
        f"case when __s.fz then __s "
        f"when __o.ok then named_struct('a', {newa}, 'fz', false) "
        f"when {freeze} then named_struct('a', __s.a, 'fz', true) "
        f"else __s end), 1)), 1)"
    )
    init = (
        f"named_struct('a', transform(sequence(1, {n}), __k -> "
        f"named_struct('st', cast(null as double), "
        f"'lt', cast(null as double))), 'fz', false)"
    )
    return (
        f"aggregate({pairs}, {init}, (__s, __e) -> {upd}, "
        f"__s -> cast(size(filter(__s.a, __x -> __x.st is not null)) "
        f"as int))"
    )


def _window_funnel_sql(p: list[str], a: list[str]) -> str:
    """CH windowFunnel(window)(timestamp, cond1, ..., condN): the length
    of the longest event chain where each level's event lands within
    `window` of the CHAIN START, mirroring upstream's algorithm exactly:
    events sorted by (time, level); a level-1 event (re)starts a chain
    (overwriting), level k>1 is set to the chain start when level k-1 is
    set and t <= start + window; the answer is the count of set levels
    (contiguous by construction) (tier 32).

    Strict modes (tier 36, dialect-defined contracts pinned by unit
    goldens — upstream documents the strict_order A->B->D->C example,
    which this matches): 'strict_increase' — a level only advances when
    its timestamp strictly exceeds the previous level's MATCHED event
    time; 'strict_dedup' — an event repeating a condition already in
    the chain (level <= current chain length) interrupts further
    processing (the chain freezes at its current length);
    'strict_order' — once a chain has started, any event that does not
    successfully advance it (including events matching no condition)
    freezes it."""
    modes = set()
    for mp in p[1:]:
        mode = mp.strip().strip("'\"").lower()
        if mode not in (
            "strict_order", "strict_dedup", "strict_increase"
        ):
            raise ValueError(f"windowFunnel: unknown mode {mp!r}")
        modes.add(mode)
    w = f"cast({p[0]} as double)"
    ts = f"cast(cast({a[0]} as timestamp) as double)"
    conds = a[1:]
    if not conds:
        raise ValueError("windowFunnel needs at least one condition")
    n = len(conds)
    if modes:
        return _window_funnel_strict_sql(w, ts, conds, modes)
    per_row = "filter(array(" + ", ".join(
        f"named_struct('t', {ts}, 'i', {k + 1}, "
        f"'c', coalesce(cast({c} as boolean), false))"
        for k, c in enumerate(conds)
    ) + "), __e -> __e.c)"
    per_row = (
        f"transform({per_row}, __e -> "
        f"named_struct('t', __e.t, 'i', __e.i))"
    )
    pairs = f"array_sort(flatten(collect_list({per_row})))"
    upd = (
        f"transform(sequence(1, {n}), __k -> "
        f"if(__e.i = 1 and __k = 1, __e.t, "
        f"if(__e.i = __k and __k > 1 "
        f"and element_at(__s, __k - 1) is not null "
        f"and __e.t <= element_at(__s, __k - 1) + {w}, "
        f"element_at(__s, __k - 1), element_at(__s, __k))))"
    )
    init = f"transform(sequence(1, {n}), __k -> cast(null as double))"
    return (
        f"aggregate({pairs}, {init}, (__s, __e) -> {upd}, "
        f"__s -> cast(size(filter(__s, __x -> __x is not null)) as int))"
    )


def _retention_sql(args: list[str]) -> str:
    """CH retention(cond1, ..., condN): r[1] = cond1 ever held in the
    group; r[k] = cond1 AND condk each held (on any rows) (tier 32)."""
    if not args:
        raise ValueError("retention needs at least one condition")
    m = [
        f"max(if(coalesce(cast({c} as boolean), false), 1, 0))"
        for c in args
    ]
    parts = [f"cast({m[0]} as tinyint)"] + [
        f"cast(least({m[0]}, {mk}) as tinyint)" for mk in m[1:]
    ]
    return "array(" + ", ".join(parts) + ")"


def _parse_seq_pattern(
    pat: str, n_conds: int
) -> list[tuple[int, str | None, float | None]]:
    """The supported sequenceMatch pattern subset: (?N) steps separated
    by '.*' and/or a max-gap time constraint '(?t<=N)' / '(?t<N)'
    (tier 36) — the constraint bounds the gap between the events
    matching the two neighboring steps.  Returns (cond_idx, op, val)
    per step; op/val describe the constraint BEFORE that step.
    Min-gap constraints ((?t>=N) / (?t>N) / (?t==N)) and bare step
    adjacency are rejected loudly rather than silently mis-matched:
    the latest-feasible-time DP this compiles to is exact only for
    max-gap constraints."""
    s = pat.strip().strip("'\"")
    out: list[tuple[int, str | None, float | None]] = []
    i = 0
    sep = False  # a separator ('.*' or constraint) since the last step
    op: str | None = None
    val: float | None = None
    while i < len(s):
        if s.startswith(".*", i):
            i += 2
            sep = True
            continue
        mt = _re.match(r"\(\?t(<=|<|>=|>|==)(\d+(?:\.\d+)?)\)", s[i:])
        if mt:
            if mt.group(1) not in ("<=", "<"):
                raise ValueError(
                    f"sequenceMatch: time constraint "
                    f"'(?t{mt.group(1)}{mt.group(2)})' is not "
                    "supported — only max-gap '<=' and '<' are"
                )
            if not out:
                raise ValueError(
                    "sequenceMatch: a time constraint cannot precede "
                    "the first step"
                )
            if op is not None:
                raise ValueError(
                    "sequenceMatch: multiple time constraints between "
                    "two steps are not supported"
                )
            op, val = mt.group(1), float(mt.group(2))
            i += mt.end()
            sep = True
            continue
        m = _re.match(r"\(\?(\d+)\)", s[i:])
        if not m:
            raise ValueError(
                f"sequenceMatch: unsupported pattern {pat!r} — only "
                "'(?N)' steps separated by '.*' or '(?t<=N)' are "
                "supported"
            )
        if out and not sep:
            raise ValueError(
                "sequenceMatch: adjacent steps (no '.*' or time "
                "constraint) are not supported"
            )
        idx = int(m.group(1))
        if not (1 <= idx <= n_conds):
            raise ValueError(
                f"sequenceMatch: (?{idx}) has no matching condition"
            )
        out.append((idx, op, val))
        op, val, sep = None, None, False
        i += m.end()
    if op is not None:
        raise ValueError(
            "sequenceMatch: a trailing time constraint has no "
            "following step"
        )
    if not out:
        raise ValueError(f"sequenceMatch: empty pattern {pat!r}")
    return out


def _sequence_dp_sql(
    parsed: list[tuple[int, str | None, float | None]],
    rows: str,
    count: bool,
) -> str:
    """Latest-feasible-time DP for time-constrained sequence patterns
    (tier 36): slot k = latest event time completing pattern prefix k
    (null if unreachable); every slot updates simultaneously from the
    pre-event state, so one row still advances at most one position.
    The Count form increments and fully resets when the final slot
    fires (non-overlapping matches, like the unconstrained cursor)."""
    m = len(parsed)

    def slot_expr(state: str, k: int) -> str:
        idx, op, val = parsed[k - 1]
        hit = f"element_at(__e.bs, {idx})"
        if k == 1:
            return f"if({hit}, __e.t, element_at({state}, 1))"
        prev = f"element_at({state}, {k - 1})"
        gate = f"{hit} and {prev} is not null"
        if op is not None:
            gate += f" and __e.t - {prev} {op} {val!r}d"
        return f"if({gate}, __e.t, element_at({state}, {k}))"

    init_slots = ", ".join("cast(null as double)" for _ in range(m))
    if count:
        slots = ", ".join(slot_expr("__s.p", k) for k in range(1, m + 1))
        idx_m, op_m, val_m = parsed[-1]
        fire = f"element_at(__e.bs, {idx_m})"
        if m > 1:
            prev_m = f"element_at(__s.p, {m - 1})"
            fire += f" and {prev_m} is not null"
            if op_m is not None:
                fire += f" and __e.t - {prev_m} {op_m} {val_m!r}d"
        upd = (
            f"if({fire}, named_struct('p', array({init_slots}), "
            f"'n', __s.n + 1), named_struct('p', array({slots}), "
            f"'n', __s.n))"
        )
        return (
            f"aggregate({rows}, named_struct('p', array({init_slots}), "
            f"'n', 0), (__s, __e) -> {upd}, "
            f"__s -> cast(__s.n as bigint))"
        )
    slots = ", ".join(slot_expr("__s", k) for k in range(1, m + 1))
    return (
        f"aggregate({rows}, array({init_slots}), "
        f"(__s, __e) -> array({slots}), "
        f"__s -> cast(if(element_at(__s, {m}) is not null, 1, 0) "
        f"as tinyint))"
    )


def _sequence_fold_sql(p: list[str], a: list[str], count: bool) -> str:
    """CH sequenceMatch / sequenceCount('(?1).*(?2)')(ts, cond1, ...):
    subsequence search over time-ordered events.  Each ROW is one event
    carrying its condition bitmask (one row advances at most one pattern
    position, exactly like upstream); a cursor walks the pattern and, in
    the Count form, restarts after each complete (non-overlapping) match
    (tier 32).  With '(?t<=N)' max-gap constraints (tier 36) the cursor
    becomes a latest-feasible-time DP: slot i holds the LATEST event
    time at which pattern prefix i can be completed — exact for max-gap
    constraints, where a later prefix completion is always at least as
    extendable as an earlier one (a plain greedy cursor would wrongly
    reject e.g. A@0 A@95 B@100 for '(?1)(?t<=10)(?2)')."""
    parsed = _parse_seq_pattern(p[0], len(a) - 1)
    steps = [s[0] for s in parsed]
    ts = f"cast(cast({a[0]} as timestamp) as double)"
    bits = ", ".join(
        f"coalesce(cast({c} as boolean), false)" for c in a[1:]
    )
    rows = (
        f"array_sort(collect_list(named_struct('t', {ts}, "
        f"'bs', array({bits}))))"
    )
    m = len(steps)
    step_arr = "array(" + ", ".join(str(s) for s in steps) + ")"
    if any(op is not None for _, op, _v in parsed):
        return _sequence_dp_sql(parsed, rows, count)
    if not count and steps == [1, 2]:
        # the historic single-pass fast path: '(?1).*(?2)' needs no
        # collected buffer at all — min(ts | c1) < max(ts | c2) in one
        # aggregation (scale-optimal; the fold below buffers the group)
        return (
            f"cast({_sequence_match_tmpl(p, a)} as tinyint)"
        )
    if count:
        # state = (cursor, completed-count); full match restarts
        upd = (
            f"if(element_at(__e.bs, element_at({step_arr}, __s.c + 1)), "
            f"if(__s.c + 1 = {m}, named_struct('c', 0, 'n', __s.n + 1), "
            f"named_struct('c', __s.c + 1, 'n', __s.n)), __s)"
        )
        return (
            f"aggregate({rows}, named_struct('c', 0, 'n', 0), "
            f"(__s, __e) -> {upd}, "
            f"__s -> cast(__s.n as bigint))"
        )
    upd = (
        f"if(__s < {m} and element_at(__e.bs, "
        f"element_at({step_arr}, __s + 1)), __s + 1, __s)"
    )
    return (
        f"aggregate({rows}, 0, (__s, __e) -> {upd}, "
        f"__s -> cast(if(__s = {m}, 1, 0) as tinyint))"
    )


CH_SQL_TEMPLATES.update({"retention": _retention_sql})


CH_PARAMETRIC_TEMPLATES.update(
    {
        "windowfunnel": _window_funnel_sql,
        "sequencematch": lambda p, a: _sequence_fold_sql(p, a, False),
        "sequencecount": lambda p, a: _sequence_fold_sql(p, a, True),
    }
)


CH_PARAMETRIC_TEMPLATES.update(
    {
        "meanztest": _mean_ztest_sql,
        "exponentialmovingaverage": _ema_sql,
        # Greenwald-Khanna sketch quantile -> Spark's approx_percentile
        # with the same accuracy knob
        "quantilegk": lambda p, a: (
            f"approx_percentile({a[0]}, "
            f"{p[1] if len(p) > 1 else '0.5'}, {p[0]})"
        ),
        # last n collected elements (collection order)
        "grouparraylast": lambda p, a: (
            f"element_at(transform(array(collect_list({a[0]})), __xs -> "
            f"slice(__xs, greatest(size(__xs) - cast({p[0]} as int) + 1, "
            f"1), least(cast({p[0]} as int), size(__xs)))), 1)"
        ),
        # windowed forms: groupArrayMovingSum(w)(x) sums the trailing w
        # collected elements at each position
        "grouparraymovingsum": lambda p, a: (
            f"element_at(transform(array(collect_list("
            f"cast({a[0]} as double))), __xs -> transform("
            f"sequence(1, size(__xs)), __i -> aggregate(slice(__xs, "
            f"greatest(__i - cast({p[0]} as int) + 1, 1), "
            f"least(cast({p[0]} as int), __i)), cast(0 as double), "
            f"(__a, __x) -> __a + __x))), 1)"
        ),
        "grouparraymovingavg": lambda p, a: (
            f"element_at(transform(array(collect_list("
            f"cast({a[0]} as double))), __xs -> transform("
            f"sequence(1, size(__xs)), __i -> aggregate(slice(__xs, "
            f"greatest(__i - cast({p[0]} as int) + 1, 1), "
            f"least(cast({p[0]} as int), __i)), cast(0 as double), "
            f"(__a, __x) -> __a + __x) "
            f"/ least(cast({p[0]} as int), __i))), 1)"
        ),
    }
)


# ---------------------------------------------------------------------------
# Everyday tier 33: timezone conversion shims, date interval arithmetic,
# UTF8-aware prefix/suffix with CH's negative-length semantics, variadic
# array set algebra, human-readable size parsing, and the filtered /
# single-value aggregate helpers.  All pure JVM built-in expressions.


def _left_utf8_sql(args: list[str]) -> str:
    """CH leftUTF8(s, n): first n characters; a NEGATIVE n keeps all but
    the last |n| (Spark's left() returns '' for negative lengths, so the
    negative branch is spelled out) (tier 33)."""
    s, n = args[0], args[1]
    return (
        f"(case when ({n}) < 0 then substring({s}, 1, "
        f"greatest(char_length({s}) + ({n}), 0)) "
        f"else left({s}, {n}) end)"
    )


def _right_utf8_sql(args: list[str]) -> str:
    """CH rightUTF8(s, n): last n characters; a NEGATIVE n keeps all but
    the first |n| (tier 33)."""
    s, n = args[0], args[1]
    return (
        f"(case when ({n}) < 0 then substring({s}, "
        f"least(-({n}) + 1, char_length({s}) + 1)) "
        f"else right({s}, {n}) end)"
    )


def _array_union_sql(args: list[str]) -> str:
    """CH arrayUnion(a1, ..., aN): distinct union, variadic (Spark's
    array_union is binary — fold pairwise) (tier 33)."""
    if not args:
        raise ValueError("arrayUnion needs at least one array")
    if len(args) == 1:
        return f"array_distinct({args[0]})"
    out = args[0]
    for a in args[1:]:
        out = f"array_union({out}, {a})"
    return out


def _array_symdiff_sql(args: list[str]) -> str:
    """CH arraySymmetricDifference(a1, ..., aN): elements present in at
    least one argument but NOT in all of them (upstream's N-ary
    definition, not the binary XOR) (tier 33)."""
    if not args:
        raise ValueError("arraySymmetricDifference needs arrays")
    if len(args) == 1:
        return f"filter(array_distinct({args[0]}), __x -> false)"
    union = args[0]
    for a in args[1:]:
        union = f"array_union({union}, {a})"
    in_all = " and ".join(f"array_contains({a}, __x)" for a in args)
    return f"filter({union}, __x -> not ({in_all}))"


_READABLE_SIZE_RE = (
    r"^\\s*([0-9]+(?:\\.[0-9]+)?)\\s*((?i)[kmgtpe]i?b|b)\\s*$"
)


def _parse_readable_size_expr(arg: str) -> str:
    """The shared bytes-or-null core of parseReadableSize*: extract the
    numeric part and the unit, map binary (KiB..EiB) and decimal
    (KB..EB) unit ladders, ceil to whole bytes like upstream
    (tier 33)."""
    num = f"try_cast(regexp_extract({arg}, '{_READABLE_SIZE_RE}', 1) as double)"
    unit = f"lower(regexp_extract({arg}, '{_READABLE_SIZE_RE}', 2))"
    mult = (
        f"(case {unit} when 'b' then 1.0 "
        f"when 'kib' then 1024.0 when 'kb' then 1000.0 "
        f"when 'mib' then 1048576.0 when 'mb' then 1e6 "
        f"when 'gib' then 1073741824.0 when 'gb' then 1e9 "
        f"when 'tib' then 1099511627776.0 when 'tb' then 1e12 "
        f"when 'pib' then 1125899906842624.0 when 'pb' then 1e15 "
        f"when 'eib' then 1152921504606846976.0 when 'eb' then 1e18 "
        f"end)"
    )
    return f"cast(ceil(({num}) * ({mult})) as bigint)"


def _parse_readable_size_sql(args: list[str]) -> str:
    """parseReadableSize(s): strict — raises on an unparseable non-NULL
    input, mirroring upstream's CANNOT_PARSE (tier 33)."""
    core = _parse_readable_size_expr(args[0])
    return (
        f"(case when ({core}) is null and ({args[0]}) is not null "
        f"then cast(raise_error(concat('Cannot parse readable size: ', "
        f"cast({args[0]} as string))) as bigint) else ({core}) end)"
    )


def _sum_map_filtered_sql(p: list[str], a: list[str]) -> str:
    """sumMapFiltered(keys)(m): sumMap restricted to the given key list —
    the filter runs per-entry BEFORE the fold so dropped keys never
    enter the buffer (tier 33)."""
    keys, m = p[0], a[0]
    ent = (
        f"filter(map_entries({m}), __q -> array_contains({keys}, __q.key))"
    )
    return (
        f"element_at(transform(array(flatten(collect_list({ent}))), "
        f"__ps -> named_struct("
        f"'_1', array_sort(array_distinct(transform(__ps, __p -> __p.key))), "
        f"'_2', transform(array_sort(array_distinct(transform(__ps, __p -> __p.key))), "
        f"__k -> aggregate(filter(__ps, __p -> __p.key <=> __k), "
        f"cast(0.0 as double), (__a, __p) -> __a + __p.value)))), 1)"
    )


CH_SQL_TEMPLATES.update(
    {
        # timezone conversion: interpret ts as wall-clock in tz -> UTC
        # instant, and back (session tz is pinned to UTC in session.py)
        "toutctimestamp": "to_utc_timestamp({0}, {1})",
        "fromutctimestamp": "from_utc_timestamp({0}, {1})",
        # CH snake-case alias of dateDiff
        "date_diff": _datediff_sql,
        # addDate/subDate(date, INTERVAL n unit)
        "adddate": "({0} + {1})",
        "subdate": "({0} - {1})",
        "leftutf8": _left_utf8_sql,
        "rightutf8": _right_utf8_sql,
        "positivemodulo": "pmod({0}, {1})",
        "positive_modulo": "pmod({0}, {1})",
        "regexpextract": lambda args: (
            f"regexp_extract({', '.join(args)})"
        ),
        "arrayunion": _array_union_sql,
        "arraysymmetricdifference": _array_symdiff_sql,
        "parsereadablesize": _parse_readable_size_sql,
        "parsereadablesizeornull": lambda args: (
            _parse_readable_size_expr(args[0])
        ),
        "parsereadablesizeorzero": lambda args: (
            f"coalesce({_parse_readable_size_expr(args[0])}, cast(0 as bigint))"
        ),
        "singlevalueornull": (
            "(case when count(distinct {0}) = 1 then max({0}) end)"
        ),
    }
)


CH_PARAMETRIC_TEMPLATES.update({"summapfiltered": _sum_map_filtered_sql})


# ---------------------------------------------------------------------------
# Everyday tier 34: ordered and time-decayed aggregates — Spearman rank
# correlation with average-rank ties, timestamp-ordered positive-delta sums,
# the exponentialTimeDecayed* family (decay measured back from the group's
# latest time point), Excel-style exclusive/inclusive exact quantiles, and
# group-wide array intersection.  All collect-sort-fold JVM aggregates under
# the per-group analytics contract of quantileExact/topK (corpus-scale rank
# work belongs in the pipeline's relational operators).


def _rank_corr_sql(args: list[str]) -> str:
    """rankCorr(x, y): Spearman rank correlation with average ranks for
    ties — rank vectors are built against the group's sorted values
    (min-rank via array_position plus half the tie span), then Pearson's
    formula runs over the two rank arrays (tier 34)."""
    x, y = args
    pairs = (
        f"array(collect_list(named_struct('x', cast({x} as double), "
        f"'y', cast({y} as double))))"
    )

    def rank_arr(fld: str) -> str:
        vals = f"transform(__ps, __p -> __p.{fld})"
        return (
            f"transform(__ps, __p -> "
            f"cast(array_position(array_sort({vals}), __p.{fld}) as double) "
            f"+ (size(filter({vals}, __v -> __v = __p.{fld})) - 1) / 2.0)"
        )

    acc = "cast(0.0 as double), (__a, __v) -> __a + __v"
    return (
        f"element_at(transform({pairs}, __ps -> "
        f"element_at(transform(array(named_struct("
        f"'rx', {rank_arr('x')}, 'ry', {rank_arr('y')})), __r -> "
        f"(size(__r.rx) * aggregate(zip_with(__r.rx, __r.ry, "
        f"(__a, __b) -> __a * __b), {acc}) "
        f"- aggregate(__r.rx, {acc}) * aggregate(__r.ry, {acc})) "
        f"/ sqrt((size(__r.rx) * aggregate(transform(__r.rx, "
        f"__v -> __v * __v), {acc}) - aggregate(__r.rx, {acc}) "
        f"* aggregate(__r.rx, {acc})) "
        f"* (size(__r.ry) * aggregate(transform(__r.ry, "
        f"__v -> __v * __v), {acc}) - aggregate(__r.ry, {acc}) "
        f"* aggregate(__r.ry, {acc})))), 1)), 1)"
    )


def _delta_sum_timestamp_sql(args: list[str]) -> str:
    """deltaSumTimestamp(v, t): sum of positive value deltas with rows
    ordered by timestamp — the timestamp-keyed variant upstream adds so
    merges of pre-aggregated states stay order-correct (tier 34)."""
    v, t = args
    pairs = (
        f"array_sort(collect_list(named_struct("
        f"'t', cast(cast({t} as timestamp) as double), "
        f"'v', cast({v} as double))))"
    )
    return (
        f"aggregate({pairs}, "
        f"named_struct('s', cast(0.0 as double), "
        f"'p', cast(null as double)), "
        f"(__s, __e) -> named_struct('s', __s.s + "
        f"(case when __s.p is not null and __e.v > __s.p "
        f"then __e.v - __s.p else 0.0 end), 'p', __e.v), "
        f"__s -> __s.s)"
    )


def _exp_time_decayed_sql(kind: str):
    """exponentialTimeDecayed{Sum,Count,Avg,Max}(lambda)(v, t): each
    value weighted by exp((t_i - t_latest) / lambda) with t_latest the
    group's maximum time index — the plain-aggregate reading of
    upstream's window family, decaying every point back from the most
    recent one (tier 34)."""

    def _f(p: list[str], a: list[str]) -> str:
        lam = f"cast({p[0]} as double)"
        v = f"cast({a[0]} as double)"
        t = f"cast(cast({a[1]} as timestamp) as double)"
        # sorted buffer -> deterministic fold order for the double sums
        # (collect_list order is partition-dependent)
        pairs = (
            f"array(array_sort(collect_list(named_struct('v', {v}, "
            f"'t', {t}))))"
        )
        tm = "array_max(transform(__ps, __p -> __p.t))"
        w = f"exp((__p.t - {tm}) / {lam})"
        ssum = (
            f"aggregate(__ps, cast(0.0 as double), "
            f"(__a, __p) -> __a + __p.v * {w})"
        )
        scnt = (
            f"aggregate(__ps, cast(0.0 as double), "
            f"(__a, __p) -> __a + {w})"
        )
        if kind == "sum":
            body = ssum
        elif kind == "count":
            body = scnt
        elif kind == "avg":
            body = f"({ssum}) / ({scnt})"
        else:  # max
            body = f"array_max(transform(__ps, __p -> __p.v * {w}))"
        return f"element_at(transform({pairs}, __ps -> {body}), 1)"

    return _f


def _quantile_exact_exclusive_sql(p: list[str], a: list[str]) -> str:
    """quantileExactExclusive(p)(x): Excel PERCENTILE.EXC — h = p(n+1)
    over the sorted values, linear interpolation, clamped to the ends
    (tier 34)."""
    q = f"cast({p[0]} as double)"
    xs = f"array(array_sort(collect_list(cast({a[0]} as double))))"
    h = f"({q} * (size(__xs) + 1))"
    return (
        f"element_at(transform({xs}, __xs -> "
        f"element_at(transform(array(named_struct("
        f"'h', {h}, 'k', cast(floor({h}) as int), 'n', size(__xs))), "
        f"__q -> case when __q.n = 0 then cast(null as double) "
        f"when __q.k < 1 then element_at(__xs, 1) "
        f"when __q.k >= __q.n then element_at(__xs, __q.n) "
        f"else element_at(__xs, __q.k) + (__q.h - __q.k) "
        f"* (element_at(__xs, __q.k + 1) - element_at(__xs, __q.k)) "
        f"end), 1)), 1)"
    )


def _group_array_intersect_sql(args: list[str]) -> str:
    """groupArrayIntersect(arr): intersection of every array in the
    group, returned sorted for a deterministic distributed result
    (upstream's order is unspecified) (tier 34)."""
    lists = f"array(collect_list({args[0]}))"
    return (
        f"element_at(transform({lists}, __ls -> "
        f"array_sort(aggregate(slice(__ls, 2, size(__ls) - 1), "
        f"array_distinct(element_at(__ls, 1)), "
        f"(__a, __x) -> array_intersect(__a, __x)))), 1)"
    )


CH_SQL_TEMPLATES.update(
    {
        "rankcorr": _rank_corr_sql,
        "deltasumtimestamp": _delta_sum_timestamp_sql,
        "grouparrayintersect": _group_array_intersect_sql,
    }
)


CH_PARAMETRIC_TEMPLATES.update(
    {
        "exponentialtimedecayedsum": _exp_time_decayed_sql("sum"),
        "exponentialtimedecayedcount": _exp_time_decayed_sql("count"),
        "exponentialtimedecayedavg": _exp_time_decayed_sql("avg"),
        "exponentialtimedecayedmax": _exp_time_decayed_sql("max"),
        "quantileexactexclusive": _quantile_exact_exclusive_sql,
        "quantileexactinclusive": lambda p, a: (
            f"percentile(cast({a[0]} as double), cast({p[0]} as double))"
        ),
    }
)


# ---------------------------------------------------------------------------
# Everyday tier 35: the t-test family with REAL p-values — studentTTest /
# welchTTest via a pure-SQL regularized incomplete beta (Lanczos log-gamma +
# Lentz continued fraction, both as JVM expression folds), and the
# two-sample kolmogorovSmirnovTest with the asymptotic Kolmogorov series.
# Zero Python: the special functions are closed-form scalar expressions and
# bounded literal-length folds that Catalyst evaluates per group row.


_LANCZOS = [
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7,
]


def _lgamma_frag(z: str) -> str:
    """ln Γ(z) for z >= 0.5 via the g=7 Lanczos approximation (~1e-13
    relative) — Spark SQL has no lgamma builtin (tier 35)."""
    zm = f"(({z}) - 1.0)"
    ser = repr(_LANCZOS[0]) + "".join(
        f" + {_LANCZOS[i]!r} / ({zm} + {i}.0)" for i in range(1, 9)
    )
    t = f"({zm} + 7.5)"
    return (
        f"(0.9189385332046727 + ({zm} + 0.5) * ln({t}) - {t} "
        f"+ ln({ser}))"
    )


def _lentz_half_step(state: str, aa: str, tag: str) -> str:
    """One half-iteration of Lentz's continued-fraction algorithm:
    d <- 1/(1 + aa*d), c <- 1 + aa/c, h <- h*d*c, with the 1e-30
    underflow clamps of the standard betacf (tier 35)."""
    u = f"__u{tag}"
    dd = f"(case when abs({u}.dd) < 1e-30 then 1e-30 else {u}.dd end)"
    cc = f"(case when abs({u}.cc) < 1e-30 then 1e-30 else {u}.cc end)"
    return (
        f"element_at(transform(array(named_struct("
        f"'dd', 1.0 + ({aa}) * {state}.d, "
        f"'cc', 1.0 + ({aa}) / {state}.c, "
        f"'h', {state}.h)), {u} -> named_struct("
        f"'c', {cc}, 'd', 1.0 / {dd}, "
        f"'h', {u}.h * {cc} / {dd})), 1)"
    )


def _betacf_frag(a: str, b: str, x: str) -> str:
    """The betacf continued fraction for the regularized incomplete
    beta, 200 fixed Lentz iterations (two half-steps each) — a literal
    sequence() fold, so plan size stays constant (tier 35)."""
    qab, qap, qam = f"(({a}) + ({b}))", f"(({a}) + 1.0)", f"(({a}) - 1.0)"
    d0 = f"(1.0 - {qab} * ({x}) / {qap})"
    d0c = f"(case when abs({d0}) < 1e-30 then 1e-30 else {d0} end)"
    aa1 = (
        f"(__m * (({b}) - __m) * ({x}) "
        f"/ (({qam} + 2.0 * __m) * (({a}) + 2.0 * __m)))"
    )
    aa2 = (
        f"(-((({a}) + __m) * ({qab} + __m)) * ({x}) "
        f"/ ((({a}) + 2.0 * __m) * ({qap} + 2.0 * __m)))"
    )
    step1 = _lentz_half_step("__s", aa1, "1")
    step2 = _lentz_half_step("__t1", aa2, "2")
    return (
        f"aggregate(sequence(1, 200), "
        f"named_struct('c', cast(1.0 as double), "
        f"'d', 1.0 / {d0c}, 'h', 1.0 / {d0c}), "
        f"(__s, __mi) -> element_at(transform(array("
        f"cast(__mi as double)), __m -> "
        f"element_at(transform(array({step1}), __t1 -> {step2}), 1)"
        f"), 1), __s -> __s.h)"
    )


def _t_pvalue_frag(tstat: str, nu: str) -> str:
    """Two-sided p for Student's t: p = I_x(nu/2, 1/2) with
    x = nu/(nu + t^2), through the swap rule of the standard ibeta
    (direct continued fraction when x < (a+1)/(a+b+2), else the
    symmetric complement) (tier 35)."""
    xd = f"(({nu}) / (({nu}) + ({tstat}) * ({tstat})))"
    # bound post-swap (a, b, x) once
    a0, b0 = f"(({nu}) / 2.0)", "0.5"
    thr = f"(({a0} + 1.0) / ({a0} + {b0} + 2.0))"
    bind = (
        f"named_struct("
        f"'a', case when {xd} < {thr} then {a0} else {b0} end, "
        f"'b', case when {xd} < {thr} then {b0} else {a0} end, "
        f"'x', case when {xd} < {thr} then {xd} else 1.0 - {xd} end, "
        f"'sw', {xd} >= {thr})"
    )
    lg = (
        f"({_lgamma_frag('__pb.a')} + {_lgamma_frag('__pb.b')} "
        f"- {_lgamma_frag('(__pb.a + __pb.b)')})"
    )
    front = (
        f"(exp(__pb.a * ln(__pb.x) + __pb.b * ln(1.0 - __pb.x) - {lg}) "
        f"/ __pb.a)"
    )
    cf = _betacf_frag("__pb.a", "__pb.b", "__pb.x")
    raw = f"({front} * {cf})"
    inner = (
        f"case when __pb.x <= 0.0 then (case when __pb.sw then 1.0 "
        f"else 0.0 end) "
        f"when __pb.sw then 1.0 - {raw} else {raw} end"
    )
    return (
        f"least(1.0, greatest(0.0, element_at(transform(array({bind}), "
        f"__pb -> {inner}), 1)))"
    )


def _ttest_sql(args: list[str], welch: bool) -> str:
    """studentTTest / welchTTest(value, sample_index): two-sample t on
    groups 0/1 of the index column.  Returns ('_1' statistic,
    '_2' two-sided p-value); pooled-variance t with nu = n0+n1-2 for
    Student, Welch-Satterthwaite nu for Welch (tier 35)."""
    v = f"cast({args[0]} as double)"
    g = f"cast({args[1]} as int)"
    n0 = f"cast(sum(if({g} = 0, 1, 0)) as double)"
    n1 = f"cast(sum(if({g} = 1, 1, 0)) as double)"
    m0 = f"avg(if({g} = 0, {v}, null))"
    m1 = f"avg(if({g} = 1, {v}, null))"
    s0 = f"var_samp(if({g} = 0, {v}, null))"
    s1 = f"var_samp(if({g} = 1, {v}, null))"
    mom = (
        f"named_struct('n0', {n0}, 'n1', {n1}, 'm0', {m0}, 'm1', {m1}, "
        f"'v0', {s0}, 'v1', {s1})"
    )
    if welch:
        se2 = "(__q.v0 / __q.n0 + __q.v1 / __q.n1)"
        tstat = f"((__q.m0 - __q.m1) / sqrt({se2}))"
        nu = (
            f"(({se2}) * ({se2}) "
            f"/ ((__q.v0 / __q.n0) * (__q.v0 / __q.n0) / (__q.n0 - 1.0) "
            f"+ (__q.v1 / __q.n1) * (__q.v1 / __q.n1) / (__q.n1 - 1.0)))"
        )
    else:
        sp2 = (
            f"(((__q.n0 - 1.0) * __q.v0 + (__q.n1 - 1.0) * __q.v1) "
            f"/ (__q.n0 + __q.n1 - 2.0))"
        )
        tstat = (
            f"((__q.m0 - __q.m1) "
            f"/ sqrt({sp2} * (1.0 / __q.n0 + 1.0 / __q.n1)))"
        )
        nu = "(__q.n0 + __q.n1 - 2.0)"
    body = (
        f"element_at(transform(array(named_struct("
        f"'t', {tstat}, 'nu', {nu})), __tv -> named_struct("
        f"'_1', __tv.t, '_2', {_t_pvalue_frag('__tv.t', '__tv.nu')})), 1)"
    )
    return f"element_at(transform(array({mom}), __q -> {body}), 1)"


def _ks_test_sql(args: list[str]) -> str:
    """kolmogorovSmirnovTest(value, sample_index): two-sample KS.
    D = sup over the pooled distinct values of |ECDF0 - ECDF1| (an
    O(d·n) scan like the tier-31 midranks, never O(n²)); p from the
    asymptotic Kolmogorov series 2*sum (-1)^(k-1) exp(-2 k² λ²) with
    λ = D*sqrt(n0·n1/(n0+n1)) (tier 35)."""
    v = f"cast({args[0]} as double)"
    g = f"cast({args[1]} as int)"
    ps = (
        f"array(collect_list(named_struct('v', {v}, 'g', {g})))"
    )
    n0 = "cast(size(filter(__ps, __p -> __p.g = 0)) as double)"
    n1 = "cast(size(filter(__ps, __p -> __p.g = 1)) as double)"
    dmax = (
        f"array_max(transform("
        f"array_distinct(transform(__ps, __p -> __p.v)), __x -> "
        f"abs(size(filter(__ps, __p -> __p.g = 0 and __p.v <= __x)) "
        f"/ __b.n0 "
        f"- size(filter(__ps, __p -> __p.g = 1 and __p.v <= __x)) "
        f"/ __b.n1)))"
    )
    lam = "(__d.d * sqrt(__d.n0 * __d.n1 / (__d.n0 + __d.n1)))"
    # at lambda = 0 every term is 1 and the alternating 100-term sum
    # telescopes to 0 instead of the true Q = 1 — guard the exact-zero
    # case (for any positive lambda the series converges cleanly)
    pser = (
        f"(case when ({lam}) < 1e-12 then 1.0 else "
        f"least(1.0, greatest(0.0, 2.0 * aggregate(sequence(1, 100), "
        f"cast(0.0 as double), (__a, __k) -> __a "
        f"+ (case when __k % 2 = 1 then 1.0 else -1.0 end) "
        f"* exp(-2.0 * __k * __k * ({lam}) * ({lam}))))) end)"
    )
    return (
        f"element_at(transform({ps}, __ps -> "
        f"element_at(transform(array(named_struct('n0', {n0}, "
        f"'n1', {n1})), __b -> "
        f"element_at(transform(array(named_struct('d', {dmax}, "
        f"'n0', __b.n0, 'n1', __b.n1)), __d -> named_struct("
        f"'_1', __d.d, '_2', {pser})), 1)), 1)), 1)"
    )


CH_SQL_TEMPLATES.update(
    {
        "studentttest": lambda args: _ttest_sql(args, welch=False),
        "welchttest": lambda args: _ttest_sql(args, welch=True),
        "kolmogorovsmirnovtest": _ks_test_sql,
    }
)


# ---------------------------------------------------------------------------
# Everyday tier 37: largestTriangleThreeBuckets — Steinarsson's LTTB time
# series downsampling as a parametric aggregate (upstream CH 23.10+).  The
# sequential bucket walk (each pick depends on the previously selected
# point) folds over a literal bucket sequence; everything stays a JVM
# expression.


def _lttb_sql(p: list[str], a: list[str]) -> str:
    """largestTriangleThreeBuckets(n)(x, y): sort the group's points by
    (x, y), keep the first and last, split the interior into n-2 even
    buckets, and from each bucket keep the point forming the largest
    triangle with the PREVIOUSLY selected point and the next bucket's
    average (the final bucket's "next" is the last point).  Ties keep
    the earliest point (strict > in the argmax).  n <= 0 or n >= count
    returns every point; n = 1 the first; n = 2 the endpoints
    (tier 37)."""
    try:
        n = int(p[0].strip())
    except ValueError as exc:
        raise ValueError(
            "largestTriangleThreeBuckets: the bucket count must be an "
            "integer literal"
        ) from exc
    x = f"cast({a[0]} as double)"
    y = f"cast({a[1]} as double)"
    pts = (
        f"array(array_sort(collect_list(named_struct('x', {x}, "
        f"'y', {y}))))"
    )
    as_pairs = (
        "transform({src}, __q -> named_struct('_1', __q.x, '_2', __q.y))"
    )
    if n <= 0:
        return f"element_at(transform({pts}, __ps -> {as_pairs.format(src='__ps')}), 1)"
    if n == 1:
        return (
            f"element_at(transform({pts}, __ps -> "
            f"{as_pairs.format(src='slice(__ps, 1, 1)')}), 1)"
        )
    if n == 2:
        two = (
            "concat(slice(__ps, 1, 1), "
            "slice(__ps, size(__ps), 1))"
        )
        return (
            f"element_at(transform({pts}, __ps -> case "
            f"when size(__ps) <= 2 then {as_pairs.format(src='__ps')} "
            f"else {as_pairs.format(src=two)} end), 1)"
        )
    k = n - 2
    # bucket k spans 1-based interior positions
    #   [2 + floor((k-1)(N-2)/K), 2 + floor(k(N-2)/K) - 1]
    bs = (
        f"named_struct("
        f"'s', 2 + cast(floor((__k - 1) * (size(__ps) - 2) / {k}.0) "
        f"as int), "
        f"'e', 1 + cast(floor(__k * (size(__ps) - 2) / {k}.0) as int), "
        f"'ns', case when __k = {k} then size(__ps) else "
        f"2 + cast(floor(__k * (size(__ps) - 2) / {k}.0) as int) end, "
        f"'ne', case when __k = {k} then size(__ps) else "
        f"1 + cast(floor((__k + 1) * (size(__ps) - 2) / {k}.0) as int) "
        f"end)"
    )
    nxt = "slice(__ps, __bk.ns, __bk.ne - __bk.ns + 1)"
    av = (
        f"named_struct("
        f"'ax', aggregate({nxt}, cast(0.0 as double), "
        f"(__a, __q) -> __a + __q.x) / (__bk.ne - __bk.ns + 1), "
        f"'ay', aggregate({nxt}, cast(0.0 as double), "
        f"(__a, __q) -> __a + __q.y) / (__bk.ne - __bk.ns + 1))"
    )
    cand = "slice(__ps, __bk.s, __bk.e - __bk.s + 1)"
    area = (
        "abs((__st.prev.x - __av.ax) * (__q.y - __st.prev.y) "
        "- (__st.prev.x - __q.x) * (__av.ay - __st.prev.y))"
    )
    best = (
        f"aggregate({cand}, "
        f"named_struct('p', element_at({cand}, 1), "
        f"'a', cast(-1.0 as double)), "
        f"(__b, __q) -> if({area} > __b.a, "
        f"named_struct('p', __q, 'a', {area}), __b))"
    )
    step = (
        f"element_at(transform(array({bs}), __bk -> "
        f"element_at(transform(array({av}), __av -> "
        f"element_at(transform(array({best}), __bp -> "
        f"named_struct('sel', concat(__st.sel, array(__bp.p)), "
        f"'prev', __bp.p)), 1)), 1)), 1)"
    )
    walk = (
        f"aggregate(sequence(1, {k}), "
        f"named_struct('sel', slice(__ps, 1, 1), "
        f"'prev', element_at(__ps, 1)), "
        f"(__st, __k) -> {step}, "
        f"__s -> concat(__s.sel, slice(__ps, size(__ps), 1)))"
    )
    return (
        f"element_at(transform({pts}, __ps -> case "
        f"when size(__ps) <= {n} then {as_pairs.format(src='__ps')} "
        f"else {as_pairs.format(src=walk)} end), 1)"
    )


CH_PARAMETRIC_TEMPLATES.update(
    {"largesttrianglethreebuckets": _lttb_sql}
)


# ---------------------------------------------------------------------------
# Everyday tier 38: sequenceNextNode — the last of upstream's event-chain
# aggregates.  sequenceNextNode(direction, base)(ts, value, base_cond,
# event1, ..., eventN) walks the user's chronological event list from the
# base point, checks that event1..eventN match CONSECUTIVE events in the
# given direction, and returns the value of the next event past the chain
# (NULL when the chain breaks or runs off either end).


def _sequence_next_node_sql(p: list[str], a: list[str]) -> str:
    """sequenceNextNode(direction, base): direction 'forward' steps +1
    and 'backward' -1 from the base; base 'head' = first chronological
    event, 'tail' = last, 'first_match' / 'last_match' = the first /
    last event satisfying event1 AND the base condition.  The base
    event must satisfy base_cond and event1; event values compare as
    strings (the returned column is cast to string) (tier 38)."""
    if len(p) != 2:
        raise ValueError("sequenceNextNode needs (direction, base)")
    direction = p[0].strip().strip("'\"").lower()
    base = p[1].strip().strip("'\"").lower()
    if direction not in ("forward", "backward"):
        raise ValueError(
            f"sequenceNextNode: unknown direction {p[0]!r}"
        )
    if base not in ("head", "tail", "first_match", "last_match"):
        raise ValueError(f"sequenceNextNode: unknown base {p[1]!r}")
    if len(a) < 4:
        raise ValueError(
            "sequenceNextNode needs (timestamp, value, base_condition, "
            "event1, ...)"
        )
    ts = f"cast(cast({a[0]} as timestamp) as double)"
    val = f"cast({a[1]} as string)"
    bc = f"coalesce(cast({a[2]} as boolean), false)"
    conds = [
        f"coalesce(cast({c} as boolean), false)" for c in a[3:]
    ]
    n = len(conds)
    d = 1 if direction == "forward" else -1
    arr = (
        f"array(array_sort(collect_list(named_struct('t', {ts}, "
        f"'v', {val}, 'bc', {bc}, 'cs', array({', '.join(conds)})))))"
    )
    m1 = "transform(__ar, __e -> __e.bc and element_at(__e.cs, 1))"
    if base == "head":
        bidx = "1"
    elif base == "tail":
        bidx = "size(__ar)"
    elif base == "first_match":
        bidx = f"array_position({m1}, true)"
    else:  # last_match
        bidx = (
            f"(case when array_position(reverse({m1}), true) = 0 "
            f"then 0 else size(__ar) + 1 "
            f"- array_position(reverse({m1}), true) end)"
        )
    nxt = f"(__bi.b + {n * d})"
    checks = [
        "__bi.b >= 1", "__bi.b <= size(__ar)",
        f"{nxt} >= 1", f"{nxt} <= size(__ar)",
        "element_at(__ar, __bi.b).bc",
    ]
    checks += [
        f"element_at(element_at(__ar, __bi.b + {(j - 1) * d}).cs, {j})"
        for j in range(1, n + 1)
    ]
    return (
        f"element_at(transform({arr}, __ar -> "
        f"element_at(transform(array(named_struct('b', cast({bidx} "
        f"as int))), __bi -> "
        f"case when {' and '.join(checks)} "
        f"then element_at(__ar, {nxt}).v end), 1)), 1)"
    )


CH_PARAMETRIC_TEMPLATES.update(
    {"sequencenextnode": _sequence_next_node_sql}
)


# ---------------------------------------------------------------------------
# Everyday tier 39: RFC 4648 base32 codecs and the bit-level substring.
# Unlike base58's bignum long division (tier 30), base32 is fixed-block
# transcoding: every 5-bit output group reads a 16-bit window of the byte
# array, so the whole codec is index arithmetic over transform/sequence.


_B32_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"


def _bytes_digits(s: str) -> str:
    """The string's bytes as an int array (hex-pair extraction, like
    the tier-30 base58 codec) (tier 39)."""
    return (
        f"transform(sequence(1, greatest(octet_length({s}), 1)), __i -> "
        f"cast(conv(substring(hex(encode({s}, 'utf-8')), 2 * __i - 1, "
        f"2), 16, 10) as int))"
    )


def _base32_encode_sql(args: list[str]) -> str:
    """CH base32Encode(s): RFC 4648 base32 (A-Z2-7, '=' padding to an
    8-char block).  Output char k reads the 16-bit window holding bits
    [5k, 5k+5) of the big-endian byte stream ('foobar' ->
    'MZXW6YTBOI======', the RFC test vectors) (tier 39)."""
    s = args[0]
    ds = _bytes_digits(s)
    v = (
        "shiftright(element_at(__bs.d, cast((5 * (__k - 1)) div 8 as "
        "int) + 1) * 256 + coalesce(element_at(__bs.d, "
        "cast((5 * (__k - 1)) div 8 as int) + 2), 0), "
        "11 - cast((5 * (__k - 1)) % 8 as int)) & 31"
    )
    body = (
        f"array_join(transform(sequence(1, __bs.tot), __k -> "
        f"if(__k <= __bs.nc, substring('{_B32_ALPHABET}', ({v}) + 1, 1), "
        f"'=')), '')"
    )
    return (
        f"if(octet_length({s}) = 0, '', "
        f"element_at(transform(array(named_struct('d', {ds}, "
        f"'nc', cast((8 * octet_length({s}) + 4) div 5 as int), "
        f"'tot', cast(((octet_length({s}) + 4) div 5) * 8 as int))), "
        f"__bs -> {body}), 1))"
    )


def _base32_decode_body(s: str) -> str:
    """Bytes-from-groups core shared by base32Decode/tryBase32Decode:
    NULL when any non-pad character falls outside the alphabet, else
    the decoded string (tier 39)."""
    raw = f"upper(regexp_replace({s}, '=+$', ''))"
    groups = (
        f"transform(sequence(1, greatest(char_length({raw}), 1)), "
        f"__i -> cast(instr('{_B32_ALPHABET}', "
        f"substring({raw}, __i, 1)) - 1 as int))"
    )
    byte = (
        "shiftright(element_at(__gs.g, cast((8 * (__j - 1)) div 5 as "
        "int) + 1) * 1024 + coalesce(element_at(__gs.g, "
        "cast((8 * (__j - 1)) div 5 as int) + 2), 0) * 32 "
        "+ coalesce(element_at(__gs.g, "
        "cast((8 * (__j - 1)) div 5 as int) + 3), 0), "
        "7 - cast((8 * (__j - 1)) % 5 as int)) & 255"
    )
    hexs = (
        f"array_join(transform(sequence(1, __gs.nb), __j -> "
        f"lpad(conv(cast(({byte}) as string), 10, 16), 2, '0')), '')"
    )
    return (
        f"(case when char_length({raw}) = 0 then '' "
        f"when array_min({groups}) < 0 then cast(null as string) "
        f"else element_at(transform(array(named_struct('g', {groups}, "
        f"'nb', cast((5 * char_length({raw})) div 8 as int))), "
        f"__gs -> decode(unhex({hexs}), 'utf-8')), 1) end)"
    )


def _base32_decode_sql(args: list[str], lenient: bool = False) -> str:
    """CH base32Decode / tryBase32Decode: inverse block transcode; the
    strict form raises on characters outside the alphabet, the try
    form yields NULL (tier 39)."""
    s = args[0]
    body = _base32_decode_body(s)
    if lenient:
        return body
    return (
        f"(case when ({body}) is null and ({s}) is not null then "
        f"cast(raise_error(concat('base32Decode: invalid base32: ', "
        f"{s})) as string) else ({body}) end)"
    )


def _bit_slice_sql(args: list[str]) -> str:
    """CH bitSlice(s, offset[, length]): bit-level substring of the
    string's bytes, 1-based bit offset; negative offset counts from
    the end, negative length stops |length| bits before the end, and
    the tail byte zero-pads.  Returns BINARY: Spark strings are
    UTF-8-validated, so arbitrary bit patterns cannot round-trip
    through STRING the way ClickHouse's byte-transparent String does
    (tier 39)."""
    s = args[0]
    ds = _bytes_digits(s)
    off, ln = args[1], (args[2] if len(args) > 2 else None)
    tot = f"(8 * octet_length({s}))"
    start = (
        f"(case when ({off}) < 0 then greatest({tot} + ({off}) + 1, 1) "
        f"else cast({off} as int) end)"
    )
    if ln is None:
        length = f"({tot} - __sl.st + 1)"
    else:
        length = (
            f"(case when ({ln}) < 0 then {tot} - __sl.st + 1 + ({ln}) "
            f"else cast({ln} as int) end)"
        )
    bit = (
        "shiftright(element_at(__sl.d, cast((__sl.st + __b - 2) div 8 "
        "as int) + 1), 7 - cast((__sl.st + __b - 2) % 8 as int)) & 1"
    )
    byte = (
        f"aggregate(sequence(1, 8), 0, (__a, __i) -> __a * 2 + "
        f"(case when (__j - 1) * 8 + __i <= __sl.ln then "
        f"element_at(__sl.bits, (__j - 1) * 8 + __i) else 0 end))"
    )
    hexs = (
        f"array_join(transform(sequence(1, cast((__sl.ln + 7) div 8 "
        f"as int)), __j -> lpad(conv(cast(({byte}) as string), 10, 16), "
        f"2, '0')), '')"
    )
    inner = (
        f"element_at(transform(array(named_struct('d', __sl0.d, "
        f"'st', __sl0.st, 'ln', least({length.replace('__sl.', '__sl0.')}, "
        f"{tot} - __sl0.st + 1), "
        f"'bits', transform(sequence(1, greatest(least("
        f"{length.replace('__sl.', '__sl0.')}, {tot} - __sl0.st + 1), 1)), "
        f"__b -> {bit.replace('__sl.', '__sl0.')}))), __sl -> "
        f"if(__sl.ln <= 0, unhex(''), unhex({hexs}))), 1)"
    )
    return (
        f"(case when octet_length({s}) = 0 then unhex('') else "
        f"element_at(transform(array(named_struct('d', {ds}, "
        f"'st', {start})), __sl0 -> "
        f"(case when __sl0.st > {tot} then unhex('') else {inner} "
        f"end)), 1) end)"
    )


CH_SQL_TEMPLATES.update(
    {
        "base32encode": _base32_encode_sql,
        "base32decode": _base32_decode_sql,
        "trybase32decode": lambda args: _base32_decode_sql(
            args, lenient=True
        ),
        "bitslice": _bit_slice_sql,
    }
)


# ---------------------------------------------------------------------------
# Everyday tier 40: the case-insensitive text-search family, subsequence
# search, token validation, and coarse HTML text extraction — string
# templates and one O(n) character fold, all JVM expressions.


def _has_subsequence_sql(args: list[str], ci: bool) -> str:
    """hasSubsequence(haystack, needle): 1 when needle's characters
    occur in haystack in order (not necessarily contiguously) — a
    single left-to-right cursor fold; the CaseInsensitive form lowers
    both sides first (tier 40)."""
    h, n = args[0], args[1]
    if ci:
        h, n = f"lower({h})", f"lower({n})"
    return (
        f"cast(aggregate(split({h}, ''), 0, (__c, __ch) -> "
        f"if(__c < char_length({n}) "
        f"and __ch = substring({n}, __c + 1, 1), __c + 1, __c), "
        f"__c -> if(__c >= char_length({n}), 1, 0)) as tinyint)"
    )


def _extract_text_from_html_sql(args: list[str]) -> str:
    """extractTextFromHTML(s): coarse text extraction — drop
    script/style/comment blocks, strip the remaining tags, decode the
    five standard entities, collapse whitespace.  A documented
    approximation of upstream's parser (tier 40)."""
    s = args[0]
    out = (
        f"regexp_replace({s}, "
        f"'(?is)<script\\\\b.*?</script\\\\s*>"
        f"|<style\\\\b.*?</style\\\\s*>|<!--.*?-->', ' ')"
    )
    out = f"regexp_replace({out}, '(?s)<[^>]*>', ' ')"
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '\"'),
                    ("&apos;", chr(39) * 2), ("&amp;", "&")):
        rep = f"'{ch}'" if ch != chr(39) * 2 else "''''"
        out = f"replace({out}, '{ent}', {rep})"
    return f"trim(regexp_replace({out}, '\\\\s+', ' '))"


CH_SQL_TEMPLATES.update(
    {
        "countmatchescaseinsensitive": (
            "size(regexp_extract_all({0}, concat('(?i)', {1}), 0))"
        ),
        "countsubstringscaseinsensitive": (
            "cast((char_length({0}) - char_length(replace(lower({0}), "
            "lower({1}), ''))) / char_length({1}) as int)"
        ),
        "countsubstringscaseinsensitiveutf8": (
            "cast((char_length({0}) - char_length(replace(lower({0}), "
            "lower({1}), ''))) / char_length({1}) as int)"
        ),
        "positioncaseinsensitiveutf8": "instr(lower({0}), lower({1}))",
        "multisearchfirstpositioncaseinsensitive": (
            "coalesce(array_min(filter(transform({1}, "
            "__n -> instr(lower({0}), lower(__n))), __p -> __p > 0)), 0)"
        ),
        "multisearchfirstposition": (
            "coalesce(array_min(filter(transform({1}, "
            "__n -> instr({0}, __n)), __p -> __p > 0)), 0)"
        ),
        # hasToken requires a separator-free needle; the OrNull form
        # yields NULL for an invalid token instead of raising
        "hastokenornull": (
            "(case when {1} rlike '[^A-Za-z0-9]' then cast(null as "
            "boolean) else array_contains(filter(split({0}, "
            "'[^A-Za-z0-9]+'), __x -> __x != ''), {1}) end)"
        ),
        "hassubsequence": lambda args: _has_subsequence_sql(args, False),
        "hassubsequencecaseinsensitive": lambda args: (
            _has_subsequence_sql(args, True)
        ),
        "hassubsequenceutf8": lambda args: (
            _has_subsequence_sql(args, False)
        ),
        "extracttextfromhtml": _extract_text_from_html_sql,
    }
)
