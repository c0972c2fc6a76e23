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
    """int -> days-since-epoch date is NOT the CH semantic; CH toDate(int)
    treats the int as unix *seconds* (tests clickhouse.rs:14-80:
    toDate(536457600) = '1987-01-01')."""
    c = _c(col)
    return F.to_date(_as_ts(c))


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
    "todate": "to_date(cast({0} as timestamp))",
    "todatetime": "cast({0} as timestamp)",
    "toyyyymm": "cast(year({0})*100 + month({0}) as bigint)",
    "toyyyymmdd": "cast(year({0})*10000 + month({0})*100 + dayofmonth({0}) as bigint)",
    "rem": "({0} % {1})",
    "endswith": "endswith({0}, {1})",
    "startswith": "startswith({0}, {1})",
    "generateuuidv4": "uuid()",
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
    }
)


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
        "positioncaseinsensitive": "locate(lower({1}), lower({0}))",
    }
)
