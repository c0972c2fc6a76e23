"""ClickHouse scalar-function coverage queries (SURVEY.md §2.6).

Exercises the function shim in tensorbase_spark.functions.clickhouse over the
driver's tables; oracle SQL uses the ANSI/DuckDB equivalents (DuckDB isodow is
Monday=1, matching ClickHouse toDayOfWeek directly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tensorbase_spark.functions import clickhouse as ch
from tensorbase_spark.queries import Query
from tensorbase_spark.sources.tables import load_table


def ch_date_parts(spark, sf_dir):
    """toYear/toQuarter/toMonth/toDayOfYear/toDayOfMonth/toDayOfWeek
    (clickhouse.rs:39-49) over order dates, aggregated per year-quarter."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            ch.toYear("o_orderdate").alias("y"),
            ch.toQuarter("o_orderdate").alias("q"),
            ch.toMonth("o_orderdate").alias("m"),
            ch.toDayOfYear("o_orderdate").alias("doy"),
            ch.toDayOfMonth("o_orderdate").alias("dom"),
            ch.toDayOfWeek("o_orderdate").alias("dow"),
            F.col("o_totalprice"),
        )
        .groupBy("y", "q")
        .agg(
            F.count("*").alias("n"),
            F.min("dow").alias("min_dow"),
            F.max("dow").alias("max_dow"),
            F.max("doy").alias("max_doy"),
            F.max("dom").alias("max_dom"),
            F.max("m").alias("max_m"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
        .orderBy("y", "q")
    )


CH_DATE_PARTS_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(quarter(o_orderdate) AS INT) AS q,
       count(*) AS n,
       CAST(min(isodow(o_orderdate)) AS INT) AS min_dow,
       CAST(max(isodow(o_orderdate)) AS INT) AS max_dow,
       CAST(max(dayofyear(o_orderdate)) AS INT) AS max_doy,
       CAST(max(dayofmonth(o_orderdate)) AS INT) AS max_dom,
       CAST(max(month(o_orderdate)) AS INT) AS max_m,
       round(sum(o_totalprice), 2) AS rev
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""


def ch_time_parts(spark, sf_dir):
    """toHour/toMinute/toSecond (clickhouse.rs:55-59) over event timestamps."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.col("event_id"),
            ch.toHour("ts").alias("h"),
            ch.toMinute("ts").alias("mi"),
            ch.toSecond("ts").alias("s"),
        )
        .filter(F.col("event_id") % 10 == 0)
    )


CH_TIME_PARTS_ORACLE = """
SELECT event_id,
       CAST(hour(CAST(ts AS TIMESTAMP)) AS INT)   AS h,
       CAST(minute(CAST(ts AS TIMESTAMP)) AS INT) AS mi,
       CAST(second(CAST(ts AS TIMESTAMP)) AS INT) AS s
FROM events WHERE event_id % 10 = 0
"""


def ch_to_date_datetime(spark, sf_dir):
    """toDate/toDateTime int->seconds coercion (clickhouse.rs:51-53; golden
    toDate(536457600)='1987-01-01', datafusion_tests/tests/clickhouse.rs:14-80)
    applied to a column of unix seconds derived from events."""
    e = load_table(spark, sf_dir, "events")
    secs = e.select(
        F.col("event_id"),
        # NTZ-safe epoch extraction (see windows.events_sessionize)
        F.col("ts").cast("timestamp").cast("long").alias("unix_sec"),
    )
    return secs.select(
        "event_id",
        ch.toDate(F.col("unix_sec")).alias("d"),
        ch.toDateTime(F.col("unix_sec")).alias("dt"),
        ch.toYYYYMMDD(F.col("unix_sec")).alias("yyyymmdd"),
        (ch.toYYYYMM(F.col("unix_sec"))).alias("yyyymm"),
    ).filter(F.col("event_id") % 7 == 0)


CH_TO_DATE_ORACLE = """
WITH secs AS (
  SELECT event_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS unix_sec
  FROM events WHERE event_id % 7 = 0
)
SELECT event_id,
       CAST(epoch_ms(unix_sec * 1000) AS DATE)                 AS d,
       epoch_ms(unix_sec * 1000)                               AS dt,
       CAST(year(epoch_ms(unix_sec * 1000))*10000
            + month(epoch_ms(unix_sec * 1000))*100
            + dayofmonth(epoch_ms(unix_sec * 1000)) AS BIGINT) AS yyyymmdd,
       CAST(year(epoch_ms(unix_sec * 1000))*100
            + month(epoch_ms(unix_sec * 1000)) AS BIGINT)      AS yyyymm
FROM secs
"""


def ch_string_funcs(spark, sf_dir):
    """endsWith/startsWith (clickhouse.rs:61) + the DataFusion-builtin string
    surface (functions.rs:174-305) over part names."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        ch.endsWith("p_name", "_5").alias("ends_5"),
        ch.startsWith("p_type", "PROMO").alias(" is_promo").alias("is_promo"),
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name4"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.reverse("p_type").alias("type_rev"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.lpad(F.col("p_brand"), 12, "*").alias("brand_pad"),
        F.replace(F.col("p_type"), F.lit("O"), F.lit("0")).alias("type_repl"),
    )


CH_STRING_ORACLE = """
SELECT p_partkey,
       ends_with(p_name, '_5')       AS ends_5,
       starts_with(p_type, 'PROMO')  AS is_promo,
       upper(p_brand)                AS brand_up,
       lower(p_type)                 AS type_lo,
       CAST(length(p_name) AS INT)   AS name_len,
       substring(p_name, 1, 4)       AS name4,
       concat_ws('|', p_brand, p_type) AS brand_type,
       reverse(p_type)               AS type_rev,
       trim('  x  ')                 AS trimmed,
       lpad(p_brand, 12, '*')        AS brand_pad,
       replace(p_type, 'O', '0')     AS type_repl
FROM part
"""


def ch_uuid_roundtrip(spark, sf_dir):
    """toUUID/toUUIDOrNull/toUUIDOrZero + UUIDStringToNum/UUIDNumToString
    round-trip (clickhouse.rs:63-106; golden sanity_checks.rs:1204).  UUIDs are
    synthesized deterministically from doc ids via md5."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    uuid_str = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    d2 = d.select("doc_id", uuid_str.alias("u"), F.col("lang"))
    bad = F.when(F.col("lang") == "zh", F.concat(F.col("u"), F.lit("zz"))).otherwise(F.col("u"))
    return d2.select(
        "doc_id",
        ch.toUUIDOrNull(bad).alias("u_or_null"),
        ch.toUUIDOrZero(bad).alias("u_or_zero"),
        ch.UUIDNumToString(ch.UUIDStringToNum(F.col("u"))).alias("u_roundtrip"),
    )


CH_UUID_ORACLE = """
WITH d2 AS (
  SELECT doc_id, lang,
         concat_ws('-', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                        substring(md5(CAST(doc_id AS VARCHAR)), 9, 4),
                        substring(md5(CAST(doc_id AS VARCHAR)), 13, 4),
                        substring(md5(CAST(doc_id AS VARCHAR)), 17, 4),
                        substring(md5(CAST(doc_id AS VARCHAR)), 21, 12)) AS u
  FROM documents
), bad AS (
  SELECT doc_id, u, CASE WHEN lang = 'zh' THEN u || 'zz' ELSE u END AS ub FROM d2
)
SELECT doc_id,
       CASE WHEN regexp_matches(ub, '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$')
            THEN ub END AS u_or_null,
       CASE WHEN regexp_matches(ub, '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$')
            THEN ub ELSE '00000000-0000-0000-0000-000000000000' END AS u_or_zero,
       u AS u_roundtrip
FROM bad
"""


def ch_math_funcs(spark, sf_dir):
    """DataFusion-builtin math surface (math_expressions.rs): abs ceil floor
    round sqrt exp ln log10 signum trunc over lineitem numerics."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    return li.filter(F.col("l_orderkey") % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(x - 1000).alias("abs_v"),
        F.ceil(F.col("l_discount") * 100).alias("ceil_disc"),
        F.floor(F.col("l_tax") * 100).alias("floor_tax"),
        F.round(F.sqrt(x), 4).alias("sqrt_p"),
        F.round(F.log(x), 6).alias("ln_p"),
        F.round(F.log10(x), 6).alias("log10_p"),
        F.signum(F.col("l_quantity") - 25).alias("sgn"),
        F.round(F.exp(F.col("l_discount")), 8).alias("exp_disc"),
    )


CH_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 1000)          AS abs_v,
       CAST(ceil(l_discount * 100) AS BIGINT)  AS ceil_disc,
       CAST(floor(l_tax * 100) AS BIGINT)      AS floor_tax,
       round(sqrt(l_extendedprice), 4)      AS sqrt_p,
       round(ln(l_extendedprice), 6)        AS ln_p,
       round(log10(l_extendedprice), 6)     AS log10_p,
       CAST(sign(l_quantity - 25) AS DOUBLE) AS sgn,
       round(exp(l_discount), 8)            AS exp_disc
FROM lineitem WHERE l_orderkey % 50 = 0
"""


QUERIES = {
    "ch_date_parts": Query(ch_date_parts, CH_DATE_PARTS_ORACLE, ("chfunc", "datetime")),
    "ch_time_parts": Query(ch_time_parts, CH_TIME_PARTS_ORACLE, ("chfunc", "datetime")),
    "ch_to_date_datetime": Query(ch_to_date_datetime, CH_TO_DATE_ORACLE, ("chfunc", "datetime")),
    "ch_string_funcs": Query(ch_string_funcs, CH_STRING_ORACLE, ("chfunc", "string")),
    "ch_uuid_roundtrip": Query(ch_uuid_roundtrip, CH_UUID_ORACLE, ("chfunc", "uuid")),
    "ch_math_funcs": Query(ch_math_funcs, CH_MATH_ORACLE, ("chfunc", "math")),
}
