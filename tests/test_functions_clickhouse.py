"""Golden-value tests for the ClickHouse function shim — ported from the
reference's own function tests (crates/datafusion_tests/tests/clickhouse.rs:
test_to_date :15, test_to_datetime :147, test_to_year :242, test_uuid :82)
and the JIT partition-expression goldens (crates/runtime/src/write.rs:548-571:
toYYYYMMDD(0)=19700101, toYYYYMMDD(1095379200)=20040917)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tensorbase_spark.functions import clickhouse as ch


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_to_date_from_unix_seconds(spark):
    # clickhouse.rs golden: toDate(536457600) == '1987-01-01'
    assert _one(spark, ch.toDate(F.lit(536457600))) == datetime.date(1987, 1, 1)


def test_to_date_from_string(spark):
    assert _one(spark, ch.toDate(F.lit("2004-09-17"))) == datetime.date(2004, 9, 17)


def test_to_datetime_from_unix_seconds(spark):
    got = _one(spark, ch.toDateTime(F.lit(1095379200)))
    assert got == datetime.datetime(2004, 9, 17, 0, 0, 0)


def test_to_yyyymmdd_goldens(spark):
    # crates/runtime/src/write.rs:548-571
    assert _one(spark, ch.toYYYYMMDD(F.lit(0))) == 19700101
    assert _one(spark, ch.toYYYYMMDD(F.lit(1095379200))) == 20040917


def test_to_yyyymm(spark):
    assert _one(spark, ch.toYYYYMM(F.lit(1095379200))) == 200409


def test_year_quarter_month_parts(spark):
    d = F.lit("2004-09-17").cast("date")
    assert _one(spark, ch.toYear(d)) == 2004
    assert _one(spark, ch.toQuarter(d)) == 3
    assert _one(spark, ch.toMonth(d)) == 9
    assert _one(spark, ch.toDayOfYear(d)) == 261
    assert _one(spark, ch.toDayOfMonth(d)) == 17


def test_to_day_of_week_monday_one(spark):
    # ClickHouse toDayOfWeek: Monday=1..Sunday=7 (clickhouse.rs:49).
    # 2004-09-17 was a Friday; 2004-09-19 a Sunday; 2004-09-20 a Monday.
    assert _one(spark, ch.toDayOfWeek(F.lit("2004-09-17").cast("date"))) == 5
    assert _one(spark, ch.toDayOfWeek(F.lit("2004-09-19").cast("date"))) == 7
    assert _one(spark, ch.toDayOfWeek(F.lit("2004-09-20").cast("date"))) == 1


def test_time_parts(spark):
    ts = F.lit("2004-09-17 13:45:57").cast("timestamp")
    assert _one(spark, ch.toHour(ts)) == 13
    assert _one(spark, ch.toMinute(ts)) == 45
    assert _one(spark, ch.toSecond(ts)) == 57


def test_rem_partition_expr(spark):
    # partition expr used by the reference's ingest bench
    # (crates/tests_integ/benches/bench_ingestion.rs:39)
    assert _one(spark, ch.rem(F.lit(1234), 100)) == 34


def test_starts_ends_with(spark):
    assert _one(spark, ch.endsWith(F.lit("hello"), "lo")) is True
    assert _one(spark, ch.startsWith(F.lit("hello"), "he")) is True
    assert _one(spark, ch.endsWith(F.lit("hello"), "xx")) is False


def test_uuid_roundtrip(spark):
    u = "d1e9b0a4-5a7b-4c2d-8e3f-1a2b3c4d5e6f"
    got = _one(spark, ch.UUIDNumToString(ch.UUIDStringToNum(F.lit(u))))
    assert got == u


def test_to_uuid_or_null_or_zero(spark):
    bad = F.lit("not-a-uuid")
    assert _one(spark, ch.toUUIDOrNull(bad)) is None
    assert _one(spark, ch.toUUIDOrZero(bad)) == "00000000-0000-0000-0000-000000000000"
    good = F.lit("D1E9B0A4-5A7B-4C2D-8E3F-1A2B3C4D5E6F")
    assert _one(spark, ch.toUUIDOrNull(good)) == "d1e9b0a4-5a7b-4c2d-8e3f-1a2b3c4d5e6f"


def test_generate_uuid_v4_shape(spark):
    import re

    got = _one(spark, ch.generateUUIDv4())
    assert re.fullmatch(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", got)


def test_sql_templates_match_column_forms(spark):
    """The SQL-text templates (dialect layer) must agree with the Column
    builders for a representative sample."""
    from tensorbase_spark.functions.clickhouse import CH_SQL_TEMPLATES

    ts = "cast('2004-09-17 13:45:57' as timestamp)"
    for name, args in [
        ("toyear", [ts]),
        ("toquarter", [ts]),
        ("todayofweek", [ts]),
        ("toyyyymmdd", [ts]),
        ("tohour", [ts]),
    ]:
        sql = CH_SQL_TEMPLATES[name].format(*args)
        got = spark.sql(f"SELECT {sql} AS v").collect()[0].v
        expected = {
            "toyear": 2004,
            "toquarter": 3,
            "todayofweek": 5,
            "toyyyymmdd": 20040917,
            "tohour": 13,
        }[name]
        assert got == expected, name


def test_dialect_array_hofs_and_casts(spark):
    """Lambda reorder (CH lambda-first -> Spark array-first), cast family
    widening, multiIf, bit ops, sub-hour buckets — golden values."""
    from tensorbase_spark.engine import translate_sql

    row = spark.sql(translate_sql(
        "select arrayMap(x -> x * 2, array(1, 2, 3)) as m, "
        "arrayFilter(x -> x > 1, array(1, 2, 3)) as f, "
        "arraySum(array(1, 2, 3)) as s, "
        "arraySum(x -> x * x, array(1, 2, 3)) as ssq, "
        "arrayCount(x -> x > 1, array(1, 2, 3)) as c, "
        "arrayUniq(array(1, 1, 2)) as u, "
        "arrayStringConcat(array('a', 'b'), '-') as j, "
        "multiIf(2 > 1, 'a', 'b') as mi, "
        "toInt64('12') as i64, "
        "toUInt64(7) as u64, "
        "toFloat64OrZero('bad') as fz, "
        "intDiv(7, 2) as idiv, "
        "bitAnd(6, 3) as band, "
        "bitShiftLeft(1, 4) as bsl, "
        "splitByChar(',', 'a,b,c') as sp, "
        "leftPad('7', 3, '0') as lp, "
        "formatDateTime(timestamp'2001-02-03 04:05:06', '%Y-%m-%d %H:%M:%S') as fd, "
        "toUnixTimestamp(timestamp'1970-01-01 00:01:00') as ut"
    )).collect()[0]
    assert row.m == [2, 4, 6] and row.f == [2, 3]
    assert row.s == 6.0 and row.ssq == 14.0 and row.c == 2 and row.u == 2
    assert row.j == "a-b" and row.mi == "a"
    assert row.i64 == 12 and int(row.u64) == 7 and row.fz == 0.0
    assert row.idiv == 3 and row.band == 2 and row.bsl == 16
    assert row.sp == ["a", "b", "c"] and row.lp == "007"
    assert row.fd == "2001-02-03 04:05:06"
    assert row.ut == 60


def test_dialect_fifteen_minute_bucket(spark):
    from tensorbase_spark.engine import translate_sql

    row = spark.sql(translate_sql(
        "select toStartOfFifteenMinutes(timestamp'2001-02-03 04:22:33') as b, "
        "addHours(timestamp'2001-02-03 04:22:33', 2) as ah"
    )).collect()[0]
    assert str(row.b) == "2001-02-03 04:15:00"
    assert str(row.ah) == "2001-02-03 06:22:33"


def test_dialect_median(spark):
    from tensorbase_spark.engine import translate_sql

    row = spark.sql(translate_sql(
        "select median(x) as m, medianExact(x) as me "
        "from values (1.0), (2.0), (3.0), (10.0) as t(x)"
    )).collect()[0]
    assert row.m == 2.5 and row.me == 2.5


def test_dialect_uniq_family_aliases(spark):
    """uniqCombined/uniqCombined64/uniqHLL12 all rewrite to
    approx_count_distinct, uniqExact to exact count distinct — upstream-CH
    spellings over a 3-distinct-value column give the exact answer at this
    cardinality (HLL error ~0 for tiny sets)."""
    from tensorbase_spark.engine import translate_sql

    spark.range(100).selectExpr("id % 3 AS v").createOrReplaceTempView("uqv")
    row = spark.sql(translate_sql(
        "select uniq(v) as u, uniqCombined(v) as uc, uniqCombined64(v) as uc64, "
        "uniqHLL12(v) as uh, uniqExact(v) as ue from uqv"
    )).collect()[0]
    assert (row.u, row.uc, row.uc64, row.uh, row.ue) == (3, 3, 3, 3, 3)


def test_tier3_templates_translate():
    from tensorbase_spark.engine import translate_sql as t

    assert "size(filter(xs, v -> v = 2))" in t("select countEqual(xs, 2)")
    assert "sequence(0, n - 1)" in t("select range(n)")
    assert "timestampadd(day, 5, d)" in t("select dateAdd('day', 5, d)")
    assert "instr(h, n)" in t("select locate(h, n)")  # CH arg order kept
    assert "bit_xor(v)" in t("select groupBitXor(v)")
    assert "asin(sqrt(" in t("select greatCircleDistance(a, b, c, d)")
    # window RANGE frames must survive the range() template (keyword context)
    out = t("select sum(v) over (order by d range between interval 1 day preceding and current row)")
    assert "range between interval 1 day preceding" in out


def test_range_scalar_vs_table_function_position():
    from tensorbase_spark.engine import translate_sql as t

    assert "sequence(0, 3 - 1)" in t("select range(3) as r")
    assert "from range(5000)" in t("select id from range(5000)")
    assert "join range(10)" in t("select * from t join range(10) on true")


def test_sequence_match_and_uniq_upto_translate():
    from tensorbase_spark.engine import translate_sql as t
    import pytest as _pytest

    out = t("select sequenceMatch('(?1).*(?2)')(ts, a, b) as m")
    assert "min(case when a then ts end)" in out
    assert "coalesce(" in out  # no-step groups are false, not NULL
    assert "least(count(distinct x), 5 + 1)" in t("select uniqUpTo(5)(x)")
    # longer chains compile through the tier-32 collect-sort-fold
    # (the pre-tier-32 hard error is gone); _pytest kept for the raises
    # below
    out3 = t("select sequenceMatch('(?1).*(?2).*(?3)')(ts, a, b, c)")
    assert "aggregate(" in out3 and "collect_list" in out3
    with _pytest.raises(ValueError):
        t("select sequenceMatch('(?1)(?2)')(ts, a, b)")


def test_generic_if_combinator():
    from tensorbase_spark.engine import translate_sql as t

    assert (
        t("select uniqExactIf(u, v > 5) from t")
        == "select count(distinct u) filter (where v > 5) from t"
    )
    assert "percentile(v, 0.5) filter (where c)" in t("select medianIf(v, c) from t")
    assert "max_by(u, ts) filter (where c)" in t("select argMaxIf(u, ts, c) from t")
    # multiIf is a scalar conditional, never a combinator
    assert "filter" not in t("select multiIf(a, 1, b, 2, 3) from t")


def test_array_combinators(spark):
    from tensorbase_spark.engine import translate_sql as t

    spark.sql(
        "select * from values (array(1.0, 2.0)), (array(3.0)) as t(a)"
    ).createOrReplaceTempView("arrc_src")
    r = spark.sql(
        t("select sumArray(a) as s, countArray(a) as c, avgArray(a) as av from arrc_src")
    ).collect()[0]
    assert (r.s, r.c, r.av) == (6.0, 3, 2.0)


def test_text_search_helpers(spark):
    from tensorbase_spark.engine import translate_sql as t

    r = spark.sql(
        t(
            "select hasToken('the Quick fox', 'Quick') as a, "
            "hasToken('the Quick fox', 'quick') as b, "
            "hasTokenCaseInsensitive('the Quick fox', 'quick') as c, "
            "multiSearchAny('haystack here', array('xyz', 'stack')) as d"
        )
    ).collect()[0]
    assert (r.a, r.b, r.c, r.d) == (True, False, True, True)


def test_enumeration_and_identity_helpers(spark):
    from tensorbase_spark.engine import translate_sql as t

    r = spark.sql(
        t(
            "select arrayEnumerate(array('a','b')) as e, "
            "arrayEnumerate(array()) as e0, "
            "arrayEnumerateUniq(array('a','b','a','a')) as eu, "
            "toLowCardinality('x') as lc, materialize(7) as mz, "
            "ignore(1, 2) as ig, toTypeName(array(1)) as tn"
        )
    ).collect()[0]
    assert r.e == [1, 2] and r.e0 == []  # sequence(1,0) would descend
    assert r.eu == [1, 1, 2, 3]
    assert (r.lc, r.mz, r.ig, r.tn) == ("x", 7, 0, "array<int>")


def test_histogram_equiwidth(spark):
    """histogram(M)(x): M equi-width bins over [min,max]; heights sum to
    the row count; last bin is max-inclusive."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8]], "x double"
    ).createOrReplaceTempView("hist_t")
    row = eng.sql(
        "select histogram(4)(x) as h from hist_t"
    ).collect()[0].h
    assert len(row) == 4
    assert [b["_1"] for b in row] == [0.0, 2.0, 4.0, 6.0]
    assert [b["_2"] for b in row] == [2.0, 4.0, 6.0, 8.0]
    # 0,1 | 2,3 | 4,5 | 6,7,8 (last bin max-inclusive)
    assert [b["_3"] for b in row] == [2.0, 2.0, 2.0, 3.0]


def test_generic_suffix_combinators(spark):
    """-Distinct / -OrNull / -OrDefault peel like -If: sum/avg/min/max/
    count stems and template stems compose; uniq* + Distinct is a no-op;
    count's 0-on-empty diverges from CH's NULL -> nullif handles it."""
    from tensorbase_spark.engine import TensorBaseEngine, translate_sql

    out = translate_sql(
        "select sumDistinct(x), countOrNull(y), maxOrDefault(z) from t"
    )
    assert "sum(distinct x)" in out
    assert "nullif(count(y), 0)" in out
    assert "coalesce(max(z), 0)" in out
    eng = TensorBaseEngine(spark)
    spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 2.0)], "k int, v double"
    ).createOrReplaceTempView("cmb_t")
    assert eng.sql("select sumDistinct(v) as s from cmb_t").collect()[0].s == 3.0
    r = eng.sql(
        "select countOrNull(v) as cn, maxOrDefault(v) as md "
        "from cmb_t where v > 99"
    ).collect()[0]
    assert r.cn is None and r.md == 0.0
    assert eng.sql(
        "select uniqExactDistinct(k) as u from cmb_t"
    ).collect()[0].u == 2


def test_bar_and_readable_quantity(spark):
    """bar() draws CH's full+eighth block glyphs; clamps outside [min,max];
    formatReadableQuantity picks thousand/million/billion units."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    rows = eng.sql(
        "select bar(5, 0, 10, 4) as half, bar(10, 0, 10, 4) as full, "
        "bar(-3, 0, 10, 4) as clamp0, bar(99, 0, 10, 4) as clamp1, "
        "bar(1, 0, 16, 4) as half_block, "
        "formatReadableQuantity(1234567) as m, "
        "formatReadableQuantity(1500) as k, "
        "formatReadableQuantity(12) as plain"
    ).collect()[0]
    assert rows.half == "██"
    assert rows.full == "████"
    assert rows.clamp0 == ""
    assert rows.clamp1 == "████"
    assert rows.half_block == "▎"  # 2 of 8 eighths -> quarter block
    assert rows.m == "1.23 million"
    assert rows.k == "1.5 thousand"
    assert rows.plain == "12.0"


def test_entropy_kv_theta(spark):
    """entropy: uniform 2 values -> 1 bit, single value -> 0;
    extractKeyValuePairs parses k:v with CH's default delimiters;
    uniqTheta estimates distincts."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    spark.createDataFrame(
        [("a",), ("a",), ("b",), ("b",)], "v string"
    ).createOrReplaceTempView("ent_t")
    assert eng.sql("select entropy(v) as e from ent_t").collect()[0].e == 1.0
    spark.createDataFrame([("c",), ("c",)], "v string").createOrReplaceTempView(
        "ent_one"
    )
    assert eng.sql("select entropy(v) as e from ent_one").collect()[0].e == 0.0
    r = eng.sql(
        "select extractKeyValuePairs('x:1, y:2; z:3') as m"
    ).collect()[0].m
    assert r == {"x": "1", "y": "2", "z": "3"}
    assert eng.sql("select uniqTheta(v) as u from ent_t").collect()[0].u == 2


def test_tier9_everyday_functions(spark):
    """Tier-9 semantics pinned at the SQL-text layer: clamp RESETS the
    running-sum base (not just floors the output), bucket-floor falls back
    to the first element, the lenient parser takes multiple layouts and
    yields NULL when all fail, bit distance/rotation, normalizeQuery."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select arrayCumSumNonNegative(array(1.0, -4.0, 3.0)) as a, "
        "roundDown(7.0, array(1.0, 5.0, 10.0)) as rd, "
        "roundDown(0.5, array(1.0, 5.0, 10.0)) as rd_low, "
        "parseDateTimeBestEffort('31/12/2021') as p1, "
        "parseDateTimeBestEffort('20211231') as p2, "
        "parseDateTimeBestEffortOrNull('not a date') as p3, "
        "bitHammingDistance(12, 10) as bhd, "
        "bitRotateLeft(3, 2) as brl, "
        "normalizeQuery(\"select a from t where b = 5 and c = 'x7'\") as nq"
    ).collect()[0]
    # clamp resets: 1, max(1-4,0)=0, 0+3=3 (plain cumsum would end at 0)
    assert r.a == [1.0, 0.0, 3.0]
    assert r.rd == 5.0 and r.rd_low == 1.0
    assert str(r.p1).startswith("2021-12-31") and str(r.p2).startswith("2021-12-31")
    assert r.p3 is None
    assert r.bhd == 2 and r.brl == 12  # 12^10=0b0110 -> 2 bits; 3<<2
    assert r.nq == "select a from t where b = ? and c = ?"


def test_tier16_everyday_functions(spark):
    """Tier-16 goldens: formatReadableTimeDelta matches the CH docs
    example, firstSignificantSubdomain both heuristic branches, shingle
    windows, contiguous-subsequence search edge cases, rounding ladders,
    CIDR membership incl. /0, morton interleave, regex metachar escape."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select soundex('Robert') as sx, "
        "translateUTF8('abcd', 'ac', 'xy') as tr, "
        "regexpQuoteMeta('a.b*c{d') as rq, "
        "toYYYYMMDDhhmmss(toDateTime('2021-03-04 05:06:07')) as ymd, "
        "arrayShingles(array(1,2,3,4), 3) as sh, "
        "arrayShingles(array(1,2), 5) as sh_short, "
        "hasSubstr(array(1,2,3,4), array(2,3)) as hs_yes, "
        "hasSubstr(array(1,2,3,4), array(2,4)) as hs_no, "
        "hasSubstr(array(1,2), array()) as hs_empty, "
        "firstSignificantSubdomain('https://news.clickhouse.com.tr/p') "
        "  as fsd_cc, "
        "firstSignificantSubdomain('http://a.b.example.org/x') as fsd, "
        "formatReadableTimeDelta(7690) as frtd, "
        "formatReadableTimeDelta(0) as frtd0, "
        "formatReadableTimeDelta(90061) as frtd2, "
        "roundDuration(230) as rd, roundAge(29) as ra, "
        "toDecimalString(1.5, 4) as tds, "
        "mortonEncode(3, 1) as me, "
        "isIPAddressInRange('192.168.1.77', '192.168.0.0/16') as ip_in, "
        "isIPAddressInRange('10.0.0.1', '192.168.0.0/16') as ip_out, "
        "isIPAddressInRange('1.2.3.4', '0.0.0.0/0') as ip_all"
    ).collect()[0]
    assert r.sx == "R163"
    assert r.tr == "xbyd"
    assert r.rq == "a\\.b\\*c\\{d"
    assert r.ymd == 20210304050607
    assert r.sh == [[1, 2, 3], [2, 3, 4]] and r.sh_short == []
    assert (r.hs_yes, r.hs_no, r.hs_empty) == (True, False, True)
    assert r.fsd_cc == "clickhouse" and r.fsd == "example"
    # bare hostname (no scheme) — CH accepts it; parse_url alone would NULL
    r2 = eng.sql(
        "select firstSignificantSubdomain('news.clickhouse.com.tr') as f"
    ).collect()[0]
    assert r2.f == "clickhouse"
    # the CH docs example for formatReadableTimeDelta(7690)
    assert r.frtd == "2 hours, 8 minutes and 10 seconds"
    assert r.frtd0 == "0 seconds"
    assert r.frtd2 == "1 day, 1 hour, 1 minute and 1 second"
    assert r.rd == 180 and r.ra == 25
    assert r.tds == "1.5000"
    # x=3 -> even bits 0,2; y=1 -> odd bit 1 -> 0b111
    assert r.me == 7
    assert (r.ip_in, r.ip_out, r.ip_all) == (True, False, True)


def test_tier17_everyday_functions(spark):
    """Tier-17 goldens: bitmaskToList power decomposition, variadic
    bitTestAll/Any, unicode non-alpha splitting, the CH year-zero day
    count (TO_DAYS-compatible 739136), partial sort, server constants."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select cbrt(27.0) as c, "
        "bitmaskToList(21) as bl, "
        "bitTestAll(43, 0, 1, 3, 5) as bta, "
        "bitTestAll(41, 0, 1, 3, 5) as btf, "
        "bitTestAny(43, 6, 3) as bany, "
        "bitTestAny(16, 0, 1) as bnone, "
        "arrayStringConcat(splitByNonAlpha('hello, wörld_42! ok'), '|') "
        "  as sp, "
        "toDaysSinceYearZero(toDate('2023-09-08')) as dz, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  arrayPartialSort(2, array(3,1,2))), ',') as ps, "
        "fqdn() as f, tcpPort() as tp"
    ).collect()[0]
    assert r.c == 3.0
    assert r.bl == "1,4,16"
    assert (r.bta, r.btf, r.bany, r.bnone) == (True, False, True, False)
    assert r.sp == "hello|wörld|42|ok"
    assert r.dz == 739136  # MySQL TO_DAYS('2023-09-08'); CH matches
    assert r.ps == "1,2,3"
    assert r.f == "localhost" and r.tp == 9000


def test_tier18_everyday_functions(spark):
    """Tier-18 goldens: URL hierarchy cut (CH docs example), URL param
    list, Saturday week-end rounding, width_bucket, decimal readable
    size, simpleJSON* aliases, LIKE-filtered maps, the timeSlots grid
    (CH docs example), first-match needle index."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "cutToFirstSignificantSubdomain("
        "  'https://news.clickhouse.com.tr/path') as c1, "
        "cutToFirstSignificantSubdomain('paul.www.example.com') as c2, "
        "arrayStringConcat("
        "  extractURLParameters('http://e.com/?a=1&b=2&c='), '|') as up, "
        "toLastDayOfWeek(toDate('2023-09-08')) as ld, "
        "widthBucket(7.5, 0.0, 10.0, 5) as wb, "
        "formatReadableDecimalSize(123456789) as frd, "
        "toValidUTF8('abc') as tv, "
        "simpleJSONExtractString('{\"a\": \"x\"}', 'a') as js, "
        "simpleJSONExtractInt('{\"b\": 2}', 'b') as ji, "
        "simpleJSONExtractBool('{\"f\": true}', 'f') as jb, "
        "simpleJSONHas('{\"a\": 1}', 'z') as jn, "
        "mapContainsKeyLike(map('abc', 1, 'def', 2), 'a%') as mc, "
        "arrayStringConcat(mapKeys("
        "  mapExtractKeyLike(map('abc', 1, 'def', 2), 'd%'))) as mk, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "  timeSlots(toDateTime('2012-01-01 12:20:00'), 600)), '|') as ts, "
        "multiSearchFirstIndex('Hello World', "
        "  array('World', 'Hello')) as mi, "
        "multiSearchFirstIndex('Hello', array('x', 'y')) as m0"
    ).collect()[0]
    assert r.c1 == "clickhouse.com.tr"  # the CH docs example
    assert r.c2 == "example.com"
    assert r.up == "a=1|b=2|c="
    assert str(r.ld) == "2023-09-09"  # Friday -> Saturday (mode 0)
    assert r.wb == 4
    assert r.frd == "123.46 MB"
    assert r.tv == "abc"
    assert (r.js, r.ji, r.jb, r.jn) == ("x", 2, True, False)
    assert r.mc is True and r.mk == "def"
    # the CH docs example: two 1800s slots, 12:00 and 12:30
    assert r.ts == "2012-01-01 12:00:00|2012-01-01 12:30:00"
    # 'Hello' (needle 2) matches earliest; no match -> 0
    assert r.mi == 2 and r.m0 == 0


def test_tier19_everyday_functions(spark):
    """Tier-19 goldens: second truncation, DateTime64 casts, MySQL
    %-format parsing (incl. quoted literal letters like T), the
    JSONExtractBool/Raw/Length tail, and map arithmetic."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "toString(toStartOfSecond(toDateTime('2021-03-04 05:06:07')))"
        "  as ss, "
        "toString(toDateTime64('2021-03-04 05:06:07.125', 3)) as d64, "
        "toString(toDateTime64('2021-03-04 05:06:07.125', 0)) as d640, "
        "toString(toDateTime64('2021-03-04 05:06:07.129', 2)) as d642, "
        "toString(parseDateTime('2021-01-04+23:00:01', "
        "  '%Y-%m-%d+%H:%i:%s')) as pd, "
        "toString(parseDateTime('2023-09-08T11:22:33', "
        "  '%Y-%m-%dT%H:%i:%s')) as pdt, "
        "JSONExtractBool('{\"f\": true}', 'f') as jb, "
        "JSONExtractBool('{\"f\": true}', 'z') as jz, "
        "JSONExtractRaw('{\"a\": {\"b\": [1,2]}}', 'a') as jr, "
        "JSONLength('[1,2,3]') as jl1, "
        "JSONLength('{\"a\":1,\"b\":2}') as jl2, "
        "JSONLength('{\"a\": [1,2,3,4]}', 'a') as jl3, "
        "JSONLength('\"scalar\"') as jl0, "
        "arrayElement(mapAdd(map('a', 1, 'b', 2), map('b', 10, 'c', 3)),"
        "  'b') as ma, "
        "arrayElement(mapSubtract(map('a', 5), map('a', 2, 'z', 1)), "
        "  'z') as ms, "
        "arrayElement(mapUpdate(map('k', 1, 'j', 9), map('k', 7)), 'k')"
        "  as mu"
    ).collect()[0]
    assert r.ss == "2021-03-04 05:06:07"
    assert r.d64 == "2021-03-04 05:06:07.125"
    # scale truncates (not rounds) the fractional digits, like CH
    assert r.d640 == "2021-03-04 05:06:07"
    assert r.d642 == "2021-03-04 05:06:07.12"
    assert r.pd == "2021-01-04 23:00:01"  # the CH docs example
    assert r.pdt == "2023-09-08 11:22:33"
    assert (r.jb, r.jz) == (True, False)
    assert r.jr == '{"b":[1,2]}'
    assert (r.jl1, r.jl2, r.jl3, r.jl0) == (3, 2, 4, 0)
    assert (r.ma, r.ms, r.mu) == (12, -1, 7)


def test_tier20_everyday_functions(spark):
    """Tier-20 goldens: pure-SQL geohash encode/decode against the CH
    docs examples ('ezs42' both directions), IPv4 canonicalization,
    central angles, and exact distinct over unrolled arrays."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "geohashEncode(-5.60302734375, 42.60498046875, 5) as gh5, "
        "geohashEncode(-122.4194, 37.7749, 9) as sf9, "
        "tupleElement(geohashDecode('ezs42'), 1) as dlon, "
        "tupleElement(geohashDecode('ezs42'), 2) as dlat, "
        "geohashEncode(tupleElement(geohashDecode('9q8yyk8yt'), 1), "
        "  tupleElement(geohashDecode('9q8yyk8yt'), 2), 9) as rt, "
        "toIPv4('010.001.002.003') as ip, "
        "round(greatCircleAngle(-55.3, -23.5, -55.3, -22.5), 4) as gca"
    ).collect()[0]
    assert r.gh5 == "ezs42"  # the CH docs example
    assert r.sf9 == "9q8yyk8yt"
    # the CH docs example decode, exact: cell-center semantics
    assert (r.dlon, r.dlat) == (-5.60302734375, 42.60498046875)
    assert r.rt == "9q8yyk8yt"  # decode -> encode fixpoint
    assert r.ip == "10.1.2.3"
    assert r.gca == 1.0  # one degree of latitude = 1 degree of arc
    spark.sql(
        "select * from values (1, array(1,2)), (1, array(2,3)), "
        "(2, array(5)) as t(g, a)"
    ).createOrReplaceTempView("ua20")
    got = eng.sql(
        "select g, uniqArray(a) as u from ua20 group by g order by g"
    ).collect()
    assert [(x.g, x.u) for x in got] == [(1, 3), (2, 1)]


def test_tier21_everyday_functions(spark):
    """Tier-21 goldens: compact-integer date forms, Snowflake-ID time
    extraction (CH docs example, UTC rendering), sub-second
    truncation, first-match group capture (CH docs example), quarter
    intervals, server identity constant."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "toString(YYYYMMDDToDate(20230911)) as d, "
        "toString(YYYYMMDDhhmmssToDateTime(20230911131415)) as dt, "
        "toString(snowflakeToDateTime(1426860702823350272)) as sf, "
        "toString(snowflakeToDateTime(dateTimeToSnowflake("
        "  toDateTime('2021-08-15 18:57:56')))) as rt, "
        "toString(toStartOfMillisecond(toDateTime64("
        "  '2021-03-04 05:06:07.123456', 6))) as ms, "
        "arrayStringConcat(extractGroups('hello abc=111, def=2', "
        "  '([a-z]+)=([0-9]+)'), '|') as eg, "
        "size(extractGroups('none', '([0-9]+)')) as eg0, "
        "size(extractGroups('x', 'no[?:]groups')) as egn, "
        "arrayStringConcat(extractGroups('k=42', "
        "  '(?<key>[a-z]+)=(?<val>[0-9]+)'), '|') as egnamed, "
        "arrayStringConcat(extractGroups('ab12', "
        "  '(?<=a)(b)(?:x)?([0-9]+)'), '|') as eglook, "
        "toString(toDate('2023-01-31') + toIntervalQuarter(1)) as q, "
        "serverUUID() as su"
    ).collect()[0]
    assert r.d == "2023-09-11"
    assert r.dt == "2023-09-11 13:14:15"
    # the CH docs example id, rendered in UTC (docs show Asia/Shanghai)
    assert r.sf == "2021-08-15 10:57:56"
    assert r.rt == "2021-08-15 18:57:56"  # snowflake roundtrip
    assert r.ms == "2021-03-04 05:06:07.123"
    assert r.eg == "abc|111"  # the CH docs example (first match)
    assert r.eg0 == 0 and r.egn == 0  # no match / no groups -> []
    # named groups '(?<name>…)' ARE capturing in Java/CH regex, while
    # lookbehinds '(?<=' / '(?<!' are not (ADVICE r11)
    assert r.egnamed == "k|42"
    assert r.eglook == "b|12"
    assert r.q == "2023-04-30"  # month-end clamped, like CH
    assert r.su == "7e6fa0a1-7e6f-a0a1-7e6f-a0a17e6fa0a1"


def test_tier22_everyday_functions(spark):
    """Tier-22 goldens: relative date numbers, days-since-year-zero
    inverse, second-difference, MAC codecs (CH docs example), per-match
    group capture both orientations (CH docs example), multi-needle
    positions (CH docs example), UTF8 pads, map sorting, dense array
    enumeration, clamp."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "toRelativeYearNum(toDate('2023-04-01')) as ry, "
        "toRelativeMonthNum(toDate('2023-04-01')) as rm, "
        "toString(fromDaysSinceYearZero(739136)) as fd, "
        "toDaysSinceYearZero(fromDaysSinceYearZero(739136)) as fdrt, "
        "timeDiff(toDateTime('2023-01-01 00:00:00'), "
        "  toDateTime('2023-01-01 00:01:40')) as td, "
        "MACStringToNum('aa:bb:cc:dd:ee:ff') as mn, "
        "MACNumToString(MACStringToNum('aa:bb:cc:dd:ee:ff')) as mrt, "
        "MACNumToString(281474976710656) as m48, "
        "MACNumToString(-1) as mneg, "
        "multiSearchAllPositions('Hello, World!', "
        "  ['hello', '!', 'world']) as mp, "
        "extractAllGroups('abc=111, def=222', "
        "  '([a-z]+)=([0-9]+)') as eag, "
        "extractAllGroupsHorizontal('abc=111, def=222', "
        "  '([a-z]+)=([0-9]+)') as eagh, "
        "JSONArrayLength('[1,2,3]') as jal, "
        "leftPadUTF8('abc', 7, '*') as lp, "
        "rightPadUTF8('abc', 5) as rp, "
        "substringIndexUTF8('www.spark.apache.org', '.', 2) as si, "
        "map_keys(mapSort(map('c', 3, 'a', 1, 'b', 2))) as mks, "
        "map_keys(mapReverseSort(map('c', 3, 'a', 1, 'b', 2))) as mkr, "
        "arrayEnumerateDense([10, 20, 10, 30]) as aed, "
        "clamp(15, 0, 10) as cl, clamp(-3, 0, 10) as cl2, "
        "clamp(5, 0, 10) as cl3"
    ).collect()[0]
    assert (r.ry, r.rm) == (2023, 2023 * 12 + 4)
    assert r.fd == "2023-09-08" and r.fdrt == 739136  # tier-17 inverse
    assert r.td == 100
    assert r.mn == 0xAABBCCDDEEFF and r.mrt == "aa:bb:cc:dd:ee:ff"
    # LOW 48 bits exactly: 2^48 wraps to zero, -1 is all-ones (r12 review)
    assert r.m48 == "00:00:00:00:00:00" and r.mneg == "ff:ff:ff:ff:ff:ff"
    assert r.mp == [0, 13, 0]  # the CH docs example (case-sensitive)
    # the CH docs examples: vertical = per match, horizontal = per group
    assert r.eag == [["abc", "111"], ["def", "222"]]
    assert r.eagh == [["abc", "def"], ["111", "222"]]
    assert r.jal == 3
    assert (r.lp, r.rp) == ("****abc", "abc  ")
    assert r.si == "www.spark"
    assert r.mks == ["a", "b", "c"] and r.mkr == ["c", "b", "a"]
    assert r.aed == [1, 2, 1, 3]
    assert (r.cl, r.cl2, r.cl3) == (10, 0, 5)


def test_tier23_everyday_functions(spark):
    """Tier-23 goldens: last-match array search, ROC AUC (CH docs
    example), IPv6 literal validation, top-level JSON classification,
    map quantifiers, UUIDv7 shape, session-timezone introspection."""
    import re

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "arrayLast(x -> x < 3, [1, 2, 3]) as al, "
        "arrayLast(x -> x > 9, [1, 2, 3]) as al0, "
        "arrayLastIndex(x -> x < 3, [1, 2, 3]) as ali, "
        "arrayLastIndex(x -> x > 9, [1, 2, 3]) as ali0, "
        "arrayAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1]) as auc, "
        "isIPv6String('2001:0db8:85a3::8a2e:0370:7334') as i6a, "
        "isIPv6String('::1') as i6b, "
        "isIPv6String('::ffff:192.168.0.1') as i6c, "
        "isIPv6String('1.2.3.4') as i6d, "
        "isIPv6String('gggg::1') as i6e, "
        "isIPv6String('::ffff:192x168x0x1') as i6f, "
        "JSONType('{\"a\":1}') as jt1, JSONType('[1]') as jt2, "
        "JSONType('\"x\"') as jt3, JSONType('true') as jt4, "
        "JSONType('-12') as jt5, JSONType('1.5e3') as jt6, "
        "JSONType('whoops') as jt7, "
        "mapAll((k, v) -> v > 0, map('a', 1, 'b', 2)) as ma, "
        "mapAll((k, v) -> v > 1, map('a', 1, 'b', 2)) as ma0, "
        "mapExists((k, v) -> v > 1, map('a', 1, 'b', 2)) as me, "
        "generateUUIDv7() as u7, "
        "timezoneOf(now()) as tz, timeZoneOffset(now()) as tzo"
    ).collect()[0]
    assert (r.al, r.al0) == (2, None)  # NULL-not-default documented
    assert (r.ali, r.ali0) == (2, 0)
    assert r.auc == 0.75  # the CH docs example
    # i6f: the IPv4-mapped tail's dots must be LITERAL dots (r12 review)
    assert (r.i6a, r.i6b, r.i6c, r.i6d, r.i6e, r.i6f) == (1, 1, 1, 0, 0, 0)
    assert (r.jt1, r.jt2, r.jt3, r.jt4) == (
        "Object", "Array", "String", "Bool")
    assert (r.jt5, r.jt6, r.jt7) == ("Int64", "Double", "")
    assert (r.ma, r.ma0, r.me) == (True, False, True)
    # RFC 9562: version nibble 7, variant 10xx, 48-bit ms timestamp
    assert re.fullmatch(
        r"[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}"
        r"-[0-9a-f]{12}", r.u7)
    assert (r.tz, r.tzo) == ("UTC", 0)


def test_tier24_everyday_functions(spark):
    """Tier-24 goldens: 4-gram text similarity (closed-form cases),
    normalized-query hashing (literal-insensitive), Monday-rollover
    relative week numbers, flat-JSON pair extraction, elementwise tuple
    arithmetic on the array tuple model."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "ngramDistance('abcde', 'abcde') as nd0, "
        "ngramDistance('abcde', 'vwxyz') as nd1, "
        "ngramDistance('abcdef', 'abcdeg') as ndm, "
        "ngramDistanceCaseInsensitive('ABCDE', 'abcde') as ndi, "
        "ngramSearch('hello world', 'world') as ns1, "
        "ngramSearch('hello world', 'zzzz') as ns0, "
        "normalizedQueryHash(\"select 1 from t where x = 'a'\") "
        "  = normalizedQueryHash(\"select 22 from t where x = 'bb'\") "
        "  as nqsame, "
        "normalizedQueryHash('select a from t') "
        "  = normalizedQueryHash('select b from t') as nqdiff, "
        "toRelativeWeekNum(toDate('1970-01-01')) as rw0, "
        "toRelativeWeekNum(toDate('1970-01-05')) as rw1, "
        "toRelativeWeekNum(toDate('1970-01-11')) as rw1b, "
        "toRelativeWeekNum(toDate('1970-01-12')) as rw2, "
        "arrayStringConcat(arrayMap(__p -> concat(__p.key, '=', "
        "  toString(__p.value)), JSONExtractKeysAndValues("
        "  '{\"a\": 1, \"b\": 2}', 'Int64')), ',') as jkv, "
        "identity(42) as idn, "
        "tuplePlus([1, 2], [10, 20]) as tp, "
        "tupleMinus([10, 20], [1, 2]) as tm, "
        "tupleMultiply([2, 3], [4, 5]) as tx, "
        "tupleNegate([1, -2]) as tn, "
        "vectorSum([1, 2], [3, 4]) as vs"
    ).collect()[0]
    # identical -> 0; disjoint -> 1; 'abcdef' vs 'abcdeg' share 2 of 3
    # grams per side -> 1 - 2*2/6 = 1/3
    assert (r.nd0, r.nd1) == (0.0, 1.0)
    assert abs(r.ndm - 1 / 3) < 1e-9
    assert r.ndi == 0.0
    assert (r.ns1, r.ns0) == (1.0, 0.0)
    # literals normalize to '?' -> same hash; different identifiers don't
    assert r.nqsame is True and r.nqdiff is False
    # weeks roll over on Monday (1970-01-05 was the first Monday)
    assert (r.rw0, r.rw1, r.rw1b, r.rw2) == (0, 1, 1, 2)
    assert r.jkv == "a=1,b=2"
    assert r.idn == 42
    assert r.tp == [11, 22] and r.tm == [9, 18]
    assert r.tx == [8, 15] and r.tn == [-1, 2] and r.vs == [4, 6]


def test_tier25_aggregate_functions(spark):
    """Tier-25 goldens: sample-moment skew/kurtosis ((n-1)/n rescale of
    the population forms), theta-sketch alias, interval sweep
    (maxIntersections), sorted/weighted/deterministic quantile
    variants, plain topK (default k=10)."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    spark.sql(
        "select * from values (1.0, 1.0, 0.0, 10.0), (2.0, 1.0, 5.0, "
        "15.0), (3.0, 2.0, 8.0, 12.0), (4.0, 6.0, 20.0, 30.0), "
        "(2.0, 1.0, 11.0, 14.0) as t(x, w, s, e)"
    ).createOrReplaceTempView("t25")
    r = eng.sql(
        "select skewSamp(x) as ss, kurtSamp(x) as ks, skewPop(x) as sp, "
        "kurtPop(x) as kp, uniqThetaSketch(x) as uts, "
        "maxIntersections(s, e) as mi, groupArraySorted(3)(x) as gas, "
        "quantileBFloat16(0.5)(x) as qb, "
        "quantileDeterministic(0.5, 42)(x) as qd, "
        "quantileExactWeighted(0.5)(x, w) as qew, topK(x) as tk "
        "from t25"
    ).collect()[0]
    n = 5
    assert abs(r.ss - r.sp * ((n - 1) / n) ** 1.5) < 1e-9
    assert abs(r.ks - r.kp * ((n - 1) / n) ** 2) < 1e-9
    assert r.uts == 4
    # [0,10),[5,15),[8,12) are all open during [8,10) -> peak 3
    assert r.mi == 3
    assert [float(v) for v in r.gas] == [1.0, 2.0, 2.0]
    assert float(r.qb) == 2.0 and r.qd == 2.0
    # pairs (1,1),(2,1),(2,1),(3,2),(4,6): total 11, running weight
    # first reaches 5.5 at x=4
    assert r.qew == 4.0
    # frequency desc, value asc: 2.0 twice, then 1/3/4 once each
    assert [float(v) for v in r.tk] == [2.0, 1.0, 3.0, 4.0]


def test_tier26_everyday_functions(spark):
    """Tier-26 goldens: digit counts, random-distribution shapes,
    bitmask explosion, morton deinterleave roundtrip, strict casts,
    throwIf both branches."""
    import pytest as _pt

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "countDigits(12345) as cd, countDigits(0) as cd0, "
        "countDigits(-987) as cdn, "
        "randUniform(5, 10) as ru, randNormal(0, 1) as rn, "
        "randBernoulli(0.5) as rb, randExponential(2.0) as re, "
        "length(randPrintableASCII(12)) as rp, "
        "bitmaskToArray(50) as bma, bitPositionsToArray(50) as bpa, "
        "toColumnTypeName(1) as tct, "
        "toStringCutToZero(concat('ab', char(0), 'cd')) as scz, "
        "throwIf(1 > 2, 'nope') as ti, "
        "accurateCast('123', 'Int64') as ac, "
        "accurateCastOrNull('xx', 'Int64') as acn, "
        "mortonDecode(2, mortonEncode(99, 17)) as md"
    ).collect()[0]
    assert (r.cd, r.cd0, r.cdn) == (5, 1, 3)
    assert 5 <= r.ru < 10 and r.rb in (0, 1) and r.re >= 0 and r.rp == 12
    assert r.bma == [2, 16, 32] and r.bpa == [1, 4, 5]  # 50 = 0b110010
    assert r.tct == "int" and r.scz == "ab" and r.ti == 0
    assert r.ac == 123 and r.acn is None
    assert r.md == [99, 17]  # deinterleave inverts the encode
    with _pt.raises(Exception, match="boom"):
        eng.sql("select throwIf(2 > 1, 'boom') as x").collect()
    # strict accurateCast RAISES on a failed conversion (upstream CH
    # semantic) — both the unparseable-string and the numeric-overflow
    # shapes; NULL input stays NULL without raising
    with _pt.raises(Exception, match="accurateCast"):
        eng.sql("select accurateCast('xx', 'Int64') as x").collect()
    with _pt.raises(Exception, match="accurateCast"):
        eng.sql("select accurateCast('300', 'Int8') as x").collect()
    r2 = eng.sql(
        "select accurateCast(cast(null as string), 'Int64') as acn, "
        # bit 63 (the sign bit of the signed reinterpretation) is part of
        # the UInt64 domain: the mask component surfaces as Long.MIN_VALUE
        "bitmaskToArray(cast(-9223372036854775808 as bigint)) as hi, "
        "bitPositionsToArray(-1) as allbits"
    ).collect()[0]
    assert r2.acn is None
    assert r2.hi == [-9223372036854775808]
    assert list(r2.allbits) == list(range(64))


def test_tier27_everyday_functions(spark):
    """Tier-27 goldens: date construction (both makeDate arities),
    snowflake-ID codecs, subsequence tests, time-delta parsing, jump
    consistent hashing (goldens from the published algorithm,
    arXiv:1406.2294), byte-level hamming, first-line / basename."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "toString(makeDate(2024, 2, 29)) as md3, "
        "toString(makeDate(2024, 60)) as md2, "
        "toString(makeDateTime(2024, 2, 29, 12, 30, 45)) as mdt, "
        "dateTimeToSnowflakeID(toDateTime('2021-08-15 18:57:56')) as dtsf, "
        "toString(snowflakeIDToDateTime(dateTimeToSnowflakeID("
        "  toDateTime('2021-08-15 18:57:56')))) as sfrt, "
        "hasSubsequence('garbage', 'arg') as hs1, "
        "hasSubsequence('garbage', 'arbw') as hs0, "
        "hasSubsequenceCaseInsensitive('garbage', 'ARG') as hsc, "
        "parseTimeDelta('1 min 35 seconds') as ptd, "
        "parseTimeDelta('0.5 h 2min') as ptd2, "
        "toBool('true') as tb, toBool(0) as tb0, "
        "jumpConsistentHash(0, 16) as j0, jumpConsistentHash(1, 16) as j1, "
        "jumpConsistentHash(2, 16) as j2, jumpConsistentHash(7, 16) as j7, "
        "jumpConsistentHash(12345, 16) as jk, "
        "jumpConsistentHash(999999999999, 16) as jb, "
        "multiSearchFirstPosition('hello world', "
        "  array('or', 'lo', 'zz')) as msfp, "
        "multiSearchFirstPosition('hello', array('zz')) as msfp0, "
        "countSubstringsCaseInsensitive('AbaBab', 'ab') as cci, "
        "byteHammingDistance('abc', 'abd') as bh1, "
        "byteHammingDistance('abc', 'ab') as bh2, "
        "byteHammingDistance('', 'xy') as bh3, "
        "byteHammingDistance('héllo', 'hello') as bh4, "
        "firstLine(concat('foo', char(10), 'bar')) as fl, "
        "basename('/usr/local/bin/tool') as bn, "
        "basename('C:\\\\win\\\\file.txt') as bn2, "
        "basename('plain') as bn3"
    ).collect()[0]
    assert r.md3 == "2024-02-29" and r.md2 == "2024-02-29"
    assert r.mdt == "2024-02-29 12:30:45"
    assert r.sfrt == "2021-08-15 18:57:56"  # codec roundtrip
    assert r.dtsf == 1426981498778550272  # (unix_ms - epoch) << 22
    assert (r.hs1, r.hs0, r.hsc) == (1, 0, 1)
    assert r.ptd == 95.0 and r.ptd2 == 1920.0
    assert r.tb is True and r.tb0 is False
    # goldens computed from the reference C algorithm (arXiv:1406.2294)
    assert (r.j0, r.j1, r.j2, r.j7) == (0, 6, 15, 13)
    assert (r.jk, r.jb) == (1, 12)
    assert r.msfp == 4 and r.msfp0 == 0  # 'lo' at 4 beats 'or' at 8
    assert r.cci == 3
    # common-prefix byte diffs + length delta; é is TWO bytes
    assert (r.bh1, r.bh2, r.bh3, r.bh4) == (1, 1, 2, 4)
    assert r.fl == "foo"
    assert (r.bn, r.bn2, r.bn3) == ("tool", "file.txt", "plain")


def test_tier28_everyday_functions(spark):
    """Tier-28 goldens: error functions (Numerical Recipes erfc, tol
    2e-7), Jaro / Jaro-Winkler (classic textbook values), two-sample
    proportion z-test (algebra exact; p-value via erfc; CI via Acklam's
    inverse normal, tol 1e-8), A/B sample sizing, sparkbar rendering."""
    import math
    import statistics

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select erf(0.5) as e1, erfc(1.0) as e2, erfc(-1.2) as e3, "
        "jaroSimilarity('martha', 'marhta') as js, "
        "jaroSimilarity('dwayne', 'duane') as js2, "
        "jaroSimilarity('', 'abc') as js0, "
        "jaroWinklerSimilarity('dixon', 'dicksonx') as jw, "
        "jaroWinklerSimilarity('martha', 'marhta') as jw2, "
        "proportionsZTest(120, 100, 1000, 1000, 0.95, 'unpooled') as zt, "
        "proportionsZTest(120, 100, 1000, 1000, 0.95, 'pooled') as ztp, "
        "minSampleSizeConversion(0.25, 0.03, 0.80, 0.05) as mssc, "
        "minSampleSizeContinous(112.5, 21.1, 0.03, 0.80, 0.05) as msst"
    ).collect()[0]
    assert abs(r.e1 - math.erf(0.5)) < 2e-7
    assert abs(r.e2 - math.erfc(1.0)) < 2e-7
    assert abs(r.e3 - math.erfc(-1.2)) < 2e-7
    assert abs(r.js - 0.9444444444444445) < 1e-12
    assert abs(r.js2 - 0.8222222222222223) < 1e-12
    assert r.js0 == 0.0
    assert abs(r.jw - 0.8133333333333332) < 1e-12
    assert abs(r.jw2 - 0.9611111111111111) < 1e-12
    nd = statistics.NormalDist()
    p1, p2, t1, t2 = 0.12, 0.10, 1000, 1000
    se_u = math.sqrt(p1 * (1 - p1) / t1 + p2 * (1 - p2) / t2)
    pp = 220 / 2000
    se_p = math.sqrt(pp * (1 - pp) * (1 / t1 + 1 / t2))
    zq = nd.inv_cdf(0.975)
    assert abs(r.zt._1 - (p1 - p2) / se_u) < 1e-12
    assert abs(r.zt._2 - math.erfc(abs(r.zt._1) / math.sqrt(2))) < 2e-7
    assert abs(r.zt._3 - ((p1 - p2) - zq * se_u)) < 1e-8
    assert abs(r.zt._4 - ((p1 - p2) + zq * se_u)) < 1e-8
    assert abs(r.ztp._1 - (p1 - p2) / se_p) < 1e-12
    zs = nd.inv_cdf(0.975) + nd.inv_cdf(0.80)
    n_conv = zs * zs * (0.25 * 0.75 + 0.28 * 0.72) / (0.03 * 0.03)
    assert abs(r.mssc._1 - n_conv) < 1e-4 * n_conv
    assert (r.mssc._2, r.mssc._3) == (0.22, 0.28)
    n_cont = 2 * zs * zs * 21.1 * 21.1 / (0.03 * 112.5) ** 2
    assert abs(r.msst._1 - n_cont) < 1e-4 * n_cont
    assert (r.msst._2, r.msst._3) == (109.125, 115.875)
    # sparkbar: 4 buckets over x in 0..3, y weights 1,2,3,8 -> last bin
    # is the full block, first is one eighth-level up from empty
    spark.sql(
        "select * from values (0, 1), (1, 2), (2, 3), (3, 8) as t(x, y)"
    ).createOrReplaceTempView("sb_t")
    got = eng.sql(
        "select sparkbar(4)(x, y) as sb, "
        "sparkbar(2)(x, y) as sb2 from sb_t"
    ).collect()[0]
    assert got.sb == "▁▂▃█"
    # two bins: 1+2=3 vs 3+8=11 -> floor(3/11*8)=2 -> 3rd glyph? no:
    # floor(24/11)=2 -> index 3 glyph '▃'; max bin '█'
    assert got.sb2 == "▃█"


def test_tier29_everyday_functions(spark):
    """Tier-29 goldens: true Damerau-Levenshtein (unrestricted — the
    'ca'->'abc'=2 case OSA gets wrong), UTF8 edit distances, second-
    precision ts64 codecs, nanosecond arithmetic (micro-truncating),
    unaligned zip, even-odd point-in-polygon, great-circle meters,
    Java/Hive string hashes (javaHash('Hello, world!') = -1880044555 is
    the upstream docs example), CIDR ranges, OrDefault IP parses."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "damerauLevenshteinDistance('ca', 'abc') as dl1, "
        "damerauLevenshteinDistance('abcd', 'acbd') as dl2, "
        "damerauLevenshteinDistance('kitten', 'sitting') as dl3, "
        "damerauLevenshteinDistance('', 'xy') as dl0, "
        "levenshteinDistanceUTF8('kitten', 'sitting') as lv, "
        "editDistanceUTF8('héllo', 'hello') as lvu, "
        "toUnixTimestamp64Second(toDateTime('2021-08-15 18:57:56')) as t64, "
        "toString(fromUnixTimestamp64Second(1629053876)) as f64, "
        "toString(addNanoseconds(toDateTime('2021-01-01 00:00:00'), "
        "  1500)) as an, "
        "toString(subtractNanoseconds(toDateTime('2021-01-01 00:00:00'), "
        "  2000)) as sn, "
        "arrayZipUnaligned(array(1, 2, 3), array('a')) as azu, "
        "pointInPolygon(tuple(3.0D, 3.0D), array(tuple(6.0D, 0.0D), "
        "  tuple(8.0D, 4.0D), tuple(5.0D, 8.0D), tuple(0.0D, 2.0D))) "
        "  as pin, "
        "pointInPolygon(tuple(10.0D, 10.0D), array(tuple(6.0D, 0.0D), "
        "  tuple(8.0D, 4.0D), tuple(5.0D, 8.0D), tuple(0.0D, 2.0D))) "
        "  as pout, "
        "round(greatCircleDistance(-86.5812D, 34.7306D, "
        "  -86.5810D, 34.7305D), 1) as gcd, "
        "javaHash('Hello, world!') as jh, javaHash('abc') as jha, "
        "javaHash('') as jh0, hiveHash('Hello, world!') as hh, "
        "(IPv4CIDRToRange('192.168.5.2', 16))._1 as clo, "
        "(IPv4CIDRToRange('192.168.5.2', 16))._2 as chi, "
        "toIPv4OrDefault('10.0.0.1') as v4, "
        "toIPv4OrDefault('10.0.0.999') as v4b, "
        "toIPv6OrDefault('2001:db8::1') as v6, "
        "toIPv6OrDefault('nope') as v6b"
    ).collect()[0]
    assert (r.dl1, r.dl2, r.dl3, r.dl0) == (2, 1, 3, 2)
    assert r.lv == 3 and r.lvu == 1  # char-based: é vs e is ONE edit
    assert r.t64 == 1629053876 and r.f64 == "2021-08-15 18:57:56"
    assert r.an == "2021-01-01 00:00:00.000001"  # 1500 ns -> 1 us
    assert r.sn == "2020-12-31 23:59:59.999998"
    assert [tuple(x) for x in r.azu] == [(1, "a"), (2, None), (3, None)]
    assert (r.pin, r.pout) == (1, 0)
    assert 15 < r.gcd < 30  # ~21 m for ~0.0002 deg
    assert r.jh == -1880044555 and r.jha == 96354 and r.jh0 == 0
    assert r.hh == -1880044555 & 0x7FFFFFFF
    assert (r.clo, r.chi) == ("192.168.0.0", "192.168.255.255")
    assert (r.v4, r.v4b) == ("10.0.0.1", "0.0.0.0")
    assert (r.v6, r.v6b) == ("2001:db8::1", "::")


def test_tier30_everyday_functions(spark):
    """Tier-30 goldens: base58 codecs (the published 'Hello World!'
    vector, zero-byte padding, roundtrips, strict-vs-try decode), Joda
    datetime formatting, random array sampling."""
    import pytest as _pt

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select base58Encode('Hello World!') as b1, "
        "base58Encode('abc') as b2, base58Encode('') as b0, "
        "base58Encode(concat(char(0), char(0), 'abc')) as bz, "
        "base58Decode('2NEpo7TZRRrLZSi2U') as d1, "
        "base58Decode(base58Encode('The quick brown fox')) as rt, "
        "tryBase58Decode('ZiCa') as t1, tryBase58Decode('0OIl') as t0, "
        "formatDateTimeInJodaSyntax(toDateTime('2010-04-30 18:20:55'), "
        "  'yyyy-MM-dd HH:mm:ss') as fj, "
        "fromUnixTimestampInJodaSyntax(1629053876, 'yyyyMMdd') as fu, "
        "arrayRandomSample(array(1, 2, 3, 4, 5), 3) as ars, "
        "arrayRandomSample(array(1, 2), 9) as ars2"
    ).collect()[0]
    assert r.b1 == "2NEpo7TZRRrLZSi2U"  # the published test vector
    assert r.b2 == "ZiCa" and r.b0 == ""
    assert r.bz == "11ZiCa"  # leading zero bytes -> leading '1's
    assert r.d1 == "Hello World!"
    assert r.rt == "The quick brown fox"
    assert r.t1 == "abc" and r.t0 == ""  # 0OIl are not in the alphabet
    assert r.fj == "2010-04-30 18:20:55"
    assert r.fu == "20210815"
    assert len(r.ars) == 3 and set(r.ars) <= {1, 2, 3, 4, 5}
    assert sorted(r.ars2) == [1, 2]  # k beyond size: whole array
    with _pt.raises(Exception, match="base58Decode"):
        eng.sql("select base58Decode('0OIl') as x").collect()


def test_tier31_everyday_functions(spark):
    """Tier-31 goldens: chi-square association family (Cramér's V plain
    and bias-corrected, contingency coefficient, Theil's U) against
    first-principles Python counts; Mann-Whitney U (midranks + tie-
    corrected normal approximation); known-variance mean z-test;
    interval union length; bounding ratio; GK quantiles; and the
    order-dependent folds (deltaSum, moving sum/avg windows,
    groupArrayLast, exponential moving average) on a single-partition
    ordered source."""
    import math
    from collections import Counter

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    spark.sql(
        "select id, id % 3 as a, (id % 3 + id % 2) % 4 as b, "
        "cast(id % 7 as double) as v, cast(id % 2 as int) as g "
        "from range(200)"
    ).createOrReplaceTempView("t31")
    r = eng.sql(
        "select cramersV(a, b) as cv, "
        "cramersVBiasCorrected(a, b) as cvb, "
        "contingency(a, b) as cg, theilsU(a, b) as tu, "
        "mannWhitneyUTest(v, g) as mw, "
        "meanZTest(4.0, 4.0, 0.95)(v, g) as mz, "
        "intervalLengthSum(cast(id % 10 as double), "
        "  cast(id % 10 + 3 as double)) as ils, "
        "boundingRatio(cast(id as double), "
        "  cast(id * 2 + 1 as double)) as br, "
        "quantileGK(100)(v) as qgk, quantileGK(100, 0.25)(v) as q25 "
        "from t31"
    ).collect()[0]
    rows = [(i % 3, (i % 3 + i % 2) % 4) for i in range(200)]
    n = len(rows)
    ca, cb = Counter(x for x, _ in rows), Counter(y for _, y in rows)
    cab = Counter(rows)
    chi2 = sum(
        (c - ca[x] * cb[y] / n) ** 2 / (ca[x] * cb[y] / n)
        for (x, y), c in cab.items()
    )
    assert math.isclose(
        r.cv, math.sqrt(chi2 / (n * (min(len(ca), len(cb)) - 1)))
    )
    assert math.isclose(r.cg, math.sqrt(chi2 / (chi2 + n)))
    phi2c = max(0.0, chi2 / n - (len(ca) - 1) * (len(cb) - 1) / (n - 1))
    kc = len(ca) - (len(ca) - 1) ** 2 / (n - 1)
    rc = len(cb) - (len(cb) - 1) ** 2 / (n - 1)
    assert math.isclose(r.cvb, math.sqrt(phi2c / min(kc - 1, rc - 1)))
    ha = -sum((c / n) * math.log(c / n) for c in ca.values())
    hab = -sum(
        (c / n) * math.log((c / n) / (cb[y] / n))
        for (x, y), c in cab.items()
    )
    assert math.isclose(r.tu, (ha - hab) / ha)
    # Mann-Whitney via midranks and tie-corrected sigma
    vals = [(float(i % 7), i % 2) for i in range(200)]
    cnt = Counter(v for v, _ in vals)
    less, acc = {}, 0
    for u in sorted(cnt):
        less[u] = acc
        acc += cnt[u]
    n1 = sum(1 for _, gg in vals if gg == 0)
    n2 = len(vals) - n1
    r1 = sum(less[v] + (cnt[v] + 1) / 2 for v, gg in vals if gg == 0)
    uu = r1 - n1 * (n1 + 1) / 2
    ts = sum(c**3 - c for c in cnt.values())
    nn = len(vals)
    sig = math.sqrt(n1 * n2 / 12 * ((nn + 1) - ts / (nn * (nn - 1))))
    z = (uu - n1 * n2 / 2) / sig
    assert r.mw._1 == uu
    assert abs(r.mw._2 - math.erfc(abs(z) / math.sqrt(2))) < 2e-7
    m0 = sum(v for v, gg in vals if gg == 0) / n1
    m1 = sum(v for v, gg in vals if gg == 1) / n2
    se = math.sqrt(4.0 / n1 + 4.0 / n2)
    assert math.isclose(r.mz._1, (m0 - m1) / se)
    assert r.ils == 12.0  # [0,3]..[9,12] union = [0,12]
    assert math.isclose(r.br, 2.0)
    assert (float(r.qgk), float(r.q25)) == (3.0, 1.0)
    # order-dependent folds on a single ordered partition
    spark.sql(
        "select * from values (1, 3.0, 1.0), (2, 1.0, 2.0), "
        "(3, 4.0, 3.0), (4, 2.0, 4.0), (5, 6.0, 5.0) as t(i, v, ts)"
    ).coalesce(1).createOrReplaceTempView("ord31")
    r2 = eng.sql(
        "select deltaSum(v) as ds, groupArrayMovingSum(v) as gms, "
        "groupArrayMovingSum(2)(v) as gms2, "
        "groupArrayMovingAvg(2)(v) as gma2, "
        "groupArrayLast(3)(v) as gal, "
        "exponentialMovingAverage(1)(v, ts) as ema from ord31"
    ).collect()[0]
    assert r2.ds == 7.0  # +3 (1->4) +4 (2->6)
    assert r2.gms == [3.0, 4.0, 8.0, 10.0, 16.0]
    assert r2.gms2 == [3.0, 4.0, 5.0, 6.0, 8.0]
    assert r2.gma2 == [3.0, 2.0, 2.5, 3.0, 4.0]
    assert [float(x) for x in r2.gal] == [4.0, 2.0, 6.0]
    num = sum(v * 0.5 ** (5 - t) for v, t in
              [(3, 1), (1, 2), (4, 3), (2, 4), (6, 5)])
    den = sum(0.5 ** (5 - t) for t in [1, 2, 3, 4, 5])
    assert abs(r2.ema - num / den) < 1e-12


def test_tier32_event_sequence_aggregates(spark):
    """Tier-32 goldens: windowFunnel (chain start propagation, window
    cutoff, level-1 restart-overwrite rescuing a late funnel),
    retention, sequenceMatch subsequence semantics (one ROW advances at
    most one pattern position), sequenceCount non-overlapping counting,
    and the loud rejection of unsupported pattern shapes."""
    import pytest as _pt

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    rows = [
        (1, 1.0, "view"), (1, 2.0, "click"), (1, 3.0, "purchase"),
        (2, 1.0, "view"), (2, 20.0, "click"),
        (3, 1.0, "view"), (3, 2.0, "purchase"),
        (4, 1.0, "view"), (4, 15.0, "view"), (4, 16.0, "click"),
        (4, 17.0, "purchase"),
        (5, 1.0, "view"), (5, 2.0, "click"), (5, 3.0, "view"),
        (5, 4.0, "click"),
    ]
    vals = ", ".join(
        f"({u}, timestamp_seconds({t}), '{e}')" for u, t, e in rows
    )
    spark.sql(
        f"select * from values {vals} as t(u, ts, et)"
    ).createOrReplaceTempView("ev32")
    got = eng.sql(
        "select u, "
        "windowFunnel(10)(ts, et = 'view', et = 'click', "
        "  et = 'purchase') as wf, "
        "retention(et = 'view', et = 'click', et = 'purchase') as ret, "
        "sequenceMatch('(?1).*(?2)')(ts, et = 'view', "
        "  et = 'purchase') as sm, "
        "sequenceMatch('(?2).*(?1)')(ts, et = 'view', "
        "  et = 'purchase') as smr, "
        "sequenceCount('(?1).*(?2)')(ts, et = 'view', et = 'click') "
        "  as sc "
        "from ev32 group by u order by u"
    ).collect()
    exp = {
        # user: (funnel, retention, match, reverse-match, count)
        1: (3, [1, 1, 1], 1, 0, 1),
        2: (1, [1, 1, 0], 0, 0, 1),  # click at t=20 misses window 10
        3: (1, [1, 0, 1], 1, 0, 0),
        4: (3, [1, 1, 1], 1, 0, 1),  # level-1 restart at t=15 rescues
        5: (2, [1, 1, 0], 0, 0, 2),  # two non-overlapping view->click
    }
    for row in got:
        wf, ret, sm, smr, sc = exp[row.u]
        assert row.wf == wf, ("wf", row.u, row.wf)
        assert list(row.ret) == ret, ("ret", row.u)
        assert (row.sm, row.smr, row.sc) == (sm, smr, sc), ("seq", row.u)
    # one row matching BOTH pattern steps cannot complete a 2-step match
    one = eng.sql(
        "select sequenceMatch('(?1).*(?2)')(ts, et = 'view', u = 3) "
        "as x from ev32 where u = 3 and et = 'view'"
    ).collect()[0].x
    assert one == 0
    # unsupported shapes are rejected loudly, never silently mis-matched
    for pat in ["'(?1)(?2)'", "'(?t<=3600)(?1)'", "'(?1).*(?9)'"]:
        with _pt.raises(Exception):
            eng.sql(
                f"select sequenceMatch({pat})(ts, et = 'view', "
                "et = 'click') as x from ev32"
            ).collect()


def test_tier33_everyday_functions(spark):
    """Tier-33 goldens: timezone shims against the no-DST IST offset,
    interval add/sub, CH negative-length UTF8 prefix/suffix, variadic
    array set algebra, readable-size parsing (binary + decimal ladders,
    strict raise, OrNull/OrZero), positive modulo, and the filtered /
    single-value aggregates."""
    import pytest as _pt

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select "
        "unix_timestamp(toUTCTimestamp(timestamp'2024-03-15 12:00:00', "
        "  'Asia/Kolkata')) - unix_timestamp("
        "  timestamp'2024-03-15 12:00:00') as uo, "
        "unix_timestamp(fromUTCTimestamp(timestamp'2024-03-15 12:00:00', "
        "  'Asia/Kolkata')) - unix_timestamp("
        "  timestamp'2024-03-15 12:00:00') as fo, "
        "date_diff('day', date'2024-01-01', date'2024-03-01') as dd, "
        "addDate(date'2024-01-01', interval 3 day) as ad, "
        "subDate(date'2024-01-10', interval 3 day) as sd, "
        "leftUTF8('héllo', 3) as l3, leftUTF8('héllo', -2) as lm2, "
        "rightUTF8('héllo', 3) as r3, rightUTF8('héllo', -2) as rm2, "
        "leftUTF8('ab', -5) as lneg, rightUTF8('ab', -5) as rneg, "
        "positiveModulo(-7, 3) as pm, positive_modulo(7, 3) as pm2, "
        "regexpExtract('1-URGENT', '(\\\\d+)-(\\\\w+)', 2) as re2, "
        "regexpExtract('1-URGENT', '(\\\\d+)', 1) as re1, "
        "arrayUnion(array(1,2), array(2,3), array(5)) as au, "
        "arraySymmetricDifference(array(1,2,3), array(2,3,4)) as asd, "
        "arraySymmetricDifference(array(1,9), array(2,9), array(3,9)) "
        "  as asd3, "
        "parseReadableSize('1.5 MiB') as prs, "
        "parseReadableSize('3 KB') as prkb, "
        "parseReadableSize('  2TiB ') as prt, "
        "parseReadableSizeOrNull('garbage') as prn, "
        "parseReadableSizeOrZero('garbage') as prz"
    ).collect()[0]
    assert (r.uo, r.fo, r.dd) == (-19800, 19800, 60)
    assert (str(r.ad), str(r.sd)) == ("2024-01-04", "2024-01-07")
    assert (r.l3, r.lm2, r.r3, r.rm2) == ("hél", "hél", "llo", "llo")
    assert (r.lneg, r.rneg) == ("", "")
    assert (r.pm, r.pm2) == (2, 1)
    assert (r.re2, r.re1) == ("URGENT", "1")
    assert sorted(r.au) == [1, 2, 3, 5]
    assert sorted(r.asd) == [1, 4]
    assert sorted(r.asd3) == [1, 2, 3]
    assert r.prs == 1572864 and r.prkb == 3000
    assert r.prt == 2 * 1024**4
    assert r.prn is None and r.prz == 0
    r2 = eng.sql(
        "select singleValueOrNull(x) as s1, singleValueOrNull(y) as s2, "
        "sumMapFiltered(array('a','c'))(m) as smf "
        "from values (1, 1, map('a',1.0,'b',2.0)), "
        "(1, 2, map('a',3.0,'c',4.0)) as t(x,y,m)"
    ).collect()[0]
    assert r2.s1 == 1 and r2.s2 is None
    assert list(r2.smf._1) == ["a", "c"]
    assert list(r2.smf._2) == [4.0, 4.0]
    with _pt.raises(Exception):
        eng.sql("select parseReadableSize('nope') as x").collect()


def test_tier34_ordered_aggregates(spark):
    """Tier-34 goldens: Spearman with and without ties (hand-computed),
    timestamp-ordered positive-delta sum (with a same-t tie broken by
    the struct sort), the exponentialTimeDecayed family against closed
    forms, exclusive vs inclusive exact quantiles, and group array
    intersection."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select rankCorr(x, y) as rc from values "
        "(1,2),(2,1),(3,4),(4,3),(5,5) as t(x,y)"
    ).collect()[0]
    assert abs(r.rc - 0.8) < 1e-12
    r = eng.sql(
        "select rankCorr(x, y) as rc from values "
        "(1,1),(1,2),(2,3) as t(x,y)"
    ).collect()[0]
    assert abs(r.rc - 4.5 / (4.5 * 6.0) ** 0.5) < 1e-12
    r = eng.sql(
        "select deltaSumTimestamp(v, t) as ds, "
        "exponentialTimeDecayedSum(10)(v2, t) as es, "
        "exponentialTimeDecayedCount(10)(v2, t) as ec, "
        "exponentialTimeDecayedAvg(10)(v2, t) as ea, "
        "exponentialTimeDecayedMax(10)(v2, t) as em, "
        "quantileExactExclusive(0.25)(x) as qe, "
        "quantileExactInclusive(0.25)(x) as qi, "
        "groupArrayIntersect(arr) as gi "
        "from values (1, 5.0, 1.0, 0.0, array(1,2,3)), "
        "(2, 3.0, 2.0, 10.0, array(2,3,4)), "
        "(3, 8.0, 0.0, 5.0, array(3,2)), "
        "(4, 6.0, 0.0, 5.0, array(2,3,9)) as t(x, v, v2, t, arr)"
    ).collect()[0]
    import math

    assert r.ds == 3.0  # 5 -> 6 (+1) -> 8 (+2) -> 3 (dropped)
    e1, eh = math.exp(-1.0), math.exp(-0.5)
    assert abs(r.es - (e1 + 2.0)) < 1e-12
    assert abs(r.ec - (e1 + 1.0 + 2 * eh)) < 1e-12
    assert abs(r.ea - (e1 + 2.0) / (e1 + 1.0 + 2 * eh)) < 1e-12
    assert r.em == 2.0
    assert (r.qe, r.qi) == (1.25, 1.75)
    assert list(r.gi) == [2, 3]
    # exclusive quantile end clamping
    r = eng.sql(
        "select quantileExactExclusive(0.01)(x) as lo, "
        "quantileExactExclusive(0.99)(x) as hi "
        "from values (1),(2),(3) as t(x)"
    ).collect()[0]
    assert (r.lo, r.hi) == (1.0, 3.0)


def test_tier35_ttest_family(spark):
    """Tier-35 goldens: studentTTest / welchTTest statistics and REAL
    two-sided p-values against an independently coded reference
    (lgamma + betacf in pure Python), kolmogorovSmirnovTest D and
    asymptotic p, and the degenerate edges (identical samples -> t = 0,
    p = 1; D = 0, p = 1)."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select studentTTest(v, g) as st, welchTTest(v, g) as wt, "
        "kolmogorovSmirnovTest(v, g) as ks "
        "from values (1.0,0),(2.0,0),(3.0,0),(4.0,0), "
        "(2.0,1),(4.0,1),(6.0,1),(9.0,1) as t(v,g)"
    ).collect()[0]
    # references computed with an independent Python lgamma/betacf impl
    assert abs(r.st._1 - (-1.690641214609248)) < 1e-12
    assert abs(r.st._2 - 0.1418603602858496) < 1e-10
    assert abs(r.wt._1 - (-1.690641214609248)) < 1e-12
    assert abs(r.wt._2 - 0.1647020796280536) < 1e-10
    assert abs(r.ks._1 - 0.5) < 1e-12
    assert abs(r.ks._2 - 0.6993741991310155) < 1e-10
    # identical samples: t = 0 -> p = 1; D = 0 -> p = 1
    r = eng.sql(
        "select studentTTest(v, g) as st, "
        "kolmogorovSmirnovTest(v, g) as ks "
        "from values (1.0,0),(2.0,0),(3.0,0), "
        "(1.0,1),(2.0,1),(3.0,1) as t(v,g)"
    ).collect()[0]
    assert r.st._1 == 0.0 and r.st._2 == 1.0
    assert r.ks._1 == 0.0 and r.ks._2 == 1.0
    # large-sample sanity: |t|=2, nu=198 -> p ~ 0.046878 (normal-ish)
    rows = ", ".join(f"({i % 10}.0, 0)" for i in range(100))
    rows2 = ", ".join(f"({(i * 7) % 10}.0, 1)" for i in range(100))
    r = eng.sql(
        f"select studentTTest(v, g) as st from values {rows}, {rows2} "
        "as t(v, g)"
    ).collect()[0]
    # same distribution modulo permutation -> t == 0 exactly
    assert abs(r.st._1) < 1e-12 and r.st._2 == 1.0


def test_tier36_strict_funnels_and_time_constraints(spark):
    """Tier-36 goldens: windowFunnel strict modes (strict_order freezes
    on any non-advancing event once a chain starts — upstream's
    A->B->D->C doc example; strict_dedup freezes on a repeated
    condition; strict_increase requires strictly increasing matched
    times), and '(?t<=N)' max-gap sequence constraints via the
    latest-feasible-time DP (including the case a greedy cursor gets
    wrong), with min-gap forms still rejected loudly."""
    import pytest as _pt

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    rows = [
        (1, 1.0, "v"), (1, 2.0, "c"), (1, 3.0, "p"),
        (2, 1.0, "v"), (2, 2.0, "x"), (2, 3.0, "c"), (2, 4.0, "p"),
        (3, 1.0, "v"), (3, 2.0, "v"), (3, 3.0, "c"),
        (4, 1.0, "v"), (4, 1.0, "c"), (4, 2.0, "p"),
    ]
    vals = ", ".join(
        f"({u}, timestamp_seconds({t}), '{e}')" for u, t, e in rows
    )
    spark.sql(
        f"select * from values {vals} as t(u, ts, et)"
    ).createOrReplaceTempView("ev36")
    got = {
        r.u: r
        for r in eng.sql(
            "select u, "
            "windowFunnel(10)(ts, et='v', et='c', et='p') as base, "
            "windowFunnel(10, 'strict_order')(ts, et='v', et='c', "
            "  et='p') as so, "
            "windowFunnel(10, 'strict_dedup')(ts, et='v', et='c', "
            "  et='p') as sd, "
            "windowFunnel(10, 'strict_increase')(ts, et='v', et='c', "
            "  et='p') as si "
            "from ev36 group by u"
        ).collect()
    }
    #           base so sd si
    exp = {1: (3, 3, 3, 3),
           2: (3, 1, 3, 3),   # intervening 'x' freezes strict_order
           3: (2, 1, 1, 2),   # repeated 'v' freezes order AND dedup
           4: (3, 3, 3, 1)}   # equal-ts c fails strict_increase
    for u, (b, so, sd, si) in exp.items():
        r = got[u]
        assert (r.base, r.so, r.sd, r.si) == (b, so, sd, si), u
    # the greedy-cursor-fails case: A@0 A@95 B@100 with max gap 10
    r = eng.sql(
        "select sequenceMatch('(?1)(?t<=10)(?2)')(ts, et='a', et='b') "
        "as sm, "
        "sequenceCount('(?1)(?t<=10)(?2)')(ts, et='a', et='b') as sc, "
        "sequenceMatch('(?1)(?t<5)(?2)')(ts, et='a', et='b') as smx "
        "from values (timestamp_seconds(0),'a'), "
        "(timestamp_seconds(95),'a'), (timestamp_seconds(100),'b') "
        "as t(ts, et)"
    ).collect()[0]
    assert (r.sm, r.sc, r.smx) == (1, 1, 0)
    # non-overlapping constrained counting
    r = eng.sql(
        "select sequenceCount('(?1)(?t<=10)(?2)')(ts, et='a', et='b') "
        "as sc from values (timestamp_seconds(0),'a'), "
        "(timestamp_seconds(5),'b'), (timestamp_seconds(6),'a'), "
        "(timestamp_seconds(30),'b'), (timestamp_seconds(31),'a'), "
        "(timestamp_seconds(35),'b') as t(ts, et)"
    ).collect()[0]
    assert r.sc == 2  # 0->5 and 31->35; 6->30 exceeds the gap
    # loud rejections: min-gap ops, leading/trailing/doubled constraints
    for pat in ["'(?t<=3)(?1)'", "'(?1)(?t>=3)(?2)'", "'(?1)(?t<=3)'",
                "'(?1)(?t<=3)(?t<5)(?2)'", "'(?1)(?t==3)(?2)'"]:
        with _pt.raises(Exception):
            eng.sql(
                f"select sequenceMatch({pat})(ts, et='a', et='b') as x "
                "from ev36"
            ).collect()
    with _pt.raises(Exception):
        eng.sql(
            "select windowFunnel(10, 'strict_orderx')(ts, et='v') as x "
            "from ev36"
        ).collect()


def test_tier37_lttb(spark):
    """Tier-37 goldens: largestTriangleThreeBuckets against an
    independently coded Python LTTB (even interior buckets, next-bucket
    average anchor, previous-selection dependence, first-max ties), and
    the n <= 0 / 1 / 2 / >= count edges."""
    from tensorbase_spark.engine import TensorBaseEngine

    def lttb(pts, n):
        pts = sorted(pts)
        nn = len(pts)
        if n <= 0 or n >= nn:
            return pts
        if n == 1:
            return pts[:1]
        if n == 2:
            return [pts[0], pts[-1]] if nn > 2 else pts
        kk = n - 2
        sel = [pts[0]]
        prev = pts[0]
        for k in range(1, kk + 1):
            s = 2 + (k - 1) * (nn - 2) // kk
            e = 1 + k * (nn - 2) // kk
            if k == kk:
                ns, ne = nn, nn
            else:
                ns, ne = 2 + k * (nn - 2) // kk, 1 + (k + 1) * (nn - 2) // kk
            nb = pts[ns - 1:ne]
            ax = sum(q[0] for q in nb) / len(nb)
            ay = sum(q[1] for q in nb) / len(nb)
            best, ba = None, -1.0
            for q in pts[s - 1:e]:
                ar = abs((prev[0] - ax) * (q[1] - prev[1])
                         - (prev[0] - q[0]) * (ay - prev[1]))
                if ar > ba:
                    best, ba = q, ar
            sel.append(best)
            prev = best
        sel.append(pts[-1])
        return sel

    eng = TensorBaseEngine(spark)
    pts = [(float(i), float((i * 37) % 101)) for i in range(50)]
    vals = ", ".join(f"({x}, {y})" for x, y in pts)
    for n in (10, 3, 0, 1, 2, 49, 50, 60):
        r = eng.sql(
            f"select largestTriangleThreeBuckets({n})(x, y) as l "
            f"from values {vals} as t(x, y)"
        ).collect()[0]
        assert [(q._1, q._2) for q in r.l] == lttb(pts, n), n


def test_tier38_sequence_next_node(spark):
    """Tier-38 goldens: sequenceNextNode across the four
    direction/base pairings on the upstream docs' page-flow shapes —
    consecutive chain matching, base-condition filtering, boundary
    NULLs, and loud rejection of unknown direction/base values."""
    import pytest as _pt

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    rows = [
        (1, 1, "Home"), (1, 2, "Gift"), (1, 3, "Exit"),
        (2, 1, "Home"), (2, 2, "Home"), (2, 3, "Gift"), (2, 4, "Basket"),
        (3, 1, "Gift"), (3, 2, "Home"), (3, 3, "Gift"), (3, 4, "Basket"),
    ]
    vals = ", ".join(
        f"({u}, timestamp_seconds({t}), '{p}')" for u, t, p in rows
    )
    spark.sql(
        f"select * from values {vals} as t(u, ts, page)"
    ).createOrReplaceTempView("nv38")
    got = {
        r.u: r
        for r in eng.sql(
            "select u, "
            "sequenceNextNode('forward','head')(ts, page, page='Home', "
            "  page='Home', page='Gift') as fh, "
            "sequenceNextNode('backward','tail')(ts, page, "
            "  page='Basket', page='Basket', page='Gift') as bt, "
            "sequenceNextNode('forward','first_match')(ts, page, "
            "  page='Gift', page='Gift') as ffm, "
            "sequenceNextNode('backward','last_match')(ts, page, "
            "  page='Gift', page='Gift') as blm "
            "from nv38 group by u"
        ).collect()
    }
    exp = {1: ("Exit", None, "Exit", "Home"),
           2: (None, "Home", "Basket", "Home"),
           3: (None, "Home", "Home", "Home")}
    for u, e in exp.items():
        r = got[u]
        assert (r.fh, r.bt, r.ffm, r.blm) == e, u
    # chain running off the end -> NULL (single event, next out of range)
    r = eng.sql(
        "select sequenceNextNode('forward','head')(ts, page, "
        "page='Home', page='Home') as x "
        "from values (timestamp_seconds(1), 'Home') as t(ts, page)"
    ).collect()[0]
    assert r.x is None
    for bad in ["'sideways','head'", "'forward','middle'"]:
        with _pt.raises(Exception):
            eng.sql(
                f"select sequenceNextNode({bad})(ts, page, "
                "page='Home', page='Home') as x from nv38"
            ).collect()


def test_tier39_base32_and_bitslice(spark):
    """Tier-39 goldens: the full RFC 4648 base32 test-vector table,
    decode round-trips, try-form NULL on bad alphabet, strict raise,
    and bitSlice bit windows (positive/negative offset and length, tail
    zero-padding, out-of-range clamps) returning BINARY."""
    import pytest as _pt

    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    vec = {"": "", "f": "MY======", "fo": "MZXQ====", "foo": "MZXW6===",
           "foob": "MZXW6YQ=", "fooba": "MZXW6YTB",
           "foobar": "MZXW6YTBOI======"}
    sels = ", ".join(
        f"base32Encode('{k}') as e{i}, base32Decode('{v}') as d{i}"
        for i, (k, v) in enumerate(vec.items())
    )
    r = eng.sql(
        f"select {sels}, tryBase32Decode('1!bad') as tb"
    ).collect()[0]
    for i, (k, v) in enumerate(vec.items()):
        assert getattr(r, f"e{i}") == v, k
        assert getattr(r, f"d{i}") == k, v
    assert r.tb is None
    with _pt.raises(Exception):
        eng.sql("select base32Decode('1!bad') as x").collect()
    r = eng.sql(
        "select cast(bitSlice('Hello', 1, 8) as string) as a, "
        "cast(bitSlice('Hello', 9) as string) as b, "
        "hex(bitSlice('Hello', 2, 8)) as c, "
        "cast(bitSlice('Hello', -16) as string) as d, "
        "cast(bitSlice('Hello', 1, -8) as string) as e, "
        "hex(bitSlice('Hello', 2, 4)) as f, "
        "hex(bitSlice('Hello', 41)) as g, "
        "hex(bitSlice('Hello', 39, 10)) as h"
    ).collect()[0]
    assert (r.a, r.b, r.d, r.e) == ("H", "ello", "lo", "Hell")
    # bits 2-9 of 0x48 0x65 -> 0x90; bits 2-5 zero-padded -> 0x90;
    # offset past the end -> empty; clamped 2-bit tail '11' -> 0xC0
    assert (r.c, r.f, r.g, r.h) == ("90", "90", "", "C0")


def test_tier40_text_search_family(spark):
    """Tier-40 goldens: case-insensitive match/substring/position
    counting, first-position multi-search, token validation with the
    OrNull contract, ordered subsequence search, and coarse HTML text
    extraction (script/style/comment blocks dropped, tags stripped,
    the five standard entities decoded, whitespace collapsed)."""
    from tensorbase_spark.engine import TensorBaseEngine

    eng = TensorBaseEngine(spark)
    r = eng.sql(
        "select countMatchesCaseInsensitive('Hello hello HELLO', "
        "  'hello') as cm, "
        "countSubstringsCaseInsensitive('ababAB', 'ab') as cs, "
        "countSubstringsCaseInsensitiveUTF8('ÉéÉ', 'é') as cu, "
        "positionCaseInsensitiveUTF8('Hello World', 'WORLD') as pos, "
        "multiSearchFirstPositionCaseInsensitive('Hello World', "
        "  array('xx', 'WORLD', 'ello')) as mf, "
        "multiSearchFirstPosition('Hello World', array('zz', 'World')) "
        "  as mfp, "
        "multiSearchFirstPosition('Hello', array('zz')) as mf0, "
        "hasTokenOrNull('a-b c', 'b') as ht, "
        "hasTokenOrNull('a-b c', 'b-c') as htn, "
        "hasSubsequence('hello world', 'hlwd') as hs, "
        "hasSubsequence('hello world', 'wh') as hsn, "
        "hasSubsequence('abc', '') as hse, "
        "hasSubsequenceCaseInsensitive('Hello World', 'HW') as hsc, "
        "extractTextFromHTML('<html><script>var x=1;</script><body>"
        "<p>Hi &amp; bye</p><!-- c --></body></html>') as et"
    ).collect()[0]
    assert (r.cm, r.cs, r.cu) == (3, 3, 3)
    assert (r.pos, r.mf, r.mfp, r.mf0) == (7, 2, 7, 0)
    assert r.ht is True and r.htn is None
    assert (r.hs, r.hsn, r.hse, r.hsc) == (1, 0, 1, 1)
    assert r.et == "Hi & bye"
