"""Dialect-surface queries for the extended ClickHouse function families
(array HOFs, cast family, multiIf/arithmetic/bit ops, sub-hour time buckets,
string split/pad) — all through ``TensorBaseEngine.sql`` so the SQL-text
rewriter (functions/clickhouse.py CH_SQL_TEMPLATES) is what's exercised.

The reference's grammar would reject every one of these (bql.pest has no
lambda arrows, no combinators); they are upstream-ClickHouse spellings that
make the dialect a practical superset (COVERAGE.md §2.6).  Everything
rewrites to built-in Spark expressions — codegen'd, no Python.
"""

from __future__ import annotations

from tensorbase_spark.engine import TensorBaseEngine
from tensorbase_spark.queries import Query
from tensorbase_spark.sources.tables import load_table


def ch_array_hofs(spark, sf_dir):
    """arrayMap/arrayFilter/arraySum/arrayCount/arrayMax + lambda reorder
    (CH puts the lambda first, Spark the array).  Integer-valued arrays so
    the fold results are exact in both engines."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_hof")
    return eng.sql(
        "select l_returnflag, "
        "sum(arraySum(x -> x * x, array(l_orderkey % 97, l_suppkey))) as s_sq, "
        "sum(arrayCount(x -> x > 50, array(l_orderkey % 97, l_suppkey))) as n_hi, "
        "max(arrayMax(arrayMap(x -> x + 1, array(l_orderkey % 97, l_suppkey)))) as mx, "
        "min(arrayMin(arraySort(array(l_suppkey, l_orderkey % 97)))) as mn "
        "from li_hof group by l_returnflag"
    )


CH_ARRAY_HOFS_ORACLE = """
SELECT l_returnflag,
       CAST(sum(list_aggregate(list_transform([l_orderkey % 97, l_suppkey],
                                              x -> x * x), 'sum')) AS DOUBLE) AS s_sq,
       CAST(sum(len(list_filter([l_orderkey % 97, l_suppkey],
                                x -> x > 50))) AS BIGINT)                     AS n_hi,
       max(list_max(list_transform([l_orderkey % 97, l_suppkey],
                                   x -> x + 1)))                              AS mx,
       min(list_min(list_sort([l_suppkey, l_orderkey % 97])))                 AS mn
FROM lineitem GROUP BY l_returnflag
"""


def ch_array_hofs2(spark, sf_dir):
    """arrayFirst/arrayFirstIndex/arrayDifference/arrayCumSum — the second
    HOF tier real ClickHouse queries lean on.  Row-level output over a
    pruned lineitem slice so every lambda result is value-checked; NULL
    when arrayFirst finds nothing (CH's default-value there; NULL is the
    honest Spark spelling, and the oracle mirrors it)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_hof2")
    return eng.sql(
        "select l_orderkey, l_linenumber, "
        "arrayFirst(x -> x > 5, array(l_suppkey % 13, l_orderkey % 7, l_partkey % 11)) as first_hi, "
        "arrayFirstIndex(x -> x > 5, array(l_suppkey % 13, l_orderkey % 7, l_partkey % 11)) as first_idx, "
        "arraySum(x -> x, arrayDifference(array(l_suppkey % 13, l_orderkey % 7, l_partkey % 11))) as diff_sum, "
        "element_at(arrayCumSum(array(l_suppkey % 13, l_orderkey % 7, l_partkey % 11)), 2) as cum2 "
        "from li_hof2 where l_orderkey % 500 = 0"
    )


CH_ARRAY_HOFS2_ORACLE = """
WITH d AS (
  SELECT l_orderkey, l_linenumber,
         [l_suppkey % 13, l_orderkey % 7, l_partkey % 11] AS arr
  FROM lineitem WHERE l_orderkey % 500 = 0
)
SELECT l_orderkey, l_linenumber,
       list_filter(arr, x -> x > 5)[1]                              AS first_hi,
       CAST(coalesce(list_position(list_transform(arr, x -> x > 5), true), 0)
            AS BIGINT)                                              AS first_idx,
       CAST(arr[3] - arr[1] AS DOUBLE)                              AS diff_sum,
       CAST(arr[1] + arr[2] AS DOUBLE)                              AS cum2
FROM d
"""


def ch_cast_multiif(spark, sf_dir):
    """multiIf -> CASE chain; toInt64/toUInt64 cast family (UInt64 widens to
    Decimal(20,0) per SURVEY §1.2 — asserted in tests/test_types.py; the
    driver-hashed column narrows back via toInt64 because Decimal
    canonicalization differs between hashers, r2 verdict #1); intDiv/modulo
    spellings."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_cast")
    return eng.sql(
        "select multiIf(o_totalprice > 150000, 'big', "
        "o_totalprice > 50000, 'mid', 'small') as bucket, "
        "count(*) as n, "
        "sum(toInt64(o_orderstatus = 'F')) as n_f, "
        "toInt64(max(toUInt64(o_orderkey))) as mx_key, "
        "sum(intDiv(o_orderkey, 1000)) as s_div, "
        "sum(modulo(o_custkey, 7)) as s_mod "
        "from ord_cast group by bucket"
    )


CH_CAST_MULTIIF_ORACLE = """
SELECT CASE WHEN o_totalprice > 150000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'small' END                              AS bucket,
       count(*)                                           AS n,
       CAST(sum(CAST(o_orderstatus = 'F' AS BIGINT)) AS BIGINT) AS n_f,
       CAST(max(o_orderkey) AS BIGINT)                    AS mx_key,
       CAST(sum(o_orderkey // 1000) AS BIGINT)            AS s_div,
       CAST(sum(o_custkey % 7) AS BIGINT)                 AS s_mod
FROM orders GROUP BY bucket
"""


def ch_minute_buckets(spark, sf_dir):
    """Sub-hour time buckets (toStartOfFifteenMinutes) + formatDateTime —
    the telemetry-rollup idiom; epoch-floor bucketing pushes to codegen."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_min")
    return eng.sql(
        "select toStartOfFifteenMinutes(ts) as bucket, "
        "formatDateTime(toStartOfDay(ts), '%Y-%m-%d') as day_str, "
        "count(*) as n, uniqExact(user_id) as u "
        "from ev_min group by bucket, day_str"
    )


CH_MINUTE_BUCKETS_ORACLE = """
SELECT make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000) AS bucket,
       strftime(date_trunc('day', ts), '%Y-%m-%d')                            AS day_str,
       count(*)                                                               AS n,
       count(DISTINCT user_id)                                                AS u
FROM events GROUP BY bucket, day_str
"""


def ch_split_pad(spark, sf_dir):
    """splitByChar / arraySlice / arrayStringConcat / leftPad / toString —
    the string-wrangling idioms; \\Q..\\E-quoted literal separator."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("doc_split")
    return eng.sql(
        "select doc_id, "
        "arrayStringConcat(arraySlice(splitByChar(' ', text), 1, 5), '_') as head5, "
        "leftPad(toString(doc_id), 6, '0') as padded, "
        "arrayUniq(splitByChar(' ', text)) as n_uniq_words "
        "from doc_split where doc_id < 50"
    )


CH_SPLIT_PAD_ORACLE = """
SELECT doc_id,
       array_to_string(string_split(text, ' ')[1:5], '_') AS head5,
       lpad(CAST(doc_id AS VARCHAR), 6, '0')              AS padded,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_words
FROM documents WHERE doc_id < 50
"""




def ch_string_replace_extract(spark, sf_dir):
    """replaceAll/replaceOne/replaceRegexpAll/extract/extractAll/
    countMatches/splitByWhitespace/substringIndex — the string-munging tier
    above the fork's regexp_match/regexp_replace (SURVEY §2.6a)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("doc_repl")
    return eng.sql(
        "select doc_id, "
        "replaceAll(substringIndex(text, ' ', 3), 'e', '3') as leet3, "
        "replaceOne(substringIndex(text, ' ', 2), ' ', ':') as joined2, "
        "extract(text, '^([a-z]+)') as first_word, "
        "countMatches(text, '[aeiou]+') as n_vowel_runs, "
        "arrayUniq(splitByWhitespace(text)) as n_uniq_ws, "
        "replaceRegexpAll(substringIndex(text, ' ', 2), '[aeiou]', '_') as devowel2 "
        "from doc_repl where doc_id < 60"
    )


CH_STRING_REPLACE_ORACLE = """
WITH d AS (
  SELECT doc_id, text,
         array_to_string(string_split(text, ' ')[1:3], ' ') AS t3,
         array_to_string(string_split(text, ' ')[1:2], ' ') AS t2
  FROM documents WHERE doc_id < 60
)
SELECT doc_id,
       replace(t3, 'e', '3')                                       AS leet3,
       CASE WHEN strpos(t2, ' ') = 0 THEN t2
            ELSE substr(t2, 1, strpos(t2, ' ') - 1) || ':' ||
                 substr(t2, strpos(t2, ' ') + 1) END               AS joined2,
       regexp_extract(text, '^([a-z]+)', 1)                        AS first_word,
       CAST(len(regexp_extract_all(text, '[aeiou]+')) AS INTEGER)  AS n_vowel_runs,
       CAST(len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'),
                                          x -> x != ''))) AS BIGINT) AS n_uniq_ws,
       regexp_replace(t2, '[aeiou]', '_', 'g')                     AS devowel2
FROM d
"""


def ch_stats_family(spark, sf_dir):
    """stddevPop/Samp, varPop/Samp, covarPop, corr, skewPop, kurtPop —
    upstream-CH statistical aggregates (the fork stops at count/sum/min/
    max/avg, aggregates.rs:52-67).  All partial/final-aggregatable
    built-ins: one exchange on the group key at any scale.  Rounded in both
    forms (central-moment accumulation order differs across engines)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_stats")
    return eng.sql(
        "select l_returnflag, "
        "round(stddevPop(l_quantity), 4) as sd_p, "
        "round(stddevSamp(l_quantity), 4) as sd_s, "
        "round(varPop(l_quantity), 4) as v_p, "
        "round(varSamp(l_quantity), 4) as v_s, "
        "round(covarPop(l_quantity, l_discount), 6) as cv_p, "
        "round(covarSamp(l_quantity, l_discount), 6) as cv_s, "
        "round(corr(l_extendedprice, l_quantity), 4) as cr, "
        "round(skewPop(l_quantity), 4) as sk, "
        "round(kurtPop(l_quantity), 4) as kt "
        "from li_stats group by l_returnflag"
    )


CH_STATS_FAMILY_ORACLE = """
WITH mu AS (
  SELECT l_returnflag, avg(l_quantity) AS m FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       round(stddev_pop(l_quantity), 4)                    AS sd_p,
       round(stddev_samp(l_quantity), 4)                   AS sd_s,
       round(var_pop(l_quantity), 4)                       AS v_p,
       round(var_samp(l_quantity), 4)                      AS v_s,
       round(covar_pop(l_quantity, l_discount), 6)         AS cv_p,
       round(covar_samp(l_quantity, l_discount), 6)        AS cv_s,
       round(corr(l_extendedprice, l_quantity), 4)         AS cr,
       round(avg(pow(l_quantity - m, 3))
             / pow(avg(pow(l_quantity - m, 2)), 1.5), 4)   AS sk,
       round(avg(pow(l_quantity - m, 4))
             / pow(avg(pow(l_quantity - m, 2)), 2), 4)     AS kt
FROM lineitem l JOIN mu USING (l_returnflag)
GROUP BY l.l_returnflag
"""


def ch_array_set_ops(spark, sf_dir):
    """arrayIntersect/hasAll/hasAny/arrayCompact/arrayPopBack/arrayResize —
    array set & structure ops beyond the two HOF tiers.  Intersections are
    sorted in both forms (neither engine pins result order), and every array
    output is serialized to a CSV string — raw ARRAY cells are unhashable in
    the driver's pandas canonicalizer."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_aso")
    return eng.sql(
        "select l_orderkey, l_linenumber, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "arraySort(arrayIntersect(array(l_suppkey % 5, l_partkey % 5), array(1, 2, 3)))), ',') as inter, "
        "hasAll(array(0, 1, 2, 3), array(l_suppkey % 3, l_partkey % 3)) as h_all, "
        "hasAny(array(1, 2), array(l_suppkey % 7, l_partkey % 7)) as h_any, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "arrayCompact(arraySort(array(l_suppkey % 3, l_partkey % 3, l_orderkey % 3)))), ',') as compacted, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "arrayPopBack(array(l_suppkey % 9, l_partkey % 9))), ',') as popb, "
        "arrayStringConcat(arrayMap(x -> toString(x), "
        "arrayResize(array(l_suppkey % 4), 3, 0)), ',') as resized "
        "from li_aso where l_orderkey % 500 = 0"
    )


CH_ARRAY_SET_OPS_ORACLE = """
SELECT l_orderkey, l_linenumber,
       coalesce(array_to_string(list_sort(list_intersect(
           [l_suppkey % 5, l_partkey % 5], [1, 2, 3])), ','), '')           AS inter,
       list_has_all([0, 1, 2, 3], [l_suppkey % 3, l_partkey % 3])           AS h_all,
       list_has_any([1, 2], [l_suppkey % 7, l_partkey % 7])                 AS h_any,
       array_to_string(list_sort(list_distinct([l_suppkey % 3, l_partkey % 3,
                                l_orderkey % 3])), ',')                     AS compacted,
       array_to_string([l_suppkey % 9], ',')                                AS popb,
       array_to_string([l_suppkey % 4, 0, 0], ',')                          AS resized
FROM lineitem WHERE l_orderkey % 500 = 0
"""


def ch_array_join_clause(spark, sf_dir):
    """ClickHouse ARRAY JOIN clause (upstream-CH; the fork's grammar has no
    ARRAY JOIN) -> LATERAL VIEW explode.  The explode happens map-side —
    no extra shuffle beyond the final GROUP BY, so at 100 TB the plan is
    scan -> generate -> partial agg -> exchange(tok) -> final agg."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_aj")
    return eng.sql(
        "select tok, count(*) as n, sum(modulo(o_orderkey, 100)) as s "
        "from ord_aj array join splitByChar('-', o_orderpriority) as tok "
        "where o_orderkey < 5000 group by tok"
    )


CH_ARRAY_JOIN_ORACLE = """
SELECT u.tok                                   AS tok,
       count(*)                                AS n,
       CAST(sum(o_orderkey % 100) AS BIGINT)   AS s
FROM orders, UNNEST(string_split(o_orderpriority, '-')) AS u(tok)
WHERE o_orderkey < 5000
GROUP BY u.tok
"""


def ch_limit_by(spark, sf_dir):
    """ClickHouse LIMIT n BY cols (top-n-per-group as a clause): the 2
    highest-value orders per priority.  The engine rewrites the clause into
    one row_number window over the BY partition (single shuffle) + the
    fused final TakeOrderedAndProject."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_lb")
    return eng.sql(
        "select o_orderpriority, o_orderkey, o_totalprice from ord_lb "
        "order by o_totalprice desc, o_orderkey limit 2 by o_orderpriority"
    )


CH_LIMIT_BY_ORACLE = """
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 2
ORDER BY o_totalprice DESC, o_orderkey
"""

def ch_calendar_funcs(spark, sf_dir):
    """monthName/dayName/toISOWeek/toStartOfInterval/timeSlot/
    toLastDayOfMonth/toDaysInMonth — the calendar tier above the fork's
    toYear..toSecond list (clickhouse.rs:39-59)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_cal")
    return eng.sql(
        "select toISOWeek(ts) as wk, monthName(ts) as mn, dayName(ts) as dn, "
        "toStartOfInterval(ts, interval 10 minute) as b10, "
        "timeSlot(ts) as slot, toLastDayOfMonth(ts) as ld, "
        "toDaysInMonth(ts) as dim, count(*) as n "
        "from ev_cal group by wk, mn, dn, b10, slot, ld, dim"
    )


CH_CALENDAR_ORACLE = """
SELECT CAST(weekofyear(ts) AS INT)                                          AS wk,
       monthname(ts)                                                        AS mn,
       dayname(ts)                                                          AS dn,
       make_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) * 1000000)  AS b10,
       make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000) AS slot,
       last_day(ts)                                                         AS ld,
       CAST(day(last_day(ts)) AS INT)                                       AS dim,
       count(*)                                                             AS n
FROM events GROUP BY wk, mn, dn, b10, slot, ld, dim
"""


def ch_url_ip_funcs(spark, sf_dir):
    """Upstream-CH URL + IPv4 function families and transform(), all absent
    from the fork's registry: URLs synthesized from order columns are parsed
    back with domain/topLevelDomain/path/extractURLParameter (Spark
    parse_url, JVM-side); IPv4StringToNum/isIPv4String are closed-form
    arithmetic; transform() maps status codes through a literal lookup.
    The oracle recomputes every part from the SOURCE columns, so the parse
    itself is what the hash verifies."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_url")
    return eng.sql(
        "select domain(url) as dom, "
        "topLevelDomain(url) as tld, "
        "transform(st, array('O', 'F'), array('open', 'final'), 'other') as status, "
        "count(*) as n, "
        "sum(toInt64(extractURLParameter(url, 'k'))) as sum_k, "
        "countIf(isIPv4String(ip)) as n_valid_ip, "
        "sumIf(IPv4StringToNum(ip), isIPv4String(ip)) as ip_sum, "
        "max(path(url)) as mx_path "
        "from (select concat('https://www.shop', toString(o_custkey % 3), "
        "'.example.com/p/', toString(o_orderkey), '?k=', "
        "toString(o_orderkey % 97), '&x=a') as url, "
        "concat(toString(o_orderkey % 300), '.10.0.', "
        "toString(o_custkey % 256)) as ip, "
        "o_orderstatus as st from ord_url) "
        "group by dom, tld, status"
    )


CH_URL_IP_ORACLE = """
SELECT 'www.shop' || CAST(o_custkey % 3 AS VARCHAR) || '.example.com' AS dom,
       'com'                                                          AS tld,
       CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'final'
            ELSE 'other' END                                          AS status,
       count(*)                                                       AS n,
       CAST(sum(o_orderkey % 97) AS BIGINT)                           AS sum_k,
       count(*) FILTER (WHERE o_orderkey % 300 <= 255)                AS n_valid_ip,
       CAST(sum((o_orderkey % 300) * 16777216 + 10 * 65536
                + (o_custkey % 256))
            FILTER (WHERE o_orderkey % 300 <= 255) AS BIGINT)         AS ip_sum,
       max('/p/' || CAST(o_orderkey AS VARCHAR))                      AS mx_path
FROM orders
GROUP BY dom, tld, status
"""


QUERIES = {
    "ch_array_hofs": Query(ch_array_hofs, CH_ARRAY_HOFS_ORACLE, ("dialect", "array")),
    "ch_url_ip_funcs": Query(
        ch_url_ip_funcs, CH_URL_IP_ORACLE, ("dialect", "string", "url")
    ),
    "ch_array_hofs2": Query(ch_array_hofs2, CH_ARRAY_HOFS2_ORACLE, ("dialect", "array")),
    "ch_cast_multiif": Query(ch_cast_multiif, CH_CAST_MULTIIF_ORACLE, ("dialect",)),
    "ch_minute_buckets": Query(ch_minute_buckets, CH_MINUTE_BUCKETS_ORACLE, ("dialect", "datetime")),
    "ch_split_pad": Query(ch_split_pad, CH_SPLIT_PAD_ORACLE, ("dialect", "string")),
    "ch_limit_by": Query(ch_limit_by, CH_LIMIT_BY_ORACLE, ("dialect", "clause")),
    "ch_calendar_funcs": Query(
        ch_calendar_funcs, CH_CALENDAR_ORACLE, ("dialect", "datetime")
    ),
    "ch_array_join_clause": Query(
        ch_array_join_clause, CH_ARRAY_JOIN_ORACLE, ("dialect", "clause", "array")
    ),
    "ch_string_replace_extract": Query(
        ch_string_replace_extract, CH_STRING_REPLACE_ORACLE, ("dialect", "string")
    ),
    "ch_stats_family": Query(
        ch_stats_family, CH_STATS_FAMILY_ORACLE, ("dialect", "agg", "stats")
    ),
    "ch_array_set_ops": Query(
        ch_array_set_ops, CH_ARRAY_SET_OPS_ORACLE, ("dialect", "array")
    ),
}


# --- round 5: PREWHERE, GROUP BY ALL, bag-semantics set ops ---------------

def ch_prewhere(spark, sf_dir):
    """ClickHouse PREWHERE (the manual scan-stage filter every production
    CH query uses; engine.py merges it into WHERE because Catalyst's
    pushdown IS the prewhere stage — the parquet scan evaluates the
    predicate before wide columns materialize).  Combined PREWHERE+WHERE
    must AND together."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_pw")
    return eng.sql(
        "select l_returnflag as rf, count(*) as n, "
        "round(sum(l_extendedprice), 2) as s "
        "from li_pw prewhere l_quantity > 30 where l_discount < 0.05 "
        "group by l_returnflag"
    )


CH_PREWHERE_ORACLE = """
SELECT l_returnflag AS rf, count(*) AS n,
       round(sum(l_extendedprice), 2) AS s
FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05
GROUP BY l_returnflag
"""


def ch_group_by_all(spark, sf_dir):
    """GROUP BY ALL (upstream-CH and DuckDB share it): every non-aggregate
    select item becomes a grouping key.  Spark 3.4+ supports the clause
    natively; the oracle runs DuckDB's native form — first-class
    implementations checked against each other."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_gba")
    return eng.sql(
        "select o_orderstatus as st, toYear(o_orderdate) as y, "
        "count(*) as n, round(sum(o_totalprice), 2) as s "
        "from ord_gba where o_orderkey < 20000 group by all"
    )


CH_GROUP_BY_ALL_ORACLE = """
SELECT o_orderstatus AS st, CAST(year(o_orderdate) AS INT) AS y,
       count(*) AS n, round(sum(o_totalprice), 2) AS s
FROM orders WHERE o_orderkey < 20000 GROUP BY ALL
"""


def ch_setop_all(spark, sf_dir):
    """Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL — CH and
    Spark both keep duplicate multiplicity): multiplicity-sensitive
    differences between two overlapping order slices, counted per
    status so the result is aggregate-stable."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_sa")
    return eng.sql(
        "select st, count(*) as n from ("
        "  select o_orderstatus as st from ord_sa where o_orderkey % 7 < 5"
        "  except all"
        "  select o_orderstatus as st from ord_sa where o_orderkey % 7 < 2"
        ") group by st "
        "union all "
        "select concat('i_', st) as st, count(*) as n from ("
        "  select o_orderstatus as st from ord_sa where o_orderkey % 5 < 3"
        "  intersect all"
        "  select o_orderstatus as st from ord_sa where o_orderkey % 3 < 2"
        ") group by st"
    )


CH_SETOP_ALL_ORACLE = """
SELECT st, count(*) AS n FROM (
  SELECT o_orderstatus AS st FROM orders WHERE o_orderkey % 7 < 5
  EXCEPT ALL
  SELECT o_orderstatus AS st FROM orders WHERE o_orderkey % 7 < 2
) GROUP BY st
UNION ALL
SELECT concat('i_', st) AS st, count(*) AS n FROM (
  SELECT o_orderstatus AS st FROM orders WHERE o_orderkey % 5 < 3
  INTERSECT ALL
  SELECT o_orderstatus AS st FROM orders WHERE o_orderkey % 3 < 2
) GROUP BY st
"""


QUERIES["ch_prewhere"] = Query(
    ch_prewhere, CH_PREWHERE_ORACLE, ("dialect", "clause")
)
QUERIES["ch_group_by_all"] = Query(
    ch_group_by_all, CH_GROUP_BY_ALL_ORACLE, ("dialect", "clause", "agg")
)
QUERIES["ch_setop_all"] = Query(
    ch_setop_all, CH_SETOP_ALL_ORACLE, ("dialect", "setop")
)


def ch_limit_with_ties(spark, sf_dir):
    """``ORDER BY k LIMIT n WITH TIES`` (CH / standard FETCH ... WITH
    TIES): rows tying with the n-th key survive.  The engine rewrites to
    rank() over the same ordering (engine.py _rewrite_limit_with_ties);
    the oracle states the tie semantics explicitly via rank in DuckDB
    (which has no WITH TIES) — two formulations, one contract.  The date
    sort key guarantees real ties at the boundary."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_wt")
    return eng.sql(
        "select o_orderkey, o_orderdate from ord_wt "
        "order by o_orderdate limit 51 with ties"
    )


CH_LIMIT_WITH_TIES_ORACLE = """
SELECT o_orderkey, o_orderdate FROM (
  SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
         rank() OVER (ORDER BY o_orderdate) AS rk
  FROM orders
) WHERE rk <= 51
"""


def ch_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (upstream-CH 24.x and Spark 4 both added it):
    a recursively generated line-number sequence LEFT JOINed against the
    per-line-number row counts — both engines run their native recursive
    CTE machinery."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_rc")
    return eng.sql(
        "with recursive seq(n) as ("
        "  select 1 union all select n + 1 from seq where n < 10"
        ") "
        "select n, count(l.l_orderkey) as cnt "
        "from seq left join li_rc l on l.l_linenumber = seq.n "
        "group by n"
    )


CH_RECURSIVE_CTE_ORACLE = """
WITH RECURSIVE seq(n) AS (
  SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 10
)
SELECT n, count(l.l_orderkey) AS cnt
FROM seq LEFT JOIN lineitem l ON l.l_linenumber = seq.n
GROUP BY n
"""


QUERIES["ch_limit_with_ties"] = Query(
    ch_limit_with_ties, CH_LIMIT_WITH_TIES_ORACLE, ("dialect", "clause")
)
QUERIES["ch_recursive_cte"] = Query(
    ch_recursive_cte, CH_RECURSIVE_CTE_ORACLE, ("dialect", "cte")
)


def ch_named_window(spark, sf_dir):
    """Named WINDOW clause (CH/standard SQL: one spec shared by several
    window functions — the telemetry-dashboard idiom).  Spark and DuckDB
    both bind the name natively; the hash checks frame semantics end to
    end across three functions over one spec."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_nw")
    return eng.sql(
        "select event_id, user_id, "
        "round(sum(value) over w, 6) as run_sum, "
        "cast(floor(round(sum(value) over w, 6) / (count(*) over w) * 10000 + 0.5) as bigint) as run_avg, "
        "count(*) over w as run_n "
        "from ev_nw where user_id % 100 = 7 "
        "window w as (partition by user_id order by ts, event_id "
        "rows between unbounded preceding and current row)"
    )


CH_NAMED_WINDOW_ORACLE = """
SELECT event_id, user_id,
       round(sum(value) OVER w, 6) AS run_sum,
       CAST(floor(round(sum(value) OVER w, 6) / (count(*) OVER w) * 10000 + 0.5) AS BIGINT) AS run_avg,
       count(*) OVER w AS run_n
FROM events WHERE user_id % 100 = 7
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


QUERIES["ch_named_window"] = Query(
    ch_named_window, CH_NAMED_WINDOW_ORACLE, ("dialect", "window", "clause")
)


def ch_ilike_ops(spark, sf_dir):
    """LIKE / NOT LIKE / ILIKE / match() pattern predicates (everyday CH
    filtering; ilike is case-insensitive LIKE, match is an RE2 regex test
    — Spark's rlike/ilike are first-class since 3.3)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_ilk")
    return eng.sql(
        "select count(*) as n_all, "
        "sum(toInt64(p_name like '%green%')) as n_like, "
        "sum(toInt64(p_name ilike '%GREEN%')) as n_ilike, "
        "sum(toInt64(p_name not like '%a%')) as n_notlike, "
        "sum(toInt64(match(p_type, '^ECONOMY'))) as n_match "
        "from part_ilk"
    )


CH_ILIKE_ORACLE = """
SELECT count(*) AS n_all,
       CAST(sum(CAST(p_name LIKE '%green%' AS BIGINT)) AS BIGINT) AS n_like,
       CAST(sum(CAST(p_name ILIKE '%GREEN%' AS BIGINT)) AS BIGINT) AS n_ilike,
       CAST(sum(CAST(p_name NOT LIKE '%a%' AS BIGINT)) AS BIGINT) AS n_notlike,
       CAST(sum(CAST(regexp_matches(p_type, '^ECONOMY') AS BIGINT)) AS BIGINT) AS n_match
FROM part
"""


def window_interval_range(spark, sf_dir):
    """RANGE BETWEEN INTERVAL frames over event time (the rolling-window
    telemetry idiom: per-user 1-hour trailing sums) — Spark and DuckDB
    both bind interval range frames natively; the running sum is emitted
    6-dp-rounded and the running avg derived from it (identical-double
    rule, see ch_named_window)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_ivr")
    return eng.sql(
        "select event_id, user_id, "
        "round(sum(value) over (partition by user_id order by ts "
        "range between interval 1 hour preceding and current row), 6) as h_sum, "
        "count(*) over (partition by user_id order by ts "
        "range between interval 1 hour preceding and current row) as h_n "
        "from ev_ivr where user_id % 50 = 3"
    )


WINDOW_INTERVAL_RANGE_ORACLE = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6) AS h_sum,
       count(*) OVER (PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS h_n
FROM events WHERE user_id % 50 = 3
"""


QUERIES["ch_ilike_ops"] = Query(
    ch_ilike_ops, CH_ILIKE_ORACLE, ("dialect", "string")
)
QUERIES["window_interval_range"] = Query(
    window_interval_range, WINDOW_INTERVAL_RANGE_ORACLE, ("window", "dialect")
)


def ch_scalar_with(spark, sf_dir):
    """ClickHouse's expression-alias WITH (``WITH expr AS ident SELECT``):
    constants, scalar subqueries, and aliases referencing earlier aliases
    all inline over the whole query body (engine.py _rewrite_scalar_with);
    standard CTEs and WITH RECURSIVE stay on Spark's native path.  The
    oracle spells the same query with the aliases expanded by hand."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sw")
    return eng.sql(
        "with 0.05 as disc_cap, "
        "(select avg(l_quantity) from li_sw) as avg_qty, "
        "avg_qty * 1.5 as qty_hi "
        "select l_returnflag as rf, count(*) as n, "
        "round(sum(l_extendedprice), 2) as s "
        "from li_sw "
        "where l_discount < disc_cap and l_quantity > qty_hi "
        "group by l_returnflag"
    )


CH_SCALAR_WITH_ORACLE = """
SELECT l_returnflag AS rf, count(*) AS n,
       round(sum(l_extendedprice), 2) AS s
FROM lineitem
WHERE l_discount < 0.05
  AND l_quantity > (SELECT avg(l_quantity) FROM lineitem) * 1.5
GROUP BY l_returnflag
"""


QUERIES["ch_scalar_with"] = Query(
    ch_scalar_with, CH_SCALAR_WITH_ORACLE, ("dialect", "clause")
)


def ch_paste_join(spark, sf_dir):
    """PASTE JOIN — CH's positional join (engine.py _rewrite_paste_join):
    row i of the left ordered subquery pairs with row i of the right.
    The classic use is ranking alignment: the k-th cheapest order zipped
    with the k-th most recent one.  Spark lowering: row_number window per
    side joined on the number (each side's trailing ORDER BY becomes its
    window ordering); DuckDB's POSITIONAL JOIN is the oracle."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_pj")
    return eng.sql(
        "select cheap_key, round(cheap_price, 2) as cheap_price, recent_key "
        "from ("
        "  select o_orderkey as cheap_key, o_totalprice as cheap_price "
        "  from ord_pj where o_orderkey % 11 = 0 "
        "  order by cheap_price, cheap_key limit 40"
        ") paste join ("
        "  select o_orderdate as od, o_orderkey as recent_key from ord_pj "
        "  where o_orderkey % 13 = 0 "
        "  order by od desc, recent_key limit 40"
        ")"
    )


CH_PASTE_JOIN_ORACLE = """
SELECT cheap_key, round(cheap_price, 2) AS cheap_price, recent_key
FROM (
  SELECT o_orderkey AS cheap_key, o_totalprice AS cheap_price
  FROM orders WHERE o_orderkey % 11 = 0
  ORDER BY cheap_price, cheap_key LIMIT 40
) POSITIONAL JOIN (
  SELECT o_orderdate AS od, o_orderkey AS recent_key FROM orders
  WHERE o_orderkey % 13 = 0
  ORDER BY od DESC, recent_key LIMIT 40
)
"""


def ch_rollup_cube_suffix(spark, sf_dir):
    """GROUP BY cols WITH ROLLUP / WITH CUBE — CH's suffix spellings of the
    standard prefix forms (engine.py _preprocess_ch_clauses, same tempered
    rewrite as WITH TOTALS).  Subtotal rows keep NULL keys (standard SQL
    grouping-set markers; CH renders type defaults — documented
    difference covered by the WITH TOTALS note)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_rc")
    return eng.sql(
        "select coalesce(st, 'ALL') as st, coalesce(pri, 'ALL') as pri, "
        "count(*) as n, round(sum(tp), 2) as s from ("
        "  select o_orderstatus as st, o_orderpriority as pri, "
        "  o_totalprice as tp from ord_rc where o_orderkey % 3 = 0"
        ") group by st, pri with rollup "
        "union all "
        "select coalesce(st, 'ALL') as st, 'cube' as pri, count(*) as n, "
        "round(sum(tp), 2) as s from ("
        "  select o_orderstatus as st, o_totalprice as tp from ord_rc "
        "  where o_orderkey % 5 = 0"
        ") group by st with cube"
    )


CH_ROLLUP_CUBE_ORACLE = """
SELECT coalesce(st, 'ALL') AS st, coalesce(pri, 'ALL') AS pri,
       count(*) AS n, round(sum(tp), 2) AS s FROM (
  SELECT o_orderstatus AS st, o_orderpriority AS pri,
         o_totalprice AS tp FROM orders WHERE o_orderkey % 3 = 0
) GROUP BY ROLLUP (st, pri)
UNION ALL
SELECT coalesce(st, 'ALL') AS st, 'cube' AS pri, count(*) AS n,
       round(sum(tp), 2) AS s FROM (
  SELECT o_orderstatus AS st, o_totalprice AS tp FROM orders
  WHERE o_orderkey % 5 = 0
) GROUP BY CUBE (st)
"""


QUERIES["ch_paste_join"] = Query(
    ch_paste_join, CH_PASTE_JOIN_ORACLE, ("dialect", "join")
)
QUERIES["ch_rollup_cube_suffix"] = Query(
    ch_rollup_cube_suffix, CH_ROLLUP_CUBE_ORACLE, ("dialect", "agg")
)


def ch_weighted_aggs(spark, sf_dir):
    """avgWeighted / boundingRatio / argMin / argMax — the everyday CH
    aggregate tier beyond the fork's aggregates.rs list (all rewrite to
    Spark built-ins: weighted mean as sum-product ratio, boundingRatio as
    the (max y - min y)/(max x - min x) slope, arg extremes as
    max_by/min_by)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_wa")
    # boundingRatio is the slope between the leftmost and rightmost
    # points BY X, so the endpoints must be tie-free: the synthetic
    # lineitem repeats even (orderkey, linenumber) pairs, so the inner
    # query collapses each x to one deterministic y first.
    return eng.sql(
        "select a.l_returnflag, w_price, brat, "
        "k_of_max_price, k_of_min_price "
        "from (select l_returnflag, "
        "round(avgWeighted(l_extendedprice, l_quantity), 4) as w_price, "
        "argMax(l_orderkey, l_extendedprice) as k_of_max_price, "
        "argMin(l_orderkey, l_extendedprice) as k_of_min_price "
        "from li_wa group by l_returnflag) a join "
        "(select l_returnflag, "
        "round(boundingRatio(x, y), 6) as brat from "
        "(select l_returnflag, l_orderkey * 8 + l_linenumber as x, "
        "max(l_extendedprice) as y from li_wa "
        "group by l_returnflag, l_orderkey * 8 + l_linenumber) "
        "group by l_returnflag) b on a.l_returnflag = b.l_returnflag"
    )


CH_WEIGHTED_AGGS_ORACLE = """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
         AS w_price,
       (SELECT round((arg_max(y, x) - arg_min(y, x))
                     / (max(x) - min(x)), 6)
        FROM (SELECT l_orderkey * 8 + l_linenumber AS x,
                     max(l_extendedprice) AS y
              FROM lineitem i
              WHERE i.l_returnflag = lineitem.l_returnflag
              GROUP BY 1) dd)                           AS brat,
       arg_max(l_orderkey, l_extendedprice) AS k_of_max_price,
       arg_min(l_orderkey, l_extendedprice) AS k_of_min_price
FROM lineitem GROUP BY l_returnflag
"""


QUERIES["ch_weighted_aggs"] = Query(
    ch_weighted_aggs, CH_WEIGHTED_AGGS_ORACLE, ("dialect", "agg")
)


def ch_bracket_arrays(spark, sf_dir):
    """CH bracket syntax end to end (engine.py _rewrite_bracket_arrays):
    `[...]` array literals (the spelling every CH array query uses) and
    1-BASED `expr[i]` subscripts with negative-from-end — lowered to
    array()/element_at, whose contract matches CH and DuckDB exactly
    (Spark's native [] is 0-based and would be silently off by one)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_br")
    return eng.sql(
        "select o_orderstatus as st, "
        "sum(cast(['never','low','high'][if(o_totalprice > 100000, 3, 2)] = 'high' as int)) as n_high, "
        "max([o_orderkey % 7, o_orderkey % 5, o_orderkey % 3][1]) as m7, "
        "max([o_orderkey % 7, o_orderkey % 5, o_orderkey % 3][-1]) as m3, "
        "sum(cast(has([1, 3], cast(o_orderkey % 5 as int)) as int)) as n_13 "
        "from ord_br group by o_orderstatus"
    )


CH_BRACKET_ARRAYS_ORACLE = """
SELECT o_orderstatus AS st,
       CAST(sum(CASE WHEN ['never','low','high'][
             CASE WHEN o_totalprice > 100000 THEN 3 ELSE 2 END] = 'high'
             THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       max([o_orderkey % 7, o_orderkey % 5, o_orderkey % 3][1]) AS m7,
       max([o_orderkey % 7, o_orderkey % 5, o_orderkey % 3][-1]) AS m3,
       CAST(sum(CASE WHEN list_contains([1, 3], o_orderkey % 5)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_13
FROM orders GROUP BY o_orderstatus
"""


def ch_everyday_funcs4(spark, sf_dir):
    """Fourth everyday-function tier: age (complete units), dateName,
    transform value-mapper (CH 4-arg form vs the Spark 2-arg HOF),
    caseWithExpression, max2/min2, formatReadableSize, topK (exact
    superset, stringified), multiSearchAny."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e4")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(age('day', o_orderdate, date'1998-12-31')) as age_d, "
        "max(age('month', o_orderdate, date'1998-12-31')) as age_m, "
        "max(dateName('month', o_orderdate)) as mname, "
        "sum(transform(cast(o_orderkey % 3 as int), [0, 1], [10, 20], 5)) as tsum, "
        "max(caseWithExpression(o_orderpriority, '1-URGENT', 'u', '2-HIGH', 'h', 'x')) as cw, "
        "max(max2(o_orderkey % 10, 5)) as m2, "
        "min(min2(o_orderkey % 10, 5)) as n2, "
        "formatReadableSize(max(o_orderkey)) as sz, "
        "arrayStringConcat(topK(2)(o_orderpriority), '|') as topp, "
        "sum(cast(multiSearchAny(o_orderpriority, ['URGENT', 'HIGH']) as int)) as n_uh "
        "from ord_e4 group by o_orderstatus"
    )


CH_EVERYDAY4_ORACLE = """
WITH pr AS (
  SELECT o_orderstatus AS st, o_orderpriority AS p, count(*) AS c
  FROM orders GROUP BY 1, 2
), tk AS (
  SELECT st, string_agg(p, '|' ORDER BY c DESC, p) FILTER (rnk <= 2) AS topp
  FROM (SELECT st, p, c,
               row_number() OVER (PARTITION BY st ORDER BY c DESC, p) AS rnk
        FROM pr) GROUP BY st
)
SELECT o.st, max(o.age_d) AS age_d, max(o.age_m) AS age_m,
       max(o.mname) AS mname, CAST(sum(o.t) AS BIGINT) AS tsum,
       max(o.cw) AS cw, max(o.m2) AS m2, min(o.n2) AS n2,
       format('{:.2f} KiB', CAST(max(o.ok) AS DOUBLE) / 1024) AS sz,
       any_value(tk.topp) AS topp,
       CAST(sum(o.uh) AS BIGINT) AS n_uh
FROM (
  SELECT o_orderstatus AS st, o_orderkey AS ok,
         datediff('day', o_orderdate, DATE '1998-12-31') AS age_d,
         CAST(floor(12 * (1998 - year(o_orderdate))
              + (12 - month(o_orderdate))
              + CASE WHEN 31 >= dayofmonth(o_orderdate) THEN 0 ELSE -1 END
              ) AS BIGINT) AS age_m,
         monthname(o_orderdate) AS mname,
         CASE o_orderkey % 3 WHEN 0 THEN 10 WHEN 1 THEN 20 ELSE 5 END AS t,
         CASE o_orderpriority WHEN '1-URGENT' THEN 'u'
              WHEN '2-HIGH' THEN 'h' ELSE 'x' END AS cw,
         greatest(o_orderkey % 10, 5) AS m2,
         least(o_orderkey % 10, 5) AS n2,
         CASE WHEN o_orderpriority LIKE '%URGENT%'
                OR o_orderpriority LIKE '%HIGH%' THEN 1 ELSE 0 END AS uh
  FROM orders
) o JOIN tk ON tk.st = o.st
GROUP BY o.st
"""


QUERIES["ch_bracket_arrays"] = Query(
    ch_bracket_arrays, CH_BRACKET_ARRAYS_ORACLE, ("dialect", "array")
)
QUERIES["ch_everyday_funcs4"] = Query(
    ch_everyday_funcs4, CH_EVERYDAY4_ORACLE, ("dialect", "functions")
)


def ch_with_fill_dates(spark, sf_dir):
    """ORDER BY d WITH FILL over a DATE axis with STEP INTERVAL — the
    time-series densification WITH FILL exists for (engine.py
    _run_with_fill temporal branch): explicit FROM/TO (TO exclusive, CH
    contract), generated gap rows take type defaults, INTERPOLATE carries
    the previous value forward."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_wfd")
    return eng.sql(
        "select d, n, s from (select o_orderdate as d, count(*) as n, "
        "round(sum(o_totalprice), 2) as s from ord_wfd "
        "where o_orderdate >= date'1995-03-01' and o_orderdate < date'1995-03-10' "
        "group by o_orderdate) "
        "order by d with fill from date'1995-03-01' to date'1995-03-15' "
        "step interval 1 day interpolate (s)"
    )


CH_WITH_FILL_DATES_ORACLE = """
WITH agg AS (
  SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS n,
         round(sum(o_totalprice), 2) AS s
  FROM orders
  WHERE o_orderdate >= DATE '1995-03-01' AND o_orderdate < DATE '1995-03-10'
  GROUP BY o_orderdate
), axis AS (
  SELECT CAST(unnest(generate_series(DATE '1995-03-01', DATE '1995-03-14',
                                     INTERVAL 1 DAY)) AS DATE) AS d
), united AS (
  SELECT coalesce(axis.d, agg.d) AS d, coalesce(agg.n, 0) AS n, agg.s AS s0
  FROM axis FULL OUTER JOIN agg ON axis.d = agg.d
)
SELECT d, n,
       coalesce(s0, lag(s0 IGNORE NULLS) OVER (ORDER BY d), 0.0) AS s
FROM united ORDER BY d
"""


QUERIES["ch_with_fill_dates"] = Query(
    ch_with_fill_dates, CH_WITH_FILL_DATES_ORACLE, ("dialect", "clause")
)


def ch_everyday_funcs5(spark, sf_dir):
    """Fifth everyday tier: dateTrunc camelCase, toTime, tokens, character
    ngrams, roundBankers (half-to-even — plain round would be wrong on .5
    ties), toIntervalDay arithmetic, visitParam JSON accessors."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e5")
    return eng.sql(
        "select o_orderstatus as st, "
        "toDate(max(dateTrunc('month', o_orderdate))) as mtrunc, "
        "max(toDate(o_orderdate + toIntervalDay(30))) as d30, "
        "max(toDate(o_orderdate + toIntervalMonth(2))) as m2, "
        "round(sum(roundBankers(cast(o_orderkey % 10 + 0.5 as double))), 1) as rb, "
        "max(size(tokens(o_orderpriority))) as ntok, "
        "arrayStringConcat(ngrams(max(o_orderpriority), 3), '|') as grams, "
        "max(visitParamExtractInt(concat('{\"k\":', o_orderkey, '}'), 'k')) as jk "
        "from ord_e5 group by o_orderstatus"
    )


CH_EVERYDAY5_ORACLE = """
WITH mx AS (
  SELECT o_orderstatus AS st, max(o_orderpriority) AS mp
  FROM orders GROUP BY 1
), grams AS (
  SELECT st, string_agg(substr(mp, i, 3), '|' ORDER BY i) AS grams
  FROM mx, UNNEST(range(1, len(mp) - 1)) AS u(i)
  GROUP BY st
)
SELECT o.o_orderstatus AS st,
       CAST(date_trunc('month', max(o.o_orderdate)) AS DATE) AS mtrunc,
       CAST(max(o.o_orderdate) + INTERVAL 30 DAY AS DATE) AS d30,
       CAST(max(o.o_orderdate) + INTERVAL 2 MONTH AS DATE) AS m2,
       round(CAST(sum(CASE WHEN (o.o_orderkey % 10) % 2 = 0
                THEN o.o_orderkey % 10
                ELSE o.o_orderkey % 10 + 1 END) AS DOUBLE), 1) AS rb,
       CAST(max(len(string_split_regex(o.o_orderpriority, '\\s+'))) AS INT)
         AS ntok,
       any_value(g.grams) AS grams,
       max(o.o_orderkey) AS jk
FROM orders o JOIN grams g ON g.st = o.o_orderstatus
GROUP BY o.o_orderstatus
"""


QUERIES["ch_everyday_funcs5"] = Query(
    ch_everyday_funcs5, CH_EVERYDAY5_ORACLE, ("dialect", "functions")
)


def ch_window_timeseries(spark, sf_dir):
    """Upstream-CH time-series window functions: nonNegativeDerivative
    (rate-per-second, negatives and frame-first clamp to 0 — engine.py
    clause rewrite, needs the OVER text twice), lagInFrame/leadInFrame
    (functions/clickhouse.py), and simpleLinearRegression as the per-user
    value-vs-time trend (tuple aggregate + tupleElement).  The inner
    window and the outer GROUP BY share the user_id partitioning — one
    Exchange serves the whole query."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_wts")
    return eng.sql(
        "select user_id, "
        "round(sum(rate), 6) as sum_rate, "
        "max(prev) as max_prev, "
        "min(nxt) as min_next, "
        "round(tupleElement(simpleLinearRegression(tsec, value), 1) * 1e6, 4)"
        "  as trend_k_1e6 "
        "from ("
        "  select user_id, value, toUnixTimestamp(ts) as tsec, "
        "    nonNegativeDerivative(value, ts) over w as rate, "
        "    lagInFrame(value) over w as prev, "
        "    leadInFrame(value, 1, 1e9) over w as nxt "
        "  from ev_wts where user_id % 17 = 0 "
        "  window w as (partition by user_id order by ts, event_id)"
        ") group by user_id order by user_id"
    )


CH_WINDOW_TS_ORACLE = """
WITH w AS (
  -- CAST(floor(epoch)) mirrors CH/Spark toUnixTimestamp SECOND truncation
  -- (DuckDB epoch() keeps fractional seconds)
  SELECT user_id, event_id, ts, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         lead(value, 1, 1e9) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dt
  FROM events WHERE user_id % 17 = 0
)
SELECT user_id,
       round(sum(greatest(coalesce((value - prev) / nullif(CAST(dt AS DOUBLE), 0.0), 0.0), 0.0)), 6) AS sum_rate,
       max(prev) AS max_prev,
       min(nxt) AS min_next,
       round((covar_pop(tsec, value) / var_pop(tsec)) * 1e6, 4) AS trend_k_1e6
FROM w GROUP BY user_id ORDER BY user_id
"""


QUERIES["ch_window_timeseries"] = Query(
    ch_window_timeseries, CH_WINDOW_TS_ORACLE, ("dialect", "window", "timeseries")
)


def ch_histogram_agg(spark, sf_dir):
    """histogram(M)(x) parametric aggregate (functions/clickhouse.py
    _histogram_tmpl): M equi-width bins over [min, max] — the
    deterministic analogue of CH's adaptive streaming histogram (whose
    bin edges depend on arrival order; documented difference).  The M
    conditional sums live in ONE partial->final aggregate pass.  Edges
    stringify as 1e2-scaled ints (double->string formatting differs
    between engines)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_hist")
    return eng.sql(
        "select o_orderstatus as st, "
        "arrayStringConcat(arrayMap(t -> concat("
        "  toString(toInt64(floor(tupleElement(t, 1) * 100 + 0.5))), ':', "
        "  toString(toInt64(floor(tupleElement(t, 2) * 100 + 0.5))), ':', "
        "  toString(toInt64(tupleElement(t, 3)))), "
        "histogram(8)(o_totalprice)), '|') as hist "
        "from ord_hist group by o_orderstatus"
    )


def _hist_oracle() -> str:
    piece = (
        "CAST(CAST(floor((lo + i * w) * 100 + 0.5) AS BIGINT) AS VARCHAR) "
        "|| ':' || "
        "CAST(CAST(floor((lo + (i + 1) * w) * 100 + 0.5) AS BIGINT) AS VARCHAR) "
        "|| ':' || CAST(cnt AS VARCHAR)"
    )
    return f"""
WITH m AS (
  SELECT o_orderstatus AS st, min(o_totalprice) AS lo, max(o_totalprice) AS hi
  FROM orders GROUP BY o_orderstatus
), bins AS (
  SELECT st, lo, hi, (hi - lo) / 8.0 AS w, g.i
  FROM m CROSS JOIN generate_series(0, 7) g(i)
), cnt AS (
  SELECT b.st, b.i, b.lo, b.w,
         sum(CASE WHEN o.o_totalprice >= b.lo + b.i * b.w
                   AND (CASE WHEN b.i < 7
                             THEN o.o_totalprice < b.lo + (b.i + 1) * b.w
                             ELSE o.o_totalprice <= b.hi END)
                  THEN 1 ELSE 0 END) AS cnt
  FROM bins b JOIN orders o ON o.o_orderstatus = b.st
  GROUP BY b.st, b.i, b.lo, b.w
)
SELECT st, string_agg({piece}, '|' ORDER BY i) AS hist
FROM cnt GROUP BY st
"""


CH_HISTOGRAM_ORACLE = _hist_oracle()


QUERIES["ch_histogram_agg"] = Query(
    ch_histogram_agg, CH_HISTOGRAM_ORACLE, ("dialect", "aggregate", "histogram")
)


def ch_combinators2(spark, sf_dir):
    """Generic -Distinct / -OrNull / -OrDefault combinator peeling
    (engine.py translate_sql — same suffix scheme as -If, composing on
    every known aggregate without per-name entries): sumDistinct,
    avgDistinct, minOrNull/countOrNull over an empty-by-filter subset
    (NULL, not 0), maxOrDefault (type default 0)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_cb2")
    return eng.sql(
        "select l_returnflag as rf, "
        "sumDistinct(l_quantity) as sd, "
        "round(avgDistinct(l_quantity), 4) as ad, "
        "countOrNull(if(l_quantity > 1e9, 1, null)) as cn, "
        "minOrNull(if(l_quantity > 1e9, l_quantity, null)) as mn, "
        "maxOrDefault(if(l_quantity > 1e9, l_quantity, null)) as md "
        "from li_cb2 group by l_returnflag"
    )


CH_COMBINATORS2_ORACLE = """
SELECT l_returnflag AS rf,
       sum(DISTINCT l_quantity) AS sd,
       round(avg(DISTINCT l_quantity), 4) AS ad,
       nullif(count(CASE WHEN l_quantity > 1e9 THEN 1 END), 0) AS cn,
       min(CASE WHEN l_quantity > 1e9 THEN l_quantity END) AS mn,
       coalesce(max(CASE WHEN l_quantity > 1e9 THEN l_quantity END), 0) AS md
FROM lineitem GROUP BY l_returnflag
"""


QUERIES["ch_combinators2"] = Query(
    ch_combinators2, CH_COMBINATORS2_ORACLE, ("dialect", "combinators")
)


def ch_everyday_funcs6(spark, sf_dir):
    """Sixth everyday tier: bar() unicode bars (CH's eighth-block glyph
    set, clamped), formatReadableQuantity units, simpleLinearRegression
    tuple elements over group aggregates — all deterministic string/
    moment expressions, value-hashed against DuckDB reproducing the same
    glyph math."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e6")
    return eng.sql(
        "select o_orderstatus as st, "
        "bar(count(*), 0, (select count(*) from ord_e6), 20) as share_bar, "
        "formatReadableQuantity(round(sum(o_totalprice), 0)) as s_readable, "
        "round(tupleElement(simpleLinearRegression("
        "  o_orderkey % 1000, o_totalprice), 1), 6) as k_fit "
        "from ord_e6 group by o_orderstatus"
    )


CH_EVERYDAY6_ORACLE = """
WITH tot AS (SELECT count(*) AS n FROM orders),
g AS (
  SELECT o_orderstatus AS st, count(*) AS cnt,
         round(sum(o_totalprice), 0) AS s,
         covar_pop(o_orderkey % 1000, o_totalprice)
           / var_pop(o_orderkey % 1000) AS k
  FROM orders GROUP BY o_orderstatus
), u AS (
  SELECT st, cnt, s, k,
         CAST(floor(greatest(least(CAST(cnt AS DOUBLE) / n, 1.0), 0.0)
                    * 20 * 8) AS BIGINT) AS units
  FROM g CROSS JOIN tot
)
SELECT st,
       repeat('█', CAST(units // 8 AS INT))
         || CASE WHEN units % 8 > 0
                 THEN substring('▏▎▍▌▋▊▉', CAST(units % 8 AS INT), 1)
                 ELSE '' END AS share_bar,
       CASE WHEN abs(s) >= 1e9 THEN CAST(round(s / 1e9, 2) AS VARCHAR) || ' billion'
            WHEN abs(s) >= 1e6 THEN CAST(round(s / 1e6, 2) AS VARCHAR) || ' million'
            WHEN abs(s) >= 1e3 THEN CAST(round(s / 1e3, 2) AS VARCHAR) || ' thousand'
            ELSE CAST(round(CAST(s AS DOUBLE), 2) AS VARCHAR) END AS s_readable,
       round(k, 6) AS k_fit
FROM u
"""


QUERIES["ch_everyday_funcs6"] = Query(
    ch_everyday_funcs6, CH_EVERYDAY6_ORACLE, ("dialect", "functions")
)


def ch_entropy_kv(spark, sf_dir):
    """entropy(x) Shannon-entropy aggregate (single-collect lambda-binding
    buffer, the histogram(M) shape) + extractKeyValuePairs over a
    synthesized kv string — map outputs probe through mapLength/element
    access (containers can't be driver-hashed raw)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_ent")
    return eng.sql(
        "select o_orderstatus as st, "
        "round(entropy(o_orderpriority), 6) as h_prio, "
        "round(entropy(o_orderkey % 4), 6) as h_key4, "
        "max(mapLength(extractKeyValuePairs("
        "  concat('k:', toString(o_orderkey % 3), ', p:', o_orderpriority)"
        "))) as kv_n, "
        "max(extractKeyValuePairs("
        "  concat('k:', toString(o_orderkey % 3), ', p:', o_orderpriority)"
        ")['k']) as kv_max_k "
        "from ord_ent group by o_orderstatus"
    )


CH_ENTROPY_KV_ORACLE = """
WITH p1 AS (
  SELECT o_orderstatus AS st, o_orderpriority AS v, count(*) AS c
  FROM orders GROUP BY 1, 2
), t1 AS (SELECT st, sum(c) AS total FROM p1 GROUP BY st),
h1 AS (
  SELECT p1.st,
         round(-sum((CAST(c AS DOUBLE) / total) * log2(CAST(c AS DOUBLE) / total)), 6) AS h_prio
  FROM p1 JOIN t1 USING (st) GROUP BY p1.st
), p2 AS (
  SELECT o_orderstatus AS st, o_orderkey % 4 AS v, count(*) AS c
  FROM orders GROUP BY 1, 2
), t2 AS (SELECT st, sum(c) AS total FROM p2 GROUP BY st),
h2 AS (
  SELECT p2.st,
         round(-sum((CAST(c AS DOUBLE) / total) * log2(CAST(c AS DOUBLE) / total)), 6) AS h_key4
  FROM p2 JOIN t2 USING (st) GROUP BY p2.st
), kv AS (
  -- space is a pair delimiter (CH default): '4-NOT SPECIFIED' splits a
  -- third (value-less) token, so groups containing it see 3 map keys
  SELECT o_orderstatus AS st,
         CAST(max(CASE WHEN o_orderpriority LIKE '% %' THEN 3 ELSE 2 END) AS BIGINT) AS kv_n
  FROM orders GROUP BY o_orderstatus
)
SELECT h1.st, h1.h_prio, h2.h_key4, kv.kv_n, '2' AS kv_max_k
FROM h1 JOIN h2 ON h1.st = h2.st JOIN kv ON kv.st = h1.st
"""


QUERIES["ch_entropy_kv"] = Query(
    ch_entropy_kv, CH_ENTROPY_KV_ORACLE, ("dialect", "aggregate", "entropy")
)


def ch_topk_weighted(spark, sf_dir):
    """topKWeighted(k)(x, w) — weight-summed heavy hitters per group
    (functions/clickhouse.py; deterministic exact analogue of CH's
    SpaceSaving sketch, single-collect buffer, total (weight desc, value)
    order).  Top-3 order priorities by total price within each status,
    serialized for the hash."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_tkw")
    return eng.sql(
        "select o_orderstatus as st, "
        "arrayStringConcat(topKWeighted(3)(o_orderpriority, o_totalprice), '|') "
        "as top3 from ord_tkw group by o_orderstatus"
    )


CH_TOPK_WEIGHTED_ORACLE = """
WITH w AS (
  SELECT o_orderstatus AS st, o_orderpriority AS v, sum(o_totalprice) AS tw
  FROM orders GROUP BY 1, 2
), r AS (
  SELECT st, v, row_number() OVER (PARTITION BY st ORDER BY tw DESC, v) AS rk
  FROM w
)
SELECT st, string_agg(v, '|' ORDER BY rk) AS top3
FROM r WHERE rk <= 3 GROUP BY st
"""


QUERIES["ch_topk_weighted"] = Query(
    ch_topk_weighted, CH_TOPK_WEIGHTED_ORACLE, ("dialect", "aggregate", "topk")
)


def ch_cast_type_names(spark, sf_dir):
    """BQL/CH type names as CAST targets and ``::`` postfix casts
    (engine.py _CAST_TYPE_RE, round 7; reference cast surface
    sanity_checks.rs:623-800): Int64/Int32/UInt32/Float64/Float32/String/
    DateTime all translate to the same Spark types the DDL layer maps
    (types.py), so the reference's own cast queries run as SQL text."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_ct")
    return eng.sql(
        "select cast(o_orderkey % 7 as Int32) as k, "
        "cast(count(*) as Int64) as n, "
        "cast(sum(cast(o_totalprice as Int64)) as Int64) as s_i64, "
        "cast(max(o_orderkey) as UInt32) as mx_u32, "
        "floor(sum(o_totalprice :: Float64) / 100) as s_f64, "
        "max(cast(o_orderdate as String)) as mx_str, "
        "max(toYear(cast(cast(o_orderdate as String) as DateTime))) as y "
        "from ord_ct group by cast(o_orderkey % 7 as Int32)"
    )


CH_CAST_TYPE_NAMES_ORACLE = """
SELECT CAST(o_orderkey % 7 AS INTEGER) AS k,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(trunc(o_totalprice) AS BIGINT)) AS BIGINT) AS s_i64,  -- Spark/CH float->int casts truncate; DuckDB rounds
       CAST(max(o_orderkey) AS BIGINT) AS mx_u32,
       CAST(floor(sum(o_totalprice :: DOUBLE) / 100) AS BIGINT) AS s_f64,
       max(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')) AS mx_str,
       CAST(max(year(o_orderdate)) AS BIGINT) AS y
FROM orders GROUP BY 1
"""


QUERIES["ch_cast_type_names"] = Query(
    ch_cast_type_names, CH_CAST_TYPE_NAMES_ORACLE, ("dialect", "cast", "types")
)


def ch_uuid_text_funcs(spark, sf_dir):
    """UUID family through the SQL-TEXT dialect layer (round 7 — the
    Column builders existed since r2, but UUIDStringToNum / UUIDNumToString
    / toUUID* were unreachable from ``engine.sql`` text until the
    CH_SQL_TEMPLATES entries landed; reference golden
    sanity_checks.rs:1204).  UUIDs synthesized from doc ids via md5, the
    num form asserted via length + round-trip like the reference."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("doc_uu")
    return eng.sql(
        "select doc_id, "
        "toUUID(concat_ws('-', substring(md5(cast(doc_id as String)), 1, 8), "
        " substring(md5(cast(doc_id as String)), 9, 4), "
        " substring(md5(cast(doc_id as String)), 13, 4), "
        " substring(md5(cast(doc_id as String)), 17, 4), "
        " substring(md5(cast(doc_id as String)), 21, 12))) as u, "
        "length(UUIDStringToNum(concat_ws('-', "
        " substring(md5(cast(doc_id as String)), 1, 8), "
        " substring(md5(cast(doc_id as String)), 9, 4), "
        " substring(md5(cast(doc_id as String)), 13, 4), "
        " substring(md5(cast(doc_id as String)), 17, 4), "
        " substring(md5(cast(doc_id as String)), 21, 12)))) as num_len, "
        "UUIDNumToString(UUIDStringToNum(concat_ws('-', "
        " substring(md5(cast(doc_id as String)), 1, 8), "
        " substring(md5(cast(doc_id as String)), 9, 4), "
        " substring(md5(cast(doc_id as String)), 13, 4), "
        " substring(md5(cast(doc_id as String)), 17, 4), "
        " substring(md5(cast(doc_id as String)), 21, 12)))) as u_rt, "
        "toUUIDOrZero(lang) as u_zero "
        "from doc_uu"
    )


CH_UUID_TEXT_ORACLE = """
WITH d AS (
  SELECT doc_id, lang,
         concat_ws('-', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                        substring(md5(CAST(doc_id AS VARCHAR)), 9, 4),
                        substring(md5(CAST(doc_id AS VARCHAR)), 13, 4),
                        substring(md5(CAST(doc_id AS VARCHAR)), 17, 4),
                        substring(md5(CAST(doc_id AS VARCHAR)), 21, 12)) AS u
  FROM documents
)
SELECT doc_id, u, CAST(16 AS INTEGER) AS num_len, u AS u_rt,
       '00000000-0000-0000-0000-000000000000' AS u_zero
FROM d
"""


QUERIES["ch_uuid_text_funcs"] = Query(
    ch_uuid_text_funcs, CH_UUID_TEXT_ORACLE, ("dialect", "uuid")
)


def ch_everyday_funcs7(spark, sf_dir):
    """Everyday upstream-CH tier 7 (round-7 gap probe): gcd/lcm (Euclid
    unrolled through a codegen'd aggregate ladder), ifNotFinite,
    to/fromModifiedJulianDay, age('week'), JSONExtractKeys, typed
    emptyArray<T>(), CH-named arrayZip tuples (_1.._n fields so
    tupleElement resolves), seeded deterministic arrayShuffle."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e7")
    return eng.sql(
        "select cast(o_orderkey % 6 as Int32) as k, "
        "cast(sum(gcd(o_orderkey, 36)) as Int64) as g, "
        "cast(sum(lcm(o_orderkey % 7 + 1, 6)) as Int64) as l, "
        "round(sum(ifNotFinite(o_totalprice / 10, -1.0)), 2) as fin, "
        "max(toModifiedJulianDay(o_orderdate)) as mjd, "
        "cast(max(cast(fromModifiedJulianDay("
        "  toModifiedJulianDay(o_orderdate)) as string)) as String) as mjd_rt, "
        "max(age('week', date'1995-01-01', o_orderdate)) as wk, "
        "arrayStringConcat(JSONExtractKeys('{\"x\":1,\"y\":2}'), ',') as jk, "
        "cast(size(emptyArrayInt64()) as Int32) as ez, "
        "max(tupleElement(arrayZip([o_orderkey % 5, 2], [30, 40])[1], 1)) as zp, "
        "cast(arrayShuffle([3, 1, 2], 7) = arrayShuffle([3, 1, 2], 7) "
        "  as Boolean) as shf "
        "from ord_e7 group by cast(o_orderkey % 6 as Int32)"
    )


CH_EVERYDAY7_ORACLE = """
SELECT CAST(o_orderkey % 6 AS INTEGER) AS k,
       CAST(sum(gcd(o_orderkey, 36)) AS BIGINT) AS g,
       CAST(sum(lcm(o_orderkey % 7 + 1, 6)) AS BIGINT) AS l,
       round(sum(o_totalprice / 10), 2) AS fin,
       CAST(max(date_diff('day', DATE '1858-11-17',
                CAST(o_orderdate AS DATE))) AS INTEGER) AS mjd,
       max(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')) AS mjd_rt,
       CAST(max(floor(date_diff('day', DATE '1995-01-01',
                CAST(o_orderdate AS DATE)) / 7)) AS BIGINT) AS wk,
       'x,y' AS jk,
       CAST(0 AS INTEGER) AS ez,
       CAST(max(o_orderkey % 5) AS BIGINT) AS zp,
       true AS shf
FROM orders GROUP BY 1
"""


QUERIES["ch_everyday_funcs7"] = Query(
    ch_everyday_funcs7, CH_EVERYDAY7_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs8(spark, sf_dir):
    """Everyday upstream-CH tier 8 (round-7 gap probe, second pass):
    sumMap/minMap/maxMap (per-key map aggregation as CH's sorted
    (keys, values) tuple), sumCount, format('{}...') brace placeholders,
    editDistance, the subtract* calendar mirrors, toRelativeDayNum,
    corrStable."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e8")
    return eng.sql(
        "select o_orderstatus as st, "
        "arrayStringConcat(tupleElement(sumMap(map(o_orderpriority, "
        "  cast(1 as Float64))), 1), ',') as sm_keys, "
        "arrayStringConcat(arrayMap(x -> toString(toInt64(x)), "
        "  tupleElement(sumMap(map(o_orderpriority, cast(1 as Float64))), 2)),"
        "  ',') as sm_counts, "
        "toInt64(tupleElement(sumCount(o_totalprice), 2)) as sc_n, "
        "max(format('{}#{}', o_orderpriority, o_orderkey % 10)) as fmt, "
        "max(editDistance(o_orderpriority, '1-URGENT')) as ed, "
        "max(cast(subtractWeeks(o_orderdate, 2) as String)) as sw, "
        "max(toRelativeDayNum(o_orderdate)) as rdn, "
        "round(corrStable(cast(o_orderkey % 100 as Float64), "
        "  o_totalprice), 4) as corr_v "
        "from ord_e8 group by o_orderstatus"
    )


CH_EVERYDAY8_ORACLE = """
WITH pk AS (
  SELECT o_orderstatus AS st, o_orderpriority AS p, count(*) AS c
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus AS st,
       (SELECT string_agg(p, ',' ORDER BY p) FROM pk
         WHERE pk.st = o_orderstatus) AS sm_keys,
       (SELECT string_agg(CAST(c AS VARCHAR), ',' ORDER BY p) FROM pk
         WHERE pk.st = o_orderstatus) AS sm_counts,
       CAST(count(o_totalprice) AS BIGINT) AS sc_n,
       max(o_orderpriority || '#' ||
           CAST(o_orderkey % 10 AS VARCHAR)) AS fmt,
       CAST(max(levenshtein(o_orderpriority, '1-URGENT')) AS INTEGER) AS ed,
       max(strftime(CAST(o_orderdate AS DATE) - INTERVAL 14 DAY,
           '%Y-%m-%d')) AS sw,
       CAST(max(date_diff('day', DATE '1970-01-01',
           CAST(o_orderdate AS DATE))) AS INTEGER) AS rdn,
       round(corr(CAST(o_orderkey % 100 AS DOUBLE), o_totalprice), 4)
         AS corr_v
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs8"] = Query(
    ch_everyday_funcs8, CH_EVERYDAY8_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs9(spark, sf_dir):
    """Everyday upstream-CH tier 9 (round-8 gap probe): bitHammingDistance,
    bitRotateLeft, parseDateTimeBestEffort (lenient multi-layout parse),
    arrayCumSumNonNegative (clamped running sum — a clamp RESETS the base),
    roundDown (bucket floor), normalizeQuery (literals -> ?), plus the
    hex/unhex pass-through builtins proving the dialect leaves Spark
    builtins intact."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e9")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(bitHammingDistance(o_orderkey, o_custkey)) as bhd, "
        "max(bitRotateLeft(o_orderkey % 256, 3)) as brl, "
        "count(case when parseDateTimeBestEffort("
        "  date_format(o_orderdate, 'dd/MM/yyyy')) = "
        "  cast(to_date(o_orderdate) as timestamp) then 1 end) as pd_ok, "
        "arrayStringConcat(arrayMap(x -> toString(round(x, 2)), "
        "  arrayCumSumNonNegative(array(round(max(o_totalprice), 2), "
        "    -2 * round(max(o_totalprice), 2), "
        "    round(max(o_totalprice), 2) / 2))), ',') as acsnn, "
        "round(cast(max(roundDown(o_totalprice, "
        "  array(0.0, 50000.0, 100000.0, 200000.0, 300000.0, 400000.0))) "
        "  as Float64), 1) as rd, "
        "max(normalizeQuery(concat('select * from t where id = ', "
        "  o_orderkey, \" and name = 'x'\"))) as nq, "
        "max(cast(unhex(hex(o_orderpriority)) as string)) as hx "
        "from ord_e9 group by o_orderstatus"
    )


CH_EVERYDAY9_ORACLE = """
SELECT o_orderstatus AS st,
       CAST(max(bit_count(xor(o_orderkey, o_custkey))) AS INTEGER) AS bhd,
       CAST(max((o_orderkey % 256) * 8) AS BIGINT) AS brl,
       CAST(count(*) AS BIGINT) AS pd_ok,
       CAST(round(max(o_totalprice), 2) AS VARCHAR) || ',0.0,' ||
         CAST(round(round(max(o_totalprice), 2) / 2, 2) AS VARCHAR)
         AS acsnn,
       round(CAST(max(CASE
         WHEN o_totalprice >= 400000 THEN 400000.0
         WHEN o_totalprice >= 300000 THEN 300000.0
         WHEN o_totalprice >= 200000 THEN 200000.0
         WHEN o_totalprice >= 100000 THEN 100000.0
         WHEN o_totalprice >= 50000 THEN 50000.0
         ELSE 0.0 END) AS DOUBLE), 1) AS rd,
       'select * from t where id = ? and name = ?' AS nq,
       max(o_orderpriority) AS hx
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs9"] = Query(
    ch_everyday_funcs9, CH_EVERYDAY9_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs10(spark, sf_dir):
    """Everyday upstream-CH tier 10 (round-9 gap probe): bin (whole-byte
    padded binary text; CH pads to the TYPE width — widths are erased
    here, so the documented spec is the value's minimal byte width),
    byteSwap (64-bit byte reversal; exercised on a 2-byte value whose swap fits signed 64 — Spark shiftleft WRAPS where DuckDB RAISES, so the oracle pins the non-wrapping domain), stringJaccardIndex (character-SET
    Jaccard — DuckDB's jaccard() is the same spec, which is what makes
    this oracle-checkable), and the arrayRotateLeft/Right +
    arrayShiftLeft/Right family as pure slice/concat compositions."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e10")
    return eng.sql(
        "select o_orderstatus as st, "
        "bin(max(o_orderkey) % 200) as b, "
        "byteSwap((max(o_orderkey) % 128) + 256 * (max(o_orderkey) % 256)) as bs, "
        "cast(floor(max(stringJaccardIndex(lower(o_orderpriority), "
        "  'priority')) * 10000 + 0.5) as bigint) as sj, "
        "arrayStringConcat(arrayMap(x -> toString(x), arrayRotateLeft("
        "  array(max(o_orderkey) % 7, max(o_orderkey) % 5, "
        "        max(o_orderkey) % 3), 2)), ',') as arl, "
        "arrayStringConcat(arrayMap(x -> toString(x), arrayRotateRight("
        "  array(max(o_orderkey) % 7, max(o_orderkey) % 5, "
        "        max(o_orderkey) % 3), 2)), ',') as arr, "
        "arrayStringConcat(arrayMap(x -> toString(x), arrayShiftLeft("
        "  array(max(o_orderkey) % 7, max(o_orderkey) % 5, "
        "        max(o_orderkey) % 3), 1, 0)), ',') as asl, "
        "arrayStringConcat(arrayMap(x -> toString(x), arrayShiftRight("
        "  array(max(o_orderkey) % 7, max(o_orderkey) % 5, "
        "        max(o_orderkey) % 3), 1, 9)), ',') as asr "
        "from ord_e10 group by o_orderstatus"
    )


CH_EVERYDAY10_ORACLE = """
WITH g AS (
  SELECT o_orderstatus AS st, max(o_orderkey) AS k,
         floor(max(jaccard(lower(o_orderpriority), 'priority')) * 10000
               + 0.5) AS sj
  FROM orders GROUP BY o_orderstatus
)
SELECT st,
       lpad(bin(k % 200),
            CAST(ceil(length(bin(k % 200)) / 8.0) * 8 AS INT), '0') AS b,
       (CAST((k % 128) AS BIGINT) << 56)
         + (CAST((k % 256) AS BIGINT) << 48) AS bs,
       CAST(sj AS BIGINT) AS sj,
       CAST(k % 3 AS VARCHAR) || ',' || CAST(k % 7 AS VARCHAR) || ',' ||
         CAST(k % 5 AS VARCHAR) AS arl,
       CAST(k % 5 AS VARCHAR) || ',' || CAST(k % 3 AS VARCHAR) || ',' ||
         CAST(k % 7 AS VARCHAR) AS arr,
       CAST(k % 5 AS VARCHAR) || ',' || CAST(k % 3 AS VARCHAR) || ',0'
         AS asl,
       '9,' || CAST(k % 7 AS VARCHAR) || ',' || CAST(k % 5 AS VARCHAR)
         AS asr
FROM g
"""


QUERIES["ch_everyday_funcs10"] = Query(
    ch_everyday_funcs10, CH_EVERYDAY10_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs11(spark, sf_dir):
    """Everyday upstream-CH tier 11 (round-9 session-2 gap probe): the
    date-arithmetic stragglers — toLastDayOfMonth, toISOWeek/toISOYear
    (Spark weekofyear IS ISO; ISO year via the shift-to-Thursday
    identity), toModifiedJulianDay (inverse of the already-shipped
    fromModifiedJulianDay), the 64Milli unix-timestamp pair, and
    addQuarters/subtractQuarters completing the add/subtract interval
    family; plus the left/right/repeat/translate string passthroughs
    (Spark builtins, template-free)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e11")
    return eng.sql(
        "select o_orderpriority as pri, "
        "max(toLastDayOfMonth(o_orderdate)) as eom, "
        "max(toISOWeek(o_orderdate)) as iw, "
        "min(toISOYear(o_orderdate)) as iy, "
        "max(toModifiedJulianDay(o_orderdate)) as mjd, "
        "max(toUnixTimestamp64Milli(toDateTime(o_orderdate))) as ms, "
        "max(toDate(fromUnixTimestamp64Milli(86400000 * "
        "  (o_orderkey % 1000)))) as from_ms, "
        "max(addQuarters(o_orderdate, 2)) as plus2q, "
        "min(subtractQuarters(o_orderdate, 3)) as minus3q, "
        "max(left(o_orderpriority, 4)) as l4, "
        "max(right(o_orderpriority, 3)) as r3, "
        "max(repeat(o_orderstatus, 3)) as rep, "
        "max(translate(o_orderstatus, 'OFP', 'ofp')) as tr "
        "from ord_e11 group by o_orderpriority"
    )


CH_EVERYDAY11_ORACLE = """
SELECT o_orderpriority AS pri,
       max(last_day(CAST(o_orderdate AS DATE))) AS eom,
       CAST(max(date_part('week', CAST(o_orderdate AS DATE))) AS INT) AS iw,
       CAST(min(date_part('isoyear', CAST(o_orderdate AS DATE))) AS INT)
         AS iy,
       CAST(max(CAST(o_orderdate AS DATE) - DATE '1858-11-17') AS INT)
         AS mjd,
       max(CAST(epoch_ms(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))
           AS BIGINT)) AS ms,
       max(CAST(epoch_ms(CAST(86400000 * (o_orderkey % 1000) AS BIGINT))
           AS DATE)) AS from_ms,
       max(CAST(CAST(o_orderdate AS DATE) + INTERVAL 6 MONTH AS DATE))
         AS plus2q,
       min(CAST(CAST(o_orderdate AS DATE) - INTERVAL 9 MONTH AS DATE))
         AS minus3q,
       max(left(o_orderpriority, 4)) AS l4,
       max(right(o_orderpriority, 3)) AS r3,
       max(repeat(o_orderstatus, 3)) AS rep,
       max(translate(o_orderstatus, 'OFP', 'ofp')) AS tr
FROM orders GROUP BY o_orderpriority
"""


QUERIES["ch_everyday_funcs11"] = Query(
    ch_everyday_funcs11, CH_EVERYDAY11_ORACLE, ("dialect", "functions")
)


def ch_vector_distances(spark, sf_dir):
    """The upstream-CH vector-distance function family (tier 12) over
    array columns — dotProduct, L1/L2/L2Squared/Linf distances, L1/L2/
    Linf norms, cosineDistance, normalizeL2 — each a pure
    zip_with/aggregate composition (whole-stage codegen, no UDF: the
    same JVM-side shape the ANN brute-force path uses).  Vectors build
    from order-key arithmetic so the oracle recomputes every distance
    componentwise with no list functions needed."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_vec")
    pre = (
        "select o_orderstatus as st, "
        "array(cast(o_orderkey % 7 as double), "
        "      cast(o_orderkey % 5 as double), 2.0d) as va, "
        "array(1.0d, cast(o_orderkey % 3 as double), 0.5d) as vb "
        "from ord_vec"
    )
    return eng.sql(
        "select st, "
        "round(sum(dotProduct(va, vb)), 3) as dot_sum, "
        "round(sum(L1Distance(va, vb)), 3) as l1_sum, "
        "round(sum(L2SquaredDistance(va, vb)), 3) as l2sq_sum, "
        "round(sum(L2Distance(va, vb)), 3) as l2_sum, "
        "round(sum(LinfDistance(va, vb)), 3) as linf_sum, "
        "round(sum(L2Norm(va)), 3) as l2n_sum, "
        "round(sum(L1Norm(vb)), 3) as l1n_sum, "
        "round(sum(cosineDistance(va, vb)), 3) as cos_sum, "
        "round(sum(arrayElement(normalizeL2(va), 3) * L2Norm(va)), 3) "
        "  as renorm_sum "
        f"from ({pre}) group by st"
    )


CH_VECTOR_DISTANCES_ORACLE = """
WITH v AS (
  SELECT o_orderstatus AS st,
         CAST(o_orderkey % 7 AS DOUBLE) AS a1,
         CAST(o_orderkey % 5 AS DOUBLE) AS a2, 2.0 AS a3,
         1.0 AS b1, CAST(o_orderkey % 3 AS DOUBLE) AS b2, 0.5 AS b3
  FROM orders
)
SELECT st,
  round(sum(a1*b1 + a2*b2 + a3*b3), 3) AS dot_sum,
  round(sum(abs(a1-b1) + abs(a2-b2) + abs(a3-b3)), 3) AS l1_sum,
  round(sum((a1-b1)^2 + (a2-b2)^2 + (a3-b3)^2), 3) AS l2sq_sum,
  round(sum(sqrt((a1-b1)^2 + (a2-b2)^2 + (a3-b3)^2)), 3) AS l2_sum,
  round(sum(greatest(abs(a1-b1), abs(a2-b2), abs(a3-b3))), 3) AS linf_sum,
  round(sum(sqrt(a1^2 + a2^2 + a3^2)), 3) AS l2n_sum,
  round(sum(abs(b1) + abs(b2) + abs(b3)), 3) AS l1n_sum,
  round(sum(1.0 - (a1*b1 + a2*b2 + a3*b3)
        / (sqrt(a1^2 + a2^2 + a3^2) * sqrt(b1^2 + b2^2 + b3^2))), 3)
    AS cos_sum,
  round(sum(a3), 3) AS renorm_sum
FROM v GROUP BY st
"""


QUERIES["ch_vector_distances"] = Query(
    ch_vector_distances, CH_VECTOR_DISTANCES_ORACLE,
    ("dialect", "functions", "vector")
)


def ch_everyday_funcs13(spark, sf_dir):
    """Everyday upstream-CH tier 13: the five/fifteen-minute time
    buckets (completing the toStartOf* family), arrayJaccardIndex
    (array-set similarity — the scalar cousin of the pipeline's ngram
    Jaccard), and mapFilter (CH map lambda; identical lambda grammar,
    swapped argument order vs Spark's map_filter)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_e13")
    return eng.sql(
        "select event_type as et, "
        "count(distinct toStartOfFiveMinutes(ts)) as b5, "
        "count(distinct toStartOfFifteenMinutes(ts)) as b15, "
        "round(sum(arrayJaccardIndex("
        "  array(event_id % 5, event_id % 5 + 1, 7), "
        "  array(event_id % 5 + 1, 7, 99))), 3) as jac_sum, "
        "sum(mapLength(mapFilter((mk, mv) -> mv > 0, "
        "  map(1, event_id % 3, 2, event_id % 7, 3, 0)))) as pos_vals "
        "from ev_e13 group by event_type"
    )


CH_EVERYDAY13_ORACLE = """
SELECT event_type AS et,
  count(DISTINCT to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP))
        / 300) * 300)) AS b5,
  count(DISTINCT to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP))
        / 900) * 900)) AS b15,
  round(sum(0.5), 3) AS jac_sum,
  CAST(sum(CASE WHEN event_id % 3 > 0 THEN 1 ELSE 0 END
         + CASE WHEN event_id % 7 > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS pos_vals
FROM events GROUP BY event_type
"""


QUERIES["ch_everyday_funcs13"] = Query(
    ch_everyday_funcs13, CH_EVERYDAY13_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs14(spark, sf_dir):
    """Everyday upstream-CH tier 14: the sub-millisecond unix-timestamp
    pairs (to/fromUnixTimestamp64Micro and the Nano pair, truncated to
    Spark's microsecond grain — documented precision difference) and the
    URL-safe base64 variants (base64URLEncode strips padding and swaps
    the +/ alphabet; the decode re-pads).  The decode half is certified
    by an in-query round-trip equality count."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e14")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(toUnixTimestamp64Micro(toDateTime(o_orderdate))) as us, "
        "max(toUnixTimestamp64Nano(toDateTime(o_orderdate))) as ns, "
        "max(toDate(fromUnixTimestamp64Micro(86400000000 * "
        "  (o_orderkey % 500)))) as from_us, "
        "max(base64URLEncode(o_orderpriority)) as b64u, "
        "cast(sum(case when base64URLDecode(base64URLEncode("
        "  o_orderpriority)) = o_orderpriority then 1 else 0 end) "
        "  as bigint) as rt_ok "
        "from ord_e14 group by o_orderstatus"
    )


CH_EVERYDAY14_ORACLE = """
SELECT o_orderstatus AS st,
  max(epoch_us(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))) AS us,
  max(epoch_us(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)) * 1000)
    AS ns,
  max(CAST(make_timestamp(86400000000 * (o_orderkey % 500)) AS DATE))
    AS from_us,
  max(rtrim(replace(replace(to_base64(CAST(o_orderpriority AS BLOB)),
      '+', '-'), '/', '_'), '=')) AS b64u,
  CAST(count(*) AS BIGINT) AS rt_ok
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs14"] = Query(
    ch_everyday_funcs14, CH_EVERYDAY14_ORACLE, ("dialect", "functions")
)


def ch_url_hierarchy(spark, sf_dir):
    """URLHierarchy / URLPathHierarchy (tier 15 — the CH web-analytics
    prefix ladders, path-segment subset documented in the template):
    URLs built from order-key arithmetic so the oracle constructs the
    expected ladders directly; arrays stringify for the driver hash."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e15")
    pre = (
        "select o_orderstatus as st, "
        "concat('https://ex', o_orderkey % 3, '.com/cat', o_orderkey % 4, "
        "'/item', o_orderkey % 7) as url from ord_e15"
    )
    return eng.sql(
        "select st, "
        "max(arrayStringConcat(URLPathHierarchy(url), '|')) as ph, "
        "max(arrayStringConcat(URLHierarchy(url), '|')) as fh, "
        "max(size(URLPathHierarchy('https://x.test/'))) as empty_levels "
        f"from ({pre}) group by st"
    )


CH_URL_HIERARCHY_ORACLE = """
WITH u AS (
  SELECT o_orderstatus AS st,
         'https://ex' || (o_orderkey % 3) || '.com' AS host,
         '/cat' || (o_orderkey % 4) AS seg1,
         '/item' || (o_orderkey % 7) AS seg2
  FROM orders
)
SELECT st,
  max(seg1 || '/' || '|' || seg1 || seg2) AS ph,
  max(host || seg1 || '/' || '|' || host || seg1 || seg2) AS fh,
  0 AS empty_levels
FROM u GROUP BY st
"""


QUERIES["ch_url_hierarchy"] = Query(
    ch_url_hierarchy, CH_URL_HIERARCHY_ORACLE, ("dialect", "functions", "url")
)


def ch_everyday_funcs16(spark, sf_dir):
    """Everyday upstream-CH tier 16: compact timestamp keys
    (toYYYYMMDDhhmmss), the web-analytics rounding ladders
    (roundDuration / roundAge), fixed-scale decimal rendering
    (toDecimalString), character translation (translateUTF8), IPv4 CIDR
    membership (isIPAddressInRange), verbose time deltas
    (formatReadableTimeDelta, days-and-below subset), and the effective
    TLD heuristic (firstSignificantSubdomain).  The oracle recomputes
    every value from first principles on the same rows."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e16")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(toYYYYMMDDhhmmss(toDateTime(o_orderdate))) as ymd, "
        "cast(sum(roundDuration(o_orderkey % 40000)) as bigint) as rdur, "
        "cast(sum(roundAge(o_orderkey % 80)) as bigint) as rage, "
        "max(toDecimalString(o_orderkey, 2)) as tds, "
        "max(translateUTF8(o_orderpriority, '-', '_')) as tr, "
        "cast(sum(case when isIPAddressInRange("
        "  concat('10.', cast(o_orderkey % 256 as string), '.0.1'), "
        "  '10.128.0.0/9') then 1 else 0 end) as bigint) as ipr, "
        "max(formatReadableTimeDelta(o_orderkey % 100000)) as frtd, "
        "max(firstSignificantSubdomain(concat('https://www.shop', "
        "  cast(o_orderkey % 7 as string), '.co.uk/x'))) as fsd "
        "from ord_e16 group by o_orderstatus"
    )


CH_EVERYDAY16_ORACLE = """
WITH base AS (
  SELECT o_orderstatus, o_orderkey AS k, o_orderdate, o_orderpriority,
    o_orderkey % 100000 AS sec
  FROM orders
), frtd AS (
  SELECT *, list_filter([
      CASE WHEN sec // 86400 > 0 THEN (sec // 86400) || ' day' ||
        CASE WHEN sec // 86400 = 1 THEN '' ELSE 's' END END,
      CASE WHEN (sec % 86400) // 3600 > 0 THEN ((sec % 86400) // 3600)
        || ' hour' ||
        CASE WHEN (sec % 86400) // 3600 = 1 THEN '' ELSE 's' END END,
      CASE WHEN (sec % 3600) // 60 > 0 THEN ((sec % 3600) // 60)
        || ' minute' ||
        CASE WHEN (sec % 3600) // 60 = 1 THEN '' ELSE 's' END END,
      CASE WHEN sec % 60 > 0 THEN (sec % 60) || ' second' ||
        CASE WHEN sec % 60 = 1 THEN '' ELSE 's' END END
    ], x -> x IS NOT NULL) AS u
  FROM base
)
SELECT o_orderstatus AS st,
  max(CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m%d%H%M%S')
      AS BIGINT)) AS ymd,
  CAST(sum(CASE WHEN k % 40000 < 1 THEN 0 WHEN k % 40000 < 10 THEN 1
    WHEN k % 40000 < 30 THEN 10 WHEN k % 40000 < 60 THEN 30
    WHEN k % 40000 < 120 THEN 60 WHEN k % 40000 < 180 THEN 120
    WHEN k % 40000 < 240 THEN 180 WHEN k % 40000 < 300 THEN 240
    WHEN k % 40000 < 600 THEN 300 WHEN k % 40000 < 1200 THEN 600
    WHEN k % 40000 < 1800 THEN 1200 WHEN k % 40000 < 3600 THEN 1800
    WHEN k % 40000 < 7200 THEN 3600 WHEN k % 40000 < 18000 THEN 7200
    WHEN k % 40000 < 36000 THEN 18000 ELSE 36000 END) AS BIGINT) AS rdur,
  CAST(sum(CASE WHEN k % 80 < 1 THEN 0 WHEN k % 80 < 18 THEN 17
    WHEN k % 80 < 25 THEN 18 WHEN k % 80 < 35 THEN 25
    WHEN k % 80 < 45 THEN 35 WHEN k % 80 < 55 THEN 45 ELSE 55 END)
    AS BIGINT) AS rage,
  max(CAST(CAST(k AS DECIMAL(38,2)) AS VARCHAR)) AS tds,
  max(replace(o_orderpriority, '-', '_')) AS tr,
  CAST(sum(CASE WHEN k % 256 >= 128 THEN 1 ELSE 0 END) AS BIGINT) AS ipr,
  max((SELECT CASE WHEN len(u) = 0 THEN '0 seconds'
       WHEN len(u) = 1 THEN u[1]
       ELSE array_to_string(u[1:len(u)-1], ', ') || ' and ' || u[-1]
       END)) AS frtd,
  max('shop' || CAST(k % 7 AS VARCHAR)) AS fsd
FROM frtd
GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs16"] = Query(
    ch_everyday_funcs16, CH_EVERYDAY16_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs17(spark, sf_dir):
    """Everyday upstream-CH tier 17: bit-mask introspection
    (bitmaskToList, variadic bitTestAll/Any), unicode tokenization
    (splitByNonAlpha), the year-zero day count (toDaysSinceYearZero,
    MySQL TO_DAYS-compatible: year 0 is a 366-day proleptic leap year,
    CH's DAYS_BETWEEN_YEARS_0_AND_1970 = 719528), and partial sort
    (arrayPartialSort —
    full sort is a conforming implementation of its unspecified-tail
    contract).  The oracle recomputes each from first principles."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e17")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(bitmaskToList(o_orderkey % 64)) as bl, "
        "cast(sum(case when bitTestAll(o_orderkey, 0, 2) then 1 else 0 "
        "  end) as bigint) as bta, "
        "cast(sum(case when bitTestAny(o_orderkey, 1, 4) then 1 else 0 "
        "  end) as bigint) as bany, "
        "max(arrayStringConcat(splitByNonAlpha(o_orderpriority), '|')) "
        "  as sp, "
        "max(toDaysSinceYearZero(toDate(o_orderdate))) as dz, "
        "max(arrayStringConcat(arrayMap(x -> toString(x), "
        "  arrayPartialSort(2, array(o_orderkey % 7, o_orderkey % 5, "
        "  o_orderkey % 3))), ',')) as ps "
        "from ord_e17 group by o_orderstatus"
    )


CH_EVERYDAY17_ORACLE = """
SELECT o_orderstatus AS st,
  max(array_to_string(list_filter([1, 2, 4, 8, 16, 32],
      x -> (o_orderkey % 64) & x != 0), ',')) AS bl,
  CAST(sum(CASE WHEN (o_orderkey & 5) = 5 THEN 1 ELSE 0 END)
    AS BIGINT) AS bta,
  CAST(sum(CASE WHEN (o_orderkey & 18) != 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS bany,
  max(replace(o_orderpriority, '-', '|')) AS sp,
  max(datediff('day', DATE '0001-01-01', CAST(o_orderdate AS DATE)) + 366)
    AS dz,
  max(array_to_string(list_sort([o_orderkey % 7, o_orderkey % 5,
      o_orderkey % 3]), ',')) AS ps
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs17"] = Query(
    ch_everyday_funcs17, CH_EVERYDAY17_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs18(spark, sf_dir):
    """Everyday upstream-CH tier 18: URL hierarchy cut
    (cutToFirstSignificantSubdomain), URL parameter lists, Saturday
    week-end rounding (toLastDayOfWeek mode 0), widthBucket,
    formatReadableDecimalSize, the simpleJSON* canonical aliases,
    LIKE-filtered map lookups (mapContainsKeyLike / mapExtractKeyLike),
    the timeSlots grid, and multiSearchFirstIndex.  The oracle
    recomputes every column from first principles in DuckDB (the JSON
    extraction reduces to the embedded source column, the slot grid to
    its two fixed wall-times, the needle index to a CASE ladder)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e18")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(cutToFirstSignificantSubdomain(concat('https://a.b.shop', "
        "  o_orderkey % 3, '.com.tr/x'))) as c1, "
        "max(arrayStringConcat(extractURLParameters(concat("
        "  'http://e.com/?k=', o_orderkey % 7, '&s=', o_orderstatus)), "
        "  '|')) as up, "
        "max(toLastDayOfWeek(toDate(o_orderdate))) as ld, "
        "cast(sum(widthBucket(o_totalprice, 0.0, 600000.0, 10)) "
        "  as bigint) as wb, "
        "max(formatReadableDecimalSize(o_orderkey * 10 + 1)) as frd, "
        "max(simpleJSONExtractString(concat('{\"p\": \"', "
        "  o_orderpriority, '\"}'), 'p')) as js, "
        "cast(sum(simpleJSONExtractInt(concat('{\"k\": ', "
        "  o_orderkey % 100, '}'), 'k')) as bigint) as ji, "
        "cast(sum(case when mapContainsKeyLike(map(concat('st_', "
        "  o_orderstatus), 1), 'st_O%') then 1 else 0 end) as bigint) "
        "  as mc, "
        "max(arrayStringConcat(arrayMap(x -> toString(x), "
        "  timeSlots(toDateTime(concat(toString(toDate(o_orderdate)), "
        "  ' 12:20:00')), 1200, 900)), '|')) as ts, "
        "cast(sum(multiSearchFirstIndex(o_orderpriority, "
        "  array('URGENT', 'HIGH', 'MEDIUM'))) as bigint) as mi, "
        "cast(sum(element_at(mapExtractKeyLike(map('k1', "
        "  o_orderkey % 97, 'x2', 0), 'k%'), 'k1')) as bigint) as mk "
        "from ord_e18 group by o_orderstatus"
    )


CH_EVERYDAY18_ORACLE = """
SELECT o_orderstatus AS st,
  max('shop' || CAST(o_orderkey % 3 AS VARCHAR) || '.com.tr') AS c1,
  max('k=' || CAST(o_orderkey % 7 AS VARCHAR) || '|s=' || o_orderstatus)
    AS up,
  max(CAST(CAST(o_orderdate AS DATE) + CAST(
      (6 - dayofweek(CAST(o_orderdate AS DATE))) || ' days'
      AS INTERVAL) AS DATE)) AS ld,
  CAST(sum(CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000 THEN 11
                ELSE CAST(FLOOR(o_totalprice / 600000.0 * 10) AS BIGINT)
                     + 1 END) AS BIGINT) AS wb,
  max(CASE
    WHEN (o_orderkey * 10 + 1) < 1000
      THEN printf('%.2f B', CAST(o_orderkey * 10 + 1 AS DOUBLE))
    WHEN (o_orderkey * 10 + 1) < 1000000
      THEN printf('%.2f KB', (o_orderkey * 10 + 1) / 1000.0)
    WHEN (o_orderkey * 10 + 1) < 1000000000
      THEN printf('%.2f MB', (o_orderkey * 10 + 1) / 1000000.0)
    ELSE printf('%.2f GB', (o_orderkey * 10 + 1) / 1000000000.0)
  END) AS frd,
  max(o_orderpriority) AS js,
  CAST(sum(o_orderkey % 100) AS BIGINT) AS ji,
  CAST(sum(CASE WHEN o_orderstatus LIKE 'O%' THEN 1 ELSE 0 END)
    AS BIGINT) AS mc,
  max(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') || ' 12:15:00|'
      || strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
      || ' 12:30:00') AS ts,
  CAST(sum(CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 1
                WHEN o_orderpriority LIKE '%HIGH%' THEN 2
                WHEN o_orderpriority LIKE '%MEDIUM%' THEN 3
                ELSE 0 END) AS BIGINT) AS mi,
  CAST(sum(o_orderkey % 97) AS BIGINT) AS mk
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs18"] = Query(
    ch_everyday_funcs18, CH_EVERYDAY18_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs19(spark, sf_dir):
    """Everyday upstream-CH tier 19: MySQL-format datetime parsing
    (parseDateTime), DateTime64 casts, the JSONExtractBool/Raw/Length
    tail of the JSON family, and map arithmetic
    (mapAdd/mapSubtract/mapUpdate).  The oracle recomputes each from
    first principles (the parse round-trips the embedded date string,
    JSON extraction reduces to the embedded expression, map arithmetic
    to plain integer arithmetic)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e19")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(toString(parseDateTime(concat(toString(toDate(o_orderdate)),"
        "  '+12:30:45'), '%Y-%m-%d+%H:%i:%s'))) as pd, "
        "max(toString(toDateTime64(concat(toString(toDate(o_orderdate)), "
        "  ' 01:02:03'), 3))) as d64, "
        "cast(sum(case when JSONExtractBool(concat('{\"u\": ', "
        "  if(o_orderkey % 2 = 0, 'true', 'false'), '}'), 'u') "
        "  then 1 else 0 end) as bigint) as jb, "
        "max(JSONExtractRaw(concat('{\"a\": {\"k\": ', o_orderkey % 5, "
        "  '}}'), 'a')) as jr, "
        "cast(sum(JSONLength(concat('[', repeat('1,', o_orderkey % 4), "
        "  '9]'))) as bigint) as jl, "
        "cast(sum(arrayElement(mapAdd(map('x', o_orderkey % 10), "
        "  map('x', 7)), 'x')) as bigint) as ma, "
        "cast(sum(arrayElement(mapSubtract(map('x', o_orderkey % 11), "
        "  map('x', 3)), 'x')) as bigint) as ms, "
        "cast(sum(arrayElement(mapUpdate(map('x', 1, 'y', "
        "  o_orderkey % 3), map('y', o_orderkey % 5)), 'y')) as bigint) "
        "  as mu "
        "from ord_e19 group by o_orderstatus"
    )


CH_EVERYDAY19_ORACLE = """
SELECT o_orderstatus AS st,
  max(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') || ' 12:30:45')
    AS pd,
  max(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') || ' 01:02:03')
    AS d64,
  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS jb,
  max('{"k":' || CAST(o_orderkey % 5 AS VARCHAR) || '}') AS jr,
  CAST(sum(o_orderkey % 4 + 1) AS BIGINT) AS jl,
  CAST(sum(o_orderkey % 10 + 7) AS BIGINT) AS ma,
  CAST(sum(o_orderkey % 11 - 3) AS BIGINT) AS ms,
  CAST(sum(o_orderkey % 5) AS BIGINT) AS mu
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs19"] = Query(
    ch_everyday_funcs19, CH_EVERYDAY19_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs20(spark, sf_dir):
    """Everyday upstream-CH tier 20: pure-SQL geohash encode + decode
    (closed-form bit extraction, no interval-halving loop; golden tests
    pin the CH docs examples 'ezs42' both directions), IPv4
    canonicalization (toIPv4), central angles (greatCircleAngle), and
    exact distinct over unrolled group arrays (uniqArray).  The oracle
    regenerates the geohash from the IDENTICAL closed form in DuckDB
    (same IEEE expression order, so the doubles agree bit-for-bit), the
    decode from the midpoint formula, and uniqArray from a lateral
    UNNEST."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e20")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(geohashEncode((o_orderkey % 360) - 180 + 0.5d, "
        "  (o_orderkey % 180) - 90 + 0.5d, 6)) as gh, "
        "max(round(tupleElement(geohashDecode(geohashEncode("
        "  (o_orderkey % 360) - 180 + 0.5d, "
        "  (o_orderkey % 180) - 90 + 0.5d, 6)), 1), 6)) as dlon, "
        "max(toIPv4(concat('010.', o_orderkey % 256, '.000.1'))) as ip, "
        "max(round(greatCircleAngle(0.0d, 0.0d, "
        "  cast(o_orderkey % 90 as double), 10.0d), 6)) as gca, "
        "uniqArray(array(o_orderkey % 7, o_orderkey % 11)) as ua "
        "from ord_e20 group by o_orderstatus"
    )


def _duck_geohash_expr(prec: int, lonn: str, latn: str) -> str:
    """DuckDB text of the same closed-form geohash used by the Spark
    template (identical IEEE expression order per bit)."""
    chars = []
    for p in range(prec):
        terms = []
        for b in range(5):
            g = 5 * p + b
            x = lonn if g % 2 == 0 else latn
            terms.append(
                f"(CAST(floor({x} * {2.0 ** (g // 2 + 1)!r}) AS BIGINT) "
                f"% 2) * {1 << (4 - b)}"
            )
        val = " + ".join(terms)
        chars.append(
            "substr('0123456789bcdefghjkmnpqrstuvwxyz', "
            f"1 + CAST({val} AS INT), 1)"
        )
    return " || ".join(chars)


_E20_LONN = "(((o_orderkey % 360) - 180 + 0.5) + 180.0) / 360.0"
_E20_LATN = "(((o_orderkey % 180) - 90 + 0.5) + 90.0) / 180.0"

CH_EVERYDAY20_ORACLE = f"""
WITH main AS (
  SELECT o_orderstatus AS st,
    max({_duck_geohash_expr(6, f'({_E20_LONN})', f'({_E20_LATN})')}) AS gh,
    max(round((floor(({_E20_LONN}) * 32768.0) + 0.5) / 32768.0
        * 360.0 - 180.0, 6)) AS dlon,
    max('10.' || CAST(o_orderkey % 256 AS VARCHAR) || '.0.1') AS ip,
    max(round(degrees(2 * asin(sqrt(
        power(sin(radians(10.0 - 0.0) / 2), 2) +
        cos(radians(0.0)) * cos(radians(10.0)) *
        power(sin(radians(CAST(o_orderkey % 90 AS DOUBLE) - 0.0) / 2),
              2)))), 6)) AS gca
  FROM orders GROUP BY o_orderstatus
), ua AS (
  SELECT st, CAST(count(DISTINCT v) AS BIGINT) AS ua FROM (
    SELECT o_orderstatus AS st, o_orderkey % 7 AS v FROM orders
    UNION ALL
    SELECT o_orderstatus, o_orderkey % 11 FROM orders
  ) GROUP BY st
)
SELECT main.st AS st, gh, dlon, ip, gca, ua
FROM main JOIN ua ON main.st = ua.st
"""


QUERIES["ch_everyday_funcs20"] = Query(
    ch_everyday_funcs20, CH_EVERYDAY20_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs21(spark, sf_dir):
    """Everyday upstream-CH tier 21: compact-integer date forms
    (YYYYMMDDToDate / YYYYMMDDhhmmssToDateTime), Snowflake-ID time
    extraction both directions (Twitter epoch 1288834974657, ms in
    bits 22+), sub-second truncation (toStartOfMillisecond),
    first-match group capture (extractGroups), and quarter intervals.
    The oracle recomputes each from first principles: strptime of the
    same padded digits, the same shift/epoch arithmetic via epoch_ms,
    string reassembly for the truncated fraction and captures, and
    month-clamped +3 months for the quarter."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e21")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(toString(YYYYMMDDToDate(20230100 + o_orderkey % 28 + 1))) "
        "  as d, "
        "max(toString(YYYYMMDDhhmmssToDateTime(20230911131400 "
        "  + o_orderkey % 60))) as dt, "
        "max(toString(snowflakeToDateTime(dateTimeToSnowflake("
        "  toDateTime('2021-08-15 18:57:56')) "
        "  + (o_orderkey % 60) * 1000 * 4194304))) as sf, "
        "max(dateTimeToSnowflake(toDateTime('2021-08-15 18:57:56')) "
        "  + (o_orderkey % 60) * 1000 * 4194304) as sfi, "
        "max(toString(toStartOfMillisecond(toDateTime64(concat("
        "  toString(toDate(o_orderdate)), ' 01:02:03.123456'), 6)))) "
        "  as ms, "
        "max(arrayStringConcat(extractGroups(concat('k=', "
        "  o_orderkey % 100), '([a-z])=([0-9]+)'), '|')) as eg, "
        "max(toString(toDate(o_orderdate) + toIntervalQuarter(1))) as q "
        "from ord_e21 group by o_orderstatus"
    )


CH_EVERYDAY21_ORACLE = """
SELECT o_orderstatus AS st,
  max(strftime(strptime(CAST(20230100 + o_orderkey % 28 + 1 AS VARCHAR),
      '%Y%m%d'), '%Y-%m-%d')) AS d,
  max(strftime(strptime(CAST(20230911131400 + o_orderkey % 60
      AS VARCHAR), '%Y%m%d%H%M%S'), '%Y-%m-%d %H:%M:%S')) AS dt,
  max(strftime(TIMESTAMP '2021-08-15 18:57:56'
      + CAST((o_orderkey % 60) || ' seconds' AS INTERVAL),
      '%Y-%m-%d %H:%M:%S')) AS sf,
  max((CAST(epoch_ms(TIMESTAMP '2021-08-15 18:57:56') AS BIGINT)
       - 1288834974657) * 4194304
      + (o_orderkey % 60) * 1000 * 4194304) AS sfi,
  max(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
      || ' 01:02:03.123') AS ms,
  max('k|' || CAST(o_orderkey % 100 AS VARCHAR)) AS eg,
  max(strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH
      AS DATE), '%Y-%m-%d')) AS q
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs21"] = Query(
    ch_everyday_funcs21, CH_EVERYDAY21_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs22(spark, sf_dir):
    """Everyday upstream-CH tier 22: relative date numbers
    (toRelativeYearNum/MonthNum on the year*12+month grid),
    fromDaysSinceYearZero (inverse of tier 17's +366 day count),
    timeDiff, MAC address codecs both directions, multi-needle
    positions, per-match group capture (extractAllGroups, both
    orientations), JSON array length, UTF8 pads, substringIndex, map
    sorting, dense array enumeration, and clamp.  The oracle recomputes
    every formula from first principles: the same year/month grid, day
    offsets from DATE '0001-01-01' (-366), hex arithmetic via printf,
    1-based strpos positions, and string reassembly of the captures."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e22")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(toRelativeYearNum(toDate(o_orderdate))) as ry, "
        "max(toRelativeMonthNum(toDate(o_orderdate))) as rm, "
        "max(toString(fromDaysSinceYearZero(719528 + o_orderkey % 1000)))"
        "  as fd, "
        "max(timeDiff(toDateTime(concat(toString(toDate(o_orderdate)), "
        "  ' 01:00:03')), toDateTime(concat(toString(toDate(o_orderdate)),"
        "  ' 01:', leftPadUTF8(toString(o_orderkey % 60), 2, '0'), "
        "  ':03')))) as td, "
        "max(MACStringToNum(MACNumToString(187723572702720 "
        "  + o_orderkey % 256))) as mn, "
        "max(MACNumToString(187723572702720 + o_orderkey % 256)) as ms, "
        "max(arrayStringConcat(arrayMap(__p -> toString(__p), "
        "  multiSearchAllPositions(o_orderpriority, "
        "  ['URGENT', '-', 'zz'])), ',')) as mp, "
        "max(arrayStringConcat(arrayMap(__g -> arrayStringConcat(__g, "
        "  ':'), extractAllGroups(concat('k=', toString(o_orderkey % "
        "  100), ' v=', toString(o_orderkey % 7)), "
        "  '([a-z]+)=([0-9]+)')), '|')) as eag, "
        "max(arrayStringConcat(arrayMap(__g -> arrayStringConcat(__g, "
        "  ','), extractAllGroupsHorizontal(concat('k=', "
        "  toString(o_orderkey % 100), ' v=', toString(o_orderkey % 7)), "
        "  '([a-z]+)=([0-9]+)')), '|')) as eagh, "
        "max(JSONArrayLength(concat('[', repeat('1,', o_orderkey % 5), "
        "  '1]'))) as jal, "
        "max(rightPadUTF8(toString(o_orderkey % 100), 5, '.')) as rp, "
        "max(substringIndexUTF8(o_orderpriority, '-', 1)) as si, "
        "max(arrayStringConcat(map_keys(mapSort(map(toString(o_orderkey "
        "  % 7), 1, 'z', 2))), ',')) as mks, "
        "max(arrayStringConcat(map_keys(mapReverseSort(map(toString("
        "  o_orderkey % 7), 1, 'z', 2))), ',')) as mkr, "
        "max(arrayStringConcat(arrayMap(__x -> toString(__x), "
        "  arrayEnumerateDense([o_orderkey % 7, 5, o_orderkey % 7])), "
        "  ',')) as aed, "
        "max(clamp(o_orderkey % 20, 5, 15)) as cl "
        "from ord_e22 group by o_orderstatus"
    )


CH_EVERYDAY22_ORACLE = """
SELECT o_orderstatus AS st,
  max(year(CAST(o_orderdate AS DATE))) AS ry,
  max(year(CAST(o_orderdate AS DATE)) * 12
      + month(CAST(o_orderdate AS DATE))) AS rm,
  max(strftime(DATE '0001-01-01'
      + CAST(719528 + o_orderkey % 1000 - 366 AS INTEGER),
      '%Y-%m-%d')) AS fd,
  max((o_orderkey % 60) * 60 - 0) AS td,
  max(187723572702720 + o_orderkey % 256) AS mn,
  max('aa:bb:cc:dd:ee:' || printf('%02x', o_orderkey % 256)) AS ms,
  max(CAST(strpos(o_orderpriority, 'URGENT') AS VARCHAR) || ','
      || CAST(strpos(o_orderpriority, '-') AS VARCHAR) || ','
      || CAST(strpos(o_orderpriority, 'zz') AS VARCHAR)) AS mp,
  max('k:' || CAST(o_orderkey % 100 AS VARCHAR)
      || '|v:' || CAST(o_orderkey % 7 AS VARCHAR)) AS eag,
  max('k,v|' || CAST(o_orderkey % 100 AS VARCHAR) || ','
      || CAST(o_orderkey % 7 AS VARCHAR)) AS eagh,
  max(o_orderkey % 5 + 1) AS jal,
  max(rpad(CAST(o_orderkey % 100 AS VARCHAR), 5, '.')) AS rp,
  max(split_part(o_orderpriority, '-', 1)) AS si,
  max(CAST(o_orderkey % 7 AS VARCHAR) || ',z') AS mks,
  max('z,' || CAST(o_orderkey % 7 AS VARCHAR)) AS mkr,
  max(CASE WHEN o_orderkey % 7 = 5 THEN '1,1,1' ELSE '1,2,1' END) AS aed,
  max(greatest(5, least(15, o_orderkey % 20))) AS cl
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs22"] = Query(
    ch_everyday_funcs22, CH_EVERYDAY22_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs23(spark, sf_dir):
    """Everyday upstream-CH tier 23: last-match array search
    (arrayLast/arrayLastIndex), ROC AUC over score/label arrays
    (arrayAUC, rank-sum with tie half-credit), IPv6 literal validation,
    top-level JSON classification (JSONType), map quantifiers
    (mapAll/mapExists), and session-timezone introspection.  The oracle
    recomputes each from first principles: closed-form last-index
    arithmetic on the generated arrays, the same AUC counting formula
    in plain SQL, parity of the validation verdicts on fixed literals,
    and the typed classification by leading character."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e23")
    return eng.sql(
        "select o_orderstatus as st, "
        # arr = [k%5, k%7, k%5+10]; last element < 10 is index 2
        "max(arrayLast(__x -> __x < 10, [o_orderkey % 5, o_orderkey % 7, "
        "  o_orderkey % 5 + 10])) as al, "
        "max(arrayLastIndex(__x -> __x < 10, [o_orderkey % 5, "
        "  o_orderkey % 7, o_orderkey % 5 + 10])) as ali, "
        "max(arrayLastIndex(__x -> __x > 99, [o_orderkey % 5, "
        "  o_orderkey % 7])) as ali0, "
        # fixed 4-point ROC per row, scores shifted by the key so the
        # aggregate sees many distinct-but-equal-AUC instances
        "max(arrayAUC([0.1 + o_orderkey % 3, 0.4 + o_orderkey % 3, "
        "  0.35 + o_orderkey % 3, 0.8 + o_orderkey % 3], "
        "  [0, 0, 1, 1])) as auc, "
        "max(isIPv6String(concat('2001:db8::', "
        "  toString(o_orderkey % 9)))) as i6, "
        "max(isIPv6String(concat('not-an-ip-', "
        "  toString(o_orderkey % 9)))) as i6n, "
        "max(JSONType(concat('[', toString(o_orderkey % 100), ']'))) "
        "  as jt, "
        "max(JSONType(toString(o_orderkey % 100))) as jti, "
        "max(mapAll((__k, __v) -> __v >= 0, map('a', o_orderkey % 7, "
        "  'b', 1))) as ma, "
        "max(mapExists((__k, __v) -> __v > 5, map('a', o_orderkey % 7, "
        "  'b', 1))) as me, "
        "max(timezoneOf(toDateTime(toDate(o_orderdate)))) as tz, "
        "max(timeZoneOffset(toDateTime(toDate(o_orderdate)))) as tzo "
        "from ord_e23 group by o_orderstatus"
    )


CH_EVERYDAY23_ORACLE = """
SELECT o_orderstatus AS st,
  max(o_orderkey % 7) AS al,
  max(2) AS ali,
  max(0) AS ali0,
  max(0.75) AS auc,
  max(1) AS i6,
  max(0) AS i6n,
  max('Array') AS jt,
  max('Int64') AS jti,
  max(o_orderkey % 7 >= 0) AS ma,
  max(o_orderkey % 7 > 5) AS me,
  max('UTC') AS tz,
  max(0) AS tzo
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs23"] = Query(
    ch_everyday_funcs23, CH_EVERYDAY23_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs24(spark, sf_dir):
    """Everyday upstream-CH tier 24: 4-gram text similarity
    (ngramDistance/ngramSearch, multiset Sørensen–Dice), normalized
    query hashing (literal-insensitive), Monday-rollover relative week
    numbers, flat-JSON pair extraction, identity, and elementwise tuple
    arithmetic on the array tuple model.  The oracle restates each from
    first principles: closed-form gram overlap on the constructed
    strings, hash-equality booleans, the (days + 8 - isodow) / 7 week
    grid, and plain arithmetic for the tuple sums."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e24")
    return eng.sql(
        "select o_orderstatus as st, "
        # grams('abcdX') vs 'abcd0': common = 1 + [X = 0] of 2 per side
        "max(ngramDistance(concat('abcd', toString(o_orderkey % 10)), "
        "  'abcd0')) as nd, "
        "min(ngramDistanceCaseInsensitive(concat('ABCD', "
        "  toString(o_orderkey % 10)), concat('abcd', "
        "  toString(o_orderkey % 10)))) as ndi, "
        "max(ngramSearch(concat('abcd', toString(o_orderkey % 10)), "
        "  'abcd')) as ns, "
        "max(normalizedQueryHash(concat('select ', "
        "  toString(o_orderkey % 100), ' from t')) "
        "  = normalizedQueryHash('select 999 from t')) as nq, "
        "max(toRelativeWeekNum(toDate(o_orderdate))) as rw, "
        "max(arrayStringConcat(arrayMap(__p -> concat(__p.key, '=', "
        "  toString(__p.value)), JSONExtractKeysAndValues(concat("
        "  '{\"k\": ', toString(o_orderkey % 50), '}'), 'Int64')), "
        "  ',')) as jkv, "
        "max(identity(o_orderkey % 97)) as idn, "
        "max(arraySum(tuplePlus([o_orderkey % 5, 1], "
        "  [1, o_orderkey % 3]))) as tp, "
        "max(arraySum(tupleMultiply([o_orderkey % 5, 2], "
        "  [3, o_orderkey % 3]))) as tx "
        "from ord_e24 group by o_orderstatus"
    )


CH_EVERYDAY24_ORACLE = """
SELECT o_orderstatus AS st,
  max(CASE WHEN o_orderkey % 10 = 0 THEN 0.0 ELSE 0.5 END) AS nd,
  min(0.0) AS ndi,
  max(1.0) AS ns,
  max(TRUE) AS nq,
  max(CAST(floor((CAST(o_orderdate AS DATE) - DATE '1970-01-01'
      + 8 - isodow(CAST(o_orderdate AS DATE))) / 7) AS INTEGER)) AS rw,
  max('k=' || CAST(o_orderkey % 50 AS VARCHAR)) AS jkv,
  max(o_orderkey % 97) AS idn,
  max(CAST(o_orderkey % 5 + 1 + 1 + o_orderkey % 3 AS DOUBLE)) AS tp,
  max(CAST(3 * (o_orderkey % 5) + 2 * (o_orderkey % 3) AS DOUBLE)) AS tx
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs24"] = Query(
    ch_everyday_funcs24, CH_EVERYDAY24_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs25(spark, sf_dir):
    """Everyday upstream-CH tier 25 (aggregate-family gaps): sample
    skewness/kurtosis (central moments over n, sample variance over
    n-1), interval-overlap sweep (maxIntersections), sorted / exact
    weighted / deterministic quantile variants, theta-sketch distinct,
    plain topK.  The oracle recomputes every formula from first
    principles: raw-moment skew/kurt over var_samp, a fully-overlapping
    interval construction whose peak equals the row count, sorted list
    slices, the cumulative-weight crossing by conditional counts, and
    frequency-certain topK inputs."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e25")
    return eng.sql(
        "select o_orderstatus as st, "
        "skewSamp(o_totalprice) as ss, "
        "kurtSamp(o_totalprice) as ks, "
        "uniqThetaSketch(o_orderpriority) as uts, "
        # [0,2) and [1,3) intervals all overlap during [1,2): the peak
        # equals the total interval count = rows in the group
        "maxIntersections(least(o_orderkey % 3, 1), "
        "  least(o_orderkey % 3, 1) + 2) as mi, "
        "arrayStringConcat(arrayMap(__v -> toString(__v), "
        "  groupArraySorted(3)(o_orderkey % 100)), ',') as gas, "
        "quantileDeterministic(0.5, 42)(o_orderkey % 100) as qd, "
        "quantileExactWeighted(0.5)(o_orderkey % 3, 1) as qew, "
        "arrayStringConcat(topK(case when o_orderkey % 7 = 0 then 'a' "
        "  else 'b' end), ',') as tk "
        "from ord_e25 group by o_orderstatus"
    )


CH_EVERYDAY25_ORACLE = """
SELECT o_orderstatus AS st,
  (avg(o_totalprice * o_totalprice * o_totalprice)
   - 3 * avg(o_totalprice) * avg(o_totalprice * o_totalprice)
   + 2 * avg(o_totalprice) ^ 3) / var_samp(o_totalprice) ^ 1.5 AS ss,
  (avg(o_totalprice ^ 4)
   - 4 * avg(o_totalprice) * avg(o_totalprice ^ 3)
   + 6 * avg(o_totalprice) ^ 2 * avg(o_totalprice * o_totalprice)
   - 3 * avg(o_totalprice) ^ 4) / var_samp(o_totalprice) ^ 2 AS ks,
  count(DISTINCT o_orderpriority) AS uts,
  CAST(count(*) AS INTEGER) AS mi,
  array_to_string(list_slice(list_sort(list(o_orderkey % 100)), 1, 3),
                  ',') AS gas,
  quantile_cont(o_orderkey % 100, 0.5) AS qd,
  CAST(CASE
    WHEN 2 * sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
         >= count(*) THEN 0
    WHEN 2 * sum(CASE WHEN o_orderkey % 3 <= 1 THEN 1 ELSE 0 END)
         >= count(*) THEN 1
    ELSE 2 END AS DOUBLE) AS qew,
  'b,a' AS tk
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs25"] = Query(
    ch_everyday_funcs25, CH_EVERYDAY25_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs26(spark, sf_dir):
    """Everyday upstream-CH tier 26: decimal digit counts, bitmask
    explosion both renderings (powers-of-two values and set-bit
    positions), morton 2-D deinterleave (roundtrip through the tier-17
    encoder), zero-byte string truncation, strict 2-arg casts
    (accurateCast / accurateCastOrNull), column type introspection, and
    throwIf's pass branch.  The oracle recomputes each from first
    principles: digit length of the absolute value, DuckDB list
    comprehension over the same bit tests, the (x, y) identity for the
    morton roundtrip, chr(0) splits, and TRY_CAST parity."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e26")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(countDigits(o_orderkey)) as cd, "
        "max(countDigits(-(o_orderkey % 1000))) as cdn, "
        "max(arrayStringConcat(arrayMap(__v -> toString(__v), "
        "  bitmaskToArray(o_orderkey % 64)), ',')) as bma, "
        "max(arrayStringConcat(arrayMap(__v -> toString(__v), "
        "  bitPositionsToArray(o_orderkey % 64)), ',')) as bpa, "
        "max(arrayStringConcat(arrayMap(__v -> toString(__v), "
        "  mortonDecode(2, mortonEncode(o_orderkey % 100, "
        "  o_orderkey % 50))), ',')) as md, "
        "max(toStringCutToZero(concat(toString(o_orderkey % 100), "
        "  char(0), 'tail'))) as scz, "
        "max(accurateCast(toString(o_orderkey % 1000), 'Int64')) as ac, "
        "max(coalesce(accurateCastOrNull(concat('x', "
        "  toString(o_orderkey)), 'Int64'), -1)) as acn, "
        "max(toColumnTypeName(o_orderkey % 5)) as tct, "
        "max(throwIf(o_orderkey < 0, 'impossible')) as ti "
        "from ord_e26 group by o_orderstatus"
    )


CH_EVERYDAY26_ORACLE = """
SELECT o_orderstatus AS st,
  max(length(CAST(o_orderkey AS VARCHAR))) AS cd,
  max(length(CAST(o_orderkey % 1000 AS VARCHAR))) AS cdn,
  max(array_to_string(list_transform(list_filter(range(0, 63),
      __i -> ((o_orderkey % 64) >> __i) & 1 = 1),
      __i -> CAST(1::BIGINT << __i AS VARCHAR)), ',')) AS bma,
  max(array_to_string(list_filter(range(0, 63),
      __i -> ((o_orderkey % 64) >> __i) & 1 = 1), ',')) AS bpa,
  max(CAST(o_orderkey % 100 AS VARCHAR) || ','
      || CAST(o_orderkey % 50 AS VARCHAR)) AS md,
  max(CAST(o_orderkey % 100 AS VARCHAR)) AS scz,
  max(o_orderkey % 1000) AS ac,
  max(-1) AS acn,
  max('bigint') AS tct,
  max(0) AS ti
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs26"] = Query(
    ch_everyday_funcs26, CH_EVERYDAY26_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs27(spark, sf_dir):
    """Everyday upstream-CH tier 27: date construction (both makeDate
    arities, makeDateTime), snowflake-ID codec roundtrip, subsequence
    tests (both casings), time-delta parsing, jump consistent hashing,
    leftmost multi-needle position, case-insensitive substring counts,
    byte hamming distance, first-line / basename extraction.  The oracle
    re-derives each from first principles: calendar arithmetic, the
    ordered-chars regex for subsequence, unit algebra for the time
    delta, per-byte substring comparison (ASCII columns, so char==byte),
    and the jump-hash goldens computed from the published algorithm
    (arXiv:1406.2294) for the 8 residues."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e27")
    return eng.sql(
        "select o_orderstatus as st, "
        "max(toString(makeDate(1995 + o_orderkey % 7, "
        "  1 + o_orderkey % 12, 1 + o_orderkey % 28))) as md3, "
        "max(toString(makeDate(2000 + o_orderkey % 20, "
        "  1 + o_orderkey % 365))) as md2, "
        "max(toString(makeDateTime(2020, 1 + o_orderkey % 12, "
        "  1 + o_orderkey % 28, o_orderkey % 24, o_orderkey % 60, "
        "  o_orderkey % 60))) as mdt, "
        # epoch 0: the table's dates predate the default Twitter epoch,
        # and a negative ms offset would not survive the bit packing
        "max(toString(snowflakeIDToDateTime(dateTimeToSnowflakeID("
        "  toDateTime(o_orderdate), 0), 0))) as sfrt, "
        "sum(cast(hasSubsequence(o_orderpriority, 'URG') as bigint)) as hs, "
        "sum(cast(hasSubsequenceCaseInsensitive(o_orderpriority, 'low') "
        "  as bigint)) as hsc, "
        "round(sum(parseTimeDelta(concat(toString(o_orderkey % 5), "
        "  ' min ', toString(o_orderkey % 60), ' sec'))), 4) as ptd, "
        "sum(cast(toBool(o_orderkey % 2) as bigint)) as tb, "
        "sum(jumpConsistentHash(o_orderkey % 8, 16)) as jch, "
        "max(multiSearchFirstPosition(o_orderpriority, "
        "  array('URGENT', 'MEDIUM', 'LOW'))) as msfp, "
        "sum(cast(countSubstringsCaseInsensitive(o_orderpriority, 'E') "
        "  as bigint)) as cci, "
        "sum(cast(byteHammingDistance(o_orderpriority, o_orderstatus) "
        "  as bigint)) as bhd, "
        "max(firstLine(concat(o_orderpriority, char(10), "
        "  o_orderstatus))) as fl, "
        "max(basename(concat('/spool/staging/', o_orderpriority))) as bn "
        "from ord_e27 group by o_orderstatus"
    )


CH_EVERYDAY27_ORACLE = """
SELECT o_orderstatus AS st,
  max(CAST(make_date(CAST(1995 + o_orderkey % 7 AS INTEGER),
      CAST(1 + o_orderkey % 12 AS INTEGER),
      CAST(1 + o_orderkey % 28 AS INTEGER)) AS VARCHAR)) AS md3,
  max(CAST(make_date(CAST(2000 + o_orderkey % 20 AS INTEGER), 1, 1)
      + CAST(o_orderkey % 365 AS INTEGER) AS VARCHAR)) AS md2,
  max(CAST(make_timestamp(CAST(2020 AS BIGINT),
      CAST(1 + o_orderkey % 12 AS BIGINT),
      CAST(1 + o_orderkey % 28 AS BIGINT),
      CAST(o_orderkey % 24 AS BIGINT), CAST(o_orderkey % 60 AS BIGINT),
      CAST(o_orderkey % 60 AS DOUBLE)) AS VARCHAR)) AS mdt,
  -- the snowflake codec roundtrip is exact at millisecond precision,
  -- so it reproduces the date's midnight timestamp
  max(CAST(CAST(o_orderdate AS TIMESTAMP) AS VARCHAR)) AS sfrt,
  CAST(sum(CASE WHEN regexp_matches(o_orderpriority, 'U.*R.*G')
      THEN 1 ELSE 0 END) AS BIGINT) AS hs,
  CAST(sum(CASE WHEN regexp_matches(lower(o_orderpriority), 'l.*o.*w')
      THEN 1 ELSE 0 END) AS BIGINT) AS hsc,
  round(sum((o_orderkey % 5) * 60.0 + (o_orderkey % 60)), 4) AS ptd,
  CAST(sum(o_orderkey % 2) AS BIGINT) AS tb,
  -- jump-hash goldens for residues 0..7 at 16 buckets, computed from
  -- the published algorithm (arXiv:1406.2294): 0,6,15,8,12,10,9,13
  CAST(sum(CASE o_orderkey % 8 WHEN 0 THEN 0 WHEN 1 THEN 6 WHEN 2 THEN 15
      WHEN 3 THEN 8 WHEN 4 THEN 12 WHEN 5 THEN 10 WHEN 6 THEN 9
      ELSE 13 END) AS BIGINT) AS jch,
  max(coalesce(least(nullif(strpos(o_orderpriority, 'URGENT'), 0),
      nullif(strpos(o_orderpriority, 'MEDIUM'), 0),
      nullif(strpos(o_orderpriority, 'LOW'), 0)), 0)) AS msfp,
  CAST(sum(length(o_orderpriority)
      - length(replace(lower(o_orderpriority), 'e', ''))) AS BIGINT)
      AS cci,
  -- per-byte comparison over the common prefix + length delta (both
  -- columns are ASCII, so character positions ARE byte positions)
  CAST(sum(len(list_filter(range(1, 1 + least(length(o_orderpriority),
      length(o_orderstatus))), __i -> o_orderpriority[__i:__i]
      != o_orderstatus[__i:__i]))
      + abs(length(o_orderpriority) - length(o_orderstatus)) )
      AS BIGINT) AS bhd,
  max(o_orderpriority) AS fl,
  max(o_orderpriority) AS bn
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs27"] = Query(
    ch_everyday_funcs27, CH_EVERYDAY27_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs28(spark, sf_dir):
    """Everyday upstream-CH tier 28: error functions, Jaro /
    Jaro-Winkler string similarity, the two-sample proportion z-test
    (both pooled and unpooled), A/B-test sample sizing, and sparkbar
    rendering.  The oracle re-derives everything independently: DuckDB's
    NATIVE jaro_similarity / jaro_winkler_similarity check the Jaro
    aggregate char-for-char; the z statistics are plain algebra over
    re-derived counts; the p-value re-states the published Numerical
    Recipes erfc polynomial in DuckDB SQL; sparkbar is rebuilt from a
    list-comprehension bucketization; the two constant-folded sample
    sizes are goldens from the published formulas (cross-checked against
    Python's statistics.NormalDist in tests)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e28")
    zargs = (
        "sum(case when o_orderkey % 7 = 0 then 1 else 0 end), "
        "sum(case when o_custkey % 5 = 0 then 1 else 0 end), "
        "count(*), count(*), 0.95"
    )
    return eng.sql(
        "select o_orderstatus as st, "
        "round(avg(jaroSimilarity(o_orderpriority, 'MEDIUM-HIGH')), 6) "
        "  as js, "
        "round(avg(jaroWinklerSimilarity(o_orderpriority, "
        "  '1-URGENTLY')), 6) as jw, "
        # double literals (3.0D): a bare 3.0 is DECIMAL in Spark and the
        # scale-6 decimal division would shift the erf argument by ~3e-7
        "round(sum(erfc((o_orderkey % 9) / 4.0D - 1.0D)), 6) as ec, "
        "round(sum(erf((o_orderkey % 7) / 3.0D)), 6) as ef, "
        f"round((proportionsZTest({zargs}, 'unpooled'))._1, 6) as zu, "
        f"round((proportionsZTest({zargs}, 'unpooled'))._2, 6) as pu, "
        f"round((proportionsZTest({zargs}, 'pooled'))._1, 6) as zp, "
        "round((minSampleSizeConversion(0.25, 0.03, 0.80, 0.05))._1, 4) "
        "  as mssc, "
        "round((minSampleSizeContinous(112.5, 21.1, 0.03, 0.80, "
        "  0.05))._1, 4) as msst, "
        "sparkbar(8)(o_orderkey % 32, o_totalprice) as sb "
        "from ord_e28 group by o_orderstatus"
    )


def _duck_erfc(x: str) -> str:
    """The Numerical Recipes erfc polynomial re-stated in DuckDB SQL
    (list_transform binds t = 1/(1+|x|/2) like the Spark template binds
    it through transform)."""
    poly = (
        "(-1.26551223 + __u * (1.00002368 + __u * (0.37409196 + __u * "
        "(0.09678418 + __u * (-0.18628806 + __u * (0.27886807 + __u * "
        "(-1.13520398 + __u * (1.48851587 + __u * (-0.82215223 + __u * "
        "0.17087277)))))))))"
    )
    core = (
        f"list_transform([1.0 / (1.0 + abs({x}) / 2.0)], __u -> "
        f"__u * exp(-({x}) * ({x}) + {poly}))[1]"
    )
    return f"CASE WHEN ({x}) >= 0 THEN {core} ELSE 2.0 - {core} END"


def _build_ch28_oracle() -> str:
    p1 = "(sx / tx)"
    p2 = "(sy / ty)"
    se_u = f"sqrt({p1} * (1 - {p1}) / tx + {p2} * (1 - {p2}) / ty)"
    se_p = ("sqrt(((sx + sy) / (tx + ty)) * (1 - (sx + sy) / (tx + ty)) "
            "* (1 / tx + 1 / ty))")
    zu = f"(({p1} - {p2}) / {se_u})"
    zp = f"(({p1} - {p2}) / {se_p})"
    pu = _duck_erfc(f"abs({zu}) / sqrt(2.0)")
    bidx = ("least(CAST(floor((struct_extract(__p, 'x') - lo) / "
            "nullif(hi - lo, 0) * 8) AS INTEGER), 7)")
    sums = (
        "list_transform(range(0, 8), __b -> coalesce(list_sum("
        "list_transform(list_filter(ps, __p -> "
        f"coalesce({bidx}, 0) = __b), __p -> "
        "struct_extract(__p, 'y'))), 0.0))"
    )
    glyph = (
        "CASE WHEN __v <= 0 THEN ' ' ELSE substring('▁▂▃▄▅▆▇█', "
        "greatest(least(CAST(ceil(__v / list_aggregate(__ss, 'max') * 8) "
        "AS INTEGER), 8), 1), 1) END"
    )
    sb = (
        f"list_transform([{sums}], __ss -> array_to_string("
        f"list_transform(__ss, __v -> {glyph}), ''))[1]"
    )
    return f"""
SELECT st, js, jw, ec, ef,
  round({zu}, 6) AS zu,
  round({pu}, 6) AS pu,
  round({zp}, 6) AS zp,
  -- constant-folded sample sizes: goldens from the published formulas
  -- n = (z_{{1-a/2}}+z_power)^2 (p1 q1 + p2 q2)/mde^2 and
  -- n = 2 (z_{{1-a/2}}+z_power)^2 sigma^2/(mde*baseline)^2
  3393.3323 AS mssc, 613.5572 AS msst,
  {sb} AS sb
FROM (
  SELECT o_orderstatus AS st,
    round(avg(jaro_similarity(o_orderpriority, 'MEDIUM-HIGH')), 6) AS js,
    round(avg(jaro_winkler_similarity(o_orderpriority, '1-URGENTLY')), 6)
      AS jw,
    round(sum({_duck_erfc("(o_orderkey % 9) / 4.0 - 1.0")}), 6) AS ec,
    round(sum(1.0 - {_duck_erfc("(o_orderkey % 7) / 3.0")}), 6) AS ef,
    CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
      AS sx,
    CAST(sum(CASE WHEN o_custkey % 5 = 0 THEN 1 ELSE 0 END) AS DOUBLE)
      AS sy,
    CAST(count(*) AS DOUBLE) AS tx, CAST(count(*) AS DOUBLE) AS ty,
    list(struct_pack(x := CAST(o_orderkey % 32 AS DOUBLE),
                     y := CAST(o_totalprice AS DOUBLE))) AS ps,
    min(CAST(o_orderkey % 32 AS DOUBLE)) AS lo,
    max(CAST(o_orderkey % 32 AS DOUBLE)) AS hi
  FROM orders GROUP BY o_orderstatus
)
"""


CH_EVERYDAY28_ORACLE = _build_ch28_oracle()


QUERIES["ch_everyday_funcs28"] = Query(
    ch_everyday_funcs28, CH_EVERYDAY28_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs29(spark, sf_dir):
    """Everyday upstream-CH tier 29: true Damerau-Levenshtein distance,
    UTF8 edit distance, second-precision ts64 codecs, nanosecond
    arithmetic, unaligned array zip, even-odd point-in-polygon,
    great-circle distances, Java/Hive string hashes, CIDR subnet
    ranges, and OrDefault IP parses.  The oracle is maximally
    independent: DuckDB's NATIVE damerau_levenshtein / levenshtein
    check the DP aggregates row-for-row; javaHash re-derives through a
    DuckDB list_reduce of the published recurrence; the polygon test,
    haversine, CIDR arithmetic, and codec roundtrips are all re-stated
    from first principles."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e29")
    poly = ("array(tuple(6.0D, 0.0D), tuple(8.0D, 4.0D), "
            "tuple(5.0D, 8.0D), tuple(0.0D, 2.0D))")
    return eng.sql(
        "select o_orderstatus as st, "
        "sum(cast(damerauLevenshteinDistance(o_orderpriority, "
        "  o_orderstatus) as bigint)) as dl, "
        "sum(cast(levenshteinDistanceUTF8(o_orderpriority, "
        "  '3-MEDIUM') as bigint)) as lv, "
        "max(toUnixTimestamp64Second(toDateTime(o_orderdate))) as t64, "
        "max(toString(fromUnixTimestamp64Second("
        "  toUnixTimestamp64Second(toDateTime(o_orderdate))))) as f64, "
        # k*1000 ns = k whole microseconds: exact at Spark's precision
        "max(toUnixTimestamp64Micro(addNanoseconds("
        "  toDateTime(o_orderdate), o_orderkey * 1000))) as an, "
        "max(arrayStringConcat(arrayMap(__p -> concat("
        "  coalesce(toString(__p._1), 'n'), ':', "
        "  coalesce(toString(__p._2), 'n')), "
        "  arrayZipUnaligned(array(o_orderkey % 5, o_orderkey % 3), "
        "  array(o_orderkey % 2))), ',')) as azu, "
        "sum(cast(pointInPolygon(tuple("
        "  cast(o_orderkey % 10 as double), "
        f"  cast(o_custkey % 10 as double)), {poly}) as bigint)) as pip, "
        "round(avg(greatCircleDistance("
        "  (o_orderkey % 360) - 180 + 0.25D, "
        "  (o_orderkey % 160) * 0.5D - 40.0D, 10.5D, 20.25D)), 2) as gcd, "
        "sum(cast(javaHash(o_orderpriority) as bigint)) as jh, "
        "sum(cast(hiveHash(o_orderpriority) as bigint)) as hh, "
        "max((IPv4CIDRToRange(concat('10.', "
        "  toString(o_orderkey % 256), '.', toString(o_custkey % 256), "
        "  '.9'), 20))._2) as chi, "
        "max(toIPv4OrDefault(concat('10.0.0.', "
        "  toString(o_orderkey % 300)))) as v4d, "
        "max(toIPv6OrDefault(case when o_orderkey % 2 = 0 "
        "  then '::1' else 'nope' end)) as v6d "
        "from ord_e29 group by o_orderstatus"
    )


def _build_ch29_oracle() -> str:
    # even-odd ray casting over the fixed polygon, re-stated with DuckDB
    # list ops (x = k%10, y = c%10 as doubles)
    edges = ("[{'px': 6.0, 'py': 0.0, 'qx': 8.0, 'qy': 4.0}, "
             "{'px': 8.0, 'py': 4.0, 'qx': 5.0, 'qy': 8.0}, "
             "{'px': 5.0, 'py': 8.0, 'qx': 0.0, 'qy': 2.0}, "
             "{'px': 0.0, 'py': 2.0, 'qx': 6.0, 'qy': 0.0}]")
    crossing = (
        "((struct_extract(__e, 'py') > __y) != "
        "(struct_extract(__e, 'qy') > __y)) AND "
        "__x < (struct_extract(__e, 'qx') - struct_extract(__e, 'px')) "
        "* (__y - struct_extract(__e, 'py')) "
        "/ (struct_extract(__e, 'qy') - struct_extract(__e, 'py')) "
        "+ struct_extract(__e, 'px')"
    )
    pip = (
        f"list_transform([CAST(o_orderkey % 10 AS DOUBLE)], __x -> "
        f"list_transform([CAST(o_custkey % 10 AS DOUBLE)], __y -> "
        f"len(list_filter({edges}, __e -> {crossing})) % 2)[1])[1]"
    )
    # Java String.hashCode as a 32-bit-wrapping DuckDB fold
    jhash = (
        "list_reduce(list_prepend(0::BIGINT, "
        "list_transform(range(1, length(o_orderpriority) + 1), "
        "__i -> ascii(substring(o_orderpriority, __i, 1))::BIGINT)), "
        "(__h, __c) -> ((__h * 31 + __c) % 4294967296 + 4294967296) "
        "% 4294967296)"
    )
    jh_signed = (f"(CASE WHEN {jhash} >= 2147483648 "
                 f"THEN {jhash} - 4294967296 ELSE {jhash} END)")
    hav = (
        "power(sin(radians(20.25 - ((o_orderkey % 160) * 0.5 - 40.0)) "
        "/ 2), 2) + cos(radians((o_orderkey % 160) * 0.5 - 40.0)) "
        "* cos(radians(20.25)) "
        "* power(sin(radians(10.5 - ((o_orderkey % 360) - 180 + 0.25)) "
        "/ 2), 2)"
    )
    cidr_num = ("(167772160 + (o_orderkey % 256) * 65536 "
                "+ (o_custkey % 256) * 256 + 9)")
    cidr_hi = f"({cidr_num} | 4095)"  # /20: low 12 bits set
    return f"""
SELECT o_orderstatus AS st,
  CAST(sum(damerau_levenshtein(o_orderpriority, o_orderstatus))
      AS BIGINT) AS dl,
  CAST(sum(levenshtein(o_orderpriority, '3-MEDIUM')) AS BIGINT) AS lv,
  CAST(max(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS t64,
  max(CAST(CAST(o_orderdate AS TIMESTAMP) AS VARCHAR)) AS f64,
  CAST(max(epoch_us(CAST(o_orderdate AS TIMESTAMP)) + o_orderkey)
      AS BIGINT) AS an,
  max(CAST(o_orderkey % 5 AS VARCHAR) || ':'
      || CAST(o_orderkey % 2 AS VARCHAR) || ','
      || CAST(o_orderkey % 3 AS VARCHAR) || ':n') AS azu,
  CAST(sum({pip}) AS BIGINT) AS pip,
  round(avg({2 * 6372797.560856} * asin(sqrt({hav}))), 2) AS gcd,
  CAST(sum({jh_signed}) AS BIGINT) AS jh,
  CAST(sum({jhash} & 2147483647) AS BIGINT) AS hh,
  max(CAST({cidr_hi} // 16777216 AS VARCHAR) || '.'
      || CAST(({cidr_hi} // 65536) % 256 AS VARCHAR) || '.'
      || CAST(({cidr_hi} // 256) % 256 AS VARCHAR) || '.'
      || CAST({cidr_hi} % 256 AS VARCHAR)) AS chi,
  max(CASE WHEN o_orderkey % 300 <= 255
      THEN '10.0.0.' || CAST(o_orderkey % 300 AS VARCHAR)
      ELSE '0.0.0.0' END) AS v4d,
  max(CASE WHEN o_orderkey % 2 = 0 THEN '::1' ELSE '::' END) AS v6d
FROM orders GROUP BY o_orderstatus
"""


CH_EVERYDAY29_ORACLE = _build_ch29_oracle()


QUERIES["ch_everyday_funcs29"] = Query(
    ch_everyday_funcs29, CH_EVERYDAY29_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs30(spark, sf_dir):
    """Everyday upstream-CH tier 30: base58 codecs, Joda-syntax
    datetime formatting, random array sampling.  Oracle strategy: the
    codec pair is checked through the ROUNDTRIP LAW (decode(encode(x))
    must be the identity — the oracle re-derives the right-hand side
    directly) plus the published 'Hello World!' -> '2NEpo7TZRRrLZSi2U'
    test vector; the Joda formats re-derive through strftime
    (arrayRandomSample is nondeterministic — unit-tested like rand*)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e30")
    # the codec runs on the 3 aggregated values, not per input row —
    # the roundtrip law is about the codec, not the scan
    return eng.sql(
        "select st, "
        "base58Decode(base58Encode(mp)) as rtp, "
        "base58Encode('Hello World!') as hw, "
        "tryBase58Decode('ZiCa') as tdv, "
        "concat('[', tryBase58Decode('0OIl'), ']') as tdb, "
        "fj, fu from (select o_orderstatus as st, "
        "max(o_orderpriority) as mp, "
        "max(formatDateTimeInJodaSyntax(toDateTime(o_orderdate), "
        "  'yyyyMMdd HHmmss')) as fj, "
        "max(fromUnixTimestampInJodaSyntax(toUnixTimestamp64Second("
        "  toDateTime(o_orderdate)), 'yyyy-DDD')) as fu "
        "from ord_e30 group by o_orderstatus)"
    )


CH_EVERYDAY30_ORACLE = """
SELECT o_orderstatus AS st,
  -- the codec roundtrip law: decode(encode(x)) == x
  max(o_orderpriority) AS rtp,
  -- published base58 test vector
  max('2NEpo7TZRRrLZSi2U') AS hw,
  max('abc') AS tdv,
  max('[]') AS tdb,
  max(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y%m%d %H%M%S')) AS fj,
  max(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%j')) AS fu
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs30"] = Query(
    ch_everyday_funcs30, CH_EVERYDAY30_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs31(spark, sf_dir):
    """Everyday upstream-CH tier 31: the aggregate-statistics surface —
    chi-square association family (Cramér's V plain and bias-corrected,
    contingency coefficient, Theil's U), Mann-Whitney U test,
    known-variance mean z-test, interval-union length, bounding ratio,
    Greenwald-Khanna quantiles.  The oracle re-derives every statistic
    through proper relational decompositions (contingency tables as
    GROUP BY subqueries, midranks as windowed cumulative counts,
    interval union as gaps-and-islands) — a genuinely different
    computational path from the engine's collect-based JVM folds.  The
    order-dependent folds of this tier (deltaSum, moving arrays, EMA)
    are unit-tested on ordered single partitions instead, like rand*."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e31")
    return eng.sql(
        "select o_orderstatus as st, "
        "round(cramersV(o_orderpriority, o_orderkey % 4), 6) as cv, "
        "round(cramersVBiasCorrected(o_orderpriority, "
        "  o_orderkey % 4), 6) as cvb, "
        "round(contingency(o_orderpriority, o_orderkey % 4), 6) as cg, "
        "round(theilsU(o_orderpriority, o_orderkey % 4), 6) as tu, "
        "round((mannWhitneyUTest(o_orderkey % 7, o_custkey % 2))._1, 4) "
        "  as mwu, "
        "round((mannWhitneyUTest(o_orderkey % 7, o_custkey % 2))._2, 6) "
        "  as mwp, "
        "round((meanZTest(2.0, 2.0, 0.95)(o_orderkey % 5, "
        "  o_custkey % 2))._1, 6) as mz, "
        "round((meanZTest(2.0, 2.0, 0.95)(o_orderkey % 5, "
        "  o_custkey % 2))._2, 6) as mzp, "
        "intervalLengthSum(o_orderkey % 50, "
        "  o_orderkey % 50 + o_custkey % 7) as ils, "
        "round(boundingRatio(o_orderkey, o_totalprice), 6) as br, "
        "quantileGK(10000)(o_orderkey % 7) as qgk "
        "from ord_e31 group by o_orderstatus"
    )


def _build_ch31_oracle() -> str:
    pu = _duck_erfc("abs((u1 - mnu) / sig) / sqrt(2.0)")
    pz = _duck_erfc("abs(zst) / sqrt(2.0)")
    return f"""
WITH pairs AS (
  SELECT o_orderstatus AS st, CAST(o_orderpriority AS VARCHAR) AS a,
         CAST(o_orderkey % 4 AS VARCHAR) AS b
  FROM orders),
cells AS (SELECT st, a, b, count(*)::DOUBLE AS o FROM pairs
          GROUP BY st, a, b),
rowt AS (SELECT st, a, count(*)::DOUBLE AS ra FROM pairs GROUP BY st, a),
colt AS (SELECT st, b, count(*)::DOUBLE AS cb FROM pairs GROUP BY st, b),
tot AS (SELECT st, count(*)::DOUBLE AS n,
               count(DISTINCT a)::DOUBLE AS ka,
               count(DISTINCT b)::DOUBLE AS kb FROM pairs GROUP BY st),
chi AS (
  SELECT c.st,
    sum((c.o - r.ra * l.cb / t.n) * (c.o - r.ra * l.cb / t.n)
        / (r.ra * l.cb / t.n)) AS x2,
    -- H(a|b) = -sum p_ab ln(p_ab / p_b) over the same cells
    -sum((c.o / t.n) * ln((c.o / t.n) / (l.cb / t.n))) AS hab
  FROM cells c
  JOIN rowt r ON c.st = r.st AND c.a = r.a
  JOIN colt l ON c.st = l.st AND c.b = l.b
  JOIN tot t ON c.st = t.st
  GROUP BY c.st),
ent AS (SELECT r.st, -sum((r.ra / t.n) * ln(r.ra / t.n)) AS ha
        FROM rowt r JOIN tot t ON r.st = t.st GROUP BY r.st),
-- Mann-Whitney: midranks from windowed cumulative per-value counts
mv AS (SELECT o_orderstatus AS st, (o_orderkey % 7)::DOUBLE AS v,
              (o_custkey % 2)::INTEGER AS g FROM orders),
pv AS (SELECT st, v, count(*)::DOUBLE AS c,
              sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::DOUBLE AS e0
       FROM mv GROUP BY st, v),
pr AS (SELECT st, v, c, e0,
              coalesce(sum(c) OVER (PARTITION BY st ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS lt
       FROM pv),
mw AS (
  SELECT st, sum((lt + (c + 1) / 2) * e0) AS r1,
         sum(c * c * c - c) AS ts, sum(e0) AS n1, sum(c - e0) AS n2,
         sum(c) AS nn
  FROM pr GROUP BY st),
mws AS (
  SELECT st, r1 - n1 * (n1 + 1) / 2 AS u1, n1 * n2 / 2 AS mnu,
         sqrt(n1 * n2 / 12 * ((nn + 1) - ts / (nn * (nn - 1)))) AS sig
  FROM mw),
-- mean z-test with known variances 2.0 / 2.0
mzs AS (
  SELECT o_orderstatus AS st,
    avg(CASE WHEN o_custkey % 2 = 0 THEN (o_orderkey % 5)::DOUBLE END)
      AS m0,
    avg(CASE WHEN o_custkey % 2 = 1 THEN (o_orderkey % 5)::DOUBLE END)
      AS m1,
    sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END)::DOUBLE AS n0,
    sum(CASE WHEN o_custkey % 2 = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1
  FROM orders GROUP BY o_orderstatus),
mz AS (SELECT st, (m0 - m1) / sqrt(2.0 / n0 + 2.0 / n1) AS zst FROM mzs),
-- interval union: gaps-and-islands sweep
iv AS (SELECT o_orderstatus AS st, (o_orderkey % 50)::DOUBLE AS s,
              (o_orderkey % 50 + o_custkey % 7)::DOUBLE AS e
       FROM orders),
mx AS (SELECT st, s, e,
              max(e) OVER (PARTITION BY st ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       FROM iv),
fl AS (SELECT st, s, e,
              CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nf
       FROM mx),
gr AS (SELECT st, s, e,
              sum(nf) OVER (PARTITION BY st ORDER BY s, e
                ROWS UNBOUNDED PRECEDING) AS gid
       FROM fl),
ils AS (SELECT st, sum(len) AS total FROM
          (SELECT st, gid, max(e) - min(s) AS len FROM gr
           GROUP BY st, gid) GROUP BY st),
-- bounding ratio over unique x = o_orderkey
br AS (SELECT o_orderstatus AS st,
              (arg_max(o_totalprice, o_orderkey)
               - arg_min(o_totalprice, o_orderkey))
              / (max(o_orderkey) - min(o_orderkey))::DOUBLE AS slope
       FROM orders GROUP BY o_orderstatus),
-- GK quantile: k % 7 is uniform over 0..6 in every group -> median 3
qm AS (SELECT st, quantile_disc(v, 0.5) AS q FROM mv GROUP BY st)
SELECT t.st,
  round(sqrt(c.x2 / (t.n * (least(t.ka, t.kb) - 1))), 6) AS cv,
  round(sqrt(greatest(c.x2 / t.n
      - (t.ka - 1) * (t.kb - 1) / (t.n - 1), 0)
      / least(t.ka - (t.ka - 1) * (t.ka - 1) / (t.n - 1) - 1,
              t.kb - (t.kb - 1) * (t.kb - 1) / (t.n - 1) - 1)), 6)
      AS cvb,
  round(sqrt(c.x2 / (c.x2 + t.n)), 6) AS cg,
  round((e.ha - c.hab) / e.ha, 6) AS tu,
  round(m.u1, 4) AS mwu,
  round({pu}, 6) AS mwp,
  round(z.zst, 6) AS mz,
  round({pz}, 6) AS mzp,
  i.total AS ils,
  round(b.slope, 6) AS br,
  CAST(q.q AS BIGINT) AS qgk
FROM tot t
JOIN chi c ON t.st = c.st
JOIN ent e ON t.st = e.st
JOIN mws m ON t.st = m.st
JOIN mz z ON t.st = z.st
JOIN ils i ON t.st = i.st
JOIN br b ON t.st = b.st
JOIN qm q ON t.st = q.st
"""


CH_EVERYDAY31_ORACLE = _build_ch31_oracle()


QUERIES["ch_everyday_funcs31"] = Query(
    ch_everyday_funcs31, CH_EVERYDAY31_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs32(spark, sf_dir):
    """Everyday upstream-CH tier 32: the event-sequence aggregate
    family — windowFunnel / retention / sequenceMatch / sequenceCount —
    per user over the events table, rolled up by cohort.  The oracle
    RE-IMPLEMENTS the same published algorithms independently in DuckDB:
    a single recursive-CTE state machine walks each user's
    time-ordered event list carrying (funnel chain starts, match
    cursor, count cursor) — DuckDB 1.0's list_reduce leaks lambda
    state across rows in multi-row vectors, so the oracle avoids
    lambdas entirely — and retention decomposes into per-user boolean
    aggregates; a wholly different mechanism computing the same
    contracts."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_e32")
    return eng.sql(
        "select user_id % 3 as cohort, "
        "sum(wf) as wf_sum, "
        "sum(if(wf >= 3, 1, 0)) as wf_full, "
        "sum(element_at(ret, 1)) as r1, "
        "sum(element_at(ret, 2)) as r2, "
        "sum(element_at(ret, 3)) as r3, "
        "sum(sm) as sm, sum(sc) as sc, count(*) as nu "
        "from (select user_id, "
        "windowFunnel(86400)(ts, event_type = 'view', "
        "  event_type = 'click', event_type = 'purchase') as wf, "
        "retention(event_type = 'view', event_type = 'click', "
        "  event_type = 'purchase') as ret, "
        "sequenceMatch('(?1).*(?2)')(ts, event_type = 'view', "
        "  event_type = 'purchase') as sm, "
        "sequenceCount('(?1).*(?2)')(ts, event_type = 'view', "
        "  event_type = 'click') as sc "
        "from ev_e32 group by user_id) "
        "group by user_id % 3"
    )


CH_EVERYDAY32_ORACLE = """
WITH RECURSIVE users AS (SELECT DISTINCT user_id FROM events),
ue AS (
  SELECT user_id, list_sort(list([epoch_us(ts)::DOUBLE / 1000000.0,
    CASE WHEN event_type = 'view' THEN 1.0 ELSE 0.0 END,
    CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END,
    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END])) AS es
  FROM events GROUP BY user_id),
walk AS (
  SELECT user_id, es, 0 AS i,
         CAST(NULL AS DOUBLE) AS f1, CAST(NULL AS DOUBLE) AS f2,
         CAST(NULL AS DOUBLE) AS f3, 0 AS smc, 0 AS scc, 0 AS scn
  FROM ue
  UNION ALL
  SELECT user_id, es, i + 1,
    CASE WHEN es[i + 1][2] = 1.0 THEN es[i + 1][1] ELSE f1 END,
    CASE WHEN es[i + 1][3] = 1.0 AND f1 IS NOT NULL
          AND es[i + 1][1] <= f1 + 86400.0 THEN f1 ELSE f2 END,
    CASE WHEN es[i + 1][4] = 1.0 AND f2 IS NOT NULL
          AND es[i + 1][1] <= f2 + 86400.0 THEN f2 ELSE f3 END,
    CASE WHEN smc = 0 AND es[i + 1][2] = 1.0 THEN 1
         WHEN smc = 1 AND es[i + 1][4] = 1.0 THEN 2
         ELSE smc END,
    CASE WHEN scc = 0 AND es[i + 1][2] = 1.0 THEN 1
         WHEN scc = 1 AND es[i + 1][3] = 1.0 THEN 0
         ELSE scc END,
    CASE WHEN scc = 1 AND es[i + 1][3] = 1.0 THEN scn + 1 ELSE scn END
  FROM walk WHERE i < len(es)),
fin AS (
  SELECT user_id,
    (CASE WHEN f1 IS NULL THEN 0 ELSE 1 END
     + CASE WHEN f2 IS NULL THEN 0 ELSE 1 END
     + CASE WHEN f3 IS NULL THEN 0 ELSE 1 END) AS wf,
    CASE WHEN smc = 2 THEN 1 ELSE 0 END AS m,
    scn AS n
  FROM walk WHERE i = len(es)),
ret AS (
  SELECT user_id,
    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS h1,
    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS h2,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS h3
  FROM events GROUP BY user_id)
SELECT u.user_id % 3 AS cohort,
  CAST(sum(f.wf) AS BIGINT) AS wf_sum,
  CAST(sum(CASE WHEN f.wf >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS wf_full,
  CAST(sum(r.h1) AS BIGINT) AS r1,
  CAST(sum(least(r.h1, r.h2)) AS BIGINT) AS r2,
  CAST(sum(least(r.h1, r.h3)) AS BIGINT) AS r3,
  CAST(sum(f.m) AS BIGINT) AS sm,
  CAST(sum(f.n) AS BIGINT) AS sc,
  count(*) AS nu
FROM users u
JOIN fin f ON u.user_id = f.user_id
JOIN ret r ON u.user_id = r.user_id
GROUP BY u.user_id % 3
"""


QUERIES["ch_everyday_funcs32"] = Query(
    ch_everyday_funcs32, CH_EVERYDAY32_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs33(spark, sf_dir):
    """Everyday upstream-CH tier 33: timezone conversion shims (pinned
    to the no-DST IST offset so ICU and DuckDB tz databases cannot
    diverge), addDate/subDate interval arithmetic, CH negative-length
    UTF8 prefix/suffix, variadic array set algebra, human-readable size
    parsing, positive modulo, and the filtered-map / single-value
    aggregates.  The oracle re-derives each through DuckDB's native
    operators (timezone()/epoch(), native negative-length left/right,
    list algebra, conditional sums for the filtered map)."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e33")
    return eng.sql(
        "select o_orderstatus as st, "
        "sum(unix_timestamp(toUTCTimestamp("
        "  cast(o_orderdate as timestamp), 'Asia/Kolkata')) "
        "  - unix_timestamp(cast(o_orderdate as timestamp))) as uo, "
        "sum(unix_timestamp(fromUTCTimestamp("
        "  cast(o_orderdate as timestamp), 'Asia/Kolkata')) "
        "  - unix_timestamp(cast(o_orderdate as timestamp))) as fo, "
        "sum(date_diff('day', subDate(o_orderdate, interval 2 day), "
        "  addDate(o_orderdate, interval 3 day))) as dd, "
        "min(leftUTF8(o_orderpriority, -3)) as lp, "
        "max(rightUTF8(o_orderpriority, -2)) as rp, "
        "sum(positiveModulo(-o_orderkey, 7)) as pm, "
        "count(distinct regexpExtract(o_orderpriority, "
        "  '(\\\\d+)-(\\\\w+)', 2)) as re2, "
        "sum(size(arrayUnion(array(o_orderkey % 3), "
        "  array(o_orderkey % 5), array(2)))) as au, "
        "sum(size(arraySymmetricDifference("
        "  array(o_orderkey % 3, 9), array(o_orderkey % 5, 9)))) as asd, "
        "sum(parseReadableSize(concat(cast(o_orderkey % 100 as string), "
        "  '.5 KiB'))) as prs, "
        "sum(parseReadableSizeOrZero(if(o_orderkey % 2 = 0, "
        "  '1 MB', 'junk'))) as prz, "
        "count(parseReadableSizeOrNull('junk')) as prn, "
        "coalesce(singleValueOrNull(o_orderstatus), 'MULTI') as sv, "
        "coalesce(singleValueOrNull(o_orderpriority), 'MULTI') as mv, "
        "round(element_at((sumMapFiltered(array('k0', 'k2'))("
        "  map(concat('k', cast(o_orderkey % 3 as string)), "
        "  cast(o_orderkey % 5 as double))))._2, 1), 4) as smf "
        "from ord_e33 group by o_orderstatus"
    )


CH_EVERYDAY33_ORACLE = """
SELECT o_orderstatus AS st,
  CAST(sum(epoch(timezone('Asia/Kolkata', o_orderdate::TIMESTAMP))
      - epoch(o_orderdate::TIMESTAMP)) AS BIGINT) AS uo,
  CAST(sum(epoch(o_orderdate::TIMESTAMP)
      - epoch(timezone('Asia/Kolkata', o_orderdate::TIMESTAMP)))
      AS BIGINT) AS fo,
  CAST(sum(5) AS BIGINT) AS dd,
  min(left(o_orderpriority, -3)) AS lp,
  max(right(o_orderpriority, -2)) AS rp,
  CAST(sum(((-o_orderkey % 7) + 7) % 7) AS BIGINT) AS pm,
  count(DISTINCT regexp_extract(o_orderpriority,
      '(\\d+)-(\\w+)', 2)) AS re2,
  CAST(sum(len(list_distinct([o_orderkey % 3, o_orderkey % 5, 2])))
      AS BIGINT) AS au,
  CAST(sum(len(list_filter(
      list_distinct(list_cat([o_orderkey % 3, 9], [o_orderkey % 5, 9])),
      __x -> NOT (list_contains([o_orderkey % 3, 9], __x)
                  AND list_contains([o_orderkey % 5, 9], __x)))))
      AS BIGINT) AS asd,
  CAST(sum(ceil(((o_orderkey % 100) + 0.5) * 1024)) AS BIGINT) AS prs,
  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1000000 ELSE 0 END)
      AS BIGINT) AS prz,
  CAST(0 AS BIGINT) AS prn,
  o_orderstatus AS sv,
  CASE WHEN count(DISTINCT o_orderpriority) = 1
       THEN min(o_orderpriority) ELSE 'MULTI' END AS mv,
  round(sum(CASE WHEN o_orderkey % 3 = 0
      THEN (o_orderkey % 5)::DOUBLE ELSE 0 END), 4) AS smf
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs33"] = Query(
    ch_everyday_funcs33, CH_EVERYDAY33_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs34(spark, sf_dir):
    """Everyday upstream-CH tier 34: ordered and time-decayed
    aggregates — Spearman rank correlation (average-rank ties),
    timestamp-ordered positive-delta sum over exact cent values,
    the exponentialTimeDecayed family anchored at each group's latest
    date, exclusive/inclusive exact quantiles, and group-wide array
    intersection.  The oracle re-derives each relationally: ranks as
    windowed rank()+tie-span, deltas as lag() diffs, decay against a
    windowed max(t), the exclusive quantile from an ordered list
    aggregate.  rankCorr runs on a modulus-sampled subset — its
    in-group rank build is quadratic by contract (per-group analytics,
    like quantileExact/topK), so the input is bounded by construction."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e34")
    return eng.sql(
        "select o.o_orderstatus as st, "
        "max(r.rc) as rc, "
        "cast(deltaSumTimestamp(cast(o_totalprice * 100 as bigint), "
        "  cast(o_orderdate as timestamp)) as bigint) as dst, "
        "round(exponentialTimeDecayedSum(2592000)(o_orderkey % 100, "
        "  cast(o_orderdate as timestamp)), 4) as es, "
        "round(exponentialTimeDecayedCount(2592000)(o_orderkey % 100, "
        "  cast(o_orderdate as timestamp)), 4) as ec, "
        "round(exponentialTimeDecayedAvg(2592000)(o_orderkey % 100, "
        "  cast(o_orderdate as timestamp)), 6) as ea, "
        "round(exponentialTimeDecayedMax(2592000)(o_orderkey % 100, "
        "  cast(o_orderdate as timestamp)), 4) as em, "
        "round(quantileExactExclusive(0.3)(o_totalprice), 4) as qe, "
        "round(quantileExactInclusive(0.3)(o_totalprice), 4) as qi, "
        "aggregate(groupArrayIntersect("
        "  array(o_orderkey % 3, o_orderkey % 5, 7)), "
        "  cast(0 as bigint), (a, x) -> a + x) as gs, "
        "size(groupArrayIntersect("
        "  array(o_orderkey % 3, o_orderkey % 5, 7))) as gn "
        "from ord_e34 o join (select o_orderstatus, "
        "  round(rankCorr(o_orderkey % 97, o_custkey % 89), 6) as rc "
        "  from ord_e34 where o_orderkey % 31 = 0 "
        "  group by o_orderstatus) r using (o_orderstatus) "
        "group by o.o_orderstatus"
    )


CH_EVERYDAY34_ORACLE = """
WITH rsub AS (
  SELECT o_orderstatus AS st,
    rank() OVER (PARTITION BY o_orderstatus ORDER BY xk)
      + (count(*) OVER (PARTITION BY o_orderstatus, xk) - 1) / 2.0 AS rx,
    rank() OVER (PARTITION BY o_orderstatus ORDER BY yk)
      + (count(*) OVER (PARTITION BY o_orderstatus, yk) - 1) / 2.0 AS ry
  FROM (SELECT o_orderstatus, o_orderkey % 97 AS xk,
               o_custkey % 89 AS yk
        FROM orders WHERE o_orderkey % 31 = 0)),
rc AS (SELECT st, round(corr(rx, ry), 6) AS rc FROM rsub GROUP BY st),
dl AS (
  SELECT o_orderstatus AS st,
    v - lag(v) OVER (PARTITION BY o_orderstatus
                     ORDER BY o_orderdate, v) AS dd
  FROM (SELECT o_orderstatus, o_orderdate,
               -- trunc, not ::BIGINT: DuckDB's double->int cast rounds
               -- while Spark's truncates
               trunc(o_totalprice * 100) AS v
        FROM orders)),
dst AS (SELECT st, CAST(sum(CASE WHEN dd > 0 THEN dd ELSE 0 END)
                   AS BIGINT) AS dst FROM dl GROUP BY st),
dec AS (
  SELECT o_orderstatus AS st,
    (o_orderkey % 100)::DOUBLE AS v,
    exp((epoch(o_orderdate::TIMESTAMP)
         - max(epoch(o_orderdate::TIMESTAMP))
           OVER (PARTITION BY o_orderstatus)) / 2592000.0) AS w
  FROM orders),
ds AS (SELECT st, round(sum(v * w), 4) AS es, round(sum(w), 4) AS ec,
              round(sum(v * w) / sum(w), 6) AS ea,
              round(max(v * w), 4) AS em
       FROM dec GROUP BY st),
qs AS (
  SELECT st, round(CASE WHEN k < 1 THEN l[1]
    WHEN k >= n THEN l[n]
    ELSE l[k] + (h - k) * (l[k + 1] - l[k]) END, 4) AS qe
  FROM (SELECT o_orderstatus AS st,
               list(o_totalprice ORDER BY o_totalprice) AS l,
               count(*) AS n, 0.3 * (count(*) + 1) AS h,
               floor(0.3 * (count(*) + 1))::INTEGER AS k
        FROM orders GROUP BY o_orderstatus)),
qi AS (SELECT o_orderstatus AS st,
              round(quantile_cont(o_totalprice, 0.3), 4) AS qi
       FROM orders GROUP BY o_orderstatus),
rows_per AS (SELECT o_orderstatus AS st, count(*) AS nr
             FROM orders GROUP BY st),
el AS (
  SELECT st, e, count(*) AS c FROM (
    SELECT o_orderstatus AS st, o_orderkey AS rid,
           unnest(list_distinct([o_orderkey % 3, o_orderkey % 5, 7]))
             AS e
    FROM orders) GROUP BY st, e),
gi AS (SELECT e.st, CAST(coalesce(sum(e.e), 0) AS BIGINT) AS gs,
              CAST(count(*) AS INTEGER) AS gn
       FROM el e JOIN rows_per r ON e.st = r.st AND e.c = r.nr
       GROUP BY e.st)
SELECT rc.st, rc.rc, dst.dst, ds.es, ds.ec, ds.ea, ds.em,
       qs.qe, qi.qi, gi.gs, gi.gn
FROM rc JOIN dst ON rc.st = dst.st
JOIN ds ON rc.st = ds.st
JOIN qs ON rc.st = qs.st
JOIN qi ON rc.st = qi.st
JOIN gi ON rc.st = gi.st
"""


QUERIES["ch_everyday_funcs34"] = Query(
    ch_everyday_funcs34, CH_EVERYDAY34_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs35(spark, sf_dir):
    """Everyday upstream-CH tier 35: the t-test family with real
    p-values — studentTTest / welchTTest (Lanczos log-gamma + Lentz
    continued-fraction incomplete beta, entirely JVM scalar folds) and
    the two-sample kolmogorovSmirnovTest (O(d·n) ECDF sup over pooled
    distinct values, asymptotic Kolmogorov series).  The oracle takes a
    wholly different numerical route: it integrates the Student t
    DENSITY with Simpson's rule over a generate_series grid using
    DuckDB's native lgamma for the normalizing constant, and rebuilds
    the KS statistic from windowed cumulative ECDFs."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e35")
    return eng.sql(
        "select o_orderstatus as st, "
        "round((studentTTest(o_totalprice, o_custkey % 2))._1, 6) as ts, "
        "round((studentTTest(o_totalprice, o_custkey % 2))._2, 6) as ps, "
        "round((welchTTest(o_totalprice, o_custkey % 2))._1, 6) as tw, "
        "round((welchTTest(o_totalprice, o_custkey % 2))._2, 6) as pw, "
        "round((kolmogorovSmirnovTest(o_orderkey % 23, "
        "  o_custkey % 2))._1, 6) as kd, "
        "round((kolmogorovSmirnovTest(o_orderkey % 23, "
        "  o_custkey % 2))._2, 6) as kp "
        "from ord_e35 group by o_orderstatus"
    )


CH_EVERYDAY35_ORACLE = """
WITH mom AS (
  SELECT o_orderstatus AS st,
    count(*) FILTER (o_custkey % 2 = 0)::DOUBLE AS n0,
    count(*) FILTER (o_custkey % 2 = 1)::DOUBLE AS n1,
    avg(o_totalprice) FILTER (o_custkey % 2 = 0) AS m0,
    avg(o_totalprice) FILTER (o_custkey % 2 = 1) AS m1,
    var_samp(o_totalprice) FILTER (o_custkey % 2 = 0) AS v0,
    var_samp(o_totalprice) FILTER (o_custkey % 2 = 1) AS v1
  FROM orders GROUP BY o_orderstatus),
par AS (
  SELECT st, 'st' AS kind,
    (m0 - m1) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2)
                     * (1 / n0 + 1 / n1)) AS t,
    n0 + n1 - 2 AS nu
  FROM mom
  UNION ALL
  SELECT st, 'we',
    (m0 - m1) / sqrt(v0 / n0 + v1 / n1),
    (v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
      / ((v0 / n0) * (v0 / n0) / (n0 - 1)
         + (v1 / n1) * (v1 / n1) / (n1 - 1))
  FROM mom),
-- two-sided p = 1 - 2 * integral_0^{|t|} f(u; nu) du, Simpson n=4000
simp AS (
  SELECT st, kind, t, nu,
    1 - 2 * (abs(t) / 4000 / 3) * sum(
      (CASE WHEN k = 0 OR k = 4000 THEN 1
            WHEN k % 2 = 1 THEN 4 ELSE 2 END)
      * exp(lgamma((nu + 1) / 2) - lgamma(nu / 2))
        / sqrt(nu * pi())
      * power(1 + (k * abs(t) / 4000) * (k * abs(t) / 4000) / nu,
              -(nu + 1) / 2)) AS p
  FROM par, generate_series(0, 4000) g(k)
  GROUP BY st, kind, t, nu),
kc AS (
  SELECT o_orderstatus AS st, o_orderkey % 23 AS v,
    count(*) FILTER (o_custkey % 2 = 0)::DOUBLE AS c0,
    count(*) FILTER (o_custkey % 2 = 1)::DOUBLE AS c1
  FROM orders GROUP BY st, v),
kd AS (
  SELECT st, v,
    sum(c0) OVER (PARTITION BY st ORDER BY v) AS f0,
    sum(c1) OVER (PARTITION BY st ORDER BY v) AS f1,
    sum(c0) OVER (PARTITION BY st) AS n0,
    sum(c1) OVER (PARTITION BY st) AS n1
  FROM kc),
ksd AS (SELECT st, max(abs(f0 / n0 - f1 / n1)) AS d,
               any_value(n0) AS n0, any_value(n1) AS n1
        FROM kd GROUP BY st),
ksl AS (SELECT st, d, d * sqrt(n0 * n1 / (n0 + n1)) AS lam FROM ksd),
ksr AS (
  SELECT st, d,
    CASE WHEN lam < 1e-12 THEN 1.0 ELSE least(1.0, greatest(0.0,
      2 * (SELECT sum((CASE WHEN k % 2 = 1 THEN 1 ELSE -1 END)
           * exp(-2 * k * k * lam * lam))
           FROM generate_series(1, 100) s(k)))) END AS p
  FROM ksl)
SELECT s.st,
  round(s.t, 6) AS ts, round(s.p, 6) AS ps,
  round(w.t, 6) AS tw, round(w.p, 6) AS pw,
  round(k.d, 6) AS kd, round(k.p, 6) AS kp
FROM (SELECT * FROM simp WHERE kind = 'st') s
JOIN (SELECT * FROM simp WHERE kind = 'we') w ON s.st = w.st
JOIN ksr k ON s.st = k.st
"""


QUERIES["ch_everyday_funcs35"] = Query(
    ch_everyday_funcs35, CH_EVERYDAY35_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs36(spark, sf_dir):
    """Everyday upstream-CH tier 36: windowFunnel strict modes
    (strict_order / strict_dedup / strict_increase) and '(?t<=N)'
    max-gap sequence constraints, per user over events rolled up by
    cohort.  The oracle extends the tier-32 recursive-CTE state machine
    with one state column set per mode (chain starts + frozen flag;
    last-match times for strict_increase) and the latest-feasible-time
    DP slots for the constrained match/count — the same contracts
    computed through per-row SQL CASE transitions instead of JVM
    aggregate folds."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_e36")
    return eng.sql(
        "select user_id % 3 as cohort, "
        "sum(wso) as so_sum, sum(if(wso >= 3, 1, 0)) as so_full, "
        "sum(wsd) as sd_sum, sum(wsi) as si_sum, "
        "sum(cm) as cm_sum, sum(cc) as cc_sum, count(*) as nu "
        "from (select user_id, "
        "windowFunnel(86400, 'strict_order')(ts, event_type = 'view', "
        "  event_type = 'click', event_type = 'purchase') as wso, "
        "windowFunnel(86400, 'strict_dedup')(ts, event_type = 'view', "
        "  event_type = 'click', event_type = 'purchase') as wsd, "
        "windowFunnel(86400, 'strict_increase')(ts, "
        "  event_type = 'view', event_type = 'click', "
        "  event_type = 'purchase') as wsi, "
        "sequenceMatch('(?1)(?t<=172800)(?2)')(ts, "
        "  event_type = 'view', event_type = 'purchase') as cm, "
        "sequenceCount('(?1)(?t<=86400)(?2)')(ts, "
        "  event_type = 'view', event_type = 'click') as cc "
        "from ev_e36 group by user_id) "
        "group by user_id % 3"
    )


CH_EVERYDAY36_ORACLE = """
WITH RECURSIVE users AS (SELECT DISTINCT user_id FROM events),
ue AS (
  SELECT user_id, list_sort(list([epoch_us(ts)::DOUBLE / 1000000.0,
    CASE WHEN event_type = 'view' THEN 1.0 ELSE 0.0 END,
    CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END,
    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END])) AS es
  FROM events GROUP BY user_id),
walk AS (
  SELECT user_id, es, 0 AS i,
    CAST(NULL AS DOUBLE) AS so1, CAST(NULL AS DOUBLE) AS so2,
    CAST(NULL AS DOUBLE) AS so3, FALSE AS sofz,
    CAST(NULL AS DOUBLE) AS sd1, CAST(NULL AS DOUBLE) AS sd2,
    CAST(NULL AS DOUBLE) AS sd3, FALSE AS sdfz,
    CAST(NULL AS DOUBLE) AS si1, CAST(NULL AS DOUBLE) AS sl1,
    CAST(NULL AS DOUBLE) AS si2, CAST(NULL AS DOUBLE) AS sl2,
    CAST(NULL AS DOUBLE) AS si3, CAST(NULL AS DOUBLE) AS sl3,
    CAST(NULL AS DOUBLE) AS cm1, CAST(NULL AS DOUBLE) AS cm2,
    CAST(NULL AS DOUBLE) AS cc1, 0 AS ccn
  FROM ue
  UNION ALL
  SELECT user_id, es, i + 1,
    -- strict_order: only a chain-starting view when nothing is set
    CASE WHEN NOT sofz AND es[i+1][2] = 1.0
          AND so1 IS NULL THEN es[i+1][1] ELSE so1 END,
    CASE WHEN NOT sofz AND es[i+1][3] = 1.0 AND so1 IS NOT NULL
          AND so2 IS NULL AND es[i+1][1] <= so1 + 86400.0
         THEN so1 ELSE so2 END,
    CASE WHEN NOT sofz AND es[i+1][4] = 1.0 AND so2 IS NOT NULL
          AND so3 IS NULL AND es[i+1][1] <= so2 + 86400.0
         THEN so2 ELSE so3 END,
    sofz OR (so1 IS NOT NULL AND NOT (
      (es[i+1][3] = 1.0 AND so1 IS NOT NULL AND so2 IS NULL
        AND es[i+1][1] <= so1 + 86400.0) OR
      (es[i+1][4] = 1.0 AND so2 IS NOT NULL AND so3 IS NULL
        AND es[i+1][1] <= so2 + 86400.0))),
    -- strict_dedup: a repeated condition freezes
    CASE WHEN NOT sdfz AND es[i+1][2] = 1.0 AND sd1 IS NULL
         THEN es[i+1][1] ELSE sd1 END,
    CASE WHEN NOT sdfz AND es[i+1][3] = 1.0 AND sd1 IS NOT NULL
          AND sd2 IS NULL AND es[i+1][1] <= sd1 + 86400.0
         THEN sd1 ELSE sd2 END,
    CASE WHEN NOT sdfz AND es[i+1][4] = 1.0 AND sd2 IS NOT NULL
          AND sd3 IS NULL AND es[i+1][1] <= sd2 + 86400.0
         THEN sd2 ELSE sd3 END,
    sdfz OR (es[i+1][2] = 1.0 AND sd1 IS NOT NULL)
         OR (es[i+1][3] = 1.0 AND sd2 IS NOT NULL)
         OR (es[i+1][4] = 1.0 AND sd3 IS NOT NULL),
    -- strict_increase: strictly later than the previous MATCH time
    CASE WHEN es[i+1][2] = 1.0 THEN es[i+1][1] ELSE si1 END,
    CASE WHEN es[i+1][2] = 1.0 THEN es[i+1][1] ELSE sl1 END,
    CASE WHEN es[i+1][3] = 1.0 AND si1 IS NOT NULL
          AND es[i+1][1] <= si1 + 86400.0 AND es[i+1][1] > sl1
         THEN si1 ELSE si2 END,
    CASE WHEN es[i+1][3] = 1.0 AND si1 IS NOT NULL
          AND es[i+1][1] <= si1 + 86400.0 AND es[i+1][1] > sl1
         THEN es[i+1][1] ELSE sl2 END,
    CASE WHEN es[i+1][4] = 1.0 AND si2 IS NOT NULL
          AND es[i+1][1] <= si2 + 86400.0 AND es[i+1][1] > sl2
         THEN si2 ELSE si3 END,
    CASE WHEN es[i+1][4] = 1.0 AND si2 IS NOT NULL
          AND es[i+1][1] <= si2 + 86400.0 AND es[i+1][1] > sl2
         THEN es[i+1][1] ELSE sl3 END,
    -- constrained match DP (view -> purchase within 172800)
    CASE WHEN es[i+1][2] = 1.0 THEN es[i+1][1] ELSE cm1 END,
    CASE WHEN es[i+1][4] = 1.0 AND cm1 IS NOT NULL
          AND es[i+1][1] - cm1 <= 172800.0 THEN es[i+1][1]
         ELSE cm2 END,
    -- constrained count DP (view -> click within 86400, reset on fire)
    CASE WHEN es[i+1][3] = 1.0 AND cc1 IS NOT NULL
          AND es[i+1][1] - cc1 <= 86400.0 THEN NULL
         WHEN es[i+1][2] = 1.0 THEN es[i+1][1] ELSE cc1 END,
    ccn + CASE WHEN es[i+1][3] = 1.0 AND cc1 IS NOT NULL
               AND es[i+1][1] - cc1 <= 86400.0 THEN 1 ELSE 0 END
  FROM walk WHERE i < len(es)),
fin AS (
  SELECT user_id,
    (CASE WHEN so1 IS NULL THEN 0 ELSE 1 END
     + CASE WHEN so2 IS NULL THEN 0 ELSE 1 END
     + CASE WHEN so3 IS NULL THEN 0 ELSE 1 END) AS wso,
    (CASE WHEN sd1 IS NULL THEN 0 ELSE 1 END
     + CASE WHEN sd2 IS NULL THEN 0 ELSE 1 END
     + CASE WHEN sd3 IS NULL THEN 0 ELSE 1 END) AS wsd,
    (CASE WHEN si1 IS NULL THEN 0 ELSE 1 END
     + CASE WHEN si2 IS NULL THEN 0 ELSE 1 END
     + CASE WHEN si3 IS NULL THEN 0 ELSE 1 END) AS wsi,
    CASE WHEN cm2 IS NULL THEN 0 ELSE 1 END AS cm, ccn AS cc
  FROM walk WHERE i = len(es))
SELECT u.user_id % 3 AS cohort,
  CAST(sum(f.wso) AS BIGINT) AS so_sum,
  CAST(sum(CASE WHEN f.wso >= 3 THEN 1 ELSE 0 END) AS BIGINT)
    AS so_full,
  CAST(sum(f.wsd) AS BIGINT) AS sd_sum,
  CAST(sum(f.wsi) AS BIGINT) AS si_sum,
  CAST(sum(f.cm) AS BIGINT) AS cm_sum,
  CAST(sum(f.cc) AS BIGINT) AS cc_sum,
  count(*) AS nu
FROM users u JOIN fin f ON u.user_id = f.user_id
GROUP BY u.user_id % 3
"""


QUERIES["ch_everyday_funcs36"] = Query(
    ch_everyday_funcs36, CH_EVERYDAY36_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs37(spark, sf_dir):
    """Everyday upstream-CH tier 37: largestTriangleThreeBuckets —
    Steinarsson's LTTB downsampling as a parametric aggregate (CH
    23.10+).  The oracle re-walks the same bucket sequence as a DuckDB
    recursive CTE (next-bucket list_avg anchor, first-max argmax via
    list_position) and both sides must select IDENTICAL points — the
    comparison sums the selected coordinates, so one differing pick
    breaks the hash."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e37")
    return eng.sql(
        "select o_orderstatus as st, "
        "round(aggregate(l, cast(0.0 as double), "
        "  (a, q) -> a + q._1), 2) as lx, "
        "round(aggregate(l, cast(0.0 as double), "
        "  (a, q) -> a + q._2), 2) as ly, "
        "size(l) as ln "
        "from (select o_orderstatus, "
        "largestTriangleThreeBuckets(20)(o_orderkey, o_totalprice) as l "
        "from ord_e37 group by o_orderstatus)"
    )


CH_EVERYDAY37_ORACLE = """
WITH RECURSIVE pts AS (
  SELECT o_orderstatus AS st,
         list_sort(list([o_orderkey::DOUBLE, o_totalprice::DOUBLE]))
           AS ps,
         count(*)::INTEGER AS n
  FROM orders GROUP BY 1),
walk AS (
  SELECT st, ps, n, 0 AS k, ps[1][1] AS px, ps[1][2] AS py,
         ps[1][1] AS sx, ps[1][2] AS sy
  FROM pts
  UNION ALL
  SELECT st, ps, n, kk, b[1], b[2], sx + b[1], sy + b[2]
  FROM (
    SELECT st, ps, n, kk, sx, sy,
           cand[list_position(areas, list_max(areas))] AS b
    FROM (
      SELECT st, ps, n, kk, px, py, sx, sy, cand,
        list_transform(cand, __q -> abs((px - ax) * (__q[2] - py)
                                  - (px - __q[1]) * (ay - py)))
          AS areas
      FROM (
        SELECT st, ps, n, kk, px, py, sx, sy,
          ps[2 + ((kk - 1) * (n - 2)) // 18 :
             1 + (kk * (n - 2)) // 18] AS cand,
          list_avg(list_transform(nb, __q -> __q[1])) AS ax,
          list_avg(list_transform(nb, __q -> __q[2])) AS ay
        FROM (
          SELECT st, ps, n, k + 1 AS kk, px, py, sx, sy,
            CASE WHEN k + 1 = 18 THEN ps[n:n]
                 ELSE ps[2 + ((k + 1) * (n - 2)) // 18 :
                        1 + ((k + 2) * (n - 2)) // 18] END AS nb
          FROM walk WHERE k < 18)))))
SELECT st, round(sx + ps[n][1], 2) AS lx, round(sy + ps[n][2], 2) AS ly,
       CAST(k + 2 AS INTEGER) AS ln
FROM walk WHERE k = 18
"""


QUERIES["ch_everyday_funcs37"] = Query(
    ch_everyday_funcs37, CH_EVERYDAY37_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs38(spark, sf_dir):
    """Everyday upstream-CH tier 38: sequenceNextNode over the events
    table — forward/head, forward/first_match and backward/last_match
    variants per user, rolled up by cohort as per-label counts.  The
    oracle recomputes each variant through DuckDB list indexing over
    alphabetically-coded event lists (codes ordered like the strings so
    tie sorts agree), a different encoding of the same walk."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("ev_e38")
    return eng.sql(
        "select user_id % 3 as cohort, "
        "count(a) as a_n, sum(if(a = 'purchase', 1, 0)) as a_p, "
        "sum(if(a = 'view', 1, 0)) as a_v, min(a) as a_min, "
        "count(b) as b_n, sum(if(b = 'error', 1, 0)) as b_e, "
        "max(b) as b_max, "
        "count(c) as c_n, sum(if(c = 'click', 1, 0)) as c_c, "
        "min(c) as c_min, count(*) as nu "
        "from (select user_id, "
        "sequenceNextNode('forward','head')(ts, event_type, "
        "  event_type = 'view', event_type = 'view', "
        "  event_type = 'click') as a, "
        "sequenceNextNode('forward','first_match')(ts, event_type, "
        "  event_type = 'view', event_type = 'view', "
        "  event_type = 'click') as b, "
        "sequenceNextNode('backward','last_match')(ts, event_type, "
        "  event_type = 'purchase', event_type = 'purchase') as c "
        "from ev_e38 group by user_id) "
        "group by user_id % 3"
    )


CH_EVERYDAY38_ORACLE = """
WITH ue AS (
  SELECT user_id, list_sort(list([epoch_us(ts)::DOUBLE / 1000000.0,
    CASE event_type WHEN 'click' THEN 1.0 WHEN 'error' THEN 2.0
      WHEN 'purchase' THEN 3.0 WHEN 'signup' THEN 4.0 ELSE 5.0
    END])) AS es
  FROM events GROUP BY user_id),
f AS (
  SELECT user_id, es, len(es) AS n,
    list_position(list_transform(es, __e -> __e[2] = 5.0), true)
      AS fmv,
    CASE WHEN list_position(list_transform(list_reverse(es),
        __e -> __e[2] = 3.0), true) = 0 THEN 0
      ELSE len(es) + 1 - list_position(list_transform(list_reverse(es),
        __e -> __e[2] = 3.0), true) END AS lmp
  FROM ue),
g AS (
  SELECT user_id,
    CASE WHEN n >= 3 AND es[1][2] = 5.0 AND es[2][2] = 1.0
         THEN es[3][2] END AS ac,
    CASE WHEN fmv >= 1 AND fmv + 2 <= n AND es[fmv + 1][2] = 1.0
         THEN es[fmv + 2][2] END AS bc,
    CASE WHEN lmp >= 2 THEN es[lmp - 1][2] END AS cc
  FROM f),
dec AS (
  SELECT user_id,
    CASE ac WHEN 1.0 THEN 'click' WHEN 2.0 THEN 'error'
      WHEN 3.0 THEN 'purchase' WHEN 4.0 THEN 'signup'
      WHEN 5.0 THEN 'view' END AS a,
    CASE bc WHEN 1.0 THEN 'click' WHEN 2.0 THEN 'error'
      WHEN 3.0 THEN 'purchase' WHEN 4.0 THEN 'signup'
      WHEN 5.0 THEN 'view' END AS b,
    CASE cc WHEN 1.0 THEN 'click' WHEN 2.0 THEN 'error'
      WHEN 3.0 THEN 'purchase' WHEN 4.0 THEN 'signup'
      WHEN 5.0 THEN 'view' END AS c
  FROM g)
SELECT user_id % 3 AS cohort,
  count(a) AS a_n,
  CAST(sum(CASE WHEN a = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
    AS a_p,
  CAST(sum(CASE WHEN a = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS a_v,
  min(a) AS a_min,
  count(b) AS b_n,
  CAST(sum(CASE WHEN b = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS b_e,
  max(b) AS b_max,
  count(c) AS c_n,
  CAST(sum(CASE WHEN c = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c_c,
  min(c) AS c_min, count(*) AS nu
FROM dec GROUP BY user_id % 3
"""


QUERIES["ch_everyday_funcs38"] = Query(
    ch_everyday_funcs38, CH_EVERYDAY38_ORACLE, ("dialect", "functions")
)


def _duck_base32(col: str) -> str:
    """RFC 4648 base32 of an ASCII column, re-derived in DuckDB from
    first principles: each output char reads a 16-bit window of the
    byte stream via ascii()/shift/mask (tier 39 oracle)."""
    alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    byte = (
        "(CASE WHEN (5 * (__k - 1)) // 8 + {o} <= length(" + col + ") "
        "THEN ascii(substr(" + col + ", ((5 * (__k - 1)) // 8 + {o})"
        "::INTEGER, 1)) ELSE 0 END)"
    )
    return (
        f"coalesce(array_to_string(list_transform("
        f"range(1, ((length({col}) + 4) // 5) * 8 + 1), __k -> "
        f"CASE WHEN __k <= (8 * length({col}) + 4) // 5 THEN "
        f"substr('{alpha}', ((({byte.format(o=1)} * 256 "
        f"+ {byte.format(o=2)}) "
        f">> (11 - ((5 * (__k - 1)) % 8)::INTEGER)) & 31)::INTEGER + 1, "
        f"1) ELSE '=' END), ''), '')"
    )


def _duck_bitslice_hex(col: str, off: int, ln: int) -> str:
    """hex(bitSlice(col, off, ln)) for an ASCII column re-derived in
    DuckDB: per output byte, eight bit reads off the ascii() byte
    stream with tail zero-padding (tier 39 oracle)."""
    L = f"least({ln}, 8 * length({col}) - {off} + 1)"
    bit = (
        f"(CASE WHEN (__j - 1) * 8 + __i <= {L} THEN "
        f"(ascii(substr({col}, (({off} + (__j - 1) * 8 + __i - 2) // 8 "
        f"+ 1)::INTEGER, 1)) >> (7 - (({off} + (__j - 1) * 8 + __i - 2) "
        f"% 8)::INTEGER)) & 1 ELSE 0 END)"
    )
    byte = (
        "(" + " + ".join(
            f"({bit.replace('__i', str(i))}) * {2 ** (8 - i)}"
            for i in range(1, 9)
        ) + ")"
    )
    return (
        f"array_to_string(list_transform(range(1, ({L} + 7) // 8 + 1), "
        f"__j -> upper(lpad(to_hex({byte}), 2, '0'))), '')"
    )


def ch_everyday_funcs39(spark, sf_dir):
    """Everyday upstream-CH tier 39: RFC 4648 base32 codecs and the
    bit-level substring over order priorities.  The oracle re-derives
    the base32 text and the bit windows from first principles in DuckDB
    (ascii()/shift/mask windows) — not by echoing the engine; the
    round-trip column only counts internal decode(encode(x)) = x
    consistency."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e39")
    return eng.sql(
        "select st, min(e) as b32min, max(e) as b32max, "
        "sum(if(tryBase32Decode(e) = p, 1, 0)) as rt, "
        "count(tryBase32Decode('1!bad')) as tn, "
        "count(distinct h) as bsn, min(h) as bsmin, max(h) as bsmax "
        "from (select o_orderstatus as st, o_orderpriority as p, "
        "base32Encode(o_orderpriority) as e, "
        "hex(bitSlice(o_orderpriority, 3, 12)) as h from ord_e39) "
        "group by st"
    )


CH_EVERYDAY39_ORACLE = f"""
SELECT o_orderstatus AS st,
  min({_duck_base32('o_orderpriority')}) AS b32min,
  max({_duck_base32('o_orderpriority')}) AS b32max,
  count(*) AS rt,
  CAST(0 AS BIGINT) AS tn,
  count(DISTINCT {_duck_bitslice_hex('o_orderpriority', 3, 12)})
    AS bsn,
  min({_duck_bitslice_hex('o_orderpriority', 3, 12)}) AS bsmin,
  max({_duck_bitslice_hex('o_orderpriority', 3, 12)}) AS bsmax
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs39"] = Query(
    ch_everyday_funcs39, CH_EVERYDAY39_ORACLE, ("dialect", "functions")
)


def ch_everyday_funcs40(spark, sf_dir):
    """Everyday upstream-CH tier 40: the case-insensitive text-search
    family, ordered subsequence search, hasTokenOrNull validation, and
    coarse HTML text extraction over order priorities.  The oracle
    re-derives each in DuckDB: regexp_extract_all counting, strpos
    cascades for the subsequence checks (no lambda folds), token lists
    via string_split_regex, and the same documented HTML-stripping
    spec through RE2 with explicit global flags."""
    eng = TensorBaseEngine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("ord_e40")
    return eng.sql(
        "select o_orderstatus as st, "
        "sum(countMatchesCaseInsensitive(o_orderpriority, 'e')) as cm, "
        "sum(countSubstringsCaseInsensitive(o_orderpriority, 'E')) "
        "  as cs, "
        "sum(positionCaseInsensitiveUTF8(o_orderpriority, 'eNT')) "
        "  as pos, "
        "sum(multiSearchFirstPositionCaseInsensitive(o_orderpriority, "
        "  array('gent', 'LOW', 'med'))) as mf, "
        "sum(if(hasTokenOrNull(o_orderpriority, 'URGENT'), 1, 0)) "
        "  as ht, "
        "count(hasTokenOrNull(o_orderpriority, 'a-b')) as htn, "
        "sum(hasSubsequence(o_orderpriority, 'UET')) as hs, "
        "sum(hasSubsequenceCaseInsensitive(o_orderpriority, 'nT')) "
        "  as hsc, "
        "min(extractTextFromHTML(concat('<p>', o_orderpriority, "
        "  ' &amp; co</p><script>x</script>'))) as et "
        "from ord_e40 group by o_orderstatus"
    )


CH_EVERYDAY40_ORACLE = """
SELECT o_orderstatus AS st,
  CAST(sum(len(regexp_extract_all(o_orderpriority, '(?i)e', 0)))
    AS BIGINT) AS cm,
  CAST(sum((length(o_orderpriority)
      - length(replace(lower(o_orderpriority), 'e', '')))) AS BIGINT)
    AS cs,
  CAST(sum(strpos(lower(o_orderpriority), 'ent')) AS BIGINT) AS pos,
  CAST(sum(coalesce(list_min(list_filter(
      [strpos(lower(o_orderpriority), 'gent'),
       strpos(lower(o_orderpriority), 'low'),
       strpos(lower(o_orderpriority), 'med')], __p -> __p > 0)), 0))
    AS BIGINT) AS mf,
  CAST(sum(CASE WHEN list_contains(list_filter(
      string_split_regex(o_orderpriority, '[^A-Za-z0-9]+'),
      __x -> __x <> ''), 'URGENT') THEN 1 ELSE 0 END) AS BIGINT) AS ht,
  CAST(0 AS BIGINT) AS htn,
  CAST(sum(CASE WHEN strpos(o_orderpriority, 'U') > 0
      AND strpos(substr(o_orderpriority,
                        strpos(o_orderpriority, 'U') + 1), 'E') > 0
      AND strpos(substr(substr(o_orderpriority,
                               strpos(o_orderpriority, 'U') + 1),
                 strpos(substr(o_orderpriority,
                               strpos(o_orderpriority, 'U') + 1), 'E')
                 + 1), 'T') > 0
    THEN 1 ELSE 0 END) AS BIGINT) AS hs,
  CAST(sum(CASE WHEN strpos(lower(o_orderpriority), 'n') > 0
      AND strpos(substr(lower(o_orderpriority),
                        strpos(lower(o_orderpriority), 'n') + 1), 't')
          > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hsc,
  min(trim(regexp_replace(
    replace(replace(replace(replace(replace(
      regexp_replace(
        regexp_replace(
          '<p>' || o_orderpriority || ' &amp; co</p><script>x</script>',
          '(?is)<script\\b.*?</script\\s*>|<style\\b.*?</style\\s*>|<!--.*?-->',
          ' ', 'g'),
        '(?s)<[^>]*>', ' ', 'g'),
      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
      '&amp;', '&'),
    '\\s+', ' ', 'g'))) AS et
FROM orders GROUP BY o_orderstatus
"""


QUERIES["ch_everyday_funcs40"] = Query(
    ch_everyday_funcs40, CH_EVERYDAY40_ORACLE, ("dialect", "functions")
)
