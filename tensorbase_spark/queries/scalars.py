"""DataFusion-builtin scalar/aggregate surface (SURVEY.md §2.6a) not covered
by chfuncs.py: regex, crypto hashes, date_part/date_trunc, misc string ops,
plus the fork-only aggregates approx_distinct (HLL) and array_agg.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tensorbase_spark.queries import Query
from tensorbase_spark.sources.tables import load_table


def regex_funcs(spark, sf_dir):
    """regexp_match/regexp_replace (regex_expressions.rs) over document text."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"(\w+)", 1).alias("first_word"),
        F.regexp_replace(F.col("text"), r"\s+", "_").alias("squashed"),
        F.col("text").rlike("join").alias("mentions_join"),
    ).filter(F.col("doc_id") % 5 == 0)


REGEX_ORACLE = r"""
SELECT doc_id,
       coalesce(regexp_extract(text, '(\w+)', 1), '') AS first_word,
       regexp_replace(text, '\s+', '_', 'g')          AS squashed,
       regexp_matches(text, 'join')                   AS mentions_join
FROM documents WHERE doc_id % 5 = 0
"""


def crypto_hash_funcs(spark, sf_dir):
    """md5/sha2 digests (crypto_expressions.rs:339).  The engine supports the
    full sha224/384/512 family via F.sha2; the oracle checks the md5/sha256
    subset DuckDB implements, plus a chained double-hash."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name")).alias("h_md5"),
        F.sha2(F.col("c_name"), 256).alias("h_sha256"),
        F.md5(F.sha2(F.col("c_name"), 256)).alias("h_double"),
    )


CRYPTO_ORACLE = """
SELECT c_custkey,
       md5(c_name)              AS h_md5,
       sha256(c_name)           AS h_sha256,
       md5(sha256(c_name))      AS h_double
FROM customer
"""


def datetime_extract_trunc(spark, sf_dir):
    """date_part/date_trunc (datetime_expressions.rs:514)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_id") % 9 == 0).select(
        "event_id",
        F.date_part(F.lit("year"), F.col("ts")).alias("py"),
        F.date_part(F.lit("hour"), F.col("ts")).alias("ph"),
        F.date_trunc("day", F.col("ts")).alias("t_day"),
        F.date_trunc("minute", F.col("ts")).alias("t_min"),
    )


DATETIME_EXTRACT_ORACLE = """
SELECT event_id,
       CAST(date_part('year', CAST(ts AS TIMESTAMP)) AS INT) AS py,
       CAST(date_part('hour', CAST(ts AS TIMESTAMP)) AS INT) AS ph,
       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS t_day,
       date_trunc('minute', CAST(ts AS TIMESTAMP)) AS t_min
FROM events WHERE event_id % 9 = 0
"""


def string_parts_funcs(spark, sf_dir):
    """split_part/strpos/translate/left/right/repeat/initcap/ascii/chr/btrim
    (string_expressions.rs:593, unicode_expressions.rs:531)."""
    o = load_table(spark, sf_dir, "orders")
    pr = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.split_part(pr, F.lit("-"), F.lit(2)).alias("prio_word"),
        F.instr(pr, "-").alias("dash_pos"),
        F.translate(pr, "-", "_").alias("prio_us"),
        F.substring(pr, 1, 1).alias("prio_digit"),
        F.initcap(F.lower(pr)).alias("prio_title"),
        F.ascii(pr).alias("prio_ascii"),
        F.repeat(F.substring(pr, 1, 1), 3).alias("digit3"),
        F.btrim(pr, F.lit("15")).alias("trim15"),
    ).filter(F.col("o_orderkey") % 20 == 0)


STRING_PARTS_ORACLE = """
SELECT o_orderkey,
       split_part(o_orderpriority, '-', 2)            AS prio_word,
       CAST(strpos(o_orderpriority, '-') AS INT)      AS dash_pos,
       translate(o_orderpriority, '-', '_')           AS prio_us,
       substring(o_orderpriority, 1, 1)               AS prio_digit,
       -- initcap: capitalize each word
       list_aggregate(list_transform(string_split(lower(o_orderpriority), ' '),
           w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS prio_title,
       CAST(ascii(o_orderpriority) AS INT)            AS prio_ascii,
       repeat(substring(o_orderpriority, 1, 1), 3)    AS digit3,
       trim(o_orderpriority, '15')                    AS trim15
FROM orders WHERE o_orderkey % 20 = 0
"""


def nullif_coalesce(spark, sf_dir):
    """nullif + coalesce (array_expressions.rs misc surface)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(bldg)")
        ).alias("seg_disp"),
        F.round(F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)), 2).alias("bal"),
    )


NULLIF_ORACLE = """
SELECT c_custkey,
       nullif(c_mktsegment, 'BUILDING')                         AS seg_nb,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)')     AS seg_disp,
       round(coalesce(nullif(c_acctbal, 0.0), -1.0), 2)         AS bal
FROM customer
"""


def agg_approx_distinct(spark, sf_dir):
    """approx_distinct — HyperLogLog (expressions/approx_distinct.rs:44,
    physical_plan/hyperloglog/).  Approximate by construction -> no SQL
    oracle; correctness is bounded-error vs exact (tested in
    tests/test_queries.py), the driver records a rows-only check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


def agg_approx_distinct_check(spark, sf_dir):
    """Driver-evidence companion for the HLL family (r2 verdict #5): emit
    the EXACT distinct count (oracle-checkable) plus a boolean asserting the
    HLL estimate landed within 10% of it.  Spark's HLL is deterministic for
    a given dataset, so the boolean is stable; the oracle computes the exact
    side and claims TRUE — a hash match therefore certifies the HLL error
    bound cross-engine instead of the rows-only check the raw operator
    gets.  (Default rsd=0.05; the 10% gate leaves 2 sigma of headroom.)"""
    li = load_table(spark, sf_dir, "lineitem")
    exact_parts = F.countDistinct("l_partkey")
    exact_orders = F.countDistinct("l_orderkey")
    return li.groupBy("l_returnflag").agg(
        exact_parts.alias("exact_parts"),
        exact_orders.alias("exact_orders"),
        (
            F.abs(F.approx_count_distinct("l_partkey") - exact_parts)
            <= 0.10 * exact_parts
        ).alias("hll_parts_ok"),
        (
            F.abs(F.approx_count_distinct("l_orderkey") - exact_orders)
            <= 0.10 * exact_orders
        ).alias("hll_orders_ok"),
    )


APPROX_DISTINCT_CHECK_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey)  AS exact_parts,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS hll_parts_ok,
       TRUE AS hll_orders_ok
FROM lineitem GROUP BY l_returnflag
"""


def agg_array_collect(spark, sf_dir):
    """array_agg (expressions/array_agg.rs) == collect_list; sorted for
    determinism, then re-expanded to scalar stats so the hash is stable."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.sort_array(F.collect_list("o_orderkey")).alias("orders"))
        .select(
            "o_custkey",
            F.size("orders").alias("n"),
            F.element_at("orders", 1).alias("first_order"),
            F.element_at("orders", -1).alias("last_order"),
        )
    )


ARRAY_AGG_ORACLE = """
SELECT o_custkey, CAST(len(l) AS INT) AS n, l[1] AS first_order, l[-1] AS last_order
FROM (SELECT o_custkey, list_sort(list(o_orderkey)) AS l FROM orders GROUP BY o_custkey)
"""


def grouping_sets_rollup(spark, sf_dir):
    """ROLLUP — absent from the reference entirely (SURVEY §2.5 'not
    implemented'), free in Spark; included as the §7-step-8 bonus."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("ls"),
            "n",
            "qty",
        )
    )


ROLLUP_ORACLE = """
SELECT coalesce(l_returnflag, '<all>') AS rf,
       coalesce(l_linestatus, '<all>') AS ls,
       count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def pivot_status(spark, sf_dir):
    """PIVOT — not in the reference; Spark-native wide aggregation."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
        )
    )


PIVOT_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
FROM orders GROUP BY o_orderpriority
"""


def math_trig_funcs(spark, sf_dir):
    """Trig/log tail of the math surface: sin/cos/tan/asin/acos/atan/log2/
    signum (math_expressions.rs:231; name map functions.rs:410-430).  The
    dialect layer maps DataFusion's log->log10 (functions.rs:749) and
    trunc->toward-zero truncation; both exercised here via the same Column
    expressions engine.sql would produce."""
    s = load_table(spark, sf_dir, "supplier")
    x = (F.col("s_acctbal") % 1000.0) / 1000.0  # in (-1, 1): asin/acos-safe
    return s.select(
        "s_suppkey",
        F.round(F.sin(x), 6).alias("sin_x"),
        F.round(F.cos(x), 6).alias("cos_x"),
        F.round(F.tan(x), 6).alias("tan_x"),
        F.round(F.asin(x), 6).alias("asin_x"),
        F.round(F.acos(x), 6).alias("acos_x"),
        F.round(F.atan(x), 6).alias("atan_x"),
        F.round(F.log2(F.col("s_suppkey") + 1), 6).alias("log2_k"),
        F.round(F.log10(F.col("s_suppkey") + 1), 6).alias("log10_k"),
        F.signum(F.col("s_acctbal")).alias("sign_bal"),
        (F.col("s_acctbal").cast("bigint").cast("double")).alias("trunc_bal"),
    )


MATH_TRIG_ORACLE = """
SELECT s_suppkey,
       round(sin(s_acctbal % 1000.0 / 1000.0), 6)  AS sin_x,
       round(cos(s_acctbal % 1000.0 / 1000.0), 6)  AS cos_x,
       round(tan(s_acctbal % 1000.0 / 1000.0), 6)  AS tan_x,
       round(asin(s_acctbal % 1000.0 / 1000.0), 6) AS asin_x,
       round(acos(s_acctbal % 1000.0 / 1000.0), 6) AS acos_x,
       round(atan(s_acctbal % 1000.0 / 1000.0), 6) AS atan_x,
       round(log2(s_suppkey + 1), 6)               AS log2_k,
       round(log10(s_suppkey + 1), 6)              AS log10_k,
       CAST(sign(s_acctbal) AS DOUBLE)             AS sign_bal,
       CAST(trunc(s_acctbal) AS DOUBLE)            AS trunc_bal
FROM supplier
"""


def string_width_funcs(spark, sf_dir):
    """Length/pad/trim/position tail of the string surface: bit_length,
    char_length, octet_length, ltrim/rtrim, rpad, substr, strpos->locate,
    to_hex->hex, chr (string_expressions.rs:593, unicode_expressions.rs:531)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        F.bit_length("p_name").alias("bits"),
        F.char_length("p_name").alias("chars"),
        F.octet_length("p_name").alias("octets"),
        F.ltrim(F.rtrim(F.col("p_name"))).alias("trimmed"),
        F.rpad(F.col("p_brand"), 12, ".").alias("padded"),
        F.substring("p_name", 3, 8).alias("sub"),
        F.locate(" ", F.col("p_name")).alias("pos_space"),
        F.hex(F.col("p_partkey")).alias("hexkey"),
        F.expr("char(ascii(p_name))").alias("first_ch"),
    )


STRING_WIDTH_ORACLE = """
SELECT p_partkey,
       CAST(bit_length(p_name) AS INT)           AS bits,
       CAST(length(p_name) AS INT)               AS chars,
       CAST(octet_length(encode(p_name)) AS INT) AS octets,
       ltrim(rtrim(p_name))                      AS trimmed,
       rpad(p_brand, 12, '.')                    AS padded,
       substring(p_name, 3, 8)                   AS sub,
       CAST(strpos(p_name, ' ') AS INT)          AS pos_space,
       to_hex(p_partkey)                         AS hexkey,
       chr(ascii(p_name))                        AS first_ch
FROM part WHERE p_partkey % 7 = 0
"""


def timestamp_family(spark, sf_dir):
    """to_timestamp_{seconds,millis,micros} constructors plus the volatile
    pair now()/random() reduced to deterministic predicates
    (datetime_expressions.rs:514; volatility functions.rs:375-380)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    secs = F.col("o_orderdate").cast("timestamp").cast("long")
    return o.select(
        "o_orderkey",
        F.timestamp_seconds(secs).alias("ts_s"),
        F.timestamp_millis(secs * 1000).alias("ts_ms"),
        F.timestamp_micros(secs * 1000000).alias("ts_us"),
        (F.now() >= F.lit("2020-01-01").cast("timestamp")).alias("now_ok"),
        F.rand().between(0.0, 1.0).alias("rand_ok"),
    )


TIMESTAMP_FAMILY_ORACLE = """
SELECT o_orderkey,
       make_timestamp(epoch(CAST(o_orderdate AS TIMESTAMP))::BIGINT * 1000000) AS ts_s,
       epoch_ms(epoch(CAST(o_orderdate AS TIMESTAMP))::BIGINT * 1000)          AS ts_ms,
       make_timestamp(epoch(CAST(o_orderdate AS TIMESTAMP))::BIGINT * 1000000) AS ts_us,
       now() >= TIMESTAMP '2020-01-01'                                         AS now_ok,
       random() BETWEEN 0.0 AND 1.0                                            AS rand_ok
FROM orders WHERE o_orderkey % 11 = 0
"""


def agg_quantiles(spark, sf_dir):
    """Exact interpolated quantiles (Spark percentile == DuckDB
    quantile_cont) per group — the reference fork has no quantile aggregate
    at all; Spark's is exact and distributed."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.percentile("l_quantity", [0.25, 0.5, 0.75, 0.9]).alias("qs"))
        .select(
            "l_returnflag",
            F.round(F.col("qs")[0], 4).alias("q25"),
            F.round(F.col("qs")[1], 4).alias("q50"),
            F.round(F.col("qs")[2], 4).alias("q75"),
            F.round(F.col("qs")[3], 4).alias("q90"),
        )
    )


QUANTILES_ORACLE = """
WITH q AS (
  SELECT l_returnflag, quantile_cont(l_quantity, [0.25, 0.5, 0.75, 0.9]) AS qs
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, round(qs[1], 4) AS q25, round(qs[2], 4) AS q50,
       round(qs[3], 4) AS q75, round(qs[4], 4) AS q90
FROM q
"""


def agg_top_k_words(spark, sf_dir):
    """Corpus heavy hitters: explode -> count -> top 20 (ClickHouse topK's
    exact sibling; partial aggregation collapses per-partition counts before
    the shuffle, so this scales to any vocabulary)."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
    return (
        w.groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


TOP_K_WORDS_ORACLE = r"""
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents)
GROUP BY word ORDER BY n DESC, word LIMIT 20
"""


def array_functions(spark, sf_dir):
    """Nested-array surface (array_expressions.rs + Spark higher-order
    functions): construct, aggregate, filter, sort, contains."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    arr = F.array("l_quantity", "l_discount", "l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x), 4).alias("arr_sum"),
        F.size(F.filter(arr, lambda x: x > 0.1)).alias("n_gt"),
        F.round(F.element_at(F.array_sort(arr), -1), 4).alias("arr_max"),
        F.array_contains(arr, F.lit(0.0)).alias("has_zero"),
    )


ARRAY_FUNCS_ORACLE = """
WITH t AS (
  SELECT l_orderkey, l_linenumber, [l_quantity, l_discount, l_tax] AS arr
  FROM lineitem WHERE l_orderkey % 500 = 0
)
SELECT l_orderkey, l_linenumber,
       round(list_aggregate(arr, 'sum'), 4)         AS arr_sum,
       CAST(len(list_filter(arr, x -> x > 0.1)) AS INT) AS n_gt,
       round(list_sort(arr)[3], 4)                  AS arr_max,
       list_contains(arr, 0.0)                      AS has_zero
FROM t
"""


QUERIES = {
    "regex_funcs": Query(regex_funcs, REGEX_ORACLE, ("scalar", "regex")),
    "crypto_hash_funcs": Query(crypto_hash_funcs, CRYPTO_ORACLE, ("scalar", "crypto")),
    "datetime_extract_trunc": Query(datetime_extract_trunc, DATETIME_EXTRACT_ORACLE, ("scalar", "datetime")),
    "string_parts_funcs": Query(string_parts_funcs, STRING_PARTS_ORACLE, ("scalar", "string")),
    "nullif_coalesce": Query(nullif_coalesce, NULLIF_ORACLE, ("scalar",)),
    "agg_approx_distinct": Query(agg_approx_distinct, None, ("agg", "approx")),
    "agg_approx_distinct_check": Query(
        agg_approx_distinct_check, APPROX_DISTINCT_CHECK_ORACLE, ("agg", "approx")
    ),
    "agg_array_collect": Query(agg_array_collect, ARRAY_AGG_ORACLE, ("agg",)),
    "grouping_sets_rollup": Query(grouping_sets_rollup, ROLLUP_ORACLE, ("agg", "bonus")),
    "pivot_status": Query(pivot_status, PIVOT_ORACLE, ("agg", "bonus")),
    "math_trig_funcs": Query(math_trig_funcs, MATH_TRIG_ORACLE, ("scalar", "math")),
    "string_width_funcs": Query(string_width_funcs, STRING_WIDTH_ORACLE, ("scalar", "string")),
    "timestamp_family": Query(timestamp_family, TIMESTAMP_FAMILY_ORACLE, ("scalar", "datetime")),
    "agg_quantiles": Query(agg_quantiles, QUANTILES_ORACLE, ("agg", "stats")),
    "agg_top_k_words": Query(agg_top_k_words, TOP_K_WORDS_ORACLE, ("agg", "text")),
    "array_functions": Query(array_functions, ARRAY_FUNCS_ORACLE, ("scalar", "array")),
}
