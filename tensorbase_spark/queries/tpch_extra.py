"""Remaining TPC-H query shapes (Q2/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20/Q21/Q22),
adapted to the driver's simplified star schema.

The testdata has no ``partsupp`` table and no commit/receipt dates, so the
part-supplier relation is derived from ``lineitem`` (distinct (l_partkey,
l_suppkey) pairs) and "late" is defined as shipping >90 days after the order
date.  Each adaptation preserves the *operator shape* the original query
exercises — correlated scalar subqueries, NOT IN -> anti join, double
correlated EXISTS/NOT EXISTS, scalar-vs-group HAVING — which is what the
reference's engine would have to plan (DataFusion 6 cannot: SURVEY §2.3
"IN (subquery) -> runtime error"; Catalyst plans all of these natively).

Scale notes (local[32] here, 1000 executors / 100 TB in production):
- all dimension joins broadcast (part/supplier/customer/nation/region);
- per-order and per-part aggregates shuffle once on a near-uniform key;
- Q21 uses collect_set window functions over the orderkey partition so the
  per-order supplier census and the late-row filter share ONE shuffle
  instead of a self-join (two scans + two shuffles);
- scalar thresholds (Q11/Q17/Q22) are tiny aggregate results joined back by
  broadcast — no driver-side collect in any query.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tensorbase_spark.queries import Query
from tensorbase_spark.sources.tables import load_table


def _r2(c):
    return F.round(c, 2)


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: min-per-group correlated subquery -> window min.
    Unit cost is derived from lineitem (avg sale price per part+supplier)
    since the schema has no partsupp (TESTDATA.md)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    costs = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(_r2(F.avg(F.col("l_extendedprice") / F.col("l_quantity"))).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


Q2_ORACLE = """
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         round(avg(l_extendedprice / l_quantity), 2) AS unit_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM costs
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
QUALIFY unit_cost = min(unit_cost) OVER (PARTITION BY p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: national market share within a region — nation joined
    twice (customer side gates the region, supplier side is the measure)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(F.lit(0.0)))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_5'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN part      ON l_partkey = p_partkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation x year over a part-name
    substring filter (profit has no supplycost term — no partsupp table).
    Amounts are cast to DECIMAL(18,4) per term and summed exactly: the true
    line amounts have <=4 decimals, so the double->decimal cast is ~1e-13
    from the decimal value (never at a rounding boundary) and the decimal
    sums are bit-identical across engines regardless of summation order —
    double sums here straddled half-cent boundaries between Spark/DuckDB."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("gear"))
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")),
                2,
            )
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_ORACLE = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


def q11_important_part_share(spark, sf_dir):
    """TPC-H Q11 shape: per-group value filtered against a scalar fraction of
    the global total (HAVING vs scalar subquery).  Value = part revenue from
    lineitem (no partsupp stock to value)."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("raw_value")
    )
    threshold = pr.agg((F.sum("raw_value") * F.lit(0.00065)).alias("cutoff"))
    return (
        pr.crossJoin(F.broadcast(threshold))
        .filter(F.col("raw_value") > F.col("cutoff"))
        .select(F.col("l_partkey").alias("partkey"), _r2(F.col("raw_value")).alias("value"))
        .orderBy(F.col("value").desc(), "partkey")
    )


Q11_ORACLE = """
WITH pr AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS raw_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey AS partkey, round(raw_value, 2) AS value
FROM pr
WHERE raw_value > (SELECT sum(raw_value) * 0.00065 FROM pr)
ORDER BY value DESC, partkey
"""


def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left join with an extra ON-clause predicate, then a
    two-level aggregation (orders per customer -> customers per order
    count).  Customers with zero qualifying orders must appear (c_count=0)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: aggregate view + scalar max + equality join back.
    Revenue is rounded to 2 decimals BEFORE the max comparison so the
    equality is stable across engines (double summation order differs)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_relationship(spark, sf_dir):
    """TPC-H Q16 shape: NOT IN subquery -> left-anti join + count(DISTINCT)
    per attribute triple.  The part-supplier relation comes from lineitem
    (distinct pairs) since the schema has no partsupp."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) gating
    the fact rows -> per-key aggregate joined back (one extra shuffle over
    the same key, no correlated re-execution)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_cutoff")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(thresholds), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(_r2(F.sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape: IN over an aggregated-HAVING subquery -> left-semi
    join against a groupBy+filter result."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    supp = load_table(spark, sf_dir, "supplier")
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 100
)
ORDER BY s_suppkey
"""


def q21_suppliers_kept_waiting(spark, sf_dir):
    """TPC-H Q21 shape: double correlated EXISTS / NOT EXISTS.  "Late" =
    shipped >90 days after the order date (the schema has no receipt or
    commit dates).  Instead of two correlated self-joins, the per-order
    supplier census (all suppliers + late suppliers) is computed with
    collect_set window functions over ONE shuffle on l_orderkey; the EXISTS
    pair becomes "order has >=2 suppliers AND exactly 1 late supplier"."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    w = Window.partitionBy("l_orderkey")
    flagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("is_late", late)
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)),
        )
    )
    return (
        flagged.filter(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: scalar-average gate + NOT EXISTS -> anti join.
    Country code = c_nationkey % 5 (the schema has no phone column);
    "no orders" = no orders since 2000-01-01 (every customer has at least
    one lifetime order in the synthetic data)."""
    cust = load_table(spark, sf_dir, "customer").filter((F.col("c_nationkey") % 5).isin(0, 1, 2))
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("abal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("abal"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(F.count("*").alias("numcust"), _r2(F.sum("c_acctbal")).alias("totacctbal"))
        .orderBy("cntrycode")
    )


Q22_ORACLE = """
SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM (
  SELECT c_nationkey % 5 AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE c_nationkey % 5 IN (0, 1, 2)
    AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                     WHERE c_acctbal > 0 AND c_nationkey % 5 IN (0, 1, 2))
) cand
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = cand.c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""


QUERIES = {
    "q2_min_cost_supplier": Query(q2_min_cost_supplier, Q2_ORACLE, ("tpch", "subquery")),
    "q8_market_share": Query(q8_market_share, Q8_ORACLE, ("tpch", "join")),
    "q9_product_type_profit": Query(q9_product_type_profit, Q9_ORACLE, ("tpch", "join"), bench=True),
    "q11_important_part_share": Query(q11_important_part_share, Q11_ORACLE, ("tpch", "subquery")),
    "q13_customer_distribution": Query(q13_customer_distribution, Q13_ORACLE, ("tpch", "join")),
    "q15_top_supplier": Query(q15_top_supplier, Q15_ORACLE, ("tpch", "subquery")),
    "q16_supplier_relationship": Query(q16_supplier_relationship, Q16_ORACLE, ("tpch", "join")),
    "q17_small_quantity_revenue": Query(q17_small_quantity_revenue, Q17_ORACLE, ("tpch", "subquery")),
    "q20_potential_promotion": Query(q20_potential_promotion, Q20_ORACLE, ("tpch", "subquery")),
    "q21_suppliers_kept_waiting": Query(q21_suppliers_kept_waiting, Q21_ORACLE, ("tpch", "subquery"), bench=True),
    "q22_global_sales_opportunity": Query(q22_global_sales_opportunity, Q22_ORACLE, ("tpch", "subquery")),
}
