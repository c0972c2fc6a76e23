"""Relational operator coverage (SURVEY.md §2.3-2.5, §2.8-2.9).

Each query exercises one operator family the reference reaches through its
wire (BQL grammar + DataFusion 6) and is written DataFrame-first so Catalyst
plans it: filters/projections push into the Parquet scan, small dimension
tables are broadcast, aggregates run partial->final automatically.

Scale notes (local[32] here, 1000 executors at 100 TB):
- every dim join uses F.broadcast -> no shuffle of the fact side;
- fact-fact joins (orders x lineitem) shuffle on the join key — the key is
  near-uniform (orderkey), so no salting needed; AQE handles residual skew;
- aggregates group on low-cardinality keys -> partial aggregation collapses
  almost all rows map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tensorbase_spark.queries import Query
from tensorbase_spark.sources.tables import load_table


def _r2(c):
    return F.round(c, 2)


# --- TPC-H-style headline queries ------------------------------------------

def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan + filter + groupBy agg (reference runs exactly this
    family through HashAggregateExec, crates/datafusion/src/physical_plan/
    hash_aggregate.rs:78)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r2(F.sum(disc_price)).alias("sum_disc_price"),
            _r2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r2(F.avg("l_quantity")).alias("avg_qty"),
            _r2(F.avg("l_extendedprice")).alias("avg_price"),
            _r2(F.avg("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 2)                                        AS avg_qty,
       round(avg(l_extendedprice), 2)                                   AS avg_price,
       round(avg(l_discount), 2)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + tie-free top-k.  customer is a dim
    -> broadcast; orders/lineitem co-shuffle on orderkey."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    # Join order matters without CBO: reduce orders by the BUILDING-segment
    # customers FIRST (5x selectivity), so the side entering the big
    # lineitem join is as small as possible — at sf0.1 AQE then broadcasts
    # the reduced orders side and lineitem never shuffles for the join; at
    # 100 TB it degrades gracefully to the same single orderkey co-shuffle
    # the naive order pays (r2 verdict #4).
    ord_cust = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return (
        li.join(ord_cust, li.l_orderkey == ord_cust.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join with all dims broadcast; only the
    orders-lineitem edge shuffles."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_ORACLE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- filters / predicates (§2.3) -------------------------------------------

def filter_predicates(spark, sf_dir):
    """= <> < <= > >= AND OR NOT over lineitem; projection pruning.
    Reference: FilterExec (physical_plan/filter.rs:45), binary predicates
    (bql.pest:257)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 40)
            & (F.col("l_returnflag") != "A")
            & ((F.col("l_discount") > 0.05) | (F.col("l_tax") < 0.03))
            & ~(F.col("l_linestatus") == "X")
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


FILTER_PRED_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_quantity >= 10 AND l_quantity <= 40
  AND l_returnflag <> 'A'
  AND (l_discount > 0.05 OR l_tax < 0.03)
  AND NOT (l_linestatus = 'X')
"""


def between_in_null(spark, sf_dir):
    """BETWEEN (bql.pest:262), IN const-list (bql.pest:258, in_list.rs),
    IS [NOT] NULL (is_null.rs)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_totalprice").between(1000, 200000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_custkey").isNotNull()
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


BETWEEN_IN_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice BETWEEN 1000 AND 200000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_custkey IS NOT NULL
"""


def case_cast(spark, sf_dir):
    """CASE WHEN (expressions/case.rs) + CAST (expressions/cast.rs)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, F.lit("small"))
        .when(F.col("l_quantity") < 30, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("qty_class"),
        F.col("l_quantity").cast("long").alias("qty_int"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_str"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )


CASE_CAST_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity < 10 THEN 'small'
            WHEN l_quantity < 30 THEN 'medium'
            ELSE 'large' END                       AS qty_class,
       CAST(l_quantity AS BIGINT)                  AS qty_int,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
       CAST(l_shipdate AS DATE)                    AS ship_day
FROM lineitem
"""


# --- joins (§2.4) -----------------------------------------------------------

def join_inner_agg(spark, sf_dir):
    """Equi hash join (hash_join.rs:102) with CollectLeft mode == Spark
    broadcast join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            _r2(F.sum("o_totalprice")).alias("total_rev"),
        )
        .orderBy("c_mktsegment")
    )


JOIN_INNER_ORACLE = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_rev
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def join_left_count(spark, sf_dir):
    """LEFT OUTER join (bql.pest:189 allows left [outer]); customers with zero
    orders kept."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


JOIN_LEFT_ORACLE = """
SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


def join_right_full(spark, sf_dir):
    """RIGHT/FULL outer joins — fork-only in the reference
    (logical_plan/plan.rs:41-44), free in Spark.  Full outer nation||customer
    nationkeys to surface unmatched sides."""
    n = load_table(spark, sf_dir, "nation")
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "full_outer")
        .select(
            F.col("n_nationkey"),
            F.col("n_name"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        )
    )


JOIN_FULL_ORACLE = """
SELECT n_nationkey, n_name, coalesce(n_cust, 0) AS n_cust
FROM nation FULL JOIN (
  SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey
) c ON n_nationkey = c_nationkey
"""


def join_cross_filter(spark, sf_dir):
    """Cross join (cross_join.rs:53; comma-join bql.pest:185) + theta filter —
    the reference's only non-equi-join strategy (SURVEY §2.4)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .select("r_name", "n_name")
    )


JOIN_CROSS_ORACLE = """
SELECT r_name, n_name FROM region, nation WHERE n_regionkey <> r_regionkey
"""


def join_semi(spark, sf_dir):
    """LEFT SEMI — fork uses it for INTERSECT (logical_plan/builder.rs:815-827);
    also the plan for IN-subquery, which DataFusion 6 cannot run (SURVEY §2.3
    gap) but Spark can."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


JOIN_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
"""


def join_anti(spark, sf_dir):
    """LEFT ANTI — fork's EXCEPT building block (builder.rs:829-841).
    Anti-joins against the high-value order subset so the result is non-empty
    on the driver's fixtures (every customer has *some* order)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


JOIN_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
"""


def join_using(spark, sf_dir):
    """USING(col) form (bql.pest:180-188) — resolved to equi-join; here the
    shared key name is produced by aliasing."""
    s = load_table(spark, sf_dir, "supplier").withColumnRenamed("s_nationkey", "nationkey")
    n = load_table(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "nationkey")
    return s.join(F.broadcast(n), "nationkey").select("s_suppkey", "s_name", "n_name")


JOIN_USING_ORACLE = """
SELECT s_suppkey, s_name, n_name
FROM (SELECT s_suppkey, s_name, s_nationkey AS nationkey FROM supplier) s
JOIN (SELECT n_name, n_nationkey AS nationkey FROM nation) n USING (nationkey)
"""


# --- aggregations (§2.5) ----------------------------------------------------

def agg_basic_stats(spark, sf_dir):
    """count/sum/min/max/avg (physical_plan/aggregates.rs:52-67) in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum("l_orderkey").alias("sum_okey"),
        _r2(F.sum("l_quantity")).alias("sum_qty"),
        _r2(F.min("l_extendedprice")).alias("min_price"),
        _r2(F.max("l_extendedprice")).alias("max_price"),
        _r2(F.avg("l_discount")).alias("avg_disc"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


AGG_BASIC_ORACLE = """
SELECT l_returnflag,
       count(*)                       AS cnt,
       CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
       round(sum(l_quantity), 2)      AS sum_qty,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price,
       round(avg(l_discount), 2)      AS avg_disc,
       min(l_shipdate)                AS first_ship,
       max(l_shipdate)                AS last_ship
FROM lineitem GROUP BY l_returnflag
"""


def agg_count_distinct(spark, sf_dir):
    """count(DISTINCT x) (distinct_expressions.rs:43) + the single-distinct
    group-by rewrite (optimizer/single_distinct_to_groupby.rs:43) that
    Catalyst performs as RewriteDistinctAggregates."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


AGG_COUNT_DISTINCT_ORACLE = """
SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


def agg_having(spark, sf_dir):
    """GROUP BY + HAVING (bql.pest:192; planner.rs:777-815)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("n_lines"), _r2(F.sum("l_quantity")).alias("tot_qty"))
        .filter(F.col("n_lines") > 20)
    )


AGG_HAVING_ORACLE = """
SELECT l_partkey, count(*) AS n_lines, round(sum(l_quantity), 2) AS tot_qty
FROM lineitem GROUP BY l_partkey HAVING count(*) > 20
"""


def agg_group_by_expr(spark, sf_dir):
    """GROUP BY an expression (grammar allows full exprs in group_by)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.count("*").alias("n"), _r2(F.sum("o_totalprice")).alias("rev"))
        .orderBy("order_year")
    )


AGG_GROUP_EXPR_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year, count(*) AS n,
       round(sum(o_totalprice), 2) AS rev
FROM orders GROUP BY 1 ORDER BY 1
"""


def count_star(spark, sf_dir):
    """count(*) metadata fast path — reference reads a single column
    (datafusions.rs:135-144); Spark answers from Parquet metadata via
    aggregate pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count("*").alias("n_rows"))


COUNT_STAR_ORACLE = "SELECT count(*) AS n_rows FROM lineitem"


# --- sorts / limits (§2.8) --------------------------------------------------

def orderby_limit_topk(spark, sf_dir):
    """ORDER BY ... LIMIT -> Spark TakeOrderedAndProject (top-k without full
    sort; the reference cannot fuse these, SURVEY §2.8).  Tie-free ordering."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(25)
    )


TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


def sort_multi_key(spark, sf_dir):
    """Multi-key asc/desc sort (SortExec sort.rs:47; asc/desc bql.pest:196-197).
    Range-partitioned in Spark == SortPreservingMerge for free."""
    n = load_table(spark, sf_dir, "nation")
    return n.orderBy(F.col("n_regionkey").desc(), F.col("n_name").asc())


SORT_MULTI_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation
ORDER BY n_regionkey DESC, n_name ASC
"""


# --- set operations (§2.9) --------------------------------------------------

def _cust_subsets(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_nationkey") < 12).select("c_custkey", "c_name")
    b = c.filter(F.col("c_acctbal") > 0).select("c_custkey", "c_name")
    return a, b


_SETOP_A = "SELECT c_custkey, c_name FROM customer WHERE c_nationkey < 12"
_SETOP_B = "SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0"


def setop_union_all(spark, sf_dir):
    a, b = _cust_subsets(spark, sf_dir)
    return a.unionAll(b)


def setop_union(spark, sf_dir):
    a, b = _cust_subsets(spark, sf_dir)
    return a.union(b).distinct()


def setop_intersect(spark, sf_dir):
    a, b = _cust_subsets(spark, sf_dir)
    return a.intersect(b)


def setop_except(spark, sf_dir):
    a, b = _cust_subsets(spark, sf_dir)
    return a.exceptAll(b)


def distinct_select(spark, sf_dir):
    """SELECT DISTINCT (bql.pest:110) — planned as group-by-all."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


DISTINCT_ORACLE = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


# --- CTE / subqueries -------------------------------------------------------

def cte_revenue(spark, sf_dir):
    """WITH-CTE (bql.pest:99-100; planner.rs:208) via spark.sql so the CTE
    machinery itself is exercised."""
    for t in ("lineitem", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        ORDER BY total_revenue DESC, s_suppkey
        """
    )


CTE_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
ORDER BY total_revenue DESC, s_suppkey
"""


def scalar_subquery_agg(spark, sf_dir):
    """Scalar subquery in WHERE — impossible in DataFusion 6 (no subquery
    expressions, SURVEY §2.3), native in Spark SQL."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        """
    )


SCALAR_SUBQ_ORACLE = """
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
"""


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + conjunctive filter + single agg — the
    query whose whole cost is scan bandwidth; every predicate pushes to
    parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: fact-fact join + CASE-conditional aggregation
    (grouped on l_linestatus — the driver's lineitem fixture carries no
    shipmode/receiptdate columns, TESTDATA.md)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    hi = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(hi).cast("long").alias("high_line_count"),
            F.sum(1 - hi).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: broadcast dim join + conditional/total ratio."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct")
        )
    )


Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered subquery driving a semi-selective
    multi-join + top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.round("sum_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum_qty, 2) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 150) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation-pair volume by year — the same
    dimension table joined twice under different roles."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS correlated subquery -> left-semi join
    (the reference's grammar accepts IN-subqueries but DataFusion 6 errors
    at runtime, SURVEY §2.3; Catalyst plans the semi join natively)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: 4-way join over returned lineitems, revenue top-20
    customers."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR of conjunctive brand/quantity band predicates —
    the stress test for predicate normalization and partial pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    c1 = (F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11)
    c2 = (F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20)
    c3 = F.col("p_brand").isin("Brand#3", "Brand#4") & (F.col("l_quantity") >= 25)
    return j.filter(c1 | c2 | c3).agg(
        F.count("*").alias("n"),
        _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
    )


Q19_ORACLE = """
SELECT count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand IN ('Brand#3', 'Brand#4') AND l_quantity >= 25)
"""


def join_range_bands(spark, sf_dir):
    """Banded range join: parts priced into static bands via a broadcast
    BETWEEN join.  With a small band table this IS the optimal plan
    (BroadcastNestedLoopJoin over 10 rows); when both sides are large the
    same operator buckets the intervals to a fixed width, explodes, and
    equi-joins on bucket + residual BETWEEN — see operators/asof.py for the
    sibling time variant."""
    from pyspark.sql import functions as F

    from tensorbase_spark.sources.tables import load_table

    bands = spark.createDataFrame(
        [(i, 900.0 + i * 10, 900.0 + (i + 1) * 10) for i in range(10)],
        "band int, lo double, hi double",
    )
    p = load_table(spark, sf_dir, "part")
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


JOIN_RANGE_BANDS_ORACLE = """
WITH bands AS (
  SELECT i AS band, 900.0 + i * 10 AS lo, 900.0 + (i + 1) * 10 AS hi
  FROM (SELECT unnest(range(0, 10)) AS i)
)
SELECT CAST(band AS INT) AS band, count(*) AS n_parts,
       round(avg(p_retailprice), 2) AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


def rollup_hierarchy(spark, sf_dir):
    """Hypertable-style hierarchical rollup: minute aggregates from raw,
    hour FROM the minute rollup, day FROM the hour rollup — each coarser
    granularity reads the previous (already tiny) aggregate, never the raw
    table.  At 100 TB this is the difference between three raw scans and
    one: the continuous-aggregate pattern."""
    from pyspark.sql import functions as F

    from tensorbase_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("bucket")
    ).agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    hour = minute.groupBy(
        F.date_trunc("hour", F.col("bucket")).alias("bucket")
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    day = hour.groupBy(
        F.date_trunc("day", F.col("bucket")).alias("bucket")
    ).agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    lvl = lambda df, g: df.select(F.lit(g).alias("grain"), "bucket", "n", F.round("v", 4).alias("v"))
    return lvl(hour, "hour").unionByName(lvl(day, "day"))


ROLLUP_HIERARCHY_ORACLE = """
WITH m AS (
  SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS bucket,
         count(*) AS n, sum(value) AS v
  FROM events GROUP BY 1
), h AS (
  SELECT date_trunc('hour', bucket) AS bucket, CAST(sum(n) AS BIGINT) AS n, sum(v) AS v
  FROM m GROUP BY 1
), d AS (
  SELECT date_trunc('day', bucket) AS bucket, CAST(sum(n) AS BIGINT) AS n, sum(v) AS v
  FROM h GROUP BY 1
)
SELECT 'hour' AS grain, bucket, n, round(v, 4) AS v FROM h
UNION ALL
SELECT 'day' AS grain, bucket, n, round(v, 4) AS v FROM d
"""


def join_skew_salted(spark, sf_dir):
    """Hot-key-safe equi-join via explicit salting (operators/skew.py):
    lineitem facts spread over 8 salt buckets per l_suppkey, supplier dim
    exploded 8 ways — the shuffle key becomes (key, salt) so a hot supplier
    lands on 8 reducers instead of 1.  Salting is result-invisible, so the
    oracle is the PLAIN join: the post-join aggregate hash-checks that
    salting changed the distribution and nothing else."""
    from tensorbase_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    return (
        salted_join(li, sup, on="suppkey", n_salts=8)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


JOIN_SKEW_SALTED_ORACLE = """
SELECT s_nationkey, count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


QUERIES = {
    "q1_pricing_summary": Query(q1_pricing_summary, Q1_ORACLE, ("agg", "tpch"), bench=True),
    "join_skew_salted": Query(
        join_skew_salted, JOIN_SKEW_SALTED_ORACLE, ("join", "skew")
    ),
    "q3_shipping_priority": Query(q3_shipping_priority, Q3_ORACLE, ("join", "tpch"), bench=True),
    "q5_local_supplier": Query(q5_local_supplier, Q5_ORACLE, ("join", "tpch"), bench=True),
    "filter_predicates": Query(filter_predicates, FILTER_PRED_ORACLE, ("filter",)),
    "between_in_null": Query(between_in_null, BETWEEN_IN_ORACLE, ("filter",)),
    "case_cast": Query(case_cast, CASE_CAST_ORACLE, ("projection",)),
    "join_inner_agg": Query(join_inner_agg, JOIN_INNER_ORACLE, ("join",), bench=True),
    "join_left_count": Query(join_left_count, JOIN_LEFT_ORACLE, ("join",)),
    "join_right_full": Query(join_right_full, JOIN_FULL_ORACLE, ("join",)),
    "join_cross_filter": Query(join_cross_filter, JOIN_CROSS_ORACLE, ("join",)),
    "join_semi": Query(join_semi, JOIN_SEMI_ORACLE, ("join",)),
    "join_anti": Query(join_anti, JOIN_ANTI_ORACLE, ("join",)),
    "join_using": Query(join_using, JOIN_USING_ORACLE, ("join",)),
    "agg_basic_stats": Query(agg_basic_stats, AGG_BASIC_ORACLE, ("agg",)),
    "agg_count_distinct": Query(agg_count_distinct, AGG_COUNT_DISTINCT_ORACLE, ("agg",), bench=True),
    "agg_having": Query(agg_having, AGG_HAVING_ORACLE, ("agg",)),
    "agg_group_by_expr": Query(agg_group_by_expr, AGG_GROUP_EXPR_ORACLE, ("agg",)),
    "count_star": Query(count_star, COUNT_STAR_ORACLE, ("agg",)),
    "orderby_limit_topk": Query(orderby_limit_topk, TOPK_ORACLE, ("sort",)),
    "sort_multi_key": Query(sort_multi_key, SORT_MULTI_ORACLE, ("sort",)),
    "setop_union_all": Query(setop_union_all, f"{_SETOP_A} UNION ALL {_SETOP_B}", ("setop",)),
    "setop_union": Query(setop_union, f"{_SETOP_A} UNION {_SETOP_B}", ("setop",)),
    "setop_intersect": Query(setop_intersect, f"{_SETOP_A} INTERSECT {_SETOP_B}", ("setop",)),
    "setop_except": Query(setop_except, f"{_SETOP_A} EXCEPT ALL {_SETOP_B}", ("setop",)),
    "distinct_select": Query(distinct_select, DISTINCT_ORACLE, ("setop",)),
    "cte_revenue": Query(cte_revenue, CTE_ORACLE, ("cte",)),
    "scalar_subquery_agg": Query(scalar_subquery_agg, SCALAR_SUBQ_ORACLE, ("subquery",)),
    "join_range_bands": Query(join_range_bands, JOIN_RANGE_BANDS_ORACLE, ("join", "range")),
    # q6 is the closest shape to the reference's published headline number
    # (single-column scan+sum, BASELINE.md docs/benchmarks.md:3-14)
    "q6_forecast_revenue": Query(q6_forecast_revenue, Q6_ORACLE, ("tpch",), bench=True),
    "q12_shipmode_priority": Query(q12_shipmode_priority, Q12_ORACLE, ("tpch",)),
    "q14_promo_effect": Query(q14_promo_effect, Q14_ORACLE, ("tpch",)),
    "q18_large_orders": Query(q18_large_orders, Q18_ORACLE, ("tpch",), bench=True),
    "q4_order_priority": Query(q4_order_priority, Q4_ORACLE, ("tpch",)),
    "q10_returned_items": Query(q10_returned_items, Q10_ORACLE, ("tpch",)),
    "q19_disjunctive_predicates": Query(q19_disjunctive_predicates, Q19_ORACLE, ("tpch",)),
    "q7_volume_shipping": Query(q7_volume_shipping, Q7_ORACLE, ("tpch",)),
    "rollup_hierarchy": Query(rollup_hierarchy, ROLLUP_HIERARCHY_ORACLE, ("agg", "rollup")),
}
