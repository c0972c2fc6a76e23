"""Window functions (SURVEY.md §2.7) and time-windowed event analytics.

The reference's fork implements the full window surface (WindowAggExec,
physical_plan/windows/window_agg_exec.rs:46; RowNumber/Rank/Lag/Lead/...,
window_functions.rs:40-125) but the BQL grammar has no OVER, so it is
unreachable from the wire.  In Spark the surface is built-in and free —
included per SURVEY §7 step 8.

All orderings inside windows are tie-free (unique key appended) so results
hash-match the oracle deterministically.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tensorbase_spark.queries import Query
from tensorbase_spark.sources.tables import load_table


def window_row_number(spark, sf_dir):
    """Top-3 orders per customer by price — row_number over partitioned
    ordered window (window_functions.rs:40 RowNumber)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


WINDOW_RN_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
  FROM orders
) WHERE rn <= 3
"""


def window_rank_dense(spark, sf_dir):
    """rank + dense_rank + percent_rank (window_functions.rs Rank/DenseRank/
    PercentRank) over suppliers ranked by account balance within nation."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc())
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 4).alias("prnk"),
    )


WINDOW_RANK_ORACLE = """
SELECT s_suppkey, s_nationkey,
       CAST(rank()       OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       round(percent_rank() OVER w, 4)  AS prnk
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC)
"""


def window_lag_lead(spark, sf_dir):
    """lag/lead across a per-customer order timeline — days between
    consecutive orders (window_functions.rs Lag/Lead)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate", 1).over(w).cast("date"),
        ).alias("days_since_prev"),
    )


WINDOW_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       lag(o_orderkey)  OVER w AS prev_order,
       lead(o_orderkey) OVER w AS next_order,
       CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                      CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_running_sum(spark, sf_dir):
    """Aggregate-over-window with ROWS frame (window_frames.rs:130):
    running revenue per supplier ordered by ship date."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("running_rev"),
    )


WINDOW_RUNNING_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_extendedprice) OVER (
         PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
FROM lineitem
"""


def window_first_last_ntile(spark, sf_dir):
    """first_value/last_value/ntile (window_functions.rs FirstValue/LastValue/
    Ntile)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("top_order"),
        F.last("o_orderkey").over(wfull).alias("bottom_order"),
        F.ntile(4).over(w).alias("quartile"),
    )


WINDOW_FLN_ORACLE = """
SELECT o_orderstatus, o_orderkey,
       first_value(o_orderkey) OVER w AS top_order,
       last_value(o_orderkey)  OVER (PARTITION BY o_orderstatus
          ORDER BY o_totalprice DESC, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS bottom_order,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
"""


def window_cume_dist(spark, sf_dir):
    """cume_dist (window_functions.rs:40-45 CumeDist): cumulative
    distribution of part sizes within each brand."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


WINDOW_CUME_ORACLE = """
SELECT p_partkey, p_brand, p_size,
       round(cume_dist() OVER (PARTITION BY p_brand ORDER BY p_size), 6) AS cd
FROM part
"""


def window_nth_value(spark, sf_dir):
    """nth_value (window_functions.rs NthValue): the 2nd- and 3rd-highest
    account balances visible to each supplier row within its nation, over
    the full-partition frame (nth_value needs the whole partition or later
    rows would see NULL)."""
    s = load_table(spark, sf_dir, "supplier")
    w = (
        W.partitionBy("s_nationkey")
        .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.nth_value("s_acctbal", 2).over(w), 2).alias("second_bal"),
        F.round(F.nth_value("s_acctbal", 3).over(w), 2).alias("third_bal"),
    )


WINDOW_NTH_ORACLE = """
SELECT s_suppkey, s_nationkey,
       round(nth_value(s_acctbal, 2) OVER w, 2) AS second_bal,
       round(nth_value(s_acctbal, 3) OVER w, 2) AS third_bal
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- event-time analytics over the events table -----------------------------

def events_tumbling_window(spark, sf_dir):
    """Tumbling-window aggregation (batch form of the streaming op in
    tensorbase_spark.streaming): events per hour per type.  At scale this is
    the canonical pre-aggregation rollup — group keys are (hour, type), so
    partial aggregation collapses the fact table map-side."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_TUMBLING_ORACLE = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def events_sessionize(spark, sf_dir):
    """Sessionization via gap detection — lag + cumulative-sum session ids
    (30-min inactivity gap).  The classic pattern the reference cannot express
    at all (no OVER in BQL); in Spark it is two window passes, no Python."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts may arrive as TIMESTAMP_NTZ (parquet timestamp without UTC flag);
    # Spark forbids NTZ->BIGINT directly, so hop through TIMESTAMP (session
    # TZ is pinned UTC, so the epoch value is unchanged).
    t_sec = F.col("ts").cast("timestamp").cast("long")
    gap = t_sec - F.lag(t_sec, 1).over(w)
    sess = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


EVENTS_SESSION_ORACLE = """
WITH secs AS (
  -- floor-to-second matches Spark's CAST(timestamp AS LONG) truncation
  SELECT user_id, value, ts, event_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t_sec
  FROM events
), flagged AS (
  SELECT user_id, value,
         CASE WHEN t_sec - lag(t_sec) OVER w > 1800
              OR lag(t_sec) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session,
         ts, event_id
  FROM secs
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, value,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM numbered GROUP BY user_id, session_id
"""


def window_range_frame(spark, sf_dir):
    """RANGE frame (value-based, not row-based): 30-day trailing revenue per
    order, partitioned by priority — ties on the same date all see the same
    frame, so the result is deterministic where a ROWS frame would not be.
    Reference frame support: logical_plan/window_frames.rs:130 (fork-only)."""
    from pyspark.sql import Window as W

    from tensorbase_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    secs = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy(secs)
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        o.withColumn("trailing_30d", F.round(F.sum("o_totalprice").over(w), 2))
        .filter(F.col("o_orderkey") % 17 == 0)
        .select("o_orderkey", "o_orderpriority", "o_orderdate", "trailing_30d")
    )


WINDOW_RANGE_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_orderdate,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_orderpriority ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
       ), 2) AS trailing_30d
FROM orders
QUALIFY o_orderkey % 17 = 0
"""


QUERIES = {
    "window_row_number": Query(window_row_number, WINDOW_RN_ORACLE, ("window",)),
    "window_rank_dense": Query(window_rank_dense, WINDOW_RANK_ORACLE, ("window",)),
    "window_lag_lead": Query(window_lag_lead, WINDOW_LAG_ORACLE, ("window",)),
    "window_running_sum": Query(window_running_sum, WINDOW_RUNNING_ORACLE, ("window",), bench=True),
    "window_first_last_ntile": Query(window_first_last_ntile, WINDOW_FLN_ORACLE, ("window",)),
    "window_cume_dist": Query(window_cume_dist, WINDOW_CUME_ORACLE, ("window",)),
    "window_nth_value": Query(window_nth_value, WINDOW_NTH_ORACLE, ("window",)),
    "window_range_frame": Query(window_range_frame, WINDOW_RANGE_ORACLE, ("window",)),
    "events_tumbling_window": Query(events_tumbling_window, EVENTS_TUMBLING_ORACLE, ("events",), bench=True),
    "events_sessionize": Query(events_sessionize, EVENTS_SESSION_ORACLE, ("events",), bench=True),
}
