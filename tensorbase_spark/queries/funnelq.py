"""Driver-facing behavioral-analytics queries (operators/funnel.py):
windowFunnel and retention analogues over the events table.
"""

from __future__ import annotations

from tensorbase_spark.operators import funnel
from tensorbase_spark.queries import Query
from tensorbase_spark.sources.tables import load_table

STEPS = ["view", "click", "purchase"]


def events_window_funnel(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return funnel.funnel_histogram(ev, STEPS, window="7 days")


WINDOW_FUNNEL_ORACLE = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= t1.t1 GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2 GROUP BY e.user_id
), d AS (
  SELECT u.user_id,
         CASE WHEN t1 IS NULL THEN 0
              WHEN t2 IS NULL OR t2 > t1 + INTERVAL 7 DAY THEN 1
              WHEN t3 IS NULL OR t3 > t1 + INTERVAL 7 DAY THEN 2
              ELSE 3 END AS funnel_depth
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
)
SELECT funnel_depth, count(*) AS n_users FROM d GROUP BY funnel_depth
"""


def events_retention(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return funnel.retention(ev, ["signup", "view", "click", "purchase"])


RETENTION_ORACLE = """
WITH f AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS f0,
         max(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS f1,
         max(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS f2,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS f3
  FROM events GROUP BY user_id
)
SELECT CAST(sum(f0) AS BIGINT)      AS n_base,
       CAST(sum(f0 * f1) AS BIGINT) AS ret_view,
       CAST(sum(f0 * f2) AS BIGINT) AS ret_click,
       CAST(sum(f0 * f3) AS BIGINT) AS ret_purchase
FROM f
"""


def join_asof(spark, sf_dir):
    """As-of join: each purchase matched to the user's latest view at-or-
    before the purchase (operators/asof.py — one shuffle + window carry,
    not a range join)."""
    from pyspark.sql import functions as F

    from tensorbase_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"), "value"
    )
    out = asof_join(
        purchases, views, on="user_id", ts="ts", payload=["view_id", "value"],
        tiebreak="view_id",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_view_id").alias("matched_view"),
        F.round("asof_value", 4).alias("view_value"),
    )


JOIN_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, v.event_id AS matched_view,
       round(v.value, 4) AS view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
QUALIFY row_number() OVER (
  PARTITION BY p.event_id ORDER BY v.ts DESC NULLS LAST, v.event_id DESC
) = 1
"""


QUERIES = {
    "events_window_funnel": Query(events_window_funnel, WINDOW_FUNNEL_ORACLE, ("events", "funnel")),
    "events_retention": Query(events_retention, RETENTION_ORACLE, ("events", "funnel")),
    "join_asof": Query(join_asof, JOIN_ASOF_ORACLE, ("join", "asof")),
}


def events_anomaly_zscore(spark, sf_dir):
    """Windowed anomaly detection — the observability query CH clusters run
    all day: hourly event counts per type, each hour scored against ITS
    TYPE's own distribution (population z-score over a window), |z| > 2
    flagged.  One groupBy to the hourly grain, one window keyed event_type
    (group cardinality, not corpus) — the raw stream is reduced before any
    per-type state exists."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tensorbase_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    mu = F.avg("n").over(w)
    sd = F.stddev_pop("n").over(w)
    z = F.when(sd > 0, (F.col("n") - mu) / sd).otherwise(F.lit(0.0))
    return hourly.select(
        "h",
        "event_type",
        "n",
        F.round(z, 4).alias("z"),
        (F.abs(z) > 2).alias("is_anomaly"),
    )


EVENTS_ANOMALY_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT h, event_type, n,
         avg(n) OVER (PARTITION BY event_type) AS mu,
         stddev_pop(n) OVER (PARTITION BY event_type) AS sd
  FROM hourly
)
SELECT h, event_type, n,
       round(CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0.0 END, 4) AS z,
       (abs(CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0.0 END) > 2) AS is_anomaly
FROM scored
"""

QUERIES["events_anomaly_zscore"] = Query(
    events_anomaly_zscore, EVENTS_ANOMALY_ORACLE, ("events", "analytics")
)


def events_funnel_strict(spark, sf_dir):
    """windowFunnel('strict_increase') semantics (operators/funnel.py):
    each chained step must occur STRICTLY after the previous one, so
    simultaneous events can't satisfy two consecutive steps.  Same
    one-shuffle collect + HOF chain as the base funnel; the oracle chains
    mins with strict > comparisons."""
    ev = load_table(spark, sf_dir, "events")
    return funnel.funnel_histogram(
        ev, STEPS, window="7 days", strict_increase=True
    )


WINDOW_FUNNEL_STRICT_ORACLE = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id
), d AS (
  SELECT u.user_id,
         CASE WHEN t1 IS NULL THEN 0
              WHEN t2 IS NULL OR t2 > t1 + INTERVAL 7 DAY THEN 1
              WHEN t3 IS NULL OR t3 > t1 + INTERVAL 7 DAY THEN 2
              ELSE 3 END AS funnel_depth
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
)
SELECT funnel_depth, count(*) AS n_users FROM d GROUP BY funnel_depth
"""


QUERIES["events_funnel_strict"] = Query(
    events_funnel_strict, WINDOW_FUNNEL_STRICT_ORACLE, ("events", "funnel")
)


def join_asof_forward(spark, sf_dir):
    """FORWARD as-of join (operators/asof.py direction='forward'): each
    click matched to the user's EARLIEST purchase at-or-after the click —
    the next-conversion-after-each-touch shape; same one-shuffle
    union+window plan scanning in reverse time order."""
    from pyspark.sql import functions as F

    from tensorbase_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), "value"
    )
    out = asof_join(
        clicks, purchases, on="user_id", ts="ts",
        payload=["purchase_id", "value"], tiebreak="purchase_id",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_purchase_id").alias("next_purchase"),
        F.round("asof_value", 4).alias("purchase_value"),
    )


JOIN_ASOF_FORWARD_ORACLE = """
SELECT c.event_id, c.user_id, p.event_id AS next_purchase,
       round(p.value, 4) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND p.ts >= c.ts
QUALIFY row_number() OVER (
  PARTITION BY c.event_id ORDER BY p.ts ASC NULLS LAST, p.event_id DESC
) = 1
"""


QUERIES["join_asof_forward"] = Query(
    join_asof_forward, JOIN_ASOF_FORWARD_ORACLE, ("join", "asof")
)
