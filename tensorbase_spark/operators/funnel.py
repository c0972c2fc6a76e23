"""ClickHouse-style behavioral analytics: windowFunnel / retention analogues.

The reference's fork carries neither (they live in upstream ClickHouse, not
in the vendored DataFusion), but they are the signature ClickHouse workload
on an events table, so the engine supplies them as first-class operators.

Semantics (deterministic "first-occurrence chain", oracle-checkable):
  t1 = min ts of step1;  t_k = min ts of step_k with ts >= t_{k-1}.
  funnel depth = number of chained steps reached with t_k <= t1 + window.

Scale shape: ONE shuffle (groupBy user collecting that user's events);
the chained conditional mins are higher-order-function expressions over the
collected array — JVM-side, no Python, state bounded by events-per-user
exactly like ClickHouse's own windowFunnel implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_depths(
    events: DataFrame,
    steps: list[str],
    window: str = "7 days",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    strict_increase: bool = False,
) -> DataFrame:
    """Per-user funnel depth in [0, len(steps)] -> (user_id, funnel_depth).

    ``strict_increase`` is CH windowFunnel('strict_increase'): each chained
    step must occur STRICTLY after the previous one — simultaneous events
    cannot satisfy two consecutive steps."""
    arr = F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t")))
    g = events.groupBy(F.col(user_col).alias("user_id")).agg(arr.alias("evs"))

    def step_min(prev, step):
        if prev is None:
            cond = lambda e: e["t"] == step
        elif strict_increase:
            cond = lambda e: (e["t"] == step) & (e["ts"] > prev)
        else:
            cond = lambda e: (e["t"] == step) & (e["ts"] >= prev)
        return F.array_min(F.transform(F.filter(F.col("evs"), cond), lambda e: e["ts"]))

    ts_cols = []
    prev = None
    for i, s in enumerate(steps):
        g = g.withColumn(f"_t{i+1}", step_min(prev, s))
        prev = F.col(f"_t{i+1}")
        ts_cols.append(f"_t{i+1}")

    deadline = F.col("_t1") + F.expr(f"INTERVAL {window}")
    depth = F.lit(0)
    reached = F.lit(True)
    for i in range(len(steps)):
        tcol = F.col(ts_cols[i])
        ok = tcol.isNotNull() if i == 0 else (tcol.isNotNull() & (tcol <= deadline))
        reached = reached & ok
        depth = F.when(reached, F.lit(i + 1)).otherwise(depth)
    return g.select("user_id", depth.alias("funnel_depth"))


def funnel_histogram(
    events: DataFrame, steps: list[str], window: str = "7 days", **cols
) -> DataFrame:
    return (
        funnel_depths(events, steps, window, **cols)
        .groupBy("funnel_depth")
        .agg(F.count("*").alias("n_users"))
    )


def retention(
    events: DataFrame,
    conds: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse retention(): per user, r_k = did cond_1 AND did cond_k;
    returns the corpus-level sums as one row (r1 gates the rest, like CH).
    One partial-aggregated groupBy + one scalar reduce — no per-user state."""
    flags = [
        F.max(F.when(F.col(type_col) == c, 1).otherwise(0)).alias(f"_f{i}")
        for i, c in enumerate(conds)
    ]
    per_user = events.groupBy(user_col).agg(*flags)
    outs = [F.sum("_f0").alias("n_base")] + [
        F.sum(F.col("_f0") * F.col(f"_f{i}")).alias(f"ret_{c}")
        for i, c in enumerate(conds)
        if i > 0
    ]
    return per_user.agg(*outs)
