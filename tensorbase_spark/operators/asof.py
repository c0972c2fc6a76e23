"""As-of (time-series) join — the canonical operator Spark's join zoo lacks
(SURVEY §2.4: the reference has none either; kdb/QuestDB/DuckDB treat it as
first-class).

`asof_join(left, right)`: for every left row, attach the single right row
with the greatest right.ts <= left.ts within the same key — "the latest
quote before each trade".

Implementation is NOT a join at all (a naive range join is O(pairs-per-key)):
both sides are union'd with a side marker, then one window pass per key
ordered by (ts, side, tiebreak) carries the last-seen right row forward into
each left row.  Cost: ONE shuffle on the key + a linear scan per partition —
the optimal distributed shape, robust to millions of rows per key where a
broadcast-range-join would blow up.  Ties (right.ts == left.ts) match, and
among equal-ts right rows the largest tiebreak column wins (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_ts: str | None = None,
    payload: list[str] | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: left columns + `asof_<payload>` columns from the
    matched right row (NULL when no right row matches the left row).

    direction: "backward" (default — greatest right.ts <= left.ts, the
    latest-quote-before-each-trade shape) or "forward" (smallest
    right.ts >= left.ts — the next-reading-after-each-event shape; same
    one-shuffle union+window plan scanning in reverse time order).
    payload: right columns to attach (default: all but key/ts).
    tiebreak: right column ordering equal-ts right rows (last one wins)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    rts = right_ts or ts
    payload = payload or [c for c in right.columns if c not in (on, rts)]
    tb = tiebreak or (payload[0] if payload else rts)

    reserved = {"__side", "__tb", "__m"} | {f"asof_{c}" for c in payload}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: left columns collide with internals: {sorted(clash)}")

    l_marked = left.withColumn("__side", F.lit(1))
    r_marked = (
        # a NULL-ts right row can never satisfy right.ts <= left.ts — drop it
        # here, else NULLS FIRST ordering would carry it into every left row
        # that has no genuine predecessor
        right.filter(F.col(rts).isNotNull())
        .select(
            F.col(on),
            F.col(rts).alias(ts),
            F.col(tb).alias("__tb"),  # tiebreak need not be in payload
            *[F.col(c).alias(f"__r_{c}") for c in payload],
        )
        .withColumn("__side", F.lit(0))
    )
    u = l_marked.unionByName(r_marked, allowMissingColumns=True)

    # right rows sort before left rows at equal ts (inclusive match); among
    # equal-ts right rows the greatest tiebreak sorts last and is carried
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("__side").asc(), F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry the whole right row as ONE struct so a NULL payload value can
    # never be back-filled from an older row (row integrity)
    r_struct = F.when(
        F.col("__side") == 0, F.struct(*[F.col(f"__r_{c}").alias(c) for c in payload])
    )
    carried = u.select("*", F.last(r_struct, ignorenulls=True).over(w).alias("__m"))
    return carried.filter(F.col("__side") == 1).select(
        *left.columns, *[F.col("__m")[c].alias(f"asof_{c}") for c in payload]
    )
