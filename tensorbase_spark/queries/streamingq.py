"""Driver-facing Structured Streaming queries (tensorbase_spark.streaming).

availableNow triggers make these deterministic functions of the fixture, so
they carry full DuckDB oracles — the oracle recomputes the same aggregate in
batch SQL, proving the streaming path (file stream -> watermark/window or
GroupState -> memory sink) loses and duplicates nothing.
"""

from __future__ import annotations

from tensorbase_spark.queries import Query
from tensorbase_spark.streaming import events as sev


def stream_tumbling_window(spark, sf_dir):
    return sev.tumbling_window_counts(spark, sf_dir)


STREAM_TUMBLING_ORACLE = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def stream_stateful_rollup(spark, sf_dir):
    return sev.stateful_user_rollup(spark, sf_dir)


STREAM_STATEFUL_ORACLE = """
SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value,
       max(CAST(ts AS TIMESTAMP)) AS last_ts
FROM events GROUP BY user_id
"""


QUERIES = {
    "stream_tumbling_window": Query(stream_tumbling_window, STREAM_TUMBLING_ORACLE, ("streaming",)),
    "stream_stateful_rollup": Query(stream_stateful_rollup, STREAM_STATEFUL_ORACLE, ("streaming",)),
}
