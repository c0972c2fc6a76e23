"""Structured Streaming extension: availableNow runs over the events fixture
must equal the batch aggregates (no loss, no duplication), and GroupState
must accumulate across the stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from tensorbase_spark.streaming import events as sev

SF0001 = "/root/testdata/sf0.001"


def _batch_events(spark):
    from tensorbase_spark.sources.tables import load_table

    return load_table(spark, SF0001, "events")


def test_tumbling_window_matches_batch(spark):
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in sev.tumbling_window_counts(spark, SF0001).collect()
    }
    want = {
        (r.ws, r.event_type): (r.n, r.sv)
        for r in _batch_events(spark)
        .groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
        .collect()
    }
    assert got == want


def test_stateful_rollup_matches_batch(spark):
    got = {
        r.user_id: (r.n_events, r.total_value, r.last_ts)
        for r in sev.stateful_user_rollup(spark, SF0001).collect()
    }
    want = {
        r.user_id: (r.n, r.tv, r.lt)
        for r in _batch_events(spark)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("tv"),
            F.max("ts").alias("lt"),
        )
        .collect()
    }
    assert got == want
