"""Structured Streaming extension over the events table.

The reference has NO streaming operators (SURVEY §2.10): its ingest is
micro-batch blocks over a socket (crates/runtime/src/ch/messages.rs:67-164),
at most an analogue of foreachBatch appends.  This module is the
Spark-native extension a streaming events table would actually use at scale:

- file-source readStream with an explicit schema (at 100 TB this is a
  directory of hourly parquet drops or a Kafka source; the fixture is one
  file, one batch),
- event-time tumbling-window aggregation with a watermark — the standard
  late-data bound; state for a window is dropped once the watermark passes
  its end, keeping state size O(active windows × keys) regardless of
  stream length,
- a custom stateful operator via applyInPandasWithState — per-user running
  aggregates held in explicit GroupState, the scale path for semantics
  windowed aggs can't express.

Both operators run with trigger(availableNow=True): process everything
pending, then stop — which makes them deterministic functions of the fixture
and therefore DuckDB-oracle-checkable like any batch query.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _event_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _stream_src_dir(sf_dir: str) -> str:
    """File-stream sources need a DIRECTORY to watch; the fixture is a single
    file.  Stage a per-sf dir holding a symlink to it — on a live system this
    directory is where hourly drops land and the stream picks up each new
    file as its own micro-batch."""
    import os

    tag = os.path.basename(sf_dir.rstrip("/"))
    d = f"/tmp/tbs_stream_src_{tag}"
    os.makedirs(d, exist_ok=True)
    target = f"{sf_dir}/events.parquet"
    link = f"{d}/events.parquet"
    # Always (re)link atomically via a tempname+rename: os.path.exists() is
    # False for a BROKEN symlink, so a link left by a prior session pointing
    # at a deleted tmp dir would silently persist and the stream would read
    # zero files (r2 verdict #2).  rename() replaces any stale entry.
    tmp = f"{link}.{os.getpid()}.tmp"
    try:
        os.symlink(target, tmp)
        os.rename(tmp, link)
    finally:
        if os.path.lexists(tmp):
            os.remove(tmp)
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture, normalized to a UTC
    TIMESTAMP ts.

    The stream schema is derived from the ACTUAL file (one cheap batch
    footer probe) rather than hardcoded: fixture generations differ — nanos
    stored as long (read via the session's nanosAsLong flag), timestamp[us]
    with isAdjustedToUTC=false (TIMESTAMP_NTZ), or a plain UTC timestamp —
    and a file-schema mismatch that batch reads tolerate would fail
    readStream outright."""
    src = f"{sf_dir}/events.parquet"
    ts_type = spark.read.parquet(src).schema["ts"].dataType
    raw = (
        spark.readStream.schema(_event_schema(ts_type))
        .format("parquet")
        .load(_stream_src_dir(sf_dir))
    )
    if isinstance(ts_type, T.LongType):  # nanos-as-long generation
        # Integer division, NOT `/` : `/` computes in double, and int64
        # epoch-nanos (~1.7e18) exceed 2^53, so the long->double round trip
        # can shift the resulting microsecond by 1 for arbitrary inputs.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_memory(result: DataFrame, mode: str) -> DataFrame:
    """Execute an availableNow pass into a memory sink; return the sink table.

    Memory sink is the test harness; production would writeStream to
    partitioned parquet/Kafka with the same trigger semantics."""
    name = f"tb_stream_{uuid.uuid4().hex[:10]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = result.sparkSession
    out = spark.table(name)
    return out


def tumbling_window_counts(
    spark: SparkSession, sf_dir: str, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked event-time tumbling window: (window_start, event_type,
    n, sum_value).  Complete output mode so the single availableNow batch
    emits every window (append mode would hold windows open past the last
    watermark update — nothing would ever finalize on a finite fixture)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
    )


def stateful_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    (n_events, total_value, last_ts) kept in explicit GroupState.

    State survives across triggers — on the one-batch fixture the emitted
    snapshot equals the batch aggregate (which is what the oracle checks);
    on a live stream each trigger emits the updated rollup per active user."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir)

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("last_ts", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("last_us", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last_us = max(last_us, int(pd.Timestamp(mx).value // 1000))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "last_ts": [pd.Timestamp(last_us * 1000)],
            }
        )

    rolled = ev.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    return _run_to_memory(rolled, "update")


def sliding_window_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding windows (each event lands in window_len/slide
    windows).  State is O(active windows x keys) exactly like tumbling; the
    overlap factor multiplies shuffle rows, not state lifetime."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
    )


def streaming_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup at ingest: dropDuplicates on (user_id,
    event_type) with a watermark bounding the dedup state — the streaming
    face of the corpus exact-dedup operator.  The deduped stream lands in
    the sink in append mode (first occurrence wins, emitted immediately);
    the per-type count over the sink is then deterministic."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "24 hours")
    dd = ev.dropDuplicates(["user_id", "event_type"])
    sink = _run_to_memory(dd, "append")
    return sink.groupBy("event_type").agg(F.count("*").alias("n_unique_users"))


def session_window_rollup(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Streaming session windows: F.session_window merges events whose gap to
    the previous event is under `gap`; state per open session is dropped once
    the watermark passes session end.  Completes the windows trio
    (tumbling / sliding / session)."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "24 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").alias("session_start"), "user_id", "n_events", "session_value"
    )


def append_ingest_to_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ingest analogue (SURVEY §2.10): micro-batch appends
    into partitioned columnar storage.  readStream -> writeStream to parquet
    PARTITIONED BY day with a checkpoint, availableNow trigger — exactly-once
    file-sink semantics; on a live system each hourly drop lands as its own
    micro-batch and failures replay from the checkpoint.  Returns the
    per-day rollup read back from the SINK (proving the round trip)."""
    import os
    import shutil

    tag = os.path.basename(sf_dir.rstrip("/"))
    dst = f"/tmp/tbs_stream_sink/{tag}"
    chk = f"{dst}__chk"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.rmtree(chk, ignore_errors=True)
    ev = read_events_stream(spark, sf_dir).withColumn("day", F.to_date("ts"))
    q = (
        ev.writeStream.format("parquet")
        .option("path", dst)
        .option("checkpointLocation", chk)
        .partitionBy("day")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(dst)
    return back.groupBy("day").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v")
    )


def stream_stream_attribution_join(
    spark: SparkSession, sf_dir: str, horizon: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each purchase joins the clicks the same
    user made in the preceding `horizon` — streaming last-touch attribution.

    Both sides carry watermarks, and the join condition bounds click_ts to
    [purchase_ts - horizon, purchase_ts]; Spark derives from these the state
    retention for EACH side (a click can be dropped once the watermark
    passes click_ts + horizon; a purchase once it passes purchase_ts) — the
    state stays O(events inside the horizon window) on an unbounded stream.
    The fixture runs one availableNow batch, so the attribution counts are a
    deterministic function of the events table and DuckDB-oracle-checkable
    as a plain interval self-join."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""
            p_user = c_user AND
            click_ts >= purchase_ts - INTERVAL {horizon} AND
            click_ts <= purchase_ts
            """
        ),
        "inner",
    )
    sink = _run_to_memory(joined, "append")
    return sink.groupBy("p_user").agg(
        F.countDistinct("purchase_id").alias("n_attributed_purchases"),
        F.count("*").alias("n_click_touches"),
        F.round(F.sum("click_value"), 4).alias("touch_value"),
    )
