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


def test_stream_schema_probe_nanos_long_generation(spark, tmp_path):
    """The stream schema is derived from the actual file: a nanos-as-long
    fixture generation (ts stored as int64 nanoseconds) must stream and
    normalize to the same UTC timestamps the NTZ generation produces."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path / "sfnanos")
    import os

    os.makedirs(sf_dir)
    base_us = 1_600_000_000_000_000  # 2020-09-13 12:26:40 UTC, microseconds
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [(base_us + i * 3_600_000_000) * 1000 for i in range(3)],
                pa.int64(),
            ),
            "user_id": pa.array([10, 10, 20], pa.int64()),
            "event_type": pa.array(["a", "b", "a"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    out = sev.tumbling_window_counts(spark, sf_dir, window="1 hour")
    rows = sorted(
        ((r.window_start.isoformat(), r.event_type, r.n) for r in out.collect())
    )
    assert rows == [
        ("2020-09-13T12:00:00", "a", 1),
        ("2020-09-13T13:00:00", "b", 1),
        ("2020-09-13T14:00:00", "a", 1),
    ]


def test_stream_src_dir_replaces_stale_symlink(spark, tmp_path):
    """r2 verdict #2: a BROKEN symlink left by a prior session (pointing into
    a deleted pytest tmp dir) must be replaced, not silently kept —
    os.path.exists() is False for a dead link, and the old guard then
    swallowed FileExistsError, so the stream read zero files."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path / "sfstale")
    os.makedirs(sf_dir)
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([1_600_000_000_000_000], pa.timestamp("us")),
            "user_id": pa.array([10], pa.int64()),
            "event_type": pa.array(["a"]),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    # pre-plant a dead link exactly where _stream_src_dir will stage
    stage = "/tmp/tbs_stream_src_sfstale"
    os.makedirs(stage, exist_ok=True)
    dead = f"{stage}/events.parquet"
    if os.path.lexists(dead):
        os.remove(dead)
    os.symlink(str(tmp_path / "deleted-prior-session" / "events.parquet"), dead)
    assert os.path.islink(dead) and not os.path.exists(dead)
    try:
        out = sev.tumbling_window_counts(spark, sf_dir, window="1 hour")
        assert [(r.event_type, r.n) for r in out.collect()] == [("a", 1)]
        assert os.path.exists(dead)  # re-linked at the live fixture
    finally:
        if os.path.lexists(dead):
            os.remove(dead)


def test_stream_nanos_not_multiple_of_256(spark, tmp_path):
    """ADVICE r2 (medium): int64 epoch-nanos exceed 2^53, so float division
    by 1000 can shift the resulting microsecond by 1.  Use a nanos value
    whose double rounding WOULD be wrong and assert exact truncation."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path / "sfnano2")
    os.makedirs(sf_dir)
    ns = 1_600_000_000_000_001_111  # double rounds to ...000_001_024
    assert int(float(ns)) != ns  # precondition: not float-representable
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([ns], pa.int64()),
            "user_id": pa.array([10], pa.int64()),
            "event_type": pa.array(["a"]),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    ev = sev.read_events_stream(spark, sf_dir)
    got = sev._run_to_memory(ev.select("ts"), "append").collect()[0].ts
    assert pd.Timestamp(got).value == (ns // 1000) * 1000


def test_stream_mv_ingest_matches_batch(spark):
    """foreachBatch -> engine.insert_df fires the materialized-view trigger
    per micro-batch; the re-aggregated MV target equals the batch rollup."""
    from pyspark.sql import functions as F

    from tensorbase_spark.queries.streamingq import stream_mv_ingest
    from tensorbase_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.d, r.typ): (r.n, r.s) for r in stream_mv_ingest(spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    want = {
        (r.d, r.typ): (r.n, r.s)
        for r in ev.groupBy(
            F.to_date("ts").alias("d"), F.col("event_type").alias("typ")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    }
    assert got == want
    spark.catalog.setCurrentDatabase("default")


def test_stream_incremental_dedup_planted_dups(spark, tmp_path, monkeypatch):
    """Verdict totals and the final store must be micro-batch-boundary
    invariant: plant cross-batch and within-batch dups (doc_id % 4 splits
    batches, so ids 0/1/2/3 land in different micro-batches) and check
    n_first_seen == distinct contents, n_dup_arrivals == the rest."""
    from pyspark.sql import functions as F

    from tensorbase_spark.queries.streamingq import stream_incremental_dedup

    sf = f"{tmp_path}/sfplant"
    docs = spark.createDataFrame(
        [
            (0, "alpha", "en", "s0", 5),
            (1, "alpha", "en", "s0", 5),   # cross-batch dup of 0
            (2, "beta", "en", "s0", 4),
            (3, "beta", "en", "s0", 4),    # cross-batch dup of 2
            (4, "gamma", "en", "s0", 5),
            (8, "gamma", "en", "s0", 5),   # same-batch dup of 4 (both %4==0)
            (5, "delta", "en", "s0", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(f"{sf}/documents.parquet")
    out = stream_incremental_dedup(spark, sf)
    rows = out.collect()
    assert rows
    assert rows[0].n_first_seen == 4   # alpha beta gamma delta
    assert rows[0].n_dup_arrivals == 3
    # store canonicals are the global min ids regardless of arrival batch
    total = sum(r.n_contents for r in rows)
    checksum = sum(r.id_checksum for r in rows)
    assert total == 4
    assert checksum == 0 + 2 + 4 + 5


def test_stream_ingest_maintains_projection(spark):
    """Projections ride the MV insert trigger, so STREAMING ingest through
    foreachBatch -> engine.insert_df appends one partial row-group per
    micro-batch to the hidden projection table; the rewritten rollup over
    the streamed table equals the direct batch aggregate."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from tensorbase_spark.queries.engine_queries import _fresh_engine
    from tensorbase_spark.sources.tables import load_table
    from tensorbase_spark.streaming.events import read_events_stream

    sf = "/root/testdata/sf0.001"
    eng = _fresh_engine(spark, sf, "sproj")
    db = spark.catalog.currentDatabase()
    eng.sql("create table spj_raw(typ String, u Int64, v Float64)")
    eng.sql(
        "alter table spj_raw add projection by_typ "
        "(select typ, sum(v) as sv, count(*) as c group by typ)"
    )
    chk = "/tmp/tbs_stream_proj_chk"
    shutil.rmtree(chk, ignore_errors=True)
    ev = read_events_stream(spark, sf).select(
        F.col("event_type").alias("typ"),
        F.col("user_id").alias("u"),
        F.col("value").alias("v"),
    )

    def sink(batch, _bid):
        eng.insert_df(f"{db}.spj_raw", batch)

    q = (
        ev.writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    roll = "select typ, round(sum(v), 4) as sv, count(*) as n from spj_raw group by typ"
    plan = "\n".join(r[0] for r in eng.sql("explain " + roll).collect())
    assert "__proj_by_typ" in plan  # answered from the partial table
    got = {(r.typ): (r.sv, r.n) for r in eng.sql(roll).collect()}
    evb = load_table(spark, sf, "events")
    want = {
        r.typ: (r.sv, r.n)
        for r in evb.groupBy(F.col("event_type").alias("typ"))
        .agg(F.round(F.sum("value"), 4).alias("sv"), F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    spark.catalog.setCurrentDatabase("default")
