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


def stream_sliding_window(spark, sf_dir):
    return sev.sliding_window_counts(spark, sf_dir)


# Each event falls into 2 windows (2h window, 1h slide): the ones starting at
# trunc(ts) and trunc(ts) - 1h — replayed in batch with a 2-row offset join.
STREAM_SLIDING_ORACLE = """
WITH e AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type, value FROM events
), x AS (
  SELECT h - k * INTERVAL 1 HOUR AS window_start, event_type, value
  FROM e, (VALUES (0), (1)) AS t(k)
)
SELECT window_start, event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM x GROUP BY 1, 2
"""


def stream_dedup_users(spark, sf_dir):
    return sev.streaming_dedup_users(spark, sf_dir)


STREAM_DEDUP_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_unique_users
FROM events GROUP BY event_type
"""


def stream_session_window(spark, sf_dir):
    return sev.session_window_rollup(spark, sf_dir)


# session_window semantics replayed in batch: new session when the gap to the
# previous event (at Spark's microsecond precision) is >= the 30-min gap.
STREAM_SESSION_ORACLE = """
WITH m AS (
  SELECT user_id, value, event_id,
         make_timestamp(epoch_ns(ts) // 1000) AS tsu
  FROM events
), flagged AS (
  SELECT user_id, value, tsu, event_id,
         CASE WHEN lag(tsu) OVER w IS NULL
                OR tsu - lag(tsu) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS ns
  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
), numbered AS (
  SELECT user_id, value, tsu,
         sum(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT min(tsu) AS session_start, user_id, count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM numbered GROUP BY user_id, sid
"""


def stream_append_ingest(spark, sf_dir):
    return sev.append_ingest_to_parquet(spark, sf_dir)


STREAM_APPEND_ORACLE = """
SELECT CAST(ts AS DATE) AS day, count(*) AS n, round(sum(value), 4) AS v
FROM events GROUP BY 1
"""




def stream_stream_join(spark, sf_dir):
    """Stream-stream interval join (streaming last-touch attribution):
    purchases x preceding-hour clicks per user, both sides watermarked so
    join state is bounded by the horizon (events.py
    stream_stream_attribution_join)."""
    return sev.stream_stream_attribution_join(spark, sf_dir)


STREAM_STREAM_JOIN_ORACLE = """
SELECT p.user_id AS p_user,
       count(DISTINCT p.event_id)    AS n_attributed_purchases,
       count(*)                      AS n_click_touches,
       round(sum(c.value), 4)        AS touch_value
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
GROUP BY p.user_id
"""

QUERIES = {
    "stream_tumbling_window": Query(stream_tumbling_window, STREAM_TUMBLING_ORACLE, ("streaming",)),
    "stream_append_ingest": Query(stream_append_ingest, STREAM_APPEND_ORACLE, ("streaming", "ingest")),
    "stream_session_window": Query(stream_session_window, STREAM_SESSION_ORACLE, ("streaming",)),
    "stream_stateful_rollup": Query(stream_stateful_rollup, STREAM_STATEFUL_ORACLE, ("streaming",)),
    "stream_sliding_window": Query(stream_sliding_window, STREAM_SLIDING_ORACLE, ("streaming",)),
    "stream_dedup_users": Query(stream_dedup_users, STREAM_DEDUP_ORACLE, ("streaming",)),
    "stream_stream_join": Query(stream_stream_join, STREAM_STREAM_JOIN_ORACLE, ("streaming", "join")),
}


def stream_mv_ingest(spark, sf_dir):
    """Streaming ingest through the ENGINE with a materialized view attached
    (engine.py _create_materialized_view): readStream -> foreachBatch ->
    engine.insert_df, so every micro-batch fires the MV trigger and appends
    its partial rollup to the TO table — the CH continuous-aggregation
    pattern under streaming ingest.  availableNow + a fresh checkpoint make
    the run deterministic; the oracle recomputes the rollup from the raw
    fixture, proving no block is lost or double-counted across micro-batch
    boundaries."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from tensorbase_spark.queries.engine_queries import _fresh_engine
    from tensorbase_spark.streaming.events import read_events_stream

    eng = _fresh_engine(spark, sf_dir, "smv")
    db = spark.catalog.currentDatabase()
    eng.sql("create table smv_raw(ts DateTime, typ String, v Float64)")
    eng.sql("create table smv_daily(d Date, typ String, n Int64, s Float64)")
    eng.sql(
        "create materialized view smv_roll to smv_daily as "
        "select toDate(ts) as d, typ, count(*) as n, sum(v) as s "
        "from smv_raw group by toDate(ts), typ"
    )

    tag = os.path.basename(sf_dir.rstrip("/"))
    chk = f"/tmp/tbs_stream_mv_chk/{tag}"
    shutil.rmtree(chk, ignore_errors=True)
    ev = read_events_stream(spark, sf_dir).select("ts", "event_type", "value")

    def sink(batch, _bid):
        eng.insert_df(f"{db}.smv_raw", batch)

    q = (
        ev.writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return eng.sql(
        "select d, typ, sum(n) as n, round(sum(s), 4) as s "
        "from smv_daily group by d, typ"
    )


STREAM_MV_ORACLE = """
SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, event_type AS typ,
       count(*) AS n, round(sum(value), 4) AS s
FROM events GROUP BY 1, 2
"""


QUERIES["stream_mv_ingest"] = Query(
    stream_mv_ingest, STREAM_MV_ORACLE, ("streaming", "ingest", "engine")
)


def stream_incremental_dedup(spark, sf_dir):
    """Continuous-ingest dedup: the documents fixture is staged as FOUR
    files, streamed one file per micro-batch (maxFilesPerTrigger=1), and
    each micro-batch is (a) verdicted against the fingerprint store built
    from the batches before it (pipeline.dedup.incremental_dedup_against)
    and (b) merged into the store (versioned parquet; min canonical id is
    associative+commutative, so the FINAL store is micro-batch-boundary
    invariant — which is what makes a streaming query with nondeterministic
    batching fully oracle-checkable).  Returns the final store summarized
    per md5-prefix bucket plus the arrival-verdict totals (n_first_seen /
    n_dup_arrivals are batching-invariant too: first sightings == distinct
    contents).

    100 TB shape: this is the standing ingestion service — each shard lands,
    is verdicted against the accumulated store (store-side join, batch side
    small), and appends only new fingerprints.  The full corpus is never
    rescanned; store versions are bounded by compaction (here: rewrite per
    batch at fixture scale)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from tensorbase_spark.pipeline import dedup

    tag = os.path.basename(sf_dir.rstrip("/"))
    stage = f"/tmp/tbs_stream_dedup_stage/{tag}"
    store_base = f"/tmp/tbs_stream_dedup_store/{tag}"
    chk = f"/tmp/tbs_stream_dedup_chk/{tag}"
    for p in (stage, store_base, chk):
        shutil.rmtree(p, ignore_errors=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for i in range(4):
        (
            docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{stage}/b{i}")
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{stage}/b*")
    )

    state = {"version": -1, "n_first": 0, "n_dup": 0}

    def _store_path() -> str:
        return f"{store_base}/v{state['version']}"

    def sink(batch, _bid):
        fps = batch.groupBy(F.md5("text").alias("content_md5")).agg(
            F.min("doc_id").alias("canonical_id")
        )
        if state["version"] < 0:
            merged = fps
            n_batch = batch.count()
            n_first = fps.count()
            state["n_first"] += n_first
            state["n_dup"] += n_batch - n_first
        else:
            verdicts = dedup.incremental_dedup_against(
                batch.sparkSession, _store_path(), batch
            )
            # bounded driver-side metadata: <= 3 rows per micro-batch
            counts = dict(
                (r.verdict, r.n)
                for r in verdicts.groupBy("verdict")
                .agg(F.count("*").alias("n"))
                .collect()
            )
            state["n_first"] += counts.get("new", 0)
            state["n_dup"] += counts.get("dup_of_store", 0) + counts.get(
                "dup_in_batch", 0
            )
            store = batch.sparkSession.read.parquet(_store_path())
            merged = (
                store.unionByName(fps)
                .groupBy("content_md5")
                .agg(F.min("canonical_id").alias("canonical_id"))
            )
        state["version"] += 1
        merged.write.mode("overwrite").parquet(_store_path())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = spark.read.parquet(_store_path())
    summary = final.groupBy(
        F.substring("content_md5", 1, 1).alias("bucket")
    ).agg(
        F.count("*").alias("n_contents"),
        F.sum("canonical_id").alias("id_checksum"),
    )
    totals = spark.createDataFrame(
        [(state["n_first"], state["n_dup"])], "n_first_seen long, n_dup_arrivals long"
    )
    return summary.crossJoin(totals)


STREAM_INCREMENTAL_DEDUP_ORACLE = """
WITH store AS (
  SELECT md5(text) AS h, min(doc_id) AS mid FROM documents GROUP BY md5(text)
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_first_seen,
         CAST((SELECT count(*) FROM documents) - count(*) AS BIGINT)
           AS n_dup_arrivals
  FROM store
)
SELECT substr(h, 1, 1) AS bucket, count(*) AS n_contents,
       CAST(sum(mid) AS BIGINT) AS id_checksum, n_first_seen, n_dup_arrivals
FROM store, tot
GROUP BY substr(h, 1, 1), n_first_seen, n_dup_arrivals
"""


QUERIES["stream_incremental_dedup"] = Query(
    stream_incremental_dedup,
    STREAM_INCREMENTAL_DEDUP_ORACLE,
    ("streaming", "dedup", "corpus"),
)


def stream_corpus_maintenance(spark, sf_dir):
    """Continuous-corpus-maintenance flagship: streaming ingest ->
    incremental dedup -> IVF index append -> BM25 refresh, end to end —
    the standing service that keeps a retrieval corpus AND its vector
    index fresh as shards land (VERDICT r5 stretch #6; composes
    dedup.incremental_dedup_against, similarity.build_ivf_index/
    ivf_index_append, text.bm25_topk — each individually driver-verified).

    Shape: the documents fixture is staged as FOUR arrival batches keyed
    on doc_id % 4 and streamed one file per micro-batch.  Each batch is
    (a) verdicted against the accumulated fingerprint store — only 'new'
    content is ADMITTED; (b) admitted docs append to the serving corpus;
    (c) admitted docs' embeddings are assigned to the FROZEN seed
    centroids and appended partition-locally into the IVF index (the
    Faiss append contract — no retrain, no rewrite of existing files);
    (d) the store merges the batch fingerprints (min canonical id —
    associative, so the final store is batch-boundary invariant).

    After ingest, the corpus is canonical-REMAPPED through the final
    store (each doc takes its content's global-min doc_id — also batch-
    invariant) and the refresh runs: BM25 top-k over the maintained
    corpus plus index-integrity counters (vector count + id checksum read
    back from the index directories).  Batch ARRIVAL order is the staged
    file order (Spark's file source orders by mtime then path; b0..b3 are
    written sequentially AND sort lexicographically), which the oracle
    mirrors with ORDER BY doc_id % 4, doc_id inside its arrival window.

    100 TB shape: per shard, the verdict join is store-side-streamed with
    the small batch broadcast, the corpus append writes only admitted
    rows, the index append touches only the assigned centroid partitions,
    and the BM25 refresh is the separately-audited candidate-sized plan
    (PLANS.md §13).  The full corpus is never rescanned."""
    import os
    import shutil

    from pyspark.sql import Window, functions as F

    from tensorbase_spark.pipeline import dedup, similarity
    from tensorbase_spark.pipeline import text as T
    from tensorbase_spark.queries.pipeline import _BM25_QUERIES

    tag = os.path.basename(sf_dir.rstrip("/"))
    base = f"/tmp/tbs_corpus_maint/{tag}"
    stage, store_base = f"{base}/stage", f"{base}/store"
    corpus_dir, idx, chk = f"{base}/corpus", f"{base}/ivf", f"{base}/chk"
    shutil.rmtree(base, ignore_errors=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for i in range(4):
        (
            docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{stage}/b{i}")
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{stage}/b*")
    )
    state = {"version": -1}

    def _store_path() -> str:
        return f"{store_base}/v{state['version']}"

    def sink(batch, _bid):
        s = batch.sparkSession
        fps = batch.groupBy(F.md5("text").alias("content_md5")).agg(
            F.min("doc_id").alias("canonical_id")
        )
        if state["version"] < 0:
            # seed batch: everything distinct-within-batch is admitted
            w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
            admitted = (
                batch.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            merged = fps
        else:
            verdicts = dedup.incremental_dedup_against(
                s, _store_path(), batch
            )
            admitted = batch.join(
                verdicts.filter(F.col("verdict") == "new").select("doc_id"),
                "doc_id",
            )
            merged = (
                s.read.parquet(_store_path())
                .unionByName(fps)
                .groupBy("content_md5")
                .agg(F.min("canonical_id").alias("canonical_id"))
            )
        admitted.select("doc_id", "text").write.mode("append").parquet(
            corpus_dir
        )
        new_vecs = (
            s.read.parquet(f"{sf_dir}/embeddings.parquet")
            .join(
                admitted.select(F.col("doc_id").alias("vec_id")), "vec_id"
            )
            .select("vec_id", "embedding")
        )
        if state["version"] < 0:
            similarity.build_ivf_index(new_vecs, idx, n_centroids=8)
        else:
            similarity.ivf_index_append(s, idx, new_vecs)
        state["version"] += 1
        merged.write.mode("overwrite").parquet(_store_path())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # canonical remap: every corpus doc takes its content's GLOBAL-min id
    # from the final store (min is associative -> batch-invariant)
    store_final = spark.read.parquet(_store_path())
    corpus = (
        spark.read.parquet(corpus_dir)
        .withColumn("content_md5", F.md5("text"))
        .join(store_final, "content_md5")
        .select(F.col("canonical_id").alias("doc_id"), "text")
    )
    hits = T.bm25_topk(corpus, _BM25_QUERIES, k=5)
    idx_vecs = spark.read.parquet(f"{idx}/vectors")
    integ = corpus.agg(
        F.count("*").cast("long").alias("n_corpus_docs")
    ).crossJoin(
        idx_vecs.agg(
            F.count("*").cast("long").alias("n_indexed_vecs"),
            F.coalesce(F.sum("vec_id"), F.lit(0))
            .cast("long")
            .alias("indexed_checksum"),
        )
    )
    return hits.crossJoin(F.broadcast(integ))


STREAM_CORPUS_MAINT_ORACLE = r"""
WITH arrival AS (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY doc_id % 4, doc_id) AS rn,
         min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
  FROM documents
), admitted AS (
  SELECT doc_id, text, canonical_id FROM arrival WHERE rn = 1
), corpus AS (
  SELECT canonical_id AS doc_id, text FROM admitted
), integ AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_corpus_docs,
         CAST(count(e.vec_id) AS BIGINT) AS n_indexed_vecs,
         CAST(coalesce(sum(e.vec_id), 0) AS BIGINT) AS indexed_checksum
  FROM embeddings e JOIN admitted a ON e.vec_id = a.doc_id
), toks AS (
  SELECT doc_id, u.term
  FROM corpus,
       UNNEST(list_filter(string_split_regex(lower(text), '\s+'),
                          x -> x <> '')) AS u(term)
), q(q_id, term) AS (
  VALUES (1, 'spark'), (1, 'window'), (1, 'query'),
         (2, 'customer'), (2, 'order'), (2, 'line'),
         (3, 'filter'), (3, 'merge'), (3, 'sort'), (3, 'table')
), dl AS (
  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT avg(dl) AS avgdl, CAST(count(*) AS DOUBLE) AS n_docs FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), scored AS (
  SELECT q.q_id, tf.doc_id,
         round(sum(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
         ), 6) AS score
  FROM tf
  JOIN q ON q.term = tf.term
  JOIN dfreq ON dfreq.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY q.q_id, tf.doc_id
)
SELECT q_id, doc_id, rank, score,
       n_corpus_docs, n_indexed_vecs, indexed_checksum
FROM (
  SELECT q_id, doc_id, score,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY score DESC, doc_id) AS INT) AS rank
  FROM scored
) CROSS JOIN integ
WHERE rank <= 5
"""


QUERIES["stream_corpus_maintenance"] = Query(
    stream_corpus_maintenance,
    STREAM_CORPUS_MAINT_ORACLE,
    ("streaming", "dedup", "similarity", "retrieval", "flagship"),
)
