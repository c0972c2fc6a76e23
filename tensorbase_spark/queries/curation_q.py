"""Corpus-curation queries (train/val/test split, per-source caps,
benchmark-contamination scan, sequence packing) over the documents table.

All four are hash- or window-deterministic, so each has a full DuckDB
oracle — the membership/bin assignment is re-derivable by any engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tensorbase_spark.pipeline import curation
from tensorbase_spark.queries import Query
from tensorbase_spark.sources.tables import load_table


def corpus_split_train_val_test(spark, sf_dir):
    """Deterministic 80/10/10 split, summarized per (split, source) with an
    id checksum so the oracle verifies exact membership, not just counts."""
    d = load_table(spark, sf_dir, "documents")
    s = curation.train_val_test_split(d, key="doc_id", test_pct=10, val_pct=10)
    return s.groupBy("split", "source").agg(
        F.count("*").alias("n_docs"), F.sum("doc_id").alias("id_checksum")
    )


SPLIT_ORACLE = """
WITH b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 10 THEN 'test'
            WHEN bucket < 20 THEN 'val'
            ELSE 'train' END AS split,
       source, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM b
GROUP BY split, source
"""


def corpus_cap_per_source(spark, sf_dir):
    """At most 10 docs per source, preferring longest (n_chars desc, doc_id
    tie-break) — class-balanced resampling with a hard cap."""
    d = load_table(spark, sf_dir, "documents")
    capped = curation.cap_per_stratum(
        d,
        stratum="source",
        key="doc_id",
        cap=10,
        order_by=[F.col("n_chars").desc(), F.col("doc_id")],
    )
    return capped.select("source", "doc_id", "n_chars", "stratum_rank")


CAP_ORACLE = """
SELECT source, doc_id, n_chars, CAST(stratum_rank AS INT) AS stratum_rank
FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS stratum_rank
  FROM documents
)
WHERE stratum_rank <= 10
"""


def corpus_contamination_scan(spark, sf_dir):
    """Benchmark decontamination: treat src0 docs as the benchmark set and
    find corpus docs (all other sources) sharing >= 3 distinct word 5-grams.
    Shingles are md5'd JVM-side; the benchmark side broadcasts."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("source") == "src0")
    corpus = d.filter(F.col("source") != "src0")
    return curation.contamination_pairs(
        corpus, bench, key="doc_id", text="text", n=5, min_shared=3
    )


CONTAMINATION_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, source, md5(array_to_string(w[i:i+4], ' ')) AS gram
  FROM toks, UNNEST(generate_series(1, len(w) - 4)) AS t(i)
  WHERE len(w) >= 5
)
SELECT b.doc_id AS bench_doc_id, c.doc_id AS corpus_doc_id,
       count(*) AS shared_ngrams
FROM grams b
JOIN grams c ON b.gram = c.gram
WHERE b.source = 'src0' AND c.source <> 'src0'
GROUP BY b.doc_id, c.doc_id
HAVING count(*) >= 3
"""


def corpus_pack_sequences(spark, sf_dir):
    """Pack docs into 400-token bins per source shard (contiguous greedy by
    doc_id), summarized per bin.  last_doc/first_doc pin exact layout."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    packed = curation.pack_sequences(d, shard="source", key="doc_id", n_tokens=toks, budget=400)
    return packed.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


PACK_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
  FROM t
)
SELECT source, start_tok // 400 AS bin_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c
GROUP BY source, start_tok // 400
"""


QUERIES = {
    "corpus_split_train_val_test": Query(
        corpus_split_train_val_test, SPLIT_ORACLE, ("corpus", "curation")
    ),
    "corpus_cap_per_source": Query(corpus_cap_per_source, CAP_ORACLE, ("corpus", "curation")),
    "corpus_contamination_scan": Query(
        corpus_contamination_scan, CONTAMINATION_ORACLE, ("corpus", "curation", "dedup")
    ),
    "corpus_pack_sequences": Query(
        corpus_pack_sequences, PACK_ORACLE, ("corpus", "curation")
    ),
}
