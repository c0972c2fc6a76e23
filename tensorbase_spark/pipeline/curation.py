"""Corpus curation operators: split / cap / contamination / packing.

The reference has no corpus surface; these are training-data pipeline
extensions (BASELINE.json north_star) built as pure DataFrame transforms:

- ``train_val_test_split``: hash-deterministic membership (same md5-bucket
  scheme as ``sampling.hash_bucket``) — a pure map, no shuffle, and any
  other engine can re-derive the exact split for audit.
- ``cap_per_stratum``: bounded docs-per-source via a row_number window —
  one shuffle on the stratum key; ties broken totally so re-runs keep the
  same rows.
- ``contamination_pairs``: benchmark leakage scan — word n-gram shingles
  hashed JVM-side (transform+slice+md5, no Python UDF), benchmark side
  broadcast, shared-shingle count per (benchmark doc, corpus doc).
- ``pack_sequences``: contiguous greedy packing of documents into
  fixed-token-budget bins per shard (cumulative-sum window, exact integer
  division).  Packing is per-shard so it needs one shuffle and stays
  embarrassingly parallel at 100 TB; bins are addressable as
  (shard, bin_id).

Scale notes: split/cap/pack shuffle at most once on the stratum/shard key.
Contamination broadcasts the benchmark shingle set (benchmarks are small by
construction); if the benchmark outgrows the broadcast threshold AQE demotes
the join to shuffled-hash on the shingle key, which stays uniform because
shingles are md5 hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tensorbase_spark.pipeline import hashing
from tensorbase_spark.pipeline.sampling import hash_bucket


def train_val_test_split(
    df: DataFrame, key: str, test_pct: int = 10, val_pct: int = 10
) -> DataFrame:
    """Adds a deterministic ``split`` column ('train'/'val'/'test').

    Membership is md5(key)-bucketed (not rand()): stable across retries,
    executor layouts, and engines — required for reproducible training sets.
    """
    b = hash_bucket(F.col(key), 100)
    return df.withColumn(
        "split",
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def cap_per_stratum(
    df: DataFrame, stratum: str, key: str, cap: int, order_by: list | None = None
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, preferring ``order_by`` (must
    end in a unique tie-breaker for deterministic membership)."""
    order = order_by if order_by is not None else [F.col(key)]
    w = Window.partitionBy(stratum).orderBy(*order)
    return (
        df.withColumn("stratum_rank", F.row_number().over(w))
        .filter(F.col("stratum_rank") <= cap)
    )


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    n: int = 5,
    min_shared: int = 3,
) -> DataFrame:
    """(benchmark doc, corpus doc, shared n-gram count) for pairs sharing at
    least ``min_shared`` distinct word n-grams — the standard benchmark-
    decontamination scan.  Only docs with >= n tokens shingle.

    Grams are 64-bit hashes from ONE Arrow-batched pass (the per-doc set is
    already distinct, so no (doc, gram) distinct shuffle exists at all) —
    the r2 shape built md5 strings through interpreted transform/slice
    lambdas and then paid two distinct shuffles: 2.6 s -> 1.2 s at sf0.1
    for identical shared counts (a hash collision perturbing a count is a
    ~2^-64-per-pair event; same reasoning as the minhash verify sets)."""
    gram_udf = hashing.word_ngram_hash_set(n)

    def explode_shingles(df: DataFrame, out_key: str) -> DataFrame:
        return df.select(
            F.col(key).alias(out_key), F.explode(gram_udf(F.col(text))).alias("gram")
        )

    bench_grams = explode_shingles(benchmark, "bench_doc_id")
    corpus_grams = explode_shingles(docs, "corpus_doc_id")
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("bench_doc_id", "corpus_doc_id")
        .agg(F.count("*").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def pack_sequences(
    df: DataFrame, shard: str, key: str, n_tokens: F.Column, budget: int
) -> DataFrame:
    """Assign each doc to a fixed-token-budget bin within its shard.

    Contiguous greedy packing: docs are laid out in ``key`` order and a doc
    belongs to the bin its *starting* token offset falls in (exact integer
    division — no float).  A doc may straddle a boundary; budget overrun is
    bounded by one doc, which is the standard approximation stream packers
    make.  One shuffle (the shard partition); bins are (shard, bin_id).
    """
    w = (
        Window.partitionBy(shard)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = df.withColumn("n_tokens", n_tokens.cast("long"))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    # exact integer division: start - start%budget is a multiple of budget,
    # and doubles represent integers exactly below 2^53
    return df.withColumn("start_tok", start).withColumn(
        "bin_id",
        ((F.col("start_tok") - F.col("start_tok") % budget) / budget).cast("long"),
    )
