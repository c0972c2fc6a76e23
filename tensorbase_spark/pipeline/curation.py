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


def bloom_decontaminate_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    n: int = 5,
    min_shared: int = 3,
    bits_per_key: int = 16,
) -> DataFrame:
    """``contamination_pairs`` with a Bloom prefilter on the corpus gram
    stream — the 100 TB shape of benchmark decontamination.

    Where the plain scan joins EVERY corpus gram against the benchmark gram
    set, this builds a Bloom bitmap over the benchmark grams (k=2 probes of
    ``xxhash64(gram, seed)``, m = 16 bits/key rounded to a power of two,
    FP ~1.3%) as a tiny (block -> 64-bit word) table, broadcasts it, and
    keeps only corpus grams whose two probe bits are both set.  Survivors
    (true matches + ~1% FPs) then take the exact gram join, so the result
    is IDENTICAL to ``contamination_pairs`` — Bloom false positives are
    verified away, false negatives are impossible.

    At scale: the bitmap for 1M benchmark grams is 2 MB (vs ~10-100 MB of
    raw gram rows), every probe is a map-side broadcast hash-join lookup,
    and the exact join's shuffle shrinks to ~1% of the gram stream.  The
    only driver-side value is one count() on the benchmark gram universe
    (bitmap sizing).
    """
    gram_udf = hashing.word_ngram_hash_set(n)
    bench_grams = benchmark.select(
        F.col(key).alias("bench_doc_id"),
        F.explode(gram_udf(F.col(text))).alias("gram"),
    )
    universe = bench_grams.select("gram").distinct()
    n_keys = max(universe.count(), 1)
    m = 1 << max(10, (n_keys * bits_per_key - 1).bit_length())
    seeds = (0x9E3779B9, 0x85EBCA6B)

    def probe(side, i):
        p = f"pmod(xxhash64(gram, {seeds[i]}), {m})"
        return side.withColumn(f"block{i}", F.expr(f"({p}) div 64")).withColumn(
            f"bit{i}", F.expr(f"shiftleft(cast(1 as bigint), cast(({p}) % 64 as int))")
        )

    bloom = (
        probe(probe(universe, 0), 1)
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("block0").alias("block"), F.col("bit0").alias("bit")),
                    F.struct(F.col("block1").alias("block"), F.col("bit1").alias("bit")),
                )
            ).alias("p")
        )
        .select("p.block", "p.bit")
        .groupBy("block")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )

    corpus_grams = probe(
        probe(
            docs.select(
                F.col(key).alias("corpus_doc_id"),
                F.explode(gram_udf(F.col(text))).alias("gram"),
            ),
            0,
        ),
        1,
    )
    b0 = bloom.select(F.col("block").alias("b0_block"), F.col("bits").alias("b0_bits"))
    b1 = bloom.select(F.col("block").alias("b1_block"), F.col("bits").alias("b1_bits"))
    candidates = (
        corpus_grams
        # inner joins: a gram whose probe block holds no bits is definitely
        # absent from the benchmark — dropped map-side
        .join(F.broadcast(b0), F.col("block0") == F.col("b0_block"))
        .join(F.broadcast(b1), F.col("block1") == F.col("b1_block"))
        .filter(
            (F.col("bit0").bitwiseAND(F.col("b0_bits")) != 0)
            & (F.col("bit1").bitwiseAND(F.col("b1_bits")) != 0)
        )
        .select("corpus_doc_id", "gram")
    )
    return (
        candidates.join(F.broadcast(bench_grams), "gram")
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


def dsir_importance_weights(
    docs: DataFrame,
    is_target: F.Column,
    key: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
    smoothing: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public): featurize every
    document as hashed unigram+bigram counts over ``buckets`` buckets, fit
    add-``smoothing`` multinomials for the target slice (rows where
    ``is_target``) and the raw corpus, and score each document
    ``log w(x) = Σ_b c_b(x) · (log p̂_target(b) − log q̂_raw(b))`` —
    rank/resample on ``dsir_logw`` to tilt a raw corpus toward a target
    domain.

    Plan (two corpus passes — DSIR's own fit-then-score structure):
    gram explode is map-side JVM (split + indexed-lambda bigrams); the
    fit pass is ONE keyed shuffle whose output is ≤ ``buckets`` rows per
    side — broadcast-sized BY CONSTRUCTION at any corpus size; the score
    pass broadcasts the log-ratio table onto the doc-gram explode and
    sums per doc in ONE keyed shuffle.  No Python anywhere.  The
    featurized grams feed BOTH passes, so they persist MEMORY_AND_DISK
    across the two branches (the materialize-features-once convention
    minhash dedup already uses) — measured 8.4 s → 2.0 s at sf0.1-10×.

    ``hash_fn``: 'xxhash64' (default) is the production path — one JVM
    codegen'd hash per gram; 'md5' trades ~3× hashing cost for
    engine-reproducible bucket membership (any verifier — DuckDB, plain
    Python — can replay it; sampling.hash_bucket), which is what the
    oracle-checked driver query uses."""
    words = F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
    heads = F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0)))
    bigrams = F.transform(
        heads, lambda x, i: F.concat_ws(" ", x, F.element_at(words, i + F.lit(2)))
    )
    if hash_fn == "xxhash64":
        b_col = F.pmod(F.xxhash64(F.col("gram")), F.lit(buckets)).cast("long")
    elif hash_fn == "md5":
        b_col = hash_bucket(F.col("gram"), buckets)
    else:
        raise ValueError(f"hash_fn must be xxhash64 or md5, got {hash_fn!r}")
    ex = (
        docs.select(
            F.col(key),
            is_target.alias("__tgt"),
            F.explode(F.concat(words, bigrams)).alias("gram"),
        )
        .withColumn("b", b_col)
        .drop("gram")
        .persist()
    )
    raw_ct = ex.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.sum(F.col("__tgt").cast("long")).alias("ct"),
    )
    tot = raw_ct.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    s, sb = float(smoothing), float(smoothing) * buckets
    ratio = raw_ct.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + s) / (F.col("tt") + sb))
            - F.log((F.col("cr") + s) / (F.col("tr") + sb))
        ).alias("lr"),
    )
    return (
        ex.join(F.broadcast(ratio), "b")
        .groupBy(key)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("lr").alias("dsir_logw"),
        )
    )
