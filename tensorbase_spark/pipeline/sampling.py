"""Deterministic sampling for corpus construction.

The reference has no sampling surface; this is part of the training-data
pipeline extension (BASELINE.json north_star).  The scale-critical property
is that sampling is a *pure map*: membership is a hash of the row key, so it
needs no shuffle, no state, and the same row set is selected on every
executor layout, retry, and re-run — unlike rand()-based sampling.

At 100 TB: `stratified_sample` composes with predicate pushdown (the hash
predicate does not push to parquet, but the source/quota CASE prunes via
dictionary filters) and costs one codegen'd projection per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable [0, buckets) bucket from the first 8 md5 hex digits of the key.

    md5 (not xxhash64) so any other engine — the DuckDB oracle, a Python
    verifier, the reference itself — reproduces the exact sample membership.
    """
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def stratified_sample(
    df: DataFrame, key: str, stratum: str, quotas: dict[str, int], default: int = 10
) -> DataFrame:
    """Keep rows whose hash bucket falls under their stratum's quota
    (percent).  Deterministic per-key; no shuffle."""
    quota = F.lit(default)
    for name, pct in sorted(quotas.items()):
        quota = F.when(F.col(stratum) == name, F.lit(pct)).otherwise(quota)
    return df.withColumn("__bucket", hash_bucket(F.col(key))).filter(
        F.col("__bucket") < quota
    ).drop("__bucket")


def temperature_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    alpha: float = 0.5,
    budget: int = 1000,
    method: str = "rank",
) -> DataFrame:
    """Temperature-scaled stratum sampling (the multilingual-pretraining
    rebalance: sample stratum *s* with probability ∝ count(s)^alpha, alpha<1
    up-weighting tail languages/sources — XLM/mT5's q_l ∝ p_l^α).

    Deterministic twofold: per-stratum quotas derive from exact counts
    (weights rounded to 6 dp so the tiny weight sum is exact in double and
    any engine reproduces the same quotas), and membership within a stratum
    is the md5-rank order (not rand()), so the same rows are kept on every
    re-run, retry, and engine.

    Scale: count aggregate (one partial-agg shuffle), a broadcast join of
    the few-row quota table back onto the corpus, then EITHER
    - ``method="rank"`` (default, exact): ONE row_number window shuffled on
      the stratum key.  Exact quotas, but each stratum is a single window
      partition — with few huge strata (5 languages over 100 TB) the head
      stratum serializes on one reducer.  Right for many-strata corpora
      (domains, sources) and for the oracle-checked fixture path; or
    - ``method="threshold"`` (scale path): keep a row iff its md5 bucket
      over ``resolution`` falls under quota*resolution/n_s — a PURE MAP
      (no shuffle, no skew, no hotspot) whose kept-set is still a
      deterministic function of the key; quota lands within
      ±O(sqrt(quota)) of exact (binomial jitter), which is immaterial for
      sampling but not hash-stable across engines — hence rank stays the
      oracle form."""
    w = F.round(F.pow(F.count("*"), F.lit(alpha)), 6)
    quotas = df.groupBy(F.col(stratum).alias("__s")).agg(
        w.alias("__w"), F.count("*").alias("__n")
    )
    total_w = quotas.agg(F.sum("__w").alias("__tw"))
    quotas = quotas.crossJoin(F.broadcast(total_w)).select(
        "__s",
        "__n",
        F.floor(F.lit(float(budget)) * F.col("__w") / F.col("__tw") + F.lit(1e-9))
        .cast("long")
        .alias("__quota"),
    )
    joined = df.join(F.broadcast(quotas), F.col(stratum) == F.col("__s"))
    if method == "threshold":
        resolution = 1 << 20
        bucket = (
            F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10)
            .cast("long")
            % resolution
        )
        cut = F.least(
            F.lit(resolution).cast("long"),
            (F.lit(resolution) * F.col("__quota") / F.col("__n")).cast("long"),
        )
        return (
            joined.filter(bucket < cut)
            .withColumn("sample_rank", F.lit(None).cast("long"))
            .drop("__s", "__n", "__quota")
        )
    rank_w = Window.partitionBy(stratum).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    return (
        joined.withColumn("sample_rank", F.row_number().over(rank_w))
        .filter(F.col("sample_rank") <= F.col("__quota"))
        .drop("__s", "__n", "__quota")
    )


def shuffle_shards(
    df: DataFrame, key: str, n_shards: int = 8, seed: str = "shard"
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``shard`` in [0, n_shards) and a dense ``position`` within its shard,
    both pure functions of the row key — the md5-of-(seed||key) order is
    uniform pseudo-random but exactly reproducible by any engine (unlike
    rand() or a cluster-layout-dependent repartition).  Changing ``seed``
    re-deals the whole ordering for a new epoch.

    Scale: shard assignment is a pure map; the position is one row_number
    window shuffled on the shard key — n_shards partitions of |df|/n_shards
    rows each, the same layout the downstream trainer reads, so the shuffle
    that materializes shards IS the training-data write."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(key).cast("string")))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).alias(
        "shard"
    )
    pos_w = Window.partitionBy("shard").orderBy(F.md5(
        F.concat(F.lit(seed), F.lit("#"), F.col(key).cast("string"))
    ), F.col(key))
    return df.withColumn("shard", shard).withColumn(
        "position", F.row_number().over(pos_w).cast("long")
    )


def mixture_to_budget(
    df: DataFrame,
    stratum: str,
    key: str,
    n_tokens: Column,
    weights: dict[str, float],
    budget: int,
) -> DataFrame:
    """Sample a corpus down to a TOKEN budget with a declared mixture —
    the training-mix construction step ("40% web, 30% code, ..." at N
    tokens total).  Each stratum's token quota is ``budget * w / sum(w)``;
    membership is greedy in md5-hash order (not rand()), a doc is kept when
    its cumulative-token START offset lies under the quota (overrun bounded
    by one doc per stratum — the pack_sequences convention).  Strata
    without a declared weight contribute nothing.

    Scale shape: one window shuffle on the stratum key; membership is a
    deterministic function of (key hash, quota), so retries/re-runs/other
    engines reproduce the same mix exactly — DuckDB-oracle-checkable."""
    total_w = sum(weights.values())
    quota = F.lit(0.0)
    for name, w in sorted(weights.items()):
        quota = F.when(
            F.col(stratum) == name, F.lit(budget * w / total_w)
        ).otherwise(quota)
    w_ord = (
        Window.partitionBy(stratum)
        .orderBy(F.md5(F.col(key).cast("string")), key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = df.withColumn("n_tokens", n_tokens.cast("long"))
    start = F.sum("n_tokens").over(w_ord) - F.col("n_tokens")
    return d.withColumn("__start", start).filter(F.col("__start") < quota).drop(
        "__start"
    )
