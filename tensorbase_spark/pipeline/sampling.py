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

from pyspark.sql import Column, DataFrame
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
