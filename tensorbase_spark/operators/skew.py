"""Skew-handling join utility: explicit key salting.

AQE's skew-join splitting (on in session.py) handles runtime-detected skew
in sort-merge joins; explicit salting is the complementary tool when a hot
key is KNOWN (the null key, a celebrity user, an empty-string document) and
the join is hash-based or the skew must be fixed before an aggregation.

Pattern: fact side gets a random-but-deterministic salt in [0, n); the dim
side is exploded n ways so every (key, salt) pair still matches.  The
shuffle key becomes (key, salt) — the hot key's rows spread over n reducers
instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on `on` with the shuffle spread over n_salts
    buckets per key.  Deterministic: the salt is a hash of the fact row's
    whole key tuple, not rand(), so retries and re-runs shuffle
    identically."""
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = fact_s.join(dim_s, [on, "__salt"], how)
    return out.drop("__salt")
