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
    buckets per key.

    The salt is derived from each fact row's partition-local position
    (monotonically_increasing_id), so even byte-identical duplicate rows of
    a hot key — the classic dirty-ingest skew — spread evenly over the
    buckets; a content hash would send all duplicates to one reducer.
    Stable for a fixed input layout (ids derive from partition id + row
    position), including task retries.

    Only fact-preserving join types are allowed: the dim side is replicated
    n_salts ways, so 'right'/'full' would emit each unmatched dim row
    n_salts times."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched dim rows "
            "n_salts times; use a plain join for right/full outer"
        )
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = fact_s.join(dim_s, [on, "__salt"], how)
    return out.drop("__salt")
