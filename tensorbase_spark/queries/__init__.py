"""Operator-coverage query registry.

Every implemented operator from SURVEY.md §2 (and the pipeline extensions)
is represented by a named Query: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus the equivalent ANSI SQL that DuckDB runs on the same parquet files as the
correctness oracle.  ``__spark_entry__.py`` exposes this registry to the driver.

Parity rules (driver hash-compares order-insensitively, columns sorted by name):
- alias every computed column identically in both forms;
- round double aggregates to a fixed scale in BOTH forms (double summation
  order differs between engines; rounding makes the hash stable);
- cast DuckDB's HUGEINT sums back to BIGINT to match Spark's long;
- cast ns-precision timestamps to µs in the oracle (Spark reads parquet ns
  as µs) — ``CAST(ts AS TIMESTAMP)``;
- LIMIT/top-k queries must use a total (tie-free) ordering.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


def registry() -> dict[str, Query]:
    from tensorbase_spark.queries import (
        chdialect,
        chfuncs,
        curation_q,
        engine_queries,
        funnelq,
        pipeline,
        relational,
        scalars,
        sources_q,
        streamingq,
        tpch_extra,
        windows,
    )

    out: dict[str, Query] = {}
    for mod in (
        relational,
        tpch_extra,
        windows,
        chfuncs,
        chdialect,
        scalars,
        pipeline,
        curation_q,
        engine_queries,
        funnelq,
        streamingq,
        sources_q,
    ):
        for name, q in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = q
    return out
