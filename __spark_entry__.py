"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (TPC-H Q1 shape) on sf0.001.
queries()     -> one entry per implemented operator from SURVEY.md §2 plus the
                 training-data pipeline operators; see
                 tensorbase_spark/queries/* for implementations.
oracle_sql()  -> matching DuckDB SQL per query (None/omitted for approximate
                 operators — MinHash LSH, SimHash, IVF ANN, HLL — which get
                 the driver's rows-only check and bounded-error pytest
                 coverage instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tensorbase_spark.queries import registry
from tensorbase_spark.session import tune_session

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    reg = registry()
    return reg["q1_pricing_summary"].fn(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for name, q in registry().items():
        def make(fn):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                tune_session(spark)
                return fn(spark, sf_dir)

            return run

        out[name] = make(q.fn)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
