"""tensorbase_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of tensorbase/tensorbase.

The reference (TensorBase, Rust) is a thin ClickHouse-dialect front end +
partitioned columnar store over a vendored DataFusion fork (see SURVEY.md §0).
This package is the same shape re-expressed Spark-first:

- ``session``   — tuned SparkSession bootstrap (AQE, UTC, Arrow).
- ``types``     — BqlType → Spark type mapping (reference:
                  crates/meta/src/types.rs:96-111).
- ``functions`` — ClickHouse scalar-function shim as built-in Column
                  expressions (reference: crates/datafusion/src/physical_plan/
                  clickhouse.rs).
- ``dialect``   — ClickHouse-SQL → Spark-SQL translation layer (reference:
                  crates/lang/src/bql.pest grammar).
- ``catalog``   — DDL/DML over a Parquet warehouse with expression
                  partitioning (reference: crates/meta/src/store/parts.rs,
                  crates/runtime/src/write.rs).
- ``queries``   — the operator-coverage query registry exposed through
                  ``__spark_entry__.py``.
- ``pipeline``  — large-scale training-data operators (dedup, similarity
                  search, text analysis, multimodal) beyond the reference's
                  own surface.
"""

from tensorbase_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session"]
