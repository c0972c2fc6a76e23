from tensorbase_spark.functions import clickhouse

__all__ = ["clickhouse"]
