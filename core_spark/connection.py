"""DBAPI-style connection facade over a SparkSession (reference
connectors/grpc/spark_connector.py:23-120).

The reference's query layer talks to engines through a
connect/cursor/execute/fetch_all interface (connectors/connection_interface
.py, cursor_interface.py); ``SparkConnection`` is its Spark implementation.
Kept here so a reference user's calling code ports verbatim; the fluent
builders (query_builder.py, weather.py) take the SparkSession directly.

Divergence: when no session is supplied we build one through
``core_spark.session.get_spark`` (UTC-pinned, AQE on) instead of the
reference's SparkClient; ``spark_remote`` maps to ``builder.remote`` (Spark
Connect) unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class SparkConnection:
    """Connection over an existing or newly-built SparkSession
    (spark_connector.py:23-66)."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        spark_configuration: dict | None = None,
        spark_remote: str | None = None,
    ) -> None:
        if spark is not None:
            self.connection = spark
        elif spark_remote is not None:
            builder = SparkSession.builder.remote(spark_remote)
            for k, v in (spark_configuration or {}).items():
                builder = builder.config(k, v)
            self.connection = builder.getOrCreate()
        else:
            from .session import get_spark

            self.connection = get_spark("core_spark-connection")
            for k, v in (spark_configuration or {}).items():
                self.connection.conf.set(k, v)

    def close(self) -> None:
        """Not relevant for spark sessions (spark_connector.py:52-54)."""

    def cursor(self) -> "SparkCursor":
        return SparkCursor(self.connection)


class SparkCursor:
    """Execute Spark SQL and hand back the result frame
    (spark_connector.py:69-120)."""

    def __init__(self, cursor: SparkSession) -> None:
        self.cursor = cursor
        self.execute_result: DataFrame | None = None

    def execute(self, query: str) -> None:
        self.execute_result = self.cursor.sql(query)

    def fetch_all(self) -> DataFrame:
        if self.execute_result is None:
            raise RuntimeError("execute() a query before fetch_all()")
        return self.execute_result

    def close(self) -> None:
        """Not relevant for dataframes (spark_connector.py:118-120)."""
