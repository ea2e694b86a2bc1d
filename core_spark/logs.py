"""Runtime logging subsystem (reference pipelines/logging/*).

- ``LoggerManager`` — singleton registry of application loggers
  (logger_manager.py:25-82);
- ``DataFrameLogHandler`` — captures records for inspection as a Spark
  DataFrame (spark/dataframe/dataframe_log_handler.py:24-72);
- ``FileLogHandler`` — appends pipe-delimited lines to a log file
  (spark/log_file/file_log_handler.py:21-61);
- ``RuntimeLogCollector`` — attaches the handlers to managed loggers
  (spark/runtime_log_collector.py:30-73).

Deliberate divergences (both are latent defects in the reference):
- the reference's DataFrame handler runs ``logs_df.union(createDataFrame([row]))``
  on EVERY record (dataframe_log_handler.py:66) — per-record Spark jobs and a
  lineage chain that grows with the log count. Log emission must never touch
  the cluster: records buffer in a plain list and materialize once, on read;
- the reference's file handler writes ``str({f"..."})`` — a Python *set*
  repr around each line (file_log_handler.py:47-53); we write the line itself.
"""

from __future__ import annotations

import logging
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LOG_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("name", T.StringType()),
        T.StructField("level", T.StringType()),
        T.StructField("message", T.StringType()),
    ]
)


class LoggerManager:
    """Singleton creation/storage of application loggers
    (logger_manager.py:25-82)."""

    _instance: "LoggerManager | None" = None
    _initialized = False
    loggers: dict[str, logging.Logger] = {}

    def __new__(cls) -> "LoggerManager":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __init__(self) -> None:
        if not LoggerManager._initialized:
            logging.basicConfig(
                level=logging.INFO,
                format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
            )
            LoggerManager._initialized = True

    @classmethod
    def create_logger(cls, name: str) -> logging.Logger:
        if name not in cls.loggers:
            cls.loggers[name] = logging.getLogger(name)
        return cls.loggers[name]

    @classmethod
    def get_logger(cls, name: str) -> logging.Logger | None:
        return cls.loggers.get(name)

    @classmethod
    def get_all_loggers(cls) -> dict[str, logging.Logger]:
        return cls.loggers


class DataFrameLogHandler(logging.Handler):
    """Buffer log records driver-side; materialize a DataFrame on demand."""

    def __init__(self, spark: SparkSession) -> None:
        super().__init__()
        self.spark = spark
        self._rows: list[tuple[datetime, str, str, str]] = []

    def emit(self, record: logging.LogRecord) -> None:
        self._rows.append(
            (
                datetime.fromtimestamp(record.created, tz=timezone.utc).replace(
                    tzinfo=None
                ),
                record.name,
                record.levelname,
                record.getMessage(),
            )
        )

    def get_logs_as_df(self) -> DataFrame:
        return self.spark.createDataFrame(self._rows, LOG_SCHEMA)


class FileLogHandler(logging.Handler):
    """Append ``iso_ts | name | LEVEL | message`` lines to a file."""

    def __init__(self, file_path: str, mode: str = "a") -> None:
        super().__init__()
        self.file_path = file_path
        self.mode = mode

    def emit(self, record: logging.LogRecord) -> None:
        try:
            line = (
                f"{datetime.fromtimestamp(record.created).isoformat()} | "
                f"{record.name} | {record.levelname} | {record.getMessage()}\n"
            )
            with open(self.file_path, self.mode, encoding="utf-8") as f:
                f.write(line)
        except Exception as e:  # logging must never raise into the app
            print(f"Error writing log entry to file: {e}")


class RuntimeLogCollector:
    """Attach capture handlers to LoggerManager loggers
    (runtime_log_collector.py:30-73)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.logger_manager = LoggerManager()

    def attach_dataframe_handler_to_logger(
        self, logger_name: str
    ) -> DataFrameLogHandler:
        handler = DataFrameLogHandler(self.spark)
        logger = self.logger_manager.get_logger(logger_name)
        if logger is not None and handler not in logger.handlers:
            logger.addHandler(handler)
        return handler

    def attach_file_handler_to_loggers(
        self, filename: str, path: str = ".", mode: str = "a"
    ) -> FileLogHandler:
        handler = FileLogHandler(os.path.join(path, filename), mode)
        for logger in self.logger_manager.get_all_loggers().values():
            if handler not in logger.handlers:
                logger.addHandler(handler)
        return handler
