"""Pipeline JSON converters (reference converters/pipeline_job_json.py) and
runtime logging (reference pipelines/logging/*)."""

from __future__ import annotations

import json
import logging

from pyspark.sql import functions as F

from core_spark.converters import pipeline_job_from_json, pipeline_job_to_json
from core_spark.logs import DataFrameLogHandler, FileLogHandler, LoggerManager, RuntimeLogCollector
from core_spark.pipeline import PipelineJob, PipelineJobExecute, PipelineStep, PipelineTask


class ParquetSource:
    def __init__(self, path: str):
        self.path = path

    def read_batch(self, spark):
        return spark.read.parquet(self.path)


def count_by_type(df):
    return df.groupBy("event_type").agg(F.count("*").alias("n"))


def _job(path: str) -> PipelineJob:
    return PipelineJob(
        name="j",
        task_list=[
            PipelineTask(
                name="t",
                step_list=[
                    PipelineStep(
                        name="src",
                        component=ParquetSource(path),
                        component_parameters={"path": path},
                        provide_output_to_step=["agg"],
                    ),
                    PipelineStep(name="agg", component=count_by_type),
                ],
            )
        ],
    )


def test_json_round_trip_executes(spark, tmp_path):
    src = str(tmp_path / "e.parquet")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0)], "event_type string, value double"
    ).write.mode("overwrite").parquet(src)

    text = pipeline_job_to_json(_job(src))
    doc = json.loads(text)
    assert doc["task_list"][0]["step_list"][0]["component"] == "ParquetSource"

    rebuilt = pipeline_job_from_json(
        text, {"ParquetSource": ParquetSource, "count_by_type": count_by_type}
    )
    # class factory was constructed from component_parameters
    assert isinstance(rebuilt.task_list[0].step_list[0].component, ParquetSource)
    results = PipelineJobExecute(rebuilt, spark).run()
    out = {r.event_type: r.n for r in results["t.agg"].collect()}
    assert out == {"a": 2, "b": 1}


def test_from_json_rejects_unregistered_component(tmp_path):
    text = pipeline_job_to_json(_job(str(tmp_path)))
    try:
        pipeline_job_from_json(text, {"count_by_type": count_by_type})
        raise AssertionError("expected KeyError")
    except KeyError as e:
        assert "ParquetSource" in str(e)


def test_logger_manager_singleton_and_df_handler(spark):
    assert LoggerManager() is LoggerManager()
    logger = LoggerManager.create_logger("core_spark_test_logger")
    collector = RuntimeLogCollector(spark)
    handler = collector.attach_dataframe_handler_to_logger("core_spark_test_logger")
    logger.setLevel(logging.INFO)
    logger.info("hello %s", "world")
    logger.warning("beware")
    rows = handler.get_logs_as_df().orderBy("timestamp").collect()
    assert [(r.level, r.message) for r in rows] == [
        ("INFO", "hello world"),
        ("WARNING", "beware"),
    ]
    logger.removeHandler(handler)


def test_file_handler_lines(tmp_path):
    logger = LoggerManager.create_logger("core_spark_file_logger")
    handler = FileLogHandler(str(tmp_path / "run.log"))
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)
    logger.info("first")
    logger.error("second")
    logger.removeHandler(handler)
    lines = (tmp_path / "run.log").read_text().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].endswith("| core_spark_file_logger | INFO | first")
    assert lines[1].endswith("| core_spark_file_logger | ERROR | second")


def test_default_component_registry():
    from core_spark.converters import default_component_registry

    reg = default_component_registry()
    # sources/sinks by class name, transformers by function name
    for expected in (
        "KafkaSource", "RestSink", "MISODailyLoadSource",
        "PJMDailyPricingSource", "pcdm_normalize", "raw_to_mdm",
        "london_smart_meter_to_usage",
    ):
        assert expected in reg, expected
    assert all(not k.startswith("_") for k in reg)
