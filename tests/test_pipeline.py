"""Pipeline DAG executor tests (core_spark.pipeline) — the engine analog of
the reference's PipelineJobExecute (pipelines/execute/job.py:160-204):
source -> transformer -> destination flow, dependency ordering, settings
merge, cycle detection, multi-input steps.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from core_spark.pipeline import (
    PipelineJob,
    PipelineJobExecute,
    PipelineStep,
    PipelineTask,
)

SF = "/root/testdata/sf0.001"


class ParquetSource:
    def __init__(self, path: str):
        self.path = path

    @staticmethod
    def settings() -> dict:
        return {"spark.sql.session.timeZone": "UTC"}

    def read_batch(self, spark):
        return spark.read.parquet(self.path)


class ParquetSink:
    def __init__(self, path: str):
        self.path = path

    def write_batch(self, df):
        df.write.mode("overwrite").parquet(self.path)
        return self.path


def agg_by_type(df):
    return df.groupBy("event_type").agg(F.count("*").alias("n"))


def join_types(left, right):
    return left.join(right, "event_type")


def test_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "out")
    job = PipelineJob(
        name="job1",
        task_list=[
            PipelineTask(
                name="t1",
                batch_task=True,
                step_list=[
                    PipelineStep(
                        name="src",
                        component=ParquetSource(f"{SF}/events.parquet"),
                        provide_output_to_step=["agg"],
                    ),
                    PipelineStep(
                        name="agg",
                        component=agg_by_type,
                        provide_output_to_step=["sink"],
                    ),
                    PipelineStep(name="sink", component=ParquetSink(out)),
                ],
            )
        ],
    )
    results = PipelineJobExecute(job, spark).run()
    assert results["t1.sink"] == out
    # settings() fragment merged before the task ran
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    back = spark.read.parquet(out)
    assert back.count() == 5  # five event types
    assert set(back.columns) == {"event_type", "n"}


def test_pipeline_declaration_order_is_not_execution_order(spark, tmp_path):
    """Steps listed out of order still run producer-first (Kahn sort)."""
    out = str(tmp_path / "out2")
    steps = [
        PipelineStep(name="sink", component=ParquetSink(out), depends_on_step=["agg"]),
        PipelineStep(name="agg", component=agg_by_type, depends_on_step=["src"],
                     provide_output_to_step=["sink"]),
        PipelineStep(name="src", component=ParquetSource(f"{SF}/events.parquet"),
                     provide_output_to_step=["agg"]),
    ]
    job = PipelineJob(name="j", task_list=[PipelineTask(name="t", step_list=steps)])
    PipelineJobExecute(job, spark).run()
    assert spark.read.parquet(out).count() == 5


def test_pipeline_multi_input_join(spark):
    """A step with two depends_on_step inputs receives both, in declaration
    order (the reference can thread only one upstream result)."""
    job = PipelineJob(
        name="j",
        task_list=[
            PipelineTask(
                name="t",
                step_list=[
                    PipelineStep(name="a", component=ParquetSource(f"{SF}/events.parquet"),
                                 provide_output_to_step=["joined"]),
                    PipelineStep(name="b", component=ParquetSource(f"{SF}/events.parquet"),
                                 provide_output_to_step=["joined"]),
                    PipelineStep(name="joined", component=lambda l, r: join_types(agg_by_type(l), agg_by_type(r).withColumnRenamed("n", "m")),
                                 depends_on_step=["a", "b"]),
                ],
            )
        ],
    )
    res = PipelineJobExecute(job, spark).run()
    rows = res["t.joined"].collect()
    assert len(rows) == 5 and all(r["n"] == r["m"] for r in rows)


def test_pipeline_cycle_detection(spark):
    steps = [
        PipelineStep(name="x", component=agg_by_type, depends_on_step=["y"]),
        PipelineStep(name="y", component=agg_by_type, depends_on_step=["x"]),
    ]
    job = PipelineJob(name="j", task_list=[PipelineTask(name="t", step_list=steps)])
    with pytest.raises(ValueError, match="cycle"):
        PipelineJobExecute(job, spark).run()


def test_pipeline_unknown_dep_and_bad_name(spark):
    with pytest.raises(ValueError, match="invalid name"):
        PipelineStep(name="BadName", component=agg_by_type)
    steps = [PipelineStep(name="a", component=agg_by_type, depends_on_step=["nope"])]
    job = PipelineJob(name="j", task_list=[PipelineTask(name="t", step_list=steps)])
    with pytest.raises(ValueError, match="unknown node"):
        PipelineJobExecute(job, spark).run()


def test_pipeline_task_ordering(spark):
    """Tasks honor depends_on_task even when declared consumer-first —
    the reference's list==str comparison (job.py:75) never orders these."""
    ran = []

    class Util:
        def __init__(self, tag):
            self.tag = tag

        def execute(self):
            ran.append(self.tag)
            return self.tag

    job = PipelineJob(
        name="j",
        task_list=[
            PipelineTask(name="second", depends_on_task=["first"],
                         step_list=[PipelineStep(name="u2", component=Util("second"))]),
            PipelineTask(name="first",
                         step_list=[PipelineStep(name="u1", component=Util("first"))]),
        ],
    )
    PipelineJobExecute(job, spark).run()
    assert ran == ["first", "second"]
