"""Streaming expectations gate: per-micro-batch quarantine + metrics with
replay-idempotent lineage (streaming/quality.QualityGateSink).
"""

from __future__ import annotations

import pandas as pd
import pytest

from core_spark.operators import expectations as ex
from core_spark.streaming.quality import QualityGateSink
from core_spark.streaming.sink import MergeSink


@pytest.fixture()
def suite():
    s = ex.ExpectationSuite("gate")
    s.add_expectation(
        ex.build_expectation(
            "expect_column_values_to_be_between", {"column": "v", "max_value": 100}
        )
    )
    s.add_expectation(
        ex.build_expectation(
            "expect_column_values_to_not_be_null", {"column": "k"}
        )
    )
    return s


def _write_input(spark, path, rows):
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    spark.createDataFrame(pdf, "k string, ts timestamp, v double").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_gate_splits_and_is_replay_idempotent(spark, tmp_path):
    base = pd.Timestamp("2024-05-01")
    in_dir = str(tmp_path / "in")
    _write_input(
        spark,
        in_dir,
        [
            ("a", base, 1.0),
            ("b", base, 500.0),  # fails between
            (None, base, 2.0),  # fails not_null
            ("c", base, 3.0),
        ],
    )
    table = str(tmp_path / "table")
    qdir = str(tmp_path / "quarantine")
    mdir = str(tmp_path / "metrics")
    ck = str(tmp_path / "ck")

    s = ex.ExpectationSuite("gate")
    s.add_expectation(
        ex.build_expectation(
            "expect_column_values_to_be_between", {"column": "v", "max_value": 100}
        )
    )
    s.add_expectation(
        ex.build_expectation("expect_column_values_to_not_be_null", {"column": "k"})
    )
    gate = QualityGateSink(
        MergeSink(table, ["ts", "k"]), s, quarantine_dir=qdir, metrics_dir=mdir
    )

    sdf = spark.readStream.schema("k string, ts timestamp, v double").parquet(in_dir)
    qy = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(gate.write_batch)
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination()

    main = spark.read.parquet(table).toPandas()
    assert sorted(main["k"].dropna()) == ["a", "c"]
    quar = spark.read.parquet(qdir).toPandas()
    assert len(quar) == 2
    fails = set(quar["failed_expectations"])
    assert "expect_column_values_to_be_between:v" in fails
    assert "expect_column_values_to_not_be_null:k" in fails
    met = spark.read.parquet(mdir).toPandas()
    assert len(met) == 1
    assert (
        met.iloc[0]["rows_in"],
        met.iloc[0]["rows_good"],
        met.iloc[0]["rows_quarantined"],
    ) == (4, 2, 2)

    # replay the SAME batch (fresh checkpoint, same input): quarantine +
    # metrics partitions are overwritten, not duplicated; main path's
    # MergeSink upserts by key
    ck2 = str(tmp_path / "ck2")
    qy2 = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", ck2)
        .foreachBatch(gate.write_batch)
        .trigger(availableNow=True)
        .start()
    )
    qy2.awaitTermination()
    assert len(spark.read.parquet(qdir).toPandas()) == 2
    assert len(spark.read.parquet(mdir).toPandas()) == 1
    main2 = spark.read.parquet(table).toPandas()
    assert sorted(main2["k"].dropna()) == ["a", "c"]


def _run_gate(spark, tmp_path, gate, in_dir, ck="ck"):
    sdf = spark.readStream.schema("k string, ts timestamp, v double").parquet(in_dir)
    qy = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / ck))
        .foreachBatch(gate.write_batch)
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination()


def test_gate_records_aggregate_expectations(spark, tmp_path):
    # default policy: a failed batch-level expectation is recorded in the
    # metrics lineage but the batch is still delivered
    base = pd.Timestamp("2024-05-01")
    in_dir = str(tmp_path / "in")
    _write_input(spark, in_dir, [("a", base, 10.0), ("b", base, 20.0)])
    s = ex.ExpectationSuite("gate")
    s.add_expectation(
        ex.build_expectation(
            "expect_column_mean_to_be_between", {"column": "v", "max_value": 5}
        )
    )
    s.add_expectation(
        ex.build_expectation(
            "expect_table_row_count_to_be_between", {"min_value": 1}
        )
    )
    table, mdir = str(tmp_path / "table"), str(tmp_path / "metrics")
    gate = QualityGateSink(MergeSink(table, ["ts", "k"]), s, metrics_dir=mdir)
    _run_gate(spark, tmp_path, gate, in_dir)
    assert len(spark.read.parquet(table).toPandas()) == 2  # delivered
    met = spark.read.parquet(mdir).toPandas()
    assert met.iloc[0]["agg_success"] == False  # noqa: E712 — numpy bool
    import json

    results = json.loads(met.iloc[0]["agg_results"])
    by_type = {r["expectation_type"]: r for r in results}
    assert not by_type["expect_column_mean_to_be_between"]["success"]
    assert by_type["expect_column_mean_to_be_between"]["observed_value"] == 15.0
    assert by_type["expect_table_row_count_to_be_between"]["success"]


def test_gate_quarantines_whole_batch_on_aggregate_failure(spark, tmp_path):
    base = pd.Timestamp("2024-05-01")
    in_dir = str(tmp_path / "in")
    _write_input(
        spark, in_dir, [("a", base, 10.0), ("b", base, 500.0), ("c", base, 20.0)]
    )
    s = ex.ExpectationSuite("gate")
    s.add_expectation(
        ex.build_expectation(
            "expect_column_values_to_be_between", {"column": "v", "max_value": 100}
        )
    )
    s.add_expectation(
        ex.build_expectation(
            "expect_column_mean_to_be_between", {"column": "v", "max_value": 5}
        )
    )
    table = str(tmp_path / "table")
    qdir, mdir = str(tmp_path / "quarantine"), str(tmp_path / "metrics")
    gate = QualityGateSink(
        MergeSink(table, ["ts", "k"]),
        s,
        quarantine_dir=qdir,
        metrics_dir=mdir,
        aggregate_policy="quarantine_batch",
    )
    _run_gate(spark, tmp_path, gate, in_dir)
    # nothing reaches the sink; ALL rows are quarantined (an empty merge
    # may leave a footer-less table dir — unreadable counts as empty)
    try:
        n_main = len(spark.read.parquet(table).toPandas())
    except Exception:
        n_main = 0
    assert n_main == 0
    quar = spark.read.parquet(qdir).toPandas().sort_values("k")
    assert len(quar) == 3
    # every row carries the batch-level failure; the row-level failure is
    # kept on the row that earned it
    assert all(
        "expect_column_mean_to_be_between:v" in f
        for f in quar["failed_expectations"]
    )
    b_tags = quar[quar["k"] == "b"]["failed_expectations"].iloc[0]
    assert "expect_column_values_to_be_between:v" in b_tags
    met = spark.read.parquet(mdir).toPandas()
    assert (
        met.iloc[0]["rows_in"],
        met.iloc[0]["rows_good"],
        met.iloc[0]["rows_quarantined"],
    ) == (3, 0, 3)
    assert met.iloc[0]["agg_success"] == False  # noqa: E712


def test_gate_fail_policy_fails_the_query(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    base = pd.Timestamp("2024-05-01")
    in_dir = str(tmp_path / "in")
    _write_input(spark, in_dir, [("a", base, 10.0)])
    s = ex.ExpectationSuite("gate")
    s.add_expectation(
        ex.build_expectation(
            "expect_table_row_count_to_be_between", {"max_value": 0}
        )
    )
    gate = QualityGateSink(
        MergeSink(str(tmp_path / "table"), ["ts", "k"]),
        s,
        aggregate_policy="fail",
    )
    with pytest.raises(StreamingQueryException, match="aggregate expectations"):
        _run_gate(spark, tmp_path, gate, in_dir)


def test_gate_rejects_unknown_policy(suite):
    with pytest.raises(ValueError, match="aggregate_policy"):
        QualityGateSink(None, suite, aggregate_policy="explode")


def test_gate_without_quarantine_counts_only(spark, tmp_path, suite):
    base = pd.Timestamp("2024-05-01")
    in_dir = str(tmp_path / "in")
    _write_input(spark, in_dir, [("a", base, 1.0), ("b", base, 500.0)])
    table = str(tmp_path / "table")
    mdir = str(tmp_path / "metrics")
    gate = QualityGateSink(MergeSink(table, ["ts", "k"]), suite, metrics_dir=mdir)
    sdf = spark.readStream.schema("k string, ts timestamp, v double").parquet(in_dir)
    qy = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(gate.write_batch)
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination()
    met = spark.read.parquet(mdir).toPandas()
    assert met.iloc[0]["rows_quarantined"] == 1
    main = spark.read.parquet(table).toPandas()
    assert list(main["k"]) == ["a"]
def test_gate_single_materialization_job_budget(spark, tmp_path, suite):
    # the round-5 one-materialization contract: the tagged frame is
    # persisted, the aggregate pass's shared agg supplies rows_in, and the
    # old standalone `batch_df.count()` job is gone. Two pins:
    # (1) the SOURCE is evaluated exactly once — counted by an
    #     accumulator in a mapPartitions the batch frame is built over;
    # (2) the per-batch job count stays at the measured one-materialization
    #     budget (re-adding the standalone count job would exceed it).
    suite.add_expectation(
        ex.build_expectation(
            "expect_table_row_count_to_be_between", {"min_value": 1}
        )
    )
    sc = spark.sparkContext
    evals = sc.accumulator(0)

    def _emit(_):
        evals.add(1)
        base = pd.Timestamp("2024-05-01").to_pydatetime()
        return iter([("a", base, 1.0), ("b", base, 500.0)])

    batch = spark.createDataFrame(
        sc.parallelize([0], 1).mapPartitions(_emit),
        "k string, ts timestamp, v double",
    )
    gate = QualityGateSink(
        MergeSink(str(tmp_path / "t"), ["ts", "k"]),
        suite,
        quarantine_dir=str(tmp_path / "q"),
        metrics_dir=str(tmp_path / "m"),
    )
    tracker = sc.statusTracker()
    sc.setJobGroup("gate_budget", "gate job budget")
    try:
        gate.write_batch(batch, 0)
        jobs = tracker.getJobIdsForGroup("gate_budget") or []
    finally:
        sc.setJobGroup(None, None)
    assert evals.value == 1, f"source evaluated {evals.value} times, want 1"
    assert len(jobs) <= 14, f"job budget blown: {len(jobs)}"
    m = spark.read.parquet(str(tmp_path / "m")).toPandas()
    assert int(m["rows_in"].iloc[0]) == 2
    assert int(m["rows_quarantined"].iloc[0]) == 1


def test_gate_zscore_batch_expectation(spark, tmp_path, suite):
    # z-scores are a TWO-pass family (stats ride pass 1, thresholds in a
    # shared pass 2): make sure the per-batch aggregate validation runs
    # them over the persisted tagged frame without breaking the gate
    suite.add_expectation(
        ex.build_expectation(
            "expect_column_value_z_scores_to_be_less_than",
            {"column": "v", "threshold": 3, "double_sided": True},
        )
    )
    pdf = pd.DataFrame(
        [("a", pd.Timestamp("2024-05-01"), 1.0),
         ("b", pd.Timestamp("2024-05-01"), 1.1),
         ("c", pd.Timestamp("2024-05-01"), 0.9)],
        columns=["k", "ts", "v"],
    )
    batch = spark.createDataFrame(pdf, "k string, ts timestamp, v double")
    gate = QualityGateSink(
        MergeSink(str(tmp_path / "t"), ["ts", "k"]),
        suite,
        metrics_dir=str(tmp_path / "m"),
        aggregate_policy="record",
    )
    gate.write_batch(batch, 0)
    m = spark.read.parquet(str(tmp_path / "m")).toPandas()
    assert bool(m["agg_success"].iloc[0]) is True
    import json as _json

    agg = _json.loads(m["agg_results"].iloc[0])
    assert any(
        r["expectation_type"] == "expect_column_value_z_scores_to_be_less_than"
        and r["success"]
        for r in agg
    )
