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
