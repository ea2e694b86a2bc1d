"""Table maintenance: create / optimize (compact+sort) / vacuum."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from core_spark import maintenance as mt


def _write_fragmented(spark, table_dir, rows_per_part=200, files_per_part=8):
    """Partitioned table with deliberately many small files per partition."""
    df = spark.range(rows_per_part * 2).select(
        F.col("id"),
        (F.col("id") % 7).alias("tag"),
        F.when(F.col("id") < rows_per_part, "2024-01-01")
        .otherwise("2024-01-02")
        .alias("p_date"),
    )
    (
        df.repartition(files_per_part)
        .write.mode("overwrite")
        .partitionBy("p_date")
        .parquet(os.path.join(table_dir, "data"))
    )
    return df


def test_create_table_declares_schema(spark, tmp_path):
    d = str(tmp_path / "t")
    mt.create_table(d, "clip_id string, n long")
    assert os.path.exists(os.path.join(d, "_schema.json"))
    assert os.path.isdir(os.path.join(d, "_commits"))
    # idempotent
    mt.create_table(d, "clip_id string, n long")


def test_create_table_readable_by_merge_sink(spark, tmp_path):
    from core_spark.streaming.sink import MergeSink

    d = str(tmp_path / "t")
    mt.create_table(d, "clip_id string, n long")
    sink = MergeSink(d, key_cols=["clip_id"])
    assert sink.read(spark).count() == 0


def test_optimize_compacts_and_sorts(spark, tmp_path):
    d = str(tmp_path / "t")
    df = _write_fragmented(spark, d)
    before = mt.table_stats(d)
    assert all(v["files"] >= 8 for v in before["partitions"].values())
    rows_before = sorted(r["id"] for r in spark.read.parquet(d + "/data").collect())

    report = mt.optimize_table(
        spark, d, sort_by=["tag", "id"], target_file_bytes=64 * 1024 * 1024
    )
    after = mt.table_stats(d)
    # compacted to the single file the byte target allows, both partitions
    assert after["total_files"] == 2, after
    assert all(not v.get("skipped") for v in report.values())
    # row parity
    rows_after = sorted(r["id"] for r in spark.read.parquet(d + "/data").collect())
    assert rows_after == rows_before
    # in-file sort: each partition's file is ordered by (tag, id)
    for p in ("p_date=2024-01-01", "p_date=2024-01-02"):
        got = [
            (r["tag"], r["id"])
            for r in spark.read.parquet(os.path.join(d, "data", p)).collect()
        ]
        assert got == sorted(got)


def test_optimize_partition_filter(spark, tmp_path):
    d = str(tmp_path / "t")
    _write_fragmented(spark, d)
    report = mt.optimize_table(spark, d, partitions=["2024-01-01"])
    assert list(report) == ["p_date=2024-01-01"]
    after = mt.table_stats(d)
    assert after["partitions"]["p_date=2024-01-01"]["files"] == 1
    assert after["partitions"]["p_date=2024-01-02"]["files"] >= 8


def test_vacuum_removes_only_stale_debris(spark, tmp_path):
    d = str(tmp_path / "t")
    _write_fragmented(spark, d)
    data = os.path.join(d, "data")
    stale = os.path.join(data, "p_date=2024-01-01.old-dead")
    fresh = os.path.join(data, "p_date=2024-01-02.opt-live")
    os.makedirs(stale)
    os.makedirs(fresh)
    old = time.time() - 10 * 3600
    os.utime(stale, (old, old))

    out = mt.vacuum_table(d, retention_hours=1.0)
    assert out["removed"] == ["p_date=2024-01-01.old-dead"]
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # within retention: an in-flight optimize
    # live partitions untouched
    assert mt.table_stats(d)["total_files"] >= 16
