"""Iceberg MERGE sink — jar-gated exactly-once suite.

Runs the same kill/resume + replay-idempotency contract the parquet
MergeSink suite proves (tests/test_sink.py) through a REAL `MERGE INTO`
against a local hadoop catalog. The sandbox has no iceberg-spark-runtime
jar, so the whole module skips cleanly there (same convention as the
transformWithStateInPandas gate in tests/test_cep.py); on any cluster image
that carries the jar it runs without modification.

Reference parity: delta_merge.py:212-344 (broadcast merge + retry),
pcdm_to_delta.py:193-253 (CDC verbs, partition-pruned merge condition).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import SparkSession

from core_spark.streaming.iceberg import (
    IcebergMergeSink,
    find_iceberg_jar,
    iceberg_available,
)


@pytest.fixture(scope="module")
def ice_spark():
    wh = tempfile.mkdtemp(prefix="ice_wh_")
    # getOrCreate may hand back the suite's shared session; catalog plugin
    # confs are runtime-settable (catalogs instantiate lazily), so register
    # the hadoop catalog on whatever session we get, then probe. The
    # extensions conf only applies to a fresh session — on modern
    # Iceberg/Spark, MERGE INTO works through DSv2 without it.
    builder = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-sink-test")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    # offline bootstrap: a jar dropped into repo jars/ (or ~/.ivy2, or
    # $ICEBERG_JAR) is picked up with zero config — only effective when this
    # builder creates the JVM (i.e. this module runs standalone); on a
    # shared session the classpath probe below decides
    jar = find_iceberg_jar()
    if jar:
        builder = builder.config("spark.jars", jar)
    spark = builder.getOrCreate()
    if not iceberg_available(spark):
        shutil.rmtree(wh, ignore_errors=True)
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    spark.conf.set("spark.sql.catalog.local_ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.local_ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local_ice.warehouse", wh)
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS local_ice.db")
    except Exception as ex:  # pragma: no cover - depends on image
        shutil.rmtree(wh, ignore_errors=True)
        pytest.skip(f"iceberg catalog not usable on this session: {ex}")
    yield spark
    shutil.rmtree(wh, ignore_errors=True)


def _rows(spark, table):
    return {
        (r["k"], r["v"]) for r in spark.table(table).select("k", "v").collect()
    }


def test_merge_upsert_and_replay_idempotent(ice_spark):
    spark = ice_spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local_ice.db")
    sink = IcebergMergeSink("local_ice.db.t_upsert", ["k"])

    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    sink.write_batch(b0, 0)
    assert _rows(spark, "local_ice.db.t_upsert") == {(1, "a"), (2, "b")}

    # update one key, insert another
    b1 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    sink.write_batch(b1, 1)
    assert _rows(spark, "local_ice.db.t_upsert") == {(1, "a"), (2, "B"), (3, "c")}

    # foreachBatch replay of batch 1 (at-least-once delivery): no-op
    sink.write_batch(b1, 1)
    assert _rows(spark, "local_ice.db.t_upsert") == {(1, "a"), (2, "B"), (3, "c")}

    # replay short-circuit lost (marker behind): MERGE re-runs, state equal
    sink2 = IcebergMergeSink("local_ice.db.t_upsert", ["k"])
    sink2._created = True
    spark.sql(
        "ALTER TABLE local_ice.db.t_upsert UNSET TBLPROPERTIES ('engine.last-batch-id')"
    )
    sink2.write_batch(b1, 1)
    assert _rows(spark, "local_ice.db.t_upsert") == {(1, "a"), (2, "B"), (3, "c")}


def test_merge_cdc_delete_branch(ice_spark):
    spark = ice_spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local_ice.db")
    sink = IcebergMergeSink("local_ice.db.t_cdc", ["k"], op_col="op")

    b0 = spark.createDataFrame(
        [(1, "a", "upsert"), (2, "b", "upsert")], "k int, v string, op string"
    )
    sink.write_batch(b0, 0)
    b1 = spark.createDataFrame(
        [(1, "a", "delete"), (3, "c", "upsert")], "k int, v string, op string"
    )
    sink.write_batch(b1, 1)
    assert _rows(spark, "local_ice.db.t_cdc") == {(2, "b"), (3, "c")}
    # delete of an absent key (insert guarded by op <> delete): no ghost row
    b2 = spark.createDataFrame([(9, "x", "delete")], "k int, v string, op string")
    sink.write_batch(b2, 2)
    assert _rows(spark, "local_ice.db.t_cdc") == {(2, "b"), (3, "c")}


def test_streaming_run_to_sink_into_iceberg(ice_spark, tmp_path):
    """availableNow file stream -> foreachBatch MERGE INTO iceberg; resume
    from checkpoint picks up only new files (exactly-once end to end)."""
    spark = ice_spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local_ice.db")
    from core_spark.streaming.sink import run_to_sink

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").coalesce(
        1
    ).write.mode("append").parquet(str(src))

    sink = IcebergMergeSink("local_ice.db.t_stream", ["k"])
    stream = spark.readStream.schema("k int, v string").parquet(str(src))
    q = run_to_sink(stream, sink, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert _rows(spark, "local_ice.db.t_stream") == {(1, "a"), (2, "b")}

    spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    stream2 = spark.readStream.schema("k int, v string").parquet(str(src))
    q2 = run_to_sink(stream2, sink, str(tmp_path / "ckpt"))
    q2.awaitTermination()
    assert _rows(spark, "local_ice.db.t_stream") == {(1, "a"), (2, "B"), (3, "c")}
