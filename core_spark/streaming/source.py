"""Stream sources for the clip pipeline.

The production target is an Iceberg table (``spark.readStream.format("iceberg")``
with a hidden-partition spec ``bucket(N, clip_id), hours(ingest_ts)`` — the
engine-side answer to the reference's Delta sources,
pipelines/sources/spark/delta.py:122-156, and its EventDate partition layout,
docs/blog/posts/delta_and_rtdip.md:44-59). This container has no Iceberg
runtime jar, so the local stand-in is a parquet directory stream with an
explicit schema — the same micro-batch semantics (file = commit), the same
pushdown surface, and checkpoint-compatible offsets. The boundary is this
module: swapping ``format("parquet")`` for ``format("iceberg")`` +
``table`` is the only change a cluster deployment needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..synth import CLIPS_SCHEMA, CORRECTIONS_SCHEMA


def clips_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the clips table directory (input_hint shape +
    ingest_ts). ``maxFilesPerTrigger`` bounds micro-batch size the way
    Iceberg's ``streaming-max-files-per-micro-batch`` does."""
    r = spark.readStream.schema(CLIPS_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path)


def corrections_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(CORRECTIONS_SCHEMA).parquet(path)


def clips_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch view of the same table — the oracle side of stream/batch parity
    tests (same relation, Trigger.availableNow ≡ one batch scan)."""
    return spark.read.schema(CLIPS_SCHEMA).parquet(path)
