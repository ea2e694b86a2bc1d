"""PCDM-style CDC destinations: typed fan-out merge + latest-value table.

Engine re-expression of the reference's two richest sinks:

- ``PCDMMergeSink`` = pcdm_to_delta.py:38,193-314 — normalize CDC verbs
  (insert/update -> upsert), ms-truncate, dedup (TagName, EventTime,
  ChangeType), split rows by ValueType into float/integer/string tables with
  casts, and merge each typed frame idempotently with delete routing and
  partition pruning. The micro-batch frame is cached once and reused for
  every typed write (the reference's persist/unpersist fan-out,
  pcdm_to_delta.py:311-330).
- ``LatestSink`` = pcdm_latest_to_delta.py:150-169,254-268 — one row per
  tag, newest EventTime wins; the argmax is ``max_by`` over
  struct(EventTime, ...), a single hash aggregate (no window sort).
"""

from __future__ import annotations

import os
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..transformers import pcdm_normalize, pcdm_split_by_type
from .sink import MergeSink


class PCDMMergeSink:
    """CDC-aware typed fan-out over three MergeSinks (float/integer/string)."""

    def __init__(self, base_dir: str, partition_expr: str = "to_date(EventTime)") -> None:
        self.base_dir = base_dir
        self.sinks: Mapping[str, MergeSink] = {
            vt: MergeSink(
                os.path.join(base_dir, vt),
                key_cols=["TagName", "EventTime"],
                partition_expr=partition_expr,
                op_col="ChangeType",
            )
            for vt in ("float", "integer", "string")
        }

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        normalized = pcdm_normalize(df)
        # one materialization, three typed writes (persist/unpersist fan-out)
        normalized.persist()
        try:
            for vt, typed in pcdm_split_by_type(normalized).items():
                self.sinks[vt].write_batch(typed, batch_id)
        finally:
            normalized.unpersist()

    def read(self, spark: SparkSession, value_type: str) -> DataFrame:
        return self.sinks[value_type].read(spark)


class LatestSink:
    """Newest row per tag. Each batch folds into the compact latest table:
    union(existing, batch-argmax) -> argmax. The table is one row per tag —
    small enough to rewrite atomically; at Iceberg scale the same keys drive
    a MERGE with `t.EventTime < s.EventTime` as the update condition."""

    def __init__(self, table_dir: str) -> None:
        self.table_dir = table_dir
        os.makedirs(table_dir, exist_ok=True)

    def _data_dir(self) -> str:
        return os.path.join(self.table_dir, "data")

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._data_dir())

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        cols = [c for c in df.columns if c != "TagName"]
        key = F.struct(*[F.col(c) for c in ["EventTime"] + [c for c in cols if c != "EventTime"]])
        agg = [F.max_by(c, key).alias(c) for c in cols]
        newest = df.groupBy("TagName").agg(*agg)
        if os.path.isdir(self._data_dir()):
            existing = self.read(df.sparkSession).select(newest.columns)
            newest = existing.unionByName(newest).groupBy("TagName").agg(*agg)
        out = newest.localCheckpoint()  # barrier: we overwrite what we read
        out.write.mode("overwrite").parquet(self._data_dir())
