# Copyright 2025 Project Team
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#      http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.

"""Streaming data-quality gate: per-micro-batch expectations enforcement.

Composes the native expectations engine (operators/expectations.py — the
reference's GE integration re-expressed Spark-first) with the streaming
sink: every micro-batch is split by the suite's row-level expectations
into a good stream (delivered to the wrapped sink) and a quarantine
stream (appended with lineage), plus one metrics row per batch.

Exactly-once posture:
- the GOOD path inherits the wrapped sink's guarantee (MergeSink /
  IcebergMergeSink are replay-idempotent by key);
- quarantine + metrics are written keyed by ``batch_id``, and a replayed
  micro-batch FIRST deletes its own batch_id partition before appending —
  so at-least-once foreachBatch redelivery cannot double rows there
  either (the same dynamic-partition-overwrite idea the MergeSink uses
  for data partitions, applied to the lineage key).

The gate itself is a pure narrow projection (no UDF, no shuffle —
plan-asserted in tests/test_expectations.py), so its cost on the hot
path is one codegen'd filter per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.expectations import ExpectationSuite, quarantine_split


class QualityGateSink:
    """foreachBatch wrapper: expectations gate in front of any sink with a
    ``write_batch(df, batch_id)`` contract (MergeSink, IcebergMergeSink,
    PCDM sinks...).

    Parameters:
        sink: downstream sink receiving only rows that pass the suite.
        suite: row-level expectations to enforce (aggregate/schema entries
            are ignored by the gate; run ``validate`` out-of-band).
        quarantine_dir: parquet dir for failing rows, partitioned by
            ``__batch_id`` (replay-overwritten, see module docstring);
            None = drop failures, count them only.
        metrics_dir: parquet dir for one (batch_id, rows_in, rows_good,
            rows_quarantined) row per micro-batch; None = no metrics.
    """

    def __init__(
        self,
        sink,
        suite: ExpectationSuite,
        quarantine_dir: str | None = None,
        metrics_dir: str | None = None,
    ) -> None:
        self.sink = sink
        self.suite = suite
        self.quarantine_dir = quarantine_dir
        self.metrics_dir = metrics_dir

    def _replay_safe_append(self, df: DataFrame, path: str, batch_id: int) -> None:
        spark = df.sparkSession
        prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # overwrite ONLY this batch's partition: a foreachBatch replay
            # rewrites the identical rows instead of appending duplicates
            df.withColumn("__batch_id", F.lit(batch_id)).write.mode(
                "overwrite"
            ).partitionBy("__batch_id").parquet(path)
        finally:
            if prior is None:
                try:
                    spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
                except Exception:
                    pass
            else:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        good, bad = quarantine_split(batch_df, self.suite)
        # one pass over the batch: counts come from the writes themselves
        # (bad is tiny by construction in a healthy pipeline; localCheckpoint
        # pins the split so good/bad don't rescan the source twice if the
        # upstream batch frame is expensive) — batch frames in foreachBatch
        # are already materialized micro-batches, so a second scan is cheap
        # and we skip the checkpoint.
        n_bad = 0
        if self.quarantine_dir is not None:
            bad_flat = bad.withColumn(
                "failed_expectations", F.concat_ws(";", "failed_expectations")
            )
            self._replay_safe_append(bad_flat, self.quarantine_dir, batch_id)
            n_bad = bad_flat.count()
        else:
            n_bad = bad.count()
        self.sink.write_batch(good, batch_id)
        if self.metrics_dir is not None:
            spark = batch_df.sparkSession
            n_good = good.count()
            metrics = spark.createDataFrame(
                [(batch_id, n_good + n_bad, n_good, n_bad)],
                "batch_id long, rows_in long, rows_good long,"
                " rows_quarantined long",
            )
            self._replay_safe_append(
                metrics.withColumnRenamed("batch_id", "src_batch_id"),
                self.metrics_dir,
                batch_id,
            )
