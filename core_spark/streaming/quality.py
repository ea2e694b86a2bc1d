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
stream (appended with lineage), plus one metrics row per batch. The
suite's AGGREGATE-family expectations (row count, mean/median bounds,
uniqueness, quantiles, monotonicity...) are additionally validated
against each whole micro-batch — the drift checks a training-data feed
needs to halt on — with a configurable reaction (``aggregate_policy``):
record only, quarantine the batch wholesale, or fail the query.

Exactly-once posture:
- the GOOD path inherits the wrapped sink's guarantee (MergeSink /
  IcebergMergeSink are replay-idempotent by key);
- quarantine + metrics are written keyed by ``batch_id``, and a replayed
  micro-batch FIRST deletes its own batch_id partition before appending —
  so at-least-once foreachBatch redelivery cannot double rows there
  either (the same dynamic-partition-overwrite idea the MergeSink uses
  for data partitions, applied to the lineage key). The overwrite mode is
  a per-write DataFrameWriter option, never a session conf flip, so a
  concurrent writer on the same session is unaffected.

The row gate itself is a pure narrow projection (no UDF, no shuffle —
plan-asserted in tests/test_expectations.py), so its cost on the hot
path is one codegen'd filter per side; the per-batch aggregate pass is
ONE shared 1-row agg job (plus ids-only grouped jobs only when the suite
carries uniqueness/mode expectations).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.expectations import (
    _ROW_LEVEL,
    ExpectationSuite,
    tag_rows,
    validate,
)

#: reactions to a failed batch-level (aggregate-family) expectation
AGGREGATE_POLICIES = ("record", "quarantine_batch", "fail", "ignore")


class QualityGateSink:
    """foreachBatch wrapper: expectations gate in front of any sink with a
    ``write_batch(df, batch_id)`` contract (MergeSink, IcebergMergeSink,
    PCDM sinks...).

    Parameters:
        sink: downstream sink receiving only rows that pass the suite.
        suite: expectations to enforce. Row-level entries gate rows;
            every other entry (aggregates, uniqueness, quantiles,
            monotonicity, schema) is validated per micro-batch and
            handled per ``aggregate_policy``.
        quarantine_dir: parquet dir for failing rows, partitioned by
            ``__batch_id`` (replay-overwritten, see module docstring);
            None = drop failures, count them only.
        metrics_dir: parquet dir for one row per micro-batch
            (src_batch_id, rows_in, rows_good, rows_quarantined,
            agg_success, agg_results) — agg_results is the per-expectation
            JSON of the batch-level validation; None = no metrics.
        aggregate_policy: reaction to a failed batch-level expectation —
            ``record`` (default: note it in metrics, deliver the batch),
            ``quarantine_batch`` (the WHOLE batch goes to quarantine,
            every row tagged with the failed expectations; nothing
            reaches the sink), ``fail`` (raise — fails the streaming
            query), or ``ignore`` (skip the aggregate pass entirely).
    """

    def __init__(
        self,
        sink,
        suite: ExpectationSuite,
        quarantine_dir: str | None = None,
        metrics_dir: str | None = None,
        aggregate_policy: str = "record",
    ) -> None:
        if aggregate_policy not in AGGREGATE_POLICIES:
            raise ValueError(
                f"aggregate_policy must be one of {AGGREGATE_POLICIES}"
            )
        self.sink = sink
        self.suite = suite
        self.quarantine_dir = quarantine_dir
        self.metrics_dir = metrics_dir
        self.aggregate_policy = aggregate_policy
        self._agg_suite = ExpectationSuite(
            f"{suite.name}_batch",
            [
                e
                for e in suite.expectations
                if e.expectation_type not in _ROW_LEVEL
            ],
        )

    def _replay_safe_append(self, df: DataFrame, path: str, batch_id: int) -> None:
        # overwrite ONLY this batch's partition: a foreachBatch replay
        # rewrites the identical rows instead of appending duplicates.
        # partitionOverwriteMode rides the WRITE as an option (it takes
        # precedence over the session conf), so no session state is
        # flipped under concurrent writers.
        df.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "__batch_id"
        ).parquet(path)

    def _validate_batch(self, batch_df: DataFrame) -> dict | None:
        """Run the non-row-level sub-suite against the whole micro-batch.
        Returns the checkpoint dict, or None when there is nothing to run."""
        if self.aggregate_policy == "ignore" or not self._agg_suite.expectations:
            return None
        return validate(batch_df, self._agg_suite)

    @staticmethod
    def _failed_names(res: dict) -> list[str]:
        return [
            "{}:{}".format(
                r["expectation_config"]["expectation_type"],
                r["expectation_config"]["kwargs"].get("column", ""),
            )
            for r in res["results"]
            if not r["success"]
        ]

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # ONE materialization serves everything downstream: the tagged
        # frame is persisted, so the batch-level validation, the
        # quarantine write, the good write and the metrics counts all
        # scan the cached split instead of re-evaluating the source
        # micro-batch (previously the rows_in count alone was a third
        # full pass over the batch).
        tagged = tag_rows(batch_df, self.suite)
        if tagged is None:
            tagged = batch_df.withColumn(
                "failed_expectations", F.array().cast("array<string>")
            )
        tagged = tagged.persist()
        try:
            self._write_batch_tagged(tagged, batch_id)
        finally:
            tagged.unpersist()

    def _write_batch_tagged(self, tagged: DataFrame, batch_id: int) -> None:
        good = tagged.filter(F.size("failed_expectations") == 0).drop(
            "failed_expectations"
        )
        bad = tagged.filter(F.size("failed_expectations") > 0)

        # the aggregate pass runs over the cached tagged frame (minus the
        # tag column, so schema expectations see the batch's own shape) —
        # its shared agg is what materializes the cache
        agg_res = self._validate_batch(tagged.drop("failed_expectations"))
        if agg_res is not None and not agg_res["success"]:
            failed = self._failed_names(agg_res)
            if self.aggregate_policy == "fail":
                raise RuntimeError(
                    f"batch {batch_id} failed aggregate expectations: "
                    + "; ".join(failed)
                )
            if self.aggregate_policy == "quarantine_batch":
                # wholesale quarantine: every row of the batch, keeping its
                # own row-level tags and appending the batch-level failures
                agg_arr = F.array(*[F.lit(x) for x in failed])
                bad = tagged.withColumn(
                    "failed_expectations",
                    F.concat(F.col("failed_expectations"), agg_arr),
                )
                good = good.limit(0)

        spark = tagged.sparkSession
        bad_flat = bad.withColumn(
            "failed_expectations", F.concat_ws(";", "failed_expectations")
        )
        if self.quarantine_dir is not None:
            self._replay_safe_append(bad_flat, self.quarantine_dir, batch_id)
        self.sink.write_batch(good, batch_id)
        if self.metrics_dir is not None:
            # metrics reflect COMMITTED rows. rows_in comes free from the
            # aggregate pass's shared agg (batch_row_count) when it ran;
            # otherwise one count over the CACHED frame. The quarantined
            # count of record stays the read-back of the partition just
            # written (never a re-evaluation that could disagree with
            # what landed on disk).
            rows_in = (
                agg_res["statistics"]["batch_row_count"]
                if agg_res is not None
                and agg_res["statistics"]["batch_row_count"] is not None
                else tagged.count()
            )
            if self.quarantine_dir is not None:
                n_bad = (
                    spark.read.parquet(self.quarantine_dir)
                    .filter(F.col("__batch_id") == batch_id)
                    .count()
                )
            else:
                n_bad = bad_flat.count()
            metrics = spark.createDataFrame(
                [
                    (
                        batch_id,
                        rows_in,
                        rows_in - n_bad,
                        n_bad,
                        agg_res["success"] if agg_res is not None else None,
                        json.dumps(
                            [
                                {
                                    "expectation_type": r["expectation_config"][
                                        "expectation_type"
                                    ],
                                    "column": r["expectation_config"][
                                        "kwargs"
                                    ].get("column"),
                                    "success": r["success"],
                                    "observed_value": _json_safe(
                                        r["result"].get("observed_value")
                                    ),
                                    "unexpected_count": r["result"].get(
                                        "unexpected_count"
                                    ),
                                }
                                for r in agg_res["results"]
                            ]
                        )
                        if agg_res is not None
                        else None,
                    )
                ],
                "batch_id long, rows_in long, rows_good long,"
                " rows_quarantined long, agg_success boolean,"
                " agg_results string",
            )
            self._replay_safe_append(
                metrics.withColumnRenamed("batch_id", "src_batch_id"),
                self.metrics_dir,
                batch_id,
            )


def _json_safe(v):
    """Observed values may be Decimals/Timestamps/inf (a failed KL reports
    infinity); stringify anything strict JSON cannot carry."""
    import math

    if isinstance(v, float) and not math.isfinite(v):
        return str(v)
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    return str(v)
