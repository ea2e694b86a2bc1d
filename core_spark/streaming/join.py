"""Watermarked stream-stream join: clip events ⟕ late transcript corrections.

The reference has no stream-stream join — it emulates correction flow with
ChangeType upserts into a Delta MERGE sink (pcdm_to_delta.py:276-309,
SURVEY §2.3 'stream-stream join: absent'). Here it is a first-class
watermarked interval join:

- both sides carry event-time watermarks;
- the join condition bounds correction_ts to
  [ingest_ts, ingest_ts + tolerance], which lets Spark expire clip state
  once the correction watermark passes ingest_ts + tolerance;
- corrections later than the tolerance (or beyond watermark) never match —
  the engine counts them (late_corrections_metrics) instead of silently
  dropping, mirroring the north rule's drop-metric requirement.

Skew note: the join keys are full clip_ids (high cardinality), so the
hot-prefix skew of the aggregation path does not concentrate here; state
size is bounded by watermark + tolerance, not by key count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corrected_transcripts(
    clips: DataFrame,
    corrections: DataFrame,
    tolerance_sec: int = 60,
    watermark_sec: int = 30,
    join_type: str = "leftOuter",
) -> DataFrame:
    """Join clips with corrections arriving within tolerance of ingest.

    Returns one row per clip with ``final_transcript`` =
    correction-if-matched else original, plus ``corrected`` flag.
    Works in batch too (watermarks no-op) for parity testing.
    """
    c = clips.select(
        "clip_id", "ingest_ts", "transcript", "sr_hz", "dur_ms", "codec"
    ).withWatermark("ingest_ts", f"{watermark_sec} seconds").alias("c")
    x = (
        corrections.withWatermark("correction_ts", f"{watermark_sec} seconds")
        .withColumnRenamed("clip_id", "x_clip_id")
        .alias("x")
    )
    cond = (
        (F.col("c.clip_id") == F.col("x.x_clip_id"))
        & (F.col("x.correction_ts") >= F.col("c.ingest_ts"))
        & (
            F.col("x.correction_ts")
            <= F.col("c.ingest_ts") + F.expr(f"INTERVAL {tolerance_sec} SECOND")
        )
    )
    joined = c.join(x, cond, join_type)
    return joined.select(
        F.col("c.clip_id").alias("clip_id"),
        F.col("c.ingest_ts").alias("ingest_ts"),
        F.col("c.transcript").alias("transcript"),
        F.col("x.corrected_transcript").alias("corrected_transcript"),
        F.col("x.correction_ts").alias("correction_ts"),
        F.coalesce(F.col("x.corrected_transcript"), F.col("c.transcript")).alias(
            "final_transcript"
        ),
        F.col("x.corrected_transcript").isNotNull().alias("corrected"),
    )


def late_corrections_metrics(
    clips: DataFrame, corrections: DataFrame, tolerance_sec: int = 60
) -> DataFrame:
    """Batch reconciliation: corrections that can never match the interval
    join (arrived beyond tolerance) — the drop metric the north rule
    requires. Runs as a periodic batch audit over the same tables."""
    c = clips.select("clip_id", "ingest_ts")
    x = corrections
    j = x.join(c, "clip_id", "left")
    lag = F.col("correction_ts").cast("double") - F.col("ingest_ts").cast("double")
    # three disjoint never-matching classes, each counted: late (lag beyond
    # tolerance), retrograde (correction before ingest — the interval's lower
    # bound), and orphaned (clip_id absent from the clips table, lag NULL)
    late = (lag > float(tolerance_sec)).cast("long")
    retro = (lag < 0.0).cast("long")
    orphan = lag.isNull().cast("long")
    return j.select(
        lag.alias("lag_sec"), late.alias("late"), retro.alias("retro"),
        orphan.alias("orphan"),
    ).agg(
        F.count(F.lit(1)).alias("n_corrections"),
        F.coalesce(F.sum("late"), F.lit(0)).alias("n_dropped_late"),
        F.coalesce(F.sum("retro"), F.lit(0)).alias("n_retrograde"),
        F.coalesce(F.sum("orphan"), F.lit(0)).alias("n_orphaned"),
        (
            F.coalesce(F.sum("late"), F.lit(0))
            + F.coalesce(F.sum("retro"), F.lit(0))
            + F.coalesce(F.sum("orphan"), F.lit(0))
        ).alias("n_dropped_total"),
        F.round(F.avg("lag_sec"), 3).alias("avg_lag_sec"),
    )
