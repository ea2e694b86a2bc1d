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

"""Acoustic near-duplicate detection over constellation fingerprints —
the audio member of the dedup family (operators/dedup.py has the text
ones: MinHash/SimHash/winnowing; this is their payload-axis sibling).

Pipeline shape (all declarative, Catalyst-planned):
  clips -> audio_fingerprint UDF -> explode to (clip, h, t) triples
        -> drop hot hashes (document-frequency cap, the stopword trick)
        -> self equi-join on h (ids-only shuffle, ~20 B rows)
        -> per (a, b, dt = t_b - t_a) vote count
        -> pairs whose best-aligned vote >= min_matches.

A true duplicate (re-encoded, time-shifted, gain-changed copy) shares many
hashes at ONE constant frame offset; unrelated clips share few hashes at
scattered offsets — the dt vote is what separates them (same argument as
Wang's constellation algorithm). At 100 TB the only corpus-wide shuffle is
the hash join; fingerprints (~100 x 12 B per clip) are 4 orders smaller
than the audio, and the df-cap keeps any single hash's bucket bounded, the
same skew posture as the MinHash band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.audio_dsp import audio_fingerprint


def fingerprint_triples(clips: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """(id, h, t) exploded fingerprint rows for the clips table."""
    return (
        clips.select(
            F.col(id_col).alias("id"),
            audio_fingerprint("bytes", "codec", "sr_hz").alias("fp"),
        )
        .filter(F.size("fp") > 0)
        .select("id", F.explode("fp").alias("p"))
        .select("id", F.col("p.h").alias("h"), F.col("p.t").alias("t"))
    )


def fingerprint_pairs(
    clips: DataFrame,
    min_matches: int = 8,
    max_hash_df: int = 64,
    id_col: str = "clip_id",
) -> DataFrame:
    """Audio near-dup pairs: (id_a, id_b, n_matches, dt_frames), id_a < id_b.

    ``n_matches`` = hash votes at the pair's best-aligned frame offset;
    ``max_hash_df``: hashes occurring in more clips are dropped before the
    join (they carry no discrimination and would quadratically blow up the
    pair count — the exact trick text dedup plays with stopword shingles).
    """
    tr = fingerprint_triples(clips, id_col)
    # One instance per (clip, hash) — earliest anchor. A steady tone emits
    # the SAME hash every frame, and two unrelated clips sharing one tone
    # would otherwise accumulate aligned votes at every offset (measured:
    # ~38 chance votes without dedup vs <=4 with; true dups keep hundreds
    # of *distinct* aligned hashes).
    tr = tr.groupBy("id", "h").agg(F.min("t").alias("t"))
    # document-frequency cap on the hash key (one ids-only agg)
    df_ok = (
        tr.groupBy("h")
        .agg(F.countDistinct("id").alias("df"))
        .filter(F.col("df") <= max_hash_df)
        .select("h")
    )
    tr = tr.join(df_ok, "h")
    a = tr.select(F.col("id").alias("id_a"), "h", F.col("t").alias("ta"))
    b = tr.select(F.col("id").alias("id_b"), "h", F.col("t").alias("tb"))
    votes = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", (F.col("tb") - F.col("ta")).alias("dt_frames"))
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    best = (
        votes.groupBy("id_a", "id_b")
        .agg(
            F.max(
                F.struct("n_matches", (-F.abs(F.col("dt_frames"))).alias("_tie"), "dt_frames")
            ).alias("best")
        )
        .select(
            "id_a",
            "id_b",
            F.col("best.n_matches").alias("n_matches"),
            F.col("best.dt_frames").alias("dt_frames"),
        )
    )
    return best.filter(F.col("n_matches") >= min_matches)
