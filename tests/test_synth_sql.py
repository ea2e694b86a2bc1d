"""The SQL twins of the synthetic-clip generators must be bit-identical to
the numpy generators — this is what makes the clip-stream queries
oracle-checkable by the driver's DuckDB gate (registry._synth_meta_oracles).
No Spark needed.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from core_spark import synth

META_COLS = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript", "ingest_ts"]


@pytest.mark.parametrize("n", [1, 97, 500, 2000])
def test_clips_meta_sql_matches_generator(n):
    got = (
        duckdb.sql(
            f"SELECT {', '.join(META_COLS)} FROM ({synth.clips_meta_sql(n)}) ORDER BY i"
        )
        .df()
        .reset_index(drop=True)
    )
    exp = synth.make_clips_pdf(n)[META_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_corrections_meta_sql_matches_generator():
    got = (
        duckdb.sql(
            f"SELECT * FROM ({synth.corrections_meta_sql(0, 2000)}) ORDER BY clip_id"
        )
        .df()
        .reset_index(drop=True)
    )
    exp = (
        synth.make_corrections_pdf_range(0, 2000)
        .sort_values("clip_id")
        .reset_index(drop=True)[["clip_id", "corrected_transcript", "correction_ts"]]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_corrections_meta_sql_nonzero_lo():
    got = (
        duckdb.sql(
            f"SELECT * FROM ({synth.corrections_meta_sql(995, 1500)}) ORDER BY clip_id"
        )
        .df()
        .reset_index(drop=True)
    )
    exp = (
        synth.make_corrections_pdf_range(995, 1500)
        .sort_values("clip_id")
        .reset_index(drop=True)[["clip_id", "corrected_transcript", "correction_ts"]]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_new_oracles_registered():
    from core_spark import registry

    for k in (
        "stream_dedup_watermark",
        "stream_transcript_tokens",
        "stream_join_corrections",
    ):
        assert k in registry.ORACLES and k in registry.QUERIES
