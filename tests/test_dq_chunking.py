"""Straggler-guard chunking: chunked per-tag operators must be bit-identical
to their single-group forms on a pathologically skewed input (one tag holds
95% of rows), while splitting the hot tag into many parallel tasks.

Addresses the hot-tag straggler risk in the per-tag applyInPandas operators:
a group is one pandas frame, so an unbounded hot tag is both a wall-clock
cliff and an executor OOM; gaussian_smooth (radius-row halo) and
impute_missing with explicit cadence (one-row halo + grid anchor) chunk
exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest

from core_spark.operators import data_quality as dq
from core_spark.operators.timeseries import TSSpec

SPEC = TSSpec(tag_col="tag", ts_col="ts", value_col="value", status_col=None)


@pytest.fixture(scope="module")
def skewed(spark):
    # hot tag: 9500 rows (95%), cold tags: 100 rows each; unique timestamps
    # per tag; hot tag has gaps so imputation actually inserts rows
    rows = []
    base = pd.Timestamp("2024-01-01")
    for i in range(9500):
        # skip every 7th grid point -> missing rows to impute
        t = base + pd.Timedelta(seconds=10 * (i + i // 6))
        rows.append(("hot", t, float((i * 37) % 997) / 7.0))
    for tag in ("c1", "c2", "c3", "c4", "c5"):
        for i in range(100):
            t = base + pd.Timedelta(seconds=25 * i)
            rows.append((tag, t, float((i * 13) % 101)))
    pdf = pd.DataFrame(rows, columns=["tag", "ts", "value"])
    return spark.createDataFrame(pdf)


def _sorted(df, extra):
    # scan() normalizes to the canonical tagname/event_time/value columns
    return (
        df.toPandas()
        .sort_values(["tagname", "event_time"] + extra)
        .reset_index(drop=True)
    )


def test_gaussian_smooth_chunked_exact(skewed):
    ref = _sorted(dq.gaussian_smooth(skewed, SPEC, sigma=2.0, chunk_rows=None), [])
    # chunk_rows=500 -> the hot tag splits into 19 chunks
    got = _sorted(dq.gaussian_smooth(skewed, SPEC, sigma=2.0, chunk_rows=500), [])
    pd.testing.assert_frame_equal(got, ref, check_exact=True)


def test_gaussian_smooth_chunked_many_tasks(skewed):
    # the hot tag's 9500 rows must land in ceil(9500/500) groups, not one
    out = dq.gaussian_smooth(skewed, SPEC, sigma=2.0, chunk_rows=500)
    assert out.filter("tagname = 'hot'").count() == 9500


def test_impute_missing_chunked_exact(skewed):
    ref = _sorted(
        dq.impute_missing(skewed, SPEC, expected_interval_seconds=10.0, chunk_rows=None),
        ["imputed"],
    )
    got = _sorted(
        dq.impute_missing(skewed, SPEC, expected_interval_seconds=10.0, chunk_rows=500),
        ["imputed"],
    )
    assert got["imputed"].sum() > 0  # the gaps really imputed
    pd.testing.assert_frame_equal(got, ref, check_exact=True)


def test_impute_missing_modal_path_unchanged(skewed):
    # cadence-less call keeps the one-group-per-tag modal-interval path
    out = dq.impute_missing(skewed, SPEC).toPandas()
    hot = out[out["tagname"] == "hot"]
    assert (hot["imputed"]).sum() > 0


def test_interval_filtering_chunked_exact(skewed):
    # 25 s thinning on a 10/20 s-cadence hot tag: the keep-chain never
    # resets (no raw gap >= 25 s), so every chunk's decisions depend on the
    # carried last-kept ts — the worst case for chunked exactness
    ref = _sorted(dq.interval_filtering(skewed, SPEC, 25.0, chunk_rows=None), [])
    got = _sorted(dq.interval_filtering(skewed, SPEC, 25.0, chunk_rows=500), [])
    assert len(ref) > 0
    pd.testing.assert_frame_equal(got, ref, check_exact=True)


def test_interval_filtering_ties_straddling_chunk_boundary(spark):
    # duplicate (tag, ts) rows with DIFFERENT values, sized so the tie
    # group straddles a __chunk boundary: both paths must order ties by
    # the full (TS, VAL) key and keep the same physical representative
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(20):
        t = base + pd.Timedelta(seconds=60 * i)
        # four copies of every timestamp, values in descending insert order
        for v in (9.0, 3.0, 7.0, 1.0):
            rows.append(("t", t, v))
    pdf = pd.DataFrame(rows, columns=["tag", "ts", "value"])
    df = spark.createDataFrame(pdf).repartition(8)  # scatter arrival order
    ref = _sorted(dq.interval_filtering(df, SPEC, 60.0, chunk_rows=None), ["value"])
    # chunk_rows=6 is NOT a multiple of the tie-group size 4 -> boundaries
    # cut through tie groups
    got = _sorted(dq.interval_filtering(df, SPEC, 60.0, chunk_rows=6), ["value"])
    pd.testing.assert_frame_equal(got, ref, check_exact=True)
    # deterministic representative: the tie's MINIMUM value is first in
    # (TS, VAL) order, so exactly the 1.0 rows are kept
    assert set(ref["value"]) == {1.0}


def test_interval_filtering_chunked_carry_skips_whole_chunks(spark):
    # min_interval larger than a whole chunk's span: interior chunks keep
    # ZERO rows and must pass the carry through unchanged
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "tag": ["t"] * 200,
            "ts": [base + pd.Timedelta(seconds=i) for i in range(200)],
            "value": [float(i) for i in range(200)],
        }
    )
    df = spark.createDataFrame(pdf)
    ref = _sorted(dq.interval_filtering(df, SPEC, 90.0, chunk_rows=None), [])
    got = _sorted(dq.interval_filtering(df, SPEC, 90.0, chunk_rows=40), [])
    # keeps rows at t=0, 90, 180 only
    assert list(got["event_time"]) == [
        base, base + pd.Timedelta(seconds=90), base + pd.Timedelta(seconds=180)
    ]
    pd.testing.assert_frame_equal(got, ref, check_exact=True)
