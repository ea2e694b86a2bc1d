"""Normalization variants, denormalization round-trip, pattern-based
missing-tick detection."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from core_spark.operators import data_quality as dq
from core_spark.operators.timeseries import TSSpec

SPEC = TSSpec(tag_col="tag", ts_col="ts", value_col="v", status_col=None)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "tag string, ts timestamp, v double")


T0 = dt.datetime(2024, 1, 1)
timedelta = dt.timedelta


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_normalize_mean(spark):
    df = _mk(
        spark,
        [("a", _t("2024-01-01 00:00:00"), 0.0),
         ("a", _t("2024-01-01 01:00:00"), 5.0),
         ("a", _t("2024-01-01 02:00:00"), 10.0)],
    )
    out = {r["event_time"]: r["value_norm"] for r in dq.normalize_mean(df, SPEC).collect()}
    # mean=5, range=10 -> (-0.5, 0.0, 0.5)
    assert out[_t("2024-01-01 00:00:00")] == pytest.approx(-0.5)
    assert out[_t("2024-01-01 01:00:00")] == pytest.approx(0.0)
    assert out[_t("2024-01-01 02:00:00")] == pytest.approx(0.5)


@pytest.mark.parametrize("method", ["zscore", "minmax", "mean"])
def test_denormalize_roundtrip(spark, method):
    df = _mk(
        spark,
        [("a", _t("2024-01-01 00:00:00"), 2.0),
         ("a", _t("2024-01-01 01:00:00"), 4.0),
         ("a", _t("2024-01-01 02:00:00"), 9.0),
         ("b", _t("2024-01-01 00:00:00"), -1.0),
         ("b", _t("2024-01-01 01:00:00"), 1.0)],
    )
    norm_fn = {
        "zscore": dq.normalize_zscore,
        "minmax": dq.normalize_minmax,
        "mean": dq.normalize_mean,
    }[method]
    n = norm_fn(df, SPEC, round_digits=9)
    spec2 = TSSpec(tag_col="tagname", ts_col="event_time", value_col="value", status_col=None)
    out = dq.denormalize(n, spec2, method=method, round_digits=6)
    back = {(r["tagname"], r["event_time"]): r["value_denorm"] for r in out.collect()}
    orig = {(r["tag"], r["ts"]): r["v"] for r in df.collect()}
    assert len(back) == len(orig)
    for k, v in orig.items():
        assert back[k] == pytest.approx(v, abs=1e-5)


def test_missing_data_pattern(spark):
    # tag 'a': ticks at :00 and :30 over 3 hours, with 01:30 missing and
    # 02:00 present only as a near-miss inside tolerance (offset +40s)
    rows = []
    for h in (0, 1, 2):
        rows.append(("a", _t(f"2024-01-01 0{h}:00:00"), 1.0))
        if h != 1:
            rows.append(("a", _t(f"2024-01-01 0{h}:30:00"), 1.0))
    rows = [r for r in rows if r[1] != _t("2024-01-01 02:00:00")]
    rows.append(("a", _t("2024-01-01 02:00:40"), 1.0))  # within 60s tolerance
    df = _mk(spark, rows)
    out = dq.missing_data_pattern(
        df, SPEC, minutes=(0, 30), seconds=(0,), tolerance_seconds=60.0
    ).collect()
    missing = {(r["tagname"], r["expected_time"]) for r in out}
    assert missing == {("a", _t("2024-01-01 01:30:00"))}


def test_missing_data_pattern_tolerance_excludes(spark):
    # event 120s off the tick with 60s tolerance -> tick is missing
    df = _mk(
        spark,
        [("a", _t("2024-01-01 00:02:00"), 1.0),
         ("a", _t("2024-01-01 01:00:00"), 1.0)],
    )
    out = dq.missing_data_pattern(
        df, SPEC, minutes=(0,), seconds=(0,), tolerance_seconds=60.0
    ).collect()
    missing = {r["expected_time"] for r in out}
    assert missing == {_t("2024-01-01 00:00:00")}


def test_exp_smooth_recurrence(spark):
    from core_spark.operators import timeseries as tsq

    vals = [10.0, 12.0, 8.0, 11.0]
    rows = [("a", _t(f"2024-01-01 0{i}:00:00"), v) for i, v in enumerate(vals)]
    df = _mk(spark, rows)
    out = sorted(
        tsq.exp_smooth(df, SPEC, alpha=0.5, round_digits=9).collect(),
        key=lambda r: r["event_time"],
    )
    lvl, expect = None, []
    for v in vals:
        lvl = v if lvl is None else 0.5 * v + 0.5 * lvl
        expect.append(lvl)
    got = [r["level"] for r in out]
    assert got == pytest.approx(expect)
    assert all(r["forecast"] == pytest.approx(expect[-1]) for r in out)


def test_kmeans_binning_invariants(spark):
    # three well-separated 1-D clusters; k=3 must find them
    vals = [1.0, 1.2, 0.8, 10.0, 10.3, 9.7, 50.0, 49.5, 50.5]
    rows = [("a", T0 + timedelta(minutes=i), v) for i, v in enumerate(vals)]
    out = dq.kmeans_binning(_mk(spark, rows), SPEC, k=3).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin"], []).append(r)
    assert len(by_bin) == 3
    # centroid of each bin == mean of its members (Lloyd fixed point)
    for b, rs in by_bin.items():
        mean = sum(r["value"] for r in rs) / len(rs)
        assert rs[0]["centroid"] == pytest.approx(mean, abs=1e-9)
    # every point is nearer its own centroid than any other
    cents = sorted({r["centroid"] for r in out})
    for r in out:
        own = abs(r["value"] - r["centroid"])
        assert all(own <= abs(r["value"] - c) + 1e-12 for c in cents)
    # bins ordered by centroid: cluster around 1 -> bin 0, around 50 -> bin 2
    assert by_bin[0][0]["centroid"] == pytest.approx(1.0, abs=0.3)
    assert by_bin[2][0]["centroid"] == pytest.approx(50.0, abs=0.5)


def test_kmeans_binning_deterministic(spark):
    vals = [float((i * 37) % 101) for i in range(60)]
    rows = [("a", T0 + timedelta(minutes=i), v) for i, v in enumerate(vals)]
    a = sorted((r["event_time"], r["bin"]) for r in dq.kmeans_binning(_mk(spark, rows), SPEC, k=4).collect())
    b = sorted((r["event_time"], r["bin"]) for r in dq.kmeans_binning(_mk(spark, rows), SPEC, k=4).collect())
    assert a == b


def test_dimensionality_reduction_branches(spark):
    import pandas as pd

    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0], "y": [2.0, 4.0, 6.0, 8.0],
                        "z": [5.0, -3.0, 4.0, -1.0]})
    df = spark.createDataFrame(pdf)
    # perfectly correlated -> mean combine, y gone
    out = dq.dimensionality_reduction(df, "x", "y", 0.9, "mean")
    assert out.columns == ["x", "z"]
    assert [r["x"] for r in out.orderBy("x").collect()] == [1.5, 3.0, 4.5, 6.0]
    # sum / first / second / delete branches
    assert [r["x"] for r in dq.dimensionality_reduction(df, "x", "y", 0.9, "sum").orderBy("x").collect()] == [3.0, 6.0, 9.0, 12.0]
    assert dq.dimensionality_reduction(df, "x", "y", 0.9, "first").columns == ["x", "z"]
    # 'second' keeps col2 (the reference's branch drops col2 too - a bug we fix)
    assert dq.dimensionality_reduction(df, "x", "y", 0.9, "second").columns == ["y", "z"]
    assert dq.dimensionality_reduction(df, "x", "y", 0.9, "delete").columns == ["z"]
    # uncorrelated -> untouched
    assert dq.dimensionality_reduction(df, "x", "z", 0.9, "mean").columns == ["x", "y", "z"]
    # anti-correlation counts as combinable (|corr|)
    neg = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0, 3.0], "y": [-2.0, -4.0, -6.0]}))
    assert dq.dimensionality_reduction(neg, "x", "y", 0.9, "first").columns == ["x"]
    with pytest.raises(ValueError):
        dq.dimensionality_reduction(df, "x", "y", 0.9, "median")
    with pytest.raises(ValueError):
        dq.dimensionality_reduction(df, "x", "y", 1.5, "mean")
