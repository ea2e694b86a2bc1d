"""Analytic tests for linreg_trend and tag_correlation."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from core_spark.operators import data_quality as dq
from core_spark.operators import timeseries as ts
from core_spark.operators.timeseries import TSSpec

SPEC = TSSpec(tag_col="tag", ts_col="ts", value_col="v", status_col=None)
T0 = datetime(2024, 1, 1)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "tag string, ts timestamp, v double")


def test_linreg_recovers_exact_line(spark):
    # v = 10 + 2.5 * days: OLS must recover slope/intercept exactly (r2=1)
    rows = [("a", T0 + timedelta(days=d), 10.0 + 2.5 * d) for d in range(10)]
    out = ts.linreg_trend(_mk(spark, rows), SPEC, forecast_at="2024-01-20 00:00:00")
    r = out.collect()[0]
    assert r["slope_per_day"] == pytest.approx(2.5, abs=1e-4)
    assert r["intercept"] == pytest.approx(10.0, abs=1e-4)
    assert r["r2"] == pytest.approx(1.0, abs=1e-4)
    assert r["forecast"] == pytest.approx(10.0 + 2.5 * 19, abs=1e-3)


def test_linreg_flat_series_zero_slope(spark):
    rows = [("a", T0 + timedelta(hours=h), 7.0) for h in range(24)]
    r = ts.linreg_trend(_mk(spark, rows), SPEC).collect()[0]
    assert r["slope_per_day"] == pytest.approx(0.0, abs=1e-6)
    assert r["intercept"] == pytest.approx(7.0, abs=1e-6)


def test_tag_correlation_perfect_and_inverse(spark):
    # b = 2*a + 1 => corr 1; c = -a => corr -1 (varying values per bucket)
    rows = []
    for h in range(30):
        a = float(h % 7) + 1.0
        rows += [
            ("a", T0 + timedelta(hours=h), a),
            ("b", T0 + timedelta(hours=h), 2.0 * a + 1.0),
            ("c", T0 + timedelta(hours=h), -a),
        ]
    df = _mk(spark, rows)
    r1 = dq.tag_correlation(df, SPEC, "a", "b", 3600).collect()[0]
    assert r1["corr"] == pytest.approx(1.0, abs=1e-6)
    assert r1["n_buckets"] == 30
    r2 = dq.tag_correlation(df, SPEC, "a", "c", 3600).collect()[0]
    assert r2["corr"] == pytest.approx(-1.0, abs=1e-6)


def test_ar1_recovers_known_coefficients(spark):
    # y_t = 5 + 0.5 * y_{t-1} exactly (values quantized to 2 decimals so the
    # exact-decimal resample path is lossless): AR(1) fit must recover phi
    # and intercept to the 4-digit rounding.
    ys = [20.0]
    for _ in range(49):
        ys.append(round(5.0 + 0.5 * ys[-1], 2))
    rows = [("a", T0 + timedelta(hours=h), y) for h, y in enumerate(ys)]
    r = ts.ar1_forecast(_mk(spark, rows), SPEC, 3600).collect()[0]
    assert r["n"] == 49
    assert r["phi"] == pytest.approx(0.5, abs=2e-3)
    assert r["intercept"] == pytest.approx(5.0, abs=2e-2)
    assert r["forecast"] == pytest.approx(5.0 + 0.5 * r["y_last"], abs=1e-3)


def test_ar1_buckets_before_fitting(spark):
    # two same-bucket observations average (exactly) before the lag/fit, so
    # y_last reflects the bucket mean, not either raw row
    rows = [
        ("a", T0, 1.0),
        ("a", T0 + timedelta(hours=1), 2.0),
        ("a", T0 + timedelta(hours=1, minutes=30), 4.0),
    ]
    r = ts.ar1_forecast(_mk(spark, rows), SPEC, 3600).collect()[0]
    assert r["y_last"] == pytest.approx(3.0)


def test_ar_auto_recovers_order_two(spark):
    # y_t = 10 + 0.5 y_{t-1} + 0.3 y_{t-2} + seeded uniform noise (a smooth
    # ripple like sin(i) would be partially predictable by an extra lag and
    # AICc would rightly pick p=3); values rounded to 2 decimals up front so
    # the exact-decimal resample is an identity.
    import random

    rng = random.Random(42)
    y = [50.0, 55.0]
    for i in range(2, 240):
        y.append(round(10 + 0.5 * y[-1] + 0.3 * y[-2] + rng.uniform(-0.05, 0.05), 2))
    rows = [("a", T0 + timedelta(minutes=i), v) for i, v in enumerate(y)]
    out = ts.ar_auto_forecast(_mk(spark, rows), SPEC, every_seconds=60, max_p=3,
                              horizon_steps=2)
    r = out.collect()[0]
    assert r["p"] == 2
    assert r["coef"][1] == pytest.approx(0.5, abs=0.05)
    assert r["coef"][2] == pytest.approx(0.3, abs=0.05)
    # recursive forecast from the fitted model continues the recurrence
    assert r["forecast"][0] == pytest.approx(10 + 0.5 * y[-1] + 0.3 * y[-2], abs=0.2)
    assert len(r["forecast"]) == 2


def test_ar_auto_on_ar1_prefers_order_one_and_matches_ar1(spark):
    # decorrelated noise: a periodic or multiplicative-hash perturbation is
    # itself lag-correlated and would justify a higher order
    import random

    rng = random.Random(7)
    y = [20.0]
    for i in range(1, 200):
        y.append(round(5 + 0.7 * y[-1] + rng.uniform(-0.05, 0.05), 2))
    rows = [("a", T0 + timedelta(minutes=i), v) for i, v in enumerate(y)]
    auto = ts.ar_auto_forecast(_mk(spark, rows), SPEC, every_seconds=60, max_p=3)
    r = auto.collect()[0]
    assert r["p"] == 1
    ar1 = ts.ar1_forecast(_mk(spark, rows), SPEC, every_seconds=60).collect()[0]
    assert r["coef"][1] == pytest.approx(ar1["phi"], abs=1e-3)
    assert r["forecast"][0] == pytest.approx(ar1["forecast"], abs=0.05)


def test_ar_auto_short_series_degrades(spark):
    rows = [("a", T0 + timedelta(minutes=i), float(i)) for i in range(3)]
    r = ts.ar_auto_forecast(_mk(spark, rows), SPEC, every_seconds=60).collect()[0]
    assert r["p"] == 0 and r["forecast"] == []
