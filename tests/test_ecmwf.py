"""ECMWF MARS source + nc extraction (reference pipelines/sources/spark/
ecmwf/* and pipelines/transformers/spark/ecmwf/*)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from core_spark.ecmwf import (
    ECMWFMarsSource,
    ECMWFWeatherForecastSource,
    ecmwf_extract_grid,
    ecmwf_extract_point,
)


def make_fake_decoder():
    """Deterministic stand-in for the xarray decode: a 3x3 grid, two valid
    times, two variables; values derive from the run file name so every file
    is distinct. Built as a closure so Spark serializes it by value (a
    module-level test function can't be imported on executors)."""

    def fake_decoder(path: str) -> pd.DataFrame:
        import datetime as _dt

        import pandas as _pd

        seed = sum(ord(c) for c in path.split("/")[-1])
        rows = []
        for la in (50.0, 50.1, 50.2):
            for lo in (4.0, 4.1, 4.2):
                for hour in (0, 1):
                    rows.append(
                        {
                            "latitude": la,
                            "longitude": lo,
                            "time": _dt.datetime(2024, 1, 1, hour),
                            "t2m": seed + la * 10 + lo + hour,
                            "u10": seed - la + lo * 2 + hour,
                        }
                    )
        return _pd.DataFrame(rows)

    return fake_decoder


def test_mars_request_assembly_and_retry():
    calls = []

    def execute(request, target):
        calls.append((request, target))
        if len(calls) == 1:
            raise RuntimeError("transient")  # first attempt of first run fails

    src = ECMWFMarsSource(
        "2024-01-01 00:00:00", "2024-01-01 12:00:00", "/tmp/nc",
        run_interval="12", run_frequency="H", execute=execute, tries=3,
    )
    ok = src.retrieve({"class": "od", "param": ["165.128", "166.128"], "grid": [0.1, 0.1]})
    assert ok == [True, True]  # 00Z and 12Z runs, first retried
    req, target = calls[1]
    assert req.startswith("retrieve,date=2024-01-01,time=00,format=netcdf,")
    assert "param=165.128/166.128" in req and "grid=0.1/0.1" in req
    assert target == "/tmp/nc/2024-01-01_00.nc"

    with pytest.raises(ValueError, match="don't include date"):
        src.retrieve({"date": "x"})
    with pytest.raises(NotImplementedError, match="no MARS transport"):
        ECMWFMarsSource("2024-01-01", "2024-01-01", "/tmp/nc").retrieve({})


def test_weather_forecast_preset():
    calls = []
    src = ECMWFWeatherForecastSource(
        spark=None, save_path="/tmp/nc",
        date_start="2024-01-01 00:00:00", date_end="2024-01-01 12:00:00",
        ecmwf_class="od", stream="oper", expver="1", leveltype="sfc",
        ec_vars=["165.128"], forecast_area=[55, 0, 45, 10],
        execute=lambda req, tgt: calls.append(req),
    )
    assert src.read_batch() == [True, True]
    lead = ECMWFWeatherForecastSource._get_lead_time()
    assert lead[:3] == [0, 1, 2] and 93 in lead and 150 in lead and lead[-1] == 240
    assert "levtype=sfc" in calls[0] and "type=fc" in calls[0]
    assert "area=55/0/45/10" in calls[0]


def test_extract_point_nearest_and_tags(spark):
    df = ecmwf_extract_point(
        spark, "/data/nc", "2024-01-01 00:00:00", "2024-01-01 12:00:00",
        "12", "H", lat=50.04, lon=4.18, variables=["t2m", "10u"],
        tag_prefix="ws_", decoder=make_fake_decoder(),
    )
    rows = df.collect()
    # 2 runs x 2 valid times x 2 variables at one (lat,lon)
    assert len(rows) == 8
    assert {r.Latitude for r in rows} == {50.0}  # nearest of 50.04
    assert {r.Longitude for r in rows} == {4.2}  # nearest of 4.18
    tags = {r.TagName for r in rows}
    assert tags == {"ws_50.0_4.2_ECMWF_MARS_t2m", "ws_50.0_4.2_ECMWF_MARS_u10"}
    one = [r for r in rows if r.TagName.endswith("t2m") and r.EventTime.hour == 1][0]
    assert one.Status == "Good" and one.Latest is True
    assert one.EventDate == one.EventTime.date()
    # value derives from the run file the row came from
    seed = sum(ord(c) for c in f"{one.EnqueuedTime.date()}_{one.EnqueuedTime.hour:02}.nc")
    assert one.Value == seed + 50.0 * 10 + 4.2 + 1


def test_extract_grid_cross_product(spark):
    df = ecmwf_extract_grid(
        spark, "/data/nc", "2024-01-01 00:00:00", "2024-01-01 00:00:00",
        "12", "H", min_lat=50.0, max_lat=50.1, min_lon=4.0, max_lon=4.1,
        grid_step=0.1, variables=["t2m"], tag_prefix="g_",
        decoder=make_fake_decoder(),
    )
    rows = df.collect()
    # 1 run x 2 valid times x (2 lats x 2 lons) x 1 variable
    assert len(rows) == 8
    assert {(r.Latitude, r.Longitude) for r in rows} == {
        (50.0, 4.0), (50.0, 4.1), (50.1, 4.0), (50.1, 4.1)
    }
