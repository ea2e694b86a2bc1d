"""WeatherQueryBuilder verb semantics (reference queries/weather/
weather_query_builder.py:78-347 and _weather_query_builder.py:80-186)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from core_spark.weather import WeatherQueryBuilder


@pytest.fixture(scope="module")
def wdf(spark):
    rows = [
        # tagname, event_time, enqueued_time, lat, lon, value
        ("ST1_temperature", "2024-01-01 00:00:00", "2023-12-31 23:00:00", 10.0, -80.0, 1.0),
        ("ST1_temperature", "2024-01-02 00:00:00", "2024-01-01 23:00:00", 10.0, -80.0, 2.0),
        ("ST2_windspeed", "2024-01-01 12:00:00", "2024-01-01 11:00:00", 20.0, -80.0, 3.0),
        ("ST3_temperature", "2024-01-05 00:00:00", "2024-01-04 23:00:00", 60.0, 0.0, 4.0),
        ("ST4_temperature", "2024-03-01 00:00:00", "2024-02-28 23:00:00", 10.0, -80.0, 5.0),
    ]
    df = spark.createDataFrame(
        [(t, datetime.fromisoformat(e), datetime.fromisoformat(q), la, lo, v)
         for t, e, q, la, lo, v in rows],
        "TagName string, EventTime timestamp, EnqueuedTime timestamp, "
        "Latitude double, Longitude double, Value double",
    )
    return df


def _builder(spark, wdf):
    return WeatherQueryBuilder().connect(spark).source(wdf)


def test_raw_point_equality_and_inclusive_between(spark, wdf):
    out = _builder(spark, wdf).raw_point(
        start_date="2024-01-01 00:00:00",
        end_date="2024-01-02 00:00:00",  # inclusive end: keeps the 01-02 row
        forecast_run_start_date="2023-12-31 00:00:00",
        forecast_run_end_date="2024-01-02 00:00:00",
        lat=10.0, lon=-80.0,
    )
    vals = sorted(r.Value for r in out.collect())
    assert vals == [1.0, 2.0]  # ST2 (lat 20) and ST4 (March) excluded


def test_raw_grid_strict_bounds(spark, wdf):
    out = _builder(spark, wdf).raw_grid(
        start_date="2024-01-01 00:00:00",
        end_date="2024-01-31 00:00:00",
        forecast_run_start_date="2023-12-01 00:00:00",
        forecast_run_end_date="2024-01-31 00:00:00",
        min_lat=10.0, max_lat=60.0,  # strict: lat==10 and lat==60 both excluded
        min_lon=-120.0, max_lon=120.0,
    )
    assert [r.TagName for r in out.collect()] == ["ST2_windspeed"]


def test_measurement_suffix_filter(spark, wdf):
    out = _builder(spark, wdf).latest_grid(
        min_lat=-90.0, max_lat=90.0, min_lon=-180.0, max_lon=180.0,
        measurement="temperature",
    )
    tags = {r.TagName for r in out.collect()}
    assert tags == {"ST1_temperature", "ST3_temperature", "ST4_temperature"}


def test_latest_point_and_limit(spark, wdf):
    out = _builder(spark, wdf).latest_point(lat=10.0, lon=-80.0, limit=2)
    assert out.count() == 2
    # ordered by tagname; limit collapses to TakeOrderedAndProject
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_column_rebinding(spark, wdf):
    renamed = wdf.toDF("tg", "et", "qt", "la", "lo", "v")
    out = (
        WeatherQueryBuilder()
        .connect(spark)
        .source(
            renamed,
            tagname_column="tg", timestamp_column="et",
            forecast_run_timestamp_column="qt", status_column=None,
            value_column="v", latitude_column="la", longitude_column="lo",
        )
        .raw_grid(
            start_date="2024-01-01 00:00:00", end_date="2024-12-31 00:00:00",
            forecast_run_start_date="2023-01-01 00:00:00",
            forecast_run_end_date="2024-12-31 00:00:00",
            min_lat=0.0, max_lat=90.0, min_lon=-180.0, max_lon=180.0,
        )
    )
    assert out.count() == 5


def test_filters_reach_scan(spark, tmp_path, wdf):
    path = str(tmp_path / "w.parquet")
    wdf.write.mode("overwrite").parquet(path)
    out = (
        WeatherQueryBuilder()
        .connect(spark)
        .source(spark.read.parquet(path))
        .latest_grid(min_lat=0.0, max_lat=30.0, min_lon=-90.0, max_lon=0.0)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "Latitude" in plan.split("PushedFilters")[1][:200]


def test_raw_forecast_to_weather_data_model_schema_and_scrub(spark):
    from core_spark.transformers import WEATHER_DATA_MODEL, raw_forecast_to_weather_data_model

    raw = spark.createDataFrame(
        [(40.75, -73.98, "2024-01-15T03:00:00-0500", 28.0, "", "rain", "7", "3")],
        "Latitude double, Longitude double, FcstValidLocal string, "
        "Temp double, DayInd string, PrecipType string, Pop string, Num string",
    )
    out = raw_forecast_to_weather_data_model(raw, "2024-06-01 00:00:00")
    # declared model names+types (ref :59-69); nullability flags are the one
    # thing the reference's createDataFrame(df.rdd, schema) forces that a
    # projection doesn't claim
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in WEATHER_DATA_MODEL.fields
    ]
    row = out.first()
    assert row.WeatherDay == "2024-01-15" and row.WeatherHour == 4  # 1-based
    assert row.WeatherTimezoneOffset == "-0500" and row.WeatherType == "F"
    assert row.DayOrNight is None  # '' -> NULL scrub (ref :128-132)
    assert row.PropOfPrecip == 7 and row.ForecastDayNum == 3  # string -> int cast
    assert row.WindGust is None and row.WetBulbTemp is None  # absent sources
