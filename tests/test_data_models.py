"""Typed data-model layer (reference data_models/*)."""

from __future__ import annotations

import hashlib
from datetime import datetime

import pytest

from core_spark.data_models import (
    MetaData,
    ModelType,
    SeriesType,
    Uom,
    Usage,
    ValueType,
    create_timeseries_vo,
    create_usage_vo,
    london_smart_meter_to_usage,
)


def test_valuetype_composed_flags():
    # timeseries.py:200-205 — composed flags are the union of their parts
    assert ValueType.ShortTermForecast == ValueType.ShortTerm | ValueType.Forecast
    assert ValueType.LongTermBackcast & ValueType.Backcast
    assert not (ValueType.ShortTermForecast & ValueType.Backcast)


def test_create_timeseries_vo_roundtrip_and_validation():
    vo = create_timeseries_vo(
        uid="m1", series_id="s1", series_parent_id="p1", name="meter one",
        uom=Uom.KWH, description="", timestamp_start=100, timestamp_end=200,
        time_zone="UTC", version="1", series_type=SeriesType.Minutes30,
        model_type=ModelType.AMI_USAGE, value_type=ValueType.Usage,
    )
    assert isinstance(vo, MetaData) and vo.TimestampEnd == 200
    with pytest.raises(SystemError):
        create_timeseries_vo(uid="m1")  # missing keys -> SystemError (ref :43-45)
    with pytest.raises(SystemError):
        create_timeseries_vo(
            uid="m1", series_id="s1", series_parent_id="p1", name="n",
            uom=Uom.KWH, description="", timestamp_start=300, timestamp_end=200,
            time_zone="UTC", version="1", series_type=SeriesType.Hour,
            model_type=ModelType.Default, value_type=ValueType.Gauge,
        )  # end before start


def test_create_usage_vo_coercion():
    vo = create_usage_vo(
        uid="u", series_id="s", timestamp="100", interval_timestamp=100.0, value="1.5"
    )
    assert isinstance(vo, Usage)
    assert (vo.Timestamp, vo.IntervalTimestamp, vo.Value) == (100, 100, 1.5)


def test_london_smart_meter_to_usage(spark):
    df = spark.createDataFrame(
        [
            ("MAC000002", "Std", datetime(2013, 1, 1, 0, 30), "0.219"),
            ("MAC000002", "Std", datetime(2013, 1, 1, 1, 0), "0.141"),
            ("MAC000003", "ToU", datetime(2013, 1, 1, 0, 30), "0.0"),
        ],
        "LCLid string, stdorToU string, tstp timestamp, energy string",
    )
    out = london_smart_meter_to_usage(df).orderBy("Uid", "IntervalTimestamp").collect()
    assert [r.SeriesId for r in out] in (
        [
            "usage_series_id_001_Std", "usage_series_id_001_Std",
            "usage_series_id_001_ToU",
        ],
        [
            "usage_series_id_001_ToU", "usage_series_id_001_Std",
            "usage_series_id_001_Std",
        ],
    )
    by_uid = {r.Uid for r in out}
    assert hashlib.md5(b"MAC000002").hexdigest() in by_uid  # ref anonymizer_md5
    row = [r for r in out if r.Uid == hashlib.md5(b"MAC000002").hexdigest()][0]
    assert row.Timestamp == row.IntervalTimestamp == 1357000200  # UTC epoch
    assert row.Value == 0.219


def test_validate_uri_and_interval_utils():
    from datetime import datetime as dt

    from core_spark.data_models import get_interval, infer_type, validate_uri

    assert validate_uri("s3://bucket/key/") == ("s3", "bucket", "/key")
    assert validate_uri("https://acct.blob.core.windows.net/c/p") == (
        "https", "acct.blob.core.windows.net", "/c/p"
    )
    with pytest.raises(SystemError):
        validate_uri("ftp://nope/x")

    t = dt(2024, 1, 1, 2, 45)
    assert get_interval(SeriesType.Minutes15, t) == 11
    assert get_interval(SeriesType.Hour, t) == 2
    with pytest.raises(SystemError):
        get_interval(SeriesType.RealTime, t)

    from datetime import date, datetime
    assert infer_type("42") is int
    assert infer_type("4.5") is float
    assert infer_type("2024-01-01") is date
    assert infer_type("2024-01-01 00:00:00.000") is datetime
    assert infer_type("hello") is str
