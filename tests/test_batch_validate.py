"""Tests for the reference-shaped batch fan-out (queries/time_series/
batch.py parity), schema validation/coercion (input_validator.py parity),
and the weather VO data models."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from core_spark import batch
from core_spark.data_models import (
    AtmosphericG215minForecastV1,
    WeatherForecastV1,
    create_weather_forecast_vo,
)
from core_spark.operators import timeseries as tsq
from core_spark.operators.data_quality import validate_schema
from core_spark.operators.timeseries import TSSpec
from core_spark.query_builder import TimeSeriesQueryBuilder

SF_DIR = "/root/testdata/sf0.001"
START, END = "2024-01-01", "2024-02-01"
TAGS = ["click", "view"]
SRC_COLS = dict(
    tagname_column="event_type",
    timestamp_column="ts",
    status_column=None,
    value_column="value",
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------------ batch


def _request(verb: str, events, **extra):
    params = {"source": events, "tag_names": TAGS, **SRC_COLS, **extra}
    params = {k: v for k, v in params.items() if v is not None or k == "status_column"}
    return {"type": verb, "parameters_dict": params}


def test_batch_get_matches_direct_calls_in_order(spark, events):
    reqs = [
        _request("raw", events, start_date=START, end_date=END),
        _request(
            "resample",
            events,
            start_date=START,
            end_date=END,
            time_interval_rate="1",
            time_interval_unit="hour",
            agg_method="avg",
        ),
        _request("latest", events),
    ]
    got = batch.get(spark, reqs, threadpool_max_workers=3)
    assert len(got) == 3

    qb = TimeSeriesQueryBuilder().connect(spark).source(events, **SRC_COLS)
    want = [
        qb.raw(tagname_filter=TAGS, start_date=START, end_date=END),
        qb.resample(
            tagname_filter=TAGS,
            start_date=START,
            end_date=END,
            time_interval_rate="1",
            time_interval_unit="hour",
            agg_method="avg",
        ),
        qb.latest(tagname_filter=TAGS),
    ]
    for got_pdf, want_df in zip(got, want):
        want_pdf = want_df.toPandas()
        assert len(got_pdf) == len(want_pdf)
        assert sorted(got_pdf.columns) == sorted(want_pdf.columns)
        key = sorted(got_pdf.columns)
        a = got_pdf[key].sort_values(key, ignore_index=True)
        b = want_pdf[key].sort_values(key, ignore_index=True)
        assert a.equals(b)


def test_batch_get_lazy_mode_returns_dataframes(spark, events):
    [df] = batch.get(
        spark,
        [_request("raw", events, start_date=START, end_date=END)],
        to_pandas=False,
    )
    assert hasattr(df, "explain")  # a lazy Spark DataFrame, no action taken
    assert df.count() > 0


def test_batch_get_unknown_type_and_error_propagation(spark, events):
    with pytest.raises(ValueError, match="unknown query type"):
        batch.get(spark, [{"type": "nope", "parameters_dict": {"source": events}}])
    # verb-level errors propagate too (bad interval unit)
    bad = _request(
        "resample",
        events,
        start_date=START,
        end_date=END,
        time_interval_rate="1",
        time_interval_unit="lightyear",
        agg_method="avg",
    )
    with pytest.raises(ValueError, match="time_interval_unit"):
        batch.get(spark, [bad], threadpool_max_workers=2)


# -------------------------------------------------------- validate_schema


def _pcdm_strings(spark):
    return spark.createDataFrame(
        [
            ("a", "2024-01-01 03:00:00", "Good", "1.5"),
            ("a", "2024-01-01 04:00:00", "Good", "None"),
            ("b", "2024-01-01 05:00:00", "Good", ""),
        ],
        "TagName string, EventTime string, Status string, Value string",
    )


def test_validate_schema_casts_and_normalizes_null_markers(spark):
    want = T.StructType(
        [
            T.StructField("TagName", T.StringType()),
            T.StructField("EventTime", T.TimestampType()),
            T.StructField("Status", T.StringType()),
            T.StructField("Value", T.FloatType()),
        ]
    )
    out = validate_schema(_pcdm_strings(spark), want)
    assert dict((f.name, f.dataType) for f in out.schema.fields) == dict(
        (f.name, f.dataType) for f in want.fields
    )
    got = {(r["TagName"], str(r["EventTime"])): r["Value"] for r in out.collect()}
    assert got[("a", "2024-01-01 03:00:00")] == pytest.approx(1.5)
    # the "None" and "" markers became real NULLs, not cast errors
    assert got[("a", "2024-01-01 04:00:00")] is None
    assert got[("b", "2024-01-01 05:00:00")] is None


def test_validate_schema_rejects_uncastable_and_missing(spark):
    df = spark.createDataFrame([("x", "notanumber")], "TagName string, Value string")
    with pytest.raises(ValueError, match="cannot be cast"):
        validate_schema(df, {"Value": T.FloatType()})
    with pytest.raises(ValueError, match="missing"):
        validate_schema(df, {"Ghost": T.StringType()})
    with pytest.raises(TypeError):
        validate_schema(df, {"Value": float})  # not a pyspark DataType


def test_validate_schema_noop_when_types_match(spark):
    df = spark.createDataFrame([("x", 1.0)], "TagName string, Value double")
    out = validate_schema(df, {"TagName": T.StringType(), "Value": T.DoubleType()})
    assert rows(out) == rows(df)


# ------------------------------------------------------------ weather VOs


def test_weather_forecast_vo_roundtrip_and_coercion():
    ts = datetime(2024, 1, 1, 12)
    vo = create_weather_forecast_vo(
        Tagname="fc-1",
        Longitude=-1,  # int coerced to float
        Latitude=53.5,
        EventDate=ts,
        EventTime=ts,
        Source="ECMWF",
        Status="Success",
        Value="12.5",
        EnqueuedTime=ts,
        Latest=True,
    )
    assert isinstance(vo.Longitude, float) and vo.Longitude == -1.0
    assert vo.Value == "12.5"  # wire shape keeps Value as str (see docstring)


def test_weather_vo_type_errors():
    ts = datetime(2024, 1, 1)
    good = dict(
        Tagname="t",
        Longitude=0.0,
        Latitude=0.0,
        EventDate=ts,
        EventTime=ts,
        Source="s",
        Status="ok",
        Value="v",
        EnqueuedTime=ts,
        Latest=False,
    )
    WeatherForecastV1(**good)
    for key, bad in [("Latest", "yes"), ("EventTime", "2024-01-01"), ("Value", 1.5)]:
        with pytest.raises(ValueError):
            WeatherForecastV1(**{**good, key: bad})


def test_atmospheric_vo_field_surface():
    # 40 TWC fields, API-verbatim names (weather_models.py:20-105)
    names = list(AtmosphericG215minForecastV1.__annotations__)
    assert len(names) == 40
    assert names[0] == "clas" and "wxman" in names and "uv_index_raw" in names
