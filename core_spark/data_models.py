"""Typed time-series data models and meter-usage transforms (reference
data_models/*).

- enums ``Uom`` / ``ModelType`` / ``SeriesType`` / ``ValueType``
  (data_models/timeseries.py:20-205);
- value objects ``MetaData`` (timeseries.py:208-273) and ``Usage``
  (meters/ami_meter.py:18-43) as validated dataclasses with matching Spark
  schemas (the reference uses pydantic BaseModel — a third-party dependency
  this engine doesn't assume; validation lives in ``__post_init__``);
- ``create_timeseries_vo`` / ``create_usage_vo``
  (utils/CreateTimeSeriesObject.py:22-45, meters/utils/CreateUsageObject.py);
- ``london_smart_meter_to_usage`` — the London smart-meter → Usage transform
  (transformers/london_smart_meter_transformer_2_usage.py:28-66). The
  reference anonymizes and reshapes ONE CSV LINE AT A TIME in a driver-side
  lambda fed by ``meters/utils/transform.process_file`` (an open()/readline
  loop — single-core, single-machine). Here it is a pure column program:
  ``md5`` anonymization, series-id concat, epoch-seconds extraction and value
  cast all run JVM-side under whole-stage codegen, so the same transform
  scales to a 100 TB meter dump by adding executors.

Timestamp divergence (deliberate): the reference converts wall-clock strings
with ``time.mktime`` — epoch seconds in the DRIVER's local timezone, so the
same file yields different Uids-per-timestamp on differently-configured
machines. We define interval timestamps as UTC epoch seconds.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum, IntFlag, auto
from typing import Any

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


class Uom(Enum):
    """Units of measurement (timeseries.py:20-44)."""

    W = 0
    WH = 1
    KW = 2
    KWH = 3
    MW = 4
    MWH = 5
    WEATHER = 6


class ModelType(IntFlag):
    """Model that produced the series (timeseries.py:47-60)."""

    Default = auto()
    AMI_USAGE = auto()
    WEATHER_AG2 = auto()
    WEATHER_ECMWF = auto()


class SeriesType(IntFlag):
    """Cadence / derivation of the series (timeseries.py:63-152)."""

    RealTime = auto()
    Minute1 = auto()
    Minutes5 = auto()
    Minutes10 = auto()
    Minutes15 = auto()
    Minutes30 = auto()
    Hour = auto()
    Hours2 = auto()
    Hours3 = auto()
    Hours4 = auto()
    Hours5 = auto()
    Hours6 = auto()
    Hours8 = auto()
    Hours12 = auto()
    Hours24 = auto()
    Day = auto()
    Week = auto()
    Month = auto()
    Year = auto()
    Sum = auto()
    MeanFilter = auto()
    MedianFilter = auto()
    MaxFilter = auto()
    MinFilter = auto()
    Test = auto()


class ValueType(IntFlag):
    """Kind of value carried (timeseries.py:155-205), incl. the composed
    short/long-term forecast flags."""

    Counter = auto()
    Gauge = auto()
    Histogram = auto()
    Summary = auto()
    Usage = auto()
    Generation = auto()
    Prediction = auto()
    ShortTerm = auto()
    LongTerm = auto()
    Actuals = auto()
    Backcast = auto()
    Forecast = auto()
    ShortTermBackcast = ShortTerm | Backcast
    LongTermBackcast = LongTerm | Backcast
    ShortTermForecast = ShortTerm | Forecast
    LongTermForecast = LongTerm | Forecast


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


@dataclass
class MetaData:
    """Sensor/series metadata VO (timeseries.py:208-273)."""

    Uid: str
    SeriesId: str
    SeriesParentId: str
    Name: str
    Uom: Uom
    Description: str
    TimestampStart: int
    TimestampEnd: int
    Timezone: str
    Version: str
    SeriesType: SeriesType
    ModelType: ModelType
    ValueType: ValueType
    Properties: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        for name in ("Uid", "SeriesId", "SeriesParentId", "Name"):
            _require(isinstance(getattr(self, name), str), f"{name} must be str")
        _require(isinstance(self.Uom, Uom), "Uom must be a Uom")
        _require(isinstance(self.SeriesType, SeriesType), "SeriesType enum required")
        _require(isinstance(self.ModelType, ModelType), "ModelType enum required")
        _require(isinstance(self.ValueType, ValueType), "ValueType enum required")
        self.TimestampStart = int(self.TimestampStart)
        self.TimestampEnd = int(self.TimestampEnd)
        _require(
            self.TimestampEnd >= self.TimestampStart,
            "TimestampEnd before TimestampStart",
        )


@dataclass
class Usage:
    """AMI meter usage VO (meters/ami_meter.py:18-43)."""

    Uid: str
    SeriesId: str
    Timestamp: int
    IntervalTimestamp: int
    Value: float

    def __post_init__(self) -> None:
        _require(isinstance(self.Uid, str) and self.Uid != "", "Uid must be str")
        _require(isinstance(self.SeriesId, str), "SeriesId must be str")
        self.Timestamp = int(self.Timestamp)
        self.IntervalTimestamp = int(self.IntervalTimestamp)
        self.Value = float(self.Value)


USAGE_SCHEMA = T.StructType(
    [
        T.StructField("Uid", T.StringType(), False),
        T.StructField("SeriesId", T.StringType(), False),
        T.StructField("Timestamp", T.LongType(), False),
        T.StructField("IntervalTimestamp", T.LongType(), False),
        T.StructField("Value", T.DoubleType(), False),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("Uid", T.StringType(), False),
        T.StructField("SeriesId", T.StringType(), False),
        T.StructField("SeriesParentId", T.StringType(), True),
        T.StructField("Name", T.StringType(), True),
        T.StructField("Uom", T.StringType(), True),
        T.StructField("Description", T.StringType(), True),
        T.StructField("TimestampStart", T.LongType(), True),
        T.StructField("TimestampEnd", T.LongType(), True),
        T.StructField("Timezone", T.StringType(), True),
        T.StructField("Version", T.StringType(), True),
        T.StructField("SeriesType", T.IntegerType(), True),
        T.StructField("ModelType", T.IntegerType(), True),
        T.StructField("ValueType", T.IntegerType(), True),
        T.StructField("Properties", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def create_timeseries_vo(**kwargs: Any) -> MetaData:
    """Keyword-argument constructor (utils/CreateTimeSeriesObject.py:22-45)."""
    try:
        return MetaData(
            Uid=kwargs["uid"],
            SeriesId=kwargs["series_id"],
            SeriesParentId=kwargs["series_parent_id"],
            Name=kwargs["name"],
            Uom=kwargs["uom"],
            Description=kwargs["description"],
            TimestampStart=kwargs["timestamp_start"],
            TimestampEnd=kwargs["timestamp_end"],
            Timezone=kwargs["time_zone"],
            Version=kwargs["version"],
            SeriesType=kwargs["series_type"],
            ModelType=kwargs["model_type"],
            ValueType=kwargs["value_type"],
            Properties=kwargs.get("properties") or {},
        )
    except (KeyError, ValueError) as e:
        raise SystemError(f"Could not create Metadata Value Object: {e}") from e


def create_usage_vo(**kwargs: Any) -> Usage:
    """Keyword-argument constructor (meters/utils/CreateUsageObject.py)."""
    try:
        return Usage(
            Uid=kwargs["uid"],
            SeriesId=kwargs["series_id"],
            Timestamp=kwargs["timestamp"],
            IntervalTimestamp=kwargs["interval_timestamp"],
            Value=kwargs["value"],
        )
    except (KeyError, ValueError) as e:
        raise SystemError(f"Could not create Usage Value Object: {e}") from e


def london_smart_meter_to_usage(
    df: DataFrame,
    meter_col: str = "LCLid",
    interval_col: str = "tstp",
    value_col: str = "energy",
    series_id: str = "usage_series_id_001",
    series_suffix_col: str | None = "stdorToU",
) -> DataFrame:
    """London smart-meter rows -> AMI ``Usage`` rows
    (london_smart_meter_transformer_2_usage.py:28-66), distributed:

    - Uid = md5(meter id) — same anonymization as the reference's
      ``anonymizer_md5`` (:34-40), computed JVM-side;
    - SeriesId = ``<series_id>_<tariff>`` (:43-47);
    - Timestamp = IntervalTimestamp = UTC epoch seconds of the reading time
      (the reference reuses the interval time for both, :49-67);
    - Value = reading cast to double (:69).
    """
    tariff = (
        F.col(series_suffix_col)
        if series_suffix_col is not None
        else F.lit("default")
    )
    epoch = F.unix_timestamp(F.col(interval_col).cast("timestamp"))
    return df.select(
        F.md5(F.col(meter_col).cast("string")).alias("Uid"),
        F.concat(F.lit(series_id), F.lit("_"), tariff).alias("SeriesId"),
        epoch.alias("Timestamp"),
        epoch.alias("IntervalTimestamp"),
        F.col(value_col).cast("double").alias("Value"),
    )


# -- small utils (data_models/utils/timeseries_utils.py:20-96 and
#    data_models/storage_objects/storage_objects_utils.py:20-60) ------------

_URI_SCHEMES = ("https", "s3", "gs", "s3a")


def validate_uri(uri: str) -> tuple[str, str | None, str]:
    """Validate a storage-object URI against the supported schemes and split
    it into (scheme, host, path) (storage_objects_utils.py:20-60)."""
    if uri:
        from urllib.parse import urlparse

        parsed = urlparse(uri.strip().rstrip("/"))
        if parsed.scheme in _URI_SCHEMES:
            return parsed.scheme, parsed.hostname, parsed.path
    raise SystemError(f"Could not convert to valid tuple: {uri}")


def get_minute_of_the_day(ts) -> int:
    """(timeseries_utils.py:51-56)"""
    return ts.hour * 60 + ts.minute


def get_interval(series_type: SeriesType, ts) -> int:
    """Interval index of a timestamp within its day for interval series
    (timeseries_utils.py:27-37)."""
    if series_type == SeriesType.Minutes15:
        return get_minute_of_the_day(ts) // 15
    if series_type == SeriesType.Hour:
        return get_minute_of_the_day(ts) // 60
    raise SystemError(f"Not implemented for: {series_type}")


def infer_type(value) -> type:
    """Best-effort python type from a string sample (timeseries_utils.py:
    14-25,76-86): int, float, common date / datetime layouts, else str."""
    from datetime import date, datetime as _dt

    checks = [
        (int, int),
        (float, float),
        (date, lambda v: _dt.strptime(v, "%Y-%m-%d")),
        (date, lambda v: _dt.strptime(v, "%Y/%m/%d")),
        (date, lambda v: _dt.strptime(v, "%d/%m/%Y")),
        (_dt, lambda v: _dt.strptime(v, "%Y-%m-%d %H:%M:%S.%f")),
    ]
    for detected, probe in checks:
        try:
            probe(value)
            return detected
        except (ValueError, TypeError):
            continue
    return str


# --------------------------------------------------------------- weather VOs


def _typed_dataclass_check(obj) -> None:
    """Enforce declared field types on a VO dataclass (the engine's stand-in
    for the reference's pydantic validation). int accepted where float is
    declared; datetime fields accept datetime only."""
    from datetime import datetime as _dt

    hints = type(obj).__annotations__
    for name, want in hints.items():
        if isinstance(want, str):  # PEP 563 stringified; forward refs quoted
            want = want.strip("\"'")
        val = getattr(obj, name)
        if want in ("float", float):
            _require(
                isinstance(val, (int, float)) and not isinstance(val, bool),
                f"{name} must be numeric",
            )
            object.__setattr__(obj, name, float(val))
        elif want in ("int", int):
            _require(
                isinstance(val, int) and not isinstance(val, bool),
                f"{name} must be int",
            )
        elif want in ("str", str):
            _require(isinstance(val, str), f"{name} must be str")
        elif want in ("bool", bool):
            _require(isinstance(val, bool), f"{name} must be bool")
        elif want in ("datetime", _dt):
            _require(isinstance(val, _dt), f"{name} must be datetime")


@dataclass
class AtmosphericG215minForecastV1:
    """The Weather Company 15-minute atmospheric forecast VO
    (data_models/weather/weather_models.py:20-105) — field names are the
    TWC API's own keys, kept verbatim as the exchange contract."""

    clas: str
    clds: int
    day_ind: str
    dewpt: int
    dow: str
    expire_time_gmt: float
    fcst_valid: float
    fcst_valid_local: "datetime"
    feels_like: int
    golf_category: str
    golf_index: int
    gust: int
    hi: int
    icon_code: int
    icon_extd: int
    mslp: float
    num: int
    phrase_12char: str
    phrase_22char: str
    phrase_32char: str
    pop: str
    precip_type: str
    qpf: float
    rh: int
    severity: int
    snow_qpf: float
    subphrase_pt1: str
    subphrase_pt2: str
    subphrase_pt3: str
    temp: int
    uv_desc: str
    uv_index: int
    uv_index_raw: float
    uv_warning: int
    vis: float
    wc: int
    wdir: int
    wdir_cardinal: str
    wspd: int
    wxman: str

    def __post_init__(self) -> None:
        _typed_dataclass_check(self)


@dataclass
class WeatherForecastV1:
    """Standardised weather forecast row VO (weather_models.py:107-131).
    Value is str — the reference declares Value twice (float then str) and
    pydantic keeps the later str annotation; the stored data model
    (transformers.WEATHER_DATA_MODEL) carries typed measurement columns
    instead, so the VO mirrors the reference's wire shape exactly."""

    Tagname: str
    Longitude: float
    Latitude: float
    EventDate: "datetime"
    EventTime: "datetime"
    Source: str
    Status: str
    Value: str
    EnqueuedTime: "datetime"
    Latest: bool

    def __post_init__(self) -> None:
        _typed_dataclass_check(self)


def create_atmospheric_g2_15min_forecast_vo(**kwargs: Any) -> AtmosphericG215minForecastV1:
    """Keyword factory (CreateWeatherObject.py:19-99 —
    create_AtmosphericG215minForecastV1_VO)."""
    return AtmosphericG215minForecastV1(**kwargs)


def create_weather_forecast_vo(**kwargs: Any) -> WeatherForecastV1:
    """Keyword factory (CreateWeatherObject.py:102-140)."""
    return WeatherForecastV1(**kwargs)
