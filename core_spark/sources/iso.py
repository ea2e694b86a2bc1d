"""ISO / weather domain sources (reference pipelines/sources/spark/iso/* and
the_weather_company/*, SURVEY §2.1 "ISO / weather domain sources").

Contract kept from the reference's BaseISOSource (iso/base_iso.py:30-224):
pull (pandas) -> prepare -> sanitize -> reorder to the declared StructType ->
``spark.createDataFrame`` with the explicit schema; required-option and
date-format validation before any fetch; ``read_stream`` unsupported.

Deliberate divergences:
- transport is an injected ``fetch: url_suffix -> bytes`` callable instead
  of a hard-wired ``requests.get`` (base_iso.py:55-77) — the network call is
  a deployment concern; tests inject deterministic payloads (same strategy
  as the engine's RestSink transport injection);
- the MISO feed is consumed as CSV, not the marketreports ``.xls`` — the
  Excel reader is an optional pandas dependency not present here, and the
  column contract (miso_daily_load_iso.py:120-167) is unchanged;
- these feeds are driver-side by nature (one small frame per API day, the
  reference does exactly the same pandas work); the scale posture is that
  ISO pulls are *dimension* inputs, never the 100 TB fact path.
"""

from __future__ import annotations

import zipfile
from datetime import datetime
from io import BytesIO
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MISO_SCHEMA = T.StructType(
    [
        T.StructField("Datetime", T.TimestampType()),
        T.StructField("Lrz1", T.DoubleType()),
        T.StructField("Lrz2_7", T.DoubleType()),
        T.StructField("Lrz3_5", T.DoubleType()),
        T.StructField("Lrz4", T.DoubleType()),
        T.StructField("Lrz6", T.DoubleType()),
        T.StructField("Lrz8_9_10", T.DoubleType()),
        T.StructField("Miso", T.DoubleType()),
    ]
)

PJM_SCHEMA = T.StructType(
    [
        T.StructField("StartTime", T.TimestampType()),
        T.StructField("EndTime", T.TimestampType()),
        T.StructField("Zone", T.StringType()),
        T.StructField("Load", T.DoubleType()),
    ]
)

CAISO_SCHEMA = T.StructType(
    [
        T.StructField("StartTime", T.TimestampType()),
        T.StructField("EndTime", T.TimestampType()),
        T.StructField("LoadType", T.LongType()),
        T.StructField("OprDt", T.StringType()),
        T.StructField("OprHr", T.LongType()),
        T.StructField("OprInterval", T.LongType()),
        T.StructField("MarketRunId", T.StringType()),
        T.StructField("TacAreaName", T.StringType()),
        T.StructField("Label", T.StringType()),
        T.StructField("XmlDataItem", T.StringType()),
        T.StructField("Pos", T.DoubleType()),
        T.StructField("Load", T.DoubleType()),
        T.StructField("ExecutionType", T.StringType()),
        T.StructField("Group", T.LongType()),
    ]
)

ERCOT_SCHEMA = T.StructType(
    [
        T.StructField("Date", T.TimestampType()),
        T.StructField("HourEnding", T.StringType()),
        T.StructField("Coast", T.DoubleType()),
        T.StructField("East", T.DoubleType()),
        T.StructField("FarWest", T.DoubleType()),
        T.StructField("North", T.DoubleType()),
        T.StructField("NorthCentral", T.DoubleType()),
        T.StructField("SouthCentral", T.DoubleType()),
        T.StructField("Southern", T.DoubleType()),
        T.StructField("West", T.DoubleType()),
        T.StructField("SystemTotal", T.DoubleType()),
        T.StructField("DstFlag", T.StringType()),
    ]
)

# the_weather_company feeds (_pipeline_utils/weather.py:16-62)
WEATHER_FORECAST_SCHEMA = T.StructType(
    [
        T.StructField("Latitude", T.DoubleType()),
        T.StructField("Longitude", T.DoubleType()),
        T.StructField("Class", T.StringType()),
        T.StructField("ExpireTimeGmt", T.IntegerType()),
        T.StructField("FcstValid", T.IntegerType()),
        T.StructField("FcstValidLocal", T.StringType()),
        T.StructField("Num", T.IntegerType()),
        T.StructField("DayInd", T.StringType()),
        T.StructField("Temp", T.IntegerType()),
        T.StructField("Dewpt", T.IntegerType()),
        T.StructField("Hi", T.IntegerType()),
        T.StructField("Wc", T.IntegerType()),
        T.StructField("FeelsLike", T.IntegerType()),
        T.StructField("IconExtd", T.IntegerType()),
        T.StructField("Wxman", T.StringType()),
        T.StructField("IconCode", T.IntegerType()),
        T.StructField("Dow", T.StringType()),
        T.StructField("Phrase12Char", T.StringType()),
        T.StructField("Phrase22Char", T.StringType()),
        T.StructField("Phrase32Char", T.StringType()),
        T.StructField("SubphrasePt1", T.StringType()),
        T.StructField("SubphrasePt2", T.StringType()),
        T.StructField("SubphrasePt3", T.StringType()),
        T.StructField("Pop", T.StringType()),
        T.StructField("PrecipType", T.StringType()),
        T.StructField("Qpf", T.DoubleType()),
        T.StructField("SnowQpf", T.DoubleType()),
        T.StructField("Rh", T.IntegerType()),
        T.StructField("Wspd", T.IntegerType()),
        T.StructField("Wdir", T.IntegerType()),
        T.StructField("WdirCardinal", T.StringType()),
        T.StructField("Gust", T.DoubleType()),
        T.StructField("Clds", T.IntegerType()),
        T.StructField("Vis", T.DoubleType()),
        T.StructField("Mslp", T.DoubleType()),
        T.StructField("UvIndexRaw", T.DoubleType()),
        T.StructField("UvIndex", T.IntegerType()),
        T.StructField("UvWarning", T.IntegerType()),
        T.StructField("UvDesc", T.StringType()),
        T.StructField("GolfIndex", T.DoubleType()),
        T.StructField("GolfCategory", T.StringType()),
        T.StructField("Severity", T.IntegerType()),
    ]
)


class BaseISOSource:
    """Pull -> prepare -> sanitize -> typed Spark frame
    (reference iso/base_iso.py:30-224)."""

    iso_url: str = "https://"
    query_datetime_format: str = "%Y%m%d"
    required_options: list[str] = []
    spark_schema: T.StructType = T.StructType([T.StructField("id", T.IntegerType())])

    def __init__(
        self,
        spark: SparkSession,
        options: dict,
        fetch: Callable[[str], bytes] | None = None,
    ) -> None:
        self.spark = spark
        self.options = options
        self._fetch = fetch

    # -- transport -----------------------------------------------------------
    def _fetch_from_url(self, url_suffix: str) -> bytes:
        if self._fetch is None:
            raise NotImplementedError(
                f"{type(self).__name__}: no transport injected — pass "
                f"fetch=<callable url_suffix -> bytes> (network access is a "
                f"deployment concern; reference base_iso.py:55-77 hard-wires "
                f"requests.get here)"
            )
        return self._fetch(url_suffix)

    # -- hooks (children override; base_iso.py:93-146) -----------------------
    def _pull_data(self) -> pd.DataFrame:
        return pd.read_csv(BytesIO(self._fetch_from_url("")))

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        return df

    def _sanitize_data(self, df: pd.DataFrame) -> pd.DataFrame:
        return df

    def _get_data(self) -> pd.DataFrame:
        df = self._pull_data()
        df = self._prepare_data(df)
        df = self._sanitize_data(df)
        return df[self.spark_schema.names]  # declared column order

    # -- validation (base_iso.py:158-186) -------------------------------------
    def _validate_options(self) -> bool:
        return True

    def pre_read_validation(self) -> bool:
        for key in self.required_options:
            if key not in self.options:
                raise ValueError(f"Required option `{key}` is missing.")
        return self._validate_options()

    def _validate_date(self, key: str = "date") -> None:
        raw = str(self.options.get(key, "")).strip()
        try:
            datetime.strptime(raw, self.query_datetime_format)
        except ValueError:
            raise ValueError(
                f"Unable to parse date `{raw}`. Please specify in "
                f"{self.query_datetime_format} format."
            )

    # -- entry points ----------------------------------------------------------
    def read_batch(self) -> DataFrame:
        self.pre_read_validation()
        pdf = self._get_data()
        return self.spark.createDataFrame(pdf, schema=self.spark_schema)

    def read_stream(self) -> DataFrame:
        raise NotImplementedError(
            f"{type(self).__name__} connector doesn't support stream operation."
        )


def _maybe_unzip(content: bytes) -> bytes:
    """ISO feeds arrive zipped (caiso_daily_load_iso.py:100-108); accept
    either a raw CSV payload or a zip containing one."""
    if content[:2] == b"PK":
        zf = zipfile.ZipFile(BytesIO(content))
        csvs = [n for n in zf.namelist() if ".csv" in n]
        if not csvs:
            raise ValueError("No data was found in the specified interval")
        return zf.read(csvs[0])
    return content


class MISODailyLoadSource(BaseISOSource):
    """MISO daily forecast/actual load (miso_daily_load_iso.py:30-180):
    date_time from Market Day + (HourEnding - 1), load_type column filter by
    suffix, zone renames into MISO_SCHEMA."""

    required_options = ["load_type", "date"]
    spark_schema = MISO_SCHEMA
    _RENAME = {
        "LRZ1": "Lrz1", "LRZ2_7": "Lrz2_7", "LRZ3_5": "Lrz3_5", "LRZ4": "Lrz4",
        "LRZ6": "Lrz6", "LRZ8_9_10": "Lrz8_9_10", "MISO": "Miso",
        "DATE_TIME": "Datetime",
    }

    def _validate_options(self) -> bool:
        self._validate_date()
        lt = self.options.get("load_type")
        if lt not in ("actual", "forecast"):
            raise ValueError(f"Invalid load_type `{lt}` given. Supported values: ['actual', 'forecast'].")
        return True

    def _pull_data(self) -> pd.DataFrame:
        return pd.read_csv(BytesIO(self._fetch_from_url(f"{self.options['date']}_df_al")))

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["HourEnding"] != "HourEnding") & df["MISO MTLF (MWh)"].notna()].copy()
        df.rename(columns={"Market Day": "date"}, inplace=True)
        df["date_time"] = pd.to_datetime(df["date"]) + pd.to_timedelta(
            df["HourEnding"].astype(int) - 1, "h"
        )
        df.drop(["HourEnding", "date"], axis=1, inplace=True)
        data_cols = df.columns[df.columns != "date_time"]
        df[data_cols] = df[data_cols].astype(float)
        return df.reset_index(drop=True)

    def _sanitize_data(self, df: pd.DataFrame) -> pd.DataFrame:
        skip = "MTLF (MWh)" if self.options["load_type"] == "actual" else "ActualLoad (MWh)"
        df = df[[c for c in df.columns if not c.endswith(skip)]].dropna()
        df.columns = [str(c.split(" ")[0]).upper() for c in df.columns]
        return df.rename(columns=self._RENAME)


class PJMDailyLoadSource(BaseISOSource):
    """PJM daily load (pjm_daily_load_iso.py:100-205): per-load_type column
    renames, '%m/%d/%Y %I:%M:%S %p' datetime parse, PJM_SCHEMA."""

    required_options = ["api_key", "load_type"]
    spark_schema = PJM_SCHEMA

    def _validate_options(self) -> bool:
        lt = self.options.get("load_type")
        if lt not in ("actual", "forecast"):
            raise ValueError(f"Invalid load_type `{lt}` given. Supported values: ['actual', 'forecast'].")
        return True

    def _pull_data(self) -> pd.DataFrame:
        feed = "ops_sum_prev_period" if self.options["load_type"] != "forecast" else "load_frcstd_7_day"
        return pd.read_csv(BytesIO(self._fetch_from_url(feed)))

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.options["load_type"] == "forecast":
            ren = {
                "forecast_datetime_beginning_utc": "StartTime",
                "forecast_datetime_ending_utc": "EndTime",
                "forecast_area": "Zone",
                "forecast_load_mw": "Load",
            }
        else:
            ren = {
                "datetime_beginning_utc": "StartTime",
                "datetime_ending_utc": "EndTime",
                "area": "Zone",
                "actual_load": "Load",
            }
        df = df.rename(columns=ren)[["StartTime", "EndTime", "Zone", "Load"]].copy()
        for c in ("StartTime", "EndTime"):
            df[c] = pd.to_datetime(df[c], format="%m/%d/%Y %I:%M:%S %p")
        df["Load"] = df["Load"].astype(float)
        return df.reset_index(drop=True)


class CAISODailyLoadSource(BaseISOSource):
    """CAISO daily load (caiso_daily_load_iso.py:100-148): zipped CSV pull,
    GMT interval parse, label filter onto CAISO_SCHEMA."""

    required_options = ["load_types", "date"]
    spark_schema = CAISO_SCHEMA
    _RENAME = {
        "INTERVALSTARTTIME_GMT": "StartTime", "INTERVALENDTIME_GMT": "EndTime",
        "LOAD_TYPE": "LoadType", "OPR_DT": "OprDt", "OPR_HR": "OprHr",
        "OPR_INTERVAL": "OprInterval", "MARKET_RUN_ID": "MarketRunId",
        "TAC_AREA_NAME": "TacAreaName", "LABEL": "Label",
        "XML_DATA_ITEM": "XmlDataItem", "POS": "Pos", "MW": "Load",
        "EXECUTION_TYPE": "ExecutionType", "GROUP": "Group",
    }

    def _validate_options(self) -> bool:
        self._validate_date()
        return True

    def _pull_data(self) -> pd.DataFrame:
        return pd.read_csv(BytesIO(_maybe_unzip(self._fetch_from_url(self.options["date"]))))

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for c in ("INTERVALSTARTTIME_GMT", "INTERVALENDTIME_GMT"):
            df[c] = df[c].apply(
                lambda v: datetime.strptime(str(v)[:19], "%Y-%m-%dT%H:%M:%S")
            )
        return df.rename(columns=self._RENAME)

    def _sanitize_data(self, df: pd.DataFrame) -> pd.DataFrame:
        return df[df["Label"].isin(self.options["load_types"])]


class ERCOTDailyLoadSource(BaseISOSource):
    """ERCOT daily load (ercot_daily_load_iso.py): zipped CSV of the nine
    zone columns onto ERCOT_SCHEMA."""

    required_options = ["date"]
    spark_schema = ERCOT_SCHEMA

    def _validate_options(self) -> bool:
        self._validate_date()
        return True

    def _pull_data(self) -> pd.DataFrame:
        return pd.read_csv(BytesIO(_maybe_unzip(self._fetch_from_url(self.options["date"]))))

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["Date"] = pd.to_datetime(df["Date"])
        for c in ERCOT_SCHEMA.names:
            if c not in ("Date", "HourEnding", "DstFlag"):
                df[c] = df[c].astype(float)
        return df


PJM_PRICING_SCHEMA = T.StructType(
    [
        T.StructField("StartTime", T.TimestampType()),
        T.StructField("PnodeId", T.LongType()),
        T.StructField("PnodeName", T.StringType()),
        T.StructField("Voltage", T.StringType()),
        T.StructField("Equipment", T.StringType()),
        T.StructField("Type", T.StringType()),
        T.StructField("Zone", T.StringType()),
        T.StructField("SystemEnergyPrice", T.DoubleType()),
        T.StructField("TotalLmp", T.DoubleType()),
        T.StructField("CongestionPrice", T.DoubleType()),
        T.StructField("MarginalLossPrice", T.DoubleType()),
        T.StructField("VersionNbr", T.LongType()),
    ]
)


class MISOHistoricalLoadSource(MISODailyLoadSource):
    """MISO historical daily forecast+actual load
    (miso_historical_load_iso.py:30-255): one `{date}_dfal_HIST` file per
    year of the requested range, header-row filter, optional forecast
    fill of missing actuals, per-zone pivot onto MISO_SCHEMA."""

    required_options = ["start_date", "end_date"]

    def _validate_options(self) -> bool:
        self._validate_date("start_date")
        self._validate_date("end_date")
        return True

    @property
    def _fill_missing(self) -> bool:
        return str(self.options.get("fill_missing", "true")) == "true"

    def _pull_data(self) -> pd.DataFrame:
        start = datetime.strptime(self.options["start_date"], self.query_datetime_format)
        end = datetime.strptime(self.options["end_date"], self.query_datetime_format)
        frames = []
        for year in range(start.year, end.year + 1):
            # reference fetches each year-end snapshot file (:66-74); the
            # marketreports .xls is consumed as CSV (module docstring)
            stamp = datetime(year, 12, 31).strftime(self.query_datetime_format)
            frames.append(
                pd.read_csv(BytesIO(self._fetch_from_url(f"{stamp}_dfal_HIST")))
            )
        return pd.concat(frames, sort=False)

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        # repeated in-file headers are data rows in the concatenated pull (:134)
        df = df[df["MarketDay"] != "MarketDay"].copy()
        if self._fill_missing:  # :137-139
            df = df.fillna({"ActualLoad (MWh)": df["MTLF (MWh)"]})
        df = df.rename(
            columns={
                "MarketDay": "date", "HourEnding": "hour",
                "ActualLoad (MWh)": "load", "LoadResource Zone": "zone",
            }
        ).dropna()
        df["date_time"] = pd.to_datetime(df["date"]) + pd.to_timedelta(
            df["hour"].astype(int) - 1, "h"
        )
        df["load"] = df["load"].astype(float)
        df = df.pivot_table(index="date_time", values="load", columns="zone").reset_index()
        df.columns = [str(c.split(" ")[0]).upper() for c in df.columns]
        df = df.rename(columns=self._RENAME)
        for name in self.spark_schema.names:  # a zone fully dropped by dropna
            if name not in df.columns:
                df[name] = float("nan")
        return df

    def _sanitize_data(self, df: pd.DataFrame) -> pd.DataFrame:
        # range clip + chronology (reference :233-246)
        start = datetime.strptime(self.options["start_date"], self.query_datetime_format)
        end = datetime.strptime(self.options["end_date"], self.query_datetime_format)
        df = df[(df["Datetime"] >= start) & (df["Datetime"] <= end)]
        return df.sort_values("Datetime").reset_index(drop=True)


class CAISOHistoricalLoadSource(CAISODailyLoadSource):
    """CAISO historical load (caiso_historical_load_iso.py:26-114): the
    requested [start_date, end_date] span is pulled in 30-day zip chunks and
    concatenated before the shared CAISO prepare/sanitize."""

    required_options = ["load_types", "start_date", "end_date"]
    user_datetime_format = "%Y-%m-%d"

    def _validate_options(self) -> bool:
        for key in ("start_date", "end_date"):
            try:
                datetime.strptime(self.options[key], self.user_datetime_format)
            except ValueError:
                raise ValueError(
                    f"Unable to parse {key}. Please specify in "
                    f"{self.user_datetime_format} format."
                )
        return True

    def _pull_data(self) -> pd.DataFrame:
        start = datetime.strptime(self.options["start_date"], self.user_datetime_format)
        end = datetime.strptime(self.options["end_date"], self.user_datetime_format)
        end = end + pd.Timedelta(days=1)
        frames = []
        cursor = start
        while cursor < end:  # 30-day chunking (:67-74)
            last = min(cursor + pd.Timedelta(days=30), end)
            suffix = (
                f"{cursor.strftime('%Y%m%d')}T00:00-0000/"
                f"{last.strftime('%Y%m%d')}T00:00-0000"
            )
            frames.append(
                pd.read_csv(BytesIO(_maybe_unzip(self._fetch_from_url(suffix))))
            )
            cursor = last
        return pd.concat(frames)


class PJMHistoricalLoadSource(PJMDailyLoadSource):
    """PJM historical load (pjm_historical_load_iso.py:32-197): the range is
    split into query_batch_days windows, each fetched as one CSV; date-order
    and not-in-future validation kept from the reference."""

    required_options = ["api_key", "load_type", "start_date", "end_date"]
    user_datetime_format = "%Y-%m-%d"

    def _validate_options(self) -> bool:
        super()._validate_options()
        try:
            start = datetime.strptime(self.options["start_date"], self.user_datetime_format)
            end = datetime.strptime(self.options["end_date"], self.user_datetime_format)
        except ValueError as e:
            raise ValueError(
                f"Unable to parse date. Please specify in "
                f"{self.user_datetime_format} format."
            ) from e
        if start > end:
            raise ValueError("Start date can't be ahead of End date.")
        if int(self.options.get("query_batch_days", 120)) < 0:
            raise ValueError("Query batch days count can't be negative.")
        return True

    def _pull_data(self) -> pd.DataFrame:
        feed = "ops_sum_prev_period" if self.options["load_type"] != "forecast" else "load_frcstd_hist"
        start = datetime.strptime(self.options["start_date"], self.user_datetime_format)
        end = datetime.strptime(self.options["end_date"], self.user_datetime_format)
        batch = int(self.options.get("query_batch_days", 120))
        frames = []
        cursor = start
        while cursor <= end:  # batched windows (:100-126)
            last = min(cursor + pd.Timedelta(days=batch - 1), end)
            suffix = (
                f"{feed}?{cursor.strftime('%m/%d/%Y')} 00:00"
                f"to{last.strftime('%m/%d/%Y')} 23:00"
            )
            frames.append(pd.read_csv(BytesIO(self._fetch_from_url(suffix))))
            cursor = last + pd.Timedelta(days=1)
        return pd.concat(frames, sort=False).reset_index(drop=True)


class PJMDailyPricingSource(BaseISOSource):
    """PJM daily LMP pricing (pjm_daily_pricing_iso.py:29-256): paginated
    day-ahead (`da_hrl_lmps`) / real-time (`rt_hrl_lmps`) JSON feed onto
    PJM_PRICING_SCHEMA, with the per-load-type *_da/*_rt column renames."""

    required_options = ["api_key", "load_type"]
    spark_schema = PJM_PRICING_SCHEMA

    _COMMON = {
        "datetime_beginning_utc": "StartTime", "pnode_id": "PnodeId",
        "pnode_name": "PnodeName", "voltage": "Voltage",
        "equipment": "Equipment", "type": "Type", "zone": "Zone",
        "version_nbr": "VersionNbr",
    }

    def _validate_options(self) -> bool:
        lt = self.options.get("load_type")
        if lt not in ("real_time", "day_ahead"):
            raise ValueError(
                f"Invalid load_type `{lt}` given. Supported values are "
                f"['real_time', 'day_ahead']."
            )
        return True

    def _feed(self) -> str:
        return "da_hrl_lmps" if self.options["load_type"] == "day_ahead" else "rt_hrl_lmps"

    def _fetch_paginated(self, url_suffix: str) -> list[dict]:
        import json

        items: list[dict] = []
        next_page: str | None = url_suffix
        while next_page:  # rel=next link walk (:106-127)
            payload = json.loads(self._fetch_from_url(next_page))
            items.extend(payload["items"])
            nxt = [l for l in payload.get("links", []) if l.get("rel") == "next"]
            next_page = nxt[0]["href"] if nxt else None
        return items

    def _pull_data(self) -> pd.DataFrame:
        return pd.DataFrame(self._fetch_paginated(self._feed()))

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        suffix = "_da" if self.options["load_type"] == "day_ahead" else "_rt"
        ren = dict(self._COMMON)
        for src, dst in (
            ("system_energy_price", "SystemEnergyPrice"), ("total_lmp", "TotalLmp"),
            ("congestion_price", "CongestionPrice"),
            ("marginal_loss_price", "MarginalLossPrice"),
        ):
            ren[f"{src}{suffix}"] = dst
        df = df.rename(columns=ren)[PJM_PRICING_SCHEMA.names].copy()
        df["StartTime"] = pd.to_datetime(df["StartTime"])
        for c in ("SystemEnergyPrice", "TotalLmp", "CongestionPrice", "MarginalLossPrice"):
            df[c] = df[c].astype(float)
        for c in ("PnodeId", "VersionNbr"):
            df[c] = df[c].astype("int64")
        return df.reset_index(drop=True)


class PJMHistoricalPricingSource(PJMDailyPricingSource):
    """PJM historical LMP pricing (pjm_historical_pricing_iso.py:26-158):
    same feed and renames as daily pricing, but over an explicit
    [start_date, end_date] query window."""

    required_options = ["api_key", "load_type", "start_date", "end_date"]
    user_datetime_format = "%Y-%m-%d"

    def _validate_options(self) -> bool:
        super()._validate_options()
        try:
            start = datetime.strptime(self.options["start_date"], self.user_datetime_format)
            end = datetime.strptime(self.options["end_date"], self.user_datetime_format)
        except ValueError as e:
            raise ValueError(
                f"Unable to parse date. Please specify in "
                f"{self.user_datetime_format} format."
            ) from e
        if start > end:
            raise ValueError("Start date can't be ahead of End date.")
        return True

    def _pull_data(self) -> pd.DataFrame:
        start = datetime.strptime(self.options["start_date"], self.user_datetime_format)
        end = datetime.strptime(self.options["end_date"], self.user_datetime_format)
        window = (
            f"{start.strftime('%Y-%m-%d 00:00')}to{end.strftime('%Y-%m-%d 23:00')}"
        )
        return pd.DataFrame(self._fetch_paginated(f"{self._feed()}?{window}"))


class WeatherForecastV1Source(BaseISOSource):
    """the_weather_company hourly forecast v1
    (the_weather_company/weather_forecast_api_v1.py:28-160 over
    base_weather.py:20-70): JSON `forecasts` array -> snake_case ->
    CamelCase renames -> WEATHER_FORECAST_SCHEMA."""

    required_options = ["lat", "lon", "api_key"]
    spark_schema = WEATHER_FORECAST_SCHEMA
    _RENAME = {
        "latitude": "Latitude", "longitude": "Longitude", "class": "Class",
        "expire_time_gmt": "ExpireTimeGmt", "fcst_valid": "FcstValid",
        "fcst_valid_local": "FcstValidLocal", "num": "Num", "day_ind": "DayInd",
        "temp": "Temp", "dewpt": "Dewpt", "hi": "Hi", "wc": "Wc",
        "feels_like": "FeelsLike", "icon_extd": "IconExtd", "wxman": "Wxman",
        "icon_code": "IconCode", "dow": "Dow", "phrase_12char": "Phrase12Char",
        "phrase_22char": "Phrase22Char", "phrase_32char": "Phrase32Char",
        "subphrase_pt1": "SubphrasePt1", "subphrase_pt2": "SubphrasePt2",
        "subphrase_pt3": "SubphrasePt3", "pop": "Pop",
        "precip_type": "PrecipType", "qpf": "Qpf", "snow_qpf": "SnowQpf",
        "rh": "Rh", "wspd": "Wspd", "wdir": "Wdir",
        "wdir_cardinal": "WdirCardinal", "gust": "Gust", "clds": "Clds",
        "vis": "Vis", "mslp": "Mslp", "uv_index_raw": "UvIndexRaw",
        "uv_index": "UvIndex", "uv_warning": "UvWarning", "uv_desc": "UvDesc",
        "golf_index": "GolfIndex", "golf_category": "GolfCategory",
        "severity": "Severity",
    }

    def _pull_data(self) -> pd.DataFrame:
        import json

        payload = json.loads(self._fetch_from_url(
            f"{self.options['lat']}/{self.options['lon']}/forecast/hourly/360hour.json"
        ))
        df = pd.json_normalize(payload["forecasts"])
        df["latitude"] = float(self.options["lat"])
        df["longitude"] = float(self.options["lon"])
        return df

    def _prepare_data(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns=self._RENAME)
        # schema-driven null/type discipline (weather_forecast_api_v1.py:
        # 120-160): string columns get "" for missing, numerics stay NaN/None
        for f in self.spark_schema.fields:
            if f.name not in df.columns:
                df[f.name] = None
            if isinstance(f.dataType, T.StringType):
                df[f.name] = df[f.name].fillna("").astype(str)
        return df


class WeatherForecastV1MultiSource(WeatherForecastV1Source):
    """Multi-station forecast pull
    (the_weather_company/weather_forecast_api_v1_multi.py:39-85): one
    hourly-forecast fetch per "lat,lon" station string, concatenated into a
    single WEATHER_FORECAST_SCHEMA frame."""

    required_options = ["stations", "api_key"]

    def _validate_options(self) -> bool:
        for station in self.options["stations"]:
            if len(str(station).split(",")) != 2:
                raise ValueError(
                    f"Invalid station `{station}`: expected 'lat,lon'"
                )
        return True

    def _pull_data(self) -> pd.DataFrame:
        import json

        frames = []
        for station in self.options["stations"]:
            lat, lon = (p.strip() for p in str(station).split(","))
            payload = json.loads(
                self._fetch_from_url(f"{lat}/{lon}/forecast/hourly/360hour.json")
            )
            df = pd.json_normalize(payload["forecasts"])
            df["latitude"] = float(lat)
            df["longitude"] = float(lon)
            frames.append(df)
        return pd.concat(frames, sort=False).reset_index(drop=True)
