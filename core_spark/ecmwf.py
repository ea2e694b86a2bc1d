"""ECMWF MARS weather-forecast family (reference
pipelines/sources/spark/ecmwf/{base_mars,weather_forecast}.py and
pipelines/transformers/spark/ecmwf/nc_extract{base,point,grid}_to_weather_
data_model.py).

Three pieces:

- ``ECMWFMarsSource`` — builds the per-run MARS retrieve requests
  (base_mars.py:75-145: date/time injection, list->'/'-join flattening,
  ``retrieve,k=v,...`` assembly, per-request retry) and hands each to an
  injected ``execute(request_str, target_path)`` transport. The reference
  hard-wires ``ECMWFService`` + joblib parallel download — network, creds,
  and download concurrency are deployment concerns; tests inject a recorder.
- ``ECMWFWeatherForecastSource`` — the operational-forecast preset
  (weather_forecast.py:29-162): lead-time ladder (hourly to 90h, 3-hourly to
  146h, 6-hourly to 246h), class/stream/expver/levtype/param/area/grid
  request dict, 00Z+12Z runs.
- ``ecmwf_extract`` (+ ``_point`` / ``_grid`` wrappers) — the nc-file ->
  weather-rows extraction (nc_extractbase_to_weather_data_model.py:78-208).
  The reference opens every file sequentially in the driver with xarray and
  concatenates pandas frames; here the run files are a DataFrame of paths
  fanned out with ``mapInPandas``, so a year of 12-hourly runs (730 files)
  decodes across all executors and the decoded long rows never pass through
  the driver. The nc DECODE itself is the stub point: the default decoder
  try-imports xarray and otherwise raises NotImplementedError — tests and
  this sandbox inject a deterministic frame-builder instead, and the
  surrounding plumbing (nearest-neighbor selection, ws-tag renames, variable
  stacking, tag assembly, schema) is real and tested.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# reference nc_extractbase :96-110 — wind-speed vars are stored transposed
WS_TAG_RENAMES = {
    "10u": "u10", "100u": "u100", "200u": "u200",
    "10v": "v10", "100v": "v100", "200v": "v200",
}

EXTRACT_SCHEMA = (
    "Latitude double, Longitude double, EnqueuedTime timestamp, "
    "EventTime timestamp, Value double, Source string, Status string, "
    "Latest boolean, EventDate date, TagName string"
)


def run_dates(date_start: str, date_end: str, run_interval: str, run_frequency: str):
    """Forecast run stamps, e.g. interval '12' + frequency 'H' = 00Z and 12Z
    per day (base_mars.py:101-104)."""
    # the reference API spells hourly as "H"; pandas >=2.2 wants "h"
    freq = run_interval + ("h" if run_frequency == "H" else run_frequency)
    return pd.date_range(start=date_start, end=date_end, freq=freq)


class ECMWFMarsSource:
    """Download nc files from the ECMWF MARS server (base_mars.py:30-158)."""

    def __init__(
        self,
        date_start: str,
        date_end: str,
        save_path: str,
        run_interval: str = "12",
        run_frequency: str = "H",
        execute: Callable[[str, str], None] | None = None,
        tries: int = 5,
    ) -> None:
        self.save_path = save_path
        self.dates = run_dates(date_start, date_end, run_interval, run_frequency)
        self._execute = execute
        self.tries = tries
        self.success: list[bool] = []

    def _request(self, mars_dict: dict, date: str, time: str, cost: bool) -> tuple[str, str]:
        req = {"date": date, "time": time}
        if cost:
            filename = f"{date}_{time}.txt"
        else:
            filename = f"{date}_{time}.nc"
            req["format"] = "netcdf"
        req.update(mars_dict)
        # list params flatten to '/'-joined MARS syntax (base_mars.py:118-121)
        flat = {
            k: "/".join(str(x) for x in v) if isinstance(v, (list, tuple)) else v
            for k, v in req.items()
        }
        parts = [f"{k}={v}" for k, v in flat.items()]
        verb = "list,output=cost," if cost else "retrieve,"
        return verb + ",".join(parts), os.path.join(self.save_path, filename)

    def retrieve(self, mars_dict: dict, cost: bool = False) -> list[bool]:
        """One request per run; reserved keys rejected (base_mars.py:96-99),
        each request retried ``tries`` times (:133-141)."""
        for key in ("date", "target", "time", "format", "output"):
            if key in mars_dict:
                raise ValueError(f"don't include {key} in the mars_dict")
        if self._execute is None:
            raise NotImplementedError(
                "no MARS transport injected — pass execute=<callable "
                "(request_str, target_path) -> None> (the reference hard-wires "
                "ecmwfapi.ECMWFService here, base_mars.py:128-133)"
            )
        self.success = []
        for stamp in self.dates:
            request, target = self._request(
                mars_dict, str(stamp.date()), f"{stamp.hour:02}", cost
            )
            ok = False
            for _ in range(self.tries):
                try:
                    self._execute(request, target)
                    ok = True
                    break
                except Exception:
                    continue
            self.success.append(ok)
        return self.success


class ECMWFWeatherForecastSource:
    """Operational forecast preset over ECMWFMarsSource
    (weather_forecast.py:29-162)."""

    def __init__(
        self,
        spark: SparkSession,
        save_path: str,
        date_start: str,
        date_end: str,
        ecmwf_class: str,
        stream: str,
        expver: str,
        leveltype: str,
        ec_vars: Sequence[str],
        forecast_area: Sequence[float],
        execute: Callable[[str, str], None] | None = None,
    ) -> None:
        self.spark = spark
        self.save_path = save_path
        self.date_start = date_start
        self.date_end = date_end
        self.ecmwf_class = ecmwf_class
        self.stream = stream
        self.expver = expver
        self.leveltype = leveltype
        self.ec_vars = list(ec_vars)
        self.forecast_area = list(forecast_area)
        self._execute = execute

    @classmethod
    def _get_lead_time(cls) -> list[int]:
        # hourly to 90h, 3-hourly to 146h, 6-hourly to 246h (:92-102)
        return [*range(91), *range(93, 146, 3), *range(150, 246, 6)]

    def _get_api_params(self, lead_times: list[int]) -> dict:
        return {
            "class": self.ecmwf_class,
            "stream": self.stream,
            "expver": self.expver,
            "levtype": self.leveltype,
            "type": "fc",
            "param": self.ec_vars,
            "step": lead_times,
            "area": self.forecast_area,
            "grid": [0.1, 0.1],
        }

    def read_batch(self) -> list[bool]:
        source = ECMWFMarsSource(
            date_start=self.date_start,
            date_end=self.date_end,
            save_path=self.save_path,
            run_interval="12",
            run_frequency="H",
            execute=self._execute,
        )
        return source.retrieve(mars_dict=self._get_api_params(self._get_lead_time()))


def _default_decoder(path: str) -> pd.DataFrame:
    """Stubbed nc decode: xarray when importable, explicit stub otherwise.
    Contract: a long frame with columns [latitude, longitude, time,
    <variable...>] — one row per grid cell per valid time."""
    try:
        import xarray as xr  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "nc decode needs xarray+netCDF4 (not in this environment) — "
            "inject decoder=<callable path -> pandas frame with columns "
            "[latitude, longitude, time, <vars...>]>"
        ) from e
    ds = xr.open_dataset(path)
    try:
        return ds.to_dataframe().reset_index()
    finally:
        ds.close()


def _nearest(requested: Iterable[float], available: pd.Series) -> dict[float, float]:
    """Map each requested coordinate to the nearest grid value —
    xarray's ``.sel(method='nearest')`` (nc_extractbase :122-124)."""
    avail = available.drop_duplicates().astype(float)
    return {
        float(want): float(avail.iloc[(avail - float(want)).abs().argmin()])
        for want in requested
    }


def ecmwf_extract(
    spark: SparkSession,
    load_path: str,
    date_start: str,
    date_end: str,
    run_interval: str,
    run_frequency: str,
    lat: Sequence[float],
    lon: Sequence[float],
    variables: Sequence[str],
    tag_prefix: str,
    decoder: Callable[[str], pd.DataFrame] | None = None,
) -> DataFrame:
    """nc run files -> weather data-model rows
    (nc_extractbase_to_weather_data_model.py:101-208), distributed.

    Per run file: decode, nearest-select the requested lat/lon cross product,
    stack the variables into long rows, assemble
    ``TagName = prefix + lat + '_' + lon + '_ECMWF_MARS_' + measure``.
    Lat/lon rounded to 5 decimals (:141-143), duplicate (lat,lon,run,target,
    var) keys dropped keep-first (:154), Status='Good', Latest=True.

    Output ordering is per-partition (the reference sorts the pandas frame;
    a global sort at 100 TB is the caller's call)."""
    decode = decoder or _default_decoder
    stamps = run_dates(date_start, date_end, run_interval, run_frequency)
    vars_processed = [WS_TAG_RENAMES.get(v, v) for v in variables]
    want_lat = [float(x) for x in lat]
    want_lon = [float(x) for x in lon]

    files = spark.createDataFrame(
        [
            (s.to_pydatetime(), os.path.join(load_path, f"{s.date()}_{s.hour:02}.nc"))
            for s in stamps
        ],
        "run_time timestamp, path string",
    ).repartition(max(1, min(len(stamps), 2 * spark.sparkContext.defaultParallelism)))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for run_time, path in zip(pdf["run_time"], pdf["path"]):
                grid = decode(path)
                lat_map = _nearest(want_lat, grid["latitude"])
                lon_map = _nearest(want_lon, grid["longitude"])
                sel = grid[
                    grid["latitude"].isin(set(lat_map.values()))
                    & grid["longitude"].isin(set(lon_map.values()))
                ]
                long = sel.melt(
                    id_vars=["latitude", "longitude", "time"],
                    value_vars=[v for v in vars_processed if v in sel.columns],
                    var_name="measure",
                    value_name="Value",
                )
                lat5 = long["latitude"].astype(float).round(5)
                lon5 = long["longitude"].astype(float).round(5)
                out = pd.DataFrame(
                    {
                        "Latitude": lat5,
                        "Longitude": lon5,
                        "EnqueuedTime": run_time,
                        "EventTime": pd.to_datetime(long["time"]),
                        "Value": long["Value"].astype(float),
                        "Source": "ECMWF_MARS",
                        "Status": "Good",
                        "Latest": True,
                    }
                )
                out["EventDate"] = out["EventTime"].dt.date
                out["TagName"] = (
                    tag_prefix
                    + lat5.astype(str) + "_" + lon5.astype(str)
                    + "_ECMWF_MARS_" + long["measure"]
                )
                out = out.drop_duplicates(
                    subset=["Latitude", "Longitude", "EnqueuedTime", "EventTime", "TagName"],
                    keep="first",
                )
                yield out

    return files.mapInPandas(extract, EXTRACT_SCHEMA)


def ecmwf_extract_point(
    spark: SparkSession, load_path: str, date_start: str, date_end: str,
    run_interval: str, run_frequency: str, lat: float, lon: float,
    variables: Sequence[str], tag_prefix: str,
    decoder: Callable[[str], pd.DataFrame] | None = None,
) -> DataFrame:
    """Single-station extraction (nc_extractpoint :25-67)."""
    return ecmwf_extract(
        spark, load_path, date_start, date_end, run_interval, run_frequency,
        [lat], [lon], variables, tag_prefix, decoder,
    )


def ecmwf_extract_grid(
    spark: SparkSession, load_path: str, date_start: str, date_end: str,
    run_interval: str, run_frequency: str,
    min_lat: float, max_lat: float, min_lon: float, max_lon: float, grid_step: float,
    variables: Sequence[str], tag_prefix: str,
    decoder: Callable[[str], pd.DataFrame] | None = None,
) -> DataFrame:
    """Area extraction over a regular grid (nc_extractgrid :28-90): the
    requested box becomes the lat x lon cross product."""
    import numpy as np

    lats = list(np.round(np.arange(min_lat, max_lat + grid_step / 2, grid_step), 5))
    lons = list(np.round(np.arange(min_lon, max_lon + grid_step / 2, grid_step), 5))
    return ecmwf_extract(
        spark, load_path, date_start, date_end, run_interval, run_frequency,
        lats, lons, variables, tag_prefix, decoder,
    )
