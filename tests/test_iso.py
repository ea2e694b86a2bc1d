"""ISO / weather domain source tests (SURVEY §2.1 "ISO / weather domain
sources", reference pipelines/sources/spark/iso/* and the_weather_company/*).

Transport is injected as deterministic byte payloads — same strategy as the
RestSink tests — so these verify the prepare/sanitize/typed-frame contract,
not the network.
"""

from __future__ import annotations

import json
import zipfile
from io import BytesIO

import pytest

from core_spark.sources.iso import (
    CAISO_SCHEMA,
    ERCOT_SCHEMA,
    MISO_SCHEMA,
    PJM_PRICING_SCHEMA,
    PJM_SCHEMA,
    WEATHER_FORECAST_SCHEMA,
    BaseISOSource,
    CAISODailyLoadSource,
    CAISOHistoricalLoadSource,
    ERCOTDailyLoadSource,
    MISODailyLoadSource,
    MISOHistoricalLoadSource,
    PJMDailyLoadSource,
    PJMDailyPricingSource,
    PJMHistoricalLoadSource,
    PJMHistoricalPricingSource,
    WeatherForecastV1MultiSource,
    WeatherForecastV1Source,
)

MISO_CSV = b"""Market Day,HourEnding,LRZ1 MTLF (MWh),LRZ1 ActualLoad (MWh),LRZ2_7 MTLF (MWh),LRZ2_7 ActualLoad (MWh),LRZ3_5 MTLF (MWh),LRZ3_5 ActualLoad (MWh),LRZ4 MTLF (MWh),LRZ4 ActualLoad (MWh),LRZ6 MTLF (MWh),LRZ6 ActualLoad (MWh),LRZ8_9_10 MTLF (MWh),LRZ8_9_10 ActualLoad (MWh),MISO MTLF (MWh),MISO ActualLoad (MWh)
2024-01-15,1,100,101,200,201,300,301,400,401,500,501,600,601,2100,2106
2024-01-15,2,110,111,210,211,310,311,410,411,510,511,610,611,2150,2156
"""

PJM_ACTUAL_CSV = (
    b"datetime_beginning_utc,datetime_ending_utc,area,actual_load\n"
    b'01/15/2024 05:00:00 AM,01/15/2024 06:00:00 AM,PJM RTO,85000.5\n'
    b'01/15/2024 06:00:00 AM,01/15/2024 07:00:00 AM,PJM RTO,87000.25\n'
)

CAISO_CSV = (
    b"INTERVALSTARTTIME_GMT,INTERVALENDTIME_GMT,LOAD_TYPE,OPR_DT,OPR_HR,"
    b"OPR_INTERVAL,MARKET_RUN_ID,TAC_AREA_NAME,LABEL,XML_DATA_ITEM,POS,MW,"
    b"EXECUTION_TYPE,GROUP\n"
    b"2024-01-15T08:00:00-00:00,2024-01-15T09:00:00-00:00,1,2024-01-15,1,0,"
    b"ACTUAL,CA ISO-TAC,Total Actual Hourly Integrated Load,SYS_FCST_ACT_MW,"
    b"1.0,25000.0,ACTUAL,1\n"
    b"2024-01-15T08:00:00-00:00,2024-01-15T09:00:00-00:00,2,2024-01-15,1,0,"
    b"DAM,CA ISO-TAC,Demand Forecast,SYS_FCST_DA_MW,2.0,26000.0,DAM,1\n"
)

ERCOT_CSV = (
    b"Date,HourEnding,Coast,East,FarWest,North,NorthCentral,SouthCentral,"
    b"Southern,West,SystemTotal,DstFlag\n"
    b"2024-01-15,1:00,10000,2000,4000,1000,12000,7000,5000,1500,42500,N\n"
)


def _zip_bytes(name: str, content: bytes) -> bytes:
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(name, content)
    return buf.getvalue()


def test_required_option_and_date_validation(spark):
    src = MISODailyLoadSource(spark, {"load_type": "actual"})
    with pytest.raises(ValueError, match="Required option `date`"):
        src.read_batch()
    src = MISODailyLoadSource(
        spark, {"load_type": "actual", "date": "2024-01-15"}
    )
    with pytest.raises(ValueError, match="Unable to parse date"):
        src.read_batch()
    src = MISODailyLoadSource(spark, {"load_type": "nope", "date": "20240115"})
    with pytest.raises(ValueError, match="Invalid load_type"):
        src.read_batch()


def test_no_transport_injected_raises(spark):
    src = ERCOTDailyLoadSource(spark, {"date": "20240115"})
    with pytest.raises(NotImplementedError, match="no transport injected"):
        src.read_batch()
    with pytest.raises(NotImplementedError, match="stream operation"):
        src.read_stream()


def test_miso_daily_load_actual_vs_forecast(spark):
    fetch = lambda suffix: MISO_CSV
    actual = MISODailyLoadSource(
        spark, {"load_type": "actual", "date": "20240115"}, fetch=fetch
    ).read_batch()
    assert actual.schema == MISO_SCHEMA
    rows = actual.orderBy("Datetime").collect()
    assert len(rows) == 2
    # actual keeps ActualLoad columns; HourEnding 1 -> 00:00
    assert rows[0]["Datetime"].hour == 0 and rows[0]["Miso"] == 2106.0
    forecast = MISODailyLoadSource(
        spark, {"load_type": "forecast", "date": "20240115"}, fetch=fetch
    ).read_batch()
    assert forecast.orderBy("Datetime").first()["Miso"] == 2100.0


def test_pjm_daily_load_parse(spark):
    src = PJMDailyLoadSource(
        spark,
        {"api_key": "k", "load_type": "actual"},
        fetch=lambda s: PJM_ACTUAL_CSV,
    )
    df = src.read_batch()
    assert df.schema == PJM_SCHEMA
    row = df.orderBy("StartTime").first()
    assert row["Zone"] == "PJM RTO" and row["Load"] == 85000.5
    assert row["StartTime"].hour == 5


def test_caiso_zipped_pull_and_label_filter(spark):
    payload = _zip_bytes("caiso.csv", CAISO_CSV)
    src = CAISODailyLoadSource(
        spark,
        {
            "load_types": ["Total Actual Hourly Integrated Load"],
            "date": "20240115",
        },
        fetch=lambda s: payload,
    )
    df = src.read_batch()
    assert df.schema == CAISO_SCHEMA
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["Load"] == 25000.0


def test_caiso_empty_zip_raises(spark):
    payload = _zip_bytes("readme.txt", b"nothing")
    src = CAISODailyLoadSource(
        spark,
        {"load_types": ["x"], "date": "20240115"},
        fetch=lambda s: payload,
    )
    with pytest.raises(ValueError, match="No data was found"):
        src.read_batch()


def test_ercot_zone_columns(spark):
    src = ERCOTDailyLoadSource(
        spark, {"date": "20240115"}, fetch=lambda s: ERCOT_CSV
    )
    df = src.read_batch()
    assert df.schema == ERCOT_SCHEMA
    row = df.first()
    assert row["SystemTotal"] == 42500.0 and row["DstFlag"] == "N"


MISO_HIST_CSV = (
    b"MarketDay,HourEnding,LoadResource Zone,MTLF (MWh),ActualLoad (MWh)\n"
    b"2024-01-15,1,LRZ1,100,101\n"
    b"2024-01-15,1,LRZ2_7,200,201\n"
    b"2024-01-15,1,LRZ3_5,300,301\n"
    b"2024-01-15,1,LRZ4,400,401\n"
    b"2024-01-15,1,LRZ6,500,501\n"
    b"2024-01-15,1,LRZ8_9_10,600,\n"  # missing actual -> filled from MTLF
    b"2024-01-15,1,MISO,2100,2106\n"
    b"MarketDay,HourEnding,LoadResource Zone,MTLF (MWh),ActualLoad (MWh)\n"  # repeated header row
    b"2025-06-01,1,LRZ1,999,999\n"  # outside requested range -> clipped
)


def test_miso_historical_load(spark):
    pulls = []

    def fetch(suffix):
        pulls.append(suffix)
        return MISO_HIST_CSV

    src = MISOHistoricalLoadSource(
        spark, {"start_date": "20240101", "end_date": "20240201"}, fetch=fetch
    )
    df = src.read_batch()
    assert df.schema == MISO_SCHEMA
    assert pulls == ["20241231_dfal_HIST"]  # one file per year in range
    rows = df.collect()
    assert len(rows) == 1
    # fill_missing=true default: LRZ8_9_10 actual filled from its forecast
    assert rows[0]["Lrz8_9_10"] == 600.0 and rows[0]["Miso"] == 2106.0

    # fill_missing off: the NaN actual row drops before pivot
    src2 = MISOHistoricalLoadSource(
        spark,
        {"start_date": "20240101", "end_date": "20240201", "fill_missing": "false"},
        fetch=fetch,
    )
    row2 = src2.read_batch().first()
    assert row2["Lrz8_9_10"] is None and row2["Lrz1"] == 101.0


def test_caiso_historical_chunked_pull(spark):
    pulls = []
    payload = _zip_bytes("caiso.csv", CAISO_CSV)

    def fetch(suffix):
        pulls.append(suffix)
        return payload

    src = CAISOHistoricalLoadSource(
        spark,
        {
            "load_types": ["Total Actual Hourly Integrated Load"],
            "start_date": "2024-01-01",
            "end_date": "2024-03-01",
        },
        fetch=fetch,
    )
    df = src.read_batch()
    assert df.schema == CAISO_SCHEMA
    assert len(pulls) == 3  # 61-day spanded in 30-day chunks
    assert pulls[0].startswith("20240101T00:00-0000/20240131T00:00-0000")
    assert df.count() == 3  # the matching label row from each chunk


def test_pjm_historical_load_batches_and_validation(spark):
    pulls = []

    def fetch(suffix):
        pulls.append(suffix)
        return PJM_ACTUAL_CSV

    src = PJMHistoricalLoadSource(
        spark,
        {
            "api_key": "k", "load_type": "actual",
            "start_date": "2024-01-01", "end_date": "2024-05-30",
            "query_batch_days": 120,
        },
        fetch=fetch,
    )
    df = src.read_batch()
    assert df.schema == PJM_SCHEMA and df.count() == 4  # 2 windows x 2 rows
    assert len(pulls) == 2 and pulls[0].startswith("ops_sum_prev_period?")

    bad = PJMHistoricalLoadSource(
        spark,
        {"api_key": "k", "load_type": "actual",
         "start_date": "2024-05-30", "end_date": "2024-01-01"},
        fetch=fetch,
    )
    with pytest.raises(ValueError, match="ahead of End date"):
        bad.read_batch()


def _pjm_pricing_pages(load_type: str):
    sfx = "_da" if load_type == "day_ahead" else "_rt"
    item = {
        "datetime_beginning_utc": "2024-01-15T05:00:00",
        "pnode_id": 1, "pnode_name": "PJM-RTO", "voltage": "500 KV",
        "equipment": "", "type": "ZONE", "zone": "PJM-RTO",
        f"system_energy_price{sfx}": 25.5, f"total_lmp{sfx}": 26.1,
        f"congestion_price{sfx}": 0.4, f"marginal_loss_price{sfx}": 0.2,
        "version_nbr": 1,
    }
    page1 = {"items": [item], "links": [{"rel": "next", "href": "page2"}]}
    item2 = dict(item, pnode_id=2, **{f"total_lmp{sfx}": 27.0})
    page2 = {"items": [item2], "links": []}
    return {"da_hrl_lmps": page1, "rt_hrl_lmps": page1, "page2": page2}


def test_pjm_daily_pricing_pagination(spark):
    pages = _pjm_pricing_pages("day_ahead")

    def fetch(suffix):
        return json.dumps(pages[suffix.split("?")[0]]).encode()

    src = PJMDailyPricingSource(
        spark, {"api_key": "k", "load_type": "day_ahead"}, fetch=fetch
    )
    df = src.read_batch()
    assert df.schema == PJM_PRICING_SCHEMA
    rows = df.orderBy("PnodeId").collect()
    assert [r.TotalLmp for r in rows] == [26.1, 27.0]  # both pages landed
    with pytest.raises(ValueError, match="Invalid load_type"):
        PJMDailyPricingSource(
            spark, {"api_key": "k", "load_type": "nope"}, fetch=fetch
        ).read_batch()


def test_pjm_historical_pricing_window(spark):
    pages = _pjm_pricing_pages("real_time")
    pulls = []

    def fetch(suffix):
        pulls.append(suffix)
        return json.dumps(pages[suffix.split("?")[0]]).encode()

    src = PJMHistoricalPricingSource(
        spark,
        {"api_key": "k", "load_type": "real_time",
         "start_date": "2024-01-01", "end_date": "2024-01-10"},
        fetch=fetch,
    )
    df = src.read_batch()
    assert df.count() == 2
    assert pulls[0] == "rt_hrl_lmps?2024-01-01 00:00to2024-01-10 23:00"


def test_weather_multi_station(spark):
    payload = json.dumps(
        {"forecasts": [{"class": "fod", "num": 1, "temp": 30}]}
    ).encode()
    src = WeatherForecastV1MultiSource(
        spark,
        {"stations": ["40.75,-73.98", "34.05,-118.24"], "api_key": "k"},
        fetch=lambda s: payload,
    )
    df = src.read_batch()
    assert df.schema == WEATHER_FORECAST_SCHEMA
    lats = sorted(r.Latitude for r in df.collect())
    assert lats == [34.05, 40.75]
    with pytest.raises(ValueError, match="Invalid station"):
        WeatherForecastV1MultiSource(
            spark, {"stations": ["oops"], "api_key": "k"}, fetch=lambda s: payload
        ).read_batch()


def test_weather_forecast_v1_json(spark):
    payload = json.dumps(
        {
            "forecasts": [
                {
                    "class": "fod_long_range_hourly",
                    "expire_time_gmt": 1705305600,
                    "fcst_valid": 1705308000,
                    "fcst_valid_local": "2024-01-15T03:00:00-0500",
                    "num": 1,
                    "day_ind": "N",
                    "temp": 28,
                    "dewpt": 20,
                    "hi": 28,
                    "wc": 19,
                    "feels_like": 19,
                    "icon_extd": 3300,
                    "wxman": "wx1230",
                    "icon_code": 33,
                    "dow": "Monday",
                    "phrase_12char": "M Clear",
                    "phrase_22char": "Mostly Clear",
                    "phrase_32char": "Mostly Clear",
                    "subphrase_pt1": "Mostly",
                    "subphrase_pt2": "Clear",
                    "subphrase_pt3": "",
                    "pop": "0",
                    "precip_type": "rain",
                    "qpf": 0.0,
                    "snow_qpf": 0.0,
                    "rh": 70,
                    "wspd": 5,
                    "wdir": 230,
                    "wdir_cardinal": "SW",
                    "gust": None,
                    "clds": 20,
                    "vis": 10.0,
                    "mslp": 30.2,
                    "uv_index_raw": 0.0,
                    "uv_index": 0,
                    "uv_warning": 0,
                    "uv_desc": "Low",
                    "golf_index": None,
                    "golf_category": "",
                    "severity": 1,
                }
            ]
        }
    ).encode()
    src = WeatherForecastV1Source(
        spark,
        {"lat": "40.75", "lon": "-73.98", "api_key": "k"},
        fetch=lambda s: payload,
    )
    df = src.read_batch()
    assert df.schema == WEATHER_FORECAST_SCHEMA
    row = df.first()
    assert row["Latitude"] == 40.75 and row["Temp"] == 28
    assert row["WdirCardinal"] == "SW" and row["GolfCategory"] == ""
