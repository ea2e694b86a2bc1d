"""REST query API: route surface, envelope shape, parity with the builder.

Reference: src/api/v1/*.py (FastAPI routes over the query SDK). Here the
routes run on Flask's test client over the sf0.001 events table — no
network, real Spark execution.
"""

from __future__ import annotations

import json

import pytest

from core_spark.api import Catalog, SourceBinding, create_app, default_catalog
from core_spark.query_builder import TimeSeriesQueryBuilder

SF = "/root/testdata/sf0.001"
START, END = "2024-01-01", "2024-03-01"


@pytest.fixture(scope="module")
def client(spark):
    app = create_app(spark, default_catalog(spark, SF))
    app.testing = True
    with app.test_client() as c:
        yield c


def get_json(client, url, **params):
    r = client.get(url, query_string=params)
    assert r.status_code == 200, r.get_data(as_text=True)
    return json.loads(r.get_data(as_text=True))


def test_raw_envelope_and_parity(spark, client):
    body = get_json(
        client, "/api/v1/events/raw",
        tag_name="click", start_date=START, end_date=END, limit=50,
    )
    assert set(body) == {"schema", "data", "pagination"}
    names = [f["name"] for f in body["schema"]["fields"]]
    assert names == ["tagname", "event_time", "value", "status"]
    assert len(body["data"]) == 50
    assert body["pagination"] == {"limit": 50, "offset": None, "next": None}
    # parity vs the builder on a tie-free verb (resample keys are unique per
    # (tag, bucket), so ORDER BY + LIMIT is a stable total order)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    api = get_json(
        client, "/api/v1/events/resample",
        tag_name="click", start_date=START, end_date=END,
        time_interval_rate="1", time_interval_unit="day", agg_method="avg",
    )
    expect = (
        TimeSeriesQueryBuilder().connect(spark)
        .source(ev, tagname_column="event_type", timestamp_column="ts",
                status_column=None, value_column="value")
        .resample(["click"], START, END, "1", "day", "avg")
        .toPandas()
    )
    assert [r["value"] for r in api["data"]] == list(expect["value"])


def test_resample_get_and_post_agree(client):
    q = dict(
        tag_name="click", start_date=START, end_date=END,
        time_interval_rate="1", time_interval_unit="day", agg_method="avg",
    )
    got_get = get_json(client, "/api/v1/events/resample", **q)
    post_q = {k: v for k, v in q.items() if k != "tag_name"}
    r = client.post(
        "/api/v1/events/resample", query_string=post_q,
        json={"tag_name": ["click"]},
    )
    assert r.status_code == 200
    assert json.loads(r.get_data(as_text=True))["data"] == got_get["data"]
    assert len(got_get["data"]) > 0


def test_pagination_next_offset(client):
    body = get_json(
        client, "/api/v1/events/raw",
        tag_name="click", start_date=START, end_date=END, limit=10, offset=0,
    )
    # full page with an offset => next = offset + limit (common.py:158-183)
    assert body["pagination"] == {"limit": 10, "offset": 0, "next": 10}


def test_missing_required_param_is_400(client):
    r = client.get("/api/v1/events/resample", query_string={"tag_name": "click"})
    assert r.status_code == 400
    assert "missing required parameter" in json.loads(r.get_data(as_text=True))["detail"]


def test_latest_and_metadata(client):
    latest = get_json(client, "/api/v1/events/latest")
    tags = {r["tagname"] for r in latest["data"]}
    assert "click" in tags and len(latest["data"]) == len(tags)
    meta = get_json(client, "/api/v1/metadata", tag_name="click")
    assert [r["TagName"] for r in meta["data"]] == ["click"]
    assert meta["data"][0]["UoM"] == "unit"


def test_interpolate_and_twa_and_circular(client):
    q = dict(
        tag_name="click", start_date="2024-01-01", end_date="2024-01-08",
        time_interval_rate="6", time_interval_unit="hour",
    )
    interp = get_json(client, "/api/v1/events/interpolate", **q)
    assert len(interp["data"]) == 28  # 7 days / 6h buckets
    twa = get_json(
        client, "/api/v1/events/timeweightedaverage",
        step="false", window_length=1, **q,
    )
    assert len(twa["data"]) == 28
    circ = get_json(
        client, "/api/v1/events/circularaverage",
        lower_bound=0, upper_bound=360, **q,
    )
    assert len(circ["data"]) == 28


def test_interpolation_at_time(client):
    body = get_json(
        client, "/api/v1/events/interpolationattime",
        tag_name="click", timestamps="2024-01-05T12:00:00", window_length=1,
    )
    assert len(body["data"]) == 1
    assert body["data"][0]["tagname"] == "click"


def test_summary_and_plot(client):
    summ = get_json(
        client, "/api/v1/events/summary",
        tag_name="click", start_date=START, end_date=END,
    )
    assert len(summ["data"]) == 1 and summ["data"][0]["cnt"] > 0
    plot = get_json(
        client, "/api/v1/events/plot",
        tag_name="click", start_date="2024-01-01", end_date="2024-01-03",
        time_interval_rate="1", time_interval_unit="day",
    )
    # unpivoted tall: up to 5 rows (min/max/first/last/exception) per bucket
    assert {r["aggregation"] for r in plot["data"]} >= {"min", "max", "first", "last"}


def test_sql_execute(client):
    r = client.post(
        "/api/v1/sql/execute",
        json={"sql_statement":
              f"SELECT event_type, count(*) AS n FROM parquet.`{SF}/events.parquet` "
              "GROUP BY event_type ORDER BY event_type"},
    )
    assert r.status_code == 200
    rows = json.loads(r.get_data(as_text=True))["data"]
    assert rows and all(row["n"] > 0 for row in rows)


def test_batch_mixed_requests(client):
    reqs = {
        "requests": [
            {"url": "/events/raw", "method": "GET",
             "params": dict(tag_name=["click"], start_date=START,
                            end_date=END, limit=5)},
            {"url": "/events/resample", "method": "POST",
             "params": dict(start_date=START, end_date=END,
                            time_interval_rate="1", time_interval_unit="day",
                            agg_method="avg"),
             "body": {"tag_name": ["click", "view"]}},
            {"url": "/events/raw", "method": "GET", "params": {}},  # bad: missing dates
        ]
    }
    r = client.post("/api/v1/events/batch", json=reqs)
    assert r.status_code == 200
    out = json.loads(r.get_data(as_text=True))["data"]
    assert len(out) == 3
    assert len(out[0]["data"]) == 5
    assert len(out[1]["data"]) > 0
    assert "Error" in out[2]["data"][0]  # failed sub-request -> Error row


def test_post_without_body_in_batch_is_400(client):
    r = client.post("/api/v1/events/batch", json={"requests": [
        {"url": "/events/resample", "method": "POST", "params": {}},
    ]})
    assert r.status_code == 400


def test_authorizer_rejects(spark):
    def deny(header):
        if header != "Bearer ok":
            raise PermissionError("Not authenticated")

    app = create_app(spark, default_catalog(spark, SF), authorizer=deny)
    app.testing = True
    with app.test_client() as c:
        assert c.get("/api/v1/events/latest").status_code == 401
        ok = c.get("/api/v1/events/latest", headers={"Authorization": "Bearer ok"})
        assert ok.status_code == 200


def test_catalog_binding_resolution(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    cat = Catalog(bindings={
        "acme.pumps.restricted.float": SourceBinding(
            events=ev, tagname_column="event_type", timestamp_column="ts",
            status_column=None, value_column="value",
        ),
    })
    app = create_app(spark, cat)
    app.testing = True
    with app.test_client() as c:
        ok = c.get("/api/v1/events/latest", query_string=dict(
            business_unit="acme", asset="pumps",
            data_security_level="restricted", data_type="float",
        ))
        assert ok.status_code == 200
        # no default binding: unmapped request is a clean 400
        bad = c.get("/api/v1/events/latest")
        assert bad.status_code == 400


def test_percentiles_and_topk_routes(client):
    pct = get_json(
        client, "/api/v1/events/percentiles",
        tag_name="click", start_date=START, end_date=END,
        percentiles="0.5,0.95",
    )
    row = pct["data"][0]
    assert row["cnt"] > 0 and row["p50"] <= row["p95"]

    topk = get_json(
        client, "/api/v1/events/topk",
        tag_name="click", start_date=START, end_date=END,
        time_interval_rate="1", time_interval_unit="day", k="2",
    )
    ranks = {r["rank"] for r in topk["data"]}
    assert ranks <= {1, 2} and len(topk["data"]) > 0
    # within each bucket, rank 1 value >= rank 2 value
    import collections
    by_bucket = collections.defaultdict(dict)
    for r in topk["data"]:
        by_bucket[r["bucket"]][r["rank"]] = r["value"]
    for d in by_bucket.values():
        if 1 in d and 2 in d:
            assert d[1] >= d[2]
