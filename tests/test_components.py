"""Tests for transformers, PCDM CDC sinks, connector builders, batch
fan-out, and the new data-quality operators (imputation / smoothing /
binning) — expected-DataFrame style per SURVEY §5 tier 2.
"""

from __future__ import annotations

import base64
import json
from datetime import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from core_spark import batch_exec, transformers as tr
from core_spark.operators import data_quality as dq
from core_spark.operators.timeseries import TSSpec
from core_spark.sources.connectors import (
    EventhubKafkaSource,
    FileStreamSource,
    KafkaSink,
    KafkaSource,
)
from core_spark.streaming.pcdm import LatestSink, PCDMMergeSink

SPEC = TSSpec(tag_col="tag", ts_col="ts", value_col="v", status_col=None)


def _ts(s):
    return datetime.fromisoformat(s)


# ---------------------------------------------------------------- transformers

def test_binary_to_string_roundtrip(spark):
    df = spark.createDataFrame([(bytearray(b"hello"),)], "b binary")
    out = tr.binary_to_string(df, "b", "s").select("s").first()
    assert out["s"] == "hello"


def test_json_to_clip_events(spark):
    msg = [
        {
            "clip_id": "aw-1",
            "ingest_ts": "2024-03-01T00:00:01.250000+00:00",
            "sr_hz": 8000,
            "dur_ms": 100,
            "codec": "pcm16",
            "transcript": "alpha bravo",
            "payload_b64": base64.b64encode(b"\x01\x02").decode(),
        },
        {
            "clip_id": "aw-2",
            "ingest_ts": "2024-03-01 00:00:02",
            "sr_hz": 16000,
            "dur_ms": 200,
            "codec": "ulaw",
            "transcript": "charlie",
            "payload_b64": base64.b64encode(b"\x03").decode(),
        },
    ]
    df = spark.createDataFrame([(json.dumps(msg).encode(),)], "body binary")
    out = tr.json_to_clip_events(df).orderBy("clip_id").collect()
    assert [r["clip_id"] for r in out] == ["aw-1", "aw-2"]
    assert bytes(out[0]["bytes"]) == b"\x01\x02"
    assert out[0]["ingest_ts"] == _ts("2024-03-01 00:00:01.250")
    assert out[1]["ingest_ts"] == _ts("2024-03-01 00:00:02")
    assert out[1]["codec"] == "ulaw"


def test_pcdm_normalize_and_split(spark):
    rows = [
        ("T1", _ts("2024-01-01 00:00:00.123456"), "Good", "1.5", "float", "insert"),
        ("T1", _ts("2024-01-01 00:00:00.123999"), "Good", "1.5", "float", "update"),
        ("T2", _ts("2024-01-01 00:00:01"), "Good", "7", "integer", "upsert"),
        ("T3", _ts("2024-01-01 00:00:02"), "Good", "x", "string", "delete"),
    ]
    df = spark.createDataFrame(
        rows, "TagName string, EventTime timestamp, Status string, Value string, ValueType string, ChangeType string"
    )
    norm = tr.pcdm_normalize(df)
    got = {(r["TagName"], r["ChangeType"]) for r in norm.collect()}
    # both T1 rows truncate to the same ms + normalize to upsert -> dedup to 1
    assert got == {("T1", "upsert"), ("T2", "upsert"), ("T3", "delete")}
    split = tr.pcdm_split_by_type(norm)
    f = split["float"].collect()
    assert len(f) == 1 and abs(f[0]["Value"] - 1.5) < 1e-12
    i = split["integer"].collect()
    assert len(i) == 1 and i[0]["Value"] == 7
    assert split["string"].collect()[0]["Value"] == "x"


# ---------------------------------------------------------------- PCDM sinks

def test_pcdm_merge_sink_cdc(spark, tmp_path):
    sink = PCDMMergeSink(str(tmp_path / "pcdm"))
    schema = "TagName string, EventTime timestamp, Status string, Value string, ValueType string, ChangeType string"
    b0 = spark.createDataFrame(
        [
            ("T1", _ts("2024-01-01 00:00:00"), "Good", "1.0", "float", "insert"),
            ("T1", _ts("2024-01-01 00:01:00"), "Good", "2.0", "float", "insert"),
            ("S1", _ts("2024-01-01 00:00:00"), "Good", "a", "string", "insert"),
        ],
        schema,
    )
    sink.write_batch(b0, 0)
    assert sink.read(spark, "float").count() == 2
    assert sink.read(spark, "string").count() == 1
    # batch 1: update one float row, delete the string row
    b1 = spark.createDataFrame(
        [
            ("T1", _ts("2024-01-01 00:01:00"), "Good", "9.0", "float", "update"),
            ("S1", _ts("2024-01-01 00:00:00"), "Good", "a", "string", "delete"),
        ],
        schema,
    )
    sink.write_batch(b1, 1)
    floats = {
        (r["TagName"], r["EventTime"]): r["Value"]
        for r in sink.read(spark, "float").collect()
    }
    assert floats[("T1", _ts("2024-01-01 00:01:00"))] == 9.0
    assert floats[("T1", _ts("2024-01-01 00:00:00"))] == 1.0
    assert sink.read(spark, "string").count() == 0
    # replay of batch 1 is a no-op
    sink.write_batch(b1, 1)
    assert sink.read(spark, "float").count() == 2


def test_latest_sink(spark, tmp_path):
    sink = LatestSink(str(tmp_path / "latest"))
    schema = "TagName string, EventTime timestamp, Status string, Value double"
    sink.write_batch(
        spark.createDataFrame(
            [
                ("T1", _ts("2024-01-01 00:00:00"), "Good", 1.0),
                ("T1", _ts("2024-01-01 00:02:00"), "Good", 3.0),
                ("T2", _ts("2024-01-01 00:00:00"), "Good", 5.0),
            ],
            schema,
        ),
        0,
    )
    # older row for T1 must NOT displace; newer row for T2 must
    sink.write_batch(
        spark.createDataFrame(
            [
                ("T1", _ts("2024-01-01 00:01:00"), "Good", 99.0),
                ("T2", _ts("2024-01-01 00:05:00"), "Bad", 6.0),
            ],
            schema,
        ),
        1,
    )
    got = {r["TagName"]: (r["EventTime"], r["Value"]) for r in sink.read(spark).collect()}
    assert got["T1"] == (_ts("2024-01-01 00:02:00"), 3.0)
    assert got["T2"] == (_ts("2024-01-01 00:05:00"), 6.0)


# ---------------------------------------------------------------- connectors

def test_connector_option_plumbing():
    k = KafkaSource("broker:9092", "clips", "latest", {"maxOffsetsPerTrigger": "5"})
    assert k.options() == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "clips",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "5",
    }
    eh = EventhubKafkaSource("ns", "hub", "Endpoint=sb://...")
    opts = eh.options()
    assert opts["kafka.bootstrap.servers"] == "ns.servicebus.windows.net:9093"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert "Endpoint=sb://..." in opts["kafka.sasl.jaas.config"]
    s = KafkaSink("broker:9092", "out")
    assert s.options()["topic"] == "out"


def test_eventhub_body_projection(spark):
    kafka_shaped = spark.createDataFrame(
        [(b"payload", _ts("2024-01-01 00:00:00"), 0, 42)],
        "value binary, timestamp timestamp, partition int, offset long",
    )
    out = EventhubKafkaSource.project_body(kafka_shaped).first()
    assert bytes(out["body"]) == b"payload"
    assert out["sequenceNumber"] == "42"


def test_kafka_sink_serialize(spark):
    df = spark.createDataFrame([("aw-1", 1.5, "hi")], "clip_id string, e double, t string")
    r = KafkaSink.serialize(df, "clip_id", ["e", "t"]).first()
    assert r["key"] == "aw-1"
    assert json.loads(r["value"]) == {"e": 1.5, "t": "hi"}


def test_file_stream_source_roundtrip(spark, tmp_path):
    p = str(tmp_path / "files")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(p)
    src = FileStreamSource(p, schema_ddl="id long, s string")
    assert src.read_batch(spark).count() == 1
    stream = src.read_stream(spark)
    assert stream.isStreaming


# ---------------------------------------------------------------- batch exec

def test_batch_exec_fanout(spark):
    res = batch_exec.run_batch(
        spark,
        {
            "a": lambda s: s.range(10),
            "b": lambda s: s.range(5).filter("id < 3"),
            "boom": lambda s: s.sql("select * from nonexistent_table_xyz"),
        },
        max_workers=3,
    )
    assert res["a"] == 10 and res["b"] == 3
    assert isinstance(res["boom"], Exception)


# ---------------------------------------------------------------- dq operators

def test_impute_missing_linear(spark):
    rows = [
        ("A", _ts("2024-01-01 00:00:00"), 0.0),
        ("A", _ts("2024-01-01 00:01:00"), 1.0),
        # 00:02 and 00:03 missing
        ("A", _ts("2024-01-01 00:04:00"), 4.0),
    ]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, v double")
    out = dq.impute_missing(df, SPEC).orderBy("event_time").collect()
    assert [r["value"] for r in out] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert [r["imputed"] for r in out] == [False, False, True, True, False]


def test_gaussian_smooth_constant_series(spark):
    rows = [("A", _ts(f"2024-01-01 00:0{i}:00"), 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, v double")
    out = dq.gaussian_smooth(df, SPEC, sigma=1.5).collect()
    # smoothing a constant series is the identity (kernel sums to 1)
    assert all(abs(r["value_smooth"] - 5.0) < 1e-9 for r in out)


def test_gaussian_smooth_reduces_variance(spark):
    vals = [0.0, 10.0] * 10
    rows = [("A", _ts(f"2024-01-01 00:{i:02d}:00"), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, v double")
    out = dq.gaussian_smooth(df, SPEC, sigma=2.0).toPandas()
    assert out["value_smooth"].std() < np.std(vals) / 2


def test_fixed_width_binning_edges(spark):
    rows = [("A", _ts("2024-01-01 00:00:00"), v) for v in (-1.0, 0.0, 9.99, 10.0, 25.0)]
    df = spark.createDataFrame(rows, "tag string, ts timestamp, v double")
    out = dq.fixed_width_binning(df, SPEC, 0.0, 20.0, 10).orderBy("value").collect()
    assert [r["bin"] for r in out] == [0, 0, 4, 5, 9]


def test_rest_sink_executor_side_batched_post(spark, tmp_path):
    # transport fake: each POST payload lands as one JSON file; executors
    # run on this host in local mode so a shared dir observes all posts
    import glob
    import os
    import uuid

    from core_spark.sources.connectors import RestSink

    out_dir = str(tmp_path / "posts")
    os.makedirs(out_dir, exist_ok=True)

    def fake_post(payload: str) -> int:
        with open(os.path.join(out_dir, f"{uuid.uuid4().hex}.json"), "w") as f:
            f.write(payload)
        return 200

    df = spark.range(0, 25, 1, numPartitions=3).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    RestSink(url="http://example.invalid/ingest", batch_size=4, poster=fake_post).write_batch(df)

    rows = []
    for p in glob.glob(os.path.join(out_dir, "*.json")):
        with open(p) as f:
            batch = json.loads(f.read())
        assert 1 <= len(batch) <= 4  # batch_size respected per request
        rows.extend(batch)
    assert sorted(r["id"] for r in rows) == list(range(25))
    assert all(r["v"] == r["id"] * 2 for r in rows)


def test_eventhub_delta_sharing_kinesis_connectors(spark):
    from core_spark.sources.connectors import (
        DeltaSharingSource,
        EventhubSink,
        EventhubSource,
        KinesisSink,
    )

    src = EventhubSource(
        "Endpoint=sb://ns/;EntityPath=hub", "cg1", '{"offset": "-1"}'
    )
    o = src.options()
    assert o["eventhubs.connectionString"].startswith("Endpoint=sb://")
    assert o["eventhubs.consumerGroup"] == "cg1"
    assert o["eventhubs.startingPosition"] == '{"offset": "-1"}'

    ds = DeltaSharingSource("/creds.share#share.schema.tbl", {"ignoreChanges": "true"})
    assert ds.table_path.endswith("share.schema.tbl")

    ks = KinesisSink("events", "us-east-1", {"awsUseInstanceProfile": "true"})
    assert ks.options()["streamName"] == "events"
    df = spark.createDataFrame([("aw-1", 2.0)], "clip_id string, e double")
    r = KinesisSink.serialize(df, "clip_id", ["e"]).first()
    assert r["partitionKey"] == "aw-1" and json.loads(r["data"]) == {"e": 2.0}

    # eventhub body coercion: non-string/binary body -> cast to string
    b1 = EventhubSink.serialize(spark.createDataFrame([(5,)], "body int")).first()
    assert b1["body"] == "5"
    b2 = EventhubSink.serialize(spark.createDataFrame([(b"x",)], "body binary")).first()
    assert bytes(b2["body"]) == b"x"
    b3 = EventhubSink.serialize(
        spark.createDataFrame([("aw-1", 1.5)], "clip_id string, e double")
    ).first()
    assert json.loads(b3["body"]) == {"clip_id": "aw-1", "e": 1.5}


def test_fledge_and_edgex_transformers(spark):
    from core_spark.transformers import edgex_json_to_pcdm, fledge_json_to_pcdm

    fledge_body = (
        '[{"asset":"pump1","readings":{"temp":"21.5","state":"RUNNING"},'
        '"timestamp":"2024-03-01T00:00:01.500000Z"}]'
    )
    rows = {r["TagName"]: r for r in fledge_json_to_pcdm(
        spark.createDataFrame([(fledge_body,)], "body string")
    ).collect()}
    assert rows["temp"]["ValueType"] == "float" and rows["temp"]["Value"] == "21.5"
    assert rows["state"]["ValueType"] == "string"
    assert rows["temp"]["EventTime"] == _ts("2024-03-01 00:00:01.5")
    assert rows["temp"]["Status"] == "Good" and rows["temp"]["ChangeType"] == "insert"

    edgex_body = (
        '{"apiVersion":"v3","id":"m1","deviceName":"d1","origin":1709251200000000000,'
        '"readings":['
        '{"id":"r1","origin":1709251200123456000,"resourceName":"flow","value":"7","valueType":"Uint16"},'
        '{"id":"r2","origin":1709251200123456000,"resourceName":"ok","value":"true","valueType":"Bool"}]}'
    )
    out = {r["TagName"]: r for r in edgex_json_to_pcdm(
        spark.createDataFrame([(edgex_body,)], "body string")
    ).collect()}
    assert out["flow"]["ValueType"] == "integer"
    assert out["ok"]["ValueType"] == "bool"
    # ns origin -> exact microsecond event time (no float rounding)
    assert out["flow"]["EventTime"] == _ts("2024-03-01 00:00:00.123456")


def test_aio_transformer(spark):
    body = json.dumps(
        {
            "Payload": json.dumps(
                {
                    "tag1": {"SourceTimestamp": "2024-01-01T00:00:01.500000+00:00", "Value": "4.5"},
                    "tag2": {"SourceTimestamp": "2024-01-01T00:00:02+00:00", "Value": "open"},
                }
            )
        }
    )
    df = spark.createDataFrame([(body,)], "body string")
    out = {r["TagName"]: r for r in tr.aio_json_to_pcdm(df).collect()}
    assert out["tag1"]["ValueType"] == "float" and out["tag1"]["Value"] == "4.5"
    assert out["tag2"]["ValueType"] == "string"
    assert out["tag1"]["EventTime"] == _ts("2024-01-01 00:00:01.500")
    assert out["tag2"]["Status"] == "Good" and out["tag2"]["ChangeType"] == "insert"


def test_honeywell_apm_roundtrip(spark):
    body = json.dumps(
        {
            "SystemTimeSeries": {
                "Id": "s",
                "Samples": [
                    {"ItemName": "T1", "Time": "2024-01-01T01:02:03+00:00", "Value": "7.25"},
                    {"ItemName": "T2", "Time": "2024-01-01 01:02:04", "Value": "hi"},
                ],
            }
        }
    )
    df = spark.createDataFrame([(body,)], "body string")
    rows = {r["TagName"]: r for r in tr.honeywell_apm_to_pcdm(df).collect()}
    assert rows["T1"]["ValueType"] == "float"
    assert rows["T2"]["ValueType"] == "string"
    assert rows["T2"]["EventTime"] == _ts("2024-01-01 01:02:04")

    pcdm = spark.createDataFrame(
        [
            ("T1", _ts("2024-01-01 00:00:01"), "Good", "1.0"),
            ("T1", _ts("2024-01-01 00:00:02"), "Good", "2.0"),
            ("T1", _ts("2024-01-01 00:00:03"), "Good", "3.0"),
            ("T2", _ts("2024-01-01 00:00:01"), "Good", "9.0"),
        ],
        "TagName string, EventTime timestamp, Status string, Value string",
    )
    # batching: 3 T1 rows at 2/message -> 2 messages; 1 T2 row -> 1 message
    out = tr.pcdm_to_honeywell_apm(
        pcdm, history_samples_per_message=2, created_time="2024-06-01 00:00:00"
    ).collect()
    assert len(out) == 3
    by_pk = {}
    for r in out:
        by_pk.setdefault(r["partitionKey"], []).append(r)
    assert sorted(len(v) for v in by_pk.values()) == [1, 2]
    body_val = json.loads(out[0]["CloudPlatformEvent"]["Body"]["value"])
    assert set(body_val) == {"SystemGuid", "HistorySamples"}
    assert body_val["SystemGuid"] == out[0]["partitionKey"]
    # deterministic: same input -> identical Ids (replay-safe, unlike uuid())
    out2 = tr.pcdm_to_honeywell_apm(
        pcdm, history_samples_per_message=2, created_time="2024-06-01 00:00:00"
    ).collect()
    assert sorted(r["CloudPlatformEvent"]["Id"] for r in out) == sorted(
        r["CloudPlatformEvent"]["Id"] for r in out2
    )


def test_mirico_transformer_tag_assembly(spark):
    body = json.dumps(
        {
            "timeStamp": "2024-01-01 00:00:05",
            "siteName": "siteA",
            "gasType": "ch4",
            "retroName": "r9",
            "gasPpm": "1.25",
        }
    )
    df = spark.createDataFrame([(body,)], "body string")
    rows = {r["TagName"]: r for r in tr.mirico_json_to_pcdm(df).collect()}
    assert "SITEA_R9_GASPPM_CH4" in rows
    assert rows["SITEA_R9_GASPPM_CH4"]["ValueType"] == "float"
    assert rows["SITEA_R9_SITENAME"]["ValueType"] == "string"
    assert rows["SITEA_R9_GASTYPE"]["Value"] == "ch4"
    pref = {r["TagName"] for r in tr.mirico_json_to_pcdm(df, tagname_field="mz").collect()}
    assert "MZ:SITEA_R9_GASPPM_CH4" in pref


def test_sem_transformer_vector_positions(spark):
    body = json.dumps(
        {
            "apiVersion": "v2",
            "readings": [
                {"resourceName": "dID", "value": "dev7"},
                {"resourceName": "d", "value": "[10,11,12]"},
                {"resourceName": "t", "value": "1704067200500"},
            ],
        }
    )
    df = spark.createDataFrame([(body,)], "body string")
    mapping = {0: ("a", "float"), 1: ("b", "integer"), 2: ("c", "string")}
    rows = {r["TagName"]: r for r in tr.sem_json_to_pcdm(df, mapping).collect()}
    assert rows["dev7:a"]["Value"] == "10" and rows["dev7:a"]["ValueType"] == "float"
    assert rows["dev7:c"]["Value"] == "12"
    # '<epoch10><frac>' -> exact 500ms fraction
    assert rows["dev7:b"]["EventTime"] == _ts("2024-01-01 00:00:00.500")


def test_ssip_binary_parquet_decode_skips_malformed(spark):
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "TagName": ["A", "A"],
            "EventTime": pd.to_datetime(["2024-01-01 00:00:01", "2024-01-01 00:00:02"]),
            "Status": ["Good", "Good"],
            "Value": pd.array([1, 2], dtype="int32"),
        }
    )
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), buf)
    df = spark.createDataFrame(
        [(bytearray(buf.getvalue()),), (bytearray(b"not parquet"),)], "content binary"
    )
    out = tr.ssip_binary_parquet_to_pcdm(df, "content").collect()
    assert len(out) == 2  # malformed blob skipped, not fatal
    r = sorted(out, key=lambda r: r["EventTime"])[0]
    # ValueType falls back to the parquet physical type: int32 -> integer
    assert r["ValueType"] == "integer" and r["Value"] == "1"
    assert r["EventDate"] == r["EventTime"].date()
    assert r["ChangeType"] == "insert"


def test_pandas_bridges(spark):
    pdf = pd.DataFrame({"a": [1, 2]})
    sdf = tr.pandas_to_pyspark(spark, pdf)
    back = tr.pyspark_to_pandas(sdf.orderBy("a"))
    assert back["a"].tolist() == [1, 2]


def test_opcae_flatten(spark):
    inner = json.dumps(
        {
            "NodeId": "n1",
            "DisplayName": "alarm-1",
            "Value": {
                "ConditionId": {"Value": "c9"},
                "ActiveState/Id": {"Value": True},
                "Severity": {"Value": 700},
                "Message": {"Value": "high temp"},
                "Time": {"Value": "2024-01-01T00:00:09.500000+00:00"},
            },
        }
    )
    body = json.dumps([inner])
    df = spark.createDataFrame([(body,)], "body string")
    fields = [
        ("ConditionId", "string"),
        ("ActiveState/Id", "boolean"),
        ("Severity", "long"),
        ("Message", "string"),
        ("Time", "string"),
    ]
    r = tr.opcae_json_to_rows(df, fields=fields).collect()[0]
    assert r["NodeId"] == "n1" and r["DisplayName"] == "alarm-1"
    assert r["ConditionId"] == "c9" and r["ActiveState/Id"] is True
    assert r["Severity"] == 700 and r["Message"] == "high temp"
    assert r["EventTime"] == _ts("2024-01-01 00:00:09.500")
    # where-filter applies pre-parse on the raw event string
    assert tr.opcae_json_to_rows(df, fields=fields, where="__e NOT LIKE '%n1%'").count() == 0


def test_spark_connection_cursor(spark):
    from core_spark.connection import SparkConnection

    conn = SparkConnection(spark=spark)
    cur = conn.cursor()
    cur.execute("SELECT 1 AS one, 'a' AS tag")
    row = cur.fetch_all().first()
    assert row.one == 1 and row.tag == "a"
    cur.close(); conn.close()  # no-ops by contract
    import pytest

    with pytest.raises(RuntimeError, match="execute"):
        conn.cursor().fetch_all()
