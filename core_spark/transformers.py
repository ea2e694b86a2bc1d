"""Map-only transformers (reference §2.9: TransformerInterface.transform()
-> DataFrame, pipelines/transformers/spark/*). Pure column expressions, no
shuffles, no UDFs — each is a projection Catalyst fuses into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def binary_to_string(df: DataFrame, source_col: str, target_col: str) -> DataFrame:
    """Reference binary_to_string.py:79-86: cast a binary payload column to
    UTF-8 string (Eventhub/Kafka body decode)."""
    return df.withColumn(target_col, F.col(source_col).cast("string"))


def string_to_binary(df: DataFrame, source_col: str, target_col: str) -> DataFrame:
    return df.withColumn(target_col, F.col(source_col).cast("binary"))


# The clip-event envelope the engine's JSON sources emit: the audio-domain
# analog of OPC_PUBLISHER_SCHEMA (_pipeline_utils/spark.py:227-253) — a
# batched JSON message with per-clip records.
CLIP_EVENT_JSON_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("ingest_ts", T.StringType()),
            T.StructField("sr_hz", T.IntegerType()),
            T.StructField("dur_ms", T.IntegerType()),
            T.StructField("codec", T.StringType()),
            T.StructField("transcript", T.StringType()),
            T.StructField("payload_b64", T.StringType()),
        ]
    )
)

# Multi-format timestamp parse ladder, as in
# opc_publisher_opcua_json_to_pcdm.py:122-178 (coalesce over formats).
_TS_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
]


def json_to_clip_events(df: DataFrame, body_col: str = "body") -> DataFrame:
    """Parse a binary/string JSON message body into clip-event rows.

    Mirrors the reference's JSON->PCDM transformers: cast binary body to
    string, from_json with an explicit schema (never inference on the hot
    path, SURVEY §1.3), explode the batch array into rows, multi-format
    timestamp coalesce, base64 payload decode to binary.
    """
    body = F.col(body_col).cast("string")
    rows = df.withColumn("__arr", F.from_json(body, CLIP_EVENT_JSON_SCHEMA)).select(
        F.explode("__arr").alias("r")
    )
    # try_to_timestamp: ANSI mode (Spark 4 default) makes to_timestamp THROW
    # on a non-matching format, which would defeat the ladder
    ts = F.coalesce(
        *[F.try_to_timestamp(F.col("r.ingest_ts"), F.lit(f)) for f in _TS_FORMATS]
    )
    return rows.select(
        F.col("r.clip_id").alias("clip_id"),
        F.unbase64(F.col("r.payload_b64")).alias("bytes"),
        F.col("r.sr_hz").alias("sr_hz"),
        F.col("r.dur_ms").alias("dur_ms"),
        F.col("r.codec").alias("codec"),
        F.col("r.transcript").alias("transcript"),
        ts.alias("ingest_ts"),
    )


def json_props_extract(df: DataFrame, props_col: str, field: str, out_col: str) -> DataFrame:
    """Extract a scalar from a JSON string column (transport `properties`
    map analog, _pipeline_utils/spark.py:211-225)."""
    return df.withColumn(
        out_col, F.get_json_object(F.col(props_col), f"$.{field}")
    )


def pcdm_normalize(df: DataFrame) -> DataFrame:
    """PCDM CDC normalization (pcdm_to_delta.py:276-294): insert/update ->
    upsert, ms-truncate EventTime, dedup on (TagName, EventTime, ChangeType)."""
    return (
        df.withColumn(
            "ChangeType",
            F.when(F.col("ChangeType").isin("insert", "update"), "upsert").otherwise(
                F.col("ChangeType")
            ),
        )
        .withColumn("EventTime", F.date_trunc("millisecond", F.col("EventTime")))
        .dropDuplicates(["TagName", "EventTime", "ChangeType"])
    )


def pcdm_split_by_type(df: DataFrame) -> dict[str, DataFrame]:
    """ValueType-routed typed fan-out (pcdm_to_delta.py:296-309): one frame
    per destination table with Value cast to the table's type."""
    out = {}
    for vt, cast in (("float", "double"), ("integer", "long"), ("string", "string")):
        out[vt] = df.filter(F.col("ValueType") == vt).select(
            "TagName",
            "EventTime",
            "Status",
            F.col("Value").cast(cast).alias("Value"),
            "ChangeType",
        )
    return out


# Fledge south-service envelope (reference fledge_opcua_json_to_pcdm.py:
# FLEDGE_SCHEMA, _pipeline_utils/spark.py:611-619): an array of asset
# messages, each with a string->string readings map and a timestamp.
FLEDGE_JSON_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("asset", T.StringType()),
            T.StructField("readings", T.MapType(T.StringType(), T.StringType())),
            T.StructField("timestamp", T.StringType()),
        ]
    )
)


def fledge_json_to_pcdm(
    df: DataFrame,
    source_col: str = "body",
    status_null_value: str = "Good",
    change_type_value: str = "insert",
    timestamp_formats: list[str] | None = None,
) -> DataFrame:
    """Fledge JSON -> PCDM rows (fledge_opcua_json_to_pcdm.py:111-140):
    inline the message array, explode the readings map to (TagName, Value)
    rows, multi-format-parse the timestamp, infer ValueType by float
    castability. try_to_timestamp instead of to_timestamp because Spark 4's
    ANSI mode makes a failed format throw rather than null out of the
    coalesce ladder."""
    fmts = timestamp_formats or _TS_FORMATS
    rows = (
        df.withColumn("__m", F.from_json(F.col(source_col).cast("string"), FLEDGE_JSON_SCHEMA))
        .select(F.explode("__m").alias("m"))
        .select(F.explode("m.readings").alias("TagName", "Value"), F.col("m.timestamp").alias("__ts"))
    )
    ts = F.coalesce(*[F.try_to_timestamp(F.col("__ts"), F.lit(f)) for f in fmts])
    return rows.select(
        "TagName",
        ts.alias("EventTime"),
        F.lit(status_null_value).alias("Status"),
        "Value",
        # the reference's cast-to-null probe (non-ANSI); Spark 4 ANSI casts
        # throw on malformed strings, so the probe must be try_cast
        F.when(F.col("Value").try_cast("float").isNotNull(), "float")
        .otherwise("string")
        .alias("ValueType"),
        F.lit(change_type_value).alias("ChangeType"),
    )


# EdgeX event envelope (edgex_opcua_json_to_pcdm.py; EDGEX_SCHEMA,
# _pipeline_utils/spark.py:621-650): readings array with ns-epoch origin
# and a typed value.
EDGEX_JSON_SCHEMA = T.StructType(
    [
        T.StructField("apiVersion", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("deviceName", T.StringType()),
        T.StructField("origin", T.LongType()),
        T.StructField(
            "readings",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("origin", T.LongType()),
                        T.StructField("resourceName", T.StringType()),
                        T.StructField("value", T.StringType()),
                        T.StructField("valueType", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

_EDGEX_INT_TYPES = [f"{s}{w}" for s in ("Int", "Uint") for w in (8, 16, 32, 64)]


def edgex_json_to_pcdm(
    df: DataFrame,
    source_col: str = "body",
    status_null_value: str = "Good",
    change_type_value: str = "insert",
    tagname_field: str = "resourceName",
) -> DataFrame:
    """EdgeX JSON -> PCDM rows (edgex_opcua_json_to_pcdm.py:92-138): explode
    readings, ns-epoch origin -> event time, EdgeX type names -> PCDM
    ValueType. The reference converts origin with float division
    (origin/1e9 -> to_timestamp); at ns magnitudes doubles carry ~2^8 ns of
    rounding error, so the engine uses exact integer division to
    microseconds (timestamp_micros(origin DIV 1000)) — same mapping, no
    rounding."""
    rows = (
        df.withColumn("__m", F.from_json(F.col(source_col).cast("string"), EDGEX_JSON_SCHEMA))
        .select(F.explode("__m.readings").alias("r"))
    )
    vt = F.col("r.valueType")
    mapped = (
        F.when(vt.isin(_EDGEX_INT_TYPES), "integer")
        .when(vt.isin("Float32", "Float64"), "float")
        .when(vt == "Bool", "bool")
        .otherwise("string")
    )
    return rows.select(
        F.col(f"r.{tagname_field}").alias("TagName"),
        F.expr("timestamp_micros(CAST(r.origin DIV 1000 AS LONG))").alias("EventTime"),
        F.lit(status_null_value).alias("Status"),
        F.col("r.value").alias("Value"),
        mapped.alias("ValueType"),
        F.lit(change_type_value).alias("ChangeType"),
    )
