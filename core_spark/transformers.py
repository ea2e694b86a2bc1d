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


# ---------------------------------------------------------------------------
# AIO envelope (reference aio_json_to_pcdm.py:92-115; AIO_SCHEMA,
# _pipeline_utils/spark.py:714-722): outer JSON carries a `Payload` string,
# itself a JSON map of tag -> {SourceTimestamp, Value}.
# ---------------------------------------------------------------------------
AIO_PAYLOAD_SCHEMA = T.MapType(
    T.StringType(),
    T.StructType(
        [
            T.StructField("SourceTimestamp", T.TimestampType()),
            T.StructField("Value", T.StringType()),
        ]
    ),
)


def aio_json_to_pcdm(
    df: DataFrame,
    source_col: str = "body",
    status_null_value: str = "Good",
    change_type_value: str = "insert",
) -> DataFrame:
    """AIO JSON -> PCDM rows (aio_json_to_pcdm.py:92-115): two-level
    from_json (envelope string, then tag map), explode the map, ValueType
    by float castability (try_cast: Spark 4 ANSI casts throw on malformed
    strings). Pure projection — Catalyst fuses it into the scan."""
    payload = F.from_json(F.col(source_col).cast("string"), "Payload STRING")
    rows = (
        df.withColumn("__m", F.from_json(payload["Payload"], AIO_PAYLOAD_SCHEMA))
        .select(F.explode("__m").alias("TagName", "v"))
    )
    return rows.select(
        F.col("v.SourceTimestamp").alias("EventTime"),
        "TagName",
        F.lit(status_null_value).alias("Status"),
        F.col("v.Value").alias("Value"),
        F.when(F.col("v.Value").try_cast("float").isNotNull(), "float")
        .otherwise("string")
        .alias("ValueType"),
        F.lit(change_type_value).alias("ChangeType"),
    )


# ---------------------------------------------------------------------------
# Honeywell APM envelope (honeywell_apm_to_pcdm.py:94-111; APM_SCHEMA,
# _pipeline_utils/spark.py:649-681): SystemTimeSeries.Samples array.
# ---------------------------------------------------------------------------
APM_JSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "SystemTimeSeries",
            T.StructType(
                [
                    T.StructField("Id", T.StringType()),
                    T.StructField("TenantId", T.StringType()),
                    T.StructField("IdType", T.StringType()),
                    T.StructField(
                        "Samples",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("ItemName", T.StringType()),
                                    T.StructField("Time", T.StringType()),
                                    T.StructField("Value", T.StringType()),
                                    T.StructField("Unit", T.StringType()),
                                    T.StructField("NormalizedQuality", T.StringType()),
                                    T.StructField("HighValue", T.DoubleType()),
                                    T.StructField("LowValue", T.DoubleType()),
                                    T.StructField("TargetValue", T.DoubleType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)


def honeywell_apm_to_pcdm(
    df: DataFrame,
    source_col: str = "body",
    status_null_value: str = "Good",
    change_type_value: str = "insert",
) -> DataFrame:
    """Honeywell APM JSON -> PCDM (honeywell_apm_to_pcdm.py:94-111): parse
    SystemTimeSeries, explode Samples, ItemName -> TagName, float-probe
    ValueType."""
    rows = (
        df.withColumn("__m", F.from_json(F.col(source_col).cast("string"), APM_JSON_SCHEMA))
        .select(F.explode("__m.SystemTimeSeries.Samples").alias("s"))
    )
    ts = F.coalesce(
        *[F.try_to_timestamp(F.col("s.Time"), F.lit(f)) for f in _TS_FORMATS]
    )
    return rows.select(
        F.col("s.ItemName").alias("TagName"),
        ts.alias("EventTime"),
        F.lit(status_null_value).alias("Status"),
        F.col("s.Value").alias("Value"),
        F.when(F.col("s.Value").try_cast("float").isNotNull(), "float")
        .otherwise("string")
        .alias("ValueType"),
        F.lit(change_type_value).alias("ChangeType"),
    )


def pcdm_to_honeywell_apm(
    df: DataFrame,
    quality: str = "Good",
    history_samples_per_message: int = 1,
    created_time: str | None = None,
) -> DataFrame:
    """PCDM -> Honeywell APM CloudPlatformEvent (pcdm_to_honeywell_apm.py:
    107-215). Divergences from the reference, both deliberate:
    - the reference stamps CreatedTime=datetime.now() and Id=uuid() —
      non-reproducible and checkpoint-hostile; the engine takes an injectable
      `created_time` and derives Id deterministically from the content key
      (sha2(TagName||EventTime)), so micro-batch replay emits identical rows
      (exactly-once sink requirement);
    - the reference gzip+b64 compresses via a per-row Python UDF; the engine
      returns the uncompressed JSON column and leaves transport compression
      to the sink (Kafka/Eventhub producer compression), keeping the hot
      path JVM-side.
    Batching: history_samples_per_message>1 groups each tag's rows into
    fixed-size HistorySamples arrays exactly like the reference's
    floor((row_number-0.01)/n) window trick."""
    from pyspark.sql import Window

    guid = F.sha2(F.col("TagName"), 256)
    sample = F.struct(
        F.col("TagName").alias("ItemName"),
        F.lit(quality).alias("Quality"),
        F.col("EventTime").alias("Time"),
        F.col("Value").alias("Value"),
    )
    if history_samples_per_message > 1:
        w = Window.partitionBy("TagName").orderBy("EventTime")
        grouped = (
            df.withColumn(
                "__idx",
                F.floor(
                    (F.row_number().over(w) - F.lit(0.01))
                    / F.lit(history_samples_per_message)
                ),
            )
            .withColumn("__s", sample)
            .groupBy("TagName", "__idx")
            .agg(
                F.collect_list("__s").alias("HistorySamples"),
                F.max("EventTime").alias("__maxt"),
            )
            .withColumn("guid", F.sha2(F.col("TagName"), 256))
            .withColumn("__key", F.concat("TagName", F.col("__maxt").cast("string")))
        )
    else:
        grouped = (
            df.withColumn("guid", guid)
            .withColumn("HistorySamples", F.array(sample))
            .withColumn(
                "__key", F.concat("TagName", F.col("EventTime").cast("string"))
            )
        )
    body_value = F.struct(
        F.col("guid").alias("SystemGuid"), F.col("HistorySamples")
    )
    event = F.struct(
        F.lit(created_time).cast("timestamp").alias("CreatedTime"),
        F.sha2(F.col("__key"), 256).alias("Id"),
        F.col("guid").alias("CreatorId"),
        F.lit("CloudPlatformSystem").alias("CreatorType"),
        F.lit(None).cast("string").alias("GeneratorId"),
        F.lit("CloudPlatformTenant").alias("GeneratorType"),
        F.col("guid").alias("TargetId"),
        F.lit("CloudPlatformTenant").alias("TargetType"),
        F.lit(None).cast("string").alias("TargetContext"),
        F.struct(
            F.lit("TextualBody").alias("type"),
            F.to_json(body_value).alias("value"),
            F.lit("application/json").alias("format"),
        ).alias("Body"),
        F.array(
            F.struct(F.lit("SystemType").alias("Key"), F.lit("apm-system").alias("Value")),
            F.struct(F.lit("SystemGuid").alias("Key"), F.col("guid").alias("Value")),
        ).alias("BodyProperties"),
        F.lit("DataChange.Update").alias("EventType"),
    )
    return grouped.select(
        event.alias("CloudPlatformEvent"),
        F.lit(",").alias("AnnotationStreamIds"),
        F.col("guid").alias("partitionKey"),
    )


# ---------------------------------------------------------------------------
# Mirico envelope (mirico_json_to_pcdm.py:109-186): flat JSON string->string
# map; every entry becomes a PCDM row with an assembled TagName.
# ---------------------------------------------------------------------------

# key -> ValueType, the semantic content of the reference's positional
# MIRICO_FIELD_MAPPINGS (_pipeline_utils/mirico_field_mappings.py:1-20).
# The reference maps by posexplode position over a parsed map — map entry
# order is an implementation detail of the JSON parser, so the engine keys
# the mapping by field NAME instead (same tags, order-independent).
MIRICO_STRING_FIELDS = {"timeStamp", "gasType", "retroName", "siteKey", "siteName", "gps_utcTime"}


def mirico_json_to_pcdm(
    df: DataFrame,
    source_col: str = "body",
    status_null_value: str = "Good",
    change_type_value: str = "insert",
    tagname_field: str | None = None,
) -> DataFrame:
    """Mirico JSON -> PCDM (mirico_json_to_pcdm.py:109-186): parse the flat
    map, explode every entry to a row, TagName =
    [TAGNAME_FIELD:]SITENAME_RETRONAME_KEY with the reference's GASPPM ->
    GASPPM_<GASTYPE> special case; ValueType 'string' for the known string
    fields, else 'float'."""
    m = F.from_json(F.col(source_col).cast("string"), "map<string,string>")
    rows = df.select(
        m.alias("x"),
        F.try_to_timestamp(m["timeStamp"]).alias("EventTime"),
        F.upper(m["siteName"]).alias("__site"),
        F.upper(m["gasType"]).alias("__gas"),
        F.upper(m["retroName"]).alias("__retro"),
    ).select("EventTime", "__site", "__gas", "__retro", F.explode("x").alias("key", "Value"))
    keypart = F.when(
        F.upper(F.col("key")) == "GASPPM",
        F.concat_ws("_", F.upper(F.col("key")), F.col("__gas")),
    ).otherwise(F.upper(F.col("key")))
    tag = F.concat_ws("_", F.col("__site"), F.col("__retro"), keypart)
    if tagname_field is not None:
        tag = F.concat_ws(":", F.upper(F.lit(tagname_field)), tag)
    vt = (
        F.when(F.col("key").isin(*sorted(MIRICO_STRING_FIELDS)), "string")
        .otherwise("float")
    )
    return rows.select(
        "EventTime",
        tag.alias("TagName"),
        F.lit(status_null_value).alias("Status"),
        "Value",
        vt.alias("ValueType"),
        F.lit(change_type_value).alias("ChangeType"),
    )


# ---------------------------------------------------------------------------
# SEM / OBC envelope (sem_json_to_pcdm.py:110-160; SEM_SCHEMA,
# _pipeline_utils/spark.py:685-712): readings rows carry (resourceName,
# value) pairs; the 'd' resource is a bracketed CSV vector whose positions
# map to tags, 't' is an epoch with the fraction glued on, 'dID' the device.
# ---------------------------------------------------------------------------
SEM_JSON_SCHEMA = T.StructType(
    [
        T.StructField("apiVersion", T.StringType()),
        T.StructField("deviceName", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("origin", T.LongType()),
        T.StructField("profileName", T.StringType()),
        T.StructField(
            "readings",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("deviceName", T.StringType()),
                        T.StructField("id", T.StringType()),
                        T.StructField("origin", T.LongType()),
                        T.StructField("profileName", T.StringType()),
                        T.StructField("resourceName", T.StringType()),
                        T.StructField("value", T.StringType()),
                        T.StructField("valueType", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("sourceName", T.StringType()),
    ]
)


def sem_json_to_pcdm(
    df: DataFrame,
    field_mappings: dict[int, tuple[str, str]],
    source_col: str = "body",
    status_null_value: str = "Good",
    change_type_value: str = "insert",
) -> DataFrame:
    """SEM v10 JSON -> PCDM (sem_json_to_pcdm.py:110-160): collapse the
    readings array to a resourceName->value map, split the 'd' vector
    "[v0,v1,...]" with posexplode, key each position through
    `field_mappings` {pos: (tag_suffix, value_type)} (the semantic of the
    reference's OBC_FIELD_MAPPINGS_V10, supplied by the caller — deployment
    config, not engine code), and rebuild the '<epoch10>.<frac>' timestamp
    exactly with integer string surgery instead of the reference's
    regexp+double cast (doubles lose sub-ms precision at epoch magnitude).
    TagName = dID:tag_suffix. Mapping lookup is a literal map column —
    no Python UDF (the reference uses a per-row lambda UDF here)."""
    items = []
    for pos, (tag, vt) in sorted(field_mappings.items()):
        items += [F.lit(pos), F.struct(F.lit(tag).alias("t"), F.lit(vt).alias("vt"))]
    mapping = F.create_map(*items)
    # one message = one readings array carrying the dID/d/t triplet as
    # (resourceName, value) rows; the reference melts+map_from_arrays —
    # same collapse, directly on the parsed array:
    src = df.withColumn(
        "__m", F.from_json(F.col(source_col).cast("string"), SEM_JSON_SCHEMA)
    ).select(
        F.map_from_entries(
            F.transform(
                "__m.readings",
                lambda r: F.struct(r["resourceName"].alias("k"), r["value"].alias("v")),
            )
        ).alias("x")
    )
    # exact µs reassembly: <epoch10><frac...> -> epoch10*1e6 + frac-padded-µs
    ts = F.expr(
        "timestamp_micros(CAST(substring(x['t'], 1, 10) AS BIGINT) * 1000000"
        " + CAST(rpad(substring(x['t'], 11, 6), 6, '0') AS BIGINT))"
    )
    d_inner = F.expr("substring(x['d'], 2, length(x['d'])-2)")
    rows = src.select(
        ts.alias("EventTime"),
        F.col("x")["dID"].alias("__did"),
        F.posexplode(F.split(d_inner, ",")).alias("pos", "Value"),
    )
    looked = F.element_at(mapping, F.col("pos"))
    return rows.select(
        "EventTime",
        F.concat_ws(":", F.col("__did"), looked["t"]).alias("TagName"),
        F.lit(status_null_value).alias("Status"),
        "Value",
        looked["vt"].alias("ValueType"),
        F.lit(change_type_value).alias("ChangeType"),
    ).where(F.col("TagName").isNotNull())


def ssip_binary_parquet_to_pcdm(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Embedded-parquet binary files -> PCDM rows (reference
    ssip_pi_binary_file_to_pcdm.py:80-135, which does groupBy(path)
    .applyInPandas one file per group). The engine uses mapInPandas instead:
    no shuffle at all — each input partition's files are decoded in place
    with pyarrow over the Arrow batch, and a partition can hold many files
    (the reference's groupBy forces a shuffle AND caps parallelism at the
    file count). ValueType falls back to the parquet Value column's physical
    type (int16/int32 -> 'integer') exactly like the reference."""
    import pandas as pd  # noqa: PLC0415 — executor-side import
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.parquet as pq  # noqa: PLC0415

    out_schema = (
        "EventDate DATE, TagName STRING, EventTime TIMESTAMP, Status STRING, "
        "Value STRING, ValueType STRING, ChangeType STRING"
    )

    def decode(batches):
        for pdf in batches:
            frames = []
            for blob in pdf[binary_col]:
                if blob is None:
                    continue
                try:
                    table = pq.read_table(pa.py_buffer(bytes(blob)))
                except Exception:  # malformed file -> skip, as the reference does
                    continue
                out = table.to_pandas()
                if "ValueType" not in out.columns:
                    vt = str(table.schema.field("Value").type)
                    if vt in ("int16", "int32"):
                        vt = "integer"
                    out["ValueType"] = vt
                if "ChangeType" not in out.columns:
                    out["ChangeType"] = "insert"
                out["EventDate"] = pd.to_datetime(out["EventTime"]).dt.date
                out["Value"] = out["Value"].astype(str)
                frames.append(
                    out[["EventDate", "TagName", "EventTime", "Status", "Value", "ValueType", "ChangeType"]]
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return df.select(binary_col).mapInPandas(decode, schema=out_schema)


def pyspark_to_pandas(df: DataFrame):
    """Reference pyspark_to_pandas.py:76 — driver materialization via Arrow
    (spark.sql.execution.arrow.pyspark.enabled is set by session.get_spark).
    Driver-side by definition; only for small result sets."""
    return df.toPandas()


def pandas_to_pyspark(spark, pdf) -> DataFrame:
    """Reference pandas_to_pyspark.py — createDataFrame over Arrow."""
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------------------
# OPC Publisher Alarms & Events envelope (opc_publisher_opcae_json_to_pcdm.py:
# 102-170; OPC_PUBLISHER_AE_SCHEMA, _pipeline_utils/spark.py:255-…): each
# condition field is a {Value, SourceTimestamp} struct; the transformer
# flattens every condition's .Value into a column.
# ---------------------------------------------------------------------------

# (field name, Spark type of Value) — the reference schema's field list
OPCAE_CONDITION_FIELDS: list[tuple[str, str]] = [
    ("ConditionId", "string"),
    ("AckedState", "string"),
    ("AckedState/FalseState", "string"),
    ("AckedState/Id", "boolean"),
    ("AckedState/TrueState", "string"),
    ("ActiveState", "string"),
    ("ActiveState/FalseState", "string"),
    ("ActiveState/Id", "boolean"),
    ("ActiveState/TrueState", "string"),
    ("EnabledState", "string"),
    ("EnabledState/FalseState", "string"),
    ("EnabledState/Id", "boolean"),
    ("EnabledState/TrueState", "string"),
    ("EventId", "string"),
    ("EventType", "string"),
    ("HighHighLimit", "double"),
    ("HighLimit", "double"),
    ("InputNode", "string"),
    ("LowLimit", "double"),
    ("LowLowLimit", "double"),
    ("Message", "string"),
    ("Quality", "string"),
    ("ReceiveTime", "string"),
    ("Retain", "boolean"),
    ("Severity", "long"),
    ("SourceName", "string"),
    ("SourceNode", "string"),
    ("Time", "string"),
]


def _opcae_schema(fields: list[tuple[str, str]]) -> T.StructType:
    cond = T.StructType(
        [
            T.StructField(
                name,
                T.StructType(
                    [
                        T.StructField("Value", getattr(T, "StringType")()
                                      if typ == "string" else
                                      T.BooleanType() if typ == "boolean" else
                                      T.DoubleType() if typ == "double" else
                                      T.LongType()),
                        T.StructField("SourceTimestamp", T.TimestampType()),
                    ]
                ),
            )
            for name, typ in fields
        ]
    )
    return T.StructType(
        [
            T.StructField("NodeId", T.StringType()),
            T.StructField("EndpointUrl", T.StringType()),
            T.StructField("DisplayName", T.StringType()),
            T.StructField("Value", cond),
        ]
    )


def opcae_json_to_rows(
    df: DataFrame,
    source_col: str = "body",
    fields: list[tuple[str, str]] | None = None,
    where: str | None = None,
    timestamp_formats: list[str] | None = None,
) -> DataFrame:
    """OPC Publisher A&E JSON -> flat alarm/event rows
    (opc_publisher_opcae_json_to_pcdm.py:102-170): the message body is a
    JSON array of condition-event strings; explode it, parse each with the
    declared schema, flatten every condition field's .Value, and parse
    Value.Time through the multi-format ladder into EventTime. ``where``
    applies the reference's optional pre-parse filter on the raw event
    string."""
    fields = fields or OPCAE_CONDITION_FIELDS
    fmts = timestamp_formats or _TS_FORMATS
    ev = df.withColumn(
        "__e", F.explode(F.from_json(F.col(source_col).cast("string"), "array<string>"))
    )
    if where is not None:
        ev = ev.where(where)
    ev = ev.withColumn("__m", F.from_json(F.col("__e"), _opcae_schema(fields)))
    cols = [F.col("__m.NodeId").alias("NodeId"), F.col("__m.DisplayName").alias("DisplayName")]
    for name, _ in fields:
        if name == "Time":
            continue
        cols.append(F.col("__m.Value").getField(name).getField("Value").alias(name))
    time_raw = F.col("__m.Value").getField("Time").getField("Value")
    ts = F.coalesce(*[F.try_to_timestamp(time_raw, F.lit(f)) for f in fmts])
    return ev.select(*cols, ts.alias("EventTime"))


# ---------------------------------------------------------------------------
# OPC UA pub-sub envelope (opcua_json_to_pcdm.py:89-114; OPCUA_SCHEMA,
# _pipeline_utils/spark.py:724-742): a doubly-encoded body — the outer JSON
# carries a Messages field that is itself a JSON array of DataSet messages,
# each with a Payload map of node-id -> {Value}.
# ---------------------------------------------------------------------------
OPCUA_MESSAGES_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("DataSetWriterId", T.LongType()),
            T.StructField("Timestamp", T.TimestampType()),
            T.StructField(
                "Payload",
                T.MapType(
                    T.StringType(),
                    T.StructType([T.StructField("Value", T.StringType())]),
                ),
            ),
        ]
    )
)


def opcua_json_to_pcdm(
    df: DataFrame,
    source_col: str = "body",
    status_null_value: str = "Good",
    change_type_value: str = "insert",
) -> DataFrame:
    """OPC UA pub-sub JSON -> PCDM (opcua_json_to_pcdm.py:89-114): unwrap
    the double encoding (outer `Messages STRING`, inner message array),
    inline the messages, explode each Payload map to (TagName, Value) rows
    stamped with the message Timestamp; ValueType by float-cast probe —
    all in one projection chain, no UDF."""
    outer = F.from_json(F.col(source_col).cast("string"), "Messages STRING")
    msgs = F.from_json(outer.getField("Messages"), OPCUA_MESSAGES_SCHEMA)
    rows = (
        df.select(F.explode(msgs).alias("m"))
        .select(F.col("m.Timestamp").alias("EventTime"), F.explode("m.Payload"))
        .select("EventTime", F.col("key").alias("TagName"), F.col("value.Value").alias("Value"))
    )
    return rows.select(
        "EventTime",
        "TagName",
        F.lit(status_null_value).alias("Status"),
        "Value",
        # try_cast probe (the reference's plain cast, opcua_json_to_pcdm.py:104,
        # predates ANSI mode and would now throw on non-numeric values)
        F.when(F.expr("try_cast(Value as float)").isNotNull(), "float")
        .otherwise("string")
        .alias("ValueType"),
        F.lit(change_type_value).alias("ChangeType"),
    )


# Mirico metadata envelope (mirico_json_to_metadata.py:85-119; schema at
# _pipeline_utils/spark.py:744-756).
MIRICO_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("retroName", T.StringType()),
        T.StructField("siteName", T.StringType()),
        T.StructField("retroAltitude", T.FloatType()),
        T.StructField("sensorAltitude", T.FloatType()),
        T.StructField("retroLongitude", T.FloatType()),
        T.StructField("gasType", T.StringType()),
        T.StructField("sensorLatitude", T.FloatType()),
        T.StructField("retroLatitude", T.FloatType()),
        T.StructField("sensorLongitude", T.FloatType()),
    ]
)


def mirico_json_to_metadata(df: DataFrame, source_col: str = "body") -> DataFrame:
    """Mirico JSON -> metadata rows (mirico_json_to_metadata.py:85-119):
    TagName = SITE_RETRO_GAS (upper-cased), empty Description/UoM, and the
    six geo fields packed into a Properties struct; one row per TagName."""
    body = F.from_json(F.col(source_col).cast("string"), MIRICO_METADATA_SCHEMA)
    tag = F.concat_ws(
        "_",
        F.upper(body.getField("siteName")),
        F.upper(body.getField("retroName")),
        F.upper(body.getField("gasType")),
    )
    props = F.struct(
        body.getField("retroAltitude").alias("retroAltitude"),
        body.getField("retroLongitude").alias("retroLongitude"),
        body.getField("retroLatitude").alias("retroLatitude"),
        body.getField("sensorAltitude").alias("sensorAltitude"),
        body.getField("sensorLongitude").alias("sensorLongitude"),
        body.getField("sensorLatitude").alias("sensorLatitude"),
    )
    return df.select(
        tag.alias("TagName"),
        F.lit("").alias("Description"),
        F.lit("").alias("UoM"),
        props.alias("Properties"),
    ).dropDuplicates(["TagName"])


# SSIP PI JSON envelope (ssip_pi_binary_json_to_pcdm.py:100-211): each
# message body is one JSON event; transport properties carry PointType and
# the CDC Action verb.
SSIP_JSON_SCHEMA = T.StructType(
    [
        T.StructField("TagName", T.StringType()),
        T.StructField("EventTime", T.StringType()),
        T.StructField("Quality", T.StringType()),
        T.StructField("Value", T.StringType()),
    ]
)

_SSIP_POINT_TYPE_TO_VALUE_TYPE = {
    "Digital": "string",
    "String": "string",
    "Float16": "float",
    "Float32": "float",
    "Float64": "float",
    "Int16": "integer",
    "Int32": "integer",
}

_SSIP_ACTION_TO_CHANGE_TYPE = {
    "Insert": "insert",
    "Add": "insert",
    "Delete": "delete",
    "Update": "update",
    "Refresh": "update",
}


def ssip_json_to_pcdm(
    df: DataFrame,
    source_col: str = "body",
    properties_col: str = "properties",
    metadata_df: DataFrame | None = None,
) -> DataFrame:
    """SSIP PI JSON -> PCDM (ssip_pi_binary_json_to_pcdm.py:100-211).

    Semantics preserved: PointType from the transport properties map with a
    metadata-table fallback (left join), PointType -> ValueType mapping with
    try_cast demotion to 'string' when the value doesn't actually parse, and
    the Action -> ChangeType verb map. Re-expressed as ONE from_json parse
    (the reference runs five separate get_json_object passes over the same
    string, i.e. 5x the JSON parsing work per row) and literal CASE maps;
    the metadata join broadcasts (per-tag dimension, SURVEY §2.3).
    """
    body = F.from_json(F.col(source_col).cast("string"), SSIP_JSON_SCHEMA)
    props = F.col(properties_col)
    base = df.select(
        body.getField("EventTime").cast("date").alias("EventDate"),
        body.getField("TagName").alias("TagName"),
        body.getField("EventTime").cast("timestamp").alias("EventTime"),
        body.getField("Quality").alias("Status"),
        body.getField("Value").alias("Value"),
        F.element_at(props, "PointType").alias("PointType"),
        F.element_at(props, "Action").cast("string").alias("Action"),
    )
    if metadata_df is not None:
        meta = F.broadcast(
            metadata_df.select("TagName", F.col("PointType").alias("__meta_pt"))
        )
        base = base.join(meta, "TagName", "left").withColumn(
            "PointType", F.coalesce("PointType", "__meta_pt")
        )
    vt = F.lit("string")
    for pt, v in reversed(_SSIP_POINT_TYPE_TO_VALUE_TYPE.items()):
        vt = F.when(F.col("PointType") == pt, v).otherwise(vt)
    ct = F.lit(None).cast("string")
    for a, v in reversed(_SSIP_ACTION_TO_CHANGE_TYPE.items()):
        ct = F.when(F.col("Action") == a, v).otherwise(ct)
    typed = base.withColumn("ValueType", vt)
    # try_cast demotion: declared numeric but unparseable -> 'string'
    # (reference lines 176-195, Value_Integer/Value_Float probe columns)
    typed = typed.withColumn(
        "ValueType",
        F.when(
            (F.col("ValueType") == "integer")
            & F.expr("try_cast(Value as integer)").isNull(),
            "string",
        )
        .when(
            (F.col("ValueType") == "float")
            & F.expr("try_cast(Value as float)").isNull(),
            "string",
        )
        .otherwise(F.col("ValueType")),
    )
    return typed.select(
        "EventDate", "TagName", "EventTime", "Status", "Value", "ValueType",
        ct.alias("ChangeType"),
    )


WEATHER_DATA_MODEL = T.StructType(
    [
        T.StructField("Latitude", T.DoubleType(), False),
        T.StructField("Longitude", T.DoubleType(), False),
        T.StructField("WeatherDay", T.StringType(), False),
        T.StructField("WeatherHour", T.IntegerType(), False),
        T.StructField("WeatherTimezoneOffset", T.StringType(), False),
        T.StructField("WeatherType", T.StringType(), False),
        T.StructField("ProcessedDate", T.TimestampType(), False),
        T.StructField("Temperature", T.DoubleType(), True),
        T.StructField("DewPoint", T.DoubleType(), True),
        T.StructField("Humidity", T.DoubleType(), True),
        T.StructField("HeatIndex", T.DoubleType(), True),
        T.StructField("WindChill", T.DoubleType(), True),
        T.StructField("WindDirection", T.DoubleType(), True),
        T.StructField("WindSpeed", T.DoubleType(), True),
        T.StructField("CloudCover", T.DoubleType(), True),
        T.StructField("WetBulbTemp", T.StringType(), True),
        T.StructField("SolarIrradiance", T.StringType(), True),
        T.StructField("Precipitation", T.DoubleType(), True),
        T.StructField("DayOrNight", T.StringType(), True),
        T.StructField("DayOfWeek", T.StringType(), True),
        T.StructField("WindGust", T.IntegerType(), True),
        T.StructField("MslPressure", T.DoubleType(), True),
        T.StructField("ForecastDayNum", T.IntegerType(), True),
        T.StructField("PropOfPrecip", T.IntegerType(), True),
        T.StructField("PrecipType", T.StringType(), True),
        T.StructField("SnowAccumulation", T.DoubleType(), True),
        T.StructField("UvIndex", T.DoubleType(), True),
        T.StructField("Visibility", T.DoubleType(), True),
    ]
)

# raw forecast column -> weather data model column (raw_forecast_to_weather_
# data_model.py:100-125 withColumnRenamed chain)
_WEATHER_RENAMES = {
    "Temperature": "Temp", "DewPoint": "Dewpt", "Humidity": "Rh",
    "HeatIndex": "Hi", "WindChill": "Wc", "WindDirection": "Wdir",
    "WindSpeed": "Wspd", "CloudCover": "Clds", "Precipitation": "Qpf",
    "DayOrNight": "DayInd", "DayOfWeek": "Dow", "WindGust": "Gust",
    "MslPressure": "Mslp", "ForecastDayNum": "Num", "PropOfPrecip": "Pop",
    "PrecipType": "PrecipType", "SnowAccumulation": "SnowQpf",
    "UvIndex": "UvIndex", "Visibility": "Vis",
}


def raw_forecast_to_weather_data_model(
    df: DataFrame, processed_date: str
) -> DataFrame:
    """the_weather_company raw hourly forecast -> WEATHER_DATA_MODEL rows
    (transformers/spark/the_weather_company/raw_forecast_to_weather_data_model
    .py:80-156).

    Semantics kept: WeatherDay/Hour/TimezoneOffset carved out of the
    ``FcstValidLocal`` local-time string (:84-92; hour is 1-based),
    WeatherType='F', the rename chain (:100-125), ''->NULL scrub (:128-132),
    and the final cast to the declared model types (:59-69).

    Divergences: ONE cast-typed ``select`` instead of ~25 ``withColumn``s
    followed by ``spark.createDataFrame(df.rdd, schema)`` — that rdd
    round-trip materializes every row through Python serialization and
    discards the Catalyst lineage (no pushdown through it), where a plain
    projection keeps whole-stage codegen; and ``processed_date`` is an
    explicit argument instead of ``datetime.now()`` (:144) so replays are
    byte-identical.
    """
    scrubbed = {}
    for f in WEATHER_DATA_MODEL.fields:
        src = _WEATHER_RENAMES.get(f.name, f.name)
        if src in df.columns:
            c = F.col(src).cast("string")
            scrubbed[f.name] = F.when(c == "", None).otherwise(c).cast(f.dataType)
    fcst = F.col("FcstValidLocal").cast("string")
    return df.select(
        scrubbed["Latitude"].alias("Latitude"),
        scrubbed["Longitude"].alias("Longitude"),
        F.substring(fcst, 1, 10).alias("WeatherDay"),
        (F.substring(fcst, 12, 2).cast("int") + F.lit(1)).alias("WeatherHour"),
        F.substring(fcst, 20, 5).alias("WeatherTimezoneOffset"),
        F.lit("F").alias("WeatherType"),
        F.lit(processed_date).cast("timestamp").alias("ProcessedDate"),
        *[
            scrubbed.get(f.name, F.lit(None).cast(f.dataType)).alias(f.name)
            for f in WEATHER_DATA_MODEL.fields[7:]
        ],
    )
