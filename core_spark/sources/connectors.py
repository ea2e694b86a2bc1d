"""Source/sink connector builders — the engine's answer to the reference's
pipelines/sources/spark/* and destinations/spark/* component classes
(SURVEY §2.1). Each builder owns the format string, option mapping, and
projection its transport needs, and exposes

    read_batch(spark) / read_stream(spark) -> DataFrame
    write_batch(df)   / write_stream(df, checkpoint) -> query

Connector jars (kafka, iceberg, delta) are not present in this sandbox, so
anything that would contact a broker raises a clear error at .start() time,
while the *builder* layer — option plumbing, payload projections, schema
declarations — is unit-tested offline (the same strategy the reference's
mocked connector tests use, SURVEY §5.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KafkaSource:
    """reference pipelines/sources/spark/kafka.py:25 — format('kafka')."""

    bootstrap_servers: str
    topic: str
    starting_offsets: str = "earliest"
    extra_options: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
            **self.extra_options,
        }

    def read_stream(self, spark: SparkSession) -> DataFrame:
        r = spark.readStream.format("kafka")
        for k, v in self.options().items():
            r = r.option(k, v)
        return r.load()

    def read_batch(self, spark: SparkSession) -> DataFrame:
        r = spark.read.format("kafka")
        for k, v in self.options().items():
            r = r.option(k, v)
        return r.load()


@dataclass
class EventhubKafkaSource:
    """Eventhub via the Kafka protocol (kafka_eventhub.py:48,327-335):
    SASL-configured kafka source + body/properties projection."""

    namespace: str
    eventhub: str
    connection_string: str
    extra_options: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        jaas = (
            "kafkashaded.org.apache.kafka.common.security.plain.PlainLoginModule "
            f'required username="$ConnectionString" password="{self.connection_string}";'
        )
        return {
            "kafka.bootstrap.servers": f"{self.namespace}.servicebus.windows.net:9093",
            "subscribe": self.eventhub,
            "kafka.sasl.mechanism": "PLAIN",
            "kafka.security.protocol": "SASL_SSL",
            "kafka.sasl.jaas.config": jaas,
            **self.extra_options,
        }

    @staticmethod
    def project_body(df: DataFrame) -> DataFrame:
        """kafka envelope -> eventhub shape: value->body, kafka timestamp ->
        enqueuedTime (kafka_eventhub.py body projection)."""
        return df.select(
            F.col("value").alias("body"),
            F.col("timestamp").alias("enqueuedTime"),
            F.col("partition").cast("string").alias("partitionId"),
            F.col("offset").cast("string").alias("sequenceNumber"),
        )


@dataclass
class FileStreamSource:
    """Incremental file ingest — the OSS stand-in for Autoloader
    (autoloader.py:23): schema-declared directory stream."""

    path: str
    fmt: str = "parquet"
    schema_ddl: str | None = None
    max_files_per_trigger: int | None = None

    def read_stream(self, spark: SparkSession) -> DataFrame:
        r = spark.readStream
        if self.schema_ddl:
            r = r.schema(self.schema_ddl)
        if self.max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        return r.format(self.fmt).load(self.path)

    def read_batch(self, spark: SparkSession) -> DataFrame:
        r = spark.read
        if self.schema_ddl:
            r = r.schema(self.schema_ddl)
        return r.format(self.fmt).load(self.path)


@dataclass
class TableSource:
    """Catalog-table source (delta.py:24,122,140 / Iceberg equivalent):
    time-travel & snapshot options pass through."""

    table: str
    fmt: str = "iceberg"
    options_: dict[str, str] = field(default_factory=dict)

    def read_batch(self, spark: SparkSession) -> DataFrame:
        r = spark.read.format(self.fmt)
        for k, v in self.options_.items():
            r = r.option(k, v)
        return r.table(self.table)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        r = spark.readStream.format(self.fmt)
        for k, v in self.options_.items():
            r = r.option(k, v)
        return r.table(self.table)


@dataclass
class KafkaSink:
    """destinations/spark/kafka.py:120,139 — key/value serialization plus
    writeStream.format('kafka')."""

    bootstrap_servers: str
    topic: str

    def options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
        }

    @staticmethod
    def serialize(df: DataFrame, key_col: str, value_cols: list[str]) -> DataFrame:
        return df.select(
            F.col(key_col).cast("string").alias("key"),
            F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("value"),
        )

    def write_stream(self, df: DataFrame, checkpoint: str):
        w = df.writeStream.format("kafka").option("checkpointLocation", checkpoint)
        for k, v in self.options().items():
            w = w.option(k, v)
        return w.start()


@dataclass
class RestSink:
    """destinations/spark/rest_api.py:39,226,240 — micro-batched HTTP POST.

    Differences from the reference, on purpose: the reference re-enters the
    driver per micro-batch and POSTs from a driver-side thread pool; here
    rows are serialized and POSTed from the EXECUTORS (``foreachPartition``),
    packed ``batch_size`` rows per request — the only shape that survives a
    wide cluster (the driver never sees the data). The transport is an
    injectable ``poster(payload_json) -> status`` so the connector logic is
    testable offline (no HTTP in this sandbox); the default transport is a
    stdlib urllib POST constructed lazily on the executor.
    """

    url: str
    batch_size: int = 100
    method: str = "POST"
    headers: dict[str, str] = field(default_factory=dict)
    poster: object | None = None  # Callable[[str], int]; None => urllib

    def _poster(self):
        if self.poster is not None:
            return self.poster
        url, headers, method = self.url, dict(self.headers), self.method

        def post(payload: str) -> int:
            import urllib.request

            req = urllib.request.Request(
                url,
                data=payload.encode("utf-8"),
                method=method,
                headers={"Content-Type": "application/json", **headers},
            )
            with urllib.request.urlopen(req) as resp:  # noqa: S310 (configured URL)
                return resp.status

        return post

    def write_batch(self, df: DataFrame) -> None:
        post, bs = self._poster(), self.batch_size

        def send(rows) -> None:
            import json

            buf = []
            for r in rows:
                buf.append(r.asDict(recursive=True))
                if len(buf) >= bs:
                    post(json.dumps(buf, default=str))
                    buf = []
            if buf:
                post(json.dumps(buf, default=str))

        df.foreachPartition(send)

    def write_stream(self, df: DataFrame, checkpoint: str, available_now: bool = True):
        w = (
            df.writeStream.foreachBatch(lambda b, _id: self.write_batch(b))
            .option("checkpointLocation", checkpoint)
        )
        w = w.trigger(availableNow=True) if available_now else w
        return w.start()


@dataclass
class KinesisSource:
    """reference pipelines/sources/spark/kinesis.py:23 — format('kinesis')
    with the standard stream/region/position options; payload arrives as
    ``data:binary + approximateArrivalTimestamp`` (KINESIS_SCHEMA,
    _pipeline_utils/spark.py:600-608)."""

    stream_name: str
    region: str
    initial_position: str = "earliest"
    extra_options: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        return {
            "streamName": self.stream_name,
            "region": self.region,
            "initialPosition": self.initial_position,
            **self.extra_options,
        }

    def read_stream(self, spark: SparkSession) -> DataFrame:
        r = spark.readStream.format("kinesis")
        for k, v in self.options().items():
            r = r.option(k, v)
        return r.load()

    @staticmethod
    def project_body(df: DataFrame) -> DataFrame:
        """kinesis envelope -> engine shape: data->body, arrival ts."""
        return df.select(
            F.col("data").alias("body"),
            F.col("approximateArrivalTimestamp").alias("enqueuedTime"),
            F.col("partitionKey").alias("partitionId"),
            F.col("sequenceNumber").cast("string").alias("sequenceNumber"),
        )


@dataclass
class EventhubSource:
    """reference pipelines/sources/spark/eventhub.py:25,149,172 —
    format('eventhubs') with `eventhubs.*` options. The azure connector jar
    is not in this sandbox; the builder layer (option map, consumer-group /
    starting-position plumbing) is what the engine owns and tests."""

    connection_string: str
    consumer_group: str = "$Default"
    starting_position: str | None = None  # JSON EventPosition string
    extra_options: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        o = {
            "eventhubs.connectionString": self.connection_string,
            "eventhubs.consumerGroup": self.consumer_group,
            **self.extra_options,
        }
        if self.starting_position is not None:
            o["eventhubs.startingPosition"] = self.starting_position
        return o

    def read_stream(self, spark: SparkSession) -> DataFrame:
        r = spark.readStream.format("eventhubs")
        for k, v in self.options().items():
            r = r.option(k, v)
        return r.load()

    def read_batch(self, spark: SparkSession) -> DataFrame:
        r = spark.read.format("eventhubs")
        for k, v in self.options().items():
            r = r.option(k, v)
        return r.load()


@dataclass
class DeltaSharingSource:
    """reference pipelines/sources/spark/delta_sharing.py:24 —
    format('deltaSharing').load('<profile>#<share>.<schema>.<table>')."""

    table_path: str  # "<credentials-file>#<share>.<schema>.<table>"
    options_: dict[str, str] = field(default_factory=dict)

    def read_batch(self, spark: SparkSession) -> DataFrame:
        r = spark.read.format("deltaSharing")
        for k, v in self.options_.items():
            r = r.option(k, v)
        return r.load(self.table_path)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        r = spark.readStream.format("deltaSharing")
        for k, v in self.options_.items():
            r = r.option(k, v)
        return r.load(self.table_path)


@dataclass
class EventhubSink:
    """destinations/spark/eventhub.py:118-161 — rows must present a
    string/binary `body` column (the reference casts or raises, :155-161);
    everything else rides in `eventhubs.*` options."""

    connection_string: str
    extra_options: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        return {
            "eventhubs.connectionString": self.connection_string,
            **self.extra_options,
        }

    @staticmethod
    def serialize(df: DataFrame, value_cols: list[str] | None = None) -> DataFrame:
        """Pack rows into the required `body` column. If `body` already
        exists it is cast to string when not string/binary (the reference's
        coercion rule); otherwise the named columns are JSON-packed."""
        from pyspark.sql import types as _T

        if "body" in df.columns:
            dt = df.schema["body"].dataType
            if not isinstance(dt, (_T.StringType, _T.BinaryType)):
                df = df.withColumn("body", F.col("body").cast("string"))
            return df
        cols = value_cols or df.columns
        return df.select(
            F.to_json(F.struct(*[F.col(c) for c in cols])).alias("body")
        )

    def write_stream(self, df: DataFrame, checkpoint: str):
        w = df.writeStream.format("eventhubs").option("checkpointLocation", checkpoint)
        for k, v in self.options().items():
            w = w.option(k, v)
        return w.start()

    def write_batch(self, df: DataFrame) -> None:
        w = df.write.format("eventhubs")
        for k, v in self.options().items():
            w = w.option(k, v)
        w.save()


@dataclass
class KinesisSink:
    """destinations/spark/kinesis.py:116-141 — format('kinesis') with a
    (partitionKey, data) record shape."""

    stream_name: str
    region: str
    extra_options: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        return {
            "streamName": self.stream_name,
            "region": self.region,
            **self.extra_options,
        }

    @staticmethod
    def serialize(df: DataFrame, key_col: str, value_cols: list[str]) -> DataFrame:
        return df.select(
            F.col(key_col).cast("string").alias("partitionKey"),
            F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("data"),
        )

    def write_stream(self, df: DataFrame, checkpoint: str):
        w = df.writeStream.format("kinesis").option("checkpointLocation", checkpoint)
        for k, v in self.options().items():
            w = w.option(k, v)
        return w.start()

    def write_batch(self, df: DataFrame) -> None:
        w = df.write.format("kinesis")
        for k, v in self.options().items():
            w = w.option(k, v)
        w.save()
