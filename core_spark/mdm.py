"""Meters Data Model (MDM) mapping family.

Reference: transformers/spark/base_raw_to_mdm.py:26-257 plus the four ISO
specializations (iso/{miso,pjm,caiso,ercot}_to_mdm.py). The reference
builds the output via ~14 chained ``withColumn(expr(...))`` calls and then
round-trips the frame through ``spark.createDataFrame(df.rdd, schema)``
(base_raw_to_mdm.py:140-153) — the RDD hop deserializes every row into
Python and back, destroying column pruning, pushdown, and codegen.

Here the whole mapping is ONE ``select`` of SQL expressions cast to the
target schema — a projection Catalyst fuses into the scan — and the
per-ISO variants are declarative ``MdmSpec`` presets, not subclasses.
The unpivot uses Spark's native ``DataFrame.unpivot`` (codegen'd Expand)
instead of the reference's explode-of-struct-array melt
(_pipeline_utils/iso.py:104-133).

Enum literal values (data_models/timeseries.py IntFlag members):
ModelType.Default=1, SeriesType.Hour=64, ValueType.Usage=16.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MDM_USAGE_SCHEMA = T.StructType(
    [
        T.StructField("Uid", T.StringType()),
        T.StructField("SeriesId", T.StringType()),
        T.StructField("Timestamp", T.TimestampType()),
        T.StructField("IntervalTimestamp", T.TimestampType()),
        T.StructField("Value", T.DoubleType()),
    ]
)

MDM_META_SCHEMA = T.StructType(
    [
        T.StructField("Uid", T.StringType()),
        T.StructField("SeriesId", T.StringType()),
        T.StructField("SeriesParentId", T.StringType()),
        T.StructField("Name", T.StringType()),
        T.StructField("Uom", T.StringType()),
        T.StructField("Description", T.StringType()),
        T.StructField("TimestampStart", T.TimestampType()),
        T.StructField("TimestampEnd", T.TimestampType()),
        T.StructField("Timezone", T.StringType()),
        T.StructField("Version", T.StringType()),
        T.StructField("SeriesType", T.IntegerType()),
        T.StructField("ModelType", T.IntegerType()),
        T.StructField("ValueType", T.IntegerType()),
        T.StructField("Properties", T.MapType(T.StringType(), T.StringType())),
    ]
)

# IntFlag values from the reference's data_models/timeseries.py
SERIES_TYPE_HOUR = 64
MODEL_TYPE_DEFAULT = 1
VALUE_TYPE_USAGE = 16


def melt(
    df: DataFrame,
    id_vars: list[str],
    value_vars: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide -> tall unpivot (reference _pipeline_utils/iso.py:104-133),
    via the native unpivot operator (one Expand node, stays in codegen)."""
    return df.unpivot(id_vars, value_vars, var_name, value_name)


@dataclass
class MdmSpec:
    """Declarative column-expression mapping for one raw feed -> MDM.

    Every *_expr is a Spark SQL expression string evaluated over the
    (optionally pre-processed) input — same contract as the reference's
    class attributes (e.g. pjm_to_mdm.py:57-75), minus the subclassing.
    """

    uid: str
    timestamp: str
    value: str
    timestamp_start: str
    timestamp_end: str
    time_zone: str
    name: str
    description: str
    interval: str = "INTERVAL 1 HOURS"  # IntervalTimestamp = Timestamp + interval
    series_id: str = "'series_std_001'"
    series_parent_id: str = "'series_parent_std_001'"
    uom: str = "'mwh'"
    version: str = "'1'"
    series_type: int = SERIES_TYPE_HOUR
    model_type: int = MODEL_TYPE_DEFAULT
    value_type: int = VALUE_TYPE_USAGE
    properties: str = "null"
    # wide feeds unpivot first: (id_vars, value_vars)
    melt_ids: list = field(default_factory=list)
    melt_values: list = field(default_factory=list)
    # extra derived columns computed after the melt, before the mapping
    pre_exprs: dict = field(default_factory=dict)

    def pre_process(self, df: DataFrame) -> DataFrame:
        if self.melt_values:
            df = melt(df, self.melt_ids, self.melt_values)
        for name, expr in self.pre_exprs.items():
            df = df.withColumn(name, F.expr(expr))
        return df


def _cast_select(df: DataFrame, named: dict[str, object], schema: T.StructType) -> DataFrame:
    cols = [
        F.expr(named[f.name]).cast(f.dataType).alias(f.name)
        if isinstance(named[f.name], str)
        else named[f.name].cast(f.dataType).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)


def raw_to_mdm(df: DataFrame, spec: MdmSpec, output_type: str = "usage") -> DataFrame:
    """Map a raw feed to MDM `usage` or `meta` rows (reference
    base_raw_to_mdm.py:157-257), as one cast-typed projection."""
    if output_type not in ("usage", "meta"):
        raise ValueError(
            f"Invalid output_type `{output_type}` given. Must be one of ['usage', 'meta']"
        )
    df = spec.pre_process(df)
    if output_type == "usage":
        named = {
            "Uid": spec.uid,
            "SeriesId": spec.series_id,
            "Timestamp": spec.timestamp,
            # the reference computes IntervalTimestamp from the already-mapped
            # Timestamp column (`Timestamp + INTERVAL 1 HOURS`); inline the
            # timestamp expression so this stays one projection
            "IntervalTimestamp": f"({spec.timestamp}) + {spec.interval}",
            "Value": spec.value,
        }
        return _cast_select(df, named, MDM_USAGE_SCHEMA)
    named = {
        "Uid": spec.uid,
        "SeriesId": spec.series_id,
        "SeriesParentId": spec.series_parent_id,
        "Name": spec.name,
        "Uom": spec.uom,
        "Description": spec.description,
        "TimestampStart": spec.timestamp_start,
        "TimestampEnd": spec.timestamp_end,
        "Timezone": spec.time_zone,
        "Version": spec.version,
        "SeriesType": F.lit(spec.series_type),
        "ModelType": F.lit(spec.model_type),
        "ValueType": F.lit(spec.value_type),
        "Properties": spec.properties,
    }
    return _cast_select(df, named, MDM_META_SCHEMA)


# ---------------------------------------------------------------- ISO presets
# Expressions match the reference specializations line-for-line (cited).

# pjm_to_mdm.py:59-75: input (StartTime, EndTime, Zone, Load)
PJM_SPEC = MdmSpec(
    uid="Zone",
    timestamp="to_utc_timestamp(StartTime, 'America/New_York')",
    value="bround(Load, 2)",
    timestamp_start="StartTime",
    timestamp_end="StartTime + INTERVAL 1 HOURS",
    time_zone="'America/New_York'",
    name="'PJM API'",
    description="'PJM data pulled from PJM ISO API'",
)

# miso_to_mdm.py:55-95: wide zones melt to (Datetime, variable, value)
MISO_SPEC = MdmSpec(
    uid="variable",
    timestamp="to_utc_timestamp(Datetime, 'US/Central')",
    value="bround(value, 2)",
    timestamp_start="Datetime",
    timestamp_end="Datetime + INTERVAL 1 HOURS",
    time_zone="'US/Central'",
    name="'Miso API'",
    description="'Miso data pulled from Miso ISO API'",
    melt_ids=["Datetime"],
    melt_values=["Lrz1", "Lrz2_7", "Lrz3_5", "Lrz4", "Lrz6", "Lrz8_9_10", "Miso"],
)

# caiso_to_mdm.py:54-72: tall feed, PST labels, local timestamps kept
CAISO_SPEC = MdmSpec(
    uid="TacAreaName",
    timestamp="to_timestamp(StartTime)",
    value="Load",
    timestamp_start="StartTime",
    timestamp_end="StartTime + INTERVAL 1 HOURS",
    time_zone="'PST'",
    name="'CAISO API'",
    description="'CAISO data pulled from CAISO ISO API'",
)

# ercot_to_mdm.py:54-97: wide zones melt + StartTime from Date + HourEnding
ERCOT_SPEC = MdmSpec(
    uid="variable",
    timestamp="to_utc_timestamp(StartTime, 'America/Chicago')",
    value="value",
    timestamp_start="StartTime",
    timestamp_end="StartTime + INTERVAL 1 HOURS",
    time_zone="'America/Chicago'",
    name="'ERCOT API'",
    description="'ERCOT data pulled from ERCOT ISO API'",
    melt_ids=["Date", "HourEnding", "DstFlag"],
    melt_values=[
        "Coast",
        "East",
        "FarWest",
        "North",
        "NorthCentral",
        "SouthCentral",
        "Southern",
        "West",
        "SystemTotal",
    ],
    pre_exprs={
        "StartTime": (
            "Date + MAKE_INTERVAL(0,0,0,0,"
            "cast(split(HourEnding,':')[0] as integer),0,0)"
        )
    },
)
