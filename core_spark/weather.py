"""Weather forecast query builder (reference queries/weather/*).

The reference's ``WeatherQueryBuilder`` (weather_query_builder.py:24-347)
renders four Jinja SQL templates (_weather_query_builder.py:80-186) against a
forecast events table: ``raw_point`` / ``raw_grid`` (time-range +
forecast-run-range + spatial predicates) and ``latest_point`` /
``latest_grid`` (spatial predicates only, against the ``*_latest`` companion
table). Here each verb is the equivalent declarative DataFrame program, so
every predicate is a Catalyst filter that reaches the parquet/Iceberg scan
(lat/lon/timestamp row-group pruning — at 100 TB the spatial predicates are
the partition/file pruners, which generated SQL text can't guarantee when the
warehouse lacks the matching layout).

Semantics kept bit-for-bit from the templates:

- raw verbs: ``timestamp BETWEEN start AND end`` (inclusive both ends) AND
  ``forecast_run_timestamp BETWEEN .. AND ..`` (:88-90);
- grid verbs: strict bounds ``lat > min AND lat < max`` (:91-94);
- point verbs: exact equality on lat/lon (:131-132);
- measurement: ``TagName LIKE '%_<measurement>'`` — the SQL ``_`` wildcard
  (any one char) is preserved (:95-97);
- output: ``SELECT *`` ordered by tagname, optional LIMIT (:98-102).

Deliberate divergences:
- the reference wraps the LIKE pattern in backticks (:96), producing a
  column reference instead of a string literal — a latent bug; we use the
  intended string literal;
- ``latest_*`` verbs take the latest table as the builder's source instead
  of string-mangling a ``_latest`` suffix onto a catalog name — the caller
  owns naming (and our `operators.timeseries.latest` materializes such a
  table from raw events).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


class WeatherQueryBuilder:
    """Fluent builder for forecast queries; the SparkSession is the
    connection (reference WeatherQueryBuilder.connect, :40-48)."""

    def __init__(self) -> None:
        self.spark: SparkSession | None = None
        self._source: DataFrame | str | None = None
        self.tagname_column = "TagName"
        self.timestamp_column = "EventTime"
        self.forecast_run_timestamp_column = "EnqueuedTime"
        self.status_column: str | None = "Status"
        self.value_column = "Value"
        self.latitude_column = "Latitude"
        self.longitude_column = "Longitude"

    def connect(self, connection: SparkSession) -> "WeatherQueryBuilder":
        self.spark = connection
        return self

    def source(
        self,
        source: DataFrame | str,
        tagname_column: str = "TagName",
        timestamp_column: str = "EventTime",
        forecast_run_timestamp_column: str = "EnqueuedTime",
        status_column: str | None = "Status",
        value_column: str = "Value",
        latitude_column: str = "Latitude",
        longitude_column: str = "Longitude",
    ) -> "WeatherQueryBuilder":
        """Bind the forecast table (DataFrame, table name, or path) and its
        column mapping (reference :50-76)."""
        self._source = source
        self.tagname_column = tagname_column
        self.timestamp_column = timestamp_column
        self.forecast_run_timestamp_column = forecast_run_timestamp_column
        self.status_column = status_column
        self.value_column = value_column
        self.latitude_column = latitude_column
        self.longitude_column = longitude_column
        return self

    # -- internals ---------------------------------------------------------

    def _frame(self) -> DataFrame:
        if isinstance(self._source, DataFrame):
            return self._source
        if self.spark is None or self._source is None:
            raise ValueError("call .connect(spark) and .source(...) first")
        if "/" in self._source:
            return self.spark.read.parquet(self._source)
        return self.spark.table(self._source)

    def _time_filters(
        self, df: DataFrame, start: str, end: str, run_start: str, run_end: str
    ) -> DataFrame:
        ts = F.col(self.timestamp_column)
        rts = F.col(self.forecast_run_timestamp_column)
        return df.filter(
            ts.between(F.to_timestamp(F.lit(start)), F.to_timestamp(F.lit(end)))
            & rts.between(F.to_timestamp(F.lit(run_start)), F.to_timestamp(F.lit(run_end)))
        )

    def _point(self, df: DataFrame, lat: float, lon: float) -> DataFrame:
        return df.filter(
            (F.col(self.latitude_column) == F.lit(lat))
            & (F.col(self.longitude_column) == F.lit(lon))
        )

    def _grid(
        self, df: DataFrame, min_lat: float, max_lat: float, min_lon: float, max_lon: float
    ) -> DataFrame:
        lat, lon = F.col(self.latitude_column), F.col(self.longitude_column)
        return df.filter(
            (lat > F.lit(min_lat)) & (lat < F.lit(max_lat))
            & (lon > F.lit(min_lon)) & (lon < F.lit(max_lon))
        )

    def _finish(self, df: DataFrame, measurement: str | None, limit: int | None) -> DataFrame:
        if measurement is not None:
            df = df.filter(F.col(self.tagname_column).like(f"%_{measurement}"))
        df = df.orderBy(self.tagname_column)
        if limit is not None:
            # orderBy+limit collapses to TakeOrderedAndProject — no global sort
            # materialization at scale.
            df = df.limit(limit)
        return df

    # -- verbs -------------------------------------------------------------

    def raw_point(
        self,
        start_date: str,
        end_date: str,
        forecast_run_start_date: str,
        forecast_run_end_date: str,
        lat: float,
        lon: float,
        limit: int | None = None,
        measurement: str | None = None,
    ) -> DataFrame:
        """Raw forecast rows at one station/cell (reference :78-140)."""
        df = self._time_filters(
            self._frame(), start_date, end_date,
            forecast_run_start_date, forecast_run_end_date,
        )
        return self._finish(self._point(df, lat, lon), measurement, limit)

    def raw_grid(
        self,
        start_date: str,
        end_date: str,
        forecast_run_start_date: str,
        forecast_run_end_date: str,
        min_lat: float,
        max_lat: float,
        min_lon: float,
        max_lon: float,
        limit: int | None = None,
        measurement: str | None = None,
    ) -> DataFrame:
        """Raw forecast rows inside a strict bounding box (reference :142-216)."""
        df = self._time_filters(
            self._frame(), start_date, end_date,
            forecast_run_start_date, forecast_run_end_date,
        )
        return self._finish(
            self._grid(df, min_lat, max_lat, min_lon, max_lon), measurement, limit
        )

    def latest_point(
        self,
        lat: float,
        lon: float,
        limit: int | None = None,
        measurement: str | None = None,
    ) -> DataFrame:
        """Latest forecast at one station/cell; source is the latest table
        (reference :218-280)."""
        return self._finish(self._point(self._frame(), lat, lon), measurement, limit)

    def latest_grid(
        self,
        min_lat: float,
        max_lat: float,
        min_lon: float,
        max_lon: float,
        limit: int | None = None,
        measurement: str | None = None,
    ) -> DataFrame:
        """Latest forecast inside a strict bounding box (reference :282-347)."""
        return self._finish(
            self._grid(self._frame(), min_lat, max_lat, min_lon, max_lon),
            measurement, limit,
        )
