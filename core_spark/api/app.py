"""Flask WSGI app exposing the engine's query verbs over HTTP.

Route surface = the reference's v1 API (src/api/v1/*.py):

    GET/POST /api/v1/events/raw                          raw.py:73-137
    GET/POST /api/v1/events/resample                     resample.py:81-157
    GET/POST /api/v1/events/plot                         plot.py:78-150
    GET/POST /api/v1/events/interpolate                  interpolate.py:81-157
    GET/POST /api/v1/events/interpolationattime          interpolation_at_time.py:77-149
    GET/POST /api/v1/events/timeweightedaverage          time_weighted_average.py:83-155
    GET/POST /api/v1/events/circularaverage              circular_average.py:81-157
    GET/POST /api/v1/events/circularstandarddeviation    circular_standard_deviation.py:84-160
    GET/POST /api/v1/events/summary                      summary.py:69-137
    GET/POST /api/v1/events/latest                       latest.py:68-128
    GET/POST /api/v1/metadata                            metadata.py:66-126
    POST     /api/v1/sql/execute                         sql.py:78-103
    POST     /api/v1/events/batch                        batch.py:163-188

The reference resolves (business_unit, asset, data_security_level,
data_type) to a warehouse table and ships SQL over ODBC; here the same
base parameters resolve through a ``Catalog`` of Spark sources and the
query runs on the bound SparkSession via ``TimeSeriesQueryBuilder``.
POST bodies carry the tag list (TagsBodyParams), exactly like the
reference's POST variants. Responses use the reference's envelope
(models.json_envelope). Errors surface as HTTP 400 {"detail": ...}
matching the reference's HTTPException rendering; auth is an injectable
callable (the reference's Azure AD dependency, src/api/auth) so tests and
open deployments run without a token issuer.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query_builder import SQLQueryBuilder, TimeSeriesQueryBuilder
from . import models as M

# reference batch.py:30-58 ROUTE_FUNCTION_MAPPING — relative url -> verb
ROUTE_VERBS = {
    "/events/raw": "raw",
    "/events/resample": "resample",
    "/events/plot": "plot",
    "/events/interpolate": "interpolate",
    "/events/interpolationattime": "interpolation_at_time",
    "/events/timeweightedaverage": "time_weighted_average",
    "/events/circularaverage": "circular_average",
    "/events/circularstandarddeviation": "circular_standard_deviation",
    "/events/summary": "summary",
    "/events/percentiles": "percentiles",
    "/events/topk": "top_k",
    "/events/latest": "latest",
    "/metadata": "metadata",
    "/sql/execute": "sql",
}


@dataclass
class SourceBinding:
    """One logical table the API can query: the events source plus its
    column mapping, and optionally a metadata dimension (the reference's
    `{bu}.sensors.{asset}_{level}_events_{type}` / `_metadata` pair)."""

    events: DataFrame | str
    metadata: DataFrame | str | None = None
    tagname_column: str = "TagName"
    timestamp_column: str = "EventTime"
    status_column: str | None = "Status"
    value_column: str = "Value"
    metadata_tagname_column: str = "TagName"
    metadata_uom_column: str = "UoM"
    metadata_step_column: str = "Step"


@dataclass
class Catalog:
    """Maps the reference's base query parameters (business_unit, asset,
    data_security_level, data_type — models.py:231-263) to a SourceBinding.
    A ``default`` binding serves requests that omit the mapping parameters,
    playing the role of the reference's DATABRICKS_SERVING_ENDPOINT lookup
    fallback (common.py:260-330)."""

    bindings: dict[str, SourceBinding] = field(default_factory=dict)

    @staticmethod
    def key(params: dict) -> str | None:
        parts = [
            params.get("business_unit"),
            params.get("asset"),
            params.get("data_security_level"),
            params.get("data_type"),
        ]
        if all(p not in (None, "") for p in parts):
            return ".".join(str(p).lower() for p in parts)
        return None

    def resolve(self, params: dict) -> SourceBinding:
        k = self.key(params)
        if k is not None and k in self.bindings:
            return self.bindings[k]
        if "default" in self.bindings:
            return self.bindings["default"]
        raise ValueError(
            "no source bound for "
            f"{k or 'request without business_unit/asset/data_security_level/data_type'}"
        )


def default_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    """Bind the testdata events table as the default source: tags are
    event types, the value is the measurement, and a derived per-tag
    UoM/Step dimension stands in for the reference's metadata table."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    meta = (
        events.select(F.col("event_type").alias("TagName"))
        .distinct()
        .withColumn("UoM", F.lit("unit"))
        .withColumn("Step", F.lit(False))
    )
    binding = SourceBinding(
        events=events,
        metadata=meta,
        tagname_column="event_type",
        timestamp_column="ts",
        status_column=None,
        value_column="value",
    )
    return Catalog(bindings={"default": binding})


def _tags(params: dict) -> list[str]:
    v = params.get("tag_name")
    if v in (None, ""):
        return []
    if isinstance(v, str):
        return [v]
    return list(v)


def _limit_offset(params: dict) -> tuple[Optional[int], Optional[int]]:
    return (
        M.parse_int(params.get("limit"), "limit"),
        M.parse_int(params.get("offset"), "offset"),
    )


def _builder(spark: SparkSession, b: SourceBinding) -> TimeSeriesQueryBuilder:
    qb = (
        TimeSeriesQueryBuilder()
        .connect(spark)
        .source(
            b.events,
            tagname_column=b.tagname_column,
            timestamp_column=b.timestamp_column,
            status_column=b.status_column,
            value_column=b.value_column,
        )
    )
    if b.metadata is not None:
        qb = qb.m_source(
            b.metadata,
            metadata_tagname_column=b.metadata_tagname_column,
            metadata_uom_column=b.metadata_uom_column,
            metadata_step_column=b.metadata_step_column,
        )
    return qb


def execute_verb(
    spark: SparkSession, catalog: Catalog, verb: str, params: dict
) -> DataFrame:
    """Shared dispatcher behind every route and every /events/batch
    sub-request: reference params -> TimeSeriesQueryBuilder call."""
    if verb == "sql":
        (stmt,) = M.require(params, "sql_statement")
        limit, offset = _limit_offset(params)
        return SQLQueryBuilder().connect(spark).get(stmt, limit=limit, offset=offset)

    b = catalog.resolve(params)
    qb = _builder(spark, b)
    limit, offset = _limit_offset(params)
    tags = _tags(params)
    include_bad = M.parse_bool(params.get("include_bad_data"), default=False)
    pivot = M.parse_bool(params.get("pivot"), default=False)
    display_uom = M.parse_bool(params.get("display_uom"), default=False)

    if verb == "metadata":
        return qb.metadata(tags or None, limit=limit, offset=offset)
    if verb == "latest":
        return qb.latest(tags or None, display_uom=display_uom, limit=limit, offset=offset)

    if verb == "raw":
        start, end = M.require(params, "start_date", "end_date")
        M.require(params, "tag_name")
        return qb.raw(
            tags, start, end, include_bad_data=include_bad,
            display_uom=display_uom, limit=limit, offset=offset,
        )
    if verb == "summary":
        start, end = M.require(params, "start_date", "end_date")
        M.require(params, "tag_name")
        return qb.summary(
            tags, start, end, include_bad_data=include_bad,
            display_uom=display_uom, limit=limit, offset=offset,
        )
    if verb == "percentiles":
        start, end = M.require(params, "start_date", "end_date")
        M.require(params, "tag_name")
        ps = params.get("percentiles") or (0.5, 0.9, 0.95, 0.99)
        if isinstance(ps, str):
            ps = [float(x) for x in ps.split(",") if x.strip()]
        return qb.percentiles(
            tags, start, end, percentiles=tuple(float(p) for p in ps),
            include_bad_data=include_bad, limit=limit, offset=offset,
        )
    if verb == "interpolation_at_time":
        M.require(params, "tag_name", "timestamps")
        stamps = params["timestamps"]
        stamps = [stamps] if isinstance(stamps, str) else list(stamps)
        window_length = M.parse_int(params.get("window_length"), "window_length") or 1
        return qb.interpolation_at_time(
            tags, stamps, include_bad_data=include_bad,
            window_length=window_length, pivot=pivot,
            display_uom=display_uom, limit=limit, offset=offset,
        )

    # every remaining verb buckets on a time interval
    start, end, rate, unit = M.require(
        params, "start_date", "end_date", "time_interval_rate", "time_interval_unit"
    )
    M.require(params, "tag_name")
    if verb == "top_k":
        k = M.parse_int(params.get("k"), "k") or 3
        return qb.top_k(
            tags, start, end, rate, unit, k=k,
            include_bad_data=include_bad, limit=limit, offset=offset,
        )
    if verb == "resample":
        (agg,) = M.require(params, "agg_method")
        return qb.resample(
            tags, start, end, rate, unit, agg,
            include_bad_data=include_bad, pivot=pivot,
            display_uom=display_uom, limit=limit, offset=offset,
        )
    if verb == "plot":
        return qb.plot(
            tags, start, end, rate, unit,
            include_bad_data=include_bad, pivot=pivot,
            display_uom=display_uom, limit=limit, offset=offset,
        )
    if verb == "interpolate":
        return qb.interpolate(
            tags, start, end, rate, unit,
            include_bad_data=include_bad, pivot=pivot,
            display_uom=display_uom, limit=limit, offset=offset,
        )
    if verb == "time_weighted_average":
        window_length = M.parse_int(params.get("window_length"), "window_length") or 1
        step = params.get("step", "metadata")
        return qb.time_weighted_average(
            tags, start, end, rate, unit, step,
            include_bad_data=include_bad, window_length=window_length,
            pivot=pivot, display_uom=display_uom, limit=limit, offset=offset,
        )
    if verb in ("circular_average", "circular_standard_deviation"):
        lo, hi = M.require(params, "lower_bound", "upper_bound")
        fn = qb.circular_average if verb == "circular_average" else qb.circular_standard_deviation
        return fn(
            tags, start, end, rate, unit,
            M.parse_float(lo, "lower_bound"), M.parse_float(hi, "upper_bound"),
            include_bad_data=include_bad, pivot=pivot,
            display_uom=display_uom, limit=limit, offset=offset,
        )
    raise ValueError(f"unknown verb: {verb}")


def create_app(
    spark: SparkSession,
    catalog: Catalog,
    authorizer: Optional[Callable[[Optional[str]], None]] = None,
    batch_max_workers: int = 10,
):
    """Build the Flask app. ``authorizer`` receives the Authorization
    header value and raises PermissionError to reject (the reference's
    Azure AD oauth2 dependency, src/api/auth/azuread.py)."""
    from flask import Flask, Response, request

    app = Flask("core_spark_api")

    def _check_auth() -> None:
        if authorizer is not None:
            authorizer(request.headers.get("Authorization"))

    def _merged_params(body_model=M.TagsBodyParams):
        """Query params + (for POST) the validated JSON body, body wins —
        exactly how the reference merges TagsBodyParams over query params."""
        params: dict = {}
        for k in request.args:
            vals = request.args.getlist(k)
            params[k] = vals if len(vals) > 1 else vals[0]
        # repeated scalars the API defines as lists even when single-valued
        for k in ("tag_name", "timestamps"):
            if k in request.args:
                params[k] = request.args.getlist(k)
        if request.method == "POST" and body_model is not None:
            body = request.get_json(force=True, silent=False)
            params.update(body_model.model_validate(body).model_dump())
        return params

    def _respond(df: DataFrame, params: dict) -> Response:
        limit, offset = _limit_offset(params)
        pdf = df.toPandas()
        return Response(
            M.json_envelope(pdf, limit, offset), mimetype="application/json"
        )

    def _route(verb: str, body_model=M.TagsBodyParams):
        def handler():
            try:
                _check_auth()
            except PermissionError as e:
                return Response(
                    '{"detail": "' + str(e).replace('"', "'") + '"}',
                    status=401, mimetype="application/json",
                )
            try:
                params = _merged_params(body_model)
                return _respond(execute_verb(spark, catalog, verb, params), params)
            except Exception as e:  # reference raises HTTPException(400, detail)
                import json as _json

                return Response(
                    _json.dumps({"detail": str(e)}),
                    status=400, mimetype="application/json",
                )

        handler.__name__ = f"route_{verb}"
        return handler

    for url, verb in ROUTE_VERBS.items():
        if verb == "sql":
            app.add_url_rule(
                f"/api/v1{url}", f"v1_{verb}", _route(verb, M.SqlBodyParams),
                methods=["POST"],
            )
        else:
            app.add_url_rule(
                f"/api/v1{url}", f"v1_{verb}", _route(verb), methods=["GET", "POST"],
            )

    def batch_handler():
        try:
            _check_auth()
        except PermissionError as e:
            return Response(
                '{"detail": "' + str(e).replace('"', "'") + '"}',
                status=401, mimetype="application/json",
            )
        import json as _json

        try:
            body = M.BatchBodyParams.model_validate(request.get_json(force=True))
            jobs = []
            for sub in body.requests:
                if sub.url not in ROUTE_VERBS:
                    raise ValueError(
                        "Unsupported url: Only relative base urls are supported, "
                        "for example '/events/raw'"
                    )
                if sub.method.upper() == "POST" and sub.body is None:
                    raise ValueError("All POST requests require a body")
                params = dict(sub.params)
                if sub.method.upper() == "POST":
                    params.update(sub.body or {})
                jobs.append((ROUTE_VERBS[sub.url], params))
        except Exception as e:
            return Response(
                _json.dumps({"detail": str(e)}), status=400,
                mimetype="application/json",
            )

        # concurrent Spark actions from a thread pool (batch.py:146 /
        # queries ThreadPoolExecutor): one failed sub-request becomes an
        # {"Error": ...} row, not a failed batch
        def run(job):
            verb, params = job
            try:
                pdf = execute_verb(spark, catalog, verb, params).toPandas()
                return M.json_envelope(pdf)
            except Exception as e:
                import pandas as pd

                return M.json_envelope(pd.DataFrame([{"Error": str(e)}]))

        with ThreadPoolExecutor(max_workers=min(batch_max_workers, max(1, len(jobs)))) as ex:
            parts = list(ex.map(run, jobs))
        return Response(
            '{"data":[' + ",".join(parts) + "]}", mimetype="application/json"
        )

    app.add_url_rule(
        "/api/v1/events/batch", "v1_batch", batch_handler, methods=["POST"]
    )

    @app.get("/api/v1/health")
    def health():
        return {"status": "ok", "spark": spark.version}

    return app
