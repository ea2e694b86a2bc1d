"""Thread-pooled multi-query fan-out — the engine's equivalent of the
reference's batch API (queries/time_series/batch.py:22-84).

The reference opens one Databricks SQL connection per thread and ships each
request's generated SQL over the wire, returning pandas frames in request
order (executor.map preserves order, batch.py:74-79). Here the "connection"
is one shared SparkSession: Spark drivers accept concurrent job submission
from multiple threads natively, so each request thread builds its verb's
DataFrame plan and triggers its own action. Each thread tags its jobs with a
per-request ``spark.scheduler.pool`` local property, so a session created
with ``spark.scheduler.mode=FAIR`` time-slices the fleet instead of FIFO
head-of-line blocking (with the default FIFO scheduler the property is
inert — still correct, just sequentially scheduled).

Request shape is the reference's verbatim: ``{"type": <verb>,
"parameters_dict": {...}}`` with the parameter names the reference's
builder packs (time_series_query_builder.py:222-240) — ``source``,
``tag_names``, ``start_date``, ``tagname_column``, ``metadata_source`` …
"""

from __future__ import annotations

import inspect
from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark.sql import SparkSession

from .query_builder import TimeSeriesQueryBuilder

#: reference verb names (queries/time_series/_time_series_query_builder.py
#: dispatch) -> TimeSeriesQueryBuilder method names (identical by design)
_VERBS = {
    "raw",
    "resample",
    "plot",
    "interpolate",
    "interpolation_at_time",
    "time_weighted_average",
    "metadata",
    "latest",
    "circular_average",
    "circular_standard_deviation",
    "summary",
}

#: reference parameters_dict key -> builder verb kwarg
_RENAMES = {"tag_names": "tagname_filter", "timestamps": "timestamp_filter"}

_SOURCE_KEYS = ("tagname_column", "timestamp_column", "status_column", "value_column")
_META_KEYS = ("metadata_tagname_column", "metadata_uom_column", "metadata_step_column")


def _build_one(spark: SparkSession, request: dict[str, Any]):
    verb = request["type"]
    if verb not in _VERBS:
        raise ValueError(f"unknown query type {verb!r}; expected one of {sorted(_VERBS)}")
    params = dict(request["parameters_dict"])
    qb = TimeSeriesQueryBuilder().connect(spark)
    qb.source(
        params.pop("source"),
        **{k: params.pop(k) for k in _SOURCE_KEYS if k in params},
    )
    meta = params.pop("metadata_source", None)
    meta_kwargs = {k: params.pop(k) for k in _META_KEYS if k in params}
    if meta is not None:
        qb.m_source(meta, **meta_kwargs)
    fn = getattr(qb, verb)
    accepted = set(inspect.signature(fn).parameters)
    kwargs = {}
    for key, value in params.items():
        key = _RENAMES.get(key, key)
        if key in accepted:
            kwargs[key] = value
    return fn(**kwargs)


def get(
    connection: SparkSession,
    request_list: list[dict[str, Any]],
    threadpool_max_workers: int = 1,
    to_pandas: bool = True,
) -> list:
    """Run many time-series queries concurrently on one SparkSession.

    Returns results in request order (batch.py:74-79 uses executor.map for
    the same guarantee). ``to_pandas=True`` matches the reference contract
    (each thread materializes its result via Arrow ``toPandas``, so the
    Spark jobs genuinely overlap); ``to_pandas=False`` returns the lazy
    DataFrame plans instead — the caller owns the actions.

    Any request error propagates (batch.py:60-64 re-raises) — partial
    results are not returned.
    """

    def run(indexed: tuple[int, dict[str, Any]]):
        i, request = indexed
        sc = connection.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", f"batch-{i}")
        try:
            df = _build_one(connection, request)
            return df.toPandas() if to_pandas else df
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(max_workers=threadpool_max_workers) as executor:
        return list(executor.map(run, enumerate(request_list)))
